"""MuSCLe core network (reference src/MuSCLe.py:156-311), Flax/NHWC.

Wraps the EfficientNet pyramid, computes CAMs from the classifier weights,
refines them with the Pixel Correlation Module (PCM, from SEAM), and in
decoder mode runs the BiFPN + segmentation head.

Forward modes (selected statically at trace time — each mode is its own XLA
program, like the reference's if/elif chain at src/MuSCLe.py:227-298):

  'logits' -> (emb, logits)
  'cam'    -> (cams, sgc, emb, logits)     cams/sgc upsampled to input HxW
  'pix'    -> (cams, sgc)
  'seg'    -> (seg_map, dense_ft)          both at input HxW
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from muscle_tpu.core.resize import resize_bilinear, resize_to
from muscle_tpu.models.bifpn import BiFPN
from muscle_tpu.models.efficientnet import EfficientNet, advance_window

# Per-variant pyramid: (channels p1..p7, block indices p1..p7)
# (reference src/MuSCLe.py:167-178).
PYRAMID_TABLE = {
    "efficientnet-b1": ((16, 24, 40, 80, 112, 192, 320), (1, 4, 7, 11, 15, 20, 22)),
    "efficientnet-b3": ((24, 32, 48, 96, 136, 232, 384), (1, 4, 7, 12, 17, 23, 25)),
    "efficientnet-b5": ((24, 40, 64, 128, 176, 304, 512), (2, 7, 12, 19, 26, 35, 38)),
    "efficientnet-b7": ((32, 48, 80, 160, 224, 384, 640), (3, 10, 17, 27, 37, 50, 54)),
}


class _Classifier(nn.Module):
    """Bias-free linear classifier whose kernel is directly addressable.

    The reference computes CAMs from ``fc.weight.data`` even in modes that
    never evaluate the logits (src/MuSCLe.py:244,265), so the kernel must be
    accessible independent of a Dense call.
    """

    features_in: int
    num_classes: int
    dtype: Any = jnp.float32

    def setup(self):
        self.kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.features_in, self.num_classes),
            self.dtype,
        )

    def __call__(self, emb: jax.Array) -> jax.Array:
        return emb @ self.kernel


class MuSCLe(nn.Module):
    num_classes: int = 21
    backbone_name: str = "efficientnet-b3"
    bifpn_layers: int = 3
    bifpn_channels: int = 256
    last_pooling: bool = True
    mode: str = "enc"  # 'enc' (classifier/CAM heads) or 'dec' (BiFPN decoder)
    dtype: Any = jnp.float32
    fuse_mbconv: int = 0  # Pallas-fuse stride-1 MBConvs with <= N input
    # channels at inference (ops/pallas/mbconv.py); 0 = plain XLA

    def setup(self):
        if self.backbone_name not in PYRAMID_TABLE:
            raise ValueError(f"no pyramid table for {self.backbone_name}")
        self.backbone = EfficientNet(
            model_name=self.backbone_name,
            last_pooling=self.last_pooling,
            dtype=self.dtype,
            fuse_max_in_filters=self.fuse_mbconv,
            name="backbone",
        )
        channels, self.p_seq = PYRAMID_TABLE[self.backbone_name]
        p1_ch, _, p3_ch, _, p5_ch, _, p7_ch = channels
        if self.mode == "enc":
            # PCM embedding projection + classifier (reference :181-183).
            self.fuse = nn.Conv(128, (1, 1), use_bias=True, dtype=self.dtype, name="fuse")
            self.fc = _Classifier(p7_ch, self.num_classes, dtype=self.dtype, name="fc")
        else:
            self.bifpn = BiFPN(
                channels=self.bifpn_channels,
                num_layers=self.bifpn_layers,
                last_pooling=self.last_pooling,
                dtype=self.dtype,
                name="BIFPN",
            )
        # Defined unconditionally in the reference (:187) — kept so that
        # checkpoints trained in one mode load in the other.
        self.fuse_dec = nn.Conv(
            self.num_classes, (1, 1), use_bias=True, dtype=self.dtype, name="fuse_dec"
        )

    def _pyramid(self, x: jax.Array, train: bool, valid_window=None):
        feats = self.backbone(x, train=train, valid_window=valid_window)
        return [feats[i] for i in self.p_seq]

    def _cams(self, p7: jax.Array) -> jax.Array:
        """CAM via the classifier weights (reference :242-247): the per-class
        weighted sum of p7 channels.  The torch loop over the batch with
        ``fc.weight.data`` is one einsum against the *detached* kernel here.
        """
        kernel = jax.lax.stop_gradient(self.fc.kernel)  # (C_in, num_cls)
        cams = jnp.einsum("nhwc,ck->nhwk", p7, kernel)
        return jax.nn.relu(cams)

    def pcm(self, cam: jax.Array, f: jax.Array, mask: jax.Array | None = None) -> jax.Array:
        """Pixel Correlation Module (reference :213-223).

        cam: (N, h, w, C) raw CAMs at p7 resolution.
        f:   (N, h, w, F) detached fused features.
        mask: optional (N, h, w, 1) valid-feature mask (padded-canvas TTA
          paths) — zeroing the normalised embeddings at invalid positions
          removes pad pixels from both the affinity and its column
          normalisation, matching the reference's unpadded compute.
        Returns the Spatially-Guided CAM (SGC), same shape as ``cam``.
        """
        n, h, w, _ = f.shape
        cam = resize_bilinear(cam, (h, w), align_corners=True)
        f = self.fuse(f)
        f = f.reshape(n, h * w, -1)
        f = f / (jnp.linalg.norm(f, axis=-1, keepdims=True) + 1e-5)
        if mask is not None:
            f = f * mask.reshape(n, h * w, 1)
        # Affinity: relu(f f^T) column-normalised (symmetric pre-norm, so the
        # torch dim=1 sum is a column sum here too).
        aff = jax.nn.relu(jnp.einsum("nid,njd->nij", f, f))
        aff = aff / (jnp.sum(aff, axis=1, keepdims=True) + 1e-5)
        cam_flat = cam.reshape(n, h * w, -1)
        sgc = jnp.einsum("nik,nij->njk", cam_flat, aff)
        return sgc.reshape(n, h, w, -1)

    def _feature_mask(self, p7: jax.Array, hh: int, valid_hw: jax.Array) -> jax.Array:
        """(N, h7, w7, 1) mask of the valid feature window: valid // stride
        — the p7 size the reference's static-pad forward produces (the
        FLOOR chain, efficientnet._static_pad; floor-by-2 composed n times
        == floor by 2^n)."""
        n, h7, w7, _ = p7.shape
        stride = hh // h7
        eff = valid_hw // stride
        rows = jnp.arange(h7)[None, :, None]
        cols = jnp.arange(w7)[None, None, :]
        m = (rows < eff[:, 0:1, None]) & (cols < eff[:, 1:2, None])
        return m[..., None].astype(p7.dtype)

    def _window_resize_ac(self, src: jax.Array, src_win: jax.Array,
                          dst_win: jax.Array, dst_hw: tuple[int, int]) -> jax.Array:
        """Per-image window resize, align_corners=True — the reference's
        F.interpolate on UNPADDED pyramid features (src/MuSCLe.py:248-253)
        inside padded canvases (now shared with the window-exact BiFPN:
        core.resize.batched_window_resize_ac)."""
        from muscle_tpu.core.resize import batched_window_resize_ac

        return batched_window_resize_ac(src, src_win, dst_win, dst_hw)

    def __call__(
        self,
        x: jax.Array,
        mode: str = "cam",
        train: bool = False,
        valid_hw: jax.Array | None = None,
        valid_window: jax.Array | None = None,
    ):
        """valid_hw: optional (N, 2) per-image valid (h, w) inside a padded
        canvas (batched TTA engines).  The reference runs every image
        unpadded, so its global reductions — GAP embedding/logits and the
        PCM affinity normalisation — see image pixels only; with valid_hw
        those reductions are masked to the valid feature window, removing
        the canvas-size dependence of the padded fast paths (the remaining
        padded-canvas deviation is the conv halo near the window edge,
        DEVIATIONS.md #8).

        valid_window: optional (N, 4) int (oy, ox, h, w) per-image windows
        with (oy, ox) from efficientnet.placement_offset — the EXACT padded-
        canvas mode: the backbone re-zeroes the per-stage windows (halo) and
        the images sit at their TF-SAME alignment offsets, so the canvas
        forward equals the reference's unpadded forward (closes
        DEVIATIONS.md #8); supersedes valid_hw when given."""
        n, hh, ww, _ = x.shape
        ps = self._pyramid(x, train, valid_window=valid_window)
        p1, p2, p3, p4, p5, p6, p7 = ps

        if mode == "logits":
            emb = jnp.mean(p7, axis=(1, 2))
            return emb, self.fc(emb)

        if mode in ("cam", "pix", "cam_lowres"):
            cams = self._cams(p7)
            if valid_window is not None:
                # per-stride windows: p1 @ stride 2, p3 @ stride 8,
                # p5/p7 @ stride 16 (offset 0 by placement_offset)
                w2 = advance_window(valid_window)
                w8 = advance_window(advance_window(w2))
                w16 = advance_window(w8)
                hw7 = (p7.shape[1], p7.shape[2])
                f1 = jax.nn.relu(self._window_resize_ac(p1, w2, w16, hw7))
                f2 = jax.nn.relu(self._window_resize_ac(p3, w8, w16, hw7))
            else:
                f1 = jax.nn.relu(resize_to(p1, p7, align_corners=True))
                f2 = jax.nn.relu(resize_to(p3, p7, align_corners=True))
            f3 = jax.nn.relu(p5)
            fs = jax.lax.stop_gradient(jnp.concatenate([f1, f2, f3], axis=-1))
            if valid_window is not None:
                from muscle_tpu.models.efficientnet import window_mask

                m = window_mask((p7.shape[1], p7.shape[2]), w16, p7.dtype)
                sgc = self.pcm(cams, fs, mask=m)
                emb = jnp.sum(p7 * m, axis=(1, 2)) / jnp.sum(m, axis=(1, 2))
            elif valid_hw is not None:
                m = self._feature_mask(p7, hh, valid_hw)
                sgc = self.pcm(cams, fs, mask=m)
                emb = jnp.sum(p7 * m, axis=(1, 2)) / jnp.sum(m, axis=(1, 2))
            else:
                sgc = self.pcm(cams, fs)
                emb = jnp.mean(p7, axis=(1, 2))
            if mode == "cam_lowres":
                # TTA fast path: skip the model-internal upsample to input
                # size; the engine resizes the stride-16 maps straight to
                # the original image size (one resize instead of two).
                return cams, sgc, emb, self.fc(emb)
            cams = resize_bilinear(cams, (hh, ww), align_corners=True)
            sgc = resize_bilinear(sgc, (hh, ww), align_corners=True)
            if mode == "pix":
                return cams, sgc
            return cams, sgc, emb, self.fc(emb)

        if mode in ("seg", "vis", "seg_lowres"):
            feats5 = [p3, p4, p5, p6, p7]
            windows = None
            if valid_window is not None:
                # per-level windows by stride (dec ladder: p3@8, p4/p5@16,
                # p6/p7@32 under last_pooling) — the BiFPN then runs its
                # window-exact mode (models/bifpn.py), closing the seg-path
                # half of DEVIATIONS.md #8
                windows = []
                w, k_done = valid_window, 0
                for p in feats5:
                    k = (hh // p.shape[1]).bit_length() - 1
                    while k_done < k:
                        w = advance_window(w)
                        k_done += 1
                    windows.append(w)
            p3_dec = self.bifpn(feats5, train=train, windows=windows)[0]
            if mode == "seg_lowres":
                # fuse_dec is a 1x1 conv, which commutes exactly with the
                # bilinear upsample (linear map + row-stochastic weights),
                # so stride-4 logits -> resize == the reference's
                # resize -> conv, while never materialising the full-res
                # 256-channel dense feature.
                return self.fuse_dec(p3_dec), p3_dec
            if valid_window is not None:
                # reference: interpolate the UNPADDED p3 decoder output to
                # the input size — here: the p3 window onto the window-size
                # region at the canvas origin (the output convention of the
                # TTA engines' per-image readers)
                dst_win = jnp.concatenate(
                    [jnp.zeros_like(valid_window[:, :2]), valid_window[:, 2:]],
                    axis=-1,
                )
                from muscle_tpu.core.resize import batched_window_resize_ac

                dense_ft = batched_window_resize_ac(
                    p3_dec, windows[0], dst_win, (hh, ww)
                )
            else:
                dense_ft = resize_bilinear(p3_dec, (hh, ww), align_corners=True)
            seg_map = self.fuse_dec(dense_ft)
            if mode == "vis":
                return seg_map, p7
            return seg_map, dense_ft

        raise ValueError(f"unknown mode {mode!r}")
