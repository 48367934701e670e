"""Batched multi-scale + flip CAM generation (reference infer_mcl.py).

The reference runs 8 sequential batch-1 forwards per image and fuses on CPU
with cv2.  Here the whole TTA product is *batched*: each scale's (orig,
flip) pairs run as one padded-canvas batch, the model's CAM/SGC maps are
resized back to original image size ON DEVICE (gather-based dynamic resize,
cv2 half-pixel semantics, un-flip fused in), and summed into per-image
accumulators that live on device across scales — each scale is exactly one
jit invocation (donated accumulators; zero eager ops on the hot path).

Fusion math matches infer_mcl.py:148-174: elementwise SUM over versions of
the foreground channels, clip negatives, per-class min-max normalisation
(with the reference's pre-normalisation zeroing of sub-min values), class
gating by image labels, sigmoid of the mean score.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from muscle_tpu.core.resize import (
    composed_cam_resize_weights,
    dynamic_cubic_resize_weights,
    dynamic_window_resize,
)
from muscle_tpu.data.tta import msf_batch, bucket_side
from muscle_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD
from muscle_tpu.models.efficientnet import placement_offset

# TF-SAME stride-2 convs between the input and the CAM-mode stride-16
# feature maps (stem + stages 2-4; stage 6 is stride 1 with
# last_pooling=False) — the ladder depth for placement_offset.
N_STRIDED_ENC = 4


def _scaled_np(orig_sizes, scale: float) -> np.ndarray:
    """Scaled (h, w) with the device's arithmetic: f32 product, jnp.round
    (half-to-even) — so host canvas sizing matches the traced sizes."""
    return np.round(
        np.asarray(orig_sizes, np.float32) * np.float32(scale)
    ).astype(np.int32)


def _batch_canvas(scale: float, orig_sizes, max_side: int,
                  n_strided: int = N_STRIDED_ENC) -> tuple[int, int]:
    """Rectangular per-batch canvas: the batch's max scaled (h, w) PLUS its
    TF-SAME placement offset (<= 2^n_strided - 1 px, models/efficientnet.py
    placement_offset; 15 for the enc ladder, 31 for the dec stride-32
    ladder), bucketed to multiples of 64.  With orientation-homogeneous
    batches (the CLIs sort by orientation) this cuts ~25% of the conv FLOPs
    on VOC-shaped data — exactly, since the dropped region is zero padding
    outside every image's window."""
    scaled = _scaled_np(orig_sizes, scale)
    off = placement_offset(scaled, n_strided)
    sh = int(np.max(scaled[:, 0] + off[:, 0]))
    sw = int(np.max(scaled[:, 1] + off[:, 1]))
    return -(-sh // 64) * 64, -(-sw // 64) * 64


class CamTTAEngine:
    """Runs MuSCLe 'cam' TTA over batches of PIL images.

    Args:
      model: MuSCLe module (mode='enc').
      variables: flax variables (params + batch_stats).
      scales: TTA scales (reference default [0.5, 1, 1.5, 2]).
      out_side: static canvas for fused output maps (>= max image side).
      max_side: dataset max long side (VOC: 500).
      compute_dtype: jnp.bfloat16 runs the backbone in bf16 (MXU fast path);
        fusion accumulators stay f32.
      lowres: resize the stride-16 CAM/SGC maps with the reference's
        two-stage chain (p7 -> input size, align_corners=True -> original,
        half-pixel) COMPOSED into one per-axis weight matrix — EXACT and
        still ~10x less resize compute than materialising the input-size
        maps (core/resize.py composed_cam_resize_weights); lowres=False
        materialises the chain stage by stage for cross-checks.
      device_tta: upload each image ONCE as uint8 and do the multi-scale
        bicubic resize + normalisation + flip on device (PIL-compatible
        cubic weights as MXU matmuls), and download only the classes the
        image is labelled with.  Cuts host<->device traffic ~50x — the
        host link, not the TPU, bounds TTA throughput otherwise.
      max_classes: per-image class budget for the selective download
        (device_tta path; VOC images rarely exceed 4 labels).
      accum_stride: device_tta only.  1 = accumulate fused maps at full
        original resolution (parity mode).  N>1 = accumulate on an
        out_side/N grid (each scale's map resized once to ~orig/N) and
        bilinearly upsample to original size ON HOST after the download —
        the maps are stride-16 model outputs, so an N=4 grid still
        oversamples the largest (scale-2) map ~2x per axis while cutting
        the download N^2-fold and the resize/fusion FLOPs likewise.
        Documented deviation (DEVIATIONS.md): the resample chain becomes
        map -> orig/N -> orig instead of map -> orig; bounded by the
        oracle delta tests in tests/test_inference.py.
      download_dtype: 'float16' (parity) or 'uint8' (device_tta only) —
        the fused maps are min-max normalised into [0, 1], so a x255
        quantisation costs <=0.2% absolute while halving (vs f16) the
        dominant device->host transfer.
      tight_upload: device_tta only.  Upload a (B, short, out_side) canvas
        instead of the square one, storing portrait images TRANSPOSED
        (VOC images have long side <= 500 but short side typically ~375);
        the device un-transposes into the square working canvas.  The
        canvas height is bucketed per batch (multiples of 64), cutting the
        dominant host->device transfer ~25% on VOC-shaped data.  Bitwise
        identical outputs (the transpose is exact).
      upload_mode: 'rgb' (parity) or 'ycbcr420' (device_tta only) —
        chroma-subsampled upload: Y full-res + CbCr half-res (1.5 vs 3
        bytes/pixel), reconstructed to RGB on device.  VOC JPEGs are
        4:2:0 on disk, so for real data this carries the same chroma the
        RGB decode interpolated from; deviation bounded by
        tests/test_inference.py (see inference/upload.py).  Composes with
        tight_upload.
      mesh: optional jax.sharding.Mesh — shard the batch over the mesh's
        'data' axis (pure data parallelism: images are independent, so a
        v5e-8 slice runs 8x the stream under ONE engine/process; weights
        are replicated once).  Batches not divisible by the axis size
        fall back to the unsharded path.  Outputs are identical
        (tests/test_sharding.py).
      shard_spatial: additionally shard the model input's HEIGHT over the
        mesh's 'model' axis (parallel.mesh.spatial_sharding): GSPMD runs
        the whole conv stack sharded, exchanging halos over ICI — a batch
        SMALLER than the slice still uses every chip (latency scaling the
        single-GPU reference has no equivalent of).  Needs
        make_mesh(model_axis>1); outputs match the unsharded engine.
    """

    def __init__(
        self,
        model,
        variables,
        scales=(0.5, 1.0, 1.5, 2.0),
        num_classes: int = 21,
        out_side: int = 512,
        max_side: int = 500,
        compute_dtype=jnp.float32,
        lowres: bool = True,
        device_tta: bool = True,
        max_classes: int = 8,
        return_cam: bool = True,
        accum_stride: int = 1,
        download_dtype: str = "float16",
        tight_upload: bool = False,
        upload_mode: str = "rgb",
        mesh=None,
        shard_spatial: bool = False,
    ):
        self.model = model
        self.variables = variables
        self.mesh = mesh
        self._spatial_sharding = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            self._batch_sharding = NamedSharding(mesh, P("data"))
            # replicate the weights across the mesh once
            self.variables = jax.device_put(variables, NamedSharding(mesh, P()))
            if shard_spatial:
                # shard the model input's HEIGHT over 'model' as well:
                # GSPMD runs the conv stack with ICI halo exchanges, so a
                # batch smaller than the slice still uses every chip
                # (parallel.mesh.spatial_sharding)
                if mesh.shape.get("model", 1) < 2:
                    raise ValueError(
                        "shard_spatial needs make_mesh(model_axis>1)")
                self._spatial_sharding = NamedSharding(mesh, P("data", "model"))
        elif shard_spatial:
            raise ValueError("shard_spatial requires a mesh")
        self.scales = tuple(scales)
        self.num_classes = num_classes
        self.out_side = out_side
        self.max_side = max_side
        self.compute_dtype = compute_dtype
        self.lowres = lowres
        self.device_tta = device_tta
        self.max_classes = max_classes
        # the reference artifact is the SGC dict only (infer_mcl.py:180-182,
        # raw-CAM saving is commented out); skipping the CAM download halves
        # device->host traffic on the fast path
        self.return_cam = return_cam
        if out_side % accum_stride:
            raise ValueError("accum_stride must divide out_side")
        if download_dtype not in ("float16", "uint8"):
            raise ValueError(f"unsupported download_dtype {download_dtype!r}")
        self.accum_stride = accum_stride
        self.acc_side = out_side // accum_stride
        self.download_dtype = download_dtype
        self.tight_upload = tight_upload
        if upload_mode not in ("rgb", "ycbcr420"):
            raise ValueError(f"unsupported upload_mode {upload_mode!r}")
        self.upload_mode = upload_mode
        self._scale_fn = {}
        self._device_scale_fn = {}
        self._device_scale_raw = {}
        self._device_pipeline = {}
        # one jit program per batch shape (unpack + every scale + fuse)
        # instead of 6 chained dispatches — see _device_pipeline_for
        self.fuse_dispatch = device_tta

    def _core(self, canvas_h: int, canvas_w: int):
        """Shared per-scale compute: scaled normalised (orig, flip) pairs ->
        model -> resize-back/un-flip -> accumulate."""
        model = self.model
        out_side = self.out_side
        cdt = self.compute_dtype
        lowres = self.lowres

        def compute(variables, images, win, orig_sizes, cam_sum, sgc_sum, logits_sum):
            sizes = win[:, 2:]
            mode = "cam_lowres" if lowres else "cam"
            if lowres:
                cams, sgcs, _, logits = model.apply(
                    variables, images.astype(cdt), mode=mode,
                    valid_window=jnp.repeat(win, 2, axis=0),
                )
            else:
                cams, sgcs, _, logits = model.apply(
                    variables, images.astype(cdt), mode=mode,
                    valid_hw=jnp.repeat(sizes, 2, axis=0),
                )
            cams = cams.astype(jnp.float32)
            sgcs = sgcs.astype(jnp.float32)
            logits = logits.astype(jnp.float32)
            feat_stride = canvas_h // cams.shape[1]  # 1 (full-res) or 16

            def per_image(cam2, sgc2, size, orig):
                if lowres:
                    # composed exact two-stage chain (see _device_core)
                    map_sz = size // feat_stride  # static-pad floor chain (models/efficientnet._static_pad)
                    mh, mw = cam2.shape[1], cam2.shape[2]
                    wh = composed_cam_resize_weights(
                        map_sz[0], size[0], orig[0], mh, canvas_h, out_side
                    )
                    ww = composed_cam_resize_weights(
                        map_sz[1], size[1], orig[1], mw, canvas_w, out_side
                    )
                    wwf = composed_cam_resize_weights(
                        map_sz[1], size[1], orig[1], mw, canvas_w, out_side,
                        flip=True,
                    )

                    def resize(m, flip):
                        a = jnp.einsum("Iy,yxk->Ixk", wh, m)
                        return jnp.einsum("Jx,Ixk->IJk", wwf if flip else ww, a)

                else:
                    box = jnp.concatenate([jnp.zeros(2, jnp.int32), size])

                    def resize(m, flip):
                        return dynamic_window_resize(
                            m, box, (out_side, out_side), dst_hw=orig,
                            align_corners=False, flip_x=flip,
                        )

                rows = jnp.arange(out_side)[:, None]
                cols = jnp.arange(out_side)[None, :]
                valid = ((rows < orig[0]) & (cols < orig[1]))[..., None]
                cam = (resize(cam2[0], False) + resize(cam2[1], True)) * valid
                sgc = (resize(sgc2[0], False) + resize(sgc2[1], True)) * valid
                return cam, sgc

            b = sizes.shape[0]
            cam_pairs = cams.reshape(b, 2, *cams.shape[1:])
            sgc_pairs = sgcs.reshape(b, 2, *sgcs.shape[1:])
            cam_acc, sgc_acc = jax.vmap(per_image)(cam_pairs, sgc_pairs, sizes, orig_sizes)
            return (
                cam_sum + cam_acc,
                sgc_sum + sgc_acc,
                logits_sum + logits.reshape(b, 2, -1).sum(axis=1),
            )

        return compute

    def _fn_for(self, scale: float, batch: int, canvas_hw=None):
        """Host-prep path: PIL-scaled f32 canvases in, one jit per scale.

        NOTE: variables are an ARGUMENT, not a closure capture — a captured
        jax.Array becomes an XLA constant (weights baked into the program:
        monster compiles, cache misses per checkpoint)."""
        side = bucket_side(scale, self.max_side)
        ch, cw = canvas_hw or (side, side)
        key = (scale, batch, ch, cw)
        if key not in self._scale_fn:
            compute = self._core(ch, cw)
            self._scale_fn[key] = jax.jit(compute, donate_argnums=(4, 5, 6))
        return self._scale_fn[key]

    def _device_core(self, canvas_h: int, canvas_w: int):
        """device_tta per-scale compute: model -> per-image gather of the
        labelled classes (21 -> K channels BEFORE the expensive resize) ->
        resize/un-flip onto the accumulation grid -> accumulate.

        The canvas may be rectangular: with orientation-homogeneous
        batches the per-scale canvas buckets to the batch's max scaled
        (h, w), cutting ~25% of the backbone FLOPs on VOC-shaped data
        with EXACT parity (zero padding contributes nothing to the
        windowed maps; BN uses running stats).

        accs: dict with 'sgc' (B, acc, acc, K), 'logits' (B, C) and,
        when return_cam, 'cam' (B, acc, acc, K)."""
        model = self.model
        cdt = self.compute_dtype
        lowres = self.lowres
        stride = self.accum_stride
        acc_side = self.acc_side
        return_cam = self.return_cam

        def compute(variables, images, win, orig_sizes, class_idx, accs):
            # win: (B, 4) int (oy, ox, h, w) — per-image scaled valid window
            # at its TF-SAME placement offset; the model's valid_window mode
            # makes the canvas forward equal to the reference's unpadded one
            # (closes DEVIATIONS.md #8), with the stride-16 maps' windows at
            # offset 0 by construction.
            sizes = win[:, 2:]
            mode = "cam_lowres" if lowres else "cam"
            if lowres:
                cams, sgcs, _, logits = model.apply(
                    variables, images.astype(cdt), mode=mode,
                    valid_window=jnp.repeat(win, 2, axis=0),
                )
            else:
                # full-res mode keeps the legacy masked-reduction path: its
                # model-internal canvas upsample is not window-aware, so the
                # exact window machinery doesn't apply (lowres=True is the
                # production fast path; lowres=False exists for cross-checks)
                cams, sgcs, _, logits = model.apply(
                    variables, images.astype(cdt), mode=mode,
                    valid_hw=jnp.repeat(sizes, 2, axis=0),
                )
            cams = cams.astype(jnp.float32)
            sgcs = sgcs.astype(jnp.float32)
            logits = logits.astype(jnp.float32)
            feat_stride = canvas_h // cams.shape[1]  # 1 (full-res) or 16
            b = sizes.shape[0]
            cam_pairs = cams.reshape(b, 2, *cams.shape[1:])
            sgc_pairs = sgcs.reshape(b, 2, *sgcs.shape[1:])
            rows = jnp.arange(acc_side)[:, None]
            cols = jnp.arange(acc_side)[None, :]

            def per_image(cam2, sgc2, size, orig, idx):
                sgc2 = jnp.take(sgc2[..., 1:], idx, axis=-1)
                if return_cam:
                    cam2 = jnp.take(cam2[..., 1:], idx, axis=-1)
                dst = (orig + stride - 1) // stride

                if lowres:
                    # the reference's EXACT two-stage resample chain
                    # (stride-16 map -> input size, align_corners=True ->
                    # original/stride, half-pixel) composed into one
                    # per-axis weight matrix (core/resize.py)
                    map_sz = size // feat_stride  # static-pad floor chain (models/efficientnet._static_pad)
                    mh, mw = sgc2.shape[1], sgc2.shape[2]
                    wh = composed_cam_resize_weights(
                        map_sz[0], size[0], dst[0], mh, canvas_h, acc_side
                    )
                    ww = composed_cam_resize_weights(
                        map_sz[1], size[1], dst[1], mw, canvas_w, acc_side
                    )
                    wwf = composed_cam_resize_weights(
                        map_sz[1], size[1], dst[1], mw, canvas_w, acc_side,
                        flip=True,
                    )

                    def resize(m, flip):
                        a = jnp.einsum("Iy,yxk->Ixk", wh, m)
                        return jnp.einsum("Jx,Ixk->IJk", wwf if flip else ww, a)

                else:
                    box = jnp.concatenate([jnp.zeros(2, jnp.int32), size])

                    def resize(m, flip):
                        return dynamic_window_resize(
                            m, box, (acc_side, acc_side), dst_hw=dst,
                            align_corners=False, flip_x=flip,
                        )

                valid = ((rows < dst[0]) & (cols < dst[1]))[..., None]
                sgc = (resize(sgc2[0], False) + resize(sgc2[1], True)) * valid
                if return_cam:
                    return (resize(cam2[0], False) + resize(cam2[1], True)) * valid, sgc
                return None, sgc

            if return_cam:
                cam_acc, sgc_acc = jax.vmap(per_image)(
                    cam_pairs, sgc_pairs, sizes, orig_sizes, class_idx
                )
            else:
                _, sgc_acc = jax.vmap(
                    lambda s2, sz, o, i: per_image(None, s2, sz, o, i)
                )(sgc_pairs, sizes, orig_sizes, class_idx)
            out = {
                "sgc": accs["sgc"] + sgc_acc,
                "logits": accs["logits"] + logits.reshape(b, 2, -1).sum(axis=1),
            }
            if return_cam:
                out["cam"] = accs["cam"] + cam_acc
            return out

        return compute

    def _put(self, x, b: int):
        """Place a batch-major host array on device; under a mesh, shard it
        over the 'data' axis (replicate when the batch doesn't divide)."""
        if self.mesh is None:
            return jnp.asarray(x)
        from jax.sharding import NamedSharding, PartitionSpec as P

        if b % self.mesh.shape["data"] == 0:
            return jax.device_put(np.asarray(x), self._batch_sharding)
        return jax.device_put(np.asarray(x), NamedSharding(self.mesh, P()))

    def _device_fn_for(self, scale: float, batch: int, canvas_hw=None):
        """device_tta per-scale program: uint8 originals -> scaled
        normalised (orig, flip) pair on device -> gathered device core.

        canvas_hw: optional rectangular (ch, cw) canvas (per-batch
        orientation bucketing); defaults to the square scale bucket."""
        side = bucket_side(scale, self.max_side)
        ch, cw = canvas_hw or (side, side)
        key = (scale, batch, ch, cw)
        if key not in self._device_scale_fn:
            in_side = self.out_side  # original-size canvas
            compute = self._device_core(ch, cw)
            mean = jnp.asarray(IMAGENET_MEAN[0, 0], jnp.float32)
            std = jnp.asarray(IMAGENET_STD[0, 0], jnp.float32)
            lowres = self.lowres
            spatial_sh = self._spatial_sharding

            @functools.partial(jax.jit, donate_argnums=(4,))
            def run(variables, images_u8, orig_sizes, class_idx, accs):
                scaled = jnp.round(orig_sizes.astype(jnp.float32) * scale).astype(jnp.int32)
                if lowres:
                    # per-image TF-SAME alignment placement (the model's
                    # valid_window exact mode); the legacy full-res path
                    # keeps top-left placement + masked reductions
                    off = placement_offset(scaled, N_STRIDED_ENC)
                else:
                    off = jnp.zeros_like(scaled)

                def make_pair(img_u8, osz, ssz, o):
                    x = (img_u8.astype(jnp.float32) / 255.0 - mean) / std
                    wh = dynamic_cubic_resize_weights(
                        osz[0], ssz[0], in_side, ch, dst_off=o[0]
                    )
                    ww = dynamic_cubic_resize_weights(
                        osz[1], ssz[1], in_side, cw, dst_off=o[1]
                    )
                    wwf = dynamic_cubic_resize_weights(
                        osz[1], ssz[1], in_side, cw, flip=True, dst_off=o[1]
                    )
                    a = jnp.einsum("Iy,yxc->Ixc", wh, x)
                    return jnp.einsum("Jx,Ixc->IJc", ww, a), jnp.einsum("Jx,Ixc->IJc", wwf, a)

                orig_v, flip_v = jax.vmap(make_pair)(images_u8, orig_sizes, scaled, off)
                images = jnp.stack([orig_v, flip_v], axis=1).reshape(-1, ch, cw, 3)
                if spatial_sh is not None:
                    images = jax.lax.with_sharding_constraint(images, spatial_sh)
                win = jnp.concatenate([off, scaled], axis=-1)
                return compute(variables, images, win, orig_sizes, class_idx, accs)

            self._device_scale_raw[key] = run
            self._device_scale_fn[key] = functools.partial(
                jax.jit, donate_argnums=(4,)
            )(run)
        return self._device_scale_fn[key]

    def _device_fn_raw(self, scale: float, batch: int, canvas_hw=None):
        """Un-jitted per-scale program (for composition into the single
        whole-batch dispatch program)."""
        side = bucket_side(scale, self.max_side)
        ch, cw = canvas_hw or (side, side)
        key = (scale, batch, ch, cw)
        if key not in self._device_scale_raw:
            self._device_fn_for(scale, batch, canvas_hw)
        return self._device_scale_raw[key]

    def _device_pipeline_for(self, batch: int, canvases: tuple, upload_kind: str):
        """ONE jit program for the whole batch: uint8-canvas unpack -> all
        TTA scales -> fused/packed download buffer.  The relay link charges
        per-execution overhead, and a single program also lets XLA schedule
        across scale boundaries; the per-scale programs remain for the
        non-fused path and for debugging."""
        key = (upload_kind, batch, canvases)
        if key not in self._device_pipeline:
            from muscle_tpu.inference.upload import (
                square_unpack_fn,
                ycbcr420_unpack_fn,
            )

            raws = [
                self._device_fn_raw(s, batch, cv)
                for s, cv in zip(self.scales, canvases)
            ]
            fuse = self._fuse_gathered
            k = self.max_classes
            acc = self.acc_side
            nc = self.num_classes
            rc = self.return_cam
            nv = jnp.float32(2 * len(self.scales))
            if upload_kind == "ycbcr420":
                unpack = ycbcr420_unpack_fn(self.out_side)
            elif upload_kind == "tight":
                unpack = square_unpack_fn(self.out_side)
            else:
                unpack = None

            @jax.jit
            def pipeline(variables, up_args, orig_sizes, class_idx):
                images = unpack(*up_args) if unpack is not None else up_args[0]
                b = orig_sizes.shape[0]
                accs = {
                    "sgc": jnp.zeros((b, acc, acc, k), jnp.float32),
                    "logits": jnp.zeros((b, nc), jnp.float32),
                }
                if rc:
                    accs["cam"] = jnp.zeros((b, acc, acc, k), jnp.float32)
                for raw in raws:
                    accs = raw(variables, images, orig_sizes, class_idx, accs)
                return fuse(accs, orig_sizes, nv)

            self._device_pipeline[key] = pipeline
        return self._device_pipeline[key]

    @functools.cached_property
    def _fuse_gathered(self):
        """Fusion over the already-gathered K-channel accumulators.  The
        min-max normalisation happens on the accumulation grid; when
        accum_stride > 1 the max/min over that grid track the full-res
        extrema because the maps are bilinear fields of far coarser
        (stride-16) model outputs (extrema of a bilinear field sit at its
        nodes).

        Returns ONE packed (B, bytes) uint8 buffer: the maps bitcast to
        bytes with the f32 score bytes appended — the device->host link is
        a ~30 ms-RTT relay, so fetching maps and scores as separate arrays
        costs a full extra round trip per batch.  The bitcast is exact
        (scores stay f32)."""
        acc_side = self.acc_side
        stride = self.accum_stride
        return_cam = self.return_cam
        quantize = self.download_dtype == "uint8"

        def tobytes(x):
            y = jax.lax.bitcast_convert_type(x, jnp.uint8)
            return y.reshape(y.shape[0], -1)

        @jax.jit
        def fuse(accs, orig_sizes, n_versions):
            rows = jnp.arange(acc_side)[:, None]
            cols = jnp.arange(acc_side)[None, :]

            def norm(m, orig):
                dst = (orig + stride - 1) // stride
                valid = ((rows < dst[0]) & (cols < dst[1]))[..., None]
                fg = jnp.where(m < 0, 0.0, m)
                big = jnp.where(valid, fg, -jnp.inf)
                small = jnp.where(valid, fg, jnp.inf)
                mx = jnp.max(big, axis=(0, 1), keepdims=True)
                mn = jnp.min(small, axis=(0, 1), keepdims=True)
                fg = jnp.where(fg < mn + 1e-6, 0.0, fg)
                out = (fg - mn - 1e-6) / (mx - mn + 1e-6) * valid
                if quantize:
                    return jnp.round(jnp.clip(out, 0.0, 1.0) * 255.0).astype(jnp.uint8)
                return out.astype(jnp.float16)

            sgc = jax.vmap(norm)(accs["sgc"], orig_sizes)
            score = jax.nn.sigmoid(accs["logits"][:, 1:] / n_versions)
            parts = [tobytes(sgc)]
            if return_cam:
                parts.insert(0, tobytes(jax.vmap(norm)(accs["cam"], orig_sizes)))
            parts.append(tobytes(score.astype(jnp.float32)))
            return jnp.concatenate(parts, axis=1)

        return fuse

    def _unpack_fused(self, buf: np.ndarray, k: int):
        """Host-side split of the packed _fuse_gathered buffer back into
        (cam?, sgc, score) arrays."""
        b = buf.shape[0]
        acc = self.acc_side
        itemsize = 1 if self.download_dtype == "uint8" else 2
        map_dt = np.uint8 if itemsize == 1 else np.float16
        nbytes = acc * acc * k * itemsize

        def view(sl, dt, shape):
            return np.ascontiguousarray(sl).view(dt).reshape(shape)

        off = 0
        cam = None
        if self.return_cam:
            cam = view(buf[:, :nbytes], map_dt, (b, acc, acc, k))
            off = nbytes
        sgc = view(buf[:, off : off + nbytes], map_dt, (b, acc, acc, k))
        score = view(buf[:, off + nbytes :], np.float32, (b, self.num_classes - 1))
        return cam, sgc, score

    @functools.cached_property
    def _fuse(self):
        out_side = self.out_side

        @jax.jit
        def fuse(cam_sum, sgc_sum, orig_sizes, logits_sum, n_versions):
            """Per-class min-max fusion (infer_mcl.py:151-164).
            cam_sum/sgc_sum: (B, out, out, C) summed over versions."""
            rows = jnp.arange(out_side)[:, None]
            cols = jnp.arange(out_side)[None, :]

            def norm(m, orig):
                valid = ((rows < orig[0]) & (cols < orig[1]))[..., None]
                fg = jnp.where(m < 0, 0.0, m)[..., 1:]
                big = jnp.where(valid, fg, -jnp.inf)
                small = jnp.where(valid, fg, jnp.inf)
                mx = jnp.max(big, axis=(0, 1), keepdims=True)
                mn = jnp.min(small, axis=(0, 1), keepdims=True)
                fg = jnp.where(fg < mn + 1e-6, 0.0, fg)
                return (fg - mn - 1e-6) / (mx - mn + 1e-6) * valid

            cam = jax.vmap(norm)(cam_sum, orig_sizes)
            sgc = jax.vmap(norm)(sgc_sum, orig_sizes)
            score = jax.nn.sigmoid(logits_sum[:, 1:] / n_versions)
            return cam.astype(jnp.float16), sgc.astype(jnp.float16), score

        return fuse

    def run_batch(self, pil_images, names, labels) -> list[dict]:
        """Returns per-image dicts: name, cam_dict/sgc_dict ({cls: (H, W)}
        float16, labelled classes only) and score (20,) — the exact npy
        artifact contract of infer_mcl.py:166-182."""
        if self.device_tta:
            return self._run_batch_device(pil_images, names, labels)
        from muscle_tpu.data.tta import scaled_size

        b = len(pil_images)
        cam_sum = jnp.zeros((b, self.out_side, self.out_side, self.num_classes), jnp.float32)
        sgc_sum = jnp.zeros_like(cam_sum)
        logits_sum = jnp.zeros((b, self.num_classes), jnp.float32)
        orig_sizes = None
        for s in self.scales:
            # offsets/canvas from the EXACT host-side scaled sizes (Python
            # round, like msf_batch) — TF-SAME alignment placement
            scaled = np.asarray(
                [scaled_size(*img.size, s)[::-1] for img in pil_images], np.int32
            )
            if self.lowres:
                off = placement_offset(scaled, N_STRIDED_ENC)
            else:
                off = np.zeros_like(scaled)
            ch = -(-int(np.max(scaled[:, 0] + off[:, 0])) // 64) * 64
            cw = -(-int(np.max(scaled[:, 1] + off[:, 1])) // 64) * 64
            mb = msf_batch(pil_images, names, s, canvas=(ch, cw), offsets=off)
            fn = self._fn_for(s, b, (ch, cw))
            win = np.concatenate([off, mb.sizes], axis=-1)
            cam_sum, sgc_sum, logits_sum = fn(
                self.variables,
                jnp.asarray(mb.images), jnp.asarray(win), jnp.asarray(mb.orig_sizes),
                cam_sum, sgc_sum, logits_sum,
            )
            orig_sizes = mb.orig_sizes
        cam, sgc, score = self._fuse(
            cam_sum, sgc_sum, jnp.asarray(orig_sizes), logits_sum,
            jnp.float32(2 * len(self.scales)),
        )
        cam, sgc, score = np.asarray(cam), np.asarray(sgc), np.asarray(score)

        out = []
        for i, name in enumerate(names):
            hh, ww = orig_sizes[i]
            lab = np.asarray(labels[i])
            keep = np.nonzero(lab > 1e-5)[0]
            out.append(
                {
                    "name": name,
                    "cam": {k: cam[i, :hh, :ww, k] for k in keep},
                    "sgc": {k: sgc[i, :hh, :ww, k] for k in keep},
                    "score": score[i],
                }
            )
        return out

    def run_batch_exact(self, pil_images, names, labels) -> list[dict]:
        """Bit-parity TTA mode: images grouped by identical pixel shape and
        run at their EXACT sizes (no canvas padding), reproducing the
        reference's per-image forwards (infer_mcl.py:107-146) while still
        batching the dominant VOC shapes.  One compile per (shape, scale)
        — use for fidelity gates; the padded canvas paths are the fast
        production modes.
        """
        from muscle_tpu.data.tta import group_by_shape, scaled_size
        from muscle_tpu.data import transforms as T

        groups = group_by_shape(pil_images, names)
        results: dict[int, dict] = {}
        for (w, h), idxs in groups.items():
            g = len(idxs)
            cam_sum = jnp.zeros((g, h, w, self.num_classes), jnp.float32)
            sgc_sum = jnp.zeros_like(cam_sum)
            logits_sum = jnp.zeros((g, self.num_classes), jnp.float32)
            for s in self.scales:
                tw, th = scaled_size(w, h, s)
                batch = np.empty((2 * g, th, tw, 3), np.float32)
                for j, i in enumerate(idxs):
                    arr = T.color_norm(
                        np.asarray(pil_images[i].resize((tw, th), resample=T.BICUBIC))
                    )
                    batch[2 * j] = arr
                    batch[2 * j + 1] = arr[:, ::-1]
                fn = self._exact_fn_for((th, tw), (h, w), g)
                cam_sum, sgc_sum, logits_sum = fn(
                    self.variables, jnp.asarray(batch), cam_sum, sgc_sum, logits_sum
                )
            # reference fusion (infer_mcl.py:151-164) on exact-size maps
            cam, sgc, score = self._fuse_exact(cam_sum, sgc_sum, logits_sum,
                                               jnp.float32(2 * len(self.scales)))
            cam, sgc, score = np.asarray(cam), np.asarray(sgc), np.asarray(score)
            for j, i in enumerate(idxs):
                keep = np.nonzero(np.asarray(labels[i]) > 1e-5)[0]
                results[i] = {
                    "name": names[i],
                    "cam": {int(k): cam[j, :, :, k] for k in keep},
                    "sgc": {int(k): sgc[j, :, :, k] for k in keep},
                    "score": score[j],
                }
        return [results[i] for i in range(len(pil_images))]

    def _exact_fn_for(self, in_hw, out_hw, batch):
        key = ("exact", in_hw, out_hw, batch)
        if key not in self._scale_fn:
            from muscle_tpu.core.resize import resize_bilinear

            model = self.model
            cdt = self.compute_dtype
            spatial_sh = self._spatial_sharding

            @functools.partial(jax.jit, donate_argnums=(2, 3, 4))
            def run(variables, images, cam_sum, sgc_sum, logits_sum):
                if spatial_sh is not None:
                    images = jax.lax.with_sharding_constraint(images, spatial_sh)
                cams, sgcs, _, logits = model.apply(variables, images.astype(cdt), mode="cam")
                cams = resize_bilinear(cams.astype(jnp.float32), out_hw, align_corners=False)
                sgcs = resize_bilinear(sgcs.astype(jnp.float32), out_hw, align_corners=False)
                g = cam_sum.shape[0]
                cams = cams.reshape(g, 2, *cams.shape[1:])
                sgcs = sgcs.reshape(g, 2, *sgcs.shape[1:])
                # un-flip the odd versions
                cam_acc = cams[:, 0] + cams[:, 1, :, ::-1]
                sgc_acc = sgcs[:, 0] + sgcs[:, 1, :, ::-1]
                logits = logits.astype(jnp.float32).reshape(g, 2, -1).sum(axis=1)
                return cam_sum + cam_acc, sgc_sum + sgc_acc, logits_sum + logits

            self._scale_fn[key] = run
        return self._scale_fn[key]

    @functools.cached_property
    def _fuse_exact(self):
        @jax.jit
        def fuse(cam_sum, sgc_sum, logits_sum, n_versions):
            def norm(m):
                fg = jnp.where(m < 0, 0.0, m)[..., 1:]
                mx = jnp.max(fg, axis=(1, 2), keepdims=True)
                mn = jnp.min(fg, axis=(1, 2), keepdims=True)
                fg = jnp.where(fg < mn + 1e-6, 0.0, fg)
                return (fg - mn - 1e-6) / (mx - mn + 1e-6)

            score = jax.nn.sigmoid(logits_sum[:, 1:] / n_versions)
            return norm(cam_sum), norm(sgc_sum), score

        return fuse

    def run_batch_async(self, pil_images, names, labels):
        """Dispatch a device_tta batch without blocking; returns a
        ``finalize() -> list[dict]`` closure.  Call the next batch's
        dispatch before finalizing this one to overlap the device->host
        download with the next batch's compute (2-deep pipeline)."""
        assert self.device_tta, "async pipeline requires device_tta"
        return self._run_batch_device(pil_images, names, labels, defer=True)

    def _host_prep(self, pil_images, names, labels):
        """Host-side stage of the device_tta path: canvas packing + class
        budget.  Pure CPU work (PIL, numpy) — safe to run on a prefetch
        thread while the device computes the previous batch."""
        from muscle_tpu.data.tta import pack_canvas, pack_canvas_ycbcr

        b = len(pil_images)
        if self.upload_mode == "ycbcr420":
            y, c, orig_sizes, transposed = pack_canvas_ycbcr(
                pil_images, names, self.out_side, self.tight_upload
            )
            upload = ("ycbcr420", y, c, transposed)
        elif self.tight_upload:
            canvas, orig_sizes, transposed = pack_canvas(
                pil_images, names, self.out_side, True
            )
            upload = ("tight", canvas, transposed)
        else:
            canvas, orig_sizes, _ = pack_canvas(
                pil_images, names, self.out_side, False
            )
            upload = ("rgb", canvas)

        k = self.max_classes
        class_idx = np.zeros((b, k), np.int32)
        counts = np.zeros(b, np.int32)
        for i, lab in enumerate(labels):
            keep = np.nonzero(np.asarray(lab) > 1e-5)[0][:k]
            class_idx[i, : len(keep)] = keep
            counts[i] = len(keep)
        return {
            "b": b,
            "names": list(names),
            "upload": upload,
            "orig_sizes": orig_sizes,
            "class_idx": class_idx,
            "counts": counts,
        }

    def bench_device_exec(self, pil_images, names, labels):
        """Zero-arg executor for device-only benchmarking: host-prep and
        upload ONCE, return a closure that re-dispatches the fused TTA
        pipeline on the resident inputs.  bench.py times chained
        executions of it to separate device compute from the host<->device
        link — congestion on the relay inflates the wall (stream) rate but
        not this number."""
        assert self.fuse_dispatch, "device-only bench requires fused dispatch"
        prep = self._host_prep(pil_images, names, labels)
        b = prep["b"]
        orig_sizes = prep["orig_sizes"]
        canvases = tuple(
            _batch_canvas(s, orig_sizes, self.max_side) for s in self.scales
        )
        fn = self._device_pipeline_for(b, canvases, prep["upload"][0])
        args = (
            self.variables,
            tuple(self._put(a, b) for a in prep["upload"][1:]),
            self._put(orig_sizes, b),
            self._put(prep["class_idx"], b),
        )
        return lambda: fn(*args)

    def _run_batch_device(self, pil_images, names, labels, defer: bool = False):
        """device_tta fast path: one uint8 upload per image, all scaling on
        device, label-selected download."""
        b = len(pil_images)
        if b == 0:
            return (lambda: []) if defer else []
        finalize = self._dispatch_prepped(self._host_prep(pil_images, names, labels))
        return finalize if defer else finalize()

    def _dispatch_prepped(self, prep: dict):
        """Upload + enqueue all device programs for a prepped batch; returns
        the (blocking) ``finalize() -> list[dict]`` closure.  Main-thread
        stage of the pipeline: everything here is an async dispatch."""
        from muscle_tpu.inference.upload import square_unpack_fn, ycbcr420_unpack_fn

        b = prep["b"]
        names = prep["names"]
        orig_sizes = prep["orig_sizes"]
        class_idx = prep["class_idx"]
        counts = prep["counts"]
        up = prep["upload"]
        k = self.max_classes
        stride = self.accum_stride

        if self.fuse_dispatch:
            canvases = tuple(
                _batch_canvas(s, orig_sizes, self.max_side) for s in self.scales
            )
            fn = self._device_pipeline_for(b, canvases, up[0])
            fused = fn(
                self.variables,
                tuple(self._put(a, b) for a in up[1:]),
                self._put(orig_sizes, b),
                self._put(class_idx, b),
            )
            return self._make_finalize(fused, names, orig_sizes, class_idx, counts, k)

        if up[0] == "ycbcr420":
            images_dev = ycbcr420_unpack_fn(self.out_side)(
                self._put(up[1], b), self._put(up[2], b), self._put(up[3], b)
            )
        elif up[0] == "tight":
            images_dev = square_unpack_fn(self.out_side)(
                self._put(up[1], b), self._put(up[2], b)
            )
        else:
            images_dev = self._put(up[1], b)

        acc = self.acc_side
        # zeros are created on device (jnp) when unsharded — _put would
        # UPLOAD host zeros through the link; under a mesh they are placed
        # host-side once with the batch sharding
        if self.mesh is None:
            accs = {
                "sgc": jnp.zeros((b, acc, acc, k), jnp.float32),
                "logits": jnp.zeros((b, self.num_classes), jnp.float32),
            }
            if self.return_cam:
                accs["cam"] = jnp.zeros((b, acc, acc, k), jnp.float32)
        else:
            accs = {
                "sgc": self._put(np.zeros((b, acc, acc, k), np.float32), b),
                "logits": self._put(np.zeros((b, self.num_classes), np.float32), b),
            }
            if self.return_cam:
                accs["cam"] = self._put(np.zeros((b, acc, acc, k), np.float32), b)
        sizes_dev = self._put(orig_sizes, b)
        idx_dev = self._put(class_idx, b)
        for s in self.scales:
            fn = self._device_fn_for(s, b, _batch_canvas(s, orig_sizes, self.max_side))
            accs = fn(self.variables, images_dev, sizes_dev, idx_dev, accs)
        fused = self._fuse_gathered(accs, sizes_dev, jnp.float32(2 * len(self.scales)))
        return self._make_finalize(fused, names, orig_sizes, class_idx, counts, k)

    def _make_finalize(self, fused, names, orig_sizes, class_idx, counts, k):
        stride = self.accum_stride

        def expand(m: np.ndarray, hh: int, ww: int) -> np.ndarray:
            """Slice one fused channel to its valid region, dequantise, and
            (accum_stride > 1) bilinearly upsample to the original size on
            host (PIL 'F' resize: half-pixel, C speed)."""
            if self.download_dtype == "uint8":
                m = m.astype(np.float32) / 255.0
            if stride == 1:
                return m[:hh, :ww].astype(np.float16)
            from PIL import Image

            ah = -(-hh // stride)
            aw = -(-ww // stride)
            img = Image.fromarray(np.ascontiguousarray(m[:ah, :aw], np.float32), "F")
            return np.asarray(
                img.resize((ww, hh), Image.BILINEAR), np.float32
            ).astype(np.float16)

        def finalize() -> list[dict]:
            cam, sgc, score = self._unpack_fused(np.asarray(fused), k)
            out = []
            for i, name in enumerate(names):
                hh, ww = orig_sizes[i]
                ks = class_idx[i, : counts[i]]
                rec = {
                    "name": name,
                    "sgc": {int(c): expand(sgc[i, ..., j], hh, ww) for j, c in enumerate(ks)},
                    "score": score[i],
                }
                if cam is not None:
                    rec["cam"] = {
                        int(c): expand(cam[i, ..., j], hh, ww) for j, c in enumerate(ks)
                    }
                out.append(rec)
            return out

        return finalize

    def run_stream(self, batches, prep_ahead: int = 2, finalize_ahead: int = 2):
        """Fully-overlapped streaming pipeline over an iterable of
        ``(pil_images, names, labels)`` batches; yields each batch's result
        list in order.

        Three stages run concurrently:
          prep (thread)     — PIL canvas packing (``_host_prep``; PIL/numpy
                              release the GIL for the heavy copies),
          dispatch (caller) — async uploads + per-scale program enqueue,
          finalize (thread) — blocking device->host fetch + per-class host
                              upsample.
        With ``run_batch_async``'s 2-deep pipeline the caller's thread still
        serialises prep and finalize between dispatches, which on a
        single-vCPU host costs more than the device compute; here the
        device-bound stage is the only one on the critical path.
        """
        import queue as _queue
        import threading

        prep_q: _queue.Queue = _queue.Queue(maxsize=max(1, prep_ahead))
        _SENTINEL = object()

        def produce():
            try:
                for batch in batches:
                    prep_q.put(self._host_prep(*batch))
            except BaseException as e:  # surface in the consumer
                prep_q.put(e)
                return
            prep_q.put(_SENTINEL)

        t = threading.Thread(target=produce, daemon=True)
        t.start()

        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=1) as fin_ex:
            pending: list = []
            while True:
                item = prep_q.get()
                if item is _SENTINEL:
                    break
                if isinstance(item, BaseException):
                    raise item
                finalize = self._dispatch_prepped(item)
                pending.append(fin_ex.submit(finalize))
                if len(pending) > finalize_ahead:
                    yield pending.pop(0).result()
            for fut in pending:
                yield fut.result()
