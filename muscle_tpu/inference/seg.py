"""Batched multi-scale segmentation TTA (reference infer_seg.py).

Same batched-canvas design as CamTTAEngine, with the reference's seg
fusion: softmax per version, resize to original size, MEAN over the 12
versions (6 scales x flip — note CAM fusion uses SUM, seg uses MEAN,
infer_seg.py:117), optional class gating from a classifier npy, optional
dense-CRF refinement, argmax to a palettised PNG.

Two input paths:
  * device_tta (default): one uint8 upload per image; multi-scale bicubic
    resize + normalisation + flip on device (see cam.py — the host link
    bounds throughput otherwise);
  * host path (device_tta=False): PIL-prepped canvases per scale, for
    parity checks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from muscle_tpu.core.resize import dynamic_cubic_resize_weights, dynamic_window_resize
from muscle_tpu.data.tta import msf_batch, bucket_side
from muscle_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD


class SegTTAEngine:
    def __init__(
        self,
        model,
        variables,
        scales=(0.5, 0.75, 1.0, 1.25, 1.5, 1.75),
        num_classes: int = 21,
        out_side: int = 512,
        max_side: int = 500,
        compute_dtype=jnp.float32,
        lowres: bool = True,
        device_tta: bool = True,
    ):
        self.model = model
        self.variables = variables
        self.scales = tuple(scales)
        self.num_classes = num_classes
        self.out_side = out_side
        self.max_side = max_side
        self.compute_dtype = compute_dtype
        # lowres: take stride-4 logits and upsample on the engine side.
        # EXACT vs the reference pipeline (fuse_dec is a 1x1 conv and
        # commutes with the bilinear upsample) while never materialising
        # the full-resolution 256-channel dense feature.
        self.lowres = lowres
        self.device_tta = device_tta
        self._scale_fn = {}

    def _core(self, scale: float, canvas: int):
        """Shared per-scale compute: scaled images -> accumulated probs."""
        model = self.model
        out_side = self.out_side
        cdt = self.compute_dtype
        lowres = self.lowres

        def compute(variables, images, sizes, orig_sizes, acc):
            mode = "seg_lowres" if lowres else "seg"
            seg, _ = model.apply(variables, images.astype(cdt), mode=mode)
            seg = seg.astype(jnp.float32)
            if lowres:
                # stride-4 logits -> input-size logits (== reference
                # seg_map, see class docstring), then softmax
                stride = canvas // seg.shape[1]

                def up(pair, size):
                    wh = (size + stride - 1) // stride
                    box = jnp.concatenate([jnp.zeros(2, jnp.int32), wh])
                    return jax.vmap(
                        lambda m: dynamic_window_resize(
                            m, box, (canvas, canvas), dst_hw=size, align_corners=True
                        )
                    )(pair)

                b2 = seg.shape[0] // 2
                pairs = seg.reshape(b2, 2, *seg.shape[1:])
                seg = jax.vmap(up)(pairs, sizes).reshape(-1, canvas, canvas, seg.shape[-1])
            probs = jax.nn.softmax(seg, axis=-1)

            def per_image(pair, size, orig):
                box = jnp.concatenate([jnp.zeros(2, jnp.int32), size])

                def resize(m, flip):
                    return dynamic_window_resize(
                        m, box, (out_side, out_side), dst_hw=orig,
                        align_corners=False, flip_x=flip,
                    )

                rows = jnp.arange(out_side)[:, None]
                cols = jnp.arange(out_side)[None, :]
                valid = ((rows < orig[0]) & (cols < orig[1]))[..., None]
                return (resize(pair[0], False) + resize(pair[1], True)) * valid

            b = sizes.shape[0]
            pairs = probs.reshape(b, 2, *probs.shape[1:])
            return acc + jax.vmap(per_image)(pairs, sizes, orig_sizes)

        return compute

    def _fn_for(self, scale: float, batch: int):
        key = (scale, batch, False)
        if key not in self._scale_fn:
            canvas = bucket_side(scale, self.max_side)
            compute = self._core(scale, canvas)
            self._scale_fn[key] = jax.jit(compute, donate_argnums=(4,))
        return self._scale_fn[key]

    def _device_fn_for(self, scale: float, batch: int):
        key = (scale, batch, True)
        if key not in self._scale_fn:
            canvas = bucket_side(scale, self.max_side)
            in_side = self.out_side
            compute = self._core(scale, canvas)
            mean = jnp.asarray(IMAGENET_MEAN[0, 0], jnp.float32)
            std = jnp.asarray(IMAGENET_STD[0, 0], jnp.float32)

            @functools.partial(jax.jit, donate_argnums=(3,))
            def run(variables, images_u8, orig_sizes, acc):
                scaled = jnp.round(
                    orig_sizes.astype(jnp.float32) * scale
                ).astype(jnp.int32)

                def make_pair(img_u8, osz, ssz):
                    x = (img_u8.astype(jnp.float32) / 255.0 - mean) / std
                    wh = dynamic_cubic_resize_weights(osz[0], ssz[0], in_side, canvas)
                    ww = dynamic_cubic_resize_weights(osz[1], ssz[1], in_side, canvas)
                    wwf = dynamic_cubic_resize_weights(
                        osz[1], ssz[1], in_side, canvas, flip=True
                    )
                    a = jnp.einsum("Iy,yxc->Ixc", wh, x)
                    return (
                        jnp.einsum("Jx,Ixc->IJc", ww, a),
                        jnp.einsum("Jx,Ixc->IJc", wwf, a),
                    )

                orig_v, flip_v = jax.vmap(make_pair)(images_u8, orig_sizes, scaled)
                images = jnp.stack([orig_v, flip_v], axis=1).reshape(-1, canvas, canvas, 3)
                return compute(variables, images, scaled, orig_sizes, acc)

            self._scale_fn[key] = run
        return self._scale_fn[key]

    def run_batch(self, pil_images, names, cls_gates=None) -> list[dict]:
        """Returns per-image {'name', 'probs' (H, W, C) float32} — the mean
        TTA softmax BEFORE CRF (CRF and argmax are applied by the caller so
        both the XLA and the exact C++ CRF backends can be used)."""
        b = len(pil_images)
        acc = jnp.zeros((b, self.out_side, self.out_side, self.num_classes), jnp.float32)

        if self.device_tta:
            side = self.out_side
            canvas = np.zeros((b, side, side, 3), np.uint8)
            orig_sizes = np.zeros((b, 2), np.int32)
            for i, img in enumerate(pil_images):
                w, h = img.size
                if h > side or w > side:
                    raise ValueError(f"image {names[i]} ({h}x{w}) exceeds canvas {side}")
                canvas[i, :h, :w] = np.asarray(img)[..., :3]
                orig_sizes[i] = (h, w)
            images_dev = jnp.asarray(canvas)
            sizes_dev = jnp.asarray(orig_sizes)
            for s in self.scales:
                acc = self._device_fn_for(s, b)(self.variables, images_dev, sizes_dev, acc)
        else:
            orig_sizes = None
            for s in self.scales:
                mb = msf_batch(pil_images, names, s, canvas=bucket_side(s, self.max_side))
                acc = self._fn_for(s, b)(
                    self.variables,
                    jnp.asarray(mb.images), jnp.asarray(mb.sizes),
                    jnp.asarray(mb.orig_sizes), acc,
                )
                orig_sizes = mb.orig_sizes

        mean = np.asarray(acc) / (2 * len(self.scales))
        out = []
        for i, name in enumerate(names):
            hh, ww = orig_sizes[i]
            probs = mean[i, :hh, :ww]
            if cls_gates is not None and cls_gates[i] is not None:
                gate = np.asarray(cls_gates[i]).reshape(-1)
                probs = probs.copy()
                probs[..., 1:] *= gate[1:][None, None, :]
            out.append({"name": name, "probs": probs})
        return out
