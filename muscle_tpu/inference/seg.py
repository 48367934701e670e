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
from muscle_tpu.models.efficientnet import advance_window, placement_offset

# stride-2 convs in the dec ('seg') backbone ladder (last_pooling=True ->
# stride 32): placement offsets for the window-exact mode are <= 31 px
N_STRIDED_DEC = 5


class SegTTAEngine:
    """12-version seg TTA.

    accum_stride: 1 = accumulate mean probs at full original resolution
    (parity mode; the download is (B, out, out, 21) — 176 MB f32 per
    8-image batch, which dominates wall time on any host link).  N>1 =
    accumulate on an out_side/N grid and bilinearly upsample to original
    size on host — the probs come from stride-4 logits anyway, so N=4
    loses nothing structural and cuts the download N^2-fold (documented
    deviation, same family as CamTTAEngine's).
    download_dtype: 'float32' (parity) or 'float16' (halves the link; the
    probs feed log-unary CRFs, so f16 — which keeps small-prob exponent
    range — is used rather than uint8).
    tight_upload: see CamTTAEngine (exact).  Default True (VERDICT r4
    item 4: the production upload optimizations are the engine default;
    pass False for the parity layout).
    upload_mode: 'ycbcr420' (default — chroma-subsampled upload, see
    CamTTAEngine / inference/upload.py; deviation bounded by
    tests/test_inference.py and gate 7 fast) or 'rgb' (parity).
    output: 'probs' (default) returns the mean TTA softmax per image so
    the caller can run either CRF backend; 'labels' (device_tta only)
    fuses the final upsample-to-original-size AND the argmax into the
    device pipeline and downloads ONE uint8 label map per image —
    ~44x less download than the f16 prob grid and no host per-channel
    upsample, for the no-CRF / XLA-CRF-free production path
    (reference chain: softmax-mean -> resize -> argmax,
    infer_seg.py:101-133 minus the optional CRF).  argmax commutes with
    the /n mean, and the device bilinear upsample uses the same
    half-pixel semantics as the host PIL path (core/resize.py), so the
    only deviation vs output='probs' + host argmax is f32-vs-PIL
    interpolation rounding at class boundaries (bounded by gate 7 fast's
    labels_agreement row).  cls_gates are not supported in labels mode.
    mesh: shard the batch over the mesh's 'data' axis (see CamTTAEngine).
    shard_spatial: additionally shard image HEIGHT over the mesh's 'model'
    axis (parallel.mesh.spatial_sharding) — GSPMD halo-exchange convs, so
    a batch smaller than the slice still uses every chip.
    """

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
        accum_stride: int = 1,
        download_dtype: str = "float32",
        tight_upload: bool = True,
        upload_mode: str = "ycbcr420",
        mesh=None,
        shard_spatial: bool = False,
        window_exact: bool = True,
        output: str = "probs",
    ):
        self.model = model
        self.variables = variables
        self.mesh = mesh
        self._spatial_sharding = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            self._batch_sharding = NamedSharding(mesh, P("data"))
            self.variables = jax.device_put(variables, NamedSharding(mesh, P()))
            if shard_spatial:
                # see CamTTAEngine: image height over 'model' -> GSPMD
                # halo-exchange convs, latency scaling for small batches
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
        # lowres: take stride-4 logits and upsample on the engine side.
        # EXACT vs the reference pipeline (fuse_dec is a 1x1 conv and
        # commutes with the bilinear upsample) while never materialising
        # the full-resolution 256-channel dense feature.
        self.lowres = lowres
        self.device_tta = device_tta
        if out_side % accum_stride:
            raise ValueError("accum_stride must divide out_side")
        self.accum_stride = accum_stride
        self.acc_side = out_side // accum_stride
        self.download_dtype = download_dtype
        self.tight_upload = tight_upload
        if upload_mode not in ("rgb", "ycbcr420"):
            raise ValueError(f"unsupported upload_mode {upload_mode!r}")
        self.upload_mode = upload_mode
        # window_exact: TF-SAME alignment placement + per-stage window
        # re-zeroing through the backbone AND the BiFPN (models/bifpn.py
        # window mode) — the padded-canvas forward equals the reference's
        # unpadded forward (closes the seg half of DEVIATIONS.md #8).
        self.window_exact = window_exact
        if output not in ("probs", "labels"):
            raise ValueError(f"unsupported output {output!r}")
        if output == "labels" and not device_tta:
            raise ValueError("output='labels' requires device_tta=True "
                             "(the argmax is fused into the device pipeline)")
        self.output = output
        self._scale_fn = {}
        self._scale_raw = {}
        self._device_pipeline = {}
        # one jit program per batch shape (unpack + every scale + finish)
        # instead of len(scales)+2 chained dispatches; the relay link
        # charges per-execution overhead (see CamTTAEngine._device_pipeline_for)
        self.fuse_dispatch = device_tta

    def _core(self, scale: float, canvas_h: int, canvas_w: int):
        """Shared per-scale compute: scaled images -> accumulated probs.
        The canvas may be rectangular (see cam.py _batch_canvas)."""
        model = self.model
        acc_side = self.acc_side
        acc_stride = self.accum_stride
        cdt = self.compute_dtype
        lowres = self.lowres

        window_exact = self.window_exact

        def compute(variables, images, sizes, orig_sizes, acc):
            mode = "seg_lowres" if lowres else "seg"
            if window_exact:
                # per-image TF-SAME alignment windows (the caller placed
                # the images at placement_offset(sizes)); orig and flip are
                # interleaved in the batch, so each window repeats twice
                off = placement_offset(sizes, N_STRIDED_DEC)
                win = jnp.concatenate([off, sizes], axis=-1)
                seg, _ = model.apply(
                    variables, images.astype(cdt), mode=mode,
                    valid_window=jnp.repeat(win, 2, axis=0),
                )
            else:
                off = jnp.zeros_like(sizes)
                seg, _ = model.apply(variables, images.astype(cdt), mode=mode)
            seg = seg.astype(jnp.float32)
            if lowres:
                # stride-8 p3 logits -> input-size logits (== reference
                # seg_map, see class docstring), then softmax
                stride = canvas_h // seg.shape[1]
                n_adv = stride.bit_length() - 1

                def up(pair, size, box):
                    return jax.vmap(
                        lambda m: dynamic_window_resize(
                            m, box, (canvas_h, canvas_w), dst_hw=size,
                            align_corners=True,
                        )
                    )(pair)

                if window_exact:
                    boxes = jnp.concatenate([off, sizes], axis=-1)
                    for _ in range(n_adv):
                        boxes = advance_window(boxes)
                else:
                    wh = (sizes + stride - 1) // stride
                    boxes = jnp.concatenate([jnp.zeros_like(sizes), wh], axis=-1)
                b2 = seg.shape[0] // 2
                pairs = seg.reshape(b2, 2, *seg.shape[1:])
                seg = jax.vmap(up)(pairs, sizes, boxes).reshape(
                    -1, canvas_h, canvas_w, seg.shape[-1]
                )
            probs = jax.nn.softmax(seg, axis=-1)

            def per_image(pair, size, orig):
                box = jnp.concatenate([jnp.zeros(2, jnp.int32), size])
                dst = (orig + acc_stride - 1) // acc_stride

                def resize(m, flip):
                    return dynamic_window_resize(
                        m, box, (acc_side, acc_side), dst_hw=dst,
                        align_corners=False, flip_x=flip,
                    )

                rows = jnp.arange(acc_side)[:, None]
                cols = jnp.arange(acc_side)[None, :]
                valid = ((rows < dst[0]) & (cols < dst[1]))[..., None]
                return (resize(pair[0], False) + resize(pair[1], True)) * valid

            b = sizes.shape[0]
            pairs = probs.reshape(b, 2, *probs.shape[1:])
            return acc + jax.vmap(per_image)(pairs, sizes, orig_sizes)

        return compute

    def _fn_for(self, scale: float, batch: int, canvas_hw=None):
        side = bucket_side(scale, self.max_side)
        ch, cw = canvas_hw or (side, side)
        key = (scale, batch, ch, cw, False)
        if key not in self._scale_fn:
            compute = self._core(scale, ch, cw)
            self._scale_fn[key] = jax.jit(compute, donate_argnums=(4,))
        return self._scale_fn[key]

    def _device_fn_for(self, scale: float, batch: int, canvas_hw=None):
        side = bucket_side(scale, self.max_side)
        ch, cw = canvas_hw or (side, side)
        key = (scale, batch, ch, cw, True)
        if key not in self._scale_fn:
            in_side = self.out_side
            compute = self._core(scale, ch, cw)
            mean = jnp.asarray(IMAGENET_MEAN[0, 0], jnp.float32)
            std = jnp.asarray(IMAGENET_STD[0, 0], jnp.float32)
            spatial_sh = self._spatial_sharding

            window_exact = self.window_exact

            @functools.partial(jax.jit, donate_argnums=(3,))
            def run(variables, images_u8, orig_sizes, acc):
                scaled = jnp.round(
                    orig_sizes.astype(jnp.float32) * scale
                ).astype(jnp.int32)
                if window_exact:
                    # TF-SAME alignment placement (see CamTTAEngine)
                    off = placement_offset(scaled, N_STRIDED_DEC)
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
                    return (
                        jnp.einsum("Jx,Ixc->IJc", ww, a),
                        jnp.einsum("Jx,Ixc->IJc", wwf, a),
                    )

                orig_v, flip_v = jax.vmap(make_pair)(
                    images_u8, orig_sizes, scaled, off
                )
                images = jnp.stack([orig_v, flip_v], axis=1).reshape(-1, ch, cw, 3)
                if spatial_sh is not None:
                    images = jax.lax.with_sharding_constraint(images, spatial_sh)
                return compute(variables, images, scaled, orig_sizes, acc)

            self._scale_raw[key] = run.__wrapped__
            self._scale_fn[key] = run
        return self._scale_fn[key]

    def _device_fn_raw(self, scale: float, batch: int, canvas_hw=None):
        side = bucket_side(scale, self.max_side)
        ch, cw = canvas_hw or (side, side)
        key = (scale, batch, ch, cw, True)
        if key not in self._scale_raw:
            self._device_fn_for(scale, batch, canvas_hw)
        return self._scale_raw[key]

    def _device_pipeline_for(self, batch: int, canvases: tuple, upload_kind: str):
        """ONE jit program: unpack -> all TTA scales -> mean/downcast (see
        CamTTAEngine._device_pipeline_for)."""
        key = (upload_kind, batch, canvases, self.output)
        if key not in self._device_pipeline:
            from muscle_tpu.inference.upload import (
                square_unpack_fn,
                ycbcr420_unpack_fn,
            )

            raws = [
                self._device_fn_raw(s, batch, cv)
                for s, cv in zip(self.scales, canvases)
            ]
            labels = self.output == "labels"
            finish = self._labels_finish if labels else self._finish
            acc_side = self.acc_side
            nc = self.num_classes
            if upload_kind == "ycbcr420":
                unpack = ycbcr420_unpack_fn(self.out_side)
            elif upload_kind == "tight":
                unpack = square_unpack_fn(self.out_side)
            else:
                unpack = None

            @jax.jit
            def pipeline(variables, up_args, orig_sizes):
                images = unpack(*up_args) if unpack is not None else up_args[0]
                b = orig_sizes.shape[0]
                acc = jnp.zeros((b, acc_side, acc_side, nc), jnp.float32)
                for raw in raws:
                    acc = raw(variables, images, orig_sizes, acc)
                if labels:
                    return finish(acc, orig_sizes)
                return finish(acc)

            self._device_pipeline[key] = pipeline
        return self._device_pipeline[key]

    def _put(self, x, b: int):
        """See CamTTAEngine._put."""
        if self.mesh is None:
            return jnp.asarray(x)
        from jax.sharding import NamedSharding, PartitionSpec as P

        if b % self.mesh.shape["data"] == 0:
            return jax.device_put(np.asarray(x), self._batch_sharding)
        return jax.device_put(np.asarray(x), NamedSharding(self.mesh, P()))

    @functools.cached_property
    def _finish(self):
        n = jnp.float32(2 * len(self.scales))
        f16 = self.download_dtype == "float16"

        @jax.jit
        def finish(acc):
            mean = acc / n
            return mean.astype(jnp.float16) if f16 else mean

        return finish

    @functools.cached_property
    def _labels_finish(self):
        """output='labels' tail: per-image window upsample of the summed
        probs to original size inside the (out_side, out_side) canvas +
        argmax -> uint8.  argmax is scale-invariant so the /n mean is
        skipped; half-pixel (PIL/cv2) sampling matches the host _expand."""
        stride = self.accum_stride
        out_side = self.out_side

        @jax.jit
        def finish(acc, orig_sizes):
            def per_image(m, orig):
                awh = (orig + stride - 1) // stride
                box = jnp.concatenate([jnp.zeros(2, jnp.int32), awh])
                up = dynamic_window_resize(
                    m, box, (out_side, out_side), dst_hw=orig,
                    align_corners=False,
                )
                return jnp.argmax(up, axis=-1).astype(jnp.uint8)

            return jax.vmap(per_image)(acc, orig_sizes)

        return finish

    def run_batch(self, pil_images, names, cls_gates=None) -> list[dict]:
        """output='probs': per-image {'name', 'probs' (H, W, C) float32} —
        the mean TTA softmax BEFORE CRF (CRF and argmax are applied by the
        caller so both the XLA and the exact C++ CRF backends can be used).
        output='labels': per-image {'name', 'label' (H, W) uint8} — argmax
        fused on device (see class docstring)."""
        return self._run_batch(pil_images, names, cls_gates, defer=False)

    def run_batch_async(self, pil_images, names, cls_gates=None):
        """Dispatch without blocking; returns finalize() -> list[dict] (see
        CamTTAEngine.run_batch_async — overlap the download + host upsample
        of batch n with batch n+1's upload + compute)."""
        return self._run_batch(pil_images, names, cls_gates, defer=True)

    def _host_prep(self, pil_images, names, cls_gates=None):
        """Host-side stage (CPU canvas packing) — see CamTTAEngine._host_prep."""
        from muscle_tpu.data.tta import pack_canvas, pack_canvas_ycbcr

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
            canvas, orig_sizes, _ = pack_canvas(pil_images, names, self.out_side, False)
            upload = ("rgb", canvas)
        return {
            "b": len(pil_images),
            "names": list(names),
            "upload": upload,
            "orig_sizes": orig_sizes,
            "cls_gates": cls_gates,
        }

    def bench_device_exec(self, pil_images, names):
        """Zero-arg executor for device-only benchmarking (see
        CamTTAEngine.bench_device_exec): prep + upload once, return a
        closure re-dispatching the fused seg TTA pipeline on the resident
        inputs."""
        from muscle_tpu.inference.cam import _batch_canvas

        assert self.fuse_dispatch, "device-only bench requires fused dispatch"
        prep = self._host_prep(pil_images, names)
        b = prep["b"]
        orig_sizes = prep["orig_sizes"]
        canvases = tuple(
            _batch_canvas(s, orig_sizes, self.max_side, n_strided=N_STRIDED_DEC)
            for s in self.scales
        )
        fn = self._device_pipeline_for(b, canvases, prep["upload"][0])
        args = (
            self.variables,
            tuple(self._put(a, b) for a in prep["upload"][1:]),
            self._put(orig_sizes, b),
        )
        return lambda: fn(*args)

    def _run_batch(self, pil_images, names, cls_gates, defer: bool):
        b = len(pil_images)

        if self.device_tta:
            finalize = self._dispatch_prepped(
                self._host_prep(pil_images, names, cls_gates)
            )
            return finalize if defer else finalize()
        else:
            assert not defer, "async pipeline requires device_tta"
            from muscle_tpu.data.tta import scaled_size

            acc = jnp.zeros(
                (b, self.acc_side, self.acc_side, self.num_classes), jnp.float32
            )
            orig_sizes = None
            for s in self.scales:
                # host-side scaled sizes + TF-SAME placement, like
                # CamTTAEngine.run_batch — _core recomputes the same
                # offsets from mb.sizes on device
                scaled = np.asarray(
                    [scaled_size(*img.size, s)[::-1] for img in pil_images],
                    np.int32,
                )
                if self.window_exact:
                    off = placement_offset(scaled, N_STRIDED_DEC)
                else:
                    off = np.zeros_like(scaled)
                ch = -(-int(np.max(scaled[:, 0] + off[:, 0])) // 64) * 64
                cw = -(-int(np.max(scaled[:, 1] + off[:, 1])) // 64) * 64
                mb = msf_batch(pil_images, names, s, canvas=(ch, cw), offsets=off)
                acc = self._fn_for(s, b, (ch, cw))(
                    self.variables,
                    jnp.asarray(mb.images), jnp.asarray(mb.sizes),
                    jnp.asarray(mb.orig_sizes), acc,
                )
                orig_sizes = mb.orig_sizes
        fused = self._finish(acc)

        def finalize() -> list[dict]:
            mean = np.asarray(fused)
            out = []
            for i, name in enumerate(names):
                hh, ww = orig_sizes[i]
                probs = self._expand(mean[i], hh, ww)
                if cls_gates is not None and cls_gates[i] is not None:
                    gate = np.asarray(cls_gates[i]).reshape(-1)
                    probs[..., 1:] *= gate[1:][None, None, :]
                out.append({"name": name, "probs": probs})
            return out

        return finalize()

    def _dispatch_prepped(self, prep: dict):
        """Upload + enqueue the device programs; returns finalize()."""
        from muscle_tpu.inference.upload import square_unpack_fn, ycbcr420_unpack_fn
        from muscle_tpu.inference.cam import _batch_canvas

        b = prep["b"]
        names = prep["names"]
        orig_sizes = prep["orig_sizes"]
        cls_gates = prep["cls_gates"]
        if self.output == "labels" and cls_gates is not None:
            raise ValueError("cls_gates are applied to probabilities; use "
                             "output='probs' (labels mode fuses the argmax)")
        up = prep["upload"]
        if self.fuse_dispatch:
            canvases = tuple(
                _batch_canvas(s, orig_sizes, self.max_side, n_strided=N_STRIDED_DEC)
            for s in self.scales
            )
            fused = self._device_pipeline_for(b, canvases, up[0])(
                self.variables,
                tuple(self._put(a, b) for a in up[1:]),
                self._put(orig_sizes, b),
            )
        else:
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

            acc = jnp.zeros(
                (b, self.acc_side, self.acc_side, self.num_classes), jnp.float32
            )
            if self.mesh is not None:
                acc = self._put(
                    np.zeros(
                        (b, self.acc_side, self.acc_side, self.num_classes),
                        np.float32,
                    ),
                    b,
                )
            sizes_dev = self._put(orig_sizes, b)
            for s in self.scales:
                acc = self._device_fn_for(
                    s, b, _batch_canvas(s, orig_sizes, self.max_side, n_strided=N_STRIDED_DEC)
                )(self.variables, images_dev, sizes_dev, acc)
            fused = self._finish(acc)

        if self.output == "labels":
            def finalize() -> list[dict]:
                lab = np.asarray(fused)  # (B, out_side, out_side) uint8
                return [
                    {"name": name, "label": lab[i, :orig_sizes[i][0], :orig_sizes[i][1]]}
                    for i, name in enumerate(names)
                ]

            return finalize

        def finalize() -> list[dict]:
            mean = np.asarray(fused)
            out = []
            for i, name in enumerate(names):
                hh, ww = orig_sizes[i]
                probs = self._expand(mean[i], hh, ww)
                if cls_gates is not None and cls_gates[i] is not None:
                    gate = np.asarray(cls_gates[i]).reshape(-1)
                    probs[..., 1:] *= gate[1:][None, None, :]
                out.append({"name": name, "probs": probs})
            return out

        return finalize

    def _expand(self, m: np.ndarray, hh: int, ww: int) -> np.ndarray:
        """Valid slice + (accum_stride > 1) host bilinear upsample of one
        image's (acc, acc, C) mean probs to (hh, ww, C) f32."""
        if self.accum_stride == 1:
            return m[:hh, :ww].astype(np.float32)
        from PIL import Image

        stride = self.accum_stride
        ah = -(-hh // stride)
        aw = -(-ww // stride)
        chans = [
            np.asarray(
                Image.fromarray(
                    np.ascontiguousarray(m[:ah, :aw, c], np.float32), "F"
                ).resize((ww, hh), Image.BILINEAR),
                np.float32,
            )
            for c in range(m.shape[-1])
        ]
        return np.stack(chans, axis=-1)

    def run_stream(self, batches, prep_ahead: int = 1, finalize_ahead: int = 1):
        """Fully-overlapped streaming pipeline over an iterable of
        ``(pil_images, names[, cls_gates])`` batches; yields each batch's
        result list in order (see CamTTAEngine.run_stream).

        Default depth is SHALLOWER than the CAM engine's: seg batches
        download ~2.8 MB of class probabilities each, and on the relay
        link a deeper in-flight queue delays those fetches behind the
        next batches' uploads (measured: depth 2/2 runs ~20% slower than
        2-in-flight; depth 1/1 matches it with the same threaded shape)."""
        import queue as _queue
        import threading
        from concurrent.futures import ThreadPoolExecutor

        assert self.device_tta, "run_stream requires device_tta"
        prep_q: _queue.Queue = _queue.Queue(maxsize=max(1, prep_ahead))
        _SENTINEL = object()

        def produce():
            try:
                for batch in batches:
                    prep_q.put(self._host_prep(*batch))
            except BaseException as e:
                prep_q.put(e)
                return
            prep_q.put(_SENTINEL)

        threading.Thread(target=produce, daemon=True).start()
        with ThreadPoolExecutor(max_workers=1) as fin_ex:
            pending: list = []
            while True:
                item = prep_q.get()
                if item is _SENTINEL:
                    break
                if isinstance(item, BaseException):
                    raise item
                pending.append(fin_ex.submit(self._dispatch_prepped(item)))
                if len(pending) > finalize_ahead:
                    yield pending.pop(0).result()
            for fut in pending:
                yield fut.result()
