"""IRN random-walk pseudo-label refinement driver (reference infer_irn.py).

TPU design: the edge map is padded with 1.0 to a STATIC grid before the
random walk.  Padding with edge=1 gives zero affinity to/from pad vertices
and zero CAM mass on them, so the walk restricted to the valid region is
*exactly* the walk on the unpadded graph — one compiled program serves
every image size in the dataset (the reference re-builds PathIndex and a
fresh HW x HW matrix per image on CPU+GPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from muscle_tpu.core.resize import resize_bilinear
from muscle_tpu.data import transforms as T
from muscle_tpu.ops.random_walk import propagate_to_edge


class RandomWalkRefiner:
    """Refine CAM score dicts into pseudo-labels.

    Args:
      irn_model: EdgeDisplacement module.
      variables: its flax variables.
      beta, exp_times, bg_threshold: reference defaults 8 / 6 / 0.35
        (infer_irn.py:23-27).
      crop_size: max IRN pad size (512); the walk grid is crop // stride.
      bucket: pad each image to the smallest multiple of ``bucket`` that
        fits (256/384/512 for VOC) instead of always ``crop_size`` — small
        images skip up to ~4x of edge-forward + walk compute.  0 disables
        (every image uses crop_size, one compiled program).
      walk_method: 'stencil' (default; scatter-free construction + spatial-
        stencil walk — VMEM-resident Pallas step loop on TPU backends),
        'banded', 'vector', or 'power'.
      fast_io: production IO mode.  Parity mode moves ~49 MB/image over
        the host<->device link (f32 orig+flip pair up, f32 dense 20-class
        CAM stack up, f32 full-res scores down); fast_io uploads the image
        ONCE as YCbCr 4:2:0 (normalisation + flip on device), the CAMs as
        K labelled channels in f16 ALREADY AT THE WALK GRID (host window
        downsample — the walk never consumes finer; scattered to the
        21-class stack on device), and downloads the walk output at the
        stride-4 grid in f16, upsampled to image size on host (or, with
        output='labels', one uint8 label map) — ~0.6 MB/image, same
        family of bounded deviations as the TTA engines (DEVIATIONS.md
        #9/#13/#14; bounded by tests/test_inference.py).
      max_classes: fast_io per-image class budget FLOOR — each size-bucket
        group sizes its actual budget to the largest CAM dict in the group
        (a per-program shape constant), so classes are never dropped; the
        floor only bounds recompiles.
    """

    def __init__(
        self,
        irn_model,
        variables,
        beta: int = 8,
        exp_times: int = 6,
        bg_threshold: float = 0.35,
        radius: int = 5,
        crop_size: int = 512,
        stride: int = 4,
        walk_method: str = "stencil",
        bucket: int = 128,
        fast_io: bool = False,
        max_classes: int = 4,
        compute_dtype=jnp.float32,
        output: str = "scores",
    ):
        self.model = irn_model
        self.variables = variables
        self.beta = beta
        self.exp_times = exp_times
        self.bg_threshold = bg_threshold
        self.radius = radius
        self.crop_size = crop_size
        self.stride = stride
        self.grid = crop_size // stride  # max walk grid side
        self.bucket = bucket
        self.walk_method = walk_method
        self.fast_io = fast_io
        self.max_classes = max_classes
        # output='labels' (fast_io only): fuse the reference tail — clamp-
        # replicate at the window edge, 4x half-pixel upsample, window /max,
        # bg threshold, argmax (infer_irn.py:79-88) — into the device
        # program and download ONE uint8 label map per image instead of the
        # (21, grid, grid) f16 scores + 21 host PIL upsamples.  Deviation:
        # f32-vs-PIL interpolation rounding at class boundaries only
        # (bounded by tests/test_inference.py::test_irn_labels_mode).
        if output not in ("scores", "labels"):
            raise ValueError(f"unsupported output {output!r}")
        if output == "labels" and not fast_io:
            raise ValueError("output='labels' requires fast_io=True")
        self.output = output
        # bf16 runs the edge model on the MXU fast path; the walk itself
        # stays f32 (edge maps feed (1-e)^beta, which amplifies low-bit
        # noise).  Deviation bounded by tests/test_inference.py.
        self.compute_dtype = compute_dtype
        self._refine_cache = {}
        self._refine_batch_cache = {}
        self._refine_fast_cache = {}

    def _crop_for(self, h: int, w: int) -> int:
        if not self.bucket:
            return self.crop_size
        side = max(h, w, self.bucket)
        return min(self.crop_size, -(-side // self.bucket) * self.bucket)

    def _model_for(self, crop: int):
        """EdgeDisplacement pads its input to its own crop_size internally —
        clone the module per bucket / compute dtype (same variables)."""
        m = self.model
        if (
            getattr(m, "crop_size", crop) != crop
            or getattr(m, "dtype", self.compute_dtype) != self.compute_dtype
        ):
            m = m.clone(crop_size=crop, dtype=self.compute_dtype)
        return m

    def _refine_for(self, crop: int):
        if crop in self._refine_cache:
            return self._refine_cache[crop]
        model = self._model_for(crop)
        radius = self.radius
        beta, exp_times = self.beta, self.exp_times
        stride = self.stride
        grid = crop // stride

        core = self._walk_core(crop, model)

        # variables passed as an argument (closure-captured arrays become
        # XLA constants — see cam.py note)
        @jax.jit
        def refine(variables, img_pair, cams, size):
            """img_pair: (2, 512, 512, 3) normalised orig+flip (valid region
            top-left, zeros elsewhere); cams: (20, 512, 512) CAM scores
            placed top-left; size: (2,) valid (H, W).

            Returns (21, 512, 512) bg-thresholded random-walk scores
            (valid top-left window (H, W), bg channel 0).
            """
            rw = core(variables, img_pair, cams, size)
            # replicate the window-edge value across the pad before the 4x
            # upsample: the reference interpolates the UNPADDED (eh, ew)
            # field, which clamps at the edge (infer_irn.py:79); a canvas
            # resize would blend the outermost window pixels with pad zeros
            eh = (size[0] - 1) // stride + 1
            ew = (size[1] - 1) // stride + 1
            rw = jnp.take(rw, jnp.clip(jnp.arange(grid), 0, eh - 1), axis=1)
            rw = jnp.take(rw, jnp.clip(jnp.arange(grid), 0, ew - 1), axis=2)
            rw_up = resize_bilinear(
                rw.transpose(1, 2, 0), (crop, crop), align_corners=False
            ).transpose(2, 0, 1)
            # reference /max is over the CROPPED window (infer_irn.py:80);
            # the canvas max can exceed it when the peak node's exact-hit
            # output position falls outside (H, W)
            rows = jnp.arange(crop)[:, None]
            cols = jnp.arange(crop)[None, :]
            vmask = (rows < size[0]) & (cols < size[1])
            m = jnp.max(jnp.where(vmask[None], rw_up, -jnp.inf))
            rw_up = rw_up / jnp.maximum(m, 1e-12)
            bg = jnp.full((1, crop, crop), self.bg_threshold, rw_up.dtype)
            return jnp.concatenate([bg, rw_up], axis=0)

        self._refine_cache[crop] = refine
        return refine

    def _walk_core(self, crop: int, model, cams_at_grid: bool = False):
        """Shared edge-forward + CAM-downscale + random-walk body; returns
        the raw propagated CAMs at the stride-4 walk grid.

        cams_at_grid: the fast_io path uploads CAMs ALREADY at the walk
        grid (host PIL window downsample — same half-pixel semantics as
        the device resize, 16x less upload than canvas-resolution CAMs);
        skip the device downsample and just re-mask."""
        radius = self.radius
        beta, exp_times = self.beta, self.exp_times
        stride = self.stride
        grid = crop // stride

        cdt = self.compute_dtype

        def core(variables, img_pair, cams, size):
            edge, _ = model.apply(variables, img_pair.astype(cdt), valid_hw=size)
            edge = edge.astype(jnp.float32)
            # model crops to ((H-1)//stride+1); we run it on the full pad ->
            # static (grid, grid). Re-mask to the valid feature window and
            # set pad edges to 1 (walls).
            eh = (size[0] - 1) // stride + 1
            ew = (size[1] - 1) // stride + 1
            rows = jnp.arange(grid)[:, None]
            cols = jnp.arange(grid)[None, :]
            fvalid = (rows < eh) & (cols < ew)
            edge = jnp.where(fvalid, edge, 1.0)

            if cams_at_grid:
                cam_small = cams * fvalid[None]
            else:
                # downscale CAMs to the walk grid (align_corners=False,
                # infer_irn.py:76).  The reference resizes the UNPADDED
                # (H, W) image to its own (eh, ew) feature window — a
                # scale of H/eh = H/((H-1)//4+1), which equals the
                # canvas's uniform 4 only when H, W are multiples of the
                # stride.  A full-canvas /4 resize therefore samples the
                # wrong positions on odd dims (42 px: scale 3.818 vs 4 —
                # the whole 0.77 trained-walk mIoU delta of GATES r5
                # quick, bisected in tools/gate3_bisect.py: edge fwd,
                # downsample and walk are bit/pixel-identical in
                # isolation); resize the valid window per image instead.
                from muscle_tpu.core.resize import dynamic_window_resize

                box = jnp.concatenate([jnp.zeros((2,), jnp.int32), size])
                ewh = jnp.stack([eh, ew])
                cam_small = dynamic_window_resize(
                    cams.transpose(1, 2, 0), box, (grid, grid), dst_hw=ewh,
                    align_corners=False,
                ).transpose(2, 0, 1)
                cam_small = cam_small * fvalid[None]

            return propagate_to_edge(
                cam_small, edge, radius=radius, beta=beta, exp_times=exp_times,
                method=self.walk_method,
            )

        return core

    def _refine_fast_for(self, crop: int, labels: bool = False):
        """fast_io batched program: YCbCr canvases + K-channel f16 CAMs in.

        labels=False: (B, 21, grid, grid) f16 walk scores out (bg channel
        0).  The device divides by the node max only as an f16 precision
        pre-scale; the exact reference /max (over the upsampled, cropped
        field, infer_irn.py:79-80) happens on host after the upsample —
        the composition is scale-invariant, so the pre-scale drops out.

        labels=True: the reference tail — window-edge clamp, 4x half-pixel
        upsample, window /max, bg threshold, argmax (infer_irn.py:79-88) —
        fused on device; (B, crop, crop) uint8 out, ~50x less download."""
        key = (crop, labels)
        if key in self._refine_fast_cache:
            return self._refine_fast_cache[key]
        from muscle_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD
        from muscle_tpu.inference.upload import ycbcr420_unpack_fn

        model = self._model_for(crop)
        # fast_io uploads CAMs pre-downsampled to the walk grid (see
        # _pack_fast — 16x less CAM upload than canvas resolution)
        core = self._walk_core(crop, model, cams_at_grid=True)
        grid = crop // self.stride
        stride = self.stride
        bg_threshold = self.bg_threshold
        mean = jnp.asarray(IMAGENET_MEAN[0, 0], jnp.float32)
        std = jnp.asarray(IMAGENET_STD[0, 0], jnp.float32)
        unpack = ycbcr420_unpack_fn(crop)

        @jax.jit
        def run(variables, y, c, transposed, cam_vals, cam_idx, sizes):
            rgb = unpack(y, c, transposed)  # (B, crop, crop, 3) f32 [0, 255]

            def one(rgb_i, size, vals, idx):
                rows = jnp.arange(crop)[:, None]
                cols = jnp.arange(crop)[None, :]
                valid = ((rows < size[0]) & (cols < size[1]))[..., None]
                x = ((rgb_i / 255.0) - mean) / std * valid
                # flip the VALID window, zero elsewhere (host parity path
                # flips arr[:, ::-1] before placing top-left)
                fcols = jnp.clip(size[1] - 1 - jnp.arange(crop), 0, crop - 1)
                xf = jnp.take(x, fcols, axis=1) * valid
                pair = jnp.stack([x, xf])
                # scatter the K labelled grid-res channels into the
                # 20-class stack (pad entries carry idx 20 -> dropped)
                cams = jnp.zeros((21, grid, grid), jnp.float32)
                cams = cams.at[idx].add(vals.astype(jnp.float32))[:20]
                rw = core(variables, pair, cams, size)
                if not labels:
                    rw = rw / jnp.maximum(jnp.max(rw), 1e-12)
                    bg = jnp.full((1, grid, grid), bg_threshold, rw.dtype)
                    return jnp.concatenate([bg, rw], axis=0).astype(jnp.float16)
                # the reference's UNPADDED interpolate clamps at the window
                # edge; our static-canvas resize would blend with pad zeros
                # — replicate the edge value across the pad instead (the
                # in-window output then matches clamped sampling exactly;
                # the host scores path does the same one-node replicate)
                eh = (size[0] - 1) // stride + 1
                ew = (size[1] - 1) // stride + 1
                rw = jnp.take(rw, jnp.clip(jnp.arange(grid), 0, eh - 1), axis=1)
                rw = jnp.take(rw, jnp.clip(jnp.arange(grid), 0, ew - 1), axis=2)
                up = resize_bilinear(
                    rw.transpose(1, 2, 0), (crop, crop), align_corners=False
                )  # (crop, crop, 20)
                # reference /max over the cropped window AFTER the upsample
                # (infer_irn.py:79-80)
                m = jnp.max(jnp.where(valid, up, -jnp.inf))
                up = up / jnp.maximum(m, 1e-12)
                fg_max = jnp.max(up, axis=-1)
                fg_arg = (jnp.argmax(up, axis=-1) + 1).astype(jnp.uint8)
                # argmax([bg, fg...]) picks bg on ties -> strict >
                return jnp.where(fg_max > bg_threshold, fg_arg, 0).astype(jnp.uint8)

            return jax.vmap(one)(rgb, sizes, cam_vals, cam_idx)

        self._refine_fast_cache[key] = run
        return run

    def _refine_batch_for(self, crop: int):
        # vmap over the jitted single-image program: with the stencil walk
        # per-image state is O(D * V); with matrix methods each image
        # carries its own (V, V) transition (~1 GB at grid 128) — size the
        # batch accordingly.  The edge-model forward and the dispatch
        # amortise across the batch either way.
        if crop in self._refine_batch_cache:
            return self._refine_batch_cache[crop]
        single = self._refine_for(crop)

        @jax.jit
        def run(variables, pairs, cams, sizes):
            return jax.vmap(lambda p, c, s: single(variables, p, c, s))(
                pairs, cams, sizes
            )

        self._refine_batch_cache[crop] = run
        return run

    def _host_prep(self, pil_image, cam_dict, crop: int):
        w, h = pil_image.size
        arr = T.color_norm(np.asarray(pil_image)).astype(np.float32)
        pair = np.zeros((2, crop, crop, 3), np.float32)
        pair[0, :h, :w] = arr
        pair[1, :h, :w] = arr[:, ::-1]
        cams = np.zeros((20, crop, crop), np.float32)
        for k, v in cam_dict.items():
            cams[k, :h, :w] = np.asarray(v, np.float32)
        return pair, cams, (h, w)

    def refine_image(self, pil_image, cam_dict: dict) -> np.ndarray:
        """One image end-to-end. Returns (H, W, 21) float32 scores
        (bg channel = threshold), matching infer_irn.py:79-88."""
        if self.fast_io:
            return self.refine_batch([pil_image], [cam_dict])[0]
        w, h = pil_image.size
        crop = self._crop_for(h, w)
        pair, cams, (h, w) = self._host_prep(pil_image, cam_dict, crop)
        out = self._refine_for(crop)(
            self.variables, jnp.asarray(pair), jnp.asarray(cams),
            jnp.asarray([h, w], jnp.int32),
        )
        return np.asarray(out)[:, :h, :w].transpose(1, 2, 0)

    def refine_batch(self, pil_images, cam_dicts) -> list[np.ndarray]:
        """Batched refinement, grouped by size bucket.  Returns per-image
        (H, W, 21) float32 scores, or (H, W) uint8 label maps with
        output='labels'."""
        groups: dict[int, list[int]] = {}
        for i, img in enumerate(pil_images):
            w, h = img.size
            groups.setdefault(self._crop_for(h, w), []).append(i)
        results: dict[int, np.ndarray] = {}
        for crop, idxs in groups.items():
            if self.fast_io:
                for i, out in zip(idxs, self._refine_group_fast(
                    crop, [pil_images[i] for i in idxs],
                    [cam_dicts[i] for i in idxs],
                )):
                    results[i] = out
                continue
            b = len(idxs)
            pairs = np.empty((b, 2, crop, crop, 3), np.float32)
            cams = np.empty((b, 20, crop, crop), np.float32)
            sizes = np.empty((b, 2), np.int32)
            for j, i in enumerate(idxs):
                pairs[j], cams[j], sizes[j] = self._host_prep(
                    pil_images[i], cam_dicts[i], crop
                )
            outs = np.asarray(
                self._refine_batch_for(crop)(
                    self.variables, jnp.asarray(pairs), jnp.asarray(cams),
                    jnp.asarray(sizes),
                )
            )
            for j, i in enumerate(idxs):
                results[i] = outs[j, :, : sizes[j, 0], : sizes[j, 1]].transpose(1, 2, 0)
        return [results[i] for i in range(len(pil_images))]

    def _pack_fast(self, crop: int, pil_images, cam_dicts):
        """Host packing for the fast_io device program: YCbCr canvases +
        K-channel f16 CAM stacks AT THE WALK GRID.  The walk only ever
        consumes CAMs at the stride-4 grid, so the host does the
        reference's window downsample (infer_irn.py:76 — PIL F-mode
        bilinear, same half-pixel semantics as the device resize,
        tests/test_resize.py) and uploads (k, grid, grid) instead of
        (k, crop, crop): 16x less CAM traffic.  Returns the operand tuple
        (y, c, transposed, cam_vals, cam_idx, sizes)."""
        from PIL import Image

        from muscle_tpu.data.tta import pack_canvas_ycbcr

        b = len(pil_images)
        grid = crop // self.stride
        # size the class budget to the group's largest CAM dict (k is a
        # per-program shape constant, so a rare 5+-class image only costs
        # one extra compile — never a silently dropped class)
        k = max(self.max_classes, max((len(cd) for cd in cam_dicts), default=1))
        names = [str(i) for i in range(b)]
        y, c, sizes, transposed = pack_canvas_ycbcr(
            pil_images, names, crop, tight=False
        )
        cam_vals = np.zeros((b, k, grid, grid), np.float16)
        cam_idx = np.full((b, k), 20, np.int32)  # pad -> dropped channel
        for i, cd in enumerate(cam_dicts):
            h, w = sizes[i]
            eh = (h - 1) // self.stride + 1
            ew = (w - 1) // self.stride + 1
            for j, (cls, v) in enumerate(sorted(cd.items())):
                small = Image.fromarray(
                    np.ascontiguousarray(v, np.float32), "F"
                ).resize((ew, eh), Image.BILINEAR)
                cam_vals[i, j, :eh, :ew] = np.asarray(small, np.float16)
                cam_idx[i, j] = cls
        return y, c, transposed, cam_vals, cam_idx, sizes

    def bench_device_exec(self, pil_images, cam_dicts):
        """Zero-arg executor for device-only benchmarking (see
        CamTTAEngine.bench_device_exec): pack + upload once, return a
        closure re-dispatching the fast_io refine program on the resident
        inputs."""
        assert self.fast_io, "device-only bench requires fast_io"
        crops = {self._crop_for(img.size[1], img.size[0]) for img in pil_images}
        assert len(crops) == 1, "bench batch must share one size bucket"
        crop = crops.pop()
        packed = self._pack_fast(crop, pil_images, cam_dicts)
        fn = self._refine_fast_for(crop, labels=self.output == "labels")
        args = tuple(jnp.asarray(a) for a in packed)
        return lambda: fn(self.variables, *args)

    def _refine_group_fast(self, crop: int, pil_images, cam_dicts):
        """fast_io path for one size bucket: pack YCbCr canvases + K-channel
        f16 CAMs, run the device program, upsample the grid-resolution f16
        scores to image size on host (PIL bilinear — same half-pixel
        semantics as the device's align_corners=False resize)."""
        from PIL import Image

        b = len(pil_images)
        y, c, transposed, cam_vals, cam_idx, sizes = self._pack_fast(
            crop, pil_images, cam_dicts
        )
        if self.output == "labels":
            labs = np.asarray(self._refine_fast_for(crop, labels=True)(
                self.variables, jnp.asarray(y), jnp.asarray(c),
                jnp.asarray(transposed), jnp.asarray(cam_vals),
                jnp.asarray(cam_idx), jnp.asarray(sizes),
            ))
            return [labs[i, :sizes[i, 0], :sizes[i, 1]] for i in range(b)]
        outs = np.asarray(
            self._refine_fast_for(crop)(
                self.variables, jnp.asarray(y), jnp.asarray(c),
                jnp.asarray(transposed), jnp.asarray(cam_vals),
                jnp.asarray(cam_idx), jnp.asarray(sizes),
            ),
            np.float32,
        )
        results = []
        grid = crop // self.stride
        for i in range(b):
            h, w = sizes[i]
            # replicate the last valid row/col one step into the pad: the
            # half-pixel 4x upsample's support reaches one node past the
            # window edge, and the reference's unpadded interpolate CLAMPS
            # there instead of blending with pad zeros (infer_irn.py:79)
            eh = (h - 1) // self.stride + 1
            ew = (w - 1) // self.stride + 1
            if eh < grid:
                outs[i, :, eh, :ew] = outs[i, :, eh - 1, :ew]
            if ew < grid:
                outs[i, :, : min(eh + 1, grid), ew] = outs[
                    i, :, : min(eh + 1, grid), ew - 1
                ]
            chans = [
                np.asarray(
                    Image.fromarray(
                        np.ascontiguousarray(outs[i, ch], np.float32), "F"
                    ).resize((crop, crop), Image.BILINEAR),
                    np.float32,
                )[:h, :w]
                for ch in range(outs.shape[1])
            ]
            out = np.stack(chans, axis=-1)
            # The reference normalises AFTER the upsample over the cropped
            # window (infer_irn.py:79-80); the device's node-max division is
            # only an f16 precision pre-scale (the composition is scale-
            # invariant), so renormalise the fg channels here for exact
            # /max semantics — the upsampled field's max can sit below the
            # node max the device divided by.
            out[..., 1:] /= max(float(out[..., 1:].max()), 1e-12)
            results.append(out)
        return results

    def to_png_labels(self, scores_hwc: np.ndarray) -> np.ndarray:
        if scores_hwc.ndim == 2:  # output='labels': already argmaxed on device
            return scores_hwc
        return np.argmax(scores_hwc, axis=-1).astype(np.uint8)
