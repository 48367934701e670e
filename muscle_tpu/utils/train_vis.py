"""In-training visual observability (reference train_mcl.py:255-277,
train_muscle.py:206-219 — tensorboard image streams, here PNG files under
<log_dir>/vis so headless runs keep the same debugging signal).

Every N iterations the visualizer runs a small jitted eval-mode forward on
the first image of the batch and writes:
  * MCL: jet overlays of the maxnormed CAM and SGC per labelled class
    (step{S}_cls{c}_cam.png / _sgc.png) + the denormalised input.
  * seg: the argmax mask in VOC palette colours (step{S}_seg.png) + input.

A separate tiny forward (instead of plumbing maps out of the train step)
keeps the training programs unchanged and costs one extra batch-1 forward
per dump.
"""

from __future__ import annotations

import functools
import os

import numpy as np

from muscle_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD
from muscle_tpu.utils.visualize import save_overlay


def denorm_uint8(img: np.ndarray) -> np.ndarray:
    """Invert the ImageNet normalisation of one (H, W, 3) image."""
    x = (img * IMAGENET_STD[0, 0] + IMAGENET_MEAN[0, 0]) * 255.0
    return np.clip(x, 0, 255).astype(np.uint8)


class TrainVisualizer:
    """Dumps overlay PNGs during training.

    Args:
      model: MuSCLe module.
      out_dir: directory for the PNGs (created on first dump).
      mode: 'cam' (MCL training) or 'seg'.
      every: dump period in iterations; <= 0 disables entirely.
    """

    def __init__(self, model, out_dir: str, mode: str = "cam", every: int = 25,
                 tb=None):
        self.model = model
        self.out_dir = out_dir
        self.mode = mode
        self.every = every
        self.tb = tb  # optional utils.tb_events.EventWriter: every PNG also
        # goes out as a tensorboard image summary (the reference's
        # tblogger.log_images stream, train_mcl.py:274-275)

    @functools.cached_property
    def _cam_forward(self):
        import jax
        import jax.numpy as jnp

        from muscle_tpu.core import cam_maxnorm

        model = self.model

        @jax.jit
        def fwd(variables, img):
            cams, sgcs, _, _ = model.apply(variables, img, mode="cam")
            return cam_maxnorm(cams)[0], cam_maxnorm(sgcs)[0]

        return fwd

    @functools.cached_property
    def _seg_forward(self):
        import jax

        model = self.model

        @jax.jit
        def fwd(variables, img):
            seg_map, _ = model.apply(variables, img, mode="seg")
            return jax.numpy.argmax(seg_map[0], axis=-1)

        return fwd

    def maybe_dump(self, step: int, state, batch) -> None:
        if self.every <= 0 or (step % self.every and step != 1):
            return  # dump on the first step too — cheap input-pipeline sanity
        os.makedirs(self.out_dir, exist_ok=True)
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        if "img_y" in batch:  # ycbcr420 upload: decode one image on host
            from muscle_tpu.core.ycbcr import ycbcr420_to_rgb

            raw = np.asarray(
                np.clip(
                    np.round(
                        ycbcr420_to_rgb(
                            np.asarray(batch["img_y"][:1]),
                            np.asarray(batch["img_c"][:1]),
                        )
                    ),
                    0,
                    255,
                ),
                np.uint8,
            )
        else:
            raw = np.asarray(batch["img"][:1])
        if raw.dtype == np.uint8:  # device-norm pipeline ships uint8
            img8 = raw[0]
            from muscle_tpu.data.transforms import color_norm

            img = color_norm(raw[0])[None]
        else:
            img = raw.astype(np.float32)
            img8 = denorm_uint8(img[0])
        from PIL import Image

        Image.fromarray(img8).save(os.path.join(self.out_dir, f"step{step}_img.png"))
        if self.tb is not None:
            self.tb.add_image("vis/input", img8, step)
        if self.mode == "cam":
            cam, sgc = self._cam_forward(variables, img)
            cam, sgc = np.asarray(cam, np.float32), np.asarray(sgc, np.float32)
            for c in np.nonzero(np.asarray(batch["label"][0]) > 1e-5)[0]:
                ov_cam = save_overlay(
                    os.path.join(self.out_dir, f"step{step}_cls{c}_cam.png"),
                    img8, cam[..., 1 + c],
                )
                ov_sgc = save_overlay(
                    os.path.join(self.out_dir, f"step{step}_cls{c}_sgc.png"),
                    img8, sgc[..., 1 + c],
                )
                if self.tb is not None:
                    self.tb.add_image(f"vis/cls{c}_cam", ov_cam, step)
                    self.tb.add_image(f"vis/cls{c}_sgc", ov_sgc, step)
        else:
            from muscle_tpu.core.palette import voc_color_map

            mask = np.asarray(self._seg_forward(variables, img))
            rgb = voc_color_map()[mask].astype(np.uint8)
            Image.fromarray(rgb).save(
                os.path.join(self.out_dir, f"step{step}_seg.png")
            )
            if self.tb is not None:
                self.tb.add_image("vis/seg", rgb, step)
