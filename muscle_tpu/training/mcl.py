"""MCL contrastive-classifier training steps (reference train_mcl.py:152-229).

The reference takes TWO optimizer steps per iteration:

  step A — full image, mode 'cam' (train): focal + soft-margin + LSEP
           + ER top-k (+ IMC from epoch 4); updates BN running stats.
  step B — from epoch 8: view1 through mode 'pix' *in eval mode but with
           grad*, view2 no-grad; PixPro (+ EMD from epoch 12).

Here each step is its own jitted function over the data-parallel mesh; the
curriculum phase is a static argument (one compile per phase).  Gradients
reduce over the 'data' axis automatically under jit-with-shardings.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp

from muscle_tpu.core import attach_bg_channel, cam_maxnorm, cam_softmaxnorm
from muscle_tpu.losses import (
    dynamic_matching_emd,
    er_topk_loss,
    focal_loss,
    image_level_contrast,
    lsep_loss,
    pixpro_loss,
    soft_margin_loss,
)


@dataclasses.dataclass(frozen=True)
class MCLConfig:
    use_imc: bool = False  # epoch >= 4
    use_pixpro: bool = False  # epoch >= 8
    use_emd: bool = False  # epoch >= 12


def norm_on_device(img):
    """ImageNet-normalise a uint8 image batch on device; float batches pass
    through unchanged (they were normalised on host).

    Training batches can ship as uint8 (VOC12ClsPixDataset device_norm=True)
    — 4x less host->device traffic than normalised f32, and the divide/
    subtract fuses into the stem conv's input processing under XLA.  The
    dtype check is static under jit (one compile per input dtype)."""
    if img.dtype != jnp.uint8:
        return img
    from muscle_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD

    mean = jnp.asarray(IMAGENET_MEAN[0, 0], jnp.float32)
    std = jnp.asarray(IMAGENET_STD[0, 0], jnp.float32)
    return (img.astype(jnp.float32) / 255.0 - mean) / std


def decode_image(batch: dict, key: str):
    """Return the ImageNet-normalised f32 image batch for `key`, whichever
    upload format the batch carries (static under jit — one compile per
    format):

    * ``{key}_y`` + ``{key}_c`` — YCbCr 4:2:0 planes (dataset
      upload='ycbcr420'): decode (core/ycbcr.py) then normalise.  Half the
      host->device bytes of uint8 RGB; the relay link, not the chip, bounds
      the training step.
    * ``{key}`` uint8 — RGB, normalise on device (device_norm=1).
    * ``{key}`` float — already host-normalised (reference-exact mode).
    """
    if key + "_y" in batch:
        from muscle_tpu.core.ycbcr import ycbcr420_to_rgb
        from muscle_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD

        rgb = ycbcr420_to_rgb(batch[key + "_y"], batch[key + "_c"])
        mean = jnp.asarray(IMAGENET_MEAN[0, 0], jnp.float32)
        std = jnp.asarray(IMAGENET_STD[0, 0], jnp.float32)
        return (rgb / 255.0 - mean) / std
    return norm_on_device(batch[key])


@functools.partial(jax.jit, static_argnames=("model", "tx", "cfg"), donate_argnums=(2,))
def mcl_train_step(model, tx, state, batch, rng, cfg: MCLConfig):
    """Step A.  batch: img (N,H,W,3), label (N,20).  Returns (state, metrics)."""
    batch = dict(batch, img=decode_image(batch, "img"))
    label = batch["label"]
    label_bg = attach_bg_channel(label)
    valid_channels = jnp.sum(label)

    def loss_fn(params):
        (raw_cams, raw_sgcs, emb, logits), new_model_state = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            batch["img"],
            mode="cam",
            train=True,
            mutable=["batch_stats"],
            rngs={"dropout": rng},
        )
        probs_fg = jax.nn.sigmoid(logits[:, 1:])
        l_focal = focal_loss(probs_fg, label)
        l_margin = soft_margin_loss(logits[:, 1:], label)
        l_pair = jnp.mean(lsep_loss(probs_fg, label))
        l_cls = l_focal + l_margin + l_pair

        cams = jax.lax.stop_gradient(cam_softmaxnorm(raw_cams)) * label_bg[:, None, None, :]
        sgcs = cam_softmaxnorm(raw_sgcs) * label_bg[:, None, None, :]
        l_er = er_topk_loss(cams, sgcs, valid_channels)

        loss = l_cls + l_er
        l_imc = jnp.float32(0.0)
        if cfg.use_imc:
            l_imc = image_level_contrast(emb, label)
            loss = loss + l_imc
        metrics = {
            "loss": loss,
            "loss_focal": l_focal,
            "loss_softmargin": l_margin,
            "loss_pair": l_pair,
            "loss_er": l_er,
            "loss_imc": l_imc,
        }
        return loss, (new_model_state, metrics)

    grads, (new_model_state, metrics) = jax.grad(loss_fn, has_aux=True)(state.params)
    updates, new_opt = tx.update(grads, state.opt_state, state.params)
    new_params = jax.tree.map(lambda p, u: p + u, state.params, updates)
    new_state = state.replace(
        step=state.step + 1,
        params=new_params,
        batch_stats=new_model_state["batch_stats"],
        opt_state=new_opt,
    )
    return new_state, metrics


def mcl_term_grad_norms(model, state, batch, rng,
                        cfg: MCLConfig = MCLConfig(True, True, True),
                        views_train_mode: bool = False,
                        method: str = "jacrev") -> dict:
    """Per-term parameter-gradient norms — the liveness diagnostic the
    round-2 verdict asked for: a loss term whose VALUE is small can still
    be a live training signal, and a term whose value is O(1) can be a
    dead path (stop_gradient bug, detached input); only the gradient norm
    distinguishes them.  Used by the gate harness and the multichip dryrun.

    batch must carry img/label (step-A terms) and, when cfg enables them,
    view1/view2/coord1/coord2 (step-B terms).  One jacrev per step = one
    backward pass per term, on the caller's tiny shapes.

    method: 'jacrev' = per-term gradient norms (full tier); 'jvp' =
    per-term |directional derivative| at one fixed random tangent — the
    one-compile cheap liveness observable (training/liveness.py).

    views_train_mode: probe the step-B terms with train-mode BN.  The real
    step B runs eval-mode (reference train_mcl.py:203), but on an
    UNCALIBRATED model eval-mode BN (identity running stats) collapses the
    activations, the relu'd maxnorms go flat-zero, and PixPro/EMD report
    zero gradients that say nothing about the graph (measured: loss 1.0 /
    grad 0 at random init vs grad ~1e2 in train mode).  Structural
    liveness probes on random-init models should pass True; calibrated /
    trained checkpoints can use the faithful False.
    """
    batch = dict(batch)
    for k in ("img", "view1", "view2"):
        if k in batch or k + "_y" in batch:
            batch[k] = decode_image(batch, k)

    def terms_a(params):
        (raw_cams, raw_sgcs, emb, logits), _ = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            batch["img"], mode="cam", train=True,
            mutable=["batch_stats"], rngs={"dropout": rng},
        )
        label = batch["label"]
        label_bg = attach_bg_channel(label)
        probs_fg = jax.nn.sigmoid(logits[:, 1:])
        cams = jax.lax.stop_gradient(cam_softmaxnorm(raw_cams)) * label_bg[:, None, None, :]
        sgcs = cam_softmaxnorm(raw_sgcs) * label_bg[:, None, None, :]
        out = {
            "focal": focal_loss(probs_fg, label),
            "softmargin": soft_margin_loss(logits[:, 1:], label),
            "pair": jnp.mean(lsep_loss(probs_fg, label)),
            "er": er_topk_loss(cams, sgcs, jnp.sum(label)),
        }
        if cfg.use_imc:
            out["imc"] = image_level_contrast(emb, label)
        return out

    def terms_b(params):
        label_bg = attach_bg_channel(batch["label"])

        def fwd(x, key):
            if views_train_mode:
                out, _ = model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    x, mode="pix", train=True, mutable=["batch_stats"],
                    rngs={"dropout": jax.random.fold_in(rng, key)},
                )
                return out
            return model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                x, mode="pix", train=False,
            )

        _, sgcs_vw1 = fwd(batch["view1"], 1)
        cams_vw2, _ = fwd(batch["view2"], 2)
        cams_vw2 = jax.lax.stop_gradient(cams_vw2)
        lb = label_bg[:, None, None, :]
        out = {
            "pixpro": pixpro_loss(
                cam_maxnorm(sgcs_vw1) * lb, cam_maxnorm(cams_vw2) * lb,
                batch["coord1"], batch["coord2"],
            )
        }
        if cfg.use_emd:
            vw1 = cam_softmaxnorm(sgcs_vw1)
            vw2 = cam_softmaxnorm(cams_vw2)
            vw1 = vw1 / jnp.maximum(jnp.linalg.norm(vw1, axis=-1, keepdims=True), 1e-12)
            vw2 = vw2 / jnp.maximum(jnp.linalg.norm(vw2, axis=-1, keepdims=True), 1e-12)
            out["emd"] = dynamic_matching_emd(
                vw1, jax.lax.stop_gradient(vw2), batch["coord1"], batch["coord2"], rng
            )
        return out

    from muscle_tpu.training.liveness import term_liveness

    norms: dict[str, float] = {}
    makers = [terms_a]
    if cfg.use_pixpro and "view1" in batch:
        makers.append(terms_b)
    for maker in makers:
        keys = sorted(jax.eval_shape(maker, state.params))

        def stacked(params, maker=maker, keys=keys):
            d = maker(params)
            return jnp.stack([d[k] for k in keys])

        # One jitted program per maker (eager dispatch of the k backward
        # passes dominated dryrun wall time on 1-vCPU hosts).
        _, vals = term_liveness(stacked, len(keys), state.params, method)
        for i, k in enumerate(keys):
            norms[k] = float(vals[i])
    return norms


@functools.partial(jax.jit, static_argnames=("model", "tx", "cfg"), donate_argnums=(2,))
def mcl_views_step(model, tx, state, batch, rng, cfg: MCLConfig):
    """Step B (PixPro + EMD).  Uses eval-mode forwards (frozen BN stats, no
    drop-connect) exactly like the reference's model.eval() at
    train_mcl.py:203, but keeps gradients for view1."""
    batch = dict(
        batch,
        view1=decode_image(batch, "view1"),
        view2=decode_image(batch, "view2"),
    )
    label_bg = attach_bg_channel(batch["label"])

    def loss_fn(params):
        _, sgcs_vw1 = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            batch["view1"],
            mode="pix",
            train=False,
        )
        cams_vw2, _ = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            batch["view2"],
            mode="pix",
            train=False,
        )
        cams_vw2 = jax.lax.stop_gradient(cams_vw2)

        lb = label_bg[:, None, None, :]
        l_pixpro = pixpro_loss(
            cam_maxnorm(sgcs_vw1) * lb,
            cam_maxnorm(cams_vw2) * lb,
            batch["coord1"],
            batch["coord2"],
        )
        loss = l_pixpro
        l_emd = jnp.float32(0.0)
        if cfg.use_emd:
            vw1 = cam_softmaxnorm(sgcs_vw1)
            vw2 = cam_softmaxnorm(cams_vw2)
            # F.normalize over the class dim (train_mcl.py:218-219)
            vw1 = vw1 / jnp.maximum(jnp.linalg.norm(vw1, axis=-1, keepdims=True), 1e-12)
            vw2 = vw2 / jnp.maximum(jnp.linalg.norm(vw2, axis=-1, keepdims=True), 1e-12)
            l_emd = dynamic_matching_emd(
                vw1, jax.lax.stop_gradient(vw2), batch["coord1"], batch["coord2"], rng
            )
            loss = loss + l_emd
        return loss, {"loss_pixpro": l_pixpro, "loss_emd": l_emd}

    grads, metrics = jax.grad(loss_fn, has_aux=True)(state.params)
    updates, new_opt = tx.update(grads, state.opt_state, state.params)
    new_params = jax.tree.map(lambda p, u: p + u, state.params, updates)
    new_state = state.replace(step=state.step + 1, params=new_params, opt_state=new_opt)
    return new_state, metrics
