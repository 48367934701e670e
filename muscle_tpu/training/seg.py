"""MuSCLe segmentation training step (reference train_muscle.py:168-203).

Cross-entropy on the argmax of the soft pseudo-mask plus the BEACON field
loss, global-norm gradient clipping at 9, Adam(1e-5, wd 1e-5).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import optax

from muscle_tpu.core import attach_bg_channel
from muscle_tpu.losses import FieldLossConfig, field_loss
from muscle_tpu.training.mcl import decode_image


def _dequant_batch(batch: dict, num_classes: int | None = None) -> dict:
    """Device-side decode of the uint8 (device_norm) seg pipeline: images
    ImageNet-normalise, x255-quantised soft masks map back to [0, 1].
    Float batches pass through (host-prepared, reference-exact).

    A packed mask (``mask`` (N, H, W, K) + ``mask_idx`` (N, K), see
    VOC12SegDataset pack_mask) scatters back to the dense
    (N, H, W, num_classes) stack — exact: the packed channels are the only
    possibly-nonzero ones, pad slots carry index 0 with zero values.
    num_classes must match the model head (SegConfig.num_classes threads
    the CLI's --num_classes here); the label-derived fallback only covers
    the VOC 20-fg+bg default."""
    out = dict(batch, img=decode_image(batch, "img"))
    out.pop("img_y", None)
    out.pop("img_c", None)
    if batch["mask"].dtype == jnp.uint8:
        out["mask"] = batch["mask"].astype(jnp.float32) / 255.0
    if "mask_idx" in out:
        if num_classes is None:
            num_classes = batch["label"].shape[-1] + 1
        onehot = jax.nn.one_hot(out.pop("mask_idx"), num_classes, dtype=jnp.float32)
        out["mask"] = jnp.einsum(
            "nhwk,nkc->nhwc", out["mask"].astype(jnp.float32), onehot
        )
    return out


@dataclasses.dataclass(frozen=True)
class SegConfig:
    lamb: float = 5e-2  # BEACON weight (train_muscle.py --lamb)
    step: int = 7
    k: int = 128
    beta: float = 1e2
    clip_norm: float = 9.0
    num_classes: int = 21  # incl. bg; must match the model head + pack_mask


def cross_entropy(seg_logits: jax.Array, hard_mask: jax.Array) -> jax.Array:
    """torch CrossEntropyLoss(logits NHWC, labels NHW), mean over pixels."""
    logp = jax.nn.log_softmax(seg_logits, axis=-1)
    picked = jnp.take_along_axis(logp, hard_mask[..., None], axis=-1)[..., 0]
    return -jnp.mean(picked)


def seg_term_grad_norms(model, state, batch, rng,
                        cfg: SegConfig = SegConfig(),
                        method: str = "jacrev",
                        return_values: bool = False):
    """Per-term parameter-gradient norms for the seg losses (CE + BEACON) —
    see training/mcl.py mcl_term_grad_norms for the rationale and the
    'jvp' cheap-liveness method.

    return_values: also return the per-term loss VALUES as a second dict —
    lets callers distinguish "dead path" (value nonzero, liveness zero)
    from "not engaged" (value exactly zero via BEACON's data-dependent
    count>k gate, losses/beacon.py:194 / reference src/edge.py:297-316)."""
    batch = _dequant_batch(batch, cfg.num_classes)
    label_bg = attach_bg_channel(batch["label"])
    hard_mask = jnp.argmax(batch["mask"], axis=-1)

    def terms(params):
        (seg_map, dense_ft), _ = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            batch["img"], mode="seg", train=True,
            mutable=["batch_stats"], rngs={"dropout": rng},
        )
        flc = FieldLossConfig(
            num_classes=seg_map.shape[-1], k=cfg.k, step=cfg.step, beta=cfg.beta
        )
        l_beacon, _ = field_loss(seg_map, dense_ft, batch["mask"], label_bg, rng, flc)
        return {"seg": cross_entropy(seg_map, hard_mask), "beacon": l_beacon}

    from muscle_tpu.training.liveness import term_liveness

    keys = sorted(jax.eval_shape(terms, state.params))

    def stacked(params):
        d = terms(params)
        return jnp.stack([d[k] for k in keys])

    values, vals = term_liveness(stacked, len(keys), state.params, method)
    norms = {k: float(vals[i]) for i, k in enumerate(keys)}
    if return_values:
        return norms, {k: float(values[i]) for i, k in enumerate(keys)}
    return norms


@functools.partial(jax.jit, static_argnames=("model", "tx", "cfg"), donate_argnums=(2,))
def seg_train_step(model, tx, state, batch, rng, cfg: SegConfig):
    """batch: img (N,H,W,3), mask (N,H,W,C) soft, label (N,20).  uint8
    img/mask (VOC12SegDataset device_norm=True) decode on device."""
    batch = _dequant_batch(batch, cfg.num_classes)
    label_bg = attach_bg_channel(batch["label"])
    hard_mask = jnp.argmax(batch["mask"], axis=-1)

    def loss_fn(params):
        (seg_map, dense_ft), new_model_state = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            batch["img"],
            mode="seg",
            train=True,
            mutable=["batch_stats"],
            rngs={"dropout": rng},
        )
        l1 = cross_entropy(seg_map, hard_mask)
        l2 = jnp.float32(0.0)
        if cfg.lamb > 0:
            flc = FieldLossConfig(
                num_classes=seg_map.shape[-1], k=cfg.k, step=cfg.step, beta=cfg.beta
            )
            l2, _ = field_loss(seg_map, dense_ft, batch["mask"], label_bg, rng, flc)
        loss = l1 + cfg.lamb * l2
        return loss, (new_model_state, {"loss": loss, "loss_seg": l1, "loss_beacon": l2})

    grads, (new_model_state, metrics) = jax.grad(loss_fn, has_aux=True)(state.params)
    # clip_grad_norm_(9) (train_muscle.py:202)
    gnorm = optax.global_norm(grads)
    scale = jnp.minimum(1.0, cfg.clip_norm / (gnorm + 1e-6))
    grads = jax.tree.map(lambda g: g * scale, grads)

    updates, new_opt = tx.update(grads, state.opt_state, state.params)
    new_params = jax.tree.map(lambda p, u: p + u, state.params, updates)
    new_state = state.replace(
        step=state.step + 1,
        params=new_params,
        batch_stats=new_model_state["batch_stats"],
        opt_state=new_opt,
    )
    metrics["grad_norm"] = gnorm
    return new_state, metrics
