"""IRN training: inter-pixel affinity + displacement-field losses.

The reference ships the loss machinery (AffinityDisplacementLoss,
src/backbones/resnet50_irn.py:143-212) but NOT the training script — IRN
weights are downloaded (README.md:10).  This module completes the
capability: it trains EdgeDisplacement weights from pseudo-labels so the
random-walk stage has a first-party upstream.

Losses (per resnet50_irn.py:197-212, with the standard IRN normalisation):
  aff        = 1 - max(sigmoid(edge) along pixel-pair path)
  L_pos      = mean_{bg_pos} -log(aff+1e-5)/2 + mean_{fg_pos} .../2
  L_neg      = mean_{neg}    -log(1+1e-5-aff)
  L_dp_fg    = mean_{fg_pos pairs} |(dp_src - dp_dst) - target_disp|
  L_dp_bg    = mean_{bg_pos pairs} |dp_src - dp_dst|
  total      = (L_pos + L_neg)/2 + (L_dp_fg + L_dp_bg)/2
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from muscle_tpu.ops.random_walk import PathIndex


@dataclasses.dataclass(frozen=True)
class IRNTrainConfig:
    crop_size: int = 512
    stride: int = 4
    radius: int = 5

    @property
    def grid(self) -> int:
        return self.crop_size // self.stride


def path_affinity(edge_sigmoid_flat: jax.Array, pi: PathIndex) -> jax.Array:
    """Differentiable 1 - max(edge along path) over all pairs -> (D, P)."""
    affs = []
    for group in pi.path_indices:
        ind = jnp.asarray(group)  # (n_dirs, plen, P)
        affs.append(1.0 - jnp.max(edge_sigmoid_flat[ind], axis=1))
    return jnp.concatenate(affs, axis=0)


def pair_displacement(dp_flat: jax.Array, pi: PathIndex) -> jax.Array:
    """dp_flat: (V, 2) displacement field -> (D, P, 2) pairwise deltas."""
    src = jnp.asarray(
        np.broadcast_to(pi.src_indices[None, :], pi.dst_indices.shape)
    )
    dst = jnp.asarray(pi.dst_indices)
    return dp_flat[src] - dp_flat[dst]


def irn_losses(edge_out, dp_out, bg_pos, fg_pos, neg, pi: PathIndex):
    """edge_out: (V,) logits; dp_out: (V, 2); masks: (D, P)."""
    aff = path_affinity(jax.nn.sigmoid(edge_out), pi)
    pos_loss = -jnp.log(aff + 1e-5)
    neg_loss = -jnp.log(1.0 + 1e-5 - aff)

    def masked_mean(loss, mask):
        return jnp.sum(loss * mask) / (jnp.sum(mask) + 1e-5)

    l_bg_pos = masked_mean(pos_loss, bg_pos)
    l_fg_pos = masked_mean(pos_loss, fg_pos)
    l_neg = masked_mean(neg_loss, neg)

    pdisp = pair_displacement(dp_out, pi)  # (D, P, 2)
    target = jnp.asarray(pi.search_dst, jnp.float32)[:, None, :]  # (D, 1, 2)
    dp_fg = jnp.abs(pdisp - target).sum(-1)
    dp_bg = jnp.abs(pdisp).sum(-1)
    l_dp_fg = masked_mean(dp_fg, fg_pos)
    l_dp_bg = masked_mean(dp_bg, bg_pos)

    l_aff = l_bg_pos / 2 + l_fg_pos / 2 + l_neg
    l_dp = l_dp_fg + l_dp_bg
    total = l_aff / 2 + l_dp / 2
    return total, {
        "loss": total,
        "loss_aff_pos": l_bg_pos / 2 + l_fg_pos / 2,
        "loss_aff_neg": l_neg,
        "loss_dp_fg": l_dp_fg,
        "loss_dp_bg": l_dp_bg,
    }


@functools.partial(jax.jit, static_argnames=("model", "tx", "cfg"), donate_argnums=(2,))
def irn_train_step(model, tx, state, batch, cfg: IRNTrainConfig):
    """One IRN training step.

    model: IRNNet (the raw two-head net — training uses the un-fused edge
    logits, reference resnet50_irn.py:197-204; the EdgeDisplacement flip
    fusion is inference-only).
    batch: img (N, S, S, 3) crop-padded images; bg_pos/fg_pos/neg
    (N, D, P) affinity masks over the stride-4 grid path index.
    """
    pi = _grid_path_index(cfg)

    def loss_fn(params):
        edge_out, dp_out = model.apply(
            {"params": params, "batch_stats": state.batch_stats}, batch["img"]
        )  # (N, g, g, 1), (N, g, g, 2)

        def per_sample(edge, dp, bg_pos, fg_pos, neg):
            return irn_losses(
                edge.reshape(-1), dp.reshape(-1, 2), bg_pos, fg_pos, neg, pi
            )

        totals, metrics = jax.vmap(per_sample)(
            edge_out[..., 0], dp_out, batch["bg_pos"], batch["fg_pos"], batch["neg"]
        )
        return jnp.mean(totals), jax.tree.map(jnp.mean, metrics)

    grads, metrics = jax.grad(loss_fn, has_aux=True)(state.params)
    updates, new_opt = tx.update(grads, state.opt_state, state.params)
    new_params = jax.tree.map(lambda p, u: p + u, state.params, updates)
    return state.replace(step=state.step + 1, params=new_params, opt_state=new_opt), metrics


@functools.lru_cache(maxsize=4)
def _grid_path_index(cfg: IRNTrainConfig) -> PathIndex:
    return PathIndex(cfg.radius, (cfg.grid, cfg.grid))
