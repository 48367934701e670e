"""IRN training: inter-pixel affinity + displacement-field losses.

The reference ships the loss machinery (AffinityDisplacementLoss,
src/backbones/resnet50_irn.py:143-212) but NOT the training script — IRN
weights are downloaded (README.md:10).  This module completes the
capability: it trains EdgeDisplacement weights from pseudo-labels so the
random-walk stage has a first-party upstream.

Losses (per resnet50_irn.py:197-212, masked/normalised exactly as the IRN
lineage's train_irn.py does — whole-batch mask sums, and the displacement
terms divide by 2*sum(mask) because |pair_disp - target| has a (dy, dx)
channel axis the sum runs over):
  aff        = 1 - max(sigmoid(edge) along pixel-pair path)
  L_pos      = sum(bg_pos * -log(aff+1e-5))/(sum(bg_pos)+1e-5)/2 + fg term/2
  L_neg      = sum(neg * -log(1+1e-5-aff))/(sum(neg)+1e-5)
  L_dp_fg    = sum(fg_pos * |(dp_src-dp_dst) - target|)/(2*sum(fg_pos)+1e-5)
  L_dp_bg    = sum(bg_pos * |dp_src-dp_dst|)/(2*sum(bg_pos)+1e-5)
  total      = (L_pos + L_neg)/2 + (L_dp_fg + L_dp_bg)/2
Parity-tested against the reference module + this normalisation in
tests/test_training.py::test_irn_losses_match_reference.
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
    """Batched IRN losses.

    edge_out: (N, V) logits; dp_out: (N, V, 2); masks: (N, D, P).
    Mask sums run over the whole batch (the lineage normalisation), so
    samples with more valid pairs weigh proportionally more.
    """
    aff = jax.vmap(lambda e: path_affinity(jax.nn.sigmoid(e), pi))(edge_out)
    pos_loss = -jnp.log(aff + 1e-5)
    neg_loss = -jnp.log(1.0 + 1e-5 - aff)

    def masked_sum_norm(loss, mask, denom_scale=1.0):
        return jnp.sum(loss * mask) / (denom_scale * jnp.sum(mask) + 1e-5)

    l_bg_pos = masked_sum_norm(pos_loss, bg_pos)
    l_fg_pos = masked_sum_norm(pos_loss, fg_pos)
    l_neg = masked_sum_norm(neg_loss, neg)

    pdisp = jax.vmap(lambda d: pair_displacement(d, pi))(dp_out)  # (N, D, P, 2)
    target = jnp.asarray(pi.search_dst, jnp.float32)[:, None, :]  # (D, 1, 2)
    # |.| summed over the (dy, dx) channel axis; the denominator carries the
    # matching factor 2 (train_irn.py divides by 2 * sum(mask))
    dp_fg = jnp.abs(pdisp - target).sum(-1)
    dp_bg = jnp.abs(pdisp).sum(-1)
    l_dp_fg = masked_sum_norm(dp_fg, fg_pos, denom_scale=2.0)
    l_dp_bg = masked_sum_norm(dp_bg, bg_pos, denom_scale=2.0)

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
    (N, D, P) affinity masks over the stride-4 grid path index.  uint8
    batches (VOC12AffinityDataset device_norm=True) decode on device:
    images ImageNet-normalise, the 0/1 masks cast exactly.  Bit-packed
    masks (pack_bits=True: trailing dim P/8) unpack exactly on device
    (core/bitpack.py) — the dominant batch bytes once the image ships
    as YCbCr.
    """
    pi = _grid_path_index(cfg)
    from muscle_tpu.core.bitpack import unpackbits_last
    from muscle_tpu.training.mcl import decode_image

    img = decode_image(batch, "img")
    p_pairs = int(pi.src_indices.size)  # cropped pair-grid width P

    def decode_mask(v):
        if v.dtype == jnp.uint8 and v.shape[-1] * 8 == p_pairs:
            return unpackbits_last(v, p_pairs)
        return v.astype(jnp.float32) if v.dtype == jnp.uint8 else v

    batch = {
        k: decode_mask(v)
        for k, v in batch.items()
        if k not in ("img", "img_y", "img_c")
    }
    batch["img"] = img

    def loss_fn(params):
        edge_out, dp_out = model.apply(
            {"params": params, "batch_stats": state.batch_stats}, batch["img"]
        )  # (N, g, g, 1), (N, g, g, 2)
        n = edge_out.shape[0]
        return irn_losses(
            edge_out.reshape(n, -1), dp_out.reshape(n, -1, 2),
            batch["bg_pos"], batch["fg_pos"], batch["neg"], pi,
        )

    grads, metrics = jax.grad(loss_fn, has_aux=True)(state.params)
    updates, new_opt = tx.update(grads, state.opt_state, state.params)
    new_params = jax.tree.map(lambda p, u: p + u, state.params, updates)
    return state.replace(step=state.step + 1, params=new_params, opt_state=new_opt), metrics


@functools.lru_cache(maxsize=4)
def _grid_path_index(cfg: IRNTrainConfig) -> PathIndex:
    return PathIndex(cfg.radius, (cfg.grid, cfg.grid))
