"""Image-level (IMC) and pixel-level (PixPro) contrastive losses.

TPU re-designs of reference src/loss_multilabel.py:36-66 (an O(B^2) python
double loop) and :93-105 (per-sample ragged crops).  Both become fixed-shape
masked tensor ops: the IMC loop is a BxB masked similarity matrix, and the
PixPro overlap crops become vmapped dynamic slices of a static view-sized
window with a validity mask.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def info_nce(
    query: jax.Array,
    positive_keys: jax.Array,
    negative_keys: jax.Array,
    temperature: float = 0.1,
) -> jax.Array:
    """Generic InfoNCE helper (reference src/loss_multilabel.py:9-21;
    defined there but unused by the scripts — kept for API parity).

    query: (B, D); positive_keys: (B, P, D); negative_keys: (B, N, D).
    """
    pos = jnp.einsum("bd,bpd->bp", query, positive_keys).mean(axis=1, keepdims=True)
    neg = jnp.einsum("bd,bnd->bn", query, negative_keys)
    logits = jnp.concatenate([pos, neg], axis=1) / temperature
    return -jnp.mean(jax.nn.log_softmax(logits, axis=1)[:, 0])


def image_level_contrast(
    emb: jax.Array, label: jax.Array, temperature: float = 0.1
) -> jax.Array:
    """IMC loss (reference src/loss_multilabel.py:36-66), vectorised.

    Pairs (i, j) with j > i are positives when their label sets are
    identical and negatives when disjoint.  Sample i contributes
    -log(sim_pos / (sim_pos + sim_neg)) only when it has at least one
    positive, at least one negative, and strictly more negatives than
    positives — including the reference's 1e-6 accumulator seeds.

    Returns a scalar (0 when no sample qualifies, mirroring the
    ``torch.is_tensor`` guard at train_mcl.py:194).
    """
    norm = jnp.linalg.norm(emb, axis=-1, keepdims=True)
    emb = emb / jnp.maximum(norm, 1e-6)
    sim = jnp.exp(emb @ emb.T / temperature)  # (B, B)

    eq = jnp.all(label[:, None, :] == label[None, :, :], axis=-1)
    disjoint = jnp.sum(label[:, None, :] * label[None, :, :], axis=-1) == 0
    b = emb.shape[0]
    upper = jnp.triu(jnp.ones((b, b), dtype=bool), k=1)

    pos_mask = (upper & eq).astype(sim.dtype)
    neg_mask = (upper & disjoint).astype(sim.dtype)
    pos_count = jnp.sum(pos_mask, axis=1)
    neg_count = jnp.sum(neg_mask, axis=1)

    sim_pos = 1e-6 + jnp.sum(pos_mask * sim, axis=1)
    denom = sim_pos + 1e-6 + jnp.sum(neg_mask * sim, axis=1)
    active = (pos_count >= 1) & (neg_count >= 1) & (neg_count > pos_count)
    per_sample = -jnp.log(sim_pos / denom)
    return jnp.sum(jnp.where(active, per_sample, 0.0)) / b


def _masked_overlap_cos(fm1, fm2, coord1, coord2):
    """Per-sample overlap cosine for one (fm1, fm2) pair.

    fm*: (H, W, C); coord*: (4,) = (row, col, h_inter, w_inter) relative to
    each view.  Both overlap windows have identical (h_inter, w_inter).
    """
    hv, wv, _ = fm1.shape
    pad = ((0, hv), (0, wv), (0, 0))
    f1 = jax.lax.dynamic_slice(
        jnp.pad(fm1, pad), (coord1[0], coord1[1], 0), (hv, wv, fm1.shape[-1])
    )
    f2 = jax.lax.dynamic_slice(
        jnp.pad(fm2, pad), (coord2[0], coord2[1], 0), (hv, wv, fm2.shape[-1])
    )
    rows = jnp.arange(hv)[:, None]
    cols = jnp.arange(wv)[None, :]
    valid = (rows < coord1[2]) & (cols < coord1[3])
    dot = jnp.sum(f1 * f2, axis=-1)
    n1 = jnp.linalg.norm(f1, axis=-1)
    n2 = jnp.linalg.norm(f2, axis=-1)
    cos = dot / jnp.maximum(n1 * n2, 1e-8)
    count = jnp.maximum(jnp.sum(valid), 1)
    return jnp.sum(jnp.where(valid, cos, 0.0)) / count


def pixpro_loss(
    fm1: jax.Array, fm2: jax.Array, coord1: jax.Array, coord2: jax.Array
) -> jax.Array:
    """PixPro cross-view pixel consistency (reference
    src/loss_multilabel.py:93-105).

    Args:
      fm1: (N, H, W, C) view-1 maps (through grad).
      fm2: (N, H, W, C) view-2 maps (stop-gradient applied here, as the
        reference detaches fm2 inside the loss).
      coord1, coord2: (N, 4) int (row, col, h_inter, w_inter) overlap
        rectangles relative to each view (from the two-view dataset).
    Returns 1 - mean overlap cosine.
    """
    fm2 = jax.lax.stop_gradient(fm2)
    per = jax.vmap(_masked_overlap_cos)(fm1, fm2, coord1, coord2)
    return 1.0 - jnp.mean(per)
