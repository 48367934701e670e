"""Multi-label classification losses (reference src/loss_multilabel.py and
inline train_mcl.py terms), exact jnp re-statements.

All take NHWC / (N, C) arrays and return scalars unless noted.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def focal_loss(
    probs: jax.Array, target: jax.Array, gamma: float = 2.0, alpha: float = 0.5
) -> jax.Array:
    """Multi-label focal loss on probabilities (reference
    src/loss_multilabel.py:68-91): sum over classes, mean over batch.

    Args:
      probs: (N, C) sigmoid probabilities (the reference passes
        ``torch.sigmoid(logits[:, 1:])``, train_mcl.py:180).
      target: (N, C) multi-hot labels.
    """
    pt = target * probs + (1.0 - target) * (1.0 - probs)
    focal = -alpha * (1.0 - pt) ** gamma * jnp.log(pt + 1e-9)
    return jnp.mean(jnp.sum(focal, axis=1))


def lsep_loss(pred: jax.Array, labels: jax.Array) -> jax.Array:
    """Log-Sum-Exp pairwise ranking loss (reference
    src/loss_multilabel.py:24-33), returned per-sample (N,).

    Faithful to the reference's quirk of zeroing (not excluding) invalid
    entries before the exp — absent classes still contribute exp(0) terms.
    """
    pos = jnp.where(labels == 0, 0.0, pred)
    neg = jnp.where(labels == 1, 0.0, pred)
    # (N, C_pos, C_neg): neg[j] - pos[i]
    exp_sub = jnp.exp(neg[:, None, :] - pos[:, :, None])
    exp_sum = jnp.sum(exp_sub, axis=(1, 2)) / (exp_sub.shape[1] * exp_sub.shape[2])
    return jnp.log(1.0 + exp_sum)


def soft_margin_loss(logits: jax.Array, target: jax.Array) -> jax.Array:
    """torch.nn.MultiLabelSoftMarginLoss (used at train_mcl.py:146,181):
    mean over classes of the per-class BCE-with-logits, mean over batch."""
    log_p = jax.nn.log_sigmoid(logits)
    log_not_p = jax.nn.log_sigmoid(-logits)
    per_class = -(target * log_p + (1.0 - target) * log_not_p)
    return jnp.mean(jnp.mean(per_class, axis=-1))


def er_topk_loss(
    cams: jax.Array, sgcs: jax.Array, valid_channels: jax.Array, frac: float = 0.2
) -> jax.Array:
    """Equivariant-regularisation top-k loss (reference train_mcl.py:188).

    mean of the top ``k = int(frac * valid_channels * h * w)`` values of
    |cams - sgcs| per sample.  ``valid_channels`` (= label.sum() over the
    batch) is data-dependent, so rather than a dynamic-k top-k we sort each
    sample's values descending and average the first k via a rank mask —
    identical result, static shapes.

    Args:
      cams: (N, H, W, C) detached softmax-normalised CAMs.
      sgcs: (N, H, W, C) softmax-normalised SGC maps (with grad).
      valid_channels: scalar int array.
    """
    n, h, w, c = cams.shape
    diff = jnp.abs(jax.lax.stop_gradient(cams) - sgcs).reshape(n, -1)
    k = (frac * valid_channels.astype(jnp.float32) * h * w).astype(jnp.int32)
    k = jnp.maximum(k, 1)
    sorted_desc = -jnp.sort(-diff, axis=-1)
    ranks = jnp.arange(diff.shape[-1])[None, :]
    mask = (ranks < k).astype(diff.dtype)
    return jnp.sum(sorted_desc * mask) / (n * k.astype(diff.dtype))
