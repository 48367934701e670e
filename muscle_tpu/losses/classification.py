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
    batch) is data-dependent AND k is huge (~840k values/sample), so
    instead of a sort (a full TPU sort of 4M elements costs ~100x more
    than a vector pass) we binary-search the per-sample top-k threshold
    (22 masked-count passes, no gradient through the search) and average
    ``sum(x * [x > t]) + (k - count_above) * t`` — exactly the top-k mean,
    with boundary ties resolved at the threshold value.

    Args:
      cams: (N, H, W, C) detached softmax-normalised CAMs.
      sgcs: (N, H, W, C) softmax-normalised SGC maps (with grad).
      valid_channels: scalar int array.
    """
    n, h, w, c = cams.shape
    diff = jnp.abs(jax.lax.stop_gradient(cams) - sgcs).reshape(n, -1)
    k = (frac * valid_channels.astype(jnp.float32) * h * w).astype(jnp.int32)
    k = jnp.clip(k, 1, diff.shape[-1])
    kf = k.astype(jnp.float32)

    # The barrier pins `d` as a materialised buffer: without it XLA remats
    # the whole |softmaxnorm(cam) - softmaxnorm(sgc)| chain inside every
    # search iteration (measured 2.5x whole-step slowdown in f32 and ~100x
    # in bf16 at 448^2).
    d = jax.lax.optimization_barrier(jax.lax.stop_gradient(diff).astype(jnp.float32))
    lo = jnp.zeros((n,), jnp.float32)
    hi = jnp.max(d, axis=-1)

    def body(_, carry):
        lo, hi = carry
        mid = 0.5 * (lo + hi)
        above = jnp.sum((d > mid[:, None]).astype(jnp.float32), axis=-1)
        # too many above -> raise the floor; too few -> lower the ceiling
        lo = jnp.where(above > kf, mid, lo)
        hi = jnp.where(above > kf, hi, mid)
        return lo, hi

    lo, hi = jax.lax.fori_loop(0, 22, body, (lo, hi))
    t = hi  # count(d > t) <= k <= count(d >= t)

    above_mask = d > t[:, None]
    n_above = jnp.sum(above_mask.astype(jnp.float32), axis=-1)
    top_sum = jnp.sum(jnp.where(above_mask, diff, 0.0), axis=-1)
    # the remaining (k - n_above) top-k slots hold values inside the final
    # bracket (width max/2^22), i.e. == t to float precision
    top_sum = top_sum + (kf - n_above) * t
    return jnp.mean(top_sum / kf)
