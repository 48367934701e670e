"""Earth-mover cross-view matching loss (reference src/loss_multilabel.py:108-338).

The reference extracts *ragged* random crop grids from the two views'
overlap region (src/torchutils.py:217-291), scores every crop pair with a
no-grad Sinkhorn EMD, and backpropagates through the best pair.  Ragged
crops are hostile to XLA, so this re-design keeps the semantics — dynamic
crop grids over the overlap, all-pairs no-grad Sinkhorn, top-1 with grad —
but samples every crop to a fixed PxP resolution with a gather-based
dynamic-window bilinear resize.  All shapes are static; the crop geometry
remains data-dependent.

Conscious deviation from the reference (documented per SURVEY §7): crop
resolutions are bucketed to PxP (default 7, the resolution the reference's
``static_matching`` uses and the lower edge of its dynamic range) instead of
ragged 7..28; the training signal is equivalent in expectation.

The exact-LP backends (qpth QP, cv2.EMD — reference :113-199) are provided
by the native C++ network-simplex solver in muscle_tpu.ops.exact_emd.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def sinkhorn_emd(
    cost: jax.Array,
    mu: jax.Array,
    nu: jax.Array,
    reg: float = 0.1,
    maxiter: int = 10,
) -> jax.Array:
    """Log-domain Sinkhorn distance (reference sinkhorn_logsumexp, :207-230).

    Faithful iteration structure: per step the modified cost matrix is
    computed once from (u, v); u is updated from it and v is updated from
    the SAME (stale-u) matrix.  Fully unrolled (maxiter is static and small)
    and differentiable.

    Args:
      cost: (N, M) cost matrix.
      mu, nu: (N,), (M,) marginals (unnormalised, as the reference leaves
        them on this path).
    Returns scalar sum(pi * stop_grad(cost)) / (N*M).
    """
    u = jnp.zeros_like(mu)
    v = jnp.zeros_like(nu)
    log_mu = jnp.log(mu + 1e-6)
    log_nu = jnp.log(nu + 1e-6)
    for _ in range(maxiter):
        m = (-cost + u[:, None] + v[None, :]) / reg
        u = reg * (log_mu - jax.scipy.special.logsumexp(m, axis=1)) + u
        v = reg * (log_nu - jax.scipy.special.logsumexp(m, axis=0)) + v
    m = (-cost + u[:, None] + v[None, :]) / reg
    pi = jnp.exp(m)
    return jnp.sum(pi * jax.lax.stop_gradient(cost)) / pi.size


def pairwise_cosine_cost(x: jax.Array, y: jax.Array) -> jax.Array:
    """1 - <x_i, y_j> for flattened crop features (reference pair_wise_cos,
    :232-242, 'CV' form).  x: (N, C), y: (M, C) -> (N, M)."""
    return 1.0 - x @ y.T


def crop_weight_vector(x: jax.Array, y: jax.Array) -> jax.Array:
    """Cross-attention marginal weights (reference get_weight_vector,
    :250-257): w_i = <x_i, mean_j y_j>.  x: (N, C), y: (M, C) -> (N,)."""
    return x @ jnp.mean(y, axis=0)


def _dynamic_window_resize(
    fm: jax.Array, box: jax.Array, out_hw: tuple[int, int]
) -> jax.Array:
    """Bilinearly sample a dynamic (r, c, h, w) window of an (H, W, C) map
    onto a static (oh, ow) grid, align_corners=True (matching the
    F.interpolate call in get_dynamic_crops, src/torchutils.py:268)."""
    from muscle_tpu.core.resize import dynamic_window_resize

    return dynamic_window_resize(fm, box, out_hw, align_corners=True)


def _overlap_box(coord: jax.Array) -> jax.Array:
    return coord.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("crop_px",))
def static_matching_emd(
    vw1: jax.Array,
    vw2: jax.Array,
    coord1: jax.Array,
    coord2: jax.Array,
    crop_px: int = 7,
) -> jax.Array:
    """'static' EMD mode (reference static_matching, :259-285): mean
    pairwise-cosine distance of the two views' overlap regions resampled to
    ``crop_px`` long side; returns the sum of the two smallest per-sample
    distances (the reference sorts the per-crop-pair means and adds the
    best two)."""
    n = vw1.shape[0]

    def per_sample(fm1, fm2, c1, c2):
        b1 = _overlap_box(c1)
        b2 = _overlap_box(c2)
        x = _dynamic_window_resize(fm1, b1, (crop_px, crop_px)).reshape(crop_px * crop_px, -1)
        y = jax.lax.stop_gradient(
            _dynamic_window_resize(fm2, b2, (crop_px, crop_px))
        ).reshape(crop_px * crop_px, -1)
        return jnp.mean(pairwise_cosine_cost(x, y))

    dists = jax.vmap(per_sample)(vw1, vw2, coord1, coord2)
    two = jnp.sort(dists)[:2]
    return jnp.sum(two)


@functools.partial(jax.jit, static_argnames=("grid", "crop_px", "maxiter"))
def dynamic_matching_emd(
    vw1: jax.Array,
    vw2: jax.Array,
    coord1: jax.Array,
    coord2: jax.Array,
    rng: jax.Array,
    grid: int = 3,
    crop_px: int = 7,
    maxiter: int = 10,
) -> jax.Array:
    """Cross-view EMD with dynamic crop matching (reference dynamic_matching,
    :287-326 + get_dynamic_crops, torchutils.py:217-291).

    Args:
      vw1: (N, Hv, Wv, C) grad view (normalised softmax CAMs).
      vw2: (N, Hv, Wv, C) no-grad view.
      coord1/coord2: (N, 4) overlap rectangles (row, col, h, w) per view.
      rng: PRNG key for the randomised crop grid.
    Returns the mean top-1 Sinkhorn EMD over valid samples.
    """
    n = vw1.shape[0]
    keys = jax.random.split(rng, n)

    def per_sample(fm1, fm2, c1, c2, key):
        c1 = _overlap_box(c1)
        c2 = _overlap_box(c2)
        h, w = c1[2], c1[3]
        hf = h.astype(jnp.float32)
        wf = w.astype(jnp.float32)
        valid = (h >= 15) & (w >= 15) & (hf / wf <= 5.0) & (wf / hf <= 5.0)

        # --- crops1: grid x grid random-ish windows of size (h/3..h/2) ---
        k1, k2 = jax.random.split(key)
        lh = (hf * jax.random.uniform(k1, (), minval=1 / 3, maxval=1 / 2)).astype(jnp.int32)
        lw = (wf * jax.random.uniform(k2, (), minval=1 / 3, maxval=1 / 2)).astype(jnp.int32)
        lh = jnp.maximum(lh, 5)
        lw = jnp.maximum(lw, 5)
        steps = jnp.linspace(0.0, 1.0, grid)

        def crop1(fy, fx):
            r = c1[0] + (fy * (hf - lh.astype(jnp.float32))).astype(jnp.int32)
            c = c1[1] + (fx * (wf - lw.astype(jnp.float32))).astype(jnp.int32)
            box = jnp.stack([r, c, lh, lw])
            patch = _dynamic_window_resize(fm1, box, (crop_px, crop_px))
            return patch.reshape(-1, patch.shape[-1])  # (P*P, C)

        crops1 = jax.vmap(lambda fy: jax.vmap(lambda fx: crop1(fy, fx))(steps))(steps)
        crops1 = crops1.reshape(grid * grid, crop_px * crop_px, -1)

        # --- crops2: the four half-size quadrants (reference :279-284) ---
        h2 = jnp.maximum(c2[2] // 2, 1)
        w2 = jnp.maximum(c2[3] // 2, 1)

        def crop2(qy, qx):
            box = jnp.stack([c2[0] + qy * h2, c2[1] + qx * w2, h2, w2])
            patch = _dynamic_window_resize(fm2, box, (crop_px, crop_px))
            return patch.reshape(-1, patch.shape[-1])

        quads = jnp.array([[0, 0], [0, 1], [1, 0], [1, 1]])
        crops2 = jax.vmap(lambda q: crop2(q[0], q[1]))(quads)  # (4, P*P, C)
        crops2 = jax.lax.stop_gradient(crops2)

        # --- all-pairs no-grad sinkhorn, then top-1 with grad ---
        def pair_emd(x, y):
            cost = pairwise_cosine_cost(x, y)
            w1 = crop_weight_vector(x, y)
            w2 = crop_weight_vector(y, x)
            return sinkhorn_emd(cost, w1, w2, maxiter=maxiter)

        scores = jax.lax.stop_gradient(
            jax.vmap(lambda x: jax.vmap(lambda y: pair_emd(x, y))(crops2))(crops1)
        )  # (G*G, 4)
        flat = scores.reshape(-1)
        best = jnp.argmin(flat)
        bi, bj = best // 4, best % 4
        top1 = pair_emd(crops1[bi], crops2[bj])
        return jnp.where(valid, top1, 0.0), valid

    losses, valids = jax.vmap(per_sample)(vw1, vw2, coord1, coord2, keys)
    count = jnp.maximum(jnp.sum(valids), 1)
    return jnp.sum(losses) / count
