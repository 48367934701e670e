"""Per-loss-term liveness observables.

Two methods over the same stacked-terms function:

* ``jacrev`` — per-term parameter-gradient NORMS (one backward per term
  inside one jitted program).  The faithful observable, but its compile
  costs ~k backward graphs (~6 min per maker on a 1-vCPU host) — the
  round-3 multichip-dryrun timeout.
* ``jvp`` — per-term directional derivatives dL_i/dtheta . v for ONE fixed
  random tangent v, all terms in a single forward-mode pass (~2x forward
  cost, one small compile).  A dead path (stop_gradient bug, detached
  input) gives EXACTLY zero for every v; a live term is nonzero with
  probability 1 (|t_i| concentrates around ||g_i|| for per-coordinate
  standard-normal v).  The quick gate tier and the dryrun's always-cheap
  liveness use this; the full tier keeps jacrev norms.

The reference has no counterpart (torch training scripts simply trust
their loss sums, /root/reference/train_mcl.py:152-229); this is the
verification machinery the round-2/3 verdicts asked for.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def term_liveness(stacked, n_terms: int, params, method: str = "jacrev"):
    """``stacked(params) -> (n_terms,)`` losses; returns a pair of
    (n_terms,) arrays: (per-term loss VALUES, per-term liveness).  Liveness
    is the grad norm for 'jacrev', |directional derivative| for 'jvp'.

    The values let callers distinguish a DEAD path (value nonzero,
    liveness exactly zero — a stop_gradient bug) from a term that is
    legitimately NOT ENGAGED on this batch (value exactly zero by a
    data-dependent gate, e.g. BEACON's count>k boundary-sample gate,
    losses/beacon.py:194 — the reference skips those classes the same
    way, src/edge.py:297-316)."""
    if method == "jacrev":
        import optax

        def norms_fn(p):
            jac = jax.jacrev(stacked)(p)
            return stacked(p), jnp.stack([
                optax.global_norm(jax.tree.map(lambda x, i=i: x[i], jac))
                for i in range(n_terms)
            ])

        return jax.jit(norms_fn)(params)
    if method != "jvp":
        raise ValueError(f"unknown liveness method {method!r}")

    def jvp_fn(p):
        leaves, treedef = jax.tree.flatten(p)
        key = jax.random.key(0)
        tangents = jax.tree.unflatten(treedef, [
            jax.random.normal(jax.random.fold_in(key, i), l.shape, l.dtype)
            for i, l in enumerate(leaves)
        ])
        v, t = jax.jvp(stacked, (p,), (tangents,))
        return v, jnp.abs(t)

    return jax.jit(jvp_fn)(params)
