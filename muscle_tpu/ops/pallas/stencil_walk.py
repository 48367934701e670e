"""VMEM-resident Pallas kernel for the stencil random walk.

The XLA stencil walk (ops/random_walk.py propagate_to_edge_stencil) is
bandwidth-bound: every one of the 2^exp_times steps reads and writes the
(C, H, W) iterate plus 2*D shifted operands through HBM.  At the
production walk grid (<=128x128, C=20, D=34 directions for radius 5) the
ENTIRE walk state — iterate, per-direction affinities, inverse column
sums — is ~7 MB and fits in VMEM, so this kernel runs all steps on-chip
with zero HBM traffic between steps.

Exactness without masks: the walk domain is padded to (Hp, Wp) lanes and
the per-direction affinity maps are built with edge=1.0 in the padding
(affinity 0 for any pair whose path touches a pad cell — the path-cell
enumeration includes both endpoints).  A source pixel whose +d partner
falls outside the (Hp, Wp) torus is exactly a pixel whose circular-roll
read wraps around — and its affinity is 0 by construction, so
CIRCULAR shifts reproduce zero-fill shifts bit-for-bit in contribution.

Per step, for x <- x @ T (T the column-normalised affinity):
    x'[p] = ( x[p] + sum_d  x[p-d] * v_d[p-d]  +  x[p+d] * v_d[p] ) / col[p]
          = ( x[p] + sum_d  roll(x * v_d, +d)[p]
                   + roll(x, -d)[p] * v_d[p] ) * inv[p]
— two rolls and two multiply-adds per direction, with the iterate blocked
over class chunks (pl.GridSpec) so live VMEM stays ~2 blocks + the
direction maps (see the kernel comment for the rejected alternatives).

Reference being reimplemented: src/indexing.py:116-150 (transition-matrix
random walk), redesigned as a spatial stencil.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _roll_rows(a: jax.Array, dy: int) -> jax.Array:
    return a if dy == 0 else jnp.roll(a, dy, axis=-2)


def _roll_cols(a: jax.Array, dx: int) -> jax.Array:
    return a if dx == 0 else jnp.roll(a, dx, axis=-1)


def _make_kernel(dirs: tuple[tuple[int, int], ...], steps: int):
    def kernel(x_ref, vs_ref, inv_ref, out_ref):
        inv = inv_ref[:]

        def body(_, x):
            acc = x
            # live VMEM stays ~2 iterate-blocks + the direction maps.
            # roll(x*v, +d) == roll(x, +d) * roll(v, +d) at the same
            # roll/mul count, so no shifted copy of vs is ever needed;
            # hoisting shared lane rolls would likewise cost 9 extra live
            # copies of the iterate — both blow the 16 MB scoped-VMEM
            # limit (vmapped batches hit it first).
            for d, (dy, dx) in enumerate(dirs):
                v = vs_ref[d]
                acc = acc + _roll_rows(_roll_cols(x * v, dx), dy)
                acc = acc + _roll_rows(_roll_cols(x, -dx), -dy) * v
            return acc * inv

        out_ref[:] = jax.lax.fori_loop(0, steps, body, x_ref[:])

    return kernel


@functools.partial(
    jax.jit, static_argnames=("dirs", "steps", "interpret")
)
def stencil_walk_pallas(
    x0: jax.Array,
    vs: jax.Array,
    inv: jax.Array,
    dirs: tuple[tuple[int, int], ...],
    steps: int,
    interpret: bool = False,
) -> jax.Array:
    """Run ``steps`` walk iterations entirely in VMEM.

    Args:
      x0: (C, Hp, Wp) masked CAM iterate, zero in padding.
      vs: (D, Hp, Wp) per-direction beta-powered affinities, built on the
        SAME padded domain with edge=1.0 padding (see module docstring).
      inv: (Hp, Wp) reciprocal column sums (1.0 in padding).
      dirs: static ((dy, dx), ...) matching vs' leading axis.
      steps: number of walk steps (2**exp_times).
    Returns:
      (C, Hp, Wp) propagated iterate.
    """
    c, hp, wp = x0.shape
    # grid over class chunks: classes walk independently (x @ T is per-row),
    # so blocking C keeps the live iterate small while vs stays resident
    bc = c if c <= _BLOCK_C else _BLOCK_C
    cp = (c + bc - 1) // bc * bc
    if cp != c:
        x0 = jnp.pad(x0, ((0, cp - c), (0, 0), (0, 0)))
    out = pl.pallas_call(
        _make_kernel(dirs, steps),
        grid=(cp // bc,),
        out_shape=jax.ShapeDtypeStruct((cp, hp, wp), x0.dtype),
        in_specs=[
            pl.BlockSpec((bc, hp, wp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bc, hp, wp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(x0, vs, inv)
    return out[:c]


_BLOCK_C = 4


def vmem_fits(c: int, n_dirs: int, hp: int, wp: int, budget: int = 12_000_000) -> bool:
    """Conservative VMEM check for the class-blocked kernel: two iterate
    blocks + roll temporaries + vs + inv."""
    bc = min(c, _BLOCK_C)
    return (5 * bc + n_dirs + 3) * hp * wp * 4 <= budget
