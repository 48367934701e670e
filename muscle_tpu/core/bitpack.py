"""Bit-packed 0/1 mask upload: host pack / device unpack.

The IRN affinity targets (VOC12AffinityDataset bg_pos/fg_pos/neg,
reference lineage src/data.py:445-754) are strictly 0/1 over the (D, P)
pair grid and dominate the training batch's host->device bytes once the
image ships as YCbCr 4:2:0.  Packing 8 pairs per byte (np.packbits,
bitorder='big') is an EXACT re-encoding — the device unpack is a shift
and mask that XLA fuses into the loss's elementwise prologue.
"""

from __future__ import annotations

import numpy as np


def packbits_last(mask: np.ndarray) -> np.ndarray:
    """0/1 array (..., P) with P % 8 == 0 -> uint8 (..., P/8) (big-endian
    bit order, the np.packbits default — exact inverse of unpackbits_last).
    """
    p = mask.shape[-1]
    if p % 8:
        raise ValueError(f"packbits_last needs last dim % 8 == 0, got {p}")
    return np.packbits(mask.astype(bool), axis=-1)


def unpackbits_last(packed, p: int):
    """Device inverse: uint8 (..., P/8) -> float32 0/1 (..., P).

    jax-traced; a broadcasted right-shift + mask (bitorder='big': bit 7 of
    byte 0 is element 0), fused by XLA into whatever consumes the mask.
    """
    import jax.numpy as jnp

    if packed.shape[-1] * 8 != p:
        raise ValueError(
            f"packed last dim {packed.shape[-1]} does not unpack to {p}"
        )
    shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)
    bits = (packed[..., None] >> shifts) & jnp.uint8(1)
    return bits.reshape(*packed.shape[:-1], p).astype(jnp.float32)
