"""Shared tiling arithmetic for the Pallas kernels (single source of truth —
the pad semantics must agree between a kernel's forward and backward)."""

from __future__ import annotations

import jax.numpy as jnp


def round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def pad_axis(x, axis: int, mult: int):
    """Zero-pad `axis` up to the next multiple of `mult`."""
    pad = (-x.shape[axis]) % mult
    if pad:
        widths = [(0, 0)] * x.ndim
        widths[axis] = (0, pad)
        x = jnp.pad(x, widths)
    return x
