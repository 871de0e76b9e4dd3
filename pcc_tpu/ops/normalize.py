"""Unit-cube normalization (reference pn_kit.py:47-66 semantics).

Centers the cloud on 0.5 and scales the longest bbox extent to (1 - margin).
Exact inverse provided; the (center, longest) pair is the `.c.bin` header
stream (compress.py:148-152).
"""

from __future__ import annotations

import jax.numpy as jnp


def normalize(pc: jnp.ndarray, margin: float = 0.01):
    """Normalize a single cloud.

    Args:
      pc: [N, 3] (the reference's [1, N, 3] with the batch dim dropped).
    Returns:
      (pc01 [N, 3], center [3], longest scalar).
    """
    mx = jnp.max(pc, axis=0)
    mn = jnp.min(pc, axis=0)
    center = (mx + mn) / 2.0
    longest = jnp.max(mx - mn)
    pc01 = (pc - center) * (1.0 - margin) / longest + 0.5
    return pc01, center, longest


def denormalize(pc01: jnp.ndarray, center: jnp.ndarray, longest: jnp.ndarray,
                margin: float = 0.01) -> jnp.ndarray:
    """Exact inverse of `normalize` (reference pn_kit.py:62-66)."""
    return (pc01 - 0.5) * longest / (1.0 - margin) + center
