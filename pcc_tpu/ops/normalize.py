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


def n_scale_batch(batch_pc: jnp.ndarray, margin: float = 0.01):
    """Batch scale-only normalization (reference pn_kit.py:68-87: centering
    is commented out there, so this scales each cloud by
    (1-margin)/longest-extent without recentring). Unused by the CLIs in
    the reference; provided for API parity.

    Args:
      batch_pc: [B, N, 3].
    Returns:
      (scaled [B, N, 3], scaling [B]).
    """
    extent = jnp.max(batch_pc, axis=1) - jnp.min(batch_pc, axis=1)  # [B, 3]
    longest = jnp.max(extent, axis=-1)                              # [B]
    scaling = (1.0 - margin) / longest
    return batch_pc * scaling[:, None, None], scaling


def d_n_scale_batch(batch_pc: jnp.ndarray, scaling: jnp.ndarray) -> jnp.ndarray:
    """Inverse of n_scale_batch (reference pn_kit.py:89-95)."""
    return batch_pc / scaling[:, None, None]
