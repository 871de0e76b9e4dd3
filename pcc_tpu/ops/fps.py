"""Farthest point sampling as a compiled TPU loop.

The reference runs FPS as a Python loop of torch ops with a random start
index (pn_kit.py:309-330). FPS is inherently sequential in the number of
samples; here the S iterations run inside one `lax.fori_loop` that XLA
compiles to a single on-device program, and the whole batch advances in
lock-step so every iteration is a [B, N] vector op that fills the VPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def farthest_point_sample(xyz: jnp.ndarray, npoint: int, start: jnp.ndarray) -> jnp.ndarray:
    """FPS indices for one cloud.

    Args:
      xyz: [N, 3] points.
      start: scalar int32 index of the first centroid (the reference draws it
        with torch.randint, pn_kit.py:321; pass a PRNG-derived index for the
        same semantics or 0 for determinism).
    Returns:
      [npoint] int32 indices.
    """
    N = xyz.shape[0]

    def body(i, state):
        distance, farthest, centroids = state
        centroids = centroids.at[i].set(farthest)
        centroid = xyz[farthest]
        dist = jnp.sum((xyz - centroid) ** 2, axis=-1)
        distance = jnp.minimum(distance, dist)
        farthest = jnp.argmax(distance).astype(jnp.int32)
        return distance, farthest, centroids

    init = (
        jnp.full((N,), 1e10, dtype=xyz.dtype),
        start.astype(jnp.int32),
        jnp.zeros((npoint,), dtype=jnp.int32),
    )
    _, _, centroids = jax.lax.fori_loop(0, npoint, body, init)
    return centroids


def farthest_point_sample_batch(
    xyz: jnp.ndarray, npoint: int, key: jax.Array | None = None
) -> jnp.ndarray:
    """Batched FPS (reference pn_kit.py:309-330 semantics).

    Args:
      xyz: [B, N, 3].
      key: optional PRNG key for the random start index per cloud; None = 0.
    Returns:
      [B, npoint] int32 indices.
    """
    B, N, _ = xyz.shape
    if key is None:
        starts = jnp.zeros((B,), dtype=jnp.int32)
    else:
        starts = jax.random.randint(key, (B,), 0, N, dtype=jnp.int32)
    return jax.vmap(farthest_point_sample, in_axes=(0, None, 0))(xyz, npoint, starts)


def fps_batch(xyz: jnp.ndarray, npoint: int, starts: jnp.ndarray,
              impl: str = "auto") -> jnp.ndarray:
    """Batched FPS with explicit start indices, auto-selecting the Pallas
    kernel on TPU (~3x faster on device) and the lax.fori_loop version
    elsewhere (CPU tests, interpreters).

    Args:
      xyz: [B, N, 3]; starts: [B] int32.
    Returns:
      [B, npoint] int32.
    """
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl == "pallas":
        from pcc_tpu.ops.fps_pallas import fps_pallas

        return fps_pallas(xyz, npoint, starts)
    return jax.vmap(farthest_point_sample, in_axes=(0, None, 0))(
        xyz, npoint, starts)


def random_point_sample_batch(xyz: jnp.ndarray, npoint: int,
                              key: jax.Array) -> jnp.ndarray:
    """Random subset of npoint points, same subset for every cloud in the
    batch (reference pn_kit.py:362-376 semantics: one shared permutation).
    Unused by the CLIs in the reference; provided for API parity."""
    N = xyz.shape[1]
    idx = jax.random.permutation(key, N)[:npoint]
    return xyz[:, idx, :]
