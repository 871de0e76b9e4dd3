"""Pallas TPU kernel for farthest point sampling.

FPS is the one inherently sequential stage of the codec (S dependent
iterations — SURVEY.md §7 hard-parts list). The XLA fori_loop version
(ops/fps.py) round-trips the running distance array through HBM between
iterations; this kernel keeps the [3, N] point block and the [1, N]
distance vector resident in VMEM for all S iterations, so each step is a
pure VPU pass: broadcast-subtract, square-accumulate, running min, argmax.

Layout notes: points are fed transposed as [B, 3, N] so the long axis sits
on the 128-wide lane dimension (a [N, 3] layout would waste 125/128 lanes);
one grid program per cloud.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fps_kernel(start_ref, xyz_ref, out_ref, npoint: int):
    """start_ref: [B] i32 scalar-prefetch; xyz_ref: [1, 3, N] f32;
    out_ref: [1, 1, npoint] i32."""
    xyz = xyz_ref[0]                       # [3, N] — resident in VMEM
    n = xyz.shape[1]

    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)          # [1, N]

    def body(i, carry):
        distance, farthest = carry
        out_ref[0, 0, i] = farthest
        # extract column `farthest` as a masked reduction — a dynamic
        # single-lane gather is a lane-crossing op Mosaic won't vectorize
        onehot = (lane_ids == farthest).astype(jnp.float32)            # [1, N]
        centroid = jnp.sum(xyz * onehot, axis=1, keepdims=True)        # [3, 1]
        diff = xyz - centroid
        d = jnp.sum(diff * diff, axis=0, keepdims=True)                # [1, N]
        distance = jnp.minimum(distance, d)
        # argmax over lanes as max + where + min: Mosaic's native arg-
        # reduction lowering over the lane axis is an order of magnitude
        # slower than this composition (see ops/sa_pallas._argmin_lanes);
        # tie order matches jnp.argmax (lowest index among maxima)
        m = jnp.max(distance)
        farthest = jnp.min(
            jnp.where(distance == m, lane_ids, n)).astype(jnp.int32)
        return distance, farthest

    init = (jnp.full((1, n), 1e10, dtype=jnp.float32),
            start_ref[pl.program_id(0)])
    jax.lax.fori_loop(0, npoint, body, init)


def fps_pallas(xyz: jnp.ndarray, npoint: int, starts: jnp.ndarray,
               interpret: bool = False) -> jnp.ndarray:
    """Batched FPS via the Pallas kernel: [B, N, 3] + starts [B] ->
    [B, npoint] int32 (same contract as ops.fps.farthest_point_sample_batch,
    3x faster on device: ~150us vs ~480us per 8192-pt cloud on v5e).

    interpret=True runs the kernel under the Pallas interpreter so CPU CI
    can assert index-correctness of the exact kernel the TPU executes."""
    B, N, _ = xyz.shape
    xyz_t = jnp.transpose(xyz, (0, 2, 1)).astype(jnp.float32)  # [B, 3, N]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 3, N), lambda b, *_: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, npoint), lambda b, *_: (b, 0, 0),
                               memory_space=pltpu.SMEM),
    )
    out = pl.pallas_call(
        functools.partial(_fps_kernel, npoint=npoint),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, 1, npoint), jnp.int32),
        interpret=interpret,
    )(starts.astype(jnp.int32), xyz_t)
    return out[:, 0, :]


def farthest_point_sample_batch_pallas(
    xyz: jnp.ndarray, npoint: int, key: jax.Array | None = None
) -> jnp.ndarray:
    """Key-based convenience wrapper mirroring
    ops.fps.farthest_point_sample_batch."""
    B, N, _ = xyz.shape
    if key is None:
        starts = jnp.zeros((B,), dtype=jnp.int32)
    else:
        starts = jax.random.randint(key, (B,), 0, N, dtype=jnp.int32)
    return fps_pallas(xyz, npoint, starts)
