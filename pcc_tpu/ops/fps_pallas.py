"""Pallas TPU kernel for farthest point sampling.

FPS is the one inherently sequential stage of the codec (S dependent
iterations — SURVEY.md §7 hard-parts list). The XLA fori_loop version
(ops/fps.py) round-trips the running distance array through HBM between
iterations; this kernel keeps the point block and the running distance
vector resident in VMEM for all S iterations, so each step is a pure VPU
pass: broadcast-subtract, square-accumulate, running min, argmax.

Layout notes: points are fed transposed as [B, 3, N] so the long axis sits
on the 128-wide lane dimension (a [N, 3] layout would waste 125/128 lanes).
A whole block of clouds advances together through each of the S iterations
(batch on sublanes): the per-iteration op sequence is identical for every
cloud and each op touches only ~KBs per cloud, so per-op overhead — not
bandwidth — dominates a one-cloud-per-step grid. Batching 16 clouds per
grid step amortizes that overhead 16x (the per-cloud math and its op order
are unchanged, so indices stay bit-identical to the one-cloud kernel and
to ops/fps.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fps_kernel(start_ref, xyz_ref, out_ref, npoint: int):
    """start_ref: [BB, 1] i32; xyz_ref: [BB, 3, N] f32;
    out_ref: [BB, npoint] i32. All clouds of the block run the S
    iterations in lockstep (carry rows are independent per cloud)."""
    xyz = xyz_ref[...]                     # [BB, 3, N] — resident in VMEM
    bb, _, n = xyz.shape

    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (bb, n), 1)         # [BB, N]
    out_iota = jax.lax.broadcasted_iota(jnp.int32, (bb, npoint), 1)

    def body(i, carry):
        distance, farthest, acc = carry    # [BB, N] f32, [BB, 1] i32, acc i32
        acc = jnp.where(out_iota == i, farthest, acc)
        # extract column `farthest` as a masked reduction — a dynamic
        # single-lane gather is a lane-crossing op Mosaic won't vectorize
        onehot = (lane_ids == farthest).astype(jnp.float32)            # [BB, N]
        centroid = jnp.sum(xyz * onehot[:, None, :], axis=2,
                           keepdims=True)                              # [BB, 3, 1]
        diff = xyz - centroid
        d = jnp.sum(diff * diff, axis=1)                               # [BB, N]
        distance = jnp.minimum(distance, d)
        # argmax over lanes as max + where + min: Mosaic's native arg-
        # reduction lowering over the lane axis is an order of magnitude
        # slower than this composition (see ops/sa_pallas._argmin_lanes);
        # tie order matches jnp.argmax (lowest index among maxima)
        m = jnp.max(distance, axis=1, keepdims=True)
        farthest = jnp.min(
            jnp.where(distance == m, lane_ids, n), axis=1,
            keepdims=True).astype(jnp.int32)
        return distance, farthest, acc

    init = (jnp.full((bb, n), 1e10, dtype=jnp.float32),
            start_ref[...],
            jnp.zeros((bb, npoint), jnp.int32))
    _, _, acc = jax.lax.fori_loop(0, npoint, body, init)
    out_ref[...] = acc


def fps_pallas(xyz: jnp.ndarray, npoint: int, starts: jnp.ndarray,
               block_b: int = 16, interpret: bool = False) -> jnp.ndarray:
    """Batched FPS via the Pallas kernel: [B, N, 3] + starts [B] ->
    [B, npoint] int32 (same contract as ops.fps.farthest_point_sample_batch).

    interpret=True runs the kernel under the Pallas interpreter so CPU CI
    can assert index-correctness of the exact kernel the TPU executes."""
    B, N, _ = xyz.shape
    block_b = min(block_b, B)
    xyz_t = jnp.transpose(xyz, (0, 2, 1)).astype(jnp.float32)  # [B, 3, N]
    starts2 = starts.astype(jnp.int32).reshape(B, 1)
    pad = (-B) % block_b
    if pad:
        xyz_t = jnp.concatenate(
            [xyz_t, jnp.zeros((pad, 3, N), jnp.float32)], axis=0)
        starts2 = jnp.concatenate(
            [starts2, jnp.zeros((pad, 1), jnp.int32)], axis=0)
    Bp = B + pad
    out = pl.pallas_call(
        functools.partial(_fps_kernel, npoint=npoint),
        grid=(Bp // block_b,),
        in_specs=[
            pl.BlockSpec((block_b, 1), lambda b: (b, 0)),
            pl.BlockSpec((block_b, 3, N), lambda b: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((block_b, npoint), lambda b: (b, 0)),
        out_shape=jax.ShapeDtypeStruct((Bp, npoint), jnp.int32),
        # [BB, 3, N] f32 + a few [BB, N] carries: ~25 MB at BB=16, N=8192 —
        # past the 16 MB default scoped limit; v5e has 128 MB VMEM/core
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(starts2, xyz_t)
    return out[:B]


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
