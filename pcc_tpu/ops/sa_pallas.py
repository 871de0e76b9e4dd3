"""Pallas TPU kernel: fused SetAbstraction (KNN + group + MLP + max).

The patch-AE encoder's SetAbstraction is the codec's HBM-bandwidth hog: the
XLA path materializes the grouped-neighbor activations
[P, K, knn, 32/64/128] between every MLP layer — ~15 GB of HBM traffic per
128-cloud batch — and profiling shows the AE encoder at ~75% of device
encode time (bench.py --profile). This kernel keeps everything per patch
block resident in VMEM: the [N, N] distance matrix (one MXU matmul), an
iterative masked-argmin neighbor selection (ascending distance, lowest
index first — the lax.top_k tie order of ops/knn.py::knn_points), a
one-hot-matmul gather (dynamic vector gathers don't vectorize on TPU;
a [N, N] x [N, 3] matmul does, cf. ops/fps_pallas.py), the 3-layer MLP,
and a running max over neighbors. HBM sees only [P, N, 3] in and
[P, N, F] out.

Replaces the hot path of reference pn_kit.py:146-211 (SetAbstraction with
npoint == N, i.e. the per-point local-feature layer of AE.py:16).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _sa_kernel(pts_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
               out_ref, *, knn: int, compute_dtype):
    """pts_ref: [BP, N, 3] f32; w/b: f32 MLP params; out: [BP, N, F3] f32."""
    pts = pts_ref[...]                                   # [BP, N, 3]
    BP, N, _ = pts.shape
    F3 = out_ref.shape[-1]

    # pairwise squared distances, expanded form (selection only — matches
    # ops/knn.py::sq_dists, whose cross term rides the MXU)
    sq = jnp.sum(pts * pts, axis=-1)                     # [BP, N]
    cross = jax.lax.dot_general(
        pts, pts, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)              # [BP, N, N]
    d2 = jnp.maximum(sq[:, :, None] - 2.0 * cross + sq[:, None, :], 0.0)

    iota = jax.lax.broadcasted_iota(jnp.int32, (BP, N, N), 2)

    def load(ref):
        w = ref[...]
        return w.astype(compute_dtype) if compute_dtype is not None else w

    w1, b1, w2, b2, w3, b3 = (load(r) for r in
                              (w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref))

    def dense(x, w, b):
        # bf16 inputs with f32 accumulation: Mosaic requires 32-bit matmul
        # accumulators ('Expected matmul acc to be 32-bit'), so unlike flax
        # Dense the product is f32; re-cast between layers to keep the
        # activation rounding of the bf16 XLA path
        if compute_dtype is not None:
            x = x.astype(compute_dtype)
        h = jnp.dot(x, w, preferred_element_type=jnp.float32)
        h = jax.nn.relu(h + b.astype(jnp.float32))
        return h.astype(compute_dtype) if compute_dtype is not None else h

    def mlp(x):
        return dense(dense(dense(x, w1, b1), w2, b2), w3, b3)

    def body(_, carry):
        d2, acc = carry
        idx = jnp.argmin(d2, axis=-1)                    # [BP, N]
        onehot = (iota == idx[:, :, None]).astype(jnp.float32)
        nb = jax.lax.dot_general(
            onehot, pts, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)          # [BP, N, 3]
        d2 = d2 + onehot * 1e10                          # exclude from next pick
        h = mlp((nb - pts).reshape(BP * N, 3))           # [BP*N, F3]
        return d2, jnp.maximum(acc, h.astype(jnp.float32))

    acc0 = jnp.full((BP * N, F3), -jnp.inf, jnp.float32)
    _, acc = jax.lax.fori_loop(0, knn, body, (d2, acc0))
    out_ref[...] = acc.reshape(BP, N, F3)


def sa_fused(patches: jnp.ndarray, weights, biases, *, knn: int = 16,
             compute_dtype=None, block_p: int = 8,
             interpret: bool = False) -> jnp.ndarray:
    """Fused SetAbstraction forward over a flat patch batch.

    Args:
      patches: [P, N, 3] float32 (N points per patch).
      weights/biases: 3 MLP layers, shapes [(3,F1),(F1,F2),(F2,F3)] / [Fi].
      knn: neighbors per point (16 in the AE config, AE.py:16).
      compute_dtype: None for f32, or jnp.bfloat16 for mixed precision.
      block_p: patches per grid step (VMEM working set ~[block_p, N, N] f32).
      interpret: run under the Pallas interpreter (CPU CI coverage of the
        exact kernel the TPU executes, as for ops/fps_pallas.py).
    Returns:
      [P, N, F3] float32 per-point local features (max over neighbors).
    """
    P, N, _ = patches.shape
    (w1, w2, w3), (b1, b2, b3) = weights, biases
    F3 = w3.shape[-1]

    pad = (-P) % block_p
    if pad:
        patches = jnp.concatenate(
            [patches, jnp.zeros((pad, N, 3), patches.dtype)], axis=0)
    Pp = P + pad

    full = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim)
    out = pl.pallas_call(
        functools.partial(_sa_kernel, knn=knn, compute_dtype=compute_dtype),
        grid=(Pp // block_p,),
        in_specs=[
            pl.BlockSpec((block_p, N, 3), lambda i: (i, 0, 0)),
            full(w1), full(b1), full(w2), full(b2), full(w3), full(b3),
        ],
        out_specs=pl.BlockSpec((block_p, N, F3), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((Pp, N, F3), jnp.float32),
        interpret=interpret,
    )(patches.astype(jnp.float32), w1, b1, w2, b2, w3, b3)
    return out[:P]


def _encoder_kernel(pts_ref, sw1, sb1, sw2, sb2, sw3, sb3,
                    pw1, pb1, pw2, pb2, pw3, pb3, pw4, pb4,
                    out_ref, *, knn: int, compute_dtype):
    """Whole patch-encoder: SA (KNN+MLP+max) -> concat xyz -> PointNet
    (pointwise MLP, relu T,T,T,F) -> max over points. pts: [BP, N, 3];
    out: [BP, D]."""
    pts = pts_ref[...]
    BP, N, _ = pts.shape

    sq = jnp.sum(pts * pts, axis=-1)
    cross = jax.lax.dot_general(
        pts, pts, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    d2 = jnp.maximum(sq[:, :, None] - 2.0 * cross + sq[:, None, :], 0.0)
    iota = jax.lax.broadcasted_iota(jnp.int32, (BP, N, N), 2)

    def load(ref):
        w = ref[...]
        return w.astype(compute_dtype) if compute_dtype is not None else w

    def dense(x, w, b, relu=True):
        if compute_dtype is not None:
            x = x.astype(compute_dtype)
        h = jnp.dot(x, w, preferred_element_type=jnp.float32)
        h = h + b.astype(jnp.float32)
        if relu:
            h = jax.nn.relu(h)
        return h.astype(compute_dtype) if compute_dtype is not None else h

    sa_w = [load(r) for r in (sw1, sw2, sw3)]
    sa_b = [load(r) for r in (sb1, sb2, sb3)]
    F3 = sa_w[2].shape[-1]

    def body(_, carry):
        d2, acc = carry
        idx = jnp.argmin(d2, axis=-1)
        onehot = (iota == idx[:, :, None]).astype(jnp.float32)
        nb = jax.lax.dot_general(
            onehot, pts, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        d2 = d2 + onehot * 1e10
        h = (nb - pts).reshape(BP * N, 3)
        for w, b in zip(sa_w, sa_b):
            h = dense(h, w, b)
        return d2, jnp.maximum(acc, h.astype(jnp.float32))

    acc0 = jnp.full((BP * N, F3), -jnp.inf, jnp.float32)
    _, feats = jax.lax.fori_loop(0, knn, body, (d2, acc0))

    # concat(xyz, SA feats) then the PointNet trunk (AE.py:34-41 stack);
    # the SA max ran in f32 over compute-dtype values, so feats == the XLA
    # path's activations exactly
    x = jnp.concatenate([pts.reshape(BP * N, 3), feats], axis=-1)
    x = dense(x, load(pw1), load(pb1))
    x = dense(x, load(pw2), load(pb2))
    x = dense(x, load(pw3), load(pb3))
    x = dense(x, load(pw4), load(pb4), relu=False)       # final layer: no relu
    D = x.shape[-1]
    out_ref[...] = jnp.max(
        x.astype(jnp.float32).reshape(BP, N, D), axis=1)


def patch_encoder_fused(patches: jnp.ndarray, sa_wb, pn_wb, *, knn: int = 16,
                        compute_dtype=None, block_p: int = 8,
                        interpret: bool = False) -> jnp.ndarray:
    # NOTE: Mosaic requires the output block's second-to-last dim divisible
    # by 8 — keep block_p a multiple of 8 on TPU (the [block_p, D] block).
    """Fused IPDAE patch encoder: [P, N, 3] -> pre-spread latent [P, D].

    One kernel for SetAbstraction + concat + PointNetFeat + global max, so
    HBM sees 12.6 MB in and 0.26 MB out per 8k-patch batch instead of the
    XLA path's multi-GB grouped/pointwise intermediates. sa_wb/pn_wb are
    (kernel, bias) lists from PointwiseMLP's probe mode. The sigmoid
    spread stays outside (exact f32, models/ipdae.py:56-63)."""
    P, N, _ = patches.shape
    D = pn_wb[-1][0].shape[-1]

    pad = (-P) % block_p
    if pad:
        patches = jnp.concatenate(
            [patches, jnp.zeros((pad, N, 3), patches.dtype)], axis=0)
    Pp = P + pad

    full = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim)
    args = []
    specs = [pl.BlockSpec((block_p, N, 3), lambda i: (i, 0, 0))]
    for w, b in list(sa_wb) + list(pn_wb):
        args += [w, b]
        specs += [full(w), full(b)]
    out = pl.pallas_call(
        functools.partial(_encoder_kernel, knn=knn,
                          compute_dtype=compute_dtype),
        grid=(Pp // block_p,),
        in_specs=specs,
        out_specs=pl.BlockSpec((block_p, D), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((Pp, D), jnp.float32),
        interpret=interpret,
    )(patches.astype(jnp.float32), *args)
    return out[:P]
