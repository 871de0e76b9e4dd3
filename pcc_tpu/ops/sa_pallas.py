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


def _argmin_lanes(d2, iota, N):
    """argmin over the lane (last) axis as min + where + min.

    Mosaic's native argmin lowering over the 128-lane axis measured ~11 ms
    per [8, 256, 256] call on v5e — swapping it for this two-min
    composition took the whole encoder kernel from 217 to 68 ms per
    8192-patch batch, bit-identical output (the tie order is the same:
    lowest index among equal minima, matching lax.top_k / ops/knn.py).
    """
    m = jnp.min(d2, axis=-1, keepdims=True)
    return jnp.min(jnp.where(d2 == m, iota, N), axis=-1)


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

    # broadcastable [1, 1, N] row, not a materialized [BP, N, N] cube — the
    # onehot compare broadcasts it, saving ~BP*N*N*4 bytes of VMEM (the
    # same layout the backward kernel uses)
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, N), 2)

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

    # statically unrolled slot loop (knn is a python int): together with
    # the composition argmin this is the measured-fast form (see
    # _argmin_lanes; validated bit-identical to the fori_loop+argmin
    # original on v5e)
    acc = jnp.full((BP * N, F3), -jnp.inf, jnp.float32)
    for _ in range(knn):
        idx = _argmin_lanes(d2, iota, N)                 # [BP, N]
        onehot = (iota == idx[:, :, None]).astype(jnp.float32)
        nb = jax.lax.dot_general(
            onehot, pts, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)          # [BP, N, 3]
        d2 = jnp.where(onehot != 0.0, jnp.inf, d2)       # exclude from next pick
        h = mlp((nb - pts).reshape(BP * N, 3))           # [BP*N, F3]
        acc = jnp.maximum(acc, h.astype(jnp.float32))
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
                    out_ref, *, knn: int, compute_dtype, slot_group: int = 1):
    """Whole patch-encoder: SA (KNN+MLP+max) -> concat xyz -> PointNet
    (pointwise MLP, relu T,T,T,F) -> max over points. pts: [BP, N, 3];
    out: [BP, D].

    slot_group > 1 batches that many KNN slots' gathers + SA MLP into one
    matmul set ([BP, g*N, N] stacked one-hot, MLP on BP*g*N rows): same
    math row-for-row (matmul rows are independent; max is associative), so
    output stays bit-identical, but the MXU sees 1/g as many dispatches."""
    pts = pts_ref[...]
    BP, N, _ = pts.shape

    sq = jnp.sum(pts * pts, axis=-1)
    cross = jax.lax.dot_general(
        pts, pts, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    d2 = jnp.maximum(sq[:, :, None] - 2.0 * cross + sq[:, None, :], 0.0)
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, N), 2)

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

    # unrolled slot loop + composition argmin: 217 -> 68 ms per
    # 8192-patch batch on v5e, bit-identical (see _argmin_lanes)
    g = slot_group
    feats = jnp.full((BP * N, F3), -jnp.inf, jnp.float32)
    for _ in range(knn // g):
        # selection stays sequential (each pick masks the next), but the
        # g gathers and the SA MLP batch into one matmul set per group
        ohs = []
        for _ in range(g):
            idx = _argmin_lanes(d2, iota, N)
            oh = (iota == idx[:, :, None]).astype(jnp.float32)
            d2 = jnp.where(oh != 0.0, jnp.inf, d2)
            ohs.append(oh)
        oh_g = ohs[0] if g == 1 else jnp.concatenate(ohs, axis=1)
        nb = jax.lax.dot_general(
            oh_g, pts, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)           # [BP, g*N, 3]
        h = (nb.reshape(BP, g, N, 3) - pts[:, None]).reshape(BP * g * N, 3)
        for w, b in zip(sa_w, sa_b):
            h = dense(h, w, b)
        hg = h.astype(jnp.float32).reshape(BP, g, N, F3)
        feats = jnp.maximum(feats, jnp.max(hg, axis=1).reshape(BP * N, F3))

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
                        slot_group: int | None = None,
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
    if slot_group is None:
        # v5e sweep at P=8192, N=256, knn=16 (bf16): g=4 is the sweet spot
        # (48.9 ms vs 56.7 at g=1); g=8/16 regress on VMEM pressure
        slot_group = 4 if knn % 4 == 0 else (2 if knn % 2 == 0 else 1)
    if knn % slot_group:
        raise ValueError(f"slot_group {slot_group} must divide knn {knn}")

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
                          compute_dtype=compute_dtype,
                          slot_group=slot_group),
        grid=(Pp // block_p,),
        in_specs=specs,
        out_specs=pl.BlockSpec((block_p, D), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((Pp, D), jnp.float32),
        # v5e has 128 MB VMEM/core; the default 16 MB scoped limit caps
        # block_p at 8 — raise it so larger blocks (fewer grid steps) fit
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(patches.astype(jnp.float32), *args)
    return out[:P]


# ---------------------------------------------------------------------------
# Backward kernel + custom VJP: the training path (VERDICT r2 item 2).
#
# The XLA encoder's backward materializes every grouped-neighbor activation
# [P, N, knn, C] as a stored residual — the same multi-GB HBM traffic the
# forward kernel exists to avoid, paid twice (store + reload). This kernel
# recomputes the whole encoder forward from scratch inside VMEM (the
# rematerialization trade the fused design makes cheap: FLOPs are free
# relative to HBM here) and backpropagates through it, emitting the patch
# gradient blockwise and accumulating weight/bias gradients across the
# sequential TPU grid.
#
# Gradient semantics match the XLA path (reference train.py autograd over
# pn_kit.py:146-211 + 98-144): KNN selection indices carry no gradient
# (integer argmin), neighbor gathers transpose to scatter-adds (the
# onehot^T matmul), relu masks are (z > 0), and max-pool routing goes to
# the argmin/argmax winner — ties between distinct positive activations
# are measure-zero, and all-dead relu ties die in the relu mask either way
# (pinned by tests/test_sa_pallas.py gradient-parity tests, atol 1e-4).
# ---------------------------------------------------------------------------


def _encoder_bwd_kernel(pts_ref, g_ref, sw1, sb1, sw2, sb2, sw3, sb3,
                        pw1, pb1, pw2, pb2, pw3, pb3, pw4, pb4,
                        dpts_ref, dsw1_r, dsb1_r, dsw2_r, dsb2_r,
                        dsw3_r, dsb3_r, dpw1_r, dpb1_r, dpw2_r, dpb2_r,
                        dpw3_r, dpb3_r, dpw4_r, dpb4_r,
                        *, knn: int, compute_dtype, slot_group: int = 1):
    """Recompute-and-backprop for one patch block. pts: [BP, N, 3];
    g: [1, BP, D] cotangent (leading singleton: the [BP, D] block would
    violate Mosaic's (8, 128) divisibility rule for BP < 8, while a
    [1, BP, D] block of a [Pp/BP, BP, D] array has both trailing dims
    equal to the array's — always legal). Weight-grad outputs accumulate
    across the grid (their block index is constant; TPU grid steps are
    sequential)."""
    pts = pts_ref[...]
    g = g_ref[0].astype(jnp.float32)
    BP, N, _ = pts.shape

    def cast(x):
        return x.astype(compute_dtype) if compute_dtype is not None else x

    def dense_fwd(x, w, b, relu=True):
        h = jnp.dot(cast(x), cast(w), preferred_element_type=jnp.float32)
        h = h + b.astype(jnp.float32)
        if relu:
            h = jax.nn.relu(h)
        return cast(h)

    def matmul(a, b):
        return jnp.dot(cast(a), cast(b), preferred_element_type=jnp.float32)

    sa_w = [sw1[...], sw2[...], sw3[...]]
    sa_b = [sb1[...], sb2[...], sb3[...]]
    pn_w = [pw1[...], pw2[...], pw3[...], pw4[...]]
    pn_b = [pb1[...], pb2[...], pb3[...], pb4[...]]
    F3 = sa_w[2].shape[-1]

    # ---- recompute the forward: KNN selection + SA max (winner slots) ----
    # VMEM discipline (the 16 MB/core budget binds at block 8): the iota is
    # a broadcastable [1, 1, N] row instead of a materialized [BP, N, N]
    # cube; the distance matrix is computed once and only the per-slot
    # winner indices survive it (the backward loop reuses those).
    def fresh_d2():
        sq = jnp.sum(pts * pts, axis=-1)
        cross = jax.lax.dot_general(
            pts, pts, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        return jnp.maximum(sq[:, :, None] - 2.0 * cross + sq[:, None, :], 0.0)

    iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, N), 2)

    # statically unrolled selection (knn is a python int), storing each
    # slot's winner indices AND its SA activations (inp f32 + a1/a2 in the
    # compute dtype): the SA backward loop below then does NO forward
    # recomputation at all — no second distance matrix, no argmin
    # re-derivation, no gather matmul, no dense replay. (A dynamic
    # slot-major STORE would need the dynamic_update_slice Mosaic lacks,
    # but a static python-list append compiles fine — the stored arrays
    # lane-pad to 128, hence the raised vmem_limit in _encoder_bwd_flat.)
    # Slots process in groups of `sg` (as in _encoder_kernel): the g
    # gathers + SA MLP batch into one matmul set; best/feats routing uses
    # first-wins-within-group, which matches the sequential update exactly
    # (the sequential winner is the first index achieving the group max).
    sg = slot_group
    feats = jnp.full((BP * N, F3), -jnp.inf, jnp.float32)
    best = jnp.zeros((BP * N, F3), jnp.int32)
    idx_slots, grp_acts = [], []
    d2 = fresh_d2()
    for g0 in range(0, knn, sg):
        ohs = []
        for _ in range(sg):
            idx = _argmin_lanes(d2, iota, N)             # [BP, N]
            idx_slots.append(idx)
            oh = (iota == idx[:, :, None]).astype(jnp.float32)
            d2 = jnp.where(oh != 0.0, jnp.inf, d2)
            ohs.append(oh)
        oh_g = ohs[0] if sg == 1 else jnp.concatenate(ohs, axis=1)
        nb = jax.lax.dot_general(
            oh_g, pts, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)          # [BP, sg*N, 3]
        inp = (nb.reshape(BP, sg, N, 3) - pts[:, None]).reshape(
            BP * sg * N, 3)
        a1 = dense_fwd(inp, sa_w[0], sa_b[0])
        a2 = dense_fwd(a1, sa_w[1], sa_b[1])
        h = dense_fwd(a2, sa_w[2], sa_b[2]).astype(jnp.float32)
        grp_acts.append((inp, a1, a2))
        hg = h.reshape(BP, sg, N, F3)
        gm = jnp.max(hg, axis=1).reshape(BP * N, F3)     # group max
        slot_io = jax.lax.broadcasted_iota(jnp.int32, (1, sg, 1, 1), 1)
        gi = jnp.min(jnp.where(hg == gm.reshape(BP, 1, N, F3),
                               slot_io, sg), axis=1).reshape(BP * N, F3)
        best = jnp.where(gm > feats, g0 + gi, best)
        feats = jnp.maximum(feats, gm)

    # ---- PointNet forward with stored activations ----
    x0 = jnp.concatenate(
        [pts.reshape(BP * N, 3), cast(feats)], axis=-1)
    x1 = dense_fwd(x0, pn_w[0], pn_b[0])
    x2 = dense_fwd(x1, pn_w[1], pn_b[1])
    x3 = dense_fwd(x2, pn_w[2], pn_b[2])
    z4 = dense_fwd(x3, pn_w[3], pn_b[3], relu=False)
    D = z4.shape[-1]
    z4f = z4.astype(jnp.float32).reshape(BP, N, D)

    # ---- backward: global max over points (argmax winner routing) ----
    win = jnp.argmax(z4f, axis=1)                        # [BP, D]
    iota_n = jax.lax.broadcasted_iota(jnp.int32, (BP, N, D), 1)
    dz4 = jnp.where(iota_n == win[:, None, :], g[:, None, :], 0.0)
    dz4 = dz4.reshape(BP * N, D)

    def dense_bwd(dz, x_in, w, dw_ref, db_ref, relu_in):
        """Given dL/dz of layer (z = x_in @ w + b), accumulate dw/db and
        return dL/dx_in masked by the input layer's relu if requested."""
        dw_ref[...] += jax.lax.dot_general(
            x_in.astype(jnp.float32), dz, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        db_ref[...] += jnp.sum(dz, axis=0)
        dx = jnp.dot(cast(dz), cast(w).T, preferred_element_type=jnp.float32)
        if relu_in is not None:
            dx = dx * (relu_in.astype(jnp.float32) > 0.0)
        return dx

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _zero_grads():
        for r in (dsw1_r, dsb1_r, dsw2_r, dsb2_r, dsw3_r, dsb3_r,
                  dpw1_r, dpb1_r, dpw2_r, dpb2_r, dpw3_r, dpb3_r,
                  dpw4_r, dpb4_r):
            r[...] = jnp.zeros(r.shape, r.dtype)

    dz3 = dense_bwd(dz4, x3, pn_w[3], dpw4_r, dpb4_r, x3)
    dz2 = dense_bwd(dz3, x2, pn_w[2], dpw3_r, dpb3_r, x2)
    dz1 = dense_bwd(dz2, x1, pn_w[1], dpw2_r, dpb2_r, x1)
    dx0 = dense_bwd(dz1, x0, pn_w[0], dpw1_r, dpb1_r, None)

    dpts = dx0[:, :3].reshape(BP, N, 3)
    dfeats = dx0[:, 3:]                                  # [BP*N, F3]

    # ---- SA backward per slot group: rebuild the group's stacked one-hot
    # from the stored selection indices and backprop through its STORED
    # activations as one matmul set. The layer-3 relu mask needs no
    # recomputed h: at the positions where best == s the max equals that
    # slot's h elementwise (feats == h_s there), so dh * (h > 0) ==
    # where(best==s & feats>0, dfeats, 0) bitwise — the winner's pre-mask
    # value IS the pooled max, and losing positions have dh == 0
    # regardless of their mask ----
    bestr = best.reshape(BP, 1, N, F3)
    live = (feats > 0.0).reshape(BP, 1, N, F3)
    dfeatsr = dfeats.reshape(BP, 1, N, F3)
    for gidx, g0 in enumerate(range(0, knn, sg)):
        ohs = [(iota == idx_slots[g0 + j][:, :, None]).astype(jnp.float32)
               for j in range(sg)]
        oh_g = ohs[0] if sg == 1 else jnp.concatenate(ohs, axis=1)
        inp, a1, a2 = grp_acts[gidx]                     # [BP*sg*N, ch]
        slot_io = jax.lax.broadcasted_iota(
            jnp.int32, (1, sg, 1, 1), 1) + g0
        dz3g = jnp.where((bestr == slot_io) & live, dfeatsr,
                         0.0).reshape(BP * sg * N, F3)
        dsw3_r[...] += jax.lax.dot_general(
            a2.astype(jnp.float32), dz3g, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dsb3_r[...] += jnp.sum(dz3g, axis=0)
        da2 = matmul(dz3g, sa_w[2].T) * (a2.astype(jnp.float32) > 0.0)
        dsw2_r[...] += jax.lax.dot_general(
            a1.astype(jnp.float32), da2, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dsb2_r[...] += jnp.sum(da2, axis=0)
        da1 = matmul(da2, sa_w[1].T) * (a1.astype(jnp.float32) > 0.0)
        dsw1_r[...] += jax.lax.dot_general(
            inp.astype(jnp.float32), da1, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dsb1_r[...] += jnp.sum(da1, axis=0)
        dinp = matmul(da1, sa_w[0].T).reshape(BP, sg * N, 3)  # d(nb - pts)
        # nb gather transposes to a scatter-add:
        # d_pts[j] += sum_{s,i} 1[idx_{s,i}=j] dinp_{s,i}
        dscat = jax.lax.dot_general(
            oh_g, dinp, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        dpts = dpts + dscat - jnp.sum(
            dinp.reshape(BP, sg, N, 3), axis=1)
    dpts_ref[...] = dpts


def _encoder_fwd_flat(patches, sa_wb, pn_wb, *, knn, compute_dtype,
                      block_p, interpret):
    return patch_encoder_fused(patches, sa_wb, pn_wb, knn=knn,
                               compute_dtype=compute_dtype, block_p=block_p,
                               interpret=interpret)


def _encoder_bwd_flat(patches, g, sa_wb, pn_wb, *, knn, compute_dtype,
                      block_p, interpret, slot_group=None):
    """Run the backward kernel over the flat patch batch. Returns
    (dpatches, dsa_wb, dpn_wb)."""
    if slot_group is None:
        slot_group = 4 if knn % 4 == 0 else (2 if knn % 2 == 0 else 1)
    P, N, _ = patches.shape
    pad = (-P) % block_p
    if pad:
        # zero cotangent on padded rows -> zero weight-grad contribution
        patches = jnp.concatenate(
            [patches, jnp.zeros((pad, N, 3), patches.dtype)], axis=0)
        g = jnp.concatenate([g, jnp.zeros((pad, g.shape[1]), g.dtype)], axis=0)
    Pp = P + pad
    D = g.shape[-1]

    full = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim)
    acc_spec = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim)
    args, specs = [], []
    for w, b in list(sa_wb) + list(pn_wb):
        args += [w, b]
        specs += [full(w), full(b)]

    grad_shapes = [jax.ShapeDtypeStruct(a.shape, jnp.float32) for a in args]
    # cotangent rides as [grid, block_p, D]: see _encoder_bwd_kernel
    g3 = g.astype(jnp.float32).reshape(Pp // block_p, block_p, D)
    out = pl.pallas_call(
        functools.partial(_encoder_bwd_kernel, knn=knn,
                          compute_dtype=compute_dtype,
                          slot_group=slot_group),
        grid=(Pp // block_p,),
        in_specs=[
            pl.BlockSpec((block_p, N, 3), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, block_p, D), lambda i: (i, 0, 0)),
            *specs,
        ],
        out_specs=[pl.BlockSpec((block_p, N, 3), lambda i: (i, 0, 0))]
        + [acc_spec(a) for a in args],
        out_shape=[jax.ShapeDtypeStruct((Pp, N, 3), jnp.float32)]
        + grad_shapes,
        # the stored-activation backward keeps all knn slots' inp/a1/a2
        # resident (Mosaic lane-pads the narrow per-slot arrays to 128, so
        # the allocator sees ~49 MB at block 4); v5e has 128 MB VMEM per
        # core — raise the scoped limit past the 16 MB default
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(patches.astype(jnp.float32), g3, *args)
    dpatches, grads = out[0][:P], out[1:]
    dsa_wb = tuple((grads[2 * i], grads[2 * i + 1]) for i in range(3))
    dpn_wb = tuple((grads[6 + 2 * i], grads[6 + 2 * i + 1]) for i in range(4))
    return dpatches, dsa_wb, dpn_wb


@functools.lru_cache(maxsize=None)
def _make_trainable_encoder(knn, compute_dtype, block_p, block_p_bwd,
                            interpret):
    """custom_vjp wrapper: fused Pallas forward + fused Pallas backward, so
    training runs the same kernel inference does (VERDICT r2 item 2).
    block_p_bwd stays smaller than block_p: the backward's working set
    (recomputed activations + gradient chains) hits the 16 MB VMEM budget
    at 8; the cotangent's [1, block_p, D] layout keeps a block of 4 legal
    under Mosaic's divisibility rules (see _encoder_bwd_kernel)."""

    @jax.custom_vjp
    def enc(patches, sa_wb, pn_wb):
        return _encoder_fwd_flat(patches, sa_wb, pn_wb, knn=knn,
                                 compute_dtype=compute_dtype,
                                 block_p=block_p, interpret=interpret)

    def enc_fwd(patches, sa_wb, pn_wb):
        out = enc(patches, sa_wb, pn_wb)
        return out, (patches, sa_wb, pn_wb)

    def enc_bwd(res, g):
        patches, sa_wb, pn_wb = res
        dpatches, dsa_wb, dpn_wb = _encoder_bwd_flat(
            patches, g, sa_wb, pn_wb, knn=knn, compute_dtype=compute_dtype,
            block_p=block_p_bwd, interpret=interpret)
        return dpatches, dsa_wb, dpn_wb

    enc.defvjp(enc_fwd, enc_bwd)
    return enc


def patch_encoder_trainable(patches, sa_wb, pn_wb, *, knn: int = 16,
                            compute_dtype=None, block_p: int = 8,
                            block_p_bwd: int = 4, interpret: bool = False):
    """Differentiable fused patch encoder: forward = patch_encoder_fused,
    backward = _encoder_bwd_kernel. Drop-in for the training path (the
    inference primal is identical to patch_encoder_fused)."""
    enc = _make_trainable_encoder(knn, compute_dtype, block_p, block_p_bwd,
                                  interpret)
    # custom_vjp over pytree args: tuples keep the (kernel, bias) structure
    return enc(patches, tuple(map(tuple, sa_wb)), tuple(map(tuple, pn_wb)))
