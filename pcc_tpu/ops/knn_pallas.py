"""Pallas TPU kernel for exact K-nearest-neighbor patch selection.

Replaces `lax.top_k` (K=256 of N=8192 per skeleton row) in the encode
path — the codec's largest remaining device cost (~35 ms of a ~120 ms
encode program per 128-cloud batch, plus ~15 ms for the row gather; see
CLAUDE.md perf map). XLA's top_k is sort-based; this kernel exploits the
fact that the codec only needs the K-nearest *set* (patches feed
permutation-invariant set networks), not a distance-sorted list:

  1. distances: d2 = q2 - 2*(rec @ pc^T) + p2, bit-identical to
     ops/knn.py::sq_dists (so the selected set equals top_k's exactly on
     matching backends) — one tiny MXU matmul, [S, N] resident in VMEM.
  2. threshold: the K-th smallest distance per row via a 31-step radix
     binary search on the f32 bit pattern (nonnegative floats compare
     like their int32 bits). Each step is one [S, N] compare+reduce in
     VMEM — ~31 * S*N lane ops, microseconds.
  3. tie break: a second ceil(log2(N))-step search over the *index* of
     boundary ties picks the lowest-index ties, exactly top_k's stable
     tie contract. The selection mask then has exactly K ones per row.
  4. compaction: selected positions in index order, no scatter and no
     [N, K] one-hot in HBM (the documented dead ends): an exact
     triangular-matmul prefix sum over 128-lane chunks gives each
     element its selection rank, then idx[s, r] = #{j : cumsum[s, j] <=
     r} — a chunked compare+reduce (rank-counting instead of
     scatter/sort).
  5. gather: grouped coords via per-chunk one-hot f32 matmuls on the MXU
     (a one-hot row times f32 values is exact: each output is one value
     plus zeros), skipping XLA's slow strided row-gather.

All arithmetic is exact (integer-valued f32 accumulators < 2^24, one-hot
matmuls), so the kernel is deterministic and its output depends only on
the d2 bits. Output patches are in ascending-index order rather than
top_k's ascending-distance order; every consumer (SetAbstraction → max,
PointNet → max) is order-invariant, so codec streams are unchanged
unless two patch-internal distances tie exactly (measure-zero for real
clouds).

Reference hot spot replaced: pytorch3d knn_points (pn_kit.py:190,
compress.py:112-122).

STATUS — experimental, default OFF (cfg.fused_knn). Parity is pinned under
the Pallas interpreter (tests/test_knn_pallas.py), but on real v5e the
radix threshold search alone (stages 1-3) measured ~250 ms per 128-cloud
batch — ~5x the whole lax.top_k+gather block it was built to replace: the
31 sequential [S, N] compare+reduce passes run at only ~30 Gops/s on the
VPU (cross-lane reductions serialize against the fori_loop). The value of
this file is the selection/compaction machinery (exact threshold search,
rank-counting compaction, one-hot gather) for problems with small N per
query; for the codec's 256-of-8192 the XLA path stays the production one
(see CLAUDE.md perf map for the full dead-end ledger).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _knn_select_kernel(rec_ref, pct_ref, grouped_ref, idx_ref, *,
                       K: int, n_valid: int):
    """rec_ref [1, S, 3] f32; pct_ref [1, 3, N] f32 (N % 128 == 0, lanes
    beyond n_valid are padding); grouped_ref [1, S, K, 3] f32;
    idx_ref [1, S, K] i32."""
    rec = rec_ref[0]                                   # [S, 3]
    pct = pct_ref[0]                                   # [3, N]
    S = rec.shape[0]
    N = pct.shape[1]
    nchunks = N // 128

    # -- 1. distances, bit-identical to ops/knn.py::sq_dists ---------------
    q2 = jnp.sum(rec * rec, axis=1, keepdims=True)     # [S, 1]
    p2 = jnp.sum(pct * pct, axis=0, keepdims=True)     # [1, N]
    cross = jax.lax.dot_general(
        rec, pct, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)            # [S, N]
    d2 = jnp.maximum(q2 - 2.0 * cross + p2, 0.0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (S, N), 1)
    if n_valid < N:
        d2 = jnp.where(lane < n_valid, d2, jnp.inf)
    d2i = jax.lax.bitcast_convert_type(d2, jnp.int32)  # >= 0: int order

    # -- 2. K-th smallest value per row (radix search on bits 30..0) ------
    def vbody(t, v):
        cand = v | jax.lax.shift_left(1, 30 - t)
        cnt = jnp.sum((d2i < cand).astype(jnp.int32), axis=1, keepdims=True)
        return jnp.where(cnt < K, cand, v)

    x = jax.lax.fori_loop(0, 31, vbody, jnp.zeros((S, 1), jnp.int32))

    # -- 3. boundary ties: keep the `need` lowest indices ------------------
    lt = d2i < x
    cnt_lt = jnp.sum(lt.astype(jnp.int32), axis=1, keepdims=True)
    need = K - cnt_lt                                  # >= 1 per row
    eq = d2i == x
    nbits = max(1, int(np.ceil(np.log2(N))))

    def jbody(t, y):
        cand = y | jax.lax.shift_left(1, nbits - 1 - t)
        cnt = jnp.sum((eq & (lane < cand)).astype(jnp.int32), axis=1,
                      keepdims=True)
        return jnp.where(cnt < need, cand, y)

    y = jax.lax.fori_loop(0, nbits, jbody, jnp.zeros((S, 1), jnp.int32))
    mask = lt | (eq & (lane <= y))                     # exactly K per row

    # -- 4. inclusive prefix sum via exact triangular matmuls --------------
    # (integer-valued f32: chunk sums <= 128, row totals <= N < 2^24)
    maskf = mask.astype(jnp.float32).reshape(S, nchunks, 128)
    i128 = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    j128 = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    tri_incl = (i128 <= j128).astype(jnp.float32)
    incl = jax.lax.dot_general(
        maskf, tri_incl, dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)            # [S, nc, 128]
    # last lane of each chunk via static slice+reshape (integer indexing
    # lowers through gather/dynamic_slice, which Mosaic TC lacks)
    csum = jnp.squeeze(
        jax.lax.slice_in_dim(incl, 127, 128, axis=2), axis=2)   # [S, nc]
    ic = jax.lax.broadcasted_iota(jnp.int32, (nchunks, nchunks), 0)
    jc = jax.lax.broadcasted_iota(jnp.int32, (nchunks, nchunks), 1)
    tri_excl = (ic < jc).astype(jnp.float32)
    offs = jax.lax.dot_general(
        csum, tri_excl, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)            # [S, nc]
    cumsum = incl + offs[:, :, None]                   # [S, nc, 128]

    # -- 5. compaction by rank-counting: idx[s,r] = #{j: cumsum_j <= r} ----
    # (python-unrolled chunk loops: Mosaic TC has no dynamic_slice, and
    # static slices let the compiler schedule each chunk independently)
    rf = jax.lax.broadcasted_iota(jnp.int32, (S, 1, K), 2).astype(
        jnp.float32)                                   # [S, 1, K]
    idxf = jnp.zeros((S, K), jnp.float32)
    for c in range(nchunks):
        cs = jnp.squeeze(                              # [S, 128] (static
            jax.lax.slice_in_dim(cumsum, c, c + 1, axis=1), axis=1)
        le = cs[:, :, None] <= rf                      # [S, 128, K]
        idxf = idxf + jnp.sum(le.astype(jnp.float32), axis=1)
    idx = idxf.astype(jnp.int32)                       # [S, K], index order

    # -- 6. gather selected coords via per-chunk one-hot matmuls -----------
    lane128 = jax.lax.broadcasted_iota(jnp.int32, (S, K, 128), 2)
    grouped = jnp.zeros((S, K, 3), jnp.float32)
    for c in range(nchunks):
        onehot = (idx[:, :, None] - c * 128 == lane128).astype(jnp.float32)
        grouped = grouped + jax.lax.dot_general(
            onehot, pct[:, c * 128:(c + 1) * 128],
            dimension_numbers=(((2,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)        # [S, K, 3]
    grouped_ref[0] = grouped
    idx_ref[0] = idx


def knn_select_pallas(query: jnp.ndarray, points: jnp.ndarray, K: int,
                      interpret: bool = False):
    """Exact KNN patch selection: [B, S, 3] queries over [B, N, 3] points
    -> (grouped [B, S, K, 3] f32, idx [B, S, K] i32), the K nearest per
    query in ascending-INDEX order (set-identical to
    ops/knn.py::knn_points under matching d2 bits; see module docstring).

    Requires K <= N. N is padded to a multiple of 128 internally."""
    B, S, _ = query.shape
    N = points.shape[1]
    assert K <= N, f"K={K} > N={N}: use ops/knn.py::knn_points"
    pad = (-N) % 128
    pct = jnp.transpose(points, (0, 2, 1)).astype(jnp.float32)  # [B, 3, N]
    if pad:
        pct = jnp.concatenate(
            [pct, jnp.zeros((B, 3, pad), jnp.float32)], axis=2)
    Np = N + pad
    grouped, idx = pl.pallas_call(
        functools.partial(_knn_select_kernel, K=K, n_valid=N),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, S, 3), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, 3, Np), lambda b: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, S, K, 3), lambda b: (b, 0, 0, 0)),
            pl.BlockSpec((1, S, K), lambda b: (b, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, S, K, 3), jnp.float32),
            jax.ShapeDtypeStruct((B, S, K), jnp.int32),
        ],
        # d2/cumsum [S, N] f32 + chunk temporaries: ~8 MB at the default
        # config; headroom for larger N
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 2**20),
        interpret=interpret,
    )(query.astype(jnp.float32), pct)
    return grouped, idx


def knn_select_ref(query: np.ndarray, points: np.ndarray, K: int):
    """Numpy spec of the kernel's selection semantics, for parity tests:
    K smallest by (d2 bits, index), emitted in ascending-index order."""
    from pcc_tpu.ops.knn import sq_dists

    d2 = np.asarray(sq_dists(jnp.asarray(query), jnp.asarray(points)))
    d2i = d2.view(np.int32)
    B, S, N = d2i.shape
    idx = np.empty((B, S, K), np.int32)
    for b in range(B):
        for s in range(S):
            order = np.lexsort((np.arange(N), d2i[b, s]))[:K]
            idx[b, s] = np.sort(order)
    grouped = np.take_along_axis(points[:, None], idx[..., None], axis=2)
    return grouped.astype(np.float32), idx
