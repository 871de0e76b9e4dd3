"""Morton-chunk-pruned EXACT K-nearest-neighbor patch selection (XLA-only).

Replaces the encode program's dense `lax.top_k([B,S,N]) + row-gather`
block — the codec's largest device cost (~53 ms of a ~120 ms encode
program per 128-cloud batch on v5e; CLAUDE.md perf map) — with a
bounding-volume pruned selection that returns the exact K nearest under
the program's own expanded-form d2 bits, in knn_points' ascending-
(d2, index) order with its lower-index-first tie rule, on every input —
via a per-row exactness certificate and a fixed-size exact top-up pass.

PRECISION CONTRACT: selection uses the same expanded-form distance
(q2 - 2*q.p + p2, ops/knn.py::sq_dists) that knn_points feeds top_k, and
that form loses ~1e-3 relative precision to cancellation at patch-radius
distances. XLA fuses it differently in different programs, so two
COMPILATIONS of either path can swap near-tied boundary neighbors — this
module agrees with knn_points exactly as well as knn_points agrees with
its own recompilations. In float64 the noise vanishes and the paths are
bit-identical (pinned in tests/test_knn_pruned.py); in float32 a swap is
order-only almost always (patch consumers are max-pooled set networks,
so streams do not change), and when a set does differ at the K-boundary
the alternative is an equally-near neighbor: decodability and RD quality
are unaffected (decompression never re-runs selection). The certificate
carries a 4e-6*(1+d_K) noise margin so that formula disagreements
between the box lower bound and d2 at box corners can never fake a pass
— doubting rows just take the exact top-up.

Why this shape: the measured dead ends (CLAUDE.md) say selection over the
full [S, N] cannot be beaten on this hardware — top_k ~37 ms, any full-N
sort >= 45 ms, Pallas radix select ~250 ms — so the win must cut the
candidate count per query. A single contiguous Morton-rank window cannot
do that exactly (a query near a top-level octant plane has true neighbors
~N/2 ranks away), but per-query unions of Morton CHUNKS can:

  1. sort points by Morton code once per cloud, carrying (x, y, z,
     original index) as sort payloads — [B, N] rows, ~1 ms;
  2. cut the sorted order into C = N/64 contiguous chunks; each chunk is
     a compact cell of the space-filling curve. Per chunk, an axis-
     aligned bounding box ([C, 3] mins/maxes via one reshape+reduce);
  3. per query, the EXACT box lower-bound distance lb[s, c] and the M
     nearest chunks by lb (top_k over [B, S, C] — width C=128, trivial);
  4. gather only those M*64 candidates' distances/coords/indices (chunked
     slices, ~0.2 of the dense row-gather's bytes) and sort them by
     (d2, original index) with coords as payloads — the K-prefix IS the
     knn_points result, in knn_points order (top_k breaks distance ties
     by lower index; a two-key sort reproduces that exactly), and the
     payload carry makes the separate [B, S, K, 3] coordinate gather
     (~16 ms) disappear;
  5. certificate: the selection is provably exact for row s iff
     d_K < min(lb of the C-M excluded chunks) — the (M+1)-th smallest lb,
     already computed by the same top_k. No second distance pass.
  6. top-up: rows that fail the certificate (FPS picks outlier queries
     whose K-NN ball spans many chunks; measured ~1% of rows on
     Gaussian-mixture clouds at M=24, with a heavy per-cloud tail) are
     re-solved EXACTLY: a top_k over the failure flags compacts up to F
     failed rows, those rows get a full-width (d2, index, coords) sort,
     and the results scatter back. F=512 rows costs ~4 ms and runs
     unconditionally (static shapes); rows compacted as padding (when
     fewer than F fail) recompute to bit-identical values, so the
     scatter is a no-op for them.
  7. only if MORE than F rows fail does a whole-batch lax.cond fall back
     to a full-width sort — a correctness backstop, never the fast path.

Everything is jit/GSPMD-friendly XLA (sorts, top_k, reshapes, chunked
gathers); no Pallas, no data-dependent shapes.

Replaces the pytorch3d knn_points hot spot of the reference
(pn_kit.py:190, compress.py:112-122) with pruning neither XLA's top_k nor
the reference's CUDA kernel performs (VERDICT r3 item 2).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pcc_tpu.coding.octree import morton_encode
from pcc_tpu.ops.knn import sq_dists

CHUNK = 64          # points per Morton chunk (C = ceil(N/CHUNK) boxes)
_BIG = 1e9          # padding coordinate: d2 ~ 1e18, finite in f32, never selected


def grouped_neighbors(query: jnp.ndarray, points: jnp.ndarray, K: int,
                      pruned: bool) -> jnp.ndarray:
    """Flag-dispatched patch-point selection shared by the codec encode
    program and the train steps: [B, S, 3] x [B, N, 3] -> [B, S, K, 3].

    Patch selection carries no gradient either way (patches are data-
    derived; autodiff tracks only the parameter path), so training can
    take the pruned route whenever the flag is on."""
    if pruned:
        grouped, _ = knn_grouped_pruned(query, points, K)
        return grouped
    from pcc_tpu.ops.knn import knn_points

    _, _, grouped = knn_points(query, points, K, return_nn=True)
    return grouped


def _candidate_chunks(lb: jnp.ndarray, M: int):
    """Top-M chunks by lower bound + min lb among the excluded chunks.

    lb: [B, S, C] -> (sel [B, S, M] int32, exc_min [B, S] f32). exc_min is
    the (M+1)-th smallest lb — the minimum over every non-selected chunk,
    valid under lb ties (top_k keeps M smallest; the (M+1)-th value is the
    best any excluded chunk can do)."""
    negv, sel = jax.lax.top_k(-lb, M + 1)
    return sel[..., :M].astype(jnp.int32), -negv[..., M]


def knn_grouped_pruned(query: jnp.ndarray, points: jnp.ndarray, K: int,
                       *, m_chunks: int = 24, topup_rows: int = 512):
    """Exact KNN patch selection: [B, S, 3] queries over [B, N, 3] points
    -> (grouped [B, S, K, 3], idx [B, S, K] int32), matching
    ops/knn.py::knn_points(query, points, K, return_nn=True)'s (nn, idx)
    — same coords, same ascending-(d2, index) order, same tie contract —
    up to XLA's cross-program fusion noise in the shared expanded-form
    d2 (see the module docstring's precision contract; bit-identical in
    float64, where that noise vanishes).

    Computes in the input dtype (min float32). Requires K <= N. Falls
    back to knn_points at trace time when the shape offers nothing to
    prune (see `usable`)."""
    B, S, _ = query.shape
    N = points.shape[1]
    C = -(-N // CHUNK)
    M = max(m_chunks, (2 * K) // CHUNK + 2)
    # pruning needs: something to exclude (C > M+1), candidates >= K even
    # if one chunk is padding, and a topup no larger than the row count
    usable = K <= N and C > M + 1 and (M - 1) * CHUNK >= K
    if not usable:
        from pcc_tpu.ops.knn import knn_points

        _, idx, nn = knn_points(query, points, K, return_nn=True)
        return nn, idx

    Np = C * CHUNK
    dt = jnp.promote_types(points.dtype, jnp.float32)
    pts = points.astype(dt)
    query = query.astype(dt)
    m = morton_encode(pts)                                    # [B, N] i32
    iota = jax.lax.broadcasted_iota(jnp.int32, (B, N), 1)
    if Np > N:
        pad = Np - N
        m = jnp.concatenate(
            [m, jnp.full((B, pad), jnp.iinfo(jnp.int32).max, jnp.int32)], 1)
        pts = jnp.concatenate([pts, jnp.full((B, pad, 3), _BIG, dt)], 1)
        iota = jnp.concatenate(
            [iota, jnp.full((B, pad), N, jnp.int32)], 1)

    # -- 1. one morton sort per cloud, coords + original index as payload --
    _, xs, ys, zs, isrt = jax.lax.sort(
        (m, pts[..., 0], pts[..., 1], pts[..., 2], iota),
        dimension=-1, num_keys=1, is_stable=True)

    # -- 2./3. chunk boxes and the M nearest chunks per query --------------
    cx = xs.reshape(B, C, CHUNK)
    cy = ys.reshape(B, C, CHUNK)
    cz = zs.reshape(B, C, CHUNK)
    lo = jnp.stack([cx.min(-1), cy.min(-1), cz.min(-1)], -1)  # [B, C, 3]
    hi = jnp.stack([cx.max(-1), cy.max(-1), cz.max(-1)], -1)
    gap = jnp.maximum(lo[:, None] - query[:, :, None], 0.0) \
        + jnp.maximum(query[:, :, None] - hi[:, None], 0.0)
    lb = jnp.sum(gap * gap, axis=-1)                          # [B, S, C]
    sel, exc_min = _candidate_chunks(lb, M)

    # -- 4. candidate distances/coords/indices + the exact two-key sort ----
    pts_s = jnp.stack([xs, ys, zs], axis=-1)                  # [B, Np, 3]
    d2 = sq_dists(query, pts_s)                               # [B, S, Np]
    dc = jax.vmap(jax.vmap(lambda a, s: a[s]))(
        d2.reshape(B, S, C, CHUNK), sel)                      # [B, S, M, CH]
    # four chunked payload gathers (coords + original index). A single
    # packed [B, C, CHUNK, 4] gather measured WORSE (29.7 vs 28.5 ms for
    # the whole block): the concatenate materialization costs more than
    # the merged gather saves.
    take_c = jax.vmap(lambda a, s: a[s])                      # [B,C,..][B,S,M]
    xc = take_c(cx, sel)
    yc = take_c(cy, sel)
    zc = take_c(cz, sel)
    ic = take_c(isrt.reshape(B, C, CHUNK), sel)
    W = M * CHUNK
    dsrt, iK, xK, yK, zK = jax.lax.sort(
        (dc.reshape(B, S, W), ic.reshape(B, S, W), xc.reshape(B, S, W),
         yc.reshape(B, S, W), zc.reshape(B, S, W)),
        dimension=-1, num_keys=2)
    grouped = jnp.stack([xK[..., :K], yK[..., :K], zK[..., :K]], -1)
    idx = iK[..., :K]
    d_K = dsrt[..., K - 1]

    # -- 5./6. certificate + fixed-size exact top-up -----------------------
    # The box lower bound and d2 use different float formulas: at a box
    # corner they agree in real math but can disagree by cancellation
    # noise in f32 (see the module docstring), so a row only passes with
    # a noise margin to spare; doubters take the exact top-up. f64 keeps
    # the margin (it is conservative there, never wrong).
    margin = jnp.asarray(4e-6, dt) * (1.0 + d_K)
    fail = ~(d_K + margin < exc_min)                          # [B, S]
    R = B * S
    # certificate failures measure ~1.2% of rows on Gaussian-mixture
    # clouds at M=24 (heavy per-cloud tail); R//8 is ~10x that mean.
    # Small batches (PPPF codec at 16 clouds, single-cloud encode) would
    # otherwise full-width-sort a large fraction of their rows for
    # nothing; the overflow backstop still guards the tail.
    F = min(topup_rows, max(R // 8, min(64, R)))
    nfail = jnp.sum(fail.astype(jnp.int32))

    def _topup(_):
        _, frow = jax.lax.top_k(fail.reshape(R).astype(jnp.float32), F)
        cloud = frow // S                                     # [F]
        d2r = d2.reshape(R, Np)[frow]                         # [F, Np]
        xr, yr, zr, ir = (a[cloud] for a in (xs, ys, zs, isrt))
        dF, iF, xF, yF, zF = jax.lax.sort(
            (d2r, ir, xr, yr, zr), dimension=-1, num_keys=2)
        g_fix = jnp.stack([xF[..., :K], yF[..., :K], zF[..., :K]], -1)
        return (grouped.reshape(R, K, 3).at[frow].set(g_fix)
                .reshape(B, S, K, 3),
                idx.reshape(R, K).at[frow].set(iF[..., :K])
                .reshape(B, S, K))

    # -- 7. whole-batch backstop when the top-up overflows ------------------
    def _full_exact(_):
        ib = jnp.broadcast_to(isrt[:, None], (B, S, Np))
        pos = jax.lax.broadcasted_iota(jnp.int32, (B, S, Np), 2)
        _, ifull, pfull = jax.lax.sort((d2, ib, pos), dimension=-1,
                                       num_keys=2)
        psel = pfull[..., :K]
        gsel = jax.vmap(lambda p, i: p[i])(
            pts_s, psel.reshape(B, S * K)).reshape(B, S, K, 3)
        return gsel, ifull[..., :K]

    # 0: every row certified (real surface data measures zero failures —
    # skip the ~5 ms top-up entirely); 1: top-up the failed rows;
    # 2: overflow backstop.
    branch = jnp.where(nfail == 0, 0, jnp.where(nfail <= F, 1, 2))
    grouped, idx = jax.lax.switch(
        branch, (lambda _: (grouped, idx), _topup, _full_exact), None)
    return grouped, idx
