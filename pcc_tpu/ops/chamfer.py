"""Chamfer distance and chunked nearest-neighbor reductions.

Replaces pytorch3d.loss.chamfer_distance (reference AE.py:67, eval.py:204).
For N = 8192 the full [N, N] distance matrix is 64M floats; rather than
materializing it we scan over key chunks with a running minimum, so peak
memory is [N, chunk] while the q·kᵀ products still run on the MXU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_CHUNK = 2048


def _exact_min(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Exact per-point min squared distance (direct differences, not the
    q2-2qp+p2 expansion, which loses float32 precision near zero)."""
    d = jnp.sum((x[:, None, :] - y[None, :, :]) ** 2, axis=-1)
    return jnp.min(d, axis=-1)


def _pad_chunks(y: jnp.ndarray, chunk: int):
    """Pad y to a multiple of `chunk` and return ([C, chunk, 3] chunks,
    [C, chunk] bool validity mask). Shapes are static — any N works, so
    arbitrary-size clouds (e.g. S3DIS rooms) evaluate like the reference
    (eval.py:43-98, compress.py:92-93)."""
    N = y.shape[0]
    rem = (-N) % chunk
    if rem:
        y = jnp.concatenate([y, jnp.zeros((rem, y.shape[1]), y.dtype)])
    valid = jnp.arange(y.shape[0]) < N
    C = y.shape[0] // chunk
    return y.reshape(C, chunk, y.shape[1]), valid.reshape(C, chunk)


def min_sq_dists(x: jnp.ndarray, y: jnp.ndarray, chunk: int = _CHUNK) -> jnp.ndarray:
    """Per-point min squared distance from each x to the set y.

    Args:
      x: [S, 3]; y: [N, 3], any N (padded+masked to chunk granularity).
    Returns:
      [S] float.
    """
    if y.shape[0] <= chunk:
        return _exact_min(x, y)
    y_chunks, valid = _pad_chunks(y, chunk)

    def body(carry, args):
        y_c, v_c = args
        d = jnp.sum((x[:, None, :] - y_c[None, :, :]) ** 2, axis=-1)
        d = jnp.where(v_c[None, :], d, jnp.inf)
        return jnp.minimum(carry, jnp.min(d, axis=-1)), None

    init = jnp.full((x.shape[0],), jnp.inf, dtype=x.dtype)
    out, _ = jax.lax.scan(body, init, (y_chunks, valid))
    return out


def nearest_neighbor(x: jnp.ndarray, y: jnp.ndarray, chunk: int = _CHUNK):
    """Exact 1-NN of each x in y via chunked direct differences.

    The matmul-expansion KNN (ops.knn) can mis-pick between near-ties at
    float32 precision, which matters for metrics (a point's nearest neighbor
    in an identical cloud must be itself). Both sides are chunked, so any
    S and N work at [chunk, chunk] peak memory (the reference's eval loops
    host-side per point instead, eval.py:43-98).
    Returns (min_sq_dist [S], idx [S] int32).
    """
    S = x.shape[0]
    if S > chunk:
        # chunk the query side too: one scan step per x block
        x_chunks, _ = _pad_chunks(x, chunk)
        _, (d, i) = jax.lax.scan(
            lambda _, xc: (None, _nn_small(xc, y, chunk)), None, x_chunks)
        return d.reshape(-1)[:S], i.reshape(-1)[:S]
    return _nn_small(x, y, chunk)


def _nn_small(x: jnp.ndarray, y: jnp.ndarray, chunk: int):
    """nearest_neighbor for x no larger than one chunk."""
    N = y.shape[0]
    if N <= chunk:
        d = jnp.sum((x[:, None, :] - y[None, :, :]) ** 2, axis=-1)
        return jnp.min(d, axis=-1), jnp.argmin(d, axis=-1).astype(jnp.int32)
    y_chunks, valid = _pad_chunks(y, chunk)

    def body(carry, args):
        best_d, best_i = carry
        c, y_c, v_c = args
        d = jnp.sum((x[:, None, :] - y_c[None, :, :]) ** 2, axis=-1)
        d = jnp.where(v_c[None, :], d, jnp.inf)
        d_min = jnp.min(d, axis=-1)
        i_min = jnp.argmin(d, axis=-1).astype(jnp.int32) + c * chunk
        take = d_min < best_d
        return (jnp.where(take, d_min, best_d),
                jnp.where(take, i_min, best_i)), None

    init = (jnp.full((x.shape[0],), jnp.inf, dtype=x.dtype),
            jnp.zeros((x.shape[0],), jnp.int32))
    (best_d, best_i), _ = jax.lax.scan(
        body, init,
        (jnp.arange(y_chunks.shape[0]), y_chunks, valid))
    return best_d, best_i


def _nn_expansion(x: jnp.ndarray, y: jnp.ndarray, chunk: int = _CHUNK):
    """1-NN index search via the q2 - 2q·p + p2 expansion.

    The cross term is one MXU matmul per chunk instead of the direct-
    difference VPU pass — several times faster at N=8192. Selection-only
    precision: the expansion loses ~1e-6 relative accuracy, so a near-tie
    can resolve to a different (equidistant to float error) neighbor than
    the exact search. Safe where the chosen distance is recomputed exactly
    afterwards (the training loss); wrong for metrics, where an identical
    cloud's nearest neighbor must be itself at exactly 0 (nearest_neighbor).
    Returns idx [S] int32.
    """
    x2 = jnp.sum(x * x, axis=-1)                          # [S]
    y_chunks, valid = _pad_chunks(y, chunk)

    def body(carry, args):
        best_d, best_i = carry
        c, y_c, v_c = args
        d = (x2[:, None] - 2.0 * (x @ y_c.T)
             + jnp.sum(y_c * y_c, axis=-1)[None, :])
        d = jnp.where(v_c[None, :], d, jnp.inf)
        d_min = jnp.min(d, axis=-1)
        i_min = jnp.argmin(d, axis=-1).astype(jnp.int32) + c * chunk
        take = d_min < best_d
        return (jnp.where(take, d_min, best_d),
                jnp.where(take, i_min, best_i)), None

    init = (jnp.full((x.shape[0],), jnp.inf, dtype=x.dtype),
            jnp.zeros((x.shape[0],), jnp.int32))
    (_, best_i), _ = jax.lax.scan(
        body, init, (jnp.arange(y_chunks.shape[0]), y_chunks, valid))
    return best_i


def _directed_mean_sq(x: jnp.ndarray, y: jnp.ndarray,
                      fast_search: bool = False) -> jnp.ndarray:
    """mean_i min_j |x_i - y_j|^2, differentiable w.r.t. both clouds.

    The argmin search runs under stop_gradient (forward-only scan, no
    per-chunk residuals saved for the backward pass — the naive version
    OOMs at N=8192 batches), then the distance is recomputed through a
    gather: d(min)/dx equals the gradient at the argmin, so this is exact.
    fast_search routes the argmin through the MXU expansion form
    (_nn_expansion) — the recomputed loss stays exact either way.
    """
    if fast_search:
        idx = _nn_expansion(jax.lax.stop_gradient(x),
                            jax.lax.stop_gradient(y))
    else:
        _, idx = nearest_neighbor(jax.lax.stop_gradient(x),
                                  jax.lax.stop_gradient(y))
    y_near = y[idx]
    return jnp.mean(jnp.sum((x - y_near) ** 2, axis=-1))


def chamfer_distance(x: jnp.ndarray, y: jnp.ndarray,
                     fast_search: bool = False):
    """Symmetric chamfer distance with pytorch3d semantics.

    mean-over-points of min squared distance in each direction, summed, then
    averaged over the batch. Returns (loss, None) to match the
    `chamfer_distance(pred, target)` tuple the reference unpacks (AE.py:67).

    fast_search=True uses the MXU expansion form for the neighbor SEARCH
    (the loss itself is still the exactly-recomputed gathered distance);
    the training steps enable it — near-tie neighbor picks may differ from
    the exact search by a same-distance-to-float-error point, which leaves
    the loss value equal to ~1e-6 and the gradient equal except at
    measure-zero ties. Leave False for metrics/identity contracts.

    On TPU, fast_search additionally routes kernel-sized patch batches
    (both [k, K] sides VMEM-bound — IPDAE 16x256, PPPF 256x256) through
    the fused Pallas forward+VJP (ops/chamfer_pallas.py), whose backward
    replaces XLA's scatter with a one-hot^T matmul. Same selection and
    recompute semantics; whole-cloud shapes (PPPE) keep the chunked scan.

    Args:
      x: [B, S, 3]; y: [B, N, 3].
    """
    if fast_search:
        from pcc_tpu.ops.chamfer_pallas import chamfer_min_dists, fits_kernel
        from pcc_tpu.ops.pallas_gate import pallas_gate

        use_fused, interp = pallas_gate()
        if use_fused and fits_kernel(x, y):
            dxy, dyx = chamfer_min_dists(x, y, interpret=interp)
            return jnp.mean(jnp.mean(dxy, axis=-1)
                            + jnp.mean(dyx, axis=-1)), None
    d_xy = jax.vmap(lambda a, b: _directed_mean_sq(a, b, fast_search))(x, y)
    d_yx = jax.vmap(lambda a, b: _directed_mean_sq(a, b, fast_search))(y, x)
    return jnp.mean(d_xy + d_yx), None
