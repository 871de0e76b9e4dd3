"""Pallas TPU kernel: fused patch-batch chamfer distance, forward + VJP.

The training loss's chamfer term (models/losses.py) is the largest
remaining per-step cost after the fused encoder (~13 ms f+b of a ~27 ms
IPDAE step — CLAUDE.md perf map). The XLA path scans chunked distance
mins, then recomputes the chosen distances through a gather whose backward
is an XLA scatter — slow on TPU. This kernel keeps one patch block's
entire [k, K] distance problem in VMEM: expansion-form distances (MXU),
argmin selection, one-hot gather, exact recompute — and the custom-VJP
backward turns the scatter-add into the transpose one-hot matmul
(the ops/sa_pallas.py trick), so neither direction touches XLA scatter.

Semantics match ops/chamfer.py::chamfer_distance(fast_search=True)
exactly: selection by the q2-2qp+p2 expansion (ties -> lowest index, as
jnp.argmin), loss = the exactly recomputed gathered distance, gradients
flow to both clouds through the gather at the stopped-gradient argmin
(reference: pytorch3d chamfer_distance, AE.py:67).

Shape domain: patch batches ([P, k, 3] vs [P, K, 3]) where one patch's
[k, K] matrix fits VMEM — the IPDAE (16x256) and PPPF (256x256) training
losses. Whole-cloud chamfer (PPPE, 8192x8192) stays on the chunked XLA
path (ops/chamfer.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pcc_tpu.ops.sa_pallas import _argmin_lanes


def _expansion_d2(a, b):
    """[BP, n, 3] x [BP, m, 3] -> [BP, n, m] expansion-form sq dists."""
    a2 = jnp.sum(a * a, axis=-1)
    b2 = jnp.sum(b * b, axis=-1)
    cross = jax.lax.dot_general(
        a, b, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    return a2[:, :, None] - 2.0 * cross + b2[:, None, :]


def _fwd_kernel(x_ref, y_ref, dxy_ref, dyx_ref, ixy_ref, iyx_ref):
    x = x_ref[...]                                       # [BP, k, 3]
    y = y_ref[...]                                       # [BP, K, 3]
    BP, k, _ = x.shape
    K = y.shape[1]

    iota_K = jax.lax.broadcasted_iota(jnp.int32, (1, 1, K), 2)
    ixy = _argmin_lanes(_expansion_d2(x, y), iota_K, K)  # [BP, k]
    ohx = (iota_K == ixy[:, :, None]).astype(jnp.float32)
    ynear = jax.lax.dot_general(
        ohx, y, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)              # [BP, k, 3]
    dxy_ref[...] = jnp.sum((x - ynear) ** 2, axis=-1)    # exact recompute

    iota_k = jax.lax.broadcasted_iota(jnp.int32, (1, 1, k), 2)
    iyx = _argmin_lanes(_expansion_d2(y, x), iota_k, k)  # [BP, K]
    ohy = (iota_k == iyx[:, :, None]).astype(jnp.float32)
    xnear = jax.lax.dot_general(
        ohy, x, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)              # [BP, K, 3]
    dyx_ref[...] = jnp.sum((y - xnear) ** 2, axis=-1)
    ixy_ref[...] = ixy
    iyx_ref[...] = iyx


def _bwd_kernel(x_ref, y_ref, ixy_ref, iyx_ref, gx_ref, gy_ref,
                dx_ref, dy_ref):
    """Given per-point cotangents gx [BP, k] (for dxy) and gy [BP, K]
    (for dyx), emit dx [BP, k, 3], dy [BP, K, 3]. The gather transposes
    to a one-hot^T matmul instead of an XLA scatter."""
    x = x_ref[...]
    y = y_ref[...]
    BP, k, _ = x.shape
    K = y.shape[1]
    gx = gx_ref[...].astype(jnp.float32)
    gy = gy_ref[...].astype(jnp.float32)

    iota_K = jax.lax.broadcasted_iota(jnp.int32, (1, 1, K), 2)
    ohx = (iota_K == ixy_ref[...][:, :, None]).astype(jnp.float32)
    ynear = jax.lax.dot_general(
        ohx, y, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    exy = 2.0 * (x - ynear) * gx[:, :, None]             # [BP, k, 3]

    iota_k = jax.lax.broadcasted_iota(jnp.int32, (1, 1, k), 2)
    ohy = (iota_k == iyx_ref[...][:, :, None]).astype(jnp.float32)
    xnear = jax.lax.dot_general(
        ohy, x, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    eyx = 2.0 * (y - xnear) * gy[:, :, None]             # [BP, K, 3]

    # d/dx: direct term from dxy, minus the scatter-back of dyx's gathers
    dx_ref[...] = exy - jax.lax.dot_general(
        ohy, eyx, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)              # [BP, k, 3]
    dy_ref[...] = eyx - jax.lax.dot_general(
        ohx, exy, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)              # [BP, K, 3]


def _pad_p(a, block_p):
    pad = (-a.shape[0]) % block_p
    if pad:
        a = jnp.concatenate(
            [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], axis=0)
    return a, pad


def _run_fwd(x, y, *, block_p, interpret):
    P, k, _ = x.shape
    K = y.shape[1]
    xp, _ = _pad_p(x, block_p)
    yp, _ = _pad_p(y, block_p)
    Pp = xp.shape[0]
    dxy, dyx, ixy, iyx = pl.pallas_call(
        _fwd_kernel,
        grid=(Pp // block_p,),
        in_specs=[pl.BlockSpec((block_p, k, 3), lambda i: (i, 0, 0)),
                  pl.BlockSpec((block_p, K, 3), lambda i: (i, 0, 0))],
        out_specs=[pl.BlockSpec((block_p, k), lambda i: (i, 0)),
                   pl.BlockSpec((block_p, K), lambda i: (i, 0)),
                   pl.BlockSpec((block_p, k), lambda i: (i, 0)),
                   pl.BlockSpec((block_p, K), lambda i: (i, 0))],
        out_shape=[jax.ShapeDtypeStruct((Pp, k), jnp.float32),
                   jax.ShapeDtypeStruct((Pp, K), jnp.float32),
                   jax.ShapeDtypeStruct((Pp, k), jnp.int32),
                   jax.ShapeDtypeStruct((Pp, K), jnp.int32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(xp.astype(jnp.float32), yp.astype(jnp.float32))
    return dxy[:P], dyx[:P], ixy[:P], iyx[:P]


def _run_bwd(x, y, ixy, iyx, gx, gy, *, block_p, interpret):
    P, k, _ = x.shape
    K = y.shape[1]
    xp, _ = _pad_p(x, block_p)
    yp, _ = _pad_p(y, block_p)
    ixyp, _ = _pad_p(ixy, block_p)
    iyxp, _ = _pad_p(iyx, block_p)
    gxp, _ = _pad_p(gx, block_p)        # zero cotangent on padded rows
    gyp, _ = _pad_p(gy, block_p)
    Pp = xp.shape[0]
    dx, dy = pl.pallas_call(
        _bwd_kernel,
        grid=(Pp // block_p,),
        in_specs=[pl.BlockSpec((block_p, k, 3), lambda i: (i, 0, 0)),
                  pl.BlockSpec((block_p, K, 3), lambda i: (i, 0, 0)),
                  pl.BlockSpec((block_p, k), lambda i: (i, 0)),
                  pl.BlockSpec((block_p, K), lambda i: (i, 0)),
                  pl.BlockSpec((block_p, k), lambda i: (i, 0)),
                  pl.BlockSpec((block_p, K), lambda i: (i, 0))],
        out_specs=[pl.BlockSpec((block_p, k, 3), lambda i: (i, 0, 0)),
                   pl.BlockSpec((block_p, K, 3), lambda i: (i, 0, 0))],
        out_shape=[jax.ShapeDtypeStruct((Pp, k, 3), jnp.float32),
                   jax.ShapeDtypeStruct((Pp, K, 3), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(xp.astype(jnp.float32), yp.astype(jnp.float32), ixyp, iyxp, gxp, gyp)
    return dx[:P], dy[:P]


@functools.lru_cache(maxsize=None)
def _make_min_dists(block_p, interpret):
    @jax.custom_vjp
    def min_dists(x, y):
        dxy, dyx, _, _ = _run_fwd(x, y, block_p=block_p, interpret=interpret)
        return dxy, dyx

    def fwd(x, y):
        dxy, dyx, ixy, iyx = _run_fwd(x, y, block_p=block_p,
                                      interpret=interpret)
        return (dxy, dyx), (x, y, ixy, iyx)

    def bwd(res, g):
        x, y, ixy, iyx = res
        gx, gy = g
        dx, dy = _run_bwd(x, y, ixy, iyx, gx, gy, block_p=block_p,
                          interpret=interpret)
        return dx, dy

    min_dists.defvjp(fwd, bwd)
    return min_dists


def chamfer_min_dists(x: jnp.ndarray, y: jnp.ndarray, *, block_p: int = 32,
                      interpret: bool = False):
    """Differentiable per-point min squared distances, both directions.

    Args:
      x: [P, k, 3]; y: [P, K, 3] float32 patch batches.
    Returns:
      (dxy [P, k], dyx [P, K]) — exact recomputed min distances, with a
      fused-Pallas VJP to both inputs.
    """
    return _make_min_dists(block_p, interpret)(x, y)


def fits_kernel(x, y, limit: int = 1 << 19) -> bool:
    """Whether one patch's [k, K] problem is kernel-sized (VMEM bound)."""
    return (x.ndim == 3 and y.ndim == 3
            and x.shape[1] * y.shape[1] <= limit
            and x.shape[1] >= 8 and y.shape[1] >= 8)
