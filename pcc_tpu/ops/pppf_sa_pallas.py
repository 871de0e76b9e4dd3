"""Pallas TPU kernel: fused PN++ SetAbstraction stage for the PPPF family.

The PPPF encoder's XLA path materializes every grouped-neighbor activation
[P, S, nsample, C] between MLP layers (models/pppf.py::PointnetSAModule) —
~4 GB of HBM traffic per 16-cloud compress batch at the default config,
the reason cli/compress.py caps PPPF batches at 16 (VERDICT r3 weak #3).
This kernel is the PN++ analogue of ops/sa_pallas.py: ball-query KNN
selection, neighbor gather, the Conv+BN+ReLU stack, and the max over
samples all stay VMEM-resident per patch block; HBM sees only the stage's
[P, N, 3+C] input and [P, S, C_out] output.

Semantics match the XLA stage exactly:
- selection: iterative masked argmin over the expanded-form distance
  matrix — the same ascending-(distance, index) order as lax.top_k in
  ops/knn.py::knn_points (see ops/sa_pallas.py::_argmin_lanes).
- ball mask: out-of-radius slots read point 0's row, with the radius test
  on exactly recomputed distances — ops/knn.py::ball_query's contract
  (itself replicating the reference's clamp of pytorch3d's -1 padding,
  pointnet_sa_module.py:16-28).
- grouping: features-first concat, UNcentered neighbor coords
  (pointnet_sa_module.py:74-85 — unlike the PPPE family's centered SA).
- BatchNorm (inference): y = (h - mean) * mul + bias with
  mul = rsqrt(var + eps) * scale precomputed by the caller in the same
  f32 expression flax's _normalize uses, so the affine arithmetic is
  bit-equal to the XLA BatchNorm at eval time.

FPS stays outside (ops/fps.py / fps_pallas.py — already batched); this
kernel receives the stage's query centroids.

Reference hot spot replaced: pointnet_sa_module.py:38-93.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pcc_tpu.ops.sa_pallas import _argmin_lanes


def _stage_kernel(new_ref, xyz_ref, *refs, nsample: int, radius: float,
                  n_layers: int, has_feat: bool, compute_dtype,
                  slot_group: int):
    """new_ref [BP, S, 3]; xyz_ref [BP, N, 3]; refs = ([feat [BP, N, C]],
    then per layer W, b, mean, mul, bn_bias, then out_ref [BP, S, C_out])."""
    if has_feat:
        feat_ref, *refs = refs
    *layer_refs, out_ref = refs
    new_xyz = new_ref[...]                               # [BP, S, 3]
    xyz = xyz_ref[...]
    BP, S, _ = new_xyz.shape
    N = xyz.shape[1]

    # rows to gather: [feat | xyz] features-first (uncentered)
    if has_feat:
        rows = jnp.concatenate(
            [feat_ref[...].astype(jnp.float32), xyz], axis=-1)  # [BP,N,C+3]
    else:
        rows = xyz
    row0 = jax.lax.slice_in_dim(rows, 0, 1, axis=1)      # [BP, 1, C+3]

    # expanded-form distances (selection only — matches ops/knn.py)
    q2 = jnp.sum(new_xyz * new_xyz, axis=-1)             # [BP, S]
    p2 = jnp.sum(xyz * xyz, axis=-1)                     # [BP, N]
    cross = jax.lax.dot_general(
        new_xyz, xyz, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)              # [BP, S, N]
    d2 = jnp.maximum(q2[:, :, None] - 2.0 * cross + p2[:, None, :], 0.0)
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, N), 2)

    W = [layer_refs[5 * i][...] for i in range(n_layers)]
    b = [layer_refs[5 * i + 1][...] for i in range(n_layers)]
    mu = [layer_refs[5 * i + 2][...] for i in range(n_layers)]
    mul = [layer_refs[5 * i + 3][...] for i in range(n_layers)]
    beta = [layer_refs[5 * i + 4][...] for i in range(n_layers)]

    def dense_bn_relu(x, i):
        if compute_dtype is not None:
            x = x.astype(compute_dtype)
            w = W[i].astype(compute_dtype)
        else:
            w = W[i]
        h = jnp.dot(x, w, preferred_element_type=jnp.float32)
        h = h + b[i].astype(jnp.float32)
        # flax _normalize eval arithmetic: (h - mean) * mul + bias
        h = (h - mu[i]) * mul[i] + beta[i]
        h = jax.nn.relu(h)
        return h.astype(compute_dtype) if compute_dtype is not None else h

    r2 = radius * radius
    C_out = out_ref.shape[-1]
    g = slot_group
    acc = jnp.full((BP * S, C_out), -jnp.inf, jnp.float32)
    for _ in range(nsample // g):
        # selection stays sequential (each pick masks the next); the g
        # gathers + the MLP batch into one matmul set per group
        ohs = []
        for _ in range(g):
            idx = _argmin_lanes(d2, iota, N)             # [BP, S]
            oh = (iota == idx[:, :, None]).astype(jnp.float32)
            d2 = jnp.where(oh != 0.0, jnp.inf, d2)
            ohs.append(oh)
        oh_g = ohs[0] if g == 1 else jnp.concatenate(ohs, axis=1)
        nb = jax.lax.dot_general(
            oh_g, rows, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)          # [BP, g*S, C+3]
        # radius mask on exactly recomputed distances (the gathered xyz
        # lives in the trailing 3 lanes), as ops/knn.py::ball_query does
        nbg = nb.reshape(BP, g, S, -1)
        diff = nbg[..., -3:] - new_xyz[:, None]
        dexact = jnp.sum(diff * diff, axis=-1)           # [BP, g, S]
        inside = (dexact <= r2).reshape(BP, g * S)[:, :, None]
        nb = jnp.where(inside, nb, row0)
        h = nb.reshape(BP * g * S, nb.shape[-1])
        for i in range(n_layers):
            h = dense_bn_relu(h, i)
        hg = h.astype(jnp.float32).reshape(BP, g, S, C_out)
        acc = jnp.maximum(acc, jnp.max(hg, axis=1).reshape(BP * S, C_out))
    out_ref[...] = acc.reshape(BP, S, C_out)


def fold_bn(bn_params, bn_stats, eps: float = 1e-5):
    """(scale, bias, mean, var) -> (mean, mul, bias) with
    mul = rsqrt(var + eps) * scale — the exact f32 expression flax's
    _normalize evaluates, so the kernel's affine is bit-equal to eval-mode
    BatchNorm."""
    mul = jax.lax.rsqrt(bn_stats["var"].astype(jnp.float32) + eps) \
        * bn_params["scale"].astype(jnp.float32)
    return (bn_stats["mean"].astype(jnp.float32), mul,
            bn_params["bias"].astype(jnp.float32))


def pppf_sa_fused(new_xyz: jnp.ndarray, xyz: jnp.ndarray,
                  feat: jnp.ndarray | None, layers, *, nsample: int,
                  radius: float, compute_dtype=None, block_p: int = 8,
                  slot_group: int | None = None,
                  interpret: bool = False) -> jnp.ndarray:
    """Fused PN++ SA stage over a flat patch batch.

    Args:
      new_xyz: [P, S, 3] query centroids (FPS output, or the points
        themselves when npoint == N).
      xyz: [P, N, 3] stage input points.
      feat: [P, N, C] per-point features or None (stage 1).
      layers: list of (W [Cin,Cout], b [Cout], mean, mul, bn_bias) — BN
        folded via fold_bn.
      nsample/radius: ball-query parameters (PPPF_AE.py:29-37 stages).
    Returns:
      [P, S, C_out] float32 stage features (max over samples).
    """
    P, S, _ = new_xyz.shape
    N = xyz.shape[1]
    C_out = layers[-1][0].shape[-1]
    if slot_group is None:
        slot_group = 4 if nsample % 4 == 0 else (
            2 if nsample % 2 == 0 else 1)
    if nsample % slot_group:
        raise ValueError(f"slot_group {slot_group} must divide {nsample}")

    pad = (-P) % block_p
    if pad:
        z = lambda a: jnp.zeros((pad,) + a.shape[1:], a.dtype)
        new_xyz = jnp.concatenate([new_xyz, z(new_xyz)], axis=0)
        xyz = jnp.concatenate([xyz, z(xyz)], axis=0)
        if feat is not None:
            feat = jnp.concatenate([feat, z(feat)], axis=0)
    Pp = P + pad

    full = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim)
    args, specs = [], []
    specs.append(pl.BlockSpec((block_p, S, 3), lambda i: (i, 0, 0)))
    specs.append(pl.BlockSpec((block_p, N, 3), lambda i: (i, 0, 0)))
    if feat is not None:
        specs.append(pl.BlockSpec((block_p, N, feat.shape[-1]),
                                  lambda i: (i, 0, 0)))
    for lay in layers:
        for a in lay:
            args.append(a)
            specs.append(full(a))
    ins = ([new_xyz.astype(jnp.float32), xyz.astype(jnp.float32)]
           + ([feat] if feat is not None else []) + args)
    out = pl.pallas_call(
        functools.partial(
            _stage_kernel, nsample=nsample, radius=radius,
            n_layers=len(layers), has_feat=feat is not None,
            compute_dtype=compute_dtype, slot_group=slot_group),
        grid=(Pp // block_p,),
        in_specs=specs,
        out_specs=pl.BlockSpec((block_p, S, C_out), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((Pp, S, C_out), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(*ins)
    return out[:P]
