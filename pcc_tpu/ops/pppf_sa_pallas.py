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
                  slot_group: int, layout: str = "pppf"):
    """new_ref [BP, S, 3]; xyz_ref [BP, N, 3]; refs = ([feat [BP, N, C]],
    then per layer W, b, mean, mul, bn_bias, then out_ref [BP, S, C_out]).

    layout selects the family's grouping contract:
      "pppf": [feat | xyz] features-first, UNcentered, ball-radius mask
              (pointnet_sa_module.py:74-85).
      "pppe": [xyz - query | feat] centered-coords-first, pure KNN, no
              mask (pppe_pcd_ae.py:573-614 — the PPPE family's
              PointNetSetAbstractionKNN)."""
    if has_feat:
        feat_ref, *refs = refs
    *layer_refs, out_ref = refs
    new_xyz = new_ref[...]                               # [BP, S, 3]
    xyz = xyz_ref[...]
    BP, S, _ = new_xyz.shape
    N = xyz.shape[1]

    if has_feat:
        featf = feat_ref[...].astype(jnp.float32)
        if layout == "pppe":
            rows = jnp.concatenate([xyz, featf], axis=-1)    # [BP,N,3+C]
        else:
            # [feat | xyz] features-first (uncentered)
            rows = jnp.concatenate([featf, xyz], axis=-1)    # [BP,N,C+3]
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
        nbg = nb.reshape(BP, g, S, -1)
        if layout == "pppe":
            # center the leading xyz lanes on the query; no radius mask
            cx = nbg[..., :3] - new_xyz[:, None]
            nb = jnp.concatenate([cx, nbg[..., 3:]], axis=-1).reshape(
                BP, g * S, -1)
        else:
            # radius mask on exactly recomputed distances (the gathered
            # xyz lives in the trailing 3 lanes), as ball_query does
            diff = nbg[..., -3:] - new_xyz[:, None]
            dexact = jnp.sum(diff * diff, axis=-1)       # [BP, g, S]
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
                  slot_group: int | None = None, layout: str = "pppf",
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
            compute_dtype=compute_dtype, slot_group=slot_group,
            layout=layout),
        grid=(Pp // block_p,),
        in_specs=specs,
        out_specs=pl.BlockSpec((block_p, S, C_out), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((Pp, S, C_out), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(*ins)
    return out[:P]


# ---------------------------------------------------------------------------
# Backward kernel + custom VJP: the PPPF training path (VERDICT r4 item 2).
#
# Same rationale as ops/sa_pallas.py's backward: the XLA stage's autodiff
# stores every grouped-neighbor activation [P, S, nsample, C] as a residual
# — the multi-GB HBM traffic the forward kernel exists to avoid, paid twice.
# This kernel recomputes the stage inside VMEM instead. Unlike the IPDAE
# backward (which stores all slot groups' activations — its shapes fit),
# the PPPF stages run up to nsample=128 slots of up-to-1024-lane
# activations, so storage is per-GROUP only: pass 1 replays the selection +
# MLP to find the max winners (storing just the [BP, S] winner indices per
# slot), pass 2 re-replays each group's gather + MLP and backprops it
# immediately. ~2x forward FLOPs, zero HBM intermediates — the
# rematerialization trade is cheap here because the stage is
# bandwidth-bound, not FLOP-bound.
#
# BatchNorm: the kernel differentiates the *eval-affine* form
# y = (z - mean) * mul + bias with mul = rsqrt(var + eps) * scale, i.e.
# frozen running statistics (use_running_average=True). Gradients flow to
# scale/bias through fold_bn's differentiable expression outside the
# kernel; mean/var are running stats and carry none (flax never
# differentiates the batch_stats collection). Training with the fused stage
# therefore freezes BN normalization stats — the post-warmup regime; see
# models/pppf.py::PointnetSAModule.fused_train.
#
# Gradient semantics otherwise match XLA autodiff over the stage
# (reference train.py autograd over pointnet_sa_module.py:38-93): ball
# selection indices and the radius mask carry no gradient (integer /
# boolean), out-of-radius slots route their gradient to point 0's row
# (ops/knn.py::ball_query's clamp contract), neighbor gathers transpose to
# scatter-adds (one-hot^T matmuls), and max-over-samples routes to the
# first winner (ties between distinct positive activations are
# measure-zero; all-dead relu ties die in the relu mask either way —
# pinned by tests/test_pppf_sa_pallas.py gradient-parity tests).
# UNcentered grouping means new_xyz gets ZERO gradient from the stage
# (it only enters the integer selection and the boolean mask), exactly as
# in the XLA path.
# ---------------------------------------------------------------------------


def _stage_bwd_kernel(new_ref, xyz_ref, *refs, nsample: int, radius: float,
                      n_layers: int, has_feat: bool, compute_dtype,
                      slot_group: int):
    """Recompute-and-backprop for one patch block.

    refs = ([feat [BP, N, C]], g [BP, S, C_out] cotangent, then per layer
    W, b, mean, mul, bn_bias; outputs dxyz [BP, N, 3], [dfeat [BP, N, C]],
    then per layer dW, db, dmul, dbias accumulated across the sequential
    TPU grid)."""
    if has_feat:
        feat_ref, *refs = refs
    g_ref, *refs = refs
    layer_refs, refs = refs[: 5 * n_layers], refs[5 * n_layers:]
    dxyz_ref, *refs = refs
    if has_feat:
        dfeat_ref, *refs = refs
    grad_refs = refs                                     # 4 per layer

    new_xyz = new_ref[...]
    xyz = xyz_ref[...]
    BP, S, _ = new_xyz.shape
    N = xyz.shape[1]

    if has_feat:
        rows = jnp.concatenate(
            [feat_ref[...].astype(jnp.float32), xyz], axis=-1)
    else:
        rows = xyz
    row0 = jax.lax.slice_in_dim(rows, 0, 1, axis=1)      # [BP, 1, C+3]
    C_rows = rows.shape[-1]

    q2 = jnp.sum(new_xyz * new_xyz, axis=-1)
    p2 = jnp.sum(xyz * xyz, axis=-1)
    cross = jax.lax.dot_general(
        new_xyz, xyz, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    d2 = jnp.maximum(q2[:, :, None] - 2.0 * cross + p2[:, None, :], 0.0)
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, N), 2)

    W = [layer_refs[5 * i][...] for i in range(n_layers)]
    b = [layer_refs[5 * i + 1][...] for i in range(n_layers)]
    mu = [layer_refs[5 * i + 2][...] for i in range(n_layers)]
    mul = [layer_refs[5 * i + 3][...] for i in range(n_layers)]
    beta = [layer_refs[5 * i + 4][...] for i in range(n_layers)]

    def cast(x):
        return x.astype(compute_dtype) if compute_dtype is not None else x

    r2 = radius * radius
    C_out = grad_refs[4 * (n_layers - 1)].shape[-1]
    g = slot_group
    e_row0 = (jax.lax.broadcasted_iota(jnp.int32, (1, N, 1), 1) == 0)

    def group_gather(ohs):
        """Stacked one-hot gather + ball mask for one slot group — the
        exact forward arithmetic of _stage_kernel (op for op, so the
        replayed activations are bitwise the forward's)."""
        oh_g = ohs[0] if g == 1 else jnp.concatenate(ohs, axis=1)
        nb = jax.lax.dot_general(
            oh_g, rows, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)          # [BP, g*S, C+3]
        nbg = nb.reshape(BP, g, S, -1)
        diff = nbg[..., -3:] - new_xyz[:, None]
        dexact = jnp.sum(diff * diff, axis=-1)
        inside = (dexact <= r2).reshape(BP, g * S)[:, :, None]
        nb = jnp.where(inside, nb, row0)
        return oh_g, nb, inside

    def mlp_replay(nb):
        """Forward replay storing per-layer (cast input, f32 pre-BN z)."""
        x = nb.reshape(BP * g * S, C_rows)
        xs, zs = [], []
        for i in range(n_layers):
            xc = cast(x)
            xs.append(xc)
            z = jnp.dot(xc, cast(W[i]),
                        preferred_element_type=jnp.float32)
            z = z + b[i].astype(jnp.float32)
            zs.append(z)
            h = (z - mu[i]) * mul[i] + beta[i]
            h = jax.nn.relu(h)
            x = cast(h)
        return xs, zs, x

    def select_group(d2):
        """The next g winner one-hots + the masked distance matrix — the
        exact sequential selection of the forward kernel. Deterministic,
        so pass 2 re-derives the identical slot sequence instead of
        carrying per-slot indices across the whole unrolled kernel (32
        stored index arrays put Mosaic's register allocator 55 MB past
        VMEM in spill slots at the sa1 shape; recompute costs one extra
        [S, N] distance matmul per pass and frees all of it)."""
        ohs = []
        for _ in range(g):
            idx = _argmin_lanes(d2, iota, N)
            oh = (iota == idx[:, :, None]).astype(jnp.float32)
            d2 = jnp.where(oh != 0.0, jnp.inf, d2)
            ohs.append(oh)
        return ohs, d2

    # Both passes run as lax.fori_loop over slot GROUPS: the group body
    # compiles once instead of nsample/g times. The fully unrolled form
    # put Mosaic's register allocator 55 MB past VMEM in spill slots at
    # the sa1 shape (nsample=32, two passes), and an intermediate
    # recompute-but-unrolled form still took the remote compiler >25 min.
    # Unrolling was a measured perf win for the IPDAE FORWARD kernel
    # (sa_pallas.py) at knn=16; here compile feasibility binds.

    # ---- pass 1: selection + max-winner tracking (activations and
    # selection discarded; only feats/best survive to pass 2) ----
    def pass1_body(it, carry):
        d2, feats, best = carry
        g0 = it * g
        ohs, d2 = select_group(d2)
        _, nb, _ = group_gather(ohs)
        *_, h = mlp_replay(nb)
        hg = h.astype(jnp.float32).reshape(BP, g, S, C_out)
        gm = jnp.max(hg, axis=1).reshape(BP * S, C_out)
        slot_io = jax.lax.broadcasted_iota(jnp.int32, (1, g, 1, 1), 1)
        gi = jnp.min(jnp.where(hg == gm.reshape(BP, 1, S, C_out),
                               slot_io, g), axis=1).reshape(BP * S, C_out)
        best = jnp.where(gm > feats, g0 + gi, best)
        feats = jnp.maximum(feats, gm)
        return d2, feats, best

    _, feats, best = jax.lax.fori_loop(
        0, nsample // g, pass1_body,
        (d2, jnp.full((BP * S, C_out), -jnp.inf, jnp.float32),
         jnp.zeros((BP * S, C_out), jnp.int32)))

    i_prog = pl.program_id(0)

    @pl.when(i_prog == 0)
    def _zero_grads():
        for r in grad_refs:
            r[...] = jnp.zeros(r.shape, r.dtype)

    # ---- pass 2: per-group recompute + backprop. The selection sequence
    # is re-derived from a fresh distance matrix (deterministic — same
    # math, same order), and the input gradients accumulate in the OUTPUT
    # refs (VMEM), not in registers carried across the loop ----
    gout = g_ref[...].astype(jnp.float32)                # [BP, S, C_out]
    bestr = best.reshape(BP, 1, S, C_out)
    live = (feats > 0.0).reshape(BP, 1, S, C_out)
    goutr = gout.reshape(BP, 1, S, C_out)

    dxyz_ref[...] = jnp.zeros((BP, N, 3), jnp.float32)
    if has_feat:
        dfeat_ref[...] = jnp.zeros((BP, N, C_rows - 3), jnp.float32)

    def pass2_body(it, d2):
        g0 = it * g
        ohs, d2 = select_group(d2)
        oh_g, nb, inside = group_gather(ohs)
        xs, zs, _ = mlp_replay(nb)

        # max routing: at winner positions the pooled max equals this
        # slot's post-relu h elementwise, so the last layer's relu mask is
        # the live mask (feats > 0) — losers get dh == 0 regardless
        slot_io = jax.lax.broadcasted_iota(
            jnp.int32, (1, g, 1, 1), 1) + g0
        dh = jnp.where((bestr == slot_io) & live, goutr,
                       0.0).reshape(BP * g * S, C_out)
        for i in range(n_layers - 1, -1, -1):
            if i < n_layers - 1:
                # inner relu mask: the stored cast activation is the relu
                # output (positive iff pre-relu positive)
                dh = dh * (xs[i + 1].astype(jnp.float32) > 0.0)
            # eval-affine BN backward: h = (z - mu) * mul + beta
            grad_refs[4 * i + 2][...] += jnp.sum(dh * (zs[i] - mu[i]),
                                                 axis=0)      # dmul
            grad_refs[4 * i + 3][...] += jnp.sum(dh, axis=0)  # dbias
            dz = dh * mul[i]
            grad_refs[4 * i][...] += jax.lax.dot_general(
                xs[i].astype(jnp.float32), dz, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)           # dW
            grad_refs[4 * i + 1][...] += jnp.sum(dz, axis=0)  # db
            dh = jnp.dot(cast(dz), cast(W[i]).T,
                         preferred_element_type=jnp.float32)
        dnb = dh.reshape(BP, g * S, C_rows)
        # ball mask backward: in-radius slots scatter through the gather
        # (one-hot^T matmul); out-of-radius slots read row 0, so their
        # gradient accumulates there
        dnb_in = jnp.where(inside, dnb, 0.0)
        dscat = jax.lax.dot_general(
            oh_g, dnb_in, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)          # [BP, N, C+3]
        drow0 = jnp.sum(jnp.where(inside, 0.0, dnb), axis=1)  # [BP, C+3]
        dscat = dscat + jnp.where(e_row0, drow0[:, None, :], 0.0)
        dxyz_ref[...] += dscat[..., -3:]
        if has_feat:
            dfeat_ref[...] += dscat[..., :-3]
        return d2

    cross2 = jax.lax.dot_general(
        new_xyz, xyz, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    d2b = jnp.maximum(q2[:, :, None] - 2.0 * cross2 + p2[:, None, :], 0.0)
    jax.lax.fori_loop(0, nsample // g, pass2_body, d2b)


def _stage_bwd_flat(new_xyz, xyz, feat, gout, layers, *, nsample, radius,
                    compute_dtype, block_p, slot_group, interpret):
    """Run the backward kernel over the flat patch batch. Returns
    (dxyz, dfeat | None, per-layer (dW, db, dmul, dbias) tuples)."""
    P, S, _ = new_xyz.shape
    N = xyz.shape[1]
    n_layers = len(layers)
    C_out = layers[-1][0].shape[-1]

    pad = (-P) % block_p
    if pad:
        # zero cotangent on padded rows -> zero gradient contribution
        z = lambda a: jnp.zeros((pad,) + a.shape[1:], a.dtype)
        new_xyz = jnp.concatenate([new_xyz, z(new_xyz)], axis=0)
        xyz = jnp.concatenate([xyz, z(xyz)], axis=0)
        gout = jnp.concatenate([gout, z(gout)], axis=0)
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
    specs.append(pl.BlockSpec((block_p, S, C_out), lambda i: (i, 0, 0)))
    for lay in layers:
        for a in lay:
            args.append(a)
            specs.append(full(a))

    out_specs = [pl.BlockSpec((block_p, N, 3), lambda i: (i, 0, 0))]
    out_shapes = [jax.ShapeDtypeStruct((Pp, N, 3), jnp.float32)]
    if feat is not None:
        C = feat.shape[-1]
        out_specs.append(pl.BlockSpec((block_p, N, C), lambda i: (i, 0, 0)))
        out_shapes.append(jax.ShapeDtypeStruct((Pp, N, C), jnp.float32))
    for w, bb, _mu, _mul, _beta in layers:
        for ref in (w, bb, _mul, _beta):                 # dW, db, dmul, dbias
            out_specs.append(full(ref))
            out_shapes.append(jax.ShapeDtypeStruct(ref.shape, jnp.float32))

    ins = ([new_xyz.astype(jnp.float32), xyz.astype(jnp.float32)]
           + ([feat] if feat is not None else [])
           + [gout.astype(jnp.float32)] + args)
    out = pl.pallas_call(
        functools.partial(
            _stage_bwd_kernel, nsample=nsample, radius=radius,
            n_layers=n_layers, has_feat=feat is not None,
            compute_dtype=compute_dtype, slot_group=slot_group),
        grid=(Pp // block_p,),
        in_specs=specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(*ins)
    dxyz = out[0][:P]
    k = 1
    dfeat = None
    if feat is not None:
        dfeat = out[1][:P]
        k = 2
    grads = out[k:]
    dlayers = tuple((grads[4 * i], grads[4 * i + 1],
                     grads[4 * i + 2], grads[4 * i + 3])
                    for i in range(n_layers))
    return dxyz, dfeat, dlayers


@functools.lru_cache(maxsize=None)
def _make_trainable_stage(nsample, radius, compute_dtype, block_p,
                          block_p_bwd, slot_group, has_feat, interpret):
    """custom_vjp wrapper: fused Pallas forward + per-group-recompute
    Pallas backward, so PPPF training runs the same kernel inference does
    (VERDICT r4 item 2). block_p_bwd stays smaller than block_p: the
    backward holds one slot group's replayed activations plus the gradient
    chain resident at a time."""

    @jax.custom_vjp
    def stage(new_xyz, xyz, feat, layers):
        return pppf_sa_fused(new_xyz, xyz, feat, list(layers),
                             nsample=nsample, radius=radius,
                             compute_dtype=compute_dtype, block_p=block_p,
                             slot_group=slot_group, interpret=interpret)

    def stage_fwd(new_xyz, xyz, feat, layers):
        return stage(new_xyz, xyz, feat, layers), (new_xyz, xyz, feat,
                                                   layers)

    def stage_bwd(res, gout):
        new_xyz, xyz, feat, layers = res
        dxyz, dfeat, dl = _stage_bwd_flat(
            new_xyz, xyz, feat, gout, list(layers), nsample=nsample,
            radius=radius, compute_dtype=compute_dtype,
            block_p=block_p_bwd, slot_group=slot_group, interpret=interpret)
        if feat is not None:
            dfeat = dfeat.astype(feat.dtype)
        # new_xyz: zero gradient (uncentered grouping — it only enters the
        # integer selection and boolean mask); mean: running stat, no grad
        dlayers = tuple(
            (dw, db, jnp.zeros_like(lay[2]), dmul, dbias)
            for (dw, db, dmul, dbias), lay in zip(dl, layers))
        return (jnp.zeros_like(new_xyz), dxyz.astype(xyz.dtype), dfeat,
                dlayers)

    stage.defvjp(stage_fwd, stage_bwd)
    return stage


def pppf_sa_trainable(new_xyz, xyz, feat, layers, *, nsample: int,
                      radius: float, compute_dtype=None, block_p: int = 8,
                      block_p_bwd: int = 4, slot_group: int | None = None,
                      interpret: bool = False):
    """Differentiable fused PN++ SA stage: forward = pppf_sa_fused,
    backward = _stage_bwd_kernel (eval-affine BN — frozen running stats;
    see the backward section comment). Drop-in for the training path."""
    if slot_group is None:
        slot_group = 4 if nsample % 4 == 0 else (
            2 if nsample % 2 == 0 else 1)
    stage = _make_trainable_stage(nsample, radius, compute_dtype, block_p,
                                  block_p_bwd, slot_group,
                                  feat is not None, interpret)
    return stage(new_xyz, xyz, feat, tuple(map(tuple, layers)))
