"""Device-mesh data parallelism for training and batch compression.

The reference has no distributed execution at all (SURVEY.md §2.5): one
device, batch hard-capped at 1. Here the cloud batch axis is a named mesh
axis: params are replicated, batches sharded, and XLA inserts the psum for
gradient averaging over ICI. The same mesh scales batch compression (each
chip encodes different clouds) — no NCCL/MPI anywhere, just
jax.sharding + jit's SPMD partitioner.

Patch axes stay *inside* each cloud's program (vmap), so the layout
composes: mesh ('data',) today, ('data', 'model') later if a model ever
outgrows one chip (these models are a few M params — they won't).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pcc_tpu.config import CodecConfig


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def shard_batch(mesh: Mesh, batch, axis: str = "data"):
    """Place [B, ...] host array with B split across the mesh axis."""
    return jax.device_put(batch, NamedSharding(mesh, P(axis)))


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params / opt state) across the mesh."""
    return jax.device_put(tree, NamedSharding(mesh, P()))


def build_sharded_encode(cfg: CodecConfig, mesh: Mesh, axis: str = "data"):
    """Data-parallel batch compression: each chip encodes a shard of the
    cloud batch (the multi-chip replacement for the reference's serial
    per-cloud loop, compress.py:78-155). Params replicated, clouds and FPS
    starts sharded; every field of the EncodeResult comes back sharded the
    same way, so the host serializer just iterates."""
    from pcc_tpu.codec import encode_clouds

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(axis))

    return jax.jit(
        functools.partial(encode_clouds, cfg=cfg),
        in_shardings=(repl, repl, data, data),
        out_shardings=data,
    )


def build_sharded_decode(cfg: CodecConfig, mesh: Mesh, axis: str = "data"):
    """Data-parallel batch decompression: the decode-side mirror of
    build_sharded_encode. Returns (cdf_fn, dec_fn):

      cdf_fn(prob_params, rec_xyz [B, S, 3]) -> cdf [B, S, d, L+1]
      dec_fn(ae_params, sym [B, S, d], rec_xyz, center [B, 3], longest [B])
        -> clouds [B, S*k, 3]

    Params replicated, per-cloud arrays sharded over `axis`. NOTE: this is
    the FLOAT cdf path — a stream must be decoded with the cdf program of
    the mesh shape that encoded it (across different compilations the
    quantized rows can differ by one bin at round-to-nearest boundaries,
    tested/bounded in test_parallel.py). The default coding path no longer
    has this fragility: build_sharded_pmf_weights / cdf_mode="integer"
    (coding/iprob.py) is bit-exact across topologies. This builder remains
    for the PPPF family, whose PN++ prob backbone is not integerized."""
    from pcc_tpu.codec import decode_cloud, skeleton_cdf

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(axis))

    cdf_fn = jax.jit(
        jax.vmap(functools.partial(skeleton_cdf, cfg=cfg), in_axes=(None, 0)),
        in_shardings=(repl, data),
        out_shardings=data,
    )
    dec_fn = jax.jit(
        jax.vmap(functools.partial(decode_cloud, cfg=cfg),
                 in_axes=(None, 0, 0, 0, 0)),
        in_shardings=(repl, data, data, data, data),
        out_shardings=data,
    )
    return cdf_fn, dec_fn


def build_sharded_pmf_weights(iprob_bundle, mesh: Mesh, axis: str = "data",
                              cfg: CodecConfig = None):
    """Data-parallel deterministic coding-CDF weights (coding/iprob.py):
    rec_xyz [B, S, 3] sharded over `axis` -> uint16 Q16 PMF weights
    [B, S, d, L] sharded the same way.

    Because the integer spec is bit-exact on every backend/compilation,
    streams coded with these weights on ANY mesh shape decode on ANY other
    (tested: 8-device encode -> fresh single-device decode, byte-identical;
    tests/test_parallel.py). This removes the float path's ±1-bin
    cross-compilation drift documented on build_sharded_decode."""
    import jax.numpy as jnp

    from pcc_tpu.codec import skeleton_pmf_weights

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(axis))
    bundle = jax.device_put(jax.tree.map(jnp.asarray, iprob_bundle), repl)
    # cfg selects the model family (None = IPDAE, d/L from the bundle);
    # PPPF bundles need it because their leaves don't carry d/L statically
    return jax.jit(lambda recs: skeleton_pmf_weights(bundle, recs, cfg=cfg),
                   in_shardings=(data,), out_shardings=data)


def build_sharded_pppf_train_step(cfg: CodecConfig, tx, mesh: Mesh,
                                  rate_mode: str = "reference",
                                  axis: str = "data"):
    """Data-parallel PPPF-AE (PN++ + FoldingNet) training step.

    Same sharding layout as the IPDAE step. BatchNorm reductions run under
    jit's SPMD partitioner, so the batch statistics are *global* means over
    the full sharded batch (XLA inserts the cross-chip reductions) — no
    axis_name plumbing needed."""
    from pcc_tpu.train.steps_pppf import pppf_forward

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(axis))

    @functools.partial(
        jax.jit,
        in_shardings=(repl, data, repl, repl),
        out_shardings=(repl, repl),
    )
    def train_step(state, batch, key, lam):
        grad_fn = jax.value_and_grad(
            functools.partial(pppf_forward, cfg=cfg, rate_mode=rate_mode),
            has_aux=True,
        )
        (loss, (aux, new_stats)), grads = grad_fn(
            state.params, state.batch_stats, batch, key, lam)
        new_state = state.apply_gradients(grads, tx)
        new_state = new_state.replace(batch_stats=new_stats)
        aux["loss"] = loss
        return new_state, aux

    return train_step


def build_sharded_pppe_train_step(pppe_cfg, tx, mesh: Mesh, axis: str = "data"):
    """Data-parallel PPPE whole-cloud training step (batch sharded over the
    mesh; the in-jit NaN skip and clipped rate semantics are unchanged)."""
    from pcc_tpu.train.steps_pppe import pppe_forward

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(axis))

    @functools.partial(
        jax.jit,
        in_shardings=(repl, data, repl),
        out_shardings=(repl, repl),
    )
    def train_step(state, batch, lam_eff):
        grad_fn = jax.value_and_grad(
            functools.partial(pppe_forward, cfg=pppe_cfg), has_aux=True)
        (loss, (aux, new_stats)), grads = grad_fn(
            state.params, state.batch_stats, batch, lam_eff)
        # reference semantics: skip the whole update on NaN/Inf loss
        # (train_pppe_pcd_ae.py:207-209) — same tree-where as the
        # single-device step so sharded and local runs stay equivalent
        ok = jnp.isfinite(loss)
        updated = state.apply_gradients(grads, tx).replace(batch_stats=new_stats)
        new_state = jax.tree.map(lambda a, b: jnp.where(ok, a, b), updated, state)
        aux["loss"] = loss
        aux["skipped"] = ~ok
        return new_state, aux

    return train_step


def build_sharded_train_step(cfg: CodecConfig, tx, mesh: Mesh,
                             rate_mode: str = "reference", axis: str = "data"):
    """Data-parallel version of train.steps.build_train_step.

    Batch is sharded over `axis`; params/opt-state replicated. The mean in
    the loss makes jit emit a gradient all-reduce over ICI automatically.
    """
    from pcc_tpu.train.steps import rd_forward

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(axis))

    @functools.partial(
        jax.jit,
        in_shardings=(repl, data, repl, repl),
        out_shardings=(repl, repl),
    )
    def train_step(state, batch, key, lam):
        grad_fn = jax.value_and_grad(
            functools.partial(rd_forward, cfg=cfg, rate_mode=rate_mode),
            has_aux=True,
        )
        (loss, aux), grads = grad_fn(state.params, batch, key, lam)
        new_state = state.apply_gradients(grads, tx)
        aux["loss"] = loss
        return new_state, aux

    return train_step
