"""Jitted training step for the PPPF-AE variant (PN++ + FoldingNet).

Same pipeline skeleton as steps.rd_forward (the reference trains both
variants through one loop, train.py:56-68), but the PN++ stages carry
BatchNorm running statistics (pointnet_sa_module.py:49-56), which flax
tracks as a separate `batch_stats` collection threaded through the step.

Note the reference PPPF decoder emits grid_size^2 = d^2 points per patch
(PPPF_AE.py:118-123) regardless of k, so the reassembled cloud has S*d^2
points; chamfer against the N-point input handles the mismatch, exactly as
in the reference (train.py:207-214).
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from pcc_tpu.coding.octree import octree_analyze
from pcc_tpu.coding.pmf import estimate_bits_from_pmf
from pcc_tpu.config import CodecConfig
from pcc_tpu.models.losses import rate_distortion_loss
from pcc_tpu.models.pppf import PPPF_AE, PPPFConditionalProbabilityModel
from pcc_tpu.ops.fps import fps_batch
from pcc_tpu.ops.knn_pruned import grouped_neighbors
from pcc_tpu.ops.normalize import normalize


@struct.dataclass
class PPPFTrainState:
    params: Any        # {"ae": ..., "prob": ...} trainable
    batch_stats: Any   # {"ae": ..., "prob": ...} BN running stats
    opt_state: Any
    step: int

    def apply_gradients(self, grads, tx):
        updates, new_opt = tx.update(grads, self.opt_state, self.params)
        return self.replace(
            params=optax.apply_updates(self.params, updates),
            opt_state=new_opt,
            step=self.step + 1,
        )


def make_pppf_models(cfg: CodecConfig, fused_train: bool = False):
    ae = PPPF_AE(K=cfg.K, k=cfg.k, d=cfg.d, L=cfg.L,
                 fused_train=fused_train)
    prob = PPPFConditionalProbabilityModel(d=cfg.d, L=cfg.L)
    return ae, prob


def init_pppf_params(key: jax.Array, cfg: CodecConfig):
    ae, prob = make_pppf_models(cfg)
    k1, k2 = jax.random.split(key)
    ae_vars = ae.init(k1, jnp.zeros((1, cfg.K, 3), jnp.float32))
    prob_vars = prob.init(k2, jnp.zeros((1, cfg.S, 3), jnp.float32))
    return ae_vars, prob_vars


def create_pppf_state(key: jax.Array, cfg: CodecConfig, tx) -> PPPFTrainState:
    ae_vars, prob_vars = init_pppf_params(key, cfg)
    params = {"ae": ae_vars["params"], "prob": prob_vars["params"]}
    batch_stats = {
        "ae": ae_vars.get("batch_stats", {}),
        "prob": prob_vars.get("batch_stats", {}),
    }
    return PPPFTrainState(
        params=params, batch_stats=batch_stats,
        opt_state=tx.init(params), step=0,
    )


def pppf_forward(params, batch_stats, batch, key, lam, *, cfg: CodecConfig,
                 rate_mode: str = "reference", train: bool = True,
                 fused: bool = False):
    ae, prob = make_pppf_models(cfg, fused_train=fused)
    B, N, _ = batch.shape

    pc01, _, _ = jax.vmap(functools.partial(normalize, margin=cfg.margin))(batch)
    starts = jax.random.randint(key, (B,), 0, N, dtype=jnp.int32)
    idx = fps_batch(pc01, cfg.S, starts)
    sampled = jnp.take_along_axis(pc01, idx[..., None], axis=1)

    octree = jax.vmap(
        functools.partial(octree_analyze, N=cfg.N, min_bpp=cfg.min_bpp,
                          max_depth=cfg.max_depth)
    )(sampled)
    rec_xyz = jax.lax.stop_gradient(octree.rec_xyz)
    skeleton_bits = jnp.sum(octree.total_bits)

    # patch selection has no gradient (patches are data-derived), so the
    # Morton-pruned exact path applies in training too (ops/knn_pruned.py)
    grouped = grouped_neighbors(rec_xyz, pc01, cfg.K, cfg.pruned_knn)
    patches = (grouped - rec_xyz[:, :, None, :]) * cfg.patch_scale
    patches = patches.reshape(B * cfg.S, cfg.K, 3)

    ae_vars = {"params": params["ae"], "batch_stats": batch_stats["ae"]}
    prob_vars = {"params": params["prob"], "batch_stats": batch_stats["prob"]}

    (patches_pred, _, latent_q), ae_mut = ae.apply(
        ae_vars, patches, train=train, mutable=["batch_stats"])
    patches_pred = patches_pred / cfg.patch_scale

    pmf, prob_mut = prob.apply(
        prob_vars, rec_xyz, train=train, mutable=["batch_stats"])
    sym = jnp.clip(
        latent_q.reshape(B, cfg.S, cfg.d) + cfg.L // 2, 0, cfg.L - 1
    ).astype(jnp.int32)
    feature_bits = estimate_bits_from_pmf(pmf, sym)

    if rate_mode == "reference":
        fbpp = feature_bits / (B * N) / (B * N)
        bpp = (skeleton_bits + feature_bits / (B * N)) / (B * N)
    else:
        fbpp = feature_bits / (B * N)
        bpp = (skeleton_bits + feature_bits) / (B * N)

    pts_per_patch = patches_pred.shape[1]
    pc_pred = (
        patches_pred.reshape(B, cfg.S, pts_per_patch, 3) + rec_xyz[:, :, None, :]
    ).reshape(B, cfg.S * pts_per_patch, 3)

    loss, aux = rate_distortion_loss(pc_pred, pc01, fbpp, lam)
    aux["bpp"] = bpp
    aux["true_fbpp"] = feature_bits / (B * N)
    new_stats = {
        "ae": ae_mut.get("batch_stats", batch_stats["ae"]),
        "prob": prob_mut.get("batch_stats", batch_stats["prob"]),
    }
    return loss, (aux, new_stats)


def build_pppf_train_step(cfg: CodecConfig, tx, rate_mode: str = "reference",
                          fused: bool = False):
    """fused=True runs the PN++ SA stages through the fused Pallas
    forward+backward kernels (ops/pppf_sa_pallas.py::pppf_sa_trainable).
    BatchNorm then uses its eval-affine form — running stats are frozen
    for the AE encoder (the CPM still updates its own); see
    cli/train.py's --bn_warmup_steps scheme."""
    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state, batch, key, lam):
        grad_fn = jax.value_and_grad(
            functools.partial(pppf_forward, cfg=cfg, rate_mode=rate_mode,
                              fused=fused),
            has_aux=True,
        )
        (loss, (aux, new_stats)), grads = grad_fn(
            state.params, state.batch_stats, batch, key, lam)
        new_state = state.apply_gradients(grads, tx)
        new_state = new_state.replace(batch_stats=new_stats)
        aux["loss"] = loss
        return new_state, aux

    return train_step
