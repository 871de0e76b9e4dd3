"""Jitted training step for the PPPE whole-cloud pipeline.

Replicates the reference loop semantics (train_pppe_pcd_ae.py:171-251):
chamfer distortion + lambda-warmed, clamped rate term (which carries no
gradient — pppe_pcd_ae.py:889-917), global-norm gradient clipping at 1.0,
NaN/Inf step skip, and a per-epoch cosine learning-rate schedule (T_max
100). The cosine factor is computed host-side per epoch and injected
through optax.inject_hyperparams.
"""

from __future__ import annotations

import functools
import math
from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from pcc_tpu.config import PPPEConfig
from pcc_tpu.models.pppe import (
    PointCloudAE,
    estimate_bits_per_point_conditional,
)
from pcc_tpu.ops.chamfer import chamfer_distance


@struct.dataclass
class PPPETrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: int

    def apply_gradients(self, grads, tx):
        updates, new_opt = tx.update(grads, self.opt_state, self.params)
        return self.replace(
            params=optax.apply_updates(self.params, updates),
            opt_state=new_opt,
            step=self.step + 1,
        )


def make_pppe_model(cfg: PPPEConfig, fused: bool = False) -> PointCloudAE:
    """fused=True enables the inference-only fused Pallas SA stages
    (models/pppe.py::PointNetSetAbstractionKNN.fused) — the compress /
    eval CLIs pass it; training paths leave it off."""
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None
    return PointCloudAE(latent_dim=cfg.latent_dim, latent_bins=cfg.L,
                        npoints=cfg.N, dtype=dtype, fused=fused)


def make_pppe_optimizer(lr: float, grad_clip: float = 1.0):
    """Adam + global-norm clip, with an injectable learning rate for the
    per-epoch cosine schedule (train_pppe:172,278)."""
    return optax.inject_hyperparams(
        lambda learning_rate: optax.chain(
            optax.clip_by_global_norm(grad_clip),
            optax.adam(learning_rate),
        )
    )(learning_rate=lr)


def cosine_epoch_lr(base_lr: float, epoch: int, t_max: int = 100,
                    eta_min: float = 0.0) -> float:
    """CosineAnnealingLR stepped once per epoch (train_pppe:249,278)."""
    return eta_min + (base_lr - eta_min) * (
        1 + math.cos(math.pi * (epoch % (2 * t_max)) / t_max)) / 2


def set_lr(state: PPPETrainState, lr: float) -> PPPETrainState:
    hp = dict(state.opt_state.hyperparams)
    hp["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return state.replace(opt_state=state.opt_state._replace(hyperparams=hp))


def create_pppe_state(key: jax.Array, cfg: PPPEConfig, tx) -> PPPETrainState:
    model = make_pppe_model(cfg)
    variables = model.init(key, jnp.zeros((1, cfg.N, 3), jnp.float32),
                           method=PointCloudAE.init_all)
    # Only a single "ae" entry: the prob model is a submodule, so it is
    # included in the one optimizer exactly as in train_pppe:274-276.
    params = {"ae": variables["params"]}
    batch_stats = {"ae": variables.get("batch_stats", {})}
    return PPPETrainState(params=params, batch_stats=batch_stats,
                          opt_state=tx.init(params), step=0)


def pppe_forward(params, batch_stats, batch, lam_eff, *, cfg: PPPEConfig,
                 max_rate: float = 100.0):
    model = make_pppe_model(cfg)
    variables = {"params": params["ae"], "batch_stats": batch_stats["ae"]}
    (coarse, fine, cond_feats, y_q), mut = model.apply(
        variables, batch, train=True, mutable=["batch_stats"])

    fbpp = estimate_bits_per_point_conditional(
        {"params": params["ae"], "batch_stats": mut["batch_stats"]},
        model, y_q, cond_feats)

    # fast MXU-expansion neighbor search; loss recomputed exactly through
    # the gather (ops/chamfer.py::chamfer_distance, fast_search)
    dist, _ = chamfer_distance(fine, batch, fast_search=True)
    rate = jnp.clip(fbpp, 0.0, max_rate)
    loss = dist + lam_eff * rate
    aux = {"dist": dist, "rate": rate}
    return loss, (aux, {"ae": mut["batch_stats"]})


def build_pppe_train_step(cfg: PPPEConfig, tx):
    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state, batch, lam_eff):
        grad_fn = jax.value_and_grad(
            functools.partial(pppe_forward, cfg=cfg), has_aux=True)
        (loss, (aux, new_stats)), grads = grad_fn(
            state.params, state.batch_stats, batch, lam_eff)

        # NaN/Inf anomaly: skip the update entirely (train_pppe:207-209)
        ok = jnp.isfinite(loss)
        updated = state.apply_gradients(grads, tx).replace(batch_stats=new_stats)
        new_state = jax.tree.map(lambda a, b: jnp.where(ok, a, b), updated, state)
        aux["loss"] = loss
        aux["skipped"] = ~ok
        return new_state, aux

    return train_step
