"""Jitted rate-distortion training step for the patch pipeline.

One compiled program per step covering the reference's entire hot loop
(train.py:156-223): normalize → FPS → octree analysis → KNN patching → AE →
PMF → chamfer + rate → grads → Adam. The reference leaves the octree on the
host (a device→host→device round trip every step, train.py:175-179) and
caps batch_size at 1 ("must be 1", train.py:41); here the whole batch of
clouds — and all S patches of each — advance in one XLA program, so batches
fill the MXU and scale across chips by sharding the batch axis.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from pcc_tpu.coding.octree import octree_analyze
from pcc_tpu.coding.pmf import estimate_bits_from_pmf
from pcc_tpu.codec import make_models
from pcc_tpu.config import CodecConfig
from pcc_tpu.models.losses import rate_distortion_loss
from pcc_tpu.ops.fps import fps_batch
from pcc_tpu.ops.knn_pruned import grouped_neighbors
from pcc_tpu.ops.normalize import normalize


def rd_forward(params, batch, key, lam, *, cfg: CodecConfig,
               rate_mode: str = "reference"):
    """Rate-distortion loss for a batch of clouds [B, N, 3].

    rate_mode:
      "reference" — replicate the reference's rate normalization, which
        divides the bit count by (B*N) twice (train.py:201-205): with the
        default lambda=1e-6 the rate gradient is ~1e-14-scale, so training is
        effectively distortion-only and the probability model stays near its
        init. This is the published behavior (the committed eval CSV's 0.64
        bpp comes from a near-uniform PMF) and is the default for parity.
      "fixed" — single division: fbpp = bits/(B*N), a true bits-per-point.
        The rate term then actually trains the conditional probability
        model, lowering bpp below the reference at matched distortion.
    """
    ae, prob = make_models(cfg)
    B, N, _ = batch.shape

    pc01, _, _ = jax.vmap(functools.partial(normalize, margin=cfg.margin))(batch)

    starts = jax.random.randint(key, (B,), 0, N, dtype=jnp.int32)
    idx = fps_batch(pc01, cfg.S, starts)
    sampled = jnp.take_along_axis(pc01, idx[..., None], axis=1)      # [B, S, 3]

    octree = jax.vmap(
        functools.partial(octree_analyze, N=cfg.N, min_bpp=cfg.min_bpp,
                          max_depth=cfg.max_depth)
    )(sampled)
    rec_xyz = jax.lax.stop_gradient(octree.rec_xyz)                  # [B, S, 3]
    skeleton_bits = jnp.sum(octree.total_bits)

    # patch selection has no gradient (patches are data-derived), so the
    # Morton-pruned exact path applies in training too (ops/knn_pruned.py)
    grouped = grouped_neighbors(rec_xyz, pc01, cfg.K, cfg.pruned_knn)
    patches = (grouped - rec_xyz[:, :, None, :]) * cfg.patch_scale
    patches = patches.reshape(B * cfg.S, cfg.K, 3)

    patches_pred, _, latent_q = ae.apply(params["ae"], patches)
    patches_pred = patches_pred / cfg.patch_scale

    pmf = prob.apply(params["prob"], rec_xyz)                        # [B, S, d, L]
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

    pc_pred = (
        patches_pred.reshape(B, cfg.S, cfg.k, 3) + rec_xyz[:, :, None, :]
    ).reshape(B, cfg.S * cfg.k, 3)

    loss, aux = rate_distortion_loss(pc_pred, pc01, fbpp, lam)
    aux["bpp"] = bpp
    aux["true_fbpp"] = feature_bits / (B * N)
    return loss, aux


def build_train_step(cfg: CodecConfig, tx, rate_mode: str = "reference"):
    """Returns jitted (state, batch [B,N,3], key, lam) -> (state, metrics).
    The incoming state's buffers are donated to the update."""

    @functools.partial(jax.jit, donate_argnums=(0,))
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
