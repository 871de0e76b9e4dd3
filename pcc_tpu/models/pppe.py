"""PPPE fast whole-cloud autoencoder family.

TPU-native counterpart of the *live* classes in reference pppe_pcd_ae.py
(the ~330 LoC of dead `_v1`/Enhanced duplicates at pppe_pcd_ae.py:29-136,
184-260, 275-349 are deliberately not replicated — SURVEY.md §7).

Pipeline (train_pppe_pcd_ae.py:43-49, pppe_pcd_ae.py:843-877): a stacked
PN++ encoder (one MSG stage + two single-scale stages, KNN grouping) maps
the whole cloud to a global latent; the latent is tiled per point,
straight-through quantized into L bins, dequantized, mean-collapsed back to
a global code and decoded by a small PCN-style decoder. No octree, no
patches, no arithmetic coding — the "compressed" file is raw float32
latents (pppe_pcd_compress.py:36-41).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from pcc_tpu.models.layers import PointwiseMLP, TorchDense
from pcc_tpu.ops.fps import fps_batch
from pcc_tpu.ops.knn import index_points, knn_points


def quantize_st(x: jnp.ndarray, min_val: float, max_val: float,
                levels: int) -> jnp.ndarray:
    """Clamp -> scale to [0, levels-1] -> STE round -> clamp
    (pppe_pcd_ae.py:719-735)."""
    x_c = jnp.clip(x, min_val, max_val)
    scaled = (x_c - min_val) / (max_val - min_val + 1e-9) * (levels - 1)
    rounded = jnp.round(scaled)
    y = jax.lax.stop_gradient(rounded - scaled) + scaled
    return jnp.clip(y, 0, levels - 1)


class PointNetSetAbstractionKNN(nn.Module):
    """KNN-grouping SA block (pppe_pcd_ae.py:573-614): FPS -> KNN -> center
    -> MLP(+BN) -> max over K."""

    npoint: int
    K: int
    mlp: Sequence[int]
    use_bn: bool = True
    dtype: Any = None
    # Inference-only fused Pallas path (ops/pppf_sa_pallas.py with
    # layout="pppe": KNN selection + gather + center + Conv/BN/ReLU + max
    # in one VMEM-resident kernel). Engaged for the deep stages (N <= a
    # few hundred); the whole-cloud MSG stage keeps XLA selection (an
    # 8192-lane iterative argmin would be VPU-bound — the knn_pallas
    # lesson). No backward rule — leave False for training.
    fused: bool = False

    @nn.compact
    def __call__(self, xyz, features=None, train: bool = False,
                 precomputed=None):
        """precomputed: optional (new_xyz, knn_idx, grouped_xyz) at
        K' >= self.K from a sibling branch sharing centroids (MSG) — the
        leading self.K slots of a sorted larger top-k are exactly this
        branch's knn_points result, so one selection serves all scales."""
        B, N, _ = xyz.shape
        if precomputed is not None:
            new_xyz, knn_idx, grouped_xyz = precomputed
            knn_idx = knn_idx[..., : self.K]
            grouped_xyz = grouped_xyz[:, :, : self.K]
        else:
            if self.npoint == N:
                new_xyz = xyz
            else:
                idx = fps_batch(xyz, self.npoint,
                                jnp.zeros((xyz.shape[0],), jnp.int32))
                new_xyz = index_points(xyz, idx)
            knn_idx = grouped_xyz = None

        mlp = PointwiseMLP(self.mlp, use_bn=self.use_bn, dtype=self.dtype,
                           name="mlp")
        from pcc_tpu.ops.pallas_gate import pallas_gate

        use_fused, interp = pallas_gate()
        if (self.fused and not train and self.use_bn and xyz.ndim == 3
                and precomputed is None and use_fused):
            from pcc_tpu.ops.pppf_sa_pallas import fold_bn, pppf_sa_fused

            C_in = 3 + (features.shape[-1] if features is not None else 0)
            wb = mlp(jnp.zeros((1, C_in), jnp.float32), probe=True)
            layers = [(w, b) + fold_bn(bn_p, bn_s)
                      for w, b, bn_p, bn_s in wb]
            out = pppf_sa_fused(
                new_xyz, xyz,
                None if features is None else features.astype(jnp.float32),
                layers, nsample=self.K, radius=0.0, layout="pppe",
                compute_dtype=self.dtype, interpret=interp)
            return new_xyz, (out.astype(self.dtype) if self.dtype else out)

        if knn_idx is None:
            _, knn_idx, grouped_xyz = knn_points(new_xyz, xyz, K=self.K,
                                                 return_nn=True)
        grouped = grouped_xyz - new_xyz[:, :, None, :]
        if features is not None:
            grouped = jnp.concatenate(
                [grouped, index_points(features, knn_idx)], axis=-1)
        out = mlp(grouped, train)
        return new_xyz, jnp.max(out, axis=2)


class PointNetSetAbstractionMSG(nn.Module):
    """Multi-scale grouping: concat several KNN-SA branches over the same
    centroids (pppe_pcd_ae.py:617-632)."""

    npoint: int
    scales: Sequence[dict]
    use_bn: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, xyz, features=None, train: bool = False):
        # One FPS + one top-Kmax KNN shared across branches: a sorted
        # larger top-k's leading K' slots ARE the K'-branch's knn_points
        # result (same values, same tie order), so the expensive
        # whole-cloud selection runs once instead of per scale. Byte-equal
        # to the per-branch form.
        B, N, _ = xyz.shape
        if self.npoint == N:
            new_xyz = xyz
        else:
            idx = fps_batch(xyz, self.npoint,
                            jnp.zeros((xyz.shape[0],), jnp.int32))
            new_xyz = index_points(xyz, idx)
        k_max = max(sc["K"] for sc in self.scales)
        _, knn_idx, grouped_xyz = knn_points(new_xyz, xyz, K=k_max,
                                             return_nn=True)

        outs = []
        for i, sc in enumerate(self.scales):
            branch = PointNetSetAbstractionKNN(
                npoint=self.npoint, K=sc["K"], mlp=tuple(sc["mlp"]),
                use_bn=self.use_bn, dtype=self.dtype, name=f"branch_{i}")
            _, feat = branch(xyz, features, train,
                             precomputed=(new_xyz, knn_idx, grouped_xyz))
            outs.append(feat)
        return new_xyz, jnp.concatenate(outs, axis=-1)


class PointNet2EncoderFull(nn.Module):
    """Stacked SA encoder -> (latent [B, latent_dim], global feature
    [B, 512]) (pppe_pcd_ae.py:637-686). Default stack matches the
    reference: MSG(512; K16/K32) -> SS(128, K32) -> SS(32, K32)."""

    latent_dim: int = 256
    use_bn: bool = True
    dtype: Any = None
    fused: bool = False   # see PointNetSetAbstractionKNN.fused (sa2/sa3)

    @nn.compact
    def __call__(self, x, train: bool = False):
        xyz, feat = PointNetSetAbstractionMSG(
            npoint=512,
            scales=({"K": 16, "mlp": (32, 32, 64)}, {"K": 32, "mlp": (64, 64, 128)}),
            use_bn=self.use_bn, dtype=self.dtype, name="sa1")(x, None, train)
        xyz, feat = PointNetSetAbstractionKNN(
            npoint=128, K=32, mlp=(128, 128, 256),
            use_bn=self.use_bn, dtype=self.dtype, fused=self.fused,
            name="sa2")(xyz, feat, train)
        xyz, feat = PointNetSetAbstractionKNN(
            npoint=32, K=32, mlp=(256, 256, 512),
            use_bn=self.use_bn, dtype=self.dtype, fused=self.fused,
            name="sa3")(xyz, feat, train)
        global_feat = jnp.max(feat, axis=1)                  # [B, 512]
        h = TorchDense(512, use_bias=False, dtype=self.dtype,
                       name="gc0")(global_feat)
        if self.use_bn:
            h = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                             name="gc_bn")(h)
        h = nn.relu(h)
        # quantize_st downstream stays exact float32
        latent = TorchDense(self.latent_dim, dtype=self.dtype,
                            name="gc1")(h).astype(jnp.float32)
        return latent, global_feat.astype(jnp.float32)


class PCNDecoderSmall(nn.Module):
    """latent -> coarse [B, Cc, 3] -> fine [B, N, 3]
    (pppe_pcd_ae.py:691-714)."""

    latent_dim: int = 256
    coarse_points: int = 512
    final_points: int = 8192
    dtype: Any = None

    @nn.compact
    def __call__(self, latent):
        B = latent.shape[0]
        h = nn.relu(TorchDense(512, dtype=self.dtype, name="fc0")(latent))
        coarse = TorchDense(self.coarse_points * 3, dtype=self.dtype,
                            name="fc1")(h)
        coarse = coarse.reshape(B, self.coarse_points, 3).astype(jnp.float32)
        expand_in = jnp.concatenate([coarse.reshape(B, -1), latent], axis=1)
        h = nn.relu(TorchDense(1024, dtype=self.dtype, name="exp0")(expand_in))
        fine = TorchDense(self.final_points * 3, dtype=self.dtype,
                          name="exp1")(h).astype(jnp.float32)
        return coarse, fine.reshape(B, self.final_points, 3)


class PPPEConditionalProbabilityModel(nn.Module):
    """Per-point conditional distributions (pppe_pcd_ae.py:740-801).

    y [B, d, N] latent channels + cond feats [B, F] (or [B, F, N]) ->
    (mean [B, d, N], scale [B, d, N], pmf [B, K_bins, N]).
    Channels-first in/out to mirror the reference's Conv1d contract.
    """

    feature_dim: int = 512
    hidden_channels: int = 128
    latent_bins: int = 16
    latent_channels: int = 3

    @nn.compact
    def __call__(self, y, cond_feats):
        B, d, N = y.shape
        if cond_feats.ndim == 2:
            h = nn.relu(TorchDense(self.hidden_channels, name="cond0")(cond_feats))
            cond = TorchDense(self.hidden_channels, name="cond1")(h)
            cond = jnp.repeat(cond[:, :, None], N, axis=2)   # [B, H, N]
        elif cond_feats.ndim == 3:
            cond = cond_feats
        else:
            raise ValueError("cond_feats must be (B,F) or (B,F,N)")

        x = jnp.concatenate([y, cond], axis=1)               # [B, d+H, N]
        x = jnp.swapaxes(x, 1, 2)                            # [B, N, d+H]
        h = TorchDense(self.hidden_channels, name="comb0")(x)
        h = TorchDense(self.hidden_channels, name="comb1")(nn.relu(h))

        mean = jnp.swapaxes(TorchDense(self.latent_channels, name="mean")(h), 1, 2)
        scale = jax.nn.softplus(
            jnp.swapaxes(TorchDense(self.latent_channels, name="scale")(h), 1, 2)
        ) + 1e-6
        pmf_logits = jnp.swapaxes(TorchDense(self.latent_bins, name="pmf")(h), 1, 2)
        pmf = jnp.clip(jax.nn.softmax(pmf_logits, axis=1), 1e-9)
        return mean, scale, pmf


class PointCloudAE(nn.Module):
    """Whole-cloud AE wrapper (pppe_pcd_ae.py:843-877): encoder -> tile
    latent per point -> quantize_st -> dequantize -> mean-collapse ->
    decoder. Returns (coarse, fine, cond_feats, y_q)."""

    latent_dim: int = 64
    latent_bins: int = 16
    npoints: int = 8192
    dtype: Any = None
    fused: bool = False   # see PointNetSetAbstractionKNN.fused

    def setup(self):
        self.encoder = PointNet2EncoderFull(latent_dim=self.latent_dim,
                                            dtype=self.dtype,
                                            fused=self.fused)
        self.decoder = PCNDecoderSmall(
            latent_dim=self.latent_dim, coarse_points=512,
            final_points=self.npoints, dtype=self.dtype)
        self.prob = PPPEConditionalProbabilityModel(
            feature_dim=512, hidden_channels=128,
            latent_bins=self.latent_bins, latent_channels=self.latent_dim)
        self.q_min = 0.0
        self.q_max = self.latent_bins - 1.0

    def __call__(self, x, train: bool = False):
        B, N, _ = x.shape
        latent, cond_feats = self.encoder(x, train)
        y = jnp.repeat(latent[:, :, None], N, axis=2)        # [B, d, N]
        y_q = quantize_st(y, self.q_min, self.q_max, self.latent_bins)
        y_dequant = (y_q / (self.latent_bins - 1)) * (self.q_max - self.q_min) + self.q_min
        y_global = jnp.mean(y_dequant, axis=2)               # [B, d]
        coarse, fine = self.decoder(y_global)
        return coarse, fine, cond_feats, y_q

    def init_all(self, x):
        """Init-time forward touching every submodule: flax materializes
        parameters lazily at first call, and __call__ never invokes
        self.prob (the rate estimator calls it out-of-band,
        train_pppe:200-201), so plain init would leave prob param-less —
        unlike torch, which registers submodule params at construction."""
        coarse, fine, cond_feats, y_q = self(x)
        self.prob(y_q, cond_feats)
        return coarse, fine, cond_feats, y_q


def estimate_bits_per_point_conditional(variables, model: PointCloudAE,
                                        y_q, cond_feats):
    """Detached rate estimate (pppe_pcd_ae.py:882-917): pmf from the prob
    model, probability gathered at the *channel-0* symbol only, mean
    -log2 p. The stop_gradient replicates the reference's no_grad +
    .detach() — the rate term carries NO gradient, so PPPE training is
    effectively pure chamfer (SURVEY.md §3.5)."""
    y_q = jax.lax.stop_gradient(y_q)
    cond_feats = jax.lax.stop_gradient(cond_feats)
    _, _, pmf = model.apply(variables, y_q, cond_feats,
                            method=lambda m, a, b: m.prob(a, b))
    K = pmf.shape[1]
    idx0 = jnp.clip(y_q[:, 0, :].astype(jnp.int32), 0, K - 1)   # [B, N]
    probs = jnp.take_along_axis(pmf, idx0[:, None, :], axis=1)  # [B, 1, N]
    bits = -jnp.log2(jnp.clip(probs, 1e-9))
    return jax.lax.stop_gradient(jnp.mean(bits))
