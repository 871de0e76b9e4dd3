"""PPPF-AE: PointNet++ encoder + FoldingNet decoder patch autoencoder.

TPU-native counterpart of reference PPPF_AE.py + pointnet_sa_module.py.
Same stage configuration (PPPF_AE.py:29-37,115-126) and BatchNorm placement
(pointnet_sa_module.py:49-56); FPS/ball-query/grouping run as compiled ops
from pcc_tpu.ops instead of pytorch3d CUDA kernels.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from pcc_tpu.models.layers import PointwiseMLP, TorchDense, sigmoid_spread, ste_round
from pcc_tpu.ops.fps import fps_batch
from pcc_tpu.ops.knn import ball_query, knn_gather, index_points


class PointnetSAModule(nn.Module):
    """Canonical PN++ set abstraction: FPS -> ball query -> group(+xyz) ->
    Conv+BN+ReLU stack -> max over samples (pointnet_sa_module.py:38-93).

    [B, N, 3] xyz (+ optional [B, N, C] features) ->
    ([B, npoint, 3], [B, npoint, mlp[-1]]).
    """

    npoint: int
    radius: float
    nsample: int
    mlp: Sequence[int]
    use_bn: bool = True
    dtype: Any = None
    # Inference-only fused Pallas path (ops/pppf_sa_pallas.py): ball-KNN +
    # gather + Conv/BN/ReLU stack + sample-max in one VMEM-resident kernel,
    # skipping the [B, S, ns, C] HBM intermediates (~4 GB per 16-cloud
    # PPPF compress batch). No backward rule and BN running stats only —
    # leave False for training; the Codec enables it for PPPF-AE.
    fused: bool = False
    # Trainable fused path (custom-VJP backward kernel, VERDICT r4 item 2):
    # same forward kernel, per-group-recompute backward
    # (ops/pppf_sa_pallas.py::pppf_sa_trainable). BN runs in its
    # eval-affine form (frozen running stats, gradients to scale/bias) —
    # use after a warmup of XLA steps has populated the running stats
    # (cli/train.py --bn_warmup_steps). Stats do NOT update while fused.
    fused_train: bool = False

    @nn.compact
    def __call__(self, xyz, features=None, train: bool = False):
        if self.npoint == xyz.shape[1]:
            new_xyz = xyz
        else:
            idx = fps_batch(xyz, self.npoint,
                            jnp.zeros((xyz.shape[0],), jnp.int32))
            new_xyz = index_points(xyz, idx)

        mlp = PointwiseMLP(self.mlp, use_bn=self.use_bn, dtype=self.dtype,
                           name="mlp")
        from pcc_tpu.ops.pallas_gate import pallas_gate

        use_fused, interp = pallas_gate()
        fused_now = (self.fused and not train) or (self.fused_train and train)
        if fused_now and self.use_bn and xyz.ndim == 3 and use_fused:
            from pcc_tpu.ops.pppf_sa_pallas import (fold_bn, pppf_sa_fused,
                                                    pppf_sa_trainable)

            C_in = 3 + (features.shape[-1] if features is not None else 0)
            wb = mlp(jnp.zeros((1, C_in), jnp.float32), probe=True)
            layers = [(w, b) + fold_bn(bn_p, bn_s)
                      for w, b, bn_p, bn_s in wb]
            fn = pppf_sa_trainable if train else pppf_sa_fused
            out = fn(
                new_xyz, xyz,
                None if features is None else features.astype(jnp.float32),
                layers, nsample=self.nsample, radius=self.radius,
                compute_dtype=self.dtype, interpret=interp)
            # match the XLA path's output dtype (kernel accumulates f32)
            return new_xyz, (out.astype(self.dtype) if self.dtype else out)

        group_idx = ball_query(new_xyz, xyz, K=self.nsample, radius=self.radius)
        grouped_xyz = knn_gather(xyz, group_idx)             # [B, S, ns, 3]
        if features is not None:
            grouped_feat = knn_gather(features, group_idx)
            grouped = jnp.concatenate([grouped_feat, grouped_xyz], axis=-1)
        else:
            grouped = grouped_xyz

        out = mlp(grouped, train)
        return new_xyz, jnp.max(out, axis=2)                 # [B, S, mlp[-1]]


class PointNetPP(nn.Module):
    """3-stage PN++ encoder -> global feature [B, feature_dim]
    (PPPF_AE.py:9-46). Default stage shapes match the reference exactly,
    including the leading 3->3 conv produced by its `[3] + sa1_mlp` list."""

    points: int = 512
    sa1_mlp: Sequence[int] = (64, 64, 128)
    sa2_mlp: Sequence[int] = (128, 128, 128, 256)
    sa3_mlp: Sequence[int] = (256, 256, 512)
    feature_dim: int = 1024
    use_bn: bool = True
    dtype: Any = None
    fused: bool = False          # see PointnetSAModule.fused
    fused_train: bool = False    # see PointnetSAModule.fused_train

    @nn.compact
    def __call__(self, xyz, train: bool = False):
        sa1 = PointnetSAModule(
            npoint=self.points, radius=0.2, nsample=32,
            mlp=(3,) + tuple(self.sa1_mlp), use_bn=self.use_bn,
            dtype=self.dtype, fused=self.fused,
            fused_train=self.fused_train, name="sa1")
        sa2 = PointnetSAModule(
            npoint=128, radius=0.4, nsample=64,
            mlp=tuple(self.sa2_mlp), use_bn=self.use_bn,
            dtype=self.dtype, fused=self.fused,
            fused_train=self.fused_train, name="sa2")
        sa3 = PointnetSAModule(
            npoint=32, radius=0.8, nsample=128,
            mlp=tuple(self.sa3_mlp) + (self.feature_dim,),
            use_bn=self.use_bn, dtype=self.dtype, fused=self.fused,
            fused_train=self.fused_train, name="sa3")
        xyz, feat = sa1(xyz, None, train)
        xyz, feat = sa2(xyz, feat, train)
        xyz, feat = sa3(xyz, feat, train)
        return xyz, jnp.max(feat, axis=1)                    # [B, feature_dim]


class FoldingNet(nn.Module):
    """Two-stage folding decoder over a grid_size^2 2D grid in [-1,1]^2
    (PPPF_AE.py:50-109). [B, F] latent -> [B, grid_size^2, 3]."""

    points: int = 512         # width of the first folding MLP
    grid_size: int = 45
    feature_dim: int = 1024
    dtype: Any = None

    @nn.compact
    def __call__(self, latent):
        B = latent.shape[0]
        n = self.grid_size * self.grid_size
        line = jnp.linspace(-1.0, 1.0, self.grid_size)
        gx, gy = jnp.meshgrid(line, line, indexing="ij")
        grid = jnp.stack([gx, gy], axis=-1).reshape(1, n, 2)
        grid = jnp.broadcast_to(grid, (B, n, 2))

        tiled = jnp.repeat(latent[:, None, :], n, axis=1)    # [B, n, F]
        fold1 = PointwiseMLP((self.points, self.points, 3),
                             relu=(True, True, False), dtype=self.dtype,
                             name="mlp1")
        coarse = fold1(jnp.concatenate([grid, tiled], axis=-1).astype(
            self.dtype or jnp.float32))
        fold2 = PointwiseMLP((128, 128, 3), relu=(True, True, False),
                             dtype=self.dtype, name="mlp2")
        out = fold2(jnp.concatenate([coarse, tiled.astype(coarse.dtype)],
                                    axis=-1))
        return out.astype(jnp.float32)


class PPPF_AE(nn.Module):
    """PN++ encoder -> project to d -> STE quantize -> project back ->
    FoldingNet with grid_size=d, so the output patch has d^2 points
    (PPPF_AE.py:114-150; with the defaults d=16 -> 256 = K points)."""

    K: int = 512
    k: int = 0          # unused; kept for train-CLI signature parity
    d: int = 16
    L: int = 7
    dim: int = 1024
    dtype: Any = None
    fused: bool = False          # see PointnetSAModule.fused
    fused_train: bool = False    # see PointnetSAModule.fused_train

    def setup(self):
        self.encoder = PointNetPP(points=self.K, feature_dim=self.dim,
                                  dtype=self.dtype, fused=self.fused,
                                  fused_train=self.fused_train)
        self.decoder = FoldingNet(points=self.K, grid_size=self.d,
                                  feature_dim=self.dim, dtype=self.dtype)
        self.enc_proj = TorchDense(self.d, dtype=self.dtype)
        self.dec_proj = TorchDense(self.dim, dtype=self.dtype)

    def encode(self, xyz, train: bool = False):
        _, latent = self.encoder(xyz, train)
        latent = sigmoid_spread(latent, self.L)
        # quantizer arithmetic stays exact float32 under bf16 compute
        return self.enc_proj(latent).astype(jnp.float32)     # [B, d]

    def decode(self, latent_q):
        return self.decoder(self.dec_proj(latent_q))         # [B, d*d, 3]

    def __call__(self, xyz, train: bool = False):
        z = self.encode(xyz, train)
        z_q = ste_round(z)
        return self.decode(z_q), z, z_q


class PPPFConditionalProbabilityModel(nn.Module):
    """PMFs from a PN++ backbone over the skeleton (PPPF_AE.py:181-228).
    [B, S, 3] -> [B, S, d, L]."""

    d: int = 16
    L: int = 7
    dtype: Any = None

    def setup(self):
        # The reference passes bn=False here (PPPF_AE.py:187-192), but its
        # PointNetPP never forwards the flag — PointnetSAModule always
        # builds BatchNorm (pointnet_sa_module.py:49-56). Keep BN for parity.
        self.model_pnpp = PointNetPP(
            sa1_mlp=(64, 64, 128),
            sa2_mlp=(128, 128, 256),
            sa3_mlp=(256, 512, 1024),
            feature_dim=1024,
            use_bn=True,
            dtype=self.dtype,
        )
        self.model_mlp = PointwiseMLP(
            features=(512, 512, self.d * self.L), relu=(True, True, False),
            dtype=self.dtype)

    def __call__(self, sampled_xyz, train: bool = False):
        B, S, _ = sampled_xyz.shape
        _, feature = self.model_pnpp(sampled_xyz, train)
        tiled = jnp.repeat(feature[:, None, :], S, axis=1)
        out = self.model_mlp(jnp.concatenate(
            [sampled_xyz.astype(tiled.dtype), tiled], axis=-1))
        # softmax in f32: the PMF feeds the range coder's CDF quantization
        return nn.softmax(out.reshape(B, S, self.d, self.L).astype(jnp.float32),
                          axis=-1)
