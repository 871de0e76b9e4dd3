"""Shared point-set network building blocks (flax.linen, channels-last).

TPU-first counterparts of the reference's torch modules in pn_kit.py. The
reference expresses pointwise MLPs as 1x1 Conv2d stacks over [B, C, N, 1]
tensors (pn_kit.py:98-305); on TPU a pointwise MLP is just a Dense over the
trailing feature axis of a [B, N, C] tensor — each layer is one [B*N, C] x
[C, C'] matmul that tiles straight onto the MXU, and XLA fuses the
activations into the matmul epilogue.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from pcc_tpu.ops.knn import knn_points


class TorchDense(nn.Module):
    """Dense with torch nn.Linear/Conv default init: kernel AND bias drawn
    from U(-1/sqrt(fan_in), +1/sqrt(fan_in)).

    This is load-bearing, not cosmetic: at init the quantized latent rounds
    to all-zeros (sigmoid_spread(~0) ~ 0), and with flax's zero-bias
    default every decoder layer then outputs exactly 0 with relu'(0) = 0 —
    a permanently dead network where only the final bias can learn. Torch's
    nonzero bias init (what the reference trains with) keeps activations
    alive at zero input.

    `dtype` is the computation dtype (bf16 mixed precision — the TPU
    counterpart of the reference's AMP autocast, train.py:168,275); params
    always stay float32 so the optimizer and checkpoints are full precision.
    """

    features: int
    use_bias: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        bound = float(x.shape[-1]) ** -0.5

        def uniform_init(key, shape, dtype=jnp.float32):
            return jax.random.uniform(key, shape, dtype, -bound, bound)

        return nn.Dense(
            self.features,
            use_bias=self.use_bias,
            dtype=self.dtype,
            kernel_init=uniform_init,
            bias_init=uniform_init,
            name="linear",
        )(x)


def ste_round(x: jnp.ndarray) -> jnp.ndarray:
    """Straight-through rounding: round in the forward pass, identity
    gradient (reference STEQuantize, AE.py:72-85)."""
    return x + jax.lax.stop_gradient(jnp.round(x) - x)


def sigmoid_spread(latent: jnp.ndarray, L: int) -> jnp.ndarray:
    """Squash the latent into the quantizer's dynamic range
    [-(L-0.2)/2, +(L-0.2)/2] (reference AE.py:42-44)."""
    spread = L - 0.2
    return jax.nn.sigmoid(latent) * spread - spread / 2


class PointwiseMLP(nn.Module):
    """Per-point MLP: [..., N, C] -> [..., N, features[-1]].

    relu[i] toggles the activation after layer i (the reference's per-layer
    relu flags, pn_kit.py:263-305). BatchNorm optional (used by the PN++
    family); pass `train` via the `use_running_average` idiom.
    """

    features: Sequence[int]
    relu: Sequence[bool] | None = None
    use_bn: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 probe: bool = False):
        """probe=True returns the layer (kernel, bias) pairs instead of
        running the MLP — for fused Pallas consumers (ops/sa_pallas.py).
        Each dense is called once on a zero row so flax materializes its
        parameters under exactly the same names/shapes as the compute path,
        then the raw f32 kernels/biases are read back via `self.variables`
        — bitwise the stored params (no affine-probe rounding), so the
        fused and XLA encoders see identical weights. x only supplies the
        input width in probe mode.

        With use_bn, probe returns (kernel, bias, bn_params, bn_stats)
        4-tuples instead — the PN++ fused stage (ops/pppf_sa_pallas.py)
        folds the BatchNorm into the eval-time affine itself."""
        relu = self.relu if self.relu is not None else [True] * len(self.features)
        if probe:
            wb = []
            C = x.shape[-1]
            for i, f in enumerate(self.features):
                # dtype=None: params are created/stored f32; the fused
                # kernel casts to the compute dtype itself, as Dense would
                h = TorchDense(f, dtype=None, name=f"dense_{i}")(
                    jnp.zeros((1, C), jnp.float32))
                p = self.variables["params"][f"dense_{i}"]["linear"]
                if self.use_bn:
                    nn.BatchNorm(use_running_average=True, axis=-1,
                                 dtype=None, name=f"bn_{i}")(h)
                    wb.append((p["kernel"], p["bias"],
                               self.variables["params"][f"bn_{i}"],
                               self.variables["batch_stats"][f"bn_{i}"]))
                else:
                    wb.append((p["kernel"], p["bias"]))
                C = f
            return wb
        for i, f in enumerate(self.features):
            x = TorchDense(f, dtype=self.dtype, name=f"dense_{i}")(x)
            if self.use_bn:
                x = nn.BatchNorm(
                    use_running_average=not train,
                    axis=-1,
                    dtype=self.dtype,
                    name=f"bn_{i}",
                )(x)
            if relu[i]:
                x = nn.relu(x)
        return x


class PointNetFeat(nn.Module):
    """Pointwise MLP + max pool over points: [B, N, C] -> [B, D]
    (reference PointNet, pn_kit.py:98-144)."""

    features: Sequence[int]
    relu: Sequence[bool] | None = None
    use_bn: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 probe: bool = False):
        mlp = PointwiseMLP(self.features, self.relu, self.use_bn, self.dtype,
                           name="mlp")
        if probe:
            return mlp(x, probe=True)
        return jnp.max(mlp(x, train), axis=-2)


class CMLP(nn.Module):
    """Concatenated-max MLP: per-stage max pools concatenated into one
    feature vector (reference pn_kit.py:213-261). Unused by the reference
    CLIs; provided for API parity. [B, N, C] -> [B, sum(features)]."""

    features: Sequence[int]
    relu: Sequence[bool] | None = None
    use_bn: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        relu = self.relu if self.relu is not None else [True] * len(self.features)
        pools = []
        for i, f in enumerate(self.features):
            x = TorchDense(f, name=f"dense_{i}")(x)
            if self.use_bn:
                x = nn.BatchNorm(use_running_average=not train, axis=-1,
                                 name=f"bn_{i}")(x)
            if relu[i]:
                x = nn.relu(x)
            pools.append(jnp.max(x, axis=-2))
        return jnp.concatenate(pools, axis=-1)


class SetAbstraction(nn.Module):
    """Per-point local-feature layer via KNN grouping.

    The reference SetAbstraction (pn_kit.py:146-211) is instantiated with
    npoint == N in the patch AE (AE.py:16), so the FPS branch is dead and it
    reduces to: for every point, gather its K nearest neighbors inside the
    patch, center them, run a 3-layer pointwise MLP, max over neighbors.
    [B, N, 3] -> [B, N, mlp[-1]].

    All B*N neighborhoods are processed as one [B*N*K, C] matmul batch —
    this is the layer the reference could only run one patch at a time in
    its compress loop (compress.py:112-122).
    """

    knn: int = 16
    mlp: Sequence[int] = (32, 64, 128)
    final_relu: bool = True
    use_bn: bool = False
    dtype: Any = None
    # Inference-only fused Pallas path (ops/sa_pallas.py): KNN + gather +
    # MLP + neighbor-max in one VMEM-resident kernel, skipping the
    # [B, N, knn, C] HBM intermediates. No backward rule — leave False for
    # training; the Codec enables it (codec.py). Auto-falls back to the XLA
    # path off-TPU so CPU tests exercise both (kernel parity is pinned via
    # interpret mode in tests/test_sa_pallas.py).
    fused: bool = False

    @nn.compact
    def __call__(self, xyz: jnp.ndarray, train: bool = False,
                 probe: bool = False):
        relu = [True] * (len(self.mlp) - 1) + [self.final_relu]
        mlp = PointwiseMLP(self.mlp, relu, self.use_bn, self.dtype,
                           name="mlp")
        if probe:
            return mlp(xyz, probe=True)
        from pcc_tpu.ops.pallas_gate import pallas_gate

        use_fused, interp = pallas_gate()
        if (self.fused and not self.use_bn and all(relu)
                and xyz.ndim == 3 and use_fused):
            from pcc_tpu.ops.sa_pallas import sa_fused

            wb = mlp(xyz, probe=True)
            feats = sa_fused(
                xyz, [w for w, _ in wb], [b for _, b in wb],
                knn=self.knn, compute_dtype=self.dtype, interpret=interp)
            # match the XLA path's output dtype (kernel accumulates f32)
            return feats.astype(self.dtype) if self.dtype else feats
        _, _, grouped = knn_points(xyz, xyz, K=self.knn, return_nn=True)
        grouped = grouped - xyz[..., None, :]            # [B, N, K, 3]
        feats = mlp(grouped, train)
        return jnp.max(feats, axis=-2)                   # [B, N, mlp[-1]]
