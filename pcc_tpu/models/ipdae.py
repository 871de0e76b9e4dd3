"""IPDAE baseline patch autoencoder + conditional probability model.

TPU-native counterpart of reference AE.py. Same computational graph and
parameter shapes (encoder AE.py:16-17, decoder AE.py:19-27, prob model
AE.py:87-123), expressed channels-last so every layer is an MXU matmul over
the full patch batch. `encode` / `decode` are exposed separately because
compress and decompress each run only one half (compress.py:109-127,
decompress.py:95-102).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from pcc_tpu.models.layers import (
    PointNetFeat,
    TorchDense,
    PointwiseMLP,
    SetAbstraction,
    sigmoid_spread,
    ste_round,
)


class PatchAE(nn.Module):
    """Patch autoencoder: [B, K, 3] patches -> d-dim quantized latent -> k points.

    Config mirrors AE.AE(K, k, d, L) (AE.py:12-32).
    """

    K: int = 256
    k: int = 128
    d: int = 16
    L: int = 7
    sa_knn: int = 16
    dtype: Any = None  # bf16 mixed-precision compute when set (params stay f32)
    fused_sa: bool = False      # fused Pallas encoder (config.py::fused_sa)
    fused_decode: bool = False  # fused Pallas decoder, inference-only

    def setup(self):
        self.sa = SetAbstraction(knn=self.sa_knn, mlp=(32, 64, 128),
                                 dtype=self.dtype, fused=self.fused_sa)
        self.pn = PointNetFeat(
            features=(128, 256, 512, self.d), relu=(True, True, True, False),
            dtype=self.dtype,
        )
        self.inv_pool = [TorchDense(256, dtype=self.dtype),
                         TorchDense(1024, dtype=self.dtype),
                         TorchDense(self.k * 128, dtype=self.dtype)]
        self.inv_mlp = PointwiseMLP(
            features=(128, 64, 32, 3), relu=(True, True, True, False),
            dtype=self.dtype,
        )

    def encode(self, patches: jnp.ndarray) -> jnp.ndarray:
        """[B, K, 3] -> pre-quantization latent [B, d] (already spread into
        the quantizer range; AE.py:36-44)."""
        from pcc_tpu.ops.pallas_gate import pallas_gate

        use_fused, interp = pallas_gate()
        if self.fused_sa and use_fused:
            # whole-encoder Pallas fusion (ops/sa_pallas.py): SA + concat +
            # PointNet + global max in one VMEM-resident kernel, with a
            # custom-VJP backward kernel so training takes this path too.
            # The probe calls create/visit the exact same parameter tree
            # the XLA path uses.
            from pcc_tpu.ops.sa_pallas import patch_encoder_trainable

            latent = patch_encoder_trainable(
                patches, self.sa(patches, probe=True),
                self.pn(jnp.zeros((1, 1, 3 + 128), jnp.float32), probe=True),
                knn=self.sa_knn, compute_dtype=self.dtype, interpret=interp)
        else:
            feats = self.sa(patches)                               # [B, K, 128]
            latent = self.pn(jnp.concatenate([patches, feats], axis=-1))
        # the quantizer and symbol arithmetic stay exact float32 even under
        # bf16 compute — rounding in bf16 would flip symbols near .5
        return sigmoid_spread(latent.astype(jnp.float32), self.L)

    def quantize(self, latent: jnp.ndarray) -> jnp.ndarray:
        return ste_round(latent)

    def _probe_inv_pool(self):
        """Materialize the inv_pool params (same names/shapes as the
        compute path) and return their f32 (kernel, bias) pairs — the
        decode-side twin of PointwiseMLP's probe mode (layers.py)."""
        wb = []
        C = self.d
        for i, layer in enumerate(self.inv_pool):
            layer(jnp.zeros((1, C), jnp.float32))
            p = self.variables["params"][f"inv_pool_{i}"]["linear"]
            wb.append((p["kernel"], p["bias"]))
            C = p["kernel"].shape[-1]
        return wb

    def decode(self, latent_q: jnp.ndarray) -> jnp.ndarray:
        """[B, d] quantized latent -> [B, k, 3] patch points (AE.py:47-53)."""
        from pcc_tpu.ops.pallas_gate import pallas_gate

        use_fused, interp = pallas_gate()
        if self.fused_decode and use_fused:
            # fused Pallas decoder (ops/decoder_pallas.py): expansion +
            # fold + tile + inv_mlp in one kernel, inference-only — the
            # probes visit the exact parameter tree the XLA path creates
            from pcc_tpu.ops.decoder_pallas import patch_decoder_fused

            return patch_decoder_fused(
                latent_q.astype(jnp.float32), self._probe_inv_pool(),
                self.inv_mlp(jnp.zeros((1, 1, 128 + self.d), jnp.float32),
                             probe=True),
                k=self.k, compute_dtype=self.dtype, interpret=interp)
        x = latent_q
        for layer in self.inv_pool:
            x = nn.relu(layer(x))                                  # [B, k*128]
        # Reference views [B, k*128] as [B, 128, k] (channel-major memory,
        # AE.py:49); channels-last equivalent: reshape then move k forward.
        fold = jnp.transpose(x.reshape(x.shape[0], 128, self.k), (0, 2, 1))
        tiled = jnp.repeat(latent_q[:, None, :], self.k, axis=1)   # [B, k, d]
        mlp_in = jnp.concatenate([fold, tiled], axis=-1)
        return self.inv_mlp(mlp_in).astype(jnp.float32)            # [B, k, 3]

    def __call__(self, patches: jnp.ndarray):
        """Training forward (AE.py:34-55): returns
        (reconstructed [B, k, 3], latent [B, d], latent_quantized [B, d])."""
        latent = self.encode(patches)
        latent_q = self.quantize(latent)
        return self.decode(latent_q), latent, latent_q


class ConditionalProbabilityModel(nn.Module):
    """Latent PMFs conditioned only on the decoded skeleton (AE.py:87-123).

    This is the architectural invariant that makes the stream decodable: the
    decoder reproduces the identical PMF from the transmitted skeleton alone
    (decompress.py:88-93).

    [B, S, 3] skeleton -> [B, S, d, L] pmf.
    """

    d: int = 16
    L: int = 7
    dtype: Any = None

    def setup(self):
        self.model_pn = PointNetFeat(features=(64, 128, 256),
                                     relu=(True, True, True), dtype=self.dtype)
        self.model_mlp = PointwiseMLP(
            features=(512, 512, self.d * self.L), relu=(True, True, False),
            dtype=self.dtype,
        )

    def __call__(self, sampled_xyz: jnp.ndarray) -> jnp.ndarray:
        B, S, _ = sampled_xyz.shape
        feature = self.model_pn(sampled_xyz)                        # [B, 256]
        tiled = jnp.repeat(feature[:, None, :], S, axis=1)          # [B, S, 256]
        mlp_in = jnp.concatenate([sampled_xyz.astype(tiled.dtype), tiled], axis=-1)
        out = self.model_mlp(mlp_in).reshape(B, S, self.d, self.L)
        # softmax in f32: the PMF feeds the range coder's CDF quantization
        return nn.softmax(out.astype(jnp.float32), axis=-1)
