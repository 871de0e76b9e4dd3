"""Shared codec configuration.

The reference spreads these hyperparameters across per-CLI argparse defaults
(reference train.py:33-47, compress.py:30-34) and in-code magic constants
(pn_kit.py:17-23 OCTREE_BPP_DICT, AE.py:43 quantizer spread). Here they live
in one dataclass; CLIs build it from flags with the reference's names/defaults.
"""

from __future__ import annotations

import dataclasses

# Minimum skeleton bpp per patch size K; mirrors reference pn_kit.py:17-23.
OCTREE_BPP_DICT = {
    1024: 0.07,
    512: 0.125,
    256: 0.25,
    128: 0.5,
    64: 1.0,
}

# Reference caps the adaptive-depth search at 16 (pn_kit.py:386). The device
# octree uses int32 Morton codes, which bounds depth at 10 (3*10 = 30 bits);
# FPS-sampled skeletons are losslessly separable well before depth 10.
MAX_OCTREE_DEPTH = 10

# Global RNG seed; reference seeds torch/np with 11 (train.py:18-20).
DEFAULT_SEED = 11


@dataclasses.dataclass(frozen=True)
class CodecConfig:
    """Static shape/hyperparameter bundle for the patch pipeline.

    Derived quantities follow reference train.py:254:
      S = N * ALPHA // K   (number of patches / skeleton points)
      k = K // ALPHA       (points produced per decoded patch)
    """

    N: int = 8192      # points per cloud
    N0: int = 1024     # scale-transform constant (train.py:34)
    ALPHA: int = 2     # patch coverage factor
    K: int = 256       # points per patch
    d: int = 16        # bottleneck dim
    L: int = 7         # quantization levels
    sa_knn: int = 16   # KNN size inside SetAbstraction (AE.py:16)
    margin: float = 0.01  # normalize margin (pn_kit.py:47)
    max_depth: int = MAX_OCTREE_DEPTH
    # network computation dtype: "float32" or "bfloat16". bf16 is the TPU
    # counterpart of the reference's AMP autocast (train.py:168,275); params,
    # optimizer state, quantizer arithmetic and the PMF softmax stay float32.
    compute_dtype: str = "float32"
    # patch autoencoder family: "AE" (IPDAE, AE.py:12-55) or "PPPF-AE"
    # (PN++/FoldingNet, PPPF_AE.py:114-150). The reference trains both
    # (train.py:56-68) but its compress.py drives IPDAE submodules directly
    # (ae.sa/ae.pn, compress.py:112-122) and so cannot code PPPF streams;
    # here both families share the full binary pipeline (extension).
    model: str = "AE"
    # Fused Pallas SetAbstraction / whole-encoder kernel (ops/sa_pallas.py)
    # in the IPDAE encoder. Differentiable (custom-VJP backward kernel) but
    # single-program (not GSPMD-partitionable via jit alone), so it stays
    # off by default; the Codec wrapper and the single-chip train CLI turn
    # it on (codec.py, cli/train.py).
    fused_sa: bool = False
    # Fused Pallas patch decoder (ops/decoder_pallas.py). Inference-only
    # (no backward rule): the Codec enables it; the training forward keeps
    # the XLA decoder.
    fused_decode: bool = False
    # Morton-chunk-pruned exact KNN patch selection (ops/knn_pruned.py):
    # bit-identical output to knn_points (streams unchanged) at ~0.35x the
    # device cost of the dense top_k+row-gather block. Pure XLA (sorts +
    # chunked gathers), GSPMD-partitionable, certificate-verified exact
    # with a fixed-size top-up for outlier queries. Applies to the encode
    # program's patch extraction only (training keeps knn_points, whose
    # gather gradients flow).
    pruned_knn: bool = True
    # Coding-CDF derivation (coding/iprob.py for IPDAE + the attribute
    # stream, coding/iprob_pppf.py for PPPF's PN++ backbone). "integer":
    # deterministic fixed-point inference of the conditional probability
    # model — CDFs are byte-identical across backends/compilations/
    # topologies, so a stream encoded on an 8-chip mesh decodes on one
    # chip (and survives XLA upgrades). "float": legacy fallback — the f32
    # network + on-device uint16 staircase, only safe when both codec
    # sides share one compiled program (streams carry a crc32 trailer that
    # fails loudly otherwise).
    cdf_mode: str = "integer"

    def __post_init__(self):
        # the encoded symbol array travels as int8 (codec.py EncodeResult)
        # and the PPPE entropy header packs L as one byte: L beyond 128
        # would silently wrap into a corrupt-but-decodable stream
        if not 2 <= self.L <= 128:
            raise ValueError(
                f"L={self.L} out of range [2, 128]: symbols are carried as "
                "int8 in the coding pipeline")

    @property
    def S(self) -> int:
        return self.N * self.ALPHA // self.K

    @property
    def k(self) -> int:
        return self.K // self.ALPHA

    @property
    def min_bpp(self) -> float:
        """Octree skeleton bpp floor for this K (pn_kit.py:17-23)."""
        return OCTREE_BPP_DICT.get(self.K, 0.25)

    @property
    def patch_scale(self) -> float:
        """Patch coordinate scaling (N/N0)^(1/3) (train.py:192)."""
        return float((self.N / self.N0) ** (1.0 / 3.0))

    def with_n(self, N: int) -> "CodecConfig":
        """Per-cloud N at compress time (compress.py:92-93)."""
        return dataclasses.replace(self, N=N)


@dataclasses.dataclass(frozen=True)
class PPPEConfig:
    """Whole-cloud fast pipeline config (train_pppe_pcd_ae.py:27-29)."""

    N: int = 8192        # points per cloud
    latent_dim: int = 256  # '--K' in the reference PPPE CLIs
    L: int = 7           # quantization bins
    coarse_points: int = 512
    margin: float = 0.01
    compute_dtype: str = "float32"  # "bfloat16" = mixed-precision networks
