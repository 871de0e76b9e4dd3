from pcc_tpu.models.layers import (
    CMLP,
    PointwiseMLP,
    PointNetFeat,
    SetAbstraction,
    ste_round,
    sigmoid_spread,
)
from pcc_tpu.models.ipdae import PatchAE, ConditionalProbabilityModel
from pcc_tpu.models.losses import rate_distortion_loss
from pcc_tpu.models.pppf import (
    FoldingNet,
    PointNetPP,
    PointnetSAModule,
    PPPF_AE,
    PPPFConditionalProbabilityModel,
)
from pcc_tpu.models.pppe import (
    PCNDecoderSmall,
    PointCloudAE,
    PointNet2EncoderFull,
    PPPEConditionalProbabilityModel,
    estimate_bits_per_point_conditional,
    quantize_st,
)

__all__ = [
    "CMLP",
    "PointwiseMLP",
    "PointNetFeat",
    "SetAbstraction",
    "ste_round",
    "sigmoid_spread",
    "PatchAE",
    "ConditionalProbabilityModel",
    "rate_distortion_loss",
    "FoldingNet",
    "PointNetPP",
    "PointnetSAModule",
    "PPPF_AE",
    "PPPFConditionalProbabilityModel",
    "PCNDecoderSmall",
    "PointCloudAE",
    "PointNet2EncoderFull",
    "PPPEConditionalProbabilityModel",
    "estimate_bits_per_point_conditional",
    "quantize_st",
]
