from pcc_tpu.models.layers import (
    PointwiseMLP,
    PointNetFeat,
    SetAbstraction,
    ste_round,
    sigmoid_spread,
)
from pcc_tpu.models.ipdae import PatchAE, ConditionalProbabilityModel
from pcc_tpu.models.losses import rate_distortion_loss

__all__ = [
    "PointwiseMLP",
    "PointNetFeat",
    "SetAbstraction",
    "ste_round",
    "sigmoid_spread",
    "PatchAE",
    "ConditionalProbabilityModel",
    "rate_distortion_loss",
]
