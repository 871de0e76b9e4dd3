"""pcc_tpu — TPU-native learned point-cloud geometry codec.

A from-scratch JAX / XLA / Pallas reimplementation of the capabilities of the
IPDAE-family codec in rhmes/point-cloud-compression (see SURVEY.md): FPS
skeleton sampling, octree skeleton coding, KNN patch extraction, PointNet /
PointNet++ patch autoencoders, STE scalar quantization, and conditional
arithmetic coding of patch latents — with every per-cloud stage compiled into
a single XLA program and only final bit serialization on the host (C++).
"""

__version__ = "0.1.0"

from pcc_tpu.config import CodecConfig

__all__ = ["CodecConfig"]
