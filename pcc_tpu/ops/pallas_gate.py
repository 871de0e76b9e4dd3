"""Gate for the fused Pallas kernels (encoder/decoder).

The kernels are TPU Mosaic programs; off-TPU the modules fall back to the
XLA path. For CI coverage of the exact kernel code on the CPU backend —
including under shard_map/mesh partitioning (tests/test_parallel.py) — set
PCC_PALLAS_INTERPRET=1: the kernels then run under the Pallas interpreter
anywhere.
"""

from __future__ import annotations

import os


def pallas_gate() -> tuple[bool, bool]:
    """(use_fused_kernels, interpret_mode)."""
    import jax

    if os.environ.get("PCC_PALLAS_INTERPRET"):
        return True, True
    return jax.default_backend() == "tpu", False
