"""Rate-distortion training losses (reference AE.py:57-70, PPPF_AE.py:153-178)."""

from __future__ import annotations

import jax.numpy as jnp

from pcc_tpu.ops.chamfer import chamfer_distance


def rate_distortion_loss(
    pc_pred: jnp.ndarray,
    pc_target: jnp.ndarray,
    fbpp: jnp.ndarray,
    lam: float,
):
    """chamfer(pred, target) + lam * fbpp.

    Returns (loss, aux dict) so callers can log the distortion/rate split.
    The chamfer neighbor SEARCH runs in the fast MXU expansion form — the
    loss value is still the exactly-recomputed gathered distance
    (ops/chamfer.py::chamfer_distance, fast_search).
    """
    d, _ = chamfer_distance(pc_pred, pc_target, fast_search=True)
    rate = jnp.mean(fbpp)
    loss = d + lam * rate
    return loss, {"chamfer": d, "fbpp": rate}
