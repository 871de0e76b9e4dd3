"""PMF/CDF utilities for the latent entropy model (JAX).

Mirrors reference pn_kit.py:439-461: a differentiable rate estimate used in
the training loss, and the pmf->cdf conversion feeding the arithmetic coder.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def estimate_bits_from_pmf(pmf: jnp.ndarray, sym: jnp.ndarray) -> jnp.ndarray:
    """Total code length estimate: -sum log2 pmf[sym], clamped at 1e-3
    (reference pn_kit.py:439-450).

    Args:
      pmf: [..., L]; sym: [...] integer symbols in [0, L).
    """
    L = pmf.shape[-1]
    flat_pmf = pmf.reshape(-1, L)
    flat_sym = sym.reshape(-1)
    p = jnp.take_along_axis(flat_pmf, flat_sym[:, None], axis=1)[:, 0]
    return jnp.sum(-jnp.log2(jnp.clip(p, 1e-3)))


def pmf_to_cdf(pmf: jnp.ndarray) -> jnp.ndarray:
    """[..., L] pmf -> [..., L+1] cdf with a leading zero, clamped <= 1
    (the softmax-cumsum drift guard of pn_kit.py:452-461)."""
    cdf = jnp.cumsum(pmf, axis=-1)
    zeros = jnp.zeros(pmf.shape[:-1] + (1,), dtype=pmf.dtype)
    return jnp.minimum(jnp.concatenate([zeros, cdf], axis=-1), 1.0)


def pmf_to_quantized_cdf(pmf: jnp.ndarray,
                         precision: int = 16) -> jnp.ndarray:
    """[..., L] pmf -> [..., L+1] uint16 range-coder CDF rows, ON DEVICE.

    Same staircase as coding/rangecoder.py::quantize_cdf (round, running
    max, +arange so every bin is non-empty and each row totals 2^p - 1),
    but computed inside the jitted program so the host fetches 2-byte
    integers instead of float32 and skips the float64 requantization pass.
    Decodability needs only encoder CDF == decoder CDF, which holds because
    both codec sides run this exact compiled program (codec.skeleton_cdf).
    """
    Lp = pmf.shape[-1] + 1
    cdf = pmf_to_cdf(pmf.astype(jnp.float32))
    scaled = jnp.round(jnp.clip(cdf, 0.0, 1.0) * ((1 << precision) - Lp))
    scaled = jax.lax.cummax(scaled, axis=scaled.ndim - 1)
    return (scaled + jnp.arange(Lp, dtype=scaled.dtype)).astype(jnp.uint16)
