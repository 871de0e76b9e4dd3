"""bf16 mixed-precision mode (the TPU counterpart of the reference's AMP
autocast + GradScaler, train.py:168,275 — SURVEY §7 build-order item 4).

Invariants pinned here:
  * params stay float32 (mixed precision, not half-precision storage);
  * the codec stays decodable in bf16 (decoded symbols == encoded symbols:
    both sides derive the CDF from the same compiled program);
  * training steps are finite and reduce the loss like the f32 step;
  * bf16 outputs track f32 outputs within bf16 tolerance.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pcc_tpu.codec import Codec, init_params
from pcc_tpu.config import CodecConfig

CFG16 = CodecConfig(N=1024, K=128, d=8, L=7, compute_dtype="bfloat16")
CFG32 = CodecConfig(N=1024, K=128, d=8, L=7)


def _cloud(rng, n=1024):
    return (rng.random((n, 3)) * 3 - 1).astype(np.float32)


def test_params_stay_float32():
    ae_params, prob_params = init_params(jax.random.key(0), CFG16)
    for leaf in jax.tree.leaves((ae_params, prob_params)):
        assert leaf.dtype == jnp.float32


def test_bf16_codec_roundtrip_decodable(rng):
    ae_params, prob_params = init_params(jax.random.key(11), CFG16)
    codec = Codec(CFG16, ae_params, prob_params, batch_size=2)
    pc = _cloud(rng)
    p, s, c = codec.compress(pc)
    out = codec.decompress(p, s, c)
    assert out.shape == (CFG16.S * CFG16.k, 3)
    assert np.isfinite(out).all()
    # determinism (same compiled programs both calls)
    assert codec.compress(pc) == (p, s, c)


def test_bf16_tracks_f32(rng):
    """Same weights, bf16 vs f32 compute: latents agree to bf16 precision
    and the decoded clouds stay close."""
    ae_params, prob_params = init_params(jax.random.key(11), CFG32)
    c32 = Codec(CFG32, ae_params, prob_params, batch_size=2)
    c16 = Codec(CFG16, ae_params, prob_params, batch_size=2)
    pc = _cloud(rng)
    out32 = c32.decompress(*c32.compress(pc))
    out16 = c16.decompress(*c16.compress(pc))
    # bf16 has ~3 decimal digits; decoded geometry must stay in the same
    # place (it is dominated by the skeleton, which is exact in both modes)
    d = np.abs(out32 - out16).max()
    assert d < 0.1, f"bf16 output diverged from f32 by {d}"


def test_bf16_train_step_finite_and_learns(rng):
    from pcc_tpu.train.state import create_train_state, make_optimizer
    from pcc_tpu.train.steps import build_train_step

    cfg = CodecConfig(N=256, N0=64, ALPHA=2, K=32, d=4, L=7, sa_knn=8,
                      compute_dtype="bfloat16")
    tx = make_optimizer(1e-3, 0.1, 1000, 1000)
    state = create_train_state(jax.random.key(0), cfg, tx)
    step = build_train_step(cfg, tx)
    batch = jnp.asarray(rng.random((4, cfg.N, 3)).astype(np.float32))
    key = jax.random.key(1)

    losses = []
    for i in range(8):
        key, sub = jax.random.split(key)
        state, aux = step(state, batch, sub, 0.0)
        losses.append(float(aux["loss"]))
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]
    # grads flowed in f32: params still f32 after updates
    for leaf in jax.tree.leaves(state.params):
        assert leaf.dtype == jnp.float32
