"""Parity pins for the fused chamfer kernel (ops/chamfer_pallas.py): the
exact TPU kernel runs under the Pallas interpreter against the chunked XLA
path — forward values and gradients to BOTH clouds must match
(the training-loss semantics of ops/chamfer.py::chamfer_distance with
fast_search=True)."""

import numpy as np

import jax
import jax.numpy as jnp

from pcc_tpu.ops.chamfer import chamfer_distance
from pcc_tpu.ops.chamfer_pallas import chamfer_min_dists, fits_kernel


def _clouds(rng, P, k, K):
    x = (rng.random((P, k, 3)) * 2 - 1).astype(np.float32)
    y = (rng.random((P, K, 3)) * 2 - 1).astype(np.float32)
    return jnp.asarray(x), jnp.asarray(y)


def test_forward_matches_xla(rng):
    x, y = _clouds(rng, 5, 16, 256)
    dxy, dyx = chamfer_min_dists(x, y, interpret=True)
    want, _ = chamfer_distance(x, y, fast_search=True)  # CPU: XLA path
    got = jnp.mean(jnp.mean(dxy, -1) + jnp.mean(dyx, -1))
    np.testing.assert_allclose(float(got), float(want), rtol=1e-6)
    # per-point values against the exact definition
    d_full = np.sum((np.asarray(x)[:, :, None] -
                     np.asarray(y)[:, None, :]) ** 2, -1)
    np.testing.assert_allclose(np.asarray(dxy), d_full.min(2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(dyx), d_full.min(1), atol=1e-6)


def test_gradients_match_xla(rng):
    x, y = _clouds(rng, 4, 16, 64)

    def loss_fused(x, y):
        dxy, dyx = chamfer_min_dists(x, y, interpret=True)
        return jnp.mean(jnp.mean(dxy, -1) + jnp.mean(dyx, -1))

    def loss_xla(x, y):
        return chamfer_distance(x, y, fast_search=True)[0]

    gx_f, gy_f = jax.grad(loss_fused, argnums=(0, 1))(x, y)
    gx_x, gy_x = jax.grad(loss_xla, argnums=(0, 1))(x, y)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_x), atol=1e-5)
    np.testing.assert_allclose(np.asarray(gy_f), np.asarray(gy_x), atol=1e-5)


def test_chamfer_distance_gate(rng, monkeypatch):
    """chamfer_distance(fast_search=True) itself routes through the kernel
    under the interpret gate and reproduces the XLA value + grads."""
    x, y = _clouds(rng, 3, 16, 128)
    want = chamfer_distance(x, y, fast_search=True)[0]
    gwant = jax.grad(lambda a, b: chamfer_distance(a, b, True)[0],
                     argnums=(0, 1))(x, y)

    monkeypatch.setenv("PCC_PALLAS_INTERPRET", "1")
    got = chamfer_distance(x, y, fast_search=True)[0]
    ggot = jax.grad(lambda a, b: chamfer_distance(a, b, True)[0],
                    argnums=(0, 1))(x, y)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-6)
    for a, b in zip(ggot, gwant):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_fits_kernel_domain():
    a = jnp.zeros((2, 16, 3))
    b = jnp.zeros((2, 256, 3))
    assert fits_kernel(a, b)
    big = jnp.zeros((2, 8192, 3))
    assert not fits_kernel(big, big)       # PPPE whole-cloud: chunked path
    tiny = jnp.zeros((2, 4, 3))
    assert not fits_kernel(tiny, b)        # sub-tile rows stay on XLA


def test_identity_cloud_near_zero(rng):
    """A cloud against itself: the kernel's fast_search semantics allow a
    near-tie mispick at float noise (the documented fast_search caveat —
    metrics use the exact path), so the recomputed min distances are only
    bounded by float noise, not exactly zero."""
    x = jnp.asarray((rng.random((3, 32, 3)) * 2 - 1).astype(np.float32))
    dxy, dyx = chamfer_min_dists(x, x, interpret=True)
    assert float(jnp.max(dxy)) < 1e-6
    assert float(jnp.max(dyx)) < 1e-6
