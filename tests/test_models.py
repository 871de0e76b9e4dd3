import jax
import jax.numpy as jnp
import numpy as np

from pcc_tpu.config import CodecConfig
from pcc_tpu.models.ipdae import PatchAE, ConditionalProbabilityModel
from pcc_tpu.models.layers import ste_round, sigmoid_spread

TINY = CodecConfig(N=256, N0=64, ALPHA=2, K=32, d=4, L=7, sa_knn=8)


def test_ste_round_forward_and_gradient():
    x = jnp.array([0.2, 0.6, -1.4, 2.5])
    np.testing.assert_array_equal(np.asarray(ste_round(x)), np.round(np.asarray(x)))
    g = jax.grad(lambda v: jnp.sum(ste_round(v) * 3.0))(x)
    np.testing.assert_allclose(np.asarray(g), 3.0)  # identity backward


def test_sigmoid_spread_range():
    x = jnp.linspace(-100, 100, 1001)
    y = np.asarray(sigmoid_spread(x, L=7))
    spread = 7 - 0.2
    assert y.min() >= -spread / 2 - 1e-5 and y.max() <= spread / 2 + 1e-5
    # rounded symbols stay within [0, L) after +L//2 shift
    sym = np.round(y) + 3
    assert sym.min() >= 0 and sym.max() <= 6


def test_patch_ae_shapes(rng):
    ae = PatchAE(K=TINY.K, k=TINY.k, d=TINY.d, L=TINY.L, sa_knn=TINY.sa_knn)
    patches = jnp.asarray(rng.standard_normal((5, TINY.K, 3)).astype(np.float32))
    params = ae.init(jax.random.key(0), patches)
    recon, latent, latent_q = ae.apply(params, patches)
    assert recon.shape == (5, TINY.k, 3)
    assert latent.shape == (5, TINY.d)
    np.testing.assert_array_equal(
        np.asarray(latent_q), np.round(np.asarray(latent)))
    # encode/decode sub-methods match the full forward
    z = ae.apply(params, patches, method=PatchAE.encode)
    np.testing.assert_allclose(np.asarray(z), np.asarray(latent), rtol=1e-6)
    dec = ae.apply(params, ste_round(z), method=PatchAE.decode)
    np.testing.assert_allclose(np.asarray(dec), np.asarray(recon), rtol=1e-5, atol=1e-6)


def test_cpm_outputs_valid_pmf(rng):
    prob = ConditionalProbabilityModel(d=TINY.d, L=TINY.L)
    xyz = jnp.asarray(rng.random((2, TINY.S, 3)).astype(np.float32))
    params = prob.init(jax.random.key(0), xyz)
    pmf = np.asarray(prob.apply(params, xyz))
    assert pmf.shape == (2, TINY.S, TINY.d, TINY.L)
    assert (pmf >= 0).all()
    np.testing.assert_allclose(pmf.sum(-1), 1.0, rtol=1e-5)


def test_gradients_alive_at_init(rng):
    """Regression: with flax's default zero-bias init, the quantized latent
    rounds to all-zeros at init and the decoder is permanently dead
    (relu'(0)=0 everywhere). TorchDense's uniform bias init must keep
    gradients flowing to (almost) all AE leaves."""
    import functools
    from pcc_tpu.codec import init_params
    from pcc_tpu.train.steps import rd_forward

    ae_p, prob_p = init_params(jax.random.key(11), TINY)
    params = {"ae": ae_p, "prob": prob_p}
    pts = jnp.asarray(rng.random((2, TINY.N, 3)).astype(np.float32))
    (_, _), grads = jax.value_and_grad(
        functools.partial(rd_forward, cfg=TINY), has_aux=True
    )(params, pts, jax.random.key(0), 0.0)
    ae_leaves = [float(np.abs(g).max()) for g in jax.tree.leaves(grads["ae"])]
    alive = sum(1 for x in ae_leaves if x > 0)
    assert alive >= len(ae_leaves) - 2, f"dead AE gradients: {ae_leaves}"
    # decoder output must be nonzero at init (zero-bias nets emit exactly 0)
    ae, _ = __import__("pcc_tpu.codec", fromlist=["make_models"]).make_models(TINY)
    patches = jnp.asarray(rng.standard_normal((4, TINY.K, 3)).astype(np.float32))
    recon, _, _ = ae.apply(ae_p, patches)
    assert float(jnp.abs(recon).max()) > 0


def test_ipdae_train_step_decreases_loss(rng):
    from pcc_tpu.train.state import create_train_state, make_optimizer
    from pcc_tpu.train.steps import build_train_step

    tx = make_optimizer(1e-3, 0.1, 1000, 1000)
    state = create_train_state(jax.random.key(0), TINY, tx)
    step = build_train_step(TINY, tx)
    batch = jnp.asarray(rng.random((2, TINY.N, 3)).astype(np.float32))
    key = jax.random.key(1)
    losses = []
    for i in range(8):
        state, aux = step(state, batch, key, 0.0)
        losses.append(float(aux["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]  # optimizes on a fixed batch


def test_pppf_forward_and_train_step(rng):
    from pcc_tpu.models.pppf import PPPF_AE
    from pcc_tpu.train.state import make_optimizer
    from pcc_tpu.train.steps_pppf import (
        build_pppf_train_step, create_pppf_state)

    cfg = TINY
    ae = PPPF_AE(K=cfg.K, d=cfg.d, L=cfg.L, dim=64)
    xyz = jnp.asarray(rng.random((3, cfg.K, 3)).astype(np.float32))
    variables = ae.init(jax.random.key(0), xyz)
    assert "batch_stats" in variables  # PN++ stages carry BN
    (recon, z, z_q), _ = ae.apply(variables, xyz, train=True,
                                  mutable=["batch_stats"])
    assert recon.shape == (3, cfg.d * cfg.d, 3)  # grid_size=d -> d^2 points
    assert z.shape == (3, cfg.d)

    tx = make_optimizer(1e-3, 0.1, 1000, 1000)
    state = create_pppf_state(jax.random.key(0), cfg, tx)
    step = build_pppf_train_step(cfg, tx)
    batch = jnp.asarray(rng.random((2, cfg.N, 3)).astype(np.float32))
    state, aux = step(state, batch, jax.random.key(1), 0.0)
    assert np.isfinite(float(aux["loss"]))
    # the step donates its input state: snapshot before stepping again
    s0 = [np.asarray(x) for x in jax.tree.leaves(state.batch_stats)]
    state2, aux2 = step(state, batch, jax.random.key(2), 1e-6)
    assert np.isfinite(float(aux2["loss"]))
    # BN stats actually update
    s2 = jax.tree.leaves(state2.batch_stats)
    assert any(not np.allclose(a, b) for a, b in zip(s0, s2))


def test_checkpoint_roundtrip(tmp_path, rng):
    from pcc_tpu.train.state import create_train_state, make_optimizer
    from pcc_tpu.train.checkpoint import (
        save_checkpoint, load_latest_checkpoint, load_inference_params)

    tx = make_optimizer(1e-3, 0.1, 1000, 1000)
    state = create_train_state(jax.random.key(0), TINY, tx)
    state = state.replace(step=42)
    save_checkpoint(str(tmp_path), state, 42)

    fresh = create_train_state(jax.random.key(7), TINY, tx)
    loaded, start = load_latest_checkpoint(str(tmp_path), fresh)
    assert start == 43
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(loaded.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    ae_v, prob_v = load_inference_params(str(tmp_path))
    assert ae_v is not None and prob_v is not None
