"""Parity pins for the fused PN++ SA stage kernel (ops/pppf_sa_pallas.py).

Runs the exact TPU kernel under the Pallas interpreter on CPU (the
ops/sa_pallas.py test strategy) against the XLA PointnetSAModule path:
same selection order, same ball-mask contract (exact recomputed distances,
out-of-radius -> point 0), same eval-BN affine arithmetic."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pcc_tpu.models.pppf import PPPF_AE, PointnetSAModule


def _stage_pair(rng, npoint, radius, nsample, mlp, N, C, P=4):
    xyz = rng.random((P, N, 3)).astype(np.float32)
    feat = rng.random((P, N, C)).astype(np.float32) if C else None
    mod_xla = PointnetSAModule(npoint=npoint, radius=radius, nsample=nsample,
                               mlp=mlp, fused=False)
    variables = mod_xla.init(jax.random.key(0), jnp.asarray(xyz),
                             None if feat is None else jnp.asarray(feat))
    # nontrivial running stats so the BN-fold conversion is exercised
    stats = jax.tree.map(lambda a: a, variables["batch_stats"])

    def randomize(tree):
        leaves, treedef = jax.tree.flatten(tree)
        out = []
        for i, leaf in enumerate(leaves):
            vals = rng.random(leaf.shape).astype(np.float32)
            out.append(jnp.asarray(np.abs(vals) + 0.1))
        return jax.tree.unflatten(treedef, out)

    variables = {"params": variables["params"],
                 "batch_stats": randomize(stats)}
    return xyz, feat, variables


@pytest.mark.parametrize("npoint,radius,nsample,mlp,N,C", [
    (64, 0.2, 8, (3, 16, 16, 32), 64, 0),      # sa1 shape (npoint == N)
    (32, 0.4, 16, (24, 16, 32), 64, 21),       # sa2 shape (FPS + features)
    (8, 0.8, 32, (40, 32, 48), 32, 37),        # sa3 shape (ns == N/1)
])
def test_stage_parity_interpret(rng, monkeypatch, npoint, radius, nsample,
                                mlp, N, C):
    xyz, feat, variables = _stage_pair(rng, npoint, radius, nsample, mlp,
                                       N, C)
    mod = PointnetSAModule(npoint=npoint, radius=radius, nsample=nsample,
                           mlp=mlp, fused=False)
    fx = None if feat is None else jnp.asarray(feat)
    new_xla, out_xla = mod.apply(variables, jnp.asarray(xyz), fx)

    monkeypatch.setenv("PCC_PALLAS_INTERPRET", "1")
    modf = PointnetSAModule(npoint=npoint, radius=radius, nsample=nsample,
                            mlp=mlp, fused=True)
    new_f, out_f = modf.apply(variables, jnp.asarray(xyz), fx)

    np.testing.assert_array_equal(np.asarray(new_f), np.asarray(new_xla))
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_xla),
                               atol=1e-6)


def test_pppf_encode_parity_interpret(rng, monkeypatch):
    """Whole PPPF encoder: fused stages must reproduce the XLA latent, so
    codec symbols (round of the latent) are unchanged."""
    xyz = rng.random((3, 64, 3)).astype(np.float32)
    ae = PPPF_AE(K=64, d=4, L=7, dim=32)
    variables = ae.init(jax.random.key(1), jnp.asarray(xyz))

    lat_xla = ae.apply(variables, jnp.asarray(xyz), method=PPPF_AE.encode)

    monkeypatch.setenv("PCC_PALLAS_INTERPRET", "1")
    aef = PPPF_AE(K=64, d=4, L=7, dim=32, fused=True)
    lat_f = aef.apply(variables, jnp.asarray(xyz), method=PPPF_AE.encode)

    np.testing.assert_allclose(np.asarray(lat_f), np.asarray(lat_xla),
                               atol=1e-6)


@pytest.mark.parametrize("npoint,radius,nsample,mlp,N,C", [
    (64, 0.2, 8, (3, 16, 16, 32), 64, 0),      # sa1 shape (npoint == N)
    (32, 0.4, 16, (24, 16, 32), 64, 21),       # sa2 shape (FPS + features)
    (8, 0.8, 32, (40, 32, 48), 32, 37),        # sa3 shape (ns == N/1)
])
def test_stage_grad_parity_interpret(rng, monkeypatch, npoint, radius,
                                     nsample, mlp, N, C):
    """fused_train (custom-VJP backward kernel) vs XLA autodiff with
    use_running_average BN — the exact semantics the fused step trains
    under (frozen running stats; VERDICT r4 item 2)."""
    xyz, feat, variables = _stage_pair(rng, npoint, radius, nsample, mlp,
                                       N, C)
    # live running stats (mean ~0, var ~1) so the relu stack stays awake —
    # _stage_pair's all-positive stats kill most activations, which zeroes
    # the very gradients this test exists to compare
    def live(path, a):
        if "mean" in jax.tree_util.keystr(path):
            return jnp.asarray(
                (rng.random(a.shape).astype(np.float32) - 0.5) * 0.1)
        return jnp.asarray(rng.random(a.shape).astype(np.float32) + 0.5)
    stats = jax.tree_util.tree_map_with_path(live, variables["batch_stats"])
    fx = None if feat is None else jnp.asarray(feat)

    def loss(params, xyzi, feati, m, train):
        v = {"params": params, "batch_stats": stats}
        _, out = m.apply(v, xyzi, feati, train)
        return jnp.sum(jnp.sin(out) * 0.7)

    mod = PointnetSAModule(npoint=npoint, radius=radius, nsample=nsample,
                           mlp=mlp)
    argnums = (0, 1) if feat is None else (0, 1, 2)
    lx, gx = jax.value_and_grad(loss, argnums=argnums)(
        variables["params"], jnp.asarray(xyz), fx, mod, False)

    monkeypatch.setenv("PCC_PALLAS_INTERPRET", "1")
    modf = PointnetSAModule(npoint=npoint, radius=radius, nsample=nsample,
                            mlp=mlp, fused_train=True)
    lf, gf = jax.value_and_grad(loss, argnums=argnums)(
        variables["params"], jnp.asarray(xyz), fx, modf, True)

    np.testing.assert_allclose(float(lf), float(lx), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(gx), jax.tree.leaves(gf)):
        a, b = np.asarray(a), np.asarray(b)
        # atol scales with the gradient magnitude (accumulation-order fp
        # noise); the parity claim is semantic, not bitwise
        np.testing.assert_allclose(b, a, atol=1e-4 * max(np.abs(a).max(),
                                                         1.0))


@pytest.mark.slow
def test_pppf_train_step_fused_matches_frozen_bn(rng, monkeypatch):
    """Step-level: gradients of the fused train forward equal XLA's with
    use_running_average=True BN (same params, same batch, same key).
    slow: ~220 s — the whole pppf_forward compiles twice and the fused
    half runs three interpret-mode backward kernels; the quick suite
    keeps kernel-gradient coverage via test_stage_grad_parity_interpret."""
    import functools

    from pcc_tpu.config import CodecConfig
    from pcc_tpu.train.state import make_optimizer
    from pcc_tpu.train.steps_pppf import create_pppf_state, pppf_forward

    cfg = CodecConfig(N=256, N0=64, ALPHA=2, K=32, d=4, L=7,
                      model="PPPF-AE")
    tx = make_optimizer(1e-3, 0.1, 100, 100)
    state = create_pppf_state(jax.random.key(0), cfg, tx)
    # B=1: the interpret-mode backward kernels dominate this test's cost
    # (grid steps scale with B*S); one cloud exercises the same program
    batch = jnp.asarray(rng.random((1, cfg.N, 3)).astype(np.float32))
    key = jax.random.key(1)

    gx = jax.value_and_grad(functools.partial(
        pppf_forward, cfg=cfg, train=False, fused=False), has_aux=True)
    (lx, _), grx = gx(state.params, state.batch_stats, batch, key, 1e-6)

    monkeypatch.setenv("PCC_PALLAS_INTERPRET", "1")
    gf = jax.value_and_grad(functools.partial(
        pppf_forward, cfg=cfg, train=True, fused=True), has_aux=True)
    (lf, _), grf = gf(state.params, state.batch_stats, batch, key, 1e-6)

    np.testing.assert_allclose(float(lf), float(lx), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(grx), jax.tree.leaves(grf)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-5)


def test_pppf_codec_streams_interpret(rng, monkeypatch):
    """Codec-level: PPPF streams from the fused (interpret) encoder match
    the XLA encoder's byte for byte, and decode identically."""
    from pcc_tpu.codec import Codec, init_params
    from pcc_tpu.config import CodecConfig

    cfg = CodecConfig(N=256, K=32, d=4, model="PPPF-AE")
    ae_params, prob_params = init_params(jax.random.key(0), cfg)
    clouds = [(rng.random((256, 3)) * 2 - 1).astype(np.float32)
              for _ in range(3)]

    xla_codec = Codec(cfg, ae_params, prob_params, batch_size=3)
    streams_xla = xla_codec.compress_many(clouds)

    monkeypatch.setenv("PCC_PALLAS_INTERPRET", "1")
    fused_codec = Codec(cfg, ae_params, prob_params, batch_size=3)
    streams_fused = fused_codec.compress_many(clouds)
    assert streams_fused == streams_xla

    outs_f = fused_codec.decompress_many(streams_xla)
    monkeypatch.delenv("PCC_PALLAS_INTERPRET")
    outs_x = xla_codec.decompress_many(streams_xla)
    for a, b in zip(outs_f, outs_x):
        np.testing.assert_allclose(a, b, atol=2e-5)
