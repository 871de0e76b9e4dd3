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
