import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pcc_tpu.config import CodecConfig
from pcc_tpu.parallel import (
    build_sharded_encode,
    build_sharded_train_step,
    make_mesh,
    replicate,
    shard_batch,
)
from pcc_tpu.train.state import create_train_state, make_optimizer

TINY = CodecConfig(N=256, N0=64, ALPHA=2, K=32, d=4, L=7, sa_knn=8)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    return make_mesh(8)


def test_sharded_train_step_matches_single_device(mesh, rng):
    tx = make_optimizer(1e-3, 0.1, 1000, 1000)
    state = create_train_state(jax.random.key(0), TINY, tx)
    # independent identical state for the mesh run: the single-device step
    # donates its input, and replicate() may alias the device-0 shard
    stateN_src = create_train_state(jax.random.key(0), TINY, tx)
    batch = rng.random((8, TINY.N, 3)).astype(np.float32)
    key = jax.random.key(1)

    stepN = build_sharded_train_step(TINY, tx, mesh)
    stateN = replicate(mesh, stateN_src)
    batchN = shard_batch(mesh, batch)
    keyN = replicate(mesh, key)

    # single-device baseline
    from pcc_tpu.train.steps import build_train_step

    step1 = build_train_step(TINY, tx)
    _, aux1 = step1(state, jnp.asarray(batch), key, 1e-6)
    with mesh:
        state2, auxN = stepN(stateN, batchN, keyN, 1e-6)

    np.testing.assert_allclose(float(aux1["loss"]), float(auxN["loss"]),
                               rtol=1e-4)
    # params actually updated and identical across the mesh (replicated)
    leaf = jax.tree.leaves(state2.params)[0]
    assert leaf.sharding.is_fully_replicated


def test_sharded_encode_matches_single_device(mesh, rng):
    from pcc_tpu.codec import encode_clouds, init_params
    import functools

    ae_params, prob_params = init_params(jax.random.key(0), TINY)
    clouds = rng.random((8, TINY.N, 3)).astype(np.float32)
    starts = np.zeros(8, np.int32)

    ref = jax.jit(functools.partial(encode_clouds, cfg=TINY))(
        ae_params, prob_params, jnp.asarray(clouds), jnp.asarray(starts))

    enc = build_sharded_encode(TINY, mesh)
    with mesh:
        out = enc(replicate(mesh, ae_params), replicate(mesh, prob_params),
                  shard_batch(mesh, clouds), shard_batch(mesh, starts))

    np.testing.assert_array_equal(np.asarray(ref.sym), np.asarray(out.sym))
    np.testing.assert_array_equal(np.asarray(ref.sorted_codes),
                                  np.asarray(out.sorted_codes))
    # rec_xyz drives the coding CDF downstream; voxel centers are exact
    # dyadic floats so sharded and single-device must agree bit-for-bit
    np.testing.assert_array_equal(np.asarray(ref.rec_xyz),
                                  np.asarray(out.rec_xyz))
