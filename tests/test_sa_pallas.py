"""First-party coverage for the fused Pallas SetAbstraction kernel
(ops/sa_pallas.py) under the Pallas interpreter, so CPU CI executes the
exact kernel the TPU runs (same pattern as tests/test_fps_pallas.py)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pcc_tpu.models.layers import PointwiseMLP, SetAbstraction
from pcc_tpu.ops.sa_pallas import sa_fused


def _xla_reference(xyz, wb, knn, compute_dtype=None):
    """The XLA SetAbstraction math with explicit weights."""
    from pcc_tpu.ops.knn import knn_points

    _, _, grouped = knn_points(xyz, xyz, K=knn, return_nn=True)
    x = grouped - xyz[..., None, :]
    for w, b in wb:
        if compute_dtype is not None:
            x = x.astype(compute_dtype)
            w = w.astype(compute_dtype)
            b = b.astype(compute_dtype)
        x = jax.nn.relu(x @ w + b)
    return jnp.max(x, axis=-2).astype(jnp.float32)


def _random_wb(rng):
    dims = [3, 32, 64, 128]
    return [
        (jnp.asarray(rng.standard_normal((dims[i], dims[i + 1]))
                     .astype(np.float32) * 0.2),
         jnp.asarray(rng.standard_normal(dims[i + 1]).astype(np.float32) * 0.1))
        for i in range(3)
    ]


@pytest.mark.parametrize("P,N", [(8, 64), (5, 32)])  # incl. block padding
def test_sa_fused_matches_xla(rng, P, N):
    xyz = jnp.asarray(rng.random((P, N, 3)).astype(np.float32))
    wb = _random_wb(rng)
    ref = np.asarray(_xla_reference(xyz, wb, knn=8))
    out = np.asarray(sa_fused(
        xyz, [w for w, _ in wb], [b for _, b in wb], knn=8, block_p=4,
        interpret=True))
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_sa_fused_bf16(rng):
    xyz = jnp.asarray(rng.random((4, 32, 3)).astype(np.float32))
    wb = _random_wb(rng)
    ref = np.asarray(_xla_reference(xyz, wb, knn=8, compute_dtype=jnp.bfloat16))
    out = np.asarray(sa_fused(
        xyz, [w for w, _ in wb], [b for _, b in wb], knn=8,
        compute_dtype=jnp.bfloat16, block_p=4, interpret=True))
    np.testing.assert_allclose(out, ref, rtol=0.05, atol=0.05)


def test_probe_recovers_exact_params(rng):
    """PointwiseMLP probe mode returns the exact f32 kernels/biases under
    the same parameter tree as the compute path."""
    mlp = PointwiseMLP((32, 64, 128))
    x = jnp.asarray(rng.random((2, 8, 3)).astype(np.float32))
    variables = mlp.init(jax.random.key(0), x)
    wb = mlp.apply(variables, x, probe=True)
    p = variables["params"]
    for i, (w, b) in enumerate(wb):
        np.testing.assert_allclose(
            np.asarray(w), np.asarray(p[f"dense_{i}"]["linear"]["kernel"]),
            atol=1e-6)
        np.testing.assert_array_equal(
            np.asarray(b), np.asarray(p[f"dense_{i}"]["linear"]["bias"]))


def test_fused_module_param_tree_identical(rng):
    """SetAbstraction(fused=True) and (fused=False) create identical
    parameter trees, so checkpoints are interchangeable."""
    x = jnp.asarray(rng.random((2, 16, 3)).astype(np.float32))
    v_plain = SetAbstraction(knn=4, fused=False).init(jax.random.key(1), x)
    v_fused = SetAbstraction(knn=4, fused=True).init(jax.random.key(1), x)
    ref_leaves = jax.tree.leaves(v_plain)
    fused_leaves = jax.tree.leaves(v_fused)
    assert jax.tree.structure(v_plain) == jax.tree.structure(v_fused)
    for a, b in zip(ref_leaves, fused_leaves):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # off-TPU the fused module falls back to the XLA path: same output
    out_f = SetAbstraction(knn=4, fused=True).apply(v_fused, x)
    out_p = SetAbstraction(knn=4, fused=False).apply(v_plain, x)
    np.testing.assert_array_equal(np.asarray(out_f), np.asarray(out_p))


def _xla_encoder(patches, sa_wb, pn_wb, knn):
    """The XLA encoder math (SA + concat + PointNet + max) with explicit
    weights — the differentiable reference for the custom-VJP tests."""
    feats = _xla_reference(patches, sa_wb, knn)
    x = jnp.concatenate([patches, feats], axis=-1)
    relu = [True, True, True, False]
    for (w, b), r in zip(pn_wb, relu):
        x = x @ w + b
        if r:
            x = jax.nn.relu(x)
    return jnp.max(x, axis=-2)


def _random_pn_wb(rng, dims):
    return [
        (jnp.asarray(rng.standard_normal((dims[i], dims[i + 1]))
                     .astype(np.float32) * 0.2),
         jnp.asarray(rng.standard_normal(dims[i + 1]).astype(np.float32) * 0.1))
        for i in range(len(dims) - 1)
    ]


def test_trainable_encoder_gradient_parity(rng):
    """jax.grad through the custom-VJP fused encoder (backward Pallas
    kernel, interpret mode) == jax.grad through the XLA composition, for
    the patch input AND every weight/bias (VERDICT r2 item 2, atol 1e-4)."""
    from pcc_tpu.ops.sa_pallas import patch_encoder_trainable

    P, N, knn = 6, 32, 8
    patches = jnp.asarray(rng.random((P, N, 3)).astype(np.float32))
    sa_wb = _random_wb(rng)
    pn_wb = _random_pn_wb(rng, [3 + 128, 64, 96, 128, 8])
    g = jnp.asarray(rng.standard_normal((P, 8)).astype(np.float32))

    def loss_fused(patches, sa_wb, pn_wb):
        out = patch_encoder_trainable(patches, sa_wb, pn_wb, knn=knn,
                                      block_p=4, block_p_bwd=2,
                                      interpret=True)
        return jnp.sum(out * g)

    def loss_xla(patches, sa_wb, pn_wb):
        return jnp.sum(_xla_encoder(patches, sa_wb, pn_wb, knn) * g)

    out_f = patch_encoder_trainable(patches, sa_wb, pn_wb, knn=knn,
                                    block_p=4, block_p_bwd=2, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out_f), np.asarray(_xla_encoder(patches, sa_wb, pn_wb, knn)),
        atol=1e-5)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(patches, sa_wb, pn_wb)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(patches, sa_wb, pn_wb)
    for a, b in zip(jax.tree.leaves(gf), jax.tree.leaves(gx)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_trainable_encoder_gradient_parity_bf16(rng):
    """bf16 compute: the fused backward's deviation from the f32 truth must
    stay in the same class as the XLA bf16 path's own deviation.

    Elementwise comparison against the XLA bf16 gradients is ill-posed:
    max-pool ties are common after 8-bit-mantissa rounding and each
    implementation may route the (valid) subgradient to a different tied
    winner — at this test size even XLA-bf16 deviates ~20% L2 from XLA-f32.
    So the criterion is self-calibrating: fused-bf16 error vs f32 truth
    <= 2x XLA-bf16's error vs the same truth."""
    from pcc_tpu.ops.sa_pallas import patch_encoder_trainable

    P, N, knn = 4, 16, 4
    patches = jnp.asarray(rng.random((P, N, 3)).astype(np.float32))
    sa_wb = _random_wb(rng)
    pn_wb = _random_pn_wb(rng, [3 + 128, 64, 96, 128, 8])

    def loss_fused(patches, dt):
        out = patch_encoder_trainable(patches, sa_wb, pn_wb, knn=knn,
                                      compute_dtype=dt,
                                      block_p=4, block_p_bwd=2,
                                      interpret=True)
        return jnp.sum(out)

    def loss_xla_bf16(patches):
        feats = _xla_reference(patches, sa_wb, knn,
                               compute_dtype=jnp.bfloat16)
        x = jnp.concatenate([patches, feats], axis=-1)
        relu = [True, True, True, False]
        for (w, b), r in zip(pn_wb, relu):
            x = x.astype(jnp.bfloat16) @ w.astype(jnp.bfloat16) + b
            if r:
                x = jax.nn.relu(x)
        return jnp.sum(jnp.max(x.astype(jnp.float32), axis=-2))

    g_truth = np.asarray(jax.grad(
        functools.partial(loss_fused, dt=None))(patches))
    g_fbf = np.asarray(jax.grad(
        functools.partial(loss_fused, dt=jnp.bfloat16))(patches))
    g_xbf = np.asarray(jax.grad(loss_xla_bf16)(patches))
    rl = lambda a: np.linalg.norm(a - g_truth) / np.linalg.norm(g_truth)
    assert rl(g_fbf) <= max(2 * rl(g_xbf), 0.05), (rl(g_fbf), rl(g_xbf))


def test_patch_encoder_fused_matches_xla(rng):
    """The whole-encoder kernel (SA + concat + PointNet + max) equals the
    module composition, interpret mode."""
    from pcc_tpu.models.ipdae import PatchAE
    from pcc_tpu.ops.sa_pallas import patch_encoder_fused

    model = PatchAE(K=32, k=16, d=4, L=7, sa_knn=8)
    x = jnp.asarray(rng.random((6, 32, 3)).astype(np.float32))
    variables = model.init(jax.random.key(0), x)
    ref = np.asarray(model.apply(variables, x, method="encode"))

    sa_wb = model.apply(variables, x, method=lambda m, p: m.sa(p, probe=True))
    pn_wb = model.apply(
        variables, jnp.zeros((1, 1, 131), jnp.float32),
        method=lambda m, p: m.pn(p, probe=True))
    lat = patch_encoder_fused(x, sa_wb, pn_wb, knn=8, block_p=4,
                              interpret=True)
    from pcc_tpu.models.layers import sigmoid_spread
    out = np.asarray(sigmoid_spread(lat, 7))
    np.testing.assert_allclose(out, ref, atol=1e-5)


@pytest.mark.parametrize("g", [2, 4, 8])
def test_patch_encoder_slot_group_bit_identical(rng, g):
    """slot_group batches g KNN slots' gathers + SA MLP into one matmul
    set; matmul rows are independent and max is associative, so the output
    must be BIT-identical to the ungrouped kernel (both dtypes)."""
    from pcc_tpu.ops.sa_pallas import patch_encoder_fused

    x = jnp.asarray(rng.random((6, 32, 3)).astype(np.float32))
    key = jax.random.PRNGKey(3)
    ks = jax.random.split(key, 16)
    dims_sa = [(3, 32), (32, 64), (64, 128)]
    dims_pn = [(131, 128), (128, 128), (128, 256), (256, 16)]
    sa_wb = [(jax.random.normal(ks[i], s) / np.sqrt(s[0]), jnp.zeros(s[1]))
             for i, s in enumerate(dims_sa)]
    pn_wb = [(jax.random.normal(ks[4 + i], s) / np.sqrt(s[0]),
              jnp.zeros(s[1])) for i, s in enumerate(dims_pn)]
    for dt in (None, jnp.bfloat16):
        ref = np.asarray(patch_encoder_fused(
            x, sa_wb, pn_wb, knn=8, block_p=4, compute_dtype=dt,
            interpret=True))
        out = np.asarray(patch_encoder_fused(
            x, sa_wb, pn_wb, knn=8, block_p=4, compute_dtype=dt,
            slot_group=g, interpret=True))
        assert np.array_equal(ref, out)
