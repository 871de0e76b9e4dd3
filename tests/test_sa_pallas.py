"""First-party coverage for the fused Pallas SetAbstraction kernel
(ops/sa_pallas.py) under the Pallas interpreter, so CPU CI executes the
exact kernel the TPU runs (same pattern as tests/test_fps_pallas.py)."""

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
