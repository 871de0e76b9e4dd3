"""First-party coverage for the Pallas FPS kernel (VERDICT r1 item 4).

The CPU suite never exercised the kernel before (fps_batch auto-selects the
XLA path off-TPU) — here the exact kernel the TPU runs executes under the
Pallas interpreter and must produce index-identical results to the XLA
lax.fori_loop implementation (reference semantics, pn_kit.py:309-330).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pcc_tpu.ops.fps import farthest_point_sample_batch, fps_batch
from pcc_tpu.ops.fps_pallas import fps_pallas


@pytest.mark.parametrize("B,N,S", [(1, 256, 16), (4, 512, 64), (2, 1024, 128)])
def test_pallas_matches_xla_zero_start(rng, B, N, S):
    xyz = jnp.asarray(rng.random((B, N, 3)).astype(np.float32))
    starts = jnp.zeros((B,), jnp.int32)
    want = np.asarray(fps_batch(xyz, S, starts, impl="xla"))
    got = np.asarray(fps_pallas(xyz, S, starts, interpret=True))
    np.testing.assert_array_equal(got, want)


def test_pallas_matches_xla_random_starts(rng):
    B, N, S = 4, 512, 32
    xyz = jnp.asarray(rng.random((B, N, 3)).astype(np.float32))
    starts = jnp.asarray(rng.integers(0, N, B, dtype=np.int32))
    want = np.asarray(fps_batch(xyz, S, starts, impl="xla"))
    got = np.asarray(fps_pallas(xyz, S, starts, interpret=True))
    np.testing.assert_array_equal(got, want)
    # first index is the requested start (reference pn_kit.py:321 contract)
    np.testing.assert_array_equal(got[:, 0], np.asarray(starts))


def test_pallas_under_jit_interpret(rng):
    """The kernel must also trace correctly inside jit (how the codec calls
    it on TPU)."""
    B, N, S = 2, 256, 16
    xyz = jnp.asarray(rng.random((B, N, 3)).astype(np.float32))
    starts = jnp.zeros((B,), jnp.int32)
    fn = jax.jit(lambda x, s: fps_pallas(x, S, s, interpret=True))
    got = np.asarray(fn(xyz, starts))
    want = np.asarray(farthest_point_sample_batch(xyz, S))
    np.testing.assert_array_equal(got, want)


def test_fps_coverage_property(rng):
    """FPS indices must be distinct and spread: max point-to-sample distance
    decreases monotonically-ish vs random sampling."""
    N, S = 1024, 64
    xyz = rng.random((N, 3)).astype(np.float32)
    idx = np.asarray(
        fps_pallas(jnp.asarray(xyz[None]), S, jnp.zeros((1,), jnp.int32),
                   interpret=True))[0]
    assert len(np.unique(idx)) == S
    # coverage radius beats a random subset's with margin
    d_fps = ((xyz[:, None] - xyz[idx][None]) ** 2).sum(-1).min(1).max()
    d_rand = ((xyz[:, None] - xyz[rng.choice(N, S, replace=False)][None]) ** 2
              ).sum(-1).min(1).max()
    assert d_fps <= d_rand
