"""Test env: CPU backend with 8 virtual devices so sharding tests run
without TPU hardware. Must run before jax is imported anywhere."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the axon env presets this to the TPU
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Keep test compiles fully local: the axon remote-compile service also
# intercepts CPU compiles, and its AOT results can deadlock / SIGILL when
# reloaded on this host. NOTE: the axon sitecustomize reads this var at
# INTERPRETER START (before conftest), so popping it here cannot
# un-register an already-remote_compile plugin — it only protects
# subprocesses we spawn. Entries a remote compiler wrote are therefore
# possible in principle, and after a terminal-side compiler upgrade they
# can reload as executables with mismatched buffer layouts
# (INVALID_ARGUMENT "supplied N buffers but compiled program expected M",
# with cpu_aot_loader machine-feature warnings). Defense: key the cache
# dir by the flag's value at startup, and if that error ever appears,
# `rm -rf tests/.jax_cache*` and rerun.
_rc = os.environ.get("PALLAS_AXON_REMOTE_COMPILE") == "1"
os.environ.pop("PALLAS_AXON_REMOTE_COMPILE", None)

import numpy as np
import pytest

# Persistent compile cache makes repeat suite runs compile-free.
_cache = os.path.join(os.path.dirname(__file__),
                      ".jax_cache_rc" if _rc else ".jax_cache")
os.makedirs(_cache, exist_ok=True)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _cache)

import jax  # noqa: E402

# The axon sitecustomize force-registers the TPU backend and overrides
# jax_platforms at interpreter start; claw the selection back to CPU so the
# suite really runs on the 8 virtual host devices.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


@pytest.fixture
def rng():
    return np.random.default_rng(11)
