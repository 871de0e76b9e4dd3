"""Shared CLI runtime setup."""

from __future__ import annotations

import os


def setup_jax(cache_dir: str | None = None) -> None:
    """Enable the persistent compilation cache (first compile of the codec
    pipeline costs tens of seconds on TPU; cached compiles are instant) and
    keep dispatch async-friendly. Call before heavy jax use."""
    import jax

    # Honor an explicit JAX_PLATFORMS env var: some environments (the axon
    # sitecustomize) force-override the platform selection at interpreter
    # start, so the env var alone does not stick.
    env_platforms = os.environ.get("JAX_PLATFORMS")
    if env_platforms:
        jax.config.update("jax_platforms", env_platforms)

    # Separate the cache per platform string: mixing CPU executables
    # compiled under different machine-feature assumptions into one cache
    # can hang/crash at AOT load time.
    platform = os.environ.get("JAX_PLATFORMS", "default").replace(",", "_") or "default"
    cache_dir = cache_dir or os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.expanduser(f"~/.cache/pcc_tpu_jax/{platform}"),
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def init_params_cpu(seed: int, cfg):
    """Initialize random params on the CPU backend — param init is tiny
    compute, and TPU dispatch latency makes device-side init pointlessly
    slow. Falls back to the default device if no CPU backend exists."""
    import jax

    from pcc_tpu.codec import init_params

    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        return init_params(jax.random.key(seed), cfg)
    with jax.default_device(cpu):
        return init_params(jax.random.key(seed), cfg)


def add_devices_flag(parser) -> None:
    parser.add_argument(
        "--devices", type=int, default=1,
        help="Data-parallel device count (SURVEY.md §2.5): >1 builds a "
             "jax.sharding mesh over the first N local devices and shards "
             "the cloud batch across it. 1 = single-device (default).")


def maybe_mesh(n_devices: int):
    """None for single-device, else a ('data',) Mesh over n devices."""
    if n_devices <= 1:
        return None
    import jax

    from pcc_tpu.parallel import make_mesh

    avail = len(jax.devices())
    if avail < n_devices:
        raise SystemExit(
            f"--devices {n_devices} requested but only {avail} device(s) "
            "visible (for CPU testing: JAX_PLATFORMS=cpu XLA_FLAGS="
            "--xla_force_host_platform_device_count=N)")
    return make_mesh(n_devices)
