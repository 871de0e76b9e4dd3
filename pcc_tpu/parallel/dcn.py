"""Multi-host (DCN) data-parallel dryrun via jax.distributed.

The reference is strictly single-process (SURVEY.md §2.5). On TPU pods,
scaling past one host means jax.distributed.initialize + a global mesh:
each host feeds its local shard of the batch, gradient all-reduces ride
ICI within a slice and DCN across hosts — the code below is exactly that
program, exercised with N CPU processes (gloo collectives) so the
multi-host path is testable without pod hardware.

Run one worker per "host":
  python -m pcc_tpu.parallel.dcn --process_id I --num_processes P \
      --coordinator 127.0.0.1:PORT
Every process must report the same finite loss (the gradient psum makes
training state bit-identical across hosts).
"""

from __future__ import annotations

import argparse


def run_worker(process_id: int, num_processes: int, coordinator: str,
               local_devices: int = 4) -> float:
    """Initialize the distributed runtime, run ONE data-parallel train step
    over the global mesh, and return the (globally reduced) loss."""
    import os

    os.environ.setdefault(
        "XLA_FLAGS", f"--xla_force_host_platform_device_count={local_devices}")
    import jax

    # off-pod dryrun: CPU backend with gloo cross-process collectives.
    # Platform choice must not query the backend (jax.devices/default_backend
    # would initialise XLA before jax.distributed.initialize is allowed).
    on_tpu = "tpu" in os.environ.get("PCC_DCN_PLATFORM", "cpu")
    if not on_tpu:
        jax.config.update("jax_platforms", "cpu")
        try:
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
        except Exception:
            pass  # older jaxlib: collectives default is fine
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )

    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from pcc_tpu.config import CodecConfig
    from pcc_tpu.parallel import build_sharded_train_step, make_mesh
    from pcc_tpu.train.state import create_train_state, make_optimizer

    cfg = CodecConfig(N=256, N0=64, ALPHA=2, K=32, d=4, L=7, sa_knn=8)
    mesh = make_mesh()  # all global devices, across processes
    n_global = len(jax.devices())

    tx = make_optimizer(lr=1e-3, lr_decay=0.1, lr_decay_steps=100, max_steps=100)
    # identical seed on every process -> identical replicated init. In a
    # multi-process mesh device_put cannot target non-addressable devices,
    # so replicated inputs are passed as host arrays and placed by the
    # jitted step's in_shardings (every process provides the same values).
    state = create_train_state(jax.random.key(0), cfg, tx)
    state = jax.tree.map(np.asarray, state)
    data = NamedSharding(mesh, P("data"))
    key = np.asarray(jax.random.key_data(jax.random.key(1)))

    # each process materializes only ITS batch shard (the multi-host input
    # pipeline pattern: per-host data loading, no global gather)
    n_local = len(jax.local_devices())
    lo = process_id * n_local
    full = np.random.default_rng(0).random(
        (n_global, cfg.N, 3)).astype(np.float32)
    batch = jax.make_array_from_process_local_data(
        data, full[lo: lo + n_local], global_shape=full.shape)

    step = build_sharded_train_step(cfg, tx, mesh)
    with mesh:
        state, aux = step(state, batch, key, 1e-6)
    loss = float(aux["loss"])
    assert np.isfinite(loss), f"non-finite loss {loss}"
    return loss


def main(argv=None):
    p = argparse.ArgumentParser(prog="dcn.py")
    p.add_argument("--process_id", type=int, required=True)
    p.add_argument("--num_processes", type=int, required=True)
    p.add_argument("--coordinator", default="127.0.0.1:29400")
    p.add_argument("--local_devices", type=int, default=4)
    args = p.parse_args(argv)
    loss = run_worker(args.process_id, args.num_processes, args.coordinator,
                      args.local_devices)
    print(f"dcn worker {args.process_id}/{args.num_processes}: "
          f"loss={loss:.6f}")


if __name__ == "__main__":
    main()
