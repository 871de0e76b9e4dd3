from pcc_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    replicate,
    build_sharded_encode,
    build_sharded_pmf_weights,
    build_sharded_decode,
    build_sharded_train_step,
    build_sharded_pppf_train_step,
    build_sharded_pppe_train_step,
)

__all__ = [
    "make_mesh",
    "shard_batch",
    "replicate",
    "build_sharded_encode",
    "build_sharded_pmf_weights",
    "build_sharded_decode",
    "build_sharded_train_step",
    "build_sharded_pppf_train_step",
    "build_sharded_pppe_train_step",
]
