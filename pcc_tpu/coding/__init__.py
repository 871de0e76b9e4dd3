from pcc_tpu.coding.octree import (
    morton_encode,
    morton_decode,
    octree_analyze,
    voxel_snap,
)
from pcc_tpu.coding.octree_host import (
    emit_octree_bits,
    parse_octree_bits,
    pack_bits,
    unpack_bits,
    codes_to_points,
)
from pcc_tpu.coding.pmf import pmf_to_cdf, estimate_bits_from_pmf

__all__ = [
    "morton_encode",
    "morton_decode",
    "octree_analyze",
    "voxel_snap",
    "emit_octree_bits",
    "parse_octree_bits",
    "pack_bits",
    "unpack_bits",
    "codes_to_points",
    "pmf_to_cdf",
    "estimate_bits_from_pmf",
]
