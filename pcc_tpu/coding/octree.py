"""Device-side octree analysis as Morton-code reductions.

The reference encodes the FPS skeleton with a per-cloud Python DFS octree
(octree_np.py) and re-runs it with increasing depth until the code rate
clears a floor and the round-trip preserves the point count
(pn_kit.py:380-401). That host loop runs every training step
(train.py:175-179) — a host<->device sync in the hot path.

Here the whole analysis is one compiled XLA program over static shapes:

  * voxelization at depth D == truncating a Morton code to 3D bits;
  * occupied octree nodes at level l == unique 3l-bit prefixes;
  * the reference's bit count at depth D == 1 + 8 * sum_l occupied(l)
    (one root bit plus an 8-bit child mask per occupied node,
    octree_np.py:17-44);
  * the adaptive-depth search == a vectorized first-true scan over all
    depths at once.

Bit order parity: the reference DFS pops children in descending child index
(x<<2 | y<<1 | z) order (octree_np.py:31-40), so its within-level emission
order is *descending Morton order*. We sort codes descending once and keep
that order everywhere, so decoded skeleton point order matches the
serializer in octree_host.py and stays consistent across compress /
decompress (the invariant that makes the latent stream decodable,
decompress.py:88-93).

Morton codes are int32, bounding depth at 10 (30 bits): ample for skeletons
of <= 1024 FPS-separated points, and the rate floor is cleared far earlier.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from pcc_tpu.config import MAX_OCTREE_DEPTH


def morton_encode(pc01: jnp.ndarray, depth: int = MAX_OCTREE_DEPTH) -> jnp.ndarray:
    """Morton codes at `depth` for points in the unit cube.

    Bit layout per level: (x, y, z) with x most significant — the child
    index order of the reference DFS (octree_np.py:31-40).

    Args:
      pc01: [S, 3] points in [0, 1).
    Returns:
      [S] int32 codes with 3*depth significant bits.
    """
    scale = float(1 << depth)
    v = jnp.clip(jnp.floor(pc01 * scale).astype(jnp.int32), 0, (1 << depth) - 1)
    code = jnp.zeros(pc01.shape[:-1], dtype=jnp.int32)
    for level in range(depth):
        shift = depth - 1 - level
        trip = (
            (((v[..., 0] >> shift) & 1) << 2)
            | (((v[..., 1] >> shift) & 1) << 1)
            | ((v[..., 2] >> shift) & 1)
        )
        code = (code << 3) | trip
    return code


def morton_decode(codes: jnp.ndarray, depth: int) -> jnp.ndarray:
    """Voxel-center coordinates for Morton codes at `depth` -> [..., 3]."""
    x = jnp.zeros_like(codes)
    y = jnp.zeros_like(codes)
    z = jnp.zeros_like(codes)
    for level in range(depth):
        shift = depth - 1 - level
        x = x | (((codes >> (3 * shift + 2)) & 1) << shift)
        y = y | (((codes >> (3 * shift + 1)) & 1) << shift)
        z = z | (((codes >> (3 * shift)) & 1) << shift)
    inv = 1.0 / float(1 << depth)
    coords = jnp.stack([x, y, z], axis=-1).astype(jnp.float32)
    return (coords + 0.5) * inv


def voxel_snap(pc01: jnp.ndarray, depth: int) -> jnp.ndarray:
    """Snap points to their voxel centers at `depth` — the device mirror of
    the reference's getDecodeFromPc (octree_np.py:114-133), without the
    host-side dedupe. [..., 3] -> [..., 3]."""
    reso = 1.0 / float(1 << depth)
    return (jnp.floor(pc01 / reso) + 0.5) * reso


class OctreeResult(NamedTuple):
    rec_xyz: jnp.ndarray        # [S, 3] decoded voxel centers, descending Morton order
    depth: jnp.ndarray          # scalar int32 chosen depth
    total_bits: jnp.ndarray     # scalar int32 code length in bits
    sorted_codes: jnp.ndarray   # [S] int32 max-depth codes, descending


def octree_analyze(
    sampled01: jnp.ndarray,
    N: int,
    min_bpp: float | None,
    max_depth: int = MAX_OCTREE_DEPTH,
    start_depth: int = 1,
) -> OctreeResult:
    """Adaptive-depth octree analysis for one skeleton.

    Chooses the first depth >= start_depth where bits/N > min_bpp (skip the
    rate condition with min_bpp=None) AND the voxelization is lossless
    (unique voxel per point — the pc_rec.shape == pc.shape condition of
    pn_kit.py:393); falls back to max_depth. Returns decoded centers at the
    chosen depth in the reference's emission order. start_depth > 1 with
    min_bpp=None reproduces encode_sampled_np_depth (pn_kit.py:403-422).

    Args:
      sampled01: [S, 3] skeleton points in the unit cube.
      N: full-cloud point count (the bpp denominator, pn_kit.py:391).
    """
    S = sampled01.shape[0]
    codes = morton_encode(sampled01, max_depth)
    sc = -jnp.sort(-codes)  # descending

    # occupied-node counts per level 0..max_depth (level 0 = root = 1)
    uniqs = []
    for lvl in range(max_depth + 1):
        pref = sc >> (3 * (max_depth - lvl))
        if S > 1:
            u = 1 + jnp.sum((pref[:-1] != pref[1:]).astype(jnp.int32))
        else:
            u = jnp.asarray(1, dtype=jnp.int32)
        uniqs.append(u)
    uniqs = jnp.stack(uniqs)                      # [max_depth+1]
    csum = jnp.cumsum(uniqs)                      # csum[l] = sum_{0..l}

    # total bits if coded at depth d (d = 1..max_depth): 1 + 8 * sum_{l<d}
    bits_per_depth = 1 + 8 * csum[:-1]            # index d-1 <-> depth d
    lossless = uniqs[1:] == S                     # index d-1 <-> depth d
    cond = lossless
    if min_bpp is not None:
        cond = cond & (
            bits_per_depth.astype(jnp.float32) / float(N) > float(min_bpp))
    if start_depth > 1:
        depths = jnp.arange(1, max_depth + 1)
        cond = cond & (depths >= start_depth)
    idx = jnp.where(jnp.any(cond), jnp.argmax(cond), max_depth - 1).astype(jnp.int32)

    centers_all = jnp.stack(
        [morton_decode(sc >> (3 * (max_depth - d)), d) for d in range(1, max_depth + 1)]
    )                                             # [max_depth, S, 3]
    rec_xyz = jnp.take(centers_all, idx, axis=0)
    return OctreeResult(
        rec_xyz=rec_xyz,
        depth=idx + 1,
        total_bits=jnp.take(bits_per_depth, idx),
        sorted_codes=sc,
    )
