"""End-to-end compiled codec pipelines (IPDAE patch pipeline).

Design stance (SURVEY.md §7): everything per-cloud is ONE jitted XLA
program. Where the reference interleaves host and device every step —
.cpu().numpy() octree round-trip inside the train loop (train.py:175-179),
a per-patch Python loop through the encoder (compress.py:112-122), CDF
shuttling — here the device computes normalize → FPS → octree analysis →
KNN patching → AE → PMF → CDF in one pass over all S patches, and the host
only (a) serializes/parses the skeleton bits and (b) runs the C++ range
coder over the latent stream.

On-disk contract matches the reference (compress.py:139-152):
  {name}.p.bin  — range-coded latents
  {name}.s.bin  — packed octree occupancy bits
  {name}.c.bin  — float32[4]: center xyz + longest extent
"""

from __future__ import annotations

import functools
import os
import time
from concurrent.futures import ThreadPoolExecutor
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from pcc_tpu.coding import rangecoder
from pcc_tpu.coding.octree import octree_analyze
from pcc_tpu.coding.octree_host import (
    codes_to_points,
    emit_octree_bits,
    pack_bits,
    parse_octree_bits,
    unpack_bits,
)
from pcc_tpu.coding.pmf import pmf_to_cdf, pmf_to_quantized_cdf
from pcc_tpu.config import CodecConfig
from pcc_tpu.models.ipdae import ConditionalProbabilityModel, PatchAE
from pcc_tpu.ops.fps import fps_batch
from pcc_tpu.ops.knn import knn_points
from pcc_tpu.ops.normalize import denormalize, normalize


def _fetch_all(*arrays):
    """Materialize device arrays on the host, starting ALL copies async
    first: each blocking fetch over the remote-attached device tunnel costs
    a full round trip, so serial np.asarray calls pay ~30ms apiece while
    async-then-gather pays one."""
    for a in arrays:
        if hasattr(a, "copy_to_host_async"):
            a.copy_to_host_async()
    return [np.asarray(a) for a in arrays]


def make_models(cfg: CodecConfig):
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None
    if cfg.model == "PPPF-AE":
        from pcc_tpu.models.pppf import (
            PPPF_AE, PPPFConditionalProbabilityModel)

        # fused_sa drives the PN++ fused SA stages (ops/pppf_sa_pallas.py)
        # for the AE encoder; the float CPM stays unfused — in the default
        # integer cdf_mode it never runs (coding/iprob_pppf.py replaces it),
        # and in the legacy float mode its bits feed the coding CDFs.
        ae = PPPF_AE(K=cfg.K, k=cfg.k, d=cfg.d, L=cfg.L, dtype=dtype,
                     fused=cfg.fused_sa)
        prob = PPPFConditionalProbabilityModel(d=cfg.d, L=cfg.L, dtype=dtype)
        return ae, prob
    ae = PatchAE(K=cfg.K, k=cfg.k, d=cfg.d, L=cfg.L, sa_knn=cfg.sa_knn,
                 dtype=dtype, fused_sa=cfg.fused_sa,
                 fused_decode=cfg.fused_decode)
    prob = ConditionalProbabilityModel(d=cfg.d, L=cfg.L, dtype=dtype)
    return ae, prob


def init_params(key: jax.Array, cfg: CodecConfig):
    ae, prob = make_models(cfg)
    k1, k2 = jax.random.split(key)
    ae_params = ae.init(k1, jnp.zeros((1, cfg.K, 3), jnp.float32))
    prob_params = prob.init(k2, jnp.zeros((1, cfg.S, 3), jnp.float32))
    return ae_params, prob_params


class EncodeResult(NamedTuple):
    sym: jnp.ndarray          # [S, d] int8 symbols in [0, L)
    sorted_codes: jnp.ndarray  # [S] int32 max-depth Morton codes (descending)
    depth: jnp.ndarray        # scalar int32
    skeleton_bits: jnp.ndarray  # scalar int32
    center: jnp.ndarray       # [3]
    longest: jnp.ndarray      # scalar
    rec_xyz: jnp.ndarray      # [S, 3] decoded skeleton (normalized coords)


def _skeleton_geometry(pc01, sampled, *, cfg: CodecConfig):
    """Octree analysis + KNN patch extraction for one cloud — the
    model-independent geometry half of the encoder (train.py:175-192).

    Patches form around the *decoded* skeleton (train.py:185-189): the
    decoder only ever sees octree-reconstructed centroids."""
    octree = octree_analyze(sampled, cfg.N, cfg.min_bpp, cfg.max_depth)
    _, _, grouped = knn_points(octree.rec_xyz[None], pc01[None], K=cfg.K,
                               return_nn=True)
    patches = (grouped[0] - octree.rec_xyz[:, None, :]) * cfg.patch_scale
    return octree, patches


def _batched_geometry(pc01, sampled, *, cfg: CodecConfig):
    """Batched octree analysis + KNN patching: [B, N, 3] clouds +
    [B, S, 3] FPS samples -> (octree fields with leading B, patches
    [B, S, K, 3]). Only the octree runs under vmap; KNN patching runs as
    one native-batch op (the MXU-friendlier shape, and it keeps the
    selection out of a vmap batching transform)."""
    octree = jax.vmap(functools.partial(
        octree_analyze, N=cfg.N, min_bpp=cfg.min_bpp,
        max_depth=cfg.max_depth))(sampled)
    if cfg.pruned_knn:
        # Morton-chunk-pruned exact selection (ops/knn_pruned.py):
        # bit-identical patches to knn_points — same coords, same order,
        # same tie contract — at ~0.35x its device cost. Pure XLA, so it
        # stays GSPMD-partitionable and falls back to knn_points itself
        # when the shape offers nothing to prune.
        from pcc_tpu.ops.knn_pruned import knn_grouped_pruned

        grouped, _ = knn_grouped_pruned(octree.rec_xyz, pc01, K=cfg.K)
    else:
        _, _, grouped = knn_points(octree.rec_xyz, pc01, K=cfg.K,
                                   return_nn=True)
    patches = (grouped - octree.rec_xyz[:, :, None, :]) * cfg.patch_scale
    return octree, patches


def encode_clouds(ae_params, prob_params, pcs, fps_starts, *,
                  cfg: CodecConfig) -> EncodeResult:
    """Batched analysis transform [B, N, 3] -> EncodeResult with leading B
    (compress.py:78-136, all clouds and all patches in one XLA program).
    FPS runs as one batched Pallas kernel on TPU (ops/fps_pallas.py)."""
    pc01, center, longest = jax.vmap(
        functools.partial(normalize, margin=cfg.margin))(pcs)
    idx = fps_batch(pc01, cfg.S, fps_starts)
    sampled = jnp.take_along_axis(pc01, idx[..., None], axis=1)       # [B, S, 3]
    # Only the per-cloud geometry runs under vmap; the AE encoder sees all
    # B*S patches flattened into its own batch axis. Keeps both families'
    # Pallas kernels (PPPF's internal FPS, IPDAE's fused SetAbstraction —
    # ops/sa_pallas.py) out of a vmap batching transform, and is the
    # MXU-friendlier shape either way.
    ae, _ = make_models(cfg)
    octree, patches = _batched_geometry(pc01, sampled, cfg=cfg)
    B, S = patches.shape[:2]
    latent = ae.apply(ae_params, patches.reshape(B * S, cfg.K, 3),
                      method="encode")                               # [B*S, d]
    sym = jnp.clip(jnp.round(latent) + cfg.L // 2, 0,
                   cfg.L - 1).astype(jnp.int8).reshape(B, S, cfg.d)
    return EncodeResult(
        sym=sym,
        sorted_codes=octree.sorted_codes,
        depth=octree.depth,
        skeleton_bits=octree.total_bits,
        center=center,
        longest=longest,
        rec_xyz=octree.rec_xyz,
    )


def encode_clouds_packed_input(ae_params, prob_params, q, lo, scale,
                               fps_starts, *, cfg: CodecConfig):
    """encode_clouds over a packed 3x10-bit-per-point host upload.

    The axon tunnel moves ~30 MB/s, so the cloud upload per 128-batch is
    the encode pipeline's single biggest transfer (bench --profile): 12.6 MB
    as float32, 6.3 MB as uint16 fixed point, 4.2 MB as one uint32 per
    point holding all three 10-bit coordinates (this layout). Resolution is
    extent/1023 ~ 1e-3 of the cloud's own bounding box per axis — the added
    quantization MSE is ~0.2% of the codec's reconstruction MSE at the
    golden operating point (analytically 3*(1e-3)^2/12 = 2.5e-7 extent^2
    vs ~1.2e-4; measured < 0.02 dB D1 on a trained model, A/B vs the
    uint16 packing this replaces). The device depacks with three shifts and
    one fused multiply-add.
    """
    qi = q.astype(jnp.int32)                               # values < 2^30
    v = jnp.stack([qi & 1023, (qi >> 10) & 1023, (qi >> 20) & 1023],
                  axis=-1).astype(jnp.float32)             # [B, N, 3]
    pcs = v * (scale / 1023.0)[:, None, :] + lo[:, None, :]
    return encode_clouds(ae_params, prob_params, pcs, fps_starts, cfg=cfg)


def pack_clouds_u10(pcs: np.ndarray):
    """Host-side vectorized packing [B, N, 3] f32 -> (uint32 [B, N] with
    x | y<<10 | z<<20, lo [B, 3], scale [B, 3])."""
    lo = pcs.min(axis=1)
    scale = np.maximum(pcs.max(axis=1) - lo, 1e-12).astype(np.float32)
    q = np.rint((pcs - lo[:, None, :])
                * (1023.0 / scale)[:, None, :]).astype(np.uint32)
    return (q[..., 0] | (q[..., 1] << 10) | (q[..., 2] << 20),
            lo.astype(np.float32), scale)


def pack_encode_upload(pcs: np.ndarray, starts: np.ndarray) -> np.ndarray:
    """Host-side single-buffer encode upload: [B, N, 3] f32 + starts [B]
    -> one uint32 [B, N+7] row per cloud (q u10x3 | lo bits x3 | scale
    bits x3 | fps start). The axon tunnel charges a ~28 ms round trip PER
    TRANSFER on top of payload bytes, so the previous 4-array upload
    (q, lo, scale, starts) paid 3 extra round trips every batch — measured
    210 ms -> 107 ms for the same 4.2 MB by packing into one buffer."""
    q, lo, scale = pack_clouds_u10(pcs)
    B = q.shape[0]
    return np.concatenate([
        q, lo.view(np.uint32), scale.view(np.uint32),
        np.ascontiguousarray(np.asarray(starts, np.int32).reshape(B, 1))
        .view(np.uint32),
    ], axis=1)


def unpack_encode_upload(packed: jnp.ndarray, N: int):
    """Device inverse of pack_encode_upload: [B, N+7] u32 ->
    (q u32 [B, N], lo f32 [B, 3], scale f32 [B, 3], starts i32 [B])."""
    q = packed[:, :N]
    lo = jax.lax.bitcast_convert_type(packed[:, N:N + 3], jnp.float32)
    scale = jax.lax.bitcast_convert_type(packed[:, N + 3:N + 6], jnp.float32)
    starts = packed[:, N + 6].astype(jnp.int32)
    return q, lo, scale, starts


def encode_cloud(ae_params, prob_params, pc, fps_start, *, cfg: CodecConfig):
    """Single-cloud analysis transform [N, 3] (compress.py:78-136)."""
    res = encode_clouds(ae_params, prob_params, pc[None],
                        fps_start[None] if hasattr(fps_start, "shape")
                        else jnp.asarray([fps_start], jnp.int32), cfg=cfg)
    return jax.tree.map(lambda x: x[0], res)


def skeleton_cdf(prob_params, rec_xyz, *, cfg: CodecConfig):
    """PMF→quantized-CDF from the decoded skeleton alone
    (decompress.py:88-92). Quantization to the range coder's uint16
    staircase happens ON DEVICE so the host fetches 2-byte rows — half the
    tunnel transfer of a float32 CDF, and no host float64 pass."""
    _, prob = make_models(cfg)
    pmf = prob.apply(prob_params, rec_xyz[None])[0]
    return pmf_to_quantized_cdf(pmf)


def integer_pmf_weights(iprob_bundle, rec_xyz, *, cfg: CodecConfig):
    """Family dispatch for the deterministic integer conditional
    probability model: coding/iprob.py covers IPDAE's plain PointNet trunk
    (and the attribute CPM, which shares that architecture); coding/
    iprob_pppf.py extends the same fixed-point spec to PPPF's PN++
    backbone. [B, S, 3] skeletons -> [B, S, d, L] int32 Q16 weights,
    bit-equal across any pair of compiled programs."""
    if cfg.model == "PPPF-AE":
        from pcc_tpu.coding.iprob_pppf import pppf_pmf_weights

        return pppf_pmf_weights(iprob_bundle, rec_xyz, d=cfg.d, L=cfg.L)
    from pcc_tpu.coding.iprob import iprob_pmf_weights

    return iprob_pmf_weights(iprob_bundle, rec_xyz, d=cfg.d, L=cfg.L)


def skeleton_pmf_weights(iprob_bundle, rec_xyz, *, cfg: CodecConfig = None,
                         d=None, L=None):
    """Deterministic integer coding path (coding/iprob.py + iprob_pppf.py):
    [B, S, 3] skeletons -> uint16 Q16 softmax weights [B, S, d, L]. The
    host derives the CDF staircase with pure integer ops
    (weights_to_cdf_rows), so the encoder and decoder CDFs are
    byte-identical across ANY pair of compiled programs — the
    cross-topology guarantee the float path lacks (parallel/mesh.py's
    documented ±1-bin drift). Also the cheaper fetch: d*L uint16
    weights/row instead of d*(L+1) CDF entries.

    cfg=None keeps the IPDAE-only call shape (d/L read from a concrete
    bundle, or passed explicitly); pass cfg for family dispatch (PPPF) or
    when the bundle is a jit argument."""
    if cfg is None:
        from pcc_tpu.coding.iprob import iprob_pmf_weights

        return iprob_pmf_weights(iprob_bundle, rec_xyz,
                                 d=d, L=L).astype(jnp.uint16)
    return integer_pmf_weights(iprob_bundle, rec_xyz,
                               cfg=cfg).astype(jnp.uint16)


def cdf_checksum(cdf_rows: np.ndarray) -> bytes:
    """4-byte little-endian checksum of quantized CDF rows.

    Float-CDF streams (the legacy cdf_mode='float' fallback) are decodable
    only when the decoder's compiled CDF program reproduces the encoder's
    quantized rows exactly — a ±1-bin drift across compilations desyncs
    the range coder into plausible-looking garbage (parallel/mesh.py's
    documented hazard; r2 advisor finding 4). The encoder appends this
    checksum as a .p.bin trailer so a drifted decoder fails LOUDLY with a
    clear error instead. Integer-mode streams don't carry it: their CDFs
    are byte-deterministic by construction (coding/iprob.py)."""
    import zlib

    arr = np.ascontiguousarray(np.asarray(cdf_rows, np.int32))
    return (zlib.crc32(arr.tobytes()) & 0xFFFFFFFF).to_bytes(4, "little")


def _u8(x):
    """Bitcast any array to uint8 bytes, flattened per leading row:
    [B, ...] -> [B, nbytes]. Little-endian on both TPU and x86, so the
    host reinterprets with plain numpy views."""
    if x.dtype != jnp.uint8:
        x = jax.lax.bitcast_convert_type(x, jnp.uint8)
    return x.reshape(x.shape[0], -1)


def encode_buffer_layout(cfg: CodecConfig):
    """Byte offsets of the packed per-cloud encode row (all 4-aligned):
    codes i32[S] | depth i32 | center f32[3] | longest f32 |
    weights u16[S,d,L] | sym i8[S,d]."""
    S, d, L = cfg.S, cfg.d, cfg.L
    o_codes, o_depth = 0, 4 * S
    o_center, o_longest = o_depth + 4, o_depth + 16
    o_w = o_depth + 20
    o_sym = o_w + 2 * S * d * L
    return {"codes": o_codes, "depth": o_depth, "center": o_center,
            "longest": o_longest, "weights": o_w, "sym": o_sym,
            "total": o_sym + S * d}


def encode_bounds_layout(cfg: CodecConfig):
    """Byte offsets of the bounds-packed encode row (all 4-aligned):
    codes i32[S] | depth i32 | center f32[3] | longest f32 |
    start u16[S,d] | size u16[S,d]. 4.3 KB/cloud at the default config vs
    the weights layout's 15.6 KB — the encode fetch carries only each
    symbol's own coding interval (iprob.iprob_encode_bounds)."""
    S, d = cfg.S, cfg.d
    o_codes, o_depth = 0, 4 * S
    o_center, o_longest = o_depth + 4, o_depth + 16
    o_start = o_depth + 20
    o_size = o_start + 2 * S * d
    return {"codes": o_codes, "depth": o_depth, "center": o_center,
            "longest": o_longest, "start": o_start, "size": o_size,
            "total": o_size + 2 * S * d}


def encode_clouds_packed_bounds(ae_params, prob_params, q, lo, scale,
                                fps_starts, *, iprob_bundle,
                                cfg: CodecConfig):
    """Integer-cdf encode emitting per-symbol coding INTERVALS instead of
    PMF weight rows (layout: encode_bounds_layout). Same single-buffer
    single-fetch contract as encode_clouds_packed_io; the range coder's
    byte output is unchanged (the intervals equal the host staircase's
    entries bit-for-bit, tests/test_iprob.py)."""
    from pcc_tpu.coding.iprob import encode_bounds_from_weights

    res = encode_clouds_packed_input(ae_params, prob_params, q, lo, scale,
                                     fps_starts, cfg=cfg)
    w = integer_pmf_weights(iprob_bundle, res.rec_xyz, cfg=cfg)
    start, size = encode_bounds_from_weights(w, res.sym)
    return jnp.concatenate([
        _u8(res.sorted_codes), _u8(res.depth[:, None]),
        _u8(res.center), _u8(res.longest[:, None]),
        _u8(start), _u8(size),
    ], axis=1)


def unpack_encode_bounds_buffer(buf: np.ndarray, *, cfg: CodecConfig):
    """Host inverse of encode_clouds_packed_bounds: [B, PB] uint8 ->
    (start u16 [B,S,d], size u16 [B,S,d], depths i32 [B], codes i32 [B,S],
    centers f32 [B,3], longests f32 [B])."""
    o = encode_bounds_layout(cfg)
    if not buf.flags["C_CONTIGUOUS"]:
        buf = np.ascontiguousarray(buf)   # axon fetches come back strided
    B = buf.shape[0]
    S, d = cfg.S, cfg.d
    codes = buf[:, o["codes"]:o["depth"]].view(np.int32)
    depth = buf[:, o["depth"]:o["center"]].view(np.int32)[:, 0]
    center = buf[:, o["center"]:o["longest"]].view(np.float32)
    longest = buf[:, o["longest"]:o["start"]].view(np.float32)[:, 0]
    start = buf[:, o["start"]:o["size"]].view(np.uint16).reshape(B, S, d)
    size = buf[:, o["size"]:].view(np.uint16).reshape(B, S, d)
    return start, size, depth, codes, center, longest


def encode_clouds_packed_io(ae_params, prob_params, q, lo, scale,
                            fps_starts, *, iprob_bundle, cfg: CodecConfig):
    """Integer-cdf encode with ALL outputs packed into one [B, PB] uint8
    buffer (layout: encode_buffer_layout).

    Why one buffer: each device->host array fetch over the axon tunnel pays
    its own ~30 ms round trip, and concurrent async fetches of several
    arrays occasionally stall for seconds (measured: 6 arrays of 2 MB total
    170-520 ms and worse, one packed 2 MB buffer a steady ~120 ms). The
    coding weights come from the deterministic integer path (coding/iprob),
    so folding them into the encode program cannot desync encoder/decoder
    CDFs — bit-equality across programs holds by construction."""
    res = encode_clouds_packed_input(ae_params, prob_params, q, lo, scale,
                                     fps_starts, cfg=cfg)
    w = skeleton_pmf_weights(iprob_bundle, res.rec_xyz,
                             cfg=cfg)                        # [B,S,d,L] u16
    return jnp.concatenate([
        _u8(res.sorted_codes), _u8(res.depth[:, None]),
        _u8(res.center), _u8(res.longest[:, None]),
        _u8(w), _u8(res.sym),
    ], axis=1)


def unpack_encode_buffer(buf: np.ndarray, *, cfg: CodecConfig):
    """Host inverse of encode_clouds_packed_io: [B, PB] uint8 ->
    (syms int8 [B,S,d], weights u16 [B,S,d,L], depths i32 [B],
    codes i32 [B,S], centers f32 [B,3], longests f32 [B]) — numpy views,
    no copies (row slices keep the last axis contiguous)."""
    o = encode_buffer_layout(cfg)
    if not buf.flags["C_CONTIGUOUS"]:
        buf = np.ascontiguousarray(buf)   # axon fetches come back strided
    B = buf.shape[0]
    S, d, L = cfg.S, cfg.d, cfg.L
    codes = buf[:, o["codes"]:o["depth"]].view(np.int32)
    depth = buf[:, o["depth"]:o["center"]].view(np.int32)[:, 0]
    center = buf[:, o["center"]:o["longest"]].view(np.float32)
    longest = buf[:, o["longest"]:o["weights"]].view(np.float32)[:, 0]
    w = buf[:, o["weights"]:o["sym"]].view(np.uint16).reshape(B, S, d, L)
    sym = buf[:, o["sym"]:].view(np.int8).reshape(B, S, d)
    return sym, w, depth, codes, center, longest


def decode_clouds_packed_io(ae_params, sym, rec_xyz, *, cfg: CodecConfig):
    """decode_clouds_packed with both outputs in one [B, 12S + 3Sk] uint8
    buffer (scale f32 [S,3] first, then q int8 [S,k,3]) — single fetch."""
    q, scale = decode_clouds_packed(ae_params, sym, rec_xyz, cfg=cfg)
    return jnp.concatenate([_u8(scale), _u8(q)], axis=1)


def decode_clouds_entropy_io(ae_params, rec_xyz, streams_u8, *,
                             iprob_bundle, cfg: CodecConfig):
    """ONE-program decompress for the integer cdf mode: integer CDF
    staircase -> lane-parallel range decode of the raw .p.bin byte streams
    (coding/rc_device.py) -> decoder network -> packed output buffer.

    The host uploads only the parsed skeletons and the zero-padded byte
    streams (~0.15 MB per 128-batch) and fetches one packed buffer — no
    PMF-weight fetch (1.8 MB), no separate CDF dispatch, no host range
    decoding. Symbol parity with the host coder is pinned by
    tests/test_rc_device.py."""
    from pcc_tpu.coding.rc_device import range_decode_batch, staircase_full

    B, S = rec_xyz.shape[:2]
    w = integer_pmf_weights(iprob_bundle, rec_xyz, cfg=cfg)  # [B, S, d, L]
    cdf = staircase_full(w).reshape(B, S * cfg.d, cfg.L + 1)
    syms = range_decode_batch(cdf, streams_u8)
    sym = syms.reshape(B, S, cfg.d).astype(jnp.int8)
    return decode_clouds_packed_io(ae_params, sym, rec_xyz, cfg=cfg)


def unpack_decode_buffer(buf: np.ndarray, S: int):
    """[B, 12S + 3Sk] uint8 -> (q int8 [B,S,k,3], scale f32 [B,S,3])."""
    if not buf.flags["C_CONTIGUOUS"]:
        buf = np.ascontiguousarray(buf)   # axon fetches come back strided
    B = buf.shape[0]
    scale = buf[:, :12 * S].view(np.float32).reshape(B, S, 3)
    q = buf[:, 12 * S:].view(np.int8).reshape(B, S, -1, 3)
    return q, scale


def skeleton_cdf_batch(prob_params, rec_xyz, *, cfg: CodecConfig):
    """Batched skeleton CDF [B, S, 3] -> [B, S, d, L+1]. Used for models
    whose probability backbone itself contains FPS/ball-query stages (PPPF):
    feeding the native batch axis keeps the Pallas FPS kernel out of a vmap
    batching transform."""
    _, prob = make_models(cfg)
    return pmf_to_quantized_cdf(prob.apply(prob_params, rec_xyz))


def decode_clouds_packed(ae_params, sym, rec_xyz, *, cfg: CodecConfig):
    """Batched synthesis transform with skeleton-delta packed transfers:
    [B, S, d] symbols + [B, S, 3] skeletons -> (int8 patch offsets
    [B, S, k, 3], per-patch scale [B, S, 3]).

    The decoded-cloud fetch is the decompress path's dominant tunnel cost.
    The host already holds the skeleton (it parsed .s.bin to dispatch this
    program), so only the patch OFFSETS around each skeleton point need to
    come back: int8 against a per-patch absmax scale is 1 byte/coord
    instead of 2 (6.3 -> 3.2 MB per 128-batch at N=8192). Resolution is
    absmax/127 of the patch radius (~1e-3 of the cloud extent), an order
    of magnitude below the codec's own ~6e-3 RMSE at the golden operating
    point; the host reconstructs skeleton + offset in one vectorized pass.

    All B*S patches run through the decoder as ONE flat batch — the
    decode-side mirror of encode_clouds' flattening, which keeps the fused
    Pallas decoder (ops/decoder_pallas.py) out of a vmap batching
    transform and feeds the MXU its natural shape."""
    ae, _ = make_models(cfg)
    B, S = sym.shape[:2]
    latent_q = (sym.astype(jnp.float32) - cfg.L // 2).reshape(B * S, cfg.d)
    patches = ae.apply(ae_params, latent_q, method="decode")  # [B*S, k|K, 3]
    off = patches.reshape(B, S, -1, 3) / cfg.patch_scale      # [B, S, k, 3]
    scale = jnp.maximum(jnp.max(jnp.abs(off), axis=2), 1e-12)  # [B, S, 3]
    q = jnp.round(off / scale[:, :, None, :] * 127.0).astype(jnp.int8)
    return q, scale


def decode_cloud_packed(ae_params, sym, rec_xyz, *, cfg: CodecConfig):
    """Single-cloud twin of decode_clouds_packed: [S, d] symbols ->
    (int8 patch offsets [S, k, 3], per-patch scale [S, 3]). The host adds
    the skeleton it already parsed and denormalizes."""
    ae, _ = make_models(cfg)
    latent_q = sym.astype(jnp.float32) - cfg.L // 2
    patches = ae.apply(ae_params, latent_q, method="decode")   # [S, k, 3]
    off = patches / cfg.patch_scale
    scale = jnp.maximum(jnp.max(jnp.abs(off), axis=1), 1e-12)  # [S, 3]
    q = jnp.round(off / scale[:, None, :] * 127.0).astype(jnp.int8)
    return q, scale


def decode_cloud(ae_params, sym, rec_xyz, center, longest, *, cfg: CodecConfig):
    """Synthesis transform: symbols + skeleton -> cloud [S*k, 3]
    (decompress.py:93-116)."""
    ae, _ = make_models(cfg)
    latent_q = sym.astype(jnp.float32) - cfg.L // 2
    # [S, k, 3] for IPDAE; [S, d*d, 3] for PPPF (PPPF_AE.py:118-123)
    patches = ae.apply(ae_params, latent_q, method="decode")
    patches = patches / cfg.patch_scale
    pc01 = (patches + rec_xyz[:, None, :]).reshape(-1, 3)
    return denormalize(pc01, center, longest, cfg.margin)


class _InflightGate:
    """Adaptive in-flight batch cap for the codec's software pipelines.

    The axon tunnel has a concurrent-transfer stall pathology: several
    multi-MB uploads in flight at once can hang for seconds. It shows up
    on the host as a long block in the main thread's slot wait (the
    ``futs[-depth].result()`` that bounds how many batches are
    dispatched-but-uncollected). Rather than pinning the pipeline depth
    to one day's tunnel calibration, this gate:

    * starts at the configured cap (``PCC_INFLIGHT``, default 2),
    * collapses to depth 1 the moment a slot wait exceeds the stall
      threshold (``PCC_STALL_S``, default 2.0 s — steady-state waits are
      ~0.1-0.3 s, stalls are seconds),
    * creeps back toward the cap after ``recover`` consecutive fast
      waits (< 1/4 of the threshold), so a transient stall does not
      permanently serialize a long run.

    The first wait after construction is ignored: batch 0's wait
    includes remote compilation (30-500 s here) and cold-path dispatch,
    neither of which says anything about transfer concurrency.
    ``PCC_INFLIGHT_FIXED=1`` disables adaptation (fixed legacy depth).
    """

    def __init__(self, cap: int | None = None, stall_s: float | None = None,
                 recover: int = 4):
        if cap is None:
            cap = max(1, int(os.environ.get("PCC_INFLIGHT", "2")))
        if stall_s is None:
            stall_s = float(os.environ.get("PCC_STALL_S", "2.0"))
        self.cap = max(1, cap)
        self.depth = self.cap
        self.stall_s = stall_s
        self.recover = max(1, recover)
        self._fixed = os.environ.get("PCC_INFLIGHT_FIXED", "0") == "1"
        self._fast = 0
        self._warmup = 1  # waits to ignore (compile/cold dispatch)
        self.stalls = 0   # total stall events (introspection/tests)

    def record(self, dt: float) -> None:
        """Feed one observed slot-wait duration; adjust depth."""
        if self._fixed:
            return
        if self._warmup > 0:
            self._warmup -= 1
            return
        if dt > self.stall_s:
            self.stalls += 1
            self.depth = 1
            self._fast = 0
        elif dt < 0.25 * self.stall_s:
            self._fast += 1
            if self._fast >= self.recover and self.depth < self.cap:
                self.depth += 1
                self._fast = 0
        else:
            self._fast = 0

    def wait_slot(self, futs: list) -> None:
        """Block until at most ``depth-1`` of ``futs`` are still pending
        ahead of the next append, timing the block as the stall signal."""
        if len(futs) >= self.depth:
            t0 = time.monotonic()
            futs[-self.depth].result()
            self.record(time.monotonic() - t0)


class Codec:
    """Host-side wrapper: jitted device pipelines + bitstream serialization.

    Multi-cloud calls batch many clouds into ONE device dispatch (vmap over
    the cloud axis) and overlap device compute with host bit serialization:
    while the host range-codes batch i, batch i+1 is already executing on
    the TPU (JAX's async dispatch). This amortizes per-dispatch latency and
    keeps both sides busy — the reference instead serializes everything,
    cloud by cloud, patch by patch (compress.py:78-155).
    """

    def __init__(self, cfg: CodecConfig, ae_params, prob_params,
                 batch_size: int = 16, host_threads: int = 8, mesh=None):
        """mesh: optional jax.sharding.Mesh — batch compression/decompression
        then runs data-parallel over its devices (each chip codes a shard of
        every dispatch batch; parity with parallel/mesh.py builders). The
        fused Pallas kernels are single-program and stay off on a mesh; with
        the default integer cdf_mode the streams remain byte-compatible with
        ANY other topology's codec (tests/test_parallel.py)."""
        import dataclasses

        self.mesh = mesh
        if mesh is not None:
            n_dev = int(np.prod(mesh.devices.shape))
            if batch_size % n_dev:
                raise ValueError(
                    f"batch_size {batch_size} not divisible by the "
                    f"{n_dev}-device mesh")
        # the fused Pallas kernels run under plain single-chip jit, and on
        # a mesh via shard_map (each chip runs the whole single-chip
        # program on its shard of the cloud batch — per-cloud work has no
        # cross-shard dependence, so shard_map is exact)
        self.cfg = dataclasses.replace(cfg, fused_sa=True, fused_decode=True)
        self.ae_params = ae_params
        self.prob_params = prob_params
        self.batch_size = batch_size
        self._encode_cache = {}
        self._decode_cache = {}
        # integer-deterministic coding CDFs (config.py::cdf_mode): convert
        # the float prob checkpoint once (deterministic host pass) and keep
        # the fixed-point bundle on device; the host turns fetched uint16
        # weights into CDF rows with integer ops
        self._integer_cdf = cfg.cdf_mode == "integer"
        if self._integer_cdf:
            from pcc_tpu.coding.iprob import (bounds_supported,
                                              weights_to_cdf_rows)

            # encode-side interval fetch (4 B/symbol) instead of weight
            # rows; falls back to rows for L beyond the int32-exact proof
            self._bounds = bounds_supported(cfg.L)

            if cfg.model == "PPPF-AE":
                from pcc_tpu.coding.iprob_pppf import (
                    convert_pppf_prob_params)

                raw = convert_pppf_prob_params(prob_params, cfg.d, cfg.L,
                                               S=cfg.S)
            else:
                from pcc_tpu.coding.iprob import convert_prob_params

                raw = convert_prob_params(prob_params, cfg.d, cfg.L)
            # the device bundle is passed as a jit ARGUMENT (see
            # _encode_fn); drop the static "d"/"L" ints so every leaf is a
            # traceable array, and supply d/L from cfg at the call sites
            self._iprob = jax.tree.map(
                jnp.asarray,
                {k: v for k, v in raw.items() if k not in ("d", "L")})
            self._cdf_host = weights_to_cdf_rows
        else:
            self._cdf_host = lambda c: np.asarray(c, dtype=np.int32)
        # host bit serialization is per-cloud independent; the C++ range
        # coder releases the GIL inside ctypes calls, so a thread pool
        # parallelizes it across clouds while the TPU runs the next batch
        self._pool = ThreadPoolExecutor(max_workers=host_threads)
        # dedicated single-worker fetch thread: a device->host fetch of an
        # already-computed buffer fully overlaps the NEXT batch's device
        # compute over the axon tunnel when issued from another thread
        # (measured: 3.2 MB fetch + 132 ms program = 130 ms overlapped vs
        # 223 serial). One worker keeps fetches FIFO with dispatch order.
        self._fetch_pool = ThreadPoolExecutor(max_workers=1)
        # max batches in flight (dispatched, not yet collected). More than
        # 2 puts several 4.2 MB uploads on the tunnel at once, which trips
        # its concurrent-transfer stall pathology (seconds-long hangs —
        # the same failure mode _fetch_all's packed-buffer note documents).
        # The depth ADAPTS at runtime: a stalled slot wait collapses it to
        # 1, sustained fast waits restore it (see _InflightGate). Env:
        # PCC_INFLIGHT (cap), PCC_STALL_S, PCC_INFLIGHT_FIXED=1 to pin.
        # One gate PER pipeline (encode / fused decode / float decode):
        # each pipeline's first wait includes its own program's remote
        # compile (30-500 s here), and a shared gate would misclassify the
        # second and third pipelines' compile waits as tunnel stalls.
        self._gates: dict = {}

    def _gate(self, pipeline: str) -> _InflightGate:
        gate = self._gates.get(pipeline)
        if gate is None:
            gate = self._gates[pipeline] = _InflightGate()
        return gate

    def _shard_map(self, fn, n_in_sharded, n_in_repl):
        """Wrap fn(*repl_args, *sharded_args) in shard_map over the cloud
        axis: every chip runs the WHOLE single-chip program — including the
        fused Pallas kernels, which plain GSPMD cannot partition — on its
        local batch shard (VERDICT r2 item 8)."""
        from jax.sharding import PartitionSpec as P

        in_specs = (P(),) * n_in_repl + (P("data"),) * n_in_sharded
        return jax.shard_map(fn, mesh=self.mesh, in_specs=in_specs,
                             out_specs=P("data"), check_vma=False)

    def _encode_fn(self, N: int):
        """Batched encode jit (packed uint16 upload), cached per cloud size.

        Integer cdf_mode returns the single-buffer program
        (encode_clouds_packed_io): one fetch per batch instead of six."""
        if N not in self._encode_cache:
            cfg = self.cfg.with_n(N)
            if self._integer_cdf:
                # the bundle is an EXPLICIT argument, never a jit closure
                # constant: a closed-over pytree of device arrays can hit a
                # jit fastpath arity mismatch on the second call of the
                # same compiled function ("Execution supplied N buffers but
                # compiled program expected M") — reproduced with two Codec
                # instances in one process. Explicit args have
                # deterministic arity everywhere, and shard_map replicates
                # them cleanly.
                enc_prog = (encode_clouds_packed_bounds if self._bounds
                            else encode_clouds_packed_io)
                base = functools.partial(enc_prog, cfg=cfg)

                def fn(ae, prob, bundle, packed, _base=base):
                    q, lo, scale, starts = unpack_encode_upload(packed, N)
                    return _base(ae, prob, q, lo, scale, starts,
                                 iprob_bundle=bundle)
                n_repl = 3
            else:
                base_f = functools.partial(encode_clouds_packed_input,
                                           cfg=cfg)

                def fn(ae, prob, packed, _base=base_f):
                    q, lo, scale, starts = unpack_encode_upload(packed, N)
                    return _base(ae, prob, q, lo, scale, starts)
                n_repl = 2
            if self.mesh is not None:
                fn = self._shard_map(fn, n_in_sharded=1, n_in_repl=n_repl)
            self._encode_cache[N] = jax.jit(fn)
        return self._encode_cache[N]

    def _decode_fns(self, S: int):
        """decompress derives S from the parsed skeleton (decompress.py:85);
        jits are cached per S."""
        if S not in self._decode_cache:
            # N is inferred as S*k on the decode side (decompress.py:104-107)
            # so the patch scale matches whatever N the encoder saw.
            cfg = self.cfg.with_n(S * self.cfg.k)
            if self._integer_cdf:
                # callers pass self._iprob as the first argument (the
                # bundle is never a closure constant — see _encode_fn)
                cdf_raw = functools.partial(skeleton_pmf_weights, cfg=cfg)
            elif cfg.model == "PPPF-AE":
                cdf_raw = functools.partial(skeleton_cdf_batch, cfg=cfg)
            else:
                cdf_raw = jax.vmap(functools.partial(skeleton_cdf, cfg=cfg),
                                   in_axes=(None, 0))
            dec_raw = functools.partial(decode_clouds_packed_io, cfg=cfg)
            if self.mesh is not None:
                cdf_raw = self._shard_map(cdf_raw, n_in_sharded=1,
                                          n_in_repl=1)
                dec_raw = self._shard_map(dec_raw, n_in_sharded=2,
                                          n_in_repl=1)
            self._decode_cache[S] = (jax.jit(cdf_raw), jax.jit(dec_raw))
        return self._decode_cache[S]

    # ------------------------------------------------------------- encode --

    def compress(self, pc: np.ndarray, fps_start: int = 0):
        """[N, 3] float32 -> (p_bytes, s_bytes, c_bytes)."""
        return self.compress_many([pc], [fps_start])[0]

    def compress_many(self, clouds, fps_starts=None):
        """Compress a list of [N, 3] clouds -> list of (p, s, c) bytes.

        Clouds of equal N are batched into single dispatches; device batches
        are pipelined ahead of host serialization.
        """
        if fps_starts is None:
            fps_starts = [0] * len(clouds)
        results: list = [None] * len(clouds)

        # group indices by cloud size (S and the jit depend on N)
        by_n: dict[int, list[int]] = {}
        for i, pc in enumerate(clouds):
            by_n.setdefault(int(pc.shape[0]), []).append(i)

        for N, idxs in by_n.items():
            enc = self._encode_fn(N)
            cfg = self.cfg.with_n(N)
            # Integer cdf_mode: the coding weights ride inside the encode
            # program's packed output buffer (bit-equal to the decoder's by
            # the integer-determinism guarantee, coding/iprob.py). Float
            # mode: the CDF comes from the SAME compiled program decompress
            # uses (skeleton_cdf over rec_xyz), so encoder and decoder CDFs
            # are bit-identical by construction rather than by hoping two
            # separately-fused XLA compilations agree at float32.
            cdf_fn = None
            if not self._integer_cdf:
                cdf_fn, _ = self._decode_fns(cfg.S)
            batches = [
                idxs[lo : lo + self.batch_size]
                for lo in range(0, len(idxs), self.batch_size)
            ]

            def pack(batch_idx):
                # pad partial batches to batch_size (repeat last cloud) so
                # every dispatch reuses one compiled shape. Runs in the
                # worker pool: the stack+quantize pass costs ~70 ms per
                # 128-cloud batch (measured), which would otherwise sit on
                # the main thread between dispatches.
                pad = self.batch_size - len(batch_idx)
                idx_p = list(batch_idx) + [batch_idx[-1]] * pad
                pcs = np.stack([clouds[i] for i in idx_p])
                starts = np.asarray([fps_starts[i] for i in idx_p], np.int32)
                # single u32 buffer: 1/3 the f32 bytes AND one tunnel
                # round trip instead of four (pack_encode_upload)
                return pack_encode_upload(pcs, starts)

            def dispatch(packed):
                args = (jnp.asarray(packed.result()),)
                if self._integer_cdf:
                    return enc(self.ae_params, self.prob_params,
                               self._iprob, *args)
                res = enc(self.ae_params, self.prob_params, *args)
                return res, cdf_fn(self.prob_params, res.rec_xyz)

            def serialize_one(i, p_args, depth, codes64, center, longest):
                # p_args: (cdf_rows, syms) on the weights path, or
                # (start_row, size_row) on the interval path — both feed the
                # same C++ coder and produce identical bytes
                if self._integer_cdf and self._bounds:
                    p_bytes = rangecoder.encode_bounds(
                        p_args[0], p_args[1], (1 << 16) - 1)
                elif self._integer_cdf:
                    p_bytes = rangecoder.encode_quantized_cdf(*p_args)
                else:
                    # float-CDF streams carry a 4-byte CDF-checksum trailer
                    # so cross-compilation drift fails loudly (cdf_checksum)
                    p_bytes = rangecoder.encode_quantized_cdf(*p_args) \
                        + cdf_checksum(p_args[0])
                codes = codes64 >> (3 * (cfg.max_depth - depth))
                if len(np.unique(codes)) != codes.shape[0]:
                    raise ValueError(
                        f"cloud {i}: octree at depth {depth} maps "
                        f"{codes.shape[0]} skeleton points to "
                        f"{len(np.unique(codes))} distinct voxels "
                        "(coincident FPS points, no lossless depth); "
                        "the stream would be undecodable"
                    )
                s_bytes = pack_bits(emit_octree_bits(codes, depth))
                header = np.zeros(4, dtype=np.float32)
                header[:3] = center
                header[3] = longest
                return i, (p_bytes, s_bytes, header.tobytes())

            def finish_batch(batch_idx, out):
                """Fetch one batch's packed buffer and serialize its clouds
                (runs on the fetch worker: the blocking fetch of batch b
                overlaps batch b+1's upload/compute on the main thread)."""
                if self._integer_cdf and self._bounds:
                    (buf,) = _fetch_all(out)            # ONE tunnel fetch
                    (starts, sizes, depths, all_codes, centers,
                     longests) = unpack_encode_bounds_buffer(buf, cfg=cfg)
                    p_args = [(starts[j], sizes[j])
                              for j in range(len(batch_idx))]
                elif self._integer_cdf:
                    (buf,) = _fetch_all(out)            # ONE tunnel fetch
                    (syms, w, depths, all_codes,
                     centers, longests) = unpack_encode_buffer(buf, cfg=cfg)
                    cdfs = self._cdf_host(w)
                    p_args = [(cdfs[j], syms[j].astype(np.int16))
                              for j in range(len(batch_idx))]
                else:
                    res, cdfs_dev = out
                    (syms, cdfs, depths, all_codes, centers,
                     longests) = _fetch_all(
                        res.sym, cdfs_dev, res.depth, res.sorted_codes,
                        res.center, res.longest)
                    cdfs = self._cdf_host(cdfs)
                    p_args = [(cdfs[j], syms[j].astype(np.int16))
                              for j in range(len(batch_idx))]
                all_codes = all_codes.astype(np.int64)
                futures = [
                    self._pool.submit(
                        serialize_one, i, p_args[j], int(depths[j]),
                        all_codes[j], centers[j], longests[j])
                    for j, i in enumerate(batch_idx)
                ]
                for fut in futures:
                    i, blob = fut.result()
                    results[i] = blob

            # software pipeline: pack (worker pool, 3 deep) -> async
            # upload + dispatch (main thread) -> fetch + serialize (fetch
            # worker). Steady state approaches max(stage) instead of the
            # old dispatch-ahead-by-one loop's sum of fetch-visible costs.
            packs = [self._pool.submit(pack, bi) for bi in batches[:3]]
            fetch_futs = []
            for b, batch_idx in enumerate(batches):
                if b + 3 < len(batches):
                    packs.append(self._pool.submit(pack, batches[b + 3]))
                out = dispatch(packs[b])
                packs[b] = None          # free the packed host arrays
                # cap in-flight batches: bounds device buffers and keeps
                # concurrent tunnel uploads below the stall threshold
                # (adaptive — see _InflightGate)
                self._gate("encode").wait_slot(fetch_futs)
                fetch_futs.append(
                    self._fetch_pool.submit(finish_batch, batch_idx, out))
            for f in fetch_futs:
                f.result()
        return results

    # ------------------------------------------------------------- decode --

    def decompress(self, p_bytes: bytes, s_bytes: bytes, c_bytes: bytes) -> np.ndarray:
        return self.decompress_many([(p_bytes, s_bytes, c_bytes)])[0]

    def decompress_many(self, streams):
        """Decompress a list of (p, s, c) byte triples -> list of [M, 3]."""
        results: list = [None] * len(streams)

        # host-parse all skeletons first; group by S for batched dispatch
        parsed = []
        for p_bytes, s_bytes, c_bytes in streams:
            codes, depth = parse_octree_bits(unpack_bits(s_bytes))
            parsed.append((codes_to_points(codes, depth),
                           np.frombuffer(c_bytes, dtype=np.float32)))
        by_s: dict[int, list[int]] = {}
        for i, (rec, _) in enumerate(parsed):
            by_s.setdefault(rec.shape[0], []).append(i)

        for S, idxs in by_s.items():
            if self._integer_cdf:
                # integer cdf mode: CDFs + range decoding + decoder network
                # all inside ONE device program (decode_clouds_entropy_io) —
                # upload skeletons + raw byte streams, fetch one buffer
                self._decompress_fused(streams, parsed, S, idxs, results)
                continue
            cdf_fn, dec_fn = self._decode_fns(S)
            batches = [
                idxs[lo : lo + self.batch_size]
                for lo in range(0, len(idxs), self.batch_size)
            ]

            def dispatch_cdf(batch_idx):
                pad = self.batch_size - len(batch_idx)
                idx_p = list(batch_idx) + [batch_idx[-1]] * pad
                recs = jnp.asarray(np.stack([parsed[i][0] for i in idx_p]))
                return idx_p, recs, cdf_fn(self.prob_params, recs)

            def dispatch_dec(stage):
                """Stage B: host range-decode the symbols under this
                batch's CDFs (threaded), then launch the decoder network —
                async, so the device decodes batch i while the host
                range-decodes batch i+1's symbols."""
                idx_p, recs, cdfs_dev = stage
                (cdfs,) = _fetch_all(cdfs_dev)
                cdfs = self._cdf_host(cdfs)

                def decode_one(ji):
                    j, i = ji
                    p = streams[i][0]
                    # verify the encoder's CDF-checksum trailer: a drifted
                    # decoder-side CDF program must fail loudly, never
                    # emit plausible garbage (see cdf_checksum)
                    if p[-4:] != cdf_checksum(cdfs[j]):
                        raise ValueError(
                            "CDF checksum mismatch: this stream was encoded"
                            " under a different compiled CDF program (or a"
                            " different checkpoint) than this decoder's —"
                            " decoding would desync the range coder. Re-"
                            "encode with the current codec, or decode with"
                            " the encoding build.")
                    return rangecoder.decode_quantized_cdf(
                        cdfs[j], p[:-4]).astype(np.int8)

                # int8 upload: sym < L <= 128 (config.py bound), half the
                # tunnel bytes of int16
                syms = np.stack(list(self._pool.map(
                    decode_one, enumerate(idx_p))))
                headers = np.stack([parsed[i][1] for i in idx_p])
                return idx_p, headers, dec_fn(self.ae_params,
                                              jnp.asarray(syms), recs)

            # 3-stage software pipeline over batches:
            #   A: skeleton-CDF dispatch   (device)
            #   B: range decode + decoder dispatch (host pool + device)
            #   C: fetch decoded clouds    (transfer)
            def collect(entry):
                """Depack int8 patch offsets, add the skeleton the host
                already parsed, and denormalize — one vectorized pass
                (exact inverse of ops/normalize; see decode_clouds_packed
                for the skeleton-delta transfer scheme)."""
                prev_idx, (idx_p, headers, out_buf) = entry
                (buf,) = _fetch_all(out_buf)            # ONE tunnel fetch
                q, scale = unpack_decode_buffer(buf, S)
                recs = np.stack([parsed[i][0] for i in idx_p])  # [B, S, 3]
                pc01 = (q.astype(np.float32)
                        * (scale / 127.0)[:, :, None, :]
                        + recs[:, :, None, :]).reshape(len(idx_p), -1, 3)
                margin = self.cfg.margin
                out = (pc01 - 0.5) * (headers[:, None, 3:4] / (1.0 - margin)) \
                    + headers[:, None, :3]
                for j, i in enumerate(prev_idx):
                    results[i] = out[j]

            # stages A+B run on the main thread (dispatch-ahead by one),
            # stage C's blocking fetch moves to the fetch worker so it
            # overlaps the next batch's device decode (see _fetch_pool)
            fetch_futs = []
            pending_cdf = dispatch_cdf(batches[0])
            for b, batch_idx in enumerate(batches):
                stage = pending_cdf
                if b + 1 < len(batches):
                    pending_cdf = dispatch_cdf(batches[b + 1])
                dec_out = dispatch_dec(stage)
                self._gate("decode_float").wait_slot(fetch_futs)
                fetch_futs.append(
                    self._fetch_pool.submit(collect, (batch_idx, dec_out)))
            for f in fetch_futs:
                f.result()
        return results

    def _fused_decode_fn(self, S: int, plen: int):
        """jit of decode_clouds_entropy_io, cached per (S, padded stream
        length) — stream lengths are rounded up to 512-byte quanta so a
        workload sees only a handful of compiles."""
        key = ("fused", S, plen)
        if key not in self._decode_cache:
            cfg = self.cfg.with_n(S * self.cfg.k)
            base = functools.partial(decode_clouds_entropy_io, cfg=cfg)

            # bundle as explicit arg, not a closure constant — see
            # _encode_fn for the jit arity failure mode this avoids.
            # recs + streams ride in ONE u8 buffer (one tunnel round trip
            # per batch instead of two — see pack_encode_upload's note):
            # row = recs f32 bits [S*12 bytes] | stream bytes [plen]
            def fn(ae, bundle, packed, _base=base):
                recs = jax.lax.bitcast_convert_type(
                    packed[:, :12 * S].reshape(-1, S, 3, 4), jnp.float32)
                return _base(ae, recs, packed[:, 12 * S:],
                             iprob_bundle=bundle)
            if self.mesh is not None:
                fn = self._shard_map(fn, n_in_sharded=1, n_in_repl=2)
            self._decode_cache[key] = jax.jit(fn)
        return self._decode_cache[key]

    def _decompress_fused(self, streams, parsed, S, idxs, results):
        """Integer-mode decompress: one dispatch + one fetch per batch;
        dispatches run ahead on the main thread while the fetch worker
        drains results, so each batch's fetch overlaps the next batch's
        device compute."""
        batches = [
            idxs[lo : lo + self.batch_size]
            for lo in range(0, len(idxs), self.batch_size)
        ]

        def dispatch(batch_idx):
            pad = self.batch_size - len(batch_idx)
            idx_p = list(batch_idx) + [batch_idx[-1]] * pad
            recs = np.stack([parsed[i][0] for i in idx_p])
            blobs = [streams[i][0] for i in idx_p]
            plen = max(512, -(-max(len(b) for b in blobs) // 512) * 512)
            arr = np.zeros((len(idx_p), 12 * S + plen), np.uint8)
            arr[:, :12 * S] = np.ascontiguousarray(
                recs.astype(np.float32)).view(np.uint8).reshape(
                len(idx_p), -1)
            for j, b in enumerate(blobs):
                arr[j, 12 * S : 12 * S + len(b)] = np.frombuffer(b, np.uint8)
            headers = np.stack([parsed[i][1] for i in idx_p])
            fn = self._fused_decode_fn(S, plen)
            return idx_p, headers, fn(self.ae_params, self._iprob,
                                      jnp.asarray(arr))

        def collect(entry):
            # same depack + denormalize as the float path's collect
            prev_idx, (idx_p, headers, out_buf) = entry
            (buf,) = _fetch_all(out_buf)                # ONE tunnel fetch
            q, scale = unpack_decode_buffer(buf, S)
            recs = np.stack([parsed[i][0] for i in idx_p])
            pc01 = (q.astype(np.float32)
                    * (scale / 127.0)[:, :, None, :]
                    + recs[:, :, None, :]).reshape(len(idx_p), -1, 3)
            margin = self.cfg.margin
            out = (pc01 - 0.5) * (headers[:, None, 3:4] / (1.0 - margin)) \
                + headers[:, None, :3]
            for j, i in enumerate(prev_idx):
                results[i] = out[j]

        # dispatch on the main thread, collect on the fetch worker: the
        # 3.2 MB decoded-offsets fetch of batch b then overlaps batch
        # b+1's device range-decode + decoder network (measured full
        # overlap over the tunnel; see __init__._fetch_pool)
        fetch_futs = []
        for b, batch_idx in enumerate(batches):
            out = dispatch(batch_idx)
            self._gate("decode_fused").wait_slot(fetch_futs)
            fetch_futs.append(
                self._fetch_pool.submit(collect, (batch_idx, out)))
        for f in fetch_futs:
            f.result()
