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
from pcc_tpu.coding.pmf import pmf_to_cdf
from pcc_tpu.config import CodecConfig
from pcc_tpu.models.ipdae import ConditionalProbabilityModel, PatchAE
from pcc_tpu.ops.fps import farthest_point_sample
from pcc_tpu.ops.knn import knn_points
from pcc_tpu.ops.normalize import denormalize, normalize


def make_models(cfg: CodecConfig):
    ae = PatchAE(K=cfg.K, k=cfg.k, d=cfg.d, L=cfg.L, sa_knn=cfg.sa_knn)
    prob = ConditionalProbabilityModel(d=cfg.d, L=cfg.L)
    return ae, prob


def init_params(key: jax.Array, cfg: CodecConfig):
    ae, prob = make_models(cfg)
    k1, k2 = jax.random.split(key)
    ae_params = ae.init(k1, jnp.zeros((1, cfg.K, 3), jnp.float32))
    prob_params = prob.init(k2, jnp.zeros((1, cfg.S, 3), jnp.float32))
    return ae_params, prob_params


class EncodeResult(NamedTuple):
    sym: jnp.ndarray          # [S, d] int32 symbols in [0, L)
    cdf: jnp.ndarray          # [S, d, L+1] float cdf for the range coder
    sorted_codes: jnp.ndarray  # [S] int32 max-depth Morton codes (descending)
    depth: jnp.ndarray        # scalar int32
    skeleton_bits: jnp.ndarray  # scalar int32
    center: jnp.ndarray       # [3]
    longest: jnp.ndarray      # scalar
    rec_xyz: jnp.ndarray      # [S, 3] decoded skeleton (normalized coords)


def encode_cloud(ae_params, prob_params, pc, fps_start, *, cfg: CodecConfig):
    """Full analysis transform for one cloud [N, 3] (compress.py:78-136)."""
    ae, prob = make_models(cfg)
    pc01, center, longest = normalize(pc, cfg.margin)
    idx = farthest_point_sample(pc01, cfg.S, fps_start)
    sampled = pc01[idx]
    octree = octree_analyze(sampled, cfg.N, cfg.min_bpp, cfg.max_depth)

    # Patches around the *decoded* skeleton (train.py:185-189) — the decoder
    # only ever sees octree-reconstructed centroids.
    _, _, grouped = knn_points(octree.rec_xyz[None], pc01[None], K=cfg.K, return_nn=True)
    patches = (grouped[0] - octree.rec_xyz[:, None, :]) * cfg.patch_scale

    latent = ae.apply(ae_params, patches, method=PatchAE.encode)     # [S, d]
    latent_q = jnp.round(latent)
    sym = jnp.clip(latent_q + cfg.L // 2, 0, cfg.L - 1).astype(jnp.int32)

    pmf = prob.apply(prob_params, octree.rec_xyz[None])[0]            # [S, d, L]
    cdf = pmf_to_cdf(pmf)
    return EncodeResult(
        sym=sym,
        cdf=cdf,
        sorted_codes=octree.sorted_codes,
        depth=octree.depth,
        skeleton_bits=octree.total_bits,
        center=center,
        longest=longest,
        rec_xyz=octree.rec_xyz,
    )


def skeleton_cdf(prob_params, rec_xyz, *, cfg: CodecConfig):
    """PMF→CDF from the decoded skeleton alone (decompress.py:88-92)."""
    _, prob = make_models(cfg)
    pmf = prob.apply(prob_params, rec_xyz[None])[0]
    return pmf_to_cdf(pmf)


def decode_cloud(ae_params, sym, rec_xyz, center, longest, *, cfg: CodecConfig):
    """Synthesis transform: symbols + skeleton -> cloud [S*k, 3]
    (decompress.py:93-116)."""
    ae, _ = make_models(cfg)
    latent_q = sym.astype(jnp.float32) - cfg.L // 2
    patches = ae.apply(ae_params, latent_q, method=PatchAE.decode)    # [S, k, 3]
    patches = patches / cfg.patch_scale
    pc01 = (patches + rec_xyz[:, None, :]).reshape(-1, 3)
    return denormalize(pc01, center, longest, cfg.margin)


class Codec:
    """Host-side wrapper: jitted device pipelines + bitstream serialization."""

    def __init__(self, cfg: CodecConfig, ae_params, prob_params):
        self.cfg = cfg
        self.ae_params = ae_params
        self.prob_params = prob_params
        self._encode = jax.jit(functools.partial(encode_cloud, cfg=cfg))
        self._decode_cfg_cache = {}

    def _decode_fns(self, S: int):
        """decompress derives S from the parsed skeleton (decompress.py:85);
        jits are cached per S."""
        if S not in self._decode_cfg_cache:
            # N is inferred as S*k on the decode side (decompress.py:104-107)
            # so the patch scale matches whatever N the encoder saw.
            cfg = self.cfg.with_n(S * self.cfg.k)
            self._decode_cfg_cache[S] = (
                jax.jit(functools.partial(skeleton_cdf, cfg=cfg)),
                jax.jit(functools.partial(decode_cloud, cfg=cfg)),
            )
        return self._decode_cfg_cache[S]

    # ------------------------------------------------------------- encode --

    def compress(self, pc: np.ndarray, fps_start: int = 0):
        """[N, 3] float32 -> (p_bytes, s_bytes, c_bytes)."""
        cfg = self.cfg.with_n(int(pc.shape[0]))
        if cfg.N != self.cfg.N:
            enc = jax.jit(functools.partial(encode_cloud, cfg=cfg))
        else:
            enc = self._encode
        res = enc(
            self.ae_params, self.prob_params, jnp.asarray(pc),
            jnp.asarray(fps_start, jnp.int32),
        )
        sym = np.asarray(res.sym, dtype=np.int16)
        cdf = np.asarray(res.cdf, dtype=np.float64)
        p_bytes = rangecoder.encode_float_cdf(cdf, sym)

        depth = int(res.depth)
        codes = np.asarray(res.sorted_codes, dtype=np.int64) >> (
            3 * (cfg.max_depth - depth)
        )
        s_bytes = pack_bits(emit_octree_bits(codes, depth))

        header = np.zeros(4, dtype=np.float32)
        header[:3] = np.asarray(res.center)
        header[3] = float(res.longest)
        return p_bytes, s_bytes, header.tobytes()

    # ------------------------------------------------------------- decode --

    def decompress(self, p_bytes: bytes, s_bytes: bytes, c_bytes: bytes) -> np.ndarray:
        codes, depth = parse_octree_bits(unpack_bits(s_bytes))
        rec_xyz = codes_to_points(codes, depth)             # [S, 3], desc Morton
        S = rec_xyz.shape[0]
        cdf_fn, dec_fn = self._decode_fns(S)

        cdf = np.asarray(cdf_fn(self.prob_params, jnp.asarray(rec_xyz)),
                         dtype=np.float64)
        sym = rangecoder.decode_float_cdf(cdf, p_bytes).astype(np.int32)

        header = np.frombuffer(c_bytes, dtype=np.float32)
        pc = dec_fn(
            self.ae_params,
            jnp.asarray(sym),
            jnp.asarray(rec_xyz),
            jnp.asarray(header[:3]),
            jnp.asarray(header[3]),
        )
        return np.asarray(pc)
