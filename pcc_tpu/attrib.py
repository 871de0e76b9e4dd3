"""XYZ+RGB attribute compression extension (stretch capability).

The reference codes geometry only (pn_kit.py reads xyz, README.md). This
module extends the patch pipeline with a parallel attribute stream using
the same architecture pattern: per-patch color autoencoder conditioned on
patch geometry, STE scalar quantization, and arithmetic coding under a
skeleton-conditioned probability model — so the attribute stream is
decodable from the transmitted skeleton + geometry alone, exactly like the
latent stream.

On-disk: a fourth stream {name}.a.bin alongside .p/.s/.c.bin.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from pcc_tpu.codec import Codec, make_models
from pcc_tpu.coding import rangecoder
from pcc_tpu.coding.octree import octree_analyze
from pcc_tpu.coding.octree_host import (
    codes_to_points,
    emit_octree_bits,
    pack_bits,
    parse_octree_bits,
    unpack_bits,
)
from pcc_tpu.coding.pmf import estimate_bits_from_pmf, pmf_to_cdf
from pcc_tpu.config import CodecConfig
from pcc_tpu.models.ipdae import ConditionalProbabilityModel, PatchAE
from pcc_tpu.models.layers import (
    PointNetFeat,
    PointwiseMLP,
    sigmoid_spread,
    ste_round,
)
from pcc_tpu.ops.chamfer import nearest_neighbor
from pcc_tpu.ops.fps import fps_batch
from pcc_tpu.ops.knn import knn_points
from pcc_tpu.ops.normalize import denormalize, normalize


class PatchAttrAE(nn.Module):
    """Per-patch color autoencoder.

    encode: centered patch xyz + rgb01 -> d_a-dim latent (spread for the
    quantizer). decode: quantized latent + reconstructed patch xyz ->
    rgb01 per output point (geometry-conditioned, so the decoder paints
    the decoded patch without needing the original point positions).
    """

    d_a: int = 16
    L: int = 7

    def setup(self):
        self.enc = PointNetFeat(
            features=(64, 128, 256, self.d_a), relu=(True, True, True, False))
        self.dec = PointwiseMLP(
            features=(128, 64, 3), relu=(True, True, False))

    def encode(self, patch_xyz: jnp.ndarray, rgb01: jnp.ndarray) -> jnp.ndarray:
        """[B, K, 3] xyz + [B, K, 3] rgb01 -> [B, d_a] spread latent."""
        latent = self.enc(jnp.concatenate([patch_xyz, rgb01], axis=-1))
        return sigmoid_spread(latent, self.L)

    def decode(self, latent_q: jnp.ndarray, patch_xyz: jnp.ndarray) -> jnp.ndarray:
        """[B, d_a] + [B, k, 3] decoded patch xyz -> [B, k, 3] rgb01."""
        k = patch_xyz.shape[1]
        tiled = jnp.repeat(latent_q[:, None, :], k, axis=1)
        out = self.dec(jnp.concatenate([patch_xyz, tiled], axis=-1))
        return jax.nn.sigmoid(out)

    def __call__(self, patch_xyz, rgb01, dec_xyz):
        z = self.encode(patch_xyz, rgb01)
        z_q = ste_round(z)
        return self.decode(z_q, dec_xyz), z, z_q


def make_attr_models(cfg: CodecConfig, d_a: int = 16):
    attr = PatchAttrAE(d_a=d_a, L=cfg.L)
    attr_prob = ConditionalProbabilityModel(d=d_a, L=cfg.L)
    return attr, attr_prob


def init_attr_params(key: jax.Array, cfg: CodecConfig, d_a: int = 16):
    attr, attr_prob = make_attr_models(cfg, d_a)
    k1, k2 = jax.random.split(key)
    xyz = jnp.zeros((1, cfg.K, 3), jnp.float32)
    dec_xyz = jnp.zeros((1, cfg.k, 3), jnp.float32)
    attr_params = attr.init(k1, xyz, xyz, dec_xyz)
    prob_params = attr_prob.init(k2, jnp.zeros((1, cfg.S, 3), jnp.float32))
    return attr_params, prob_params


class AttrEncodeResult(NamedTuple):
    sym: jnp.ndarray          # [S, d] geometry symbols
    asym: jnp.ndarray         # [S, d_a] attribute symbols
    sorted_codes: jnp.ndarray
    depth: jnp.ndarray
    center: jnp.ndarray
    longest: jnp.ndarray
    rec_xyz: jnp.ndarray      # [S, 3] decoded skeleton (normalized coords)


def _encode_one_attr(params, pc01, rgb01, sampled, center, longest, *,
                     cfg: CodecConfig, d_a: int):
    # Coding CDFs are deliberately NOT computed here: AttrCodec.compress
    # derives them through the same compiled program decompress uses, so the
    # two sides cannot drift (see codec._encode_from_skeleton).
    ae, _ = make_models(cfg)
    attr, _ = make_attr_models(cfg, d_a)
    octree = octree_analyze(sampled, cfg.N, cfg.min_bpp, cfg.max_depth)
    rec = octree.rec_xyz

    _, knn_idx, grouped = knn_points(rec[None], pc01[None], K=cfg.K,
                                     return_nn=True)
    patches = (grouped[0] - rec[:, None, :]) * cfg.patch_scale
    patch_rgb = rgb01[knn_idx[0]]                              # [S, K, 3]

    latent = ae.apply(params["ae"], patches, method=PatchAE.encode)
    sym = jnp.clip(jnp.round(latent) + cfg.L // 2, 0, cfg.L - 1).astype(jnp.int32)

    alat = attr.apply(params["attr"], patches, patch_rgb,
                      method=PatchAttrAE.encode)
    asym = jnp.clip(jnp.round(alat) + cfg.L // 2, 0, cfg.L - 1).astype(jnp.int32)

    return AttrEncodeResult(
        sym=sym, asym=asym,
        sorted_codes=octree.sorted_codes, depth=octree.depth,
        center=center, longest=longest, rec_xyz=rec,
    )


def encode_clouds_attr(params, pcs, rgbs01, fps_starts, *, cfg: CodecConfig,
                       d_a: int = 16) -> AttrEncodeResult:
    """Batched geometry+attribute analysis transform."""
    pc01, center, longest = jax.vmap(
        functools.partial(normalize, margin=cfg.margin))(pcs)
    idx = fps_batch(pc01, cfg.S, fps_starts)
    sampled = jnp.take_along_axis(pc01, idx[..., None], axis=1)
    return jax.vmap(
        functools.partial(_encode_one_attr, cfg=cfg, d_a=d_a),
        in_axes=(None, 0, 0, 0, 0, 0),
    )(params, pc01, rgbs01, sampled, center, longest)


def pack_attr_upload(pcs: np.ndarray, rgbs: np.ndarray,
                     starts: np.ndarray) -> np.ndarray:
    """Host-side single-buffer attr-encode upload: geometry as the codec's
    u10-packed row (codec.pack_encode_upload) + raw RGB bytes, one u8 row
    per cloud [B, 4*(N+7) + 3*N]. One tunnel round trip per batch instead
    of the per-cloud pc/rgb/start transfers (~28 ms each over axon)."""
    from pcc_tpu.codec import pack_encode_upload

    B, N = pcs.shape[:2]
    geo = pack_encode_upload(pcs, starts)               # u32 [B, N+7]
    return np.concatenate([
        geo.view(np.uint8).reshape(B, -1),
        np.ascontiguousarray(np.asarray(rgbs, np.uint8)).reshape(B, 3 * N),
    ], axis=1)


def encode_clouds_attr_packed(params, packed, *, cfg: CodecConfig,
                              d_a: int = 16) -> AttrEncodeResult:
    """encode_clouds_attr over the pack_attr_upload buffer (device depack:
    same u10 math as codec.encode_clouds_packed_input, rgb u8 -> [0,1])."""
    from pcc_tpu.codec import unpack_encode_upload

    N = cfg.N
    geo = jax.lax.bitcast_convert_type(
        packed[:, :4 * (N + 7)].reshape(-1, N + 7, 4), jnp.uint32)
    q, lo, scale, starts = unpack_encode_upload(geo, N)
    qi = q.astype(jnp.int32)
    v = jnp.stack([qi & 1023, (qi >> 10) & 1023, (qi >> 20) & 1023],
                  axis=-1).astype(jnp.float32)
    pcs = v * (scale / 1023.0)[:, None, :] + lo[:, None, :]
    rgb01 = (packed[:, 4 * (N + 7):].reshape(-1, N, 3)
             .astype(jnp.float32) / 255.0)
    return encode_clouds_attr(params, pcs, rgb01, starts, cfg=cfg, d_a=d_a)


def decode_clouds_attr_packed(params, packed, *, cfg: CodecConfig,
                              d_a: int = 16):
    """Batched decode over one u8 upload row per cloud:
    sym u8 [S*d] | asym u8 [S*d_a] | rec f32 bits [12*S] | header f32
    bits [16]. Returns one u8 buffer per cloud: pc f32 bits [12*M] |
    rgb u8 [3*M] — so the whole batch decodes with ONE upload and ONE
    fetch (see pack_attr_upload's round-trip note)."""
    S, d = cfg.S, cfg.d
    sym = packed[:, :S * d].reshape(-1, S, d).astype(jnp.int32)
    o = S * d
    asym = packed[:, o:o + S * d_a].reshape(-1, S, d_a).astype(jnp.int32)
    o += S * d_a
    rec = jax.lax.bitcast_convert_type(
        packed[:, o:o + 12 * S].reshape(-1, S, 3, 4), jnp.float32)
    o += 12 * S
    hdr = jax.lax.bitcast_convert_type(
        packed[:, o:o + 16].reshape(-1, 4, 4), jnp.float32)
    pc, rgb01 = jax.vmap(
        functools.partial(decode_cloud_attr, cfg=cfg, d_a=d_a),
        in_axes=(None, 0, 0, 0, 0, 0),
    )(params, sym, asym, rec, hdr[:, :3], hdr[:, 3])
    # floor(x*255 + 0.5): bit-identical to the former host-side np.clip
    # conversion (jnp.round would round half to even)
    rgb_u8 = jnp.clip(jnp.floor(rgb01 * 255.0 + 0.5), 0, 255
                      ).astype(jnp.uint8)
    B, M = pc.shape[:2]
    pc_u8 = jax.lax.bitcast_convert_type(
        pc.astype(jnp.float32), jnp.uint8).reshape(B, 12 * M)
    return jnp.concatenate([pc_u8, rgb_u8.reshape(B, 3 * M)], axis=1)


def decode_cloud_attr(params, sym, asym, rec_xyz, center, longest, *,
                      cfg: CodecConfig, d_a: int = 16):
    """Symbols -> (cloud [S*k, 3], rgb01 [S*k, 3])."""
    ae, _ = make_models(cfg)
    attr, _ = make_attr_models(cfg, d_a)
    latent_q = sym.astype(jnp.float32) - cfg.L // 2
    patches = ae.apply(params["ae"], latent_q, method=PatchAE.decode)
    alat_q = asym.astype(jnp.float32) - cfg.L // 2
    # paint the decoded patch in its *scaled* frame (the encoder saw
    # scaled patches too)
    rgb01 = attr.apply(params["attr"], alat_q, patches,
                       method=PatchAttrAE.decode)              # [S, k, 3]
    patches = patches / cfg.patch_scale
    pc01 = (patches + rec_xyz[:, None, :]).reshape(-1, 3)
    return denormalize(pc01, center, longest, cfg.margin), rgb01.reshape(-1, 3)


class AttrCodec:
    """Geometry + attribute codec. Streams: (p, s, c, a) bytes."""

    def __init__(self, cfg: CodecConfig, params, batch_size: int = 16,
                 d_a: int = 16):
        self.cfg = cfg
        self.params = params  # {"ae","prob","attr","attr_prob"}
        self.d_a = d_a
        self.batch_size = batch_size
        self._enc_cache = {}
        self._dec_cache = {}
        # integer-deterministic coding CDFs for BOTH streams (VERDICT r3
        # item 1): the attribute CPM shares the IPDAE architecture, so one
        # fixed-point spec (coding/iprob.py) covers .p.bin and .a.bin —
        # streams become cross-topology byte-exact and the crc32 trailer
        # is only emitted in the legacy cdf_mode="float" fallback
        self._integer_cdf = cfg.cdf_mode == "integer"
        if self._integer_cdf:
            from pcc_tpu.coding.iprob import convert_prob_params

            def to_dev(raw):
                # drop the static d/L ints so every leaf is a traceable
                # array (the bundle rides as an explicit jit argument —
                # see codec.Codec.__init__ for the arity failure mode)
                return jax.tree.map(
                    jnp.asarray,
                    {k: v for k, v in raw.items() if k not in ("d", "L")})

            self._iprob = to_dev(
                convert_prob_params(params["prob"], cfg.d, cfg.L))
            self._iprob_a = to_dev(
                convert_prob_params(params["attr_prob"], d_a, cfg.L))

    def _enc(self, N):
        if N not in self._enc_cache:
            cfg = self.cfg.with_n(N)
            self._enc_cache[N] = jax.jit(functools.partial(
                encode_clouds_attr_packed, cfg=cfg, d_a=self.d_a))
        return self._enc_cache[N]

    def _dec(self, S):
        if S not in self._dec_cache:
            cfg = self.cfg.with_n(S * self.cfg.k)
            attr, attr_prob = make_attr_models(cfg, self.d_a)
            if self._integer_cdf:
                from pcc_tpu.codec import skeleton_pmf_weights

                d, L, d_a = cfg.d, cfg.L, self.d_a
                # both bundles are explicit jit ARGUMENTS (never closure
                # constants); compress and decompress run this same
                # program, and the integer spec makes its output
                # byte-identical across any pair of compilations anyway
                cdf_fn = jax.jit(
                    lambda gb, ab, rec: (
                        skeleton_pmf_weights(gb, rec, d=d, L=L),
                        skeleton_pmf_weights(ab, rec, d=d_a, L=L),
                    ))
            else:
                cdf_fn = jax.jit(jax.vmap(
                    lambda pp, ap, rec: (
                        pmf_to_cdf(
                            make_models(cfg)[1].apply(pp, rec[None])[0]),
                        pmf_to_cdf(attr_prob.apply(ap, rec[None])[0]),
                    ),
                    in_axes=(None, None, 0),
                ))
            dec_fn = jax.jit(functools.partial(
                decode_clouds_attr_packed, cfg=cfg, d_a=self.d_a))
            self._dec_cache[S] = (cdf_fn, dec_fn)
        return self._dec_cache[S]

    def _cdf_args(self):
        """Arguments of the _dec cdf program: integer bundles or the float
        checkpoints."""
        if self._integer_cdf:
            return self._iprob, self._iprob_a
        return self.params["prob"], self.params["attr_prob"]

    def _rows_pair(self, cdf_j, acdf_j):
        """Fetched per-cloud CDF-program outputs -> quantized int32 rows
        for the range coder (integer staircase or legacy float
        quantization)."""
        if self._integer_cdf:
            from pcc_tpu.coding.iprob import weights_to_cdf_rows

            return weights_to_cdf_rows(cdf_j), weights_to_cdf_rows(acdf_j)
        return (rangecoder.quantize_cdf(cdf_j.astype(np.float64)),
                rangecoder.quantize_cdf(acdf_j.astype(np.float64)))

    def compress(self, pc: np.ndarray, rgb: np.ndarray, fps_start: int = 0):
        """[N,3] float32 + [N,3] uint8 -> (p, s, c, a) bytes."""
        return self.compress_many([pc], [rgb], [fps_start])[0]

    def compress_many(self, clouds, rgbs, fps_starts=None):
        """Batched compress: lists of [N,3] f32 + [N,3] u8 -> list of
        (p, s, c, a). Equal-N clouds batch into single dispatches (padded
        to batch_size so each (N,) sees one compiled program); per batch:
        one packed upload, the encode program, the shared CDF program, and
        one async-gathered fetch — instead of the former ~6 tunnel round
        trips per CLOUD."""
        from pcc_tpu.codec import _fetch_all, cdf_checksum

        if fps_starts is None:
            fps_starts = [0] * len(clouds)
        results: list = [None] * len(clouds)
        by_n: dict[int, list[int]] = {}
        for i, pc in enumerate(clouds):
            by_n.setdefault(int(pc.shape[0]), []).append(i)

        for N, idxs in by_n.items():
            cfg = self.cfg.with_n(N)
            enc = self._enc(N)
            cdf_fn, _ = self._dec(cfg.S)

            def dispatch(batch_idx):
                pad = self.batch_size - len(batch_idx)
                idx_p = list(batch_idx) + [batch_idx[-1]] * pad
                packed = pack_attr_upload(
                    np.stack([clouds[i] for i in idx_p]),
                    np.stack([np.asarray(rgbs[i], np.uint8) for i in idx_p]),
                    np.asarray([fps_starts[i] for i in idx_p], np.int32))
                res = enc(self.params, jnp.asarray(packed))
                # CDFs from the same compiled program the decoder runs
                # (and, in integer mode, byte-identical under ANY program)
                cdf, acdf = cdf_fn(*self._cdf_args(), res.rec_xyz)
                return res, cdf, acdf

            def finish(batch_idx, out):
                res, cdf_d, acdf_d = out
                (syms, asyms, codes_all, depths, centers, longests, cdf,
                 acdf) = _fetch_all(res.sym, res.asym, res.sorted_codes,
                                    res.depth, res.center, res.longest,
                                    cdf_d, acdf_d)
                codes_all = codes_all.astype(np.int64)
                for j, i in enumerate(batch_idx):
                    # legacy float mode: 4-byte CDF-checksum trailers make
                    # drifted-program decodes fail LOUDLY (cdf_checksum).
                    # Integer mode needs none — CDFs are byte-deterministic
                    # by construction (coding/iprob.py)
                    cdf_q, acdf_q = self._rows_pair(cdf[j], acdf[j])
                    p = rangecoder.encode_quantized_cdf(
                        cdf_q, syms[j].astype(np.int16))
                    a = rangecoder.encode_quantized_cdf(
                        acdf_q, asyms[j].astype(np.int16))
                    if not self._integer_cdf:
                        p += cdf_checksum(cdf_q)
                        a += cdf_checksum(acdf_q)
                    depth = int(depths[j])
                    codes = codes_all[j] >> (3 * (cfg.max_depth - depth))
                    if len(np.unique(codes)) != codes.shape[0]:
                        raise ValueError(
                            f"octree at depth {depth} maps {codes.shape[0]}"
                            f" skeleton points to {len(np.unique(codes))} "
                            "distinct voxels (coincident FPS points, no "
                            "lossless depth); the stream would be "
                            "undecodable")
                    s = pack_bits(emit_octree_bits(codes, depth))
                    header = np.zeros(4, np.float32)
                    header[:3] = centers[j]
                    header[3] = longests[j]
                    results[i] = (p, s, header.tobytes(), a)

            batches = [idxs[lo:lo + self.batch_size]
                       for lo in range(0, len(idxs), self.batch_size)]
            # dispatch-ahead-by-one: batch b's fetch+serialize overlaps
            # batch b+1's upload+compute
            prev = None
            for batch_idx in batches:
                out = dispatch(batch_idx)
                if prev is not None:
                    finish(*prev)
                prev = (batch_idx, out)
            if prev is not None:
                finish(*prev)
        return results

    def decompress(self, p_bytes, s_bytes, c_bytes, a_bytes):
        """(p, s, c, a) -> (pc [M,3] float32, rgb [M,3] uint8)."""
        return self.decompress_many([(p_bytes, s_bytes, c_bytes,
                                      a_bytes)])[0]

    def decompress_many(self, streams):
        """Batched decompress: list of (p, s, c, a) -> list of (pc, rgb).
        Per equal-S batch: one recs upload + shared CDF program + fetch,
        threadless host range decode, then ONE packed upload and ONE
        packed fetch through decode_clouds_attr_packed."""
        from pcc_tpu.codec import _fetch_all, cdf_checksum

        results: list = [None] * len(streams)
        parsed = []
        for p_bytes, s_bytes, c_bytes, a_bytes in streams:
            codes, depth = parse_octree_bits(unpack_bits(s_bytes))
            parsed.append(codes_to_points(codes, depth))
        by_s: dict[int, list[int]] = {}
        for i, rec in enumerate(parsed):
            by_s.setdefault(rec.shape[0], []).append(i)

        for S, idxs in by_s.items():
            cfg = self.cfg.with_n(S * self.cfg.k)
            cdf_fn, dec_fn = self._dec(S)
            d, d_a = cfg.d, self.d_a
            row = S * d + S * d_a + 12 * S + 16
            M = S * cfg.k

            def dispatch(batch_idx):
                pad = self.batch_size - len(batch_idx)
                idx_p = list(batch_idx) + [batch_idx[-1]] * pad
                recs = np.stack([parsed[i] for i in idx_p]
                                ).astype(np.float32)
                cdf_d, acdf_d = cdf_fn(*self._cdf_args(), jnp.asarray(recs))
                (cdf, acdf) = _fetch_all(cdf_d, acdf_d)
                arr = np.zeros((len(idx_p), row), np.uint8)
                for j, i in enumerate(idx_p):
                    p_bytes, _, c_bytes, a_bytes = streams[i]
                    cdf_q, acdf_q = self._rows_pair(cdf[j], acdf[j])
                    if not self._integer_cdf:
                        # legacy float streams: verify the crc32 trailer,
                        # then strip it before range decoding
                        for blob, rows_q, name in (
                                (p_bytes, cdf_q, ".p.bin"),
                                (a_bytes, acdf_q, ".a.bin")):
                            if blob[-4:] != cdf_checksum(rows_q):
                                raise ValueError(
                                    f"CDF checksum mismatch on {name}: "
                                    "stream encoded under a different "
                                    "compiled CDF program or checkpoint — "
                                    "decoding would desync the range "
                                    "coder.")
                        p_bytes, a_bytes = p_bytes[:-4], a_bytes[:-4]
                    sym = rangecoder.decode_quantized_cdf(cdf_q, p_bytes)
                    asym = rangecoder.decode_quantized_cdf(acdf_q, a_bytes)
                    o = S * d
                    arr[j, :o] = sym.astype(np.uint8).ravel()
                    arr[j, o:o + S * d_a] = asym.astype(np.uint8).ravel()
                    o += S * d_a
                    arr[j, o:o + 12 * S] = np.ascontiguousarray(
                        parsed[i].astype(np.float32)).view(np.uint8).ravel()
                    arr[j, o + 12 * S:] = np.frombuffer(c_bytes, np.uint8)
                return idx_p, dec_fn(self.params, jnp.asarray(arr))

            def finish(batch_idx, out):
                idx_p, buf_d = out
                (buf,) = _fetch_all(buf_d)
                for j, i in enumerate(batch_idx):
                    pc = np.ascontiguousarray(
                        buf[j, :12 * M]).view(np.float32).reshape(M, 3)
                    rgb = buf[j, 12 * M:].reshape(M, 3)
                    results[i] = (pc, rgb.copy())

            batches = [idxs[lo:lo + self.batch_size]
                       for lo in range(0, len(idxs), self.batch_size)]
            prev = None
            for batch_idx in batches:
                out = dispatch(batch_idx)
                if prev is not None:
                    finish(*prev)
                prev = (batch_idx, out)
            if prev is not None:
                finish(*prev)
        return results


# ---------------------------------------------------------------- training --

def attr_rd_forward(params, batch, rgb_batch, key, lam, *, cfg: CodecConfig,
                    d_a: int = 16, color_weight: float = 1.0):
    """Joint geometry+attribute RD loss: chamfer + color MSE + lam*rate.

    Color supervision: each reconstructed point is compared against the RGB
    of its nearest input point (stop-gradient 1-NN, gather-based like the
    chamfer gradient).
    """
    from pcc_tpu.models.losses import rate_distortion_loss

    ae, prob = make_models(cfg)
    attr, attr_prob = make_attr_models(cfg, d_a)
    B, N, _ = batch.shape

    pc01, _, _ = jax.vmap(functools.partial(normalize, margin=cfg.margin))(batch)
    starts = jax.random.randint(key, (B,), 0, N, dtype=jnp.int32)
    idx = fps_batch(pc01, cfg.S, starts)
    sampled = jnp.take_along_axis(pc01, idx[..., None], axis=1)
    octree = jax.vmap(functools.partial(
        octree_analyze, N=cfg.N, min_bpp=cfg.min_bpp, max_depth=cfg.max_depth
    ))(sampled)
    rec = jax.lax.stop_gradient(octree.rec_xyz)

    _, knn_idx, grouped = knn_points(rec, pc01, K=cfg.K, return_nn=True)
    patches = (grouped - rec[:, :, None, :]) * cfg.patch_scale
    patch_rgb = jax.vmap(lambda r, i: r[i])(rgb_batch, knn_idx)   # [B, S, K, 3]

    flat_patches = patches.reshape(B * cfg.S, cfg.K, 3)
    patches_pred, _, latent_q = ae.apply(params["ae"], flat_patches)
    rgb_pred, _, alat_q = attr.apply(
        params["attr"], flat_patches, patch_rgb.reshape(B * cfg.S, cfg.K, 3),
        patches_pred)
    patches_pred = patches_pred / cfg.patch_scale

    pmf = prob.apply(params["prob"], rec)
    apmf = attr_prob.apply(params["attr_prob"], rec)
    sym = jnp.clip(latent_q.reshape(B, cfg.S, cfg.d) + cfg.L // 2,
                   0, cfg.L - 1).astype(jnp.int32)
    asym = jnp.clip(alat_q.reshape(B, cfg.S, d_a) + cfg.L // 2,
                    0, cfg.L - 1).astype(jnp.int32)
    bits = (estimate_bits_from_pmf(pmf, sym)
            + estimate_bits_from_pmf(apmf, asym))
    fbpp = bits / (B * N)

    pc_pred = (patches_pred.reshape(B, cfg.S, cfg.k, 3)
               + rec[:, :, None, :]).reshape(B, cfg.S * cfg.k, 3)
    loss_geo, aux = rate_distortion_loss(pc_pred, pc01, fbpp, lam)

    # color loss against nearest-input-point RGB
    def per_cloud_color(pred_pts, pred_rgb, pts, rgb):
        _, nn_idx = nearest_neighbor(jax.lax.stop_gradient(pred_pts), pts)
        return jnp.mean((pred_rgb - rgb[nn_idx]) ** 2)

    color = jnp.mean(jax.vmap(per_cloud_color)(
        pc_pred, rgb_pred.reshape(B, cfg.S * cfg.k, 3), pc01, rgb_batch))
    aux["color_mse"] = color
    aux["bpp"] = (jnp.sum(octree.total_bits) + bits) / (B * N)
    return loss_geo + color_weight * color, aux


def build_attr_train_step(cfg: CodecConfig, tx, d_a: int = 16):
    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state, batch, rgb_batch, key, lam):
        grad_fn = jax.value_and_grad(
            functools.partial(attr_rd_forward, cfg=cfg, d_a=d_a),
            has_aux=True)
        (loss, aux), grads = grad_fn(state.params, batch, rgb_batch, key, lam)
        new_state = state.apply_gradients(grads, tx)
        aux["loss"] = loss
        return new_state, aux

    return train_step
