"""Deterministic integer inference for the conditional probability model.

Why: the coding CDF must be BYTE-IDENTICAL on the encoder and decoder or
the range coder desyncs into plausible-looking garbage (reference contract:
one torch program computes both sides, compress.py:131-136 /
decompress.py:88-93). A float network only guarantees that within a single
compiled program — across compilations (an 8-chip mesh vs a single chip, an
XLA upgrade, CPU vs TPU) f32 fusion differences can move a PMF value across
a quantization boundary (the ±1-bin drift documented in parallel/mesh.py).

Fix, the integer-networks route (Ballé et al., "Integer networks for data
compression with latent-variable models"): ship a fixed-point quantization
of the trained prob model and define coding-CDF inference entirely over
integers — int8 weights/activations, int32 accumulation and requantization,
an integer exp2 LUT for the softmax — so every backend computes bit-equal
CDFs by construction.

TPU mapping: integer matmuls ride the MXU as *exact* bf16 matmuls. int8
values are exactly representable in bf16 (8-bit mantissa); each bf16xbf16
product fits f32 exactly (<= 14 mantissa bits), and every partial sum stays
an exact integer below 2^24, so f32 accumulation is associative here —
bit-exact regardless of tile order, backend, or XLA version. Wide (Q14)
inputs are split into two int7 halves so their matmuls stay bf16-exact too.
Requantization is (x * m + (1 << rq >> 1)) >> rq in int32 with host-derived
per-channel constants; saturation (clip to int8) can only make the PMF
slightly suboptimal, never undecodable — both sides saturate identically.

Correctness never depends on calibration: calibration only tunes the
activation scales (rate optimality). Overflow-freedom is proven from static
worst-case bounds, not calibration.
"""

from __future__ import annotations

import numpy as np

# fixed-point formats of the spec (changing any of these is a stream-format
# change — see PARITY.md):
Q_IN = 14                  # input xyz scale 2^Q_IN (unit-cube coords)
# activations carry 14 bits (int8 weights): through the 512-wide MLP trunk,
# 8-bit activations alone cost ~6% relative noise per value and visibly
# skew the PMF; 14-bit activations push quantization noise to ~6e-5 while
# every matmul stays exactly representable (hi/lo int7 split: partial sums
# <= 512 * 127 * 127 < 2^24)
ACT_MAX = (1 << 14) - 1
S_SM = 256                 # logit scale feeding the integer softmax
LOG2E_Q8 = 369             # round(log2(e) * S_SM): logit -> Q16 log2 domain
LUT_BITS = 8               # 2^-frac LUT resolution
# LUT[j] = round(2^16 * 2^-(j / 2^LUT_BITS)), j in [0, 255]
EXP2_LUT = np.minimum(
    np.round(65536.0 * np.exp2(-np.arange(1 << LUT_BITS) / (1 << LUT_BITS))),
    65535.0).astype(np.int32)


def _softmax_weights_np(logits_q):
    """Integer softmax weights: [..., L] int32 logits at scale S_SM ->
    [..., L] uint16-range Q16 weights w ~ 2^16 * exp(l/S_SM - max)."""
    t = logits_q - logits_q.max(axis=-1, keepdims=True)     # <= 0
    v = (-t).astype(np.int64) * LOG2E_Q8                    # Q16 log2, >= 0
    v = np.minimum(v, (31 << 16)).astype(np.int32)
    n = v >> 16
    f = (v >> (16 - LUT_BITS)) & ((1 << LUT_BITS) - 1)
    return EXP2_LUT[f] >> n


def weights_to_cdf_rows(w: np.ndarray) -> np.ndarray:
    """Integer staircase: [..., L] positive weights -> [..., L+1] int32 CDF
    rows totalling 2^16 - 1 (same total as rangecoder.quantize_cdf), via
    pure integer cumsum/floor-div — deterministic on any host."""
    L = w.shape[-1]
    cum = np.cumsum(w.astype(np.int64), axis=-1)
    cum = np.concatenate([np.zeros(w.shape[:-1] + (1,), np.int64), cum],
                         axis=-1)
    total = np.maximum(cum[..., -1:], 1)
    cdf = (cum * ((1 << 16) - (L + 1))) // total
    return (cdf + np.arange(L + 1)).astype(np.int32)


def bounds_supported(L: int) -> bool:
    """The int32-only exact floor-division below needs every intermediate
    under 2^31; the single 2^m limb split proves that for row totals up to
    L * (2^16 - 1) with L <= 64 (see _exact_div_jnp). Larger L falls back
    to fetching full weight rows."""
    return L <= 64


def _exact_div_jnp(c, k: int, total, m: int):
    """floor(c * k / total) in pure int32 ops, bit-equal to the int64 host
    division of weights_to_cdf_rows on any backend.

    Preconditions (static, from the caller): 0 <= c <= total < 2^(16+ceil)
    with ceil = ceil(log2(L)) <= 6, k < 2^16, and m chosen so that
    ceil + 1 <= m <= 13 - ... every intermediate below stays < 2^31:
      a    = (c >> m) * k            <  2^(16+ceil-m) * 2^16 <= 2^31
      num2 = (r1 << m) + (c&mask)*k  <  total*2^m + 2^(16+m) <  2^31
    Split identity: with a = q1*total + r1,
      c*k = a*2^m + (c & mask)*k = q1*total*2^m + num2
      floor(c*k/total) = q1*2^m + floor(num2/total).
    """
    import jax.numpy as jnp

    c1 = c >> m
    c0 = c & ((1 << m) - 1)
    a = c1 * k
    q1 = a // total
    r1 = a - q1 * total
    num2 = (r1 << m) + c0 * k
    return (q1 << m) + num2 // total


def iprob_encode_bounds(bundle, rec_xyz, sym, *, d=None, L=None):
    """Per-symbol coding intervals on device: [B, S, 3] skeletons + [B, S, d]
    symbols -> (start, size) uint16 pairs, exactly the
    weights_to_cdf_rows(iprob_pmf_weights(...)) entries at [sym] and
    [sym + 1].

    Why: the range ENCODER touches only the coded symbol's own interval and
    the (constant 2^16 - 1) total — so the encode-side fetch shrinks from
    d*L uint16 weights per position to 4 bytes per position, and the host
    staircase pass disappears from the compress path entirely. The decoder
    still fetches full weight rows (symbol search needs the whole CDF).
    Bit-equality with the host staircase is pinned by tests/test_iprob.py.
    """
    w = iprob_pmf_weights(bundle, rec_xyz, d=d, L=L)     # [B, S, d, L] int32
    return encode_bounds_from_weights(w, sym)


def encode_bounds_from_weights(w, sym):
    """The interval-extraction half of iprob_encode_bounds, over any
    family's integer Q16 weight tensor [..., L] (IPDAE's iprob_pmf_weights
    or PPPF's pppf_pmf_weights) + symbols [...]. Pure int32 ops, bit-equal
    to the host staircase (weights_to_cdf_rows) entries."""
    import jax.numpy as jnp

    L = w.shape[-1]
    assert bounds_supported(L), f"L={L} exceeds the int32-exact bounds proof"
    ceil = max(1, int(np.ceil(np.log2(L))))
    m = 13 - ceil                                        # ceil+1 <= m holds for L <= 64
    k = (1 << 16) - (L + 1)

    cum = jnp.cumsum(w, axis=-1)                         # total < L * 2^16
    cum = jnp.concatenate([jnp.zeros_like(cum[..., :1]), cum], axis=-1)
    total = jnp.maximum(cum[..., -1:], 1)
    s = sym.astype(jnp.int32)[..., None]
    c_lo = jnp.take_along_axis(cum, s, axis=-1)
    c_hi = jnp.take_along_axis(cum, s + 1, axis=-1)
    q_lo = _exact_div_jnp(c_lo, k, total, m)
    q_hi = _exact_div_jnp(c_hi, k, total, m)
    # cdf[j] = q(cum[j]) + j  =>  start = q_lo + s, size = q_hi - q_lo + 1
    start = (q_lo + s)[..., 0].astype(jnp.uint16)
    size = (q_hi - q_lo + 1)[..., 0].astype(jnp.uint16)
    return start, size


# ---------------------------------------------------------------------------
# Conversion (host, numpy): float checkpoint -> integer parameter bundle.
# ---------------------------------------------------------------------------


def _float_forward_acts(layers_pn, layers_mlp, xyz):
    """Float mirror of ConditionalProbabilityModel (models/ipdae.py) that
    records per-layer post-relu activations, for calibration."""
    acts = []
    x = xyz.reshape(-1, 3)
    for i, (W, b) in enumerate(layers_pn):
        x = np.maximum(x @ W + b, 0.0)
        acts.append(x)
    feat = x.reshape(xyz.shape[0], xyz.shape[1], -1).max(axis=1)  # [B, 256]
    tiled = np.repeat(feat[:, None, :], xyz.shape[1], axis=1)
    y = np.concatenate([xyz, tiled], axis=-1).reshape(-1, 3 + feat.shape[-1])
    for i, (W, b) in enumerate(layers_mlp):
        y = y @ W + b
        if i < len(layers_mlp) - 1:
            y = np.maximum(y, 0.0)
        acts.append(y)
    return acts


def _quant_layer(W, b, s_in, s_next, in_max_int, colmax=None):
    """Quantize one dense layer and derive its requant constants.

    Returns dict with: w (int8-valued f32), b (int32, at scale s_in*sw_c),
    r1 (scalar pre-shift), m/rq (per-channel int32 requant), sw (f64, for
    chaining).  Guarantees: accumulator < 2^24 pre-bias (exact in f32) and
    every requant product < 2^30 (no int32 overflow), from worst-case
    bounds independent of data. `colmax` lets the caller derive the column
    scales from a superset of rows (the split concat layer).
    """
    W = np.asarray(W, np.float64)
    b = np.asarray(b, np.float64)
    if colmax is None:
        colmax = np.abs(W).max(axis=0)
    sw = np.where(colmax > 0, 127.0 / np.maximum(colmax, 1e-30), 1.0)
    Wq = np.clip(np.round(W * sw), -127, 127)
    bq = np.round(b * s_in * sw)
    # static overflow bound on |z| (pre-shift target <= 2^14)
    zbound = (np.abs(Wq).T @ np.full(W.shape[0], float(in_max_int))).max() \
        + np.abs(bq).max()
    # the biased accumulator must itself fit int32: at PPPF's widest layers
    # (1024 inputs at ACT_MAX) the theoretical worst case sits within ~1%
    # of 2^31, so verify the bound for the ACTUAL quantized weights and
    # fail conversion loudly rather than wrap silently at inference
    assert zbound < 2.0 ** 31, (
        f"int32 accumulator bound violated ({zbound:.3g}); "
        "reduce activation bits or layer width")
    r1 = max(0, int(np.ceil(np.log2(max(zbound, 1.0)))) - 14)
    ratio = (s_next / (s_in * sw)) * (1 << r1)
    rq = np.clip(14 - np.floor(np.log2(np.maximum(ratio, 1e-30))), 1, 30)
    m = np.round(ratio * np.exp2(rq))
    assert (m < (1 << 16)).all() and (m >= 0).all()
    return {
        "w": Wq.astype(np.float32),
        "b": bq.astype(np.int32),
        "r1": np.int32(r1),
        "m": m.astype(np.int32),
        "rq": rq.astype(np.int32),
    }, sw


def convert_prob_params(prob_params, d: int, L: int, *, n_calib: int = 64,
                        S: int = 64, seed: int = 0):
    """Float ConditionalProbabilityModel params -> integer bundle (numpy).

    Calibration runs the float model on seeded uniform skeletons; activation
    scales get a 1.25x headroom margin. Saturation beyond the calibrated
    range degrades rate only (never decodability). The returned bundle is a
    flat dict of numpy arrays — upload once, feed iprob_pmf_weights.
    """
    import jax

    p = prob_params["params"] if "params" in prob_params else prob_params
    p = jax.tree.map(lambda a: np.asarray(a, np.float64), p)
    pn = [(p["model_pn"]["mlp"][f"dense_{i}"]["linear"]["kernel"],
           p["model_pn"]["mlp"][f"dense_{i}"]["linear"]["bias"])
          for i in range(3)]
    mlp = [(p["model_mlp"][f"dense_{i}"]["linear"]["kernel"],
            p["model_mlp"][f"dense_{i}"]["linear"]["bias"])
           for i in range(3)]

    rng = np.random.default_rng(seed)
    acts = _float_forward_acts(pn, mlp, rng.random((n_calib, S, 3)))
    amax = [max(float(np.abs(a).max()) * 1.25, 1e-3) for a in acts]

    # the exp2 LUT rides in the bundle so jitted consumers get it as an
    # ARGUMENT: a >few-hundred-byte np constant embedded in a jitted
    # program gets hoisted into an executable parameter, and the JAX
    # persistent compilation cache's serialize round-trip loses that
    # parameter plumbing — the second call of the same jit then fails with
    # INVALID_ARGUMENT "supplied N buffers but compiled program expected
    # M" (reproduced; tests/test_rc_device.py::test_codec_two_instances
    # guards the fix)
    bundle = {"d": np.int32(d), "L": np.int32(L), "lut": EXP2_LUT}
    s_in = float(1 << Q_IN)                      # xyz at Q14
    in_max = 1 << Q_IN
    for i in range(3):                           # PN trunk
        s_next = float(ACT_MAX) / amax[i]
        layer, sw = _quant_layer(*pn[i], s_in, s_next, in_max)
        bundle[f"pn{i}"] = layer
        s_in, in_max = s_next, ACT_MAX
    s_feat = s_in                                # scale of the PN features
    # concat layer: xyz (Q14) and features (s_feat) share the first MLP
    # dense; the xyz part is computed separately at Q14 and rescaled to the
    # feature scale before the shared bias/requant
    W0, b0 = mlp[0]
    s_in = s_feat
    for i in range(3):
        if i == 0:
            Wx, Wf = W0[:3], W0[3:]
            s_next = float(ACT_MAX) / amax[3]
            # column scales from the FULL weight matrix (xyz + feature
            # rows): deriving them from the feature rows alone would clip
            # the often-larger xyz weights to int8 range
            layer, sw = _quant_layer(Wf, b0, s_feat, s_next, ACT_MAX,
                                     colmax=np.abs(W0).max(axis=0))
            Wxq = np.clip(np.round(Wx * sw), -127, 127)
            layer["wx"] = Wxq.astype(np.float32)
            # rescale the xyz accumulation (scale 2^Q_IN * sw_c) onto the
            # feature accumulation scale (s_feat * sw_c): sw_c cancels, so
            # one scalar two-stage requant — pre-shift the raw accumulation
            # (bounded by 3 * 2^Q_IN * 127 < 2^23) to <= 2^14, then
            # multiply/shift. The column scales stay per-channel exact.
            ratio = s_feat / (1 << Q_IN)
            assert ratio < 8.0, "degenerate feature scale; retrain/recalib"
            rxa = 9                    # ceil(log2(3 * 2^14 * 127)) - 14
            ratio2 = ratio * (1 << rxa)
            rx = int(np.clip(14 - np.floor(np.log2(max(ratio2, 1e-30))),
                             1, 30))
            layer["mx"] = np.int32(round(ratio2 * (1 << rx)))
            layer["rxa"] = np.int32(rxa)
            layer["rx"] = np.int32(rx)
            assert 0 <= int(layer["mx"]) < (1 << 16)
            bundle["mlp0"] = layer
            s_in = s_next
        else:
            W, b = mlp[i]
            s_next = float(ACT_MAX) / amax[3 + i] if i < 2 else float(S_SM)
            layer, _ = _quant_layer(W, b, s_in, s_next, ACT_MAX)
            bundle[f"mlp{i}"] = layer
            s_in = s_next
    return bundle


# ---------------------------------------------------------------------------
# Inference: numpy spec implementation + JAX (device) implementation.
# Both must produce bit-identical uint16 weights (tests/test_iprob.py).
# ---------------------------------------------------------------------------


def _requant_np(z, layer, relu):
    z = z + layer["b"]
    if relu:
        z = np.maximum(z, 0)
    r1 = int(layer["r1"])
    z = (z + ((1 << r1) >> 1)) >> r1
    a = (z * layer["m"] + ((1 << layer["rq"]) >> 1)) >> layer["rq"]
    if relu:
        return np.clip(a, 0, ACT_MAX)
    return np.clip(a, -32767, 32767)


def iprob_pmf_weights_np(bundle, rec_xyz) -> np.ndarray:
    """Numpy reference of the integer spec: [B, S, 3] f32 skeleton ->
    [B, S, d, L] int32 Q16 softmax weights."""
    B, S, _ = rec_xyz.shape
    d, L = int(bundle["d"]), int(bundle["L"])
    xq = np.round(np.asarray(rec_xyz, np.float32)
                  * float(1 << Q_IN)).astype(np.int32).reshape(-1, 3)
    a = xq
    for i in range(3):
        lw = bundle[f"pn{i}"]
        z = a @ lw["w"].astype(np.int64)
        a = _requant_np(z.astype(np.int32), lw, relu=True)
    feat = a.reshape(B, S, -1).max(axis=1)
    feat_t = np.repeat(feat[:, None, :], S, axis=1).reshape(B * S, -1)

    lw = bundle["mlp0"]
    zf = (feat_t @ lw["w"].astype(np.int64)).astype(np.int32)
    zx = (xq @ lw["wx"].astype(np.int64)).astype(np.int32)
    rxa, rx = int(lw["rxa"]), int(lw["rx"])
    zx = (zx + ((1 << rxa) >> 1)) >> rxa
    zx = (zx * int(lw["mx"]) + ((1 << rx) >> 1)) >> rx
    a = _requant_np(zf + zx, lw, relu=True)
    for i in (1, 2):
        lw = bundle[f"mlp{i}"]
        z = a @ lw["w"].astype(np.int64)
        a = _requant_np(z.astype(np.int32), lw, relu=(i < 2))
    logits = a.reshape(B, S, d, L)
    return _softmax_weights_np(logits)


def _exact_int_matmul(a_int, w_int8):
    """Bit-exact integer matmul via the MXU: operands as bf16 (int8-valued,
    exact), f32 accumulation (partial sums are exact integers < 2^24).
    a_int values may exceed int8: split into two int7-bf16-exact halves."""
    import jax.numpy as jnp

    w = w_int8.astype(jnp.bfloat16)
    hi = a_int >> 7
    lo = a_int & 127
    zhi = jnp.dot(hi.astype(jnp.bfloat16), w,
                  preferred_element_type=jnp.float32)
    zlo = jnp.dot(lo.astype(jnp.bfloat16), w,
                  preferred_element_type=jnp.float32)
    return (zhi.astype(jnp.int32) << 7) + zlo.astype(jnp.int32)


def _requant_jnp(z, layer, relu):
    import jax.numpy as jnp

    z = z + layer["b"]
    if relu:
        z = jnp.maximum(z, 0)
    r1 = layer["r1"]
    z = (z + ((1 << r1) >> 1)) >> r1
    a = (z * layer["m"] + ((1 << layer["rq"]) >> 1)) >> layer["rq"]
    if relu:
        return jnp.clip(a, 0, ACT_MAX)
    return jnp.clip(a, -32767, 32767)


def iprob_pmf_weights(bundle, rec_xyz, *, d=None, L=None):
    """JAX twin of iprob_pmf_weights_np (same integer spec, MXU matmuls):
    [B, S, 3] -> [B, S, d, L] int32 Q16 weights, bit-equal on any backend.

    Fetch cost: emitted as uint16-range int32; the Codec casts to uint16 on
    device so the host pulls 2 bytes/weight — S*d*L*2 = 14 KB/cloud vs the
    35 KB/cloud of full uint16 CDF rows, and the host derives the staircase
    (weights_to_cdf_rows) with pure integer ops.

    d/L: pass explicitly when `bundle` is a jit ARGUMENT (its leaves are
    tracers, so bundle["d"] cannot be read) — the Codec does this; closures
    over concrete bundles may omit them.
    """
    import jax.numpy as jnp

    B, S, _ = rec_xyz.shape
    d = int(bundle["d"]) if d is None else int(d)
    L = int(bundle["L"]) if L is None else int(L)
    xq = jnp.round(rec_xyz.astype(jnp.float32)
                   * float(1 << Q_IN)).astype(jnp.int32).reshape(-1, 3)
    a = xq
    for i in range(3):
        lw = bundle[f"pn{i}"]
        a = _requant_jnp(_exact_int_matmul(a, lw["w"]), lw, relu=True)
    feat = jnp.max(a.reshape(B, S, -1), axis=1)
    feat_t = jnp.repeat(feat[:, None, :], S, axis=1).reshape(B * S, -1)

    lw = bundle["mlp0"]
    zf = _exact_int_matmul(feat_t, lw["w"])
    zx = _exact_int_matmul(xq, lw["wx"])
    rxa, rx = lw["rxa"], lw["rx"]
    zx = (zx + ((1 << rxa) >> 1)) >> rxa
    zx = (zx * lw["mx"] + ((1 << rx) >> 1)) >> rx
    a = _requant_jnp(zf + zx, lw, relu=True)
    for i in (1, 2):
        lw = bundle[f"mlp{i}"]
        a = _requant_jnp(_exact_int_matmul(a, lw["w"]), lw, relu=(i < 2))
    logits = a.reshape(B, S, d, L)
    # prefer the bundle's LUT (an explicit jit argument); the asarray
    # fallback keeps pre-"lut" bundles working but embeds a hoisted
    # constant — see convert_prob_params for why that matters
    lut = bundle.get("lut") if hasattr(bundle, "get") else None
    return softmax_weights_jnp(logits, lut)


def softmax_weights_jnp(logits, lut=None):
    """JAX twin of _softmax_weights_np (shared by the IPDAE and PPPF
    integer models): integer softmax, t <= 0 at scale S_SM -> Q16 log2 ->
    LUT >> n."""
    import jax.numpy as jnp

    t = logits - jnp.max(logits, axis=-1, keepdims=True)
    v = jnp.minimum((-t) * LOG2E_Q8, 31 << 16)
    n = v >> 16
    f = (v >> (16 - LUT_BITS)) & ((1 << LUT_BITS) - 1)
    if lut is None:
        lut = jnp.asarray(EXP2_LUT)
    return jnp.take(lut, f) >> n
