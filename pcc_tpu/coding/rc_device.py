"""Range DECODING on the TPU: all clouds of a batch in parallel.

The host range decoder needs full CDF rows, so the decompress path used to
fetch d*L uint16 PMF weights per position (~1.8 MB per 128-cloud batch over
a ~30 MB/s tunnel) plus a separate CDF dispatch. But each cloud's latent
stream is INDEPENDENT, the coding CDFs are already computed on device by
the deterministic integer path (coding/iprob.py), and one symbol step of
the range decoder is a handful of integer ops — so a lax.scan over the
S*d symbol slots decodes the whole batch lane-parallel on the VPU instead.
The decompress pipeline becomes: upload skeletons + raw byte streams
(~0.15 MB), ONE device program (CDF staircase -> range decode -> decoder
network), one packed fetch.

Semantics are the byte-exact mirror of the C++/python coder
(coding/_native/rangecoder.cpp Decoder, coding/rangecoder.py::_py_decode):
LZMA-style carry-less decode with 32-bit range, ==2-byte-max renorm per
symbol (total <= 2^16 guarantees rng >= 2^8 after one symbol, so two
conditional shifts restore rng >= 2^24), zero-padding past the stream end.
Integer divisions are uint32 and exact on every XLA backend (pinned
against the host coder by tests/test_rc_device.py, and on real TPU
hardware during bring-up).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from pcc_tpu.coding.iprob import _exact_div_jnp, bounds_supported

# plain python ints, NOT jnp scalars: a module-level jnp array closed over
# by the jitted program becomes a hoisted executable parameter, which the
# persistent compilation cache round-trip mishandles (see
# iprob.convert_prob_params). Python ints inline as literals.
_TOP = 1 << 24


def staircase_full(w: jnp.ndarray) -> jnp.ndarray:
    """Full integer CDF staircase on device: [..., L] int32 Q16 weights ->
    [..., L+1] int32 rows, bit-equal to the host weights_to_cdf_rows
    (same int32-only exact floor division as iprob_encode_bounds)."""
    L = w.shape[-1]
    assert bounds_supported(L), f"L={L} exceeds the int32-exact proof"
    ceil = max(1, int(np.ceil(np.log2(L))))
    m = 13 - ceil
    k = (1 << 16) - (L + 1)
    cum = jnp.cumsum(w, axis=-1)
    cum = jnp.concatenate([jnp.zeros_like(cum[..., :1]), cum], axis=-1)
    total = jnp.maximum(cum[..., -1:], 1)
    q = _exact_div_jnp(cum, k, total, m)
    # iota, not arange: arange materializes an np constant that the
    # persistent compilation cache's serialize round-trip mishandles when
    # hoisted into an executable parameter (see iprob.convert_prob_params)
    return q + jax.lax.iota(jnp.int32, L + 1)


def range_decode_batch(cdf: jnp.ndarray, streams: jnp.ndarray) -> jnp.ndarray:
    """Decode B independent streams under per-slot CDF rows.

    Args:
      cdf: [B, n, L+1] int32 staircase rows, every row totalling 2^16 - 1.
      streams: [B, Lmax] uint8, each stream zero-padded to the batch max
        (the coder's own convention: reads past the end yield 0).
    Returns:
      [B, n] int32 decoded symbols.
    """
    B, n, Lp = cdf.shape
    total = (1 << 16) - 1                  # python int: inlined literal
    pad = jnp.zeros((B, 1), jnp.uint8)     # safe gather target past the end
    data = jnp.concatenate([streams, pad], axis=1)
    end = streams.shape[1]

    def get_byte(pos):
        idx = jnp.minimum(pos, end)
        return jnp.take_along_axis(data, idx[:, None], axis=1)[:, 0]

    # 5-byte init (the first emitted byte is the encoder's zero cache)
    code = jnp.zeros((B,), jnp.uint32)
    pos = jnp.zeros((B,), jnp.int32)
    for _ in range(5):
        code = (code << 8) | get_byte(pos).astype(jnp.uint32)
        pos = pos + 1
    rng = jnp.full((B,), 0xFFFFFFFF, jnp.uint32)

    def step(carry, row):
        code, rng, pos = carry
        rng = rng // total
        target = jnp.minimum(code // rng, total - 1)
        rowu = row.astype(jnp.uint32)                       # [B, L+1]
        s = jnp.sum((rowu <= target[:, None]).astype(jnp.int32),
                    axis=1) - 1
        s = jnp.clip(s, 0, Lp - 2)
        start = jnp.take_along_axis(rowu, s[:, None], axis=1)[:, 0]
        size = jnp.take_along_axis(rowu, s[:, None] + 1, axis=1)[:, 0] - start
        code = code - start * rng                           # uint32 wrap
        rng = rng * size
        # renorm: <= 2 byte loads per symbol (rng >= 2^8 post-consume since
        # rng_pre >= 2^24 and size >= 1 with total < 2^16)
        for _ in range(2):
            need = rng < _TOP
            byte = get_byte(pos).astype(jnp.uint32)
            code = jnp.where(need, (code << 8) | byte, code)
            rng = jnp.where(need, rng << 8, rng)
            pos = pos + need.astype(jnp.int32)
        return (code, rng, pos), s

    rows = jnp.moveaxis(cdf, 1, 0)                          # [n, B, L+1]
    _, syms = jax.lax.scan(step, (code, rng, pos), rows)
    return jnp.moveaxis(syms, 0, 1)                         # [B, n]
