"""Pallas TPU kernel: fused IPDAE patch decoder (fold + tile + MLP).

The decode-side mirror of ops/sa_pallas.py. The XLA decoder materializes
the inv_pool expansion [P, k*128] (512 MB f32 per 8k-patch batch), its
transpose-reshape "fold", the tiled-latent concat [P, k, 128+d], and every
inv_mlp intermediate — all HBM round trips for a network that is almost
pure matmul (reference decoder AE.py:19-27,47-53; driven manually by
decompress.py:96-102). Here the first two inv_pool layers (d->256->1024,
a few MFLOP) stay in XLA, and ONE kernel computes, per (patch-block,
k-block) grid step: the 1024 -> k*128 expansion slice, the fold reshape,
the latent tile+concat, and the whole 4-layer inv_mlp — everything
VMEM-resident. HBM sees [P, 1024] + [P, d] in and [P, k, 3] out.

The expansion weight is pre-permuted so a k-block is a contiguous column
slice: the reference views the [P, k*128] activation as [P, 128, k]
channel-major and transposes (AE.py:49) — fold[p, j, c] = act[p, c*k + j].
Permuting columns c*k + j -> j*128 + c turns each fold row j into one
[1024, 128] matmul, a native MXU shape.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _decoder_kernel(h2_ref, lat_ref, w3_ref, b3_ref,
                    mw1, mb1, mw2, mb2, mw3, mb3, mw4, mb4,
                    out_ref, *, block_k: int, compute_dtype):
    """h2: [BP, 1024] inv_pool activations after layer 2; lat: [BP, d];
    w3/b3: the permuted expansion slice [1024, block_k*128] / [block_k*128];
    mw/mb: inv_mlp layers; out: [BP, block_k, 3]."""
    h2 = h2_ref[...]
    lat = lat_ref[...]
    BP = h2.shape[0]

    def cast(x):
        return x.astype(compute_dtype) if compute_dtype is not None else x

    def dense(x, w, b, relu=True):
        # same mixed-precision contract as ops/sa_pallas.py: bf16 operands,
        # f32 accumulation (Mosaic requires 32-bit matmul accumulators),
        # f32 bias+relu, re-cast between layers
        h = jnp.dot(cast(x), cast(w), preferred_element_type=jnp.float32)
        h = h + b.astype(jnp.float32)
        if relu:
            h = jax.nn.relu(h)
        return cast(h)

    w3 = w3_ref[...]
    b3 = b3_ref[...]
    ms = [(mw1[...], mb1[...]), (mw2[...], mb2[...]),
          (mw3[...], mb3[...]), (mw4[...], mb4[...])]

    # unrolled loop over the k-slots of this block: every matmul is a clean
    # 2D [BP, C] x [C, C'] MXU shape, no minor-dim reshapes
    for t in range(block_k):
        fold_t = dense(h2, w3[:, t * 128:(t + 1) * 128],
                       b3[t * 128:(t + 1) * 128])            # [BP, 128]
        x = jnp.concatenate([fold_t.astype(jnp.float32),
                             lat.astype(jnp.float32)], axis=-1)
        for li, (w, b) in enumerate(ms):
            x = dense(x, w, b, relu=li < 3)                  # final: no relu
        out_ref[:, t, :] = x.astype(jnp.float32).reshape(BP, 3)


def permute_expansion(w3: jnp.ndarray, b3: jnp.ndarray, k: int):
    """Reorder inv_pool layer-3 columns from channel-major (c*k + j, the
    reference's [B, 128, k] view, AE.py:49) to point-major (j*128 + c)."""
    C = w3.shape[0]
    w3r = w3.reshape(C, 128, k).transpose(0, 2, 1).reshape(C, k * 128)
    b3r = b3.reshape(128, k).T.reshape(k * 128)
    return w3r, b3r


def _pick_block_k(k: int, want: int) -> int:
    for bk in range(min(want, k), 0, -1):
        if k % bk == 0:
            return bk
    return 1


def patch_decoder_fused(latent_q: jnp.ndarray, inv_pool_wb, inv_mlp_wb, *,
                        k: int, compute_dtype=None, block_p: int = 256,
                        block_k: int = 8,
                        interpret: bool = False) -> jnp.ndarray:
    """Fused IPDAE patch decoder: [P, d] quantized latent -> [P, k, 3].

    Args:
      latent_q: [P, d] float32 (already centered, sym - L//2).
      inv_pool_wb: 3 (kernel, bias) pairs, d->256->1024->k*128 (AE.py:19-26).
      inv_mlp_wb: 4 (kernel, bias) pairs, (128+d)->128->64->32->3 with relu
        on all but the last (AE.py:27).
      k: points per decoded patch (K // ALPHA).
      compute_dtype: None for f32, jnp.bfloat16 for mixed precision.
      block_p/block_k: grid tile sizes; block_k is clamped to a divisor of k
        (VMEM working set ~ [1024, block_k*128] f32 for the weight slice).
        block_p 256 measured 18% faster than 128 on v5e at P=8192 with
        bit-identical output (fewer grid steps amortize the per-step
        weight-slice revisit); 16 exceeds VMEM in the encoder's case but
        the decoder's per-patch state is small enough for wide blocks.
      interpret: Pallas interpreter for CPU CI (tests/test_decoder_pallas.py).
    Returns:
      [P, k, 3] float32 patch points.
    """
    P, d = latent_q.shape
    (w1, b1), (w2, b2), (w3, b3) = inv_pool_wb
    block_k = _pick_block_k(k, block_k)

    lat = latent_q.astype(jnp.float32)
    cast = (lambda x: x.astype(compute_dtype)) if compute_dtype is not None \
        else (lambda x: x)

    # inv_pool layers 1-2 in XLA: [P, d] x [d, 256] and [P, 256] x
    # [256, 1024] — a few MFLOP, and h2 is the only intermediate HBM sees
    h1 = jax.nn.relu(jnp.dot(cast(lat), cast(w1),
                             preferred_element_type=jnp.float32)
                     + b1.astype(jnp.float32))
    h2 = jax.nn.relu(jnp.dot(cast(cast(h1)), cast(w2),
                             preferred_element_type=jnp.float32)
                     + b2.astype(jnp.float32))               # [P, 1024] f32

    w3r, b3r = permute_expansion(w3, b3, k)

    pad = (-P) % block_p
    if pad:
        h2 = jnp.concatenate([h2, jnp.zeros((pad, h2.shape[1]), h2.dtype)])
        lat = jnp.concatenate([lat, jnp.zeros((pad, d), lat.dtype)])
    Pp = P + pad

    full = lambda a: pl.BlockSpec(a.shape, lambda j, i: (0,) * a.ndim)
    args, specs = [], []
    for w, b in inv_mlp_wb:
        args += [w, b]
        specs += [full(w), full(b)]

    # grid (k-blocks OUTER, patch-blocks INNER): the [1024, block_k*128]
    # weight slice index depends only on j, so Pallas fetches each slice
    # once per j instead of once per grid step — total expansion-weight
    # traffic is one pass over w3r, not P/block_p passes
    out = pl.pallas_call(
        functools.partial(_decoder_kernel, block_k=block_k,
                          compute_dtype=compute_dtype),
        grid=(k // block_k, Pp // block_p),
        in_specs=[
            pl.BlockSpec((block_p, h2.shape[1]), lambda j, i: (i, 0)),
            pl.BlockSpec((block_p, d), lambda j, i: (i, 0)),
            pl.BlockSpec((w3r.shape[0], block_k * 128), lambda j, i: (0, j)),
            pl.BlockSpec((block_k * 128,), lambda j, i: (j,)),
            *specs,
        ],
        out_specs=pl.BlockSpec((block_p, block_k, 3), lambda j, i: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((Pp, k, 3), jnp.float32),
        interpret=interpret,
    )(h2, lat, w3r, b3r, *args)
    return out[:P]
