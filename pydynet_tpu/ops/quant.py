"""Weight-only int8 quantization for the fused decode path.

Decode at stories15M scale is HBM-bandwidth bound: every generated token
streams every weight byte once (reference llm/llama/model.py:258-269 is the
same loop at 300 tok/s on NumPy).  Storing the matmul weights as int8 with a
per-output-channel float32 scale halves the per-token HBM traffic; the
whole-token Pallas kernel feeds the int8 tiles to the MXU as stored
(int8 x int8 -> int32 accumulate, activations quantized per call, f32
rescale by activation-scale x per-channel weight scale afterward) — an
in-kernel int8->bf16 dequantize was measured SLOWER than the DMA it saves
because the relayout repacks sublanes.  Per-channel symmetric int8 keeps the greedy
argmax stable: measured logit RMS error at stories15M scale is ~6e-3 against
f32, an order of magnitude below the bf16 decision margin bench.py gates on.
"""
from __future__ import annotations

import jax.numpy as jnp

INT8_MAX = 127.0


def quantize_int8(w, axis: int):
    """Symmetric per-channel int8 quantization.

    ``axis`` is the contraction axis of the matmul this weight feeds (the
    axis that is summed over), so each *output* channel gets its own scale.

    Returns ``(q, scale)`` with ``q`` int8 the same shape as ``w`` and
    ``scale`` float32 shaped like ``w`` with ``axis`` reduced to 1, such
    that ``q * scale ~= w`` and ``x @ (q * scale) == (x @ q) * scale``.
    """
    w = jnp.asarray(w)
    amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=axis, keepdims=True)
    scale = jnp.maximum(amax, 1e-30) / INT8_MAX
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale),
                 -INT8_MAX, INT8_MAX).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def dequantize_int8(q, scale, dtype=jnp.float32):
    """Inverse of :func:`quantize_int8` (reference/tests only — the decode
    kernel never materializes the dequantized weights; it rescales the
    int32 matmul results instead)."""
    return (q.astype(jnp.float32) * scale).astype(dtype)


INT4_MAX = 7.0


def quantize_int4(w, axis: int):
    """Symmetric per-output-channel int4 quantization, packed two values
    per int8 byte along the CONTRACTION axis.

    Packing layout (chosen so the kernel never interleaves sublanes): a
    (K, N) weight with contraction axis 0 packs rows ``k`` and
    ``k + K/2`` into one byte — low nibble = row ``k``, high nibble = row
    ``k + K/2``.  In-kernel unpacking is then two arithmetic int8 shifts
    producing the contiguous half-matrices ``w[:K/2]`` and ``w[K/2:]``,
    and the matmul splits as ``x @ w = x[:, :K/2] @ lo + x[:, K/2:] @ hi``
    — two half-K MXU dots, zero relayout (the sublane repacking that made
    in-kernel int8->bf16 dequantization a net loss does not occur).

    Returns ``(packed, scale)``: ``packed`` int8 with ``axis`` halved,
    ``scale`` float32 with ``axis`` reduced to 1 (both halves share the
    per-output-channel scale).  ``axis`` length must be even.
    """
    w = jnp.asarray(w)
    K = w.shape[axis]
    assert K % 2 == 0, K
    amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=axis, keepdims=True)
    scale = jnp.maximum(amax, 1e-30) / INT4_MAX
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale),
                 -INT4_MAX, INT4_MAX).astype(jnp.int8)
    lo = jnp.take(q, jnp.arange(K // 2), axis=axis)
    hi = jnp.take(q, jnp.arange(K // 2, K), axis=axis)
    packed = jnp.bitwise_or(jnp.bitwise_and(lo, 0x0F),
                            jnp.left_shift(hi, 4)).astype(jnp.int8)
    return packed, scale.astype(jnp.float32)


def unpack_int4(packed):
    """(lo, hi) int8 halves of a :func:`quantize_int4` pack — the
    in-register unpack the kernel runs per weight tile.

    The shifts happen in int32: Mosaic cannot legalize shifts on packed
    int8 vectors (``arith.shli`` on ``vector<...x4xi8>`` was the round-3
    ``batched-b4-int4`` silicon compile crash, BENCH_r03), while i32
    shifts and the i8<->i32 widen/narrow both lower fine.  The widen/
    narrow is VPU relayout work that overlaps the next tile's DMA in the
    weight-streaming regime int4 exists for."""
    p = packed.astype(jnp.int32)
    lo = (jnp.right_shift(jnp.left_shift(p, 28), 28)).astype(jnp.int8)
    hi = jnp.right_shift(p, 4).astype(jnp.int8)  # arithmetic: sign rides
    return lo, hi


def dequantize_int4(packed, scale, axis: int, dtype=jnp.float32):
    """Inverse of :func:`quantize_int4` (reference/tests only)."""
    lo, hi = unpack_int4(packed)
    q = jnp.concatenate([lo, hi], axis=axis)
    return (q.astype(jnp.float32) * scale).astype(dtype)
