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
