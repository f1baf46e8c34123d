"""Streamed weight-quantized matmuls for BIG-dims decode (7B-class).

The whole-token mega-kernel (``ops/decode_step.py``) is the SMALL-dims
design: at stories15M scale a decode step is launch-overhead bound, so
fusing the entire layer stack into one Pallas launch is the win.  At
7B-class dims the trade inverts — decode is pure weight streaming
(~200M params/layer/token), launch overhead is noise against the
multi-ms token budget, and a single launch whose per-layer weight
windows must ALL sit double-buffered in VMEM cannot fit (measured: the
bf16 gate/up window alone is 90 MB x 2 buffering levels vs the v5e's
128 MB VMEM — the round-4 7B probe crash).  The right TPU design there
is the XLA ``lax.scan`` decode path with per-matmul kernels, each
streaming ONE weight matrix through VMEM in bounded tiles.

This module supplies those kernels for the weight-quantized case XLA
cannot express without materializing dequantized copies (an int4
unpack in XLA writes int8 back to HBM before the dot — erasing the
bandwidth win; int8 x int8 -> int32 with per-call activation
quantization is fused here exactly like the mega-kernel's ``qmm``):

* ``qmatmul(x, wq, ws)`` — (M, K) f32/bf16 activations x (K, N) int8
  weights with per-output-channel f32 scales (``ops.quant.
  quantize_int8(w, axis=0)`` layout) -> (M, N) f32.  Activations are
  quantized per ROW (each sample its own symmetric scale, bit-identical
  to the mega-kernel's batched path), the kernel runs int8 x int8 ->
  int32 on the MXU per (K, nt) weight tile, and the f32 rescale by
  (row scale x channel scale) happens on the way out.
* ``q4=True`` — (K/2, N) nibble-packed weights (``quantize_int4``
  layout: rows k and k+K/2 share a byte): two arithmetic int32 shifts
  unpack the contiguous halves in register and the dot splits as
  ``x[:, :K/2] @ lo + x[:, K/2:] @ hi`` — QUARTER the weight DMA,
  zero sublane relayout (same trick, and the same Mosaic i32-shift
  workaround, as the mega-kernel's ``qmm4``; see quant.unpack_int4).

Weight-streaming accounting at Llama-2-7B layer geometry (dim 4096,
ffn 11008): bf16 streams 403 MB/layer/token, int8 202, int4 101 — at
the v5e's ~819 GB/s pin rate the 32-layer decode floor is ~16 ms/token
bf16 vs ~4 ms int4, and int4 (3.4 GB) leaves room for long contexts
where bf16 (13.5 GB) barely fits the chip at all.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import quant

_Z = np.int32(0)

# Mosaic's scoped-VMEM stack limit is 16 MB by default; every pipelined
# operand is DOUBLE-buffered, and the int4 kernel additionally holds the
# unpacked lo/hi int8 halves in registers/scratch.  The round-4 7B probe
# crashed exactly here on silicon: pick_nt's old flat 12 MB weight-tile
# cap double-buffered to 24 MB.  Budget the whole working set instead.
_VMEM_BUDGET = 12 << 20

# activation-slab row bound: prefill rows beyond this split into
# independent kernel launches (see qmatmul) so the whole-block
# activation fetch can't crowd the weight tiles out of the budget
_M_SLAB = 256


def _auto_nt(M, K, Kst, N, q4):
    """Largest valid output-tile width whose kernel working set fits the
    scoped-VMEM budget: 2x (Kst, nt) weight buffers, 2x (M, nt) f32 out
    buffers, the (M, K) int8 activation block (counted twice for
    safety), and for int4 the unpack chain — the (K, nt) int8 lo/hi
    halves PLUS the (Kst, nt) i32 shift temporary Mosaic materializes
    (measured on silicon: nt=512 at 7B down-proj dims allocated 16.18 MB
    of scoped VMEM ~= 5.8*Kst*nt, vs the 4*Kst*nt a temp-free model
    predicts; budgeting 8*Kst*nt leaves ~35% headroom)."""
    fixed = 2 * M * K
    per_nt = 2 * Kst + (6 * Kst if q4 else 0) + 8 * M
    max_nt = (_VMEM_BUDGET - fixed) // per_nt
    if max_nt <= 0:
        raise ValueError(
            f"qmatmul activation block (M={M}, K={K}) leaves no "
            f"scoped-VMEM headroom for weight tiles — slab the rows "
            f"(prefill this long should chunk its tokens)")
    return pick_nt(N, Kst, 1, cap=max_nt * Kst)


def pick_nt(N, K, itemsize: int = 1, cap: int = 12 << 20) -> int:
    """Largest output-tile width ``nt`` dividing ``N`` whose (K, nt)
    weight block stays under ``cap`` bytes.  Prefers 128-multiples
    (clean lane tiling); falls back to 8-multiples (Mosaic pads the
    lanes, same as the mega-kernel's 288-wide blocks); 0 if none.
    ``qmatmul`` derives ``cap`` from the scoped-VMEM budget (see
    ``_auto_nt``); the default only serves direct callers."""
    best = 0
    for mult in (128, 8):
        for nt in range(mult, N + 1, mult):
            if N % nt == 0 and K * nt * itemsize <= cap and nt > best:
                best = nt
        if best:
            return best
    return best


def _qmm_kernel(xq_ref, w_ref, ws_ref, out_ref, *, q4):
    xq = xq_ref[...]                       # (M, K) int8
    if q4:
        lo, hi = quant.unpack_int4(w_ref[...])
        k2 = w_ref.shape[0]
        acc = jnp.dot(xq[:, :k2], lo,
                      preferred_element_type=jnp.int32) \
            + jnp.dot(xq[:, k2:], hi,
                      preferred_element_type=jnp.int32)
    else:
        acc = jnp.dot(xq, w_ref[...], preferred_element_type=jnp.int32)
    out_ref[...] = acc.astype(jnp.float32) * ws_ref[...]


def qmatmul(x, wq, ws, q4: bool = False, nt: int = None,
            interpret: bool = None):
    """(M, K) x quantized (K, N) -> (M, N) f32 (see module doc).

    ``wq``/``ws`` as produced by ``ops.quant.quantize_int8(w, axis=0)``
    (or ``quantize_int4``: ``wq`` (K/2, N) packed).  Trace-safe (called
    inside the decode scan); ``interpret`` defaults to "not on TPU" so
    the same model code runs the CPU test platform.
    """
    M, K = x.shape
    Kst, N = wq.shape
    assert (Kst * 2 if q4 else Kst) == K, (x.shape, wq.shape, q4)
    assert ws.shape == (1, N), (ws.shape, N)
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"

    # per-row symmetric activation int8 (bit-identical to the
    # mega-kernel's batched qvec_b; XLA fuses this into the scan)
    x32 = x.astype(jnp.float32)
    amax = jnp.maximum(jnp.max(jnp.abs(x32), axis=-1, keepdims=True),
                       1e-30)
    xq = jnp.round(x32 * (127.0 / amax)).astype(jnp.int8)
    sx = amax * (1.0 / 127.0)              # (M, 1) f32

    # long-prompt prefill slabs the activation rows: the (M, K) int8
    # block lives whole in VMEM, so past _M_SLAB rows (a 928-token 7B
    # prefill is a 10 MB block, 2x-counted past the 12 MB budget) the
    # rows split into independent per-slab kernel launches — activation
    # quantization is per-row, so the math is unchanged
    ms = M if M <= _M_SLAB else _M_SLAB
    if nt is None:
        nt = _auto_nt(ms, K, Kst, N, q4)
    if nt <= 0 or N % nt:
        raise ValueError(f"no valid output tiling for N={N} (nt={nt})")

    def call(xq_s):
        return pl.pallas_call(
            functools.partial(_qmm_kernel, q4=q4),
            grid=(N // nt,),
            in_specs=[
                pl.BlockSpec((xq_s.shape[0], K), lambda t: (_Z, _Z),
                             memory_space=pltpu.VMEM),  # xq (fetched once)
                pl.BlockSpec((Kst, nt), lambda t: (_Z, t),
                             memory_space=pltpu.VMEM),  # weight tile
                pl.BlockSpec((1, nt), lambda t: (_Z, t),
                             memory_space=pltpu.VMEM),  # channel scales
            ],
            out_specs=pl.BlockSpec((xq_s.shape[0], nt), lambda t: (_Z, t),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((xq_s.shape[0], N), jnp.float32),
            interpret=interpret,
        )(xq_s, wq, ws)

    if M <= _M_SLAB:
        out = call(xq)
    else:
        pad = (-M) % _M_SLAB
        xq_p = jnp.pad(xq, ((0, pad), (0, 0)))
        out = jnp.concatenate(
            [call(xq_p[i:i + _M_SLAB])
             for i in range(0, M + pad, _M_SLAB)])[:M]
    # row-scale rescale outside the kernel: one (M, N) f32 VPU pass XLA
    # fuses with the consumer, vs teaching Mosaic an (M, 1) block
    return out * sx


def qmatmul_stacked(x, wq_all, ws_all, idx, q4: bool = False,
                    nt: int = None, interpret: bool = None):
    """:func:`qmatmul` against layer ``idx`` of a LAYER-STACKED weight set
    — the rolled-``lax.scan`` decode path for deep models.

    ``wq_all`` (L, Kst, N) int8 / ``ws_all`` (L, 1, N) f32 are the whole
    model's stacked quantized matrices; ``idx`` is a TRACED scalar (the
    scan iteration index).  The kernel selects the layer inside the
    BlockSpec index map via scalar prefetch, so tiles DMA **directly
    from the stacked HBM array** — passing ``wq_all[idx]`` to
    :func:`qmatmul` instead would materialize the slice as a fresh HBM
    buffer every scan iteration (XLA cannot alias a dynamic-slice into
    a kernel operand), which doubles the weight traffic that IS the
    decode bottleneck (measured on silicon at Llama-2-7B geometry:
    0.54 ms/layer/token rolled-with-copy vs 0.27 unrolled; this kernel
    restores the unrolled rate at rolled-scan compile times).
    Arithmetic is bit-identical to ``qmatmul(x, wq_all[idx],
    ws_all[idx])``."""
    M, K = x.shape
    L, Kst, N = wq_all.shape
    assert (Kst * 2 if q4 else Kst) == K, (x.shape, wq_all.shape, q4)
    assert ws_all.shape == (L, 1, N), (ws_all.shape, L, N)
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"

    x32 = x.astype(jnp.float32)
    amax = jnp.maximum(jnp.max(jnp.abs(x32), axis=-1, keepdims=True),
                       1e-30)
    xq = jnp.round(x32 * (127.0 / amax)).astype(jnp.int8)
    sx = amax * (1.0 / 127.0)              # (M, 1) f32

    ms = M if M <= _M_SLAB else _M_SLAB
    if nt is None:
        nt = _auto_nt(ms, K, Kst, N, q4)
    if nt <= 0 or N % nt:
        raise ValueError(f"no valid output tiling for N={N} (nt={nt})")
    iarr = jnp.asarray(idx, jnp.int32).reshape((1,))

    def kernel(idx_ref, xq_ref, w_ref, ws_ref, out_ref):
        del idx_ref  # consumed by the index maps
        _qmm_kernel(xq_ref, w_ref.at[0], ws_ref.at[0], out_ref, q4=q4)

    def call(xq_s):
        m = xq_s.shape[0]
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(N // nt,),
                in_specs=[
                    pl.BlockSpec((m, K), lambda t, i: (_Z, _Z),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, Kst, nt), lambda t, i: (i[0], _Z, t),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 1, nt), lambda t, i: (i[0], _Z, t),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((m, nt), lambda t, i: (_Z, t),
                                       memory_space=pltpu.VMEM),
            ),
            out_shape=jax.ShapeDtypeStruct((m, N), jnp.float32),
            interpret=interpret,
        )(iarr, xq_s, wq_all, ws_all)

    if M <= _M_SLAB:
        out = call(xq)
    else:
        pad = (-M) % _M_SLAB
        xq_p = jnp.pad(xq, ((0, pad), (0, 0)))
        out = jnp.concatenate(
            [call(xq_p[i:i + _M_SLAB])
             for i in range(0, M + pad, _M_SLAB)])[:M]
    return out * sx


def qmatmul_ref(x, wq, ws, q4: bool = False):
    """NumPy mirror of :func:`qmatmul`'s exact arithmetic (tests pin the
    kernel against this, not against the f32 matmul)."""
    x32 = np.asarray(x, np.float32)
    amax = np.maximum(np.max(np.abs(x32), axis=-1, keepdims=True), 1e-30)
    xq = np.round(x32 * (127.0 / amax)).astype(np.int8)
    sx = (amax * (1.0 / 127.0)).astype(np.float32)
    w = np.asarray(wq)
    if q4:
        p = w.astype(np.int32)
        lo = ((p << 28) >> 28).astype(np.int32)
        hi = (p >> 4).astype(np.int32)
        k2 = w.shape[0]
        acc = xq[:, :k2].astype(np.int32) @ lo \
            + xq[:, k2:].astype(np.int32) @ hi
    else:
        acc = xq.astype(np.int32) @ w.astype(np.int32)
    return (acc.astype(np.float32) * np.asarray(ws, np.float32)) \
        * sx
