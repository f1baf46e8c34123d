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

# decode rows (M <= this) take the K-grid layout; prefill slabs keep the
# N-grid (their (M, N) i32 accumulator would not fit VMEM)
_KGRID_M_MAX = 32

# K-grid weight-tile depth: 128 rows measured best at 7B gate/up dims
# (kt=256's 11 MB double-buffered window pipelined WORSE: 0.842 vs
# 0.807 ms/iter interleaved; kt=128's 5.6 MB leaves the copy engine a
# deeper queue) — larger kt only shrinks grid overhead, which is noise
# against multi-ms weight streams
_KGRID_KT = 128


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


def _pick_kt(M, K, Kst, N, q4):
    """K-grid weight-tile depth: the largest 128-multiple ``kt``
    dividing ``Kst`` (capped at :data:`_KGRID_KT`; Pallas requires block
    minor dims to be 128-multiples, and the (M, kt) activation blocks
    put ``kt`` minor) whose working set fits the scoped-VMEM budget —
    2x (kt, N) weight buffers, the biased int4 unpack's lo/hi halves
    (2x kt*N int8; no i32 widen temporary — see _unpack_int4_biased),
    2x the (M, N) i32 accumulator block, and the (M, K) int8 activation
    block (delivered as (M, kt) column blocks, but counted whole for
    slack).  0 if nothing fits (the caller falls back to the N-grid)."""
    fixed = 2 * M * K + 8 * M * N
    per_kt = (4 if q4 else 2) * N
    max_kt = (_VMEM_BUDGET - fixed) // per_kt
    best = 0
    for kt in range(128, Kst + 1, 128):
        if Kst % kt == 0 and kt <= min(max_kt, _KGRID_KT) and kt > best:
            best = kt
    return best


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


def _unpack_int4_biased(w):
    """(kt, N) packed int8 -> (lo+8, hi+8) int8 in [0, 16): for a two's-
    complement nibble ``s`` with stored bits ``u``, ``(u & 0xF) ^ 8 ==
    s + 8`` in both sign cases.  Pure i32 mask/xor/shift on the PACKED
    lanes via bitcast — no i8 arithmetic (Mosaic legalizes neither i8
    shifts nor i8 subi on packed vectors), and unlike
    ``quant.unpack_int4`` no i8<->i32 widen/narrow relayout and 4x fewer
    vector elements touched (byte-wise ops are position-preserving under
    the bitcast regardless of lane byte order; the cross-byte bits the
    i32 shift drags in are masked off per byte).  The +8 bias is linear
    in the dot — ``dot(x, s+8) = dot(x, s) + 8*rowsum(x)`` — and the
    caller removes it OUTSIDE the kernel in exact int32
    (:func:`_kgrid_call`)."""
    p32 = pltpu.bitcast(w, jnp.int32)
    mf = jnp.int32(0x0F0F0F0F)
    m8 = jnp.int32(0x08080808)
    hi = jax.lax.shift_right_logical(p32, jnp.int32(4))
    lo8 = pltpu.bitcast((p32 & mf) ^ m8, jnp.int8)
    hi8 = pltpu.bitcast((hi & mf) ^ m8, jnp.int8)
    return lo8, hi8


def _kgrid_kernel(xlo_ref, w_ref, out_ref, xhi_ref, *, q4):
    """One K-slice of the decode gemv: dot the (kt, N) weight tile
    against its activation-column block and accumulate int32 into the
    resident (M, N) output block.  Integer addition is order-exact, so
    the result (after the caller's bias fixup for q4) is bit-identical
    to the N-grid kernel's per-tile full-K accumulation."""
    t = pl.program_id(0)
    if q4:
        lo8, hi8 = _unpack_int4_biased(w_ref[...])
        acc = jnp.dot(xlo_ref[...], lo8,
                      preferred_element_type=jnp.int32) \
            + jnp.dot(xhi_ref[...], hi8,
                      preferred_element_type=jnp.int32)
    else:
        acc = jnp.dot(xlo_ref[...], w_ref[...],
                      preferred_element_type=jnp.int32)

    @pl.when(t == 0)
    def _():
        out_ref[...] = acc

    @pl.when(t > 0)
    def _():
        out_ref[...] += acc


def _kgrid_call(xq, wq, ws, sx, *, q4, kt, interpret, idx=None):
    """Launch the K-grid kernel over ``Kst // kt`` weight-row tiles.

    The K-grid streams (kt, N) FULL-WIDTH row blocks — contiguous HBM
    reads — where the N-grid's (Kst, nt) tile is Kst separate nt-byte
    strided chunks (nt=512 at 7B gate/up dims).  Measured interleaved on
    silicon at (4096, 22016): int8 0.807 vs 0.999 ms/iter (+24%), int4
    0.773 vs 0.827 (scripts/_drive_kgrid.py) — decode IS this DMA, so
    the layout is the tok/s.  The (M, N) accumulator stays int32 in VMEM
    across all grid steps (exact; see _kgrid_kernel) and the f32 rescale
    by (channel scale x row scale) fuses into the consumer outside.

    The activation columns arrive as (M, kt) BlockSpec blocks — int4's
    lo/hi halves as two block views of the same array at block offsets
    ``t`` and ``t + Kst//kt`` — because an in-kernel ``pl.ds`` on the
    minor dim legalizes only at 128-multiple offsets (Mosaic rejected
    kt=64 on silicon); block-unit index maps carry no such constraint.
    ``idx`` (traced scalar) selects a layer of a stacked (L, Kst, N)
    weight set via scalar prefetch — the rolled-scan path."""
    M, K = xq.shape
    if idx is None:
        Kst, N = wq.shape
        kb = Kst // kt

        def xlo_map(t):
            return (_Z, t)

        def xhi_map(t, kb=kb):
            return (_Z, t + kb)

        w_bs = pl.BlockSpec((kt, N), lambda t: (t, _Z),
                            memory_space=pltpu.VMEM)
        grid_kw = dict(grid=(kb,))
        operands = (xq, wq)
    else:
        L, Kst, N = wq.shape
        kb = Kst // kt

        def xlo_map(t, i):
            return (_Z, t)

        def xhi_map(t, i, kb=kb):
            return (_Z, t + kb)

        w_bs = pl.BlockSpec((1, kt, N), lambda t, i: (i[0], t, _Z),
                            memory_space=pltpu.VMEM)
        grid_kw = dict(grid=(kb,))
        operands = (jnp.asarray(idx, jnp.int32).reshape((1,)), xq, wq)

    x_bs = pl.BlockSpec((M, kt), xlo_map, memory_space=pltpu.VMEM)
    in_specs = [x_bs, w_bs]
    if q4:
        in_specs.append(pl.BlockSpec((M, kt), xhi_map,
                                     memory_space=pltpu.VMEM))
        operands = operands + (xq,)

    def kernel(*refs):
        if idx is None:
            xlo_ref, w_ref, *rest = refs
        else:
            _, xlo_ref, w_ref, *rest = refs
            w_ref = w_ref.at[0]
        xhi_ref = rest[0] if q4 else None
        _kgrid_kernel(xlo_ref, w_ref, rest[-1], xhi_ref, q4=q4)

    out_bs_map = (lambda t, i: (_Z, _Z)) if idx is not None \
        else (lambda t: (_Z, _Z))
    if idx is None:
        grid_kw.update(in_specs=in_specs,
                       out_specs=pl.BlockSpec((M, N), out_bs_map,
                                              memory_space=pltpu.VMEM))
    else:
        grid_kw = dict(grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(kb,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((M, N), out_bs_map,
                                   memory_space=pltpu.VMEM),
        ))
    acc = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.int32),
        interpret=interpret,
        **grid_kw,
    )(*operands)
    if q4:
        # remove the +8 unpack bias in exact int32 (dot(x, s+8) summed
        # over BOTH halves biases by 8 * rowsum over ALL of xq); XLA
        # fuses the rowsum with the activation quantization above
        acc = acc - 8 * jnp.sum(xq.astype(jnp.int32), axis=1,
                                keepdims=True)
    # same f32 op order as the N-grid path: (f32(acc) * ws) * sx
    return acc.astype(jnp.float32) * ws * sx


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

    # decode rows ride the K-grid layout (contiguous full-width weight
    # DMA, +24% measured — see _kgrid_call); explicit nt forces N-grid
    if nt is None and M <= _KGRID_M_MAX:
        kt = _pick_kt(M, K, Kst, N, q4)
        if kt:
            return _kgrid_call(xq, wq, ws, sx, q4=q4, kt=kt,
                               interpret=interpret)

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

    # decode rows ride the K-grid layout exactly like qmatmul's; the
    # per-layer (1, N) channel scales slice outside the kernel (one
    # 128 KB gather per scan step — noise against the weight stream)
    if nt is None and M <= _KGRID_M_MAX:
        kt = _pick_kt(M, K, Kst, N, q4)
        if kt:
            ws_l = jax.lax.dynamic_index_in_dim(ws_all, idx, 0,
                                                keepdims=False)
            return _kgrid_call(xq, wq_all, ws_l, sx, q4=q4, kt=kt,
                               interpret=interpret, idx=idx)

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
