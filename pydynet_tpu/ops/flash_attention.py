"""Blockwise (flash) attention for TPU — Pallas forward AND backward.

``flash_attention_causal`` streams K/V through a double-buffered VMEM
window with a running softmax (O(block) VMEM — NOT O(L·d): at no point is
a full-length K or V resident on-chip, so the kernel scales to the
long-context regime it exists for) and carries a custom VJP whose backward
is also blockwise Pallas: the forward additionally emits the per-row
log-sum-exp, and two kernels recompute probabilities per block to
accumulate dq and dk/dv — no O(L^2) tensor is ever materialized, forward
or backward.

The streamed operand rides explicit ``make_async_copy`` DMA from HBM
(``pltpu.ANY`` refs), which requires the lane (feature) dim to be a
multiple of 128 — the wrapper pads head_dim once (zero lanes are exact:
they contribute 0 to every dot product) and strips the pad on the way out.
Block sizes are picked from (L, d) against a ~4MB VMEM budget.

Shapes that don't tile (L % block != 0) fall back to the XLA einsum
composite with the analytic softmax gradient.

Computes the reference's causal scaled-dot-product attention (reference
llm/llama/model.py:113-118: scores = q @ k^T / sqrt(hd) + causal mask,
softmax, @ v) as a deliberate TPU redesign: blockwise streaming instead
of the materialized (L, L) score matrix; routed via nn/functional.py's
scaled_dot_product_attention.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

_Z = np.int32(0)  # index-map literal: x64 would make a bare 0 an i64
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .decode_step import lane_pad_dim  # one home for the 128-lane round-up


def mha_reference(q, k, v, mask=None, scale=None):
    """(B, L, H, d) x (B, M, H, d) -> (B, L, H, d), additive mask (L, M)."""
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    # accumulate in at least f32 (bf16 inputs), but never BELOW the input
    # precision (f64 grad-check parity)
    acc = jnp.promote_types(q.dtype, jnp.float32)
    s = jnp.einsum("blhd,bmhd->bhlm", q, k,
                   preferred_element_type=acc) * scale
    if mask is not None:
        s = s + mask.astype(acc)
    p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    return jnp.einsum("bhlm,bmhd->blhd", p, v)


def pick_blocks(L: int, d: int, itemsize: int = 4):
    """(block_q, block_k) under a ~4MB streaming-buffer budget.

    Larger K blocks amortize DMA issue latency; the double-buffered window
    costs 2 buffers x 2 operands x block_k x d_pad bytes."""
    dp = lane_pad_dim(d)
    budget = 4 * 1024 * 1024
    bk = 512
    while bk > 128 and (4 * bk * dp * itemsize > budget or L % bk):
        bk //= 2
    bq = 256
    while bq > 128 and L % bq:
        bq //= 2
    return bq, bk


def _stream(ref, b, start, size, buf, sem):
    """Async copy ref[b, start:start+size, :] -> buf."""
    return pltpu.make_async_copy(ref.at[b, pl.ds(start, size), :], buf, sem)


# ===================================================================== #
#                              forward                                   #
# ===================================================================== #
def _fa_kernel(q_ref, k_any, v_any, o_ref, lse_ref, kbuf, vbuf, rsem, *,
               scale, causal, block_q, block_k, seq_len):
    """One (head, q-block) program: stream K/V blocks from HBM through a
    double buffer with a running softmax; also emits the row log-sum-exp
    needed by the blockwise backward."""
    b = pl.program_id(0)
    qi = pl.program_id(1)
    q = q_ref[0].astype(jnp.float32) * scale  # (block_q, dp)
    dp = q.shape[-1]

    q_pos = qi * block_q + jax.lax.broadcasted_iota(
        jnp.int32, (block_q, block_k), 0)
    num_kb = np.int32(seq_len // block_k)
    if causal:
        # k-blocks covering [0, (qi+1)*block_q): correct for ANY block
        # ratio (block_q//block_k would be 0 when block_k > block_q)
        last = (qi * np.int32(block_q) + np.int32(block_q + block_k - 1)) \
            // np.int32(block_k)
        num = jnp.minimum(jax.lax.convert_element_type(last, jnp.int32),
                          num_kb)
    else:
        num = num_kb

    def get_k(slot, kb):
        return _stream(k_any, b, kb * np.int32(block_k), block_k,
                       kbuf.at[slot], rsem.at[slot])

    def get_v(slot, kb):
        return _stream(v_any, b, kb * np.int32(block_k), block_k,
                       vbuf.at[slot], rsem.at[np.int32(2) + slot])

    get_k(_Z, _Z).start()
    get_v(_Z, _Z).start()

    m0 = jnp.full((block_q, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    acc0 = jnp.zeros((block_q, dp), jnp.float32)

    def body(kb, carry):
        m, l, acc = carry
        slot = jax.lax.rem(kb, np.int32(2))
        nxt = jax.lax.rem(kb + np.int32(1), np.int32(2))

        @pl.when(kb + 1 < num)
        def _():
            get_k(nxt, kb + np.int32(1)).start()
            get_v(nxt, kb + np.int32(1)).start()

        get_k(slot, kb).wait()
        get_v(slot, kb).wait()
        k = kbuf[slot].astype(jnp.float32)
        v = vbuf[slot].astype(jnp.float32)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        if causal:
            k_pos = kb * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1)
            s = jnp.where(k_pos <= q_pos, s, jnp.float32(-jnp.inf))
        m_new = jnp.maximum(m, jnp.max(s, -1, keepdims=True))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)
        l_new = l * alpha + jnp.sum(p, -1, keepdims=True)
        acc_new = acc * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return m_new, l_new, acc_new

    m, l, acc = jax.lax.fori_loop(np.int32(0), num, body, (m0, l0, acc0))
    o_ref[0] = (acc / l).astype(o_ref.dtype)
    lse_ref[0] = m + jnp.log(l)  # (block_q, 1)


def _fa_forward(q, k, v, scale, causal, block_q, block_k, interpret):
    """q/k/v: (BH, L, dp) lane-padded -> (out (BH, L, dp), lse (BH, L, 1))."""
    BH, L, dp = q.shape
    grid = (BH, L // block_q)
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    return pl.pallas_call(
        functools.partial(_fa_kernel, scale=scale, causal=causal,
                          block_q=block_q, block_k=block_k, seq_len=L),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, dp), lambda b, i: (b, i, _Z),
                         memory_space=pltpu.VMEM),
            any_spec,   # K stays in HBM; streamed by the kernel
            any_spec,   # V
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, dp), lambda b, i: (b, i, _Z),
                         memory_space=pltpu.VMEM),
            # (.., block_q, 1): trailing dim 1 == full array dim (tileable)
            pl.BlockSpec((1, block_q, 1), lambda b, i: (b, i, _Z),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct((BH, L, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, block_k, dp), k.dtype),
            pltpu.VMEM((2, block_k, dp), v.dtype),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        interpret=interpret,
    )(q, k, v)


# ===================================================================== #
#                              backward                                  #
# ===================================================================== #
def _fa_bwd_dq_kernel(q_ref, do_ref, lse_ref, dd_ref, k_any, v_any, dq_ref,
                      kbuf, vbuf, rsem, *, scale, causal, block_q, block_k,
                      seq_len):
    """dq for one (head, q-block): stream K/V, recompute p from lse."""
    b = pl.program_id(0)
    qi = pl.program_id(1)
    q = q_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0]  # (block_q, 1)
    dd = dd_ref[0]

    q_pos = qi * block_q + jax.lax.broadcasted_iota(
        jnp.int32, (block_q, block_k), 0)
    dq0 = jnp.zeros((block_q, q.shape[-1]), jnp.float32)
    num_kb = np.int32(seq_len // block_k)
    if causal:
        # k-blocks covering [0, (qi+1)*block_q): correct for ANY block
        # ratio (block_q//block_k would be 0 when block_k > block_q)
        last = (qi * np.int32(block_q) + np.int32(block_q + block_k - 1)) \
            // np.int32(block_k)
        num = jnp.minimum(jax.lax.convert_element_type(last, jnp.int32),
                          num_kb)
    else:
        num = num_kb

    def get_k(slot, kb):
        return _stream(k_any, b, kb * np.int32(block_k), block_k,
                       kbuf.at[slot], rsem.at[slot])

    def get_v(slot, kb):
        return _stream(v_any, b, kb * np.int32(block_k), block_k,
                       vbuf.at[slot], rsem.at[np.int32(2) + slot])

    get_k(_Z, _Z).start()
    get_v(_Z, _Z).start()

    def body(kb, dq):
        slot = jax.lax.rem(kb, np.int32(2))
        nxt = jax.lax.rem(kb + np.int32(1), np.int32(2))

        @pl.when(kb + 1 < num)
        def _():
            get_k(nxt, kb + np.int32(1)).start()
            get_v(nxt, kb + np.int32(1)).start()

        get_k(slot, kb).wait()
        get_v(slot, kb).wait()
        k = kbuf[slot].astype(jnp.float32)
        v = vbuf[slot].astype(jnp.float32)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        if causal:
            k_pos = kb * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1)
            s = jnp.where(k_pos <= q_pos, s, jnp.float32(-jnp.inf))
        p = jnp.exp(s - lse)
        dp_ = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        ds = p * (dp_ - dd)
        return dq + jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    dq = jax.lax.fori_loop(np.int32(0), num, body, dq0)
    dq_ref[0] = (dq * scale).astype(dq_ref.dtype)


def _fa_bwd_dkv_kernel(k_ref, v_ref, lse_ref, dd_ref, q_any, do_any,
                       dk_ref, dv_ref, qbuf, dobuf, rsem, *, scale, causal,
                       block_q, block_k, seq_len):
    """dk/dv for one (head, kv-block): stream Q/dO blocks from HBM."""
    b = pl.program_id(0)
    kj = pl.program_id(1)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)

    k_pos = kj * block_k + jax.lax.broadcasted_iota(
        jnp.int32, (block_q, block_k), 1)
    dk0 = jnp.zeros((block_k, k.shape[-1]), jnp.float32)
    dv0 = jnp.zeros((block_k, k.shape[-1]), jnp.float32)
    num_qb = np.int32(seq_len // block_q)
    if causal:
        # only Q blocks at or after this KV block contribute
        first = jax.lax.convert_element_type(
            (kj * np.int32(block_k)) // np.int32(block_q), jnp.int32)
    else:
        first = np.int32(0)

    def get_q(slot, qi):
        return _stream(q_any, b, qi * np.int32(block_q), block_q,
                       qbuf.at[slot], rsem.at[slot])

    def get_do(slot, qi):
        return _stream(do_any, b, qi * np.int32(block_q), block_q,
                       dobuf.at[slot], rsem.at[np.int32(2) + slot])

    get_q(_Z, first).start()
    get_do(_Z, first).start()

    def body(i, carry):
        dk, dv = carry
        qi = first + i
        slot = jax.lax.rem(i, np.int32(2))
        nxt = jax.lax.rem(i + np.int32(1), np.int32(2))

        @pl.when(qi + 1 < num_qb)
        def _():
            get_q(nxt, qi + np.int32(1)).start()
            get_do(nxt, qi + np.int32(1)).start()

        get_q(slot, qi).wait()
        get_do(slot, qi).wait()
        q = qbuf[slot].astype(jnp.float32)
        do = dobuf[slot].astype(jnp.float32)
        lse = lse_ref[0, pl.ds(qi * np.int32(block_q), block_q), :]
        dd = dd_ref[0, pl.ds(qi * np.int32(block_q), block_q), :]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        if causal:
            q_pos = qi * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0)
            s = jnp.where(k_pos <= q_pos, s, jnp.float32(-jnp.inf))
        p = jnp.exp(s - lse)  # (block_q, block_k)
        dv_new = dv + jax.lax.dot_general(
            p, do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dp_ = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        ds = p * (dp_ - dd)
        dk_new = dk + jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return dk_new, dv_new

    dk, dv = jax.lax.fori_loop(np.int32(0), num_qb - first, body, (dk0, dv0))
    dk_ref[0] = (dk * scale).astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _fa_backward(q, k, v, o, lse, do, scale, causal, block_q, block_k,
                 interpret):
    """q/k/v/o/do: (BH, L, dp) lane-padded, lse: (BH, L, 1) -> dq, dk, dv."""
    BH, L, dp = q.shape
    dd = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1,
                 keepdims=True)  # (BH, L, 1)

    common = dict(scale=scale, causal=causal, block_q=block_q,
                  block_k=block_k, seq_len=L)
    blk = lambda n: pl.BlockSpec((1, n, dp), lambda b, i: (b, i, _Z),
                                 memory_space=pltpu.VMEM)
    row = lambda n: pl.BlockSpec((1, n, 1), lambda b, i: (b, i, _Z),
                                 memory_space=pltpu.VMEM)
    full_row = pl.BlockSpec((1, L, 1), lambda b, i: (b, _Z, _Z),
                            memory_space=pltpu.VMEM)
    any_spec = pl.BlockSpec(memory_space=pl.ANY)

    dq = pl.pallas_call(
        functools.partial(_fa_bwd_dq_kernel, **common),
        grid=(BH, L // block_q),
        in_specs=[blk(block_q), blk(block_q), row(block_q), row(block_q),
                  any_spec, any_spec],
        out_specs=blk(block_q),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, block_k, dp), k.dtype),
            pltpu.VMEM((2, block_k, dp), v.dtype),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        interpret=interpret,
    )(q, do, lse, dd, k, v)

    dk, dv = pl.pallas_call(
        functools.partial(_fa_bwd_dkv_kernel, **common),
        grid=(BH, L // block_k),
        in_specs=[blk(block_k), blk(block_k), full_row, full_row,
                  any_spec, any_spec],
        out_specs=[blk(block_k), blk(block_k)],
        out_shape=[jax.ShapeDtypeStruct(k.shape, k.dtype),
                   jax.ShapeDtypeStruct(v.shape, v.dtype)],
        scratch_shapes=[
            pltpu.VMEM((2, block_q, dp), q.dtype),
            pltpu.VMEM((2, block_q, dp), do.dtype),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        interpret=interpret,
    )(k, v, lse, dd, q, do)
    return dq, dk, dv


# ===================================================================== #
#                         public custom-VJP op                           #
# ===================================================================== #
def _causal_mask(L, dtype=jnp.float32):
    return jnp.where(
        jnp.arange(L)[:, None] >= jnp.arange(L)[None, :], 0.0,
        -jnp.inf).astype(dtype)


def _tiles(L, block_q, block_k):
    return L % block_q == 0 and L % block_k == 0 and L >= block_q


def _to_heads(x):
    """(B, L, H, d) -> (B*H, L, dp) with the lane dim padded to 128
    (zero lanes contribute 0 to every dot product — exact)."""
    B, L, H, d = x.shape
    x = x.transpose(0, 2, 1, 3).reshape(B * H, L, d)
    dp = lane_pad_dim(d)
    if dp != d:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, dp - d)))
    return x


def _from_heads(x, B, H, d):
    BH, L, dp = x.shape
    if dp != d:
        x = x[..., :d]
    return x.reshape(B, H, L, d).transpose(0, 2, 1, 3)


def _resolve_blocks(L, d, block_q, block_k):
    if block_q is None or block_k is None:
        bq, bk = pick_blocks(L, d)
        return block_q or bq, block_k or bk
    return block_q, block_k


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def flash_attention_causal(q, k, v, scale=None, block_q=None, block_k=None,
                           interpret=False):
    """Causal flash attention, (B, L, H, d) layout.

    Pallas blockwise-softmax forward and blockwise backward (recomputes
    probabilities from the saved log-sum-exp).  K/V stream from HBM through
    a double-buffered VMEM window, so on-chip memory is O(block), not
    O(L*d) — L=8k+ runs without VMEM overflow.  Block sizes default to a
    (L, d)-aware heuristic (``pick_blocks``).  Falls back to the XLA
    composite when L doesn't tile.
    """
    B, L, H, d = q.shape
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    block_q, block_k = _resolve_blocks(L, d, block_q, block_k)
    if not _tiles(L, block_q, block_k):
        return mha_reference(q, k, v, _causal_mask(L), scale)
    o, _ = _fa_forward(_to_heads(q), _to_heads(k), _to_heads(v), scale,
                       True, block_q, block_k, interpret)
    return _from_heads(o, B, H, d)


def _fa_fwd(q, k, v, scale, block_q, block_k, interpret):
    B, L, H, d = q.shape
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    block_q, block_k = _resolve_blocks(L, d, block_q, block_k)
    if not _tiles(L, block_q, block_k):
        out = mha_reference(q, k, v, _causal_mask(L), scale)
        return out, (q, k, v, None, None)
    o, lse = _fa_forward(_to_heads(q), _to_heads(k), _to_heads(v), scale,
                         True, block_q, block_k, interpret)
    return _from_heads(o, B, H, d), (q, k, v, o, lse)


def _fa_bwd(scale, block_q, block_k, interpret, res, do):
    q, k, v, o, lse = res
    B, L, H, d = q.shape
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    block_q, block_k = _resolve_blocks(L, d, block_q, block_k)

    if o is None:  # fallback path: analytic softmax gradient in XLA
        # accumulate like mha_reference: at least f32, never BELOW the
        # input precision (f64 inputs must yield f64-exact gradients)
        acc = jnp.promote_types(q.dtype, jnp.float32)
        s = jnp.einsum("blhd,bmhd->bhlm", q, k,
                       preferred_element_type=acc) * scale
        p = jax.nn.softmax(s + _causal_mask(L).astype(acc), axis=-1)
        doa = do.astype(acc)
        dv = jnp.einsum("bhlm,blhd->bmhd", p, doa)
        dp = jnp.einsum("blhd,bmhd->bhlm", doa, v.astype(acc))
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        dq = jnp.einsum("bhlm,bmhd->blhd", ds, k.astype(acc)) * scale
        dk = jnp.einsum("bhlm,blhd->bmhd", ds, q.astype(acc)) * scale
        return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)

    dq, dk, dv = _fa_backward(_to_heads(q), _to_heads(k), _to_heads(v), o,
                              lse, _to_heads(do), scale, True, block_q,
                              block_k, interpret)
    return (_from_heads(dq, B, H, d), _from_heads(dk, B, H, d),
            _from_heads(dv, B, H, d))


flash_attention_causal.defvjp(_fa_fwd, _fa_bwd)
