"""Blockwise (flash) attention for TPU — Pallas forward AND backward.

``flash_attention_causal`` streams K/V blocks with a running softmax
(O(L_block) memory) and carries a custom VJP whose backward is also
blockwise Pallas: the forward additionally emits the per-row log-sum-exp,
and two kernels recompute probabilities per block to accumulate dq and
dk/dv — no O(L^2) tensor is ever materialized, forward or backward.

Shapes that don't tile (L % block != 0) fall back to the XLA einsum
composite with the analytic softmax gradient.
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


# ===================================================================== #
#                              forward                                   #
# ===================================================================== #
def _fa_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale, causal,
               block_q, block_k, seq_len):
    """One (head, q-block) program: stream K/V blocks with running softmax;
    also emits the row log-sum-exp needed by the blockwise backward."""
    qi = pl.program_id(1)
    q = q_ref[0].astype(jnp.float32) * scale  # (block_q, d)

    m = jnp.full((block_q, 1), -jnp.inf, jnp.float32)
    l = jnp.zeros((block_q, 1), jnp.float32)
    acc = jnp.zeros((block_q, q.shape[-1]), jnp.float32)

    q_pos = qi * block_q + jax.lax.broadcasted_iota(
        jnp.int32, (block_q, block_k), 0)

    num_kb = np.int32(seq_len // block_k)

    def body(kb, carry):
        m, l, acc = carry
        k = k_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        if causal:
            k_pos = kb * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1)
            s = jnp.where(k_pos <= q_pos, s, -jnp.inf)
        m_new = jnp.maximum(m, jnp.max(s, -1, keepdims=True))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)
        l_new = l * alpha + jnp.sum(p, -1, keepdims=True)
        acc_new = acc * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return m_new, l_new, acc_new

    if causal:
        # only stream K blocks that intersect the causal window
        last = qi * np.int32(block_q // block_k) + np.int32(pl.cdiv(block_q, block_k))
        num = jnp.minimum(last, num_kb)
        m, l, acc = jax.lax.fori_loop(np.int32(0), num, body, (m, l, acc))
    else:
        m, l, acc = jax.lax.fori_loop(np.int32(0), num_kb, body, (m, l, acc))

    o_ref[0] = (acc / l).astype(o_ref.dtype)
    lse_ref[0] = m + jnp.log(l)  # (block_q, 1)


def _fa_forward(q, k, v, scale, causal, block_q, block_k, interpret):
    """q/k/v: (BH, L, d) -> (out (BH, L, d), lse (BH, L) f32)."""
    BH, L, d = q.shape
    grid = (BH, L // block_q)
    return pl.pallas_call(
        functools.partial(_fa_kernel, scale=scale, causal=causal,
                          block_q=block_q, block_k=block_k, seq_len=L),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, _Z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, d), lambda b, i: (b, _Z, _Z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, d), lambda b, i: (b, _Z, _Z),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, _Z),
                         memory_space=pltpu.VMEM),
            # (.., block_q, 1): trailing dim 1 == full array dim (tileable)
            pl.BlockSpec((1, block_q, 1), lambda b, i: (b, i, _Z),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct((BH, L, 1), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v)


# ===================================================================== #
#                              backward                                  #
# ===================================================================== #
def _fa_bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, dd_ref, dq_ref,
                      *, scale, causal, block_q, block_k, seq_len):
    """dq for one (head, q-block): stream K/V, recompute p from lse."""
    qi = pl.program_id(1)
    q = q_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0]  # (block_q, 1)
    dd = dd_ref[0]

    q_pos = qi * block_q + jax.lax.broadcasted_iota(
        jnp.int32, (block_q, block_k), 0)
    dq0 = jnp.zeros((block_q, q.shape[-1]), jnp.float32)
    num_kb = np.int32(seq_len // block_k)

    def body(kb, dq):
        k = k_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        if causal:
            k_pos = kb * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1)
            s = jnp.where(k_pos <= q_pos, s, -jnp.inf)
        p = jnp.exp(s - lse)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - dd)
        return dq + jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    if causal:
        last = qi * np.int32(block_q // block_k) + np.int32(pl.cdiv(block_q, block_k))
        num = jnp.minimum(last, num_kb)
        dq = jax.lax.fori_loop(np.int32(0), num, body, dq0)
    else:
        dq = jax.lax.fori_loop(np.int32(0), num_kb, body, dq0)
    dq_ref[0] = (dq * scale).astype(dq_ref.dtype)


def _fa_bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, dd_ref,
                       dk_ref, dv_ref, *, scale, causal, block_q, block_k,
                       seq_len):
    """dk/dv for one (head, kv-block): stream Q/dO blocks."""
    kj = pl.program_id(1)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)

    k_pos = kj * block_k + jax.lax.broadcasted_iota(
        jnp.int32, (block_q, block_k), 1)
    dk0 = jnp.zeros((block_k, k.shape[-1]), jnp.float32)
    dv0 = jnp.zeros((block_k, k.shape[-1]), jnp.float32)
    num_qb = np.int32(seq_len // block_q)

    def body(qi, carry):
        dk, dv = carry
        q = q_ref[0, pl.ds(qi * block_q, block_q), :].astype(jnp.float32)
        do = do_ref[0, pl.ds(qi * block_q, block_q), :].astype(jnp.float32)
        lse = lse_ref[0, pl.ds(qi * block_q, block_q), :]  # (block_q, 1)
        dd = dd_ref[0, pl.ds(qi * block_q, block_q), :]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        if causal:
            q_pos = qi * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0)
            s = jnp.where(k_pos <= q_pos, s, -jnp.inf)
        p = jnp.exp(s - lse)  # (block_q, block_k)
        dv_new = dv + jax.lax.dot_general(
            p, do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - dd)
        dk_new = dk + jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return dk_new, dv_new

    if causal:
        # only Q blocks at or after this KV block contribute
        first = (kj * np.int32(block_k)) // np.int32(block_q)
        dk, dv = jax.lax.fori_loop(first, num_qb, body, (dk0, dv0))
    else:
        dk, dv = jax.lax.fori_loop(np.int32(0), num_qb, body, (dk0, dv0))
    dk_ref[0] = (dk * scale).astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _fa_backward(q, k, v, o, lse, do, scale, causal, block_q, block_k,
                 interpret):
    """q/k/v/o/do: (BH, L, d), lse: (BH, L) -> (dq, dk, dv)."""
    BH, L, d = q.shape
    dd = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1,
                 keepdims=True)  # (BH, L, 1)

    common = dict(scale=scale, causal=causal, block_q=block_q,
                  block_k=block_k, seq_len=L)
    blk = lambda n: pl.BlockSpec((1, n, d), lambda b, i: (b, i, _Z),
                                 memory_space=pltpu.VMEM)
    full3 = pl.BlockSpec((1, L, d), lambda b, i: (b, _Z, _Z),
                         memory_space=pltpu.VMEM)
    row = lambda n: pl.BlockSpec((1, n, 1), lambda b, i: (b, i, _Z),
                                 memory_space=pltpu.VMEM)
    full_row = pl.BlockSpec((1, L, 1), lambda b, i: (b, _Z, _Z),
                            memory_space=pltpu.VMEM)

    dq = pl.pallas_call(
        functools.partial(_fa_bwd_dq_kernel, **common),
        grid=(BH, L // block_q),
        in_specs=[blk(block_q), full3, full3, blk(block_q), row(block_q),
                  row(block_q)],
        out_specs=blk(block_q),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=interpret,
    )(q, k, v, do, lse, dd)

    dk, dv = pl.pallas_call(
        functools.partial(_fa_bwd_dkv_kernel, **common),
        grid=(BH, L // block_k),
        in_specs=[full3, blk(block_k), blk(block_k), full3, full_row,
                  full_row],
        out_specs=[blk(block_k), blk(block_k)],
        out_shape=[jax.ShapeDtypeStruct(k.shape, k.dtype),
                   jax.ShapeDtypeStruct(v.shape, v.dtype)],
        interpret=interpret,
    )(q, k, v, do, lse, dd)
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
    B, L, H, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(B * H, L, d)


def _from_heads(x, B, H):
    BH, L, d = x.shape
    return x.reshape(B, H, L, d).transpose(0, 2, 1, 3)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def flash_attention_causal(q, k, v, scale=None, block_q=128, block_k=128,
                           interpret=False):
    """Causal flash attention, (B, L, H, d) layout.

    Pallas blockwise-softmax forward and blockwise backward (recomputes
    probabilities from the saved log-sum-exp) — O(L_block) memory in both
    directions.  Falls back to the XLA composite when L doesn't tile.
    """
    B, L, H, d = q.shape
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    if not _tiles(L, block_q, block_k):
        return mha_reference(q, k, v, _causal_mask(L), scale)
    o, _ = _fa_forward(_to_heads(q), _to_heads(k), _to_heads(v), scale,
                       True, block_q, block_k, interpret)
    return _from_heads(o, B, H)


def _fa_fwd(q, k, v, scale, block_q, block_k, interpret):
    B, L, H, d = q.shape
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    if not _tiles(L, block_q, block_k):
        out = mha_reference(q, k, v, _causal_mask(L), scale)
        return out, (q, k, v, None, None)
    o, lse = _fa_forward(_to_heads(q), _to_heads(k), _to_heads(v), scale,
                         True, block_q, block_k, interpret)
    return _from_heads(o, B, H), (q, k, v, o, lse)


def _fa_bwd(scale, block_q, block_k, interpret, res, do):
    q, k, v, o, lse = res
    B, L, H, d = q.shape
    if scale is None:
        scale = 1.0 / math.sqrt(d)

    if o is None:  # fallback path: analytic softmax gradient in XLA
        s = jnp.einsum("blhd,bmhd->bhlm", q, k,
                       preferred_element_type=jnp.float32) * scale
        p = jax.nn.softmax(s + _causal_mask(L), axis=-1)
        do32 = do.astype(jnp.float32)
        dv = jnp.einsum("bhlm,blhd->bmhd", p, do32)
        dp = jnp.einsum("blhd,bmhd->bhlm", do32, v.astype(jnp.float32))
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        dq = jnp.einsum("bhlm,bmhd->blhd", ds,
                        k.astype(jnp.float32)) * scale
        dk = jnp.einsum("bhlm,blhd->bmhd", ds,
                        q.astype(jnp.float32)) * scale
        return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)

    dq, dk, dv = _fa_backward(_to_heads(q), _to_heads(k), _to_heads(v), o,
                              lse, _to_heads(do), scale, True, block_q,
                              block_k, interpret)
    return (_from_heads(dq, B, H), _from_heads(dk, B, H),
            _from_heads(dv, B, H))


flash_attention_causal.defvjp(_fa_fwd, _fa_bwd)
