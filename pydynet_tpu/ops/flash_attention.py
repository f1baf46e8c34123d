"""Blockwise (flash) attention for TPU.

``mha`` is the framework's scaled-dot-product attention entry point used by
training/prefill paths; it dispatches to a Pallas blockwise-softmax kernel
for shapes that tile well and falls back to the XLA einsum composite
otherwise (XLA already fuses softmax into the surrounding matmuls
acceptably at small scale).
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
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


def _fa_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, causal,
               block_q, block_k, seq_len):
    """One (head, q-block) program: stream K/V blocks with running softmax."""
    qi = pl.program_id(1)
    q = q_ref[0].astype(jnp.float32) * scale  # (block_q, d)

    m = jnp.full((block_q, 1), -jnp.inf, jnp.float32)
    l = jnp.zeros((block_q, 1), jnp.float32)
    acc = jnp.zeros((block_q, q.shape[-1]), jnp.float32)

    q_pos = qi * block_q + jax.lax.broadcasted_iota(
        jnp.int32, (block_q, block_k), 0)

    num_kb = seq_len // block_k

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
        last = qi * (block_q // block_k) + pl.cdiv(block_q, block_k)
        num = jnp.minimum(last, num_kb)
        m, l, acc = jax.lax.fori_loop(0, num, body, (m, l, acc))
    else:
        m, l, acc = jax.lax.fori_loop(0, num_kb, body, (m, l, acc))

    o_ref[0] = (acc / l).astype(o_ref.dtype)


def _fa_forward(q, k, v, scale, causal, block_q, block_k, interpret):
    """q/k/v: (BH, L, d) -> (BH, L, d)."""
    BH, L, d = q.shape
    grid = (BH, L // block_q)
    return pl.pallas_call(
        functools.partial(_fa_kernel, scale=scale, causal=causal,
                          block_q=block_q, block_k=block_k, seq_len=L),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=interpret,
    )(q, k, v)


def _causal_mask(L, dtype=jnp.float32):
    return jnp.where(
        jnp.arange(L)[:, None] >= jnp.arange(L)[None, :], 0.0,
        -jnp.inf).astype(dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def flash_attention_causal(q, k, v, scale=None, block_q=128, block_k=128,
                           interpret=False):
    """Causal flash attention, (B, L, H, d) layout.

    Forward: Pallas blockwise-softmax kernel (O(L) memory, streams K/V).
    Backward (custom VJP): the standard softmax-attention gradient computed
    with XLA einsums, recomputing the probabilities — memory equals the
    non-flash training path, compute stays on the MXU; a blockwise Pallas
    backward is the follow-up optimization.
    Falls back to the XLA reference forward when L doesn't tile.
    """
    B, L, H, d = q.shape
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    if L % block_q or L % block_k or L < block_q:
        return mha_reference(q, k, v, _causal_mask(L), scale)
    qt = q.transpose(0, 2, 1, 3).reshape(B * H, L, d)
    kt = k.transpose(0, 2, 1, 3).reshape(B * H, L, d)
    vt = v.transpose(0, 2, 1, 3).reshape(B * H, L, d)
    o = _fa_forward(qt, kt, vt, scale, True, block_q, block_k, interpret)
    return o.reshape(B, H, L, d).transpose(0, 2, 1, 3)


def _fa_fwd(q, k, v, scale, block_q, block_k, interpret):
    out = flash_attention_causal(q, k, v, scale, block_q, block_k, interpret)
    return out, (q, k, v)


def _fa_bwd(scale, block_q, block_k, interpret, res, do):
    q, k, v = res
    L, d = q.shape[1], q.shape[3]
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    s = jnp.einsum("blhd,bmhd->bhlm", q, k,
                   preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(s + _causal_mask(L), axis=-1)
    do32 = do.astype(jnp.float32)
    dv = jnp.einsum("bhlm,blhd->bmhd", p, do32)
    dp = jnp.einsum("blhd,bmhd->bhlm", do32, v.astype(jnp.float32))
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.einsum("bhlm,bmhd->blhd", ds, k.astype(jnp.float32)) * scale
    dk = jnp.einsum("bhlm,blhd->bmhd", ds, q.astype(jnp.float32)) * scale
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


flash_attention_causal.defvjp(_fa_fwd, _fa_bwd)
