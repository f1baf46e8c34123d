"""Fused single-token Llama decode step as ONE Pallas TPU kernel.

Motivation: at stories15M scale (dim 288) a decode step is ~100 tiny XLA
kernels; per-kernel launch overhead (~3us) dominates, capping decode at
~3k tok/s.  This kernel runs the ENTIRE 6-layer stack in one launch:

* ``grid=(n_layers,)`` — TPU grid steps run sequentially on the core, so a
  VMEM scratch buffer carries the hidden state across layers while the
  Pallas pipeline double-buffers each layer's weights and KV-cache blocks
  from HBM.
* KV caches live in ``(n_layers, S, D)`` layout: the per-token update is one
  contiguous row write at ``pos`` (dynamic, scalar-prefetched), and
  attention needs no head reshapes at all —

  scores(S,H)  = K(S,D) @ (q_rot^T * head_mask)(D,H)      [MXU]
  P_exp(S,D)   = softmax(scores) @ head_mask^T(H,D)       [MXU]
  att(1,D)     = sum_S P_exp * V(S,D)                     [VPU]

  where head_mask[d,h] = 1 iff feature d belongs to head h.  This trades a
  factor-H of MXU FLOPs (free at this scale) for zero relayouts.
* RoPE is applied with a constant +/-1 pair-swap matrix: partner = x @ R
  (one MXU dot), avoiding interleave reshapes.

Everything outside — final lm_head matmul, argmax, next-token embedding
gather — stays XLA (3 kernels), so a full decode step is ~4 launches.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_Z = np.int32(0)  # int32 index-map literal (x64 would inject i64)


def rope_pair_swap_matrix(dim: int, dtype=jnp.float32):
    """R such that (x @ R)[2i] = -x[2i+1], (x @ R)[2i+1] = x[2i]."""
    R = np.zeros((dim, dim), np.float32)
    for i in range(dim // 2):
        R[2 * i + 1, 2 * i] = -1.0
        R[2 * i, 2 * i + 1] = 1.0
    return jnp.asarray(R, dtype)


def head_mask_matrix(dim: int, n_heads: int, dtype=jnp.float32):
    """M[d, h] = 1 iff feature d belongs to head h."""
    hd = dim // n_heads
    M = np.zeros((dim, n_heads), np.float32)
    for h in range(n_heads):
        M[h * hd:(h + 1) * hd, h] = 1.0
    return jnp.asarray(M, dtype)


def _lm_head_kernel(h_ref, w_ref, b_ref, out_ref, best_ref, idx_ref, *,
                    vt: int, n_tiles: int):
    """Greedy sampling head: vocab-tiled (1,D)@(D,VT) matmul with a running
    argmax carried in SMEM scratch across grid steps; emits ONE int32."""
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        best_ref[0, 0] = jnp.float32(-jnp.inf)
        idx_ref[0, 0] = jnp.int32(0)

    logits = jnp.dot(h_ref[:], w_ref[:],
                     preferred_element_type=jnp.float32) \
        + b_ref[:].astype(jnp.float32)  # (1, VT)
    m = jnp.max(logits)
    am = jax.lax.argmax(logits, 1, jnp.int32)[0]  # x64 would pick i64

    @pl.when(m > best_ref[0, 0])
    def _():
        best_ref[0, 0] = m
        idx_ref[0, 0] = am + t * np.int32(vt)

    @pl.when(t == n_tiles - 1)
    def _():
        out_ref[0, 0] = idx_ref[0, 0]


def lm_head_argmax(h, w, b, vt: int = 3200, interpret=False):
    """Greedy next-token id: argmax(h @ w + b) as one Pallas kernel.

    h (1, D); w (D, V); b (1, V); V must be a multiple of ``vt`` (itself a
    multiple of 128).  Returns int32 (1, 1)."""
    D, V = w.shape
    assert V % vt == 0, (V, vt)
    n_tiles = V // vt
    return pl.pallas_call(
        functools.partial(_lm_head_kernel, vt=vt, n_tiles=n_tiles),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, D), lambda t: (_Z, _Z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, vt), lambda t: (_Z, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, vt), lambda t: (_Z, t),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1), lambda t: (_Z, _Z),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
        scratch_shapes=[pltpu.SMEM((1, 1), jnp.float32),
                        pltpu.SMEM((1, 1), jnp.int32)],
        interpret=interpret,
    )(h, w, b)


def _kernel(pos_ref,  # scalar prefetch (SMEM)
            h0, cosd, sind, rot, hmask, final_norm,  # replicated inputs
            wq, wk, wv, wo, gate_w, up_w, down_w, in_norm, post_norm,
            ck, cv,  # per-layer cache blocks (1, S, D)
            ck_out, cv_out, h_out,  # outputs
            h_state,  # VMEM scratch (1, D) f32, persists across layers
            *, n_layers: int, n_heads: int, dim: int):
    layer = pl.program_id(0)
    hd = dim // n_heads
    scale = 1.0 / math.sqrt(hd)

    @pl.when(layer == 0)
    def _():
        h_state[:] = h0[:].astype(jnp.float32)

    h = h_state[:]  # (1, D) f32
    cdtype = ck.dtype

    def rms(x, w):
        return (x / jnp.sqrt(
            jnp.mean(x * x, -1, keepdims=True) + 1e-6)) * w

    hn = rms(h, in_norm[0].astype(jnp.float32)).astype(cdtype)

    q = jnp.dot(hn, wq[0], preferred_element_type=jnp.float32)
    k = jnp.dot(hn, wk[0], preferred_element_type=jnp.float32)
    v = jnp.dot(hn, wv[0], preferred_element_type=jnp.float32)

    # RoPE via the pair-swap matrix (one MXU dot per operand)
    cos = cosd[:].astype(jnp.float32)
    sin = sind[:].astype(jnp.float32)
    rot32 = rot[:].astype(jnp.float32)
    q = q * cos + jnp.dot(q, rot32,
                          preferred_element_type=jnp.float32) * sin
    k = k * cos + jnp.dot(k, rot32,
                          preferred_element_type=jnp.float32) * sin

    # cache row update at pos. bf16 memory packs sublane pairs, so a single
    # row store can't legalize; read-modify-write an aligned 16-row tile.
    pos = pos_ref[0]
    SUB = 16
    sub32 = np.int32(SUB)  # keep all index math int32 (x64 would inject i64)
    apos = pl.multiple_of((pos // sub32) * sub32, SUB)
    rows = jax.lax.broadcasted_iota(jnp.int32, (SUB, dim), 0) + apos
    hit = rows == pos
    kb = jnp.broadcast_to(k, (SUB, dim)).astype(cdtype)
    vb = jnp.broadcast_to(v, (SUB, dim)).astype(cdtype)
    tile_k = ck[0, pl.ds(apos, SUB), :]
    tile_v = cv[0, pl.ds(apos, SUB), :]
    ck[0, pl.ds(apos, SUB), :] = jnp.where(hit, kb, tile_k)
    cv[0, pl.ds(apos, SUB), :] = jnp.where(hit, vb, tile_v)

    # head-blocked attention with zero reshapes
    qM = (q.reshape(dim, 1) * hmask[:].astype(jnp.float32)).astype(cdtype)
    scores = jnp.dot(ck[0], qM,
                     preferred_element_type=jnp.float32) * scale  # (S, H)
    spos = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 0)
    scores = jnp.where(spos <= pos, scores, -jnp.inf)
    p = jax.nn.softmax(scores, axis=0)  # (S, H) f32
    p_exp = jnp.dot(p.astype(cdtype), hmask[:].T.astype(cdtype),
                    preferred_element_type=jnp.float32)  # (S, D)
    att = jnp.sum(p_exp * cv[0].astype(jnp.float32), axis=0,
                  keepdims=True)  # (1, D)

    z = h + jnp.dot(att.astype(cdtype), wo[0],
                    preferred_element_type=jnp.float32)

    zn = rms(z, post_norm[0].astype(jnp.float32)).astype(cdtype)
    g = jnp.dot(zn, gate_w[0], preferred_element_type=jnp.float32)
    u = jnp.dot(zn, up_w[0], preferred_element_type=jnp.float32)
    ff = (g * jax.nn.sigmoid(g)) * u
    h_new = z + jnp.dot(ff.astype(cdtype), down_w[0],
                        preferred_element_type=jnp.float32)
    h_state[:] = h_new

    ck_out[0] = ck[0]
    cv_out[0] = cv[0]

    @pl.when(layer == n_layers - 1)
    def _():
        h_out[:] = rms(h_new, final_norm[:].astype(jnp.float32))


@functools.partial(jax.jit, static_argnames=("interpret", "alias"))
def fused_decode_step(pos, h0, cosd, sind, rot, hmask, final_norm,
                      wq, wk, wv, wo, gate_w, up_w, down_w,
                      in_norm, post_norm, ck, cv, interpret=False,
                      alias=True):
    """One fused decode step.

    Shapes: h0/cosd/sind/final_norm (1,D); rot (D,D); hmask (D,H);
    in_norm/post_norm (N,1,D); per-layer weights (N,D,*); caches (N,S,D).
    Returns (h_normed (1,D) f32, ck, cv); with ``alias`` the caches update
    in place in HBM.
    """
    N, S, D = ck.shape
    H = hmask.shape[1]
    F = gate_w.shape[2]

    z = np.int32(0)  # int32 literals: Mosaic can't legalize i64 indices (x64)

    def lspec(*shape):
        # index maps receive (grid_idx, scalar_prefetch_ref)
        return pl.BlockSpec((1,) + shape,
                            lambda l, _p: (l,) + (z,) * len(shape),
                            memory_space=pltpu.VMEM)

    def full(*shape):
        return pl.BlockSpec(shape, lambda l, _p: (z,) * len(shape),
                            memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(N,),
        in_specs=[
            full(1, D),      # h0
            full(1, D),      # cosd
            full(1, D),      # sind
            full(D, D),      # rot
            full(D, H),      # hmask
            full(1, D),      # final_norm
            lspec(D, D),     # wq
            lspec(D, D),     # wk
            lspec(D, D),     # wv
            lspec(D, D),     # wo
            lspec(D, F),     # gate
            lspec(D, F),     # up
            lspec(F, D),     # down
            lspec(1, D),     # in_norm
            lspec(1, D),     # post_norm
            lspec(S, D),     # ck
            lspec(S, D),     # cv
        ],
        out_specs=[
            lspec(S, D),     # ck_out
            lspec(S, D),     # cv_out
            full(1, D),      # h_out
        ],
        scratch_shapes=[pltpu.VMEM((1, D), jnp.float32)],
    )

    kernel = functools.partial(_kernel, n_layers=N, n_heads=H, dim=D)
    # operand indices include the scalar-prefetch arg: ck=16, cv=17
    aliases = {16: 0, 17: 1} if alias else {}
    ck_new, cv_new, h_out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(ck.shape, ck.dtype),
            jax.ShapeDtypeStruct(cv.shape, cv.dtype),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
        ],
        input_output_aliases=aliases,
        interpret=interpret,
    )(jnp.asarray(pos, jnp.int32).reshape(1), h0, cosd, sind, rot, hmask,
      final_norm, wq, wk, wv, wo, gate_w, up_w, down_w, in_norm, post_norm,
      ck, cv)
    return h_out, ck_new, cv_new
