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

from . import quant
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_Z = np.int32(0)  # int32 index-map literal (x64 would inject i64)


def _check_tiling(V, vt, S=None, sb=None):
    """Clear errors for bad vocab/KV tilings — ``pick_vt``/``pick_sb``
    return 0 for shapes with no valid tiling, and a bare ``V % vt``
    assert would surface as ZeroDivisionError."""
    if vt <= 0 or V % vt or vt % 128:
        raise ValueError(
            f"no valid vocab tiling: V={V} needs a 128-multiple divisor "
            f"(got vt={vt}; see pick_vt)")
    if S is not None and (sb <= 0 or S % sb or sb % 16):
        raise ValueError(
            f"no valid KV block size: S={S} needs a 16-multiple divisor "
            f"(got sb={sb}; see pick_sb)")


def _rms(x, w):
    """f32 RMSNorm used identically by all three kernels (eps pinned here
    so the kernels cannot drift numerically)."""
    return (x / jnp.sqrt(jnp.mean(x * x, -1, keepdims=True) + 1e-6)) * w


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


def gqa_expand_matrix(dim: int, n_heads: int, n_kv_heads: int,
                      dpad: int, dkpad: int, dtype=jnp.float32):
    """E[dk, d] = 1 iff query feature d (head h, offset j) reads kv feature
    dk = (h // group)*hd + j of the NARROW (Hkv*hd)-wide KV rows.

    Used by the whole-token kernels' true-GQA mode: with a narrow cache,
    per-query-head scores come from ``K_narrow @ (E @ qM_full)`` and the
    per-query-head value expansion is ``V_narrow @ E`` — two small MXU
    matmuls instead of storing (and re-streaming every token) each KV head
    ``group`` times.  Padding rows/cols beyond the real dims are zero, so
    lane padding cannot leak into attention."""
    hd = dim // n_heads
    group = n_heads // n_kv_heads
    E = np.zeros((dkpad, dpad), np.float32)
    for h in range(n_heads):
        kv = h // group
        for j in range(hd):
            E[kv * hd + j, h * hd + j] = 1.0
    return jnp.asarray(E, dtype)


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
    _check_tiling(V, vt)  # (D, vt) lane alignment
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


# ===================================================================== #
#        whole-token kernel: embed -> N layers -> lm_head -> argmax       #
# ===================================================================== #
def _token_kernel(idx_ref,  # scalar prefetch: (2,) i32 = [pos, tok]
                  emb_blk, cos_blk, sin_blk,  # (8, D) scalar-indexed blocks
                  rot, hmask, final_norm,  # VMEM constants (hmask lane-padded)
                  wq, wk, wv, wo, gate_w, up_w, down_w, in_norm, post_norm,
                  head_w, head_b,  # VMEM vocab tiles (D,VT), (1,VT)
                  *rest,
                  n_layers: int, n_heads: int, dim: int, dpad: int,
                  vt: int, n_tiles: int, sb: int, qlayers: bool,
                  qhead: bool, emit_logits: bool = False,
                  dkp: int = None, narrow: bool = False,
                  q4: bool = False):
    """One grid step per layer, then one per lm_head vocab tile.

    The hidden state lives in VMEM scratch across stages.  KV caches stay in
    HBM, lane-padded to ``dpad`` (a multiple of 128 — the DMA slice-alignment
    unit), and are accessed with explicit position-bounded DMA: blocks of
    ``sb`` rows covering [0, pos) stream through a double buffer, the current
    row's K/V contribution is added in-register (which also removes any
    write-read hazard at row ``pos``), and the row store is an aligned
    16-row read-modify-write tile.  The previous-token embedding gather and
    the RoPE row fetch ride the regular Pallas pipeline via scalar-prefetch-
    dependent index maps.  Everything a greedy decode step needs — embed,
    the layer stack, the vocab-tiled lm_head matmul, the argmax — happens
    inside this ONE launch.

    Weight-only int8 (``qlayers`` / ``qhead`` independently): quantized
    weights arrive int8 with per-output-channel f32 scale refs (``s_attn``
    (1,8,D): rows q,k,v,o,down; ``s_ffn`` (1,8,F): rows gate,up; ``head_s``
    (1,VT) tiles).  Matmuls run int8 x int8 -> int32 on the MXU: the (1,K)
    activation vector is quantized per call with a dynamic symmetric scale
    (trivial VPU work), the int8 weight tile feeds the MXU *as stored* — no
    tile-sized int8->bf16 relayout (measured to cost more than the DMA it
    saves) — and the f32 result is rescaled by (activation scale x channel
    scale).  Halving the lm_head bytes is a measured win (the head is the
    single largest HBM stream); the layer stages are latency- not
    bandwidth-bound at small dim, where the extra quantize ops can cost
    more than the DMA they save — hence the split switches.
    """
    rest = list(rest)
    cosk_blk = sink_blk = rotk = egqa = None
    cosk_row = sink_row = None
    if narrow:
        # true-GQA mode: narrow (Hkv*hd -> dkp lane-padded) KV rows with
        # dedicated narrow RoPE tables and the expansion matrix E
        # (``gqa_expand_matrix``); MHA keeps dkp == dpad and no extras
        assert not qlayers, "narrow KV + full-layer int8 unsupported"
        cosk_blk, sink_blk, rotk, egqa = rest[0:4]
        del rest[0:4]
    s_attn = s_ffn = head_s = hq8 = hsx = None
    if qlayers:
        s_attn, s_ffn = rest[0], rest[1]
        del rest[0:2]
    if qhead:
        head_s = rest.pop(0)
        hq8, hsx = rest.pop(-2), rest.pop(-1)
    if narrow:
        # scratch order: [ck_in, cv_in, out0, ck, cv, h_state, cos_row,
        # sin_row, cosk_row, sink_row, ktile, ...]
        cosk_row, sink_row = rest[8], rest[9]
        del rest[8:10]
    # out0 is the (1,1) SMEM token in argmax mode, or the current (1, vt)
    # VMEM logits tile in emit_logits mode (each head grid step writes its
    # tile; the pipeline flushes it to the (1, V) HBM output)
    (ck_in, cv_in, out0, ck, cv,
     h_state, cos_row, sin_row, ktile, vtile, kbuf, vbuf,
     best, bidx, rsem, wsem) = rest

    l = pl.program_id(0)
    pos = idx_ref[0]
    tok = idx_ref[1]
    scale = 1.0 / math.sqrt(dim // n_heads)
    cdtype = kbuf.dtype
    pad = dpad - dim
    cw = dkp if narrow else dpad  # KV-cache row width

    rms = _rms

    def qvec(x32):
        """Quantize a (1, K) f32 activation vector to int8 + scale."""
        amax = jnp.maximum(jnp.max(jnp.abs(x32)), 1e-30)
        xq = jnp.round(x32 * (127.0 / amax)).astype(jnp.int8)
        return xq, amax * (1.0 / 127.0)

    def qmm(xq, wref, sref, r, sx):
        """int8 x int8 -> int32 MXU matmul, rescaled to f32.  ``r`` picks the
        per-output-channel scale row of the packed (1, 8, *) scale block."""
        acc = jnp.dot(xq, wref[0], preferred_element_type=jnp.int32)
        return acc.astype(jnp.float32) * (sref[0, r:r + 1, :] * sx)

    def qmm4(xq, wref, sref, r, sx):
        """int4-packed variant: the (K/2, N) int8 block holds rows k
        (low nibble) and k + K/2 (high nibble); two arithmetic shifts
        unpack the contiguous halves IN REGISTER (no sublane interleave
        — the relayout that made in-kernel dequant a loss) and the dot
        splits as x[:K/2] @ lo + x[K/2:] @ hi: same total MXU work,
        half the weight DMA of int8."""
        pk = wref[0]
        lo, hi = quant.unpack_int4(pk)  # pure jnp, Pallas-safe
        k2 = pk.shape[0]
        acc = jnp.dot(jax.lax.slice(xq, (0, 0), (1, k2)), lo,
                      preferred_element_type=jnp.int32) \
            + jnp.dot(jax.lax.slice(xq, (0, k2), (1, 2 * k2)), hi,
                      preferred_element_type=jnp.int32)
        return acc.astype(jnp.float32) * (sref[0, r:r + 1, :] * sx)

    if q4:
        qmm = qmm4

    def lane_pad(x):
        # (1, dim) -> (1, dpad) with zero lanes beyond dim
        return jnp.pad(x, ((0, 0), (0, pad)))

    @pl.when(l == 0)
    def _():
        def pick(blk, row):
            sel = jax.lax.broadcasted_iota(jnp.int32, blk.shape, 0)
            return jnp.sum(
                jnp.where(sel == row, blk[:].astype(jnp.float32), 0.0),
                axis=0, keepdims=True)

        h_state[:] = pick(emb_blk, jax.lax.rem(tok, np.int32(8)))
        prow = jax.lax.rem(pos, np.int32(8))
        cos_row[:] = pick(cos_blk, prow)
        sin_row[:] = pick(sin_blk, prow)
        if narrow:
            cosk_row[:] = pick(cosk_blk, prow)
            sink_row[:] = pick(sink_blk, prow)
        best[0, 0] = jnp.float32(-jnp.inf)
        bidx[0, 0] = jnp.int32(0)

    @pl.when(l < n_layers)
    def _layer():
        # start the aligned 16-row cache-tile reads early (read-modify-write
        # of the row at pos; single-row HBM stores are not tile-aligned)
        apos = pl.multiple_of((pos // np.int32(16)) * np.int32(16), 16)
        rk_dma = pltpu.make_async_copy(ck.at[l, pl.ds(apos, 16), :], ktile,
                                       wsem.at[_Z])
        rv_dma = pltpu.make_async_copy(cv.at[l, pl.ds(apos, 16), :], vtile,
                                       wsem.at[np.int32(1)])
        rk_dma.start(); rv_dma.start()

        h = h_state[:]  # (1, D) f32
        hn32 = rms(h, in_norm[0].astype(jnp.float32))

        if qlayers:
            xq, sx = qvec(hn32)
            q = qmm(xq, wq, s_attn, 0, sx)
            k = qmm(xq, wk, s_attn, 1, sx)
            v = qmm(xq, wv, s_attn, 2, sx)
        else:
            hn = hn32.astype(cdtype)
            q = jnp.dot(hn, wq[0], preferred_element_type=jnp.float32)
            k = jnp.dot(hn, wk[0], preferred_element_type=jnp.float32)
            v = jnp.dot(hn, wv[0], preferred_element_type=jnp.float32)

        cos = cos_row[:]
        sin = sin_row[:]
        rot32 = rot[:].astype(jnp.float32)
        q = q * cos + jnp.dot(q, rot32,
                              preferred_element_type=jnp.float32) * sin
        if narrow:
            # k/v are already narrow (1, dkp) with zero pad lanes (the
            # weight columns are zero-padded); narrow RoPE tables rotate
            # only the real Hkv*hd features
            rotk32 = rotk[:].astype(jnp.float32)
            k = k * cosk_row[:] + jnp.dot(
                k, rotk32, preferred_element_type=jnp.float32) * sink_row[:]
            kp = k.astype(cdtype)  # (1, dkp)
            vp = v.astype(cdtype)
        else:
            k = k * cos + jnp.dot(k, rot32,
                                  preferred_element_type=jnp.float32) * sin
            kp = lane_pad(k.astype(cdtype))  # (1, dpad)
            vp = lane_pad(v.astype(cdtype))

        # merge the new row into the tiles and write them back
        rk_dma.wait(); rv_dma.wait()
        rows16 = jax.lax.broadcasted_iota(jnp.int32, (16, cw), 0) + apos
        hit = rows16 == pos
        ktile[:] = jnp.where(hit, jnp.broadcast_to(kp, (16, cw)), ktile[:])
        vtile[:] = jnp.where(hit, jnp.broadcast_to(vp, (16, cw)), vtile[:])
        wk_dma = pltpu.make_async_copy(ktile, ck.at[l, pl.ds(apos, 16), :],
                                       wsem.at[np.int32(2)])
        wv_dma = pltpu.make_async_copy(vtile, cv.at[l, pl.ds(apos, 16), :],
                                       wsem.at[np.int32(3)])
        wk_dma.start(); wv_dma.start()

        # position-bounded blocked attention with an online softmax.
        # rows [0, pos) stream from HBM in double-buffered sb-row blocks;
        # row pos (the one just computed) contributes in-register.  hmask is
        # lane-padded with zero rows, so padded K/V lanes cannot leak in.
        qp32 = lane_pad(q)  # f32: reshape-to-column only legalizes in 32-bit
        qM_full = qp32.reshape(dpad, 1) * hmask[:].astype(jnp.float32)
        if narrow:
            # fold the query-head -> kv-feature map in: scores become
            # K_narrow(sb, dkp) @ qM(dkp, H)
            egqa_c = egqa[:].astype(cdtype)
            qM = jnp.dot(egqa[:].astype(jnp.float32), qM_full,
                         preferred_element_type=jnp.float32).astype(cdtype)
        else:
            qM = qM_full.astype(cdtype)  # (dpad, H)
        hmt = hmask[:].T.astype(cdtype)                        # (H, dpad)

        def get_k(slot, b):
            return pltpu.make_async_copy(
                ck.at[l, pl.ds(b * np.int32(sb), sb), :], kbuf.at[slot],
                rsem.at[slot])

        def get_v(slot, b):
            return pltpu.make_async_copy(
                cv.at[l, pl.ds(b * np.int32(sb), sb), :], vbuf.at[slot],
                rsem.at[np.int32(2) + slot])

        nblk = (pos + np.int32(sb - 1)) // np.int32(sb)  # blocks over [0,pos)

        @pl.when(nblk > 0)
        def _():
            get_k(_Z, _Z).start()
            get_v(_Z, _Z).start()

        # init with the current row: p_self = exp(0) = 1 per head
        s_self = jnp.dot(kp, qM,
                         preferred_element_type=jnp.float32) * scale  # (1,H)
        m0 = s_self
        l0 = jnp.ones_like(s_self)
        # (1, dpad): narrow V rows expand per query-head group via E
        acc0 = (jnp.dot(vp, egqa_c, preferred_element_type=jnp.float32)
                if narrow else vp.astype(jnp.float32))

        def body(b, carry):
            m, lsum, acc = carry
            slot = jax.lax.rem(b, np.int32(2))
            nxt = jax.lax.rem(b + np.int32(1), np.int32(2))

            @pl.when(b + 1 < nblk)
            def _():
                get_k(nxt, b + np.int32(1)).start()
                get_v(nxt, b + np.int32(1)).start()

            get_k(slot, b).wait()
            get_v(slot, b).wait()
            kb = kbuf[slot]  # (sb, dpad) cdtype
            s = jnp.dot(kb, qM,
                        preferred_element_type=jnp.float32) * scale  # (sb,H)
            rows = b * np.int32(sb) + jax.lax.broadcasted_iota(
                jnp.int32, s.shape, 0)
            s = jnp.where(rows < pos, s, jnp.float32(-jnp.inf))
            m_new = jnp.maximum(m, jnp.max(s, axis=0, keepdims=True))
            corr = jnp.exp(m - m_new)                        # (1, H)
            p = jnp.exp(s - m_new)                           # (sb, H)
            lsum = lsum * corr + jnp.sum(p, axis=0, keepdims=True)
            pD = jnp.dot(p.astype(cdtype), hmt,
                         preferred_element_type=jnp.float32)  # (sb, dpad)
            corrD = jnp.dot(corr.astype(cdtype), hmt,
                            preferred_element_type=jnp.float32)  # (1, dpad)
            vex = (jnp.dot(vbuf[slot], egqa_c,
                           preferred_element_type=jnp.float32)
                   if narrow else vbuf[slot].astype(jnp.float32))
            acc = acc * corrD + jnp.sum(pD * vex, axis=0, keepdims=True)
            return m_new, lsum, acc

        m, lsum, acc = jax.lax.fori_loop(np.int32(0), nblk, body,
                                         (m0, l0, acc0))
        lD = jnp.dot(lsum.astype(cdtype), hmt,
                     preferred_element_type=jnp.float32)  # (1, dpad)
        att = jax.lax.slice(acc / jnp.maximum(lD, 1e-30), (0, 0),
                            (1, dim))  # drop the zero padding lanes

        wk_dma.wait()
        wv_dma.wait()

        if qlayers:
            aq, asx = qvec(att)
            z = h + qmm(aq, wo, s_attn, 3, asx)
            zn32 = rms(z, post_norm[0].astype(jnp.float32))
            zq, zsx = qvec(zn32)
            g = qmm(zq, gate_w, s_ffn, 0, zsx)
            u = qmm(zq, up_w, s_ffn, 1, zsx)
            ff = (g * jax.nn.sigmoid(g)) * u
            fq, fsx = qvec(ff)
            h_new = z + qmm(fq, down_w, s_attn, 4, fsx)
        else:
            z = h + jnp.dot(att.astype(cdtype), wo[0],
                            preferred_element_type=jnp.float32)
            zn = rms(z, post_norm[0].astype(jnp.float32)).astype(cdtype)
            g = jnp.dot(zn, gate_w[0], preferred_element_type=jnp.float32)
            u = jnp.dot(zn, up_w[0], preferred_element_type=jnp.float32)
            ff = (g * jax.nn.sigmoid(g)) * u
            h_new = z + jnp.dot(ff.astype(cdtype), down_w[0],
                                preferred_element_type=jnp.float32)
        h_state[:] = h_new

        # final RMSNorm only where it's consumed (the last layer step) —
        # a jnp.where would evaluate the full rms() on every layer step
        # and discard N-1 of them
        @pl.when(l == n_layers - 1)
        def _final_norm():
            h_state[:] = rms(h_new, final_norm[:].astype(jnp.float32))

    @pl.when(l >= n_layers)
    def _head():
        t = l - np.int32(n_layers)
        if qhead:
            @pl.when(t == 0)
            def _():
                xq0, sx0 = qvec(h_state[:])
                hq8[:] = xq0
                hsx[0, 0] = sx0

            if q4:  # packed (D/2, VT) head tiles: split dot, see qmm4
                pk = head_w[:]
                lo, hi = quant.unpack_int4(pk)
                k2 = pk.shape[0]
                acc = jnp.dot(jax.lax.slice(hq8[:], (0, 0), (1, k2)), lo,
                              preferred_element_type=jnp.int32) \
                    + jnp.dot(jax.lax.slice(hq8[:], (0, k2), (1, 2 * k2)),
                              hi, preferred_element_type=jnp.int32)
            else:
                acc = jnp.dot(hq8[:], head_w[:],
                              preferred_element_type=jnp.int32)
            logits = acc.astype(jnp.float32) \
                * (head_s[:].astype(jnp.float32) * hsx[0, 0])
        else:
            hb = h_state[:].astype(head_w.dtype)  # (1, D) final-normed
            logits = jnp.dot(hb, head_w[:],
                             preferred_element_type=jnp.float32)
        logits = logits + head_b[:].astype(jnp.float32)  # (1, VT)
        if emit_logits:
            # sampling mode: ship the full logits row instead of baking the
            # argmax in — the caller samples (temperature/top-k/top-p) in
            # XLA right after, still one kernel launch per token
            out0[:] = logits
        else:
            mx = jnp.max(logits)
            am = jax.lax.argmax(logits, 1, jnp.int32)[_Z]

            @pl.when(mx > best[0, 0])
            def _():
                best[0, 0] = mx
                bidx[0, 0] = am + t * np.int32(vt)

            @pl.when(l == n_layers + n_tiles - 1)
            def _():
                out0[0, 0] = bidx[0, 0]


# ===================================================================== #
#   batched whole-token kernel: B rows share ONE weight stream per token  #
# ===================================================================== #
def _token_kernel_batched(idx_ref,  # scalar prefetch: (1,) i32 = [pos]
                          h0, cos_blk, sin_blk, rot, hmask, final_norm,
                          wq, wk, wv, wo, gate_w, up_w, down_w,
                          in_norm, post_norm, head_w, head_b,
                          *rest,
                          n_layers: int, n_heads: int, dim: int,
                          dpad: int, vt: int, n_tiles: int, sb: int,
                          batch: int, emit_logits: bool = False,
                          dkp: int = None, narrow: bool = False,
                          with_starts: bool = False, kv_int8: bool = False,
                          sg: int = None, qlayers: bool = False,
                          qhead: bool = False, q4: bool = False):
    """Batched variant of ``_token_kernel``: the hidden state is (B, D), so
    every weight matrix streams from HBM ONCE per token for the whole batch
    (the vmapped fallback re-streams weights per row), and the qkv/ffn/head
    matmuls are real (B, K) x (K, M) MXU ops instead of matvecs.  KV-cache
    traffic is inherently per-row: caches are (N, B, S, Dp) and stream as
    single strided (B, sb, Dp) block DMAs.  The previous-token embedding
    gather happens OUTSIDE (a (B,) gather is one tiny XLA kernel; the
    scalar-prefetch block trick only fetches one row block), so a batched
    decode step is 2 launches.  Attention scores run as B/sg group-blocked
    (sg*sb, Dp) x (Dp, sg*H) matmuls with static diagonal-block extraction
    — each group discards sg^2-sg cross-sample products, so total MXU
    waste is O(B*sg), not the O(B^2) of one un-unrolled matmul.  ``sg``
    defaults to the whole batch (the round-2 layout); callers shrink it at
    large B where the B^2 term dominates (see ``pick_sg``).

    ``narrow`` (true-GQA): same contract as ``_token_kernel`` — narrow
    (dkp-wide) KV rows with dedicated RoPE tables and the ``egqa``
    expansion matrix; caches are (N, B, S, dkp).

    ``with_starts`` (continuous-batching serving): a (B, 1) i32 VMEM input
    of per-row attention LOWER bounds — row b attends cache rows
    [starts[b], pos].  Slots recycled for a new request at the shared
    position keep stale rows below their start invisible; RoPE scores
    depend only on relative distance, so a request shifted to start at
    position ``starts[b]`` decodes the same tokens it would from 0.

    Weight-only int8 (``qlayers`` / ``qhead``, same scale layout as
    ``_token_kernel``): activations quantize PER ROW (each sample gets its
    own symmetric scale — one shared scale would let one outlier sample
    crush the whole batch's precision), weights feed the MXU int8 as
    stored, and the int32 result rescales by (B, 1) row scales x (1, M)
    channel scales.  Weight bytes amortize over B, so the relative win
    shrinks with B — but the weight stream still dominates batched decode
    at small-to-mid B (README bandwidth accounting)."""
    rest = list(rest)
    cosk_blk = sink_blk = rotk = egqa = None
    cosk_row = sink_row = None
    starts = None
    sk = sv = sktile = svtile = skbuf = svbuf = None
    if narrow:
        cosk_blk, sink_blk, rotk, egqa = rest[0:4]
        del rest[0:4]
    if with_starts:
        starts = rest.pop(0)
    s_attn = s_ffn = head_s = hq8 = hsx = None
    if qlayers:
        s_attn, s_ffn = rest[0], rest[1]
        del rest[0:2]
    if qhead:
        head_s = rest.pop(0)
        hq8, hsx = rest.pop(-2), rest.pop(-1)  # scratch, appended last
    # remaining: aliased cache INPUT refs (unused; the kernel works on the
    # aliased output refs), then outputs, then scratch in declaration order
    del rest[0:4 if kv_int8 else 2]
    out0 = rest.pop(0)
    if kv_int8:
        ck, cv, sk, sv = rest[0:4]
        del rest[0:4]
    else:
        ck, cv = rest[0:2]
        del rest[0:2]
    h_state, cos_row, sin_row = rest[0:3]
    del rest[0:3]
    if narrow:
        cosk_row, sink_row = rest[0:2]
        del rest[0:2]
    ktile, vtile = rest[0:2]
    del rest[0:2]
    if kv_int8:
        sktile, svtile = rest[0:2]
        del rest[0:2]
    kbuf, vbuf = rest[0:2]
    del rest[0:2]
    if kv_int8:
        skbuf, svbuf = rest[0:2]
        del rest[0:2]
    best, bidx, rsem, wsem = rest

    l = pl.program_id(0)
    pos = idx_ref[0]
    B = batch
    scale = 1.0 / math.sqrt(dim // n_heads)
    # compute dtype for the attention/cast sites: the weight dtype, except
    # when the weights themselves are int8 (qlayers) — then the cache/attn
    # math runs at the cache dtype (kbuf); kv_int8 is the converse case
    # (int8 caches, real-dtype weights), and the two modes are exclusive
    assert not (qlayers and kv_int8)
    cdtype = kbuf.dtype if qlayers else wq.dtype
    pad = dpad - dim
    cw = dkp if narrow else dpad  # KV-cache row width

    rms = _rms

    def qvec_b(x32):
        """Per-row symmetric int8 quantization of (B, K) f32 activations —
        the multiplicative form of the B=1 kernel's qvec, so each row's
        math is bit-identical to the B=1 path."""
        amax = jnp.maximum(jnp.max(jnp.abs(x32), axis=1, keepdims=True),
                           1e-30)  # (B, 1)
        xq = jnp.round(x32 * (127.0 / amax)).astype(jnp.int8)
        return xq, amax * (1.0 / 127.0)

    def qmm_b(xq, wref, sref, r, sx):
        """int8 (B,K) x int8 (K,M) -> int32 MXU matmul, rescaled to f32 by
        the per-row activation scales x the weight's channel-scale row."""
        acc = jnp.dot(xq, wref[0], preferred_element_type=jnp.int32)
        return acc.astype(jnp.float32) * (sref[0, r:r + 1, :] * sx)

    def qmm_b4(xq, wref, sref, r, sx):
        """int4-packed batched variant (see the B=1 kernel's qmm4): two
        arithmetic shifts unpack contiguous halves, the dot splits as
        x[:, :K/2] @ lo + x[:, K/2:] @ hi — half int8's weight DMA."""
        pk = wref[0]
        lo, hi = quant.unpack_int4(pk)
        k2 = pk.shape[0]
        acc = jnp.dot(jax.lax.slice(xq, (0, 0), (B, k2)), lo,
                      preferred_element_type=jnp.int32) \
            + jnp.dot(jax.lax.slice(xq, (0, k2), (B, 2 * k2)), hi,
                      preferred_element_type=jnp.int32)
        return acc.astype(jnp.float32) * (sref[0, r:r + 1, :] * sx)

    if q4:
        qmm_b = qmm_b4

    @pl.when(l == 0)
    def _():
        prow = jax.lax.rem(pos, np.int32(8))

        def pick(blk):
            sel = jax.lax.broadcasted_iota(jnp.int32, blk.shape, 0)
            return jnp.sum(
                jnp.where(sel == prow, blk[:].astype(jnp.float32), 0.0),
                axis=0, keepdims=True)

        h_state[:] = h0[:].astype(jnp.float32)
        cos_row[:] = pick(cos_blk)
        sin_row[:] = pick(sin_blk)
        if narrow:
            cosk_row[:] = pick(cosk_blk)
            sink_row[:] = pick(sink_blk)
        best[:] = jnp.full((B, 1), -jnp.inf, jnp.float32)
        bidx[:] = jnp.zeros((B, 1), jnp.int32)

    @pl.when(l < n_layers)
    def _layer():
        apos = pl.multiple_of((pos // np.int32(16)) * np.int32(16), 16)
        rk_dma = pltpu.make_async_copy(
            ck.at[l, :, pl.ds(apos, 16), :], ktile, wsem.at[_Z])
        rv_dma = pltpu.make_async_copy(
            cv.at[l, :, pl.ds(apos, 16), :], vtile, wsem.at[np.int32(1)])
        rk_dma.start(); rv_dma.start()
        if kv_int8:
            # scale RMW granularity is a whole sb block: Mosaic supports
            # dynamic minormost-dim DMA slices only at 128-multiple
            # offsets/widths (a 16-wide slice fails to lower), and the
            # extra bytes are trivial (B*sb f32 per layer)
            spos = pl.multiple_of((pos // np.int32(sb)) * np.int32(sb), sb)
            rsk_dma = pltpu.make_async_copy(
                sk.at[l, :, pl.ds(spos, sb)], sktile, wsem.at[np.int32(4)])
            rsv_dma = pltpu.make_async_copy(
                sv.at[l, :, pl.ds(spos, sb)], svtile, wsem.at[np.int32(5)])
            rsk_dma.start(); rsv_dma.start()

        h = h_state[:]  # (B, D) f32
        hn32 = rms(h, in_norm[0].astype(jnp.float32))
        if qlayers:
            xq8, sxh = qvec_b(hn32)
            q = qmm_b(xq8, wq, s_attn, 0, sxh)
            k = qmm_b(xq8, wk, s_attn, 1, sxh)
            v = qmm_b(xq8, wv, s_attn, 2, sxh)
        else:
            hn = hn32.astype(cdtype)
            q = jnp.dot(hn, wq[0], preferred_element_type=jnp.float32)
            k = jnp.dot(hn, wk[0], preferred_element_type=jnp.float32)
            v = jnp.dot(hn, wv[0], preferred_element_type=jnp.float32)

        cos = cos_row[:]  # (1, D) broadcasts over rows
        sin = sin_row[:]
        rot32 = rot[:].astype(jnp.float32)
        q = q * cos + jnp.dot(q, rot32,
                              preferred_element_type=jnp.float32) * sin
        if narrow:
            rotk32 = rotk[:].astype(jnp.float32)
            kf = k * cosk_row[:] + jnp.dot(
                k, rotk32, preferred_element_type=jnp.float32) * sink_row[:]
            vf = v  # (B, dkp) f32, zero pad lanes from weights
        else:
            kf = k * cos + jnp.dot(k, rot32,
                                   preferred_element_type=jnp.float32) * sin
            kf = jnp.pad(kf, ((0, 0), (0, pad)))  # (B, dpad) f32
            vf = jnp.pad(v, ((0, 0), (0, pad)))
        if kv_int8:
            # per-row symmetric int8: the cache stores round(x/s) with
            # s = absmax/127; every consumer (incl. THIS step's self-row
            # terms) sees the dequantized value s*q for consistency
            ks_row = jnp.maximum(
                jnp.max(jnp.abs(kf), 1, keepdims=True) / 127.0, 1e-10)
            vs_row = jnp.maximum(
                jnp.max(jnp.abs(vf), 1, keepdims=True) / 127.0, 1e-10)
            kp = jnp.clip(jnp.round(kf / ks_row), -127, 127).astype(jnp.int8)
            vp = jnp.clip(jnp.round(vf / vs_row), -127, 127).astype(jnp.int8)
            kself = kp.astype(jnp.float32) * ks_row  # dequantized self row
            vself = vp.astype(jnp.float32) * vs_row
        else:
            kp = kf.astype(cdtype)
            vp = vf.astype(cdtype)
            kself, vself = kf, vf

        rk_dma.wait(); rv_dma.wait()
        hit = (jax.lax.broadcasted_iota(jnp.int32, (16, cw), 0)
               + apos == pos)[None]  # (1, 16, cw)
        ktile[:] = jnp.where(hit, kp[:, None, :], ktile[:])
        vtile[:] = jnp.where(hit, vp[:, None, :], vtile[:])
        wk_dma = pltpu.make_async_copy(
            ktile, ck.at[l, :, pl.ds(apos, 16), :], wsem.at[np.int32(2)])
        wv_dma = pltpu.make_async_copy(
            vtile, cv.at[l, :, pl.ds(apos, 16), :], wsem.at[np.int32(3)])
        wk_dma.start(); wv_dma.start()
        if kv_int8:
            rsk_dma.wait(); rsv_dma.wait()
            hit_s = (jax.lax.broadcasted_iota(jnp.int32, (1, sb), 1)
                     + spos == pos)  # (1, sb)
            sktile[:] = jnp.where(hit_s, ks_row, sktile[:])
            svtile[:] = jnp.where(hit_s, vs_row, svtile[:])
            # whole-block write-back: every lane except pos rewrites its
            # just-read value, so the overlap with this step's streaming
            # read of the same block is benign (and row pos is masked out
            # of this step's attention)
            wsk_dma = pltpu.make_async_copy(
                sktile, sk.at[l, :, pl.ds(spos, sb)], wsem.at[np.int32(6)])
            wsv_dma = pltpu.make_async_copy(
                svtile, sv.at[l, :, pl.ds(spos, sb)], wsem.at[np.int32(7)])
            wsk_dma.start(); wsv_dma.start()

        # per-row head-blocked attention, (cw, B*H) stacked query masks
        qp32 = jnp.pad(q, ((0, 0), (0, pad)))  # (B, dpad) f32
        qM_full = jnp.concatenate(
            [qp32[b].reshape(dpad, 1) * hmask[:].astype(jnp.float32)
             for b in range(B)], axis=1)  # (dpad, B*H)
        egqa_c = egqa_f = qs = qMq = None
        if narrow:
            egqa_f = egqa[:].astype(jnp.float32)
            qM_f = jnp.dot(egqa_f, qM_full,
                           preferred_element_type=jnp.float32)  # (cw, B*H)
            if not kv_int8:
                egqa_c = egqa[:].astype(cdtype)
                qM = qM_f.astype(cdtype)
        else:
            qM_f = qM_full
            if not kv_int8:
                qM = qM_full.astype(cdtype)  # (dpad, B*H)
        if kv_int8:
            # per-sample query quantization: quantize the (B, dpad) query
            # rows FIRST, then build the masked column stack from the
            # int-valued rows (a (B, H) -> (1, B*H) scale reshape fails
            # Mosaic's layout inference; this build uses only patterns the
            # bf16 kernel already exercises).  hmask is 0/1 and egqa picks
            # exactly one expanded copy per column, so the concat/dot keep
            # values in [-127, 127] exactly.
            qs = jnp.maximum(
                jnp.max(jnp.abs(qp32), 1, keepdims=True) / 127.0,
                1e-10)  # (B, 1)
            qq = jnp.clip(jnp.round(qp32 / qs), -127, 127)  # int-valued f32
            qMq_full = jnp.concatenate(
                [qq[b].reshape(dpad, 1) * hmask[:].astype(jnp.float32)
                 for b in range(B)], axis=1)  # (dpad, B*H)
            if narrow:
                qMq_full = jnp.dot(egqa_f, qMq_full,
                                   preferred_element_type=jnp.float32)
            qMq = qMq_full.astype(jnp.int8)
        hmt = hmask[:].T.astype(cdtype)  # (H, dpad)

        def get_k(slot, blk):
            return pltpu.make_async_copy(
                ck.at[l, :, pl.ds(blk * np.int32(sb), sb), :],
                kbuf.at[slot], rsem.at[slot])

        def get_v(slot, blk):
            return pltpu.make_async_copy(
                cv.at[l, :, pl.ds(blk * np.int32(sb), sb), :],
                vbuf.at[slot], rsem.at[np.int32(2) + slot])

        def get_sk(slot, blk):
            return pltpu.make_async_copy(
                sk.at[l, :, pl.ds(blk * np.int32(sb), sb)],
                skbuf.at[slot], rsem.at[np.int32(4) + slot])

        def get_sv(slot, blk):
            return pltpu.make_async_copy(
                sv.at[l, :, pl.ds(blk * np.int32(sb), sb)],
                svbuf.at[slot], rsem.at[np.int32(6) + slot])

        nblk = (pos + np.int32(sb - 1)) // np.int32(sb)

        @pl.when(nblk > 0)
        def _():
            get_k(_Z, _Z).start()
            get_v(_Z, _Z).start()
            if kv_int8:
                get_sk(_Z, _Z).start()
                get_sv(_Z, _Z).start()

        H = n_heads
        SG = B if sg is None else sg

        def diag_blocks(s_full, rb, cb):
            """(B*rb, B*cb) -> (B, rb, cb): row-block b paired with
            col-block b (the cross-sample products are discarded — the
            B^2 MXU waste buys ONE un-unrolled matmul, which keeps both
            Mosaic compile time and the op count O(1) in B)."""
            return jnp.stack([
                jax.lax.slice(s_full, (b * rb, b * cb),
                              ((b + 1) * rb, (b + 1) * cb))
                for b in range(B)])

        def block_scores(kb_all, qcols, ptype):
            """(B, sb, H) per-sample scores for one staged KV block:
            groups of SG samples share one (SG*sb, cw) x (cw, SG*H) dot,
            then each sample's diagonal (sb, H) block is sliced out.
            SG == B is the single un-unrolled matmul; smaller SG cuts the
            cross-sample MXU waste from B^2 to B*SG (matters from B~32 up,
            where the waste outgrows the real work)."""
            blocks = []
            for g0 in range(0, B, SG):
                kb_g = kb_all[g0:g0 + SG].reshape(SG * sb, cw)
                s_g = jnp.dot(
                    kb_g,
                    jax.lax.slice(qcols, (0, g0 * H),
                                  (cw, (g0 + SG) * H)),
                    preferred_element_type=ptype)
                blocks += [jax.lax.slice(s_g, (j * sb, j * H),
                                         ((j + 1) * sb, (j + 1) * H))
                           for j in range(SG)]
            return jnp.stack(blocks)  # (B, sb, H)

        # init with the current row per sample: p_self = 1 per head
        # (kv_int8: the self row uses the DEQUANTIZED k/v and the exact f32
        # queries, matching what later steps will read back from the cache)
        if kv_int8:
            s_self = jnp.dot(kself.astype(jnp.float32), qM_f,
                             preferred_element_type=jnp.float32) * scale
        else:
            s_self = jnp.dot(kp, qM,
                             preferred_element_type=jnp.float32) * scale
        m0 = diag_blocks(s_self, 1, H)[:, 0, :]  # (B, H)
        l0 = jnp.ones_like(m0)
        # (B, dpad): narrow V rows expand per query-head group via E
        if kv_int8:
            acc0 = (jnp.dot(vself, egqa_f,
                            preferred_element_type=jnp.float32)
                    if narrow else vself)
        else:
            acc0 = (jnp.dot(vp, egqa_c, preferred_element_type=jnp.float32)
                    if narrow else vp.astype(jnp.float32))

        def body(blk, carry):
            m, lsum, acc = carry
            slot = jax.lax.rem(blk, np.int32(2))
            nxt = jax.lax.rem(blk + np.int32(1), np.int32(2))

            @pl.when(blk + 1 < nblk)
            def _():
                get_k(nxt, blk + np.int32(1)).start()
                get_v(nxt, blk + np.int32(1)).start()
                if kv_int8:
                    get_sk(nxt, blk + np.int32(1)).start()
                    get_sv(nxt, blk + np.int32(1)).start()

            get_k(slot, blk).wait()
            get_v(slot, blk).wait()
            if kv_int8:
                get_sk(slot, blk).wait()
                get_sv(slot, blk).wait()
            kb_all = kbuf[slot]  # (B, sb, cw)
            if kv_int8:
                # int8 x int8 -> int32 on the MXU; the f32 scale product
                # (k-row scale x per-sample q scale) applies AFTER the
                # cheap diagonal-block extraction, on (B, sb, H) only
                s = (block_scores(kb_all, qMq, jnp.int32)
                     .astype(jnp.float32)
                     * skbuf[slot][:, :, None]
                     * qs.reshape(B, 1, 1) * scale)
            else:
                s = block_scores(kb_all, qM,
                                 jnp.float32) * scale  # (B, sb, H)
            rows = blk * np.int32(sb) + jax.lax.broadcasted_iota(
                jnp.int32, (B, sb, H), 1)
            valid = rows < pos
            if with_starts:
                # serving: row b sees only its own request's cache rows
                valid = jnp.logical_and(
                    valid, rows >= starts[:].reshape(B, 1, 1))
            s = jnp.where(valid, s, jnp.float32(-jnp.inf))
            m_new = jnp.maximum(m, jnp.max(s, axis=1))       # (B, H)
            corr = jnp.exp(m - m_new)                        # (B, H)
            p = jnp.exp(s - m_new[:, None, :])               # (B, sb, H)
            lsum = lsum * corr + jnp.sum(p, axis=1)
            pD = jnp.dot(p.reshape(B * sb, H).astype(cdtype), hmt,
                         preferred_element_type=jnp.float32
                         ).reshape(B, sb, dpad)
            corrD = jnp.dot(corr.astype(cdtype), hmt,
                            preferred_element_type=jnp.float32)  # (B, dpad)
            if kv_int8:
                # narrow: the 0/1 expansion matrix rides the int8 MXU dot,
                # so the int8->f32 convert happens on the EXPANDED result
                # exactly once; MHA: plain convert + per-row scale
                if narrow:
                    vex = (jnp.dot(vbuf[slot].reshape(B * sb, cw), egqa[:],
                                   preferred_element_type=jnp.int32)
                           .astype(jnp.float32).reshape(B, sb, dpad)
                           * svbuf[slot][:, :, None])
                else:
                    vex = (vbuf[slot].astype(jnp.float32)
                           * svbuf[slot][:, :, None])
            else:
                vex = (jnp.dot(vbuf[slot].reshape(B * sb, cw), egqa_c,
                               preferred_element_type=jnp.float32
                               ).reshape(B, sb, dpad)
                       if narrow else vbuf[slot].astype(jnp.float32))
            acc = acc * corrD + jnp.sum(pD * vex, axis=1)
            return m_new, lsum, acc

        m, lsum, acc = jax.lax.fori_loop(np.int32(0), nblk, body,
                                         (m0, l0, acc0))
        lD = jnp.dot(lsum.astype(cdtype), hmt,
                     preferred_element_type=jnp.float32)  # (B, dpad)
        att = jax.lax.slice(acc / jnp.maximum(lD, 1e-30), (0, 0),
                            (B, dim))

        wk_dma.wait()
        wv_dma.wait()
        if kv_int8:
            wsk_dma.wait()
            wsv_dma.wait()

        if qlayers:
            aq, asx = qvec_b(att)
            z = h + qmm_b(aq, wo, s_attn, 3, asx)
            zn32 = rms(z, post_norm[0].astype(jnp.float32))
            zq, zsx = qvec_b(zn32)
            g = qmm_b(zq, gate_w, s_ffn, 0, zsx)
            u = qmm_b(zq, up_w, s_ffn, 1, zsx)
            ff = (g * jax.nn.sigmoid(g)) * u
            fq, fsx = qvec_b(ff)
            h_new = z + qmm_b(fq, down_w, s_attn, 4, fsx)
        else:
            z = h + jnp.dot(att.astype(cdtype), wo[0],
                            preferred_element_type=jnp.float32)
            zn = rms(z, post_norm[0].astype(jnp.float32)).astype(cdtype)
            g = jnp.dot(zn, gate_w[0], preferred_element_type=jnp.float32)
            u = jnp.dot(zn, up_w[0], preferred_element_type=jnp.float32)
            ff = (g * jax.nn.sigmoid(g)) * u
            h_new = z + jnp.dot(ff.astype(cdtype), down_w[0],
                                preferred_element_type=jnp.float32)
        h_state[:] = h_new

        # final RMSNorm only on the last layer step (see B=1 kernel)
        @pl.when(l == n_layers - 1)
        def _final_norm():
            h_state[:] = rms(h_new, final_norm[:].astype(jnp.float32))

    @pl.when(l >= n_layers)
    def _head():
        t = l - np.int32(n_layers)
        if qhead:
            @pl.when(t == 0)
            def _():
                xq0, sx0 = qvec_b(h_state[:])
                hq8[:] = xq0
                hsx[:] = sx0

            if q4:  # packed (D/2, VT) head tiles: split dot (see qmm_b4)
                pk = head_w[:]
                lo, hi = quant.unpack_int4(pk)
                k2 = pk.shape[0]
                acc = jnp.dot(jax.lax.slice(hq8[:], (0, 0), (B, k2)), lo,
                              preferred_element_type=jnp.int32) \
                    + jnp.dot(jax.lax.slice(hq8[:], (0, k2), (B, 2 * k2)),
                              hi, preferred_element_type=jnp.int32)
            else:
                acc = jnp.dot(hq8[:], head_w[:],
                              preferred_element_type=jnp.int32)
            logits = acc.astype(jnp.float32) \
                * (head_s[:].astype(jnp.float32) * hsx[:])
        else:
            hb = h_state[:].astype(head_w.dtype)  # (B, D)
            logits = jnp.dot(hb, head_w[:],
                             preferred_element_type=jnp.float32)
        logits = logits + head_b[:].astype(jnp.float32)  # (B, VT)
        if emit_logits:
            out0[:] = logits  # sampling mode: see _token_kernel
        else:
            mx = jnp.max(logits, axis=1, keepdims=True)      # (B, 1)
            am = jax.lax.argmax(logits, 1, jnp.int32)[:, None]
            better = mx > best[:]
            best[:] = jnp.where(better, mx, best[:])
            bidx[:] = jnp.where(better, am + t * np.int32(vt), bidx[:])

            @pl.when(l == n_layers + n_tiles - 1)
            def _():
                out0[:] = bidx[:]


@functools.partial(jax.jit,
                   static_argnames=("vt", "sb", "interpret", "emit_logits",
                                    "sg", "q4"))
def fused_decode_token_batched(pos, h0, cosr, sinr, rot, hmask, final_norm,
                               wq, wk, wv, wo, gate_w, up_w, down_w,
                               in_norm, post_norm, head_w, head_b, ck, cv,
                               vt: int = 6400, sb: int = 256,
                               interpret=False, emit_logits: bool = False,
                               cosk=None, sink=None, rotk=None, egqa=None,
                               starts=None, sk=None, sv=None,
                               sg: int = None,
                               s_attn=None, s_ffn=None, head_s=None,
                               q4: bool = False):
    """Batched greedy decode step: ONE Pallas launch for B rows.

    ``h0`` (B, D) f32 is the already-gathered previous-token embedding
    (callers do ``emb[toks]`` — one XLA gather); caches are (N, B, S, Dp)
    lane-padded, aliased in place.  Returns (next_tok (B,) i32, ck, cv) —
    or ((B, V) f32 logits, ck, cv) with ``emit_logits`` (the on-device
    sampling mode; see ``fused_decode_token``).
    Weights stream from HBM once per token for the whole batch — the
    aggregate-throughput upgrade over vmapping the B=1 kernel.

    True-GQA narrow cache (``cosk``/``sink``/``rotk``/``egqa`` + narrow
    wk/wv and (N, B, S, CW) caches): see ``fused_decode_token``.

    int8 KV cache (``sk``/``sv`` (N, B, S) f32 per-row scales + int8
    ``ck``/``cv``, as produced by ``quantize_kv``): rows store
    ``round(x/s)`` with per-row symmetric scales; attention scores run
    int8 x int8 -> int32 on the MXU with per-sample query quantization,
    and V dequantizes once per block.  KV streaming — the dominant HBM
    traffic of batched long-context decode — halves vs bf16.  Lossy like
    weight int8: returns (sk, sv) as extra outputs, gated on hardware by
    majority-agreement (bench.py).  Extension beyond the reference
    (llm/llama/model.py:86-110 keeps f32 caches)."""
    N, B, S, CW = ck.shape
    D = h0.shape[1]  # NOT wq.shape[1]: int4 packs the contraction axis
    H = hmask.shape[1]
    Dp = hmask.shape[0]  # query-side lane-padded width
    F = gate_w.shape[2]
    V = head_w.shape[1]
    narrow = egqa is not None
    kv_int8 = sk is not None
    qlayers = s_attn is not None
    qhead = head_s is not None
    assert qlayers == (s_ffn is not None)
    if q4:
        assert qlayers and qhead, "q4 requires s_attn/s_ffn/head_s"
        assert wq.shape[1] == D // 2 and down_w.shape[1] == F // 2, \
            (wq.shape, down_w.shape, D, F)
    assert not (qlayers and narrow), \
        "narrow KV + full-layer int8 unsupported (expanded layout)"
    assert not ((qlayers or qhead) and kv_int8), \
        "weight int8 and KV int8 are mutually exclusive"
    if kv_int8:
        assert sv is not None and ck.dtype == jnp.int8 \
            and cv.dtype == jnp.int8, (ck.dtype, cv.dtype)
        assert sk.shape == (N, B, S) and sv.shape == (N, B, S), sk.shape
        if narrow:
            egqa = egqa.astype(jnp.int8)  # 0/1 matrix rides the int8 dots
    if sg is None:
        sg = pick_sg(B, H)
    assert B % sg == 0 and 1 <= sg <= B, (B, sg)
    assert h0.shape == (B, D), (h0.shape, B, D)
    _check_tiling(V, vt, S, sb)
    assert Dp % 128 == 0 and Dp >= D, (Dp, D)
    assert CW % 128 == 0, CW
    if narrow:
        assert wk.shape[2] == CW and wv.shape[2] == CW, (wk.shape, CW)
        assert egqa.shape == (CW, Dp), (egqa.shape, CW, Dp)
        assert cosk.shape == (S, CW) and sink.shape == (S, CW)
        assert rotk.shape == (CW, CW)
    else:
        assert CW == Dp, (CW, Dp)
    assert S % 8 == 0
    n_tiles = V // vt

    z = np.int32(0)
    NL = np.int32(N)
    NT1 = np.int32(n_tiles - 1)

    def _i32(x):
        return jax.lax.convert_element_type(x, jnp.int32)

    def lspec(*shape):
        return pl.BlockSpec(
            (1,) + shape,
            lambda l, _i: (jax.lax.min(_i32(l), NL - np.int32(1)),)
            + (z,) * len(shape),
            memory_space=pltpu.VMEM)

    def full(*shape):
        return pl.BlockSpec(shape, lambda l, _i: (z,) * len(shape),
                            memory_space=pltpu.VMEM)

    def vocab_tile(rows):
        return pl.BlockSpec(
            (rows, vt),
            lambda l, _i: (z, jax.lax.min(jax.lax.max(_i32(l) - NL, z), NT1)),
            memory_space=pltpu.VMEM)

    def row8(width=None):
        return pl.BlockSpec(
            (8, width or D),
            lambda l, i: (jax.lax.div(_i32(i[0]), np.int32(8)), z),
            memory_space=pltpu.VMEM)

    any_spec = pl.BlockSpec(memory_space=pl.ANY)

    KD = D // 2 if q4 else D   # weight-block contraction rows as stored
    KF = F // 2 if q4 else F
    in_specs = [
        full(B, D),      # h0
        row8(),          # cos block around pos
        row8(),          # sin block around pos
        full(D, D),      # rot
        full(Dp, H),     # hmask (lane-padded)
        full(1, D),      # final_norm
        lspec(KD, D),    # wq
        lspec(KD, CW if narrow else D),   # wk
        lspec(KD, CW if narrow else D),   # wv
        lspec(KD, D),    # wo
        lspec(KD, F),    # gate
        lspec(KD, F),    # up
        lspec(KF, D),    # down
        lspec(1, D),     # in_norm
        lspec(1, D),     # post_norm
        vocab_tile(KD),  # head_w
        vocab_tile(1),   # head_b
    ]
    extra_ops = ()
    if narrow:
        in_specs += [
            row8(CW),        # cosk block around pos (narrow table)
            row8(CW),        # sink
            full(CW, CW),    # rotk
            full(CW, Dp),    # egqa expansion matrix
        ]
        extra_ops += (cosk, sink, rotk, egqa)
    with_starts = starts is not None
    if with_starts:
        in_specs += [full(B, 1)]  # per-row attention lower bounds (serving)
        extra_ops += (jnp.asarray(starts, jnp.int32).reshape(B, 1),)
    if qlayers:
        in_specs += [
            lspec(8, D),     # s_attn (rows: q, k, v, o, down)
            lspec(8, F),     # s_ffn (rows: gate, up)
        ]
        extra_ops += (s_attn, s_ffn)
    if qhead:
        in_specs += [vocab_tile(1)]  # head_s
        extra_ops += (head_s,)
    n_caches = 4 if kv_int8 else 2
    in_specs += [any_spec] * n_caches   # ck, cv[, sk, sv]
    cache_op = 1 + len(in_specs) - n_caches  # ck operand idx incl. prefetch

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(N + n_tiles,),
        in_specs=in_specs,
        out_specs=[
            # argmax state (VMEM vector) or the current (B, vt) logits tile
            vocab_tile(B) if emit_logits else full(B, 1),
        ] + [any_spec] * n_caches,       # ck, cv[, sk, sv]
        scratch_shapes=[
            pltpu.VMEM((B, D), jnp.float32),       # h_state
            pltpu.VMEM((1, D), jnp.float32),       # cos_row
            pltpu.VMEM((1, D), jnp.float32),       # sin_row
        ] + ([
            pltpu.VMEM((1, CW), jnp.float32),      # cosk_row (narrow RoPE)
            pltpu.VMEM((1, CW), jnp.float32),      # sink_row
        ] if narrow else []) + [
            pltpu.VMEM((B, 16, CW), ck.dtype),     # ktile (RMW)
            pltpu.VMEM((B, 16, CW), cv.dtype),     # vtile (RMW)
        ] + ([
            pltpu.VMEM((B, sb), jnp.float32),      # sktile (RMW scale blk)
            pltpu.VMEM((B, sb), jnp.float32),      # svtile
        ] if kv_int8 else []) + [
            pltpu.VMEM((2, B, sb, CW), ck.dtype),  # kbuf
            pltpu.VMEM((2, B, sb, CW), cv.dtype),  # vbuf
        ] + ([
            pltpu.VMEM((2, B, sb), jnp.float32),   # skbuf
            pltpu.VMEM((2, B, sb), jnp.float32),   # svbuf
        ] if kv_int8 else []) + [
            pltpu.VMEM((B, 1), jnp.float32),       # best
            pltpu.VMEM((B, 1), jnp.int32),         # bidx
            pltpu.SemaphoreType.DMA((8 if kv_int8 else 4,)),  # rsem
            pltpu.SemaphoreType.DMA((8 if kv_int8 else 4,)),  # wsem
        ] + ([
            pltpu.VMEM((B, D), jnp.int8),       # hq8 (quantized final hidden)
            pltpu.VMEM((B, 1), jnp.float32),    # hsx (per-row scales)
        ] if qhead else []),
    )

    kernel = functools.partial(_token_kernel_batched, n_layers=N, n_heads=H,
                               dim=D, dpad=Dp, vt=vt, n_tiles=n_tiles,
                               sb=sb, batch=B, emit_logits=emit_logits,
                               dkp=CW, narrow=narrow,
                               with_starts=with_starts, kv_int8=kv_int8,
                               sg=sg, qlayers=qlayers, qhead=qhead, q4=q4)
    # clamp: surplus chunk steps past the cache end must stay in bounds
    # (see fused_decode_token)
    idx = jnp.minimum(jnp.asarray(pos, jnp.int32),
                      np.int32(S - 1)).reshape(1)
    out0_shape = (jax.ShapeDtypeStruct((B, V), jnp.float32) if emit_logits
                  else jax.ShapeDtypeStruct((B, 1), jnp.int32))
    caches = (ck, cv, sk, sv) if kv_int8 else (ck, cv)
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[out0_shape] + [
            jax.ShapeDtypeStruct(c.shape, c.dtype) for c in caches],
        input_output_aliases={cache_op + i: 1 + i
                              for i in range(n_caches)},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(idx, h0, cosr, sinr, rot, hmask, final_norm, wq, wk, wv, wo,
      gate_w, up_w, down_w, in_norm, post_norm, head_w, head_b,
      *extra_ops, *caches)
    out0 = outs[0]
    if not emit_logits:
        out0 = out0.reshape(B)
    if kv_int8:
        return (out0,) + tuple(outs[1:])  # tok/logits, ck, cv, sk, sv
    return out0, outs[1], outs[2]


def pad_cache_lanes(c, dim_pad: int):
    """Pad the last (lane) dim of a cache to the DMA alignment unit."""
    pad = dim_pad - c.shape[-1]
    if pad == 0:
        return c
    return jnp.pad(c, ((0, 0),) * (c.ndim - 1) + ((0, pad),))


def quantize_kv(c):
    """(..., S, W) KV cache -> (int8 cache, (..., S) f32 per-row scales).

    Symmetric per-row: s = absmax/127 (floored so all-zero rows stay
    zero), q = round(x/s) — exactly the scheme the kv_int8 kernel applies
    to freshly written rows, so prefill-quantized rows and kernel-written
    rows are indistinguishable to later steps."""
    s = jnp.maximum(jnp.max(jnp.abs(c.astype(jnp.float32)), -1) / 127.0,
                    1e-10)
    q = jnp.clip(jnp.round(c.astype(jnp.float32) / s[..., None]),
                 -127, 127).astype(jnp.int8)
    return q, s


def lane_pad_dim(d: int) -> int:
    """Smallest multiple of 128 (the HBM DMA lane-alignment unit) >= d."""
    return -(-d // 128) * 128


def pick_vt(vocab: int, d_model: int = None, cap: int = 8192) -> int:
    """Largest 128-multiple vocab-tile size that divides ``vocab``.

    With ``d_model`` the cap is tightened so one (D, vt) bf16 head tile
    stays ~<=2 MB: repeated interleaved on-chip sweeps (round 3, both
    stories15M and stories110M dims) show multi-MB head tiles LOSE 30-80
    us/token — past ~2 MB per tile the head stages stop overlapping DMA
    with compute (buffer pressure defeats the double-buffering), so
    smaller tiles with more grid steps win despite the per-step cost."""
    if d_model is not None:
        # floor of 1024: at very large D the byte budget would force tiny
        # tiles whose per-grid-step overhead dominates instead
        budget = max(1024, (2 * 1024 * 1024 // (2 * d_model)) // 128 * 128)
        cap = min(cap, budget)
    for vt in range(min(cap, vocab), 127, -128):
        if vocab % vt == 0 and vt % 128 == 0:
            return vt
    # fall back to the largest valid tile ignoring the byte budget (a
    # vocab with no small 128-multiple divisor must still get a tiling)
    for vt in range(vocab, 127, -128):
        if vocab % vt == 0 and vt % 128 == 0:
            return vt
    return 0  # no valid tiling


def pick_sb(seq: int, cap: int = 256) -> int:
    """Largest 16-multiple KV block size <= cap that divides ``seq``."""
    for sb in range(min(cap, seq), 15, -16):
        if seq % sb == 0:
            return sb
    return 0


def pick_sg(B: int, H: int) -> int:
    """Score-group size for the batched kernel: the largest divisor of
    ``B`` whose sg*H score columns still fit ONE 128-lane MXU tile — any
    smaller group does the same padded MXU work with more ops; any larger
    group multiplies real work by sg*H/128.  (At B=64, H=6 this cuts the
    block-scores matmul work 3x vs the single un-unrolled B*H=384-column
    form.)"""
    best = 1
    for d in range(1, B + 1):
        if B % d == 0 and d * H <= 128:
            best = d
    return best


def batched_sb(seq: int, B: int, cw: int, itemsize: int,
               budget: int = 24 * 1024 * 1024, multiple: int = 16) -> int:
    """B-aware KV block size: the double-buffered K and V stream tiles
    cost 4*B*sb*cw*itemsize bytes of VMEM; past ~24 MB they crowd out the
    weight tiles' double buffering (measured: B=64 at sb=256 regressed
    BELOW B=32 aggregate).  Keeps the B<=32 configs at their round-2
    tilings and shrinks sb only where the budget demands it.
    ``multiple=128`` for the int8-KV mode: its scale-plane DMAs slice the
    minormost (S) axis, which Mosaic lowers only at 128-multiple
    offsets/widths."""
    cap = min(max(multiple, budget // (4 * B * cw * max(itemsize, 1))), 256)
    for sbv in range(cap - cap % multiple, multiple - 1, -multiple):
        if seq % sbv == 0:
            return sbv
    return 0


@functools.partial(jax.jit,
                   static_argnames=("vt", "sb", "interpret", "emit_logits",
                                    "q4"))
def fused_decode_token(pos, tok, emb, cosr, sinr, rot, hmask, final_norm,
                       wq, wk, wv, wo, gate_w, up_w, down_w,
                       in_norm, post_norm, head_w, head_b, ck, cv,
                       vt: int = 3200, sb: int = 256, interpret=False,
                       s_attn=None, s_ffn=None, head_s=None,
                       emit_logits: bool = False,
                       cosk=None, sink=None, rotk=None, egqa=None,
                       q4: bool = False):
    """ONE Pallas launch = one full greedy decode step.

    pos scalar; tok (1,) i32 previous token; emb (V,D); cosr/sinr (S,D);
    rot (D,D); hmask (Dp,H) lane-padded; final_norm (1,D); per-layer weights
    (N,D,*); norms (N,1,D); head_w (D,V); head_b (1,V); caches (N,S,Dp)
    lane-padded to a 128 multiple (``pad_cache_lanes``), updated in place in
    HBM (aliased).  Returns (next_tok (1,) i32, ck, cv) — or, with
    ``emit_logits``, ((1, V) f32 logits, ck, cv): the head grid steps then
    write their logits tiles to HBM instead of tracking a running argmax,
    so on-device sampling (temperature / top-k / top-p over the returned
    row) runs at fused-kernel speed instead of falling back to the
    per-op XLA decode path.

    Weight-only int8, split per weight group: pass layer matmul weights
    (wq..down_w) as int8 with ``s_attn`` (N,8,D: rows q,k,v,o,down) +
    ``s_ffn`` (N,8,F: rows gate,up), and/or the head as int8 with
    ``head_s`` (1,V) — as produced by ``ops.quant.quantize_int8``.  Dots
    run int8 x int8 -> int32 on the MXU with per-call activation
    quantization; see the kernel docstring for why head-only is the
    default profitable mode.

    True-GQA narrow cache: pass ``cosk``/``sink`` (S, CW) narrow RoPE
    tables, ``rotk`` (CW, CW), ``egqa`` (CW, Dp) (``gqa_expand_matrix``),
    narrow zero-padded wk/wv (N, D, CW) and (N, S, CW) caches, where
    CW = lane_pad_dim(Hkv*head_dim): KV rows then store and stream at
    Hkv/H of the MHA width — GQA's whole bandwidth point — with the
    per-query-head expansion done on the MXU in-kernel.  (Matches the
    reference KV-cache semantics llm/llama/model.py:86-110.)

    This replaces the reference's whole per-token Python forward
    (reference llm/llama/model.py:258-269) with a single device kernel:
    embedding gather, the layer stack with position-bounded KV streaming,
    the lm_head and the argmax never leave the chip.
    """
    N, S, CW = ck.shape
    D = emb.shape[1]  # NOT wq.shape[1]: int4 packs the contraction axis
    H = hmask.shape[1]
    Dp = hmask.shape[0]  # query-side lane-padded width
    F = gate_w.shape[2]
    V = head_w.shape[1]
    qlayers = s_attn is not None
    qhead = head_s is not None
    narrow = egqa is not None
    assert qlayers == (s_ffn is not None)
    if q4:  # int4 is full-layer-only: packed layers AND packed head
        assert qlayers and qhead, "q4 requires s_attn/s_ffn/head_s"
        assert wq.shape[1] == D // 2 and down_w.shape[1] == F // 2, \
            (wq.shape, down_w.shape, D, F)
        assert head_w.dtype == jnp.int8
    _check_tiling(V, vt, S, sb)
    assert Dp % 128 == 0 and Dp >= D, (Dp, D)
    assert CW % 128 == 0, CW
    if narrow:
        assert not qlayers, "narrow KV + full-layer int8 unsupported"
        assert wk.shape[2] == CW and wv.shape[2] == CW, (wk.shape, CW)
        assert egqa.shape == (CW, Dp), (egqa.shape, CW, Dp)
        assert cosk.shape == (S, CW) and sink.shape == (S, CW)
        assert rotk.shape == (CW, CW)
    else:
        assert CW == Dp, (CW, Dp)
    assert emb.shape[0] % 8 == 0 and S % 8 == 0
    n_tiles = V // vt

    z = np.int32(0)
    NL = np.int32(N)
    NT1 = np.int32(n_tiles - 1)

    def _i32(x):
        # index-map arithmetic must stay strictly int32: x64 weak-typed
        # promotion inside jnp helpers injects i64, which Mosaic cannot lower
        return jax.lax.convert_element_type(x, jnp.int32)

    def lspec(*shape):
        # clamped: head stages keep re-using the last layer's block, so the
        # pipeline never refetches it
        return pl.BlockSpec(
            (1,) + shape,
            lambda l, _i: (jax.lax.min(_i32(l), NL - np.int32(1)),)
            + (z,) * len(shape),
            memory_space=pltpu.VMEM)

    def full(*shape):
        return pl.BlockSpec(shape, lambda l, _i: (z,) * len(shape),
                            memory_space=pltpu.VMEM)

    def vocab_tile(rows):
        return pl.BlockSpec(
            (rows, vt),
            lambda l, _i: (z, jax.lax.min(jax.lax.max(_i32(l) - NL, z), NT1)),
            memory_space=pltpu.VMEM)

    def row8(which, width=None):
        # 8-row block picked by a scalar-prefetch value (tok or pos); the
        # index is constant across grid steps, so it is fetched exactly once
        return pl.BlockSpec(
            (8, width or D),
            lambda l, i: (jax.lax.div(_i32(i[which]), np.int32(8)), z),
            memory_space=pltpu.VMEM)

    any_spec = pl.BlockSpec(memory_space=pl.ANY)

    KD = D // 2 if q4 else D   # weight-block contraction rows as stored
    KF = F // 2 if q4 else F
    in_specs = [
        row8(1),         # emb block around tok
        row8(0),         # cos block around pos
        row8(0),         # sin block around pos
        full(D, D),      # rot
        full(Dp, H),     # hmask (lane-padded)
        full(1, D),      # final_norm
        lspec(KD, D),    # wq
        lspec(KD, CW if narrow else D),   # wk
        lspec(KD, CW if narrow else D),   # wv
        lspec(KD, D),    # wo
        lspec(KD, F),    # gate
        lspec(KD, F),    # up
        lspec(KF, D),    # down
        lspec(1, D),     # in_norm
        lspec(1, D),     # post_norm
        vocab_tile(KD),  # head_w
        vocab_tile(1),   # head_b
    ]
    extra_ops = ()
    if narrow:
        in_specs += [
            row8(0, CW),     # cosk block around pos (narrow table)
            row8(0, CW),     # sink
            full(CW, CW),    # rotk
            full(CW, Dp),    # egqa expansion matrix
        ]
        extra_ops += (cosk, sink, rotk, egqa)
    if qlayers:
        in_specs += [
            lspec(8, D),     # s_attn (rows: q, k, v, o, down)
            lspec(8, F),     # s_ffn (rows: gate, up)
        ]
        extra_ops += (s_attn, s_ffn)
    if qhead:
        in_specs += [vocab_tile(1)]  # head_s
        extra_ops += (head_s,)
    in_specs += [
        any_spec,        # ck (N, S, CW)
        any_spec,        # cv
    ]
    cache_op = 1 + len(in_specs) - 2  # operand index of ck incl. prefetch arg

    if emit_logits:
        out0_spec = vocab_tile(1)                   # logits tile (1, vt)
        out0_shape = jax.ShapeDtypeStruct((1, V), jnp.float32)
    else:
        out0_spec = pl.BlockSpec((1, 1), lambda l, _i: (z, z),
                                 memory_space=pltpu.SMEM)  # tok_out
        out0_shape = jax.ShapeDtypeStruct((1, 1), jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(N + n_tiles,),
        in_specs=in_specs,
        out_specs=[
            out0_spec,
            any_spec,        # ck
            any_spec,        # cv
        ],
        scratch_shapes=[
            pltpu.VMEM((1, D), jnp.float32),    # h_state
            pltpu.VMEM((1, D), jnp.float32),    # cos_row
            pltpu.VMEM((1, D), jnp.float32),    # sin_row
        ] + ([
            pltpu.VMEM((1, CW), jnp.float32),   # cosk_row (narrow RoPE)
            pltpu.VMEM((1, CW), jnp.float32),   # sink_row
        ] if narrow else []) + [
            pltpu.VMEM((16, CW), ck.dtype),     # ktile (RMW)
            pltpu.VMEM((16, CW), cv.dtype),     # vtile (RMW)
            pltpu.VMEM((2, sb, CW), ck.dtype),  # kbuf
            pltpu.VMEM((2, sb, CW), cv.dtype),  # vbuf
            pltpu.SMEM((1, 1), jnp.float32),    # best
            pltpu.SMEM((1, 1), jnp.int32),      # bidx
            pltpu.SemaphoreType.DMA((4,)),      # rsem (k0,k1,v0,v1)
            pltpu.SemaphoreType.DMA((4,)),      # wsem (tile r/w, k/v)
        ] + ([
            pltpu.VMEM((1, D), jnp.int8),       # hq8 (quantized final hidden)
            pltpu.SMEM((1, 1), jnp.float32),    # hsx (its scale)
        ] if qhead else []),
    )

    kernel = functools.partial(_token_kernel, n_layers=N, n_heads=H, dim=D,
                               dpad=Dp, vt=vt, n_tiles=n_tiles, sb=sb,
                               qlayers=qlayers, qhead=qhead,
                               emit_logits=emit_logits, dkp=CW,
                               narrow=narrow, q4=q4)
    # clamp: a surplus step of a fixed-size decode chunk (model.generate
    # discards tokens past the request on the host) must not DMA the
    # pl.ds(apos, 16) cache tile past the end of the (N, S, Dp) buffer
    idx = jnp.stack([jnp.minimum(jnp.asarray(pos, jnp.int32),
                                 np.int32(S - 1)),
                     jnp.asarray(tok, jnp.int32).reshape(())])
    # operand indices include the scalar-prefetch arg (ck/cv at the end)
    out0, ck_new, cv_new = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            out0_shape,
            jax.ShapeDtypeStruct(ck.shape, ck.dtype),
            jax.ShapeDtypeStruct(cv.shape, cv.dtype),
        ],
        input_output_aliases={cache_op: 1, cache_op + 1: 2},
        # bigger vocab tiles (fewer grid steps, measured ~4us/token) need
        # more double-buffer space than the conservative 16MB default; a
        # v5e core has 128MB of physical VMEM
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(idx, emb, cosr, sinr, rot, hmask, final_norm, wq, wk, wv, wo,
      gate_w, up_w, down_w, in_norm, post_norm, head_w, head_b,
      *extra_ops, ck, cv)
    if emit_logits:
        return out0, ck_new, cv_new  # (1, V) f32
    return out0.reshape(1), ck_new, cv_new



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

    rms = _rms

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
    # same contract as the whole-token wrappers: the 16-row cache-tile RMW
    # must stay inside the (S, D) block
    assert S % 16 == 0, S
    assert D % 8 == 0 and F % 8 == 0, (D, F)

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
    )(jnp.minimum(jnp.asarray(pos, jnp.int32), np.int32(S - 1)).reshape(1),
      h0, cosd, sind, rot, hmask,
      final_norm, wq, wk, wv, wo, gate_w, up_w, down_w, in_norm, post_norm,
      ck, cv)
    return h_out, ck_new, cv_new
