"""Scratch driver: cheaper int4 unpack inside the K-grid streamed kernel.

Candidates, measured interleaved in one session (relative numbers only):
  a) current i32 widen/shift/narrow unpack (quant.unpack_int4)
  b) SWAR: bitcast (kt, N) i8 -> (kt, N/4) i32, mask both nibbles in
     i32, bitcast back to i8, sign-extend via (v ^ 8) - 8 in i8 ops —
     no widen/narrow relayout at all
  c) native jnp.int4 storage: Mosaic loads packed s4 and converts in
     hardware (if this jax version legalizes it)
"""
import functools
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pydynet_tpu.ops import quant
from pydynet_tpu.ops.gemv_quant import qmatmul

_Z = np.int32(0)
K, N = 4096, 22016
ITERS = 32


def swar_unpack(w):
    """(kt, N) packed int8 -> (ulo, blo, uhi, bhi) int8: unsigned nibble
    values (0..15) and their sign bits (0/1), via i32 masks + bitcasts
    ONLY (no i8 arithmetic, no widen/narrow — Mosaic legalizes neither
    i8 shifts nor i8 subi on packed vectors).  The caller folds the sign
    into the dot: signed = u - 16*b, so
    dot(x, signed) = dot(x, u) - 16*dot(x, b)."""
    p32 = pltpu.bitcast(w, jnp.int32)
    mf = jnp.int32(0x0F0F0F0F)
    m1 = jnp.int32(0x01010101)
    sr = jax.lax.shift_right_logical
    ulo = pltpu.bitcast(p32 & mf, jnp.int8)
    blo = pltpu.bitcast(sr(p32, jnp.int32(3)) & m1, jnp.int8)
    uhi = pltpu.bitcast(sr(p32, jnp.int32(4)) & mf, jnp.int8)
    bhi = pltpu.bitcast(sr(p32, jnp.int32(7)) & m1, jnp.int8)
    return ulo, blo, uhi, bhi


def xorbias_unpack(w):
    """(kt, N) packed int8 -> (lo+8, hi+8) int8 in 0..15: for a two's-
    complement nibble s with stored bits u, (u & 0xF) ^ 8 == s + 8 in
    BOTH sign cases.  Pure i32 mask/xor/bitcast — no i8 arithmetic, no
    widen/narrow.  The caller removes the bias with a per-row scalar:
    dot(x, s) = dot(x, s+8) - 8*rowsum(x)."""
    p32 = pltpu.bitcast(w, jnp.int32)
    mf = jnp.int32(0x0F0F0F0F)
    m8 = jnp.int32(0x08080808)
    sr = jax.lax.shift_right_logical
    lo8 = pltpu.bitcast((p32 & mf) ^ m8, jnp.int8)
    hi8 = pltpu.bitcast((sr(p32, jnp.int32(4)) & mf) ^ m8, jnp.int8)
    return lo8, hi8


def qmatmul_kgrid(x, wq, ws, unpack, kt=128, native4=False):
    M, Kx = x.shape
    if native4:
        Kst = wq.shape[0] // 2  # stored (K, N) s4 => byte rows K/2? no:
        # jnp.int4 array keeps LOGICAL shape (K, N); bytes are packed
        Kst = wq.shape[0] // 2
        Kw, Nw = wq.shape
    else:
        Kst, Nw = wq.shape
    x32 = x.astype(jnp.float32)
    amax = jnp.maximum(jnp.max(jnp.abs(x32), -1, keepdims=True), 1e-30)
    xq = jnp.round(x32 * (127.0 / amax)).astype(jnp.int8)
    sx = amax * (1.0 / 127.0)

    if native4:
        def kernel(xq_ref, w_ref, out_ref):
            t = pl.program_id(0)
            w8 = w_ref[...].astype(jnp.int8)       # (2*kt, N)
            xl = xq_ref[:, pl.ds(t * 2 * kt, 2 * kt)]
            acc = jnp.dot(xl, w8, preferred_element_type=jnp.int32)

            @pl.when(t == 0)
            def _():
                out_ref[...] = acc

            @pl.when(t > 0)
            def _():
                out_ref[...] += acc

        grid = (Kw // (2 * kt),)
        wspec = pl.BlockSpec((2 * kt, Nw), lambda t: (t, _Z),
                             memory_space=pltpu.VMEM)
    else:
        def kernel(xq_ref, w_ref, out_ref):
            t = pl.program_id(0)
            xl = xq_ref[:, pl.ds(t * kt, kt)]
            xh = xq_ref[:, pl.ds(Kst + t * kt, kt)]
            if unpack is swar_unpack:
                ulo, blo, uhi, bhi = swar_unpack(w_ref[...])
                u = jnp.concatenate([ulo, uhi], axis=0)   # (2kt, N)
                b = jnp.concatenate([blo, bhi], axis=0)
                xc = jnp.concatenate([xl, xh], axis=1)    # (M, 2kt)
                acc = jnp.dot(xc, u, preferred_element_type=jnp.int32) \
                    - 16 * jnp.dot(xc, b,
                                   preferred_element_type=jnp.int32)
            elif unpack is xorbias_unpack:
                lo8, hi8 = xorbias_unpack(w_ref[...])
                acc = jnp.dot(xl, lo8,
                              preferred_element_type=jnp.int32) \
                    + jnp.dot(xh, hi8,
                              preferred_element_type=jnp.int32)
                # bias removal: -8 * (rowsum of THIS tile's x slice)
                rs = jnp.sum(xl.astype(jnp.int32), axis=1, keepdims=True) \
                    + jnp.sum(xh.astype(jnp.int32), axis=1, keepdims=True)
                acc = acc - 8 * rs
            else:
                lo, hi = unpack(w_ref[...])
                acc = jnp.dot(xl, lo,
                              preferred_element_type=jnp.int32) \
                    + jnp.dot(xh, hi,
                              preferred_element_type=jnp.int32)

            @pl.when(t == 0)
            def _():
                out_ref[...] = acc

            @pl.when(t > 0)
            def _():
                out_ref[...] += acc

        grid = (Kst // kt,)
        wspec = pl.BlockSpec((kt, Nw), lambda t: (t, _Z),
                             memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((M, Kx), lambda t: (_Z, _Z),
                               memory_space=pltpu.VMEM), wspec],
        out_specs=pl.BlockSpec((M, Nw), lambda t: (_Z, _Z),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, Nw), jnp.int32),
        interpret=jax.devices()[0].platform != "tpu",
    )(xq, wq)
    return out.astype(jnp.float32) * ws * sx


def bench(fn, wq, ws, tag):
    key = jax.random.PRNGKey(0)

    @jax.jit
    def run(wq, ws):
        def it(s, i):
            x = jax.random.normal(jax.random.fold_in(key, i), (1, K),
                                  jnp.float32)
            y = fn(x, wq, ws)
            return s + jnp.sum(y), None
        s, _ = jax.lax.scan(it, jnp.float32(0), jnp.arange(ITERS))
        return s

    float(run(wq, ws))
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        float(run(wq, ws))
        best = min(best, time.time() - t0)
    gbs = K * N // 2 * ITERS / best / 1e9
    print(f"{tag}: {best*1e3/ITERS:.3f} ms/iter  {gbs:.1f} GB/s", flush=True)


def main():
    rng = np.random.default_rng(0)
    w = (rng.standard_normal((K, N)) * 0.02).astype(np.float32)
    q4b, s4 = quant.quantize_int4(jnp.asarray(w), 0)
    q8, s8 = quant.quantize_int8(jnp.asarray(w), 0)
    q4b, s4, q8, s8 = map(jax.device_put, (q4b, s4, q8, s8))

    x = jnp.asarray(rng.standard_normal((1, K)).astype(np.float32))
    truth = np.asarray(qmatmul(x, q4b, s4, q4=True))

    # b) SWAR
    try:
        got = np.asarray(qmatmul_kgrid(x, q4b, s4, swar_unpack))
        assert np.array_equal(truth, got), np.abs(truth - got).max()
        print("# SWAR exact", flush=True)
        swar_ok = True
    except Exception as e:
        print(f"SWAR failed: {type(e).__name__}: {str(e)[:300]}",
              flush=True)
        swar_ok = False

    # b2) xor-bias (1 dot pair + per-row scalar correction)
    try:
        got = np.asarray(qmatmul_kgrid(x, q4b, s4, xorbias_unpack))
        assert np.array_equal(truth, got), np.abs(truth - got).max()
        print("# xorbias exact", flush=True)
        xb_ok = True
    except Exception as e:
        print(f"xorbias failed: {type(e).__name__}: {str(e)[:300]}",
              flush=True)
        xb_ok = False

    # c) native int4
    try:
        lo, hi = quant.unpack_int4(q4b)
        w4 = jnp.concatenate([np.asarray(lo), np.asarray(hi)],
                             axis=0).astype(jnp.int4)
        got = np.asarray(qmatmul_kgrid(x, w4, s4, None, native4=True))
        assert np.array_equal(truth, got), np.abs(truth - got).max()
        print("# native-int4 exact", flush=True)
        nat_ok = True
    except Exception as e:
        print(f"native-int4 failed: {type(e).__name__}: {str(e)[:300]}",
              flush=True)
        nat_ok = False

    bench(functools.partial(qmatmul_kgrid, unpack=quant.unpack_int4),
          q4b, s4, "kgrid-i32unpack")
    if swar_ok:
        bench(functools.partial(qmatmul_kgrid, unpack=swar_unpack),
              q4b, s4, "kgrid-swar")
    if xb_ok:
        bench(functools.partial(qmatmul_kgrid, unpack=xorbias_unpack),
              q4b, s4, "kgrid-xorbias")
        bench(functools.partial(qmatmul_kgrid, unpack=xorbias_unpack,
                                kt=256), q4b, s4, "kgrid-xorbias-kt256")
    if nat_ok:
        bench(functools.partial(qmatmul_kgrid, unpack=None, native4=True),
              w4, s4, "kgrid-native4")
    # int8 reference point in this same window
    from pydynet_tpu.ops.gemv_quant import qmatmul as qm

    def int8fn(x, wq, ws):
        return qm(x, wq, ws, q4=False)
    key = jax.random.PRNGKey(0)

    @jax.jit
    def run8(wq, ws):
        def it(s, i):
            x = jax.random.normal(jax.random.fold_in(key, i), (1, K),
                                  jnp.float32)
            return s + jnp.sum(int8fn(x, wq, ws)), None
        s, _ = jax.lax.scan(it, jnp.float32(0), jnp.arange(ITERS))
        return s
    float(run8(q8, s8))
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        float(run8(q8, s8))
        best = min(best, time.time() - t0)
    print(f"ngrid-int8(ref): {best*1e3/ITERS:.3f} ms/iter  "
          f"{K * N * ITERS / best / 1e9:.1f} GB/s", flush=True)


if __name__ == "__main__":
    main()
