"""Scratch driver: is qmatmul's N-grid (K, nt) weight tile the DMA
bottleneck at 7B dims?  Each (K, nt=512) tile row is a 512-byte strided
chunk (stride N); a K-grid (kt, N) tile streams whole N-byte contiguous
rows instead.  Measures both layouts' achieved GB/s at the 7B gate/up
shape, int8 and int4, M=1 decode rows.

Timing per ROADMAP's tunnel recipe: inputs generated on-device per scan
iteration, 32 iterations inside ONE jit, a single scalar readback.
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

K, N = 4096, 22016   # 7B wgu (gate+up fused is 2*11008)
ITERS = 32


def qmatmul_kgrid(x, wq, ws, q4=False, kt=None):
    M, Kx = x.shape
    Kst, Nw = wq.shape
    assert (Kst * 2 if q4 else Kst) == Kx
    x32 = x.astype(jnp.float32)
    amax = jnp.maximum(jnp.max(jnp.abs(x32), -1, keepdims=True), 1e-30)
    xq = jnp.round(x32 * (127.0 / amax)).astype(jnp.int8)
    sx = amax * (1.0 / 127.0)
    if kt is None:
        kt = 128
    assert Kst % kt == 0

    def kernel(xq_ref, w_ref, out_ref):
        t = pl.program_id(0)
        w = w_ref[...]
        if q4:
            lo, hi = quant.unpack_int4(w)
            xl = xq_ref[:, pl.ds(t * kt, kt)]
            xh = xq_ref[:, pl.ds(Kst + t * kt, kt)]
            acc = jnp.dot(xl, lo, preferred_element_type=jnp.int32) \
                + jnp.dot(xh, hi, preferred_element_type=jnp.int32)
        else:
            xl = xq_ref[:, pl.ds(t * kt, kt)]
            acc = jnp.dot(xl, w, preferred_element_type=jnp.int32)

        @pl.when(t == 0)
        def _():
            out_ref[...] = acc

        @pl.when(t > 0)
        def _():
            out_ref[...] += acc

    out = pl.pallas_call(
        kernel,
        grid=(Kst // kt,),
        in_specs=[
            pl.BlockSpec((M, Kx), lambda t: (_Z, _Z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kt, Nw), lambda t: (t, _Z),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((M, Nw), lambda t: (_Z, _Z),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, Nw), jnp.int32),
        interpret=jax.devices()[0].platform != "tpu",
    )(xq, wq)
    return out.astype(jnp.float32) * ws * sx


def bench(fn, wq, ws, q4, tag, wbytes):
    key = jax.random.PRNGKey(0)

    @jax.jit
    def run(wq, ws):
        def it(s, i):
            x = jax.random.normal(jax.random.fold_in(key, i), (1, K),
                                  jnp.float32)
            y = fn(x, wq, ws, q4=q4)
            return s + jnp.sum(y), None
        s, _ = jax.lax.scan(it, jnp.float32(0), jnp.arange(ITERS))
        return s

    float(run(wq, ws))  # compile+warm
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        float(run(wq, ws))
        best = min(best, time.time() - t0)
    gbs = wbytes * ITERS / best / 1e9
    print(f"{tag}: {best*1e3/ITERS:.3f} ms/iter  {gbs:.1f} GB/s")
    return gbs


def main():
    rng = np.random.default_rng(0)
    w = (rng.standard_normal((K, N)) * 0.02).astype(np.float32)
    q8, s8 = quant.quantize_int8(jnp.asarray(w), 0)
    q4b, s4 = quant.quantize_int4(jnp.asarray(w), 0)
    q8, s8, q4b, s4 = map(jax.device_put, (q8, s8, q4b, s4))

    # exactness pin: kgrid == qmatmul bit-exact (int32 accumulation is
    # associative-exact; scales applied identically)
    x = jnp.asarray(rng.standard_normal((1, K)).astype(np.float32))
    a = np.asarray(qmatmul(x, q8, s8))
    b = np.asarray(qmatmul_kgrid(x, q8, s8))
    assert np.array_equal(a, b), np.abs(a - b).max()
    print("# exactness: kgrid == qmatmul (int8)")

    bench(qmatmul, q8, s8, False, "ngrid-int8", K * N)
    bench(qmatmul_kgrid, q8, s8, False, "kgrid-int8", K * N)
    bench(functools.partial(qmatmul_kgrid, kt=256), q8, s8, False,
          "kgrid-int8-kt256", K * N)
    bench(qmatmul, q4b, s4, True, "ngrid-int4", K * N // 2)
    try:
        a = np.asarray(qmatmul(x, q4b, s4, q4=True))
        b = np.asarray(qmatmul_kgrid(x, q4b, s4, q4=True))
        assert np.array_equal(a, b), np.abs(a - b).max()
        bench(qmatmul_kgrid, q4b, s4, True, "kgrid-int4", K * N // 2)
    except Exception as e:
        print(f"kgrid-int4 failed: {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
