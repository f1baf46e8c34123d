"""Scratch driver: can Mosaic consume a native jnp.int4 weight operand
in the K-grid decode gemv (hardware unpack, half the VMEM/VPU bytes)?

Three questions, answered on silicon:
  1. does a pallas_call with an int4-dtype ref compile at all;
  2. is dot(int8, int4) -> int32 exact vs the packed-byte kernel;
  3. is it faster than the xor-bias two-dot kernel at 7B gate/up dims.
"""
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


def qmatmul_native4(x, w4, ws, kt=128):
    """(M, K) f32 x (K, N) jnp.int4 -> (M, N) f32, K-grid layout."""
    M, Kx = x.shape
    Kw, Nw = w4.shape
    assert Kw == Kx
    x32 = x.astype(jnp.float32)
    amax = jnp.maximum(jnp.max(jnp.abs(x32), -1, keepdims=True), 1e-30)
    xq = jnp.round(x32 * (127.0 / amax)).astype(jnp.int8)
    sx = amax * (1.0 / 127.0)

    def kernel(x_ref, w_ref, out_ref):
        t = pl.program_id(0)
        acc = jnp.dot(x_ref[...], w_ref[...].astype(jnp.int8),
                      preferred_element_type=jnp.int32)

        @pl.when(t == 0)
        def _():
            out_ref[...] = acc

        @pl.when(t > 0)
        def _():
            out_ref[...] += acc

    acc = pl.pallas_call(
        kernel,
        grid=(Kw // (2 * kt),),
        in_specs=[
            pl.BlockSpec((M, 2 * kt), lambda t: (_Z, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * kt, Nw), lambda t: (t, _Z),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((M, Nw), lambda t: (_Z, _Z),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, Nw), jnp.int32),
        interpret=jax.devices()[0].platform != "tpu",
    )(xq, w4)
    return acc.astype(jnp.float32) * ws * sx


def bench(fn, wq, ws, tag, wbytes):
    key = jax.random.PRNGKey(0)

    @jax.jit
    def run(wq, ws):
        def it(s, i):
            x = jax.random.normal(jax.random.fold_in(key, i), (1, K),
                                  jnp.float32)
            return s + jnp.sum(fn(x, wq, ws)), None
        s, _ = jax.lax.scan(it, jnp.float32(0), jnp.arange(ITERS))
        return s

    float(run(wq, ws))
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        float(run(wq, ws))
        best = min(best, time.time() - t0)
    print(f"{tag}: {best*1e3/ITERS:.3f} ms/iter  "
          f"{wbytes * ITERS / best / 1e9:.1f} GB/s", flush=True)


def main():
    rng = np.random.default_rng(0)
    w = (rng.standard_normal((K, N)) * 0.02).astype(np.float32)
    q4b, s4 = quant.quantize_int4(jnp.asarray(w), 0)
    q8, s8 = quant.quantize_int8(jnp.asarray(w), 0)
    lo, hi = quant.unpack_int4(q4b)
    w4 = jax.device_put(
        jnp.concatenate([lo, hi], axis=0).astype(jnp.int4))
    q4b, s4, q8, s8 = map(jax.device_put, (q4b, s4, q8, s8))
    print(f"# w4 dtype={w4.dtype} nbytes={w4.nbytes}", flush=True)

    x = jnp.asarray(rng.standard_normal((1, K)).astype(np.float32))
    truth = np.asarray(qmatmul(x, q4b, s4, q4=True))
    try:
        got = np.asarray(qmatmul_native4(x, w4, s4))
        exact = np.array_equal(truth, got)
        print(f"# native4 compiled; exact={exact} "
              f"maxdiff={np.abs(truth - got).max()}", flush=True)
    except Exception as e:
        print(f"native4 failed: {type(e).__name__}: {str(e)[:400]}",
              flush=True)
        return

    bench(qmatmul_native4, w4, s4, "kgrid-native4", K * N // 2)
    bench(lambda x, wq, ws: qmatmul(x, wq, ws, q4=True), q4b, s4,
          "kgrid-xorbias", K * N // 2)
    bench(lambda x, wq, ws: qmatmul(x, wq, ws), q8, s8,
          "kgrid-int8", K * N)


if __name__ == "__main__":
    main()
