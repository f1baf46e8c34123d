"""Scratch driver: product qmatmul (K-grid routing) vs forced N-grid,
interleaved on-chip at the four 7B decode shapes, int8 and int4.

Timing per ROADMAP's tunnel recipe: inputs generated on-device per scan
iteration, ITERS iterations inside ONE jit, a single scalar readback.
"""
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

from pydynet_tpu.ops import quant
from pydynet_tpu.ops.gemv_quant import _pick_kt, qmatmul

SHAPES = {
    "wqkv": (4096, 12288),
    "wgu": (4096, 22016),
    "down": (11008, 4096),
    "head": (4096, 32000),
}
ITERS = 32


def bench(fn, K, wq, ws, tag, wbytes):
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
    gbs = wbytes * ITERS / best / 1e9
    print(f"{tag}: {best*1e3/ITERS:.3f} ms/iter  {gbs:.1f} GB/s",
          flush=True)


def main():
    rng = np.random.default_rng(0)
    for name, (K, N) in SHAPES.items():
        w = (rng.standard_normal((K, N)) * 0.02).astype(np.float32)
        for q4, qfn, tag8 in ((False, quant.quantize_int8, "int8"),
                              (True, quant.quantize_int4, "int4")):
            wq, ws = map(jax.device_put, qfn(jnp.asarray(w), 0))
            Kst = K // 2 if q4 else K
            kt = _pick_kt(1, K, Kst, N, q4)
            x = jnp.asarray(rng.standard_normal((1, K)).astype(np.float32))
            a = np.asarray(qmatmul(x, wq, ws, q4=q4))
            b = np.asarray(qmatmul(x, wq, ws, q4=q4, nt=min(512, N)))
            assert np.array_equal(a, b), (name, q4, np.abs(a - b).max())
            wbytes = K * N // (2 if q4 else 1)
            bench(lambda x, wq, ws, q4=q4: qmatmul(x, wq, ws, q4=q4),
                  K, wq, ws, f"{name}-{tag8}-kgrid(kt={kt})", wbytes)
            nt = 512 if N % 512 == 0 else 256
            bench(lambda x, wq, ws, q4=q4, nt=nt: qmatmul(
                x, wq, ws, q4=q4, nt=nt), K, wq, ws,
                f"{name}-{tag8}-ngrid(nt={nt})", wbytes)


if __name__ == "__main__":
    main()
