"""Scratch driver: 32-layer 7B-geometry decode, K-grid vs N-grid weight
layout INTERLEAVED in one process (the microbench windows were too
loaded to resolve the delta; this is the full serving lane at full
scale, alternating arms per trial so tenant load hits both).

Usage: python scripts/_drive_ab7b.py [int4|int8] [n_tokens]
"""
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])
sys.path.insert(0, __file__.rsplit("/", 1)[0])

import bench_7b_full as B

from pydynet_tpu.ops import gemv_quant


def main():
    quant = sys.argv[1] if len(sys.argv) > 1 else "int4"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    import jax
    import jax.numpy as jnp

    from pydynet_tpu.models.llama.model import Llama

    dev = jax.devices()[0]
    assert dev.platform == "tpu"
    put = lambda a: jax.device_put(a, dev)

    g = B._Geom()
    for k, v in B.CFG.items():
        setattr(g, k, v)
    g.head_dim = B.CFG["embed_dim"] // B.CFG["n_heads"]
    g.max_batch_size = 1
    w = B.build_weights(quant, jnp, put)

    def make_runner(tag):
        prefill, decode_chunk = Llama._make_decode_fns(g)

        def run(seed):
            prompt = np.asarray([[1, 243 + seed, 532, 991]], np.int32)
            ck, cv = Llama._empty_caches(g, 1, w["tok"].dtype)
            tok, ck, cv = prefill(w, ck, cv, jnp.asarray(prompt), 0,
                                  win=4)
            t0 = time.time()
            ck, cv, toks = decode_chunk(w, ck, cv, tok, 4, n, win=B.WIN)
            np.asarray(toks)
            return time.time() - t0

        t0 = time.time()
        run(0)
        print(f"# {tag} compiled+warm in {time.time() - t0:.0f}s",
              file=sys.stderr, flush=True)
        return run

    # trace-time switch: _KGRID_M_MAX is read when the decode fns first
    # trace, so set it BEFORE each arm's warmup call
    saved = gemv_quant._KGRID_M_MAX
    gemv_quant._KGRID_M_MAX = 0
    run_ngrid = make_runner("ngrid")
    gemv_quant._KGRID_M_MAX = saved
    run_kgrid = make_runner("kgrid")

    a, b = [], []
    for s in range(1, 4):
        b.append(run_ngrid(s))
        a.append(run_kgrid(s))
        print(f"# trial {s}: ngrid={b[-1]:.3f}s kgrid={a[-1]:.3f}s",
              flush=True)
    us = 1e6 / n
    print(f"ngrid-{quant}: min {min(b)*us:.0f} us/token  "
          f"kgrid-{quant}: min {min(a)*us:.0f} us/token  "
          f"ratio {min(b)/min(a):.3f}", flush=True)


if __name__ == "__main__":
    main()
