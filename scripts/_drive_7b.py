"""Llama-2-7B-dims fused-decode probe on the real chip.

Builds random bf16 weights at the full 7B shape (dim 4096, 32 layers,
32 heads, ffn 11008, vocab 32000 — ~6.7e9 params, ~13.5 GB bf16), keeps
the module host-side, and lets the stacked decode-weight build upload
exactly one copy to HBM (a .to("cuda") + restack would need 2x and OOM a
16 GB v5e).  Reports marginal us/token of the whole-token fused kernel at
7B scale via the two-chunk-difference recipe (CLAUDE.md).

Run alone (ONE TPU process), 15+ min timeout: first Mosaic compile of a
32-layer whole-token kernel is slow.
"""
import time

import numpy as np
import ml_dtypes

t0 = time.time()
import jax
import jax.numpy as jnp

from pydynet_tpu.models.llama.model import Llama

BF16 = np.dtype(ml_dtypes.bfloat16)
CFG = dict(vocab_size=32000, embed_dim=4096, n_heads=32, ffn_dim=11008,
           max_seq_len=1024, max_batch_size=1, n_layers=32, dtype=BF16)


def log(msg):
    print(f"[{time.time() - t0:7.1f}s] {msg}", flush=True)


def main():
    log(f"devices: {jax.devices()}")
    np.random.seed(0)
    log("building host model (bf16)...")
    model = Llama(**CFG)
    model.eval()
    n_params = sum(int(np.prod(p.shape)) for p in model._parameters.values())
    log(f"host model built (~{n_params/1e9:.2f}e9 tensors incl caches)")

    log("uploading + stacking fused weights on device...")
    w = model._fused_weights(None)
    w = jax.tree.map(lambda x: x.block_until_ready()
                     if hasattr(x, "block_until_ready") else x, w)
    model._weights_cache[("native", True, None)] = w
    log("fused weights resident")

    ids = np.array([[1, 5, 9, 4]])

    def run(total):
        s = time.time()
        toks = [int(t.numpy()[0, 0])
                for t in model.generate(ids, total, fused=True)]
        return time.time() - s, toks

    log("warmup (compiles prefill + fused chunk)...")
    dt, _ = run(80)
    log(f"warmup done in {dt:.1f}s")

    for _ in range(3):
        t_long, toks_l = run(1024)
        t_short, toks_s = run(144)
        assert toks_l[:len(toks_s)] == toks_s
        marg = (t_long - t_short) / (1024 - 144) * 1e6
        tps = 1019 / t_long
        log(f"long(1019 tok) {t_long:.3f}s  short(139 tok) {t_short:.3f}s  "
            f"marginal {marg:.0f} us/token  e2e {tps:.0f} tok/s")
    # weight-streaming roofline: ~13.5 GB/token / 819 GB/s ~= 16.5 ms/token
    log("roofline: ~13.4 GB weights/token -> ~16.4 ms/token at 819 GB/s")


if __name__ == "__main__":
    main()
