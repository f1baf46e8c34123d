"""On-chip interleaved measurement: batched weight-int8 vs bf16.

Run alone (ONE TPU process), 15+ min timeout — Mosaic compiles one batched
kernel per (dims, B, quant) config (~70 s each, persistent-cached).
Interleaves trials per config in the same session (the only trustworthy
comparison through the shared tunnel; ROADMAP.md).  Prints aggregate
tok/s per config; expected: int8 ~neutral at stories15M dims
(latency-bound stages), positive at stories110M dims (DMA-bound — full
int8 was +27% at B=1 in round 3).
"""
import time

import numpy as np

import jax.numpy as jnp

from pydynet_tpu.models.llama.model import Llama

STORIES15M = dict(vocab_size=32000, embed_dim=288, n_heads=6, ffn_dim=768,
                  max_seq_len=1024, n_layers=6)
STORIES110M = dict(vocab_size=32000, embed_dim=768, n_heads=12,
                   ffn_dim=2048, max_seq_len=1024, n_layers=12)
ROUNDS = 3
TOTAL = 1024


def run(name, cfg, B, quants):
    np.random.seed(0)
    m = Llama(max_batch_size=B, **cfg).to("cuda:0")
    m.eval()
    ids = np.tile(np.array([[1, 243, 532, 991]]), (B, 1)) \
        + np.arange(B)[:, None] * 7
    ids[:, 0] = 1

    def once(q):
        t0 = time.time()
        toks = list(m.generate(ids, TOTAL, chunk=TOTAL,
                               dtype=jnp.bfloat16, fused=True, quant=q))
        return len(toks) * B / (time.time() - t0)

    for q in quants:  # compile pass
        print(f"[{name} B={B}] compiling quant={q}...", flush=True)
        once(q)
    best = {q: 0.0 for q in quants}
    for r in range(ROUNDS):
        for q in quants:  # interleaved
            tps = once(q)
            best[q] = max(best[q], tps)
            print(f"[{name} B={B}] round {r} quant={q}: "
                  f"{tps:,.0f} tok/s aggregate", flush=True)
    base = best[None]
    for q in quants:
        rel = best[q] / base if base else float("nan")
        print(f"[{name} B={B}] BEST quant={q}: {best[q]:,.0f} tok/s "
              f"({rel:.2f}x bf16)", flush=True)


if __name__ == "__main__":
    import jax
    print("devices:", jax.devices(), flush=True)
    run("stories110M", STORIES110M, 8, (None, "int8", "int8-head"))
    run("stories15M", STORIES15M, 4, (None, "int8", "int8-head"))
