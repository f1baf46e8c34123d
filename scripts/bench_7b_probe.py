"""7B-dims weight-streaming probe: bf16 vs int8 vs int4 marginal us/token
on the whole-token fused kernel at Llama-2-7B LAYER GEOMETRY (dim 4096,
32 heads, ffn 11008, vocab 32000) with 8 layers — the deep stack doesn't
fit a 16 GB v5e chip at bf16 (32 layers = 13.5 GB where the fused weight
dict holds both kernel and prefill copies), but the decode regime at
these dims is purely per-layer weight streaming, so the per-layer
marginal extrapolates linearly: extrapolated-32L numbers are reported as
such, measured-8L numbers are the artifact.

This is the ROADMAP "int4 7B-dims probe": int4's quarter-DMA only pays
off where weight streaming dominates (at dim 288 the layer stages are
latency-bound and int4 LOSES; at dim 4096 each layer streams 202M params
per token).  INTERLEAVED same-session trials, same methodology as
bench_quant.py (marginal = (min t512 - min t64)/448, one readback per
chunk).  Run on the real chip, ONE process at a time:

    python scripts/bench_7b_probe.py          # writes PROBE7B_r04.json
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

CFG = dict(vocab_size=32000, embed_dim=4096, n_heads=32, ffn_dim=11008,
           max_seq_len=1024, max_batch_size=1, n_layers=8,
           dtype=np.float32)
FORMATS = [None, "int8", "int4"]
TRIALS = 3
N_SHORT, N_LONG = 64, 512
FULL_LAYERS = 32


def main():
    import pydynet_tpu as pdn
    from pydynet_tpu.models.llama.model import Llama
    from pydynet_tpu.utils.fidelity import timed_chunk_s

    np.random.seed(0)
    t0 = time.time()
    model = Llama(**CFG).to("cuda:0")
    model.eval()
    print(f"# model built in {time.time() - t0:.0f}s", file=sys.stderr,
          flush=True)

    def run_len(quant, n, seed):
        # the tunnel-safe timing rule lives in fidelity (one copy)
        return timed_chunk_s(model, quant, n, seed)

    with pdn.no_grad():
        for q in FORMATS:
            t0 = time.time()
            run_len(q, N_SHORT, 0)
            run_len(q, N_LONG, 0)
            print(f"# compiled {q or 'bf16'} in {time.time() - t0:.0f}s",
                  file=sys.stderr, flush=True)
        t64 = {q: [] for q in FORMATS}
        t512 = {q: [] for q in FORMATS}
        for s in range(1, TRIALS + 1):  # interleaved
            for q in FORMATS:
                t64[q].append(run_len(q, N_SHORT, s))
                t512[q].append(run_len(q, N_LONG, s))
            print(f"# trial {s} done", file=sys.stderr, flush=True)

    row = {}
    for q in FORMATS:
        us = (min(t512[q]) - min(t64[q])) / (N_LONG - N_SHORT) * 1e6
        row[q or "bf16"] = round(us, 1)
    scale = FULL_LAYERS / CFG["n_layers"]
    # the lm_head + embed cost is NOT per-layer; folding it into the
    # linear scale overstates 32L us/token, so the tok/s this computes is
    # a LOWER bound — a real 32L model would meet or beat it
    extrap = {q: round(1e6 / (row[q] * scale), 0) if row[q] > 0 else None
              for q in row}
    out = {"metric": "probe7b_marginal_us_token", "unit": "us/token",
           "dims": "llama2-7B layer geometry, 8 of 32 layers",
           "trials": TRIALS, "measured_8L": row,
           "extrapolated_32L_tok_s_lower_bound": extrap}
    line = json.dumps(out)
    print(line)
    root = os.path.join(os.path.dirname(__file__), "..")
    with open(os.path.join(root, "PROBE7B_r04.json"), "w") as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
