"""7B-dims weight-streaming probe: bf16 vs int8 vs int4 marginal us/token
at Llama-2-7B LAYER GEOMETRY (dim 4096, 32 heads, ffn 11008, vocab 32000)
with 4 layers — the full 32-layer stack doesn't fit a 16 GB v5e chip at
bf16 (13.5 GB of weights), but the decode regime at these dims is purely
per-layer weight streaming, so the per-layer marginal extrapolates
linearly (reported as a tok/s LOWER bound: the linear scale overcounts
the per-token lm_head/embed cost).  4 layers (not 8): the INTERLEAVED
methodology keeps all three weight formats resident at once, next to the
model's eager f32 params and `_weights_xq`'s transient second bf16 copy —
at 8 layers that peaks past the chip's 16 GB (measured
RESOURCE_EXHAUSTED, twice, round 4); at 4 the peak is ~12 GB and a
layer's weight stream (~403 MB/token bf16) still dwarfs every fixed cost
the marginal cancels.

This is the BIG-DIMS LANE (ops/gemv_quant.py): the whole-token
mega-kernel cannot run here — its double-buffered per-layer weight
windows exceed VMEM (the bf16 gate/up window alone is 90 MB x 2 levels;
measured Mosaic crash, round 4) and ``_fused_decode_supported`` now
routes these dims to the XLA ``lax.scan`` decode, with quantized
matmuls streamed per-matrix by ``gemv_quant.qmatmul``.  int4's
quarter-DMA is the payoff regime: ~101 MB/layer/token vs bf16's 403.

Methodology: INTERLEAVED same-session trials; marginal = (min t512 -
min t64) / 448 with BOTH chunk lengths run at the same static attention
window (win=1024), so the difference cancels dispatch+readback AND the
per-step attention cost exactly, leaving pure per-step weight
streaming.  One readback per chunk (the only reliable tunnel sync).
Run on the real chip, ONE process at a time:

    python scripts/bench_7b_probe.py          # writes PROBE7B_r04.json
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

CFG = dict(vocab_size=32000, embed_dim=4096, n_heads=32, ffn_dim=11008,
           max_seq_len=1024, max_batch_size=1, n_layers=4,
           dtype=np.float32)
FORMATS = [None, "int8", "int4"]
TRIALS = 3
N_SHORT, N_LONG = 64, 512
WIN = 1024
FULL_LAYERS = 32


def main():
    import jax.numpy as jnp

    import pydynet_tpu as pdn
    from pydynet_tpu.models.llama.model import Llama

    np.random.seed(0)
    t0 = time.time()
    model = Llama(**CFG).to("cuda:0")
    model.eval()
    print(f"# model built in {time.time() - t0:.0f}s", file=sys.stderr,
          flush=True)
    assert not model._fused_decode_supported(), \
        "7B dims should route off the mega-kernel (VMEM bound)"
    if model._decode_fns is None:
        model._decode_fns = model._make_decode_fns()
    prefill, decode_chunk = model._decode_fns

    wcache = {}

    def weights(quant):
        if quant not in wcache:
            t0 = time.time()
            wcache[quant] = (model._weights_xq(jnp.bfloat16, quant)
                             if quant else model._weights(jnp.bfloat16))
            print(f"# weights[{quant or 'bf16'}] built in "
                  f"{time.time() - t0:.0f}s", file=sys.stderr, flush=True)
        return wcache[quant]

    def run_len(quant, n, seed):
        w = weights(quant)
        prompt = np.asarray([[1, 243 + seed, 532, 991]], np.int32)
        ck, cv = model._empty_caches(1, w["tok"].dtype)
        tok, ck, cv = prefill(w, ck, cv, jnp.asarray(prompt), 0, win=4)
        t0 = time.time()
        ck, cv, toks = decode_chunk(w, ck, cv, tok, 4, n, win=WIN)
        np.asarray(toks)  # host readback = the only reliable tunnel sync
        return time.time() - t0

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
    extrap = {q: round(1e6 / (row[q] * scale), 1) if row[q] > 0 else None
              for q in row}
    out = {"metric": "probe7b_marginal_us_token", "unit": "us/token",
           "dims": f"llama2-7B layer geometry, {CFG['n_layers']} of "
                   f"{FULL_LAYERS} layers",
           "lane": "xla-scan + gemv_quant (mega-kernel over VMEM here)",
           "trials": TRIALS, "measured_nL": row,
           "extrapolated_32L_tok_s_lower_bound": extrap}
    line = json.dumps(out)
    print(line)
    root = os.path.join(os.path.dirname(__file__), "..")
    with open(os.path.join(root, "PROBE7B_r04.json"), "w") as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
