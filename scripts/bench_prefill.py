"""Prefill-throughput benchmark: flash vs dense prefill attention on the
user-facing XLA lane (VERDICT r04 #4's artifact).

``forward_logits_one(flash=True)`` routes pure-causal prefill through
the Pallas blockwise kernel (O(block) VMEM) instead of the materialized
(L, win) score matrix.  This measures prefill tok/s at L = 1k .. the
longest length that fits, at two geometries:

* stories15M dims (288/6H/6L) with max_seq_len 16384 — the dense score
  tensor at L=16k is 6 x 16k x 16k x 4 B = 6.4 GB/layer; flash streams
  it in 4 MB blocks;
* 7B layer geometry (4096/32H) at 4 layers (prefill cost is per-layer
  FLOPs, so per-layer numbers scale linearly and the 32L weight set
  isn't needed to measure the attention path) — the dense L=16k score
  tensor would be 32 x 16k x 16k x 4 B = 34 GB/layer: it cannot run at
  all, which is the point.

Timing: one prefill dispatch + token readback per trial (prefill at
these lengths is 0.1-10 s, far above the ~30 ms dispatch jitter);
3 trials, best reported; dense rows that OOM record "oom".  Emit guard:
a flash/dense ratio > 50x or a non-positive time marks the row
contaminated rather than shipping it.

Run on the real chip, ONE process at a time:

    python scripts/bench_prefill.py          # writes PREFILLBENCH_r05.json
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

TRIALS = 3
GEOMS = [
    ("stories15M", dict(vocab_size=32000, embed_dim=288, n_heads=6,
                        ffn_dim=768, max_seq_len=16384, max_batch_size=1,
                        n_layers=6, dtype=np.float32),
     [1024, 4096, 16384]),
    ("7B-4L", dict(vocab_size=32000, embed_dim=4096, n_heads=32,
                   ffn_dim=11008, max_seq_len=16384, max_batch_size=1,
                   n_layers=4, dtype=np.float32),
     [1024, 4096, 16384]),
]


def main():
    import jax.numpy as jnp

    import pydynet_tpu as pdn
    from pydynet_tpu.models.llama.model import Llama

    rows = []
    for name, cfg, lens in GEOMS:
        np.random.seed(0)
        t0 = time.time()
        model = Llama(**cfg).to("cuda:0")
        model.eval()
        if model._decode_fns is None:
            model._decode_fns = model._make_decode_fns()
        prefill = model._decode_fns[0]
        w = model._weights(jnp.bfloat16)
        print(f"# {name} built in {time.time() - t0:.0f}s",
              file=sys.stderr, flush=True)
        rng = np.random.default_rng(3)

        def run(L, flash, seed):
            ids = rng.integers(1, 31000, size=(1, L)).astype(np.int32)
            ck, cv = model._empty_caches(1, w["tok"].dtype)
            t0 = time.time()
            tok, ck, cv = prefill(w, ck, cv, jnp.asarray(ids), 0,
                                  win=L, flash=flash)
            np.asarray(tok)  # host readback = the only reliable sync
            return time.time() - t0

        with pdn.no_grad():
            for L in lens:
                row = {"geometry": name, "L": L}
                for mode, flash in (("dense", False), ("flash", True)):
                    try:
                        run(L, flash, 0)  # compile, untimed
                        ts = [run(L, flash, s + 1)
                              for s in range(TRIALS)]
                        best = min(ts)
                        row[mode + "_s"] = round(best, 3)
                        row[mode + "_tok_s"] = round(L / best, 1)
                    except Exception as e:  # noqa: BLE001 — OOM rows are
                        # expected data points at 7B dims, not failures
                        msg = f"{type(e).__name__}"
                        if "RESOURCE_EXHAUSTED" in str(e) or "memory" \
                                in str(e).lower():
                            msg = "oom"
                        row[mode + "_s"] = msg[:80]
                if isinstance(row.get("dense_s"), float) \
                        and isinstance(row.get("flash_s"), float):
                    r = row["dense_s"] / row["flash_s"]
                    row["flash_x"] = round(r, 2)
                    if r > 50 or row["flash_s"] <= 0:
                        row["contaminated"] = True
                rows.append(row)
                print(f"# {row}", file=sys.stderr, flush=True)
        del w, model

    flash16k = next((r for r in rows
                     if r["geometry"] == "stories15M" and r["L"] == 16384
                     and isinstance(r.get("flash_tok_s"), float)), None)
    out = {"metric": "prefill_flash_tok_s_L16k",
           "value": flash16k["flash_tok_s"] if flash16k else None,
           "unit": "prompt tok/s (stories15M dims, L=16384, flash)",
           "trials": TRIALS, "rows": rows,
           "note": "flash = Pallas blockwise prefill on the generate/"
                   "serve admission path (forward_logits_one flash=True);"
                   " dense = the prior O(L^2) score einsum"}
    line = json.dumps(out)
    print(line)
    root = os.path.join(os.path.dirname(__file__), "..")
    with open(os.path.join(root, "PREFILLBENCH_r05.json"), "w") as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
