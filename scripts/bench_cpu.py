"""Interleaved same-machine CPU decode comparison: reference NumPy loop
vs this repo's lanes (BLAS numpy lane + compiled XLA scan), stories15M
dims, random init, greedy B=1.

The reference's published 300 tok/s (/root/reference/README.md:23) was a
multi-core box; this sandbox has ONE core, so the only honest comparison
is interleaved same-session trials on THIS machine.  Each trial decodes
~196 tokens from a 4-token prompt; lanes alternate A/B/A/B... so tenant
load (this is a shared box) hits both equally.

Usage: python scripts/bench_cpu.py   (forces the CPU platform; safe to
run alongside one TPU process).  Prints one JSON line.
"""
import json
import os
import subprocess
import sys
import textwrap
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"
DIMS = dict(vocab_size=32000, embed_dim=288, n_heads=6, ffn_dim=768,
            max_seq_len=256, max_batch_size=1, n_layers=6)
NEW = 200
TRIALS = 3

_REF_SCRIPT = textwrap.dedent("""
    import json, os, sys, time
    sys.dont_write_bytecode = True
    sys.path = [p for p in sys.path if p not in ("", os.getcwd(), {repo!r})]
    sys.path.insert(0, {ref!r})
    import numpy as np
    from llm.llama.model import Llama
    assert Llama.__module__ == "llm.llama.model"
    cfg = json.loads({cfg!r}); cfg["dtype"] = np.float32
    np.random.seed(0)
    model = Llama(**cfg)
    ids = np.asarray([[1, 5, 9, 2]])
    import pydynet as pdn
    with pdn.no_grad():
        list(model.generate(pdn.Tensor(ids), 16))      # warm
        t0 = time.perf_counter()
        toks = list(model.generate(pdn.Tensor(ids), {new}))
        dt = time.perf_counter() - t0
    print(json.dumps({{"tok_s": len(toks) / dt, "n": len(toks)}}))
""")


def ref_trial():
    script = _REF_SCRIPT.format(repo=REPO, ref=REFERENCE,
                                cfg=json.dumps(DIMS), new=NEW)
    out = subprocess.run([sys.executable, "-c", script], cwd="/tmp",
                         capture_output=True, text=True, timeout=900)
    if out.returncode != 0:
        raise RuntimeError(out.stderr[-2000:])
    return json.loads(out.stdout.strip().splitlines()[-1])["tok_s"]


def main():
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    sys.path.insert(0, REPO)
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    from pydynet_tpu.models.llama.model import Llama

    np.random.seed(0)
    model = Llama(**DIMS, dtype=np.float32)
    ids = np.asarray([[1, 5, 9, 2]])

    def our_trial(fused):
        list(model.generate(ids, 16, fused=fused))     # warm
        t0 = time.perf_counter()
        toks = list(model.generate(ids, NEW, fused=fused))
        dt = time.perf_counter() - t0
        assert len(toks) == NEW - ids.shape[1]
        return len(toks) / dt

    rows = {"reference": [], "numpy_lane": [], "xla_scan": []}
    for _ in range(TRIALS):                            # interleaved A/B/C
        rows["reference"].append(round(ref_trial(), 1))
        rows["numpy_lane"].append(round(our_trial("numpy"), 1))
        rows["xla_scan"].append(round(our_trial(False), 1))
    med = {k: sorted(v)[len(v) // 2] for k, v in rows.items()}
    print(json.dumps({
        "metric": "cpu_decode_tok_s", "dims": "stories15M", "unit": "tok/s",
        "trials": rows, "median": med,
        "vs_reference": round(med["numpy_lane"] / med["reference"], 2),
    }))


if __name__ == "__main__":
    main()
