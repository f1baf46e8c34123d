"""FULL 32-layer Llama-2-7B-geometry decode measurement — no extrapolation.

Replaces the r04 4-of-32-layer probe (`bench_7b_probe.py`) whose 32L
numbers were linear-scale lower bounds.  This script builds the complete
32-layer weight set with exactly ONE format resident on the chip:

* weights are generated, quantized (numpy mirror of ``ops/quant``,
  equivalence-checked against the jnp originals on-device at startup) and
  layer-stacked ON THE HOST, then uploaded once — the eager f32 params
  (27 GB) and the transient bf16 copy that OOMed the interleaved r04
  probe at 8 layers never exist on device.  int4 resident set ~3.5 GB,
  int8 ~7 GB on the 16 GB v5e;
* the decode is the real big-dims serving lane: ``Llama._make_decode_fns``
  (geometry shim — the functional decode reads config only) running the
  XLA ``lax.scan`` forward with ``gemv_quant.qmatmul`` streamed weight
  kernels, exactly what ``generate(quant=...)``/``LlamaServer(lane="xla")``
  dispatch at these dims;
* ONE format per process (run int4 and int8 as separate invocations; the
  artifact merges rows) — the point is a measurement with nothing else
  resident.

Methodology (ROADMAP "tunnel micro-benchmark traps"): marginal us/token =
(min t512 - min t64) / 448 with both chunk lengths at the same static
window (win=1024), cancelling dispatch+readback and per-step attention;
end-to-end tok/s = 512 / min(t512) including the dispatch.  Emit-time
sanity guards: a non-positive marginal or end-to-end > chip roofline
re-runs the trial block once and otherwise marks the row
``"contaminated": true`` instead of shipping a physically-impossible
number (VERDICT r04 weak #1).

Run on the real chip, ONE process at a time:

    python scripts/bench_7b_full.py int4     # merges into PROBE7B_r05.json
    python scripts/bench_7b_full.py int8
    python scripts/bench_7b_full.py int4-kv8 # + int8 KV cache (tuple caches
                                             # on the scan lane) — the full
                                             # 7B serving quant composition
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

CFG = dict(vocab_size=32000, embed_dim=4096, n_heads=32, n_kv_heads=32,
           ffn_dim=11008, max_seq_len=1024, n_layers=32)
TRIALS = 3
N_SHORT, N_LONG = 64, 512
WIN = 1024
V5E_HBM_GB_S = 819.0  # v5e HBM pin bandwidth (public spec)


# ------------------- host-side quantization (numpy) ------------------- #
# numpy mirrors of ops/quant.quantize_int8 / quantize_int4 — same
# symmetric per-output-channel formula, same (K/2, N) nibble packing.
# _equiv_check() below compares them against the jnp originals on-device
# before any weight is built.

def np_quantize_int8(w, axis):
    amax = np.max(np.abs(w.astype(np.float32)), axis=axis, keepdims=True)
    scale = np.maximum(amax, 1e-30) / 127.0
    q = np.clip(np.round(w.astype(np.float32) / scale),
                -127.0, 127.0).astype(np.int8)
    return q, scale.astype(np.float32)


def np_quantize_int4(w, axis):
    K = w.shape[axis]
    assert K % 2 == 0
    amax = np.max(np.abs(w.astype(np.float32)), axis=axis, keepdims=True)
    scale = np.maximum(amax, 1e-30) / 7.0
    q = np.clip(np.round(w.astype(np.float32) / scale),
                -7.0, 7.0).astype(np.int8)
    lo = np.take(q, np.arange(K // 2), axis=axis)
    hi = np.take(q, np.arange(K // 2, K), axis=axis)
    packed = np.bitwise_or(np.bitwise_and(lo, 0x0F),
                           np.left_shift(hi.astype(np.int32), 4)
                           .astype(np.int8)).astype(np.int8)
    return packed, scale.astype(np.float32)


def _equiv_check(jnp, Q):
    """Host quantizers match the on-device jnp originals (1-ulp division
    differences may flip a rounding on <0.1% of entries — tolerated; the
    probe measures throughput, not fidelity)."""
    rng = np.random.default_rng(7)
    w = rng.standard_normal((16, 24), np.float32)
    for npq, jq, axis in ((np_quantize_int8, Q.quantize_int8, 1),
                          (np_quantize_int4, Q.quantize_int4, 0)):
        qh, sh = npq(w, axis)
        qd, sd = jq(jnp.asarray(w), axis)
        assert np.allclose(sh, np.asarray(sd), rtol=1e-6), "scale mismatch"
        frac = np.mean(np.abs(qh.astype(np.int32)
                              - np.asarray(qd).astype(np.int32)) > 0)
        assert frac < 1e-3, f"quant mismatch fraction {frac}"


class _Geom:
    """Config-only shim: ``Llama._make_decode_fns`` / ``_empty_caches``
    read geometry attributes, never parameters."""


def build_weights(quant, jnp, put):
    """Host-built, layer-stacked ``_weights_xq``-layout dict
    (model.py:617-651), uploaded once per matrix.

    The quantized blocks are generated DIRECTLY as in-distribution random
    int8/int4 values with plausible scales (what quantizing a N(0, 0.02)
    weight would produce) — the probe measures weight-streaming
    throughput, which depends on dtypes/shapes/layout, not values; the
    startup ``_equiv_check`` pins the layout semantics against
    ``ops/quant``.  All matrices quantize over their CONTRACTION axis
    (first axis of the per-layer (K, M) layout — the r05 first run
    mis-quantized axis=1 and tripped qmatmul's shape assert)."""
    import ml_dtypes

    D, F, V = CFG["embed_dim"], CFG["ffn_dim"], CFG["vocab_size"]
    N, S = CFG["n_layers"], CFG["max_seq_len"]
    hd = D // CFG["n_heads"]
    rng = np.random.default_rng(0)
    q4 = quant == "int4"

    def qmat(shape):
        """(N, K, M)-stacked quantized block + (N, 1, M) scales."""
        n, K, M = shape
        if q4:
            lo = rng.integers(-7, 8, (n, K // 2, M), np.int8)
            hi = rng.integers(-7, 8, (n, K // 2, M), np.int8)
            qb = np.bitwise_or(
                np.bitwise_and(lo, 0x0F),
                np.left_shift(hi.astype(np.int32), 4).astype(np.int8)
            ).astype(np.int8)
        else:
            qb = rng.integers(-127, 128, (n, K, M), np.int8)
        sc = (np.abs(rng.standard_normal((n, 1, M)))
              * 2e-4 + 1e-5).astype(np.float32)
        return qb, sc

    w = {}
    t0 = time.time()
    for name, shape in (("wqkv", (N, D, 3 * D)),
                        ("wo", (N, D, D)),
                        ("wgu", (N, D, 2 * F)),
                        ("down", (N, F, D))):
        qb, sc = qmat(shape)
        w[name + "_xq"], w[name + "_xs"] = put(qb), put(sc)
        del qb, sc
        print(f"# {name} built+uploaded {time.time() - t0:.0f}s",
              file=sys.stderr, flush=True)
    hq, hs = qmat((1, D, V))
    w["head_xq"], w["head_xs"] = put(hq[0]), put(hs[0])
    w["tok"] = put((rng.standard_normal((V, D)) * 0.02)
                   .astype(ml_dtypes.bfloat16))
    w["norm"] = put(np.ones((D,), ml_dtypes.bfloat16))
    w["in_norm"] = put(np.ones((N, D), ml_dtypes.bfloat16))
    w["post_norm"] = put(np.ones((N, D), ml_dtypes.bfloat16))
    w["head_b"] = put(np.zeros((V,), ml_dtypes.bfloat16))
    inv = 1.0 / (10000.0 ** (np.arange(0, hd, 2)[: hd // 2] / hd))
    fr = np.outer(np.arange(S), inv).astype(np.float32)
    w["cos"] = put(np.cos(fr).astype(ml_dtypes.bfloat16))
    w["sin"] = put(np.sin(fr).astype(ml_dtypes.bfloat16))
    if quant == "int4":
        w["q4"] = put(np.ones((), np.int8))
    print(f"# all weights resident in {time.time() - t0:.0f}s",
          file=sys.stderr, flush=True)
    return w


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "int4"
    assert mode in ("int4", "int8", "int4-kv8", "int8-kv8"), mode
    quant, kv8 = mode.split("-")[0], mode.endswith("-kv8")
    import jax
    import jax.numpy as jnp

    from pydynet_tpu.models.llama.model import Llama
    from pydynet_tpu.ops import quant as Q

    dev = jax.devices()[0]
    assert dev.platform == "tpu", "full-7B probe runs on the real chip"
    put = lambda a: jax.device_put(a, dev)
    _equiv_check(jnp, Q)
    print("# quantizer equivalence check passed", file=sys.stderr,
          flush=True)

    g = _Geom()
    for k, v in CFG.items():
        setattr(g, k, v)
    g.head_dim = CFG["embed_dim"] // CFG["n_heads"]
    g.max_batch_size = 1
    prefill, decode_chunk = Llama._make_decode_fns(g)

    w = build_weights(quant, jnp, put)
    wbytes = sum(int(np.prod(a.shape)) * a.dtype.itemsize
                 for k, a in w.items()
                 if hasattr(a, "shape") and ("_xq" in k or "_xs" in k))
    # per decode step the scan also reads the full static attention
    # window from both caches per layer (forward_logits_one: ck_i[:, :win]);
    # int8 KV reads int8 data + per-row f32 scales instead of bf16
    kv_row = CFG["n_kv_heads"] * g.head_dim
    kv_read = CFG["n_layers"] * 2 * WIN * (
        (kv_row + CFG["n_kv_heads"] * 4) if kv8 else kv_row * 2)
    bytes_tok = wbytes + kv_read

    def run_len(n, seed):
        prompt = np.asarray([[1, 243 + seed, 532, 991]], np.int32)
        ck, cv = Llama._empty_caches(g, 1, w["tok"].dtype,
                                     kv_quant="int8" if kv8 else None)
        tok, ck, cv = prefill(w, ck, cv, jnp.asarray(prompt), 0, win=4)
        t0 = time.time()
        ck, cv, toks = decode_chunk(w, ck, cv, tok, 4, n, win=WIN)
        out = np.asarray(toks)  # host readback = the only reliable sync
        assert out.shape[0] == n
        return time.time() - t0

    t0 = time.time()
    run_len(N_SHORT, 0)
    print(f"# short compiled+run in {time.time() - t0:.0f}s",
          file=sys.stderr, flush=True)
    t0 = time.time()
    run_len(N_LONG, 0)
    print(f"# long compiled+run in {time.time() - t0:.0f}s",
          file=sys.stderr, flush=True)

    def trial_block():
        t64, t512 = [], []
        for s in range(1, TRIALS + 1):
            t64.append(run_len(N_SHORT, s))
            t512.append(run_len(N_LONG, s))
            print(f"# trial {s}: t64={t64[-1]:.3f}s t512={t512[-1]:.3f}s",
                  file=sys.stderr, flush=True)
        marg = (min(t512) - min(t64)) / (N_LONG - N_SHORT)
        return marg, min(t512), t64, t512

    marg, best512, t64, t512 = trial_block()
    contaminated = False
    if marg <= 0 or bytes_tok / marg > V5E_HBM_GB_S * 2e9:
        # physically impossible (negative marginal, or implied bandwidth
        # > 2x the HBM pin rate): re-measure once, else mark the row
        print("# sanity guard tripped — re-running trial block",
              file=sys.stderr, flush=True)
        marg, best512, t64, t512 = trial_block()
        contaminated = marg <= 0 or bytes_tok / marg > V5E_HBM_GB_S * 2e9

    row = {
        "quant": mode,
        "layers": CFG["n_layers"],
        "marginal_us_token": round(marg * 1e6, 1),
        "tok_s_marginal": round(1.0 / marg, 1) if marg > 0 else None,
        "tok_s_end_to_end_512": round(N_LONG / best512, 1),
        "weight_bytes_per_token_mb": round(wbytes / 1e6, 1),
        "achieved_hbm_gb_s": round(bytes_tok / marg / 1e9, 1)
        if marg > 0 else None,
        "hbm_roofline_fraction": round(bytes_tok / marg / 1e9
                                       / V5E_HBM_GB_S, 3)
        if marg > 0 else None,
        "t64_s": [round(t, 3) for t in t64],
        "t512_s": [round(t, 3) for t in t512],
    }
    if contaminated:
        row["contaminated"] = True

    root = os.path.join(os.path.dirname(__file__), "..")
    path = os.path.join(root, "PROBE7B_r05.json")
    out = {"metric": "probe7b_full32L", "unit": "us/token",
           "dims": "llama2-7B geometry, ALL 32 layers resident, "
                   "one weight format per process",
           "lane": "xla-scan + gemv_quant (the generate(quant=)/"
                   "LlamaServer(lane='xla') big-dims path)",
           "trials": TRIALS, "win": WIN,
           "v5e_hbm_gb_s": V5E_HBM_GB_S,
           "measured_32L": {}}
    if os.path.exists(path):
        with open(path) as f:
            out = json.load(f)
    out["measured_32L"][mode] = row
    line = json.dumps(out)
    print(line)
    with open(path, "w") as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
