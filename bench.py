"""Headline benchmark: Llama-6L (stories15M config) greedy decode throughput
on one TPU chip, end-to-end through ``Llama.generate`` (tokenizer-to-tokens
path, including host streaming).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "fused",
"quant", "fidelity_checked", "fidelity_ok"}.
Baseline: 300 tokens/s — the reference's published NumPy decode rate
(/root/reference/README.md:23, BASELINE.md).

Two weight formats race (the shared-tunnel TPU is noisy, so each gets
several trials and the best wins): bf16, and bf16 with an int8 lm_head
("int8-head" — the head is the single largest HBM stream of a decode
step; measured ~2-4us/token faster).

Fidelity gate (runs on the real chip before timing, once per format): the
whole-token Pallas kernel is driven TEACHER-FORCED along a greedy token
stream computed by the eager f32 module on CPU, and its per-step argmax must
match at every step whose f32 top-2 logit margin clears bf16 noise (0.05).
Teacher forcing prevents one near-tie flip from cascading, so this checks
the kernel's math, not the chaos of a random-weight stream.  A raw
fused-vs-XLA stream diff is NOT a valid check: the kernel keeps the
residual stream in f32 while the XLA path rounds to bf16 per layer, so at
near-ties the two (equally valid) bf16 paths pick different tokens.  A
format that fails its gate is excluded from the race.
"""
import json
import sys
import time

import numpy as np

MARGIN = 0.05  # bf16 rounding at |logit|~5 is ~0.04
FID_STEPS = 32


def build_model(device=None):
    from pydynet_tpu.models.llama.model import Llama

    np.random.seed(0)
    model = Llama(vocab_size=32000, embed_dim=288, n_heads=6, ffn_dim=768,
                  max_seq_len=1024, max_batch_size=1, n_layers=6,
                  dtype=np.float32)
    if device:
        model = model.to(device)
    model.eval()
    return model


def cpu_truth(prompt_ids):
    """Greedy stream + per-step top-2 margins from the eager f32 module on
    CPU (same seed => same weights as the device model)."""
    import pydynet_tpu as pdn

    cpu_model = build_model()
    truth, margins = [], []
    with pdn.no_grad():
        B, L = prompt_ids.shape
        logits = cpu_model(prompt_ids, 0).numpy()[:, -1, :]
        for i in range(FID_STEPS):
            top2 = np.sort(logits[0])[-2:]
            margins.append(float(top2[1] - top2[0]))
            nxt = logits.argmax(-1)[:, None]
            truth.append(int(nxt[0, 0]))
            logits = cpu_model(nxt, L + i).numpy()[:, -1, :]
    return truth, margins


def fidelity_gate(model, prompt_ids, truth, margins, quant):
    """Returns (checked_steps, ok) for one weight format: the fused
    whole-token kernel, teacher-forced along the CPU truth stream."""
    import functools

    import jax
    import jax.numpy as jnp
    from pydynet_tpu.ops.decode_step import (fused_decode_token,
                                             lane_pad_dim, pad_cache_lanes,
                                             pick_sb, pick_vt)

    w = model._fused_weights(jnp.bfloat16, quant)
    N, S, D = model.n_layers, model.max_seq_len, model.embed_dim
    Dp = lane_pad_dim(D)
    vt, sb = pick_vt(model.vocab_size), pick_sb(S)
    prefill, _ = model._make_decode_fns()
    ck5, cv5 = model._empty_caches(1, w["tok"].dtype)
    tok0, ck5, cv5 = prefill(w, ck5, cv5,
                             jnp.asarray(prompt_ids, jnp.int32), 0)
    ck = pad_cache_lanes(ck5.reshape(N, S, D), Dp)
    cv = pad_cache_lanes(cv5.reshape(N, S, D), Dp)
    qhead = "head_s" in w
    qlayers = "s_attn" in w  # int8 layer weights live under "_q" keys

    def W(weights, name):
        return weights[name + "_q"] if qlayers else weights[name]

    @functools.partial(jax.jit, donate_argnums=(1, 2))
    def tf_chunk(weights, ck, cv, toks_in, pos0):
        def step(carry, tin):
            ck, cv, p = carry
            nxt, ck, cv = fused_decode_token(
                p, tin, weights["tok"], weights["cosD"], weights["sinD"],
                weights["rot"], weights["hmask_pad"], weights["norm2"],
                W(weights, "wq"), W(weights, "wk"), W(weights, "wv"),
                W(weights, "wo"),
                W(weights, "gate_w"), W(weights, "up_w"),
                W(weights, "down"),
                weights["in_norm2"], weights["post_norm2"],
                weights["head_wq"] if qhead else weights["head_w"],
                weights["head_b2"], ck, cv, vt=vt, sb=sb,
                s_attn=weights.get("s_attn"), s_ffn=weights.get("s_ffn"),
                head_s=weights.get("head_s"))
            return (ck, cv, p + 1), nxt

        (ck, cv, p), outs = jax.lax.scan(
            step, (ck, cv, jnp.asarray(pos0, jnp.int32)), toks_in)
        return outs  # outs[i] = kernel argmax after consuming toks_in[i]

    # feed [truth[0], ..., truth[-2]]; the kernel's output after consuming
    # truth[i-1] at pos L+i must equal truth[i]
    L = prompt_ids.shape[1]
    toks_in = jnp.asarray(np.array(truth[:-1])[:, None], jnp.int32)
    first = int(np.asarray(tok0)[0])
    outs = np.asarray(tf_chunk(w, ck, cv, toks_in, L))[:, 0]

    checked = ok = 0
    # step 0: prefill argmax (bf16 XLA) vs truth[0]
    if margins[0] > MARGIN:
        checked += 1
        ok += int(first == truth[0])
    for i in range(1, FID_STEPS):
        if margins[i] > MARGIN:
            checked += 1
            ok += int(int(outs[i - 1]) == truth[i])
    # fail closed: zero confident steps means NOTHING was verified — do not
    # let a format into the race on a vacuous 0 == 0
    return checked, checked > 0 and ok == checked


def main():
    import jax.numpy as jnp
    import pydynet_tpu as pdn

    model = build_model("cuda:0" if __import__("pydynet_tpu").cuda.
                        is_available() else None)

    prompt_ids = np.array([[1, 243, 532, 991]])
    total = 1024
    dtype = jnp.bfloat16
    fused_supported = model.device.kind == "accel" \
        and model._fused_decode_supported()

    formats = []  # (quant, checked, ok)
    if fused_supported:
        with pdn.no_grad():
            truth, margins = cpu_truth(prompt_ids)
            for quant in (None, "int8-head"):
                try:
                    checked, ok = fidelity_gate(model, prompt_ids, truth,
                                                margins, quant)
                except Exception as e:
                    print(f"# fidelity gate for quant={quant} crashed "
                          f"({type(e).__name__}: {e})", file=sys.stderr)
                    checked, ok = 0, False
                if not ok:
                    print(f"# FIDELITY GATE FAILED for quant={quant}: fused "
                          "kernel argmax diverged from f32 ground truth at "
                          "a confident step", file=sys.stderr)
                else:
                    formats.append((quant, checked, ok))

    with pdn.no_grad():
        best, best_quant = 0.0, None
        # fail-closed defaults: the XLA fallback verifies nothing, and the
        # JSON must not read as a passing check there
        fid_checked, fid_ok = 0, False
        if formats:  # fused race: each surviving format, whole-seq dispatch
            for quant, checked, ok in formats:
                try:
                    list(model.generate(prompt_ids, total, chunk=total,
                                        dtype=dtype, fused=True,
                                        quant=quant))  # warmup
                except Exception as e:
                    print(f"# fused decode quant={quant} unavailable "
                          f"({type(e).__name__}: {e})", file=sys.stderr)
                    continue
                for _ in range(6):
                    t0 = time.time()
                    toks = list(model.generate(prompt_ids, total,
                                               chunk=total, dtype=dtype,
                                               fused=True, quant=quant))
                    dt = time.time() - t0
                    if len(toks) / dt > best:
                        best = len(toks) / dt
                        best_quant = quant
                        fid_checked, fid_ok = checked, ok
        fused = bool(formats) and best > 0
        if not fused:  # XLA fallback path
            print("# falling back to the XLA decode path", file=sys.stderr)
            for chunk in (total, 512):
                list(model.generate(prompt_ids, total, chunk=chunk,
                                    dtype=dtype, fused=False))
                for _ in range(5):
                    t0 = time.time()
                    toks = list(model.generate(prompt_ids, total,
                                               chunk=chunk, dtype=dtype,
                                               fused=False))
                    best = max(best, len(toks) / (time.time() - t0))

    print(json.dumps({
        "metric": "llama3_6L_decode_throughput",
        "value": round(best, 1),
        "unit": "tokens/s",
        "vs_baseline": round(best / 300.0, 2),
        "fused": fused,
        "quant": best_quant or "bf16",
        "fidelity_checked": fid_checked,
        "fidelity_ok": bool(fid_ok),
    }))


if __name__ == "__main__":
    main()
