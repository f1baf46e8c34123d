"""Headline benchmark: Llama-6L (stories15M config) greedy decode throughput
on one TPU chip, end-to-end through ``Llama.generate`` (tokenizer-to-tokens
path, including host streaming).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "fused",
"fidelity_checked", "fidelity_ok"}.
Baseline: 300 tokens/s — the reference's published NumPy decode rate
(/root/reference/README.md:23, BASELINE.md).

Fidelity gate (runs on the real chip before timing): the whole-token Pallas
kernel is driven TEACHER-FORCED along a greedy token stream computed by the
eager f32 module on CPU, and its per-step argmax must match at every step
whose f32 top-2 logit margin clears bf16 noise (0.05).  Teacher forcing
prevents one near-tie flip from cascading, so this checks the kernel's
math, not the chaos of a random-weight stream.  A raw fused-vs-XLA stream
diff is NOT a valid check: the kernel keeps the residual stream in f32
while the XLA path rounds to bf16 per layer, so at near-ties the two
(equally valid) bf16 paths pick different tokens.
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


def fidelity_gate(model, prompt_ids):
    """Returns (checked_steps, ok).  Ground truth: eager f32 module on CPU
    (same seed => same weights).  Device side: the fused whole-token kernel,
    teacher-forced along the truth stream."""
    import jax
    import jax.numpy as jnp
    import pydynet_tpu as pdn
    from pydynet_tpu.ops.decode_step import (fused_decode_token,
                                             lane_pad_dim, pad_cache_lanes,
                                             pick_sb, pick_vt)

    cpu_model = build_model()  # stays on CPU; identical weights (same seed)
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

    # device side: teacher-forced fused steps in bf16
    w = model._fused_weights(jnp.bfloat16)
    N, S, D = model.n_layers, model.max_seq_len, model.embed_dim
    Dp = lane_pad_dim(D)
    vt, sb = pick_vt(model.vocab_size), pick_sb(S)
    prefill, _ = model._make_decode_fns()
    ck5, cv5 = model._empty_caches(1, w["tok"].dtype)
    tok0, ck5, cv5 = prefill(w, ck5, cv5,
                             jnp.asarray(prompt_ids, jnp.int32), 0)
    ck = pad_cache_lanes(ck5.reshape(N, S, D), Dp)
    cv = pad_cache_lanes(cv5.reshape(N, S, D), Dp)

    import functools

    @functools.partial(jax.jit, donate_argnums=(1, 2))
    def tf_chunk(weights, ck, cv, toks_in, pos0):
        def step(carry, tin):
            ck, cv, p = carry
            nxt, ck, cv = fused_decode_token(
                p, tin, weights["tok"], weights["cosD"], weights["sinD"],
                weights["rot"], weights["hmask_pad"], weights["norm2"],
                weights["wq"], weights["wk"], weights["wv"], weights["wo"],
                weights["gate_w"], weights["up_w"], weights["down"],
                weights["in_norm2"], weights["post_norm2"],
                weights["head_w"], weights["head_b2"], ck, cv, vt=vt, sb=sb)
            return (ck, cv, p + 1), nxt

        (ck, cv, p), outs = jax.lax.scan(
            step, (ck, cv, jnp.asarray(pos0, jnp.int32)), toks_in)
        return outs  # outs[i] = kernel argmax after consuming toks_in[i]

    # feed [prefill-token, truth[0], ..., truth[-2]]; the kernel's output i
    # should predict truth[i+1]'s predecessor chain: output after truth[i-1]
    # at pos L+i must equal truth[i]
    L = prompt_ids.shape[1]
    toks_in = jnp.asarray(np.array(truth[:-1])[:, None], jnp.int32)
    first = int(np.asarray(tok0)[0])
    # truth[0] sits at sequence index L: feed it at pos L (same as the CPU
    # chain); the kernel's output i then predicts truth[i+1]
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
    return checked, ok == checked


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

    fid_checked, fid_ok = 0, True
    if fused_supported:
        with pdn.no_grad():
            fid_checked, fid_ok = fidelity_gate(model, prompt_ids)
        if not fid_ok:
            print("# FIDELITY GATE FAILED: fused kernel argmax diverged "
                  "from f32 ground truth at a confident step",
                  file=sys.stderr)

    with pdn.no_grad():
        best = 0.0
        fused = fused_supported or None
        # two dispatch strategies (whole-sequence single dispatch vs
        # pipelined 512-chunks); the shared TPU tunnel is noisy, so race
        # both and keep the best of several trials
        for chunk in (total, 512):
            try:
                list(model.generate(prompt_ids, total, chunk=chunk,
                                    dtype=dtype, fused=fused))  # warmup
            except Exception as e:
                print(f"# fused decode unavailable ({type(e).__name__}: {e})"
                      "; falling back to the XLA path", file=sys.stderr)
                fused = False
                list(model.generate(prompt_ids, total, chunk=chunk,
                                    dtype=dtype, fused=fused))
            for _ in range(7):
                t0 = time.time()
                toks = list(model.generate(prompt_ids, total, chunk=chunk,
                                           dtype=dtype, fused=fused))
                dt = time.time() - t0
                best = max(best, len(toks) / dt)

    print(json.dumps({
        "metric": "llama3_6L_decode_throughput",
        "value": round(best, 1),
        "unit": "tokens/s",
        "vs_baseline": round(best / 300.0, 2),
        "fused": bool(fused_supported and fused is not False),
        "fidelity_checked": fid_checked,
        "fidelity_ok": bool(fid_ok),
    }))


if __name__ == "__main__":
    main()
