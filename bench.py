"""Headline benchmark: Llama-6L (stories15M config) greedy decode throughput
on one TPU chip, end-to-end through ``Llama.generate`` (tokenizer-to-tokens
path, including host streaming).

Prints ONE JSON line:
  {"metric", "value", "unit", "vs_baseline", "fused", "quant",
   "fidelity_checked", "fidelity_ok",            # headline format's gate
   "marginal_us_token",                          # noise-robust on-device
   "configs": [{"name", "checked", "ok", ...}]}  # per-variant hardware gates
Baseline: 300 tokens/s — the reference's published NumPy decode rate
(/root/reference/README.md:23, BASELINE.md).

Fidelity gates (pydynet_tpu/utils/fidelity.py) run on the real chip before
timing, one per shipped kernel variant — B=1 bf16 / int8-head / full int8,
batched B=4 and B=32, int8-KV batched, narrow-KV GQA, the emit_logits
sampling head, and stories110M dims — teacher-forced along an eager-f32
CPU truth stream with
argmax equality required at every step whose top-2 margin clears bf16
noise.  A headline format that fails its gate is excluded from the race;
the other configs are reported so a Mosaic regression in ANY variant is
driver-visible, not just the raced one.

The headline wall-clock number is end-to-end and tunnel-noise dominated
(ROADMAP.md documents >20x swings with other tenants' load).
``marginal_us_token`` is the noise-robust companion: two whole-chunk
on-device scans (64 and 512 fused steps) from the same prefix, one host
readback each, best-of-3; the difference cancels dispatch + readback
overhead, leaving the chip's marginal cost per decoded token.
"""
import json
import os
import sys
import threading
import time

import numpy as np

FID_STEPS = 16

# Stall watchdog: through the shared remote tunnel, a wedged session hangs
# jax init (or any dispatch) indefinitely — measured multi-hour wedges.
# Rather than the driver timing out with NO output, emit a diagnostic JSON
# line and exit if no progress marker lands for 20 minutes (a single cold
# Mosaic compile is ~1-2 min, so legitimate work always ticks sooner).
_LAST = [time.time()]
_STALL_S = 1200


def _tick():
    _LAST[0] = time.time()


def _watchdog():
    while True:
        time.sleep(30)
        if time.time() - _LAST[0] > _STALL_S:
            print(json.dumps({
                "metric": "llama3_6L_decode_throughput",
                "value": 0.0,
                "unit": "tokens/s",
                "vs_baseline": 0.0,
                "fused": False,
                "error": f"stalled: no progress for {_STALL_S}s "
                         "(shared TPU tunnel wedged?)",
            }), flush=True)
            os._exit(0)  # the JSON line above is the result of record

STORIES15M = dict(vocab_size=32000, embed_dim=288, n_heads=6, ffn_dim=768,
                  max_seq_len=1024, max_batch_size=1, n_layers=6,
                  dtype=np.float32)
STORIES110M = dict(vocab_size=32000, embed_dim=768, n_heads=12, ffn_dim=2048,
                   max_seq_len=1024, max_batch_size=1, n_layers=12,
                   dtype=np.float32)
GQA_15M = dict(STORIES15M, n_kv_heads=2)

PROMPT = np.array([[1, 243, 532, 991]])


def build_model(cfg=None, device=None):
    from pydynet_tpu.models.llama.model import Llama

    np.random.seed(0)
    model = Llama(**(cfg or STORIES15M))
    if device:
        model = model.to(device)
    model.eval()
    return model


def gate_config(name, cfg, *, quant=None, kv_quant=None, B=1, kind="argmax",
                steps=FID_STEPS, margin=None, min_agree=None,
                dequant_truth=None, truth_cache={}):
    """Run one variant's hardware gate; returns a JSON-ready dict.
    CPU truth streams are cached per (cfg-id, B) so the two 15M formats
    share one eager run."""
    import jax.numpy as jnp

    import pydynet_tpu as pdn
    from pydynet_tpu.utils import fidelity

    out = {"name": name, "checked": 0, "ok": False}
    try:
        key = (json.dumps({k: str(v) for k, v in cfg.items()}), B,
               dequant_truth)
        prompt = np.tile(PROMPT, (B, 1)) + np.arange(B)[:, None] * 7
        prompt[:, 0] = 1
        with pdn.no_grad():
            cached = truth_cache.get(key)
            if cached is None:
                cpu = build_model(dict(cfg, max_batch_size=B))
                if dequant_truth == "int4":
                    # truth carries the int4 weight error itself (see
                    # fidelity.dequant_int4_inplace); the packed kernel
                    # then differs only by activation-int8 noise
                    fidelity.dequant_int4_inplace(cpu)
                truth, margins, tops = fidelity.greedy_truth(cpu, prompt,
                                                             steps)
                dev = cpu.to("cuda:0")  # same weights, now on the chip
                truth_cache[key] = (truth, margins, tops, dev)
            else:
                truth, margins, tops, dev = cached
            # no reset needed between formats: the chunk/step closures are
            # retraced per weights-dict key set (quant adds keys), and
            # keeping them shares the compiled prefill across gates
            if kind == "argmax":
                kw = {} if margin is None else {"margin": margin}
                if min_agree is not None:
                    kw["min_agree"] = min_agree
                checked, ok, agree = fidelity.gate_fused_argmax(
                    dev, prompt, truth, margins, tops, dtype=jnp.bfloat16,
                    quant=quant, kv_quant=kv_quant, **kw)
                out.update(checked=checked, ok=bool(ok),
                           agree=round(agree, 3))
            elif kind == "sampled":  # fused emit_logits -> sample_logits
                checked, ok, agree = fidelity.gate_fused_sampled(
                    dev, prompt, truth,
                    min_agree=0.8 if min_agree is None else min_agree)
                out.update(checked=checked, ok=bool(ok),
                           agree=round(agree, 3))
            else:  # logits head (sampling mode), f32, scale-aware tol
                diff, ok = fidelity.gate_fused_logits(dev, prompt, truth)
                out.update(checked=steps - 1, ok=bool(ok),
                           max_diff=round(diff, 5))
    except Exception as e:
        print(f"# gate {name} crashed ({type(e).__name__}: {e})",
              file=sys.stderr)
        # BOUNDED: a multi-KB Mosaic crash text inside the one JSON line
        # destroyed round 3's whole artifact (driver tail truncation) —
        # the full text still goes to stderr above.  ANSI escapes stripped
        # (tunnel errors embed colored log lines).
        import re
        msg = re.sub(r"\x1b\[[0-9;]*m", "", f"{type(e).__name__}: {e}")
        out["error"] = " ".join(msg.split())[:200]
    return out


def marginal_us_token(model, quant):
    """On-device marginal cost per fused decode step (see module doc);
    the timing rule lives in ``fidelity.marginal_us_token`` (one copy
    shared with the scripts/ benchmarks)."""
    import pydynet_tpu as pdn
    from pydynet_tpu.utils import fidelity

    with pdn.no_grad():
        return max(0.0, fidelity.marginal_us_token(model, quant))


_MAX_LINE = 6000  # the driver tail-captures stdout; round 3's artifact was
# destroyed by one unbounded in-line error string (VERDICT r03) — the JSON
# line of record must stay comfortably under any plausible capture window


def _emit(payload):
    """Print the one JSON line of record, BOUNDED: if it exceeds
    ``_MAX_LINE``, strip per-config extras, then drop configs entirely —
    the headline fields always land parseable."""
    line = json.dumps(payload)
    if len(line) > _MAX_LINE and "configs" in payload:
        payload["configs"] = [
            dict({k: c[k] for k in ("name", "checked", "ok", "agree")
                  if k in c},
                 **({"error": c["error"][:60]} if c.get("error") else {}))
            for c in payload["configs"]]
        payload["configs_trimmed"] = True
        line = json.dumps(payload)
    if len(line) > _MAX_LINE:
        payload.pop("configs", None)
        payload["configs_dropped"] = True
        line = json.dumps(payload)
    print(line, flush=True)


def main():
    threading.Thread(target=_watchdog, daemon=True).start()
    try:
        _run()
    except BaseException as e:  # the JSON line of record must still land
        _emit({
            "metric": "llama3_6L_decode_throughput",
            "value": 0.0,
            "unit": "tokens/s",
            "vs_baseline": 0.0,
            "fused": False,
            "error": f"{type(e).__name__}: {e}"[:300],
        })
        import traceback
        traceback.print_exc()  # full text to stderr only


def _run():
    import jax.numpy as jnp

    import pydynet_tpu as pdn

    model = build_model(device="cuda:0" if pdn.cuda.is_available() else None)
    _tick()

    total = 1024
    dtype = jnp.bfloat16
    fused_supported = model.device.kind == "accel" \
        and model._fused_decode_supported()

    configs = []
    formats = []  # headline race entrants: (quant, checked, ok)
    if fused_supported:
        for name, cfg, kw in (
            ("b1-bf16", STORIES15M, {}),
            ("b1-int8-head", STORIES15M, {"quant": "int8-head"}),
            # full-layer int8 legitimately perturbs logits beyond any
            # margin a random-init stream clears, so its gate is majority
            # agreement over ALL steps — true breakage (bad scales /
            # layout) drives agreement toward 1/vocab, quantization noise
            # flips only near-ties
            ("b1-int8", STORIES15M, {"quant": "int8", "min_agree": 0.75}),
            # int4: gated against a DEQUANTIZED-int4 truth stream (the
            # weight error rides the truth; only activation noise remains)
            ("b1-int4", STORIES15M,
             {"quant": "int4", "min_agree": 0.75, "dequant_truth": "int4"}),
            ("batched-b4", STORIES15M, {"B": 4}),
            ("batched-b32", STORIES15M, {"B": 32}),
            # weight int8 through the batched kernel (round-3 late): head
            # argmax-gated like b1-int8-head, full-layer majority-gated
            ("batched-b4-int8head", STORIES15M,
             {"B": 4, "quant": "int8-head"}),
            ("batched-b4-int8", STORIES15M,
             {"B": 4, "quant": "int8", "min_agree": 0.75}),
            ("batched-b4-int4", STORIES15M,
             {"B": 4, "quant": "int4", "min_agree": 0.75,
              "dequant_truth": "int4"}),
            # int8 KV cache: per-row quantization noise is genuine (like
            # full-layer int8), so majority agreement is the right gate
            ("batched-b4-kvint8", STORIES15M,
             {"B": 4, "kv_quant": "int8", "min_agree": 0.75}),
            ("b1-kvint8", STORIES15M,
             {"kv_quant": "int8", "min_agree": 0.75}),
            ("gqa-6q2kv-narrow", GQA_15M, {}),
            ("logits-head-f32", STORIES15M, {"kind": "logits"}),
            # sampled decode path: fused logits -> radix filters ->
            # categorical, same key as the XLA stream (round-4 gate)
            ("sampled-t0.8-k50-p0.9", STORIES15M, {"kind": "sampled"}),
            ("stories110m-b1", STORIES110M, {}),
        ):
            g = gate_config(name, cfg, **kw)
            _tick()
            configs.append(g)
            if name in ("b1-bf16", "b1-int8-head") and g["ok"]:
                formats.append((kw.get("quant"), g["checked"], True))
            print(f"# gate {name}: checked={g['checked']} ok={g['ok']}",
                  file=sys.stderr)

    with pdn.no_grad():
        best, best_quant = 0.0, None
        # fail-closed defaults: the XLA fallback verifies nothing, and the
        # JSON must not read as a passing check there
        fid_checked, fid_ok = 0, False
        if formats:  # fused race: each surviving format, whole-seq dispatch
            for quant, checked, ok in formats:
                try:
                    list(model.generate(PROMPT, total, chunk=total,
                                        dtype=dtype, fused=True,
                                        quant=quant))  # warmup
                except Exception as e:
                    print(f"# fused decode quant={quant} unavailable "
                          f"({type(e).__name__}: {e})", file=sys.stderr)
                    continue
                # 10 trials/format: each is <1 s even in a loaded window,
                # and the headline is best-of — more samples of the
                # shared-tunnel load lottery for near-zero added runtime
                for _ in range(10):
                    t0 = time.time()
                    toks = list(model.generate(PROMPT, total,
                                               chunk=total, dtype=dtype,
                                               fused=True, quant=quant))
                    dt = time.time() - t0
                    _tick()
                    if len(toks) / dt > best:
                        best = len(toks) / dt
                        best_quant = quant
                        fid_checked, fid_ok = checked, ok
        fused = bool(formats) and best > 0
        marginal = None
        if fused:
            try:
                marginal = round(marginal_us_token(model, best_quant), 2)
            except Exception as e:
                print(f"# marginal measurement crashed "
                      f"({type(e).__name__}: {e})", file=sys.stderr)
        if not fused:  # XLA fallback path
            print("# falling back to the XLA decode path", file=sys.stderr)
            for chunk in (total, 512):
                list(model.generate(PROMPT, total, chunk=chunk,
                                    dtype=dtype, fused=False))
                for _ in range(5):
                    t0 = time.time()
                    toks = list(model.generate(PROMPT, total,
                                               chunk=chunk, dtype=dtype,
                                               fused=False))
                    best = max(best, len(toks) / (time.time() - t0))
                    _tick()

    _emit({
        "metric": "llama3_6L_decode_throughput",
        "value": round(best, 1),
        "unit": "tokens/s",
        "vs_baseline": round(best / 300.0, 2),
        "fused": fused,
        "quant": best_quant or "bf16",
        "fidelity_checked": fid_checked,
        "fidelity_ok": bool(fid_ok),
        "marginal_us_token": marginal,
        "configs": configs,
    })


if __name__ == "__main__":
    main()
