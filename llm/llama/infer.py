"""Llama greedy-decode CLI.

Flag/behavior parity with /root/reference/llm/llama/infer.py (same config
constants, prompt flag, per-token streaming print, tok/s report).  Extras:
``--weights``/``--tokenizer`` paths, ``--max-new-tokens``, and a
``--random-init`` fallback so the benchmark runs in offline sandboxes with
no stories15M checkpoint (throughput is weight-value independent).
"""
import argparse
import os
import sys
import time

import numpy as np

from .._cpu import force_cpu_platform_if_requested
force_cpu_platform_if_requested()  # must precede the pydynet_tpu import

import pydynet_tpu as pdn
from .tokenizer import Tokenizer
from .model import Llama
from .io import load_model, load_finetuned_parameters

DIM = 288
N_LAYERS = 6
N_HEADS = 6
VOCAB_SIZE = 32000
MAX_SEQ_LEN = 1024
MAX_BATCH = 1
FFN_DIM = 768


def build_model(args):
    datatype = np.float32
    if os.path.exists(args.weights) and not args.random_init:
        # architecture from the checkpoint's shapes: any converted HF-named
        # npz (stories15M/110M, GQA models) runs without editing constants
        from .io import infer_config

        cfg = infer_config(args.weights, MAX_SEQ_LEN, MAX_BATCH,
                           n_heads=args.n_heads)
        model = load_model(Llama(dtype=datatype, **cfg), args.weights)
    else:
        model = Llama(VOCAB_SIZE, DIM, N_HEADS, FFN_DIM, MAX_SEQ_LEN,
                      MAX_BATCH, N_LAYERS, dtype=datatype)
        print(f"[infer] checkpoint {args.weights!r} not found -> "
              "random-initialized weights (throughput benchmark mode)")
    if args.finetuned is not None:
        model = load_finetuned_parameters(model, args.finetuned)
    return model


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Prompt input, e.g. There was a boy")
    parser.add_argument("--prompt", type=str, default="There was a boy")
    parser.add_argument("--cuda", action="store_true",
                        help="(reference parity; the accelerator is already "
                        "the default here — use --no-cuda to opt out)")
    parser.add_argument("--no-cuda", action="store_true",
                        help="Force CPU inference")
    parser.add_argument("--finetuned", type=str, default=None,
                        help="Optional finetuned parameter file (.npz)")
    parser.add_argument("--weights", type=str,
                        default="llm/llama/data/stories15M.model.npz")
    parser.add_argument("--tokenizer", type=str,
                        default="llm/llama/data/tokenizer.model.np")
    parser.add_argument("--max-new-tokens", type=int, default=1024)
    parser.add_argument("--random-init", action="store_true")
    parser.add_argument("--n-heads", type=int, default=None,
                        help="override the head count inferred from the "
                        "checkpoint shapes (head_dim is ambiguous when "
                        "several conventional sizes divide the widths)")
    parser.add_argument("--dtype", choices=["float32", "bfloat16"],
                        default="float32",
                        help="decode compute dtype (bfloat16 ~2x faster)")
    parser.add_argument("--chunk", type=int, default=None,
                        help="decode tokens per device dispatch")
    parser.add_argument("--temperature", type=float, default=0.0,
                        help="0 = greedy (reference parity); >0 samples "
                        "on-device (XLA path)")
    parser.add_argument("--top-k", type=int, default=None)
    parser.add_argument("--top-p", type=float, default=None)
    parser.add_argument("--seed", type=int, default=0,
                        help="Sampling PRNG seed")
    parser.add_argument("--repetition-penalty", type=float, default=None,
                        help="HF-style penalty (>1) on already-seen tokens "
                        "(sampling mode only)")
    parser.add_argument("--beams", type=int, default=1,
                        help=">1 switches to beam-search decoding "
                        "(prints the best sequence at the end)")
    parser.add_argument("--quant", choices=["int8-head", "int8", "int4"],
                        default=None,
                        help="weight-only quantization for the fused decode "
                        "path (int8-head: lm_head only; int4: packed, "
                        "quarter traffic — big-dims regime, lossier)")
    parser.add_argument("--kv-quant", choices=["int8"], default=None,
                        help="int8 KV cache for the fused decode path "
                        "(2x context per HBM byte; mutually exclusive "
                        "with --quant)")
    parser.add_argument("--speculative", action="store_true",
                        help="prompt-lookup speculative decoding (greedy "
                        "only; token stream identical, repeated text "
                        "decodes several tokens per dispatch)")
    parser.add_argument("--draft-k", type=int, default=7,
                        help="speculative draft length")
    parser.add_argument("--ngram", type=int, default=3,
                        help="speculative lookup n-gram size")
    parser.add_argument("--no-warmup", action="store_true",
                        help="include XLA compilation in the timed region "
                        "(default: one untimed warmup generate first)")
    args = parser.parse_args(argv)

    tokenizer = Tokenizer(args.tokenizer)
    model = build_model(args)

    # default to the accelerator (the reference makes --cuda opt-in;
    # this is the TPU-native framework, so CPU is the opt-OUT)
    if pdn.cuda.is_available() and not args.no_cuda:
        model = model.to("cuda:0")

    model.eval()
    with pdn.no_grad():
        print(f"\n{args.prompt}", end="")
        input_ids = np.array([tokenizer.encode(args.prompt)])

        _, L = input_ids.shape
        if args.beams > 1:
            if not args.no_warmup and model.device.kind == "accel":
                model.generate_beam(input_ids, args.max_new_tokens,
                                    num_beams=args.beams,
                                    eos_id=tokenizer.eos_id)
            start = time.time()
            toks = model.generate_beam(input_ids, args.max_new_tokens,
                                       num_beams=args.beams,
                                       eos_id=tokenizer.eos_id)
            elapsed = time.time() - start
            print(tokenizer.decode(toks))
            n = L + len(toks)
            print(f"\nToken count: {n}, elapsed: {elapsed:.2f}s, "
                  f"{round(n / elapsed)} tokens/s (beam={args.beams})")
            return n / elapsed
        if args.speculative:
            spec_kw = dict(draft_k=args.draft_k, ngram=args.ngram,
                           temperature=args.temperature or 0.0,
                           top_k=args.top_k, top_p=args.top_p,
                           seed=args.seed)
            if args.dtype == "bfloat16":
                import jax.numpy as jnp
                spec_kw["dtype"] = jnp.bfloat16
            if not args.no_warmup and model.device.kind == "accel":
                model.generate_speculative(input_ids, args.max_new_tokens,
                                           **spec_kw)
            start = time.time()
            toks, stats = model.generate_speculative(
                input_ids, args.max_new_tokens, **spec_kw)
            elapsed = time.time() - start
            out = []
            for t in toks.tolist():
                if t in (tokenizer.eos_id, tokenizer.bos_id):
                    break
                out.append(t)
            print(tokenizer.decode(out))
            n = L + len(out)
            print(f"\nToken count: {n}, elapsed: {elapsed:.2f}s, "
                  f"{round(n / elapsed)} tokens/s "
                  f"({stats['tokens_per_dispatch']:.2f} tokens/dispatch, "
                  f"{stats['accepted_drafts']} drafts accepted)")
            return n / elapsed
        gen_kwargs = {}
        if args.dtype == "bfloat16":
            import jax.numpy as jnp
            gen_kwargs["dtype"] = jnp.bfloat16
        if args.chunk:
            gen_kwargs["chunk"] = args.chunk
        if args.quant:
            gen_kwargs["quant"] = args.quant
        if args.kv_quant:
            gen_kwargs["kv_quant"] = args.kv_quant
        if args.temperature and args.temperature > 0:
            gen_kwargs.update(temperature=args.temperature, seed=args.seed,
                              top_k=args.top_k, top_p=args.top_p,
                              repetition_penalty=args.repetition_penalty)
        if not args.no_warmup and model.device.kind == "accel":
            # compile outside the timed region (the reference's NumPy loop
            # has no compile step; tok/s should measure decode, not XLA)
            for _ in model.generate(input_ids, args.max_new_tokens,
                                    **gen_kwargs):
                pass
        start = time.time()
        for token in model.generate(input_ids, args.max_new_tokens,
                                    **gen_kwargs):
            L += 1
            output_id = token[0].numpy().tolist()
            if output_id[-1] in [tokenizer.eos_id, tokenizer.bos_id]:
                break
            print(tokenizer.decode(output_id), end="")
            sys.stdout.flush()
        elapsed = time.time() - start
        print(f"\n\nToken count: {L}, elapsed: {elapsed:.2f}s, "
              f"{round(L / elapsed)} tokens/s")
        return L / elapsed


if __name__ == "__main__":
    main()
