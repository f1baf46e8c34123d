"""Continuous-batching serving CLI over ``pydynet_tpu``'s LlamaServer.

Extension beyond the reference (its ``infer.py`` decodes one prompt at a
time; /root/reference/llm/llama/infer.py): submit MANY prompts, decode
them in lockstep on the batched whole-token kernel with vLLM-style slot
recycling, and report aggregate throughput.

    python -m llm.llama.serve --prompt "There was a boy" \
        --prompt "Once upon a time" --batch-size 8 --max-new-tokens 256

Per-request sampling: ``--temperature/--top-k/--top-p`` set the server
defaults for every request (0 = greedy).  ``--quant int8[-head]`` halves
the shared weight stream (``int4`` quarters it); ``--kv-quant int8``
halves the KV footprint (mutually exclusive with --quant).
``--prompts-file`` reads one prompt per line; ``--stream`` prints tokens
incrementally as chunks are read back.  ``--lane xla`` forces the
big-dims scan engine (auto-routed for 7B-class models); with it,
``--prefix-cache`` reuses KV rows across requests sharing a prompt
prefix (shared-system-prompt serving).
"""
import argparse
import sys
import time

import numpy as np

from .._cpu import force_cpu_platform_if_requested
force_cpu_platform_if_requested()  # must precede the pydynet_tpu import

import pydynet_tpu as pdn
from .tokenizer import Tokenizer
from .infer import build_model

DEFAULT_PROMPTS = [
    "There was a boy",
    "Once upon a time",
    "The little red hen",
    "One day a dog",
]


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Batch-serve prompts on the continuous-batching "
        "decode server")
    parser.add_argument("--prompt", action="append", default=None,
                        help="repeatable; defaults to a small built-in set")
    parser.add_argument("--prompts-file", type=str, default=None,
                        help="file with one prompt per line (appended to "
                        "any --prompt flags)")
    parser.add_argument("--batch-size", type=int, default=8,
                        help="decode slots (requests in flight)")
    parser.add_argument("--chunk", type=int, default=128,
                        help="decode tokens per device dispatch")
    parser.add_argument("--max-new-tokens", type=int, default=256)
    parser.add_argument("--no-cuda", action="store_true",
                        help="CPU serving (interpret-mode kernels; slow, "
                        "functional)")
    parser.add_argument("--random-init", action="store_true")
    parser.add_argument("--weights", type=str,
                        default="llm/llama/data/stories15M.model.npz")
    parser.add_argument("--tokenizer", type=str,
                        default="llm/llama/data/tokenizer.model.np")
    parser.add_argument("--finetuned", type=str, default=None)
    parser.add_argument("--n-heads", type=int, default=None)
    parser.add_argument("--dtype", choices=["float32", "bfloat16"],
                        default="bfloat16")
    parser.add_argument("--temperature", type=float, default=0.0)
    parser.add_argument("--top-k", type=int, default=None)
    parser.add_argument("--top-p", type=float, default=None)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--quant", choices=["int8-head", "int8", "int4"],
                        default=None)
    parser.add_argument("--kv-quant", choices=["int8"], default=None)
    parser.add_argument("--stream", action="store_true",
                        help="print tokens incrementally as chunks are "
                        "read back (LlamaServer.stream) instead of "
                        "completions at the end")
    parser.add_argument("--lane", choices=["fused", "xla"], default=None,
                        help="decode engine override (default: auto-route "
                        "like generate — fused mega-kernel at small dims, "
                        "XLA scan at 7B-class dims)")
    parser.add_argument("--prefix-cache", action="store_true",
                        help="reuse KV rows across requests sharing a "
                        "prompt prefix (XLA lane; shared-system-prompt "
                        "serving)")
    args = parser.parse_args(argv)

    prompts = list(args.prompt or [])
    if args.prompts_file:
        with open(args.prompts_file) as f:
            prompts += [ln.strip() for ln in f if ln.strip()]
    if not prompts:
        prompts = list(DEFAULT_PROMPTS)

    tokenizer = Tokenizer(args.tokenizer)
    model = build_model(args)
    if pdn.cuda.is_available() and not args.no_cuda:
        model = model.to("cuda:0")
    elif model.device.kind != "accel":
        # CPU lane: Pallas runs in interpret mode only
        import functools

        from pydynet_tpu.ops import decode_step as _dsk
        _dsk.fused_decode_token_batched = functools.partial(
            _dsk.fused_decode_token_batched, interpret=True)

    dtype = None
    if args.dtype == "bfloat16":
        import jax.numpy as jnp
        dtype = jnp.bfloat16

    from pydynet_tpu.models.llama.serve import LlamaServer

    with pdn.no_grad():
        srv = LlamaServer(model, batch_size=args.batch_size,
                          dtype=dtype, chunk=args.chunk,
                          eos_id=tokenizer.eos_id,
                          temperature=args.temperature, top_k=args.top_k,
                          top_p=args.top_p, seed=args.seed,
                          quant=args.quant, kv_quant=args.kv_quant,
                          lane=args.lane,
                          prefix_cache=args.prefix_cache)
        encoded = [tokenizer.encode(p) for p in prompts]
        rids = [srv.submit(ids, max_new_tokens=args.max_new_tokens)
                for ids in encoded]
        t0 = time.time()
        if args.stream:
            for rid, toks in srv.stream():
                out = [t for t in toks
                       if t not in (tokenizer.eos_id, tokenizer.bos_id)]
                if out:
                    print(f"[{rid}] {tokenizer.decode(out)}", flush=True)
            done = srv._finished
        else:
            done = srv.run()
        elapsed = time.time() - t0

    total = 0
    for rid, prompt, ids in zip(rids, prompts, encoded):
        req = done[rid]
        total += len(ids) + len(req.tokens)
        out = []
        for t in req.tokens:
            if t in (tokenizer.eos_id, tokenizer.bos_id):
                break
            out.append(t)
        flag = " [truncated]" if req.truncated else ""
        print(f"--- [{rid}] {prompt}{tokenizer.decode(out)}{flag}")
        sys.stdout.flush()
    print(f"\nRequests: {len(rids)}, total tokens: {total}, "
          f"elapsed: {elapsed:.2f}s, "
          f"{round(total / elapsed)} tokens/s aggregate")
    return total / elapsed


if __name__ == "__main__":
    main()
