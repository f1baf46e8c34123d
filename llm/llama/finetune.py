"""Llama fine-tuning CLI.

Flag parity with /root/reference/llm/llama/finetune.py (--text --steps --lr
--trainable --save); each step is one compiled XLA program (see
Llama.finetune_step).  Falls back to random-init weights offline.
"""
import argparse
import os
import time

import numpy as np

from .._cpu import force_cpu_platform_if_requested
force_cpu_platform_if_requested()  # must precede the pydynet_tpu import

import pydynet_tpu as pdn
import pydynet_tpu.optim as optim

from .io import load_model, save_finetuned_parameters
from .model import Llama
from .tokenizer import Tokenizer
from .infer import (DIM, N_LAYERS, N_HEADS, VOCAB_SIZE, MAX_SEQ_LEN,
                    MAX_BATCH, FFN_DIM)


def build_causal_training_pair(tokenizer: Tokenizer, text: str,
                               max_seq_len: int):
    """Shifted (input, target) pair (reference finetune.py:14-26)."""
    token_ids = tokenizer.encode(text, add_bos=True, add_eos=True)
    token_ids = token_ids[:max_seq_len + 1]
    if len(token_ids) < 2:
        raise ValueError("Training text is too short after tokenization.")
    input_ids = np.array([token_ids[:-1]], dtype=np.int64)
    target_ids = np.array([token_ids[1:]], dtype=np.int64)
    return input_ids, target_ids


def main(argv=None):
    parser = argparse.ArgumentParser(description="Fine-tune Llama parameters")
    parser.add_argument("--text", type=str, required=True)
    parser.add_argument("--steps", type=int, default=30)
    parser.add_argument("--lr", type=float, default=1e-4)
    parser.add_argument("--cuda", action="store_true",
                        help="(reference parity; the accelerator is already "
                        "the default — use --no-cuda to opt out)")
    parser.add_argument("--no-cuda", action="store_true",
                        help="Run on the CPU platform")
    parser.add_argument("--trainable", type=str, default="lm_head",
                        help="Comma-separated parameter name prefixes")
    parser.add_argument("--lora", type=int, default=0, metavar="R",
                        help="Train rank-R LoRA adapters instead of full "
                        "matrices (overrides --trainable)")
    parser.add_argument("--lora-alpha", type=float, default=16.0)
    parser.add_argument("--lora-targets", type=str, default="Q,V",
                        help="Comma-separated Linear attribute names to "
                        "adapt (Q,K,V,O,gate,up,down,lm_head)")
    parser.add_argument("--lora-dropout", type=float, default=0.0)
    parser.add_argument("--save", type=str,
                        default="llm/llama/data/finetuned_params.npz")
    parser.add_argument("--weights", type=str,
                        default="llm/llama/data/stories15M.model.npz")
    parser.add_argument("--tokenizer", type=str,
                        default="llm/llama/data/tokenizer.model.np")
    parser.add_argument("--random-init", action="store_true")
    parser.add_argument("--clip-norm", type=float, default=None,
                        help="global-norm gradient clipping inside the "
                        "compiled step (nn.utils.clip_grad_norm_)")
    args = parser.parse_args(argv)

    tokenizer = Tokenizer(args.tokenizer)
    model = Llama(VOCAB_SIZE, DIM, N_HEADS, FFN_DIM, MAX_SEQ_LEN, MAX_BATCH,
                  N_LAYERS, dtype=np.float32)
    if os.path.exists(args.weights) and not args.random_init:
        model = load_model(model, args.weights)
    else:
        print(f"[finetune] checkpoint {args.weights!r} not found -> "
              "random-initialized weights")

    if pdn.cuda.is_available() and not args.no_cuda:
        model = model.to("cuda:0")

    if args.lora > 0:
        targets = tuple(t.strip() for t in args.lora_targets.split(",")
                        if t.strip())
        trainable_count, frozen_count = model.add_lora(
            r=args.lora, alpha=args.lora_alpha, targets=targets,
            dropout=args.lora_dropout)
    else:
        prefixes = tuple(p.strip() for p in args.trainable.split(",")
                         if p.strip())
        trainable_count, frozen_count = model.set_trainable_parameters(
            prefixes)
    print(f"Trainable params: {trainable_count}, Frozen params: {frozen_count}")

    optimizer = optim.Adam(model.parameters(), lr=args.lr)
    input_ids, target_ids = build_causal_training_pair(tokenizer, args.text,
                                                       MAX_SEQ_LEN)

    # Print boundaries match the reference loop (step 1, every 5th, last);
    # the steps BETWEEN prints run as one compiled chunk (jit.foreach), so
    # a remote/tunneled device pays dispatch latency per print, not per step.
    boundaries = sorted({s for s in range(1, args.steps + 1)
                         if s == 1 or s % 5 == 0 or s == args.steps})
    start = time.time()
    done = 0
    for b in boundaries:
        n = b - done
        losses = model.finetune_steps(input_ids, target_ids, optimizer, n,
                                      clip_norm=args.clip_norm)
        done = b
        print(f"step={done:04d}, loss={float(losses[n - 1].item()):.6f}")

    elapsed = time.time() - start
    os.makedirs(os.path.dirname(args.save) or ".", exist_ok=True)
    save_finetuned_parameters(model, args.save)
    print(f"Saved finetuned params to {args.save}")
    print(f"Elapsed: {elapsed:.2f}s ({args.steps / elapsed:.2f} steps/s)")


if __name__ == "__main__":
    main()
