"""CLIP projection fine-tuning CLI.

Flag parity with /root/reference/llm/clip/finetune.py; each step is one
compiled forward+backward+Adam XLA program (CLIP.finetune_step).
"""
import os
import argparse

import numpy as np

from .._cpu import force_cpu_platform_if_requested
force_cpu_platform_if_requested()  # must precede the pydynet_tpu import

import pydynet_tpu.optim as optim

from .data import tokenize
from .infer import load_image
from .io import Params, load_model, save_finetuned_parameters
from .model import CLIP

import pydynet_tpu as pdn


def parse_labels(labels: str):
    vals = [x.strip() for x in labels.split(",") if x.strip()]
    if len(vals) < 2:
        raise ValueError(
            "Need at least 2 labels for classification fine-tuning.")
    return vals


def main(argv=None):
    parser = argparse.ArgumentParser(description="Fine-tune CLIP parameters")
    parser.add_argument("--image", type=str, required=True)
    parser.add_argument("--labels", type=str, required=True)
    parser.add_argument("--target", type=int, required=True)
    parser.add_argument("--steps", type=int, default=20)
    parser.add_argument("--lr", type=float, default=1e-5)
    parser.add_argument("--trainable", type=str,
                        default="text_encoder.proj,image_encoder.proj")
    parser.add_argument("--lora", type=int, default=0, metavar="R",
                        help="Train rank-R LoRA adapters instead of full "
                        "matrices (overrides --trainable)")
    parser.add_argument("--lora-alpha", type=float, default=16.0)
    parser.add_argument("--lora-targets", type=str, default="QKV,O",
                        help="Comma-separated Linear attribute names to "
                        "adapt (QKV,O,fc1,fc2,proj)")
    parser.add_argument("--save", type=str,
                        default="llm/clip/data/finetuned_clip_params.npz")
    parser.add_argument("--weights-dir", type=str, default="llm/clip/data")
    parser.add_argument("--random-init", action="store_true")
    parser.add_argument("--clip-norm", type=float, default=None,
                        help="global-norm gradient clipping inside the "
                        "compiled step (nn.utils.clip_grad_norm_)")
    parser.add_argument("--no-cuda", action="store_true",
                        help="Run on the CPU platform")
    args = parser.parse_args(argv)

    labels = parse_labels(args.labels)
    if not 0 <= args.target < len(labels):
        raise ValueError("target index out of range for labels.")

    image = load_image(args.image).numpy()[np.newaxis]
    text = tokenize(labels)
    target = np.array([args.target], dtype=np.int64)

    model = CLIP()
    if not args.random_init:
        try:
            model = load_model(model, Params("ViT-B/32",
                                             download_root=args.weights_dir))
        except FileNotFoundError as e:
            print(f"[clip.finetune] {e}\n-> random-initialized weights")
    if pdn.cuda.is_available() and not args.no_cuda:
        model = model.to("cuda:0")

    if args.lora > 0:
        targets = tuple(t.strip() for t in args.lora_targets.split(",")
                        if t.strip())
        trainable_count, frozen_count = model.add_lora(
            r=args.lora, alpha=args.lora_alpha, targets=targets)
    else:
        prefixes = tuple(p.strip() for p in args.trainable.split(",")
                         if p.strip())
        trainable_count, frozen_count = model.set_trainable_parameters(
            prefixes)
    print(f"Trainable params: {trainable_count}, "
          f"Frozen params: {frozen_count}")

    optimizer = optim.Adam(model.parameters(), lr=args.lr)
    for step in range(1, args.steps + 1):
        loss = model.finetune_step(image, text, target, optimizer,
                                   clip_norm=args.clip_norm)
        if step == 1 or step % 5 == 0 or step == args.steps:
            print(f"step={step:04d}, loss={loss:.6f}")

    # the default save dir (llm/clip/data) is not checked in — create it
    # rather than lose all the training work to a FileNotFoundError
    save_dir = os.path.dirname(args.save)
    if save_dir:
        os.makedirs(save_dir, exist_ok=True)
    save_finetuned_parameters(model, args.save)
    print(f"Saved finetuned params to {args.save}")


if __name__ == "__main__":
    main()
