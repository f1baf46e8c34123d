"""CLIP zero-shot inference CLI.

Flag parity with /root/reference/llm/clip/infer.py (--image --labels
--finetuned); the whole forward (both encoders + similarity + softmax) runs
as one compiled XLA program.  Extras: --random-init (offline sandboxes) and
a synthetic image when the file is missing.
"""
import argparse
import os
import time

import numpy as np

from .._cpu import force_cpu_platform_if_requested
force_cpu_platform_if_requested()  # must precede the pydynet_tpu import

import pydynet_tpu as pdn
import pydynet_tpu.nn.functional as F

from .data import preprocess, tokenize
from .io import Params, load_finetuned_parameters, load_model
from .model import CLIP


def load_image(path: str):
    if os.path.exists(path):
        from PIL import Image
        return preprocess(Image.open(path))
    print(f"[clip.infer] image {path!r} not found -> synthetic image")
    rng = np.random.default_rng(0)
    from .data import preprocess_array
    return preprocess_array(rng.uniform(0, 1, (256, 256, 3)))


def main(argv=None):
    parser = argparse.ArgumentParser(description="CLIP image-text inference")
    parser.add_argument("--image", type=str, default="llm/clip/picture.png")
    parser.add_argument("--labels", type=str, default="a fish,a dog,a cat")
    parser.add_argument("--finetuned", type=str, default=None)
    parser.add_argument("--weights-dir", type=str, default="llm/clip/data")
    parser.add_argument("--random-init", action="store_true")
    parser.add_argument("--no-cuda", action="store_true",
                        help="Run on the CPU platform")
    args = parser.parse_args(argv)

    labels = [x.strip() for x in args.labels.split(",") if x.strip()]

    image = pdn.Tensor(load_image(args.image).numpy()[np.newaxis])
    text = tokenize(labels)

    clip = CLIP()
    if not args.random_init:
        try:
            clip = load_model(clip, Params("ViT-B/32",
                                           download_root=args.weights_dir))
        except FileNotFoundError as e:
            print(f"[clip.infer] {e}\n-> random-initialized weights")
    if args.finetuned is not None:
        clip = load_finetuned_parameters(clip, args.finetuned)
    if pdn.cuda.is_available() and not args.no_cuda:
        clip = clip.to("cuda:0")

    clip.eval()

    @pdn.jit(state=(clip,))
    def zero_shot(img, txt):
        logits_per_image = clip(img, txt)
        return F.softmax(logits_per_image, axis=-1)

    with pdn.no_grad():
        t0 = time.time()
        probs = zero_shot(image, pdn.Tensor(text))
        out = probs.numpy()[0]
        elapsed = time.time() - t0
        print("Labels:", labels)
        print("Label probs:", out)
        print(f"(compile+run {elapsed:.2f}s)")
    return out


if __name__ == "__main__":
    main()
