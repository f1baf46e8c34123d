"""CLIP input pipelines: text tokenization to (N, 77) int64 and the
bicubic-resize / center-crop / CLIP-normalize image preprocess
(parity with /root/reference/llm/clip/data.py:8-51)."""
from __future__ import annotations

import numpy as np

from ...core.tensor import Tensor
from .tokenizer import SimpleTokenizer

CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], dtype=np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], dtype=np.float32)


def tokenize(texts, context_length: int = 77, tokenizer=None) -> np.ndarray:
    if tokenizer is None:
        tokenizer = SimpleTokenizer()
    sot = tokenizer.encoder["<|startoftext|>"]
    eot = tokenizer.encoder["<|endoftext|>"]
    all_tokens = [[sot] + tokenizer.encode(t) + [eot] for t in texts]

    result = np.zeros((len(all_tokens), context_length), dtype=np.int64)
    for i, tokens in enumerate(all_tokens):
        if len(tokens) > context_length:
            raise RuntimeError(f"Input {texts[i]} is too long for context "
                               f"length {context_length}")
        result[i, :len(tokens)] = tokens
    return result


def preprocess(image, image_size: int = 224) -> Tensor:
    """PIL image -> CHW float32 Tensor, CLIP-normalized."""
    from PIL import Image

    width, height = image.size
    scale = image_size / min(width, height)
    width, height = int(scale * width), int(scale * height)
    resample = (Image.Resampling.BICUBIC
                if hasattr(Image, "Resampling") else Image.BICUBIC)
    image = image.resize((width, height), resample)

    x0 = round((width - image_size) / 2)
    y0 = round((height - image_size) / 2)
    image = image.crop((x0, y0, x0 + image_size,
                        y0 + image_size)).convert("RGB")

    x = np.array(image, dtype=np.float32) / 255.0
    x = (x - CLIP_MEAN) / CLIP_STD
    return Tensor(x.transpose(2, 0, 1))


def preprocess_array(x: np.ndarray, image_size: int = 224) -> Tensor:
    """Array variant for offline tests: (H, W, 3) float in [0,1] -> Tensor."""
    h, w = x.shape[:2]
    y0, x0 = (h - image_size) // 2, (w - image_size) // 2
    x = x[y0:y0 + image_size, x0:x0 + image_size].astype(np.float32)
    x = (x - CLIP_MEAN) / CLIP_STD
    return Tensor(x.transpose(2, 0, 1))
