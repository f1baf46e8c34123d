"""Pallas TPU kernels for the hot paths.

The reference gets its "native" speed implicitly from NumPy/CuPy
(SURVEY.md §2.5); here the equivalents are hand-written TPU kernels:

- ``decode_step``: whole-model fused Llama decode step (single-token and
  batched; optional weight-only int8)
- ``flash_attention``: blockwise-softmax attention for training/prefill
- ``quant``: per-output-channel int8 weight quantization for decode
"""
from . import decode_step
from . import flash_attention
from . import batchnorm
from . import quant
