"""Pallas TPU kernels for the hot paths.

The reference gets its "native" speed implicitly from NumPy/CuPy
(SURVEY.md §2.5); here the equivalents are hand-written TPU kernels:

- ``decode_step``: whole-model fused single-token Llama decode step
- ``flash_attention``: blockwise-softmax attention for training/prefill
"""
from . import decode_step
from . import flash_attention
from . import batchnorm
