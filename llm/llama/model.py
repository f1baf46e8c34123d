"""CLI-parity shim: the Llama model lives in pydynet_tpu.models.llama."""
from pydynet_tpu.models.llama.model import (  # noqa: F401
    Llama, FeedForward, Attention, TransformerBlock, compute_cos_sin_cache,
    apply_rotary_emb)
