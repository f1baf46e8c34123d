"""CLI-parity shim: the CLIP model lives in pydynet_tpu.models.clip."""
from pydynet_tpu.models.clip.model import (  # noqa: F401
    CLIP, ImageEncoder, TextEncoder, Transformer, MultiHeadAttention, MLP,
    CLIPLayerNorm, build_attention_mask, patch_project)
