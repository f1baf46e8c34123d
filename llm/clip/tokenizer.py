"""CLI-parity shim: the CLIP tokenizer lives in pydynet_tpu.models.clip."""
from pydynet_tpu.models.clip.tokenizer import (  # noqa: F401
    SimpleTokenizer, bytes_to_unicode, get_pairs, basic_clean,
    whitespace_clean, default_bpe)
