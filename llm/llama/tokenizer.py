"""CLI-parity shim: tokenizer lives in pydynet_tpu.models.llama."""
from pydynet_tpu.models.llama.tokenizer import Tokenizer  # noqa: F401
