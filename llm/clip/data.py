"""CLI-parity shim: CLIP data pipelines live in pydynet_tpu.models.clip."""
from pydynet_tpu.models.clip.data import (  # noqa: F401
    tokenize, preprocess, preprocess_array)
