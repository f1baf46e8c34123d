"""CLI-parity shim: checkpoint IO lives in pydynet_tpu.models.llama."""
from pydynet_tpu.models.llama.io import (  # noqa: F401
    load_model, save_finetuned_parameters, load_finetuned_parameters,
    infer_config)
