"""CLI-parity shim: CLIP checkpoint IO lives in pydynet_tpu.models.clip."""
from pydynet_tpu.models.clip.io import (  # noqa: F401
    Params, load_model, save_finetuned_parameters,
    load_finetuned_parameters, load_zip, download)
