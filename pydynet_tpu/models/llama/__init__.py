from .model import Llama, compute_cos_sin_cache, apply_rotary_emb
from .tokenizer import Tokenizer
from .io import (load_model, save_finetuned_parameters,
                 load_finetuned_parameters)
