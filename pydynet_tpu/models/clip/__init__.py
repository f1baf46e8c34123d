from .model import CLIP, build_attention_mask, patch_project
from .tokenizer import SimpleTokenizer
from .data import tokenize, preprocess
from .io import (Params, load_model, save_finetuned_parameters,
                 load_finetuned_parameters)
