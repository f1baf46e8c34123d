"""Checkpoint IO for the Llama path.

Same npz formats and dotted-name conventions as the reference
(/root/reference/llm/llama/io.py): full-model load maps transposed HF-named
arrays (q_proj.weight.T etc., io.py:9-39) onto the (in,out)-layout Linear
weights; finetuned-parameter save/load round-trips ``_parameters`` entries
that require grad (io.py:42-57).
"""
import numpy as np

import pydynet_tpu as pdn

from .model import Llama


@pdn.no_grad()
def load_model(llama: Llama, model_path: str) -> Llama:
    weight = np.load(model_path)

    def put(name, value):
        llama._parameters[name].data = np.ascontiguousarray(value)

    put("tok_embedding.weight", weight["model.embed_tokens.weight"])
    put("lm_head.weight", weight["lm_head.weight"].T)

    hf = "model.layers.{}.{}"
    per_layer = [
        ("attention.Q.weight", "self_attn.q_proj.weight", True),
        ("attention.K.weight", "self_attn.k_proj.weight", True),
        ("attention.V.weight", "self_attn.v_proj.weight", True),
        ("attention.O.weight", "self_attn.o_proj.weight", True),
        ("ffn.up.weight", "mlp.up_proj.weight", True),
        ("ffn.gate.weight", "mlp.gate_proj.weight", True),
        ("ffn.down.weight", "mlp.down_proj.weight", True),
        ("input_norm.weight", "input_layernorm.weight", False),
        ("post_attn_norm.weight", "post_attention_layernorm.weight", False),
    ]
    for i in range(llama.n_layers):
        for ours, theirs, transpose in per_layer:
            value = weight[hf.format(i, theirs)]
            put(f"layers.{i}.{ours}", value.T if transpose else value)

    put("norm.weight", weight["model.norm.weight"])
    llama._weights_cache.clear()
    return llama


@pdn.no_grad()
def save_finetuned_parameters(model: Llama, output_path: str):
    params = {
        name: param.numpy()
        for name, param in model._parameters.items() if param.requires_grad
    }
    np.savez(output_path, **params)


@pdn.no_grad()
def load_finetuned_parameters(model: Llama, finetuned_path: str) -> Llama:
    weights = np.load(finetuned_path)
    for name, param in model._parameters.items():
        if name in weights:
            param.data = weights[name]
    model._weights_cache.clear()
    return model
