"""Checkpoint IO for the Llama path.

Same npz formats and dotted-name conventions as the reference
(/root/reference/llm/llama/io.py): full-model load maps transposed HF-named
arrays (q_proj.weight.T etc., io.py:9-39) onto the (in,out)-layout Linear
weights; finetuned-parameter save/load round-trips ``_parameters`` entries
that require grad (io.py:42-57).
"""
import os

import numpy as np

import pydynet_tpu as pdn

from .model import Llama


def infer_config(model_path: str, max_seq_len: int = 1024,
                 max_batch_size: int = 1, n_heads: int = None) -> dict:
    """Infer the Llama architecture from an HF-named npz's array shapes —
    kwargs for ``Llama(**infer_config(p))``, so any converted checkpoint
    (stories15M, stories110M, TinyLlama-style GQA, ...) loads without
    hand-copied constants.

    Head counts: n_heads and head_dim cannot both be recovered from the
    projection shapes alone (weights carry no per-head structure), so the
    npz is first probed for explicit metadata (``config.n_heads`` /
    ``config.n_kv_heads`` scalar entries, written by converters that keep
    them), then ``n_heads`` (if given, e.g. from the CLI ``--n-heads``
    flag) decides, and only then conventional head_dim candidates are
    tried.  When several candidates divide both the q and kv widths (e.g.
    an MHA checkpoint with dim 4096 fits head_dim 64 AND 128) the choice
    is ambiguous and a ``UserWarning`` names the alternatives.
    """
    with np.load(model_path) as w:
        return _infer_config(w, max_seq_len, max_batch_size, n_heads)


def _infer_config(w, max_seq_len, max_batch_size, n_heads):
    vocab, dim = w["model.embed_tokens.weight"].shape
    n_layers = 0
    while f"model.layers.{n_layers}.self_attn.q_proj.weight" in w.files:
        n_layers += 1
    ffn_dim = w["model.layers.0.mlp.gate_proj.weight"].shape[0]
    kv_rows = w["model.layers.0.self_attn.k_proj.weight"].shape[0]
    import math as _math
    import warnings

    if n_heads is None and "config.n_heads" in w.files:
        n_heads = int(w["config.n_heads"])
    if n_heads is None and "config.n_kv_heads" in w.files:
        # kv metadata alone also pins the split: head_dim = kv_rows / Hkv
        n_kv = int(w["config.n_kv_heads"])
        assert kv_rows % n_kv == 0, (kv_rows, n_kv)
        head_dim = kv_rows // n_kv
        assert dim % head_dim == 0, (dim, head_dim)
        n_heads = dim // head_dim
    if n_heads is not None:
        assert dim % n_heads == 0, (dim, n_heads)
        head_dim = dim // n_heads
        assert kv_rows % head_dim == 0, (kv_rows, head_dim)
    else:
        # stories checkpoints use head_dim 48 (288/6) / 64 (768/12); prefer
        # the conventional sizes that divide both the q and kv widths,
        # falling back to their gcd for exotic dims
        order = (48, 64, 128) if dim < 512 else (64, 128, 48)
        fits = [hd for hd in order
                if dim % hd == 0 and kv_rows % hd == 0]
        head_dim = fits[0] if fits else _math.gcd(dim, kv_rows)
        if len(fits) > 1:
            warnings.warn(
                f"head_dim is ambiguous for dim={dim}, kv_rows={kv_rows}: "
                f"candidates {fits} all fit; assuming head_dim={head_dim} "
                f"(n_heads={dim // head_dim}).  Pass n_heads= (CLI: "
                "--n-heads) if the checkpoint uses another layout — e.g. "
                "Llama-2-7B-class MHA models use head_dim 128.")
    n_heads = dim // head_dim
    n_kv_heads = kv_rows // head_dim
    return dict(vocab_size=vocab, embed_dim=dim, n_heads=n_heads,
                n_kv_heads=n_kv_heads, ffn_dim=ffn_dim, n_layers=n_layers,
                max_seq_len=max_seq_len, max_batch_size=max_batch_size)


@pdn.no_grad()
def load_model(llama: Llama, model_path: str) -> Llama:
    weight = np.load(model_path)  # closed at the end of the function

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
    weight.close()
    llama._weights_cache.clear()
    return llama


@pdn.no_grad()
def save_finetuned_parameters(model: Llama, output_path: str):
    params = {
        name: param.numpy()
        for name, param in model._parameters.items() if param.requires_grad
    }
    # file-object write: bare np.savez appends '.npz' to extensionless
    # paths, breaking save/load round trips through the same path string
    with open(output_path, "wb") as f:
        np.savez(f, **params)


@pdn.no_grad()
def load_finetuned_parameters(model: Llama, finetuned_path: str) -> Llama:
    if not os.path.exists(finetuned_path) \
            and os.path.exists(finetuned_path + ".npz"):
        finetuned_path += ".npz"  # blobs written by np.savez's auto-suffix
    with np.load(finetuned_path) as weights:
        for name, param in model._parameters.items():
            if name in weights:
                param.data = weights[name]
    model._weights_cache.clear()
    return model
