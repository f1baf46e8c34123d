"""CLIP ViT-B/32: image/text dual encoder for zero-shot classification and
projection fine-tuning.

API and module-tree parity with /root/reference/llm/clip/model.py (same
dotted parameter names, so the ViT-B/32 .pt mapping and finetuned-npz
formats round-trip), rebuilt TPU-first:

* ``patch_project`` — the 32x32 patchify-then-project conv-as-matmul
  (reference model.py:17-32) is ONE tape node: reshape/transpose/matmul all
  inside a single jax.vjp composite, so fwd+bwd are fused XLA programs on
  the MXU.
* ``MultiHeadAttention`` uses the fused-QKV projection plus a single-node
  scaled-dot-product attention (XLA fuses the softmax; for long sequences
  the Pallas flash kernel in ops/flash_attention.py takes over).
* Zero-shot inference and finetune steps compile end-to-end through
  ``pydynet_tpu.jit`` (see llm/clip/infer.py).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

import pydynet_tpu as pdn
from ...core.tensor import Tensor, wrap_pure
from ... import nn
import pydynet_tpu.nn.functional as F


def build_attention_mask(context_length: int) -> Tensor:
    mask = np.triu(np.full((context_length, context_length), -np.inf,
                           dtype=np.float32), 1)
    return Tensor(mask, dtype=np.float32)


def patch_project(x: Tensor, kernel: Tensor) -> Tensor:
    """Patchify NCHW images into (ph x pw) tiles and project: one fused node.

    x: (N, C, H, W); kernel: (d, C, ph, pw) -> (N, (H/ph)*(W/pw), d).
    """
    def pure(xd, kd):
        n, c, h, w = xd.shape
        d, pc, ph, pw = kd.shape
        gh, gw = h // ph, w // pw
        W = kd.transpose(1, 2, 3, 0).reshape(pc * ph * pw, d)
        patches = xd.reshape(n, c, gh, ph, gw, pw).transpose(
            0, 2, 4, 1, 3, 5).reshape(n, gh * gw, pc * ph * pw)
        return patches @ W

    return wrap_pure(pure, x, kernel)


def _sdpa_node(xq: Tensor, xk: Tensor, xv: Tensor, mask, scale):
    """Single-node attention over (B, L, H, hd) operands."""
    if mask is not None:
        def pure(q, k, v, m):
            s = jnp.einsum("blhd,bmhd->bhlm", q, k) * scale + m
            return jnp.einsum("bhlm,bmhd->blhd",
                              jax.nn.softmax(s, axis=-1), v)
        return wrap_pure(pure, xq, xk, xv, mask)

    def pure(q, k, v):
        s = jnp.einsum("blhd,bmhd->bhlm", q, k) * scale
        return jnp.einsum("bhlm,bmhd->blhd", jax.nn.softmax(s, axis=-1), v)

    return wrap_pure(pure, xq, xk, xv)


class MultiHeadAttention(nn.Module):
    """Fused-QKV MHA (reference model.py:35-63)."""

    def __init__(self, n_dim: int, n_heads: int):
        super().__init__()
        self.n_dim = n_dim
        self.n_heads = n_heads
        self.head_dim = n_dim // n_heads
        self.QKV = nn.Linear(n_dim, n_dim * 3, dtype=np.float32)
        self.O = nn.Linear(n_dim, n_dim, dtype=np.float32)

    def forward(self, x, mask):
        B, L, _ = x.shape
        xq, xk, xv = pdn.split(self.QKV(x), 3, -1)
        shape = (B, L, self.n_heads, self.head_dim)
        out = _sdpa_node(xq.reshape(shape), xk.reshape(shape),
                         xv.reshape(shape), mask,
                         1.0 / math.sqrt(self.head_dim))
        return self.O(out.reshape(B, L, -1))


class CLIPLayerNorm(nn.LayerNorm):
    """Standard last-axis LayerNorm with scale/shift (overrides the
    reference-style leading-axes LayerNorm; reference model.py:66-80)."""

    def __init__(self, normalized_shape, eps=1e-6, momentum=0.1, device=None,
                 dtype=None):
        super().__init__(normalized_shape, eps, momentum, device, dtype)

    def forward(self, x):
        mean = x.mean(axis=-1, keepdims=True)
        var = pdn.square(x - mean).mean(axis=-1, keepdims=True)
        return (x - mean) / pdn.sqrt(var + self.eps) * self.scale + self.shift


class MLP(nn.Module):
    """GELU-approx MLP, x * sigmoid(1.702 x) (reference model.py:83-95)."""

    def __init__(self, d_in: int, d_proj: int):
        super().__init__()
        self.d_in = d_in
        self.d_proj = d_proj
        self.fc1 = nn.Linear(d_in, d_proj, dtype=np.float32)
        self.fc2 = nn.Linear(d_proj, d_in, dtype=np.float32)

    def forward(self, x):
        return self.fc2(F.gelu(self.fc1(x)))


class Transformer(nn.Module):
    """Pre-norm residual block (reference model.py:98-110)."""

    def __init__(self, n_dim: int, n_head: int, mlp_dim: int):
        super().__init__()
        self.mha = MultiHeadAttention(n_dim, n_head)
        self.mlp = MLP(n_dim, mlp_dim)
        self.layer_norm1 = CLIPLayerNorm((n_dim,), eps=1e-5, dtype=np.float32)
        self.layer_norm2 = CLIPLayerNorm((n_dim,), eps=1e-5, dtype=np.float32)

    def forward(self, x, mask):
        x = x + self.mha(self.layer_norm1(x), mask)
        return x + self.mlp(self.layer_norm2(x))


class ImageEncoder(nn.Module):
    """ViT: patchify + CLS token + pos-emb + transformer stack + CLS proj
    (reference model.py:113-137)."""

    def __init__(self, n_dim, n_head, mlp_dim, kernel_size, n_layer,
                 final_dim):
        super().__init__()
        self.kernel = nn.Parameter(
            pdn.randn(n_dim, 3, kernel_size, kernel_size, dtype=np.float32))
        self.pre_norm = CLIPLayerNorm((n_dim,), 1e-5, dtype=np.float32)
        self.transformers = nn.ModuleList(
            [Transformer(n_dim, n_head, mlp_dim) for _ in range(n_layer)])
        self.post_norm = CLIPLayerNorm((n_dim,), 1e-5, dtype=np.float32)
        self.proj = nn.Linear(n_dim, final_dim, bias=False, dtype=np.float32)

    def forward(self, x, class_emb, position_emb):
        x = patch_project(x, self.kernel)

        def with_cls_and_pos(xd, ce, pe):
            cls = jnp.broadcast_to(ce, (xd.shape[0], 1, ce.shape[-1]))
            return jnp.concatenate([cls, xd], axis=-2) + pe

        x = wrap_pure(with_cls_and_pos, x, class_emb, position_emb)
        x = self.pre_norm(x)
        for block in self.transformers:
            x = block(x, None)
        x = self.post_norm(x[:, 0])
        return self.proj(x)


class TextEncoder(nn.Module):
    """Causal text transformer with argmax-EOT pooling (reference
    model.py:140-160)."""

    def __init__(self, n_dim, n_head, mlp_dim, n_layer, final_dim,
                 vocab_size):
        super().__init__()
        self.token_embed = nn.Embedding(vocab_size, n_dim, dtype=np.float32)
        self.transformers = nn.ModuleList(
            [Transformer(n_dim, n_head, mlp_dim) for _ in range(n_layer)])
        self.post_norm = CLIPLayerNorm((n_dim,), 1e-5, dtype=np.float32)
        self.proj = nn.Linear(n_dim, final_dim, bias=False, dtype=np.float32)
        self._mask_cache = {}  # (length, device) -> constant causal mask

    def forward(self, idx, position_emb):
        if not isinstance(idx, Tensor):
            # place ids on the model's device like CLIP.forward does for
            # img — a CPU-committed idx gathering TPU-committed embeddings
            # raises 'incompatible devices' in eager mode
            idx = Tensor(np.asarray(idx), device=self.device)
        x = self.token_embed(idx) + position_emb
        # cache the constant causal mask per (length, device) — like
        # Llama's RoPE tables — instead of a host triu + transfer per call
        key = (x.shape[1], x.device)
        mask = self._mask_cache.get(key)
        if mask is None:
            mask = build_attention_mask(x.shape[1]).to(x.device)
            self._mask_cache[key] = mask
        for block in self.transformers:
            x = block(x, mask)
        x = self.post_norm(x)
        # pool the EOT position (argmax of ids = highest id = eot)
        eot = idx.argmax(-1)
        pooled = x[range(x.shape[0]), eot]
        return self.proj(pooled)


class CLIP(nn.Module):

    def __init__(self, image_dim: int = 768, image_heads: int = 12,
                 image_mlp_dim: int = 3072, image_patch: int = 32,
                 image_layers: int = 12, text_dim: int = 512,
                 text_heads: int = 8, text_mlp_dim: int = 2048,
                 text_layers: int = 12, final_dim: int = 512,
                 vocab_size: int = 49408, vision_tokens: int = 50,
                 text_tokens: int = 77):
        super().__init__()
        self.class_embed = nn.Parameter(
            pdn.randn(1, 1, image_dim, dtype=np.float32))
        self.v_pos_emb = nn.Parameter(
            pdn.randn(vision_tokens, image_dim, dtype=np.float32))
        self.t_pos_emb = nn.Parameter(
            pdn.randn(text_tokens, text_dim, dtype=np.float32))
        self.image_encoder = ImageEncoder(image_dim, image_heads,
                                          image_mlp_dim, image_patch,
                                          image_layers, final_dim)
        self.text_encoder = TextEncoder(text_dim, text_heads, text_mlp_dim,
                                        text_layers, final_dim, vocab_size)
        self.scale = 1
        self._ft_step = None
        self._ft_opt = None

    def forward(self, img, idx):
        if not isinstance(img, Tensor):
            img = Tensor(np.asarray(img), device=self.device)
        img_feature = self.image_encoder(img, self.class_embed,
                                         self.v_pos_emb)
        txt_feature = self.text_encoder(idx, self.t_pos_emb)

        norm_img = pdn.sqrt(
            pdn.square(img_feature).sum(1, keepdims=True) + 1e-12)
        norm_txt = pdn.sqrt(
            pdn.square(txt_feature).sum(1, keepdims=True) + 1e-12)
        img_feature = img_feature / norm_img
        txt_feature = txt_feature / norm_txt
        return self.scale * img_feature @ txt_feature.T

    def add_lora(self, r: int = 8, alpha: float = 16.0,
                 targets=("QKV", "O"), dropout: float = 0.0):
        """Attach rank-``r`` LoRA adapters to every Linear whose attribute
        name is in ``targets`` (``QKV``/``O`` attention, ``fc1``/``fc2``
        MLP, ``proj`` heads) across both encoders, freezing all base
        parameters.  Returns ``(trainable_count, frozen_count)``.
        Extension beyond the reference (prefix freezing only,
        /root/reference/llm/clip/model.py:207-218); the jitted
        finetune/forward steps trace the adapter term directly."""
        from ...nn.modules.lora import apply_lora
        wrapped = apply_lora(self, r=r, alpha=alpha, targets=targets,
                             dropout=dropout, freeze=True)
        assert wrapped, f"no Linear matched targets={targets!r}"
        self._ft_step = self._ft_opt = None  # state tensors changed
        trainable = sum(1 for p in self._parameters.values()
                        if p.requires_grad)
        return trainable, len(self._parameters) - trainable

    def merge_lora(self):
        """Fold every adapter into its base weight (plain Linears again)."""
        from ...nn.modules.lora import merge_lora
        merged = merge_lora(self)
        self._ft_step = self._ft_opt = None
        return merged

    def set_trainable_parameters(self,
                                 trainable_prefixes=("text_encoder",)):
        trainable_count, frozen_count = 0, 0
        for name, param in self._parameters.items():
            is_trainable = any(
                name.startswith(prefix) for prefix in trainable_prefixes)
            param.requires_grad = is_trainable
            if is_trainable:
                trainable_count += 1
            else:
                frozen_count += 1
        return trainable_count, frozen_count

    def finetune_step(self, image, text_tokens, target_ids, optimizer,
                      criterion=None, clip_norm=None):
        """One compiled fine-tune step (reference model.py:219-243).
        ``clip_norm`` applies global-norm gradient clipping
        (nn.utils.clip_grad_norm_) inside the compiled step."""
        # recompile when the optimizer, criterion OR clip_norm changes
        # (all live in the closure); builtin Loss modules key by (type,
        # reduction) so a fresh instance per call doesn't recompile every
        # step
        from ...nn.modules.loss import criterion_cache_key

        key = (optimizer, criterion_cache_key(criterion), clip_norm)
        if criterion is None:
            criterion = nn.CrossEntropyLoss()
        self.train(True)

        if self._ft_step is None or self._ft_opt != key:
            def inner(img, txt, tgt):
                optimizer.zero_grad()
                logits = self(img, txt)
                loss = criterion(logits, tgt)
                loss.backward()
                if clip_norm is not None:
                    nn.utils.clip_grad_norm_(optimizer.params, clip_norm)
                optimizer.step()
                return loss

            self._ft_step = pdn.jit(inner, state=(self, optimizer))
            self._ft_opt = key

        img = Tensor(np.asarray(image), device=self.device) \
            if not isinstance(image, Tensor) else image
        txt = Tensor(np.asarray(text_tokens), device=self.device) \
            if not isinstance(text_tokens, Tensor) else text_tokens
        tgt = Tensor(np.asarray(target_ids).reshape(-1), dtype=np.int64,
                     device=self.device)
        return self._ft_step(img, txt, tgt).item()
