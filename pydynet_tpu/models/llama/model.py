"""Llama (stories15M-class): 6-layer decoder with RoPE, KV-cache, greedy
generate, and lm_head finetuning.

API parity with /root/reference/llm/llama/model.py (same constructor, module
tree / dotted parameter names, ``forward(input_ids, start_pos)`` returning
last-position logits, ``forward_logits`` for finetuning,
``set_trainable_parameters`` prefix freezing, ``finetune_step``, and a
``generate`` Python generator yielding greedy token ids).

TPU-native execution — this is the north-star benchmark path
(BASELINE.md: >=5,000 tok/s/chip vs the reference's 300 tok/s NumPy loop):

* The reference decodes one token per Python forward, re-running 6 layers of
  eager NumPy per step (model.py:258-269).  Here ``generate`` runs a
  **compiled ``lax.scan`` decode loop**: CHUNK tokens per device dispatch,
  KV-cache threaded functionally through the carry with
  ``lax.dynamic_update_slice`` (static shapes — zero recompiles across
  positions), argmax sampling on-chip.  The host only feeds chunks and
  checks for EOS.
* Prefill is a second jitted function (one compile per prompt length).
* Attention over the cache uses a position-masked full-length (max_seq)
  einsum — static shape, fused by XLA onto the MXU.
* The eager/finetune path keeps the reference's KV-cache-as-Parameters
  in-place semantics (model.py:86-110) so the module is drop-in; finetuning
  compiles the whole step via ``pydynet_tpu.jit``.
"""
from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

import pydynet_tpu as pdn
from ...core.tensor import Tensor
from ...device import Device
from ... import nn
from ...nn import functional as F

# tokens generated per device dispatch; large because the remote-TPU tunnel
# charges ~30ms per device->host readback, which the async-copy pipeline can
# only hide under a chunk's worth of compute
DECODE_CHUNK = 512


# ===================================================================== #
#                         rotary embeddings                              #
# ===================================================================== #
def compute_cos_sin_cache(head_dim: int, max_seq_len: int, base: int = 10000,
                          dtype=None):
    """Interleaved-pair RoPE caches, shape (max_seq, head_dim//2)
    (reference llama/model.py:11-20)."""
    inv_freq = 1.0 / (base**(np.arange(0, head_dim, 2)[:head_dim // 2] /
                             head_dim))
    freqs = np.outer(np.arange(max_seq_len), inv_freq).astype(dtype)
    return Tensor(np.cos(freqs)), Tensor(np.sin(freqs))


def _rope_pure(x, cos, sin):
    """Rotate interleaved (real, imag) feature pairs; pure-jnp.

    x: (..., n_heads, head_dim); cos/sin: (L, head_dim//2) broadcast over
    heads (reference model.py:23-44 semantics)."""
    xr = x[..., 0::2]
    xi = x[..., 1::2]
    cos = cos[..., None, :]  # (L, 1, hd/2) -> broadcast over heads
    sin = sin[..., None, :]
    out_r = xr * cos - xi * sin
    out_i = xr * sin + xi * cos
    return jnp.stack([out_r, out_i], axis=-1).reshape(x.shape)


def apply_rotary_emb(xq: Tensor, xk: Tensor, freqs_cos, freqs_sin):
    """Tensor-level RoPE (one tape node per operand)."""
    cos, sin = freqs_cos, freqs_sin
    q = pdn.wrap_pure(lambda a, c, s: _rope_pure(a, c, s), xq, cos, sin)
    k = pdn.wrap_pure(lambda a, c, s: _rope_pure(a, c, s), xk, cos, sin)
    return q, k


# ===================================================================== #
#                         module-tree model                              #
# ===================================================================== #
def _radix_cutoff(logits, weight, thresh, strict):
    """Exact per-row threshold select without a sort.

    Returns the largest value ``c`` present in each (B, V) f32 ``logits``
    row such that ``sum(weight * (logits >= c)) >= thresh`` (``> thresh``
    when ``strict``), or -inf when no value qualifies (keep-everything).
    With ``weight=1`` and ``thresh=k`` this is the k-th-largest value
    (lax.top_k's vals[k-1], duplicates counted); with ``weight=probs``
    and ``thresh=top_p`` (strict) it is the nucleus cutoff — the value of
    the last token of the smallest top-p prefix, ties kept.

    Implementation: 4-bit-at-a-time radix descent over the monotone
    uint32 keys of the f32 bit patterns — 8 rounds of 16 fused
    compare+reduce passes over the row, no sort, no (V,) gather.  On the
    TPU decode path this replaces ``lax.top_k``, whose sort costs ~230 us
    per step at V=32k inside the fused decode scan (measured; the radix
    form is pure VPU compare/reduce work that XLA fuses and overlaps)."""
    bits = jax.lax.bitcast_convert_type(logits.astype(jnp.float32),
                                        jnp.uint32)
    keys = jnp.where(bits >> 31 == 0, bits | jnp.uint32(0x80000000),
                     ~bits)                              # (B, V) monotone
    B = logits.shape[0]
    base = jnp.zeros((B, 1), jnp.uint32)
    nib = jnp.arange(16, dtype=jnp.uint32)
    for shift in range(28, -1, -4):
        cand = base | (nib << shift)                     # (B, 16)
        mass = jnp.sum(jnp.where(keys[:, :, None] >= cand[:, None, :],
                                 weight[:, :, None], 0.0), axis=1)
        ok = mass > thresh if strict else mass >= thresh  # non-inc. in j
        # largest qualifying nibble; none -> stay (keep-all, see below)
        j = jnp.maximum(jnp.sum(ok.astype(jnp.int32), axis=1) - 1, 0)
        base = jnp.take_along_axis(cand, j[:, None], axis=1)
    fmass = jnp.sum(jnp.where(keys >= base, weight, 0.0), axis=1,
                    keepdims=True)
    val = jax.lax.bitcast_convert_type(
        jnp.where(base >> 31 != 0, base & jnp.uint32(0x7FFFFFFF), ~base),
        jnp.float32)
    dead = fmass <= thresh if strict else fmass < thresh
    return jnp.where(dead, -jnp.inf, val)                # (B, 1)


def sample_logits(logits, key, temperature, top_k=None, top_p=None,
                  seen=None, repetition_penalty=None):
    """Sample next-token ids from (B, V) f32 logits (pure jnp, trace-safe).

    The reference decodes greedily only (model.py:258-269); this is the
    serving-side extension: optional repetition penalty over already-seen
    tokens (``seen`` (B, V) bool, HF convention: positive logits divided
    by the penalty, negative multiplied), temperature scaling, then
    optional top-k and/or nucleus (top-p) filtering, then a Gumbel draw
    via ``jax.random.categorical``.  ``top_k``/``top_p`` are trace-time
    constants; the always-kept best token makes top_p=0 equal greedy.
    """
    logits = filter_logits(logits, temperature, top_k, top_p, seen,
                           repetition_penalty)
    return jax.random.categorical(key, logits, axis=-1)


def filter_logits(logits, temperature, top_k=None, top_p=None, seen=None,
                  repetition_penalty=None):
    """The filtering stage of :func:`sample_logits`: (B, V) f32 logits ->
    temperature-scaled logits with every filtered-out token at -inf
    (categorical over the result IS the sampling distribution — also used
    directly by the speculative-sampling accept/residual math)."""
    if repetition_penalty is not None and seen is not None:
        pen = jnp.where(logits > 0, logits / repetition_penalty,
                        logits * repetition_penalty)
        logits = jnp.where(seen, pen, logits)
    logits = logits / jnp.maximum(temperature, 1e-6)
    # Both filters reduce to "mask logits below an exact per-row cutoff",
    # found by _radix_cutoff without a sort (lax.top_k's sort costs ~230us
    # per decode step at V=32k inside the fused scan; the radix select is
    # fused VPU work).  Tie semantics match lax.top_k-based filtering:
    # every token equal to the cutoff is kept.
    if top_k is not None:
        ones = jnp.ones(logits.shape, logits.dtype)
        kth = _radix_cutoff(logits, ones, float(int(top_k)), strict=False)
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    if top_p is not None:
        # nucleus: probabilities under the (post-top-k) full distribution;
        # the cutoff is the value of the last token of the smallest prefix
        # whose mass exceeds top_p — exact over the whole vocab (no
        # top-2048 candidate cap).  strict '>' makes top_p=0 keep exactly
        # the best token (= greedy); if even the total mass is <= top_p
        # (impossible for p<1 up to rounding) everything is kept.
        lse = jax.scipy.special.logsumexp(logits, axis=-1, keepdims=True)
        probs = jnp.exp(logits - lse)
        cutoff = _radix_cutoff(logits, probs, top_p, strict=True)
        logits = jnp.where(logits < cutoff, -jnp.inf, logits)
    return logits


def filter_logits_per_row(logits, temperature, top_k, top_p, seen=None,
                          repetition_penalty=None):
    """:func:`filter_logits` with PER-ROW (B,)-vector parameters — the
    continuous-batching server's per-request sampling hook.  All params
    are traced values (no recompiles as requests come and go):
    ``temperature`` <= 0 rows are clamped to 1e-6 here and resolved to
    exact greedy by :func:`sample_logits_per_row`'s argmax select;
    ``top_k = V`` and ``top_p = 1.0`` are exact no-ops (every token kept —
    the strict '>' nucleus rule keeps all when the total mass <= p).
    ``_radix_cutoff`` already computes per-row cutoffs, so (B, 1)
    thresholds broadcast through it unchanged."""
    if repetition_penalty is not None and seen is not None:
        rp = repetition_penalty[:, None]
        pen = jnp.where(logits > 0, logits / rp, logits * rp)
        logits = jnp.where(seen, pen, logits)
    logits = logits / jnp.maximum(temperature, 1e-6)[:, None]
    ones = jnp.ones(logits.shape, logits.dtype)
    kth = _radix_cutoff(logits, ones,
                        top_k.astype(jnp.float32)[:, None], strict=False)
    logits = jnp.where(logits < kth, -jnp.inf, logits)
    lse = jax.scipy.special.logsumexp(logits, axis=-1, keepdims=True)
    probs = jnp.exp(logits - lse)
    cutoff = _radix_cutoff(logits, probs,
                           top_p.astype(jnp.float32)[:, None], strict=True)
    # p >= 1 is the explicit off-encoding: f32 rounding can push the total
    # mass an ulp past 1.0, which would otherwise mask prob-0 tail tokens
    cutoff = jnp.where(top_p[:, None] >= 1.0, -jnp.inf, cutoff)
    return jnp.where(logits < cutoff, -jnp.inf, logits)


def sample_logits_per_row(logits, key, temperature, top_k, top_p,
                          seen=None, repetition_penalty=None):
    """:func:`sample_logits` with per-row (B,) parameters: rows with
    ``temperature > 0`` draw from the filtered distribution, rows with
    ``temperature <= 0`` take the exact greedy argmax (identical to the
    greedy kernel's in-kernel argmax, ties to the lowest index).

    ``key`` may be ONE PRNG key (a fleet-shared stream) or a (B, 2)
    stack of PER-ROW keys — then each row draws with its own key, which
    is what makes a served request's sampled stream a pure function of
    (prompt, params, seed), independent of the rest of the fleet."""
    greedy = jnp.argmax(logits, axis=-1)
    f = filter_logits_per_row(logits, temperature, top_k, top_p, seen,
                              repetition_penalty)
    if key.ndim == 2:  # per-row keys
        sampled = jax.vmap(jax.random.categorical)(key, f)
    else:
        sampled = jax.random.categorical(key, f, axis=-1)
    return jnp.where(temperature > 0, sampled, greedy)


def _mark_seen(seen, toks):
    """(B, V) bool |= one-hot of toks (B,) — repetition-penalty bookkeeping
    shared by the XLA and fused sampling decode scans."""
    return seen.at[jnp.arange(seen.shape[0]), toks].set(True)


def bucket_prompt(input_ids, L, max_seq_len):
    """Bucketed-prefill padding shared by ``Llama.generate`` and
    ``generate_speculative`` (one copy of a correctness-critical rule):
    pad the prompt to the next power of two (floor 8, capped at
    ``max_seq_len``) so prompt lengths share a handful of compiled prefill
    executables.  Token-exact with unpadded prefill BECAUSE the pair is
    kept together: logits are read at the TRUE last position
    (``last_idx``) and the padded cache rows sit above the decode position
    until rewritten.  Returns ``(ids_padded, last_idx)``;
    ``last_idx is None`` means no padding was needed."""
    Lp = min(max(1 << (L - 1).bit_length(), 8), max_seq_len)
    if Lp > L:
        return np.pad(input_ids, ((0, 0), (0, Lp - L))), jnp.int32(L)
    return input_ids, None


UNROLL_MAX_LAYERS = 16  # layer-scan unroll bound: full unroll lets XLA
#                         overlap each layer's weight stream with the
#                         previous layer's compute at small depths; past
#                         this the unrolled graph blows up compile time
#                         (7B geometry: 32 layers), and the rolled scan
#                         takes over (quantized mats then stream through
#                         qmatmul_stacked — see forward_logits_one)

FLASH_PREFILL_MIN = 1024  # below this the dense (L, L) score matrix is
#                           small, XLA-fused, and bit-identical to prior
#                           rounds' streams — flash buys nothing


def flash_prefill_mode(weights, L: int):
    """Static ``flash`` value for a pure-causal prefill of ``L`` tokens
    (shared routing rule: ``generate``, ``LlamaServer`` admission).

    Long prompts on a real TPU route the prefill attention through the
    Pallas blockwise flash kernel (O(block) VMEM instead of the
    O(L * win) materialized score matrix — the reference prefills through
    the same dense matrix it decodes with, llm/llama/model.py:112-121).
    Short prompts and non-TPU platforms keep the dense einsum: below
    ``FLASH_PREFILL_MIN`` the score matrix is cheap, and interpret-mode
    Pallas is a test-only lane (tests pass ``flash="interpret"``
    explicitly)."""
    if L < FLASH_PREFILL_MIN:
        return False
    return next(iter(weights["tok"].devices())).platform == "tpu"


class FeedForward(nn.Module):
    """SwiGLU feed-forward (reference model.py:49-58)."""

    def __init__(self, dim, up_dim, dtype=None):
        super().__init__()
        self.dim, self.up_dim = dim, up_dim
        self.up = nn.Linear(dim, up_dim, bias=False, dtype=dtype)
        self.gate = nn.Linear(dim, up_dim, bias=False, dtype=dtype)
        self.down = nn.Linear(up_dim, dim, bias=False, dtype=dtype)

    def forward(self, x):
        return self.down(F.silu(self.gate(x)) * self.up(x))


class Attention(nn.Module):
    """Multi-head attention with an in-module KV cache used in eval mode
    (reference model.py:61-121)."""

    def __init__(self, dim: int, n_heads: int, max_seq_len: int,
                 max_batch_size: int = None, dtype=None,
                 n_kv_heads: int = None):
        super().__init__()
        self.dim = dim
        self.n_heads = n_heads
        assert dim % n_heads == 0
        self.head_dim = dim // n_heads
        # grouped-query attention (GQA, Llama-2/3 style): n_kv_heads < n_heads
        # means each K/V head serves n_heads//n_kv_heads query heads.  The
        # reference model is MHA-only (model.py:61-121); None keeps that.
        self.n_kv_heads = n_kv_heads if n_kv_heads else n_heads
        assert n_heads % self.n_kv_heads == 0, (n_heads, self.n_kv_heads)
        kv_dim = self.n_kv_heads * self.head_dim
        self.max_seq_len = max_seq_len
        self.max_batch_size = max_batch_size if max_batch_size else 1

        self.Q = nn.Linear(dim, dim, bias=False, dtype=dtype)
        self.K = nn.Linear(dim, kv_dim, bias=False, dtype=dtype)
        self.V = nn.Linear(dim, kv_dim, bias=False, dtype=dtype)
        self.O = nn.Linear(dim, dim, bias=False, dtype=dtype)

        cache_shape = (self.max_batch_size, max_seq_len, self.n_kv_heads,
                       self.head_dim)
        # persistent=False: serving scratch, rebuilt by __init__ — kept
        # out of state_dict/checkpoints (shape depends on max_batch_size)
        self.cache_k = nn.Parameter(pdn.special.zeros(cache_shape,
                                                      dtype=dtype),
                                    requires_grad=False, persistent=False)
        self.cache_v = nn.Parameter(pdn.special.zeros(cache_shape,
                                                      dtype=dtype),
                                    requires_grad=False, persistent=False)

    def __call__(self, x, start_pos: int, mask, freqs_cos, freqs_sin):
        B, L, _ = x.shape
        xq = self.Q(x).reshape(B, L, self.n_heads, self.head_dim)
        xk = self.K(x).reshape(B, L, self.n_kv_heads, self.head_dim)
        xv = self.V(x).reshape(B, L, self.n_kv_heads, self.head_dim)

        xq, xk = apply_rotary_emb(xq, xk, freqs_cos, freqs_sin)

        if not self._train:
            self.cache_k[:B, start_pos:start_pos + L] = xk
            self.cache_v[:B, start_pos:start_pos + L] = xv
            xk = self.cache_k[:B, :start_pos + L]
            xv = self.cache_v[:B, :start_pos + L]

        if self.n_kv_heads != self.n_heads:
            # GQA: broadcast each KV head to its query-head group (XLA fuses
            # the repeat into the attention einsums)
            g = self.n_heads // self.n_kv_heads
            xk = pdn.wrap_pure(lambda a: jnp.repeat(a, g, axis=2), xk)
            xv = pdn.wrap_pure(lambda a: jnp.repeat(a, g, axis=2), xv)

        if self._train and mask is not None and start_pos == 0:
            # training path: pure causal -> Pallas flash attention
            # (O(L) memory blockwise softmax) with custom VJP
            out = F.scaled_dot_product_attention(xq, xk, xv, causal=True)
            return self.O(out.reshape(B, L, -1))

        # fused scaled-dot-product attention: ONE tape node, XLA/MXU inside
        scale = 1.0 / math.sqrt(self.head_dim)
        if mask is not None:
            def sdpa(q, k, v, m):
                s = jnp.einsum("blhd,bmhd->bhlm", q, k) * scale + m
                p = jax.nn.softmax(s, axis=-1)
                return jnp.einsum("bhlm,bmhd->blhd", p, v)
            out = pdn.wrap_pure(sdpa, xq, xk, xv, mask)
        else:
            def sdpa(q, k, v):
                s = jnp.einsum("blhd,bmhd->bhlm", q, k) * scale
                p = jax.nn.softmax(s, axis=-1)
                return jnp.einsum("bhlm,bmhd->blhd", p, v)
            out = pdn.wrap_pure(sdpa, xq, xk, xv)

        return self.O(out.reshape(B, L, -1))


class TransformerBlock(nn.Module):
    """Pre-norm block (reference model.py:124-150)."""

    def __init__(self, dim, n_heads, ffn_dim, max_seq_len,
                 max_batch_size=None, dtype=None, n_kv_heads=None):
        super().__init__()
        self.attention = Attention(dim, n_heads, max_seq_len, max_batch_size,
                                   dtype, n_kv_heads)
        self.ffn = FeedForward(dim, ffn_dim, dtype)
        self.input_norm = nn.RMSNorm(dim, dtype=dtype)
        self.post_attn_norm = nn.RMSNorm(dim, dtype=dtype)

    def forward(self, x, start_pos, mask, freqs_cos, freqs_sin):
        z = x + self.attention(self.input_norm(x), start_pos, mask,
                               freqs_cos, freqs_sin)
        return z + self.ffn(self.post_attn_norm(z))


class Llama(nn.Module):

    def __init__(self, vocab_size, embed_dim, n_heads, ffn_dim: int,
                 max_seq_len: int, max_batch_size: int = None,
                 n_layers: int = 6, dtype=None, n_kv_heads: int = None):
        super().__init__()
        self.vocab_size = vocab_size
        self.embed_dim = embed_dim
        self.n_heads = n_heads
        self.n_kv_heads = n_kv_heads if n_kv_heads else n_heads
        self.ffn_dim = ffn_dim
        self.max_seq_len = max_seq_len
        self.max_batch_size = max_batch_size
        self.n_layers = n_layers
        self.head_dim = embed_dim // n_heads

        self.tok_embedding = nn.Embedding(vocab_size, embed_dim, dtype=dtype)
        freqs_cos, freqs_sin = compute_cos_sin_cache(self.head_dim,
                                                     max_seq_len, dtype=dtype)
        # persistent=False: deterministic tables derived from the config
        self.freqs_cos = nn.Parameter(freqs_cos, False, persistent=False)
        self.freqs_sin = nn.Parameter(freqs_sin, False, persistent=False)

        self.layers = nn.ModuleList([
            TransformerBlock(embed_dim, n_heads, ffn_dim, max_seq_len,
                             max_batch_size, dtype, n_kv_heads)
            for _ in range(n_layers)
        ])
        self.norm = nn.RMSNorm(embed_dim, dtype=dtype)
        self.lm_head = nn.Linear(embed_dim, vocab_size, dtype=dtype)

        self._ft_step = None
        self._ft_key = None
        self._decode_fns = None
        self._sample_fns = None
        self._fused_chunk_fn = None
        self._spec_fns = {}  # (draft_k, ngram) -> speculative loop
        self._weights_cache = {}  # (dtype, fused) -> stacked decode weights

    def move(self, device):
        # stacked decode-weight snapshots hold device-resident arrays
        self._weights_cache.clear()
        return super().move(device)

    # ------------------------- eager/module path ----------------------- #
    def _forward_hidden(self, input_ids, start_pos: int):
        if not isinstance(input_ids, Tensor):
            input_ids = Tensor(np.asarray(input_ids), device=self.device)
        L = input_ids.shape[-1]
        h = self.tok_embedding(input_ids)

        freqs_cos = self.freqs_cos[start_pos:start_pos + L]
        freqs_sin = self.freqs_sin[start_pos:start_pos + L]

        mask = None
        if L > 1:
            m = np.triu(np.full((L, L), float("-inf")), k=1)
            m = np.concatenate([np.zeros((L, start_pos)), m], axis=1)
            mask = Tensor(m, device=h.device, dtype=h.dtype)

        for layer in self.layers:
            h = layer(h, start_pos, mask, freqs_cos, freqs_sin)
        return self.norm(h)

    def forward_logits(self, input_ids, start_pos: int = 0):
        """Logits for every position (finetuning path)."""
        return self.lm_head(self._forward_hidden(input_ids, start_pos))

    def forward(self, input_ids, start_pos: int):
        h = self._forward_hidden(input_ids, start_pos)
        return self.lm_head(h[:, [-1], :])

    # ---------------------- freezing / finetuning ---------------------- #
    def set_trainable_parameters(self, trainable_prefixes=("lm_head",)):
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

    def add_lora(self, r: int = 8, alpha: float = 16.0,
                 targets=("Q", "V"), dropout: float = 0.0):
        """Attach rank-``r`` LoRA adapters to every attention/ffn Linear
        whose attribute name is in ``targets`` (e.g. ``("Q", "K", "V",
        "O", "gate", "up", "down")``), freezing all base parameters.
        Returns ``(trainable_count, frozen_count)`` like
        :meth:`set_trainable_parameters`.

        Extension beyond the reference (its finetuning is whole-matrix
        prefix freezing, model.py:213-224).  Every decode path — the XLA
        scan, the fused Pallas kernels, sampling, the server — sees the
        adapters immediately: the stacked weight snapshots fold
        ``A @ B * scaling`` in at build time (:meth:`_weights`), and
        finetune steps invalidate the snapshots."""
        from ...nn.modules.lora import apply_lora
        wrapped = apply_lora(self, r=r, alpha=alpha, targets=targets,
                             dropout=dropout, freeze=True)
        assert wrapped, f"no Linear matched targets={targets!r}"
        self._ft_step = self._ft_key = None  # state tensors changed
        self._weights_cache.clear()
        trainable = sum(1 for p in self._parameters.values()
                        if p.requires_grad)
        return trainable, len(self._parameters) - trainable

    def merge_lora(self):
        """Fold every adapter into its base weight (plain Linears again);
        decode output is bit-identical before and after the merge (both
        compute the same ``W + A @ B * scaling`` array)."""
        from ...nn.modules.lora import merge_lora
        merged = merge_lora(self)
        self._ft_step = self._ft_key = None
        self._weights_cache.clear()
        return merged

    def _lora_deltas(self):
        """Dotted weight name -> unmerged LoRA delta array (empty when no
        adapters are attached)."""
        from ...nn.modules.lora import LoRALinear, iter_named_modules
        return {path + ".weight": m for path, m in iter_named_modules(self)
                if isinstance(m, LoRALinear)}

    def _ensure_ft_step(self, optimizer, start_pos, criterion,
                        clip_norm=None):
        """Build (or reuse) the jitted forward+backward+update step.

        Cache key: everything ``inner`` closes over besides the traced
        tensors — a changed optimizer, start_pos, criterion or clip_norm
        must recompile, not silently reuse the old closure (builtin Loss
        modules key by (type, reduction) so fresh per-call instances
        don't recompile every step)."""
        from ...nn.modules.loss import criterion_cache_key

        key = (optimizer, start_pos, criterion_cache_key(criterion),
               clip_norm)
        if criterion is None:
            criterion = nn.CrossEntropyLoss()
        self.train(True)

        if self._ft_step is None or self._ft_key != key:
            def inner(inp, tgt):
                optimizer.zero_grad()
                logits = self.forward_logits(inp, start_pos)
                B, L, V = logits.shape
                loss = criterion(logits.reshape(B * L, V), tgt)
                loss.backward()
                if clip_norm is not None:
                    nn.utils.clip_grad_norm_(optimizer.params, clip_norm)
                optimizer.step()
                return loss

            self._ft_step = pdn.jit(inner, state=(self, optimizer))
            self._ft_key = key
        return self._ft_step

    def finetune_step(self, input_ids, target_ids, optimizer, criterion=None,
                      start_pos: int = 0, sync: bool = True,
                      clip_norm: float = None):
        """One compiled fine-tune step; same signature/semantics as the
        reference (model.py:226-252), but the whole
        forward+backward+optimizer update is a single XLA program.
        ``sync=False`` returns the loss as a device Tensor without the
        host round trip (call ``.item()`` when a float is needed).
        ``clip_norm`` applies global-norm gradient clipping
        (nn.utils.clip_grad_norm_) inside the compiled step."""
        step = self._ensure_ft_step(optimizer, start_pos, criterion,
                                    clip_norm)
        inp = Tensor(np.asarray(input_ids), device=self.device)
        tgt = Tensor(np.asarray(target_ids).reshape(-1), dtype=np.int64,
                     device=self.device)
        loss = step(inp, tgt)
        self._weights_cache.clear()  # decode must see the updated weights
        if sync:
            return loss.item()
        return loss  # async: device scalar Tensor, no host round trip

    def finetune_steps(self, input_ids, target_ids, optimizer, n_steps: int,
                       criterion=None, start_pos: int = 0,
                       clip_norm: float = None):
        """``n_steps`` fine-tune steps on the SAME (input, target) pair as
        ONE compiled program (``jit.foreach`` — a ``lax.scan`` over the
        per-step program).  Equivalent to calling :meth:`finetune_step`
        ``n_steps`` times, but a remote/tunneled device pays dispatch
        latency once per chunk instead of once per step.  Returns the
        per-step losses as a device Tensor of shape ``(n_steps,)`` (no
        host sync; index/``float()`` to read back).

        Extension beyond the reference CLI loop
        (/root/reference/llm/llama/finetune.py:47-56), which dispatches
        per step; trajectories are identical."""
        step = self._ensure_ft_step(optimizer, start_pos, criterion,
                                    clip_norm)
        inp = np.asarray(input_ids)
        tgt = np.asarray(target_ids).reshape(-1)
        inp_b = np.broadcast_to(inp, (n_steps,) + inp.shape)
        tgt_b = np.broadcast_to(tgt, (n_steps,) + tgt.shape)
        losses = step.foreach(
            Tensor(inp_b, device=self.device),
            Tensor(tgt_b, dtype=np.int64, device=self.device))
        self._weights_cache.clear()  # decode must see the updated weights
        return losses

    # ------------------------ compiled decode path ---------------------- #
    def _weights(self, compute_dtype=None):
        """Layer-stacked raw-array weight pytree for the functional decode.

        Per-layer matrices are stacked along a leading layer axis so the
        decode program scans over layers: ~15 device buffers instead of ~60,
        which cuts both compile size and per-dispatch host overhead (the
        remote-TPU tunnel charges per argument)."""
        P = self._parameters
        lora = self._lora_deltas()

        def g(name):
            a = P[name]._data
            mod = lora.get(name)
            if mod is not None:  # unmerged adapters: decode sees W + dW
                a = a + mod.delta_array().astype(a.dtype)
            return a.astype(compute_dtype) if compute_dtype else a

        def stack(fmt):
            return jnp.stack([g(fmt.format(i)) for i in range(self.n_layers)])

        # QKV and gate/up are fused into single matmuls: fewer, larger MXU
        # kernels per decode step (kernel-launch count is the latency floor
        # for a 15M-param model)
        return {
            "tok": g("tok_embedding.weight"),
            "cos": g("freqs_cos"),
            "sin": g("freqs_sin"),
            "norm": g("norm.weight"),
            "head_w": g("lm_head.weight"),
            "head_b": g("lm_head.bias"),
            "wqkv": jnp.concatenate([
                stack("layers.{}.attention.Q.weight"),
                stack("layers.{}.attention.K.weight"),
                stack("layers.{}.attention.V.weight"),
            ], axis=-1),
            "wo": stack("layers.{}.attention.O.weight"),
            "wgu": jnp.concatenate([
                stack("layers.{}.ffn.gate.weight"),
                stack("layers.{}.ffn.up.weight"),
            ], axis=-1),
            "down": stack("layers.{}.ffn.down.weight"),
            "in_norm": stack("layers.{}.input_norm.weight"),
            "post_norm": stack("layers.{}.post_attn_norm.weight"),
        }

    def _weights_xq(self, compute_dtype, quant):
        """XLA-scan decode weights with weight-only quantized matmuls —
        the BIG-dims lane (``ops/gemv_quant.py`` module doc): at
        7B-class dims the whole-token kernel's double-buffered weight
        windows exceed VMEM (``_fused_decode_supported``), so
        ``generate(quant=...)`` runs the ``lax.scan`` decode with
        per-matrix streamed quant kernels instead.  Layout matches
        ``_weights()`` with each quantized matrix replaced by
        ``<name>_q``/``<name>_s`` (``ops.quant`` layouts, contraction
        axis first) plus an int4 marker key ``"q4"``; key PRESENCE is
        the static switch ``forward_logits_one`` branches on."""
        from ...ops import quant as Q

        if quant not in ("int8", "int4", "int8-head"):
            raise ValueError(f"unsupported quant mode: {quant!r}")
        w = dict(self._weights(compute_dtype))
        q4 = quant == "int4"
        qfn = Q.quantize_int4 if q4 else Q.quantize_int8
        mats = () if quant == "int8-head" else ("wqkv", "wo", "wgu",
                                                "down")
        # "_xq"/"_xs" suffixes: the FUSED weights dict also carries
        # "<name>_q" keys (mega-kernel scale layout) next to the dense
        # matrices its XLA prefill shares — these must not collide
        for k in mats:
            w[k + "_xq"], w[k + "_xs"] = qfn(w.pop(k), axis=1)
        w["head_xq"], w["head_xs"] = qfn(w.pop("head_w"), axis=0)
        if q4:
            w["q4"] = jnp.ones((), jnp.int8)  # static marker key
        # pallas runs interpret-only off-TPU, and the scan executes where
        # these arrays are COMMITTED — not where jax.devices()[0] points
        # (a CPU-resident model inside a TPU process must interpret, or
        # XLA rejects the kernel at lowering; caught by a round-4 drive)
        if next(iter(w["tok"].devices())).platform != "tpu":
            w["xinterp"] = jnp.ones((), jnp.int8)
        return w

    def _make_decode_fns(self):
        S = self.max_seq_len
        H, hd = self.n_heads, self.head_dim
        Hkv = self.n_kv_heads
        g = H // Hkv  # query heads per KV head (1 = MHA)
        scale = 1.0 / math.sqrt(hd)

        def rms(x, w):
            x32 = x.astype(jnp.float32)
            n = x32 * jax.lax.rsqrt(jnp.mean(x32 * x32, -1,
                                             keepdims=True) + 1e-6)
            return (n * w).astype(x.dtype)

        def forward_logits_one(weights, ck, cv, tokens, pos,
                               all_positions=False, last_idx=None, win=None,
                               starts=None, flash=False):
            """tokens (B, L) at absolute pos; ck/cv (layers, B, S, Hkv, hd).
            One transformer forward as a scan over the layer axis; returns
            (last-position logits (B, V) f32, ck, cv) — or (B, L, V) with
            ``all_positions`` (the speculative-decoding verifier needs the
            argmax at every drafted position).  ``last_idx`` (traced i32)
            reads the logits at local position ``last_idx - 1`` instead of
            the last row — the bucketed-prefill hook: tokens past it are
            padding whose cache rows sit strictly above the decode position
            and are rewritten before any later query can attend them.

            ``starts`` (traced (B,) i32, optional) lower-bounds each batch
            row's attention at cache row ``starts[b]`` — the continuous-
            batching server's slot-recycling hook (serve.py module doc):
            rows below a recycled slot's admission position belong to the
            PREVIOUS request and must be invisible.  Mirrors the fused
            batched kernel's per-row ``starts`` input.

            ``win`` (STATIC int) bounds the attention read to cache rows
            [0, win): the caller guarantees ``pos + L <= win``, so every
            dropped column is one the causal mask already sends to -inf —
            its softmax weight is an exact 0.0 and removing it is
            bit-preserving.  Cache WRITES still land in the full (S,) cache
            carried through the scan.  This is what keeps early-position
            decode from paying O(S) attention per step (the reference's
            NumPy loop attends only [0, pos]; see ROADMAP 'CPU backend').

            ``flash`` (STATIC: False | True | "interpret") routes the
            attention through the Pallas blockwise flash kernel
            (ops/flash_attention.py) instead of the materialized
            (L, win) score einsum — the long-prompt PREFILL path (the
            reference's prefill is the same O(L^2) dense score matrix,
            llm/llama/model.py:112-121; this is the deliberate TPU
            redesign).  Contract: callers pass flash only when
            ``pos == 0`` and ``starts is None`` — then every query in
            [0, L) attends exactly the freshly-written rows [0, L) and
            pure-causal attention over the CURRENT tokens' K/V is
            bit-equivalent to the cache-read path (the causal mask
            already zeroes every cache column >= L).  "interpret" runs
            the kernel in Pallas interpret mode (CPU tests).

            int8 KV (``generate(kv_quant="int8", fused=False)`` — the
            big-dims lane, where the fused kernel cannot run): ``ck`` /
            ``cv`` arrive as ``(int8 data, (layers, B, S, Hkv) f32
            per-row scales)`` TUPLES (pytree structure is the static
            switch).  Fresh rows quantize with the fused kernel's exact
            ``quantize_kv`` scheme before the cache write; the window
            read dequantizes inline, so the attention streams half the
            HBM bytes — at 7B dims the win=1024 bf16 window is ~540 MB
            per token, a first-order decode cost next to the int4
            weight stream.  Lossy at near-tie tokens, like the fused
            kv_int8 mode.  Composes with weight quant (independent
            matmul/attention mechanisms on this lane)."""
            B, L = tokens.shape
            if win is None or win > S:
                win = S
            if flash and starts is not None:
                raise ValueError("flash prefill is pure-causal: it cannot "
                                 "honor per-row starts masks")
            # big-dims quant lane (_weights_xq): quantized matrices ride
            # the dict as <name>_q/<name>_s; presence is static per trace
            q4 = "q4" in weights
            interp = "xinterp" in weights  # weights committed off-TPU
            if any(k.endswith("_xq") for k in weights):
                from ...ops.gemv_quant import qmatmul, qmatmul_stacked
            if flash:
                from ...ops.flash_attention import flash_attention_causal
            kvq = isinstance(ck, tuple)  # int8 KV: (data, scale) pairs
            if kvq:
                from ...ops.decode_step import quantize_kv
            # rolled-scan quant decode reads the layer-STACKED quantized
            # matrices in place via qmatmul_stacked (scalar-prefetch layer
            # index) — slicing them per iteration would materialize a
            # fresh HBM copy of every weight matrix each scan step,
            # doubling the weight traffic that IS the big-dims decode
            # bottleneck (measured 2x at 7B geometry)
            nl = weights["in_norm"].shape[0]
            stacked_q = nl > UNROLL_MAX_LAYERS and any(
                k + "_xq" in weights for k in ("wqkv", "wo", "wgu", "down"))

            def mm(x, W, name, idx=None):
                if name + "_xq" not in weights:
                    return x @ W[name]
                x2 = x.reshape(-1, x.shape[-1])
                if idx is None:
                    y = qmatmul(x2, W[name + "_xq"], W[name + "_xs"],
                                q4=q4, interpret=interp)
                else:
                    y = qmatmul_stacked(x2, weights[name + "_xq"],
                                        weights[name + "_xs"], idx,
                                        q4=q4, interpret=interp)
                return y.reshape(x.shape[:-1] + y.shape[-1:]).astype(
                    x.dtype)

            h = weights["tok"][tokens]
            cos = jax.lax.dynamic_slice_in_dim(weights["cos"], pos, L)
            sin = jax.lax.dynamic_slice_in_dim(weights["sin"], pos, L)
            # query at abs position pos+i may attend cache slot j <= pos+i
            qpos = pos + jnp.arange(L)[:, None]
            jpos = jnp.arange(win)[None, :]
            allowed = jpos <= qpos                     # causal, (L, win)
            if starts is not None:
                # (B, 1, L, win): broadcasts over heads in ``s + mask``
                allowed = allowed[None] \
                    & (jpos[None] >= starts[:, None, None])
                allowed = allowed[:, None]
            mask = jnp.where(allowed, 0.0, -jnp.inf).astype(jnp.float32)
            zero = jnp.zeros((), jnp.int32)
            pos32 = jnp.asarray(pos, jnp.int32)

            D = H * hd
            Dkv = Hkv * hd

            def layer(h, xs):
                if stacked_q:
                    W, idx, ck_i, cv_i = xs
                else:
                    (W, ck_i, cv_i), idx = xs, None
                hn = rms(h, W["in_norm"])
                # one fused (D, D+2*Dkv) matmul
                qkv = mm(hn, W, "wqkv", idx)
                q = qkv[..., :D].reshape(B, L, H, hd)
                k = qkv[..., D:D + Dkv].reshape(B, L, Hkv, hd)
                v = qkv[..., D + Dkv:].reshape(B, L, Hkv, hd)
                q = _rope_pure(q, cos.astype(q.dtype), sin.astype(q.dtype))
                k = _rope_pure(k, cos.astype(k.dtype), sin.astype(k.dtype))
                if kvq:
                    # quantize fresh rows with the fused kernel's exact
                    # scheme, then write data + per-row scales
                    kq, ks_ = quantize_kv(k)
                    vq, vs_ = quantize_kv(v)
                    ck_i = (jax.lax.dynamic_update_slice(
                                ck_i[0], kq, (zero, pos32, zero, zero)),
                            jax.lax.dynamic_update_slice(
                                ck_i[1], ks_, (zero, pos32, zero)))
                    cv_i = (jax.lax.dynamic_update_slice(
                                cv_i[0], vq, (zero, pos32, zero, zero)),
                            jax.lax.dynamic_update_slice(
                                cv_i[1], vs_, (zero, pos32, zero)))
                else:
                    ck_i = jax.lax.dynamic_update_slice(
                        ck_i, k, (zero, pos32, zero, zero))
                    cv_i = jax.lax.dynamic_update_slice(
                        cv_i, v, (zero, pos32, zero, zero))
                if flash:
                    # pure-causal prefill (pos == 0, no starts): attention
                    # over the CURRENT tokens' K/V only — O(block) VMEM
                    # blockwise softmax instead of the (L, win) score matrix
                    kf = jnp.repeat(k, g, axis=2) if g != 1 else k
                    vf = jnp.repeat(v, g, axis=2) if g != 1 else v
                    att = flash_attention_causal(
                        q, kf, vf, scale,
                        interpret=(flash == "interpret"))
                    att = att.astype(h.dtype).reshape(B, L, -1)
                else:
                    # static slice: attention reads only the live window
                    if kvq:
                        # inline dequant: the HBM read is the int8 data
                        # + hd/4-byte-per-row scales (~0.53x the bf16
                        # window); the f32 multiply fuses into the
                        # window consumers
                        kk = (ck_i[0][:, :win].astype(jnp.float32)
                              * ck_i[1][:, :win, :, None]).astype(h.dtype)
                        vv = (cv_i[0][:, :win].astype(jnp.float32)
                              * cv_i[1][:, :win, :, None]).astype(h.dtype)
                    else:
                        kk, vv = ck_i[:, :win], cv_i[:, :win]
                    if g != 1:
                        kk = jnp.repeat(kk, g, axis=2)
                        vv = jnp.repeat(vv, g, axis=2)
                    s = jnp.einsum("blhd,bmhd->bhlm", q, kk,
                                   preferred_element_type=jnp.float32) * scale
                    p = jax.nn.softmax(s + mask, axis=-1).astype(h.dtype)
                    att = jnp.einsum("bhlm,bmhd->blhd", p,
                                     vv).reshape(B, L, -1)
                z = h + mm(att, W, "wo", idx)
                zn = rms(z, W["post_norm"])
                # fused (D, 2F) gate+up matmul
                gu = mm(zn, W, "wgu", idx)
                gate, up = jnp.split(gu, 2, axis=-1)
                ff = (gate * jax.nn.sigmoid(gate)) * up
                return z + mm(ff, W, "down", idx), (ck_i, cv_i)

            if stacked_q:
                # big quantized mats stay OUT of the scan xs (read in
                # place by qmatmul_stacked); only the norm gains slice
                layer_w = {k: weights[k] for k in ("in_norm", "post_norm")}
                xs = (layer_w, jnp.arange(nl, dtype=jnp.int32), ck, cv)
            else:
                layer_w = {k: weights[k] for k in weights
                           if k in ("in_norm", "post_norm")
                           or k.removesuffix("_xq").removesuffix("_xs")
                           in ("wqkv", "wo", "wgu", "down")}
                xs = (layer_w, ck, cv)
            h, (ck, cv) = jax.lax.scan(
                layer, h, xs, unroll=True if nl <= UNROLL_MAX_LAYERS else 1)
            h = rms(h, weights["norm"])
            if all_positions:
                hl = h
            elif last_idx is None:
                hl = h[:, -1]
            else:
                hl = jax.lax.dynamic_slice_in_dim(
                    h, jnp.asarray(last_idx, jnp.int32) - 1, 1, 1)[:, 0]
            if "head_xq" in weights:
                from ...ops.gemv_quant import qmatmul as _qmm
                hl2 = hl.reshape(-1, hl.shape[-1])
                logits = _qmm(hl2, weights["head_xq"],
                              weights["head_xs"], q4=q4,
                              interpret=interp
                              ).reshape(hl.shape[:-1] + (-1,))
            else:
                logits = (hl @ weights["head_w"]).astype(jnp.float32)
            logits = logits + weights["head_b"].astype(jnp.float32)
            return logits, ck, cv

        def forward_tokens(weights, ck, cv, tokens, pos, last_idx=None,
                           win=None, flash=False):
            logits, ck, cv = forward_logits_one(weights, ck, cv, tokens, pos,
                                                last_idx=last_idx, win=win,
                                                flash=flash)
            return jnp.argmax(logits, axis=-1).astype(tokens.dtype), ck, cv

        self._xla_forward_logits = forward_logits_one
        self._xla_forward_logits_all = partial(forward_logits_one,
                                               all_positions=True)
        self._xla_forward_tokens = forward_tokens

        @partial(jax.jit, static_argnames=("win", "flash"))
        def prefill(weights, ck, cv, tokens, pos, last_idx=None, win=None,
                    flash=False):
            logits, ck, cv = forward_logits_one(weights, ck, cv, tokens,
                                                pos, last_idx=last_idx,
                                                win=win, flash=flash)
            return (jnp.argmax(logits, axis=-1).astype(tokens.dtype),
                    ck, cv)

        @partial(jax.jit, static_argnames=("n_steps", "win"),
                 donate_argnames=("ck", "cv"))
        def decode_chunk(weights, ck, cv, last_tok, pos, n_steps, win=None):
            """Greedy-decode n_steps tokens in one on-device scan; every
            step attends the static window [0, win).  The caller guarantees
            pos + n_steps <= win for every step whose OUTPUT IS CONSUMED;
            generate() clamps win to max_seq_len, so surplus steps past the
            requested total may run with qpos >= win — their outputs are
            discarded on the host and their (clamped) cache writes land
            after every kept step has read the rows it needs."""
            def step(carry, _):
                ck, cv, tok, p = carry
                nxt, ck, cv = forward_tokens(weights, ck, cv, tok[:, None],
                                             p, win=win)
                return (ck, cv, nxt, p + 1), nxt

            pos = jnp.asarray(pos, jnp.int32)
            (ck, cv, tok, p), toks = jax.lax.scan(
                step, (ck, cv, last_tok, pos), None, length=n_steps,
                unroll=8)
            return ck, cv, toks  # toks: (n_steps, B)

        return prefill, decode_chunk

    def _make_sample_fns(self):
        """Compiled sampling decode pair (XLA path: full logits needed).
        Returns (prefill_sample, decode_chunk_sample); ``temperature`` is
        traced (no recompiles when it changes), top_k/top_p are static."""
        if self._decode_fns is None:
            self._decode_fns = self._make_decode_fns()
        fwd = self._xla_forward_logits

        V = self.vocab_size
        mark = _mark_seen

        @partial(jax.jit, static_argnames=("top_k", "top_p", "rep", "win",
                                           "flash"))
        def prefill_sample(weights, ck, cv, tokens, pos, key, temperature,
                           top_k, top_p, rep, last_idx=None, win=None,
                           flash=False):
            logits, ck, cv = fwd(weights, ck, cv, tokens, pos,
                                 last_idx=last_idx, win=win, flash=flash)
            B, L = tokens.shape
            seen = jnp.zeros((B, V), bool)
            if rep is not None:  # prompt tokens count as seen
                # bucketed prefill: positions past last_idx are padding and
                # must not feed the repetition penalty
                valid = jnp.ones((L,), bool) if last_idx is None \
                    else jnp.arange(L) < last_idx
                seen = seen.at[jnp.arange(B)[:, None], tokens].max(
                    jnp.broadcast_to(valid, tokens.shape))
            key, sub = jax.random.split(key)
            nxt = sample_logits(logits, sub, temperature, top_k, top_p,
                                seen, rep)
            return (nxt.astype(tokens.dtype), ck, cv, key,
                    mark(seen, nxt))

        @partial(jax.jit,
                 static_argnames=("n_steps", "top_k", "top_p", "rep", "win"),
                 donate_argnames=("ck", "cv"))
        def decode_chunk_sample(weights, ck, cv, last_tok, pos, key,
                                temperature, n_steps, top_k, top_p, rep,
                                seen, win=None):
            def step(carry, _):
                ck, cv, tok, p, key, seen = carry
                logits, ck, cv = fwd(weights, ck, cv, tok[:, None], p,
                                     win=win)
                key, sub = jax.random.split(key)
                nxt = sample_logits(logits, sub, temperature, top_k,
                                    top_p, seen, rep).astype(tok.dtype)
                return (ck, cv, nxt, p + 1, key, mark(seen, nxt)), nxt

            pos = jnp.asarray(pos, jnp.int32)
            (ck, cv, tok, p, key, seen), toks = jax.lax.scan(
                step, (ck, cv, last_tok, pos, key, seen), None,
                length=n_steps, unroll=8)
            return ck, cv, toks, key, seen

        return prefill_sample, decode_chunk_sample

    def generate_beam(self, input_ids, max_new_tokens: int,
                      num_beams: int = 4, length_penalty: float = 1.0,
                      eos_id: int = 2, dtype=None):
        """Beam-search decode for a single prompt (B=1): returns the
        highest-scoring token list (Python ints, truncated at ``eos_id``).

        Serving extension beyond the reference's greedy loop: W beams run
        as batch rows on the XLA decode path inside ONE compiled scan;
        finished beams are frozen (they may only extend with ``eos_id`` at
        zero cost) and the winner maximizes total logprob / len**penalty.
        ``max_new_tokens`` bounds the TOTAL sequence length like
        ``generate``."""
        if self._decode_fns is None:
            self._decode_fns = self._make_decode_fns()
        fwd = self._xla_forward_logits

        input_ids = np.asarray(input_ids)
        B, L = input_ids.shape
        assert B == 1, "generate_beam decodes one prompt at a time"
        total = min(max_new_tokens, self.max_seq_len)
        n_new = total - L
        if n_new <= 0:
            return []
        W = int(num_beams)

        # same snapshot key as generate(fused=False)/generate_speculative:
        # the pytree is byte-identical, so a separate "beam" key would
        # keep a second full weight copy resident in HBM for nothing
        key = (np.dtype(dtype).name if dtype else "native", False, None)
        weights = self._weights_cache.get(key)
        if weights is None:
            weights = self._weights(dtype)
            self._weights_cache[key] = weights

        @partial(jax.jit, static_argnames=("n_steps",))
        def beam_decode(weights, prompt, n_steps):
            # prefill once at B=1, then replicate the cache across beams
            ck1, cv1 = self._empty_caches(1, weights["tok"].dtype)
            logits, ck1, cv1 = fwd(weights, ck1, cv1, prompt, 0)
            logp0 = jax.nn.log_softmax(logits[0].astype(jnp.float32))
            scores, toks0 = jax.lax.top_k(logp0, W)      # (W,), (W,)
            ck = jnp.repeat(ck1, W, axis=1)              # (N, W, S, Hkv, hd)
            cv = jnp.repeat(cv1, W, axis=1)
            V = logp0.shape[-1]
            seqs0 = jnp.zeros((W, n_steps), jnp.int32)
            seqs0 = seqs0.at[:, 0].set(toks0)
            fin0 = toks0 == eos_id
            len0 = jnp.ones((W,), jnp.float32)
            eos_row = jnp.full((V,), -jnp.inf).at[eos_id].set(0.0)

            def step(carry, i):
                ck, cv, tok, scores, fin, lens, seqs = carry
                logits, ck, cv = fwd(weights, ck, cv, tok[:, None], L + i)
                logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
                # frozen beams only extend with eos at zero added cost
                cont = jnp.where(fin[:, None], eos_row[None], logp)
                flat = (scores[:, None] + cont).reshape(-1)      # (W*V,)
                scores, idx = jax.lax.top_k(flat, W)
                parent = idx // V
                tok = (idx % V).astype(jnp.int32)
                # reorder every per-beam carry by the parent beam
                ck = jnp.take(ck, parent, axis=1)
                cv = jnp.take(cv, parent, axis=1)
                fin = jnp.take(fin, parent, axis=0)
                lens = jnp.take(lens, parent, axis=0)
                seqs = jnp.take(seqs, parent, axis=0).at[:, i + 1].set(tok)
                lens = jnp.where(fin, lens, lens + 1.0)
                fin = fin | (tok == eos_id)
                return (ck, cv, tok, scores, fin, lens, seqs), None

            carry = (ck, cv, toks0.astype(jnp.int32), scores, fin0, len0,
                     seqs0)
            if n_steps > 1:
                carry, _ = jax.lax.scan(step, carry,
                                        jnp.arange(n_steps - 1,
                                                   dtype=jnp.int32))
            _, _, _, scores, fin, lens, seqs = carry
            best = jnp.argmax(scores / jnp.power(lens, length_penalty))
            return seqs[best], lens[best]

        seq, n = beam_decode(weights, jnp.asarray(input_ids, jnp.int32),
                             n_new)
        out = [int(t) for t in np.asarray(seq)[:int(np.asarray(n))]]
        return out[:out.index(eos_id)] if eos_id in out else out

    # ---------------- Pallas fused decode (B=1 fast path) ---------------- #
    def _fused_weights(self, dtype=None, quant=None):
        """Weight pytree for the fused Pallas decode step: unfused per-layer
        matrices, (N,1,D) norms, constant RoPE/head matrices, and (S,D)
        expanded cos/sin tables.

        ``quant="int8"`` stores the matmul weights (wq/wk/wv/wo, gate/up/down,
        head_w) as int8 with per-output-channel f32 scales packed the way the
        whole-token kernel reads them (halves per-token HBM traffic — the
        decode bound).  The XLA-path entries (wqkv/wgu/head_w for prefill)
        stay at full precision."""
        from ...ops import decode_step as dsk

        base = self._weights(dtype)
        D, H, N = self.embed_dim, self.n_heads, self.n_layers
        F = self.ffn_dim
        Dp = dsk.lane_pad_dim(D)
        wdt = base["tok"].dtype
        cos, sin = base["cos"], base["sin"]  # (S, hd/2)
        expand = lambda t: jnp.tile(jnp.repeat(t, 2, axis=-1), (1, H))
        hmask = dsk.head_mask_matrix(D, H, wdt)
        fused = dict(base)
        Hkv = self.n_kv_heads
        Dkv = Hkv * self.head_dim
        g = H // Hkv

        def kv_expand(w):
            # GQA -> kernel MHA layout: duplicate each KV head's weight
            # COLUMNS to its query-head group, so k = hn @ wk_expanded is
            # already head-expanded (duplicated heads receive the identical
            # per-head RoPE rotation, so this is exact)
            if g == 1:
                return w
            w3 = w.reshape(N, D, Hkv, self.head_dim)
            return jnp.repeat(w3, g, axis=2).reshape(N, D, D)

        fused.update({
            "wq": base["wqkv"][..., :D],
            "wk": kv_expand(base["wqkv"][..., D:D + Dkv]),
            "wv": kv_expand(base["wqkv"][..., D + Dkv:]),
            # narrow-KV GQA entries appended below when g > 1
            "gate_w": base["wgu"][..., :self.ffn_dim],
            "up_w": base["wgu"][..., self.ffn_dim:],
            "in_norm2": base["in_norm"][:, None, :],
            "post_norm2": base["post_norm"][:, None, :],
            "norm2": base["norm"][None, :],
            "rot": dsk.rope_pair_swap_matrix(D, wdt),
            "hmask": hmask,
            "hmask_pad": jnp.pad(hmask, ((0, Dp - D), (0, 0))),
            "head_b2": base["head_b"].reshape(1, -1),
            "cosD": expand(cos).astype(wdt),  # (S, D)
            "sinD": expand(sin).astype(wdt),
        })
        if g > 1:
            # true-GQA narrow-KV entries: the kernels store/stream
            # (S, Dkp)-wide cache rows (Dkp = lane_pad_dim(Hkv*hd)) and
            # expand per query-head group in-kernel via ``egqa``
            # (gqa_expand_matrix) — realizing GQA's KV-bandwidth saving
            # instead of caching each KV head ``g`` times.  The RoPE
            # row pattern repeats per head, so the narrow tables are the
            # first Dkv columns of the full ones.  quant="int8" keeps the
            # expanded-cache layout (scale blocks are D-wide).
            Dkp = dsk.lane_pad_dim(Dkv)
            padc = Dkp - Dkv

            def padw(w):  # zero-pad the last axis to Dkp
                return jnp.pad(w, ((0, 0),) * (w.ndim - 1) + ((0, padc),))

            rotk = dsk.rope_pair_swap_matrix(Dkv, wdt)
            fused.update({
                "wk_n": padw(base["wqkv"][..., D:D + Dkv]),  # (N, D, Dkp)
                "wv_n": padw(base["wqkv"][..., D + Dkv:]),
                "cosDk": padw(fused["cosD"][:, :Dkv]),       # (S, Dkp)
                "sinDk": padw(fused["sinD"][:, :Dkv]),
                "rotk": jnp.pad(rotk, ((0, padc), (0, padc))),
                "egqa": dsk.gqa_expand_matrix(D, H, Hkv, Dp, Dkp, wdt),
            })
        if quant in ("int8", "int8-head"):
            from ...ops.quant import quantize_int8

            if quant == "int8":  # layer matmuls too, not just the head
                def q(name):  # (N, K, M) stacked weight, contraction axis 1
                    arr, s = quantize_int8(fused[name], axis=1)
                    # SEPARATE "<name>_q" keys: "wo"/"down" are shared with
                    # the XLA prefill layout — overwriting them in place fed
                    # the prompt forward raw unscaled int8 weights
                    fused[name + "_q"] = arr
                    return s  # (N, 1, M) f32

                sq, sk, sv = q("wq"), q("wk"), q("wv")
                so, sdn = q("wo"), q("down")
                sg, su = q("gate_w"), q("up_w")
                zD = jnp.zeros((N, 3, D), jnp.float32)
                zF = jnp.zeros((N, 6, F), jnp.float32)
                fused["s_attn"] = jnp.concatenate([sq, sk, sv, so, sdn, zD],
                                                  1)
                fused["s_ffn"] = jnp.concatenate([sg, su, zF], 1)
            hq, hs = quantize_int8(base["head_w"], axis=0)
            fused["head_wq"] = hq            # int8 (D, V) for the kernel
            fused["head_s"] = hs             # f32 (1, V)
        elif quant == "int4":
            # full-layer int4 (B=1 kernel): (K/2, M) packed int8 blocks +
            # the SAME scale-block layout as int8 (quarter the weight HBM
            # traffic of bf16 — the regime is big dims, where decode is
            # purely weight-streaming-bound).  Lossier than int8: gate on
            # hardware by majority agreement only.
            from ...ops.quant import quantize_int4

            def q4(name):
                arr, s = quantize_int4(fused[name], axis=1)
                fused[name + "_q"] = arr     # packed (N, K/2, M) int8
                return s

            sq, sk, sv = q4("wq"), q4("wk"), q4("wv")
            so, sdn = q4("wo"), q4("down")
            sg, su = q4("gate_w"), q4("up_w")
            zD = jnp.zeros((N, 3, D), jnp.float32)
            zF = jnp.zeros((N, 6, F), jnp.float32)
            fused["s_attn"] = jnp.concatenate([sq, sk, sv, so, sdn, zD], 1)
            fused["s_ffn"] = jnp.concatenate([sg, su, zF], 1)
            hq, hs = quantize_int4(base["head_w"], axis=0)
            fused["head_wq"] = hq            # packed (D/2, V) int8
            fused["head_s"] = hs
            fused["q4"] = jnp.ones((), jnp.int8)  # static marker key
        elif quant is not None:
            raise ValueError(f"unsupported quant mode: {quant!r}")
        return fused

    def _fused_decode_supported(self, quant=None) -> bool:
        """Shape constraints of the whole-model Pallas kernels: 8-aligned
        hidden dims (VPU sublanes), 16-aligned max_seq (cache-tile RMW), even
        head_dim (RoPE pairs); the B=1 whole-token kernel additionally needs
        a 128-multiple vocab tiling and an 8-row-gatherable vocab.

        Plus a VMEM bound: the mega-kernel pipelines every per-layer
        weight matrix as one double-buffered VMEM window, which is the
        right design only while they all FIT — at 7B-class dims the bf16
        gate/up window alone is 90 MB x 2 buffering levels vs the v5e's
        128 MB VMEM (measured crash, round 4).  Past the bound generate()
        falls back to the XLA ``lax.scan`` decode, whose per-matmul
        streaming has no such limit (and keeps ``quant`` via
        ``ops/gemv_quant.py``) — at those dims decode is pure weight
        streaming and the mega-kernel's launch-overhead win is gone
        anyway (see gemv_quant's module doc for the accounting)."""
        from ...ops.decode_step import lane_pad_dim, pick_sb, pick_vt
        D, F = self.embed_dim, self.ffn_dim
        CW = lane_pad_dim(max(self.n_kv_heads * self.head_dim, 1)) \
            if self.n_kv_heads != self.n_heads else D
        itemsize = {None: 2.0, "int8-head": 2.0, "int8": 1.0,
                    "int4": 0.5}.get(quant, 2.0)
        # resident per-layer windows: wq+wo (D,D), wk+wv (D,CW),
        # gate+up (D,F), down (F,D); x2 pipeline buffers
        vmem = 2 * (2 * D * D + 2 * D * CW + 3 * D * F) * itemsize
        return (self.embed_dim % 8 == 0 and self.ffn_dim % 8 == 0
                and self.max_seq_len % 16 == 0 and self.head_dim % 2 == 0
                and pick_vt(self.vocab_size) > 0
                and pick_sb(self.max_seq_len) > 0
                and self.vocab_size % 8 == 0
                and vmem <= (100 << 20))

    def _make_fused_decode_fns(self):
        """decode_chunk built on the whole-token Pallas kernel (B=1): one
        launch per token covers embed -> layers -> lm_head -> argmax, with
        position-bounded KV streaming (ops/decode_step.fused_decode_token)."""
        from ...ops.decode_step import (fused_decode_token, pick_sb, pick_vt)

        if self._decode_fns is None:  # provides _xla_forward_tokens
            self._decode_fns = self._make_decode_fns()

        vt = pick_vt(self.vocab_size, self.embed_dim)
        sb = pick_sb(self.max_seq_len)

        def _narrow_kw(weights):
            """True-GQA narrow-cache kwargs (static by dict keys at trace
            time): active when the weights carry narrow entries and the
            layers are not int8-quantized (int8 scale blocks are D-wide,
            so full-layer quant keeps the expanded-cache layout)."""
            if "egqa" in weights and "s_attn" not in weights:
                return dict(cosk=weights["cosDk"], sink=weights["sinDk"],
                            rotk=weights["rotk"], egqa=weights["egqa"])
            return {}

        def fused_step(weights, ck, cv, tok, p, emit_logits=False):
            """One whole-token kernel launch (B=1) with all weight-format
            plumbing (int8 scales, narrow GQA) resolved from the weights
            dict — the single source the chunk fns AND the fidelity gates
            (utils/fidelity.py, bench.py, the pytest tpu lane) build on."""
            qhead = "head_s" in weights
            qlayers = "s_attn" in weights
            nkw = _narrow_kw(weights)

            def W(name):
                if nkw and name in ("wk", "wv"):
                    return weights[name + "_n"]
                return weights[name + "_q"] if qlayers else weights[name]

            return fused_decode_token(
                p, tok, weights["tok"], weights["cosD"], weights["sinD"],
                weights["rot"], weights["hmask_pad"], weights["norm2"],
                W("wq"), W("wk"), W("wv"), W("wo"),
                W("gate_w"), W("up_w"), W("down"),
                weights["in_norm2"], weights["post_norm2"],
                weights["head_wq"] if qhead else weights["head_w"],
                weights["head_b2"], ck, cv, vt=vt, sb=sb,
                s_attn=weights.get("s_attn"), s_ffn=weights.get("s_ffn"),
                head_s=weights.get("head_s"), emit_logits=emit_logits,
                q4="q4" in weights, **nkw)

        def fused_step_batched(weights, ck, cv, tok, p, emit_logits=False,
                               starts=None):
            """Batched sibling of ``fused_step``: ``tok`` is (B,); the
            embedding gather happens here (one tiny XLA kernel).
            ``starts`` (B,) i32 sets per-row attention lower bounds — the
            continuous-batching serving hook (models/llama/serve.py).
            ``ck``/``cv`` may be ``(int8 cache, f32 scales)`` tuples (see
            ``quantize_kv``) — the static pytree structure switches the
            kernel to its int8-KV mode; returns caches in the same form.

            The KV block size shrinks with B (``batched_sb``): the stream
            buffers cost 4*B*sb*CW bytes of VMEM and crowd out the weight
            double-buffering past ~24 MB (B=64 regressed below B=32
            aggregate at the fixed sb=256)."""
            from ...ops.decode_step import (batched_sb,
                                            fused_decode_token_batched)

            qhead = "head_s" in weights
            qlayers = "s_attn" in weights
            nkw = _narrow_kw(weights)
            narrow = bool(nkw)  # nkw later also carries the kv_int8 scales

            def W(name):
                if narrow and name in ("wk", "wv"):
                    return weights[name + "_n"]
                return weights[name + "_q"] if qlayers else weights[name]

            h0 = weights["tok"][tok].astype(jnp.float32)  # (B, D)
            kv8 = isinstance(ck, tuple)
            if kv8:
                (ck, sk), (cv, sv) = ck, cv
                nkw = dict(nkw, sk=sk, sv=sv)
            sbb = batched_sb(ck.shape[2], ck.shape[1], ck.shape[3],
                             ck.dtype.itemsize,
                             multiple=128 if kv8 else 16)
            if not sbb:
                S_ = ck.shape[2]
                if kv8 and sb % 128 != 0 and sb != S_:
                    # the generic sb fallback would slice the scale
                    # plane's minormost S axis at non-128-multiple
                    # offsets, which Mosaic refuses to lower (sb == S is
                    # fine: one whole-axis block, no mid-axis slicing) —
                    # fail with the constraint instead of an obscure
                    # Mosaic lowering error
                    raise ValueError(
                        f"kv_quant='int8' needs a max_seq_len ({S_}) "
                        f"that is <=256 or has a 128-multiple divisor "
                        f"<=256; pad max_seq_len to a multiple of 128")
                sbb = sb
            out = fused_decode_token_batched(
                p, h0, weights["cosD"], weights["sinD"], weights["rot"],
                weights["hmask_pad"], weights["norm2"], W("wq"),
                W("wk"), W("wv"), W("wo"), W("gate_w"), W("up_w"),
                W("down"), weights["in_norm2"], weights["post_norm2"],
                weights["head_wq"] if qhead else weights["head_w"],
                weights["head_b2"], ck, cv,
                vt=vt, sb=sbb, emit_logits=emit_logits, starts=starts,
                s_attn=weights.get("s_attn"), s_ffn=weights.get("s_ffn"),
                head_s=weights.get("head_s"), q4="q4" in weights, **nkw)
            if kv8:
                o, ck, cv, sk, sv = out
                return o, (ck, sk), (cv, sv)
            return out

        @partial(jax.jit, static_argnames=("n_steps",),
                 donate_argnames=("ck", "cv"))
        def decode_chunk(weights, ck, cv, last_tok, pos, n_steps):
            """B=1; caches (N, S, Dp) lane-padded (pad_cache_lanes) —
            (N, S, Dkp) narrow under GQA.  If the weight pytree carries
            int8 scales (_fused_weights(quant=...)), the kernel runs the
            weight-only-int8 path for those weights."""
            def step(carry, _):
                ck, cv, tok, p = carry
                nxt, ck, cv = fused_step(weights, ck, cv, tok, p)
                return (ck, cv, nxt.astype(tok.dtype), p + 1), nxt

            pos = jnp.asarray(pos, jnp.int32)
            (ck, cv, tok, p), toks = jax.lax.scan(
                step, (ck, cv, last_tok, pos), None, length=n_steps)
            return ck, cv, toks

        @partial(jax.jit, static_argnames=("n_steps",),
                 donate_argnames=("ck", "cv"))
        def decode_chunk_batched(weights, ck, cv, last_tok, pos, n_steps):
            """B>1 variant: caches (N, B, S, Dp) lane-padded ((N, B, S, Dkp)
            narrow under GQA); the batched whole-token kernel streams each
            weight matrix ONCE per token for the whole batch
            (ops/decode_step.fused_decode_token_batched).  Two launches per
            token: the (B,) embedding gather + the kernel."""
            def step(carry, _):
                ck, cv, tok, p = carry
                nxt, ck, cv = fused_step_batched(weights, ck, cv, tok, p)
                return (ck, cv, nxt.astype(tok.dtype), p + 1), nxt

            pos = jnp.asarray(pos, jnp.int32)
            (ck, cv, tok, p), toks = jax.lax.scan(
                step, (ck, cv, last_tok, pos), None, length=n_steps)
            return ck, cv, toks

        @partial(jax.jit,
                 static_argnames=("n_steps", "top_k", "top_p", "rep"),
                 donate_argnames=("ck", "cv"))
        def decode_chunk_sample(weights, ck, cv, last_tok, pos, key,
                                temperature, n_steps, top_k, top_p, rep,
                                seen):
            """Sampled decode at fused-kernel speed (B=1): the whole-token
            kernel emits the full (1, V) logits row (``emit_logits``) in
            ONE launch, then ``sample_logits`` — the same function and key
            sequence as the XLA sampling path — picks the token in XLA
            inside the same scan step.  Signature mirrors
            ``_make_sample_fns``'s decode_chunk_sample so ``generate``
            routes either interchangeably."""
            def step(carry, _):
                ck, cv, tok, p, key, seen = carry
                logits, ck, cv = fused_step(weights, ck, cv, tok, p,
                                            emit_logits=True)
                key, sub = jax.random.split(key)
                nxt = sample_logits(logits, sub, temperature, top_k, top_p,
                                    seen, rep).astype(tok.dtype)
                return (ck, cv, nxt, p + 1, key, _mark_seen(seen, nxt)), nxt

            pos = jnp.asarray(pos, jnp.int32)
            (ck, cv, tok, p, key, seen), toks = jax.lax.scan(
                step, (ck, cv, last_tok, pos, key, seen), None,
                length=n_steps)
            return ck, cv, toks, key, seen

        @partial(jax.jit,
                 static_argnames=("n_steps", "top_k", "top_p", "rep"),
                 donate_argnames=("ck", "cv"))
        def decode_chunk_sample_batched(weights, ck, cv, last_tok, pos, key,
                                        temperature, n_steps, top_k, top_p,
                                        rep, seen):
            """B>1 sampled decode on the batched whole-token kernel
            (``emit_logits`` -> (B, V) logits -> ``sample_logits``)."""
            def step(carry, _):
                ck, cv, tok, p, key, seen = carry
                logits, ck, cv = fused_step_batched(weights, ck, cv, tok, p,
                                                    emit_logits=True)
                key, sub = jax.random.split(key)
                nxt = sample_logits(logits, sub, temperature, top_k, top_p,
                                    seen, rep).astype(tok.dtype)
                return (ck, cv, nxt, p + 1, key, _mark_seen(seen, nxt)), nxt

            pos = jnp.asarray(pos, jnp.int32)
            (ck, cv, tok, p, key, seen), toks = jax.lax.scan(
                step, (ck, cv, last_tok, pos, key, seen), None,
                length=n_steps)
            return ck, cv, toks, key, seen

        forward_tokens = self._xla_forward_tokens
        from ...ops.decode_step import lane_pad_dim, pad_cache_lanes
        N, S = self.n_layers, self.max_seq_len
        Hkv, hd, D = self.n_kv_heads, self.head_dim, self.embed_dim
        Dp = lane_pad_dim(D)
        Dkp = lane_pad_dim(Hkv * hd)  # narrow-KV cache width (GQA)

        @partial(jax.jit, static_argnames=("n_steps", "flash"))
        def prefill_decode(weights, prompt, n_steps, last_idx=None,
                           flash=False):
            """Whole sequence in ONE dispatch: allocate caches, prefill the
            prompt (XLA path), then the fused-kernel decode scan.  Returns
            (1+n_steps, B) tokens including the prefill token.  ``last_idx``
            (traced) marks the true prompt length when ``prompt`` is
            bucket-padded; decode starts there."""
            B = prompt.shape[0]
            dt = weights["tok"].dtype
            narrow = bool(_narrow_kw(weights))
            width = Dkp if narrow else Dp
            ck5 = jnp.zeros((N, B, S, Hkv, hd), dt)  # XLA-path KV layout
            cv5 = jnp.zeros((N, B, S, Hkv, hd), dt)
            tok, ck5, cv5 = forward_tokens(weights, ck5, cv5, prompt, 0,
                                           last_idx, flash=flash)
            ck = pad_cache_lanes(self._kv_flat(ck5, narrow), width)
            cv = pad_cache_lanes(self._kv_flat(cv5, narrow), width)
            pos0 = prompt.shape[1] if last_idx is None else last_idx
            if B == 1:
                ck, cv, toks = decode_chunk(weights, ck, cv, tok,
                                            pos0, n_steps)
            else:
                ck, cv, toks = decode_chunk_batched(weights, ck, cv, tok,
                                                    pos0, n_steps)
            return jnp.concatenate([tok[None], toks], axis=0)

        return (decode_chunk, prefill_decode, decode_chunk_batched,
                decode_chunk_sample, decode_chunk_sample_batched,
                fused_step, fused_step_batched)

    def _kv_flat(self, c5, narrow: bool = False):
        """(N, B, S, Hkv, hd) XLA cache -> (N, [B,] S, W) fused-kernel
        layout.  ``narrow`` (the GQA default since round 3) keeps the true
        Hkv*hd width — the kernels expand per query-head group on the MXU
        (``egqa``), so cache bandwidth scales with Hkv, not H.  Without it
        (MHA, or GQA under full-layer int8) each KV head is repeated to its
        query-head group for the full-width MHA layout."""
        N, B, S = c5.shape[0], c5.shape[1], c5.shape[2]
        g = self.n_heads // self.n_kv_heads
        if g > 1 and not narrow:
            c5 = jnp.repeat(c5, g, axis=3)
        c = c5.reshape(N, B, S, -1)
        return c[:, 0] if B == 1 else c

    def _empty_caches(self, B, dtype, kv_quant=None):
        shape = (self.n_layers, B, self.max_seq_len, self.n_kv_heads,
                 self.head_dim)
        if kv_quant:  # XLA-lane int8 KV: (data, per-row scale) tuples
            def one():
                return (jnp.zeros(shape, jnp.int8),
                        jnp.zeros(shape[:-1], jnp.float32))
            return one(), one()
        return jnp.zeros(shape, dtype), jnp.zeros(shape, dtype)

    def generate(self, input_ids, max_new_tokens: int,
                 chunk: int = DECODE_CHUNK, dtype=None, fused=None,
                 quant=None, temperature: float = 0.0, top_k: int = None,
                 top_p: float = None, seed: int = 0,
                 repetition_penalty: float = None, kv_quant=None,
                 bucket_prefill: bool = True, flash_prefill=None):
        """Greedy generation; yields (B,1) id tensors one token at a time
        like the reference (model.py:258-269), while computing CHUNK tokens
        per compiled on-device scan, with the next chunk dispatched before
        the previous one's tokens are read back (1-deep pipeline hides the
        host->TPU dispatch latency).  ``max_new_tokens`` bounds the TOTAL
        sequence length (reference quirk).  ``dtype=jnp.bfloat16`` runs the
        weights/caches in bf16 with f32 softmax/norm/logits.
        ``quant="int8"`` (fused paths, any B; "int8-head" for just the
        lm_head) additionally stores matmul weights as int8 with
        per-channel scales — halves the weight HBM traffic, which
        dominates decode at small-to-mid B (batched activations quantize
        per row).  ``quant="int4"`` (any B) packs two weights per byte
        (``ops.quant.quantize_int4`` split-dot layout) — QUARTER the
        weight traffic, for the big-dims regime where decode is purely
        weight-streaming-bound; lossier than int8.
        Deliberate fix vs the reference: its decode feeds token L at
        start_pos L+1, leaving cache slot L zeroed (model.py:259-265); we
        decode at the correct positions.

        ``temperature > 0`` switches from greedy argmax to on-device
        sampling (``sample_logits``: temperature, optional top_k / nucleus
        top_p and HF-style ``repetition_penalty`` over prompt+generated
        tokens, deterministic under ``seed``).  Sampling runs at
        fused-kernel speed too: the whole-token kernel emits the full
        logits row (``emit_logits``) and the very same ``sample_logits`` /
        key sequence as the XLA path picks the token — so fused and XLA
        sampled streams agree token-for-token (up to bf16 residual-stream
        rounding at near-ties, exactly like greedy).
        temperature=0 (default) is exact reference-greedy.

        ``kv_quant="int8"`` stores the KV cache as int8 rows with
        per-row f32 scales (``quantize_kv``), halving the per-step KV
        streaming that dominates batched long-context decode.  On the
        fused kernel (any B) the batched kernel's kv_int8 mode runs the
        scores as int8 x int8 MXU dots; on the XLA lane (``fused=False``
        — the big-dims path) the scan carries (data, scale) tuple caches
        with inline dequant at the window read, and COMPOSES with weight
        ``quant`` (at 7B dims the win=1024 bf16 window is ~540 MB/token
        next to int4's ~3.3 GB weight stream).  Lossy like ``quant``:
        near-tie tokens may differ from the bf16 stream (hardware-gated
        by majority agreement in bench.py).

        ``bucket_prefill`` (default on) pads the prompt to the next
        power-of-two length before the prefill dispatch, so arbitrary
        prompt lengths share a handful of compiled prefill executables
        (a fresh length otherwise costs a full XLA compile — ~20-40 s
        through the remote tunnel).  Token-exact: the logits are read at
        the true last position, and every padded cache row sits strictly
        above the decode position until the step that rewrites it.

        ``flash_prefill`` (default None = auto): route the prefill
        attention through the Pallas flash kernel when the (padded)
        prompt is long (``flash_prefill_mode``: >= FLASH_PREFILL_MIN on
        a real TPU) — O(block) VMEM instead of the O(L^2) score matrix
        the reference materializes.  False forces the dense path;
        True/"interpret" force the kernel (tests)."""
        if self._decode_fns is None:
            self._decode_fns = self._make_decode_fns()
        prefill, decode_chunk = self._decode_fns

        input_ids = np.asarray(input_ids)
        B, L = input_ids.shape
        sampling = temperature is not None and temperature > 0
        # CPU platform: the BLAS lane (cpu_decode.py) decodes B=1
        # requests as a NumPy loop — memory-bound GEMVs with zero
        # executable/dispatch overhead, the design that matches the
        # reference's own CPU numbers.  Sampling rides the same loop with
        # the XLA lane's exact sample_logits/key schedule (one small
        # CPU-jitted draw per token).  fused="numpy" forces it; the
        # default picks it automatically off-accelerator.
        # f32-native only: a bf16-native model's numpy loop would promote
        # the residual stream to f32 (numpy has no bf16 BLAS), silently
        # changing the token stream vs the XLA lane's per-layer rounding
        numpy_ok = (B == 1 and quant is None and kv_quant is None
                    and dtype is None
                    and np.dtype(self.tok_embedding.weight.dtype)
                    == np.float32)
        if fused == "numpy":
            if not numpy_ok:
                raise ValueError(
                    "fused='numpy' is the B=1, f32-native CPU lane "
                    "(no quant/kv_quant/dtype override)")
            numpy_lane = True
        else:
            numpy_lane = fused is None and self.device.kind != "accel" \
                and numpy_ok
        if numpy_lane:
            total = min(max_new_tokens, self.max_seq_len)
            if total <= L:  # reference: range(L, total) yields nothing
                return
            from .cpu_decode import build_np_weights, numpy_decode
            wnp = self._weights_cache.get(("numpy",))
            if wnp is None:
                wnp = build_np_weights(self)
                self._weights_cache[("numpy",)] = wnp
            dev = Device("cpu")
            for t in numpy_decode(self, wnp, input_ids, total,
                                  temperature=temperature, top_k=top_k,
                                  top_p=top_p, seed=seed,
                                  repetition_penalty=repetition_penalty):
                # int32 to match the XLA/fused lanes' yielded rows
                yield Tensor._wrap(np.array([[t]], np.int32), dev, False)
            return
        if fused is None:
            fused = self.device.kind == "accel" \
                and self._fused_decode_supported(quant)
        # quant without the fused kernel runs the XLA scan with streamed
        # quantized matmuls (ops/gemv_quant.py) — the big-dims lane
        if kv_quant not in (None, "int8"):
            raise ValueError(f"unsupported kv_quant mode: {kv_quant!r}")
        if kv_quant and quant and fused:
            raise ValueError("kv_quant and (weight) quant are mutually "
                             "exclusive on the fused kernel (int8 caches "
                             "and int8 weights disagree on its compute "
                             "dtype); the XLA lane (fused=False) composes "
                             "them")
        key = (np.dtype(dtype).name if dtype else "native", bool(fused),
               quant)
        weights = self._weights_cache.get(key)
        if weights is None:
            weights = (self._fused_weights(dtype, quant) if fused
                       else self._weights_xq(dtype, quant) if quant
                       else self._weights(dtype))
            self._weights_cache[key] = weights

        cpu = Device("cpu")
        # reference quirk: max_new_tokens bounds the TOTAL sequence length
        # (model.py:259 iterates range(L, max_new_tokens)); additionally cap
        # at max_seq_len — the KV cache physically ends there (the reference
        # silently drops cache writes past it via NumPy slice clamping)
        total = min(max_new_tokens, self.max_seq_len)
        if total <= L:  # reference: range(L, total) yields nothing
            return

        if fused and self._fused_chunk_fn is None:
            self._fused_chunk_fn = self._make_fused_decode_fns()

        ids_pad, last_idx = (bucket_prompt(input_ids, L, self.max_seq_len)
                             if bucket_prefill else (input_ids, None))
        flash_p = (flash_prefill_mode(weights, ids_pad.shape[1])
                   if flash_prefill is None else flash_prefill)

        # a short request must not compile/execute a full default-size
        # chunk (a 24-token ask on the XLA:CPU path was paying a 512-step
        # scan compile): cap at the next power of two of the actual need,
        # so executables still land on a handful of reusable sizes
        need_total = max(total - L - 1, 1)
        chunk = min(chunk, 1 << (need_total - 1).bit_length())

        if fused and not sampling and not kv_quant \
                and 0 < total - L - 1 <= chunk:
            # whole request in ONE device dispatch: cache alloc + prefill +
            # fused decode scan, one readback at the end (greedy only; the
            # sampled path threads key/seen state through regular chunks)
            prefill_decode = self._fused_chunk_fn[1]
            toks = prefill_decode(weights,
                                  jnp.asarray(ids_pad, jnp.int32),
                                  total - L - 1, last_idx, flash=flash_p)
            for row in np.asarray(toks):
                yield Tensor._wrap(row[:, None], cpu, False)
            return

        if sampling:
            if self._sample_fns is None:
                self._sample_fns = self._make_sample_fns()
            prefill_s, decode_s = self._sample_fns
            rkey = jax.random.PRNGKey(seed)
            tvec = jnp.float32(temperature)

        # fused paths quantize AFTER the dense XLA prefill (flat-layout
        # quantize_kv below); the XLA lane carries (data, scale) tuple
        # caches through prefill + decode directly
        ck, cv = self._empty_caches(B, weights["tok"].dtype,
                                    kv_quant=None if fused else kv_quant)
        # static attention window for the XLA paths: prefill attends only
        # its own (power-of-two-padded) rows; each decode chunk attends the
        # next power of two >= pos + chunk.  Bit-preserving (see
        # forward_logits_one) and lands on a handful of cached executables.
        win_p = int(np.asarray(ids_pad).shape[1])
        if sampling:
            rep = (float(repetition_penalty)
                   if repetition_penalty is not None else None)
            tok, ck, cv, rkey, seen = prefill_s(
                weights, ck, cv, jnp.asarray(ids_pad, jnp.int32), 0,
                rkey, tvec, top_k, top_p, rep, last_idx, win=win_p,
                flash=flash_p)
        else:
            tok, ck, cv = prefill(weights, ck, cv,
                                  jnp.asarray(ids_pad, jnp.int32), 0,
                                  last_idx, win=win_p, flash=flash_p)
        if fused:
            # fused kernel uses flat lane-padded (N, S, W) caches
            # ((N, B, S, W) batched); W is the narrow Hkv*hd width under
            # GQA (except full-layer int8, which keeps the expanded layout)
            from ...ops.decode_step import lane_pad_dim, pad_cache_lanes
            N = self.n_layers
            S, D = self.max_seq_len, self.embed_dim
            narrow = "egqa" in weights and "s_attn" not in weights
            width = lane_pad_dim(self.n_kv_heads * self.head_dim
                                 if narrow else D)
            ck = pad_cache_lanes(self._kv_flat(ck, narrow), width)
            cv = pad_cache_lanes(self._kv_flat(cv, narrow), width)
            if kv_quant:
                # int8 rows + per-row scales; the (q, s) tuple structure is
                # the static switch that puts the batched kernel in its
                # kv_int8 mode (halves KV streaming, the dominant HBM
                # traffic of batched long-context decode).  B=1 runs the
                # batched kernel too (its kv_int8 machinery at B=1): the
                # throughput is weight-streaming-bound there anyway, and
                # the win is 2x context per HBM byte.
                from ...ops.decode_step import quantize_kv
                if B == 1:  # _kv_flat squeezed the unit batch axis
                    ck, cv = ck[:, None], cv[:, None]
                ck, cv = quantize_kv(ck), quantize_kv(cv)
            if sampling:
                decode_s = self._fused_chunk_fn[
                    3 if B == 1 and not kv_quant else 4]
            else:
                decode_chunk = self._fused_chunk_fn[
                    0 if B == 1 and not kv_quant else 2]

        pos = L
        first_tok = tok  # prefill result: synced after the first decode
        pending = None  # device tokens not yet read back: (toks, keep)
        while pos + 1 < total:
            # fixed-size scan every time -> a handful of executables keyed
            # by (chunk, win); surplus tokens past `total` are discarded on
            # the host
            need = total - pos - 1
            # fused kernels stream the cache position-bounded already; the
            # XLA scans take the static window (next pow2 >= pos + chunk).
            # The min() clamp means surplus steps near max_seq_len may run
            # with qpos >= win — harmless, their outputs are discarded and
            # kept positions stay < win (see decode_chunk's docstring).
            wkw = {} if fused else {
                "win": min(self.max_seq_len,
                           1 << (pos + chunk - 1).bit_length())}
            if sampling:
                ck, cv, toks, rkey, seen = decode_s(weights, ck, cv, tok,
                                                    pos, rkey, tvec, chunk,
                                                    top_k, top_p, rep,
                                                    seen, **wkw)
            else:
                ck, cv, toks = decode_chunk(weights, ck, cv, tok, pos, chunk,
                                            **wkw)
            keep = min(chunk, need)
            tok = toks[chunk - 1]
            pos += keep
            try:  # overlap the device->host copy with the next chunk
                toks.copy_to_host_async()
            except Exception:
                pass
            if first_tok is not None:
                # first yield happens only now, with the decode chunk
                # already in flight behind it on-device
                yield Tensor._wrap(np.asarray(first_tok)[:, None], cpu, False)
                first_tok = None
            if pending is not None:
                p_toks, p_keep = pending
                for row in np.asarray(p_toks)[:p_keep]:
                    # host tensors: a per-token device_put back to the TPU
                    # would cost ~1ms each through the tunnel
                    yield Tensor._wrap(row[:, None], cpu, False)
            pending = (toks, keep)
        if first_tok is not None:  # prompt already at total-1: no decode ran
            yield Tensor._wrap(np.asarray(first_tok)[:, None], cpu, False)
        if pending is not None:
            p_toks, p_keep = pending
            for row in np.asarray(p_toks)[:p_keep]:
                yield Tensor._wrap(row[:, None], cpu, False)

    def generate_speculative(self, input_ids, max_new_tokens: int,
                             draft_k: int = 7, ngram: int = 3, dtype=None,
                             temperature: float = 0.0, top_k: int = None,
                             top_p: float = None, seed: int = 0):
        """Generation with prompt-lookup speculative decoding (B=1):
        draft K tokens by n-gram lookup over the stream so far, verify
        them in ONE teacher-forced forward, keep the longest accepted
        prefix + one extra token.  Greedy (default) is bit-identical
        to ``generate(temperature=0, fused=False)``; ``temperature > 0``
        uses speculative SAMPLING — each emitted token follows EXACTLY
        the filtered sampling distribution (equal in law to
        ``generate(temperature=...)``, different random stream).
        Returns ``(tokens (total-L,) i64, stats dict)``.  See
        models/llama/speculative.py; extension beyond the reference's
        one-token-per-forward generate (llm/llama/model.py:258-269)."""
        from .speculative import generate_speculative
        return generate_speculative(self, input_ids, max_new_tokens,
                                    draft_k=draft_k, ngram=ngram,
                                    temperature=temperature, top_k=top_k,
                                    top_p=top_p, seed=seed,
                                    dtype=dtype)
