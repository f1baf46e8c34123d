"""SPMD Llama training: dp x tp sharded full-sequence train step.

This is the framework's multi-chip scale-out demonstration (the reference
has no distributed path, SURVEY.md §2.6).  Design follows the standard TPU
recipe: a 2-D ``(dp, tp)`` mesh; batch sharded over ``dp``; Megatron-style
tensor parallelism over ``tp`` — QKV/gate-up columns and output/down rows —
so each block needs exactly one psum per matmul pair, inserted automatically
by GSPMD from the NamedSharding annotations.  The vocab dimension of the
embedding and lm_head is also sharded over ``tp``.

Everything is pure-functional jax (params pytree in, params pytree out), jit
over the mesh; collectives ride ICI.
"""
from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .mesh import Mesh, named_sharding, P


def config(vocab_size=32000, dim=288, n_heads=6, ffn_dim=768, n_layers=6,
           max_seq_len=1024, n_kv_heads=None):
    return dict(vocab_size=vocab_size, dim=dim, n_heads=n_heads,
                ffn_dim=ffn_dim, n_layers=n_layers, max_seq_len=max_seq_len,
                n_kv_heads=n_kv_heads or n_heads)


def _kv_dim(cfg):
    return cfg.get("n_kv_heads", cfg["n_heads"]) * \
        (cfg["dim"] // cfg["n_heads"])


# per-layer (leading layer-axis) parameter names, one array per matrix
LAYER_KEYS = ("wq", "wk", "wv", "wo", "gate", "up", "down",
              "in_norm", "post_norm")
_QUANT_MATS = ("wq", "wk", "wv", "wo", "gate", "up", "down")


def quantize_params(params, quant="int8"):
    """Weight-only quantized SPMD param pytree (serving: the decode regime
    is weight-streaming-bound, ops/gemv_quant.py module doc).

    Every layer matrix and the lm_head are replaced by ``<k>_q``/``<k>_s``
    pairs in the ``ops/quant`` layouts (contraction axis quantized,
    per-output-channel f32 scales; int4 nibble-packs the contraction
    axis).  Key PRESENCE is the static switch ``forward_tokens`` branches
    on — the same convention as the single-chip ``_weights_xq``
    (models/llama/model.py:617).  Unlike the single-chip lane's Mosaic
    ``qmatmul`` kernels (which cannot ride GSPMD partitioning), the mesh
    matmuls stay plain XLA ops — ``(x @ q) * scale`` with the scale
    commuted out of the contraction — so GSPMD shards them exactly like
    the dense matrices and the tp collectives are unchanged."""
    from ..ops import quant as Q

    if quant not in ("int8", "int4"):
        raise ValueError(f"unsupported quant mode: {quant!r}")
    qfn = Q.quantize_int4 if quant == "int4" else Q.quantize_int8
    out = dict(params)
    for k in _QUANT_MATS:
        out[k + "_q"], out[k + "_s"] = qfn(out.pop(k), axis=1)
    out["head_q"], out["head_s"] = qfn(out.pop("head_w"), axis=0)
    if quant == "int4":
        out["q4"] = jnp.ones((), jnp.int8)  # static marker key
    return out


def _qmm(x, q, s, q4):
    """Quantized matmul ``x @ dequant(q, s)`` with the per-output-channel
    scale commuted out of the contraction (``(x @ q) * s`` — exact, the
    scale is constant along the summed axis).  int4 runs the two
    half-K dots of the ``ops/quant`` nibble layout directly (no concat
    along the possibly-tp-sharded contraction axis, so GSPMD partitions
    both halves exactly like the dense matmul)."""
    if q4:
        from ..ops.quant import unpack_int4

        lo, hi = unpack_int4(q)
        K2 = q.shape[-2]
        y = (x[..., :K2] @ lo.astype(x.dtype)
             + x[..., K2:] @ hi.astype(x.dtype))
    else:
        y = x @ q.astype(x.dtype)
    return y * jnp.squeeze(s, -2).astype(x.dtype)


def _wmm(x, W, name, q4):
    """``x @ W[name]``, routed through :func:`_qmm` when the pytree
    carries the quantized ``<name>_q``/``<name>_s`` pair."""
    if name + "_q" not in W:
        return x @ W[name]
    return _qmm(x, W[name + "_q"], W[name + "_s"], q4)


def init_params(rng: np.random.RandomState, cfg, dtype=jnp.float32):
    """Layer-stacked parameter pytree (matches the decode-path layout)."""
    V, D, F, N = (cfg["vocab_size"], cfg["dim"], cfg["ffn_dim"],
                  cfg["n_layers"])
    Dkv = _kv_dim(cfg)
    s = 0.02

    def w(*shape):
        return jnp.asarray(rng.standard_normal(shape) * s, dtype)

    hd = D // cfg["n_heads"]
    inv_freq = 1.0 / (10000**(np.arange(0, hd, 2)[:hd // 2] / hd))
    freqs = np.outer(np.arange(cfg["max_seq_len"]), inv_freq)
    # per-matrix arrays (NOT fused qkv/gate-up like the single-chip decode
    # layout, models/llama/model.py:_weights): GSPMD shards the last axis
    # of each array in equal contiguous blocks, so only a per-matrix
    # layout keeps every tp shard a whole block of heads / ffn columns —
    # a fused (D, D+2*Dkv) matrix would split across the q|k|v boundaries
    # and force per-layer reshards instead of the Megatron schedule
    return {
        "tok": w(V, D),
        "cos": jnp.asarray(np.cos(freqs), dtype),
        "sin": jnp.asarray(np.sin(freqs), dtype),
        "norm": jnp.ones((D,), dtype),
        "head_w": w(D, V),
        "head_b": jnp.zeros((V,), dtype),
        "wq": w(N, D, D),
        "wk": w(N, D, Dkv),  # narrower under GQA
        "wv": w(N, D, Dkv),
        "wo": w(N, D, D),
        "gate": w(N, D, F),
        "up": w(N, D, F),
        "down": w(N, F, D),
        "in_norm": jnp.ones((N, D), dtype),
        "post_norm": jnp.ones((N, D), dtype),
    }


def param_shardings(mesh: Mesh, params=None):
    """Megatron-style PartitionSpecs per parameter (replicated where the
    mesh has no ``tp`` axis — dp-only meshes are legitimate).

    Default (``params=None``) returns the dense-pytree table (the train /
    generate layout).  Passing a pytree filters the table to its keys —
    how a :func:`quantize_params` serving pytree gets its shardings: a
    ``<k>_q`` shards like the dense ``<k>`` (int4 halves the contraction
    axis, which stays tp-divisible at pow2 dims), and a ``<k>_s`` shards
    on the output axis exactly where the dense spec shards it (row-
    parallel matrices' scales are replicated: their output axis is)."""
    tp = _ax(mesh, "tp")
    dense = {
        "tok": P(tp, None),            # vocab-sharded embedding
        "cos": P(),
        "sin": P(),
        "norm": P(),
        "head_w": P(None, tp),         # column-parallel lm head
        "head_b": P(tp),
        "wq": P(None, None, tp),       # column-parallel: whole query heads
        "wk": P(None, None, tp),       # column-parallel kv (narrow if GQA)
        "wv": P(None, None, tp),
        "wo": P(None, tp, None),       # row-parallel output proj
        "gate": P(None, None, tp),     # column-parallel gate/up
        "up": P(None, None, tp),
        "down": P(None, tp, None),     # row-parallel down proj
        "in_norm": P(),
        "post_norm": P(),
    }
    if params is None:
        return {k: named_sharding(mesh, *spec) for k, spec in dense.items()}
    specs = dict(dense)
    for k in _QUANT_MATS:
        specs[k + "_q"] = dense[k]
        # scale (N, 1, out): tp-sharded iff the dense output axis is
        specs[k + "_s"] = P(None, None, dense[k][2])
    specs["head_q"] = dense["head_w"]
    specs["head_s"] = P(None, tp)
    specs["q4"] = P()
    return {k: named_sharding(mesh, *specs[k]) for k in params}


def shard_params(params, mesh: Mesh):
    sh = param_shardings(mesh, params)
    return {k: jax.device_put(v, sh[k]) for k, v in params.items()}


def _rms(x, w):
    return x * jax.lax.rsqrt(jnp.mean(x * x, -1, keepdims=True) + 1e-6) * w


def _rope(x, cos, sin):
    xr, xi = x[..., 0::2], x[..., 1::2]
    cos = cos[:, None, :]
    sin = sin[:, None, :]
    return jnp.stack([xr * cos - xi * sin, xr * sin + xi * cos],
                     axis=-1).reshape(x.shape)


def layer_dense(h, W, cos, sin, mask, cfg):
    """One pre-norm transformer layer over per-matrix weights ``W``
    (wq/wk/wv/wo/gate/up/down/in_norm/post_norm).  Shared by the GSPMD
    training forward below and the pipeline-parallel stage body
    (``pipeline._layer_body``) so the two paths cannot drift.  Supports
    GQA (cfg["n_kv_heads"] < n_heads): narrower wk/wv, KV heads repeated
    to their query groups."""
    B, L, D = h.shape
    H = cfg["n_heads"]
    hd = D // H
    Hkv = cfg.get("n_kv_heads", H)
    g = H // Hkv
    hn = _rms(h, W["in_norm"])
    q = (hn @ W["wq"]).reshape(B, L, H, hd)
    k = (hn @ W["wk"]).reshape(B, L, Hkv, hd)
    v = (hn @ W["wv"]).reshape(B, L, Hkv, hd)
    q, k = _rope(q, cos, sin), _rope(k, cos, sin)
    if g > 1:
        k, v = jnp.repeat(k, g, axis=2), jnp.repeat(v, g, axis=2)
    s = jnp.einsum("blhd,bmhd->bhlm", q, k) / math.sqrt(hd)
    p = jax.nn.softmax(s + mask, axis=-1)
    att = jnp.einsum("bhlm,bmhd->blhd", p, v).reshape(B, L, D)
    z = h + att @ W["wo"]
    zn = _rms(z, W["post_norm"])
    gate, up = zn @ W["gate"], zn @ W["up"]
    return z + ((gate * jax.nn.sigmoid(gate)) * up) @ W["down"]


def forward_logits(params, tokens, cfg, remat: bool = False):
    """Full-sequence causal forward -> (B, L, V) logits.

    ``remat`` wraps each layer in ``jax.checkpoint``: the backward pass
    recomputes layer activations instead of keeping them live through the
    whole stack, cutting peak activation memory from O(n_layers · B·L·D)
    to O(B·L·D) at the cost of one extra forward — the standard
    HBM-for-FLOPs trade for long-sequence / deep-stack training."""
    B, L = tokens.shape
    h = params["tok"][tokens]
    cos, sin = params["cos"][:L], params["sin"][:L]
    mask = jnp.where(
        jnp.arange(L)[:, None] >= jnp.arange(L)[None, :], 0.0,
        -jnp.inf).astype(h.dtype)

    body = layer_dense
    if remat:
        body = jax.checkpoint(layer_dense, static_argnums=(5,))

    def layer(h, xs):
        return body(h, xs, cos, sin, mask, cfg), None

    layer_w = {k: params[k] for k in LAYER_KEYS}
    h, _ = jax.lax.scan(layer, h, layer_w)
    h = _rms(h, params["norm"])
    return h @ params["head_w"] + params["head_b"]


def loss_fn(params, tokens, targets, cfg, remat: bool = False):
    logits = forward_logits(params, tokens, cfg, remat=remat)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)
    return jnp.mean(nll)


def _ax(mesh: Mesh, name: str):
    """Axis name if the mesh has it, else None (replicated) — lets the
    decode/train helpers run on dp-only or tp-only meshes."""
    return name if name in mesh.axis_names else None


def cache_shardings(mesh: Mesh, cfg=None, kv_quant=None):
    """KV caches (N, B, S, Hkv, hd): batch sharded over dp, heads over tp.
    When GQA leaves fewer KV heads than tp ranks (Hkv % tp != 0 —
    NamedSharding placement requires exact divisibility), the head axis is
    replicated instead; attention stays correct, GSPMD reshards as
    needed.  Axes absent from the mesh are replicated (a dp-only batched
    decode is a legitimate configuration).

    ``kv_quant="int8"`` returns a TUPLE of shardings matching the
    (data, scale) tuple caches: the (N, B, S, Hkv) scales shard like the
    data minus the hd axis."""
    tp = mesh.shape.get("tp", 1)
    hkv = (cfg or {}).get("n_kv_heads")
    head = _ax(mesh, "tp") \
        if (hkv is None or tp <= 1 or hkv % tp == 0) else None
    data = named_sharding(mesh, None, _ax(mesh, "dp"), None, head, None)
    if kv_quant:
        return data, named_sharding(mesh, None, _ax(mesh, "dp"), None,
                                    head)
    return data


def forward_tokens(params, ck, cv, tokens, pos, cfg, starts=None,
                   win=None, emit_logits=False):
    """Cache-threaded forward of ``tokens`` (B, L) at absolute ``pos``.

    Returns ``(next_token (B,), ck, cv)``.  Same math as the single-chip
    decode (models/llama/model.py:_make_decode_fns) written over the
    layer-stacked SPMD param pytree, so dp x tp decode falls out of the
    sharding annotations: per-head attention is tp-local, GSPMD inserts the
    psum after the row-parallel O/down matmuls and an all-gather for the
    vocab-sharded logits argmax.

    The two serving hooks mirror the single-chip scan lane
    (models/llama/model.py forward_logits_one): ``starts`` (traced (B,)
    i32) lower-bounds each batch row's attention at its admission row —
    the continuous-batching slot-recycling mask; ``win`` (STATIC int)
    bounds the attention read to cache rows [0, win) for steps whose
    consumed outputs satisfy pos + L <= win.

    A :func:`quantize_params` pytree (``<k>_q``/``<k>_s`` keys, presence
    static per trace) routes every weight matmul through :func:`_qmm` —
    weight-only int8/int4 serving with the tp sharding schedule unchanged.

    int8 KV: ``ck``/``cv`` arriving as ``(int8 data, (N, B, S, Hkv) f32
    per-row scale)`` TUPLES (pytree structure static per trace) mirror
    the single-chip scan lane (models/llama/model.py
    forward_logits_one): fresh rows quantize with the fused kernel's
    exact ``quantize_kv`` scheme, the window read dequantizes inline —
    half the KV streaming and footprint, with the dp x tp sharding
    schedule unchanged (scales shard like the data minus the hd axis).
    Composes with :func:`quantize_params` weight quant.
    """
    B, L = tokens.shape
    H, D, S = cfg["n_heads"], cfg["dim"], cfg["max_seq_len"]
    if win is None or win > S:
        win = S
    q4 = "q4" in params
    hd = D // H
    Hkv = cfg.get("n_kv_heads", H)
    g = H // Hkv
    h = params["tok"][tokens]
    cos = jax.lax.dynamic_slice_in_dim(params["cos"], pos, L)
    sin = jax.lax.dynamic_slice_in_dim(params["sin"], pos, L)
    qpos = pos + jnp.arange(L)[:, None]
    jpos = jnp.arange(win)[None, :]
    allowed = jpos <= qpos
    if starts is not None:
        # (B, 1, L, win): broadcasts over the head axis in ``s + mask``
        allowed = allowed[None] & (jpos[None] >= starts[:, None, None])
        allowed = allowed[:, None]
    mask = jnp.where(allowed, 0.0, -jnp.inf).astype(jnp.float32)
    zero = jnp.zeros((), jnp.int32)
    pos32 = jnp.asarray(pos, jnp.int32)

    kvq = isinstance(ck, tuple)  # int8 KV: (data, scale) pairs
    if kvq:
        from ..ops.decode_step import quantize_kv

    def layer(h, xs):
        W, ck_i, cv_i = xs
        hn = _rms(h, W["in_norm"])
        q = _wmm(hn, W, "wq", q4).reshape(B, L, H, hd)
        k = _wmm(hn, W, "wk", q4).reshape(B, L, Hkv, hd)
        v = _wmm(hn, W, "wv", q4).reshape(B, L, Hkv, hd)
        q, k = _rope(q, cos, sin), _rope(k, cos, sin)
        if kvq:
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
            kk = (ck_i[0][:, :win].astype(jnp.float32)
                  * ck_i[1][:, :win, :, None]).astype(h.dtype)
            vv = (cv_i[0][:, :win].astype(jnp.float32)
                  * cv_i[1][:, :win, :, None]).astype(h.dtype)
        else:
            ck_i = jax.lax.dynamic_update_slice(ck_i, k, (zero, pos32,
                                                          zero, zero))
            cv_i = jax.lax.dynamic_update_slice(cv_i, v, (zero, pos32,
                                                          zero, zero))
            kk, vv = ck_i[:, :win], cv_i[:, :win]  # static live window
        if g > 1:
            kk, vv = jnp.repeat(kk, g, axis=2), jnp.repeat(vv, g, axis=2)
        s = jnp.einsum("blhd,bmhd->bhlm", q, kk,
                       preferred_element_type=jnp.float32) / math.sqrt(hd)
        p = jax.nn.softmax(s + mask, axis=-1).astype(h.dtype)
        att = jnp.einsum("bhlm,bmhd->blhd", p, vv).reshape(B, L, D)
        z = h + _wmm(att, W, "wo", q4)
        zn = _rms(z, W["post_norm"])
        gate = _wmm(zn, W, "gate", q4)
        up = _wmm(zn, W, "up", q4)
        return z + _wmm((gate * jax.nn.sigmoid(gate)) * up, W, "down",
                        q4), (ck_i, cv_i)

    layer_w = {k: params[k] for k in params
               if k in ("in_norm", "post_norm")
               or k.removesuffix("_q").removesuffix("_s") in _QUANT_MATS}
    h, (ck, cv) = jax.lax.scan(layer, h, (layer_w, ck, cv))
    hl = _rms(h, params["norm"])[:, -1]
    if "head_q" in params:
        logits = _qmm(hl, params["head_q"], params["head_s"],
                      q4).astype(jnp.float32)
    else:
        logits = (hl @ params["head_w"]).astype(jnp.float32)
    logits = logits + params["head_b"].astype(jnp.float32)
    if emit_logits:  # sampling path: the caller draws from these
        return logits, ck, cv
    return jnp.argmax(logits, axis=-1).astype(tokens.dtype), ck, cv


def make_decode_fns(mesh: Mesh, cfg):
    """Compiled SPMD (prefill, decode) pair over a dp x tp mesh."""
    p_sh = param_shardings(mesh)
    c_sh = cache_shardings(mesh, cfg)
    tok_sh = named_sharding(mesh, _ax(mesh, "dp"), None)

    @partial(jax.jit,
             in_shardings=(p_sh, c_sh, c_sh, tok_sh, None),
             donate_argnums=(1, 2))
    def prefill(params, ck, cv, tokens, pos):
        return forward_tokens(params, ck, cv, tokens, pos, cfg)

    @partial(jax.jit, static_argnames=("n_steps",), donate_argnums=(1, 2))
    def decode(params, ck, cv, last_tok, pos, n_steps):
        def step(carry, _):
            ck, cv, tok, p = carry
            nxt, ck, cv = forward_tokens(params, ck, cv, tok[:, None], p,
                                         cfg)
            return (ck, cv, nxt, p + 1), nxt

        pos = jnp.asarray(pos, jnp.int32)
        (ck, cv, tok, p), toks = jax.lax.scan(
            step, (ck, cv, last_tok, pos), None, length=n_steps)
        return ck, cv, toks  # (n_steps, B)

    return prefill, decode


def generate(params, prompt, max_new_tokens: int, mesh: Mesh, cfg,
             dtype=jnp.float32):
    """Greedy dp x tp-sharded generation: returns (B, max_new_tokens) ids.

    The multi-chip upgrade of the reference's single-stream
    ``Llama.generate`` (reference llm/llama/model.py:258-269): batch rows
    ride the dp axis, every weight matmul is Megatron-sharded over tp.
    """
    N, S, H, D = (cfg["n_layers"], cfg["max_seq_len"], cfg["n_heads"],
                  cfg["dim"])
    hd = D // H
    Hkv = cfg.get("n_kv_heads", H)
    B, L = prompt.shape
    if L + max_new_tokens - 1 > S:
        # dynamic_slice/dynamic_update_slice CLAMP rather than error, so
        # decoding past the cache end would silently reuse the last
        # rotary row and overwrite cache slot S-1 — fail loud instead
        raise ValueError(
            f"prompt length {L} + max_new_tokens {max_new_tokens} - 1 "
            f"exceeds max_seq_len {S}")
    c_sh = cache_shardings(mesh, cfg)
    ck = jax.device_put(jnp.zeros((N, B, S, Hkv, hd), dtype), c_sh)
    cv = jax.device_put(jnp.zeros((N, B, S, Hkv, hd), dtype), c_sh)
    prompt = jax.device_put(jnp.asarray(prompt, jnp.int32),
                            named_sharding(mesh, _ax(mesh, "dp"), None))

    prefill, decode = make_decode_fns(mesh, cfg)
    tok, ck, cv = prefill(params, ck, cv, prompt, 0)
    if max_new_tokens == 1:
        return np.asarray(tok)[:, None]
    ck, cv, toks = decode(params, ck, cv, tok, L, max_new_tokens - 1)
    return np.concatenate([np.asarray(tok)[:, None],
                           np.asarray(toks).T], axis=1)


def make_train_step(mesh: Mesh, cfg, lr: float = 1e-3, remat: bool = False):
    """Compiled SPMD train step: batch sharded dp, params sharded tp.

    Returns ``step(params, tokens, targets) -> (params, loss)``; GSPMD
    derives the dp gradient psum and the tp activation collectives from the
    in/out shardings.  ``remat`` enables per-layer activation checkpointing
    (see ``forward_logits``) — same losses, O(1)-in-depth activation
    memory.
    """
    p_sh = param_shardings(mesh)
    batch_sh = named_sharding(mesh, _ax(mesh, "dp"), None)
    scalar_sh = named_sharding(mesh)

    @partial(jax.jit,
             in_shardings=(p_sh, batch_sh, batch_sh),
             out_shardings=(p_sh, scalar_sh),
             donate_argnums=(0,))
    def step(params, tokens, targets):
        loss, grads = jax.value_and_grad(
            lambda p, t, y: loss_fn(p, t, y, cfg, remat=remat))(
                params, tokens, targets)
        new_params = jax.tree.map(lambda p, g: p - lr * g, params, grads)
        return new_params, loss

    return step
