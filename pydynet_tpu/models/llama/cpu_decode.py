"""BLAS decode lane: the CPU-platform greedy decode path.

The XLA:CPU decode scan pays per-step executable overhead and misses
OpenBLAS's tuned GEMV on the small matvecs that dominate a 15M-param
decode (measured ~67 tok/s vs the reference's NumPy loop; ROADMAP.md
"CPU backend").  On CPU the decode is MEMORY-BOUND — every token streams
all ~60 MB of f32 weights through one core — so the right design is the
same one the reference uses (/root/reference/llm/llama/model.py:61-121,
258-269): a NumPy loop whose matvecs are straight BLAS sgemv calls, with
no executable or dispatch layer at all.  This lane exists for parity on
the reference's own platform; TPU paths are the product.

Differences from the reference loop (deliberate, same as the XLA path):
* decode positions are correct (the reference feeds token L at start_pos
  L+1, leaving cache slot L zeroed — model.py:259-265);
* attention reads only the live rows [0, pos] (like the reference) and
  the caches are stored head-major so the per-step attention is two
  batched GEMVs over contiguous views, no per-step relayout;
* GQA (n_kv_heads < n_heads) is supported by folding the query-head
  group into the GEMV batch axis — no K/V repeat materialises.

The math mirrors ``model._make_decode_fns``'s ``forward_logits_one`` op
for op in f32 (fused QKV / gate-up matmuls, f32 softmax and norms), so
its stream agrees with the XLA lane's except at exact float ties.
"""
from __future__ import annotations

import numpy as np


def build_np_weights(model):
    """NumPy view of the stacked decode weights (``model._weights()``),
    plus the head-major cache template.  Cached by ``generate`` under the
    ("numpy",) weights-cache key."""
    w = {k: np.asarray(v) for k, v in model._weights(None).items()}
    return w


def _rms(x, g):
    x32 = x.astype(np.float32)
    n = x32 * (1.0 / np.sqrt(np.mean(x32 * x32) + 1e-6))
    return (n * g).astype(x.dtype)


def _rope(x, cos, sin):
    """x (heads, hd); cos/sin (hd//2,) — interleaved-pair rotation
    (mirrors model._rope_pure)."""
    xr = x[..., 0::2]
    xi = x[..., 1::2]
    out = np.empty_like(x)
    out[..., 0::2] = xr * cos - xi * sin
    out[..., 1::2] = xr * sin + xi * cos
    return out


class _State:
    """Head-major KV caches: K as (N, Hkv, S, hd), V as (N, Hkv, S, hd) —
    the [i, :, :pos+1] slices are views whose batched matmuls need no
    copy."""

    def __init__(self, model, dtype):
        N, S = model.n_layers, model.max_seq_len
        Hkv, hd = model.n_kv_heads, model.head_dim
        self.k = np.zeros((N, Hkv, S, hd), dtype)
        self.v = np.zeros((N, Hkv, S, hd), dtype)


def _advance(model, w, st, tok, pos, want_logits):
    """One token through all layers; returns f32 logits (V,) or None."""
    N = model.n_layers
    H, Hkv, hd = model.n_heads, model.n_kv_heads, model.head_dim
    g = H // Hkv
    D = H * hd
    Dkv = Hkv * hd
    F = model.ffn_dim
    scale = 1.0 / np.sqrt(hd)

    h = w["tok"][tok]
    cos = w["cos"][pos]
    sin = w["sin"][pos]
    m = pos + 1
    for i in range(N):
        hn = _rms(h, w["in_norm"][i])
        qkv = hn @ w["wqkv"][i]               # fused (D, D+2*Dkv) GEMV
        q = _rope(qkv[:D].reshape(H, hd), cos, sin)
        k = _rope(qkv[D:D + Dkv].reshape(Hkv, hd), cos, sin)
        st.k[i, :, pos] = k
        st.v[i, :, pos] = qkv[D + Dkv:].reshape(Hkv, hd)
        kk = st.k[i, :, :m]                   # (Hkv, m, hd) view
        vv = st.v[i, :, :m]
        # scores: fold the query-head group into the batch axis — GQA
        # needs no K/V repeat.  (Hkv, m, hd) @ (Hkv, hd, g) -> (Hkv, m, g)
        qg = q.reshape(Hkv, g, hd)
        s = (kk @ qg.transpose(0, 2, 1)) * scale
        s = s.astype(np.float32)
        s -= s.max(axis=1, keepdims=True)
        p = np.exp(s)
        p /= p.sum(axis=1, keepdims=True)
        # (Hkv, g, m) @ (Hkv, m, hd) -> (Hkv, g, hd) == (H, hd)
        att = (p.transpose(0, 2, 1).astype(h.dtype) @ vv).reshape(D)
        z = h + att @ w["wo"][i]
        zn = _rms(z, w["post_norm"][i])
        gu = zn @ w["wgu"][i]                 # fused (D, 2F) GEMV
        gate, up = gu[:F], gu[F:]
        with np.errstate(over="ignore"):      # exp(-x) -> inf is exact 0
            ff = (gate / (1.0 + np.exp(-gate))) * up
        h = z + ff @ w["down"][i]
    if not want_logits:
        return None
    hn = _rms(h, w["norm"])
    return hn.astype(np.float32) @ w["head_w"].astype(np.float32) \
        + w["head_b"].astype(np.float32)


def numpy_decode(model, w, input_ids, total):
    """Greedy-decode generator: yields np int token ids (host scalars),
    starting with the token after the prompt, until the sequence reaches
    ``total`` (same TOTAL-length contract as ``Llama.generate``).
    B == 1 only; the caller routes other shapes to the XLA lane."""
    ids = [int(t) for t in np.asarray(input_ids).reshape(-1)]
    L = len(ids)
    st = _State(model, w["tok"].dtype)
    for pos, tok in enumerate(ids):           # prefill, one token at a time
        logits = _advance(model, w, st, tok, pos, pos == L - 1)
    tok = int(np.argmax(logits))
    yield tok
    for pos in range(L, total - 1):
        logits = _advance(model, w, st, tok, pos, True)
        tok = int(np.argmax(logits))
        yield tok
