"""BLAS decode lane: the CPU-platform greedy decode path.

The XLA:CPU decode scan pays per-step executable overhead and misses
OpenBLAS's tuned GEMV on the small matvecs that dominate a 15M-param
decode (measured ~72 tok/s vs the reference loop's ~125-165 on this box;
ROADMAP.md "CPU backend").  On CPU the decode is MEMORY-BOUND — every
token streams all ~60 MB of f32 weights through one core — so the right
design is the one the reference uses (/root/reference/llm/llama/
model.py:61-121, 258-269): a NumPy loop whose matvecs are straight BLAS
GEMV calls, with no executable or dispatch layer at all.  This lane
exists for parity on the reference's own platform; TPU paths are the
product.

What makes it FASTER than the reference's loop on the same box:
* zero per-step copies — every ``astype`` here is ``copy=False``; the
  reference's module path materialises several Tensor temporaries per op
  (55% of a naive port's time was astype copies, measured);
* matrices are stored (out, in) C-contiguous and applied as ``W @ x`` —
  the no-transpose row-major GEMV streams each weight row sequentially
  into a scalar dot, the fastest single-core access pattern;
* QKV and gate/up are fused into single GEMVs; RMS-norm gains are folded
  into the following matrix's rows at build time, so a norm is just
  (x / rms) with no elementwise-scale pass;
* head-major KV caches: the per-step attention is two batched GEMVs over
  contiguous views, and GQA folds the query-head group into the batch
  axis — no K/V repeat materialises.

Differences from the reference loop (deliberate, same as the XLA path):
decode positions are correct (the reference feeds token L at start_pos
L+1, leaving cache slot L zeroed — model.py:259-265).

The math mirrors ``model._make_decode_fns``'s ``forward_logits_one`` in
f32 (norm-gain folding is algebraically exact: (n*g) @ W == n @ (g*W) up
to one f32 rounding), so its stream agrees with the XLA lane's except at
exact float ties.
"""
from __future__ import annotations

import numpy as np


def _f32(x):
    return x if x.dtype == np.float32 else x.astype(np.float32)


def build_np_weights(model):
    """NumPy decode-weight snapshot, laid out for single-core BLAS:
    every matrix transposed to (out, in) C-contiguous (no-trans GEMV),
    RMS-norm gains folded into the rows of the matrix that consumes the
    normed vector.  Built from ``model._weights()`` (LoRA deltas and the
    layer stacking ride along); cached by ``generate`` under the
    ("numpy",) weights-cache key."""
    raw = {k: np.asarray(v) for k, v in model._weights(None).items()}
    N = model.n_layers

    def t(a):  # (in, out) -> C-contiguous (out, in)
        return np.ascontiguousarray(np.swapaxes(a, -1, -2))

    w = {
        "tok": raw["tok"],
        "cos": _f32(raw["cos"]),
        "sin": _f32(raw["sin"]),
        # norm gains fold into the consuming matrix: rows of W.T scale by
        # g along the *input* axis, i.e. columns of (out, in) scale by g
        "wqkv": t(raw["wqkv"]) * raw["in_norm"][:, None, :],
        "wo": t(raw["wo"]),
        "wgu": t(raw["wgu"]) * raw["post_norm"][:, None, :],
        "down": t(raw["down"]),
        "head_w": _f32(t(raw["head_w"])) * _f32(raw["norm"])[None, :],
        "head_b": _f32(raw["head_b"]),
    }
    assert all(w[k].flags.c_contiguous
               for k in ("wqkv", "wo", "wgu", "down", "head_w"))
    assert w["wqkv"].shape[0] == N
    return w


def _inv_rms(x):
    x32 = _f32(x)
    return 1.0 / np.sqrt(np.mean(x32 * x32) + 1e-6)


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
    """Head-major KV caches: (N, Hkv, S, hd) — the [i, :, :pos+1] slices
    are views whose batched matmuls need no copy."""

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
        # in_norm gain is folded into wqkv's columns
        qkv = w["wqkv"][i] @ (h * _inv_rms(h))     # (D+2*Dkv,) GEMV
        q = _rope(qkv[:D].reshape(H, hd), cos, sin)
        k = _rope(qkv[D:D + Dkv].reshape(Hkv, hd), cos, sin)
        st.k[i, :, pos] = k
        st.v[i, :, pos] = qkv[D + Dkv:].reshape(Hkv, hd)
        kk = st.k[i, :, :m]                        # (Hkv, m, hd) view
        vv = st.v[i, :, :m]
        # scores: fold the query-head group into the batch axis — GQA
        # needs no K/V repeat.  (Hkv, m, hd) @ (Hkv, hd, g) -> (Hkv, m, g)
        qg = q.reshape(Hkv, g, hd)
        s = _f32(kk @ qg.transpose(0, 2, 1)) * scale
        s -= s.max(axis=1, keepdims=True)
        p = np.exp(s)
        p /= p.sum(axis=1, keepdims=True)
        # (Hkv, g, m) @ (Hkv, m, hd) -> (Hkv, g, hd) == (H, hd)
        att = (p.transpose(0, 2, 1).astype(h.dtype, copy=False)
               @ vv).reshape(D)
        z = h + w["wo"][i] @ att
        gu = w["wgu"][i] @ (z * _inv_rms(z))       # (2F,) GEMV
        gate, up = gu[:F], gu[F:]
        with np.errstate(over="ignore"):           # exp(-x)->inf is exact 0
            ff = (gate / (1.0 + np.exp(-gate))) * up
        h = z + w["down"][i] @ ff
    if not want_logits:
        return None
    hn = _f32(h * _inv_rms(h))
    return w["head_w"] @ hn + w["head_b"]


_DRAW = None  # module-cached jitted draw: jax.jit caches per function
# OBJECT, so a per-call closure would retrace/reload on every sampled
# generate() — measured 0.4-2 s per short request vs ~0 amortized


def _get_draw():
    global _DRAW
    if _DRAW is None:
        import jax
        from functools import partial

        from .model import _mark_seen, sample_logits

        # placement rides the committed key/seen arrays (created under
        # default_device(cpu) by the caller): even with the TPU plugin
        # active, the per-token draw never touches the tunnel
        @partial(jax.jit, static_argnames=("top_k", "top_p", "rep"))
        def draw(logits, key, seen, tvec, top_k, top_p, rep):
            key, sub = jax.random.split(key)
            nxt = sample_logits(logits[None, :], sub, tvec, top_k, top_p,
                                seen, rep)
            return nxt[0], key, _mark_seen(seen, nxt)

        _DRAW = draw
    return _DRAW


def _make_sampler(model, temperature, top_k, top_p, seed,
                  repetition_penalty, prompt_ids):
    """Per-token sampling closure for the numpy lane, built on the SAME
    ``sample_logits`` / key-split schedule as the XLA scan lane
    (``model._make_sample_fns``): one split per token starting from
    ``PRNGKey(seed)``, ``seen`` marked with the prompt iff a repetition
    penalty is active.  So a sampled numpy-lane stream matches the XLA
    lane's token-for-token (up to f32 rounding-order near-ties, exactly
    like greedy).  The jax work per token is one jitted (1, V) filter +
    categorical draw, pinned to the CPU backend — dispatch overhead is
    tens of us against the lane's multi-ms GEMV budget."""
    import jax
    import jax.numpy as jnp

    cpu = jax.local_devices(backend="cpu")[0]
    rep = (float(repetition_penalty)
           if repetition_penalty is not None else None)

    draw = _get_draw()
    with jax.default_device(cpu):
        key = jax.random.PRNGKey(seed)
        seen = jnp.zeros((1, model.vocab_size), bool)
        if rep is not None:  # prompt tokens count as seen
            seen = seen.at[0, jnp.asarray(prompt_ids)].set(True)
        tvec = jnp.float32(temperature)

    state = {"key": key, "seen": seen}

    def sample(logits):
        # device_put pins the logits to CPU explicitly: a bare jnp.asarray
        # would eagerly land them on the DEFAULT backend — a per-token
        # round trip through the TPU tunnel when the plugin is active
        nxt, state["key"], state["seen"] = draw(
            jax.device_put(_f32(logits), cpu), state["key"], state["seen"],
            tvec, top_k, top_p, rep)
        return int(nxt)

    return sample


def numpy_decode(model, w, input_ids, total, temperature=None, top_k=None,
                 top_p=None, seed=0, repetition_penalty=None):
    """Decode generator: yields np int token ids (host scalars), starting
    with the token after the prompt, until the sequence reaches ``total``
    (same TOTAL-length contract as ``Llama.generate``).  Greedy by
    default; ``temperature > 0`` samples with the XLA lane's exact
    ``sample_logits`` semantics and key schedule (see ``_make_sampler``).
    B == 1 only; the caller routes other shapes to the XLA lane."""
    ids = [int(t) for t in np.asarray(input_ids).reshape(-1)]
    L = len(ids)
    if temperature is not None and temperature > 0:
        pick = _make_sampler(model, temperature, top_k, top_p, seed,
                             repetition_penalty, ids)
    else:
        def pick(logits):
            return int(np.argmax(logits))
    st = _State(model, w["tok"].dtype)
    for pos, tok in enumerate(ids):           # prefill, one token at a time
        logits = _advance(model, w, st, tok, pos, pos == L - 1)
    tok = pick(logits)
    yield tok
    for pos in range(L, total - 1):
        logits = _advance(model, w, st, tok, pos, True)
        tok = pick(logits)
        yield tok
