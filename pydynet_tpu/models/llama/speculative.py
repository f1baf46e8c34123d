"""Prompt-lookup speculative decoding for the Llama XLA decode path.

Extension beyond the reference (its ``generate`` is strictly one token
per forward, /root/reference/llm/llama/model.py:258-269): draft the next
``K`` tokens by n-gram lookup over the sequence generated so far
("prompt lookup decoding" — the draft model is the text itself), then
verify all K in ONE teacher-forced forward and keep the longest correct
prefix plus the bonus token the verifier produces anyway.

The output stream is EXACTLY the greedy stream — a draft only ever
changes how many tokens one dispatch yields, never which tokens: every
emitted token is an argmax of the target model at its own position.
Per-iteration cost is one (1, K+1)-token forward, which at decode batch
sizes is weight-streaming-bound like a single-token step, so acceptance
of ``a`` drafts amortizes the weight stream over ``a+1`` tokens.
TPU-shaped: every iteration has static shapes (a fixed (S, g) match
scan, a fixed (1, K+1) verify forward, a fixed K+1-row cache write), so
the whole accept-variable loop is ONE compiled ``lax.while_loop`` with
no host round trips; only the final sequence reads back.

Cache discipline: the verify forward writes K+1 KV rows at positions
[n-1, n+K-1].  Rows past the accepted prefix hold rejected-token KV, but
the next iteration starts at n' = n+a+1 <= n+K and rewrites every
polluted row before any later query can attend it (queries at position p
only read rows <= p, and all rows <= p are rewritten by the dispatch
that computes p).  Same argument for the ``seq`` buffer itself.
"""
import functools

import numpy as np


def lookup_draft(seq, n, K: int, g: int):
    """Prompt-lookup draft: the K tokens that followed the most recent
    strictly-earlier occurrence of the trailing g-gram ``seq[n-g:n]``.
    Pure and fixed-shape: (S,) i32 buffer + scalar n -> (K,) i32 draft.
    With no earlier occurrence the draft is an arbitrary in-bounds window
    — verification rejects bad drafts, so draft choice can only affect
    speed, never the emitted tokens.  The window may extend past ``n``
    into not-yet-final buffer positions; those are the model's own
    just-verified continuations, which is itself a useful guess."""
    import jax
    import jax.numpy as jnp

    S = seq.shape[0]
    gram = jax.lax.dynamic_slice(seq, (n - g,), (g,))
    wins = jnp.stack([jnp.roll(seq, -i) for i in range(g)], 1)
    pidx = jnp.arange(S, dtype=jnp.int32)
    match = jnp.all(wins == gram[None, :], axis=1) \
        & (pidx <= n - g - 1)  # strictly earlier occurrence
    pstar = jnp.max(jnp.where(match, pidx, np.int32(-1)))
    dstart = jnp.clip(pstar + g, 0, np.int32(S - K))
    return jax.lax.dynamic_slice(seq, (dstart,), (K,))


def spec_accept_extra(logits, draft, key, temperature, top_k, top_p):
    """One speculative-SAMPLING acceptance step (Leviathan et al. with a
    deterministic draft): ``logits`` (K+1, V) f32 at positions n..n+K,
    ``draft`` (K,).  Returns ``(toks (K+1,), a)``: ``toks[:a]`` are the
    accepted drafts and ``toks[a]`` the extra emitted token — the residual
    draw at the first rejection, or the bonus draw when all K accept.

    With a point-mass draft q = delta(draft_j), accepting with probability
    p_j(draft_j) and otherwise sampling from p_j with draft_j masked out
    (renormalized) emits EXACTLY p_j at every position — the filtered
    sampling distribution is preserved, speculation only changes
    tokens/dispatch."""
    import jax
    import jax.numpy as jnp

    from .model import filter_logits

    K = draft.shape[0]
    V = logits.shape[-1]
    f = filter_logits(logits, temperature, top_k, top_p)     # (K+1, V)
    logp = f - jax.scipy.special.logsumexp(f, -1, keepdims=True)
    kacc, kres = jax.random.split(key)
    u = jax.random.uniform(kacc, (K,))
    p_draft = jnp.exp(logp[jnp.arange(K), draft])
    a = jnp.sum(jnp.cumprod((u < p_draft).astype(jnp.int32)),
                dtype=jnp.int32)  # leading accepts
    row = logp[a]
    da = draft[jnp.minimum(a, K - 1)]
    # residual (p - q)+ renormalized = p without the rejected draft token;
    # at a == K the row is the untouched bonus distribution p_K
    row = jnp.where((a < K) & (jnp.arange(V) == da), -jnp.inf, row)
    extra = jax.random.categorical(kres, row).astype(draft.dtype)
    toks = jnp.concatenate([draft, jnp.zeros((1,), draft.dtype)])
    # positions > a are never final (rewritten before read); filling them
    # with `extra` keeps the write one fixed-shape dynamic_update_slice
    toks = jnp.where(jnp.arange(K + 1) < a, toks, extra)
    return toks, a


def build_spec_chunk(model, K: int, g: int, top_k=None, top_p=None,
                     sampling: bool = False):
    """Compile the speculative decode loop for draft length ``K`` and
    n-gram size ``g``.  Returns ``spec_chunk(weights, ck, cv, seq, n0,
    limit[, key, temperature]) -> (ck, cv, seq, n, iters, accepted[,
    key])`` where ``seq`` is the (S,) i32 sequence buffer holding the
    stream in positions [0, n).  ``sampling=True`` verifies by the
    accept/residual rule of :func:`spec_accept_extra` (temperature is
    traced; top_k/top_p are trace-time constants like the plain sampled
    decode)."""
    import jax
    import jax.numpy as jnp

    if model._decode_fns is None:
        model._decode_fns = model._make_decode_fns()
    fwd_all = model._xla_forward_logits_all
    S = model.max_seq_len
    assert 1 <= g < S and 1 <= K <= S - 2, (g, K, S)

    @functools.partial(jax.jit, donate_argnames=("ck", "cv", "seq"))
    def spec_chunk(weights, ck, cv, seq, n0, limit, key=None,
                   temperature=None):
        limit = jnp.minimum(jnp.asarray(limit, jnp.int32), np.int32(S))

        def cond(c):
            n = c[3]
            # the verify forward writes K+1 cache rows at [n-1, n+K-1]
            # and yields at most K+1 tokens at [n, n+K]
            return n + K + 1 <= limit

        def body(c):
            ck, cv, seq, n, it, acc, key = c
            draft = lookup_draft(seq, n, K, g)
            # ---- verify: one teacher-forced forward over [last, draft] ----
            last = jax.lax.dynamic_slice(seq, (n - 1,), (1,))
            toks_in = jnp.concatenate([last, draft])[None]  # (1, K+1)
            logits, ck, cv = fwd_all(weights, ck, cv, toks_in, n - 1)
            if sampling:
                key, sub = jax.random.split(key)
                toks, a = spec_accept_extra(logits[0], draft, sub,
                                            temperature, top_k, top_p)
                toks = toks.astype(seq.dtype)
            else:
                # am[j] is the target's greedy token for position n+j
                toks = jnp.argmax(logits, -1)[0].astype(seq.dtype)  # (K+1,)
                a = jnp.sum(jnp.cumprod(
                    (draft == toks[:K]).astype(jnp.int32)),
                    dtype=jnp.int32)  # leading accepts
            # all K+1 verified tokens land in seq; only [n, n+a] are
            # final — the rest is rewritten before anything reads it
            seq = jax.lax.dynamic_update_slice(seq, toks, (n,))
            return ck, cv, seq, n + a + 1, it + 1, acc + a, key

        if key is None:
            key = jax.random.PRNGKey(0)  # unused by the greedy body
        ck, cv, seq, n, it, acc, key = jax.lax.while_loop(
            cond, body,
            (ck, cv, seq, jnp.asarray(n0, jnp.int32), jnp.int32(0),
             jnp.int32(0), key))
        return ck, cv, seq, n, it, acc, key

    return spec_chunk


def generate_speculative(model, input_ids, max_new_tokens: int, *,
                         draft_k: int = 7, ngram: int = 3, dtype=None,
                         temperature: float = 0.0, top_k: int = None,
                         top_p: float = None, seed: int = 0):
    """Generation with prompt-lookup speculation (B=1).

    Returns ``(tokens, stats)``: ``tokens`` is the (total - L,) i64 array
    of generated ids — BIT-IDENTICAL to ``generate(temperature=0,
    fused=False)``'s stream (same XLA forward, same argmax; drafts are
    verified, so acceptance only affects speed) — and ``stats`` reports
    ``{iterations, accepted_drafts, tokens, tokens_per_dispatch}``.
    ``max_new_tokens`` bounds the TOTAL length (reference quirk,
    model.py:259).

    ``temperature > 0`` switches the verifier to speculative SAMPLING
    (:func:`spec_accept_extra`): every emitted token is distributed
    exactly by the filtered sampling distribution (temperature /
    top_k / top_p), deterministic under ``seed`` — but it is a different
    random stream than ``generate(temperature=...)``'s one-draw-per-step
    scan, so the two sampled streams are equal in LAW, not token-for-
    token.  top_k=1 (or temperature=0) degenerates to the exact greedy
    stream."""
    import jax
    import jax.numpy as jnp

    ids = np.asarray(input_ids)
    assert ids.ndim == 2 and ids.shape[0] == 1, \
        "speculative decoding targets the B=1 latency path"
    L = ids.shape[1]
    S = model.max_seq_len
    total = min(max_new_tokens, S)
    if total <= L:
        return np.zeros((0,), np.int64), {"iterations": 0,
                                          "accepted_drafts": 0, "tokens": 0,
                                          "tokens_per_dispatch": 0.0}
    if model._decode_fns is None:
        model._decode_fns = model._make_decode_fns()
    prefill, decode_chunk = model._decode_fns
    sampling = temperature is not None and temperature > 0
    if sampling:
        if model._sample_fns is None:
            model._sample_fns = model._make_sample_fns()
        prefill_s, decode_s = model._sample_fns
        rkey = jax.random.PRNGKey(seed)
        tvec = jnp.float32(temperature)

    key = (np.dtype(dtype).name if dtype else "native", False, None)
    weights = model._weights_cache.get(key)
    if weights is None:
        weights = model._weights(dtype)
        model._weights_cache[key] = weights

    ck, cv = model._empty_caches(1, weights["tok"].dtype)
    # bucketed prefill — the pad/last_idx pairing is correctness-critical
    # and shared with Llama.generate via one helper
    from .model import bucket_prompt
    ids_pad, last_idx = bucket_prompt(ids, L, S)
    if sampling:
        tok, ck, cv, rkey, _ = prefill_s(
            weights, ck, cv, jnp.asarray(ids_pad, jnp.int32), 0, rkey,
            tvec, top_k, top_p, None, last_idx)
    else:
        tok, ck, cv = prefill(weights, ck, cv,
                              jnp.asarray(ids_pad, jnp.int32), 0, last_idx)

    seq = jnp.zeros((S,), jnp.int32)
    seq = seq.at[:L].set(jnp.asarray(ids[0], jnp.int32))
    seq = seq.at[L].set(tok[0].astype(jnp.int32))

    skey = (draft_k, ngram, bool(sampling), top_k, top_p)
    spec = model._spec_fns.get(skey)
    if spec is None:
        spec = model._spec_fns[skey] = build_spec_chunk(
            model, draft_k, ngram, top_k=top_k, top_p=top_p,
            sampling=sampling)
    if sampling:
        rkey, sub = jax.random.split(rkey)
        ck, cv, seq, n, it, acc, _ = spec(weights, ck, cv, seq, L + 1,
                                          total, sub, tvec)
    else:
        ck, cv, seq, n, it, acc, _ = spec(weights, ck, cv, seq, L + 1,
                                          total)

    # ONE host round trip for all three loop scalars: device_get overlaps
    # the transfers (copy_to_host_async), where int() three times pays the
    # remote tunnel's ~30 ms RTT once per scalar (measured via SPECBENCH)
    n, it, acc = (int(v) for v in jax.device_get((n, it, acc)))
    rem = total - n  # < K+1 tail: plain single-token steps
    if rem > 0:
        # the decode chunks take the position OF last (row n-1 is
        # unwritten: the spec loop only caches rows for tokens it fed back)
        last = jnp.asarray(seq[n - 1], jnp.int32).reshape(1)
        if sampling:
            V = model.vocab_size
            seen = jnp.zeros((1, V), bool)
            ck, cv, toks, rkey, seen = decode_s(
                weights, ck, cv, last, n - 1, rkey, tvec, rem, top_k,
                top_p, None, seen)
        else:
            ck, cv, toks = decode_chunk(weights, ck, cv, last, n - 1, rem)
        seq = seq.at[n:n + rem].set(toks[:, 0].astype(jnp.int32))

    out = np.asarray(seq)[L:total].astype(np.int64)
    dispatches = it + max(rem, 0) + 1  # +1 prefill
    stats = {"iterations": it, "accepted_drafts": acc,
             "tail_tokens": max(rem, 0),  # plain steps after the loop
             "tokens": int(total - L),
             "tokens_per_dispatch": float(total - L) / max(dispatches, 1)}
    return out, stats
