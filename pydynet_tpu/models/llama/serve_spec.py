"""Speculative continuous-batching serving: per-slot prompt-lookup
speculation inside the fleet protocol.

``LlamaServer(speculative=K)`` routes here.  The shared-position slot
protocol (serve.py) cannot express speculation — one verify iteration
advances each slot by a VARIABLE 1..K+1 tokens (its own accepted-draft
count), so slots decode at different rates.  This engine generalizes the
fleet to **per-slot positions**:

* each slot owns its cache rows independently: row ``p`` of slot ``b``
  holds the KV of that slot's token at position ``p``, and attention for
  a query at position ``q`` reads rows ``[0, q]`` of its own slot only —
  so admission writes a fresh prompt at rows ``[0, L)`` with NO
  position-shift rotation and NO ``starts`` mask (the shared-position
  server needs both): stale rows of the previous tenant sit strictly
  ABOVE the new slot position and are rewritten before any query can
  attend them (the same argument as ``speculative.build_spec_chunk``'s
  cache discipline, per slot);
* one verify iteration is ONE batched teacher-forced forward of
  ``(B, K+1)`` tokens at per-row positions (``n_b - 1``): per-row RoPE
  table gathers, per-row cache-row scatters, per-row causal masks —
  all fixed-shape, so a chunk of ``iters`` iterations is ONE compiled
  ``lax.scan`` program with no host round trips;
* drafting is ``speculative.lookup_draft`` vmapped over the per-slot
  (S,) sequence buffers — the draft model is each request's own text;
* acceptance per slot ``a_b`` = leading drafts matching the verifier's
  argmax; ``n_b += a_b + 1``; a slot without headroom
  (``n_b + K + 1 > S``) stops advancing (its writes are dropped) and is
  truncated by the host at the next readback.

The emitted stream per request is EXACTLY the greedy stream (drafts are
verified; acceptance only changes tokens/dispatch — speculative.py
module doc).  Greedy-only: speculative SAMPLING per-slot needs traced
per-row filter cutoffs inside the accept rule; submit() rejects sampled
requests loudly.

Extension beyond the reference (its generate is one token per forward
per single stream, /root/reference/llm/llama/model.py:258-269).
"""
from __future__ import annotations

from functools import partial

import numpy as np

from .serve import _FleetScheduler
from .speculative import lookup_draft


def build_spec_fleet_fns(model, K: int, g: int, iters: int):
    """Compiled (admit_many, spec_chunk) pair for the per-slot-position
    speculative fleet.  ``spec_chunk`` runs ``iters`` verify iterations
    for every slot in one program; returns the updated (ck, cv, seq, n).

    The forward is ``forward_logits_one``'s math (model.py) generalized
    to per-row positions; quantized weight pytrees (``_weights_xq``)
    ride the same ``qmatmul`` routing."""
    import jax
    import jax.numpy as jnp

    from .model import _rope_pure

    S = model.max_seq_len
    H, hd = model.n_heads, model.head_dim
    Hkv = model.n_kv_heads
    gq = H // Hkv
    scale = 1.0 / np.sqrt(hd).astype(np.float32)
    import math as _math
    scale = 1.0 / _math.sqrt(hd)

    def rms(x, w):
        x32 = x.astype(jnp.float32)
        nn = x32 * jax.lax.rsqrt(jnp.mean(x32 * x32, -1,
                                          keepdims=True) + 1e-6)
        return (nn * w).astype(x.dtype)

    def fwd_rows(weights, ck, cv, tokens, pos_b, win):
        """(B, L) tokens at PER-ROW absolute positions ``pos_b`` (B,);
        returns ((B, L, V) f32 logits, ck, cv).  Row writes land at cache
        rows [pos_b, pos_b + L) of each slot (out-of-range rows are
        dropped — the stalled-slot case); attention reads each row's own
        causal window."""
        B, L = tokens.shape
        q4 = "q4" in weights
        interp = "xinterp" in weights
        if any(k.endswith("_xq") for k in weights):
            from ...ops.gemv_quant import qmatmul

        def mm(x, W, name):
            if name + "_xq" not in W:
                return x @ W[name]
            y = qmatmul(x.reshape(-1, x.shape[-1]), W[name + "_xq"],
                        W[name + "_xs"], q4=q4, interpret=interp)
            return y.reshape(x.shape[:-1] + y.shape[-1:]).astype(x.dtype)

        rows = pos_b[:, None] + jnp.arange(L, dtype=jnp.int32)[None]
        h = weights["tok"][tokens]
        # per-row RoPE tables: gather (B, L, hd/2); _rope_pure broadcasts
        # them over heads
        cos = weights["cos"][rows]
        sin = weights["sin"][rows]
        jpos = jnp.arange(win, dtype=jnp.int32)
        # (B, 1, L, win): each query attends its own rows [0, qpos]
        mask = jnp.where(jpos[None, None, None, :]
                         <= rows[:, None, :, None], 0.0,
                         -jnp.inf).astype(jnp.float32)
        bidx = jnp.arange(B, dtype=jnp.int32)[:, None]
        D = H * hd
        Dkv = Hkv * hd

        def layer(h, xs):
            W, ck_i, cv_i = xs
            hn = rms(h, W["in_norm"])
            qkv = mm(hn, W, "wqkv")
            q = qkv[..., :D].reshape(B, L, H, hd)
            k = qkv[..., D:D + Dkv].reshape(B, L, Hkv, hd)
            v = qkv[..., D + Dkv:].reshape(B, L, Hkv, hd)
            q = _rope_pure(q, cos.astype(q.dtype), sin.astype(q.dtype))
            k = _rope_pure(k, cos.astype(k.dtype), sin.astype(k.dtype))
            # per-row scatter at each slot's own rows; mode="drop"
            # discards writes past the cache end (stalled slots)
            ck_i = ck_i.at[bidx, rows].set(k, mode="drop")
            cv_i = cv_i.at[bidx, rows].set(v, mode="drop")
            kk, vv = ck_i[:, :win], cv_i[:, :win]
            if gq != 1:
                kk = jnp.repeat(kk, gq, axis=2)
                vv = jnp.repeat(vv, gq, axis=2)
            s = jnp.einsum("blhd,bmhd->bhlm", q, kk,
                           preferred_element_type=jnp.float32) * scale
            p = jax.nn.softmax(s + mask, axis=-1).astype(h.dtype)
            att = jnp.einsum("bhlm,bmhd->blhd", p, vv).reshape(B, L, -1)
            z = h + mm(att, W, "wo")
            zn = rms(z, W["post_norm"])
            gu = mm(zn, W, "wgu")
            gate, up = jnp.split(gu, 2, axis=-1)
            ff = (gate * jax.nn.sigmoid(gate)) * up
            return z + mm(ff, W, "down"), (ck_i, cv_i)

        layer_w = {k: weights[k] for k in weights
                   if k in ("in_norm", "post_norm")
                   or k.removesuffix("_xq").removesuffix("_xs")
                   in ("wqkv", "wo", "wgu", "down")}
        nl = weights["in_norm"].shape[0]
        h, (ck, cv) = jax.lax.scan(layer, h, (layer_w, ck, cv),
                                   unroll=True if nl <= 16 else 1)
        h = rms(h, weights["norm"])
        if "head_xq" in weights:
            from ...ops.gemv_quant import qmatmul as _qmm
            h2 = h.reshape(-1, h.shape[-1])
            logits = _qmm(h2, weights["head_xq"], weights["head_xs"],
                          q4=q4, interpret=interp).reshape(
                h.shape[:-1] + (-1,))
        else:
            logits = (h @ weights["head_w"]).astype(jnp.float32)
        return logits + weights["head_b"].astype(jnp.float32), ck, cv

    @partial(jax.jit, static_argnames=("win",),
             donate_argnums=(1, 2, 3, 4))
    def spec_chunk(weights, ck, cv, seq, n, win=None):
        """``iters`` verify iterations for the whole fleet: draft per
        slot from its own text, verify all slots in one (B, K+1)
        forward, accept per slot, advance per slot."""
        B = seq.shape[0]
        w = win if win is not None else S
        barange = jnp.arange(B, dtype=jnp.int32)

        def it(carry, _):
            ck, cv, seq, n = carry
            draft = jax.vmap(lookup_draft, (0, 0, None, None))(
                seq, n, K, g)                                  # (B, K)
            last = seq[barange, n - 1]                         # (B,)
            toks_in = jnp.concatenate([last[:, None], draft], axis=1)
            logits, ck, cv = fwd_rows(weights, ck, cv, toks_in, n - 1, w)
            toks = jnp.argmax(logits, -1).astype(seq.dtype)    # (B, K+1)
            a = jnp.sum(jnp.cumprod(
                (draft == toks[:, :K]).astype(jnp.int32), axis=1),
                axis=1, dtype=jnp.int32)                       # (B,)
            # headroom guard: a slot that cannot fit K+1 more rows (or
            # whose queries would leave the static window) must not
            # advance — its writes above were dropped/ignored anyway
            ok = (n + K + 1 <= jnp.int32(min(S, w)))
            rows = n[:, None] + jnp.arange(K + 1, dtype=jnp.int32)[None]
            old = seq[barange[:, None], jnp.minimum(rows, S - 1)]
            seq = seq.at[barange[:, None], rows].set(
                jnp.where(ok[:, None], toks, old), mode="drop")
            n = jnp.where(ok, n + a + 1, n)
            return (ck, cv, seq, n), None

        (ck, cv, seq, n), _ = jax.lax.scan(it, (ck, cv, seq, n), None,
                                           length=iters)
        return ck, cv, seq, n

    @partial(jax.jit, donate_argnums=(1, 2, 3, 4))
    def admit_many(weights, ck, cv, seq, n, prompts, slots):
        """Prefill a wave of k same-length prompts at rows [0, L) of
        their slots (per-slot positions: no shift rotation, no starts),
        record first tokens into seq[slot, L] and set n[slot] = L + 1."""
        k, L = prompts.shape
        N = ck.shape[0]
        cdt = ck.dtype
        ck1 = jnp.zeros((N, k, S, Hkv, hd), cdt)
        cv1 = jnp.zeros((N, k, S, Hkv, hd), cdt)
        win = min(S, 1 << (L - 1).bit_length())
        logits, ck1, cv1 = fwd_rows(weights, ck1, cv1, prompts,
                                    jnp.zeros((k,), jnp.int32), win)
        tok1 = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)  # (k,)
        zero = jnp.int32(0)
        dus = jax.lax.dynamic_update_slice

        def body(i, carry):
            ck, cv, seq, n = carry
            slot = slots[i]
            ck = dus(ck, ck1[:, i][:, None, :L], (zero, slot, zero, zero,
                                                  zero))
            cv = dus(cv, cv1[:, i][:, None, :L], (zero, slot, zero, zero,
                                                  zero))
            row = jnp.concatenate([prompts[i], tok1[i][None]])
            seq = dus(seq, row[None], (slot, zero))
            return ck, cv, seq, n.at[slot].set(jnp.int32(L + 1))

        ck, cv, seq, n = jax.lax.fori_loop(0, k, body, (ck, cv, seq, n))
        return tok1, ck, cv, seq, n

    return admit_many, spec_chunk


class SpecLlamaServer(_FleetScheduler):
    """Continuous-batching greedy serving with per-slot prompt-lookup
    speculation (``LlamaServer(speculative=K)`` builds one).

    >>> srv = LlamaServer(model, speculative=7, batch_size=4)
    >>> rid = srv.submit(prompt_ids)
    >>> done = srv.run()

    ``chunk`` counts VERIFY ITERATIONS per dispatch (each yields 1..K+1
    tokens per slot).  ``spec_iterations`` / ``spec_accepted`` report the
    realized acceptance.  Greedy-only (module doc)."""

    def __init__(self, model, batch_size: int = 4, speculative: int = 7,
                 ngram: int = 3, chunk: int = 16, eos_id: int = 2,
                 dtype=None, quant=None, temperature: float = 0.0,
                 top_k=None, top_p=None, seed: int = 0, **extra):
        import jax.numpy as jnp

        bad = {k for k, v in extra.items() if v not in (None, False)}
        if bad:  # loud, not silent: kv_quant/prefix_cache/lane don't
            # compose with the per-slot-position spec engine (yet)
            raise ValueError("unsupported with speculative serving: "
                             f"{sorted(bad)}")
        if temperature and temperature > 0:
            raise ValueError("speculative serving is greedy-only "
                             "(serve_spec.py module doc)")
        if quant not in (None, "int8", "int4", "int8-head"):
            raise ValueError(f"unsupported quant mode: {quant!r}")
        model.eval()
        self.model = model
        self.B = batch_size
        self.K, self.g = int(speculative), int(ngram)
        self.chunk = chunk
        self.eos_id = eos_id
        self.S = model.max_seq_len
        assert 1 <= self.g < self.S and 1 <= self.K <= self.S - 2
        self._dtype = dtype
        self._quant = quant
        self._jnp = jnp
        self._refresh_weights()
        N, Hkv, hd = model.n_layers, model.n_kv_heads, model.head_dim
        cdt = self._w["tok"].dtype
        self._ck = jnp.zeros((N, self.B, self.S, Hkv, hd), cdt)
        self._cv = jnp.zeros((N, self.B, self.S, Hkv, hd), cdt)
        self._seq = jnp.zeros((self.B, self.S), jnp.int32)
        self._n = jnp.ones((self.B,), jnp.int32)  # device per-slot pos
        self._nh = np.ones(self.B, np.int64)      # host mirror
        self._credited = np.zeros(self.B, np.int64)  # tokens credited
        self._init_fleet_state()
        self._init_sampling_state(model.vocab_size, 0.0, top_k, top_p)
        self._admit, self._spec = build_spec_fleet_fns(
            model, self.K, self.g, iters=chunk)
        self.spec_iterations = 0  # dispatch bookkeeping (host estimate)
        self.spec_accepted = 0

    def _refresh_weights(self):
        """Weight snapshot via the model's cache — the same key as
        ``generate``/the XLA serve lane (``(dtype_name, False, quant)``)
        so the snapshot is shared, and the same invalidation contract
        (finetune/LoRA clear the cache; the next step serves the new
        weights)."""
        key = (np.dtype(self._dtype).name if self._dtype else "native",
               False, self._quant)
        w = self.model._weights_cache.get(key)
        if w is None:
            if self._quant:
                w = self.model._weights_xq(self._dtype, self._quant)
            else:
                w = self.model._weights(self._dtype)
            self.model._weights_cache[key] = w
        self._w = w

    def submit(self, prompt_ids, max_new_tokens: int = 256,
               temperature: float = None, top_k: int = None,
               top_p: float = None, seed: int = None) -> int:
        if any(v is not None for v in (temperature, top_k, top_p, seed)) \
                and (temperature or 0) != 0:
            raise ValueError("speculative serving is greedy-only")
        prompt = [int(t) for t in np.asarray(prompt_ids).reshape(-1)]
        if len(prompt) + self.K + 2 > self.S:
            raise ValueError(
                f"prompt length {len(prompt)} leaves no speculative "
                f"headroom (need K+2={self.K + 2} rows before "
                f"max_seq_len {self.S})")
        return super().submit(prompt, max_new_tokens)

    # per-slot positions: any free slot admits any queued request — no
    # shared-position constraint, no rewind concept
    def _plan_admissions(self):
        plan = []
        for slot in range(self.B):
            if self._slots[slot] is not None or not self._queue:
                continue
            req = self._queue.popleft()
            self._slots[slot] = req
            plan.append((slot, req))
        return plan

    def _try_admit(self):
        jnp = self._jnp
        self._refresh_weights()
        plan = self._plan_admissions()
        if not plan:
            return
        by_len = {}
        for slot, req in plan:
            by_len.setdefault(len(req.prompt), []).append((slot, req))
        waves, firsts_dev = [], []
        for L, group in sorted(by_len.items()):
            for sub in self._pow2_subwaves(group):
                prompts = np.array([r.prompt for _, r in sub], np.int32)
                slots = np.array([s for s, _ in sub], np.int32)
                (tok1, self._ck, self._cv, self._seq,
                 self._n) = self._admit(
                    self._w, self._ck, self._cv, self._seq, self._n,
                    jnp.asarray(prompts), jnp.asarray(slots))
                for s, r in sub:
                    self._nh[s] = L + 1
                    self._credited[s] = 0
                waves.append(sub)
                firsts_dev.append(tok1)
        self._credit_firsts(waves, firsts_dev)
        for sub in waves:
            for slot, req in sub:
                self._credited[slot] = 1

    def step(self, n: int = None):
        """Admit free slots, run one speculative chunk (``chunk`` verify
        iterations), credit each slot's variable-length advance."""
        before = set(self._finished)
        self._try_admit()
        if self.active:
            # static window bucket covering the chunk's maximal advance
            need = int(self._nh.max()) + self.chunk * (self.K + 1)
            win = min(self.S, 1 << max(need - 1, 1).bit_length())
            self._ck, self._cv, self._seq, self._n = self._spec(
                self._w, self._ck, self._cv, self._seq, self._n, win=win)
            seq = np.asarray(self._seq)
            nh = np.asarray(self._n).astype(np.int64)
            self.spec_iterations += self.chunk
            for slot in range(self.B):
                req = self._slots[slot]
                if req is None:
                    continue
                old, new = int(self._nh[slot]), int(nh[slot])
                self.spec_accepted += max(new - old - self.chunk, 0)
                for t in seq[slot, old:new]:
                    req.tokens.append(int(t))
                    if req.tokens[-1] == self.eos_id \
                            or len(req.tokens) >= req.max_new_tokens:
                        break
                self._nh[slot] = new
                self._maybe_finish(slot)
                if self._slots[slot] is not None \
                        and new + self.K + 1 > self.S:
                    # no speculative headroom left: the device guard
                    # already stalled this slot — truncate it
                    self._maybe_finish(slot, truncated=True)
        return [self._finished[r] for r in set(self._finished) - before]

    def run(self, max_steps: int = 10_000):
        """Drain the queue; returns {rid: Request}."""
        for _ in range(max_steps):
            if not self._queue and self.active == 0:
                break
            self.step()
        return dict(self._finished)
