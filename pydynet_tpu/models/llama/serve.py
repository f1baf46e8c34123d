"""Continuous-batching decode server over the batched whole-token kernel.

Serving extension beyond the reference (its ``generate`` is a single-prompt
Python generator, reference llm/llama/model.py:258-269): ``B`` cache slots
decode in lockstep at ONE shared position — one batched Pallas launch per
token for the whole fleet — and a finished slot is recycled for the next
queued request *without touching the other slots*:

* the new prompt is prefilled into the slot's PAST cache rows
  ``[pos - len, pos)`` at their absolute positions (one XLA dispatch, rows
  scattered into the batched cache), overwriting the previous request's
  stale keys/values;
* the slot's attention is lower-bounded at its admission row via the
  kernel's per-row ``starts`` input, so stale rows below it are invisible;
* rotary attention scores depend only on RELATIVE distance, so a request
  decoded at shifted absolute positions emits exactly the tokens it would
  from position 0 (up to float rounding of the rotary tables).

The result is vLLM-style continuous batching with a static-shape TPU
program: no per-slot position plumbing in the kernel, no recompiles on
admission (slot index and base position are traced scalars; only a new
prompt LENGTH triggers a one-time prefill compile).

Two decode engines share this protocol (``lane=``): the batched
whole-token Pallas kernel (small dims — launch-overhead-bound decode),
and the XLA ``lax.scan`` forward with a per-row ``starts`` attention
mask (big dims — 7B-class models whose per-layer weight windows exceed
the mega-kernel's VMEM budget; weight-quantized serving there rides the
streamed ``ops/gemv_quant.py`` kernels).  The lane auto-routes by
``_fused_decode_supported``, exactly like ``generate``.

Scheduling rules that fall out of the shared position:
* admission needs ``len(prompt) <= pos`` (the prompt lands in past rows) —
  except on an idle server, where ``pos`` jumps to the prompt length;
* the server stops admitting when the cache end nears; requests still
  decoding at ``max_seq_len`` are finished as truncated.
"""
from __future__ import annotations

import itertools
from collections import deque
from dataclasses import dataclass, field
from functools import partial

import numpy as np


@dataclass
class Request:
    rid: int
    prompt: list
    max_new_tokens: int
    tokens: list = field(default_factory=list)  # generated ids
    done: bool = False
    truncated: bool = False
    # per-request sampling overrides (None = inherit the server defaults)
    temperature: float = None
    top_k: int = None
    top_p: float = None
    seed: int = None  # None -> derived from the server seed + rid


class _FleetScheduler:
    """Host-side slot protocol shared by every decode engine — the
    single-chip :class:`LlamaServer` (fused + XLA lanes) and the mesh
    :class:`~pydynet_tpu.parallel.serve_spmd.SpmdLlamaServer`: queueing,
    admission planning (incl. the idle position rewind), power-of-two
    admission-wave splitting, finish rules (EOS pop, max_new,
    truncation) and fleet truncation.  One implementation so protocol
    fixes cannot drift between engines; subclasses provide the device
    programs and the chunk loop, and may hook :meth:`_on_rewind` (the
    prefix cache invalidates its donors there)."""

    def _init_fleet_state(self):
        self._starts = np.zeros(self.B, np.int32)
        self._pos = 0
        self._slots: list = [None] * self.B
        self._queue: deque = deque()
        self._rid = itertools.count()
        self._finished: dict = {}

    def _init_sampling_state(self, V, temperature, top_k, top_p):
        """Server-default sampling params + the per-SLOT override vectors
        (traced (B,) inputs — mixed fleets share one compiled program;
        off-encodings: top_k=V keeps all, top_p=1.0 keeps all,
        temperature<=0 rows take exact argmax)."""
        self.sampling = temperature is not None and temperature > 0
        self._temp = float(temperature or 0.0)
        self._top_k, self._top_p = top_k, top_p
        self._V = V
        self._ptemp = np.full(self.B, self._temp, np.float32)
        self._ptopk = np.full(self.B,
                              top_k if top_k is not None else V, np.int32)
        self._ptopp = np.full(self.B,
                              top_p if top_p is not None else 1.0,
                              np.float32)

    def submit(self, prompt_ids, max_new_tokens: int = 256,
               temperature: float = None, top_k: int = None,
               top_p: float = None, seed: int = None) -> int:
        """Queue one prompt (list/array of token ids); returns request id.

        ``temperature``/``top_k``/``top_p`` override the server defaults
        for THIS request only (vLLM-style per-request params); ``seed``
        pins the request's private PRNG stream so its sampled tokens are
        a pure function of (prompt, params, seed) — see LlamaServer."""
        prompt = [int(t) for t in np.asarray(prompt_ids).reshape(-1)]
        assert 0 < len(prompt) < self.S, len(prompt)
        if temperature is not None and temperature < 0:
            raise ValueError(f"temperature must be >= 0, got {temperature}")
        if top_k is not None and not 0 < top_k:
            raise ValueError(f"top_k must be positive, got {top_k}")
        if top_p is not None and not 0.0 < top_p <= 1.0:
            raise ValueError(f"top_p must be in (0, 1], got {top_p}")
        if seed is not None and not -2**31 <= int(seed) < 2**31:
            # the admission wave ships seeds as an int32 array; numpy 2.x
            # raises OverflowError MID-SERVING (after the slot was
            # assigned), leaving the fleet corrupted — fail at submit
            raise ValueError(f"seed must fit int32, got {seed}")
        rid = next(self._rid)
        self._queue.append(Request(rid, prompt, int(max_new_tokens),
                                   temperature=temperature, top_k=top_k,
                                   top_p=top_p, seed=seed))
        return rid

    def _slot_params(self, slot, req):
        """Resolve a request's effective sampling params into the per-slot
        vectors; returns True when the row samples."""
        t = self._temp if req.temperature is None else float(req.temperature)
        k = self._top_k if req.top_k is None else req.top_k
        p = self._top_p if req.top_p is None else req.top_p
        self._ptemp[slot] = t
        self._ptopk[slot] = k if k is not None else self._V
        self._ptopp[slot] = p if p is not None else 1.0
        return t > 0

    @property
    def active(self) -> int:
        return sum(1 for r in self._slots if r is not None)

    def _on_rewind(self):
        """Called whenever the shared position resets (idle admission or
        fleet truncation) — rows above the new position will be
        rewritten by subsequent decode steps."""

    def _plan_admissions(self):
        """Assign queued requests to free slots under the admission rule
        (module doc): the prompt must land in past rows, except on an
        idle server, where the position rewinds to the prompt length."""
        plan = []
        for slot in range(self.B):
            if self._slots[slot] is not None or not self._queue:
                continue
            req = self._queue[0]
            L = len(req.prompt)
            if self.active == 0 and not plan:
                # idle server: reset the shared position to the prompt
                # length so the request gets the WHOLE cache as headroom
                # (stale rows are invisible — below the admission row
                # they are masked by ``starts``, above the decode
                # position the engine's position bound hides them until
                # rewritten), instead of inheriting the drained fleet's
                # position and truncating early
                self._pos = L
                self._on_rewind()
            if L > self._pos or self._pos >= self.S:
                continue  # must land in past rows (see module doc)
            self._queue.popleft()
            self._slots[slot] = req
            plan.append((slot, req))
        return plan

    @staticmethod
    def _pow2_subwaves(group):
        """Split one same-length admission group into power-of-two
        sub-batches — bounds prefill compile variants to (L, 2^i)."""
        i = 0
        while i < len(group):
            k = 1 << ((len(group) - i).bit_length() - 1)
            yield group[i:i + k]
            i += k

    @staticmethod
    def _wave_arrays(sub):
        """The admission wave's host arrays for one pow2 sub-batch:
        (prompts (k, L) i32, slots, seeds, has_seed, rids)."""
        return (np.array([r.prompt for _, r in sub], np.int32),
                np.array([s for s, _ in sub], np.int32),
                np.array([r.seed or 0 for _, r in sub], np.int32),
                np.array([r.seed is not None for _, r in sub]),
                np.array([r.rid for _, r in sub], np.int32))

    # ---------------- prefix-cache donor matching (shared) ------------- #
    # host half of prefix caching, shared by the single-chip XLA lane and
    # the mesh server (both keep a `_resident` slot->tokens table); the
    # device half (donor-row copy + delta rotation) is each engine's
    # admit_prefix program
    _MIN_PREFIX = 8  # smallest reusable prefix (power-of-two rows)

    def _find_donor(self, prompt, target_slot, planned_slots):
        """Best ``(slot, start_row, kb)`` donor for ``prompt``: the
        resident entry sharing the longest common prefix, rounded down
        to a power of two (bounds compile variants), of at least
        ``_MIN_PREFIX`` rows and leaving at least one suffix token (the
        first output's logits come from the suffix forward).  A slot
        being re-admitted this wave can't donate — its rows may be
        overwritten before the reuse program reads them — EXCEPT to
        itself: within one program the donor read is sequenced before
        the slot's overwrite by dataflow."""
        best = None
        limit = len(prompt) - 1
        for slot, ent in enumerate(self._resident):
            if ent is None or (slot in planned_slots
                               and slot != target_slot):
                continue
            _, rp, start = ent
            n = 0
            for a, b in zip(rp, prompt[:limit]):
                if a != b:
                    break
                n += 1
            if n < self._MIN_PREFIX:
                continue
            kb = 1 << (n.bit_length() - 1)
            if best is None or kb > best[2]:
                best = (slot, start, kb)
        return best

    def _grow_resident(self, slot, req):
        """Multi-turn donor growth: credited tokens' rows are written as
        each is fed back — all but the last, whose row only exists once
        the NEXT step consumes it."""
        ent = self._resident[slot]
        if ent is not None and ent[0] == req.rid:
            self._resident[slot] = (req.rid,
                                    tuple(req.prompt)
                                    + tuple(req.tokens[:-1]), ent[2])

    def _on_first_token(self, slot, req):
        """Hook after an admission's first token is credited (the
        single-chip server surfaces it to stream() here)."""

    def _credit_firsts(self, waves, firsts_dev):
        """ONE stacked host readback for every admission wave's first
        tokens, credited to their requests in dispatch order."""
        firsts = np.concatenate([np.asarray(t) for t in firsts_dev])
        j = 0
        for sub in waves:
            for slot, req in sub:
                req.tokens.append(int(firsts[j]))
                j += 1
                self._maybe_finish(slot)
                self._on_first_token(slot, req)

    def _maybe_finish(self, slot, truncated=False):
        req = self._slots[slot]
        if req is None:
            return
        if req.tokens and req.tokens[-1] == self.eos_id:
            req.tokens.pop()  # EOS itself is not emitted
            req.done = True
        elif len(req.tokens) >= req.max_new_tokens or truncated:
            req.done = True
            req.truncated = truncated
        if req.done:
            self._finished[req.rid] = req
            self._slots[slot] = None

    def _truncate_fleet(self):
        for slot in range(self.B):
            self._maybe_finish(slot, truncated=True)
        if self.active == 0:
            self._pos = 0  # fleet drained: rewind for the queue
            self._on_rewind()


class LlamaServer(_FleetScheduler):
    """Greedy or sampled continuous-batching decode for one Llama model.

    >>> srv = LlamaServer(model, batch_size=8, dtype=jnp.bfloat16)
    >>> rid = srv.submit(tokenizer.encode(prompt))
    >>> done = srv.run()           # {rid: Request}

    ``kv_quant="int8"`` keeps the fleet's KV caches int8 with per-row f32
    scales (the batched kernel's kv_int8 mode on the fused lane; tuple
    caches with inline dequant on the XLA scan lane — admission prefills
    are quantized by the same ``quantize_kv`` scheme after the
    position-shift rotation) — half the KV footprint AND streaming, so
    2x the slots or context per HBM byte.  Lossy at near-tie tokens,
    like ``generate(kv_quant=...)``.

    Per-request sampling: ``submit(..., temperature=, top_k=, top_p=)``
    overrides the server defaults for that request only — the decode
    chunk takes traced per-slot (B,) parameter vectors (greedy rows
    resolve to exact argmax inside ``sample_logits_per_row``), so mixed
    fleets share one compiled program.

    ``quant="int8"``/``"int8-head"`` stores the matmul weights int8 with
    per-channel scales (the batched kernel's weight-int8 path, round-3
    late): the shared weight stream — still the dominant HBM traffic at
    small-to-mid fleet sizes — halves.  Mutually exclusive with
    ``kv_quant`` on the fused lane; the XLA lane composes them (the 7B
    serving configuration: int4/int8 weights + int8 KV).

    ``lane`` picks the decode engine (default: ``generate``'s routing).
    ``"fused"`` is the batched whole-token Pallas kernel — the small-dims
    design, one launch per fleet token.  ``"xla"`` is the ``lax.scan``
    decode with the new per-row ``starts`` attention mask — the BIG-dims
    lane (7B-class models, where the mega-kernel's per-layer weight
    windows exceed VMEM; see ``_fused_decode_supported``), on which
    ``quant="int8"/"int4"`` streams the weights through the
    ``ops/gemv_quant.py`` kernels (half / quarter the dominant weight
    DMA).  Same continuous-batching semantics, same tests.

    ``prefix_cache=True`` (scan lane only) reuses KV rows across
    requests sharing a prompt prefix — the shared-system-prompt serving
    pattern: admission matches the new prompt against the prompts still
    materialized in each slot's cache rows, copies the longest
    power-of-two common prefix's rows from the donor slot (delta-rotated
    — RoPE is additive in position), and prefills only the suffix.  At
    big dims admission cost IS prefill FLOPs, so time-to-first-token for
    an L-token prompt with a kb-row cached prefix drops by ~L/(L-kb).
    Reuse is exact up to rotation-composition rounding (the same
    argument as shifted-position admission itself); ``prefix_hits`` /
    ``prefix_rows_reused`` count what it saved.
    """

    def __new__(cls, *args, **kwargs):
        # ``LlamaServer(model, speculative=K)`` builds the speculative
        # per-slot-position engine (serve_spec.SpecLlamaServer) — a
        # different fleet protocol (slots advance at their own accepted-
        # draft rates), same scheduler base.  Python skips this class's
        # __init__ on the foreign instance.
        if cls is LlamaServer and kwargs.get("speculative"):
            from .serve_spec import SpecLlamaServer
            return SpecLlamaServer(*args, **kwargs)
        return super().__new__(cls)

    def __init__(self, model, batch_size: int = 8, dtype=None,
                 chunk: int = 128, eos_id: int = 2, temperature: float = 0.0,
                 top_k: int = None, top_p: float = None, seed: int = 0,
                 kv_quant=None, quant=None, lane: str = None,
                 prefix_cache: bool = False, flash_prefill=None,
                 speculative=None):
        # chunk trades slot-recycle latency (a finished request's slot is
        # reused at the next chunk boundary, one chunk late under run()'s
        # pipeline) against per-chunk dispatch+readback overhead; through
        # the ~30 ms-RTT remote tunnel, 128-192 measures near-raw-kernel
        # throughput while 16-32 halves it
        import jax
        import jax.numpy as jnp

        from ...ops.decode_step import (lane_pad_dim, pad_cache_lanes,
                                        quantize_kv)
        from .model import _rope_pure, sample_logits_per_row

        if quant not in (None, "int8", "int8-head", "int4"):
            raise ValueError(f"unsupported quant mode: {quant!r}")
        if lane is None:  # generate()'s routing rule (ROADMAP 'big dims')
            lane = "fused" if model._fused_decode_supported(quant) else "xla"
        if lane not in ("fused", "xla"):
            raise ValueError(f"unknown lane: {lane!r}")
        fused_lane = lane == "fused"
        if fused_lane:
            assert model._fused_decode_supported(quant), \
                "the fused lane needs the batched whole-token kernel " \
                "(shape/VMEM constraints) — pass lane='xla' or let the " \
                "server auto-route"
        self._lane = lane
        if prefix_cache and fused_lane:
            raise ValueError(
                "prefix_cache rides the XLA scan lane (lane='xla') — "
                "admission cost is prefill FLOPs only at big dims; the "
                "fused lane's flat-lane cache layout has no row-reuse "
                "path (and nothing to gain at its dims)")
        self._prefix_cache = bool(prefix_cache)
        # admission-prefill flash routing (generate()'s flash_prefill):
        # None = auto per wave length (flash_prefill_mode), False = dense,
        # True/"interpret" = force the Pallas kernel (tests)
        self._flash_prefill = flash_prefill
        self.prefix_hits = 0          # reuse admissions served
        self.prefix_rows_reused = 0   # prefill rows skipped via reuse
        if kv_quant not in (None, "int8"):
            raise ValueError(f"unsupported kv_quant mode: {kv_quant!r}")
        if quant and kv_quant and fused_lane:
            raise ValueError("quant and kv_quant are mutually exclusive "
                             "on the fused kernel (see Llama.generate); "
                             "the XLA lane composes them")
        self._kv_quant = kv_quant
        model.eval()
        self.model = model
        self.B = batch_size
        self.chunk = chunk
        self.eos_id = eos_id
        self._quant = quant
        self._base_key = jax.random.PRNGKey(seed)
        # per-SLOT PRNG keys (device-resident, never synced): each request
        # row carries its own key stream, so a sampled request's tokens
        # are a pure function of (prompt, params, seed) — independent of
        # fleet composition, slot churn, or the other requests' lengths.
        self._pkeys = jax.vmap(jax.random.fold_in,
                               (None, 0))(self._base_key,
                                          jnp.arange(batch_size))
        self._init_sampling_state(model.vocab_size, temperature,
                                  top_k, top_p)

        if model._decode_fns is None:
            model._decode_fns = model._make_decode_fns()
        if fused_lane:
            if model._fused_chunk_fn is None:
                model._fused_chunk_fn = model._make_fused_decode_fns()
            fused_step_batched = model._fused_chunk_fn[6]
        forward_tokens = model._xla_forward_tokens
        forward_logits = model._xla_forward_logits

        self._dtype = dtype
        self._refresh_weights()  # builds + caches the weight snapshot
        w = self._w
        N, S = model.n_layers, model.max_seq_len
        self.S = S
        cdt = w["tok"].dtype
        narrow = fused_lane and "egqa" in w and "s_attn" not in w
        self._narrow = narrow
        if fused_lane:
            width = lane_pad_dim(
                (model.n_kv_heads if narrow else model.n_heads)
                * model.head_dim)
        if not fused_lane:
            # scan-lane caches keep the (N, B, S, Hkv, hd) decode layout;
            # kv_quant makes them (int8 data, per-row f32 scale) tuples
            # (forward_logits_one's static switch) — half the fleet KV
            # footprint AND streaming, composing with weight quant
            self._ck, self._cv = model._empty_caches(self.B, cdt,
                                                     kv_quant=kv_quant)
        elif kv_quant:
            # int8 rows + per-row f32 scales (ops/decode_step.quantize_kv
            # scheme): halves the fleet's KV footprint and streaming — 2x
            # the slots (or context) per HBM byte.  The (q, s) tuple
            # structure is the static switch that puts the batched kernel
            # in its kv_int8 mode.
            self._ck = (jnp.zeros((N, self.B, S, width), jnp.int8),
                        jnp.full((N, self.B, S), 1e-10, jnp.float32))
            self._cv = (jnp.zeros((N, self.B, S, width), jnp.int8),
                        jnp.full((N, self.B, S), 1e-10, jnp.float32))
        else:
            self._ck = jnp.zeros((N, self.B, S, width), cdt)
            self._cv = jnp.zeros((N, self.B, S, width), cdt)
        self._tok = jnp.ones((self.B,), jnp.int32)
        self._init_fleet_state()
        # prefix-cache residency: slot -> (rid, resident tokens, admission
        # row) — the token sequence whose KV rows are materialized in that
        # slot's cache, donors for later admissions sharing a prefix.
        # Starts as the prompt at admission and EXTENDS with credited
        # tokens as they decode (multi-turn serving: a follow-up prompt
        # quoting the previous exchange reuses the whole turn), except the
        # last credited token, whose row is only written when it is fed
        # back as the next step's input.  Entries survive a request
        # finishing (its rows do too) and die when the slot is re-admitted
        # or the shared position resets (rows above the new position get
        # rewritten by subsequent decode steps).
        self._resident: list = [None] * self.B
        self._admit_credits: list = []  # (rid, [first_token]) for stream()

        Hkv, hd = model.n_kv_heads, model.head_dim

        # narrow-GQA weights carry width-matched RoPE tables already;
        # MHA pads the full-width ones to the cache width once here
        # (fused-lane cache layout only; the scan lane post-rotates its
        # (Hkv, hd) rows with the decode tables via _rope_pure)
        if not fused_lane:
            rot_c = rot_s = rot_m = None
        elif narrow:
            rot_c, rot_s, rot_m = w["cosDk"], w["sinDk"], w["rotk"]
        else:
            from ...ops.decode_step import rope_pair_swap_matrix

            D = model.embed_dim
            padw = ((0, 0), (0, width - D))
            rot_c = jnp.pad(w["cosD"], padw)
            rot_s = jnp.pad(w["sinD"], padw)
            rot_m = jnp.pad(rope_pair_swap_matrix(D, w["cosD"].dtype),
                            ((0, width - D), (0, width - D)))

        base_key = self._base_key
        # seeded requests derive from a FIXED constant (not the server
        # seed), so a (prompt, params, seed) triple reproduces across
        # servers; unseeded ones derive from the server seed + rid
        fixed_key = jax.random.PRNGKey(0x5EED)

        def derive_keys(seeds_k, has_seed_k, rids_k):
            """Per-request key derivation INSIDE the admission program
            (eager per-request fold_ins cost ~a tunnel dispatch each);
            returns (draw keys (k, 2), carried slot keys (k, 2))."""
            k_seed = jax.vmap(jax.random.fold_in,
                              (None, 0))(fixed_key, seeds_k)
            k_rid = jax.vmap(jax.random.fold_in,
                             (None, 0))(base_key, rids_k)
            keys_k = jnp.where(has_seed_k[:, None], k_seed, k_rid)
            ks = jax.vmap(jax.random.split)(keys_k)  # (k, 2, 2)
            return ks[:, 0], ks[:, 1]

        # Only the selected lane's programs are built: the other
        # lane's closures would capture locals this lane never
        # assigns (fused_step_batched / rot tables vs the scan
        # forward) — a latent NameError trap, and dead code.
        if fused_lane:
            @partial(jax.jit, static_argnames=("sample", "flash"),
                     donate_argnums=(1, 2, 3, 4))
            def admit_many(w, ck, cv, tok, pkeys, prompts, pos0, slots,
                           seeds_k, has_seed_k, rids_k,
                           temp_k, topk_k, topp_k, sample=False,
                           flash=False):
                """Prefill a WAVE of k same-length requests into slots
                ``slots`` at absolute rows [pos0, pos0+L) of the shared cache
                in ONE program; returns their first tokens (k,) — greedy
                argmax, or (``sample=True``) drawn per row with the wave's
                (k,) temperature/top-k/top-p vectors (key/params unused on a
                greedy wave).
                pos0/slots are traced — compiles once per (k, L); the caller
                buckets k to powers of two to bound that.  (Per-request admit
                dispatches cost ~15 ms each through the remote tunnel and
                dominated serving throughput at high request turnover.)

                The prefill itself runs at position 0 (exactly the standalone
                ``generate`` semantics — at pos0 it would attend the empty
                rows below it), and the K rows are then post-rotated by the
                shift: rotary rotations compose additively, so a row rotated
                for position p and again by row pos0 of the table carries the
                rotation for absolute position p + pos0."""
                k, L = prompts.shape
                ck1 = jnp.zeros((N, k, S, Hkv, hd), cdt)
                cv1 = jnp.zeros((N, k, S, Hkv, hd), cdt)
                # generate()'s prefill win bucketing: queries live in [0, L),
                # so the pow2 window drops only causally-masked columns
                win = min(S, 1 << (L - 1).bit_length())
                draw_k, keys_out = derive_keys(seeds_k, has_seed_k, rids_k)
                if sample:
                    logits1, ck1, cv1 = forward_logits(w, ck1, cv1, prompts, 0,
                                                       win=win, flash=flash)
                    tok1 = sample_logits_per_row(logits1, draw_k, temp_k,
                                                 topk_k, topp_k)
                else:
                    tok1, ck1, cv1 = forward_tokens(w, ck1, cv1, prompts, 0,
                                                    win=win, flash=flash)
                fk = pad_cache_lanes(model._kv_flat(ck1, narrow), width)
                fv = pad_cache_lanes(model._kv_flat(cv1, narrow), width)
                if k == 1:  # _kv_flat squeezes the unit batch axis
                    fk, fv = fk[:, None], fv[:, None]
                zero = jnp.int32(0)
                pos0 = jnp.asarray(pos0, jnp.int32)
                rows_k = fk[:, :, :L].astype(jnp.float32)      # (N, k, L, W)
                rows_v = fv[:, :, :L]
                cd = rot_c[pos0].astype(jnp.float32)[None, None, None]
                sd = rot_s[pos0].astype(jnp.float32)[None, None, None]
                rm = rot_m.astype(jnp.float32)
                rows_k = rows_k * cd + (rows_k @ rm) * sd  # f32
                sc_k = sc_v = None
                if kv_quant:
                    # quantize the admitted rows EXACTLY as the kernel
                    # quantizes freshly decoded ones (quantize_kv), so
                    # prefilled and decoded cache rows are indistinguishable
                    rows_k, sc_k = quantize_kv(rows_k)
                    rows_v, sc_v = quantize_kv(rows_v)
                else:
                    rows_k = rows_k.astype(cdt)
                tok1 = tok1.reshape(k).astype(jnp.int32)
                dus = jax.lax.dynamic_update_slice

                def body(i, carry):
                    ck, cv, tok = carry
                    slot = slots[i]
                    if kv_quant:
                        (ckq, cks), (cvq, cvs) = ck, cv
                        ck = (dus(ckq, rows_k[:, i][:, None],
                                  (zero, slot, pos0, zero)),
                              dus(cks, sc_k[:, i][:, None], (zero, slot, pos0)))
                        cv = (dus(cvq, rows_v[:, i][:, None],
                                  (zero, slot, pos0, zero)),
                              dus(cvs, sc_v[:, i][:, None], (zero, slot, pos0)))
                    else:
                        ck = dus(ck, rows_k[:, i][:, None],
                                 (zero, slot, pos0, zero))
                        cv = dus(cv, rows_v[:, i][:, None],
                                 (zero, slot, pos0, zero))
                    return ck, cv, tok.at[slot].set(tok1[i])

                ck, cv, tok = jax.lax.fori_loop(0, k, body, (ck, cv, tok))
                pkeys = pkeys.at[slots].set(keys_out)
                return tok1, ck, cv, tok, pkeys

            @partial(jax.jit, static_argnames=("n",), donate_argnums=(1, 2))
            def decode(w, ck, cv, tok, pos, starts, n):
                def step(carry, _):
                    ck, cv, tok, p = carry
                    nxt, ck, cv = fused_step_batched(w, ck, cv, tok, p,
                                                     starts=starts)
                    return (ck, cv, nxt.astype(tok.dtype), p + 1), nxt

                pos = jnp.asarray(pos, jnp.int32)
                (ck, cv, tok, p), toks = jax.lax.scan(
                    step, (ck, cv, tok, pos), None, length=n)
                return ck, cv, tok, toks  # toks (n, B)

            @partial(jax.jit, static_argnames=("n",), donate_argnums=(1, 2))
            def decode_sampled(w, ck, cv, tok, pos, starts, keys, temp_b,
                               topk_b, topp_b, n):
                """``keys`` (B, 2): per-SLOT key streams, split per step per
                row — a row's draws depend only on its own key lineage."""
                def step(carry, _):
                    ck, cv, tok, p, keys = carry
                    logits, ck, cv = fused_step_batched(w, ck, cv, tok, p,
                                                        emit_logits=True,
                                                        starts=starts)
                    ks = jax.vmap(jax.random.split)(keys)  # (B, 2, 2)
                    nxt = sample_logits_per_row(logits, ks[:, 0], temp_b,
                                                topk_b, topp_b).astype(tok.dtype)
                    return (ck, cv, nxt, p + 1, ks[:, 1]), nxt

                pos = jnp.asarray(pos, jnp.int32)
                (ck, cv, tok, p, keys), toks = jax.lax.scan(
                    step, (ck, cv, tok, pos, keys), None, length=n)
                return ck, cv, tok, toks, keys

            self._admit_many, self._decode = admit_many, decode
            self._decode_sampled = decode_sampled
            self._admit_prefix = None
        else:
            # ---------------- XLA scan lane (big-dims serving) -------------- #
            # same wave/chunk protocol as the fused lane, but every step is
            # the lax.scan decode forward (forward_logits_one) with the new
            # per-row ``starts`` mask — the lane generate() routes 7B-class
            # dims to (_fused_decode_supported's VMEM bound), with quant=
            # riding the streamed gemv_quant kernels.  Caches keep the scan
            # layout (N, B, S, Hkv, hd); admission scatters the prefilled
            # rows directly and post-rotates K with the decode tables.
            kvq = kv_quant is not None  # tuple (data, scale) fleet caches

            @partial(jax.jit, static_argnames=("sample", "flash"),
                     donate_argnums=(1, 2, 3, 4))
            def admit_many_xla(w, ck, cv, tok, pkeys, prompts, pos0, slots,
                               seeds_k, has_seed_k, rids_k,
                               temp_k, topk_k, topp_k, sample=False,
                               flash=False):
                """Scan-lane admission wave: prefill k same-length prompts at
                position 0 in a fresh (N, k, S, Hkv, hd) cache, post-rotate
                the K rows by angle(pos0) via _rope_pure (rotations compose
                additively, so a row rotated for position p and again by
                pos0 carries the rotation for absolute position p + pos0 —
                the same argument as the fused variant above), and scatter
                them into the fleet cache at rows [pos0, pos0+L)."""
                k, L = prompts.shape
                if kvq:
                    # tuple transient: the admission prefill attends
                    # QUANTIZED fresh rows, exactly like standalone
                    # generate(kv_quant=...) — pos0=0 admissions are then
                    # bit-exact vs the standalone stream (V rows scatter
                    # untouched; K's identity rotation and the dequant->
                    # requant round-trip are exact at pos0=0)
                    ck1 = (jnp.zeros((N, k, S, Hkv, hd), jnp.int8),
                           jnp.zeros((N, k, S, Hkv), jnp.float32))
                    cv1 = (jnp.zeros((N, k, S, Hkv, hd), jnp.int8),
                           jnp.zeros((N, k, S, Hkv), jnp.float32))
                else:
                    ck1 = jnp.zeros((N, k, S, Hkv, hd), cdt)
                    cv1 = jnp.zeros((N, k, S, Hkv, hd), cdt)
                # generate()'s prefill win bucketing: queries live in [0, L),
                # so the pow2 window drops only causally-masked columns
                win = min(S, 1 << (L - 1).bit_length())
                draw_k, keys_out = derive_keys(seeds_k, has_seed_k, rids_k)
                if sample:
                    logits1, ck1, cv1 = forward_logits(w, ck1, cv1, prompts, 0,
                                                       win=win, flash=flash)
                    tok1 = sample_logits_per_row(logits1, draw_k, temp_k,
                                                 topk_k, topp_k)
                else:
                    tok1, ck1, cv1 = forward_tokens(w, ck1, cv1, prompts, 0,
                                                    win=win, flash=flash)
                pos0 = jnp.asarray(pos0, jnp.int32)
                cd = jax.lax.dynamic_slice_in_dim(
                    w["cos"], pos0, 1).astype(jnp.float32)   # (1, hd//2)
                sd = jax.lax.dynamic_slice_in_dim(
                    w["sin"], pos0, 1).astype(jnp.float32)
                if kvq:
                    # K: dequantize, rotate by angle(pos0), requantize
                    # (identity + exact round-trip at pos0=0); V needs no
                    # rotation — its int8 rows + scales scatter untouched
                    rows_k = (ck1[0][:, :, :L].astype(jnp.float32)
                              * ck1[1][:, :, :L][..., None])
                    rows_k = quantize_kv(_rope_pure(rows_k, cd, sd))
                    rows_v = (cv1[0][:, :, :L], cv1[1][:, :, :L])
                else:
                    rows_k = ck1[:, :, :L].astype(jnp.float32)
                    rows_v = cv1[:, :, :L]
                    rows_k = _rope_pure(rows_k, cd, sd).astype(cdt)
                tok1 = tok1.reshape(k).astype(jnp.int32)
                zero = jnp.int32(0)
                dus = jax.lax.dynamic_update_slice

                def body(i, carry):
                    ck, cv, tok = carry
                    slot = slots[i]
                    if kvq:
                        ck = (dus(ck[0], rows_k[0][:, i][:, None],
                                  (zero, slot, pos0, zero, zero)),
                              dus(ck[1], rows_k[1][:, i][:, None],
                                  (zero, slot, pos0, zero)))
                        cv = (dus(cv[0], rows_v[0][:, i][:, None],
                                  (zero, slot, pos0, zero, zero)),
                              dus(cv[1], rows_v[1][:, i][:, None],
                                  (zero, slot, pos0, zero)))
                    else:
                        ck = dus(ck, rows_k[:, i][:, None],
                                 (zero, slot, pos0, zero, zero))
                        cv = dus(cv, rows_v[:, i][:, None],
                                 (zero, slot, pos0, zero, zero))
                    return ck, cv, tok.at[slot].set(tok1[i])

                ck, cv, tok = jax.lax.fori_loop(0, k, body, (ck, cv, tok))
                pkeys = pkeys.at[slots].set(keys_out)
                return tok1, ck, cv, tok, pkeys

            @partial(jax.jit, static_argnames=("kb", "sample"),
                     donate_argnums=(1, 2, 3, 4))
            def admit_prefix_xla(w, ck, cv, tok, pkeys, suffix, donor_slot,
                                 donor_start, pos0, slot, seeds_k, has_seed_k,
                                 rids_k, temp_k, topk_k, topp_k, kb=0,
                                 sample=False):
                """Prefix-cache admission (scan lane): reuse ``kb`` prefix
                rows already materialized by a donor slot instead of
                re-prefilling them — KV rows depend only on tokens at or
                before their position, so a shared prompt prefix's rows are
                identical for every request carrying it (up to RoPE
                position), and RoPE is linear in position, so a donor row at
                absolute position ``ds + i`` un-rotates to relative ``i`` by
                angle(-ds) and re-rotates to the new slot's ``pos0 + i`` by
                angle(pos0) — the same additive-composition argument as
                ``admit_many_xla``, two hops instead of one.

                Only the SUFFIX (len L - kb) runs the prefill forward: at 7B
                dims admission cost is prefill FLOPs, so a shared system
                prompt's admission drops by ~L/Ls.  One request per call
                (donors vary); compiled per (kb, suffix-length) pair, kb a
                power of two — same bounded-variants discipline as the
                per-length admission waves."""
                Ls = suffix.shape[1]
                zero = jnp.int32(0)
                dss = jax.lax.dynamic_slice
                dus = jax.lax.dynamic_update_slice
                donor_slot = jnp.asarray(donor_slot, jnp.int32)
                donor_start = jnp.asarray(donor_start, jnp.int32)
                pos0 = jnp.asarray(pos0, jnp.int32)
                slot = jnp.asarray(slot, jnp.int32)
                # donor prefix rows, extracted BEFORE this slot's overwrite
                # (pure dataflow: donor == slot is fine); int8 donors
                # dequantize here and REquantize at the final scatter — one
                # extra rounding on reused rows, same class as the
                # rotation-composition rounding this path already accepts
                # un-rotate K to relative positions [0, kb): angle(-ds) has
                # cos(ds), -sin(ds) — single-row tables broadcast over rows
                cd = jax.lax.dynamic_slice_in_dim(
                    w["cos"], donor_start, 1).astype(jnp.float32)
                sd = jax.lax.dynamic_slice_in_dim(
                    w["sin"], donor_start, 1).astype(jnp.float32)
                if kvq:
                    # int8 donors: K dequantizes, un-rotates and
                    # REquantizes into the tuple transient (one extra
                    # rounding on reused rows — same class as the
                    # rotation-composition rounding this path accepts);
                    # V rows never rotate, so their int8 data + scales
                    # copy through untouched
                    pk = (dss(ck[0], (zero, donor_slot, donor_start, zero,
                                      zero), (N, 1, kb, Hkv, hd))
                          .astype(jnp.float32)
                          * dss(ck[1], (zero, donor_slot, donor_start,
                                        zero), (N, 1, kb, Hkv))[..., None])
                    pkq, pks = quantize_kv(_rope_pure(pk, cd, -sd))
                    ck1 = (dus(jnp.zeros((N, 1, S, Hkv, hd), jnp.int8),
                               pkq, (zero,) * 5),
                           dus(jnp.zeros((N, 1, S, Hkv), jnp.float32),
                               pks, (zero,) * 4))
                    cv1 = (dus(jnp.zeros((N, 1, S, Hkv, hd), jnp.int8),
                               dss(cv[0], (zero, donor_slot, donor_start,
                                           zero, zero),
                                   (N, 1, kb, Hkv, hd)), (zero,) * 5),
                           dus(jnp.zeros((N, 1, S, Hkv), jnp.float32),
                               dss(cv[1], (zero, donor_slot, donor_start,
                                           zero), (N, 1, kb, Hkv)),
                               (zero,) * 4))
                else:
                    pk = dss(ck, (zero, donor_slot, donor_start, zero, zero),
                             (N, 1, kb, Hkv, hd)).astype(jnp.float32)
                    pv = dss(cv, (zero, donor_slot, donor_start, zero, zero),
                             (N, 1, kb, Hkv, hd))
                    pk = _rope_pure(pk, cd, -sd).astype(cdt)
                    ck1 = jnp.zeros((N, 1, S, Hkv, hd), cdt)
                    cv1 = jnp.zeros((N, 1, S, Hkv, hd), cdt)
                    ck1 = dus(ck1, pk, (zero,) * 5)
                    cv1 = dus(cv1, pv.astype(cdt), (zero,) * 5)
                draw_k, keys_out = derive_keys(seeds_k, has_seed_k, rids_k)
                # suffix queries live in [kb, kb+Ls): pow2 prefill win
                win = min(S, 1 << (kb + Ls - 1).bit_length())
                if sample:
                    logits1, ck1, cv1 = forward_logits(w, ck1, cv1, suffix, kb,
                                                       win=win)
                    tok1 = sample_logits_per_row(logits1, draw_k, temp_k,
                                                 topk_k, topp_k)
                else:
                    tok1, ck1, cv1 = forward_tokens(w, ck1, cv1, suffix, kb,
                                                    win=win)
                L = kb + Ls
                c0 = jax.lax.dynamic_slice_in_dim(
                    w["cos"], pos0, 1).astype(jnp.float32)
                s0 = jax.lax.dynamic_slice_in_dim(
                    w["sin"], pos0, 1).astype(jnp.float32)
                if kvq:
                    rows_k = (ck1[0][:, :, :L].astype(jnp.float32)
                              * ck1[1][:, :, :L][..., None])
                    rk_q, rk_s = quantize_kv(_rope_pure(rows_k, c0, s0))
                    ck = (dus(ck[0], rk_q, (zero, slot, pos0, zero, zero)),
                          dus(ck[1], rk_s, (zero, slot, pos0, zero)))
                    cv = (dus(cv[0], cv1[0][:, :, :L],
                              (zero, slot, pos0, zero, zero)),
                          dus(cv[1], cv1[1][:, :, :L],
                              (zero, slot, pos0, zero)))
                else:
                    rows_k = ck1[:, :, :L].astype(jnp.float32)
                    rows_v = cv1[:, :, :L]
                    rows_k = _rope_pure(rows_k, c0, s0).astype(cdt)
                    ck = dus(ck, rows_k, (zero, slot, pos0, zero, zero))
                    cv = dus(cv, rows_v.astype(cdt),
                             (zero, slot, pos0, zero, zero))
                tok1 = tok1.reshape(1).astype(jnp.int32)
                tok = tok.at[slot].set(tok1[0])
                pkeys = pkeys.at[slot].set(keys_out[0])
                return tok1, ck, cv, tok, pkeys

            @partial(jax.jit, static_argnames=("n", "win"),
                     donate_argnums=(1, 2))
            def decode_xla(w, ck, cv, tok, pos, starts, n, win=None):
                """Greedy fleet chunk on the scan lane; ``win`` (static) is
                _dispatch's pow2 attention window >= pos + n, clamped to S —
                generate()'s bucketing discipline, a handful of variants."""
                def step(carry, _):
                    ck, cv, tok, p = carry
                    logits, ck, cv = forward_logits(w, ck, cv, tok[:, None], p,
                                                    win=win, starts=starts)
                    nxt = jnp.argmax(logits, axis=-1).astype(tok.dtype)
                    return (ck, cv, nxt, p + 1), nxt

                pos = jnp.asarray(pos, jnp.int32)
                (ck, cv, tok, p), toks = jax.lax.scan(
                    step, (ck, cv, tok, pos), None, length=n)
                return ck, cv, tok, toks  # toks (n, B)

            @partial(jax.jit, static_argnames=("n", "win"),
                     donate_argnums=(1, 2))
            def decode_sampled_xla(w, ck, cv, tok, pos, starts, keys, temp_b,
                                   topk_b, topp_b, n, win=None):
                def step(carry, _):
                    ck, cv, tok, p, keys = carry
                    logits, ck, cv = forward_logits(w, ck, cv, tok[:, None], p,
                                                    win=win, starts=starts)
                    ks = jax.vmap(jax.random.split)(keys)  # (B, 2, 2)
                    nxt = sample_logits_per_row(logits, ks[:, 0], temp_b,
                                                topk_b, topp_b).astype(tok.dtype)
                    return (ck, cv, nxt, p + 1, ks[:, 1]), nxt

                pos = jnp.asarray(pos, jnp.int32)
                (ck, cv, tok, p, keys), toks = jax.lax.scan(
                    step, (ck, cv, tok, pos, keys), None, length=n)
                return ck, cv, tok, toks, keys

            self._admit_many, self._decode = admit_many_xla, decode_xla
            self._decode_sampled = decode_sampled_xla
            self._admit_prefix = admit_prefix_xla
        self._jnp = jnp
        self._jax = jax

    # ------------------------------ API ------------------------------ #
    def _on_rewind(self):
        # a position reset invalidates every prefix-cache donor: rows
        # above the new position get rewritten by decode steps
        self._resident = [None] * self.B

    def _try_admit(self):
        jnp = self._jnp
        plan = self._plan_admissions()
        if not plan:
            return
        # dispatch the wave grouped by prompt length, each group split
        # into power-of-two sub-batches (bounds compile variants to
        # (L, 2^i) pairs): ONE prompt upload + ONE prefill+scatter
        # program per sub-batch instead of per request, and ONE host
        # readback for every admission's first token at the end —
        # per-request dispatches cost ~15 ms each through the tunnel
        by_len: dict = {}
        row_samples = {}  # slot -> samples? (the _slot_params resolution)
        reuse = []  # (slot, req, donor) — prefix-cache admissions
        planned_slots = {s for s, _ in plan}
        for slot, req in plan:
            row_samples[slot] = self._slot_params(slot, req)
            donor = self._find_donor(req.prompt, slot, planned_slots) \
                if self._prefix_cache else None
            if donor is not None:
                reuse.append((slot, req, donor))
            else:
                by_len.setdefault(len(req.prompt), []).append((slot, req))
        waves, firsts_dev = [], []
        from .model import flash_prefill_mode
        for L, group in sorted(by_len.items()):
            pos0 = self._pos - L
            flash = (flash_prefill_mode(self._w, L)
                     if self._flash_prefill is None else self._flash_prefill)
            for sub in self._pow2_subwaves(group):
                prompts, slots, seeds, has_seed, rids = \
                    self._wave_arrays(sub)
                wave_sample = any(row_samples[s] for s, _ in sub)
                (tok1, self._ck, self._cv, self._tok,
                 self._pkeys) = self._admit_many(
                    self._w, self._ck, self._cv, self._tok, self._pkeys,
                    jnp.asarray(prompts), pos0, jnp.asarray(slots),
                    jnp.asarray(seeds), jnp.asarray(has_seed),
                    jnp.asarray(rids), jnp.asarray(self._ptemp[slots]),
                    jnp.asarray(self._ptopk[slots]),
                    jnp.asarray(self._ptopp[slots]), sample=wave_sample,
                    flash=flash)
                for s, r in sub:
                    self._starts[s] = pos0
                    self._resident[s] = (r.rid, tuple(r.prompt), pos0)
                waves.append(sub)
                firsts_dev.append(tok1)
        # prefix-cache admissions: one program each (donors vary), the
        # suffix-only prefill + donor-row reuse path (admit_prefix_xla)
        for slot, req, (dslot, dstart, kb) in reuse:
            L = len(req.prompt)
            pos0 = self._pos - L
            suffix = np.array([req.prompt[kb:]], np.int32)
            sl = np.array([slot], np.int32)
            (tok1, self._ck, self._cv, self._tok,
             self._pkeys) = self._admit_prefix(
                self._w, self._ck, self._cv, self._tok, self._pkeys,
                jnp.asarray(suffix), dslot, dstart, pos0, slot,
                jnp.asarray(np.array([req.seed or 0], np.int32)),
                jnp.asarray(np.array([req.seed is not None])),
                jnp.asarray(np.array([req.rid], np.int32)),
                jnp.asarray(self._ptemp[sl]), jnp.asarray(self._ptopk[sl]),
                jnp.asarray(self._ptopp[sl]), kb=kb,
                sample=row_samples[slot])
            self._starts[slot] = pos0
            self._resident[slot] = (req.rid, tuple(req.prompt), pos0)
            self.prefix_hits += 1
            self.prefix_rows_reused += kb
            waves.append([(slot, req)])
            firsts_dev.append(tok1)
        self._credit_firsts(waves, firsts_dev)

    def _on_first_token(self, slot, req):
        if req.tokens:  # EOS-as-first was popped -> nothing to show
            # surface the admission-time first token to stream()
            self._admit_credits.append((req.rid, [req.tokens[-1]]))

    _EXHAUSTED = object()  # _dispatch sentinel: cache end reached

    def _refresh_weights(self):
        """Re-fetch the weight snapshot when the model invalidated its
        cache (finetune_step / add_lora / merge_lora / load_* all call
        ``_weights_cache.clear()``) — otherwise the server would silently
        keep serving the pre-update weights forever.  Requests already
        mid-decode continue on the new weights from their next chunk.

        The cache key is shared with ``generate``'s (model.py:
        ``(dtype_name, fused, quant)``) because the snapshots are built
        by the very same calls — a private serve key would keep a second
        multi-GB weight copy resident in HBM for nothing (the same
        argument beam search makes at its key, model.py)."""
        key = (np.dtype(self._dtype).name if self._dtype else "native",
               self._lane == "fused", self._quant)
        w = self.model._weights_cache.get(key)
        if w is None:
            if self._lane == "fused":
                w = self.model._fused_weights(self._dtype, self._quant)
            elif self._quant:  # big-dims quant lane (gemv_quant kernels)
                w = self.model._weights_xq(self._dtype, self._quant)
            else:
                w = self.model._weights(self._dtype)
            self.model._weights_cache[key] = w
        if w is not getattr(self, "_w", None):
            # a new snapshot (weight update): resident prefix-cache rows
            # were computed under the OLD weights — a new request reusing
            # them would silently decode against stale keys/values.
            # Mid-decode requests continuing on mixed weights is the
            # documented contract; donating stale rows to NEW ones is not.
            if getattr(self, "_prefix_cache", False):
                self._resident = [None] * self.B
        self._w = w

    def _dispatch(self, n: int = None):
        """Admit what fits, then *dispatch* one decode chunk — NO host
        readback.  Returns ``(toks_device, slots_snapshot, valid)``,
        ``None`` (nothing active), or ``_EXHAUSTED`` (cache end
        reached)."""
        self._refresh_weights()
        self._try_admit()
        if self.active == 0:
            return None
        navail = self.S - self._pos
        if navail <= 0:
            return self._EXHAUSTED
        # FIXED chunk size — generate's discipline (model.py decode_chunk):
        # a static n per mode means exactly one compiled scan executable.
        # Steps past the cache end run against the kernel's pos clamp
        # (in-bounds, filler tokens) and are discarded by _process via
        # ``valid``; a variable tail n would recompile the whole Mosaic
        # decode scan (~70 s) mid-serving for every distinct remainder.
        n = n or self.chunk
        starts = self._jnp.asarray(self._starts, self._jnp.int32)
        kw = {}
        if self._lane == "xla":
            # generate()'s pow2 attention-window bucketing: consumed
            # steps satisfy qpos < pos + n <= win; surplus steps past the
            # S clamp are discarded via ``valid`` like the fused lane
            kw["win"] = min(self.S, 1 << (self._pos + n - 1).bit_length())
        # per-slot vectors already encode inherited server defaults, so
        # the ACTIVE slots' temperatures alone decide the program — a
        # fleet where every request overrode to greedy runs the cheaper
        # greedy chunk even on a sampling server
        any_sampled = any(self._ptemp[i] > 0 for i in range(self.B)
                          if self._slots[i] is not None)
        if any_sampled:
            (self._ck, self._cv, self._tok, toks,
             self._pkeys) = self._decode_sampled(
                self._w, self._ck, self._cv, self._tok, self._pos, starts,
                self._pkeys, self._jnp.asarray(self._ptemp),
                self._jnp.asarray(self._ptopk),
                self._jnp.asarray(self._ptopp), n, **kw)
        else:
            self._ck, self._cv, self._tok, toks = self._decode(
                self._w, self._ck, self._cv, self._tok, self._pos, starts,
                n, **kw)
        self._pos += min(n, navail)
        # chunk tokens belong to the slot->request mapping AT DISPATCH:
        # by the time they are read back a slot may have been recycled
        return toks, list(self._slots), min(n, navail)

    def _process(self, toks, snapshot, valid=None):
        """Read one dispatched chunk back and credit its tokens to the
        requests that occupied each slot at dispatch time.  ``valid``
        trims clamped filler steps decoded past the cache end (the chunk
        is fixed-size; see _dispatch).  Returns [(rid, new_tokens)] for
        :meth:`stream` (EOS excluded, like Request.tokens)."""
        toks = np.asarray(toks)[:valid]  # (n, B) host readback
        credited = []
        for slot in range(self.B):
            req = snapshot[slot]
            if req is None or req.done:
                continue  # empty at dispatch, or already finished (the
                # slot decoded one chunk of discarded filler before the
                # pipeline caught up — see run())
            before = len(req.tokens)
            for t in toks[:, slot]:
                req.tokens.append(int(t))
                if req.tokens[-1] == self.eos_id \
                        or len(req.tokens) >= req.max_new_tokens:
                    break
            if self._slots[slot] is req:
                self._maybe_finish(slot)
            new = req.tokens[before:]  # after _maybe_finish pops the EOS
            if new:
                credited.append((req.rid, new))
            if self._prefix_cache:
                self._grow_resident(slot, req)
        return credited

    def step(self, n: int = None):
        """Admit what fits, then decode ``n`` (default ``chunk``) tokens for
        every slot in one compiled scan; returns newly finished requests.
        Synchronous (dispatch + readback); ``run`` pipelines instead."""
        before = set(self._finished)
        disp = self._dispatch(n)
        self._admit_credits.clear()  # stream()-only bookkeeping: stale
        # entries must not leak into a later stream() call
        if disp is self._EXHAUSTED:
            self._truncate_fleet()
        elif disp is not None:
            self._process(*disp)
        return [self._finished[r] for r in set(self._finished) - before]

    def stream(self, max_steps: int = 10_000):
        """Generator over ``(rid, new_tokens)`` chunks as they are read
        back, until the queue and all slots drain — the incremental
        (SSE-style) serving interface; :meth:`run` is this loop drained.

        Same 1-deep pipeline as ``run`` (chunk k+1 dispatches BEFORE
        chunk k's readback), so tokens arrive with one-chunk latency
        while the device never idles; each request's tokens arrive in
        order, interleaved across requests chunk by chunk."""
        pending = None
        for _ in range(max_steps):
            if pending is None and not self._queue and self.active == 0:
                break
            disp = self._dispatch()
            if self._admit_credits:  # admission-time first tokens
                yield from self._admit_credits
                self._admit_credits = []
            if disp is self._EXHAUSTED:
                if pending is not None:  # account in-flight tokens first
                    yield from self._process(*pending)
                    pending = None
                    continue  # retry: the chunk may have finished slots
                self._truncate_fleet()
                continue
            if pending is not None:
                yield from self._process(*pending)
            pending = disp
        if pending is not None:
            yield from self._process(*pending)

    def run(self, max_steps: int = 10_000) -> dict:
        """Drive until the queue and all slots drain; {rid: Request}.

        1-deep pipeline (exactly ``generate``'s trick): chunk k+1 is
        dispatched BEFORE chunk k's tokens are read back, so the ~30 ms
        host round trip and the host-side bookkeeping hide behind device
        compute.  The cost: a slot whose request finished in chunk k
        decodes one chunk of filler in k+1 before being recycled (the
        filler rows are overwritten/masked by the next admission's
        ``starts``), and admissions lag one chunk behind EOS discovery."""
        for _ in self.stream(max_steps):
            pass
        return dict(self._finished)
