"""Continuous-batching decode serving over a dp x tp device mesh.

The multi-chip upgrade of ``models/llama/serve.LlamaServer`` (which runs
one chip and owns the full feature set — sampling, quant, prefix cache):
the same shared-position slot protocol, executed by the GSPMD decode
forward of ``llama_spmd`` — per-head attention tp-local, batch rows
(slots) sharded over dp, weight matmuls Megatron-sharded over tp,
collectives inserted by GSPMD from the sharding annotations and riding
ICI.  The reference has nothing in this design space at all (its
``generate`` is a single-stream NumPy loop, reference
llm/llama/model.py:258-269; no distributed layer, SURVEY.md §2.6).

Protocol recap (serve.py module doc is the authority):
* all ``B`` slots decode in lockstep at ONE shared position — one SPMD
  dispatch per fleet chunk;
* a finished slot is recycled by prefilling the next prompt into the
  slot's PAST cache rows ``[pos - len, pos)`` (rows position-shifted by
  ``_rope``'s additive rotation) without touching the other slots;
* the recycled slot's attention is lower-bounded at its admission row
  via the per-row ``starts`` mask (``llama_spmd.forward_tokens``);
* admission needs ``len(prompt) <= pos`` except on an idle server.

Greedy and sampled decode, with the single-chip server's per-request
params and seeded per-slot key streams (``submit(temperature=, top_k=,
top_p=, seed=)``).  ``quant="int8"/"int4"`` serves weight-only-quantized
params (``llama_spmd.quantize_params`` — plain-XLA scaled int matmuls,
so the tp sharding schedule is unchanged; 7B-class serving is exactly
where tp x quant must compose).  ``prefix_cache=True`` reuses donor
slots' KV rows across requests sharing a prompt prefix (the single-chip
XLA lane's admission machinery, host half shared via
``_FleetScheduler._find_donor``).
"""
from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from ..models.llama.serve import _FleetScheduler
from .llama_spmd import (_rope, cache_shardings, forward_tokens,
                         quantize_params, shard_params)
from .mesh import Mesh


def params_from_model(model, dtype=jnp.float32):
    """Per-matrix SPMD param pytree + cfg from a ``Llama`` module — the
    checkpoint bridge: reference checkpoints load into the module
    (models/llama/io.py), this ships them onto a mesh.  Layout matches
    ``llama_spmd.init_params`` (per-matrix, NOT the single-chip decode
    snapshot's fused wqkv/wgu — GSPMD shards the last axis in contiguous
    blocks, and only the split layout keeps each tp shard a whole block
    of heads; see models/llama/model.py ROADMAP note)."""
    named = dict(model.named_parameters())  # dotted names, incl. buffers

    def g(name):
        return jnp.asarray(named[name].jax, dtype)

    def stack(fmt):
        return jnp.stack([g(fmt.format(i))
                          for i in range(model.n_layers)])

    params = {
        "tok": g("tok_embedding.weight"),
        "cos": g("freqs_cos"),
        "sin": g("freqs_sin"),
        "norm": g("norm.weight"),
        "head_w": g("lm_head.weight"),
        "head_b": g("lm_head.bias"),
        "wq": stack("layers.{}.attention.Q.weight"),
        "wk": stack("layers.{}.attention.K.weight"),
        "wv": stack("layers.{}.attention.V.weight"),
        "wo": stack("layers.{}.attention.O.weight"),
        "gate": stack("layers.{}.ffn.gate.weight"),
        "up": stack("layers.{}.ffn.up.weight"),
        "down": stack("layers.{}.ffn.down.weight"),
        "in_norm": stack("layers.{}.input_norm.weight"),
        "post_norm": stack("layers.{}.post_attn_norm.weight"),
    }
    cfg = dict(vocab_size=model.vocab_size, dim=model.embed_dim,
               n_heads=model.n_heads, ffn_dim=params["gate"].shape[-1],
               n_layers=model.n_layers, max_seq_len=model.max_seq_len,
               n_kv_heads=model.n_kv_heads)
    return params, cfg


def make_serve_fns(mesh: Mesh, cfg, seed: int = 0, kv_quant=None):
    """Compiled SPMD (admit_many, decode_chunk, decode_sampled_chunk)
    triple over the mesh — the device half of :class:`SpmdLlamaServer`.
    The sampling design is the single-chip server's verbatim: per-SLOT
    PRNG key streams (seeded requests derive from a FIXED constant so a
    (prompt, params, seed) triple reproduces across servers and
    fleets), per-slot (B,) parameter vectors drawn through
    ``sample_logits_per_row`` (greedy rows resolve to exact argmax, so
    mixed fleets share one compiled program).

    ``kv_quant="int8"`` runs the fleet on (data, scale) tuple caches
    (llama_spmd.forward_tokens' static switch); the admission discipline
    is the single-chip XLA lane's verbatim (serve.py admit_many_xla):
    tuple-transient prefill, V rows scatter untouched, K rows
    dequantize -> rotate by angle(pos0) -> requantize."""
    from ..models.llama.model import sample_logits_per_row
    from ..ops.decode_step import quantize_kv

    N, S = cfg["n_layers"], cfg["max_seq_len"]
    H = cfg["n_heads"]
    hd = cfg["dim"] // H
    Hkv = cfg.get("n_kv_heads", H)
    kvq = kv_quant is not None
    c_sh = cache_shardings(mesh, cfg, kv_quant=kv_quant)
    base_key = jax.random.PRNGKey(seed)
    fixed_key = jax.random.PRNGKey(0x5EED)

    def derive_keys(seeds_k, has_seed_k, rids_k):
        """Per-request key derivation INSIDE the admission program
        (serve.py's rule: seeded -> fixed constant + seed, unseeded ->
        server seed + rid); returns (draw keys, carried slot keys)."""
        k_seed = jax.vmap(jax.random.fold_in, (None, 0))(fixed_key,
                                                         seeds_k)
        k_rid = jax.vmap(jax.random.fold_in, (None, 0))(base_key, rids_k)
        keys_k = jnp.where(has_seed_k[:, None], k_seed, k_rid)
        ks = jax.vmap(jax.random.split)(keys_k)  # (k, 2, 2)
        return ks[:, 0], ks[:, 1]

    @partial(jax.jit, static_argnames=("sample",),
             donate_argnums=(1, 2, 3, 4))
    def admit_many(params, ck, cv, tok, pkeys, prompts, pos0, slots,
                   seeds_k, has_seed_k, rids_k, temp_k, topk_k, topp_k,
                   sample=False):
        """One admission wave: prefill k same-length prompts at position
        0 in a fresh cache, position-shift the K rows by angle(pos0)
        (rotations compose additively — the serve.py argument verbatim),
        scatter them into the fleet cache rows [pos0, pos0+L) of their
        slots, and record each request's first token."""
        k, L = prompts.shape
        if kvq:
            # tuple transient: the admission prefill attends QUANTIZED
            # fresh rows exactly like standalone decode — pos0=0
            # admissions are bit-exact vs the standalone stream
            ck1 = (jnp.zeros((N, k, S, Hkv, hd), jnp.int8),
                   jnp.zeros((N, k, S, Hkv), jnp.float32))
            cv1 = (jnp.zeros((N, k, S, Hkv, hd), jnp.int8),
                   jnp.zeros((N, k, S, Hkv), jnp.float32))
        else:
            ck1 = jnp.zeros((N, k, S, Hkv, hd), ck.dtype)
            cv1 = jnp.zeros((N, k, S, Hkv, hd), cv.dtype)
        # generate()'s prefill bucketing: queries live in [0, L), so the
        # pow2 window drops only causally-masked columns
        win = min(S, 1 << (L - 1).bit_length())
        draw_k, keys_out = derive_keys(seeds_k, has_seed_k, rids_k)
        if sample:
            logits1, ck1, cv1 = forward_tokens(params, ck1, cv1, prompts,
                                               0, cfg, win=win,
                                               emit_logits=True)
            tok1 = sample_logits_per_row(logits1, draw_k, temp_k, topk_k,
                                         topp_k)
        else:
            tok1, ck1, cv1 = forward_tokens(params, ck1, cv1, prompts, 0,
                                            cfg, win=win)
        pos0 = jnp.asarray(pos0, jnp.int32)
        cd = jax.lax.dynamic_slice_in_dim(
            params["cos"], pos0, 1).astype(jnp.float32)
        sd = jax.lax.dynamic_slice_in_dim(
            params["sin"], pos0, 1).astype(jnp.float32)
        if kvq:
            # K: dequantize, rotate by angle(pos0), requantize (identity
            # + exact round-trip at pos0=0); V rows scatter untouched
            rows_k = (ck1[0][:, :, :L].astype(jnp.float32)
                      * ck1[1][:, :, :L][..., None])
            rows_k = quantize_kv(_rope(rows_k, cd, sd))
            rows_v = (cv1[0][:, :, :L], cv1[1][:, :, :L])
        else:
            rows_k = ck1[:, :, :L].astype(jnp.float32)  # (N, k, L, Hkv, hd)
            rows_v = cv1[:, :, :L]
            rows_k = _rope(rows_k, cd, sd).astype(ck.dtype)
            rows_v = rows_v.astype(cv.dtype)
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
    def admit_prefix(params, ck, cv, tok, pkeys, suffix, donor_slot,
                     donor_start, pos0, slot, seeds_k, has_seed_k,
                     rids_k, temp_k, topk_k, topp_k, kb=0, sample=False):
        """Prefix-cache admission on the mesh: reuse ``kb`` donor rows,
        prefill only the suffix — the XLA scan lane's ``admit_prefix_xla``
        (models/llama/serve.py) ported onto the GSPMD forward; the
        donor-row un-rotate/re-rotate argument is identical (RoPE is
        additive in position).  The dynamic slices ride the sharded
        (N, B, S, Hkv, hd) cache; GSPMD gathers across dp as needed —
        admission cost at big dims is the suffix prefill FLOPs, which is
        the point."""
        Ls = suffix.shape[1]
        zero = jnp.int32(0)
        dss = jax.lax.dynamic_slice
        dus = jax.lax.dynamic_update_slice
        donor_slot = jnp.asarray(donor_slot, jnp.int32)
        donor_start = jnp.asarray(donor_start, jnp.int32)
        pos0 = jnp.asarray(pos0, jnp.int32)
        slot = jnp.asarray(slot, jnp.int32)
        # un-rotate K to relative positions [0, kb): angle(-ds)
        cd = jax.lax.dynamic_slice_in_dim(
            params["cos"], donor_start, 1).astype(jnp.float32)
        sd = jax.lax.dynamic_slice_in_dim(
            params["sin"], donor_start, 1).astype(jnp.float32)
        # donor prefix rows, extracted BEFORE this slot's overwrite
        # (pure dataflow: donor == slot is fine); int8 donors: K
        # dequantizes for the un-rotate hop and requantizes (one extra
        # rounding — same class as rotation-composition rounding), V
        # copies its int8 data + scales through untouched
        if kvq:
            pk = (dss(ck[0], (zero, donor_slot, donor_start, zero, zero),
                      (N, 1, kb, Hkv, hd)).astype(jnp.float32)
                  * dss(ck[1], (zero, donor_slot, donor_start, zero),
                        (N, 1, kb, Hkv))[..., None])
            pkq, pks = quantize_kv(_rope(pk, cd, -sd))
            ck1 = (dus(jnp.zeros((N, 1, S, Hkv, hd), jnp.int8), pkq,
                       (zero,) * 5),
                   dus(jnp.zeros((N, 1, S, Hkv), jnp.float32), pks,
                       (zero,) * 4))
            cv1 = (dus(jnp.zeros((N, 1, S, Hkv, hd), jnp.int8),
                       dss(cv[0], (zero, donor_slot, donor_start, zero,
                                   zero), (N, 1, kb, Hkv, hd)),
                       (zero,) * 5),
                   dus(jnp.zeros((N, 1, S, Hkv), jnp.float32),
                       dss(cv[1], (zero, donor_slot, donor_start, zero),
                           (N, 1, kb, Hkv)), (zero,) * 4))
        else:
            pk = dss(ck, (zero, donor_slot, donor_start, zero, zero),
                     (N, 1, kb, Hkv, hd)).astype(jnp.float32)
            pv = dss(cv, (zero, donor_slot, donor_start, zero, zero),
                     (N, 1, kb, Hkv, hd))
            pk = _rope(pk, cd, -sd).astype(ck.dtype)
            ck1 = jnp.zeros((N, 1, S, Hkv, hd), ck.dtype)
            cv1 = jnp.zeros((N, 1, S, Hkv, hd), cv.dtype)
            ck1 = dus(ck1, pk, (zero,) * 5)
            cv1 = dus(cv1, pv.astype(cv.dtype), (zero,) * 5)
        draw_k, keys_out = derive_keys(seeds_k, has_seed_k, rids_k)
        # suffix queries live in [kb, kb+Ls): pow2 prefill win
        win = min(S, 1 << (kb + Ls - 1).bit_length())
        if sample:
            logits1, ck1, cv1 = forward_tokens(params, ck1, cv1, suffix,
                                               kb, cfg, win=win,
                                               emit_logits=True)
            tok1 = sample_logits_per_row(logits1, draw_k, temp_k, topk_k,
                                         topp_k)
        else:
            tok1, ck1, cv1 = forward_tokens(params, ck1, cv1, suffix, kb,
                                            cfg, win=win)
        L = kb + Ls
        c0 = jax.lax.dynamic_slice_in_dim(
            params["cos"], pos0, 1).astype(jnp.float32)
        s0 = jax.lax.dynamic_slice_in_dim(
            params["sin"], pos0, 1).astype(jnp.float32)
        if kvq:
            rows_k = (ck1[0][:, :, :L].astype(jnp.float32)
                      * ck1[1][:, :, :L][..., None])
            rk_q, rk_s = quantize_kv(_rope(rows_k, c0, s0))
            ck = (dus(ck[0], rk_q, (zero, slot, pos0, zero, zero)),
                  dus(ck[1], rk_s, (zero, slot, pos0, zero)))
            cv = (dus(cv[0], cv1[0][:, :, :L],
                      (zero, slot, pos0, zero, zero)),
                  dus(cv[1], cv1[1][:, :, :L], (zero, slot, pos0, zero)))
        else:
            rows_k = ck1[:, :, :L].astype(jnp.float32)
            rows_v = cv1[:, :, :L]
            rows_k = _rope(rows_k, c0, s0).astype(ck.dtype)
            ck = dus(ck, rows_k, (zero, slot, pos0, zero, zero))
            cv = dus(cv, rows_v.astype(cv.dtype), (zero, slot, pos0, zero,
                                                   zero))
        tok1 = tok1.reshape(1).astype(jnp.int32)
        tok = tok.at[slot].set(tok1[0])
        pkeys = pkeys.at[slot].set(keys_out[0])
        return tok1, ck, cv, tok, pkeys

    @partial(jax.jit, static_argnames=("n", "win"), donate_argnums=(1, 2))
    def decode_chunk(params, ck, cv, tok, pos, starts, n, win=None):
        """Greedy fleet chunk: n lockstep steps for every slot in one
        SPMD program; ``win`` is the pow2 attention-window bucket."""
        def step(carry, _):
            ck, cv, tok, p = carry
            nxt, ck, cv = forward_tokens(params, ck, cv, tok[:, None], p,
                                         cfg, starts=starts, win=win)
            return (ck, cv, nxt.astype(tok.dtype), p + 1), nxt

        pos = jnp.asarray(pos, jnp.int32)
        (ck, cv, tok, p), toks = jax.lax.scan(
            step, (ck, cv, tok, pos), None, length=n)
        return ck, cv, tok, toks  # toks (n, B)

    @partial(jax.jit, static_argnames=("n", "win"), donate_argnums=(1, 2))
    def decode_sampled_chunk(params, ck, cv, tok, pos, starts, keys,
                             temp_b, topk_b, topp_b, n, win=None):
        """``keys`` (B, 2): per-SLOT key streams, split per step per
        row — a row's draws depend only on its own key lineage."""
        def step(carry, _):
            ck, cv, tok, p, keys = carry
            logits, ck, cv = forward_tokens(params, ck, cv, tok[:, None],
                                            p, cfg, starts=starts,
                                            win=win, emit_logits=True)
            ks = jax.vmap(jax.random.split)(keys)  # (B, 2, 2)
            nxt = sample_logits_per_row(logits, ks[:, 0], temp_b, topk_b,
                                        topp_b).astype(tok.dtype)
            return (ck, cv, nxt, p + 1, ks[:, 1]), nxt

        pos = jnp.asarray(pos, jnp.int32)
        (ck, cv, tok, p, keys), toks = jax.lax.scan(
            step, (ck, cv, tok, pos, keys), None, length=n)
        return ck, cv, tok, toks, keys

    return admit_many, decode_chunk, decode_sampled_chunk, c_sh, \
        admit_prefix


class SpmdLlamaServer(_FleetScheduler):
    """Continuous-batching server over a dp x tp mesh (greedy or
    sampled, per-request params like the single-chip server; weight-only
    ``quant=``, int8-KV ``kv_quant=`` and ``prefix_cache=True`` all
    compose with the mesh — the full 7B serving configuration).

    >>> mesh = make_mesh({"dp": 2, "tp": 4})
    >>> srv = SpmdLlamaServer(model, mesh, batch_size=8, quant="int8")
    >>> rid = srv.submit(prompt_ids, temperature=0.8, seed=7)
    >>> done = srv.run()

    Accepts a ``Llama`` module (converted via :func:`params_from_model`)
    or a ``(params, cfg)`` pair in ``llama_spmd`` layout.  ``batch_size``
    slots ride the dp axis (NamedSharding placement needs the dp size to
    divide batch_size); chunk semantics match ``LlamaServer``
    (fixed-size compiled scans, surplus steps discarded).  Synchronous
    step loop — the single-chip server's 1-deep dispatch pipeline is a
    tunnel-latency refinement this mesh demonstration doesn't need.
    """

    def __init__(self, model_or_params, mesh: Mesh, cfg=None,
                 batch_size: int = 8, chunk: int = 32, eos_id: int = 2,
                 dtype=jnp.float32, temperature: float = 0.0,
                 top_k: int = None, top_p: float = None, seed: int = 0,
                 quant=None, prefix_cache: bool = False, kv_quant=None):
        if kv_quant not in (None, "int8"):
            raise ValueError(f"unsupported kv_quant mode: {kv_quant!r}")
        if cfg is None:
            params, cfg = params_from_model(model_or_params, dtype)
        else:
            params = model_or_params
        if quant is not None:
            # weight-only int8/int4 serving pytree; the tp schedule is
            # unchanged (llama_spmd.quantize_params) — 7B-class serving
            # is exactly where tp x quant must compose (VERDICT r04 #5)
            params = quantize_params(params, quant)
        dp = mesh.shape.get("dp", 1)
        if batch_size % dp:
            raise ValueError(f"batch_size {batch_size} must be divisible "
                             f"by the dp axis ({dp}) for NamedSharding")
        self.mesh, self.cfg = mesh, cfg
        self.B, self.chunk, self.eos_id = batch_size, chunk, eos_id
        self.S = cfg["max_seq_len"]
        self._params = shard_params(params, mesh)
        (self._admit, self._decode, self._decode_sampled, c_sh,
         self._admit_prefix) = make_serve_fns(mesh, cfg, seed=seed,
                                              kv_quant=kv_quant)
        self._prefix_cache = bool(prefix_cache)
        self.prefix_hits = 0
        self.prefix_rows_reused = 0
        self._resident: list = [None] * batch_size
        self._pkeys = jax.vmap(jax.random.fold_in, (None, 0))(
            jax.random.PRNGKey(seed), jnp.arange(batch_size))
        N = cfg["n_layers"]
        Hkv = cfg.get("n_kv_heads", cfg["n_heads"])
        hd = cfg["dim"] // cfg["n_heads"]
        # caches follow the PARAMS' dtype, not the constructor arg: on
        # the (params, cfg) path the params arrive pre-cast, and a
        # mismatched cache dtype crashes the first admission's
        # dynamic_update_slice
        cdt = self._params["tok"].dtype
        if kv_quant:
            # (data, scale) tuple caches (llama_spmd.forward_tokens'
            # static switch); c_sh is the matching sharding tuple
            def one():
                return (jax.device_put(
                            jnp.zeros((N, self.B, self.S, Hkv, hd),
                                      jnp.int8), c_sh[0]),
                        jax.device_put(
                            jnp.zeros((N, self.B, self.S, Hkv),
                                      jnp.float32), c_sh[1]))
            self._ck, self._cv = one(), one()
        else:
            self._ck = jax.device_put(
                jnp.zeros((N, self.B, self.S, Hkv, hd), cdt), c_sh)
            self._cv = jax.device_put(
                jnp.zeros((N, self.B, self.S, Hkv, hd), cdt), c_sh)
        self._tok = jnp.ones((self.B,), jnp.int32)
        self._init_fleet_state()
        self._init_sampling_state(cfg["vocab_size"], temperature,
                                  top_k, top_p)

    # host scheduling: _FleetScheduler (serve.py) is the protocol's one
    # implementation — submit/admission-planning/finish/truncation rules
    # cannot drift from the single-chip server's
    def _on_rewind(self):
        # a position reset invalidates every prefix-cache donor: rows
        # above the new position get rewritten by decode steps
        self._resident = [None] * self.B

    def _try_admit(self):
        plan = self._plan_admissions()
        if not plan:
            return
        by_len = {}
        reuse = []  # (slot, req, donor) — prefix-cache admissions
        planned_slots = {s for s, _ in plan}
        row_samples = {}
        for slot, req in plan:
            row_samples[slot] = self._slot_params(slot, req)
            donor = self._find_donor(req.prompt, slot, planned_slots) \
                if self._prefix_cache else None
            if donor is not None:
                reuse.append((slot, req, donor))
            else:
                by_len.setdefault(len(req.prompt), []).append((slot, req))
        waves, firsts_dev = [], []
        for L, group in sorted(by_len.items()):
            pos0 = self._pos - L
            for sub in self._pow2_subwaves(group):
                prompts, slots, seeds, has_seed, rids = \
                    self._wave_arrays(sub)
                (tok1, self._ck, self._cv, self._tok,
                 self._pkeys) = self._admit(
                    self._params, self._ck, self._cv, self._tok,
                    self._pkeys, jnp.asarray(prompts), pos0,
                    jnp.asarray(slots), jnp.asarray(seeds),
                    jnp.asarray(has_seed), jnp.asarray(rids),
                    jnp.asarray(self._ptemp[slots]),
                    jnp.asarray(self._ptopk[slots]),
                    jnp.asarray(self._ptopp[slots]),
                    sample=any(row_samples[s] for s, _ in sub))
                for s, r in sub:
                    self._starts[s] = pos0
                    if self._prefix_cache:
                        self._resident[s] = (r.rid, tuple(r.prompt), pos0)
                waves.append(sub)
                firsts_dev.append(tok1)
        # prefix-cache admissions: one program each (serve.py's rule —
        # donors vary; compiled per (kb, suffix-length) pair)
        for slot, req, (dslot, dstart, kb) in reuse:
            L = len(req.prompt)
            pos0 = self._pos - L
            suffix = np.array([req.prompt[kb:]], np.int32)
            sl = np.array([slot], np.int32)
            (tok1, self._ck, self._cv, self._tok,
             self._pkeys) = self._admit_prefix(
                self._params, self._ck, self._cv, self._tok, self._pkeys,
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

    def step(self, n: int = None):
        """Admit what fits, decode ``n`` (default ``chunk``) lockstep
        tokens, credit them; returns newly finished requests."""
        before = set(self._finished)
        self._try_admit()
        if self.active:
            navail = self.S - self._pos
            if navail <= 0:
                self._truncate_fleet()
            else:
                n = n or self.chunk
                win = min(self.S, 1 << (self._pos + n - 1).bit_length())
                starts = jnp.asarray(self._starts)
                any_sampled = any(
                    self._ptemp[i] > 0 for i in range(self.B)
                    if self._slots[i] is not None)
                if any_sampled:
                    (self._ck, self._cv, self._tok, toks,
                     self._pkeys) = self._decode_sampled(
                        self._params, self._ck, self._cv, self._tok,
                        self._pos, starts, self._pkeys,
                        jnp.asarray(self._ptemp),
                        jnp.asarray(self._ptopk),
                        jnp.asarray(self._ptopp), n, win=win)
                else:
                    self._ck, self._cv, self._tok, toks = self._decode(
                        self._params, self._ck, self._cv, self._tok,
                        self._pos, starts, n, win=win)
                valid = min(n, navail)
                self._pos += valid
                toks = np.asarray(toks)[:valid]
                for slot in range(self.B):
                    req = self._slots[slot]
                    if req is None:
                        continue
                    for t in toks[:, slot]:
                        req.tokens.append(int(t))
                        if req.tokens[-1] == self.eos_id \
                                or len(req.tokens) >= req.max_new_tokens:
                            break
                    self._maybe_finish(slot)
                    if self._prefix_cache:
                        self._grow_resident(slot, req)
        return [self._finished[r] for r in set(self._finished) - before]

    def run(self, max_steps: int = 10_000):
        """Drain the queue; returns {rid: Request}."""
        for _ in range(max_steps):
            if not self._queue and self.active == 0:
                break
            self.step()
        return dict(self._finished)
