"""Pipeline parallelism (GPipe-style) over a ``pp`` mesh axis.

The reference has no distributed layer at all (SURVEY.md §2.6); this module
fills the pipeline axis of the TPU scale-out story the idiomatic way: the
layer stack is split into P contiguous stages, each stage's weights live on
one ring position of the ``pp`` axis, and microbatches stream through the
ring with ``jax.lax.ppermute`` inside one ``shard_map`` — no host
orchestration, one XLA program, and the backward pipeline falls out of AD
(the transpose of a ppermute is the reverse ppermute, so jax.grad schedules
the reverse-order bubble automatically).

Composes with data parallelism in the same shard_map: shard the microbatch
dimension's batch axis over ``dp`` and the stage axis over ``pp``
(``make_pp_train_step`` below does both).  Tensor parallelism composes too —
on a mesh with a ``tp`` axis the layer weights inside the pipeline region
are Megatron-sharded (QKV/gate-up columns = heads, output/down rows) and the
layer body issues the two ``psum``s per block *manually* (GSPMD cannot see
inside a shard_map region, so unlike ``llama_spmd`` the collectives are
written out): a full dp x pp x tp 3-D mesh in ONE compiled program.
"""
from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

from .mesh import Mesh, named_sharding, P, shard_map


def pipeline_apply(stage_fn, stage_params, x_mb, *, axis: str = "pp",
                   n_stages: int):
    """Run ``x_mb`` (M, ...) through ``n_stages`` pipeline stages.

    MUST be called inside a ``shard_map`` whose mesh has axis ``axis`` of
    size ``n_stages``; ``stage_params`` is this device's stage's parameter
    pytree (stage-sharded outside), ``stage_fn(params, x) -> y`` with
    ``y.shape == x.shape`` (hidden-state-in, hidden-state-out stages).

    Classic GPipe schedule: T = M + P - 1 ticks; at tick t stage 0 injects
    microbatch t, stage p processes what stage p-1 produced at t-1 (carried
    by a ring ppermute), and stage P-1 emits microbatch t-(P-1).  Outputs
    are accumulated into a zeros buffer on the last stage only and
    psum-broadcast at the end, so the result is replicated over ``axis``.
    """
    M = x_mb.shape[0]
    Pn = n_stages
    p = jax.lax.axis_index(axis)
    perm = [(i, (i + 1) % Pn) for i in range(Pn)]

    def tick(carry, t):
        state, acc = carry
        mb = jnp.clip(t, 0, M - 1)
        inj = jax.lax.dynamic_index_in_dim(x_mb, mb, 0, keepdims=False)
        inp = jnp.where(p == 0, inj, state)
        out = stage_fn(stage_params, inp)
        oidx = jnp.clip(t - (Pn - 1), 0, M - 1)
        write = jnp.logical_and(p == Pn - 1, t >= Pn - 1)
        upd = jax.lax.dynamic_update_index_in_dim(
            acc, out.astype(acc.dtype), oidx, 0)
        acc = jnp.where(write, upd, acc)
        state = jax.lax.ppermute(out, axis, perm)
        return (state, acc), None

    state0 = jnp.zeros_like(x_mb[0])
    acc0 = jnp.zeros_like(x_mb)
    (_, acc), _ = jax.lax.scan(tick, (state0, acc0),
                               jnp.arange(M + Pn - 1, dtype=jnp.int32))
    # everything but the last stage holds zeros -> psum replicates the result
    return jax.lax.psum(acc, axis)


# --------------------------------------------------------------------- #
#                 Llama over a (dp, pp[, tp]) mesh                       #
# --------------------------------------------------------------------- #
# llama_spmd's per-matrix layout is already tp-shardable as-is: column
# blocks of each matrix are contiguous heads / ffn columns, so sharding
# the last axis over "tp" is exactly Megatron column parallelism
from .llama_spmd import LAYER_KEYS

_TP_COL = ("wq", "wk", "wv", "gate", "up")   # column-parallel (heads / ffn)
_TP_ROW = ("wo", "down")                     # row-parallel (psum after)


def _kv_sharded(cfg, tp_size: int) -> bool:
    """GQA kv-head placement across tp ranks: group-sharded when each rank
    can own whole KV heads (Hkv % tp == 0 — its Hkv/tp heads then serve
    exactly its H/tp query heads), else replicated (tp > Hkv)."""
    hkv = cfg.get("n_kv_heads") or cfg["n_heads"]
    return hkv % tp_size == 0


def _tp_stage_specs(cfg=None, tp_size: int = 1):
    """shard_map in_specs for tp-split stage-stacked layer params."""
    kv_shard = cfg is None or _kv_sharded(cfg, tp_size)
    spec = {}
    for k in LAYER_KEYS:
        if k in _TP_COL:
            if k in ("wk", "wv") and not kv_shard:
                spec[k] = P("pp")  # kv heads replicated across tp
            else:
                spec[k] = P("pp", None, None, "tp")
        elif k in _TP_ROW:
            spec[k] = P("pp", None, "tp", None)
        else:  # norms: (P, N/P, D), replicated over tp
            spec[k] = P("pp")
    return spec


def prepare_pp_params(params, mesh: Mesh, n_stages: int, cfg=None):
    """One-call prep: ``llama_spmd.init_params``-layout pytree -> stage-
    stacked (and, if the mesh has a ``tp`` axis, head-split tp-sharded)
    params placed on the mesh, ready for ``make_pp_train_step``.

    ``cfg`` is required for GQA layouts under tp (kv-head placement needs
    ``n_kv_heads``); MHA layouts may omit it."""
    if "tp" in mesh.axis_names and mesh.shape["tp"] > 1:
        tp_size = mesh.shape["tp"]
        if cfg is None and params["wk"].shape[-1] != params["wq"].shape[-1]:
            raise ValueError(
                "GQA layout detected (narrow wk): pass cfg= to "
                "prepare_pp_params so kv heads can be placed across tp")
        params = stack_stages(params, n_stages)
        specs = _tp_stage_specs(cfg, tp_size)
        return {k: jax.device_put(
            v, named_sharding(mesh, *specs.get(k, P())))
            for k, v in params.items()}
    return shard_stage_params(stack_stages(params, n_stages), mesh)


def stack_stages(params, n_stages: int, pp_keys=LAYER_KEYS):
    """Reshape layer-stacked (N, ...) per-layer params to (P, N/P, ...)."""
    out = dict(params)
    for k in pp_keys:
        v = params[k]
        N = v.shape[0]
        assert N % n_stages == 0, (k, N, n_stages)
        out[k] = v.reshape((n_stages, N // n_stages) + v.shape[1:])
    return out


def shard_stage_params(params, mesh: Mesh, pp_keys=LAYER_KEYS):
    """Place stage-stacked params: stage axis over ``pp``, rest replicated."""
    out = {}
    for k, v in params.items():
        if k in pp_keys:
            sh = named_sharding(mesh, "pp", *([None] * (v.ndim - 1)))
        else:
            sh = named_sharding(mesh)
        out[k] = jax.device_put(v, sh)
    return out


def _layer_body(h, W, cos, sin, mask, cfg):
    """One pre-norm transformer layer (the llama_spmd math, one source)."""
    from . import llama_spmd

    return llama_spmd.layer_dense(h, W, cos, sin, mask, cfg)


def _layer_body_tp(h, W, cos, sin, mask, cfg, tp_axis: str,
                   kv_shard: bool = True):
    """Megatron-tp variant of ``_layer_body`` with MANUAL collectives,
    for use inside a shard_map region (GSPMD cannot partition there).

    ``W`` holds this rank's shards: wq (D, D/tp) = a contiguous block of
    query heads, gate/up (D, F/tp), wo (D/tp, D) and down (F/tp, D) rows.
    GQA kv heads are either group-sharded — wk/wv (D, Dkv/tp), each rank's
    Hkv/tp kv heads serving exactly its H/tp query heads — or, when
    tp > Hkv, replicated (D, Dkv) with the rank gathering the groups its
    query heads read (``axis_index``-based).  Attention runs entirely on
    local heads; the row-parallel output/down matmuls produce partial sums
    that one ``psum`` each turns into the replicated residual stream — the
    standard 2-collectives-per-block Megatron schedule, here riding ICI
    inside the pipeline ring.
    """
    from . import llama_spmd

    B, L, D = h.shape
    hd = D // cfg["n_heads"]
    group = cfg["n_heads"] // (cfg.get("n_kv_heads") or cfg["n_heads"])
    Hl = W["wq"].shape[1] // hd      # local query heads on this tp rank
    Hkvl = W["wk"].shape[1] // hd    # local kv heads (sharded or all)
    hn = llama_spmd._rms(h, W["in_norm"])
    q = (hn @ W["wq"]).reshape(B, L, Hl, hd)
    k = (hn @ W["wk"]).reshape(B, L, Hkvl, hd)
    v = (hn @ W["wv"]).reshape(B, L, Hkvl, hd)
    q, k = llama_spmd._rope(q, cos, sin), llama_spmd._rope(k, cos, sin)
    if group > 1:
        # NOTE: branch on the EXPLICIT placement flag, not on shapes —
        # with Hkv=2, tp=4 the replicated kv-head count coincidentally
        # equals the local query-head count and a shape test mispairs them
        if kv_shard:
            # group-sharded: local kv head i//group serves local query i
            k = jnp.repeat(k, group, axis=2)
            v = jnp.repeat(v, group, axis=2)
        else:
            # replicated kv (all Hkv heads local): gather the groups this
            # rank's contiguous query-head block [p*Hl, (p+1)*Hl) reads
            p_idx = jax.lax.axis_index(tp_axis)
            gidx = (p_idx * Hl + jnp.arange(Hl)) // group
            k = jnp.take(k, gidx, axis=2)
            v = jnp.take(v, gidx, axis=2)
    s = jnp.einsum("blhd,bmhd->bhlm", q, k) / math.sqrt(hd)
    p = jax.nn.softmax(s + mask, axis=-1)
    att = jnp.einsum("bhlm,bmhd->blhd", p, v).reshape(B, L, Hl * hd)
    z = h + jax.lax.psum(att @ W["wo"], tp_axis)
    zn = llama_spmd._rms(z, W["post_norm"])
    g = zn @ W["gate"]
    u = zn @ W["up"]
    ff = (g * jax.nn.sigmoid(g)) * u
    return z + jax.lax.psum(ff @ W["down"], tp_axis)


def pp_forward_logits(params, tokens, cfg, mesh: Mesh, microbatches: int,
                      n_stages: int):
    """Full-sequence causal forward with the layer stack pipelined over
    ``pp``, the batch sharded over ``dp``, and — if the mesh has a ``tp``
    axis — each layer Megatron-sharded over ``tp`` with manual psums
    (``_layer_body_tp``), all inside ONE shard_map region.

    ``params`` must come from ``prepare_pp_params`` (stage-stacked; head-
    split when tp).  Embedding / final norm / lm_head run replicated
    outside the pipeline region (they are tiny at this scale).
    """
    B, L = tokens.shape
    M = microbatches
    assert B % M == 0, (B, M)
    h = params["tok"][tokens]
    cos, sin = params["cos"][:L], params["sin"][:L]
    mask = jnp.where(
        jnp.arange(L)[:, None] >= jnp.arange(L)[None, :], 0.0,
        -jnp.inf).astype(h.dtype)

    tp = "tp" in mesh.axis_names and mesh.shape["tp"] > 1
    if tp:
        assert cfg["n_heads"] % mesh.shape["tp"] == 0, \
            (cfg["n_heads"], mesh.shape["tp"])
        stage_in_spec = _tp_stage_specs(cfg, mesh.shape["tp"])
        body = partial(_layer_body_tp, tp_axis="tp",
                       kv_shard=_kv_sharded(cfg, mesh.shape["tp"]))
    else:
        stage_in_spec = {k: P("pp") for k in LAYER_KEYS}
        body = _layer_body
    stage_params = {k: params[k] for k in LAYER_KEYS}

    h_mb = h.reshape((M, B // M) + h.shape[1:])

    dp = "dp" in mesh.axis_names
    mb_spec = P(None, "dp") if dp else P()

    def run(W, h_mb, cos, sin, mask):
        W = {k: v[0] for k, v in W.items()}  # (1, N/P, ...) -> (N/P, ...)

        def stage_fn(Ws, hmb):
            def one(h, xs):
                return body(h, xs, cos, sin, mask, cfg), None

            return jax.lax.scan(one, hmb, Ws)[0]

        return pipeline_apply(stage_fn, W, h_mb, axis="pp",
                              n_stages=n_stages)

    h_mb = shard_map(
        run,
        mesh=mesh,
        in_specs=(stage_in_spec, mb_spec, P(), P(), P()),
        out_specs=mb_spec,
        check_vma=False,
    )(stage_params, h_mb, cos, sin, mask)

    h = h_mb.reshape((B,) + h_mb.shape[2:])
    from . import llama_spmd
    h = llama_spmd._rms(h, params["norm"])
    return h @ params["head_w"] + params["head_b"]


def make_pp_train_step(mesh: Mesh, cfg, lr: float = 1e-3,
                       microbatches: int = 4):
    """Compiled pipeline-parallel (x data-parallel x tensor-parallel) step.

    ``mesh`` must have a ``pp`` axis (stage count must divide n_layers) and
    may have ``dp`` and/or ``tp`` axes; returns ``step(params, tokens,
    targets) -> (params, loss)`` over ``prepare_pp_params``-placed params
    (stage-stacked; head-split and tp-sharded when the mesh has tp)."""
    n_stages = mesh.shape["pp"]
    assert cfg["n_layers"] % n_stages == 0, (cfg["n_layers"], n_stages)

    def loss_fn(params, tokens, targets):
        logits = pp_forward_logits(params, tokens, cfg, mesh, microbatches,
                                   n_stages)
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)
        return jnp.mean(nll)

    @jax.jit
    def step(params, tokens, targets):
        loss, grads = jax.value_and_grad(loss_fn)(params, tokens, targets)
        new_params = jax.tree.map(lambda p, g: p - lr * g, params, grads)
        return new_params, loss

    return step
