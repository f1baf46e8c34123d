"""Expert parallelism (ep): a switch-style top-1 MoE FFN, GShard-sharded.

The reference has no MoE (its FFN is dense, llm/llama/model.py:47-58); this
module exists to fill the expert axis of the TPU scale-out story (SURVEY.md
§2.6 extension scope).  It follows the GShard/Switch recipe in its
sharding-friendly form: routing is expressed as dense one-hot dispatch /
combine einsums over a (tokens, experts, capacity) tensor, and the expert
weights carry a leading expert axis sharded over the ``ep`` mesh axis —
GSPMD then partitions the dispatch einsums into the all-to-all exchange
automatically.  Everything is jit-compatible (static capacity, no ragged
shapes) and differentiable (the router's gate probability multiplies the
combine path, the standard straight-through-free switch formulation).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from .mesh import Mesh, named_sharding


def init_moe_params(rng: np.random.RandomState, n_experts: int, dim: int,
                    ffn_dim: int, dtype=jnp.float32):
    """{"wg" router (D, E); "w1" (E, D, F); "w2" (E, F, D)}."""
    s = 0.05
    return {
        "wg": jnp.asarray(rng.standard_normal((dim, n_experts)) * s, dtype),
        "w1": jnp.asarray(
            rng.standard_normal((n_experts, dim, ffn_dim)) * s, dtype),
        "w2": jnp.asarray(
            rng.standard_normal((n_experts, ffn_dim, dim)) * s, dtype),
    }


def shard_moe_params(params, mesh: Mesh):
    """Experts over ``ep``; the router is replicated."""
    return {
        "wg": jax.device_put(params["wg"], named_sharding(mesh)),
        "w1": jax.device_put(params["w1"],
                             named_sharding(mesh, "ep", None, None)),
        "w2": jax.device_put(params["w2"],
                             named_sharding(mesh, "ep", None, None)),
    }


def capacity(n_tokens: int, n_experts: int,
             capacity_factor: float = 2.0) -> int:
    return max(1, int(math.ceil(n_tokens / n_experts * capacity_factor)))


def moe_ffn(params, x, capacity_factor: float = 2.0):
    """Top-1 switch FFN over tokens ``x`` (T, D) -> (T, D).

    Each token goes to its argmax expert, scaled by the router probability;
    tokens past an expert's capacity are dropped (output 0 for the FFN
    branch — callers add the residual).  Returns ``(out, aux)`` with the
    standard switch load-balancing auxiliary loss.
    """
    T, D = x.shape
    E = params["wg"].shape[1]
    C = capacity(T, E, capacity_factor)

    gates = jax.nn.softmax(
        (x @ params["wg"]).astype(jnp.float32), axis=-1)  # (T, E)
    eidx = jnp.argmax(gates, axis=-1)                     # (T,)
    gate = jnp.take_along_axis(gates, eidx[:, None], 1)[:, 0]

    onehot = jax.nn.one_hot(eidx, E, dtype=jnp.float32)   # (T, E)
    pos_in_e = jnp.cumsum(onehot, axis=0) - onehot        # (T, E)
    pos = jnp.sum(pos_in_e * onehot, axis=-1).astype(jnp.int32)  # (T,)
    keep = (pos < C).astype(jnp.float32)

    # (T, E, C) one-hot dispatch; combine additionally carries the gate
    dispatch = (onehot * keep[:, None])[:, :, None] \
        * jax.nn.one_hot(pos, C, dtype=jnp.float32)[:, None, :]
    expert_in = jnp.einsum("tec,td->ecd", dispatch,
                           x.astype(jnp.float32))         # (E, C, D)

    h = jnp.einsum("ecd,edf->ecf", expert_in, params["w1"].astype(jnp.float32))
    h = h * jax.nn.sigmoid(h)  # silu, matching the dense FFN's activation
    expert_out = jnp.einsum("ecf,efd->ecd", h,
                            params["w2"].astype(jnp.float32))

    combine = dispatch * gate[:, None, None]
    out = jnp.einsum("tec,ecd->td", combine, expert_out)

    # switch aux loss: E * sum_e (fraction routed to e) * (mean gate for e)
    frac = jnp.mean(onehot, axis=0)
    prob = jnp.mean(gates, axis=0)
    aux = E * jnp.sum(frac * prob)
    return out.astype(x.dtype), aux


def moe_ffn_reference(params, x, capacity_factor: float = 2.0):
    """Per-token NumPy mirror of :func:`moe_ffn` (tests)."""
    x = np.asarray(x, np.float32)
    wg = np.asarray(params["wg"], np.float32)
    w1 = np.asarray(params["w1"], np.float32)
    w2 = np.asarray(params["w2"], np.float32)
    T, D = x.shape
    E = wg.shape[1]
    C = capacity(T, E, capacity_factor)

    logits = x @ wg
    g = np.exp(logits - logits.max(-1, keepdims=True))
    g /= g.sum(-1, keepdims=True)
    out = np.zeros_like(x)
    used = np.zeros(E, np.int64)
    for t in range(T):
        e = int(np.argmax(g[t]))
        if used[e] >= C:
            used[e] += 1  # over capacity: dropped (residual only)
            continue
        used[e] += 1
        h = x[t] @ w1[e]
        h = h * (1.0 / (1.0 + np.exp(-h)))  # silu
        out[t] = (h @ w2[e]) * g[t, e]
    return out
