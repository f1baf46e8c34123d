"""Ring attention: exact attention over sequence-parallel shards.

The reference's attention is a dense O(L^2) single-device softmax over a
fixed 1024-token window (SURVEY.md §5 "long-context: absent").  This is the
TPU-native extension path: shard the sequence over a mesh axis (``sp``),
keep Q resident per device, and rotate K/V blocks around the ring with
``lax.ppermute`` while accumulating a running-softmax (flash-attention
style: carry the block max ``m``, denominator ``l``, and weighted
accumulator) — so attention over N x L_local tokens uses O(L_local) memory
per chip and the K/V transfers ride the ICI ring, fully overlapped by XLA
with the local block matmuls.

Causality is handled by block position: ring step s on device i processes
K/V block j = (i - s) mod n, which is fully visible when j < i, intra-block
causal when j == i, and fully masked when j > i.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from .mesh import shard_map  # one version-compat shim for the package


def _local_ring(q, k, v, *, axis_name: str, causal: bool, scale: float):
    """Per-device body: q/k/v are (B, Lloc, H, d) local shards."""
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    B, Lloc, H, d = q.shape

    qf = q.astype(jnp.float32) * scale
    neg = jnp.asarray(-jnp.inf, jnp.float32)

    m0 = jnp.full((B, H, Lloc, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((B, H, Lloc, 1), jnp.float32)
    acc0 = jnp.zeros((B, H, Lloc, d), jnp.float32)

    perm = [(p, (p + 1) % n) for p in range(n)]
    tri = (jnp.arange(Lloc)[:, None] >= jnp.arange(Lloc)[None, :])

    def accum(m, l, acc, kb, vb, s):
        """Fold K/V block ``s`` hops upstream into the running softmax."""
        j = (idx - s) % n
        sblk = jnp.einsum("blhd,bmhd->bhlm", qf,
                          kb.astype(jnp.float32))  # (B,H,Lloc,Lloc)
        if causal:
            # diagonal block: intra-block causal; upstream (j < idx):
            # fully visible; downstream: fully masked
            blk_mask = jnp.where(j == idx, tri, j < idx)
            sblk = jnp.where(blk_mask[None, None], sblk, neg)

        m_new = jnp.maximum(m, jnp.max(sblk, -1, keepdims=True))
        # fully-masked rows keep m = -inf; guard the exp shift
        shift = jnp.where(jnp.isinf(m_new), 0.0, m_new)
        p = jnp.exp(sblk - shift)
        p = jnp.where(jnp.isinf(sblk), 0.0, p)
        alpha = jnp.where(jnp.isinf(m), 0.0, jnp.exp(m - shift))
        l_new = l * alpha + jnp.sum(p, -1, keepdims=True)
        acc_new = acc * alpha + jnp.einsum(
            "bhlm,bmhd->bhld", p, vb.astype(jnp.float32))
        return m_new, l_new, acc_new

    def step(carry, s):
        m, l, acc, kb, vb = carry
        m, l, acc = accum(m, l, acc, kb, vb, s)
        kb = jax.lax.ppermute(kb, axis_name, perm)
        vb = jax.lax.ppermute(vb, axis_name, perm)
        return (m, l, acc, kb, vb), None

    # n-1 rotated steps, then the final block WITHOUT the trailing
    # ppermute (a full-circle rotation whose blocks are never read would
    # cost one extra round of K/V ICI traffic per call)
    (m, l, acc, kb, vb), _ = jax.lax.scan(step, (m0, l0, acc0, k, v),
                                          jnp.arange(n - 1))
    m, l, acc = accum(m, l, acc, kb, vb, jnp.asarray(n - 1))
    out = acc / jnp.maximum(l, 1e-30)
    return out.transpose(0, 2, 1, 3).astype(q.dtype)  # (B, Lloc, H, d)


def ring_attention(q, k, v, mesh: Mesh, axis_name: str = "sp",
                   causal: bool = True, scale: float = None):
    """Exact attention over (B, L, H, d) inputs sequence-sharded on
    ``axis_name``; returns the output with the same sharding."""
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    spec = P(None, axis_name, None, None)
    fn = shard_map(
        functools.partial(_local_ring, axis_name=axis_name, causal=causal,
                          scale=scale),
        mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False)
    return fn(q, k, v)
