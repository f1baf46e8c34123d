"""Llama-2-7B-dims DIRECT-KERNEL quant probe: bf16 vs int8 vs int4.

Unlike _drive_7b.py (whole-model `generate`, bf16 only — 13.5 GB, no room
for a second format), this drives `fused_decode_token` directly with
random DEVICE-GENERATED weights, one format at a time (buffers freed
between formats), so int8 (6.7 GB) and int4 (3.4 GB) fit alongside the
embedding.  Reports the marginal us/token of the whole-token kernel via
the two-chunk-difference recipe (CLAUDE.md): weight-streaming rooflines
at 819 GB/s are ~16.4 ms (bf16), ~8.2 ms (int8), ~4.1 ms (int4).

Run alone (ONE TPU process), 20+ min timeout (three Mosaic compiles).
"""
import gc
import time

import numpy as np

import jax
import jax.numpy as jnp

from pydynet_tpu.ops import decode_step as ds

D, NL, H, F, V, S = 4096, 32, 32, 11008, 32000, 1024
BF16 = jnp.bfloat16


def log(msg):
    print(f"[{time.time() - T0:7.1f}s] {msg}", flush=True)


def build(fmt, key):
    """Device-resident random weight set for one format."""
    ks = iter(jax.random.split(key, 24))
    Dp = ds.lane_pad_dim(D)
    hd = D // H

    def rnd(shape, scale=0.02, dtype=BF16):
        return (jax.random.normal(next(ks), shape, jnp.float32)
                * scale).astype(dtype)

    def rnd8(shape):
        return jax.random.randint(next(ks), shape, -127, 128, jnp.int8)

    inv = 1.0 / (10000 ** (np.arange(0, hd, 2) / hd))
    t = np.arange(S)[:, None]
    cosr = jnp.asarray(np.tile(np.repeat(np.cos(t * inv), 2, -1), (1, H)),
                       BF16)
    sinr = jnp.asarray(np.tile(np.repeat(np.sin(t * inv), 2, -1), (1, H)),
                       BF16)
    w = dict(
        emb=rnd((V, D), 1.0),
        cosr=cosr, sinr=sinr,
        rot=jnp.asarray(ds.rope_pair_swap_matrix(D), BF16),
        hmask=jnp.pad(ds.head_mask_matrix(D, H, BF16),
                      ((0, Dp - D), (0, 0))),
        final_norm=jnp.ones((1, D), BF16),
        in_norm=jnp.ones((NL, 1, D), BF16),
        post_norm=jnp.ones((NL, 1, D), BF16),
        head_b=jnp.zeros((1, V), jnp.float32),
    )
    quant_kw = {}
    if fmt == "bf16":
        for nm, shp in (("wq", (NL, D, D)), ("wk", (NL, D, D)),
                        ("wv", (NL, D, D)), ("wo", (NL, D, D)),
                        ("gate", (NL, D, F)), ("up", (NL, D, F)),
                        ("down", (NL, F, D))):
            w[nm] = rnd(shp)
        w["head_w"] = rnd((D, V))
    else:
        kdiv = 2 if fmt == "int4" else 1
        for nm, shp in (("wq", (NL, D // kdiv, D)),
                        ("wk", (NL, D // kdiv, D)),
                        ("wv", (NL, D // kdiv, D)),
                        ("wo", (NL, D // kdiv, D)),
                        ("gate", (NL, D // kdiv, F)),
                        ("up", (NL, D // kdiv, F)),
                        ("down", (NL, F // kdiv, D))):
            w[nm] = rnd8(shp)
        w["head_w"] = rnd8((D // kdiv, V))
        sc = 2e-4  # small positive scales keep activations bounded
        quant_kw = dict(
            s_attn=jnp.full((NL, 8, D), sc, jnp.float32),
            s_ffn=jnp.full((NL, 8, F), sc, jnp.float32),
            head_s=jnp.full((1, V), sc, jnp.float32),
        )
        if fmt == "int4":
            quant_kw["q4"] = True
    jax.block_until_ready(w["emb"])
    return w, quant_kw


def measure(fmt, seed):
    Dp = ds.lane_pad_dim(D)
    vt = ds.pick_vt(V, D)
    sb = ds.pick_sb(S)
    w, qkw = build(fmt, jax.random.PRNGKey(seed))
    log(f"{fmt}: weights resident (vt={vt}, sb={sb})")

    import functools

    @functools.partial(jax.jit, static_argnames=("n",),
                       donate_argnames=("ck", "cv"))
    def chain(w, ck, cv, tok0, n):
        def step(carry, _):
            ck, cv, tok, p = carry
            nxt, ck, cv = ds.fused_decode_token(
                p, tok, w["emb"], w["cosr"], w["sinr"], w["rot"],
                w["hmask"], w["final_norm"], w["wq"], w["wk"], w["wv"],
                w["wo"], w["gate"], w["up"], w["down"], w["in_norm"],
                w["post_norm"], w["head_w"], w["head_b"], ck, cv,
                vt=vt, sb=sb, **qkw)
            return (ck, cv, nxt.astype(jnp.int32), p + 1), nxt

        (ck, cv, tok, p), toks = jax.lax.scan(
            step, (ck, cv, tok0, jnp.int32(4)), None, length=n)
        return ck, cv, toks

    def run_len(n, s):
        ck = jnp.zeros((NL, S, Dp), BF16)
        cv = jnp.zeros((NL, S, Dp), BF16)
        tok0 = jnp.asarray([1 + s], jnp.int32)
        t0 = time.time()
        ck, cv, toks = chain(w, ck, cv, tok0, n)
        np.asarray(toks)  # host readback = the only reliable sync
        return time.time() - t0

    log(f"{fmt}: compiling (first Mosaic compile of a 32-layer kernel "
        "is slow)...")
    run_len(16, 0)
    run_len(128, 0)
    t16 = min(run_len(16, s) for s in (1, 2, 3))
    t128 = min(run_len(128, s) for s in (1, 2, 3))
    marg = (t128 - t16) / (128 - 16) * 1e3
    log(f"{fmt}: chunk16 {t16:.3f}s chunk128 {t128:.3f}s -> "
        f"marginal {marg:.2f} ms/token ({1000.0 / marg:.0f} tok/s)")
    del w, qkw
    gc.collect()
    return marg


if __name__ == "__main__":
    T0 = time.time()
    log(f"devices: {jax.devices()}")
    results = {}
    for i, fmt in enumerate(("int4", "int8", "bf16")):  # smallest first
        results[fmt] = measure(fmt, seed=i)  # fixed: reproducible weights
    log("rooflines @819GB/s: bf16 ~16.4  int8 ~8.2  int4 ~4.1 ms/token")
    log(f"measured ms/token: " + "  ".join(
        f"{k} {v:.2f}" for k, v in results.items()))
