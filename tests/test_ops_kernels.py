"""Pallas kernels (interpret mode on CPU) vs XLA references."""
import math

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pydynet_tpu.ops import decode_step as ds
from pydynet_tpu.ops import flash_attention as fa


def _rope_interleaved(x, cos, sin):
    xr, xi = x[..., 0::2], x[..., 1::2]
    return np.stack([xr * cos - xi * sin, xr * sin + xi * cos],
                    axis=-1).reshape(x.shape)


def _reference_decode_step(pos, h0, params, ck_std, cv_std, cfg):
    """NumPy reference: one token through all layers (head-split math),
    caches in the standard (N, S, H, hd) layout."""
    N, H, D, S = cfg["n_layers"], cfg["n_heads"], cfg["dim"], cfg["seq"]
    hd = D // H
    inv = 1.0 / (10000 ** (np.arange(0, hd, 2) / hd))
    cos = np.cos(pos * inv)
    sin = np.sin(pos * inv)

    def rms(x, w):
        return x / np.sqrt((x * x).mean(-1, keepdims=True) + 1e-6) * w

    h = h0.copy()
    for i in range(N):
        hn = rms(h, params["in_norm"][i, 0])
        q = hn @ params["wq"][i]
        k = hn @ params["wk"][i]
        v = hn @ params["wv"][i]
        qh = _rope_interleaved(q.reshape(1, H, hd), cos, sin)
        kh = _rope_interleaved(k.reshape(1, H, hd), cos, sin)
        ck_std[i, pos] = kh[0]
        cv_std[i, pos] = v.reshape(H, hd)
        out = np.zeros((H, hd))
        for hh in range(H):
            s = ck_std[i, :pos + 1, hh] @ qh[0, hh] / math.sqrt(hd)
            p = np.exp(s - s.max())
            p /= p.sum()
            out[hh] = p @ cv_std[i, :pos + 1, hh]
        z = h + out.reshape(1, D) @ params["wo"][i]
        zn = rms(z, params["post_norm"][i, 0])
        g = zn @ params["gate"][i]
        u = zn @ params["up"][i]
        h = z + ((g / (1 + np.exp(-g))) * u) @ params["down"][i]
    return rms(h, params["final_norm"][0])


@pytest.fixture(scope="module")
def tiny():
    rng = np.random.default_rng(0)
    cfg = dict(n_layers=2, n_heads=2, dim=16, seq=32, ffn=24)
    N, D, F, S = cfg["n_layers"], cfg["dim"], cfg["ffn"], cfg["seq"]
    p = {
        "wq": rng.standard_normal((N, D, D)) * 0.2,
        "wk": rng.standard_normal((N, D, D)) * 0.2,
        "wv": rng.standard_normal((N, D, D)) * 0.2,
        "wo": rng.standard_normal((N, D, D)) * 0.2,
        "gate": rng.standard_normal((N, D, F)) * 0.2,
        "up": rng.standard_normal((N, D, F)) * 0.2,
        "down": rng.standard_normal((N, F, D)) * 0.2,
        "in_norm": np.abs(rng.standard_normal((N, 1, D))) + 0.5,
        "post_norm": np.abs(rng.standard_normal((N, 1, D))) + 0.5,
        "final_norm": np.abs(rng.standard_normal((1, D))) + 0.5,
    }
    return cfg, p


def test_fused_decode_step_matches_reference(tiny):
    cfg, p = tiny
    N, D, S, H = cfg["n_layers"], cfg["dim"], cfg["seq"], cfg["n_heads"]
    hd = D // H
    rng = np.random.default_rng(1)
    pos = 5
    h0 = rng.standard_normal((1, D)) * 0.5

    # pre-existing cache content for slots < pos
    ck_std = rng.standard_normal((N, S, H, hd)) * 0.3
    cv_std = rng.standard_normal((N, S, H, hd)) * 0.3
    ck_flat = ck_std.reshape(N, S, D).copy()
    cv_flat = cv_std.reshape(N, S, D).copy()

    want = _reference_decode_step(pos, h0, p, ck_std.copy(), cv_std.copy(),
                                  cfg)

    inv = 1.0 / (10000 ** (np.arange(0, hd, 2) / hd))
    cosd = np.tile(np.repeat(np.cos(pos * inv), 2), H)[None, :]
    sind = np.tile(np.repeat(np.sin(pos * inv), 2), H)[None, :]

    f32 = jnp.float32
    args = [jnp.asarray(a, f32) for a in (
        h0, cosd, sind,
        np.asarray(ds.rope_pair_swap_matrix(D)),
        np.asarray(ds.head_mask_matrix(D, H)),
        p["final_norm"], p["wq"], p["wk"], p["wv"], p["wo"],
        p["gate"], p["up"], p["down"], p["in_norm"], p["post_norm"],
        ck_flat, cv_flat)]
    h_out, ck_new, cv_new = ds.fused_decode_step(
        pos, *args, interpret=True, alias=False)

    assert np.allclose(h_out, want, atol=1e-4), \
        np.abs(np.asarray(h_out) - want).max()
    # cache row pos updated, other rows untouched
    assert not np.allclose(np.asarray(ck_new)[:, pos], ck_flat[:, pos])
    mask = np.ones(S, bool)
    mask[pos] = False
    assert np.allclose(np.asarray(ck_new)[:, mask], ck_flat[:, mask])


def test_flash_attention_matches_reference():
    rng = np.random.default_rng(0)
    B, L, H, d = 2, 256, 4, 64
    q = jnp.asarray(rng.standard_normal((B, L, H, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, L, H, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, L, H, d)), jnp.float32)
    mask = jnp.where(
        jnp.arange(L)[:, None] >= jnp.arange(L)[None, :], 0.0, -jnp.inf)
    want = fa.mha_reference(q, k, v, mask)
    got = fa.flash_attention_causal(q, k, v, block_q=128, block_k=128,
                                    interpret=True)
    assert np.allclose(got, want, atol=2e-5), \
        np.abs(np.asarray(got) - np.asarray(want)).max()


def test_flash_attention_fallback_small_seq():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((1, 7, 2, 16)), jnp.float32)
    out = fa.flash_attention_causal(q, q, q)
    assert out.shape == (1, 7, 2, 16)


def test_flash_attention_custom_vjp_matches_reference_grads():
    rng = np.random.default_rng(1)
    B, L, H, d = 1, 256, 2, 32
    q = jnp.asarray(rng.standard_normal((B, L, H, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, L, H, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, L, H, d)), jnp.float32)
    mask = jnp.where(
        jnp.arange(L)[:, None] >= jnp.arange(L)[None, :], 0.0, -jnp.inf)

    def f_flash(q, k, v):
        return fa.flash_attention_causal(q, k, v, None, 128, 128,
                                         True).sum()

    def f_ref(q, k, v):
        return fa.mha_reference(q, k, v, mask).sum()

    g_flash = jax.grad(f_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for gf, gr in zip(g_flash, g_ref):
        assert np.allclose(gf, gr, atol=2e-4), np.abs(gf - gr).max()


def test_flash_attention_fallback_f64_grad_precision():
    """The non-tiling fallback must keep f64 inputs at f64 accumulation
    (regression: hardcoded f32 gave only ~1e-7-accurate grads while the
    primal was f64-exact, defeating strict central-difference checks)."""
    rng = np.random.default_rng(3)
    B, L, H, d = 1, 7, 2, 16  # L=7 never tiles -> fallback path
    q = jnp.asarray(rng.standard_normal((B, L, H, d)), jnp.float64)
    k = jnp.asarray(rng.standard_normal((B, L, H, d)), jnp.float64)
    v = jnp.asarray(rng.standard_normal((B, L, H, d)), jnp.float64)
    mask = jnp.where(
        jnp.arange(L)[:, None] >= jnp.arange(L)[None, :], 0.0, -jnp.inf)

    g_flash = jax.grad(
        lambda *a: fa.flash_attention_causal(*a).sum(), (0, 1, 2))(q, k, v)
    g_ref = jax.grad(
        lambda *a: fa.mha_reference(*a, mask).sum(), (0, 1, 2))(q, k, v)
    for gf, gr in zip(g_flash, g_ref):
        assert gf.dtype == jnp.float64
        assert np.allclose(gf, gr, atol=1e-12), np.abs(gf - gr).max()


def test_sdpa_functional_tape_node():
    import pydynet_tpu as pdn
    import pydynet_tpu.nn.functional as F

    rng = np.random.default_rng(0)
    q = pdn.Tensor(rng.standard_normal((1, 8, 2, 4)), requires_grad=True)
    k = pdn.Tensor(rng.standard_normal((1, 8, 2, 4)), requires_grad=True)
    v = pdn.Tensor(rng.standard_normal((1, 8, 2, 4)), requires_grad=True)
    out = F.scaled_dot_product_attention(q, k, v, causal=True)
    assert out.shape == (1, 8, 2, 4)
    out.sum().backward()
    for t in (q, k, v):
        assert np.isfinite(np.asarray(t.grad)).all()
    # causality through the fallback path
    q2 = q.numpy().copy()
    q2[0, 3] += 5
    with pdn.no_grad():
        o1 = F.scaled_dot_product_attention(q, k, v, causal=True)
        o2 = F.scaled_dot_product_attention(pdn.Tensor(q2), k, v,
                                            causal=True)
    assert np.allclose(o1.numpy()[0, :3], o2.numpy()[0, :3], atol=1e-6)


def test_sdpa_causal_with_mask_stays_causal():
    """Regression: causal=True with an additive mask silently dropped the
    causal constraint (every query could read the future)."""
    import pydynet_tpu as pdn
    import pydynet_tpu.nn.functional as F

    rng = np.random.default_rng(5)
    q, k, v = (pdn.Tensor(rng.standard_normal((1, 8, 2, 4)))
               for _ in range(3))
    zero_mask = pdn.Tensor(np.zeros((8, 8)))
    with pdn.no_grad():
        plain = F.scaled_dot_product_attention(q, k, v, causal=True)
        masked = F.scaled_dot_product_attention(q, k, v, mask=zero_mask,
                                                causal=True)
    assert np.allclose(plain.numpy(), masked.numpy(), atol=1e-5)

    # and the mask itself still applies on top of causality: blocking key 3
    # changes queries 3..7 (which see it causally) but not queries 0..2
    block3 = np.zeros((8, 8))
    block3[:, 3] = -np.inf
    with pdn.no_grad():
        blocked = F.scaled_dot_product_attention(
            q, k, v, mask=pdn.Tensor(block3), causal=True)
    assert np.allclose(blocked.numpy()[0, :3], plain.numpy()[0, :3],
                       atol=1e-5)
    assert not np.allclose(blocked.numpy()[0, 3:], plain.numpy()[0, 3:])


def test_fused_batchnorm_matches_composite():
    from pydynet_tpu.ops import batchnorm as bn

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((32, 128)) * 3 + 1, jnp.float32)
    g = jnp.asarray(rng.standard_normal((1, 128)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((1, 128)), jnp.float32)
    out, mean, var = bn.batch_norm_train(x, g, b, 1e-6, True)
    w_out, w_mean, w_var = bn._bn_composite(x, g, b, 1e-6)
    assert np.allclose(out, w_out, atol=1e-5)
    assert np.allclose(mean, w_mean, atol=1e-6)
    assert np.allclose(var, w_var, atol=1e-5)


def test_fused_batchnorm_grads_match_composite():
    from pydynet_tpu.ops import batchnorm as bn

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((16, 128)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((1, 128)) + 1, jnp.float32)
    b = jnp.asarray(rng.standard_normal((1, 128)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((16, 128)), jnp.float32)

    def f_fused(x, g, b):
        out, _, _ = bn.batch_norm_train(x, g, b, 1e-6, True)
        return jnp.sum(out * w)

    def f_ref(x, g, b):
        out, _, _ = bn._bn_composite(x, g, b, 1e-6)
        return jnp.sum(out * w)

    gf = jax.grad(f_fused, argnums=(0, 1, 2))(x, g, b)
    gr = jax.grad(f_ref, argnums=(0, 1, 2))(x, g, b)
    for a, r in zip(gf, gr):
        assert np.allclose(a, r, atol=1e-4), np.abs(a - r).max()


def test_lm_head_argmax_kernel():
    from pydynet_tpu.ops.decode_step import lm_head_argmax

    rng = np.random.default_rng(0)
    D, V = 32, 256
    h = jnp.asarray(rng.standard_normal((1, D)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((D, V)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((1, V)), jnp.float32)
    got = int(lm_head_argmax(h, w, b, vt=128, interpret=True)[0, 0])
    want = int(np.argmax(np.asarray(h) @ np.asarray(w) + np.asarray(b)))
    assert got == want


@pytest.mark.parametrize("bq,bk", [(64, 128), (128, 64), (64, 256)])
def test_flash_attention_asymmetric_blocks(bq, bk):
    """Regression: the causal K-block bound must be correct for ANY block
    ratio — block_q // block_k is 0 when block_k > block_q, which silently
    dropped most of the context (found on hardware, round 2)."""
    from pydynet_tpu.ops import flash_attention as fa

    rng = np.random.default_rng(3)
    B, L, H, d = 1, 256, 2, 16
    q, k, v = (jnp.asarray(rng.standard_normal((B, L, H, d)), jnp.float32)
               for _ in range(3))
    out = fa.flash_attention_causal(q, k, v, None, bq, bk, True)
    want = fa.mha_reference(q, k, v, fa._causal_mask(L))
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=2e-5)

    # backward too (dq and dkv kernels use the same bounds)
    def loss(q, k, v):
        return jnp.sum(fa.flash_attention_causal(q, k, v, None, bq, bk,
                                                 True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(fa.mha_reference(q, k, v, fa._causal_mask(L)) ** 2)

    g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)


def test_quantize_int8_roundtrip():
    from pydynet_tpu.ops.quant import dequantize_int8, quantize_int8

    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((3, 16, 24)) * 0.3, jnp.float32)
    q, s = quantize_int8(w, axis=1)
    assert q.dtype == jnp.int8 and s.dtype == jnp.float32
    assert q.shape == w.shape and s.shape == (3, 1, 24)
    # per-element error bounded by half a quantization step
    step = np.asarray(s)
    err = np.abs(np.asarray(dequantize_int8(q, s)) - np.asarray(w))
    assert (err <= 0.5 * step + 1e-7).all(), err.max()
    # the factored matmul identity the kernel relies on
    x = rng.standard_normal((1, 16)).astype(np.float32)
    lhs = x @ np.asarray(dequantize_int8(q, s))[0]
    rhs = (x @ np.asarray(q, np.float32)[0]) * step[0]
    np.testing.assert_allclose(lhs, rhs, rtol=1e-6)


def _np_qvec(x):
    """Mirror of the kernel's activation quantization (f32 like the TPU)."""
    x = x.astype(np.float32)
    amax = np.float32(max(np.abs(x).max(), 1e-30))
    xq = np.round(x * (np.float32(127.0) / amax))
    return xq.astype(np.float32), amax / np.float32(127.0)


def _np_qmm(xq, w_i8, s, sx):
    return (xq @ w_i8.astype(np.float32)) * (s.astype(np.float32) * sx)


def _whole_token_reference_q(pos, tok, emb, head_q, head_s, head_b, qp, sp,
                             norms, ck_std, cv_std, cfg):
    """NumPy mirror of the int8 whole-token kernel: embed -> layers with
    int8-quantized matmuls (weights AND per-call activation vectors) ->
    final norm -> int8 head -> argmax."""
    N, H, D, S = cfg["n_layers"], cfg["n_heads"], cfg["dim"], cfg["seq"]
    hd = D // H
    inv = 1.0 / (10000 ** (np.arange(0, hd, 2) / hd))
    cos, sin = np.cos(pos * inv), np.sin(pos * inv)

    def rms(x, w):
        return x / np.sqrt((x * x).mean(-1, keepdims=True) + 1e-6) * w

    h = emb[tok][None, :].astype(np.float32)
    for i in range(N):
        xq, sx = _np_qvec(rms(h, norms["in_norm"][i, 0]))
        q = _np_qmm(xq, qp["wq"][i], sp["wq"][i, 0], sx)
        k = _np_qmm(xq, qp["wk"][i], sp["wk"][i, 0], sx)
        v = _np_qmm(xq, qp["wv"][i], sp["wv"][i, 0], sx)
        qh = _rope_interleaved(q.reshape(1, H, hd), cos, sin)
        kh = _rope_interleaved(k.reshape(1, H, hd), cos, sin)
        ck_std[i, pos] = kh[0]
        cv_std[i, pos] = v.reshape(H, hd)
        out = np.zeros((H, hd))
        for hh in range(H):
            s = ck_std[i, :pos + 1, hh] @ qh[0, hh] / math.sqrt(hd)
            p = np.exp(s - s.max())
            p /= p.sum()
            out[hh] = p @ cv_std[i, :pos + 1, hh]
        aq, asx = _np_qvec(out.reshape(1, D))
        z = h + _np_qmm(aq, qp["wo"][i], sp["wo"][i, 0], asx)
        zq, zsx = _np_qvec(rms(z, norms["post_norm"][i, 0]))
        g = _np_qmm(zq, qp["gate"][i], sp["gate"][i, 0], zsx)
        u = _np_qmm(zq, qp["up"][i], sp["up"][i, 0], zsx)
        ff = (g / (1 + np.exp(-g))) * u
        fq, fsx = _np_qvec(ff)
        h = z + _np_qmm(fq, qp["down"][i], sp["down"][i, 0], fsx)
    hq, hsx = _np_qvec(rms(h, norms["final_norm"][0]))
    logits = _np_qmm(hq, head_q, head_s, hsx) + head_b
    return int(np.argmax(logits)), logits, ck_std, cv_std


def test_fused_decode_token_int8_matches_quantized_reference():
    """The int8 whole-token kernel (int8 x int8 MXU dots, per-call activation
    quant) must match a NumPy mirror of the same quantized math."""
    from pydynet_tpu.ops.quant import quantize_int8

    rng = np.random.default_rng(7)
    cfg = dict(n_layers=2, n_heads=2, dim=16, seq=32, ffn=24)
    N, D, F, S, H = (cfg["n_layers"], cfg["dim"], cfg["ffn"], cfg["seq"],
                     cfg["n_heads"])
    V, vt, sb = 256, 128, 16
    hd = D // H

    raw = {
        "wq": rng.standard_normal((N, D, D)) * 0.2,
        "wk": rng.standard_normal((N, D, D)) * 0.2,
        "wv": rng.standard_normal((N, D, D)) * 0.2,
        "wo": rng.standard_normal((N, D, D)) * 0.2,
        "gate": rng.standard_normal((N, D, F)) * 0.2,
        "up": rng.standard_normal((N, D, F)) * 0.2,
        "down": rng.standard_normal((N, F, D)) * 0.2,
    }
    norms = {
        "in_norm": np.abs(rng.standard_normal((N, 1, D))) + 0.5,
        "post_norm": np.abs(rng.standard_normal((N, 1, D))) + 0.5,
        "final_norm": np.abs(rng.standard_normal((1, D))) + 0.5,
    }
    emb = rng.standard_normal((V, D)).astype(np.float32)
    head_w = (rng.standard_normal((D, V)) * 0.3).astype(np.float32)
    head_b = np.zeros((1, V), np.float32)

    qw = {k: quantize_int8(jnp.asarray(v, jnp.float32), axis=1)
          for k, v in raw.items()}
    s_attn = jnp.concatenate(
        [qw["wq"][1], qw["wk"][1], qw["wv"][1], qw["wo"][1], qw["down"][1],
         jnp.zeros((N, 3, D), jnp.float32)], axis=1)
    s_ffn = jnp.concatenate(
        [qw["gate"][1], qw["up"][1], jnp.zeros((N, 6, F), jnp.float32)],
        axis=1)
    head_q, head_s = quantize_int8(jnp.asarray(head_w), axis=0)

    qp = {k: np.asarray(qw[k][0]) for k in raw}
    sp = {k: np.asarray(qw[k][1]) for k in raw}

    Dp = ds.lane_pad_dim(D)
    inv = 1.0 / (10000 ** (np.arange(0, hd, 2) / hd))
    t = np.arange(S)[:, None]
    cosr = np.tile(np.repeat(np.cos(t * inv), 2, -1), (1, H))
    sinr = np.tile(np.repeat(np.sin(t * inv), 2, -1), (1, H))

    f32 = jnp.float32
    consts = dict(
        emb=jnp.asarray(emb, f32), cosr=jnp.asarray(cosr, f32),
        sinr=jnp.asarray(sinr, f32),
        rot=jnp.asarray(ds.rope_pair_swap_matrix(D), f32),
        hmask=jnp.pad(ds.head_mask_matrix(D, H).astype(f32),
                      ((0, Dp - D), (0, 0))),
        final_norm=jnp.asarray(norms["final_norm"], f32),
        in_norm=jnp.asarray(norms["in_norm"], f32),
        post_norm=jnp.asarray(norms["post_norm"], f32),
        head_b=jnp.asarray(head_b, f32))

    ck = jnp.zeros((N, S, Dp), f32)
    cv = jnp.zeros((N, S, Dp), f32)
    ck_std = np.zeros((N, S, H, hd))
    cv_std = np.zeros((N, S, H, hd))

    toks = [5, 190, 11, 42]
    for i, tok in enumerate(toks):
        nxt, ck, cv = ds.fused_decode_token(
            i, jnp.asarray([tok], jnp.int32), consts["emb"], consts["cosr"],
            consts["sinr"], consts["rot"], consts["hmask"],
            consts["final_norm"], qw["wq"][0], qw["wk"][0], qw["wv"][0],
            qw["wo"][0], qw["gate"][0], qw["up"][0], qw["down"][0],
            consts["in_norm"], consts["post_norm"], head_q, consts["head_b"],
            ck, cv, vt=vt, sb=sb, interpret=True,
            s_attn=s_attn, s_ffn=s_ffn, head_s=head_s)
        want, _, ck_std, cv_std = _whole_token_reference_q(
            i, tok, emb, np.asarray(head_q), np.asarray(head_s)[0], head_b,
            qp, sp, norms, ck_std, cv_std, cfg)
        assert int(nxt[0]) == want, (i, int(nxt[0]), want)
        # caches agree up to one activation-quant ulp (f32-vs-f64 rounding)
        np.testing.assert_allclose(np.asarray(ck)[:, :i + 1, :D],
                                   ck_std[:, :i + 1].reshape(N, i + 1, D),
                                   atol=2e-2)


def test_fused_decode_token_batched_int8_matches_quantized_reference():
    """The weight-int8 BATCHED kernel == B independent runs of the B=1
    int8 NumPy mirror: per-ROW activation quantization makes each sample's
    math identical to the B=1 path (same multiplicative qvec form)."""
    from pydynet_tpu.ops.quant import quantize_int8

    rng = np.random.default_rng(13)
    cfg = dict(n_layers=2, n_heads=2, dim=16, seq=32, ffn=24)
    N, D, F, S, H = (cfg["n_layers"], cfg["dim"], cfg["ffn"], cfg["seq"],
                     cfg["n_heads"])
    B, V, vt, sb = 3, 256, 128, 16
    hd = D // H

    raw = {
        "wq": rng.standard_normal((N, D, D)) * 0.2,
        "wk": rng.standard_normal((N, D, D)) * 0.2,
        "wv": rng.standard_normal((N, D, D)) * 0.2,
        "wo": rng.standard_normal((N, D, D)) * 0.2,
        "gate": rng.standard_normal((N, D, F)) * 0.2,
        "up": rng.standard_normal((N, D, F)) * 0.2,
        "down": rng.standard_normal((N, F, D)) * 0.2,
    }
    norms = {
        "in_norm": np.abs(rng.standard_normal((N, 1, D))) + 0.5,
        "post_norm": np.abs(rng.standard_normal((N, 1, D))) + 0.5,
        "final_norm": np.abs(rng.standard_normal((1, D))) + 0.5,
    }
    emb = rng.standard_normal((V, D)).astype(np.float32)
    head_w = (rng.standard_normal((D, V)) * 0.3).astype(np.float32)
    head_b = np.zeros((1, V), np.float32)

    qw = {k: quantize_int8(jnp.asarray(v, jnp.float32), axis=1)
          for k, v in raw.items()}
    s_attn = jnp.concatenate(
        [qw["wq"][1], qw["wk"][1], qw["wv"][1], qw["wo"][1], qw["down"][1],
         jnp.zeros((N, 3, D), jnp.float32)], axis=1)
    s_ffn = jnp.concatenate(
        [qw["gate"][1], qw["up"][1], jnp.zeros((N, 6, F), jnp.float32)],
        axis=1)
    head_q, head_s = quantize_int8(jnp.asarray(head_w), axis=0)

    qp = {k: np.asarray(qw[k][0]) for k in raw}
    sp = {k: np.asarray(qw[k][1]) for k in raw}

    Dp = ds.lane_pad_dim(D)
    inv = 1.0 / (10000 ** (np.arange(0, hd, 2) / hd))
    t = np.arange(S)[:, None]
    cosr = np.tile(np.repeat(np.cos(t * inv), 2, -1), (1, H))
    sinr = np.tile(np.repeat(np.sin(t * inv), 2, -1), (1, H))

    f32 = jnp.float32
    consts = dict(
        cosr=jnp.asarray(cosr, f32), sinr=jnp.asarray(sinr, f32),
        rot=jnp.asarray(ds.rope_pair_swap_matrix(D), f32),
        hmask=jnp.pad(ds.head_mask_matrix(D, H).astype(f32),
                      ((0, Dp - D), (0, 0))),
        final_norm=jnp.asarray(norms["final_norm"], f32),
        in_norm=jnp.asarray(norms["in_norm"], f32),
        post_norm=jnp.asarray(norms["post_norm"], f32),
        head_b=jnp.asarray(head_b, f32))

    ck = jnp.zeros((N, B, S, Dp), f32)
    cv = jnp.zeros((N, B, S, Dp), f32)
    ck_std = np.zeros((B, N, S, H, hd))
    cv_std = np.zeros((B, N, S, H, hd))

    toks = np.array([[5, 190, 11, 42],
                     [7, 3, 250, 99],
                     [101, 55, 21, 8]]).T  # (steps, B)
    for i in range(toks.shape[0]):
        h0 = jnp.asarray(emb[toks[i]], f32)
        nxt, ck, cv = ds.fused_decode_token_batched(
            i, h0, consts["cosr"], consts["sinr"], consts["rot"],
            consts["hmask"], consts["final_norm"], qw["wq"][0], qw["wk"][0],
            qw["wv"][0], qw["wo"][0], qw["gate"][0], qw["up"][0],
            qw["down"][0], consts["in_norm"], consts["post_norm"], head_q,
            consts["head_b"], ck, cv, vt=vt, sb=sb, interpret=True,
            s_attn=s_attn, s_ffn=s_ffn, head_s=head_s)
        for b in range(B):
            want, _, ck_std[b], cv_std[b] = _whole_token_reference_q(
                i, toks[i, b], emb, np.asarray(head_q),
                np.asarray(head_s)[0], head_b, qp, sp, norms,
                ck_std[b], cv_std[b], cfg)
            assert int(nxt[b]) == want, (i, b, int(nxt[b]), want)
        np.testing.assert_allclose(
            np.asarray(ck)[:, :, :i + 1, :D],
            ck_std.transpose(1, 0, 2, 3, 4)[:, :, :i + 1].reshape(
                N, B, i + 1, D),
            atol=2e-2)


def test_fused_decode_token_clamps_pos_at_cache_end(tiny):
    """Regression: ``model.generate`` dispatches fixed-size decode chunks
    and discards surplus tokens on the host, so the kernel can legally be
    invoked with pos >= S.  It must clamp to S-1 (identical result, DMAs in
    bounds) instead of issuing an out-of-bounds pl.ds(apos, 16) cache RMW."""
    cfg, p = tiny
    N, D, F, S, H = (cfg["n_layers"], cfg["dim"], cfg["ffn"], cfg["seq"],
                     cfg["n_heads"])
    V, vt, sb = 256, 128, 16
    hd = D // H
    rng = np.random.default_rng(23)
    Dp = ds.lane_pad_dim(D)

    inv = 1.0 / (10000 ** (np.arange(0, hd, 2) / hd))
    t = np.arange(S)[:, None]
    cosr = np.tile(np.repeat(np.cos(t * inv), 2, -1), (1, H))
    sinr = np.tile(np.repeat(np.sin(t * inv), 2, -1), (1, H))
    f32 = jnp.float32
    emb = jnp.asarray(rng.standard_normal((V, D)), f32)
    head_w = jnp.asarray(rng.standard_normal((D, V)) * 0.3, f32)
    head_b = jnp.zeros((1, V), f32)
    w = {k: jnp.asarray(v, f32) for k, v in p.items()}
    consts = (emb, jnp.asarray(cosr, f32), jnp.asarray(sinr, f32),
              jnp.asarray(ds.rope_pair_swap_matrix(D), f32),
              jnp.pad(ds.head_mask_matrix(D, H).astype(np.float32),
                      ((0, Dp - D), (0, 0))),
              w["final_norm"], w["wq"], w["wk"], w["wv"], w["wo"],
              w["gate"], w["up"], w["down"], w["in_norm"], w["post_norm"],
              head_w, head_b)
    ck0 = jnp.asarray(
        np.pad(rng.standard_normal((N, S, D)) * 0.3, ((0, 0), (0, 0),
                                                      (0, Dp - D))), f32)
    cv0 = jnp.asarray(
        np.pad(rng.standard_normal((N, S, D)) * 0.3, ((0, 0), (0, 0),
                                                      (0, Dp - D))), f32)
    tok = jnp.asarray([7], jnp.int32)

    n1, ck1, cv1 = ds.fused_decode_token(S - 1, tok, *consts, ck0, cv0,
                                         vt=vt, sb=sb, interpret=True)
    for pos in (S, S + 5):
        n2, ck2, cv2 = ds.fused_decode_token(pos, tok, *consts, ck0, cv0,
                                             vt=vt, sb=sb, interpret=True)
        assert int(n2[0]) == int(n1[0]), (pos, int(n2[0]), int(n1[0]))
        np.testing.assert_array_equal(np.asarray(ck2), np.asarray(ck1))
        np.testing.assert_array_equal(np.asarray(cv2), np.asarray(cv1))


def test_fused_decode_token_batched_matches_reference():
    """The batched whole-token kernel == B independent runs of the NumPy
    per-token reference (shared weight stream, per-row caches/argmax)."""
    rng = np.random.default_rng(11)
    cfg = dict(n_layers=2, n_heads=2, dim=16, seq=32, ffn=24)
    N, D, F, S, H = (cfg["n_layers"], cfg["dim"], cfg["ffn"], cfg["seq"],
                     cfg["n_heads"])
    B, V, vt, sb = 3, 256, 128, 16
    hd = D // H

    p = {
        "wq": rng.standard_normal((N, D, D)) * 0.2,
        "wk": rng.standard_normal((N, D, D)) * 0.2,
        "wv": rng.standard_normal((N, D, D)) * 0.2,
        "wo": rng.standard_normal((N, D, D)) * 0.2,
        "gate": rng.standard_normal((N, D, F)) * 0.2,
        "up": rng.standard_normal((N, D, F)) * 0.2,
        "down": rng.standard_normal((N, F, D)) * 0.2,
        "in_norm": np.abs(rng.standard_normal((N, 1, D))) + 0.5,
        "post_norm": np.abs(rng.standard_normal((N, 1, D))) + 0.5,
        "final_norm": np.abs(rng.standard_normal((1, D))) + 0.5,
    }
    emb = rng.standard_normal((V, D)).astype(np.float32)
    head_w = (rng.standard_normal((D, V)) * 0.3).astype(np.float32)
    head_b = np.zeros((1, V), np.float32)

    Dp = ds.lane_pad_dim(D)
    inv = 1.0 / (10000 ** (np.arange(0, hd, 2) / hd))
    t = np.arange(S)[:, None]
    cosr = np.tile(np.repeat(np.cos(t * inv), 2, -1), (1, H))
    sinr = np.tile(np.repeat(np.sin(t * inv), 2, -1), (1, H))

    f32 = jnp.float32
    args = dict(
        cosr=jnp.asarray(cosr, f32), sinr=jnp.asarray(sinr, f32),
        rot=jnp.asarray(ds.rope_pair_swap_matrix(D), f32),
        hmask=jnp.pad(ds.head_mask_matrix(D, H).astype(f32),
                      ((0, Dp - D), (0, 0))),
        final_norm=jnp.asarray(p["final_norm"], f32),
        wq=jnp.asarray(p["wq"], f32), wk=jnp.asarray(p["wk"], f32),
        wv=jnp.asarray(p["wv"], f32), wo=jnp.asarray(p["wo"], f32),
        gate=jnp.asarray(p["gate"], f32), up=jnp.asarray(p["up"], f32),
        down=jnp.asarray(p["down"], f32),
        in_norm=jnp.asarray(p["in_norm"], f32),
        post_norm=jnp.asarray(p["post_norm"], f32),
        head_w=jnp.asarray(head_w, f32), head_b=jnp.asarray(head_b, f32))

    ck = jnp.zeros((N, B, S, Dp), f32)
    cv = jnp.zeros((N, B, S, Dp), f32)
    # per-sample standard-layout caches for the reference
    ck_std = np.zeros((B, N, S, H, hd))
    cv_std = np.zeros((B, N, S, H, hd))

    toks = np.array([[5, 190, 11, 42],
                     [7, 3, 250, 99],
                     [101, 55, 21, 8]]).T  # (steps, B)
    for i in range(toks.shape[0]):
        h0 = jnp.asarray(emb[toks[i]], f32)  # (B, D) gather outside
        nxt, ck, cv = ds.fused_decode_token_batched(
            i, h0, args["cosr"], args["sinr"], args["rot"], args["hmask"],
            args["final_norm"], args["wq"], args["wk"], args["wv"],
            args["wo"], args["gate"], args["up"], args["down"],
            args["in_norm"], args["post_norm"], args["head_w"],
            args["head_b"], ck, cv, vt=vt, sb=sb, interpret=True)
        for b in range(B):
            h = _reference_decode_step(i, emb[toks[i, b]][None, :], p,
                                       ck_std[b], cv_std[b], cfg)
            want = int(np.argmax(h @ head_w + head_b))
            assert int(nxt[b]) == want, (i, b, int(nxt[b]), want)
        np.testing.assert_allclose(
            np.asarray(ck)[:, :, :i + 1, :D],
            ck_std.transpose(1, 0, 2, 3, 4)[:, :, :i + 1].reshape(
                N, B, i + 1, D),
            atol=1e-4)


def _reference_decode_step_kvq(pos, h0, params, kq_std, ks_std, vq_std,
                               vs_std, cfg):
    """NumPy mirror of the kv_int8 batched-kernel math for ONE sample:
    int8 caches with per-row symmetric scales, per-sample query
    quantization for cache-row scores, exact f32 queries (against the
    dequantized self row) for the current position."""
    N, H, D = cfg["n_layers"], cfg["n_heads"], cfg["dim"]
    hd = D // H
    inv = 1.0 / (10000 ** (np.arange(0, hd, 2) / hd))
    cos = np.cos(pos * inv)
    sin = np.sin(pos * inv)

    def rms(x, w):
        return x / np.sqrt((x * x).mean(-1, keepdims=True) + 1e-6) * w

    def quant_row(x):
        s = max(np.abs(x).max() / 127.0, 1e-10)
        return np.clip(np.round(x / s), -127, 127), s

    h = h0.copy()
    for i in range(N):
        hn = rms(h, params["in_norm"][i, 0])
        q = hn @ params["wq"][i]
        k = hn @ params["wk"][i]
        v = hn @ params["wv"][i]
        qh = _rope_interleaved(q.reshape(1, H, hd), cos, sin).reshape(D)
        kh = _rope_interleaved(k.reshape(1, H, hd), cos, sin).reshape(D)
        kq, ks = quant_row(kh)
        vq, vs = quant_row(v[0])
        kq_std[i, pos], ks_std[i, pos] = kq, ks
        vq_std[i, pos], vs_std[i, pos] = vq, vs
        qq, qs = quant_row(qh)

        out = np.zeros((H, hd))
        for hh in range(H):
            sl = slice(hh * hd, (hh + 1) * hd)
            # cache rows < pos: int dot x (k-row scale x q scale)
            s_cache = (kq_std[i, :pos, sl] @ qq[sl]) \
                * ks_std[i, :pos] * qs / math.sqrt(hd)
            # self row: dequantized k/v against the EXACT f32 query
            s_self = (kq[sl] * ks) @ qh[sl] / math.sqrt(hd)
            s = np.concatenate([s_cache, [s_self]])
            p = np.exp(s - s.max())
            p /= p.sum()
            vdeq = np.concatenate(
                [vq_std[i, :pos, sl] * vs_std[i, :pos, None],
                 (vq[sl] * vs)[None]])
            out[hh] = p @ vdeq
        z = h + out.reshape(1, D) @ params["wo"][i]
        zn = rms(z, params["post_norm"][i, 0])
        g = zn @ params["gate"][i]
        u = zn @ params["up"][i]
        h = z + ((g / (1 + np.exp(-g))) * u) @ params["down"][i]
    return rms(h, params["final_norm"][0])


def test_fused_decode_token_batched_kv_int8_matches_reference():
    """The kv_int8 batched kernel == B independent NumPy runs of the same
    quantized math (int8 rows + per-row scales, per-sample query quant)."""
    rng = np.random.default_rng(13)
    cfg = dict(n_layers=2, n_heads=2, dim=16, seq=32, ffn=24)
    N, D, F, S, H = (cfg["n_layers"], cfg["dim"], cfg["ffn"], cfg["seq"],
                     cfg["n_heads"])
    B, V, vt, sb = 3, 256, 128, 16
    hd = D // H

    p = {
        "wq": rng.standard_normal((N, D, D)) * 0.2,
        "wk": rng.standard_normal((N, D, D)) * 0.2,
        "wv": rng.standard_normal((N, D, D)) * 0.2,
        "wo": rng.standard_normal((N, D, D)) * 0.2,
        "gate": rng.standard_normal((N, D, F)) * 0.2,
        "up": rng.standard_normal((N, D, F)) * 0.2,
        "down": rng.standard_normal((N, F, D)) * 0.2,
        "in_norm": np.abs(rng.standard_normal((N, 1, D))) + 0.5,
        "post_norm": np.abs(rng.standard_normal((N, 1, D))) + 0.5,
        "final_norm": np.abs(rng.standard_normal((1, D))) + 0.5,
    }
    emb = rng.standard_normal((V, D)).astype(np.float32)
    head_w = (rng.standard_normal((D, V)) * 0.3).astype(np.float32)
    head_b = np.zeros((1, V), np.float32)

    Dp = ds.lane_pad_dim(D)
    inv = 1.0 / (10000 ** (np.arange(0, hd, 2) / hd))
    t = np.arange(S)[:, None]
    cosr = np.tile(np.repeat(np.cos(t * inv), 2, -1), (1, H))
    sinr = np.tile(np.repeat(np.sin(t * inv), 2, -1), (1, H))

    f32 = jnp.float32
    args = dict(
        cosr=jnp.asarray(cosr, f32), sinr=jnp.asarray(sinr, f32),
        rot=jnp.asarray(ds.rope_pair_swap_matrix(D), f32),
        hmask=jnp.pad(ds.head_mask_matrix(D, H).astype(f32),
                      ((0, Dp - D), (0, 0))),
        final_norm=jnp.asarray(p["final_norm"], f32),
        wq=jnp.asarray(p["wq"], f32), wk=jnp.asarray(p["wk"], f32),
        wv=jnp.asarray(p["wv"], f32), wo=jnp.asarray(p["wo"], f32),
        gate=jnp.asarray(p["gate"], f32), up=jnp.asarray(p["up"], f32),
        down=jnp.asarray(p["down"], f32),
        in_norm=jnp.asarray(p["in_norm"], f32),
        post_norm=jnp.asarray(p["post_norm"], f32),
        head_w=jnp.asarray(head_w, f32), head_b=jnp.asarray(head_b, f32))

    ck = jnp.zeros((N, B, S, Dp), jnp.int8)
    cv = jnp.zeros((N, B, S, Dp), jnp.int8)
    sk = jnp.full((N, B, S), 1e-10, f32)
    sv = jnp.full((N, B, S), 1e-10, f32)
    # per-sample reference caches (int rows in the REAL D width + scales)
    kq_std = np.zeros((B, N, S, D))
    ks_std = np.full((B, N, S), 1e-10)
    vq_std = np.zeros((B, N, S, D))
    vs_std = np.full((B, N, S), 1e-10)

    toks = np.array([[5, 190, 11, 42],
                     [7, 3, 250, 99],
                     [101, 55, 21, 8]]).T  # (steps, B)
    for i in range(toks.shape[0]):
        h0 = jnp.asarray(emb[toks[i]], f32)  # (B, D) gather outside
        nxt, ck, cv, sk, sv = ds.fused_decode_token_batched(
            i, h0, args["cosr"], args["sinr"], args["rot"], args["hmask"],
            args["final_norm"], args["wq"], args["wk"], args["wv"],
            args["wo"], args["gate"], args["up"], args["down"],
            args["in_norm"], args["post_norm"], args["head_w"],
            args["head_b"], ck, cv, vt=vt, sb=sb, interpret=True,
            sk=sk, sv=sv)
        for b in range(B):
            h = _reference_decode_step_kvq(
                i, emb[toks[i, b]][None, :], p, kq_std[b], ks_std[b],
                vq_std[b], vs_std[b], cfg)
            want = int(np.argmax(h @ head_w + head_b))
            assert int(nxt[b]) == want, (i, b, int(nxt[b]), want)
        # int8 rows must match the reference EXACTLY (same quantized math)
        np.testing.assert_array_equal(
            np.asarray(ck)[:, :, :i + 1, :D],
            kq_std.transpose(1, 0, 2, 3)[:, :, :i + 1])
        np.testing.assert_allclose(
            np.asarray(sk)[:, :, :i + 1],
            ks_std.transpose(1, 0, 2)[:, :, :i + 1], rtol=1e-5)


def test_flash_attention_pick_blocks():
    from pydynet_tpu.ops.flash_attention import pick_blocks

    bq, bk = pick_blocks(8192, 64)
    assert 8192 % bq == 0 and 8192 % bk == 0
    # double-buffered window must stay under the ~4MB budget
    assert 4 * bk * 128 * 4 <= 4 * 1024 * 1024
    bq, bk = pick_blocks(384, 64)
    assert 384 % bq == 0 and 384 % bk == 0


def test_fused_decode_token_batched_grouped_scores_match():
    """Group-blocked score matmuls (sg < B) must reproduce the single
    un-unrolled matmul exactly: same dot products over the same cw
    reduction axis, only batched into (sg*sb, cw) x (cw, sg*H) pieces.
    Runs the emit_logits head so the full (B, V) output is compared."""
    rng = np.random.default_rng(17)
    N, D, F, S, H = 2, 16, 24, 32, 2
    B, V, vt, sb = 4, 256, 128, 16
    hd = D // H

    f32 = jnp.float32
    p = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.2, f32)
    Dp = ds.lane_pad_dim(D)
    inv = 1.0 / (10000 ** (np.arange(0, hd, 2) / hd))
    t = np.arange(S)[:, None]
    cosr = jnp.asarray(np.tile(np.repeat(np.cos(t * inv), 2, -1), (1, H)),
                       f32)
    sinr = jnp.asarray(np.tile(np.repeat(np.sin(t * inv), 2, -1), (1, H)),
                       f32)
    args = (cosr, sinr, jnp.asarray(ds.rope_pair_swap_matrix(D), f32),
            jnp.pad(ds.head_mask_matrix(D, H).astype(f32),
                    ((0, Dp - D), (0, 0))),
            jnp.asarray(np.abs(rng.standard_normal((1, D))) + 0.5, f32),
            p(N, D, D), p(N, D, D), p(N, D, D), p(N, D, D),
            p(N, D, F), p(N, D, F), p(N, F, D),
            jnp.asarray(np.abs(rng.standard_normal((N, 1, D))) + 0.5, f32),
            jnp.asarray(np.abs(rng.standard_normal((N, 1, D))) + 0.5, f32),
            p(D, V), jnp.zeros((1, V), f32))

    outs = {}
    for sg in (None, 2, 1):  # None -> default pick_sg (=B here)
        ck = jnp.zeros((N, B, S, Dp), f32)
        cv = jnp.zeros((N, B, S, Dp), f32)
        logits = []
        for i, tok_row in enumerate(([5, 9, 1, 3], [2, 8, 250, 40])):
            h0 = p(B, D) * 0 + jnp.asarray(
                rng.standard_normal((B, D)) if False else
                np.eye(max(B, D))[:B, :D], f32) + i  # deterministic h0
            lg, ck, cv = ds.fused_decode_token_batched(
                i, h0, *args, ck, cv, vt=vt, sb=sb, interpret=True,
                emit_logits=True, sg=sg)
            logits.append(np.asarray(lg))
        outs[sg] = (np.stack(logits), np.asarray(ck), np.asarray(cv))

    for sg in (2, 1):
        np.testing.assert_allclose(outs[sg][0], outs[None][0],
                                   rtol=0, atol=1e-5)
        np.testing.assert_array_equal(outs[sg][1], outs[None][1])
        np.testing.assert_array_equal(outs[sg][2], outs[None][2])


def test_pick_sg_and_batched_sb():
    from pydynet_tpu.ops.decode_step import batched_sb, pick_sg

    # largest divisor of B with sg*H <= one 128-lane tile
    assert pick_sg(64, 6) == 16
    assert pick_sg(32, 6) == 16
    assert pick_sg(4, 6) == 4     # small B: unchanged single matmul
    assert pick_sg(64, 2) == 64
    assert pick_sg(8, 200) == 1   # huge H: per-sample dots
    for B, H in ((64, 6), (48, 12), (7, 3)):
        sg = pick_sg(B, H)
        assert B % sg == 0 and (sg == 1 or sg * H <= 128)

    # B<=32 bf16 keeps the round-2 sb=256; B=64 shrinks into budget
    assert batched_sb(1024, 32, 320, 2) == 256
    assert batched_sb(1024, 64, 320, 2) == 128
    assert batched_sb(1024, 64, 320, 1) == 256      # int8 halves bytes
    assert batched_sb(1024, 128, 320, 2) == 64
    assert batched_sb(1024, 64, 320, 1, multiple=128) == 256
    assert batched_sb(256, 64, 320, 2, multiple=128) == 128
    assert batched_sb(96, 8, 320, 2) == 96          # divisibility kept
    # the budget actually binds: stream buffers stay under ~24 MB
    for B, cw, item in ((64, 320, 2), (128, 320, 2), (64, 896, 2)):
        sbv = batched_sb(1024, B, cw, item)
        assert sbv and 4 * B * sbv * cw * item <= 24 * 1024 * 1024


def test_fused_decode_token_int4_matches_quantized_reference():
    """The int4 whole-token kernel (packed (K/2, N) int8 blocks, split
    lo/hi MXU dots — see ops.quant.quantize_int4) must match a NumPy
    mirror running the SAME int4-valued quantized math: the unpacked
    int values and shared per-channel scales make the mirror identical
    to the int8 mirror with int4 inputs."""
    from pydynet_tpu.ops.quant import quantize_int4, unpack_int4

    rng = np.random.default_rng(17)
    cfg = dict(n_layers=2, n_heads=2, dim=16, seq=32, ffn=24)
    N, D, F, S, H = (cfg["n_layers"], cfg["dim"], cfg["ffn"], cfg["seq"],
                     cfg["n_heads"])
    V, vt, sb = 256, 128, 16
    hd = D // H

    raw = {
        "wq": rng.standard_normal((N, D, D)) * 0.2,
        "wk": rng.standard_normal((N, D, D)) * 0.2,
        "wv": rng.standard_normal((N, D, D)) * 0.2,
        "wo": rng.standard_normal((N, D, D)) * 0.2,
        "gate": rng.standard_normal((N, D, F)) * 0.2,
        "up": rng.standard_normal((N, D, F)) * 0.2,
        "down": rng.standard_normal((N, F, D)) * 0.2,
    }
    norms = {
        "in_norm": np.abs(rng.standard_normal((N, 1, D))) + 0.5,
        "post_norm": np.abs(rng.standard_normal((N, 1, D))) + 0.5,
        "final_norm": np.abs(rng.standard_normal((1, D))) + 0.5,
    }
    emb = rng.standard_normal((V, D)).astype(np.float32)
    head_w = (rng.standard_normal((D, V)) * 0.3).astype(np.float32)
    head_b = np.zeros((1, V), np.float32)

    qw = {k: quantize_int4(jnp.asarray(v, jnp.float32), axis=1)
          for k, v in raw.items()}
    s_attn = jnp.concatenate(
        [qw["wq"][1], qw["wk"][1], qw["wv"][1], qw["wo"][1], qw["down"][1],
         jnp.zeros((N, 3, D), jnp.float32)], axis=1)
    s_ffn = jnp.concatenate(
        [qw["gate"][1], qw["up"][1], jnp.zeros((N, 6, F), jnp.float32)],
        axis=1)
    head_q, head_s = quantize_int4(jnp.asarray(head_w), axis=0)

    def unpack_full(pk):  # (.., K/2, M) packed -> (.., K, M) int values
        lo, hi = unpack_int4(pk)
        return np.concatenate([np.asarray(lo), np.asarray(hi)], axis=-2)

    qp = {k: unpack_full(qw[k][0]) for k in raw}
    sp = {k: np.asarray(qw[k][1]) for k in raw}

    Dp = ds.lane_pad_dim(D)
    inv = 1.0 / (10000 ** (np.arange(0, hd, 2) / hd))
    t = np.arange(S)[:, None]
    cosr = np.tile(np.repeat(np.cos(t * inv), 2, -1), (1, H))
    sinr = np.tile(np.repeat(np.sin(t * inv), 2, -1), (1, H))

    f32 = jnp.float32
    consts = dict(
        emb=jnp.asarray(emb, f32), cosr=jnp.asarray(cosr, f32),
        sinr=jnp.asarray(sinr, f32),
        rot=jnp.asarray(ds.rope_pair_swap_matrix(D), f32),
        hmask=jnp.pad(ds.head_mask_matrix(D, H).astype(f32),
                      ((0, Dp - D), (0, 0))),
        final_norm=jnp.asarray(norms["final_norm"], f32),
        in_norm=jnp.asarray(norms["in_norm"], f32),
        post_norm=jnp.asarray(norms["post_norm"], f32),
        head_b=jnp.asarray(head_b, f32))

    ck = jnp.zeros((N, S, Dp), f32)
    cv = jnp.zeros((N, S, Dp), f32)
    ck_std = np.zeros((N, S, H, hd))
    cv_std = np.zeros((N, S, H, hd))

    toks = [5, 190, 11, 42]
    for i, tok in enumerate(toks):
        nxt, ck, cv = ds.fused_decode_token(
            i, jnp.asarray([tok], jnp.int32), consts["emb"], consts["cosr"],
            consts["sinr"], consts["rot"], consts["hmask"],
            consts["final_norm"], qw["wq"][0], qw["wk"][0], qw["wv"][0],
            qw["wo"][0], qw["gate"][0], qw["up"][0], qw["down"][0],
            consts["in_norm"], consts["post_norm"], head_q, consts["head_b"],
            ck, cv, vt=vt, sb=sb, interpret=True,
            s_attn=s_attn, s_ffn=s_ffn, head_s=head_s, q4=True)
        want, _, ck_std, cv_std = _whole_token_reference_q(
            i, tok, emb, unpack_full(head_q), np.asarray(head_s)[0], head_b,
            qp, sp, norms, ck_std, cv_std, cfg)
        assert int(nxt[0]) == want, (i, int(nxt[0]), want)
        np.testing.assert_allclose(np.asarray(ck)[:, :i + 1, :D],
                                   ck_std[:, :i + 1].reshape(N, i + 1, D),
                                   atol=2e-2)


def test_fused_decode_token_batched_int4_matches_quantized_reference():
    """The packed-int4 BATCHED kernel == B independent runs of the int4
    NumPy mirror (per-row activation quantization + unpacked int4 weight
    values with shared per-channel scales)."""
    from pydynet_tpu.ops.quant import quantize_int4, unpack_int4

    rng = np.random.default_rng(19)
    cfg = dict(n_layers=2, n_heads=2, dim=16, seq=32, ffn=24)
    N, D, F, S, H = (cfg["n_layers"], cfg["dim"], cfg["ffn"], cfg["seq"],
                     cfg["n_heads"])
    B, V, vt, sb = 3, 256, 128, 16
    hd = D // H

    raw = {
        "wq": rng.standard_normal((N, D, D)) * 0.2,
        "wk": rng.standard_normal((N, D, D)) * 0.2,
        "wv": rng.standard_normal((N, D, D)) * 0.2,
        "wo": rng.standard_normal((N, D, D)) * 0.2,
        "gate": rng.standard_normal((N, D, F)) * 0.2,
        "up": rng.standard_normal((N, D, F)) * 0.2,
        "down": rng.standard_normal((N, F, D)) * 0.2,
    }
    norms = {
        "in_norm": np.abs(rng.standard_normal((N, 1, D))) + 0.5,
        "post_norm": np.abs(rng.standard_normal((N, 1, D))) + 0.5,
        "final_norm": np.abs(rng.standard_normal((1, D))) + 0.5,
    }
    emb = rng.standard_normal((V, D)).astype(np.float32)
    head_w = (rng.standard_normal((D, V)) * 0.3).astype(np.float32)
    head_b = np.zeros((1, V), np.float32)

    qw = {k: quantize_int4(jnp.asarray(v, jnp.float32), axis=1)
          for k, v in raw.items()}
    s_attn = jnp.concatenate(
        [qw["wq"][1], qw["wk"][1], qw["wv"][1], qw["wo"][1], qw["down"][1],
         jnp.zeros((N, 3, D), jnp.float32)], axis=1)
    s_ffn = jnp.concatenate(
        [qw["gate"][1], qw["up"][1], jnp.zeros((N, 6, F), jnp.float32)],
        axis=1)
    head_q, head_s = quantize_int4(jnp.asarray(head_w), axis=0)

    def unpack_full(pk):
        lo, hi = unpack_int4(pk)
        return np.concatenate([np.asarray(lo), np.asarray(hi)], axis=-2)

    qp = {k: unpack_full(qw[k][0]) for k in raw}
    sp = {k: np.asarray(qw[k][1]) for k in raw}

    Dp = ds.lane_pad_dim(D)
    inv = 1.0 / (10000 ** (np.arange(0, hd, 2) / hd))
    t = np.arange(S)[:, None]
    cosr = np.tile(np.repeat(np.cos(t * inv), 2, -1), (1, H))
    sinr = np.tile(np.repeat(np.sin(t * inv), 2, -1), (1, H))

    f32 = jnp.float32
    consts = dict(
        cosr=jnp.asarray(cosr, f32), sinr=jnp.asarray(sinr, f32),
        rot=jnp.asarray(ds.rope_pair_swap_matrix(D), f32),
        hmask=jnp.pad(ds.head_mask_matrix(D, H).astype(f32),
                      ((0, Dp - D), (0, 0))),
        final_norm=jnp.asarray(norms["final_norm"], f32),
        in_norm=jnp.asarray(norms["in_norm"], f32),
        post_norm=jnp.asarray(norms["post_norm"], f32),
        head_b=jnp.asarray(head_b, f32))

    ck = jnp.zeros((N, B, S, Dp), f32)
    cv = jnp.zeros((N, B, S, Dp), f32)
    ck_std = np.zeros((B, N, S, H, hd))
    cv_std = np.zeros((B, N, S, H, hd))

    toks = np.array([[5, 190, 11, 42],
                     [7, 3, 250, 99],
                     [101, 55, 21, 8]]).T
    for i in range(toks.shape[0]):
        h0 = jnp.asarray(emb[toks[i]], f32)
        nxt, ck, cv = ds.fused_decode_token_batched(
            i, h0, consts["cosr"], consts["sinr"], consts["rot"],
            consts["hmask"], consts["final_norm"], qw["wq"][0], qw["wk"][0],
            qw["wv"][0], qw["wo"][0], qw["gate"][0], qw["up"][0],
            qw["down"][0], consts["in_norm"], consts["post_norm"], head_q,
            consts["head_b"], ck, cv, vt=vt, sb=sb, interpret=True,
            s_attn=s_attn, s_ffn=s_ffn, head_s=head_s, q4=True)
        for b in range(B):
            want, _, ck_std[b], cv_std[b] = _whole_token_reference_q(
                i, toks[i, b], emb, unpack_full(head_q),
                np.asarray(head_s)[0], head_b, qp, sp, norms,
                ck_std[b], cv_std[b], cfg)
            assert int(nxt[b]) == want, (i, b, int(nxt[b]), want)
