"""Big-dims quant decode lane (ops/gemv_quant.py + generate(quant=...,
fused=False)): the streamed per-matmul int8/int4 kernels that replace the
whole-token mega-kernel where its double-buffered weight windows exceed
VMEM (7B-class dims; see gemv_quant's module doc).  Kernel math is pinned
EXACTLY against a NumPy mirror; the lane is pinned against a
dequantized-weights truth stream (the same scheme bench.py's int4 gates
use: the truth carries the weight error, the lane differs only by
activation-int8 noise at near-ties)."""
import numpy as np
import pytest

import pydynet_tpu as pdn
from pydynet_tpu.models.llama.model import Llama
from pydynet_tpu.ops import quant
from pydynet_tpu.ops.gemv_quant import pick_nt, qmatmul, qmatmul_ref

import jax.numpy as jnp


@pytest.mark.parametrize("M,K,N", [(1, 288, 864), (4, 288, 32000),
                                   (8, 768, 2048), (3, 512, 1024)])
def test_qmatmul_matches_numpy_mirror(M, K, N):
    rng = np.random.default_rng(M + K + N)
    x = rng.standard_normal((M, K)).astype(np.float32)
    w = rng.standard_normal((K, N)).astype(np.float32) * 0.05
    q8, s8 = quant.quantize_int8(jnp.asarray(w), 0)
    out = np.asarray(qmatmul(jnp.asarray(x), q8, s8, interpret=True))
    np.testing.assert_array_equal(out,
                                  qmatmul_ref(x, np.asarray(q8),
                                              np.asarray(s8)))
    q4, s4 = quant.quantize_int4(jnp.asarray(w), 0)
    out4 = np.asarray(qmatmul(jnp.asarray(x), q4, s4, q4=True,
                              interpret=True))
    np.testing.assert_array_equal(out4,
                                  qmatmul_ref(x, np.asarray(q4),
                                              np.asarray(s4), q4=True))
    # quantization error vs the dense matmul stays small (sanity, loose)
    rel = np.max(np.abs(out - x @ w)) / np.max(np.abs(x @ w))
    assert rel < 0.05, rel


def test_qmatmul_forced_small_tile():
    """Explicit nt exercises the multi-tile grid path (the default
    pick_nt takes one tile at test sizes)."""
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 256)).astype(np.float32)
    w = rng.standard_normal((256, 1024)).astype(np.float32)
    q8, s8 = quant.quantize_int8(jnp.asarray(w), 0)
    a = np.asarray(qmatmul(jnp.asarray(x), q8, s8, nt=128, interpret=True))
    b = np.asarray(qmatmul(jnp.asarray(x), q8, s8, nt=1024,
                           interpret=True))
    np.testing.assert_array_equal(a, b)
    q4, s4 = quant.quantize_int4(jnp.asarray(w), 0)
    a4 = np.asarray(qmatmul(jnp.asarray(x), q4, s4, q4=True, nt=128,
                            interpret=True))
    np.testing.assert_array_equal(
        a4, qmatmul_ref(x, np.asarray(q4), np.asarray(s4), q4=True))


def test_qmatmul_kgrid_layout_matches_ngrid():
    """Decode rows (M <= _KGRID_M_MAX) take the K-grid layout (contiguous
    full-width weight rows — the +24% silicon finding); forcing nt takes
    the N-grid.  int32 accumulation is order-exact, so the two layouts
    are bit-identical — and the K-grid frees N from the N-grid's tile
    divisibility constraint (N=864 here is not a 128-multiple)."""
    from pydynet_tpu.ops.gemv_quant import _KGRID_M_MAX, _pick_kt

    rng = np.random.default_rng(5)
    for M, K, N in [(1, 256, 864), (_KGRID_M_MAX, 256, 512)]:
        x = rng.standard_normal((M, K)).astype(np.float32)
        w = rng.standard_normal((K, N)).astype(np.float32) * 0.05
        q8, s8 = quant.quantize_int8(jnp.asarray(w), 0)
        assert _pick_kt(M, K, K, N, False) > 0
        kg = np.asarray(qmatmul(jnp.asarray(x), q8, s8, interpret=True))
        ng = np.asarray(qmatmul(jnp.asarray(x), q8, s8, nt=N,
                                interpret=True))
        np.testing.assert_array_equal(kg, ng)
        q4, s4 = quant.quantize_int4(jnp.asarray(w), 0)
        assert _pick_kt(M, K, K // 2, N, True) > 0
        kg4 = np.asarray(qmatmul(jnp.asarray(x), q4, s4, q4=True,
                                 interpret=True))
        np.testing.assert_array_equal(
            kg4, qmatmul_ref(x, np.asarray(q4), np.asarray(s4), q4=True))
    # past the decode-row bound the N-grid takes over (the (M, N) i32
    # accumulator would not fit VMEM at prefill slab sizes)
    x = rng.standard_normal((_KGRID_M_MAX + 1, 256)).astype(np.float32)
    out = np.asarray(qmatmul(jnp.asarray(x), q8, s8, interpret=True))
    np.testing.assert_array_equal(
        out, qmatmul_ref(x, np.asarray(q8), np.asarray(s8)))


def test_pick_nt():
    assert pick_nt(32000, 288) % 128 == 0 and 32000 % pick_nt(32000, 288) == 0
    assert pick_nt(864, 288) == 864          # 8-mult fallback (864 % 128 != 0)
    # cap binds: 4096x11008 bf16-sized int8 blocks stay under ~12 MB
    nt = pick_nt(11008, 4096)
    assert nt > 0 and 4096 * nt <= (12 << 20) and 11008 % nt == 0
    assert pick_nt(97, 24) == 0              # untileable vocab


CFG = dict(vocab_size=512, embed_dim=64, n_heads=4, ffn_dim=128,
           max_seq_len=64, max_batch_size=1, n_layers=2,
           dtype=np.float32)


def _toks(gen):
    return [int(t.numpy()[0, 0]) for t in gen]


def test_xla_quant_lane_int8_and_head():
    """generate(quant=..., fused=False) — the big-dims lane — decodes
    through the streamed kernels; int8/int8-head streams agree with the
    dense XLA lane except at activation-quant near-ties (this seed: all
    steps agree; gate at >=0.8 for robustness against jax version
    drift in reduction order)."""
    np.random.seed(0)
    m = Llama(**CFG)
    m.eval()
    ids = np.array([[1, 5, 9]])
    with pdn.no_grad():
        dense = _toks(m.generate(ids, 24, fused=False))
        for q in ("int8", "int8-head"):
            s = _toks(m.generate(ids, 24, fused=False, quant=q))
            agree = np.mean([a == b for a, b in zip(dense, s)])
            assert agree >= 0.8, (q, agree, s, dense)
        # sampling composes with the quant lane (same sample_logits path)
        sampled = _toks(m.generate(ids, 16, fused=False, quant="int8",
                                   temperature=0.8, seed=3))
        assert len(sampled) == 13
        assert sampled == _toks(m.generate(ids, 16, fused=False,
                                           quant="int8", temperature=0.8,
                                           seed=3))


def test_xla_quant_lane_int4_vs_dequantized_truth():
    """int4's weight error would swamp a dense comparison; against a
    model whose weights were round-tripped through the SAME per-channel
    int4 quantization (fidelity.dequant_int4_inplace — per-output-channel
    scales are unchanged by the wqkv/wgu output-axis concat), the lane
    differs only by activation-int8 noise."""
    from pydynet_tpu.utils.fidelity import dequant_int4_inplace

    np.random.seed(0)
    m = Llama(**CFG)
    m.eval()
    np.random.seed(0)
    truth_model = dequant_int4_inplace(Llama(**CFG))
    truth_model.eval()
    ids = np.array([[1, 5, 9]])
    with pdn.no_grad():
        truth = _toks(truth_model.generate(ids, 24, fused=False))
        got = _toks(m.generate(ids, 24, fused=False, quant="int4"))
    agree = np.mean([a == b for a, b in zip(truth, got)])
    assert agree >= 0.75, (agree, got, truth)


def test_fused_vmem_bound_routes_big_dims_off_the_mega_kernel():
    """7B-class dims: _fused_decode_supported flips off (the measured
    VMEM crash), small dims stay on the mega-kernel, and int4's quarter
    windows do not rescue 7B either (measured: still ~200 MB)."""
    small = Llama(**CFG)
    assert small._fused_decode_supported()
    assert small._fused_decode_supported("int4")
    big = Llama(vocab_size=32000, embed_dim=4096, n_heads=32,
                ffn_dim=11008, max_seq_len=64, max_batch_size=1,
                n_layers=1, dtype=np.float32)
    assert not big._fused_decode_supported()
    assert not big._fused_decode_supported("int4")


def test_xla_quant_lane_batched_rows_match_b1():
    """The lane is per-row exact at any B: activation scales are per ROW,
    so a B=2 quant decode equals the two B=1 decodes row for row (the
    batched big-model serving story needs no separate kernel here)."""
    np.random.seed(0)
    m = Llama(**dict(CFG, max_batch_size=2))
    m.eval()
    ids = np.array([[1, 5, 9], [1, 7, 2]])
    with pdn.no_grad():
        b2 = [t.numpy() for t in m.generate(ids, 20, fused=False,
                                            quant="int8")]
        r0 = _toks(m.generate(ids[:1], 20, fused=False, quant="int8"))
    np.random.seed(0)
    m1 = Llama(**dict(CFG, max_batch_size=1))
    m1.eval()
    with pdn.no_grad():
        r1 = _toks(m1.generate(ids[1:], 20, fused=False, quant="int8"))
    assert [int(t[0, 0]) for t in b2] == r0
    assert [int(t[1, 0]) for t in b2] == r1


def test_qmatmul_slabs_long_prefill_rows():
    """M past _M_SLAB (a long-prompt prefill) splits into per-slab
    launches — per-row activation quantization makes the split exact,
    including a non-multiple M (padded rows sliced off)."""
    import jax.numpy as jnp

    from pydynet_tpu.ops import quant
    from pydynet_tpu.ops.gemv_quant import _M_SLAB, qmatmul, qmatmul_ref

    rng = np.random.default_rng(11)
    M = _M_SLAB + 37
    x = rng.standard_normal((M, 128)).astype(np.float32)
    w = rng.standard_normal((128, 256)).astype(np.float32) * 0.1
    q8, s8 = quant.quantize_int8(jnp.asarray(w), 0)
    out = np.asarray(qmatmul(jnp.asarray(x), q8, s8, interpret=True))
    np.testing.assert_array_equal(
        out, qmatmul_ref(x, np.asarray(q8), np.asarray(s8)))
    q4, s4 = quant.quantize_int4(jnp.asarray(w), 0)
    out4 = np.asarray(qmatmul(jnp.asarray(x), q4, s4, q4=True,
                              interpret=True))
    np.testing.assert_array_equal(
        out4, qmatmul_ref(x, np.asarray(q4), np.asarray(s4), q4=True))


def test_qmatmul_stacked_matches_per_layer():
    """qmatmul_stacked(x, wq_all, ws_all, i) — the rolled-scan decode's
    in-place layer read (no per-iteration HBM slice copy) — is
    bit-identical to qmatmul against the sliced layer, including with a
    TRACED index inside a lax.scan (how the decode actually runs)."""
    import jax
    import jax.numpy as jnp2

    from pydynet_tpu.ops.gemv_quant import qmatmul_stacked

    rng = np.random.default_rng(11)
    L, K, N = 3, 256, 512
    x = rng.standard_normal((2, K)).astype(np.float32)
    for q4 in (False, True):
        qfn = quant.quantize_int4 if q4 else quant.quantize_int8
        qs = [qfn(jnp.asarray(rng.standard_normal((K, N)).astype(
            np.float32) * 0.05), 0) for _ in range(L)]
        wq_all = jnp.stack([q for q, _ in qs])
        ws_all = jnp.stack([s for _, s in qs])
        want = [np.asarray(qmatmul(jnp.asarray(x), q, s, q4=q4,
                                   interpret=True)) for q, s in qs]
        for i in range(L):
            got = np.asarray(qmatmul_stacked(jnp.asarray(x), wq_all,
                                             ws_all, i, q4=q4,
                                             interpret=True))
            np.testing.assert_array_equal(got, want[i])

        def step(c, i):
            return c, qmatmul_stacked(jnp.asarray(x), wq_all, ws_all, i,
                                      q4=q4, interpret=True)

        _, outs = jax.lax.scan(step, 0,
                               jnp2.arange(L, dtype=jnp2.int32))
        np.testing.assert_array_equal(np.asarray(outs), np.stack(want))


def test_stacked_rolled_scan_matches_unrolled(monkeypatch):
    """Deep-model quant decode (rolled scan + qmatmul_stacked) emits the
    same stream as the unrolled per-layer-operand path: force the rolled
    path by dropping UNROLL_MAX_LAYERS below this model's depth."""
    from pydynet_tpu.models.llama import model as M

    np.random.seed(0)
    m = Llama(**dict(CFG, n_layers=3))
    m.eval()
    ids = np.array([[1, 5, 9]])
    for q in ("int8", "int4"):
        with pdn.no_grad():
            unrolled = _toks(m.generate(ids, 20, fused=False, quant=q))
        monkeypatch.setattr(M, "UNROLL_MAX_LAYERS", 1)
        m2 = Llama(**dict(CFG, n_layers=3))  # fresh compiled fns cache
        m2.load_state_dict(m.state_dict())
        m2.eval()
        with pdn.no_grad():
            rolled = _toks(m2.generate(ids, 20, fused=False, quant=q))
        monkeypatch.undo()
        assert rolled == unrolled, (q, rolled, unrolled)
