"""Hardware lane: kernel equality on the real TPU chip, NON-interpret.

Run with ``PDN_TPU_TESTS=1 python -m pytest -m tpu tests/ -q`` in ONE
process (the tunnel serializes on a single session; give it 10+ minute
timeouts — first Mosaic compiles take about a minute each, the persistent
XLA cache makes reruns fast).  Under the normal CPU-pinned suite these are
skipped; bench.py gates the production-dim configs, this lane covers the
kernel variants at small dims where compiles are quick.
"""
import numpy as np
import pytest

pytestmark = pytest.mark.tpu

# small-but-aligned config: vocab tiles (2560 = 20*128), 8-divisible dims
SMALL = dict(vocab_size=2560, embed_dim=128, n_heads=4, ffn_dim=256,
             max_seq_len=256, max_batch_size=1, n_layers=2,
             dtype=np.float32)
STEPS = 12


def _models(**over):
    """(cpu_model, device_model) with identical weights."""
    import pydynet_tpu as pdn
    from pydynet_tpu.models.llama.model import Llama

    if not pdn.cuda.is_available():
        pytest.skip("no accelerator visible")
    cfg = dict(SMALL)
    cfg.update(over)
    np.random.seed(0)
    cpu = Llama(**cfg)
    cpu.eval()
    np.random.seed(0)
    dev = Llama(**cfg).to("cuda:0")
    dev.eval()
    return cpu, dev


def test_fused_token_kernel_on_chip():
    """Whole-token kernel (bf16) argmax == f32 eager truth at confident
    steps, on silicon."""
    import jax.numpy as jnp

    from pydynet_tpu.utils import fidelity

    cpu, dev = _models()
    ids = np.array([[1, 5, 9]])
    truth, margins, tops = fidelity.greedy_truth(cpu, ids, STEPS)
    checked, ok, _ = fidelity.gate_fused_argmax(dev, ids, truth, margins, tops,
                                             dtype=jnp.bfloat16)
    assert checked > 0 and ok, (checked, ok)


def test_fused_token_kernel_int8_head_on_chip():
    import jax.numpy as jnp

    from pydynet_tpu.utils import fidelity

    cpu, dev = _models()
    ids = np.array([[1, 5, 9]])
    truth, margins, tops = fidelity.greedy_truth(cpu, ids, STEPS)
    checked, ok, _ = fidelity.gate_fused_argmax(dev, ids, truth, margins, tops,
                                             dtype=jnp.bfloat16,
                                             quant="int8-head")
    assert checked > 0 and ok, (checked, ok)


def test_fused_batched_kernel_on_chip():
    import jax.numpy as jnp

    from pydynet_tpu.utils import fidelity

    cpu, dev = _models(max_batch_size=4)
    ids = np.array([[1, 5, 9], [2, 7, 3], [30, 20, 10], [4, 4, 4]])
    truth, margins, tops = fidelity.greedy_truth(cpu, ids, STEPS)
    checked, ok, _ = fidelity.gate_fused_argmax(dev, ids, truth, margins, tops,
                                             dtype=jnp.bfloat16)
    assert checked > 0 and ok, (checked, ok)


def test_fused_batched_kernel_kv_int8_on_chip():
    """int8-KV batched kernel on silicon: int8 x int8 score matmuls with
    per-row scales must track the f32 eager truth by majority agreement
    (quantization noise flips only near-ties; layout/scale breakage drives
    agreement toward 1/vocab)."""
    import jax.numpy as jnp

    from pydynet_tpu.utils import fidelity

    cpu, dev = _models(max_batch_size=4)
    ids = np.array([[1, 5, 9], [2, 7, 3], [30, 20, 10], [4, 4, 4]])
    truth, margins, tops = fidelity.greedy_truth(cpu, ids, STEPS)
    checked, ok, _ = fidelity.gate_fused_argmax(dev, ids, truth, margins, tops,
                                             dtype=jnp.bfloat16,
                                             kv_quant="int8", min_agree=0.75)
    assert checked > 0 and ok, (checked, ok)


def test_fused_batched_kernel_weight_int8_on_chip():
    """Weight int8 through the BATCHED kernel on silicon (round-3 late):
    int8-head argmax-gated at confident steps, full-layer int8
    majority-gated (its per-row activation quantization is genuinely
    lossy, like the B=1 variant)."""
    import jax.numpy as jnp

    from pydynet_tpu.utils import fidelity

    cpu, dev = _models(max_batch_size=4)
    ids = np.array([[1, 5, 9], [2, 7, 3], [30, 20, 10], [4, 4, 4]])
    truth, margins, tops = fidelity.greedy_truth(cpu, ids, STEPS)
    checked, ok, _ = fidelity.gate_fused_argmax(dev, ids, truth, margins, tops,
                                             dtype=jnp.bfloat16,
                                             quant="int8-head")
    assert checked > 0 and ok, ("int8-head", checked, ok)
    checked, ok, _ = fidelity.gate_fused_argmax(dev, ids, truth, margins, tops,
                                             dtype=jnp.bfloat16,
                                             quant="int8", min_agree=0.75)
    assert checked > 0 and ok, ("int8", checked, ok)


def test_fused_token_kernel_int4_on_chip():
    """Packed-int4 whole-token kernel on silicon (round-3 late): gated
    against a DEQUANTIZED-int4 truth stream (the weight error rides the
    truth — see fidelity.dequant_int4_inplace), majority agreement
    absorbing the remaining activation-int8 noise."""
    import jax.numpy as jnp

    from pydynet_tpu.utils import fidelity

    cpu, dev = _models()
    fidelity.dequant_int4_inplace(cpu)
    fidelity.dequant_int4_inplace(dev)
    ids = np.array([[1, 5, 9]])
    truth, margins, tops = fidelity.greedy_truth(cpu, ids, STEPS)
    checked, ok, _ = fidelity.gate_fused_argmax(dev, ids, truth, margins, tops,
                                             dtype=jnp.bfloat16,
                                             quant="int4", min_agree=0.75)
    assert checked > 0 and ok, (checked, ok)


def test_fused_batched_kernel_int4_on_chip():
    """Packed-int4 BATCHED kernel on silicon, dequantized-truth majority
    gate (see the B=1 int4 test)."""
    import jax.numpy as jnp

    from pydynet_tpu.utils import fidelity

    cpu, dev = _models(max_batch_size=4)
    fidelity.dequant_int4_inplace(cpu)
    fidelity.dequant_int4_inplace(dev)
    ids = np.array([[1, 5, 9], [2, 7, 3], [30, 20, 10], [4, 4, 4]])
    truth, margins, tops = fidelity.greedy_truth(cpu, ids, STEPS)
    checked, ok, _ = fidelity.gate_fused_argmax(dev, ids, truth, margins, tops,
                                             dtype=jnp.bfloat16,
                                             quant="int4", min_agree=0.75)
    assert checked > 0 and ok, (checked, ok)


def test_fused_b1_kv_int8_on_chip():
    """B=1 kv_quant='int8' (routed through the batched kernel's int8-KV
    machinery — the 2x-context-per-HBM-byte mode) on silicon."""
    import jax.numpy as jnp

    from pydynet_tpu.utils import fidelity

    cpu, dev = _models()
    ids = np.array([[1, 5, 9]])
    truth, margins, tops = fidelity.greedy_truth(cpu, ids, STEPS)
    checked, ok, _ = fidelity.gate_fused_argmax(dev, ids, truth, margins, tops,
                                             dtype=jnp.bfloat16,
                                             kv_quant="int8", min_agree=0.75)
    assert checked > 0 and ok, (checked, ok)


def test_fused_gqa_narrow_kernel_on_chip():
    """Narrow-KV GQA variant (egqa expansion in-kernel) on silicon."""
    import jax.numpy as jnp

    from pydynet_tpu.utils import fidelity

    cpu, dev = _models(n_heads=8, n_kv_heads=2)
    ids = np.array([[1, 5, 9]])
    truth, margins, tops = fidelity.greedy_truth(cpu, ids, STEPS)
    checked, ok, _ = fidelity.gate_fused_argmax(dev, ids, truth, margins, tops,
                                             dtype=jnp.bfloat16)
    assert checked > 0 and ok, (checked, ok)


def test_fused_logits_head_on_chip():
    """emit_logits (sampling mode) vs the XLA forward's logits, f32."""
    from pydynet_tpu.utils import fidelity

    cpu, dev = _models()
    ids = np.array([[1, 5, 9]])
    truth, _, _ = fidelity.greedy_truth(cpu, ids, STEPS)
    diff, ok = fidelity.gate_fused_logits(dev, ids, truth)
    assert ok, f"fused emit_logits diverged from XLA logits by {diff}"


def test_fused_sampled_stream_on_chip():
    """Sampled decode path on silicon: fused emit_logits and XLA logits
    streams pushed through the same sample_logits filters (radix top-k +
    nucleus) under one key must agree on most draws (round-4 gate — the
    greedy/logits gates alone left the sampled path without on-chip
    correctness cover)."""
    from pydynet_tpu.utils import fidelity

    cpu, dev = _models()
    ids = np.array([[1, 5, 9]])
    truth, _, _ = fidelity.greedy_truth(cpu, ids, STEPS)
    checked, ok, agree = fidelity.gate_fused_sampled(dev, ids, truth)
    assert checked > 0 and ok, (checked, ok, agree)


def test_flash_attention_on_chip():
    """Pallas flash attention fwd + bwd vs dense XLA on silicon."""
    import jax
    import jax.numpy as jnp

    import pydynet_tpu as pdn
    from pydynet_tpu.ops.flash_attention import flash_attention_causal

    if not pdn.cuda.is_available():
        pytest.skip("no accelerator visible")
    B, L, H, hd = 1, 1024, 4, 64
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (B, L, H, hd), jnp.float32)
    k = jax.random.normal(kk, (B, L, H, hd), jnp.float32)
    v = jax.random.normal(kv, (B, L, H, hd), jnp.float32)

    def dense(q, k, v):
        s = jnp.einsum("blhd,bmhd->bhlm", q, k) / np.sqrt(hd)
        mask = jnp.where(jnp.arange(L)[:, None] >= jnp.arange(L)[None, :],
                         0.0, -jnp.inf)
        p = jax.nn.softmax(s + mask, axis=-1)
        return jnp.einsum("bhlm,bmhd->blhd", p, v)

    fwd = np.asarray(jax.jit(flash_attention_causal)(q, k, v))
    want = np.asarray(jax.jit(dense)(q, k, v))
    # on silicon the MXU multiplies in bf16 even for f32 operands (default
    # precision), and the kernel's P-matmul rounds through bf16 — expect
    # bf16-ulp-level agreement on O(1) outputs, not f32 (interpret-mode
    # CPU tests pin the exact math at 1e-6)
    assert np.abs(fwd - want).max() < 3e-2

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention_causal(q, k, v) ** 2)

    def loss_dense(q, k, v):
        return jnp.sum(dense(q, k, v) ** 2)

    gf = jax.jit(jax.grad(loss_flash, argnums=(0, 1, 2)))(q, k, v)
    gd = jax.jit(jax.grad(loss_dense, argnums=(0, 1, 2)))(q, k, v)
    for a, b in zip(gf, gd):
        d = np.abs(np.asarray(a) - np.asarray(b))
        s = max(1.0, float(np.abs(np.asarray(b)).max()))
        assert d.max() < 3e-2 * s, (d.max(), s)


def test_bucketed_prefill_on_chip():
    """Bucketed vs unpadded prefill through the FUSED whole-request path
    on silicon (the CPU suite can only cover the XLA path): identical
    token streams for an odd prompt length."""
    import pydynet_tpu as pdn

    _, dev = _models()
    ids = np.array([[1, 5, 9, 4, 7]])  # L=5 -> bucket 8
    with pdn.no_grad():
        a = [int(t.numpy()[0, 0]) for t in dev.generate(ids, 24)]
        b = [int(t.numpy()[0, 0])
             for t in dev.generate(ids, 24, bucket_prefill=False)]
    assert a == b, (a, b)


def test_speculative_on_chip():
    """Speculative greedy on silicon == the plain greedy stream (XLA
    path, f32 weights: bit-identical verification is the contract)."""
    import pydynet_tpu as pdn

    _, dev = _models()
    ids = np.array([[1, 5, 9, 5, 9, 5, 9]])
    with pdn.no_grad():
        greedy = [int(t.numpy()[0, 0])
                  for t in dev.generate(ids, 40, fused=False)]
        toks, stats = dev.generate_speculative(ids, 40, draft_k=4, ngram=2)
    assert toks.tolist() == greedy, (toks.tolist(), greedy, stats)


def test_gemv_quant_kernel_on_chip():
    """Streamed quant matmul (big-dims lane, ops/gemv_quant.py): int8 and
    int4 Mosaic-compiled outputs equal the NumPy mirror EXACTLY (integer
    dots + two f32 scalings — no float-reduction order to drift), across
    a multi-tile grid."""
    import jax.numpy as jnp

    from pydynet_tpu.ops import quant
    from pydynet_tpu.ops.gemv_quant import qmatmul, qmatmul_ref

    rng = np.random.default_rng(7)
    x = rng.standard_normal((4, 512)).astype(np.float32)
    w = rng.standard_normal((512, 2560)).astype(np.float32) * 0.05
    q8, s8 = quant.quantize_int8(jnp.asarray(w), 0)
    out = np.asarray(qmatmul(jnp.asarray(x), q8, s8, nt=640,
                             interpret=False))
    np.testing.assert_array_equal(
        out, qmatmul_ref(x, np.asarray(q8), np.asarray(s8)))
    q4, s4 = quant.quantize_int4(jnp.asarray(w), 0)
    out4 = np.asarray(qmatmul(jnp.asarray(x), q4, s4, q4=True, nt=640,
                              interpret=False))
    np.testing.assert_array_equal(
        out4, qmatmul_ref(x, np.asarray(q4), np.asarray(s4), q4=True))


def test_gemv_quant_slabbed_prefill_on_chip():
    """Long-prompt activation slabbing (M > _M_SLAB splits into per-slab
    launches, round 4) on silicon: exact vs the NumPy mirror at a
    non-multiple M — the quant serve lane's long-prefill path."""
    import jax.numpy as jnp

    from pydynet_tpu.ops import quant
    from pydynet_tpu.ops.gemv_quant import _M_SLAB, qmatmul, qmatmul_ref

    rng = np.random.default_rng(13)
    M = _M_SLAB + 37
    x = rng.standard_normal((M, 512)).astype(np.float32)
    w = rng.standard_normal((512, 2560)).astype(np.float32) * 0.05
    q4, s4 = quant.quantize_int4(jnp.asarray(w), 0)
    out4 = np.asarray(qmatmul(jnp.asarray(x), q4, s4, q4=True,
                              interpret=False))
    np.testing.assert_array_equal(
        out4, qmatmul_ref(x, np.asarray(q4), np.asarray(s4), q4=True))


def test_serve_xla_lane_on_chip():
    """Big-dims serving lane on silicon: LlamaServer(lane="xla",
    quant="int4") must track generate(fused=False, quant="int4") on the
    same device — same scan forward, same gemv_quant kernels; the only
    difference is the admission path (fresh prefill + _rope_pure
    position-shift + scatter vs direct prefill), whose rotation
    composition is float-exact up to rounding, so near-tie flips are
    the ONLY tolerated divergence."""
    import pydynet_tpu as pdn
    from pydynet_tpu.models.llama.serve import LlamaServer

    _, dev = _models()
    ids = [1, 5, 9]
    with pdn.no_grad():
        want = [int(t.numpy()[0, 0])
                for t in dev.generate(np.array([ids]), len(ids) + STEPS,
                                      fused=False, quant="int4")]
        srv = LlamaServer(dev, batch_size=2, chunk=8, eos_id=-1,
                          lane="xla", quant="int4")
        r1 = srv.submit(ids, max_new_tokens=STEPS)
        r2 = srv.submit([2, 7], max_new_tokens=STEPS)
        outs = srv.run()
    got = outs[r1].tokens
    agree = np.mean([a == b for a, b in zip(want, got)])
    assert len(got) == STEPS and agree >= 0.9, (agree, got, want)


def test_xla_quant_lane_decode_on_chip():
    """The big-dims decode lane end-to-end on silicon: generate(fused=
    False, quant="int4") vs a dequantized-int4 CPU truth stream (weight
    error rides the truth — native f32 on both sides, so the scales are
    identical and only activation-int8 noise flips near-ties ->
    majority agreement)."""
    from pydynet_tpu.utils import fidelity

    cpu, dev = _models()
    fidelity.dequant_int4_inplace(cpu)
    ids = np.array([[1, 5, 9]])
    import pydynet_tpu as pdn
    with pdn.no_grad():
        truth = [int(t.numpy()[0, 0])
                 for t in cpu.generate(ids, STEPS, fused=False)]
        got = [int(t.numpy()[0, 0])
               for t in dev.generate(ids, STEPS, fused=False,
                                     quant="int4")]
    agree = np.mean([a == b for a, b in zip(truth, got)])
    assert agree >= 0.6, (agree, got, truth)


def test_xla_kv_quant_lane_on_chip():
    """int8-KV on the XLA scan lane on silicon (round 5): tuple (data,
    scale) caches through generate — chunk-size bit-invariance (the
    sharp plumbing oracle: different executables and window buckets,
    same math) plus majority stream agreement vs the CPU f32 truth, and
    the weight-quant compose (int4 x kv-int8, the 7B serving
    configuration) chunk-invariant too."""
    import pydynet_tpu as pdn

    cpu, dev = _models()
    ids = np.array([[1, 5, 9]])
    with pdn.no_grad():
        truth = [int(t.numpy()[0, 0])
                 for t in cpu.generate(ids, STEPS, fused=False)]
        kv5 = [int(t.numpy()[0, 0])
               for t in dev.generate(ids, STEPS, chunk=4, fused=False,
                                     kv_quant="int8")]
        kv2 = [int(t.numpy()[0, 0])
               for t in dev.generate(ids, STEPS, chunk=2, fused=False,
                                     kv_quant="int8")]
        assert kv5 == kv2, (kv5, kv2)
        agree = np.mean([a == b for a, b in zip(truth, kv5)])
        assert agree >= 0.6, (agree, kv5, truth)
        c5 = [int(t.numpy()[0, 0])
              for t in dev.generate(ids, STEPS, chunk=4, fused=False,
                                    quant="int4", kv_quant="int8")]
        c2 = [int(t.numpy()[0, 0])
              for t in dev.generate(ids, STEPS, chunk=2, fused=False,
                                    quant="int4", kv_quant="int8")]
        assert c5 == c2, (c5, c2)
