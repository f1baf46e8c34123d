"""Continuous-batching server, XLA scan lane (``LlamaServer(lane="xla")``).

Big-dims serving: 7B-class models route off the fused whole-token kernel
(``_fused_decode_supported``'s VMEM bound) onto the ``lax.scan`` decode,
so the server grew the same lane (serve.py module doc) — per-row
``starts`` attention mask instead of the kernel's starts input, direct
(N, B, S, Hkv, hd) cache scatter on admission, ``quant=`` riding the
streamed ``ops/gemv_quant.py`` kernels.  These tests pin the lane to the
same contract the fused-lane tests pin (test_serve.py): a request
admitted mid-stream at a shifted absolute position decodes exactly the
tokens single-prompt ``generate`` produces from position 0.

The small CFG keeps the suite fast; the lane is forced with ``lane=`` —
the routing itself (an unsupported-dims model auto-picking the scan
lane) is covered by test_xla_lane_auto_routes.
"""
import numpy as np
import pytest

import pydynet_tpu as pdn
from pydynet_tpu.models.llama.model import Llama
from pydynet_tpu.models.llama.serve import LlamaServer

CFG = dict(vocab_size=256, embed_dim=32, n_heads=2, ffn_dim=64,
           max_seq_len=64, max_batch_size=2, n_layers=2, dtype=np.float32)


def standalone(model, prompt, n_new, **kw):
    """Expected stream: generate(fused=False) stays on the scan lane."""
    with pdn.no_grad():
        return [int(t.numpy()[0, 0])
                for t in model.generate(np.asarray([prompt]),
                                        len(prompt) + n_new, fused=False,
                                        **kw)]


def test_xla_lane_matches_standalone_generate():
    np.random.seed(9)
    model = Llama(**CFG)
    model.eval()
    prompts = [[1, 5, 9], [2, 7, 3, 11], [30, 20]]
    want = [standalone(model, p, 8) for p in prompts]

    with pdn.no_grad():
        srv = LlamaServer(model, batch_size=2, chunk=4, eos_id=-1,
                          lane="xla")
        rids = [srv.submit(p, max_new_tokens=8) for p in prompts]
        done = srv.run()
    assert set(done) == set(rids)
    for rid, exp in zip(rids, want):
        assert done[rid].tokens == exp, (rid, done[rid].tokens, exp)
    # 3 requests on 2 slots: slot recycling (shifted-position admission
    # through the per-row starts mask) really happened
    assert len(prompts) > srv.B


@pytest.mark.parametrize("quant", ["int8", "int4"])
def test_xla_lane_quant_matches_standalone(quant):
    """Weight-quantized serving on the scan lane (the gemv_quant
    kernels, interpret mode off-TPU) matches generate(quant=...) —
    including a recycled slot's shifted-position decode."""
    np.random.seed(3)
    model = Llama(**CFG)
    model.eval()
    prompts = [[1, 4, 7], [2, 9, 5], [12, 3]]
    want = [standalone(model, p, 6, quant=quant) for p in prompts]

    with pdn.no_grad():
        srv = LlamaServer(model, batch_size=2, chunk=4, eos_id=-1,
                          lane="xla", quant=quant)
        rids = [srv.submit(p, max_new_tokens=6) for p in prompts]
        done = srv.run()
    for rid, exp in zip(rids, want):
        assert done[rid].tokens == exp, (quant, done[rid].tokens, exp)


def test_xla_lane_seeded_request_reproduces():
    """A seeded sampled request's stream is a pure function of
    (prompt, params, seed) on the scan lane too — reproduced on a fresh
    server with different co-tenants and a different slot layout."""
    np.random.seed(5)
    model = Llama(**CFG)
    model.eval()
    prompt = [1, 6, 2]

    def run_fleet(extra, server_seed):
        with pdn.no_grad():
            srv = LlamaServer(model, batch_size=2, chunk=4, eos_id=-1,
                              lane="xla", seed=server_seed)
            for p in extra:
                srv.submit(p, max_new_tokens=6, temperature=0.7, top_k=9)
            rid = srv.submit(prompt, max_new_tokens=8, temperature=0.9,
                             top_k=17, top_p=0.95, seed=1234)
            done = srv.run()
        return done[rid].tokens

    a = run_fleet([], server_seed=0)
    b = run_fleet([[7, 7], [3, 1, 4, 1, 5]], server_seed=42)
    assert a == b, (a, b)


def test_xla_lane_kv_quant_matches_standalone():
    """int8-KV serving on the scan lane: tuple (data, scale) fleet caches
    through admission (tuple-transient prefill — the admission attends
    QUANTIZED fresh rows exactly like standalone generate; V rows scatter
    bit-exact, K rows dequant->rotate->requant) and decode, tracking
    ``generate(fused=False, kv_quant="int8")`` token-for-token on this
    small f32 model, including a recycled slot."""
    np.random.seed(13)
    model = Llama(**CFG)
    model.eval()
    prompts = [[1, 5, 9], [2, 7, 3], [30, 20]]
    want = [standalone(model, p, 6, kv_quant="int8") for p in prompts]

    with pdn.no_grad():
        srv = LlamaServer(model, batch_size=2, chunk=4, eos_id=-1,
                          lane="xla", kv_quant="int8")
        rids = [srv.submit(p, max_new_tokens=6) for p in prompts]
        done = srv.run()
    for rid, exp in zip(rids, want):
        assert done[rid].tokens == exp, (done[rid].tokens, exp)


def test_xla_lane_kv_quant_composes_with_weight_quant():
    """The 7B serving configuration on the scan lane: weight int8/int4
    (gemv_quant kernels) x int8 KV (tuple caches) in one server, tracking
    the composed ``generate`` stream."""
    np.random.seed(17)
    model = Llama(**CFG)
    model.eval()
    prompts = [[1, 4, 7], [2, 9, 5]]
    want = [standalone(model, p, 6, quant="int4", kv_quant="int8")
            for p in prompts]

    with pdn.no_grad():
        srv = LlamaServer(model, batch_size=2, chunk=4, eos_id=-1,
                          lane="xla", quant="int4", kv_quant="int8")
        rids = [srv.submit(p, max_new_tokens=6) for p in prompts]
        done = srv.run()
    for rid, exp in zip(rids, want):
        assert done[rid].tokens == exp, (done[rid].tokens, exp)


def test_xla_lane_kv_quant_prefix_cache_reuse():
    """prefix_cache x kv_quant: int8 donor rows dequantize, re-rotate and
    requantize on reuse; the reused admission's stream must match the
    same server WITHOUT reuse (fresh server, same request order), and the
    reuse counters must show it happened."""
    np.random.seed(21)
    model = Llama(**dict(CFG, max_seq_len=128))
    model.eval()
    sys_prefix = [9, 8, 7, 6, 5, 4, 3, 2]   # pow2 shared prefix
    p1 = sys_prefix + [10, 11]
    p2 = sys_prefix + [12, 13]

    def run(prefix_cache):
        with pdn.no_grad():
            srv = LlamaServer(model, batch_size=2, chunk=4, eos_id=-1,
                              lane="xla", kv_quant="int8",
                              prefix_cache=prefix_cache)
            # 6 > admission token + one 4-chunk: request 1 must still
            # be ACTIVE when 2 admits (an empty fleet rewinds the shared
            # position, which clears donor residency)
            r1 = srv.submit(p1, max_new_tokens=6)
            srv.step()  # admit 1 alone so its rows become donor material
            r2 = srv.submit(p2, max_new_tokens=6)
            srv.run()
        return srv._finished[r1].tokens, srv._finished[r2].tokens, \
            srv.prefix_hits, srv.prefix_rows_reused

    t1, t2, hits, rows = run(True)
    u1, u2, h0, _ = run(False)
    assert h0 == 0 and hits >= 1 and rows >= len(sys_prefix), \
        (h0, hits, rows)
    assert t1 == u1, (t1, u1)
    assert t2 == u2, (t2, u2)


def test_xla_lane_auto_routes():
    """A model the fused kernels cannot run (8-alignment broken) serves
    through the scan lane automatically — generate()'s routing rule."""
    cfg = dict(CFG, embed_dim=36, ffn_dim=60)  # 36 % 8 != 0
    np.random.seed(11)
    model = Llama(**cfg)
    model.eval()
    assert not model._fused_decode_supported()
    prompts = [[1, 5, 9], [2, 7, 3]]
    want = [standalone(model, p, 6) for p in prompts]
    with pdn.no_grad():
        srv = LlamaServer(model, batch_size=2, chunk=4, eos_id=-1)
        assert srv._lane == "xla"
        rids = [srv.submit(p, max_new_tokens=6) for p in prompts]
        done = srv.run()
    for rid, exp in zip(rids, want):
        assert done[rid].tokens == exp, (done[rid].tokens, exp)


# --------------------------- prefix caching --------------------------- #

PA = [1, 5, 9, 4, 7, 2, 8, 3, 6, 1, 2, 4]          # 12 tokens
PB = PA[:10] + [7, 5]                               # lcp 10 -> kb 8


@pytest.mark.parametrize("quant", [None, "int4"])
def test_prefix_cache_reuses_and_matches(quant):
    """prefix_cache=True: a request sharing >= 8 prompt tokens with a
    resident slot admits through the donor-row reuse path (suffix-only
    prefill) and still emits exactly the standalone generate stream —
    the reused rows are bit-identical to what its own prefill would
    have written (same tokens, same positions, same weights)."""
    np.random.seed(21)
    model = Llama(**dict(CFG, max_seq_len=128))
    model.eval()
    want_a = standalone(model, PA, 6, quant=quant)
    want_b = standalone(model, PB, 6, quant=quant)

    with pdn.no_grad():
        srv = LlamaServer(model, batch_size=2, chunk=4, eos_id=-1,
                          lane="xla", quant=quant, prefix_cache=True)
        ra = srv.submit(PA, max_new_tokens=6)
        srv.step()  # admit A alone so its rows become donor material
        rb = srv.submit(PB, max_new_tokens=6)
        done = srv.run()
        done.setdefault(ra, srv._finished[ra])
    assert srv.prefix_hits == 1 and srv.prefix_rows_reused == 8, \
        (srv.prefix_hits, srv.prefix_rows_reused)
    assert srv._finished[ra].tokens == want_a
    assert srv._finished[rb].tokens == want_b, \
        (srv._finished[rb].tokens, want_b)


def test_prefix_cache_donor_survives_finish_and_recycling():
    """A finished request's rows stay donor material until its slot is
    re-admitted or the shared position rewinds; the reuse admission at a
    recycled slot's shifted position matches standalone generate."""
    np.random.seed(22)
    model = Llama(**dict(CFG, max_seq_len=128))
    model.eval()
    pc = [2, 7, 4, 4, 1, 3, 9, 2, 5]  # no shared prefix
    # pc outlives PA so the fleet never drains (a drain rewinds the
    # position and kills the donors — that path has its own test below);
    # PB recycles PA's own slot, exercising SELF-donation (the donor
    # read sequenced before the slot overwrite inside one program)
    wants = {tuple(PA): standalone(model, PA, 5),
             tuple(pc): standalone(model, pc, 16),
             tuple(PB): standalone(model, PB, 5)}

    with pdn.no_grad():
        srv = LlamaServer(model, batch_size=2, chunk=4, eos_id=-1,
                          lane="xla", prefix_cache=True)
        ra = srv.submit(PA, max_new_tokens=5)   # slot 0, finishes first
        rc = srv.submit(pc, max_new_tokens=16)  # slot 1, keeps decoding
        rb = srv.submit(PB, max_new_tokens=5)   # queued -> recycled slot
        done = srv.run()
    assert len(done) == 3
    assert srv.prefix_hits == 1, srv.prefix_hits
    for rid, p in ((ra, PA), (rc, pc), (rb, PB)):
        assert done[rid].tokens == wants[tuple(p)], \
            (rid, done[rid].tokens, wants[tuple(p)])


def test_prefix_cache_seeded_sampling_unchanged():
    """A seeded request's sampled stream is the same whether its prefix
    rows were reused or prefilled — the reuse path derives the identical
    draw-key stream and feeds it bit-identical logits here."""
    np.random.seed(23)
    model = Llama(**dict(CFG, max_seq_len=128))
    model.eval()
    kw = dict(max_new_tokens=8, temperature=0.9, top_k=17, seed=77)

    def serve_b(prefix_cache, warm):
        with pdn.no_grad():
            srv = LlamaServer(model, batch_size=2, chunk=4, eos_id=-1,
                              lane="xla", prefix_cache=prefix_cache)
            if warm:
                srv.submit(PA, max_new_tokens=6)
                srv.step()
            rb = srv.submit(PB, **kw)
            srv.run()
            if prefix_cache and warm:
                assert srv.prefix_hits == 1, srv.prefix_hits
            return srv._finished[rb].tokens

    assert serve_b(True, warm=True) == serve_b(False, warm=False)


def test_prefix_cache_invalidated_on_rewind():
    """Draining the fleet rewinds the shared position; donors die with
    it (their rows get rewritten as decode re-advances) — a later
    matching prompt must NOT reuse, and still decodes correctly."""
    np.random.seed(24)
    model = Llama(**dict(CFG, max_seq_len=128))
    model.eval()
    want_b = standalone(model, PB, 5)
    with pdn.no_grad():
        srv = LlamaServer(model, batch_size=2, chunk=4, eos_id=-1,
                          lane="xla", prefix_cache=True)
        srv.submit(PA, max_new_tokens=4)
        srv.run()                      # drains -> idle
        rb = srv.submit(PB, max_new_tokens=5)
        done = srv.run()               # idle admission resets _pos
    assert srv.prefix_hits == 0, srv.prefix_hits
    assert done[rb].tokens == want_b, (done[rb].tokens, want_b)


def test_prefix_cache_requires_xla_lane():
    np.random.seed(0)
    model = Llama(**CFG)
    model.eval()
    with pytest.raises(ValueError, match="prefix_cache"):
        LlamaServer(model, batch_size=2, lane="fused", prefix_cache=True)


def test_prefix_cache_multi_turn_reuses_generated_rows():
    """Resident entries grow with credited tokens: a follow-up prompt
    quoting the previous exchange (prompt + generated reply) reuses rows
    past the original prompt — the multi-turn conversation pattern."""
    np.random.seed(25)
    model = Llama(**dict(CFG, max_seq_len=128))
    model.eval()
    pa = [1, 5, 9, 4, 7, 2]
    out_a = standalone(model, pa, 10)
    # follow-up quotes the whole first exchange plus a new "question";
    # lcp = 6 + 8 = 14 -> kb 8 needs rows past the 6-token prompt
    pb = pa + out_a[:8] + [3, 11]
    want_b = standalone(model, pb, 5)

    with pdn.no_grad():
        srv = LlamaServer(model, batch_size=2, chunk=4, eos_id=-1,
                          lane="xla", prefix_cache=True)
        ra = srv.submit(pa, max_new_tokens=10)
        # a long-lived co-tenant keeps the fleet busy: the position must
        # not rewind (that invalidates donors) between A and B
        srv.submit([2, 7, 4], max_new_tokens=60)
        for _ in range(20):     # drive A to completion
            if ra in srv._finished:
                break
            srv.step()
        assert ra in srv._finished
        rb = srv.submit(pb, max_new_tokens=5)
        done = srv.run()
    assert srv.prefix_hits == 1, srv.prefix_hits
    assert srv.prefix_rows_reused == 8, srv.prefix_rows_reused
    assert done[rb].tokens == want_b, (done[rb].tokens, want_b)


def test_prefix_cache_invalidated_on_weight_update():
    """A weight update (finetune/LoRA merge clears the model's weight
    cache) must kill prefix-cache donors: their rows were computed under
    the OLD weights, and a new request reusing them would silently
    decode against stale keys/values."""
    np.random.seed(26)
    model = Llama(**dict(CFG, max_seq_len=128))
    model.eval()
    with pdn.no_grad():
        srv = LlamaServer(model, batch_size=2, chunk=4, eos_id=-1,
                          lane="xla", prefix_cache=True)
        srv.submit(PA, max_new_tokens=30)       # long-lived donor
        srv.step()
        assert any(srv._resident)
        model._weights_cache.clear()            # what finetune_step does
        want_b = standalone(model, PB, 5)       # post-"update" truth
        rb = srv.submit(PB, max_new_tokens=5)
        done = srv.run()
    assert srv.prefix_hits == 0, srv.prefix_hits
    assert done[rb].tokens == want_b, (done[rb].tokens, want_b)


def test_submit_rejects_out_of_range_seed():
    """Seeds ship as int32 arrays in the admission wave; an overflowing
    seed must fail AT SUBMIT, not mid-serving after the slot was
    assigned (numpy 2.x raises OverflowError there, corrupting the
    fleet)."""
    np.random.seed(0)
    model = Llama(**CFG)
    model.eval()
    srv = LlamaServer(model, batch_size=2, lane="xla", eos_id=-1)
    with pytest.raises(ValueError, match="int32"):
        srv.submit([1, 2, 3], temperature=0.5, seed=2**31)
