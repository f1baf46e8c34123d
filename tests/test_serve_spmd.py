"""Multi-chip continuous-batching server (parallel/serve_spmd.py) on the
8-virtual-device CPU mesh: the SPMD decode serves the same shared-position
slot protocol as the single-chip server, token-exact against the Llama
module's own scan-lane ``generate`` — which also pins the
``params_from_model`` module -> SPMD-pytree bridge end-to-end.
"""
import numpy as np
import pytest

import pydynet_tpu as pdn
from pydynet_tpu.models.llama.model import Llama
from pydynet_tpu.parallel import make_mesh
from pydynet_tpu.parallel.serve_spmd import SpmdLlamaServer, params_from_model

CFG = dict(vocab_size=256, embed_dim=32, n_heads=4, ffn_dim=64,
           max_seq_len=64, max_batch_size=2, n_layers=2, dtype=np.float32)


def standalone(model, prompt, n_new):
    with pdn.no_grad():
        return [int(t.numpy()[0, 0])
                for t in model.generate(np.asarray([prompt]),
                                        len(prompt) + n_new, fused=False)]


@pytest.mark.parametrize("axes,B", [({"dp": 2, "tp": 4}, 2),
                                    ({"dp": 8}, 8), ({"tp": 8}, 2)])
def test_spmd_server_matches_module_generate(axes, B):
    """Mid-stream admission + slot recycling over dp x tp / dp-only /
    tp-only meshes: every request's stream equals single-chip greedy
    generate (f32 — bit-identical math, only summation order differs).
    The B=2 meshes recycle slots (starts-mask path); the dp-only mesh
    runs B=8 slots (dp must divide the fleet) without recycling."""
    np.random.seed(31)
    model = Llama(**CFG)
    model.eval()
    prompts = [[1, 5, 9], [2, 7, 3, 11], [30, 20], [4, 4, 4, 4, 4]]
    want = [standalone(model, p, 8) for p in prompts]

    mesh = make_mesh(axes)
    with pdn.no_grad():
        srv = SpmdLlamaServer(model, mesh, batch_size=B, chunk=4,
                              eos_id=-1)
        rids = [srv.submit(p, max_new_tokens=8) for p in prompts]
        done = srv.run()
    assert set(done) == set(rids)
    for rid, exp in zip(rids, want):
        assert done[rid].tokens == exp, (axes, done[rid].tokens, exp)
    if B == 2:
        assert len(prompts) > srv.B  # recycling (starts mask) really ran


def test_spmd_server_gqa():
    """GQA config through the mesh server (kv heads narrower than tp)."""
    cfg = dict(CFG, n_heads=4, n_kv_heads=2)
    np.random.seed(32)
    model = Llama(**cfg)
    model.eval()
    prompts = [[1, 5, 9], [2, 7, 3]]
    want = [standalone(model, p, 6) for p in prompts]
    mesh = make_mesh({"dp": 2, "tp": 4})
    with pdn.no_grad():
        srv = SpmdLlamaServer(model, mesh, batch_size=2, chunk=4,
                              eos_id=-1)
        rids = [srv.submit(p, max_new_tokens=6) for p in prompts]
        done = srv.run()
    for rid, exp in zip(rids, want):
        assert done[rid].tokens == exp, (done[rid].tokens, exp)


def test_spmd_server_params_pair_and_validation():
    """(params, cfg) construction path + the dp-divisibility guard."""
    np.random.seed(33)
    model = Llama(**CFG)
    model.eval()
    params, cfg = params_from_model(model)
    mesh = make_mesh({"dp": 2, "tp": 4})
    want = standalone(model, [3, 1, 4], 5)
    with pdn.no_grad():
        srv = SpmdLlamaServer(params, mesh, cfg=cfg, batch_size=2,
                              chunk=4, eos_id=-1)
        rid = srv.submit([3, 1, 4], max_new_tokens=5)
        done = srv.run()
    assert done[rid].tokens == want
    with pytest.raises(ValueError, match="divisible"):
        SpmdLlamaServer(params, mesh, cfg=cfg, batch_size=3)


def test_spmd_server_eos_and_truncation():
    """EOS finishes a request without emitting it; cache exhaustion
    truncates the fleet and rewinds for the queue."""
    np.random.seed(34)
    model = Llama(**CFG)
    model.eval()
    mesh = make_mesh({"dp": 2, "tp": 4})
    with pdn.no_grad():
        srv = SpmdLlamaServer(model, mesh, batch_size=2, chunk=4,
                              eos_id=-1)  # no EOS: run to max_new
        ra = srv.submit([1, 2, 3], max_new_tokens=1000)  # hits cache end
        done = srv.run()
    assert done[ra].truncated
    assert len(done[ra].tokens) == CFG["max_seq_len"] - 3 + 1

    # EOS: pick the first greedy token as eos -> zero-token result
    want = standalone(model, [5, 6], 1)
    with pdn.no_grad():
        srv = SpmdLlamaServer(model, mesh, batch_size=2, chunk=4,
                              eos_id=want[0])
        rb = srv.submit([5, 6], max_new_tokens=8)
        done = srv.run()
    assert done[rb].tokens == [] and done[rb].done


def test_spmd_server_seeded_sampling_reproduces():
    """Per-request sampling on the mesh server: a seeded request's
    stream is a pure function of (prompt, params, seed) — reproduced on
    a fresh server with different co-tenants, slot layout, and server
    seed (the single-chip server's contract, same key derivation)."""
    np.random.seed(35)
    model = Llama(**CFG)
    model.eval()
    mesh = make_mesh({"dp": 2, "tp": 4})
    prompt = [1, 6, 2]

    def run_fleet(extra, server_seed):
        with pdn.no_grad():
            srv = SpmdLlamaServer(model, mesh, batch_size=2, chunk=4,
                                  eos_id=-1, seed=server_seed)
            for p in extra:
                srv.submit(p, max_new_tokens=6, temperature=0.7, top_k=9)
            rid = srv.submit(prompt, max_new_tokens=8, temperature=0.9,
                             top_k=17, top_p=0.95, seed=1234)
            done = srv.run()
        return done[rid].tokens

    a = run_fleet([], server_seed=0)
    b = run_fleet([[7, 7], [3, 1, 4, 1, 5]], server_seed=42)
    assert a == b and len(a) == 8, (a, b)


# ---------------- quant + prefix cache on the mesh ------------------- #

PA = [1, 5, 9, 4, 7, 2, 8, 3, 6, 1, 2, 4]          # 12 tokens
PB = PA[:10] + [7, 5]                               # lcp 10 -> kb 8


@pytest.mark.parametrize("quant", ["int8", "int4"])
def test_spmd_server_quant_exact_across_meshes(quant):
    """Weight-only quantized mesh serving (llama_spmd.quantize_params):
    the dp x tp stream equals the SAME quantized program on a 1-device
    mesh — GSPMD partitioning is value-preserving, so tp x quant compose
    without re-deriving the math (quant itself is lossy vs dense, which
    is the single-chip lane's already-pinned contract)."""
    np.random.seed(41)
    model = Llama(**CFG)
    model.eval()
    prompts = [[1, 5, 9], [2, 7, 3, 11], [30, 20]]

    def run_mesh(axes):
        mesh = make_mesh(axes)
        with pdn.no_grad():
            srv = SpmdLlamaServer(model, mesh, batch_size=2, chunk=4,
                                  eos_id=-1, quant=quant)
            rids = [srv.submit(p, max_new_tokens=8) for p in prompts]
            done = srv.run()
        return [done[r].tokens for r in rids]

    a = run_mesh({"dp": 2, "tp": 4})
    b = run_mesh({"dp": 1})
    assert a == b, (quant, a, b)
    assert all(len(t) == 8 for t in a)


def test_spmd_server_prefix_cache_reuses_and_matches():
    """prefix_cache=True on the mesh: the donor-row reuse admission
    (suffix-only prefill on the GSPMD forward) emits exactly the
    standalone generate stream, and the hit counters prove the reuse
    path actually ran."""
    np.random.seed(42)
    model = Llama(**dict(CFG, max_seq_len=128))
    model.eval()
    want_a = standalone(model, PA, 6)
    want_b = standalone(model, PB, 6)
    mesh = make_mesh({"dp": 2, "tp": 4})
    with pdn.no_grad():
        srv = SpmdLlamaServer(model, mesh, batch_size=2, chunk=4,
                              eos_id=-1, prefix_cache=True)
        ra = srv.submit(PA, max_new_tokens=6)
        srv.step()  # admit A alone so its rows become donor material
        rb = srv.submit(PB, max_new_tokens=6)
        done = srv.run()
    assert srv.prefix_hits == 1 and srv.prefix_rows_reused == 8, \
        (srv.prefix_hits, srv.prefix_rows_reused)
    assert srv._finished[ra].tokens == want_a
    assert srv._finished[rb].tokens == want_b, \
        (srv._finished[rb].tokens, want_b)


def test_spmd_server_quant_prefix_compose():
    """quant= and prefix_cache= together on the mesh: the reuse
    admission's stream equals the same quantized mesh server WITHOUT
    reuse (the donor rows are bit-identical to what B's own quantized
    prefill would have written)."""
    np.random.seed(43)
    model = Llama(**dict(CFG, max_seq_len=128))
    model.eval()
    mesh = make_mesh({"dp": 2, "tp": 4})

    def serve_b(prefix_cache, warm):
        with pdn.no_grad():
            srv = SpmdLlamaServer(model, mesh, batch_size=2, chunk=4,
                                  eos_id=-1, quant="int8",
                                  prefix_cache=prefix_cache)
            if warm:
                srv.submit(PA, max_new_tokens=6)
                srv.step()
            rb = srv.submit(PB, max_new_tokens=8)
            srv.run()
            if prefix_cache and warm:
                assert srv.prefix_hits == 1, srv.prefix_hits
            return srv._finished[rb].tokens

    assert serve_b(True, warm=True) == serve_b(False, warm=False)


def test_spmd_server_mixed_fleet_greedy_rows_exact():
    """A mixed fleet (one sampled, one greedy request) shares the
    sampled chunk program; the greedy row resolves to exact argmax —
    token-identical to single-chip generate."""
    np.random.seed(36)
    model = Llama(**CFG)
    model.eval()
    mesh = make_mesh({"dp": 2, "tp": 4})
    pg = [2, 7, 3, 11]
    want = standalone(model, pg, 8)
    with pdn.no_grad():
        srv = SpmdLlamaServer(model, mesh, batch_size=2, chunk=4,
                              eos_id=-1)
        srv.submit([1, 5, 9], max_new_tokens=8, temperature=0.8, seed=3)
        rg = srv.submit(pg, max_new_tokens=8)  # greedy row
        done = srv.run()
    assert done[rg].tokens == want, (done[rg].tokens, want)


def test_spmd_server_kv_quant_matches_module_generate():
    """int8-KV serving on the mesh (tuple (data, scale) caches through
    llama_spmd.forward_tokens): the dp x tp stream equals single-chip
    ``generate(fused=False, kv_quant="int8")`` — the mesh admission's
    tuple-transient prefill attends quantized rows exactly like the
    standalone scan lane, and GSPMD partitioning is value-preserving."""
    np.random.seed(44)
    model = Llama(**CFG)
    model.eval()
    prompts = [[1, 5, 9], [2, 7, 3], [30, 20]]
    with pdn.no_grad():
        want = [[int(t.numpy()[0, 0])
                 for t in model.generate(np.asarray([p]), len(p) + 6,
                                         fused=False, kv_quant="int8")]
                for p in prompts]

    mesh = make_mesh({"dp": 2, "tp": 4})
    with pdn.no_grad():
        srv = SpmdLlamaServer(model, mesh, batch_size=2, chunk=4,
                              eos_id=-1, kv_quant="int8")
        rids = [srv.submit(p, max_new_tokens=6) for p in prompts]
        done = srv.run()
    for rid, exp in zip(rids, want):
        assert done[rid].tokens == exp, (done[rid].tokens, exp)


def test_spmd_server_kv_quant_quant_prefix_compose():
    """The FULL 7B serving configuration on the mesh: weight int4 x
    int8 KV x prefix_cache in one server — the reuse admission's stream
    equals the same server without reuse, and the counters prove the
    donor path ran."""
    np.random.seed(45)
    model = Llama(**dict(CFG, max_seq_len=128))
    model.eval()
    mesh = make_mesh({"dp": 2, "tp": 4})

    def serve_b(prefix_cache, warm):
        with pdn.no_grad():
            srv = SpmdLlamaServer(model, mesh, batch_size=2, chunk=4,
                                  eos_id=-1, quant="int4",
                                  kv_quant="int8",
                                  prefix_cache=prefix_cache)
            if warm:
                srv.submit(PA, max_new_tokens=6)
                srv.step()
            rb = srv.submit(PB, max_new_tokens=8)
            srv.run()
            if prefix_cache and warm:
                assert srv.prefix_hits == 1, srv.prefix_hits
            return srv._finished[rb].tokens

    assert serve_b(True, warm=True) == serve_b(False, warm=False)
