"""Multi-device paths on the 8-virtual-CPU mesh: data-parallel pdn.jit,
mesh helpers, and the dp x tp SPMD llama train step."""
import numpy as np
import pytest
import jax

import pydynet_tpu as pdn
from pydynet_tpu import nn, optim
from pydynet_tpu.parallel import make_mesh, llama_spmd, shard

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices")


def _build(seed=0):
    np.random.seed(seed)
    net = nn.Sequential(nn.Linear(6, 16), nn.Tanh(), nn.Linear(16, 3))
    opt = optim.SGD(net.parameters(), lr=0.1, momentum=0.0, nesterov=False)
    return net, opt


def _make_step(net, opt):
    def step(x, y):
        opt.zero_grad()
        loss = pdn.nn.functional.mse_loss(net(x), y)
        loss.backward()
        opt.step()
        return loss

    return step


def test_data_parallel_jit_matches_single_device():
    np.random.seed(1)
    X = np.random.randn(32, 6)
    Y = np.random.randn(32, 3)

    net1, opt1 = _build()
    step1 = pdn.jit(_make_step(net1, opt1), state=(net1, opt1))
    losses1 = [float(step1(pdn.Tensor(X), pdn.Tensor(Y)).item())
               for _ in range(5)]

    mesh = make_mesh({"dp": 8})
    net2, opt2 = _build()  # same seed -> same init
    step2 = pdn.jit(_make_step(net2, opt2), state=(net2, opt2), mesh=mesh)
    losses2 = [float(step2(pdn.Tensor(X), pdn.Tensor(Y)).item())
               for _ in range(5)]

    assert np.allclose(losses1, losses2, rtol=1e-5), (losses1, losses2)
    for (n, p1), (_, p2) in zip(net1._parameters.items(),
                                net2._parameters.items()):
        assert np.allclose(p1.numpy(), p2.numpy(), atol=1e-5), n


def test_data_parallel_state_actually_sharded():
    mesh = make_mesh({"dp": 8})
    net, opt = _build()
    step = pdn.jit(_make_step(net, opt), state=(net, opt), mesh=mesh)
    x = pdn.Tensor(np.random.randn(16, 6))
    y = pdn.Tensor(np.random.randn(16, 3))
    step(x, y)
    w = net._parameters["0.weight"]._data
    assert len(w.sharding.device_set) == 8  # replicated over the mesh


def test_mesh_jit_non_batch_arg_replicated():
    """A rank>=1 arg whose dim 0 does NOT divide the dp size (per-class
    weights, masks) must be replicated, not force-sharded (regression:
    device_put crashed on non-divisible leading dims)."""
    np.random.seed(4)
    X = np.random.randn(16, 6)
    Y = np.random.randn(16, 3)
    cw = np.array([0.5, 1.0, 2.0])  # (3,): not divisible by dp=8

    def build_and_run(mesh):
        np.random.seed(7)
        net = pdn.nn.Linear(6, 3)
        opt = pdn.optim.SGD(net.parameters(), lr=0.1)

        def step(x, y, w):
            opt.zero_grad()
            err = pdn.square(net(x) - y) * w
            loss = pdn.mean(err)
            loss.backward()
            opt.step()
            return loss

        js = pdn.jit(step, state=(net, opt), mesh=mesh)
        return [float(js(pdn.Tensor(X), pdn.Tensor(Y),
                         pdn.Tensor(cw)).item()) for _ in range(3)]

    ref = build_and_run(None)
    got = build_and_run(make_mesh({"dp": 8}))
    assert np.allclose(ref, got, rtol=1e-6), (ref, got)


def test_foreach_composes_with_mesh():
    """Round-3: pdn.jit(step, mesh=...).foreach(Xb, Yb) — whole-epoch
    fusion AND dp sharding in ONE GSPMD program — must match the per-call
    mesh loop and the unsharded foreach."""
    np.random.seed(4)
    Xb = np.random.randn(5, 16, 6)
    Yb = np.random.randn(5, 16, 3)

    def run(mesh, use_foreach):
        net, opt = _build(seed=7)
        js = pdn.jit(_make_step(net, opt), state=(net, opt), mesh=mesh)
        if use_foreach:
            losses = js.foreach(pdn.Tensor(Xb),
                                pdn.Tensor(Yb)).numpy().reshape(-1)
        else:
            losses = np.array([
                float(js(pdn.Tensor(Xb[i]), pdn.Tensor(Yb[i])).item())
                for i in range(5)
            ])
        return losses, net

    mesh = make_mesh({"dp": 8})
    l_mesh_each, net_a = run(mesh, True)
    l_mesh_loop, net_b = run(mesh, False)
    l_plain_each, net_c = run(None, True)
    assert np.allclose(l_mesh_each, l_mesh_loop, rtol=1e-6), (
        l_mesh_each, l_mesh_loop)
    assert np.allclose(l_mesh_each, l_plain_each, rtol=1e-5), (
        l_mesh_each, l_plain_each)
    for (n, pa), (_, pb), (_, pc) in zip(net_a._parameters.items(),
                                         net_b._parameters.items(),
                                         net_c._parameters.items()):
        assert np.allclose(pa.numpy(), pb.numpy(), atol=1e-6), n
        assert np.allclose(pa.numpy(), pc.numpy(), atol=1e-5), n
    # the args really were dp-sharded over the per-step batch axis
    net, opt = _build(seed=7)
    js = pdn.jit(_make_step(net, opt), state=(net, opt), mesh=mesh)
    js.foreach(pdn.Tensor(Xb), pdn.Tensor(Yb))
    w = net._parameters["0.weight"]._data
    assert len(w.sharding.device_set) == 8


def test_foreach_mesh_with_tp_shard_rules():
    """foreach under a dp x tp mesh with tensor-parallel shard_rules stays
    loss-exact vs the single-device foreach."""
    np.random.seed(9)
    Xb = np.random.randn(4, 8, 6)
    Yb = np.random.randn(4, 8, 3)
    from jax.sharding import PartitionSpec as P

    rules = [("0.weight", P(None, "tp")), ("0.bias", P("tp")),
             ("2.weight", P("tp", None))]

    def run(mesh, shard_rules=None):
        net, opt = _build(seed=2)
        js = pdn.jit(_make_step(net, opt), state=(net, opt), mesh=mesh,
                     shard_rules=shard_rules)
        return js.foreach(pdn.Tensor(Xb),
                          pdn.Tensor(Yb)).numpy().reshape(-1), net

    ref, net0 = run(None)
    got, net1 = run(make_mesh({"dp": 2, "tp": 4}), rules)
    assert np.allclose(ref, got, rtol=1e-5), (ref, got)
    for (n, p0), (_, p1) in zip(net0._parameters.items(),
                                net1._parameters.items()):
        assert np.allclose(p0.numpy(), p1.numpy(), atol=1e-5), n
    w = net1._parameters["0.weight"]._data
    assert len(w.sharding.device_set) == 8


def test_llama_spmd_remat_matches_no_remat():
    """Activation checkpointing (remat=True wraps each layer in
    jax.checkpoint) must not change the loss trajectory — it only trades
    an extra recompute forward for O(1)-in-depth activation memory."""
    mesh = make_mesh({"dp": 4, "tp": 2})
    cfg = llama_spmd.config(vocab_size=64, dim=16, n_heads=2, ffn_dim=32,
                            n_layers=4, max_seq_len=16)
    rng = np.random.RandomState(0)
    tokens = shard(rng.randint(0, 64, (8, 8)).astype(np.int32), mesh,
                   "dp", None)
    targets = shard(rng.randint(0, 64, (8, 8)).astype(np.int32), mesh,
                    "dp", None)

    def run(remat):
        params = llama_spmd.shard_params(
            llama_spmd.init_params(np.random.RandomState(1), cfg), mesh)
        step = llama_spmd.make_train_step(mesh, cfg, lr=1e-1, remat=remat)
        out = []
        for _ in range(3):
            params, loss = step(params, tokens, targets)
            out.append(float(loss))
        return out

    plain, cp = run(False), run(True)
    assert np.allclose(plain, cp, rtol=1e-6), (plain, cp)
    assert cp[-1] < cp[0]


def test_mesh_helpers():
    mesh = make_mesh({"dp": 2, "tp": 4})
    assert mesh.shape == {"dp": 2, "tp": 4}
    x = shard(np.arange(16.0).reshape(8, 2), mesh, "dp", None)
    assert len(x.sharding.device_set) == 8
    with pytest.raises(ValueError):
        make_mesh({"dp": 99})


def test_hybrid_mesh_helpers():
    """Single-process degradation of the multi-host helpers: dcn axes of
    size 1 fall through to a local mesh (dcn-major axis order); a real dcn
    split is rejected without a multi-process job; initialize_distributed
    is a no-op in-process."""
    from pydynet_tpu.parallel import make_hybrid_mesh, initialize_distributed

    mesh = make_hybrid_mesh({"tp": 4, "dp": 2}, {"pp": 1})
    assert mesh.axis_names == ("pp", "tp", "dp")
    assert mesh.shape == {"pp": 1, "tp": 4, "dp": 2}
    x = shard(np.arange(16.0).reshape(8, 2), mesh, "tp", None)
    assert len(x.sharding.device_set) == 8

    with pytest.raises(ValueError, match="multi-process"):
        make_hybrid_mesh({"tp": 4}, {"dp": 2})
    with pytest.raises(ValueError, match="duplicate"):
        make_hybrid_mesh({"tp": 4}, {"tp": 2})

    initialize_distributed()  # must not raise in a single-process job

    # ...but a claimed multi-process job must fail LOUD when called after
    # the backend initialised (silent single-host degradation is the
    # worst failure mode on a pod)
    with pytest.raises(RuntimeError, match="before any JAX calls"):
        initialize_distributed("10.0.0.1:1234", 2, 0)


def test_llama_spmd_train_step_loss_decreases():
    mesh = make_mesh({"dp": 4, "tp": 2})
    cfg = llama_spmd.config(vocab_size=64, dim=16, n_heads=2, ffn_dim=32,
                            n_layers=2, max_seq_len=16)
    rng = np.random.RandomState(0)
    params = llama_spmd.shard_params(llama_spmd.init_params(rng, cfg), mesh)
    tokens = shard(rng.randint(0, 64, (8, 8)).astype(np.int32), mesh,
                   "dp", None)
    targets = shard(rng.randint(0, 64, (8, 8)).astype(np.int32), mesh,
                    "dp", None)
    step = llama_spmd.make_train_step(mesh, cfg, lr=1e-1)
    losses = []
    for _ in range(8):
        params, loss = step(params, tokens, targets)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    assert all(np.isfinite(losses))


def _llama_module_step(seed=0):
    from pydynet_tpu.models.llama.model import Llama

    np.random.seed(seed)
    net = Llama(vocab_size=64, embed_dim=16, n_heads=2, ffn_dim=32,
                max_seq_len=16, max_batch_size=4, n_layers=2,
                dtype=np.float32)
    net.train(True)
    opt = optim.Adam(net.parameters(), lr=1e-2)
    crit = nn.CrossEntropyLoss()

    def step(inp, tgt):
        opt.zero_grad()
        logits = net.forward_logits(inp, 0)
        B, L, V = logits.shape
        loss = crit(logits.reshape(B * L, V), tgt)
        loss.backward()
        opt.step()
        return loss

    return net, opt, step


def test_module_tp_rules_match_single_device():
    """A Llama *Module* trains dp x tp through pdn.jit(shard_rules=...) with
    the same losses as the unsharded compiled step (round-1 gap: mesh= was
    data-parallel only)."""
    from pydynet_tpu.parallel import LLAMA_TP_RULES

    rng = np.random.RandomState(0)
    inp = rng.randint(0, 64, (4, 8)).astype(np.int64)
    tgt = rng.randint(0, 64, (4 * 8,)).astype(np.int64)

    net1, opt1, step1 = _llama_module_step()
    js1 = pdn.jit(step1, state=(net1, opt1))
    losses1 = [float(js1(pdn.Tensor(inp), pdn.Tensor(tgt)).item())
               for _ in range(4)]

    mesh = make_mesh({"dp": 2, "tp": 2})
    net2, opt2, step2 = _llama_module_step()  # same seed -> same init
    js2 = pdn.jit(step2, state=(net2, opt2), mesh=mesh,
                  shard_rules=LLAMA_TP_RULES)
    losses2 = [float(js2(pdn.Tensor(inp), pdn.Tensor(tgt)).item())
               for _ in range(4)]

    assert np.allclose(losses1, losses2, rtol=1e-5, atol=1e-6), \
        (losses1, losses2)
    assert losses2[-1] < losses2[0]

    # the weights must ACTUALLY be tensor-sharded, not replicated
    q = net2._parameters["layers.0.attention.Q.weight"]._data
    assert q.sharding.spec == jax.sharding.PartitionSpec(None, "tp"), \
        q.sharding
    shard_shape = q.sharding.shard_shape(q.shape)
    assert shard_shape == (16, 8), shard_shape  # out dim halved over tp=2
    # optimizer moments are paired to THEIR parameter by identity —
    # O.weight is row-parallel P('tp', None) with the same (dim, dim) shape
    # as the column-parallel Q.weight, so a shape-based heuristic would
    # mis-place one of the two (regression for the by-shape inheritance)
    def moment_of(pname):
        p = net2._parameters[pname]
        return opt2.m[[id(q) for q in opt2.params].index(id(p))], p

    for pname in ("layers.0.attention.Q.weight",
                  "layers.0.attention.O.weight"):
        m, p = moment_of(pname)
        assert m._data.sharding.spec == p._data.sharding.spec, pname
    _, o_p = moment_of("layers.0.attention.O.weight")
    assert o_p._data.sharding.spec == jax.sharding.PartitionSpec("tp", None)


def test_shard_rules_survive_optimizer_first_state_order():
    """Regression: state=(opt, net) collected the params UNNAMED through
    the optimizer first, and the later module visit was deduped — so
    shard_rules silently never matched and everything replicated."""
    from pydynet_tpu.parallel import LLAMA_TP_RULES

    mesh = make_mesh({"dp": 2, "tp": 2})
    net, opt, step = _llama_module_step()
    js = pdn.jit(step, state=(opt, net), mesh=mesh,  # optimizer FIRST
                 shard_rules=LLAMA_TP_RULES)
    rng = np.random.RandomState(0)
    inp = rng.randint(0, 64, (4, 8)).astype(np.int64)
    tgt = rng.randint(0, 64, (4 * 8,)).astype(np.int64)
    js(pdn.Tensor(inp), pdn.Tensor(tgt))
    q = net._parameters["layers.0.attention.Q.weight"]._data
    assert q.sharding.spec == jax.sharding.PartitionSpec(None, "tp"),         q.sharding


@pytest.mark.parametrize("dp,tp", [(1, 2), (2, 2), (1, 1)])
def test_llama_spmd_generate_matches_single_device(dp, tp):
    """tp/dp-sharded greedy decode is token-identical to the unsharded run."""
    cfg = llama_spmd.config(vocab_size=64, dim=16, n_heads=2, ffn_dim=32,
                            n_layers=2, max_seq_len=32)
    rng = np.random.RandomState(3)
    params = llama_spmd.init_params(rng, cfg)
    prompt = rng.randint(0, 64, (2 * dp, 5)).astype(np.int32)

    ref_mesh = make_mesh({"dp": 1, "tp": 1})
    want = llama_spmd.generate(llama_spmd.shard_params(params, ref_mesh),
                               prompt, 9, ref_mesh, cfg)

    mesh = make_mesh({"dp": dp, "tp": tp})
    got = llama_spmd.generate(llama_spmd.shard_params(params, mesh),
                              prompt, 9, mesh, cfg)
    assert got.shape == (2 * dp, 9)
    assert np.array_equal(got, want), (got, want)


def test_llama_spmd_generate_consistent_with_train_forward():
    """The cache-threaded decode forward agrees with the full-sequence
    training forward (teacher-forced greedy chain)."""
    import jax.numpy as jnp

    cfg = llama_spmd.config(vocab_size=32, dim=16, n_heads=2, ffn_dim=32,
                            n_layers=2, max_seq_len=16)
    rng = np.random.RandomState(7)
    params = llama_spmd.init_params(rng, cfg)
    mesh = make_mesh({"dp": 1, "tp": 2})
    prompt = rng.randint(0, 32, (1, 4)).astype(np.int32)
    n_new = 6
    got = llama_spmd.generate(llama_spmd.shard_params(params, mesh),
                              prompt, n_new, mesh, cfg)

    # greedy chain via the (unsharded) full-sequence training forward
    seq = prompt.copy()
    for _ in range(n_new):
        logits = llama_spmd.forward_logits(params, jnp.asarray(seq), cfg)
        nxt = int(np.argmax(np.asarray(logits)[0, -1]))
        seq = np.concatenate([seq, [[nxt]]], axis=1)
    assert np.array_equal(got[0], seq[0, 4:]), (got, seq)


@pytest.mark.parametrize("axes,micro", [({"pp": 4}, 4), ({"pp": 2}, 8),
                                        ({"dp": 2, "pp": 4}, 2)])
def test_pipeline_train_matches_single_device(axes, micro):
    """GPipe pipeline (shard_map + ppermute ring) over pp — optionally
    composed with dp — must reproduce the single-device losses exactly
    (microbatching is mathematically a no-op for the batch-mean loss)."""
    from pydynet_tpu.parallel import pipeline

    cfg = llama_spmd.config(vocab_size=64, dim=16, n_heads=2, ffn_dim=32,
                            n_layers=4, max_seq_len=16)
    rng = np.random.RandomState(0)
    tokens = rng.randint(0, 64, (8, 8)).astype(np.int32)
    targets = rng.randint(0, 64, (8, 8)).astype(np.int32)

    def fresh_params():
        # each side gets its OWN buffers: the donating reference step would
        # otherwise delete shards the pipeline params alias (device_put of a
        # replicated spec reuses the source buffer on overlapping devices)
        return llama_spmd.init_params(np.random.RandomState(1), cfg)

    mesh = make_mesh(axes)
    n_stages = axes["pp"]
    pparams = pipeline.shard_stage_params(
        pipeline.stack_stages(fresh_params(), n_stages), mesh)

    # single-device reference trajectory (plain GSPMD step on a 1x1 mesh)
    ref_mesh = make_mesh({"dp": 1, "tp": 1})
    ref_params = llama_spmd.shard_params(fresh_params(), ref_mesh)
    ref_step = llama_spmd.make_train_step(ref_mesh, cfg, lr=1e-1)
    want = []
    for _ in range(3):
        ref_params, loss = ref_step(
            ref_params, jax.numpy.asarray(tokens), jax.numpy.asarray(targets))
        want.append(float(loss))
    step = pipeline.make_pp_train_step(mesh, cfg, lr=1e-1, microbatches=micro)
    got = []
    for _ in range(3):
        pparams, loss = step(pparams, jax.numpy.asarray(tokens),
                             jax.numpy.asarray(targets))
        got.append(float(loss))

    assert np.allclose(got, want, rtol=1e-5, atol=1e-6), (got, want)
    assert got[-1] < got[0]


@pytest.mark.parametrize("axes,micro", [({"pp": 2, "tp": 2}, 4),
                                        ({"dp": 2, "pp": 2, "tp": 2}, 2)])
def test_pipeline_tp_train_matches_single_device(axes, micro):
    """tp INSIDE the pp shard_map region (manual Megatron psums, head-split
    weights) — optionally x dp — must reproduce the single-device loss
    trajectory exactly.  Three steps also validate the gradients through
    the hand-written collectives (a wrong psum transpose would diverge the
    trajectory at step 2)."""
    from pydynet_tpu.parallel import pipeline

    cfg = llama_spmd.config(vocab_size=64, dim=16, n_heads=2, ffn_dim=32,
                            n_layers=4, max_seq_len=16)
    rng = np.random.RandomState(3)
    tokens = rng.randint(0, 64, (8, 8)).astype(np.int32)
    targets = rng.randint(0, 64, (8, 8)).astype(np.int32)

    def fresh_params():
        return llama_spmd.init_params(np.random.RandomState(4), cfg)

    ref_mesh = make_mesh({"dp": 1, "tp": 1})
    ref_params = llama_spmd.shard_params(fresh_params(), ref_mesh)
    ref_step = llama_spmd.make_train_step(ref_mesh, cfg, lr=1e-1)
    want = []
    for _ in range(3):
        ref_params, loss = ref_step(
            ref_params, jax.numpy.asarray(tokens), jax.numpy.asarray(targets))
        want.append(float(loss))

    mesh = make_mesh(axes)
    pparams = pipeline.prepare_pp_params(fresh_params(), mesh, axes["pp"])
    step = pipeline.make_pp_train_step(mesh, cfg, lr=1e-1, microbatches=micro)
    got = []
    for _ in range(3):
        pparams, loss = step(pparams, jax.numpy.asarray(tokens),
                             jax.numpy.asarray(targets))
        got.append(float(loss))

    assert np.allclose(got, want, rtol=1e-5, atol=1e-6), (got, want)
    assert got[-1] < got[0]

    # the layer weights really are tp-sharded (not replicated)
    tp_shard = pparams["wq"].sharding.spec
    assert "tp" in tuple(tp_shard), tp_shard


@pytest.mark.parametrize("n_heads,n_kv_heads,tp", [
    (4, 2, 2),   # kv group-sharded: Hkv % tp == 0, one kv head per rank
    (4, 1, 2),   # kv replicated: tp > Hkv, ranks gather their groups
    (8, 2, 4),   # wider split, kv replicated (tp > Hkv)
])
def test_pipeline_tp_gqa_train_matches_single_device(n_heads, n_kv_heads,
                                                     tp):
    """Round-3: tp inside the pp ring for GQA layouts (kv heads group-
    sharded when Hkv % tp == 0, replicated otherwise) — dp x pp x tp must
    reproduce the single-device GQA loss trajectory exactly."""
    from pydynet_tpu.parallel import pipeline

    cfg = llama_spmd.config(vocab_size=64, dim=16 * n_heads // 4,
                            n_heads=n_heads, ffn_dim=32, n_layers=4,
                            max_seq_len=16, n_kv_heads=n_kv_heads)
    rng = np.random.RandomState(3)
    tokens = rng.randint(0, 64, (8, 8)).astype(np.int32)
    targets = rng.randint(0, 64, (8, 8)).astype(np.int32)

    def fresh_params():
        return llama_spmd.init_params(np.random.RandomState(4), cfg)

    ref_mesh = make_mesh({"dp": 1, "tp": 1})
    ref_params = llama_spmd.shard_params(fresh_params(), ref_mesh)
    ref_step = llama_spmd.make_train_step(ref_mesh, cfg, lr=1e-1)
    want = []
    for _ in range(3):
        ref_params, loss = ref_step(
            ref_params, jax.numpy.asarray(tokens), jax.numpy.asarray(targets))
        want.append(float(loss))

    axes = {"dp": 8 // (2 * tp), "pp": 2, "tp": tp}
    mesh = make_mesh(axes)
    pparams = pipeline.prepare_pp_params(fresh_params(), mesh, axes["pp"],
                                         cfg=cfg)
    step = pipeline.make_pp_train_step(mesh, cfg, lr=1e-1, microbatches=2)
    got = []
    for _ in range(3):
        pparams, loss = step(pparams, jax.numpy.asarray(tokens),
                             jax.numpy.asarray(targets))
        got.append(float(loss))

    assert np.allclose(got, want, rtol=1e-5, atol=1e-6), (got, want)
    assert got[-1] < got[0]
    # query projections always tp-sharded; kv per the placement rule
    assert "tp" in tuple(pparams["wq"].sharding.spec)
    kv_spec = tuple(pparams["wk"].sharding.spec)
    if n_kv_heads % tp == 0:
        assert "tp" in kv_spec, kv_spec
    else:
        assert "tp" not in kv_spec, kv_spec

    # GQA without cfg= must fail loudly, not mis-shard
    with pytest.raises(ValueError, match="cfg"):
        pipeline.prepare_pp_params(fresh_params(), mesh, axes["pp"])


def test_pipeline_apply_identity_routing():
    """Each microbatch must traverse every stage exactly once, in order."""
    from pydynet_tpu.parallel.pipeline import pipeline_apply, shard_map

    mesh = make_mesh({"pp": 4})
    from jax.sharding import PartitionSpec as P

    # stage p adds 10**p: after 4 stages every element gains 1111
    stage_marks = np.array([1.0, 10.0, 100.0, 1000.0])[:, None]

    def run(marks, x):
        return pipeline_apply(lambda m, h: h + m[0], marks, x,
                              axis="pp", n_stages=4)

    x = np.arange(12.0).reshape(6, 2)  # 6 microbatches of 2
    got = shard_map(run, mesh=mesh, in_specs=(P("pp"), P()),
                    out_specs=P(), check_vma=False)(stage_marks, x)
    assert np.allclose(np.asarray(got), x + 1111.0), got


def test_moe_matches_per_token_reference():
    """GShard dense-dispatch switch MoE == per-token routing loop."""
    from pydynet_tpu.parallel import moe
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    T, D, F, E = 32, 8, 16, 4
    params = moe.init_moe_params(rng, E, D, F)
    x = jnp.asarray(rng.standard_normal((T, D)), jnp.float32)

    out, aux = moe.moe_ffn(params, x)
    want = moe.moe_ffn_reference(params, x)
    assert np.allclose(np.asarray(out), want, atol=1e-5), \
        np.abs(np.asarray(out) - want).max()
    assert np.isfinite(float(aux)) and float(aux) > 0


def test_moe_capacity_drops_tokens():
    from pydynet_tpu.parallel import moe
    import jax.numpy as jnp

    rng = np.random.RandomState(1)
    T, D, F, E = 16, 8, 16, 4
    params = moe.init_moe_params(rng, E, D, F)
    # route EVERY token to expert 0: a zero router makes all logits tie and
    # argmax resolve to expert 0 for every token
    params = dict(params)
    params["wg"] = jax.numpy.zeros_like(params["wg"])
    x = jnp.asarray(rng.standard_normal((T, D)), jnp.float32)
    out, _ = moe.moe_ffn(params, x, capacity_factor=1.0)  # C = 4
    want = moe.moe_ffn_reference(params, x, capacity_factor=1.0)
    nz = np.any(np.asarray(out) != 0, axis=-1)
    assert nz.sum() == moe.capacity(T, E, 1.0)  # only C tokens served
    assert np.allclose(np.asarray(out), want, atol=1e-5)


def test_moe_expert_parallel_matches_unsharded():
    """Experts sharded over ep (GSPMD partitions the dispatch einsums) must
    be numerically identical to the unsharded run, and grads must flow."""
    from pydynet_tpu.parallel import moe
    import jax.numpy as jnp

    rng = np.random.RandomState(2)
    T, D, F, E = 64, 8, 16, 8
    params = moe.init_moe_params(rng, E, D, F)
    x = jnp.asarray(rng.standard_normal((T, D)), jnp.float32)
    want, _ = moe.moe_ffn(params, x)

    mesh = make_mesh({"ep": 8})
    sharded = moe.shard_moe_params(params, mesh)

    @jax.jit
    def f(p, x):
        return moe.moe_ffn(p, x)

    got, aux = f(sharded, x)
    assert np.allclose(np.asarray(got), np.asarray(want), atol=1e-5)
    assert len(got.sharding.device_set) >= 1

    def loss(p, x):
        out, aux = moe.moe_ffn(p, x)
        return jnp.sum(out ** 2) + 0.01 * aux

    g = jax.jit(jax.grad(loss))(sharded, x)
    for k in ("wg", "w1", "w2"):
        arr = np.asarray(g[k])
        assert np.isfinite(arr).all() and np.abs(arr).max() > 0, k


def test_graft_entry_dryrun():
    from __graft_entry__ import dryrun_multichip
    dryrun_multichip(8)


@pytest.mark.parametrize("causal", [True, False])
def test_ring_attention_matches_dense(causal):
    from pydynet_tpu.parallel import ring_attention
    from pydynet_tpu.ops import flash_attention as fa
    import jax.numpy as jnp

    mesh = make_mesh({"sp": 8})
    rng = np.random.default_rng(0)
    B, L, H, d = 2, 64, 2, 16  # L/8 = 8 tokens per device
    q = jnp.asarray(rng.standard_normal((B, L, H, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, L, H, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, L, H, d)), jnp.float32)

    mask = None
    if causal:
        mask = jnp.where(
            jnp.arange(L)[:, None] >= jnp.arange(L)[None, :], 0.0, -jnp.inf)
    want = fa.mha_reference(q, k, v, mask)

    qs = shard(q, mesh, None, "sp")
    ks = shard(k, mesh, None, "sp")
    vs = shard(v, mesh, None, "sp")
    got = ring_attention(qs, ks, vs, mesh, causal=causal)
    assert np.allclose(np.asarray(got), np.asarray(want), atol=2e-5), \
        np.abs(np.asarray(got) - np.asarray(want)).max()
    # output stays sequence-sharded
    assert len(got.sharding.device_set) == 8


def test_ring_attention_under_jit_and_grad():
    from pydynet_tpu.parallel import ring_attention
    import jax
    import jax.numpy as jnp

    mesh = make_mesh({"sp": 4})
    rng = np.random.default_rng(1)
    B, L, H, d = 1, 32, 2, 8
    q = jnp.asarray(rng.standard_normal((B, L, H, d)), jnp.float32)

    def loss(q, k, v):
        return jnp.sum(ring_attention(q, k, v, mesh, causal=True) ** 2)

    g = jax.jit(jax.grad(loss))(q, q, q)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0


@pytest.mark.parametrize("dp,tp", [(1, 2), (2, 2)])
def test_llama_spmd_gqa_generate_and_train(dp, tp):
    """GQA config through the GSPMD paths: sharded decode token-identical
    to the unsharded forward, and the train step decreases a finite loss."""
    cfg = llama_spmd.config(vocab_size=64, dim=16, n_heads=4, n_kv_heads=2,
                            ffn_dim=32, n_layers=2, max_seq_len=32)
    rng = np.random.RandomState(5)
    params = llama_spmd.init_params(rng, cfg)
    prompt = rng.randint(0, 64, (2 * dp, 5)).astype(np.int32)

    ref_mesh = make_mesh({"dp": 1, "tp": 1})
    want = llama_spmd.generate(llama_spmd.shard_params(params, ref_mesh),
                               prompt, 9, ref_mesh, cfg)
    mesh = make_mesh({"dp": dp, "tp": tp})
    got = llama_spmd.generate(llama_spmd.shard_params(params, mesh),
                              prompt, 9, mesh, cfg)
    assert np.array_equal(got, want), (got, want)

    sp = llama_spmd.shard_params(llama_spmd.init_params(rng, cfg), mesh)
    step = llama_spmd.make_train_step(mesh, cfg, lr=1e-2)
    tokens = jax.numpy.asarray(rng.randint(0, 64, (4 * dp, 8)), jax.numpy.int32)
    losses = []
    for _ in range(3):
        sp, loss = step(sp, tokens, tokens)
        losses.append(float(loss))
    assert np.isfinite(losses).all() and losses[-1] < losses[0]
