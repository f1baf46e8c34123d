"""Orbax-backed sharded checkpointing: save a GSPMD train state, mutate,
restore — bitwise state AND sharding equality on the 8-virtual-CPU mesh.

Extension beyond the reference (its only persistence is single-host npz,
llm/llama/io.py:42-57)."""
import numpy as np
import pytest
import jax
from jax.sharding import PartitionSpec as P

import pydynet_tpu as pdn
from pydynet_tpu import nn, optim
from pydynet_tpu.parallel import make_mesh
from pydynet_tpu.utils import save_sharded, load_sharded

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices")

RULES = [("0.weight", P(None, "tp")), ("0.bias", P("tp")),
         ("2.weight", P("tp", None))]


def _build(seed=0):
    np.random.seed(seed)
    net = nn.Sequential(nn.Linear(6, 16), nn.Tanh(), nn.Linear(16, 3))
    opt = optim.Adam(net.parameters(), lr=1e-2)
    return net, opt


def _make_step(net, opt):
    def step(x, y):
        opt.zero_grad()
        loss = pdn.nn.functional.mse_loss(net(x), y)
        loss.backward()
        opt.step()
        return loss

    return step


def _snap(net, opt):
    state = {n: p.numpy().copy() for n, p in net._parameters.items()}
    for buf_name in ("v", "m", "G"):
        for i, b in enumerate(getattr(opt, buf_name, []) or []):
            state[f"opt.{buf_name}.{i}"] = b.numpy().copy()
    return state


def test_sharded_round_trip_exact_resume(tmp_path):
    mesh = make_mesh({"dp": 2, "tp": 4})
    np.random.seed(11)
    X, Y = np.random.randn(16, 6), np.random.randn(16, 3)

    net, opt = _build(seed=3)
    js = pdn.jit(_make_step(net, opt), state=(net, opt), mesh=mesh,
                 shard_rules=RULES)
    for _ in range(3):
        js(pdn.Tensor(X), pdn.Tensor(Y))

    w_sharding = net._parameters["0.weight"]._data.sharding
    save_sharded(str(tmp_path / "ckpt"), net, opt, step=3)
    ref = _snap(net, opt)
    ref_losses = [float(js(pdn.Tensor(X), pdn.Tensor(Y)).item())
                  for _ in range(3)]

    # keep training (diverges), then restore and replay
    step = load_sharded(str(tmp_path / "ckpt"), net, opt)
    assert step == 3
    for name, want in ref.items():
        if name.startswith("opt."):
            continue
        got = net._parameters[name].numpy()
        np.testing.assert_array_equal(got, want, err_msg=name)
    # restored INTO the live sharding, not replicated
    w = net._parameters["0.weight"]._data
    assert w.sharding.is_equivalent_to(w_sharding, ndim=w.ndim)

    got_losses = [float(js(pdn.Tensor(X), pdn.Tensor(Y)).item())
                  for _ in range(3)]
    assert got_losses == ref_losses, (got_losses, ref_losses)


def test_sharded_restore_into_fresh_model(tmp_path):
    mesh = make_mesh({"dp": 2, "tp": 4})
    np.random.seed(12)
    X, Y = np.random.randn(16, 6), np.random.randn(16, 3)

    net, opt = _build(seed=5)
    js = pdn.jit(_make_step(net, opt), state=(net, opt), mesh=mesh,
                 shard_rules=RULES)
    losses = [float(js(pdn.Tensor(X), pdn.Tensor(Y)).item())
              for _ in range(4)]
    save_sharded(str(tmp_path / "ckpt"), net, opt, step=4)

    net2, opt2 = _build(seed=99)  # different init
    js2 = pdn.jit(_make_step(net2, opt2), state=(net2, opt2), mesh=mesh,
                  shard_rules=RULES)
    js2(pdn.Tensor(X), pdn.Tensor(Y))  # materialize sharded state
    step = load_sharded(str(tmp_path / "ckpt"), net2, opt2)
    assert step == 4
    cont1 = [float(js(pdn.Tensor(X), pdn.Tensor(Y)).item())
             for _ in range(2)]
    cont2 = [float(js2(pdn.Tensor(X), pdn.Tensor(Y)).item())
             for _ in range(2)]
    assert cont1 == cont2, (cont1, cont2)
    assert losses[-1] < losses[0]


def test_sharded_async_save(tmp_path):
    net, opt = _build(seed=6)
    # unsharded state saves/loads through the same path
    ck = save_sharded(str(tmp_path / "ckpt"), net, opt, step=1,
                      async_save=True)
    ck.wait_until_finished()
    net2, _ = _build(seed=7)
    step = load_sharded(str(tmp_path / "ckpt"), net2, None)
    assert step == 1
    for (n, p1), (_, p2) in zip(net._parameters.items(),
                                net2._parameters.items()):
        np.testing.assert_array_equal(p1.numpy(), p2.numpy(), err_msg=n)


def test_sharded_tree_llama_spmd_resume(tmp_path):
    """Raw-pytree save/load over the dp x tp GSPMD llama params: restore
    mid-run, shardings preserved, trajectory continues loss-exact."""
    from pydynet_tpu.parallel import llama_spmd, shard
    from pydynet_tpu.utils import save_sharded_tree, load_sharded_tree

    mesh = make_mesh({"dp": 4, "tp": 2})
    cfg = llama_spmd.config(vocab_size=64, dim=16, n_heads=2, ffn_dim=32,
                            n_layers=2, max_seq_len=16)
    rng = np.random.RandomState(0)
    tokens = shard(rng.randint(0, 64, (8, 8)).astype(np.int32), mesh,
                   "dp", None)
    targets = shard(rng.randint(0, 64, (8, 8)).astype(np.int32), mesh,
                    "dp", None)
    params = llama_spmd.shard_params(
        llama_spmd.init_params(np.random.RandomState(1), cfg), mesh)
    step = llama_spmd.make_train_step(mesh, cfg, lr=1e-1)

    for _ in range(2):
        params, _ = step(params, tokens, targets)
    save_sharded_tree(str(tmp_path / "spmd"), params)
    want = [float(step(params, tokens, targets)[1]) for params in [params]]

    restored = load_sharded_tree(str(tmp_path / "spmd"), params)
    leaf = jax.tree_util.tree_leaves(restored)[0]
    orig = jax.tree_util.tree_leaves(params)[0]
    assert leaf.sharding.is_equivalent_to(orig.sharding, ndim=leaf.ndim)
    got = [float(step(restored, tokens, targets)[1])]
    assert got == want, (got, want)


def test_sharded_strict_missing_param(tmp_path):
    net, opt = _build(seed=8)
    save_sharded(str(tmp_path / "ckpt"), net, None)

    class Bigger(nn.Module):
        def __init__(self):
            super().__init__()
            self.base = nn.Sequential(nn.Linear(6, 16), nn.Tanh(),
                                      nn.Linear(16, 3))
            self.extra = nn.Linear(3, 3)

    big = Bigger()
    with pytest.raises(KeyError):
        load_sharded(str(tmp_path / "ckpt"), big, None)
