"""The imperative->XLA jit bridge: state capture, grad updates, RNG threading,
and tape hygiene across compiled calls."""
import numpy as np
import pytest

import pydynet_tpu as pdn
from pydynet_tpu.core.tensor import Graph


def test_jit_pure_function():
    @pdn.jit
    def f(a, b):
        return a * b + 2

    x = pdn.Tensor(np.arange(3, dtype=np.float32))
    y = pdn.Tensor(np.ones(3, dtype=np.float32))
    out = f(x, y)
    assert isinstance(out, pdn.Tensor)
    assert np.allclose(out.data, [2, 3, 4])
    # second call: cached executable, same result
    assert np.allclose(f(x, y).data, [2, 3, 4])


def test_jit_gradient_descent_state():
    w = pdn.Tensor(np.array(5.0, dtype=np.float64), requires_grad=True)

    def step(lr):
        w.zero_grad()
        loss = (w - 2.0) ** 2
        loss.backward()
        w.data -= lr * w.grad
        return loss

    jstep = pdn.jit(step, state=[w])
    losses = [float(jstep(np.float64(0.1)).item()) for _ in range(20)]
    assert losses[0] > losses[-1]
    assert abs(float(w.item()) - 2.0) < 0.1


def test_jit_tape_does_not_leak():
    w = pdn.Tensor(np.array(1.0), requires_grad=True)

    def step():
        w.zero_grad()
        y = w * w
        y.backward()
        w.data -= 0.01 * w.grad
        return y

    jstep = pdn.jit(step, state=[w])
    jstep()
    n = Graph.size()
    for _ in range(5):
        jstep()
    assert Graph.size() == n


def test_jit_rng_state_advances():
    gen = pdn.default_generator
    gen.manual_seed(0)

    @pdn.jit
    def draw():
        return pdn.Tensor(gen.uniform((4,)))

    a = draw().numpy()
    b = draw().numpy()
    assert not np.allclose(a, b)


def test_jit_static_python_args():
    calls = []

    def f(x, k):
        calls.append(k)
        return x * k

    jf = pdn.jit(f)
    x = pdn.Tensor(np.ones(2))
    assert np.allclose(jf(x, 3).data, 3)
    assert np.allclose(jf(x, 4).data, 4)  # retrace on new static value
    assert np.allclose(jf(x, 3).data, 3)  # cached

    assert calls == [3, 4]


def test_jit_nested_output_structure():
    @pdn.jit
    def f(x):
        return {"y": x + 1, "pair": (x * 2, x * 3)}

    out = f(pdn.Tensor(np.ones(2)))
    assert np.allclose(out["y"].data, 2)
    assert np.allclose(out["pair"][1].data, 3)


def test_jit_output_structure_per_static_arg():
    @pdn.jit
    def f(x, mode):
        if mode == "pair":
            return x * 2, x * 3
        return {"single": x + 1}

    x = pdn.Tensor(np.ones(2))
    a = f(x, "pair")
    b = f(x, "single")
    a2 = f(x, "pair")  # cached executable must use the right template
    assert isinstance(a, tuple) and isinstance(a2, tuple)
    assert isinstance(b, dict) and "single" in b
    assert np.allclose(a2[1].data, 3)


def test_prefetch_propagates_worker_errors():
    from pydynet_tpu.data import DataLoader, Dataset

    class Bad(Dataset):
        def __getitem__(self, index):
            raise RuntimeError("boom")

        def __len__(self):
            return 10

    loader = DataLoader(Bad(), batch_size=2, prefetch=2)
    import pytest as _pytest
    with _pytest.raises(RuntimeError, match="boom"):
        list(iter(loader))


def test_batchnorm_running_stats_advance_under_jit():
    from pydynet_tpu import nn, optim

    net = nn.Sequential(nn.Linear(4, 8), nn.BatchNorm1d(8), nn.Tanh(),
                        nn.Linear(8, 2))
    opt = optim.SGD(net.parameters(), lr=0.01, momentum=0.0, nesterov=False)
    bn = net.module_list[1]
    rm0 = bn.running_mean.numpy().copy()

    def step(x, y):
        opt.zero_grad()
        loss = pdn.nn.functional.mse_loss(net(x), y)
        loss.backward()
        opt.step()
        return loss

    js = pdn.jit(step, state=(net, opt))
    x = pdn.Tensor(np.random.randn(16, 4) + 3.0)
    y = pdn.Tensor(np.random.randn(16, 2))
    js(x, y)
    rm1 = bn.running_mean.numpy().copy()
    js(x, y)
    rm2 = bn.running_mean.numpy().copy()
    assert not np.allclose(rm0, rm1)
    assert not np.allclose(rm1, rm2)  # keeps advancing across compiled calls


def test_jit_with_kwargs():
    @pdn.jit
    def f(x, *, scale):
        return x * scale

    x = pdn.Tensor(np.ones(3))
    assert np.allclose(f(x, scale=pdn.Tensor(np.full(3, 2.0))).data, 2.0)
    assert np.allclose(f(x, scale=pdn.Tensor(np.full(3, 4.0))).data, 4.0)


def test_output_template_keyed_per_signature():
    """Regression (round-1 weak #4): the output-template lookup must never
    guess 'the latest' template — two call signatures with different output
    pytrees must each wrap their own structure, in any call order."""
    w = pdn.Tensor(np.ones((2, 2)), requires_grad=True)

    def step(x, as_dict):
        y = (x @ w).sum()
        if as_dict:
            return {"loss": y, "double": y * 2.0}
        return (y, y * 3.0)

    js = pdn.jit(step, state=[w])
    x = pdn.Tensor(np.ones((2, 2)))

    d = js(x, True)
    assert isinstance(d, dict) and set(d) == {"loss", "double"}
    t = js(x, False)
    assert isinstance(t, tuple) and len(t) == 2
    # revisit the first signature: cached executable, template must be right
    d2 = js(x, True)
    assert isinstance(d2, dict)
    assert float(d2["loss"].item()) == float(d["loss"].item())
    assert float(t[1].item()) == 3.0 * float(t[0].item())


def test_output_template_same_shape_different_tree():
    """Same dynamic avals, output structure differing only via static
    python values in the args."""
    w = pdn.Tensor(np.full((3,), 2.0), requires_grad=True)

    def step(x, mode):
        y = (x * w).sum()
        return [y] if mode == "list" else {"v": y}

    js = pdn.jit(step, state=[w])
    x = pdn.Tensor(np.arange(3.0))
    a = js(x, "list")
    b = js(x, "dict")
    a2 = js(x, "list")
    assert isinstance(a, list) and isinstance(b, dict)
    assert isinstance(a2, list)
    assert float(a[0].item()) == float(b["v"].item()) == 6.0


def test_foreach_matches_per_call_loop():
    """jstep.foreach(Xb, Yb) (one lax.scan program per epoch) must produce
    the SAME losses and final state as calling the step per batch."""
    import numpy as np
    import pydynet_tpu as pdn
    from pydynet_tpu import nn, optim

    Xb = np.random.randn(5, 8, 4)
    Yb = np.random.randn(5, 8, 2)

    def build():
        np.random.seed(3)
        net = nn.Sequential(nn.Linear(4, 8), nn.Tanh(), nn.Linear(8, 2))
        opt = optim.Adam(net.parameters(), lr=1e-2)

        def step(x, y):
            opt.zero_grad()
            loss = pdn.nn.functional.mse_loss(net(x), y)
            loss.backward()
            opt.step()
            return loss

        return net, pdn.jit(step, state=(net, opt))

    net1, js1 = build()
    loop = [float(js1(pdn.Tensor(Xb[i]), pdn.Tensor(Yb[i])).item())
            for i in range(5)]
    net2, js2 = build()
    fused = js2.foreach(pdn.Tensor(Xb), pdn.Tensor(Yb)).numpy().reshape(-1)
    assert np.allclose(loop, fused, rtol=1e-6), (loop, fused)
    for (n, p1), (_, p2) in zip(net1._parameters.items(),
                                net2._parameters.items()):
        assert np.allclose(p1.numpy(), p2.numpy(), atol=1e-6), n
    # interleaving normal calls and foreach shares the live state
    l_call = float(js2(pdn.Tensor(Xb[0]), pdn.Tensor(Yb[0])).item())
    l_loop = float(js1(pdn.Tensor(Xb[0]), pdn.Tensor(Yb[0])).item())
    assert l_call == pytest.approx(l_loop, rel=1e-6)

    # mismatched leading axes must raise
    with pytest.raises(ValueError, match="steps axis"):
        js2.foreach(pdn.Tensor(Xb), pdn.Tensor(Yb[:3]))


def test_foreach_threads_prng_like_per_call_loop():
    """Dropout inside a foreach sweep must consume the global PRNG stream
    exactly like the equivalent per-call loop (the generator state rides
    the scan carry)."""
    import numpy as np
    import pydynet_tpu as pdn
    from pydynet_tpu import nn, optim

    Xb = np.random.randn(4, 16, 6)
    Yb = np.random.randn(4, 16, 2)

    def build():
        np.random.seed(11)
        pdn.manual_seed(11)
        net = nn.Sequential(nn.Linear(6, 32), nn.Dropout(0.5),
                            nn.Linear(32, 2))
        net.train()
        opt = optim.SGD(net.parameters(), lr=0.05, momentum=0.0,
                        nesterov=False)

        def step(x, y):
            opt.zero_grad()
            loss = pdn.nn.functional.mse_loss(net(x), y)
            loss.backward()
            opt.step()
            return loss

        return net, pdn.jit(step, state=(net, opt))

    net1, js1 = build()
    loop = [float(js1(pdn.Tensor(Xb[i]), pdn.Tensor(Yb[i])).item())
            for i in range(4)]
    net2, js2 = build()
    fused = js2.foreach(pdn.Tensor(Xb), pdn.Tensor(Yb)).numpy().reshape(-1)
    assert np.allclose(loop, fused, rtol=1e-6), (loop, list(fused))
    for (n, p1), (_, p2) in zip(net1._parameters.items(),
                                net2._parameters.items()):
        assert np.allclose(p1.numpy(), p2.numpy(), atol=1e-6), n


def test_grad_accumulation_microbatches_under_jit():
    """Gradient accumulation needs no dedicated API: K microbatch
    backward() calls accumulate into .grad (reference tape semantics),
    one optimizer step applies them — and the whole thing jit-compiles as
    ONE program.  Scaling each microloss by 1/K makes the update equal to
    the full-batch step exactly."""
    from pydynet_tpu import nn, optim

    np.random.seed(21)
    X = np.random.randn(24, 6)
    Y = np.random.randn(24, 3)
    K = 4

    def build():
        np.random.seed(5)
        net = nn.Sequential(nn.Linear(6, 8), nn.Tanh(), nn.Linear(8, 3))
        opt = optim.SGD(net.parameters(), lr=0.1, momentum=0.0,
                        nesterov=False)
        return net, opt

    net1, opt1 = build()

    def accum_step(xs, ys):
        opt1.zero_grad()
        for i in range(K):  # python loop: unrolled into the trace
            loss = pdn.nn.functional.mse_loss(net1(xs[i]), ys[i]) / K
            loss.backward()
        opt1.step()
        return loss

    js = pdn.jit(accum_step, state=(net1, opt1))
    for _ in range(3):
        js(pdn.Tensor(X.reshape(K, 6, 6)), pdn.Tensor(Y.reshape(K, 6, 3)))

    net2, opt2 = build()

    def full_step(x, y):
        opt2.zero_grad()
        loss = pdn.nn.functional.mse_loss(net2(x), y)
        loss.backward()
        opt2.step()
        return loss

    jf = pdn.jit(full_step, state=(net2, opt2))
    for _ in range(3):
        jf(pdn.Tensor(X), pdn.Tensor(Y))

    for (n, p1), (_, p2) in zip(net1._parameters.items(),
                                net2._parameters.items()):
        np.testing.assert_allclose(p1.numpy(), p2.numpy(), rtol=1e-10,
                                   atol=1e-12, err_msg=n)
