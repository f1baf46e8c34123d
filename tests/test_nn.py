"""nn layer: functional ops vs NumPy oracles (fwd + numerical grad-checks to
1e-5 per BASELINE.md), module registration semantics, norms, dropout."""
import numpy as np

import pydynet_tpu as pdn
from pydynet_tpu import nn
import pydynet_tpu.nn.functional as F

np.random.seed(0)


def numerical_grad(fn, x, eps=1e-6):
    """Central-difference gradient of scalar fn at x (float64)."""
    g = np.zeros_like(x)
    flat_x = x.reshape(-1)
    flat_g = g.reshape(-1)
    for i in range(flat_x.size):
        orig = flat_x[i]
        flat_x[i] = orig + eps
        fp = fn(x)
        flat_x[i] = orig - eps
        fm = fn(x)
        flat_x[i] = orig
        flat_g[i] = (fp - fm) / (2 * eps)
    return g


def check_grad(make_loss, x_np, atol=1e-5):
    x = pdn.Tensor(x_np, requires_grad=True)
    loss = make_loss(x)
    loss.backward()
    got = np.asarray(x.grad)

    def scalar_fn(arr):
        with pdn.no_grad():
            return float(make_loss(pdn.Tensor(arr)).item())

    want = numerical_grad(scalar_fn, x_np.copy())
    assert np.allclose(got, want, atol=atol, rtol=1e-4), \
        f"max err {np.abs(got - want).max()}"


# ----------------------------- functional ----------------------------- #
def test_linear_forward_and_grad():
    x_np = np.random.randn(4, 3)
    w = pdn.Tensor(np.random.randn(3, 5), requires_grad=True)
    b = pdn.Tensor(np.random.randn(5), requires_grad=True)
    out = F.linear(pdn.Tensor(x_np), w, b)
    assert np.allclose(out.data, x_np @ w.numpy() + b.numpy())
    out.sum().backward()
    assert np.allclose(w.grad, x_np.T @ np.ones((4, 5)))
    assert np.allclose(b.grad, 4 * np.ones(5))


def test_activations_forward():
    x_np = np.random.randn(5, 4)
    x = pdn.Tensor(x_np)
    assert np.allclose(F.relu(x).data, np.maximum(x_np, 0))
    assert np.allclose(F.leaky_relu(x, 0.1).data,
                       np.maximum(x_np, 0.1 * x_np))
    assert np.allclose(F.silu(x).data, x_np / (1 + np.exp(-x_np)), atol=1e-6)
    sm = F.softmax(x, axis=1)
    e = np.exp(x_np - x_np.max(1, keepdims=True))
    assert np.allclose(sm.data, e / e.sum(1, keepdims=True), atol=1e-6)
    lsm = F.log_softmax(x, axis=1, keepdims=True)
    assert np.allclose(lsm.data,
                       x_np - x_np.max(1, keepdims=True) -
                       np.log(e.sum(1, keepdims=True)), atol=1e-6)


def test_softmax_grad():
    x_np = np.random.randn(3, 4)
    check_grad(lambda x: (F.softmax(x, axis=1) *
                          pdn.Tensor(np.arange(4.0))).sum(), x_np)


def test_conv2d_forward_matches_naive():
    np.random.seed(1)
    N, C, H, W, O, K, S, P = 2, 3, 8, 8, 4, 3, 2, 1
    x_np = np.random.randn(N, C, H, W)
    k_np = np.random.randn(O, C, K, K)
    out = F.conv2d(pdn.Tensor(x_np), pdn.Tensor(k_np), padding=P, stride=S)
    xp = np.pad(x_np, [(0, 0), (0, 0), (P, P), (P, P)])
    Ho = (H + 2 * P - K) // S + 1
    want = np.zeros((N, O, Ho, Ho))
    for i in range(Ho):
        for j in range(Ho):
            patch = xp[:, :, i * S:i * S + K, j * S:j * S + K]
            want[:, :, i, j] = np.einsum("nchw,ochw->no", patch, k_np)
    assert out.shape == want.shape
    assert np.allclose(out.data, want, atol=1e-8)


def test_conv2d_grads():
    np.random.seed(2)
    x_np = np.random.randn(2, 2, 6, 6)
    k_np = np.random.randn(3, 2, 3, 3)
    k = pdn.Tensor(k_np, requires_grad=True)
    check_grad(lambda x: F.conv2d(x, k, padding=1, stride=1).sum(), x_np)
    k.zero_grad()  # check_grad's backward also accumulated into k
    x = pdn.Tensor(x_np, requires_grad=True)
    loss = (F.conv2d(x, k, padding=1, stride=2) ** 2).sum()
    loss.backward()

    def kfn(arr):
        with pdn.no_grad():
            return float(((F.conv2d(pdn.Tensor(x_np), pdn.Tensor(arr),
                                    padding=1, stride=2)) ** 2).sum().item())

    want = numerical_grad(kfn, k_np.copy())
    assert np.allclose(k.grad, want, atol=1e-4, rtol=1e-4)


def test_conv1d_forward():
    x_np = np.random.randn(2, 3, 10)
    k_np = np.random.randn(4, 3, 3)
    out = F.conv1d(pdn.Tensor(x_np), pdn.Tensor(k_np), padding=1, stride=2)
    Ho = (10 + 2 - 3) // 2 + 1
    assert out.shape == (2, 4, Ho)
    xp = np.pad(x_np, [(0, 0), (0, 0), (1, 1)])
    want = np.zeros((2, 4, Ho))
    for i in range(Ho):
        want[:, :, i] = np.einsum("ncw,ocw->no", xp[:, :, 2 * i:2 * i + 3],
                                  k_np)
    assert np.allclose(out.data, want, atol=1e-8)


def test_pooling_forward_and_grad():
    x_np = np.random.randn(2, 3, 8, 8)
    out = F.max_pool2d(pdn.Tensor(x_np), 2, 2)
    want = x_np.reshape(2, 3, 4, 2, 4, 2).max((3, 5))
    assert np.allclose(out.data, want)
    out = F.avg_pool2d(pdn.Tensor(x_np), 2, 2)
    assert np.allclose(out.data, x_np.reshape(2, 3, 4, 2, 4, 2).mean((3, 5)),
                       atol=1e-8)
    # padded zeros can win the max (reference constant-pad semantics)
    neg = -np.ones((1, 1, 2, 2))
    out = F.max_pool2d(pdn.Tensor(neg), 2, 1, padding=1)
    assert out.numpy().max() == 0.0
    check_grad(lambda x: F.max_pool2d(x, 2, 2).sum(),
               np.random.randn(1, 2, 4, 4))
    check_grad(lambda x: F.avg_pool2d(x, 2, 2).sum(),
               np.random.randn(1, 2, 4, 4))
    # 1d variants
    x1 = np.random.randn(2, 3, 9)
    assert F.max_pool1d(pdn.Tensor(x1), 3, 3).shape == (2, 3, 3)
    assert np.allclose(F.avg_pool1d(pdn.Tensor(x1), 3, 3).data,
                       x1.reshape(2, 3, 3, 3).mean(-1), atol=1e-8)


def test_losses():
    yp = np.random.randn(6, 5)
    yt = np.random.randint(0, 5, 6)
    pred = pdn.Tensor(yp, requires_grad=True)
    loss = F.cross_entropy_loss(pred, pdn.Tensor(yt))
    # oracle
    z = yp - yp.max()
    logp = z - np.log(np.exp(z).sum(1, keepdims=True))
    want = -logp[np.arange(6), yt].mean()
    assert np.allclose(loss.item(), want, atol=1e-8)
    check_grad(lambda x: F.cross_entropy_loss(x, pdn.Tensor(yt)), yp)

    onehot = np.eye(5)[yt]
    loss2 = F.cross_entropy_loss(pdn.Tensor(yp), pdn.Tensor(onehot))
    assert np.allclose(loss2.item(), -(logp * onehot).mean() * 1, atol=1e-8)

    a, b = np.random.randn(4, 3), np.random.randn(4, 3)
    assert np.allclose(
        F.mse_loss(pdn.Tensor(a), pdn.Tensor(b)).item(),
        ((a - b) ** 2).mean())
    assert np.allclose(
        F.nll_loss(pdn.Tensor(a), pdn.Tensor(b), reduction="sum").item(),
        (-a * b).sum())


def test_embedding():
    emb = nn.Embedding(10, 4, padding_idx=0)
    ids = pdn.Tensor(np.array([[1, 2, 0], [3, 0, 1]]))
    out = emb(ids)
    assert out.shape == (2, 3, 4)
    assert np.allclose(out.numpy()[0, 2], 0)  # padding idx masked
    loss = out.sum()
    loss.backward()
    g = np.asarray(emb.weight.grad)
    assert np.allclose(g[0], 0)       # padding row no grad
    assert np.allclose(g[1], 2.0)     # id 1 appears twice


# ----------------------------- modules ----------------------------- #
def test_module_registration_dotted_names():
    class Net(nn.Module):
        def __init__(self):
            super().__init__()
            self.fc1 = nn.Linear(4, 3)
            self.block = nn.Sequential(nn.Linear(3, 3), nn.ReLU())

        def forward(self, x):
            return self.block(self.fc1(x))

    net = Net()
    names = set(net._parameters.keys())
    assert "fc1.weight" in names and "fc1.bias" in names
    assert "block.0.weight" in names
    assert len(list(net.parameters())) == 4
    out = net(pdn.Tensor(np.random.randn(2, 4)))
    assert out.shape == (2, 3)
    assert "Net" in repr(net)


def test_module_train_eval_flips_grad_mode():
    net = nn.Linear(2, 2)
    net.eval()
    assert not pdn.is_grad_enable()
    assert not net._train
    net.train()
    assert pdn.is_grad_enable()
    assert net._train


def test_modulelist_and_sequential():
    ml = nn.ModuleList([nn.Linear(2, 2) for _ in range(3)])
    assert len(ml) == 3
    assert "0.weight" in ml._parameters
    ml.append(nn.Linear(2, 2))
    assert "3.weight" in ml._parameters
    from collections import OrderedDict
    seq = nn.Sequential(OrderedDict([("a", nn.Linear(2, 3)),
                                     ("b", nn.ReLU())]))
    assert "a.weight" in seq._parameters
    assert seq(pdn.Tensor(np.random.randn(1, 2))).shape == (1, 3)


def test_dropout():
    pdn.manual_seed(0)
    drop = nn.Dropout(0.5)
    x = pdn.Tensor(np.ones((100, 100)), requires_grad=True)
    drop.train()
    out = drop(x)
    vals = np.unique(np.asarray(out.data))
    assert set(np.round(vals, 6)).issubset({0.0, 2.0})
    assert abs(float(np.mean(out.numpy())) - 1.0) < 0.1
    out.sum().backward()  # grads flow through the mask
    drop.eval()
    assert np.allclose(drop(x).data, 1.0)
    # different mask per call
    drop.train()
    assert not np.allclose(drop(x).numpy(), out.numpy())


def test_batchnorm1d_train_and_eval():
    bn = nn.BatchNorm1d(4, momentum=0.1)
    x_np = np.random.randn(32, 4) * 3 + 5
    bn.train()
    out = bn(pdn.Tensor(x_np, requires_grad=False))
    assert abs(out.numpy().mean()) < 1e-6
    assert abs(out.numpy().std() - 1) < 1e-2
    assert np.allclose(bn.running_mean.numpy(), 0.1 * x_np.mean(0),
                       atol=1e-6)
    bn.eval()
    out_eval = bn(pdn.Tensor(x_np))
    expected = (x_np - bn.running_mean.numpy()) / np.sqrt(
        bn.running_var.numpy() + bn.eps)
    assert np.allclose(out_eval.data, expected, atol=1e-5)


def test_batchnorm2d_shapes():
    bn = nn.BatchNorm2d(3)
    x = pdn.Tensor(np.random.randn(4, 3, 5, 5))
    out = bn(x)
    assert out.shape == (4, 3, 5, 5)
    assert abs(out.numpy().mean((0, 2, 3)).max()) < 1e-6


def test_rmsnorm_and_layernorm():
    rms = nn.RMSNorm(6)
    x_np = np.random.randn(4, 6)
    out = rms(pdn.Tensor(x_np))
    want = x_np / np.sqrt((x_np ** 2).mean(-1, keepdims=True) + 1e-6)
    assert np.allclose(out.data, want, atol=1e-6)

    ln = nn.LayerNorm(6)
    out = ln(pdn.Tensor(x_np))
    # reference LayerNorm normalizes over leading axes
    mean, var = x_np.mean(0), ((x_np - x_np.mean(0)) ** 2).mean(0)
    assert np.allclose(out.data,
                       (x_np - mean) / np.sqrt(var + 1e-6), atol=1e-6)


def test_init_reproducible_with_numpy_seed():
    np.random.seed(7)
    l1 = nn.Linear(4, 4)
    np.random.seed(7)
    l2 = nn.Linear(4, 4)
    assert np.allclose(l1.weight.numpy(), l2.weight.numpy())
    w = pdn.Tensor(np.zeros((4, 4)), requires_grad=True)
    nn.init.xavier_uniform_(w)
    assert np.abs(w.numpy()).max() <= np.sqrt(6 / 8)
    nn.init.kaiming_normal_(w)
    nn.init.constant_(w, 3.0)
    assert np.allclose(w.numpy(), 3.0)


def test_module_to_device_noop_cpu():
    net = nn.Linear(3, 3)
    net.to("cpu")
    assert net.device == pdn.Device("cpu")


def test_module_state_dict_methods():
    net = nn.Sequential(nn.Linear(3, 4), nn.ReLU(), nn.Linear(4, 2))
    sd = net.state_dict()
    assert "0.weight" in sd and "2.bias" in sd
    np.random.seed(123)
    net2 = nn.Sequential(nn.Linear(3, 4), nn.ReLU(), nn.Linear(4, 2))
    net2.load_state_dict(sd)
    for n, p in net._parameters.items():
        assert np.allclose(p.numpy(), net2._parameters[n].numpy()), n


def test_clip_grad_norm():
    """nn.utils.clip_grad_norm_: global-norm cap, torch contract (pre-clip
    norm returned, 1e-6 guard, inf norm), identical eager and under
    pdn.jit (the clip traces into the fused train step)."""
    np.random.seed(3)
    net = nn.Linear(4, 3)
    X = pdn.Tensor(np.random.randn(8, 4))

    def step():
        for p in net.parameters():
            p.zero_grad()
        loss = F.mse_loss(net(X), pdn.Tensor(np.zeros((8, 3))))
        loss.backward()
        total = nn.utils.clip_grad_norm_(net.parameters(), 0.1)
        return total

    total = float(step())
    gn = np.sqrt(sum(float((np.asarray(p.grad) ** 2).sum())
                     for p in net.parameters()))
    assert total > 0.1  # unclipped norm was larger...
    assert abs(gn - 0.1) < 1e-4  # ...and the post-clip global norm is cap

    # inf norm: caps the max |g|
    for p in net.parameters():
        p.zero_grad()
    loss = F.mse_loss(net(X), pdn.Tensor(np.ones((8, 3)) * 9))
    loss.backward()
    nn.utils.clip_grad_norm_(net.parameters(), 0.05, norm_type=np.inf)
    mx = max(float(np.abs(np.asarray(p.grad)).max())
             for p in net.parameters())
    assert mx <= 0.05 + 1e-7

    # value clip
    for p in net.parameters():
        p.zero_grad()
    loss = F.mse_loss(net(X), pdn.Tensor(np.ones((8, 3)) * 9))
    loss.backward()
    nn.utils.clip_grad_value_(net.parameters(), 0.01)
    for p in net.parameters():
        assert float(np.abs(np.asarray(p.grad)).max()) <= 0.01

    # full train step with clip: pdn.jit trajectory matches eager
    # bitwise (the clip traces into the fused step), and the cap bites
    np.random.seed(5)
    nets = [nn.Linear(4, 3), None]
    np.random.seed(5)
    nets[1] = nn.Linear(4, 3)
    Y = pdn.Tensor(np.zeros((8, 3)))

    def make_step(net, opt):
        def train_step():
            opt.zero_grad()
            loss = F.mse_loss(net(X), Y)
            loss.backward()
            nn.utils.clip_grad_norm_(net.parameters(), 0.1)
            opt.step()
            return loss
        return train_step

    opt0 = pdn.optim.SGD(nets[0].parameters(), lr=0.5)
    opt1 = pdn.optim.SGD(nets[1].parameters(), lr=0.5)
    eager_step = make_step(nets[0], opt0)
    jit_step = pdn.jit(make_step(nets[1], opt1),
                       state=[*nets[1].parameters(), opt1])
    el = [float(eager_step().item()) for _ in range(5)]
    jl = [float(jit_step().item()) for _ in range(5)]
    # XLA may reassociate the fused f64 program: identical to last-ulps
    np.testing.assert_allclose(el, jl, rtol=1e-14)
    assert jl[-1] < jl[0]
    for p0, p1 in zip(nets[0].parameters(), nets[1].parameters()):
        np.testing.assert_allclose(p0.numpy(), p1.numpy(), rtol=1e-13,
                                   atol=1e-15)
