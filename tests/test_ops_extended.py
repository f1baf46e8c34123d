"""Unary / reduction / shape-op forward parity and the backward behaviors the
reference pins down in tests/test_ops_extended.py."""
import numpy as np
import pytest

import pydynet_tpu as pdn

np.random.seed(1)


def test_transpose_negative_axes_grad():
    """Regression: argsort of raw negative axes is NOT the inverse
    permutation — grads came back silently scrambled."""
    x_np = np.random.randn(2, 3, 4)
    g_np = np.random.randn(2, 4, 3)
    for axes in [(0, -1, -2), (-1, 0, 1), (2, 0, 1), (-1, -3, -2)]:
        x = pdn.Tensor(x_np, requires_grad=True)
        y = pdn.transpose(x, axes)
        assert y.shape == np.transpose(x_np, axes).shape
        g = np.random.randn(*y.shape)
        (y * pdn.Tensor(g)).sum().backward()
        norm = tuple(a % 3 for a in axes)
        want = np.transpose(g, np.argsort(norm))
        assert np.allclose(x.grad, want), axes


def test_silu_stable_at_large_negative():
    """Regression: x / (1 + exp(-x)) overflowed exp below ~-88 (f32) and
    produced NaN gradients."""
    import pydynet_tpu.nn.functional as F

    x = pdn.Tensor(np.array([-100.0, -5.0, 0.0, 5.0], np.float32),
                   requires_grad=True)
    y = F.silu(x)
    assert np.isfinite(y.numpy()).all()
    y.sum().backward()
    assert np.isfinite(np.asarray(x.grad)).all()
    # parity with the reference's formula where it is well-conditioned
    ref = np.array([-5.0, 0.0, 5.0]) / (1 + np.exp(-np.array([-5., 0., 5.])))
    assert np.allclose(y.numpy()[1:], ref, atol=1e-6)


def test_unary_function_forward_matches_numpy():
    x_np = np.random.uniform(0.5, 2.0, size=(3, 4)).astype(np.float64)
    x = pdn.Tensor(x_np)
    pairs = [
        (pdn.abs, np.abs),
        (pdn.exp, np.exp),
        (pdn.log, np.log),
        (pdn.sign, np.sign),
        (pdn.sigmoid, lambda z: 1.0 / (1.0 + np.exp(-z))),
        (pdn.tanh, np.tanh),
        (pdn.sqrt, np.sqrt),
        (pdn.square, np.square),
    ]
    for pdn_func, np_func in pairs:
        out = pdn_func(x)
        expected = np_func(x_np)
        assert out.shape == expected.shape
        assert np.allclose(out.data, expected, atol=1e-6, rtol=1e-6)


def test_reduce_function_forward_matches_numpy():
    x_np = np.random.randn(2, 3, 4).astype(np.float64)
    x = pdn.Tensor(x_np)
    cases = [
        (lambda t: pdn.sum(t), lambda a: np.sum(a)),
        (lambda t: pdn.mean(t), lambda a: np.mean(a)),
        (lambda t: pdn.sum(t, axis=1), lambda a: np.sum(a, axis=1)),
        (lambda t: pdn.mean(t, axis=(0, 2), keepdims=True),
         lambda a: np.mean(a, axis=(0, 2), keepdims=True)),
        (lambda t: pdn.max(t, axis=2), lambda a: np.max(a, axis=2)),
        (lambda t: pdn.min(t, axis=0), lambda a: np.min(a, axis=0)),
        (lambda t: pdn.argmax(t, axis=1), lambda a: np.argmax(a, axis=1)),
        (lambda t: pdn.argmin(t, axis=2), lambda a: np.argmin(a, axis=2)),
        (lambda t: pdn.max(t, axis=-1), lambda a: np.max(a, axis=-1)),
    ]
    for pdn_func, np_func in cases:
        out = pdn_func(x)
        expected = np_func(x_np)
        assert out.shape == expected.shape
        assert np.allclose(out.data, expected)


def test_shape_manipulation_matches_numpy():
    x_np = np.arange(24, dtype=np.float64).reshape(2, 3, 4)
    x = pdn.Tensor(x_np)

    assert np.array_equal(pdn.reshape(x, (4, 6)).data, x_np.reshape(4, 6))
    assert np.array_equal(x.reshape(4, -1).data, x_np.reshape(4, 6))
    assert np.array_equal(
        pdn.transpose(x, (2, 0, 1)).data, x_np.transpose(2, 0, 1))
    assert np.array_equal(x.T.data, x_np.T)
    assert np.array_equal(
        pdn.swapaxes(x, 0, 2).data, np.swapaxes(x_np, 0, 2))
    assert np.array_equal(
        pdn.unsqueeze(x, (0, 2)).data,
        np.expand_dims(np.expand_dims(x_np, 0), 2))
    sq = pdn.Tensor(np.ones((1, 2, 1, 3)))
    assert pdn.squeeze(sq, axis=(0, 2)).shape == (2, 3)
    assert pdn.squeeze(sq).shape == (2, 3)


@pytest.mark.parametrize("axis", [0, 1, 2])
def test_split_and_concat_roundtrip(axis):
    x_np = np.random.randn(4, 6, 8).astype(np.float64)
    x = pdn.Tensor(x_np)
    pieces = pdn.split(x, 2, axis=axis)
    assert len(pieces) == 2
    merged = pdn.concat(pieces, axis=axis)
    assert np.allclose(merged.data, x_np)


def test_vsplit_hsplit_dsplit():
    x_np = np.random.randn(4, 6, 8)
    x = pdn.Tensor(x_np)
    for fn, npfn in [(pdn.vsplit, np.vsplit), (pdn.hsplit, np.hsplit),
                     (pdn.dsplit, np.dsplit)]:
        got = fn(x, 2)
        want = npfn(x_np, 2)
        for g, w in zip(got, want):
            assert np.allclose(g.data, w)


def test_concat_backward_distributes_gradient():
    a_np = np.random.randn(2, 3)
    b_np = np.random.randn(2, 2)
    a = pdn.Tensor(a_np, requires_grad=True)
    b = pdn.Tensor(b_np, requires_grad=True)
    y = pdn.concat([a, b], axis=1).sum()
    y.backward()
    assert np.array_equal(a.grad, np.ones_like(a_np))
    assert np.array_equal(b.grad, np.ones_like(b_np))


def test_split_backward_scatters_gradient():
    x = pdn.Tensor(np.random.randn(4, 6), requires_grad=True)
    parts = pdn.split(x, 2, axis=1)
    (parts[0].sum() * 2 + parts[1].sum()).backward()
    expected = np.concatenate([2 * np.ones((4, 3)), np.ones((4, 3))], axis=1)
    assert np.allclose(x.grad, expected)


def test_mean_backward_with_axis_and_keepdims():
    x_np = np.random.randn(2, 3, 4)
    x = pdn.Tensor(x_np, requires_grad=True)
    y = pdn.mean(x, axis=1, keepdims=True).sum()
    y.backward()
    assert np.allclose(x.grad, np.ones_like(x_np) / x_np.shape[1])


def test_max_backward_equality_mask():
    x_np = np.array([[1.0, 3.0, 3.0], [0.0, -1.0, 2.0]])
    x = pdn.Tensor(x_np, requires_grad=True)
    pdn.max(x, axis=1).sum().backward()
    # ties receive the full gradient each (reference semantics)
    assert np.allclose(x.grad, [[0, 1, 1], [0, 0, 1]])


def test_getitem_backward_fancy_index():
    x = pdn.Tensor(np.arange(12, dtype=np.float64).reshape(3, 4),
                   requires_grad=True)
    y = x[[0, 2], 1:3].sum()
    y.backward()
    expected = np.zeros((3, 4))
    expected[[0, 2], 1:3] = 1.0
    assert np.allclose(x.grad, expected)


def test_getitem_with_tensor_key_and_repeats():
    x = pdn.Tensor(np.arange(4, dtype=np.float64), requires_grad=True)
    idx = pdn.Tensor(np.array([0, 0, 2]))
    y = x[idx].sum()
    y.backward()
    assert np.allclose(x.grad, [2.0, 0.0, 1.0, 0.0])


def test_out_of_range_axes_raise():
    """Regression: `a % ndim` silently wrapped out-of-range negative axes
    (numpy and the reference raise AxisError)."""
    x2 = pdn.Tensor(np.random.randn(3, 4))
    with pytest.raises(np.exceptions.AxisError):
        pdn.squeeze(pdn.Tensor(np.random.randn(1, 4)), -5)
    with pytest.raises(np.exceptions.AxisError):
        pdn.unsqueeze(x2, -10)
    with pytest.raises(np.exceptions.AxisError):
        pdn.split(x2, 2, axis=-5)
    with pytest.raises(np.exceptions.AxisError):
        pdn.transpose(pdn.Tensor(np.random.randn(2, 3, 4)), (0, 1, -10))
