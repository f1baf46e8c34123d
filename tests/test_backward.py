"""Autograd engine semantics pinned by the reference's tests/test_backward.py:
scalar-only backward, unbroadcast grads, matmul grads, retain_graph
accumulation, plus multi-branch tape behavior and wrap_pure composites."""
import random

import numpy as np
import pytest

import pydynet_tpu as pdn

np.random.seed(0)
random.seed(0)


def _close(actual, expected, atol=1e-6, rtol=1e-6):
    assert np.allclose(actual, expected, atol=atol, rtol=rtol)


def test_backward_scalar_polynomial():
    x = pdn.Tensor(2.0, requires_grad=True)
    y = x**2 + 3 * x - 1
    y.backward()
    _close(x.grad, np.array(7.0))


def test_backward_broadcast_add():
    x_np = np.random.randn(2, 3)
    b_np = np.random.randn(1, 3)
    x = pdn.Tensor(x_np, requires_grad=True)
    b = pdn.Tensor(b_np, requires_grad=True)
    (x + b).sum().backward()
    _close(x.grad, np.ones_like(x_np))
    _close(b.grad, np.full_like(b_np, x_np.shape[0]))


def test_backward_missing_leading_dim_broadcast():
    x = pdn.Tensor(np.random.randn(4, 2, 3), requires_grad=True)
    b = pdn.Tensor(np.random.randn(3), requires_grad=True)
    (x * b).sum().backward()
    _close(b.grad, np.asarray(x.numpy().sum(axis=(0, 1))))


def test_backward_matmul_sum():
    x_np = np.random.randn(2, 3)
    w_np = np.random.randn(3, 4)
    x = pdn.Tensor(x_np, requires_grad=True)
    w = pdn.Tensor(w_np, requires_grad=True)
    pdn.matmul(x, w).sum().backward()
    _close(x.grad, np.ones((2, 4)) @ w_np.T)
    _close(w.grad, x_np.T @ np.ones((2, 4)))


def test_backward_batched_matmul_broadcast():
    x_np = np.random.randn(5, 2, 3)
    w_np = np.random.randn(3, 4)
    x = pdn.Tensor(x_np, requires_grad=True)
    w = pdn.Tensor(w_np, requires_grad=True)
    (x @ w).sum().backward()
    _close(x.grad, np.ones((5, 2, 4)) @ w_np.T)
    _close(w.grad, np.einsum("bij,bik->jk", x_np, np.ones((5, 2, 4))))


def test_backward_retain_graph_twice_accumulates_grad():
    x = pdn.Tensor(2.0, requires_grad=True)
    y = x * x
    y.backward(retain_graph=True)
    first = np.array(x.grad, copy=True)
    y.backward()
    _close(first, np.array(4.0))
    _close(x.grad, np.array(8.0))


def test_backward_on_non_scalar_raises():
    x = pdn.Tensor(np.array([1.0, 2.0]), requires_grad=True)
    with pytest.raises(ValueError, match="scalar"):
        x.backward()


def test_backward_after_free_raises():
    x = pdn.Tensor(2.0, requires_grad=True)
    y = x * x
    y.backward()
    # reference exception contract (core/tensor.py:346-348): ValueError
    with pytest.raises(ValueError, match="not in the graph"):
        y.backward()


def test_backward_on_size_one_tensor():
    """Reference parity (core/tensor.py:350): size-1 tensors of any shape
    count as scalars for backward."""
    t = pdn.Tensor(np.array([2.0]), requires_grad=True)
    (t * 3).backward()
    _close(t.grad, np.array([3.0]))
    t2 = pdn.Tensor(np.ones(2), requires_grad=True) * 1
    with pytest.raises(ValueError, match="scalar"):
        t2.backward()


def test_grad_accumulates_across_separate_losses():
    x = pdn.Tensor(3.0, requires_grad=True)
    (x * 2).backward()
    (x * 5).backward()
    _close(x.grad, np.array(7.0))


def test_zero_grad():
    x = pdn.Tensor(3.0, requires_grad=True)
    (x * x).backward()
    x.zero_grad()
    _close(x.grad, np.array(0.0))


def test_sum_of_two_losses_single_tape():
    # the reference's examples sum losses from separate forward passes
    # (examples/pydynet/dropout_bn.py:113); both branches must get grads
    x = pdn.Tensor(np.array([1.0, 2.0]), requires_grad=True)
    l1 = (x * 2).sum()
    l2 = (x * x).sum()
    (l1 + l2).backward()
    _close(x.grad, 2 + 2 * x.numpy())


def test_no_grad_blocks_tape():
    x = pdn.Tensor(2.0, requires_grad=True)
    with pdn.no_grad():
        y = x * x
    assert not y.requires_grad
    with pdn.enable_grad():
        z = x * x
    assert z.requires_grad
    z.backward()


def test_grad_mode_decorators():
    @pdn.no_grad()
    def f(t):
        return t * 2

    x = pdn.Tensor(1.0, requires_grad=True)
    assert not f(x).requires_grad


def test_chain_unary_ops_grad():
    x = pdn.Tensor(0.7, requires_grad=True)
    y = pdn.log(pdn.exp(pdn.tanh(x)) + 1)
    y.backward()
    t = np.tanh(0.7)
    expected = (np.exp(t) / (np.exp(t) + 1)) * (1 - t**2)
    _close(x.grad, expected)


def test_sigmoid_tanh_grads():
    x_np = np.random.randn(5)
    x = pdn.Tensor(x_np, requires_grad=True)
    pdn.sigmoid(x).sum().backward()
    s = 1 / (1 + np.exp(-x_np))
    _close(x.grad, s * (1 - s))

    x2 = pdn.Tensor(x_np, requires_grad=True)
    pdn.tanh(x2).sum().backward()
    _close(x2.grad, 1 - np.tanh(x_np)**2)


def test_div_pow_grads():
    a_np, b_np = np.random.rand(3) + 0.5, np.random.rand(3) + 0.5
    a = pdn.Tensor(a_np, requires_grad=True)
    b = pdn.Tensor(b_np, requires_grad=True)
    (a / b).sum().backward()
    _close(a.grad, 1 / b_np)
    _close(b.grad, -a_np / b_np**2)

    a2 = pdn.Tensor(a_np, requires_grad=True)
    b2 = pdn.Tensor(b_np, requires_grad=True)
    (a2**b2).sum().backward()
    _close(a2.grad, b_np * a_np**(b_np - 1))
    _close(b2.grad, a_np**b_np * np.log(a_np))


def test_frozen_input_gets_no_grad():
    x = pdn.Tensor(np.ones(3), requires_grad=True)
    w = pdn.Tensor(np.ones(3), requires_grad=False)
    (x * w).sum().backward()
    _close(x.grad, np.ones(3))
    assert w.grad is None


def test_grad_dtype_follows_param_dtype():
    x = pdn.Tensor(np.ones(3, np.float32), requires_grad=True)
    y = pdn.Tensor(np.ones(3, np.float64), requires_grad=True)
    (x * y).sum().backward()
    assert np.asarray(x.grad).dtype == np.float32
    assert np.asarray(y.grad).dtype == np.float64


def test_wrap_pure_single_output():
    import jax.numpy as jnp

    x = pdn.Tensor(np.random.randn(4, 3), requires_grad=True)
    y = pdn.wrap_pure(lambda a: jnp.sin(a) * 2.0, x)
    y.sum().backward()
    _close(x.grad, 2 * np.cos(x.numpy()))


def test_wrap_pure_multi_output():
    import jax.numpy as jnp

    x = pdn.Tensor(np.random.randn(4), requires_grad=True)

    def f(a):
        return jnp.sin(a), jnp.cos(a)

    s, c = pdn.wrap_pure(f, x)
    (s.sum() + 2 * c.sum()).backward()
    _close(x.grad, np.cos(x.numpy()) - 2 * np.sin(x.numpy()))


def test_wrap_pure_multi_output_partial_use():
    import jax.numpy as jnp

    x = pdn.Tensor(np.random.randn(4), requires_grad=True)
    s, c = pdn.wrap_pure(lambda a: (jnp.sin(a), jnp.cos(a)), x)
    s.sum().backward()
    _close(x.grad, np.cos(x.numpy()))


def test_remat_pure_matches_wrap_pure():
    """remat_pure = wrap_pure + jax.checkpoint: identical values and grads
    (the checkpoint only changes WHEN the segment recomputes, not what)."""
    import jax.numpy as jnp

    def g(a, b):
        return jnp.tanh(a @ b) @ b.T

    rng = np.random.default_rng(0)
    a_np = rng.standard_normal((4, 5)).astype(np.float32)
    b_np = rng.standard_normal((5, 6)).astype(np.float32)

    a1 = pdn.Tensor(a_np, requires_grad=True)
    b1 = pdn.Tensor(b_np, requires_grad=True)
    pdn.wrap_pure(g, a1, b1).sum().backward()

    a2 = pdn.Tensor(a_np, requires_grad=True)
    b2 = pdn.Tensor(b_np, requires_grad=True)
    pdn.remat_pure(g, a2, b2).sum().backward()

    np.testing.assert_array_equal(np.asarray(a1.grad), np.asarray(a2.grad))
    np.testing.assert_array_equal(np.asarray(b1.grad), np.asarray(b2.grad))


def test_remat_pure_multi_output_under_jit():
    """remat_pure composes with pdn.jit (checkpointed segment inside one
    compiled train-step program) and with multi-output stash-and-fire."""
    import jax.numpy as jnp

    w_np = np.random.default_rng(1).standard_normal((3, 3)).astype(np.float32)

    def make_step(remat):
        w = pdn.Tensor(w_np.copy(), requires_grad=True)

        def step(x):
            op = pdn.remat_pure if remat else pdn.wrap_pure
            s, c = op(lambda a: (jnp.sin(a @ w_np), jnp.cos(a)), x)
            y = (s * c).sum() + (x @ w).sum()
            y.backward()
            return y, pdn.Tensor(w.grad, device=w.device)

        return pdn.jit(step)

    x_np = np.random.default_rng(2).standard_normal((2, 3)).astype(np.float32)
    y0, g0 = make_step(False)(pdn.Tensor(x_np))
    y1, g1 = make_step(True)(pdn.Tensor(x_np))
    np.testing.assert_allclose(y0.item(), y1.item(), rtol=1e-6)
    np.testing.assert_array_equal(g0.numpy(), g1.numpy())
