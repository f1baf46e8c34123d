"""Forward parity of binary ops and matmul vs NumPy, including broadcasting,
missing leading dims, dtype promotion, and NaN propagation.

Mirrors the coverage of the reference's tests/test_tensor_basic.py.
"""
import random
from itertools import product

import numpy as np
import pytest

import pydynet_tpu as pdn

np.random.seed(0)
random.seed(0)

TYPES = [np.float16, np.float32, np.float64]


def broadcastable_pair(rng, max_dim=4, max_size=5, matmul=False):
    ndim = random.randint(0, max_dim)
    s1, s2 = [], []
    for _ in range(ndim):
        if random.random() < 0.5:
            a, b = random.choice([(1, random.randint(1, max_size)),
                                  (random.randint(1, max_size), 1)])
        else:
            a = b = random.randint(1, max_size)
        s1.append(a)
        s2.append(b)
    if matmul:
        m, n, p = (random.randint(1, max_size) for _ in range(3))
        s1 += [m, n]
        s2 += [n, p]
        s1 = s1[random.randint(0, len(s1) - 2):]
    else:
        s1 = s1[random.randint(0, len(s1)):]
    return tuple(s1), tuple(s2)


def gen_pairs(n, matmul=False, seed=42):
    rng = np.random.default_rng(seed)
    pairs = []
    for _ in range(n):
        sh1, sh2 = broadcastable_pair(rng, matmul=matmul)
        a = rng.standard_normal(sh1).astype(rng.choice(TYPES))
        b = rng.standard_normal(sh2).astype(rng.choice(TYPES))
        pairs.append((a, b))
    return pairs


FUNCS = [(pdn.add, np.add), (pdn.sub, np.subtract), (pdn.mul, np.multiply),
         (pdn.div, np.divide), (pdn.pow, np.power),
         (pdn.maximum, np.maximum), (pdn.minimum, np.minimum)]


@pytest.mark.parametrize("a, b, pdn_func, np_func",
                         [(a, b, pf, nf)
                          for (a, b), (pf, nf) in product(gen_pairs(8), FUNCS)])
@pytest.mark.filterwarnings("ignore:invalid value")
@pytest.mark.filterwarnings("ignore:divide by zero")
def test_binary_operator(a, b, pdn_func, np_func):
    with np.errstate(all="ignore"):
        expected = np_func(a, b)
    out = pdn_func(pdn.Tensor(a), pdn.Tensor(b))
    assert out.shape == expected.shape
    assert out.dtype == expected.dtype
    assert np.allclose(out.data, expected, equal_nan=True)


@pytest.mark.parametrize("a, b", gen_pairs(8, matmul=True))
def test_matmul(a, b):
    expected = np.matmul(a, b)
    out = pdn.matmul(pdn.Tensor(a), pdn.Tensor(b))
    assert out.shape == expected.shape
    assert out.dtype == expected.dtype
    assert np.allclose(out.data, expected, equal_nan=True, atol=1e-3)


def test_scalar_operand_keeps_peer_dtype():
    x = pdn.Tensor(np.ones((2, 3), np.float32))
    for out in [x + 1, 1 + x, x * 2, 2 * x, x / 2, x**2, 2.0**x, x - 1]:
        assert out.dtype == np.float32


def test_dunder_matches_functional():
    a = np.random.randn(3, 4)
    b = np.random.randn(4, 5)
    ta, tb = pdn.Tensor(a), pdn.Tensor(b)
    assert np.allclose((ta @ tb).data, a @ b)
    assert np.allclose((-ta).data, -a)
    assert np.allclose((+ta).data, a)
    assert np.allclose(abs(ta).data, np.abs(a))


def test_comparisons_return_bool_tensors():
    a = pdn.Tensor(np.array([1.0, 2.0, 3.0]))
    b = pdn.Tensor(np.array([2.0, 2.0, 2.0]))
    assert (a < b).dtype == np.bool_
    assert (a.eq(b)).numpy().tolist() == [False, True, False]
    assert (a.ne(b)).numpy().tolist() == [True, False, True]
    assert not (a < b).requires_grad


def test_tensor_of_tensor_forbidden():
    t = pdn.Tensor([1.0])
    with pytest.raises(TypeError):
        pdn.Tensor(t)


def test_int_tensor_cannot_require_grad():
    with pytest.raises(ValueError):
        pdn.Tensor(np.array([1, 2]), requires_grad=True)


def test_item_numpy_len_repr():
    t = pdn.Tensor(np.arange(6, dtype=np.float32).reshape(2, 3))
    assert len(t) == 2
    assert t.numpy().shape == (2, 3)
    assert t.sum().item() == 15.0
    assert "Tensor" in repr(t)
    assert t.strides == (12, 4)
    assert t.size == 6


def test_inplace_forbidden_on_grad_node():
    t = pdn.Tensor(np.ones(3), requires_grad=True)
    with pytest.raises(ValueError):
        t += 1
    with pytest.raises(ValueError):
        t[0] = 5.0
    with pdn.no_grad():
        t2 = pdn.Tensor(np.ones(3))
        t2 += 1
        assert np.allclose(t2.data, 2)


def test_setitem_and_data_proxy():
    t = pdn.Tensor(np.zeros((3, 4), np.float32))
    t[1, 2] = 7.0
    assert t.numpy()[1, 2] == 7.0
    t.data[...] = 1.0
    assert np.allclose(np.asarray(t.data), 1.0)
    t.data[0] = np.arange(4, dtype=np.float32)
    assert np.allclose(t.numpy()[0], [0, 1, 2, 3])
    # x.data -= y style rebinding
    t.data -= 1.0
    assert t.numpy()[1, 0] == 0.0


def test_boolean_mask_setitem():
    # the reference transformer example does mask[mask.eq(1)] = -inf
    t = pdn.Tensor(np.array([[0.0, 1.0], [1.0, 0.0]]))
    t[t.eq(1)] = np.float64("-inf")
    assert np.array_equal(np.isinf(t.numpy()),
                          [[False, True], [True, False]])


def test_negative_step_slice_and_grad():
    x = pdn.Tensor(np.arange(5, dtype=np.float64), requires_grad=True)
    y = x[::-1]
    assert np.array_equal(y.numpy(), [4, 3, 2, 1, 0])
    (y * pdn.Tensor(np.array([1.0, 0, 0, 0, 2]))).sum().backward()
    assert np.array_equal(x.grad, [2, 0, 0, 0, 1])


def test_getitem_with_none_and_ellipsis():
    x = pdn.Tensor(np.arange(6, dtype=np.float64).reshape(2, 3))
    assert x[None].shape == (1, 2, 3)
    assert x[..., 0].shape == (2,)
    assert x[:, [2, 0]].numpy().tolist() == [[2, 0], [5, 3]]
