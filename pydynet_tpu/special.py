"""Factory functions (API parity with /root/reference/pydynet/special.py:6-99).

Creation happens host-side through NumPy (including its *global* RNG so
``np.random.seed`` keeps controlling initialization, as the reference's users
expect) and the result is placed on the requested device.  Device-side,
trace-safe randomness (Dropout under ``jit``) goes through
``pydynet_tpu.random`` instead.
"""
import numpy as np

from .core.tensor import Tensor


def zeros(shape, dtype=None, device=None, requires_grad: bool = False):
    return Tensor(np.zeros(shape, dtype=dtype),
                  device=device,
                  requires_grad=requires_grad)


def ones(shape, dtype=None, device=None, requires_grad: bool = False):
    return Tensor(np.ones(shape, dtype=dtype),
                  device=device,
                  requires_grad=requires_grad)


def full(shape, fill_value, dtype=None, device=None,
         requires_grad: bool = False):
    return Tensor(np.full(shape, fill_value, dtype=dtype),
                  device=device,
                  requires_grad=requires_grad)


def randn(*shape, dtype=None, device=None, requires_grad: bool = False):
    return Tensor(np.random.randn(*shape).astype(dtype) if dtype is not None
                  else np.random.randn(*shape),
                  device=device,
                  requires_grad=requires_grad)


def rand(*shape, dtype=None, device=None, requires_grad: bool = False):
    data = np.random.rand(*shape)
    if dtype is not None:
        data = data.astype(dtype)
    return Tensor(data, device=device, requires_grad=requires_grad)


def uniform(low: float,
            high: float,
            shape=None,
            dtype=None,
            device=None,
            requires_grad: bool = False):
    data = np.random.uniform(low, high, size=shape)
    if dtype is not None:
        data = data.astype(dtype)
    return Tensor(data, device=device, requires_grad=requires_grad)


def empty(shape, dtype=None, device=None, requires_grad: bool = False):
    # XLA buffers have no "uninitialized" state; zeros is the TPU equivalent.
    return Tensor(np.zeros(shape, dtype=dtype),
                  device=device,
                  requires_grad=requires_grad)
