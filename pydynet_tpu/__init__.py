"""pydynet_tpu — a TPU-native deep-learning framework with the full
capabilities of PyDyNet (reference: /root/reference, WeltXing/PyDyNet).

PyTorch-style eager API (``Tensor``, dynamic autograd ``backward()``,
``no_grad``, ``nn.Module``, ``optim``, ``data``) whose execution model is
JAX/XLA-first: ops trace to XLA, hot kernels are Pallas TPU kernels, whole
train/decode steps compile with :func:`pydynet_tpu.jit`, and multi-chip
scale-out rides ``jax.sharding`` meshes (``pydynet_tpu.parallel``).

Public surface mirrors /root/reference/pydynet/__init__.py:10-17.
"""
from . import _config  # noqa: F401  -- must run first (x64 dtype parity)

from .core import (Tensor, add, sub, mul, div, pow, matmul, abs, sum, mean,
                   min, max, argmax, argmin, maximum, minimum, exp, log,
                   sign, reshape, transpose, swapaxes, concat, sigmoid, tanh,
                   sqrt, square, vsplit, hsplit, dsplit, split, unsqueeze,
                   squeeze, wrap_pure, remat_pure, Graph)
from .special import zeros, ones, rand, randn, empty, uniform
from .device import Device
from .autograd import enable_grad, no_grad, is_grad_enable, set_grad_enabled
from .jit import jit
from .random import manual_seed, Generator
from . import cuda
from . import special
from . import random
from . import core
from . import nn
from . import optim
from . import data
from . import ops
from . import parallel
from . import utils

__all__ = [
    "Tensor", "add", "sub", "mul", "div", "pow", "matmul", "abs", "sum",
    "mean", "min", "max", "argmax", "argmin", "maximum", "minimum", "exp",
    "log", "sign", "reshape", "transpose", "swapaxes", "concat", 'sigmoid',
    'tanh', "sqrt", "square", "vsplit", "hsplit", "dsplit", "split",
    "unsqueeze", "squeeze", "zeros", "ones", "rand", "randn", "empty",
    "uniform", "Device", "enable_grad", "no_grad",
    # TPU-native extensions beyond the reference surface
    "jit", "manual_seed", "Generator", "wrap_pure", "remat_pure",
]

__version__ = "0.2.0"


def __getattr__(name):
    # lazy: materializing the default PRNG generator creates a device array,
    # which must not happen as an import side effect (see random.py)
    if name == "default_generator":
        return random.default_generator
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
