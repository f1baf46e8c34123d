"""Weight initializers (parity with /root/reference/pydynet/nn/init.py:6-92).

Draws come from NumPy's *global* RNG so ``np.random.seed`` reproduces the
reference's initialization streams exactly; the result is cast to the
parameter's dtype on assignment (the reference gets the same cast from
in-place ndarray assignment).
"""
import math

import numpy as np

from ..autograd import no_grad
from ..core.tensor import Tensor


def calculate_gain(nonlinearity: str, param: float = None) -> float:
    return {
        "linear": 1,
        "conv1d": 1,
        "conv2d": 1,
        "sigmoid": 1,
        "tanh": 5 / 3,
        "relu": math.sqrt(2.),
        "leaky_relu":
        math.sqrt(2. / (1 + (param if param is not None else 0.01)**2)),
    }[nonlinearity]


def _calculate_fan(tensor: Tensor):
    assert tensor.ndim >= 2
    fan_in, fan_out = tensor.shape[:2]
    if tensor.ndim > 2:
        receptive_field_size = math.prod(tensor.shape[2:])
        fan_in *= receptive_field_size
        fan_out *= receptive_field_size
    return fan_in, fan_out


@no_grad()
def _assign(tensor: Tensor, value) -> Tensor:
    tensor.data = np.asarray(value, dtype=tensor.dtype)
    return tensor


def uniform_(tensor: Tensor, a: float = 0., b: float = 1.) -> Tensor:
    return _assign(tensor, np.random.uniform(a, b, tensor.shape))


def normal_(tensor: Tensor, mean: float = 0., std: float = 1.) -> Tensor:
    return _assign(tensor, np.random.normal(mean, std, size=tensor.shape))


def constant_(tensor: Tensor, val: float) -> Tensor:
    return _assign(tensor, np.full(tensor.shape, val))


def ones_(tensor: Tensor) -> Tensor:
    return constant_(tensor, 1.)


def zeros_(tensor: Tensor) -> Tensor:
    return constant_(tensor, 0.)


def xavier_uniform_(tensor: Tensor, gain: float = 1.) -> Tensor:
    fan_in, fan_out = _calculate_fan(tensor)
    bound = gain * math.sqrt(6. / (fan_in + fan_out))
    return uniform_(tensor, -bound, bound)


def xavier_normal_(tensor: Tensor, gain: float = 1.) -> Tensor:
    fan_in, fan_out = _calculate_fan(tensor)
    std = gain * math.sqrt(2 / (fan_in + fan_out))
    return normal_(tensor, std=std)


def _fan(tensor, mode):
    fan_in, fan_out = _calculate_fan(tensor)
    return {"fan_in": fan_in, "fan_out": fan_out}[mode]


def kaiming_uniform_(tensor: Tensor,
                     a: float = 0.,
                     mode: str = "fan_in",
                     nonlinearity: str = "relu") -> Tensor:
    gain = calculate_gain(nonlinearity, a)
    bound = gain * math.sqrt(3. / _fan(tensor, mode))
    return uniform_(tensor, -bound, bound)


def kaiming_normal_(tensor: Tensor,
                    a: float = 0.,
                    mode: str = "fan_in",
                    nonlinearity: str = "relu") -> Tensor:
    gain = calculate_gain(nonlinearity, a)
    std = gain / math.sqrt(_fan(tensor, mode))
    return normal_(tensor, std=std)
