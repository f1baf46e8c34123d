"""Conv1d / Conv2d modules (parity with /root/reference/pydynet/nn/modules/conv.py).

Bias is broadcast-shaped (1,C,1[,1]) like the reference (conv.py:34-35,87-88);
the convolution itself is a single XLA conv node (see nn/functional.py).
"""
import math

from .module import Module
from ..parameter import Parameter
from .. import init, functional as F
from ...special import empty
from ...device import Device


class _ConvNd(Module):
    _ndim_sp = None

    def __init__(self, in_channels, out_channels, kernel_size, stride=1,
                 padding=0, bias=True, device=None, dtype=None) -> None:
        super().__init__()
        kwargs = {"device": Device(device), "dtype": dtype}
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.kernel_size = kernel_size
        self.padding = padding
        self.stride = stride
        wshape = (out_channels, in_channels) + (kernel_size,) * self._ndim_sp
        self.weight = Parameter(empty(wshape, **kwargs))
        bshape = (1, out_channels) + (1,) * self._ndim_sp
        self.bias = Parameter(empty(bshape, **kwargs)) if bias else None
        self.reset_parameters()

    def reset_parameters(self):
        init.kaiming_uniform_(self.weight, a=math.sqrt(5))
        if self.bias is not None:
            fan_in, _ = init._calculate_fan(self.weight)
            if fan_in != 0:
                bound = 1 / math.sqrt(fan_in)
                init.uniform_(self.bias, -bound, bound)

    def __repr__(self) -> str:
        return ("{}(in_channels={}, out_channels={}, kernel_size={}, "
                "padding={}, stride={}, bias={})").format(
                    self.__class__.__name__, self.in_channels,
                    self.out_channels, self.kernel_size, self.padding,
                    self.stride, self.bias is not None)


class Conv1d(_ConvNd):
    _ndim_sp = 1

    def forward(self, x):
        out = F.conv1d(x, self.weight, self.padding, self.stride)
        return out + self.bias if self.bias is not None else out


class Conv2d(_ConvNd):
    _ndim_sp = 2

    def forward(self, x):
        out = F.conv2d(x, self.weight, self.padding, self.stride)
        return out + self.bias if self.bias is not None else out
