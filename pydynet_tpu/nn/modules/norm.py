"""Normalization layers (parity with /root/reference/pydynet/nn/modules/norm.py).

Running-statistic updates use in-place ops on non-grad Parameters exactly like
the reference (norm.py:65-68) — under ``pydynet_tpu.jit`` those become
functional state threading, so BatchNorm trains correctly inside one compiled
XLA step.  The reference's LayerNorm normalizes over the *leading* axes and
keeps running stats (norm.py:203-218) — a nonstandard choice we preserve;
CLIP uses its own standard last-axis LayerNorm (models/clip).

Note: reference BatchNorm2d passes its scale shape as varargs into
``empty`` (norm.py:~141), which raises TypeError there; we construct the
intended (1,C,1,1) parameter.
"""
from .module import Module
from ..parameter import Parameter
from .. import init
from ...special import empty
from ... import core
from ...device import Device


class _BatchNorm(Module):

    def __init__(self, num_features: int, stat_shape, reduce_axes,
                 keepdims: bool, eps: float, momentum: float, device,
                 dtype) -> None:
        super().__init__()
        kwargs = {"device": Device(device), "dtype": dtype}
        self.num_features = num_features
        self.eps = eps
        self.momentum = momentum
        self._axes = reduce_axes
        self._keepdims = keepdims
        self.running_mean = Parameter(empty(stat_shape, **kwargs),
                                      requires_grad=False)
        self.running_var = Parameter(empty(stat_shape, **kwargs),
                                     requires_grad=False)
        self.scale = Parameter(empty(stat_shape, **kwargs))
        self.shift = Parameter(empty(stat_shape, **kwargs))
        self.reset_parameters()

    def reset_parameters(self):
        init.zeros_(self.running_mean)
        init.ones_(self.running_var)
        init.zeros_(self.shift)
        init.ones_(self.scale)

    def forward(self, x):
        if self._train:
            if self._axes == 0 and x.ndim == 2 and x.device.kind == "accel":
                # fused single-kernel Pallas path (norm + both reductions +
                # batch-stat outputs in one launch)
                from ...ops import batchnorm as _bn
                eps = self.eps

                def fused(xd, g, b):
                    return _bn.batch_norm_train(xd, g.reshape(1, -1),
                                                b.reshape(1, -1), eps)

                out, mean, var = core.wrap_pure(fused, x, self.scale,
                                                self.shift)
                stat_shape = self.running_mean.shape
                self.running_mean *= (1 - self.momentum)
                self.running_mean += (self.momentum *
                                      mean._data.reshape(stat_shape))
                self.running_var *= (1 - self.momentum)
                self.running_var += (self.momentum *
                                     var._data.reshape(stat_shape))
                return out

            mean = x.mean(self._axes, keepdims=self._keepdims)
            center = x - mean
            var = core.mean(core.square(center), self._axes,
                            keepdims=self._keepdims)
            std_data = center / core.sqrt(var + self.eps)

            self.running_mean *= (1 - self.momentum)
            self.running_mean += self.momentum * mean.data
            self.running_var *= (1 - self.momentum)
            self.running_var += self.momentum * var.data

            return std_data * self.scale + self.shift
        return (x - self.running_mean) * self.scale / core.sqrt(
            self.running_var + self.eps) + self.shift

    def __repr__(self) -> str:
        return "{}(num_features={}, momentum={})".format(
            self.__class__.__name__, self.num_features, self.momentum)


class BatchNorm1d(_BatchNorm):
    """Feature-axis stats over (N, F) inputs (reference norm.py:58-73)."""

    def __init__(self, num_features: int, eps: float = 1e-6,
                 momentum: float = 0.1, device=None, dtype=None) -> None:
        super().__init__(num_features, num_features, 0, False, eps, momentum,
                         device, dtype)


class BatchNorm2d(_BatchNorm):
    """(N, H, W) stats over (N, C, H, W) inputs (reference norm.py:132-147)."""

    def __init__(self, num_features: int, eps: float = 1e-6,
                 momentum: float = 0.1, device=None, dtype=None) -> None:
        super().__init__(num_features, (1, num_features, 1, 1), (0, 2, 3),
                         True, eps, momentum, device, dtype)


class LayerNorm(Module):
    """Reference-style LayerNorm: stats over *leading* axes + running stats
    (norm.py:203-218)."""

    def __init__(self, normalized_shape, eps: float = 1e-6,
                 momentum: float = 0.1, device=None, dtype=None) -> None:
        super().__init__()
        kwargs = {"device": Device(device), "dtype": dtype}
        if isinstance(normalized_shape, int):
            normalized_shape = (normalized_shape,)
        self.normalized_shape = tuple(normalized_shape)
        self.eps = eps
        self.momentum = momentum
        self.running_mean = Parameter(empty(self.normalized_shape, **kwargs),
                                      requires_grad=False)
        self.running_var = Parameter(empty(self.normalized_shape, **kwargs),
                                     requires_grad=False)
        self.scale = Parameter(empty(self.normalized_shape, **kwargs))
        self.shift = Parameter(empty(self.normalized_shape, **kwargs))
        self.reset_parameters()

    def reset_parameters(self):
        init.zeros_(self.running_mean)
        init.ones_(self.running_var)
        init.zeros_(self.shift)
        init.ones_(self.scale)

    def forward(self, x):
        if self._train:
            axis = tuple(range(x.ndim - len(self.normalized_shape)))
            mean = x.mean(axis)
            center = x - mean
            var = core.square(center).mean(axis)
            std_data = center / core.sqrt(var + self.eps)
            self.running_mean *= (1 - self.momentum)
            self.running_mean += self.momentum * mean.data
            self.running_var *= (1 - self.momentum)
            self.running_var += self.momentum * var.data
            return std_data * self.scale + self.shift
        return (x - self.running_mean) * self.scale / core.sqrt(
            self.running_var + self.eps) + self.shift


class RMSNorm(Module):
    """Trailing-axes RMS normalization, weight-only (reference norm.py:221-248)."""

    def __init__(self, normalized_shape, eps: float = 1e-6, device=None,
                 dtype=None) -> None:
        super().__init__()
        kwargs = {"device": Device(device), "dtype": dtype}
        if isinstance(normalized_shape, int):
            normalized_shape = (normalized_shape,)
        self.normalized_shape = tuple(normalized_shape)
        self.sum_axis = tuple(-(i + 1)
                              for i in range(len(self.normalized_shape)))
        self.eps = eps
        self.weight = Parameter(empty(self.normalized_shape, **kwargs))
        self.reset_parameters()

    def reset_parameters(self):
        init.ones_(self.weight)

    def forward(self, x):
        z = core.square(x).mean(self.sum_axis, keepdims=True)
        z = x / core.sqrt(z + self.eps)
        return z * self.weight
