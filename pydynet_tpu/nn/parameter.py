"""Parameter: a Tensor registered by Modules, requires_grad by default.

Parity with /root/reference/pydynet/nn/parameter.py:4-17 (no-copy wrap).
"""
from ..core.tensor import Tensor


class Parameter(Tensor):

    def __init__(self, data, requires_grad: bool = True) -> None:
        if isinstance(data, Tensor):
            # share the underlying buffer, keep dtype/device
            super().__init__(data._data,
                             dtype=None,
                             device=data.device,
                             requires_grad=requires_grad)
        else:
            super().__init__(data, requires_grad=requires_grad)

    def __repr__(self) -> str:
        return "Parameter : \n{}".format(self.numpy()) + (
            ",\ndevice={}".format(self.device)
            if self.device.kind != "cpu" else "")
