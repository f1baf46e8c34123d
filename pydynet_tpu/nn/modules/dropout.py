"""Inverted dropout.

Same semantics as /root/reference/pydynet/nn/modules/dropout.py:13-17, but
the mask comes from the framework's device-side Generator (not NumPy's global
RNG) so it stays random *inside* jit-compiled train steps — the key state is
threaded through the compiled program functionally.
"""
from .module import Module
from ...core.tensor import Tensor
from .. import functional as F


class Dropout(Module):

    def __init__(self, p: float = 0.5) -> None:
        super().__init__()
        assert 0 <= p < 1
        self.p = p

    def forward(self, x: Tensor) -> Tensor:
        return F.dropout(x, self.p, training=self._train)

    def __repr__(self) -> str:
        return "{}(p={})".format(self.__class__.__name__, self.p)
