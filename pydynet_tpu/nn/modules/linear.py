"""Linear / Embedding (parity with /root/reference/pydynet/nn/modules/linear.py).

Weight layout is (in_features, out_features) — the reference's convention,
not PyTorch's — so ``x @ W`` feeds the MXU directly with no transpose.
"""
import math

from .module import Module
from ..parameter import Parameter
from .. import init, functional as F
from ...core.tensor import Tensor
from ...special import empty
from ...device import Device
from ...autograd import no_grad


class Linear(Module):

    def __init__(self,
                 in_features: int,
                 out_features: int,
                 bias: bool = True,
                 device=None,
                 dtype=None) -> None:
        super().__init__()
        self.in_features = in_features
        self.out_features = out_features
        kwargs = {"device": Device(device), "dtype": dtype}
        self.weight = Parameter(
            empty((in_features, out_features), **kwargs))
        self.bias = Parameter(empty(out_features, **kwargs)) if bias else None
        self.reset_parameters()

    def reset_parameters(self):
        # kaiming_uniform with a=sqrt(5) — reference linear.py:32-37
        init.kaiming_uniform_(self.weight, a=math.sqrt(5))
        if self.bias is not None:
            fan_in, _ = init._calculate_fan(self.weight)
            bound = 1 / math.sqrt(fan_in) if fan_in > 0 else 0
            init.uniform_(self.bias, -bound, bound)

    # reference spells it "reset_paramters" (linear.py:31); keep an alias
    reset_paramters = reset_parameters

    def forward(self, x: Tensor) -> Tensor:
        return F.linear(x, self.weight, self.bias)

    def __repr__(self) -> str:
        return "Linear(in_features={}, out_features={}, bias={})".format(
            self.in_features, self.out_features, self.bias is not None)


class Embedding(Module):

    def __init__(self,
                 num_embeddings: int,
                 embedding_dim: int,
                 padding_idx=None,
                 device=None,
                 dtype=None) -> None:
        super().__init__()
        self.num_embedding = num_embeddings
        self.embedding_dim = embedding_dim
        self.padding_idx = padding_idx
        kwargs = {"device": Device(device), "dtype": dtype}
        self.weight = Parameter(
            empty((num_embeddings, embedding_dim), **kwargs))
        # the reference leaves the table as np.empty garbage unless loaded
        # (linear.py:47-79 never calls reset); we initialize N(0,1) so
        # training-from-scratch paths work deterministically
        self.reset_parameters()

    def reset_parameters(self) -> None:
        init.normal_(self.weight)
        self._fill_padding_idx_with_zero()

    def _fill_padding_idx_with_zero(self) -> None:
        if self.padding_idx is not None:
            with no_grad():
                self.weight.data[self.padding_idx] = 0.0

    def forward(self, x: Tensor) -> Tensor:
        return F.embedding(x, self.weight, self.padding_idx)

    def __repr__(self) -> str:
        return "Embedding(num_embeddings={}, embedding_dim={})".format(
            self.num_embedding, self.embedding_dim)
