"""Loss modules (parity with /root/reference/pydynet/nn/modules/loss.py)."""
from .module import Module
from .. import functional as F
from ...core.tensor import Tensor


class Loss(Module):

    def __init__(self, reduction: str = "mean") -> None:
        super().__init__()
        self.reduction = reduction
        assert self.reduction in {"mean", "sum"}

    def forward(self, y_pred: Tensor, y_true: Tensor) -> Tensor:
        raise NotImplementedError


class MSELoss(Loss):

    def forward(self, y_pred: Tensor, y_true: Tensor) -> Tensor:
        return F.mse_loss(y_pred, y_true, reduction=self.reduction)


class NLLLoss(Loss):

    def forward(self, y_pred: Tensor, y_true: Tensor) -> Tensor:
        return F.nll_loss(y_pred, y_true, reduction=self.reduction)


class CrossEntropyLoss(Loss):

    def forward(self, y_pred: Tensor, y_true: Tensor) -> Tensor:
        return F.cross_entropy_loss(y_pred, y_true, reduction=self.reduction)


def criterion_cache_key(criterion):
    """Recompile key for jitted train steps that close over a criterion.

    Parameterless ``Loss`` modules are pure functions of
    (type, reduction) — keying them by identity would recompile every step
    when callers pass a fresh instance per call.  Arbitrary callables keep
    identity keying (their behavior isn't introspectable)."""
    if criterion is None:
        return None
    if type(criterion).__module__ == __name__ and isinstance(criterion,
                                                             Loss):
        return (type(criterion), criterion.reduction)
    return criterion
