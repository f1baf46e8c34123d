"""Learning-rate schedulers.

Same schedules and update formulas as the reference
(/root/reference/pydynet/optim/lr_scheduler.py:90-160), including its
recursive multiplicative forms and the one-step-lagged ``_last_lr`` read in
the cosine schedule, which we reproduce faithfully (see
tests/test_optim.py::test_scheduler_cosine_annealing).

Structural differences from the reference: our optimizers count their own
``step()`` calls (optimizer.py), so no method-wrapping machinery is needed;
and because ``Optimizer.lr`` is backed by a traced f32 scalar, scheduler
updates never recompile a jitted train step.
"""
from __future__ import annotations

from collections import Counter
from math import cos, pi
from typing import List

from .optimizer import Optimizer


class _LRScheduler:
    """Base: tracks epochs, recomputes ``optimizer.lr`` on each step().

    Construction performs the initial step() (last_epoch -1 -> 0), matching
    the reference/PyTorch convention.
    """

    def __init__(self, optimizer: Optimizer, last_epoch: int = -1) -> None:
        self.optimizer = optimizer
        self.last_epoch = last_epoch
        if last_epoch == -1:
            optimizer.initial_lr = optimizer.lr
        elif not hasattr(optimizer, "initial_lr"):
            raise AttributeError(
                "last_epoch != -1 but optimizer has no 'initial_lr'")
        else:
            # resume: recursive schedulers (Cosine) derive lr(t) from
            # lr(t-1) via get_last_lr(); seed it from the optimizer's
            # restored lr so the construction-time step() doesn't crash
            # (deliberate fix — the reference crashes on every
            # last_epoch != -1 cosine resume, lr_scheduler.py analogue)
            self._last_lr = optimizer.lr
        self._step_count = 0
        self._get_lr_called_within_step = False
        self.step()

    def step(self) -> None:
        self._step_count += 1
        self.last_epoch += 1
        self._get_lr_called_within_step = True
        try:
            new_lr = self.get_lr()
        finally:
            self._get_lr_called_within_step = False
        self._last_lr = self.optimizer.lr
        self.optimizer.lr = new_lr

    def get_lr(self) -> float:
        raise NotImplementedError

    def get_last_lr(self) -> float:
        return self._last_lr

    def state_dict(self) -> dict:
        """Scheduler state for EXACT resume (PyTorch contract: everything
        but the optimizer ref).  The recursive schedulers carry a lagged
        ``_last_lr`` the reference semantics depend on, so resuming via
        ``last_epoch=`` alone continues crash-free but not bit-exact;
        restoring this dict (plus the optimizer's lr) is bit-exact."""
        return {k: v for k, v in self.__dict__.items() if k != "optimizer"}

    def load_state_dict(self, state: dict) -> None:
        self.__dict__.update(state)


class ExponentialLR(_LRScheduler):
    """lr <- lr * gamma^epoch (recursive reference form)."""

    def __init__(self, optimizer: Optimizer, gamma: float = 0.1,
                 last_epoch: int = -1) -> None:
        self.gamma = gamma
        super().__init__(optimizer, last_epoch)

    def get_lr(self) -> float:
        return self.optimizer.lr * self.gamma ** self.last_epoch


class StepLR(_LRScheduler):
    """lr <- lr * gamma^(epoch // step_size)."""

    def __init__(self, optimizer: Optimizer, step_size: int,
                 gamma: float = 0.1, last_epoch: int = -1) -> None:
        self.step_size = step_size
        self.gamma = gamma
        super().__init__(optimizer, last_epoch)

    def get_lr(self) -> float:
        return self.optimizer.lr * self.gamma ** (self.last_epoch //
                                                  self.step_size)


class MultiStepLR(_LRScheduler):
    """Multiply by gamma at each milestone epoch."""

    def __init__(self, optimizer: Optimizer, milestones: List[int],
                 gamma: float = 0.1, last_epoch: int = -1) -> None:
        self.milestones = Counter(milestones)
        self.gamma = gamma
        super().__init__(optimizer, last_epoch)

    def get_lr(self) -> float:
        hits = self.milestones.get(self.last_epoch, 0)
        return self.optimizer.lr * self.gamma ** hits


class CosineAnnealingLR(_LRScheduler):
    """Recursive cosine annealing toward eta_min over T_max epochs, with
    warm-restart handling at (1 + 2k) * T_max boundaries."""

    def __init__(self, optimizer: Optimizer, T_max: int, eta_min: float = 0,
                 last_epoch: int = -1) -> None:
        self.T_max = T_max
        self.eta_min = eta_min
        super().__init__(optimizer, last_epoch)

    def get_lr(self) -> float:
        t, T = self.last_epoch, self.T_max
        base_lr = self.optimizer.initial_lr
        if t == 0:
            return base_lr
        if (t - 1 - T) % (2 * T) == 0:  # restart boundary
            return self.get_last_lr() + (base_lr - self.eta_min) * (
                1 - cos(pi / T)) / 2
        ratio = (1 + cos(pi * t / T)) / (1 + cos(pi * (t - 1) / T))
        return ratio * (self.get_last_lr() - self.eta_min) + self.eta_min
