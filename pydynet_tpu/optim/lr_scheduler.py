"""LR schedulers (parity with /root/reference/pydynet/optim/lr_scheduler.py).

Schedulers run host-side between compiled steps; because ``Optimizer.lr`` is
backed by a traced f32 scalar, changing it does NOT recompile the jitted
train step.
"""
import weakref
from collections import Counter
from functools import wraps
from math import cos, pi
from typing import List

from .optimizer import Optimizer


class _LRScheduler:

    def __init__(self, optimizer: Optimizer, last_epoch: int = -1) -> None:
        self.optimizer = optimizer
        self.last_epoch = last_epoch

        if self.last_epoch == -1:
            self.optimizer.initial_lr = self.optimizer.lr
        else:
            assert hasattr(self.optimizer, "initial_lr"), \
                "last_epoch != -1 but no 'initial_lr' attribute in optimizer!"

        # count optimizer.step() calls via a weakref-based wrapper, like the
        # reference (lr_scheduler.py:28-55); note that under pydynet_tpu.jit
        # the Python-level step() runs only at trace time, so this counter
        # is diagnostic only.
        def with_counter(method):
            if getattr(method, "_with_counter", False):
                return method
            instance_ref = weakref.ref(method.__self__)
            func = method.__func__
            cls = instance_ref().__class__
            del method

            @wraps(func)
            def wrapper(*args, **kwargs):
                instance = instance_ref()
                instance._step_count += 1
                wrapped = func.__get__(instance, cls)
                return wrapped(*args, **kwargs)

            wrapper._with_counter = True
            return wrapper

        self.optimizer.step = with_counter(self.optimizer.step)
        self.optimizer._step_count = 0
        self._step_count = 0
        self.step()

    def step(self):
        self._step_count += 1

        class _enable_get_lr_call:
            def __init__(self, o):
                self.o = o

            def __enter__(self):
                self.o._get_lr_called_within_step = True
                return self

            def __exit__(self, exc_type, exc_value, traceback):
                self.o._get_lr_called_within_step = False

        with _enable_get_lr_call(self):
            self.last_epoch += 1
            lr = self.get_lr()

        self._last_lr = self.optimizer.lr
        self.optimizer.lr = lr

    def get_lr(self):
        raise NotImplementedError

    def get_last_lr(self):
        return self._last_lr


class ExponentialLR(_LRScheduler):

    def __init__(self, optimizer: Optimizer, gamma: float = 0.1,
                 last_epoch: int = -1) -> None:
        self.gamma = gamma
        super().__init__(optimizer, last_epoch)

    def get_lr(self):
        return self.optimizer.lr * self.gamma**self.last_epoch


class StepLR(_LRScheduler):

    def __init__(self, optimizer: Optimizer, step_size: int,
                 gamma: float = 0.1, last_epoch: int = -1) -> None:
        self.step_size = step_size
        self.gamma = gamma
        super().__init__(optimizer, last_epoch)

    def get_lr(self):
        return self.optimizer.lr * self.gamma**(self.last_epoch //
                                                self.step_size)


class MultiStepLR(_LRScheduler):

    def __init__(self, optimizer: Optimizer, milestones: List[int],
                 gamma: float = 0.1, last_epoch: int = -1) -> None:
        self.milestones = Counter(milestones)
        self.gamma = gamma
        super().__init__(optimizer, last_epoch)

    def get_lr(self):
        if self.last_epoch not in self.milestones:
            return self.optimizer.lr
        return self.optimizer.lr * self.gamma**self.milestones[self.last_epoch]


class CosineAnnealingLR(_LRScheduler):

    def __init__(self, optimizer: Optimizer, T_max: int, eta_min: float = 0,
                 last_epoch: int = -1) -> None:
        self.T_max = T_max
        self.eta_min = eta_min
        super().__init__(optimizer, last_epoch)

    def get_lr(self):
        base_lr = self.optimizer.initial_lr
        if self.last_epoch == 0:
            return base_lr
        elif (self.last_epoch - 1 - self.T_max) % (2 * self.T_max) == 0:
            return self.get_last_lr() + (base_lr - self.eta_min) * (
                1 - cos(pi / self.T_max)) / 2
        return (1 + cos(pi * self.last_epoch / self.T_max)) / (
            1 + cos(pi * (self.last_epoch - 1) / self.T_max)) * (
                self.get_last_lr() - self.eta_min) + self.eta_min
