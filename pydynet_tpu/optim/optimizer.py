"""Optimizers: SGD (momentum+Nesterov), Adagrad, Adadelta, Adam.

Same update rules, defaults, and imperative ``step()/zero_grad()`` API as
/root/reference/pydynet/optim/optimizer.py (SGD nesterov defaults True,
optimizer.py:67-75; Adadelta is actually RMSProp-style, :117-157; Adam bias
correction a_t = sqrt(1-b2^t)/(1-b1^t) with t starting at 1, :185-196).

TPU-native execution: all state (moment buffers, the step counter, the
learning rate) lives in Tensors, so a whole train step — forward, backward,
``optimizer.step()`` — compiles into ONE donated-buffer XLA program via
``pydynet_tpu.jit(step, state=(net, opt))``.  The learning rate is a traced
f32 scalar: schedulers can change it between compiled steps without
triggering recompilation.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core.tensor import Tensor


class Optimizer:

    def __init__(self, params) -> None:
        self.params: list[Tensor] = list(params)
        self._step_count = 0

    # learning rate as traced state (see module docstring)
    @property
    def lr(self) -> float:
        return float(np.asarray(self._lr_tensor._data))

    @lr.setter
    def lr(self, value) -> None:
        if not hasattr(self, "_lr_tensor"):
            t = Tensor(np.float32(value))
            # keep the scalar UNCOMMITTED (random.py does the same for PRNG
            # keys): Tensor.__init__ commits to CPU, and a CPU-committed
            # scalar x TPU-committed grad raises 'incompatible devices' in
            # the eager step() path
            t._data = jnp.asarray(np.float32(value))
            self.__dict__["_lr_tensor"] = t
        else:
            self._lr_tensor._data = jnp.asarray(value, jnp.float32)

    def _make_buffers(self, n: int = 1):
        """n zero buffers per param, dtype/device-matched."""
        groups = []
        for _ in range(n):
            groups.append([
                Tensor(np.zeros(p.shape, dtype=p.dtype), device=p.device)
                for p in self.params
            ])
        return groups[0] if n == 1 else groups

    def _state_tensors(self):
        out = list(self.params)
        if hasattr(self, "_lr_tensor"):
            out.append(self._lr_tensor)
        for name in ("v", "m", "G", "_t_tensor"):
            buf = getattr(self, name, None)
            if isinstance(buf, list):
                out.extend(buf)
            elif isinstance(buf, Tensor):
                out.append(buf)
        return out

    def step(self):
        raise NotImplementedError

    def zero_grad(self):
        for param in self.params:
            param.zero_grad()


class SGD(Optimizer):
    """v = m*v + lr*g;  p -= v;  nesterov (default!) additionally p -= lr*g."""

    def __init__(self, params, lr: float, momentum: float = 0.5,
                 weight_decay: float = 0., nesterov: bool = True) -> None:
        super().__init__(params)
        self.lr = lr
        self.momentum = momentum
        self.weight_decay = weight_decay
        self.nesterov = nesterov
        self.v = self._make_buffers()

    def step(self):
        lr = self._lr_tensor._data
        for p, v in zip(self.params, self.v):
            g = p.grad
            if self.weight_decay:
                g = g + self.weight_decay * p._data
            new_v = self.momentum * v._data + lr * g
            v._data = new_v.astype(v._data.dtype)
            new_p = p._data - new_v
            if self.nesterov:
                new_p = new_p - lr * g
            p._data = new_p.astype(p._data.dtype)
        self._step_count += 1


class Adagrad(Optimizer):

    def __init__(self, params, lr: float = 1e-2, weight_decay: float = 0,
                 eps: float = 1e-10) -> None:
        super().__init__(params)
        self.lr = lr
        self.weight_decay = weight_decay
        self.eps = eps
        self.G = self._make_buffers()

    def step(self):
        lr = self._lr_tensor._data
        for p, G in zip(self.params, self.G):
            g = p.grad
            if self.weight_decay:
                g = g + self.weight_decay * p._data
            new_G = G._data + g * g
            G._data = new_G.astype(G._data.dtype)
            new_p = p._data - lr * g / jnp.sqrt(self.eps + new_G)
            p._data = new_p.astype(p._data.dtype)
        self._step_count += 1


class Adadelta(Optimizer):
    """RMSProp-style accumulator, matching the reference's (mis)naming."""

    def __init__(self, params, lr: float = 1.0, rho: float = 0.9,
                 weight_decay: float = 0, eps: float = 1e-6) -> None:
        super().__init__(params)
        self.lr = lr
        self.rho = rho
        self.eps = eps
        self.weight_decay = weight_decay
        self.G = self._make_buffers()

    def step(self):
        lr = self._lr_tensor._data
        for p, G in zip(self.params, self.G):
            g = p.grad
            if self.weight_decay:
                g = g + self.weight_decay * p._data
            new_G = self.rho * G._data + (1 - self.rho) * g * g
            G._data = new_G.astype(G._data.dtype)
            new_p = p._data - lr * g / jnp.sqrt(new_G + self.eps)
            p._data = new_p.astype(p._data.dtype)
        self._step_count += 1


class Adam(Optimizer):

    def __init__(self, params, lr: float = 1e-3,
                 betas: tuple = (0.9, 0.999), eps: float = 1e-8,
                 weight_decay: float = 0) -> None:
        super().__init__(params)
        self.lr = lr
        self.beta1, self.beta2 = betas
        self.eps = eps
        self.weight_decay = weight_decay
        self.m, self.v = self._make_buffers(2)
        # bias-correction step counter, traced so jit steps keep counting;
        # uncommitted like _lr_tensor so eager TPU steps don't mix devices
        self._t_tensor = Tensor(np.float32(1.0))
        self._t_tensor._data = jnp.asarray(np.float32(1.0))

    @property
    def t(self) -> float:
        return float(np.asarray(self._t_tensor._data))

    def step(self):
        lr = self._lr_tensor._data
        t = self._t_tensor._data
        a_t = jnp.sqrt(1 - self.beta2**t) / (1 - self.beta1**t)
        for p, m, v in zip(self.params, self.m, self.v):
            g = p.grad
            if self.weight_decay:
                g = g + self.weight_decay * p._data
            new_m = self.beta1 * m._data + (1 - self.beta1) * g
            new_v = self.beta2 * v._data + (1 - self.beta2) * g * g
            m._data = new_m.astype(m._data.dtype)
            v._data = new_v.astype(v._data.dtype)
            new_p = p._data - lr * a_t * new_m / (jnp.sqrt(new_v) + self.eps)
            p._data = new_p.astype(p._data.dtype)
        self._t_tensor._data = t + 1
        self._step_count += 1


class AdamW(Adam):
    """Adam with DECOUPLED weight decay (Loshchilov & Hutter, 2019).

    Extension beyond the reference's optimizer set (its optimizers couple
    ``weight_decay`` into the gradient, i.e. classic L2): here the decay
    multiplies the parameter directly by ``(1 - lr * weight_decay)``
    before the Adam update — PyTorch's ``optim.AdamW`` convention, which
    transformer training recipes assume.  The moments see the raw
    gradient only."""

    def __init__(self, params, lr: float = 1e-3,
                 betas: tuple = (0.9, 0.999), eps: float = 1e-8,
                 weight_decay: float = 1e-2) -> None:
        super().__init__(params, lr, betas, eps, weight_decay=0)
        self.decoupled_weight_decay = weight_decay

    def step(self):
        wd = self.decoupled_weight_decay
        if wd:
            lr = self._lr_tensor._data
            for p in self.params:
                if p._grad is None:
                    # PyTorch convention: params with no grad this step
                    # (conditionally-used modules, unrouted experts) are
                    # not decayed — without this, a never-used param
                    # silently shrinks by (1 - lr*wd)^steps
                    continue
                p._data = (p._data * (1.0 - lr * wd)).astype(p._data.dtype)
        super().step()
