"""Device-side, trace-safe random number generation.

The reference draws all randomness from NumPy's global RNG (e.g. Dropout,
/root/reference/pydynet/nn/modules/dropout.py:13-17).  Under ``jit`` that
would bake one fixed mask into the compiled program, so stochastic layers
here draw from a :class:`Generator` whose key-state is a tensor: included in
the jit state, it is split on every draw *inside* the traced program, giving
fresh randomness per compiled step — the idiomatic JAX/TPU design.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .core.tensor import Tensor
from .device import Device


class Generator:
    """Counter-splitting PRNG built on jax.random.

    ``state`` is a uint32[2] tensor (a raw PRNG key) living in the jit state,
    so compiled train steps thread it functionally.
    """

    def __init__(self, seed: int = 0) -> None:
        self._state = Tensor(np.zeros(2, np.uint32), device=Device("cpu"))
        self.manual_seed(seed)

    def manual_seed(self, seed: int) -> "Generator":
        # keep the key *uncommitted* so jit can co-locate it with whatever
        # device the rest of the step state lives on (CPU or TPU)
        self._state._data = jnp.asarray(
            np.asarray(jax.random.PRNGKey(seed), dtype=np.uint32))
        return self

    def next_key(self):
        """Split the state and return a fresh subkey (trace-safe)."""
        key, sub = jax.random.split(jnp.asarray(self._state._data,
                                                dtype=jnp.uint32))
        self._state._data = key
        return sub

    def uniform(self, shape, dtype=jnp.float32, minval=0.0, maxval=1.0):
        return jax.random.uniform(self.next_key(), shape, dtype=dtype,
                                  minval=minval, maxval=maxval)

    def normal(self, shape, dtype=jnp.float32):
        return jax.random.normal(self.next_key(), shape, dtype=dtype)

    def bernoulli(self, p, shape):
        return jax.random.bernoulli(self.next_key(), p, shape)

    def _state_tensors(self):
        return [self._state]


# The default generator is created lazily (PEP 562): building it eagerly
# would initialize a jax backend at ``import pydynet_tpu`` time — on this
# sandbox that opens the remote-TPU tunnel before the application (or the
# multichip dryrun) has a chance to pick a platform.
_default_generator = None


def _get_default_generator() -> Generator:
    global _default_generator
    if _default_generator is None:
        _default_generator = Generator(0)
    return _default_generator


def __getattr__(name):
    if name == "default_generator":
        return _get_default_generator()
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


def manual_seed(seed: int) -> Generator:
    """Seed both the device-side generator and NumPy's global RNG."""
    np.random.seed(seed)
    return _get_default_generator().manual_seed(seed)
