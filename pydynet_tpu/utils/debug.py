"""Debug helpers: NaN trapping and finiteness checks (the reference has no
sanitizers; SURVEY.md §5 names jax debug-nans as the TPU-native slot)."""
from __future__ import annotations

import contextlib

import numpy as np

import jax


@contextlib.contextmanager
def debug_nans(enable: bool = True):
    """Trap NaNs at the op that produced them (forces op-by-op checking)."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def check_finite(module, raise_on_fail: bool = True):
    """Scan a module's parameters (and grads) for non-finite values."""
    bad = []
    for name, p in module._parameters.items():
        if not np.isfinite(p.numpy()).all():
            bad.append(name)
        if p._grad is not None and not np.isfinite(np.asarray(p.grad)).all():
            bad.append(name + ".grad")
    if bad and raise_on_fail:
        raise FloatingPointError(f"non-finite values in: {bad}")
    return bad
