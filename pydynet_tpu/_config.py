"""Global configuration for the TPU-native runtime.

The reference framework (pydynet) computes on NumPy, whose default float dtype is
float64 and whose type-promotion rules the test-suite asserts exactly
(cf. /root/reference/tests/test_tensor_basic.py:103).  JAX matches the NumPy
promotion lattice for floating types only when 64-bit mode is enabled, so we
turn on ``jax_enable_x64`` at import time (override with PYDYNET_TPU_X64=0).

Hot compute paths (Llama decode, train steps) always use explicit float32 /
bfloat16 arrays, so nothing 64-bit ever reaches the TPU MXU.
"""
import os

import jax

_X64 = os.environ.get("PYDYNET_TPU_X64", "1") != "0"
if _X64:
    jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: one-shot CLI invocations (infer/finetune)
# are otherwise dominated by XLA compile time on every run.


def _machine_tag() -> str:
    """Compile-host fingerprint for the cache path: XLA:CPU AOT results
    are compiled for the build host's exact feature set, and loading
    them on a different machine spews cpu_aot_loader feature-mismatch
    errors (burying real diagnostics in the multichip dryrun artifact)
    and risks SIGILL.  Two hosts can write one pool: the LOCAL machine
    (forced-CPU tests/dryrun) and the REMOTE tunnel helper (inside an
    axon/TPU-plugin process even cpu-device compiles run remotely, with
    the helper's LLVM feature set).  So the tag is the local-CPU
    fingerprint PLUS the platform route resolved at import (the callers
    that force CPU do so before importing this package)."""
    import hashlib
    import platform
    route = (os.environ.get("JAX_PLATFORMS") or "auto").split(",")[0]
    try:  # an explicit jax.config override (conftest, llm/_cpu.py) wins
        route = (jax.config.jax_platforms or route).split(",")[0]
    except AttributeError:
        pass
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    h = hashlib.sha1(line.encode()).hexdigest()[:10]
                    return f"{h}-{route}"
    except OSError:
        pass
    return f"{platform.machine() or 'unknown'}-{route}"


if os.environ.get("PYDYNET_TPU_COMPILE_CACHE", "1") != "0":
    _cache_dir = os.environ.get(
        "PYDYNET_TPU_COMPILE_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "pydynet_tpu",
                     "jax_cache-" + _machine_tag()))
    try:
        os.makedirs(_cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass


def x64_enabled() -> bool:
    return _X64


# Numerical tolerance the test-suite targets (BASELINE.md: grad parity <= 1e-5).
GRAD_ATOL = 1e-5
