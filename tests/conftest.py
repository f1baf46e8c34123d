"""Test harness config.

Must run before jax is imported anywhere: forces the CPU platform with 8
virtual devices so sharding/collective tests exercise a real Mesh without
TPU hardware, and keeps unit tests off the (single) real TPU chip.

Hardware lane: ``PDN_TPU_TESTS=1 python -m pytest -m tpu tests/ -q`` keeps
the real TPU platform and runs only the ``tpu``-marked kernel-equality
tests non-interpret on silicon (one process — the tunnel serializes on a
single session; give it 10+ minute timeouts, first Mosaic compiles are
slow).  Without the env var, ``tpu``-marked tests are skipped and
everything else runs on the virtual CPU mesh as before.
"""
import os
import sys
from pathlib import Path

TPU_LANE = os.environ.get("PDN_TPU_TESTS") == "1"

if not TPU_LANE:
    # force: the environment presets JAX_PLATFORMS=axon (the remote TPU
    # tunnel) and the axon sitecustomize writes jax.config.jax_platforms
    # directly, so the env var alone is not enough; unit tests must run on
    # the virtual-device CPU backend, both for speed and because the tunnel
    # serializes on one session.
    os.environ["JAX_PLATFORMS"] = "cpu"
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if not TPU_LANE:
    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import pytest


def pytest_collection_modifyitems(config, items):
    if TPU_LANE:
        skip = pytest.mark.skip(
            reason="TPU lane: only tpu-marked tests run (PDN_TPU_TESTS=1)")
        for item in items:
            if "tpu" not in item.keywords:
                item.add_marker(skip)
    else:
        skip = pytest.mark.skip(
            reason="needs the real chip: PDN_TPU_TESTS=1 pytest -m tpu")
        for item in items:
            if "tpu" in item.keywords:
                item.add_marker(skip)


@pytest.fixture(autouse=True)
def _reset_grad_mode():
    """Module.eval() flips the process-global grad switch (reference parity,
    module.py:45-47); re-enable it between tests so suites stay independent."""
    import pydynet_tpu as pdn
    pdn.set_grad_enabled(True)
    yield
    pdn.set_grad_enabled(True)
