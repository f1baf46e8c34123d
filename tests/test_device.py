"""Device layer: string/int parsing, equality, cuda-module shims."""
import jax
import numpy as np
import pytest

import pydynet_tpu as pdn
from pydynet_tpu.device import Device
from pydynet_tpu import cuda


def test_device_parsing_and_equality():
    assert Device(None) == Device("cpu")
    assert Device("cpu").kind == "cpu"
    assert Device(Device("cpu")) == Device("cpu")
    assert Device("cpu") == "cpu"
    with pytest.raises(ValueError):
        Device("rocm:0")
    with pytest.raises(ValueError):
        Device("cuda:x")


def test_device_context_manager_noop():
    d = Device("cpu")
    with d:
        pass
    assert repr(d) == "Device(type='cpu')"


def test_cuda_module_shims():
    # tests run on the forced-CPU backend: no accelerator visible
    assert cuda.is_available() in (True, False)
    if not cuda.is_available():
        assert cuda.device_count() == 0
        with pytest.raises(RuntimeError):
            Device("cuda")
        with pytest.raises(RuntimeError):
            cuda.set_device(0)
    assert cuda.current_device() == 0


def test_tensor_device_roundtrip():
    t = pdn.Tensor(np.ones(3))
    assert t.device == Device("cpu")
    t2 = t.cpu()
    assert t2 is t  # in-place move semantics
    assert t.xp is np


def test_accel_alias_names():
    if not cuda.is_available():
        pytest.skip("no accelerator under the CPU test backend")
    assert Device("cuda") == Device("tpu") == Device("gpu")


def test_bad_accel_index_raises(monkeypatch):
    """Regression: an out-of-range accelerator index silently wrapped
    modulo the device count, placing data on the wrong chip."""
    import jax
    import pydynet_tpu.device as dev

    monkeypatch.setattr(dev, "_accel_devices", lambda: [jax.devices()[0]])
    monkeypatch.setattr(dev, "is_available", lambda: True)
    d = dev.Device("cuda:3")
    with pytest.raises(RuntimeError, match="Bad device index"):
        d.jax_device
