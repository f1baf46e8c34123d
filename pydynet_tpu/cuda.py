"""Reference-compat shim: ``pydynet.cuda`` -> TPU device layer.

Reference CLIs probe ``pdn.cuda.is_available()`` / ``device_count()``
(/root/reference/examples/pydynet/mnist.py:134-136); here "cuda" means "the
accelerator JAX sees", i.e. the TPU chip(s), so those scripts run unchanged.
"""
from .device import (Device, is_available, device_count, current_device,
                     set_device)

__all__ = [
    "Device", "is_available", "device_count", "current_device", "set_device"
]
