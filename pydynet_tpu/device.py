"""Device abstraction mapping the reference's string device API onto JAX devices.

The reference exposes ``Device("cpu"|"cuda"|"cuda:N")`` backed by numpy/cupy
(/root/reference/pydynet/cuda.py:36-99).  Here a :class:`Device` resolves to a
concrete ``jax.Device``:

* ``"cpu"``            -> the JAX CPU backend.
* ``"cuda"``/``"gpu"``/``"tpu"`` (optionally ``:N``) -> the N-th accelerator
  device.  ``cuda`` is accepted as an alias so reference CLI flags
  (``--cuda``, ``--device cuda:0``) keep working on TPU machines.

Multi-chip scale-out does NOT go through this class: it is handled by
``pydynet_tpu.parallel`` (jax.sharding.Mesh + NamedSharding), so a ``Device``
always names a single chip, exactly like the reference's.
"""
from __future__ import annotations

import functools

import jax

_ACCEL_ALIASES = ("cuda", "gpu", "tpu")
_current_accel_index = 0


@functools.lru_cache(maxsize=None)
def _cpu_devices():
    return jax.devices("cpu")


@functools.lru_cache(maxsize=None)
def _accel_devices():
    """All non-CPU JAX devices (TPU chips), or [] when none exist."""
    try:
        devs = jax.devices()
    except RuntimeError:
        return []
    return [d for d in devs if d.platform != "cpu"]


def is_available() -> bool:
    """True when at least one accelerator (TPU) chip is visible."""
    return len(_accel_devices()) > 0


def device_count() -> int:
    return len(_accel_devices())


def current_device() -> int:
    return _current_accel_index


def set_device(device: int) -> None:
    global _current_accel_index
    if not is_available():
        raise RuntimeError("No accelerator device is available.")
    if not 0 <= device < device_count():
        raise ValueError(f"Bad device index {device}")
    _current_accel_index = device


class Device:
    """String/int-addressable handle for one JAX device.

    Mirrors /root/reference/pydynet/cuda.py:36 behaviorally: equality ignores
    the accelerator index (`cuda.py:79-87`), and the instance is usable as a
    (no-op) context manager (`cuda.py:93-99`).
    """

    __slots__ = ("kind", "device_id")

    def __init__(self, device=None) -> None:
        if device is None:
            self.kind, self.device_id = "cpu", None
        elif isinstance(device, Device):
            self.kind, self.device_id = device.kind, device.device_id
        elif isinstance(device, int):
            self.kind, self.device_id = "accel", device
        elif isinstance(device, jax.Device):
            if device.platform == "cpu":
                self.kind, self.device_id = "cpu", None
            else:
                self.kind = "accel"
                self.device_id = _accel_devices().index(device)
        elif isinstance(device, str):
            name, _, idx = device.partition(":")
            if name == "cpu":
                self.kind, self.device_id = "cpu", None
            elif name in _ACCEL_ALIASES:
                self.kind = "accel"
                if idx == "":
                    self.device_id = 0
                elif idx.isdigit():
                    self.device_id = int(idx)
                else:
                    raise ValueError(f'Wrong device id "{idx}"!')
            else:
                raise ValueError(f'Unknown device "{device}"!')
        else:
            raise ValueError(f'Unknown device "{device}"!')

        if self.kind == "accel" and not is_available():
            raise RuntimeError("Accelerator device is not available on this system.")

    @property
    def jax_device(self) -> jax.Device:
        if self.kind == "cpu":
            return _cpu_devices()[0]
        devs = _accel_devices()
        if self.device_id >= len(devs):
            # match set_device()'s validation — a silent modulo wrap would
            # place data on the wrong chip for a typo'd index
            raise RuntimeError(
                f"Bad device index {self.device_id}: "
                f"only {len(devs)} accelerator device(s) available")
        return devs[self.device_id]

    @property
    def device(self):  # reference-compat attribute (cuda.py:41)
        return "cpu" if self.kind == "cpu" else self.jax_device

    @property
    def xp(self):
        """Array namespace for this device.

        The reference returns numpy or cupy (cuda.py:89-91); the TPU rebuild
        computes through jax.numpy everywhere, and ``numpy`` for host-side
        CPU work.
        """
        if self.kind == "cpu":
            import numpy
            return numpy
        import jax.numpy
        return jax.numpy

    def __repr__(self) -> str:
        if self.kind == "cpu":
            return "Device(type='cpu')"
        return "Device(type='tpu', index={})".format(self.device_id)

    def __eq__(self, other) -> bool:
        if not isinstance(other, Device):
            other = Device(other)
        return self.kind == other.kind

    def __hash__(self):
        return hash(self.kind)

    # The reference enters the CuPy device context here; placement in JAX is
    # explicit per-array, so this is a no-op kept for source compatibility
    # (e.g. `with x.device: x.data -= lr * x.grad`).
    def __enter__(self):
        return self

    def __exit__(self, exc_type, exc_value, traceback):
        return None
