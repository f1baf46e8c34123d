"""Global gradient-mode switch.

API-parity with /root/reference/pydynet/autograd.py:1-50: a process-global
boolean gates whether ops record tape nodes; ``no_grad``/``enable_grad`` work
both as context managers and as decorators.  Under ``pydynet_tpu.jit`` the
same switch gates tracing, so an eval step traced inside ``no_grad`` compiles
to a pure forward XLA program with no VJP residuals.
"""
import functools

_grad_enabled = True


def is_grad_enable() -> bool:
    return _grad_enabled


def set_grad_enabled(mode: bool) -> None:
    global _grad_enabled
    _grad_enabled = bool(mode)


class _GradMode:
    _mode: bool = True

    def __enter__(self) -> None:
        self._prev = is_grad_enable()
        set_grad_enabled(self._mode)

    def __exit__(self, exc_type, exc_value, traceback) -> None:
        set_grad_enabled(self._prev)

    def __call__(self, func):
        @functools.wraps(func)
        def decorate_context(*args, **kwargs):
            with self.__class__():
                return func(*args, **kwargs)

        return decorate_context


class no_grad(_GradMode):
    _mode = False


class enable_grad(_GradMode):
    _mode = True
