"""CLI helper: honor ``--no-cuda`` BEFORE the first jax backend use.

Inside a process whose default jax platform is a remote-accelerator plugin,
even cpu-device work routes compilations through the remote tunnel (a
24-token CPU decode measured 6+ minutes of "compile" vs 2 s with the CPU
platform forced).  The platform can only be switched before the backend
initialises — and importing ``pydynet_tpu`` creates device arrays — so CLI
modules call this at import time, before their ``import pydynet_tpu``.
"""
import sys


def force_cpu_platform_if_requested(argv=None) -> None:
    args = sys.argv[1:] if argv is None else argv
    if "--no-cuda" in args:
        import jax

        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass  # backend already live (e.g. under pytest's conftest)
