"""Lazy g++ build + ctypes loader for the native components."""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

_HERE = os.path.dirname(os.path.abspath(__file__))
_CACHE = {}


def _source_path(name: str) -> str:
    return os.path.join(_HERE, f"{name}.cpp")


def _lib_path(name: str) -> str:
    with open(_source_path(name), "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:12]
    # per-user cache (like _config.py's XLA cache), NOT a predictable
    # world-writable /tmp path: the .so is dlopened, so another local user
    # pre-planting a file there would execute code in our process
    cache_dir = os.environ.get(
        "PYDYNET_TPU_NATIVE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "pydynet_tpu",
                     "native"))
    os.makedirs(cache_dir, exist_ok=True)
    return os.path.join(cache_dir, f"lib{name}_{digest}.so")


def _compile(name: str, lib: str) -> bool:
    # unique temp + atomic rename: concurrent builds in two processes must
    # not interleave writes into one shared .tmp
    fd, tmp = tempfile.mkstemp(suffix=".so.tmp", dir=os.path.dirname(lib))
    os.close(fd)
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
           _source_path(name), "-o", tmp]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp, lib)
        return True
    except Exception:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return False


def load_library(name: str):
    """Compile (once) and dlopen lib<name>.so; None when unavailable."""
    if name in _CACHE:
        return _CACHE[name]
    lib_file = _lib_path(name)
    if not os.path.exists(lib_file) and not _compile(name, lib_file):
        _CACHE[name] = None
        return None
    try:
        _CACHE[name] = ctypes.CDLL(lib_file)
    except OSError:
        _CACHE[name] = None
    return _CACHE[name]


def native_available(name: str = "tokenizer") -> bool:
    return load_library(name) is not None
