"""Native (C++) runtime components, bound via ctypes.

Compiled lazily with the system toolchain into a cached shared object;
every consumer has a pure-Python fallback, so the framework works without a
compiler — the native path is a performance tier, not a dependency.
"""
from .build import load_library, native_available
from .tokenizer_binding import NativeVocab
