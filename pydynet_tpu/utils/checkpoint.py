"""Checkpointing.

The reference checkpoints only trainable weights by dotted name
(llm/llama/io.py:42-57); this extends the same npz + dotted-name format to
full training state: module parameters AND buffers, optimizer moments, the
step counter, and the learning rate — enough for exact train resumption.

Parameters constructed with ``persistent=False`` (KV caches, RoPE tables —
serving scratch whose shape depends on max_batch_size/max_seq_len and which
``__init__`` rebuilds) are excluded from ``state_dict`` and silently skipped
on load, so a train-time checkpoint restores into an inference-config model.
"""
from __future__ import annotations

import os

import numpy as np


def _persistent(param) -> bool:
    return getattr(param, "persistent", True)


def state_dict(module) -> dict:
    """All registered persistent parameters/buffers by dotted name -> numpy."""
    return {name: p.numpy() for name, p in module._parameters.items()
            if _persistent(p)}


def load_state_dict(module, state: dict, strict: bool = True):
    missing = []
    for name, param in module._parameters.items():
        if not _persistent(param):
            continue  # scratch: never restored, never "missing"
        if name in state:
            value = np.asarray(state[name])
            if tuple(value.shape) != tuple(param.shape):
                # Tensor's data setter only casts dtype; without this check
                # a wrong-architecture checkpoint silently replaces the
                # parameter wholesale and fails much later (or never)
                raise ValueError(
                    f"shape mismatch for '{name}': checkpoint has "
                    f"{tuple(value.shape)}, parameter is "
                    f"{tuple(param.shape)}")
            param.data = value
        elif strict:
            missing.append(name)
    if missing:
        raise KeyError(f"missing parameters in state dict: {missing[:5]}...")
    if strict:
        # entries with no module counterpart mean the checkpoint came from
        # a DIFFERENT architecture whose overlapping names happened to fit
        # (e.g. a 12-layer blob over a 6-layer model) — loudly refuse.
        # Names matching a non-persistent parameter (blobs written before
        # the persistent split) are expected and skipped above.
        unexpected = [k for k in state if k not in module._parameters]
        if unexpected:
            raise KeyError(
                f"unexpected entries in state dict: {unexpected[:5]}"
                f"{'...' if len(unexpected) > 5 else ''} — pass "
                "strict=False to load the intersection")
    # models that snapshot stacked device weights for decoding must not
    # keep serving pre-restore weights (Llama.move/io clear this too)
    cache = getattr(module, "_weights_cache", None)
    if isinstance(cache, dict):
        cache.clear()
    return module


def state_blob(module, optimizer=None, step: int = None,
               leaf=lambda p: p.numpy()) -> dict:
    """The dotted-name train-state layout shared by the npz and Orbax
    (``utils.sharded_checkpoint``) formats; ``leaf`` picks numpy copies
    (npz) or raw device arrays with their shardings (Orbax)."""
    blob = {f"model.{k}": leaf(p) for k, p in module._parameters.items()
            if _persistent(p)}
    if optimizer is not None:
        blob["opt.lr"] = np.asarray(optimizer.lr)
        for buf_name in ("v", "m", "G"):
            bufs = getattr(optimizer, buf_name, None)
            if isinstance(bufs, list):
                for i, b in enumerate(bufs):
                    blob[f"opt.{buf_name}.{i}"] = leaf(b)
        if hasattr(optimizer, "_t_tensor"):
            blob["opt.t"] = leaf(optimizer._t_tensor)
    if step is not None:
        blob["step"] = np.asarray(step)
    return blob


def save_checkpoint(path: str, module, optimizer=None, step: int = None,
                    extra: dict = None):
    """``extra`` entries (scalars/arrays) round-trip via
    :func:`load_checkpoint`'s ``with_extra=True`` (or :func:`read_extra`)."""
    blob = state_blob(module, optimizer, step)
    for k, v in (extra or {}).items():
        blob[f"extra.{k}"] = np.asarray(v)
    # write to the file object so the checkpoint lands at EXACTLY `path`
    # (bare np.savez appends '.npz' to extensionless paths, which broke
    # save/load round trips through the same path string)
    with open(path, "wb") as f:
        np.savez(f, **blob)


def _resolve(path: str) -> str:
    if not os.path.exists(path) and os.path.exists(path + ".npz"):
        return path + ".npz"  # checkpoints written by np.savez's auto-suffix
    return path


def read_extra(path: str) -> dict:
    """The ``extra=`` dict a checkpoint was saved with (0-d arrays unwrapped
    to Python scalars)."""
    with np.load(_resolve(path)) as blob:
        out = {}
        for k in blob.files:
            if k.startswith("extra."):
                v = blob[k]
                out[k[len("extra."):]] = v.item() if v.ndim == 0 else v
        return out


def load_checkpoint(path: str, module, optimizer=None, strict: bool = True,
                    with_extra: bool = False):
    """Restore a ``save_checkpoint`` blob.  Returns the saved step (or
    ``None``); with ``with_extra=True`` returns ``(step, extra_dict)``.

    .. warning:: ``strict=True`` is the DEFAULT here, unlike reference-style
       loaders (and this module pre-round-2) that silently loaded the
       intersection: resuming a module whose parameter set grew since the
       save (new modules, changed architecture) raises ``KeyError``, because
       silently mixing fresh-init and restored weights is the failure mode
       that hurts most.  Pass ``strict=False`` explicitly to load legacy /
       partial checkpoints over a superset model."""
    with np.load(_resolve(path)) as blob:
        model_state = {k[len("model."):]: blob[k] for k in blob.files
                       if k.startswith("model.")}
        load_state_dict(module, model_state, strict=strict)
        if optimizer is not None:
            if "opt.lr" in blob.files:
                optimizer.lr = float(blob["opt.lr"])
            for buf_name in ("v", "m", "G"):
                bufs = getattr(optimizer, buf_name, None)
                if isinstance(bufs, list):
                    for i, b in enumerate(bufs):
                        key = f"opt.{buf_name}.{i}"
                        if key in blob.files:
                            value = blob[key]
                            if tuple(value.shape) != tuple(b.shape):
                                # moments are matched by index: a different
                                # trainable set between save and load would
                                # silently pair old moments with new params
                                raise ValueError(
                                    f"shape mismatch for optimizer moment "
                                    f"'{key}': checkpoint has "
                                    f"{tuple(value.shape)}, buffer is "
                                    f"{tuple(b.shape)} — was the optimizer "
                                    "built over a different parameter set?")
                            b.data = value
            if hasattr(optimizer, "_t_tensor") and "opt.t" in blob.files:
                # bypass the data setter: it would COMMIT the scalar to the
                # tensor's construction device (CPU), resurrecting the
                # 'incompatible devices' eager-TPU-step crash the uncommitted
                # optimizer scalars exist to avoid
                import jax.numpy as jnp

                optimizer._t_tensor._data = jnp.asarray(
                    np.float32(blob["opt.t"]))
        step = int(blob["step"]) if "step" in blob.files else None
        if with_extra:
            extra = {}
            for k in blob.files:
                if k.startswith("extra."):
                    v = blob[k]
                    extra[k[len("extra."):]] = v.item() if v.ndim == 0 else v
            return step, extra
        return step
