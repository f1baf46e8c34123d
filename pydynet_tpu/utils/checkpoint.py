"""Checkpointing.

The reference checkpoints only trainable weights by dotted name
(llm/llama/io.py:42-57); this extends the same npz + dotted-name format to
full training state: module parameters AND buffers, optimizer moments, the
step counter, and the learning rate — enough for exact train resumption.
"""
from __future__ import annotations

import os

import numpy as np


def state_dict(module) -> dict:
    """All registered parameters/buffers by dotted name -> numpy."""
    return {name: p.numpy() for name, p in module._parameters.items()}


def load_state_dict(module, state: dict, strict: bool = True):
    missing = []
    for name, param in module._parameters.items():
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
    # models that snapshot stacked device weights for decoding must not
    # keep serving pre-restore weights (Llama.move/io clear this too)
    cache = getattr(module, "_weights_cache", None)
    if isinstance(cache, dict):
        cache.clear()
    return module


def save_checkpoint(path: str, module, optimizer=None, step: int = None,
                    extra: dict = None):
    blob = {f"model.{k}": v for k, v in state_dict(module).items()}
    if optimizer is not None:
        blob["opt.lr"] = np.asarray(optimizer.lr)
        for buf_name in ("v", "m", "G"):
            bufs = getattr(optimizer, buf_name, None)
            if isinstance(bufs, list):
                for i, b in enumerate(bufs):
                    blob[f"opt.{buf_name}.{i}"] = b.numpy()
        if hasattr(optimizer, "_t_tensor"):
            blob["opt.t"] = optimizer._t_tensor.numpy()
    if step is not None:
        blob["step"] = np.asarray(step)
    for k, v in (extra or {}).items():
        blob[f"extra.{k}"] = np.asarray(v)
    # write to the file object so the checkpoint lands at EXACTLY `path`
    # (bare np.savez appends '.npz' to extensionless paths, which broke
    # save/load round trips through the same path string)
    with open(path, "wb") as f:
        np.savez(f, **blob)


def load_checkpoint(path: str, module, optimizer=None, strict: bool = True):
    """Restore a ``save_checkpoint`` blob.

    .. warning:: ``strict=True`` is the DEFAULT here, unlike reference-style
       loaders (and this module pre-round-2) that silently loaded the
       intersection: resuming a module whose parameter set grew since the
       save (new modules, changed architecture) raises ``KeyError``, because
       silently mixing fresh-init and restored weights is the failure mode
       that hurts most.  Pass ``strict=False`` explicitly to load legacy /
       partial checkpoints over a superset model."""
    if not os.path.exists(path) and os.path.exists(path + ".npz"):
        path += ".npz"  # checkpoints written by np.savez's auto-suffix
    blob = np.load(path)
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
    return int(blob["step"]) if "step" in blob.files else None
