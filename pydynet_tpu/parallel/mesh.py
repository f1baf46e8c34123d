"""Device-mesh helpers: the framework's multi-chip scale-out path.

The reference has no distributed layer at all (SURVEY.md §2.6); on TPU the
"communication backend" slot is filled by ``jax.sharding``: build a Mesh over
the chips, annotate parameter/batch shardings with NamedSharding, and let
GSPMD insert the ICI collectives (psum/all-gather/reduce-scatter).  These
helpers keep that idiomatic and give the rest of the framework one place to
name mesh axes.

Canonical axes: ``dp`` (data/batch), ``tp`` (tensor/model), optionally
``sp`` (sequence).
"""
from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "named_sharding", "shard", "replicate", "P", "Mesh"]


def make_mesh(axes: dict, devices=None) -> Mesh:
    """Build a Mesh from {'dp': 2, 'tp': 4}-style axis sizes.

    ``devices`` defaults to all available devices; the product of axis sizes
    must equal the device count used.
    """
    if devices is None:
        devices = jax.devices()
    sizes = list(axes.values())
    n = int(np.prod(sizes))
    if n > len(devices):
        raise ValueError(
            f"mesh needs {n} devices, only {len(devices)} available")
    dev_array = np.asarray(devices[:n]).reshape(sizes)
    return Mesh(dev_array, tuple(axes.keys()))


def named_sharding(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, P(*spec))


def shard(x, mesh: Mesh, *spec):
    """Place ``x`` on the mesh with the given PartitionSpec."""
    return jax.device_put(x, named_sharding(mesh, *spec))


def replicate(x, mesh: Mesh):
    return jax.device_put(x, named_sharding(mesh))
