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

__all__ = ["make_mesh", "make_hybrid_mesh", "initialize_distributed",
           "named_sharding", "shard", "replicate", "shard_map", "P",
           "Mesh"]

try:  # jax >= 0.8: stable top-level API (kwarg check_rep became check_vma)
    from jax import shard_map as _shard_map

    def shard_map(f, **kw):
        """One version-compat shim for the whole package; call sites use
        the jax>=0.8 ``check_vma`` kwarg name."""
        return _shard_map(f, **kw)
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map as _shard_map_legacy

    def shard_map(f, **kw):
        kw["check_rep"] = kw.pop("check_vma", True)
        return _shard_map_legacy(f, **kw)


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


def _cluster_env_present() -> bool:
    """True when env markers of a multi-process launcher are present (TPU
    pod metadata, Slurm, Open MPI, ...).  Env-var probes only — never
    initialises the XLA backend."""
    try:
        from jax._src.clusters import ClusterEnv
        return any(c.is_env_present() for c in ClusterEnv._cluster_types)
    except Exception:  # private API moved: assume a cluster, fail loud
        return True


def initialize_distributed(coordinator_address=None, num_processes=None,
                           process_id=None, **kw):
    """Join a multi-host (multi-process) TPU job.

    Thin, idempotent wrapper over ``jax.distributed.initialize``: on TPU
    pods the arguments are discovered from the environment, so a bare
    ``initialize_distributed()`` in every process is enough; elsewhere pass
    coordinator/process info explicitly.  After this, ``jax.devices()``
    spans the whole job and meshes built from it cross hosts.  Safe to call
    in a single-process job (no-op).  Must run before ANY other JAX call
    (even ``jax.devices()``/``jax.process_count()`` initialise the local
    XLA backend, after which joining a job is impossible) — call it first
    thing in ``main``.

    The reference framework is single-process (SURVEY.md §2.6: no
    distributed layer); this is the TPU-native extension slot for it.
    """
    # jax.distributed.is_initialized is a pure state check (global_state
    # .client is not None), unlike jax.process_count() which initialises
    # the XLA backend and would make initialize() below raise for everyone.
    if jax.distributed.is_initialized():
        return
    try:
        jax.distributed.initialize(coordinator_address, num_processes,
                                   process_id, **kw)
    except ValueError:
        # Auto-detect found no cluster and no coordinator was given: a
        # plain single-process run.  Only swallow when the caller didn't
        # claim a multi-process job in ANY form (an explicit coordinator
        # or process id is such a claim — jax raises ValueError when the
        # companion args are missing, and swallowing that would silently
        # degrade the pod job to independent single-host processes).
        if (num_processes not in (None, 1)
                or coordinator_address is not None
                or process_id not in (None, 0)):
            raise
    except RuntimeError:
        # "must be called before any JAX calls that might initialise the
        # XLA backend."  Whether that is fatal depends on whether there is
        # a job to join: silently degrading a pod job to N independent
        # single-host processes is the worst failure mode, so re-raise
        # whenever the caller claimed one (explicit args) or the
        # environment shows one (TPU pod / Slurm / MPI markers — a pure
        # env-var probe, no backend touch).  A genuinely single-process
        # run that already used JAX stays a no-op.
        if (coordinator_address is not None
                or num_processes not in (None, 1)
                or _cluster_env_present()):
            raise


def make_hybrid_mesh(ici_axes: dict, dcn_axes: dict, devices=None) -> Mesh:
    """Mesh over a multi-host job with the DCN/ICI split made explicit.

    ``ici_axes`` partition WITHIN a slice/host (fast chip-to-chip links:
    put tp/sp here); ``dcn_axes`` partition ACROSS hosts (data-center
    network: put dp/pp here).  Axis order is dcn-major, matching
    ``mesh_utils.create_hybrid_device_mesh``, so collectives along ici
    axes never cross DCN.

    In a single-process job (this sandbox) every DCN axis must be 1 and
    the helper degrades to :func:`make_mesh` over the local devices —
    which is what makes the multi-host code path testable on a virtual
    CPU mesh.
    """
    if devices is None:
        devices = jax.devices()
    names = tuple(dcn_axes.keys()) + tuple(ici_axes.keys())
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate axis names: {names}")
    if jax.process_count() == 1:
        for name, size in dcn_axes.items():
            if size != 1:
                raise ValueError(
                    f"dcn axis {name!r}={size} needs a multi-process job "
                    f"(jax.process_count()==1)")
        return make_mesh({**dcn_axes, **ici_axes}, devices)
    from jax.experimental import mesh_utils

    # create_hybrid_device_mesh takes SAME-RANK shapes (elementwise
    # product = result shape), so pad each side with 1s in the other's
    # slots: result rank/order matches ``names`` (dcn-major)
    ici = tuple(ici_axes.values())
    dcn = tuple(dcn_axes.values())
    dev_array = mesh_utils.create_hybrid_device_mesh(
        (1,) * len(dcn) + ici, dcn + (1,) * len(ici), devices=devices)
    return Mesh(dev_array, names)


def named_sharding(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, P(*spec))


def shard(x, mesh: Mesh, *spec):
    """Place ``x`` on the mesh with the given PartitionSpec."""
    return jax.device_put(x, named_sharding(mesh, *spec))


def replicate(x, mesh: Mesh):
    return jax.device_put(x, named_sharding(mesh))
