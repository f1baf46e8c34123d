"""``pydynet_tpu.jit`` — compile imperative train/eval steps to one XLA program.

The reference executes ~thousands of tiny NumPy ops per step (see the call
stack in SURVEY.md §3.2).  Here the same *imperative* code — forward through
``nn.Module``s, ``loss.backward()`` mutating ``.grad``, ``optimizer.step()``
mutating ``.data`` — is traced **once**: every stateful tensor (parameters,
optimizer moments, batch-norm running stats, the PRNG key) is temporarily
rebound to a traced input, the Python step function runs under ``jax.jit``
tracing (the global tape works on tracers transparently), and the mutated
state comes back out as donated XLA outputs.  Subsequent calls skip Python
entirely except for one dispatch.

Usage::

    step = pdn.jit(train_step, state=(net, optimizer))
    loss = step(batch_x, batch_y)      # compiled; params/opt updated in place

State providers implement ``_state_tensors() -> list[Tensor]`` (Module,
Optimizer, Generator).  The global default PRNG generator is always included
so Dropout etc. stay random across compiled steps.

Caveat (inherent to trace-based compilation): Python-level *control flow* is
baked at trace time — most importantly the train/eval flag.  Compile one
step per mode (``jtrain`` traced under ``net.train()``, ``jeval`` under
``net.eval()``) rather than flipping the mode and reusing one compiled step.
"""
from __future__ import annotations

import functools
from typing import Any, Iterable

import jax
import numpy as np

from .core.tensor import Graph, Tensor, _DataRef
from . import random as _random

__all__ = ["jit"]


def _collect_state(state):
    """Returns (tensors, flexible, names) — ``flexible`` marks
    device-agnostic framework state (PRNG keys) the bridge may freely
    re-place to match the step's device; ``names`` carries the dotted
    parameter name for Module-owned tensors (None otherwise), used by
    mesh ``shard_rules``."""
    seen, out, flexible, names = {}, [], [], []
    opt_objs = []

    def add(t, flex, name):
        if id(t) not in seen:
            seen[id(t)] = len(out)
            out.append(t)
            flexible.append(flex)
            names.append(name)
        elif name is not None and names[seen[id(t)]] is None:
            # state=(optimizer, module): the optimizer visit collected the
            # parameters UNNAMED first; the module visit must still attach
            # their dotted names or shard_rules silently never match
            names[seen[id(t)]] = name

    def visit(obj, flex=False):
        if obj is None:
            return
        if isinstance(obj, Tensor):
            add(obj, flex, None)
        elif isinstance(obj, _random.Generator):
            for t in obj._state_tensors():
                add(t, True, None)
        elif hasattr(obj, "_parameters") and hasattr(obj, "_state_tensors"):
            # nn.Module: keep the dotted names for sharding rules
            for name, t in obj._parameters.items():
                add(t, flex, name)
        elif hasattr(obj, "_state_tensors"):
            if isinstance(getattr(obj, "params", None), list):
                opt_objs.append(obj)  # optimizer: moments named in post-pass
            for t in obj._state_tensors():
                visit(t, flex=flex)
        elif isinstance(obj, (list, tuple)):
            for o in obj:
                visit(o, flex=flex)
        elif isinstance(obj, dict):
            for o in obj.values():
                visit(o, flex=flex)
        else:
            raise TypeError(
                f"Cannot extract jit state from object of type {type(obj)}")

    visit(state)
    visit(_random.default_generator)

    # post-pass: name optimizer moment buffers after the parameter they
    # mirror (buffer lists are index-parallel to optimizer.params), so mesh
    # shard_rules place them IDENTICALLY to their parameter — a shape+dtype
    # heuristic is ambiguous when two same-shaped params shard differently
    # (e.g. column- vs row-parallel attention projections)
    index = {id(t): i for i, t in enumerate(out)}
    name_of = {id(t): n for t, n in zip(out, names) if n is not None}
    for opt in opt_objs:
        params = opt.params
        for bufs in (getattr(opt, bn, None) for bn in ("v", "m", "G")):
            if isinstance(bufs, list) and len(bufs) == len(params):
                for p, b in zip(params, bufs):
                    i = index.get(id(b))
                    pname = name_of.get(id(p))
                    if i is not None and names[i] is None and pname:
                        names[i] = pname
    return out, flexible, names


def _is_dynamic_leaf(x) -> bool:
    return isinstance(x, (Tensor, _DataRef, jax.Array, np.ndarray, np.generic))


def _aval_key(v):
    """Hashable (shape, dtype, weak_type) mirroring jax's aval cache key."""
    if isinstance(v, jax.Array):
        a = v.aval
        return (tuple(a.shape), str(a.dtype), bool(a.weak_type))
    arr = np.asarray(v)
    return (tuple(arr.shape), str(arr.dtype), False)


class _JitFunction:
    def __init__(self, fn, state: Iterable = (), donate_state: bool = True,
                 mesh=None, batch_axis: str = "dp", shard_rules=None):
        self._fn = fn
        (self._state_tensors, self._state_flexible,
         self._state_names) = _collect_state(state)
        # output pytree template per trace signature (different static args
        # may produce different output structures)
        self._out_templates = {}
        self._trace_key = None
        self._mesh = mesh
        self._batch_axis = batch_axis
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            self._rep_sharding = NamedSharding(mesh, P())
            self._batch_sharding = NamedSharding(mesh, P(batch_axis))
            self._state_shardings = self._resolve_shard_rules(
                mesh, shard_rules or [])
        self._donate_state = donate_state
        donate = (0,) if donate_state else ()
        self._compiled = jax.jit(self._pure, static_argnums=(2, 3),
                                 donate_argnums=donate)

        def _pure_scan(state_vals, batched_dyn, dyn_mask, packed_static):
            def body(state, dyn):
                return self._pure(list(state), list(dyn), dyn_mask,
                                  packed_static)

            return jax.lax.scan(body, state_vals, tuple(batched_dyn))

        self._scan_compiled = jax.jit(_pure_scan, static_argnums=(2, 3),
                                      donate_argnums=donate)
        functools.update_wrapper(self, fn, updated=())

    def _resolve_shard_rules(self, mesh, rules):
        """Per-state-tensor NamedSharding from (fnmatch-pattern, spec) rules.

        Module parameters match by dotted name; optimizer moment buffers
        carry the dotted name of the parameter they mirror (paired by
        index in ``_collect_state``) so they shard IDENTICALLY to it;
        everything else is replicated — the tensor-parallel upgrade
        promised by the round-1 dp-only ``pdn.jit(mesh=)``.
        """
        import fnmatch
        from jax.sharding import NamedSharding

        def match(name):
            if name is None:
                return None
            for pat, spec in rules:
                if fnmatch.fnmatch(name, pat):
                    return spec
            return None

        return [NamedSharding(mesh, s) if (s := match(n)) is not None
                else self._rep_sharding for n in self._state_names]

    # -- runs under trace --------------------------------------------------
    def _pure(self, state_vals, dyn_leaves, dyn_mask, packed_static):
        treedef, static_leaves, _ = packed_static
        sts = self._state_tensors
        for t, v in zip(sts, state_vals):
            t._data = v
            t._grad = None

        # reassemble (args, kwargs): splice dynamic leaves (wrapping arrays
        # that were Tensors) back into the static skeleton
        leaves = list(static_leaves)
        for (pos, was_tensor, dev), val in zip(dyn_mask, dyn_leaves):
            leaves[pos] = Tensor._wrap(val, dev, False) if was_tensor else val
        args, kwargs = jax.tree.unflatten(treedef, leaves)

        out = self._fn(*args, **kwargs)

        out_leaves, out_tree = jax.tree.flatten(
            out, is_leaf=lambda x: isinstance(x, Tensor))
        tensor_mask = tuple(isinstance(l, Tensor) for l in out_leaves)
        devices = tuple(l.device if isinstance(l, Tensor) else None
                        for l in out_leaves)
        self._out_templates[self._trace_key] = (out_tree, tensor_mask,
                                                devices)
        raw_out = [l._data if isinstance(l, Tensor) else l
                   for l in out_leaves]
        new_state = [t._data for t in sts]
        return new_state, raw_out

    # -- host-side call ----------------------------------------------------
    def _place_state(self, fallback_args=None):
        """Collect current state arrays and co-locate them.

        With ``mesh=``: place each per its resolved sharding (replicated
        by default; tensor-parallel via shard_rules) once — later calls
        see already-sharded outputs and the put is a no-op.  Without:
        co-locate ALL state on one device — model parameters define the
        target (first non-flexible leaf), falling back to the first
        Tensor among ``fallback_args``; stragglers (PRNG key, optimizer
        scalars, buffers created before a .to() move) are device_put
        there once.  Returns ``(state_vals, target, target_dev)``."""
        sts = self._state_tensors
        state_vals = [t._data for t in sts]
        target = None
        if self._mesh is not None:
            for i, v in enumerate(state_vals):
                want = self._state_shardings[i]
                if isinstance(v, jax.Array) and v.sharding != want:
                    state_vals[i] = jax.device_put(v, want)
        else:
            for t, flex in zip(sts, self._state_flexible):
                if not flex:
                    target = t.device.jax_device
                    break
            if target is None and fallback_args is not None:
                for a in jax.tree.leaves(
                        fallback_args,
                        is_leaf=lambda x: isinstance(x, Tensor)):
                    if isinstance(a, Tensor):
                        target = a.device.jax_device
                        break
            if target is not None:
                for i, v in enumerate(state_vals):
                    if isinstance(v, jax.Array) and v.committed \
                            and v.devices() != {target}:
                        state_vals[i] = jax.device_put(v, target)
        from .device import Device as _Device
        return (state_vals, target,
                _Device(target) if target is not None else None)

    def _run_compiled(self, compiled, state_vals, dyn_leaves, dyn_mask,
                      packed_static, what: str):
        """Dispatch one compiled program, with the shared failure
        protocol (restore traced state, drop tracer tape nodes, name the
        donated-state recovery options) and the state write-back."""
        sts = self._state_tensors
        tape_len = Graph.size()
        try:
            new_state, raw_out = compiled(state_vals, dyn_leaves, dyn_mask,
                                          packed_static)
        except Exception as e:
            # tracing failed midway: restore concrete state
            for t, v in zip(sts, state_vals):
                if isinstance(t._data, jax.core.Tracer):
                    t._data = v
                t._grad = None
            # a RUNTIME failure of an already-compiled call (device OOM,
            # lost collective) may have consumed the donated state
            # buffers — there is nothing left to restore; fail with the
            # recovery options instead of letting every later use die
            # with a bare "Array has been deleted"
            if self._donate_state and any(
                    isinstance(v, jax.Array) and v.is_deleted()
                    for v in state_vals):
                raise RuntimeError(
                    f"pdn.jit {what} failed after its donated state "
                    "buffers were consumed; the attached state tensors "
                    "are no longer valid. Reload them from a checkpoint "
                    "(utils.checkpoint), or build the jit with "
                    "donate_state=False to keep state recoverable at the "
                    "cost of 2x state memory.") from e
            raise
        finally:
            # drop tape nodes created during tracing (they hold tracers)
            if Graph.size() > tape_len:
                for node in Graph.node_list[tape_len:]:
                    node._inputs = ()
                    node._backward_fn = None
                del Graph.node_list[tape_len:]

        for t, v in zip(sts, new_state):
            t._data = v
            t._grad = None
        return raw_out

    def _unwrap_outputs(self, trace_key, raw_out, what: str):
        template = self._out_templates.get(trace_key)
        if template is None:
            raise RuntimeError(
                "pdn.jit internal error: no output template recorded for "
                f"this {what} signature (the template key diverged from "
                "jax's trace cache key). Please report; as a workaround, "
                "construct a fresh pdn.jit for this call pattern.")
        out_tree, tensor_mask, devices = template
        wrapped = [
            Tensor._wrap(v, dev, False) if is_t else v
            for v, is_t, dev in zip(raw_out, tensor_mask, devices)
        ]
        return jax.tree.unflatten(out_tree, wrapped)

    def __call__(self, *args, **kwargs):
        state_vals, target, target_dev = self._place_state((args, kwargs))

        leaves, treedef = jax.tree.flatten(
            (args, kwargs), is_leaf=lambda x: isinstance(x, Tensor))
        dyn_leaves, dyn_mask, static_leaves = [], [], []
        for pos, leaf in enumerate(leaves):
            if _is_dynamic_leaf(leaf):
                if isinstance(leaf, _DataRef):
                    leaf = leaf._t
                if isinstance(leaf, Tensor):
                    # the computation runs on the state's device; move arg
                    # tensors there and tag them so device checks pass
                    val = leaf._data
                    if self._mesh is not None and val.ndim >= 1:
                        # shard the leading (batch) dim over the mesh —
                        # but only when it divides: non-batch args (per-
                        # class weights, masks) would either crash the
                        # device_put or get a semantically wrong dim-0
                        # sharding that GSPMD must undo; replicate those
                        dp = self._mesh.shape.get(self._batch_axis, 1)
                        val = jax.device_put(
                            val, self._batch_sharding
                            if val.shape[0] % dp == 0
                            else self._rep_sharding)
                    elif target is not None and isinstance(val, jax.Array) \
                            and val.committed and val.devices() != {target}:
                        val = jax.device_put(val, target)
                    dyn_leaves.append(val)
                    dyn_mask.append((pos, True, target_dev or leaf.device))
                else:
                    dyn_leaves.append(leaf)
                    dyn_mask.append((pos, False, None))
                static_leaves.append(None)
            else:
                static_leaves.append(leaf)
        packed_static = (treedef, tuple(static_leaves), None)
        dyn_mask = tuple(dyn_mask)
        # deterministic template key == exactly what jax.jit keys its trace
        # cache on for _pure(state_vals, dyn_leaves, *static): the avals of
        # every dynamic leaf plus the hashable static pack.  If jax reuses a
        # compiled executable, this key has been seen; if the key is new, jax
        # re-traces and _pure records the template.
        trace_key = (tuple(_aval_key(v) for v in state_vals),
                     tuple(_aval_key(v) for v in dyn_leaves),
                     dyn_mask, packed_static)
        self._trace_key = trace_key
        raw_out = self._run_compiled(self._compiled, state_vals, dyn_leaves,
                                     dyn_mask, packed_static, "step")
        return self._unwrap_outputs(trace_key, raw_out, "call")


def _foreach(self, *args, **kwargs):
    """Run the step over leading-axis slices of the args in ONE compiled
    program (``lax.scan`` over the traced step):

        losses = jstep.foreach(Xb, Yb)   # Xb (n, B, ...), Yb (n, B, ...)

    is equivalent to ``[jstep(Xb[i], Yb[i]) for i in range(n)]`` — same
    state updates (optimizer steps included), same per-call outputs
    (stacked on a new leading axis) — but the whole sweep is a single XLA
    dispatch.  This is the TPU-idiomatic epoch: per-batch dispatch latency
    (which dominates small-step training through a remote tunnel)
    disappears, and XLA pipelines the scan body.  Every tensor/array
    argument must carry the same-length leading axis; Python scalars and
    other static args are not supported here (bake them into the step).

    Composes with ``mesh=``: state is placed per its shard rules
    (replicated / tensor-parallel) exactly as in ``__call__``, and each
    argument's SECOND axis — the per-step batch dim under the leading
    steps axis — is sharded over ``batch_axis``, so a whole dp-sharded
    epoch runs as one GSPMD program.
    """
    state_vals, target, target_dev = self._place_state()
    if self._mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        step_batch_sharding = NamedSharding(
            self._mesh, P(None, self._batch_axis))

    leaves, treedef = jax.tree.flatten(
        (args, kwargs), is_leaf=lambda x: isinstance(x, Tensor))
    dyn_leaves, dyn_mask, static_leaves = [], [], []
    lengths = set()
    for pos, leaf in enumerate(leaves):
        if not _is_dynamic_leaf(leaf):
            raise TypeError(
                f"foreach arguments must all be tensors/arrays with a "
                f"leading steps axis; got {type(leaf).__name__}")
        if isinstance(leaf, _DataRef):
            leaf = leaf._t
        if isinstance(leaf, Tensor):
            val = leaf._data
            if self._mesh is not None and np.ndim(val) >= 2:
                # (steps, batch, ...): shard the per-step batch axis when
                # it divides; replicate non-batch-shaped args (see
                # __call__)
                dp = self._mesh.shape.get(self._batch_axis, 1)
                val = jax.device_put(
                    val, step_batch_sharding
                    if np.shape(val)[1] % dp == 0
                    else self._rep_sharding)
            elif target is not None and isinstance(val, jax.Array) \
                    and val.committed and val.devices() != {target}:
                val = jax.device_put(val, target)
            dyn_leaves.append(val)
            dyn_mask.append((pos, True, target_dev or leaf.device))
        else:
            dyn_leaves.append(leaf)
            dyn_mask.append((pos, False, None))
        shape = np.shape(dyn_leaves[-1])
        if not shape:
            raise ValueError("foreach arguments need a leading steps axis")
        lengths.add(shape[0])
        static_leaves.append(None)
    if len(lengths) != 1:
        raise ValueError(
            f"foreach arguments disagree on the leading steps axis: "
            f"{sorted(lengths)}")
    packed_static = (treedef, tuple(static_leaves), None)
    dyn_mask = tuple(dyn_mask)
    trace_key = ("foreach",
                 tuple(_aval_key(v) for v in state_vals),
                 tuple(_aval_key(v) for v in dyn_leaves),
                 dyn_mask, packed_static)
    self._trace_key = trace_key
    raw_out = self._run_compiled(self._scan_compiled, state_vals,
                                 dyn_leaves, dyn_mask, packed_static,
                                 "foreach")
    return self._unwrap_outputs(trace_key, raw_out, "foreach")


_JitFunction.foreach = _foreach


def jit(fn=None, *, state: Any = (), donate_state: bool = True, mesh=None,
        batch_axis: str = "dp", shard_rules=None):
    """Compile an imperative step function; see module docstring.

    With ``mesh`` (a jax.sharding.Mesh), the step runs SPMD: tensor
    arguments are sharded on their leading (batch) dimension over
    ``batch_axis`` and GSPMD inserts the gradient all-reduce — the
    multi-chip upgrade of the reference's single-device training loop with
    zero changes to the step function.  Module/optimizer state is replicated
    by default; pass ``shard_rules`` — a list of
    ``(fnmatch-pattern, jax.sharding.PartitionSpec)`` pairs matched against
    dotted parameter names (e.g. ``("*.attention.Q.weight", P(None, "tp"))``)
    — for Megatron-style tensor parallelism over a ``tp`` mesh axis
    (canned Llama rules: ``pydynet_tpu.parallel.LLAMA_TP_RULES``).
    Optimizer moment buffers inherit the sharding of the parameter they
    mirror (paired by identity against ``optimizer.params``).
    """
    kwargs = dict(state=state, donate_state=donate_state, mesh=mesh,
                  batch_axis=batch_axis, shard_rules=shard_rules)
    if fn is None:
        return lambda f: _JitFunction(f, **kwargs)
    return _JitFunction(fn, **kwargs)
