"""Tensor core: a PyTorch-style eager tensor over ``jax.Array`` with a global
gradient tape.

Behavioral contract (mirrors /root/reference/pydynet/core/tensor.py, rebuilt
TPU-first rather than translated):

* ``Tensor`` wraps an immutable ``jax.Array``; every operator is a pure
  jax.numpy/lax call, so the *same* eager code traces under ``jit`` into one
  XLA program (see ``pydynet_tpu.jit``).  There is no per-op kernel-launch
  path of our own — XLA fuses the elementwise graph onto the TPU VPU and
  ``dot_general`` onto the MXU.
* A process-global tape (:class:`Graph`) records every requires-grad tensor in
  creation order (reference ``tensor.py:9-27``); ``backward()`` sweeps it in
  reverse, applying per-node VJPs with central unbroadcast-summing
  (reference ``tensor.py:327-375``), accumulating into ``.grad`` and freeing
  non-leaf nodes unless ``retain_graph``.
* In-place ops are forbidden on grad-requiring tensors while grad mode is on
  (reference ``tensor.py:266-276``); comparisons return bool tensors outside
  the tape (reference ``tensor.py:296-325``); binary ops cast scalars to the
  peer dtype/device and require device equality (reference ``tensor.py:486-497``).

NumPy dtype-promotion parity comes from ``jax_enable_x64`` (see ``_config``).
"""
from __future__ import annotations

import builtins
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .. import _config  # noqa: F401  (enables x64 before any jnp call)
# no_grad/enable_grad re-exported: nn.functional uses `tensor.no_grad`
from ..autograd import is_grad_enable, no_grad, enable_grad  # noqa: F401
from ..device import Device

__all__ = [
    "Graph", "Tensor", "add", "sub", "mul", "div", "pow", "matmul", "abs",
    "sum", "mean", "min", "max", "argmax", "argmin", "maximum", "minimum",
    "exp", "log", "sign", "reshape", "transpose", "swapaxes", "concat",
    "sigmoid", "tanh", "wrap_pure",
]

_py_abs, _py_sum, _py_min, _py_max, _py_pow = (builtins.abs, builtins.sum,
                                               builtins.min, builtins.max,
                                               builtins.pow)


def _is_traced(x) -> bool:
    return isinstance(x, jax.core.Tracer)


class Graph:
    """Global gradient tape: requires-grad tensors in creation order."""

    node_list: list = []

    @classmethod
    def _add_node(cls, node: "Tensor") -> None:
        cls.node_list.append(node)

    @classmethod
    def _free_node(cls, node: "Tensor") -> None:
        for i in range(len(cls.node_list) - 1, -1, -1):
            if cls.node_list[i] is node:
                del cls.node_list[i]
                break
        node._inputs = ()
        node._backward_fn = None
        node._grad = None

    @classmethod
    def free_graph(cls) -> None:
        for node in cls.node_list:
            node._inputs = ()
            node._backward_fn = None
        cls.node_list.clear()

    @classmethod
    def size(cls) -> int:
        return len(cls.node_list)


class _DataRef:
    """Mutable view returned by ``Tensor.data``.

    The reference exposes the raw ndarray, which user code mutates in place
    (``param.data[...] = w``, ``x.data -= lr * x.grad``).  jax.Arrays are
    immutable, so this proxy performs functional ``.at[...]`` updates and
    writes the result back into the owning tensor, keeping those idioms
    working verbatim.
    """

    __slots__ = ("_t",)

    def __init__(self, t: "Tensor") -> None:
        self._t = t

    # ---- conversion protocols ----
    def __jax_array__(self):
        return self._t._data

    def __array__(self, dtype=None, copy=None):
        arr = np.asarray(self._t._data)
        return arr.astype(dtype) if dtype is not None else arr

    # ---- introspection ----
    @property
    def shape(self):
        return tuple(self._t._data.shape)

    @property
    def dtype(self):
        return np.dtype(self._t._data.dtype)

    @property
    def ndim(self):
        return self._t._data.ndim

    @property
    def size(self):
        return int(np.prod(self.shape)) if self.shape else 1

    def astype(self, dtype):
        return self._t._data.astype(dtype)

    def item(self):
        return self._t._data.item()

    def copy(self):
        return np.array(self._t._data)

    def tolist(self):
        return np.asarray(self._t._data).tolist()

    def __repr__(self):
        return repr(self._t._data)

    def __len__(self):
        return len(self._t._data)

    # ---- reads ----
    def __getitem__(self, key):
        return self._t._data[_unwrap_key(key)]

    def __iter__(self):
        return iter(self._t._data)

    # ---- writes (functional update + write-back) ----
    def __setitem__(self, key, value):
        value = _raw(value)
        self._t._data = self._t._data.at[_unwrap_key(key)].set(value)

    # ---- arithmetic delegates to the jax array ----
    def _bin(self, other, fn):
        return fn(self._t._data, _raw(other))

    def __add__(self, o):
        return self._bin(o, jnp.add)

    def __radd__(self, o):
        return jnp.add(_raw(o), self._t._data)

    def __sub__(self, o):
        return self._bin(o, jnp.subtract)

    def __rsub__(self, o):
        return jnp.subtract(_raw(o), self._t._data)

    def __mul__(self, o):
        return self._bin(o, jnp.multiply)

    def __rmul__(self, o):
        return jnp.multiply(_raw(o), self._t._data)

    def __truediv__(self, o):
        return self._bin(o, jnp.divide)

    def __rtruediv__(self, o):
        return jnp.divide(_raw(o), self._t._data)

    def __pow__(self, o):
        return self._bin(o, jnp.power)

    def __matmul__(self, o):
        return self._bin(o, jnp.matmul)

    def __rmatmul__(self, o):
        return jnp.matmul(_raw(o), self._t._data)

    def __neg__(self):
        return -self._t._data

    def __eq__(self, o):
        return self._bin(o, jnp.equal)

    def __ne__(self, o):
        return self._bin(o, jnp.not_equal)

    def __lt__(self, o):
        return self._bin(o, jnp.less)

    def __le__(self, o):
        return self._bin(o, jnp.less_equal)

    def __gt__(self, o):
        return self._bin(o, jnp.greater)

    def __ge__(self, o):
        return self._bin(o, jnp.greater_equal)

    def __hash__(self):
        return id(self._t)


def _raw(x):
    """Underlying jax/np value of any Tensor/_DataRef/array/scalar."""
    if isinstance(x, Tensor):
        return x._data
    if isinstance(x, _DataRef):
        return x._t._data
    return x


def _unwrap_key(key):
    """Normalize an indexing key: Tensors -> arrays, range -> array."""
    if isinstance(key, tuple):
        return tuple(_unwrap_key(k) for k in key)
    if isinstance(key, Tensor):
        return key._data
    if isinstance(key, _DataRef):
        return key._t._data
    if isinstance(key, range):
        return np.arange(key.start, key.stop, key.step)
    if isinstance(key, list):
        return np.asarray(key)
    return key


class Tensor:
    """Eager tensor over a ``jax.Array`` participating in the global tape."""

    __slots__ = ("_data", "device", "requires_grad", "_grad", "_inputs",
                 "_backward_fn", "_force_backward", "__weakref__")

    def __init__(self,
                 data,
                 dtype=None,
                 device=None,
                 requires_grad: bool = False,
                 copy=None) -> None:
        if isinstance(data, Tensor):
            raise TypeError(
                "Tensor of Tensor is not allowed; use tensor.data instead.")
        if isinstance(data, _DataRef):
            data = data._t._data

        device = device if isinstance(device, Device) else Device(device)
        if _is_traced(data):
            self._data = data if dtype is None else data.astype(dtype)
        else:
            if isinstance(data, jax.Array):
                arr = data if dtype is None else data.astype(dtype)
            else:
                # host literal: go through numpy for exact NumPy dtype rules
                arr = np.array(data, dtype=dtype)
            self._data = jax.device_put(arr, device.jax_device)
        self.device = device

        requires_grad = bool(requires_grad) and is_grad_enable()
        if requires_grad and not np.issubdtype(self._data.dtype, np.floating):
            raise ValueError(
                "Only Tensors of floating point dtype can require gradients!")
        self.requires_grad = requires_grad
        self._grad = None
        self._inputs = ()
        self._backward_fn = None
        self._force_backward = False
        if self.requires_grad:
            Graph._add_node(self)

    # ------------------------------------------------------------------ #
    # construction fast-path used by operators (no device_put, no checks) #
    # ------------------------------------------------------------------ #
    @classmethod
    def _wrap(cls, data, device: Device, requires_grad: bool) -> "Tensor":
        t = cls.__new__(cls)
        t._data = data
        t.device = device
        t.requires_grad = requires_grad
        t._grad = None
        t._inputs = ()
        t._backward_fn = None
        t._force_backward = False
        if requires_grad:
            Graph._add_node(t)
        return t

    # ---------------- properties ----------------
    @property
    def is_leaf(self) -> bool:
        return self._backward_fn is None

    @property
    def data(self) -> _DataRef:
        return _DataRef(self)

    @data.setter
    def data(self, value) -> None:
        value = _raw(value)
        if not _is_traced(value) and not isinstance(value, jax.Array):
            value = jax.device_put(
                np.asarray(value, dtype=self._data.dtype),
                self.device.jax_device)
        self._data = value

    @property
    def jax(self) -> jax.Array:
        """The raw underlying jax.Array (TPU-native escape hatch)."""
        return self._data

    @property
    def grad(self):
        if self._grad is None and self.requires_grad:
            return jnp.zeros_like(self._data)
        return self._grad

    @grad.setter
    def grad(self, value):
        self._grad = _raw(value) if value is not None else None

    @property
    def shape(self) -> tuple:
        return tuple(self._data.shape)

    @property
    def ndim(self) -> int:
        return self._data.ndim

    @property
    def dtype(self):
        return np.dtype(self._data.dtype)

    @property
    def size(self) -> int:
        return int(self._data.size)

    @property
    def strides(self) -> tuple:
        # jax arrays are logically C-contiguous; synthesize numpy-style strides
        itemsize = self.dtype.itemsize
        strides, acc = [], itemsize
        for dim in reversed(self.shape):
            strides.append(acc)
            acc *= dim
        return tuple(reversed(strides))

    @property
    def T(self) -> "Tensor":
        return transpose(self)

    @property
    def xp(self):
        return self.device.xp

    # ---------------- misc ----------------
    def __repr__(self) -> str:
        return "{}({}, requires_grad={}{})".format(
            "Tensor", np.asarray(self._data), self.requires_grad,
            ", device={}".format(self.device)
            if self.device.kind != "cpu" else "")

    def __len__(self) -> int:
        return len(self._data)

    def __array__(self, dtype=None, copy=None):
        arr = np.asarray(self._data)
        return arr.astype(dtype) if dtype is not None else arr

    def __jax_array__(self):
        return self._data

    def __bool__(self):
        return bool(self._data)

    def __float__(self):
        return float(self._data)

    def __int__(self):
        return int(self._data)

    def __hash__(self):
        return id(self)

    def astype(self, new_type) -> "Tensor":
        return Tensor._wrap(self._data.astype(new_type), self.device, False)

    def numpy(self) -> np.ndarray:
        return np.asarray(self._data)

    def item(self):
        return self._data.item()

    def tolist(self):
        return np.asarray(self._data).tolist()

    # ---------------- shape methods ----------------
    def reshape(self, *new_shape) -> "Tensor":
        if len(new_shape) == 1 and isinstance(new_shape[0], (tuple, list)):
            new_shape = tuple(new_shape[0])
        return reshape(self, new_shape)

    def transpose(self, *axes) -> "Tensor":
        if len(axes) == 1 and isinstance(axes[0], (tuple, list)):
            axes = tuple(axes[0])
        return transpose(self, axes if axes else None)

    def swapaxes(self, axis1: int, axis2: int) -> "Tensor":
        return swapaxes(self, axis1, axis2)

    def flatten(self) -> "Tensor":
        return reshape(self, (-1,))

    # ---------------- reduce methods ----------------
    def max(self, axis=None, keepdims: bool = False) -> "Tensor":
        return max(self, axis, keepdims)

    def min(self, axis=None, keepdims: bool = False) -> "Tensor":
        return min(self, axis, keepdims)

    def mean(self, axis=None, keepdims: bool = False) -> "Tensor":
        return mean(self, axis, keepdims)

    def sum(self, axis=None, keepdims: bool = False) -> "Tensor":
        return sum(self, axis, keepdims)

    def argmax(self, axis=None, keepdims: bool = False) -> "Tensor":
        return argmax(self, axis, keepdims)

    def argmin(self, axis=None, keepdims: bool = False) -> "Tensor":
        return argmin(self, axis, keepdims)

    # ---------------- arithmetic dunders ----------------
    def __add__(self, x) -> "Tensor":
        return add(self, x)

    def __radd__(self, x) -> "Tensor":
        return add(x, self)

    def __sub__(self, x) -> "Tensor":
        return sub(self, x)

    def __rsub__(self, x) -> "Tensor":
        return sub(x, self)

    def __mul__(self, x) -> "Tensor":
        return mul(self, x)

    def __rmul__(self, x) -> "Tensor":
        return mul(x, self)

    def __matmul__(self, x) -> "Tensor":
        return matmul(self, x)

    def __rmatmul__(self, x) -> "Tensor":
        return matmul(x, self)

    def __truediv__(self, x) -> "Tensor":
        return div(self, x)

    def __rtruediv__(self, x) -> "Tensor":
        return div(x, self)

    def __pow__(self, x) -> "Tensor":
        return pow(self, x)

    def __rpow__(self, x) -> "Tensor":
        return pow(x, self)

    def __pos__(self) -> "Tensor":
        return 1 * self

    def __neg__(self) -> "Tensor":
        return 0 - self

    def __abs__(self) -> "Tensor":
        return abs(self)

    # ---------------- indexing ----------------
    def __getitem__(self, key) -> "Tensor":
        return _get_slice(self, key)

    def _check_inplace(self):
        if self.requires_grad and is_grad_enable():
            raise ValueError(
                "In-place operation is forbidden in node requiring grad.")

    def __setitem__(self, key, value) -> None:
        self._check_inplace()
        self._data = self._data.at[_unwrap_key(key)].set(_raw(value))

    def __iadd__(self, other) -> "Tensor":
        self._check_inplace()
        self._data = jnp.add(self._data, _raw(other))
        return self

    def __isub__(self, other) -> "Tensor":
        self._check_inplace()
        self._data = jnp.subtract(self._data, _raw(other))
        return self

    def __imul__(self, other) -> "Tensor":
        self._check_inplace()
        self._data = jnp.multiply(self._data, _raw(other))
        return self

    def __itruediv__(self, other) -> "Tensor":
        self._check_inplace()
        self._data = jnp.divide(self._data, _raw(other))
        return self

    def __imatmul__(self, other) -> "Tensor":
        self._check_inplace()
        self._data = jnp.matmul(self._data, _raw(other))
        return self

    # ---------------- comparisons (bool tensors, off-tape) ----------------
    def _compare(self, other, fn) -> "Tensor":
        other = _raw(other)
        return Tensor._wrap(fn(self._data, other), self.device, False)

    def eq(self, other) -> "Tensor":
        return self._compare(other, jnp.equal)

    def ne(self, other) -> "Tensor":
        return self._compare(other, jnp.not_equal)

    def __lt__(self, other) -> "Tensor":
        return self._compare(other, jnp.less)

    def __le__(self, other) -> "Tensor":
        return self._compare(other, jnp.less_equal)

    def __gt__(self, other) -> "Tensor":
        return self._compare(other, jnp.greater)

    def __ge__(self, other) -> "Tensor":
        return self._compare(other, jnp.greater_equal)

    # ---------------- autograd ----------------
    def backward(self, retain_graph: bool = False) -> None:
        # exception contract matches the reference (core/tensor.py:346-351):
        # ValueError for both the off-graph and non-scalar cases, and
        # size-1 tensors of any shape count as scalars (size > 1 check)
        if self not in Graph.node_list:
            raise ValueError(
                "AD failed because this tensor is not in the graph.")
        if self.size > 1:
            raise ValueError("backward should be called only on a scalar.")

        y_id = len(Graph.node_list) - 1
        while Graph.node_list[y_id] is not self:
            y_id -= 1

        self._grad = jnp.ones_like(self._data)
        _sweep_token[0] += 1

        for node in Graph.node_list[y_id::-1]:
            if node._backward_fn is not None and (
                    node._grad is not None or node._force_backward):
                needs = tuple(t.requires_grad for t in node._inputs)
                grads = node._backward_fn(node._grad, needs)
                for inp, g in zip(node._inputs, grads):
                    if g is None or not inp.requires_grad:
                        continue
                    g = _unbroadcast(g, inp._data.shape)
                    if g.dtype != inp._data.dtype:
                        g = g.astype(inp._data.dtype)
                    inp._grad = g if inp._grad is None else inp._grad + g
            if not retain_graph and not node.is_leaf:
                Graph._free_node(node)

    def zero_grad(self) -> None:
        self._grad = None

    # ---------------- device movement ----------------
    def to(self, device) -> "Tensor":
        device = device if isinstance(device, Device) else Device(device)
        if device != self.device:
            self._data = jax.device_put(self._data, device.jax_device)
            if self._grad is not None:
                self._grad = jax.device_put(self._grad, device.jax_device)
            self.device = device
        return self

    def cpu(self) -> "Tensor":
        return self.to("cpu")

    def cuda(self, id: int = 0) -> "Tensor":
        return self.to(Device(id))

    def tpu(self, id: int = 0) -> "Tensor":
        return self.to(Device(id))


# ====================================================================== #
#                         operator machinery                             #
# ====================================================================== #
def _unbroadcast(g, shape):
    """Sum a broadcast gradient back to ``shape`` (reference tensor.py:360-370)."""
    gshape = tuple(g.shape)
    if gshape == tuple(shape):
        return g
    extra = len(gshape) - len(shape)
    if extra > 0:
        g = g.sum(axis=tuple(range(extra)))
    axes = tuple(i for i, (gs, s) in enumerate(zip(g.shape, shape))
                 if s == 1 and gs != 1)
    if axes:
        g = g.sum(axis=axes, keepdims=True)
    if tuple(g.shape) != tuple(shape):
        g = g.reshape(shape)
    return g


def _coerce(x, peer: Optional["Tensor"] = None) -> "Tensor":
    """Scalar/ndarray operand -> Tensor with the peer's dtype & device
    (reference tensor.py:486-497)."""
    if isinstance(x, Tensor):
        return x
    if isinstance(x, _DataRef):
        return Tensor._wrap(x._t._data, x._t.device, False)
    dtype = peer.dtype if peer is not None else None
    device = peer.device if peer is not None else Device(None)
    data = jax.device_put(np.asarray(x, dtype=dtype), device.jax_device)
    return Tensor._wrap(data, device, False)


def _pair(x, y):
    if isinstance(x, Tensor):
        y = _coerce(y, x)
    elif isinstance(y, Tensor):
        x = _coerce(x, y)
    else:
        x, y = _coerce(x), _coerce(y)
    if x.device != y.device:
        raise RuntimeError(
            f"Tensors on different devices: {x.device} vs {y.device}")
    return x, y


def _node(data, inputs: Sequence["Tensor"],
          backward_fn: Callable) -> "Tensor":
    """Create an op-output tensor, attaching tape edges when grad is on."""
    req = is_grad_enable() and builtins.any(t.requires_grad for t in inputs)
    out = Tensor._wrap(data, inputs[0].device, req)
    if req:
        out._inputs = tuple(inputs)
        out._backward_fn = backward_fn
    return out


def _partial_vjp(pure_fn, datas, inputs):
    """``jax.vjp`` over only the ``requires_grad`` inputs.

    Frozen operands (e.g. LoRA base weights, stop-grad buffers) are
    closed over as constants, so their full-size cotangents — a wasted
    (in, out) GEMM per frozen Linear per eager step — are never built
    just to be discarded by the sweep.  Returns ``(out, vjp_full)``
    where ``vjp_full(g)`` yields a full-arity tuple with ``None`` at the
    non-differentiated slots."""
    diff = tuple(i for i, t in enumerate(inputs) if t.requires_grad)
    if len(diff) == len(inputs):
        return jax.vjp(pure_fn, *datas)
    idx = frozenset(diff)

    def fn_subset(*sub):
        it = iter(sub)
        args = tuple(next(it) if i in idx else d
                     for i, d in enumerate(datas))
        return pure_fn(*args)

    out, vjp = jax.vjp(fn_subset, *(datas[i] for i in diff))

    def vjp_full(g):
        it = iter(vjp(g))
        return tuple(next(it) if i in idx else None
                     for i in range(len(datas)))

    return out, vjp_full


def _vjp_node(pure_fn, *inputs: "Tensor") -> "Tensor":
    """Single-output node whose backward is jax.vjp of ``pure_fn``."""
    datas = tuple(t._data for t in inputs)
    if is_grad_enable() and builtins.any(t.requires_grad for t in inputs):
        out_data, vjp = _partial_vjp(pure_fn, datas, inputs)
        return _node(out_data, inputs, lambda g, needs: vjp(g))
    return Tensor._wrap(pure_fn(*datas), inputs[0].device, False)


_sweep_token = [0]


def wrap_pure(pure_fn, *inputs: "Tensor"):
    """Record an arbitrary pure-JAX composite function as tape node(s).

    This is the bridge by which fused TPU kernels (Pallas flash-attention,
    ``lax.conv_general_dilated``, ``lax.scan`` RNN drivers, ...) enter the
    eager autograd world as a *single* node with an exact VJP, instead of
    thousands of per-timestep Python ops (cf. reference ``rnn.py:219-225``).

    ``pure_fn`` takes raw arrays and may return one array or a tuple of
    arrays; each output becomes its own Tensor.  All outputs share one
    jax.vjp: during the reverse sweep, later-created outputs stash their
    incoming gradients and the first-created output (processed last) invokes
    the VJP with the full cotangent tuple (zeros for outputs that received
    no gradient).
    """
    datas = tuple(t._data for t in inputs)
    grad_on = is_grad_enable() and builtins.any(t.requires_grad
                                                for t in inputs)
    if not grad_on:
        outs = pure_fn(*datas)
        if isinstance(outs, tuple):
            return tuple(
                Tensor._wrap(o, inputs[0].device, False) for o in outs)
        return Tensor._wrap(outs, inputs[0].device, False)

    outs, vjp = _partial_vjp(pure_fn, datas, inputs)
    if not isinstance(outs, tuple):
        return _node(outs, inputs, lambda g, needs: vjp(g))

    n_out = len(outs)
    avals = [(o.shape, o.dtype) for o in outs]
    stash = {"token": -1, "grads": [None] * n_out}

    def _ensure_fresh():
        if stash["token"] != _sweep_token[0]:
            stash["token"] = _sweep_token[0]
            stash["grads"] = [None] * n_out

    def make_backward(k):
        if k == 0:
            # the earliest-created output is processed *last* in the reverse
            # sweep, so by the time it fires every sibling's cotangent has
            # been stashed; it is force-run even with no incoming grad.
            def head_backward(g, needs):
                _ensure_fresh()
                stash["grads"][0] = g
                if all(sg is None for sg in stash["grads"]):
                    return (None,) * len(inputs)
                cot = tuple(
                    sg if sg is not None else jnp.zeros(shape, dtype)
                    for sg, (shape, dtype) in zip(stash["grads"], avals))
                stash["grads"] = [None] * n_out
                return vjp(cot)

            return head_backward

        def tail_backward(g, needs):
            _ensure_fresh()
            stash["grads"][k] = g
            return (None,) * len(inputs)

        return tail_backward

    out_tensors = tuple(
        _node(o, inputs, make_backward(k)) for k, o in enumerate(outs))
    if out_tensors and out_tensors[0]._backward_fn is not None:
        out_tensors[0]._force_backward = True
    return out_tensors


def remat_pure(pure_fn, *inputs: "Tensor"):
    """``wrap_pure`` with activation rematerialization (``jax.checkpoint``).

    TPU-native memory/compute trade (no reference analogue — the reference
    keeps every NumPy intermediate alive): the node's VJP recomputes
    ``pure_fn`` from its inputs during the reverse sweep instead of holding
    its internal residuals.  Under ``pdn.jit`` this tells XLA to drop the
    segment's activations from the live set — for an N-block model the
    activation footprint falls from O(N·L·D) to O(L·D) + one extra forward
    FLOP per block, the standard large-model finetuning trade (same policy
    as ``parallel/llama_spmd.py`` ``remat=True``, here available to any
    eager/tape composite).  Gradients are bit-identical to ``wrap_pure``.
    """
    return wrap_pure(jax.checkpoint(pure_fn), *inputs)


# ====================================================================== #
#                         arithmetic operators                           #
# ====================================================================== #
def add(x, y) -> "Tensor":
    x, y = _pair(x, y)
    return _node(jnp.add(x._data, y._data), (x, y),
                 lambda g, needs: (g, g))


def sub(x, y) -> "Tensor":
    x, y = _pair(x, y)
    return _node(jnp.subtract(x._data, y._data), (x, y),
                 lambda g, needs: (g, -g))


def mul(x, y) -> "Tensor":
    x, y = _pair(x, y)
    xd, yd = x._data, y._data
    return _node(jnp.multiply(xd, yd), (x, y),
                 lambda g, needs: (g * yd if needs[0] else None,
                                   g * xd if needs[1] else None))


def div(x, y) -> "Tensor":
    x, y = _pair(x, y)
    xd, yd = x._data, y._data
    out = jnp.divide(xd, yd)

    def backward(g, needs):
        inv_y = 1.0 / yd
        return (g * inv_y if needs[0] else None,
                -g * xd * inv_y * inv_y if needs[1] else None)

    return _node(out, (x, y), backward)


def pow(x, y) -> "Tensor":
    x, y = _pair(x, y)
    xd, yd = x._data, y._data
    out = jnp.power(xd, yd)

    def backward(g, needs):
        return (g * yd * jnp.power(xd, yd - 1) if needs[0] else None,
                g * out * jnp.log(xd) if needs[1] else None)

    return _node(out, (x, y), backward)


def matmul(x, y) -> "Tensor":
    x, y = _pair(x, y)
    return _vjp_node(jnp.matmul, x, y)


def maximum(x, y) -> "Tensor":
    # NOTE: at exact ties BOTH operands receive the full gradient —
    # deliberate parity with the reference's equality-mask grad
    # (reference core/tensor.py:808-814), not the 50/50 subgradient split
    x, y = _pair(x, y)
    xd, yd = x._data, y._data
    out = jnp.maximum(xd, yd)
    return _node(out, (x, y),
                 lambda g, needs: (g * (xd == out) if needs[0] else None,
                                   g * (yd == out) if needs[1] else None))


def minimum(x, y) -> "Tensor":
    x, y = _pair(x, y)
    xd, yd = x._data, y._data
    out = jnp.minimum(xd, yd)
    return _node(out, (x, y),
                 lambda g, needs: (g * (xd == out) if needs[0] else None,
                                   g * (yd == out) if needs[1] else None))


# ====================================================================== #
#                       unary / elementwise operators                    #
# ====================================================================== #
def abs(x) -> "Tensor":
    x = _coerce(x)
    xd = x._data
    return _node(jnp.abs(xd), (x,),
                 lambda g, needs: (g * jnp.sign(xd),))


def exp(x) -> "Tensor":
    x = _coerce(x)
    out = jnp.exp(x._data)
    return _node(out, (x,), lambda g, needs: (g * out,))


def log(x) -> "Tensor":
    x = _coerce(x)
    xd = x._data
    return _node(jnp.log(xd), (x,), lambda g, needs: (g / xd,))


def sign(x) -> "Tensor":
    x = _coerce(x)
    return _node(jnp.sign(x._data), (x,),
                 lambda g, needs: (jnp.zeros_like(x._data),))


def sigmoid(x) -> "Tensor":
    x = _coerce(x)
    out = jax.nn.sigmoid(x._data)
    return _node(out, (x,), lambda g, needs: (g * out * (1 - out),))


def tanh(x) -> "Tensor":
    x = _coerce(x)
    out = jnp.tanh(x._data)
    return _node(out, (x,), lambda g, needs: (g * (1 - out * out),))


# ====================================================================== #
#                              reductions                                #
# ====================================================================== #
def _expand_reduced(g, x_shape, axis, keepdims):
    """Broadcast a reduced gradient back over the reduced axes."""
    if axis is None or keepdims:
        return jnp.broadcast_to(g, x_shape)
    axes = axis if isinstance(axis, tuple) else (axis,)
    axes = tuple(a % len(x_shape) for a in axes)
    g = jnp.expand_dims(g, axes)
    return jnp.broadcast_to(g, x_shape)


def sum(x, axis=None, keepdims: bool = False) -> "Tensor":
    x = _coerce(x)
    xd = x._data
    out = jnp.sum(xd, axis=axis, keepdims=keepdims)
    return _node(
        out, (x,),
        lambda g, needs: (_expand_reduced(g, xd.shape, axis, keepdims),))


def mean(x, axis=None, keepdims: bool = False) -> "Tensor":
    x = _coerce(x)
    xd = x._data
    out = jnp.mean(xd, axis=axis, keepdims=keepdims)
    scale = out.size / xd.size if xd.size else 1.0

    return _node(
        out, (x,),
        lambda g, needs:
        (_expand_reduced(g, xd.shape, axis, keepdims) * scale,))


def max(x, axis=None, keepdims: bool = False) -> "Tensor":
    return _minmax(x, axis, keepdims, jnp.max)


def min(x, axis=None, keepdims: bool = False) -> "Tensor":
    return _minmax(x, axis, keepdims, jnp.min)


def _minmax(x, axis, keepdims, fn) -> "Tensor":
    x = _coerce(x)
    xd = x._data
    out = fn(xd, axis=axis, keepdims=keepdims)

    def backward(g, needs):
        full = _expand_reduced(out, xd.shape, axis, keepdims)
        gfull = _expand_reduced(g, xd.shape, axis, keepdims)
        return (gfull * (xd == full),)

    return _node(out, (x,), backward)


def argmax(x, axis=None, keepdims: bool = False) -> "Tensor":
    x = _coerce(x)
    out = jnp.argmax(x._data, axis=axis, keepdims=keepdims)
    return Tensor._wrap(out, x.device, False)


def argmin(x, axis=None, keepdims: bool = False) -> "Tensor":
    x = _coerce(x)
    out = jnp.argmin(x._data, axis=axis, keepdims=keepdims)
    return Tensor._wrap(out, x.device, False)


# ====================================================================== #
#                             shape operators                            #
# ====================================================================== #
def reshape(x, new_shape) -> "Tensor":
    x = _coerce(x)
    xd = x._data
    return _node(jnp.reshape(xd, new_shape), (x,),
                 lambda g, needs: (g.reshape(xd.shape),))


def transpose(x, axes=None) -> "Tensor":
    x = _coerce(x)
    xd = x._data
    if axes is None:
        inv = None
    else:
        # normalize negatives BEFORE argsort (argsort((0, -1, -2)) is not
        # the inverse permutation of (0, 2, 1) and silently scrambles
        # grads) — single +ndim shift like numpy, NOT modulo, so
        # out-of-range axes raise instead of wrapping
        axes = tuple(a + xd.ndim if a < 0 else a for a in axes)
        for a in axes:
            if not 0 <= a < xd.ndim:
                raise np.exceptions.AxisError(a, xd.ndim)
        inv = tuple(np.argsort(axes))
    return _node(jnp.transpose(xd, axes), (x,),
                 lambda g, needs: (jnp.transpose(g, inv),))


def swapaxes(x, axis1: int, axis2: int) -> "Tensor":
    x = _coerce(x)
    return _node(jnp.swapaxes(x._data, axis1, axis2), (x,),
                 lambda g, needs: (jnp.swapaxes(g, axis1, axis2),))


def _get_slice(x, key) -> "Tensor":
    x = _coerce(x)
    key = _unwrap_key(key)
    return _vjp_node(lambda a: a[key], x)


def concat(tensors, axis: int = 0) -> "Tensor":
    tensors = [_coerce(t) for t in tensors]
    datas = [t._data for t in tensors]
    out = jnp.concatenate(datas, axis=axis)
    sizes = [d.shape[axis] for d in datas]
    offsets = np.cumsum([0] + sizes)
    nd = out.ndim
    ax = axis % nd

    def backward(g, needs):
        grads = []
        for i, need in enumerate(needs):
            if not need:
                grads.append(None)
                continue
            idx = tuple(
                slice(offsets[i], offsets[i + 1]) if d == ax else slice(None)
                for d in builtins.range(nd))
            grads.append(g[idx])
        return tuple(grads)

    return _node(out, tensors, backward)
