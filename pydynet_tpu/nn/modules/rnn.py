"""Recurrent layers: RNN/LSTM/GRU cells + sequence drivers.

API parity with /root/reference/pydynet/nn/modules/rnn.py (same constructor
args, weight shapes, gate orders — LSTM splits a fused 4H projection into
f,i,o,g (rnn.py:280-288), GRU uses a 2H z,r projection plus a candidate
(rnn.py:529-544) — and the same output/hidden layouts incl. the batch_first
swap of hn).

TPU-native execution: the reference drives time with a Python loop of ~5
tensor ops per step (rnn.py:219-225) — thousands of dispatches.  Here each
(layer, direction) is ONE tape node wrapping ``lax.scan`` over the fused cell
math, so XLA compiles the whole sequence into a single fused loop on-chip;
the backward pass is the scan's native VJP.  The bidirectional pass uses
``lax.scan(reverse=True)``, which equals the reference's x[::-1] feeding +
output re-reversal.

Cells remain usable standalone (Tensor math, differentiable per-step).
"""
import math
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from .module import Module
from ..parameter import Parameter
from .. import init, functional as F
from ... import core
from ...core.tensor import wrap_pure
from ...device import Device
from ...special import zeros, empty


# ------------------------- pure cell steps (raw arrays) ------------------ #
def _rnn_step(x_t, h, Wx, Wh, b, nonlinearity):
    lin = x_t @ Wx + h @ Wh
    if b is not None:
        lin = lin + b
    return jnp.tanh(lin) if nonlinearity == "tanh" else jnp.maximum(lin, 0)


def _lstm_step(x_t, h, c, Wx, Wh, b, H):
    lin = x_t @ Wx + h @ Wh
    if b is not None:
        lin = lin + b
    fio, g = lin[..., :3 * H], lin[..., 3 * H:]
    # jax.nn.sigmoid, NOT 1/(1+exp(-x)): the naive form's gradient is
    # NaN where exp overflows (see nn/functional.py sigmoid note), and a
    # single saturated gate would NaN-poison the whole backward
    sig = jax.nn.sigmoid(fio)
    f, i, o = sig[..., :H], sig[..., H:2 * H], sig[..., 2 * H:]
    c = f * c + i * jnp.tanh(g)
    h = o * jnp.tanh(c)
    return h, c


def _gru_step(x_t, h, Wx1, Wh1, Wx2, Wh2, b1, b2, H):
    lin1 = x_t @ Wx1 + h @ Wh1
    if b1 is not None:
        lin1 = lin1 + b1
    zr = jax.nn.sigmoid(lin1)  # stable gradient (see _lstm_step)
    z, r = zr[..., :H], zr[..., H:]
    lin2 = x_t @ Wx2 + (r * h) @ Wh2
    if b2 is not None:
        lin2 = lin2 + b2
    return (1 - z) * h + z * jnp.tanh(lin2)


# ------------------------------- cells ----------------------------------- #
class RNNCell(Module):

    def __init__(self, input_size: int, hidden_size: int, bias: bool = True,
                 nonlinearity: str = "tanh", device=None, dtype=None) -> None:
        super().__init__()
        self.input_size = input_size
        self.hidden_size = hidden_size
        self.kwargs = {"device": Device(device), "dtype": dtype}
        self.nonlinearity = nonlinearity
        self.fn = {"tanh": F.tanh, "relu": F.relu}[nonlinearity]
        self.Wx = Parameter(empty((input_size, hidden_size), **self.kwargs))
        self.Wh = Parameter(empty((hidden_size, hidden_size), **self.kwargs))
        if bias:
            self.bias = Parameter(empty(hidden_size, **self.kwargs))
        self.has_bias = bias
        self.reset_parameters()

    def reset_parameters(self):
        bound = math.sqrt(1 / self.hidden_size)
        init.uniform_(self.Wx, -bound, bound)
        init.uniform_(self.Wh, -bound, bound)
        if self.has_bias:
            init.uniform_(self.bias, -bound, bound)

    reset_paramters = reset_parameters  # reference spelling (rnn.py:51)

    def forward(self, x, h=None):
        if h is None:
            h = self.init_hidden(x)
        else:
            assert (x.ndim == 1 and h.shape == (self.hidden_size,)) or (
                x.ndim == 2 and h.shape == (x.shape[0], self.hidden_size)), \
                "Wrong hidden state input!"
        lin = x @ self.Wx + h @ self.Wh
        if self.has_bias:
            lin = lin + self.bias
        return self.fn(lin)

    def init_hidden(self, x):
        assert x.ndim in {1, 2}
        if x.ndim == 1:
            return zeros(self.hidden_size, **self.kwargs)
        return zeros((x.shape[0], self.hidden_size), **self.kwargs)

    # (inputs, scan-step) pair used by the driver
    def _scan_params(self):
        return [self.Wx, self.Wh] + ([self.bias] if self.has_bias else [])

    def _make_step(self):
        has_bias, nl = self.has_bias, self.nonlinearity

        def step(x_t, h, *params):
            b = params[2] if has_bias else None
            return _rnn_step(x_t, h, params[0], params[1], b, nl)

        return step

    def __repr__(self) -> str:
        return "{}({}, {}, bias={}, nonlinearity={})".format(
            self.__class__.__name__, self.input_size, self.hidden_size,
            self.has_bias, self.nonlinearity)

    def move(self, device):
        self.kwargs["device"] = device
        return super().move(device)


class LSTMCell(Module):

    def __init__(self, input_size: int, hidden_size: int, bias: bool = True,
                 device=None, dtype=None) -> None:
        super().__init__()
        self.input_size = input_size
        self.hidden_size = hidden_size
        self.kwargs = {"device": Device(device), "dtype": dtype}
        self.Wx = Parameter(empty((input_size, 4 * hidden_size), **self.kwargs))
        self.Wh = Parameter(empty((hidden_size, 4 * hidden_size), **self.kwargs))
        if bias:
            self.bias = Parameter(empty(4 * hidden_size, **self.kwargs))
        self.has_bias = bias
        self.reset_parameters()

    def reset_parameters(self):
        bound = math.sqrt(1 / self.hidden_size)
        init.uniform_(self.Wx, -bound, bound)
        init.uniform_(self.Wh, -bound, bound)
        if self.has_bias:
            init.uniform_(self.bias, -bound, bound)

    reset_paramters = reset_parameters

    def forward(self, x, hx: Optional[Tuple] = None):
        if hx is None:
            h = self.init_hidden(x)
            c = self.init_hidden(x)
        else:
            h, c = hx
        lin = x @ self.Wx + h @ self.Wh
        if self.has_bias:
            lin = lin + self.bias
        fio, g = core.hsplit(lin, [3 * self.hidden_size])
        sig_fio, tanh_g = F.sigmoid(fio), F.tanh(g)
        f, i, o = core.hsplit(sig_fio, 3)
        c = f * c + i * tanh_g
        h = o * F.tanh(c)
        return h, c

    def init_hidden(self, x):
        assert x.ndim in {1, 2}
        if x.ndim == 1:
            return zeros(self.hidden_size, **self.kwargs)
        return zeros((x.shape[0], self.hidden_size), **self.kwargs)

    def _scan_params(self):
        return [self.Wx, self.Wh] + ([self.bias] if self.has_bias else [])

    def _make_step(self):
        has_bias, H = self.has_bias, self.hidden_size

        def step(x_t, hc, *params):
            b = params[2] if has_bias else None
            return _lstm_step(x_t, hc[0], hc[1], params[0], params[1], b, H)

        return step

    def __repr__(self) -> str:
        return "{}({}, {}, bias={})".format(self.__class__.__name__,
                                            self.input_size,
                                            self.hidden_size, self.has_bias)

    def move(self, device):
        self.kwargs["device"] = device
        return super().move(device)


class GRUCell(Module):

    def __init__(self, input_size: int, hidden_size: int, bias: bool = True,
                 device=None, dtype=None) -> None:
        super().__init__()
        self.input_size = input_size
        self.hidden_size = hidden_size
        self.kwargs = {"device": Device(device), "dtype": dtype}
        self.Wx1 = Parameter(empty((input_size, 2 * hidden_size), **self.kwargs))
        self.Wh1 = Parameter(empty((hidden_size, 2 * hidden_size), **self.kwargs))
        self.Wx2 = Parameter(empty((input_size, hidden_size), **self.kwargs))
        self.Wh2 = Parameter(empty((hidden_size, hidden_size), **self.kwargs))
        if bias:
            self.bias1 = Parameter(empty(2 * hidden_size, **self.kwargs))
            self.bias2 = Parameter(empty(hidden_size, **self.kwargs))
        self.has_bias = bias
        self.reset_parameters()

    def reset_parameters(self):
        bound = math.sqrt(1 / self.hidden_size)
        for w in (self.Wx1, self.Wx2, self.Wh1, self.Wh2):
            init.uniform_(w, -bound, bound)
        if self.has_bias:
            init.uniform_(self.bias1, -bound, bound)
            init.uniform_(self.bias2, -bound, bound)

    def forward(self, x, h=None):
        if h is None:
            h = self.init_hidden(x)
        lin1 = x @ self.Wx1 + h @ self.Wh1
        if self.has_bias:
            lin1 = lin1 + self.bias1
        z, r = core.split(F.sigmoid(lin1), 2, axis=-1)
        lin2 = x @ self.Wx2 + (r * h) @ self.Wh2
        if self.has_bias:
            lin2 = lin2 + self.bias2
        return (1 - z) * h + z * F.tanh(lin2)

    def init_hidden(self, x):
        assert x.ndim in {1, 2}
        if x.ndim == 1:
            return zeros(self.hidden_size, **self.kwargs)
        return zeros((x.shape[0], self.hidden_size), **self.kwargs)

    def _scan_params(self):
        ps = [self.Wx1, self.Wh1, self.Wx2, self.Wh2]
        if self.has_bias:
            ps += [self.bias1, self.bias2]
        return ps

    def _make_step(self):
        has_bias, H = self.has_bias, self.hidden_size

        def step(x_t, h, *params):
            b1 = params[4] if has_bias else None
            b2 = params[5] if has_bias else None
            return _gru_step(x_t, h, params[0], params[1], params[2],
                             params[3], b1, b2, H)

        return step

    def __repr__(self) -> str:
        return "{}({}, {}, bias={})".format(self.__class__.__name__,
                                            self.input_size,
                                            self.hidden_size, self.has_bias)

    def move(self, device):
        self.kwargs["device"] = device
        return super().move(device)


# ------------------------------ drivers ---------------------------------- #
def _scan_layer(cell, x, h0, reverse: bool):
    """Run one (layer, direction) as a single lax.scan tape node.

    Returns (ys, h_last) where ys is time-major in ORIGINAL order (for the
    reverse direction this equals the reference's hr_list[::-1] stacking) and
    h_last is the final carry (== hr_list[-1] for reverse).
    """
    step = cell._make_step()
    params = cell._scan_params()

    def pure(xd, h0d, *pd):
        def body(h, x_t):
            h = step(x_t, h, *pd)
            return h, h

        h_last, ys = lax.scan(body, h0d, xd, reverse=reverse)
        return ys, h_last

    return wrap_pure(pure, x, h0, *params)


def _scan_layer_lstm(cell, x, h0, c0, reverse: bool):
    step = cell._make_step()
    params = cell._scan_params()

    def pure(xd, h0d, c0d, *pd):
        def body(hc, x_t):
            hc = step(x_t, hc, *pd)
            return hc, hc[0]

        (h_last, c_last), ys = lax.scan(body, (h0d, c0d), xd, reverse=reverse)
        return ys, h_last, c_last

    return wrap_pure(pure, x, h0, c0, *params)


class _RNNBase(Module):
    _cell_cls = None
    _prefix = None

    def __init__(self, input_size: int, hidden_size: int, num_layers: int = 1,
                 bias: bool = True, batch_first: bool = False,
                 bidirectional: bool = False, device=None, dtype=None,
                 **cell_kwargs) -> None:
        super().__init__()
        self.input_size = input_size
        self.hidden_size = hidden_size
        self.num_layers = num_layers
        self.has_bias = bias
        self.batch_first = batch_first
        self.bidirectional = bidirectional
        self.kwargs = {"device": Device(device), "dtype": dtype}
        self._cell_kwargs = cell_kwargs

        assert num_layers > 0
        # NOTE: like the reference (rnn.py:104,172-181), the two directions
        # form independent per-direction chains, so deeper layers take
        # hidden_size (not 2*hidden_size) inputs
        in_sizes = [input_size] + [hidden_size] * (num_layers - 1)
        self.cells: List[Module] = []
        for i in range(num_layers):
            cell = self._cell_cls(in_sizes[i], hidden_size, bias,
                                  **cell_kwargs, **self.kwargs)
            setattr(self, "{}_{}".format(self._prefix, i), cell)
            self.cells.append(cell)
        if bidirectional:
            self.rcells: List[Module] = []
            for i in range(num_layers):
                cell = self._cell_cls(in_sizes[i], hidden_size, bias,
                                      **cell_kwargs, **self.kwargs)
                setattr(self, "r{}_{}".format(self._prefix, i), cell)
                self.rcells.append(cell)

    def reset_parameters(self):
        for cell in self.cells:
            cell.reset_parameters()
        if self.bidirectional:
            for cell in self.rcells:
                cell.reset_parameters()

    def init_hidden(self, x):
        assert x.ndim in {2, 3}
        d = 2 if self.bidirectional else 1
        if x.ndim == 2:
            return zeros((d * self.num_layers, self.hidden_size),
                         **self.kwargs)
        return zeros((d * self.num_layers, x.shape[1], self.hidden_size),
                     **self.kwargs)

    def _check_state(self, x, h, what: str = "hidden"):
        """Reference parity (rnn.py:137-142,374-381): a malformed caller
        state must raise, not broadcast into plausible-looking garbage."""
        d = 2 if self.bidirectional else 1
        ok = (x.ndim == 2 and tuple(h.shape) == (d * self.num_layers,
                                                 self.hidden_size)) or \
             (x.ndim == 3 and tuple(h.shape) == (d * self.num_layers,
                                                 x.shape[1],
                                                 self.hidden_size))
        assert ok, f"Wrong {what} state input!"

    def __repr__(self) -> str:
        return ("{}({}, {}, num_layers={}, bias={}, batch_first={}, "
                "bidirectional={})").format(self.__class__.__name__,
                                            self.input_size, self.hidden_size,
                                            self.num_layers, self.has_bias,
                                            self.batch_first,
                                            self.bidirectional)

    def move(self, device):
        self.kwargs["device"] = device
        return super().move(device)


class RNN(_RNNBase):
    _cell_cls = RNNCell
    _prefix = "rnn"

    def __init__(self, input_size, hidden_size, num_layers: int = 1,
                 nonlinearity: str = "tanh", bias: bool = True,
                 batch_first: bool = False, bidirectional: bool = False,
                 device=None, dtype=None) -> None:
        # positional order matches the reference exactly (rnn.py:82-90:
        # num_layers, NONLINEARITY, bias, ...) — swapping the two silently
        # mis-binds reference-style positional calls like RNN(64,128,2,'relu')
        self.nonlinearity = nonlinearity
        super().__init__(input_size, hidden_size, num_layers, bias,
                         batch_first, bidirectional, device, dtype,
                         nonlinearity=nonlinearity)

    def forward(self, x, h=None):
        return _forward_single_state(self, x, h)

    def __repr__(self) -> str:
        return ("{}({}, {}, num_layers={}, nonlinearity={}, bias={}, "
                "batch_first={}, bidirectional={})").format(
                    self.__class__.__name__, self.input_size,
                    self.hidden_size, self.num_layers, self.nonlinearity,
                    self.has_bias, self.batch_first, self.bidirectional)


class GRU(_RNNBase):
    _cell_cls = GRUCell
    _prefix = "gru"

    def forward(self, x, h=None):
        return _forward_single_state(self, x, h)


def _forward_single_state(self, x, h):
    """Shared RNN/GRU driver (reference rnn.py:130-195 semantics)."""
    if self.batch_first and x.ndim == 3:
        x = x.swapaxes(0, 1)
    if h is None:
        h = self.init_hidden(x)
    else:
        self._check_state(x, h)

    hn_list, hrn_list = [], []
    layer_f = layer_r = x
    for i in range(self.num_layers):
        ys, h_last = _scan_layer(self.cells[i], layer_f, h[i], False)
        layer_f = ys
        if self.bidirectional:
            rys, hr_last = _scan_layer(self.rcells[i], layer_r,
                                       h[i + self.num_layers], True)
            layer_r = rys
            hrn_list.append(core.unsqueeze(hr_last, 0))
        hn_list.append(core.unsqueeze(h_last, 0))

    output = (core.concat([layer_f, layer_r], axis=-1)
              if self.bidirectional else layer_f)
    hn = core.concat(hn_list + hrn_list)
    if self.batch_first and x.ndim == 3:
        output = output.swapaxes(0, 1)
        hn = hn.swapaxes(0, 1)  # reference swaps hn too (rnn.py:193-194)
    return output, hn


class LSTM(_RNNBase):
    _cell_cls = LSTMCell
    _prefix = "lstm"

    def forward(self, x, hx: Optional[Tuple] = None):
        if self.batch_first and x.ndim == 3:
            x = x.swapaxes(0, 1)
        if hx is None:
            h = self.init_hidden(x)
            c = self.init_hidden(x)
        else:
            h, c = hx
            self._check_state(x, h)
            self._check_state(x, c, "cell")

        hn_list, hrn_list, cn_list, crn_list = [], [], [], []
        layer_f = layer_r = x
        for i in range(self.num_layers):
            ys, h_last, c_last = _scan_layer_lstm(self.cells[i], layer_f,
                                                  h[i], c[i], False)
            layer_f = ys
            if self.bidirectional:
                rys, hr_last, cr_last = _scan_layer_lstm(
                    self.rcells[i], layer_r, h[i + self.num_layers],
                    c[i + self.num_layers], True)
                layer_r = rys
                hrn_list.append(core.unsqueeze(hr_last, 0))
                crn_list.append(core.unsqueeze(cr_last, 0))
            hn_list.append(core.unsqueeze(h_last, 0))
            cn_list.append(core.unsqueeze(c_last, 0))

        output = (core.concat([layer_f, layer_r], axis=-1)
                  if self.bidirectional else layer_f)
        hn = core.concat(hn_list + hrn_list)
        cn = core.concat(cn_list + crn_list)
        if self.batch_first and x.ndim == 3:
            output = output.swapaxes(0, 1)
            hn = hn.swapaxes(0, 1)
            cn = cn.swapaxes(0, 1)
        return output, (hn, cn)
