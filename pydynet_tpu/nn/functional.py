"""Functional NN ops.

API parity with /root/reference/pydynet/nn/functional.py, rebuilt TPU-first:

* ``linear``/activations/softmax/losses are tape-level compositions of jnp
  ops — XLA fuses them onto the VPU/MXU; weight layout is (in, out) like the
  reference (functional.py:7-11).
* conv/pool do NOT translate the reference's stride-trick im2col + ``add.at``
  scatter (functional.py:75-95): each is a *single* tape node wrapping
  ``lax.conv_general_dilated`` / ``lax.reduce_window``, whose forward and
  backward both lower to native XLA:TPU convolutions (MXU).  A hand-written
  Pallas im2col was evaluated and rejected: XLA's conv emitter already tiles
  these shapes onto the MXU, so there is nothing left to win.
* Zero-padding is folded in *before* pooling so padded zeros can win a max,
  matching the reference's constant-pad-then-max semantics exactly
  (functional.py:98-112).
"""
from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from ..autograd import no_grad
from ..core import tensor
from ..core import function
from ..core.tensor import Tensor, wrap_pure
from ..core.function import unsqueeze


def linear(x: Tensor, weight: Tensor, bias: Tensor = None) -> Tensor:
    affine = x @ weight
    if bias is not None:
        affine = affine + bias
    return affine


def embedding(x: Tensor, weight: Tensor, padding_idx: int = None) -> Tensor:
    query = weight[x]
    if padding_idx is not None:
        with tensor.no_grad():
            mask = unsqueeze(x.ne(padding_idx), -1)
        query = query * mask
    return query


def sigmoid(x: Tensor) -> Tensor:
    return tensor.sigmoid(x)


def tanh(x: Tensor) -> Tensor:
    return tensor.tanh(x)


def relu(x: Tensor) -> Tensor:
    return tensor.maximum(0., x)


def leaky_relu(x: Tensor, alpha: float) -> Tensor:
    return tensor.maximum(x, alpha * x)


def silu(x: Tensor) -> Tensor:
    # x * sigmoid(x) via the sign-split-stable sigmoid: the naive
    # x / (1 + exp(-x)) overflows exp at x < -88 (f32) and its backward
    # chain then yields 0 * inf = NaN gradients
    return x * tensor.sigmoid(x)


def gelu(x: Tensor) -> Tensor:
    """Sigmoid-approximated GELU, x * sigmoid(1.702 x) (used by CLIP;
    reference llm/clip/model.py:83-95)."""
    return x * tensor.sigmoid(1.702 * x)


def dropout(x: Tensor, p: float, training: bool = True) -> Tensor:
    """Inverted dropout (reference nn/modules/dropout.py:13-17 semantics);
    mask drawn from the framework's device-side Generator so it stays
    random inside jit-compiled train steps.  One home for the mask rule —
    nn.Dropout and LoRALinear both route through here."""
    if not training or p <= 0:
        return x
    from ..random import default_generator
    keep = default_generator.uniform(x.shape, dtype=x.dtype) < (1 - p)
    mask = Tensor._wrap(keep.astype(x.dtype) / (1 - p), x.device, False)
    return x * mask


def softmax(x: Tensor, axis=None) -> Tensor:
    with no_grad():
        max_ = x.max(axis, keepdims=True)
    x_sub_max = x - max_
    exp_ = tensor.exp(x_sub_max)
    return exp_ / tensor.sum(exp_, axis=axis, keepdims=True)


def log_softmax(x: Tensor, axis=None, keepdims: bool = False) -> Tensor:
    with no_grad():
        max_ = x.max(axis, keepdims=True)
    x_sub_max = x - max_
    return x_sub_max - tensor.log(
        tensor.sum(tensor.exp(x_sub_max), axis=axis, keepdims=keepdims))


def scaled_dot_product_attention(q: Tensor, k: Tensor, v: Tensor, mask=None,
                                 causal: bool = False) -> Tensor:
    """Fused attention over (B, L, H, d) operands as ONE tape node.

    ``causal=True`` routes to the Pallas blockwise flash kernel (O(L) memory
    streaming over K/V) with its custom VJP; otherwise an XLA einsum-softmax
    composite with optional additive ``mask``.
    """
    from ..ops import flash_attention as fa

    if causal and mask is None:
        return wrap_pure(lambda a, b, c: fa.flash_attention_causal(a, b, c),
                         q, k, v)
    if mask is not None:
        if causal:
            # fold causality into the additive mask (the flash kernel only
            # takes pure-causal; silently dropping causal here would let
            # queries read the future)
            return wrap_pure(
                lambda a, b, c, m: fa.mha_reference(
                    a, b, c, m + fa._causal_mask(a.shape[1]).astype(m.dtype)),
                q, k, v, mask)
        return wrap_pure(lambda a, b, c, m: fa.mha_reference(a, b, c, m),
                         q, k, v, mask)
    return wrap_pure(lambda a, b, c: fa.mha_reference(a, b, c), q, k, v)


# ===================================================================== #
#                conv / pool — single-node XLA kernels                   #
# ===================================================================== #
def conv1d(x: Tensor, kernel: Tensor, padding: int = 0,
           stride: int = 1) -> Tensor:
    """1-D convolution, x:(N,C,W), kernel:(O,C,K) -> (N,O,W')."""
    def pure(xd, kd):
        return lax.conv_general_dilated(
            xd, kd,
            window_strides=(stride,),
            padding=[(padding, padding)],
            dimension_numbers=("NCH", "OIH", "NCH"))

    return wrap_pure(pure, x, kernel)


def conv2d(x: Tensor, kernel: Tensor, padding: int = 0,
           stride: int = 1) -> Tensor:
    """2-D convolution, x:(N,C,H,W), kernel:(O,C,K,K) -> (N,O,H',W').

    Forward and backward are both single XLA convolutions on the MXU
    (vs the reference's im2col matmul + add.at scatter,
    functional.py:254-281/87-95).
    """
    def pure(xd, kd):
        return lax.conv_general_dilated(
            xd, kd,
            window_strides=(stride, stride),
            padding=[(padding, padding), (padding, padding)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"))

    return wrap_pure(pure, x, kernel)


def _pool(x: Tensor, kernel_size, stride, padding, ndim_sp,
          average: bool) -> Tensor:
    """im2col pooling: extract windows with ``conv_general_dilated_patches``
    (an XLA conv, so fwd+bwd both run on the MXU and are natively
    differentiable), then reduce over the window axis.  Zero padding is part
    of the patch extraction — padded zeros can win a max, matching the
    reference's constant-pad-then-reduce semantics (functional.py:98-112)."""
    def pure(xd):
        n, c = xd.shape[0], xd.shape[1]
        patches = lax.conv_general_dilated_patches(
            xd,
            filter_shape=(kernel_size,) * ndim_sp,
            window_strides=(stride,) * ndim_sp,
            padding=[(padding, padding)] * ndim_sp)
        # patches: (N, C*k^d, *out_spatial), channel-major window ordering
        out_sp = patches.shape[2:]
        patches = patches.reshape((n, c, kernel_size**ndim_sp) + out_sp)
        return (jnp.mean if average else jnp.max)(patches, axis=2)

    return wrap_pure(pure, x)


def max_pool1d(x: Tensor, kernel_size: int, stride: int,
               padding: int = 0) -> Tensor:
    return _pool(x, kernel_size, stride, padding, 1, False)


def avg_pool1d(x: Tensor, kernel_size: int, stride: int,
               padding: int = 0) -> Tensor:
    return _pool(x, kernel_size, stride, padding, 1, True)


def max_pool2d(x: Tensor, kernel_size: int, stride: int,
               padding: int = 0) -> Tensor:
    return _pool(x, kernel_size, stride, padding, 2, False)


def avg_pool2d(x: Tensor, kernel_size: int, stride: int,
               padding: int = 0) -> Tensor:
    return _pool(x, kernel_size, stride, padding, 2, True)


# ===================================================================== #
#                               losses                                   #
# ===================================================================== #
def _reduce(v: Tensor, reduction: str) -> Tensor:
    if reduction == "mean":
        return tensor.mean(v)
    if reduction == "sum":
        return tensor.sum(v)
    raise ValueError("reduction must be mean or sum.")


def mse_loss(y_pred: Tensor, y_true: Tensor, reduction: str = "mean"):
    return _reduce(function.square(y_pred - y_true), reduction)


def nll_loss(y_pred: Tensor, y_true: Tensor, reduction: str = "mean"):
    return _reduce(-y_pred * y_true, reduction)


def cross_entropy_loss(y_pred: Tensor, y_true: Tensor,
                       reduction: str = "mean"):
    """Cross-entropy with the reference's global-max shift
    (functional.py:364-381); the shift is a no-grad tensor (not ``.item()``)
    so the whole loss stays traceable under jit."""
    with no_grad():
        shift = y_pred.max()
    update_y_pred = y_pred - shift
    log_sum_exp = tensor.log(
        tensor.sum(tensor.exp(update_y_pred), 1, keepdims=True))
    neg_log_sm = log_sum_exp - update_y_pred
    if y_true.ndim == 1:
        nll = neg_log_sm[range(len(neg_log_sm)), y_true]
    else:
        nll = neg_log_sm * y_true
    return _reduce(nll, reduction)
