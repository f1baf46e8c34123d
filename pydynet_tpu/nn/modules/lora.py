"""LoRA: low-rank adaptation of Linear layers (Hu et al., 2021).

Extension beyond the reference — its finetuning story is whole-matrix
prefix freezing (``set_trainable_parameters``,
/root/reference/llm/llama/model.py:213-224).  LoRA keeps every base
matrix frozen and trains a rank-``r`` additive update
``dW = A @ B * (alpha / r)`` per wrapped Linear, cutting trainable
parameters (and optimizer state, a real HBM cost at scale) by orders of
magnitude while the finetune step stays ONE compiled XLA program.

Design notes (framework-specific, deliberate):

* ``LoRALinear`` adopts the wrapped Linear's ``weight``/``bias``
  Parameter objects under the SAME attribute names, so every dotted
  parameter path (``layers.0.attention.Q.weight``) is unchanged —
  checkpoint io, ``state_dict`` and the stacked decode-weight builders
  keep working without a mapping table.  The adapters appear as new
  ``....lora_A`` / ``....lora_B`` names.
* Module surgery happens AFTER construction, but the Module system
  flattens child parameters into every ancestor's ``_parameters`` at
  assignment time (module.py:32-38) — so :func:`refresh_parameters`
  replays that flattening over the whole tree once the wrapping is done.
* Weight layout follows the framework's (in, out) convention: ``A`` is
  (in, r) kaiming-uniform, ``B`` is (r, out) zeros, so a freshly wrapped
  model computes bit-identical outputs to the base model.
"""
import math
from collections import OrderedDict

from .module import Module
from .linear import Linear
from ..parameter import Parameter
from .. import init, functional as F
from ...core.tensor import Tensor
from ...special import zeros, empty
from ...autograd import no_grad


class LoRALinear(Module):
    """A frozen Linear plus a trainable rank-``r`` update.

    forward(x) = x @ weight (+ bias) + dropout(x) @ A @ B * (alpha / r)
    """

    def __init__(self, base: Linear, r: int, alpha: float = None,
                 dropout: float = 0.0):
        super().__init__()
        assert isinstance(base, Linear), base
        assert r >= 1, r
        self.in_features = base.in_features
        self.out_features = base.out_features
        self.r = r
        self.alpha = float(alpha) if alpha is not None else float(r)
        self.scaling = self.alpha / r
        self.p_dropout = float(dropout)
        self.device = base.device

        # adopt the base Parameters under their original names (frozen)
        base.weight.requires_grad = False
        self.weight = base.weight
        if base.bias is not None:
            base.bias.requires_grad = False
            self.bias = base.bias
        else:
            self.bias = None

        kwargs = {"device": base.device, "dtype": base.weight.dtype}
        self.lora_A = Parameter(empty((self.in_features, r), **kwargs))
        self.lora_B = Parameter(zeros((r, self.out_features), **kwargs))
        init.kaiming_uniform_(self.lora_A, a=math.sqrt(5))

    def forward(self, x: Tensor) -> Tensor:
        y = F.linear(x, self.weight, self.bias)
        d = F.dropout(x, self.p_dropout, training=self._train)
        return y + (d @ self.lora_A @ self.lora_B) * self.scaling

    def delta_array(self):
        """The low-rank update ``A @ B * scaling`` as a raw device array
        (same dtype as the base weight) — used by compiled decode paths
        to fold unmerged adapters into their stacked weight snapshots."""
        a, b = self.lora_A._data, self.lora_B._data
        return (a @ b) * self.scaling

    def merge_(self) -> Linear:
        """Fold the update into the base weight and return a plain Linear
        carrying the SAME Parameter objects (dotted names unchanged)."""
        with no_grad():
            self.weight.data = self.weight._data + self.delta_array()
        out = Linear.__new__(Linear)
        Module.__init__(out)
        out.in_features = self.in_features
        out.out_features = self.out_features
        out.device = self.device
        out.weight = self.weight
        out.bias = self.bias
        out._train = self._train
        return out

    def __repr__(self) -> str:
        return ("LoRALinear(in_features={}, out_features={}, r={}, "
                "alpha={}, dropout={})".format(
                    self.in_features, self.out_features, self.r, self.alpha,
                    self.p_dropout))


def refresh_parameters(module: Module):
    """Rebuild ``_parameters`` for ``module`` and every descendant by
    replaying the Module system's assignment-time dotted-name flattening
    (module.py:32-38).  Call after module surgery (attribute replacement)
    so ancestors see parameters added or removed below them."""
    params = OrderedDict()
    for name, value in module.__dict__.items():
        if name == "_parameters":
            continue
        if isinstance(value, Parameter):
            params[name] = value
        elif isinstance(value, Module):
            refresh_parameters(value)
            for key, p in value._parameters.items():
                params[name + "." + key] = p
    module._parameters = params


def iter_named_modules(root: Module, prefix: str = ""):
    """Yield ``(dotted_path, module)`` for ``root`` and every descendant
    reachable through Module attributes (the same tree the dotted
    parameter names are built from)."""
    yield prefix, root
    for name, value in root.__dict__.items():
        if isinstance(value, Module):
            sub = name if not prefix else prefix + "." + name
            yield from iter_named_modules(value, sub)


def _swap_attr(mod: Module, name: str, old: Module, new: Module):
    """Replace ``mod.<name>`` and any aliasing entries in plain-list
    attributes (Sequential/ModuleList forward through ``module_list``,
    not the numbered attributes)."""
    setattr(mod, name, new)
    for value in mod.__dict__.values():
        if isinstance(value, list):
            for i, item in enumerate(value):
                if item is old:
                    value[i] = new


def apply_lora(root: Module, r: int, alpha: float = None,
               targets=("Q", "V"), dropout: float = 0.0,
               freeze: bool = True) -> int:
    """Wrap every ``Linear`` stored under an attribute name in
    ``targets`` anywhere in ``root``'s module tree with a
    :class:`LoRALinear`; returns the number wrapped.

    ``freeze=True`` (the standard LoRA recipe) also sets
    ``requires_grad=False`` on every pre-existing parameter of ``root``,
    leaving only the fresh ``lora_A``/``lora_B`` adapters trainable.
    """
    targets = set(targets)
    wrapped = 0
    for _, mod in list(iter_named_modules(root)):
        for name, value in list(mod.__dict__.items()):
            if name in targets and type(value) is Linear:
                _swap_attr(mod, name, value, LoRALinear(value, r, alpha,
                                                        dropout))
                wrapped += 1
    if wrapped:
        if freeze:
            for p in root._parameters.values():
                p.requires_grad = False
        refresh_parameters(root)
        if freeze:
            for name, p in root._parameters.items():
                if name.rsplit(".", 1)[-1] in ("lora_A", "lora_B"):
                    p.requires_grad = True
    return wrapped


def merge_lora(root: Module) -> int:
    """Fold every :class:`LoRALinear` under ``root`` back into a plain
    ``Linear`` (weight += A @ B * scaling); returns the number merged.
    Dotted parameter names are unchanged; the adapters disappear."""
    merged = 0
    for _, mod in list(iter_named_modules(root)):
        for name, value in list(mod.__dict__.items()):
            if isinstance(value, LoRALinear):
                _swap_attr(mod, name, value, value.merge_())
                merged += 1
    if merged:
        refresh_parameters(root)
    return merged


def lora_state_names(root: Module):
    """Dotted names of all adapter parameters under ``root``."""
    return [n for n in root._parameters
            if n.rsplit(".", 1)[-1] in ("lora_A", "lora_B")]
