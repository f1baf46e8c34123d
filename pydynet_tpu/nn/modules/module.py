"""Module system (parity with /root/reference/pydynet/nn/modules/module.py).

Registration quirks preserved: ``__setattr__`` flattens child parameters into
the parent's ``_parameters`` dict with dotted names *at assignment time*
(module.py:19-25), ``parameters()`` yields only requires-grad params
(module.py:40-43), and ``train(mode)`` also flips the global grad switch
(module.py:45-47).

TPU addition: ``_state_tensors()`` exposes every registered Parameter
(trainable weights *and* buffers like running stats / KV caches) to
``pydynet_tpu.jit`` so whole train/eval steps compile with the module state
threaded functionally.
"""
from collections import OrderedDict

from ..parameter import Parameter
from ...core.tensor import Tensor
from ...autograd import set_grad_enabled
from ...device import Device, current_device


class Module:

    def __init__(self) -> None:
        self._train = True
        self.device = Device("cpu")
        self._parameters = OrderedDict()

    def __call__(self, *x) -> Tensor:
        return self.forward(*x)

    def __setattr__(self, name: str, value) -> None:
        self.__dict__[name] = value
        if isinstance(value, Parameter):
            self._parameters[name] = value
        if isinstance(value, Module):
            for key in value._parameters:
                self._parameters[name + "." + key] = value._parameters[key]

    def __repr__(self) -> str:
        module_list = [(n, m) for n, m in self.__dict__.items()
                       if isinstance(m, Module)]
        return "{}(\n{}\n)".format(
            self.__class__.__name__,
            "\n".join("{:>10} : {}".format(n, m) for n, m in module_list),
        )

    def parameters(self):
        for param in self._parameters.values():
            if param.requires_grad:
                yield param

    def named_parameters(self):
        yield from self._parameters.items()

    def state_dict(self):
        """Dotted-name -> numpy snapshot of all parameters and buffers."""
        from ...utils.checkpoint import state_dict
        return state_dict(self)

    def load_state_dict(self, state, strict: bool = True):
        from ...utils.checkpoint import load_state_dict
        return load_state_dict(self, state, strict=strict)

    def _state_tensors(self):
        return list(self._parameters.values())

    def train(self, mode: bool = True):
        set_grad_enabled(mode)
        self.set_module_state(mode)
        return self

    def set_module_state(self, mode: bool):
        self._train = mode
        for module in self.__dict__.values():
            if isinstance(module, Module):
                module.set_module_state(mode)

    def forward(self, x: Tensor) -> Tensor:
        raise NotImplementedError

    def eval(self):
        return self.train(False)

    def to(self, device):
        if not isinstance(device, Device):
            device = Device(device)
        if self.device != device:
            self.move(device)
        return self

    def move(self, device):
        self.device = device
        for module in self.__dict__.values():
            if isinstance(module, Module):
                module.move(device)
            if isinstance(module, Parameter):
                module.to(device)
        # parameters registered via dotted names but not attributes of self
        for param in self._parameters.values():
            param.to(device)

    def cuda(self):
        return self.to(current_device())

    def cpu(self):
        return self.to("cpu")


class Sequential(Module):

    def __init__(self, *args) -> None:
        super().__init__()
        self.module_list = []
        if len(args) == 1 and isinstance(args[0], OrderedDict):
            items = args[0].items()
        else:
            items = ((str(i), m) for i, m in enumerate(args))
        for name, module in items:
            self.__setattr__(name, module)
            self.module_list.append(module)

    def forward(self, x: Tensor) -> Tensor:
        for module in self.module_list:
            x = module(x)
        return x

    def __len__(self):
        return len(self.module_list)

    def __getitem__(self, index):
        return self.module_list[index]


class ModuleList(Module):

    def __init__(self, module_list: list) -> None:
        super().__init__()
        self.module_list = list(module_list)
        for idx, module in enumerate(self.module_list):
            self.__setattr__(str(idx), module)

    def __getitem__(self, index):
        return self.module_list[index]

    def __len__(self):
        return len(self.module_list)

    def __iter__(self):
        return iter(self.module_list)

    def append(self, module):
        self.module_list.append(module)
        self.__setattr__(str(len(self.module_list) - 1), module)

    def index(self, module):
        return self.module_list.index(module)
