"""Parameter: a Tensor registered by Modules, requires_grad by default.

Parity with /root/reference/pydynet/nn/parameter.py:4-17 (no-copy wrap).
"""
from ..core.tensor import Tensor


class Parameter(Tensor):

    def __init__(self, data, requires_grad: bool = True,
                 persistent: bool = True) -> None:
        """``persistent=False`` marks derived/scratch state (KV caches,
        precomputed RoPE tables) that ``state_dict``/checkpointing must
        skip: it is rebuilt by ``__init__`` and its shape depends on
        serving config (max_batch_size/max_seq_len), so saving it both
        bloats checkpoints and blocks loading into a model built with a
        different serving config (PyTorch's ``register_buffer``
        ``persistent`` flag, grafted onto the reference's
        everything-is-a-Parameter convention)."""
        if isinstance(data, Tensor):
            # share the underlying buffer, keep dtype/device
            super().__init__(data._data,
                             dtype=None,
                             device=data.device,
                             requires_grad=requires_grad)
        else:
            super().__init__(data, requires_grad=requires_grad)
        self.persistent = persistent

    def __repr__(self) -> str:
        return "Parameter : \n{}".format(self.numpy()) + (
            ",\ndevice={}".format(self.device)
            if self.device.kind != "cpu" else "")
