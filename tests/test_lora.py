"""LoRA adapters: module surgery, frozen-base training, decode-path
folding, merge equivalence, adapter checkpoint round trip.

Extension beyond the reference (whole-matrix prefix freezing,
/root/reference/llm/llama/model.py:213-224)."""
import os

import numpy as np

import pydynet_tpu as pdn
from pydynet_tpu import nn, optim
from pydynet_tpu.nn.modules.lora import (LoRALinear, apply_lora, merge_lora,
                                         refresh_parameters,
                                         lora_state_names)
from pydynet_tpu.models.llama.model import Llama
from pydynet_tpu.models.llama import io as llama_io

np.random.seed(0)

CFG = dict(vocab_size=61, embed_dim=24, n_heads=2, ffn_dim=40,
           max_seq_len=32, max_batch_size=1, n_layers=2,
           dtype=np.float32)


def tiny_model(seed=0):
    np.random.seed(seed)
    return Llama(**CFG)


# --------------------------- module level --------------------------- #
def test_lora_linear_identity_at_init():
    np.random.seed(1)
    base = nn.Linear(12, 7)
    x = pdn.Tensor(np.random.randn(5, 12).astype(np.float32))
    y0 = base(x).numpy()
    wrapped = LoRALinear(base, r=3, alpha=6.0)
    wrapped.eval()
    np.testing.assert_array_equal(wrapped(x).numpy(), y0)
    # adopted parameters keep their names; adapters are new
    assert set(wrapped._parameters) == {"weight", "bias", "lora_A", "lora_B"}
    assert not wrapped.weight.requires_grad
    assert wrapped.lora_A.requires_grad and wrapped.lora_B.requires_grad


def test_lora_linear_forward_matches_manual():
    np.random.seed(2)
    base = nn.Linear(9, 5, bias=False)
    lw = LoRALinear(base, r=2, alpha=4.0)
    # give B a nonzero value so the delta participates
    lw.lora_B.data = np.random.randn(2, 5).astype(np.float32)
    x = np.random.randn(3, 9).astype(np.float32)
    want = (x @ lw.weight.numpy()
            + (x @ lw.lora_A.numpy() @ lw.lora_B.numpy()) * lw.scaling)
    got = lw(pdn.Tensor(x)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_apply_lora_registration_and_freeze():
    model = tiny_model()
    n_before = len(model._parameters)
    trainable, frozen = model.add_lora(r=4, alpha=8.0, targets=("Q", "V"))
    # 2 layers x 2 targets x (A, B)
    assert trainable == 8
    assert trainable + frozen == n_before + 8
    names = lora_state_names(model)
    assert "layers.0.attention.Q.lora_A" in names
    assert "layers.1.attention.V.lora_B" in names
    # base dotted names unchanged and frozen
    p = model._parameters["layers.0.attention.Q.weight"]
    assert not p.requires_grad
    assert all(not model._parameters[n].requires_grad
               for n in model._parameters if n not in names)
    # optimizer sees only the adapters
    assert len(list(model.parameters())) == 8


def test_lora_finetune_trains_only_adapters():
    model = tiny_model()
    model.add_lora(r=4, alpha=8.0, targets=("Q", "V"))
    base_snap = {n: p.numpy().copy()
                 for n, p in model._parameters.items()
                 if n not in lora_state_names(model)
                 and "cache" not in n}
    b_before = model._parameters["layers.0.attention.Q.lora_B"].numpy().copy()

    opt = optim.Adam(model.parameters(), lr=1e-2)
    inp = np.array([[1, 5, 9, 4, 7, 2]])
    tgt = np.array([[5, 9, 4, 7, 2, 3]])
    losses = [model.finetune_step(inp, tgt, opt) for _ in range(12)]
    assert losses[-1] < losses[0], losses

    for n, a in base_snap.items():
        np.testing.assert_array_equal(
            model._parameters[n].numpy(), a, err_msg=n)
    b_after = model._parameters["layers.0.attention.Q.lora_B"].numpy()
    assert not np.array_equal(b_before, b_after)


def test_lora_decode_folds_delta_and_merge_is_exact():
    model = tiny_model()
    model.add_lora(r=4, alpha=8.0, targets=("Q", "V", "O"))
    opt = optim.Adam(model.parameters(), lr=5e-2)
    inp = np.array([[1, 5, 9, 4, 7, 2]])
    tgt = np.array([[5, 9, 4, 7, 2, 3]])
    for _ in range(6):
        model.finetune_step(inp, tgt, opt)

    ids = np.array([[1, 5, 9]])
    model.eval()
    with pdn.no_grad():
        toks_unmerged = [int(t.numpy()[0, 0])
                         for t in model.generate(ids, 16, chunk=4)]
    # decode must differ from the base model (the delta is folded in)
    base = tiny_model()
    base.eval()
    with pdn.no_grad():
        toks_base = [int(t.numpy()[0, 0])
                     for t in base.generate(ids, 16, chunk=4)]
    assert toks_unmerged != toks_base

    merged = model.merge_lora()
    assert merged == 6
    assert not lora_state_names(model)
    assert type(model.layers[0].attention.Q) is nn.Linear
    with pdn.no_grad():
        toks_merged = [int(t.numpy()[0, 0])
                       for t in model.generate(ids, 16, chunk=4)]
    # both paths computed the same W + A@B*s array -> bit-identical stream
    assert toks_merged == toks_unmerged


def test_lora_eager_forward_matches_decode_fold():
    """The eager module path (base + low-rank term separately) and the
    decode path (folded W + dW) agree to float tolerance."""
    model = tiny_model()
    model.add_lora(r=3, alpha=6.0, targets=("Q", "V"))
    # nonzero B so the adapters matter
    with pdn.no_grad():
        for n in lora_state_names(model):
            if n.endswith("lora_B"):
                p = model._parameters[n]
                p.data = np.random.randn(*p.shape).astype(np.float32) * 0.1
    model._weights_cache.clear()
    model.eval()
    ids = np.array([[1, 5, 9, 2]])
    logits_eager = model.forward_logits(pdn.Tensor(ids), 0).numpy()
    w = model._weights()
    if model._decode_fns is None:
        model._decode_fns = model._make_decode_fns()
    import jax.numpy as jnp
    ck, cv = model._empty_caches(1, w["tok"].dtype)
    logits_dec, _, _ = model._xla_forward_logits_all(
        w, ck, cv, jnp.asarray(ids, jnp.int32), 0)
    np.testing.assert_allclose(np.asarray(logits_dec)[0], logits_eager[0],
                               rtol=2e-4, atol=2e-4)


def test_lora_adapter_checkpoint_round_trip(tmp_path):
    model = tiny_model()
    model.add_lora(r=4, alpha=8.0, targets=("Q", "V"))
    opt = optim.Adam(model.parameters(), lr=5e-2)
    inp = np.array([[1, 5, 9, 4, 7, 2]])
    tgt = np.array([[5, 9, 4, 7, 2, 3]])
    for _ in range(4):
        model.finetune_step(inp, tgt, opt)
    path = os.path.join(tmp_path, "lora.npz")
    llama_io.save_finetuned_parameters(model, path)
    saved = np.load(path)
    assert set(saved.files) == set(lora_state_names(model))

    fresh = tiny_model()  # same base weights (same seed)
    fresh.add_lora(r=4, alpha=8.0, targets=("Q", "V"))
    llama_io.load_finetuned_parameters(fresh, path)
    ids = np.array([[1, 5, 9]])
    model.eval(), fresh.eval()
    with pdn.no_grad():
        a = [int(t.numpy()[0, 0]) for t in model.generate(ids, 14, chunk=4)]
        b = [int(t.numpy()[0, 0]) for t in fresh.generate(ids, 14, chunk=4)]
    assert a == b


def test_refresh_parameters_matches_constructor_flattening():
    model = tiny_model()
    before = dict(model._parameters)
    refresh_parameters(model)
    assert list(model._parameters) == list(before)
    assert all(model._parameters[k] is before[k] for k in before)


def test_clip_lora_finetune():
    from tests.test_clip import tiny_clip, TINY
    clip = tiny_clip()
    trainable, frozen = clip.add_lora(r=2, alpha=4.0, targets=("QKV", "O"))
    assert trainable == len(list(clip.parameters()))
    base_snap = {n: p.numpy().copy()
                 for n, p in clip._parameters.items()
                 if not n.endswith(("lora_A", "lora_B"))}
    opt = optim.Adam(clip.parameters(), lr=5e-2)
    img = np.random.randn(1, 3, 32, 32).astype(np.float32)
    text = np.zeros((2, TINY["text_tokens"]), np.int64)
    text[:, 0] = 1
    text[0, 1], text[1, 1] = 7, 9
    text[:, 2] = 63
    target = np.array([1], np.int64)
    losses = [clip.finetune_step(img, text, target, opt) for _ in range(10)]
    assert losses[-1] < losses[0]
    for n, a in base_snap.items():
        np.testing.assert_array_equal(clip._parameters[n].numpy(), a,
                                      err_msg=n)
    assert clip.merge_lora() > 0


def test_apply_merge_on_generic_module():
    np.random.seed(3)

    class Block(nn.Module):
        def __init__(self):
            super().__init__()
            self.proj = nn.Linear(8, 8)
            self.out = nn.Linear(8, 4)

        def forward(self, x):
            return self.out(self.proj(x))

    class Net(nn.Module):
        def __init__(self):
            super().__init__()
            self.blocks = nn.ModuleList([Block(), Block()])

        def forward(self, x):
            for b in self.blocks:
                x = b(x)
            return x

    net = Net()
    # Net.forward chains blocks; shapes differ (8->4), use blocks directly
    x = pdn.Tensor(np.random.randn(2, 8).astype(np.float32))
    y0 = net.blocks[0](x).numpy()
    n = apply_lora(net, r=2, targets=("proj",))
    assert n == 2
    assert "blocks.0.proj.lora_A" in net._parameters
    with pdn.no_grad():
        for name, p in net._parameters.items():
            if name.endswith("lora_B"):
                p.data = np.random.randn(*p.shape).astype(np.float32)
    net.eval()
    y1 = net.blocks[0](x).numpy()
    assert not np.allclose(y0, y1)
    merge_lora(net)
    assert "blocks.0.proj.lora_A" not in net._parameters
    y2 = net.blocks[0](x).numpy()
    np.testing.assert_allclose(y2, y1, rtol=1e-5, atol=1e-5)
