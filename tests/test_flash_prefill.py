"""Flash-attention prefill routing (VERDICT r04 #4): eval-mode pure-causal
prefill (pos == 0, no starts) through the Pallas blockwise kernel instead
of the materialized O(L^2) score matrix — `generate`, the serve admission
waves, and the fused lane's whole-seq dispatch all take the same static
``flash`` switch through ``forward_logits_one`` (model.py).

CPU platform (conftest): ``flash="interpret"`` runs the kernel in Pallas
interpret mode; below the tiling threshold ``flash_attention_causal``
falls back to the exact dense composite, which still exercises the flash
branch's operand plumbing (pre-cache K/V, GQA expansion, dtype casts).
"""
import numpy as np
import pytest

import pydynet_tpu as pdn
from pydynet_tpu.models.llama.model import (FLASH_PREFILL_MIN, Llama,
                                            flash_prefill_mode)
from pydynet_tpu.models.llama.serve import LlamaServer

CFG = dict(vocab_size=128, embed_dim=32, n_heads=4, ffn_dim=64,
           max_seq_len=64, max_batch_size=1, n_layers=2, dtype=np.float32)


def stream(model, prompt, n_new, **kw):
    with pdn.no_grad():
        return [int(t.numpy()[0, 0])
                for t in model.generate(np.asarray([prompt]),
                                        len(prompt) + n_new, **kw)]


def test_flash_prefill_stream_exact_all_lanes():
    """generate's XLA lane: flash and dense prefill produce the same
    greedy stream (the flash branch attends exactly the rows the causal
    mask leaves visible)."""
    np.random.seed(61)
    model = Llama(**CFG)
    model.eval()
    p = list(np.random.randint(1, 128, 17))
    a = stream(model, p, 12, fused=False, flash_prefill=False)
    b = stream(model, p, 12, fused=False, flash_prefill="interpret")
    assert a == b, (a, b)


def test_flash_prefill_gqa_and_sampling():
    """GQA configs expand K/V per query-head group inside the flash
    branch; the sampled prefill threads the same flash switch."""
    np.random.seed(62)
    model = Llama(**dict(CFG, n_heads=4, n_kv_heads=2))
    model.eval()
    p = list(np.random.randint(1, 128, 9))
    a = stream(model, p, 10, fused=False, flash_prefill=False)
    b = stream(model, p, 10, fused=False, flash_prefill="interpret")
    assert a == b, (a, b)
    kw = dict(fused=False, temperature=0.8, top_k=13, seed=5)
    sa = stream(model, p, 10, flash_prefill=False, **kw)
    sb = stream(model, p, 10, flash_prefill="interpret", **kw)
    assert sa == sb, (sa, sb)


def test_flash_prefill_fused_whole_seq_dispatch():
    """The fused lane's prefill_decode (whole request in one dispatch)
    takes the flash switch through its XLA prefill too."""
    np.random.seed(63)
    model = Llama(**CFG)
    model.eval()
    p = list(np.random.randint(1, 128, 11))
    a = stream(model, p, 12, flash_prefill=False)
    b = stream(model, p, 12, flash_prefill="interpret")
    assert a == b, (a, b)


def test_flash_prefill_server_admission():
    """LlamaServer admission waves route prefill through the flash
    switch; streams match a dense-prefill server."""
    np.random.seed(64)
    model = Llama(**CFG)
    model.eval()
    prompts = [[1, 5, 9, 11, 2, 8, 3], [2, 7, 3, 11]]

    def serve(flash):
        with pdn.no_grad():
            srv = LlamaServer(model, batch_size=2, chunk=4, eos_id=-1,
                              lane="xla", flash_prefill=flash)
            rids = [srv.submit(p, max_new_tokens=8) for p in prompts]
            done = srv.run()
        return [done[r].tokens for r in rids]

    assert serve(False) == serve("interpret")


def test_flash_prefill_mode_routing():
    """The auto rule: off below FLASH_PREFILL_MIN, off on non-TPU
    platforms (interpret is test-only), and a starts-masked admission
    can never take the flash path."""
    np.random.seed(65)
    model = Llama(**CFG)
    model.eval()
    w = model._weights()
    assert flash_prefill_mode(w, FLASH_PREFILL_MIN - 1) is False
    # conftest forces the CPU platform -> auto stays dense even when long
    assert flash_prefill_mode(w, FLASH_PREFILL_MIN) is False
    if model._decode_fns is None:
        model._decode_fns = model._make_decode_fns()
    import jax.numpy as jnp
    ck, cv = model._empty_caches(2, w["tok"].dtype)
    with pytest.raises(ValueError, match="starts"):
        model._xla_forward_logits(w, ck, cv,
                                  jnp.zeros((2, 4), jnp.int32), 0,
                                  starts=jnp.zeros((2,), jnp.int32),
                                  flash=True)


@pytest.mark.slow
def test_flash_prefill_real_kernel_interpret_long():
    """L=256 tiles (block_q=256), so the REAL blockwise kernel runs (in
    interpret mode) through the whole generate path — not the dense
    fallback — and the stream still matches dense prefill."""
    np.random.seed(66)
    model = Llama(**dict(CFG, embed_dim=32, n_heads=2, max_seq_len=320))
    model.eval()
    p = list(np.random.randint(1, 128, 250))  # buckets to 256
    a = stream(model, p, 8, fused=False, flash_prefill=False)
    b = stream(model, p, 8, fused=False, flash_prefill="interpret")
    assert a == b, (a, b)
