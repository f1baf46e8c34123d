"""Golden-output fidelity vs the REFERENCE IMPLEMENTATION itself.

The reference (/root/reference, pure NumPy) is executed in a subprocess on a
small seeded synthetic checkpoint; its greedy token stream and logits are the
golden fixtures.  The rebuild must reproduce them exactly — through the same
npz checkpoint-loading path (``llm.llama.io.load_model`` HF-name mapping,
reference io.py:9-39) and through every decode path we ship (eager module,
compiled XLA scan, fused Pallas kernel in interpret mode).

The reference's ``generate`` has a position off-by-one (it feeds token L at
start_pos L+1, reference model.py:258-269; PARITY.md) which our ``generate``
deliberately fixes — so golden-token equality is asserted by driving OUR
eager module with the reference's exact (inputs, pos) schedule, and our
corrected decode paths are asserted mutually token-exact.
"""
import functools
import json
import os
import subprocess
import sys
import textwrap

import numpy as np
import pytest

REFERENCE = "/root/reference"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, "pydynet")),
    reason="reference checkout not mounted")

CFG = dict(vocab_size=256, embed_dim=64, n_heads=4, ffn_dim=128,
           max_seq_len=64, max_batch_size=1, n_layers=2)
PROMPT = [[1, 7, 13, 2]]
PROMPT2 = [[3, 1, 4, 1, 5, 9, 2, 6]]
TOTAL = 24  # reference semantics: TOTAL sequence-length bound

_REF_SCRIPT = textwrap.dedent("""
    import json, os, sys
    sys.dont_write_bytecode = True  # the reference mount is read-only
    # the rebuild repo also has a top-level `llm` package: make sure the
    # REFERENCE one wins (and the cwd entry python -c prepends is dropped)
    sys.path = [p for p in sys.path
                if p not in ("", os.getcwd(), "/root/repo")]
    sys.path.insert(0, {ref!r})
    import numpy as np

    from llm.llama.model import Llama
    from llm.llama import io
    import pydynet as pdn
    assert Llama.__module__ == "llm.llama.model" and \\
        "/root/reference" in io.__file__, io.__file__

    cfg = json.loads({cfg!r})
    cfg["dtype"] = np.float32
    out_dir = {out!r}
    V, D, F, N = (cfg["vocab_size"], cfg["embed_dim"], cfg["ffn_dim"],
                  cfg["n_layers"])

    # synthetic checkpoint in the HF naming/transposes load_model expects
    # (reference io.py:9-39); built with controlled scales — the reference's
    # own random init is unusable (Embedding inits from np.empty garbage)
    rng = np.random.RandomState(3)
    scale = 0.3
    ck = {{
        "model.embed_tokens.weight":
            rng.standard_normal((V, D)).astype(np.float32),
        "lm_head.weight":
            (rng.standard_normal((V, D)) * scale).astype(np.float32),
        "model.norm.weight": np.ones(D, np.float32),
    }}
    for i in range(N):
        for nm, shp in [("self_attn.q_proj", (D, D)),
                        ("self_attn.k_proj", (D, D)),
                        ("self_attn.v_proj", (D, D)),
                        ("self_attn.o_proj", (D, D)),
                        ("mlp.up_proj", (F, D)),
                        ("mlp.gate_proj", (F, D)),
                        ("mlp.down_proj", (D, F))]:
            ck[f"model.layers.{{i}}.{{nm}}.weight"] = \\
                (rng.standard_normal(shp) * scale).astype(np.float32)
        ck[f"model.layers.{{i}}.input_layernorm.weight"] = \\
            np.ones(D, np.float32)
        ck[f"model.layers.{{i}}.post_attention_layernorm.weight"] = \\
            np.ones(D, np.float32)
    np.savez(out_dir + "/ckpt.npz", **ck)

    np.random.seed(999)
    model = Llama(**cfg)
    io.load_model(model, out_dir + "/ckpt.npz")
    with pdn.no_grad():
        model.lm_head.bias.data[...] = 0.0  # not covered by load_model
    model.eval()

    prompt = np.array(json.loads({prompt!r}))
    toks = []
    with pdn.no_grad():
        for t in model.generate(prompt, {total}):
            toks.append(int(t.numpy()[0, 0]))
    assert len(set(toks)) > 5, toks  # non-degenerate stream

    with pdn.no_grad():
        logits = model.forward_logits(np.array(json.loads({prompt2!r})),
                                      0).numpy()
    np.savez(out_dir + "/golden.npz", tokens=np.array(toks), logits=logits)
    print("REF-GOLDEN-OK", toks)
""")


@pytest.fixture(scope="module")
def golden(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("golden"))
    script = _REF_SCRIPT.format(ref=REFERENCE, cfg=json.dumps(CFG), out=out,
                                prompt=json.dumps(PROMPT), total=TOTAL,
                                prompt2=json.dumps(PROMPT2))
    env = dict(os.environ, PYTHONDONTWRITEBYTECODE="1")
    proc = subprocess.run([sys.executable, "-c", script], env=env, cwd=out,
                          capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "REF-GOLDEN-OK" in proc.stdout
    data = np.load(out + "/golden.npz")
    return {"ckpt": out + "/ckpt.npz", "tokens": data["tokens"],
            "logits": data["logits"]}


def _build_ours(golden):
    import pydynet_tpu as pdn
    from pydynet_tpu.models.llama.model import Llama
    from pydynet_tpu.models.llama import io

    model = Llama(dtype=np.float32, **CFG)
    io.load_model(model, golden["ckpt"])
    with pdn.no_grad():
        model.lm_head.bias.data[...] = 0.0
    model.eval()
    return model


def _reference_schedule_decode(model, prompt, total):
    """Drive our eager module with the reference generate's exact
    (inputs, pos) schedule, off-by-one included (reference model.py:258-269)."""
    import pydynet_tpu as pdn

    toks = []
    next_id = None
    with pdn.no_grad():
        B, L = prompt.shape
        for i, curr_pos in enumerate(range(L, total)):
            inputs, pos = (prompt, 0) if i == 0 else (next_id, curr_pos)
            logits = model(inputs, pos).numpy()  # (B, 1, V)
            next_id = logits[:, -1, :].argmax(-1)[:, None]
            toks.append(int(next_id[0, 0]))
    return toks


def _corrected_schedule_decode(model, prompt, total):
    """Eager decode at the CORRECT positions (token L fed at pos L)."""
    import pydynet_tpu as pdn

    toks = []
    with pdn.no_grad():
        B, L = prompt.shape
        logits = model(prompt, 0).numpy()
        next_id = logits[:, -1, :].argmax(-1)[:, None]
        toks.append(int(next_id[0, 0]))
        for pos in range(L, total - 1):
            logits = model(next_id, pos).numpy()
            next_id = logits[:, -1, :].argmax(-1)[:, None]
            toks.append(int(next_id[0, 0]))
    return toks


def test_golden_logits_match_reference(golden):
    model = _build_ours(golden)
    import pydynet_tpu as pdn

    with pdn.no_grad():
        got = model.forward_logits(np.array(PROMPT2), 0).numpy()
    want = golden["logits"]
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)


def test_golden_tokens_reference_schedule(golden):
    """Our eager module, driven with the reference's schedule, reproduces the
    reference's greedy token stream EXACTLY."""
    model = _build_ours(golden)
    toks = _reference_schedule_decode(model, np.array(PROMPT), TOTAL)
    assert toks == list(golden["tokens"]), (toks, list(golden["tokens"]))


def test_all_decode_paths_token_exact(golden):
    """Eager (corrected positions), compiled XLA scan, and the fused Pallas
    kernel (interpret mode) must agree token-for-token."""
    import jax.numpy as jnp
    import pydynet_tpu as pdn
    from pydynet_tpu.ops import decode_step as dsk

    model = _build_ours(golden)
    prompt = np.array(PROMPT)
    want = _corrected_schedule_decode(model, prompt, TOTAL)

    with pdn.no_grad():
        xla = [int(t.numpy()[0, 0])
               for t in model.generate(prompt, TOTAL, chunk=7, fused=False)]
    assert xla == want, (xla, want)

    # fused path: force interpret=True so the Pallas kernels run on CPU
    orig_step = dsk.fused_decode_step
    orig_tok = dsk.fused_decode_token
    dsk.fused_decode_step = functools.partial(orig_step, interpret=True)
    dsk.fused_decode_token = functools.partial(orig_tok, interpret=True)
    try:
        model._fused_chunk_fn = None  # rebuild against the patched kernels
        with pdn.no_grad():
            fused = [int(t.numpy()[0, 0])
                     for t in model.generate(prompt, TOTAL, chunk=7,
                                             fused=True)]
    finally:
        dsk.fused_decode_step = orig_step
        dsk.fused_decode_token = orig_tok
        model._fused_chunk_fn = None
    assert fused == want, (fused, want)


def test_golden_margins_are_robust(golden):
    """Guard against flaky argmax ties: at every decode step the top-1 vs
    top-2 logit gap must clear float32 noise by orders of magnitude."""
    import pydynet_tpu as pdn

    model = _build_ours(golden)
    prompt = np.array(PROMPT)
    min_gap = np.inf
    next_id = None
    with pdn.no_grad():
        B, L = prompt.shape
        for i, curr_pos in enumerate(range(L, TOTAL)):
            inputs, pos = (prompt, 0) if i == 0 else (next_id, curr_pos)
            logits = model(inputs, pos).numpy()[:, -1, :]
            top2 = np.sort(logits[0])[-2:]
            min_gap = min(min_gap, float(top2[1] - top2[0]))
            next_id = logits.argmax(-1)[:, None]
    assert min_gap > 1e-3, min_gap


# ===================================================================== #
#                          CLIP golden fixture                           #
# ===================================================================== #
CLIP_CFG = dict(image_dim=32, image_heads=2, image_mlp_dim=64, image_patch=8,
                image_layers=2, text_dim=16, text_heads=2, text_mlp_dim=32,
                text_layers=2, final_dim=16, vocab_size=64, vision_tokens=5,
                text_tokens=12)

_CLIP_SCRIPT = textwrap.dedent("""
    import json, os, sys
    sys.dont_write_bytecode = True
    sys.path = [p for p in sys.path
                if p not in ("", os.getcwd(), "/root/repo")]
    sys.path.insert(0, {ref!r})
    import numpy as np

    from llm.clip.model import CLIP
    import pydynet as pdn
    assert CLIP.__module__ == "llm.clip.model"

    cfg = json.loads({cfg!r})
    out_dir = {out!r}

    model = CLIP(**cfg)
    # overwrite EVERY parameter with seeded values (the reference's
    # Embedding init is np.empty garbage) and save them by dotted name
    rng = np.random.RandomState(11)
    weights = {{}}
    with pdn.no_grad():
        for name, p in sorted(model._parameters.items()):
            w = (rng.standard_normal(p.shape) * 0.25).astype(np.float32)
            p.data[...] = w
            weights[name] = w
    np.savez(out_dir + "/clip_weights.npz", **weights)

    model.eval()
    img = rng.standard_normal((1, 3, 16, 16)).astype(np.float32)
    # 3 candidate captions; make a distinct max-id (EOT-pool) position per row
    idx = rng.randint(1, 40, (3, cfg["text_tokens"])).astype(np.int64)
    for r, eot in enumerate((5, 8, 11)):
        idx[r, eot] = cfg["vocab_size"] - 1
    with pdn.no_grad():
        logits = model(pdn.Tensor(img), idx).numpy()
    e = np.exp(logits - logits.max(-1, keepdims=True))
    probs = e / e.sum(-1, keepdims=True)
    np.savez(out_dir + "/clip_golden.npz", img=img, idx=idx, probs=probs,
             logits=logits)
    print("CLIP-GOLDEN-OK", probs.tolist())
""")


@pytest.fixture(scope="module")
def clip_golden(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("clip_golden"))
    script = _CLIP_SCRIPT.format(ref=REFERENCE, cfg=json.dumps(CLIP_CFG),
                                 out=out)
    env = dict(os.environ, PYTHONDONTWRITEBYTECODE="1")
    proc = subprocess.run([sys.executable, "-c", script], env=env, cwd=out,
                          capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "CLIP-GOLDEN-OK" in proc.stdout
    data = np.load(out + "/clip_golden.npz")
    return {"weights": out + "/clip_weights.npz", "img": data["img"],
            "idx": data["idx"], "probs": data["probs"],
            "logits": data["logits"]}


def test_clip_zero_shot_matches_reference(clip_golden):
    """The reference's zero-shot sanity check (README.md:41-43 semantics) on
    synthetic weights: our CLIP must reproduce the probability vector."""
    import pydynet_tpu as pdn
    from pydynet_tpu.models.clip.model import CLIP

    model = CLIP(**CLIP_CFG)
    weights = np.load(clip_golden["weights"])
    ours = set(model._parameters)
    theirs = set(weights.files)
    assert ours == theirs, (ours - theirs, theirs - ours)
    with pdn.no_grad():
        for name in weights.files:
            model._parameters[name].data[...] = weights[name]
    model.eval()

    with pdn.no_grad():
        logits = model(pdn.Tensor(clip_golden["img"]),
                       clip_golden["idx"]).numpy()
    np.testing.assert_allclose(logits, clip_golden["logits"], atol=2e-5,
                               rtol=1e-5)
    e = np.exp(logits - logits.max(-1, keepdims=True))
    probs = e / e.sum(-1, keepdims=True)
    np.testing.assert_allclose(probs, clip_golden["probs"], atol=1e-5)
