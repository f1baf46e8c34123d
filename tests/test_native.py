"""Native C++ tokenizer engine vs the pure-Python reference loop."""
import time

import numpy as np
import pytest

from pydynet_tpu.native import NativeVocab, native_available
from pydynet_tpu.models.llama.tokenizer import Tokenizer


@pytest.mark.skipif(not native_available(), reason="no C++ toolchain")
def test_native_matches_python_merges(tmp_path):
    import json
    vocab = {
        "tokens": ["<unk>", "<s>", "</s>", "a", "b", "c", "ab", "abc",
                   "bc", "ca"],
        "scores": [0.0, 0.0, 0.0, 1.0, 1.0, 1.0, 5.0, 9.0, 6.0, 4.0],
    }
    path = str(tmp_path / "tok.json")
    with open(path, "w") as f:
        json.dump(vocab, f)
    tok = Tokenizer(path)
    assert tok._native is not None

    texts = ["abc", "cab", "aabbcc", "abcabcabc", "xyz abc", "", "a",
             "ccabba"]
    for text in texts:
        native_ids = tok.encode(text, add_bos=False)
        tok._native, saved = None, tok._native
        python_ids = tok.encode(text, add_bos=False)
        tok._native = saved
        assert native_ids == python_ids, (text, native_ids, python_ids)


@pytest.mark.skipif(not native_available(), reason="no C++ toolchain")
def test_native_unicode_and_flags():
    tok = Tokenizer(None)  # byte-level fallback vocab + native engine
    ids = tok.encode("héllo", add_bos=True, add_eos=True)
    assert ids[0] == tok.bos_id and ids[-1] == tok.eos_id

    tok._native, saved = None, tok._native
    py = tok.encode("héllo", add_bos=True, add_eos=True)
    tok._native = saved
    assert ids == py


@pytest.mark.skipif(not native_available(), reason="no C++ toolchain")
def test_native_speedup_on_long_text(tmp_path):
    import json
    rng = np.random.default_rng(0)
    # synthetic vocab with lots of merge candidates
    base = [chr(97 + i) for i in range(26)]
    merges = ["".join(rng.choice(base, 2)) for _ in range(400)]
    merges += ["".join(rng.choice(base, 3)) for _ in range(400)]
    tokens = ["<unk>", "<s>", "</s>"] + base + merges
    scores = [0.0] * 3 + [1.0] * 26 + \
        rng.uniform(2, 10, len(merges)).tolist()
    path = str(tmp_path / "tok.json")
    with open(path, "w") as f:
        json.dump({"tokens": tokens, "scores": scores}, f)
    tok = Tokenizer(path)
    text = "".join(rng.choice(base, 600))

    t0 = time.time()
    native_ids = tok.encode(text, add_bos=False)
    t_native = time.time() - t0

    tok._native, saved = None, tok._native
    t0 = time.time()
    python_ids = tok.encode(text, add_bos=False)
    t_python = time.time() - t0
    tok._native = saved

    assert native_ids == python_ids
    assert t_native < t_python  # typically 50-500x
    print(f"native {t_native*1e3:.2f}ms vs python {t_python*1e3:.1f}ms")
