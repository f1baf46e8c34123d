import time, numpy as np
import jax.numpy as jnp
from pydynet_tpu.models.llama.model import Llama
from pydynet_tpu.models.llama.serve import LlamaServer

m = Llama(vocab_size=32000, embed_dim=288, n_heads=6, ffn_dim=768,
          max_seq_len=256, n_layers=6)
m = m.to("cuda:0")
m.eval()
rng = np.random.default_rng(0)
prompts = [list(rng.integers(1, 31999, size=rng.integers(4, 24))) for _ in range(12)]

outs = {}
for kvq in (None, "int8"):
    srv = LlamaServer(m, batch_size=8, dtype=jnp.bfloat16, chunk=32,
                      eos_id=-1, kv_quant=kvq)
    rids = [srv.submit(p, max_new_tokens=48) for p in prompts]
    t0 = time.perf_counter()
    done = srv.run()
    dt = time.perf_counter() - t0
    toks = sum(len(done[r].tokens) for r in rids)
    outs[kvq] = [tuple(done[r].tokens) for r in rids]
    print(f"kv_quant={kvq}: {toks} tokens in {dt:.2f}s -> {toks/dt:.0f} tok/s aggregate")

match = sum(a == b for a, b in zip(outs[None], outs["int8"]))
print(f"token-identical vs bf16 (lossy expected near ties): {match}/12")
for r in outs["int8"]:
    assert len(r) > 0 and all(0 <= t < 32000 for t in r)
print("int8-KV serve drive OK")
