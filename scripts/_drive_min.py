import numpy as np, jax, jax.numpy as jnp
print("backend:", jax.default_backend())
from pydynet_tpu.models.llama.model import Llama
from pydynet_tpu.models.llama.serve import LlamaServer
m = Llama(vocab_size=32000, embed_dim=288, n_heads=6, ffn_dim=768,
          max_seq_len=256, n_layers=6)
m.eval()
srv = LlamaServer(m, batch_size=8, dtype=jnp.bfloat16, chunk=32, eos_id=-1)
print("ck device:", srv._ck.devices() if hasattr(srv._ck, "devices") else "?")
rid = srv.submit(list(range(1, 9)), max_new_tokens=8)
done = srv.run()
print("OK", done[rid].tokens[:4])
