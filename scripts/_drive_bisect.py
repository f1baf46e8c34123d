import numpy as np, jax, jax.numpy as jnp
from pydynet_tpu.models.llama.model import Llama
from pydynet_tpu.ops.decode_step import lane_pad_dim

m = Llama(vocab_size=32000, embed_dim=288, n_heads=6, ffn_dim=768,
          max_seq_len=256, n_layers=6)
m.eval()
m._fused_chunk_fn = m._make_fused_decode_fns()
fsb = m._fused_chunk_fn[6]
w = m._fused_weights(jnp.bfloat16)
width = lane_pad_dim(m.n_heads * m.head_dim)
N, S, B = m.n_layers, m.max_seq_len, 8
ck = jnp.zeros((N, B, S, width), w["tok"].dtype)
cv = jnp.zeros((N, B, S, width), w["tok"].dtype)
tok = jnp.ones((B,), jnp.int32)
nxt, ck, cv = fsb(w, ck, cv, tok, jnp.int32(0))
print("direct fused_step_batched OK:", np.asarray(nxt)[:3])
