from .mesh import (make_mesh, make_hybrid_mesh, initialize_distributed,
                   named_sharding, shard, replicate)
from .ring_attention import ring_attention
from . import llama_spmd
from . import moe
from . import pipeline
from . import serve_spmd

from jax.sharding import PartitionSpec as _P

# Megatron-style tensor-parallel rules for the Llama *Module* tree
# (pydynet_tpu.models.llama.model), consumed by pdn.jit(mesh=...,
# shard_rules=...).  Weight layout is (in, out) like the reference, so
# column-parallel = shard the OUT dim, row-parallel = shard the IN dim.
LLAMA_TP_RULES = [
    ("*.attention.Q.weight", _P(None, "tp")),   # column-parallel QKV
    ("*.attention.K.weight", _P(None, "tp")),
    ("*.attention.V.weight", _P(None, "tp")),
    ("*.attention.O.weight", _P("tp", None)),   # row-parallel output proj
    ("*.ffn.gate.weight", _P(None, "tp")),
    ("*.ffn.up.weight", _P(None, "tp")),
    ("*.ffn.down.weight", _P("tp", None)),
    ("lm_head.weight", _P(None, "tp")),         # vocab-sharded head
    ("lm_head.bias", _P("tp")),
    ("tok_embedding.weight", _P("tp", None)),   # vocab-sharded embedding
    ("*.cache_k", _P(None, None, "tp", None)),  # head-sharded KV caches
    ("*.cache_v", _P(None, None, "tp", None)),
]
