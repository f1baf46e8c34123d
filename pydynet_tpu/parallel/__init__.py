from .mesh import make_mesh, named_sharding, shard, replicate
from .ring_attention import ring_attention
from . import llama_spmd
