from .mesh import make_mesh, named_sharding, shard, replicate
from . import llama_spmd
