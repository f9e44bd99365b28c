from .mesh import make_mesh, local_mesh, shard_batch, replicate, with_sharding
from . import fsdp
from .mesh import process_shard
