from .mesh import make_mesh, shard_batch
from .msm import msm_sharded
from .ntt import ntt_sharded

__all__ = ["make_mesh", "shard_batch", "msm_sharded", "ntt_sharded"]
