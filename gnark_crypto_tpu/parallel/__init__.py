from .mesh import make_mesh, make_mesh_2d, shard_batch
from .msm import msm_sharded, msm_sharded_2d
from .ntt import ntt_sharded

__all__ = [
    "make_mesh",
    "make_mesh_2d",
    "shard_batch",
    "msm_sharded",
    "msm_sharded_2d",
    "ntt_sharded",
]
