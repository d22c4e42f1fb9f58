from .sharded import (
    exec_type1_sharded,
    exec_type2_sharded,
    make_mesh,
    shard_points,
)
from .spatial import SpatialNUFFT, SpatialPoints

__all__ = [
    "exec_type1_sharded",
    "exec_type2_sharded",
    "make_mesh",
    "shard_points",
    "SpatialNUFFT",
    "SpatialPoints",
]
