from .mesh import make_mesh, multihost_initialize
from .sharding import (
    cache_pspecs,
    param_pspecs,
    shard_params,
)

__all__ = [
    "make_mesh",
    "multihost_initialize",
    "param_pspecs",
    "cache_pspecs",
    "shard_params",
]
