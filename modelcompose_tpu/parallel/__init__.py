from .mesh import (batch_sharding, default_mesh, make_mesh,  # noqa: F401
                   mesh_for_batch, param_pspecs, shard_batch, shard_params)
