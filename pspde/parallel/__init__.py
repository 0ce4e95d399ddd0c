from .mesh import (batch_sharding, constrain_batch, make_mesh, replicated,
                   shard_batch, shard_params_tp)
