from .mesh import (batch_sharding, constrain_batch, initialize_multihost,
                   make_mesh, replicated, shard_batch, shard_params_tp)
