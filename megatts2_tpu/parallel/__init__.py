from .mesh import (DATA_AXIS, MODEL_AXIS, data_sharding, make_mesh,
                   maybe_initialize_distributed, replicated, shard_batch)
from .sharding import (opt_shardings, param_shardings, place_train_state,
                       replicated_like)
