from .dp import make_dp_step_fns, replicate_state
from .mesh import (DATA_AXIS, MODEL_AXIS, batch_sharding, make_mesh, put_batch,
                   put_replicated, put_stack, replicated, stack_sharding)
from .tp import shard_state_tp, tp_param_shardings
from .multihost import (global_batch_from_local, host_batch_slice,
                        init_multihost, replicate_tree_multihost)
