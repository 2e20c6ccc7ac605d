from .mesh import (
    batch_sharding,
    fsdp_sharding,
    make_mesh,
    replicated_sharding,
    shard_state,
    state_shardings,
)
from .train_step import (
    TrainState,
    create_train_state,
    make_cls_metric_step,
    make_eval_step,
    make_train_step,
)
