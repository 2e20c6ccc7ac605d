from .mesh import make_mesh, batch_sharding, replicated_sharding
from .train_step import (
    TrainState,
    create_train_state,
    make_cls_metric_step,
    make_eval_step,
    make_train_step,
)
