from yolov3_tpu.parallel.mesh import (  # noqa: F401
    DATA_AXIS,
    make_mesh,
    replicate_to_mesh,
    shard_batch,
)
from yolov3_tpu.parallel.train_step import (  # noqa: F401
    TrainState,
    ZeroAdamState,
    create_train_state,
    make_eval_step,
    make_train_step,
    place_train_state,
)
