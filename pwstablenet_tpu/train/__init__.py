from pwstablenet_tpu.train.state import (  # noqa: F401
    TrainState,
    create_models,
    create_train_state,
    generator_params,
    make_optimizers,
)
from pwstablenet_tpu.train.step import make_train_step  # noqa: F401
