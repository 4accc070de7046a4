from pwstablenet_tpu.data.synthetic import (  # noqa: F401
    make_train_batch,
    synthetic_pair_clip,
)
