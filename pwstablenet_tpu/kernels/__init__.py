from pwstablenet_tpu.kernels.grid_sample_pallas import (  # noqa: F401
    grid_sample_pallas,
)
