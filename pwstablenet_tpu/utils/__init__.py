from pwstablenet_tpu.utils.timing import device_time  # noqa: F401
from pwstablenet_tpu.utils.profiling import scope, trace, wall_breakdown  # noqa: F401
