from pwstablenet_tpu.utils.timing import device_time  # noqa: F401
