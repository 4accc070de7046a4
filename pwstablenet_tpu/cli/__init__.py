from pwstablenet_tpu.cli.main import main  # noqa: F401
