from pwstablenet_tpu.interop.torch_import import (  # noqa: F401
    load_torch_checkpoint,
    torch_state_dict_to_flax,
)
