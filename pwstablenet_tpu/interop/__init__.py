from pwstablenet_tpu.interop.torch_import import (  # noqa: F401
    feat_state_dict_to_flax,
    flax_to_torch_state_dict,
    load_torch_checkpoint,
    torch_state_dict_to_flax,
    torchvision_vgg_to_flax,
)
