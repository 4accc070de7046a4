from pwstablenet_tpu.models.blocks import DownBlock, UpBlock  # noqa: F401
from pwstablenet_tpu.models.discriminator import PatchDiscriminator  # noqa: F401
from pwstablenet_tpu.models.features import FeatureExtractor  # noqa: F401
from pwstablenet_tpu.models.generator import CascadedGenerator  # noqa: F401
from pwstablenet_tpu.models.unet import StageUNet  # noqa: F401
