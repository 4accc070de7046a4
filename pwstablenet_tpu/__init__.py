"""PWStableNet-TPU: a TPU-native video-stabilization framework.

A from-scratch JAX/Flax/Pallas rebuild of the capabilities of
mindazhao/PWStableNet (pixel-wise warping maps for video stabilization,
IEEE TIP 2020).  The reference mount was empty at build time (see
SURVEY.md section 0); the capability contract is BASELINE.json and the
published paper, arXiv:1905.08959.

Layout
------
- ``ops``      pure-function image/warp/loss primitives (jax.numpy)
- ``kernels``  Pallas TPU kernels (fused gather-interpolate grid sample)
- ``models``   Flax modules: cascaded UNet generator, PatchGAN discriminator
- ``train``    jit-compiled adversarial train step, optax, Orbax checkpoints
- ``data``     host-side video decode, DeepStab pairing, temporal stacking
- ``parallel`` device mesh / sharding helpers (data-parallel + clip-sharded)
- ``interop``  PyTorch checkpoint -> Flax parameter import
- ``eval``     stabilization quality metrics (cropping/distortion/stability)
- ``pipeline`` public inference API: clip in -> stabilized clip + warp fields
"""

__version__ = "0.1.0"

from pwstablenet_tpu.config import (  # noqa: F401
    DataConfig,
    MeshConfig,
    ModelConfig,
    PipelineConfig,
    TrainConfig,
)
