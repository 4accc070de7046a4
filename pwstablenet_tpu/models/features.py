"""Feature extractor for the perceptual loss (SURVEY.md C12 / N-3).

The reference uses a pretrained (torchvision VGG-style) network frozen
as a deep-feature distance.  This environment has no network access to
fetch VGG weights (SURVEY.md section 0), so the extractor is a small
VGG-style conv pyramid that can run in two modes:

- randomly initialized and FROZEN (a documented deviation: random conv
  features are a known-serviceable perceptual metric — distances in a
  random deep feature space still correlate with structural similarity);
- loaded from converted weights via ``interop.feat_state_dict_to_flax``
  (a ``TorchFeatureExtractor`` state_dict) or
  ``interop.torchvision_vgg_to_flax`` (the leading conv blocks of a real
  torchvision VGG ``features`` checkpoint, with VGG block widths
  ``feat_channels=(64, 128)``) whenever one is available, restoring
  exact reference parity.  Both mappings are locked by
  ``tests/test_torch_parity.py``.

Feature maps from each scale are returned so the loss can weight them.
"""

from __future__ import annotations

from typing import List

import jax.numpy as jnp
from flax import linen as nn

from pwstablenet_tpu.config import ModelConfig


class FeatureExtractor(nn.Module):
    cfg: ModelConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        dtype = jnp.dtype(self.cfg.compute_dtype)
        x = x.astype(dtype)
        outs: List[jnp.ndarray] = []
        for i, f in enumerate(self.cfg.feat_channels):
            x = nn.Conv(
                f, kernel_size=(3, 3), padding="SAME", dtype=dtype,
                name=f"conv{i}a",
            )(x)
            x = nn.relu(x)
            x = nn.Conv(
                f, kernel_size=(3, 3), padding="SAME", dtype=dtype,
                name=f"conv{i}b",
            )(x)
            x = nn.relu(x)
            outs.append(x.astype(jnp.float32))
            x = nn.avg_pool(x, window_shape=(2, 2), strides=(2, 2))
        return outs
