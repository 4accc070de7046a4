"""PyTorch checkpoint -> Flax parameter import (SURVEY.md C18 /
section 5.4; BASELINE.json config 1 "pretrained checkpoint parity").

Converts a ``state_dict`` of ``interop.torch_ref.TorchCascadedGenerator``
(the documented torch expression of this architecture — and the shape a
migrated reference checkpoint is brought into) to the Flax parameter
pytree of ``models.CascadedGenerator``.

Weight-layout rules (locked by ``tests/test_torch_parity.py``):

- ``Conv2d.weight``          (O, I, kh, kw) -> (kh, kw, I, O)
- ``ConvTranspose2d.weight`` (I, O, kh, kw) -> (kh, kw, I, O), with a
  180-degree spatial flip: torch's ConvTranspose2d is the gradient of
  Conv2d while ``flax.linen.ConvTranspose`` is a fractionally-strided
  conv with an unflipped kernel.
- ``InstanceNorm2d.weight/bias`` -> InstanceNorm ``scale``/``bias``.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _conv_w(w) -> np.ndarray:
    return np.asarray(w).transpose(2, 3, 1, 0)


def _deconv_w(w) -> np.ndarray:
    # (I, O, kh, kw) -> flip kh,kw -> (kh, kw, I, O)
    a = np.asarray(w)[:, :, ::-1, ::-1]
    return np.ascontiguousarray(a.transpose(2, 3, 0, 1))


def torch_state_dict_to_flax(state_dict, cfg) -> Dict:
    """Build the Flax params pytree for ``CascadedGenerator``."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    L = cfg.num_levels
    params: Dict = {}

    for s in range(cfg.num_stages):
        stage: Dict = {}
        p = f"stages.{s}."

        for i in range(L):
            stage[f"down{i}"] = {
                "conv": {
                    "kernel": _conv_w(sd[p + f"downs.{i}.weight"]),
                    "bias": sd[p + f"downs.{i}.bias"],
                }
            }
            if 0 < i < L - 1 and cfg.norm == "instance":
                stage[f"down{i}"]["norm"] = {
                    "scale": sd[p + f"dnorms.{i}.weight"],
                    "bias": sd[p + f"dnorms.{i}.bias"],
                }

        for level in range(L - 1):
            stage[f"up{level}"] = {
                "deconv": {
                    "kernel": _deconv_w(sd[p + f"ups.{level}.weight"]),
                    "bias": sd[p + f"ups.{level}.bias"],
                }
            }
            if cfg.norm == "instance":
                stage[f"up{level}"]["norm"] = {
                    "scale": sd[p + f"unorms.{level}.weight"],
                    "bias": sd[p + f"unorms.{level}.bias"],
                }

        stage["head_up"] = {
            "kernel": _deconv_w(sd[p + "head_up.weight"]),
            "bias": sd[p + "head_up.bias"],
        }
        stage["head"] = {
            "kernel": _conv_w(sd[p + "head.weight"]),
            "bias": sd[p + "head.bias"],
        }
        params[f"stage{s}"] = stage

    return {"params": params}


def load_torch_checkpoint(path: str, cfg):
    """Load a ``.pth``/``.pt`` file (a state_dict or a dict containing
    one) and convert."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    for key in ("state_dict", "generator", "G", "model"):
        if isinstance(obj, dict) and key in obj and isinstance(obj[key], dict):
            obj = obj[key]
            break
    return torch_state_dict_to_flax(obj, cfg)
