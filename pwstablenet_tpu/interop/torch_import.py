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
- norm ``weight``/``bias`` -> ``scale``/``bias`` — uniformly for
  instance (InstanceNorm2d), batch (stats-free BatchNorm2d) and group
  (GroupNorm) kinds; ``norm="none"`` has no norm params.
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
            if 0 < i < L - 1 and cfg.norm != "none":
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
            if cfg.norm != "none":
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


def feat_state_dict_to_flax(state_dict, cfg) -> Dict:
    """Convert a ``TorchFeatureExtractor`` state_dict (SURVEY.md C12/N-3)
    to the Flax parameter pytree of ``models.FeatureExtractor``."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    params: Dict = {}
    for i in range(len(cfg.feat_channels)):
        params[f"conv{i}a"] = {
            "kernel": _conv_w(sd[f"convs.{2 * i}.weight"]),
            "bias": sd[f"convs.{2 * i}.bias"],
        }
        params[f"conv{i}b"] = {
            "kernel": _conv_w(sd[f"convs.{2 * i + 1}.weight"]),
            "bias": sd[f"convs.{2 * i + 1}.bias"],
        }
    return {"params": params}


def torchvision_vgg_to_flax(vgg_state_dict, cfg) -> Dict:
    """Convert the leading conv blocks of a torchvision VGG ``features``
    state_dict (keys ``features.N.weight/bias``) to the Flax
    ``FeatureExtractor`` pytree (SURVEY.md N-3 pretrained-import path).

    The extractor has exactly two 3x3 convs per scale, matching VGG's
    first two blocks; with ``feat_channels=(64, 128)`` (VGG block
    widths) a real torchvision VGG16/19 checkpoint imports losslessly.
    Conv layers are consumed in ``features.N`` order, two per scale;
    a shape mismatch (e.g. asking for more scales than two-conv blocks)
    raises rather than silently mis-mapping.
    """
    convs = sorted(
        (
            int(k.split(".")[1])
            for k in vgg_state_dict
            if k.startswith("features.") and k.endswith(".weight")
        )
    )
    params: Dict = {}
    ch = cfg.in_channels
    for i, f in enumerate(cfg.feat_channels):
        for tag, idx in (("a", convs[2 * i]), ("b", convs[2 * i + 1])):
            w = np.asarray(vgg_state_dict[f"features.{idx}.weight"])
            expect_in = ch if tag == "a" else f
            if w.shape != (f, expect_in, 3, 3):
                raise ValueError(
                    f"VGG conv features.{idx} has shape {w.shape}; "
                    f"feat_channels={cfg.feat_channels} expects "
                    f"({f}, {expect_in}, 3, 3) at scale {i}{tag} — use "
                    "VGG block widths, e.g. feat_channels=(64, 128)"
                )
            params[f"conv{i}{tag}"] = {
                "kernel": _conv_w(w),
                "bias": np.asarray(vgg_state_dict[f"features.{idx}.bias"]),
            }
        ch = f
    return {"params": params}


def flax_to_torch_state_dict(params, cfg) -> Dict:
    """Inverse of ``torch_state_dict_to_flax``: export a trained Flax
    ``CascadedGenerator`` parameter pytree as a torch state_dict (numpy
    values; pass through ``torch.as_tensor`` on load).  Lets users take
    checkpoints trained here back to a torch environment, and gives the
    converter a round-trip test."""
    p = params.get("params", params)
    sd: Dict = {}

    def conv_w(k):  # (kh, kw, I, O) -> (O, I, kh, kw)
        return np.asarray(k).transpose(3, 2, 0, 1)

    def deconv_w(k):  # inverse of _deconv_w: flip back, (I, O, kh, kw)
        a = np.asarray(k).transpose(2, 3, 0, 1)  # (I, O, kh, kw)
        return np.ascontiguousarray(a[:, :, ::-1, ::-1])

    for s in range(cfg.num_stages):
        stage = p[f"stage{s}"]
        pre = f"stages.{s}."
        for i in range(cfg.num_levels):
            sd[pre + f"downs.{i}.weight"] = conv_w(
                stage[f"down{i}"]["conv"]["kernel"]
            )
            sd[pre + f"downs.{i}.bias"] = np.asarray(
                stage[f"down{i}"]["conv"]["bias"]
            )
            if "norm" in stage[f"down{i}"]:
                sd[pre + f"dnorms.{i}.weight"] = np.asarray(
                    stage[f"down{i}"]["norm"]["scale"]
                )
                sd[pre + f"dnorms.{i}.bias"] = np.asarray(
                    stage[f"down{i}"]["norm"]["bias"]
                )
        for level in range(cfg.num_levels - 1):
            sd[pre + f"ups.{level}.weight"] = deconv_w(
                stage[f"up{level}"]["deconv"]["kernel"]
            )
            sd[pre + f"ups.{level}.bias"] = np.asarray(
                stage[f"up{level}"]["deconv"]["bias"]
            )
            if "norm" in stage[f"up{level}"]:
                sd[pre + f"unorms.{level}.weight"] = np.asarray(
                    stage[f"up{level}"]["norm"]["scale"]
                )
                sd[pre + f"unorms.{level}.bias"] = np.asarray(
                    stage[f"up{level}"]["norm"]["bias"]
                )
        sd[pre + "head_up.weight"] = deconv_w(stage["head_up"]["kernel"])
        sd[pre + "head_up.bias"] = np.asarray(stage["head_up"]["bias"])
        sd[pre + "head.weight"] = conv_w(stage["head"]["kernel"])
        sd[pre + "head.bias"] = np.asarray(stage["head"]["bias"])
    return sd


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
