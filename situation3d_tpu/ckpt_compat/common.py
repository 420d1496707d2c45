"""Torch-checkpoint -> JAX-pytree conversion helpers.

The north-star requires loading the reference's PyTorch checkpoints
(OpenScene ``scannet_openseg.pth.tar`` via ``train.py:276-279``, BLIP-2
``pretrain_blip2_sam_flant5xl_v2.pth`` via ``finetune_sqa.yaml``, HF MPNet
and FlanT5-XL) into the flax models. Conventions:

- torch ``Linear.weight`` is ``[out, in]`` -> flax ``Dense.kernel`` ``[in, out]``;
- torch ``LayerNorm.weight`` -> flax ``LayerNorm.scale``;
- embeddings keep their layout.
"""
from __future__ import annotations

from typing import Any, Dict

import numpy as np


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a torch checkpoint into a flat {name: np.ndarray} dict."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    for key in ("state_dict", "model", "model_state_dict"):
        if isinstance(obj, dict) and key in obj:
            obj = obj[key]
            break
    return {k: np.asarray(v.detach().cpu().numpy()) if hasattr(v, "detach")
            else np.asarray(v) for k, v in obj.items()}


def linear_kernel(sd: Dict[str, np.ndarray], name: str) -> np.ndarray:
    return np.ascontiguousarray(sd[f"{name}.weight"].T)


def dense(sd: Dict[str, np.ndarray], name: str, bias: bool = True) -> Dict[str, Any]:
    out = {"kernel": linear_kernel(sd, name)}
    if bias and f"{name}.bias" in sd:
        out["bias"] = sd[f"{name}.bias"]
    return out


def layernorm(sd: Dict[str, np.ndarray], name: str) -> Dict[str, Any]:
    return {"scale": sd[f"{name}.weight"], "bias": sd[f"{name}.bias"]}


def strip_prefix(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    plen = len(prefix)
    return {k[plen:]: v for k, v in sd.items() if k.startswith(prefix)}
