"""Torch ViT checkpoints -> models/vit.py params.

Converts the two vision-encoder state dicts the reference downloads at
model init (``lavis/models/eva_vit.py:496-501`` ``eva_vit_g.pth``;
``lavis/models/clip_vit.py:273-278`` CLIP-L) into the flax pytrees of
``EvaViT`` / ``ClipViT``, including position-embedding interpolation for
non-default image sizes (eva_vit.py:425-446).

Layout notes:
- torch Conv2d OIHW -> flax HWIO;
- EVA's fused ``attn.qkv.weight`` [3C, C] -> one [C, 3C] kernel with
  separate ``q_bias``/``v_bias`` params (k bias is structurally zero,
  eva_vit.py:133-137);
- CLIP's ``attn.in_proj_weight``/``in_proj_bias`` -> ``in_proj`` Dense;
  ``mlp.c_fc``/``mlp.c_proj`` keep their names.
"""
from __future__ import annotations

from typing import Any, Dict

import numpy as np

from situation3d_tpu.ckpt_compat.common import dense, layernorm


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    """torch OIHW -> flax HWIO."""
    return np.transpose(w, (2, 3, 1, 0))


def convert_eva_vit(sd: Dict[str, np.ndarray], depth: int = 39,
                    num_patches: int | None = None) -> Dict[str, Any]:
    """eva_vit_g.pth state dict -> EvaViT params tree."""
    p: Dict[str, Any] = {
        "patch_embed": {
            "kernel": _conv_kernel(sd["patch_embed.proj.weight"]),
            "bias": sd["patch_embed.proj.bias"],
        },
        "cls_token": sd["cls_token"],
        "pos_embed": _maybe_interp(sd["pos_embed"], num_patches),
    }
    for i in range(depth):
        b = f"blocks.{i}"
        p[f"block{i}"] = {
            "norm1": layernorm(sd, f"{b}.norm1"),
            "norm2": layernorm(sd, f"{b}.norm2"),
            "attn": {
                "qkv_kernel": np.transpose(sd[f"{b}.attn.qkv.weight"]),
                "q_bias": sd[f"{b}.attn.q_bias"],
                "v_bias": sd[f"{b}.attn.v_bias"],
                "proj": dense(sd, f"{b}.attn.proj"),
            },
            "mlp_fc1": dense(sd, f"{b}.mlp.fc1"),
            "mlp_fc2": dense(sd, f"{b}.mlp.fc2"),
        }
    return p


def convert_timm_vit(sd: Dict[str, np.ndarray], depth: int = 12,
                     num_patches: int | None = None) -> Dict[str, Any]:
    """Plain timm ViT state dict (``lavis/models/vit.py:157-275``
    VisionTransformer / deit checkpoints) -> EvaViT(full_qkv_bias,
    final_norm) params: the fused ``attn.qkv.bias`` [3C] splits into
    q/k/v thirds."""
    p: Dict[str, Any] = {
        "patch_embed": {
            "kernel": _conv_kernel(sd["patch_embed.proj.weight"]),
            "bias": sd["patch_embed.proj.bias"],
        },
        "cls_token": sd["cls_token"],
        "pos_embed": _maybe_interp(sd["pos_embed"], num_patches),
        "norm": layernorm(sd, "norm"),
    }
    for i in range(depth):
        b = f"blocks.{i}"
        qb, kb, vb = np.split(sd[f"{b}.attn.qkv.bias"], 3)
        p[f"block{i}"] = {
            "norm1": layernorm(sd, f"{b}.norm1"),
            "norm2": layernorm(sd, f"{b}.norm2"),
            "attn": {
                "qkv_kernel": np.transpose(sd[f"{b}.attn.qkv.weight"]),
                "q_bias": qb, "k_bias": kb, "v_bias": vb,
                "proj": dense(sd, f"{b}.attn.proj"),
            },
            "mlp_fc1": dense(sd, f"{b}.mlp.fc1"),
            "mlp_fc2": dense(sd, f"{b}.mlp.fc2"),
        }
    return p


def convert_clip_vit(sd: Dict[str, np.ndarray], depth: int = 21,
                     num_patches: int | None = None) -> Dict[str, Any]:
    """OpenAI CLIP visual state dict (``visual.`` prefix stripped or bare,
    clip_vit.py:228-257) -> ClipViT params tree."""
    if any(k.startswith("visual.") for k in sd):
        sd = {k[len("visual."):]: v for k, v in sd.items()
              if k.startswith("visual.")}
    p: Dict[str, Any] = {
        "conv1": {"kernel": _conv_kernel(sd["conv1.weight"])},
        "class_embedding": sd["class_embedding"],
        "positional_embedding": _maybe_interp(
            sd["positional_embedding"][None], num_patches)[0],
        "ln_pre": layernorm(sd, "ln_pre"),
    }
    for i in range(depth):
        b = f"transformer.resblocks.{i}"
        p[f"block{i}"] = {
            "ln_1": layernorm(sd, f"{b}.ln_1"),
            "ln_2": layernorm(sd, f"{b}.ln_2"),
            "in_proj": {
                "kernel": np.transpose(sd[f"{b}.attn.in_proj_weight"]),
                "bias": sd[f"{b}.attn.in_proj_bias"],
            },
            "out_proj": dense(sd, f"{b}.attn.out_proj"),
            "c_fc": dense(sd, f"{b}.mlp.c_fc"),
            "c_proj": dense(sd, f"{b}.mlp.c_proj"),
        }
    return p


def _maybe_interp(pos: np.ndarray, num_patches: int | None) -> np.ndarray:
    if num_patches is None or pos.shape[1] == num_patches + 1:
        return np.asarray(pos)
    from situation3d_tpu.models.vit import interpolate_pos_embed
    return np.asarray(interpolate_pos_embed(pos, num_patches))
