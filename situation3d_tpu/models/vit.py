"""Vision transformers for BLIP-2: EVA-CLIP-g and CLIP ViT-L (flax.linen).

TPU-native re-implementation of the reference's two image encoders exposed
through ``Blip2Base.init_vision_encoder``
(``3DLLM_BLIP2-base/lavis/models/blip2_models/blip2.py:63-73``):

- **eva_clip_g** (``lavis/models/eva_vit.py:482-507``): patch 14, width
  1408 (the origin of the 1408-d scene-feature convention, eva_vit.py:310),
  depth 39, 16 heads of dim 88, mlp ratio 4.3637, pre-LN blocks, fused qkv
  with the EVA bias quirk (learned q/v biases, k bias pinned to zero,
  eva_vit.py:133-140), absolute cls+patch position embeddings, **no final
  norm** — ``forward`` returns all tokens (eva_vit.py:388-419).
- **clip_L** (``lavis/models/clip_vit.py:168-266``): patch 14, width 1024,
  ``layers - 1 = 21`` residual blocks (clip_vit.py:185), QuickGELU MLP,
  ``ln_pre`` after embedding, no ``ln_final``.
- **vit_base** (``lavis/models/vit.py:157-275``, the BLIP-1-era plain timm
  ViT): ``ViTConfig.vit_base()`` — EvaViT with ``full_qkv_bias`` (learned
  k bias) and ``final_norm``; timm checkpoints import via
  ``ckpt_compat.vit.convert_timm_vit``.

Differences by design (TPU-first, not translated):

- torch ``checkpoint_wrapper`` / ``use_grad_checkpoint`` becomes
  ``nn.remat`` on the block (``remat=True``) — XLA rematerialisation.
- DropPath (stochastic depth) is train-only regularisation of a frozen
  encoder in the reference (drop_path_rate=0.4 but the ViT is frozen in
  every BLIP-2 recipe) — implemented, but defaults off at inference.
- Attention runs as plain XLA batched matmuls in bf16 with f32 softmax;
  at 257 tokens a fused kernel doesn't pay (DESIGN.md §4).

Checkpoint import lives in ``ckpt_compat/vit.py`` (torch ``eva_vit_g.pth``
and CLIP state dicts -> these pytrees, incl. position-embedding
interpolation for non-224 image sizes, clip_vit.py:225-257).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    """Shape of one vision transformer (both families)."""
    model_name: str = "eva_clip_g"      # "eva_clip_g" | "clip_L"
    img_size: int = 224
    patch_size: int = 14
    embed_dim: int = 1408
    depth: int = 39
    num_heads: int = 16
    mlp_ratio: float = 4.3637
    qkv_bias: bool = True               # EVA q/v-bias, zero-k quirk
    full_qkv_bias: bool = False         # plain timm ViT: k bias learned too
    final_norm: bool = False            # plain timm ViT: trailing LayerNorm
    drop_path_rate: float = 0.0
    layer_norm_eps: float = 1e-6
    use_shared_rel_pos_bias: bool = False
    remat: bool = False                 # torch use_grad_checkpoint analogue

    @property
    def num_patches(self) -> int:
        return (self.img_size // self.patch_size) ** 2

    @staticmethod
    def eva_clip_g(img_size: int = 224, drop_path_rate: float = 0.0,
                   remat: bool = False) -> "ViTConfig":
        """eva_vit.py:482-495 (num_heads = 1408 // 88 = 16)."""
        return ViTConfig(model_name="eva_clip_g", img_size=img_size,
                         patch_size=14, embed_dim=1408, depth=39,
                         num_heads=16, mlp_ratio=4.3637, qkv_bias=True,
                         drop_path_rate=drop_path_rate, remat=remat)

    @staticmethod
    def vit_base(img_size: int = 224, patch_size: int = 16,
                 remat: bool = False) -> "ViTConfig":
        """Plain timm-style ViT-B (``lavis/models/vit.py:157-275``,
        VisionTransformerEncoder.from_config defaults: vit_base_patch16,
        embed 768, depth 12, heads 12, mlp 4.0, full qkv bias, final
        norm, returns all tokens)."""
        return ViTConfig(model_name="vit_base", img_size=img_size,
                         patch_size=patch_size, embed_dim=768, depth=12,
                         num_heads=12, mlp_ratio=4.0, qkv_bias=True,
                         full_qkv_bias=True, final_norm=True, remat=remat)

    @staticmethod
    def clip_L(img_size: int = 224, remat: bool = False) -> "ViTConfig":
        """clip_vit.py:260-270 (layers=22 -> 21 blocks, clip_vit.py:185)."""
        return ViTConfig(model_name="clip_L", img_size=img_size,
                         patch_size=14, embed_dim=1024, depth=21,
                         num_heads=16, mlp_ratio=4.0, qkv_bias=True,
                         layer_norm_eps=1e-5, remat=remat)


def _drop_path(x, rate: float, deterministic: bool, rng):
    """Stochastic depth on the residual branch (eva_vit.py:35-46)."""
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, (x.shape[0],) + (1,) * (x.ndim - 1))
    return x * mask.astype(x.dtype) / keep


class EvaAttention(nn.Module):
    """EVA fused-qkv attention: learned q/v biases, k bias fixed at zero
    (eva_vit.py:89-93,133-140)."""
    cfg: ViTConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, rel_pos_bias=None):
        cfg = self.cfg
        B, N, C = x.shape
        h = cfg.num_heads
        d = C // h
        qkv_w = self.param("qkv_kernel", nn.initializers.normal(0.02),
                           (C, 3 * C), jnp.float32)
        qkv = jnp.dot(x, qkv_w.astype(self.dtype))
        if cfg.qkv_bias:
            q_bias = self.param("q_bias", nn.initializers.zeros, (C,),
                                jnp.float32)
            v_bias = self.param("v_bias", nn.initializers.zeros, (C,),
                                jnp.float32)
            if cfg.full_qkv_bias:   # plain timm ViT: k bias learned too
                k_bias = self.param("k_bias", nn.initializers.zeros, (C,),
                                    jnp.float32)
            else:                   # EVA quirk: k bias pinned to zero
                k_bias = jnp.zeros_like(q_bias)
            bias = jnp.concatenate([q_bias, k_bias, v_bias])
            qkv = qkv + bias.astype(self.dtype)
        q, k, v = jnp.split(qkv.reshape(B, N, 3, h, d)
                            .transpose(2, 0, 3, 1, 4), 3, axis=0)
        q, k, v = q[0], k[0], v[0]                        # [B, h, N, d]
        scores = jnp.einsum("bhqd,bhkd->bhqk", q * (d ** -0.5), k)
        if rel_pos_bias is not None:
            scores = scores + rel_pos_bias.astype(scores.dtype)
        att = nn.softmax(scores.astype(jnp.float32), axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", att, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, N, C)
        return nn.Dense(C, dtype=self.dtype, name="proj")(out)


class EvaBlock(nn.Module):
    """Pre-LN transformer block (eva_vit.py:165-213, init_values=None)."""
    cfg: ViTConfig
    drop_path: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, rel_pos_bias=None, deterministic: bool = True):
        cfg = self.cfg
        ln = lambda name: nn.LayerNorm(epsilon=cfg.layer_norm_eps,
                                       dtype=self.dtype, name=name)
        rngs = (None, None) if deterministic else tuple(
            jax.random.split(self.make_rng("dropout")))
        a = EvaAttention(cfg, dtype=self.dtype, name="attn")(
            ln("norm1")(x), rel_pos_bias)
        x = x + _drop_path(a, self.drop_path, deterministic, rngs[0])
        hidden = int(cfg.embed_dim * cfg.mlp_ratio)
        m = nn.Dense(hidden, dtype=self.dtype, name="mlp_fc1")(ln("norm2")(x))
        m = nn.gelu(m, approximate=False)
        m = nn.Dense(cfg.embed_dim, dtype=self.dtype, name="mlp_fc2")(m)
        return x + _drop_path(m, self.drop_path, deterministic, rngs[1])


class SharedRelPosBias(nn.Module):
    """Shared relative position bias table over the patch grid + cls
    (eva_vit.py:241-277); unused by eva_clip_g/clip_L but part of the
    VisionTransformer surface (use_shared_rel_pos_bias)."""
    window: tuple
    num_heads: int

    @nn.compact
    def __call__(self):
        wh, ww = self.window
        num_rel = (2 * wh - 1) * (2 * ww - 1) + 3
        table = self.param("table", nn.initializers.zeros,
                           (num_rel, self.num_heads), jnp.float32)
        ch = jnp.arange(wh)
        cw = jnp.arange(ww)
        coords = jnp.stack(jnp.meshgrid(ch, cw, indexing="ij")).reshape(2, -1)
        rel = coords[:, :, None] - coords[:, None, :]          # [2, P, P]
        idx = (rel[0] + wh - 1) * (2 * ww - 1) + (rel[1] + ww - 1)
        P = wh * ww
        full = jnp.zeros((P + 1, P + 1), jnp.int32)
        full = full.at[1:, 1:].set(idx)
        full = full.at[0, :].set(num_rel - 3)
        full = full.at[:, 0].set(num_rel - 2)
        full = full.at[0, 0].set(num_rel - 1)
        return table[full].transpose(2, 0, 1)[None]            # [1,h,N,N]


class EvaViT(nn.Module):
    """EVA VisionTransformer (eva_vit.py:280-419): cls+patch tokens, abs pos
    embed, pre-LN blocks, returns ALL token states (no final norm)."""
    cfg: ViTConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images, deterministic: bool = True):
        """images [B, H, W, 3] (channel-last; NHWC is the TPU-native conv
        layout) -> [B, 1 + num_patches, embed_dim]."""
        cfg = self.cfg
        x = nn.Conv(cfg.embed_dim, (cfg.patch_size, cfg.patch_size),
                    strides=(cfg.patch_size, cfg.patch_size),
                    dtype=self.dtype, name="patch_embed")(
            images.astype(self.dtype))
        B = x.shape[0]
        x = x.reshape(B, -1, cfg.embed_dim)
        cls = self.param("cls_token", nn.initializers.normal(0.02),
                         (1, 1, cfg.embed_dim), jnp.float32)
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(self.dtype),
                              (B, 1, cfg.embed_dim)), x], axis=1)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, cfg.num_patches + 1, cfg.embed_dim), jnp.float32)
        x = x + pos.astype(self.dtype)
        rel = None
        if cfg.use_shared_rel_pos_bias:
            g = cfg.img_size // cfg.patch_size
            rel = SharedRelPosBias((g, g), cfg.num_heads,
                                   name="rel_pos_bias")()
        dpr = [cfg.drop_path_rate * i / max(cfg.depth - 1, 1)
               for i in range(cfg.depth)]
        block_cls = nn.remat(EvaBlock, static_argnums=(3,)) if cfg.remat \
            else EvaBlock
        for i in range(cfg.depth):
            x = block_cls(cfg, drop_path=dpr[i], dtype=self.dtype,
                          name=f"block{i}")(x, rel, deterministic)
        if cfg.final_norm:          # plain timm ViT (lavis vit.py:272-274)
            x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                             name="norm")(x)
        return x


class ClipBlock(nn.Module):
    """CLIP ResidualAttentionBlock (clip_vit.py:121-150): pre-LN, fused
    in-proj attention, QuickGELU MLP."""
    cfg: ViTConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        cfg = self.cfg
        C, h = cfg.embed_dim, cfg.num_heads
        d = C // h
        B, N, _ = x.shape
        ln = lambda name: nn.LayerNorm(epsilon=cfg.layer_norm_eps,
                                       dtype=self.dtype, name=name)
        hn = ln("ln_1")(x)
        qkv = nn.Dense(3 * C, dtype=self.dtype, name="in_proj")(hn)
        q, k, v = [t.reshape(B, N, h, d).transpose(0, 2, 1, 3)
                   for t in jnp.split(qkv, 3, axis=-1)]
        scores = jnp.einsum("bhqd,bhkd->bhqk", q * (d ** -0.5), k)
        att = nn.softmax(scores.astype(jnp.float32), axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", att, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, N, C)
        x = x + nn.Dense(C, dtype=self.dtype, name="out_proj")(out)
        m = nn.Dense(int(C * cfg.mlp_ratio), dtype=self.dtype,
                     name="c_fc")(ln("ln_2")(x))
        m = m * nn.sigmoid(1.702 * m)                          # QuickGELU
        m = nn.Dense(C, dtype=self.dtype, name="c_proj")(m)
        return x + m


class ClipViT(nn.Module):
    """CLIP VisionTransformer (clip_vit.py:168-209): conv1 (no bias), class
    embedding, abs pos embed, ln_pre, blocks; returns all tokens (ln_final
    commented out in the reference)."""
    cfg: ViTConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images, deterministic: bool = True):
        cfg = self.cfg
        x = nn.Conv(cfg.embed_dim, (cfg.patch_size, cfg.patch_size),
                    strides=(cfg.patch_size, cfg.patch_size), use_bias=False,
                    dtype=self.dtype, name="conv1")(images.astype(self.dtype))
        B = x.shape[0]
        x = x.reshape(B, -1, cfg.embed_dim)
        scale = cfg.embed_dim ** -0.5
        cls = self.param("class_embedding",
                         nn.initializers.normal(scale), (cfg.embed_dim,),
                         jnp.float32)
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(self.dtype),
                              (B, 1, cfg.embed_dim)), x], axis=1)
        pos = self.param("positional_embedding",
                         nn.initializers.normal(scale),
                         (cfg.num_patches + 1, cfg.embed_dim), jnp.float32)
        x = x + pos[None].astype(self.dtype)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="ln_pre")(x)
        block_cls = nn.remat(ClipBlock) if cfg.remat else ClipBlock
        for i in range(cfg.depth):
            x = block_cls(cfg, dtype=self.dtype, name=f"block{i}")(
                x, deterministic)
        return x


def init_vision_encoder(model_name: str, img_size: int = 224,
                        drop_path_rate: float = 0.0,
                        use_grad_checkpoint: bool = False,
                        dtype: jnp.dtype = jnp.bfloat16):
    """``Blip2Base.init_vision_encoder`` parity (blip2.py:63-73): returns
    ``(vit_module, ln_vision_module)``. ``precision="fp16"`` of the
    reference maps to bf16 on TPU (no loss scaling needed)."""
    if model_name == "eva_clip_g":
        cfg = ViTConfig.eva_clip_g(img_size, drop_path_rate,
                                   remat=use_grad_checkpoint)
        vit = EvaViT(cfg, dtype=dtype)
    elif model_name == "clip_L":
        cfg = ViTConfig.clip_L(img_size, remat=use_grad_checkpoint)
        vit = ClipViT(cfg, dtype=dtype)
    else:
        raise ValueError(
            f"vit model must be eva_clip_g or clip_L, got {model_name!r}")
    ln_vision = nn.LayerNorm(epsilon=1e-5, dtype=dtype, name="ln_vision")
    return vit, ln_vision


def interpolate_pos_embed(pos_embed, new_num_patches: int,
                          num_extra_tokens: int = 1):
    """Bicubic-style resize of the patch position grid when loading a
    checkpoint trained at a different image size (eva_vit.py:425-446,
    clip_vit.py:225-257). Uses jax.image bilinear (TPU-friendly; the
    difference from bicubic is far below model noise for frozen encoders)."""
    pos_embed = jnp.asarray(pos_embed)
    extra = pos_embed[:, :num_extra_tokens]
    grid = pos_embed[:, num_extra_tokens:]
    old = int(round(grid.shape[1] ** 0.5))
    new = int(round(new_num_patches ** 0.5))
    if old == new:
        return pos_embed
    C = grid.shape[-1]
    grid = grid.reshape(1, old, old, C)
    grid = jax.image.resize(grid, (1, new, new, C), method="bilinear")
    return jnp.concatenate([extra, grid.reshape(1, new * new, C)], axis=1)
