"""MCAN-style attention fusion modules (flax.linen).

Re-implementation of the reference's vendored MCAN blocks
(``situation3d/models/mcan_sqa_module.py:18-286``: FC/MLP/LayerNorm/AttFlat/
MHAtt/FFN/SA/SGA/MCAN_ED) with the same masking convention: pad masks are
``True`` where a position is padding, and masked logits get ``-1e9`` before
softmax (``mcan_sqa_module.py:95-99, 174-175``).

TPU notes: attention runs as plain batched matmuls (XLA fuses QK^T/softmax/AV
fine at these lengths — 100 text + 256 scene tokens); dims stay multiples of
128 so heads tile onto the MXU.
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

NEG_INF = -1e9


class MCANLayerNorm(nn.Module):
    """The reference's custom LayerNorm (mcan_sqa_module.py:57-69):
    ``a * (x - mean) / (std + eps) + b`` with torch's default UNBIASED std
    (n-1 denominator) and eps added OUTSIDE the sqrt. This differs from
    standard LN by a ~sqrt(H/(H-1)) factor (0.4% at H=128) — kept exactly
    so reference-trained checkpoints port bit-for-bit."""
    epsilon: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        H = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (H,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (H,), jnp.float32)
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.sum(jnp.square(xf - mean), axis=-1, keepdims=True) / (H - 1)
        out = scale * (xf - mean) / (jnp.sqrt(var) + self.epsilon) + bias
        return out.astype(self.dtype)


class MLP(nn.Module):
    """FC(+GELU+dropout) -> Linear (mcan_sqa_module.py:46-54)."""
    mid_size: int
    out_size: int
    pdrop: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = nn.Dense(self.mid_size, dtype=self.dtype, name="fc")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(self.pdrop)(x, deterministic=deterministic)
        return nn.Dense(self.out_size, dtype=self.dtype, name="linear")(x)


class AttFlat(nn.Module):
    """Attention-weighted flatten of a sequence (mcan_sqa_module.py:74-107)."""
    flat_mlp_size: int = 256
    flat_glimpses: int = 1
    flat_out_size: int = 512
    pdrop: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, pad_mask: Optional[jnp.ndarray], deterministic=True
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        # att: [B, L, glimpses]
        att = MLP(self.flat_mlp_size, self.flat_glimpses, self.pdrop,
                  self.dtype, name="mlp")(x, deterministic)
        if pad_mask is not None:
            att = jnp.where(pad_mask[..., None], NEG_INF, att)
        att = nn.softmax(att, axis=1)
        flat = jnp.einsum("blg,blh->bgh", att, x).reshape(x.shape[0], -1)
        out = nn.Dense(self.flat_out_size, dtype=self.dtype, name="linear_merge")(flat)
        return out, att


class MHAtt(nn.Module):
    """Multi-head attention (mcan_sqa_module.py:112-181)."""
    hidden_size: int
    num_heads: int = 8
    pdrop: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, v, k, q, pad_mask: Optional[jnp.ndarray], deterministic=True):
        B = q.shape[0]
        h, d = self.num_heads, self.hidden_size // self.num_heads

        def proj(x, name):
            return nn.Dense(self.hidden_size, dtype=self.dtype, name=name)(x) \
                .reshape(B, -1, h, d).transpose(0, 2, 1, 3)

        vh, kh, qh = proj(v, "linear_v"), proj(k, "linear_k"), proj(q, "linear_q")
        scores = jnp.einsum("bhqd,bhkd->bhqk", qh, kh) / jnp.sqrt(
            jnp.asarray(d, qh.dtype))
        if pad_mask is not None:
            # [B, Lk] pad mask broadcast over heads and query positions
            scores = jnp.where(pad_mask[:, None, None, :], NEG_INF, scores)
        att = nn.softmax(scores.astype(jnp.float32), axis=-1).astype(self.dtype)
        att = nn.Dropout(self.pdrop)(att, deterministic=deterministic)
        out = jnp.einsum("bhqk,bhkd->bhqd", att, vh)
        out = out.transpose(0, 2, 1, 3).reshape(B, -1, self.hidden_size)
        return nn.Dense(self.hidden_size, dtype=self.dtype, name="linear_merge")(out)


class FFN(nn.Module):
    """4x-expansion feed-forward (mcan_sqa_module.py:186-201)."""
    hidden_size: int
    pdrop: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True):
        return MLP(self.hidden_size * 4, self.hidden_size, self.pdrop,
                   self.dtype, name="mlp")(x, deterministic)


class SA(nn.Module):
    """Self-attention block (mcan_sqa_module.py:207-228)."""
    hidden_size: int
    num_heads: int = 8
    pdrop: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, pad_mask, deterministic=True):
        a = MHAtt(self.hidden_size, self.num_heads, self.pdrop, self.dtype,
                  name="mhatt")(x, x, x, pad_mask, deterministic)
        a = nn.Dropout(self.pdrop)(a, deterministic=deterministic)
        x = MCANLayerNorm(dtype=self.dtype, name="norm1")(x + a)
        f = FFN(self.hidden_size, self.pdrop, self.dtype, name="ffn")(x, deterministic)
        f = nn.Dropout(self.pdrop)(f, deterministic=deterministic)
        return MCANLayerNorm(dtype=self.dtype, name="norm2")(x + f)


class SGA(nn.Module):
    """Self- then guided cross-attention block (mcan_sqa_module.py:234-263).

    ``x`` attends to itself, then to ``y`` (keys/values from ``y``).
    """
    hidden_size: int
    num_heads: int = 8
    pdrop: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, y, x_pad_mask, y_pad_mask, deterministic=True):
        a = MHAtt(self.hidden_size, self.num_heads, self.pdrop, self.dtype,
                  name="mhatt1")(x, x, x, x_pad_mask, deterministic)
        a = nn.Dropout(self.pdrop)(a, deterministic=deterministic)
        x = MCANLayerNorm(dtype=self.dtype, name="norm1")(x + a)
        c = MHAtt(self.hidden_size, self.num_heads, self.pdrop, self.dtype,
                  name="mhatt2")(y, y, x, y_pad_mask, deterministic)
        c = nn.Dropout(self.pdrop)(c, deterministic=deterministic)
        x = MCANLayerNorm(dtype=self.dtype, name="norm2")(x + c)
        f = FFN(self.hidden_size, self.pdrop, self.dtype, name="ffn")(x, deterministic)
        f = nn.Dropout(self.pdrop)(f, deterministic=deterministic)
        return MCANLayerNorm(dtype=self.dtype, name="norm3")(x + f)


class MCAN_ED(nn.Module):
    """Cascaded encoder-decoder (mcan_sqa_module.py:269-286)."""
    hidden_size: int
    num_heads: int = 8
    num_layers: int = 6
    pdrop: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, y, x_pad_mask, y_pad_mask, deterministic=True):
        for i in range(self.num_layers):
            x = SA(self.hidden_size, self.num_heads, self.pdrop, self.dtype,
                   name=f"enc{i}")(x, x_pad_mask, deterministic)
        for i in range(self.num_layers):
            y = SGA(self.hidden_size, self.num_heads, self.pdrop, self.dtype,
                    name=f"dec{i}")(y, x, y_pad_mask, x_pad_mask, deterministic)
        return x, y
