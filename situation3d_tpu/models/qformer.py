"""Q-Former (flax.linen) — the BLIP-2 querying transformer.

Re-implementation of the reference's modified HF BERT
(``3DLLM_BLIP2-base/lavis/models/blip2_models/Qformer.py``) in the exact
configuration the 3D path uses (``blip2_t5.py:62-69``): learned query tokens
only (word/position embeddings deleted), cross-attention into the 1408-d
scene-feature width every ``cross_attention_freq=2`` layers
(``blip2.py:110-125``), and the standard text FFN deleted — only the
query FFN (``intermediate_query``/``output_query``) remains
(``blip2_t5.py:66-68``: ``layer.output = None; layer.intermediate = None``).

The 32x5120 cross-attention over scene tokens is the hot op; it runs as
plain XLA batched matmuls here (32 queries x 5120 keys x 12 heads fits VMEM
comfortably after fusion) — a Pallas fused kernel is only warranted for much
longer scene-token axes.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from situation3d_tpu.config import QFormerConfig

NEG_INF = -1e9


class BertSelfAttentionOut(nn.Module):
    """Attention -> output dense -> residual LayerNorm (post-LN BERT)."""
    cfg: QFormerConfig
    kv_width: Optional[int] = None  # set => cross-attention from this width
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden, kv=None, kv_mask=None, deterministic=True,
                 attn_bias=None):
        """``kv_mask`` [B, K] masks keys; ``attn_bias`` [B, 1|h, L, K] is an
        additive mask for structured patterns (causal LM, multimodal ITM —
        Qformer.py get_extended_attention_mask semantics)."""
        cfg = self.cfg
        B, L, _ = hidden.shape
        h, d = cfg.num_heads, cfg.hidden_size // cfg.num_heads
        kv_src = hidden if kv is None else kv

        def proj(x, name):
            return nn.Dense(cfg.hidden_size, dtype=self.dtype, name=name)(x) \
                .reshape(B, -1, h, d).transpose(0, 2, 1, 3)

        q = proj(hidden, "query")
        k = proj(kv_src, "key")
        v = proj(kv_src, "value")
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(
            jnp.asarray(d, q.dtype))
        if kv_mask is not None:
            scores = jnp.where(kv_mask[:, None, None, :].astype(bool), scores,
                               NEG_INF)
        if attn_bias is not None:
            scores = scores + attn_bias.astype(scores.dtype)
        att = nn.softmax(scores.astype(jnp.float32), axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", att, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, L, cfg.hidden_size)
        out = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="out_dense")(out)
        return nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                            name="out_norm")(hidden + out)


class QFormerLayer(nn.Module):
    cfg: QFormerConfig
    has_cross_attention: bool
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden, enc_states, enc_mask, deterministic=True):
        cfg = self.cfg
        hidden = BertSelfAttentionOut(cfg, dtype=self.dtype, name="attention")(
            hidden, deterministic=deterministic)
        if self.has_cross_attention:
            hidden = BertSelfAttentionOut(
                cfg, kv_width=cfg.encoder_width, dtype=self.dtype,
                name="crossattention")(hidden, kv=enc_states, kv_mask=enc_mask,
                                       deterministic=deterministic)
        # query FFN (the only FFN kept in the 3D configuration)
        inter = nn.Dense(cfg.intermediate_size, dtype=self.dtype,
                         name="intermediate_query")(hidden)
        inter = nn.gelu(inter, approximate=False)
        out = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="output_query")(inter)
        return nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                            name="output_query_norm")(hidden + out)


class QFormer(nn.Module):
    """Query tokens -> BERT layers with periodic cross-attention."""
    cfg: QFormerConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, enc_states, enc_mask, deterministic=True):
        cfg = self.cfg
        B = enc_states.shape[0]
        query = self.param(
            "query_tokens",
            nn.initializers.normal(0.02),
            (1, cfg.num_query_tokens, cfg.hidden_size), jnp.float32)
        hidden = jnp.broadcast_to(
            query, (B, cfg.num_query_tokens, cfg.hidden_size)).astype(self.dtype)
        hidden = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                              name="emb_norm")(hidden)
        for i in range(cfg.num_layers):
            hidden = QFormerLayer(
                cfg, has_cross_attention=(i % cfg.cross_attention_freq == 0),
                dtype=self.dtype, name=f"layer{i}")(
                    hidden, enc_states, enc_mask, deterministic)
        return hidden
