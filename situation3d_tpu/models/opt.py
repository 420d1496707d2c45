"""OPT causal language model (flax.linen).

TPU-native re-implementation of the vendored HF OPT
(``3DLLM_BLIP2-base/lavis/models/blip2_models/modeling_opt.py``, used by
``blip2_opt.py:73`` as the frozen language model of the OPT-flavoured
BLIP-2): decoder-only transformer with learned positional embeddings at
offset 2 driven by the attention-mask cumsum, pre-LN blocks
(do_layer_norm_before), ReLU MLPs, a final layer norm, and an LM head tied
to the token embeddings.

Supports prefix ``inputs_embeds`` (the BLIP-2 query tokens) ahead of token
ids, causal-LM loss with -100 ignore targets, and cached greedy decoding
(mutable "cache" collection, same pattern as models/t5.py).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

NEG_INF = -1e9


@dataclasses.dataclass(frozen=True)
class OPTConfig:
    vocab_size: int = 50272
    hidden_size: int = 2560            # opt-2.7b
    num_layers: int = 32
    num_heads: int = 32
    ffn_dim: int = 10240
    max_position: int = 2048
    layer_norm_eps: float = 1e-5
    pad_token_id: int = 1
    bos_token_id: int = 2
    eos_token_id: int = 2
    pos_offset: int = 2                # OPTLearnedPositionalEmbedding quirk

    @staticmethod
    def tiny(**kw) -> "OPTConfig":
        base = dict(vocab_size=128, hidden_size=32, num_layers=2,
                    num_heads=4, ffn_dim=64, max_position=64)
        base.update(kw)
        return OPTConfig(**base)


class OPTAttention(nn.Module):
    """Standard biased MHA with causal masking and an optional decode
    cache (modeling_opt.py OPTAttention)."""
    cfg: OPTConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden, attn_bias=None, decode: bool = False,
                 step_mask=None):
        cfg = self.cfg
        B, L, C = hidden.shape
        h, d = cfg.num_heads, cfg.hidden_size // cfg.num_heads

        def proj(x, name):
            return nn.Dense(cfg.hidden_size, dtype=self.dtype, name=name)(x) \
                .reshape(B, -1, h, d).transpose(0, 2, 1, 3)

        q = proj(hidden, "q_proj") * (d ** -0.5)
        k = proj(hidden, "k_proj")
        v = proj(hidden, "v_proj")

        if decode:
            ck = self.variable("cache", "k", jnp.zeros,
                               (B, h, cfg.max_position, d), self.dtype)
            cv = self.variable("cache", "v", jnp.zeros,
                               (B, h, cfg.max_position, d), self.dtype)
            ci = self.variable("cache", "idx", lambda: jnp.zeros((), jnp.int32))
            # per-slot key validity: left-padded prompt slots are recorded
            # invalid and never attended (reference key padding mask,
            # modeling_opt.py:530-538)
            cval = self.variable(
                "cache", "valid",
                lambda: jnp.zeros((B, cfg.max_position), bool))
            i = ci.value
            ck.value = jax.lax.dynamic_update_slice(ck.value, k, (0, 0, i, 0))
            cv.value = jax.lax.dynamic_update_slice(cv.value, v, (0, 0, i, 0))
            sm = (jnp.ones((B, L), bool) if step_mask is None
                  else step_mask.astype(bool))
            cval.value = jax.lax.dynamic_update_slice(cval.value, sm, (0, i))
            ci.value = i + L
            k, v = ck.value, cv.value
            kpos = jnp.arange(cfg.max_position)
            causal = kpos[None, :] <= (i + jnp.arange(L)[:, None])   # [L, K]
            ok = causal[None] & cval.value[:, None, :]               # [B, L, K]
            attn_bias = jnp.where(ok, 0.0, NEG_INF)[:, None]         # [B,1,L,K]

        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k)
        if attn_bias is not None:
            scores = scores + attn_bias.astype(scores.dtype)
        att = nn.softmax(scores.astype(jnp.float32), axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", att, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, L, C)
        return nn.Dense(cfg.hidden_size, dtype=self.dtype, name="out_proj")(out)


class OPTDecoderLayer(nn.Module):
    """Pre-LN decoder block (do_layer_norm_before=True, ReLU MLP)."""
    cfg: OPTConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, attn_bias=None, decode: bool = False,
                 step_mask=None):
        cfg = self.cfg
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="self_attn_layer_norm")(x)
        x = x + OPTAttention(cfg, self.dtype, name="self_attn")(
            h, attn_bias, decode, step_mask)
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="final_layer_norm")(x)
        h = nn.Dense(cfg.ffn_dim, dtype=self.dtype, name="fc1")(h)
        h = nn.relu(h)
        h = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="fc2")(h)
        return x + h


class OPTForCausalLM(nn.Module):
    """OPT decoder + tied LM head. ``__call__`` takes token ids with an
    optional embedding prefix (BLIP-2 query tokens); ``decode_step``
    consumes one token at a time against the cache."""
    cfg: OPTConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.cfg
        self.embed_tokens = nn.Embed(cfg.vocab_size, cfg.hidden_size,
                                     dtype=self.dtype, name="embed_tokens")
        self.embed_positions = nn.Embed(
            cfg.max_position + cfg.pos_offset, cfg.hidden_size,
            dtype=self.dtype, name="embed_positions")
        self.layers = [OPTDecoderLayer(cfg, self.dtype, name=f"layer{i}")
                       for i in range(cfg.num_layers)]
        self.final_norm = nn.LayerNorm(epsilon=cfg.layer_norm_eps,
                                       dtype=self.dtype, name="final_norm")

    def _positions(self, attention_mask):
        """OPTLearnedPositionalEmbedding: cumsum(mask)*mask - 1 + offset."""
        m = attention_mask.astype(jnp.int32)
        pos = jnp.cumsum(m, axis=1) * m - 1
        return self.embed_positions(jnp.maximum(pos, 0) + self.cfg.pos_offset)

    def __call__(self, input_ids, attention_mask,
                 prefix_embeds: Optional[jnp.ndarray] = None,
                 prefix_mask: Optional[jnp.ndarray] = None):
        """-> logits [B, P + L, V]. The prefix (if any) occupies the first
        positions, exactly like the reference's
        ``cat([inputs_opt, inputs_embeds], 1)`` (blip2_opt.py:152-154)."""
        x = self.embed_tokens(input_ids)
        mask = attention_mask
        if prefix_embeds is not None:
            x = jnp.concatenate([prefix_embeds.astype(self.dtype), x], axis=1)
            pm = (jnp.ones(prefix_embeds.shape[:2], attention_mask.dtype)
                  if prefix_mask is None else prefix_mask)
            mask = jnp.concatenate([pm, attention_mask], axis=1)
        x = x + self._positions(mask)
        L = x.shape[1]
        qpos = jnp.arange(L)[:, None]
        kpos = jnp.arange(L)[None, :]
        causal = kpos <= qpos
        key_ok = mask.astype(bool)[:, None, None, :]
        bias = jnp.where(causal[None, None] & key_ok, 0.0, NEG_INF)
        for layer in self.layers:
            x = layer(x, bias)
        x = self.final_norm(x)
        return self.embed_tokens.attend(x)

    def decode_prefix(self, prefix_embeds):
        """Prime the cache with the query-token prefix; returns last logits."""
        x = prefix_embeds.astype(self.dtype)
        P = x.shape[1]
        pos = jnp.arange(P)[None]
        x = x + self.embed_positions(pos + self.cfg.pos_offset)
        for layer in self.layers:
            x = layer(x, None, decode=True)
        x = self.final_norm(x)
        return self.embed_tokens.attend(x)

    def decode_step(self, token_ids, positions, step_mask=None):
        """Cached step(s); ``positions`` [B, L] position-embedding indices
        matching ``token_ids``; ``step_mask`` [B, L] marks valid (non-pad)
        tokens — pad slots are excluded from all future attention."""
        x = self.embed_tokens(token_ids)
        x = x + self.embed_positions(positions + self.cfg.pos_offset)
        for layer in self.layers:
            x = layer(x, None, decode=True, step_mask=step_mask)
        x = self.final_norm(x)
        return self.embed_tokens.attend(x)


def opt_causal_lm_loss(logits, targets) -> jnp.ndarray:
    """HF causal-LM loss: shift logits/targets, mean CE over targets != -100
    (prefix positions carry -100, blip2_opt.py:149-151)."""
    import optax
    lg = logits[:, :-1].astype(jnp.float32)
    tg = targets[:, 1:]
    keep = (tg != -100).astype(jnp.float32)
    safe = jnp.where(tg < 0, 0, tg)
    per = optax.softmax_cross_entropy_with_integer_labels(lg, safe)
    return jnp.sum(per * keep) / jnp.maximum(jnp.sum(keep), 1.0)


def opt_greedy_decode(model: OPTForCausalLM, variables, prefix_embeds,
                      first_ids, max_len: int, eos_id: int, pad_id: int,
                      first_mask=None):
    """Greedy generation after a [prefix ; first tokens] prompt: prime the
    cache, then argmax one token at a time (blip2_opt.py generate with
    num_beams=1). ``first_ids`` [B, Lp] left-padded prompt token ids with
    ``first_mask`` [B, Lp] marking real tokens (None = no padding): pad
    slots consume no position ids (reference mask-cumsum positions,
    modeling_opt.py:117) and are excluded from attention as keys
    (modeling_opt.py:530-538). Returns int32 [B, max_len]."""
    B, P = prefix_embeds.shape[:2]
    Lp = first_ids.shape[1]
    m = (jnp.ones((B, Lp), jnp.int32) if first_mask is None
         else first_mask.astype(jnp.int32))
    # prime cache with prefix + prompt in one pass
    _, cache_vars = model.apply(
        variables, prefix_embeds,
        method=OPTForCausalLM.decode_prefix, mutable=["cache"])
    cache = cache_vars["cache"]
    # positions: P prefix tokens, then cumsum over the prompt mask — a
    # left-padded prompt's first real token sits at position P, and pad
    # slots (clamped to P-1) are masked out of attention entirely
    prompt_pos = jnp.maximum(P + jnp.cumsum(m, axis=1) * m - 1, 0)
    logits, cache_vars = model.apply(
        {**variables, "cache": cache}, first_ids, prompt_pos,
        method=OPTForCausalLM.decode_step, mutable=["cache"],
        step_mask=m)
    cache = cache_vars["cache"]
    first_tok = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
    n_valid = jnp.sum(m, axis=1)                              # [B]

    def body(state):
        i, tok, cache, done, out = state
        nxt = jnp.where(done, pad_id, tok)
        out = out.at[:, i].set(nxt)
        done = done | (tok == eos_id)
        logits, new_vars = model.apply(
            {**variables, "cache": cache}, nxt[:, None],
            (P + n_valid)[:, None] + i,
            method=OPTForCausalLM.decode_step, mutable=["cache"])
        tok = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
        return i + 1, tok, new_vars["cache"], done, out

    def cond(state):
        i, _, _, done, _ = state
        return (i < max_len) & ~jnp.all(done)

    out = jnp.full((B, max_len), pad_id, jnp.int32)
    state = (jnp.zeros((), jnp.int32), first_tok, cache,
             jnp.zeros((B,), bool), out)
    _, _, _, _, out = jax.lax.while_loop(cond, body, state)
    return out
