"""Blip2Qformer — stage-1 representation-learning model (flax.linen).

Re-implementation of ``3DLLM_BLIP2-base/lavis/models/blip2_models/
blip2_qformer.py:30-461`` (Blip2Qformer): the full text-capable Q-Former
(word/position embeddings, per-token-type FFNs, cross-attention restricted
to the query positions — ``Qformer.py:339-410``) plus the three stage-1
objectives over (scene features, caption) pairs:

- **ITC** — query features (``vision_proj``) vs text CLS (``text_proj``),
  max-over-queries similarity, learned temperature; cross-device negatives
  ride ``jax.lax.all_gather`` (train/contrastive.itc_loss) instead of
  ``concat_all_gather`` over NCCL;
- **ITM** — multimodal [query ; text] encoding with in-batch **hard
  negative mining** (similarity-weighted categorical sampling,
  ``blip2_qformer.py:230-270``), 2-way head averaged over query outputs;
- **LM** — caption generation with causal text self-attention where text
  attends to the (bidirectional) query prefix — equivalent to the
  reference's past_key_values formulation (``blip2_qformer.py:290-320``)
  but expressed as one masked pass (no KV-cache plumbing inside jit).

The 3D generative path (Blip2T5) keeps its slim query-only QFormer in
models/qformer.py; this module is the pretraining counterpart.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from situation3d_tpu.config import QFormerConfig
from situation3d_tpu.models.qformer import NEG_INF, BertSelfAttentionOut
from situation3d_tpu.train.contrastive import itc_loss, itm_loss, lm_loss
from situation3d_tpu.utils.registry import registry


class QFormerTextLayer(nn.Module):
    """One Q-Former layer over a [query ; text] sequence: joint
    self-attention, cross-attention applied to the query slice only, and
    separate FFNs for query vs text positions (Qformer.py:339-410)."""
    cfg: QFormerConfig
    has_cross_attention: bool
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden, num_query: int, enc_states=None, enc_mask=None,
                 attn_bias=None, deterministic=True):
        cfg = self.cfg
        hidden = BertSelfAttentionOut(cfg, dtype=self.dtype, name="attention")(
            hidden, attn_bias=attn_bias, deterministic=deterministic)
        q_part, t_part = hidden[:, :num_query], hidden[:, num_query:]
        if self.has_cross_attention and num_query > 0 and enc_states is not None:
            q_part = BertSelfAttentionOut(
                cfg, kv_width=cfg.encoder_width, dtype=self.dtype,
                name="crossattention")(q_part, kv=enc_states, kv_mask=enc_mask,
                                       deterministic=deterministic)

        def ffn(x, prefix):
            inter = nn.Dense(cfg.intermediate_size, dtype=self.dtype,
                             name=f"intermediate{prefix}")(x)
            inter = nn.gelu(inter, approximate=False)
            out = nn.Dense(cfg.hidden_size, dtype=self.dtype,
                           name=f"output{prefix}")(inter)
            return nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                                name=f"output{prefix}_norm")(x + out)

        parts = []
        if num_query > 0:
            parts.append(ffn(q_part, "_query"))
        if t_part.shape[1] > 0:
            parts.append(ffn(t_part, ""))
        return jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]


class QFormerTextModel(nn.Module):
    """Text-capable Q-Former encoder with the three attention regimes the
    stage-1 objectives need (query-only / text-only / joint, optionally
    causal on text). ``word_embed`` may be a shared nn.Embed owned by the
    parent (for LM-head weight tying)."""
    cfg: QFormerConfig
    dtype: jnp.dtype = jnp.float32
    word_embed: Optional[nn.Module] = None

    @nn.compact
    def __call__(self, enc_states=None, enc_mask=None, text_ids=None,
                 text_mask=None, use_query: bool = True,
                 causal_text: bool = False, deterministic=True):
        cfg = self.cfg
        parts = []
        nq = 0
        if use_query:
            query = self.param("query_tokens", nn.initializers.normal(0.02),
                               (1, cfg.num_query_tokens, cfg.hidden_size),
                               jnp.float32)
            B = (enc_states if enc_states is not None else text_ids).shape[0]
            parts.append(jnp.broadcast_to(
                query, (B, cfg.num_query_tokens, cfg.hidden_size)
            ).astype(self.dtype))
            nq = cfg.num_query_tokens
        if text_ids is not None:
            emb = (self.word_embed if self.word_embed is not None
                   else nn.Embed(cfg.vocab_size, cfg.hidden_size,
                                 dtype=self.dtype, name="word_embeddings"))
            word = emb(text_ids)
            pos = nn.Embed(cfg.max_position, cfg.hidden_size, dtype=self.dtype,
                           name="position_embeddings")(
                jnp.arange(text_ids.shape[1])[None])
            parts.append(word + pos)
        hidden = jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]
        hidden = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                              name="emb_norm")(hidden)

        # additive self-attention bias over the [query ; text] sequence
        B, L = hidden.shape[:2]
        nt = L - nq
        key_ok = jnp.ones((B, L), bool)
        if text_ids is not None and text_mask is not None:
            key_ok = key_ok.at[:, nq:].set(text_mask.astype(bool))
        bias = jnp.where(key_ok[:, None, None, :], 0.0, NEG_INF)
        if causal_text and nt > 0:
            qpos = jnp.arange(L)[:, None]
            kpos = jnp.arange(L)[None, :]
            # queries are bidirectional among themselves; text attends to all
            # queries and to text positions <= its own
            causal = (kpos < nq) | (kpos <= qpos)
            bias = bias + jnp.where(causal[None, None], 0.0, NEG_INF)

        for i in range(cfg.num_layers):
            hidden = QFormerTextLayer(
                cfg, has_cross_attention=(i % cfg.cross_attention_freq == 0),
                dtype=self.dtype, name=f"layer{i}")(
                hidden, nq, enc_states, enc_mask, bias, deterministic)
        return hidden


@registry.register_model("blip2")
class Blip2Qformer(nn.Module):
    """Stage-1 model: scene features + captions -> ITC/ITM/LM losses."""
    cfg: QFormerConfig
    embed_dim: int = 256
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        # word embedding owned here so the LM head can tie to it
        self.word_embeddings = nn.Embed(
            self.cfg.vocab_size, self.cfg.hidden_size, dtype=self.dtype,
            name="word_embeddings")
        self.qformer = QFormerTextModel(self.cfg, self.dtype,
                                        word_embed=self.word_embeddings,
                                        name="qformer")
        self.vision_proj = nn.Dense(self.embed_dim, dtype=self.dtype,
                                    name="vision_proj")
        self.text_proj = nn.Dense(self.embed_dim, dtype=self.dtype,
                                  name="text_proj")
        self.itm_head = nn.Dense(2, dtype=self.dtype, name="itm_head")
        # learned temperature (blip2_qformer.py:70: init 0.07)
        self.temp = self.param("temp", nn.initializers.constant(0.07), ())
        # LM head: transform + tied decoder (BertLMHeadModel cls.predictions)
        self.lm_transform = nn.Dense(self.cfg.hidden_size, dtype=self.dtype,
                                     name="lm_transform")
        self.lm_norm = nn.LayerNorm(epsilon=self.cfg.layer_norm_eps,
                                    dtype=self.dtype, name="lm_norm")
        self.lm_bias = self.param("lm_bias", nn.initializers.zeros,
                                  (self.cfg.vocab_size,))

    def lm_logits(self, hidden):
        h = nn.gelu(self.lm_transform(hidden), approximate=False)
        h = self.lm_norm(h)
        # decoder tied to the word embedding table (BertLMHeadModel)
        return self.word_embeddings.attend(h) + self.lm_bias

    def encode_image(self, image_embeds, image_mask, deterministic=True):
        q = self.qformer(enc_states=image_embeds, enc_mask=image_mask,
                         use_query=True, deterministic=deterministic)
        return q

    def encode_text(self, text_ids, text_mask, deterministic=True):
        t = self.qformer(text_ids=text_ids, text_mask=text_mask,
                         use_query=False, deterministic=deterministic)
        return t

    # -- retrieval surface (blip2_qformer.py:290-328) ----------------------
    def forward_image(self, image_embeds, image_mask):
        """Query outputs + the raw encoder states (blip2_qformer.py:290-302)."""
        q = self.encode_image(image_embeds, image_mask)
        return q, image_embeds

    def forward_text(self, text_ids, text_mask):
        """Text CLS hidden state (blip2_qformer.py:304-310)."""
        return self.encode_text(text_ids, text_mask)[:, 0]

    def compute_itm(self, image_inputs, image_mask, text_ids, text_mask):
        """ITM match logit per (image, text) pair: joint [query ; text]
        encoding, 2-way head, positive-class logit averaged over the query
        outputs (blip2_qformer.py:312-328)."""
        mm = self.qformer(enc_states=image_inputs, enc_mask=image_mask,
                          text_ids=text_ids, text_mask=text_mask,
                          use_query=True)
        logits = self.itm_head(mm[:, :self.cfg.num_query_tokens])
        return jnp.mean(logits[:, :, 1], axis=1)

    def itc_projections(self, image_embeds, image_mask, text_ids, text_mask):
        """Normalized (image_feats [B,Q,D], text_feat [B,D]) for similarity
        ranking (blip2_qformer.py:149-172)."""
        def _norm(x):
            return x / jnp.maximum(
                jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)
        q = self.encode_image(image_embeds, image_mask)
        img = _norm(self.vision_proj(q).astype(jnp.float32))
        t = self.encode_text(text_ids, text_mask)[:, 0]
        txt = _norm(self.text_proj(t).astype(jnp.float32))
        return img, txt

    def __call__(self, batch: Dict[str, Any], train: bool = False,
                 negatives_axis: Optional[str] = None) -> Dict[str, Any]:
        """batch: image_embeds [B,N,encoder_width], image_mask [B,N],
        text_ids/text_mask [B,Lt] caption tokens (pad=0).

        Returns {"loss", "loss_itc", "loss_itm", "loss_lm"}.
        """
        det = not train
        image_embeds = batch["image_embeds"].astype(self.dtype)
        image_mask = batch["image_mask"]
        text_ids, text_mask = batch["text_ids"], batch["text_mask"]
        B = text_ids.shape[0]
        nq = self.cfg.num_query_tokens

        # --- ITC --------------------------------------------------------
        query_out = self.encode_image(image_embeds, image_mask, det)
        image_feats = self.vision_proj(query_out)                # [B, Q, D]
        text_out = self.encode_text(text_ids, text_mask, det)
        text_feat = self.text_proj(text_out[:, 0])               # CLS [B, D]
        temp = jnp.maximum(self.temp, 1e-3)
        loss_itc = itc_loss(image_feats.astype(jnp.float32),
                            text_feat.astype(jnp.float32), temp,
                            axis=negatives_axis)

        # --- ITM with in-batch hard negatives ----------------------------
        def _norm(x):
            return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True),
                                   1e-12)
        sim = jnp.max(jnp.einsum(
            "bqd,jd->bqj", _norm(image_feats.astype(jnp.float32)),
            _norm(text_feat.astype(jnp.float32))), axis=1) / temp  # [B, B]
        eye = jnp.eye(B, dtype=bool)
        w_t2i = jnp.where(eye, NEG_INF, sim.T)   # text b picks a hard image
        w_i2t = jnp.where(eye, NEG_INF, sim)     # image b picks a hard text
        rng = self.make_rng("sample")
        r1, r2 = jax.random.split(rng)
        neg_img_idx = jax.random.categorical(r1, w_t2i, axis=-1)   # [B]
        neg_txt_idx = jax.random.categorical(r2, w_i2t, axis=-1)   # [B]

        itm_images = jnp.concatenate(
            [image_embeds, image_embeds[neg_img_idx], image_embeds], axis=0)
        itm_image_mask = jnp.concatenate(
            [image_mask, image_mask[neg_img_idx], image_mask], axis=0)
        itm_text = jnp.concatenate(
            [text_ids, text_ids, text_ids[neg_txt_idx]], axis=0)
        itm_tmask = jnp.concatenate(
            [text_mask, text_mask, text_mask[neg_txt_idx]], axis=0)
        mm = self.qformer(enc_states=itm_images, enc_mask=itm_image_mask,
                          text_ids=itm_text, text_mask=itm_tmask,
                          use_query=True, deterministic=det)
        logits = jnp.mean(self.itm_head(mm[:, :nq]), axis=1)     # [3B, 2]
        itm_labels = jnp.concatenate(
            [jnp.ones(B, jnp.int32), jnp.zeros(2 * B, jnp.int32)])
        loss_itm = itm_loss(logits, itm_labels)

        # --- LM -----------------------------------------------------------
        dec_in = jnp.roll(text_ids, 1, axis=1).at[:, 0].set(
            self.cfg.vocab_size - 1)  # bos = last vocab id ([DEC] analogue)
        lm_hidden = self.qformer(enc_states=image_embeds, enc_mask=image_mask,
                                 text_ids=dec_in, text_mask=jnp.ones_like(
                                     text_mask),
                                 use_query=True, causal_text=True,
                                 deterministic=det)
        logits_lm = self.lm_logits(lm_hidden[:, nq:])
        loss_lm = lm_loss(logits_lm, text_ids, text_mask)

        loss = loss_itc + loss_itm + loss_lm
        return {"loss": loss, "loss_itc": loss_itc, "loss_itm": loss_itm,
                "loss_lm": loss_lm}


@registry.register_model("blip2_image_text_matching")
class Blip2ITM(Blip2Qformer):
    """Standalone image-text matching model
    (``blip2_image_text_matching.py:15-108``, Blip2ITM): the stage-1
    Q-Former re-exposed as a scorer. ``__call__(batch, match_head)``
    returns

    - ``match_head="itm"``: the 2-way ITM logits per (scene, text) pair —
      joint [query ; text] encoding, ``itm_head`` averaged over the query
      outputs (``:69-85``; NOT softmaxed, like the reference);
    - ``match_head="itc"``: the max-over-queries cosine similarity
      (``:87-108``) — normalized ``vision_proj`` query features against the
      normalized text CLS projection, WITHOUT the learned temperature
      (the reference ITC head omits ``self.temp`` here too).

    batch: image_embeds [B,N,encoder_width], image_mask [B,N],
    text_ids/text_mask [B,Lt]. Tokenization happens outside jit (the
    reference calls ``self.tokenizer`` inline; we take ids)."""

    def __call__(self, batch: Dict[str, Any],          # type: ignore[override]
                 match_head: str = "itm") -> jnp.ndarray:
        if match_head not in ("itm", "itc"):
            raise ValueError(f"match_head must be itm|itc, got {match_head!r}")
        image_embeds = batch["image_embeds"].astype(self.dtype)
        image_mask = batch["image_mask"]
        text_ids, text_mask = batch["text_ids"], batch["text_mask"]
        # at init, trace BOTH heads so the full parameter tree materializes
        # regardless of which head the first apply selects (torch modules
        # always own both; flax params exist only if touched)
        heads = ("itm", "itc") if self.is_initializing() else (match_head,)
        out = None
        for head in heads:
            if head == "itm":
                mm = self.qformer(enc_states=image_embeds,
                                  enc_mask=image_mask, text_ids=text_ids,
                                  text_mask=text_mask, use_query=True)
                logits = self.itm_head(mm[:, :self.cfg.num_query_tokens])
                val = jnp.mean(logits, axis=1)                   # [B, 2]
            else:
                img, txt = self.itc_projections(image_embeds, image_mask,
                                                text_ids, text_mask)
                sims = jnp.einsum("bqd,bd->bq", img, txt)
                val = jnp.max(sims, axis=1)                      # [B]
            if head == match_head:
                out = val
        return out
