"""T5 encoder-decoder (flax.linen), sized for FlanT5-XL.

TPU-native re-implementation of the reference's vendored HF T5
(``3DLLM_BLIP2-base/lavis/models/blip2_models/modeling_t5.py``), as used by
Blip2T5: encoder consumes ``inputs_embeds`` (query prefix + token embeds,
``blip2_t5.py:173-182``), ``dense_act_fn`` overridden to exact gelu
(``blip2_t5.py:79``), gated activations, vocab resized to 32128+32768
location tokens (``blip2_t5.py:73-82``; padded to 65536 here so the lm_head
matmul tiles the MXU evenly), untied lm_head.

T5 semantics preserved: RMS layer norm, no attention scaling (folded into
init), relative position bias only in the first layer of each stack and
shared downward, decoder causal masking. Greedy decode (the reference forces
``num_beams=1`` in ``predict_answers``, ``blip2_t5.py:320``) runs as a
``lax.while_loop`` over a linen ``cache`` collection (static shapes, one
compiled step reused for every position).

Sharding: weights are created with logical partitioning in mind — for
multi-chip tensor parallelism shard ``wi``/``wo`` and the attention heads on
the mesh ``model`` axis via pjit sharding constraints at the call site
(parallel/mesh.py); a 1-chip v5e fits XL inference in bf16 (~5.7 GB).
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from situation3d_tpu.config import T5Config
from situation3d_tpu.models.relpos import (
    relative_position_bucket,
    relative_position_matrix,
)

NEG_INF = -1e9


class T5LayerNorm(nn.Module):
    """RMS norm without mean subtraction or bias."""
    epsilon: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.ones, (x.shape[-1],), jnp.float32)
        var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
        x = x * jax.lax.rsqrt(var + self.epsilon)
        return (w * x).astype(self.dtype)


class T5Attention(nn.Module):
    cfg: T5Config
    has_relative_bias: bool = False
    causal: bool = False
    dtype: jnp.dtype = jnp.float32

    def _split(self, x, B):
        return x.reshape(B, -1, self.cfg.num_heads, self.cfg.d_kv).transpose(0, 2, 1, 3)

    @nn.compact
    def __call__(self, hidden, kv=None, mask=None, position_bias=None,
                 decode: bool = False):
        """mask: [B, Lk] 1=attend. Returns (out, position_bias)."""
        cfg = self.cfg
        B, Lq, _ = hidden.shape
        inner = cfg.num_heads * cfg.d_kv
        kv_src = hidden if kv is None else kv
        q = self._split(nn.Dense(inner, use_bias=False, dtype=self.dtype, name="q")(hidden), B)
        k = self._split(nn.Dense(inner, use_bias=False, dtype=self.dtype, name="k")(kv_src), B)
        v = self._split(nn.Dense(inner, use_bias=False, dtype=self.dtype, name="v")(kv_src), B)

        cache_index = None
        if decode and kv is None:
            # autoregressive self-attention cache
            ck = self.variable("cache", "cached_key", jnp.zeros,
                               (B, cfg.num_heads, cfg.max_answer_len, cfg.d_kv),
                               self.dtype)
            cv = self.variable("cache", "cached_value", jnp.zeros,
                               (B, cfg.num_heads, cfg.max_answer_len, cfg.d_kv),
                               self.dtype)
            ci = self.variable("cache", "cache_index",
                               lambda: jnp.zeros((), jnp.int32))
            idx = ci.value
            ck.value = jax.lax.dynamic_update_slice(ck.value, k, (0, 0, idx, 0))
            cv.value = jax.lax.dynamic_update_slice(cv.value, v, (0, 0, idx, 0))
            k, v = ck.value, cv.value
            cache_index = idx
            ci.value = idx + Lq

        Lk = k.shape[2]
        # no 1/sqrt(d) scaling: T5 convention
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32)

        if position_bias is None and self.has_relative_bias:
            rp = relative_position_matrix(Lk if decode else Lq, Lk)
            buckets = relative_position_bucket(
                rp, bidirectional=not self.causal,
                num_buckets=cfg.relative_attention_num_buckets,
                max_distance=cfg.relative_attention_max_distance)
            bias_table = nn.Embed(
                cfg.relative_attention_num_buckets, cfg.num_heads,
                dtype=jnp.float32, name="relative_attention_bias")(buckets)
            position_bias = bias_table.transpose(2, 0, 1)[None]  # [1,h,Lq,Lk]
            if decode and cache_index is not None:
                # during decode, slice the row(s) for the current position(s)
                position_bias = jax.lax.dynamic_slice_in_dim(
                    position_bias, cache_index, Lq, axis=2)
        if position_bias is not None:
            scores = scores + position_bias.astype(scores.dtype)

        if self.causal and not decode:
            causal = jnp.tril(jnp.ones((Lq, Lk), bool))
            scores = jnp.where(causal[None, None], scores, NEG_INF)
        if decode and kv is None and cache_index is not None:
            pos = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, Lk), 3)
            scores = jnp.where(pos <= cache_index, scores, NEG_INF)
        if mask is not None:
            scores = jnp.where(mask[:, None, None, :].astype(bool), scores, NEG_INF)

        att = jax.nn.softmax(scores, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", att, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, Lq, inner)
        return nn.Dense(self.cfg.d_model, use_bias=False, dtype=self.dtype,
                        name="o")(out), position_bias


class T5FF(nn.Module):
    cfg: T5Config
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        h = T5LayerNorm(cfg.layer_norm_epsilon, self.dtype, name="layer_norm")(x)
        if cfg.is_gated_act:
            g = nn.Dense(cfg.d_ff, use_bias=False, dtype=self.dtype, name="wi_0")(h)
            g = nn.gelu(g, approximate=(cfg.dense_act_fn == "gelu_new"))
            l = nn.Dense(cfg.d_ff, use_bias=False, dtype=self.dtype, name="wi_1")(h)
            h = g * l
        else:
            h = nn.Dense(cfg.d_ff, use_bias=False, dtype=self.dtype, name="wi")(h)
            h = nn.relu(h)
        return x + nn.Dense(cfg.d_model, use_bias=False, dtype=self.dtype,
                            name="wo")(h)


class T5EncoderBlock(nn.Module):
    cfg: T5Config
    has_relative_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask, position_bias):
        h = T5LayerNorm(self.cfg.layer_norm_epsilon, self.dtype,
                        name="self_attn_norm")(x)
        a, position_bias = T5Attention(
            self.cfg, self.has_relative_bias, causal=False, dtype=self.dtype,
            name="self_attn")(h, mask=mask, position_bias=position_bias)
        x = x + a
        x = T5FF(self.cfg, self.dtype, name="ff")(x)
        return x, position_bias


class T5DecoderBlock(nn.Module):
    cfg: T5Config
    has_relative_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, enc, enc_mask, dec_mask, position_bias, decode=False):
        h = T5LayerNorm(self.cfg.layer_norm_epsilon, self.dtype,
                        name="self_attn_norm")(x)
        a, position_bias = T5Attention(
            self.cfg, self.has_relative_bias, causal=True, dtype=self.dtype,
            name="self_attn")(h, mask=dec_mask, position_bias=position_bias,
                              decode=decode)
        x = x + a
        h = T5LayerNorm(self.cfg.layer_norm_epsilon, self.dtype,
                        name="cross_attn_norm")(x)
        c, _ = T5Attention(self.cfg, False, causal=False, dtype=self.dtype,
                           name="cross_attn")(h, kv=enc, mask=enc_mask)
        x = x + c
        x = T5FF(self.cfg, self.dtype, name="ff")(x)
        return x, position_bias


class T5Encoder(nn.Module):
    cfg: T5Config
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, inputs_embeds, mask):
        x = inputs_embeds.astype(self.dtype)
        position_bias = None
        block_cls = (nn.remat(T5EncoderBlock, static_argnums=())
                     if self.cfg.remat else T5EncoderBlock)
        for i in range(self.cfg.num_layers):
            x, position_bias = block_cls(
                self.cfg, has_relative_bias=(i == 0), dtype=self.dtype,
                name=f"block{i}")(x, mask, position_bias)
        return T5LayerNorm(self.cfg.layer_norm_epsilon, self.dtype,
                           name="final_norm")(x)


class T5Decoder(nn.Module):
    cfg: T5Config
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, dec_embeds, enc, enc_mask, dec_mask=None, decode=False):
        x = dec_embeds.astype(self.dtype)
        position_bias = None
        # remat only in training (the decode cache is mutable state)
        block_cls = (nn.remat(T5DecoderBlock, static_argnums=(6,))
                     if self.cfg.remat and not decode else T5DecoderBlock)
        for i in range(self.cfg.num_decoder_layers):
            x, position_bias = block_cls(
                self.cfg, has_relative_bias=(i == 0), dtype=self.dtype,
                name=f"block{i}")(x, enc, enc_mask, dec_mask, position_bias,
                                  decode)
        return T5LayerNorm(self.cfg.layer_norm_epsilon, self.dtype,
                           name="final_norm")(x)


class T5ForConditionalGeneration(nn.Module):
    cfg: T5Config
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.cfg
        self.shared = nn.Embed(cfg.vocab_size, cfg.d_model, dtype=self.dtype,
                               name="shared")
        self.encoder = T5Encoder(cfg, self.dtype, name="encoder")
        self.decoder = T5Decoder(cfg, self.dtype, name="decoder")
        self.lm_head = nn.Dense(cfg.vocab_size, use_bias=False,
                                dtype=self.dtype, name="lm_head")

    def embed(self, ids):
        return self.shared(ids)

    def encode(self, inputs_embeds, mask):
        return self.encoder(inputs_embeds, mask)

    def decode_train(self, enc, enc_mask, decoder_input_ids, dec_mask):
        x = self.shared(decoder_input_ids)
        x = self.decoder(x, enc, enc_mask, dec_mask, decode=False)
        if self.cfg.tie_word_embeddings:
            x = x * (self.cfg.d_model ** -0.5)
            return x @ self.shared.embedding.T.astype(x.dtype)
        return self.lm_head(x)

    def decode_step(self, enc, enc_mask, token_ids):
        """One decode step with the linen cache (token_ids [B, 1])."""
        x = self.shared(token_ids)
        x = self.decoder(x, enc, enc_mask, None, decode=True)
        if self.cfg.tie_word_embeddings:
            x = x * (self.cfg.d_model ** -0.5)
            return x @ self.shared.embedding.T.astype(x.dtype)
        return self.lm_head(x)

    def __call__(self, inputs_embeds, enc_mask, decoder_input_ids, dec_mask):
        """Teacher-forced training forward -> logits [B, Ld, V]."""
        enc = self.encode(inputs_embeds, enc_mask)
        return self.decode_train(enc, enc_mask, decoder_input_ids, dec_mask)


def shift_right(labels: jnp.ndarray, start_id: int, pad_id: int) -> jnp.ndarray:
    """Decoder inputs = labels shifted right with the start token."""
    shifted = jnp.roll(labels, 1, axis=-1).at[:, 0].set(start_id)
    return jnp.where(shifted == -100, pad_id, shifted)


def t5_cross_entropy(logits, labels, label_mask) -> jnp.ndarray:
    """Token-mean CE ignoring masked labels (HF -100 convention)."""
    import optax
    safe = jnp.where(labels < 0, 0, labels)
    per = optax.softmax_cross_entropy_with_integer_labels(
        logits.astype(jnp.float32), safe)
    m = label_mask.astype(jnp.float32)
    return jnp.sum(per * m) / jnp.maximum(jnp.sum(m), 1.0)


def apply_repetition_penalty(logits, seen, penalty: float):
    """HF RepetitionPenaltyLogitsProcessor: previously generated tokens'
    scores divide by ``penalty`` when positive, multiply when negative."""
    pen = jnp.where(logits > 0, logits / penalty, logits * penalty)
    return jnp.where(seen, pen, logits)


def sample_decode(model: T5ForConditionalGeneration, variables,
                  inputs_embeds, enc_mask, max_len: int,
                  decoder_start_id: int, eos_id: int, pad_id: int,
                  rng, top_p: float = 0.9, temperature: float = 1.0,
                  min_length: int = 1, repetition_penalty: float = 1.0):
    """Nucleus (top-p) sampling — the ``use_nucleus_sampling=True`` branch
    of the reference's generate (``blip2_t5.py:251-259`` -> HF ``do_sample``
    with TopPLogitsWarper semantics: keep the smallest prefix of the sorted
    distribution whose cumulative probability exceeds ``top_p``).
    Returns int32 [B, max_len] (pad after EOS)."""
    B = inputs_embeds.shape[0]
    enc = model.apply(variables, inputs_embeds, enc_mask,
                      method=T5ForConditionalGeneration.encode)
    _, cache_vars = model.apply(
        variables, enc, enc_mask,
        jnp.full((B, 1), decoder_start_id, jnp.int32),
        method=T5ForConditionalGeneration.decode_step, mutable=["cache"])
    init_cache = jax.tree_util.tree_map(jnp.zeros_like, cache_vars["cache"])
    vocab = model.cfg.vocab_size
    NEG = jnp.float32(-1e9)

    def cond(state):
        i, _, _, done, _, _, _ = state
        return (i < max_len) & ~jnp.all(done)

    def body(state):
        i, tok, cache, done, out, key, seen = state
        logits, new_vars = model.apply(
            {**variables, "cache": cache}, enc, enc_mask, tok,
            method=T5ForConditionalGeneration.decode_step, mutable=["cache"])
        lg = logits[:, -1].astype(jnp.float32) / jnp.float32(temperature)
        if repetition_penalty != 1.0:
            lg = apply_repetition_penalty(lg, seen, repetition_penalty)
        lg = lg.at[:, eos_id].set(
            jnp.where(i + 1 < min_length, NEG, lg[:, eos_id]))
        # top-p filter on the sorted distribution (keep the first token
        # crossing the threshold, as HF does via the shifted remove-mask)
        order = jnp.argsort(-lg, axis=-1)
        sorted_lg = jnp.take_along_axis(lg, order, axis=-1)
        probs = jax.nn.softmax(sorted_lg, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        remove_sorted = (cum - probs) >= top_p      # strictly after crossing
        remove = jnp.zeros_like(remove_sorted).at[
            jnp.arange(B)[:, None], order].set(remove_sorted)
        lg = jnp.where(remove, NEG, lg)
        key, sub = jax.random.split(key)
        nxt = jax.random.categorical(sub, lg, axis=-1).astype(jnp.int32)
        nxt = jnp.where(done, pad_id, nxt)
        out = out.at[:, i].set(nxt)
        seen = seen.at[jnp.arange(B), nxt].set(True)
        done = done | (nxt == eos_id)
        return i + 1, nxt[:, None], new_vars["cache"], done, out, key, seen

    out = jnp.full((B, max_len), pad_id, jnp.int32)
    state = (jnp.zeros((), jnp.int32),
             jnp.full((B, 1), decoder_start_id, jnp.int32),
             init_cache, jnp.zeros((B,), bool), out, rng,
             jnp.zeros((B, vocab), bool))
    _, _, _, _, out, _, _ = jax.lax.while_loop(cond, body, state)
    return out


def beam_search_decode(model: T5ForConditionalGeneration, variables,
                       inputs_embeds, enc_mask, max_len: int,
                       decoder_start_id: int, eos_id: int, pad_id: int,
                       num_beams: int = 5, length_penalty: float = 1.0,
                       min_length: int = 1):
    """Beam search matching HF ``generate`` semantics (``blip2_t5.py:251-259``
    runs the vendored T5's generate with num_beams=5, length_penalty=1.0,
    early_stopping off, min_length masking): 2M candidate expansion per
    step, EOS candidates finalize with score ``sum_logprobs / len**alpha``
    (len counts decoder_start + generated-so-far), survivors continue.
    Fixed shapes: one while_loop, cache reordered by beam gathers.

    Returns int32 [B, max_len] sequences (EOS kept, pad after)."""
    B = inputs_embeds.shape[0]
    M = num_beams
    NEG = jnp.float32(-1e9)
    enc = model.apply(variables, inputs_embeds, enc_mask,
                      method=T5ForConditionalGeneration.encode)
    Le, D = enc.shape[1:]
    enc_rep = jnp.repeat(enc, M, axis=0)                       # [B*M, Le, D]
    mask_rep = jnp.repeat(enc_mask, M, axis=0)

    _, cache_vars = model.apply(
        variables, enc_rep, mask_rep,
        jnp.full((B * M, 1), decoder_start_id, jnp.int32),
        method=T5ForConditionalGeneration.decode_step, mutable=["cache"])
    init_cache = jax.tree_util.tree_map(jnp.zeros_like, cache_vars["cache"])

    def _batch_done(step, run_score, fin_scores, n_fin):
        # HF BeamHypotheses.is_done (early_stopping=False): M hypotheses
        # collected AND the best running sum-logprob can no longer beat the
        # worst kept hypothesis under the length penalty
        best_possible = run_score[:, 0] / jnp.float32(
            jnp.maximum(step + 1, 1)) ** length_penalty
        return (n_fin >= M) & (fin_scores[:, -1] >= best_possible)

    def step_fn(state):
        (step, tokens, run_score, seqs, fin_seqs, fin_scores, n_fin,
         done, cache) = state
        logits, new_vars = model.apply(
            {**variables, "cache": cache}, enc_rep, mask_rep,
            tokens.reshape(B * M, 1),
            method=T5ForConditionalGeneration.decode_step, mutable=["cache"])
        cache = new_vars["cache"]
        logp = jax.nn.log_softmax(logits[:, -1].astype(jnp.float32), axis=-1)
        vocab = logp.shape[-1]
        # MinLengthLogitsProcessor: EOS forbidden while len < min_length
        logp = logp.at[:, eos_id].set(jnp.where(
            step + 1 < min_length, NEG, logp[:, eos_id]))
        cand = run_score[:, :, None] + logp.reshape(B, M, vocab)
        flat = cand.reshape(B, M * vocab)
        top2, idx2 = jax.lax.top_k(flat, 2 * M)                # [B, 2M]
        beam2 = idx2 // vocab
        tok2 = idx2 % vocab
        is_eos = tok2 == eos_id
        # candidate "hits a stopping criterion" (HF _beam_search
        # next_token_hits_stopping_criteria): EOS generated, or the running
        # length reached max_length — on the last step EVERY candidate
        # finalizes (this replaces a separate post-loop running-beam join).
        hits = is_eos | (step == max_len - 1)

        # ---- finalize hit candidates (HF _update_finished_beams): only the
        # top-M ranks of the 2M candidates may finalize (top_num_beam_mask),
        # blocked for batches already done; denominator = step+1 (start +
        # generated incl. the new token, minus the prompt) -----------------
        top_rank = jnp.arange(2 * M)[None, :] < M              # [1, 2M]
        fin_mask = hits & top_rank & ~done[:, None]
        eos_fin_scores = jnp.where(
            fin_mask, top2 / jnp.float32(step + 1) ** length_penalty, NEG)
        prefix = jnp.take_along_axis(
            seqs, beam2[:, :, None], axis=1)                   # [B, 2M, L]
        cand_fin = prefix.at[:, :, step].set(tok2)             # EOS or last tok
        all_scores = jnp.concatenate([fin_scores, eos_fin_scores], axis=1)
        all_seqs = jnp.concatenate([fin_seqs, cand_fin], axis=1)
        keep_s, keep_i = jax.lax.top_k(all_scores, M)
        fin_scores = keep_s
        fin_seqs = jnp.take_along_axis(all_seqs, keep_i[:, :, None], axis=1)
        n_fin = n_fin + jnp.sum(fin_mask.astype(jnp.int32), axis=1)

        # ---- survivors: top-M non-hit candidates ------------------------
        cont = jnp.where(hits, NEG, top2)
        sel_s, sel_i = jax.lax.top_k(cont, M)                  # [B, M]
        sel_beam = jnp.take_along_axis(beam2, sel_i, axis=1)
        sel_tok = jnp.take_along_axis(tok2, sel_i, axis=1)
        # frozen batches: identity beam gather, pad tokens, scores frozen
        ident = jnp.broadcast_to(jnp.arange(M)[None], (B, M))
        sel_beam = jnp.where(done[:, None], ident, sel_beam)
        sel_tok = jnp.where(done[:, None], pad_id, sel_tok)
        run_score = jnp.where(done[:, None], run_score, sel_s)
        seqs = jnp.take_along_axis(seqs, sel_beam[:, :, None], axis=1)
        seqs = seqs.at[:, :, step].set(jnp.where(
            done[:, None], seqs[:, :, step], sel_tok))
        # reorder the cache along the flattened beam axis
        flat_idx = (jnp.arange(B)[:, None] * M + sel_beam).reshape(-1)
        cache = jax.tree_util.tree_map(
            lambda c: jnp.take(c, flat_idx, axis=0) if c.ndim and
            c.shape[0] == B * M else c, cache)
        # HF latches the early-stop state (is_early_stop_heuristic_unsatisfied
        # is AND-ed each step): once a batch trips is_done it stays done, even
        # though the frozen negative run_score divided by a growing
        # denominator would later rise above the worst kept hypothesis and
        # "un-trip" a recomputed criterion (which would resume decoding from a
        # pad-corrupted state).  Denominator = step+1 generated tokens
        # (HF: cur_len_new - decoder_prompt_len).
        done = done | _batch_done(step, run_score, fin_scores, n_fin)
        return (step + 1, sel_tok[..., None], run_score, seqs, fin_seqs,
                fin_scores, n_fin, done, cache)

    def cond_fn(state):
        step, _, _, _, _, _, _, done, _ = state
        return (step < max_len) & ~jnp.all(done)

    run0 = jnp.tile(jnp.asarray([0.0] + [-1e9] * (M - 1), jnp.float32),
                    (B, 1))
    state = (jnp.zeros((), jnp.int32),
             jnp.full((B, M, 1), decoder_start_id, jnp.int32),
             run0,
             jnp.full((B, M, max_len), pad_id, jnp.int32),
             jnp.full((B, M, max_len), pad_id, jnp.int32),
             jnp.full((B, M), NEG),
             jnp.zeros((B,), jnp.int32),
             jnp.zeros((B,), bool),
             init_cache)
    (step, _, run_score, seqs, fin_seqs, fin_scores, n_fin, done_final, _) = \
        jax.lax.while_loop(cond_fn, step_fn, state)

    # No post-loop running-beam join: HF's vectorized _beam_search finalizes
    # the top-M candidates on the last step (every candidate hits the
    # max-length stopping criterion there), so by loop exit every batch holds
    # >= M finished hypotheses and the answer is the best finished one.
    best = jnp.argmax(fin_scores, axis=1)
    return jnp.take_along_axis(fin_seqs, best[:, None, None], axis=1)[:, 0]


def greedy_decode(model: T5ForConditionalGeneration, variables,
                  inputs_embeds, enc_mask, max_len: int,
                  decoder_start_id: int, eos_id: int, pad_id: int):
    """Greedy generation (beam=1, matching blip2_t5.py:320) via while_loop
    over a mutable cache. Returns int32 [B, max_len] (pad after EOS)."""
    B = inputs_embeds.shape[0]
    enc = model.apply(variables, inputs_embeds, enc_mask,
                      method=T5ForConditionalGeneration.encode)

    # init cache by tracing one step
    _, cache_vars = model.apply(
        variables, enc, enc_mask,
        jnp.full((B, 1), decoder_start_id, jnp.int32),
        method=T5ForConditionalGeneration.decode_step, mutable=["cache"])
    init_cache = jax.tree_util.tree_map(jnp.zeros_like, cache_vars["cache"])

    def cond(state):
        i, _, _, done, _ = state
        return (i < max_len) & ~jnp.all(done)

    def body(state):
        i, tok, cache, done, out = state
        logits, new_vars = model.apply(
            {**variables, "cache": cache}, enc, enc_mask, tok,
            method=T5ForConditionalGeneration.decode_step, mutable=["cache"])
        nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
        nxt = jnp.where(done, pad_id, nxt)
        out = out.at[:, i].set(nxt)
        done = done | (nxt == eos_id)
        return i + 1, nxt[:, None], new_vars["cache"], done, out

    out = jnp.full((B, max_len), pad_id, jnp.int32)
    state = (jnp.zeros((), jnp.int32),
             jnp.full((B, 1), decoder_start_id, jnp.int32),
             init_cache, jnp.zeros((B,), bool), out)
    _, _, _, _, out = jax.lax.while_loop(cond, body, state)
    return out
