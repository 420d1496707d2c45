"""Blip2OPT — the OPT-flavoured BLIP-2 3D model (flax.linen).

Re-implementation of ``3DLLM_BLIP2-base/lavis/models/blip2_models/
blip2_opt.py`` (Blip2OPT): the same slim query-only Q-Former as Blip2T5
over 3D scene features, projected by ``opt_proj`` into a frozen OPT causal
LM that consumes the 32 query embeddings as a prefix ahead of the prompt
tokens.

Reference quirks preserved:
- the 3D positional encodings are appended as EXTRA tokens after the
  feature tokens (``cat([pc_embeds, all_pcs], 1)``, blip2_opt.py:104 — the
  scene sequence doubles to 2N; the last feature column of the positional
  rows is zero since 1408 % 3 != 0, blip2_opt.py:95-101), unlike Blip2T5's
  additive 0.01x encoding;
- training loss is causal-LM CE over ``[query prefix(-100) ; prompt+answer
  tokens]`` (blip2_opt.py:127-166);
- OPT is frozen (blip2_opt.py:75-77) — expressed here through optimizer
  masks (train/optim.py prefix filters) like the T5 freeze.
"""
from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax.numpy as jnp

from situation3d_tpu.config import QFormerConfig
from situation3d_tpu.models.opt import (OPTConfig, OPTForCausalLM,
                                        opt_causal_lm_loss, opt_greedy_decode)
from situation3d_tpu.models.positional import (voxel_position_embedding,
                                               voxel_position_table)
from situation3d_tpu.models.qformer import QFormer
from situation3d_tpu.utils.registry import registry


@registry.register_model("blip2_opt")
class Blip2OPT(nn.Module):
    qformer_cfg: QFormerConfig
    opt_cfg: OPTConfig
    pc_feat_dim: int = 1408
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.qformer = QFormer(self.qformer_cfg, self.dtype, name="qformer")
        self.opt = OPTForCausalLM(self.opt_cfg, self.dtype, name="opt")
        self.opt_proj = nn.Dense(self.opt_cfg.hidden_size, dtype=self.dtype,
                                 name="opt_proj")
        self._pos_table = jnp.asarray(
            voxel_position_table(self.pc_feat_dim // 3))

    def encode_scene(self, pc_feat, pc, pc_mask):
        """[features ; positional tokens] -> 32 query embeddings in OPT
        space. The positional rows pad channel 1407 with zero
        (blip2_opt.py:95-104)."""
        pos = voxel_position_embedding(pc, self.pc_feat_dim, self._pos_table)
        seq = jnp.concatenate(
            [pc_feat.astype(self.dtype), pos.astype(self.dtype)], axis=1)
        mask = jnp.concatenate([pc_mask, pc_mask], axis=1)
        query_out = self.qformer(seq, mask)
        return self.opt_proj(query_out)

    def __call__(self, batch: Dict[str, Any], train: bool = False):
        """Training forward -> {"loss", "logits"}.

        batch: pc_feat [B,N,1408], pc [B,N,3], pc_mask [B,N],
        input_ids/input_mask [B,L] = tokenized ``prompt + answer + "\\n"``
        (blip2_opt.py:127-135), target_mask [B,L] marking ANSWER positions
        (prompt positions are loss-masked like the reference's
        ``idxes``-based slicing).
        """
        prefix = self.encode_scene(batch["pc_feat"], batch["pc"],
                                   batch["pc_mask"])
        logits = self.opt(batch["input_ids"], batch["input_mask"],
                          prefix_embeds=prefix)
        P = prefix.shape[1]
        tmask = batch.get("target_mask", batch["input_mask"])
        targets = jnp.where(tmask.astype(bool), batch["input_ids"], -100)
        targets = jnp.concatenate(
            [jnp.full((targets.shape[0], P), -100, targets.dtype), targets],
            axis=1)
        loss = opt_causal_lm_loss(logits, targets)
        return {"loss": loss, "logits": logits}


def opt_predict_answers(model: Blip2OPT, variables, batch,
                        max_len: int = 30,
                        eos_id: int | None = None) -> jnp.ndarray:
    """Greedy generation (blip2_opt.py:168-240 generate with num_beams=1).

    The reference stops at the NEWLINE token, not </s>: blip2_opt.py:77
    sets ``eos_token_id = tokenizer("\\n").input_ids[1]`` (id 50118 for the
    GPT2-BPE OPT tokenizer). Pass that id as ``eos_id``; the default falls
    back to the model's ``</s>`` id, which only matches the reference if the
    config overrides ``eos_token_id`` with the tokenizer's newline id.
    Left-padded prompts are handled via ``input_mask`` (position ids and
    attention keys skip pad slots)."""
    prefix = model.apply(variables, batch["pc_feat"], batch["pc"],
                         batch["pc_mask"], method=Blip2OPT.encode_scene)
    opt_vars = {"params": variables["params"]["opt"]}
    opt = OPTForCausalLM(model.opt_cfg, model.dtype)
    return opt_greedy_decode(
        opt, opt_vars, prefix, batch["input_ids"], max_len,
        eos_id=model.opt_cfg.eos_token_id if eos_id is None else eos_id,
        pad_id=model.opt_cfg.pad_token_id,
        first_mask=batch.get("input_mask"))
