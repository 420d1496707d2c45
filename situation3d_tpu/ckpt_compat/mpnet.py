"""HF MPNet checkpoint -> models/lang.py MPNetEncoder params.

Maps ``sentence-transformers/all-mpnet-base-v2`` (loaded via AutoModel at
``sep_lang_module_bert.py:27``) state-dict names (``mpnet.`` or bare
``embeddings./encoder.`` prefixes) into the flax tree.
"""
from __future__ import annotations

from typing import Any, Dict

import numpy as np

from situation3d_tpu.ckpt_compat.common import dense, layernorm


def convert_mpnet(sd: Dict[str, np.ndarray], num_layers: int = 12
                  ) -> Dict[str, Any]:
    for pref in ("mpnet.", "bert_model.", "0.auto_model."):
        if any(k.startswith(pref) for k in sd):
            sd = {k[len(pref):]: v for k, v in sd.items() if k.startswith(pref)}
            break
    p: Dict[str, Any] = {
        "word_embeddings": {"embedding": sd["embeddings.word_embeddings.weight"]},
        "position_embeddings": {
            "embedding": sd["embeddings.position_embeddings.weight"]},
        "emb_norm": layernorm(sd, "embeddings.LayerNorm"),
        "relative_attention_bias": {
            "embedding": sd["encoder.relative_attention_bias.weight"]},
    }
    for i in range(num_layers):
        base = f"encoder.layer.{i}"
        p[f"layer{i}"] = {
            "attention": {
                "q": dense(sd, f"{base}.attention.attn.q"),
                "k": dense(sd, f"{base}.attention.attn.k"),
                "v": dense(sd, f"{base}.attention.attn.v"),
                "o": dense(sd, f"{base}.attention.attn.o"),
            },
            "attention_norm": layernorm(sd, f"{base}.attention.LayerNorm"),
            "intermediate": dense(sd, f"{base}.intermediate.dense"),
            "output": dense(sd, f"{base}.output.dense"),
            "output_norm": layernorm(sd, f"{base}.output.LayerNorm"),
        }
    return p
