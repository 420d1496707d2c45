"""HF OPT checkpoint -> models/opt.py params.

Maps ``facebook/opt-*`` ``OPTForCausalLM`` state dicts (as loaded at
``blip2_opt.py:73``) into the flax tree. The LM head is tied to
``embed_tokens`` in both, so only decoder weights transfer.
"""
from __future__ import annotations

from typing import Any, Dict

import numpy as np

from situation3d_tpu.ckpt_compat.common import dense, layernorm


def convert_opt(sd: Dict[str, np.ndarray], num_layers: int) -> Dict[str, Any]:
    pref = "model.decoder."
    if not any(k.startswith(pref) for k in sd):
        pref = "decoder." if any(k.startswith("decoder.") for k in sd) else ""
    p: Dict[str, Any] = {
        "embed_tokens": {"embedding": sd[f"{pref}embed_tokens.weight"]},
        "embed_positions": {
            "embedding": sd[f"{pref}embed_positions.weight"]},
        "final_norm": layernorm(sd, f"{pref}final_layer_norm"),
    }
    for i in range(num_layers):
        b = f"{pref}layers.{i}"
        p[f"layer{i}"] = {
            "self_attn_layer_norm": layernorm(sd, f"{b}.self_attn_layer_norm"),
            "final_layer_norm": layernorm(sd, f"{b}.final_layer_norm"),
            "self_attn": {
                "q_proj": dense(sd, f"{b}.self_attn.q_proj"),
                "k_proj": dense(sd, f"{b}.self_attn.k_proj"),
                "v_proj": dense(sd, f"{b}.self_attn.v_proj"),
                "out_proj": dense(sd, f"{b}.self_attn.out_proj"),
            },
            "fc1": dense(sd, f"{b}.fc1"),
            "fc2": dense(sd, f"{b}.fc2"),
        }
    return p
