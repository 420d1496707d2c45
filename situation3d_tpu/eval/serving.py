"""Multi-question scene-QA serving with scene-encoding reuse.

SQA3D asks ~6 questions per scene; the reference eval loop rebuilds the
kernel maps and re-runs the sparse encoder for every question at batch 1
(``situation3d/eval/eval.py:287-290``). Here the expensive, gather-bound
half of SIG3D — plan build + MinkUNet + situated token pooling — runs once
per scene, and each question reuses the pooled ``scene_tokens`` (see the
``scene_tokens`` fast path in ``models/sig3d.py``): per-question work drops
to the language encoder + MCAN fusion + heads, which are matmul-bound and
orders of magnitude cheaper.

Exactness: answers are bit-identical to the full forward given the same
sampled tokens (the tokens ARE the full forward's pooled tokens; the test
asserts equality).
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np


class SceneCache:
    """scene_id -> (scene_tokens, scene_token_positions) device arrays."""

    def __init__(self, model, variables):
        self.model = model
        self.variables = variables
        self._cache: Dict[str, Any] = {}
        self._encode = jax.jit(
            lambda v, b, k: _pick(model.apply(
                v, b, train=False, rngs={"sample": k})))
        self._answer = jax.jit(
            lambda v, b, k: self.model.apply(
                v, b, train=False, rngs={"sample": k}))

    def encode(self, scene_id: str, scene_batch: Dict[str, Any], key) -> None:
        """Run the scene tower once; scene_batch is a full batch dict for
        one scene (batch axis 1) including dummy question fields."""
        if scene_id in self._cache:
            return
        self._cache[scene_id] = self._encode(self.variables, scene_batch, key)

    def answer(self, scene_id: str, question_batch: Dict[str, Any], key
               ) -> Dict[str, Any]:
        """Answer a batch of questions against one cached scene. The cached
        [1, N, C] tokens broadcast across the question batch."""
        toks, pos = self._cache[scene_id]
        B = question_batch["s_ids"].shape[0]
        batch = {k: v for k, v in question_batch.items()
                 if not k.startswith("voxel_")}
        batch["scene_tokens"] = np.broadcast_to(
            np.asarray(toks), (B,) + np.asarray(toks).shape[1:])
        batch["scene_token_positions"] = np.broadcast_to(
            np.asarray(pos), (B,) + np.asarray(pos).shape[1:])
        return self._answer(self.variables, batch, key)

    def __contains__(self, scene_id: str) -> bool:
        return scene_id in self._cache


def _pick(out):
    return out["att_feat_pre"], out["scene_positions"]
