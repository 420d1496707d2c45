"""SQA3D/ScanQA offline scoring driver.

Re-implements the result-JSON scoring flow of
``3DLLM_BLIP2-base/calculate_scores/calculate_score_sqa3d.py``:
``<pad>``/``</s>``/comma stripping (``:358-359``), question-type buckets
All/What/How/Can/Is/Which/Other (``:307-320``), EM + caption metrics per
bucket.
"""
from __future__ import annotations

from typing import Dict, List, Tuple

from situation3d_tpu.eval.scorers import score_all

BUCKETS = ("All", "What", "How", "Can", "Is", "Which", "Other")


def clean_answer(ans: str) -> str:
    """Strip generation artifacts (calculate_score_sqa3d.py:358-359)."""
    return (ans.replace("<pad>", "").replace("</s>", "").replace(",", "")
            .strip().lower())


def bucket_of(question: str) -> str:
    first = question.split()[0].lower() if question.split() else ""
    table = {"what": "What", "how": "How", "can": "Can", "is": "Is",
             "which": "Which"}
    return table.get(first, "Other")


def score_results(
    preds: Dict[str, str],
    golds: Dict[str, List[str]],
    questions: Dict[str, str],
) -> Dict[str, Dict[str, float]]:
    """Per-bucket metric dict: {bucket: {EM, BLEU-1..4, METEOR, ROUGE-L, CIDEr}}."""
    preds = {k: clean_answer(v) for k, v in preds.items()}
    golds = {k: [clean_answer(g) for g in v] for k, v in golds.items()}
    out: Dict[str, Dict[str, float]] = {}
    for bucket in BUCKETS:
        if bucket == "All":
            keys = list(preds)
        else:
            keys = [k for k in preds
                    if bucket_of(questions.get(k, "")) == bucket]
        if not keys:
            continue
        p = {k: preds[k] for k in keys}
        g = {k: golds.get(k, []) for k in keys}
        out[bucket] = score_all(p, g)
        out[bucket]["count"] = len(keys)
    return out
