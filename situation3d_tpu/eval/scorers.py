"""Caption/answer scoring: EM, BLEU-1..4, ROUGE-L, CIDEr, METEOR.

Self-contained re-implementation of the offline scoring used by
``3DLLM_BLIP2-base/calculate_scores/calculate_score_sqa3d.py`` (EM at
``:243-266``, pycocoevalcap BLEU/METEOR/ROUGE-L/CIDEr at ``:268-305``),
without the pycocoevalcap/Java dependency:

- BLEU follows the coco-caption convention (per-reference closest length
  brevity penalty, "shortest" tie-break, corpus-level geometric mean);
- ROUGE-L is the F-measure with beta=1.2 (coco ROUGE default), max over
  references, mean over samples;
- CIDEr: tf-idf weighted cosine over 1..4-grams, length-gaussian penalty
  (sigma=6), x10 scale;
- METEOR here is the exact-match harmonic mean (P, R with alpha=0.9) with
  the chunk fragmentation penalty but no WordNet synonym/stem stage (the
  reference shells out to the METEOR Java jar; scores are close but not
  bit-identical — documented deviation).
"""
from __future__ import annotations

import math
from collections import Counter, defaultdict
from typing import Dict, Iterable, List, Sequence, Tuple


def tokenize(s: str) -> List[str]:
    return s.lower().strip().split()


def _ngrams(tokens: Sequence[str], n: int) -> Counter:
    return Counter(tuple(tokens[i:i + n]) for i in range(len(tokens) - n + 1))


# ---------------------------------------------------------------------------
# Exact match
# ---------------------------------------------------------------------------

def exact_match(preds: Dict[str, str], golds: Dict[str, List[str]]) -> float:
    """Top-1 EM: prediction string equals any gold answer (:243-266)."""
    hit = sum(1 for k, p in preds.items()
              if p.strip() in [g.strip() for g in golds.get(k, [])])
    return hit / max(len(preds), 1)


# ---------------------------------------------------------------------------
# BLEU (coco-caption convention)
# ---------------------------------------------------------------------------

def bleu(preds: Dict[str, str], golds: Dict[str, List[str]], max_n: int = 4
         ) -> List[float]:
    tot_match = [0] * max_n
    tot_count = [0] * max_n
    pred_len = 0
    ref_len = 0
    for k, p in preds.items():
        pt = tokenize(p)
        refs = [tokenize(g) for g in golds.get(k, [])] or [[]]
        pred_len += len(pt)
        # closest reference length (ties -> shorter)
        ref_len += min((abs(len(r) - len(pt)), len(r)) for r in refs)[1]
        for n in range(1, max_n + 1):
            pg = _ngrams(pt, n)
            maxref: Counter = Counter()
            for r in refs:
                for g, c in _ngrams(r, n).items():
                    maxref[g] = max(maxref[g], c)
            tot_match[n - 1] += sum(min(c, maxref[g]) for g, c in pg.items())
            tot_count[n - 1] += max(sum(pg.values()), 0)
    bp = 1.0 if pred_len > ref_len else math.exp(1 - ref_len / max(pred_len, 1))
    out = []
    logp = 0.0
    for n in range(max_n):
        p_n = tot_match[n] / tot_count[n] if tot_count[n] else 0.0
        logp += math.log(p_n) if p_n > 0 else -1e9
        out.append(bp * math.exp(logp / (n + 1)))
    return out


# ---------------------------------------------------------------------------
# ROUGE-L
# ---------------------------------------------------------------------------

def _lcs(a: List[str], b: List[str]) -> int:
    dp = [0] * (len(b) + 1)
    for x in a:
        prev = 0
        for j, y in enumerate(b, 1):
            cur = dp[j]
            dp[j] = prev + 1 if x == y else max(dp[j], dp[j - 1])
            prev = cur
    return dp[-1]


def rouge_l(preds: Dict[str, str], golds: Dict[str, List[str]],
            beta: float = 1.2) -> float:
    scores = []
    for k, p in preds.items():
        pt = tokenize(p)
        best = 0.0
        for g in golds.get(k, []):
            gt = tokenize(g)
            l = _lcs(pt, gt)
            if l == 0 or not pt or not gt:
                continue
            prec, rec = l / len(pt), l / len(gt)
            f = (1 + beta ** 2) * prec * rec / (rec + beta ** 2 * prec)
            best = max(best, f)
        scores.append(best)
    return sum(scores) / max(len(scores), 1)


# ---------------------------------------------------------------------------
# CIDEr
# ---------------------------------------------------------------------------

def cider(preds: Dict[str, str], golds: Dict[str, List[str]],
          max_n: int = 4, sigma: float = 6.0) -> float:
    # document frequency over gold references
    df: List[Dict[tuple, float]] = [defaultdict(float) for _ in range(max_n)]
    for refs in golds.values():
        for n in range(max_n):
            seen = set()
            for r in refs:
                seen |= set(_ngrams(tokenize(r), n + 1).keys())
            for g in seen:
                df[n][g] += 1
    n_docs = max(len(golds), 1)

    def tfidf_vec(tokens, n):
        cnt = _ngrams(tokens, n + 1)
        total = max(sum(cnt.values()), 1)
        return {g: (c / total) * math.log(max(n_docs / max(df[n][g], 1.0), 1.0))
                for g, c in cnt.items()}

    def cos(v1, v2):
        num = sum(v1[g] * v2[g] for g in v1 if g in v2)
        d1 = math.sqrt(sum(x * x for x in v1.values()))
        d2 = math.sqrt(sum(x * x for x in v2.values()))
        return num / (d1 * d2) if d1 > 0 and d2 > 0 else 0.0

    scores = []
    for k, p in preds.items():
        pt = tokenize(p)
        refs = [tokenize(g) for g in golds.get(k, [])]
        if not refs:
            scores.append(0.0)
            continue
        s = 0.0
        for n in range(max_n):
            vp = tfidf_vec(pt, n)
            per_ref = []
            for r in refs:
                delta = abs(len(pt) - len(r))
                penalty = math.exp(-(delta ** 2) / (2 * sigma ** 2))
                per_ref.append(penalty * cos(vp, tfidf_vec(r, n)))
            s += sum(per_ref) / len(per_ref)
        scores.append(10.0 * s / max_n)
    return sum(scores) / max(len(scores), 1)


# ---------------------------------------------------------------------------
# METEOR (exact-match variant)
# ---------------------------------------------------------------------------

def meteor(preds: Dict[str, str], golds: Dict[str, List[str]],
           alpha: float = 0.9, beta: float = 3.0, gamma: float = 0.5) -> float:
    def single(pt: List[str], gt: List[str]) -> float:
        if not pt or not gt:
            return 0.0
        # greedy alignment on exact matches
        used = [False] * len(gt)
        align = []
        for i, w in enumerate(pt):
            for j, g in enumerate(gt):
                if not used[j] and w == g:
                    used[j] = True
                    align.append((i, j))
                    break
        m = len(align)
        if m == 0:
            return 0.0
        prec, rec = m / len(pt), m / len(gt)
        f = prec * rec / (alpha * prec + (1 - alpha) * rec)
        # chunks: contiguous in both
        chunks = 1
        for (i1, j1), (i2, j2) in zip(align, align[1:]):
            if not (i2 == i1 + 1 and j2 == j1 + 1):
                chunks += 1
        frag = chunks / m
        return f * (1 - gamma * frag ** beta)

    scores = []
    for k, p in preds.items():
        pt = tokenize(p)
        best = max((single(pt, tokenize(g)) for g in golds.get(k, [])),
                   default=0.0)
        scores.append(best)
    return sum(scores) / max(len(scores), 1)


def score_all(preds: Dict[str, str], golds: Dict[str, List[str]]
              ) -> Dict[str, float]:
    b = bleu(preds, golds)
    return {
        "EM": exact_match(preds, golds),
        "BLEU-1": b[0], "BLEU-2": b[1], "BLEU-3": b[2], "BLEU-4": b[3],
        # exact-token alignment, NOT pycocoevalcap METEOR (no stem/synonym/
        # paraphrase stages) — labeled so reports are not misread as
        # comparable to the reference's pycoco numbers
        "METEOR(exact)": meteor(preds, golds),
        "ROUGE-L": rouge_l(preds, golds),
        "CIDEr": cider(preds, golds),
    }
