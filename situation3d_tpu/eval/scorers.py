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
- METEOR (reported as ``METEOR(stem)``) aligns stage-wise like the METEOR
  1.5 jar — exact match first, then Porter-stem match (``porter_stem``
  below) — with the standard P/R harmonic mean (alpha=0.9) and chunk
  fragmentation penalty. The jar's third stage (WordNet synonym match)
  and its trained parameter set cannot exist offline; that residual
  deviation is documented at the METEOR implementation below.
- SPICE is emitted as an explicit ``None``: the reference's SPICE number
  comes from a Java scene-graph parser that cannot run here (offline,
  no JVM deps); a dependency-free proxy is reported separately as
  ``SPICE(proxy)`` and never under the plain SPICE key.
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
# Porter stemmer (Porter 1980, "An algorithm for suffix stripping") —
# self-contained, no nltk/WordNet data (unavailable offline)
# ---------------------------------------------------------------------------

_VOWELS = "aeiou"


def _is_cons(w: str, i: int) -> bool:
    c = w[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return i == 0 or not _is_cons(w, i - 1)
    return True


def _measure(w: str) -> int:
    """m = number of VC sequences in [C](VC)^m[V]."""
    m = 0
    prev_vowel = False
    for i in range(len(w)):
        cons = _is_cons(w, i)
        if prev_vowel and cons:
            m += 1
        prev_vowel = not cons
    return m


def _has_vowel(w: str) -> bool:
    return any(not _is_cons(w, i) for i in range(len(w)))


def _double_cons(w: str) -> bool:
    return len(w) >= 2 and w[-1] == w[-2] and _is_cons(w, len(w) - 1)


def _cvc(w: str) -> bool:
    """*o condition: stem ends cvc where the final c is not w, x or y."""
    return (len(w) >= 3 and _is_cons(w, len(w) - 3)
            and not _is_cons(w, len(w) - 2) and _is_cons(w, len(w) - 1)
            and w[-1] not in "wxy")


_STEP2 = (("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
          ("anci", "ance"), ("izer", "ize"), ("abli", "able"),
          ("alli", "al"), ("entli", "ent"), ("eli", "e"), ("ousli", "ous"),
          ("ization", "ize"), ("ation", "ate"), ("ator", "ate"),
          ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
          ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"),
          ("biliti", "ble"))
_STEP3 = (("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
          ("ical", "ic"), ("ful", ""), ("ness", ""))
_STEP4 = ("al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
          "ment", "ent", "ou", "ism", "ate", "iti", "ous", "ive", "ize")


def porter_stem(word: str) -> str:
    """Classic Porter stemmer. Verified against the published examples
    (tests/test_scorers_threedvqa.py)."""
    w = word.lower()
    if len(w) <= 2:
        return w

    # step 1a
    if w.endswith("sses") or w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("s") and not w.endswith("ss"):
        w = w[:-1]

    # step 1b
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    else:
        hit = None
        for suf in ("ed", "ing"):
            if w.endswith(suf) and _has_vowel(w[: -len(suf)]):
                hit = w[: -len(suf)]
                break
        if hit is not None:
            w = hit
            if w.endswith(("at", "bl", "iz")):
                w += "e"
            elif _double_cons(w) and w[-1] not in "lsz":
                w = w[:-1]
            elif _measure(w) == 1 and _cvc(w):
                w += "e"

    # step 1c
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"

    # step 2
    for suf, rep in _STEP2:
        if w.endswith(suf):
            if _measure(w[: -len(suf)]) > 0:
                w = w[: -len(suf)] + rep
            break

    # step 3
    for suf, rep in _STEP3:
        if w.endswith(suf):
            if _measure(w[: -len(suf)]) > 0:
                w = w[: -len(suf)] + rep
            break

    # step 4
    for suf in _STEP4:
        if w.endswith(suf):
            if _measure(w[: -len(suf)]) > 1:
                w = w[: -len(suf)]
            break
    else:
        if w.endswith("ion") and len(w) > 3 and w[-4] in "st" \
                and _measure(w[:-3]) > 1:
            w = w[:-3]

    # step 5a
    if w.endswith("e"):
        m = _measure(w[:-1])
        if m > 1 or (m == 1 and not _cvc(w[:-1])):
            w = w[:-1]

    # step 5b
    if _measure(w) > 1 and _double_cons(w) and w.endswith("l"):
        w = w[:-1]
    return w


# ---------------------------------------------------------------------------
# METEOR — exact + Porter-stem alignment stages with the fragmentation
# penalty (Banerjee & Lavie 2005). The reference shells out to the
# pycocoevalcap METEOR 1.5 jar, whose WordNet synonym stage and trained
# parameters are unavailable offline — labeled METEOR(stem), a documented
# deviation (exact + stem stages cover the bulk of the jar's alignments).
# ---------------------------------------------------------------------------

def meteor(preds: Dict[str, str], golds: Dict[str, List[str]],
           alpha: float = 0.9, beta: float = 3.0, gamma: float = 0.5) -> float:
    def align(pt: List[str], gt: List[str]) -> List[Tuple[int, int]]:
        """Stage-wise alignment: exact matches first, Porter-stem matches
        over the remainder. Within a stage, each pred word prefers the
        gold position adjacent to its left neighbor's match (fewer chunks
        — the jar resolves ties the same way via beam search), else the
        leftmost unused candidate."""
        used = [False] * len(gt)
        match: Dict[int, int] = {}
        for key in (lambda t: t, porter_stem):
            gkeys = [key(g) for g in gt]
            for i, w in enumerate(pt):
                if i in match:
                    continue
                wk = key(w)
                cands = [j for j in range(len(gt))
                         if not used[j] and gkeys[j] == wk]
                if not cands:
                    continue
                prev = match.get(i - 1)
                j = next((c for c in cands
                          if prev is not None and c == prev + 1), cands[0])
                used[j] = True
                match[i] = j
        return sorted(match.items())

    def single(pt: List[str], gt: List[str]) -> float:
        if not pt or not gt:
            return 0.0
        pairs = align(pt, gt)
        m = len(pairs)
        if m == 0:
            return 0.0
        prec, rec = m / len(pt), m / len(gt)
        f = prec * rec / (alpha * prec + (1 - alpha) * rec)
        # chunks: maximal runs contiguous in both sentences
        chunks = 1
        for (i1, j1), (i2, j2) in zip(pairs, pairs[1:]):
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


# ---------------------------------------------------------------------------
# SPICE(proxy) — dependency-free stand-in for the reference's SPICE score
# (calculate_score_3dllm.py:23,279 appends pycocoevalcap's (Spice(),"SPICE"),
# a Java scene-graph parser unavailable offline). The proxy extracts the
# same three tuple classes SPICE scores — objects, (object, attribute)
# pairs, (subject, relation, object) triples — by position/lexicon
# heuristics over Porter-stemmed tokens instead of a dependency parse,
# then takes the same bag-F1 against the union of the reference graphs.
# Reported ONLY under the "SPICE(proxy)" key so it is never mistaken for
# a jar-comparable number.
# ---------------------------------------------------------------------------

_SPICE_STOP = frozenset(
    "a an the is are was were be been being am do does did has have had "
    "it its this that these those there and or but if then so very really "
    "not no yes i you he she they we my your his her their our".split())
_SPICE_RELS = frozenset(
    "on in of at near next under above behind beside between with to over "
    "below by across along around inside outside front left right opposite "
    "facing towards toward against atop beneath".split())


def _spice_tuples(tokens: Sequence[str]) -> set:
    words = [porter_stem(t) for t in tokens]
    content = [t.isalnum() and t not in _SPICE_STOP and t not in _SPICE_RELS
               for t in tokens]
    tups = set()
    for i, w in enumerate(words):
        if content[i]:
            tups.add((w,))                       # object
    for i in range(len(tokens) - 1):
        if content[i] and content[i + 1]:
            tups.add((words[i + 1], words[i]))   # (head, modifier) pair
    for i, t in enumerate(tokens):
        if t in _SPICE_RELS:                     # (subj, rel, obj) triple
            left = next((words[j] for j in range(i - 1, -1, -1)
                         if content[j]), None)
            # object = HEAD of the following noun phrase: English NPs are
            # head-final, so take the last word of the first content run
            # ("near the wooden table" -> table, not wooden)
            right = None
            j = next((j for j in range(i + 1, len(tokens)) if content[j]),
                     None)
            if j is not None:
                while j + 1 < len(tokens) and content[j + 1]:
                    j += 1
                right = words[j]
            if left is not None and right is not None:
                tups.add((left, t, right))
    return tups


def spice_proxy(preds: Dict[str, str], golds: Dict[str, List[str]]) -> float:
    scores = []
    for k, p in preds.items():
        pt = _spice_tuples(tokenize(p))
        ref_graphs = [_spice_tuples(tokenize(g)) for g in golds.get(k, [])]
        gt = set().union(*ref_graphs) if ref_graphs else set()
        if not pt and not gt:
            scores.append(1.0)
            continue
        m = len(pt & gt)
        prec = m / len(pt) if pt else 0.0
        rec = m / len(gt) if gt else 0.0
        scores.append(2 * prec * rec / (prec + rec) if prec + rec else 0.0)
    return sum(scores) / max(len(scores), 1)


def score_all(preds: Dict[str, str], golds: Dict[str, List[str]]
              ) -> Dict[str, float]:
    b = bleu(preds, golds)
    return {
        "EM": exact_match(preds, golds),
        "BLEU-1": b[0], "BLEU-2": b[1], "BLEU-3": b[2], "BLEU-4": b[3],
        # exact + Porter-stem alignment, NOT the pycocoevalcap METEOR jar
        # (its WordNet synonym stage and trained parameters need offline-
        # unavailable data) — labeled so reports are not misread as
        # comparable to the reference's pycoco numbers
        "METEOR(stem)": meteor(preds, golds),
        "ROUGE-L": rouge_l(preds, golds),
        "CIDEr": cider(preds, golds),
        # SPICE (calculate_score_3dllm.py:23,279 appends (Spice(),"SPICE"))
        # requires the Stanford scene-graph parser — a Java toolchain +
        # model download that cannot exist in this zero-egress environment.
        # Reported as an explicit null, never a silent omission; the
        # closest self-contained stand-in is labeled separately.
        "SPICE": None,
        "SPICE(proxy)": spice_proxy(preds, golds),
    }
