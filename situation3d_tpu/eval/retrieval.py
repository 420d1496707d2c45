"""Image-text retrieval scoring: ITC ranking + ITM top-k rerank.

Re-implementation of ``Blip2Base.compute_sim_matrix``
(``3DLLM_BLIP2-base/lavis/models/blip2_models/blip2.py:109-210``) for the
stage-1 Blip2Qformer: encode every caption and every scene/image, rank by
max-over-queries ITC cosine similarity, then rescore each row's top
``k_test`` candidates with the (expensive) pairwise ITM head.

TPU-native differences from the reference:

- the per-row python loop with ``.topk`` + repeated single-row ITM batches
  becomes chunked, fixed-shape jitted calls — ``chunk`` rows of ``k_test``
  pairs each rerank in one ITM forward of batch ``chunk * k_test``;
- the NCCL rank-sharded loop + ``all_reduce(SUM)`` merge
  (blip2.py:168-208) becomes an optional ``(rank, world)`` row range with
  the same "-100 elsewhere, sum-merge" contract; on a mesh the caller
  merges with one ``psum`` / host allgather instead of barriers.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

FILL = -100.0


def _row_range(n: int, rank: int, world: int) -> Tuple[int, int]:
    """The reference's contiguous row split (blip2.py:170-173)."""
    step = n // world + 1
    start = rank * step
    return start, min(n, start + step)


def compute_sim_matrix(model, variables, image_embeds, image_mask,
                       text_ids, text_mask, k_test: int = 16,
                       encode_batch: int = 16, rerank_chunk: int = 4,
                       rank: int = 0, world: int = 1,
                       ) -> Tuple[np.ndarray, np.ndarray]:
    """Returns ``(score_i2t [Ni, Nt], score_t2i [Nt, Ni])`` numpy arrays.

    Rows outside this process's ``(rank, world)`` range are ``FILL``; with
    ``world > 1`` the caller sums the per-process results (the reference's
    ``all_reduce`` merge at blip2.py:202-205 — FILL rows add a constant
    offset there too; ranking is unaffected).
    """
    Ni, Nt = image_embeds.shape[0], text_ids.shape[0]
    k_test = min(k_test, Nt)

    proj = jax.jit(functools.partial(model.apply, variables,
                                     method=model.itc_projections))
    itm = jax.jit(functools.partial(model.apply, variables,
                                    method=model.compute_itm))

    # --- feature extraction, fixed-size batches (blip2.py:120-157) -------
    img_feats, txt_feats = [], []
    n = max(Ni, Nt)
    for s in range(0, n, encode_batch):
        ii = np.arange(s, s + encode_batch) % Ni
        ti = np.arange(s, s + encode_batch) % Nt
        f_img, f_txt = proj(image_embeds[ii], image_mask[ii],
                            text_ids[ti], text_mask[ti])
        if s < Ni:
            img_feats.append(np.asarray(f_img[: Ni - s]))
        if s < Nt:
            txt_feats.append(np.asarray(f_txt[: Nt - s]))
    img_feats = np.concatenate(img_feats)[:Ni]          # [Ni, Q, D]
    txt_feats = np.concatenate(txt_feats)[:Nt]          # [Nt, D]

    # ITC sims: max over query tokens (blip2.py:159-164)
    sims = np.einsum("iqd,td->iqt", img_feats, txt_feats).max(axis=1)

    def _rerank(sim_rows, row_ids, i2t: bool):
        """Rerank ``len(row_ids)`` rows' top-k columns with ITM."""
        out = np.full((len(row_ids), sim_rows.shape[1]), FILL, np.float32)
        for s in range(0, len(row_ids), rerank_chunk):
            rows = row_ids[s: s + rerank_chunk]
            pad = rerank_chunk - len(rows)
            rows_p = np.concatenate([rows, np.repeat(rows[-1:], pad)])
            sim_p = sim_rows[np.concatenate(
                [np.arange(s, s + len(rows)),
                 np.repeat([s + len(rows) - 1], pad)])]
            topk = np.argsort(-sim_p, axis=1)[:, :k_test]       # [R, k]
            if i2t:
                im = np.repeat(rows_p, k_test)                  # [R*k]
                tx = topk.reshape(-1)
            else:
                im = topk.reshape(-1)
                tx = np.repeat(rows_p, k_test)
            score = np.asarray(itm(
                image_embeds[im], image_mask[im],
                text_ids[tx], text_mask[tx])).reshape(-1, k_test)
            for r in range(len(rows)):
                out[s + r, topk[r]] = score[r] + sim_p[r, topk[r]]
        return out

    i0, i1 = _row_range(Ni, rank, world)
    t0, t1 = _row_range(Nt, rank, world)
    score_i2t = np.full((Ni, Nt), FILL, np.float32)
    score_t2i = np.full((Nt, Ni), FILL, np.float32)
    if i1 > i0:
        score_i2t[i0:i1] = _rerank(sims[i0:i1], np.arange(i0, i1), i2t=True)
    if t1 > t0:
        score_t2i[t0:t1] = _rerank(sims.T[t0:t1], np.arange(t0, t1),
                                   i2t=False)
    return score_i2t, score_t2i


def retrieval_metrics(scores_i2t: np.ndarray, scores_t2i: np.ndarray,
                      img2txt, txt2img) -> dict:
    """Recall@1/5/10 both directions from the score matrices
    (``lavis/tasks/retrieval.py:54-103`` _report_metrics). ``img2txt`` maps
    each image row to its list of matching text ids, ``txt2img`` each text
    row to its single image id."""
    ranks = np.zeros(scores_i2t.shape[0])
    for i, score in enumerate(scores_i2t):
        inds = np.argsort(score)[::-1]
        ranks[i] = min(np.where(inds == t)[0][0] for t in np.atleast_1d(
            img2txt[i]))
    tr1, tr5, tr10 = [100.0 * (ranks < k).mean() for k in (1, 5, 10)]

    ranks = np.zeros(scores_t2i.shape[0])
    for i, score in enumerate(scores_t2i):
        inds = np.argsort(score)[::-1]
        ranks[i] = np.where(inds == txt2img[i])[0][0]
    ir1, ir5, ir10 = [100.0 * (ranks < k).mean() for k in (1, 5, 10)]

    tr_mean = (tr1 + tr5 + tr10) / 3
    ir_mean = (ir1 + ir5 + ir10) / 3
    return {"txt_r1": tr1, "txt_r5": tr5, "txt_r10": tr10,
            "txt_r_mean": tr_mean, "img_r1": ir1, "img_r5": ir5,
            "img_r10": ir10, "img_r_mean": ir_mean,
            "r_mean": (tr_mean + ir_mean) / 2, "agg_metrics": tr_mean}
