"""Scorer + 3D-VQA data pipeline tests (reference:
calculate_scores/calculate_score_sqa3d.py, threedvqa_datasets.py)."""
import numpy as np

from situation3d_tpu.config import Blip2Config, QFormerConfig, T5Config
from situation3d_tpu.data.threedvqa import (clean_question, eval_batches,
                                            synthetic_threedvqa, train_batches)
from situation3d_tpu.eval.scorers import (bleu, cider, exact_match, meteor,
                                          rouge_l, score_all)
from situation3d_tpu.eval.sqa3d_scoring import (bucket_of, clean_answer,
                                                score_results)


def test_exact_match():
    preds = {"a": "chair", "b": "red table", "c": "no"}
    golds = {"a": ["chair", "sofa"], "b": ["table"], "c": ["yes"]}
    assert abs(exact_match(preds, golds) - 1 / 3) < 1e-9


def test_bleu_perfect_and_partial():
    preds = {"a": "the red chair next to the door"}
    golds = {"a": ["the red chair next to the door"]}
    b = bleu(preds, golds)
    assert all(abs(x - 1.0) < 1e-9 for x in b)
    preds2 = {"a": "the blue chair next to the door"}
    b2 = bleu(preds2, golds)
    assert 0 < b2[0] < 1.0


def test_rouge_meteor_cider_sane():
    preds = {"a": "a red chair", "b": "dog"}
    golds = {"a": ["a red chair near the door"], "b": ["cat"]}
    r = rouge_l(preds, golds)
    assert 0 < r < 1
    m = meteor(preds, golds)
    assert 0 < m < 1
    c = cider(preds, golds)
    assert c >= 0
    # identical corpus scores higher than mismatched
    same = {"a": "a red chair near the door", "b": "cat"}
    assert cider(same, golds) > c


def test_porter_stemmer_published_examples():
    """Full-pipeline outputs for the Porter-1980 paper examples (values
    match nltk's PorterStemmer in ORIGINAL_ALGORITHM mode)."""
    from situation3d_tpu.eval.scorers import porter_stem
    vectors = {
        "caresses": "caress", "ponies": "poni", "cats": "cat",
        "feed": "feed", "agreed": "agre", "plastered": "plaster",
        "motoring": "motor", "sing": "sing", "running": "run",
        "hopping": "hop", "tanned": "tan", "falling": "fall",
        "hissing": "hiss", "failing": "fail", "happy": "happi",
        "sky": "sky", "generalization": "gener", "oscillators": "oscil",
        "conditional": "condit", "rational": "ration",
        "adjustable": "adjust", "adoption": "adopt", "formative": "form",
        "electrical": "electr", "hopefulness": "hope", "roll": "roll",
        "controlled": "control", "chairs": "chair", "tables": "tabl",
    }
    for word, want in vectors.items():
        assert porter_stem(word) == want, (word, porter_stem(word), want)


def test_meteor_stem_alignment_hand_computed():
    """METEOR with exact+stem stages: pred 'the cats are running' vs gold
    'the cat runs quickly' — exact match {the}, stem matches {cats~cat,
    running~runs}; m=3, P=R=3/4, F=0.75, 2 chunks, frag penalty
    0.5*(2/3)^3 -> score 0.75 * 23/27."""
    preds = {"a": "the cats are running"}
    golds = {"a": ["the cat runs quickly"]}
    want = 0.75 * (1 - 0.5 * (2 / 3) ** 3)
    assert abs(meteor(preds, golds) - want) < 1e-9
    # exact-identical sentence: perfect alignment, one chunk
    same = {"a": "the cat runs quickly"}
    want_same = 1.0 * (1 - 0.5 * (1 / 4) ** 3)
    assert abs(meteor(same, golds) - want_same) < 1e-9
    # stems must not create false matches
    miss = {"a": "blue window"}
    assert meteor(miss, golds) == 0.0


def test_score_all_full_reference_schema():
    """score_all emits the reference's published-score schema
    (calculate_score_sqa3d.py:268-305): BLEU1-4, METEOR (stem-labeled),
    ROUGE-L, CIDEr, and an explicit SPICE null (the Java scene-graph
    parser cannot exist offline — documented, not silent)."""
    preds = {"a": "chair"}
    golds = {"a": ["chair"]}
    out = score_all(preds, golds)
    for k in ("EM", "BLEU-1", "BLEU-2", "BLEU-3", "BLEU-4", "METEOR(stem)",
              "ROUGE-L", "CIDEr", "SPICE", "SPICE(proxy)"):
        assert k in out
    assert out["SPICE"] is None
    assert out["SPICE(proxy)"] == 1.0  # identical single-object graphs
    # single-word perfect match: chunks/m = 1 -> penalty gamma*1^beta = 0.5
    # (the real METEOR jar scores this 0.5 too)
    assert out["METEOR(stem)"] == 0.5


def test_spice_proxy_tuple_extraction_and_f1():
    """SPICE(proxy): objects / attribute pairs / relation triples from
    lexicon+position heuristics, bag-F1 vs the union of reference graphs
    (the reference's SPICE is pycocoevalcap's Java parser,
    calculate_score_3dllm.py:23,279 — proxy is labeled, never 'SPICE')."""
    from situation3d_tpu.eval.scorers import _spice_tuples, spice_proxy

    t = _spice_tuples("the red chair near the wooden table".split())
    assert ("chair",) in t and ("tabl",) in t          # objects (stemmed)
    assert ("chair", "red") in t                        # attribute pair
    assert ("tabl", "wooden") in t
    assert ("chair", "near", "tabl") in t               # relation triple
    # stopwords/relations never become objects
    assert ("the",) not in t and ("near",) not in t

    # identical sentence -> F1 1.0; disjoint -> 0.0
    golds = {"a": ["the red chair near the wooden table"]}
    assert spice_proxy({"a": "the red chair near the wooden table"},
                       golds) == 1.0
    assert spice_proxy({"a": "blue window"}, golds) == 0.0
    # partial: pred 'red chair' -> tuples {(chair,),(red... pair),(red,)}
    # vs gold graph; F1 strictly between
    part = spice_proxy({"a": "red chair"}, golds)
    assert 0.0 < part < 1.0
    # union over multiple references
    golds2 = {"a": ["a chair", "a table"]}
    assert spice_proxy({"a": "chair table"}, golds2) > 0.0
    # empty pred and empty gold -> 1.0 (both graphs empty)
    assert spice_proxy({"a": "the of"}, {"a": ["is the"]}) == 1.0


def test_clean_answer_and_buckets():
    assert clean_answer("<pad> chair</s>") == "chair"
    assert bucket_of("What color is it") == "What"
    assert bucket_of("describe this") == "Other"


def test_score_results_buckets():
    preds = {"q1": "chair", "q2": "<pad>two</s>"}
    golds = {"q1": ["chair"], "q2": ["three"]}
    questions = {"q1": "What is it", "q2": "How many windows"}
    out = score_results(preds, golds, questions)
    assert out["All"]["EM"] == 0.5
    assert out["What"]["EM"] == 1.0
    assert out["How"]["EM"] == 0.0
    assert out["All"]["count"] == 2


def _tiny_blip2_cfg():
    return Blip2Config(
        qformer=QFormerConfig(num_query_tokens=4, hidden_size=32, num_layers=2,
                              num_heads=4, intermediate_size=64,
                              encoder_width=48, scene_token_capacity=64),
        t5=T5Config(vocab_size=256, d_model=32, d_kv=8, d_ff=64, num_layers=1,
                    num_decoder_layers=1, num_heads=4, max_answer_len=8),
        pc_feat_dim=48, max_txt_len=16)


def test_clean_question():
    assert clean_question("What IS this?!") == "what is this?"
    assert clean_question("a-b/c") == "a b c"


def test_threedvqa_batches():
    cfg = _tiny_blip2_cfg()
    ds = synthetic_threedvqa(cfg, n_scenes=2, per_scene=3, n_points=100)
    # train pairs expand by n_answers: scenes*3 questions, alternating 1/2 answers
    pairs = ds.train_pairs()
    assert len(pairs) == 2 * (1 + 2 + 1)
    b = next(train_batches(ds, 4, seed=0))
    assert b["pc_feat"].shape == (4, 64, 48)
    assert b["pc_mask"].sum(1).tolist() == [64] * 4  # 100 pts subsampled to 64
    assert b["labels"].shape == (4, 8)
    assert b["label_mask"].max() == 1

    ev = list(eval_batches(ds, 4))
    assert ev[-1]["sample_valid"].sum() == len(ds) % 4 or ev[-1]["sample_valid"].all()


def test_threedvqa_padding_under_capacity():
    cfg = _tiny_blip2_cfg()
    ds = synthetic_threedvqa(cfg, n_scenes=1, per_scene=1, n_points=20)
    s = ds.sample(0)
    assert s["pc_mask"].sum() == 20
    np.testing.assert_allclose(s["pc_feat"][20:], 0)
