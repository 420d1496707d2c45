"""Vendored-LAVIS-surface completeness (VERDICT r2 missing #1/#2/#3):
Blip2ITM wrapper (``blip2_image_text_matching.py:15-108``), the remaining
task analogues — dialogue (``tasks/dialogue.py:21-64``),
multimodal_classification (``:20-79``), vqa_reading_comprehension
(``:22-162``) — the ScanQA score-script variant
(``calculate_score_scanqa.py``), and the two remaining recipe yamls."""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from situation3d_tpu.config import Config, apply_overrides, load_config
from situation3d_tpu.utils.registry import registry

from tests.test_blip2_qformer import make_batch, tiny_qcfg
from tests.test_blip2_trainer import tiny_cfg as tiny_blip2_cfg


# ---------------------------------------------------------------------------
# Blip2ITM
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def itm_setup():
    from situation3d_tpu.models.blip2_qformer import Blip2ITM, Blip2Qformer
    cfg = tiny_qcfg()
    rng = np.random.RandomState(0)
    batch = make_batch(rng, cfg=cfg)
    stage1 = Blip2Qformer(cfg)
    variables = stage1.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        batch)
    itm = Blip2ITM(cfg)
    return dict(cfg=cfg, batch=batch, stage1=stage1, itm=itm,
                variables={"params": variables["params"]})


def test_blip2_itm_registered():
    from situation3d_tpu.models.blip2_qformer import Blip2ITM
    assert registry.get_model("blip2_image_text_matching") is Blip2ITM


def test_itm_head_matches_stage1(itm_setup):
    """Blip2ITM shares the stage-1 parameter structure: its 2-way ITM
    logits' positive column equals Blip2Qformer.compute_itm on the same
    weights (blip2_image_text_matching.py:69-85 reuses Qformer.bert)."""
    from situation3d_tpu.models.blip2_qformer import Blip2Qformer
    cfg, batch, v = itm_setup["cfg"], itm_setup["batch"], itm_setup["variables"]
    logits = itm_setup["itm"].apply(v, batch, match_head="itm")
    assert logits.shape == (batch["text_ids"].shape[0], 2)
    pos = itm_setup["stage1"].apply(
        v, batch["image_embeds"], batch["image_mask"],
        batch["text_ids"], batch["text_mask"],
        method=Blip2Qformer.compute_itm)
    np.testing.assert_allclose(np.asarray(logits[:, 1]), np.asarray(pos),
                               atol=1e-5)


def test_itc_head_range_and_consistency(itm_setup):
    """match_head='itc' (:87-108): max-over-queries cosine sim in [-1, 1],
    equal to the max of the itc_projections similarity rows."""
    from situation3d_tpu.models.blip2_qformer import Blip2Qformer
    batch, v = itm_setup["batch"], itm_setup["variables"]
    sim = itm_setup["itm"].apply(v, batch, match_head="itc")
    assert sim.shape == (batch["text_ids"].shape[0],)
    assert (np.abs(np.asarray(sim)) <= 1.0 + 1e-5).all()
    img, txt = itm_setup["stage1"].apply(
        v, batch["image_embeds"], batch["image_mask"],
        batch["text_ids"], batch["text_mask"],
        method=Blip2Qformer.itc_projections)
    want = np.einsum("bqd,bd->bq", np.asarray(img), np.asarray(txt)).max(1)
    np.testing.assert_allclose(np.asarray(sim), want, atol=1e-5)


def test_itm_bad_head_raises(itm_setup):
    with pytest.raises(ValueError):
        itm_setup["itm"].apply(itm_setup["variables"], itm_setup["batch"],
                               match_head="nope")


# ---------------------------------------------------------------------------
# ScanQA scorer
# ---------------------------------------------------------------------------

def test_scanqa_clean_answer():
    from situation3d_tpu.eval.sqa3d_scoring import clean_answer_scanqa
    assert clean_answer_scanqa(" <pad>brown, table</s>\nextra line ") == \
        "brown table"
    # no lowercasing in the ScanQA script (unlike the SQA3D one)
    assert clean_answer_scanqa("Brown Table") == "Brown Table"


def test_scanqa_unigram_f_value():
    from situation3d_tpu.eval.sqa3d_scoring import unigram_f_value
    # identical -> 1; disjoint -> 0
    assert unigram_f_value("brown table", "brown table") == 1.0
    assert unigram_f_value("red chair", "blue door") == 0.0
    # plural lemma folding: "tables" ~ "table"
    assert unigram_f_value("brown tables", "brown table") == 1.0
    # half overlap: P=1/2, R=1/2 -> F=1/2
    assert unigram_f_value("brown table", "brown door") == pytest.approx(0.5)


def test_scanqa_buckets():
    from situation3d_tpu.eval.sqa3d_scoring import scanqa_bucket_of
    assert scanqa_bucket_of("Where is the chair?") == "Place"
    assert scanqa_bucket_of("How many chairs?") == "Number"
    assert scanqa_bucket_of("What color is the sofa?") == "Color"
    assert scanqa_bucket_of("What is the color of the bed?") == "Color"
    assert scanqa_bucket_of("What shape is the table?") == "Object nature"
    assert scanqa_bucket_of("What kind of room is this?") == "Object nature"
    assert scanqa_bucket_of("What is under the desk?") == "Object"
    assert scanqa_bucket_of("Which direction?") == "Other"


def test_scanqa_score_results():
    from situation3d_tpu.eval.sqa3d_scoring import (SCANQA_BUCKETS,
                                                    score_results_scanqa)
    preds = {"0": "brown table</s>", "1": "red chair", "2": "two"}
    golds = {"0": ["brown table"], "1": ["blue chair", "green chair"],
             "2": ["three"]}
    questions = {"0": "What is next to the bed?",
                 "1": "What color is the chair?",
                 "2": "How many lamps are there?"}
    out = score_results_scanqa(preds, golds, questions)
    assert set(out) == {"All"}                      # reference QT=['All']
    assert out["All"]["Top1 (EM)"] == pytest.approx(100.0 / 3)
    assert out["All"]["count"] == 3
    # F-value: q0 exact=1, q1 "red chair" vs "blue chair" P=R=1/2 -> .5
    # (vs "green chair" also .5), q2 0 -> mean = .5
    assert out["All"]["Top1 (F-value)"] == pytest.approx(50.0)
    full = score_results_scanqa(preds, golds, questions,
                                buckets=SCANQA_BUCKETS)
    assert full["Color"]["count"] == 1
    assert full["Number"]["Top1 (EM)"] == 0.0


def test_3dmvvqa_and_3dllm_score_variants():
    from situation3d_tpu.eval.sqa3d_scoring import (score_results_3dllm,
                                                    score_results_3dmvvqa)
    preds = {"0": "tables", "1": "red chair", "2": "two"}
    golds = {"0": ["table"], "1": ["blue chair"], "2": ["three"]}
    # 3DMV-VQA: bucket by the record's integer `type` field
    out = score_results_3dmvvqa(preds, golds,
                                qtypes={"0": 1, "1": 1, "2": 3})
    assert out["All"]["count"] == 3
    assert out["1"]["count"] == 2 and out["3"]["count"] == 1
    assert "2" not in out                       # empty bucket dropped
    # lemmatized: "tables" ~ "table" -> F=1 in bucket 1 with q1's .5
    assert out["1"]["Top1 (F-value)"] == pytest.approx(75.0)
    # 3DLLM: no lemmatizer -> "tables" vs "table" no longer matches
    raw = score_results_3dllm(preds, golds)
    assert set(raw) == {"All"}
    assert raw["All"]["Top1 (F-value)"] == pytest.approx(100.0 / 6)


def test_scanqa_merge_rank_results(tmp_path):
    from situation3d_tpu.eval.sqa3d_scoring import merge_rank_results
    # rank10 must sort after rank2 (numeric, not lexicographic)
    for rank, recs in [(2, [{"question_id": 1, "answer": "a"}]),
                       (10, [{"question_id": 2, "answer": "b"},
                             {"question_id": 1, "answer": "override"}])]:
        with open(tmp_path / f"val_3_vqa_result_rank{rank}.json", "w") as fh:
            json.dump(recs, fh)
    (tmp_path / "val_2_vqa_result_rank0.json").write_text("[]")  # other epoch
    preds = merge_rank_results(str(tmp_path), "val", 3)
    assert preds == {"1": "override", "2": "b"}  # later rank wins


# ---------------------------------------------------------------------------
# Task analogues
# ---------------------------------------------------------------------------

def test_dialogue_task(tmp_path):
    from situation3d_tpu.data.threedvqa import train_batches
    from situation3d_tpu.train.tasks import DialogueTask, setup_task
    cfg = tiny_blip2_cfg(tmp_path)
    task = setup_task("dialogue", cfg, synthetic=True)
    assert isinstance(task, DialogueTask)
    ds = task.build_datasets()["val"]
    model = task.build_model()
    batch = next(train_batches(ds, cfg.train.batch_size, seed=0))
    params = task.init_params(model, batch)
    losses = [task.valid_step(model, {"params": params}, batch)]
    metrics = task.after_evaluation(losses)
    assert np.isfinite(metrics["agg_metrics"])
    assert metrics["agg_metrics"] == pytest.approx(losses[0])


def test_multimodal_classification_task():
    from situation3d_tpu.data.sqa3d import batch_iterator
    from situation3d_tpu.data.synthetic import make_synthetic_dataset
    from situation3d_tpu.train.tasks import (MultimodalClassificationTask,
                                             setup_task)
    from tests.test_trainer_multichip import tiny_cfg
    cfg = tiny_cfg(["train.batch_size=4"])
    task = setup_task("multimodal_classification", cfg, synthetic=True)
    assert isinstance(task, MultimodalClassificationTask)
    ds = make_synthetic_dataset(cfg, n_scenes=1, per_scene=4, n_points=1500)
    model = task.build_model()
    batch = next(batch_iterator(ds, 4, shuffle=False))
    clean = task.clean_batch(batch)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        {k: jnp.asarray(v) for k, v in clean.items()})
    results = task.valid_step(model, variables, batch)
    assert len(results) == 4
    assert all(set(r) == {"question_id", "prediction", "target"}
               for r in results)
    # duplicate-id dedup (save_result remove_duplicate semantics)
    metrics = task.after_evaluation(results + results)
    assert 0.0 <= metrics["acc"] <= 1.0
    want = np.mean([r["prediction"] == r["target"] for r in results])
    assert metrics["acc"] == pytest.approx(want)


def test_vqa_rc_task(tmp_path):
    from situation3d_tpu.data.threedvqa import eval_batches, gold_answers
    from situation3d_tpu.train.tasks import VQARCTask, setup_task
    cfg = tiny_blip2_cfg(tmp_path)
    task = setup_task("vqa_reading_comprehension", cfg, synthetic=True,
                      num_beams=2, max_len=4)
    assert isinstance(task, VQARCTask)
    ds = task.build_datasets()["val"]
    model = task.build_model()
    batch = next(eval_batches(ds, cfg.train.batch_size))
    params = task.init_params(
        model, {**batch, "labels": batch["input_ids"][:, :4],
                "label_mask": batch["input_mask"][:, :4]})
    results = task.valid_step(model, {"params": params}, batch,
                              decode_fn=ds.text.decode)
    assert len(results) == cfg.train.batch_size
    assert all(isinstance(r["answer"], str) for r in results)
    golds = {str(k): v for k, v in gold_answers(ds)[0].items()}
    metrics = task.after_evaluation(results, golds)
    assert 0.0 <= metrics["EM"] <= 1.0


# ---------------------------------------------------------------------------
# Score CLI (calculate_score_*.py executables)
# ---------------------------------------------------------------------------

def test_score_cli_variants(tmp_path):
    from situation3d_tpu.cli import score as score_cli
    results = [{"question_id": "0", "answer": "brown table</s>"},
               {"question_id": "1", "answer": "red chair"}]
    golds = [{"question_id": "0", "answers": ["brown table"],
              "question": "What is next to the bed?", "type": 1},
             {"question_id": "1", "answers": ["blue chair"],
              "question": "What color is the chair?", "type": 2}]
    rpath, gpath = tmp_path / "res.json", tmp_path / "golds.json"
    rpath.write_text(json.dumps(results))
    gpath.write_text(json.dumps(golds))
    out = score_cli.main(["--variant", "scanqa", "--results", str(rpath),
                          "--golds", str(gpath),
                          "--output", str(tmp_path / "m.json")])
    assert out["All"]["Top1 (EM)"] == pytest.approx(50.0)
    assert json.load(open(tmp_path / "m.json"))["All"]["count"] == 2
    out = score_cli.main(["--variant", "3dmvvqa", "--results", str(rpath),
                          "--golds", str(gpath), "--all-buckets"])
    assert out["1"]["count"] == 1 and out["2"]["count"] == 1
    out = score_cli.main(["--variant", "sqa3d", "--results", str(rpath),
                          "--golds", str(gpath)])
    assert "All" in out
    # rank-sharded directory input
    shard_dir = tmp_path / "result"
    shard_dir.mkdir()
    (shard_dir / "test_0_vqa_result_rank0.json").write_text(
        json.dumps(results[:1]))
    (shard_dir / "test_0_vqa_result_rank1.json").write_text(
        json.dumps(results[1:]))
    out = score_cli.main(["--variant", "3dllm", "--results", str(shard_dir),
                          "--golds", str(gpath)])
    assert out["All"]["count"] == 2


# ---------------------------------------------------------------------------
# Train-CLI routing for the new tasks
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("task", ["dialogue", "vqa_reading_comprehension"])
def test_train_cli_new_tasks(tmp_path, task):
    """--task {dialogue,vqa_reading_comprehension} ride the 3d_vqa training
    loop with their own final-eval path (loss mean / generation EM)."""
    from tests.test_blip2_trainer import TINY_BLIP2_OPTS
    from situation3d_tpu.cli import train as train_cli
    out = str(tmp_path / "run")
    train_cli.main([
        "--task", task, "--synthetic", "--max-steps", "2", "--output", out,
        "--options", *TINY_BLIP2_OPTS,
        f"train.ckpt_dir={tmp_path}/ckpt", "train.val_every_steps=1000",
        f"log.log_dir={tmp_path}/logs",
    ])
    assert os.path.exists(os.path.join(out, "config.yaml"))


# ---------------------------------------------------------------------------
# Recipe yamls
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("path,checks", [
    ("configs/evaluate_scanqa_blip2.yaml",
     {("eval", "max_gen_len"): 40, ("eval", "batch_size"): 4}),
    ("configs/finetune_3dmvvqa_blip2.yaml",
     {("train", "batch_size"): 2, ("train", "epochs"): 100,
      ("train", "lr"): 1e-4,
      ("blip2", "freeze_t5_except_embeddings"): True}),
])
def test_recipe_yamls_load(path, checks):
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = load_config(os.path.join(root, path), [])
    for (section, key), want in checks.items():
        assert getattr(getattr(cfg, section), key) == want, (section, key)
