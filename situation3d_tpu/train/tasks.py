"""Task registry: wiring datasets + models + trainers per task.

The unified replacement for the LAVIS task layer (``lavis/tasks/base_task.py``
``setup_task``/``build_model``/``build_datasets`` and ``ThreeDVQATask``,
``vqa.py:227-229``) and the SIG3D train-CLI wiring
(``situation3d/train/train.py`` get_dataloader/get_model/get_solver).
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from situation3d_tpu.config import Config
from situation3d_tpu.utils.registry import registry


@registry.register_task("sqa3d")
class SQA3DTask:
    """Situated QA with the SIG3D model (the reference's main stack)."""

    def __init__(self, cfg: Config, synthetic: bool = False):
        self.cfg = cfg
        self.synthetic = synthetic

    def build_datasets(self):
        from situation3d_tpu.data.sqa3d import SQA3DDataset
        from situation3d_tpu.data.synthetic import make_synthetic_dataset
        from situation3d_tpu.data.vocab import (build_answer_vocab,
                                                load_answer_counter)

        if self.synthetic or not os.path.exists(self.cfg.data.sqa_train):
            train = make_synthetic_dataset(self.cfg, n_scenes=2, per_scene=16)
            val = make_synthetic_dataset(self.cfg, n_scenes=1, per_scene=8,
                                         split="val", seed=1)
            return {"train": train, "val": val}
        counter = load_answer_counter(self.cfg.data.answer_counter)
        vocab = build_answer_vocab(counter, self.cfg.data.answer_min_freq,
                                   self.cfg.data.num_answers)
        return {
            split: SQA3DDataset(self.cfg, split, vocab, counter)
            for split in ("train", "val")
        }

    def build_model(self, num_answers: Optional[int] = None):
        from situation3d_tpu.models.sig3d import SIG3D
        return SIG3D(self.cfg, num_answers or self.cfg.data.num_answers,
                     dtype=jnp.bfloat16 if self.cfg.train.bf16 else jnp.float32)

    def build_trainer(self, model, example_batch, steps_per_epoch, log_fn=None):
        from situation3d_tpu.train.trainer import Trainer
        return Trainer(self.cfg, model, steps_per_epoch,
                       example_batch=example_batch, log_fn=log_fn)

    def clean_batch(self, batch: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
        drop = {"question_id", "answer_cats", "voxel_labels"}
        if self.cfg.loss.answer_loss != "ce":
            drop.add("answer_cat")  # integer target only needed for CE
        return {k: v for k, v in batch.items() if k not in drop}


@registry.register_task("3d_vqa")
class ThreeDVQATask:
    """Generative 3D QA with Blip2T5 (the reference's 3DLLM stack,
    registered '3d_vqa' like lavis)."""

    def __init__(self, cfg: Config, synthetic: bool = False):
        self.cfg = cfg
        self.synthetic = synthetic

    def build_datasets(self, records_path: Optional[str] = None,
                       feature_dir: Optional[str] = None):
        from situation3d_tpu.data.threedvqa import (ThreeDVQADataset,
                                                    synthetic_threedvqa)
        if self.synthetic or records_path is None:
            return {
                "train": synthetic_threedvqa(self.cfg.blip2, 2, 8),
                "val": synthetic_threedvqa(self.cfg.blip2, 1, 4, seed=1),
            }
        with open(records_path) as fh:
            records = json.load(fh)
        ds = ThreeDVQADataset(self.cfg.blip2, records, feature_dir=feature_dir)
        return {"train": ds, "val": ds}

    def build_model(self):
        from situation3d_tpu.models.blip2_t5 import Blip2T5
        return Blip2T5(self.cfg.blip2,
                       dtype=jnp.bfloat16 if self.cfg.train.bf16 else jnp.float32)

    def init_params(self, model, example_batch, seed: int = 0):
        batch = {k: jnp.asarray(v) for k, v in example_batch.items()
                 if k != "question_id"}
        return jax.jit(lambda b: model.init(jax.random.PRNGKey(seed), b))(
            batch)["params"]


@registry.register_task("captioning")
class CaptionTask(ThreeDVQATask):
    """Scene captioning with Blip2T5 (``lavis/tasks/captioning.py:17-80``):
    generation without a question prompt, scored by the pycoco-style
    scorers (BLEU/ROUGE-L/CIDEr, eval/scorers.score_all) instead of EM.

    Caption records reuse the 3d_vqa schema with the caption as the single
    answer and an empty question; the prompt template collapses to "".
    """

    def __init__(self, cfg: Config, synthetic: bool = False):
        import dataclasses
        cfg = dataclasses.replace(
            cfg, blip2=dataclasses.replace(cfg.blip2, prompt="{}"))
        super().__init__(cfg, synthetic=synthetic)

    @staticmethod
    def report_metrics(preds: Dict[str, str], golds) -> Dict[str, float]:
        from situation3d_tpu.eval.scorers import score_all
        return score_all(preds, golds)


@registry.register_task("retrieval")
class RetrievalTask:
    """Scene-text retrieval with the stage-1 Blip2Qformer
    (``lavis/tasks/retrieval.py:21-103``): ITC ranking + ITM rerank via
    eval/retrieval.compute_sim_matrix, recall@k report."""

    def __init__(self, cfg: Config, synthetic: bool = False, k_test: int = 16):
        self.cfg = cfg
        self.synthetic = synthetic
        self.k_test = k_test

    def build_model(self):
        from situation3d_tpu.models.blip2_qformer import Blip2Qformer
        return Blip2Qformer(
            self.cfg.blip2.qformer,
            dtype=jnp.bfloat16 if self.cfg.train.bf16 else jnp.float32)

    def evaluation(self, model, variables, image_embeds, image_mask,
                   text_ids, text_mask, img2txt, txt2img,
                   rank: int = 0, world: int = 1) -> Dict[str, float]:
        from situation3d_tpu.eval.retrieval import (compute_sim_matrix,
                                                    retrieval_metrics)
        i2t, t2i = compute_sim_matrix(
            model, variables, image_embeds, image_mask, text_ids, text_mask,
            k_test=self.k_test, rank=rank, world=world)
        return retrieval_metrics(i2t, t2i, img2txt, txt2img)


@registry.register_task("dialogue")
class DialogueTask(ThreeDVQATask):
    """Dialogue finetuning task (``lavis/tasks/dialogue.py:21-64``,
    DialogueTask): validation is *loss-based* — ``valid_step`` returns the
    model's LM loss on each batch and ``after_evaluation`` aggregates the
    mean as ``agg_metrics`` (the reference's pycoco/COCO-download report
    path is dead code behind ``report_metric`` and never runs offline).
    Dialogue turns ride the 3d_vqa record schema: the concatenated history
    is the question, the reply the answer."""

    def valid_step(self, model, variables, batch) -> float:
        batch = {k: jnp.asarray(v) for k, v in batch.items()
                 if k != "question_id"}
        out = model.apply(variables, batch)
        loss = out["loss"] if isinstance(out, dict) else out
        return float(jax.device_get(loss))

    @staticmethod
    def after_evaluation(losses) -> Dict[str, float]:
        m = float(np.mean(losses)) if len(losses) else 0.0
        return {"agg_metrics": m, "loss": m}


@registry.register_task("multimodal_classification")
class MultimodalClassificationTask(SQA3DTask):
    """Closed-vocabulary classification task
    (``lavis/tasks/multimodal_classification.py:20-79``): ``valid_step``
    records {id, prediction, target} from the model's class logits
    (SIG3D's answer head is the 3D instance), ``after_evaluation``
    deduplicates by instance id and reports accuracy as ``agg_metrics``."""

    inst_id_key = "question_id"

    def valid_step(self, model, variables, batch, rng=None) -> list:
        clean = {k: jnp.asarray(v) for k, v in batch.items()
                 if k not in ("question_id", "answer_cat", "answer_cats",
                              "voxel_labels")}
        out = model.apply(variables, clean, train=False,
                          rngs={"sample": rng if rng is not None
                                else jax.random.PRNGKey(0)})
        logits = out["answer_scores"] if isinstance(out, dict) else out
        preds = np.asarray(jax.device_get(jnp.argmax(logits, axis=-1)))
        targets = np.asarray(batch["answer_cat"]).reshape(-1)
        ids = np.asarray(batch[self.inst_id_key]).reshape(-1)
        return [{self.inst_id_key: i.item() if hasattr(i, "item") else i,
                 "prediction": int(p), "target": int(t)}
                for i, p, t in zip(ids, preds, targets)]

    @staticmethod
    def after_evaluation(results) -> Dict[str, float]:
        seen: Dict[int, Dict] = {}
        for r in results:   # remove_duplicate=inst_id_key (save_result)
            seen.setdefault(r["question_id"], r)
        if not seen:
            return {"agg_metrics": 0.0, "acc": 0.0}
        acc = float(np.mean([r["prediction"] == r["target"]
                             for r in seen.values()]))
        return {"agg_metrics": acc, "acc": acc}


@registry.register_task("vqa_reading_comprehension")
class VQARCTask(ThreeDVQATask):
    """Reading-comprehension VQA (``lavis/tasks/
    vqa_reading_comprehension.py:22-162``, VQARCTask): generation-based
    QA with the full decoding-knob surface (num_beams / max_len / min_len /
    top_k / top_p / repetition_penalty). The reference's caption+gradcam
    FiD stage is BLIP-1 machinery (model.predict_answers with
    num_captions/block_num); the TPU analogue decodes directly from the
    scene-conditioned encoder with the same knobs."""

    def __init__(self, cfg: Config, synthetic: bool = False,
                 num_beams: int = 3, max_len: int = 10, min_len: int = 1,
                 top_p: float = 0.9, repetition_penalty: float = 1.0,
                 use_nucleus_sampling: bool = False):
        super().__init__(cfg, synthetic=synthetic)
        self.num_beams = num_beams
        self.max_len = max_len
        self.min_len = min_len
        self.top_p = top_p
        self.repetition_penalty = repetition_penalty
        self.use_nucleus_sampling = use_nucleus_sampling

    def valid_step(self, model, variables, batch, decode_fn=None,
                   rng=None) -> list:
        from situation3d_tpu.models.blip2_t5 import generate
        clean = {k: jnp.asarray(v) for k, v in batch.items()
                 if k not in ("question_id", "labels", "label_mask")}
        tokens = generate(
            model, variables, clean,
            use_nucleus_sampling=self.use_nucleus_sampling,
            num_beams=self.num_beams, max_length=self.max_len,
            min_length=self.min_len, top_p=self.top_p,
            repetition_penalty=self.repetition_penalty, rng=rng)
        tokens = np.asarray(jax.device_get(tokens))
        decode = decode_fn or (lambda t: " ".join(map(str, t)))
        qids = np.asarray(batch["question_id"]).reshape(-1)
        return [{"question_id": str(q), "answer": decode(list(t))}
                for q, t in zip(qids, tokens)]

    @staticmethod
    def after_evaluation(results, golds: Dict[str, list]) -> Dict[str, float]:
        from situation3d_tpu.eval.scorers import exact_match
        preds = {str(r["question_id"]): r["answer"] for r in results}
        em = exact_match(preds, {str(k): v for k, v in golds.items()})
        return {"agg_metrics": em, "EM": em}


def setup_task(name: str, cfg: Config, **kwargs):
    return registry.get_task(name)(cfg, **kwargs)
