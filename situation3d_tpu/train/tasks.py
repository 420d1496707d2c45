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


def setup_task(name: str, cfg: Config, **kwargs):
    return registry.get_task(name)(cfg, **kwargs)
