"""Evaluation entry point.

Replaces ``situation3d/eval/eval.py`` (SQA3D QA accuracy + situation metrics
+ optional segmentation mIoU + visualization export) and
``3DLLM_BLIP2-base/evaluate.py`` + the offline
``calculate_scores/calculate_score_sqa3d.py`` flow (generation + EM/BLEU/
METEOR/ROUGE-L/CIDEr with question-type buckets).
"""
from __future__ import annotations

import argparse
import json
import os

from situation3d_tpu.config import load_config
from situation3d_tpu.train.tasks import setup_task
from situation3d_tpu.utils.misc import set_seed, setup_logger


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="situation3d_tpu evaluator")
    p.add_argument("--task", choices=["sqa3d", "3d_vqa"], default="sqa3d")
    p.add_argument("--config", default=None)
    p.add_argument("--options", nargs="*", default=[])
    p.add_argument("--checkpoint", default=None, help="orbax checkpoint dir")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--split", default="val")
    p.add_argument("--output", default="outputs/eval")
    p.add_argument("--visualize", action="store_true",
                   help="export PLY/OBJ scene visualizations")
    return p.parse_args(argv)


def main(argv=None) -> None:
    args = parse_args(argv)
    logger = setup_logger()
    cfg = load_config(args.config, args.options)
    set_seed(cfg.train.seed)
    os.makedirs(args.output, exist_ok=True)
    task = setup_task(args.task, cfg, synthetic=args.synthetic)
    datasets = task.build_datasets()
    ds = datasets.get(args.split, datasets["val"])

    if args.task == "sqa3d":
        from situation3d_tpu.data.sqa3d import batch_iterator
        model = task.build_model()
        example = task.clean_batch(
            next(batch_iterator(ds, cfg.eval.batch_size, shuffle=False)))
        trainer = task.build_trainer(model, example, steps_per_epoch=1)
        if args.checkpoint:
            restored = trainer.ckpt.restore(trainer.state)
            if restored is not None:
                trainer.state = restored
                logger.info("restored checkpoint step %d", int(restored.step))
        metrics = trainer.evaluate(
            task.clean_batch(b) for b in batch_iterator(
                ds, cfg.eval.batch_size, shuffle=False, drop_last=False))
        logger.info("eval[%s]: %s", args.split, metrics)
        if args.visualize:
            # export the first batch's scenes with predicted situations
            # (eval.py:302-314 open3d rendering -> PLY/OBJ files here)
            import jax
            import numpy as np
            from situation3d_tpu.eval.visualization import (
                export_scene_visualization)
            batch = task.clean_batch(next(batch_iterator(
                ds, cfg.eval.batch_size, shuffle=False)))
            _, keep = trainer.eval_step(
                trainer.state,
                jax.tree_util.tree_map(np.asarray, batch),
                jax.random.PRNGKey(0))
            aux = np.asarray(keep["aux_scores"])
            for i in range(min(4, len(aux))):
                pts = np.asarray(batch["voxel_coords"][i], np.float32) \
                    * cfg.data.voxel_size
                export_scene_visualization(
                    args.output, f"scene{i}", pts,
                    gt_pose=np.asarray(batch["auxiliary_task"][i]),
                    pred_pose=aux[i] if aux.ndim == 2 else None)
            logger.info("visualizations written to %s", args.output)
        with open(os.path.join(args.output, "metrics.json"), "w") as fh:
            json.dump({k: float(v) for k, v in metrics.items()}, fh, indent=2)
    else:
        from situation3d_tpu.data.threedvqa import eval_batches
        from situation3d_tpu.eval.sqa3d_scoring import score_results
        from situation3d_tpu.train.blip2_trainer import evaluate_generation
        model = task.build_model()
        from situation3d_tpu.data.threedvqa import train_batches
        example = next(train_batches(ds, cfg.eval.batch_size, seed=0))
        params = task.init_params(model, example)
        # TODO(ckpt): restore trained params via ckpt_compat/orbax when given
        preds_by_qid = evaluate_generation(
            cfg, model, params, eval_batches(ds, cfg.eval.batch_size),
            ds.text.decode, output_dir=args.output)
        golds, questions = {}, {}
        for i, rec in enumerate(ds.records):
            s = ds.sample(i)
            qid = int(s["question_id"])
            golds[qid] = rec.get("answers", [])
            questions[qid] = rec.get("question", "")
        scores = score_results(
            {str(k): v for k, v in preds_by_qid.items()},
            {str(k): v for k, v in golds.items()},
            {str(k): v for k, v in questions.items()})
        logger.info("scores: %s", json.dumps(scores, indent=2))
        with open(os.path.join(args.output, "scores.json"), "w") as fh:
            json.dump(scores, fh, indent=2)


if __name__ == "__main__":
    main()
