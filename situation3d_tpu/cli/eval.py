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
    p.add_argument("--trainable-checkpoint", default=None,
                   help="trainable-only .npz saved by the trainer "
                        "(runner_base.py:530-554 format analogue)")
    p.add_argument("--torch-checkpoint", default=None,
                   help="reference-format torch .pth checkpoint "
                        "(converted via ckpt_compat)")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--split", default="val")
    p.add_argument("--output", default="outputs/eval")
    p.add_argument("--scene-cache", action="store_true",
                   help="evaluate with per-scene encoding reuse "
                        "(eval/serving.py): the scene tower runs once per "
                        "scene instead of once per question — exact at eval "
                        "time (no augmentation; the pose transforms only "
                        "the target vector)")
    p.add_argument("--visualize", action="store_true",
                   help="export PLY/OBJ scene visualizations")
    p.add_argument("--segmentation", action="store_true",
                   help="also run 3D semantic-segmentation mIoU through the "
                        "full OpenScene decoder (eval.py:234-332)")
    p.add_argument("--text-features", default=None,
                   help=".npy [num_classes, 768] CLIP text features for the "
                        "segmentation head (random unit vectors if absent)")
    return p.parse_args(argv)


def run_segmentation_eval(cfg, trained_params, seg_ds, batch_size,
                          text_features, num_answers, seed=0):
    """Segmentation mIoU via the full decoder: rebuild SIG3D with
    ``final_result=True`` (fresh init provides the decoder tail), merge any
    trained params over it (the strict=False load of eval.py:220-231), then
    ``openscene_out @ text_features.T`` vs per-voxel labels
    (eval.py:293-297, 324-332)."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from situation3d_tpu.ckpt_compat.blip2 import merge_params
    from situation3d_tpu.data.sqa3d import batch_iterator
    from situation3d_tpu.eval.segmentation import (confusion_matrix,
                                                   miou_from_confusion)
    from situation3d_tpu.models.sig3d import SIG3D

    cfg = dataclasses.replace(
        cfg, sparse=dataclasses.replace(cfg.sparse, final_result=True))
    model = SIG3D(cfg, num_answers,
                  dtype=jnp.bfloat16 if cfg.train.bf16 else jnp.float32)
    batches = batch_iterator(seg_ds, batch_size, shuffle=False,
                             drop_last=False)
    first = next(batches)

    def model_batch(b):
        return {k: jnp.asarray(v) for k, v in b.items()
                if k not in ("question_id", "answer_cat", "answer_cats",
                             "voxel_labels", "sample_valid")}

    variables = jax.jit(lambda b: model.init(
        {"params": jax.random.PRNGKey(seed),
         "sample": jax.random.PRNGKey(seed + 1)}, b, train=False))(
        model_batch(first))
    if trained_params is not None:
        variables = dict(variables)
        variables["params"] = merge_params(variables["params"],
                                           jax.tree_util.tree_map(
                                               lambda x: x, trained_params))

    tf = jnp.asarray(text_features, jnp.float32)

    @jax.jit
    def seg_step(b, key):
        out = model.apply(variables, b, train=False, rngs={"sample": key})
        feats = out["openscene_out"].astype(jnp.float32)
        return jnp.argmax(feats @ tf.T, axis=-1)  # [B, V]

    num_classes = tf.shape[0]
    conf = np.zeros((num_classes, num_classes), np.int64)
    key = jax.random.PRNGKey(seed + 2)
    import itertools
    for b in itertools.chain([first], batches):
        key, sub = jax.random.split(key)
        pred = np.asarray(seg_step(model_batch(b), sub))
        labels = np.asarray(b["voxel_labels"])
        mask = np.asarray(b["voxel_mask"])
        valid_rows = np.asarray(b.get("sample_valid",
                                      np.ones(len(pred), bool)))
        sel = mask & valid_rows[:, None]
        conf += confusion_matrix(pred[sel], labels[sel], num_classes)
    miou, ious = miou_from_confusion(conf)
    acc = float(np.diag(conf).sum() / max(conf.sum(), 1))
    out = {"seg_mIoU": miou, "seg_accuracy": acc}
    out.update({f"seg_iou/{i}": float(v) for i, v in enumerate(ious)})
    return out


def restore_blip2_params(cfg, model, params, args, logger):
    """Load trained Blip2T5 params from any of the supported sources:
    orbax full-state dir (--checkpoint), trainable-only .npz
    (--trainable-checkpoint), or a reference-format torch checkpoint
    (--torch-checkpoint; evaluate.py:65 / inference.py:30-32 parity)."""
    if args.checkpoint:
        import jax.numpy as jnp
        import orbax.checkpoint as ocp

        from situation3d_tpu.train.blip2_trainer import (
            Blip2TrainState, make_blip2_optimizer)
        tx, _ = make_blip2_optimizer(cfg, params, 1)
        template = Blip2TrainState(step=jnp.zeros((), jnp.int32),
                                   params=params, opt_state=tx.init(params))
        mgr = ocp.CheckpointManager(os.path.abspath(args.checkpoint))
        step = mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {args.checkpoint}")
        state = mgr.restore(step, args=ocp.args.StandardRestore(template))
        logger.info("restored orbax checkpoint step %d", step)
        return state.params
    if args.trainable_checkpoint:
        from situation3d_tpu.train.checkpoint import load_trainable_npz
        params = load_trainable_npz(args.trainable_checkpoint, params)
        logger.info("merged trainable-only checkpoint %s",
                    args.trainable_checkpoint)
        return params
    if getattr(args, "torch_checkpoint", None):
        import torch

        from situation3d_tpu.ckpt_compat.blip2 import (convert_blip2,
                                                       merge_params)
        sd = torch.load(args.torch_checkpoint, map_location="cpu",
                        weights_only=False)
        sd = sd.get("model", sd)
        sd = {k: v.numpy() if hasattr(v, "numpy") else v
              for k, v in sd.items()}
        update = convert_blip2(sd, cfg.blip2.qformer.num_layers,
                               cfg.blip2.qformer.cross_attention_freq,
                               vocab_size=cfg.blip2.t5.vocab_size)
        params = merge_params(params, update)
        logger.info("merged reference torch checkpoint %s",
                    args.torch_checkpoint)
        return params
    logger.warning("no checkpoint given: scoring a randomly initialized "
                   "model (pass --checkpoint/--trainable-checkpoint/"
                   "--torch-checkpoint)")
    return params


def run_cached_eval(cfg, task, ds, trainer, logger):
    """Scene-grouped QA eval through eval/serving.SceneCache: one scene
    tower pass per scene, every question answered against the cached
    tokens. Returns the same EM metrics as Trainer.evaluate."""
    import jax
    import numpy as np

    from situation3d_tpu.eval.serving import SceneCache
    from situation3d_tpu.train.metrics import answer_metrics

    variables = {"params": trainer.state.params,
                 "batch_stats": trainer.state.batch_stats}
    cache = SceneCache(trainer.model, variables)
    groups: dict = {}
    for i, rec in enumerate(ds.records):
        groups.setdefault(rec["scene_id"], []).append(i)

    Bq = cfg.eval.batch_size
    q_keys = ("s_ids", "s_mask", "q_ids", "q_mask", "auxiliary_task")
    sums: dict = {}
    total = 0
    key = jax.random.PRNGKey(cfg.train.seed)
    for sid, idxs in groups.items():
        samples = [ds[i] for i in idxs]
        scene_batch = {k: np.asarray(v)[None] for k, v in samples[0].items()
                       if k not in ("question_id", "answer_cats")}
        key, k1 = jax.random.split(key)
        cache.encode(sid, scene_batch, k1)
        for s0 in range(0, len(samples), Bq):
            chunk = samples[s0: s0 + Bq]
            nvalid = len(chunk)
            chunk = chunk + [chunk[-1]] * (Bq - nvalid)
            qb = {k: np.stack([s[k] for s in chunk]) for k in q_keys}
            key, k2 = jax.random.split(key)
            out = cache.answer(sid, qb, k2)
            cats = np.stack([s["answer_cat_scores"] for s in chunk])
            valid = np.arange(Bq) < nvalid
            m = answer_metrics(out["answer_scores"], cats,
                               np.stack([s["question_type"] for s in chunk])
                               if "question_type" in chunk[0] else None,
                               valid=valid)
            for mk, mv in m.items():
                v = np.asarray(mv, np.float64)
                # acc_* are per-batch means (weight by nvalid); breakdown
                # entries are (correct, count) SUM pairs — add directly
                sums[mk] = sums.get(mk, 0.0) + (
                    v * nvalid if v.ndim == 0 else v)
            total += nvalid
    metrics = {mk: (v / max(total, 1)).tolist() if np.ndim(v) == 0 else
               v.tolist() for mk, v in sums.items()}
    logger.info("scene-cache eval: %d questions over %d scenes",
                total, len(groups))
    return metrics


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
        if args.scene_cache:
            metrics = run_cached_eval(cfg, task, ds, trainer, logger)
        else:
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
            # image logging into the metric stream (the reference's wandb
            # OffscreenRenderer images, visualization.py:77-244) — PNGs
            # always land under the output dir; wandb/tb when configured
            from situation3d_tpu.train.logging import MetricWriter
            writer = MetricWriter(args.output, cfg.log.use_wandb,
                                  cfg.log.use_tensorboard, cfg.log.project)
            for i in range(min(4, len(aux))):
                m = np.asarray(batch["voxel_mask"][i]).astype(bool)
                pts = np.asarray(batch["voxel_coords"][i], np.float32)[m] \
                    * cfg.data.voxel_size
                export_scene_visualization(
                    args.output, f"scene{i}", pts,
                    gt_pose=np.asarray(batch["auxiliary_task"][i]),
                    pred_pose=aux[i] if aux.ndim == 2 else None)
                from situation3d_tpu.eval.visualization import render_topdown
                writer.write_image(
                    f"eval/scene{i}",
                    render_topdown(
                        pts, gt_pose=np.asarray(batch["auxiliary_task"][i]),
                        pred_pose=aux[i] if aux.ndim == 2 else None),
                    step=int(trainer.state.step))
            writer.close()
            logger.info("visualizations written to %s", args.output)
        if args.segmentation:
            import numpy as np
            if args.synthetic:
                from situation3d_tpu.data.synthetic import \
                    make_synthetic_dataset
                seg_ds = make_synthetic_dataset(cfg, 1, 4, split="val",
                                                seed=1, include_labels=True)
            else:
                from situation3d_tpu.data.sqa3d import SQA3DDataset
                seg_ds = SQA3DDataset(cfg, args.split, ds.vocab,
                                      getattr(ds, "answer_counter", None),
                                      include_labels=True)
            if args.text_features:
                tf = np.load(args.text_features)
            else:
                logger.warning("no --text-features: using random unit "
                               "vectors (synthetic seg smoke only)")
                r = np.random.RandomState(0).randn(20, cfg.sparse.out_channels)
                tf = r / np.linalg.norm(r, axis=1, keepdims=True)
            seg = run_segmentation_eval(
                cfg, trainer.state.params, seg_ds, cfg.eval.batch_size, tf,
                num_answers=len(getattr(ds, "vocab", [])) or
                cfg.data.num_answers)
            logger.info("segmentation: mIoU=%.4f acc=%.4f",
                        seg["seg_mIoU"], seg["seg_accuracy"])
            metrics.update(seg)
        with open(os.path.join(args.output, "metrics.json"), "w") as fh:
            json.dump({k: float(v) for k, v in metrics.items()}, fh, indent=2)
    else:
        from situation3d_tpu.data.threedvqa import eval_batches, gold_answers
        from situation3d_tpu.eval.sqa3d_scoring import score_results
        from situation3d_tpu.train.blip2_trainer import (Blip2Trainer,
                                                         evaluate_generation)
        model = task.build_model()
        from situation3d_tpu.data.threedvqa import train_batches
        example = next(eval_batches(ds, cfg.eval.batch_size))
        params = task.init_params(
            model, {**example,
                    "labels": example["input_ids"][:, :4],
                    "label_mask": example["input_mask"][:, :4]})
        params = restore_blip2_params(cfg, model, params, args, logger)
        preds_by_qid = evaluate_generation(
            cfg, model, params, eval_batches(ds, cfg.eval.batch_size),
            ds.text.decode, output_dir=args.output)
        golds, questions = gold_answers(ds)
        scores = score_results(
            {str(k): v for k, v in preds_by_qid.items()},
            {str(k): v for k, v in golds.items()},
            {str(k): v for k, v in questions.items()})
        logger.info("scores: %s", json.dumps(scores, indent=2))
        with open(os.path.join(args.output, "scores.json"), "w") as fh:
            json.dump(scores, fh, indent=2)


if __name__ == "__main__":
    main()
