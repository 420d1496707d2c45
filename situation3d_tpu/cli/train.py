"""Training entry point.

Unified replacement for both reference CLIs:
``situation3d/train/train.py`` (argparse + Solver) and
``3DLLM_BLIP2-base/train.py`` (--cfg-path + OmegaConf + Runner).

Usage:
  python -m situation3d_tpu.cli.train --task sqa3d --config configs/sqa3d.yaml \
      --options train.lr=2e-5 train.epochs=40
  python -m situation3d_tpu.cli.train --task 3d_vqa --synthetic --max-steps 20
"""
from __future__ import annotations

import argparse

from situation3d_tpu.config import load_config, save_config
from situation3d_tpu.train.tasks import setup_task
from situation3d_tpu.utils.misc import set_seed, setup_logger


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="situation3d_tpu trainer")
    p.add_argument("--task",
                   choices=["sqa3d", "3d_vqa", "stage1", "dialogue",
                            "vqa_reading_comprehension",
                            "multimodal_classification"],
                   default="sqa3d")
    p.add_argument("--config", default=None, help="YAML config path")
    p.add_argument("--options", nargs="*", default=[],
                   help="dot-key overrides, e.g. train.lr=1e-4")
    p.add_argument("--synthetic", action="store_true",
                   help="use synthetic data (hermetic smoke runs)")
    p.add_argument("--dataset-config", default=None,
                   help="LAVIS-style dataset yaml (datasets: <name>: "
                        "build_info: ...) resolved through the builder "
                        "registry (data/builders.py)")
    p.add_argument("--max-steps", type=int, default=None)
    p.add_argument("--resume", action="store_true",
                   help="resume from the latest checkpoint in train.ckpt_dir "
                        "(model + optimizer + step; train.py:256-262 / "
                        "runner_base.py:576-596 parity)")
    p.add_argument("--output", default="outputs/run")
    return p.parse_args(argv)


def main(argv=None) -> None:
    args = parse_args(argv)
    logger = setup_logger()
    cfg = load_config(args.config, args.options)
    set_seed(cfg.train.seed)
    import os
    os.makedirs(args.output, exist_ok=True)
    save_config(cfg, os.path.join(args.output, "config.yaml"))

    task = setup_task("3d_vqa" if args.task == "stage1" else args.task,
                      cfg, synthetic=args.synthetic)
    if args.dataset_config:
        from situation3d_tpu.data.builders import build_datasets_from_yaml
        datasets = build_datasets_from_yaml(cfg, args.dataset_config)
    else:
        datasets = task.build_datasets()

    from situation3d_tpu.config import to_dict
    from situation3d_tpu.train.logging import MetricWriter
    writer = MetricWriter(cfg.log.log_dir, cfg.log.use_wandb,
                          cfg.log.use_tensorboard, cfg.log.project,
                          config=to_dict(cfg))

    def log_fn(m, s):
        writer.write(m, s)
        logger.info("step %d | %s", s,
                    " ".join(f"{k}={v:.4g}" for k, v in m.items()
                             if isinstance(v, float)))

    if args.task in ("sqa3d", "multimodal_classification"):
        # multimodal_classification rides the SIG3D pipeline — its task
        # subclasses SQA3DTask and only changes valid_step/after_evaluation
        import json

        from situation3d_tpu.data.sqa3d import batch_iterator
        bs = cfg.train.batch_size
        # answer_vocab.json / info.json parity (train.py:315-333)
        vocab = getattr(datasets["train"], "vocab", None)
        if vocab is not None:
            with open(os.path.join(args.output, "answer_vocab.json"), "w") as fh:
                json.dump(vocab.itos_list, fh)
        with open(os.path.join(args.output, "info.json"), "w") as fh:
            json.dump({"task": args.task,
                       "num_train": len(datasets["train"]),
                       "num_val": len(datasets["val"]),
                       "num_answers": cfg.data.num_answers}, fh, indent=2)
        train_iter = (task.clean_batch(b) for b in batch_iterator(
            datasets["train"], bs, seed=cfg.train.seed,
            epochs=cfg.train.epochs))
        example = task.clean_batch(
            next(batch_iterator(datasets["train"], bs, shuffle=False)))
        model = task.build_model()
        steps_per_epoch = max(len(datasets["train"]) // bs, 1)
        trainer = task.build_trainer(model, example, steps_per_epoch, log_fn)
        if args.resume:
            restored = trainer.ckpt.restore(trainer.state)
            if restored is not None:
                trainer.state = restored
                logger.info("resumed from step %d", int(restored.step))
            else:
                logger.info("no checkpoint found in %s; starting fresh",
                            cfg.train.ckpt_dir)
        def val_clean(b):
            # keep question_id for best-prediction CSV export
            return {k: v for k, v in b.items()
                    if k not in ("answer_cat", "answer_cats")}

        trainer.fit(
            train_iter,
            val_iter_fn=lambda: (val_clean(b) for b in batch_iterator(
                datasets["val"], bs, shuffle=False, drop_last=False)),
            max_steps=args.max_steps)
        metrics = trainer.evaluate(
            task.clean_batch(b) for b in batch_iterator(
                datasets["val"], bs, shuffle=False, drop_last=False))
        logger.info("final val: %s", metrics)
    elif args.task == "stage1":
        # Q-Former stage-1 representation pretraining (blip2_qformer.py:
        # ITC + ITM-with-hard-negatives + LM), RunnerIter-style cadence
        import jax
        import jax.numpy as jnp
        import optax

        from situation3d_tpu.data.threedvqa import stage1_batches
        from situation3d_tpu.models.blip2_qformer import Blip2Qformer
        from situation3d_tpu.parallel.mesh import make_mesh, shard_batch
        from situation3d_tpu.train.optim import make_optimizer

        ds = datasets["train"]
        bs = cfg.train.batch_size
        qcfg = cfg.blip2.qformer
        model = Blip2Qformer(qcfg)
        mesh = make_mesh(cfg.mesh)
        example = next(stage1_batches(ds, bs, qcfg))
        rngs = {"params": jax.random.PRNGKey(cfg.train.seed),
                "sample": jax.random.PRNGKey(cfg.train.seed + 1)}
        params = jax.jit(lambda b: model.init(rngs, b))(
            {k: jnp.asarray(v) for k, v in example.items()})["params"]
        tx, schedule = make_optimizer(cfg.train, params)
        opt_state = tx.init(params)

        @jax.jit
        def step_fn(params, opt_state, batch, key):
            def loss_fn(p):
                out = model.apply({"params": p}, batch, train=True,
                                  rngs={"sample": key})
                return out["loss"], out
            (_, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, out

        key = jax.random.PRNGKey(cfg.train.seed + 2)
        step = 0
        with mesh:
            for batch in stage1_batches(ds, bs, qcfg, seed=cfg.train.seed,
                                        epochs=cfg.train.epochs):
                key, sub = jax.random.split(key)
                params, opt_state, out = step_fn(
                    params, opt_state, shard_batch(batch, mesh), sub)
                step += 1
                if step % cfg.train.log_every_steps == 0:
                    log_fn({k: float(v) for k, v in out.items()}, step)
                if args.max_steps and step >= args.max_steps:
                    break
        from situation3d_tpu.train.checkpoint import save_trainable_npz
        import jax.tree_util as jtu
        n = save_trainable_npz(
            os.path.join(args.output, "stage1_qformer.npz"), params,
            jtu.tree_map(lambda _: True, params))
        logger.info("stage1 done: %d steps, %d tensors saved", step, n)
    else:
        import json

        from situation3d_tpu.data.threedvqa import (eval_batches,
                                                    gold_answers,
                                                    train_batches)
        from situation3d_tpu.train.blip2_trainer import Blip2Trainer
        model = task.build_model()
        ds, val_ds = datasets["train"], datasets["val"]
        bs = cfg.train.batch_size
        example = next(train_batches(ds, bs, seed=0))
        params = task.init_params(model, example, cfg.train.seed)
        golds, _ = gold_answers(val_ds)
        trainer = Blip2Trainer(
            cfg, model, steps_per_epoch=max(len(ds.train_pairs()) // bs, 1),
            params=params, log_fn=log_fn, text_decoder=val_ds.text.decode)
        if args.resume and trainer.resume():
            logger.info("resumed from step %d", int(trainer.state.step))
        trainer.fit(
            train_batches(ds, bs, seed=cfg.train.seed, epochs=cfg.train.epochs),
            val_iter_fn=lambda: eval_batches(val_ds, bs),
            golds=golds, max_steps=args.max_steps)
        variables = {"params": trainer.state.params}
        if args.task == "dialogue":
            # loss-based validation (lavis/tasks/dialogue.py:45-64) — needs
            # label-bearing batches, so iterate the val split train-style
            losses = [task.valid_step(model, variables, b)
                      for b in train_batches(val_ds, bs, seed=0, epochs=1)]
            logger.info("final val: %s", task.after_evaluation(losses))
        elif args.task == "vqa_reading_comprehension":
            results = []
            for b in eval_batches(val_ds, bs):
                results += task.valid_step(model, variables, b,
                                           decode_fn=val_ds.text.decode)
            logger.info("final val: %s",
                        task.after_evaluation(results, golds))
        else:
            em, preds = trainer.evaluate(eval_batches(val_ds, bs), golds)
            logger.info("final val EM=%.4f over %d answers (best ckpt)", em,
                        len(preds))
            results_dir = os.path.join(args.output, "results")
            os.makedirs(results_dir, exist_ok=True)
            with open(os.path.join(results_dir, "vqa_result.json"), "w") as fh:
                json.dump([{"question_id": q, "answer": a}
                           for q, a in preds.items()], fh)


if __name__ == "__main__":
    main()
