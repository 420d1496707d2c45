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
    p.add_argument("--task", choices=["sqa3d", "3d_vqa"], default="sqa3d")
    p.add_argument("--config", default=None, help="YAML config path")
    p.add_argument("--options", nargs="*", default=[],
                   help="dot-key overrides, e.g. train.lr=1e-4")
    p.add_argument("--synthetic", action="store_true",
                   help="use synthetic data (hermetic smoke runs)")
    p.add_argument("--max-steps", type=int, default=None)
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

    task = setup_task(args.task, cfg, synthetic=args.synthetic)
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

    if args.task == "sqa3d":
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
    else:
        from situation3d_tpu.data.threedvqa import eval_batches, train_batches
        from situation3d_tpu.train.blip2_trainer import (evaluate_generation,
                                                         train_blip2)
        model = task.build_model()
        ds = datasets["train"]
        bs = cfg.train.batch_size
        example = next(train_batches(ds, bs, seed=0))
        params = task.init_params(model, example, cfg.train.seed)
        params = train_blip2(
            cfg, model, params,
            train_batches(ds, bs, seed=cfg.train.seed, epochs=cfg.train.epochs),
            max_steps=args.max_steps, log_fn=log_fn,
            steps_per_epoch=max(len(ds.train_pairs()) // bs, 1))
        preds = evaluate_generation(
            cfg, model, params, eval_batches(datasets["val"], bs),
            datasets["val"].text.decode,
            output_dir=os.path.join(args.output, "results"))
        logger.info("generated %d answers", len(preds))


if __name__ == "__main__":
    main()
