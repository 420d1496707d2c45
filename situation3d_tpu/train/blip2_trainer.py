"""3D-LLM (Blip2T5) training and generation-evaluation wiring.

Replaces the LAVIS runner/task plumbing for the 3D path:

- ``RunnerBase.train`` / ``BaseTask._train_inner_loop``
  (``runner_base.py:345-411``, ``base_task.py:151-235``): jitted
  forward+loss+backward+update over the mesh (pjit inserts the gradient
  all-reduce; replaces DDP), bf16 instead of AMP GradScaler;
- T5 frozen except input/output embeddings (``blip2_t5.py:84-89``) via the
  optimizer trainable mask (optim.blip2_trainable_mask) — frozen leaves get
  no Adam state and XLA dead-code-eliminates their weight-grad matmuls;
- validation during training + best-model tracking + reload
  (``runner_base.py:413-446`` eval_epoch, ``:556-574`` _reload_best_model):
  greedy generation over the val set scored by exact match;
- checkpoint save / resume (``runner_base.py:530-554`` trainable-only save,
  ``:576-596`` resume of model/optimizer/epoch): orbax full-state
  checkpoints for resume plus a trainable-only .npz per best model;
- iteration-based cadence (``runner_iter.py:25-60`` RunnerIter):
  ``train.iters_per_inner_epoch`` sets the val/ckpt period,
  ``train.max_iters`` bounds the run;
- distributed eval result merge: per-process JSON, host 0 concatenates
  (``BaseTask.save_result``, ``base_task.py:237-271``).
"""
from __future__ import annotations

import json
import os
import time
from typing import Any, Callable, Dict, Iterable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from situation3d_tpu.config import Config
from situation3d_tpu.models.blip2_t5 import Blip2T5, predict_answers
from situation3d_tpu.parallel.mesh import make_mesh, shard_batch
from situation3d_tpu.train.checkpoint import (CheckpointManager,
                                              save_trainable_npz)
from situation3d_tpu.train.optim import (blip2_trainable_mask, make_optimizer,
                                         trainable_count)


class Blip2TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any


def make_blip2_optimizer(cfg: Config, params, steps_per_epoch: int):
    """AdamW with the BLIP-2 freeze recipe (T5 frozen except embeddings)."""
    return make_optimizer(cfg.train, params, steps_per_epoch,
                          trainable=blip2_trainable_mask(cfg, params))


def make_blip2_train_step(model: Blip2T5, tx: optax.GradientTransformation,
                          donate: bool = True, nan_guard: str = "loss",
                          trainable=None) -> Callable:
    def train_step(state: Blip2TrainState, batch):
        def loss_fn(p):
            if trainable is not None:
                # stop_gradient on frozen leaves: the backward never
                # computes (or allocates) frozen-T5 weight grads — relying
                # on the masked optimizer alone still materializes a
                # ~6 GB zero/real grad tree for flan-t5-xl and OOMs a
                # 16 GB chip at B=4 (measured); symbolic zeros also skip
                # the dW matmuls of every frozen layer in the backward
                p = jax.tree_util.tree_map(
                    lambda m, x: x if m else jax.lax.stop_gradient(x),
                    trainable, p)
            return model.apply({"params": p}, batch, train=True)["loss"]

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        metrics = {"loss": loss}
        finite = None
        if nan_guard != "off":
            from situation3d_tpu.train.trainer import finite_guard
            # trainable-only: keeps frozen-T5 weight grads DCE-able
            grads, finite = finite_guard(grads, trainable, loss=loss,
                                         mode=nan_guard)
            metrics["grads_finite"] = finite.astype(jnp.float32)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        if finite is not None:
            from situation3d_tpu.train.trainer import gate_update
            params, opt_state = gate_update(
                finite, params, opt_state, state.params, state.opt_state)
        return state.replace(step=state.step + 1, params=params,
                             opt_state=opt_state), metrics

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


class Blip2Trainer:
    """RunnerBase/RunnerIter replacement for the 3d_vqa task."""

    def __init__(self, cfg: Config, model: Blip2T5, steps_per_epoch: int,
                 params=None, state: Optional[Blip2TrainState] = None,
                 log_fn: Optional[Callable] = None,
                 text_decoder: Optional[Callable] = None):
        self.cfg = cfg
        self.model = model
        self.mesh = make_mesh(cfg.mesh)
        self.steps_per_epoch = max(steps_per_epoch, 1)
        if state is None:
            assert params is not None, "need params or a full state"
            tx, self.schedule = make_blip2_optimizer(cfg, params,
                                                     self.steps_per_epoch)
            state = Blip2TrainState(step=jnp.zeros((), jnp.int32),
                                    params=params, opt_state=tx.init(params))
        else:
            tx, self.schedule = make_blip2_optimizer(cfg, state.params,
                                                     self.steps_per_epoch)
        self.tx = tx
        self.state = state
        self.trainable = blip2_trainable_mask(cfg, state.params)
        self.train_step = make_blip2_train_step(model, tx,
                                                cfg.train.donate_state,
                                                nan_guard=cfg.train.nan_guard,
                                                trainable=self.trainable)
        self._predict = jax.jit(lambda p, b: predict_answers(
            model, {"params": p}, b, cfg.eval.max_gen_len))
        self.ckpt = CheckpointManager(cfg.train.ckpt_dir, cfg.train.ckpt_keep,
                                      best_metric="val_em")
        self.log_fn = log_fn or (lambda m, s: None)
        self.text_decoder = text_decoder
        self.best_metric = -1.0

    # -- checkpointing ----------------------------------------------------

    def resume(self) -> bool:
        """Restore the latest checkpoint (model/optimizer/step —
        runner_base.py:576-596 _load_checkpoint). Returns True if found."""
        restored = self.ckpt.restore(self.state)
        if restored is None:
            return False
        self.state = restored
        return True

    def save(self, metrics: Optional[dict] = None) -> None:
        step = int(self.state.step)
        self.ckpt.save(step, self.state, metrics)

    def reload_best(self) -> Optional[int]:
        """Reload the best retained checkpoint by val metric
        (runner_base.py:556-574)."""
        step = self.ckpt.best_step("val_em")
        if step is None:
            return None
        self.ckpt.wait()
        self.state = self.ckpt.restore(self.state, step)
        return step

    def save_trainable(self, path: str) -> int:
        """Trainable-only checkpoint (runner_base.py:530-554 parity)."""
        return save_trainable_npz(path, self.state.params, self.trainable)

    # -- training ---------------------------------------------------------

    def fit(self, train_iter: Iterable, val_iter_fn=None, golds=None,
            max_steps: Optional[int] = None):
        """Train with periodic validation + best tracking.

        The val/ckpt cadence is ``iters_per_inner_epoch`` when set
        (RunnerIter), else one epoch of steps (RunnerBase); ``max_iters``
        (or ``max_steps``) bounds the run.
        """
        cfg = self.cfg.train
        cadence = cfg.iters_per_inner_epoch or self.steps_per_epoch
        limit = min(x for x in (max_steps, cfg.max_iters or None,
                                cfg.epochs * self.steps_per_epoch)
                    if x is not None)
        step = int(self.state.step)
        last_val = -1
        t0 = time.perf_counter()
        from situation3d_tpu.train.logging import MetricLogger
        meter = MetricLogger()  # windowed smoothing (logger.py:19-78)
        with self.mesh:
            for batch in train_iter:
                if step >= limit:
                    break
                batch = shard_batch(
                    {k: v for k, v in batch.items()
                     if k not in ("question_id", "sample_valid")}, self.mesh)
                self.state, metrics = self.train_step(self.state, batch)
                step += 1
                if step % cfg.log_every_steps == 0:
                    meter.update(loss=float(metrics["loss"]))
                    host = {"loss": meter.meters["loss"].value,
                            "loss_smoothed": meter.meters["loss"].median,
                            "lr": float(self.schedule(step)),
                            "time/step": (time.perf_counter() - t0)
                            / cfg.log_every_steps}
                    self.log_fn(host, step)
                    t0 = time.perf_counter()
                if (step % cadence == 0 or step >= limit) and last_val != step:
                    self._validate(step, val_iter_fn, golds)
                    last_val = step
        if int(self.state.step) > 0 and self.ckpt.latest_step() != step:
            self.save()
        self.ckpt.wait()
        if val_iter_fn is not None:
            self.reload_best()
        return self.state

    def _validate(self, step, val_iter_fn, golds) -> None:
        if val_iter_fn is None:
            self.save()
            return
        em, preds = self.evaluate(val_iter_fn(), golds)
        self.log_fn({"val/em": em, "val/n": float(len(preds))}, step)
        metrics = {"val_em": em}
        self.save(metrics)
        if em > self.best_metric:
            self.best_metric = em
            self.save_trainable(os.path.join(
                self.cfg.train.ckpt_dir, "checkpoint_best_trainable.npz"))

    # -- evaluation -------------------------------------------------------

    def predict(self, eval_iter: Iterable) -> Dict[int, str]:
        """Greedy predict_answers over eval batches -> {qid: answer}."""
        assert self.text_decoder is not None, "text_decoder required"
        out: Dict[int, str] = {}
        with self.mesh:
            for batch in eval_iter:
                qids = np.asarray(batch["question_id"])
                valid = np.asarray(batch.get("sample_valid",
                                             np.ones(len(qids), bool)))
                jb = {k: jnp.asarray(v) for k, v in batch.items()
                      if k not in ("question_id", "sample_valid",
                                   "labels", "label_mask")}
                tokens = np.asarray(self._predict(self.state.params, jb))
                for i in range(len(qids)):
                    if valid[i]:
                        out[int(qids[i])] = self.text_decoder(tokens[i])
        return out

    def evaluate(self, eval_iter: Iterable, golds: Optional[Dict] = None):
        """(exact-match score, predictions). ``golds``: {qid: [answers]}."""
        preds = self.predict(eval_iter)
        if not golds:
            return 0.0, preds
        from situation3d_tpu.eval.scorers import exact_match
        keyed = {str(k): v for k, v in preds.items()}
        gold = {str(k): v for k, v in golds.items() if str(k) in keyed}
        return (exact_match(keyed, gold) if gold else 0.0), preds


def train_blip2(cfg: Config, model: Blip2T5, params, train_iter: Iterable,
                max_steps: Optional[int] = None,
                log_fn: Optional[Callable] = None,
                steps_per_epoch: int = 1000):
    """Functional wrapper kept for callers that only need the fit loop."""
    trainer = Blip2Trainer(cfg, model, steps_per_epoch, params=params,
                           log_fn=log_fn)
    state = trainer.fit(train_iter, max_steps=max_steps)
    return state.params


def evaluate_generation(cfg: Config, model: Blip2T5, params,
                        eval_iter: Iterable, text_decoder,
                        output_dir: Optional[str] = None,
                        max_len: Optional[int] = None) -> Dict[int, str]:
    """predict_answers over the eval set -> {question_id: answer string}.

    Writes per-process result JSON and merges on process 0 (the
    save_result pattern of base_task.py:237-271)."""
    results: List[Dict[str, Any]] = []
    gen = jax.jit(lambda p, b: predict_answers(
        model, {"params": p}, b, max_len or cfg.eval.max_gen_len))
    for batch in eval_iter:
        qids = np.asarray(batch.pop("question_id"))
        valid = np.asarray(batch.pop("sample_valid", np.ones(len(qids), bool)))
        jb = {k: jnp.asarray(v) for k, v in batch.items()
              if k not in ("labels", "label_mask")}
        tokens = np.asarray(gen(params, jb))
        for i in range(len(qids)):
            if valid[i]:
                results.append({"question_id": int(qids[i]),
                                "answer": text_decoder(tokens[i])})
    if output_dir:
        os.makedirs(output_dir, exist_ok=True)
        rank = jax.process_index()
        with open(os.path.join(output_dir,
                               f"vqa_result_rank{rank}.json"), "w") as fh:
            json.dump(results, fh)
        if rank == 0:
            merged = []
            for fn in sorted(os.listdir(output_dir)):
                if fn.startswith("vqa_result_rank"):
                    merged.extend(json.load(open(os.path.join(output_dir, fn))))
            with open(os.path.join(output_dir, "vqa_result.json"), "w") as fh:
                json.dump(merged, fh)
    return {r["question_id"]: r["answer"] for r in results}
