"""SIG3D trainer — the Solver replacement.

Re-implements ``lib/solver.py:148-743`` (Solver) as functional jitted steps
over a device mesh:

- one jitted ``train_step`` = forward + loss + backward + optimizer update,
  data-parallel over the mesh's ``data`` axis (pjit inserts the gradient
  all-reduce; replaces DDP), donated state;
- ``eval_step`` computes answer metrics on device, situation metrics on host;
- per-step timing split (fetch/forward+backward/eval) kept as named metrics
  like the reference's wandb ``{phase}/time/*`` (``solver.py:419-429``);
- val every ``val_every_steps`` (``solver.py:437-443``), best tracked by
  ``answer_acc_at1`` (``solver.py:457-494``), checkpoint via orbax;
- BN momentum schedule hook (``solver.py:249-257``) — a no-op while the
  scene encoder is frozen, kept for unfrozen configs.
"""
from __future__ import annotations

import time
from typing import Any, Callable, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from situation3d_tpu.config import Config
from situation3d_tpu.models.sig3d import SIG3D
from situation3d_tpu.parallel.mesh import make_mesh, shard_batch
from situation3d_tpu.train.checkpoint import CheckpointManager
from situation3d_tpu.train.losses import get_loss
from situation3d_tpu.train.metrics import answer_metrics, situation_metrics
from situation3d_tpu.train.optim import make_optimizer, sig3d_trainable_mask


def make_sig3d_optimizer(cfg: Config, params, steps_per_epoch: int):
    """Optimizer with the SIG3D freeze recipe: scene_encoder prefix-frozen
    (no_update_filter, lib/config.py:61) plus the lang_freeze mask
    (sep_lang_module_bert.py:25-45)."""
    return make_optimizer(cfg.train, params, steps_per_epoch,
                          trainable=sig3d_trainable_mask(cfg, params))


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    batch_stats: Any
    rng: jnp.ndarray


def create_train_state(cfg: Config, model: SIG3D, example_batch,
                       steps_per_epoch: int, seed: int = 0) -> TrainState:
    rng = jax.random.PRNGKey(seed)
    variables = model.init(
        {"params": rng, "sample": jax.random.PRNGKey(seed + 1)},
        example_batch, train=False)
    params = variables["params"]
    tx, _ = make_sig3d_optimizer(cfg, params, steps_per_epoch)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        batch_stats=variables.get("batch_stats", {}),
        rng=rng,
    )


def finite_guard(grads, trainable=None, loss=None, mode: str = "full"):
    """Zero trainable gradients when the step went non-finite, so one bad
    step is skipped rather than poisoning params + Adam moments.
    Deterministic replacement for the reference's set_detect_anomaly
    (solver.py:374). Returns (guarded grads, finite flag).

    ``mode="loss"`` triggers on ``isfinite(loss)`` only — measured FREE
    (the conditional grad rewrite fuses away; the loss scalar exists
    anyway), and a non-finite loss is how training blowups overwhelmingly
    present. ``mode="full"`` additionally reduces over every trainable
    gradient leaf — XLA does not fuse those ~hundreds of reductions into
    the backward (measured +39% SIG3D step time); use it as the
    detect_anomaly-strength debugging mode.

    ``trainable`` (optional boolean pytree) restricts the check and the
    rewrite to trainable leaves (frozen-param gradients are dead code XLA
    eliminates from the backward; never read them)."""
    flags = trainable if trainable is not None else jax.tree_util.tree_map(
        lambda _: True, grads)
    finite = jnp.ones((), bool)
    if loss is not None:
        finite = jnp.logical_and(finite, jnp.all(jnp.isfinite(loss)))
    if mode == "full":
        for leaf, t in zip(jax.tree_util.tree_leaves(grads),
                           jax.tree_util.tree_leaves(flags)):
            if t:
                finite = jnp.logical_and(finite, jnp.all(jnp.isfinite(leaf)))
    guarded = jax.tree_util.tree_map(
        lambda g, t: jnp.where(finite, g, jnp.zeros_like(g)) if t else g,
        grads, flags)
    return guarded, finite


def gate_update(finite, new_params, new_opt_state, old_params, old_opt_state):
    """Make a non-finite step a true no-op: select the OLD params/opt_state
    when ``finite`` is False. Zeroed grads alone are not enough — adamw's
    decoupled weight decay still moves every decayed param and the Adam
    moments still decay on a zero gradient. The per-leaf selects fuse into
    the update elementwise ops (no measurable cost)."""
    sel = lambda new, old: jax.tree_util.tree_map(
        lambda a, b: jnp.where(finite, a, b), new, old)
    return sel(new_params, old_params), sel(new_opt_state, old_opt_state)


def make_train_step(cfg: Config, model: SIG3D, tx: optax.GradientTransformation,
                    donate: bool = True) -> Callable:
    tag = cfg.model.situation_loss_tag

    def train_step(state: TrainState, batch: Dict[str, Any]):
        rng, sample_key, drop_key = jax.random.split(state.rng, 3)

        def loss_fn(params):
            out = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch, train=True,
                rngs={"sample": sample_key, "dropout": drop_key})
            total, terms = get_loss(out, batch, cfg.loss, tag)
            return total, (terms, out)

        (loss, (terms, out)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        extra = {}
        finite = None
        if cfg.train.nan_guard != "off":
            grads, finite = finite_guard(
                grads, sig3d_trainable_mask(cfg, state.params),
                loss=loss, mode=cfg.train.nan_guard)
            extra["grads_finite"] = finite.astype(jnp.float32)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        if finite is not None:
            params, opt_state = gate_update(
                finite, params, opt_state, state.params, state.opt_state)
        new_state = state.replace(
            step=state.step + 1, params=params, opt_state=opt_state, rng=rng)
        metrics = dict(terms)
        metrics.update(extra)
        metrics.update(answer_metrics(
            out["answer_scores"], batch["answer_cat_scores"],
            batch.get("question_type")))
        metrics.update({k: v for k, v in out.items()
                        if k.startswith("overflow/")})
        return new_state, metrics

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def make_eval_step(cfg: Config, model: SIG3D) -> Callable:
    def eval_step(state: TrainState, batch: Dict[str, Any], key):
        out = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch, train=False, rngs={"sample": key})
        metrics = answer_metrics(
            out["answer_scores"], batch["answer_cat_scores"],
            batch.get("question_type"), batch.get("sample_valid"))
        _, terms = get_loss(out, batch, cfg.loss, cfg.model.situation_loss_tag)
        metrics["loss"] = terms["loss"]
        keep = {k: out[k] for k in ("aux_scores", "scene_positions",
                                    "answer_scores") if k in out}
        return metrics, keep

    return jax.jit(eval_step)


class Trainer:
    """Epoch/step loop with validation, logging and checkpointing."""

    def __init__(self, cfg: Config, model: SIG3D, steps_per_epoch: int,
                 example_batch=None, state: Optional[TrainState] = None,
                 log_fn: Optional[Callable[[Dict[str, float], int], None]] = None):
        self.cfg = cfg
        self.model = model
        self.mesh = make_mesh(cfg.mesh)
        self.steps_per_epoch = steps_per_epoch
        if state is None:
            state = create_train_state(cfg, model, example_batch,
                                       steps_per_epoch, cfg.train.seed)
        tx, self.schedule = make_sig3d_optimizer(cfg, state.params, steps_per_epoch)
        self.tx = tx
        self.state = state
        self.train_step = make_train_step(cfg, model, tx, cfg.train.donate_state)
        self.eval_step = make_eval_step(cfg, model)
        self.ckpt = CheckpointManager(cfg.train.ckpt_dir, cfg.train.ckpt_keep)
        self.best_acc = -1.0
        self.log_fn = log_fn or (lambda m, s: None)
        self._timings: Dict[str, list] = {"fetch": [], "step": []}
        from situation3d_tpu.train.logging import StepProfiler
        self.profiler = StepProfiler(cfg.log.log_dir,
                                     tuple(cfg.log.profile_steps))

    def fit(self, train_iter: Iterable, val_iter_fn=None,
            max_steps: Optional[int] = None):
        cfg = self.cfg.train
        step = int(self.state.step)
        t_fetch = time.perf_counter()
        for batch in train_iter:
            self._timings["fetch"].append(time.perf_counter() - t_fetch)
            batch = shard_batch(batch, self.mesh)
            t0 = time.perf_counter()
            self.state, metrics = self.train_step(self.state, batch)
            step += 1
            self.profiler.maybe_toggle(step)
            if step % cfg.log_every_steps == 0:
                jax.block_until_ready(metrics)
                self._timings["step"].append(time.perf_counter() - t0)
                host = {k: float(v) for k, v in metrics.items()
                        if jnp.ndim(v) == 0}
                host["time/fetch"] = float(np.mean(self._timings["fetch"][-50:]))
                host["time/step"] = float(np.mean(self._timings["step"][-10:]))
                host["lr"] = float(self.schedule(step))
                self.log_fn(host, step)
            if val_iter_fn is not None and step % cfg.val_every_steps == 0:
                val_metrics = self.evaluate(val_iter_fn(), collect_preds=True)
                self.log_fn({f"val/{k}": v for k, v in val_metrics.items()}, step)
                acc = val_metrics.get("answer_acc_at1", 0.0)
                if acc > self.best_acc:
                    self.best_acc = acc
                    self.ckpt.save(step, self.state,
                                   {"answer_acc_at1": float(acc)})
                    # best_val_pred_answers.csv parity (solver.py:457-494)
                    if getattr(self, "last_predictions", None):
                        import csv
                        import os
                        path = os.path.join(self.cfg.train.ckpt_dir,
                                            "best_val_pred_answers.csv")
                        with open(path, "w", newline="") as fh:
                            w = csv.writer(fh)
                            w.writerow(["question_id", "pred_answer_id"])
                            w.writerows(self.last_predictions)
            if max_steps is not None and step >= max_steps:
                break
            t_fetch = time.perf_counter()
        self.ckpt.save(step, self.state)
        self.ckpt.wait()
        return self.state

    def evaluate(self, val_iter: Iterable,
                 collect_preds: bool = False) -> Dict[str, float]:
        tag = self.cfg.model.situation_loss_tag
        agg: Dict[str, list] = {}
        sit_agg: Dict[str, list] = {}
        key = jax.random.PRNGKey(self.cfg.train.seed + 7)
        n = 0
        breakdown: Dict[str, np.ndarray] = {}
        self.last_predictions: list = []
        for batch in val_iter:
            batch = dict(batch)
            qids = batch.pop("question_id", None)
            batch = shard_batch(batch, self.mesh)
            key, sub = jax.random.split(key)
            metrics, keep = self.eval_step(self.state, batch, sub)
            if collect_preds and qids is not None:
                pred = np.asarray(jnp.argmax(keep["answer_scores"], axis=-1))
                valid = np.asarray(batch.get(
                    "sample_valid", jnp.ones(len(pred), bool)))
                self.last_predictions.extend(
                    (int(q), int(p)) for q, p, v in
                    zip(np.asarray(qids), pred, valid) if v)
            bs = batch["answer_cat_scores"].shape[0]
            for k, v in metrics.items():
                if jnp.ndim(v) == 0:
                    agg.setdefault(k, []).append((float(v), bs))
                elif k.startswith("answer_acc_breakdown_"):
                    pair = np.asarray(v)  # (correct, count)
                    breakdown[k] = breakdown.get(k, 0) + pair
            if "aux_scores" in keep:
                sit = situation_metrics(
                    jax.tree_util.tree_map(np.asarray, keep),
                    {"auxiliary_task": np.asarray(batch["auxiliary_task"])},
                    tag,
                    np.asarray(batch["sample_valid"])
                    if "sample_valid" in batch else None)
                for k, v in sit.items():
                    sit_agg.setdefault(k, []).append((v, bs))
            n += bs
        out = {}
        for k, pairs in {**agg, **sit_agg}.items():
            tot = sum(w for _, w in pairs)
            out[k] = sum(v * w for v, w in pairs) / max(tot, 1)
        for k, pair in breakdown.items():
            out[k] = float(pair[0]) / max(float(pair[1]), 1.0)
        out["num_samples"] = n
        return out
