"""3D-LLM (Blip2T5) training and generation-evaluation wiring.

Replaces the LAVIS runner/task plumbing for the 3D path:
``RunnerBase.train`` / ``BaseTask._train_inner_loop``
(``runner_base.py:345-411``, ``base_task.py:151-235``) and the distributed
VQA eval with per-rank result JSONs merged by rank 0
(``VQATask.valid_step`` + ``BaseTask.save_result``,
``base_task.py:237-271``). Collectives come from pjit over the mesh; the
result merge writes one JSON per jax process and host 0 concatenates.
"""
from __future__ import annotations

import json
import os
from typing import Any, Callable, Dict, Iterable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from situation3d_tpu.config import Config
from situation3d_tpu.models.blip2_t5 import Blip2T5, predict_answers
from situation3d_tpu.parallel.mesh import make_mesh, shard_batch


def make_blip2_train_step(model: Blip2T5, tx: optax.GradientTransformation,
                          donate: bool = True) -> Callable:
    def train_step(state, batch):
        params, opt_state, step = state

        def loss_fn(p):
            return model.apply({"params": p}, batch, train=True)["loss"]

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state, step + 1), {"loss": loss}

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def train_blip2(cfg: Config, model: Blip2T5, params, train_iter: Iterable,
                max_steps: Optional[int] = None,
                log_fn: Optional[Callable] = None,
                steps_per_epoch: int = 1000):
    """Simple jitted loop (AMP/GradScaler of base_task.py:210-223 is
    unnecessary in bf16)."""
    from situation3d_tpu.train.optim import make_optimizer

    mesh = make_mesh(cfg.mesh)
    tx, schedule = make_optimizer(cfg.train, params, steps_per_epoch)
    step_fn = make_blip2_train_step(model, tx, cfg.train.donate_state)
    state = (params, tx.init(params), jnp.zeros((), jnp.int32))
    step = 0
    with mesh:
        for batch in train_iter:
            batch = shard_batch(
                {k: v for k, v in batch.items() if k != "question_id"}, mesh)
            state, metrics = step_fn(state, batch)
            step += 1
            if log_fn and step % cfg.train.log_every_steps == 0:
                log_fn({"loss": float(metrics["loss"]),
                        "lr": float(schedule(step))}, step)
            if max_steps and step >= max_steps:
                break
    return state[0]


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
