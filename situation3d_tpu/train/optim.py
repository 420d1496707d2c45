"""Optimizer and LR schedule construction.

Replaces the reference's optimizer wiring: AdamW with weight-decay/no-decay
parameter split (``runner_base.py:100-129`` and ``train.py:211-224``), frozen
parameter filters (``CONF.TRAIN.no_update_filter=['openscene_net']``,
``lib/config.py:61``), ``clip_grad_value_`` (``lib/solver.py:624``), and the
LR schedules: Step/MultiStep (``lib/solver.py``),
LinearWarmupCosine/LinearWarmupStep (``lavis/common/optims.py:14-98``).
"""
from __future__ import annotations

from typing import Any, Dict, Iterable, Tuple

import jax
import jax.numpy as jnp
import optax

from situation3d_tpu.config import TrainConfig
from situation3d_tpu.utils.registry import registry


@registry.register_lr_schedule("step")
def step_schedule(cfg: TrainConfig, steps_per_epoch: int):
    """Decay by lr_decay_rate at each epoch in lr_decay_steps."""
    boundaries = {int(e) * steps_per_epoch: cfg.lr_decay_rate
                  for e in cfg.lr_decay_steps}
    return optax.piecewise_constant_schedule(cfg.lr, boundaries)


@registry.register_lr_schedule("multistep")
def multistep_schedule(cfg: TrainConfig, steps_per_epoch: int):
    return step_schedule(cfg, steps_per_epoch)


@registry.register_lr_schedule("warmup_cosine")
def warmup_cosine_schedule(cfg: TrainConfig, steps_per_epoch: int):
    """LinearWarmupCosineLRScheduler (optims.py:14-54): per-step warmup from
    min_lr (warmup_lr in LAVIS is 1e-8 by default but configs use lr/10; we
    warm from 0) then cosine to min_lr over all epochs."""
    total = max(cfg.epochs * steps_per_epoch, cfg.warmup_steps + 1)
    return optax.warmup_cosine_decay_schedule(
        init_value=0.0, peak_value=cfg.lr, warmup_steps=cfg.warmup_steps,
        decay_steps=total, end_value=cfg.min_lr)


@registry.register_lr_schedule("warmup_step")
def warmup_step_schedule(cfg: TrainConfig, steps_per_epoch: int):
    base = step_schedule(cfg, steps_per_epoch)
    warm = optax.linear_schedule(0.0, cfg.lr, cfg.warmup_steps)
    return optax.join_schedules([warm, base], [cfg.warmup_steps])


def _decay_mask(params) -> Any:
    """True where weight decay applies: kernels/embeddings, not bias/norm
    (runner_base.py:106-116: ndim<2 or bias/ln/bn get no decay)."""
    def mask(path, leaf):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        return leaf.ndim >= 2 and name not in ("bias", "scale")
    return jax.tree_util.tree_map_with_path(mask, params)


def _frozen_mask(params, prefixes: Tuple[str, ...]) -> Any:
    """True where the parameter is trainable (not under a frozen prefix)."""
    def trainable(path, leaf):
        keys = [p.key if hasattr(p, "key") else str(p) for p in path]
        return not any(any(k.startswith(pref) for k in keys) for pref in prefixes)
    return jax.tree_util.tree_map_with_path(trainable, params)


def make_optimizer(cfg: TrainConfig, params, steps_per_epoch: int = 1000
                   ) -> Tuple[optax.GradientTransformation, optax.Schedule]:
    schedule = registry.get("lr_schedule", cfg.lr_schedule)(cfg, steps_per_epoch)
    tx = optax.chain(
        optax.clip(cfg.grad_clip_value),  # clip_grad_value_ analogue
        optax.adamw(
            learning_rate=schedule,
            weight_decay=cfg.weight_decay,
            mask=_decay_mask(params),
        ),
    )
    if cfg.frozen_prefixes:
        tx = optax.chain(
            tx,
            optax.masked(
                optax.set_to_zero(),
                jax.tree_util.tree_map(
                    lambda t: not t, _frozen_mask(params, tuple(cfg.frozen_prefixes))),
            ),
        )
    if cfg.grad_accum_steps > 1:
        tx = optax.MultiSteps(tx, cfg.grad_accum_steps)
    return tx, schedule


def bn_momentum_schedule(cfg: TrainConfig, epoch: int) -> float:
    """BN momentum decay (lib/solver.py:249-257 BNMomentumScheduler /
    pytorch_utils.BNMomentumScheduler): momentum = init * decay^(epoch//step),
    floored at 0.01. Returned value feeds SparseBatchNorm's per-call
    ``momentum`` override (our BN stores the running-average weight, i.e.
    1 - torch_momentum)."""
    torch_momentum = max(
        cfg.bn_momentum_init
        * cfg.bn_momentum_decay ** (epoch // max(cfg.bn_momentum_step, 1)),
        0.01,
    )
    return 1.0 - torch_momentum
