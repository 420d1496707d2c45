"""Optimizer and LR schedule construction.

Replaces the reference's optimizer wiring: AdamW with weight-decay/no-decay
parameter split (``runner_base.py:100-129`` and ``train.py:211-224``), frozen
parameter filters (``CONF.TRAIN.no_update_filter=['openscene_net']``,
``lib/config.py:61``), ``clip_grad_value_`` (``lib/solver.py:624``), and the
LR schedules: Step/MultiStep (``lib/solver.py``),
LinearWarmupCosine/LinearWarmupStep (``lavis/common/optims.py:14-98``).

Freezing is TPU-native: instead of ``requires_grad=False`` flags we build a
boolean "trainable" pytree and route frozen leaves through
``optax.set_to_zero`` inside ``optax.multi_transform``. Frozen parameters
carry **no Adam moments** (for frozen FlanT5-XL that is the difference
between fitting and not fitting a v5e chip), and because their updates are
constants inside the jitted train step, XLA dead-code-eliminates the weight-
gradient matmuls of frozen layers from the backward pass.

Path-predicate masks cover the reference's three freezing recipes:
- ``frozen_prefixes`` — ``no_update_filter=['openscene_net']``
  (``lib/config.py:61``);
- ``lang_freeze_trainable`` — BERT frozen except the last encoder layer
  (``sep_lang_module_bert.py:25-45``: freeze_bert / finetune_bert_last_layer
  / finetune_bert_full);
- ``t5_embed_only_trainable`` — T5 frozen except input/output embeddings
  (``blip2_t5.py:84-89``).
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Iterable, Optional, Sequence, Tuple

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


# ---------------------------------------------------------------------------
# Trainable-parameter masks (the requires_grad replacement)
# ---------------------------------------------------------------------------

def path_names(path) -> Tuple[str, ...]:
    """Flax param-tree path -> tuple of string keys."""
    return tuple(p.key if hasattr(p, "key") else str(p) for p in path)


def mask_from_predicate(params, trainable_fn: Callable[[Tuple[str, ...]], bool]):
    """Boolean pytree: True where ``trainable_fn(path_names)`` says trainable."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: bool(trainable_fn(path_names(path))), params)


def combine_masks(*masks):
    """Logical AND of boolean pytrees (trainable iff trainable under all)."""
    if not masks:
        return None
    out = masks[0]
    for m in masks[1:]:
        out = jax.tree_util.tree_map(lambda a, b: a and b, out, m)
    return out


def prefix_trainable(params, prefixes: Tuple[str, ...]):
    """True where the parameter is NOT under any frozen prefix
    (``no_update_filter`` parity, lib/config.py:61)."""
    def fn(names):
        return not any(any(k.startswith(pref) for k in names)
                       for pref in prefixes)
    return mask_from_predicate(params, fn)


def lang_freeze_trainable(params, mode: str, num_layers: int,
                          module: str = "lang_net"):
    """Language-encoder freeze recipe (sep_lang_module_bert.py:25-45).

    mode: "none" (finetune_bert_full) | "all" (freeze_bert) |
    "last_layer" (finetune_bert_last_layer: only encoder.layer[-1] trains).
    Everything outside ``module`` stays trainable.
    """
    if mode not in ("none", "all", "last_layer"):
        raise ValueError(f"invalid lang_freeze mode {mode!r}")
    last = f"layer{num_layers - 1}"

    def fn(names):
        if module not in names:
            return True
        if mode == "none":
            return True
        if mode == "all":
            return False
        return last in names
    return mask_from_predicate(params, fn)


def t5_embed_only_trainable(params, module: str = "t5",
                            keep: Tuple[str, ...] = ("shared", "lm_head")):
    """T5 frozen except input/output embeddings (blip2_t5.py:84-89: only
    ``shared`` and ``lm_head`` have requires_grad=True)."""
    def fn(names):
        if module not in names:
            return True
        i = names.index(module)
        return len(names) > i + 1 and names[i + 1] in keep
    return mask_from_predicate(params, fn)


def trainable_count(params, trainable) -> Tuple[int, int]:
    """(n_trainable, n_total) parameter counts for logging."""
    sizes = jax.tree_util.tree_map(lambda x: int(x.size), params)
    tr = jax.tree_util.tree_map(lambda s, t: s if t else 0, sizes, trainable)
    return (sum(jax.tree_util.tree_leaves(tr)),
            sum(jax.tree_util.tree_leaves(sizes)))


# ---------------------------------------------------------------------------
# Optimizer
# ---------------------------------------------------------------------------

def _decay_mask(params) -> Any:
    """True where weight decay applies: kernels/embeddings, not bias/norm
    (runner_base.py:106-116: ndim<2 or bias/ln/bn get no decay)."""
    def mask(path, leaf):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        return getattr(leaf, "ndim", 0) >= 2 and name not in ("bias", "scale")
    return jax.tree_util.tree_map_with_path(mask, params)


def make_optimizer(cfg: TrainConfig, params, steps_per_epoch: int = 1000,
                   trainable=None
                   ) -> Tuple[optax.GradientTransformation, optax.Schedule]:
    """AdamW + clip + schedule, with frozen leaves routed to set_to_zero.

    ``trainable`` is an optional boolean pytree (see the mask builders
    above); it is ANDed with the ``cfg.frozen_prefixes`` mask. Frozen leaves
    get no optimizer state and zero updates.
    """
    schedule = registry.get("lr_schedule", cfg.lr_schedule)(cfg, steps_per_epoch)
    masks = []
    if cfg.frozen_prefixes:
        masks.append(prefix_trainable(params, tuple(cfg.frozen_prefixes)))
    if trainable is not None:
        masks.append(trainable)
    mask = combine_masks(*masks)

    inner = optax.chain(
        optax.clip(cfg.grad_clip_value),  # clip_grad_value_ analogue
        optax.adamw(
            learning_rate=schedule,
            weight_decay=cfg.weight_decay,
            mask=_decay_mask,  # callable: evaluated on the (masked) tree
        ),
    )
    if mask is None or all(jax.tree_util.tree_leaves(mask)):
        tx = inner
    else:
        labels = jax.tree_util.tree_map(
            lambda t: "train" if t else "freeze", mask)
        tx = optax.multi_transform(
            {"train": inner, "freeze": optax.set_to_zero()}, labels)
    if cfg.grad_accum_steps > 1:
        tx = optax.MultiSteps(tx, cfg.grad_accum_steps)
    return tx, schedule


def sig3d_trainable_mask(cfg, params):
    """SIG3D trainable mask from the full Config: lang_freeze recipe
    (model.lang_freeze) on top of the prefix filter handled by
    make_optimizer itself."""
    return lang_freeze_trainable(params, cfg.model.lang_freeze,
                                 cfg.lang.num_layers)


def blip2_trainable_mask(cfg, params):
    """Blip2T5 trainable mask: T5 frozen except embeddings when
    cfg.blip2.freeze_t5_except_embeddings (blip2_t5.py:84-89)."""
    if cfg.blip2.freeze_t5_except_embeddings:
        return t5_embed_only_trainable(params)
    return jax.tree_util.tree_map(lambda _: True, params)


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
