"""Blip2Trainer tests: T5 freezing, checkpoint/resume, best-model reload,
val-during-training (runner_base.py:345-596 / runner_iter.py:25 parity)."""
import itertools

import jax
import numpy as np
import pytest

from situation3d_tpu.config import Config, apply_overrides
from situation3d_tpu.data.threedvqa import (eval_batches, gold_answers,
                                            synthetic_threedvqa,
                                            train_batches)
from situation3d_tpu.models.blip2_t5 import Blip2T5
from situation3d_tpu.train.blip2_trainer import Blip2Trainer


TINY_BLIP2_OPTS = [
    "blip2.qformer.num_query_tokens=4", "blip2.qformer.hidden_size=32",
    "blip2.qformer.num_layers=2", "blip2.qformer.num_heads=4",
    "blip2.qformer.intermediate_size=64",
    "blip2.qformer.encoder_width=48",
    "blip2.qformer.scene_token_capacity=32",
    "blip2.t5.vocab_size=256", "blip2.t5.d_model=32", "blip2.t5.d_kv=8",
    "blip2.t5.d_ff=64", "blip2.t5.num_layers=2",
    "blip2.t5.num_decoder_layers=2", "blip2.t5.num_heads=4",
    "blip2.t5.max_answer_len=8", "blip2.pc_feat_dim=48",
    "blip2.max_txt_len=16",
    "mesh.data_parallel=1",  # dp=8 sharding is covered by dryrun/test_collectives
    "train.batch_size=4", "train.log_every_steps=1", "train.lr=1e-3",
    "train.lr_schedule=step", "train.lr_decay_steps=1000,",
    "eval.max_gen_len=4",
]


def tiny_cfg(tmp_path, extra=()):
    return apply_overrides(Config(), [
        *TINY_BLIP2_OPTS,
        f"train.ckpt_dir={tmp_path}/ckpt",
        *extra,
    ])


def make_ds(cfg, n_scenes=2, per_scene=4):
    return synthetic_threedvqa(cfg.blip2, n_scenes, per_scene, n_points=32)


def init_trainer(cfg, ds, **kw):
    model = Blip2T5(cfg.blip2)
    example = next(train_batches(ds, cfg.train.batch_size, seed=0))
    import jax.numpy as jnp
    batch = {k: jnp.asarray(v) for k, v in example.items()
             if k != "question_id"}
    params = model.init(jax.random.PRNGKey(0), batch)["params"]
    return Blip2Trainer(cfg, model, steps_per_epoch=4, params=params,
                        text_decoder=ds.text.decode, **kw)


def test_t5_frozen_except_embeddings(tmp_path):
    """blip2_t5.py:84-89: only shared + lm_head of T5 may move."""
    cfg = tiny_cfg(tmp_path)
    ds = make_ds(cfg)
    trainer = init_trainer(cfg, ds)
    p0 = jax.tree_util.tree_map(np.asarray, trainer.state.params)
    trainer.fit(train_batches(ds, 4, seed=1, epochs=None), max_steps=3)
    p1 = trainer.state.params

    frozen_b = jax.tree_util.tree_leaves(
        {k: v for k, v in p0["t5"].items() if k in ("encoder", "decoder")})
    frozen_a = jax.tree_util.tree_leaves(
        {k: v for k, v in p1["t5"].items() if k in ("encoder", "decoder")})
    for x, y in zip(frozen_b, frozen_a):
        np.testing.assert_array_equal(x, np.asarray(y))

    assert not np.allclose(p0["t5"]["shared"]["embedding"],
                           np.asarray(p1["t5"]["shared"]["embedding"]))
    assert not np.allclose(p0["t5"]["lm_head"]["kernel"],
                           np.asarray(p1["t5"]["lm_head"]["kernel"]))
    assert not np.allclose(p0["t5_proj"]["kernel"],
                           np.asarray(p1["t5_proj"]["kernel"]))


def test_unfrozen_when_config_off(tmp_path):
    cfg = tiny_cfg(tmp_path, ["blip2.freeze_t5_except_embeddings=false"])
    ds = make_ds(cfg)
    trainer = init_trainer(cfg, ds)
    enc_before = np.asarray(jax.tree_util.tree_leaves(
        trainer.state.params["t5"]["encoder"])[0])
    trainer.fit(train_batches(ds, 4, seed=1, epochs=None), max_steps=2)
    enc_after = np.asarray(jax.tree_util.tree_leaves(
        trainer.state.params["t5"]["encoder"])[0])
    assert not np.allclose(enc_before, enc_after)


def test_resume_reproduces_loss_curve(tmp_path):
    """runner_base.py:576-596: resume restores model+optimizer+step and the
    continued run matches an uninterrupted one."""
    cfg = tiny_cfg(tmp_path, ["train.iters_per_inner_epoch=2"])
    ds = make_ds(cfg)

    losses_a = []
    tr_a = init_trainer(cfg, ds,
                        log_fn=lambda m, s: losses_a.append((s, m.get("loss"))))
    tr_a.fit(train_batches(ds, 4, seed=1, epochs=None), max_steps=4)
    assert int(tr_a.state.step) == 4

    # interrupted run: 2 steps, checkpoint, then a fresh trainer resumes
    cfg_b = tiny_cfg(f"{tmp_path}/b", ["train.iters_per_inner_epoch=2"])
    losses_b = []
    tr_b = init_trainer(cfg_b, ds,
                        log_fn=lambda m, s: losses_b.append((s, m.get("loss"))))
    batches = train_batches(ds, 4, seed=1, epochs=None)
    tr_b.fit(itertools.islice(batches, 2), max_steps=4)
    tr_b.ckpt.wait()
    assert int(tr_b.state.step) == 2

    tr_c = init_trainer(cfg_b, ds,
                        log_fn=lambda m, s: losses_b.append((s, m.get("loss"))))
    assert tr_c.resume()
    assert int(tr_c.state.step) == 2
    # same data order as the uninterrupted run's steps 3-4
    rest = train_batches(ds, 4, seed=1, epochs=None)
    next(rest), next(rest)
    tr_c.fit(rest, max_steps=4)

    a = dict(losses_a)
    b = dict(losses_b)
    for s in (3, 4):
        assert a[s] == pytest.approx(b[s], rel=1e-4), (s, a[s], b[s])


def test_val_during_training_and_best_reload(tmp_path):
    cfg = tiny_cfg(tmp_path, ["train.iters_per_inner_epoch=2"])
    ds = make_ds(cfg)
    val = make_ds(cfg, n_scenes=1, per_scene=2)
    golds, _ = gold_answers(val)
    logs = []
    trainer = init_trainer(cfg, ds, log_fn=lambda m, s: logs.append((s, m)))
    trainer.fit(train_batches(ds, 4, seed=1, epochs=None),
                val_iter_fn=lambda: eval_batches(val, 4),
                golds=golds, max_steps=4)
    val_logs = [(s, m) for s, m in logs if "val/em" in m]
    assert [s for s, _ in val_logs] == [2, 4]
    # best trainable-only dump written (runner_base.py:530-554)
    import os
    assert os.path.exists(os.path.join(cfg.train.ckpt_dir,
                                       "checkpoint_best_trainable.npz"))
    # reload_best found a metric-stamped checkpoint
    assert trainer.ckpt.best_step("val_em") in (2, 4)


def test_trainable_npz_roundtrip(tmp_path):
    from situation3d_tpu.train.checkpoint import (load_trainable_npz,
                                                  save_trainable_npz)
    cfg = tiny_cfg(tmp_path)
    ds = make_ds(cfg)
    trainer = init_trainer(cfg, ds)
    path = f"{tmp_path}/trainable.npz"
    n = save_trainable_npz(path, trainer.state.params, trainer.trainable)
    assert n > 0
    # perturb trainable + frozen leaves, then load: trainable restored,
    # frozen untouched
    perturbed = jax.tree_util.tree_map(lambda x: x + 1.0, trainer.state.params)
    merged = load_trainable_npz(path, perturbed)
    np.testing.assert_allclose(
        np.asarray(merged["t5"]["shared"]["embedding"]),
        np.asarray(trainer.state.params["t5"]["shared"]["embedding"]))
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(merged["t5"]["encoder"])[0]),
        np.asarray(jax.tree_util.tree_leaves(perturbed["t5"]["encoder"])[0]))
