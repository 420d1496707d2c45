"""Trainer + data pipeline + multichip tests on the 8-device CPU mesh
(reference: lib/solver.py Solver loop; DDP/NCCL replaced by mesh sharding)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import __graft_entry__ as graft
from situation3d_tpu.config import Config, apply_overrides
from situation3d_tpu.data.sqa3d import batch_iterator, question_type_id
from situation3d_tpu.data.synthetic import make_synthetic_dataset
from situation3d_tpu.data.vocab import AnswerVocab, build_answer_vocab
from situation3d_tpu.models.sig3d import SIG3D
from situation3d_tpu.parallel.mesh import make_mesh, shard_batch
from situation3d_tpu.train.trainer import (Trainer, create_train_state,
                                           make_sig3d_optimizer,
                                           make_train_step)


def tiny_cfg(extra=()):
    return apply_overrides(Config(), [
        "lang.num_layers=1", "lang.hidden_size=32", "lang.num_heads=2",
        "lang.intermediate_size=64", "lang.vocab_size=30528",
        "model.hidden_size=32", "model.mcan_num_heads=2",
        "model.mcan_num_layers=1",
        "model.mcan_flat_mlp_size=16", "model.mcan_flat_out_size=24",
        "model.num_scene_tokens=8", "model.scene_feat_dim=24",
        "sparse.planes=4,8,12,24,12,12,8,8", "sparse.layers=1,1,1,1,1,1,1,1",
        "sparse.init_dim=4", "sparse.bottleneck_channels=24",
        "sparse.capacities=2048,1024,512,256,128",
        # coarse voxels + small grid: with conv0_zwin the level-0 feature
        # grid is extent-shaped ([n_rows, 128] f32); the default 512x512x256
        # extent is ~1.1 GB per device, which on an 8-device CPU mesh
        # starves the collective rendezvous into a hard abort. 0.08 m
        # voxels keep the whole rotated synthetic scene (~7.8 m diagonal)
        # inside 128x128x64 cells.
        "data.voxel_size=0.08", "sparse.grid_extent=(128,128,64)",
        "data.voxel_capacity=2048", "data.num_answers=12",
        "data.max_text_len=24",
        "train.batch_size=8", "train.log_every_steps=1",
        "train.val_every_steps=1000",
        *extra,
    ])


def test_question_type():
    assert question_type_id("What is this") == 0
    assert question_type_id("Are you ok") == 1
    assert question_type_id("describe it") == 8


def test_answer_vocab():
    vocab = build_answer_vocab({"yes": 10, "no": 5, "rare": 1}, min_freq=2)
    assert len(vocab) == 2
    assert vocab.stoi("yes") == 0
    assert vocab.stoi("rare") == -1


def test_synthetic_dataset_schema():
    cfg = tiny_cfg()
    ds = make_synthetic_dataset(cfg, n_scenes=1, per_scene=2, n_points=3000)
    s = ds[0]
    assert s["voxel_coords"].shape == (2048, 3)
    assert s["voxel_mask"].sum() > 100
    assert s["auxiliary_task"].shape == (7,)
    assert s["s_ids"].shape == (24,)
    # voxel coords non-negative, within pack bounds
    assert s["voxel_coords"].min() >= 0
    assert s["voxel_coords"].max() < 1024
    assert s["answer_cats"].sum() >= 1


def test_batch_iterator_padding():
    cfg = tiny_cfg()
    ds = make_synthetic_dataset(cfg, n_scenes=1, per_scene=3, n_points=2000)
    batches = list(batch_iterator(ds, 2, shuffle=False, drop_last=False))
    assert len(batches) == 2
    assert batches[1]["sample_valid"].tolist() == [True, False]


def _training_batches(cfg, n_batches, B):
    ds = make_synthetic_dataset(
        cfg, n_scenes=2, per_scene=max(2, B * n_batches // 2), n_points=4000)
    it = batch_iterator(ds, B, shuffle=True, seed=0)
    out = []
    for i, b in enumerate(it):
        if i >= n_batches:
            break
        b.pop("sample_valid")
        b.pop("question_id")
        b.pop("answer_cat")
        b.pop("answer_cats")
        out.append(b)
    return out


def test_train_step_loss_decreases_dp8():
    """Full data-parallel training step over the 8-device mesh: loss must
    decrease on a repeated batch (overfit smoke, replaces a DDP convergence
    run)."""
    cfg = tiny_cfg(["mesh.data_parallel=8", "train.lr=1e-3",
                    "train.lr_schedule=step", "train.lr_decay_steps=1000,"])
    mesh = make_mesh(cfg.mesh)
    model = SIG3D(cfg, num_answers=cfg.data.num_answers)
    [batch] = _training_batches(cfg, 1, 8)
    state = create_train_state(cfg, model, batch, steps_per_epoch=100)
    tx, _ = make_sig3d_optimizer(cfg, state.params, 100)
    step = make_train_step(cfg, model, tx, donate=False)
    with mesh:
        b = shard_batch(batch, mesh)
        losses = []
        for _ in range(8):
            state, metrics = step(state, b)
            losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0] * 0.9, losses
    assert int(state.step) == 8


def test_frozen_scene_encoder():
    """scene_encoder params must not move (CONF.TRAIN.no_update_filter)."""
    cfg = tiny_cfg(["mesh.data_parallel=8", "train.lr=1e-2"])
    mesh = make_mesh(cfg.mesh)
    model = SIG3D(cfg, num_answers=cfg.data.num_answers)
    [batch] = _training_batches(cfg, 1, 8)
    state = create_train_state(cfg, model, batch, steps_per_epoch=100)
    tx, _ = make_sig3d_optimizer(cfg, state.params, 100)
    step = make_train_step(cfg, model, tx, donate=False)
    before = jax.tree_util.tree_map(np.asarray, state.params["scene_encoder"])
    # with num_layers=1, layer0 IS the last layer: trainable under the
    # default lang_freeze="last_layer"; embeddings must stay frozen
    lang_before = np.asarray(
        state.params["lang_net"]["encoder"]["layer0"]["attention"]["q"]["kernel"])
    emb_before = np.asarray(
        state.params["lang_net"]["encoder"]["word_embeddings"]["embedding"])
    with mesh:
        b = shard_batch(batch, mesh)
        for _ in range(2):
            state, _ = step(state, b)
    after = state.params["scene_encoder"]
    flat_b = jax.tree_util.tree_leaves(before)
    flat_a = [np.asarray(x) for x in jax.tree_util.tree_leaves(after)]
    for x, y in zip(flat_b, flat_a):
        np.testing.assert_array_equal(x, y)
    # the last (here: only) bert layer did move, the embeddings did not
    # (finetune_bert_last_layer, sep_lang_module_bert.py:33-40)
    lang_after = np.asarray(
        state.params["lang_net"]["encoder"]["layer0"]["attention"]["q"]["kernel"])
    assert not np.allclose(lang_before, lang_after)
    np.testing.assert_array_equal(
        emb_before,
        np.asarray(state.params["lang_net"]["encoder"]["word_embeddings"]["embedding"]))


def test_trainer_fit_and_evaluate(tmp_path):
    cfg = tiny_cfg(["mesh.data_parallel=8",
                    f"train.ckpt_dir={tmp_path}/ckpt"])
    model = SIG3D(cfg, num_answers=cfg.data.num_answers)
    ds = make_synthetic_dataset(cfg, n_scenes=2, per_scene=8, n_points=4000)

    def clean(it):
        for b in it:
            b.pop("question_id")
            b.pop("answer_cat")
            yield b

    example = next(clean(batch_iterator(ds, 8, shuffle=False)))
    logs = []
    trainer = Trainer(cfg, model, steps_per_epoch=2, example_batch=example,
                      log_fn=lambda m, s: logs.append((s, m)))
    trainer.fit(clean(batch_iterator(ds, 8, shuffle=True, epochs=2)),
                max_steps=3)
    assert int(trainer.state.step) == 3
    assert trainer.ckpt.latest_step() == 3
    assert any("loss" in m for _, m in logs)

    val = trainer.evaluate(clean(batch_iterator(ds, 8, shuffle=False,
                                                drop_last=False)))
    assert 0.0 <= val["answer_acc_at1"] <= 1.0
    assert "situation_acc_0_5m" in val
    assert val["num_samples"] == 16

    # resume restores the state
    restored = trainer.ckpt.restore(trainer.state)
    assert int(restored.step) == 3
    trainer.ckpt.close()


def test_graft_dryrun_multichip():
    graft.dryrun_multichip(8)


def test_scene_cache_eval_cli():
    """--scene-cache eval path: scene-grouped evaluation through
    eval/serving.SceneCache matches the metric surface of Trainer.evaluate."""
    from situation3d_tpu.cli.eval import run_cached_eval
    from situation3d_tpu.data.synthetic import make_synthetic_dataset
    from situation3d_tpu.train.tasks import setup_task
    from situation3d_tpu.utils.misc import setup_logger

    cfg = tiny_cfg(["eval.batch_size=4"])
    task = setup_task("sqa3d", cfg, synthetic=True)
    ds = make_synthetic_dataset(cfg, n_scenes=2, per_scene=5, split="val",
                                seed=1)
    from situation3d_tpu.data.sqa3d import batch_iterator
    example = task.clean_batch(next(batch_iterator(ds, 4, shuffle=False)))
    model = task.build_model()
    trainer = task.build_trainer(model, example, steps_per_epoch=1)
    metrics = run_cached_eval(cfg, task, ds, trainer, setup_logger())
    assert 0.0 <= metrics["answer_acc_at1"] <= 1.0
    assert 0.0 <= metrics["answer_acc_at10"] <= 1.0
    # breakdown pairs sum to the question count
    counts = sum(v[1] for k, v in metrics.items()
                 if k.startswith("answer_acc_breakdown_"))
    assert counts == 10
