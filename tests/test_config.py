import pytest

from situation3d_tpu.config import Config, apply_overrides, load_config, save_config


def test_defaults():
    cfg = Config()
    assert cfg.model.num_scene_tokens == 256
    assert cfg.sparse.planes == (32, 64, 128, 256, 128, 128, 96, 96)


def test_overrides():
    cfg = apply_overrides(Config(), ["train.lr=1e-3", "model.lang_model=lstm",
                                     "train.lr_decay_steps=10,20"])
    assert cfg.train.lr == 1e-3
    assert cfg.model.lang_model == "lstm"
    assert cfg.train.lr_decay_steps == (10, 20)


def test_unknown_key_raises():
    with pytest.raises(KeyError):
        apply_overrides(Config(), ["train.nope=1"])


def test_yaml_roundtrip(tmp_path):
    cfg = apply_overrides(Config(), ["train.batch_size=8"])
    p = tmp_path / "c.yaml"
    save_config(cfg, str(p))
    cfg2 = load_config(str(p))
    assert cfg2.train.batch_size == 8
    assert cfg2.sparse.capacities == cfg.sparse.capacities
