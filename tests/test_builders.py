"""YAML build_info dataset-builder tests (base_dataset_builder.py parity)."""
import json
import os

import numpy as np
import pytest

from situation3d_tpu.config import Config
from situation3d_tpu.data.builders import (build_datasets_from_yaml,
                                           get_cache_path,
                                           load_dataset_config)

torch = pytest.importorskip("torch")


def _write_fixture(tmp_path):
    cache = tmp_path / "cache"
    feat_dir = cache / "sqa3d" / "features"
    ann_dir = cache / "sqa3d" / "annotations"
    feat_dir.mkdir(parents=True)
    ann_dir.mkdir(parents=True)
    rng = np.random.RandomState(0)
    for sid in ("scene0000_00", "scene0001_00"):
        torch.save(torch.tensor(rng.randn(40, 1408).astype(np.float32)),
                   feat_dir / f"{sid}.pt")
        np.save(feat_dir / f"{sid}.npy",
                rng.randint(0, 128, (40, 3)).astype(np.int32))
    recs = [{"scene_id": "scene0000_00", "question": "what is it?",
             "question_id": "q0", "answers": ["chair"]},
            {"scene_id": "scene0001_00", "question": "where am i?",
             "question_id": "q1", "answers": ["desk", "table"]},
            {"scene_id": "scene_missing", "question": "dropped?",
             "question_id": "q2", "answers": ["x"]}]
    (ann_dir / "SQA_train.json").write_text(json.dumps(recs))
    (ann_dir / "SQA_val.json").write_text(json.dumps(recs[:1]))
    yml = tmp_path / "ds.yaml"
    yml.write_text("""
datasets:
  3d_vqa:
    data_type: features
    build_info:
      annotations:
        train: {storage: [sqa3d/annotations/SQA_train.json]}
        val:   {storage: [sqa3d/annotations/SQA_val.json]}
      features:
        storage: sqa3d/features/
""")
    return cache, yml


def test_build_from_yaml(tmp_path):
    cache, yml = _write_fixture(tmp_path)
    ds_cfg = load_dataset_config(str(yml))
    assert ds_cfg["name"] == "3d_vqa"
    assert "train" in ds_cfg["build_info"]["annotations"]

    cfg = Config()
    datasets = build_datasets_from_yaml(cfg, str(yml), cache_root=str(cache))
    assert set(datasets) == {"train", "val"}
    # the record whose scene has no feature file is filtered
    # (threedvqa_datasets.py:37-44 scene filtering)
    assert len(datasets["train"]) == 2
    assert len(datasets["val"]) == 1
    s = datasets["train"].sample(0, answer="chair")
    assert s["pc_feat"].shape[1] == 1408
    assert s["labels"].dtype == np.int32


def test_cache_path_resolution(tmp_path):
    assert get_cache_path("/abs/x", "root") == "/abs/x"
    assert get_cache_path("./rel/x", "root") == "./rel/x"
    assert get_cache_path("a/b", "root") == os.path.join("root", "a/b")


def test_missing_vis_storage_warns(tmp_path):
    yml = tmp_path / "ds.yaml"
    yml.write_text("""
datasets:
  3d_vqa:
    build_info:
      annotations: {}
      features: {storage: nowhere/}
""")
    with pytest.warns(UserWarning, match="does not exist"):
        build_datasets_from_yaml(Config(), str(yml),
                                 cache_root=str(tmp_path))
