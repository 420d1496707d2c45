"""OpenScene Point3DLoader / FusedFeatureLoader tests
(lib/openscene/{point,feature}_loader.py parity at fixed shapes)."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from situation3d_tpu.data.openscene_loader import (IGNORE_LABEL,
                                                   FusedFeatureLoader,
                                                   Point3DLoader)


@pytest.fixture
def scene_dir(tmp_path):
    rng = np.random.RandomState(0)
    d = tmp_path / "scannet_3d" / "train"
    d.mkdir(parents=True)
    for i in range(2):
        n = 300 + 50 * i
        locs = rng.rand(n, 3).astype(np.float32) * 4
        feats = rng.rand(n, 3).astype(np.float32) * 2 - 1
        labels = rng.randint(0, 20, n).astype(np.int64)
        labels[:5] = -100
        torch.save((locs, feats, labels),
                   d / f"scene{i:04d}_00_vh_clean_2.pth")
    return tmp_path / "scannet_3d"


def test_point3d_loader(scene_dir):
    ds = Point3DLoader(str(scene_dir), voxel_size=0.05, split="train",
                       capacity=512, loop=2)
    assert len(ds) == 4
    item = ds[0]
    assert item["coords"].shape == (512, 3)
    assert item["feats"].shape == (512, 3)
    n = item["mask"].sum()
    assert 0 < n <= 512
    # -100 labels remapped to the 255 ignore value (point_loader.py:122)
    assert (item["labels"][:n] != -100).all()
    assert (item["labels"][item["mask"]] <= IGNORE_LABEL).all()
    # colors default to all-ones (point_loader.py:135-137)
    np.testing.assert_allclose(item["feats"][item["mask"]], 1.0)
    assert item["overflow"] == 0
    # loop wraps around to the same scenes
    assert ds[2]["mask"].sum() == ds[0]["mask"].sum()


def test_point3d_loader_eval_all_and_aug(scene_dir):
    ds = Point3DLoader(str(scene_dir), voxel_size=0.05, split="train",
                       aug_enabled=True, eval_all=True, capacity=512,
                       point_capacity=1024)
    item = ds[1]
    assert item["point_labels"].shape == (1024,)
    assert item["inds_reconstruct"].shape == (1024,)
    npts = item["point_mask"].sum()
    assert npts == 350
    # reconstruct indices point at valid voxel rows
    assert (item["inds_reconstruct"][:npts] < item["mask"].sum()).all()


def test_fused_feature_loader(scene_dir, tmp_path):
    rng = np.random.RandomState(1)
    feat_dir = tmp_path / "fused"
    feat_dir.mkdir()
    for i in range(2):
        n = 300 + 50 * i
        mask_full = rng.rand(n) < 0.7
        for k in range(2 if i == 0 else 1):
            torch.save({"feat": torch.tensor(
                rng.randn(int(mask_full.sum()), 8).astype(np.float32)),
                "mask_full": mask_full},
                feat_dir / f"scene{i:04d}_00_{k}.pt")
    ds = FusedFeatureLoader(str(scene_dir), str(feat_dir), voxel_size=0.05,
                            split="train", capacity=512)
    item = ds[0]
    assert item["feat_3d"].shape == (512, 8)
    nvis = item["feat_mask"].sum()
    assert 0 < nvis <= item["mask"].sum()
    # invisible voxels carry zero features (feature_loader.py:103-122)
    invis = item["mask"] & ~item["feat_mask"]
    np.testing.assert_allclose(item["feat_3d"][invis], 0.0)
    assert np.abs(item["feat_3d"][item["feat_mask"]]).sum() > 0

    # eval: features scattered to full resolution, all voxels scored
    import shutil
    val_dir = scene_dir / "val"
    val_dir.mkdir()
    for f in (scene_dir / "train").iterdir():
        shutil.copy(f, val_dir / f.name)
    ds_eval = FusedFeatureLoader(str(scene_dir), str(feat_dir),
                                 voxel_size=0.05, split="val", capacity=512,
                                 eval_all=True, point_capacity=1024)
    ev = ds_eval[1]
    assert ev["point_labels"].shape == (1024,)
    assert ev["feat_3d"].shape == (512, 8)


def test_fused_loader_drops_featureless_scenes(scene_dir, tmp_path):
    feat_dir = tmp_path / "fused_partial"
    feat_dir.mkdir()
    torch.save({"feat": torch.zeros(10, 4),
                "mask_full": np.ones(300, bool)},
               feat_dir / "scene0000_00_0.pt")
    ds = FusedFeatureLoader(str(scene_dir), str(feat_dir), voxel_size=0.05,
                            split="train", capacity=512)
    assert len(ds.data_paths) == 1  # scene0001 has no features -> dropped
