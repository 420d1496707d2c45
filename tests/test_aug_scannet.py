"""Tests: augmentations, ScanNet preprocessing, BN momentum schedule
(references: lib/openscene/augmentation.py, assets/data/scannet/*,
lib/solver.py BNMomentumScheduler)."""
import numpy as np

from situation3d_tpu.config import TrainConfig
from situation3d_tpu.data.augmentation import (chromatic_auto_contrast,
                                               chromatic_jitter,
                                               chromatic_translation,
                                               elastic_distortion,
                                               hsv_to_rgb,
                                               hue_saturation_translation,
                                               random_horizontal_flip,
                                               rgb_to_hsv)
from situation3d_tpu.data.scannet_preprocess import (ScannetDatasetConfig,
                                                     export_scene)
from situation3d_tpu.train.optim import bn_momentum_schedule


def test_chromatic_augs_in_range(rng):
    c = rng.rand(100, 3) * 255
    for fn in (chromatic_translation, chromatic_auto_contrast, chromatic_jitter,
               hue_saturation_translation):
        out = fn(c, rng)
        assert out.shape == c.shape
        assert out.min() >= 0 and out.max() <= 255.0 + 1e-6, fn.__name__


def test_hsv_roundtrip(rng):
    c = rng.rand(50, 3) * 255
    back = hsv_to_rgb(rgb_to_hsv(c))
    np.testing.assert_allclose(back, c, atol=1e-6)


def test_elastic_and_flip(rng):
    pts = rng.rand(200, 3) * 4
    out = elastic_distortion(pts, rng, granularity=0.5, magnitude=0.2)
    assert out.shape == pts.shape
    assert np.abs(out - pts).max() < 2.0  # bounded displacement
    flipped = random_horizontal_flip(pts, np.random.RandomState(3), p=1.0)
    # x and y flipped around their max, z untouched
    np.testing.assert_allclose(flipped[:, 2], pts[:, 2])
    np.testing.assert_allclose(flipped[:, 0], pts[:, 0].max() - pts[:, 0])


def test_export_scene():
    verts = np.concatenate([np.arange(10)[:, None].repeat(3, 1),
                            np.zeros((10, 3))], axis=1).astype(np.float64)
    seg_to_verts = {0: [0, 1, 2], 1: [3, 4], 2: [5, 6, 7]}
    object_id_to_segs = {1: [0, 1], 2: [2]}
    object_id_to_label = {1: 4, 2: 7}
    out = export_scene(verts, seg_to_verts, object_id_to_segs,
                       object_id_to_label)
    assert (out["semantic_labels"][:5] == 4).all()
    assert (out["semantic_labels"][5:8] == 7).all()
    assert (out["instance_labels"][:5] == 1).all()
    assert out["instance_bboxes"].shape == (2, 7)
    # bbox of object 1 covers vertices 0..4: center 2, size 4 along x
    np.testing.assert_allclose(out["instance_bboxes"][0, 0], 2.0)
    np.testing.assert_allclose(out["instance_bboxes"][0, 3], 4.0)


def test_scannet_config():
    dc = ScannetDatasetConfig()
    assert dc.num_class == 18
    assert dc.nyu40id2class[3] == 0 and dc.nyu40id2class[39] == 17
    cls, res = dc.size2class(np.array([2.0, 1.0, 1.0]), "bed")
    np.testing.assert_allclose(dc.class2size(cls, res), [2.0, 1.0, 1.0])
    assert dc.angle2class(0.3) == (0, 0.3)


def test_bn_momentum_schedule():
    cfg = TrainConfig(bn_momentum_init=0.5, bn_momentum_decay=0.5,
                      bn_momentum_step=20)
    assert abs(bn_momentum_schedule(cfg, 0) - 0.5) < 1e-9
    assert abs(bn_momentum_schedule(cfg, 20) - 0.75) < 1e-9
    assert bn_momentum_schedule(cfg, 1000) == 0.99  # floor at torch 0.01
