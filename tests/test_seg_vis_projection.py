"""Tests: segmentation mIoU, visualization export, 2D->3D projection, ENet
(references: situation3d/utils/segmentation_util.py, visualization.py,
lib/projection.py, lib/enet.py)."""
import os

import jax
import jax.numpy as jnp
import numpy as np

from situation3d_tpu.eval.segmentation import (SCANNET_LABELS_20,
                                               confusion_matrix, evaluate,
                                               miou_from_confusion,
                                               precompute_text_features,
                                               segment_points)
from situation3d_tpu.eval.visualization import (activation_colors,
                                                create_arrow,
                                                export_scene_visualization,
                                                write_obj_mesh,
                                                write_ply_points)
from situation3d_tpu.models.enet import ENetForMultiview
from situation3d_tpu.ops.projection import (CameraIntrinsics,
                                            backproject_features,
                                            multiview_backproject,
                                            project_points)


def test_miou_perfect_and_partial():
    gt = np.array([0, 0, 1, 1, 255])
    pred = np.array([0, 0, 1, 1, 3])
    m = evaluate(pred, gt, ["a", "b", "c", "d"])
    assert m["mIoU"] == 1.0 and m["accuracy"] == 1.0
    pred2 = np.array([0, 1, 1, 1, 3])
    m2 = evaluate(pred2, gt, ["a", "b", "c", "d"])
    assert m2["accuracy"] == 0.75
    assert abs(m2["iou/a"] - 0.5) < 1e-9
    assert abs(m2["iou/b"] - 2 / 3) < 1e-9


def test_text_features_and_segment(rng):
    def fake_encoder(prompts):
        return rng.randn(len(prompts), 32)

    tf = precompute_text_features(fake_encoder, SCANNET_LABELS_20[:5])
    assert tf.shape == (5, 32)
    np.testing.assert_allclose(np.linalg.norm(tf, axis=1), 1.0, rtol=1e-6)
    # points aligned with class-2 feature should classify as 2
    pts = np.tile(tf[2], (10, 1)) + rng.randn(10, 32) * 0.01
    assert (segment_points(pts, tf) == 2).all()


def test_visualization_export(tmp_path, rng):
    v, f = create_arrow([0, 0, 0], [1, 0, 0], 0.5)
    assert np.isfinite(v).all() and f.max() < len(v)
    # tip is at length along +x
    assert abs(v[:, 0].max() - 0.5) < 1e-5

    pts = rng.rand(50, 3).astype(np.float32)
    att = rng.rand(50)
    export_scene_visualization(str(tmp_path), "scene0", pts, att,
                               gt_pose=np.array([0, 0, 0, 0, 0, 0, 1.0]),
                               pred_pose=np.array([1, 1, 0, 0, 0, 0, 1.0]))
    assert os.path.exists(tmp_path / "scene0_points.ply")
    assert os.path.exists(tmp_path / "scene0_situation.obj")
    ply = open(tmp_path / "scene0_points.ply").read()
    assert "element vertex 50" in ply and "uchar red" in ply
    colors = activation_colors(att)
    assert colors.shape == (50, 3) and colors.dtype == np.uint8
    # rendered image artifact (the reference's OffscreenRenderer analogue)
    assert os.path.exists(tmp_path / "scene0_render.png")


def test_render_topdown_and_png(tmp_path, rng):
    """Software point-splat render: splats land where points project,
    arrows overlay, PNG round-trips through a real decoder."""
    import zlib

    from situation3d_tpu.eval.visualization import render_topdown, write_png

    pts = np.array([[0.0, 0.0, 0.0], [4.0, 4.0, 1.0]], np.float32)
    colors = np.array([[255, 0, 0], [0, 0, 255]], np.uint8)
    img = render_topdown(pts, colors, resolution=64,
                         gt_pose=np.array([2, 2, 0, 0, 0, 0, 1.0]))
    assert img.shape == (64, 64, 3) and img.dtype == np.uint8
    # red splat bottom-left, blue top-right (y axis points up in the image)
    assert (img[-5:, :5] == (255, 0, 0)).all(axis=-1).any()
    assert (img[:5, -5:] == (0, 0, 255)).all(axis=-1).any()
    # green GT arrow pixels exist
    assert (img == (0, 255, 0)).all(axis=-1).any()
    # painter's order: higher z wins on overlap
    over = render_topdown(np.array([[0, 0, 0.0], [0, 0, 1.0]], np.float32),
                          colors, resolution=16, splat=0)
    assert (over == (0, 0, 255)).all(axis=-1).any()
    assert not (over == (255, 0, 0)).all(axis=-1).any()

    p = tmp_path / "img.png"
    write_png(str(p), img)
    raw = p.read_bytes()
    assert raw[:8] == b"\x89PNG\r\n\x1a\n"
    # decode the IDAT scanlines and compare the pixel payload
    idat = raw[raw.index(b"IDAT") + 4:raw.index(b"IEND") - 8]
    rows = zlib.decompress(idat)
    got = np.frombuffer(rows, np.uint8).reshape(64, 1 + 64 * 3)[:, 1:]
    np.testing.assert_array_equal(got.reshape(64, 64, 3), img)


def test_metric_writer_image(tmp_path):
    from situation3d_tpu.train.logging import MetricWriter
    w = MetricWriter(str(tmp_path))
    img = np.zeros((8, 8, 3), np.uint8)
    w.write_image("eval/scene0", img, step=3)
    w.close()
    assert os.path.exists(tmp_path / "images" / "eval_scene0_3.png")


def test_projection_roundtrip(rng):
    """Points placed on known pixels must gather those pixels' features."""
    H, W, C = 16, 16, 4
    intr = CameraIntrinsics(fx=8.0, fy=8.0, cx=8.0, cy=8.0)
    # identity camera: world == camera frame, z forward
    w2c = jnp.eye(4)
    # a point at (0, 0, 2): u = cx, v = cy
    pts = jnp.asarray([[0.0, 0.0, 2.0], [0.5, 0.0, 2.0], [0.0, 0.0, 100.0]])
    pix, valid = project_points(pts, w2c, intr, (H, W))
    pix, valid = np.asarray(pix), np.asarray(valid)
    assert valid.tolist() == [True, True, False]  # far point out of range
    assert pix[0].tolist() == [8, 8]
    assert pix[1].tolist() == [8, 10]  # u = 8*0.5/2 + 8 = 10

    feat = jnp.asarray(rng.randn(H, W, C).astype(np.float32))
    out = np.asarray(backproject_features(feat, jnp.asarray(pix),
                                          jnp.asarray(valid)))
    np.testing.assert_allclose(out[0], np.asarray(feat)[8, 8])
    np.testing.assert_allclose(out[2], 0)


def test_projection_depth_occlusion():
    H, W = 8, 8
    intr = CameraIntrinsics(4.0, 4.0, 4.0, 4.0)
    depth = jnp.full((H, W), 1.0)
    pts = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, 3.0]])  # second occluded
    _, valid = project_points(pts, jnp.eye(4), intr, (H, W), depth)
    assert np.asarray(valid).tolist() == [True, False]


def test_multiview_backproject(rng):
    H, W, C, V = 8, 8, 3, 2
    intr = CameraIntrinsics(4.0, 4.0, 4.0, 4.0)
    feats = jnp.asarray(rng.randn(V, H, W, C).astype(np.float32))
    cams = jnp.stack([jnp.eye(4), jnp.eye(4)])
    pts = jnp.asarray([[0.0, 0.0, 2.0]])
    out = np.asarray(multiview_backproject(pts, feats, cams, intr))
    want = (np.asarray(feats)[0, 4, 4] + np.asarray(feats)[1, 4, 4]) / 2
    np.testing.assert_allclose(out[0], want, rtol=1e-5)


def test_enet_shapes(rng):
    model = ENetForMultiview(num_classes=41)
    x = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    vs = model.init(jax.random.PRNGKey(0), x)
    feats, logits = model.apply(vs, x)
    assert feats.shape == (1, 8, 8, 128)
    assert logits.shape == (1, 8, 8, 41)
    assert np.isfinite(np.asarray(feats)).all()
    # create_enet_for_3d split (lib/enet.py:697-716): frozen trunk /
    # trainable stage 3 (8 bottlenecks) / classifier
    from situation3d_tpu.models.enet import enet_trainable_paths
    params = vs["params"]
    assert set(params) == {"fixed", "trainable", "classifier"}
    assert len(params["trainable"]) == 8
    assert not enet_trainable_paths(("fixed", "bottleneck2_1"))
    assert enet_trainable_paths(("trainable", "bottleneck3_0"))
    assert enet_trainable_paths(("classifier",))


def test_segmentation_eval_end_to_end():
    """Full-decoder segmentation eval wiring (eval.py:234-332):
    openscene_out @ text_features.T -> mIoU over synthetic labels."""
    import numpy as np

    from situation3d_tpu.cli.eval import run_segmentation_eval
    from situation3d_tpu.config import Config, apply_overrides
    from situation3d_tpu.data.synthetic import make_synthetic_dataset

    cfg = apply_overrides(Config(), [
        "lang.num_layers=1", "lang.hidden_size=32", "lang.num_heads=2",
        "lang.intermediate_size=64", "lang.vocab_size=30528",
        "model.hidden_size=32", "model.mcan_num_heads=2",
        "model.mcan_num_layers=1",
        "model.mcan_flat_mlp_size=16", "model.mcan_flat_out_size=24",
        "model.num_scene_tokens=8", "model.scene_feat_dim=24",
        "sparse.planes=4,8,12,24,12,12,8,8", "sparse.layers=1,1,1,1,1,1,1,1",
        "sparse.init_dim=4", "sparse.bottleneck_channels=24",
        "sparse.capacities=2048,1024,512,256,128",
        "sparse.out_channels=16",
        "data.voxel_capacity=2048", "data.num_answers=12",
        "data.max_text_len=24", "mesh.data_parallel=1",
    ])
    ds = make_synthetic_dataset(cfg, 1, 4, split="val", n_points=4000,
                                include_labels=True)
    assert "voxel_labels" in ds[0]
    r = np.random.RandomState(0).randn(20, cfg.sparse.out_channels)
    tf = r / np.linalg.norm(r, axis=1, keepdims=True)
    out = run_segmentation_eval(cfg, None, ds, batch_size=4,
                                text_features=tf, num_answers=12)
    assert 0.0 <= out["seg_mIoU"] <= 1.0
    assert 0.0 <= out["seg_accuracy"] <= 1.0
    assert "seg_iou/0" in out
