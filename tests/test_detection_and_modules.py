"""Tests for PointNet++ modules, nn_distance, detection losses and the
detection eval toolbox (references: lib/pointnet2/pointnet2_modules.py,
situation3d/utils/nn_distance.py, lib/loss_helper.py detection branch,
situation3d/utils/{box_util,nms,eval_det}.py, lib/ap_helper.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from situation3d_tpu.eval.detection import (APCalculator, box3d_iou,
                                            box3d_iou_aabb, get_3d_box,
                                            nms_3d_faster,
                                            nms_3d_faster_samecls, rotz,
                                            voc_ap)
from situation3d_tpu.models.pointnet2_modules import (PointNet2SSG,
                                                      PointnetFPModule,
                                                      PointnetSAModule)
from situation3d_tpu.ops.nn_distance import huber_loss, nn_distance
from situation3d_tpu.utils.qa import gelu_new, masked_softmax, normalize_answer


def test_nn_distance_oracle(rng):
    a = rng.randn(2, 10, 3).astype(np.float32)
    b = rng.randn(2, 6, 3).astype(np.float32)
    d1, i1, d2, i2 = map(np.asarray, nn_distance(jnp.asarray(a), jnp.asarray(b)))
    for bt in range(2):
        full = ((a[bt][:, None] - b[bt][None]) ** 2).sum(-1)
        np.testing.assert_allclose(d1[bt], full.min(1), rtol=1e-5)
        np.testing.assert_array_equal(i1[bt], full.argmin(1))
        np.testing.assert_allclose(d2[bt], full.min(0), rtol=1e-5)


def test_huber():
    e = jnp.asarray([0.5, 2.0])
    np.testing.assert_allclose(np.asarray(huber_loss(e)), [0.125, 1.5])


def test_sa_fp_modules(rng):
    xyz = jnp.asarray(rng.rand(2, 256, 3).astype(np.float32))
    feats = jnp.asarray(rng.randn(2, 256, 6).astype(np.float32))
    sa = PointnetSAModule(npoint=64, radius=0.3, nsample=16, mlp=(16, 32))
    vs = sa.init(jax.random.PRNGKey(0), xyz, feats)
    new_xyz, pooled, inds = sa.apply(vs, xyz, feats)
    assert new_xyz.shape == (2, 64, 3)
    assert pooled.shape == (2, 64, 32)
    assert inds.shape == (2, 64)

    fp = PointnetFPModule(mlp=(16,))
    vfp = fp.init(jax.random.PRNGKey(1), xyz, new_xyz, feats, pooled)
    up = fp.apply(vfp, xyz, new_xyz, feats, pooled)
    assert up.shape == (2, 256, 16)
    assert np.isfinite(np.asarray(up)).all()


@pytest.mark.slow
def test_pointnet2_ssg_scene(rng):
    """BASELINE config 1: SSG encoder forward on one ScanNet-sized scene."""
    xyz = jnp.asarray(rng.rand(1, 8192, 3).astype(np.float32) * 6)
    model = PointNet2SSG()
    vs = jax.jit(lambda x: model.init(jax.random.PRNGKey(0), x))(xyz)
    out = jax.jit(lambda v, x: model.apply(v, x))(vs, xyz)
    assert out["fp2_features"].shape == (1, 1024, 256)
    assert np.isfinite(np.asarray(out["fp2_features"])).all()


def test_box3d_iou_identity_and_disjoint():
    b = get_3d_box((2, 1, 1), 0.0, (0, 0, 0))
    iou, iou2d = box3d_iou(b, b)
    assert abs(iou - 1.0) < 1e-5 and abs(iou2d - 1.0) < 1e-5
    b2 = get_3d_box((2, 1, 1), 0.0, (10, 0, 0))
    iou, _ = box3d_iou(b, b2)
    assert iou == 0.0
    # rotated overlap is between 0 and 1
    b3 = get_3d_box((2, 1, 1), np.pi / 4, (0, 0, 0))
    iou, _ = box3d_iou(b, b3)
    assert 0.2 < iou < 1.0


def test_box3d_iou_half_overlap():
    b1 = np.array([0, 0, 0, 2, 2, 2], float)
    b2 = np.array([1, 0, 0, 3, 2, 2], float)
    np.testing.assert_allclose(box3d_iou_aabb(b1, b2), 1 / 3, rtol=1e-6)


def test_nms():
    boxes = np.array([
        [0, 0, 0, 2, 2, 2, 0.9],
        [0.1, 0, 0, 2.1, 2, 2, 0.8],   # big overlap with 0
        [5, 5, 5, 6, 6, 6, 0.7],
    ])
    keep = nms_3d_faster(boxes, 0.5)
    assert keep == [0, 2]
    boxes_cls = np.concatenate([boxes, np.array([[0], [1], [0]])], axis=1)
    keep = sorted(nms_3d_faster_samecls(boxes_cls, 0.5))
    assert keep == [0, 1, 2]  # different classes never suppress each other


def test_voc_ap_and_calculator():
    rec = np.array([0.5, 1.0])
    prec = np.array([1.0, 1.0])
    assert abs(voc_ap(rec, prec) - 1.0) < 1e-6

    calc = APCalculator(0.25, {0: "chair"})
    gt_box = get_3d_box((1, 1, 1), 0, (0, 0, 0))
    good = get_3d_box((1, 1, 1), 0, (0.05, 0, 0))
    bad = get_3d_box((1, 1, 1), 0, (5, 5, 5))
    calc.step([[(0, good, 0.9), (0, bad, 0.3)]], [[(0, gt_box)]])
    m = calc.compute_metrics()
    assert abs(m["chair Average Precision"] - 1.0) < 1e-6
    assert m["mAP"] == m["chair Average Precision"]


def test_detection_losses_smoke(rng):
    from situation3d_tpu.train.detection_losses import get_detection_loss

    class Cfg:
        num_heading_bin = 12
        num_size_cluster = 4
        num_class = 4
        mean_size_arr = np.ones((4, 3), np.float32)

    B, NP, NS, K, K2 = 2, 64, 16, 8, 4
    dd = {
        "seed_xyz": jnp.asarray(rng.rand(B, NS, 3).astype(np.float32)),
        "seed_inds": jnp.asarray(rng.randint(0, NP, (B, NS))),
        "vote_xyz": jnp.asarray(rng.rand(B, NS, 3).astype(np.float32)),
        "vote_label_mask": jnp.asarray(rng.randint(0, 2, (B, NP))),
        "vote_label": jnp.asarray(rng.rand(B, NP, 9).astype(np.float32)),
        "aggregated_vote_xyz": jnp.asarray(rng.rand(B, K, 3).astype(np.float32)),
        "center_label": jnp.asarray(rng.rand(B, K2, 6).astype(np.float32)),
        "objectness_scores": jnp.asarray(rng.randn(B, K, 2).astype(np.float32)),
        "center": jnp.asarray(rng.rand(B, K, 3).astype(np.float32)),
        "box_label_mask": jnp.asarray(np.ones((B, K2), np.float32)),
        "heading_class_label": jnp.asarray(rng.randint(0, 12, (B, K2))),
        "heading_scores": jnp.asarray(rng.randn(B, K, 12).astype(np.float32)),
        "heading_residual_label": jnp.asarray(rng.rand(B, K2).astype(np.float32)),
        "heading_residuals_normalized": jnp.asarray(
            rng.rand(B, K, 12).astype(np.float32)),
        "size_class_label": jnp.asarray(rng.randint(0, 4, (B, K2))),
        "size_scores": jnp.asarray(rng.randn(B, K, 4).astype(np.float32)),
        "size_residual_label": jnp.asarray(rng.rand(B, K2, 3).astype(np.float32)),
        "size_residuals_normalized": jnp.asarray(
            rng.rand(B, K, 4, 3).astype(np.float32)),
        "sem_cls_label": jnp.asarray(rng.randint(0, 4, (B, K2))),
        "sem_cls_scores": jnp.asarray(rng.randn(B, K, 4).astype(np.float32)),
    }
    total, terms = get_detection_loss(dd, Cfg())
    assert np.isfinite(float(total)) and float(total) > 0
    for k, v in terms.items():
        assert np.isfinite(float(v)), k


def test_qa_utils():
    assert normalize_answer("The two chairs!") == "2 chairs"
    assert normalize_answer("a dog's toy;") == "dog's toy"
    p = masked_softmax(jnp.asarray([[1.0, 2.0, 3.0]]),
                       jnp.asarray([[1, 1, 0]]))
    np.testing.assert_allclose(np.asarray(p)[0, 2], 0.0, atol=1e-7)
    np.testing.assert_allclose(np.asarray(p).sum(), 1.0, rtol=1e-5)
    g = np.asarray(gelu_new(jnp.asarray([0.0, 1.0])))
    np.testing.assert_allclose(g[0], 0.0, atol=1e-7)
    assert 0.8 < g[1] < 0.85


def test_votes_and_lfp_modules(rng):
    """PointnetSAModuleVotes (pooling variants + inds passthrough) and
    PointnetLFPModuleMSG shapes (pointnet2_modules.py:163-523)."""
    import jax
    import jax.numpy as jnp

    from situation3d_tpu.models.pointnet2_modules import (
        PointnetLFPModuleMSG, PointnetSAModuleVotes)

    B, N = 2, 64
    xyz = jnp.asarray(rng.randn(B, N, 3).astype(np.float32))
    feats = jnp.asarray(rng.randn(B, N, 8).astype(np.float32))
    for pooling in ("max", "avg", "rbf"):
        m = PointnetSAModuleVotes(npoint=16, radius=0.5, nsample=8,
                                  mlp=(11, 16), pooling=pooling,
                                  normalize_xyz=True)
        vs = m.init(jax.random.PRNGKey(0), xyz, feats)
        new_xyz, new_f, inds = m.apply(vs, xyz, feats)
        assert new_xyz.shape == (B, 16, 3)
        assert new_f.shape == (B, 16, 16)
        assert inds.shape == (B, 16)
        assert np.isfinite(np.asarray(new_f)).all(), pooling
    # inds passthrough: feeding our own inds must select those points
    fixed = jnp.tile(jnp.arange(16, dtype=jnp.int32)[None], (B, 1))
    new_xyz, _, inds2 = m.apply(vs, xyz, feats, inds=fixed)
    np.testing.assert_array_equal(np.asarray(inds2), np.asarray(fixed))
    np.testing.assert_allclose(np.asarray(new_xyz),
                               np.asarray(xyz[:, :16]), rtol=1e-6)

    lfp = PointnetLFPModuleMSG(radii=(0.4, 0.8), nsamples=(8, 8),
                               mlps=((11, 16), (11, 16)), post_mlp=(20, 12))
    xyz2 = jnp.asarray(rng.randn(B, 24, 3).astype(np.float32))
    f2 = jnp.asarray(rng.randn(B, 24, 4).astype(np.float32))
    vs = lfp.init(jax.random.PRNGKey(1), xyz2, xyz, f2, feats)
    out = lfp.apply(vs, xyz2, xyz, f2, feats)
    assert out.shape == (B, 24, 24)  # 2 scales x post_mlp[-1]=12
    assert np.isfinite(np.asarray(out)).all()


def test_votenet_detection_end_to_end(rng):
    """Detection mode is reachable: VoteNet proposals -> detection losses
    (finite, grads flow) -> parse_predictions -> AP (VERDICT #7)."""
    import jax
    import jax.numpy as jnp

    from situation3d_tpu.data.scannet_preprocess import ScannetDatasetConfig
    from situation3d_tpu.eval.detection import (parse_groundtruths,
                                                parse_predictions)
    from situation3d_tpu.models.votenet import VoteNet
    from situation3d_tpu.train.detection_losses import get_detection_loss

    cfg = ScannetDatasetConfig()
    B, N, K2 = 1, 256, 4
    model = VoteNet(num_class=cfg.num_class,
                    num_heading_bin=cfg.num_heading_bin,
                    num_size_cluster=cfg.num_size_cluster,
                    mean_size_arr=cfg.mean_size_arr,
                    num_proposal=8, backbone_npoints=(64, 32, 16, 8))
    # dense enough that 0.2-0.4 m balls have real neighborhoods (sparse
    # random clouds make self-only groups whose relative xyz is zero)
    xyz = jnp.asarray(rng.rand(B, N, 3).astype(np.float32) * 1.2)
    variables = model.init(jax.random.PRNGKey(0), xyz)
    out = model.apply(variables, xyz)
    assert out["seed_xyz"].shape == (B, 32, 3)
    assert out["seed_inds"].shape == (B, 32)
    assert int(np.asarray(out["seed_inds"]).max()) < N
    assert out["vote_xyz"].shape == (B, 32, 3)
    assert out["center"].shape == (B, 8, 3)
    assert out["objectness_scores"].shape == (B, 8, 2)
    assert out["size_residuals"].shape == (B, 8, 18, 3)

    gt = {
        "vote_label": jnp.asarray(rng.randn(B, N, 9).astype(np.float32) * 0.1),
        "vote_label_mask": jnp.ones((B, N), jnp.int32),
        "center_label": jnp.asarray(rng.rand(B, K2, 3).astype(np.float32) * 1.2),
        "box_label_mask": jnp.asarray(np.array([[1, 1, 1, 0]], np.float32)),
        "heading_class_label": jnp.zeros((B, K2), jnp.int32),
        "heading_residual_label": jnp.zeros((B, K2), jnp.float32),
        "size_class_label": jnp.asarray(rng.randint(0, 18, (B, K2))),
        "size_residual_label": jnp.asarray(
            rng.rand(B, K2, 3).astype(np.float32) * 0.2),
        "sem_cls_label": jnp.asarray(rng.randint(0, 18, (B, K2))),
    }

    def loss_fn(params):
        dd = model.apply({**variables, "params": params}, xyz)
        total, _ = get_detection_loss({**dd, **gt}, cfg)
        return total

    total, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(total))
    g = float(jnp.abs(
        grads["pnet"]["proposal_out"]["kernel"]).sum())
    assert g > 0
    gv = float(jnp.abs(grads["vgen"]["out"]["kernel"]).sum())
    assert gv > 0

    # AP flow
    dd_np = jax.tree_util.tree_map(np.asarray, model.apply(variables, xyz))
    preds = parse_predictions(dd_np, cfg, conf_thresh=0.0)
    gts = parse_groundtruths(jax.tree_util.tree_map(np.asarray, gt), cfg)
    calc = APCalculator(0.25, cfg.class2type)
    calc.step(preds, gts)
    metrics = calc.compute_metrics()
    assert "mAP" in metrics and 0.0 <= metrics["mAP"] <= 1.0
