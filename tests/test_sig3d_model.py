"""SIG3D model + loss + metric tests (reference: situation3d/models/
sqa_module.py forward, lib/loss_helper.py, lib/eval_helper.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from situation3d_tpu.config import Config, apply_overrides
from situation3d_tpu.models.sig3d import SIG3D, situated_token_pool
from situation3d_tpu.train.losses import get_loss
from situation3d_tpu.train.metrics import answer_metrics, situation_metrics


def tiny_config():
    return apply_overrides(Config(), [
        "lang.num_layers=2", "lang.hidden_size=64", "lang.num_heads=4",
        "lang.intermediate_size=128", "lang.vocab_size=512",
        "model.hidden_size=64", "model.mcan_num_heads=4",
        "model.mcan_flat_mlp_size=32", "model.mcan_flat_out_size=48",
        "model.num_scene_tokens=16", "model.scene_feat_dim=24",
        "sparse.planes=4,8,12,24,12,12,8,8", "sparse.layers=1,1,1,1,1,1,1,1",
        "sparse.init_dim=4", "sparse.bottleneck_channels=24",
        "sparse.capacities=256,128,64,32,16",
        "data.num_answers=20",
    ])


def make_batch(rng, cfg, B=2, L=12):
    cap = cfg.sparse.capacities[0]
    coords = np.zeros((B, cap, 3), np.int32)
    mask = np.zeros((B, cap), bool)
    feats = np.zeros((B, cap, 3), np.float32)
    for b in range(B):
        n = 180
        c = np.unique(rng.randint(0, 30, (n + 60, 3)), axis=0)[:n]
        coords[b, :len(c)], mask[b, :len(c)] = c, True
        feats[b, :len(c)] = rng.rand(len(c), 3)
    s_ids = rng.randint(2, cfg.lang.vocab_size, (B, L))
    s_mask = np.ones((B, L), np.int32); s_mask[:, 9:] = 0
    q_ids = rng.randint(2, cfg.lang.vocab_size, (B, L))
    q_mask = np.ones((B, L), np.int32); q_mask[:, 7:] = 0
    # GT position inside the scene's token footprint (coords < 30 at 0.02 m
    # voxels -> positions ~0.16-0.48 m) so the sigma=0.16 Gaussian has mass
    aux = np.concatenate([rng.rand(B, 3) * 0.4 + 0.1,
                          np.tile([0, 0, 0, 1.0], (B, 1))], axis=1)
    cats = np.zeros((B, cfg.data.num_answers), np.float32)
    cats[np.arange(B), rng.randint(0, cfg.data.num_answers, B)] = 1
    return {
        "s_ids": jnp.asarray(s_ids), "s_mask": jnp.asarray(s_mask),
        "q_ids": jnp.asarray(q_ids), "q_mask": jnp.asarray(q_mask),
        "voxel_coords": jnp.asarray(coords), "voxel_feats": jnp.asarray(feats),
        "voxel_mask": jnp.asarray(mask),
        "auxiliary_task": jnp.asarray(aux, dtype=jnp.float32),
        "answer_cat_scores": jnp.asarray(cats),
        "question_type": jnp.asarray(rng.randint(0, 9, B)),
    }


@pytest.fixture(scope="module")
def model_setup():
    cfg = tiny_config()
    rng = np.random.RandomState(0)
    batch = make_batch(rng, cfg)
    model = SIG3D(cfg, num_answers=cfg.data.num_answers)
    variables = jax.jit(
        lambda b: model.init(
            {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
            b, train=False)
    )(batch)

    @jax.jit
    def forward(variables, batch, key):
        return model.apply(variables, batch, train=False, rngs={"sample": key})

    return dict(cfg=cfg, model=model, variables=variables, batch=batch,
                forward=forward)


def test_forward_shapes(model_setup):
    cfg = model_setup["cfg"]
    out = model_setup["forward"](model_setup["variables"], model_setup["batch"],
                                 jax.random.PRNGKey(2))
    B, N = 2, cfg.model.num_scene_tokens
    assert out["answer_scores"].shape == (B, cfg.data.num_answers)
    assert out["aux_scores"].shape == (B, 7)  # __l2__quat__: 3 pos + 4 quat
    assert out["scene_positions"].shape == (B, N, 2)
    assert out["auxiliary_task_loc_gt"].shape == (B, N)
    np.testing.assert_allclose(
        np.asarray(out["auxiliary_task_loc_gt"]).sum(1), 1.0, rtol=1e-5)
    assert out["pred_pos_likelihood"].shape == (B, N)
    assert out["pred_rotation"].shape == (B, N, 6)
    for k in ("answer_scores", "aux_scores"):
        assert np.isfinite(np.asarray(out[k])).all(), k


def test_loss_and_grads(model_setup):
    cfg = model_setup["cfg"]
    model = model_setup["model"]
    batch = model_setup["batch"]

    @jax.jit
    def loss_fn(params, variables, batch):
        out = model.apply(
            {**variables, "params": params}, batch, train=True,
            rngs={"sample": jax.random.PRNGKey(3),
                  "dropout": jax.random.PRNGKey(4)})
        total, terms = get_loss(out, batch, cfg.loss, cfg.model.situation_loss_tag)
        return total, terms

    params = model_setup["variables"]["params"]
    (total, terms), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        params, model_setup["variables"], batch)
    assert np.isfinite(float(total))
    assert float(terms["answer_loss"]) > 0
    assert float(terms["aux_loss"]) > 0
    # x10 amplification
    np.testing.assert_allclose(
        float(total),
        10.0 * (float(terms["answer_loss"]) + float(terms["aux_loss"])),
        rtol=1e-5)
    # gradients flow to answer head and language encoder
    g = jax.tree_util.tree_map(lambda x: float(jnp.abs(x).sum()), grads)
    assert g["answer_cls_fc2"]["kernel"] > 0
    assert g["lang_net"]["encoder"]["layer0"]["attention"]["q"]["kernel"] > 0


def test_situated_token_pool_oracle(rng):
    """z-collapse mean + sampling against a dict oracle."""
    V, C, stride = 64, 5, 16
    coords = np.zeros((V, 3), np.int32)
    mask = np.zeros(V, bool)
    n = 40
    coords[:n] = rng.randint(0, 8, (n, 3)) * stride
    mask[:n] = True
    feats = np.zeros((V, C), np.float32)
    feats[:n] = rng.randn(n, C)

    tok, pos = situated_token_pool(
        jnp.asarray(coords), jnp.asarray(feats), jnp.asarray(mask),
        stride, 16, 0.02, jax.random.PRNGKey(0))
    tok, pos = np.asarray(tok), np.asarray(pos)

    # oracle: mean per unique (x, y)
    groups = {}
    for i in range(n):
        key = (coords[i, 0] // stride, coords[i, 1] // stride)
        groups.setdefault(key, []).append(feats[i])
    means = {k: np.mean(v, axis=0) for k, v in groups.items()}
    for t in range(16):
        key = (int(round((pos[t, 0] / 0.02 - stride / 2) / stride)),
               int(round((pos[t, 1] / 0.02 - stride / 2) / stride)))
        assert key in means, key
        np.testing.assert_allclose(tok[t], means[key], rtol=1e-4, atol=1e-5)


def test_token_pool_pads_with_duplicates(rng):
    """Fewer unique (x,y) than tokens -> duplicates, like sqa_module.py:305-308."""
    V, stride = 32, 16
    coords = np.zeros((V, 3), np.int32)
    mask = np.zeros(V, bool)
    coords[:4] = np.array([[0, 0, 0], [16, 0, 0], [0, 16, 0], [16, 16, 32]])
    mask[:4] = True
    feats = np.eye(V, 4, dtype=np.float32)
    tok, pos = situated_token_pool(
        jnp.asarray(coords), jnp.asarray(feats), jnp.asarray(mask),
        stride, 8, 0.02, jax.random.PRNGKey(1))
    assert len({tuple(np.round(p, 5)) for p in np.asarray(pos)}) == 4


def test_answer_metrics(rng):
    scores = np.array([[0.1, 5.0, 0.2], [3.0, 0.0, 1.0]], np.float32)
    cats = np.array([[0, 1, 0], [0, 0, 1]], np.float32)
    m = answer_metrics(jnp.asarray(scores), jnp.asarray(cats),
                       jnp.asarray([0, 2]))
    assert float(m["answer_acc_at1"]) == 0.5
    assert float(m["answer_acc_at10"]) == 1.0  # k=min(10,3)=3 covers all
    np.testing.assert_array_equal(np.asarray(m["answer_acc_breakdown_what"]), [1, 1])
    np.testing.assert_array_equal(np.asarray(m["answer_acc_breakdown_how"]), [0, 1])


def test_situation_metrics():
    gt = np.array([[0.0, 0.0, 0.0, 0, 0, 0, 1.0]])  # identity quat
    out = {"aux_scores": np.array([[0.3, 0.0, 0.0, 0, 0, 0.08715574, 0.9961947]])}
    # pred rotation ~10 degrees about z
    m = situation_metrics(out, {"auxiliary_task": gt}, "__l2__quat__")
    assert m["situation_acc_0_5m"] == 1.0
    assert m["situation_acc_1_0m"] == 1.0
    assert m["situation_acc_15deg"] == 1.0
    assert m["situation_acc_30deg"] == 1.0
    out2 = {"aux_scores": np.array([[2.0, 0.0, 0.0, 0, 0, 0.5, 0.8660254]])}  # 60deg
    m2 = situation_metrics(out2, {"auxiliary_task": gt}, "__l2__quat__")
    assert m2["situation_acc_0_5m"] == 0.0
    assert m2["situation_acc_1_0m"] == 0.0
    assert m2["situation_acc_15deg"] == 0.0
    assert m2["situation_acc_30deg"] == 0.0


def test_situated_reencode_forward(model_setup):
    """situated_reencode=True changes outputs but keeps them finite."""
    import dataclasses
    cfg = model_setup["cfg"]
    cfg2 = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, situated_reencode=True))
    model2 = SIG3D(cfg2, num_answers=cfg.data.num_answers)
    out = model2.apply(model_setup["variables"], model_setup["batch"],
                       train=False, rngs={"sample": jax.random.PRNGKey(2)})
    assert np.isfinite(np.asarray(out["answer_scores"])).all()
    base = model_setup["forward"](model_setup["variables"],
                                  model_setup["batch"], jax.random.PRNGKey(2))
    assert not np.allclose(np.asarray(out["answer_scores"]),
                           np.asarray(base["answer_scores"]))


def test_lstm_lang_path(model_setup):
    """lang_model='lstm' routes LangModule through GloVe+LSTM
    (sep_lang_module_bert.py:48-56, use_bert=False)."""
    cfg = apply_overrides(tiny_config(), ["model.lang_model=lstm",
                                          "lang.glove_dim=16"])
    batch = model_setup["batch"]
    model = SIG3D(cfg, num_answers=cfg.data.num_answers)
    variables = jax.jit(lambda b: model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        b, train=False))(batch)
    # LSTM path: no transformer layers, an embedding + lstm cell instead
    enc = variables["params"]["lang_net"]["encoder"]
    assert "lstm_encoder" in enc and "word_embeddings" in enc
    assert not any(k.startswith("layer") for k in enc)
    assert enc["word_embeddings"]["embedding"].shape[1] == 16
    out = model.apply(variables, batch, train=False,
                      rngs={"sample": jax.random.PRNGKey(2)})
    assert out["answer_scores"].shape == (2, cfg.data.num_answers)
    assert np.isfinite(np.asarray(out["answer_scores"], np.float32)).all()


def test_predict_situation_off(model_setup):
    cfg = apply_overrides(tiny_config(), ["model.predict_situation=false"])
    batch = model_setup["batch"]
    model = SIG3D(cfg, num_answers=cfg.data.num_answers)
    variables = jax.jit(lambda b: model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        b, train=False))(batch)
    out = model.apply(variables, batch, train=False,
                      rngs={"sample": jax.random.PRNGKey(2)})
    assert "pred_pos_likelihood" not in out and "pred_rotation" not in out
    assert not any(k.startswith("position_head") or k.startswith("rotation_head")
                   for k in variables["params"])
    assert "aux_scores" in out  # the loss-bearing head is independent


def test_answer_loss_ce(model_setup):
    """answer_loss='ce' uses the integer answer_cat target
    (loss_helper.py:213-227 CE branch)."""
    cfg = apply_overrides(tiny_config(), ["loss.answer_loss=ce"])
    out = model_setup["forward"](model_setup["variables"],
                                 model_setup["batch"], jax.random.PRNGKey(2))
    batch = dict(model_setup["batch"])
    cats = np.asarray(batch["answer_cat_scores"])
    batch["answer_cat"] = jnp.asarray(cats.argmax(-1).astype(np.int32))
    _, terms_ce = get_loss(out, batch, cfg.loss, cfg.model.situation_loss_tag)
    _, terms_bce = get_loss(out, batch, tiny_config().loss,
                            cfg.model.situation_loss_tag)
    import optax
    expect = float(jnp.mean(optax.softmax_cross_entropy_with_integer_labels(
        out["answer_scores"], batch["answer_cat"])))
    assert float(terms_ce["answer_loss"]) == pytest.approx(expect, rel=1e-5)
    assert float(terms_ce["answer_loss"]) != pytest.approx(
        float(terms_bce["answer_loss"]), rel=1e-3)


def test_scene_token_cache_matches_full_forward(rng):
    """Serving path: cached scene_tokens -> answers identical to the full
    forward that produced them (eval/serving.py)."""
    import jax
    import jax.numpy as jnp

    from situation3d_tpu.config import Config, apply_overrides
    from situation3d_tpu.eval.serving import SceneCache
    from situation3d_tpu.models.sig3d import SIG3D

    cfg = apply_overrides(Config(), [
        "lang.num_layers=1", "lang.hidden_size=32", "lang.num_heads=2",
        "lang.intermediate_size=64", "lang.vocab_size=128",
        "model.hidden_size=32", "model.mcan_num_heads=2",
        "model.mcan_num_layers=1", "model.mcan_flat_mlp_size=16",
        "model.mcan_flat_out_size=24", "model.num_scene_tokens=16",
        "sparse.planes=(4,4,4,4,4,4,4,4)", "sparse.init_dim=4",
        "sparse.bottleneck_channels=4", "model.scene_feat_dim=4",
        "sparse.capacities=(256,128,64,32,16)", "data.num_answers=7",
        "sparse.grid_extent=(64,64,32)", "data.max_text_len=12"])
    model = SIG3D(cfg, num_answers=7)
    r = np.random.RandomState(0)
    B, V, L = 1, 256, 12
    coords = np.sort(r.randint(0, 30, (B, V, 3)).astype(np.int32), axis=1)
    batch = {
        "s_ids": r.randint(1, 128, (B, L)).astype(np.int32),
        "s_mask": np.ones((B, L), np.int32),
        "q_ids": r.randint(1, 128, (B, L)).astype(np.int32),
        "q_mask": np.ones((B, L), np.int32),
        "voxel_coords": coords,
        "voxel_feats": r.rand(B, V, 3).astype(np.float32),
        "voxel_mask": np.ones((B, V), bool),
        "auxiliary_task": np.concatenate(
            [r.rand(B, 3), np.tile([0, 0, 0, 1.0], (B, 1))], 1
        ).astype(np.float32),
    }
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        batch, train=False)
    key = jax.random.PRNGKey(2)
    full = model.apply(variables, batch, train=False, rngs={"sample": key})

    cache = SceneCache(model, variables)
    cache.encode("scene0", batch, key)
    assert "scene0" in cache
    # two questions against the cached scene
    q_batch = {k: np.concatenate([v, v]) for k, v in batch.items()}
    out = cache.answer("scene0", q_batch, key)
    np.testing.assert_allclose(
        np.asarray(out["answer_scores"][0]),
        np.asarray(full["answer_scores"][0]), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(out["answer_scores"][1]),
        np.asarray(out["answer_scores"][0]), rtol=1e-6, atol=1e-6)


def test_dense_downsample_forward_bit_equal(rng):
    """sparse.dense_downsample flips the plan builder to the sort-free
    grid-cumsum downsample; for in-extent scenes the plan (and therefore
    the whole forward) must be bit-identical."""
    import jax

    from situation3d_tpu.config import Config, apply_overrides
    from situation3d_tpu.models.sig3d import SIG3D

    opts = [
        "lang.num_layers=1", "lang.hidden_size=32", "lang.num_heads=2",
        "lang.intermediate_size=64", "lang.vocab_size=128",
        "model.hidden_size=32", "model.mcan_num_heads=2",
        "model.mcan_num_layers=1", "model.mcan_flat_mlp_size=16",
        "model.mcan_flat_out_size=24", "model.num_scene_tokens=16",
        "sparse.planes=(4,4,4,4,4,4,4,4)", "sparse.init_dim=4",
        "sparse.bottleneck_channels=4", "model.scene_feat_dim=4",
        "sparse.capacities=(256,128,64,32,16)", "data.num_answers=7",
        "sparse.grid_extent=(64,64,32)", "data.max_text_len=12"]
    r = np.random.RandomState(3)
    B, V, L = 1, 256, 12
    batch = {
        "s_ids": r.randint(1, 128, (B, L)).astype(np.int32),
        "s_mask": np.ones((B, L), np.int32),
        "q_ids": r.randint(1, 128, (B, L)).astype(np.int32),
        "q_mask": np.ones((B, L), np.int32),
        "voxel_coords": r.randint(0, 30, (B, V, 3)).astype(np.int32),
        "voxel_feats": r.rand(B, V, 3).astype(np.float32),
        "voxel_mask": np.ones((B, V), bool),
        "auxiliary_task": np.concatenate(
            [r.rand(B, 3), np.tile([0, 0, 0, 1.0], (B, 1))], 1
        ).astype(np.float32),
    }
    outs, segs = [], []
    for flag in ("false", "true"):
        # final_result=true runs the decoder too, exercising the scattered
        # up maps through the transpose convs
        cfg = apply_overrides(
            Config(), opts + [f"sparse.dense_downsample={flag}",
                              "sparse.final_result=true"])
        model = SIG3D(cfg, num_answers=7)
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
            batch, train=False)
        out = model.apply(variables, batch, train=False,
                          rngs={"sample": jax.random.PRNGKey(2)})
        outs.append(np.asarray(out["answer_scores"]))
        segs.append(np.asarray(out["openscene_out"]))
    np.testing.assert_array_equal(outs[0], outs[1])
    np.testing.assert_array_equal(segs[0], segs[1])
