"""Q-Former / T5 / Blip2T5 tests (reference: 3DLLM_BLIP2-base
lavis/models/blip2_models/{Qformer,modeling_t5,blip2_t5}.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from situation3d_tpu.config import Blip2Config, QFormerConfig, T5Config
from situation3d_tpu.models.blip2_t5 import Blip2T5, predict_answers
from situation3d_tpu.models.positional import (voxel_position_embedding,
                                               voxel_position_table)
from situation3d_tpu.models.qformer import QFormer
from situation3d_tpu.models.t5 import (T5ForConditionalGeneration,
                                       greedy_decode, shift_right,
                                       t5_cross_entropy)


def tiny_t5():
    return T5Config(
        vocab_size=128, d_model=32, d_kv=8, d_ff=64, num_layers=2,
        num_decoder_layers=2, num_heads=4, max_input_len=20, max_answer_len=8)


def tiny_qf():
    return QFormerConfig(
        num_query_tokens=4, hidden_size=32, num_layers=4, num_heads=4,
        intermediate_size=64, cross_attention_freq=2, encoder_width=48,
        scene_token_capacity=64)


def tiny_blip2():
    return Blip2Config(qformer=tiny_qf(), t5=tiny_t5(), pc_feat_dim=48)


def test_positional_table_shape_and_values():
    t = voxel_position_table(469)
    assert t.shape == (256, 469)
    # position 0: sin->0, cos->1 interleaved
    np.testing.assert_allclose(t[0, 0::2], 0, atol=1e-7)
    np.testing.assert_allclose(t[0, 1::2], 1, atol=1e-7)
    emb = voxel_position_embedding(
        jnp.asarray(np.zeros((1, 3, 3), np.int32)), 1408, jnp.asarray(t))
    assert emb.shape == (1, 3, 1408)
    np.testing.assert_allclose(np.asarray(emb[0, 0, 1407]), 0)  # zero pad tail


def test_qformer_shapes_and_mask(rng):
    cfg = tiny_qf()
    enc = jnp.asarray(rng.randn(2, 16, 48).astype(np.float32))
    mask = jnp.asarray(np.concatenate([np.ones((2, 8)), np.zeros((2, 8))], 1))
    model = QFormer(cfg)
    vs = model.init(jax.random.PRNGKey(0), enc, mask)
    out = model.apply(vs, enc, mask)
    assert out.shape == (2, 4, 32)
    # masked scene tokens must not affect the output
    enc2 = enc.at[:, 8:].set(999.0)
    out2 = model.apply(vs, enc2, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-5)


def test_t5_train_forward_and_loss(rng):
    cfg = tiny_t5()
    model = T5ForConditionalGeneration(cfg)
    B, Le, Ld = 2, 10, 6
    embeds = jnp.asarray(rng.randn(B, Le, cfg.d_model).astype(np.float32))
    enc_mask = jnp.ones((B, Le), jnp.int32)
    labels = jnp.asarray(rng.randint(2, cfg.vocab_size, (B, Ld)).astype(np.int32))
    label_mask = jnp.asarray((np.arange(Ld) < 4)[None].repeat(B, 0).astype(np.int32))
    dec_in = shift_right(labels, cfg.decoder_start_token_id, cfg.pad_token_id)
    assert int(dec_in[0, 0]) == cfg.decoder_start_token_id
    vs = model.init(jax.random.PRNGKey(0), embeds, enc_mask, dec_in, label_mask)
    logits = model.apply(vs, embeds, enc_mask, dec_in, label_mask)
    assert logits.shape == (B, Ld, cfg.vocab_size)
    loss = t5_cross_entropy(logits, labels, label_mask)
    assert np.isfinite(float(loss)) and float(loss) > 0


def test_t5_decoder_causality(rng):
    """Changing a later decoder token must not affect earlier logits."""
    cfg = tiny_t5()
    model = T5ForConditionalGeneration(cfg)
    B, Le, Ld = 1, 5, 6
    embeds = jnp.asarray(rng.randn(B, Le, cfg.d_model).astype(np.float32))
    enc_mask = jnp.ones((B, Le), jnp.int32)
    dec = jnp.asarray(rng.randint(2, cfg.vocab_size, (B, Ld)).astype(np.int32))
    vs = model.init(jax.random.PRNGKey(0), embeds, enc_mask, dec, None)
    l1 = model.apply(vs, embeds, enc_mask, dec, None)
    dec2 = dec.at[0, 4].set((int(dec[0, 4]) + 1) % cfg.vocab_size)
    l2 = model.apply(vs, embeds, enc_mask, dec2, None)
    np.testing.assert_allclose(np.asarray(l1[:, :4]), np.asarray(l2[:, :4]),
                               atol=1e-5)
    assert not np.allclose(np.asarray(l1[:, 4:]), np.asarray(l2[:, 4:]))


def test_greedy_decode_matches_teacher_forcing(rng):
    """Cached greedy decode must equal step-by-step argmax of the
    non-cached teacher-forced forward."""
    cfg = tiny_t5()
    model = T5ForConditionalGeneration(cfg)
    B, Le = 2, 7
    embeds = jnp.asarray(rng.randn(B, Le, cfg.d_model).astype(np.float32))
    enc_mask = jnp.ones((B, Le), jnp.int32)
    dec0 = jnp.full((B, 1), cfg.decoder_start_token_id, jnp.int32)
    vs = model.init(jax.random.PRNGKey(0), embeds, enc_mask, dec0, None)

    out = np.asarray(greedy_decode(model, vs, embeds, enc_mask, 5,
                                   cfg.decoder_start_token_id,
                                   cfg.eos_token_id, cfg.pad_token_id))

    # oracle: grow the teacher-forced sequence greedily without cache
    seq = np.full((B, 1), cfg.decoder_start_token_id, np.int32)
    done = np.zeros(B, bool)
    want = np.full((B, 5), cfg.pad_token_id, np.int32)
    for i in range(5):
        logits = model.apply(vs, embeds, enc_mask, jnp.asarray(seq), None)
        nxt = np.asarray(jnp.argmax(logits[:, -1], -1)).astype(np.int32)
        nxt = np.where(done, cfg.pad_token_id, nxt)
        want[:, i] = nxt
        done |= nxt == cfg.eos_token_id
        seq = np.concatenate([seq, nxt[:, None]], 1)
    np.testing.assert_array_equal(out, want)


@pytest.fixture(scope="module")
def blip2_setup():
    cfg = tiny_blip2()
    rng = np.random.RandomState(0)
    B, N, Lt, La = 2, 16, 6, 5
    batch = {
        "pc_feat": jnp.asarray(rng.randn(B, N, 48).astype(np.float32)),
        "pc": jnp.asarray(rng.randint(0, 64, (B, N, 3)).astype(np.int32)),
        "pc_mask": jnp.asarray(np.ones((B, N), np.int32)),
        "input_ids": jnp.asarray(rng.randint(2, 120, (B, Lt)).astype(np.int32)),
        "input_mask": jnp.asarray(np.ones((B, Lt), np.int32)),
        "labels": jnp.asarray(rng.randint(2, 120, (B, La)).astype(np.int32)),
        "label_mask": jnp.asarray(np.ones((B, La), np.int32)),
    }
    model = Blip2T5(cfg)
    vs = model.init(jax.random.PRNGKey(0), batch)
    return dict(cfg=cfg, model=model, vs=vs, batch=batch)


def test_blip2_train_loss_and_grads(blip2_setup):
    model, vs, batch = (blip2_setup[k] for k in ("model", "vs", "batch"))

    def loss_fn(params):
        return model.apply({"params": params}, batch)["loss"]

    loss, grads = jax.value_and_grad(loss_fn)(vs["params"])
    assert np.isfinite(float(loss)) and float(loss) > 0
    # gradients flow through qformer and t5_proj
    g = jax.tree_util.tree_map(lambda x: float(jnp.abs(x).sum()), grads)
    assert g["t5_proj"]["kernel"] > 0
    assert g["qformer"]["query_tokens"] > 0


def test_blip2_predict_answers(blip2_setup):
    model, vs, batch = (blip2_setup[k] for k in ("model", "vs", "batch"))
    out = predict_answers(model, vs, batch, max_len=4)
    assert out.shape == (2, 4)
    assert out.dtype == jnp.int32
    cfg = blip2_setup["cfg"]
    assert (np.asarray(out) < cfg.t5.vocab_size).all()


def test_t5_remat_matches(rng):
    """remat=True must not change values or gradients."""
    import dataclasses
    cfg = tiny_t5()
    cfg_r = dataclasses.replace(cfg, remat=True)
    B, Le, Ld = 1, 6, 4
    embeds = jnp.asarray(rng.randn(B, Le, cfg.d_model).astype(np.float32))
    enc_mask = jnp.ones((B, Le), jnp.int32)
    dec = jnp.asarray(rng.randint(2, cfg.vocab_size, (B, Ld)).astype(np.int32))
    m = T5ForConditionalGeneration(cfg)
    mr = T5ForConditionalGeneration(cfg_r)
    vs = m.init(jax.random.PRNGKey(0), embeds, enc_mask, dec, None)

    def loss(model, params):
        lg = model.apply({"params": params}, embeds, enc_mask, dec, None)
        return jnp.sum(lg ** 2) * 1e-4

    l1, g1 = jax.value_and_grad(lambda p: loss(m, p))(vs["params"])
    l2, g2 = jax.value_and_grad(lambda p: loss(mr, p))(vs["params"])
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                                   atol=1e-7)


def test_blip2_generate_beam(blip2_setup):
    """Blip2T5.generate (blip2_t5.py:186-263 non-sampling branch): beam
    search produces valid tokens and beats/matches greedy's score path."""
    from situation3d_tpu.models.blip2_t5 import generate, predict_answers
    model, variables, batch = (blip2_setup["model"], blip2_setup["vs"],
                               blip2_setup["batch"])
    beam = np.asarray(generate(model, variables, batch, num_beams=3,
                               max_length=5))
    greedy = np.asarray(predict_answers(model, variables, batch, 5))
    assert beam.shape == greedy.shape
    assert beam.dtype == np.int32
    assert (beam >= 0).all() and (beam < model.cfg.t5.vocab_size).all()
    # num_beams=1 falls back to greedy exactly
    one = np.asarray(generate(model, variables, batch, num_beams=1,
                              max_length=5))
    np.testing.assert_array_equal(one, greedy)


def test_blip2_generate_sampling(blip2_setup):
    """Nucleus-sampling branch (use_nucleus_sampling=True): valid tokens,
    reproducible under a fixed key, top_p=tiny collapses to greedy."""
    from situation3d_tpu.models.blip2_t5 import generate, predict_answers
    model, variables, batch = (blip2_setup["model"], blip2_setup["vs"],
                               blip2_setup["batch"])
    k = jax.random.PRNGKey(3)
    s1 = np.asarray(generate(model, variables, batch,
                             use_nucleus_sampling=True, max_length=5, rng=k))
    s2 = np.asarray(generate(model, variables, batch,
                             use_nucleus_sampling=True, max_length=5, rng=k))
    np.testing.assert_array_equal(s1, s2)
    assert (s1 >= 0).all() and (s1 < model.cfg.t5.vocab_size).all()
    # top_p -> 0 keeps only the argmax token: equals greedy decoding
    s3 = np.asarray(generate(model, variables, batch,
                             use_nucleus_sampling=True, max_length=5,
                             top_p=1e-9, rng=k))
    greedy = np.asarray(predict_answers(model, variables, batch, 5))
    np.testing.assert_array_equal(s3, greedy)


def test_repetition_penalty():
    from situation3d_tpu.models.t5 import apply_repetition_penalty
    lg = jnp.asarray([[2.0, -2.0, 1.0]])
    seen = jnp.asarray([[True, True, False]])
    out = np.asarray(apply_repetition_penalty(lg, seen, 2.0))
    np.testing.assert_allclose(out, [[1.0, -4.0, 1.0]])
