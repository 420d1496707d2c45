"""Stage-1 Blip2Qformer tests (blip2_qformer.py:30-461: ITC + ITM with hard
negatives + LM over a text-capable Q-Former)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from situation3d_tpu.config import QFormerConfig
from situation3d_tpu.models.blip2_qformer import Blip2Qformer, QFormerTextModel


def tiny_qcfg():
    return QFormerConfig(num_query_tokens=4, hidden_size=32, num_layers=2,
                         num_heads=4, intermediate_size=64, encoder_width=24,
                         vocab_size=64, max_position=32,
                         scene_token_capacity=16)


def make_batch(rng, B=4, N=16, Lt=8, cfg=None):
    cfg = cfg or tiny_qcfg()
    return {
        "image_embeds": jnp.asarray(
            rng.randn(B, N, cfg.encoder_width).astype(np.float32)),
        "image_mask": jnp.asarray(np.ones((B, N), np.int32)),
        "text_ids": jnp.asarray(
            rng.randint(2, cfg.vocab_size - 2, (B, Lt)).astype(np.int32)),
        "text_mask": jnp.asarray(np.ones((B, Lt), np.int32)),
    }


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_qcfg()
    rng = np.random.RandomState(0)
    batch = make_batch(rng, cfg=cfg)
    model = Blip2Qformer(cfg)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        batch)
    return dict(cfg=cfg, model=model, variables=variables, batch=batch)


def test_stage1_losses_finite_and_grads(setup):
    model, variables, batch = (setup["model"], setup["variables"],
                               setup["batch"])

    def loss_fn(params):
        out = model.apply({"params": params}, batch, train=True,
                          rngs={"sample": jax.random.PRNGKey(2)})
        return out["loss"], out

    (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        variables["params"])
    for k in ("loss", "loss_itc", "loss_itm", "loss_lm"):
        assert np.isfinite(float(out[k])), k
        assert float(out[k]) > 0, k
    # grads reach every head + the shared embedding + temperature
    for path in (("vision_proj",), ("text_proj",), ("itm_head",),
                 ("word_embeddings",), ("lm_transform",), ("temp",)):
        g = grads
        for p in path:
            g = g[p]
        total = sum(float(jnp.abs(x).sum())
                    for x in jax.tree_util.tree_leaves(g))
        assert total > 0, path


def test_itc_perfect_alignment_low_loss(setup):
    """Aligned feature pairs should score lower ITC loss than mismatched."""
    from situation3d_tpu.train.contrastive import itc_loss
    rng = np.random.RandomState(0)
    f = rng.randn(6, 8).astype(np.float32)
    good = float(itc_loss(jnp.asarray(f)[:, None, :], jnp.asarray(f),
                          jnp.asarray(0.07)))
    perm = np.roll(f, 1, axis=0)
    bad = float(itc_loss(jnp.asarray(f)[:, None, :], jnp.asarray(perm),
                         jnp.asarray(0.07)))
    assert good < bad


def test_lm_causality(setup):
    """Changing a later caption token must not change earlier LM logits."""
    cfg, model, variables = setup["cfg"], setup["model"], setup["variables"]
    batch = dict(setup["batch"])

    def logits_of(text_ids):
        dec_in = jnp.roll(text_ids, 1, axis=1).at[:, 0].set(
            cfg.vocab_size - 1)

        def fn(mdl):
            h = mdl.qformer(enc_states=batch["image_embeds"],
                            enc_mask=batch["image_mask"],
                            text_ids=dec_in,
                            text_mask=jnp.ones_like(batch["text_mask"]),
                            use_query=True, causal_text=True,
                            deterministic=True)
            return mdl.lm_logits(h[:, cfg.num_query_tokens:])

        return np.asarray(model.apply(variables, method=fn), np.float32)

    # changing label token j only reaches decoder input j+1 (shift-right),
    # so logits at positions <= j must be unchanged and some later position
    # must differ
    j = 4
    t1 = batch["text_ids"]
    t2 = t1.at[:, j].set((t1[:, j] + 1) % (cfg.vocab_size - 2))
    l1, l2 = logits_of(t1), logits_of(t2)
    np.testing.assert_allclose(l1[:, : j + 1], l2[:, : j + 1], atol=1e-5)
    assert np.abs(l1[:, j + 1 :] - l2[:, j + 1 :]).max() > 1e-6


def test_text_and_query_modes(setup):
    """Query-only / text-only / joint passes produce the right shapes."""
    cfg, model, variables = setup["cfg"], setup["model"], setup["variables"]
    batch = setup["batch"]
    B, N, Lt = 4, 16, 8

    q = model.apply(variables, batch["image_embeds"], batch["image_mask"],
                    method=Blip2Qformer.encode_image)
    assert q.shape == (B, cfg.num_query_tokens, cfg.hidden_size)
    t = model.apply(variables, batch["text_ids"], batch["text_mask"],
                    method=Blip2Qformer.encode_text)
    assert t.shape == (B, Lt, cfg.hidden_size)
