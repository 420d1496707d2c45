"""Trainable-mask / freezing tests (requires_grad replacement).

Reference recipes covered:
- lang freeze modes (sep_lang_module_bert.py:25-45)
- T5 frozen except input/output embeddings (blip2_t5.py:84-89)
- no_update_filter prefixes (lib/config.py:61)
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from situation3d_tpu.config import Config, apply_overrides
from situation3d_tpu.train.optim import (blip2_trainable_mask, combine_masks,
                                         lang_freeze_trainable,
                                         make_optimizer, prefix_trainable,
                                         t5_embed_only_trainable,
                                         trainable_count)


def _params():
    k = jnp.ones((4, 4))
    return {
        "lang_net": {"encoder": {
            "word_embeddings": {"embedding": jnp.ones((8, 4))},
            "layer0": {"q": {"kernel": k, "bias": jnp.ones(4)}},
            "layer1": {"q": {"kernel": k, "bias": jnp.ones(4)}},
        }},
        "scene_encoder": {"conv1": {"kernel": k}},
        "answer_cls_fc1": {"kernel": k, "bias": jnp.ones(4)},
    }


def _blip2_params():
    k = jnp.ones((4, 4))
    return {
        "qformer": {"layer0": {"query": {"kernel": k}}},
        "t5_proj": {"kernel": k, "bias": jnp.ones(4)},
        "t5": {
            "shared": {"embedding": jnp.ones((16, 4))},
            "lm_head": {"kernel": k},
            "encoder": {"block0": {"self_attn": {"q": {"kernel": k}}}},
            "decoder": {"block0": {"self_attn": {"q": {"kernel": k}}}},
        },
    }


def test_lang_freeze_last_layer():
    p = _params()
    m = lang_freeze_trainable(p, "last_layer", num_layers=2)
    assert m["lang_net"]["encoder"]["layer1"]["q"]["kernel"] is True
    assert m["lang_net"]["encoder"]["layer0"]["q"]["kernel"] is False
    assert m["lang_net"]["encoder"]["word_embeddings"]["embedding"] is False
    assert m["answer_cls_fc1"]["kernel"] is True
    assert m["scene_encoder"]["conv1"]["kernel"] is True  # prefix mask is separate


def test_lang_freeze_all_none():
    p = _params()
    m_all = lang_freeze_trainable(p, "all", 2)
    assert not any(jax.tree_util.tree_leaves(
        m_all["lang_net"]))
    assert m_all["answer_cls_fc1"]["kernel"] is True
    m_none = lang_freeze_trainable(p, "none", 2)
    assert all(jax.tree_util.tree_leaves(m_none))


def test_t5_embed_only():
    p = _blip2_params()
    m = t5_embed_only_trainable(p)
    assert m["t5"]["shared"]["embedding"] is True
    assert m["t5"]["lm_head"]["kernel"] is True
    assert m["t5"]["encoder"]["block0"]["self_attn"]["q"]["kernel"] is False
    assert m["t5"]["decoder"]["block0"]["self_attn"]["q"]["kernel"] is False
    assert m["qformer"]["layer0"]["query"]["kernel"] is True
    assert m["t5_proj"]["kernel"] is True
    n_tr, n_tot = trainable_count(p, m)
    assert n_tr < n_tot


def test_blip2_mask_from_config():
    cfg = Config()
    assert cfg.blip2.freeze_t5_except_embeddings
    p = _blip2_params()
    m = blip2_trainable_mask(cfg, p)
    assert m["t5"]["encoder"]["block0"]["self_attn"]["q"]["kernel"] is False
    cfg2 = apply_overrides(Config(), ["blip2.freeze_t5_except_embeddings=false"])
    m2 = blip2_trainable_mask(cfg2, p)
    assert all(jax.tree_util.tree_leaves(m2))


def test_frozen_leaves_get_zero_updates_and_no_adam_state():
    cfg = apply_overrides(Config(), ["train.frozen_prefixes=scene_encoder,"]).train
    p = _params()
    mask = lang_freeze_trainable(p, "last_layer", 2)
    tx, _ = make_optimizer(cfg, p, 10, trainable=mask)
    state = tx.init(p)
    grads = jax.tree_util.tree_map(jnp.ones_like, p)
    updates, _ = tx.update(grads, state, p)
    # frozen: zero updates
    np.testing.assert_array_equal(
        np.asarray(updates["scene_encoder"]["conv1"]["kernel"]), 0.0)
    np.testing.assert_array_equal(
        np.asarray(updates["lang_net"]["encoder"]["layer0"]["q"]["kernel"]), 0.0)
    # trainable: non-zero updates
    assert np.abs(np.asarray(
        updates["lang_net"]["encoder"]["layer1"]["q"]["kernel"])).sum() > 0
    assert np.abs(np.asarray(updates["answer_cls_fc1"]["kernel"])).sum() > 0
    # no adam moments for frozen leaves: count float leaves in the opt state
    n_state = sum(x.size for x in jax.tree_util.tree_leaves(state)
                  if hasattr(x, "size") and x.ndim > 0)
    n_trainable, n_total = trainable_count(p, combine_masks(
        prefix_trainable(p, ("scene_encoder",)), mask))
    assert n_state == 2 * n_trainable, (n_state, n_trainable, n_total)


def test_combine_masks():
    p = _params()
    a = prefix_trainable(p, ("scene_encoder",))
    b = lang_freeze_trainable(p, "all", 2)
    c = combine_masks(a, b)
    assert c["scene_encoder"]["conv1"]["kernel"] is False
    assert c["lang_net"]["encoder"]["layer0"]["q"]["kernel"] is False
    assert c["answer_cls_fc1"]["kernel"] is True


def test_finite_guard_gated_update_is_noop():
    """A non-finite step must be a TRUE no-op (ADVICE r2): zeroed grads
    alone still apply adamw weight decay and decay the Adam moments."""
    import optax

    from situation3d_tpu.train.trainer import finite_guard, gate_update

    params = {"w": jnp.asarray(np.ones((3, 3), np.float32)),
              "b": jnp.asarray(np.ones((3,), np.float32))}
    tx = optax.adamw(1e-2, weight_decay=0.1)
    opt_state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)

    def step(loss_val):
        g, finite = finite_guard(grads, loss=jnp.float32(loss_val),
                                 mode="loss")
        updates, new_opt = tx.update(g, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return gate_update(finite, new_params, new_opt, params, opt_state)

    # NaN loss: params AND opt state bit-identical to before
    p_nan, o_nan = step(float("nan"))
    for a, b in zip(jax.tree_util.tree_leaves(p_nan),
                    jax.tree_util.tree_leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(o_nan),
                    jax.tree_util.tree_leaves(opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # finite loss: params move
    p_ok, o_ok = step(1.0)
    assert float(np.abs(np.asarray(p_ok["w"]) - 1.0).sum()) > 0
