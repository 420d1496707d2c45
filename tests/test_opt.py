"""OPT causal LM + Blip2OPT tests (modeling_opt.py / blip2_opt.py parity)."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp

from situation3d_tpu.ckpt_compat.opt import convert_opt
from situation3d_tpu.models.opt import (OPTConfig, OPTForCausalLM,
                                        opt_causal_lm_loss,
                                        opt_greedy_decode)


@pytest.fixture(scope="module")
def torch_opt():
    cfg = transformers.OPTConfig(
        vocab_size=128, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, ffn_dim=64, max_position_embeddings=64,
        do_layer_norm_before=True, word_embed_proj_dim=32,
        pad_token_id=1, bos_token_id=2, eos_token_id=2)
    torch.manual_seed(0)
    model = transformers.OPTForCausalLM(cfg)
    model.eval()
    return cfg, model


def _jax_model_and_params(model):
    cfg = OPTConfig.tiny()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = convert_opt(sd, cfg.num_layers)
    return OPTForCausalLM(cfg), params


def test_opt_forward_parity(torch_opt):
    _, model = torch_opt
    jopt, params = _jax_model_and_params(model)
    rng = np.random.RandomState(0)
    ids = rng.randint(3, 128, (2, 7)).astype(np.int64)
    mask = np.ones((2, 7), np.int64)
    mask[1, :2] = 0           # left padding exercises the position cumsum
    ids[1, :2] = 1
    with torch.no_grad():
        want = model(input_ids=torch.tensor(ids),
                     attention_mask=torch.tensor(mask)).logits.numpy()
    with jax.default_matmul_precision("highest"):
        got = np.asarray(jopt.apply({"params": params},
                                    jnp.asarray(ids.astype(np.int32)),
                                    jnp.asarray(mask.astype(np.int32))))
    np.testing.assert_allclose(got[0], want[0], rtol=3e-4, atol=3e-4)
    np.testing.assert_allclose(got[1, 2:], want[1, 2:], rtol=3e-4, atol=3e-4)


def test_opt_greedy_decode_parity(torch_opt):
    """[prefix embeds ; prompt] greedy decode vs HF generate(inputs_embeds)."""
    _, model = torch_opt
    jopt, params = _jax_model_and_params(model)
    rng = np.random.RandomState(1)
    B, P, Lp = 2, 4, 3
    prefix = rng.randn(B, P, 32).astype(np.float32) * 0.3
    prompt = rng.randint(3, 128, (B, Lp)).astype(np.int64)

    with torch.no_grad():
        wte = model.get_input_embeddings()
        emb = torch.cat([torch.tensor(prefix), wte(torch.tensor(prompt))], 1)
        want = model.generate(
            inputs_embeds=emb,
            attention_mask=torch.ones(B, P + Lp, dtype=torch.long),
            max_new_tokens=6, num_beams=1, do_sample=False,
            eos_token_id=None, pad_token_id=1).numpy()

    with jax.default_matmul_precision("highest"):
        got = np.asarray(opt_greedy_decode(
            jopt, {"params": params}, jnp.asarray(prefix),
            jnp.asarray(prompt.astype(np.int32)), 6,
            eos_id=-1, pad_id=1))
    np.testing.assert_array_equal(got, want[:, :6])


def test_opt_greedy_decode_ragged_prompt_parity(torch_opt):
    """Left-padded (ragged) prompts vs HF generate: pad slots must consume
    no position ids and be masked out as attention keys (ADVICE r2: the
    uniform-length test could not catch either)."""
    _, model = torch_opt
    jopt, params = _jax_model_and_params(model)
    rng = np.random.RandomState(4)
    B, P, Lp = 3, 4, 5
    prefix = rng.randn(B, P, 32).astype(np.float32) * 0.3
    prompt = rng.randint(3, 128, (B, Lp)).astype(np.int64)
    pmask = np.ones((B, Lp), np.int64)
    pmask[1, :2] = 0
    prompt[1, :2] = 1
    pmask[2, :4] = 0
    prompt[2, :4] = 1

    with torch.no_grad():
        wte = model.get_input_embeddings()
        emb = torch.cat([torch.tensor(prefix), wte(torch.tensor(prompt))], 1)
        mask = np.concatenate([np.ones((B, P), np.int64), pmask], 1)
        want = model.generate(
            inputs_embeds=emb,
            attention_mask=torch.tensor(mask),
            max_new_tokens=6, num_beams=1, do_sample=False,
            eos_token_id=None, pad_token_id=1).numpy()

    with jax.default_matmul_precision("highest"):
        got = np.asarray(opt_greedy_decode(
            jopt, {"params": params}, jnp.asarray(prefix),
            jnp.asarray(prompt.astype(np.int32)), 6,
            eos_id=-1, pad_id=1,
            first_mask=jnp.asarray(pmask.astype(np.int32))))
    np.testing.assert_array_equal(got, want[:, :6])


def test_opt_causal_lm_loss():
    rng = np.random.RandomState(2)
    logits = jnp.asarray(rng.randn(2, 5, 16).astype(np.float32))
    targets = jnp.asarray([[-100, 3, 4, -100, 5], [-100, -100, 2, 2, 2]])
    loss = float(opt_causal_lm_loss(logits, targets))
    assert np.isfinite(loss) and loss > 0
    # all-ignored targets -> zero loss, not NaN
    loss0 = float(opt_causal_lm_loss(logits, jnp.full((2, 5), -100)))
    assert loss0 == 0.0


def test_blip2_opt_end_to_end():
    from situation3d_tpu.config import QFormerConfig
    from situation3d_tpu.models.blip2_opt import (Blip2OPT,
                                                  opt_predict_answers)
    qcfg = QFormerConfig(hidden_size=16, num_layers=2, num_heads=2,
                         intermediate_size=32, num_query_tokens=4,
                         encoder_width=12, vocab_size=50, max_position=16,
                         scene_token_capacity=8)
    ocfg = OPTConfig.tiny(hidden_size=32, max_position=64)
    model = Blip2OPT(qcfg, ocfg, pc_feat_dim=12)
    rng = np.random.RandomState(0)
    B, N, L = 2, 8, 6
    batch = {
        "pc_feat": jnp.asarray(rng.randn(B, N, 12).astype(np.float32)),
        "pc": jnp.asarray(rng.randint(0, 32, (B, N, 3)).astype(np.int32)),
        "pc_mask": jnp.asarray(np.ones((B, N), np.int32)),
        "input_ids": jnp.asarray(rng.randint(3, 128, (B, L)).astype(np.int32)),
        "input_mask": jnp.asarray(np.ones((B, L), np.int32)),
        "target_mask": jnp.asarray(
            np.concatenate([np.zeros((B, 2), np.int32),
                            np.ones((B, L - 2), np.int32)], 1)),
    }
    vs = model.init(jax.random.PRNGKey(0), batch)
    out = model.apply(vs, batch)
    assert np.isfinite(float(out["loss"]))
    assert out["logits"].shape == (B, 4 + L, 128)
    toks = np.asarray(opt_predict_answers(model, vs, batch, max_len=4))
    assert toks.shape == (B, 4)
    assert (toks >= 0).all() and (toks < 128).all()
