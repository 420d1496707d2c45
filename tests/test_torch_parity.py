"""Numerical parity vs torch/HF reference implementations.

Builds RANDOMLY-initialized HF models from local configs (no network),
converts their state dicts through ckpt_compat, and checks our flax forward
matches the torch forward — the strongest parity evidence available without
the real checkpoints (which the zero-egress environment cannot fetch).
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp

from situation3d_tpu.ckpt_compat.mpnet import convert_mpnet
from situation3d_tpu.ckpt_compat.t5 import convert_t5
from situation3d_tpu.config import LangConfig, T5Config


@pytest.fixture(scope="module")
def torch_mpnet():
    cfg = transformers.MPNetConfig(
        vocab_size=120, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=40, relative_attention_num_buckets=32)
    torch.manual_seed(0)
    model = transformers.MPNetModel(cfg)
    model.eval()
    return cfg, model


def test_mpnet_forward_parity(torch_mpnet):
    hf_cfg, model = torch_mpnet
    cfg = LangConfig(vocab_size=120, hidden_size=32, num_layers=2, num_heads=4,
                     intermediate_size=64, max_position=40,
                     layer_norm_eps=hf_cfg.layer_norm_eps)
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = convert_mpnet(sd, cfg.num_layers)

    rng = np.random.RandomState(0)
    ids = rng.randint(4, 120, (2, 9)).astype(np.int32)
    mask = np.ones((2, 9), np.int32)
    mask[1, 6:] = 0
    ids[1, 6:] = 1  # pad token

    with torch.no_grad():
        want = model(input_ids=torch.tensor(ids.astype(np.int64)),
                     attention_mask=torch.tensor(mask.astype(np.int64))
                     ).last_hidden_state.numpy()

    from situation3d_tpu.models.lang import MPNetEncoder
    got = np.asarray(MPNetEncoder(cfg).apply(
        {"params": params}, jnp.asarray(ids), jnp.asarray(mask)))
    # compare on non-pad positions
    np.testing.assert_allclose(got[0], want[0], rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(got[1, :6], want[1, :6], rtol=2e-4, atol=2e-4)


@pytest.fixture(scope="module")
def torch_t5():
    cfg = transformers.T5Config(
        vocab_size=96, d_model=32, d_kv=8, d_ff=64, num_layers=2,
        num_decoder_layers=2, num_heads=4, relative_attention_num_buckets=32,
        relative_attention_max_distance=128, dense_act_fn="gelu",
        is_gated_act=True, feed_forward_proj="gated-gelu",
        tie_word_embeddings=False, decoder_start_token_id=0)
    torch.manual_seed(0)
    model = transformers.T5ForConditionalGeneration(cfg)
    model.eval()
    return cfg, model


def test_t5_forward_parity(torch_t5):
    hf_cfg, model = torch_t5
    cfg = T5Config(vocab_size=96, d_model=32, d_kv=8, d_ff=64, num_layers=2,
                   num_decoder_layers=2, num_heads=4, dense_act_fn="gelu",
                   is_gated_act=True, tie_word_embeddings=False,
                   max_answer_len=8)
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = convert_t5(sd, 2, 2, 96)

    rng = np.random.RandomState(1)
    enc_ids = rng.randint(2, 96, (2, 7)).astype(np.int64)
    enc_mask = np.ones((2, 7), np.int64)
    dec_ids = rng.randint(2, 96, (2, 5)).astype(np.int64)

    with torch.no_grad():
        want = model(input_ids=torch.tensor(enc_ids),
                     attention_mask=torch.tensor(enc_mask),
                     decoder_input_ids=torch.tensor(dec_ids)).logits.numpy()

    from situation3d_tpu.models.t5 import T5ForConditionalGeneration as JT5
    jt5 = JT5(cfg)
    embeds = np.asarray(params["shared"]["embedding"])[enc_ids]
    got = np.asarray(jt5.apply(
        {"params": params}, jnp.asarray(embeds), jnp.asarray(enc_mask),
        jnp.asarray(dec_ids.astype(np.int32)), None))
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)


def test_t5_greedy_decode_parity(torch_t5):
    hf_cfg, model = torch_t5
    cfg = T5Config(vocab_size=96, d_model=32, d_kv=8, d_ff=64, num_layers=2,
                   num_decoder_layers=2, num_heads=4, dense_act_fn="gelu",
                   is_gated_act=True, tie_word_embeddings=False,
                   max_answer_len=6, eos_token_id=1, pad_token_id=0,
                   decoder_start_token_id=0)
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = convert_t5(sd, 2, 2, 96)

    rng = np.random.RandomState(2)
    enc_ids = rng.randint(2, 96, (2, 6)).astype(np.int64)
    enc_mask = np.ones((2, 6), np.int64)

    with torch.no_grad():
        want = model.generate(
            input_ids=torch.tensor(enc_ids),
            attention_mask=torch.tensor(enc_mask),
            max_new_tokens=6, num_beams=1, do_sample=False).numpy()

    from situation3d_tpu.models.t5 import (T5ForConditionalGeneration as JT5,
                                           greedy_decode)
    jt5 = JT5(cfg)
    embeds = np.asarray(params["shared"]["embedding"])[enc_ids]
    got = np.asarray(greedy_decode(
        jt5, {"params": params}, jnp.asarray(embeds), jnp.asarray(enc_mask),
        6, 0, 1, 0))
    # HF output starts with the decoder_start token; drop it. After EOS both
    # pad (HF pads with pad_token_id).
    hf_tokens = want[:, 1:1 + got.shape[1]]
    np.testing.assert_array_equal(got, hf_tokens)


def test_t5_beam_search_parity(torch_t5):
    """Beam search vs HF generate(num_beams=3) — token-exact on the random
    tiny T5 (ties have measure zero with continuous random logits)."""
    hf_cfg, model = torch_t5
    cfg = T5Config(vocab_size=96, d_model=32, d_kv=8, d_ff=64, num_layers=2,
                   num_decoder_layers=2, num_heads=4, dense_act_fn="gelu",
                   is_gated_act=True, tie_word_embeddings=False,
                   max_answer_len=6, eos_token_id=1, pad_token_id=0,
                   decoder_start_token_id=0)
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = convert_t5(sd, 2, 2, 96)

    rng = np.random.RandomState(3)
    enc_ids = rng.randint(2, 96, (3, 6)).astype(np.int64)
    enc_mask = np.ones((3, 6), np.int64)

    with torch.no_grad():
        want = model.generate(
            input_ids=torch.tensor(enc_ids),
            attention_mask=torch.tensor(enc_mask),
            max_new_tokens=6, num_beams=3, do_sample=False,
            length_penalty=1.0, early_stopping=False).numpy()

    from situation3d_tpu.models.t5 import (T5ForConditionalGeneration as JT5,
                                           beam_search_decode)
    jt5 = JT5(cfg)
    embeds = np.asarray(params["shared"]["embedding"])[enc_ids]
    got = np.asarray(beam_search_decode(
        jt5, {"params": params}, jnp.asarray(embeds), jnp.asarray(enc_mask),
        6, 0, 1, 0, num_beams=3, length_penalty=1.0))
    hf_tokens = want[:, 1:]
    L = min(got.shape[1], hf_tokens.shape[1])
    np.testing.assert_array_equal(got[:, :L], hf_tokens[:, :L])


def test_t5_beam_search_parity_longer(torch_t5):
    """Second beam config: beams=4, longer budget, different seed."""
    hf_cfg, model = torch_t5
    cfg = T5Config(vocab_size=96, d_model=32, d_kv=8, d_ff=64, num_layers=2,
                   num_decoder_layers=2, num_heads=4, dense_act_fn="gelu",
                   is_gated_act=True, tie_word_embeddings=False,
                   max_answer_len=10, eos_token_id=1, pad_token_id=0,
                   decoder_start_token_id=0)
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = convert_t5(sd, 2, 2, 96)
    rng = np.random.RandomState(7)
    enc_ids = rng.randint(2, 96, (2, 9)).astype(np.int64)
    enc_mask = np.ones((2, 9), np.int64)
    with torch.no_grad():
        want = model.generate(
            input_ids=torch.tensor(enc_ids),
            attention_mask=torch.tensor(enc_mask),
            max_new_tokens=10, num_beams=4, do_sample=False,
            length_penalty=1.0, early_stopping=False).numpy()
    from situation3d_tpu.models.t5 import (T5ForConditionalGeneration as JT5,
                                           beam_search_decode)
    jt5 = JT5(cfg)
    embeds = np.asarray(params["shared"]["embedding"])[enc_ids]
    got = np.asarray(beam_search_decode(
        jt5, {"params": params}, jnp.asarray(embeds), jnp.asarray(enc_mask),
        10, 0, 1, 0, num_beams=4, length_penalty=1.0))
    hf_tokens = want[:, 1:]
    L = min(got.shape[1], hf_tokens.shape[1])
    np.testing.assert_array_equal(got[:, :L], hf_tokens[:, :L])
