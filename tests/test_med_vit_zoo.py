"""BLIP-1-era zoo parity: MED (med.py) vs HF BertLMHeadModel/BertModel,
plain timm-style ViT (lavis/models/vit.py) vs an inline torch oracle.

Closes the last "vendored model zoo" gap (VERDICT r2 missing #5): the two
BLIP-1 files the reference carries but the 3D path never calls. Oracles
are random local HF configs (hub is unreachable) in float64-free f32 with
Precision.HIGHEST matmuls.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from situation3d_tpu.ckpt_compat.med import convert_med_bert, convert_med_lm
from situation3d_tpu.ckpt_compat.vit import convert_timm_vit
from situation3d_tpu.models.med import (MedBertLMHeadModel, MedBertModel,
                                        MedConfig)
from situation3d_tpu.models.vit import EvaViT, ViTConfig

HI = jax.lax.Precision.HIGHEST


def _med_cfg(**kw):
    return MedConfig(vocab_size=57, hidden_size=16, num_layers=2,
                     num_heads=2, intermediate_size=37,
                     max_position_embeddings=32, encoder_width=12, **kw)


def _hf_bert_config(cfg, **kw):
    from transformers import BertConfig
    return BertConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_layers, num_attention_heads=cfg.num_heads,
        intermediate_size=cfg.intermediate_size,
        max_position_embeddings=cfg.max_position_embeddings,
        type_vocab_size=cfg.type_vocab_size, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0, **kw)


def test_med_lm_head_parity_vs_hf():
    """Multimodal causal decode: logits vs HF BertLMHeadModel with
    cross-attention (med.py:1016-1105 semantics == HF when mode is
    'multimodal')."""
    from transformers import BertLMHeadModel
    cfg = _med_cfg(is_decoder=True)
    torch.manual_seed(0)
    hf = BertLMHeadModel(_hf_bert_config(
        cfg, is_decoder=True, add_cross_attention=True,
        cross_attention_hidden_size=None)).eval()
    # HF inits cross-attn K/V at hidden width; feed encoder states at
    # hidden width too (the BLIP case sets encoder_width=vision width,
    # which HF expresses the same way through cross_attention_hidden_size)
    B, L, N = 2, 7, 5
    rng = np.random.RandomState(1)
    ids = rng.randint(0, cfg.vocab_size, (B, L))
    am = np.ones((B, L), np.int64)
    am[1, 5:] = 0
    enc = rng.randn(B, N, cfg.hidden_size).astype(np.float32)
    enc_m = np.ones((B, N), np.int64)
    enc_m[0, 3:] = 0
    # HF defaults token_type_ids to zeros (adds embedding row 0) where
    # med.py skips the add when None — pass explicit zeros to both
    tt = np.zeros((B, L), np.int64)
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids),
                 attention_mask=torch.tensor(am),
                 token_type_ids=torch.tensor(tt),
                 encoder_hidden_states=torch.tensor(enc),
                 encoder_attention_mask=torch.tensor(enc_m)).logits.numpy()

    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    params = convert_med_lm(sd, num_layers=cfg.num_layers)
    model = MedBertLMHeadModel(cfg)
    with jax.default_matmul_precision("highest"):
        out = model.apply(
            {"params": params}, jnp.asarray(ids), jnp.asarray(am),
            token_type_ids=jnp.asarray(tt),
            encoder_hidden_states=jnp.asarray(enc),
            encoder_attention_mask=jnp.asarray(enc_m), mode="multimodal")
    # HF zeroes nothing at padded positions; compare everywhere
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4, rtol=1e-3)

    # lm_loss: shifted, 0.1-smoothed mean CE (med.py:1106-1116)
    labels = np.where(am.astype(bool), ids, -100)
    with torch.no_grad():
        tl = torch.nn.CrossEntropyLoss(label_smoothing=0.1)(
            torch.tensor(ref[:, :-1]).reshape(-1, cfg.vocab_size),
            torch.tensor(labels[:, 1:]).reshape(-1))
    jl = MedBertLMHeadModel.lm_loss(jnp.asarray(ref), jnp.asarray(labels))
    np.testing.assert_allclose(float(jl), float(tl), atol=1e-5, rtol=1e-5)


def test_med_text_encoder_parity_vs_hf():
    """mode='text' bidirectional encoder + tanh pooler vs HF BertModel
    (med.py:649-900 with no cross-attention executed)."""
    from transformers import BertModel
    cfg = _med_cfg(is_decoder=False, add_cross_attention=False)
    torch.manual_seed(2)
    hf = BertModel(_hf_bert_config(cfg)).eval()
    B, L = 2, 9
    rng = np.random.RandomState(3)
    ids = rng.randint(0, cfg.vocab_size, (B, L))
    am = np.ones((B, L), np.int64)
    am[0, 6:] = 0
    tt = np.zeros((B, L), np.int64)
    tt[:, 4:] = 1
    with torch.no_grad():
        o = hf(input_ids=torch.tensor(ids), attention_mask=torch.tensor(am),
               token_type_ids=torch.tensor(tt))
        ref_seq = o.last_hidden_state.numpy()
        ref_pool = o.pooler_output.numpy()

    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    params = convert_med_bert(sd, num_layers=cfg.num_layers, prefix="")
    model = MedBertModel(cfg)
    with jax.default_matmul_precision("highest"):
        seq, pooled = model.apply(
            {"params": params}, jnp.asarray(ids), jnp.asarray(am),
            token_type_ids=jnp.asarray(tt), mode="text")
    np.testing.assert_allclose(np.asarray(seq), ref_seq, atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(pooled), ref_pool, atol=2e-4,
                               rtol=1e-3)


class _TorchTimmViT(torch.nn.Module):
    """Inline timm-VisionTransformer oracle (lavis/models/vit.py:157-275):
    conv patch embed, cls+pos, pre-LN blocks with FULL qkv bias, final
    norm, all tokens returned."""

    def __init__(self, img, patch, dim, depth, heads):
        super().__init__()
        self.patch = torch.nn.Conv2d(3, dim, patch, stride=patch)
        n = (img // patch) ** 2
        self.cls_token = torch.nn.Parameter(torch.randn(1, 1, dim) * 0.1)
        self.pos_embed = torch.nn.Parameter(torch.randn(1, n + 1, dim) * 0.1)
        self.blocks = torch.nn.ModuleList()
        self.heads = heads
        for _ in range(depth):
            blk = torch.nn.ModuleDict({
                "norm1": torch.nn.LayerNorm(dim, eps=1e-6),
                "qkv": torch.nn.Linear(dim, 3 * dim),
                "proj": torch.nn.Linear(dim, dim),
                "norm2": torch.nn.LayerNorm(dim, eps=1e-6),
                "fc1": torch.nn.Linear(dim, 4 * dim),
                "fc2": torch.nn.Linear(4 * dim, dim),
            })
            self.blocks.append(blk)
        self.norm = torch.nn.LayerNorm(dim, eps=1e-6)

    def forward(self, x):
        x = self.patch(x).flatten(2).transpose(1, 2)
        B, N, C = x.shape
        x = torch.cat([self.cls_token.expand(B, -1, -1), x], 1)
        x = x + self.pos_embed
        for blk in self.blocks:
            h = blk["norm1"](x)
            qkv = blk["qkv"](h).reshape(B, N + 1, 3, self.heads, -1) \
                .permute(2, 0, 3, 1, 4)
            q, k, v = qkv[0], qkv[1], qkv[2]
            d = C // self.heads
            att = ((q * d ** -0.5) @ k.transpose(-2, -1)).softmax(-1)
            o = (att @ v).transpose(1, 2).reshape(B, N + 1, C)
            x = x + blk["proj"](o)
            m = blk["fc2"](torch.nn.functional.gelu(blk["fc1"](blk["norm2"](x))))
            x = x + m
        return self.norm(x)

    def timm_state_dict(self):
        sd = {
            "patch_embed.proj.weight": self.patch.weight,
            "patch_embed.proj.bias": self.patch.bias,
            "cls_token": self.cls_token,
            "pos_embed": self.pos_embed,
            "norm.weight": self.norm.weight,
            "norm.bias": self.norm.bias,
        }
        for i, blk in enumerate(self.blocks):
            b = f"blocks.{i}"
            sd.update({
                f"{b}.norm1.weight": blk["norm1"].weight,
                f"{b}.norm1.bias": blk["norm1"].bias,
                f"{b}.norm2.weight": blk["norm2"].weight,
                f"{b}.norm2.bias": blk["norm2"].bias,
                f"{b}.attn.qkv.weight": blk["qkv"].weight,
                f"{b}.attn.qkv.bias": blk["qkv"].bias,
                f"{b}.attn.proj.weight": blk["proj"].weight,
                f"{b}.attn.proj.bias": blk["proj"].bias,
                f"{b}.mlp.fc1.weight": blk["fc1"].weight,
                f"{b}.mlp.fc1.bias": blk["fc1"].bias,
                f"{b}.mlp.fc2.weight": blk["fc2"].weight,
                f"{b}.mlp.fc2.bias": blk["fc2"].bias,
            })
        return {k: v.detach().numpy() for k, v in sd.items()}


def test_plain_vit_parity():
    IMG, PATCH, DIM, DEPTH, HEADS = 28, 14, 16, 2, 2
    torch.manual_seed(4)
    oracle = _TorchTimmViT(IMG, PATCH, DIM, DEPTH, HEADS).eval()
    imgs = np.random.RandomState(5).randn(2, 3, IMG, IMG).astype(np.float32)
    with torch.no_grad():
        ref = oracle(torch.tensor(imgs)).numpy()

    cfg = ViTConfig(model_name="vit_base", img_size=IMG, patch_size=PATCH,
                    embed_dim=DIM, depth=DEPTH, num_heads=HEADS,
                    mlp_ratio=4.0, qkv_bias=True, full_qkv_bias=True,
                    final_norm=True)
    params = convert_timm_vit(oracle.timm_state_dict(), depth=DEPTH)
    model = EvaViT(cfg)
    with jax.default_matmul_precision("highest"):
        out = model.apply({"params": params},
                          jnp.asarray(imgs.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4, rtol=1e-3)


def test_vit_base_config_factory():
    cfg = ViTConfig.vit_base()
    assert (cfg.embed_dim, cfg.depth, cfg.num_heads) == (768, 12, 12)
    assert cfg.full_qkv_bias and cfg.final_norm
    assert cfg.num_patches == 196
