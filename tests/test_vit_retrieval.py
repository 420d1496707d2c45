"""Vision encoders (EVA-g / CLIP-L family) + retrieval sim-matrix tests.

Torch oracles are built inline with the reference's exact semantics
(eva_vit.py:69-419, clip_vit.py:116-209) at tiny sizes, converted through
ckpt_compat/vit.py, and compared against the flax forward.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from situation3d_tpu.ckpt_compat.vit import convert_clip_vit, convert_eva_vit
from situation3d_tpu.models.vit import (ClipViT, EvaViT, ViTConfig,
                                        init_vision_encoder,
                                        interpolate_pos_embed)

IMG, PATCH, DIM, DEPTH, HEADS = 28, 14, 16, 2, 2


class _TorchEvaBlock(torch.nn.Module):
    """Reference Block semantics (eva_vit.py:165-213): pre-LN, fused qkv
    with q/v biases and a zero k bias (eva_vit.py:133-140)."""

    def __init__(self, dim, heads, mlp_ratio):
        super().__init__()
        self.heads = heads
        self.norm1 = torch.nn.LayerNorm(dim, eps=1e-6)
        self.norm2 = torch.nn.LayerNorm(dim, eps=1e-6)
        self.attn_qkv = torch.nn.Linear(dim, dim * 3, bias=False)
        self.q_bias = torch.nn.Parameter(torch.randn(dim) * 0.1)
        self.v_bias = torch.nn.Parameter(torch.randn(dim) * 0.1)
        self.attn_proj = torch.nn.Linear(dim, dim)
        self.fc1 = torch.nn.Linear(dim, int(dim * mlp_ratio))
        self.fc2 = torch.nn.Linear(int(dim * mlp_ratio), dim)

    def forward(self, x):
        B, N, C = x.shape
        h = self.norm1(x)
        bias = torch.cat([self.q_bias, torch.zeros_like(self.q_bias),
                          self.v_bias])
        qkv = torch.nn.functional.linear(h, self.attn_qkv.weight, bias)
        qkv = qkv.reshape(B, N, 3, self.heads, -1).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        d = C // self.heads
        att = (q * d ** -0.5) @ k.transpose(-2, -1)
        att = att.softmax(dim=-1)
        out = (att @ v).transpose(1, 2).reshape(B, N, C)
        x = x + self.attn_proj(out)
        m = self.fc2(torch.nn.functional.gelu(self.fc1(self.norm2(x))))
        return x + m

    def state_flax_keys(self, prefix):
        return {
            f"{prefix}.norm1.weight": self.norm1.weight,
            f"{prefix}.norm1.bias": self.norm1.bias,
            f"{prefix}.norm2.weight": self.norm2.weight,
            f"{prefix}.norm2.bias": self.norm2.bias,
            f"{prefix}.attn.qkv.weight": self.attn_qkv.weight,
            f"{prefix}.attn.q_bias": self.q_bias,
            f"{prefix}.attn.v_bias": self.v_bias,
            f"{prefix}.attn.proj.weight": self.attn_proj.weight,
            f"{prefix}.attn.proj.bias": self.attn_proj.bias,
            f"{prefix}.mlp.fc1.weight": self.fc1.weight,
            f"{prefix}.mlp.fc1.bias": self.fc1.bias,
            f"{prefix}.mlp.fc2.weight": self.fc2.weight,
            f"{prefix}.mlp.fc2.bias": self.fc2.bias,
        }


def test_eva_vit_torch_parity():
    torch.manual_seed(0)
    patch = torch.nn.Conv2d(3, DIM, PATCH, stride=PATCH)
    blocks = [_TorchEvaBlock(DIM, HEADS, 4.0) for _ in range(DEPTH)]
    n_patches = (IMG // PATCH) ** 2
    cls_token = torch.randn(1, 1, DIM) * 0.1
    pos = torch.randn(1, n_patches + 1, DIM) * 0.1

    x = torch.randn(2, 3, IMG, IMG)
    with torch.no_grad():
        h = patch(x).flatten(2).transpose(1, 2)
        h = torch.cat([cls_token.expand(2, -1, -1), h], 1) + pos
        for b in blocks:
            h = b(h)
    want = h.numpy()

    sd = {"patch_embed.proj.weight": patch.weight,
          "patch_embed.proj.bias": patch.bias,
          "cls_token": cls_token, "pos_embed": pos}
    for i, b in enumerate(blocks):
        sd.update(b.state_flax_keys(f"blocks.{i}"))
    sd = {k: v.detach().numpy() for k, v in sd.items()}
    params = convert_eva_vit(sd, depth=DEPTH)

    cfg = ViTConfig(model_name="eva_clip_g", img_size=IMG, patch_size=PATCH,
                    embed_dim=DIM, depth=DEPTH, num_heads=HEADS,
                    mlp_ratio=4.0)
    model = EvaViT(cfg, dtype=jnp.float32)
    with jax.default_matmul_precision("highest"):
        got = model.apply({"params": params},
                          jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4)


def test_clip_vit_torch_parity():
    torch.manual_seed(1)
    conv1 = torch.nn.Conv2d(3, DIM, PATCH, stride=PATCH, bias=False)
    cls = torch.randn(DIM) * DIM ** -0.5
    n_patches = (IMG // PATCH) ** 2
    pos = torch.randn(n_patches + 1, DIM) * DIM ** -0.5
    ln_pre = torch.nn.LayerNorm(DIM, eps=1e-5)
    attns = [torch.nn.MultiheadAttention(DIM, HEADS) for _ in range(DEPTH)]
    ln1s = [torch.nn.LayerNorm(DIM, eps=1e-5) for _ in range(DEPTH)]
    ln2s = [torch.nn.LayerNorm(DIM, eps=1e-5) for _ in range(DEPTH)]
    fcs = [torch.nn.Linear(DIM, DIM * 4) for _ in range(DEPTH)]
    projs = [torch.nn.Linear(DIM * 4, DIM) for _ in range(DEPTH)]

    x = torch.randn(2, 3, IMG, IMG)
    with torch.no_grad():
        h = conv1(x).flatten(2).transpose(1, 2)
        h = torch.cat([cls.expand(2, 1, -1), h], 1) + pos
        h = ln_pre(h).permute(1, 0, 2)               # NLD -> LND
        for i in range(DEPTH):
            a = ln1s[i](h)
            h = h + attns[i](a, a, a, need_weights=False)[0]
            m = ln2s[i](h)
            m = fcs[i](m)
            m = m * torch.sigmoid(1.702 * m)         # QuickGELU
            h = h + projs[i](m)
        h = h.permute(1, 0, 2)
    want = h.numpy()

    sd = {"conv1.weight": conv1.weight, "class_embedding": cls,
          "positional_embedding": pos,
          "ln_pre.weight": ln_pre.weight, "ln_pre.bias": ln_pre.bias}
    for i in range(DEPTH):
        b = f"transformer.resblocks.{i}"
        sd.update({
            f"{b}.ln_1.weight": ln1s[i].weight, f"{b}.ln_1.bias": ln1s[i].bias,
            f"{b}.ln_2.weight": ln2s[i].weight, f"{b}.ln_2.bias": ln2s[i].bias,
            f"{b}.attn.in_proj_weight": attns[i].in_proj_weight,
            f"{b}.attn.in_proj_bias": attns[i].in_proj_bias,
            f"{b}.attn.out_proj.weight": attns[i].out_proj.weight,
            f"{b}.attn.out_proj.bias": attns[i].out_proj.bias,
            f"{b}.mlp.c_fc.weight": fcs[i].weight,
            f"{b}.mlp.c_fc.bias": fcs[i].bias,
            f"{b}.mlp.c_proj.weight": projs[i].weight,
            f"{b}.mlp.c_proj.bias": projs[i].bias,
        })
    sd = {k: v.detach().numpy() for k, v in sd.items()}
    params = convert_clip_vit(sd, depth=DEPTH)

    cfg = ViTConfig(model_name="clip_L", img_size=IMG, patch_size=PATCH,
                    embed_dim=DIM, depth=DEPTH, num_heads=HEADS,
                    mlp_ratio=4.0, layer_norm_eps=1e-5)
    model = ClipViT(cfg, dtype=jnp.float32)
    with jax.default_matmul_precision("highest"):
        got = model.apply({"params": params},
                          jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4)


def test_init_vision_encoder_surface():
    vit, ln = init_vision_encoder("eva_clip_g", img_size=IMG)
    assert vit.cfg.embed_dim == 1408 and vit.cfg.depth == 39
    vit, _ = init_vision_encoder("clip_L", img_size=IMG)
    assert vit.cfg.embed_dim == 1024 and vit.cfg.depth == 21
    with pytest.raises(ValueError):
        init_vision_encoder("vit_base")


def test_interpolate_pos_embed():
    pos = np.random.RandomState(0).randn(1, 1 + 4 * 4, 8).astype(np.float32)
    out = interpolate_pos_embed(pos, 36)
    assert out.shape == (1, 37, 8)
    np.testing.assert_allclose(out[:, 0], pos[:, 0])  # cls untouched
    same = interpolate_pos_embed(pos, 16)
    np.testing.assert_allclose(same, pos)


def test_compute_sim_matrix():
    from situation3d_tpu.config import QFormerConfig
    from situation3d_tpu.eval.retrieval import FILL, compute_sim_matrix
    from situation3d_tpu.models.blip2_qformer import Blip2Qformer

    cfg = QFormerConfig(hidden_size=16, num_layers=2, num_heads=2,
                        intermediate_size=32, num_query_tokens=4,
                        encoder_width=12, vocab_size=50, max_position=16)
    model = Blip2Qformer(cfg, embed_dim=8)
    rng = np.random.RandomState(0)
    Ni, Nt, N, L = 5, 7, 6, 5
    imgs = rng.randn(Ni, N, 12).astype(np.float32)
    imask = np.ones((Ni, N), np.int32)
    tids = rng.randint(1, 50, (Nt, L)).astype(np.int32)
    tmask = np.ones((Nt, L), np.int32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        {"image_embeds": imgs[:2], "image_mask": imask[:2],
         "text_ids": tids[:2], "text_mask": tmask[:2]})

    i2t, t2i = compute_sim_matrix(model, variables, imgs, imask, tids, tmask,
                                  k_test=3, encode_batch=4, rerank_chunk=2)
    assert i2t.shape == (Ni, Nt) and t2i.shape == (Nt, Ni)
    # exactly k_test entries per row are rescored, the rest stay FILL
    assert ((i2t != FILL).sum(1) == 3).all()
    assert ((t2i != FILL).sum(1) == 3).all()
    assert np.isfinite(i2t).all() and np.isfinite(t2i).all()

    # the 2-process split covers every row exactly once and merges by sum
    a = [compute_sim_matrix(model, variables, imgs, imask, tids, tmask,
                            k_test=3, encode_batch=4, rerank_chunk=2,
                            rank=r, world=2) for r in (0, 1)]
    merged = a[0][0] + a[1][0]
    covered = (a[0][0] != FILL).any(1) | (a[1][0] != FILL).any(1)
    assert covered.all()
    # rows owned by one rank match the single-process result up to the
    # constant FILL offset added by the other rank's placeholder
    own0 = (a[0][0] != FILL).any(1)
    np.testing.assert_allclose(merged[own0], i2t[own0] + FILL, atol=1e-4)


def test_retrieval_metrics():
    from situation3d_tpu.eval.retrieval import retrieval_metrics
    # 3 images x 6 texts; image i matches texts {2i, 2i+1}
    rng = np.random.RandomState(0)
    i2t = rng.randn(3, 6).astype(np.float32)
    t2i = rng.randn(6, 3).astype(np.float32)
    img2txt = {i: [2 * i, 2 * i + 1] for i in range(3)}
    txt2img = {t: t // 2 for t in range(6)}
    # make the match always ranked first -> perfect recall
    for i in range(3):
        i2t[i, 2 * i] = 10.0
    for t in range(6):
        t2i[t, t // 2] = 10.0
    m = retrieval_metrics(i2t, t2i, img2txt, txt2img)
    assert m["txt_r1"] == 100.0 and m["img_r1"] == 100.0
    assert m["r_mean"] == 100.0

    # drop one match below rank 10 -> txt_r1 falls to 2/3
    i2t[0, 0] = i2t[0, 1] = -100.0
    m = retrieval_metrics(i2t, t2i, img2txt, txt2img)
    assert abs(m["txt_r1"] - 200.0 / 3) < 1e-6


def test_caption_and_retrieval_tasks():
    """Registry tasks wrapping the generative/stage-1 models
    (lavis/tasks/{captioning,retrieval}.py parity)."""
    from situation3d_tpu.config import Config, apply_overrides
    from situation3d_tpu.train.tasks import setup_task

    cfg = apply_overrides(Config(), [
        "blip2.qformer.hidden_size=16", "blip2.qformer.num_layers=2",
        "blip2.qformer.num_heads=2", "blip2.qformer.intermediate_size=32",
        "blip2.qformer.num_query_tokens=4", "blip2.qformer.encoder_width=12",
        "blip2.qformer.vocab_size=50", "train.bf16=false"])
    cap = setup_task("captioning", cfg, synthetic=True)
    assert cap.cfg.blip2.prompt == "{}"   # no question template
    m = cap.report_metrics({"a": "a red chair"}, {"a": ["a red chair"]})
    assert m["BLEU-1"] == pytest.approx(1.0)

    ret = setup_task("retrieval", cfg, synthetic=True, k_test=3)
    model = ret.build_model()
    rng_np = np.random.RandomState(0)
    Ni, Nt, N, L = 4, 4, 6, 5
    imgs = rng_np.randn(Ni, N, 12).astype(np.float32)
    imask = np.ones((Ni, N), np.int32)
    tids = rng_np.randint(1, 50, (Nt, L)).astype(np.int32)
    tmask = np.ones((Nt, L), np.int32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        {"image_embeds": imgs[:2], "image_mask": imask[:2],
         "text_ids": tids[:2], "text_mask": tmask[:2]})
    metrics = ret.evaluation(model, variables, imgs, imask, tids, tmask,
                             img2txt={i: [i] for i in range(4)},
                             txt2img={i: i for i in range(4)})
    assert set(metrics) >= {"txt_r1", "img_r1", "r_mean", "agg_metrics"}
    assert 0 <= metrics["r_mean"] <= 100
