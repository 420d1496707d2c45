"""Single-scene inference entry point.

Replaces ``3DLLM_BLIP2-base/inference.py``: load a scene's precomputed
features (``pc_feat`` [N, 1408] .pt + ``pc`` [N, 3] .npy), ask free-form
questions, print generated answers (``inference.py:30-32``: from_pretrained
+ load_state_dict); and a SIG3D mode: scene ``.pth`` + situation/question
-> classified answer from a trained checkpoint.
"""
from __future__ import annotations

import argparse
import json
import os

import numpy as np

from situation3d_tpu.config import load_config
from situation3d_tpu.utils.misc import setup_logger


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="situation3d_tpu inference")
    p.add_argument("--task", choices=["sqa3d", "3d_vqa"], default="3d_vqa")
    p.add_argument("--config", default=None)
    p.add_argument("--options", nargs="*", default=[])
    p.add_argument("--pc-feat", help="scene features .pt (N,1408)")
    p.add_argument("--pc", help="voxel coords .npy (N,3)")
    p.add_argument("--scene", help="scene id for sqa3d mode")
    p.add_argument("--scene-dir", default=None,
                   help="OpenScene .pth scene dir for sqa3d mode")
    p.add_argument("--situation", default="I am standing in the room.")
    p.add_argument("--question", required=False,
                   default="What is in front of me?")
    p.add_argument("--checkpoint", default=None, help="orbax checkpoint dir")
    p.add_argument("--trainable-checkpoint", default=None,
                   help="trainable-only .npz (blip2 trainer best-model dump)")
    p.add_argument("--torch-checkpoint", default=None,
                   help="reference-format torch .pth checkpoint")
    p.add_argument("--visualize", action="store_true",
                   help="t-SNE scene-feature embedding render "
                        "(3DLLM_BLIP2-base/inference.py:80-104)")
    p.add_argument("--visualize-out", default="outputs/tsne_pc.png")
    p.add_argument("--visualize-points", type=int, default=2000,
                   help="points subsampled into the t-SNE (the reference "
                        "uses 10000; exact t-SNE on this 1-core host is "
                        "quadratic, so default smaller)")
    p.add_argument("--answer-vocab", default=None,
                   help="answer_vocab.json from the sqa3d train run")
    return p.parse_args(argv)


def tsne_scene_render(feat: "np.ndarray", pc: "np.ndarray", out_path: str,
                      n_points: int, logger) -> None:
    """t-SNE embedding visualization of the scene features
    (``3DLLM_BLIP2-base/inference.py:80-104``): subsample points, embed the
    1408-d features to 3-d with t-SNE, normalize to [0, 1] RGB, and render
    the colored point cloud (top-down software splat instead of the
    reference's matplotlib 3-d scatter — same artifact class, a PNG)."""
    import os

    from sklearn.manifold import TSNE

    from situation3d_tpu.eval.visualization import render_topdown, write_png

    feat = np.asarray(feat, np.float32).reshape(-1, feat.shape[-1])
    pc = np.asarray(pc, np.float32).reshape(-1, 3)
    rng = np.random.RandomState(0)
    idx = rng.choice(feat.shape[0], min(n_points, feat.shape[0]),
                     replace=False)
    emb = TSNE(n_components=3, random_state=0, learning_rate=200.0,
               init="random").fit_transform(feat[idx])
    emb = (emb - emb.min()) / (emb.max() - emb.min() + 1e-6)
    img = render_topdown(pc[idx], (emb * 255).astype(np.uint8), splat=2)
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    write_png(out_path, img)
    logger.info("t-SNE scene render written to %s", out_path)


def main(argv=None) -> None:
    import jax
    import jax.numpy as jnp

    args = parse_args(argv)
    logger = setup_logger()
    cfg = load_config(args.config, args.options)

    if args.task == "3d_vqa":
        from situation3d_tpu.cli.eval import restore_blip2_params
        from situation3d_tpu.data.threedvqa import (ThreeDVQADataset,
                                                    clean_question)
        from situation3d_tpu.models.blip2_t5 import Blip2T5, predict_answers
        import torch

        feat = np.asarray(
            torch.load(args.pc_feat, map_location="cpu", weights_only=False),
            np.float32)
        pc = np.load(args.pc)
        ds = ThreeDVQADataset(
            cfg.blip2,
            [{"scene_id": "scene", "question": args.question,
              "question_id": "scene-q0", "answers": []}],
            features={"scene": (feat, pc)})
        model = Blip2T5(cfg.blip2)
        sample = ds.sample(0)
        batch = {k: jnp.asarray(v)[None] for k, v in sample.items()
                 if k != "question_id"}
        variables = model.init(jax.random.PRNGKey(0),
                               {**batch,
                                "labels": jnp.zeros((1, 4), jnp.int32),
                                "label_mask": jnp.ones((1, 4), jnp.int32)})
        params = restore_blip2_params(cfg, model, variables["params"],
                                      args, logger)
        tokens = predict_answers(model, {"params": params}, batch,
                                 max_len=cfg.blip2.t5.max_answer_len)
        print("Q:", clean_question(args.question))
        print("A:", ds.text.decode(np.asarray(tokens)[0]))
        if args.visualize:
            tsne_scene_render(feat, pc, args.visualize_out,
                              args.visualize_points, logger)
    else:
        from situation3d_tpu.data.sqa3d import SQA3DDataset, load_scene
        from situation3d_tpu.data.vocab import AnswerVocab
        from situation3d_tpu.models.sig3d import SIG3D
        from situation3d_tpu.train.trainer import Trainer

        assert args.checkpoint, "sqa3d inference needs --checkpoint"
        assert args.answer_vocab, "sqa3d inference needs --answer-vocab"
        with open(args.answer_vocab) as fh:
            vocab = AnswerVocab(json.load(fh))
        scene = load_scene(args.scene_dir or cfg.data.scene_dir, None,
                           args.scene)
        # identity pose record: position/rotation come from --situation text
        # only in the reference too (the pose is a dataset field; for ad-hoc
        # inference we use the scene origin with identity heading)
        rec = {"scene_id": args.scene, "situation": args.situation,
               "question": args.question, "question_id": 0,
               "position": [0, 0, 0, 0, 0, 0, 1], "answers": []}
        ds = SQA3DDataset(cfg, "val", vocab, records=[rec],
                          scenes={args.scene: scene})
        sample = ds[0]
        batch = {k: np.asarray(v)[None] for k, v in sample.items()
                 if k not in ("question_id", "answer_cat", "answer_cats")}
        model = SIG3D(cfg, num_answers=len(vocab),
                      dtype=jnp.bfloat16 if cfg.train.bf16 else jnp.float32)
        import dataclasses
        cfg_ckpt = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train,
                                           ckpt_dir=args.checkpoint))
        trainer = Trainer(cfg_ckpt, model, steps_per_epoch=1,
                          example_batch=batch)
        restored = trainer.ckpt.restore(trainer.state)
        assert restored is not None, f"no checkpoint in {args.checkpoint}"
        trainer.state = restored
        logger.info("restored checkpoint step %d", int(restored.step))
        metrics, keep = trainer.eval_step(
            trainer.state, batch, jax.random.PRNGKey(0))
        pred = int(np.asarray(keep["answer_scores"]).argmax(-1)[0])
        print("Q:", args.question)
        print("A:", vocab.itos(pred))


if __name__ == "__main__":
    main()
