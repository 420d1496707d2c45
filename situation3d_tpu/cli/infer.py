"""Single-scene inference entry point.

Replaces ``3DLLM_BLIP2-base/inference.py``: load a scene's precomputed
features (``pc_feat`` [N, 1408] .pt + ``pc`` [N, 3] .npy), ask free-form
questions, print generated answers; and a SIG3D mode: scene ``.pth`` +
situation/question -> classified answer.
"""
from __future__ import annotations

import argparse

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
    p.add_argument("--scene", help="scene .pth for sqa3d mode")
    p.add_argument("--situation", default="I am standing in the room.")
    p.add_argument("--question", required=False,
                   default="What is in front of me?")
    p.add_argument("--checkpoint", default=None)
    return p.parse_args(argv)


def main(argv=None) -> None:
    import jax
    import jax.numpy as jnp

    args = parse_args(argv)
    logger = setup_logger()
    cfg = load_config(args.config, args.options)

    if args.task == "3d_vqa":
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
        # TODO(ckpt): load converted reference weights when --checkpoint given
        tokens = predict_answers(model, variables, batch,
                                 max_len=cfg.blip2.t5.max_answer_len)
        print("Q:", clean_question(args.question))
        print("A:", ds.text.decode(np.asarray(tokens)[0]))
    else:
        from situation3d_tpu.data.sqa3d import SQA3DDataset, load_scene
        from situation3d_tpu.data.vocab import AnswerVocab
        from situation3d_tpu.models.sig3d import SIG3D

        scene = load_scene(".", None, args.scene) if args.scene else None
        logger.info("sqa3d single-scene inference requires a trained "
                    "checkpoint; wire --checkpoint to trainer.ckpt.restore")


if __name__ == "__main__":
    main()
