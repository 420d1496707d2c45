#!/usr/bin/env bash
# 3D-LLM BLIP-2 SQA3D finetune (reference: scripts/slurm_3dllm_run.slurm).
# Multi-host: run one process per host with jax.distributed env vars set;
# no torch.distributed.run / SLURM rendezvous needed.
set -euo pipefail
python -m situation3d_tpu.cli.train --task 3d_vqa \
  --config configs/finetune_sqa_blip2.yaml \
  --output outputs/blip2_sqa "$@"
