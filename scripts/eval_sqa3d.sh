#!/usr/bin/env bash
set -euo pipefail
python -m situation3d_tpu.cli.eval --task sqa3d \
  --config configs/sqa3d.yaml --checkpoint outputs/sqa3d/ckpt \
  --output outputs/sqa3d/eval "$@"
