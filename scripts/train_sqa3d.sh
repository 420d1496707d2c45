#!/usr/bin/env bash
# SIG3D SQA3D training (reference: scripts/train.sh)
set -euo pipefail
python -m situation3d_tpu.cli.train --task sqa3d \
  --config configs/sqa3d.yaml \
  --output outputs/sqa3d "$@"
