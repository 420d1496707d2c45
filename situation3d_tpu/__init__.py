"""situation3d_tpu — TPU-native (JAX/XLA/Pallas/pjit) framework for situated
3D vision-language reasoning.

A from-scratch rebuild of the capabilities of YunzeMan/Situation3D (SIG3D,
CVPR 2024): a situated 3D-QA model (sparse-voxel scene encoder + language
encoder + cross-attention fusion + situation-grounding heads + answer
classifier) and a 3D-LLM BLIP-2 backbone (Q-Former + FlanT5 generative QA),
redesigned TPU-first:

- compute path: JAX/XLA with Pallas kernels for the hot ops (FPS, ball query,
  sparse gather-scatter convolution, blockwise cross-attention);
- fixed static shapes everywhere (padded capacities + masks) so everything
  jits once;
- scaling via ``jax.sharding.Mesh`` + ``shard_map``/pjit named-axis
  collectives instead of NCCL process groups;
- host-side runtime (voxelizer, kernel-map builder, data loader) in C++
  with a NumPy fallback.

Reference layout (see SURVEY.md): ``situation3d/`` + ``lib/`` (SIG3D stack)
and ``3DLLM_BLIP2-base/`` (LAVIS BLIP-2 stack) in /root/reference.
"""

__version__ = "0.1.0"

from situation3d_tpu.config import Config, load_config  # noqa: F401
from situation3d_tpu.utils.registry import registry  # noqa: F401
