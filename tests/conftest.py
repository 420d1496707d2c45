"""Test harness: run everything on a virtual 8-device CPU mesh.

This is the TPU-native analogue of "test multi-node without a cluster" —
the reference validates multi-GPU only via real SLURM jobs
(3DLLM_BLIP2-base/scripts/*.slurm); we instead simulate 8 devices on CPU so
sharding/collective code paths are exercised in CI.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(0)
