"""Test harness: run everything on a virtual 8-device CPU mesh.

This is the TPU-native analogue of "test multi-node without a cluster" —
the reference validates multi-GPU only via real SLURM jobs
(3DLLM_BLIP2-base/scripts/*.slurm); we instead simulate 8 devices on CPU so
sharding/collective code paths are exercised in CI.

The environment ships a sitecustomize that registers the remote `axon` TPU
PJRT plugin in every interpreter (PALLAS_AXON_POOL_IPS / JAX_PLATFORMS=axon).
That plugin claims the single real chip through a loopback relay and can
block for minutes when contended — tests must never touch it. sitecustomize
already imported jax and registered the factory, but no backend is
initialized yet at conftest time, so we deregister the factory and force the
CPU platform before the first jax operation.
"""
import os
import sys

_WANT_XLA = "--xla_force_host_platform_device_count=8"
if _WANT_XLA not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") + " " + _WANT_XLA).strip()

import jax
from jax._src import xla_bridge

if not xla_bridge._backends:  # no backend initialized yet: safe to scrub
    xla_bridge._backend_factories.pop("axon", None)
jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", "tests must run on the CPU backend"
assert jax.device_count() == 8, "tests expect 8 virtual CPU devices"

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(0)
