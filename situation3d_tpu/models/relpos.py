"""Relative-position bucketing shared by MPNet and T5.

Both the reference's language encoder (HF ``sentence-transformers/all-mpnet-
base-v2`` loaded at ``situation3d/models/sep_lang_module_bert.py:27``) and the
vendored T5 (``3DLLM_BLIP2-base/lavis/models/blip2_models/modeling_t5.py``)
use the T5-style log-bucketed relative position bias; this is the single
JAX implementation.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def relative_position_bucket(
    relative_position: jnp.ndarray,
    bidirectional: bool = True,
    num_buckets: int = 32,
    max_distance: int = 128,
) -> jnp.ndarray:
    """T5 relative position -> bucket id (int32)."""
    rp = relative_position
    ret = jnp.zeros_like(rp)
    if bidirectional:
        num_buckets //= 2
        ret = ret + (rp > 0).astype(jnp.int32) * num_buckets
        n = jnp.abs(rp)
    else:
        n = jnp.maximum(-rp, 0)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_if_large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact + 1e-6)
        / np.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_if_large = jnp.minimum(val_if_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_if_large)


def relative_position_matrix(q_len: int, k_len: int) -> jnp.ndarray:
    """[q_len, k_len] memory_position - query_position."""
    ctx = jnp.arange(q_len)[:, None]
    mem = jnp.arange(k_len)[None, :]
    return mem - ctx
