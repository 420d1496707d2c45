"""Parameter sharding rules (tensor parallelism).

SURVEY §2.4: the reference has no TP; here FlanT5-XL's big matrices can
shard over the mesh ``model`` axis so training fits/scales beyond one chip
(v5e = 16 GB). Megatron-style layout — no model-code changes, just
NamedShardings handed to pjit, which inserts the ICI collectives:

- attention q/k/v kernels ``[d_model, heads*d_kv]``: shard the head (output)
  dim; ``o`` ``[heads*d_kv, d_model]``: shard the input dim (row-parallel,
  psum after);
- FF ``wi_0``/``wi_1`` ``[d_model, d_ff]``: shard d_ff; ``wo`` ``[d_ff,
  d_model]``: shard the input dim;
- embeddings / lm_head: shard the vocab dim;
- everything else (norms, biases) replicated.
"""
from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


_COL_PARALLEL = ("q", "k", "v", "wi_0", "wi_1", "wi")   # shard output dim
_ROW_PARALLEL = ("o", "wo")                              # shard input dim
_VOCAB = ("shared", "lm_head")


def t5_param_spec(path) -> P:
    keys = [p.key if hasattr(p, "key") else str(p) for p in path]
    parent = keys[-2] if len(keys) >= 2 else ""
    leaf = keys[-1]
    if parent in _COL_PARALLEL and leaf == "kernel":
        return P(None, "model")
    if parent in _ROW_PARALLEL and leaf == "kernel":
        return P("model", None)
    if parent in _VOCAB and leaf in ("embedding", "kernel"):
        # shard the vocab dimension (first for embeddings, last for lm_head)
        return P("model", None) if leaf == "embedding" else P(None, "model")
    return P()


def t5_param_shardings(params: Any, mesh: Mesh) -> Any:
    """NamedSharding pytree for a T5 (or Blip2T5-containing) params tree.
    Non-T5 subtrees get replicated specs."""
    def to_sharding(path, leaf):
        spec = t5_param_spec(path)
        # dims must divide the mesh axis; fall back to replication otherwise
        axis = mesh.shape.get("model", 1)
        for d, name in enumerate(spec):
            if name == "model" and leaf.shape[d] % axis != 0:
                return NamedSharding(mesh, P())
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(to_sharding, params)


def shard_params(params: Any, mesh: Mesh) -> Any:
    """Device-put a params pytree with the TP rules applied."""
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s), params,
        t5_param_shardings(params, mesh))
