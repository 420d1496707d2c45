"""Collective correctness on the 8-device CPU mesh: pjit data parallelism
must equal single-device large-batch math (the property DDP provides in the
reference)."""
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map

from situation3d_tpu.config import MeshConfig
from situation3d_tpu.parallel.collectives import (all_gather, pmean, psum,
                                                  ppermute_ring)
from situation3d_tpu.parallel.mesh import batch_sharding, make_mesh, shard_batch


def test_mesh_construction():
    mesh = make_mesh(MeshConfig(data_parallel=8, model_parallel=1))
    assert mesh.devices.shape == (8, 1)
    mesh2 = make_mesh(MeshConfig(data_parallel=4, model_parallel=2))
    assert mesh2.devices.shape == (4, 2)


def test_shard_map_collectives(rng):
    mesh = make_mesh(MeshConfig(data_parallel=8, model_parallel=1))
    x = jnp.asarray(rng.randn(8, 4).astype(np.float32))

    f = shard_map(lambda v: pmean(v, "data"), mesh=mesh,
                  in_specs=P("data"), out_specs=P("data"))
    out = np.asarray(f(x))
    np.testing.assert_allclose(out, np.tile(x.mean(0), (8, 1)), rtol=1e-6)

    g = shard_map(lambda v: psum(v, "data"), mesh=mesh,
                  in_specs=P("data"), out_specs=P("data"))
    np.testing.assert_allclose(np.asarray(g(x)),
                               np.tile(np.asarray(x).sum(0), (8, 1)), rtol=1e-6)

    # gathered result is replicated; keep the leading axis sharded in the
    # out_specs so shard_map's replication checker is satisfied
    h = shard_map(lambda v: all_gather(v, "data", tiled=True)[None], mesh=mesh,
                  in_specs=P("data"), out_specs=P("data", None, None))
    out = np.asarray(h(x))  # [8 shards, 8, 4], every shard the full batch
    for s in range(8):
        np.testing.assert_allclose(out[s], np.asarray(x), rtol=1e-6)

    r = shard_map(lambda v: ppermute_ring(v, "data", 1), mesh=mesh,
                  in_specs=P("data"), out_specs=P("data"))
    np.testing.assert_allclose(np.asarray(r(x)), np.roll(np.asarray(x), 1, 0),
                               rtol=1e-6)


def test_data_parallel_equals_single_device_grads(rng):
    """pjit DP gradient == full-batch gradient (DDP equivalence)."""
    mesh = make_mesh(MeshConfig(data_parallel=8, model_parallel=1))
    w = jnp.asarray(rng.randn(4, 3).astype(np.float32))
    x = jnp.asarray(rng.randn(16, 4).astype(np.float32))
    y = jnp.asarray(rng.randn(16, 3).astype(np.float32))

    def loss(w, x, y):
        return jnp.mean((x @ w - y) ** 2)

    g_single = jax.grad(loss)(w, x, y)

    with mesh:
        xs = jax.device_put(x, batch_sharding(mesh))
        ys = jax.device_put(y, batch_sharding(mesh))
        wr = jax.device_put(w, NamedSharding(mesh, P()))
        g_dp = jax.jit(jax.grad(loss))(wr, xs, ys)
    np.testing.assert_allclose(np.asarray(g_dp), np.asarray(g_single),
                               rtol=1e-5, atol=1e-6)
