"""Prefetch pipeline tests (reference: lavis dataloader_utils PrefetchLoader
+ DataLoader workers)."""
import numpy as np
import pytest

from situation3d_tpu.data.prefetch import (ThreadPrefetcher,
                                           attach_host_plans,
                                           make_train_pipeline)


def test_thread_prefetcher_order_and_error():
    items = list(range(10))
    assert list(ThreadPrefetcher(iter(items))) == items

    def boom():
        yield 1
        raise ValueError("boom")

    it = iter(ThreadPrefetcher(boom()))
    assert next(it) == 1
    with pytest.raises(ValueError):
        list(it)


def test_attach_host_plans(rng):
    from situation3d_tpu.ops import native
    native.ensure_built()
    caps = (128, 64, 32, 16, 8)
    coords = np.zeros((2, 128, 3), np.int32)
    mask = np.zeros((2, 128), bool)
    for b in range(2):
        c = np.unique(rng.randint(0, 12, (90, 3)), axis=0)[:60]
        coords[b, : len(c)], mask[b, : len(c)] = c, True
    batches = [{"voxel_coords": coords, "voxel_mask": mask, "x": np.zeros(2)}]
    [out] = list(attach_host_plans(iter(batches), caps))
    assert "plan" in out
    assert out["plan"]["levels"][0]["map_k3"].shape == (2, 128, 27)
    assert out["plan"]["levels"][1]["map_down"].shape == (2, 64, 8)


def test_make_train_pipeline(rng):
    from situation3d_tpu.config import Config, apply_overrides
    from situation3d_tpu.data.synthetic import make_synthetic_dataset

    cfg = apply_overrides(Config(), [
        "data.voxel_capacity=512", "sparse.capacities=512,256,128,64,32",
        "data.max_text_len=16",
    ])
    ds = make_synthetic_dataset(cfg, n_scenes=1, per_scene=4, n_points=2000)
    batches = list(make_train_pipeline(ds, 2, cfg.sparse.capacities, epochs=1))
    assert len(batches) == 2
    assert "plan" in batches[0]
    assert batches[0]["voxel_coords"].shape == (2, 512, 3)


def test_multi_iter_loader_ratios():
    from situation3d_tpu.data.prefetch import MultiIterLoader, repeat_iterator

    a = repeat_iterator(lambda: iter(["a"]))
    b = repeat_iterator(lambda: iter(["b"]))
    loader = MultiIterLoader([a, b], ratios=[3, 1], seed=0)
    draws = [next(loader) for _ in range(400)]
    frac_a = draws.count("a") / len(draws)
    assert 0.65 < frac_a < 0.85  # ~0.75


def test_contrastive_losses(rng):
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P
    from jax import shard_map
    from situation3d_tpu.config import MeshConfig
    from situation3d_tpu.parallel.mesh import make_mesh
    from situation3d_tpu.train.contrastive import itc_loss, itm_loss, lm_loss

    # aligned pairs get lower loss than shuffled pairs
    feats = rng.randn(8, 16).astype(np.float32)
    img = jnp.asarray(feats)
    txt = jnp.asarray(feats + rng.randn(8, 16).astype(np.float32) * 0.05)
    t = jnp.asarray(0.07)
    good = float(itc_loss(img, txt, t))
    bad = float(itc_loss(img, jnp.asarray(np.roll(feats, 3, 0)), t))
    assert good < bad

    # cross-device negatives: global loss over the mesh == single-device
    mesh = make_mesh(MeshConfig(data_parallel=8, model_parallel=1))
    f = shard_map(
        lambda i, x: jax.lax.pmean(itc_loss(i, x, t, axis="data"), "data"),
        mesh=mesh, in_specs=(P("data"), P("data")), out_specs=P(),
        check_vma=False)
    dist = float(jax.jit(f)(img[:, None, :], txt))
    single = float(itc_loss(img[:, None, :], txt, t))
    np.testing.assert_allclose(dist, single, rtol=1e-3, atol=1e-7)

    logits = jnp.asarray(rng.randn(4, 2).astype(np.float32))
    assert float(itm_loss(logits, jnp.asarray([0, 1, 0, 1]))) > 0
    lm = lm_loss(jnp.asarray(rng.randn(2, 5, 11).astype(np.float32)),
                 jnp.asarray(rng.randint(0, 11, (2, 5))),
                 jnp.ones((2, 5)))
    assert float(lm) > 0
