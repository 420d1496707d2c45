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
