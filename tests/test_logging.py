"""SmoothedValue / MetricLogger window smoothing (lavis logger.py:19-175)."""
import logging

from situation3d_tpu.train.logging import MetricLogger, SmoothedValue


def test_smoothed_value_window():
    v = SmoothedValue(window_size=4)
    for x in range(10):
        v.update(float(x))
    assert v.value == 9.0
    assert v.max == 9.0
    assert v.avg == (6 + 7 + 8 + 9) / 4          # window only
    assert v.median == 8.0                        # upper median of 6,7,8,9
    assert v.global_avg == sum(range(10)) / 10    # all values
    assert "8.0" in str(v)


def test_smoothed_value_weighted_counts():
    v = SmoothedValue(window_size=8)
    v.update(2.0, n=3)
    v.update(4.0, n=1)
    assert v.count == 4
    assert v.global_avg == (2.0 * 3 + 4.0) / 4
    v.synchronize_between_processes()  # single-process: no-op
    assert v.count == 4


def test_metric_logger_log_every(caplog):
    ml = MetricLogger(window_size=4)
    seen = []
    with caplog.at_level(logging.INFO, "situation3d_tpu.metrics"):
        for x in ml.log_every(range(7), print_freq=3, header="Train:"):
            ml.update(loss=float(x))
            seen.append(x)
    assert seen == list(range(7))
    assert ml.meters["loss"].value == 6.0
    assert ml.loss.value == 6.0                   # attr access
    assert any("Train:" in r.message or "Train:" in str(r.args)
               for r in caplog.records)
    stats = ml.global_avg()
    assert abs(stats["loss"] - 3.0) < 1e-9


def test_finite_guard():
    """NaN guard (train.nan_guard): non-finite grads zero out, flag drops."""
    import jax.numpy as jnp
    import numpy as np

    from situation3d_tpu.train.trainer import finite_guard

    good = {"a": jnp.ones((2, 2)), "b": jnp.arange(3.0)}
    g, finite = finite_guard(good)  # default mode="full" checks leaves
    assert bool(finite)
    np.testing.assert_allclose(np.asarray(g["a"]), 1.0)

    bad = {"a": jnp.ones((2, 2)).at[0, 0].set(jnp.nan), "b": jnp.arange(3.0)}
    g, finite = finite_guard(bad)
    assert not bool(finite)
    np.testing.assert_allclose(np.asarray(g["a"]), 0.0)  # whole step skipped
    np.testing.assert_allclose(np.asarray(g["b"]), 0.0)


def test_finite_guard_trainable_mask():
    """Frozen leaves pass through untouched (and unread — DCE-preserving)."""
    import jax.numpy as jnp
    import numpy as np

    from situation3d_tpu.train.trainer import finite_guard

    grads = {"frozen": jnp.full((2,), jnp.nan), "head": jnp.ones((2,))}
    mask = {"frozen": False, "head": True}
    g, finite = finite_guard(grads, mask, mode="full")
    assert bool(finite)  # NaN in the frozen leaf doesn't trip the guard
    np.testing.assert_allclose(np.asarray(g["head"]), 1.0)
    assert np.isnan(np.asarray(g["frozen"])).all()  # untouched

    grads = {"frozen": jnp.ones((2,)), "head": jnp.full((2,), jnp.inf)}
    g, finite = finite_guard(grads, mask, mode="full")
    assert not bool(finite)
    np.testing.assert_allclose(np.asarray(g["head"]), 0.0)
    np.testing.assert_allclose(np.asarray(g["frozen"]), 1.0)


def test_finite_guard_loss_mode():
    """mode='loss' (the free default in training): triggers on the loss
    scalar, not per-leaf reductions."""
    import jax.numpy as jnp
    import numpy as np

    from situation3d_tpu.train.trainer import finite_guard

    grads = {"w": jnp.ones((3,))}
    g, finite = finite_guard(grads, loss=jnp.float32(1.5), mode="loss")
    assert bool(finite)
    g, finite = finite_guard(grads, loss=jnp.float32(np.nan), mode="loss")
    assert not bool(finite)
    np.testing.assert_allclose(np.asarray(g["w"]), 0.0)
    # loss mode does NOT inspect grad leaves (that is mode="full")
    grads = {"w": jnp.full((3,), jnp.nan)}
    _, finite = finite_guard(grads, loss=jnp.float32(0.0), mode="loss")
    assert bool(finite)
