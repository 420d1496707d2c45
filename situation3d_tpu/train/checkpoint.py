"""Checkpoint save/restore via orbax.

Replaces the reference's torch.save checkpointing: SIG3D's
``checkpoint.tar``/``model_last.pth``/best ``model.pth``
(``lib/solver.py:285-287, 457-494, 653-660``) and LAVIS's per-epoch
trainable-only checkpoints with resume of model/optimizer/scaler/epoch
(``runner_base.py:530-596``). Orbax gives async atomic saves and a
keep-last-N policy; "resume" restores the full TrainState pytree.
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, keep: int = 3,
                 best_metric: Optional[str] = None, best_mode: str = "max"):
        """``best_metric`` enables metric-stamped checkpoints: orbax persists
        per-step metrics (and prefers keeping the best) only when a best_fn
        is configured."""
        self._dir = os.path.abspath(directory)
        os.makedirs(self._dir, exist_ok=True)
        kwargs = {}
        if best_metric is not None:
            kwargs = dict(best_fn=lambda m: float(m[best_metric]),
                          best_mode=best_mode,
                          keep_checkpoints_without_metrics=True)
        self._best_metric = best_metric
        self._mgr = ocp.CheckpointManager(
            self._dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=keep, create=True,
                enable_async_checkpointing=True, **kwargs),
        )

    def save(self, step: int, state: Any, metrics: Optional[dict] = None) -> None:
        # metrics=None (not {}) when absent: with a best_fn configured, an
        # empty dict would be fed to best_fn and KeyError
        self._mgr.save(step, args=ocp.args.StandardSave(state),
                       metrics=metrics or None)

    def restore(self, state_template: Any, step: Optional[int] = None) -> Any:
        step = self.latest_step() if step is None else step
        if step is None:
            return None
        return self._mgr.restore(step, args=ocp.args.StandardRestore(state_template))

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.close()

    def best_step(self, metric: Optional[str] = None) -> Optional[int]:
        """Step of the retained checkpoint with the best metric
        (the _reload_best_model pattern, runner_base.py:556-574). Requires
        the manager to be constructed with ``best_metric``."""
        metric = metric or self._best_metric
        best, best_val = None, None
        for step in self._mgr.all_steps():
            m = self._mgr.metrics(step)
            if not m or metric not in m:
                continue
            v = float(m[metric])
            if best_val is None or v > best_val:
                best, best_val = step, v
        return best


def save_trainable_npz(path: str, params: Any, trainable: Any) -> int:
    """Write only the trainable parameter leaves to an .npz, keyed by
    '/'-joined tree path — the analogue of LAVIS's trainable-only
    checkpoint (``runner_base.py:530-554``: ``state_dict`` filtered by
    ``requires_grad``). Returns the number of leaves saved."""
    flat: Dict[str, np.ndarray] = {}

    def visit(p, leaf, keep):
        if keep:
            key = "/".join(k.key if hasattr(k, "key") else str(k) for k in p)
            flat[key] = np.asarray(leaf)

    jax.tree_util.tree_map_with_path(
        lambda p, leaf, keep: visit(p, leaf, keep), params, trainable)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path, **flat)
    return len(flat)


def load_trainable_npz(path: str, params: Any) -> Any:
    """Merge a trainable-only .npz back over a full params tree (frozen
    weights keep their values, e.g. HF-initialized T5)."""
    with np.load(path) as data:
        flat = {k: data[k] for k in data.files}

    def merge(p, leaf):
        key = "/".join(k.key if hasattr(k, "key") else str(k) for k in p)
        if key in flat:
            new = flat.pop(key)
            assert new.shape == leaf.shape, (key, new.shape, leaf.shape)
            return jax.numpy.asarray(new, leaf.dtype)
        return leaf

    out = jax.tree_util.tree_map_with_path(merge, params)
    assert not flat, f"unmatched checkpoint keys: {sorted(flat)[:5]}"
    return out
