"""Host-side UNet plan builder (NumPy / C++).

Produces the same plan pytree as :func:`sparse.minkunet.build_unet_plan`
but on the host, inside the data pipeline — the input-pipeline analogue of
MinkowskiEngine building its kernel maps on CPU. Training/serving can
prefetch plans overlapped with device compute instead of spending ~0.5 s
per sample of on-device sort/searchsorted work; the device path remains for
fully self-contained jit programs (__graft_entry__, dryrun).
"""
from __future__ import annotations

from typing import Any, Dict, Sequence

import numpy as np

from situation3d_tpu.ops import native
from situation3d_tpu.sparse.kernel_map import kernel_offsets
from situation3d_tpu.sparse.minkunet import STRIDES


def build_host_plan_sample(
    coords: np.ndarray,
    num_valid: int,
    capacities: Sequence[int],
) -> Dict[str, Any]:
    """Plan for ONE sample. coords [V0, 3] padded; first num_valid rows real.

    Returns the same nested structure as build_unet_plan but with numpy
    arrays and no batch axis (stack across samples to feed the model).
    """
    k2 = kernel_offsets(2)
    k3 = kernel_offsets(3)
    k5 = kernel_offsets(5)
    native.ensure_built()

    levels = []
    dropped = 0
    cur = np.ascontiguousarray(coords[:num_valid], np.int32)
    for i, stride in enumerate(STRIDES):
        cap = capacities[i]
        if i > 0:
            cur = native.downsample(levels[i - 1]["_real"], STRIDES[i])
            dropped += max(0, len(cur) - cap)
            cur = cur[:cap]
        padded = np.zeros((cap, 3), np.int32)
        n = min(len(cur), cap)
        padded[:n] = cur[:n]
        mask = np.zeros(cap, bool)
        mask[:n] = True
        levels.append({"coords": padded, "mask": mask, "_real": cur[:n]})

    def pad_map(m: np.ndarray, n_in_real: int, cap_in: int, cap_out: int,
                k: int) -> np.ndarray:
        # remap miss sentinel from n_in_real to cap_in; pad rows to cap_out
        out = np.full((cap_out, k), cap_in, np.int32)
        m = np.where(m == n_in_real, cap_in, m)
        out[: len(m)] = m
        return out

    for i, lvl in enumerate(levels):
        s = STRIDES[i]
        cap = capacities[i]
        real = lvl["_real"]
        lvl["map_k3"] = pad_map(
            native.kernel_map(real, s, real, k3, s), len(real), cap, cap, 27)
        if i == 0:
            lvl["map_k5"] = pad_map(
                native.kernel_map(real, s, real, k5, s), len(real), cap, cap, 125)
        if i > 0:
            fine = levels[i - 1]
            sf = STRIDES[i - 1]
            capf = capacities[i - 1]
            lvl["map_down"] = pad_map(
                native.kernel_map(fine["_real"], sf, real, k2, sf),
                len(fine["_real"]), capf, cap, 8)
            fine["map_up"] = pad_map(
                native.kernel_map(real, s, fine["_real"], -k2, sf),
                len(real), cap, capf, 8)
    for lvl in levels:
        del lvl["_real"]
    return {"levels": levels,
            "overflow": {"voxels_dropped": np.int32(dropped),
                         "extent_misses": np.int32(0)}}


def stack_plans(plans) -> Dict[str, Any]:
    """Stack per-sample plans into the batched plan pytree."""
    out = {"levels": []}
    for i in range(len(plans[0]["levels"])):
        lvl = {}
        for key in plans[0]["levels"][i]:
            lvl[key] = np.stack([p["levels"][i][key] for p in plans])
        out["levels"].append(lvl)
    if "overflow" in plans[0]:
        out["overflow"] = {
            k: np.stack([p["overflow"][k] for p in plans])
            for k in plans[0]["overflow"]}
    return out


def build_host_plan(coords: np.ndarray, mask: np.ndarray,
                    capacities: Sequence[int],
                    max_workers: int = 8) -> Dict[str, Any]:
    """Batched host plan for coords [B, V, 3] + mask [B, V].

    Samples build in a thread pool — the ctypes calls into the C++ builder
    release the GIL, and the probe loops are OpenMP-parallel besides."""
    from concurrent.futures import ThreadPoolExecutor
    with ThreadPoolExecutor(max_workers=min(max_workers, len(coords))) as ex:
        plans = list(ex.map(
            lambda b: build_host_plan_sample(
                coords[b], int(mask[b].sum()), capacities),
            range(len(coords))))
    return stack_plans(plans)
