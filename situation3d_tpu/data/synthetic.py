"""Synthetic SQA3D-compatible data.

Generates random room-like scenes and QA records with the exact schema of
the real pipeline (data/sqa3d.py), so tests, benchmarks and the multichip
dry-run exercise the full stack hermetically (the reference repo ships no
data either — assets/data/sqa_task holds only a .gitkeep).
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np
from scipy.spatial.transform import Rotation as R

from situation3d_tpu.config import Config
from situation3d_tpu.data.sqa3d import SceneData, SQA3DDataset
from situation3d_tpu.data.vocab import AnswerVocab

_QUESTIONS = [
    "what is on the table", "is the chair red", "how many windows are there",
    "can i reach the door", "which side is the bed", "if i turn left what do i see",
    "where is the lamp", "am i facing the window", "describe the room",
]
_SITUATIONS = [
    "i am standing next to the table facing the door",
    "sitting on the sofa with the window on my left",
    "leaning on the counter looking at the shelf",
]
_ANSWERS = ["table", "chair", "red", "two", "yes", "no", "left", "right",
            "window", "door", "lamp", "bed"]


def synthetic_scene(rng: np.ndarray, n_points: int = 30000,
                    extent=(6.0, 5.0, 2.8)) -> SceneData:
    pts = rng.rand(n_points, 3) * np.asarray(extent)
    # bias to walls/floor so density resembles a scanned room
    wall = rng.rand(n_points) < 0.4
    pts[wall, 2] = np.abs(rng.randn(wall.sum()) * 0.05)
    colors = rng.rand(n_points, 3) * 255.0
    labels = rng.randint(0, 20, n_points).astype(np.uint8)
    return SceneData(points=pts.astype(np.float64), colors=colors,
                     labels=labels, bs_center=pts.mean(0),
                     axis_align=np.eye(4))


def synthetic_records(rng, scene_ids: List[str], per_scene: int,
                      extent=(6.0, 5.0, 2.8)) -> List[dict]:
    records = []
    for sid in scene_ids:
        for k in range(per_scene):
            yaw = rng.rand() * 2 * np.pi
            quat = R.from_rotvec([0, 0, yaw]).as_quat()
            pos = list(rng.rand(3) * np.asarray(extent) * 0.5) + list(quat)
            records.append({
                "scene_id": sid,
                "position": pos,
                "question_id": f"synthetic-{sid}-{k}",
                "situation": _SITUATIONS[k % len(_SITUATIONS)],
                "question": _QUESTIONS[k % len(_QUESTIONS)],
                "answers": [str(np.asarray(_ANSWERS)[rng.randint(len(_ANSWERS))])],
            })
    return records


def make_synthetic_dataset(cfg: Config, n_scenes: int = 2, per_scene: int = 4,
                           split: str = "train", n_points: int = 30000,
                           seed: int = 0,
                           include_labels: bool = False) -> SQA3DDataset:
    rng = np.random.RandomState(seed)
    scene_ids = [f"scene{i:04d}_00" for i in range(n_scenes)]
    scenes = {sid: synthetic_scene(rng, n_points) for sid in scene_ids}
    records = synthetic_records(rng, scene_ids, per_scene)
    vocab = AnswerVocab(_ANSWERS)
    counter = {a: 5 for a in _ANSWERS}
    return SQA3DDataset(cfg, split, vocab, counter, records=records,
                        scenes=scenes, include_labels=include_labels)
