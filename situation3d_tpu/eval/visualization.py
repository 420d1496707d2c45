"""Scene / situation visualization export (pure NumPy, no open3d).

Re-implements the exportable parts of ``situation3d/utils/visualization.py``
(``create_arrow:37``, ``visualize_scene_test:244``) and ``pc_utils.py``'s
PLY/OBJ writers: GT/pred situation arrows as triangle meshes, activation- or
attention-colored point clouds, written as standard PLY/OBJ files (the
reference's open3d OffscreenRenderer/wandb-image step is replaced by file
export, which any viewer renders).
"""
from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import numpy as np


def write_ply_points(path: str, points: np.ndarray,
                     colors: Optional[np.ndarray] = None) -> None:
    """ASCII PLY point cloud; colors uint8 [N,3] optional (pc_utils.write_ply)."""
    n = len(points)
    with open(path, "w") as fh:
        fh.write("ply\nformat ascii 1.0\n")
        fh.write(f"element vertex {n}\n")
        fh.write("property float x\nproperty float y\nproperty float z\n")
        if colors is not None:
            fh.write("property uchar red\nproperty uchar green\nproperty uchar blue\n")
        fh.write("end_header\n")
        for i in range(n):
            row = f"{points[i,0]:.6f} {points[i,1]:.6f} {points[i,2]:.6f}"
            if colors is not None:
                row += f" {int(colors[i,0])} {int(colors[i,1])} {int(colors[i,2])}"
            fh.write(row + "\n")


def write_obj_mesh(path: str, vertices: np.ndarray, faces: np.ndarray) -> None:
    """Wavefront OBJ triangle mesh (1-indexed faces)."""
    with open(path, "w") as fh:
        for v in vertices:
            fh.write(f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
        for f in faces:
            fh.write(f"f {f[0]+1} {f[1]+1} {f[2]+1}\n")


def create_arrow(start: Sequence[float], direction: Sequence[float],
                 length: float = 0.5, shaft_radius: float = 0.02,
                 head_radius: float = 0.05, head_frac: float = 0.3,
                 segments: int = 12) -> Tuple[np.ndarray, np.ndarray]:
    """Arrow triangle mesh from ``start`` along ``direction``
    (visualization.create_arrow:37, trimesh-free).

    Returns (vertices [V,3], faces [F,3])."""
    d = np.asarray(direction, np.float64)
    d = d / max(np.linalg.norm(d), 1e-12)
    # orthonormal frame
    up = np.array([0.0, 0.0, 1.0]) if abs(d[2]) < 0.9 else np.array([1.0, 0, 0])
    u = np.cross(d, up)
    u /= max(np.linalg.norm(u), 1e-12)
    v = np.cross(d, u)
    start = np.asarray(start, np.float64)
    shaft_len = length * (1 - head_frac)

    ang = np.linspace(0, 2 * np.pi, segments, endpoint=False)
    circ = np.cos(ang)[:, None] * u + np.sin(ang)[:, None] * v

    verts = []
    faces = []
    base = start + circ * shaft_radius                     # shaft base ring
    top = start + d * shaft_len + circ * shaft_radius      # shaft top ring
    head = start + d * shaft_len + circ * head_radius      # head base ring
    tip = start + d * length                               # arrow tip
    verts.extend(base)
    verts.extend(top)
    verts.extend(head)
    verts.append(tip)
    verts.append(start)                                    # shaft bottom center
    V = np.asarray(verts)
    tip_i = 3 * segments
    bot_i = 3 * segments + 1
    for i in range(segments):
        j = (i + 1) % segments
        faces.append((i, j, segments + i))                 # shaft side
        faces.append((j, segments + j, segments + i))
        faces.append((2 * segments + i, 2 * segments + j, tip_i))  # head cone
        faces.append((j, i, bot_i))                        # bottom cap
    return V.astype(np.float32), np.asarray(faces, np.int32)


def situation_arrows_obj(path: str, gt_pose: np.ndarray,
                         pred_pose: Optional[np.ndarray] = None,
                         length: float = 0.6) -> None:
    """Export GT (and optionally predicted) situation vectors as one OBJ.

    Poses are [x, y, z, qx, qy, qz, qw]; the arrow points along the
    quaternion-rotated +x axis (the reference's agent-facing convention)."""
    from scipy.spatial.transform import Rotation as R

    all_v, all_f = [], []
    offset = 0
    for pose in [gt_pose] + ([pred_pose] if pred_pose is not None else []):
        pose = np.asarray(pose, np.float64)
        facing = R.from_quat(pose[3:7]).apply([1.0, 0, 0])
        v, f = create_arrow(pose[:3], facing, length)
        all_v.append(v)
        all_f.append(f + offset)
        offset += len(v)
    write_obj_mesh(path, np.concatenate(all_v), np.concatenate(all_f))


def activation_colors(values: np.ndarray) -> np.ndarray:
    """Map scalar activations to a blue->red colormap, uint8 [N, 3]
    (visualization.py activation-colored clouds)."""
    v = np.asarray(values, np.float64)
    lo, hi = np.min(v), np.max(v)
    t = (v - lo) / max(hi - lo, 1e-12)
    r = np.clip(255 * t, 0, 255)
    b = np.clip(255 * (1 - t), 0, 255)
    g = np.clip(255 * (1 - np.abs(2 * t - 1)), 0, 255)
    return np.stack([r, g, b], axis=-1).astype(np.uint8)


def export_scene_visualization(out_dir: str, tag: str, points: np.ndarray,
                               attention: Optional[np.ndarray] = None,
                               gt_pose: Optional[np.ndarray] = None,
                               pred_pose: Optional[np.ndarray] = None) -> None:
    """visualize_scene_test analogue: attention-colored cloud + arrows."""
    os.makedirs(out_dir, exist_ok=True)
    colors = activation_colors(attention) if attention is not None else None
    write_ply_points(os.path.join(out_dir, f"{tag}_points.ply"), points, colors)
    if gt_pose is not None:
        situation_arrows_obj(os.path.join(out_dir, f"{tag}_situation.obj"),
                             gt_pose, pred_pose)
