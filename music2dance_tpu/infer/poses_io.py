"""Pose-sequence export/import: .npy (fast path) and .json (portable).

SURVEY.md §2 C7 names both formats for the reference's generate surface
(export pose sequence (npy/json)). The JSON layout is self-describing so
downstream renderers need no side-channel: frame rate and joint geometry
travel with the data.
"""

from __future__ import annotations

import json
import os

import numpy as np


def save_poses(path: str, poses: np.ndarray, fps: float | None = None) -> None:
    """Write ``poses`` [T, J, D] as .npy, .json, or .bvh by extension."""
    poses = np.asarray(poses, np.float32)
    if poses.ndim != 3:
        raise ValueError(f"poses must be [T, J, D], got {poses.shape}")
    if path.endswith(".bvh"):
        from ..data.bvh import save_bvh_poses

        if fps is None:
            raise ValueError(".bvh export needs fps (the MOTION block "
                             "carries Frame Time)")
        if poses.shape[2] != 3:
            raise ValueError(f"BVH export needs 3-D joints, got "
                             f"joint_dim={poses.shape[2]}")
        save_bvh_poses(path, poses, fps=fps)
        return
    if path.endswith(".json"):
        doc = {
            "format": "music2dance_tpu/poses-v1",
            "frames": int(poses.shape[0]),
            "n_joints": int(poses.shape[1]),
            "joint_dim": int(poses.shape[2]),
            **({"fps": float(fps)} if fps is not None else {}),
            # row-major nested lists: poses[t][j][d]
            "poses": [[[float(v) for v in joint] for joint in frame]
                      for frame in poses],
        }
        with open(path, "w") as f:
            json.dump(doc, f)
    else:
        np.save(path, poses)


def load_poses(path: str) -> np.ndarray:
    """Read a pose sequence written by :func:`save_poses`."""
    if path.endswith(".bvh"):
        from ..data.bvh import load_bvh_poses

        return load_bvh_poses(path, center_root=False)
    if path.endswith(".json"):
        with open(path) as f:
            doc = json.load(f)
        poses = np.asarray(doc["poses"], np.float32)
        want = (doc.get("frames"), doc.get("n_joints"), doc.get("joint_dim"))
        if all(w is not None for w in want) and poses.shape != tuple(want):
            raise ValueError(
                f"{os.path.basename(path)}: header says {want}, "
                f"data is {poses.shape}"
            )
        return poses
    return np.load(path).astype(np.float32)
