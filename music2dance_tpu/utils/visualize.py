"""Qualitative visualization: stick-figure animation of pose sequences.

The reference class of repo ships a matplotlib/opencv pose renderer
(SURVEY.md §2 C11). Joint connectivity is unknowable without the real
reference (empty mount, §0), so rendering accepts an optional ``skeleton``
edge list; without one it draws joints as a scatter with trails — layout-
agnostic but still answers "does the motion look like motion".
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np


def render_pose_video(
    poses: np.ndarray,
    path: str,
    fps: float = 30.0,
    skeleton: Optional[Sequence[tuple[int, int]]] = None,
    dims: tuple[int, int] = (0, 1),
) -> None:
    """poses [T, J, D] -> animated .gif/.mp4 (2D projection of ``dims``)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib import animation

    poses = np.asarray(poses)
    t, j, _ = poses.shape
    x, y = poses[..., dims[0]], poses[..., dims[1]]
    pad = 0.1 * max(np.ptp(x), np.ptp(y), 1e-3)

    fig, ax = plt.subplots(figsize=(4, 4), dpi=80)
    ax.set_xlim(x.min() - pad, x.max() + pad)
    ax.set_ylim(y.min() - pad, y.max() + pad)
    ax.set_aspect("equal")
    ax.axis("off")

    scat = ax.scatter(x[0], y[0], s=20, c="tab:blue")
    lines = []
    if skeleton:
        for a, b in skeleton:
            (ln,) = ax.plot([x[0, a], x[0, b]], [y[0, a], y[0, b]], "k-", lw=1.5)
            lines.append((ln, a, b))

    def update(i):
        scat.set_offsets(np.stack([x[i], y[i]], axis=-1))
        for ln, a, b in lines:
            ln.set_data([x[i, a], x[i, b]], [y[i, a], y[i, b]])
        return [scat] + [ln for ln, _, _ in lines]

    anim = animation.FuncAnimation(fig, update, frames=t, blit=True)
    import os

    ext = os.path.splitext(path)[1].lower()
    if ext in (".mp4", ".m4v", ".mov", ".avi", ".webm"):
        # PillowWriter would happily write GIF bytes into a .mp4 file;
        # video containers need ffmpeg, so fail loudly when it's absent
        if not animation.FFMpegWriter.isAvailable():
            plt.close(fig)
            raise RuntimeError(
                f"{ext} output needs ffmpeg (not found on PATH); "
                "use a .gif path or install ffmpeg")
        # matplotlib's default codec (h264) can't be muxed into WebM;
        # pick one the container accepts
        codec = "vp9" if ext == ".webm" else None
        writer = animation.FFMpegWriter(fps=int(round(fps)), codec=codec)
    else:
        writer = animation.PillowWriter(fps=int(round(fps)))
    anim.save(path, writer=writer)
    plt.close(fig)


def plot_pose_trajectories(
    poses: np.ndarray, path: str, max_joints: int = 8
) -> None:
    """poses [T, J, D] -> per-joint coordinate traces (training debugging)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    poses = np.asarray(poses)
    t, j, d = poses.shape
    sel = range(min(j, max_joints))
    fig, axes = plt.subplots(len(list(sel)), 1, figsize=(8, 1.5 * min(j, max_joints)),
                             sharex=True, squeeze=False)
    for row, jj in enumerate(sel):
        for dd in range(d):
            axes[row][0].plot(poses[:, jj, dd], lw=0.8)
        axes[row][0].set_ylabel(f"j{jj}")
    axes[-1][0].set_xlabel("frame")
    fig.tight_layout()
    fig.savefig(path, dpi=80)
    plt.close(fig)
