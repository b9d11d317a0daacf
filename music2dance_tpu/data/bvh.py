"""BVH motion-capture ingestion: skeleton parse + forward kinematics.

The reference's pose-file format is unknowable (empty mount; SURVEY.md
§2 C2 marks the parsing details [INFERRED]), but BVH (BioVision
Hierarchy) is the de-facto interchange format for the dance/mocap
corpora this domain trains on, so the data layer accepts it natively:
``song.bvh`` paired next to ``song.wav`` works exactly like ``.npy``/
``.json`` pose files (data/pipeline.WavPoseSource), after forward
kinematics turns the channel streams into the framework's positional
``[T, n_joints, 3]`` pose contract and linear resampling aligns the
mocap rate to the audio feature rate.

Everything here is from-scratch host numpy (file parsing and FK are
one-time preprocess work, not device math):

- :func:`parse_bvh` — recursive-descent parser of the HIERARCHY tree
  (ROOT/JOINT/End Site, OFFSET, CHANNELS) and the MOTION frame block.
- :func:`bvh_joint_positions` — vectorized FK over all frames: local
  transform = T(offset) . T(pos channels) . R(rot channels, in channel
  order, degrees); global = parent_global . local. Verified against
  hand-computed chains in tests/test_bvh.py.
- :func:`load_bvh_poses` — the one-call path: parse, FK, optional joint
  selection by name, optional root-centering, resampling to a target
  frame rate.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional, Sequence

import numpy as np


@dataclasses.dataclass
class BvhJoint:
    """One node of the skeleton tree, in depth-first hierarchy order."""

    name: str
    parent: int                  # index into the joints list; -1 for root
    offset: np.ndarray           # [3] float32, local translation
    channels: tuple              # channel names, () for end sites
    channel_start: int           # column of this joint's first channel
    is_end_site: bool = False


@dataclasses.dataclass
class BvhFile:
    joints: list                 # [BvhJoint], parents before children
    frames: np.ndarray           # [T, C] float32 channel values
    frame_time: float            # seconds per frame

    @property
    def fps(self) -> float:
        return 1.0 / self.frame_time

    @property
    def joint_names(self) -> list:
        return [j.name for j in self.joints if not j.is_end_site]


_POS_AXES = {"Xposition": 0, "Yposition": 1, "Zposition": 2}
_ROT_AXES = {"Xrotation": 0, "Yrotation": 1, "Zrotation": 2}


def _tokenize(text: str) -> list:
    # Braces are their own tokens regardless of surrounding whitespace.
    return text.replace("{", " { ").replace("}", " } ").split()


class _Cursor:
    def __init__(self, tokens: list, path: str):
        self._t = tokens
        self._i = 0
        self._path = path

    def next(self) -> str:
        if self._i >= len(self._t):
            raise ValueError(f"{self._path}: unexpected end of file")
        tok = self._t[self._i]
        self._i += 1
        return tok

    def peek(self) -> str:
        if self._i >= len(self._t):
            raise ValueError(f"{self._path}: unexpected end of file")
        return self._t[self._i]

    def expect(self, want: str):
        got = self.next()
        if got.upper() != want.upper():
            raise ValueError(f"{self._path}: expected {want!r}, got {got!r}")

    def rest(self) -> list:
        return self._t[self._i:]


def parse_bvh(path_or_text: str) -> BvhFile:
    """Parse a BVH file (path, or the text itself when it contains a
    newline). Raises ``ValueError`` with the file named on any structural
    problem — truncated hierarchy, channel/frame-count mismatch, unknown
    channel names — rather than mis-ingesting motion silently."""
    if "\n" in path_or_text:
        text, path = path_or_text, "<string>"
    else:
        path = path_or_text
        with open(path, "r", errors="replace") as f:
            text = f.read()
        path = os.path.basename(path)
    cur = _Cursor(_tokenize(text), path)
    cur.expect("HIERARCHY")
    cur.expect("ROOT")
    joints: list = []
    n_channels = 0

    def parse_joint(parent: int):
        nonlocal n_channels
        # name: tokens up to the opening brace (names with spaces happen)
        name_parts = []
        while cur.peek() != "{":
            name_parts.append(cur.next())
        name = " ".join(name_parts)
        cur.expect("{")
        cur.expect("OFFSET")
        offset = np.array([float(cur.next()) for _ in range(3)], np.float32)
        cur.expect("CHANNELS")
        n = int(cur.next())
        channels = tuple(cur.next() for _ in range(n))
        for c in channels:
            if c not in _POS_AXES and c not in _ROT_AXES:
                raise ValueError(f"{path}: unknown channel {c!r} on {name}")
        me = len(joints)
        joints.append(BvhJoint(name=name, parent=parent, offset=offset,
                               channels=channels, channel_start=n_channels))
        n_channels += n
        while True:
            tok = cur.next()
            up = tok.upper()
            if up == "}":
                return
            if up == "JOINT":
                parse_joint(me)
            elif up == "END":
                cur.expect("Site")
                cur.expect("{")
                cur.expect("OFFSET")
                off = np.array([float(cur.next()) for _ in range(3)],
                               np.float32)
                joints.append(BvhJoint(
                    name=f"{name}_end", parent=me, offset=off, channels=(),
                    channel_start=n_channels, is_end_site=True))
                cur.expect("}")
            else:
                raise ValueError(f"{path}: unexpected token {tok!r} "
                                 f"inside joint {name}")

    parse_joint(-1)
    cur.expect("MOTION")
    cur.expect("Frames:")
    n_frames = int(cur.next())
    cur.expect("Frame")
    cur.expect("Time:")
    frame_time = float(cur.next())
    if frame_time <= 0:
        raise ValueError(f"{path}: Frame Time must be > 0, got {frame_time}")
    values = cur.rest()
    want = n_frames * n_channels
    if len(values) != want:
        raise ValueError(
            f"{path}: MOTION block has {len(values)} values, expected "
            f"{n_frames} frames x {n_channels} channels = {want}")
    frames = np.asarray(values, np.float64).astype(np.float32)
    frames = frames.reshape(n_frames, n_channels)
    return BvhFile(joints=joints, frames=frames, frame_time=frame_time)


def _axis_rotations(axis: int, degrees: np.ndarray) -> np.ndarray:
    """[T] degrees -> [T, 3, 3] rotation matrices about X/Y/Z (axis 0/1/2),
    right-handed, column-vector convention."""
    rad = np.deg2rad(degrees.astype(np.float64))
    c, s = np.cos(rad), np.sin(rad)
    t = len(degrees)
    m = np.zeros((t, 3, 3), np.float64)
    if axis == 0:
        m[:, 0, 0] = 1
        m[:, 1, 1], m[:, 1, 2] = c, -s
        m[:, 2, 1], m[:, 2, 2] = s, c
    elif axis == 1:
        m[:, 1, 1] = 1
        m[:, 0, 0], m[:, 0, 2] = c, s
        m[:, 2, 0], m[:, 2, 2] = -s, c
    else:
        m[:, 2, 2] = 1
        m[:, 0, 0], m[:, 0, 1] = c, -s
        m[:, 1, 0], m[:, 1, 1] = s, c
    return m


def bvh_joint_positions(
    bvh: BvhFile, include_end_sites: bool = False
) -> tuple:
    """Forward kinematics: ``(names, positions [T, J, 3] float32)``.

    Per BVH semantics, a joint's local transform applies its OFFSET and
    position channels as translation and its rotation channels (degrees)
    in the order the CHANNELS line lists them; a child's global transform
    is parent_global . local. Vectorized over frames.
    """
    t = bvh.frames.shape[0]
    eye = np.broadcast_to(np.eye(3), (t, 3, 3))
    glob_r: list = [None] * len(bvh.joints)
    glob_p: list = [None] * len(bvh.joints)
    names, cols = [], []
    for idx, j in enumerate(bvh.joints):
        pos = np.broadcast_to(j.offset.astype(np.float64), (t, 3)).copy()
        rot = None
        for k, ch in enumerate(j.channels):
            vals = bvh.frames[:, j.channel_start + k].astype(np.float64)
            if ch in _POS_AXES:
                pos[:, _POS_AXES[ch]] += vals
            else:
                m = _axis_rotations(_ROT_AXES[ch], vals)
                rot = m if rot is None else rot @ m
        if rot is None:
            rot = eye
        if j.parent < 0:
            glob_r[idx], glob_p[idx] = rot, pos
        else:
            pr, pp = glob_r[j.parent], glob_p[j.parent]
            glob_p[idx] = pp + np.einsum("tij,tj->ti", pr, pos)
            glob_r[idx] = pr @ rot
        if include_end_sites or not j.is_end_site:
            names.append(j.name)
            cols.append(idx)
    positions = np.stack([glob_p[i] for i in cols], axis=1)
    return names, positions.astype(np.float32)


def resample_poses(poses: np.ndarray, fps_in: float,
                   fps_out: float) -> np.ndarray:
    """Linear time-resampling of ``[T, ...]`` poses from fps_in to fps_out.

    Output frame t samples the input at time ``t / fps_out`` (both clocks
    start at frame 0 = time 0 — the same alignment the audio frontend's
    frame p uses); the tail clamps to the last input frame. Output length
    = round(T_in * fps_out / fps_in), at least 1.
    """
    t_in = poses.shape[0]
    if t_in == 0:
        raise ValueError("cannot resample an empty pose sequence")
    if abs(fps_in - fps_out) < 1e-9:
        return np.asarray(poses, np.float32)
    t_out = max(1, int(round(t_in * fps_out / fps_in)))
    src = np.arange(t_out, dtype=np.float64) * (fps_in / fps_out)
    lo = np.minimum(np.floor(src).astype(np.int64), t_in - 1)
    hi = np.minimum(lo + 1, t_in - 1)
    frac = (src - lo).reshape((-1,) + (1,) * (poses.ndim - 1))
    flat = poses.astype(np.float64)
    out = flat[lo] * (1.0 - frac) + flat[hi] * frac
    return out.astype(np.float32)


def save_bvh_poses(path: str, poses: np.ndarray, fps: float,
                   names: Optional[Sequence[str]] = None) -> None:
    """Write positional ``[T, J, 3]`` poses as a BVH file.

    The framework's pose contract is positions, not rotations, so the
    skeleton written here is the position-channel form BVH allows: a
    root carrying joint 0's trajectory and every other joint a direct
    child of the root whose position channels hold its root-relative
    offset — forward kinematics reproduces the input positions exactly
    (round-trip-tested against :func:`parse_bvh` +
    :func:`bvh_joint_positions`). DCC tools (Blender et al.) import
    this as translating bones, which is what generated dance data is.
    """
    poses = np.asarray(poses, np.float64)
    if poses.ndim != 3 or poses.shape[2] != 3:
        raise ValueError(f"poses must be [T, J, 3], got {poses.shape}")
    if fps <= 0:
        raise ValueError(f"fps must be > 0, got {fps}")
    t, j, _ = poses.shape
    if names is None:
        names = ["root"] + [f"joint{i}" for i in range(1, j)]
    if len(names) != j:
        raise ValueError(f"{len(names)} names for {j} joints")
    lines = ["HIERARCHY", f"ROOT {names[0]}", "{", "  OFFSET 0 0 0",
             "  CHANNELS 3 Xposition Yposition Zposition"]
    for name in names[1:]:
        lines += [f"  JOINT {name}", "  {", "    OFFSET 0 0 0",
                  "    CHANNELS 3 Xposition Yposition Zposition",
                  "    End Site", "    {", "      OFFSET 0 0 0", "    }",
                  "  }"]
    if j == 1:
        lines += ["  End Site", "  {", "    OFFSET 0 0 0", "  }"]
    lines += ["}", "MOTION", f"Frames: {t}",
              f"Frame Time: {1.0 / fps:.8f}"]
    rel = poses.copy()
    rel[:, 1:] -= poses[:, :1]      # children are root-relative
    flat = rel.reshape(t, j * 3)
    for row in flat:
        lines.append(" ".join(f"{v:.6f}" for v in row))
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def load_bvh_poses(
    path: str,
    *,
    fps_out: Optional[float] = None,
    joints: Optional[Sequence[str]] = None,
    include_end_sites: bool = False,
    center_root: bool = True,
    scale: Optional[float] = None,
) -> np.ndarray:
    """BVH file -> ``[T, J, 3]`` float32 positional poses.

    - ``fps_out``: resample the mocap rate to this frame rate (pass the
      audio config's ``feature_rate`` so pose frame p aligns with audio
      hop p); None keeps the file's native rate.
    - ``joints``: select/order joints by name; unknown names raise with
      the available names listed. None keeps every joint (end sites only
      with ``include_end_sites``).
    - ``center_root``: subtract the root joint's position per frame (the
      standard normalization for dance corpora — the GAN learns body
      pose, not the walk across the stage). The root joint itself then
      carries the zero vector.
    - ``scale``: multiply positions (BVH files mix cm/inches/meters;
      pick the factor that brings the skeleton to your corpus units).
    """
    bvh = parse_bvh(path)
    names, positions = bvh_joint_positions(
        bvh, include_end_sites=include_end_sites)
    if center_root:
        positions = positions - positions[:, :1]
    if joints is not None:
        index = {n: i for i, n in enumerate(names)}
        missing = [n for n in joints if n not in index]
        if missing:
            raise ValueError(
                f"{os.path.basename(path)}: joint(s) {missing} not in the "
                f"skeleton; available: {names}")
        dupes = sorted({n for n in joints
                        if n in index and names.count(n) > 1})
        if dupes:
            raise ValueError(
                f"{os.path.basename(path)}: joint name(s) {dupes} appear "
                f"more than once in the skeleton — selection by name is "
                f"ambiguous (DCC exports sometimes duplicate names); "
                f"rename the joints or select by slicing the full array")
        positions = positions[:, [index[n] for n in joints]]
    if scale is not None:
        positions = positions * np.float32(scale)
    if fps_out is not None:
        positions = resample_poses(positions, bvh.fps, fps_out)
    return positions
