"""BVH parse + forward-kinematics tests (data/bvh.py).

FK is verified against hand-computed rotation chains — the classic
silent-wrongness trap in mocap ingestion is a wrong rotation order or a
transposed matrix, which produces plausible-looking garbage. Every
check here has a closed-form expected value.
"""

import numpy as np
import pytest

from music2dance_tpu.data.bvh import (BvhFile, bvh_joint_positions,
                                      load_bvh_poses, parse_bvh,
                                      resample_poses, save_bvh_poses)


def _bvh(hierarchy: str, frames: list, frame_time: float = 0.05) -> str:
    rows = "\n".join(" ".join(f"{v:.6f}" for v in row) for row in frames)
    return (f"HIERARCHY\n{hierarchy}\nMOTION\nFrames: {len(frames)}\n"
            f"Frame Time: {frame_time}\n{rows}\n")


TWO_JOINT = """\
ROOT Hips
{
  OFFSET 0 1 0
  CHANNELS 6 Xposition Yposition Zposition Zrotation Xrotation Yrotation
  JOINT Chest
  {
    OFFSET 0 2 0
    CHANNELS 3 Zrotation Xrotation Yrotation
    End Site
    {
      OFFSET 0 0.5 0
    }
  }
}"""


class TestParse:
    def test_structure(self):
        text = _bvh(TWO_JOINT, [[0] * 9, [1] * 9])
        bvh = parse_bvh(text)
        assert [j.name for j in bvh.joints] == ["Hips", "Chest", "Chest_end"]
        assert [j.parent for j in bvh.joints] == [-1, 0, 1]
        assert bvh.joints[2].is_end_site
        assert bvh.joint_names == ["Hips", "Chest"]
        assert bvh.frames.shape == (2, 9)
        assert bvh.fps == pytest.approx(20.0)
        np.testing.assert_allclose(bvh.joints[1].offset, [0, 2, 0])

    def test_frame_count_mismatch_raises(self):
        text = _bvh(TWO_JOINT, [[0] * 9]).replace("Frames: 1", "Frames: 3")
        with pytest.raises(ValueError, match="expected 3 frames"):
            parse_bvh(text)

    def test_unknown_channel_raises(self):
        bad = TWO_JOINT.replace("Yrotation\n  JOINT", "Wrotation\n  JOINT")
        with pytest.raises(ValueError, match="unknown channel"):
            parse_bvh(_bvh(bad, [[0] * 9]))

    def test_truncated_raises(self):
        with pytest.raises(ValueError, match="unexpected end"):
            parse_bvh("HIERARCHY\nROOT Hips\n{\n  OFFSET 0 0 0\n")

    def test_bad_frame_time_raises(self):
        text = _bvh(TWO_JOINT, [[0] * 9], frame_time=0.0)
        with pytest.raises(ValueError, match="Frame Time"):
            parse_bvh(text)


def _rx(deg):
    r = np.deg2rad(deg)
    c, s = np.cos(r), np.sin(r)
    return np.array([[1, 0, 0], [0, c, -s], [0, s, c]])


def _ry(deg):
    r = np.deg2rad(deg)
    c, s = np.cos(r), np.sin(r)
    return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])


def _rz(deg):
    r = np.deg2rad(deg)
    c, s = np.cos(r), np.sin(r)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])


class TestForwardKinematics:
    def test_rest_pose_is_offset_chain(self):
        bvh = parse_bvh(_bvh(TWO_JOINT, [[0] * 9]))
        names, pos = bvh_joint_positions(bvh, include_end_sites=True)
        assert names == ["Hips", "Chest", "Chest_end"]
        np.testing.assert_allclose(
            pos[0], [[0, 1, 0], [0, 3, 0], [0, 3.5, 0]], atol=1e-6)

    def test_root_translation_channels_add_to_offset(self):
        bvh = parse_bvh(_bvh(TWO_JOINT, [[2, 3, 4, 0, 0, 0, 0, 0, 0]]))
        _, pos = bvh_joint_positions(bvh)
        np.testing.assert_allclose(pos[0, 0], [2, 4, 4], atol=1e-6)
        np.testing.assert_allclose(pos[0, 1], [2, 6, 4], atol=1e-6)

    def test_root_rotation_moves_child_closed_form(self):
        # 90 deg about Z rotates the child's +Y offset onto -X
        bvh = parse_bvh(_bvh(TWO_JOINT, [[0, 0, 0, 90, 0, 0, 0, 0, 0]]))
        _, pos = bvh_joint_positions(bvh, include_end_sites=True)
        np.testing.assert_allclose(pos[0, 0], [0, 1, 0], atol=1e-6)
        np.testing.assert_allclose(pos[0, 1], [-2, 1, 0], atol=1e-6)
        np.testing.assert_allclose(pos[0, 2], [-2.5, 1, 0], atol=1e-6)

    def test_channel_order_is_composition_order(self):
        # Channels "Zrotation Xrotation Yrotation" must compose Rz @ Rx @ Ry
        angles = (31.0, -47.0, 112.0)
        row = [0, 0, 0, *angles, 0, 0, 0]
        bvh = parse_bvh(_bvh(TWO_JOINT, [row]))
        _, pos = bvh_joint_positions(bvh)
        expect = np.array([0, 1, 0]) + _rz(31) @ _rx(-47) @ _ry(112) @ [0, 2, 0]
        np.testing.assert_allclose(pos[0, 1], expect, atol=1e-5)

    def test_nested_rotations_compose_through_hierarchy(self):
        row = [0, 0, 0, 90, 0, 0, 0, 90, 0]  # root Rz(90), chest Rx(90)
        bvh = parse_bvh(_bvh(TWO_JOINT, [row]))
        _, pos = bvh_joint_positions(bvh, include_end_sites=True)
        # end offset +0.5Y: chest-local Rx(90) sends Y->Z; root Rz(90)
        # leaves Z alone. Global end = chest_pos + [0, 0, 0.5].
        np.testing.assert_allclose(pos[0, 1], [-2, 1, 0], atol=1e-6)
        np.testing.assert_allclose(pos[0, 2], [-2, 1, 0.5], atol=1e-6)

    def test_vectorized_frames_match_per_frame(self):
        rng = np.random.default_rng(0)
        frames = rng.uniform(-180, 180, size=(7, 9)).tolist()
        bvh = parse_bvh(_bvh(TWO_JOINT, frames))
        _, pos_all = bvh_joint_positions(bvh, include_end_sites=True)
        for t, row in enumerate(frames):
            one = parse_bvh(_bvh(TWO_JOINT, [row]))
            _, pos_one = bvh_joint_positions(one, include_end_sites=True)
            np.testing.assert_allclose(pos_all[t], pos_one[0], atol=1e-5)


class TestResample:
    def test_identity_when_rates_match(self):
        x = np.arange(12, dtype=np.float32).reshape(4, 3, 1)
        out = resample_poses(x, 30.0, 30.0)
        np.testing.assert_array_equal(out, x)

    def test_linear_interpolation_exact_on_a_line(self):
        # values linear in time are reproduced exactly at any rate
        t_in = 11
        x = (np.arange(t_in, dtype=np.float64)[:, None, None]
             * np.ones((1, 2, 3)))
        out = resample_poses(x, 100.0, 40.0)
        assert out.shape[0] == round(t_in * 40.0 / 100.0)
        expect = np.arange(out.shape[0]) * (100.0 / 40.0)
        np.testing.assert_allclose(out[:, 0, 0], expect, atol=1e-5)

    def test_upsampling_tail_clamps(self):
        x = np.array([[0.0], [1.0]], np.float32)[:, :, None]
        out = resample_poses(x, 10.0, 40.0)
        assert out.shape[0] == 8
        assert out[-1, 0, 0] == pytest.approx(1.0)  # past the end: clamp

    def test_empty_raises(self):
        with pytest.raises(ValueError, match="empty"):
            resample_poses(np.zeros((0, 2, 3)), 10, 20)


class TestLoadBvhPoses:
    def test_end_to_end(self, tmp_path):
        rng = np.random.default_rng(1)
        frames = rng.uniform(-90, 90, size=(40, 9))
        frames[:, :3] = rng.uniform(-5, 5, size=(40, 3))
        p = tmp_path / "dance.bvh"
        p.write_text(_bvh(TWO_JOINT, frames.tolist(), frame_time=1 / 60))
        poses = load_bvh_poses(str(p), fps_out=30.0)
        assert poses.shape == (20, 2, 3)
        assert poses.dtype == np.float32
        # root-centered: the root row is exactly zero every frame
        np.testing.assert_array_equal(poses[:, 0], 0.0)

    def test_joint_selection_and_order(self, tmp_path):
        p = tmp_path / "a.bvh"
        p.write_text(_bvh(TWO_JOINT, [[0] * 9]))
        poses = load_bvh_poses(str(p), joints=["Chest", "Hips"],
                               center_root=False)
        np.testing.assert_allclose(poses[0], [[0, 3, 0], [0, 1, 0]],
                                   atol=1e-6)

    def test_unknown_joint_raises_with_names(self, tmp_path):
        p = tmp_path / "a.bvh"
        p.write_text(_bvh(TWO_JOINT, [[0] * 9]))
        with pytest.raises(ValueError, match="Hips"):
            load_bvh_poses(str(p), joints=["NoSuchJoint"])

    def test_scale(self, tmp_path):
        p = tmp_path / "a.bvh"
        p.write_text(_bvh(TWO_JOINT, [[0] * 9]))
        poses = load_bvh_poses(str(p), scale=0.01, center_root=False)
        np.testing.assert_allclose(poses[0, 1], [0, 0.03, 0], atol=1e-7)


class TestExport:
    def test_round_trip_through_own_parser(self, tmp_path):
        rng = np.random.default_rng(3)
        poses = rng.normal(size=(25, 23, 3)).astype(np.float32)
        p = tmp_path / "out.bvh"
        save_bvh_poses(str(p), poses, fps=30.0)
        bvh = parse_bvh(str(p))
        assert bvh.fps == pytest.approx(30.0, rel=1e-6)
        _, back = bvh_joint_positions(bvh)
        np.testing.assert_allclose(back, poses, atol=2e-6)

    def test_single_joint(self, tmp_path):
        poses = np.arange(9, dtype=np.float32).reshape(3, 1, 3)
        p = tmp_path / "one.bvh"
        save_bvh_poses(str(p), poses, fps=10.0)
        _, back = bvh_joint_positions(parse_bvh(str(p)))
        np.testing.assert_allclose(back, poses, atol=2e-6)

    def test_save_poses_io_dispatch(self, tmp_path):
        from music2dance_tpu.infer.poses_io import load_poses, save_poses

        poses = np.random.default_rng(4).normal(
            size=(8, 5, 3)).astype(np.float32)
        p = str(tmp_path / "x.bvh")
        save_poses(p, poses, fps=30.0)
        np.testing.assert_allclose(load_poses(p), poses, atol=2e-6)
        with pytest.raises(ValueError, match="fps"):
            save_poses(str(tmp_path / "y.bvh"), poses)
        with pytest.raises(ValueError, match="3-D"):
            save_poses(str(tmp_path / "z.bvh"),
                       np.zeros((4, 5, 2), np.float32), fps=30.0)


class TestPipelineIntegration:
    def _write_corpus(self, tmp_path, n_joints_extra=0):
        from music2dance_tpu.data.wav import save_wav

        sr = 22050
        wave = np.random.default_rng(0).standard_normal(sr * 2) * 0.1
        save_wav(str(tmp_path / "song.wav"), wave.astype(np.float32), sr)
        frames = np.random.default_rng(1).uniform(-30, 30, size=(120, 9))
        (tmp_path / "song.bvh").write_text(
            _bvh(TWO_JOINT, frames.tolist(), frame_time=1 / 60))

    def test_wav_pose_source_loads_bvh(self, tmp_path):
        from music2dance_tpu.audio import AudioConfig
        from music2dance_tpu.data.pipeline import WavPoseSource

        self._write_corpus(tmp_path)
        audio = AudioConfig()
        src = WavPoseSource(str(tmp_path), pose_fps=audio.feature_rate)
        item = src[0]
        # 120 mocap frames at 60 fps = 2 s -> 2 s * feature_rate frames
        expect_t = round(120 / 60 * audio.feature_rate)
        assert item["pose"].shape == (expect_t, 6)  # 2 joints x 3, flat
        assert item["wave"].shape[0] == 22050 * 2

    def test_bvh_without_pose_fps_raises(self, tmp_path):
        from music2dance_tpu.data.pipeline import WavPoseSource

        self._write_corpus(tmp_path)
        with pytest.raises(ValueError, match="pose_fps"):
            WavPoseSource(str(tmp_path))


def test_duplicate_joint_name_selection_raises(tmp_path):
    dup = TWO_JOINT.replace("JOINT Chest", "JOINT Hips")
    p = tmp_path / "dup.bvh"
    p.write_text(_bvh(dup, [[0] * 9]))
    with pytest.raises(ValueError, match="more than once"):
        load_bvh_poses(str(p), joints=["Hips"])
    # unambiguous selection on the same file still works
    poses = load_bvh_poses(str(p), center_root=False)
    assert poses.shape[1] == 2
