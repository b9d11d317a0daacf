"""Pose export/import round trips (.npy and self-describing .json)."""

import numpy as np
import pytest

from music2dance_tpu.infer import load_poses, save_poses


def test_npy_roundtrip(tmp_path):
    poses = np.random.default_rng(0).standard_normal((7, 23, 3)).astype(np.float32)
    p = str(tmp_path / "p.npy")
    save_poses(p, poses)
    np.testing.assert_array_equal(load_poses(p), poses)


def test_json_roundtrip_with_metadata(tmp_path):
    import json

    poses = np.random.default_rng(1).standard_normal((5, 4, 3)).astype(np.float32)
    p = str(tmp_path / "p.json")
    save_poses(p, poses, fps=30.0)
    doc = json.load(open(p))
    assert doc["format"] == "music2dance_tpu/poses-v1"
    assert (doc["frames"], doc["n_joints"], doc["joint_dim"]) == (5, 4, 3)
    assert doc["fps"] == 30.0
    got = load_poses(p)
    np.testing.assert_allclose(got, poses, rtol=0, atol=1e-6)


def test_json_header_mismatch_rejected(tmp_path):
    import json

    poses = np.zeros((3, 2, 3), np.float32)
    p = str(tmp_path / "p.json")
    save_poses(p, poses)
    doc = json.load(open(p))
    doc["frames"] = 99
    json.dump(doc, open(p, "w"))
    with pytest.raises(ValueError, match="header says"):
        load_poses(p)


def test_bad_rank_rejected(tmp_path):
    with pytest.raises(ValueError, match="T, J, D"):
        save_poses(str(tmp_path / "x.npy"), np.zeros((4, 3), np.float32))


def test_pipeline_pairs_json_poses(tmp_path):
    """The data layer parses .json pose files too (SURVEY §2 C2: pose
    keypoint parsing; .npy takes precedence when both exist)."""
    from music2dance_tpu.data.pipeline import WavPoseSource
    from music2dance_tpu.data.wav import save_wav

    sr = 22050
    wave = np.zeros(sr // 2, np.float32)
    save_wav(str(tmp_path / "song.wav"), wave, sr)
    frames = len(wave) // 735 + 1
    poses = np.arange(frames * 23 * 3, dtype=np.float32).reshape(frames, 23, 3)
    save_poses(str(tmp_path / "song.json"), poses, fps=30.0)
    src = WavPoseSource(str(tmp_path), target_sr=sr)
    assert len(src) == 1
    item = src[0]
    np.testing.assert_array_equal(item["pose"], poses.reshape(frames, -1))
