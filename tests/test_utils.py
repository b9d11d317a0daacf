"""Utils coverage: metrics logger, step timer, visualization, tracing."""

import json
import os

import numpy as np

from music2dance_tpu.utils.logging import MetricsLogger
from music2dance_tpu.utils.profiling import StepTimer, synchronize, trace
from music2dance_tpu.utils.visualize import plot_pose_trajectories, render_pose_video


def test_metrics_logger_jsonl(tmp_path):
    with MetricsLogger(str(tmp_path), stream=None) as log:
        log.log(1, {"d_loss": 1.5, "g_loss": -0.5})
        log.log(2, {"d_loss": 1.2, "g_loss": -0.4})
    path = tmp_path / "metrics.jsonl"
    lines = [json.loads(l) for l in open(path)]
    assert len(lines) == 2
    assert lines[0]["d_loss"] == 1.5
    assert "steps_per_sec" in lines[1]


def test_metrics_logger_tensorboard_sink(tmp_path):
    """Opt-in TensorBoard scalars next to the JSONL (SURVEY §2 C10)."""
    import pytest

    pytest.importorskip("torch.utils.tensorboard")
    with MetricsLogger(str(tmp_path), stream=None, tensorboard=True) as log:
        log.log(1, {"d_loss": 1.5})
        log.log(2, {"d_loss": 1.2}, prefix="eval")
    tb_dir = tmp_path / "tb"
    events = [f for f in os.listdir(tb_dir) if "tfevents" in f]
    assert events, "no event file written"
    from tensorboard.backend.event_processing.event_accumulator import \
        EventAccumulator

    acc = EventAccumulator(str(tb_dir))
    acc.Reload()
    tags = set(acc.Tags()["scalars"])
    assert "train/d_loss" in tags and "eval/d_loss" in tags
    vals = acc.Scalars("train/d_loss")
    assert vals[0].step == 1 and abs(vals[0].value - 1.5) < 1e-6
    # JSONL remains the source of truth alongside the TB sink
    assert (tmp_path / "metrics.jsonl").exists()


def test_metrics_logger_tensorboard_requires_dir():
    import pytest

    with pytest.raises(ValueError, match="log_dir"):
        MetricsLogger(None, stream=None, tensorboard=True)


def test_step_timer():
    import jax.numpy as jnp

    t = StepTimer(window=3)
    x = jnp.ones(4)
    ticks = [t.tick(x) for _ in range(7)]
    assert ticks.count(True) == 2
    assert t.steps_per_sec is not None and t.steps_per_sec > 0


def test_synchronize_returns_scalar():
    import jax.numpy as jnp

    v = synchronize({"a": jnp.ones((2, 3))})
    assert v == 6.0


def test_render_pose_video(tmp_path):
    poses = np.cumsum(
        np.random.default_rng(0).standard_normal((8, 5, 3)) * 0.1, axis=0
    )
    path = str(tmp_path / "dance.gif")
    render_pose_video(poses, path, fps=4, skeleton=[(0, 1), (1, 2)])
    assert os.path.getsize(path) > 0


def test_plot_pose_trajectories(tmp_path):
    poses = np.random.default_rng(0).standard_normal((20, 6, 3))
    path = str(tmp_path / "traj.png")
    plot_pose_trajectories(poses, path)
    assert os.path.getsize(path) > 0


def test_profiler_trace(tmp_path):
    import jax
    import jax.numpy as jnp

    with trace(str(tmp_path)):
        jax.jit(lambda x: x * 2)(jnp.ones(8)).block_until_ready()
    # a trace directory with at least one file appears
    found = any(files for _, _, files in os.walk(tmp_path))
    assert found


def test_render_video_mp4_requires_ffmpeg(tmp_path):
    """Video-container paths must not get GIF bytes from PillowWriter;
    without ffmpeg the call fails loudly instead."""
    import numpy as np
    import pytest
    from matplotlib import animation

    from music2dance_tpu.utils.visualize import render_pose_video

    poses = np.zeros((3, 4, 2), np.float32)
    if animation.FFMpegWriter.isAvailable():
        render_pose_video(poses, str(tmp_path / "d.mp4"))
        assert (tmp_path / "d.mp4").stat().st_size > 0
    else:
        with pytest.raises(RuntimeError, match="ffmpeg"):
            render_pose_video(poses, str(tmp_path / "d.mp4"))
    # gif path unaffected
    render_pose_video(poses, str(tmp_path / "d.gif"))
    assert (tmp_path / "d.gif").stat().st_size > 0
