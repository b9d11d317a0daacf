"""Round-3 CLI surfaces: evaluate.py and train.py --restore_torch /
--cell, driven end to end in subprocesses (absl flags are process-global,
and the sitecustomize pins the TPU platform — each run gets its own
process that force-switches to CPU first)."""

import json
import os
import subprocess
import sys

import jax
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WRAPPER = """
import jax
jax.config.update("jax_platforms", "cpu")
import runpy
import sys

sys.argv = sys.argv[1:]
runpy.run_path(sys.argv[0], run_name="__main__")
"""


def _run_cli(tmp_path, script, args, timeout=420):
    wrapper = tmp_path / "wrap.py"
    wrapper.write_text(_WRAPPER)
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    out = subprocess.run(
        [sys.executable, str(wrapper), os.path.join(REPO, script)] + args,
        capture_output=True, text=True, timeout=timeout, cwd=REPO, env=env,
    )
    assert out.returncode == 0, f"{script} failed:\n{out.stderr[-3000:]}"
    return out.stdout


def _make_ckpt(tmp_path):
    """A tiny trained checkpoint bundle via the library API."""
    from music2dance_tpu.audio import AudioConfig
    from music2dance_tpu.ckpt.orbax_io import CheckpointWriter
    from music2dance_tpu.data.synthetic import synthetic_batch
    from music2dance_tpu.models import tiny_gan
    from music2dance_tpu.train import TrainConfig, init_state

    audio = AudioConfig()
    gan = tiny_gan(feature_dim=audio.n_features)
    tc = TrainConfig(batch_size=4, clip_seconds=1.0)
    batch = synthetic_batch(jax.random.key(0), 4, 1.0, audio,
                            gan.generator.layout, through_frontend=False)
    state = init_state(jax.random.key(1), gan, tc, batch)
    ckpt = tmp_path / "ckpt"
    w = CheckpointWriter(str(ckpt), gan, audio, tc)
    w.save(0, state)
    w.close()
    return gan, audio, tc, state, str(ckpt)


def test_evaluate_cli_emits_metrics(tmp_path):
    _, _, _, _, ckpt = _make_ckpt(tmp_path)
    out_file = tmp_path / "metrics.json"
    stdout = _run_cli(tmp_path, "evaluate.py", [
        "--ckpt", ckpt, "--synthetic", "--corpus", "beat",
        "--synthetic_clips", "12", "--batches", "2", "--batch_size", "4",
        "--clip_seconds", "1.0", "--out", str(out_file),
    ])
    line = [l for l in stdout.splitlines() if l.startswith("{")][-1]
    metrics = json.loads(line)
    assert metrics == json.loads(out_file.read_text())
    for key in ("fmd", "wasserstein", "beat_alignment", "real_beat_alignment"):
        assert key in metrics, key
        assert np.isfinite(metrics[key]), (key, metrics[key])
    # beat corpus: real motion is beat-locked even at tiny scale
    assert metrics["real_beat_alignment"] > 0.1


def test_train_cli_restores_torch_checkpoint(tmp_path):
    from music2dance_tpu.ckpt.torch_convert import save_torch_checkpoint

    gan, audio, tc, state, _ = _make_ckpt(tmp_path)
    torch_path = tmp_path / "reference.pt"
    save_torch_checkpoint(str(torch_path), state.g_params, state.d_params,
                          state.opt_g, state.opt_d)

    stdout = _run_cli(tmp_path, "train.py", [
        "--preset", "tiny", "--steps", "2", "--synthetic", "--corpus", "noise",
        "--synthetic_clips", "8", "--restore_torch", str(torch_path),
        "--metrics_dir", str(tmp_path / "m"), "--log_every", "1",
    ])
    assert "done: 2 steps" in stdout
    rows = [json.loads(l)
            for l in open(tmp_path / "m" / "metrics.jsonl")]
    assert any("d_loss" in r and np.isfinite(r["d_loss"]) for r in rows)


def test_serve_cli_end_to_end(tmp_path):
    """serve.py: checkpoint -> HTTP server; POST one song, get poses."""
    import io
    import time
    import urllib.request

    _, audio, _, _, ckpt = _make_ckpt(tmp_path)
    wrapper = tmp_path / "wrap.py"
    wrapper.write_text(_WRAPPER)
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.Popen(
        [sys.executable, str(wrapper), os.path.join(REPO, "serve.py"),
         "--ckpt", ckpt, "--port", "0", "--max_batch", "2",
         "--bucket_seconds", "1.0", "--max_seconds", "4.0"],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        cwd=REPO, env=env,
    )
    try:
        # the CLI prints "serving <ckpt> ... on http://host:port ..." once up
        line = ""
        deadline = time.monotonic() + 300
        while "http://" not in line:
            assert time.monotonic() < deadline, "serve.py never came up"
            line = proc.stdout.readline()
            assert line, f"serve.py exited:\n{proc.stderr.read()[-3000:]}"
        addr = line.split("http://")[1].split()[0]

        rng = np.random.default_rng(0)
        wave = rng.standard_normal(audio.sample_rate // 2).astype("<f4")
        req = urllib.request.Request(
            f"http://{addr}/generate?dtype=float32&seed=5",
            data=wave.tobytes(), method="POST",
        )
        with urllib.request.urlopen(req, timeout=240) as resp:
            assert resp.status == 200
            poses = np.load(io.BytesIO(resp.read()))
        t = 1 + len(wave) // audio.hop_length
        layout_joints = 23  # full JointLayout default in _make_ckpt's tiny_gan
        assert poses.shape[0] == t and poses.shape[1] == layout_joints
        assert np.isfinite(poses).all()

        with urllib.request.urlopen(f"http://{addr}/healthz", timeout=30) as r:
            health = json.loads(r.read())
        assert health["status"] == "ok" and health["stats"]["requests"] == 1
    finally:
        proc.terminate()
        proc.wait(timeout=30)


def test_convert_cli_round_trip(tmp_path):
    """convert.py: orbax -> torch .pt -> orbax preserves weights and Adam
    moments exactly (SURVEY §2 C8 interop as a user-facing command)."""
    gan, audio, tc, state, ckpt = _make_ckpt(tmp_path)

    pt = tmp_path / "model.pt"
    stdout = _run_cli(tmp_path, "convert.py",
                      ["--ckpt", ckpt, "--out", str(pt)])
    assert "wrote" in stdout and pt.stat().st_size > 0

    imported = tmp_path / "imported"
    stdout = _run_cli(tmp_path, "convert.py", [
        "--torch", str(pt), "--preset", "tiny", "--out", str(imported)])
    assert "opt=yes" in stdout

    from music2dance_tpu.ckpt.orbax_io import restore_bundle

    _, _, back = restore_bundle(str(imported))
    for orig, got in ((state.g_params, back.g_params),
                      (state.d_params, back.d_params),
                      (state.opt_g, back.opt_g),
                      (state.opt_d, back.opt_d)):
        jax.tree.map(np.testing.assert_array_equal, orig, got)


def test_convert_cli_import_without_opt(tmp_path):
    """--nowith_opt: weights convert, Adam state starts fresh (the loader
    returns a 2-tuple without optimizer templates — regression for the
    4-value unpack crash)."""
    gan, audio, tc, state, ckpt = _make_ckpt(tmp_path)
    pt = tmp_path / "model.pt"
    _run_cli(tmp_path, "convert.py", ["--ckpt", ckpt, "--out", str(pt)])
    imported = tmp_path / "imported"
    stdout = _run_cli(tmp_path, "convert.py", [
        "--torch", str(pt), "--preset", "tiny", "--out", str(imported),
        "--nowith_opt"])
    assert "opt=no" in stdout and "fresh Adam" in stdout

    from music2dance_tpu.ckpt.orbax_io import restore_bundle

    _, _, back = restore_bundle(str(imported))
    jax.tree.map(np.testing.assert_array_equal, state.g_params, back.g_params)


def test_convert_cli_rejects_ambiguous_direction(tmp_path):
    wrapper = tmp_path / "wrap.py"
    wrapper.write_text(_WRAPPER)
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    out = subprocess.run(
        [sys.executable, str(wrapper), os.path.join(REPO, "convert.py"),
         "--out", str(tmp_path / "x.pt")],
        capture_output=True, text=True, timeout=120, cwd=REPO, env=env,
    )
    assert out.returncode != 0
    assert "exactly one of" in out.stderr


def test_render_cli_from_saved_poses(tmp_path):
    """generate -> save .json -> render.py later, no checkpoint needed
    (SURVEY §2 C7/C11 decoupled export/render workflow)."""
    from music2dance_tpu.infer.poses_io import save_poses

    rng = np.random.default_rng(2)
    poses = rng.standard_normal((12, 23, 3)).astype(np.float32)
    p = tmp_path / "p.json"
    save_poses(str(p), poses, fps=30.0)
    gif = tmp_path / "d.gif"
    traj = tmp_path / "t.png"
    stdout = _run_cli(tmp_path, "render.py", [
        "--poses", str(p), "--out", str(gif), "--trajectories", str(traj),
    ])
    assert "12 frames" in stdout and "30 fps" in stdout
    assert gif.stat().st_size > 0 and traj.stat().st_size > 0
