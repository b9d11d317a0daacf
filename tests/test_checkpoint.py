"""Orbax checkpoint round-trip + self-describing bundle restore (SURVEY.md §4.7)."""

import jax
import numpy as np

from music2dance_tpu.audio import AudioConfig
from music2dance_tpu.ckpt import (
    configs_from_json,
    configs_to_json,
    restore_bundle,
    restore_checkpoint,
    save_checkpoint,
)
from music2dance_tpu.data.synthetic import synthetic_batch
from music2dance_tpu.models import JointLayout, tiny_gan
from music2dance_tpu.train import TrainConfig, init_state, make_train_step

LAYOUT = JointLayout(n_joints=5, joint_dim=3)
AUDIO = AudioConfig(sample_rate=8000, n_fft=256, win_length=256, hop_length=200,
                    n_mels=40, n_mfcc=13)
GAN = tiny_gan(feature_dim=AUDIO.n_mfcc, layout=LAYOUT)


def assert_trees_equal(a, b):
    for (pa, x), (_, y) in zip(
        jax.tree_util.tree_leaves_with_path(a),
        jax.tree_util.tree_leaves_with_path(b),
    ):
        if np.asarray(x).dtype == jax.numpy.uint32 or "rng" in jax.tree_util.keystr(pa):
            continue
        np.testing.assert_array_equal(
            np.asarray(x), np.asarray(y), err_msg=jax.tree_util.keystr(pa)
        )


def test_configs_json_round_trip():
    tc = TrainConfig(batch_size=8, tbptt_window=90)
    text = configs_to_json(GAN, AUDIO, tc)
    gan2, audio2, tc2 = configs_from_json(text)
    assert gan2 == GAN
    assert audio2 == AUDIO
    assert tc2 == tc


def test_state_round_trip(tmp_path):
    tc = TrainConfig(batch_size=4)
    batch = synthetic_batch(
        jax.random.key(0), 4, 0.5, AUDIO, LAYOUT, through_frontend=False
    )
    state = init_state(jax.random.key(1), GAN, tc, batch)
    # advance a couple of steps so optimizer state is non-trivial
    step = jax.jit(make_train_step(GAN, tc))
    state, _ = step(state, batch)
    state, _ = step(state, batch)

    path = str(tmp_path / "ckpt")
    save_checkpoint(path, state, GAN, AUDIO, tc)

    template = init_state(jax.random.key(9), GAN, tc, batch)
    restored = restore_checkpoint(path, template)
    assert int(restored.step) == int(state.step) == 2
    assert_trees_equal(state.g_params, restored.g_params)
    assert_trees_equal(state.d_params, restored.d_params)
    assert_trees_equal(state.opt_g, restored.opt_g)

    # training resumes identically from the restored state
    s_a, m_a = step(state, batch)
    s_b, m_b = step(restored, batch)
    np.testing.assert_allclose(float(m_a["d_loss"]), float(m_b["d_loss"]), rtol=1e-6)
    assert_trees_equal(s_a.g_params, s_b.g_params)


def test_bundle_restore_rebuilds_model(tmp_path):
    tc = TrainConfig(batch_size=4)
    batch = synthetic_batch(
        jax.random.key(0), 4, 0.5, AUDIO, LAYOUT, through_frontend=False
    )
    state = init_state(jax.random.key(1), GAN, tc, batch)
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, state, GAN, AUDIO, tc)

    gan2, audio2, state2 = restore_bundle(path)
    assert gan2 == GAN and audio2 == AUDIO
    assert_trees_equal(state.g_params, state2.g_params)

    from music2dance_tpu.infer import Music2DanceModel

    model = Music2DanceModel.from_checkpoint(path)
    wave = np.random.default_rng(0).standard_normal(AUDIO.num_samples(0.5)).astype(np.float32)
    poses = model.generate(wave, seed=1)
    assert poses.shape == (AUDIO.num_frames(len(wave)), LAYOUT.n_joints, LAYOUT.joint_dim)


def test_step_numbered_checkpoints_with_gc(tmp_path):
    from music2dance_tpu.ckpt.orbax_io import checkpoint_steps

    tc = TrainConfig(batch_size=4)
    batch = synthetic_batch(
        jax.random.key(0), 4, 0.5, AUDIO, LAYOUT, through_frontend=False
    )
    state = init_state(jax.random.key(1), GAN, tc, batch)
    step = jax.jit(make_train_step(GAN, tc))

    path = str(tmp_path / "managed")
    for i in range(5):
        state, _ = step(state, batch)
        save_checkpoint(path, state, GAN, AUDIO, tc, step=int(state.step), max_to_keep=3)

    steps = checkpoint_steps(path)
    assert steps == [3, 4, 5]  # oldest two garbage-collected

    template = init_state(jax.random.key(9), GAN, tc, batch)
    latest = restore_checkpoint(path, template)
    assert int(latest.step) == 5
    specific = restore_checkpoint(path, template, step=3)
    assert int(specific.step) == 3

    # restore_bundle picks up the managed latest too
    gan2, audio2, state2 = restore_bundle(path)
    assert int(state2.step) == 5


def test_async_checkpoint_writer(tmp_path):
    """CheckpointWriter: async saves land on disk, restore-by-latest and
    restore_bundle read them, GC keeps max_to_keep (VERDICT missing #4)."""
    from music2dance_tpu.ckpt.orbax_io import (
        CheckpointWriter,
        checkpoint_steps,
        restore_bundle,
        restore_checkpoint,
    )

    import jax.numpy as jnp

    tc = TrainConfig(batch_size=4, n_critic=1)
    batch = synthetic_batch(jax.random.key(0), 4, 0.5, AUDIO, LAYOUT,
                            through_frontend=False)
    state = init_state(jax.random.key(0), GAN, tc, batch)
    path = str(tmp_path / "async_ckpt")
    with CheckpointWriter(path, GAN, AUDIO, tc, max_to_keep=2) as w:
        for s in (1, 2, 3):
            w.save(s, state.replace(step=jnp.asarray(s, jnp.int32)))
    steps = checkpoint_steps(path)
    assert steps == [2, 3], steps  # GC kept the newest 2
    restored = restore_checkpoint(path, state)
    assert int(restored.step) == 3
    _gan, _audio, bundle_state = restore_bundle(path)
    assert int(bundle_state.step) == 3


def test_best_checkpoint_retention(tmp_path):
    """The best-by-eval-metric slot survives the latest-N GC (a GAN's best
    checkpoint is rarely its last — the 30k flagship run's eval_fmd minimum
    at step 20k was deleted by keep=3 before this slot existed)."""
    import jax.numpy as jnp
    import pytest

    from music2dance_tpu.ckpt.orbax_io import (
        CheckpointWriter,
        best_step_info,
        checkpoint_steps,
        restore_bundle,
        restore_checkpoint,
    )

    tc = TrainConfig(batch_size=4)
    batch = synthetic_batch(jax.random.key(0), 4, 0.5, AUDIO, LAYOUT,
                            through_frontend=False)
    state = init_state(jax.random.key(0), GAN, tc, batch)
    path = str(tmp_path / "best_ckpt")
    # fmd goes 5.0 -> 0.8 -> 0.2 (best) -> 0.9: the step-3 slot must win
    fmds = {1: 5.0, 2: 0.8, 3: 0.2, 4: 0.9}
    with CheckpointWriter(path, GAN, AUDIO, tc, max_to_keep=2,
                          best_metric="fmd") as w:
        for s, v in fmds.items():
            st = state.replace(step=jnp.asarray(s, jnp.int32))
            w.save(s, st)
            saved = w.maybe_save_best(s, st, {"fmd": v, "other": 0.0})
            assert saved == (v == min(list(fmds.values())[:s]))
    assert checkpoint_steps(path) == [3, 4]  # GC ate steps 1-2
    meta = best_step_info(path)
    assert meta == {"step": 3, "metric": "fmd", "value": 0.2}
    best = restore_checkpoint(path, state, step="best")
    assert int(best.step) == 3
    _g, _a, st_best = restore_bundle(path, step="best")
    assert int(st_best.step) == 3
    _g, _a, st_latest = restore_bundle(path, step="latest")
    assert int(st_latest.step) == 4

    # a resumed run keeps the running best: a worse value does NOT replace
    with CheckpointWriter(path, GAN, AUDIO, tc, max_to_keep=2,
                          best_metric="fmd") as w:
        assert not w.maybe_save_best(
            5, state.replace(step=jnp.asarray(5, jnp.int32)), {"fmd": 0.5})
        assert w.maybe_save_best(
            6, state.replace(step=jnp.asarray(6, jnp.int32)), {"fmd": 0.1})
    assert best_step_info(path)["step"] == 6

    # non-finite values never become "best"; missing key is a no-op
    with CheckpointWriter(path, GAN, AUDIO, tc, best_metric="fmd") as w:
        assert not w.maybe_save_best(7, state, {"fmd": float("nan")})
        assert not w.maybe_save_best(7, state, {"loss": 1.0})

    # a bundle without a best/ slot fails loudly on step="best"
    plain = str(tmp_path / "plain")
    with CheckpointWriter(plain, GAN, AUDIO, tc) as w:
        w.save(1, state)
    with pytest.raises(FileNotFoundError, match="best"):
        restore_checkpoint(plain, state, step="best")


def test_best_slot_max_mode(tmp_path):
    """best_mode='max' tracks the metric MAXIMUM — round-5 conditioning
    runs keep the beat_alignment peak (their late-phase divergence is the
    failure the slot must survive), while fidelity runs keep the fmd
    minimum (default)."""
    from music2dance_tpu.ckpt.orbax_io import (
        CheckpointWriter,
        best_step_info,
        restore_checkpoint,
    )

    import jax.numpy as jnp

    tc = TrainConfig(batch_size=4)
    batch = synthetic_batch(jax.random.key(0), 4, 0.5, AUDIO, LAYOUT,
                            through_frontend=False)
    state = init_state(jax.random.key(0), GAN, tc, batch)
    path = str(tmp_path / "best_max")
    vals = {1: 0.10, 2: 0.54, 3: 0.30, 4: 0.01}
    with CheckpointWriter(path, GAN, AUDIO, tc, max_to_keep=2,
                          best_metric="beat_alignment",
                          best_mode="max") as w:
        for s, v in vals.items():
            st = state.replace(step=jnp.asarray(s, jnp.int32))
            w.save(s, st)
            saved = w.maybe_save_best(s, st, {"beat_alignment": v})
            assert saved == (v == max(list(vals.values())[:s]))
    meta = best_step_info(path)
    assert meta == {"step": 2, "metric": "beat_alignment", "value": 0.54}
    best = restore_checkpoint(path, state, step="best")
    assert int(best.step) == 2


def test_best_fmd_gate():
    """tc.best_fmd_gate: evals above the fidelity gate are ineligible for
    the best slot — the moe_cond run's step-500 'alignment 0.395 at FMD
    7989' must not be captured."""
    from music2dance_tpu.train.loop import _best_eligible

    tc = TrainConfig(batch_size=4, best_fmd_gate=1.0)
    assert _best_eligible(tc, {"fmd": 0.3, "beat_alignment": 0.5})
    assert not _best_eligible(tc, {"fmd": 7989.0, "beat_alignment": 0.39})
    assert not _best_eligible(tc, {"fmd": float("nan")})
    assert not _best_eligible(tc, {"beat_alignment": 0.5})  # no fmd key
    # gate off: everything eligible
    assert _best_eligible(TrainConfig(batch_size=4), {"fmd": 1e9})
