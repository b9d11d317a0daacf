"""Round-3 fix regressions: dcore batch-alignment guard + fallback,
chunked-loop eval cadence rounding, loud non-WAV errors, odd PCM16 body
fallback, fused-envelope warnings (round-2 VERDICT weak #1/#3, ADVICE
medium #1 / low #5)."""

import json
import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from music2dance_tpu.audio import AudioConfig
from music2dance_tpu.data.synthetic import synthetic_batch
from music2dance_tpu.models import JointLayout, tiny_gan
from music2dance_tpu.train import TrainConfig, init_state, make_train_step

LAYOUT = JointLayout(n_joints=5, joint_dim=3)
AUDIO = AudioConfig(sample_rate=8000, n_fft=256, win_length=256, hop_length=200,
                    n_mels=40, n_mfcc=13)
GAN = tiny_gan(feature_dim=AUDIO.n_mfcc, layout=LAYOUT)


# ---------------------------------------------------------------------------
# dcore alignment guard (ADVICE medium)
# ---------------------------------------------------------------------------

def test_supports_d_core_alignment():
    from music2dance_tpu.ops.fused_dcore import supports_d_core

    # compiled lowering slices VMEM rows at 2B: needs b % 4 == 0. Use a
    # 128-aligned config so the hidden_dim envelope doesn't mask the guard.
    import dataclasses

    aligned = dataclasses.replace(GAN.discriminator, hidden_dim=128)
    assert supports_d_core(aligned, 8, interpret=False)
    assert not supports_d_core(aligned, 6, interpret=False)
    # interpret mode takes any size
    assert supports_d_core(GAN.discriminator, 6, interpret=True)


def test_dcore_fallback_matches_merged(monkeypatch):
    """When the merged kernel is rejected, the unmerged fused composition
    must produce the same training step (same math, one extra pass)."""
    tc = TrainConfig(batch_size=8, lambda_gp=10.0, n_critic=1)
    batch = synthetic_batch(jax.random.key(3), 8, 0.5, AUDIO, LAYOUT,
                            through_frontend=False)
    state = init_state(jax.random.key(0), GAN, tc, batch)

    step_merged = jax.jit(make_train_step(GAN, tc, fused=True))
    s1, m1 = step_merged(state, batch)

    import music2dance_tpu.ops.fused_dcore as dcore

    monkeypatch.setattr(dcore, "supports_d_core", lambda *a, **k: False)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        step_fb = jax.jit(make_train_step(GAN, tc, fused=True))
        s2, m2 = step_fb(state, batch)

    for k in m1:
        np.testing.assert_allclose(
            np.asarray(m1[k]), np.asarray(m2[k]), rtol=2e-4, atol=2e-5,
            err_msg=f"metric {k} diverges between merged and fallback",
        )
    for a, b in zip(jax.tree.leaves(s1.d_params), jax.tree.leaves(s2.d_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-5)


def test_dcore_fallback_warns(monkeypatch):
    import music2dance_tpu.ops.fused_dcore as dcore
    import music2dance_tpu.train.step as step_mod

    monkeypatch.setattr(dcore, "supports_d_core", lambda *a, **k: False)
    from music2dance_tpu.utils import warn as warn_mod

    monkeypatch.setattr(warn_mod, "_warned", set())  # fresh dedupe set
    tc = TrainConfig(batch_size=8, n_critic=1)
    batch = synthetic_batch(jax.random.key(3), 8, 0.5, AUDIO, LAYOUT,
                            through_frontend=False)
    state = init_state(jax.random.key(0), GAN, tc, batch)
    with pytest.warns(UserWarning, match="merged critic-phase kernel disabled"):
        jax.jit(make_train_step(GAN, tc, fused=True))(state, batch)


# ---------------------------------------------------------------------------
# chunked-loop eval/ckpt cadence (VERDICT weak #1)
# ---------------------------------------------------------------------------

def test_store_loop_eval_cadence_rounded(tmp_path):
    from music2dance_tpu.data.device_store import DeviceFeatureStore
    from music2dance_tpu.data.pipeline import SyntheticClipSource
    from music2dance_tpu.train.loop import train_from_store
    import music2dance_tpu.train.step as step_mod

    from music2dance_tpu.utils import warn as warn_mod

    warn_mod._warned.clear()
    src = SyntheticClipSource(6, 1.0, AUDIO, LAYOUT, seed=0)
    store = DeviceFeatureStore.from_source(src, AUDIO, frontend_impl="xla")
    tc = TrainConfig(batch_size=4, clip_seconds=10 / AUDIO.feature_rate,
                     log_every=4, eval_every=2, ckpt_every=1000)
    calls = []

    def evaluator(state):
        calls.append(int(state.step))
        return {"w": 1.0}

    with pytest.warns(UserWarning, match="rounding to 4"):
        train_from_store(
            GAN, tc, AUDIO, store, total_steps=8,
            log_dir=str(tmp_path / "logs"), evaluator=evaluator,
        )
    # eval_every=2 < chunk 4 -> effective cadence 4: exactly 2 evals
    assert calls == [4, 8]

    rows = [json.loads(l) for l in
            open(tmp_path / "logs" / "metrics.jsonl")]
    eval_steps = [r["step"] for r in rows if "eval_w" in r]
    assert eval_steps == [4, 8]
    # rows are step-ordered: the train row for step N precedes eval row N
    for n in eval_steps:
        idx_train = min(i for i, r in enumerate(rows)
                        if r["step"] == n and "d_loss" in r)
        idx_eval = min(i for i, r in enumerate(rows)
                       if r["step"] == n and "eval_w" in r)
        assert idx_train < idx_eval


def test_store_loop_exact_multiple_no_warning(tmp_path):
    from music2dance_tpu.data.device_store import DeviceFeatureStore
    from music2dance_tpu.data.pipeline import SyntheticClipSource
    from music2dance_tpu.train.loop import train_from_store
    import music2dance_tpu.train.step as step_mod

    from music2dance_tpu.utils import warn as warn_mod

    warn_mod._warned.clear()
    src = SyntheticClipSource(6, 1.0, AUDIO, LAYOUT, seed=0)
    store = DeviceFeatureStore.from_source(src, AUDIO, frontend_impl="xla")
    tc = TrainConfig(batch_size=4, clip_seconds=10 / AUDIO.feature_rate,
                     log_every=2, eval_every=4, ckpt_every=1000)
    calls = []
    with warnings.catch_warnings():
        warnings.simplefilter("error", UserWarning)
        train_from_store(GAN, tc, AUDIO, store, total_steps=4,
                         evaluator=lambda s: (calls.append(int(s.step)) or
                                              {"w": 0.0}))
    assert calls == [4]


# ---------------------------------------------------------------------------
# WAV decode edge cases (ADVICE low #5, VERDICT missing #4)
# ---------------------------------------------------------------------------

def _write_wav_pcm16(path, samples, sr=8000, extra_data_byte=False):
    import struct

    body = samples.astype("<i2").tobytes()
    if extra_data_byte:
        body += b"\x00"  # odd data-chunk length (truncated/corrupt file)
    fmt = struct.pack("<HHIIHH", 1, 1, sr, sr * 2, 2, 16)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(body)) + body
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks)


def test_pcm16_odd_body_falls_back(tmp_path):
    from music2dance_tpu.data.wav import load_wav_pcm16

    x = (np.sin(np.arange(800) * 0.05) * 20000).astype(np.int16)
    p = tmp_path / "odd.wav"
    _write_wav_pcm16(p, x, extra_data_byte=True)
    y, sr = load_wav_pcm16(str(p))  # must not raise from numpy frombuffer
    assert sr == 8000
    assert y.dtype in (np.int16, np.float32)
    got = y.astype(np.float32) / 32768.0 if y.dtype == np.int16 else y
    np.testing.assert_allclose(got[:800], x.astype(np.float32) / 32768.0,
                               atol=1e-4)


@pytest.mark.parametrize("magic", [
    # corrupt bodies of formats the loader now DECODES (MP3/OGG/AIFF
    # gained real decode paths after this test was first written): the
    # decoders must fail with a clean ValueError, not crash or hang
    b"ID3\x03\x00\x00\x00\x00\x00\x00rest",
    b"OggS\x00\x02" + b"\x00" * 20,
    b"FORM\x00\x00\x00\x20AIFF" + b"\x00" * 8,
])
def test_corrupt_supported_container_fails_cleanly(tmp_path, magic):
    from music2dance_tpu.data.wav import load_wav

    p = tmp_path / "song.bin"
    p.write_bytes(magic + b"\x00" * 64)
    with pytest.raises(ValueError):
        load_wav(str(p))


def test_unsupported_format_fails_loudly(tmp_path, monkeypatch):
    """A recognized format whose decoder is unavailable still gets the
    named-format + conversion-hint error (M4A with the libav shim
    monkeypatched away; with the shim present the file decodes — see
    tests/test_m4a.py)."""
    from music2dance_tpu.data import m4a as m4a_mod
    from music2dance_tpu.data.wav import load_wav

    monkeypatch.setattr(m4a_mod, "avdec_available", lambda: False)
    p = tmp_path / "song.bin"
    p.write_bytes(b"\x00\x00\x00\x20ftypM4A " + b"\x00" * 72)
    with pytest.raises(ValueError, match="M4A"):
        load_wav(str(p))
    with pytest.raises(ValueError, match="onvert"):
        load_wav(str(p))


# ---------------------------------------------------------------------------
# fused envelope reasons (VERDICT weak #3)
# ---------------------------------------------------------------------------

def test_why_not_fused_reasons():
    import dataclasses

    from music2dance_tpu.ops.fused_critic import why_not_fused_critic
    from music2dance_tpu.ops.fused_generator import why_not_fused

    g = GAN.generator
    assert why_not_fused(g, interpret=True) is None
    assert "hidden_dim" in why_not_fused(g, interpret=False)
    assert why_not_fused(
        dataclasses.replace(g, cell="lstm"), interpret=True
    ) is None  # LSTM kernels landed later in round 3
    d = GAN.discriminator
    assert why_not_fused_critic(d, interpret=True) is None
    assert "hidden_dim" in why_not_fused_critic(d, interpret=False)


# ---------------------------------------------------------------------------
# NaN guard (failure detection row)
# ---------------------------------------------------------------------------

def _poisoned_iter(audio, layout, batch=4):
    while True:
        b = synthetic_batch(jax.random.key(0), batch, 0.5, audio, layout,
                            through_frontend=False)
        yield {"feats": np.asarray(b["feats"]) * np.nan,
               "pose": np.asarray(b["poses"])}


def test_nan_guard_halts_and_checkpoints(tmp_path):
    from music2dance_tpu.train.loop import NonFiniteLossError, train

    tc = TrainConfig(batch_size=4, n_critic=1, log_every=1, ckpt_every=1000)
    it = ({"feats": np.full((4, 10, AUDIO.n_mfcc), np.nan, np.float32),
           "poses": np.zeros((4, 10, LAYOUT.pose_dim), np.float32)}
          for _ in range(100))
    with pytest.raises(NonFiniteLossError, match="non-finite"):
        train(GAN, tc, AUDIO, it, total_steps=10,
              ckpt_dir=str(tmp_path / "ck"), log_dir=str(tmp_path / "logs"))
    # the emergency checkpoint made it to disk
    from music2dance_tpu.ckpt.orbax_io import checkpoint_steps

    assert checkpoint_steps(str(tmp_path / "ck")), "no emergency checkpoint"


def test_nan_guard_off_keeps_running():
    import dataclasses

    from music2dance_tpu.train.loop import train

    tc = TrainConfig(batch_size=4, n_critic=1, log_every=1, nan_guard=False)
    it = ({"feats": np.full((4, 10, AUDIO.n_mfcc), np.nan, np.float32),
           "poses": np.zeros((4, 10, LAYOUT.pose_dim), np.float32)}
          for _ in range(100))
    state = train(GAN, tc, AUDIO, it, total_steps=3)
    assert int(state.step) == 3  # old behavior: trains on, no halt


def test_cosine_lr_schedule_trains():
    """lr_schedule='cosine' builds a decaying optimizer; a few steps run
    and the late-step update magnitude is smaller than the early one."""
    import dataclasses

    tc = TrainConfig(batch_size=4, n_critic=1, lr_schedule="cosine",
                     lr_decay_steps=10, lr_final_frac=0.0)
    batch = synthetic_batch(jax.random.key(0), 4, 0.5, AUDIO, LAYOUT,
                            through_frontend=False)
    state = init_state(jax.random.key(1), GAN, tc, batch)
    step = jax.jit(make_train_step(GAN, tc))

    def gnorm(a, b):
        return float(sum(np.linalg.norm(np.asarray(x) - np.asarray(y))
                         for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b))))

    s1, _ = step(state, batch)
    early = gnorm(s1.g_params, state.g_params)
    s = s1
    for _ in range(9):
        s, _ = step(s, batch)
    s_end, _ = step(s, batch)  # step 11: schedule has hit alpha=0
    late = gnorm(s_end.g_params, s.g_params)
    assert late < early * 0.2, (early, late)

    with pytest.raises(ValueError, match="lr_schedule"):
        make_train_step(GAN, dataclasses.replace(tc, lr_schedule="warmup"))


# ---------------------------------------------------------------------------
# Feature-matching auxiliary loss (MelGAN-style pattern, PAPERS.md)
# ---------------------------------------------------------------------------

def test_discriminator_return_features():
    from music2dance_tpu.models import Discriminator

    disc = Discriminator(GAN.discriminator)
    b = synthetic_batch(jax.random.key(0), 4, 0.5, AUDIO, LAYOUT,
                        through_frontend=False)
    params = disc.init(jax.random.key(1), b["poses"], b["feats"])
    score, feats_list = disc.apply(params, b["poses"], b["feats"],
                                   return_features=True)
    assert score.shape == (4,)
    assert len(feats_list) == GAN.discriminator.conv_layers
    for f in feats_list:
        assert f.shape[:2] == (4, b["poses"].shape[1])
    # with carry AND features: (score, carry, features)
    out = disc.apply(params, b["poses"], b["feats"], return_carry=True,
                     return_features=True)
    assert len(out) == 3


def test_feature_matching_loss_and_step():
    import dataclasses

    from music2dance_tpu.train.losses import feature_matching

    x = [jnp.ones((2, 5, 3)), jnp.zeros((2, 5, 4))]
    assert float(feature_matching(x, [a + 0.0 for a in x])) == 0.0
    assert float(feature_matching(x, [a + 1.0 for a in x])) == 1.0

    tc0 = TrainConfig(batch_size=4, n_critic=1)
    tc_fm = dataclasses.replace(tc0, feature_matching_weight=5.0)
    batch = synthetic_batch(jax.random.key(3), 4, 0.5, AUDIO, LAYOUT,
                            through_frontend=False)
    state = init_state(jax.random.key(0), GAN, tc0, batch)
    s0, m0 = jax.jit(make_train_step(GAN, tc0))(state, batch)
    s1, m1 = jax.jit(make_train_step(GAN, tc_fm))(state, batch)
    assert "fm" not in m0
    assert np.isfinite(float(m1["fm"])) and float(m1["fm"]) > 0.0
    # the aux loss changes the generator update (and only the generator:
    # the critic phase is untouched)
    g_same = all(np.allclose(np.asarray(a), np.asarray(b))
                 for a, b in zip(jax.tree.leaves(s0.g_params),
                                 jax.tree.leaves(s1.g_params)))
    d_same = all(np.allclose(np.asarray(a), np.asarray(b))
                 for a, b in zip(jax.tree.leaves(s0.d_params),
                                 jax.tree.leaves(s1.d_params)))
    assert not g_same and d_same


# ---------------------------------------------------------------------------
# EMA generator weights + grad clipping
# ---------------------------------------------------------------------------

def test_ema_updates_and_drives_eval(tmp_path):
    import dataclasses

    from music2dance_tpu.ckpt.orbax_io import CheckpointWriter, restore_bundle
    from music2dance_tpu.eval.evaluator import Evaluator

    tc = TrainConfig(batch_size=4, n_critic=1, ema_decay=0.9)
    batch = synthetic_batch(jax.random.key(3), 4, 0.5, AUDIO, LAYOUT,
                            through_frontend=False)
    state = init_state(jax.random.key(0), GAN, tc, batch)
    assert state.ema_g_params is not None
    step = jax.jit(make_train_step(GAN, tc))
    s1, _ = step(state, batch)
    # ema moved toward (but not onto) the new params: e1 = 0.9 e0 + 0.1 p1
    for e0, e1, p1 in zip(jax.tree.leaves(state.ema_g_params),
                          jax.tree.leaves(s1.ema_g_params),
                          jax.tree.leaves(s1.g_params)):
        np.testing.assert_allclose(np.asarray(e1),
                                   0.9 * np.asarray(e0) + 0.1 * np.asarray(p1),
                                   rtol=1e-5, atol=1e-6)

    # evaluator uses the EMA weights: metrics differ from a state with the
    # same g_params but no EMA
    ev = Evaluator(GAN, batch)
    with_ema = ev(s1)
    no_ema = ev(s1.replace(ema_g_params=None))
    assert with_ema["score_fake"] != no_ema["score_fake"]

    # checkpoint round-trips the EMA tree
    ckpt = tmp_path / "ck"
    w = CheckpointWriter(str(ckpt), GAN, AUDIO, tc)
    w.save(1, s1)
    w.close()
    _, _, restored = restore_bundle(str(ckpt))
    for a, b in zip(jax.tree.leaves(restored.ema_g_params),
                    jax.tree.leaves(s1.ema_g_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # disabled (default): no EMA tree, state structure unchanged
    s_off = init_state(jax.random.key(0), GAN, TrainConfig(batch_size=4), batch)
    assert s_off.ema_g_params is None


def test_grad_clip_bounds_update():
    import dataclasses

    tc0 = TrainConfig(batch_size=4, n_critic=1)
    tc_clip = dataclasses.replace(tc0, grad_clip_norm=1e-6)
    batch = synthetic_batch(jax.random.key(3), 4, 0.5, AUDIO, LAYOUT,
                            through_frontend=False)
    state = init_state(jax.random.key(0), GAN, tc0, batch)
    state_c = init_state(jax.random.key(0), GAN, tc_clip, batch)
    s0, _ = jax.jit(make_train_step(GAN, tc0))(state, batch)
    sc, _ = jax.jit(make_train_step(GAN, tc_clip))(state_c, batch)

    def total_delta(a, b):
        return sum(float(np.abs(np.asarray(x) - np.asarray(y)).sum())
                   for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)))

    # an absurdly small clip norm shrinks the raw gradient essentially to
    # zero; adam renormalizes per-parameter, so compare against unclipped
    assert total_delta(sc.g_params, state_c.g_params) < \
        total_delta(s0.g_params, state.g_params) * 1.5
    # and both stay finite
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree.leaves(sc.g_params))


# ---------------------------------------------------------------------------
# Multi-scale TCN critic (MelGAN-pattern ensemble)
# ---------------------------------------------------------------------------

def test_multi_scale_critic_trains_and_guards():
    import dataclasses

    from music2dance_tpu.models import Discriminator
    from music2dance_tpu.models.configs import GANConfig

    d_ms = dataclasses.replace(GAN.discriminator, rnn_layers=0, n_scales=3)
    gan_ms = GANConfig(generator=GAN.generator, discriminator=d_ms)
    tc = TrainConfig(batch_size=4, n_critic=1)
    batch = synthetic_batch(jax.random.key(3), 4, 0.8, AUDIO, LAYOUT,
                            through_frontend=False)
    state = init_state(jax.random.key(0), gan_ms, tc, batch)
    # per-scale parameters exist; scale 0 keeps the unprefixed names so
    # n_scales=1 checkpoints remain loadable
    p = state.d_params["params"]
    assert "conv_0" in p and "scale1_conv_0" in p and "scale2_conv_0" in p

    s1, m = jax.jit(make_train_step(gan_ms, tc))(state, batch)
    assert np.isfinite(float(m["d_loss"])) and float(m["gp"]) > 0.0
    # all scales learn (the GP + score losses reach every scale's params)
    for name in ("conv_0", "scale1_conv_0", "scale2_conv_0"):
        before = state.d_params["params"][name]["kernel"]
        after = s1.d_params["params"][name]["kernel"]
        assert not np.allclose(np.asarray(before), np.asarray(after)), name

    # recurrent multi-scale is rejected loudly
    bad = dataclasses.replace(GAN.discriminator, rnn_layers=1, n_scales=2)
    disc = Discriminator(bad)
    with pytest.raises(ValueError, match="TCN"):
        disc.init(jax.random.key(0), batch["poses"], batch["feats"])
