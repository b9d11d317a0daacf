"""Online inference parity: StreamingSession / StreamingFeatureExtractor /
Music2DanceModel.stream() vs the offline whole-song pass.

The load-bearing contracts (infer/streaming.py):
- session outputs equal Generator.apply for ANY chunking, including conv
  encoders with kernel > 1 (odd and even) where the naive
  streaming_decode_step is inexact;
- the extractor's framing (left reflect pad, n_fft//2 lookahead, tail
  reflect on flush) matches offline exactly under frozen stats;
- "running" stats are causal and chunking-invariant.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from music2dance_tpu.audio import AudioConfig, extract_features
from music2dance_tpu.infer.streaming import (
    FrontendStats,
    StreamingFeatureExtractor,
    StreamingSession,
)
from music2dance_tpu.models import Generator
from music2dance_tpu.models.configs import GeneratorConfig, JointLayout

LAYOUT = JointLayout()


def _cfg(**kw):
    base = dict(
        layout=LAYOUT, feature_dim=20, noise_dim=8, enc_dim=16,
        enc_layers=2, enc_kernel=5, hidden_dim=32, rnn_layers=2,
        head_hidden=16,
    )
    base.update(kw)
    return GeneratorConfig(**base)


def _setup(cfg, b=1, t=23, seed=0):
    gen = Generator(cfg)
    feats = jax.random.normal(jax.random.key(seed), (b, t, cfg.feature_dim))
    z = jax.random.normal(jax.random.key(seed + 1), (b, cfg.noise_dim))
    params = gen.init(jax.random.key(seed + 2), feats, z)
    full = gen.apply(params, feats, z).reshape(
        b, t, LAYOUT.n_joints, LAYOUT.joint_dim)
    return params, feats, z, np.asarray(full)


@pytest.mark.parametrize("enc_kernel", [1, 5, 4])
@pytest.mark.parametrize("chunk", [1, 4, 7, 23])
def test_session_equals_offline_any_chunking(enc_kernel, chunk):
    cfg = _cfg(enc_kernel=enc_kernel)
    params, feats, z, full = _setup(cfg, t=23)
    sess = StreamingSession(params, cfg, z)
    out = []
    for i in range(0, 23, chunk):
        out.append(sess.feed(feats[:, i:i + chunk]))
    out.append(sess.flush())
    streamed = np.concatenate(out, axis=1)
    assert streamed.shape == full.shape
    np.testing.assert_allclose(streamed, full, rtol=1e-5, atol=1e-5)


def test_session_lstm_cell():
    """The session is cell-generic (carry built by generator_init_carry)."""
    cfg = _cfg(cell="lstm")
    params, feats, z, full = _setup(cfg, t=15)
    sess = StreamingSession(params, cfg, z)
    streamed = np.concatenate(
        [sess.feed(feats[:, :6]), sess.feed(feats[:, 6:]), sess.flush()],
        axis=1)
    np.testing.assert_allclose(streamed, full, rtol=1e-5, atol=1e-5)


def test_session_batch_and_2d_chunks():
    cfg = _cfg()
    params, feats, z, full = _setup(cfg, b=3, t=17)
    sess = StreamingSession(params, cfg, z)
    streamed = np.concatenate(
        [sess.feed(feats[:, :9]), sess.feed(feats[:, 9:]), sess.flush()],
        axis=1)
    np.testing.assert_allclose(streamed, full, rtol=1e-5, atol=1e-5)

    # batch-1 sessions accept [Tc, F] chunks
    params1, feats1, z1, full1 = _setup(cfg, b=1, t=8, seed=7)
    s1 = StreamingSession(params1, cfg, z1)
    got = np.concatenate([s1.feed(np.asarray(feats1[0])), s1.flush()], axis=1)
    np.testing.assert_allclose(got, full1, rtol=1e-5, atol=1e-5)

    with pytest.raises(ValueError, match="feature chunk"):
        StreamingSession(params, cfg, z).feed(np.zeros((3, 4, 99)))
    s = StreamingSession(params, cfg, z)
    s.flush()
    with pytest.raises(RuntimeError, match="flushed"):
        s.feed(feats[:, :2])


def test_naive_chunking_is_inexact_for_wide_kernels():
    """The gap this module closes: applying the generator per chunk (the
    streaming_decode_step contract) diverges at chunk boundaries once the
    encoder kernel spans them."""
    cfg = _cfg(enc_kernel=5)
    params, feats, z, full = _setup(cfg, t=16)
    gen = Generator(cfg)
    carry = gen.init_carry(1)
    naive = []
    for i in range(0, 16, 4):
        out, carry = gen.apply(params, feats[:, i:i + 4], z, carry=carry,
                               return_carry=True)
        naive.append(np.asarray(out).reshape(1, 4, LAYOUT.n_joints,
                                             LAYOUT.joint_dim))
    naive = np.concatenate(naive, axis=1)
    assert np.abs(naive - full).max() > 1e-4


AUDIO = AudioConfig()


def _wave(n, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / AUDIO.sample_rate
    return (0.5 * np.sin(2 * np.pi * 440 * t)
            + 0.1 * rng.standard_normal(n)).astype(np.float32)


@pytest.mark.parametrize("chunk", [160, 735, 5000])
def test_extractor_frozen_stats_matches_offline(chunk):
    wave = _wave(AUDIO.num_samples(1.5))
    offline = np.asarray(extract_features(jnp.asarray(wave), AUDIO))
    ex = StreamingFeatureExtractor(AUDIO,
                                   stats=FrontendStats.from_waveform(wave, AUDIO))
    rows = [ex.feed(wave[i:i + chunk]) for i in range(0, len(wave), chunk)]
    rows.append(ex.flush())
    streamed = np.concatenate(rows, axis=0)
    assert streamed.shape == offline.shape
    np.testing.assert_allclose(streamed, offline, rtol=1e-4, atol=1e-4)


def test_extractor_none_stats_matches_unnormalized_offline():
    cfg = dataclasses.replace(AUDIO, normalize=False, top_db=None)
    wave = _wave(AUDIO.num_samples(0.7), seed=3)
    offline = np.asarray(extract_features(jnp.asarray(wave), cfg))
    ex = StreamingFeatureExtractor(cfg, stats="none")
    streamed = np.concatenate([ex.feed(wave), ex.flush()], axis=0)
    np.testing.assert_allclose(streamed, offline, rtol=1e-4, atol=1e-4)


def test_extractor_running_stats_chunking_invariant_and_converges():
    wave = _wave(AUDIO.num_samples(2.0), seed=5)
    outs = []
    for chunk in (513, 2048):
        ex = StreamingFeatureExtractor(AUDIO, stats="running")
        rows = [ex.feed(wave[i:i + chunk]) for i in range(0, len(wave), chunk)]
        rows.append(ex.flush())
        outs.append(np.concatenate(rows, axis=0))
    # invariant up to f32 rounding (different chunk sizes hit different
    # BLAS accumulation orders in the frame matmuls)
    np.testing.assert_allclose(outs[0], outs[1], rtol=2e-3, atol=1e-4)
    # late frames approach the offline (whole-clip stats) features
    offline = np.asarray(extract_features(jnp.asarray(wave), AUDIO))
    late = slice(offline.shape[0] // 2, None)
    err_late = np.abs(outs[0][late] - offline[late]).mean()
    err_early = np.abs(outs[0][:5] - offline[:5]).mean()
    assert err_late < err_early


def test_extractor_short_stream_flush_only():
    """A stream shorter than the n_fft//2 left padding still matches.

    Compared un-normalized: this pins the flush-only FRAMING path, and a
    1-frame clip is degenerate under per-clip normalization (var == 0, so
    offline normalizes to exactly 0 and rsqrt(eps) amplifies streamed f32
    rounding by 1e4 — no framing information in that comparison)."""
    cfg = dataclasses.replace(AUDIO, normalize=False, top_db=None)
    wave = _wave(AUDIO.n_fft // 2 - 10, seed=9)
    offline = np.asarray(extract_features(jnp.asarray(wave), cfg))
    ex = StreamingFeatureExtractor(cfg, stats="none")
    assert ex.feed(wave).shape[0] == 0
    streamed = ex.flush()
    assert streamed.shape == offline.shape == (1, cfg.n_features)
    np.testing.assert_allclose(streamed, offline, rtol=1e-4, atol=1e-4)


def test_model_stream_matches_generate_with_frozen_stats():
    """End to end: Music2DanceModel.stream() == .generate() (same seed,
    stats frozen from the song)."""
    from music2dance_tpu.infer import Music2DanceModel
    from music2dance_tpu.models import GANConfig, tiny_gan

    gan = tiny_gan(feature_dim=AUDIO.n_features)
    gen = Generator(gan.generator)
    wave = _wave(AUDIO.num_samples(1.0), seed=11)
    feats = extract_features(jnp.asarray(wave), AUDIO)
    z = jax.random.normal(jax.random.key(0), (1, gan.generator.noise_dim))
    params = gen.init(jax.random.key(1), feats[None], z)
    model = Music2DanceModel(gan, AUDIO, params)

    offline = model.generate(wave, seed=4)
    sg = model.stream(seed=4, stats=FrontendStats.from_waveform(wave, AUDIO))
    chunks = [sg.feed(wave[i:i + 3000]) for i in range(0, len(wave), 3000)]
    chunks.append(sg.flush())
    streamed = np.concatenate(chunks, axis=0)
    assert streamed.shape == offline.shape
    np.testing.assert_allclose(streamed, offline, rtol=1e-3, atol=1e-3)


def test_frontend_stats_corpus_and_json_roundtrip():
    """from_corpus on one clip == from_waveform; JSON survives exactly."""
    wave = _wave(AUDIO.num_samples(1.0), seed=13)
    one = FrontendStats.from_waveform(wave, AUDIO)
    corp = FrontendStats.from_corpus([wave], AUDIO)
    np.testing.assert_allclose(corp.mean, one.mean, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(corp.var, one.var, rtol=1e-3, atol=1e-4)
    assert abs(corp.peak_db - one.peak_db) < 1e-3

    back = FrontendStats.from_json(corp.to_json())
    np.testing.assert_array_equal(back.mean, corp.mean)
    np.testing.assert_array_equal(back.var, corp.var)
    assert back.peak_db == corp.peak_db

    # pooled over two clips: moments lie between the per-clip ones
    w2 = _wave(AUDIO.num_samples(0.6), seed=14) * 0.2
    pooled = FrontendStats.from_corpus([wave, w2], AUDIO)
    assert pooled.peak_db == pytest.approx(max(
        FrontendStats.from_waveform(wave, AUDIO).peak_db,
        FrontendStats.from_waveform(w2, AUDIO).peak_db), abs=1e-4)
    with pytest.raises(ValueError, match="at least one"):
        FrontendStats.from_corpus([], AUDIO)


def test_extractor_frozen_corpus_stats_runs():
    """Streaming under corpus stats: deterministic, chunking-invariant."""
    waves = [_wave(AUDIO.num_samples(0.8), seed=s) for s in (20, 21)]
    stats = FrontendStats.from_corpus(waves, AUDIO)
    outs = []
    for chunk in (700, 3000):
        ex = StreamingFeatureExtractor(AUDIO, stats=stats)
        rows = [ex.feed(waves[0][i:i + chunk])
                for i in range(0, len(waves[0]), chunk)]
        rows.append(ex.flush())
        outs.append(np.concatenate(rows, axis=0))
    np.testing.assert_allclose(outs[0], outs[1], rtol=2e-3, atol=1e-4)
    assert np.isfinite(outs[0]).all()


@pytest.mark.parametrize("cell", ["gru", "lstm"])
def test_session_fused_impl_matches_offline(cell):
    """impl='fused' (kernel bank scan, interpret mode on CPU) streams the
    same poses as the offline pass — the TPU multi-stream serving path."""
    cfg = _cfg(cell=cell)
    params, feats, z, full = _setup(cfg, b=2, t=14)
    sess = StreamingSession(params, cfg, z, impl="fused")
    streamed = np.concatenate(
        [sess.feed(feats[:, :5]), sess.feed(feats[:, 5:]), sess.flush()],
        axis=1)
    np.testing.assert_allclose(streamed, full, rtol=1e-5, atol=1e-5)

    with pytest.raises(ValueError, match="impl"):
        StreamingSession(params, cfg, z, impl="nope")
    with pytest.raises(ValueError, match="fused"):
        StreamingSession(params, _cfg(autoregressive=False), z, impl="fused")


@pytest.mark.parametrize("impl", ["xla", "fused"])
def test_execute_plans_matches_solo_sessions(impl):
    """The multi-stream fast path: N sessions' plans run as ONE lockstep
    call (+ inert pad rows) == each session running alone."""
    from music2dance_tpu.infer.streaming import execute_plans

    cfg = _cfg()
    params, feats0, _, _ = _setup(cfg, t=12)
    n = 3
    streams = [np.asarray(jax.random.normal(
        jax.random.key(40 + i), (1, 12, cfg.feature_dim))) for i in range(n)]
    zs = [jax.random.normal(jax.random.key(60 + i), (1, cfg.noise_dim))
          for i in range(n)]

    solo = []
    for fs, z in zip(streams, zs):
        s = StreamingSession(params, cfg, z, impl=impl)
        solo.append(np.concatenate(
            [s.feed(fs[:, :6]), s.feed(fs[:, 6:]), s.flush()], axis=1))

    batched_sessions = [StreamingSession(params, cfg, z, impl=impl)
                        for z in zs]
    outs = [[] for _ in range(n)]
    for lo, hi in ((0, 6), (6, 12)):
        plans = [s.plan_feed(fs[:, lo:hi])
                 for s, fs in zip(batched_sessions, streams)]
        assert all(p is not None and p.key() == plans[0].key()
                   for p in plans)
        results = execute_plans(params, cfg, plans, pad_to=4)  # 1 pad row
        for s, p, (poses, carry), acc in zip(
                batched_sessions, plans, results, outs):
            acc.append(s.apply(p, poses, carry))
    for s, acc in zip(batched_sessions, outs):
        acc.append(s.flush())  # flush runs solo (rare, not coalesced)
    for i in range(n):
        np.testing.assert_allclose(
            np.concatenate(outs[i], axis=1), solo[i], rtol=1e-5, atol=1e-5)

    # incompatible plans are rejected
    from music2dance_tpu.infer.streaming import EmitPlan

    s1 = StreamingSession(params, cfg, zs[0], impl=impl)
    s2 = StreamingSession(params, cfg, zs[1], impl=impl)
    p1 = s1.plan_feed(streams[0][:, :6])
    p2 = s2.plan_feed(streams[1][:, :9])
    with pytest.raises(ValueError, match="share key"):
        execute_plans(params, cfg, [p1, p2])
