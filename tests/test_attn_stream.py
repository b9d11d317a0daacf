"""KV-cache streaming decode for the attention family (infer/attn_stream).

The round-3 framework gated streaming to arch='rnn'; the transformer
generator is causal by construction, so its chunked incremental decode
must equal the offline whole-clip pass for ANY chunking (same contract,
and same test discipline, as the recurrent StreamingSession in
tests/test_streaming.py). Tolerances are reduction-order noise between
differently-shaped XLA programs, not algorithmic drift.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from music2dance_tpu.audio import AudioConfig
from music2dance_tpu.models import JointLayout, build_generator, transformer_gan
from music2dance_tpu.infer.streaming import make_streaming_session

LAYOUT = JointLayout(n_joints=5, joint_dim=3)
AUDIO = AudioConfig(sample_rate=8000, n_fft=256, win_length=256, hop_length=200,
                    n_mels=40, n_mfcc=13)
TOL = dict(rtol=2e-4, atol=2e-4)


def _tiny_attn_cfg(**over):
    gan = transformer_gan(feature_dim=AUDIO.n_mfcc, layout=LAYOUT)
    return dataclasses.replace(
        gan.generator, hidden_dim=64, head_hidden=32, tr_blocks=2,
        tr_heads=4, enc_dim=32, noise_dim=8, **over,
    )


def _init(cfg, b=1, t=24, seed=0):
    gen = build_generator(cfg)
    feats = jax.random.normal(jax.random.key(seed), (b, t, cfg.feature_dim))
    z = jax.random.normal(jax.random.key(seed + 1), (b, cfg.noise_dim))
    params = gen.init(jax.random.key(seed + 2), feats, z)
    return gen, params, np.asarray(feats), z


@pytest.mark.parametrize("chunks", [
    [24],                      # whole clip in one feed
    [1] * 24,                  # frame by frame
    [7, 3, 11, 2, 1],          # ragged
    [5, 5, 5, 5, 4],           # constant-ish
])
@pytest.mark.parametrize("residual", [True, False])
def test_stream_matches_offline(chunks, residual):
    cfg = _tiny_attn_cfg(residual_pose=residual)
    gen, params, feats, z = _init(cfg, t=sum(chunks))
    offline = np.asarray(gen.apply(params, jnp.asarray(feats), z))

    sess = make_streaming_session(params, cfg, z, max_frames=64)
    out, start = [], 0
    for c in chunks:
        out.append(sess.feed(feats[:, start:start + c]))
        start += c
    out.append(sess.flush())
    streamed = np.concatenate(out, axis=1)[0]
    assert streamed.shape[0] == sum(chunks)
    np.testing.assert_allclose(
        streamed.reshape(sum(chunks), -1), offline[0], **TOL)


def test_stream_matches_offline_batched_rows():
    """A single session carrying B > 1 rows (distinct z per row)."""
    cfg = _tiny_attn_cfg()
    gen, params, feats, z = _init(cfg, b=3, t=20, seed=5)
    offline = np.asarray(gen.apply(params, jnp.asarray(feats), z))
    sess = make_streaming_session(params, cfg, z, max_frames=32)
    out = [sess.feed(feats[:, :9]), sess.feed(feats[:, 9:]), sess.flush()]
    streamed = np.concatenate(out, axis=1)
    np.testing.assert_allclose(
        streamed.reshape(3, 20, -1), offline, **TOL)


def test_factory_dispatches_on_arch():
    from music2dance_tpu.infer.attn_stream import TransformerStreamingSession
    from music2dance_tpu.infer.streaming import StreamingSession
    from music2dance_tpu.models import tiny_gan

    cfg = _tiny_attn_cfg()
    _, params, _, z = _init(cfg)
    assert isinstance(make_streaming_session(params, cfg, z),
                      TransformerStreamingSession)

    rnn = tiny_gan(feature_dim=AUDIO.n_mfcc, layout=LAYOUT).generator
    gen = build_generator(rnn)
    feats = jnp.zeros((1, 8, rnn.feature_dim))
    zr = jnp.zeros((1, rnn.noise_dim))
    rp = gen.init(jax.random.key(0), feats, zr)
    assert isinstance(make_streaming_session(rp, rnn, zr), StreamingSession)

    # the direct constructors stay loud about the wrong family
    with pytest.raises(ValueError, match="make_streaming_session"):
        StreamingSession(params, cfg, z)
    with pytest.raises(ValueError, match="make_streaming_session"):
        TransformerStreamingSession(rp, rnn, zr)


def test_moe_generator_gated_loudly():
    cfg = _tiny_attn_cfg(moe_experts=4)
    with pytest.raises(ValueError, match="capacity"):
        make_streaming_session({}, cfg, jnp.zeros((1, cfg.noise_dim)))


def test_kv_capacity_exceeded_is_loud():
    cfg = _tiny_attn_cfg()
    _, params, feats, z = _init(cfg, t=24)
    sess = make_streaming_session(params, cfg, z, max_frames=8)
    with pytest.raises(ValueError, match="max_frames"):
        sess.feed(feats)  # 24 frames > capacity 8


def test_execute_plans_lockstep_matches_solo():
    """Concurrent transformer streams at DIFFERENT positions coalesce
    into one device call (the serving fast path) with the same results
    as each session running alone."""
    from music2dance_tpu.infer.streaming import execute_plans

    cfg = _tiny_attn_cfg()
    gen, params, feats, z0 = _init(cfg, t=30, seed=7)
    z1 = jax.random.normal(jax.random.key(99), (1, cfg.noise_dim))
    offline0 = np.asarray(gen.apply(params, jnp.asarray(feats), z0))[0]

    # session A is one chunk ahead of session B; both then feed the same
    # chunk SIZE, so their plans share key() despite different frame
    # counters
    a = make_streaming_session(params, cfg, z0, max_frames=64)
    b = make_streaming_session(params, cfg, z1, max_frames=64)
    a.feed(feats[:, :6])
    a.feed(feats[:, 6:12])
    a.feed(feats[:, 12:18])
    b.feed(feats[:, :6])
    b.feed(feats[:, 6:12])
    pa = a.plan_feed(feats[:, 18:24])
    pb = b.plan_feed(feats[:, 12:18])
    assert pa is not None and pb is not None and pa.key() == pb.key()
    results = execute_plans(params, cfg, [pa, pb], pad_to=4)
    out_a = a.apply(pa, *results[0])
    b.apply(pb, *results[1])

    # session A's coalesced emit equals the offline decode of its stream
    done = a.frames_emitted
    np.testing.assert_allclose(
        out_a[0].reshape(out_a.shape[1], -1),
        offline0[done - out_a.shape[1]:done], **TOL)


def test_http_stream_on_transformer_checkpoint():
    """/stream/{open,feed,close} on an attention-family model, with the
    coalescer ON (stream_wait_ms > 0) so the serving path runs
    execute_attn_plans — the round-3 gap: transformer models were
    excluded from the serving stack's stream sessions."""
    import io
    import json
    import urllib.request

    from music2dance_tpu.audio import extract_features
    from music2dance_tpu.infer.api import Music2DanceModel
    from music2dance_tpu.infer.decode import decode_poses
    from music2dance_tpu.infer.serving import InferenceServer, ServingConfig

    cfg = _tiny_attn_cfg()
    gan = dataclasses.replace(
        transformer_gan(feature_dim=AUDIO.n_mfcc, layout=LAYOUT),
        generator=cfg)
    gen = build_generator(cfg)
    params = gen.init(jax.random.key(3), jnp.zeros((1, 4, cfg.feature_dim)),
                      jnp.zeros((1, cfg.noise_dim)))
    model = Music2DanceModel(gan, AUDIO, params)
    server = InferenceServer(model, ServingConfig(
        max_batch=4, max_wait_ms=30.0, bucket_seconds=0.5, max_seconds=2.0,
        stream_wait_ms=5.0)).start()
    try:
        host, port = server.address

        def post(path, data=b""):
            req = urllib.request.Request(
                f"http://{host}:{port}{path}", data=data, method="POST")
            return urllib.request.urlopen(req, timeout=120)

        with post("/stream/open?seed=3&stats=none") as resp:
            sid = json.loads(resp.read())["session"]
        rng = np.random.default_rng(21)
        w = rng.standard_normal(AUDIO.sample_rate // 2).astype(np.float32)
        chunks = []
        for i in range(0, len(w), 800):
            with post(f"/stream/feed?session={sid}&dtype=float32",
                      w[i:i + 800].astype("<f4").tobytes()) as resp:
                chunks.append(np.load(io.BytesIO(resp.read())))
        with post(f"/stream/close?session={sid}") as resp:
            chunks.append(np.load(io.BytesIO(resp.read())))
        poses = np.concatenate([c for c in chunks if len(c)], axis=0)
        t = 1 + len(w) // AUDIO.hop_length
        assert poses.shape == (t, LAYOUT.n_joints, LAYOUT.joint_dim)

        cfg_none = dataclasses.replace(AUDIO, normalize=False, top_db=None)
        feats = extract_features(jnp.asarray(w), cfg_none)
        want = np.asarray(decode_poses(
            model.g_params, cfg, feats[None], jax.random.key(3))[0])
        np.testing.assert_allclose(poses, want, rtol=1e-3, atol=1e-3)
    finally:
        server.close()


def test_streaming_generator_end_to_end_matches_generate():
    """Waveform-in pose-out via Music2DanceModel.stream() on a
    transformer model: with stats frozen from the same song the streamed
    poses equal the offline generate() (seed parity included)."""
    from music2dance_tpu.infer.api import Music2DanceModel
    from music2dance_tpu.infer.streaming import FrontendStats

    cfg = _tiny_attn_cfg()
    gan = dataclasses.replace(
        transformer_gan(feature_dim=AUDIO.n_mfcc, layout=LAYOUT),
        generator=cfg)
    gen = build_generator(cfg)
    feats0 = jnp.zeros((1, 4, cfg.feature_dim))
    params = gen.init(jax.random.key(3), feats0, jnp.zeros((1, cfg.noise_dim)))

    rng = np.random.default_rng(0)
    wave = rng.standard_normal(AUDIO.sample_rate).astype(np.float32) * 0.3
    model = Music2DanceModel(gan, AUDIO, params)
    offline = model.generate(wave, seed=11)

    sg = model.stream(seed=11, stats=FrontendStats.from_waveform(wave, AUDIO))
    chunks = np.array_split(wave, 7)
    out = [sg.feed(c) for c in chunks] + [sg.flush()]
    streamed = np.concatenate(out, axis=0)
    assert streamed.shape == offline.shape
    np.testing.assert_allclose(streamed, offline, **TOL)
