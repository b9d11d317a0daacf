"""Conditioning levers (train/conditioning.py): mismatch critic term +
beat-alignment auxiliary — the round-3 VERDICT's weak #1 closure.

The levers must (a) measure what they claim — the onset proxy tracks the
eval metric's onset envelope on real audio and the beat loss prefers
aligned motion; (b) integrate exactly — fused and XLA step paths agree,
weights=0 reproduces the unlevered step; (c) stay loud where the math
breaks (unconditional critic, grad_accum pairing, TBPTT carries).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from music2dance_tpu.audio import AudioConfig, extract_features
from music2dance_tpu.data.synthetic import synthetic_batch
from music2dance_tpu.eval.metrics import onset_envelope
from music2dance_tpu.models import JointLayout, tiny_gan
from music2dance_tpu.train import TrainConfig, init_state, make_train_step
from music2dance_tpu.train.conditioning import (
    beat_alignment_loss,
    mismatch_pairs,
    onset_proxy_from_feats,
)

LAYOUT = JointLayout(n_joints=4, joint_dim=3)
AUDIO = AudioConfig(sample_rate=8000, n_fft=256, win_length=256,
                    hop_length=200, n_mels=40, n_mfcc=13)


def _click_track(seconds=4.0, period=0.5, sr=8000, seed=0):
    """Clicks every `period` seconds over noise — strong, known onsets."""
    n = int(seconds * sr)
    rng = np.random.default_rng(seed)
    w = 0.01 * rng.standard_normal(n).astype(np.float32)
    for t0 in np.arange(0.0, seconds, period):
        i = int(t0 * sr)
        w[i:i + 200] += np.sin(2 * np.pi * 440 * np.arange(200) / sr) * 0.8
    return w


def test_onset_proxy_tracks_eval_onset_envelope():
    """The MFCC-c0 proxy and the eval metric's log-mel-flux onset must
    agree on real audio — that agreement is what licenses training
    against the proxy while judging on the metric."""
    w = jnp.asarray(_click_track())[None]
    eval_onset = np.asarray(onset_envelope(w, AUDIO))[0]
    feats = extract_features(w[0], AUDIO)[None]
    proxy = np.asarray(onset_proxy_from_feats(feats))[0]
    t = min(len(eval_onset), len(proxy))
    corr = np.corrcoef(eval_onset[:t], proxy[:t])[0, 1]
    assert corr > 0.8, f"onset proxy decorrelated from eval onset: {corr}"


def test_beat_loss_prefers_aligned_motion():
    """Motion that pauses exactly on the clicks must score a lower
    (better) beat loss than the same motion shifted off-beat by half a
    period, and than constant-speed motion."""
    w = jnp.asarray(_click_track())[None]
    feats = extract_features(w[0], AUDIO)[None]
    t = feats.shape[1]
    proxy = np.asarray(onset_proxy_from_feats(feats))[0]

    # speed dips where the proxy spikes -> aligned; rolled -> misaligned
    speed_aligned = 1.0 - 0.9 * (proxy > 1.0).astype(np.float32)
    speed_off = np.roll(speed_aligned, t // 8)

    def poses_from_speed(speed):
        # one coordinate walks at the prescribed per-frame speed
        p = np.zeros((1, t, LAYOUT.pose_dim), np.float32)
        p[0, :, 0] = np.concatenate([[0.0], np.cumsum(speed[1:])])
        return jnp.asarray(p)

    aligned = float(beat_alignment_loss(poses_from_speed(speed_aligned), feats))
    off = float(beat_alignment_loss(poses_from_speed(speed_off), feats))
    flat = float(beat_alignment_loss(poses_from_speed(np.ones(t, np.float32)),
                                     feats))
    assert aligned < off, (aligned, off)
    assert aligned < flat, (aligned, flat)
    assert aligned < -0.3  # strongly aligned, not just relatively


def test_mismatch_pairs_roll():
    f = jnp.arange(12.0).reshape(3, 2, 2)
    m = mismatch_pairs(f)
    np.testing.assert_array_equal(np.asarray(m[0]), np.asarray(f[2]))
    np.testing.assert_array_equal(np.asarray(m[1]), np.asarray(f[0]))


def _tiny():
    return tiny_gan(feature_dim=AUDIO.n_mfcc, layout=LAYOUT)


def _batch(b=4, seconds=0.5, seed=0):
    return synthetic_batch(jax.random.key(seed), b, seconds, AUDIO, LAYOUT,
                           through_frontend=False)


def test_step_with_levers_runs_and_reports():
    gan = _tiny()
    tc = TrainConfig(batch_size=4, mismatch_weight=0.5, beat_loss_weight=0.2)
    batch = _batch()
    state = init_state(jax.random.key(1), gan, tc, batch)
    step = jax.jit(make_train_step(gan, tc))
    state, m = step(state, batch)
    state, m = step(state, batch)
    assert "mismatch_gap" in m and "beat_loss" in m
    assert all(bool(jnp.isfinite(v)) for v in m.values())
    assert int(state.step) == 2


def test_levers_off_reproduce_plain_step():
    """weights=0 must be the byte-identical step (no hidden extra pass)."""
    gan = _tiny()
    batch = _batch()
    outs = {}
    for name, tc in [("plain", TrainConfig(batch_size=4)),
                     ("zeroed", TrainConfig(batch_size=4, mismatch_weight=0.0,
                                            beat_loss_weight=0.0))]:
        state = init_state(jax.random.key(1), gan, tc, batch)
        state, m = jax.jit(make_train_step(gan, tc))(state, batch)
        outs[name] = (m, state)
    assert set(outs["plain"][0]) == set(outs["zeroed"][0])
    for k in outs["plain"][0]:
        assert float(outs["plain"][0][k]) == float(outs["zeroed"][0][k])


def test_fused_and_xla_paths_agree_on_levers():
    """The mismatch term rides critic_scores, which routes to the fused
    critic kernel when available — interpret-mode fused vs pure-XLA step
    must produce the same metrics (same discipline as test_fused_*)."""
    gan = _tiny()
    tc = TrainConfig(batch_size=4, mismatch_weight=0.5, beat_loss_weight=0.2)
    batch = _batch()
    metrics = {}
    for name, fused in [("xla", False), ("fused", True)]:
        state = init_state(jax.random.key(1), gan, tc, batch)
        step = jax.jit(make_train_step(gan, tc, fused=fused))
        state, _ = step(state, batch)
        _, m = step(state, batch)
        metrics[name] = m
    for k in metrics["xla"]:
        np.testing.assert_allclose(
            float(metrics["fused"][k]), float(metrics["xla"][k]),
            rtol=2e-3, atol=1e-5, err_msg=k)


def test_mismatch_forces_audio_dependence():
    """On the beat-driven corpus (poses genuinely coupled to each clip's
    beat phase/period), a lever-on critic must learn to separate matched
    from mismatched pairs — the gap metric grows positive. This is the
    mechanism claim: the critic is actually using audio. (On audio-
    independent poses the gap is unlearnable by construction, which is
    why this test builds coupled clips.)"""
    from music2dance_tpu.data.synthetic import beat_driven_clip

    clips = [beat_driven_clip(np.random.default_rng((7, i)), 1.0, AUDIO,
                              LAYOUT) for i in range(8)]
    waves = jnp.asarray(np.stack([c["wave"] for c in clips]))
    poses = jnp.asarray(np.stack([c["pose"] for c in clips]))
    feats = jax.jit(jax.vmap(lambda w: extract_features(w, AUDIO)))(waves)
    t = min(feats.shape[1], poses.shape[1])
    batch = {"feats": feats[:, :t],
             "poses": poses[:, :t].reshape(8, t, LAYOUT.pose_dim)}

    gan = _tiny()
    tc_on = TrainConfig(batch_size=8, mismatch_weight=1.0, lr_d=4e-4)
    state = init_state(jax.random.key(1), gan, tc_on, batch)
    step = jax.jit(make_train_step(gan, tc_on))
    gap = None
    for _ in range(100):
        state, m = step(state, batch)
        gap = float(m["mismatch_gap"])
    assert gap > 0.25, f"critic never learned to use audio: gap={gap}"


def test_unconditional_critic_rejected():
    gan = _tiny()
    gan = dataclasses.replace(
        gan, discriminator=dataclasses.replace(gan.discriminator,
                                               conditional=False))
    with pytest.raises(ValueError, match="conditional critic"):
        make_train_step(gan, TrainConfig(batch_size=4, mismatch_weight=0.5))


def test_grad_accum_pairing_rejected():
    with pytest.raises(ValueError, match="exact big-batch"):
        make_train_step(_tiny(), TrainConfig(batch_size=4, grad_accum=2,
                                             mismatch_weight=0.5))


def test_tbptt_levers_rejected():
    from music2dance_tpu.train.tbptt import make_tbptt_train_step

    tc = TrainConfig(batch_size=4, tbptt_window=8, mismatch_weight=0.5)
    with pytest.raises(ValueError, match="plain-step levers"):
        make_tbptt_train_step(_tiny(), tc)


def test_beat_loss_exact_under_grad_accum():
    """beat loss is a per-example mean, so grad_accum stays exact with
    it on (mismatch is the only gated lever)."""
    gan = _tiny()
    batch = _batch(b=4)
    states = {}
    for name, tc in [("big", TrainConfig(batch_size=4, beat_loss_weight=0.2)),
                     ("accum", TrainConfig(batch_size=4, beat_loss_weight=0.2,
                                           grad_accum=2))]:
        state = init_state(jax.random.key(1), gan, tc, batch)
        state, m = jax.jit(make_train_step(gan, tc))(state, batch)
        states[name] = (state, m)
    a, b = states["big"][0], states["accum"][0]
    fa, _ = jax.flatten_util.ravel_pytree(a.g_params)
    fb, _ = jax.flatten_util.ravel_pytree(b.g_params)
    np.testing.assert_allclose(np.asarray(fb), np.asarray(fa),
                               rtol=1e-5, atol=1e-7)


def test_beat_anneal_schedule_decays_and_holds():
    """Round-5 lever: beat_loss_anneal_steps cosine-decays the effective
    weight from beat_loss_weight to beat_loss_final, then holds — read
    back through the step's beat_w metric (which only exists when the
    anneal is on)."""
    gan = _tiny()
    tc = TrainConfig(batch_size=4, beat_loss_weight=0.5,
                     beat_loss_final=0.02, beat_loss_anneal_steps=4)
    batch = _batch()
    state = init_state(jax.random.key(1), gan, tc, batch)
    step = jax.jit(make_train_step(gan, tc))
    ws = []
    for _ in range(6):
        state, m = step(state, batch)
        assert "beat_w" in m
        ws.append(float(m["beat_w"]))
    # step counter inside the G phase is the PRE-update step: 0,1,2,...
    expect = [0.02 + 0.48 * 0.5 * (1 + np.cos(np.pi * min(s / 4, 1.0)))
              for s in range(6)]
    np.testing.assert_allclose(ws, expect, rtol=1e-5)
    assert ws[0] == pytest.approx(0.5, rel=1e-5)
    assert ws[4] == pytest.approx(0.02, rel=1e-5)
    assert ws[5] == pytest.approx(0.02, rel=1e-5)


def test_beat_anneal_off_keeps_metric_surface():
    """anneal_steps=0 must not add the beat_w metric (byte-identical
    metric surface to round 4)."""
    gan = _tiny()
    tc = TrainConfig(batch_size=4, beat_loss_weight=0.2)
    batch = _batch()
    state = init_state(jax.random.key(1), gan, tc, batch)
    _, m = jax.jit(make_train_step(gan, tc))(state, batch)
    assert "beat_loss" in m and "beat_w" not in m


def test_onset_channel_causal_and_exact():
    """The structural onset channel (models/generator.append_onset_channel)
    is the causal positive c0 flux: exact values, zero at t=0, and
    invariant to future frames."""
    from music2dance_tpu.models.generator import append_onset_channel

    feats = jax.random.normal(jax.random.key(0), (2, 16, 5))
    out = append_onset_channel(feats)
    assert out.shape == (2, 16, 6)
    np.testing.assert_array_equal(np.asarray(out[..., :5]), np.asarray(feats))
    c0 = np.asarray(feats[..., 0])
    expect = np.maximum(np.diff(c0, axis=1, prepend=c0[:, :1]), 0.0)
    expect[:, 0] = 0.0
    np.testing.assert_allclose(np.asarray(out[..., 5]), expect, rtol=1e-6)
    # causality: perturbing frames >= 8 leaves the channel < 8 unchanged
    feats2 = feats.at[:, 8:].add(1.0)
    out2 = append_onset_channel(feats2)
    np.testing.assert_array_equal(np.asarray(out2[:, :8, 5]),
                                  np.asarray(out[:, :8, 5]))


def test_onset_channel_generator_end_to_end():
    """onset_channel=True trains through the plain step for BOTH families
    and changes the forward (the channel is not a no-op); TBPTT and
    streaming gate it out loudly."""
    import dataclasses

    from music2dance_tpu.models import build_generator
    from music2dance_tpu.train.tbptt import make_tbptt_train_step

    gan = _tiny()
    gan_on = dataclasses.replace(
        gan, generator=dataclasses.replace(gan.generator, onset_channel=True))
    batch = _batch()
    tc = TrainConfig(batch_size=4, beat_loss_weight=0.1)
    state = init_state(jax.random.key(1), gan_on, tc, batch)
    state, m = jax.jit(make_train_step(gan_on, tc))(state, batch)
    assert all(bool(jnp.isfinite(jnp.mean(v))) for v in m.values())
    # the channel feeds the encoder: first conv kernel gains an input row
    k_on = state.g_params["params"]["encoder"]["conv_0"]["kernel"]
    gen_off = build_generator(gan.generator)
    p_off = gen_off.init(jax.random.key(1), batch["feats"],
                         jnp.zeros((4, gan.generator.noise_dim)))
    k_off = p_off["params"]["encoder"]["conv_0"]["kernel"]
    assert k_on.shape[1] == k_off.shape[1] + 1
    # gates
    tc_tb = TrainConfig(batch_size=4, tbptt_window=4)
    with pytest.raises(ValueError, match="onset_channel"):
        make_tbptt_train_step(gan_on, tc_tb)
    from music2dance_tpu.infer.streaming import StreamingSession

    with pytest.raises(ValueError, match="onset_channel"):
        StreamingSession(state.g_params, gan_on.generator,
                         jnp.zeros((1, gan.generator.noise_dim)))


# ---------------------------------------------------------------------------
# Joint (poses, audio) gradient penalty — round-5 conditional-WGAN-GP
# completeness (the round-4 mismatch instability mechanism)
# ---------------------------------------------------------------------------

def _zero_audio_path(state, gan):
    """Zero the critic's feats input channels (conv_0 kernel columns past
    pose_dim) so D is provably independent of audio."""
    import copy

    d = copy.deepcopy(jax.device_get(state.d_params))
    pd = gan.generator.pose_dim
    k = jnp.asarray(d["params"]["conv_0"]["kernel"])
    d["params"]["conv_0"]["kernel"] = k.at[:, pd:, :].set(0.0)
    return state.replace(d_params=d)


def test_joint_gp_requires_conditional_critic():
    gan = _tiny()
    gan = dataclasses.replace(
        gan,
        discriminator=dataclasses.replace(gan.discriminator,
                                          conditional=False),
    )
    with pytest.raises(ValueError, match="joint_gp"):
        make_train_step(gan, TrainConfig(batch_size=4, joint_gp=True))


@pytest.mark.parametrize("mis", [0.0, 0.5])
def test_joint_gp_equals_pose_gp_for_audio_blind_critic(mis):
    """With the critic's feats channels zeroed, |dD/dfeats| == 0 and the
    joint GP must equal the pose-only GP exactly (identical alpha/z keys),
    with or without the mismatch class (whose rolled-feats interpolate the
    blind critic also cannot see)."""
    gan = _tiny()
    batch = _batch()
    gps = {}
    for jgp in (False, True):
        tc = TrainConfig(batch_size=4, joint_gp=jgp, mismatch_weight=mis)
        state = _zero_audio_path(init_state(jax.random.key(1), gan, tc, batch),
                                 gan)
        _, m = jax.jit(make_train_step(gan, tc))(state, batch)
        gps[jgp] = float(m["gp"])
    assert np.isfinite(gps[True])
    assert gps[True] == pytest.approx(gps[False], rel=1e-6)


def test_joint_gp_sees_audio_sensitivity():
    """With a live audio path the joint penalty includes the audio-
    direction gradient the pose-only GP ignores — the values must differ
    (that difference IS the unbounded direction of the round-4 runs)."""
    gan = _tiny()
    batch = _batch()
    gps = {}
    for jgp in (False, True):
        tc = TrainConfig(batch_size=4, joint_gp=jgp, mismatch_weight=0.5)
        state = init_state(jax.random.key(1), gan, tc, batch)
        _, m = jax.jit(make_train_step(gan, tc))(state, batch)
        gps[jgp] = float(m["gp"])
    assert np.isfinite(gps[True]) and np.isfinite(gps[False])
    assert gps[True] != pytest.approx(gps[False], rel=1e-9)


def test_joint_gp_full_recipe_step_trains():
    """The round-5 v7 recipe in one step: joint_gp + mismatch + annealed
    beat aux + onset channel + EMA — finite metrics, both trees update."""
    gan = _tiny()
    gan = dataclasses.replace(
        gan, generator=dataclasses.replace(gan.generator, onset_channel=True))
    tc = TrainConfig(batch_size=4, joint_gp=True, mismatch_weight=1.0,
                     beat_loss_weight=0.5, beat_loss_anneal_steps=100,
                     beat_loss_final=0.05, ema_decay=0.99)
    batch = _batch()
    state = init_state(jax.random.key(1), gan, tc, batch)
    step = jax.jit(make_train_step(gan, tc))
    s1, m = step(state, batch)
    assert all(bool(jnp.isfinite(v)) for v in m.values())
    assert {"gp", "mismatch_gap", "beat_loss", "beat_w"} <= set(m)
    changed = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()) > 0,
        state.g_params, s1.g_params)
    assert any(jax.tree.leaves(changed))
    changed_d = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()) > 0,
        state.d_params, s1.d_params)
    assert any(jax.tree.leaves(changed_d))


def test_joint_gp_tbptt_rejected():
    """TBPTT's critic phase has its own (pose-only) GP — requesting
    joint_gp there must fail loudly rather than silently dropping the
    audio-direction bound."""
    from music2dance_tpu.train.tbptt import make_tbptt_train_step

    with pytest.raises(ValueError, match="joint_gp"):
        make_tbptt_train_step(
            _tiny(), TrainConfig(batch_size=4, tbptt_window=4, joint_gp=True))
