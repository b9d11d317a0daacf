"""Attention model family (models/transformer.py).

Covers: shapes/finiteness, causality of the generator stack, the
alternating WGAN-GP train step end to end (XLA path — there is no scan
to fuse), masked decode, config round-trip, and the loud gates on
recurrent-family-only capabilities (TBPTT, streaming, torch interop,
fused kernels).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from music2dance_tpu.audio import AudioConfig
from music2dance_tpu.data.synthetic import synthetic_batch
from music2dance_tpu.models import (
    JointLayout,
    build_discriminator,
    build_generator,
    transformer_gan,
)
from music2dance_tpu.train import TrainConfig, init_state, make_train_step

LAYOUT = JointLayout(n_joints=5, joint_dim=3)
AUDIO = AudioConfig(sample_rate=8000, n_fft=256, win_length=256, hop_length=200,
                    n_mels=40, n_mfcc=13)


def _tiny_attn(**gen_over):
    gan = transformer_gan(feature_dim=AUDIO.n_mfcc, layout=LAYOUT)
    return dataclasses.replace(
        gan,
        generator=dataclasses.replace(
            gan.generator, hidden_dim=64, head_hidden=32, tr_blocks=2,
            tr_heads=4, enc_dim=32, noise_dim=8, **gen_over,
        ),
        discriminator=dataclasses.replace(
            gan.discriminator, hidden_dim=64, tr_blocks=2, tr_heads=4,
            conv_dim=32,
        ),
    )


def _init_gen(gan, b=2, t=12):
    gen = build_generator(gan.generator)
    feats = jax.random.normal(jax.random.key(0), (b, t, AUDIO.n_mfcc))
    z = jax.random.normal(jax.random.key(1), (b, gan.generator.noise_dim))
    params = gen.init(jax.random.key(2), feats, z)
    return gen, params, feats, z


def test_generator_shapes_finite_deterministic():
    gan = _tiny_attn()
    gen, params, feats, z = _init_gen(gan)
    poses = gen.apply(params, feats, z)
    assert poses.shape == (2, 12, LAYOUT.pose_dim)
    assert bool(jnp.isfinite(poses).all())
    np.testing.assert_array_equal(np.asarray(gen.apply(params, feats, z)),
                                  np.asarray(poses))


def test_generator_is_causal_modulo_encoder_halo():
    # enc_kernel=1 removes the conv halo, leaving pure causal attention:
    # perturbing frame t must not change any output before t
    gan = _tiny_attn(enc_kernel=1, enc_layers=1)
    gen, params, feats, z = _init_gen(gan, b=1, t=10)
    # head_out is zero-init (stability); give it weight so perturbations
    # reach the output
    ho = params["params"]["head_out"]["kernel"]
    params = jax.tree_util.tree_map(lambda x: x, params)
    params["params"]["head_out"]["kernel"] = jax.random.normal(
        jax.random.key(9), ho.shape, ho.dtype) * 0.1
    base = np.asarray(gen.apply(params, feats, z))
    t_hit = 6
    feats2 = feats.at[:, t_hit:].add(1.0)
    got = np.asarray(gen.apply(params, feats2, z))
    np.testing.assert_array_equal(got[:, :t_hit], base[:, :t_hit])
    assert not np.allclose(got[:, t_hit:], base[:, t_hit:])


def test_generator_rejects_recurrent_only_kwargs():
    gan = _tiny_attn()
    gen, params, feats, z = _init_gen(gan)
    with pytest.raises(ValueError, match="recurrent"):
        gen.apply(params, feats, z, return_carry=True)
    with pytest.raises(ValueError, match="teacher-forcing"):
        gen.apply(params, feats, z,
                  tf_poses=jnp.zeros((2, 12, LAYOUT.pose_dim)))


def test_critic_shapes_and_features():
    gan = _tiny_attn()
    disc = build_discriminator(gan.discriminator)
    poses = jax.random.normal(jax.random.key(0), (2, 12, LAYOUT.pose_dim))
    feats = jax.random.normal(jax.random.key(1), (2, 12, AUDIO.n_mfcc))
    params = disc.init(jax.random.key(2), poses, feats)
    score = disc.apply(params, poses, feats)
    assert score.shape == (2,)
    score2, fs = disc.apply(params, poses, feats, return_features=True)
    np.testing.assert_array_equal(np.asarray(score2), np.asarray(score))
    assert len(fs) == gan.discriminator.conv_layers + 1
    with pytest.raises(ValueError, match="audio features"):
        disc.apply(params, poses, None)


def test_train_step_updates_and_is_finite():
    gan = _tiny_attn()
    tc = TrainConfig(batch_size=4, n_critic=2, ema_decay=0.99)
    batch = synthetic_batch(
        jax.random.key(0), 4, 0.5, AUDIO, LAYOUT, through_frontend=False
    )
    state = init_state(jax.random.key(1), gan, tc, batch)
    step = jax.jit(make_train_step(gan, tc))
    s2, metrics = step(state, batch)
    for k, v in metrics.items():
        assert bool(jnp.isfinite(v)), f"non-finite {k}"
    assert s2.ema_g_params is not None
    # head_out is zero-init, so at step 1 only it receives gradient;
    # by step 2 the upstream blocks get signal through it
    s3, _ = step(s2, batch)
    assert int(s3.step) == 2
    before = jax.tree.leaves(state.g_params)
    after = jax.tree.leaves(s3.g_params)
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(before, after)
    )


def test_mixed_family_step_attn_g_tcn_critic():
    """The attn_long pairing: flash-capable transformer G + TCN critic
    (the GP second order must never touch attention — the flash kernel's
    VJP is first-order only, so long-clip training uses the conv critic)."""
    gan = _tiny_attn()
    gan = dataclasses.replace(
        gan,
        discriminator=dataclasses.replace(
            gan.discriminator, arch="rnn", rnn_layers=0, conv_layers=2,
            conv_dilation=2,
        ),
    )
    tc = TrainConfig(batch_size=4, n_critic=1)
    batch = synthetic_batch(
        jax.random.key(0), 4, 0.5, AUDIO, LAYOUT, through_frontend=False
    )
    state = init_state(jax.random.key(1), gan, tc, batch)
    s2, metrics = jax.jit(make_train_step(gan, tc))(state, batch)
    for k, v in metrics.items():
        assert bool(jnp.isfinite(v)), f"non-finite {k}"


def test_attn_long_preset_is_mixed_family():
    from music2dance_tpu.configs import preset

    p = preset("attn_long")
    assert p.gan.generator.arch == "transformer"
    assert p.gan.discriminator.arch == "rnn"      # TCN critic
    assert p.gan.discriminator.rnn_layers == 0    # scan-free GP
    assert p.train.tbptt_window == 0  # whole clips, no TBPTT windows


def test_masked_decode():
    from music2dance_tpu.infer.decode import decode_poses

    gan = _tiny_attn()
    _, params, feats, _ = _init_gen(gan, b=3, t=12)
    lengths = np.array([12, 7, 4], np.int32)
    poses = decode_poses(params, gan.generator, feats, jax.random.key(3),
                         lengths=lengths)
    assert poses.shape == (3, 12, LAYOUT.n_joints, LAYOUT.joint_dim)
    for i, n in enumerate(lengths):
        assert bool(jnp.isfinite(poses[i, :n]).all())
        np.testing.assert_array_equal(np.asarray(poses[i, n:]), 0.0)


def test_tbptt_rejected():
    from music2dance_tpu.train.tbptt import make_tbptt_machinery

    gan = _tiny_attn()
    tc = TrainConfig(batch_size=4, tbptt_window=8)
    with pytest.raises(ValueError, match="recurrent-family"):
        make_tbptt_machinery(gan, tc)


def test_streaming_rejected():
    # the DIRECT recurrent-session constructor stays loud on the wrong
    # family (transformer streams via the KV-cache session instead —
    # make_streaming_session() dispatches; tests/test_attn_stream.py)
    from music2dance_tpu.infer.streaming import StreamingSession

    gan = _tiny_attn()
    _, params, _, z = _init_gen(gan)
    with pytest.raises(ValueError, match="make_streaming_session"):
        StreamingSession(params, gan.generator, z)


def test_torch_interop_rejected():
    from music2dance_tpu.ckpt.torch_convert import flax_to_torch_state_dict

    gan = _tiny_attn()
    _, params, _, _ = _init_gen(gan)
    with pytest.raises(ValueError, match="recurrent family"):
        flax_to_torch_state_dict(params)


def test_flash_gates_are_loud():
    from music2dance_tpu.models.transformer import use_flash_attention

    # explicit flash off-TPU: entry-point error, not a Pallas crash
    with pytest.raises(ValueError, match="TPU backend"):
        use_flash_attention(512, 128, "flash")
    # the critic never flashes: its GP needs grad-of-grad and the flash
    # VJP is first-order only
    gan = _tiny_attn()
    disc = build_discriminator(
        dataclasses.replace(gan.discriminator, attn_impl="flash")
    )
    poses = jnp.zeros((2, 12, LAYOUT.pose_dim))
    feats = jnp.zeros((2, 12, AUDIO.n_mfcc))
    with pytest.raises(ValueError, match="first-order"):
        disc.init(jax.random.key(0), poses, feats)


def test_fused_envelope_rejects_transformer():
    from music2dance_tpu.ops.fused_critic import why_not_fused_critic
    from music2dance_tpu.ops.fused_generator import why_not_fused

    gan = transformer_gan()
    assert "arch" in why_not_fused(gan.generator, interpret=False)
    assert "arch" in why_not_fused_critic(gan.discriminator, interpret=False)


def test_config_round_trip_preserves_arch():
    from music2dance_tpu.ckpt.orbax_io import configs_from_json, configs_to_json

    gan = _tiny_attn()
    tc = TrainConfig(batch_size=4)
    text = configs_to_json(gan, AUDIO, tc)
    gan2, audio2, tc2 = configs_from_json(text)
    assert gan2 == gan
    assert audio2 == AUDIO


def test_attn_preset_exists():
    from music2dance_tpu.configs import PRESET_NAMES, preset

    assert "attn" in PRESET_NAMES
    p = preset("attn")
    assert p.gan.generator.arch == "transformer"
    assert p.gan.discriminator.arch == "transformer"


def test_sinusoidal_positions():
    from music2dance_tpu.models.transformer import sinusoidal_positions

    enc = np.asarray(sinusoidal_positions(16, 32))
    assert enc.shape == (16, 32)
    np.testing.assert_allclose(enc[0, 0::2], 0.0, atol=1e-7)  # sin(0)
    np.testing.assert_allclose(enc[0, 1::2], 1.0, atol=1e-7)  # cos(0)
    assert np.all(np.abs(enc) <= 1.0 + 1e-7)


def test_film_cond_identity_at_init_and_learns_audio_dependence():
    """Round-5 FiLM conditioning: zero-init projections make film_cond a
    bit-exact no-op at init (same params otherwise -> same output), and
    with nonzero film kernels the output depends on audio through every
    block (perturbing feats changes poses even where the input projection
    alone would dilute it)."""
    from music2dance_tpu.models.configs import GeneratorConfig
    from music2dance_tpu.models.transformer import TransformerGenerator

    cfg = GeneratorConfig(
        layout=JointLayout(n_joints=4, joint_dim=3), feature_dim=6,
        noise_dim=4, enc_dim=8, enc_layers=1, hidden_dim=16, tr_blocks=2,
        tr_heads=2, head_hidden=8, arch="transformer", attn_impl="xla",
    )
    cfg_f = dataclasses.replace(cfg, film_cond=True)
    feats = jax.random.normal(jax.random.key(0), (2, 9, 6))
    z = jax.random.normal(jax.random.key(1), (2, 4))
    gen_f = TransformerGenerator(cfg_f)
    params_f = gen_f.init(jax.random.key(2), feats, z)
    # give the zero-init heads weight so outputs are nonzero
    ho = params_f["params"]["head_out"]["kernel"]
    params_f["params"]["head_out"]["kernel"] = jnp.ones_like(ho) * 0.05

    # identity at init: drop the (all-zero) film params -> same output
    plain = {"params": {k: v for k, v in params_f["params"].items()}}
    for blk in ("block_0", "block_1"):
        plain["params"][blk] = {k: v for k, v in params_f["params"][blk].items()
                                if not k.startswith("film")}
    out_f = gen_f.apply(params_f, feats, z)
    out_p = TransformerGenerator(cfg).apply(plain, feats, z)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_p),
                               rtol=1e-6, atol=1e-6)

    # nonzero film kernels: audio perturbation must change the output
    for blk in ("block_0", "block_1"):
        for fl in ("film1", "film2"):
            k = params_f["params"][blk][fl]["kernel"]
            params_f["params"][blk][fl]["kernel"] = (
                jax.random.normal(jax.random.key(3), k.shape, k.dtype) * 0.1
            )
    out_a = gen_f.apply(params_f, feats, z)
    out_b = gen_f.apply(params_f, feats + 0.5, z)
    assert float(jnp.abs(out_a - out_b).max()) > 1e-4


def test_film_cond_gates():
    """film_cond is offline-decode only: the KV-cache streaming session
    and both pipeline schedules reject it loudly."""
    import pytest as _pytest

    from music2dance_tpu.models.configs import GeneratorConfig

    cfg = GeneratorConfig(
        layout=JointLayout(n_joints=4, joint_dim=3), feature_dim=6,
        noise_dim=4, enc_dim=8, enc_layers=1, hidden_dim=16, tr_blocks=2,
        tr_heads=2, head_hidden=8, arch="transformer", film_cond=True,
    )
    from music2dance_tpu.infer.attn_stream import TransformerStreamingSession

    with _pytest.raises(ValueError, match="film_cond"):
        TransformerStreamingSession({"params": {}}, cfg,
                                    jnp.zeros((1, cfg.noise_dim)))


def test_film_cond_full_recipe_step_trains():
    """FiLM + the round-5 conditioning recipe in one jitted step on the
    attention family: finite metrics, film params receive gradient."""
    from music2dance_tpu.models.configs import (
        DiscriminatorConfig,
        GANConfig,
        GeneratorConfig,
    )

    L = JointLayout(n_joints=4, joint_dim=3)
    gan = GANConfig(
        generator=GeneratorConfig(
            layout=L, feature_dim=6, noise_dim=4, enc_dim=8, enc_layers=1,
            hidden_dim=16, tr_blocks=2, tr_heads=2, head_hidden=8,
            arch="transformer", film_cond=True, onset_channel=True,
        ),
        discriminator=DiscriminatorConfig(
            layout=L, feature_dim=6, conv_dim=8, hidden_dim=16,
            tr_blocks=2, tr_heads=2, arch="transformer",
        ),
    )
    tc = TrainConfig(batch_size=4, joint_gp=True, mismatch_weight=1.0,
                     beat_loss_weight=0.5, ema_decay=0.99)
    feats = jax.random.normal(jax.random.key(0), (4, 9, 6))
    poses = jax.random.normal(jax.random.key(1), (4, 9, L.pose_dim)) * 0.1
    batch = {"feats": feats, "poses": poses}
    state = init_state(jax.random.key(2), gan, tc, batch)
    step = jax.jit(make_train_step(gan, tc))
    s1, m = step(state, batch)
    assert all(bool(jnp.isfinite(v)) for v in m.values()), m
    # the zero-init pose head blocks ALL upstream generator grads at step
    # 1 (out = 0 regardless of film) — film params move from step 2 on,
    # once head_out's kernel is nonzero
    s2, m2 = step(s1, batch)
    assert all(bool(jnp.isfinite(v)) for v in m2.values()), m2
    g0 = state.g_params["params"]["block_0"]["film1"]["kernel"]
    g2 = s2.g_params["params"]["block_0"]["film1"]["kernel"]
    assert float(jnp.abs(g2 - g0).max()) > 0.0  # film params update
