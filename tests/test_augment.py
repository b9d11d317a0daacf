"""On-device pose augmentation tests (data/augment.py + train-step wiring)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from music2dance_tpu.data.augment import AugmentConfig, augment_poses
from music2dance_tpu.models.configs import JointLayout

LAYOUT = JointLayout(n_joints=5, joint_dim=3)


def _poses(b=4, t=7, layout=LAYOUT, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(
        rng.normal(size=(b, t, layout.pose_dim)).astype(np.float32))


def _keys(b=4, seed=0):
    return jax.vmap(jax.random.fold_in, (None, 0))(
        jax.random.key(seed), jnp.arange(b))


class TestTransforms:
    def test_disabled_is_identity(self):
        p = _poses()
        out = augment_poses(_keys(), p, LAYOUT, AugmentConfig())
        np.testing.assert_array_equal(np.asarray(out), np.asarray(p))

    def test_rotation_preserves_geometry(self):
        cfg = AugmentConfig(rotate=True, up_axis=1)
        p = _poses()
        out = np.asarray(augment_poses(_keys(), p, LAYOUT, cfg))
        x_in = np.asarray(p).reshape(4, 7, 5, 3)
        x_out = out.reshape(4, 7, 5, 3)
        # up-axis coordinate untouched; per-joint horizontal radius kept
        np.testing.assert_allclose(x_out[..., 1], x_in[..., 1], atol=1e-5)
        r_in = np.hypot(x_in[..., 0], x_in[..., 2])
        r_out = np.hypot(x_out[..., 0], x_out[..., 2])
        np.testing.assert_allclose(r_out, r_in, atol=1e-5)
        # pairwise joint distances are rigid-invariant
        d_in = np.linalg.norm(x_in[:, :, :1] - x_in, axis=-1)
        d_out = np.linalg.norm(x_out[:, :, :1] - x_out, axis=-1)
        np.testing.assert_allclose(d_out, d_in, atol=1e-5)
        assert not np.allclose(out, np.asarray(p))  # it did rotate

    def test_rotation_angle_per_example_not_per_frame(self):
        cfg = AugmentConfig(rotate=True)
        p = _poses()
        out = np.asarray(augment_poses(_keys(), p, LAYOUT, cfg))
        x_in = np.asarray(p).reshape(4, 7, 5, 3)
        x_out = out.reshape(4, 7, 5, 3)
        # recover the angle per (example, frame, joint) from the XZ plane;
        # must be constant over frames and joints within an example
        ang = (np.arctan2(x_out[..., 2], x_out[..., 0])
               - np.arctan2(x_in[..., 2], x_in[..., 0]))
        ang = np.mod(ang, 2 * np.pi)
        spread = ang.reshape(4, -1)
        assert np.allclose(spread, spread[:, :1], atol=1e-4)
        # and differ across examples
        assert np.std(spread[:, 0]) > 1e-3

    def test_mirror_flips_and_swaps(self):
        cfg = AugmentConfig(mirror=True, mirror_axis=0,
                            mirror_pairs=((1, 2),))
        p = _poses(b=64)
        out = np.asarray(augment_poses(_keys(b=64), p, LAYOUT, cfg))
        x_in = np.asarray(p).reshape(64, 7, 5, 3)
        x_out = out.reshape(64, 7, 5, 3)
        expect = x_in[:, :, [0, 2, 1, 3, 4]].copy()
        expect[..., 0] *= -1
        flipped = np.array([np.allclose(x_out[i], expect[i], atol=1e-6)
                            for i in range(64)])
        kept = np.array([np.allclose(x_out[i], x_in[i], atol=1e-6)
                         for i in range(64)])
        assert np.all(flipped | kept)       # every example is one or other
        assert 10 < flipped.sum() < 54      # ~Bernoulli(1/2) at B=64

    def test_scale_jitter_bounds(self):
        cfg = AugmentConfig(scale_jitter=0.2)
        p = _poses(b=32)
        out = np.asarray(augment_poses(_keys(b=32), p, LAYOUT, cfg))
        ratio = out / np.asarray(p)
        per_ex = ratio.reshape(32, -1)
        # one scalar per example, inside [0.8, 1.2]
        assert np.allclose(per_ex, per_ex[:, :1], atol=1e-5)
        assert per_ex[:, 0].min() >= 0.8 - 1e-6
        assert per_ex[:, 0].max() <= 1.2 + 1e-6
        assert np.std(per_ex[:, 0]) > 1e-3

    def test_noise_std(self):
        cfg = AugmentConfig(noise_std=0.05)
        p = _poses(b=16, t=50)
        out = np.asarray(augment_poses(_keys(b=16), p, LAYOUT, cfg))
        diff = out - np.asarray(p)
        assert abs(diff.std() - 0.05) < 0.01
        assert abs(diff.mean()) < 0.01

    def test_deterministic_given_keys(self):
        cfg = AugmentConfig(rotate=True, scale_jitter=0.1, noise_std=0.01)
        p = _poses()
        a = augment_poses(_keys(), p, LAYOUT, cfg)
        b = augment_poses(_keys(), p, LAYOUT, cfg)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_validation_errors(self):
        p2 = JointLayout(n_joints=5, joint_dim=2)
        with pytest.raises(ValueError, match="3-D"):
            augment_poses(_keys(), jnp.zeros((4, 7, 10)), p2,
                          AugmentConfig(rotate=True))
        with pytest.raises(ValueError, match="scale_jitter"):
            AugmentConfig(scale_jitter=1.5).validate(LAYOUT)
        with pytest.raises(ValueError, match="out of range"):
            AugmentConfig(mirror=True,
                          mirror_pairs=((0, 9),)).validate(LAYOUT)

    def test_jittable(self):
        cfg = AugmentConfig(rotate=True, mirror=True, mirror_pairs=((1, 2),),
                            scale_jitter=0.1, noise_std=0.01)
        p = _poses()
        f = jax.jit(lambda k, x: augment_poses(k, x, LAYOUT, cfg))
        out = f(_keys(), p)
        assert out.shape == p.shape
        assert np.isfinite(np.asarray(out)).all()


class TestStepIntegration:
    def _setup(self, augment, tbptt=0):
        from music2dance_tpu.models import tiny_gan
        from music2dance_tpu.train import TrainConfig, init_state

        gan = tiny_gan()
        tc = TrainConfig(batch_size=4, clip_seconds=1.0, augment=augment,
                         tbptt_window=tbptt)
        t = 30 if tbptt == 0 else 2 * tbptt
        kf, kp = jax.random.split(jax.random.key(0))
        batch = {
            "feats": jax.random.normal(
                kf, (4, t, gan.generator.feature_dim), jnp.float32),
            "poses": jax.random.normal(
                kp, (4, t, gan.generator.pose_dim), jnp.float32),
        }
        state = init_state(jax.random.key(1), gan, tc, batch)
        return gan, tc, batch, state

    def test_train_step_with_augmentation_runs_and_learns_shape(self):
        from music2dance_tpu.train import make_train_step

        aug = AugmentConfig(rotate=True, scale_jitter=0.1)
        gan, tc, batch, state = self._setup(aug)
        step = jax.jit(make_train_step(gan, tc))
        state2, metrics = step(state, batch)
        assert np.isfinite(float(metrics["d_loss"]))
        assert np.isfinite(float(metrics["g_loss"]))
        assert int(state2.step) == 1

    def test_augmented_step_differs_from_plain_but_same_draws(self):
        """Augmentation must change the real batch the critic sees (and
        hence d metrics) while the z/alpha draws stay on their own keys."""
        from music2dance_tpu.train import make_train_step

        gan, tc, batch, state = self._setup(AugmentConfig())
        plain = jax.jit(make_train_step(gan, tc))
        _, m_plain = plain(state, batch)

        aug_tc = dataclasses.replace(tc, augment=AugmentConfig(rotate=True))
        auged = jax.jit(make_train_step(gan, aug_tc))
        _, m_aug = auged(state, batch)
        assert float(m_plain["d_loss"]) != float(m_aug["d_loss"])

    def test_tbptt_augments_whole_clip_once(self):
        """With rotation on, every window of a clip must see the same
        draw: rotating per window would discontinue poses at window
        boundaries. Pinned via the metrics path: a manual whole-clip
        rotation fed to the unaugmented TBPTT step with the same keys is
        exactly the augmented step (same key derivation)."""
        from music2dance_tpu.train.tbptt import make_tbptt_train_step

        aug = AugmentConfig(rotate=True)
        gan, tc, batch, state = self._setup(aug, tbptt=15)
        step = jax.jit(make_tbptt_train_step(gan, tc))
        state2, metrics = step(state, batch)
        assert np.isfinite(float(metrics["d_loss"]))

        # reproduce the step's augmentation by hand, then run the plain
        # TBPTT step on the pre-augmented batch: identical metrics
        plain_tc = dataclasses.replace(tc, augment=AugmentConfig())
        plain = jax.jit(make_tbptt_train_step(gan, plain_tc))
        base = jax.random.split(
            jax.random.fold_in(state.rng, state.step))[1]
        keys = jax.vmap(jax.random.fold_in, (None, 0))(
            jax.random.fold_in(base, 0xA06), jnp.arange(4))
        pre = dict(batch, poses=augment_poses(
            keys, batch["poses"], gan.generator.layout, aug))
        _, m2 = plain(state, pre)
        for k in ("d_loss", "g_loss", "gp"):
            assert float(metrics[k]) == pytest.approx(float(m2[k]), rel=1e-6)

    def test_dp_sharded_equals_single_device(self):
        """The augmented sharded step must equal the augmented
        single-device step (per-example global-index keys)."""
        from jax.sharding import Mesh, PartitionSpec as P

        from music2dance_tpu.train import make_train_step

        if len(jax.devices()) < 4:
            pytest.skip("needs >= 4 devices")
        aug = AugmentConfig(rotate=True, noise_std=0.01)
        gan, tc, batch, state = self._setup(aug)
        single = jax.jit(make_train_step(gan, tc))
        _, m_single = single(state, batch)

        mesh = Mesh(np.asarray(jax.devices()[:4]), ("data",))
        stepper = make_train_step(gan, tc, axis_name="data")
        sharded = jax.jit(jax.shard_map(
            stepper, mesh=mesh, in_specs=(P(), P("data")),
            out_specs=(P(), P()), check_vma=False))
        _, m_shard = sharded(state, batch)
        # same tolerance as tests/test_dp.py: the sharded program's
        # different reduction order compounds through the in-step updates
        for k in ("d_loss", "g_loss", "gp"):
            assert float(m_single[k]) == pytest.approx(
                float(m_shard[k]), rel=2e-3, abs=5e-5), k


class TestReviewFixes:
    def test_mirror_pairs_must_be_pairs(self):
        with pytest.raises(ValueError, match="pairs"):
            AugmentConfig(mirror=True,
                          mirror_pairs=((1, 2, 3),)).validate(LAYOUT)
        with pytest.raises(ValueError, match="pairs"):
            AugmentConfig(mirror=True, mirror_pairs=((1,),)).validate(LAYOUT)

    def test_configs_json_round_trips_augment(self):
        """configs.json is the self-describing restore contract: the
        nested AugmentConfig must come back as a dataclass, not a dict
        (found in review: make_train_step on a restored TrainConfig
        raised AttributeError on .enabled)."""
        from music2dance_tpu.audio import AudioConfig
        from music2dance_tpu.ckpt.orbax_io import (configs_from_json,
                                                   configs_to_json)
        from music2dance_tpu.models import tiny_gan
        from music2dance_tpu.train import TrainConfig

        aug = AugmentConfig(rotate=True, mirror=True,
                            mirror_pairs=((1, 2), (3, 4)),
                            scale_jitter=0.1)
        tc = TrainConfig(batch_size=4, augment=aug)
        text = configs_to_json(tiny_gan(), AudioConfig(), tc)
        _, _, tc2 = configs_from_json(text)
        assert isinstance(tc2.augment, AugmentConfig)
        assert tc2.augment == aug          # incl. tuple-of-tuples pairs
        assert tc2.augment.enabled

    def test_configs_json_without_augment_key_defaults(self):
        """Pre-augment checkpoints (no 'augment' in configs.json) restore
        with the default (disabled) AugmentConfig."""
        import json as _json

        from music2dance_tpu.audio import AudioConfig
        from music2dance_tpu.ckpt.orbax_io import (configs_from_json,
                                                   configs_to_json)
        from music2dance_tpu.models import tiny_gan
        from music2dance_tpu.train import TrainConfig

        blob = _json.loads(
            configs_to_json(tiny_gan(), AudioConfig(), TrainConfig()))
        del blob["train"]["augment"]
        _, _, tc = configs_from_json(_json.dumps(blob))
        assert isinstance(tc.augment, AugmentConfig)
        assert not tc.augment.enabled
