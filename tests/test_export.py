"""AOT export (jax.export .m2dx artifacts): round-trip equivalence with
the live decoder, shape/metadata contract, and sub-shape padding."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from music2dance_tpu.audio import AudioConfig
from music2dance_tpu.data.synthetic import synthetic_batch
from music2dance_tpu.infer import (
    ExportedDecoder,
    Music2DanceModel,
    export_decoder,
)
from music2dance_tpu.infer.decode import decode_poses
from music2dance_tpu.models import JointLayout, tiny_gan
from music2dance_tpu.train import TrainConfig, init_state

AUDIO = AudioConfig(sample_rate=8000, n_fft=256, win_length=256, hop_length=200,
                    n_mels=40, n_mfcc=13)
LAYOUT = JointLayout(n_joints=5, joint_dim=3)
GAN = tiny_gan(feature_dim=AUDIO.n_mfcc, layout=LAYOUT)


@pytest.fixture(scope="module")
def model():
    batch = synthetic_batch(
        jax.random.key(0), 2, 0.5, AUDIO, LAYOUT, through_frontend=False
    )
    state = init_state(jax.random.key(1), GAN, TrainConfig(batch_size=2), batch)
    return Music2DanceModel(GAN, AUDIO, state.g_params)


def test_export_round_trip_matches_live_decoder(model, tmp_path):
    b, t = 2, 9
    path = str(tmp_path / "decoder.m2dx")
    blob = export_decoder(model, batch=b, frames=t, path=path)
    assert (tmp_path / "decoder.m2dx").stat().st_size == len(blob)

    dec = ExportedDecoder.load(path)
    assert dec.meta["batch"] == b and dec.meta["frames"] == t
    assert dec.meta["n_joints"] == LAYOUT.n_joints
    assert dec.meta["sample_rate"] == AUDIO.sample_rate

    feats = np.asarray(
        jax.random.normal(jax.random.key(2), (b, t, AUDIO.n_mfcc))
    )
    z = np.asarray(jax.random.normal(jax.random.key(3), (b, GAN.generator.noise_dim)))
    lengths = np.array([t, t - 3], np.int32)

    got = dec(feats, z=z, lengths=lengths)
    want = np.asarray(
        decode_poses(
            model.g_params, GAN.generator, jnp.asarray(feats), None,
            lengths=jnp.asarray(lengths), z=jnp.asarray(z),
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
    # masking survived the export
    np.testing.assert_array_equal(got[1, t - 3:], 0.0)


def test_exported_decoder_pads_sub_shapes(model):
    """Smaller-than-exported inputs pad up and slice back; valid frames
    must match a direct decode at the small shape (causal scan + masking
    make the padding inert)."""
    blob = export_decoder(model, batch=4, frames=12)
    dec = ExportedDecoder(blob)

    b, t = 2, 7
    feats = np.asarray(jax.random.normal(jax.random.key(4), (b, t, AUDIO.n_mfcc)))
    z = np.asarray(jax.random.normal(jax.random.key(5), (b, GAN.generator.noise_dim)))
    got = dec(feats, z=z)
    assert got.shape == (b, t, LAYOUT.n_joints, LAYOUT.joint_dim)
    want = np.asarray(
        decode_poses(
            model.g_params, GAN.generator, jnp.asarray(feats), None,
            lengths=jnp.full(b, t), z=jnp.asarray(z),
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_exported_decoder_seed_determinism(model):
    blob = export_decoder(model, batch=1, frames=6)
    dec = ExportedDecoder(blob)
    feats = np.asarray(jax.random.normal(jax.random.key(6), (1, 6, AUDIO.n_mfcc)))
    a = dec(feats, seed=11)
    b = dec(feats, seed=11)
    c = dec(feats, seed=12)
    np.testing.assert_array_equal(a, b)
    assert not np.allclose(a, c)


def test_exported_decoder_rejects_bad_shapes(model):
    blob = export_decoder(model, batch=2, frames=8)
    dec = ExportedDecoder(blob)
    with pytest.raises(ValueError):  # too many frames
        dec(np.zeros((2, 9, AUDIO.n_mfcc), np.float32))
    with pytest.raises(ValueError):  # too many songs
        dec(np.zeros((3, 8, AUDIO.n_mfcc), np.float32))
    with pytest.raises(ValueError):  # wrong feature dim
        dec(np.zeros((2, 8, AUDIO.n_mfcc + 1), np.float32))


def test_export_future_format_rejected(model, tmp_path):
    import io
    import json
    import zipfile

    blob = export_decoder(model, batch=1, frames=4)
    with zipfile.ZipFile(io.BytesIO(blob)) as zf:
        meta = json.loads(zf.read("meta.json"))
        dec_bin = zf.read("decoder.bin")
    meta["format_version"] = 99
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("meta.json", json.dumps(meta))
        zf.writestr("decoder.bin", dec_bin)
    with pytest.raises(ValueError):
        ExportedDecoder(buf.getvalue())
