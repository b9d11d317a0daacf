"""CLI: materialize the learnable beat corpus as REAL FILES on disk.

Every prior learning demonstration rode the in-memory synthetic device
store (`--synthetic --corpus beat`); this tool writes the SAME corpus as
the on-disk files a real user brings — audio through the codec bank
(WAV via the native/numpy encoder, FLAC via the spec-following test
encoder, MP3/Ogg via the system LAME/vorbisenc codecs) paired with
poses in every supported format (.npy, .json poses-v1, .bvh mocap) — so
the production path `make_corpus.py -> preprocess.py -> train.py
--audio_dir/--cache_dir` exercises decode, pairing, caching, and grain
streaming end to end (SURVEY.md §1 control flow; BASELINE "dataloading
overlaps ... never input-bound").

  python make_corpus.py --out_dir corpus/ --clips 256 --seconds 6
  python preprocess.py --data_dir corpus/ --out_dir cache/ --nobvh_center_root
  python train.py --preset full --audio_dir corpus/ --input_mode feature_cache \
      --cache_dir cache/ --nobvh_center_root ...

Formats rotate per clip (clip i gets audio_formats[i % n]); lossy codecs
are real encodes through independent codebases from the decoders under
test, so training from this corpus is a cross-implementation check of
the whole input tier, not a fixture replay.

NOTE for .bvh clips: BVH ingestion defaults to root-centering (the
standard dance-corpus normalization); this corpus' poses carry a
per-clip base posture on EVERY joint, so pass --nobvh_center_root to
preprocess/train or the .bvh third of the corpus will follow a
different pose distribution than the .npy/.json thirds.
"""

from __future__ import annotations

import os

import numpy as np
from absl import app, flags

FLAGS = flags.FLAGS
flags.DEFINE_string("out_dir", None, "output directory for the file corpus")
flags.DEFINE_integer("clips", 256, "number of clips")
flags.DEFINE_float("seconds", 6.0, "clip length in seconds")
flags.DEFINE_integer("seed", 0, "corpus rng seed (matches BeatClipSource: "
                     "clip i here == --synthetic --corpus beat clip i)")
flags.DEFINE_list("audio_formats", ["wav", "flac", "mp3", "ogg"],
                  "audio codecs to rotate across clips (wav, flac, mp3, "
                  "ogg); codecs whose encoder library is missing fall "
                  "back to wav LOUDLY")
flags.DEFINE_list("pose_formats", ["npy", "json", "bvh"],
                  "pose formats to rotate across clips (npy, json, bvh)")
flags.mark_flag_as_required("out_dir")


def _write_audio(path_stem: str, wave: np.ndarray, sr: int, fmt: str,
                 warned: set) -> str:
    """Write ``wave`` (mono float32) as ``fmt``; returns the path written.

    MP3/Ogg need the system libmp3lame/libvorbisenc (the test-only
    encoders in tests/codec_encoders.py — independent codebases from the
    mpg123/libvorbisfile decoders, so the round trip is a real
    cross-implementation check). Missing encoder -> loud wav fallback.
    """
    from music2dance_tpu.data.wav import save_wav

    if fmt == "wav":
        save_wav(path_stem + ".wav", wave, sr)
        return path_stem + ".wav"
    if fmt == "flac":
        from tests.test_flac import make_flac

        pcm = np.clip(np.round(wave * 32767.0), -32768, 32767).astype(np.int64)
        blob = make_flac([pcm], sr, 16, modes=["fixed2"])
        with open(path_stem + ".flac", "wb") as f:
            f.write(blob)
        return path_stem + ".flac"
    if fmt in ("mp3", "ogg"):
        try:
            if fmt == "mp3":
                from tests.codec_encoders import write_mp3

                write_mp3(path_stem + ".mp3", wave, sr)
            else:
                from tests.codec_encoders import write_ogg

                write_ogg(path_stem + ".ogg", wave, sr)
            return path_stem + "." + fmt
        except (OSError, RuntimeError) as e:
            if fmt not in warned:
                warned.add(fmt)
                print(f"WARNING: {fmt} encoder unavailable ({e}); "
                      f"falling back to wav for {fmt}-slot clips")
            save_wav(path_stem + ".wav", wave, sr)
            return path_stem + ".wav"
    raise ValueError(f"unknown audio format {fmt!r}")


def main(argv):
    del argv
    from music2dance_tpu.audio import AudioConfig
    from music2dance_tpu.data.synthetic import beat_driven_clip
    from music2dance_tpu.infer.poses_io import save_poses
    from music2dance_tpu.models.configs import JointLayout

    audio = AudioConfig()
    layout = JointLayout()
    os.makedirs(FLAGS.out_dir, exist_ok=True)
    afmts = list(FLAGS.audio_formats)
    pfmts = list(FLAGS.pose_formats)
    warned: set = set()
    counts: dict[str, int] = {}
    for i in range(FLAGS.clips):
        # the same (seed, idx) stream as data/pipeline.BeatClipSource, so
        # file-corpus runs are comparable clip-for-clip with the
        # device-store learning runs in runs/
        rng = np.random.default_rng((FLAGS.seed, i))
        clip = beat_driven_clip(rng, FLAGS.seconds, audio, layout)
        stem = os.path.join(FLAGS.out_dir, f"clip{i:06d}")
        apath = _write_audio(stem, clip["wave"], audio.sample_rate,
                             afmts[i % len(afmts)], warned)
        pfmt = pfmts[i % len(pfmts)]
        t = clip["pose"].shape[0]
        poses3 = clip["pose"].reshape(t, layout.n_joints, layout.joint_dim)
        save_poses(stem + "." + pfmt, poses3, fps=audio.feature_rate)
        key = os.path.splitext(apath)[1][1:] + "+" + pfmt
        counts[key] = counts.get(key, 0) + 1
    total_mb = sum(
        os.path.getsize(os.path.join(FLAGS.out_dir, f))
        for f in os.listdir(FLAGS.out_dir)
    ) / 1e6
    print(f"wrote {FLAGS.clips} clips ({FLAGS.seconds:g} s @ "
          f"{audio.sample_rate} Hz, {layout.n_joints}x{layout.joint_dim} "
          f"poses @ {audio.feature_rate:g} fps) -> {FLAGS.out_dir} "
          f"({total_mb:.1f} MB)")
    for k in sorted(counts):
        print(f"  {k}: {counts[k]}")


if __name__ == "__main__":
    app.run(main)
