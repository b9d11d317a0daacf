"""CLI inference entry point (reference: `python generate.py <flags>`).

  python generate.py --ckpt runs/full --wav song.wav --out poses.npy
  python generate.py --ckpt runs/full --wav_dir songs/ --out_dir poses/
  python generate.py --ckpt runs/full --wav song.wav --video dance.mp4
"""

from __future__ import annotations

import os

import numpy as np
from absl import app, flags

FLAGS = flags.FLAGS
flags.DEFINE_string("ckpt", None, "checkpoint directory (orbax bundle)")
flags.DEFINE_string("wav", None, "input song (wav/flac/aiff/mp3/ogg/m4a)")
flags.DEFINE_string("wav_dir", None, "directory of songs for batched decode")
flags.DEFINE_string("out", "poses.npy", "output pose file [T, J, D] "
                    "(.npy, .json with fps/layout metadata, or .bvh "
                    "position-channel mocap for DCC import)")
flags.DEFINE_enum("pose_format", "npy", ["npy", "json", "bvh"],
                  "per-song output format for --out_dir mode")
flags.DEFINE_string("out_dir", "poses_out", "output directory for --wav_dir")
flags.DEFINE_string("video", None, "render a stick-figure animation here (.mp4/.gif)")
flags.DEFINE_integer("seed", 0, "latent seed")
flags.DEFINE_string(
    "step", "latest",
    "checkpoint step to load: a number, 'latest', or 'best' "
    "(the best-by-eval_fmd slot kept when training ran with --eval_every)")
flags.mark_flag_as_required("ckpt")


def _parse_step(s: str):
    return s if s in ("latest", "best") else int(s)


def main(argv):
    del argv
    from music2dance_tpu.data.wav import (SUPPORTED_EXTENSIONS, load_wav,
                                          load_wav_pcm16)
    from music2dance_tpu.infer.poses_io import save_poses
    from music2dance_tpu.infer import Music2DanceModel

    model = Music2DanceModel.from_checkpoint(FLAGS.ckpt,
                                             step=_parse_step(FLAGS.step))

    sr_model = model.audio.sample_rate  # librosa.load(sr=...) semantics:
    # any input rate is resampled to the model rate (audio/resample.py)

    if FLAGS.wav_dir:
        names = sorted(f for f in os.listdir(FLAGS.wav_dir)
                       if f.endswith(SUPPORTED_EXTENSIONS))
        # mono PCM16 files already at the model rate stay int16 end-to-end
        # (half the host->device bytes; bit-identical features) — mixed
        # batches fall back to f32 in pad_and_extract_batch
        waves = [
            load_wav_pcm16(os.path.join(FLAGS.wav_dir, n), target_sr=sr_model)[0]
            for n in names
        ]
        outs = model.generate_batch(waves, seed=FLAGS.seed)
        os.makedirs(FLAGS.out_dir, exist_ok=True)
        fps = sr_model / model.audio.hop_length
        for n, poses in zip(names, outs):
            stem = os.path.splitext(n)[0]
            save_poses(os.path.join(FLAGS.out_dir, stem + "." + FLAGS.pose_format),
                       poses, fps=fps)
        print(f"decoded {len(outs)} songs -> {FLAGS.out_dir}")
        return

    if not FLAGS.wav:
        raise app.UsageError("pass --wav or --wav_dir")
    wave, _sr = load_wav(FLAGS.wav, target_sr=sr_model)
    poses = model.generate(wave, seed=FLAGS.seed)
    save_poses(FLAGS.out, poses, fps=sr_model / model.audio.hop_length)
    print(f"{FLAGS.wav} -> {FLAGS.out} poses {poses.shape}")

    if FLAGS.video:
        from music2dance_tpu.utils.visualize import render_pose_video

        render_pose_video(poses, FLAGS.video, fps=model.audio.feature_rate)
        print(f"rendered {FLAGS.video}")


if __name__ == "__main__":
    app.run(main)
