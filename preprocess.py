"""CLI preprocessing: raw (wav, pose) pairs -> feature cache.

Mirrors the reference's eager preprocess-and-cache step (SURVEY.md §1);
the cache feeds the feature_cache / device_store training input modes.

  python preprocess.py --data_dir songs/ --out_dir cache/
  python preprocess.py --synthetic --out_dir cache/   # synthetic corpus
"""

from __future__ import annotations

from absl import app, flags

FLAGS = flags.FLAGS
flags.DEFINE_string("data_dir", None,
                    "directory of paired song.wav + song.{npy,json,bvh} poses")
flags.DEFINE_list("bvh_joints", None,
                  "joint names to select (in order) from .bvh pose files; "
                  "default keeps every skeleton joint")
flags.DEFINE_float("bvh_scale", None,
                   "unit scale applied to .bvh joint positions")
flags.DEFINE_bool("bvh_center_root", True,
                  "subtract the root position per frame when ingesting "
                  ".bvh poses (standard dance-corpus normalization; pass "
                  "--nobvh_center_root for corpora whose .npy/.json clips "
                  "are not centered, e.g. make_corpus.py output)")
flags.DEFINE_bool("synthetic", False, "generate a synthetic corpus instead")
flags.DEFINE_integer("synthetic_clips", 64, "synthetic corpus size")
flags.DEFINE_float("synthetic_seconds", 6.0, "synthetic clip length")
flags.DEFINE_string("out_dir", None, "output cache directory (.npz per clip)")
flags.DEFINE_string("frontend", "auto", "frontend impl: auto | xla | pallas")
flags.DEFINE_integer("seed", 0, "rng seed for synthetic data")
flags.DEFINE_string("stats_out", None,
                    "also write corpus-level frontend stats JSON here "
                    "(frozen normalization/top_db constants for streaming "
                    "inference — serve.py --stream_stats)")
flags.mark_flag_as_required("out_dir")


def main(argv):
    del argv
    from music2dance_tpu.audio import AudioConfig
    from music2dance_tpu.data.cache import PrecomputedFeatureSource
    from music2dance_tpu.data.pipeline import SyntheticClipSource, WavPoseSource
    from music2dance_tpu.models.configs import JointLayout

    audio = AudioConfig()
    if FLAGS.data_dir:
        source = WavPoseSource(
            FLAGS.data_dir, pose_fps=audio.feature_rate,
            bvh_joints=FLAGS.bvh_joints, bvh_scale=FLAGS.bvh_scale,
            bvh_center_root=FLAGS.bvh_center_root)
    elif FLAGS.synthetic:
        source = SyntheticClipSource(
            FLAGS.synthetic_clips, FLAGS.synthetic_seconds, audio,
            JointLayout(), FLAGS.seed,
        )
    else:
        raise app.UsageError("pass --data_dir or --synthetic")

    pre = PrecomputedFeatureSource(
        source, audio, frontend_impl=FLAGS.frontend, cache_dir=FLAGS.out_dir
    )
    sample = pre[0]
    print(
        f"cached {len(pre)} clips -> {FLAGS.out_dir} "
        f"(feats {sample['feats'].shape}, pose {sample['pose'].shape})"
    )

    if FLAGS.stats_out:
        from music2dance_tpu.infer.streaming import FrontendStats

        stats = FrontendStats.from_corpus(
            [source[i]["wave"] for i in range(len(source))], audio)
        with open(FLAGS.stats_out, "w") as f:
            f.write(stats.to_json())
        print(f"corpus frontend stats -> {FLAGS.stats_out} "
              f"(peak_db {stats.peak_db:.2f})")


if __name__ == "__main__":
    app.run(main)
