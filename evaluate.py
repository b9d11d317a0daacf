"""CLI offline evaluation: checkpoint + dataset -> quality metrics JSON.

Completes the CLI surface (train.py / generate.py / preprocess.py /
evaluate.py): score a trained checkpoint on held-out data without
running a training loop — the same metric pass the in-loop Evaluator
runs (held-out Wasserstein, Fréchet motion distance over pooled
sequences, kinematics, diversity, and — when batches carry raw waves —
generated vs real beat alignment).

  python evaluate.py --ckpt runs/full_ckpt --synthetic --corpus beat
  python evaluate.py --ckpt runs/full_ckpt --data_dir clips/ --batches 8
  python evaluate.py --ckpt runs/full_ckpt --synthetic --out metrics.json
"""

from __future__ import annotations

import json

from absl import app, flags

FLAGS = flags.FLAGS
flags.DEFINE_string("ckpt", None, "checkpoint directory (orbax bundle)")
flags.DEFINE_string("data_dir", None, ".npz clip directory")
flags.DEFINE_bool("synthetic", False, "evaluate on synthetic clips")
flags.DEFINE_enum("corpus", "beat", ["beat", "noise"],
                  "--synthetic corpus (beat = the learnable one)")
flags.DEFINE_integer("synthetic_clips", 64, "synthetic dataset size")
flags.DEFINE_integer("batches", 4, "number of fixed eval batches")
flags.DEFINE_integer("batch_size", 16, "eval batch size")
flags.DEFINE_float("clip_seconds", 6.0, "clip length drawn per batch")
flags.DEFINE_integer("seed", 0, "eval noise/data seed")
flags.DEFINE_string("out", None, "also write the metrics JSON here")
flags.DEFINE_string(
    "step", "latest",
    "checkpoint step to score: a number, 'latest', or 'best' "
    "(the best-by-eval_fmd slot kept when training ran with --eval_every)")
flags.mark_flag_as_required("ckpt")


def main(argv):
    del argv
    from music2dance_tpu.ckpt.orbax_io import restore_bundle
    from music2dance_tpu.data.pipeline import (
        BeatClipSource,
        NpzClipSource,
        SyntheticClipSource,
        make_dataset,
    )
    from music2dance_tpu.eval.evaluator import evaluator_from_iterator

    step = FLAGS.step if FLAGS.step in ("latest", "best") else int(FLAGS.step)
    gan, audio, state = restore_bundle(FLAGS.ckpt, step=step)
    layout = gan.generator.layout

    if FLAGS.data_dir:
        source = NpzClipSource(FLAGS.data_dir)
    elif FLAGS.synthetic:
        cls = BeatClipSource if FLAGS.corpus == "beat" else SyntheticClipSource
        source = cls(FLAGS.synthetic_clips, FLAGS.clip_seconds, audio, layout,
                     FLAGS.seed)
    else:
        raise app.UsageError("pass --data_dir or --synthetic")

    ds = make_dataset(source, FLAGS.batch_size, FLAGS.clip_seconds, audio,
                      seed=FLAGS.seed, shuffle=False)
    ev = evaluator_from_iterator(gan, ds, audio, seed=FLAGS.seed,
                                 n_batches=FLAGS.batches)
    if ev is None:
        raise app.UsageError("dataset yielded no batches")

    metrics = {"step": int(state.step), **ev(state)}
    line = json.dumps(metrics, sort_keys=True)
    print(line)
    if FLAGS.out:
        with open(FLAGS.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    app.run(main)
