"""CLI training report: metrics JSONL -> one curve figure + text summary.

  python report.py --metrics runs/flagship_beat --out report.png
  python report.py --metrics runA/metrics.jsonl,runB/metrics.jsonl \
      --labels constant,cosine --out compare.png --smooth 0.9

Accepts one or more runs (paths to metrics.jsonl or to the directory
holding it). One run: panels follow utils/report.DEFAULT_PANELS (losses,
wasserstein, GP, throughput, eval metrics present). Several runs: one
metric per panel, one color per run.
"""

from __future__ import annotations

import json

from absl import app, flags

FLAGS = flags.FLAGS
flags.DEFINE_list("metrics", None,
                  "metrics.jsonl path(s) or run director(ies)")
flags.DEFINE_list("labels", None,
                  "legend label per run (default: the path)")
flags.DEFINE_string("out", "report.png", "output figure (.png/.svg/.pdf)")
flags.DEFINE_float("smooth", 0.0,
                   "EMA smoothing weight in [0, 1) (raw curve stays as a "
                   "faint underlay)")
flags.DEFINE_string("title", None, "figure title")
flags.DEFINE_list("keys", None,
                  "plot exactly these metric keys (one panel each) "
                  "instead of the default panel set")
flags.mark_flag_as_required("metrics")


def main(argv):
    del argv
    from music2dance_tpu.utils.report import (load_metrics, render_report,
                                              summarize)

    paths = FLAGS.metrics
    labels = FLAGS.labels or paths
    if len(labels) != len(paths):
        raise app.UsageError(
            f"{len(labels)} labels for {len(paths)} runs")
    runs = {lab: load_metrics(p) for lab, p in zip(labels, paths)}
    panels = [(k, [k]) for k in FLAGS.keys] if FLAGS.keys else None
    drawn = render_report(runs, FLAGS.out, panels=panels,
                          smooth=FLAGS.smooth, title=FLAGS.title)
    print(f"{FLAGS.out}: {len(drawn)} panels ({', '.join(drawn)})")
    for lab in labels:
        print(f"== {lab}")
        print(json.dumps(summarize(runs[lab]), indent=None))


if __name__ == "__main__":
    app.run(main)
