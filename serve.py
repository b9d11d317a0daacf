"""CLI serving entry point: checkpoint -> batched HTTP inference.

  python serve.py --ckpt runs/full --port 8080
  python serve.py --ckpt runs/full --step best --max_batch 32 --warmup

Request contract (music2dance_tpu/infer/serving.py):
  POST /generate?dtype={int16|float32}&seed=N[&format={auto|raw|file}]
      body: an audio FILE (WAV/FLAC/AIFF/MP3/Ogg/M4A — sniffed by magic
      bytes, decoded + resampled server-side; e.g.
      `curl --data-binary @song.mp3 :8080/generate > poses.npy`), or
      raw little-endian mono samples AT THE MODEL SAMPLE RATE
      (format=raw; PCM16 bodies keep the half-width host->device
      path); response: .npy poses.
  POST /stream/open?seed=N&stats={running|none}   -> JSON {session, ...}
  POST /stream/feed?session=ID&dtype=...          raw chunk -> .npy poses
  POST /stream/close?session=ID                   flush -> .npy poses
      online decode sessions (infer/streaming.py): feed audio as it
      arrives, poses come back with ~lag_frames latency; idle sessions
      expire after --stream_ttl seconds.
  GET  /healthz   model geometry + batching/stream stats.

The reference stops at a one-shot generate CLI; this is the concurrent
TPU serving surface (dynamic batching onto a static shape grid).
"""

from __future__ import annotations

from absl import app, flags

FLAGS = flags.FLAGS
flags.DEFINE_string("ckpt", None, "checkpoint directory (orbax bundle)")
flags.DEFINE_string(
    "step", "latest",
    "checkpoint step to load: a number, 'latest', or 'best'")
flags.DEFINE_string("host", "127.0.0.1", "bind address")
flags.DEFINE_integer("port", 8080, "bind port (0 = ephemeral)")
flags.DEFINE_integer("max_batch", 16, "largest coalesced request batch")
flags.DEFINE_float("max_wait_ms", 20.0,
                   "straggler wait once a batch has one request")
flags.DEFINE_float("bucket_seconds", 8.0, "song-length shape-grid pitch")
flags.DEFINE_float("max_seconds", 64.0, "longest accepted song")
flags.DEFINE_bool("warmup", False,
                  "precompile every (batch, length) grid program before "
                  "accepting traffic (first requests skip the compiler)")
flags.DEFINE_integer("max_streams", 64,
                     "cap on concurrently open /stream sessions")
flags.DEFINE_float("stream_ttl", 120.0,
                   "idle seconds before a /stream session is evicted")
flags.DEFINE_string("stream_stats", None,
                    "corpus frontend-stats JSON (preprocess.py "
                    "--stats_out); enables stats=frozen stream sessions")
flags.DEFINE_float("stream_wait_ms", 5.0,
                   "coalescing window: concurrent stream feeds arriving "
                   "within this wait run as ONE lockstep device call "
                   "(0 = solo dispatch per feed)")
flags.DEFINE_float("reload_poll_s", 0.0,
                   "hot checkpoint reload: poll --ckpt every N seconds "
                   "and swap in newer weights without a restart (serve a "
                   "training run live: train with --eval_every and serve "
                   "--step best). 0 = off. Requires --step best|latest.")
flags.mark_flag_as_required("ckpt")


def main(argv):
    del argv
    from music2dance_tpu.infer import (
        InferenceServer,
        Music2DanceModel,
        ServingConfig,
    )

    step = FLAGS.step if FLAGS.step in ("latest", "best") else int(FLAGS.step)
    model = Music2DanceModel.from_checkpoint(FLAGS.ckpt, step=step)
    cfg = ServingConfig(
        max_batch=FLAGS.max_batch,
        max_wait_ms=FLAGS.max_wait_ms,
        bucket_seconds=FLAGS.bucket_seconds,
        max_seconds=FLAGS.max_seconds,
        max_streams=FLAGS.max_streams,
        stream_ttl_s=FLAGS.stream_ttl,
        stream_wait_ms=FLAGS.stream_wait_ms,
    )
    stream_stats = None
    if FLAGS.stream_stats:
        from music2dance_tpu.infer.streaming import FrontendStats

        with open(FLAGS.stream_stats) as f:
            stream_stats = FrontendStats.from_json(f.read())
    server = InferenceServer(model, cfg, host=FLAGS.host, port=FLAGS.port,
                             stream_stats=stream_stats)
    if FLAGS.reload_poll_s > 0:
        from music2dance_tpu.infer.serving import CheckpointWatcher

        if step not in ("best", "latest"):
            raise app.UsageError(
                "--reload_poll_s needs --step best or latest (a pinned "
                "step number never changes)")
        server.watcher = CheckpointWatcher(
            model, FLAGS.ckpt, step_selector=step,
            poll_s=FLAGS.reload_poll_s, registry=server.streams,
            initial_step=None,   # unknown here; first poll aligns it
        )
    if FLAGS.warmup:
        n = server.engine.warmup()
        ns = server.streams.warmup()
        print(f"warmed {n} grid programs + {ns} stream programs")
    host, port = server.address
    print(f"serving {FLAGS.ckpt} (step={step}) on http://{host}:{port} "
          f"[max_batch={cfg.max_batch}, grid={cfg.bucket_seconds}s x "
          f"{cfg.max_seconds}s, sr={model.audio.sample_rate}]")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        if server.watcher is not None:
            server.watcher.close()
        server.close()


if __name__ == "__main__":
    app.run(main)
