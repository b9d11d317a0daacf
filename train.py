"""CLI training entry point (reference: `python train.py <flags>`).

Examples:
  python train.py --preset tiny --steps 100 --synthetic
  python train.py --preset full --steps 10000 --data_dir clips/ \
      --ckpt_dir runs/full --metrics_dir runs/full
  python train.py --preset full --dp 4 ...        # 4-device data parallel
"""

from __future__ import annotations

from absl import app, flags

FLAGS = flags.FLAGS
flags.DEFINE_string(
    "preset", "tiny",
    "config preset: tiny (smoke-test scale) | full (the flagship "
    "architecture, BASELINE config #3) | long (30 s clips with TBPTT, "
    "config #4) | perf (full architecture at the throughput-tuned batch "
    "— the fastest measured steps/s, see benchmarks/RESULTS.md) | attn "
    "(the attention family: causal-transformer G+D, parallel over time) "
    "| attn_long (attention on whole 30 s clips via flash attention — "
    "no TBPTT)")
flags.DEFINE_integer("steps", 100, "ABSOLUTE target step: a --restore'd "
                     "run continues its numbering up to this total")
flags.DEFINE_string("data_dir", None, ".npz clip directory (data/pipeline.NpzClipSource)")
flags.DEFINE_string("audio_dir", None,
                    "directory of paired audio + pose FILES — the "
                    "production corpus layout: song.{wav,flac,mp3,ogg,"
                    "aiff,m4a} next to song.{npy,json,bvh} "
                    "(data/pipeline.WavPoseSource; see make_corpus.py)")
flags.DEFINE_list("bvh_joints", None,
                  "joint names to select (in order) from .bvh pose files "
                  "under --audio_dir; default keeps every skeleton joint")
flags.DEFINE_float("bvh_scale", None,
                   "unit scale applied to .bvh joint positions")
flags.DEFINE_bool("bvh_center_root", True,
                  "subtract the root position per frame when ingesting "
                  ".bvh poses (standard dance-corpus normalization; pass "
                  "--nobvh_center_root for corpora whose .npy/.json clips "
                  "are not centered, e.g. make_corpus.py output)")
flags.DEFINE_bool("synthetic", False, "train on synthetic clips (no data needed)")
flags.DEFINE_integer("synthetic_clips", 256, "synthetic dataset size")
flags.DEFINE_enum("corpus", "beat", ["beat", "noise"],
                  "--synthetic corpus: beat = learnable beat-driven motion "
                  "(audio onsets drive the poses; eval metrics can improve), "
                  "noise = structureless shapes-only clips (throughput "
                  "benchmarking)")
flags.DEFINE_string("ckpt_dir", None, "orbax checkpoint directory")
flags.DEFINE_string("metrics_dir", None, "metrics JSONL directory")
flags.DEFINE_bool("tensorboard", False,
                  "also write TensorBoard scalars under metrics_dir/tb")
flags.DEFINE_string("restore", None, "checkpoint to resume from")
flags.DEFINE_string("restore_step", "latest",
                    "which step of --restore to load: a number, 'latest', "
                    "or 'best' (the best-by-eval_fmd slot)")
flags.DEFINE_string("restore_torch", None,
                    "torch checkpoint (.pt, {'generator','discriminator'"
                    "[,'opt_g','opt_d']}) to start from — the reference-"
                    "interop path (ckpt/torch_convert); the preset must "
                    "match the checkpoint's architecture")
flags.DEFINE_integer("dp", 0, "data-parallel devices (0 = single device)")
flags.DEFINE_integer("seed", 0, "rng seed")
flags.DEFINE_integer("workers", 0, "grain worker processes for host decode")
flags.DEFINE_string("trace_dir", None, "capture a jax.profiler trace here")
flags.DEFINE_enum("input_mode", "stream", ["stream", "feature_cache", "device_store"],
                  "stream: raw waves per step; feature_cache: preprocess-time "
                  "feature pipeline; device_store: whole cached dataset in HBM "
                  "with on-device sampling (fastest when it fits)")
flags.DEFINE_string("cache_dir", None, "feature cache directory (.npz)")
flags.DEFINE_bool("bf16", False, "bfloat16 compute dtype (params stay f32)")
flags.DEFINE_enum("cell", "", ["", "gru", "lstm"],
                  "recurrent cell family for G and D (default: preset's, "
                  "gru). Both ride the same fused kernel bank.")
flags.DEFINE_integer("moe_experts", 0, "mixture-of-experts MLP in the "
                     "generator's attention blocks (attn/attn_long presets "
                     "only): number of experts (0 = dense MLP). Expert "
                     "weights shard over an expert mesh axis "
                     "(parallel/ep.py) at scale-out")
flags.DEFINE_integer("moe_topk", 2, "experts per token for --moe_experts")
flags.DEFINE_integer("eval_every", 0, "held-out eval cadence in steps (0 = off)")
flags.DEFINE_integer("ckpt_every", 0, "checkpoint cadence in steps (0 = "
                     "size-aware default: the preset's 500, raised "
                     "automatically for big TrainStates so the async "
                     "save's device->host fetch stays <= ~64 KB/step of "
                     "link traffic — e.g. the ~320 MB attention state "
                     "checkpoints every ~5000 steps. An explicit value "
                     "here is used verbatim)")
flags.DEFINE_integer("log_every", 0, "metrics/log cadence in steps (0 = preset "
                     "default, 50). THE single most throughput-critical knob "
                     "in device_store mode: it is the scan-fused chunk length, "
                     "and on dispatch-latency-bound hosts (e.g. a tunneled "
                     "TPU) raising it from 50 to 500 measured 136 -> 204 "
                     "steps/s end to end. eval_every/ckpt_every are rounded "
                     "up to a chunk multiple in that mode")
flags.DEFINE_float("val_fraction", 0.1, "held-out clip fraction for --eval_every")
flags.DEFINE_enum("lr_schedule", "", ["", "constant", "cosine"],
                  "override the preset's lr schedule (cosine decays to "
                  "lr*lr_final_frac over --lr_decay_steps)")
flags.DEFINE_integer("lr_decay_steps", 0, "cosine decay horizon (0 = "
                     "use --steps)")
flags.DEFINE_float("ema_decay", 0.0, "EMA of generator weights (0 = off); "
                   "eval and inference use the averaged weights")
flags.DEFINE_float("mismatch_weight", 0.0, "matching-aware critic term: "
                   "score (real poses, rolled audio) as an extra fake class "
                   "— forces audio-conditioning (train/conditioning.py)")
flags.DEFINE_string("best_metric", "", "eval metric the best/ checkpoint "
                    "slot tracks (default: preset's, fmd); e.g. "
                    "beat_alignment for conditioning runs")
flags.DEFINE_enum("best_mode", "", ["", "min", "max"], "direction for "
                  "--best_metric (default: min; beat_alignment wants max)")
flags.DEFINE_float("best_fmd_gate", 0.0, "only evals with fmd <= this are "
                   "eligible for the best/ slot (0 = off) — keeps a "
                   "metric-maximizing slot from capturing pre-convergence "
                   "garbage motion")
flags.DEFINE_float("drift_eps", 0.0, "critic drift regularizer "
                   "eps * E[D(real)^2] (0 = off): bounds the critic's "
                   "score scale, the zero-centered-GP-era damper for "
                   "late-run adversarial runaway")
flags.DEFINE_bool("joint_gp", False, "gradient penalty over the JOINT "
                  "(poses, audio) critic input — bounds the audio-"
                  "sensitivity the mismatch class rewards (conditional-"
                  "WGAN-GP completeness; XLA critic phase)")
flags.DEFINE_float("beat_loss", 0.0, "G auxiliary: differentiable twin of "
                   "the eval beat-alignment metric (0 = off)")
flags.DEFINE_float("beat_loss_final", 0.0, "annealed floor for --beat_loss "
                   "(only with --beat_loss_anneal_steps > 0)")
flags.DEFINE_integer("beat_loss_anneal_steps", 0, "cosine-anneal the beat "
                     "aux weight from --beat_loss to --beat_loss_final "
                     "over this many steps (0 = constant weight)")
flags.DEFINE_bool("onset_channel", False, "structural conditioning: append "
                  "the causal c0-flux onset channel to the generator's "
                  "audio input (models/generator.append_onset_channel); "
                  "plain-step + offline-decode only")
flags.DEFINE_bool("film_cond", False, "structural conditioning (attention "
                  "family): FiLM-modulate every block's pre-LN activations "
                  "from the audio encoding (zero-init; identity at init)")
flags.DEFINE_float("feature_matching", 0.0, "MelGAN-style feature-matching "
                   "aux loss weight (0 = off)")
flags.DEFINE_float("grad_clip", 0.0, "global-norm gradient clip (0 = off)")
flags.DEFINE_integer("grad_accum", 0, "gradient-accumulation microbatches "
                     "(0/1 = off): each update averages grads over K "
                     "sequential slices of the batch — the EXACT big-batch "
                     "update at one slice's activation memory; incompatible "
                     "with TBPTT")
flags.DEFINE_integer("n_critic", 0, "critic updates per alternating step "
                     "(0 = preset default). Statically unrolled in the "
                     "jitted step; the WGAN-GP convention is 5, the "
                     "presets default to 1 (measured sufficient on the "
                     "beat corpus)")
flags.DEFINE_bool("aug_rotate", False, "augment real poses with a random "
                  "rotation about the up axis (on device, per example)")
flags.DEFINE_bool("aug_mirror", False, "augment real poses by mirroring "
                  "(coordinate flip; add --aug_mirror_pairs for bilateral "
                  "joint swaps)")
flags.DEFINE_list("aug_mirror_pairs", None, "left/right joint index pairs "
                  "for --aug_mirror as a:b pairs, e.g. 1:4,2:5,3:6")
flags.DEFINE_float("aug_scale", 0.0, "augment real poses with uniform "
                   "scale jitter s ~ U[1-a, 1+a] (0 = off)")
flags.DEFINE_float("aug_noise", 0.0, "Gaussian noise std on real pose "
                   "coordinates (0 = off)")


def main(argv):
    del argv
    if getattr(FLAGS, "log_dir", "") and FLAGS.metrics_dir is None:
        # absl.logging owns --log_dir, so a user passing it expecting the
        # metrics JSONL (the natural guess) could train for an hour and
        # log NOTHING. Only hard-fail when nothing durable would be
        # written at all; a user who also passed --ckpt_dir may
        # legitimately want absl's Python-log directory by itself.
        if FLAGS.ckpt_dir is None:
            raise SystemExit(
                "--log_dir is absl's Python-log directory, not the "
                "metrics sink — pass --metrics_dir for the training "
                "JSONL (and --ckpt_dir for checkpoints)"
            )
        print(
            "WARNING: --log_dir is absl's Python-log directory; the "
            "training metrics JSONL is only written under --metrics_dir "
            "(not set — metrics will not be persisted)",
            flush=True,
        )
    from music2dance_tpu.configs.presets import preset
    from music2dance_tpu.data.pipeline import (
        BeatClipSource,
        NpzClipSource,
        SyntheticClipSource,
        make_dataset,
    )
    from music2dance_tpu.models.configs import JointLayout
    from music2dance_tpu.parallel import make_mesh
    from music2dance_tpu.train.loop import train
    from music2dance_tpu.utils.profiling import trace

    p = preset(FLAGS.preset)
    if FLAGS.bf16 or FLAGS.cell:
        import dataclasses

        from music2dance_tpu.models.configs import GANConfig

        over = {}
        if FLAGS.bf16:
            over["dtype"] = "bfloat16"
        if FLAGS.cell:
            over["cell"] = FLAGS.cell
        p = dataclasses.replace(
            p,
            gan=GANConfig(
                generator=dataclasses.replace(p.gan.generator, **over),
                discriminator=dataclasses.replace(p.gan.discriminator, **over),
            ),
        )
    if FLAGS.onset_channel:
        import dataclasses

        p = dataclasses.replace(
            p, gan=dataclasses.replace(
                p.gan, generator=dataclasses.replace(
                    p.gan.generator, onset_channel=True,
                )
            )
        )
    if FLAGS.film_cond:
        import dataclasses

        if p.gan.generator.arch != "transformer":
            raise app.UsageError(
                "--film_cond modulates attention blocks — it needs the "
                "attention family (--preset attn / attn_long)"
            )
        p = dataclasses.replace(
            p, gan=dataclasses.replace(
                p.gan, generator=dataclasses.replace(
                    p.gan.generator, film_cond=True,
                )
            )
        )
    if FLAGS.moe_experts > 0:
        import dataclasses

        if p.gan.generator.arch != "transformer":
            raise app.UsageError(
                "--moe_experts needs an attention-family preset "
                "(attn/attn_long): the MoE MLP lives in the transformer "
                f"blocks, and preset {FLAGS.preset!r} is arch="
                f"{p.gan.generator.arch!r}"
            )
        p = dataclasses.replace(
            p, gan=dataclasses.replace(
                p.gan, generator=dataclasses.replace(
                    p.gan.generator, moe_experts=FLAGS.moe_experts,
                    moe_topk=FLAGS.moe_topk,
                )
            )
        )
    if FLAGS.log_every > 0:
        import dataclasses

        p = dataclasses.replace(
            p, train=dataclasses.replace(p.train, log_every=FLAGS.log_every)
        )
    if FLAGS.lr_schedule:
        import dataclasses

        p = dataclasses.replace(
            p, train=dataclasses.replace(
                p.train, lr_schedule=FLAGS.lr_schedule,
                lr_decay_steps=FLAGS.lr_decay_steps or FLAGS.steps,
            )
        )
    train_over = {}
    if FLAGS.ckpt_every > 0:
        train_over["ckpt_every"] = FLAGS.ckpt_every
    else:
        # size-aware default cadence (train/loop.size_aware_ckpt_every):
        # hold checkpoint traffic <= 64 KB/step of device->host link time
        # by raising the preset's 500-step cadence for big TrainStates
        # (the ~320 MB attention state -> every ~5000 steps). An explicit
        # --ckpt_every above is used verbatim instead.
        train_over["ckpt_bytes_per_step"] = 64_000.0
    if FLAGS.n_critic > 0:
        train_over["n_critic"] = FLAGS.n_critic
    if FLAGS.ema_decay > 0:
        train_over["ema_decay"] = FLAGS.ema_decay
    if FLAGS.feature_matching > 0:
        train_over["feature_matching_weight"] = FLAGS.feature_matching
    if FLAGS.mismatch_weight > 0:
        train_over["mismatch_weight"] = FLAGS.mismatch_weight
    if FLAGS.joint_gp:
        train_over["joint_gp"] = True
    if FLAGS.best_metric:
        train_over["best_metric"] = FLAGS.best_metric
    if FLAGS.best_mode:
        train_over["best_mode"] = FLAGS.best_mode
    if FLAGS.best_fmd_gate > 0:
        train_over["best_fmd_gate"] = FLAGS.best_fmd_gate
    if FLAGS.drift_eps > 0:
        train_over["drift_eps"] = FLAGS.drift_eps
    if FLAGS.beat_loss > 0:
        train_over["beat_loss_weight"] = FLAGS.beat_loss
    if FLAGS.beat_loss_anneal_steps > 0:
        train_over["beat_loss_anneal_steps"] = FLAGS.beat_loss_anneal_steps
        train_over["beat_loss_final"] = FLAGS.beat_loss_final
    if FLAGS.grad_clip > 0:
        train_over["grad_clip_norm"] = FLAGS.grad_clip
    if FLAGS.grad_accum > 1:
        train_over["grad_accum"] = FLAGS.grad_accum
    if (FLAGS.aug_rotate or FLAGS.aug_mirror or FLAGS.aug_scale > 0
            or FLAGS.aug_noise > 0):
        from music2dance_tpu.data.augment import AugmentConfig

        pairs = tuple(
            tuple(int(i) for i in pair.split(":"))
            for pair in (FLAGS.aug_mirror_pairs or ())
        )
        train_over["augment"] = AugmentConfig(
            rotate=FLAGS.aug_rotate, mirror=FLAGS.aug_mirror,
            mirror_pairs=pairs, scale_jitter=FLAGS.aug_scale,
            noise_std=FLAGS.aug_noise,
        )
    if train_over:
        import dataclasses

        p = dataclasses.replace(
            p, train=dataclasses.replace(p.train, **train_over)
        )
    layout = p.gan.generator.layout

    if FLAGS.data_dir:
        source = NpzClipSource(FLAGS.data_dir)
    elif FLAGS.audio_dir:
        from music2dance_tpu.data.pipeline import WavPoseSource

        source = WavPoseSource(
            FLAGS.audio_dir, pose_fps=p.audio.feature_rate,
            bvh_joints=FLAGS.bvh_joints, bvh_scale=FLAGS.bvh_scale,
            bvh_center_root=FLAGS.bvh_center_root,
        )
    elif FLAGS.synthetic:
        src_cls = BeatClipSource if FLAGS.corpus == "beat" else SyntheticClipSource
        source = src_cls(
            FLAGS.synthetic_clips, p.train.clip_seconds, p.audio, layout, FLAGS.seed
        )
    else:
        raise app.UsageError("pass --data_dir, --audio_dir, or --synthetic")

    mesh = make_mesh(FLAGS.dp) if FLAGS.dp > 0 else None

    evaluator = None
    feature_source = None  # cache-backed modes: the (possibly split) feature view
    if FLAGS.input_mode in ("feature_cache", "device_store"):
        # Build/load the cache over the FULL corpus FIRST so its manifest
        # matches a preprocess.py-built cache (which never saw the eval
        # split); the train/val split then happens at the feature level.
        from music2dance_tpu.data.cache import PrecomputedFeatureSource

        feature_source = PrecomputedFeatureSource(
            source, p.audio, cache_dir=FLAGS.cache_dir
        )
    if FLAGS.eval_every > 0:
        import dataclasses as _dc

        from music2dance_tpu.data.pipeline import split_source
        from music2dance_tpu.eval.evaluator import evaluator_from_iterator

        p = _dc.replace(p, train=_dc.replace(p.train, eval_every=FLAGS.eval_every))
        if feature_source is not None:
            # split the cached features; mirror the SAME clip indices onto
            # the raw source so the evaluator sees waves (beat alignment —
            # the audio-conditioning progress meter)
            from music2dance_tpu.data.pipeline import SubsetSource

            feature_source, val_pre = split_source(
                feature_source, FLAGS.val_fraction, FLAGS.seed)
            val_source = SubsetSource(source, val_pre.indices)
        else:
            source, val_source = split_source(source, FLAGS.val_fraction, FLAGS.seed)
        val_ds = make_dataset(
            val_source, p.train.batch_size, p.train.clip_seconds, p.audio,
            seed=FLAGS.seed + 1, shuffle=False,
        )
        evaluator = evaluator_from_iterator(p.gan, val_ds, p.audio, seed=FLAGS.seed)

    state = None
    resume_dir = FLAGS.restore
    if FLAGS.restore:
        from music2dance_tpu.ckpt.orbax_io import restore_bundle

        rs = (FLAGS.restore_step if FLAGS.restore_step in ("latest", "best")
              else int(FLAGS.restore_step))
        _, _, state = restore_bundle(FLAGS.restore, step=rs)
    elif FLAGS.restore_torch is None and FLAGS.ckpt_dir:
        # Auto-resume (the README/preempt.py contract, round-3 ADVICE
        # high): a scheduler re-running the IDENTICAL command after
        # eviction must continue at the absolute step, not reinitialize
        # at 0 and save low-numbered checkpoints over the existing
        # history. When --ckpt_dir already holds managed steps and no
        # explicit --restore was given, restore the latest one.
        from music2dance_tpu.ckpt.orbax_io import checkpoint_steps, restore_bundle

        if checkpoint_steps(FLAGS.ckpt_dir):
            _, _, state = restore_bundle(FLAGS.ckpt_dir, step="latest")
            resume_dir = FLAGS.ckpt_dir
            print(
                f"auto-resuming from {FLAGS.ckpt_dir} at step "
                f"{int(state.step)} (pass --restore to pick a different "
                "checkpoint, or a fresh --ckpt_dir to start over)"
            )
    if state is None and FLAGS.restore_torch:
        import jax
        import numpy as np

        from music2dance_tpu.ckpt.torch_convert import load_torch_checkpoint
        from music2dance_tpu.train import init_state

        sample = {
            "feats": np.zeros((1, 4, p.audio.n_features), np.float32),
            "poses": np.zeros((1, 4, p.gan.generator.pose_dim), np.float32),
        }
        state = init_state(jax.random.key(FLAGS.seed), p.gan, p.train, sample)
        g, d, opt_g, opt_d = load_torch_checkpoint(
            FLAGS.restore_torch, state.g_params, state.d_params,
            state.opt_g, state.opt_d,
        )
        state = state.replace(
            g_params=g, d_params=d,
            opt_g=opt_g if opt_g is not None else state.opt_g,
            opt_d=opt_d if opt_d is not None else state.opt_d,
        )

    if FLAGS.input_mode == "device_store":
        from music2dance_tpu.data.device_store import DeviceFeatureStore
        from music2dance_tpu.train.loop import train_from_store

        store = DeviceFeatureStore.from_clips(
            [feature_source[i] for i in range(len(feature_source))],
            min_frames=int(round(p.train.clip_seconds * p.audio.feature_rate)),
        )

        def run():
            return train_from_store(
                p.gan, p.train, p.audio, store, FLAGS.steps,
                ckpt_dir=FLAGS.ckpt_dir, log_dir=FLAGS.metrics_dir, mesh=mesh,
                state=state, seed=FLAGS.seed, evaluator=evaluator,
                tensorboard=FLAGS.tensorboard,
            )
    else:
        if FLAGS.input_mode == "feature_cache":
            from music2dance_tpu.data.cache import make_feature_dataset

            ds = make_feature_dataset(
                feature_source, p.train.batch_size, p.train.clip_seconds,
                p.audio, seed=FLAGS.seed, num_workers=FLAGS.workers,
                precomputed=True,
            )
        else:
            ds = make_dataset(
                source, p.train.batch_size, p.train.clip_seconds, p.audio,
                seed=FLAGS.seed, num_workers=FLAGS.workers,
            )

        it = iter(ds)
        if resume_dir:
            from music2dance_tpu.train.loop import restore_data_state

            it = restore_data_state(resume_dir, it)

        def run():
            return train(
                p.gan, p.train, p.audio, it, FLAGS.steps,
                ckpt_dir=FLAGS.ckpt_dir, log_dir=FLAGS.metrics_dir, mesh=mesh,
                state=state, seed=FLAGS.seed, evaluator=evaluator,
                tensorboard=FLAGS.tensorboard,
            )

    if FLAGS.trace_dir:
        with trace(FLAGS.trace_dir):
            final = run()
    else:
        final = run()
    print(f"done: {int(final.step)} steps")


if __name__ == "__main__":
    app.run(main)
