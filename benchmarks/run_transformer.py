"""Attention family vs recurrent family, same scale, same workload.

Train: the `attn` preset (batch 32, 6 s clips) against the `full`
recurrent preset — the recurrent step is per-timestep latency-bound
even with the fused kernel bank (DESIGN.md §3); the attention step is
parallel over time, so it is pure batched MXU work with no custom
kernels at all. Decode: both families at the same [B, T] on the masked
batched decode path.

The attention context is the whole clip, so the family's practical clip
length is bounded by the T^2 attention term (fine for the 3-30 s
training regime; 180 s songs need windowed attention — documented as a
limitation in DESIGN.md §12).

Run on TPU: ``python benchmarks/run_transformer.py [--dtype bfloat16]``.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.flops import step_mfu
from benchmarks.harness import emit, force, time_scan_steps
from music2dance_tpu.audio import AudioConfig
from music2dance_tpu.data.synthetic import synthetic_batch
from music2dance_tpu.infer.decode import decode_poses
from music2dance_tpu.models import full_gan, transformer_gan
from music2dance_tpu.train import TrainConfig, init_state, make_train_step


def bench_train(gan, tc, batch, t, dtype, name, steps):
    state = init_state(jax.random.key(1), gan, tc, batch)
    sps, _ = time_scan_steps(make_train_step(gan, tc), state, batch,
                             n_steps=steps)
    m = step_mfu(gan, tc, t, sps, dtype)
    emit(
        name, dtype=dtype, arch=gan.generator.arch,
        train_steps_per_sec=round(sps, 2),
        examples_per_sec=round(sps * tc.batch_size, 1),
        gflops_per_step=round(m["flops_per_step"] / 1e9, 1),
        tflops_per_sec=round(m["tflops_per_sec"], 1),
        mfu=round(m["mfu"], 3),
    )
    return sps


def bench_decode(gan, b, seconds, audio, name, reps=20):
    feats = jnp.asarray(np.random.default_rng(0).standard_normal(
        (b, audio.num_frames(audio.num_samples(seconds)), audio.n_features),
        ).astype(np.float32))
    t = feats.shape[1]
    lengths = jnp.full((b,), t, jnp.int32)
    sample = {
        "feats": np.zeros((1, 4, audio.n_features), np.float32),
        "poses": np.zeros((1, 4, gan.generator.pose_dim), np.float32),
    }
    state = init_state(jax.random.key(1), gan,
                       TrainConfig(batch_size=1), sample)
    fn = jax.jit(lambda p, f, k, ln: decode_poses(p, gan.generator, f, k, lengths=ln))
    key = jax.random.key(2)
    force(fn(state.g_params, feats, key, lengths))  # compile + warm
    force(fn(state.g_params, feats, key, lengths))
    t0 = time.perf_counter()
    for _ in range(reps):
        force(fn(state.g_params, feats, key, lengths))
    dt = (time.perf_counter() - t0) / reps
    fps = b * t / dt
    emit(name, arch=gan.generator.arch, batch=b, t=t,
         frames_per_sec=round(fps, 0), ms_per_batch=round(dt * 1e3, 2))
    return fps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--steps", type=int, default=100)
    args = ap.parse_args()

    audio = AudioConfig()
    tc = TrainConfig(batch_size=32, clip_seconds=6.0, n_critic=1)
    batch = jax.device_put(
        synthetic_batch(jax.random.key(0), 32, 6.0, audio))
    t = batch["feats"].shape[1]

    attn = transformer_gan(feature_dim=audio.n_features, dtype=args.dtype)
    rnn = full_gan(feature_dim=audio.n_features, dtype=args.dtype)

    sps_a = bench_train(attn, tc, batch, t, args.dtype,
                        "attn_train_b32_6s", args.steps)
    sps_r = bench_train(rnn, tc, batch, t, args.dtype,
                        "rnn_train_b32_6s", args.steps)
    emit("train_speedup_attn_vs_rnn", ratio=round(sps_a / sps_r, 2))

    # MoE generator (8 experts, top-2): ~2x the dense MLP FLOPs per
    # token (topk * capacity) buying 8x the MLP parameter capacity;
    # the MFU accounting includes the dense-dispatch einsums
    import dataclasses as _dc0

    moe = _dc0.replace(
        attn, generator=_dc0.replace(attn.generator,
                                     moe_experts=8, moe_topk=2),
    )
    bench_train(moe, tc, batch, t, args.dtype,
                "attn_moe8_train_b32_6s", args.steps)

    fps_a = bench_decode(attn, 64, 6.0, audio, "attn_decode_b64_6s")
    fps_r = bench_decode(rnn, 64, 6.0, audio, "rnn_decode_b64_6s")
    emit("decode_speedup_attn_vs_rnn", ratio=round(fps_a / fps_r, 2))

    # whole-30s-clip training (the attn_long preset: flash-attention G +
    # dilated TCN critic): T=905 rides the Pallas flash kernel — full
    # attention would need a [16, 4, 905, 905] logits tensor per block
    # per pass, and the recurrent family needs TBPTT at this length
    import dataclasses as _dc

    from music2dance_tpu.configs.presets import preset

    p_long = preset("attn_long")
    gan_l = p_long.gan
    if args.dtype != "float32":
        gan_l = _dc.replace(
            gan_l,
            generator=_dc.replace(gan_l.generator, dtype=args.dtype),
            discriminator=_dc.replace(gan_l.discriminator, dtype=args.dtype),
        )
    tc_l = TrainConfig(batch_size=16, clip_seconds=30.0, n_critic=1)
    batch_l = jax.device_put(
        synthetic_batch(jax.random.key(3), 16, 30.0, audio))
    bench_train(gan_l, tc_l, batch_l, batch_l["feats"].shape[1], args.dtype,
                "attn_long_train_b16_30s", max(10, args.steps // 5))

    # flash-vs-XLA attention parity at the long-clip shape (the routed
    # core must not change the model)
    from music2dance_tpu.models import build_generator

    g_flash = attn.generator
    g_xla = _dc.replace(g_flash, attn_impl="xla")
    feats = batch_l["feats"][:2]
    z = jax.random.normal(jax.random.key(4), (2, g_flash.noise_dim))
    params = build_generator(g_xla).init(jax.random.key(5), feats, z)
    # head_out is zero-init (training stability), which would make both
    # outputs exactly zero — give it weight so the parity check compares
    # real numbers
    ho = params["params"]["head_out"]["kernel"]
    params["params"]["head_out"]["kernel"] = (
        jax.random.normal(jax.random.key(6), ho.shape, ho.dtype) * 0.02
    )
    p_f = jax.jit(lambda p, f, zz: build_generator(g_flash).apply(p, f, zz))(params, feats, z)
    p_x = jax.jit(lambda p, f, zz: build_generator(g_xla).apply(p, f, zz))(params, feats, z)
    denom = float(jnp.abs(p_x).max())
    emit("flash_vs_xla_decode_parity", t=int(feats.shape[1]),
         max_rel_diff=round(float(jnp.abs(p_f - p_x).max()) / denom, 6))


if __name__ == "__main__":
    main()
