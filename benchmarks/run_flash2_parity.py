"""Second-order flash attention on the real chip (ops/flash2.py).

Three measurements, one JSON line each:

1. ``flash2_gp_parity`` — COMPILED-kernel second-order parity: the
   WGAN-GP value and d_params-gradients through a flash2-routed
   TransformerCritic vs the SAME critic (identical params) forced onto
   the XLA einsum path, T=512, f32 matmul precision. This is the
   reverse-over-reverse the GP actually takes in training; the CPU-scale
   twin lives in tests/test_flash2.py::test_critic_gp_flash2_matches_xla.
   Asserts on violation (exit 1), same contract as run_tpu_parity.py.
2. ``attn_long_ac_train_b16_30s`` — the attn_long_ac preset's train
   step: attention G (flash) + attention critic (flash2) under WGAN-GP
   at whole-30 s clips (T=905), steps/s + MFU. Before ops/flash2.py the
   attention critic could not train at this length at all (the stock
   flash kernel's custom_vjp is once-differentiable; the einsum path
   materializes [B, h, T, T] at every differentiation level) — the
   round-3 ledger's "the critic never flashes" finding is retired by
   this row existing.
3. ``attn_long_train_b16_30s`` — the TCN-critic pairing at the same
   scale, for the cost-of-the-attention-critic comparison.

Run on TPU: ``python benchmarks/run_flash2_parity.py [--steps 20]``.
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.flops import step_mfu
from benchmarks.harness import emit, time_scan_steps
from music2dance_tpu.audio import AudioConfig
from music2dance_tpu.configs.presets import preset
from music2dance_tpu.data.synthetic import synthetic_batch
from music2dance_tpu.models import build_discriminator
from music2dance_tpu.train import TrainConfig, init_state, make_train_step


def _gp_loss(disc, params, poses, feats):
    def scores(x):
        return jnp.sum(disc.apply(params, x, feats))

    g = jax.grad(scores)(poses)
    sq = jnp.sum(g * g, axis=tuple(range(1, g.ndim)))
    norms = jnp.sqrt(sq + 1e-12)
    return jnp.mean((norms - 1.0) ** 2)


def parity(t: int = 512, b: int = 2):
    # full-scale attention critic (the attn preset's discriminator),
    # f32: the check isolates the flash2 AD structure, not bf16 rounding
    base = preset("attn").gan.discriminator
    feats_dim = AudioConfig().n_features
    poses = jax.random.normal(
        jax.random.key(0), (b, t, base.layout.pose_dim))
    feats = jax.random.normal(jax.random.key(1), (b, t, feats_dim))
    values, grads = {}, {}
    with jax.default_matmul_precision("float32"):
        for impl in ("flash2", "xla"):
            cfg = dataclasses.replace(base, attn_impl=impl, dtype="float32")
            disc = build_discriminator(cfg)
            params = disc.init(jax.random.key(2), poses, feats)
            gp = jax.jit(lambda p, d=disc: _gp_loss(d, p, poses, feats))
            values[impl] = float(gp(params))
            grads[impl] = jax.jit(jax.grad(gp))(params)
    val_rel = abs(values["flash2"] - values["xla"]) / (
        abs(values["xla"]) + 1e-12)
    # Per-leaf relative diff with a NOISE FLOOR on the denominator. Some
    # critic parameters have an ANALYTICALLY ZERO gp-gradient: the
    # attention k bias shifts every logit of a query row equally
    # (softmax-invariant), and additive score-path biases vanish under
    # the GP's d/d_poses — both paths compute O(1e-9) reduction-order
    # noise there, and a pure-relative comparison of noise against noise
    # reads as O(1) divergence while every REAL leaf agrees to ~1e-6
    # (measured on-chip, benchmarks/debug_flash2.py; same knife edge
    # tests/test_tp.py documents). Flooring the denominator at
    # 1e-4 x the global grad scale turns those leaves into an absolute
    # check at a tolerance 30x above their noise, without loosening any
    # leaf that carries signal.
    leaves_x = jax.tree_util.tree_leaves(grads["xla"])
    gmax = max(float(np.abs(np.asarray(x)).max()) for x in leaves_x)
    worst = 0.0
    for a, b_ in zip(jax.tree_util.tree_leaves(grads["flash2"]), leaves_x):
        a, b_ = np.asarray(a), np.asarray(b_)
        denom = max(float(np.abs(b_).max()), 1e-4 * gmax) + 1e-12
        worst = max(worst, float(np.abs(a - b_).max() / denom))
    emit("flash2_gp_parity", t=t, batch=b,
         gp_value_flash2=round(values["flash2"], 6),
         gp_value_xla=round(values["xla"], 6),
         value_rel_diff=round(val_rel, 8),
         grad_worst_rel_diff=round(worst, 8))
    assert val_rel < 1e-4, f"GP value diverged: {val_rel}"
    assert worst < 5e-3, f"GP d_params grads diverged: {worst}"


def bench_preset(name: str, steps: int):
    p = preset(name)
    gan = dataclasses.replace(
        p.gan,
        generator=dataclasses.replace(p.gan.generator, dtype="bfloat16"),
        discriminator=dataclasses.replace(
            p.gan.discriminator, dtype="bfloat16"),
    )
    tc = TrainConfig(batch_size=16, clip_seconds=30.0, n_critic=1)
    audio = AudioConfig()
    batch = jax.device_put(synthetic_batch(jax.random.key(3), 16, 30.0, audio))
    t = batch["feats"].shape[1]
    state = init_state(jax.random.key(1), gan, tc, batch)
    sps, _ = time_scan_steps(make_train_step(gan, tc), state, batch,
                             n_steps=steps)
    m = step_mfu(gan, tc, t, sps, "bfloat16")
    emit(f"{name}_train_b16_30s", dtype="bfloat16", t=t,
         critic_arch=gan.discriminator.arch,
         train_steps_per_sec=round(sps, 2),
         examples_per_sec=round(sps * tc.batch_size, 1),
         gflops_per_step=round(m["flops_per_step"] / 1e9, 1),
         tflops_per_sec=round(m["tflops_per_sec"], 1),
         mfu=round(m["mfu"], 3))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--part", default="all",
                    choices=["all", "parity", "bench"])
    args = ap.parse_args()
    if args.part in ("all", "parity"):
        parity()
    if args.part in ("all", "bench"):
        bench_preset("attn_long_ac", args.steps)
        bench_preset("attn_long", args.steps)


if __name__ == "__main__":
    main()
