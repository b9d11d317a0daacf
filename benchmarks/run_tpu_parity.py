"""COMPILED-kernel parity on real TPU hardware.

The CPU test suite proves every fused kernel equals its XLA reference in
*interpret* mode; this script checks the Mosaic-COMPILED kernels against
the XLA implementations on the actual TPU (forward outputs and
first-order gradients), so compiler-specific issues (layouts, uneven
trailing blocks, bf16 tiling) are caught directly. Prints one JSON line
per check; exits nonzero on any tolerance violation.

Run after kernel changes alongside bench.py (the verify recipe's
kernel-change flow). Compiles are slow on this tunneled TPU (~1 min
each), so the checks are split: ``--part fwd`` (forward/score parity),
``--part grad`` (gradient parity incl. the second order), default both.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.harness import emit
from music2dance_tpu.audio import AudioConfig
from music2dance_tpu.data.synthetic import synthetic_batch
from music2dance_tpu.models import Discriminator, Generator, full_gan
from music2dance_tpu.ops.fused_critic import fused_critic_apply
from music2dance_tpu.ops.fused_dcore import fused_d_phase
from music2dance_tpu.ops.fused_generator import fused_apply
from music2dance_tpu.ops.fused_generator_vjp import fused_apply_diff
from music2dance_tpu.ops.fused_gdual import fused_dual_apply
from music2dance_tpu.train.losses import critic_loss


def check(name, got, ref, rtol, atol):
    got, ref = np.asarray(got), np.asarray(ref)
    err = float(np.max(np.abs(got - ref) / np.maximum(np.abs(ref), atol / rtol)))
    ok = bool(np.allclose(got, ref, rtol=rtol, atol=atol))
    emit(f"tpu_parity_{name}", ok=ok, max_rel=round(err, 8))
    return ok


def main():
    import argparse

    import dataclasses

    ap = argparse.ArgumentParser()
    ap.add_argument("--part", default="all", choices=["all", "fwd", "grad"])
    ap.add_argument("--cell", default="gru", choices=["gru", "lstm"])
    args = ap.parse_args()
    do_fwd = args.part in ("all", "fwd")
    do_grad = args.part in ("all", "grad")
    if args.part == "all":
        print("# note: the combined run compiles ~10 executables (~1 min each "
              "on the tunneled TPU) — run --part fwd and --part grad "
              "separately if a shell timeout applies", flush=True)
    assert jax.default_backend() == "tpu", "run on the TPU"
    audio = AudioConfig()
    # f32 so the compiled-vs-XLA comparison is tight (bf16 adds rounding)
    gan = full_gan(feature_dim=audio.n_features)
    if args.cell != "gru":
        gan = dataclasses.replace(
            gan,
            generator=dataclasses.replace(gan.generator, cell=args.cell),
            discriminator=dataclasses.replace(gan.discriminator, cell=args.cell),
        )
    gcfg, dcfg = gan.generator, gan.discriminator
    gen, disc = Generator(gcfg), Discriminator(dcfg)
    batch = synthetic_batch(jax.random.key(0), 8, 2.0, audio)
    feats, real = batch["feats"], batch["poses"]
    b = feats.shape[0]
    ks = jax.random.split(jax.random.key(1), 4)
    z1 = jax.random.normal(ks[0], (b, gcfg.noise_dim))
    z2 = jax.random.normal(ks[1], (b, gcfg.noise_dim))
    g_params = gen.init(ks[2], feats, z1)
    d_params = disc.init(ks[3], real, feats)

    sfx = "" if args.cell == "gru" else f"_{args.cell}"

    oks = []
    got = jax.jit(lambda p: fused_apply(p, gcfg, feats, z1))(g_params)

    if do_fwd:
        # generator forward (compiled kernel vs XLA scan)
        ref = jax.jit(lambda p: gen.apply(p, feats, z1))(g_params)
        oks.append(check(f"gen_forward{sfx}", got, ref, 2e-5, 2e-5))

        # dual pass rows == single calls
        fakes_fwd, fake_g = jax.jit(
            lambda p: fused_dual_apply(p, gcfg, feats, [z1], z2)
        )(g_params)
        oks.append(check(f"gdual_fwd_row{sfx}", fakes_fwd[0], got, 1e-6, 1e-6))
        ref_g = jax.jit(lambda p: fused_apply_diff(p, gcfg, feats, z2))(g_params)
        oks.append(check(f"gdual_diff_row{sfx}", fake_g, ref_g, 1e-6, 1e-6))

        # critic scores (compiled) vs flax
        sref = jax.jit(lambda p: disc.apply(p, real, feats))(d_params)
        sgot = jax.jit(lambda p: fused_critic_apply(p, dcfg, real, feats))(d_params)
        oks.append(check(f"critic_scores{sfx}", sgot, sref, 2e-5, 2e-5))

    # generator-phase gradient through the compiled two-phase VJP.
    # IMPORTANT: compared under jax.default_matmul_precision("float32").
    # At the DEFAULT precision XLA's f32 matmuls run as bf16x3 while the
    # Mosaic kernels' dots are true f32, so the two paths differ by the
    # reference's own precision noise (measured: the XLA grads move 5%
    # against themselves between precision settings; under a matched f32
    # setting fused-vs-XLA agree to ~6e-7). The f32 context makes the
    # comparison about the VJP math, and the threshold can be tight.
    feats_s = feats[:, :23]  # 23 % tb(4) != 0: exercises the BACKWARD kernel's uneven trailing block
    target = jax.random.normal(jax.random.key(5), (b, 23, gcfg.pose_dim))

    def loss_fused(p):
        d = fused_apply_diff(p, gcfg, feats_s, z2) - target
        return jnp.mean(d * d)

    def loss_xla(p):
        d = gen.apply(p, feats_s, z2) - target
        return jnp.mean(d * d)

    # per-leaf Frobenius relative error: an untrained model's recurrent
    # chain amplifies gradients to O(1e3) scales, so elementwise-max
    # relative error only measures rounding conditioning (the XLA
    # reference itself moves by more when its matmul precision changes);
    # the norm-level agreement is the meaningful parity statement.
    # Leaves whose reference gradient is ANALYTICALLY ~zero (score.bias:
    # the +-1/B score cotangents cancel; only the tiny drift term remains,
    # norm ~1e-5) are normalized against the tree's global gradient scale
    # instead — a pure-rounding residue on a zero leaf is not a parity
    # failure (observed: every substantive LSTM leaf at 1.5e-7 while the
    # raw per-leaf metric flagged score.bias at 4e-3 of its 1e-5 norm).
    def frob_worst(ref_tree, got_tree):
        leaves = [np.asarray(a, np.float64)
                  for a in jax.tree_util.tree_leaves(ref_tree)]
        gnorm = float(np.sqrt(sum(float(np.sum(a * a)) for a in leaves)))
        floor = max(1e-4 * gnorm, 1e-6)
        worst = 0.0
        for (pa, a), (_, c) in zip(
            jax.tree_util.tree_leaves_with_path(ref_tree),
            jax.tree_util.tree_leaves_with_path(got_tree),
        ):
            a, c = np.asarray(a, np.float64), np.asarray(c, np.float64)
            denom = max(float(np.linalg.norm(a)), floor)
            worst = max(worst, float(np.linalg.norm(c - a)) / denom)
        return worst

    if do_grad:
        with jax.default_matmul_precision("float32"):
            gf = jax.jit(jax.grad(loss_fused))(g_params)
            gx = jax.jit(jax.grad(loss_xla))(g_params)
        worst = frob_worst(gx, gf)
        emit(f"tpu_parity_gen_grads{sfx}", ok=worst < 1e-5,
             worst_frob_rel=round(worst, 10))
        oks.append(worst < 1e-5)

    # full critic-phase loss + SECOND-ORDER gradient (merged d-core incl.
    # the hand-derived GP kernels) vs pure-XLA autodiff
    fake = jax.lax.stop_gradient(got)
    alpha = jax.random.uniform(jax.random.key(7), (b, 1, 1))
    x_hat = alpha * real + (1 - alpha) * fake

    def d_loss_fused(p):
        s_r, s_f, gp = fused_d_phase(p, dcfg, real, fake, x_hat, feats)
        return critic_loss(s_r, s_f, gp, 10.0, 1e-3)

    def d_loss_xla(p):
        x_all = jnp.concatenate([real, fake, x_hat], axis=0)
        f_all = jnp.concatenate([feats] * 3, axis=0)
        scores, pull = jax.vjp(lambda x: disc.apply(p, x, f_all), x_all)
        sel = jnp.concatenate(
            [jnp.zeros((2 * b,), scores.dtype), jnp.ones((b,), scores.dtype)]
        )
        (gx_,) = pull(sel)
        g_hat = gx_[2 * b:]
        sq = jnp.sum(g_hat * g_hat, axis=tuple(range(1, g_hat.ndim)))
        gp = jnp.mean((jnp.sqrt(sq + 1e-12) - 1.0) ** 2)
        return critic_loss(scores[:b], scores[b:2 * b], gp, 10.0, 1e-3)

    if do_grad:
        with jax.default_matmul_precision("float32"):
            (lv_f, df) = jax.jit(jax.value_and_grad(d_loss_fused))(d_params)
            (lv_x, dx) = jax.jit(jax.value_and_grad(d_loss_xla))(d_params)
        lv_f, lv_x = float(lv_f), float(lv_x)
        emit(f"tpu_parity_d_loss_value{sfx}",
             ok=abs(lv_f - lv_x) < 1e-3 * max(1, abs(lv_x)),
             fused=round(lv_f, 6), xla=round(lv_x, 6))
        oks.append(abs(lv_f - lv_x) < 1e-3 * max(1, abs(lv_x)))
        # grad-of-grad through T sequential steps: the hand-derived
        # Hessian-vector kernels and XLA's nested autodiff evaluate the
        # same derivative in genuinely different operation orders, so
        # f32 rounding accumulates to ~1e-4 at norm level (measured
        # 1.0e-4; first-order and values agree to ~1e-6..1e-7)
        worst = frob_worst(dx, df)
        emit(f"tpu_parity_d_grads_2nd_order{sfx}", ok=worst < 5e-4,
             worst_frob_rel=round(worst, 10))
        oks.append(worst < 5e-4)

    if not all(oks):
        raise SystemExit(1)


if __name__ == "__main__":
    main()
