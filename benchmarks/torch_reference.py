"""Reference-path CPU benchmark: torch WGAN-GP training + AR inference.

The reference trains this model class single-process on CPU [BASELINE],
and publishes no numbers (BASELINE.json "published": {}), so this torch
implementation — the same architecture, objective and alternating update,
in the reference's framework and on the reference's hardware class — is
the measurable stand-in for "reference CPU GAN steps/sec" and "generated
pose frames/sec". bench.py uses its cached output as the vs_baseline
denominator. Re-validate against the real repo if the mount ever
populates (SURVEY.md §0).

Usage: python benchmarks/torch_reference.py [--steps N] [--config tiny|full]
Writes benchmarks/torch_baseline.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import torch

from music2dance_tpu.audio import AudioConfig
from music2dance_tpu.ckpt.torch_ref import build_torch_models
from music2dance_tpu.models import full_gan, tiny_gan


def gradient_penalty_torch(disc, real, fake, feats, lambda_gp=10.0):
    b = real.shape[0]
    alpha = torch.rand(b, 1, 1)
    x_hat = (alpha * real + (1 - alpha) * fake).requires_grad_(True)
    scores = disc(x_hat, feats)
    grads = torch.autograd.grad(
        scores.sum(), x_hat, create_graph=True, retain_graph=True
    )[0]
    norms = grads.flatten(1).norm(2, dim=1)
    return lambda_gp * ((norms - 1.0) ** 2).mean()


def train_steps_per_sec(gan, batch, seconds, audio, n_steps, n_warmup=1):
    torch.manual_seed(0)
    t_frames = audio.num_frames(audio.num_samples(seconds))
    gen, disc = build_torch_models(gan)
    opt_g = torch.optim.Adam(gen.parameters(), lr=1e-4, betas=(0.5, 0.9))
    opt_d = torch.optim.Adam(disc.parameters(), lr=1e-4, betas=(0.5, 0.9))

    feats = torch.randn(batch, t_frames, gan.generator.feature_dim)
    real = torch.randn(batch, t_frames, gan.generator.pose_dim)

    def one_step():
        z = torch.randn(batch, gan.generator.noise_dim)
        # critic phase
        fake = gen(feats, z).detach()
        d_loss = disc(fake, feats).mean() - disc(real, feats).mean()
        d_loss = d_loss + gradient_penalty_torch(disc, real, fake, feats)
        opt_d.zero_grad()
        d_loss.backward()
        opt_d.step()
        # generator phase
        z = torch.randn(batch, gan.generator.noise_dim)
        g_loss = -disc(gen(feats, z), feats).mean()
        opt_g.zero_grad()
        g_loss.backward()
        opt_g.step()

    for _ in range(n_warmup):
        one_step()
    t0 = time.perf_counter()
    for _ in range(n_steps):
        one_step()
    dt = time.perf_counter() - t0
    return n_steps / dt


def infer_frames_per_sec(gan, batch, seconds, audio, n_reps=3):
    torch.manual_seed(0)
    t_frames = audio.num_frames(audio.num_samples(seconds))
    gen, _ = build_torch_models(gan)
    gen.eval()
    feats = torch.randn(batch, t_frames, gan.generator.feature_dim)
    z = torch.randn(batch, gan.generator.noise_dim)
    with torch.no_grad():
        gen(feats, z)  # warmup
        t0 = time.perf_counter()
        for _ in range(n_reps):
            gen(feats, z)
        dt = time.perf_counter() - t0
    return n_reps * batch * t_frames / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2)
    ap.add_argument("--config", choices=["tiny", "full"], default="full")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--seconds", type=float, default=6.0)
    ap.add_argument("--out", default=os.path.join(os.path.dirname(__file__), "torch_baseline.json"))
    args = ap.parse_args()

    audio = AudioConfig()
    gan = full_gan(audio.n_features) if args.config == "full" else tiny_gan(audio.n_features)

    sps = train_steps_per_sec(gan, args.batch, args.seconds, audio, args.steps)
    fps = infer_frames_per_sec(gan, args.batch, args.seconds, audio)
    result = {
        "config": args.config,
        "batch": args.batch,
        "clip_seconds": args.seconds,
        "train_steps_per_sec": sps,
        "infer_frames_per_sec": fps,
        "torch_version": torch.__version__,
        "device": "cpu",
        "note": "stand-in for the unpublished reference CPU numbers (BASELINE.md)",
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
