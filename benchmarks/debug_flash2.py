"""Staged TPU isolation of the run_flash2_parity.py failure (round-5).

Hypotheses from VERDICT round 4 weak #1:
  H-pallas : the compiled Pallas forward kernel is wrong at multi-block T
  H-chunked: XLA:TPU miscompiles the reverse-over-reverse of the remat'd
             chunked scan (primal path irrelevant)
  H-glue   : the recursive custom_jvp structure miscompiles only when the
             Pallas primal sits inside the second-order graph

Stages (each prints one JSON line; run with --stage to select):
  fwd     : compiled _pallas_fwd vs naive @ R=8, T=512, D=128
  core2   : GP-shaped d_w second order through the raw flash2 core vs
            naive attention, compiled, T=512
  core2np : same but _on_pallas forced False (pure chunked primal)
  critic  : the benchmark's full-critic parity (flash2 vs xla), T=512
  criticnp: full-critic parity with _on_pallas forced False
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from music2dance_tpu.ops import flash2
from music2dance_tpu.ops.flash2 import (
    _make_core, _pallas_fwd, chunked_attention, naive_attention)


def emit(stage, **kw):
    print(json.dumps({"stage": stage, **{k: (round(float(v), 8)
          if isinstance(v, (int, float, np.floating)) else v)
          for k, v in kw.items()}}), flush=True)


def _rel(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return float(np.abs(a - b).max() / (np.abs(b).max() + 1e-12))


def stage_fwd():
    r, t, d = 8, 512, 128
    q, k, v = (jax.random.normal(jax.random.key(i), (r, t, d))
               for i in range(3))
    scale = 1.0 / float(np.sqrt(d))
    for causal in (False, True):
        with jax.default_matmul_precision("float32"):
            o = jax.jit(lambda q, k, v: _pallas_fwd(
                q, k, v, causal, scale, interpret=False))(q, k, v)
            ref = jax.jit(lambda q, k, v: naive_attention(
                q, k, v, causal, scale))(q, k, v)
            ch = jax.jit(lambda q, k, v: chunked_attention(
                q, k, v, causal, scale))(q, k, v)
        emit("fwd", causal=causal, pallas_vs_naive=_rel(o, ref),
             chunked_vs_naive=_rel(ch, ref))


def _gp_shaped(attn_fn, w, x, k, v):
    # mirrors tests/test_flash2.py::_gp_shaped — q depends on x through w
    def score(xx):
        return jnp.sum(attn_fn(xx @ w, k, v))
    g = jax.grad(score)(x)
    n = jnp.sqrt(jnp.sum(g * g, axis=(1, 2)) + 1e-12)
    return jnp.mean((n - 1.0) ** 2)


def stage_core2(no_pallas=False):
    if no_pallas:
        flash2._on_pallas = lambda q: False
    r, t, d = 8, 512, 128
    x, k, v = (jax.random.normal(jax.random.key(i), (r, t, d)) * 0.3
               for i in range(3))
    w = jax.random.normal(jax.random.key(7), (d, d)) / np.sqrt(d)
    scale = 1.0 / float(np.sqrt(d))
    core = _make_core(False, scale, 128, 128)
    with jax.default_matmul_precision("float32"):
        val_f = jax.jit(lambda w: _gp_shaped(core, w, x, k, v))(w)
        val_n = jax.jit(lambda w: _gp_shaped(
            lambda *a: naive_attention(*a, False, scale), w, x, k, v))(w)
        g_f = jax.jit(jax.grad(lambda w: _gp_shaped(core, w, x, k, v)))(w)
        g_n = jax.jit(jax.grad(lambda w: _gp_shaped(
            lambda *a: naive_attention(*a, False, scale), w, x, k, v)))(w)
    emit("core2" + ("np" if no_pallas else ""),
         val_rel=_rel(val_f, val_n), grad_rel=_rel(g_f, g_n),
         gp_val=float(val_n))


def stage_critic(no_pallas=False):
    if no_pallas:
        flash2._on_pallas = lambda q: False
    from music2dance_tpu.audio import AudioConfig
    from music2dance_tpu.configs.presets import preset
    from music2dance_tpu.models import build_discriminator

    def _gp_loss(disc, params, poses, feats):
        def scores(x):
            return jnp.sum(disc.apply(params, x, feats))
        g = jax.grad(scores)(poses)
        sq = jnp.sum(g * g, axis=tuple(range(1, g.ndim)))
        norms = jnp.sqrt(sq + 1e-12)
        return jnp.mean((norms - 1.0) ** 2)

    base = preset("attn").gan.discriminator
    t, b = 512, 2
    poses = jax.random.normal(jax.random.key(0), (b, t, base.layout.pose_dim))
    feats = jax.random.normal(jax.random.key(1), (b, t, AudioConfig().n_features))
    values, grads = {}, {}
    with jax.default_matmul_precision("float32"):
        for impl in ("flash2", "xla"):
            cfg = dataclasses.replace(base, attn_impl=impl, dtype="float32")
            disc = build_discriminator(cfg)
            params = disc.init(jax.random.key(2), poses, feats)
            gp = jax.jit(lambda p, d=disc: _gp_loss(d, p, poses, feats))
            values[impl] = float(gp(params))
            grads[impl] = jax.jit(jax.grad(gp))(params)
    rows = []
    flat_f, _ = jax.tree_util.tree_flatten_with_path(grads["flash2"])
    flat_x = jax.tree_util.tree_leaves(grads["xla"])
    gmax = max(float(np.abs(np.asarray(x)).max()) for x in flat_x)
    for (path, a), b_ in zip(flat_f, flat_x):
        rows.append((_rel(a, b_), jax.tree_util.keystr(path),
                     float(np.abs(np.asarray(b_)).max()),
                     float(np.abs(np.asarray(a) - np.asarray(b_)).max())))
    rows.sort(reverse=True)
    emit("critic" + ("np" if no_pallas else ""),
         val_flash2=values["flash2"], val_xla=values["xla"],
         val_rel=_rel(values["flash2"], values["xla"]),
         grad_worst_rel=rows[0][0], global_grad_max=gmax)
    for rd, path, leafmax, absdiff in rows[:6]:
        emit("critic_leaf", leaf=path, rel=rd, leaf_absmax=leafmax,
             absdiff=absdiff)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", default="fwd",
                    choices=["fwd", "core2", "core2np", "critic", "criticnp"])
    args = ap.parse_args()
    {"fwd": stage_fwd,
     "core2": lambda: stage_core2(False),
     "core2np": lambda: stage_core2(True),
     "critic": lambda: stage_critic(False),
     "criticnp": lambda: stage_critic(True)}[args.stage]()


if __name__ == "__main__":
    main()
