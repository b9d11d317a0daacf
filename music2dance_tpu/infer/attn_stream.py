"""Streaming (incremental) decode for the attention model family.

The transformer generator (models/transformer.py) is causal by
construction: frame t's pose depends only on audio frames <= t (plus the
conv encoder's bounded right halo — the same lookahead the recurrent
family has). That makes an EXACT online decode possible with the
standard KV-cache recipe:

- every emitted frame's per-block attention keys/values are computed
  once and cached; a new chunk's queries attend over the whole cache
  with the causal mask expressed in GLOBAL frame indices,
- the position encoding is indexed by global frame position (offline
  positions 0..T-1 — identical rows from the same sinusoidal table),
- the cumsum delta integration (the family's substitute for the AR
  family's pose feedback) carries its running sum across chunks,
- the conv encoder halo is handled by the shared chunked-session buffer
  (infer/streaming.py _ChunkedSession) exactly as for the recurrent
  family.

Past frames' activations are never affected by new frames (causality),
so chunked output equals the offline whole-clip decode up to XLA
reduction-order noise between differently-shaped programs (the same
caveat, and the same test discipline, as the offline BatchingEngine and
the flash-vs-XLA attention parity).

MoE generators are gated out loudly: the GShard capacity
``C = ceil(capacity * topk * T / E)`` and each token's slot assignment
depend on the WHOLE clip length T, which an online stream does not know
— MoE decode is offline-only by construction, not by omission.

Sessions ride the same EmitPlan plan/execute/apply split as the
recurrent family, so the serving coalescer batches concurrent
transformer streams into lockstep device calls unchanged
(``execute_attn_plans`` is dispatched from streaming.execute_plans).
"""

from __future__ import annotations

import functools

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..models.configs import GeneratorConfig
from ..models.generator import AudioEncoder
from ..models.transformer import sinusoidal_positions
from .streaming import EmitPlan, _ChunkedSession, encoder_halo


@functools.lru_cache(maxsize=8)
def _jit_attn_chunk(cfg: GeneratorConfig, max_frames: int):
    """(params, window, z, kc, vc, n, cum; off, e static) ->
    (poses [B,e,P], kc', vc', n', cum').

    Mirrors TransformerGenerator.__call__ op for op (same flax modules
    applied with the same param subtrees, same dtype casts, same
    mask/scale/softmax order) with two substitutions: attention keys/
    values come from the [L,B,maxT,h,hd] cache (new frames' K/V written
    at their global index first), and positions/causal masks use global
    frame indices ``n + i`` instead of 0..T-1.
    """
    d = cfg.hidden_dim
    heads = cfg.tr_heads
    if d % heads:
        raise ValueError(f"tr_heads={heads} must divide hidden_dim={d}")
    hd = d // heads

    def run(params, window, z, kc, vc, n, cum, off, e):
        b = window.shape[0]
        enc = AudioEncoder(cfg).apply({"params": params["encoder"]}, window)
        enc_e = enc[:, off:off + e]
        z_seq = jnp.broadcast_to(z[:, None, :], (b, e, cfg.noise_dim))
        x = nn.Dense(d, dtype=cfg.dtype).apply(
            {"params": params["in_proj"]},
            jnp.concatenate([enc_e, z_seq], axis=-1),
        )
        pos = sinusoidal_positions(max_frames, d, x.dtype)      # [maxT, d]
        gq = n[:, None] + jnp.arange(e)[None]                   # [B, e] global
        x = x + pos[gq]

        # key j is visible to query g iff j <= g; cache slots beyond the
        # session's frontier are masked out by the same comparison
        mask = jnp.arange(max_frames)[None, None, :] <= gq[:, :, None]

        update = jax.vmap(
            lambda c, new, ni: jax.lax.dynamic_update_slice(c, new, (ni, 0, 0))
        )
        kc_new, vc_new = [], []
        for i in range(cfg.tr_blocks):
            bp = params[f"block_{i}"]
            h = nn.LayerNorm().apply({"params": bp["ln1"]}, x)
            ap = bp["attn"]
            q = nn.Dense(d, dtype=cfg.dtype).apply({"params": ap["q"]}, h)
            k = nn.Dense(d, dtype=cfg.dtype).apply({"params": ap["k"]}, h)
            v = nn.Dense(d, dtype=cfg.dtype).apply({"params": ap["v"]}, h)
            q, k, v = (y.reshape(b, e, heads, hd) for y in (q, k, v))
            kci = update(kc[i].astype(k.dtype), k, n)
            vci = update(vc[i].astype(v.dtype), v, n)
            kc_new.append(kci)
            vc_new.append(vci)
            logits = jnp.einsum("bqhd,bkhd->bhqk", q, kci).astype(jnp.float32)
            logits = logits / np.sqrt(hd)
            logits = jnp.where(mask[:, None], logits, -1e30)
            w = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
            ctx = jnp.einsum("bhqk,bkhd->bqhd", w, vci)
            x = x + nn.Dense(d, dtype=cfg.dtype).apply(
                {"params": ap["o"]}, ctx.reshape(b, e, d))
            h = nn.LayerNorm().apply({"params": bp["ln2"]}, x)
            h = nn.Dense(cfg.tr_mlp_ratio * d, dtype=cfg.dtype).apply(
                {"params": bp["mlp_in"]}, h)
            h = nn.gelu(h)
            h = nn.Dense(d, dtype=cfg.dtype).apply(
                {"params": bp["mlp_out"]}, h)
            x = x + h

        x = nn.LayerNorm().apply({"params": params["ln_f"]}, x)
        y = nn.relu(nn.Dense(cfg.head_hidden, dtype=cfg.dtype).apply(
            {"params": params["head_fc"]}, x))
        deltas = nn.Dense(cfg.pose_dim, dtype="float32").apply(
            {"params": params["head_out"]}, y.astype(jnp.float32))
        if cfg.residual_pose:
            poses = cum[:, None, :] + jnp.cumsum(deltas, axis=1)
            cum = poses[:, -1]
        else:
            poses = deltas
        return poses, jnp.stack(kc_new), jnp.stack(vc_new), n + e, cum

    return jax.jit(run, static_argnames=("off", "e"))


class TransformerStreamingSession(_ChunkedSession):
    """Chunked incremental causal decode for arch='transformer' models.

    Same feed/flush/plan API and the same encoder-halo emit semantics as
    the recurrent StreamingSession (construct either via
    ``make_streaming_session``). Carry = per-block KV caches sized
    ``max_frames`` + the global frame counter + the cumsum integrator
    state. Streams longer than ``max_frames`` frames are rejected loudly
    (raise it at construction; memory is
    ``2 * tr_blocks * max_frames * hidden_dim`` elements per stream row).
    """

    def __init__(self, g_params, cfg: GeneratorConfig, z: jax.Array,
                 max_frames: int = 4096):
        if cfg.arch != "transformer":
            raise ValueError(
                "TransformerStreamingSession decodes attention-family "
                f"models (arch={cfg.arch!r}); recurrent models stream via "
                "StreamingSession — construct with make_streaming_session()"
            )
        if cfg.onset_channel:
            raise ValueError(
                "onset_channel models cannot stream exactly yet: the "
                "causal c0-flux channel needs one extra frame of left "
                "context beyond the conv halo at every chunk boundary "
                "— decode offline (infer/decode.py) instead"
            )
        if cfg.film_cond:
            raise ValueError(
                "film_cond models cannot stream yet: the KV-cache chunk "
                "program does not thread the per-block FiLM modulation "
                "— decode offline (infer/decode.py) instead"
            )
        if cfg.moe_experts > 1:
            raise ValueError(
                "MoE generators are not streamable: the expert capacity "
                "C = ceil(capacity * topk * T / experts) and each token's "
                "dispatch slot depend on the WHOLE clip length, which an "
                "online stream does not know. Decode MoE checkpoints "
                "offline with generate()/generate_batch()."
            )
        params = g_params.get("params", g_params)
        self._params = params
        self._cfg = cfg
        self._z = jnp.atleast_2d(z)
        self._b = self._z.shape[0]
        self._hl, self._hr = encoder_halo(cfg)
        self._buf = np.zeros((self._b, 0, cfg.feature_dim), np.float32)
        self._buf_start = 0
        self._emitted = 0
        self._flushed = False
        self._impl = "attn"
        self._max_frames = int(max_frames)
        hd = cfg.hidden_dim // cfg.tr_heads
        kv_shape = (cfg.tr_blocks, self._b, self._max_frames, cfg.tr_heads, hd)
        dt = jnp.dtype(cfg.dtype)
        self._carry = (
            jnp.zeros(kv_shape, dt),                        # K cache
            jnp.zeros(kv_shape, dt),                        # V cache
            jnp.zeros((self._b,), jnp.int32),               # frames cached
            jnp.zeros((self._b, cfg.pose_dim), jnp.float32),  # cumsum state
        )

    def _plan_meta(self) -> tuple:
        return (self._max_frames,)

    def _plan(self, emit_end: int):
        if emit_end > self._max_frames:
            raise ValueError(
                f"stream exceeds the session's KV-cache capacity "
                f"({emit_end} > max_frames={self._max_frames}); construct "
                "the session with a larger max_frames"
            )
        return super()._plan(emit_end)

    def run_plan(self, plan: "EmitPlan"):
        kc, vc, n, cum = plan.carry
        poses, kc2, vc2, n2, cum2 = _jit_attn_chunk(
            self._cfg, self._max_frames)(
            self._params, jnp.asarray(plan.window), plan.z,
            kc, vc, n, cum, off=plan.off, e=plan.e)
        return poses, (kc2, vc2, n2, cum2)


def execute_attn_plans(params, cfg: GeneratorConfig, plans, pad_to=None):
    """Lockstep execution of several transformer sessions' plans as ONE
    device call (dispatched from streaming.execute_plans; same contract:
    shared key(), single-stream rows, optional inert zero-row padding).
    Sessions may sit at DIFFERENT stream positions: the causal mask and
    positions are per-row functions of the global frame counter."""
    p0 = plans[0]
    n_plans = len(plans)
    rows = max(n_plans, pad_to or n_plans)
    tw = p0.window.shape[1]
    max_frames = p0.meta[0]
    windows = np.zeros((rows, tw, cfg.feature_dim), np.float32)
    for i, p in enumerate(plans):
        windows[i] = p.window[0]
    zdim = p0.z.shape[1]
    z = jnp.concatenate(
        [p.z for p in plans]
        + ([jnp.zeros((rows - n_plans, zdim), p0.z.dtype)]
           if rows > n_plans else []),
        axis=0)

    def cat(parts, axis, pad_shape_fn):
        out = jnp.concatenate(parts, axis=axis)
        if rows > n_plans:
            pad = jnp.zeros(pad_shape_fn(out), out.dtype)
            out = jnp.concatenate([out, pad], axis=axis)
        return out

    extra = rows - n_plans
    kc = cat([p.carry[0] for p in plans], 1,
             lambda o: (o.shape[0], extra) + o.shape[2:])
    vc = cat([p.carry[1] for p in plans], 1,
             lambda o: (o.shape[0], extra) + o.shape[2:])
    n = cat([p.carry[2] for p in plans], 0, lambda o: (extra,))
    cum = cat([p.carry[3] for p in plans], 0, lambda o: (extra, o.shape[1]))

    poses, kc2, vc2, n2, cum2 = _jit_attn_chunk(cfg, max_frames)(
        params, jnp.asarray(windows), z, kc, vc, n, cum,
        off=p0.off, e=p0.e)
    return [
        (poses[i:i + 1],
         (kc2[:, i:i + 1], vc2[:, i:i + 1], n2[i:i + 1], cum2[i:i + 1]))
        for i in range(n_plans)
    ]
