"""Online (streaming) inference: audio arrives in chunks, poses come out.

The reference's generate path is strictly offline (SURVEY.md §3.3: load a
whole song, extract features over all of it, decode). This module adds
the online capability a production deployment needs, in two layers:

- ``StreamingSession`` — feature chunks in, pose chunks out, **exactly**
  equal to the offline whole-song decode for any chunking. The offline
  generator is not causal frame-by-frame: its conv audio encoder
  (``models/generator.py`` AudioEncoder, SAME padding) gives every frame
  a receptive-field halo of future frames. The existing
  ``streaming_decode_step`` (infer/decode.py) is therefore exact only for
  ``enc_kernel == 1``; this session handles the general case by keeping a
  small feature history and holding back the right-halo frames until
  their context arrives (``flush()`` emits them with the offline
  right-edge semantics).

- ``StreamingFeatureExtractor`` — raw waveform chunks in, feature frames
  out, reproducing the offline STFT->mel->dB->DCT chain with bounded
  lookahead (``n_fft//2`` samples, the centered STFT's own horizon). Two
  of the offline chain's ops are whole-clip reductions and cannot be
  causal: the ``top_db`` reference peak and the per-clip normalization
  [BASELINE]. The extractor supports three explicit policies; with
  frozen whole-clip stats (``FrontendStats``) it matches the offline
  features exactly, which is how the parity tests pin the framing math.

``Music2DanceModel.stream()`` (infer/api.py) composes the two.
"""

from __future__ import annotations

import dataclasses
import functools

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..audio import AudioConfig
from ..audio.filters import frontend_constants
from ..models.configs import GeneratorConfig
from ..models.generator import GeneratorStep, generator_init_carry


def encoder_halo(cfg: GeneratorConfig) -> tuple[int, int]:
    """(left, right) receptive-field halo of the conv encoder, in frames.

    flax ``nn.Conv(..., padding="SAME")`` with kernel k pads (k-1)//2 on
    the left and k//2 on the right; the halo compounds per layer
    (pinned by tests/test_streaming.py for odd AND even kernels).
    """
    k = cfg.enc_kernel
    return cfg.enc_layers * ((k - 1) // 2), cfg.enc_layers * (k // 2)


@functools.lru_cache(maxsize=8)
def _jit_gi(cfg: GeneratorConfig):
    """Jitted hoisted-projection path (encoder + ih0_static) — eager
    op-by-op dispatch would dominate per-chunk latency on a device."""
    from ..ops.fused_generator import compute_gi_static

    return jax.jit(
        lambda params, window, z: compute_gi_static(params, cfg, window, z))


@functools.lru_cache(maxsize=8)
def _jit_fused_from_gi(cfg: GeneratorConfig, interpret: bool):
    """Jitted fused-kernel scan from precomputed gi (ops/fused_generator):
    ~1.9x the XLA scan at large lockstep batches on TPU — the multi-stream
    serving case. State uses the kernel bank's stacked [S*L, B, H] layout."""
    from ..ops.fused_generator import (extract_step_weights,
                                       fused_generator_forward)

    def run(step_params, h0, prev0, gi):
        w = extract_step_weights(step_params, cfg)
        poses, _hp, _pp, h_fin, p_fin = fused_generator_forward(
            gi, h0, prev0, w, cfg, interpret=interpret)  # poses [B, T, P]
        return poses, h_fin, p_fin

    return jax.jit(run)


@functools.lru_cache(maxsize=8)
def _jit_scan_from_gi(cfg: GeneratorConfig):
    """Jitted (step_params, carry, gi [B,T,G*H]) -> (poses, carry): the
    generator's time scan alone, fed precomputed hoisted projections
    (applying the scanned GeneratorStep with the ``step`` param subtree
    reproduces Generator.__call__'s scan bit-for-bit)."""
    scan = nn.scan(
        GeneratorStep,
        variable_broadcast="params",
        split_rngs={"params": False},
        in_axes=1,
        out_axes=1,
    )
    mod = scan(cfg, False)

    def run(step_params, carry, gi):
        b, t = gi.shape[:2]
        tf = jnp.zeros((b, t, cfg.pose_dim), jnp.float32)
        carry_out, poses = mod.apply({"params": step_params}, carry, (gi, tf))
        return poses, carry_out

    return jax.jit(run)


@dataclasses.dataclass
class EmitPlan:
    """One session's pending emit, detached from the session so several
    sessions' plans can run as ONE lockstep device call (``execute_plans``
    — the multi-stream serving fast path). Produced by
    ``StreamingSession.plan_feed``/``plan_flush``; finalized by ``apply``.
    """

    window: np.ndarray      # [B, Tw, F] halo-extended feature window
    off: int                # first emitted frame's offset inside window
    e: int                  # frames to emit
    emit_end: int           # global cursor after this emit
    z: jax.Array            # [B, Z] session latent
    carry: object           # session carry at plan time (impl layout)
    impl: str               # "xla" | "fused" | "attn"
    interpret: "bool | None"
    meta: tuple = ()        # impl-specific static shape info (e.g. the
    #   attention session's KV-cache capacity) — part of the batch key

    def key(self) -> tuple:
        """Plans sharing a key can run batched (same program shapes)."""
        return (self.window.shape[1], self.off, self.e, self.impl,
                self.window.shape[0], self.meta)


def execute_plans(g_params, cfg: GeneratorConfig, plans, pad_to=None):
    """Run several sessions' pending emits as ONE device call.

    All plans must share ``key()`` and have batch size 1 (one row per
    stream). ``pad_to`` pads the lockstep batch with inert zero rows onto
    a size grid so the jit cache stays bounded under varying concurrency
    (the serving coalescer passes power-of-two buckets). Returns
    ``[(poses [1, e, P], carry), ...]`` in plan order — feed each to its
    session's ``apply``. Row i's math is independent of the other rows,
    so results match the solo path up to XLA reduction-order noise
    between differently-shaped programs (same caveat, and test, as the
    offline BatchingEngine).
    """
    params = g_params.get("params", g_params)
    p0 = plans[0]
    if any(p.key() != p0.key() for p in plans) or p0.window.shape[0] != 1:
        raise ValueError("plans must share key() and be single-stream")
    if p0.impl == "attn":
        from .attn_stream import execute_attn_plans

        return execute_attn_plans(params, cfg, plans, pad_to=pad_to)
    n = len(plans)
    rows = max(n, pad_to or n)
    tw = p0.window.shape[1]
    windows = np.zeros((rows, tw, cfg.feature_dim), np.float32)
    for i, p in enumerate(plans):
        windows[i] = p.window[0]
    zdim = p0.z.shape[1]
    z = jnp.concatenate(
        [p.z for p in plans]
        + ([jnp.zeros((rows - n, zdim), p0.z.dtype)] if rows > n else []),
        axis=0)
    gi = _jit_gi(cfg)(params, jnp.asarray(windows), z)
    gi_e = gi[:, p0.off:p0.off + p0.e]
    if p0.impl == "fused":
        h0 = jnp.concatenate([p.carry[0] for p in plans], axis=1)
        prev0 = jnp.concatenate([p.carry[1] for p in plans], axis=0)
        if rows > n:
            h0 = jnp.concatenate(
                [h0, jnp.zeros(h0.shape[:1] + (rows - n,) + h0.shape[2:],
                               h0.dtype)], axis=1)
            prev0 = jnp.concatenate(
                [prev0, jnp.zeros((rows - n,) + prev0.shape[1:],
                                  prev0.dtype)], axis=0)
        poses, h_fin, p_fin = _jit_fused_from_gi(cfg, p0.interpret)(
            params["step"], h0, prev0, gi_e)
        return [(poses[i:i + 1], (h_fin[:, i:i + 1], p_fin[i:i + 1]))
                for i in range(n)]
    # XLA carry = (rnn_carry [..., B, H] leaves, prev_pose [B, P]):
    # the batch axis is ndim-2 for state leaves, 0 for the pose
    def cat(axis_fn):
        def run(*xs):
            ax = axis_fn(xs[0])
            out = jnp.concatenate(xs, axis=ax)
            if rows > n:
                pad_shape = list(out.shape)
                pad_shape[ax] = rows - n
                out = jnp.concatenate(
                    [out, jnp.zeros(pad_shape, out.dtype)], axis=ax)
            return out
        return run

    state_ax = lambda x: x.ndim - 2
    carry = (
        jax.tree.map(cat(state_ax), *[p.carry[0] for p in plans]),
        cat(lambda x: 0)(*[p.carry[1] for p in plans]),
    )
    poses, carry_out = _jit_scan_from_gi(cfg)(params["step"], carry, gi_e)

    def row(i):
        return (
            jax.tree.map(
                lambda x: jax.lax.slice_in_dim(x, i, i + 1, axis=x.ndim - 2),
                carry_out[0]),
            carry_out[1][i:i + 1],
        )

    return [(poses[i:i + 1], row(i)) for i in range(n)]


class _ChunkedSession:
    """Shared machinery of a chunked decode session: the feature buffer
    with encoder left-halo retention, the emit cursor, and the
    plan/execute/apply split. Family-specific subclasses supply the
    carry layout and ``run_plan`` (StreamingSession — recurrent state;
    attn_stream.TransformerStreamingSession — KV caches)."""

    _cfg: GeneratorConfig
    _impl: str

    @property
    def frames_emitted(self) -> int:
        return self._emitted

    def _plan_meta(self) -> tuple:
        """Impl-specific static shape info for EmitPlan.key()."""
        return ()

    def _as_chunk(self, feats) -> np.ndarray:
        feats = np.asarray(feats, np.float32)
        if feats.ndim == 2:
            feats = feats[None]
        if feats.ndim != 3 or feats.shape[0] != self._b or (
                feats.shape[2] != self._cfg.feature_dim):
            raise ValueError(
                f"expected [B={self._b}, Tc, F={self._cfg.feature_dim}] "
                f"feature chunk, got shape {feats.shape}")
        return feats

    def _empty(self) -> np.ndarray:
        cfg = self._cfg
        return np.zeros(
            (self._b, 0, cfg.layout.n_joints, cfg.layout.joint_dim),
            np.float32)

    def _plan(self, emit_end: int) -> "EmitPlan | None":
        """Everything a (possibly external, batched) executor needs to run
        this session's pending emit; None when nothing is computable."""
        e = emit_end - self._emitted
        if e <= 0:
            return None
        # encoder window: left-halo context behind the cursor (or the true
        # sequence start, where SAME zero padding is the offline
        # semantics), everything received on the right
        w0 = max(0, self._emitted - self._hl)
        window = self._buf[:, w0 - self._buf_start:]
        return EmitPlan(
            window=window, off=self._emitted - w0, e=e, emit_end=emit_end,
            z=self._z, carry=self._carry, impl=self._impl,
            interpret=getattr(self, "_interpret", None),
            meta=self._plan_meta(),
        )

    def plan_feed(self, feats_chunk) -> "EmitPlan | None":
        """Buffer a chunk and return the pending emit (or None). The plan
        must then be run (``execute_plans`` or the session's own jits) and
        finalized with ``apply`` — ``feed()`` does all three for the
        single-session case; the serving coalescer batches the middle step
        across sessions."""
        if self._flushed:
            raise RuntimeError("session already flushed")
        chunk = self._as_chunk(feats_chunk)
        self._buf = np.concatenate([self._buf, chunk], axis=1)
        avail = self._buf_start + self._buf.shape[1]
        return self._plan(avail - self._hr)

    def plan_flush(self) -> "EmitPlan | None":
        if self._flushed:
            raise RuntimeError("session already flushed")
        self._flushed = True
        return self._plan(self._buf_start + self._buf.shape[1])

    def apply(self, plan: "EmitPlan", poses: np.ndarray, carry) -> np.ndarray:
        """Finalize an executed plan: advance the cursor, trim the left-
        context buffer, adopt the new carry; returns the reshaped poses."""
        cfg = self._cfg
        self._carry = carry
        self._emitted = plan.emit_end
        keep_from = max(0, self._emitted - self._hl)
        self._buf = self._buf[:, keep_from - self._buf_start:]
        self._buf_start = keep_from
        return np.asarray(poses).reshape(
            self._b, plan.e, cfg.layout.n_joints, cfg.layout.joint_dim)

    def run_plan(self, plan: "EmitPlan"):
        raise NotImplementedError  # family-specific

    def feed(self, feats_chunk) -> np.ndarray:
        """[B, Tc, F] features -> [B, E, n_joints, joint_dim] poses
        (E = frames whose encoder context is now complete; may be 0)."""
        plan = self.plan_feed(feats_chunk)
        if plan is None:
            return self._empty()
        poses, carry = self.run_plan(plan)
        return self.apply(plan, poses, carry)

    def flush(self) -> np.ndarray:
        """End of stream: emit the right-halo frames held back by feed()
        (the encoder sees the offline right-edge zero padding)."""
        plan = self.plan_flush()
        if plan is None:
            return self._empty()
        poses, carry = self.run_plan(plan)
        return self.apply(plan, poses, carry)


def make_streaming_session(g_params, cfg: GeneratorConfig, z: jax.Array,
                           impl: str = "auto", **kwargs):
    """Streaming session for EITHER model family: the recurrent session
    (carried scan state) for arch='rnn', the KV-cache incremental causal
    decode (infer/attn_stream.py) for arch='transformer'. Both share the
    feed/flush/plan API and are exact vs their offline decode."""
    if cfg.arch == "transformer":
        from .attn_stream import TransformerStreamingSession

        return TransformerStreamingSession(g_params, cfg, z, **kwargs)
    return StreamingSession(g_params, cfg, z, impl=impl, **kwargs)


class StreamingSession(_ChunkedSession):
    """Chunked autoregressive decode, exact vs the offline whole-song pass.

    ``feed()`` accepts ``[B, Tc, F]`` (or ``[Tc, F]`` when batch == 1)
    feature chunks of ANY sizes and returns the poses that became
    computable — every emitted frame has seen its full encoder context,
    so the concatenation of all outputs equals ``Generator.apply`` over
    the whole sequence (tests/test_streaming.py). The inherent output lag
    is the encoder's right halo (``encoder_halo(cfg)[1]`` frames);
    ``flush()`` emits those trailing frames with the offline right-edge
    zero padding.

    Chunks of a constant size keep the jit cache at ~3 programs (first
    feed, steady state, flush).

    ``impl``: "auto" (fused Pallas scan kernel on TPU when the config is
    inside its envelope — the multi-stream serving case rides the same
    ~1.9x kernel as batched offline decode — else the XLA scan), "xla",
    or "fused" (forced; interpret mode off-TPU, used by the parity tests).
    """

    def __init__(self, g_params, cfg: GeneratorConfig, z: jax.Array,
                 impl: str = "auto"):
        if cfg.arch != "rnn":
            raise ValueError(
                "StreamingSession carries recurrent generator state "
                f"(arch={cfg.arch!r}); transformer-family models stream "
                "via the KV-cache session — construct with "
                "make_streaming_session(), which dispatches on cfg.arch"
            )
        if cfg.onset_channel:
            raise ValueError(
                "onset_channel models cannot stream exactly yet: the "
                "causal c0-flux channel needs one extra frame of left "
                "context beyond the conv halo, so chunked application "
                "would diverge from offline decode at chunk boundaries "
                "— decode offline (infer/decode.py) instead"
            )
        params = g_params.get("params", g_params)
        self._params = params
        self._cfg = cfg
        self._z = jnp.atleast_2d(z)
        self._b = self._z.shape[0]
        self._hl, self._hr = encoder_halo(cfg)
        # feature frames from global index ``_buf_start`` onward; always
        # retains >= left-halo frames behind the emit cursor
        self._buf = np.zeros((self._b, 0, cfg.feature_dim), np.float32)
        self._buf_start = 0
        self._emitted = 0
        self._flushed = False
        from ..ops.fused_generator import supports_fused, why_not_fused

        if impl == "auto":
            on_tpu = jax.default_backend() == "tpu"
            impl = ("fused" if on_tpu and supports_fused(cfg, interpret=False)
                    else "xla")
        if impl == "fused":
            interpret = jax.default_backend() != "tpu"
            if not supports_fused(cfg, interpret=interpret):
                raise ValueError(
                    f"impl='fused': {why_not_fused(cfg, interpret)}")
            self._interpret = interpret
        elif impl != "xla":
            raise ValueError(f"impl must be auto|xla|fused, got {impl!r}")
        self._impl = impl
        if impl == "fused":
            from ..ops.cell_math import state_slots

            sl = state_slots(cfg.cell) * cfg.rnn_layers
            self._carry = (jnp.zeros((sl, self._b, cfg.hidden_dim),
                                     jnp.float32),
                           jnp.zeros((self._b, cfg.pose_dim), jnp.float32))
        else:
            self._carry = generator_init_carry(cfg, self._b)

    def run_plan(self, plan: "EmitPlan"):
        """Single-session execution of a plan: (poses [B, e, P], carry)."""
        cfg = self._cfg
        gi = _jit_gi(cfg)(self._params, jnp.asarray(plan.window), plan.z)
        gi_e = gi[:, plan.off:plan.off + plan.e]
        if plan.impl == "fused":
            h0, prev0 = plan.carry
            poses, h_fin, p_fin = _jit_fused_from_gi(cfg, plan.interpret)(
                self._params["step"], h0, prev0, gi_e)
            return poses, (h_fin, p_fin)
        poses, carry = _jit_scan_from_gi(cfg)(
            self._params["step"], plan.carry, gi_e)
        return poses, carry


@dataclasses.dataclass(frozen=True)
class FrontendStats:
    """Whole-clip reductions of the offline frontend, frozen for streaming:
    the per-feature normalization mean/var and the top_db reference peak.

    ``from_waveform`` computes them with the offline chain — streaming
    with stats frozen from the same song reproduces the offline features
    exactly; production deployments freeze corpus-level stats instead.
    """

    mean: np.ndarray          # [F]
    var: np.ndarray           # [F]
    peak_db: float            # max of log_spec before top_db clipping

    @classmethod
    def from_waveform(cls, wave, cfg: AudioConfig) -> "FrontendStats":
        from ..audio.frontend import melspectrogram, mfcc, power_to_db

        wave = jnp.asarray(np.asarray(wave, np.float32))[None]
        cfg_noclip = dataclasses.replace(cfg, top_db=None)
        peak = float(jnp.max(power_to_db(melspectrogram(wave, cfg), cfg_noclip)))
        if cfg.feature_type == "mfcc":
            feats = mfcc(wave, cfg)
        else:
            feats = power_to_db(melspectrogram(wave, cfg), cfg)
        mean = np.asarray(jnp.mean(feats, axis=1))[0]
        var = np.asarray(jnp.var(feats, axis=1))[0]
        return cls(mean=mean, var=var, peak_db=peak)

    @classmethod
    def from_corpus(cls, waves, cfg: AudioConfig) -> "FrontendStats":
        """Corpus-level stats: the production configuration for streaming.

        Mirrors the streaming math exactly — pass 1 finds the corpus-wide
        peak, pass 2 pools per-feature moments of features clipped against
        THAT peak (not each clip's own), so a session frozen on these
        stats behaves like one long stream over the corpus. ``waves`` is a
        sequence of 1-D waveforms.
        """
        from ..audio.filters import frontend_constants

        if len(waves) == 0:
            raise ValueError("from_corpus needs at least one waveform")
        c = frontend_constants(cfg)
        dct = np.asarray(c["dct_T"])
        ref = 10.0 * np.log10(max(cfg.amin, cfg.ref_db))
        logmels = []
        peak = -np.inf
        for w in waves:
            from ..audio.frontend import melspectrogram

            mel = np.asarray(
                melspectrogram(jnp.asarray(np.asarray(w, np.float32))[None],
                               cfg))[0]
            ls = 10.0 * np.log10(np.maximum(cfg.amin, mel)) - ref
            peak = max(peak, float(ls.max()))
            logmels.append(ls)
        count = 0
        s = np.zeros((cfg.n_features,), np.float64)
        s2 = np.zeros((cfg.n_features,), np.float64)
        for ls in logmels:
            if cfg.top_db is not None:
                ls = np.maximum(ls, peak - cfg.top_db)
            feats = ls @ dct if cfg.feature_type == "mfcc" else ls
            count += feats.shape[0]
            s += feats.sum(axis=0)
            s2 += (feats.astype(np.float64) ** 2).sum(axis=0)
        mean = s / count
        var = np.maximum(s2 / count - mean ** 2, 0.0)
        return cls(mean=mean.astype(np.float32), var=var.astype(np.float32),
                   peak_db=peak)

    def to_json(self) -> str:
        import json

        return json.dumps({
            "mean": np.asarray(self.mean, np.float64).tolist(),
            "var": np.asarray(self.var, np.float64).tolist(),
            "peak_db": float(self.peak_db),
        })

    @classmethod
    def from_json(cls, text: str) -> "FrontendStats":
        import json

        d = json.loads(text)
        return cls(mean=np.asarray(d["mean"], np.float32),
                   var=np.asarray(d["var"], np.float32),
                   peak_db=float(d["peak_db"]))


class StreamingFeatureExtractor:
    """Waveform chunks in, feature frames out (single stream, host math).

    Framing matches the offline centered STFT exactly: frame t covers
    original samples ``[t*hop - n_fft//2, t*hop + n_fft//2)``, so a frame
    is emitted once ``t*hop + n_fft//2`` samples have arrived (bounded
    lookahead = n_fft//2 samples); the reflect padding at the stream
    start and (on flush) at the tail is the offline one.

    The two whole-clip reductions of the offline chain need a policy:

    - ``stats=FrontendStats``: frozen — exact parity with the offline
      features when the stats come from the same clip (the parity test),
      deterministic production behavior when they come from the corpus.
    - ``stats="running"`` (default): frame t is clipped/normalized with
      the peak and cumulative mean/var of frames 0..t — causal and
      chunking-invariant; converges to the offline values as the stream
      proceeds, early frames deviate (documented approximation).
    - ``stats="none"``: skip normalization and top_db clipping entirely
      (exact vs offline with ``normalize=False, top_db=None``).

    Host numpy is the right engine here: real-time audio is ~30 frames/s
    of [1024]-sample dots — dispatch latency would dominate any device.
    """

    def __init__(self, cfg: AudioConfig,
                 stats: "FrontendStats | str" = "running"):
        if isinstance(stats, str) and stats not in ("running", "none"):
            raise ValueError(f"stats must be FrontendStats, 'running' or "
                             f"'none', got {stats!r}")
        self._cfg = cfg
        self._stats = stats
        self._pad = cfg.n_fft // 2 if cfg.center else 0
        self._raw = np.zeros((0,), np.float32)   # pre-padding accumulator
        self._buf = np.zeros((0,), np.float32)   # padded-signal window
        self._trim = 0             # padded-sample index of self._buf[0]
        self._started = False
        self._n_samples = 0
        self._next_frame = 0
        # running-stats accumulators (prefix moments over emitted frames)
        self._count = 0
        self._mean = np.zeros((cfg.n_features,), np.float64)
        self._m2 = np.zeros((cfg.n_features,), np.float64)
        self._peak = -np.inf
        self._flushed = False

    @property
    def frames_emitted(self) -> int:
        return self._next_frame

    def _left_pad(self, head: np.ndarray) -> np.ndarray:
        if self._cfg.pad_mode == "reflect":
            # np.pad(head, (p, 0), "reflect")[:p] without the copy; needs
            # len(head) > p (guaranteed by the caller)
            return head[1:self._pad + 1][::-1]
        return np.zeros((self._pad,), np.float32)

    def _emit_ready(self, final: bool = False) -> np.ndarray:
        """Emit every frame computable from the padded buffer."""
        cfg = self._cfg
        have = self._trim + len(self._buf)    # padded samples present
        if final:
            n_frames = cfg.num_frames(self._n_samples)
        elif have < cfg.n_fft:
            return np.zeros((0, cfg.n_features), np.float32)
        else:
            n_frames = (have - cfg.n_fft) // cfg.hop_length + 1
        e = n_frames - self._next_frame
        if e <= 0:
            return np.zeros((0, cfg.n_features), np.float32)
        c = frontend_constants(cfg)
        starts = np.arange(self._next_frame, n_frames) * cfg.hop_length - self._trim
        frames = np.stack([self._buf[s:s + cfg.n_fft] for s in starts])
        re = frames @ np.asarray(c["dft_cos"])
        im = frames @ np.asarray(c["dft_sin"])
        power = re * re + im * im
        if cfg.power != 2.0:
            power = np.power(np.sqrt(power), cfg.power)
        mel = power @ np.asarray(c["mel_T"])
        log_spec = 10.0 * np.log10(np.maximum(cfg.amin, mel))
        log_spec -= 10.0 * np.log10(max(cfg.amin, cfg.ref_db))
        log_spec = self._clip_top_db(log_spec)
        if cfg.feature_type == "mfcc":
            feats = log_spec @ np.asarray(c["dct_T"])
        else:
            feats = log_spec
        feats = self._normalize(np.asarray(feats, np.float32))
        self._next_frame = n_frames
        # drop consumed samples, but always keep the trailing n_fft + pad
        # samples: the tail reflection at flush() needs the newest
        # pad + 1 original samples
        keep_from = min(self._next_frame * cfg.hop_length,
                        max(0, have - (cfg.n_fft + self._pad)))
        if keep_from > self._trim:
            self._buf = self._buf[keep_from - self._trim:]
            self._trim = keep_from
        return feats

    def _clip_top_db(self, log_spec: np.ndarray) -> np.ndarray:
        cfg = self._cfg
        if cfg.top_db is None or self._stats == "none":
            return log_spec
        if isinstance(self._stats, FrontendStats):
            return np.maximum(log_spec, self._stats.peak_db - cfg.top_db)
        # running: frame t clips against the peak over frames 0..t —
        # causal AND invariant to how the stream was chunked
        prefix = np.maximum.accumulate(
            np.maximum(log_spec.max(axis=1), self._peak))
        self._peak = float(prefix[-1])
        return np.maximum(log_spec, prefix[:, None] - cfg.top_db)

    def _normalize(self, feats: np.ndarray) -> np.ndarray:
        cfg = self._cfg
        if not cfg.normalize or self._stats == "none":
            return feats
        if isinstance(self._stats, FrontendStats):
            mean, var = self._stats.mean, self._stats.var
            return ((feats - mean) / np.sqrt(var + cfg.norm_eps)).astype(
                np.float32)
        # running: frame t normalized with cumulative moments of frames
        # 0..t (chunking-invariant); per-row host loop is ~30 rows/s of
        # [F]-vector math in real time — negligible
        out = np.empty_like(feats, np.float32)
        for i, row in enumerate(feats.astype(np.float64)):
            self._count += 1
            d = row - self._mean
            self._mean += d / self._count
            self._m2 += d * (row - self._mean)
            var = self._m2 / self._count
            out[i] = (row - self._mean) / np.sqrt(var + cfg.norm_eps)
        return out

    def feed(self, wave_chunk) -> np.ndarray:
        """[Lc] samples -> [E, F] feature frames (E may be 0)."""
        if self._flushed:
            raise RuntimeError("extractor already flushed")
        chunk = np.asarray(wave_chunk, np.float32).reshape(-1)
        self._n_samples += len(chunk)
        if not self._started:
            self._raw = np.concatenate([self._raw, chunk])
            if len(self._raw) <= self._pad:
                return np.zeros((0, self._cfg.n_features), np.float32)
            self._buf = np.concatenate([self._left_pad(self._raw), self._raw])
            self._raw = np.zeros((0,), np.float32)
            self._started = True
        else:
            self._buf = np.concatenate([self._buf, chunk])
        return self._emit_ready()

    def flush(self) -> np.ndarray:
        """End of stream: apply the tail reflect padding, emit the rest."""
        if self._flushed:
            raise RuntimeError("extractor already flushed")
        self._flushed = True
        cfg = self._cfg
        if self._n_samples == 0:
            return np.zeros((0, cfg.n_features), np.float32)
        if not self._started:
            # the whole stream was shorter than the left padding: take the
            # offline path outright (np.pad handles the multi-reflection)
            self._buf = np.pad(self._raw, (self._pad, self._pad),
                               mode=cfg.pad_mode)
            self._trim = 0
            self._started = True
            return self._emit_ready(final=True)
        if self._pad:
            # right padding reflects the original signal's tail; the
            # buffer retention policy guarantees the newest pad+1
            # original samples are still present
            sig = self._buf
            right = (np.pad(sig, (0, self._pad), mode="reflect")[-self._pad:]
                     if cfg.pad_mode == "reflect"
                     else np.zeros((self._pad,), np.float32))
            self._buf = np.concatenate([sig, right])
        return self._emit_ready(final=True)


class StreamingGenerator:
    """Waveform chunks in, pose chunks out — the online counterpart of
    ``Music2DanceModel.generate`` (composes StreamingFeatureExtractor and
    StreamingSession; construct via ``Music2DanceModel.stream()``).

    End-to-end lag: ``n_fft//2`` samples (feature lookahead) plus the
    encoder's right halo in frames — ~0.09 s at the default config."""

    def __init__(self, extractor: StreamingFeatureExtractor,
                 session: StreamingSession):
        self._ex = extractor
        self._sess = session

    @property
    def frames_emitted(self) -> int:
        return self._sess.frames_emitted

    def feed(self, wave_chunk) -> np.ndarray:
        """[Lc] samples -> [E, n_joints, joint_dim] poses (E may be 0)."""
        feats = self._ex.feed(wave_chunk)
        return self._sess.feed(feats[None])[0]

    def plan_feed(self, wave_chunk) -> "EmitPlan | None":
        """Plan-level feed for batched execution across sessions: extract
        features, return the pending EmitPlan (None when nothing is
        computable yet). Run it (``execute_plans`` or
        ``session.run_plan``), then finalize with ``apply_plan``."""
        feats = self._ex.feed(wave_chunk)
        return self._sess.plan_feed(feats[None])

    def apply_plan(self, plan: "EmitPlan", poses, carry) -> np.ndarray:
        return self._sess.apply(plan, poses, carry)[0]

    @property
    def session(self) -> StreamingSession:
        return self._sess

    def flush(self) -> np.ndarray:
        """End of stream -> the remaining [E, n_joints, joint_dim] poses."""
        feats = self._ex.flush()
        tail = self._sess.feed(feats[None])[0]
        return np.concatenate([tail, self._sess.flush()[0]], axis=0)
