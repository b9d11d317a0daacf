"""Production serving: dynamic request batching + an HTTP front end.

The reference repo stops at a one-shot generate CLI (SURVEY.md §3.3:
``generate.py`` loads a checkpoint and decodes one song). Serving many
concurrent requests from one TPU chip needs two things that CLI shape
doesn't have, and both are TPU-architecture constraints, not web
plumbing:

1. **Dynamic batching.** A single-song decode is a [1, H] x [H, 3H]
   matmul per timestep — 1 of the MXU's 128 rows. Concurrent requests
   are coalesced into ONE masked batched decode (the same two-jitted-call
   path as ``Music2DanceModel.generate_batch``), so load rides the batch
   dimension the hardware wants. Requests are answered through per-request
   futures; each request's latent z is derived from its OWN seed
   (``decode_poses(z=...)``), so a request's result depends only on its
   (song, seed) — never on which batch it was coalesced into (identical
   up to XLA reduction-order noise between differently-shaped compiled
   programs; tested: tests/test_serving.py).

2. **Static-shape discipline.** XLA compiles one program per input shape;
   free-form request shapes would retrace forever and a serving process
   would spend its life in the compiler. Every batch is padded onto a
   fixed grid — batch size up to the next power of two (<= max_batch),
   song length up to the next multiple of ``bucket_seconds`` — bounding
   the jit cache at |batch buckets| x |length buckets| programs, each
   compiled exactly once and warmable at startup (``warmup()``).

The HTTP layer is stdlib-only (ThreadingHTTPServer): POST /generate with
either an audio FILE body (WAV/FLAC/AIFF/MP3/Ogg/M4A — sniffed by magic
bytes, decoded + resampled through the same load_wav path as generate.py)
or raw little-endian samples (int16 or float32) at the model rate,
returning the pose sequence as an .npy blob; GET /healthz returns model +
batching stats. Raw PCM16 request bodies keep the half-width host->device
transfer path end to end.
"""

from __future__ import annotations

import dataclasses
import io
import json
import queue
import threading
from concurrent.futures import Future
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional, Sequence
from urllib.parse import parse_qs, urlparse

import jax
import jax.numpy as jnp
import numpy as np

from ..data.wav import _sniff_container, load_wav
from .api import Music2DanceModel
from .decode import jit_decoder


def _decode_file_body(body: bytes, target_sr: int) -> np.ndarray:
    """Decode an uploaded audio file (bytes) to mono f32 at target_sr.

    The codec libraries take paths, so the body lands in a temp file —
    decode cost dwarfs the copy, and it keeps this the exact same code
    path generate.py uses (load_wav: sniff -> decode -> resample).
    """
    import os
    import tempfile

    fd, tmp = tempfile.mkstemp(suffix=".audio")
    try:
        with os.fdopen(fd, "wb") as f:
            f.write(body)
        wave, _sr = load_wav(tmp, target_sr=target_sr)
    finally:
        os.unlink(tmp)
    return wave


@dataclasses.dataclass(frozen=True)
class ServingConfig:
    """Batching/shape-grid knobs.

    max_batch: largest coalesced batch (also the largest batch bucket).
    max_wait_ms: how long a non-full batch waits for stragglers once it
        has at least one request. Latency floor for a lone request.
    bucket_seconds: song-length grid pitch; songs pad up to the next
        multiple. Coarser = fewer compiled programs, more wasted frames.
    max_seconds: longest accepted song (requests beyond it are rejected
        up front — an unbounded length axis would defeat the grid).
    """

    max_batch: int = 16
    max_wait_ms: float = 20.0
    bucket_seconds: float = 8.0
    max_seconds: float = 64.0
    # Upload cap, enforced BEFORE the body is read: raw f32 at max length
    # is max_seconds*sr*4 bytes and no supported container is materially
    # larger than raw, so 8x headroom over a 22.05 kHz song is generous
    # while still bounding a hostile Content-Length.
    max_body_bytes: int = 64 << 20
    # Streaming sessions (POST /stream/*): cap on concurrently open
    # sessions, and how long an idle session lives before lazy eviction.
    max_streams: int = 64
    stream_ttl_s: float = 120.0
    # Coalescing of concurrent stream feeds into lockstep device calls
    # (64 solo B=1 dispatches per tick are ~9x slower than one B=64 call
    # — benchmarks/RESULTS.md multi-stream table). How long a feed waits
    # for compatible feeds from other sessions; 0 disables coalescing.
    stream_wait_ms: float = 5.0

    def batch_bucket(self, n: int) -> int:
        """Smallest power of two >= n, capped at max_batch."""
        if n > self.max_batch:
            raise ValueError(f"batch {n} > max_batch {self.max_batch}")
        b = 1
        while b < n:
            b *= 2
        return min(b, self.max_batch)

    def length_bucket(self, n_samples: int, sample_rate: int) -> int:
        """Smallest multiple of bucket_seconds (in samples) >= n_samples."""
        pitch = max(1, int(round(self.bucket_seconds * sample_rate)))
        limit = int(round(self.max_seconds * sample_rate))
        if n_samples > limit:
            raise ValueError(
                f"song of {n_samples} samples exceeds max_seconds="
                f"{self.max_seconds} at {sample_rate} Hz"
            )
        return min(-(-n_samples // pitch) * pitch, limit)


@dataclasses.dataclass
class _Request:
    waveform: np.ndarray
    seed: Optional[int]
    future: Future


class BatchingEngine:
    """Coalesces concurrent generate() calls into bucketed batched decodes.

    One background worker thread drains a queue: it takes the first
    waiting request, gathers more until the batch is full or max_wait_ms
    has passed, pads the group onto the (batch, length) grid, and runs the
    two jitted calls (masked extraction + masked decode). Results resolve
    each request's Future.
    """

    def __init__(self, model: Music2DanceModel, cfg: ServingConfig = ServingConfig()):
        self.model = model
        self.cfg = cfg
        self._q: "queue.Queue[_Request]" = queue.Queue()
        self._stop = threading.Event()
        self._lock = threading.Lock()
        self._seed_counter = 0
        self.stats = {"requests": 0, "batches": 0, "errors": 0,
                      "padded_slots": 0, "buckets": {}}
        self._worker = threading.Thread(
            target=self._loop, name="m2d-batcher", daemon=True
        )
        self._worker.start()

    # ---------------------------------------------------------- public
    def submit(self, waveform: np.ndarray, seed: Optional[int] = None) -> Future:
        """Enqueue one song; the Future resolves to [T, n_joints, joint_dim].

        ``waveform``: float or raw PCM16 int16 samples at the model's
        sample rate. ``seed=None`` draws a fresh server-side seed (still
        per-request: the latent never depends on batch composition).
        """
        if self._stop.is_set():
            raise RuntimeError("engine is closed")
        w = np.asarray(waveform)
        if w.ndim != 1 or len(w) == 0:
            raise ValueError(f"waveform must be 1-D and non-empty, got {w.shape}")
        # reject over-long songs NOW, on the caller's thread
        self.cfg.length_bucket(len(w), self.model.audio.sample_rate)
        if seed is None:
            with self._lock:
                seed = self._seed_counter
                self._seed_counter += 1
        fut: Future = Future()
        self._q.put(_Request(w, int(seed), fut))
        return fut

    def generate(self, waveform: np.ndarray, seed: Optional[int] = None) -> np.ndarray:
        """Blocking convenience wrapper around submit()."""
        return self.submit(waveform, seed).result()

    def warmup(self, lengths_seconds: Optional[Sequence[float]] = None) -> int:
        """Pre-compile grid programs so first requests don't hit the
        compiler. Returns the number of (batch, length) programs built.
        Default: every length bucket at batch bucket 1 and max_batch."""
        sr = self.model.audio.sample_rate
        if lengths_seconds is None:
            n = int(round(self.cfg.max_seconds / self.cfg.bucket_seconds))
            lengths_seconds = [
                self.cfg.bucket_seconds * (i + 1) for i in range(max(1, n))
            ]
        count = 0
        for secs in lengths_seconds:
            for b in {1, self.cfg.max_batch}:
                wave = np.zeros(int(round(secs * sr)), np.float32)
                reqs = [
                    _Request(wave, i, Future()) for i in range(b)
                ]
                self._run_batch(reqs)
                count += 1
        return count

    def close(self):
        self._stop.set()
        self._worker.join(timeout=5.0)
        # fail anything still queued
        while True:
            try:
                req = self._q.get_nowait()
            except queue.Empty:
                break
            req.future.set_exception(RuntimeError("engine closed"))

    # ---------------------------------------------------------- worker
    def _loop(self):
        import time

        while not self._stop.is_set():
            try:
                first = self._q.get(timeout=0.05)
            except queue.Empty:
                continue
            batch = [first]
            deadline = time.monotonic() + self.cfg.max_wait_ms / 1e3
            while len(batch) < self.cfg.max_batch:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                try:
                    batch.append(self._q.get(timeout=remaining))
                except queue.Empty:
                    break
            try:
                self._run_batch(batch)
            except Exception as e:  # noqa: BLE001 — worker must survive
                with self._lock:
                    self.stats["errors"] += 1
                for req in batch:
                    if not req.future.done():
                        req.future.set_exception(e)

    def _run_batch(self, batch: "list[_Request]"):
        from ..audio.frontend import pad_and_extract_batch

        model, cfg = self.model, self.cfg
        sr = model.audio.sample_rate
        b_bucket = cfg.batch_bucket(len(batch))
        l_bucket = max(
            cfg.length_bucket(len(r.waveform), sr) for r in batch
        )
        feats, lengths = pad_and_extract_batch(
            [r.waveform for r in batch], model.audio,
            pad_to_samples=l_bucket, pad_to_batch=b_bucket,
        )
        # per-REQUEST latents: z_i depends only on the request's seed, so
        # the same (song, seed) decodes the same in any batch mix
        # (matches Music2DanceModel.generate's z for the same seed).
        noise = model.gan.generator.noise_dim
        z = np.zeros((b_bucket, noise), np.float32)
        for i, r in enumerate(batch):
            z[i] = np.asarray(
                jax.random.normal(jax.random.key(r.seed), (1, noise))
            )[0]
        poses = jit_decoder(model.gan.generator, masked=True, with_z=True)(
            model.g_params, feats, jnp.asarray(z), jnp.asarray(lengths)
        )
        poses = np.asarray(poses)
        with self._lock:
            self.stats["requests"] += len(batch)
            self.stats["batches"] += 1
            self.stats["padded_slots"] += b_bucket - len(batch)
            key = f"{b_bucket}x{l_bucket}"
            self.stats["buckets"][key] = self.stats["buckets"].get(key, 0) + 1
        for i, req in enumerate(batch):
            req.future.set_result(poses[i, : lengths[i]])


class _StreamCoalescer:
    """Batches concurrent stream feeds into lockstep device calls.

    HTTP sessions feed independently, but the chip wants one [N, ...]
    call, not N [1, ...] calls. A worker drains the feed queue for up to
    ``stream_wait_ms``, partitions what arrived by plan key (sessions in
    the same steady state share program shapes), pads each group onto a
    power-of-two row bucket (bounded jit cache), and runs
    ``execute_plans``. A lone stream pays the wait as extra latency —
    the knob exists to turn that off (stream_wait_ms=0 bypasses this
    class entirely in _StreamRegistry.feed).
    """

    def __init__(self, g_params, gen_cfg, wait_ms: float, max_group: int):
        self._params = g_params
        self._cfg = gen_cfg
        self._wait_s = wait_ms / 1e3
        self._max_group = max_group
        self._q: "queue.Queue" = queue.Queue()
        self._stop = threading.Event()
        self.batches = 0
        self.rows = 0
        self._worker = threading.Thread(
            target=self._loop, name="m2d-stream-coalescer", daemon=True)
        self._worker.start()

    def run(self, plan) -> "tuple":
        """Enqueue one session's plan; blocks until its (poses, carry)."""
        if self._stop.is_set():
            raise RuntimeError("coalescer is closed")
        fut: Future = Future()
        self._q.put((plan, fut))
        return fut.result()

    def close(self):
        self._stop.set()
        self._worker.join(timeout=5.0)
        while True:
            try:
                _plan, fut = self._q.get_nowait()
            except queue.Empty:
                break
            fut.set_exception(RuntimeError("coalescer closed"))

    def _loop(self):
        import time

        from .streaming import execute_plans

        while not self._stop.is_set():
            try:
                first = self._q.get(timeout=0.05)
            except queue.Empty:
                continue
            batch = [first]
            deadline = time.monotonic() + self._wait_s
            while len(batch) < self._max_group:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                try:
                    batch.append(self._q.get(timeout=remaining))
                except queue.Empty:
                    break
            groups: dict = {}
            for plan, fut in batch:
                groups.setdefault(plan.key(), []).append((plan, fut))
            for items in groups.values():
                try:
                    pad = 1
                    while pad < len(items):
                        pad *= 2
                    results = execute_plans(
                        self._params, self._cfg,
                        [p for p, _ in items], pad_to=pad)
                    self.batches += 1
                    self.rows += len(items)
                    for (_, fut), res in zip(items, results):
                        fut.set_result(res)
                except Exception as e:  # noqa: BLE001 — worker must survive
                    for _, fut in items:
                        if not fut.done():
                            fut.set_exception(e)


class _StreamRegistry:
    """Server-side online-decode sessions behind POST /stream/*.

    Each session wraps a ``Music2DanceModel.stream()`` generator (running
    or none stats — frozen whole-clip stats need the whole clip, which is
    what /generate is for). Sessions are keyed by an unguessable id,
    bounded in count (``max_streams``) and lazily evicted after
    ``stream_ttl_s`` of inactivity — a client that vanishes mid-stream
    can't leak memory. Per-session locks serialize concurrent feeds;
    session state (recurrent carry + halo buffers) lives entirely here,
    so the protocol itself is plain stateless HTTP posts.
    """

    def __init__(self, model: Music2DanceModel, cfg: ServingConfig,
                 frozen_stats=None):
        self._model = model
        self._cfg = cfg
        # corpus-level FrontendStats (preprocess.py --stats_out): the
        # deterministic production policy, selected with stats=frozen
        self._frozen = frozen_stats
        self._lock = threading.Lock()
        self._sessions: dict = {}
        self._seed_counter = 0
        self.stats = {"opened": 0, "expired": 0, "stream_frames": 0,
                      "coalesced_batches": 0, "coalesced_rows": 0}
        self._coalescer = (
            _StreamCoalescer(model.g_params, model.gan.generator,
                             cfg.stream_wait_ms, cfg.max_streams)
            if cfg.stream_wait_ms > 0 else None)

    def swap_params(self, g_params) -> None:
        """Hot-reload entry (CheckpointWatcher): point the coalescer and
        every OPEN session at the new generator weights. Sessions capture
        params at creation; without this, a coalesced feed and a solo
        feed of the same pre-reload session would decode with different
        weights. Open streams change style mid-dance (the recurrent carry
        is kept) — the documented reload semantics."""
        params = g_params.get("params", g_params)
        with self._lock:
            if self._coalescer is not None:
                self._coalescer._params = g_params
            for entry in self._sessions.values():
                entry["gen"].session._params = params

    def _evict_locked(self, now: float):
        dead = [k for k, s in self._sessions.items()
                if now - s["last_used"] > self._cfg.stream_ttl_s]
        for k in dead:
            del self._sessions[k]
        self.stats["expired"] += len(dead)

    def open(self, seed: Optional[int], stats_mode: str) -> str:
        import time
        import uuid

        if stats_mode == "frozen":
            if self._frozen is None:
                raise ValueError(
                    "stats=frozen but the server has no corpus stats "
                    "(start serve.py with --stream_stats)")
            stats = self._frozen
        else:
            stats = stats_mode
        with self._lock:
            now = time.monotonic()
            self._evict_locked(now)
            if len(self._sessions) >= self._cfg.max_streams:
                raise RuntimeError(
                    f"max_streams={self._cfg.max_streams} sessions open")
            if seed is None:
                seed = 1_000_000_000 + self._seed_counter
                self._seed_counter += 1
            sid = uuid.uuid4().hex
            self._sessions[sid] = {
                "gen": self._model.stream(seed=int(seed), stats=stats),
                "lock": threading.Lock(),
                "last_used": now,
            }
            self.stats["opened"] += 1
        return sid

    def _get(self, sid: str):
        import time

        with self._lock:
            now = time.monotonic()
            self._evict_locked(now)
            sess = self._sessions.get(sid)
            if sess is None:
                raise KeyError("unknown or expired session")
            sess["last_used"] = now
        return sess

    def feed(self, sid: str, wave: np.ndarray) -> np.ndarray:
        sess = self._get(sid)
        with sess["lock"]:
            try:
                gen = sess["gen"]
                if self._coalescer is None:
                    poses = gen.feed(wave)
                else:
                    plan = gen.plan_feed(wave)
                    if plan is None:  # nothing computable yet: [0, J, D]
                        layout = self._model.gan.generator.layout
                        poses = np.zeros(
                            (0, layout.n_joints, layout.joint_dim),
                            np.float32)
                    else:
                        out, carry = self._coalescer.run(plan)
                        poses = gen.apply_plan(plan, out, carry)
            except RuntimeError as e:
                if "flushed" in str(e):
                    # lost a race against a concurrent close(): the
                    # session is gone, same contract as an expired one
                    raise KeyError("unknown or expired session") from e
                raise
        with self._lock:
            self.stats["stream_frames"] += len(poses)
            if self._coalescer is not None:
                self.stats["coalesced_batches"] = self._coalescer.batches
                self.stats["coalesced_rows"] = self._coalescer.rows
        return poses

    def close(self, sid: str) -> np.ndarray:
        # flush BEFORE removing the session: if the flush fails the
        # session (and its held-back tail frames) survives for a retry
        sess = self._get(sid)
        with sess["lock"]:
            poses = sess["gen"].flush()
        with self._lock:
            self._sessions.pop(sid, None)
            self.stats["stream_frames"] += len(poses)
        return poses

    def open_count(self) -> int:
        with self._lock:
            return len(self._sessions)

    def shutdown(self):
        if self._coalescer is not None:
            self._coalescer.close()
        with self._lock:
            self._sessions.clear()

    def warmup(self, chunk_frames=(3, 15, 30)) -> int:
        """Precompile the stream programs for the given chunk sizes (in
        feature frames) so a production session's first feeds don't pay
        the compiler — on a TPU a cold Pallas compile is minutes. Only
        helps clients that stream chunks of these sizes (constant-size
        chunks are the documented fast path). Uses throwaway sessions
        outside the registry, so client-facing stats stay clean. Returns
        the number of programs warmed (first feed / steady state / flush
        per chunk size; the jit caches are shared by real sessions)."""
        hop = self._model.audio.hop_length
        count = 0
        for frames in chunk_frames:
            gen = self._model.stream(seed=0, stats="running")
            chunk = np.zeros((max(1, int(frames)) * hop,), np.float32)
            gen.feed(chunk)
            gen.feed(chunk)
            gen.flush()
            count += 3
        return count


class CheckpointWatcher:
    """Hot checkpoint reload: serve a training run's weights as it trains.

    Polls a checkpoint directory and swaps the model's generator params
    when a newer checkpoint appears — the production pattern is training
    with ``--eval_every`` (the writer maintains the best-by-eval slot)
    and serving with ``step_selector="best"``: the server always answers
    with the best weights so far, with zero restarts and zero
    recompilation (params are jit arguments; the swap is one attribute
    assignment, picked up by the next batch). ``step_selector="latest"``
    follows the newest step instead.

    Transient restore failures (e.g. a poll racing the async writer) are
    recorded in ``last_error`` and retried next poll — the watcher never
    kills the server. An architecture change in the directory raises
    inside the poll and is likewise surfaced, not served.
    """

    def __init__(self, model: Music2DanceModel, ckpt_dir: str,
                 step_selector: str = "best", poll_s: float = 10.0,
                 registry: "_StreamRegistry | None" = None,
                 initial_step: "int | None" = None,
                 start: bool = True):
        if step_selector not in ("best", "latest"):
            raise ValueError(
                f"step_selector must be best|latest, got {step_selector!r}")
        self._model = model
        self._dir = ckpt_dir
        self._sel = step_selector
        self._poll = poll_s
        self._registry = registry
        self.loaded_step = initial_step
        self.reloads = 0
        self.last_error: "str | None" = None
        self._stop = threading.Event()
        self._thread = threading.Thread(
            target=self._loop, name="m2d-ckpt-watcher", daemon=True)
        if start:
            self._thread.start()

    def _target_step(self) -> "int | None":
        from ..ckpt.orbax_io import best_step_info, checkpoint_steps

        if self._sel == "best":
            info = best_step_info(self._dir)
            return None if info is None else int(info["step"])
        steps = checkpoint_steps(self._dir)
        return steps[-1] if steps else None

    def check_once(self) -> bool:
        """One poll: reload if a newer target exists. Returns True on a
        completed swap."""
        try:
            target = self._target_step()
            if target is None or target == self.loaded_step:
                return False
            sel = "best" if self._sel == "best" else target
            self._model.reload_from_checkpoint(self._dir, step=sel)
            if self._registry is not None:
                self._registry.swap_params(self._model.g_params)
            self.loaded_step = target
            self.reloads += 1
            self.last_error = None
            return True
        except Exception as e:  # noqa: BLE001 — watcher must outlive races
            self.last_error = f"{type(e).__name__}: {e}"
            return False

    def _loop(self):
        while not self._stop.wait(self._poll):
            self.check_once()

    def close(self):
        self._stop.set()
        if self._thread.is_alive():
            self._thread.join(timeout=5.0)


class InferenceServer:
    """Stdlib HTTP server in front of a BatchingEngine.

    POST /generate?dtype={int16|float32}&seed=N[&format={auto|raw|file}]
        body: an audio FILE (WAV/FLAC/AIFF/MP3/Ogg/M4A — sniffed by magic
        bytes, decoded and resampled to the model rate through the same
        path as generate.py), or raw little-endian samples already at
        the model's sample rate. ``format=auto`` (default) sniffs;
        ``raw`` / ``file`` force one interpretation (raw guards against
        PCM that happens to start with container magic).
        200: .npy blob, float32 [T, n_joints, joint_dim]
        400/413: malformed input / song longer than max_seconds
    POST /stream/open?seed=N&stats={running|none|frozen}
        opens an online-decode session (infer/streaming.py semantics);
        stats=frozen uses the server's corpus-level FrontendStats
        (``stream_stats`` / serve.py --stream_stats; 400 when unset)
        200: JSON {session, sample_rate, lag_frames, lag_samples}
        429: max_streams sessions already open
    POST /stream/feed?session=ID&dtype={int16|float32}
        body: the next raw samples at the model rate (any chunk size)
        200: .npy blob of the poses that became computable (may be [0,...])
        404: unknown or expired (stream_ttl_s) session
    POST /stream/close?session=ID
        flushes + ends the session; 200: .npy blob of the trailing poses
    GET /healthz
        200: JSON {status, sample_rate, joints, batching + stream stats}
    """

    def __init__(self, model: Music2DanceModel,
                 cfg: ServingConfig = ServingConfig(),
                 host: str = "127.0.0.1", port: int = 0,
                 stream_stats=None):
        self.engine = BatchingEngine(model, cfg)
        engine = self.engine
        self.streams = _StreamRegistry(model, cfg, frozen_stats=stream_stats)
        streams = self.streams
        # serve.py attaches a CheckpointWatcher here (--reload_poll_s);
        # healthz reads it through the server reference so attachment
        # after construction is visible
        self.watcher: "CheckpointWatcher | None" = None
        server_self = self
        layout = model.gan.generator.layout
        sr = model.audio.sample_rate
        from .streaming import encoder_halo

        stream_lag_frames = encoder_halo(model.gan.generator)[1]
        stream_lag_samples = (model.audio.n_fft // 2
                              if model.audio.center else 0)

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet by default
                pass

            def _send(self, code: int, body: bytes, ctype: str):
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if urlparse(self.path).path != "/healthz":
                    self._send(404, b'{"error": "not found"}', "application/json")
                    return
                with engine._lock:
                    stats = json.loads(json.dumps(engine.stats))
                with streams._lock:
                    stats.update(streams.stats)
                stats["streams_open"] = streams.open_count()
                info = {
                    "status": "ok",
                    "sample_rate": sr,
                    "n_joints": layout.n_joints,
                    "joint_dim": layout.joint_dim,
                    "stats": stats,
                }
                w = server_self.watcher
                if w is not None:
                    info["checkpoint"] = {
                        "loaded_step": w.loaded_step,
                        "selector": w._sel,
                        "reloads": w.reloads,
                        "last_error": w.last_error,
                    }
                self._send(200, json.dumps(info).encode(), "application/json")

            def _parse_raw_samples(self, body: bytes, q, allow_empty: bool,
                                   dequantize: bool) -> "np.ndarray | None":
                """Validate + decode raw little-endian samples; sends the
                error response and returns None on failure. ``dequantize``
                converts int16 on the host — the batched /generate path
                keeps int16 for the half-width host->device transfer, the
                streaming path wants float."""
                dtype = q.get("dtype", ["float32"])[0]
                if dtype not in ("int16", "float32"):
                    self._send(400, b'{"error": "dtype must be int16|float32"}',
                               "application/json")
                    return None
                np_dtype = np.dtype("<i2" if dtype == "int16" else "<f4")
                n = len(body)
                if (n == 0 and not allow_empty) or n % np_dtype.itemsize:
                    self._send(400, b'{"error": "body length not a '
                               b'multiple of the sample size"}',
                               "application/json")
                    return None
                wave = np.frombuffer(body, np_dtype)
                if dequantize and np_dtype == np.dtype("<i2"):
                    wave = wave.astype(np.float32) / 32768.0
                return wave

            def _read_capped_body(self) -> "bytes | None":
                """Read the body after the Content-Length cap; sends 413
                and returns None when over the cap."""
                n = int(self.headers.get("Content-Length", 0))
                if n > cfg.max_body_bytes:
                    # rejected before the body is read (bounded memory)
                    self._send(413, json.dumps({
                        "error": f"body of {n} bytes exceeds "
                                 f"max_body_bytes={cfg.max_body_bytes}"
                    }).encode(), "application/json")
                    return None
                return self.rfile.read(n)

            def _send_poses(self, poses):
                buf = io.BytesIO()
                np.save(buf, np.asarray(poses, np.float32))
                self._send(200, buf.getvalue(), "application/octet-stream")

            def _post_stream(self, parsed, q):
                if parsed.path == "/stream/open":
                    seed = q.get("seed", [None])[0]
                    stats_mode = q.get("stats", ["running"])[0]
                    if stats_mode not in ("running", "none", "frozen"):
                        self._send(400, b'{"error": "stats must be '
                                   b'running|none|frozen"}',
                                   "application/json")
                        return
                    try:
                        seed = None if seed is None else int(seed)
                    except ValueError:
                        self._send(400, b'{"error": "seed must be an '
                                   b'integer"}', "application/json")
                        return
                    try:
                        sid = streams.open(seed, stats_mode)
                    except ValueError as e:  # frozen without corpus stats
                        self._send(400, json.dumps({"error": str(e)}).encode(),
                                   "application/json")
                        return
                    except RuntimeError as e:
                        self._send(429, json.dumps({"error": str(e)}).encode(),
                                   "application/json")
                        return
                    self._send(200, json.dumps({
                        "session": sid,
                        "sample_rate": sr,
                        "lag_frames": stream_lag_frames,
                        "lag_samples": stream_lag_samples,
                    }).encode(), "application/json")
                    return
                sid = q.get("session", [None])[0]
                if sid is None:
                    self._send(400, b'{"error": "missing session param"}',
                               "application/json")
                    return
                try:
                    if parsed.path == "/stream/feed":
                        body = self._read_capped_body()
                        if body is None:
                            return
                        wave = self._parse_raw_samples(
                            body, q, allow_empty=True, dequantize=True)
                        if wave is None:
                            return
                        poses = streams.feed(sid, wave)
                    else:  # /stream/close
                        poses = streams.close(sid)
                except KeyError as e:
                    self._send(404, json.dumps(
                        {"error": str(e).strip("'")}).encode(),
                        "application/json")
                    return
                except Exception as e:  # runtime failure must answer, not drop
                    self._send(500, json.dumps(
                        {"error": f"{type(e).__name__}: {e}"}).encode(),
                        "application/json")
                    return
                self._send_poses(poses)

            def do_POST(self):
                parsed = urlparse(self.path)
                q = parse_qs(parsed.query)
                if parsed.path in ("/stream/open", "/stream/feed",
                                   "/stream/close"):
                    self._post_stream(parsed, q)
                    return
                if parsed.path != "/generate":
                    self._send(404, b'{"error": "not found"}', "application/json")
                    return
                dtype = q.get("dtype", ["float32"])[0]
                if dtype not in ("int16", "float32"):
                    self._send(400, b'{"error": "dtype must be int16|float32"}',
                               "application/json")
                    return
                fmt = q.get("format", ["auto"])[0]
                if fmt not in ("auto", "raw", "file"):
                    self._send(400, b'{"error": "format must be '
                               b'auto|raw|file"}', "application/json")
                    return
                seed = q.get("seed", [None])[0]
                body = self._read_capped_body()
                if body is None:
                    return
                if fmt != "raw" and _sniff_container(body[:12]) != "unknown":
                    try:
                        wave = _decode_file_body(body, sr)
                    except Exception as e:
                        # decoders document ValueError but malformed input
                        # can surface struct.error etc. — every decode
                        # failure must become a 400, never a dropped
                        # connection from a crashed handler thread
                        self._send(400, json.dumps(
                            {"error": f"{type(e).__name__}: {e}"}).encode(),
                            "application/json")
                        return
                elif fmt == "file":
                    self._send(400, b'{"error": "format=file but the body '
                               b'is not a recognized audio container"}',
                               "application/json")
                    return
                else:
                    # int16 stays int16: the engine ships PCM16 to the
                    # device at half width and dequantizes there
                    wave = self._parse_raw_samples(
                        body, q, allow_empty=False, dequantize=False)
                    if wave is None:
                        return
                try:
                    fut = engine.submit(
                        wave, None if seed is None else int(seed)
                    )
                    poses = fut.result()
                except ValueError as e:
                    code = 413 if "max_seconds" in str(e) else 400
                    self._send(code, json.dumps({"error": str(e)}).encode(),
                               "application/json")
                    return
                except Exception as e:
                    # engine closed / device runtime failure from the
                    # batch worker: answer 500 instead of aborting the
                    # connection with no status
                    self._send(500, json.dumps(
                        {"error": f"{type(e).__name__}: {e}"}).encode(),
                        "application/json")
                    return
                self._send_poses(poses)

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self._thread: Optional[threading.Thread] = None

    @property
    def address(self) -> "tuple[str, int]":
        return self._httpd.server_address[:2]

    def start(self):
        """Serve on a background thread (tests / embedding)."""
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, name="m2d-http", daemon=True
        )
        self._thread.start()
        return self

    def serve_forever(self):
        self._httpd.serve_forever()

    def close(self):
        self._httpd.shutdown()
        self._httpd.server_close()
        if self._thread is not None:
            self._thread.join(timeout=5.0)
        self.streams.shutdown()
        self.engine.close()
