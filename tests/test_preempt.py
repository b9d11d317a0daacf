"""Preemption-safe training: SIGTERM -> durable checkpoint -> clean
return -> resume at the absolute step (train/preempt.py).

The signal is raised in-process (``signal.raise_signal``) from inside
the loop's own data/eval callbacks, which is exactly the asynchronous
shape a cluster eviction has: the handler only sets a flag, the loop
acts at its next boundary. Both loops (per-step ``train`` and
chunk-fused ``train_from_store``) are covered, plus handler hygiene.
"""

import json
import os
import signal
import threading

import jax
import numpy as np

from music2dance_tpu.audio import AudioConfig
from music2dance_tpu.data.pipeline import SyntheticClipSource, make_dataset
from music2dance_tpu.data.device_store import DeviceFeatureStore
from music2dance_tpu.models import JointLayout, tiny_gan
from music2dance_tpu.train import PreemptionGuard, TrainConfig
from music2dance_tpu.train.loop import train, train_from_store

AUDIO = AudioConfig(sample_rate=8000, n_fft=256, win_length=256, hop_length=200,
                    n_mels=40, n_mfcc=13)
LAYOUT = JointLayout(n_joints=5, joint_dim=3)
GAN = tiny_gan(feature_dim=AUDIO.n_mfcc, layout=LAYOUT)


def test_guard_flag_and_handler_restore():
    before = signal.getsignal(signal.SIGTERM)
    with PreemptionGuard() as g:
        assert g.installed and not g.triggered
        signal.raise_signal(signal.SIGTERM)
        assert g.triggered
    assert signal.getsignal(signal.SIGTERM) is before


def test_guard_off_main_thread_degrades():
    out = {}

    def run():
        with PreemptionGuard() as g:
            out["installed"] = g.installed
            out["triggered"] = g.triggered

    t = threading.Thread(target=run)
    t.start()
    t.join()
    assert out == {"installed": False, "triggered": False}


def test_train_loop_preempts_and_resumes(tmp_path):
    # NB the signal must be raised from INSIDE the guarded loop — the
    # evaluator is the clean injection point. Raising it from the data
    # iterator races with DevicePrefetcher's priming, which pulls
    # batches before train() installs the guard (a raw SIGTERM there
    # kills the process — the exact failure the guard exists to stop).
    tc = TrainConfig(batch_size=4, clip_seconds=0.5, log_every=1,
                     ckpt_every=100, eval_every=2)
    src = SyntheticClipSource(8, 1.0, AUDIO, LAYOUT)

    def evaluator(state):
        signal.raise_signal(signal.SIGTERM)
        return {"fmd": 1.0}

    ckpt_dir = str(tmp_path / "ckpt")
    log_dir = str(tmp_path / "logs")
    ds = make_dataset(src, tc.batch_size, tc.clip_seconds, AUDIO, seed=0)
    state = train(GAN, tc, AUDIO, iter(ds), total_steps=50,
                  ckpt_dir=ckpt_dir, log_dir=log_dir, evaluator=evaluator)
    stopped = int(state.step)
    assert 0 < stopped < 50  # returned early, after a whole step
    # the preempted row is in the log
    with open(os.path.join(log_dir, "metrics.jsonl")) as f:
        rows = [json.loads(l) for l in f]
    assert any(r.get("preempted") == 1.0 for r in rows)
    # the checkpoint at the stop step is durable and resumable
    from music2dance_tpu.ckpt.orbax_io import checkpoint_steps, restore_bundle

    assert stopped in checkpoint_steps(ckpt_dir)
    _, _, restored = restore_bundle(ckpt_dir)
    assert int(restored.step) == stopped
    # resume: same absolute-target semantics as any restored run
    ds = make_dataset(src, tc.batch_size, tc.clip_seconds, AUDIO, seed=1)
    state2 = train(GAN, tc, AUDIO, iter(ds), total_steps=stopped + 2,
                   state=restored)
    assert int(state2.step) == stopped + 2


def test_store_loop_preempts(tmp_path):
    tc = TrainConfig(batch_size=4, clip_seconds=0.5, log_every=2,
                     eval_every=2, ckpt_every=100)
    src = SyntheticClipSource(8, 1.0, AUDIO, LAYOUT)
    store = DeviceFeatureStore.from_source(src, AUDIO)

    calls = {"n": 0}

    def evaluator(state):  # fires on chunk boundaries (eval_every=2)
        calls["n"] += 1
        if calls["n"] == 2:
            signal.raise_signal(signal.SIGTERM)
        return {"fmd": 1.0}

    ckpt_dir = str(tmp_path / "ckpt")
    log_dir = str(tmp_path / "logs")
    state = train_from_store(GAN, tc, AUDIO, store, total_steps=40,
                             ckpt_dir=ckpt_dir, log_dir=log_dir,
                             evaluator=evaluator)
    stopped = int(state.step)
    assert 0 < stopped < 40
    with open(os.path.join(log_dir, "metrics.jsonl")) as f:
        rows = [json.loads(l) for l in f]
    assert any(r.get("preempted") == 1.0 for r in rows)
    from music2dance_tpu.ckpt.orbax_io import checkpoint_steps

    assert stopped in checkpoint_steps(ckpt_dir)
