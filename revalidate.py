"""Reference re-validation kit (SURVEY.md §0 consequence 2).

Every contract-critical claim in this build is validated against
self-built oracles because /root/reference has been EMPTY every round
(0 files) and librosa is not installed. The moment either changes, this
script turns re-validation from a multi-turn archaeology session into
minutes: run `python revalidate.py` and it executes every check that has
become possible, prints PENDING for the rest, and exits nonzero on any
FAIL.

Checks (each individually runnable with --only NAME):

  reference-mount        is /root/reference populated?
  librosa-parity         oracle (tests/oracle_audio.py) + XLA frontend vs
                         the real librosa at rtol 1e-4 [BASELINE gate]
  audio-constants        librosa call kwargs in the reference source vs
                         audio/params.AudioConfig defaults (SURVEY §2 C1)
  joint-layout           pose-shape constants in the reference source vs
                         models/configs.JointLayout 23x3 guess (§2 C2)
  architecture           cell family / hidden sizes named in the reference
                         source vs models/configs defaults (§2 C3/C4)
  torch-ckpt-roundtrip   load a real reference checkpoint, convert through
                         ckpt/torch_convert, forward-equivalence (§2 C8)

Usage:
  python revalidate.py                 # run everything possible
  python revalidate.py --only librosa-parity
  python revalidate.py --reference /path/to/checkout   # override mount
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import re
import sys

REFERENCE = "/root/reference"
PASS, FAIL, PENDING, MANUAL = "PASS", "FAIL", "PENDING", "MANUAL"


def _ref_files(root: str, exts=(".py",)) -> list[str]:
    out = []
    for dirpath, _dirs, files in os.walk(root):
        for f in files:
            if not exts or os.path.splitext(f)[1] in exts:
                out.append(os.path.join(dirpath, f))
    return sorted(out)


def _read_all(paths: list[str]) -> str:
    chunks = []
    for p in paths:
        try:
            with open(p, errors="replace") as f:
                chunks.append(f.read())
        except OSError:
            pass
    return "\n".join(chunks)


# ---------------------------------------------------------------------------
# Checks
# ---------------------------------------------------------------------------

def check_reference_mount(ref: str):
    files = _ref_files(ref, exts=())
    if not files:
        return PENDING, f"{ref} is empty — populate it (or pass --reference)"
    py = [f for f in files if f.endswith(".py")]
    return PASS, f"{len(files)} files ({len(py)} python) under {ref}"


def check_librosa_parity(ref: str):
    try:
        import librosa  # noqa: F401
    except ImportError:
        return PENDING, "librosa not installed (pip install librosa)"
    import numpy as np

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                    "tests"))
    from oracle_audio import oracle_melspectrogram, oracle_mfcc

    from music2dance_tpu.audio import AudioConfig, extract_features

    rng = np.random.default_rng(0)
    failures = []
    for cfg in (
        AudioConfig(),
        AudioConfig(sample_rate=8000, n_fft=256, win_length=256,
                    hop_length=200, n_mels=40, n_mfcc=13),
    ):
        y = (rng.standard_normal(cfg.num_samples(1.5)) * 0.3).astype(np.float32)
        mel_ref = librosa.feature.melspectrogram(
            y=y, sr=cfg.sample_rate, n_fft=cfg.n_fft, hop_length=cfg.hop_length,
            win_length=cfg.win_length, center=cfg.center, power=cfg.power,
            n_mels=cfg.n_mels, fmin=cfg.fmin, fmax=cfg.fmax, htk=cfg.htk,
            norm=cfg.mel_norm,
        ).T
        mfcc_ref = librosa.feature.mfcc(
            y=y, sr=cfg.sample_rate, n_mfcc=cfg.n_mfcc, n_fft=cfg.n_fft,
            hop_length=cfg.hop_length, win_length=cfg.win_length,
            center=cfg.center, n_mels=cfg.n_mels, fmin=cfg.fmin, fmax=cfg.fmax,
            htk=cfg.htk, norm=cfg.dct_norm,
        ).T
        pairs = [
            ("oracle_mel", oracle_melspectrogram(y, cfg), mel_ref),
            ("oracle_mfcc", oracle_mfcc(y, cfg), mfcc_ref),
        ]
        nc = dataclasses.replace(cfg, normalize=False)
        got = np.asarray(extract_features(y, nc))
        pairs.append(("xla_mfcc", got, mfcc_ref))
        for name, a, b in pairs:
            a, b = np.asarray(a), np.asarray(b)
            if a.shape != b.shape:
                failures.append(f"{name}@sr{cfg.sample_rate}: shape {a.shape} vs {b.shape}")
                continue
            rel = np.max(np.abs(a - b) / np.maximum(np.abs(b), 1e-3))
            if rel > 1e-4:
                failures.append(f"{name}@sr{cfg.sample_rate}: rel {rel:.2e} > 1e-4")
    if failures:
        return FAIL, "; ".join(failures)
    return PASS, "oracle + XLA frontend match librosa at rtol 1e-4 (2 configs)"


_AUDIO_KWARGS = {
    "sr": "sample_rate", "sample_rate": "sample_rate", "n_fft": "n_fft",
    "hop_length": "hop_length", "win_length": "win_length", "n_mels": "n_mels",
    "n_mfcc": "n_mfcc", "fmin": "fmin", "fmax": "fmax",
}


def check_audio_constants(ref: str):
    py = _ref_files(ref)
    if not py:
        return PENDING, "reference source absent"
    from music2dance_tpu.audio import AudioConfig

    cfg = AudioConfig()
    src = _read_all(py)
    found, diffs = {}, []
    for kw, ours_name in _AUDIO_KWARGS.items():
        for m in re.finditer(rf"\b{kw}\s*=\s*([0-9]+(?:\.[0-9]+)?)", src):
            found.setdefault(kw, set()).add(float(m.group(1)))
    if not found:
        return MANUAL, ("no librosa-style kwargs found in reference source — "
                        "inspect its frontend by hand")
    for kw, vals in sorted(found.items()):
        ours = getattr(cfg, _AUDIO_KWARGS[kw], None)
        ours_f = None if ours is None else float(ours)
        if ours_f is not None and ours_f not in vals:
            diffs.append(f"{kw}: reference uses {sorted(vals)}, build uses {ours_f}")
    detail = "found " + json.dumps({k: sorted(v) for k, v in sorted(found.items())})
    if diffs:
        return FAIL, "; ".join(diffs) + " | " + detail
    return PASS, detail + " — all match AudioConfig"


def check_joint_layout(ref: str):
    py = _ref_files(ref)
    if not py:
        return PENDING, "reference source absent"
    src = _read_all(py)
    hits = set()
    for pat in (r"n_joints\s*=\s*(\d+)", r"num_joints\s*=\s*(\d+)",
                r"\(\s*-1\s*,\s*(\d+)\s*,\s*([23])\s*\)",
                r"joints?\s*[,=].{0,20}?(\d\d)\b"):
        hits.update(m.group(1) for m in re.finditer(pat, src))
    if not hits:
        return MANUAL, ("no joint-count constants found — verify the 23x3 "
                        "guess (models/configs.JointLayout) against the "
                        "reference's pose files by hand")
    from music2dance_tpu.models.configs import JointLayout

    ours = JointLayout()
    if str(ours.n_joints) in hits:
        return PASS, f"reference names joint counts {sorted(hits)}; build uses {ours.n_joints}"
    return FAIL, (f"reference names joint counts {sorted(hits)} but the build "
                  f"defaults to {ours.n_joints} — update JointLayout and "
                  "re-run the checkpoint round-trip")


def check_architecture(ref: str):
    py = _ref_files(ref)
    if not py:
        return PENDING, "reference source absent"
    src = _read_all(py)
    cells = []
    for cell in ("GRU", "LSTM"):
        if re.search(rf"nn\.{cell}\b|{cell}Cell", src):
            cells.append(cell.lower())
    sizes = sorted({int(m.group(1)) for m in re.finditer(
        r"hidden(?:_size|_dim)?\s*=\s*(\d+)", src)})
    from music2dance_tpu.models.configs import GeneratorConfig

    ours = GeneratorConfig()
    notes = (f"reference cells={cells or 'none found'}, hidden sizes={sizes}; "
             f"build default cell={ours.cell!r} hidden={ours.hidden_dim} "
             "(both cells ride the fused kernel bank — flip the config if needed)")
    if cells and ours.cell not in cells:
        return FAIL, notes
    if not cells and not sizes:
        return MANUAL, "no architecture constants found — read the model file"
    return PASS, notes


def check_torch_ckpt(ref: str):
    cands = _ref_files(ref, exts=(".pt", ".pth", ".ckpt", ".tar"))
    if not cands:
        return PENDING, "no torch checkpoint (*.pt/*.pth/*.ckpt) under the reference"
    import numpy as np
    import torch

    path = cands[0]
    try:
        blob = torch.load(path, map_location="cpu", weights_only=False)
    except Exception as e:  # noqa: BLE001
        return FAIL, f"torch.load({path!r}) failed: {e}"
    sds = []
    if isinstance(blob, dict):
        for k, v in blob.items():
            if isinstance(v, dict) and any(hasattr(x, "shape") for x in v.values()):
                sds.append((k, v))
    if not sds:
        return MANUAL, f"loaded {path!r} but found no state_dict-like entries: {list(blob)[:8]}"
    shapes = {k: {n: tuple(t.shape) for n, t in v.items() if hasattr(t, "shape")}
              for k, v in sds[:2]}
    # the actual conversion needs the matching GANConfig; print the shapes
    # so the config can be written, then re-run with ckpt/torch_convert
    return MANUAL, (f"checkpoint {os.path.basename(path)} holds state dicts "
                    f"{list(shapes)} — derive the GANConfig from these shapes, "
                    "then run ckpt/torch_convert.load_torch_checkpoint and the "
                    "forward-equivalence test (tests/test_torch_convert.py "
                    f"pattern). First shapes: {json.dumps(shapes)[:600]}")




def check_codec_decode(ref: str):
    """MP3/Ogg/M4A decode parity vs librosa.load (which rides soundfile/
    audioread — a fully independent decode stack from the mpg123/
    libvorbisfile/libav bindings under test)."""
    try:
        import librosa  # noqa: F401
    except ImportError:
        return PENDING, "librosa not installed (pip install librosa)"
    import tempfile

    import numpy as np

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                    "tests"))
    from codec_encoders import write_mp3, write_ogg

    from music2dance_tpu.data.m4a import (avdec_available,
                                          encode_m4a_for_tests, load_m4a)
    from music2dance_tpu.data.mp3 import load_mp3, mp3_available
    from music2dance_tpu.data.oggvorbis import load_ogg, vorbis_available

    rng = np.random.default_rng(0)
    sr = 22050
    x = rng.standard_normal(sr)
    x = (0.5 * x / np.abs(x).max()).astype(np.float32)
    failures, ran = [], []
    with tempfile.TemporaryDirectory() as d:
        for name, avail, writer, loader in (
            ("mp3", mp3_available(), write_mp3, load_mp3),
            ("ogg", vorbis_available(), write_ogg, load_ogg),
            ("m4a", avdec_available(), encode_m4a_for_tests, load_m4a),
        ):
            if not avail:
                continue
            p = os.path.join(d, f"probe.{name}")
            writer(p, x, sr)
            ours, sr_ours = loader(p)
            theirs, sr_lib = librosa.load(p, sr=None, mono=True)
            if sr_ours != sr_lib:
                failures.append(f"{name}: sr {sr_ours} vs librosa {sr_lib}")
                continue
            n = min(len(ours), len(theirs))
            # codec delay conventions differ between decoders; align by
            # cross-correlation before comparing
            c = np.correlate(ours[:8192 + 4096], theirs[:4096], "valid")
            off = int(np.argmax(np.abs(c)))
            a, b = ours[off : off + n - off], theirs[: n - off]
            corr = float(np.dot(a, b) /
                         (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))
            if corr < 0.99:
                failures.append(f"{name}: corr {corr:.4f} < 0.99 vs librosa")
            else:
                ran.append(name)
    if failures:
        return FAIL, "; ".join(failures)
    if not ran:
        return PENDING, "no system codecs available to compare"
    return PASS, f"decode matches librosa.load (corr > 0.99): {', '.join(ran)}"


CHECKS = [
    ("reference-mount", check_reference_mount),
    ("librosa-parity", check_librosa_parity),
    ("audio-constants", check_audio_constants),
    ("joint-layout", check_joint_layout),
    ("architecture", check_architecture),
    ("torch-ckpt-roundtrip", check_torch_ckpt),
    ("codec-decode", check_codec_decode),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None,
                    choices=[n for n, _ in CHECKS])
    ap.add_argument("--reference", default=REFERENCE)
    args = ap.parse_args()

    results = []
    for name, fn in CHECKS:
        if args.only and name != args.only:
            continue
        try:
            status, detail = fn(args.reference)
        except Exception as e:  # noqa: BLE001 — a crashed check is a FAIL
            status, detail = FAIL, f"check crashed: {type(e).__name__}: {e}"
        results.append((name, status, detail))
        print(f"[{status:>7}] {name}: {detail}")

    n_pending = sum(1 for _, s, _ in results if s in (PENDING, MANUAL))
    n_fail = sum(1 for _, s, _ in results if s == FAIL)
    if n_pending == len(results):
        print(f"\nreference absent — {n_pending} checks pending")
    else:
        print(f"\n{len(results) - n_pending - n_fail} passed, {n_fail} failed, "
              f"{n_pending} pending/manual")
    raise SystemExit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
