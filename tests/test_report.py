"""Training-report tests (utils/report.py + report.py CLI)."""

import json
import os

import numpy as np
import pytest

from music2dance_tpu.utils.report import (_smooth, _wants_log, load_metrics,
                                          render_report, summarize)


def _write_run(path, steps=10, eval_every=2):
    rows = []
    for i in range(1, steps + 1):
        s = i * 100
        rows.append({"step": s, "time": float(i), "prefix": "train",
                     "d_loss": 1.0 / i, "g_loss": -float(i),
                     "gp": 10.0 ** (-i), "wasserstein": 0.1 * i,
                     "steps_per_sec": 100.0 + i})
        if i % eval_every == 0:
            rows.append({"step": s, "time": float(i) + 0.5,
                         "prefix": "eval", "eval_fmd": 1000.0 / i ** 3,
                         "eval_wasserstein": -float(i)})
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


class TestLoad:
    def test_merges_prefixes_and_sorts(self, tmp_path):
        p = tmp_path / "metrics.jsonl"
        _write_run(str(p))
        m = load_metrics(str(p))
        assert "d_loss" in m and "eval_fmd" in m
        steps, vals = m["d_loss"]
        assert list(steps) == sorted(steps)
        assert len(steps) == 10
        # eval rows have their own (sparser) step grid
        assert len(m["eval_fmd"][0]) == 5

    def test_directory_resolves_to_metrics_jsonl(self, tmp_path):
        _write_run(str(tmp_path / "metrics.jsonl"))
        assert "gp" in load_metrics(str(tmp_path))

    def test_duplicate_steps_last_write_wins(self, tmp_path):
        p = tmp_path / "metrics.jsonl"
        with open(p, "w") as f:
            f.write(json.dumps({"step": 100, "d_loss": 1.0}) + "\n")
            f.write(json.dumps({"step": 100, "d_loss": 2.0}) + "\n")
        steps, vals = load_metrics(str(p))["d_loss"]
        assert list(steps) == [100] and list(vals) == [2.0]

    def test_non_numeric_fields_skipped(self, tmp_path):
        p = tmp_path / "metrics.jsonl"
        with open(p, "w") as f:
            f.write(json.dumps({"step": 1, "note": "hi", "x": 3.0}) + "\n")
        m = load_metrics(str(p))
        assert "note" not in m and "x" in m


class TestHelpers:
    def test_smooth_debiased_constant_is_identity(self):
        v = np.full(20, 7.0)
        np.testing.assert_allclose(_smooth(v, 0.9), v)

    def test_smooth_zero_weight_identity(self):
        v = np.arange(5.0)
        np.testing.assert_array_equal(_smooth(v, 0.0), v)

    def test_wants_log(self):
        assert _wants_log([np.array([1e-3, 1.0, 10.0])])
        assert not _wants_log([np.array([1.0, 2.0, 3.0])])
        # any non-positive value forbids a log axis
        assert not _wants_log([np.array([-1.0, 1.0, 1e4])])


class TestRender:
    def test_single_run_default_panels(self, tmp_path):
        _write_run(str(tmp_path / "metrics.jsonl"))
        out = str(tmp_path / "r.png")
        drawn = render_report({"run": load_metrics(str(tmp_path))}, out,
                              smooth=0.6, title="t")
        assert os.path.getsize(out) > 10_000
        assert "losses" in drawn and "held-out FMD" in drawn
        # beat alignment has no data in this run -> panel dropped
        assert not any("beat" in d for d in drawn)

    def test_multi_run_one_metric_per_panel(self, tmp_path):
        _write_run(str(tmp_path / "a.jsonl"))
        _write_run(str(tmp_path / "b.jsonl"), steps=6)
        runs = {"a": load_metrics(str(tmp_path / "a.jsonl")),
                "b": load_metrics(str(tmp_path / "b.jsonl"))}
        out = str(tmp_path / "cmp.png")
        drawn = render_report(runs, out)
        assert os.path.getsize(out) > 10_000
        assert "d_loss" in drawn and "g_loss" in drawn  # split panels

    def test_no_known_metrics_raises(self, tmp_path):
        p = tmp_path / "metrics.jsonl"
        with open(p, "w") as f:
            f.write(json.dumps({"step": 1, "zzz": 1.0}) + "\n")
        with pytest.raises(ValueError, match="no known metrics"):
            render_report({"r": load_metrics(str(p))},
                          str(tmp_path / "x.png"))

    def test_explicit_keys(self, tmp_path):
        _write_run(str(tmp_path / "metrics.jsonl"))
        out = str(tmp_path / "k.png")
        drawn = render_report({"r": load_metrics(str(tmp_path))}, out,
                              panels=[("gp", ["gp"]), ("zz", ["zz"])])
        assert drawn == ["gp"]


class TestSummary:
    def test_fmd_min_tracked(self, tmp_path):
        _write_run(str(tmp_path / "metrics.jsonl"))
        s = summarize(load_metrics(str(tmp_path)))
        assert s["eval_fmd"]["min_step"] == 1000  # 1000/i^3 minimal at i=10
        assert s["eval_fmd"]["min"] == pytest.approx(1.0)
        assert s["d_loss"]["last_step"] == 1000


class TestCli:
    def test_cli_end_to_end(self, tmp_path):
        import subprocess
        import sys

        _write_run(str(tmp_path / "metrics.jsonl"))
        out = str(tmp_path / "cli.png")
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        r = subprocess.run(
            [sys.executable, "report.py", "--metrics", str(tmp_path),
             "--out", out, "--smooth", "0.5"],
            capture_output=True, text=True, env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        assert r.returncode == 0, r.stderr[-2000:]
        assert os.path.exists(out)
        assert "panels" in r.stdout


def test_smooth_weight_out_of_domain_raises():
    with pytest.raises(ValueError, match="smooth weight"):
        _smooth(np.arange(5.0), 1.0)
    with pytest.raises(ValueError, match="smooth weight"):
        _smooth(np.arange(5.0), -0.1)
