"""Training-run report: metrics JSONL -> small-multiple curve figure.

The training loop's observability is a JSONL stream (utils/logging.py,
SURVEY.md §2 C10); this turns one or several runs' streams into a single
readable PNG/SVG — loss curves, Wasserstein estimate, gradient penalty,
throughput, and whichever eval_ metrics the run produced — so comparing
runs stops being JSONL archaeology. CLI: ``report.py``.

Chart rules (deliberate, not taste): small multiples with ONE value axis
per panel (never dual-axis); at most a few series per panel with a fixed
categorical color order (colors follow the run/metric, never its rank);
a log scale only where the data spans decades (FMD starts ~1e4 and ends
~1e-1); recessive grid; neutral-ink text. The palette below passes the
colorblind-separation/contrast checks (validated externally with a
CVD-simulation tool against the #fcfcfb surface).
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

# categorical palette in fixed assignment order + neutral inks
PALETTE = ["#2a78d6", "#eb6834", "#1baf7a", "#eda100",
           "#e87ba4", "#008300", "#4a3aa7", "#e34948"]
SURFACE = "#fcfcfb"
INK = "#0b0b0b"
INK_2 = "#52514e"
GRID = "#e7e6e3"

# default panel layout: (title, [metric keys]) — missing keys are
# dropped, empty panels skipped. In multi-run mode multi-key panels are
# split so a panel is one metric x N runs.
DEFAULT_PANELS: List[Tuple[str, List[str]]] = [
    ("losses", ["d_loss", "g_loss"]),
    ("wasserstein estimate", ["wasserstein"]),
    ("gradient penalty", ["gp"]),
    ("train throughput (steps/s)", ["steps_per_sec"]),
    ("held-out FMD", ["eval_fmd"]),
    ("beat alignment (vs real)", ["eval_beat_alignment",
                                  "eval_real_beat_alignment"]),
    ("held-out wasserstein", ["eval_wasserstein"]),
]


def load_metrics(path: str) -> Dict[str, Tuple[np.ndarray, np.ndarray]]:
    """JSONL file (or a directory containing metrics.jsonl) ->
    {metric: (steps, values)}, rows merged across prefixes, sorted and
    de-duplicated by step (last write wins — a resumed run re-logs its
    restart window)."""
    if os.path.isdir(path):
        path = os.path.join(path, "metrics.jsonl")
    series: Dict[str, Dict[int, float]] = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            row = json.loads(line)
            step = int(row.get("step", -1))
            for k, v in row.items():
                if k in ("step", "time", "prefix"):
                    continue
                if isinstance(v, (int, float)):
                    series.setdefault(k, {})[step] = float(v)
    out = {}
    for k, by_step in series.items():
        steps = np.asarray(sorted(by_step), np.int64)
        vals = np.asarray([by_step[s] for s in steps], np.float64)
        out[k] = (steps, vals)
    return out


def _smooth(vals: np.ndarray, weight: float) -> np.ndarray:
    """Debiased EMA smoothing (TensorBoard's convention)."""
    if not 0.0 <= weight < 1.0:
        raise ValueError(f"smooth weight must be in [0, 1), got {weight}")
    if weight <= 0.0 or len(vals) < 2:
        return vals
    out = np.empty_like(vals)
    acc, norm = 0.0, 0.0
    for i, v in enumerate(vals):
        acc = weight * acc + (1.0 - weight) * v
        norm = weight * norm + (1.0 - weight)
        out[i] = acc / norm
    return out


def _wants_log(vals_list: Sequence[np.ndarray]) -> bool:
    lo, hi = np.inf, 0.0
    for v in vals_list:
        pos = v[v > 0]
        if len(pos):
            lo = min(lo, float(pos.min()))
            hi = max(hi, float(pos.max()))
    return hi > 0 and lo < np.inf and hi / max(lo, 1e-30) > 100.0 and all(
        (v > 0).all() for v in vals_list if len(v))


def render_report(
    runs: Dict[str, Dict[str, Tuple[np.ndarray, np.ndarray]]],
    out_path: str,
    panels: Optional[List[Tuple[str, List[str]]]] = None,
    smooth: float = 0.0,
    title: Optional[str] = None,
) -> List[str]:
    """Render ``{run_label: load_metrics(...)}`` to ``out_path``.

    Returns the panel titles actually drawn. Single run: a panel may
    hold up to a few metrics (legend names them). Multiple runs: one
    metric per panel, one color per RUN (identity = run, stable across
    panels).
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    panels = list(panels if panels is not None else DEFAULT_PANELS)
    multi = len(runs) > 1
    if multi:
        panels = [(key, [key]) for _, keys in panels for key in keys]

    # keep only panels with data in at least one run
    def has(key):
        return any(key in m for m in runs.values())

    drawn = [(t, [k for k in keys if has(k)]) for t, keys in panels]
    drawn = [(t, keys) for t, keys in drawn if keys]
    if not drawn:
        raise ValueError("no known metrics found in the given run(s)")

    ncol = 2 if len(drawn) > 1 else 1
    nrow = -(-len(drawn) // ncol)
    fig, axes = plt.subplots(
        nrow, ncol, figsize=(6.4 * ncol, 3.1 * nrow), squeeze=False)
    fig.patch.set_facecolor(SURFACE)
    run_labels = list(runs)

    for ax_i, (ptitle, keys) in enumerate(drawn):
        ax = axes[ax_i // ncol][ax_i % ncol]
        ax.set_facecolor(SURFACE)
        series_vals = []
        n_series = 0
        for r_i, label in enumerate(run_labels):
            metrics = runs[label]
            for k_i, key in enumerate(keys):
                if key not in metrics:
                    continue
                steps, vals = metrics[key]
                color = PALETTE[(r_i if multi else k_i) % len(PALETTE)]
                name = label if multi else key
                sm = _smooth(vals, smooth)
                if smooth > 0.0 and len(vals) > 1:
                    ax.plot(steps, vals, color=color, lw=0.9, alpha=0.25)
                ax.plot(steps, sm, color=color, lw=1.8, label=name)
                series_vals.append(vals)
                n_series += 1
        if _wants_log(series_vals):
            ax.set_yscale("log")
        if n_series > 1:
            ax.legend(frameon=False, fontsize=8, labelcolor=INK_2)
        ax.set_title(ptitle, fontsize=10, color=INK, loc="left")
        ax.grid(True, color=GRID, lw=0.7)
        ax.tick_params(colors=INK_2, labelsize=8)
        for s in ax.spines.values():
            s.set_visible(False)
        ax.set_xlabel("step", fontsize=8, color=INK_2)
    for ax_i in range(len(drawn), nrow * ncol):
        axes[ax_i // ncol][ax_i % ncol].set_visible(False)
    if title:
        fig.suptitle(title, fontsize=12, color=INK, x=0.01, ha="left")
    fig.tight_layout(rect=(0, 0, 1, 0.96) if title else None)
    fig.savefig(out_path, dpi=150, facecolor=SURFACE)
    plt.close(fig)
    return [t for t, _ in drawn]


def summarize(metrics: Dict[str, Tuple[np.ndarray, np.ndarray]]) -> dict:
    """Final/extreme values per metric — the text companion to the plot."""
    out = {}
    for k, (steps, vals) in sorted(metrics.items()):
        entry = {"last_step": int(steps[-1]), "last": float(vals[-1])}
        if k == "eval_fmd":
            i = int(np.argmin(vals))
            entry["min"] = float(vals[i])
            entry["min_step"] = int(steps[i])
        out[k] = entry
    return out
