"""Summarize a run's D/G equilibrium trajectory from metrics.jsonl.

Prints, for each named run: mean d_loss / d_acc / g_adv over the FIRST and
LAST 10% of logged rows, plus the fraction of rows with d_loss at the
label-smoothing floor (within eps of the run's minimum). This is the
evidence format for the round-4 D-saturation arm table (VERDICT r3 item 3:
"d_loss off the 0.650 smoothing floor, g_adv alive").

Usage: python scripts/d_trajectory.py RUN [RUN ...]
Device-free (reads results/<run>/metrics.jsonl only) — safe next to a live
TPU job.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path


def summarize(run: str, results_dir: str = "results") -> dict | None:
    path = Path(results_dir) / run / "metrics.jsonl"
    if not path.exists():
        print(f"{run}: no metrics.jsonl", file=sys.stderr)
        return None
    rows = [json.loads(line) for line in path.open() if line.strip()]
    rows = [r for r in rows if "d_loss" in r]
    if not rows:
        print(f"{run}: no adversarial metrics", file=sys.stderr)
        return None
    n = max(1, len(rows) // 10)

    def window(sel, key):
        vals = [r[key] for r in sel if key in r]
        return sum(vals) / len(vals) if vals else float("nan")

    floor = min(r["d_loss"] for r in rows)
    at_floor = sum(1 for r in rows if r["d_loss"] <= floor + 1e-3) / len(rows)
    out = {"run": run, "rows": len(rows), "d_loss_min": round(floor, 4),
           "frac_rows_at_floor": round(at_floor, 3)}
    for key in ("d_loss", "d_acc", "g_adv"):
        out[f"{key}_first10pct"] = round(window(rows[:n], key), 4)
        out[f"{key}_last10pct"] = round(window(rows[-n:], key), 4)
    return out


def main() -> None:
    runs = sys.argv[1:] or ["cifar_advprior_resnet"]
    for run in runs:
        s = summarize(run)
        if s:
            print(json.dumps(s))


if __name__ == "__main__":
    main()
