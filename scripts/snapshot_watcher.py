"""Archive per-prior eval/sample_quality JSONs as a measurement queue
overwrites them (gmm_followup.sh writes eval.json / sample_quality.json
once per prior variant into the same paths). Device-free; safe next to a
live TPU job.

Usage: python scripts/snapshot_watcher.py RUN [seconds]
Watches results/iwae_eval/eval.json and results/RUN/sample_quality.json;
on every content change, copies to results/RUN/eval_<prior>.json /
results/RUN/sample_quality_<prior>.json (first-level JSONs are
git-tracked durable evidence)."""

from __future__ import annotations

import json
import shutil
import sys
import time
from pathlib import Path


def main() -> None:
    run = sys.argv[1] if len(sys.argv) > 1 else "cifar_400k"
    duration = float(sys.argv[2]) if len(sys.argv) > 2 else 4 * 3600
    run_dir = Path("results") / run
    watches = {
        Path("results/iwae_eval/eval.json"): ("eval", run_dir),
        run_dir / "eval.json": ("eval", run_dir),
        run_dir / "sample_quality.json": ("sample_quality", run_dir),
    }
    seen: dict[Path, bytes] = {}
    t0 = time.time()
    while time.time() - t0 < duration:
        for path, (kind, dest_dir) in watches.items():
            if not path.exists():
                continue
            try:
                raw = path.read_bytes()
            except OSError:
                continue
            if seen.get(path) == raw:
                continue
            try:
                prior = json.loads(raw).get("prior", "model")
            except json.JSONDecodeError:
                continue            # mid-write; retry next tick
            seen[path] = raw
            dest_dir.mkdir(parents=True, exist_ok=True)
            dest = dest_dir / f"{kind}_{prior}.json"
            shutil.copyfile(path, dest)
            print(f"[{time.strftime('%H:%M:%S')}] {path} -> {dest}",
                  flush=True)
        time.sleep(10)


if __name__ == "__main__":
    main()
