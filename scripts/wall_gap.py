"""Measure the train-loop wall/device gap from a stamped driver log.

VERDICT r4 #5: the production B=60 run sustained 13.4 ms/step device time
but ~4-6 ms/step extra wall (host log fetches, checkpoint saves, TB writes,
visualize renders). The write-behind IO work (train.py async_host_io: viz /
ckpt / log workers) is supposed to close that to <=2 ms/step. This script
computes both sides from a run log whose lines are wall-stamped:

    python -u -m ... | while IFS= read -r line; do
        echo "$(date +%s.%N | cut -c1-14) $line"; done > stamped.log
    python scripts/wall_gap.py stamped.log

- device ms/step: the run's own `time:` stat (timer.get_elapsed_time() /
  log_every, the in-window average around the dispatch loop);
- wall ms/step: wall-clock spacing of consecutive log lines / steps between
  them, median (steady windows) and mean (includes viz/ckpt cadences).

The mean-vs-device delta IS the answer: everything the step timer excludes
(epoch boundaries, viz cycles, checkpoint packs, log fetches) lands between
log lines.
"""
from __future__ import annotations

import json
import re
import statistics
import sys

LINE = re.compile(r"^(\d+\.\d+) .*step (\d+)/\d+.*time: ([0-9.]+)")


def analyze(path: str, skip_first: int = 5) -> dict:
    rows = []
    for line in open(path):
        m = LINE.match(line)
        if m:
            rows.append((float(m.group(1)), int(m.group(2)),
                         float(m.group(3))))
    if len(rows) <= skip_first + 2:
        raise SystemExit(f"only {len(rows)} stamped step lines in {path}")
    rows = rows[skip_first:]  # drop compile/first-window transients
    gaps = []
    for (t0, s0, _), (t1, s1, _) in zip(rows, rows[1:]):
        if s1 > s0:
            gaps.append((t1 - t0) / (s1 - s0) * 1e3)
    dev = [t * 1e3 for _, _, t in rows]
    out = {
        "log_path": path,
        "windows": len(gaps),
        "steps": rows[-1][1] - rows[0][1],
        "device_ms_per_step_median": round(statistics.median(dev), 3),
        "wall_ms_per_step_median": round(statistics.median(gaps), 3),
        "wall_ms_per_step_mean": round(
            (rows[-1][0] - rows[0][0]) / (rows[-1][1] - rows[0][1]) * 1e3, 3),
        "wall_ms_per_step_p90": round(
            statistics.quantiles(gaps, n=10)[-1], 3),
    }
    out["gap_ms_median"] = round(out["wall_ms_per_step_median"]
                                 - out["device_ms_per_step_median"], 3)
    out["gap_ms_mean"] = round(out["wall_ms_per_step_mean"]
                               - out["device_ms_per_step_median"], 3)
    return out


if __name__ == "__main__":
    print(json.dumps(analyze(sys.argv[1]), indent=1))
