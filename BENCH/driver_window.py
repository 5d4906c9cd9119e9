"""Clean-window bench protocol as a committed, reusable script.

Verdict-r4 item 10: every round's BENCH_rN should carry in-window host
ceilings instead of reconstructing them post-hoc. This runs the exact
r4 procedure (BENCH/BASELINE.md:3-27): 3 bench.py reps at sf0.1 /
local[32], INTERLEAVED with cpu_control ceiling probes before, between
and after, then writes one summary JSON with:

  - per-query min-of-reps (the steady-state estimate the bench's own
    min-of-3 approximates, now across whole-process reps too),
  - per-query spread (max/min across reps — the host-noise indicator),
  - the in-window eff_8_to_32 ceilings bracketing each rep.

Usage: python BENCH/driver_window.py [out.json]
Appends raw lines to BENCH/results/bench_window_<ts-less tag>.jsonl
style file given by --raw, default alongside the summary.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
BENCH = ROOT / "BENCH"

REPS = 3


def ceiling() -> dict:
    r = subprocess.run(
        [sys.executable, str(BENCH / "cpu_control.py")],
        capture_output=True,
        text=True,
        timeout=600,
    )
    return json.loads(r.stdout.strip().splitlines()[-1])


def bench_once() -> dict:
    env = dict(os.environ)
    env.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    env.setdefault("SPARK_GRAFT_CPUS", "32")
    r = subprocess.run(
        [sys.executable, str(ROOT / "bench.py")],
        capture_output=True,
        text=True,
        timeout=900,
        env=env,
        cwd=str(ROOT),
    )
    lines = [l for l in r.stdout.strip().splitlines() if l.startswith("{")]
    return json.loads(lines[-1])


def main():
    out_path = Path(
        sys.argv[1]
        if len(sys.argv) > 1
        else BENCH / "results" / "driver_window_latest.json"
    )
    raw_path = out_path.with_suffix(".jsonl")
    raw_path.write_text("")  # fresh window

    def emit(tag, data):
        with raw_path.open("a") as f:
            f.write(json.dumps({"tag": tag, "ts": time.time(), "data": data}) + "\n")

    ceilings, reps = [], []
    c = ceiling()
    ceilings.append(c)
    emit("cpu_control", c)
    for i in range(REPS):
        b = bench_once()
        reps.append(b)
        emit("bench", b)
        c = ceiling()
        ceilings.append(c)
        emit("cpu_control", c)

    queries = sorted({q for b in reps for q in b["queries"]})
    per_q = {
        q: [b["queries"][q] for b in reps if q in b["queries"]] for q in queries
    }
    summary = {
        "reps": REPS,
        "sf": reps[0].get("sf"),
        "min_of_reps": {q: min(v) for q, v in per_q.items()},
        "spread": {
            q: round(max(v) / min(v), 2) if min(v) > 0 else None
            for q, v in per_q.items()
        },
        "total_min": round(sum(min(v) for v in per_q.values()), 3),
        "ceilings_eff_8_to_32": [c.get("eff_8_to_32") for c in ceilings],
        "rep_totals": [b["value"] for b in reps],
    }
    out_path.write_text(json.dumps(summary, indent=1))
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
