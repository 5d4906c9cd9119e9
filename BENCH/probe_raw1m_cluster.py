"""Orchestrator: raw->1m under separate executor JVMs vs one big JVM.

Verdict-r4 item 1. Generates the 300 M-point raw table on tmpfs once,
then runs, INTERLEAVED over 2 rounds with in-window CPU ceilings:

    local[8]                    — the N-cores reference
    local[32]                   — one shared 32-thread JVM (r4 bimodal)
    local-cluster[4,8,8192]     — 4 separate 8-core 8 GiB executor JVMs
                                  (the real-cluster shape at equal cores)

Writes BENCH/results/probe_raw1m_cluster_r5.json with every leg's
walls plus derived throughputs/efficiencies.
"""

import json
import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
BENCH = ROOT / "BENCH"
sys.path.insert(0, str(ROOT))

DATA = "/dev/shm/raw300m"
N = 300_000_000

LEGS = [
    ("local[8]", 8),
    ("local[32]", 32),
    ("local-cluster[4,8,8192]", 32),
]


def gen_data():
    if Path(DATA).exists():
        return
    from pyspark.sql import SparkSession

    sys.path.insert(0, str(BENCH))
    from gen_raw import raw_points

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "20g")
        .getOrCreate()
    )
    raw_points(spark, N).write.mode("overwrite").parquet(DATA)
    spark.stop()


def ceiling():
    r = subprocess.run(
        [sys.executable, str(BENCH / "cpu_control.py")],
        capture_output=True,
        text=True,
        timeout=600,
    )
    return json.loads(r.stdout.strip().splitlines()[-1])


def leg(master, cores):
    r = subprocess.run(
        [
            sys.executable,
            str(BENCH / "probe_raw1m_worker.py"),
            master,
            DATA,
            str(cores),
        ],
        capture_output=True,
        text=True,
        timeout=1800,
    )
    line = [l for l in r.stdout.strip().splitlines() if l.startswith("{")]
    if not line:
        return {"master": master, "error": r.stderr[-2000:]}
    return json.loads(line[-1])


def main():
    gen_data()
    out = {"n_points": N, "ceilings": [], "legs": []}
    out["ceilings"].append(ceiling())
    for rnd in range(2):
        for master, cores in LEGS:
            res = leg(master, cores)
            res["round"] = rnd
            out["legs"].append(res)
            print(json.dumps(res), flush=True)
        out["ceilings"].append(ceiling())

    # derive: min-wall throughput per master + efficiencies vs local[8]
    best = {}
    for l in out["legs"]:
        if "agg" in l:
            best[l["master"]] = min(
                min(l["agg"]), best.get(l["master"], float("inf"))
            )
    thr = {m: round(N / w / 1e6, 1) for m, w in best.items()}
    out["min_wall_s"] = best
    out["throughput_mpts_s"] = thr
    if "local[8]" in thr:
        for m in thr:
            if m != "local[8]":
                out[f"eff_8_to_{m}"] = round(thr[m] / (4 * thr["local[8]"]), 3)
    path = BENCH / "results" / "probe_raw1m_cluster_r5.json"
    path.write_text(json.dumps(out, indent=1))
    print(json.dumps({k: v for k, v in out.items() if k != "legs"}))


if __name__ == "__main__":
    main()
