"""Interleaved N vs 4N scaling measurement (the BASELINE.md evidence).

Why interleaved: this sandbox VM's effective CPU throughput drifts
±40% on minute timescales (host contention — see cpu_control.py), so
back-to-back single runs of each level produce garbage efficiencies
(observed 0.25 to 1.65 for the same stage). This harness alternates
local[8] / local[32] workers over several rounds, takes per-stage
MEDIANS of per-materialization walls across rounds, and samples the
pure-CPU control in the same window so the engine's efficiency can be
judged against the box's actual parallel ceiling.

Usage:
    python BENCH/scaling.py --rounds 3 --raw-points 10000000 --k 300000
    (orchestrates spark-submit workers; writes BENCH/results/scaling.json)

Worker (internal):
    spark-submit --master local[N] ... BENCH/scaling.py --worker ...
"""

from __future__ import annotations

import argparse
import json
import shutil
import statistics
import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

STAGES = (
    "extract",
    "raw_to_1m",
    "1m_to_1h",
    "1h_to_1d",
    "codec_encode",
    "codec_decode",
    "minhash_lsh",
    "packing",
)


def worker(args) -> None:
    from pyspark.sql import SparkSession
    import pyspark.sql.functions as F

    spark = (
        SparkSession.builder.appName("tokens_ts-scaling")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    cores = spark.sparkContext.defaultParallelism
    spark.conf.set("spark.sql.shuffle.partitions", str(2 * cores))
    sys.path.insert(0, str(ROOT))
    sys.path.insert(0, str(ROOT / "BENCH"))
    from tokens_ts import codec, extract, synth, tiers
    import gen_raw

    wh = Path(args.warehouse)
    if wh.exists():
        shutil.rmtree(wh)
    wh.mkdir(parents=True)

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    # warmup: codegen + python workers
    wseq = synth.sequences(spark, 2000, 8)
    noop(tiers.rollup(extract.to_raw(extract.full_stats(wseq, stats=["mean"])), "1m"))
    noop(codec.encode_segments(
        extract.to_raw(extract.point(wseq, 7)).where(F.col("value").isNotNull()), "1h"))

    out: dict = {"cores": cores, "stages": {}, "counts": {}}
    only = set(args.only.split(",")) if args.only else set(STAGES)

    # extraction (CPU stage) on the real fixture
    if "extract" in only:
      seq = synth.sequences(spark, args.k, 8)
      ex = extract.to_raw(extract.full_stats(seq, stats=["mean", "max"]))
      noop(ex)  # warm: page cache + codegen (untimed)
      walls = []
      for _ in range(args.reps):
          t0 = time.time()
          noop(ex)
          walls.append(time.time() - t0)
      out["stages"]["extract"] = walls
      out["counts"]["extract"] = ex.count()

    # tier stages on direct raw points (shuffle stage at real volume)
    if "raw_to_1m" in only:
      raw = gen_raw.raw_points(spark, args.raw_points, ppm=args.ppm)
      raw.write.mode("overwrite").parquet(str(wh / "raw"))
      raw_df = spark.read.parquet(str(wh / "raw"))
      out["counts"]["raw_to_1m"] = n_raw = raw_df.count()

      noop(tiers.rollup(raw_df, "1m"))  # warm: page cache + codegen (untimed)
      walls = []
      for _ in range(args.reps):
          t0 = time.time()
          noop(tiers.rollup(raw_df, "1m"))
          walls.append(time.time() - t0)
      out["stages"]["raw_to_1m"] = walls

    # cascade stages on SYNTHETIC tier-state tables at protocol volume
    # (BASELINE.md: walls ≥ 60 s at local[8], or the measurement is
    # stage-overhead, not scaling). Deriving tier rows from raw would
    # need 60× the raw points per level; the merge only sees tier rows,
    # so gen_raw.tier_state builds them directly with a wide key space.
    if "1m_to_1h" in only:
      gen_raw.tier_state(
          spark, args.cascade_points, slots_unit_s=60
      ).write.mode("overwrite").parquet(str(wh / "t1m"))
      t1m = spark.read.parquet(str(wh / "t1m"))
      out["counts"]["1m_to_1h"] = t1m.count()
      noop(tiers.cascade(t1m, "1h"))  # warm: page cache + codegen (untimed)
      walls = []
      for _ in range(args.reps):
          t0 = time.time()
          noop(tiers.cascade(t1m, "1h"))
          walls.append(time.time() - t0)
      out["stages"]["1m_to_1h"] = walls

    if "1h_to_1d" in only:
      gen_raw.tier_state(
          spark, args.cascade1d_points, slots_unit_s=3600
      ).write.mode("overwrite").parquet(str(wh / "t1h"))
      t1h = spark.read.parquet(str(wh / "t1h"))
      out["counts"]["1h_to_1d"] = t1h.count()
      noop(tiers.cascade(t1h, "1d"))  # warm: page cache + codegen (untimed)
      walls = []
      for _ in range(args.reps):
          t0 = time.time()
          noop(tiers.cascade(t1h, "1d"))
          walls.append(time.time() - t0)
      out["stages"]["1h_to_1d"] = walls

    # dedup: minhash signatures + LSH band join on synthetic docs —
    # the JVM-expression-heavy data-ops path (single-pass least-fold
    # over ~98 shingles × 32 perms per doc, then the bucket self-join)
    if "minhash_lsh" in only:
      from tokens_ts import dedup

      gen_raw.synth_docs(spark, args.docs).write.mode("overwrite").parquet(
          str(wh / "docs")
      )
      d = spark.read.parquet(str(wh / "docs"))
      out["counts"]["minhash_lsh"] = d.count()
      noop(dedup.lsh_candidates(d, 32, 8))  # warm (untimed)
      walls = []
      for _ in range(args.reps):
          t0 = time.time()
          noop(dedup.lsh_candidates(d, 32, 8))
          walls.append(time.time() - t0)
      out["stages"]["minhash_lsh"] = walls

    # sequence packing: per-source cumsum window + chunk-span explode +
    # ObjectHashAggregate reassembly — the only plan shape not already
    # covered by the tier/codec/dedup stages
    if "packing" in only:
      from tokens_ts import packing, synth

      synth.sequences(spark, args.pack_docs, 8).write.mode(
          "overwrite"
      ).parquet(str(wh / "seq"))
      seq = spark.read.parquet(str(wh / "seq"))
      out["counts"]["packing"] = seq.agg(F.sum("n_tok")).collect()[0][0]
      noop(packing.pack_tokens(seq, chunk_len=2048))  # warm (untimed)
      walls = []
      for _ in range(args.reps):
          t0 = time.time()
          noop(packing.pack_tokens(seq, chunk_len=2048))
          walls.append(time.time() - t0)
      out["stages"]["packing"] = walls

    # codec encode on its own (smaller) generated raw set so it is
    # measured with full parallelism, not through a Limit funnel
    if not ({"codec_encode", "codec_decode"} & only):
        shutil.rmtree(wh)
        with open(args.out, "a") as f:
            f.write(json.dumps(out) + "\n")
        spark.stop()
        return
    gen_raw.raw_points(spark, args.codec_points).write.mode("overwrite").parquet(
        str(wh / "raw_codec")
    )
    enc_in = spark.read.parquet(str(wh / "raw_codec"))
    out["counts"]["codec_encode"] = enc_in.count()
    noop(codec.encode_segments(enc_in, "1h"))  # warm: page cache + codegen (untimed)
    walls = []
    for _ in range(args.reps):
        t0 = time.time()
        noop(codec.encode_segments(enc_in, "1h"))
        walls.append(time.time() - t0)
    out["stages"]["codec_encode"] = walls

    codec.encode_segments(enc_in, "1h").write.mode("overwrite").parquet(
        str(wh / "segs")
    )
    segs = spark.read.parquet(str(wh / "segs"))
    out["counts"]["codec_decode"] = out["counts"]["codec_encode"]
    noop(codec.decode_segments(segs))  # warm: page cache + codegen (untimed)
    walls = []
    for _ in range(args.reps):
        t0 = time.time()
        noop(codec.decode_segments(segs))
        walls.append(time.time() - t0)
    out["stages"]["codec_decode"] = walls

    shutil.rmtree(wh)
    with open(args.out, "a") as f:
        f.write(json.dumps(out) + "\n")
    spark.stop()


def orchestrate(args) -> None:
    results_dir = ROOT / "BENCH" / "results"
    results_dir.mkdir(exist_ok=True)
    jsonl = Path(args.out or (results_dir / "scaling_runs.jsonl"))
    jsonl.write_text("")
    cpu_samples = []

    def cpu_control():
        r = subprocess.run(
            [sys.executable, str(ROOT / "BENCH" / "cpu_control.py")],
            capture_output=True, text=True, timeout=600,
        )
        cpu_samples.append(json.loads(r.stdout.strip()))

    cpu_control()
    for rnd in range(args.rounds):
        for cores in (args.n, args.n4):
            cmd = [
                "spark-submit", "--master", f"local[{cores}]",
                "--driver-memory", args.driver_mem,
                "--conf", "spark.driver.extraJavaOptions=-XX:+UseParallelGC",
                "--conf", "spark.local.dir=/dev/shm/spark-local",
                "--py-files", str(ROOT / "tokens_ts.zip"),
                str(ROOT / "BENCH" / "scaling.py"), "--worker",
                "--reps", str(args.reps), "--k", str(args.k),
                "--raw-points", str(args.raw_points), "--ppm", str(args.ppm),
                "--cascade-points", str(args.cascade_points),
                "--cascade1d-points", str(args.cascade1d_points),
                "--codec-points", str(args.codec_points),
                "--docs", str(args.docs),
                "--pack-docs", str(args.pack_docs),
                "--only", args.only,
                "--warehouse", f"/tmp/tokens_ts_scaling_{cores}",
                "--out", str(jsonl),
            ]
            print(f"round {rnd} cores {cores} ...", flush=True)
            subprocess.run(cmd, capture_output=True, timeout=3600)
    cpu_control()

    runs = [json.loads(l) for l in jsonl.read_text().splitlines() if l.strip()]
    summary: dict = {"cpu_control": cpu_samples, "levels": {}, "stages": {}}
    for cores in (args.n, args.n4):
        lv = [r for r in runs if r["cores"] == cores]
        stages = {}
        for st in STAGES:
            walls = [w for r in lv for w in r["stages"].get(st, [])]
            cnt = lv[0]["counts"].get(st, 0) if lv else 0
            med = statistics.median(walls) if walls else None
            stages[st] = {
                "median_wall_s": round(med, 3) if med else None,
                "walls": [round(w, 3) for w in walls],
                "points_in": cnt,
                "points_per_s": round(cnt / med, 1) if med else None,
            }
        summary["levels"][str(cores)] = stages
    for st in STAGES:
        a = summary["levels"][str(args.n)][st]["points_per_s"]
        b = summary["levels"][str(args.n4)][st]["points_per_s"]
        if a and b:
            summary["stages"][st] = {
                f"thr_{args.n}": a,
                f"thr_{args.n4}": b,
                "efficiency": round(b / (4 * a), 3),
            }
    ceil = [
        round(s["eff_8_to_32"], 3) for s in cpu_samples if "eff_8_to_32" in s
    ]
    summary["cpu_ceiling_8_to_32"] = ceil
    out_path = results_dir / "scaling.json"
    out_path.write_text(json.dumps(summary, indent=2))
    print(json.dumps(summary["stages"], indent=2))
    print("cpu ceiling samples:", ceil)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--n4", type=int, default=32)
    ap.add_argument("--k", type=int, default=300_000)
    ap.add_argument("--raw-points", type=int, default=10_000_000)
    ap.add_argument("--ppm", type=int, default=10,
                    help="points per (source,series,minute) in gen_raw — "
                         "small ppm → more 1m windows → heavier cascades")
    ap.add_argument("--cascade-points", type=int, default=300_000_000,
                    help="synthetic 1m tier-state rows for the 1m→1h stage — "
                         "sized so cascade walls are ≥60 s at local[8] "
                         "(BASELINE.md protocol threshold)")
    ap.add_argument("--cascade1d-points", type=int, default=800_000_000,
                    help="synthetic 1h tier-state rows for the 1h→1d stage "
                         "(its per-row merge is ~2.5× faster, so it needs "
                         "more rows to clear the same 60 s wall)")
    ap.add_argument("--docs", type=int, default=300_000,
                    help="synthetic documents for the minhash_lsh stage "
                         "(~100 words each; 300k gives the ≥60 s local[8] "
                         "wall the protocol demands — 60k measured only a "
                         "14 s wall, i.e. stage overhead)")
    ap.add_argument("--pack-docs", type=int, default=6_000_000,
                    help="synthetic sequences (k_total) for the packing "
                         "stage — ~1.9B tokens, sized for the ≥60 s "
                         "local[8] wall (calibrated: 300k docs/94M "
                         "tokens pack in 2.9 s @8 = 33M tokens/s)")
    ap.add_argument("--codec-points", type=int, default=100_000_000,
                    help="raw points for the codec stages — the round-3 "
                         "pack fast path pushed 3M-point walls to the "
                         "stage-overhead floor, which measures scheduling, "
                         "not scaling")
    ap.add_argument("--driver-mem", default="20g",
                    help="worker JVM heap — allocation-heavy stages "
                         "(extract's array transforms) need the heap "
                         "sized to thread count × allocation rate")
    ap.add_argument("--only", default="",
                    help="comma list of stages to run (default: all)")
    ap.add_argument("--warehouse", default="/tmp/tokens_ts_scaling")
    ap.add_argument("--out", default="")
    args = ap.parse_args()
    if args.worker:
        worker(args)
    else:
        orchestrate(args)


if __name__ == "__main__":
    main()
