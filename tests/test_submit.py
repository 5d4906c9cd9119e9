"""REAL spark-submit --py-files launch of tools/run_job.py — the
north-rule deployment shape exercised end-to-end: backfill (resumable)
→ increment (exactly-once) → retention → report, each a separate
spark-submit process importing the engine ONLY from tokens_ts.zip."""

import json
import shutil
import subprocess
import sys
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parent.parent


def _spark_submit():
    exe = shutil.which("spark-submit")
    if exe:
        return [exe]
    # pip-installed pyspark ships the launcher script
    import pyspark

    cand = Path(pyspark.__file__).parent / "bin" / "spark-submit"
    if cand.exists():
        return [str(cand)]
    pytest.skip("spark-submit not available")


def _run(zip_path, args):
    cmd = _spark_submit() + [
        "--master", "local[4]",
        "--conf", "spark.sql.shuffle.partitions=4",
        "--conf", "spark.sql.session.timeZone=UTC",
        "--conf", "spark.ui.enabled=false",
        "--py-files", str(zip_path),
        str(ROOT / "tools" / "run_job.py"),
    ] + args
    r = subprocess.run(
        cmd, capture_output=True, text=True, timeout=600, cwd="/tmp"
    )
    lines = [l for l in r.stdout.strip().splitlines() if l.startswith("{")]
    assert lines, f"no JSON line\nstdout: {r.stdout[-2000:]}\nstderr: {r.stderr[-2000:]}"
    return json.loads(lines[-1])


def test_spark_submit_pipeline_end_to_end(spark, tmp_path):
    # build the py-files artifact fresh (what a deploy would ship)
    subprocess.run(
        [sys.executable, str(ROOT / "tools" / "make_pyfiles.py")],
        check=True, capture_output=True,
    )
    zip_path = ROOT / "tokens_ts.zip"

    # input fixture written with the suite's SHARED session fixture.
    # Deliberately NOT builder.getOrCreate()+stop(): getOrCreate
    # returns the already-active shared session, so stop() here used
    # to kill Spark for every module sorted after this one
    # (test_synth/test_tiers failed with _jsc=None in full-suite runs
    # while passing standalone).
    from tokens_ts import synth

    seq_path = str(tmp_path / "sequences")
    synth.sequences(spark, 120, 3).write.mode("overwrite").parquet(seq_path)

    out = str(tmp_path / "wh")

    # 1. partial backfill (2 of 3 partitions), then resume
    r1 = _run(zip_path, [
        "backfill", "--sequences", seq_path, "--out", out,
        "--max-partitions", "2",
    ])
    assert len(r1["result"]["partitions"]) == 2
    r2 = _run(zip_path, ["backfill", "--sequences", seq_path, "--out", out])
    assert len(r2["result"]["partitions"]) == 1  # only the remainder
    r3 = _run(zip_path, ["backfill", "--sequences", seq_path, "--out", out])
    assert r3["result"]["skipped"] is True  # nothing pending

    # 2. exactly-once increment: same batch id twice → second skips
    r4 = _run(zip_path, [
        "increment", "--new", seq_path, "--out", out, "--batch-id", "e1",
    ])
    assert r4["result"]["batch_id"] == "e1" and r4["result"]["touched"]
    r5 = _run(zip_path, [
        "increment", "--new", seq_path, "--out", out, "--batch-id", "e1",
    ])
    assert r5["result"].get("skipped") is True

    # 3. retention with keep-everything policy: tables intact, audit row
    r6 = _run(zip_path, [
        "retention", "--out", out,
        "--policy", "raw=365days",
        "--now", "2026-01-02 00:00:00",
    ])
    assert r6["result"] == {"raw": 0}

    # 4. report over the submitted warehouse
    r7 = _run(zip_path, ["report", "--out", out])
    assert set(r7["result"]["views"]) >= {"raw", "t1m", "t1h", "t1d", "lineage"}
    tiers = {t["tier"]: t for t in r7["result"]["tiers"]}
    assert tiers["t1m"]["n_windows"] > 0
    assert r7["result"]["lineage_rows"] > 0
