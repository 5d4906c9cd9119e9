"""Backfill / increment orchestration (SURVEY.md §3.2, §4.3-4.4).

run_backfill: sequences → extraction → raw tier → 1m → 1h → 1d, one
partition-pruned distributed job per invocation, resumable at input-
partition granularity via the checkpoint manifest. Rerunning after a
crash reprocesses only pending partitions; completed partitions are
skipped by an anti-join and their tier output is untouched (writes are
idempotent dynamic partition overwrites).

run_increment: append-only micro-batch — recomputes exactly the
(source, day) tier partitions touched by the new rows, reading back
only those slices of raw (partition/row-group pruning does the rest).
This is the batch-incremental realization of "cascading continuous
aggregates" (BASELINE.json:14): 1h merges 1m partials, 1d merges 1h
partials, never re-reading raw beyond the touched windows.

All tables live under a Catalog root:
  sequences                     (input; partitioned by source)
  raw     (source, day)         extraction output points
  t1m/t1h/t1d (source, day)     partial-state tier tables
  _lineage                      checkpoint manifest
"""

from __future__ import annotations

import statistics
import time
from collections.abc import Callable

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from tokens_ts import checkpoint, extract, tiers
from tokens_ts.io.catalog import Catalog

TIER_NAMES = {"1m": "t1m", "1h": "t1h", "1d": "t1d"}


def default_extraction(seq: DataFrame) -> DataFrame:
    """Flagship extraction: full-array mean/max + point p7 per sequence."""
    wide = extract.full_stats(seq, stats=["mean", "max"])
    raw_full = extract.to_raw(wide)
    raw_pt = extract.to_raw(extract.point(seq, 7))
    return raw_full.unionByName(raw_pt)


def _with_day(df: DataFrame, ts_col: str) -> DataFrame:
    return df.withColumn("day", F.to_date(F.col(ts_col)))


def _manifest_points(spark: SparkSession, cat: Catalog) -> list[float]:
    """points_raw of every committed non-batch partition (latest
    attempt) — the lineage feed for the salting baseline. Control-plane
    sized (one value per input partition, the same bound as the
    attempts collect in run_backfill). Collected ONCE per invocation;
    waves fold their own just-measured points in driver-side, so the
    baseline stays current without re-scanning the manifest per wave."""
    return [
        float(r["pts"])
        for r in checkpoint.read_manifest(spark, cat)
        .where(
            (F.col("status") == "done")
            # plain-source ids only: 'batch:'/'retention:' marker rows
            # carry no per-partition ingest volume and would drag the
            # median toward 0
            & (~F.col("partition_id").contains(":"))
        )
        .groupBy("partition_id")
        .agg(F.max_by("points_raw", F.struct("ts", "attempt")).alias("pts"))
        .collect()
        if r["pts"] is not None
    ]


def _auto_hot_keys(
    spark: SparkSession,
    cat: Catalog,
    raw: DataFrame,
    skew_ratio: float = 4.0,
    top_k: int = 4,
    hist_points: list[float] | None = None,
):
    """Skew detection for salt='auto': (source, series_id) keys whose
    row count exceeds skew_ratio × a median-key-load baseline.

    The baseline has two feeds, and the engine takes the smaller:
    - within-wave: median per-key count of the raw slice being rolled
      up (one map-side-combined count agg — the wave is being fully
      aggregated right after anyway);
    - lineage: median points_raw per committed partition in the
      manifest, divided by the wave's series-per-source — FREE (no
      data scan), and it is what catches the wave that consists of
      ONLY a hot source, where the within-wave median is the hot key
      itself and the ratio test would never fire.

    Returns a tiny hot-key DataFrame, or None when nothing is flagged
    (→ plain rollup, no phase-2 merge inflation for anyone).
    """
    counts = raw.groupBy(*tiers.KEYS).agg(F.count("*").alias("cnt"))
    stats = counts.agg(
        F.median("cnt").alias("med"), F.count("*").alias("nkeys")
    ).collect()[0]
    if not stats["nkeys"]:
        return None
    baseline = float(stats["med"])
    if hist_points is None:
        hist_points = _manifest_points(spark, cat)
    hist_med = statistics.median(hist_points) if hist_points else None
    if hist_med is not None:
        nsrc = raw.select("source").distinct().count()
        series_per_source = max(float(stats["nkeys"]) / max(nsrc, 1), 1.0)
        baseline = min(baseline, float(hist_med) / series_per_source)
    hot = (
        counts.where(F.col("cnt") > skew_ratio * baseline)
        .orderBy(F.desc("cnt"), *[F.asc(k) for k in tiers.KEYS])
        .limit(top_k)
        .select(*tiers.KEYS)
    )
    return None if hot.isEmpty() else hot


def run_backfill(
    spark: SparkSession,
    seq: DataFrame,
    out_root: str,
    extraction: Callable[[DataFrame], DataFrame] = default_extraction,
    max_partitions: int | None = None,
    fmt: str = "parquet",
    commit_batch: int = 1,
    salt: str | None = None,
    skew_ratio: float = 4.0,
    _crash_after_commits: int | None = None,
) -> dict:
    """Process pending input partitions end-to-end; returns a summary.

    max_partitions bounds how many pending partitions this invocation
    takes (used by the kill/resume test and by production to shape
    batch size); None = all pending.

    Lineage is PARTITION-granular: partitions are processed in
    `commit_batch`-sized waves and each wave's manifest rows commit as
    the wave completes, with the wave's measured wall_ms (per-partition
    measured at the default commit_batch=1; averaged within a wave
    otherwise). A crash mid-invocation therefore loses at most one
    wave — the rerun's resume anti-join skips everything committed so
    far. At 10^12 scale each input partition is itself a large
    distributed job, so one wave per partition keeps the cluster
    saturated; the sandbox default matches that production shape.

    salt="auto" makes skew handling ENGINE behavior instead of a
    manual operator choice: each wave's rollup consults _auto_hot_keys
    (within-wave key counts + lineage points_raw baseline) and routes
    through tiers.rollup_salted_hot for exactly the flagged keys —
    output bit-identical to the plain path (algebraic state), cold
    keys pay no merge fan-in. Flagged keys are reported in the
    summary's "hot_keys".

    _crash_after_commits is a test hook: abort after that many wave
    commits (before the invocation completes), simulating a mid-run
    failure between manifest commits.
    """
    cat = Catalog(out_root, fmt)
    run_id = checkpoint.new_run_id()

    done = checkpoint.done_partitions(spark, cat)
    pending = (
        seq.select("source").distinct()
        .join(done.withColumnRenamed("partition_id", "source"), "source", "left_anti")
        .orderBy("source")
    )
    part_ids = [r["source"] for r in pending.collect()]
    if max_partitions is not None:
        part_ids = part_ids[:max_partitions]
    if not part_ids:
        return {"run_id": run_id, "partitions": [], "skipped": True}

    attempts = {
        r["partition_id"]: r["attempt"]
        for r in checkpoint.read_manifest(spark, cat)
        .groupBy("partition_id")
        .agg(F.max("attempt").alias("attempt"))
        .collect()
    }

    t_start = time.time()
    n_commits = 0
    done_ids: list[str] = []
    hot_keys_flagged: list[tuple[str, str]] = []
    # lineage baseline for salt="auto": one manifest scan per
    # INVOCATION; each wave folds its own measured points_raw in below,
    # so later waves see earlier waves' commits without re-reading.
    hist_points = _manifest_points(spark, cat) if salt == "auto" else []
    for i in range(0, len(part_ids), max(commit_batch, 1)):
        group = part_ids[i : i + max(commit_batch, 1)]
        t_wave = time.time()
        batch = seq.where(F.col("source").isin(group))

        # lineage input side: row counts + token checksums (invariant carrier)
        lin = {
            r["partition_id"]: dict(r.asDict())
            for r in checkpoint.token_checksum_by_partition(batch).collect()
        }

        # raw rows carry their producing batch id (the backfill run id
        # here; increments use theirs) — the key the upsert dedups on
        raw = _with_day(extraction(batch), "event_ts").withColumn(
            "batch_id", F.lit(run_id)
        )
        cat.overwrite_partitions(raw, "raw", ["source", "day"])

        raw_wave = (
            cat.read(spark, "raw")
            .where(F.col("source").isin(group))
            .drop("day", "batch_id")
        )
        hot = (
            _auto_hot_keys(
                spark, cat, raw_wave, skew_ratio, hist_points=hist_points
            )
            if salt == "auto"
            else None
        )
        if hot is not None:
            hot_keys_flagged.extend(
                (r["source"], r["series_id"]) for r in hot.collect()
            )
        tier_frames = tiers.build_all_tiers(raw_wave, hot_keys=hot)
        for tier, name in TIER_NAMES.items():
            cat.overwrite_partitions(
                _with_day(tier_frames[tier], "window_start"), name, ["source", "day"]
            )

        # per-partition metrics from the written tables (counts are
        # cheap: column-pruned scans over just-written partitions);
        # raw also yields max event time — the watermark carrier
        counts: dict[str, dict[str, int]] = {p: {} for p in group}
        for r in (
            cat.read(spark, "raw")
            .where(F.col("source").isin(group))
            .groupBy("source")
            .agg(
                F.count("*").alias("points_raw"),
                F.max(F.unix_micros("event_ts")).alias("max_event_us"),
            )
            .collect()
        ):
            counts[r["source"]]["points_raw"] = r["points_raw"]
            counts[r["source"]]["max_event_us"] = r["max_event_us"]
        for t, name in TIER_NAMES.items():
            for r in (
                cat.read(spark, name)
                .where(F.col("source").isin(group))
                .groupBy("source").count().collect()
            ):
                counts[r["source"]][f"points_{t}"] = r["count"]

        wave_ms = (time.time() - t_wave) * 1000.0
        rows = [
            {
                "partition_id": p,
                "rows_in": lin.get(p, {}).get("rows_in", 0),
                "token_checksum": lin.get(p, {}).get("token_checksum", 0),
                "wall_ms": wave_ms / len(group),
                **counts[p],
            }
            for p in group
        ]
        checkpoint.record_done(spark, cat, rows, run_id, attempts)
        hist_points.extend(
            float(counts[p].get("points_raw", 0)) for p in group
        )
        done_ids.extend(group)
        n_commits += 1
        if (
            _crash_after_commits is not None
            and n_commits >= _crash_after_commits
            and len(done_ids) < len(part_ids)
        ):
            raise RuntimeError(f"injected crash after {n_commits} commits")

    # per-wave commits write one small manifest file each; a large
    # backfill (thousands of partitions) compacts once at its quiet
    # end so later resume scans stay O(partitions), not O(commits)
    if n_commits >= 64:
        checkpoint.compact_manifest(spark, cat)

    wall_ms = (time.time() - t_start) * 1000.0
    return {
        "run_id": run_id,
        "partitions": done_ids,
        "skipped": False,
        "wall_ms": wall_ms,
        "hot_keys": hot_keys_flagged,
    }


def _batch_id_and_count(new_seq: DataFrame) -> tuple[str, int]:
    """Deterministic batch id from the batch's own content (an xor-fold
    of xxhash64(doc_id, tokens) plus the row count — a replayed batch
    maps to the same id, the basis for exactly-once), together with the
    row count so callers never rescan the input just for rows_in."""
    r = new_seq.agg(
        F.bit_xor(F.xxhash64("doc_id", "tokens")).alias("cs"),
        F.count("*").alias("n"),
    ).collect()[0]
    return f"{(r['cs'] or 0) & ((1 << 64) - 1):016x}-{r['n']}", int(r["n"])


RAW_MERGE_KEYS = ["source", "day", "batch_id", "series_id", "event_ts"]


def _upsert_raw(spark, cat: Catalog, new_raw: DataFrame, sel, bid: str) -> None:
    """Fold one batch's raw rows into the raw table, format-dispatched.

    Iceberg (existing table): Catalog.merge_upsert — MERGE INTO keyed
    on RAW_MERGE_KEYS. Extraction is deterministic, so a retry of a
    partially-applied batch produces the identical row set: matched
    rows update in place, missing rows insert, and the result is
    exactly the single-shot state. batch_id in the key makes
    concurrent folds of different batches non-conflicting.

    Parquet, or first write on either format: (existing rows in the
    touched partitions minus this batch's) ∪ (this batch's rows),
    written with dynamic partition overwrite — same convergence,
    single-writer only.
    """
    if cat.fmt == "iceberg" and cat.exists(spark, "raw"):
        cat.merge_upsert(new_raw, "raw", RAW_MERGE_KEYS)
        return
    upsert = new_raw
    if cat.exists(spark, "raw"):
        existing = cat.read(spark, "raw")
        if "batch_id" not in existing.columns:  # pre-increment warehouse
            existing = existing.withColumn("batch_id", F.lit(None).cast("string"))
        keep = (
            existing.where(sel)
            .where(F.col("batch_id").isNull() | (F.col("batch_id") != bid))
            # snapshot before the overwrite below replaces these files
            .localCheckpoint(eager=True)
        )
        upsert = keep.unionByName(new_raw.select(keep.columns))
    cat.overwrite_partitions(upsert, "raw", ["source", "day"])


def run_increment(
    spark: SparkSession,
    new_seq: DataFrame,
    out_root: str,
    extraction: Callable[[DataFrame], DataFrame] = default_extraction,
    fmt: str = "parquet",
    batch_id: str | None = None,
    salt: str | None = None,
    skew_ratio: float = 4.0,
    _crash_after_raw: bool = False,
) -> dict:
    """Fold an append-only batch of new sequences into raw + all tiers,
    recomputing only the touched (source, day) tier partitions.

    Retry-idempotent (exactly-once per batch):
    - each batch carries a `batch_id` (caller-supplied — e.g. the
      streaming epoch id — or derived from the batch's content hash);
    - a manifest row `batch:<id>` marks completion; rerunning a
      completed batch is a no-op;
    - raw rows are tagged with their batch_id, and the touched raw
      state is upserted so a crash anywhere between the raw write and
      the manifest commit leaves a rerun that converges to the exact
      single-shot state, never double-counting.

    The raw upsert is format-dispatched (_upsert_raw):
    - iceberg: MERGE INTO keyed on (source, day, batch_id, series_id,
      event_ts) — one snapshot-isolated commit; concurrent writers
      folding different batches never match each other's rows, so
      this branch is concurrent-writer-safe;
    - parquet (sandbox): read-filter-union + dynamic partition
      overwrite (the read pinned with localCheckpoint before the
      overwrite replaces its files) — converging and retry-idempotent,
      but it assumes a single writer per (source, day) partition set
      (the scheduler's job on the sandbox format).

    _crash_after_raw is a test hook: abort after the raw write,
    before any tier write or manifest commit, simulating a mid-flight
    failure."""
    cat = Catalog(out_root, fmt)
    if batch_id is None:
        bid, n_in = _batch_id_and_count(new_seq)
    else:
        bid, n_in = batch_id, -1  # counted lazily below only if needed
    marker = f"batch:{bid}"

    # one-bit server-side probe, not a full done-set collect — the
    # manifest grows one row per epoch forever; see checkpoint.is_done
    if checkpoint.is_done(spark, cat, marker):
        return {"touched": [], "batch_id": bid, "skipped": True}

    new_raw = _with_day(extraction(new_seq), "event_ts").withColumn(
        "batch_id", F.lit(bid)
    )
    new_raw.cache()
    touched = [
        (r["source"], r["day"])
        for r in new_raw.select("source", "day").distinct().collect()
    ]
    if not touched:
        new_raw.unpersist()
        return {"touched": [], "batch_id": bid}
    srcs = sorted({s for s, _ in touched})
    days = sorted({d for _, d in touched})
    sel = F.col("source").isin(srcs) & F.col("day").isin([str(d) for d in days])

    _upsert_raw(spark, cat, new_raw, sel, bid)
    if _crash_after_raw:
        new_raw.unpersist()
        raise RuntimeError("injected crash after raw write")

    raw_touched = cat.read(spark, "raw").where(sel).drop("day", "batch_id")
    # salt="auto": same engine-level skew routing as run_backfill —
    # the touched-window recompute is itself a rollup over possibly
    # skewed keys (a hot source's whole day re-aggregates per batch)
    hot = (
        _auto_hot_keys(spark, cat, raw_touched, skew_ratio)
        if salt == "auto"
        else None
    )
    t = tiers.build_all_tiers(raw_touched, hot_keys=hot)
    for tier, name in TIER_NAMES.items():
        upd = _with_day(t[tier], "window_start").where(sel)
        cat.overwrite_partitions(upd, name, ["source", "day"])
    if n_in < 0:
        n_in = new_seq.count()
    # the batch's max event time rides IN the completion row: the fold
    # commit and the watermark advance are one atomic manifest append
    wm = new_raw.agg(F.max(F.unix_micros("event_ts")).alias("m")).collect()[0]["m"]
    checkpoint.record_done(
        spark,
        cat,
        [{"partition_id": marker, "rows_in": n_in, "max_event_us": wm}],
        checkpoint.new_run_id(),
    )
    new_raw.unpersist()
    return {"touched": touched, "batch_id": bid}


def run_token_tier_increment(
    spark: SparkSession,
    new_seq: DataFrame,
    out_root: str,
    fmt: str = "parquet",
    batch_id: str | None = None,
    trunc: str = "hour",
    by: str = "source",
) -> dict:
    """Incrementally maintain the MATERIALIZED token-histogram tier
    (textops.token_histogram) — the corpus-sized explode+count behind
    every distribution monitor — one append-only batch at a time.

    Counts are additive, but naive add-to-existing double-counts on
    replay. Instead the tier stores PER-BATCH partial states
    partitioned by (group, day, batch_id): folding a batch writes
    exactly its own partitions (dynamic partition overwrite), so a
    crashed/retried batch CONVERGES instead of double-counting —
    idempotence comes from partition identity, with a manifest marker
    (`tok:<batch_id>`) as the fast replay gate, the same exactly-once
    contract as run_increment. Readers re-sum across batch_id
    (read_token_tier), which costs nothing extra: every monitor
    aggregates the tier anyway. A compaction that merges old batches
    into one keeps partition counts bounded (same append-then-delete
    shape as checkpoint.compact_manifest).

    Requires new_seq to carry event_ts (grid.with_event_time)."""
    from tokens_ts import textops

    cat = Catalog(out_root, fmt)
    if batch_id is None:
        batch_id, _ = _batch_id_and_count(new_seq)
    marker = f"tok:{batch_id}"
    if checkpoint.is_done(spark, cat, marker):
        return {"batch_id": batch_id, "skipped": True}

    hist = (
        textops.token_histogram(new_seq, by=by, trunc=trunc)
        .withColumn("day", F.to_date(F.timestamp_seconds(F.col("ep"))))
        .withColumn("batch_id", F.lit(batch_id))
    )
    cat.overwrite_partitions(hist, "tok_hist", [by, "day", "batch_id"])
    checkpoint.record_done(
        spark,
        cat,
        [{"partition_id": marker, "rows_in": -1}],
        job_run_id=f"tok-{batch_id}",
    )
    return {"batch_id": batch_id, "skipped": False}


def read_token_tier(
    spark: SparkSession, out_root: str, fmt: str = "parquet", by: str = "source"
) -> DataFrame:
    """The monitor-facing view of the materialized token tier: re-sum
    the per-batch partial states to (group, ep, t, c) — directly
    consumable via the monitors' `counts=` parameter."""
    cat = Catalog(out_root, fmt)
    return (
        cat.read(spark, "tok_hist")
        .groupBy(by, "ep", "t")
        .agg(F.sum("c").alias("c"))
    )


def read_token_tier_asof(
    spark: SparkSession,
    out_root: str,
    fmt: str = "parquet",
    by: str = "source",
    asof_ts: float | None = None,
) -> DataFrame:
    """Snapshot read of the token tier: re-sum ONLY batches whose
    `tok:<batch_id>` manifest marker is committed (and, with
    `asof_ts`, committed at manifest time ≤ asof_ts) — the
    Iceberg-snapshot rule re-expressed on the parquet fallback: the
    MANIFEST defines table state, data files never do. Two things the
    plain read cannot give:

    - **orphan invisibility**: a crash between the partition write
      and the marker append leaves data files with no manifest row;
      this read excludes them, so a half-committed batch can never
      leak into a monitor (the replayed batch then converges by
      partition identity as usual);
    - **time travel**: `asof_ts` pins the tier to any past manifest
      state — the audit/debug read ("what did the distribution
      monitor see before batch X landed?").

    The committed-batch set is manifest-sized (control plane), so the
    filter is a broadcast semi-join; the re-sum is the same bounded
    agg as read_token_tier."""
    cat = Catalog(out_root, fmt)
    m = checkpoint.read_manifest(spark, cat).where(
        (F.col("status") == "done")
        & F.col("partition_id").startswith("tok:")
    )
    if asof_ts is not None:
        m = m.where(F.col("ts") <= F.lit(float(asof_ts)))
    committed = m.select(
        F.expr("substring(partition_id, 5)").alias("batch_id")
    ).distinct()
    return (
        cat.read(spark, "tok_hist")
        .join(F.broadcast(committed), "batch_id", "left_semi")
        .groupBy(by, "ep", "t")
        .agg(F.sum("c").alias("c"))
    )


def read_token_tier_changes(
    spark: SparkSession,
    out_root: str,
    since_ts: float,
    until_ts: float | None = None,
    fmt: str = "parquet",
    by: str = "source",
) -> DataFrame:
    """Incremental consumption between two manifest states: the token
    tier DELTA contributed by batches committed in (since_ts, until_ts]
    — Iceberg's incremental snapshot scan re-expressed on the parquet
    fallback. Because the tier stores additive PER-BATCH partial
    states, the delta between two snapshots IS the re-sum over the
    batch subset: a downstream consumer folds it into its own state
    without rescanning the tier, and
    tier(asof=until) == tier(asof=since) ⊕ changes(since, until]
    holds exactly (pinned by pytest). Uncommitted orphans are invisible
    here for the same reason they are in read_token_tier_asof: the
    manifest defines table state, data files never do. Same broadcast
    semi-join + bounded re-sum shape as the snapshot read."""
    cat = Catalog(out_root, fmt)
    m = checkpoint.read_manifest(spark, cat).where(
        (F.col("status") == "done")
        & F.col("partition_id").startswith("tok:")
        & (F.col("ts") > F.lit(float(since_ts)))
    )
    if until_ts is not None:
        m = m.where(F.col("ts") <= F.lit(float(until_ts)))
    committed = m.select(
        F.expr("substring(partition_id, 5)").alias("batch_id")
    ).distinct()
    return (
        cat.read(spark, "tok_hist")
        .join(F.broadcast(committed), "batch_id", "left_semi")
        .groupBy(by, "ep", "t")
        .agg(F.sum("c").alias("c"))
    )


def forget_series(
    spark: SparkSession,
    out_root: str,
    series_ids: list[str],
    source: str | None = None,
    fmt: str = "parquet",
) -> dict:
    """Right-to-be-forgotten across the WHOLE store: one row-level
    DELETE per existing table (raw + every tier), each through
    Catalog.delete_where's crash-safe copy-on-write rewrite, then ONE
    manifest lineage row recording the enforcement.

    Works at every level without recomputation because each tier keys
    on (source, series_id, window): deleting a series' rows from a
    rollup IS re-rolling the filtered raw — the pytest pins the
    store-wide identity forget(store, s) == backfill(input − s),
    table by table. Scale: each table pays one pushed-down scan to
    find touched partitions (pruned to `source` when given) plus
    rewrites of only partitions containing the series; untouched
    partitions stay byte-identical. The lineage row makes the
    enforcement auditable and idempotently re-runnable (a rerun finds
    zero matching rows and reports 0)."""
    import hashlib

    cat = Catalog(out_root, fmt)
    quoted = ", ".join(
        "'" + s.replace("'", "''") + "'" for s in sorted(series_ids)
    )
    pred = f"series_id IN ({quoted})"
    if source is not None:
        pred += f" AND source = '{source}'"
    tables: dict[str, list] = {}
    total = 0
    for name in ("raw", *TIER_NAMES.values()):
        if not cat.exists(spark, name):
            continue
        rep = cat.delete_where(
            spark, name, pred, partition_cols=["source", "day"]
        )
        tables[name] = rep
        total += sum(x["rows_deleted"] for x in rep)
    marker = "forget:" + hashlib.md5(pred.encode()).hexdigest()[:12]
    checkpoint.record_done(
        spark,
        cat,
        [{"partition_id": marker, "rows_in": total}],
        job_run_id=checkpoint.new_run_id(),
    )
    return {
        "predicate": pred,
        "marker": marker,
        "rows_deleted": total,
        "tables": tables,
    }
