"""Round-6 optimization harness (guide §1): time individual bench
queries in isolation through the noop sink, with job labels and
.explain("formatted") capture. bench.py stays frozen — this file only
cites numbers in OPTIMIZATION_r06.md.

Usage:
    python bench_extra.py q1 q2 ...        # time named queries (3 reps)
    python bench_extra.py --explain q1     # also dump plans to plans/r06/
    python bench_extra.py --list
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))


def _materialize(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    do_explain = "--explain" in sys.argv
    suffix = "_after" if "--after" in sys.argv else "_before"
    reps = 3
    for a in sys.argv[1:]:
        if a.startswith("--reps="):
            reps = int(a.split("=", 1)[1])

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    from pyspark.sql import SparkSession
    import pyspark.sql.functions as F

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("tokens_ts-bench-extra")
        .config("spark.sql.shuffle.partitions", str(int(cpus) * 2))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "20g")
        .config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from tokens_ts import (  # noqa: F401
        analytics, codec, dedup, extract, gapfill, grid, packing,
        simsearch, sketch, synth, textops, tiers,
    )
    from tokens_ts.queries_driver import QUERIES
    import tokens_ts.queries_data  # noqa: F401

    ev_raw = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.lit("events").alias("source"),
        F.col("event_type").alias("series_id"),
        F.col("ts").alias("event_ts"),
        F.col("value"),
    ).repartition(int(cpus) * 2)
    ev_raw.cache().count()

    # same warmups as bench.py so numbers are comparable
    _materialize(
        codec.decode_segments(
            codec.encode_segments(
                ev_raw.where(F.col("value").isNotNull())
                .limit(20000)
                .repartition(int(cpus) * 2),
                "1d",
            )
        )
    )
    _materialize(tiers.rollup(ev_raw.sample(0.05, seed=7), "1m"))

    k = max(2000, int(600_000 * sf))
    seq = synth.sequences(spark, k, 8)

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").repartition(int(cpus) * 2)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(int(cpus) * 2)
    ev_full = spark.read.parquet(f"{sf_dir}/events.parquet").repartition(int(cpus) * 2)

    def emb_c():
        emb.cache().count()
        return emb

    def docs_c():
        docs.cache().count()
        return docs

    hourly = (
        ev_raw.where(F.col("value").isNotNull())
        .groupBy("series_id", F.date_trunc("hour", "event_ts").alias("wts"))
        .agg(F.avg("value").alias("v"))
    )
    hourly_n = ev_raw.groupBy(
        "series_id", F.date_trunc("hour", "event_ts").alias("h")
    ).agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum((F.col("value") * 1000).cast("bigint")).alias("s"),
    )

    CASES = {
        "rollup_1m": lambda: tiers.rollup(ev_raw, "1m"),
        "quantiles_1h": lambda: tiers.exact_quantiles(ev_raw, "1h", percentiles=(0.5, 0.95)),
        "quantiles_approx_1h": lambda: tiers.approx_quantiles(ev_raw, "1h", percentiles=(0.5, 0.95)),
        "salted_rollup_1d": lambda: tiers.rollup_salted(ev_raw, "1d", nsalt=16),
        "gapfill": lambda: QUERIES["ts_gapfill_interp"](spark, sf_dir),
        "asof_join": lambda: QUERIES["ts_asof_click_purchase"](spark, sf_dir),
        "twa_1h": lambda: analytics.time_weighted_avg(ev_raw, ["series_id"], interval="1 hour"),
        "level_shift": lambda: analytics.with_level_shift(ev_raw, ["series_id"], width=16),
        "synth_backfill_t1m": lambda: tiers.rollup(
            extract.to_raw(extract.full_stats(seq, stats=["mean", "max"])), "1m"),
        "ann_topk": lambda: simsearch.cosine_topk(emb_c(), query_ids=[0, 1, 2, 3, 4], k=5),
        "minhash_lsh": lambda: dedup.lsh_candidates(docs_c(), n_perm=32, bands=8),
        "simhash_pairs": lambda: dedup.simhash_candidates(docs_c()),
        "bpe_encode": lambda: textops.with_bpe_encode(docs_c()),
        "zipf_slope": lambda: textops.zipf_slope(seq, by="source"),
        "bigram_pmi": lambda: textops.bigram_pmi_topk(seq, min_count=2),
        "jsd_drift": lambda: textops.dist_drift(grid.with_event_time(seq), trunc="hour"),
        "acf": lambda: analytics.acf(ev_raw, keys=["series_id"], trunc="minute", max_lag=5),
        "packing_tokens": lambda: packing.pack_tokens(seq, chunk_len=2048),
        "token_pack": lambda: codec.decode_token_blobs(codec.encode_token_blobs(seq)),
        "cusum": lambda: analytics.cusum(ev_raw, keys=["series_id"]),
        "lttb": lambda: tiers.downsample_lttb(
            hourly, n_out=64, keys=["series_id"], ts_col="wts", value_col="v"),
        "bm25": lambda: textops.bm25_topk(docs_c(), ["fast", "merge", "query"], k=10),
        "winnowing": lambda: dedup.winnowing_fingerprints(docs_c()),
        "dtw_daily": lambda: analytics.dtw_daily(ev_raw, keys=["series_id"], ts_col="event_ts"),
        "perm_entropy": lambda: analytics.permutation_entropy(
            ev_raw, keys=["series_id"], ts_col="event_ts"),
        "kalman": lambda: analytics.kalman_level(ev_raw, keys=["series_id"], trunc="minute"),
        "kendall": lambda: analytics.kendall_matrix(ev_raw, keys=["series_id"], trunc="hour"),
        "textrank": lambda: textops.textrank_keywords(docs_c(), top_k=10),
        "ngram_uniq": lambda: textops.ngram_uniqueness(seq, max_n=4),
        "span_corruption": lambda: textops.span_corruption_plan(seq),
        "cdc_chunks": lambda: textops.cdc_chunks(seq),
        "pq_error": lambda: simsearch.pq_error(emb_c()),
        "token_bucket": lambda: analytics.token_bucket(ev_full, keys=["user_id"], ts_col="ts"),
        "fim_plan": lambda: textops.fim_plan(seq),
        "curriculum": lambda: packing.curriculum(seq),
        "pareto": lambda: analytics.pareto_front(hourly_n, ["series_id"], "n", "s"),
        "dsir": lambda: textops.dsir_weights(docs_c(), F.col("lang") == "en"),
        "hist_quantile": lambda: tiers.histogram_quantile(
            tiers.histogram_merge(tiers.histogram_tier(ev_raw, "1h"), ["series_id"])),
        "isotropy": lambda: simsearch.isotropy(emb_c()),
        "knn_hubness": lambda: simsearch.hubness(emb_c()),
        "dup_triangles": lambda: dedup.dup_graph_census(
            dedup.lsh_candidates(docs_c(), 32, 8)),
        "attribution": lambda: analytics.attribution_linear(ev_full),
        "kaplan_meier": lambda: analytics.kaplan_meier(ev_full),
        "logrank_pairs": lambda: analytics.logrank_pairs(ev_full),
        "pagerank": lambda: analytics.pagerank_fixed(
            analytics.markov_transitions(ev_full).select(
                F.col("from_type").alias("src"),
                F.col("to_type").alias("dst"), "n"), iters=3),
        "codec_encode_noop": lambda: codec.encode_segments(
            ev_raw.where(F.col("value").isNotNull()), "1d"),
        "token_tier_burst": lambda: textops.token_burst(
            None, counts=textops.token_histogram(grid.with_event_time(seq))),
        "token_tier_decay": lambda: textops.decay_topk(
            None, counts=textops.token_histogram(grid.with_event_time(seq))),
        "token_histogram": lambda: textops.token_histogram(grid.with_event_time(seq)),
        "token_encode_only": lambda: codec.encode_token_blobs(seq),
        "seq_gen": lambda: seq,
        "seq_gen_ts": lambda: grid.with_event_time(seq),
    }

    if "--list" in sys.argv:
        print(" ".join(CASES))
        return

    names = args or list(CASES)
    out = {}
    plans_dir = Path(__file__).resolve().parent / "plans" / "r06"
    plans_dir.mkdir(parents=True, exist_ok=True)
    for name in names:
        if name not in CASES:
            print(f"!! unknown case {name}", file=sys.stderr)
            continue
        thunk = CASES[name]
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        times = []
        for i in range(reps):
            t0 = time.time()
            _materialize(thunk())
            times.append(round(time.time() - t0, 3))
        out[name] = times
        if do_explain:
            df = thunk()
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            (plans_dir / f"{name}{suffix}.txt").write_text(txt)
        spark.sparkContext.setJobDescription(None)
        print(json.dumps({name: times}), flush=True)

    print("TOTALS " + json.dumps({k: min(v) for k, v in out.items()}))
    spark.stop()


if __name__ == "__main__":
    main()
