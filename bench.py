"""Driver bench contract: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": ...}

Headline set = the north-rule pipeline stages (extraction → 1m → 1h →
1d rollups, quantiles, gap-fill, as-of join, codec round-trip) over
the sf events table, plus the synthetic-sequences backfill at a scale
proportional to the sf data, plus the training-data ops (ANN top-k,
MinHash-LSH dedup). Every query is fully materialized through a noop
sink so Catalyst can't prune the work away.
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
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    from pyspark.sql import SparkSession
    import pyspark.sql.functions as F

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("tokens_ts-bench")
        .config("spark.sql.shuffle.partitions", str(int(cpus) * 2))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "20g")
        # G1 anti-scales at 32 threads for allocation-heavy array
        # transforms (measured: extract 7.6s@8 → 11.6s@32 with G1,
        # 7.3s → 6.1s with ParallelGC; BENCH/BASELINE.md)
        .config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from tokens_ts import codec, dedup, extract, gapfill, simsearch, synth, tiers
    from tokens_ts.queries_driver import QUERIES
    import tokens_ts.queries_data  # noqa: F401

    # the sf events file is a single row group → repartition so every
    # downstream stage starts from all cores, as a real partitioned
    # table scan would
    ev_raw = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.lit("events").alias("source"),
        F.col("event_type").alias("series_id"),
        F.col("ts").alias("event_ts"),
        F.col("value"),
    ).repartition(int(cpus) * 2)
    ev_raw.cache().count()

    # warm: codegen + Python UDF worker pool (one-time ~15 s otherwise
    # lands in whichever query touches Arrow first). The warmup input is
    # spread over all partitions — a limit() alone coalesces to one
    # partition and warms a single Python worker, leaving the other ~31
    # to spawn (numpy import and all) inside the first timed Arrow stage.
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

    # warm the JVM hash-aggregate/codegen path untimed too: the first
    # timed rollup otherwise pays one-time JIT+codegen (r4 driver bench
    # read 2.68 s for rollup_1m vs 1.06 s clean-window on identical
    # code). sample() keeps all partitions live, unlike limit().
    _materialize(tiers.rollup(ev_raw.sample(0.05, seed=7), "1m"))

    timings: dict[str, float] = {}
    bench_t0 = time.time()
    BUDGET_S = 420.0  # stop adding repeats near the driver's timeout

    def bench(name, thunk):
        """min-of-≤3 repeats: this VM shows 3-5× run-to-run wall-clock
        variance (BENCH/BASELINE.md protocol); the minimum estimates
        uncontended steady-state throughput, which is the quantity that
        scales to a real cluster. Repeats stop once the total budget is
        spent so the bench always finishes."""
        best = None
        for _ in range(3):
            t0 = time.time()
            thunk()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
            if time.time() - bench_t0 > BUDGET_S:
                break
        timings[name] = round(best, 3)

    # tier pipeline on events
    t1m = tiers.rollup(ev_raw, "1m")
    bench("rollup_1m", lambda: _materialize(t1m))
    t1m_c = t1m.cache()
    t1m_c.count()
    bench("cascade_1h_1d", lambda: _materialize(
        tiers.finish(tiers.cascade(tiers.cascade(t1m_c, "1h"), "1d"))
    ))
    bench("quantiles_1h", lambda: _materialize(
        tiers.exact_quantiles(ev_raw, "1h", percentiles=(0.5, 0.95))
    ))
    # the flagged-approximate web-scale twin: mergeable GK sketches —
    # at 10^12 rows this is the only affordable percentile, and the
    # bench shows it is not slower than exact even at sandbox volume
    bench("quantiles_approx_1h", lambda: _materialize(
        tiers.approx_quantiles(ev_raw, "1h", percentiles=(0.5, 0.95))
    ))
    bench("salted_rollup_1d", lambda: _materialize(
        tiers.rollup_salted(ev_raw, "1d", nsalt=16)
    ))

    # gap-fill + as-of
    bench("gapfill", lambda: _materialize(QUERIES["ts_gapfill_interp"](spark, sf_dir)))
    bench("asof_join", lambda: _materialize(QUERIES["ts_asof_click_purchase"](spark, sf_dir)))

    # round-5b analytics: time-weighted average (lead pass + bucket
    # agg) and level-shift detection (two bounded ROWS frames)
    from tokens_ts import analytics

    bench("twa_1h", lambda: _materialize(
        analytics.time_weighted_avg(ev_raw, ["series_id"], interval="1 hour")
    ))
    bench("level_shift", lambda: _materialize(
        analytics.with_level_shift(ev_raw, ["series_id"], width=16)
    ))

    # codec: encode → parquet sink (the real shape: compressed segments
    # land in a table), decode ← that table; timed separately
    import tempfile

    seg_path = tempfile.mkdtemp(prefix="bench_segs_") + "/segments"
    bench("codec_encode", lambda: (
        codec.encode_segments(ev_raw.where(F.col("value").isNotNull()), "1d")
        .write.mode("overwrite").parquet(seg_path)
    ))
    segs = spark.read.parquet(seg_path)
    bench("codec_decode", lambda: _materialize(codec.decode_segments(segs)))

    # synthetic backfill scaled with sf (sf0.1 → src00 budget 60k ≈ 157k rows)
    k = max(2000, int(600_000 * sf))
    seq = synth.sequences(spark, k, 8)
    raw = extract.to_raw(extract.full_stats(seq, stats=["mean", "max"]))
    bench("synth_backfill_t1m", lambda: _materialize(tiers.rollup(raw, "1m")))

    # training-data ops (single-file tables → repartition, as a real
    # partitioned table scan would start from all cores)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").repartition(
        int(cpus) * 2
    )
    emb.cache().count()
    bench("ann_topk", lambda: _materialize(
        simsearch.cosine_topk(emb, query_ids=[0, 1, 2, 3, 4], k=5)
    ))
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        int(cpus) * 2
    )
    docs.cache().count()
    bench("minhash_lsh", lambda: _materialize(
        dedup.lsh_candidates(docs, n_perm=32, bands=8)
    ))
    bench("simhash_pairs", lambda: _materialize(
        dedup.simhash_candidates(docs)
    ))
    # round-4 operators: real merge-table BPE (Arrow stage with
    # distinct-chunk memoization) and concat-and-chunk packing (global
    # offsets without a global window)
    from tokens_ts import packing, textops

    bench("bpe_encode", lambda: _materialize(textops.with_bpe_encode(docs)))
    # round-5c token-corpus stats: vocab-bounded rank window (zipf)
    # and row-local bigram stream + broadcast count frames (pmi)
    bench("zipf_slope", lambda: _materialize(
        textops.zipf_slope(seq, by="source")
    ))
    bench("bigram_pmi", lambda: _materialize(
        textops.bigram_pmi_topk(seq, min_count=2)
    ))
    # round-5c time×tokens fusion: hour-over-hour histogram JSD (one
    # explode+count shuffle, vocab×buckets-bounded joins) and
    # gap-correct ACF (bucket agg + bounded self-equi-join)
    from tokens_ts import analytics, grid

    bench("jsd_drift", lambda: _materialize(
        textops.dist_drift(grid.with_event_time(seq), trunc="hour")
    ))
    bench("acf", lambda: _materialize(
        analytics.acf(ev_raw, keys=["series_id"], trunc="minute", max_lag=5)
    ))
    bench("packing_tokens", lambda: _materialize(
        packing.pack_tokens(seq, chunk_len=2048)
    ))
    bench("token_pack", lambda: _materialize(
        codec.decode_token_blobs(codec.encode_token_blobs(seq))
    ))
    # round-5d: CUSUM via the prefix-min reflection identity (two
    # cumulative window passes, zero Python) and static-anchor LTTB
    # decimation of the hourly tier (bucket-parallel)
    bench("cusum", lambda: _materialize(
        analytics.cusum(ev_raw, keys=["series_id"])
    ))
    hourly = (
        ev_raw.where(F.col("value").isNotNull())
        .groupBy("series_id", F.date_trunc("hour", "event_ts").alias("wts"))
        .agg(F.avg("value").alias("v"))
    )
    bench("lttb", lambda: _materialize(tiers.downsample_lttb(
        hourly, n_out=64, keys=["series_id"], ts_col="wts", value_col="v"
    )))
    # token-histogram tier serving: build the ONE corpus-sized
    # explode+count ONCE, then run all four distribution monitors
    # from the materialized tier — the 100-TB read-path shape
    # (the drift/turnover joins over the tier are measured by the
    # jsd_drift row — at the synthetic 131k vocab the tier is nearly
    # corpus-sized, which a real BPE vocab is not; see BENCH/BASELINE)
    tok_tier = textops.token_histogram(grid.with_event_time(seq)).cache()
    tok_tier.count()
    bench("token_tier_monitors", lambda: [
        _materialize(textops.token_burst(None, counts=tok_tier)),
        _materialize(textops.decay_topk(None, counts=tok_tier)),
    ])

    # round-5e: lexical retrieval (row-local tf, no vocab shuffle),
    # winnowing fingerprints (pure row-local array exprs), and two
    # shape-aware series monitors (Arrow DP / ordinal-pattern counts)
    bench("bm25", lambda: _materialize(
        textops.bm25_topk(docs, ["fast", "merge", "query"], k=10)
    ))
    bench("winnowing", lambda: _materialize(
        dedup.winnowing_fingerprints(docs)
    ))
    bench("dtw_daily", lambda: _materialize(
        analytics.dtw_daily(ev_raw, keys=["series_id"], ts_col="event_ts")
    ))
    bench("perm_entropy", lambda: _materialize(
        analytics.permutation_entropy(
            ev_raw, keys=["series_id"], ts_col="event_ts"
        )
    ))

    # round-5g: gain-adaptive Kalman recursion (Arrow per-series
    # stage), per-day Kendall tau-b (calendar-bounded pair self-join),
    # TextRank keywords (3 vocab-bounded PageRank rounds), and the
    # n-gram uniqueness curve (the heaviest new shuffle: one 4x-token
    # explode + map-side-combined count)
    bench("kalman", lambda: _materialize(
        analytics.kalman_level(ev_raw, keys=["series_id"], trunc="minute")
    ))
    bench("kendall", lambda: _materialize(
        analytics.kendall_matrix(ev_raw, keys=["series_id"], trunc="hour")
    ))
    bench("textrank", lambda: _materialize(
        textops.textrank_keywords(docs, top_k=10)
    ))
    # the heaviest new row by design: a ~4x-token explode through a
    # mostly-unique-key agg (xxhash64 gram keys measured NO faster —
    # explode-volume-bound; BENCH/BASELINE.md). Wave-bounded at scale.
    bench("ngram_uniq", lambda: _materialize(
        textops.ngram_uniqueness(seq, max_n=4)
    ))
    # round-5h/5i: per-sequence token planners (row-local, the map-only
    # denoising/chunking prep over the 60k-seq / ~8M-token corpus) and
    # the broadcast-codebook PQ assignment over the cached embeddings
    bench("span_corruption", lambda: _materialize(
        textops.span_corruption_plan(seq)
    ))
    bench("cdc_chunks", lambda: _materialize(textops.cdc_chunks(seq)))
    bench("pq_error", lambda: _materialize(simsearch.pq_error(emb)))
    # round-5j: the stateful Arrow rate-limiter replay over the raw
    # events (one user-key shuffle into an int64 loop), the FIM PSM
    # planner (row-local folds+slices over the 60k-seq corpus), and
    # the curriculum scheduler (per-(rung,source) windows + broadcast
    # prefix-sum offsets — the no-global-sort global order)
    ev_full = spark.read.parquet(f"{sf_dir}/events.parquet").repartition(
        int(cpus) * 2
    )
    bench("token_bucket", lambda: _materialize(
        analytics.token_bucket(ev_full, keys=["user_id"], ts_col="ts")
    ))
    bench("fim_plan", lambda: _materialize(textops.fim_plan(seq)))
    bench("curriculum", lambda: _materialize(packing.curriculum(seq)))

    # round-5 close: Bloom membership (map-only build + broadcast
    # probe), Pareto skyline (distinct-x-bounded frames, no dominance
    # self-join), fixed-point PageRank (type-bounded frames after one
    # edge count), and the JSONL dead-letter scan (one text pass,
    # JVM from_json; file written once untimed — ingest benches the
    # READ path)
    from tokens_ts import sketch
    from tokens_ts.io.jsonl import jsonl_scan

    bench("bloom_fpr", lambda: _materialize(
        sketch.bloom_probe(
            sketch.bloom_build(docs, "text", ["source"]),
            docs.select("source", F.col("text").alias("item")),
            "item",
            ["source"],
        )
    ))
    hourly_n = ev_raw.groupBy(
        "series_id", F.date_trunc("hour", "event_ts").alias("h")
    ).agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum((F.col("value") * 1000).cast("bigint")).alias("s"),
    )
    bench("pareto", lambda: _materialize(
        analytics.pareto_front(hourly_n, ["series_id"], "n", "s")
    ))
    edges = analytics.markov_transitions(ev_full).select(
        F.col("from_type").alias("src"),
        F.col("to_type").alias("dst"),
        "n",
    )
    bench("pagerank", lambda: _materialize(
        analytics.pagerank_fixed(edges, iters=3)
    ))
    jl = tempfile.mkdtemp(prefix="bench_jsonl_") + "/ev.jsonl"
    ev_full.select(F.to_json(F.struct("event_id", "user_id", "event_type", "value")).alias("v")).write.mode("overwrite").text(jl)

    def _jsonl_case():
        good, dead = jsonl_scan(
            spark, jl,
            "event_id bigint, user_id bigint, event_type string, value double",
            required=["event_id"],
        )
        _materialize(good.groupBy("event_type").agg(F.count("*"), F.sum("value")))
        _materialize(dead)

    bench("jsonl_scan", _jsonl_case)

    # histogram tier build+merge+served quantiles (one corpus agg,
    # bounded frames after) and DSIR importance weights (one corpus
    # bigram explode, broadcast bucket dims)
    bench("hist_quantile", lambda: _materialize(
        tiers.histogram_quantile(
            tiers.histogram_merge(tiers.histogram_tier(ev_raw, "1h"), ["series_id"])
        )
    ))
    bench("dsir", lambda: _materialize(
        textops.dsir_weights(docs, F.col("lang") == "en")
    ))

    # data-quality gate: 4 row rules fused into ONE scan + 2 keyed
    # uniqueness aggs — the acceptance pass every ingest wave pays
    from tokens_ts import dq

    ev_day = ev_full.withColumn("day", F.to_date("ts").cast("string"))
    bench("dq_audit", lambda: _materialize(
        dq.audit(
            ev_day,
            [
                dq.not_null("value"),
                dq.in_set("event_type", ["view", "click", "purchase", "signup"]),
                dq.in_range("value", 0.0, 50.0),
                dq.matches("props", "^\\{"),
            ],
            {"event_id": ["event_id"],
             "user_day_type": ["user_id", "day", "event_type"]},
        )
    ))

    # schema-evolution read: mixed-generation mergeSchema scan +
    # target projection with defaults (files written once, untimed —
    # the READ is the recurring cost)
    from tokens_ts.io.catalog import Catalog as _Cat

    evo_root = tempfile.mkdtemp(prefix="bench_evo_")
    ev_full.where(F.col("event_id") % 3 == 0).select(
        "event_id", "user_id", "value"
    ).write.mode("overwrite").parquet(evo_root + "/t")
    ev_full.where(F.col("event_id") % 3 != 0).select(
        "event_id", "user_id", "event_type", "value",
        (F.col("event_id") % 5).cast("int").alias("quality"),
    ).write.mode("append").parquet(evo_root + "/t")

    def _evo_case():
        df = _Cat(evo_root).read_evolved(
            spark, "t",
            "event_id bigint, event_type string, value double, quality int",
            defaults={"event_type": "unknown", "quality": 0},
        )
        _materialize(df.groupBy("event_type").agg(
            F.count("*").alias("n"), F.sum("value").alias("s"),
            F.sum("quality").alias("q"),
        ))

    bench("evolved_scan", _evo_case)

    # round-5 close additions: the blocked-rank family (bucket agg +
    # block-local rank windows), the closed-form pairwise-cosine agg,
    # and the broadcast kNN ranking — three distinct plan shapes
    bench("rank_tests", lambda: [
        _materialize(analytics.friedman_dayparts(
            ev_raw, ["series_id"], ts_col="event_ts")),
        _materialize(analytics.brown_forsythe_dow(
            ev_raw, ["series_id"], ts_col="event_ts")),
    ])
    bench("isotropy", lambda: _materialize(simsearch.isotropy(emb)))
    bench("knn_hubness", lambda: _materialize(simsearch.hubness(emb)))

    # r5m additions — three genuinely new plan shapes: node-iterator
    # triangle counting (edge-edge join + semi-join closure on the
    # capped pair graph), the bucket-exploded attribution join (fanout
    # exactly 2 + per-conversion windows), and the survival pair
    # (lead-window waits -> bounded histograms -> reverse-cumsum risk
    # sets; logrank rides the same construction per type pair)
    bench("dup_triangles", lambda: _materialize(
        dedup.dup_graph_census(dedup.lsh_candidates(docs, 32, 8))
    ))
    bench("attribution", lambda: _materialize(
        analytics.attribution_linear(ev_full)
    ))
    bench("survival", lambda: [
        _materialize(analytics.kaplan_meier(ev_full)),
        _materialize(analytics.logrank_pairs(ev_full)),
    ])

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "tokens_ts headline pipeline wall time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
