"""Benchmark harness (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...,
   "cdc": {"events": N, "sec": t, "events_per_sec": r}}

Each query executes to completion through the noop sink (full computation,
no driver-side result materialization), timed individually. The "cdc" block
measures the replication kernel itself — events/sec through
apply_cdc_batch including the keyed-store merge write, the number to set
against the reference's one-HBase-RPC-per-row apply loop.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# The 24-query set shared with BENCH_r01 (the de-facto baseline): the
# compact stdout line reports exactly these so every round's driver record
# stays directly comparable to r1's 24.74 s total.
BASELINE24 = [
    "flagship_shipping_priority", "agg_pricing_summary", "agg_rollup",
    "agg_count_distinct", "agg_percentiles", "join_broadcast_dim",
    "join_left_outer_histogram", "join_asof", "join_skew_salted",
    "window_row_number_topn", "cdc_last_image_per_key", "sort_topk",
    "dedup_exact", "dedup_minhash_lsh", "similarity_topk_cosine",
    "similarity_ann_ivf", "multimodal_decode_stats",
    "multimodal_frame_sample", "text_fingerprint", "text_token_count",
    "events_tumbling_window", "events_session_window",
    "udtf_apply_in_pandas_gaps", "pipeline_training_prep",
]

HEADLINE = [
    "flagship_shipping_priority",
    "agg_pricing_summary",
    "agg_rollup",
    "agg_count_distinct",
    "join_broadcast_dim",
    "join_left_outer_histogram",
    "join_asof",
    "window_row_number_topn",
    "cdc_last_image_per_key",
    "sort_topk",
    "dedup_exact",
    "dedup_minhash_lsh",
    "similarity_topk_cosine",
    "similarity_ann_ivf",
    "multimodal_decode_stats",
    "multimodal_frame_sample",
    "text_fingerprint",
    "text_token_count",
    "events_tumbling_window",
    "events_session_window",
    "join_skew_salted",
    "udtf_apply_in_pandas_gaps",
    "agg_percentiles",
    "pipeline_training_prep",
    "pack_sequences",
    "corpus_bigram_top",
    "corpus_repeated_ngrams",
    "similarity_range_search",
    "text_repetition_stats",
    # r4: heavy non-headline operators added for regression visibility
    "dedup_connected_components",
    "text_tfidf_top_terms",
    "dedup_simhash_pairs",
    "similarity_ann_ivf_pq",
    "agg_median_exact",
    "text_hashing_vectorizer",
    # r4 additions
    "events_sessionize_ids",
    "window_count_distinct_rolling",
    "corpus_lang_cap",
    "text_tfidf_cosine_pairs",
    "agg_mode",
    "events_anomaly_zscore",
    # r5: the re-keyed RANGE window + the 5 most expensive previously
    # never-benched queries (measured once at sf0.1 to pick them)
    "window_range_numeric",
    "dedup_embedding_cosine",
    "dedup_survivors_best_quality",
    "dedup_ngram_jaccard",
    "dedup_survivors",
    "udaf_pandas_median",
    # r5 rank-family re-keys + the tolerance as-of, for regression
    # visibility on the stitched-rank kernel
    "window_ntile_percent",
    "window_cume_dist_first_last",
    "window_rank_dense",
    "join_asof_tolerance",
    # r5: the uncapped production dedup composition (LSH -> verify -> CC)
    "dedup_survivors_lsh",
    # r5 continuation: chunk-level dedup (heaviest new query), the bucketed
    # interval join, the shared-shuffle TWA, and the heaviest SQL classic
    "corpus_chunk_dedup",
    "join_interval_overlap",
    "events_time_weighted_avg",
    "sql_large_volume_orders",
    # r5 continuation: corpus-LM scoring join and the MinHash sketch audit
    # (the two heaviest new kernels)
    "text_bigram_coherence",
    "dedup_minhash_estimate_quality",
    # r5 continuation: the composed curation pipeline (chunk-dedup +
    # novelty gates in one plan)
    "pipeline_curation_v2",
    # r6 (verdict #6): every registered family now has bench representation.
    # The whole cdc_* oracle family (previously only last-image was benched):
    "cdc_apply_upsert_delete",
    "cdc_checkpoint_high_watermark",
    "cdc_projection_rename_cast",
    "cdc_replay_idempotence",
    "cdc_rotate_checkpoint",
    "cdc_rowkey_encode",
    "cdc_scd2_history",
    "cdc_snapshot_diff",
    # join family gaps (nearest as-of; build-preserving outer; binned range)
    "join_asof_nearest",
    "join_full_outer",
    "join_range_binned",
    # events family gaps named in the verdict + the r6 layout-pruned query
    "events_dau_wau",
    "events_weekday_hour_profile",
    "events_user_retention",
    "events_pruned_week_error_rate",
    # agg / corpus gaps named in the verdict
    "agg_share_of_parent",
    "agg_pivot",
    "corpus_source_overlap",
    "corpus_vocab_growth",
    "corpus_decontaminate",
    # families with ZERO bench rows until r6:
    "scalar_regexp_funcs",      # scalar_* (regex is its most expensive rep)
    "scalar_json_funcs",        # scalar_* JSON path
    "setop_except_all",         # setop_*
    "sample_stratified",        # sampling
    "split_train_valid",        # split
    "sql_nation_pair_volume",   # flagged 3.26x at the second 10x step
    "sql_subquery_exists",      # subquery family (SQL front-end form)
    "subquery_above_customer_avg",  # subquery family (DataFrame form)
    "embedding_kmeans_clusters",
    "udf_pandas_scalar_slug",   # scalar pandas UDF rep
    # r7: the pair-free prefix-sum twin of window_range_numeric (verdict #6),
    # the Misra-Gries sketch-then-verify heavy hitters, and the LSM read
    # invariant query
    "window_range_numeric_sweep",
    "corpus_heavy_hitters",
    "cdc_lsm_merge_on_read",
    # r10: the co-located-layout join (one-time bucketed write + exchange-
    # free SMJ — the number to quote against the shuffled twin), the
    # widest SQL join chain (Q8 shape), and the rank-selection p95
    "join_bucketed_colocated",
    "sql_national_market_share",
    "events_hourly_p95_exact",
    # r10 continuation: Q12 completes the TPC-H classics (fact-fact join
    # with a cross-table date-arith residual under a dual CASE count)
    "sql_shipmode_priority",
    # r11: the signature-agreement gate that removes the LSH re-rank wall,
    # and Q9 on the bucketed fact layout (exchange-free orderkey join)
    "dedup_minhash_lsh_prefiltered",
    "sql_product_type_profit_bucketed",
    # r12: the same gate on the survivors composition (strong edges at 0.5
    # from the signatures; only the gray sliver pays the exact re-rank)
    # and on the cross-corpus admission screen (gate rollout complete)
    "dedup_survivors_lsh_prefiltered",
    "dedup_cross_corpus_lsh_prefiltered",
    # r13: the schema-drift trace through the real kernel on the
    # pointer-protocol LSM store (fingerprint-cached build; steady-state
    # timing measures the merge-on-read read across the schema boundary)
    "cdc_schema_evolution",
    # r15: SemDeDup — k-means cells + within-cell cosine dedup (the new
    # embedding-dedup composition; regression visibility for the cell
    # assign + pair-join plan). The multi-table snapshot transport is
    # benched by the stream_snapdiff_multi block, not here.
    "dedup_semantic_clusters",
    # r16: the online dedupers' CORRECTNESS rows (3-batch drain + redelivery
    # + forced compactions — the streaming-ingest cost envelope), and the
    # partition-kernel median (the fast half of the per-group-UDAF A/B;
    # udaf_pandas_median above is now the capped exhibit half)
    "dedup_incremental_minhash",
    "dedup_incremental_semantic",
    "udaf_pandas_median_fast",
    "embedding_quantize_int8",
    "embedding_random_projection",
    "dedup_incremental_exact",
    # r16 second half: the live streaming drains (fingerprint-cached after
    # the first rep — steady-state cost is the report read, so the rows
    # are cheap regression visibility for the streaming-agg and
    # custom-stateful topologies), plus the RP ANN composition
    "events_stream_windowed_watermark",
    "events_stream_windowed_append",
    "events_stream_stateful_sessions",
    "events_stream_dedup_watermark",
    "similarity_ann_rp",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from mysql_hbase_replicator_spark.plans.registry import (
        QUERY_REGISTRY,
        load_all_queries,
    )
    from mysql_hbase_replicator_spark.session import apply_volume_tuning, get_spark

    load_all_queries()
    # UI on for the run (r13 verdict #5): the stages REST API is the
    # machine-readable spill/shuffle record — two rounds of container drift
    # showed walls alone can't attribute regressions, so each headline
    # query's best rep now carries {spill_disk, spill_mem, shuffle_bytes}
    # into BENCH_FULL.json and a spill summary onto the driver line. The
    # listener/jetty overhead is outside the timed windows (totals are
    # snapshotted before/after each rep, never during).
    spark = get_spark(
        app_name="bench",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "40000",
            "spark.ui.retainedJobs": "10000",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    metrics_base = _metrics_api_base(spark)
    # self-tuning shuffle sizing (r11): initialPartitionNum follows the
    # measured SF's input volume — cores at test SFs (unchanged numbers),
    # 256-ish at the sf≈100 probe regime, no env knob required
    apply_volume_tuning(spark, sf_dir)

    # JVM/codegen warmup: run every headline query once at the smallest SF so
    # whole-stage-codegen classes are compiled (codegen cache keys on the
    # generated source, which depends on plan shape, not data) and the sf0.1
    # measurements are steady-state.
    for name in HEADLINE:
        QUERY_REGISTRY[name](spark, "/root/testdata/sf0.001").write.format("noop").mode(
            "overwrite"
        ).save()

    spark.catalog.clearCache()

    # best-of-2 per query: steady-state latency, halves GC-pause noise.
    # The best rep's stage-metric deltas ride along (spill should be ZERO
    # for every headline query at sf0.1 — a nonzero entry is the regression
    # signal the walls can't attribute).
    timings: dict[str, float] = {}
    query_io: dict[str, dict[str, int]] = {}
    # /proc/loadavg per rep (r14 verdict #4): the io columns attribute WHAT
    # regressed (spill/shuffle bytes); the loadavg sample attributes why
    # walls drift on a shared box — two rounds of byte-identical telemetry
    # with 13% wall swings traced to external load (loadavg 0.15→5.0)
    query_load: dict[str, float] = {}
    load_samples: list[float] = []
    for name in HEADLINE:
        best = float("inf")
        best_io: dict[str, int] | None = None
        best_load: float | None = None
        for _rep in range(2):
            load0 = _loadavg1()
            before = _stage_totals(metrics_base)
            t0 = time.time()
            QUERY_REGISTRY[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = time.time() - t0
            after = _stage_totals(metrics_base)
            load1 = _loadavg1()
            if load0 is not None:
                load_samples.append(load0)
            if load1 is not None:
                load_samples.append(load1)
            if dt < best:
                best = dt
                # pair the io deltas with THE winning rep — when its REST
                # snapshots failed, drop telemetry rather than silently
                # keeping a previous rep's bytes against this rep's wall
                best_io = (
                    {k: max(0, after[k] - before[k]) for k in after}
                    if (before is not None and after is not None)
                    else None
                )
                # the MAX of the rep's bracketing samples: the bench itself
                # inflates the 1-min average while running, so max-of-pair
                # is the honest "how contended was this wall" number
                best_load = (
                    round(max(v for v in (load0, load1) if v is not None), 2)
                    if (load0 is not None or load1 is not None)
                    else None
                )
        timings[name] = round(best, 3)
        if best_io is not None:
            query_io[name] = best_io
        if best_load is not None:
            query_load[name] = best_load

    # Measurement isolation between blocks (guide §1; r16): the headline
    # loop ends on the job-storm drains and leaves the JVM carrying their
    # heap/GC debt — measured at ~25% on the CDC kernel (63.5k ev/s
    # in-bench vs 81.2k standalone on byte-identical code, idle box, r16
    # baseline day). Settle the JVM before each summary block so it
    # measures its own work, not the previous block's garbage. The timed
    # computations themselves are unchanged.
    def _settle() -> None:
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        time.sleep(2.0)

    _settle()
    cdc = bench_cdc_throughput(spark)
    # 10× batch: the 200k batch is fixed-floor-dominated (~3 s of plan/
    # action cost); at 2M events the same kernel amortizes to ~1 µs/row —
    # the number that scales to backfills (r10: 780k/902k ev/s vs 66k/120k)
    cdc_10x = bench_cdc_throughput(spark, n_events=2_000_000)
    pruning = bench_partition_pruning(spark, sf_dir)
    _settle()
    streaming = bench_streaming(spark)
    # the 8M-row plain-vs-salted SMJ pair materially lengthens the run and
    # competes for cores, so it's opt-in (ADVICE r4): pass --skew to record
    # it; routine headline benches stay comparable across rounds
    skew = bench_skew_salting(spark) if "--skew" in sys.argv[1:] else None

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    full = {
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "cdc": cdc,
        "cdc_2m": cdc_10x,
        "partition_pruning": pruning,
        "streaming": streaming,
        # per-query best-rep stage telemetry (r13 verdict #5): bytes —
        # {spill_disk, spill_mem, shuffle_bytes} keyed like `queries`
        "query_io": query_io,
        # per-query best-rep /proc/loadavg 1-min sample (r14 verdict #4) —
        # max of the rep's bracketing samples, keyed like `queries`
        "query_load": query_load,
    }
    if skew is not None:
        full["skew_smj"] = skew
    # Full detail goes to a file: the driver records only the LAST ~2000
    # chars of stdout, and the 92-query timings dict alone exceeds that
    # (BENCH_r06/r07 both recorded parsed:null for this exact reason). The
    # single stdout JSON line below is the driver contract — kept compact:
    # the 24 queries shared with the r1 de-facto baseline (value = their
    # total, directly comparable to r1's 24.74 s) plus summary scalars for
    # everything else; BENCH_FULL.json carries all per-query timings.
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "BENCH_FULL.json"), "w") as f:
        json.dump(full, f, indent=1)
    missing24 = [n for n in BASELINE24 if n not in timings]
    if missing24:
        # a silently shorter baseline-24 total would read as a speedup in
        # round-over-round comparisons (ADVICE r8) — say so loudly instead
        print(
            f"WARNING: BASELINE24 queries missing from timings, total is "
            f"skewed low: {missing24}",
            file=sys.stderr,
        )
    base24 = {n: timings[n] for n in BASELINE24 if n in timings}
    # spill/shuffle rollup for the driver line (full per-query detail in
    # BENCH_FULL.json's query_io): totals across ALL headline queries plus
    # the named nonzero-disk-spill offenders (expected empty at sf0.1)
    io_summary = {
        "spill_disk_mb": round(
            sum(io["spill_disk"] for io in query_io.values()) / 1e6, 1
        ),
        "spill_mem_mb": round(
            sum(io["spill_mem"] for io in query_io.values()) / 1e6, 1
        ),
        "shuffle_gb": round(
            sum(io["shuffle_bytes"] for io in query_io.values()) / 1e9, 2
        ),
        "spilled": {
            n: round(io["spill_disk"] / 1e6, 1)
            for n, io in query_io.items()
            if io["spill_disk"] > 0
        },
    }
    compact = {
        "metric": "baseline24_total",
        "value": round(sum(base24.values()), 3),
        "unit": "sec",
        "queries": base24,
        "sf": full["sf"],
        "all_queries_total_sec": full["value"],
        "n_queries": len(timings),
        "cdc_ev_s": cdc["events_per_sec"],
        "cdc_lsm_ev_s": cdc["lsm_events_per_sec"],
        "cdc_2m_ev_s": cdc_10x["events_per_sec"],
        "cdc_2m_lsm_ev_s": cdc_10x["lsm_events_per_sec"],
        "stream_jsonl_ev_s": streaming["jsonl"]["events_per_sec"],
        "stream_debezium_ev_s": streaming["debezium"]["events_per_sec"],
        "stream_throughput_ev_s": streaming["jsonl_throughput"]["events_per_sec"],
        "stream_dbz_throughput_ev_s": streaming["debezium_throughput"][
            "events_per_sec"
        ],
        "cdc_bucketed_stream_ev_s": streaming["jsonl_bucketed_throughput"][
            "events_per_sec"
        ],
        "stream_jsonl_bulk_ev_s": streaming["jsonl_bulk"]["events_per_sec"],
        "stream_dbz_bulk_ev_s": streaming["debezium_bulk"]["events_per_sec"],
        "stream_snapdiff_rows_s": streaming["snapshot_diff"]["events_per_sec"],
        "stream_snapdiff_multi_rows_s": streaming["snapshot_diff_multi"][
            "events_per_sec"
        ],
        "io": io_summary,
        "detail": "BENCH_FULL.json",
    }
    if load_samples:
        # loadavg rollup for the driver line (per-query detail in
        # BENCH_FULL.json's query_load): how contended the box was across
        # the run — the drift-attribution signal next round's comparison
        # needs without a SCALING.md narrative
        srt = sorted(load_samples)
        compact["load"] = {
            "min": round(srt[0], 2),
            "med": round(srt[len(srt) // 2], 2),
            "max": round(srt[-1], 2),
        }
    if missing24:
        compact["baseline24_missing"] = len(missing24)
    print(emit_compact_line(compact))


# shared telemetry (one key vocabulary across bench + probes, r14 review):
# see mysql_hbase_replicator_spark.session.stage_io_totals
def _metrics_api_base(spark):
    from mysql_hbase_replicator_spark.session import metrics_api_base

    return metrics_api_base(spark)


def _stage_totals(base):
    from mysql_hbase_replicator_spark.session import stage_io_totals

    return stage_io_totals(base)


def _loadavg1() -> float | None:
    """1-minute /proc/loadavg sample; None where unavailable (non-Unix)."""
    try:
        return os.getloadavg()[0]
    except (OSError, AttributeError):
        return None


def emit_compact_line(compact: dict, limit: int = 1900) -> str:
    """Render the single-stdout-line driver contract. The driver records
    only the last ~2000 chars of stdout, so the line must stay short — but
    crashing after every measurement completed (the old ``assert``) lost
    the whole run's stdout record whenever the dict grew (ADVICE r8).
    Degrade instead: drop the per-query dict (full detail is always in
    BENCH_FULL.json), keep every summary scalar, and warn on stderr."""
    line = json.dumps(compact)
    if len(line) >= limit:
        slim = {k: v for k, v in compact.items() if k != "queries"}
        slim["queries_dropped"] = len(compact.get("queries") or {})
        print(
            f"WARNING: compact bench line is {len(line)} chars (limit "
            f"{limit}); dropping the per-query dict — see BENCH_FULL.json",
            file=sys.stderr,
        )
        line = json.dumps(slim)
    return line


def _bench_mapping(table: str = "t"):
    """The synthetic two-int-PK table mapping shared by the CDC kernel and
    streaming benches (same shape as the reference's student fixture)."""
    from mysql_hbase_replicator_spark.catalog.meta import HbaseCollInfo, HbaseTableInfo

    return HbaseTableInfo(
        dbName="db", dbTableName=table, hbaseTableName=f"db:{table}",
        hbaseNameSpace="db", sparkTableName=table, bytesUtils="Binary",
        cols=[
            HbaseCollInfo("sn", "int(11)", "sn", "IntegerType", True),
            HbaseCollInfo("id", "int(11)", "id", "IntegerType", True),
            HbaseCollInfo("score", "int(11)", "score", "IntegerType", False),
            HbaseCollInfo("name", "varchar(10)", "name", "StringType", False),
            HbaseCollInfo("rem", "varchar(2)", "rem", "StringType", False),
        ],
    )


def bench_streaming(
    spark, n_batches: int = 8, rows_per_batch: int = 5_000
) -> dict:
    """End-to-end micro-batch latency for the Structured-Streaming pipeline
    (r5 verdict #5): the CDC block above times the batch KERNEL; this block
    drives ``CdcStreamPipeline`` itself — readStream source, foreachBatch,
    kernel, bucketed merge write, checkpoint commit — over a steady feed of
    ``n_batches`` pre-written event files at one file per trigger, for BOTH
    sources (engine-native jsonl and Debezium envelopes), with the
    StatusServer live and scraped at the end.

    Reported per source: sustained events/s over the whole drain,
    micro-batch duration p50/p95 (Spark's own triggerExecution from
    recentProgress, non-empty batches only), and the first batch separately
    — it pays one-time codegen/Arrow setup and would otherwise poison p95.
    The reference's equivalent surface is its latency ring
    (HbaseApplier.scala:45-52) over one-RPC-per-row applies."""
    import json as _json
    import urllib.request

    from mysql_hbase_replicator_spark.streaming.pipeline import CdcStreamPipeline
    from mysql_hbase_replicator_spark.streaming.status import StatusServer

    mapping = _bench_mapping()

    def img(i: int) -> dict:
        return {
            "sn": i % 100,
            "id": (i // 100) % 100,
            "score": i % 1000,
            "name": f"n{i % 97}",
            "rem": "r",
        }

    def jsonl_line(i: int) -> str:
        mod = i % 10
        op = "insert" if mod < 6 else ("update" if mod < 8 else "delete")
        return _json.dumps(
            {
                "position": i + 1,
                "op": op,
                "db": "db",
                "table": "t",
                "before": img(i) if mod >= 6 else None,
                "after": img(i) if mod < 8 else None,
            }
        )

    def debezium_line(i: int) -> str:
        mod = i % 10
        op = "c" if mod < 6 else ("u" if mod < 8 else "d")
        return _json.dumps(
            {
                "op": op,
                "before": img(i) if mod >= 6 else None,
                "after": img(i) if mod < 8 else None,
                "source": {
                    "db": "db",
                    "table": "t",
                    "file": "binlog.000001",
                    "pos": i + 1,
                    "ts_ms": 1_700_000_000_000 + i,
                    "server_id": 1,
                },
            }
        )

    def run_source(
        fmt: str,
        make_line,
        files_per_trigger: int = 1,
        n_files: int | None = None,
        rows_per_file: int | None = None,
        store_kind: str = "lsm",
    ) -> dict:
        nf = n_files if n_files is not None else n_batches
        rpf = rows_per_file if rows_per_file is not None else rows_per_batch
        root = tempfile.mkdtemp(prefix=f"stream-bench-{fmt}-")
        try:
            events_dir = os.path.join(root, "events")
            os.makedirs(events_dir)
            n_events = nf * rpf
            for b in range(nf):
                tmp = os.path.join(events_dir, f".{b:04d}.tmp")
                with open(tmp, "w") as f:
                    for i in range(b * rpf, (b + 1) * rpf):
                        f.write(make_line(i) + "\n")
                os.replace(tmp, os.path.join(events_dir, f"{b:04d}.json"))

            # the pipeline's production store is the LSM (merge-on-read)
            # variant: per batch it appends one delta instead of rewriting
            # affected buckets (r6 verdict #2 — the bucket rewrite was the
            # dominant term of the micro-batch floor). Compaction cost is
            # measured separately below; at the default cadence (64 appends)
            # its amortized per-batch share is ~compact_sec/64.
            pipe = CdcStreamPipeline(
                spark=spark,
                events_path=events_dir,
                row_struct=None,
                store=store_kind,
                store_dir=os.path.join(root, "store"),
                store_n_buckets=32,
                store_compact_every=64,
                mappings={"db.t": mapping},
                checkpoint_dir=os.path.join(root, "ckpt"),
                source_format=fmt,
                max_files_per_trigger=files_per_trigger,
            )
            store = pipe.store
            srv = StatusServer(pipe, port=0).start()
            try:
                t0 = time.time()
                q = pipe.start(available_now=True, query_name=f"bench-{fmt}")
                q.awaitTermination(600)
                wall = time.time() - t0
                durs = [
                    p["durationMs"]["triggerExecution"]
                    for p in q.recentProgress
                    if p["numInputRows"] > 0
                ]
                with urllib.request.urlopen(
                    f"http://127.0.0.1:{srv.port}/jmx", timeout=10
                ) as resp:
                    counts = _json.loads(resp.read())["counts"]
            finally:
                srv.stop()
            # merge-on-read trade, both sides: reconstruction read cost with
            # the drain's deltas still unfolded, then compaction, then the
            # compacted (plain bucketed) read
            t0 = time.time()
            n_state = store.read(spark, "db:t").count()
            read_mor_sec = time.time() - t0
            t0 = time.time()
            store.compact(spark, "db:t")
            compact_sec = time.time() - t0
            t0 = time.time()
            assert store.read(spark, "db:t").count() == n_state
            read_compacted_sec = time.time() - t0
            durs_sorted = sorted(durs[1:]) or sorted(durs)
            p = lambda q_: durs_sorted[int(q_ * (len(durs_sorted) - 1))]  # noqa: E731
            return {
                "events": n_events,
                "n_batches": len(durs),
                "wall_sec": round(wall, 3),
                "events_per_sec": int(n_events / wall),
                "batch_ms_p50": p(0.50),
                "batch_ms_p95": p(0.95),
                "first_batch_ms": durs[0] if durs else None,
                "status_counts_total": sum(counts.values()),
                "store": store_kind,
                "state_rows": n_state,
                "read_mor_sec": round(read_mor_sec, 3),
                "compact_sec": round(compact_sec, 3),
                "read_compacted_sec": round(read_compacted_sec, 3),
            }
        finally:
            shutil.rmtree(root, ignore_errors=True)

    # Median-of-N for the latency-mode rows (r9 verdict #6: Debezium p95
    # spiked to 2.5x p50 under background load in one session — the
    # per-batch latency numbers are the noise-sensitive ones). Default 1
    # keeps the driver's routine run time unchanged; set
    # SPARK_GRAFT_STREAM_REPS=3 for a variance-controlled record. The
    # median is taken PER METRIC over the runs (p50, p95, events_per_sec),
    # with the non-numeric fields from the median-p50 run.
    reps = max(1, int(os.environ.get("SPARK_GRAFT_STREAM_REPS", "1")))

    def run_latency(fmt: str, make_line) -> dict:
        runs = [run_source(fmt, make_line) for _ in range(reps)]
        if reps == 1:
            return runs[0]
        mid = sorted(runs, key=lambda r: r["batch_ms_p50"])[len(runs) // 2]
        out = dict(mid)
        for k in ("batch_ms_p50", "batch_ms_p95", "events_per_sec", "wall_sec"):
            vals = sorted(r[k] for r in runs)
            out[k] = vals[len(vals) // 2]
        out["reps"] = reps
        return out

    out = {
        "jsonl": run_latency("jsonl", jsonl_line),
        "debezium": run_latency("debezium", debezium_line),
    }
    # throughput mode: same 40k events, ONE availableNow trigger admitting
    # all files — the production regime where the ~1.7 s per-trigger fixed
    # cost (PLANS.md streaming-floor table) amortizes over 8x the rows.
    # batch p50 is the single batch's duration there; sustained ev/s is the
    # number, set against the per-batch-latency rows above.
    out["jsonl_throughput"] = run_source("jsonl", jsonl_line, files_per_trigger=16)
    # Debezium throughput twin (r9 verdict #6): the same 40k envelopes in
    # ONE availableNow trigger, so the envelope parse + struct-seq ordering
    # amortize exactly like the jsonl path and the two sources' sustained
    # numbers are directly comparable. Also the regime where the latency
    # rows' p95-vs-p50 spread (machine-load noise on 1-file triggers)
    # disappears — one batch, one duration.
    out["debezium_throughput"] = run_source(
        "debezium", debezium_line, files_per_trigger=16
    )
    # bucketed-store twin of the jsonl throughput row (r11 verdict #6): the
    # same 40k-event availableNow drain through store="bucketed" — the
    # exchange-free merge-on-read catalog store — to show the sustained
    # rate stays within ~20% of the plain LSM's (the appends pay bucketBy
    # saveAsTable instead of a bare parquet write; the read side is where
    # the layout wins).
    out["jsonl_bucketed_throughput"] = run_source(
        "jsonl", jsonl_line, files_per_trigger=16, store_kind="bucketed"
    )
    # bulk mode (r10 verdict #5): the batch kernel's 2M-event point showed
    # 780k/902k ev/s but had no end-to-end streaming twin — the sustained
    # rows above still pay the ~1.2 s/batch machinery floor on 5k-event
    # micro-batches. One availableNow drain over a 2M-event log, with
    # maxFilesPerTrigger sized to land 4 micro-batches of 500k events each,
    # shows the amortization carries through the FULL pipeline: source
    # parse, kernel, dead-letter routing, counters, LSM delta append,
    # checkpoint commit. This is the backfill/recovery regime number the
    # reference's one-RPC-per-row applier cannot reach.
    out["jsonl_bulk"] = run_source(
        "jsonl", jsonl_line, files_per_trigger=4, n_files=16, rows_per_file=125_000
    )
    out["debezium_bulk"] = run_source(
        "debezium", debezium_line, files_per_trigger=4, n_files=16,
        rows_per_file=125_000,
    )

    # snapshot-diff transport (r12 verdict #3): S1's third mode end-to-end —
    # the pipeline polls FULL-STATE snapshot landings and diffs each against
    # the last applied one, so the cost envelope differs from the event
    # sources: every poll pays a full-snapshot scan + stage write + one
    # full-outer PK join even when almost nothing changed. rows_per_sec is
    # the sustained POLL rate (snapshot rows scanned/s); changes_applied is
    # how few of those rows actually became events (the churn fraction) —
    # the ratio is exactly why binlog tailing beats polling when available,
    # and what the diff's emit-nothing-for-unchanged property buys back.
    def run_snapshot_diff(n_snapshots: int = 6, n_keys: int = 10_000) -> dict:
        from pyspark.sql import types as T

        root = tempfile.mkdtemp(prefix="stream-bench-snapdiff-")
        try:
            snaps_dir = os.path.join(root, "snaps")
            os.makedirs(snaps_dir)
            total_rows = 0
            now = time.time()
            for v in range(1, n_snapshots + 1):
                tmp = os.path.join(snaps_dir, f".{v:04d}.tmp")
                with open(tmp, "w") as f:
                    for k in range(n_keys):
                        if (k + v) % 50 == 0:  # 2% rotating deletes/re-adds
                            continue
                        r = img(k)
                        # 10% of keys churn their score each version
                        r["score"] = (k % 1000) + (v if (k + v) % 10 == 0 else 0)
                        r["_snap_ver"] = v
                        f.write(_json.dumps(r) + "\n")
                        total_rows += 1
                dst = os.path.join(snaps_dir, f"{v:04d}.json")
                os.replace(tmp, dst)
                # deterministic oldest-first admission: the file source
                # orders by mtime and breaks same-second ties arbitrarily —
                # out-of-order admission would make the version gate skip
                # landings and this bench would measure skips, not diffs
                os.utime(dst, (now + v, now + v))
            row_struct = T.StructType(
                [
                    T.StructField("sn", T.IntegerType()),
                    T.StructField("id", T.IntegerType()),
                    T.StructField("score", T.IntegerType()),
                    T.StructField("name", T.StringType()),
                    T.StructField("rem", T.StringType()),
                ]
            )
            pipe = CdcStreamPipeline(
                spark=spark,
                events_path=snaps_dir,
                row_struct=row_struct,
                store="lsm",
                store_dir=os.path.join(root, "store"),
                store_n_buckets=32,
                mappings={"db.t": mapping},
                checkpoint_dir=os.path.join(root, "ckpt"),
                source_format="snapshot_diff",
                max_files_per_trigger=1,
            )
            t0 = time.time()
            q = pipe.start(available_now=True, query_name="bench-snapdiff")
            q.awaitTermination(600)
            wall = time.time() - t0
            durs = [
                p["durationMs"]["triggerExecution"]
                for p in q.recentProgress
                if p["numInputRows"] > 0
            ]
            counts = pipe.total_counts()
            n_state = pipe.store.read(spark, "db:t").count()
            durs_sorted = sorted(durs[1:]) or sorted(durs)
            mid = durs_sorted[len(durs_sorted) // 2] if durs_sorted else None
            return {
                "snapshots": n_snapshots,
                "snapshot_rows": total_rows,
                "wall_sec": round(wall, 3),
                "events_per_sec": int(total_rows / wall),
                "changes_applied": sum(counts.values()),
                "batch_ms_p50": mid,
                "first_batch_ms": durs[0] if durs else None,
                "state_rows": n_state,
            }
        finally:
            shutil.rmtree(root, ignore_errors=True)

    out["snapshot_diff"] = run_snapshot_diff()

    # multi-table snapshot polling (r13 verdict #2): the SAME poll history
    # for two tables through ONE pipeline — landing root with per-table
    # subdirs, per-table prev stores, global min-watermark. rows/s is the
    # combined sustained poll rate across both tables; setting it against
    # the single-table row above prices the per-table machinery (two
    # stage writes + two diffs + two kernel applies per poll wave).
    def run_snapshot_diff_multi(
        n_snapshots: int = 6, n_keys: int = 10_000, n_tables: int = 2
    ) -> dict:
        from pyspark.sql import types as T

        root = tempfile.mkdtemp(prefix="stream-bench-snapmulti-")
        try:
            row_struct = T.StructType(
                [
                    T.StructField("sn", T.IntegerType()),
                    T.StructField("id", T.IntegerType()),
                    T.StructField("score", T.IntegerType()),
                    T.StructField("name", T.StringType()),
                    T.StructField("rem", T.StringType()),
                ]
            )
            landing_root = os.path.join(root, "landing")
            mappings, row_structs = {}, {}
            total_rows = 0
            now = time.time()
            for t_i in range(n_tables):
                full = f"db.t{t_i}"
                sub = os.path.join(landing_root, full)
                os.makedirs(sub)
                for v in range(1, n_snapshots + 1):
                    tmp = os.path.join(sub, f".{v:04d}.tmp")
                    with open(tmp, "w") as f:
                        for k in range(n_keys):
                            if (k + v + t_i) % 50 == 0:
                                continue
                            r = img(k + t_i * 7)
                            r["score"] = (k % 1000) + (
                                v if (k + v) % 10 == 0 else 0
                            )
                            r["_snap_ver"] = v
                            f.write(_json.dumps(r) + "\n")
                            total_rows += 1
                    dst = os.path.join(sub, f"{v:04d}.json")
                    os.replace(tmp, dst)
                    os.utime(dst, (now + v, now + v))
                mappings[full] = _bench_mapping(f"t{t_i}")
                row_structs[full] = row_struct
            pipe = CdcStreamPipeline(
                spark=spark,
                events_path=landing_root,
                row_struct=None,
                row_structs=row_structs,
                store="lsm",
                store_dir=os.path.join(root, "store"),
                store_n_buckets=32,
                mappings=mappings,
                checkpoint_dir=os.path.join(root, "ckpt"),
                source_format="snapshot_diff",
                # whole poll waves per trigger + concurrent per-table
                # applies — the recommended multi-table configuration
                # (SCALING.md r14: +53% over serial at probe scale)
                max_files_per_trigger=n_tables,
                snapshot_parallel_tables=n_tables,
            )
            t0 = time.time()
            q = pipe.start(available_now=True, query_name="bench-snapmulti")
            q.awaitTermination(600)
            wall = time.time() - t0
            counts = pipe.total_counts()
            n_state = sum(
                pipe.store.read(spark, f"db:t{t_i}").count()
                for t_i in range(n_tables)
            )
            return {
                "tables": n_tables,
                "snapshots_per_table": n_snapshots,
                "snapshot_rows": total_rows,
                "wall_sec": round(wall, 3),
                "events_per_sec": int(total_rows / wall),
                "changes_applied": sum(counts.values()),
                "state_rows": n_state,
            }
        finally:
            shutil.rmtree(root, ignore_errors=True)

    out["snapshot_diff_multi"] = run_snapshot_diff_multi()
    return out


def bench_partition_pruning(spark, sf_dir: str) -> dict:
    """Measure what the day-partitioned events layout buys: the same
    one-week hourly error-rate aggregate over (a) the raw single-file
    events table with the ts-range filter merely PUSHED to the reader —
    every footer opened, every straddling row-group decoded — and (b) the
    layout-backed registered query whose date bound prunes 23 of 30 day
    directories at planning time. The layout build (one-time,
    fingerprint-cached) runs before the timer: steady-state read cost is
    the number that scales to 100 TB, and build_sec is reported separately
    so the amortization is visible."""
    from pyspark.sql import functions as F

    from mysql_hbase_replicator_spark.plans.queries_events import (
        PRUNE_WEEK_END,
        PRUNE_WEEK_START,
    )
    from mysql_hbase_replicator_spark.plans.registry import QUERY_REGISTRY
    from mysql_hbase_replicator_spark.sources.tables import load_table

    t0 = time.time()
    pruned_df = QUERY_REGISTRY["events_pruned_week_error_rate"](spark, sf_dir)
    build_sec = time.time() - t0  # ~0 when the fingerprint cache hits

    e = load_table(spark, sf_dir, "events").filter(
        (F.col("ts") >= F.lit(PRUNE_WEEK_START).cast("timestamp"))
        & (F.col("ts") < F.lit(PRUNE_WEEK_END).cast("timestamp"))
    )
    # identical output projection to the pruned registered query (window
    # formatting + error_rate included) so the timed pair differs ONLY in
    # scan strategy — omitting columns from the baseline biased it slow-side
    from mysql_hbase_replicator_spark.plans.queries import ts_str

    n_err = F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
    unpart_df = (
        e.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            n_err.alias("n_errors"),
            (n_err.cast("double") / F.count(F.lit(1))).alias("error_rate"),
        )
        .select(
            ts_str(F.col("w.start")).alias("window_start"),
            "n_events",
            "n_errors",
            "error_rate",
        )
    )

    best: dict[str, float] = {}
    for _rep in range(3):
        for name, df in (("unpartitioned", unpart_df), ("pruned", pruned_df)):
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            best[name] = min(best.get(name, float("inf")), time.time() - t0)
    return {
        "unpartitioned_sec": round(best["unpartitioned"], 3),
        "pruned_sec": round(best["pruned"], 3),
        "speedup": round(best["unpartitioned"] / best["pruned"], 2),
        "layout_build_sec": round(build_sec, 3),
    }


def bench_skew_salting(spark, n_probe: int = 8_000_000, hot_frac: float = 0.75) -> dict:
    """Measure the salted join in its REAL regime (r3 verdict #4): at sf0.1
    AQE broadcasts join_skew_salted's build side, so the headline number
    never exercises the skew the salt exists for. Here broadcast and AQE's
    own skew-join splitting are disabled, one key holds ``hot_frac`` of the
    probe rows, and the same SortMergeJoin+aggregate runs plain vs salted —
    the ratio is the salt's measured effect on a single-dominant-key SMJ
    (the streaming-join shape where AQE can't help).

    Round 6 adds the ADAPTIVE sweep: ``adaptive_salted_join`` derives the
    hot key's salt width from a sampled histogram (width ∝ hot share, so
    per-lane volume stays ~constant as the hot key grows); the sweep runs
    it across hot_frac ∈ {0.25..0.9} on the same probe — near-flat times
    across the sweep are the operator doing its own widening, the fix for
    the fixed-width 5.23× scale ratio SCALING.md r5 measured.
    """
    from pyspark.sql import functions as F

    from mysql_hbase_replicator_spark.operators.skew import (
        adaptive_salted_join,
        salted_join,
        sampled_key_widths,
    )

    def make_probe(frac: float):
        hot_n = int(n_probe * frac)
        return spark.range(n_probe).select(
            F.when(F.col("id") < hot_n, F.lit(42)).otherwise(F.col("id") % 100_000).alias("k"),
            (F.col("id") % 1000).cast("double").alias("v"),
        )

    probe = make_probe(hot_frac)
    build = spark.range(100_000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("grp")
    )

    def agg(joined):
        return joined.groupBy("grp").agg(
            F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv")
        )

    # width sized so each salt lane holds ~250k hot rows regardless of skew
    adaptive_kw = dict(sample_fraction=0.02, rows_per_salt=250_000, max_salts=64)

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.enabled": "false",
    }
    prev = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        # interleaved best-of-3: late-session GC/memory drift hits both
        # variants equally instead of whichever runs second
        variants = (
            ("plain", agg(probe.join(build, "k"))),
            ("salted", agg(salted_join(probe, build, ["k"], n_salts=32))),
            ("adaptive", agg(adaptive_salted_join(probe, build, ["k"], **adaptive_kw))),
        )
        best: dict[str, float] = {}
        for _rep in range(3):
            for name, df in variants:
                t0 = time.time()
                df.write.format("noop").mode("overwrite").save()
                dt = time.time() - t0
                best[name] = min(best.get(name, float("inf")), dt)
        results = {f"{name}_sec": round(v, 3) for name, v in best.items()}

        # hot-share sweep: adaptive width tracks the skew, time stays flat
        sweep: dict[str, dict] = {}
        for frac in (0.25, 0.5, 0.75, 0.9):
            p = make_probe(frac)
            widths = sampled_key_widths(p, ["k"], **adaptive_kw)
            df = agg(adaptive_salted_join(p, build, ["k"], **adaptive_kw))
            t = float("inf")
            for _rep in range(2):
                t0 = time.time()
                df.write.format("noop").mode("overwrite").save()
                t = min(t, time.time() - t0)
            sweep[str(frac)] = {
                "adaptive_sec": round(t, 3),
                "hot_width": max((w[-1] for w in widths), default=1),
            }
        results["adaptive_sweep"] = sweep
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)
    results["speedup"] = round(results["plain_sec"] / results["salted_sec"], 2)
    results["adaptive_speedup"] = round(results["plain_sec"] / results["adaptive_sec"], 2)
    results["n_probe"] = n_probe
    results["hot_frac"] = hot_frac
    return results


def bench_cdc_throughput(spark, n_events: int = 200_000, reps: int = 2) -> dict:
    """Apply one synthetic micro-batch (60% insert / 20% update / 20% delete
    over a 10k-key space, built entirely JVM-side from spark.range) through
    the full kernel — validation, last-image collapse, bucketed merge write —
    and report events/sec.

    A small warmup batch runs first and the measured run is best-of-``reps``:
    the first kernel invocation pays one-time JVM/codegen/Arrow setup that
    under-reports steady state ~4× (cold 9.3k ev/s vs warm ~28k on the same
    kernel), and steady state is the number to set against the reference's
    long-running one-RPC-per-row apply loop."""
    from pyspark.sql import functions as F

    from mysql_hbase_replicator_spark.operators.cdc_apply import apply_cdc_batch
    from mysql_hbase_replicator_spark.operators.merge import ParquetKeyedStore

    mapping = _bench_mapping()
    mod = F.col("id") % 10
    img = F.struct(
        (F.col("id") % 100).cast("int").alias("sn"),
        ((F.col("id") / 100).cast("long") % 100).cast("int").alias("id"),
        (F.col("id") % 1000).cast("int").alias("score"),
        F.concat(F.lit("n"), (F.col("id") % 97).cast("string")).alias("name"),
        F.lit("r").alias("rem"),
    )
    def make_events(n: int):
        return spark.range(n).select(
            (F.col("id") + 1).alias("position"),
            F.when(mod < 6, "insert").when(mod < 8, "update").otherwise("delete").alias("op"),
            F.lit("db").alias("db"),
            F.lit("t").alias("table"),
            F.when(mod >= 6, img).alias("before"),
            F.when(mod < 8, img).alias("after"),
            F.lit(None).cast("array<string>").alias("included_before"),
            F.lit(None).cast("array<string>").alias("included_after"),
        )

    from mysql_hbase_replicator_spark.operators.merge import LogStructuredKeyedStore

    def run_once(n: int, store_cls) -> float:
        tmp = tempfile.mkdtemp(prefix="cdc-bench-")
        try:
            store = store_cls(tmp, n_buckets=32)
            t0 = time.time()
            apply_cdc_batch(spark, make_events(n), store, {"db.t": mapping})
            return time.time() - t0
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    from mysql_hbase_replicator_spark.operators.merge import (
        BucketedLogStructuredKeyedStore,
    )

    run_once(1000, ParquetKeyedStore)  # warmup: compile the codegen stages once
    dt = min(run_once(n_events, ParquetKeyedStore) for _ in range(reps))
    # same kernel through the LSM store: the merge becomes one delta append
    # (the write path the streaming pipeline runs)
    dt_lsm = min(run_once(n_events, LogStructuredKeyedStore) for _ in range(reps))
    # bucketed-catalog LSM (r11): identical append semantics, but the delta
    # lands bucketed by PK so the merge-on-read path is exchange-free; the
    # write pays the bucket shuffle the read saves
    dt_bkt = min(
        run_once(n_events, BucketedLogStructuredKeyedStore) for _ in range(reps)
    )
    return {
        "events": n_events,
        "sec": round(dt, 3),
        "events_per_sec": int(n_events / dt),
        "lsm_sec": round(dt_lsm, 3),
        "lsm_events_per_sec": int(n_events / dt_lsm),
        "lsm_bucketed_sec": round(dt_bkt, 3),
        "lsm_bucketed_events_per_sec": int(n_events / dt_bkt),
    }


if __name__ == "__main__":
    main()
