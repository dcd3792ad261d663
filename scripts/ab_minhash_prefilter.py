"""sf≈10 A/B for the signature-agreement pre-filtered MinHash variant
(r10 verdict #3 close-out): `dedup_minhash_lsh` re-ranks EVERY band-join
candidate pair against both docs' shingle-hash sets — the ~2.2B-row/44 GB
intermediate that is the dedup family's cluster-memory term at sf≈100.
`dedup_minhash_lsh_prefiltered` gates candidates on signature agreement
first, so only the gray zone (7 ≤ n_match < 16 of 32) pays the shingle
re-join.

This probe reports, at a given SF:
- candidate pairs out of the band join (the plain variant's re-rank input),
- gray-zone pairs (the pre-filtered variant's re-rank input),
- the shrink factor between them (the "≥10×" number for SCALING.md),
- the two variants' re-rank-intermediate ROW counts
  (sum over re-ranked pairs of |shingles(a)| joined rows — the 44 GB term),
- wall time median-of-3 for both registered queries, with UI-scraped
  spill/shuffle deltas (same telemetry as scripts/reprobe_r7.py).

Usage:
  SPARK_GRAFT_DRIVER_MEM=48g python scripts/ab_minhash_prefilter.py [~10=/tmp/sf10]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _stage_totals(base: str) -> dict[str, int]:
    with urllib.request.urlopen(f"{base}/stages?status=complete", timeout=30) as r:
        stages = json.loads(r.read())
    tot = {"disk_spill": 0, "mem_spill": 0, "shuffle_write": 0}
    for s in stages:
        tot["disk_spill"] += s.get("diskBytesSpilled", 0)
        tot["mem_spill"] += s.get("memoryBytesSpilled", 0)
        tot["shuffle_write"] += s.get("shuffleWriteBytes", 0)
    return tot


def main() -> None:
    from pyspark.sql import functions as F

    from mysql_hbase_replicator_spark.operators import dedup as D
    from mysql_hbase_replicator_spark.plans.registry import (
        QUERY_REGISTRY,
        load_all_queries,
    )
    from mysql_hbase_replicator_spark.session import apply_volume_tuning, get_spark

    pos = [a for a in sys.argv[1:] if not a.startswith("--")]
    label, _, sf_dir = (pos[0] if pos else "~10=/tmp/sf10").partition("=")

    local_dir = "/tmp/spark-local-reprobe"
    os.makedirs(local_dir, exist_ok=True)
    load_all_queries()
    spark = get_spark(
        app_name="ab-minhash-prefilter",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "20000",
            "spark.local.dir": local_dir,
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    base = (
        f"{spark.sparkContext.uiWebUrl}/api/v1/applications/"
        f"{spark.sparkContext.applicationId}"
    )
    n_init = apply_volume_tuning(spark, sf_dir)
    print(f"# sf{label}: initialPartitionNum={n_init}", file=sys.stderr)

    # ---- structural counts: how much re-rank input does the gate remove?
    hashed = D.shingle_pairs(spark, sf_dir).select(
        "doc_id", D.shingle_h0(F.col("shingle")).alias("h0")
    ).persist()
    sig = D.minhash_signatures(hashed).localCheckpoint(eager=True)
    candidates = D._band_candidates(sig).localCheckpoint(eager=True)
    n_cand = candidates.count()
    scored = D._signature_agreement(candidates, sig).localCheckpoint(eager=True)
    n_gray = scored.filter(
        (F.col("n_match") >= D.PREFILTER_MIN_MATCH)
        & (F.col("n_match") < D.ACCEPT_MIN_MATCH)
    ).count()
    n_accept = scored.filter(F.col("n_match") >= D.ACCEPT_MIN_MATCH).count()
    n_reject = n_cand - n_gray - n_accept
    # the survivors variant's strong-edge gate (accept >= 22, reject < 10)
    n_gray_s = scored.filter(
        (F.col("n_match") >= D.STRONG_PREFILTER_MIN_MATCH)
        & (F.col("n_match") < D.STRONG_ACCEPT_MIN_MATCH)
    ).count()
    n_accept_s = scored.filter(
        F.col("n_match") >= D.STRONG_ACCEPT_MIN_MATCH
    ).count()

    # re-rank intermediate rows = Σ over re-ranked pairs of |shingles(doc_a)|
    # (the h0-equijoin probes doc_a's shingle rows against doc_b's — the
    # pre-aggregation join input is what spills, so count the join's left
    # fan-out which bounds it)
    doc_sh = hashed.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))

    def rerank_rows(pairs) -> int:
        return (
            pairs.join(
                doc_sh.select(F.col("doc_id").alias("doc_a"), "n_sh"), "doc_a"
            )
            .agg(F.sum("n_sh"))
            .collect()[0][0]
            or 0
        )

    rr_plain = rerank_rows(candidates)
    rr_gray = rerank_rows(
        scored.filter(
            (F.col("n_match") >= D.PREFILTER_MIN_MATCH)
            & (F.col("n_match") < D.ACCEPT_MIN_MATCH)
        ).select("doc_a", "doc_b")
    )
    rr_gray_s = rerank_rows(
        scored.filter(
            (F.col("n_match") >= D.STRONG_PREFILTER_MIN_MATCH)
            & (F.col("n_match") < D.STRONG_ACCEPT_MIN_MATCH)
        ).select("doc_a", "doc_b")
    )
    hashed.unpersist()

    structure = {
        "band_candidates": n_cand,
        "gate_accept": n_accept,
        "gate_gray": n_gray,
        "gate_reject": n_reject,
        "rerank_pairs_shrink": round(n_cand / max(n_gray, 1), 1),
        "rerank_rows_plain": rr_plain,
        "rerank_rows_gray": rr_gray,
        "rerank_rows_shrink": round(rr_plain / max(rr_gray, 1), 1),
        "strong_gate_accept": n_accept_s,
        "strong_gate_gray": n_gray_s,
        "strong_gate_reject": n_cand - n_gray_s - n_accept_s,
        "strong_rerank_pairs_shrink": round(n_cand / max(n_gray_s, 1), 1),
        "strong_rerank_rows_gray": rr_gray_s,
        "strong_rerank_rows_shrink": round(rr_plain / max(rr_gray_s, 1), 1),
    }
    print(f"# structure: {structure}", file=sys.stderr)

    # ---- wall-time A/B, median-of-3 with telemetry
    bench_names = (
        ("dedup_survivors_lsh", "dedup_survivors_lsh_prefiltered")
        if "--survivors" in sys.argv
        else ("dedup_minhash_lsh", "dedup_minhash_lsh_prefiltered")
    )
    out: dict[str, dict] = {"structure": structure, "init_partitions": n_init}
    for name in bench_names:
        QUERY_REGISTRY[name](spark, "/root/testdata/sf0.001").write.format(
            "noop"
        ).mode("overwrite").save()  # codegen warmup
        times, spills = [], []
        for _rep in range(3):
            before = _stage_totals(base)
            t0 = time.time()
            QUERY_REGISTRY[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            times.append(round(time.time() - t0, 3))
            after = _stage_totals(base)
            spills.append({k: after[k] - before[k] for k in after})
        med_spill = sorted(spills, key=lambda s: s["disk_spill"])[1]
        out[name] = {
            "median_s": statistics.median(times),
            "reps_s": times,
            "disk_spill_mb": round(med_spill["disk_spill"] / 1e6, 1),
            "mem_spill_mb": round(med_spill["mem_spill"] / 1e6, 1),
            "shuffle_write_mb": round(med_spill["shuffle_write"] / 1e6, 1),
        }
        print(f"# {label} {name}: {out[name]}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
