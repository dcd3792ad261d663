"""corpus_heavy_hitters' Misra-Gries phase: the superset guarantee under
adversarial skew (the sketch may only ever OVER-candidate; the exact
recount makes the final answer identical to brute force)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _mg_candidates(spark, toks):
    import pandas as pd

    from mysql_hbase_replicator_spark.plans.queries_corpus import HH_K_CAP

    def mg_partition(batches):
        counters = pd.Series(dtype="int64")
        for pdf in batches:
            counts = pdf["term"].value_counts()
            counters = counters.add(counts, fill_value=0)
            if len(counters) > HH_K_CAP:
                cut = counters.nlargest(HH_K_CAP + 1).iloc[-1]
                counters = counters - cut
                counters = counters[counters > 0]
        yield pd.DataFrame({"term": counters.index.astype(str)})

    return {
        r["term"]
        for r in toks.mapInPandas(mg_partition, "term string").dropDuplicates().collect()
    }


def test_mg_candidates_superset_under_skew(spark):
    """200k tokens over a long-tail vocabulary plus a handful of genuinely
    heavy terms, spread across many partitions: every term above the
    1/K_THRESH share must be in the candidate union."""
    from mysql_hbase_replicator_spark.plans.queries_corpus import HH_K_THRESH

    n = 200_000
    toks = (
        spark.range(n)
        .repartition(16)  # adversarial: heavy terms diluted across partitions
        .select(
            F.when(F.col("id") % 97 < 3, F.concat(F.lit("hot"), (F.col("id") % 4).cast("string")))
            .otherwise(F.concat(F.lit("t"), (F.col("id") % 50_000).cast("string")))
            .alias("term")
        )
    )
    exact = {
        r["term"]
        for r in toks.groupBy("term")
        .count()
        .filter(F.col("count") * HH_K_THRESH > n)
        .collect()
    }
    assert exact, "fixture must actually contain heavy hitters"
    cands = _mg_candidates(spark, toks)
    assert exact <= cands, exact - cands


def test_heavy_hitters_query_equals_brute_force(spark):
    """End-to-end on real test data: the registered sketch-then-verify
    query's rows equal the brute-force groupBy/filter answer exactly."""
    from mysql_hbase_replicator_spark.plans.queries_corpus import (
        HH_K_THRESH,
        corpus_heavy_hitters,
    )
    from mysql_hbase_replicator_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    got = {
        (r["term"], r["n_occurrences"])
        for r in corpus_heavy_hitters(spark, sf).collect()
    }
    toks = load_table(spark, sf, "documents").select(
        F.explode(F.split(F.col("text"), " ")).alias("term")
    )
    n = toks.count()
    want = {
        (r["term"], r["count"])
        for r in toks.groupBy("term")
        .count()
        .filter(F.col("count") * HH_K_THRESH > n)
        .collect()
    }
    assert got == want and got


def test_weighted_sample_prefers_long_docs(spark):
    """sample_weighted_length's inclusion chance must actually track length:
    the selected docs' mean n_chars exceeds the corpus mean (deterministic
    on the fixed test corpus)."""
    from mysql_hbase_replicator_spark.plans.queries_corpus import (
        sample_weighted_length,
    )
    from mysql_hbase_replicator_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    sel = sample_weighted_length(spark, sf)
    m_sel = sel.agg(F.avg("n_chars")).first()[0]
    m_all = (
        load_table(spark, sf, "documents").agg(F.avg("n_chars")).first()[0]
    )
    assert m_sel > m_all, (m_sel, m_all)
