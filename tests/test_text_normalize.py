"""Whitespace-canonicalization pre-pass (VERDICT r2 #6): on corpora with
tabs, newlines, CRs, and multi-space runs, the normalized tokenizer/shingle
paths must stay cell-for-cell identical between Spark and DuckDB — the same
bar the driver's value-hash applies to the registered queries."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

MESSY_DOCS = [
    (0, "the quick\tbrown  fox jumps\nover the lazy dog"),
    (1, "one two three four"),  # already canonical
    (2, "  leading and trailing  \n"),
    (3, "tab\tseparated\ttokens\there and\t\tdouble tabs"),
    (4, "multi   space    runs      everywhere"),
    (5, "mixed \t\n forms \r\n of line breaks \r here"),
    (6, "short"),
    (7, ""),
    (8, "a b a b a b a b repeated pairs a b"),
]


@pytest.fixture(scope="module")
def messy_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("messy_sf")
    pd.DataFrame(MESSY_DOCS, columns=["doc_id", "text"]).to_parquet(
        d / "documents.parquet", index=False
    )
    return str(d)


def _duck(messy_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{messy_dir}/documents.parquet'"
    )
    return con


def test_normalized_shingles_match_duckdb(spark, messy_dir):
    """word_shingles over normalize_ws(text) == DuckDB's split-on-space
    shingles over the identically normalized text — the exact contract the
    minhash/jaccard oracles rely on."""
    from pyspark.sql import functions as F

    from mysql_hbase_replicator_spark.functions.normalize import (
        normalize_ws,
        normalize_ws_sql,
    )
    from mysql_hbase_replicator_spark.operators.dedup import word_shingles

    docs = spark.read.parquet(f"{messy_dir}/documents.parquet")
    got = {
        r.doc_id: sorted(r.sh)
        for r in docs.select(
            "doc_id", word_shingles(normalize_ws(F.col("text"))).alias("sh")
        ).collect()
    }
    nws = normalize_ws_sql("text")
    con = _duck(messy_dir)
    want_rows = con.sql(
        f"""
        SELECT doc_id,
               CASE WHEN LEN(t) >= 3 THEN LIST_DISTINCT(LIST_TRANSFORM(
                        RANGE(1, LEN(t) - 1),
                        i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
                    ELSE [] END AS sh
        FROM (SELECT doc_id, STRING_SPLIT({nws}, ' ') AS t FROM documents)
        """
    ).fetchall()
    want = {doc_id: sorted(sh) for doc_id, sh in want_rows}
    assert got == want


def test_token_count_ws_matches_duckdb_on_messy_corpus(spark, messy_dir):
    """The registered text_token_count_ws builder and its oracle SQL agree
    cell-for-cell on the messy fixture (not just on the canonical corpus the
    driver runs them on)."""
    from mysql_hbase_replicator_spark.plans.registry import (
        ORACLE_REGISTRY,
        QUERY_REGISTRY,
        load_all_queries,
    )

    load_all_queries()
    sdf = (
        QUERY_REGISTRY["text_token_count_ws"](spark, messy_dir)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = _duck(messy_dir)
    odf = (
        con.sql(ORACLE_REGISTRY["text_token_count_ws"])
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(sdf.columns).sort() == list(odf.columns).sort()
    for c in sdf.columns:
        for i, (a, b) in enumerate(zip(sdf[c], odf[c])):
            assert a == b or (pd.isna(a) and pd.isna(b)), (c, i, a, b)


def test_normalized_minhash_equals_canonical_on_messy_variant(spark, messy_dir, tmp_path):
    """Canonicalizing a messy rendering of a corpus must reproduce the
    canonical corpus's shingle hashes exactly: hashed_shingles(messy,
    normalize=True) == hashed_shingles(canonical)."""
    from pyspark.sql import functions as F

    from mysql_hbase_replicator_spark.operators.dedup import hashed_shingles

    messy = spark.read.parquet(f"{messy_dir}/documents.parquet")
    canonical = messy.select(
        "doc_id",
        F.trim(F.regexp_replace("text", r"[ \t\n\r\f]+", " ")).alias("text"),
    )
    got = {
        (r.doc_id, r.h0) for r in hashed_shingles(messy, normalize=True).collect()
    }
    want = {(r.doc_id, r.h0) for r in hashed_shingles(canonical).collect()}
    assert got == want and len(want) > 0


PII_DOCS = [
    (0, "contact me at bob.smith+spam@example.com or 555-123-4567 today"),
    (1, "server at 192.168.0.1 and 10.0.0.255 went down"),
    (2, "no pii here at all"),
    (3, "alice@sub.domain.org wrote from 172.16.254.3 then called 800-555-0199"),
    (4, "edge: a@b.co x@y.io 000-000-0000 999.999.999.999"),
    (5, "email-in-text bob@example.com.and.more trailing"),
    (6, ""),
]


@pytest.fixture(scope="module")
def pii_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("pii_sf")
    pd.DataFrame(PII_DOCS, columns=["doc_id", "text"]).to_parquet(
        d / "documents.parquet", index=False
    )
    return str(d)


def test_pii_redact_matches_duckdb_on_pii_corpus(spark, pii_dir):
    """The registered text_pii_redact builder and its oracle SQL agree
    cell-for-cell on a fixture that actually CONTAINS emails, phone numbers,
    and IPs (the driver only exercises the clean-corpus no-op path)."""
    from mysql_hbase_replicator_spark.plans.registry import (
        ORACLE_REGISTRY,
        QUERY_REGISTRY,
        load_all_queries,
    )

    load_all_queries()
    sdf = (
        QUERY_REGISTRY["text_pii_redact"](spark, pii_dir)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = _duck(pii_dir)
    odf = (
        con.sql(ORACLE_REGISTRY["text_pii_redact"])
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert sorted(sdf.columns) == sorted(odf.columns)
    for c in sdf.columns:
        for i, (a, b) in enumerate(zip(sdf[c], odf[c])):
            assert a == b or (pd.isna(a) and pd.isna(b)), (c, i, a, b)
    # the fixture must actually exercise every pattern at least once
    assert sdf.n_emails.sum() >= 3
    assert sdf.n_phones.sum() >= 2
    assert sdf.n_ips.sum() >= 3
