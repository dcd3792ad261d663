"""Incremental (streaming) near-dedup (SURVEY.md §2.11 EXT, streaming form).

The batch MinHash-LSH query (operators/dedup.py) answers "which pairs in this
corpus are near-dups". An ingest pipeline needs the ONLINE form: documents
arrive in batches; each batch must be deduped against everything admitted so
far AND within itself, and the survivors join the index. The LSH band table
is exactly that index: admitting a doc = appending its N_BANDS
(band_idx, band_hash) rows; screening a batch = one equi-join against the
table. No signatures are recomputed for old docs, no all-pairs anything —
per batch the cost is O(batch × bands) join against an ever-growing but
key-partitioned table, the only shape that holds up at 100 TB of accumulated
corpus.

Decision rule: a new doc sharing ANY band with an admitted doc (or with an
earlier-by-id doc in the same batch) is rejected. That is LSH-level
near-dup screening (the 8×4 banding targets jaccard ≳ 0.5); a borderline
pipeline would re-rank candidates with exact Jaccard against the matched
docs' stored shingle hashes before rejecting — same join shape, one more
table.

Used inside foreachBatch (the CDC pipeline pattern) or called directly on
batch DataFrames, as in the tests.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mysql_hbase_replicator_spark.operators.dedup import band_hashes, hashed_shingles


class IncrementalDeduper:
    """Persistent LSH band index + batch screening."""

    def __init__(self, spark: SparkSession, index_dir: str):
        self.spark = spark
        self.index_dir = index_dir

    def _index(self) -> DataFrame | None:
        if not os.path.isdir(self.index_dir) or not any(
            f.endswith(".parquet")
            for _d, _s, fs in os.walk(self.index_dir)
            for f in fs
        ):
            return None
        return self.spark.read.parquet(self.index_dir)

    def process_batch(self, docs: DataFrame) -> DataFrame:
        """Screen one batch of (doc_id, text) rows. Returns the admitted
        docs; their bands are appended to the index. Within-batch dups keep
        the lowest doc_id (deterministic)."""
        bands = band_hashes(hashed_shingles(docs)).persist()
        try:
            # within-batch: any band shared with an earlier (lower-id) doc
            other = bands.select(
                F.col("doc_id").alias("prior_id"), "band_idx", "band_hash"
            )
            dup_in_batch = (
                bands.join(other, ["band_idx", "band_hash"])
                .filter(F.col("prior_id") < F.col("doc_id"))
                .select("doc_id")
                .distinct()
            )
            # against the accumulated index
            index = self._index()
            if index is not None:
                dup_vs_index = (
                    bands.join(
                        index.select("band_idx", "band_hash").dropDuplicates(),
                        ["band_idx", "band_hash"],
                    )
                    .select("doc_id")
                    .distinct()
                )
                dups = dup_in_batch.unionByName(dup_vs_index).distinct()
            else:
                dups = dup_in_batch
            admitted = docs.join(dups, "doc_id", "left_anti")
            (
                bands.join(dups, "doc_id", "left_anti")
                .write.mode("append")
                .parquet(self.index_dir)
            )
            return admitted
        finally:
            bands.unpersist()
