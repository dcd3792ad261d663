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

Index maintenance: each admitted batch appends a few small parquet files, so
an unattended stream accumulates unbounded file counts (scheduler + file-open
overhead, tiny scans). When the file count exceeds ``max_files`` the index is
compacted — rewritten into ``n_compact_partitions`` band-key-partitioned
files via an atomic directory swap (crash mid-compaction leaves the old index
intact; stale temp dirs are reclaimed on the next pass). Screening results
are unaffected: compaction only reorganizes rows.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mysql_hbase_replicator_spark.operators.dedup import band_hashes, hashed_shingles


class IncrementalDeduper:
    """Persistent LSH band index + batch screening + compaction."""

    def __init__(
        self,
        spark: SparkSession,
        index_dir: str,
        max_files: int = 64,
        n_compact_partitions: int = 8,
    ):
        self.spark = spark
        self.index_dir = index_dir
        self.max_files = max_files
        self.n_compact_partitions = n_compact_partitions

    def _data_files(self) -> list[str]:
        if not os.path.isdir(self.index_dir):
            return []
        return [
            os.path.join(d, f)
            for d, _s, fs in os.walk(self.index_dir)
            for f in fs
            if f.endswith(".parquet")
        ]

    def compact(self) -> int:
        """Rewrite the index into n_compact_partitions files partitioned by
        band key (fewer, larger, join-aligned files). Atomic: the new layout
        is staged beside the index and swapped in with directory renames, so
        a crash at any point leaves a readable index. Returns the resulting
        file count."""
        index = self._index()
        if index is None:
            return 0
        staging = self.index_dir + ".compacting"
        retired = self.index_dir + ".retired"
        for stale in (staging, retired):  # reclaim a crashed previous pass
            if os.path.isdir(stale):
                shutil.rmtree(stale)
        (
            index.repartition(self.n_compact_partitions, "band_idx", "band_hash")
            .write.mode("overwrite")
            .parquet(staging)
        )
        os.replace(self.index_dir, retired)
        os.replace(staging, self.index_dir)
        shutil.rmtree(retired)
        return len(self._data_files())

    def _index(self) -> DataFrame | None:
        if not self._data_files():
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
            # materialize the rejected ids NOW (bounded by batch size): the
            # returned `admitted` plan must not lazily reference index files
            # that a compaction pass may rewrite before the caller collects
            dup_ids = [r[0] for r in dups.collect()]
            admitted = (
                docs.filter(~F.col("doc_id").isin(dup_ids)) if dup_ids else docs
            )
            new_bands = (
                bands.filter(~F.col("doc_id").isin(dup_ids)) if dup_ids else bands
            )
            new_bands.write.mode("append").parquet(self.index_dir)
            if len(self._data_files()) > self.max_files:
                self.compact()
            return admitted
        finally:
            bands.unpersist()
