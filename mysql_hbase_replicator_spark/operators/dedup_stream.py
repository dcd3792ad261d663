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
near-dup screening (the 8×4 banding targets jaccard ≳ 0.5). With
``rerank_threshold`` set, band collisions become CANDIDATES instead of
verdicts: each (doc, prior) candidate pair is re-ranked with exact Jaccard
over stored per-doc shingle hashes and the doc is rejected only when some
pair reaches the threshold — band-collision false positives are admitted.
The prior side is "earlier-by-id or already-indexed" regardless of the
prior's own admission (same closure as the band-level rule). Cost is
O(candidate pairs × shingles/doc) in equi-joins on the 60-bit h0 key —
still no all-pairs product.

Used inside foreachBatch (the CDC pipeline pattern) or called directly on
batch DataFrames, as in the tests.

Index maintenance: each admitted batch appends a few small parquet files, so
an unattended stream accumulates unbounded file counts (scheduler + file-open
overhead, tiny scans). When the file count exceeds ``max_files`` the index is
compacted — rewritten into ``n_compact_partitions`` band-key-partitioned
files via an atomic directory swap. A crash at any point leaves a
recoverable index: the swap retires the old directory BEFORE promoting the
staged one, and recovery (run before every screen/compact) restores the
retired copy if the promotion never happened. Screening results are
unaffected: compaction only reorganizes rows.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mysql_hbase_replicator_spark.operators.dedup import band_hashes, hashed_shingles


class _CompactingIndexBase:
    """The persistent-parquet-index scaffold shared by the incremental
    dedupers: crash-safe compaction over an append-only directory (stage →
    retire → promote → drop, recoverable at any crash point)."""

    spark: SparkSession
    index_dir: str
    n_compact_partitions: int

    def _parquet_files(self, root: str) -> list[str]:
        if not os.path.isdir(root):
            return []
        return [
            os.path.join(d, f)
            for d, _s, fs in os.walk(root)
            for f in fs
            if f.endswith(".parquet")
        ]

    def _data_files(self) -> list[str]:
        return self._parquet_files(self.index_dir)

    def _recover(self, live_dir: str) -> None:
        """Reclaim a crashed compaction pass for one directory. If the crash
        hit between retire and promote, the '.retired' copy is the ONLY
        surviving index — restore it. Only '.compacting' (never promoted,
        possibly incomplete) is unconditionally deleted."""
        staging, retired = live_dir + ".compacting", live_dir + ".retired"
        if os.path.isdir(staging):
            shutil.rmtree(staging)
        if os.path.isdir(retired):
            if not os.path.isdir(live_dir):
                os.replace(retired, live_dir)
            else:
                shutil.rmtree(retired)  # promotion completed; copy is stale

    def _compact_dir(
        self, live_dir: str, partition_cols: list[str], dedupe: bool = False
    ) -> int:
        """Atomic swap: stage → retire old → promote staged → drop retired.
        ``dedupe`` drops exact-duplicate rows during the rewrite — the
        shingle store can accumulate a doc's set twice when a crash between
        process_batch's two appends is replayed (see the append-order note
        there); the band index tolerates duplicates (candidates are
        distinct'd) so it skips the shuffle."""
        self._recover(live_dir)
        if not self._parquet_files(live_dir):
            return 0
        staging, retired = live_dir + ".compacting", live_dir + ".retired"
        frame = self.spark.read.parquet(live_dir)
        if dedupe:
            frame = frame.distinct()
        (
            frame
            .repartition(self.n_compact_partitions, *partition_cols)
            .write.mode("overwrite")
            .parquet(staging)
        )
        os.replace(live_dir, retired)
        os.replace(staging, live_dir)
        shutil.rmtree(retired)
        return len(self._parquet_files(live_dir))


class IncrementalDeduper(_CompactingIndexBase):
    """Persistent LSH band index + batch screening + compaction.

    ``rerank_threshold=None`` (default) rejects on any band collision;
    a float in (0, 1] enables the exact-Jaccard re-rank, which also
    persists per-doc shingle hashes beside the band index.
    """

    def __init__(
        self,
        spark: SparkSession,
        index_dir: str,
        max_files: int = 64,
        n_compact_partitions: int = 8,
        rerank_threshold: float | None = None,
    ):
        self.spark = spark
        self.index_dir = index_dir
        self.shingle_dir = index_dir + ".shingles"
        self.max_files = max_files
        self.n_compact_partitions = n_compact_partitions
        self.rerank_threshold = rerank_threshold

    def compact(self) -> int:
        """Rewrite the index (and, in re-rank mode, the shingle store) into
        n_compact_partitions join-aligned files each. Returns the resulting
        band-index file count."""
        n = self._compact_dir(self.index_dir, ["band_idx", "band_hash"])
        if self.rerank_threshold is not None:
            self._compact_dir(self.shingle_dir, ["doc_id"], dedupe=True)
        return n

    def _index(self) -> DataFrame | None:
        if not self._data_files():
            return None
        return self.spark.read.parquet(self.index_dir)

    def _shingle_store(self) -> DataFrame | None:
        if not self._parquet_files(self.shingle_dir):
            return None
        return self.spark.read.parquet(self.shingle_dir)

    def _rejected(self, bands: DataFrame, hashed: DataFrame) -> DataFrame:
        """The (doc_id) rows to reject for this batch — band-level verdicts,
        or Jaccard-re-ranked verdicts when rerank_threshold is set."""
        other = bands.select(F.col("doc_id").alias("prior_id"), "band_idx", "band_hash")
        cand_in_batch = (
            bands.join(other, ["band_idx", "band_hash"])
            .filter(F.col("prior_id") < F.col("doc_id"))
            .select("doc_id", "prior_id")
        )
        index = self._index()
        if index is not None:
            cand_vs_index = bands.join(
                index.select(
                    F.col("doc_id").alias("prior_id"), "band_idx", "band_hash"
                ),
                ["band_idx", "band_hash"],
            ).select("doc_id", "prior_id")
            cands = cand_in_batch.unionByName(cand_vs_index)
        else:
            cands = cand_in_batch
        if self.rerank_threshold is None:
            return cands.select("doc_id").distinct()

        cands = cands.distinct()
        # prior-side shingles: current batch (in-batch priors) + the store.
        # The store side drops doc_ids present in the batch FIRST: an
        # at-least-once source redelivers admitted docs, and a doc whose
        # shingles appear on both sides would have n_common and n_b doubled
        # — inflating Jaccard past the threshold for every pair involving
        # it, falsely rejecting genuine sub-threshold neighbours (r13
        # review). The batch doc-id set is small → broadcast anti-join.
        store = self._shingle_store()
        if store is None:
            prior_sh = hashed
        else:
            batch_ids = hashed.select("doc_id").distinct()
            prior_sh = hashed.unionByName(
                store.join(F.broadcast(batch_ids), "doc_id", "left_anti")
            )
        prior_sh = prior_sh.select(F.col("doc_id").alias("prior_id"), "h0")
        inter = (
            cands.join(hashed, "doc_id")
            .join(prior_sh, ["prior_id", "h0"])
            .groupBy("doc_id", "prior_id")
            .agg(F.count(F.lit(1)).alias("n_common"))
        )
        n_doc = hashed.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_a"))
        n_prior = prior_sh.groupBy("prior_id").agg(F.count(F.lit(1)).alias("n_b"))
        return (
            inter.join(n_doc, "doc_id")
            .join(n_prior, "prior_id")
            .filter(
                F.col("n_common").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")).cast("double")
                >= F.lit(float(self.rerank_threshold))
            )
            .select("doc_id")
            .distinct()
        )

    def process_batch(self, docs: DataFrame) -> DataFrame:
        """Screen one batch of (doc_id, text) rows. Returns the admitted
        docs; their bands (and shingle hashes, in re-rank mode) are appended
        to the index. Within-batch dups keep the lowest doc_id
        (deterministic)."""
        self._recover(self.index_dir)
        if self.rerank_threshold is not None:
            self._recover(self.shingle_dir)
        hashed = hashed_shingles(docs).persist()
        bands = band_hashes(hashed).persist()
        try:
            # materialize the rejected-id set NOW, distributed (eager local
            # checkpoint — no driver round-trip, no literal IN list): the
            # returned `admitted` plan must not lazily reference index files
            # that a compaction pass may rewrite before the caller collects
            dups = self._rejected(bands, hashed).localCheckpoint(eager=True)
            admitted = docs.join(dups, "doc_id", "left_anti")
            new_bands = bands.join(dups, "doc_id", "left_anti")
            # Append order matters for crash safety (r13 review): SHINGLES
            # FIRST. Bands-first left a window where a crash between the two
            # appends stored bands with no shingles — the doc then
            # band-matched ITSELF on the replay (rejected, so its shingles
            # were never stored) and every future true near-dup of it
            # band-collided into a candidate pair whose Jaccard join found
            # no prior shingles: near-dups admitted forever. Shingles-first
            # inverts the failure: the replayed doc has no bands yet, is
            # re-admitted, and completes the index — the only residue is a
            # duplicated shingle set, which briefly OVER-rejects borderline
            # neighbours (conservative) and is healed by the next
            # compaction's distinct().
            if self.rerank_threshold is not None:
                hashed.join(dups, "doc_id", "left_anti").write.mode("append").parquet(
                    self.shingle_dir
                )
            new_bands.write.mode("append").parquet(self.index_dir)
            if len(self._data_files()) > self.max_files:
                self.compact()
            return admitted
        finally:
            bands.unpersist()
            hashed.unpersist()

class IncrementalSemanticDeduper(_CompactingIndexBase):
    """Online SemDeDup: the streaming sibling of the batch
    ``dedup_semantic_clusters`` operator (operators/similarity.py), the
    embedding counterpart of the MinHash ``IncrementalDeduper`` above.

    Vectors arrive in batches; each batch must be screened against
    everything admitted so far AND against itself, and survivors join the
    index. The k-means cell plays the LSH band's role: the persistent index
    stores one (vec_id, cell, embedding, nsq) row per admitted vector,
    cell-partitioned; screening a batch = assign cells (map-only broadcast
    of the centroid table) → one cell-keyed equi-join against the index +
    one within-batch cell self-join → exact cosine at the gate. Per batch
    the cost is O(batch × cell occupancy) — never all-pairs against the
    accumulated corpus, the only shape that survives an unbounded stream.

    Centroids are trained ONCE from the first batch (its ``n_cells``
    lowest-id vectors seed one distributed Lloyd step — the same
    deterministic recipe as the batch operator) and persisted beside the
    index; production pipelines that already own centroids can pre-write
    that table. Frozen cells are what make admission decisions stable
    across the stream: re-training per batch would silently move cell
    boundaries and change who screens against whom.

    Decision rule (mirrors the batch keep-lowest-id semantics): a vector
    with cosine >= ``threshold`` to ANY indexed vector or to an
    earlier-by-id batch-mate in the SAME cell is rejected — regardless of
    that batch-mate's own admission (same closure as the band-level rule
    above). Redelivered vectors cosine-match their own indexed copy at 1.0
    and are rejected, so an at-least-once source never double-admits.

    Crash safety: one index append per batch, AFTER the rejected set is
    eagerly materialized — a crash before the append replays cleanly (the
    batch re-screens and re-admits); the centroid table is written to a
    staging dir and os.replace'd, so it exists either fully or not at all.
    Compaction inherits the stage → retire → promote swap."""

    CENT_SUFFIX = ".centroids"

    def __init__(
        self,
        spark: SparkSession,
        index_dir: str,
        threshold: float | None = None,
        n_cells: int | None = None,
        max_files: int = 64,
        n_compact_partitions: int = 8,
    ):
        from mysql_hbase_replicator_spark.operators.similarity import (
            EMB_DUP_THRESHOLD,
            IVF_K,
        )

        self.spark = spark
        self.index_dir = index_dir
        self.centroid_dir = index_dir + self.CENT_SUFFIX
        self.threshold = EMB_DUP_THRESHOLD if threshold is None else float(threshold)
        self.n_cells = IVF_K if n_cells is None else int(n_cells)
        self.max_files = max_files
        self.n_compact_partitions = n_compact_partitions

    def _ensure_centroids(self, prepared: DataFrame) -> DataFrame:
        """The one-row broadcastable centroid frame (``cents`` array of
        (cid, c) structs) — read from disk, or trained once from this
        (first) batch and persisted atomically."""
        from pyspark.sql import Window
        from mysql_hbase_replicator_spark.operators.similarity import _kmeans_step

        if self._parquet_files(self.centroid_dir):
            rows = self.spark.read.parquet(self.centroid_dir)
            return rows.agg(
                F.collect_list(F.struct("cid", "c")).alias("cents")
            )
        w = Window.orderBy("vec_id")
        seeds = (
            prepared.select("vec_id", "embedding")
            .orderBy("vec_id")
            .limit(self.n_cells)
            .select(
                (F.row_number().over(w) - 1).cast("int").alias("cid"),
                F.col("embedding").alias("c"),
            )
            .agg(F.collect_list(F.struct("cid", "c")).alias("cents"))
        )
        cents = _kmeans_step(prepared.select("vec_id", "embedding"), seeds)
        flat = cents.select(F.explode("cents").alias("s")).select(
            F.col("s.cid").alias("cid"), F.col("s.c").alias("c")
        )
        staging = self.centroid_dir + ".staging"
        flat.write.mode("overwrite").parquet(staging)
        if os.path.isdir(self.centroid_dir):  # lost a train race: keep first
            shutil.rmtree(staging)
        else:
            os.replace(staging, self.centroid_dir)
        rows = self.spark.read.parquet(self.centroid_dir)
        return rows.agg(F.collect_list(F.struct("cid", "c")).alias("cents"))

    def _assign(self, prepared: DataFrame, cents: DataFrame) -> DataFrame:
        from mysql_hbase_replicator_spark.operators.similarity import _l2_sq

        best = F.array_min(
            F.transform(
                F.col("cents"),
                lambda c: F.struct(
                    _l2_sq(F.col("embedding"), c["c"]).alias("d"),
                    c["cid"].alias("cid"),
                ),
            )
        )
        return prepared.crossJoin(F.broadcast(cents)).select(
            "vec_id", best["cid"].alias("cell"), "embedding", "nsq"
        )

    def _index(self) -> DataFrame | None:
        if not self._data_files():
            return None
        return self.spark.read.parquet(self.index_dir)

    def _rejected(self, assigned: DataFrame) -> DataFrame:
        """(vec_id) rows to reject: cosine >= threshold to an earlier-by-id
        batch-mate or ANY indexed vector (self-matches included — that is
        the redelivery guard) in the same cell."""
        from mysql_hbase_replicator_spark.operators.similarity import (
            cosine_from_parts,
            dot,
        )

        prior_batch = assigned.select(
            F.col("vec_id").alias("prior_id"),
            "cell",
            F.col("embedding").alias("emb_p"),
            F.col("nsq").alias("nsq_p"),
        )
        pairs = (
            assigned.join(prior_batch, "cell")
            .filter(F.col("prior_id") < F.col("vec_id"))
            .select("vec_id", "cell", "emb_p", "nsq_p", "embedding", "nsq")
        )
        index = self._index()
        if index is not None:
            vs_index = assigned.join(
                index.select(
                    "cell",
                    F.col("embedding").alias("emb_p"),
                    F.col("nsq").alias("nsq_p"),
                ),
                "cell",
            ).select("vec_id", "cell", "emb_p", "nsq_p", "embedding", "nsq")
            pairs = pairs.unionByName(vs_index)
        return (
            pairs.filter(
                cosine_from_parts(
                    dot(F.col("emb_p"), F.col("embedding")),
                    F.col("nsq_p"),
                    F.col("nsq"),
                )
                >= F.lit(self.threshold)
            )
            .select("vec_id")
            .distinct()
        )

    def compact(self) -> int:
        """Rewrite the index into n_compact_partitions cell-aligned files.
        Returns the resulting file count."""
        return self._compact_dir(self.index_dir, ["cell"])

    def process_batch(self, vecs: DataFrame) -> DataFrame:
        """Screen one batch of (vec_id, embedding) rows. Returns the
        admitted rows; their (vec_id, cell, embedding, nsq) join the
        index. Within-batch dups keep the lowest vec_id."""
        from mysql_hbase_replicator_spark.operators.similarity import norm_sq

        self._recover(self.index_dir)
        prepared = vecs.select(
            "vec_id", "embedding", norm_sq(F.col("embedding")).alias("nsq")
        )
        # an EMPTY batch before any centroids exist must not train: it
        # would persist a zero-row centroid table, every later vector
        # would assign to a NULL cell, and screening would silently admit
        # everything forever (r15 review). The isEmpty action runs only on
        # the rare untrained path.
        if not self._parquet_files(self.centroid_dir) and prepared.isEmpty():
            return vecs
        cents = self._ensure_centroids(prepared)
        assigned = self._assign(prepared, cents).localCheckpoint(eager=True)
        # eager: the returned plan must not lazily reference index files a
        # later compaction may rewrite (same rationale as the band deduper)
        dups = self._rejected(assigned).localCheckpoint(eager=True)
        admitted = vecs.join(dups, "vec_id", "left_anti")
        assigned.join(dups, "vec_id", "left_anti").write.mode("append").parquet(
            self.index_dir
        )
        if len(self._data_files()) > self.max_files:
            self.compact()
        return admitted
