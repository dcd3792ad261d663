"""Property-based closure invariant for the incremental dedupers: for
random small corpora, random batch partitions, a random redelivered batch
and a random mid-stream compaction, the engine's admitted sets must equal
an independent Python implementation of the admission closure —
  reject(v) iff exists prior p with a qualifying match, where prior =
  earlier-by-id SAME-batch mate (regardless of p's own admission) OR any
  ADMITTED vector/doc from an earlier batch (the index holds survivors
  only) — and a redelivered batch admits nothing.
The MinHash reference takes each doc's band set from the engine's own
band_hashes (banding determinism is the oracle rows' job; the closure,
index persistence, redelivery and compaction machinery are what vary
here). The semantic reference reads the engine's persisted frozen
centroids and re-derives cells + cosines in pure float64 Python (the
sequential-fold arithmetic is bit-identical by construction).
"""

from __future__ import annotations

import math
import os

import pytest

try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st
except ImportError:  # pragma: no cover
    pytest.skip("hypothesis not installed", allow_module_level=True)

_N_EXAMPLES = int(os.environ.get("SPARK_GRAFT_PROPERTY_EXAMPLES", "0"))

VOCAB = ["alpha", "beta", "gamma", "delta", "eps"]


@st.composite
def doc_corpus(draw):
    """Tiny-vocab docs (heavy shingle collisions) in 2-4 batches; some docs
    are too short to shingle (no bands -> never rejected, never indexed)."""
    n = draw(st.integers(5, 14))
    docs = {
        i: " ".join(
            draw(st.sampled_from(VOCAB))
            for _ in range(draw(st.integers(1, 6)))
        )
        for i in range(n)
    }
    n_batches = draw(st.integers(2, 4))
    batches = [[] for _ in range(n_batches)]
    for i in docs:
        batches[draw(st.integers(0, n_batches - 1))].append(i)
    redeliver = draw(st.integers(0, n_batches - 1))
    compact_after = draw(st.integers(0, n_batches - 1))
    return docs, [sorted(b) for b in batches], redeliver, compact_after


@given(case=doc_corpus())
@settings(
    max_examples=_N_EXAMPLES or 6,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_incremental_minhash_matches_python_closure(spark, tmp_path_factory, case):
    from pyspark.sql import functions as F

    from mysql_hbase_replicator_spark.operators.dedup import (
        band_hashes,
        hashed_shingles,
    )
    from mysql_hbase_replicator_spark.operators.dedup_stream import (
        IncrementalDeduper,
    )

    docs, batches, redeliver, compact_after = case
    frame = spark.createDataFrame(
        list(docs.items()), "doc_id long, text string"
    )
    bands = {i: set() for i in docs}
    for r in band_hashes(hashed_shingles(frame)).collect():
        bands[r.doc_id].add((r.band_idx, r.band_hash))

    tmp = tmp_path_factory.mktemp("mhprop")
    dd = IncrementalDeduper(
        spark, str(tmp / "index"), max_files=10**6, n_compact_partitions=2
    )
    index: set[int] = set()
    for b, ids in enumerate(batches):
        batch = frame.filter(F.col("doc_id").isin(ids))
        got = sorted(r.doc_id for r in dd.process_batch(batch).collect())
        rejected = {
            v
            for v in ids
            if any(bands[p] & bands[v] for p in ids if p < v)
            or any(bands[p] & bands[v] for p in index)
        }
        want = sorted(set(ids) - rejected)
        assert got == want, (b, got, want, docs)
        index |= set(want)
        if b == redeliver and ids:
            # docs WITH bands self-match; band-less docs are re-admitted
            # (nothing was ever indexed for them — they are invisible to
            # the index by construction)
            re_got = sorted(r.doc_id for r in dd.process_batch(batch).collect())
            re_want = sorted(
                v
                for v in ids
                if not bands[v]
                or not (
                    any(bands[p] & bands[v] for p in ids if p < v)
                    or any(bands[p] & bands[v] for p in index)
                )
            )
            assert re_got == re_want, (b, re_got, re_want, docs)
        if b == compact_after:
            dd.compact()


@given(case=doc_corpus())
@settings(
    max_examples=_N_EXAMPLES or 6,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_incremental_exact_matches_python_closure(spark, tmp_path_factory, case):
    import hashlib

    from pyspark.sql import functions as F

    from mysql_hbase_replicator_spark.operators.dedup_stream import (
        IncrementalExactDeduper,
    )

    docs, batches, redeliver, compact_after = case
    fp = {
        i: int(hashlib.md5(t.encode()).hexdigest()[:15], 16)
        for i, t in docs.items()
    }
    frame = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    tmp = tmp_path_factory.mktemp("exprop")
    dd = IncrementalExactDeduper(
        spark, str(tmp / "index"), max_files=10**6, n_compact_partitions=2
    )
    index_fps: set[int] = set()
    for b, ids in enumerate(batches):
        batch = frame.filter(F.col("doc_id").isin(ids))
        got = sorted(r.doc_id for r in dd.process_batch(batch).collect())
        want = sorted(
            v
            for v in ids
            if fp[v] not in index_fps
            and not any(fp[p] == fp[v] for p in ids if p < v)
        )
        assert got == want, (b, got, want, docs)
        index_fps |= {fp[v] for v in want}
        if b == redeliver and ids:
            # every redelivered doc's fingerprint is indexed (its own if it
            # was admitted, its rejector's otherwise)
            assert dd.process_batch(batch).count() == 0
        if b == compact_after:
            dd.compact()


def _l2sq(a, b):
    return sum((float(x) - float(y)) ** 2 for x, y in zip(a, b))


def _cos(a, b):
    d = 0.0
    for x, y in zip(a, b):
        d += float(x) * float(y)
    na = 0.0
    for x in a:
        na += float(x) * float(x)
    nb = 0.0
    for y in b:
        nb += float(y) * float(y)
    return d / (math.sqrt(na) * math.sqrt(nb))


@st.composite
def vec_corpus(draw):
    """Small-grid 4-dim nonzero vectors (grid values force exact dups and
    near-dups) in 2-3 batches."""
    n = draw(st.integers(5, 12))
    vecs = {}
    for i in range(n):
        v = [float(draw(st.integers(-2, 2))) for _ in range(4)]
        if not any(v):
            v[draw(st.integers(0, 3))] = 1.0
        vecs[i] = v
    n_batches = draw(st.integers(2, 3))
    batches = [[] for _ in range(n_batches)]
    for i in vecs:
        batches[draw(st.integers(0, n_batches - 1))].append(i)
    if not batches[0]:  # the first NON-EMPTY batch trains; keep it batch 0
        batches[0], batches[-1] = batches[-1], batches[0]
    redeliver = draw(st.integers(0, n_batches - 1))
    threshold = draw(st.sampled_from([0.5, 0.9]))
    return vecs, [sorted(b) for b in batches], redeliver, threshold


@given(case=vec_corpus())
@settings(
    max_examples=_N_EXAMPLES or 6,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_incremental_semantic_matches_python_closure(
    spark, tmp_path_factory, case
):
    from pyspark.sql import functions as F

    from mysql_hbase_replicator_spark.operators.dedup_stream import (
        IncrementalSemanticDeduper,
    )

    vecs, batches, redeliver, threshold = case
    frame = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<float>"
    )
    tmp = tmp_path_factory.mktemp("semprop")
    dd = IncrementalSemanticDeduper(
        spark, str(tmp / "index"), threshold=threshold, n_cells=3,
        max_files=10**6,
    )
    cell_of = None
    index: set[int] = set()
    for b, ids in enumerate(batches):
        batch = frame.filter(F.col("vec_id").isin(ids))
        got = sorted(r.vec_id for r in dd.process_batch(batch).collect())
        if cell_of is None and ids:
            # frozen centroids persisted by the first non-empty batch:
            # re-derive every vector's cell in pure Python (same float64
            # argmin, ties on cid)
            cents = {
                r.cid: list(r.c)
                for r in spark.read.parquet(dd.centroid_dir).collect()
            }
            cell_of = {
                i: min((_l2sq(v, c), cid) for cid, c in cents.items())[1]
                for i, v in vecs.items()
            }
        rejected = {
            v
            for v in ids
            if any(
                cell_of[p] == cell_of[v] and _cos(vecs[p], vecs[v]) >= threshold
                for p in ids
                if p < v
            )
            or any(
                cell_of[p] == cell_of[v] and _cos(vecs[p], vecs[v]) >= threshold
                for p in index
            )
        }
        want = sorted(set(ids) - rejected)
        assert got == want, (b, got, want, vecs, cell_of)
        index |= set(want)
        if b == redeliver and ids:
            # every redelivered vector cosine-matches its indexed self at
            # 1.0 if admitted, or its original rejector otherwise
            assert dd.process_batch(batch).count() == 0
