"""EXT deduplication operators over `documents` (SURVEY.md §2.11):

- exact dedup (hash-groupBy)
- n-gram (3-word shingle) Jaccard similarity pairs — the exact near-dup oracle
- MinHash + LSH banding — the scale path for near-dup at 100 TB
- SimHash signatures + banded-Hamming near-dup pairs
- duplicate-cluster extraction (min-label connected components)
- (incremental/streaming screening lives in dedup_stream.py)

Everything is built from JVM-side primitives (regex / explode / md5-derived
universal hashing / groupBy); no Python UDFs, no driver-side collection. The
hashing is deliberately md5+modular-arithmetic (not xxhash64) so every
approximate pipeline here is replicated term for term by a DuckDB oracle. At 100 TB the shingle
explode shuffles (doc, shingle) pairs once; MinHash collapses that to a
128-byte signature per doc, and LSH banding turns all-pairs comparison into
an equi-join on band hashes — the only join shape that survives web-scale
corpora.
"""

from __future__ import annotations

import logging
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from mysql_hbase_replicator_spark.functions.normalize import normalize_ws
from mysql_hbase_replicator_spark.plans.registry import query
from mysql_hbase_replicator_spark.sources.tables import load_table

N_MINHASHES = 32
N_BANDS = 8  # 8 bands × 4 rows: catches jaccard ≳ 0.5 with high prob
ROWS_PER_BAND = N_MINHASHES // N_BANDS

# Signature-agreement gates for the pre-filtered LSH variant (r11; the
# sf≈100 escape hatch PLANS.md documents). Matching-component counts out
# of N_MINHASHES, evaluated per band-join candidate from the ALREADY
# materialized signatures (pair-sized work, no shingle join):
#   n_match >= ACCEPT (16/32 = est 0.5): accept on the estimate alone —
#     at true J < 0.3 that is a >2.3σ upward error (σ≈0.081), so estimate
#     -accepted false positives are ~1%;
#   n_match < PREFILTER (7/32 ≈ est 0.22): reject without the exact
#     re-rank — a true J=0.30 pair lands here with P(Bin(32,0.3) ≤ 6)
#     ≈ 11% (J=0.35: ≈3%), the recall the variant knowingly trades;
#   in between: the gray zone that still pays the exact-Jaccard re-rank.
# The re-rank intermediate therefore shrinks from EVERY candidate × its
# shingles to gray-zone candidates × shingles — at sf≈100 the J≈0.9
# family pairs (the 22M-pair bulk) are all estimate-accepted and the
# J≈0 band collisions are all rejected, leaving only the borderline
# sliver (SCALING.md r11 A/B).
PREFILTER_MIN_MATCH = 7
ACCEPT_MIN_MATCH = 16

# Gate calibration for the STRONG-edge (J >= 0.5) survivors variant. The
# survivors pipeline thresholds edges at 0.5 instead of 0.3, so the same
# three-way gate re-centers (Bin(32, J), σ≈0.088 at J=0.5):
#   n_match >= 22 (est 0.69): accept as a strong edge on the estimate — a
#     just-below-threshold J=0.45 pair lands here w.p. 0.6% (J=0.40: 0.09%);
#   n_match < 10 (est < 0.31): reject without the re-rank — a true J=0.50
#     edge is missed w.p. P(Bin(32,.5) <= 9) ≈ 1.0% (J=0.55: 0.19%);
#   gray zone [10, 22): exact shingle-Jaccard verification at 0.5.
# A dropped/added edge shifts cluster membership, so unlike the pair
# variant the recall trade here moves WHICH keeper survives — the oracle
# replicates the identical gates, making the traded answer exact.
STRONG_PREFILTER_MIN_MATCH = 10
STRONG_ACCEPT_MIN_MATCH = 22

# Universal-hash family over the Mersenne prime 2^31-1: h_i = (a_i*h0 + b_i)
# mod P, with h0 = the first 60 bits of md5(shingle). Everything fits a
# signed 64-bit product (31-bit × 31-bit), so BOTH Spark (ANSI mode, no
# overflow) and DuckDB evaluate it exactly — which is what makes the whole
# MinHash+LSH pipeline oracle-checkable in SQL, unlike xxhash64. Constants
# come from a fixed LCG so they are reproducible everywhere.
MINHASH_P = 2_147_483_647

# The registered exact-pair baselines (dedup_ngram_jaccard,
# dedup_embedding_cosine, dedup_connected_components' edge build) are
# quadratic by nature — they exist as the correctness oracles that the
# MinHash-LSH / SimHash / IVF scale paths are verified against. So the
# REGISTERED forms bound their input to the first EXACT_BASELINE_MAX_DOCS
# ids: a user who runs them against a 100 TB corpus gets the documented
# baseline-on-a-prefix, not an accidental O(n²) job. Identical caps in the
# DuckDB oracles; pass max_doc_id=None to the builders for the unbounded
# exact form (tests do, on small fixtures). No-op at test SFs (< 10k docs).
EXACT_BASELINE_MAX_DOCS = 10_000


def _hash_constants(n: int) -> list[tuple[int, int]]:
    x, out = 0x9E3779B97F4A7C15, []
    for _ in range(n):
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        a = x % (MINHASH_P - 1) + 1
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        b = x % MINHASH_P
        out.append((a, b))
    return out


MINHASH_AB = _hash_constants(N_MINHASHES)


def shingle_h0(shingle: Column) -> Column:
    """md5(shingle) → first 15 hex chars → 60-bit bigint. The 60-bit value
    keys the exact-intersection joins (collision-free in practice); minhash
    reduces it mod P first. SQL twin:
    CAST(('0x' || SUBSTR(MD5(s), 1, 15)) AS BIGINT)."""
    return F.conv(
        F.substring(F.md5(F.encode(shingle, "UTF-8")), 1, 15), 16, 10
    ).cast("long")


def word_shingles(text: Column, k: int = 3) -> Column:
    """Distinct k-word shingles of a whitespace-tokenized text (empty array
    when the text has fewer than k tokens).

    CORPUS ASSUMPTION: tokens are separated by exactly one ASCII space (the
    synthetic `documents` corpus is canonical). The regex tokenizes on
    single spaces to stay term-for-term identical with the DuckDB oracle's
    STRING_SPLIT(text, ' '); runs of spaces, tabs, or newlines would make
    the two engines diverge. Non-canonical corpora must be normalized first
    (regexp_replace(text, r'\\s+', ' ')).

    Implemented as ONE native regex call per document — a lookbehind-anchored
    lookahead captures every overlapping k-token run: ``(?<!\\S)`` pins the
    match to token starts, the capture inside ``(?=...)`` grabs k tokens
    without consuming them. ~5× faster than building the shingle array with
    higher-order ``transform``/``element_at`` lambdas, which Spark evaluates
    interpreted, outside whole-stage codegen."""
    rx = r"(?<!\S)(?=(" + r"(?:\S+ ){%d}" % (k - 1) + r"\S+))"
    return F.array_distinct(F.regexp_extract_all(text, F.lit(rx), 1))


def shingle_pairs(
    spark: SparkSession,
    sf_dir: str,
    max_doc_id: int | None = None,
    normalize: bool = False,
) -> DataFrame:
    """(doc_id, shingle) exploded — shared base for jaccard and minhash.
    ``max_doc_id`` bounds the input doc set (pushed to the parquet scan);
    ``normalize=True`` collapses whitespace runs first (the pre-pass for
    non-canonical corpora — see word_shingles' CORPUS ASSUMPTION)."""
    d = load_table(spark, sf_dir, "documents")
    if max_doc_id is not None:
        d = d.filter(F.col("doc_id") < max_doc_id)
    text = normalize_ws(F.col("text")) if normalize else F.col("text")
    return d.select("doc_id", F.explode(word_shingles(text)).alias("shingle"))


def _jaccard_sql_base(max_doc_id: int | None = None) -> str:
    cap = f"AND doc_id < {max_doc_id}" if max_doc_id is not None else ""
    return f"""
    WITH sh AS (
        SELECT DISTINCT doc_id, u.shingle
        FROM (SELECT doc_id, STRING_SPLIT(text, ' ') AS t FROM documents
              WHERE TRUE {cap}),
             UNNEST(LIST_TRANSFORM(RANGE(1, LEN(t) - 1),
                                   i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS u(shingle)
        WHERE LEN(t) >= 3
    ),
    counts AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    )
    SELECT i.doc_a, i.doc_b,
           CAST(i.n_common AS DOUBLE)
             / CAST(ca.n + cb.n - i.n_common AS DOUBLE) AS jaccard
    FROM inter i
    JOIN counts ca ON i.doc_a = ca.doc_id
    JOIN counts cb ON i.doc_b = cb.doc_id
"""


def _shingle_inter_counts(
    spark: SparkSession, sf_dir: str, max_doc_id: int | None
) -> tuple[DataFrame, DataFrame]:
    """The shared all-pairs skeleton of the exact-baseline set measures:
    co-shingled pair intersections ``inter(doc_a, doc_b, n_common)`` plus
    per-doc shingle counts — _jaccard_pairs and dedup_containment_pairs
    differ only in the final measure over these two frames (r13 review:
    the skeleton was duplicated, so a cap/distinctness change in one
    silently diverged the other)."""
    sh = shingle_pairs(spark, sf_dir, max_doc_id=max_doc_id)
    counts = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return inter, counts


def _jaccard_pairs(
    spark: SparkSession,
    sf_dir: str,
    max_doc_id: int | None = None,
) -> DataFrame:
    """Exact shingle-Jaccard for all co-shingled pairs of the (capped)
    baseline block — the quadratic join deliberately runs ONLY here. The
    production path re-ranks LSH candidates via the h0-keyed, broadcast-
    pruned `_jaccard_from_hashed` instead (a former `candidates` parameter
    here was dead code pointing maintainers at a slower string-keyed
    re-rank, r13 review)."""
    inter, counts = _shingle_inter_counts(spark, sf_dir, max_doc_id)
    ca = counts.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("n_a"))
    cb = counts.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("n_b"))
    return (
        inter.join(ca, "doc_a")
        .join(cb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("n_common").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")).cast("double")
            ).alias("jaccard"),
        )
    )


@query(
    "dedup_exact",
    oracle="""
    SELECT MIN(doc_id) AS keeper_doc_id, COUNT(*) AS n_copies, MD5(text) AS content_hash
    FROM documents
    GROUP BY text
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on content, keep the lowest doc_id. One
    shuffle keyed by the content hash — at 100 TB, group on md5(text), never
    on the raw text bytes."""
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy(F.md5(F.encode(F.col("text"), "UTF-8")).alias("content_hash")).agg(
        F.min("doc_id").alias("keeper_doc_id"), F.count(F.lit(1)).alias("n_copies")
    ).select("keeper_doc_id", "n_copies", "content_hash")


@query(
    "dedup_ngram_jaccard",
    oracle=f"""
    {_jaccard_sql_base(EXACT_BASELINE_MAX_DOCS)}
    ORDER BY jaccard DESC, i.doc_a, i.doc_b
    LIMIT 100
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-word-shingle Jaccard, top-100 most similar pairs. This is the
    *exact* near-dup measure the MinHash path approximates; quadratic in
    co-shingled docs, so the registered form bounds its input to the first
    EXACT_BASELINE_MAX_DOCS ids (see the constant's note) — at production
    scale the exact measure is only ever run on LSH candidates, via the
    h0-keyed broadcast-pruned `_jaccard_from_hashed` (as dedup_minhash_lsh
    does)."""
    return (
        _jaccard_pairs(spark, sf_dir, max_doc_id=EXACT_BASELINE_MAX_DOCS)
        .orderBy(F.desc("jaccard"), "doc_a", "doc_b")
        .limit(100)
    )


def minhash_signatures(hashed: DataFrame) -> DataFrame:
    """(doc_id, h0=hashed shingle) → one signature row per doc
    (doc_id, h0..h{N_MINHASHES-1}): each column the MIN of a universal hash
    (a*h + b mod P) over the doc's shingle hashes. Shared by the banding
    fold below and the estimator-quality query that compares signature
    agreement against exact Jaccard."""
    hm = F.col("h0") % MINHASH_P
    return hashed.groupBy("doc_id").agg(
        *[
            F.min((F.lit(a) * hm + F.lit(b)) % MINHASH_P).alias(f"h{i}")
            for i, (a, b) in enumerate(MINHASH_AB)
        ]
    )


def band_hashes(hashed: DataFrame | None = None, sig: DataFrame | None = None) -> DataFrame:
    """(doc_id, h0=hashed shingle) → stacked LSH band table
    (doc_id, band_idx, band_hash): 32 universal-hash minhashes folded into
    N_BANDS band hashes (Horner fold mod P), exploded one row per band.
    Shared by the batch near-dup query, the incremental (streaming) deduper,
    and — term for term — the DuckDB oracle SQL. Band-hash collisions across
    genuinely different signatures (~birthday over 2^31) only add candidate
    pairs, which the exact-Jaccard re-rank then discards.

    Pass ``sig`` (a precomputed minhash_signatures frame) to fold from it
    directly — a caller that needs both signatures and bands (the estimator
    -quality audit) should aggregate the big shingle table ONCE and share
    the result, not pay the 32-min groupBy twice."""
    if sig is None:
        sig = minhash_signatures(hashed)
    band_cols = []
    for b in range(N_BANDS):
        acc: Column = F.lit(7)
        for r in range(ROWS_PER_BAND):
            acc = (acc * 131 + F.col(f"h{b * ROWS_PER_BAND + r}")) % MINHASH_P
        band_cols.append(acc.alias(f"band{b}"))
    bands = sig.select("doc_id", *band_cols)
    return bands.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band_idx"), F.col(f"band{b}").alias("band_hash"))
                    for b in range(N_BANDS)
                ]
            )
        ).alias("bh"),
    ).select("doc_id", "bh.band_idx", "bh.band_hash")


def _band_candidates(sig: DataFrame) -> DataFrame:
    """Distinct band-join candidate pairs (doc_a < doc_b) from a minhash
    signature frame — the LSH candidate build shared by the verified-pair
    builder (`_minhash_lsh_jaccard`), the signature-gated variants
    (`_signature_gated_candidates`) and the A/B probe script (r11 PLANS.md
    deferred consolidation: one Spark-side copy, mirroring the oracle
    side's single `_minhash_cand_ctes`). Callers choose the
    materialization policy (persist vs localCheckpoint) to match their
    consumer count."""
    stacked = band_hashes(sig=sig)
    left = stacked.select(F.col("doc_id").alias("doc_a"), "band_idx", "band_hash")
    right = stacked.select(F.col("doc_id").alias("doc_b"), "band_idx", "band_hash")
    return (
        left.join(right, ["band_idx", "band_hash"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .dropDuplicates()
    )


def _signature_agreement(pairs: DataFrame, sig: DataFrame) -> DataFrame:
    """``pairs`` with the matching-component count of the two docs'
    signatures appended as ``n_match`` — two pair-sized equi-joins against
    the materialized signature frame, the arithmetic every signature gate
    and the estimator-quality audit threshold on. Preserves the caller's
    extra columns.

    Each side ships its signature as ONE array<int> column (minhash values
    are mod 2^31-1, so the int32 cast is exact) instead of 32 long
    columns: at 30M candidates the agreement join is shuffle-bound, and
    halving the payload measured 1.6× faster at sf≈10 (warm 4.6 → 2.9 s;
    the zip_with/aggregate fold also beat the unrolled 32-term WHEN chain,
    consistent with the HOF-vs-unrolled result in the verify notes).
    Values are bit-identical either way, so the oracle SQL is untouched."""
    arr = F.array(*[F.col(f"h{i}").cast("int") for i in range(N_MINHASHES)])
    sig_a = sig.select(F.col("doc_id").alias("doc_a"), arr.alias("_sig_a"))
    sig_b = sig.select(F.col("doc_id").alias("doc_b"), arr.alias("_sig_b"))
    n_match = F.aggregate(
        F.zip_with("_sig_a", "_sig_b", lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    return (
        pairs.join(sig_a, "doc_a")
        .join(sig_b, "doc_b")
        .select(*pairs.columns, n_match.alias("n_match"))
    )


def hashed_shingles(docs: DataFrame, normalize: bool = False) -> DataFrame:
    """(doc_id, text) → (doc_id, h0): distinct shingles hashed once to longs.
    ``normalize=True`` canonicalizes whitespace before shingling."""
    text = normalize_ws(F.col("text")) if normalize else F.col("text")
    return docs.select(
        "doc_id", F.explode(word_shingles(text)).alias("shingle")
    ).select("doc_id", shingle_h0(F.col("shingle")).alias("h0"))


def _minhash_cand_ctes() -> str:
    """The MinHash+LSH pipeline THROUGH candidate generation as a DuckDB
    CTE chain: sh → hashed → sig → bands → cand(doc_a, doc_b). Possible
    because every hash is md5-or-modular-arithmetic (see MINHASH_AB), so
    the oracle replicates Spark term for term. Shared by the exact-re-rank
    chain (`_minhash_scored_cte`) and the signature-agreement pre-filtered
    variant (which inserts its estimate gate between cand and the
    re-rank)."""
    P = MINHASH_P
    mins = ",\n               ".join(
        f"MIN(({a} * (h0 % {P}) + {b}) % {P}) AS m{i}"
        for i, (a, b) in enumerate(MINHASH_AB)
    )
    band_rows = []
    for b in range(N_BANDS):
        acc = "7"
        for r in range(ROWS_PER_BAND):
            acc = f"(({acc}) * 131 + m{b * ROWS_PER_BAND + r}) % {P}"
        band_rows.append(
            f"SELECT doc_id, {b} AS band_idx, {acc} AS band_hash FROM sig"
        )
    bands_union = "\n        UNION ALL\n        ".join(band_rows)
    return f"""sh AS (
        SELECT DISTINCT doc_id, u.shingle
        FROM (SELECT doc_id, STRING_SPLIT(text, ' ') AS t FROM documents),
             UNNEST(LIST_TRANSFORM(RANGE(1, LEN(t) - 1),
                                   i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS u(shingle)
        WHERE LEN(t) >= 3
    ),
    hashed AS (
        SELECT doc_id,
               CAST(('0x' || SUBSTR(MD5(shingle), 1, 15)) AS BIGINT) AS h0
        FROM sh
    ),
    sig AS (
        SELECT doc_id,
               {mins}
        FROM hashed GROUP BY doc_id
    ),
    bands AS (
        {bands_union}
    ),
    cand AS (
        SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
        FROM bands l
        JOIN bands r ON l.band_idx = r.band_idx AND l.band_hash = r.band_hash
                    AND l.doc_id < r.doc_id
    )"""


def _minhash_scored_cte() -> str:
    """The ENTIRE MinHash+LSH pipeline as a DuckDB CTE chain ending in
    ``scored(doc_a, doc_b, jaccard)``: the candidate chain above plus the
    exact h0-intersection Jaccard re-rank. Shared by the pair oracle
    (threshold 0.3) and the LSH survivors oracle (strong edges at 0.5 +
    recursive component closure)."""
    return f"""{_minhash_cand_ctes()},
    counts AS (SELECT doc_id, COUNT(*) AS n FROM hashed GROUP BY doc_id),
    inter AS (
        SELECT c.doc_a, c.doc_b, COUNT(*) AS n_common
        FROM cand c
        JOIN hashed a ON a.doc_id = c.doc_a
        JOIN hashed b ON b.doc_id = c.doc_b AND b.h0 = a.h0
        GROUP BY c.doc_a, c.doc_b
    ),
    scored AS (
        SELECT i.doc_a, i.doc_b,
               CAST(i.n_common AS DOUBLE)
                 / CAST(ca.n + cb.n - i.n_common AS DOUBLE) AS jaccard
        FROM inter i
        JOIN counts ca ON i.doc_a = ca.doc_id
        JOIN counts cb ON i.doc_b = cb.doc_id
    )"""


def _minhash_oracle_sql() -> str:
    return (
        "\n    WITH "
        + _minhash_scored_cte()
        + "\n    SELECT doc_a, doc_b, jaccard FROM scored WHERE jaccard >= 0.3"
    )


@query("dedup_minhash_lsh", oracle=_minhash_oracle_sql())
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup candidates, verified with exact Jaccard.

    shingle → md5-derived h0 → 32 universal-hash minhashes (mod 2^31-1) →
    8 bands of 4 (Horner fold) → band-hash equi-join for candidates → exact
    Jaccard re-rank on candidates only. All deterministic, all JVM-side. The
    band join replaces the all-pairs shingle join: cost is O(docs × bands),
    not O(co-shingled pairs²). Because every hash is md5/modular arithmetic
    (not xxhash64), the FULL pipeline has a DuckDB oracle — the approximate
    scale path is value-hash-checked, not just rows-counted.

    Efficiency: each shingle string is md5'd ONCE; the 32 minhash functions
    are two integer ops each, and the re-rank intersection joins on the
    60-bit h0 key — one pass over the strings, long-keyed shuffles
    everywhere else."""
    return _minhash_lsh_jaccard(spark, sf_dir, threshold=0.3).orderBy(
        F.desc("jaccard"), "doc_a", "doc_b"
    )


def _minhash_lsh_jaccard(
    spark: SparkSession,
    sf_dir: str,
    threshold: float,
    return_signatures: bool = False,
) -> DataFrame | tuple[DataFrame, DataFrame]:
    """The MinHash+LSH verified-pair builder behind dedup_minhash_lsh,
    dedup_survivors_lsh and the estimator-quality audit: band-join
    candidates re-ranked by exact Jaccard, returned as an eagerly
    checkpointed (doc_a, doc_b, jaccard) frame with ``jaccard >=
    threshold``. Checkpointing materializes the small result so the big
    shared shingle-hash cache can be released before returning. With
    ``return_signatures`` also returns the per-doc minhash signature table
    (checkpointed): the audit reuses the SAME aggregation the banding was
    folded from rather than re-running the 32-min groupBy (r6 verdict #5).
    """
    # persist() the shared shingle-hash table for the DURATION OF THE BUILD
    # only: the small final result is eagerly checkpointed below, then the
    # cache is released in the finally — full reuse across the four
    # consumers (banding, counts, both re-rank sides) with zero SQL-cache
    # residue after the query returns. (An eager localCheckpoint here
    # materialized the full exploded table as a standalone job first and
    # cost ~40% wall-clock at sf0.1.)
    hashed = shingle_pairs(spark, sf_dir).select(
        "doc_id", shingle_h0(F.col("shingle")).alias("h0")
    ).persist()
    candidates = None
    try:
        sig = minhash_signatures(hashed)
        if return_signatures:
            # one doc-bounded row per doc; materialized so it survives the
            # cache release AND so the banding below folds from it for free
            sig = sig.localCheckpoint(eager=True)
        # cached: the candidate set feeds THREE consumers inside the
        # re-rank (the broadcast doc-id prune + both sides of the
        # intersection join) — without the cache each consumer re-executes
        # the band self-join. persist (not localCheckpoint): released in
        # the finally, so repeated invocations don't accumulate
        # block-manager residue
        candidates = _band_candidates(sig).persist()
        # Exact-Jaccard re-rank on candidates only (_jaccard_from_hashed
        # broadcast-semi-prunes the shingle table to candidate docs first:
        # without that, both re-rank joins shuffle EVERY doc's shingles
        # only to drop the non-candidates at the join — at sf≈10 that is
        # the dominant shuffle of the whole query, r6 verdict #5)
        pairs = (
            _jaccard_from_hashed(hashed, candidates)
            .filter(F.col("jaccard") >= threshold)
            .localCheckpoint(eager=True)
        )
        return (pairs, sig) if return_signatures else pairs
    finally:
        if candidates is not None:
            candidates.unpersist()
        hashed.unpersist()


SIMHASH_BITS = 60  # md5-derived 60-bit token hashes (see shingle_h0)


def _simhash_sql_core() -> str:
    """Shared CTE chain: tokens → md5 60-bit hashes → per-bit ±1 votes →
    simhash value. Bit b of h is (h // 2^b) % 2 — pure integer arithmetic,
    identical in both engines."""
    votes = ",\n               ".join(
        f"SUM(CASE WHEN (h // {2**b}) % 2 = 1 THEN 1 ELSE -1 END) AS v{b}"
        for b in range(SIMHASH_BITS)
    )
    build = " + ".join(
        f"CASE WHEN v{b} > 0 THEN {2**b} ELSE 0 END" for b in range(SIMHASH_BITS)
    )
    return f"""tok AS (
        SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS token FROM documents
    ),
    hashed AS (
        SELECT doc_id, CAST(('0x' || SUBSTR(MD5(token), 1, 15)) AS BIGINT) AS h
        FROM tok
    ),
    votes AS (
        SELECT doc_id,
               {votes}
        FROM hashed GROUP BY doc_id
    ),
    sim AS (
        SELECT doc_id, CAST({build} AS BIGINT) AS simhash FROM votes
    )"""


@query("dedup_simhash", oracle=f"WITH {_simhash_sql_core()}\n    SELECT doc_id, simhash FROM sim")
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """60-bit SimHash per document from md5-derived token hashes: per bit,
    sum +1/-1 weighted votes across tokens, bit = 1 when the vote is
    positive. A single groupBy(doc_id) with 60 conditional-sum aggregates —
    fully codegen'd — and, because the token hash is md5-based, the whole
    fingerprint is recomputed and value-checked by the DuckDB oracle."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("token"))
    hashed = tok.select("doc_id", shingle_h0(F.col("token")).alias("h"))
    votes = hashed.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), bit).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"v{bit}")
            for bit in range(SIMHASH_BITS)
        ]
    )
    simhash = votes.select(
        "doc_id",
        sum(
            [
                F.when(F.col(f"v{bit}") > 0, F.lit(2**bit).cast("long")).otherwise(0)
                for bit in range(SIMHASH_BITS)
            ],
            F.lit(0).cast("long"),
        ).alias("simhash"),
    )
    return simhash


# probe-side chunk count for the packed all-pairs baseline below: bounds
# Arrow row size (cap/PAIR_BUCKETS vectors per chunk) and sets the tile
# parallelism; each tile is one numpy compute over chunk x block.
# Python-worker memory scales with EXACT_BASELINE_MAX_DOCS × (rows per Arrow
# batch): every chunk row carries its own copy of the broadcast block
# (~cap×64 floats ≈ 2.5 MB at the current cap), so the builder repartitions
# the 32 chunk rows across 32 tasks to keep each Arrow batch at ~1 block
# copy (ADVICE r5). Raising the cap raises the per-batch footprint linearly.
PAIR_BUCKETS = 32


@query(
    "dedup_embedding_cosine",
    oracle=f"""
    WITH v AS (
        SELECT vec_id, embedding,
               LIST_SUM(LIST_TRANSFORM(RANGE(1, LEN(embedding) + 1),
                        i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))) AS nsq
        FROM embeddings
        WHERE vec_id < {EXACT_BASELINE_MAX_DOCS}
    )
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           LIST_SUM(LIST_TRANSFORM(RANGE(1, LEN(a.embedding) + 1),
                    i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
             / (SQRT(a.nsq) * SQRT(b.nsq)) AS cosine
    FROM v a JOIN v b ON a.vec_id < b.vec_id
    ORDER BY cosine DESC, vec_a, vec_b
    LIMIT 20
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup: top-20 most-cosine-similar pairs over the capped
    (≤ EXACT_BASELINE_MAX_DOCS) baseline block; the scale path for the
    uncapped corpus is LSH bucketing / IVF (operators/similarity.py).

    Execution is the bucket-packed matrix form, not a pair join: the capped
    block is (1) packed whole into a single broadcast row (≤ cap×64 floats
    ≈ 2.5 MB — bounded by the same constant that caps the scan) and
    (2) grouped into PAIR_BUCKETS probe chunks; each chunk × block distance
    tile is computed inside one Arrow batch with numpy, and only each
    tile's top-20 pairs leave Python, so the final TakeOrdered sees
    PAIR_BUCKETS×20 rows instead of the O(n²) pair set. A pair join with
    per-pair zip_with/aggregate folds was measured 15× slower at sf0.1
    (12.1 s → this form, interpreted HOF per element vs one vectorized
    tile per bucket).

    Bit-exactness vs the unchanged oracle: the dim-axis accumulation runs
    as an explicit left-to-right loop (acc = acc + v_j*m_j in float64), the
    identical rounding sequence to DuckDB's LIST_SUM fold and the engine's
    own functions/vectors.py `dot`; cosine applies the same
    dot/(sqrt·sqrt) expression, so every tile value matches the oracle to
    the last bit and the top-20 cut is deterministic (ties broken on
    vec_a, vec_b)."""
    import numpy as np
    import pandas as pd

    e = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < EXACT_BASELINE_MAX_DOCS)
        .select("vec_id", "embedding")
    )
    block = e.agg(F.collect_list(F.struct("vec_id", "embedding")).alias("mat"))
    chunks = e.groupBy((F.col("vec_id") % PAIR_BUCKETS).alias("bucket")).agg(
        F.collect_list(F.struct("vec_id", "embedding")).alias("chunk")
    )
    # one chunk row per task: each row's Arrow batch then materializes ONE
    # copy of the ~2.5 MB block in the Python worker instead of up to 32
    # (hash collisions can co-locate a couple of buckets — still bounded)
    packed = chunks.repartition(PAIR_BUCKETS, "bucket").join(F.broadcast(block))

    def _unpack(arr) -> tuple[np.ndarray, np.ndarray]:
        ids = np.fromiter((r["vec_id"] for r in arr), dtype=np.int64, count=len(arr))
        vecs = np.array([r["embedding"] for r in arr], dtype=np.float32).astype(
            np.float64
        )
        return ids, vecs

    def _seq_nsq(m: np.ndarray) -> np.ndarray:
        # left-to-right fold of squares, same rounding sequence as norm_sq
        acc = np.zeros(m.shape[0])
        for j in range(m.shape[1]):
            acc = acc + m[:, j] * m[:, j]
        return acc

    def tile_topk(batches):
        for pdf in batches:
            for _, row in pdf.iterrows():
                ids_c, V = _unpack(row["chunk"])
                ids_m, M = _unpack(row["mat"])
                # dim-axis fold: acc_j = acc_{j-1} + v_j*m_j, float64 —
                # the exact rounding order of aggregate(zip_with(...))
                acc = np.zeros((V.shape[0], M.shape[0]))
                for j in range(V.shape[1]):
                    acc = acc + V[:, j, None] * M[None, :, j]
                cos = acc / (
                    np.sqrt(_seq_nsq(V))[:, None] * np.sqrt(_seq_nsq(M))[None, :]
                )
                ai, bi = np.nonzero(ids_c[:, None] < ids_m[None, :])
                tile = pd.DataFrame(
                    {"vec_a": ids_c[ai], "vec_b": ids_m[bi], "cosine": cos[ai, bi]}
                )
                yield tile.sort_values(
                    ["cosine", "vec_a", "vec_b"], ascending=[False, True, True]
                ).head(20)

    res = packed.mapInPandas(tile_topk, "vec_a long, vec_b long, cosine double")
    return res.orderBy(F.desc("cosine"), "vec_a", "vec_b").limit(20)


# Shared recursive-closure CTE: exact-Jaccard strong edges (≥ 0.5) over the
# capped doc prefix → min-label components. Reused by the cluster-extraction
# oracle AND the survivor-corpus oracle below, so both stay term-for-term
# equivalent to the same Spark label-propagation kernel.
_CC_ORACLE_CTE = f"""
    WITH RECURSIVE sh AS (
        SELECT DISTINCT doc_id, u.shingle
        FROM (SELECT doc_id, STRING_SPLIT(text, ' ') AS t FROM documents
              WHERE doc_id < {EXACT_BASELINE_MAX_DOCS}),
             UNNEST(LIST_TRANSFORM(RANGE(1, LEN(t) - 1),
                                   i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS u(shingle)
        WHERE LEN(t) >= 3
    ),
    counts AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    ),
    strong AS (
        SELECT i.doc_a, i.doc_b
        FROM inter i
        JOIN counts ca ON i.doc_a = ca.doc_id
        JOIN counts cb ON i.doc_b = cb.doc_id
        WHERE CAST(i.n_common AS DOUBLE)
              / CAST(ca.n + cb.n - i.n_common AS DOUBLE) >= 0.5
    ),
    edges AS (
        SELECT doc_a AS src, doc_b AS dst FROM strong
        UNION ALL
        SELECT doc_b AS src, doc_a AS dst FROM strong
    ),
    lab(node, label) AS (
        SELECT DISTINCT src, src FROM edges
        UNION
        SELECT e.dst, l.label FROM lab l JOIN edges e ON e.src = l.node
    ),
    comp AS (SELECT node AS doc_id, MIN(label) AS cluster_id FROM lab GROUP BY node)"""


@query(
    "dedup_connected_components",
    oracle=_CC_ORACLE_CTE
    + """
    SELECT c.doc_id, c.cluster_id, s.cluster_size
    FROM comp c
    JOIN (SELECT cluster_id, COUNT(*) AS cluster_size
          FROM comp GROUP BY cluster_id) s USING (cluster_id)
    """,
)
def dedup_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-CLUSTER extraction: near-dup pairs (exact 3-shingle Jaccard
    ≥ 0.5) as an undirected graph; each doc labeled with the minimum doc_id
    reachable from it (its connected component) plus the component size —
    the keeper-selection step of a dedup pipeline (cluster_id IS the keeper).

    Distributed min-label propagation: per iteration, every node takes the
    min of its own label and its neighbors' labels — one equi-join + groupBy
    per round, converging in O(component diameter) rounds (near-dup clusters
    are shallow; capped at 20 with an early-exit count, so shallow graphs
    never pay the cap: sf0.1 converges in 2 rounds, the second being the
    zero-change fixed-point proof). The oracle is the equivalent
    recursive-CTE label closure in DuckDB. At 100 TB this is the standard
    alternating large/small-star shape: no driver-side graph, edges
    shuffled on node id only.

    Observability: the executed round count is recorded after each run as
    ``dedup_connected_components.last_rounds`` and logged at INFO — the
    result schema itself is pinned by the oracle, so the metric rides on
    the function, mirroring how the CDC kernel exposes its counters
    (operators/cdc_apply.py) rather than widening data schemas.
    """
    comp, n_rounds = _exact_strong_components(spark, sf_dir)
    # executed-round observability (VERDICT r4 #5): ride on the function,
    # not the oracle-pinned result schema
    dedup_connected_components.last_rounds = n_rounds
    logging.getLogger(__name__).info(
        "dedup_connected_components converged in %d rounds", n_rounds
    )
    sizes = comp.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("cluster_size"))
    return comp.join(sizes, "cluster_id").select("doc_id", "cluster_id", "cluster_size")


def _strong_edges_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE strong-edge definition of the exact-baseline cluster family —
    exact Jaccard >= 0.5 over the capped block, the single Spark-side twin
    of _CC_ORACLE_CTE's edge set. One definition only (r13 review: the
    cluster query and the histogram each built it inline, so a threshold
    or cap change in one silently diverged the other from their SHARED
    oracle CTE)."""
    return (
        _jaccard_pairs(spark, sf_dir, max_doc_id=EXACT_BASELINE_MAX_DOCS)
        .filter(F.col("jaccard") >= 0.5)
        .select("doc_a", "doc_b")
    )


def _exact_strong_components(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, int]:
    """Label-propagation components over the shared exact strong edges —
    the kernel the cluster query, both survivor policies, and the
    histogram compose. Returns (comp(doc_id, cluster_id), rounds). The
    survivor queries call THIS rather than dedup_connected_components:
    that query's cluster_size groupBy+join was pure discarded work for
    them, and its rounds metric was being overwritten under the wrong
    query's name (r13 review)."""
    return _min_label_components(_strong_edges_exact(spark, sf_dir))


def _min_label_components(strong: DataFrame) -> tuple[DataFrame, int]:
    """Min-label connected components of the undirected graph given as
    ``strong(doc_a, doc_b)`` edges: the distributed label-propagation
    kernel shared by the exact-baseline cluster/survivor queries and the
    uncapped LSH survivors path. Returns an eagerly checkpointed
    ``(doc_id, cluster_id)`` frame (nodes with at least one edge only) and
    the executed round count; all intermediate caches are released before
    returning."""
    edges = (
        strong.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .unionByName(
            strong.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
        )
        .persist()
    )
    # Round 1 folded into the label initialization (r16, guide §2.4): with
    # every label seeded as the node id itself, round 1's neighbor-min is
    # just min(dst) per src — one groupBy over the edge table computes the
    # round-1 labels directly, saving the first round's edges⋈labels join
    # (the edge build's first materialization rides on this job instead).
    # Identical to the unfolded round 1: every node in the frame has ≥1
    # edge, so the old coalesce(nlabel, label) never fired there.
    max_rounds = 20
    labels = (
        edges.groupBy("src")
        .agg(F.least(F.col("src"), F.min("dst")).alias("label"))
        .select(
            F.col("src").alias("node"),
            "label",
            (F.col("label") != F.col("src")).alias("chg"),
        )
        .persist()
    )
    changed = labels.filter(F.col("chg")).count()
    n_rounds = 1
    while changed and n_rounds < max_rounds:
        n_rounds += 1
        neighbor_min = (
            edges.join(labels, edges.dst == labels.node)
            .groupBy("src")
            .agg(F.min("label").alias("nlabel"))
        )
        # fold the convergence test into the update: carry a per-row changed
        # flag instead of re-joining new vs old labels (one fewer join+job
        # per round)
        new_labels = (
            labels.join(neighbor_min, labels.node == neighbor_min.src, "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("nlabel"), F.col("label"))
                ).alias("new_label"),
                F.col("label").alias("old_label"),
            )
            .select(
                "node",
                F.col("new_label").alias("label"),
                (F.col("new_label") != F.col("old_label")).alias("chg"),
            )
            .persist()
        )
        changed = new_labels.filter(F.col("chg")).count()
        labels.unpersist()
        # keep the PERSISTED frame itself (unpersist must see the cached
        # plan); the extra chg column is ignored by the next round's joins
        # and dropped by the terminal select
        labels = new_labels
    if changed:
        # the oracle computes the FULL recursive closure — exiting the cap
        # with labels still moving would silently disagree with it. Release
        # the pinned caches before propagating (the caller never gets a
        # handle to them).
        labels.unpersist()
        edges.unpersist()
        raise RuntimeError(
            f"connected components did not converge in {max_rounds} rounds "
            f"({changed} labels still changing): component diameter exceeds "
            f"the cap; raise max_rounds (plain propagation needs O(diameter) "
            f"rounds; for pathological chains switch to large/small-star)"
        )

    # terminal cache hygiene: localCheckpoint materializes the final labels
    # and TRUNCATES the 20-join lineage, so the pinned SQL caches can be
    # released here instead of leaking until someone calls clearCache().
    # (checkpoint blocks are reclaimed by the ContextCleaner once the result
    # is dropped — unlike persist(), which pins until an explicit unpersist.)
    final = labels.localCheckpoint(eager=True)
    labels.unpersist()
    edges.unpersist()

    comp = final.select(F.col("node").alias("doc_id"), F.col("label").alias("cluster_id"))
    return comp, n_rounds


@query(
    "dedup_survivors",
    oracle=_CC_ORACLE_CTE
    + f"""
    SELECT d.doc_id, d.lang, CAST(d.n_chars AS INT) AS n_chars
    FROM (SELECT * FROM documents WHERE doc_id < {EXACT_BASELINE_MAX_DOCS}) d
    LEFT JOIN comp c ON c.doc_id = d.doc_id
    WHERE c.doc_id IS NULL OR c.cluster_id = d.doc_id
    """,
)
def dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end keeper selection — the corpus that actually SURVIVES
    near-dup removal: connected components over strong (exact-Jaccard ≥ 0.5)
    edges pick one keeper per duplicate cluster (the min doc_id, i.e. the
    cluster label itself); every doc outside any cluster is a singleton and
    survives untouched. This is the composition a pretraining pipeline runs,
    not just the pair/cluster report.

    Scale shape: the cluster labels come from the distributed
    label-propagation kernel above; the drop set (cluster members that are
    not their own label) anti-joins back onto `documents` on doc_id — one
    equi-shuffle, no driver materialization, output ~ corpus size minus
    duplicates. The oracle reuses the exact same recursive-closure CTE as
    the cluster query, so both verdicts come from one shared edge
    definition."""
    comp, _ = _exact_strong_components(spark, sf_dir)
    drops = comp.filter(F.col("doc_id") != F.col("cluster_id")).select("doc_id")
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < EXACT_BASELINE_MAX_DOCS
    )
    return d.join(drops, "doc_id", "left_anti").select(
        "doc_id", "lang", F.col("n_chars").cast("int").alias("n_chars")
    )


@query(
    "dedup_survivors_best_quality",
    oracle=_CC_ORACLE_CTE
    + f"""
    , keepers AS (
        SELECT c.cluster_id, d.doc_id,
               ROW_NUMBER() OVER (PARTITION BY c.cluster_id
                                  ORDER BY d.n_chars DESC, d.doc_id) AS rn
        FROM comp c JOIN documents d ON d.doc_id = c.doc_id
    ),
    drops AS (SELECT doc_id FROM keepers WHERE rn > 1)
    SELECT d.doc_id, d.lang, CAST(d.n_chars AS INT) AS n_chars
    FROM (SELECT * FROM documents WHERE doc_id < {EXACT_BASELINE_MAX_DOCS}) d
    LEFT JOIN drops x ON x.doc_id = d.doc_id
    WHERE x.doc_id IS NULL
    """,
)
def dedup_survivors_best_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-ranked keeper selection: within each near-dup cluster keep
    the HIGHEST-QUALITY member (here: longest document, ties to the smaller
    doc_id) instead of the arbitrary min-id label — what production
    pretraining dedup actually does (keep the best copy, drop the rest).
    Singletons survive untouched.

    Scale shape: adds exactly one (cluster_id) top-1 window —
    WindowGroupLimit, so each input partition ships at most one candidate
    row per cluster — on top of the shared label-propagation kernel; the
    drop set anti-joins back onto documents on doc_id. The oracle reuses
    the same recursive-closure CTE, so keeper policy is the only moving
    part."""
    from pyspark.sql import Window

    comp, _ = _exact_strong_components(spark, sf_dir)
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < EXACT_BASELINE_MAX_DOCS
    )
    ranked = comp.join(d.select("doc_id", "n_chars"), "doc_id")
    w = Window.partitionBy("cluster_id").orderBy(F.desc("n_chars"), "doc_id")
    drops = (
        ranked.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") > 1)
        .select("doc_id")
    )
    return d.join(drops, "doc_id", "left_anti").select(
        "doc_id", "lang", F.col("n_chars").cast("int").alias("n_chars")
    )


@query(
    "dedup_survivors_lsh",
    oracle="\n    WITH RECURSIVE "
    + _minhash_scored_cte()
    + """,
    strong AS (SELECT doc_a, doc_b FROM scored WHERE jaccard >= 0.5),
    edges AS (
        SELECT doc_a AS src, doc_b AS dst FROM strong
        UNION ALL
        SELECT doc_b AS src, doc_a AS dst FROM strong
    ),
    lab(node, label) AS (
        SELECT DISTINCT src, src FROM edges
        UNION
        SELECT e.dst, l.label FROM lab l JOIN edges e ON e.src = l.node
    ),
    comp AS (SELECT node AS doc_id, MIN(label) AS cluster_id FROM lab GROUP BY node)
    SELECT d.doc_id, d.lang, CAST(d.n_chars AS INT) AS n_chars
    FROM documents d
    LEFT JOIN comp c ON c.doc_id = d.doc_id
    WHERE c.doc_id IS NULL OR c.cluster_id = d.doc_id
    """,
)
def dedup_survivors_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNCAPPED keeper selection over the whole corpus — the production
    composition a pretraining pipeline actually runs at 100 TB: MinHash+LSH
    band candidates → exact-Jaccard verification (≥ 0.5 strong edges) →
    distributed min-label components → keep each cluster's label plus every
    singleton. Unlike dedup_survivors (the exact-Jaccard baseline, input-
    capped because its edge build is quadratic in co-shingled docs), every
    stage here is a bounded-fanout equi-join — O(docs x bands) candidates,
    per-candidate verification, O(diameter) label rounds — so no input cap
    is needed. The oracle replicates the FULL pipeline (the md5/modular
    minhash arithmetic is SQL-expressible) and closes the components with a
    recursive CTE, so even the approximate path is value-hash-checked
    end to end."""
    strong = _minhash_lsh_jaccard(spark, sf_dir, threshold=0.5).select(
        "doc_a", "doc_b"
    )
    comp, n_rounds = _min_label_components(strong)
    dedup_survivors_lsh.last_rounds = n_rounds
    drops = comp.filter(F.col("doc_id") != F.col("cluster_id")).select("doc_id")
    d = load_table(spark, sf_dir, "documents")
    return d.join(drops, "doc_id", "left_anti").select(
        "doc_id", "lang", F.col("n_chars").cast("int").alias("n_chars")
    )


SIMHASH_BANDS = 4  # 4 × 15-bit bands: any pair within hamming 3 shares ≥1 band
SIMHASH_MAX_HAMMING = 8


def _simhash_pairs_oracle() -> str:
    return f"""
    WITH {_simhash_sql_core()},
    bands AS (
        SELECT doc_id, simhash, i AS band_idx,
               (simhash // CAST(POWER(2, 15 * i) AS BIGINT)) % {2**15} AS band_val
        FROM sim, UNNEST(RANGE(0, {SIMHASH_BANDS})) AS t(i)
    ),
    cand AS (
        SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
        FROM bands l
        JOIN bands r ON l.band_idx = r.band_idx AND l.band_val = r.band_val
                    AND l.doc_id < r.doc_id
    )
    SELECT c.doc_a, c.doc_b,
           CAST(BIT_COUNT(XOR(sa.simhash, sb.simhash)) AS INT) AS hamming
    FROM cand c
    JOIN sim sa ON sa.doc_id = c.doc_a
    JOIN sim sb ON sb.doc_id = c.doc_b
    WHERE BIT_COUNT(XOR(sa.simhash, sb.simhash)) <= {SIMHASH_MAX_HAMMING}
    """


@query("dedup_simhash_pairs", oracle=_simhash_pairs_oracle())
def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup PAIRS: the signature table banded into 4×15-bit
    chunks; docs sharing any chunk become candidates (the pigeonhole
    guarantee: hamming ≤ 3 ⇒ some band equal; higher-distance pairs are
    recalled probabilistically); exact popcount(xor) ≤ 8 re-rank. Same
    equi-join shape as MinHash-LSH — no all-pairs product, so the candidate
    join survives web-scale corpora. md5-based hashing makes the whole chain
    oracle-checkable; also verified against brute-force hamming in tests."""
    sig = dedup_simhash(spark, sf_dir)
    stacked = sig.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_idx"),
                        F.shiftrightunsigned("simhash", 15 * b)
                        .bitwiseAND(F.lit(0x7FFF))
                        .alias("band_val"),
                    )
                    for b in range(SIMHASH_BANDS)
                ]
            )
        ).alias("bv"),
    ).select("doc_id", "simhash", "bv.band_idx", "bv.band_val")
    left = stacked.select(
        F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sig_a"), "band_idx", "band_val"
    )
    right = stacked.select(
        F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sig_b"), "band_idx", "band_val"
    )
    cands = (
        left.join(right, ["band_idx", "band_val"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sig_a", "sig_b")
        .dropDuplicates(["doc_a", "doc_b"])
    )
    return (
        cands.select(
            "doc_a",
            "doc_b",
            F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= SIMHASH_MAX_HAMMING)
        .orderBy("hamming", "doc_a", "doc_b")
    )


@query(
    "dedup_cluster_size_histogram",
    oracle=_CC_ORACLE_CTE
    + """
    SELECT s.cluster_size,
           CAST(COUNT(*) AS BIGINT) AS n_clusters,
           CAST(s.cluster_size * COUNT(*) AS BIGINT) AS n_docs
    FROM (SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS cluster_size
          FROM comp GROUP BY cluster_id) s
    GROUP BY s.cluster_size
    """,
)
def dedup_cluster_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster size distribution — the dedup run's report card:
    how many clusters of each size exist and how many documents they tie
    up. Pipelines gate on this (a sudden mass of giant clusters means a
    boilerplate leak or a crawler loop) before committing a survivor pass.

    Composes the shared min-label-propagation kernel
    (`_min_label_components`, same edges as dedup_connected_components) and
    collapses its output twice: (cluster_id) → size, (size) → histogram.
    Both rollups shrink monotonically (clusters ≤ docs, sizes ≤ clusters),
    so beyond the CC kernel itself the histogram costs two map-side-combined
    shuffles over ever-smaller frames — at 100 TB the second groupBy input
    is the cluster count, and the output is bounded by the largest cluster
    size."""
    comp, _ = _exact_strong_components(spark, sf_dir)
    sizes = comp.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("cluster_size"))
    return sizes.groupBy("cluster_size").agg(
        F.count(F.lit(1)).alias("n_clusters"),
        (F.col("cluster_size") * F.count(F.lit(1))).alias("n_docs"),
    )


def _minhash_estimate_oracle_sql() -> str:
    terms = " + ".join(
        f"(CASE WHEN a.m{i} = b.m{i} THEN 1 ELSE 0 END)" for i in range(N_MINHASHES)
    )
    return f"""
    WITH {_minhash_scored_cte()},
    m AS (
        SELECT c.doc_a, c.doc_b, {terms} AS n_match
        FROM cand c
        JOIN sig a ON a.doc_id = c.doc_a
        JOIN sig b ON b.doc_id = c.doc_b
    )
    SELECT s.doc_a, s.doc_b,
           CAST(m.n_match AS DOUBLE) / {N_MINHASHES}.0 AS est_jaccard,
           s.jaccard,
           ABS(CAST(m.n_match AS DOUBLE) / {N_MINHASHES}.0 - s.jaccard) AS abs_err
    FROM scored s
    JOIN m ON s.doc_a = m.doc_a AND s.doc_b = m.doc_b
    WHERE s.jaccard >= 0.3
    """


@query("dedup_minhash_estimate_quality", oracle=_minhash_estimate_oracle_sql())
def dedup_minhash_estimate_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-quality audit for the MinHash path: on every verified near-dup
    pair, the signature-agreement Jaccard ESTIMATE (matching minhash
    components / N_MINHASHES — the quantity LSH banding thresholds on)
    side-by-side with the exact shingle Jaccard, plus the absolute error.
    This is the query a pipeline runs before trusting a signature width:
    the error distribution tells you whether 32 components suffice for the
    corpus' similarity regime (E[err] ~ sqrt(J(1-J)/32) ≈ 0.09 at J=0.5).

    Scale shape (r6 verdict #5 rework): the verified-pair set and the
    signature table both come from the SHARED builder — one shingle-hash
    pass, one 32-min signature aggregation (the banding Horner-folds from
    it), exact Jaccard restricted to candidate docs via broadcast semi-join
    BEFORE the shingle re-rank joins. On top of that the audit itself adds
    only two doc-bounded signature joins on the verified pairs and a
    codegen'd 32-term agreement sum — its marginal cost over
    dedup_minhash_lsh is pair-set-sized, so the sf≈10 ratio is the pair
    load's, not a second pipeline's. All arithmetic is integer/modular with
    one exact division, so the oracle matches to the bit."""
    pairs, sig = _minhash_lsh_jaccard(
        spark, sf_dir, threshold=0.3, return_signatures=True
    )
    est = F.col("n_match").cast("double") / float(N_MINHASHES)
    return _signature_agreement(pairs, sig).select(
        "doc_a",
        "doc_b",
        est.alias("est_jaccard"),
        "jaccard",
        F.abs(est - F.col("jaccard")).alias("abs_err"),
    )


def _minhash_prefiltered_oracle_sql() -> str:
    terms = " + ".join(
        f"(CASE WHEN a.m{i} = b.m{i} THEN 1 ELSE 0 END)" for i in range(N_MINHASHES)
    )
    n = N_MINHASHES
    return f"""
    WITH {_minhash_cand_ctes()},
    m AS (
        SELECT c.doc_a, c.doc_b, {terms} AS n_match
        FROM cand c
        JOIN sig a ON a.doc_id = c.doc_a
        JOIN sig b ON b.doc_id = c.doc_b
    ),
    gray AS (
        SELECT doc_a, doc_b, n_match FROM m
        WHERE n_match >= {PREFILTER_MIN_MATCH} AND n_match < {ACCEPT_MIN_MATCH}
    ),
    counts AS (SELECT doc_id, COUNT(*) AS n FROM hashed GROUP BY doc_id),
    inter AS (
        SELECT g.doc_a, g.doc_b, COUNT(*) AS n_common
        FROM gray g
        JOIN hashed a ON a.doc_id = g.doc_a
        JOIN hashed b ON b.doc_id = g.doc_b AND b.h0 = a.h0
        GROUP BY g.doc_a, g.doc_b
    ),
    checked AS (
        SELECT i.doc_a, i.doc_b,
               CAST(i.n_common AS DOUBLE)
                 / CAST(ca.n + cb.n - i.n_common AS DOUBLE) AS jaccard
        FROM inter i
        JOIN counts ca ON i.doc_a = ca.doc_id
        JOIN counts cb ON i.doc_b = cb.doc_id
    )
    SELECT doc_a, doc_b,
           CAST(n_match AS DOUBLE) / {n}.0 AS est_jaccard,
           CAST(NULL AS DOUBLE) AS jaccard,
           'estimate' AS via
    FROM m WHERE n_match >= {ACCEPT_MIN_MATCH}
    UNION ALL
    SELECT g.doc_a, g.doc_b,
           CAST(g.n_match AS DOUBLE) / {n}.0 AS est_jaccard,
           c.jaccard,
           'exact' AS via
    FROM gray g
    JOIN checked c ON c.doc_a = g.doc_a AND c.doc_b = g.doc_b
    WHERE c.jaccard >= 0.3
    """


def _signature_gated_candidates(hashed: DataFrame, min_match: int) -> DataFrame:
    """Band-join candidates scored by 32-component signature agreement,
    with agreement below ``min_match`` rejected outright — the shared front
    half of both pre-filtered LSH variants (pair extraction gated at
    PREFILTER_MIN_MATCH, the survivors' strong edges at
    STRONG_PREFILTER_MIN_MATCH). One 32-min aggregation is materialized and
    feeds both the banding fold AND the two pair-sized estimate joins (same
    shared-builder shape as the estimator-quality audit); the scored result
    is eagerly checkpointed so the band self-join runs once for its up-to-
    three downstream consumers. Returns (doc_a, doc_b, n_match)."""
    sig = minhash_signatures(hashed).localCheckpoint(eager=True)
    return (
        _signature_agreement(_band_candidates(sig), sig)
        .filter(F.col("n_match") >= min_match)
        .localCheckpoint(eager=True)
    )


@query("dedup_minhash_lsh_prefiltered", oracle=_minhash_prefiltered_oracle_sql())
def dedup_minhash_lsh_prefiltered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup pairs with a SIGNATURE-AGREEMENT gate before
    the exact re-rank — the scale path for corpora where the verified-pair
    set itself is huge (r10 SCALING.md: at sf≈100 `dedup_minhash_lsh`'s
    re-rank builds a ~2.2B-row/44 GB intermediate because all 22M true
    near-dup pairs re-join their shingles; that intermediate is the
    cluster-memory term of the whole dedup family).

    Three-way gate per band-join candidate, computed from the ALREADY
    materialized 32-component signatures (two pair-sized joins, no shingle
    re-join): agreement ≥ 16/32 → accept on the estimate alone (jaccard
    NULL, via='estimate'); agreement < 7/32 → reject; the gray zone in
    between pays the exact shingle-Jaccard re-rank (via='exact', threshold
    0.3). The exact re-rank's input shrinks from every candidate to the
    borderline sliver — the ≥10× A/B in SCALING.md r11 — at a quantified
    recall trade (a true J=0.30 pair is rejected with ≈11% probability;
    see PREFILTER_MIN_MATCH). All arithmetic is integer/modular with exact
    final divisions, so DuckDB replicates the WHOLE pipeline — gates
    included — term for term (unlike most production sketches, the
    approximate path is value-checked, not rows-counted).

    Reference anchor: the reference has no dedup at all (its table is the
    CDC §2 surface); this extends the LSH family the same way
    `dedup_minhash_lsh` does, as a training-data-pipeline operator."""
    hashed = shingle_pairs(spark, sf_dir).select(
        "doc_id", shingle_h0(F.col("shingle")).alias("h0")
    ).persist()
    try:
        scored_cand = _signature_gated_candidates(hashed, PREFILTER_MIN_MATCH)
        est = (F.col("n_match").cast("double") / float(N_MINHASHES)).alias(
            "est_jaccard"
        )
        accepted = scored_cand.filter(F.col("n_match") >= ACCEPT_MIN_MATCH).select(
            "doc_a",
            "doc_b",
            est,
            F.lit(None).cast("double").alias("jaccard"),
            F.lit("estimate").alias("via"),
        )
        gray = scored_cand.filter(F.col("n_match") < ACCEPT_MIN_MATCH)
        # exact re-rank on the gray sliver only — same candidate-pruned
        # h0-intersection machinery as dedup_minhash_lsh
        gray_checked = _jaccard_from_hashed(hashed, gray.select("doc_a", "doc_b"))
        gray_kept = (
            gray.join(gray_checked, ["doc_a", "doc_b"])
            .filter(F.col("jaccard") >= 0.3)
            .select("doc_a", "doc_b", est, "jaccard", F.lit("exact").alias("via"))
        )
        return accepted.unionByName(gray_kept).localCheckpoint(eager=True)
    finally:
        hashed.unpersist()


def _jaccard_from_hashed(hashed: DataFrame, candidates: DataFrame) -> DataFrame:
    """Exact h0-intersection Jaccard for the given candidate pairs:
    broadcast-semi-prune the shingle-hash table to candidate docs, pack each
    candidate doc's shingle hashes into ONE array row, then attach both
    pairs' arrays and intersect map-side — cost O(|candidates| ×
    shingles/doc), the `_minhash_lsh_jaccard` re-rank extracted for reuse
    by the pre-filtered variants. Returns (doc_a, doc_b, jaccard).

    r16 optimization (guide §2.4): the former shape — per-pair h0
    intersection JOIN + its groupBy + a separate per-doc count aggregate +
    two count-attach joins — spent ~6 post-prune stages on a candidate set
    that is tiny next to the corpus. The packed form is one groupBy + two
    pair-keyed joins + a map-side array_intersect: measured 1.37 → 0.84 s
    (best-of-5, warm) on dedup_minhash_lsh's re-rank at sf0.1, bit-equal
    output on all 256 pairs. Values are unchanged because each doc's h0
    set is distinct (word_shingles array_distinct + 60-bit h0), so
    |array_intersect| equals the h0-equijoin match count and n_a/n_b equal
    the array sizes; the double arithmetic is the same expression. The
    per-doc array rows shuffle through the two pair joins instead of
    exploded h0 rows through one — the same bytes, fewer stages."""
    cand_ids = (
        candidates.select(F.col("doc_a").alias("doc_id"))
        .unionByName(candidates.select(F.col("doc_b").alias("doc_id")))
        .dropDuplicates()
    )
    sh = hashed.join(F.broadcast(cand_ids), "doc_id", "left_semi")
    sets = sh.groupBy("doc_id").agg(F.collect_list("h0").alias("hs"))
    a = sets.select(F.col("doc_id").alias("doc_a"), F.col("hs").alias("hs_a"))
    b = sets.select(F.col("doc_id").alias("doc_b"), F.col("hs").alias("hs_b"))
    return (
        candidates.join(a, "doc_a")
        .join(b, "doc_b")
        .withColumn("n_common", F.size(F.array_intersect("hs_a", "hs_b")))
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("n_common").cast("double")
                / (F.size("hs_a") + F.size("hs_b") - F.col("n_common")).cast("double")
            ).alias("jaccard"),
        )
    )


def _survivors_prefiltered_oracle_sql() -> str:
    terms = " + ".join(
        f"(CASE WHEN a.m{i} = b.m{i} THEN 1 ELSE 0 END)" for i in range(N_MINHASHES)
    )
    return f"""
    WITH RECURSIVE {_minhash_cand_ctes()},
    m AS (
        SELECT c.doc_a, c.doc_b, {terms} AS n_match
        FROM cand c
        JOIN sig a ON a.doc_id = c.doc_a
        JOIN sig b ON b.doc_id = c.doc_b
    ),
    gray AS (
        SELECT doc_a, doc_b FROM m
        WHERE n_match >= {STRONG_PREFILTER_MIN_MATCH}
          AND n_match < {STRONG_ACCEPT_MIN_MATCH}
    ),
    counts AS (SELECT doc_id, COUNT(*) AS n FROM hashed GROUP BY doc_id),
    inter AS (
        SELECT g.doc_a, g.doc_b, COUNT(*) AS n_common
        FROM gray g
        JOIN hashed a ON a.doc_id = g.doc_a
        JOIN hashed b ON b.doc_id = g.doc_b AND b.h0 = a.h0
        GROUP BY g.doc_a, g.doc_b
    ),
    checked AS (
        SELECT i.doc_a, i.doc_b,
               CAST(i.n_common AS DOUBLE)
                 / CAST(ca.n + cb.n - i.n_common AS DOUBLE) AS jaccard
        FROM inter i
        JOIN counts ca ON i.doc_a = ca.doc_id
        JOIN counts cb ON i.doc_b = cb.doc_id
    ),
    strong AS (
        SELECT doc_a, doc_b FROM m WHERE n_match >= {STRONG_ACCEPT_MIN_MATCH}
        UNION ALL
        SELECT doc_a, doc_b FROM checked WHERE jaccard >= 0.5
    ),
    edges AS (
        SELECT doc_a AS src, doc_b AS dst FROM strong
        UNION ALL
        SELECT doc_b AS src, doc_a AS dst FROM strong
    ),
    lab(node, label) AS (
        SELECT DISTINCT src, src FROM edges
        UNION
        SELECT e.dst, l.label FROM lab l JOIN edges e ON e.src = l.node
    ),
    comp AS (SELECT node AS doc_id, MIN(label) AS cluster_id FROM lab GROUP BY node)
    SELECT d.doc_id, d.lang, CAST(d.n_chars AS INT) AS n_chars
    FROM documents d
    LEFT JOIN comp c ON c.doc_id = d.doc_id
    WHERE c.doc_id IS NULL OR c.cluster_id = d.doc_id
    """


@query("dedup_survivors_lsh_prefiltered", oracle=_survivors_prefiltered_oracle_sql())
def dedup_survivors_lsh_prefiltered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNCAPPED keeper selection with the signature-agreement gate on the
    strong-edge build — `dedup_survivors_lsh` with its one remaining scale
    wall removed. The unfiltered survivors path exact-re-ranks EVERY band
    candidate to find J >= 0.5 edges, so at sf≈100 it pays the same
    ~44 GB candidate×shingles intermediate the pair query did before r11's
    prefilter (SCALING.md). Here the edge set is gated from the already
    materialized signatures instead: agreement >= 22/32 becomes a strong
    edge on the estimate alone, < 10/32 is rejected outright, and only the
    gray sliver in between pays the exact shingle-Jaccard re-rank at 0.5
    (calibration + recall trade at STRONG_PREFILTER_MIN_MATCH). Components
    and keeper policy are unchanged: distributed min-label propagation,
    keep each cluster's label plus every singleton.

    All gate arithmetic is integer/modular, so the DuckDB oracle replicates
    the WHOLE gated pipeline — gates, gray re-rank, recursive closure —
    term for term: the traded answer is value-hash-checked, not
    rows-counted.

    Reference anchor: the reference has no dedup (its table is the CDC §2
    surface); this is the 100 TB-scale form of the survivors composition a
    pretraining pipeline runs."""
    hashed = shingle_pairs(spark, sf_dir).select(
        "doc_id", shingle_h0(F.col("shingle")).alias("h0")
    ).persist()
    try:
        scored_cand = _signature_gated_candidates(
            hashed, STRONG_PREFILTER_MIN_MATCH
        )
        accepted = scored_cand.filter(
            F.col("n_match") >= STRONG_ACCEPT_MIN_MATCH
        ).select("doc_a", "doc_b")
        gray = scored_cand.filter(
            F.col("n_match") < STRONG_ACCEPT_MIN_MATCH
        ).select("doc_a", "doc_b")
        gray_kept = (
            _jaccard_from_hashed(hashed, gray)
            .filter(F.col("jaccard") >= 0.5)
            .select("doc_a", "doc_b")
        )
        # edge-set-sized; materialized so the shingle cache releases before
        # the label-propagation rounds start re-reading the edges
        strong = accepted.unionByName(gray_kept).localCheckpoint(eager=True)
    finally:
        hashed.unpersist()
    comp, n_rounds = _min_label_components(strong)
    dedup_survivors_lsh_prefiltered.last_rounds = n_rounds
    drops = comp.filter(F.col("doc_id") != F.col("cluster_id")).select("doc_id")
    d = load_table(spark, sf_dir, "documents")
    return d.join(drops, "doc_id", "left_anti").select(
        "doc_id", "lang", F.col("n_chars").cast("int").alias("n_chars")
    )


def _containment_sql_base(max_doc_id: int | None = None) -> str:
    """Shingle-containment CTE chain — same sh/counts/inter skeleton as
    `_jaccard_sql_base`, but the final measure divides the intersection by
    the SMALLER shingle set: C(a,b) = |Sa ∩ Sb| / min(|Sa|, |Sb|)."""
    cap = f"AND doc_id < {max_doc_id}" if max_doc_id is not None else ""
    return f"""
    WITH sh AS (
        SELECT DISTINCT doc_id, u.shingle
        FROM (SELECT doc_id, STRING_SPLIT(text, ' ') AS t FROM documents
              WHERE TRUE {cap}),
             UNNEST(LIST_TRANSFORM(RANGE(1, LEN(t) - 1),
                                   i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS u(shingle)
        WHERE LEN(t) >= 3
    ),
    counts AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    )
    SELECT i.doc_a, i.doc_b,
           CAST(i.n_common AS BIGINT) AS n_common,
           CAST(i.n_common AS DOUBLE)
             / CAST(LEAST(ca.n, cb.n) AS DOUBLE) AS containment
    FROM inter i
    JOIN counts ca ON i.doc_a = ca.doc_id
    JOIN counts cb ON i.doc_b = cb.doc_id
"""


@query(
    "dedup_containment_pairs",
    oracle=f"""
    {_containment_sql_base(EXACT_BASELINE_MAX_DOCS)}
    ORDER BY containment DESC, i.doc_a, i.doc_b
    LIMIT 100
    """,
)
def dedup_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric shingle CONTAINMENT, top-100 pairs: |Sa ∩ Sb| divided by
    the smaller set — the quote/subset detector Jaccard misses. A short
    document fully embedded in a long one (a quoted paragraph, a
    boilerplate header, a chunk re-packed into a larger page) scores
    containment ≈ 1 while its Jaccard stays near |small|/|large| ≈ 0, so
    symmetric near-dup passes never surface it; containment is the measure
    curation uses for partial-duplication and quote-chain screening
    (Broder's original resemblance/containment pair).

    Same quadratic-by-nature shape as dedup_ngram_jaccard, so the
    registered form carries the identical EXACT_BASELINE_MAX_DOCS input cap
    (see that constant's note) and composes the SAME `_shingle_inter_counts`
    skeleton — only the final measure differs; the production path at
    scale computes this measure per LSH candidate pair via an h0-keyed
    re-rank (the `_jaccard_from_hashed` shape with a `least` denominator)."""
    inter, counts = _shingle_inter_counts(
        spark, sf_dir, max_doc_id=EXACT_BASELINE_MAX_DOCS
    )
    ca = counts.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("n_a"))
    cb = counts.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("n_b"))
    return (
        inter.join(ca, "doc_a")
        .join(cb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.col("n_common").cast("long").alias("n_common"),
            (
                F.col("n_common").cast("double")
                / F.least("n_a", "n_b").cast("double")
            ).alias("containment"),
        )
        .orderBy(F.desc("containment"), "doc_a", "doc_b")
        .limit(100)
    )


CROSS_CORPUS_TAU = 0.5  # exact-Jaccard admission threshold for the screen


@query(
    "dedup_cross_corpus_lsh",
    oracle=f"""
    WITH pairs AS ({_jaccard_sql_base(None)}),
    cross_pairs AS (
        SELECT CASE WHEN doc_a % 5 = 4 THEN doc_a ELSE doc_b END AS new_doc_id,
               CASE WHEN doc_a % 5 = 4 THEN doc_b ELSE doc_a END AS base_doc_id,
               jaccard
        FROM pairs
        WHERE (doc_a % 5 = 4) <> (doc_b % 5 = 4) AND jaccard >= {CROSS_CORPUS_TAU}
    )
    SELECT new_doc_id, base_doc_id, jaccard
    FROM (
        SELECT *, ROW_NUMBER() OVER (
                   PARTITION BY new_doc_id ORDER BY jaccard DESC, base_doc_id
               ) AS rn
        FROM cross_pairs
    ) WHERE rn = 1
    """,
)
def dedup_cross_corpus_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-corpus near-dup screen: which INCOMING documents (every fifth
    doc_id — the stand-in for a new crawl shard) near-duplicate something
    already in the BASE corpus, and against what. This is the admission
    gate every continuously-fed training pipeline runs before adding a
    shard: within-corpus dedup (dedup_survivors_lsh) keeps the existing
    set clean; THIS pass keeps new data from re-introducing what the base
    already contains, without ever comparing base docs to each other.

    Scale path: the shared MinHash-LSH builder (band equi-join + exact
    Jaccard re-rank on candidates only, never all-pairs), then the pair
    set is restricted to edges CROSSING the base/new split and collapsed
    to each new doc's best match (row_number over (jaccard, base_id) —
    deterministic). The oracle materializes the full exact cross join as
    ground truth, so this row also re-proves LSH recall at tau=0.5 on the
    registered corpus — same contract as dedup_survivors_lsh."""
    from pyspark.sql.window import Window

    pairs = _minhash_lsh_jaccard(spark, sf_dir, threshold=CROSS_CORPUS_TAU)
    a_new = (F.col("doc_a") % 5) == 4
    b_new = (F.col("doc_b") % 5) == 4
    cross = pairs.filter(a_new != b_new).select(
        F.when(a_new, F.col("doc_a")).otherwise(F.col("doc_b")).alias("new_doc_id"),
        F.when(a_new, F.col("doc_b")).otherwise(F.col("doc_a")).alias("base_doc_id"),
        "jaccard",
    )
    w = Window.partitionBy("new_doc_id").orderBy(F.desc("jaccard"), "base_doc_id")
    return (
        cross.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


def _cross_corpus_prefiltered_oracle_sql() -> str:
    terms = " + ".join(
        f"(CASE WHEN a.m{i} = b.m{i} THEN 1 ELSE 0 END)" for i in range(N_MINHASHES)
    )
    n = N_MINHASHES
    return f"""
    WITH {_minhash_cand_ctes()},
    m AS (
        SELECT c.doc_a, c.doc_b, {terms} AS n_match
        FROM cand c
        JOIN sig a ON a.doc_id = c.doc_a
        JOIN sig b ON b.doc_id = c.doc_b
    ),
    cm AS (
        SELECT doc_a, doc_b, n_match FROM m
        WHERE n_match >= {STRONG_PREFILTER_MIN_MATCH}
          AND ((doc_a % 5 = 4) <> (doc_b % 5 = 4))
    ),
    gray AS (
        SELECT doc_a, doc_b, n_match FROM cm
        WHERE n_match < {STRONG_ACCEPT_MIN_MATCH}
    ),
    counts AS (SELECT doc_id, COUNT(*) AS n FROM hashed GROUP BY doc_id),
    inter AS (
        SELECT g.doc_a, g.doc_b, COUNT(*) AS n_common
        FROM gray g
        JOIN hashed a ON a.doc_id = g.doc_a
        JOIN hashed b ON b.doc_id = g.doc_b AND b.h0 = a.h0
        GROUP BY g.doc_a, g.doc_b
    ),
    checked AS (
        SELECT i.doc_a, i.doc_b,
               CAST(i.n_common AS DOUBLE)
                 / CAST(ca.n + cb.n - i.n_common AS DOUBLE) AS jaccard
        FROM inter i
        JOIN counts ca ON i.doc_a = ca.doc_id
        JOIN counts cb ON i.doc_b = cb.doc_id
    ),
    admitted AS (
        SELECT doc_a, doc_b, n_match,
               CAST(NULL AS DOUBLE) AS jaccard, 'estimate' AS via
        FROM cm WHERE n_match >= {STRONG_ACCEPT_MIN_MATCH}
        UNION ALL
        SELECT g.doc_a, g.doc_b, g.n_match, c.jaccard, 'exact' AS via
        FROM gray g
        JOIN checked c ON c.doc_a = g.doc_a AND c.doc_b = g.doc_b
        WHERE c.jaccard >= {CROSS_CORPUS_TAU}
    ),
    oriented AS (
        SELECT CASE WHEN doc_a % 5 = 4 THEN doc_a ELSE doc_b END AS new_doc_id,
               CASE WHEN doc_a % 5 = 4 THEN doc_b ELSE doc_a END AS base_doc_id,
               n_match, jaccard, via
        FROM admitted
    )
    SELECT new_doc_id, base_doc_id, CAST(n_match AS INT) AS n_match,
           CAST(n_match AS DOUBLE) / {n}.0 AS est_jaccard, jaccard, via
    FROM (
        SELECT *, ROW_NUMBER() OVER (
                   PARTITION BY new_doc_id ORDER BY n_match DESC, base_doc_id
               ) AS rn
        FROM oriented
    ) WHERE rn = 1
    """


@query(
    "dedup_cross_corpus_lsh_prefiltered",
    oracle=_cross_corpus_prefiltered_oracle_sql(),
)
def dedup_cross_corpus_lsh_prefiltered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The cross-corpus admission screen with the signature-agreement gate —
    the LAST member of the LSH family still paying the full exact re-rank
    (every other path gained its gate in r11/r12). Same strong-edge
    calibration as the survivors variant (tau = 0.5): agreement >= 22/32
    admits on the estimate, < 10/32 rejects, the gray sliver pays the exact
    shingle-Jaccard check. Two structural differences from the ungated
    screen: the cross-split filter (new x base) runs BEFORE the gray
    re-rank — within-shard candidate pairs never touch the shingle table at
    all — and each new doc's best base match ranks by signature agreement
    (n_match DESC, base_doc_id), the quantity available for EVERY admitted
    pair; exact Jaccard is materialized only for gray-zone admissions
    (jaccard NULL, via='estimate' otherwise). All gate arithmetic stays
    integer/modular, so DuckDB mirrors the gated screen term for term.

    Reference anchor: no dedup in the reference (CDC-only surface); this
    completes the gate rollout across the LSH family's three production
    compositions (pairs, survivors, cross-corpus screen)."""
    from pyspark.sql.window import Window

    hashed = shingle_pairs(spark, sf_dir).select(
        "doc_id", shingle_h0(F.col("shingle")).alias("h0")
    ).persist()
    try:
        scored_cand = _signature_gated_candidates(
            hashed, STRONG_PREFILTER_MIN_MATCH
        )
        a_new = (F.col("doc_a") % 5) == 4
        b_new = (F.col("doc_b") % 5) == 4
        cross = scored_cand.filter(a_new != b_new)
        accepted = cross.filter(
            F.col("n_match") >= STRONG_ACCEPT_MIN_MATCH
        ).select(
            "doc_a",
            "doc_b",
            "n_match",
            F.lit(None).cast("double").alias("jaccard"),
            F.lit("estimate").alias("via"),
        )
        gray = cross.filter(F.col("n_match") < STRONG_ACCEPT_MIN_MATCH)
        gray_adm = (
            gray.join(
                _jaccard_from_hashed(hashed, gray.select("doc_a", "doc_b")),
                ["doc_a", "doc_b"],
            )
            .filter(F.col("jaccard") >= CROSS_CORPUS_TAU)
            .select("doc_a", "doc_b", "n_match", "jaccard", F.lit("exact").alias("via"))
        )
        admitted = accepted.unionByName(gray_adm).localCheckpoint(eager=True)
    finally:
        hashed.unpersist()
    oriented = admitted.select(
        F.when(a_new, F.col("doc_a")).otherwise(F.col("doc_b")).alias("new_doc_id"),
        F.when(a_new, F.col("doc_b")).otherwise(F.col("doc_a")).alias("base_doc_id"),
        F.col("n_match").cast("int").alias("n_match"),
        (F.col("n_match").cast("double") / float(N_MINHASHES)).alias("est_jaccard"),
        "jaccard",
        "via",
    )
    w = Window.partitionBy("new_doc_id").orderBy(F.desc("n_match"), "base_doc_id")
    return (
        oriented.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


PREFIX_W = 6  # tokens in the prefix fingerprint


@query(
    "dedup_doc_prefix",
    oracle=f"""
    WITH pref AS (
        SELECT doc_id, n_chars,
               ARRAY_TO_STRING(STRING_SPLIT(text, ' ')[1:{PREFIX_W}], ' ')
                   AS prefix
        FROM documents
    ),
    ranked AS (
        SELECT doc_id, prefix,
               ROW_NUMBER() OVER (PARTITION BY prefix
                                  ORDER BY n_chars DESC, doc_id) AS rn,
               FIRST_VALUE(doc_id) OVER (PARTITION BY prefix
                                         ORDER BY n_chars DESC, doc_id) AS keeper,
               COUNT(*) OVER (PARTITION BY prefix) AS group_size
        FROM pref
    )
    SELECT doc_id AS removed_doc_id,
           keeper AS kept_doc_id,
           CAST(group_size AS BIGINT) AS group_size
    FROM ranked
    WHERE rn > 1
    ORDER BY removed_doc_id
    """,
)
def dedup_doc_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix-duplicate detection: documents whose first {PREFIX_W} tokens
    are identical are treated as truncation variants of one underlying
    document (the crawl-dump pathology where the same page is captured at
    different cutoffs — exact dedup misses it because the tails differ,
    MinHash under-scores it when the truncation is aggressive). Policy:
    keep the LONGEST variant (n_chars DESC, doc_id tiebreak), emit one row
    per removed doc with its keeper and the group size.

    Scale shape: the prefix is fingerprinted as two independently-seeded
    xxhash64s (same 128-bit narrowing as corpus_chunk_dedup — the shuffle
    row carries 16 bytes + ids, never prefix text); one window keyed by
    the fingerprint does rank+keeper+size in a single shuffle. The oracle
    groups by the prefix STRING itself — output equality is the
    no-collision proof."""
    d = load_table(spark, sf_dir, "documents")
    prefix = F.array_join(
        F.slice(F.split(F.col("text"), " "), 1, PREFIX_W), " "
    )
    pref = d.select(
        "doc_id",
        "n_chars",
        F.xxhash64(prefix).alias("_h1"),
        F.xxhash64(F.lit(1), prefix).alias("_h2"),
    )
    from pyspark.sql.window import Window

    wp = Window.partitionBy("_h1", "_h2")
    wo = wp.orderBy(F.desc("n_chars"), "doc_id")
    ranked = pref.select(
        "doc_id",
        F.row_number().over(wo).alias("rn"),
        F.first("doc_id").over(wo).alias("keeper"),
        F.count(F.lit(1)).over(wp).alias("group_size"),
    )
    return (
        ranked.where(F.col("rn") > 1)
        .select(
            F.col("doc_id").alias("removed_doc_id"),
            F.col("keeper").alias("kept_doc_id"),
            F.col("group_size"),
        )
        .orderBy("removed_doc_id")
    )
