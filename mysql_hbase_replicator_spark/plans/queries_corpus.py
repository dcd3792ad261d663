"""EXT corpus-curation operators over the `documents` table (SURVEY.md §2.11):
the preprocessing stages a pretraining-data pipeline runs between raw ingest
and tokenized shards — intra-document repetition stats, blocklist scrubbing,
deterministic stratified sampling, train/valid/test splitting, and
concat-and-chunk sequence packing.

Design rules shared with the rest of the engine:

- Everything is JVM built-ins (regexp / md5 / window) — no Python in the hot
  path, so whole-stage codegen covers each stage and the same code runs
  unchanged over 100 TB of documents.
- All randomness is md5-derived from the row key (same trick as
  operators/dedup.py `shingle_h0`), so sampling, splitting, and the packing
  shuffle order are deterministic, reproducible across engines, and
  independent of partitioning — the DuckDB oracles replicate them
  term-for-term.
- The packing prefix-sum is distributed: per-bucket window cumsum + a
  broadcast NBUCKETS-row offset table, never a global single-partition
  window over the corpus (see `pack_sequences`).

Corpus assumption: single-space canonical tokenization (see
operators/dedup.py `word_shingles`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.column import Column

from mysql_hbase_replicator_spark.plans.registry import query
from mysql_hbase_replicator_spark.sources.tables import load_table


def hash60(salt: str, key: Column) -> Column:
    """Deterministic 60-bit nonnegative hash of ``salt || key`` — md5-based
    so the DuckDB oracle can reproduce it exactly:
    ``CAST(('0x' || SUBSTR(MD5('<salt>' || CAST(k AS VARCHAR)), 1, 15)) AS BIGINT)``."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), key.cast("string"))), 1, 15), 16, 10
    ).cast("long")


def _sql_hash60(salt: str, key_expr: str) -> str:
    return f"CAST(('0x' || SUBSTR(MD5('{salt}' || CAST({key_expr} AS VARCHAR)), 1, 15)) AS BIGINT)"


# ---------------------------------------------------------------------------
# Intra-document repetition (Gopher-style quality rule)
# ---------------------------------------------------------------------------

# all overlapping 2-word grams: lookbehind pins to token starts, the capture
# inside the lookahead grabs 2 tokens without consuming them (same pattern
# family as word_shingles, but NOT distinct — repetition is the signal here)
_2GRAM_RX = r"(?<!\S)(?=((?:\S+ ){1}\S+))"


@query(
    "text_repetition_stats",
    oracle="""
    WITH g AS (
        SELECT doc_id,
               LIST_TRANSFORM(RANGE(1, LEN(t)), i -> t[i] || ' ' || t[i+1]) AS grams
        FROM (SELECT doc_id, STRING_SPLIT(text, ' ') AS t FROM documents)
        WHERE LEN(t) >= 2
    )
    SELECT doc_id,
           CAST(LEN(grams) AS INT) AS n_grams,
           CAST(LEN(LIST_DISTINCT(grams)) AS INT) AS n_distinct_grams,
           1.0 - CAST(LEN(LIST_DISTINCT(grams)) AS DOUBLE) / CAST(LEN(grams) AS DOUBLE)
             AS dup_2gram_frac
    FROM g
    """,
)
def text_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-2-gram fraction per document — the Gopher repetition rule
    (high fraction = boilerplate / degenerate text a pretraining pipeline
    drops). Map-only over the corpus: one regex pass builds the overlapping
    gram array, size/array_distinct stay inside codegen; no shuffle at all,
    so the stage scales linearly with corpus bytes."""
    d = load_table(spark, sf_dir, "documents")
    grams = F.regexp_extract_all(F.col("text"), F.lit(_2GRAM_RX), 1)
    return (
        d.select("doc_id", grams.alias("grams"))
        # filter on the PROJECTED column: predicating on the pre-projection
        # expression resolved via missing-reference fallback and re-ran the
        # 2-gram regex per row just for the test (r13 review)
        .filter(F.size("grams") > 0)
        .select(
            "doc_id",
            F.size("grams").alias("n_grams"),
            F.size(F.array_distinct("grams")).alias("n_distinct_grams"),
            (
                F.lit(1.0)
                - F.size(F.array_distinct("grams")).cast("double")
                / F.size("grams").cast("double")
            ).alias("dup_2gram_frac"),
        )
    )


# ---------------------------------------------------------------------------
# Blocklist scrubbing (C4-style bad-word filtering + redaction)
# ---------------------------------------------------------------------------

# term scrub demo list: words that occur in the synthetic corpus; a real
# deployment swaps in its PII/bad-word patterns (same plan shape)
_BLOCKLIST_RX = r"\b(?:merge|checkpoint)\b"


@query(
    "text_blocklist_scrub",
    oracle=f"""
    SELECT doc_id,
           CAST(LEN(REGEXP_EXTRACT_ALL(text, '{_BLOCKLIST_RX}')) AS INT) AS n_hits,
           MD5(REGEXP_REPLACE(text, '{_BLOCKLIST_RX}', '[REDACTED]', 'g')) AS scrubbed_md5,
           LEN(REGEXP_EXTRACT_ALL(text, '{_BLOCKLIST_RX}')) = 0 AS kept
    FROM documents
    """,
)
def text_blocklist_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocklist scrub: count matches of a term/PII pattern, produce the
    redacted text (md5 digest registered so the oracle value-checks the
    full scrubbed string), and the C4-style keep/drop decision. Map-only,
    single regex pass, codegen end-to-end — the canonical cheap gate that
    runs before any expensive dedup stage."""
    d = load_table(spark, sf_dir, "documents")
    hits = F.size(F.regexp_extract_all(F.col("text"), F.lit(_BLOCKLIST_RX), 0))
    scrubbed = F.regexp_replace(F.col("text"), _BLOCKLIST_RX, "[REDACTED]")
    return d.select(
        "doc_id",
        hits.alias("n_hits"),
        F.md5(F.encode(scrubbed, "UTF-8")).alias("scrubbed_md5"),
        (hits == 0).alias("kept"),
    )


# ---------------------------------------------------------------------------
# Deterministic stratified sampling
# ---------------------------------------------------------------------------

# per-language keep rates out of 100: downsample the dominant language,
# keep low-resource languages whole (the usual pretraining-mix shape)
_SAMPLE_RATES = {"en": 30, "de": 100, "es": 80, "fr": 80, "zh": 60}
_SAMPLE_DEFAULT = 50


def _rate_col() -> Column:
    c = F.lit(_SAMPLE_DEFAULT)
    for lang, rate in _SAMPLE_RATES.items():
        c = F.when(F.col("lang") == lang, F.lit(rate)).otherwise(c)
    return c


_RATE_SQL_CASE = (
    "CASE lang "
    + " ".join(f"WHEN '{k}' THEN {v}" for k, v in _SAMPLE_RATES.items())
    + f" ELSE {_SAMPLE_DEFAULT} END"
)


@query(
    "sample_stratified",
    oracle=f"""
    SELECT doc_id, lang, source
    FROM documents
    WHERE {_sql_hash60("smpl:", "doc_id")} % 100 < {_RATE_SQL_CASE}
    """,
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: keep a per-language percentage of
    documents, selected by md5(doc_id) mod 100 — reproducible across runs,
    engines, and partitionings (unlike df.sample, whose output depends on
    partition layout). Map-only filter; at 100 TB this is a pushed-down
    scan + filter with zero shuffle, and re-running it on a grown corpus
    keeps every previously-sampled doc (stable ids → stable membership)."""
    d = load_table(spark, sf_dir, "documents")
    bucket = hash60("smpl:", F.col("doc_id")) % 100
    return d.filter(bucket < _rate_col()).select("doc_id", "lang", "source")


@query(
    "split_train_valid",
    oracle=f"""
    WITH s AS (
        SELECT lang,
               CASE WHEN {_sql_hash60("split:", "doc_id")} % 1000 < 10 THEN 'valid'
                    WHEN {_sql_hash60("split:", "doc_id")} % 1000 < 30 THEN 'test'
                    ELSE 'train' END AS split,
               LEN(STRING_SPLIT(text, ' ')) AS n_tokens
        FROM documents
    )
    SELECT split, lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
    FROM s GROUP BY split, lang
    """,
)
def split_train_valid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/valid/test assignment (1% valid, 2% test) by
    md5(doc_id) mod 1000, reported as per-(split, lang) doc/token counts.
    The split is a pure map — each doc's membership is computable anywhere,
    no coordination — and the report is one partial-aggregated shuffle on
    (split, lang): 15 groups regardless of corpus size."""
    d = load_table(spark, sf_dir, "documents")
    h = hash60("split:", F.col("doc_id")) % 1000
    split = (
        F.when(h < 10, F.lit("valid")).when(h < 30, F.lit("test")).otherwise(F.lit("train"))
    )
    return (
        d.select(
            split.alias("split"),
            "lang",
            F.size(F.split(F.col("text"), " ")).alias("n_tokens"),
        )
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        )
    )


# ---------------------------------------------------------------------------
# Sequence packing (concat-and-chunk) via distributed prefix sum
# ---------------------------------------------------------------------------

PACK_CTX = 512  # tokens per training chunk
PACK_BUCKETS = 32  # prefix-sum fan-out; at 100 TB raise to O(partitions)


@query(
    "pack_sequences",
    oracle=f"""
    WITH t AS (
        SELECT doc_id,
               LEN(STRING_SPLIT(text, ' ')) AS n_tokens,
               {_sql_hash60("pack:", "doc_id")} AS h
        FROM documents
    ),
    c AS (
        SELECT doc_id, n_tokens, h,
               CAST(SUM(n_tokens) OVER (
                   ORDER BY h % {PACK_BUCKETS}, h, doc_id
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        FROM t
    )
    SELECT doc_id,
           CAST(n_tokens AS INT) AS n_tokens,
           CAST(cum - n_tokens AS BIGINT) AS start_offset,
           CAST((cum - n_tokens) // {PACK_CTX} AS INT) AS first_chunk,
           CAST((cum - 1) // {PACK_CTX} - (cum - n_tokens) // {PACK_CTX} + 1 AS INT)
             AS n_chunks
    FROM c
    """,
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing: documents are laid out in a
    deterministic md5-shuffled order, token counts are prefix-summed, and
    each doc learns its byte^Wtoken offset in the virtual concatenated
    stream plus which fixed-size training chunks it spans.

    The prefix sum is DISTRIBUTED — the textbook two-pass pattern, because a
    single `Window.orderBy(...)` over the whole corpus collapses to ONE
    partition and dies at scale:

      1. bucket = h % PACK_BUCKETS; global order is (bucket, h, doc_id), so
         each bucket owns a contiguous range of the stream;
      2. within-bucket cumsum — window PARTITIONED by bucket (parallel);
      3. bucket offsets — an aggregate producing PACK_BUCKETS rows; the
         running-total window over it is single-partition but over
         PACK_BUCKETS rows, not the corpus;
      4. broadcast-join offsets back; start = bucket_offset + cum - n.

    tests/test_plans.py pins the shape (big window partitioned, offsets
    broadcast). The oracle computes the same global cumsum directly."""
    d = load_table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).alias("n_tokens"),
        hash60("pack:", F.col("doc_id")).alias("h"),
    ).withColumn("bucket", F.col("h") % PACK_BUCKETS)

    w_in = (
        Window.partitionBy("bucket")
        .orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum_in = t.withColumn("cum_in", F.sum("n_tokens").over(w_in))

    totals = t.groupBy("bucket").agg(F.sum("n_tokens").alias("btot"))
    # PACK_BUCKETS rows: the unpartitioned window is bounded and cheap
    w_off = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "bucket", F.coalesce(F.sum("btot").over(w_off), F.lit(0)).alias("boff")
    )

    j = cum_in.join(F.broadcast(offsets), "bucket")
    cum = (F.col("boff") + F.col("cum_in")).cast("long")
    start = cum - F.col("n_tokens")
    return j.select(
        "doc_id",
        F.col("n_tokens").cast("int").alias("n_tokens"),
        start.cast("long").alias("start_offset"),
        F.floor(start / PACK_CTX).cast("int").alias("first_chunk"),
        (
            F.floor((cum - 1) / PACK_CTX) - F.floor(start / PACK_CTX) + 1
        ).cast("int").alias("n_chunks"),
    )


# ---------------------------------------------------------------------------
# Corpus token-count histogram
# ---------------------------------------------------------------------------

_HIST_WIDTH = 16


@query(
    "corpus_token_histogram",
    oracle=f"""
    SELECT lang,
           CAST((LEN(STRING_SPLIT(text, ' ')) // {_HIST_WIDTH}) * {_HIST_WIDTH} AS INT)
             AS bucket_lo,
           COUNT(*) AS n_docs,
           CAST(SUM(LEN(STRING_SPLIT(text, ' '))) AS BIGINT) AS total_tokens
    FROM documents
    GROUP BY 1, 2
    """,
)
def corpus_token_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width token-count histogram per language — the corpus-shape
    report a data curator reads before setting packing/filter thresholds.
    Integer bucket math (no float binning drift), partial-aggregated single
    shuffle on (lang, bucket): output is O(languages × buckets), independent
    of corpus size."""
    d = load_table(spark, sf_dir, "documents")
    n = F.size(F.split(F.col("text"), " "))
    bucket = (n - n % _HIST_WIDTH).cast("int")
    return (
        d.select("lang", bucket.alias("bucket_lo"), n.alias("n_tokens"))
        .groupBy("lang", "bucket_lo")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        )
    )


# ---------------------------------------------------------------------------
# Deterministic corpus shuffle (sharded, seeded)
# ---------------------------------------------------------------------------

SHUFFLE_SHARDS = 32


@query(
    "corpus_shuffle",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, {_sql_hash60("shuffle:", "doc_id")} AS h FROM documents
    ),
    s AS (SELECT doc_id, h, CAST(h % {SHUFFLE_SHARDS} AS INT) AS shard FROM t)
    SELECT doc_id, shard,
           CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY h, doc_id) AS INT)
             AS pos_in_shard,
           CAST(ROW_NUMBER() OVER (ORDER BY shard, h, doc_id) - 1 AS BIGINT)
             AS global_pos
    FROM s
    """,
)
def corpus_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded deterministic corpus shuffle — the epoch-ordering step of a
    training pipeline: every document gets a stable pseudo-random shard and
    position, reproducible on any engine/partitioning because the order key
    is md5-derived from doc_id (change the salt to get a new epoch's
    permutation).

    The global position uses the same distributed two-pass prefix sum as
    `pack_sequences` (global order = (shard, h, doc_id)): a per-shard
    row_number window runs in parallel, shard offsets come from an
    O(SHUFFLE_SHARDS)-row broadcast table, so there is never a
    single-partition window over the corpus."""
    d = load_table(spark, sf_dir, "documents")
    t = d.select("doc_id", hash60("shuffle:", F.col("doc_id")).alias("h")).withColumn(
        "shard", (F.col("h") % SHUFFLE_SHARDS).cast("int")
    )
    w_in = Window.partitionBy("shard").orderBy("h", "doc_id")
    pos = t.withColumn("pos_in_shard", F.row_number().over(w_in))
    counts = t.groupBy("shard").agg(F.count(F.lit(1)).alias("n"))
    # SHUFFLE_SHARDS rows: the unpartitioned window is bounded and cheap
    w_off = Window.orderBy("shard").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "shard", F.coalesce(F.sum("n").over(w_off), F.lit(0)).alias("off")
    )
    return (
        pos.join(F.broadcast(offsets), "shard")
        .select(
            "doc_id",
            "shard",
            F.col("pos_in_shard").cast("int").alias("pos_in_shard"),
            (F.col("off") + F.col("pos_in_shard") - 1).cast("long").alias("global_pos"),
        )
    )


# ---------------------------------------------------------------------------
# Train/test decontamination (benchmark n-gram overlap)
# ---------------------------------------------------------------------------

# deterministic held-out stand-in: every 50th doc is "the benchmark set"
DECONTAM_TEST_MOD = 50


@query(
    "corpus_decontaminate",
    oracle=f"""
    WITH sh AS (
        SELECT DISTINCT doc_id, u.shingle
        FROM (SELECT doc_id, STRING_SPLIT(text, ' ') AS t FROM documents),
             UNNEST(LIST_TRANSFORM(RANGE(1, LEN(t) - 1),
                                   i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS u(shingle)
        WHERE LEN(t) >= 3
    ),
    test AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % {DECONTAM_TEST_MOD} = 0)
    SELECT s.doc_id, CAST(COUNT(*) AS INT) AS n_shared_shingles
    FROM sh s JOIN test t USING (shingle)
    WHERE s.doc_id % {DECONTAM_TEST_MOD} <> 0
    GROUP BY s.doc_id
    """,
)
def corpus_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination — the check every training pipeline runs
    before a model ships: which TRAINING documents share verbatim n-grams
    with the held-out evaluation set (here the deterministic stand-in
    doc_id % DECONTAM_TEST_MOD == 0)? Output = contaminated doc ids with the
    count of distinct 3-word shingles they share with any test doc.

    Scale shape: the test set's distinct shingles are tiny relative to the
    corpus (benchmarks are MBs, corpora are TBs) — broadcast them and the
    whole check is a map-side hash join over the exploded training shingles
    plus one count shuffle on doc_id. No corpus self-join anywhere."""
    from mysql_hbase_replicator_spark.operators.dedup import word_shingles

    d = load_table(spark, sf_dir, "documents")
    sh = d.select("doc_id", F.explode(word_shingles(F.col("text"))).alias("shingle"))
    test_sh = (
        sh.filter(F.col("doc_id") % DECONTAM_TEST_MOD == 0)
        .select("shingle")
        .distinct()
    )
    return (
        sh.filter(F.col("doc_id") % DECONTAM_TEST_MOD != 0)
        .join(F.broadcast(test_sh), "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("int").alias("n_shared_shingles"))
    )


# ---------------------------------------------------------------------------
# Token-budget subset selection (quality-ordered prefix under a budget)
# ---------------------------------------------------------------------------

BUDGET_FRAC = 0.5  # keep the best half of the corpus by token count
BUDGET_BUCKET_CHARS = 64  # quality buckets = n_chars // 64 (descending)


@query(
    "corpus_token_budget_select",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, LEN(STRING_SPLIT(text, ' ')) AS n_tokens, n_chars
        FROM documents
    ),
    tot AS (
        SELECT CAST(FLOOR({BUDGET_FRAC} * CAST(SUM(n_tokens) AS DOUBLE)) AS BIGINT)
          AS budget FROM t
    ),
    o AS (
        SELECT doc_id, n_tokens,
               SUM(n_tokens) OVER (ORDER BY n_chars // {BUDGET_BUCKET_CHARS} DESC,
                                            n_chars DESC, doc_id
                                   ROWS UNBOUNDED PRECEDING) AS cum
        FROM t
    )
    SELECT o.doc_id, CAST(o.n_tokens AS INT) AS n_tokens,
           CAST(o.cum - o.n_tokens AS BIGINT) AS start_offset
    FROM o, tot WHERE o.cum - o.n_tokens < tot.budget
    """,
)
def corpus_token_budget_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget subset selection: walk the corpus in quality order
    (longer documents first — the stand-in scoring; swap any deterministic
    score) and keep every document whose stream position starts inside the
    BUDGET_FRAC token budget — "give me the best N tokens", the final gate
    before tokenization.

    The global quality-ordered prefix sum is the same distributed two-pass
    pattern as `pack_sequences`, with the bucket key derived from the SORT
    key (n_chars // BUDGET_BUCKET_CHARS, descending) so each bucket owns a
    contiguous range of the global order: per-bucket window cumsum in
    parallel, O(buckets)-row broadcast offset table, broadcast 1-row budget.
    Never a single-partition window over the corpus."""
    d = load_table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).alias("n_tokens"),
        "n_chars",
    ).withColumn("qb", F.floor(F.col("n_chars") / BUDGET_BUCKET_CHARS).cast("long"))

    w_in = (
        Window.partitionBy("qb")
        .orderBy(F.desc("n_chars"), "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum_in = t.withColumn("cum_in", F.sum("n_tokens").over(w_in))

    totals = t.groupBy("qb").agg(F.sum("n_tokens").alias("btot"))
    # O(buckets) rows: the unpartitioned window is bounded and cheap
    w_off = Window.orderBy(F.desc("qb")).rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "qb", F.coalesce(F.sum("btot").over(w_off), F.lit(0)).alias("boff")
    )
    budget = t.agg(
        F.floor(F.lit(BUDGET_FRAC) * F.sum("n_tokens").cast("double"))
        .cast("long")
        .alias("budget")
    )
    j = cum_in.join(F.broadcast(offsets), "qb").crossJoin(F.broadcast(budget))
    start = (F.col("boff") + F.col("cum_in") - F.col("n_tokens")).cast("long")
    return (
        j.filter(start < F.col("budget"))
        .select(
            "doc_id",
            F.col("n_tokens").cast("int").alias("n_tokens"),
            start.alias("start_offset"),
        )
    )


BIGRAM_TOP_N = 100


@query(
    "corpus_bigram_top",
    oracle=f"""
    WITH toks AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS t FROM documents),
    bg AS (
        SELECT doc_id,
               UNNEST(LIST_TRANSFORM(RANGE(1, LEN(t)),
                                     i -> t[i] || ' ' || t[i + 1])) AS bigram
        FROM toks
    )
    SELECT bigram, COUNT(*) AS n_occurrences, COUNT(DISTINCT doc_id) AS n_docs
    FROM bg
    GROUP BY bigram
    ORDER BY n_occurrences DESC, bigram
    LIMIT {BIGRAM_TOP_N}
    """,
)
def corpus_bigram_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide top-N bigram counts — the unit step of n-gram LM counting
    (KenLM-style) and of repeated-phrase contamination scans. Adjacent-pair
    construction is a zip_with of two array slices (pure codegen, no explode
    of anything wider than the token list); the count is one (bigram) keyed
    shuffle with map-side partial aggregation, and the top-N has a total
    order (count desc, bigram asc) so the cut is deterministic. At 100 TB
    the shuffle key space is vocabulary², but partial aggregation collapses
    per-partition counts first — the classic word-count shape."""
    d = load_table(spark, sf_dir, "documents")
    t = F.split(F.col("text"), " ")
    n = F.size(t)
    bigrams = F.zip_with(
        F.slice(t, 1, n - 1),
        F.slice(t, 2, n - 1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    bg = d.select(
        "doc_id",
        F.explode(F.when(n >= 2, bigrams)).alias("bigram"),
    )
    return (
        bg.groupBy("bigram")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.count_distinct("doc_id").alias("n_docs"),
        )
        .orderBy(F.desc("n_occurrences"), "bigram")
        .limit(BIGRAM_TOP_N)
    )


NGRAM_W = 8  # window for cross-doc repeated-sequence detection


@query(
    "corpus_repeated_ngrams",
    oracle=f"""
    WITH toks AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS t FROM documents),
    ng AS (
        SELECT doc_id,
               UNNEST(LIST_TRANSFORM(RANGE(1, LEN(t) - {NGRAM_W} + 2),
                                     i -> ARRAY_TO_STRING(t[i:i + {NGRAM_W} - 1], ' '))) AS ngram
        FROM toks
    ),
    shared AS (
        SELECT ngram
        FROM (SELECT ngram, COUNT(DISTINCT doc_id) AS n_docs FROM ng GROUP BY ngram)
        WHERE n_docs > 1
    )
    SELECT doc_id,
           COUNT(DISTINCT ngram) AS n_shared_ngrams
    FROM ng JOIN shared USING (ngram)
    GROUP BY doc_id
    """,
)
def corpus_repeated_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document repeated-sequence detection: for every document, count
    the distinct {NGRAM_W}-token windows it shares with at least one OTHER
    document — the doc-level signal of the "dedup exact substrings"
    pretraining step (Lee et al.'s suffix-array dedup finds the same
    sequences; here the fixed window makes it a pure groupBy).

    Scale shape: n-gram construction is a codegen'd slice/join per row (the
    exploded stream is ~tokens-per-doc rows per doc, same as tokenize).
    The (ngram, doc_id) stream is deduplicated ONCE on the balanced
    two-column key, after which both counts are plain ``count()`` with
    map-side partial aggregation — a boilerplate n-gram present in a large
    fraction of docs reaches its reducer as O(partitions) partial counts,
    never as O(docs) raw pairs. (A naive
    ``groupBy(ngram).agg(count_distinct(doc_id))`` shuffles the raw pairs on
    ngram alone, making the hottest n-gram a single-reducer O(docs) key at
    100×; this shape removes that.) The join back is ngram-keyed against the
    small shared set (broadcast at test SF, SMJ at scale). No all-pairs step
    anywhere, so the plan holds at corpus scale."""
    d = load_table(spark, sf_dir, "documents")
    t = F.split(F.col("text"), " ")
    n = F.size(t)
    # clamp to ≥1 so short docs can't feed sequence() a descending range if
    # the when() branch is evaluated eagerly; the when() still drops them.
    # Each window is folded AT THE MAP SIDE to a struct of two independent
    # xxhash64 values (second uses a distinct extra-column seed), so every
    # shuffle/join key downstream is 16 bytes instead of a ~50-char string.
    # The hash never leaves the query — the output is per-doc DISTINCT
    # COUNTS, which any consistent injective-enough mapping preserves — so
    # the oracle keeps exact strings and the engines stay decoupled.
    # 128-bit fold ⇒ collision odds ~n²/2¹²⁹ ≈ 1.5e-23 at 1e8 windows —
    # negligible at any corpus scale (was ~3e-3 with a single 64-bit fold).
    idx = F.sequence(F.lit(1), F.greatest(n - F.lit(NGRAM_W - 1), F.lit(1)))
    # explode the window STRINGS, then hash post-explode: array_join runs
    # once per window and the ~50-char string dies inside the same codegen
    # stage (before any exchange); hashing inside the transform() lambda
    # would run array_join twice per window (once per seed).
    wins = F.transform(idx, lambda i: F.array_join(F.slice(t, i, NGRAM_W), " "))
    ng = d.select(
        "doc_id",
        F.explode(F.when(n >= NGRAM_W, wins)).alias("w"),
    ).select(
        "doc_id",
        F.struct(
            F.xxhash64("w").alias("h1"),
            F.xxhash64("w", F.lit(NGRAM_W)).alias("h2"),
        ).alias("ngram"),
    )
    # one balanced dedupe on the (ngram, doc_id) pair key; both downstream
    # aggregates become skew-safe plain counts with map-side partials
    pairs = ng.dropDuplicates(["ngram", "doc_id"])
    shared = (
        pairs.groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") > 1)
        .select("ngram")
    )
    return (
        pairs.join(shared, "ngram")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared_ngrams"))
    )


# domain mixture: per-source-tier keep rates (percent), the knob a
# pretraining pipeline turns to hit a target domain mix (e.g. upsample
# curated sources, downsample crawl)
MIX_HI = 80
MIX_MID = 50
MIX_LO = 20
_HI_SRC = "('src0','src1','src2','src3','src4')"
_MID_SRC = "('src5','src6','src7','src8','src9')"


@query(
    "corpus_domain_mixture",
    oracle=f"""
    WITH rated AS (
        SELECT doc_id, source, lang,
               CASE WHEN source IN {_HI_SRC} THEN {MIX_HI}
                    WHEN source IN {_MID_SRC} THEN {MIX_MID}
                    ELSE {MIX_LO} END AS keep_pct,
               {_sql_hash60("mix:", "doc_id")} % 100 AS ticket
        FROM documents
    )
    SELECT doc_id, source, lang, CAST(keep_pct AS INT) AS keep_pct
    FROM rated
    WHERE ticket < keep_pct
    """,
)
def corpus_domain_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic domain-mixture sampling: each source tier gets a keep
    rate (80/50/20%), and a document survives iff its md5-derived ticket
    falls under its tier's rate — the reproducible form of weighted domain
    mixing (upsample curated, downsample crawl). Map-only: the tier CASE and
    the hash are row-local expressions inside one codegen stage, so the same
    scan works at any corpus size with zero shuffle; downstream stages see a
    stable sample regardless of partitioning or run count."""
    d = load_table(spark, sf_dir, "documents")
    hi = [f"src{i}" for i in range(5)]
    mid = [f"src{i}" for i in range(5, 10)]
    keep_pct = (
        F.when(F.col("source").isin(hi), MIX_HI)
        .when(F.col("source").isin(mid), MIX_MID)
        .otherwise(MIX_LO)
    )
    ticket = hash60("mix:", F.col("doc_id")) % 100
    return (
        d.select(
            "doc_id",
            "source",
            "lang",
            keep_pct.cast("int").alias("keep_pct"),
            ticket.alias("ticket"),
        )
        .filter(F.col("ticket") < F.col("keep_pct"))
        .drop("ticket")
    )


@query(
    "corpus_filter_funnel",
    oracle="""
    SELECT COUNT(*) AS n_total,
           CAST(SUM(CASE WHEN LENGTH(text) >= 50 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_pass_length,
           CAST(SUM(CASE WHEN LENGTH(text) >= 50
                          AND lang IN ('en', 'es', 'de', 'fr')
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_pass_lang,
           CAST(SUM(CASE WHEN LENGTH(text) >= 50
                          AND lang IN ('en', 'es', 'de', 'fr')
                          AND LEN(STRING_SPLIT(text, ' ')) >= 50
                          AND CAST(LENGTH(REPLACE(text, ' ', '')) AS DOUBLE)
                                / LEN(STRING_SPLIT(text, ' ')) BETWEEN 3 AND 10
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_pass_gopher
    FROM documents
    """,
)
def corpus_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter-funnel observability: how many documents survive each
    cumulative quality gate (length → language allow-list → Gopher shape
    rules). The number a pipeline owner reads before/after touching any
    threshold. One map-only pass with conditional sums (partial-aggregated,
    single 1-row reduce) — at 100 TB this is a scan, nothing more."""
    d = load_table(spark, sf_dir, "documents")
    n_words = F.size(F.split(F.col("text"), " "))
    mean_len = (
        F.length(F.regexp_replace(F.col("text"), " ", "")).cast("double") / n_words
    )
    c_len = F.length("text") >= 50
    c_lang = c_len & F.col("lang").isin("en", "es", "de", "fr")
    c_gopher = c_lang & (n_words >= 50) & (mean_len >= 3.0) & (mean_len <= 10.0)
    return d.agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(F.when(c_len, 1).otherwise(0)).alias("n_pass_length"),
        F.sum(F.when(c_lang, 1).otherwise(0)).alias("n_pass_lang"),
        F.sum(F.when(c_gopher, 1).otherwise(0)).alias("n_pass_gopher"),
    )


# URL dedup: ~10 docs share each synthetic page; md5 ticket picks which
# tracking-noise variant each carries, canonicalization strips it
URL_PAGES = 50


@query(
    "dedup_url_canonicalize",
    oracle=f"""
    WITH u AS (
        SELECT doc_id,
               'https://' || source || '.example.com/page/'
                 || CAST(doc_id % {URL_PAGES} AS VARCHAR)
                 || CASE {_sql_hash60("url:", "doc_id")} % 3
                      WHEN 1 THEN '?utm_source=feed&utm_campaign=x'
                      WHEN 2 THEN '#section-2'
                      ELSE '' END AS url
        FROM documents
    )
    SELECT REGEXP_REPLACE(url, '[?#].*$', '') AS canonical_url,
           COUNT(*) AS n_variants,
           MIN(doc_id) AS keeper_doc_id
    FROM u
    GROUP BY 1
    """,
)
def dedup_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-canonicalization dedup — the first dedup a web corpus runs,
    before any content hashing: strip tracking query strings and fragments,
    then collapse to one keeper per canonical URL (lowest doc_id, the same
    keeper rule as exact dedup). The synthetic URLs give ~10 docs per page
    with md5-chosen tracking noise so the collapse is meaningful. Shape:
    map-only canonicalize (regexp in codegen) + one groupBy on the
    canonical key — identical cost profile to exact dedup."""
    d = load_table(spark, sf_dir, "documents")
    variant = hash60("url:", F.col("doc_id")) % 3
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/page/"),
        (F.col("doc_id") % URL_PAGES).cast("string"),
        F.when(variant == 1, "?utm_source=feed&utm_campaign=x")
        .when(variant == 2, "#section-2")
        .otherwise(""),
    )
    return (
        d.select(F.regexp_replace(url, r"[?#].*$", "").alias("canonical_url"), "doc_id")
        .groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).alias("n_variants"),
            F.min("doc_id").alias("keeper_doc_id"),
        )
    )


# per-language cap: bound any language's share of the corpus by keeping a
# deterministic hash-ordered sample of at most LANG_CAP docs per language
LANG_CAP = 70


@query(
    "corpus_lang_cap",
    oracle=f"""
    SELECT doc_id, lang, CAST(rn AS INT) AS keep_rank
    FROM (
        SELECT doc_id, lang,
               ROW_NUMBER() OVER (PARTITION BY lang
                                  ORDER BY {_sql_hash60("cap:", "doc_id")}, doc_id) AS rn
        FROM documents
    )
    WHERE rn <= {LANG_CAP}
    """,
)
def corpus_lang_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language rebalancing by hard cap: each language keeps at most
    LANG_CAP documents, chosen by a deterministic md5 ticket (so the kept
    subset is stable across runs and partitionings — the same reproducible-
    sampling contract as corpus_shuffle / corpus_domain_mixture, but as a
    per-group top-k instead of a rate).

    Scale shape: one (lang) shuffle; the per-group top-k plans as
    WindowGroupLimit (partial top-k per partition BEFORE the exchange), so
    a dominant language ships at most LANG_CAP rows per input partition,
    not its whole corpus share — the cap itself bounds the skew."""
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(hash60("cap:", F.col("doc_id")), "doc_id")
    return (
        d.select("doc_id", "lang", F.row_number().over(w).alias("keep_rank"))
        .filter(F.col("keep_rank") <= LANG_CAP)
        .withColumn("keep_rank", F.col("keep_rank").cast("int"))
    )


# chunk-level exact dedup: non-overlapping token windows of this width
CHUNK_W = 16


@query(
    "corpus_chunk_dedup",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, STRING_SPLIT(text, ' ') AS t FROM documents
    ),
    chunks AS (
        SELECT doc_id, i AS chunk_idx,
               ARRAY_TO_STRING(t[(i * {CHUNK_W} + 1):(i * {CHUNK_W} + {CHUNK_W})], ' ') AS chunk,
               LEAST({CHUNK_W}, LEN(t) - i * {CHUNK_W}) AS n_toks
        FROM toks,
             UNNEST(RANGE(0, CAST(CEIL(LEN(t) / {CHUNK_W}.0) AS BIGINT))) AS u(i)
    ),
    marked AS (
        SELECT doc_id, n_toks,
               ROW_NUMBER() OVER (PARTITION BY chunk
                                  ORDER BY doc_id, chunk_idx) AS rn
        FROM chunks
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept_chunks,
           CAST(SUM(CASE WHEN rn = 1 THEN n_toks ELSE 0 END) AS BIGINT) AS n_tokens_kept
    FROM marked
    GROUP BY doc_id
    """,
)
def corpus_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-level exact dedup — the sub-document variant of dedup_exact:
    split every document into non-overlapping 16-token chunks, keep only
    each chunk's first corpus-wide occurrence (ordered by doc_id, then
    position), and report per document how many chunks/tokens survive.
    This is the scrub that removes boilerplate shared across near-identical
    documents (headers, licenses, templated intros) which document-level
    dedup misses because the documents differ elsewhere.

    Scale shape: posexplode is map-side; the first-occurrence choice is one
    window keyed by a 128-bit chunk hash (two independently-seeded
    xxhash64s), NOT the chunk text — the r6 sf≈10 probe measured the
    text-keyed form at 17× for 10× data (0.52 → 9.1 s): every shuffle row
    carried the full ~200-byte chunk string, so exchange volume, not
    compute, dominated. Hashing narrows the shuffle row to 16 bytes + ids;
    a collision would need BOTH 64-bit hashes to collide on different
    text (~2⁻¹²⁸-scale, the standard exact-dedup fingerprint convention,
    same as operators/dedup.py). The per-doc rollup is a second shuffle on
    doc_id. Chunk frequency follows the duplicate-cluster distribution, so
    no single chunk key can exceed the corpus' duplication factor — no
    skew salt needed. ROW_NUMBER's (doc_id, chunk_idx) order is a total
    order, so the keeper is deterministic on both engines (the oracle
    partitions by chunk text — identical grouping absent a 128-bit
    collision)."""
    d = load_table(spark, sf_dir, "documents")
    marked = _chunk_marked(d)
    kept = F.when(F.col("rn") == 1, 1).otherwise(0)
    return marked.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum(kept).alias("n_kept_chunks"),
        F.sum(F.when(F.col("rn") == 1, F.col("n_toks")).otherwise(0)).alias(
            "n_tokens_kept"
        ),
    )


@query(
    "corpus_len_percentile_filter",
    oracle="""
    WITH h AS (SELECT n_chars, COUNT(*) AS c FROM documents GROUP BY n_chars),
    cum AS (
        SELECT n_chars,
               SUM(c) OVER (ORDER BY n_chars
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS cf
        FROM h
    ),
    tot AS (SELECT COUNT(*) AS n FROM documents),
    lo AS (SELECT MIN(n_chars) AS lo FROM cum, tot WHERE cf >= 0.10 * n),
    hi AS (SELECT MIN(n_chars) AS hi FROM cum, tot WHERE cf >= 0.90 * n)
    SELECT d.source,
           CAST(COUNT(*) AS BIGINT) AS n_kept,
           MIN(d.n_chars) AS min_kept,
           MAX(d.n_chars) AS max_kept
    FROM documents d, lo, hi
    WHERE d.n_chars >= lo.lo AND d.n_chars <= hi.hi
    GROUP BY d.source
    """,
)
def corpus_len_percentile_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentile-band length filter: keep documents whose length falls in
    the corpus' [p10, p90] band (order-statistic percentiles — the smallest
    length whose cumulative count reaches the quantile; no interpolation,
    so thresholds are exact integers on both engines), then profile what
    survives per source — the outlier trim every pretraining mix applies
    before token budgeting.

    This is the quantile-by-histogram scale pattern: the exact percentile
    of 100 TB of documents needs no global sort — lengths collapse to a
    count-per-distinct-length histogram (one map-side-combined shuffle over
    a domain bounded by max document length), the cumulative scan runs over
    that bounded histogram, and the two resulting threshold rows broadcast
    back into a map-only filter over the corpus. Compare
    agg_percentiles/agg_median_exact, which use the same trick for value
    percentiles."""
    d = load_table(spark, sf_dir, "documents")
    h = d.groupBy("n_chars").agg(F.count(F.lit(1)).alias("c"))
    w = Window.orderBy("n_chars").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = h.select("n_chars", F.sum("c").over(w).alias("cf"))
    tot = d.agg(F.count(F.lit(1)).alias("n"))
    cum_t = cum.crossJoin(F.broadcast(tot))
    lo = cum_t.filter(F.col("cf") >= 0.10 * F.col("n")).agg(
        F.min("n_chars").alias("lo")
    )
    hi = cum_t.filter(F.col("cf") >= 0.90 * F.col("n")).agg(
        F.min("n_chars").alias("hi")
    )
    return (
        d.crossJoin(F.broadcast(lo))
        .crossJoin(F.broadcast(hi))
        .filter((F.col("n_chars") >= F.col("lo")) & (F.col("n_chars") <= F.col("hi")))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.min("n_chars").alias("min_kept"),
            F.max("n_chars").alias("max_kept"),
        )
    )


# n-gram width for the temporal-novelty metric below
NOVELTY_W = 3


def _chunk_marked(d):
    """Chunk fingerprint + first-occurrence marking shared by
    corpus_chunk_dedup and pipeline_curation_v2 (r13 review: the pipeline
    inlined a copy, so a chunking/hashing change in one query silently
    diverged the composed pipeline from its independently-verified
    sub-query): non-overlapping CHUNK_W-token chunks, 128-bit fingerprint
    (two independently-seeded xxhash64s — never the chunk text, the r6
    17x shuffle fix), rn=1 marks each chunk's first corpus-wide occurrence
    by (doc_id, chunk_idx). Returns (doc_id, n_toks, rn)."""
    toks = d.select("doc_id", F.split(F.col("text"), " ").alias("t"))
    n_chunks = F.ceil(F.size("t") / F.lit(float(CHUNK_W))).cast("int")
    chunk = F.array_join(F.slice(F.col("t"), F.col("i") * CHUNK_W + 1, CHUNK_W), " ")
    chunks = toks.select(
        "doc_id",
        F.posexplode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx", "i"),
        F.col("t"),
    ).select(
        "doc_id",
        "chunk_idx",
        F.xxhash64(chunk).alias("_h1"),
        F.xxhash64(F.lit(1), chunk).alias("_h2"),
        F.least(F.lit(CHUNK_W), F.size("t") - F.col("i") * CHUNK_W).alias("n_toks"),
    )
    w = Window.partitionBy("_h1", "_h2").orderBy("doc_id", "chunk_idx")
    return chunks.select("doc_id", "n_toks", F.row_number().over(w).alias("rn"))


def _novelty_scored(d):
    """Per-doc-gram novelty flags shared by corpus_ngram_novelty and
    pipeline_curation_v2: (doc_id, novel) rows, one per gram occurrence,
    novel=1 iff this doc is the gram's corpus-wide MIN(doc_id)."""
    from mysql_hbase_replicator_spark.operators.dedup import word_shingles

    ng = d.select(
        "doc_id", F.explode(word_shingles(F.col("text"), k=NOVELTY_W)).alias("gram")
    )
    firsts = ng.groupBy("gram").agg(F.min("doc_id").alias("first_doc"))
    return ng.join(firsts, "gram").select(
        "doc_id",
        F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0).alias("novel"),
    )


@query(
    "corpus_ngram_novelty",
    oracle=f"""
    WITH toks AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS t FROM documents),
    ng AS (
        SELECT DISTINCT doc_id,
               t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS gram
        FROM toks, UNNEST(RANGE(1, LEN(t) - 1)) AS u(i)
        WHERE LEN(t) >= {NOVELTY_W}
    ),
    firsts AS (SELECT gram, MIN(doc_id) AS first_doc FROM ng GROUP BY gram)
    SELECT n.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_grams,
           CAST(SUM(CASE WHEN f.first_doc = n.doc_id THEN 1 ELSE 0 END) AS BIGINT)
             AS n_novel,
           CAST(SUM(CASE WHEN f.first_doc = n.doc_id THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS novelty
    FROM ng n
    JOIN firsts f ON n.gram = f.gram
    GROUP BY n.doc_id
    """,
)
def corpus_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal n-gram novelty: for each document (in doc_id ingest order),
    the fraction of its distinct 3-gram shingles never seen in ANY
    earlier document — the freshness score curation uses to detect
    scrape-loop decay (novelty collapsing over time means the crawler is
    re-reading the same web) and to prioritize genuinely new material in a
    token budget.

    Scale shape: the "seen earlier" relation needs no ordered scan — a
    gram's first occurrence is just MIN(doc_id) per gram (one
    map-side-combined groupBy over the exploded shingles), and novelty is
    an equi-join of the doc-gram pairs against that gram-keyed table plus a
    per-doc rollup. Gram-key skew is bounded by document count per gram,
    the same quantity every dedup join here shuffles on. The ratio is
    bigint/bigint evaluated in double — exact on both engines."""
    d = load_table(spark, sf_dir, "documents")
    return (
        _novelty_scored(d)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum("novel").alias("n_novel"),
            (
                F.sum("novel").cast("double") / F.count(F.lit(1)).cast("double")
            ).alias("novelty"),
        )
    )


@query(
    "pipeline_curation_v2",
    oracle=f"""
    WITH toks2 AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS t FROM documents),
    chunks2 AS (
        SELECT doc_id, i AS chunk_idx,
               ARRAY_TO_STRING(t[(i * {CHUNK_W} + 1):(i * {CHUNK_W} + {CHUNK_W})], ' ') AS chunk,
               LEAST({CHUNK_W}, LEN(t) - i * {CHUNK_W}) AS n_toks
        FROM toks2,
             UNNEST(RANGE(0, CAST(CEIL(LEN(t) / {CHUNK_W}.0) AS BIGINT))) AS u(i)
    ),
    marked2 AS (
        SELECT doc_id, n_toks,
               ROW_NUMBER() OVER (PARTITION BY chunk
                                  ORDER BY doc_id, chunk_idx) AS rn
        FROM chunks2
    ),
    keptstats AS (
        SELECT doc_id,
               SUM(n_toks) AS n_tokens_total,
               SUM(CASE WHEN rn = 1 THEN n_toks ELSE 0 END) AS n_tokens_kept
        FROM marked2 GROUP BY doc_id
    ),
    ng2 AS (
        SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS gram
        FROM toks2, UNNEST(RANGE(1, LEN(t) - 1)) AS u(i)
        WHERE LEN(t) >= {NOVELTY_W}
    ),
    firsts2 AS (SELECT gram, MIN(doc_id) AS first_doc FROM ng2 GROUP BY gram),
    nov2 AS (
        SELECT n.doc_id,
               CAST(SUM(CASE WHEN f.first_doc = n.doc_id THEN 1 ELSE 0 END) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE) AS novelty
        FROM ng2 n JOIN firsts2 f ON n.gram = f.gram
        GROUP BY n.doc_id
    )
    SELECT d.source,
           CAST(COUNT(*) AS BIGINT) AS n_docs_kept,
           CAST(SUM(k.n_tokens_kept) AS BIGINT) AS tokens_kept,
           ROUND(AVG(v.novelty), 6) AS mean_novelty
    FROM documents d
    JOIN keptstats k ON k.doc_id = d.doc_id
    JOIN nov2 v ON v.doc_id = d.doc_id
    WHERE CAST(k.n_tokens_kept AS DOUBLE) / k.n_tokens_total >= 0.5
      AND v.novelty >= 0.6
    GROUP BY d.source
    """,
)
def pipeline_curation_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The r5-continuation curation pipeline composed end-to-end: chunk-level
    dedup statistics (≥50% of a doc's tokens must survive boilerplate
    removal) ∧ temporal n-gram novelty (≥0.6 of its 3-grams first seen in
    it) → per-source kept-document and kept-token accounting. The
    two sub-pipelines are exactly corpus_chunk_dedup and
    corpus_ngram_novelty (both independently oracle-verified); this query
    verifies their COMPOSITION into one Catalyst plan — the shape a real
    curation run executes, where each doc-level score is computed once and
    the gates apply together.

    Scale: both score pipelines shuffle on content keys (chunk / gram) then
    on doc_id; the final joins are doc-keyed and the rollup is per source.
    No stage widens: scores are one row per doc before the gates. The mean
    novelty is ROUNDed (summation-order ulps against a 1e-6 grid)."""
    d = load_table(spark, sf_dir, "documents")
    # the two sub-pipelines ARE the shared builders — this query verifies
    # their composition, not a re-implementation (r13 review)
    keptstats = _chunk_marked(d).groupBy("doc_id").agg(
        F.sum("n_toks").alias("n_tokens_total"),
        F.sum(F.when(F.col("rn") == 1, F.col("n_toks")).otherwise(0)).alias(
            "n_tokens_kept"
        ),
    )
    nov = (
        _novelty_scored(d)
        .groupBy("doc_id")
        .agg(
            (F.sum("novel").cast("double") / F.count(F.lit(1)).cast("double")).alias(
                "novelty"
            )
        )
    )
    return (
        d.select("doc_id", "source")
        .join(keptstats, "doc_id")
        .join(nov, "doc_id")
        .filter(
            (F.col("n_tokens_kept").cast("double") / F.col("n_tokens_total") >= 0.5)
            & (F.col("novelty") >= 0.6)
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs_kept"),
            F.sum("n_tokens_kept").alias("tokens_kept"),
            F.round(F.avg("novelty"), 6).alias("mean_novelty"),
        )
    )


# ingest-order bucket width (docs) for the vocabulary growth curve
VOCAB_BUCKET = 100


@query(
    "corpus_vocab_growth",
    oracle=f"""
    WITH toks AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS t FROM documents),
    grams AS (
        SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS term
        FROM toks, UNNEST(RANGE(1, LEN(t) - 1)) AS u(i)
        WHERE LEN(t) >= 3
    ),
    firsts AS (SELECT term, MIN(doc_id) AS fd FROM grams GROUP BY term),
    b AS (
        SELECT fd // {VOCAB_BUCKET} AS bucket, CAST(COUNT(*) AS BIGINT) AS new_terms
        FROM firsts GROUP BY 1
    )
    SELECT CAST(bucket * {VOCAB_BUCKET} AS BIGINT) AS docs_processed_start,
           new_terms,
           CAST(SUM(new_terms) OVER (ORDER BY bucket
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS vocab_size
    FROM b
    """,
)
def corpus_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary growth curve (Heaps' law audit): distinct 3-gram count as
    a function of documents ingested, in {B}-doc buckets (3-grams, not
    unigrams: the synthetic corpus' word vocabulary saturates inside the
    first bucket, while its gram space keeps growing — matching real
    corpora, where phrase-level novelty outlives word-level novelty) — the curve whose
    flattening tells curation the corpus has stopped contributing new
    language (the aggregate cousin of corpus_ngram_novelty's per-doc
    score). First-touch attribution again: a term's contribution bucket is
    MIN(doc_id)//{B}, so the whole curve is one term-keyed
    map-side-combined groupBy + a bucket rollup, and the cumulative window
    runs over the ≤ #docs/{B}-row bucket table — the fact-scale token
    stream never meets a window. All integers; exact on both engines."""
    from mysql_hbase_replicator_spark.operators.dedup import word_shingles

    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(word_shingles(F.col("text"), k=3)).alias("term")
    )
    firsts = toks.groupBy("term").agg(F.min("doc_id").alias("fd"))
    b = firsts.groupBy(
        F.floor(F.col("fd") / VOCAB_BUCKET).cast("long").alias("bucket")
    ).agg(F.count(F.lit(1)).alias("new_terms"))
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return b.select(
        (F.col("bucket") * VOCAB_BUCKET).alias("docs_processed_start"),
        "new_terms",
        F.sum("new_terms").over(w).alias("vocab_size"),
    )


# guarded: under `python -OO` docstrings are None (r13 review — the bare
# .replace crashed load_all_queries and with it the whole driver)
if corpus_vocab_growth.__doc__:
    corpus_vocab_growth.__doc__ = corpus_vocab_growth.__doc__.replace(
        "{B}", str(VOCAB_BUCKET)
    )


@query(
    "corpus_source_overlap",
    oracle=f"""
    WITH toks AS (SELECT doc_id, source, STRING_SPLIT(text, ' ') AS t
                  FROM documents),
    sg AS (
        SELECT DISTINCT source, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS gram
        FROM toks, UNNEST(RANGE(1, LEN(t) - 1)) AS u(i)
        WHERE LEN(t) >= {NOVELTY_W}
    ),
    counts AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM sg GROUP BY source),
    inter AS (
        SELECT a.source AS source_a, b.source AS source_b,
               CAST(COUNT(*) AS BIGINT) AS n_common
        FROM sg a JOIN sg b ON a.gram = b.gram AND a.source < b.source
        GROUP BY a.source, b.source
    )
    SELECT i.source_a, i.source_b, i.n_common,
           CAST(i.n_common AS DOUBLE)
             / CAST(ca.n + cb.n - i.n_common AS DOUBLE) AS gram_jaccard
    FROM inter i
    JOIN counts ca ON i.source_a = ca.source
    JOIN counts cb ON i.source_b = cb.source
    ORDER BY gram_jaccard DESC, i.source_a, i.source_b
    LIMIT 50
    """,
)
def corpus_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-redundancy matrix: 3-gram Jaccard overlap between every pair
    of ingest sources, top-50 — the mirror-site detector curation runs
    before weighting a domain mixture (two sources sharing most of their
    phrase space are one source counted twice). Same inverted-index
    equi-join shape as the doc-level dedup family, lifted to the source
    level: the distinct (source, gram) table is vocabulary-bounded per
    source, the gram join's fanout per key is ≤ #sources (not #docs — the
    DISTINCT collapses doc multiplicity first), and the pair aggregate is
    ≤ #sources² rows. Jaccard is bigint/bigint in double — exact both
    engines; total-ordered top-50."""
    from mysql_hbase_replicator_spark.operators.dedup import word_shingles

    d = load_table(spark, sf_dir, "documents")
    sg = d.select(
        "source", F.explode(word_shingles(F.col("text"), k=NOVELTY_W)).alias("gram")
    ).distinct()
    counts = sg.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    a = sg.select(F.col("source").alias("source_a"), "gram")
    b = sg.select(F.col("source").alias("source_b"), "gram")
    inter = (
        a.join(b, "gram")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    ca = counts.select(F.col("source").alias("source_a"), F.col("n").alias("n_a"))
    cb = counts.select(F.col("source").alias("source_b"), F.col("n").alias("n_b"))
    return (
        inter.join(ca, "source_a")
        .join(cb, "source_b")
        .select(
            "source_a",
            "source_b",
            "n_common",
            (
                F.col("n_common").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")).cast("double")
            ).alias("gram_jaccard"),
        )
        .orderBy(F.desc("gram_jaccard"), "source_a", "source_b")
        .limit(50)
    )


# Heavy hitters: share threshold 1/K_THRESH of all token occurrences; the
# per-partition Misra-Gries summary keeps K_CAP counters. K_CAP >= K_THRESH
# guarantees the candidate union is a SUPERSET of the true heavy hitters:
# pigeonhole says a term with global count > N/K_THRESH exceeds
# N_p/K_THRESH in at least one partition p, and a capacity-K_CAP summary
# retains every term with local count > N_p/(K_CAP+1) <= N_p/K_THRESH.
# The 2x margin costs only candidate-set size, never correctness — the
# exact recount filters.
HH_K_THRESH = 200
HH_K_CAP = 400


@query(
    "corpus_heavy_hitters",
    oracle=f"""
    WITH toks AS (
        SELECT u.term
        FROM (SELECT STRING_SPLIT(text, ' ') AS t FROM documents),
             UNNEST(t) AS u(term)
    ),
    tot AS (SELECT COUNT(*) AS n FROM toks)
    SELECT term,
           CAST(COUNT(*) AS BIGINT) AS n_occurrences,
           CAST(COUNT(*) AS DOUBLE) / (SELECT n FROM tot) AS share
    FROM toks
    GROUP BY term
    HAVING COUNT(*) * {HH_K_THRESH} > (SELECT n FROM tot)
    """,
)
def corpus_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent-token heavy hitters (count > N/HH_K_THRESH) by the classic
    two-phase sketch-then-verify pattern — the shape that survives a 100 TB
    corpus where the naive plan shuffles every (term, count) pair:

    1. SKETCH: one Arrow `mapInPandas` pass runs a mergeable Misra-Gries
       summary (Agarwal et al., "Mergeable Summaries") of K_CAP counters
       PER INPUT PARTITION — vectorized (value_counts per batch, merge,
       subtract the (K_CAP+1)-th largest, drop <=0), state held across the
       partition's batch iterator, output <= K_CAP candidate terms per
       partition. No shuffle at all in this phase.
    2. VERIFY: the candidate union (bounded by K_CAP x partitions —
       broadcastable at any scale) left-semi prunes the token stream, and
       only candidate terms are exactly recounted; the threshold compare is
       integer-exact (count*K > N, bigints on both engines).

    Because the sketch union provably contains every true heavy hitter
    (K_CAP >= K_THRESH, see constants above), the verified output is
    EXACTLY the brute-force answer — which is what the DuckDB oracle
    computes, so the approximate path is value-hash-checked, not trusted.
    The only Python is the per-partition counter dict, behind Arrow; the
    token stream itself is never collected or globally shuffled by term
    except for the candidate-pruned recount."""
    import pandas as pd

    d = load_table(spark, sf_dir, "documents")
    toks = d.select(F.explode(F.split(F.col("text"), " ")).alias("term"))

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

    candidates = toks.mapInPandas(mg_partition, "term string").dropDuplicates()
    n = d.select(F.explode(F.split(F.col("text"), " ")).alias("t")).agg(
        F.count(F.lit(1)).alias("n_total")
    )
    recount = (
        toks.join(F.broadcast(candidates), "term", "left_semi")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
    )
    return (
        recount.crossJoin(F.broadcast(n))
        .filter(F.col("n_occurrences") * HH_K_THRESH > F.col("n_total"))
        .select(
            "term",
            "n_occurrences",
            (F.col("n_occurrences").cast("double") / F.col("n_total")).alias("share"),
        )
    )


# Weight-proportional sampling: tickets per doc = clamp(ceil(n_chars/100),
# 1, 64); every ticket draws an md5 60-bit key and the doc keeps its MIN —
# a doc with twice the tickets has twice the chances at any low key, so
# bottom-K docs by min-ticket-key is a deterministic weighted sample
# (min-wise/ticketed sampling, the integer-exact cousin of the A-ES
# exponential race: no ln()/pow(), whose last-ulp differences across
# engines could flip a boundary selection — the same exactness rule that
# keeps tf-idf log-free).
SAMPLE_WEIGHTED_K = 300
_SW_TICKET_DIV = 100
_SW_MAX_TICKETS = 64


@query(
    "sample_weighted_length",
    oracle=f"""
    WITH ticks AS (
        SELECT doc_id, lang, n_chars,
               LEAST(GREATEST(CAST(CEIL(n_chars / {_SW_TICKET_DIV}.0) AS BIGINT),
                              1), {_SW_MAX_TICKETS}) AS w
        FROM documents
    ),
    exploded AS (
        SELECT doc_id, lang, n_chars, u.t
        FROM ticks, UNNEST(RANGE(0, w)) AS u(t)
    ),
    keyed AS (
        SELECT doc_id, lang, n_chars,
               MIN({_sql_hash60("wsamp:", "doc_id || ':' || t")}) AS sample_key
        FROM exploded GROUP BY doc_id, lang, n_chars
    )
    SELECT doc_id, lang, CAST(n_chars AS INT) AS n_chars, sample_key
    FROM keyed ORDER BY sample_key, doc_id LIMIT {SAMPLE_WEIGHTED_K}
    """,
)
def sample_weighted_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-weighted corpus subsample (inclusion chance ∝ document size,
    the shape quality- or token-budget-weighted selection takes when a
    mixture recipe says 'sample N docs, prefer substantial ones').

    Scale shape: the ticket explode is bounded ×64 per doc, the min-key
    collapse combines map-side, and the final bottom-K is orderBy+limit —
    TakeOrderedAndProject, a per-partition heap + driver merge of K rows,
    never a global sort. Every term is md5/integer arithmetic, so the
    DuckDB oracle replicates the draw bit for bit (a float exponential
    race would be 1-ulp-portable at best)."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    w = F.least(
        F.greatest(F.ceil(F.col("n_chars") / _SW_TICKET_DIV), F.lit(1)),
        F.lit(_SW_MAX_TICKETS),
    ).cast("int")
    tick = d.select(
        "doc_id",
        "lang",
        "n_chars",
        F.explode(F.sequence(F.lit(0), w - 1)).alias("t"),
    )
    key = hash60("wsamp:", F.concat_ws(":", F.col("doc_id"), F.col("t")))
    return (
        tick.groupBy("doc_id", "lang", "n_chars")
        .agg(F.min(key).alias("sample_key"))
        .orderBy("sample_key", "doc_id")
        .limit(SAMPLE_WEIGHTED_K)
        .select(
            "doc_id",
            "lang",
            F.col("n_chars").cast("int").alias("n_chars"),
            "sample_key",
        )
    )


@query(
    "corpus_mixture_weights",
    oracle="""
    WITH per_source AS (
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(LEN(STRING_SPLIT(text, ' '))) AS BIGINT) AS n_tokens
        FROM documents
        GROUP BY source
    )
    SELECT source, n_docs, n_tokens,
           ROUND(CAST(n_tokens AS DOUBLE) / SUM(n_tokens) OVER (), 6)
               AS token_share,
           ROUND(CAST(SUM(n_tokens) OVER () AS DOUBLE)
                 / (COUNT(*) OVER () * n_tokens), 6) AS uniform_weight
    FROM per_source
    ORDER BY source
    """,
)
def corpus_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture reweighting table: for each source, its realized
    token share and the per-document sampling weight that would flatten
    the mixture to uniform-across-sources (weight = target_share /
    realized_share = total/(n_sources * n_tokens)). This is the artifact a
    training-data loader consumes to hit a prescribed domain mixture
    without materializing a resampled corpus — the DoReMi-style knob in
    its simplest (uniform-target) form; corpus_domain_mixture samples,
    this WEIGHTS.

    Determinism: all aggregates are BIGINT token counts; each ratio is one
    double division of exact integers, then a 1e-6 ROUND. Scale: the token
    count collapses map-side (partial sum per file split), the global
    total is a 20-row unbounded window AFTER the per-source rollup — the
    window never sees document rows, so the single-partition stage is
    O(#sources), not O(corpus)."""
    d = load_table(spark, sf_dir, "documents")
    per_source = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split(F.col("text"), " ")).cast("long")).alias("n_tokens"),
    )
    w = Window.partitionBy()
    total = F.sum("n_tokens").over(w)
    n_sources = F.count(F.lit(1)).over(w)
    return per_source.select(
        "source",
        "n_docs",
        "n_tokens",
        F.round(F.col("n_tokens").cast("double") / total, 6).alias("token_share"),
        F.round(
            total.cast("double") / (n_sources * F.col("n_tokens")), 6
        ).alias("uniform_weight"),
    ).orderBy("source")


@query(
    "corpus_length_gini",
    oracle="""
    WITH ranked AS (
        SELECT source,
               CAST(n_chars AS BIGINT) AS x,
               CAST(ROW_NUMBER() OVER (PARTITION BY source
                                       ORDER BY n_chars, doc_id) AS BIGINT) AS i
        FROM documents
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(x) AS BIGINT) AS total_chars,
           ROUND(CAST(2 * SUM(i * x) AS DOUBLE) / (COUNT(*) * SUM(x))
                 - CAST(COUNT(*) + 1 AS DOUBLE) / COUNT(*), 6) AS gini
    FROM ranked
    GROUP BY source
    ORDER BY source
    """,
)
def corpus_length_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-length inequality (Gini coefficient) per source — the
    quick skew diagnostic for a corpus slice: ~0 means uniform lengths,
    →1 means a few giant documents carry all the tokens (a red flag for
    both dedup candidate generation and packing efficiency, and the
    statistic behind 'this crawl slice is 90% boilerplate stubs').

    Computed by the exact rank formula G = 2·Σi·x_i/(n·Σx) − (n+1)/n with
    ranks ordered (n_chars, doc_id) — the tiebreak makes Σi·x invariant
    between engines even though ranks of equal lengths are arbitrary.
    Every sum is BIGINT-exact; the closed form is evaluated once in
    double, then ROUNDed to the 1e-6 grid. Scale: the rank window
    partitions by source (parallel across sources; within a source the
    sort is the cost — at 100 TB swap ROW_NUMBER for a histogram-CDF
    approximation over n_chars buckets, same shape as the length-
    percentile filter's quantile-by-histogram)."""
    d = load_table(spark, sf_dir, "documents")
    wr = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    ranked = d.select(
        "source",
        F.col("n_chars").cast("long").alias("x"),
        F.row_number().over(wr).cast("long").alias("i"),
    )
    n = F.count(F.lit(1))
    return (
        ranked.groupBy("source")
        .agg(
            n.alias("n_docs"),
            F.sum("x").alias("total_chars"),
            F.round(
                (2 * F.sum(F.col("i") * F.col("x"))).cast("double")
                / (n * F.sum("x"))
                - (n + 1).cast("double") / n,
                6,
            ).alias("gini"),
        )
        .orderBy("source")
    )
