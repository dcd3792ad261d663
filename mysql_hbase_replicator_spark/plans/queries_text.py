"""EXT text-analysis operators over the `documents` table (SURVEY.md §2.11):
token counting, quality scoring, language-ID heuristic, fingerprinting.

All pure JVM-side built-ins (split/regexp/md5) — no Python UDFs in the hot
path, so whole-stage codegen covers the full pipeline and the same code runs
unchanged over 100 TB of documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mysql_hbase_replicator_spark.functions.normalize import (
    normalize_ws,
    normalize_ws_sql,
)
from mysql_hbase_replicator_spark.plans.registry import query
from mysql_hbase_replicator_spark.sources.tables import load_table


@query(
    "text_token_count",
    oracle="""
    SELECT doc_id,
           CAST(LEN(STRING_SPLIT(text, ' ')) AS INT) AS n_tokens,
           CAST(LENGTH(text) AS INT) AS n_chars_actual,
           CAST(LENGTH(REPLACE(text, ' ', '')) AS DOUBLE)
             / CAST(LEN(STRING_SPLIT(text, ' ')) AS DOUBLE) AS avg_token_len
    FROM documents
    """,
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace tokenizer + per-doc stats. A BPE-ish subword count would
    slot in as a pandas_udf; the whitespace path stays codegen'd."""
    d = load_table(spark, sf_dir, "documents")
    tokens = F.split(F.col("text"), " ")
    n_tokens = F.size(tokens)
    return d.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        F.length("text").alias("n_chars_actual"),
        (
            F.length(F.regexp_replace(F.col("text"), " ", "")).cast("double")
            / n_tokens.cast("double")
        ).alias("avg_token_len"),
    )


_NWS = normalize_ws_sql("text")


@query(
    "text_token_count_ws",
    oracle=f"""
    SELECT doc_id,
           CAST(LEN(STRING_SPLIT({_NWS}, ' ')) AS INT) AS n_tokens,
           CAST(LENGTH({_NWS}) AS INT) AS n_chars_actual,
           CAST(LENGTH(REPLACE({_NWS}, ' ', '')) AS DOUBLE)
             / CAST(LEN(STRING_SPLIT({_NWS}, ' ')) AS DOUBLE) AS avg_token_len
    FROM documents
    """,
)
def text_token_count_ws(spark: SparkSession, sf_dir: str) -> DataFrame:
    """text_token_count with the whitespace-canonicalization pre-pass: tabs,
    newlines, and space runs collapse to single spaces before tokenizing, so
    counts are correct on non-canonical corpora (a no-op on the canonical
    synthetic one — which is exactly what makes it oracle-checkable there;
    the messy-corpus behavior is hash-checked against DuckDB in
    tests/test_text_normalize.py)."""
    d = load_table(spark, sf_dir, "documents")
    text = normalize_ws(F.col("text"))
    tokens = F.split(text, " ")
    n_tokens = F.size(tokens)
    return d.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        F.length(text).alias("n_chars_actual"),
        (
            F.length(F.regexp_replace(text, " ", "")).cast("double")
            / n_tokens.cast("double")
        ).alias("avg_token_len"),
    )


@query(
    "text_quality_score",
    oracle="""
    SELECT doc_id, lang,
           CAST(LEN(STRING_SPLIT(text, ' ')) AS INT) AS n_tokens,
           CAST(LEN(STRING_SPLIT(text, ' the ')) - 1 AS INT) AS stopword_hits,
           CAST(LEN(STRING_SPLIT(text, ' ')) AS DOUBLE) / LENGTH(text) AS tokens_per_char
    FROM documents
    WHERE LENGTH(text) > 0
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality heuristics (length / token density / stopword hits) — the
    filters a pretraining pipeline runs before anything expensive."""
    d = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(F.split(F.col("text"), " "))
    stop_hits = F.size(F.split(F.col("text"), " the ")) - 1
    return d.filter(F.length("text") > 0).select(
        "doc_id",
        "lang",
        n_tokens.alias("n_tokens"),
        stop_hits.cast("int").alias("stopword_hits"),
        (n_tokens.cast("double") / F.length("text")).alias("tokens_per_char"),
    )


@query(
    "text_lang_id",
    oracle="""
    SELECT doc_id, lang AS labeled_lang,
           CASE WHEN LEN(STRING_SPLIT(text, 'the')) - 1 >= 2 THEN 'en'
                WHEN CONTAINS(text, 'der ') OR CONTAINS(text, ' und ') THEN 'de'
                WHEN CONTAINS(text, ' el ') OR CONTAINS(text, ' los ') THEN 'es'
                WHEN CONTAINS(text, ' le ') OR CONTAINS(text, ' les ') THEN 'fr'
                ELSE 'unknown' END AS guessed_lang
    FROM documents
    """,
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram/stopword language-ID heuristic. The *shape* is what matters for
    the engine: a pure-expression classifier that codegens; a real model would
    be a pandas_udf over the same column."""
    d = load_table(spark, sf_dir, "documents")
    the_hits = F.size(F.split(F.col("text"), "the")) - 1
    return d.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        F.when(the_hits >= 2, "en")
        .when(F.col("text").contains("der ") | F.col("text").contains(" und "), "de")
        .when(F.col("text").contains(" el ") | F.col("text").contains(" los "), "es")
        .when(F.col("text").contains(" le ") | F.col("text").contains(" les "), "fr")
        .otherwise("unknown")
        .alias("guessed_lang"),
    )


@query(
    "text_fingerprint",
    oracle="""
    SELECT doc_id,
           MD5(LOWER(text)) AS fingerprint,
           SUBSTRING(MD5(LOWER(text)), 1, 8) AS short_fp
    FROM documents
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic document fingerprint (md5 of normalized text) — the
    exact-dedup key and the cheap cross-run join key for provenance."""
    d = load_table(spark, sf_dir, "documents")
    fp = F.md5(F.encode(F.lower(F.col("text")), "UTF-8"))
    return d.select("doc_id", fp.alias("fingerprint"), F.substring(fp, 1, 8).alias("short_fp"))


# GPT-2-style pre-tokenizer classes, ASCII-simplified so the same pattern is
# valid Java regex (Spark) and RE2 (DuckDB): a token is an optional leading
# space + a letter run / digit run / punctuation run.
BPE_RX = r" ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 ]+"


@query(
    "text_token_count_bpe",
    oracle=f"""
    SELECT doc_id,
           CAST(LEN(REGEXP_EXTRACT_ALL(text, '{BPE_RX}')) AS INT) AS n_subword_tokens,
           CAST(LEN(STRING_SPLIT(text, ' ')) AS INT) AS n_ws_tokens
    FROM documents
    """,
)
def text_token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish token counting (the driver-mandate variant): a GPT-2-shaped
    pre-tokenizer regex counts subword-ish units JVM-side (regexp_count —
    no Python), alongside the whitespace count for calibration. At 100 TB
    this is a map-only pass; a true learned-BPE count would swap in a
    pandas_udf with a tokenizer model broadcast to executors."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.regexp_count(F.col("text"), F.lit(BPE_RX)).alias("n_subword_tokens"),
        F.size(F.split(F.col("text"), " ")).alias("n_ws_tokens"),
    )


@query(
    "pipeline_training_prep",
    oracle="""
    WITH filtered AS (
        SELECT doc_id, text, lang,
               CAST(LEN(STRING_SPLIT(text, ' ')) AS INT) AS n_tokens
        FROM documents
        WHERE LENGTH(text) >= 50
          AND LEN(STRING_SPLIT(text, ' ')) >= 10
          AND lang IN ('en', 'es', 'de', 'fr')
    ),
    deduped AS (
        SELECT MIN(doc_id) AS doc_id, MIN(lang) AS lang,
               MIN(n_tokens) AS n_tokens
        FROM filtered
        GROUP BY text
    )
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           MIN(doc_id) AS min_doc_id
    FROM deduped
    GROUP BY lang
    """,
)
def pipeline_training_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed training-data-prep pipeline over `documents` — the shape
    this engine exists for: quality gate (length + token floor) → language
    allow-list → exact dedup keeping the lowest doc_id → per-language corpus
    stats. Each stage is a map or a single keyed shuffle; the whole chain is
    one Catalyst plan, so filters fuse into the scan and the dedup groupBy is
    the only wide stage. The near-dup stage would slot in between via the
    MinHash band index (operators/dedup_stream.py) — excluded here so the
    composition stays SQL-expressible for the oracle."""
    d = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(F.split(F.col("text"), " "))
    filtered = (
        d.filter(
            (F.length("text") >= 50)
            & (F.col("lang").isin("en", "es", "de", "fr"))
        )
        .withColumn("n_tokens", n_tokens)
        .filter(F.col("n_tokens") >= 10)
    )
    # MIN, not first/any_value: duplicate texts can carry different lang
    # labels at larger SFs, and first() is shuffle-order-dependent
    deduped = filtered.groupBy("text").agg(
        F.min("doc_id").alias("doc_id"),
        F.min("lang").alias("lang"),
        F.min("n_tokens").alias("n_tokens"),
    )
    return deduped.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.min("doc_id").alias("min_doc_id"),
    )


TFIDF_TOP_N = 3


def _tfidf_weighted_terms(
    d, df_prune_inv: int | None = None
):
    """The log-free TF-IDF weight pipeline — tokenize → tf → df → N_docs →
    wt = tf*N/df — shared by text_tfidf_top_terms and
    text_tfidf_cosine_pairs (r13 review: two copies of the cross-engine
    exactness contract). ``df_prune_inv`` keeps only terms with
    df*prune <= N (the cosine query's common-term prune); None keeps all.
    Returns (doc_id, term, wt)."""
    toks = d.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = d.agg(F.count(F.lit(1)).alias("n_docs"))
    w = tf.join(df, "term").crossJoin(F.broadcast(n))
    if df_prune_inv is not None:
        w = w.filter(F.col("df") * df_prune_inv <= F.col("n_docs"))
    return w.select(
        "doc_id",
        "term",
        (
            (F.col("tf") * F.col("n_docs")).cast("double")
            / F.col("df").cast("double")
        ).alias("wt"),
    )


@query(
    "text_tfidf_top_terms",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, u.term
        FROM (SELECT doc_id, STRING_SPLIT(text, ' ') AS t FROM documents),
             UNNEST(t) AS u(term)
    ),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term),
    df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.term,
               CAST(tf.tf * n.n_docs AS DOUBLE) / CAST(df.df AS DOUBLE) AS tfidf
        FROM tf JOIN df USING (term) CROSS JOIN n
    )
    SELECT doc_id, term, tfidf, CAST(rn AS INT) AS rank
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                       ORDER BY tfidf DESC, term) AS rn
          FROM scored)
    WHERE rn <= {TFIDF_TOP_N}
    """,
)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top distinguishing terms per document by a log-free TF-IDF:
    score = tf × N_docs / df — the same ordering as tf × (N/df) with the
    familiar idf log dropped, because bigint multiply + one double divide is
    bit-identical across engines while ln() implementations can differ in
    the last ulp (the engine's oracle-exactness rule beats textbook
    cosmetics; the ranking is unchanged for fixed tf since x/df is monotone
    in df).

    Scale shape: tokenize is map-only; tf is one (doc, term) shuffle with
    partial aggregation; df is a second shuffle over the already-collapsed
    tf table; N_docs is a broadcast 1-row cross join; the final top-N window
    partitions by doc_id. No step holds more than (distinct terms per doc)
    rows per key."""
    d = load_table(spark, sf_dir, "documents")
    scored = _tfidf_weighted_terms(d).withColumnRenamed("wt", "tfidf")
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), "term")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TFIDF_TOP_N)
        .select("doc_id", "term", "tfidf", "rank")
    )


# PII patterns — conservative syntax that parses identically as Java regex
# (Spark) and RE2 (DuckDB): character classes, bounded repeats, \b word
# boundaries; no lookaround, no backrefs.
PII_EMAIL_RX = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE_RX = r"\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b"
PII_IP_RX = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"


@query(
    "text_pii_redact",
    oracle=f"""
    SELECT doc_id,
           REGEXP_REPLACE(REGEXP_REPLACE(REGEXP_REPLACE(text,
               '{PII_EMAIL_RX}', '<EMAIL>', 'g'),
               '{PII_PHONE_RX}', '<PHONE>', 'g'),
               '{PII_IP_RX}', '<IP>', 'g') AS redacted_text,
           CAST(LEN(REGEXP_EXTRACT_ALL(text, '{PII_EMAIL_RX}')) AS INT) AS n_emails,
           CAST(LEN(REGEXP_EXTRACT_ALL(text, '{PII_PHONE_RX}')) AS INT) AS n_phones,
           CAST(LEN(REGEXP_EXTRACT_ALL(text, '{PII_IP_RX}')) AS INT) AS n_ips
    FROM documents
    """,
)
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing — redact emails, US-style phone numbers, and IPv4
    addresses to typed placeholder tags, reporting per-document match counts
    (counted on the ORIGINAL text; replacement is sequenced email → phone →
    ip on the progressively redacted string, identically in both engines).

    Map-only over the corpus: three regexp_replace + three
    regexp_extract_all calls inside whole-stage codegen, no shuffle at all.
    A no-op on the clean synthetic corpus (which is what makes it
    oracle-checkable there); redaction behavior on PII-bearing text is
    hash-checked against DuckDB with a constructed fixture in
    tests/test_text_normalize.py."""
    d = load_table(spark, sf_dir, "documents")
    text = F.col("text")
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(text, PII_EMAIL_RX, "<EMAIL>"),
            PII_PHONE_RX,
            "<PHONE>",
        ),
        PII_IP_RX,
        "<IP>",
    )
    return d.select(
        "doc_id",
        redacted.alias("redacted_text"),
        F.size(F.regexp_extract_all(text, F.lit(PII_EMAIL_RX), 0)).alias("n_emails"),
        F.size(F.regexp_extract_all(text, F.lit(PII_PHONE_RX), 0)).alias("n_phones"),
        F.size(F.regexp_extract_all(text, F.lit(PII_IP_RX), 0)).alias("n_ips"),
    )


@query(
    "text_gopher_quality",
    oracle="""
    SELECT doc_id,
           CAST(LEN(STRING_SPLIT(text, ' ')) AS INT) AS n_words,
           CAST(LENGTH(REPLACE(text, ' ', '')) AS DOUBLE)
             / LEN(STRING_SPLIT(text, ' ')) AS mean_word_len,
           CAST(LEN(LIST_DISTINCT(STRING_SPLIT(text, ' '))) AS DOUBLE)
             / LEN(STRING_SPLIT(text, ' ')) AS frac_distinct_words,
           CAST(LIST_MAX(LIST_TRANSFORM(STRING_SPLIT(text, ' '),
                                        w -> LENGTH(w))) AS INT) AS longest_word_len,
           CAST(CASE WHEN LEN(STRING_SPLIT(text, ' ')) BETWEEN 50 AND 100000
                      AND CAST(LENGTH(REPLACE(text, ' ', '')) AS DOUBLE)
                            / LEN(STRING_SPLIT(text, ' ')) BETWEEN 3 AND 10
                     THEN 1 ELSE 0 END AS INT) AS passes_gopher
    FROM documents
    """,
)
def text_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition/shape quality gates (word count bounds, mean
    word length bounds, distinct-word fraction, longest word) with a 0/1
    pass flag — the rule family the Gopher/MassiveText pipeline applies
    before any model-based scoring. All exact integer/division arithmetic
    (no logs), so the flag is bit-stable across engines; map-only, fully
    inside whole-stage codegen."""
    d = load_table(spark, sf_dir, "documents")
    tokens = F.split(F.col("text"), " ")
    n_words = F.size(tokens)
    mean_len = F.length(F.regexp_replace(F.col("text"), " ", "")).cast("double") / n_words
    return d.select(
        "doc_id",
        n_words.alias("n_words"),
        mean_len.alias("mean_word_len"),
        (F.size(F.array_distinct(tokens)).cast("double") / n_words).alias(
            "frac_distinct_words"
        ),
        F.array_max(F.transform(tokens, F.length)).alias("longest_word_len"),
        F.when(
            (n_words >= 50) & (n_words <= 100000) & (mean_len >= 3.0) & (mean_len <= 10.0),
            1,
        )
        .otherwise(0)
        .cast("int")
        .alias("passes_gopher"),
    )


TRIGRAM_TOP_N = 10


@query(
    "text_char_trigram_profile",
    oracle=f"""
    WITH tg AS (
        SELECT lang,
               UNNEST(LIST_TRANSFORM(RANGE(1, LENGTH(text) - 1),
                                     i -> SUBSTRING(text, i, 3))) AS trigram
        FROM documents
    ),
    counted AS (
        SELECT lang, trigram, COUNT(*) AS n
        FROM tg GROUP BY lang, trigram
    )
    SELECT lang, trigram, n, CAST(rn AS INT) AS rank
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY lang
                                       ORDER BY n DESC, trigram) AS rn
          FROM counted)
    WHERE rn <= {TRIGRAM_TOP_N}
    """,
)
def text_char_trigram_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language top character trigrams — the model behind real n-gram
    language ID (langid/CLD build exactly these profiles; text_lang_id's
    stopword heuristic is the inference side). Trigram construction is a
    transform over an index sequence (codegen, no Python); the count is one
    (lang, trigram) shuffle with partial aggregation; the top-N window
    partitions by lang. The per-lang key space is bounded (alphabet³), so
    the final stage is O(langs × alphabet³) regardless of corpus size."""
    d = load_table(spark, sf_dir, "documents")
    text = F.col("text")
    n = F.length(text)
    # clamped so sub-3-char docs can't produce a descending sequence under
    # eager branch evaluation; the when() still drops them
    idx = F.sequence(F.lit(1), F.greatest(n - F.lit(2), F.lit(1)))
    trigrams = F.transform(idx, lambda i: F.substring(text, i, F.lit(3)))
    tg = d.select(
        "lang",
        F.explode(F.when(n >= 3, trigrams)).alias("trigram"),
    )
    counted = tg.groupBy("lang", "trigram").agg(F.count(F.lit(1)).alias("n"))
    from pyspark.sql import Window

    w = Window.partitionBy("lang").orderBy(F.desc("n"), "trigram")
    return (
        counted.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TRIGRAM_TOP_N)
        .select("lang", "trigram", "n", "rank")
    )


HASH_DIM = 256  # feature-hashing buckets


@query(
    "text_hashing_vectorizer",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, u.term
        FROM (SELECT doc_id, STRING_SPLIT(text, ' ') AS t FROM documents),
             UNNEST(t) AS u(term)
    )
    SELECT doc_id,
           CAST(CAST(('0x' || SUBSTR(MD5(term), 1, 15)) AS BIGINT)
                % {HASH_DIM} AS INT) AS bucket,
           COUNT(*) AS cnt
    FROM toks
    GROUP BY 1, 2
    """,
)
def text_hashing_vectorizer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature hashing (the hashing-trick vectorizer): each token maps to
    one of HASH_DIM buckets by md5, per-document bucket counts are the
    sparse feature vector — the fixed-width, vocabulary-free featurization
    a streaming ML pipeline uses (no global vocab pass, no dictionary to
    broadcast). The md5-derived bucket reproduces exactly in DuckDB, unlike
    murmur-based hashingTF. One (doc, bucket) shuffle with map-side partial
    counts; output is O(docs × distinct buckets per doc)."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("term"))
    bucket = (
        F.conv(F.substring(F.md5(F.col("term")), 1, 15), 16, 10).cast("long")
        % HASH_DIM
    ).cast("int")
    return toks.groupBy("doc_id", bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("cnt")
    )


# TF-IDF cosine near-dup pairs: the weighted-sparse-vector companion to
# dedup_ngram_jaccard. Terms with df > n_docs/DF_PRUNE_INV are dropped from
# the vector space (stopword pruning — ALSO the join-fanout bound: the
# inverted-index join fans out by df, so pruning high-df terms caps the
# candidate blowup at scale).
TFIDF_DF_PRUNE_INV = 10

# input cap for the exact pair generator below — same convention and value
# as operators/dedup.EXACT_BASELINE_MAX_DOCS (kept numerically in sync by
# test_plans; duplicated here so the oracle f-string needs no import)
_TFIDF_MAX_DOCS = 10_000
TFIDF_COS_MIN = 0.5
_Q9 = 1_000_000_000.0


@query(
    "text_tfidf_cosine_pairs",
    oracle=f"""
    WITH capped AS (SELECT doc_id, text FROM documents WHERE doc_id < {_TFIDF_MAX_DOCS}),
    toks AS (SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS term FROM capped),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term),
    df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    n AS (SELECT COUNT(*) AS n_docs FROM capped),
    w AS (
        SELECT tf.doc_id, tf.term,
               CAST(tf.tf * n.n_docs AS DOUBLE) / CAST(df.df AS DOUBLE) AS wt
        FROM tf JOIN df USING (term) CROSS JOIN n
        WHERE df.df * {TFIDF_DF_PRUNE_INV} <= n.n_docs
    ),
    norms AS (
        SELECT doc_id, SUM(CAST(FLOOR(wt * wt * {_Q9}) AS DECIMAL(38,0))) AS n9
        FROM w GROUP BY doc_id
    ),
    nums AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               SUM(CAST(FLOOR(a.wt * b.wt * {_Q9}) AS DECIMAL(38,0))) AS num9
        FROM w a JOIN w b ON a.term = b.term AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    ),
    scored AS (
        SELECT doc_a, doc_b,
               ROUND((CAST(num9 AS DOUBLE) / {_Q9})
                     / SQRT((CAST(na.n9 AS DOUBLE) / {_Q9})
                            * (CAST(nb.n9 AS DOUBLE) / {_Q9})), 6) AS cosine
        FROM nums
        JOIN norms na ON nums.doc_a = na.doc_id
        JOIN norms nb ON nums.doc_b = nb.doc_id
    )
    SELECT doc_a, doc_b, cosine FROM scored WHERE cosine >= {TFIDF_COS_MIN}
    """,
)
def text_tfidf_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-free near-dup pairs by TF-IDF cosine over the df-pruned
    term space — the weighted counterpart of dedup_ngram_jaccard (which
    treats all shingles equally). Weights are the engine's log-free
    tf × N/df (see text_tfidf_top_terms for why no ln()); dot products and
    norms accumulate on the 1e-9 quantized integer grid (the kmeans-moment
    trick), so every float crossing an aggregation is shuffle-order-free
    and bit-identical to the DuckDB oracle.

    Scale shape: the pair generation is an inverted-index equi-join on term
    — fanout per term is its df, and the df prune (terms in > n/{TFIDF_DF_PRUNE_INV}
    of docs are dropped) bounds the per-term fanout — but when the corpus
    itself is near-dup-heavy, sum(df²) over even the pruned vocabulary
    grows quadratically in the duplication factor (measured: 33x wall at
    10x data on the salted-near-dup sf~1 probe, SCALING.md). So like every
    exact pair generator in this engine (dedup_ngram_jaccard,
    dedup_embedding_cosine, the CC edge build) the REGISTERED form bounds
    its input to the first EXACT_BASELINE_MAX_DOCS doc ids — the
    correctness baseline the bounded-fanout scale paths (MinHash-LSH,
    SimHash, embedding-LSH) are verified against; identical cap in the
    oracle, no-op at every test SF (< 10k docs). No all-pairs product
    anywhere; norms are one (doc_id) aggregate."""
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < _TFIDF_MAX_DOCS
    )
    w = _tfidf_weighted_terms(d, df_prune_inv=TFIDF_DF_PRUNE_INV)

    def q9(x):
        # exact floor WITHOUT long saturation (r13 review): Spark's
        # floor(double) returns BIGINT, clamping above ~9.2e18 where the
        # oracle's FLOOR stays double-exact. Below 2^53 the long floor is
        # exact; at or above 2^53 the double is already integral, so the
        # decimal cast (HALF_UP over a zero fraction) IS the floor —
        # matching DuckDB's FLOOR(double)::DECIMAL in both regimes.
        y = x * F.lit(_Q9)
        return F.when(
            y < F.lit(float(2**53)), F.floor(y).cast("decimal(38,0)")
        ).otherwise(y.cast("decimal(38,0)"))

    norms = w.groupBy("doc_id").agg(F.sum(q9(F.col("wt") * F.col("wt"))).alias("n9"))
    a = w.select(F.col("doc_id").alias("doc_a"), "term", F.col("wt").alias("wa"))
    b = w.select(F.col("doc_id").alias("doc_b"), "term", F.col("wt").alias("wb"))
    nums = (
        a.join(b, "term")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.sum(q9(F.col("wa") * F.col("wb"))).alias("num9"))
    )
    na = norms.select(F.col("doc_id").alias("doc_a"), F.col("n9").alias("na9"))
    nb = norms.select(F.col("doc_id").alias("doc_b"), F.col("n9").alias("nb9"))
    return (
        nums.join(na, "doc_a")
        .join(nb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                (F.col("num9").cast("double") / F.lit(_Q9))
                / F.sqrt(
                    (F.col("na9").cast("double") / F.lit(_Q9))
                    * (F.col("nb9").cast("double") / F.lit(_Q9))
                ),
                6,
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= TFIDF_COS_MIN)
    )


@query(
    "text_bigram_coherence",
    oracle="""
    WITH toks AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS t FROM documents),
    bg AS (
        SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
        FROM toks, UNNEST(RANGE(1, LEN(t))) AS u(i)
    ),
    uni AS (SELECT w1, COUNT(*) AS c1 FROM bg GROUP BY w1),
    bi AS (SELECT w1, w2, COUNT(*) AS c12 FROM bg GROUP BY w1, w2)
    SELECT b.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           ROUND(AVG(CAST(bi.c12 AS DOUBLE) / CAST(uni.c1 AS DOUBLE)), 6)
             AS mean_transition_prob
    FROM bg b
    JOIN bi ON b.w1 = bi.w1 AND b.w2 = bi.w2
    JOIN uni ON b.w1 = uni.w1
    GROUP BY b.doc_id
    """,
)
def text_bigram_coherence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-LM coherence score: train a bigram model on the corpus itself
    (conditional probability P(w2|w1) = C(w1,w2)/C(w1), MLE) and score
    every document by its mean transition probability — the log-free
    cousin of LM perplexity filtering: low scores flag token-salad
    documents whose transitions the corpus has never reinforced, high
    scores flag templated/repetitive text.

    Scale shape: bigram extraction is map-side; the model is two
    map-side-combined groupBys whose cardinality is vocabulary-bounded
    (V and observed-V², both df-prunable in a production run); scoring
    re-joins the doc bigrams against the model on the bigram key — an
    equi join whose build side is the model, i.e. domain-bounded, not
    corpus-bounded — then one rollup per doc. Probabilities are
    bigint/bigint divisions (identical doubles on both engines); the
    per-doc mean is ROUNDed to 6 dp to absorb summation-order ulps
    (~1e-16 against a 1e-6 grid)."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.split(F.col("text"), " ").alias("t"))
    bg = toks.select(
        "doc_id",
        F.explode(
            F.zip_with(
                F.slice(F.col("t"), 1, F.size("t") - 1),
                F.slice(F.col("t"), 2, F.size("t") - 1),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("p"),
    ).select("doc_id", "p.w1", "p.w2")
    uni = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    bi = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    scored = (
        bg.join(bi, ["w1", "w2"])
        .join(uni, "w1")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(
                F.avg(F.col("c12").cast("double") / F.col("c1").cast("double")), 6
            ).alias("mean_transition_prob"),
        )
    )
    return scored


@query(
    "text_perplexity_bucket",
    oracle="""
    WITH tok AS (
        SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS tok FROM documents
    ),
    cnt AS (SELECT tok, COUNT(*) AS c FROM tok GROUP BY tok),
    tot AS (SELECT SUM(c) AS total FROM cnt),
    scored AS (
        SELECT t.doc_id,
               CAST(COUNT(*) AS INT) AS n_tokens,
               ROUND(LN((SELECT total FROM tot)) - SUM(LN(c.c)) / COUNT(*), 6)
                 AS xent
        FROM tok t JOIN cnt c USING (tok)
        GROUP BY t.doc_id
    ),
    h AS (SELECT xent, COUNT(*) AS hc FROM scored GROUP BY xent),
    cum AS (
        SELECT xent,
               SUM(hc) OVER (ORDER BY xent
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS cf
        FROM h
    ),
    n AS (SELECT COUNT(*) AS n_docs FROM scored),
    t1 AS (SELECT MIN(xent) AS t1 FROM cum, n WHERE cf >= n_docs / 3.0),
    t2 AS (SELECT MIN(xent) AS t2 FROM cum, n WHERE cf >= 2.0 * n_docs / 3.0)
    SELECT s.doc_id, s.n_tokens, s.xent,
           CASE WHEN s.xent <= t1.t1 THEN 'head'
                WHEN s.xent <= t2.t2 THEN 'middle'
                ELSE 'tail' END AS bucket
    FROM scored s, t1, t2
    """,
)
def text_perplexity_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM cross-entropy scoring + head/middle/tail bucketing — the
    CCNet-style quality gate: score each document by the mean negative log
    probability of its tokens under a unigram LM trained on the corpus
    itself (xent = ln(total_tokens) - mean ln(token_count), in nats), then
    split the corpus into thirds by score. 'head' (lowest cross-entropy)
    is the fluent-register slice pretraining mixes upweight; 'tail' is the
    boilerplate/noise slice they drop or downweight.

    Scale shape: the LM is one map-side-combined groupBy over tokens (its
    size is the vocabulary, not the corpus); scoring is an equi-join of
    exploded tokens against it plus a per-doc rollup; the thirds come from
    the quantile-by-histogram pattern (corpus_len_percentile_filter) on
    the ROUNDED score — order-statistic thresholds over a bounded
    histogram, no global sort of 100 TB of scores. Rounding to 1e-6 before
    thresholding keeps the histogram domain and the bucket boundaries
    bit-identical across engines despite float-sum ordering."""
    from pyspark.sql.window import Window

    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("tok"))
    cnt = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    tot = cnt.agg(F.sum("c").alias("total"))
    scored = (
        tok.join(cnt, "tok")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_tokens"),
            F.sum(F.log("c")).alias("slog"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            "n_tokens",
            F.round(
                F.log("total") - F.col("slog") / F.col("n_tokens"), 6
            ).alias("xent"),
        )
    )
    h = scored.groupBy("xent").agg(F.count(F.lit(1)).alias("hc"))
    wc = Window.orderBy("xent").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = h.select("xent", F.sum("hc").over(wc).alias("cf"))
    n = scored.agg(F.count(F.lit(1)).alias("n_docs"))
    cum_n = cum.crossJoin(F.broadcast(n))
    t1 = cum_n.filter(F.col("cf") >= F.col("n_docs") / 3.0).agg(
        F.min("xent").alias("t1")
    )
    t2 = cum_n.filter(F.col("cf") >= 2.0 * F.col("n_docs") / 3.0).agg(
        F.min("xent").alias("t2")
    )
    return (
        scored.crossJoin(F.broadcast(t1))
        .crossJoin(F.broadcast(t2))
        .select(
            "doc_id",
            "n_tokens",
            "xent",
            F.when(F.col("xent") <= F.col("t1"), "head")
            .when(F.col("xent") <= F.col("t2"), "middle")
            .otherwise("tail")
            .alias("bucket"),
        )
    )


@query(
    "text_ttr_lexical_diversity",
    oracle="""
    WITH per_doc AS (
        SELECT doc_id, source,
               CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS n_tokens,
               CAST(LEN(LIST_DISTINCT(STRING_SPLIT(text, ' '))) AS BIGINT)
                   AS n_types
        FROM documents
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(SUM(n_types) AS BIGINT) AS total_types,
           ROUND(CAST(SUM(n_types) AS DOUBLE) / SUM(n_tokens), 6)
               AS pooled_ttr,
           ROUND(MIN(CAST(n_types AS DOUBLE) / n_tokens), 6) AS min_doc_ttr,
           ROUND(MAX(CAST(n_types AS DOUBLE) / n_tokens), 6) AS max_doc_ttr
    FROM per_doc
    GROUP BY source
    ORDER BY source
    """,
)
def text_ttr_lexical_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-token ratio (lexical diversity) profiled per source — the
    classic 'is this corpus slice repetitive boilerplate or varied prose'
    quality gate that sits beside the Gopher ratios in a pre-training
    filter stack. Per doc: types = distinct whitespace tokens, TTR =
    types/tokens; per source we report the POOLED ratio (sum of integer
    type/token counts, divided once) plus the doc-level min/max — pooling
    keeps the aggregate decimal-exact (BIGINT sums, a single double
    division), where an avg-of-doubles would be shuffle-order-dependent.

    Scale: array_distinct runs inside codegen per row (no explode, no
    shuffle of token rows); the only shuffle is the per-source rollup of
    4 integers. min/max of per-row doubles are order-insensitive."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    per_doc = d.select(
        "source",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_types"),
    )
    ttr = F.col("n_types").cast("double") / F.col("n_tokens")
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.sum("n_types").alias("total_types"),
            F.round(
                F.sum("n_types").cast("double") / F.sum("n_tokens"), 6
            ).alias("pooled_ttr"),
            F.round(F.min(ttr), 6).alias("min_doc_ttr"),
            F.round(F.max(ttr), 6).alias("max_doc_ttr"),
        )
        .orderBy("source")
    )
