"""Skew-mitigated (salted) equi-join (SURVEY.md §2.4 / scale notes).

AQE's skew-join splitting (on by default in session.py) handles most skew at
runtime; explicit salting remains the tool when a single join key dominates
so heavily that even split shuffle blocks overwhelm one executor, or when
AQE is unavailable (streaming joins). The salt spreads one hot key over
``n_salts`` shuffle partitions at the cost of replicating the build side
``n_salts``×, so it suits big-skewed ⋈ small/medium shapes.

Deterministic: the salt is a hash of the probe row's full content, not a
random number — same input, same plan, same result.

Two forms: ``salted_join`` spreads EVERY key over a fixed ``n_salts``
(simple, zero extra passes, but replicates the whole build side n_salts×
whether or not the data is skewed, and a fixed width under-splits a hot key
that keeps growing); ``adaptive_salted_join`` derives a PER-KEY width from
a sampled key histogram, so cold keys pay nothing and a hot key's width
grows with its measured share — the right default when the skew profile
isn't known ahead of time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT = "_salt"


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: list[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``skewed``'s hot keys are spread across ``n_salts``
    sub-keys and ``other`` is replicated once per salt. For the supported
    join types the result equals ``skewed.join(other, on, how)`` exactly;
    only the shuffle layout differs.

    ``how`` is restricted to probe-side-exact types: inner, left/left_outer,
    left_semi, left_anti. Build-side-preserving joins (right/full outer)
    would emit each unmatched ``other`` row once PER SALT COPY — n_salts
    duplicated null-extended rows — so they are rejected rather than
    silently wrong.
    """
    allowed = {"inner", "left", "leftouter", "left_outer", "leftsemi", "left_semi", "leftanti", "left_anti"}
    if how.lower().replace("_", "") not in {h.replace("_", "") for h in allowed}:
        raise ValueError(
            f"salted_join supports inner/left/left_semi/left_anti, not {how!r}: "
            f"the build side is replicated {n_salts}x, so build-side-preserving "
            f"joins would duplicate unmatched rows once per salt"
        )
    if n_salts < 1:
        # pmod(x, 0) is NULL with ANSI off — the join would silently return
        # empty instead of erroring (r13 review)
        raise ValueError(f"n_salts must be >= 1, got {n_salts}")
    if SALT in skewed.columns or SALT in other.columns:
        raise ValueError(f"column {SALT} already present")
    # salt on a per-ROW nonce, not row content: hot keys are hot precisely
    # because many rows share a key (and often the full row — e.g. a probe
    # pre-projected to its join keys), so a content hash lands them all in
    # ONE lane while the build side still pays n_salts-fold replication —
    # strictly worse than not salting (r13 review). Consecutive per-partition
    # ids round-robin the lanes evenly.
    probe = skewed.withColumn(
        SALT,
        F.pmod(F.monotonically_increasing_id(), F.lit(n_salts)).cast("int"),
    )
    build = other.withColumn(
        SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<int>"))
    )
    return probe.join(build, [*on, SALT], how).drop(SALT)


WIDTH = "_salt_w"


def sampled_key_widths(
    skewed: DataFrame,
    on: list[str],
    sample_fraction: float = 0.02,
    rows_per_salt: int = 1_000_000,
    max_salts: int = 256,
    seed: int = 7,
) -> list[tuple]:
    """One cheap histogram pass: sample ``sample_fraction`` of the probe,
    count per key (map-side partials collapse the hot key before the
    shuffle, so the shuffle is O(distinct sampled keys)), and return
    ``[(key_values..., width)]`` for every key whose ESTIMATED full count
    (sampled count / fraction) spans more than one salt lane:

        width = clamp(ceil(est_rows / rows_per_salt), 1, max_salts)

    Only keys with width >= 2 are returned, so the driver-side list is
    bounded by total_rows / rows_per_salt regardless of key cardinality —
    at 100 TB with rows_per_salt sized to a shuffle partition's row budget
    that is O(number of oversized keys), a broadcastable handful.
    """
    if not 0 < sample_fraction <= 1:
        raise ValueError(f"sample_fraction must be in (0, 1], got {sample_fraction}")
    # sampled count threshold at which the estimate first exceeds one lane
    min_hot = rows_per_salt * sample_fraction
    counts = (
        skewed.select(*on)
        .sample(fraction=sample_fraction, seed=seed)
        .groupBy(*on)
        .count()
        .filter(F.col("count") > F.lit(min_hot))
    )
    out = []
    for row in counts.collect():
        est = row["count"] / sample_fraction
        width = min(max_salts, max(1, -(-int(est) // rows_per_salt)))
        if width >= 2:
            out.append(tuple(row[c] for c in on) + (width,))
    return out


def adaptive_salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: list[str],
    how: str = "inner",
    sample_fraction: float = 0.02,
    rows_per_salt: int = 1_000_000,
    max_salts: int = 256,
    seed: int = 7,
) -> DataFrame:
    """Skew-salted equi-join whose salt width is derived from the data
    instead of fixed (mirrors AQE's skew-split sizing for the
    non-AQE-able salted-build case, e.g. streaming joins):

    1. ``sampled_key_widths`` estimates per-key row counts from one sampled
       partial-agg pass and assigns each oversized key a width
       proportional to its size (ceil(est / rows_per_salt), capped).
    2. The hot-key→width map is broadcast-joined onto BOTH sides; keys not
       in the map get width 1 (no replication, no spreading).
    3. The probe salts each row with ``hash(row) % width(key)``; the build
       side is replicated exactly ``width(key)`` times per row — cold keys
       replicate 0 extra copies, so (unlike a fixed n_salts) a skew-free
       input pays only the sampling pass and a broadcast join against an
       empty/small map, not an n_salts× build-side blowup.

    Semantics match ``skewed.join(other, on, how)`` exactly for the same
    probe-side-exact join types ``salted_join`` allows; only the shuffle
    layout differs. Deterministic for a fixed input partitioning: the
    sample is seeded and the salt is a content hash.
    """
    allowed = {"inner", "left", "leftouter", "leftsemi", "leftanti"}
    if how.lower().replace("_", "") not in allowed:
        raise ValueError(
            f"adaptive_salted_join supports inner/left/left_semi/left_anti, "
            f"not {how!r}: the build side is replicated per-key-width, so "
            f"build-side-preserving joins would duplicate unmatched rows"
        )
    for col in (SALT, WIDTH):
        if col in skewed.columns or col in other.columns:
            raise ValueError(f"column {col} already present")

    hot = sampled_key_widths(
        skewed, on, sample_fraction, rows_per_salt, max_salts, seed
    )
    if not hot:
        # No oversized key found: every width is 1, so the salt column is
        # identically 0 on both sides and joining on [*on, SALT] equals
        # joining on `on` alone — skip the salt machinery entirely (r17,
        # guide §2.4). This removes two broadcast width-attach joins, the
        # build-side explode, and — decisively — lets the planner pick a
        # broadcast join for a small build side: the salted form's explode
        # destroyed the build's size estimate, forcing a full shuffle +
        # sort-merge of the probe on a key extended with a constant.
        # Result equality is exact (the oracle row proves it); the salted
        # path below is exercised whenever the histogram finds real skew
        # (tests + the bench skew block).
        return skewed.join(other, on, how)
    spark = skewed.sparkSession
    key_fields = [skewed.schema[c] for c in on]
    from pyspark.sql.types import IntegerType, StructField, StructType

    widths_schema = StructType(
        [StructField(f.name, f.dataType, True) for f in key_fields]
        + [StructField(WIDTH, IntegerType(), False)]
    )
    widths = spark.createDataFrame(hot, widths_schema)

    w = F.coalesce(F.col(WIDTH), F.lit(1))
    probe = (
        skewed.join(F.broadcast(widths), on, "left")
        # per-row nonce, not content hash — see salted_join
        .withColumn(
            SALT,
            F.pmod(F.monotonically_increasing_id(), w).cast("int"),
        )
        .drop(WIDTH)
    )
    build = (
        other.join(F.broadcast(widths), on, "left")
        .withColumn(SALT, F.explode(F.sequence(F.lit(0), w - 1).cast("array<int>")))
        .drop(WIDTH)
    )
    return probe.join(build, [*on, SALT], how).drop(SALT)
