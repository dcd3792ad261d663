"""Skew-mitigated (salted) equi-join (SURVEY.md §2.4 / scale notes).

AQE's skew-join splitting (on by default in session.py) handles most skew at
runtime; explicit salting remains the tool when a single join key dominates
so heavily that even split shuffle blocks overwhelm one executor, or when
AQE is unavailable (streaming joins). The salt spreads one hot key over
``n_salts`` shuffle partitions at the cost of replicating the build side
``n_salts``×, so it suits big-skewed ⋈ small/medium shapes.

Deterministic: the salt is a hash of the probe row's full content, not a
random number — same input, same plan, same result.
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
    if SALT in skewed.columns or SALT in other.columns:
        raise ValueError(f"column {SALT} already present")
    probe = skewed.withColumn(
        SALT,
        F.pmod(F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(n_salts)).cast(
            "int"
        ),
    )
    build = other.withColumn(
        SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<int>"))
    )
    return probe.join(build, [*on, SALT], how).drop(SALT)
