"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All real code lives in ``mysql_hbase_replicator_spark/``; this module only
adapts it to the contract.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mysql_hbase_replicator_spark.plans.registry import (  # noqa: E402
    ORACLE_REGISTRY,
    QUERY_REGISTRY,
    load_all_queries,
)

load_all_queries()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q3-shaped shipping priority) on sf0.001."""
    return QUERY_REGISTRY["flagship_shipping_priority"](spark, "/root/testdata/sf0.001")


def _last_verified_round() -> dict[str, int]:
    """Map query name -> the LAST round whose CORRECTNESS_r*.json recorded
    it (0 if never recorded). Used only to ORDER the registry (never to
    drop entries): the driver samples a prefix-biased subset per round, so
    sorting stalest-verification-first makes each round re-validate the
    records most likely to have rotted under refactors, while
    never-verified queries (round 0) still sort to the very front."""
    import glob
    import json
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    last: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as f:
                names = set(json.load(f))
        except (OSError, ValueError):
            continue
        for n in names:
            last[n] = max(last.get(n, 0), rnd)
    return last


def _touched_this_round() -> set[str]:
    """Query names listed in REVERIFY.txt — queries whose IMPLEMENTATION
    changed since their latest driver-green record (the builder maintains
    the file each round; '#' comments allowed). They sort immediately after
    never-verified queries so a rewrite is always re-validated by the next
    driver sample instead of coasting on a stale green row."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "REVERIFY.txt")
    try:
        with open(path) as f:
            return {
                line.strip()
                for line in f
                if line.strip() and not line.startswith("#")
            }
    except OSError:
        return set()


def _staleness_ordered(names) -> list[str]:
    last = _last_verified_round()
    touched = _touched_this_round()
    order = {n: i for i, n in enumerate(names)}

    def rank(n: str) -> float:
        r = last.get(n, 0)
        if r and n in touched:
            return 0.5  # rewritten since its green row: right after never-verified
        return r

    return sorted(names, key=lambda n: (rank(n), order[n]))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, ordered so the
    stalest driver-verified records (and never-verified queries) come
    first."""
    return {n: QUERY_REGISTRY[n] for n in _staleness_ordered(list(QUERY_REGISTRY))}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; omitted keys get rows-only checks."""
    return {n: ORACLE_REGISTRY[n] for n in _staleness_ordered(list(ORACLE_REGISTRY))}
