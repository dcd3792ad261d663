"""The driver-sample ordering contract in __spark_entry__:

never-verified queries first, then REVERIFY.txt-listed rewrites, then
everything else stalest-first. The driver samples a prefix-biased subset
per round, so this ordering IS the mechanism that guarantees (a) new
queries get a CORRECTNESS row immediately and (b) a rewritten query never
coasts on a green row that predates its current code."""

from __future__ import annotations

import importlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_staleness_ordering_contract(monkeypatch, tmp_path):
    import __spark_entry__ as se

    monkeypatch.setattr(
        se, "_last_verified_round", lambda: {"old_r3": 3, "fresh_r6": 6, "rewritten": 5}
    )
    monkeypatch.setattr(se, "_touched_this_round", lambda: {"rewritten"})
    got = se._staleness_ordered(["fresh_r6", "rewritten", "old_r3", "never_seen"])
    assert got == ["never_seen", "rewritten", "old_r3", "fresh_r6"]


def test_reverify_file_parses_and_names_exist():
    import __spark_entry__ as se
    from mysql_hbase_replicator_spark.plans.registry import (
        QUERY_REGISTRY,
        load_all_queries,
    )

    load_all_queries()
    touched = se._touched_this_round()
    # comments/blank lines filtered; every listed name is a real query (a
    # typo here would silently de-prioritize the record it meant to refresh)
    unknown = touched - set(QUERY_REGISTRY)
    assert not unknown, unknown


def test_never_verified_and_touched_fit_driver_sample():
    """The whole point: everything needing (re)validation must fit the
    driver's 50-slot prefix."""
    import __spark_entry__ as se

    last = se._last_verified_round()
    touched = se._touched_this_round()
    names = list(se.queries())
    needs = [n for n in names if last.get(n, 0) == 0 or n in touched]
    # all needs-validation entries must occupy the leading positions
    assert all(n in needs for n in names[: len(needs)])
    assert len(needs) <= 50, len(needs)
