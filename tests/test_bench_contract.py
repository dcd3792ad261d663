"""bench.py driver-contract emission (ADVICE r8: degrade, never crash).

No SparkSession needed — these exercise only the stdout-line rendering the
driver parses, so they are pure-python fast tests.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import BASELINE24, HEADLINE, emit_compact_line  # noqa: E402


def _compact(queries: dict[str, float]) -> dict:
    return {
        "metric": "baseline24_total",
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "queries": queries,
        "sf": 0.1,
        "all_queries_total_sec": 99.9,
        "n_queries": len(queries),
        "detail": "BENCH_FULL.json",
    }


def test_compact_line_normal_size_keeps_queries():
    c = _compact({n: 0.5 for n in BASELINE24})
    line = emit_compact_line(c)
    parsed = json.loads(line)
    assert parsed["queries"] == c["queries"]
    assert len(line) < 1900


def test_compact_line_oversized_degrades_not_crashes(capsys):
    # a pathologically large per-query dict (the failure mode the old
    # assert turned into a post-measurement crash)
    big = {f"query_with_a_very_long_name_{i:04d}": 1.234 for i in range(200)}
    c = _compact(big)
    assert len(json.dumps(c)) >= 1900  # precondition: would have crashed
    line = emit_compact_line(c)
    parsed = json.loads(line)  # the driver contract line still parses
    assert len(line) < 1900
    assert "queries" not in parsed
    assert parsed["queries_dropped"] == 200
    # every summary scalar survives
    assert parsed["metric"] == "baseline24_total" and parsed["value"] == c["value"]
    assert "WARNING" in capsys.readouterr().err


def test_baseline24_subset_of_headline():
    # the warning path in main() only fires if a BASELINE24 name leaves
    # HEADLINE; pin the invariant so a refactor trips a test, not the driver
    assert set(BASELINE24) <= set(HEADLINE)
