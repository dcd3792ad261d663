"""Query restart policy (SURVEY.md §2.7) — the driver-side supervisor.

The reference keeps its binlog connection alive with a retry loop: a
transient extractor failure sleeps 5 s and reconnects
(MySQLExtractor.scala:87-126, keep-alive thread at :11), while the fatal
"1236: could not find first log file" — the checkpointed binlog file was
purged on the server — exits the process (MySQLExtractor.scala:145-159).

The Spark analog: a failed foreachBatch kills the StreamingQuery, so the
retry loop lives one level up — a supervisor that restarts the query from
its checkpointLocation (resume is exactly-where-it-left-off by S2) with
bounded attempts and backoff, and refuses to restart on errors that retrying
cannot fix:

- PrimaryKeyChangedError — PK drift detected by the schema refresh
  (MySQLExtractor.scala:195-198); remapping is an operator decision.
- DeadLetterOverflowError — failed-event queue overflow (Rep.scala:86-92).
- StaleCheckpointError — the error-1236 analog: the checkpointed
  (filename, position) no longer exists at the source; only a re-snapshot
  can recover.

Classification is by exception-name substring because a Python exception
raised inside foreachBatch crosses the JVM boundary and surfaces as a
StreamingQueryException whose message embeds the original traceback.
"""

from __future__ import annotations

import logging
import time
from collections import deque
from dataclasses import dataclass, field
from typing import Callable

logger = logging.getLogger(__name__)


class StaleCheckpointError(RuntimeError):
    """The checkpointed binlog file/position is gone from the source — the
    MySQL error 1236 'could not find first log file' analog
    (MySQLExtractor.scala:145-159). Unrecoverable by retrying."""


class RestartsExhaustedError(RuntimeError):
    """Transient failures persisted past RestartPolicy.max_restarts."""


# substrings that mark an error as not-retryable. The 1236 message itself is
# included so a JDBC-fronted source that surfaces the raw MySQL error is
# classified the same way the reference classifies it.
FATAL_ERROR_MARKERS = (
    "PrimaryKeyChangedError",
    "DeadLetterOverflowError",
    "StaleCheckpointError",
    "could not find first log file",
    # r14: a landing file deleted before its snapshot version applied is
    # deterministic on replay (the file stays gone) — restarting would
    # wedge the supervisor in a backoff loop around the same violation
    "SnapshotRetentionError",
    # r14: a landing subdir with no row_structs entry is a configuration
    # error and the landing file persists — equally deterministic
    "UnmappedLandingTableError",
)


def default_is_fatal(exc: BaseException) -> bool:
    text = f"{type(exc).__name__}: {exc}"
    return any(marker in text for marker in FATAL_ERROR_MARKERS)


@dataclass
class RestartPolicy:
    """Bounded-retry/backoff knobs. Defaults mirror the reference's constant
    5 s keep-alive; multiplier > 1 opts into exponential backoff."""

    max_restarts: int = 5
    backoff_initial_s: float = 5.0
    backoff_multiplier: float = 1.0
    backoff_max_s: float = 60.0
    # a run healthy for this long resets the restart budget, so a long-lived
    # stream isn't killed by unrelated transient failures days apart
    reset_after_s: float = 300.0


# SupervisorReport.errors retention: reset_after_s makes the restart loop
# deliberately unbounded for a long-lived stream, and a
# StreamingQueryException message embeds the full JVM+Python traceback
# (multi-KB) — an uncapped list accumulates months of flaps in driver
# memory. The last ERRORS_KEPT entries (each capped at ERROR_CHARS chars)
# cover every diagnostic consumer (report.errors[-1], the exhausted/fatal
# messages) with bounded footprint.
ERRORS_KEPT = 100
ERROR_CHARS = 4000


@dataclass
class SupervisorReport:
    attempts: int = 0
    restarts: int = 0
    errors: "deque[str]" = field(default_factory=lambda: deque(maxlen=ERRORS_KEPT))
    outcome: str = "clean"  # clean | fatal | exhausted


def supervise(
    start_query: Callable[[], object],
    policy: RestartPolicy | None = None,
    is_fatal: Callable[[BaseException], bool] = default_is_fatal,
    sleep: Callable[[float], None] = time.sleep,
    clock: Callable[[], float] = time.monotonic,
) -> SupervisorReport:
    """Run a streaming query to clean termination, restarting through
    transient failures. ``start_query`` must return a started
    StreamingQuery each call (resume comes from its checkpointLocation).
    Raises the fatal error (wrapped cause intact) or RestartsExhaustedError;
    returns a report on clean termination."""
    policy = policy or RestartPolicy()
    report = SupervisorReport()
    restarts_left = policy.max_restarts
    backoff = policy.backoff_initial_s
    while True:
        report.attempts += 1
        started_at = clock()
        try:
            query = start_query()
            query.awaitTermination()
            return report
        except Exception as exc:  # StreamingQueryException or startup failure
            report.errors.append(f"{type(exc).__name__}: {exc}"[:ERROR_CHARS])
            if is_fatal(exc):
                report.outcome = "fatal"
                logger.error(
                    "fatal stream error, not restarting: %s", report.errors[-1]
                )
                raise
            if clock() - started_at >= policy.reset_after_s:
                restarts_left = policy.max_restarts
                backoff = policy.backoff_initial_s
            if restarts_left <= 0:
                report.outcome = "exhausted"
                logger.error(
                    "restart budget exhausted after %d attempts", report.attempts
                )
                raise RestartsExhaustedError(
                    f"gave up after {report.attempts} attempts "
                    f"({policy.max_restarts} restarts); last error: "
                    f"{report.errors[-1]}"
                ) from exc
            restarts_left -= 1
            report.restarts += 1
            # the reference's keep-alive reconnect log line
            # (MySQLExtractor.scala:87-126 sleeps 5 s and reconnects)
            logger.warning(
                "transient stream failure (%s); restart %d/%d in %.1fs",
                report.errors[-1].splitlines()[0][:200],
                report.restarts,
                policy.max_restarts,
                backoff,
            )
            sleep(backoff)
            backoff = min(backoff * policy.backoff_multiplier, policy.backoff_max_s)
