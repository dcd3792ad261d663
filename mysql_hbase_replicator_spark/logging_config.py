"""Structured logging modes (SURVEY.md §2.8 O3) — the logback dev/prod
split (reference config/logback.xml:1-46) re-expressed on stdlib logging.

The reference selects the profile from the ``mysql2hbase.mode`` system
property:

- development (default): console appender, ``[%level] %m%n``, root at
  TRACE — "Set to TRACE to see all replication events".
- production (``mode`` contains "production"): daily-rolling file
  ``./log/mydit.log`` with ``[%level] [%d{yy-MM-dd HH:mm:ss}] %c{1}: %m%n``,
  root at INFO.

Spark-engine analogs, faithfully:

- the mode comes from the ``SPARK_GRAFT_MODE`` env var (the JVM system
  property has no Python twin) with the same contains-"production" test;
- Python has no TRACE level, so one is registered at severity 5 (below
  DEBUG), and the per-event firehose becomes a per-MICRO-BATCH trace in
  the streaming pipeline — per-event driver-side logging is exactly the
  kind of row-at-a-time work a 100 TB engine must not do; the batch line
  carries the same information (per-table.op counts) aggregated;
- only the ENGINE's logger namespace is configured, never the root —
  hijacking the root would re-route Spark's own log4j/py4j bridge noise.
"""

from __future__ import annotations

import logging
import os

TRACE = 5
ENGINE_LOGGER = "mysql_hbase_replicator_spark"
_HANDLER_TAG = "_spark_graft_mode_handler"

logging.addLevelName(TRACE, "TRACE")


class _ProdFormatter(logging.Formatter):
    """``[%level] [%d{yy-MM-dd HH:mm:ss}] %c{1}: %m`` — %c{1} is logback's
    last-name-component shorthand."""

    def __init__(self):
        super().__init__(
            "[%(levelname)s] [%(asctime)s] %(shortname)s: %(message)s",
            datefmt="%y-%m-%d %H:%M:%S",
        )

    def format(self, record: logging.LogRecord) -> str:
        record.shortname = record.name.rsplit(".", 1)[-1]
        return super().format(record)


def resolve_mode(mode: str | None = None) -> str:
    """The reference's property test, verbatim semantics: anything whose
    mode string CONTAINS "production" is production; everything else
    (unset included) is development (logback.xml:8,22)."""
    raw = mode if mode is not None else os.environ.get("SPARK_GRAFT_MODE", "")
    return "production" if "production" in raw else "development"


def configure_logging(
    mode: str | None = None,
    log_dir: str = "./log",
    logger_name: str = ENGINE_LOGGER,
) -> logging.Logger:
    """Configure the engine logger for the resolved mode and return it.
    Idempotent: handlers installed by a previous call are replaced, never
    stacked (logback's scan-and-reload analog — reconfiguring mid-run is
    safe)."""
    logger = logging.getLogger(logger_name)
    for h in list(logger.handlers):
        if getattr(h, _HANDLER_TAG, False):
            logger.removeHandler(h)
            h.close()
    if resolve_mode(mode) == "production":
        from logging.handlers import TimedRotatingFileHandler

        os.makedirs(log_dir, exist_ok=True)
        handler: logging.Handler = TimedRotatingFileHandler(
            os.path.join(log_dir, "mydit.log"), when="midnight", utc=True
        )
        # logback's fileNamePattern mydit.log.%d{yy-MM-dd}
        handler.suffix = "%y-%m-%d"
        handler.setFormatter(_ProdFormatter())
        level = logging.INFO
    else:
        handler = logging.StreamHandler()
        handler.setFormatter(logging.Formatter("[%(levelname)s] %(message)s"))
        level = TRACE
    setattr(handler, _HANDLER_TAG, True)
    logger.addHandler(handler)
    logger.setLevel(level)
    # the engine namespace is self-contained: do not double-emit through
    # whatever handlers an embedding application hung on the root logger
    logger.propagate = False
    return logger


def trace(logger: logging.Logger, msg: str, *args) -> None:
    """logback-TRACE emit helper (stdlib logging has no .trace method)."""
    if logger.isEnabledFor(TRACE):
        logger.log(TRACE, msg, *args)
