"""Snapshot-diff CDC source (SURVEY.md §2.1 S1, third mode — completed
end-to-end in r13 per the r12 verdict).

The reference tails a live binlog socket (MySQLExtractor.scala:32-73,
keep-alive at :87-126) — unreachable in a sandbox with no MySQL server, and
the SURVEY-sanctioned self-contained stand-in is PERIODIC SNAPSHOT DIFFING:
poll the source table's full state (over ``sources.jdbc.jdbc_snapshot`` in
production, or any parquet/JSONL landing zone), diff consecutive snapshots
on the primary key, and emit the insert/update/delete events that transform
snapshot N-1 into snapshot N. ``plans/queries_cdc.cdc_snapshot_diff`` states
the diff semantics declaratively (oracle-verified); this module is the same
kernel packaged for the STREAMING pipeline: ``CdcStreamPipeline(
source_format="snapshot_diff")`` feeds the resulting typed events through
the identical ``foreachBatch → apply_cdc_batch`` path as the binlog-shaped
sources, so mappings, counters, dead letters and checkpointing all apply
unchanged.

Contract: each snapshot is one or more files of full row images (JSON lines
or parquet typed by ``row_struct``) carrying a monotonically increasing
``_snap_ver`` stamp on every row. The stream is the TRIGGER; the applied
snapshot is re-read from the landing dir at the triggering version, so file
admission order/splitting never shapes the diff. RETENTION: because the
diff reads the landing (not the admitted batch rows), a landing file must
persist until a STRICTLY NEWER snapshot version has been applied — not
merely until its own version's first flip: a multi-file version can
straddle triggers, and the equal-version heal re-reads the landing, so a
file deleted right after its version's flip would shrink the heal into
spurious DELETEs for its rows (r14 review). The pipeline guards both ways:
per batch, the staged row count must cover the stream-admitted count for
the triggering version; across batches, any files-map entry recorded at
>= the triggering version that has vanished from the landing raises
``SnapshotRetentionError`` (except the benign post-flip replay that
redelivers exactly the deleted, already-applied files — skipped as
converged). The files map prunes superseded files from every later
re-read, so retention past the next version's flip costs scans nothing. The
pipeline keeps the LAST APPLIED snapshot as parquet under
``<checkpoint>/snapshots/prev_v{K}`` with an atomically-replaced marker —
checkpoint-scoped state, so wiping the checkpoint re-seeds the store from
the next snapshot (diff-from-nothing = all inserts, idempotent over the
keyed store). Multiple snapshots landing in one micro-batch collapse to the
latest (diff N-2 → N equals the fold of the per-step diffs — the K5
last-image argument). At 100 TB the snapshot is a partitioned parquet dir /
a parallel JDBC scan and the diff is one full-outer SortMergeJoin on the
PK: both sides shuffle once on the key, the same cost envelope as one
micro-batch MERGE.

Crash/replay (Structured Streaming's at-least-once): the marker flips only
AFTER the kernel applied the diff. A replay before the flip re-diffs
new-vs-old — identical events, idempotent MERGE; a replay after the flip
diffs new-vs-new — empty diff. Either way the store converges
(effectively-once, T2 parity with the event-log sources).
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

SNAP_VER_COL = "_snap_ver"


class UnmappedLandingTableError(ValueError):
    """A multi-table landing root contains a subdir with no ``row_structs``
    entry — a configuration error, deterministic on replay (the landing
    file persists and re-triggers), so the supervisor treats it as fatal
    rather than restarting into the same raise."""


class SnapshotRetentionError(RuntimeError):
    """The producer deleted/rotated a landing file too early: either between
    stream admission and apply (the batch-side re-read saw FEWER rows than
    the stream admitted for the triggering version), or after a multi-file
    version's first flip but before the version was fully admitted (the
    equal-version heal would re-read a half-gone landing). Diffing a partial
    view emits spurious DELETEs for every missing row (ADVICE r13 + r14
    review), so the pipeline fails loudly instead — the retention contract
    is that a landing file persists until a STRICTLY NEWER version has been
    applied. Deterministic on replay, hence supervisor-fatal."""


def snapshot_schema(row_struct: T.StructType) -> T.StructType:
    """Snapshot-file schema: the source row image plus the snapshot version
    stamp (monotone per landing; the producer's poll counter)."""
    return T.StructType(
        [*row_struct.fields, T.StructField(SNAP_VER_COL, T.LongType(), True)]
    )


def read_snapshot_stream(
    spark: SparkSession,
    path: str,
    row_struct: T.StructType,
    max_files_per_trigger: int = 1,
    file_format: str = "json",
) -> DataFrame:
    """Structured Streaming source over the snapshot landing directory.
    Default one file per trigger = one snapshot per micro-batch; several
    whole snapshots in one batch collapse correctly to the latest version.
    Multi-file snapshot versions are ALSO safe, but not through batch
    admission (``maxFilesPerTrigger`` can split one version across
    triggers): the pipeline treats the admitted rows only as a version
    trigger and diffs from a batch-side re-read of the landing dir, and a
    version redelivered by its own remainder files re-diffs (equal versions
    are not skipped) so a partial first application heals. Producers should
    still make files visible atomically (write elsewhere + rename in).

    ``file_format="parquet"`` is the production landing shape: a
    jdbc_snapshot poller writes columnar snapshots (with the ``_snap_ver``
    column stamped) instead of JSON lines — at 100 TB the decode cost and
    size of a JSONL landing would dominate the poll. JSON remains the
    debug/test-friendly default."""
    if file_format not in ("json", "parquet"):
        raise ValueError(f"unknown snapshot file_format: {file_format}")
    reader = spark.readStream.schema(snapshot_schema(row_struct)).option(
        "maxFilesPerTrigger", max_files_per_trigger
    )
    return reader.parquet(path) if file_format == "parquet" else reader.json(path)


def read_snapshot_trigger_stream(
    spark: SparkSession,
    root: str,
    max_files_per_trigger: int = 1,
    file_format: str = "json",
) -> DataFrame:
    """Trigger-only stream over a MULTI-TABLE landing root (r13 verdict #2):
    ``root/<db.table>/<files>``, one subdir per mapped table — the reference
    routes EVERY mapped table from one binlog stream
    (MySQLExtractor.scala:225-236), and this is the polling transport's
    equivalent: one Structured Streaming query triggers the per-table
    applies. Because per-table row schemas differ, the stream projects ONLY
    the ``_snap_ver`` stamp (every landing file carries it regardless of
    table) plus the implicit file provenance; the pipeline attributes each
    admitted file to its table by parent-dir name and re-reads that table's
    landing batch-side with the table's own schema. Projecting one shared
    column is what lets heterogeneous parquet/JSON files share a single
    stream source."""
    if file_format not in ("json", "parquet"):
        raise ValueError(f"unknown snapshot file_format: {file_format}")
    schema = T.StructType([T.StructField(SNAP_VER_COL, T.LongType(), True)])
    reader = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", max_files_per_trigger
    )
    glob = os.path.join(root, "*")
    return reader.parquet(glob) if file_format == "parquet" else reader.json(glob)


def snapshot_diff_events(
    prev: DataFrame | None,
    cur: DataFrame,
    row_struct: T.StructType,
    pk_cols: list[str],
    db: str,
    table: str,
    position: int,
) -> DataFrame:
    """Diff two full snapshots (source row shape) into typed CDC events —
    the streaming twin of ``cdc_snapshot_diff``'s query kernel: full outer
    join on the PK; PK only in ``cur`` → insert, only in ``prev`` → delete,
    in both with any non-key column differing (null-safe — a column
    transitioning to/from NULL is a change, ADVICE r5) → update. Unchanged
    keys emit NOTHING, which is what makes low-frequency polling viable.
    ``prev=None`` (first poll of a fresh checkpoint) emits every row as an
    insert — the initial-seed path. All events carry ``position`` (the
    snapshot version): the kernel's last-image collapse never sees two
    events for one key in a single diff, so ties are moot.
    """
    cols = [f.name for f in row_struct.fields]
    non_pk = [c for c in cols if c not in pk_cols]
    # presence = explicit per-side marker columns, NOT PK nullness: the join
    # is null-safe on the PKs (a NULL key is a legal, matchable key value to
    # the diff even though MySQL forbids it), so a row whose PK is NULL must
    # still classify as "present on both sides" rather than being re-emitted
    # as a ghost insert with NULL images on every poll (r13 review)
    cur_side = cur.select(
        *[F.col(c).alias(f"_c_{c}") for c in cols], F.lit(True).alias("_c_present")
    )
    if prev is None:
        joined = cur_side.select(
            *[F.lit(None).cast(f.dataType).alias(f"_p_{f.name}") for f in row_struct.fields],
            F.lit(None).cast("boolean").alias("_p_present"),
            "*",
        )
    else:
        prev_side = prev.select(
            *[F.col(c).alias(f"_p_{c}") for c in cols], F.lit(True).alias("_p_present")
        )
        on = [F.col(f"_p_{c}").eqNullSafe(F.col(f"_c_{c}")) for c in pk_cols]
        joined = prev_side.join(cur_side, _and_all(on), "full_outer")
    in_prev = F.col("_p_present").isNotNull()
    in_cur = F.col("_c_present").isNotNull()
    changed = (
        _or_all(
            [~F.col(f"_p_{c}").eqNullSafe(F.col(f"_c_{c}")) for c in non_pk]
        )
        if non_pk
        else F.lit(False)
    )
    op = (
        F.when(~in_prev, F.lit("insert"))
        .when(~in_cur, F.lit("delete"))
        .otherwise(F.lit("update"))
    )
    before = F.when(
        in_prev, F.struct(*[F.col(f"_p_{c}").alias(c) for c in cols])
    )
    after = F.when(in_cur, F.struct(*[F.col(f"_c_{c}").alias(c) for c in cols]))
    return (
        joined.filter(~in_prev | ~in_cur | changed)
        .select(
            F.lit(position).cast("long").alias("position"),
            op.alias("op"),
            F.lit(db).alias("db"),
            F.lit(table).alias("table"),
            before.alias("before"),
            after.alias("after"),
            F.lit(None).cast(T.ArrayType(T.StringType())).alias("included_before"),
            F.lit(None).cast(T.ArrayType(T.StringType())).alias("included_after"),
            F.lit(None).cast("string").alias("filename"),
        )
    )


def _and_all(conds) -> F.Column:
    out = conds[0]
    for c in conds[1:]:
        out = out & c
    return out


def _or_all(conds) -> F.Column:
    out = conds[0]
    for c in conds[1:]:
        out = out | c
    return out


class PrevSnapshotStore:
    """The pipeline's memory of the last APPLIED snapshot — versioned
    parquet dirs under ``<checkpoint>/snapshots`` with an atomically
    os.replace'd JSON marker, the same snapshot-pointer discipline as the
    LSM stores (crash anywhere leaves the marker on a consistent version;
    never-flipped dirs are overwritten by the replay or swept)."""

    MARKER = "_current.json"

    def __init__(self, root: str, keep_versions: int = 1):
        self.root = root
        # retired prev-snapshot versions retained behind the marker (r13
        # verdict #3 — same knob as the LSM stores' reader-retirement
        # window); 1 = the replayed batch can still re-read its diff inputs
        if keep_versions < 1:
            raise ValueError(f"keep_versions must be >= 1 (got {keep_versions})")
        self.keep_versions = keep_versions

    def _marker_path(self) -> str:
        return os.path.join(self.root, self.MARKER)

    def _marker(self) -> dict:
        try:
            with open(self._marker_path()) as f:
                doc = json.load(f)
            return doc if isinstance(doc, dict) else {}
        except (OSError, ValueError):
            return {}

    def current_version(self) -> int | None:
        try:
            return int(self._marker()["version"])
        except (ValueError, KeyError, TypeError):
            return None

    def applied_snap_ver(self) -> int | None:
        """The highest ``_snap_ver`` already folded into the store. The
        pipeline SKIPS any snapshot strictly below it: Spark's file source
        breaks equal-mtime ties in arbitrary order and a poller can
        redeliver old landings, and applying snapshot N-1 after N would
        REGRESS the store to stale state (measured: two same-second files
        were admitted newest-first)."""
        try:
            v = self._marker().get("snap_ver")
            return int(v) if v is not None else None
        except (ValueError, TypeError):
            return None

    def files_map(self) -> dict[str, int]:
        """Landing-file basename → highest ``_snap_ver`` seen in that file.
        Each file is admitted by the stream exactly once, so merging every
        batch's per-file versions at flip time accumulates a complete map —
        the pipeline's landing re-read then skips files whose recorded max
        version is strictly below the triggering one, keeping the per-poll
        scan O(current version + unseen files) instead of O(all history)."""
        files = self._marker().get("files")
        if not isinstance(files, dict):
            return {}
        out = {}
        for k, v in files.items():
            try:
                out[str(k)] = int(v)
            except (ValueError, TypeError):
                continue
        return out

    def unhealed_map(self) -> dict[str, int]:
        """Landing files whose equal-version heal was DEFERRED (the
        benign-replay skip saw them still present but never applied at the
        applied version): basename → the snap_ver the deferral happened at.
        Persisted in the marker (r15 ADVICE): the streaming checkpoint has
        already advanced past such a file, so the stream never redelivers
        it — an in-memory warning would fire exactly once, and if no
        strictly newer snapshot version ever lands the file's rows are
        dropped after a single log line. Persisting lets the pipeline
        RE-WARN on every later poll that touches the table, until a flip at
        a covering version supersedes the rows and clears the entry."""
        doc = self._marker().get("unhealed")
        if not isinstance(doc, dict):
            return {}
        out = {}
        for k, v in doc.items():
            try:
                out[str(k)] = int(v)
            except (ValueError, TypeError):
                continue
        return out

    def record_unhealed(self, names: dict[str, int]) -> None:
        """Merge deferred-heal files into the marker WITHOUT advancing the
        applied pointer (the skip path never flips)."""
        if not names:
            return
        marker = self._marker()
        unhealed = self.unhealed_map()
        for k, v in names.items():
            unhealed[k] = max(int(v), unhealed.get(k, 0))
        os.makedirs(self.root, exist_ok=True)
        tmp = self._marker_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump({**marker, "unhealed": unhealed}, f)
        os.replace(tmp, self._marker_path())

    def _ver_path(self, ver: int) -> str:
        return os.path.join(self.root, f"prev_v{ver}")

    def read_current(
        self, spark: SparkSession, row_struct: T.StructType
    ) -> DataFrame | None:
        ver = self.current_version()
        if ver is None:
            return None
        return spark.read.schema(row_struct).parquet(self._ver_path(ver))

    def stage_next(self, snapshot: DataFrame, row_struct: T.StructType) -> tuple[int, str]:
        """Write the incoming snapshot as the NEXT version (not yet current).
        Returns (next_version, path); the caller flips after the kernel
        applied the diff."""
        ver = self.current_version()
        nxt = (ver if ver is not None else -1) + 1
        path = self._ver_path(nxt)
        snapshot.select(*[f.name for f in row_struct.fields]).write.mode(
            "overwrite"
        ).parquet(path)
        return nxt, path

    def record_files(self, file_vers: dict[str, int]) -> None:
        """Merge per-file versions into the marker WITHOUT advancing the
        applied pointer. The stale-skip path calls this: a landing admitted
        after a newer version never applies (and so never flips), but its
        file must still enter the map or every future re-read keeps
        scanning it as 'unseen' (r13: surfaced as a landing-order-dependent
        pruning leak)."""
        if not file_vers:
            return
        marker = self._marker()
        files = self.files_map()
        for k, v in file_vers.items():
            files[k] = max(int(v), files.get(k, 0))
        os.makedirs(self.root, exist_ok=True)
        tmp = self._marker_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump({**marker, "files": files}, f)
        os.replace(tmp, self._marker_path())

    def flip(
        self,
        version: int,
        snap_ver: int,
        file_vers: dict[str, int] | None = None,
        landing_files: list[str] | None = None,
    ) -> None:
        """Atomically advance the marker. ``file_vers`` merges this batch's
        per-file max versions into the files map; ``landing_files`` (the
        current landing listing, when the caller has one) prunes map entries
        for files the producer has deleted, bounding the marker's size by
        the live landing."""
        os.makedirs(self.root, exist_ok=True)
        files = self.files_map()
        if file_vers:
            for k, v in file_vers.items():
                files[k] = max(int(v), files.get(k, 0))
        if landing_files is not None:
            live = set(landing_files)
            files = {k: v for k, v in files.items() if k in live}
        # a completed flip applied a FULL snapshot at snap_ver, which
        # contains-or-supersedes the rows of any heal deferred at <= that
        # version — those unhealed entries are resolved; later-version
        # deferrals (impossible today, versions are monotone) would survive
        unhealed = {
            k: v for k, v in self.unhealed_map().items() if v > int(snap_ver)
        }
        doc = {"version": version, "snap_ver": snap_ver, "files": files}
        if unhealed:
            doc["unhealed"] = unhealed
        tmp = self._marker_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(doc, f)
        os.replace(tmp, self._marker_path())
        # sweep: keep current and the keep_versions most recent retired
        # dirs (default 1: the replayed batch may still re-read its diff
        # inputs); older versions are garbage
        for e in os.listdir(self.root):
            if e.startswith("prev_v") and e[len("prev_v"):].isdigit():
                v = int(e[len("prev_v"):])
                if v < version - self.keep_versions:
                    shutil.rmtree(os.path.join(self.root, e), ignore_errors=True)
