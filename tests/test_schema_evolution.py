"""Schema-drift semantics through the CDC kernel (SURVEY §1.4; r12 verdict
#2): non-key column add/drop is tolerated mid-stream — the reference only
kills the replicator on PK drift (MySQLExtractor.scala:195-198;
TableInfo.scala:33-39 exposes the added/dropped helpers) — and a PK change
raises PrimaryKeyChangedError (catalog/schema.py).
"""

from __future__ import annotations

import pytest

from mysql_hbase_replicator_spark.catalog.schema import (
    ColInfo,
    PrimaryKeyChangedError,
    TableSchema,
)
from mysql_hbase_replicator_spark.operators.cdc_apply import apply_cdc_batch
from mysql_hbase_replicator_spark.operators.merge import LogStructuredKeyedStore
from mysql_hbase_replicator_spark.sources.cdc_events import events_from_rows


def schema_of(*cols: ColInfo) -> TableSchema:
    return TableSchema(database="mixfs", table="student", cols=list(cols))


PK = ColInfo("sn", "int(11)", is_primary_key=True)
PK2 = ColInfo("id", "int(11)", is_primary_key=True)
SCORE = ColInfo("score", "int(11)")
NAME = ColInfo("name", "varchar(10)")


def test_non_key_drift_is_tolerated():
    declared = schema_of(PK, PK2, SCORE)
    widened = schema_of(PK, PK2, SCORE, NAME)
    narrowed = schema_of(PK, PK2)
    # ADD COLUMN / DROP COLUMN: detected, never fatal
    assert declared.non_key_columns_added(widened) == [("name", "varchar(10)")]
    assert declared.non_key_columns_dropped(narrowed) == [("score", "int(11)")]
    declared.check_key_unchanged(widened)  # no raise
    declared.check_key_unchanged(narrowed)  # no raise


def test_pk_change_trace_is_fatal():
    declared = schema_of(PK, PK2, SCORE)
    # PK column set changed (composite -> single): fatal
    with pytest.raises(PrimaryKeyChangedError, match="primary key changed"):
        declared.check_key_unchanged(schema_of(PK, SCORE))
    # PK TYPE changed (int -> bigint): equally fatal
    retyped = schema_of(ColInfo("sn", "bigint(20)", is_primary_key=True), PK2, SCORE)
    with pytest.raises(PrimaryKeyChangedError):
        declared.check_key_unchanged(retyped)


def test_kernel_applies_add_column_trace(spark, tmp_path, student_struct, student_mapping):
    """The cdc_schema_evolution registry query's semantics at fixture size:
    batch 1 under the original mapping, then the table grows a column and
    batch 2 applies under the widened mapping — rows last written before
    the ADD COLUMN surface NULL (MySQL's backfill), rows after carry the
    value, and the store's merge-on-read crosses the boundary against a
    compacted narrow base."""
    from pyspark.sql import types as T

    from mysql_hbase_replicator_spark.catalog.meta import HbaseCollInfo, HbaseTableInfo

    store = LogStructuredKeyedStore(str(tmp_path / "lsm"), n_buckets=4)
    name = "mixfs:student2"
    batch1 = [
        {"position": 1, "op": "insert", "db": "mixfs", "table": "student",
         "before": None, "after": {"sn": 1, "id": 1, "score": 90, "name": "ann", "rem": "a"}},
        {"position": 2, "op": "insert", "db": "mixfs", "table": "student",
         "before": None, "after": {"sn": 2, "id": 2, "score": 80, "name": "bob", "rem": "b"}},
    ]
    apply_cdc_batch(
        spark, events_from_rows(spark, batch1, student_struct),
        store, {"mixfs.student": student_mapping},
    )
    store.compact(spark, name)  # narrow base baked pre-ADD COLUMN

    wide_mapping = HbaseTableInfo(
        dbName="mixfs", dbTableName="student", hbaseTableName=name,
        hbaseNameSpace="mixfs", sparkTableName="student2", bytesUtils="Binary",
        cols=[*student_mapping.cols,
              HbaseCollInfo("extra", "int(11)", "extra", "IntegerType", False)],
    )
    wide_struct = T.StructType(
        [*student_struct.fields, T.StructField("extra", T.IntegerType())]
    )
    batch2 = [
        {"position": 3, "op": "insert", "db": "mixfs", "table": "student",
         "before": None,
         "after": {"sn": 2, "id": 2, "score": 85, "name": "bob", "rem": "b", "extra": 7}},
        {"position": 4, "op": "insert", "db": "mixfs", "table": "student",
         "before": None,
         "after": {"sn": 3, "id": 3, "score": 60, "name": "cat", "rem": "c", "extra": 9}},
    ]
    apply_cdc_batch(
        spark, events_from_rows(spark, batch2, wide_struct),
        store, {"mixfs.student": wide_mapping},
    )
    got = {
        (r["sn"], r["id"]): (r["score"], r["extra"])
        for r in store.read(spark, name).collect()
    }
    assert got == {(1, 1): (90, None), (2, 2): (85, 7), (3, 3): (60, 9)}
    # and compaction bakes the widened schema without losing either side
    assert store.compact(spark, name) is True
    got2 = {
        (r["sn"], r["id"]): (r["score"], r["extra"])
        for r in store.read(spark, name).collect()
    }
    assert got2 == got


def test_same_data_faithful_always_invalidates(spark):
    """The reference's inverted nullability clause (TableInfo.scala:26 uses
    ``!=``) makes same_data constant-False over nullability-equal column
    lists — faithful mode must reproduce that, including for a RENAMED
    column (r13 review: the earlier stand-in inverted the NAME comparison
    and reported a rename as an unchanged schema)."""
    a = schema_of(ColInfo("id", "int", is_primary_key=True), ColInfo("name", "varchar(10)"))
    renamed = schema_of(
        ColInfo("id", "int", is_primary_key=True), ColInfo("full_name", "varchar(10)")
    )
    same = schema_of(ColInfo("id", "int", is_primary_key=True), ColInfo("name", "varchar(10)"))
    # evident intent: rename invalidates, identical stays valid
    assert a.same_data(same) is True
    assert a.same_data(renamed) is False
    # faithful: ALWAYS invalidates — identical AND renamed
    assert a.same_data(same, faithful=True) is False
    assert a.same_data(renamed, faithful=True) is False


def test_same_data_detects_pk_and_enum_drift(spark):
    """PK promote/demote and ENUM label changes alter decode semantics with
    names and types unchanged — same_data must invalidate the cache for
    them (r13 review: only names+types were compared, so a stale cache
    survived exactly the drift check_key_unchanged exists to catch)."""
    a = schema_of(
        ColInfo("sn", "int(11)", is_primary_key=True),
        ColInfo("id", "int(11)", is_primary_key=True),
        ColInfo("kind", "enum('a','b')", enum_values=("a", "b")),
    )
    demoted = schema_of(
        ColInfo("sn", "int(11)", is_primary_key=True),
        ColInfo("id", "int(11)"),  # no longer PK; name/type unchanged
        ColInfo("kind", "enum('a','b')", enum_values=("a", "b")),
    )
    relabeled = schema_of(
        ColInfo("sn", "int(11)", is_primary_key=True),
        ColInfo("id", "int(11)", is_primary_key=True),
        ColInfo("kind", "enum('a','b')", enum_values=("b", "a")),  # re-ordered
    )
    assert a.same_data(a) is True
    assert a.same_data(demoted) is False
    assert a.same_data(relabeled) is False
