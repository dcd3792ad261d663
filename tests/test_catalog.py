"""Catalog layer (SURVEY.md §2.1 S6/S7, §2.10): JSON round-trip of the
reference's exact wire shape, CRUD, Spark registration, CLI dispatch."""

from __future__ import annotations

import json

import pytest

from mysql_hbase_replicator_spark.catalog.cli import HELP_JSON, process_line
from mysql_hbase_replicator_spark.catalog.meta import (
    HbaseCollInfo,
    HbaseTableInfo,
    MappingCatalog,
)


def test_help_json_roundtrip():
    """The reference's canonical student JSON (Mysql2HbaseCliDriver.scala:41-48)
    parses, validates, and re-serializes to the same structure."""
    info = HbaseTableInfo.from_json(HELP_JSON)
    assert info.full_name == "mixfs.student"
    assert info.sparkTableName == "student2"
    assert [c.dbColumnName for c in info.key_columns()] == ["sn", "id"]
    assert [c.dbColumnName for c in info.non_key_columns()] == ["score", "name", "rem"]
    info.validate()
    assert json.loads(info.to_json()) == json.loads(HELP_JSON)


def test_default_col_mapping():
    c = HbaseCollInfo.default("user_id", "bigint(20)", is_pk=True)
    assert c.hbaseColumnName == "userid"  # underscore-strip default
    assert c.hbaseColumnType == "LongType"
    assert c.family == "cf"


def test_validation_rejects_seventh_type_and_keyless():
    bad_type = HbaseTableInfo(
        "d", "t", "d:t", "d", "t", "Binary",
        [HbaseCollInfo("a", "datetime", "a", "TimestampType", True)],
    )
    with pytest.raises(ValueError, match="Unsupported HBase SQL Data Type"):
        bad_type.validate()
    keyless = HbaseTableInfo(
        "d", "t", "d:t", "d", "t", "Binary",
        [HbaseCollInfo("a", "int(11)", "a", "IntegerType", False)],
    )
    with pytest.raises(ValueError, match="no primary-key column"):
        keyless.validate()


def test_catalog_crud(tmp_path):
    cat = MappingCatalog(str(tmp_path / "meta"))
    info = cat.add(HELP_JSON)
    assert cat.list_names() == ["mixfs.student"]
    assert cat.get("mixfs.student").sparkTableName == "student2"
    # lazy reload from disk (HBaseTableUtils.scala:73-78)
    cat2 = MappingCatalog(str(tmp_path / "meta"))
    assert cat2.get("mixfs.student").full_name == info.full_name
    assert cat.delete("mixfs.student")
    assert not cat.delete("mixfs.student")
    assert cat.list_names() == []


def test_map_to_spark_renames_and_casts(spark, tmp_path):
    cat = MappingCatalog(str(tmp_path / "meta"))
    cat.add(
        HbaseTableInfo(
            "db", "t", "db:t", "db", "t_view", "Binary",
            [
                HbaseCollInfo("user_id", "bigint(20)", "userid", "LongType", True),
                HbaseCollInfo("score", "int(11)", "score", "IntegerType", False),
            ],
        )
    )
    src = spark.createDataFrame([(1, 10), (2, 20)], "user_id long, score int")
    cat.map_to_spark(spark, "db.t", src)
    got = spark.sql("SELECT userid, score FROM t_view ORDER BY userid").collect()
    assert [(r.userid, r.score) for r in got] == [(1, 10), (2, 20)]
    cat.unmap_from_spark(spark, "db.t")
    assert "t_view" not in [t.name for t in spark.catalog.listTables()]


def test_cli_dispatch(tmp_path):
    cat = MappingCatalog(str(tmp_path / "meta"))
    out: list[str] = []
    assert process_line(cat, f"ADD {HELP_JSON}", out=out.append)
    assert any("added mixfs.student" in s for s in out)
    out.clear()
    process_line(cat, "LIST", out=out.append)
    assert out == ["mixfs.student"]
    out.clear()
    process_line(cat, "LIST mixfs.student", out=out.append)
    assert "student2" in out[0]
    out.clear()
    process_line(cat, "ADD {not json", out=out.append)
    assert "error" in out[0]
    out.clear()
    process_line(cat, "DELETE mixfs.student", out=out.append)
    assert out == ["mixfs.student deleted"]
    out.clear()
    process_line(cat, "bogus", out=out.append)
    assert "not supported" in out[0]
    assert not process_line(cat, "EXIT", out=out.append)


def test_cli_map_unmap_end_to_end(spark, tmp_path, student_struct, student_mapping):
    """§2.10 MAP/UNMAP: replicate → ADD mapping → MAP → SQL on the declared
    sparkTableName → UNMAP (Mysql2HbaseCliDriver.scala:81-99 analog)."""
    from mysql_hbase_replicator_spark.catalog.cli import process_line
    from mysql_hbase_replicator_spark.catalog.meta import MappingCatalog
    from mysql_hbase_replicator_spark.operators.merge import ParquetKeyedStore
    from mysql_hbase_replicator_spark.sources.jdbc import snapshot_to_store

    store = ParquetKeyedStore(str(tmp_path / "store"), n_buckets=4)
    snap = spark.createDataFrame([(1, 1, 10, "ann", "a")], student_struct)
    snapshot_to_store(spark, snap, store, student_mapping)

    catalog = MappingCatalog(str(tmp_path / "cat"))
    catalog.add(student_mapping)
    outputs = []
    process_line(catalog, "MAP mixfs.student", out=outputs.append, spark=spark, store=store)
    assert any("mapped to Spark as student2" in o for o in outputs)
    assert spark.sql("SELECT score FROM student2").collect()[0][0] == 10

    process_line(catalog, "UNMAP mixfs.student", out=outputs.append, spark=spark, store=store)
    assert not spark.catalog.tableExists("student2")


# --- r13 review regressions --------------------------------------------------
def test_map_to_spark_accepts_store_shaped_frames(spark, tmp_path):
    """The replicated store carries SINK column names (the kernel renamed
    at write time) — map_to_spark must accept that shape too; the
    source-name-only projection crashed for any renamed mapping (r13
    review; the canonical student mapping masked it because its names are
    identical)."""
    cat = MappingCatalog(str(tmp_path / "meta"))
    cat.add(
        HbaseTableInfo(
            "db", "t", "db:t", "db", "t_view2", "Binary",
            [
                HbaseCollInfo("user_id", "bigint(20)", "userid", "LongType", True),
                HbaseCollInfo("score", "int(11)", "score", "IntegerType", False),
            ],
        )
    )
    store_shaped = spark.createDataFrame([(1, 10)], "userid long, score int")
    cat.map_to_spark(spark, "db.t", store_shaped)
    got = spark.sql("SELECT userid, score FROM t_view2").collect()
    assert [(r.userid, r.score) for r in got] == [(1, 10)]
    cat.unmap_from_spark(spark, "db.t")


def test_cli_map_applies_declared_casts(spark, tmp_path):
    """CLI MAP and library map_to_spark must be ONE registration path: the
    CLI previously registered the raw store frame, exposing drifted types
    the declared casts would have fixed (r13 review)."""
    from mysql_hbase_replicator_spark.operators.merge import ParquetKeyedStore

    cat = MappingCatalog(str(tmp_path / "meta"))
    cat.add(
        HbaseTableInfo(
            "db", "t", "db:t", "db", "t_view3", "Binary",
            [HbaseCollInfo("id", "bigint(20)", "id", "LongType", True)],
        )
    )
    store = ParquetKeyedStore(str(tmp_path / "store"), n_buckets=2)
    # drifted narrow type in the store files: declared LongType, written int
    store.overwrite(spark, "db:t", spark.createDataFrame([(7,)], "id int"), ["id"])
    out: list[str] = []
    assert process_line(cat, "MAP db.t", out=out.append, spark=spark, store=store)
    assert any("mapped to Spark" in s for s in out), out
    [row] = spark.sql("SELECT id FROM t_view3").collect()
    assert row.id == 7
    assert dict(spark.table("t_view3").dtypes)["id"] == "bigint"  # cast applied
    cat.unmap_from_spark(spark, "db.t")


def test_reload_names_the_corrupt_mapping_file(tmp_path):
    """One corrupt .json in the store dir must fail loudly WITH THE FILE
    NAME (r13 review) — and raising (not skipping) is deliberate: silently
    dropping a table from mapped_tables() would stop replicating it."""
    import pytest

    cat = MappingCatalog(str(tmp_path / "meta"))
    with open(tmp_path / "meta" / "broken.json", "w") as f:
        f.write("{not json")
    with pytest.raises(ValueError, match="broken.json"):
        cat.list_names()


def test_intended_mode_tolerates_zerofill():
    """`int(10) unsigned zerofill` fell through to the StringType catch-all
    while the smallint family's `.*` tolerated it — integers silently
    replicated stringified (r13 review)."""
    from mysql_hbase_replicator_spark.functions.types import mysql_type_to_spark_name

    f = lambda s: mysql_type_to_spark_name(s, mode="intended")
    assert f("int(10) unsigned zerofill") == "LongType"
    assert f("int(10) zerofill") == "IntegerType"
    assert f("integer unsigned zerofill") == "LongType"
    assert f("tinyint(4) unsigned zerofill") == "IntegerType"
    assert f("smallint(5) unsigned zerofill") == "IntegerType"
