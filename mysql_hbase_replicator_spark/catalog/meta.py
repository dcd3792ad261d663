"""Mapping catalog (SURVEY.md §2.1 S6/S7, §2.10).

The reference persists one JSON blob per replicated table in HBase meta table
``mysql2hbase`` (rowkey = ``db.table``, cf ``cf``, qualifier ``data`` —
HBaseTableUtils.scala:13-15,53-64) and registers mapped tables into a Spark
SQL catalog (Hbase2CataLog.scala:19-27). Here:

- ``HbaseTableInfo``/``HbaseCollInfo`` dataclasses round-trip the exact JSON
  field names of the reference's lift-json serialization
  (HbaseTableInfo.scala:28-35,195-196; canonical example
  Mysql2HbaseCliDriver.scala:41-48).
- ``MappingCatalog`` stores the blobs as JSON files under a directory (one
  file per table, rowkey = filename) — the HBase meta-table analog — with
  the same in-memory map + lazy reload the reference keeps
  (HBaseTableUtils.scala:16,73-78).
- ``map_to_spark`` registers the mapped table as a temp view with renamed /
  cast columns, the ``HBase2Catalog.mappingTableToSpark`` analog.
"""

from __future__ import annotations

import json
import os
import re
from dataclasses import asdict, dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mysql_hbase_replicator_spark.functions.types import (
    SIX_TYPES,
    default_name_mapping,
    mysql_type_to_spark_name,
    spark_type_from_name,
)


@dataclass
class HbaseCollInfo:
    """Column mapping entry (HbaseTableInfo.scala:195-196)."""

    dbColumnName: str
    dbColumnType: str
    hbaseColumnName: str
    hbaseColumnType: str
    isPrimaryKey: bool
    family: str = "cf"

    @classmethod
    def default(cls, db_col: str, db_type: str, is_pk: bool) -> HbaseCollInfo:
        """HbaseCollInfo.apply defaults (HbaseTableInfo.scala:136-140):
        strip-underscore name + default type mapping."""
        return cls(
            dbColumnName=db_col,
            dbColumnType=db_type,
            hbaseColumnName=default_name_mapping(db_col),
            hbaseColumnType=mysql_type_to_spark_name(db_type),
            isPrimaryKey=is_pk,
        )


@dataclass
class HbaseTableInfo:
    """Replication mapping (HbaseTableInfo.scala:28-35); JSON field names are
    the wire format — do not rename."""

    dbName: str
    dbTableName: str
    hbaseTableName: str
    hbaseNameSpace: str
    sparkTableName: str
    bytesUtils: str = "Binary"  # default per HbaseTableInfo.scala:25
    cols: list[HbaseCollInfo] = field(default_factory=list)

    @property
    def full_name(self) -> str:
        """``getfullName`` (HbaseTableInfo.scala:36)."""
        return f"{self.dbName}.{self.dbTableName}"

    def key_columns(self) -> list[HbaseCollInfo]:
        return [c for c in self.cols if c.isPrimaryKey]

    def non_key_columns(self) -> list[HbaseCollInfo]:
        return [c for c in self.cols if not c.isPrimaryKey]

    def validate(self, restrict_to_six: bool = True) -> None:
        """Catalog-side validation: the reference accepts only six Spark
        types (HbaseTableInfo.scala:146-156) and needs ≥1 key column for
        rowkey encoding (HbaseApplier.scala:231-233)."""
        if not self.key_columns():
            raise ValueError(f"{self.full_name}: mapping has no primary-key column")
        for c in self.cols:
            if restrict_to_six and c.hbaseColumnType not in SIX_TYPES:
                raise ValueError("Unsupported HBase SQL Data Type")

    def to_json(self) -> str:
        return json.dumps(asdict(self), ensure_ascii=False)

    @classmethod
    def from_json(cls, ser: str) -> HbaseTableInfo:
        d = json.loads(ser)
        cols = [HbaseCollInfo(**c) for c in d.pop("cols", [])]
        return cls(cols=cols, **d)


_SAFE_NAME = re.compile(r"[^A-Za-z0-9_.:-]")


class MappingCatalog:
    """CRUD over the mapping store + Spark catalog registration.

    API mirrors the reference CLI verbs (Mysql2HbaseCliDriver.scala:116-129):
    add / list / delete / map / unmap.
    """

    def __init__(self, store_dir: str):
        self.store_dir = store_dir
        os.makedirs(store_dir, exist_ok=True)
        self._relation_map: dict[str, HbaseTableInfo] = {}  # HBaseTableUtils.scala:16

    def _path(self, full_name: str) -> str:
        return os.path.join(self.store_dir, _SAFE_NAME.sub("_", full_name) + ".json")

    # --- CRUD (HBaseTableUtils.scala:30-64) --------------------------------
    def add(self, info: HbaseTableInfo | str, validate: bool = True) -> HbaseTableInfo:
        if isinstance(info, str):
            info = HbaseTableInfo.from_json(info)
        if validate:
            info.validate()
        tmp = self._path(info.full_name) + ".tmp"
        with open(tmp, "w") as f:
            f.write(info.to_json())
        os.replace(tmp, self._path(info.full_name))
        self._relation_map[info.full_name] = info
        return info

    def get(self, full_name: str) -> HbaseTableInfo | None:
        """``getRelation``: consult the in-memory map, lazily reloading from
        the store when empty (HBaseTableUtils.scala:73-78)."""
        if not self._relation_map:
            self.reload()
        return self._relation_map.get(full_name)

    def list_names(self) -> list[str]:
        self.reload()
        return sorted(self._relation_map)

    def delete(self, full_name: str) -> bool:
        path = self._path(full_name)
        self._relation_map.pop(full_name, None)
        if os.path.exists(path):
            os.remove(path)
            return True
        return False

    def reload(self) -> None:
        """Full-scan load (``getHbaseTableInfoMap``, HBaseTableUtils.scala:81-93).
        A file that fails to parse raises with ITS NAME in the message
        (r13 review: the bare json error left the operator guessing which
        of N files was corrupt). Raising — not skipping — is deliberate:
        ``mapped_tables`` feeds the replication filter, and silently
        dropping a table from it would stop replicating it."""
        self._relation_map = {}
        for fn in os.listdir(self.store_dir):
            if fn.endswith(".json"):
                try:
                    with open(os.path.join(self.store_dir, fn)) as f:
                        info = HbaseTableInfo.from_json(f.read())
                except Exception as exc:
                    raise ValueError(
                        f"corrupt mapping file {fn!r} in {self.store_dir}: {exc}"
                    ) from exc
                self._relation_map[info.full_name] = info

    def mapped_tables(self) -> set[str]:
        """Replication filter input (``isTableNeedReplicated``,
        HBaseTableUtils.scala:25-28)."""
        self.reload()
        return set(self._relation_map)

    # --- Spark registration (Hbase2CataLog.scala:19-27) --------------------
    def map_to_spark(self, spark: SparkSession, full_name: str, source: DataFrame | str) -> DataFrame:
        """Register the mapped table under ``sparkTableName`` with the
        declared types applied. ``source`` (DataFrame or parquet path) may
        be either shape: the REPLICATED store, whose columns already carry
        the SINK names (the kernel renamed at write time), or a
        source-shaped frame still carrying db column names (renamed here).
        Resolved per column by presence, sink name first — the previous
        source-name-only projection crashed the view for any store-shaped
        frame of a mapping with renamed columns (r13 review; the canonical
        student mapping masked it because its names are identical). The
        declared cast is re-applied defensively: a store read without a
        schema doc falls back to mergeSchema, where drifted file types
        would otherwise leak into SQL."""
        info = self.get(full_name)
        if info is None:
            raise KeyError(f"No table named {full_name} found")
        df = spark.read.parquet(source) if isinstance(source, str) else source
        cols = set(df.columns)
        projected = df.select(
            *[
                F.col(
                    c.hbaseColumnName if c.hbaseColumnName in cols else c.dbColumnName
                )
                .cast(spark_type_from_name(c.hbaseColumnType, restrict_to_six=False))
                .alias(c.hbaseColumnName)
                for c in info.cols
            ]
        )
        projected.createOrReplaceTempView(info.sparkTableName)
        return projected

    def unmap_from_spark(self, spark: SparkSession, full_name: str) -> None:
        """``deleteTableInSpark`` analog."""
        info = self.get(full_name)
        name = info.sparkTableName if info else full_name
        spark.catalog.dropTempView(name)
