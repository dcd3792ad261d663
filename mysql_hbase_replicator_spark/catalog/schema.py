"""Source-schema model and change detection (SURVEY.md §1.4).

Mirrors the reference's runtime schema handling:

- ``ColInfo(name, type_lower, enum_values, is_primary_key)``
  (reference ColInfo.scala:10) — MySQL type kept as a lowercase string,
  enum labels materialized.
- ``TableSchema`` ≈ ``TableInfo`` (TableInfo.scala:18): positional column
  list + PK set; name helpers ``db_table_name``/``h_table_name``
  (TableInfo.scala:49-63).
- ``same_data`` comparison (TableInfo.scala:19-27). The reference compares
  nullability with ``!=`` — an inverted clause that makes ``sameData`` return
  False for an *unchanged* table (and so re-fetches schema every event) —
  we implement the evident intent (``==``) and expose the faithful variant
  for parity testing.
- PK schema change is fatal (``isKeyColumnChanged`` → throw,
  MySQLExtractor.scala:195-198): modeled as ``PrimaryKeyChangedError``, which
  the streaming layer converts into query termination.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import types as T

from mysql_hbase_replicator_spark.functions.types import mysql_type_to_spark


class PrimaryKeyChangedError(RuntimeError):
    """Raised when a table's primary-key column set/type changes mid-stream
    (the reference kills the replicator: MySQLExtractor.scala:195-198)."""


@dataclass(frozen=True)
class ColInfo:
    name: str
    type_lower: str
    enum_values: tuple[str, ...] = ()
    is_primary_key: bool = False


@dataclass
class TableSchema:
    database: str
    table: str
    cols: list[ColInfo] = field(default_factory=list)

    # --- name helpers (TableInfo.scala:49-63) ------------------------------
    @property
    def db_name(self) -> str:
        return self.database

    @property
    def h_table_name(self) -> str:
        return f"{self.database}_{self.table}"

    @property
    def db_table_name(self) -> str:
        return f"{self.database}.{self.table}"

    # --- key/non-key views (TableInfo.scala:41-47) -------------------------
    def key_columns(self) -> list[tuple[str, str]]:
        return [(c.name, c.type_lower) for c in self.cols if c.is_primary_key]

    def non_key_columns(self) -> list[tuple[str, str]]:
        return [(c.name, c.type_lower) for c in self.cols if not c.is_primary_key]

    def pk_ordinals(self) -> list[int]:
        """BitSet analog (ColInfo.scala:58-63)."""
        return [i for i, c in enumerate(self.cols) if c.is_primary_key]

    # --- change detection (TableInfo.scala:19-39) --------------------------
    def same_data(self, other: TableSchema, faithful: bool = False) -> bool:
        """Schema-cache comparison; True → cached entry still valid.

        ``faithful=True`` reproduces the reference's inverted nullability
        clause (TableInfo.scala:26 uses ``!=``): ColInfo tracks no
        nullability, and two columns lists that agree on names and types
        agree on nullability in every case the reference meets, so the
        inverted comparison over equal lists is constant False — the cache
        is ALWAYS invalidated. (An earlier stand-in inverted the
        column-NAME comparison instead, which wrongly reported a RENAMED
        column as an unchanged schema — the one case where the reference
        and that stand-in disagreed; r13 review.) Default is the evident
        intent: names and types equal."""
        if faithful:
            return False
        # evident intent: every field that changes decode semantics — name,
        # type, the PK flag (the closest analog of the nullability the
        # reference compares: PK promote/demote with unchanged names/types
        # must invalidate, r13 review), and enum labels (a re-ordered ENUM
        # decodes every subsequent row image differently)
        return (
            self.database == other.database
            and self.table == other.table
            and [
                (c.name, c.type_lower, c.is_primary_key, tuple(c.enum_values))
                for c in self.cols
            ]
            == [
                (c.name, c.type_lower, c.is_primary_key, tuple(c.enum_values))
                for c in other.cols
            ]
        )

    def is_key_column_changed(self, other: TableSchema) -> bool:
        """TableInfo.scala:29-31 — compares sorted (name, type) PK lists."""
        return sorted(self.key_columns()) != sorted(other.key_columns())

    def check_key_unchanged(self, other: TableSchema) -> None:
        if self.is_key_column_changed(other):
            raise PrimaryKeyChangedError(
                f"primary key changed for {self.db_table_name}: "
                f"{sorted(self.key_columns())} -> {sorted(other.key_columns())}"
            )

    def non_key_columns_added(self, other: TableSchema) -> list[tuple[str, str]]:
        """Columns in ``other`` but not self (TableInfo.scala:33-35)."""
        mine = set(self.non_key_columns())
        return [c for c in other.non_key_columns() if c not in mine]

    def non_key_columns_dropped(self, other: TableSchema) -> list[tuple[str, str]]:
        """Columns in self but not ``other`` (TableInfo.scala:37-39)."""
        theirs = set(other.non_key_columns())
        return [c for c in self.non_key_columns() if c not in theirs]

    # --- Spark schema -------------------------------------------------------
    def to_struct(self, mode: str = "native") -> T.StructType:
        fields = []
        for c in self.cols:
            dt = mysql_type_to_spark(c.type_lower, mode=mode)
            md = {"mysql_type": c.type_lower, "is_pk": c.is_primary_key}
            if c.enum_values:
                md["enum_values"] = list(c.enum_values)
            fields.append(T.StructField(c.name, dt, nullable=not c.is_primary_key, metadata=md))
        return T.StructType(fields)
