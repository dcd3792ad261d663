"""Admin REPL (SURVEY.md §2.10) — the Mysql2HbaseCliDriver analog.

Commands (Mysql2HbaseCliDriver.scala:116-129): ADD <json>, LIST [tables...],
DELETE <table>, MAP/UNMAP <table>, HELP, EXIT/QUIT. The HELP text embeds the
reference's canonical student-table JSON (Mysql2HbaseCliDriver.scala:41-48).

Usage: python -m mysql_hbase_replicator_spark.catalog.cli [store_dir]
"""

from __future__ import annotations

import sys

from mysql_hbase_replicator_spark.catalog.meta import MappingCatalog

HELP_JSON = (
    '{"dbName":"mixfs","dbTableName":"student","hbaseTableName":"mixfs:student2",'
    '"hbaseNameSpace":"mixfs","sparkTableName":"student2","bytesUtils":"Binary","cols":['
    '{"dbColumnName":"sn","dbColumnType":"int(11)","hbaseColumnName":"sn",'
    '"hbaseColumnType":"IntegerType","isPrimaryKey":true,"family":"cf"},'
    '{"dbColumnName":"id","dbColumnType":"int(11)","hbaseColumnName":"id",'
    '"hbaseColumnType":"IntegerType","isPrimaryKey":true,"family":"cf"},'
    '{"dbColumnName":"score","dbColumnType":"int(11)","hbaseColumnName":"score",'
    '"hbaseColumnType":"IntegerType","isPrimaryKey":false,"family":"cf"},'
    '{"dbColumnName":"name","dbColumnType":"varchar(10)","hbaseColumnName":"name",'
    '"hbaseColumnType":"StringType","isPrimaryKey":false,"family":"cf"},'
    '{"dbColumnName":"rem","dbColumnType":"varchar(2)","hbaseColumnName":"rem",'
    '"hbaseColumnType":"StringType","isPrimaryKey":false,"family":"cf"}'
    "]}"
)


def format_table(info) -> str:
    """LIST pretty-printer (HbaseTableInfo.scala:54-87, simplified layout)."""
    lines = [f"== {info.full_name} =="]
    for k in ("dbName", "dbTableName", "hbaseTableName", "hbaseNameSpace", "sparkTableName", "bytesUtils"):
        lines.append(f"  {k:<16} {getattr(info, k)}")
    lines.append(f"  {'col':<16} {'dbType':<14} {'sinkName':<14} {'sinkType':<12} pk")
    for c in info.cols:
        lines.append(
            f"  {c.dbColumnName:<16} {c.dbColumnType:<14} {c.hbaseColumnName:<14} "
            f"{c.hbaseColumnType:<12} {c.isPrimaryKey}"
        )
    return "\n".join(lines)


def process_line(catalog: MappingCatalog, line: str, out=print, spark=None, store=None) -> bool:
    """Dispatch one REPL line; returns False on EXIT/QUIT.

    ``spark`` + ``store`` (a ParquetKeyedStore) enable MAP/UNMAP — the
    Hbase2CataLog.mappingTableToSpark analog: MAP registers the replicated
    table under its declared sparkTableName for SQL."""
    tokens = line.strip().split(None, 1)
    if not tokens:
        return True
    cmd, rest = tokens[0].upper(), (tokens[1] if len(tokens) > 1 else "")
    if cmd in ("EXIT", "QUIT"):
        return False
    if cmd == "HELP":
        out("add <json> | list [table] | delete <table> | map <table> | unmap <table>")
        out("--------------- json example---------------")
        out(HELP_JSON)
        return True
    if cmd == "ADD":
        try:
            info = catalog.add(rest)
            out(f"added {info.full_name}")
        except Exception as exc:  # json parse / validation error, keep REPL alive
            out(f"json parse or catalog error: {exc}")
        return True
    if cmd == "LIST":
        names = rest.split() if rest else []
        if not names:
            for n in catalog.list_names():
                out(n)
        for n in names:
            info = catalog.get(n)
            out(format_table(info) if info else f"No table named {n} found")
        return True
    if cmd == "DELETE":
        for n in rest.split():
            out(f"{n} deleted" if catalog.delete(n) else f"No table named {n} found")
        return True
    if cmd in ("MAP", "UNMAP"):
        if spark is None:
            out(f"{cmd} requires a SparkSession: use MappingCatalog.map_to_spark()/unmap_from_spark()")
            return True
        for n in rest.split():
            info = catalog.get(n)
            if info is None:
                out(f"No table named {n} found")
                continue
            if cmd == "UNMAP":
                catalog.unmap_from_spark(spark, n)
                out(f"{n} unmapped")
                continue
            df = store.read(spark, info.hbaseTableName or info.full_name) if store else None
            if df is None:
                out(f"no replicated data for {n}")
                continue
            # ONE registration path: the library's map_to_spark applies the
            # declared casts over the sink-named store frame — the CLI
            # previously registered the raw frame, so the two paths could
            # expose different types for the same table (r13 review)
            catalog.map_to_spark(spark, n, df)
            out(f"{n} mapped to Spark as {info.sparkTableName}")
        return True
    out(f"{line.strip()} is not supported")
    return True


def main() -> None:
    store = sys.argv[1] if len(sys.argv) > 1 else "./_mapping_catalog"
    catalog = MappingCatalog(store)
    while True:
        try:
            line = input("Mysql2Hbase> ")
        except EOFError:
            break
        try:
            keep_going = process_line(catalog, line)
        except Exception as exc:  # an admin REPL outlives a bad command
            # (e.g. one corrupt mapping file crashing LIST — r13 review)
            print(f"error: {exc}")
            continue
        if not keep_going:
            break


if __name__ == "__main__":
    main()
