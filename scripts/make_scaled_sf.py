"""Generate a locally-scaled copy of a test SF directory (default: 10x
sf0.1 -> "sf~1") for the scaling probe in SCALING.md.

/root/testdata is read-only, so the scaled copy is written elsewhere
(default /tmp/sf1). Scaling replicates each fact table n_copies times with
DISJOINT key ranges (copy i shifts every key column by i*stride), so:

- PK uniqueness and FK join fan-outs are preserved exactly (each copy joins
  only within itself: selectivities, group sizes, and skew shapes match the
  source at 10x total volume);
- the fixed dimensions (region, nation) are NOT scaled, like TPC-H;
- document text gets a per-copy suffix token (" cN") so cross-copy pairs
  are NEAR-dups (jaccard ~0.9), not exact dups — exercising the LSH path
  at 10x its pair load instead of degenerating into exact-hash groups;
- embeddings replicate unchanged (queries/seeds read vec_id < k, which
  stays copy-0, so ANN semantics are unchanged at 10x corpus);
- timestamps are left alone: 10x the rows in the same time range models
  growing traffic, keeping window/session queries comparable.

For BIG scale-ups (sf~10 = 100 copies) the per-copy suffix alone would be
wrong for documents: every doc would have n_copies-1 near-dups, a
duplication factor GROWING with corpus size — real corpora hold it roughly
constant, and dedup output would grow quadratically. ``family_size``
(default n_copies, i.e. one family = the historical behavior) groups
copies into families: within a family, copies are near-dups (suffix
token); across families, every token is rewritten with a family tag
(regexp: token -> token~fN), making shingle sets disjoint (jaccard ~0).
So 100 copies at family_size=10 means 10x the sf~1 corpus at the SAME
~10-near-dup duplication factor — the realistic constant-dup regime.

Usage: python scripts/make_scaled_sf.py [src_sf_dir] [dst_dir] [n_copies] [family_size] [stride_mult]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# key columns to shift per table: {table: {column: stride}}
KEY_STRIDES: dict[str, dict[str, int]] = {
    "customer": {"c_custkey": 10_000_000},
    "supplier": {"s_suppkey": 10_000_000},
    "part": {"p_partkey": 10_000_000},
    "orders": {"o_orderkey": 100_000_000, "o_custkey": 10_000_000},
    "lineitem": {
        "l_orderkey": 100_000_000,
        "l_partkey": 10_000_000,
        "l_suppkey": 10_000_000,
    },
    "events": {"event_id": 100_000_000, "user_id": 10_000_000},
    "documents": {"doc_id": 100_000_000},
    "embeddings": {"vec_id": 100_000_000},
}
UNSCALED = ("region", "nation")


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
    n_copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    family_size = int(sys.argv[4]) if len(sys.argv) > 4 else n_copies
    # Stride multiplier for SECOND-stage scale-ups (src is itself a scaled
    # dir): the base strides clear sf0.1's key ranges but not a 100-copy
    # dir's shifted keys, so e.g. sf10 -> sf100 passes 1000 (strides then
    # clear the ~1e9 custkey / ~1e10 orderkey ranges; int64 holds to 9.2e18).
    stride_mult = int(sys.argv[5]) if len(sys.argv) > 5 else 1

    from pyspark.sql import functions as F

    from mysql_hbase_replicator_spark.session import get_spark

    spark = get_spark(app_name="make-scaled-sf")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(dst, exist_ok=True)

    for t in UNSCALED:
        spark.read.parquet(f"{src}/{t}.parquet").write.mode("overwrite").parquet(
            f"{dst}/{t}.parquet"
        )
        print(f"{t}: copied unscaled")

    for t, strides in KEY_STRIDES.items():
        base = spark.read.parquet(f"{src}/{t}.parquet")
        copies = []
        for i in range(n_copies):
            c = base
            for col, stride in strides.items():
                c = c.withColumn(
                    col, (F.col(col) + F.lit(i * stride * stride_mult)).cast("long")
                )
            if t == "documents" and i > 0:
                fam = i // family_size
                if fam > 0:
                    # disjoint token space per family: cross-family jaccard ~0
                    c = c.withColumn(
                        "text", F.regexp_replace("text", r"(\S+)", f"$1~f{fam}")
                    )
                if i % family_size != 0:
                    # near-dup, not exact dup, within the family
                    c = c.withColumn("text", F.concat(F.col("text"), F.lit(f" c{i}")))
                c = c.withColumn("n_chars", F.length("text").cast("long"))
            copies.append(c)
        out = copies[0]
        for c in copies[1:]:
            out = out.unionByName(c)
        out.write.mode("overwrite").parquet(f"{dst}/{t}.parquet")
        n = spark.read.parquet(f"{dst}/{t}.parquet").count()
        print(f"{t}: {n} rows ({n_copies} copies)")

    spark.stop()


if __name__ == "__main__":
    main()
