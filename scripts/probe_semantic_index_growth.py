"""Per-trigger cost vs index size for IncrementalSemanticDeduper (r16).

The r16 layout change stores the index as cell= directory partitions and
statically prunes each screen to the batch's touched cells. The claim to
verify: with TOPIC-LOCAL batches (each batch drawn from a few clusters —
the realistic ingest shape: a crawl frontier, a source dump, a day of one
domain), per-trigger wall stays FLAT as the index grows, because the
screen reads only the touched cells; UNIFORM batches (touch every cell)
are the worst case and pay the full-index read.

10 batches x 5000 vectors over 45 well-separated clusters, 45 frozen
cells; 'local' mode samples each batch from 3 clusters (rotating),
'uniform' from all 45. Prints one JSON line per batch with the process
wall and the index size.

Run: python scripts/probe_semantic_index_growth.py
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DIM = 64
BATCH = 5000
N_BATCHES = 10
N_CLUSTERS = 45
LOCAL_SPREAD = 3  # clusters per batch in local mode


def run(spark, mode: str) -> None:
    from mysql_hbase_replicator_spark.operators.dedup_stream import (
        IncrementalSemanticDeduper,
    )

    crng = np.random.default_rng(42)
    centers = crng.standard_normal((N_CLUSTERS, DIM))
    centers *= 6.0 / np.linalg.norm(centers, axis=1, keepdims=True)
    rng = np.random.default_rng(11)
    root = tempfile.mkdtemp(prefix=f"probe_semgrow_{mode}_")
    dd = IncrementalSemanticDeduper(
        spark,
        os.path.join(root, "index"),
        threshold=0.8,
        n_cells=N_CLUSTERS,
        max_files=10**6,  # size the probe to the screen, not compaction
    )
    nid = 0
    for b in range(N_BATCHES):
        if mode == "uniform":
            cls = rng.integers(0, N_CLUSTERS, BATCH)
        else:
            lo = (b * LOCAL_SPREAD) % N_CLUSTERS
            cls = lo + rng.integers(0, LOCAL_SPREAD, BATCH)
        # batch 0 must SEE every cluster in local mode too, or training
        # collapses the cell space to 3 topics
        if b == 0:
            cls = rng.integers(0, N_CLUSTERS, BATCH)
        vecs = centers[cls] + rng.standard_normal((BATCH, DIM))
        ids = np.arange(nid, nid + BATCH)
        nid += BATCH
        df = spark.createDataFrame(
            [(int(i), [float(x) for x in v]) for i, v in zip(ids, vecs)],
            "vec_id long, embedding array<float>",
        )
        t0 = time.time()
        n_adm = dd.process_batch(df).count()
        wall = time.time() - t0
        print(
            json.dumps(
                {
                    "mode": mode,
                    "batch": b,
                    "index_rows_before": b * BATCH if b else 0,
                    "admitted": n_adm,
                    "wall_s": round(wall, 2),
                }
            ),
            flush=True,
        )
    # one compaction at the end so the final layout is the production one
    dd.compact()


def main() -> None:
    from mysql_hbase_replicator_spark.session import get_spark

    spark = get_spark()
    for mode in ("uniform", "local"):
        print(f"=== mode={mode} ===", flush=True)
        run(spark, mode)


if __name__ == "__main__":
    main()
