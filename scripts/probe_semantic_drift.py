"""Frozen-centroid drift probe for IncrementalSemanticDeduper (r15 verdict
#3).

The online deduper trains its k-means cells ONCE, from the first batch —
the right call for admission-decision stability, but on a 100 TB stream
whose distribution drifts, frozen cells slowly unbalance. This probe
measures that degradation directly and validates the compaction-time
occupancy alarm shipped alongside it.

Setup: a CLUSTERED corpus (the regime where SemDeDup's same-cell
assumption actually holds — an isotropic-gaussian first cut gave ~0.5
planted recall even WITHOUT drift, i.e. the assumption, not the frozen
index, was the binding constraint): 90 latent gaussian clusters; batch b
samples clusters [5b, 5b+44] (drift run — a sliding topic window, so by
the last batch every cluster is unseen-at-train) vs clusters [0, 44] for
every batch (control). Each batch also plants near-duplicates of vectors
ADMITTED in the previous batch (source + orthogonal noise at cosine
~0.97, comfortably above the 0.8 gate): a planted dup is caught iff it
lands in its source's frozen cell, so planted recall is the direct read
on boundary staleness.

Per batch, records: screening wall, index cell-occupancy skew (max/mean),
planted-dup recall. The shipped compaction alarm fires when skew crosses
OCCUPANCY_ALARM (its unit test pins the wiring; this probe documents the
trajectories that justify the threshold).

Run: python scripts/probe_semantic_drift.py   (prints one JSON line/batch)
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
BATCH = 2000
N_BATCHES = 10
N_PLANTED = 100
THRESHOLD = 0.8
N_CLUSTERS = 90
ACTIVE = 45  # clusters sampled per batch
SLIDE = 5  # drift: active window advances this many clusters per batch
CENTER_SCALE = 6.0  # |center| / noise sigma: well-separated topics

_CENTERS = None


def centers():
    global _CENTERS
    if _CENTERS is None:
        crng = np.random.default_rng(42)
        c = crng.standard_normal((N_CLUSTERS, DIM))
        c *= CENTER_SCALE / np.linalg.norm(c, axis=1, keepdims=True)
        _CENTERS = c
    return _CENTERS


def make_batch(rng, b: int, drift: bool, next_id: int):
    lo = SLIDE * b if drift else 0
    cl = rng.integers(lo, lo + ACTIVE, size=BATCH)
    fresh = centers()[cl] + rng.standard_normal((BATCH, DIM))
    ids = np.arange(next_id, next_id + BATCH)
    return ids, fresh.astype(np.float32)


def plant_dups(rng, admitted_ids, admitted_vecs, next_id: int):
    """Near-dups of previously admitted vectors: source + orthogonal noise
    with |noise| = 0.25|source| -> cosine ~ 1/sqrt(1.0625) = 0.970 >= gate."""
    k = min(N_PLANTED, len(admitted_ids))
    pick = rng.choice(len(admitted_ids), size=k, replace=False)
    srcs = admitted_vecs[pick].astype(np.float64)
    noise = rng.standard_normal((k, DIM))
    # remove the component along each source, rescale to 0.25|source|
    proj = (noise * srcs).sum(1, keepdims=True) / (srcs * srcs).sum(1, keepdims=True)
    orth = noise - proj * srcs
    orth *= 0.25 * np.linalg.norm(srcs, axis=1, keepdims=True) / np.linalg.norm(
        orth, axis=1, keepdims=True
    )
    dup_ids = np.arange(next_id, next_id + k)
    return (
        dup_ids,
        (srcs + orth).astype(np.float32),
        np.asarray(admitted_ids)[pick],
    )


def run(spark, drift: bool) -> list[dict]:
    from pyspark.sql import functions as F

    from mysql_hbase_replicator_spark.operators.dedup_stream import (
        IncrementalSemanticDeduper,
    )

    rng = np.random.default_rng(7)
    root = tempfile.mkdtemp(prefix="probe_semdrift_")
    n_cells = int(round(BATCH ** 0.5))  # sqrt(first batch) = 45
    dd = IncrementalSemanticDeduper(
        spark,
        os.path.join(root, "index"),
        threshold=THRESHOLD,
        n_cells=n_cells,
        max_files=4,
    )
    out = []
    next_id = 0
    prev_ids = prev_vecs = None
    for b in range(N_BATCHES):
        ids, vecs = make_batch(rng, b, drift, next_id)
        next_id += BATCH
        planted_src = {}
        if prev_ids is not None:
            dids, dvecs, srcs = plant_dups(rng, prev_ids, prev_vecs, next_id)
            next_id += len(dids)
            planted_src = dict(zip(dids.tolist(), srcs.tolist()))
            ids = np.concatenate([ids, dids])
            vecs = np.concatenate([vecs, dvecs])
        df = spark.createDataFrame(
            [(int(i), [float(x) for x in v]) for i, v in zip(ids, vecs)],
            "vec_id long, embedding array<float>",
        )
        t0 = time.time()
        admitted = {r.vec_id for r in dd.process_batch(df).select("vec_id").collect()}
        wall = time.time() - t0
        occ = (
            spark.read.parquet(dd.index_dir)
            .groupBy("cell")
            .count()
            .agg(F.max("count").alias("mx"), F.avg("count").alias("mean"))
            .first()
        )
        planted_caught = sum(1 for d in planted_src if d not in admitted)
        rec = {
            "drift": drift,
            "batch": b,
            "wall_s": round(wall, 2),
            "occupancy_skew": round(occ.mx / occ.mean, 2),
            "max_cell": int(occ.mx),
            "planted": len(planted_src),
            "planted_caught": planted_caught,
            "recall": round(planted_caught / len(planted_src), 3)
            if planted_src
            else None,
        }
        out.append(rec)
        print(json.dumps(rec), flush=True)
        # survivors of THIS batch (fresh only) become next batch's sources
        fresh_mask = [i for i, vid in enumerate(ids) if vid in admitted]
        prev_ids = ids[fresh_mask]
        prev_vecs = vecs[fresh_mask]
    return out


def main() -> None:
    from mysql_hbase_replicator_spark.session import get_spark

    spark = get_spark()
    for drift in (False, True):
        print(f"=== drift={drift} ===", flush=True)
        run(spark, drift)


if __name__ == "__main__":
    main()
