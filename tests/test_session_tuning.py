"""Volume-derived shuffle-partition sizing (session.py, r11).

The r10 sf≈100 probe measured the rule (initialPartitionNum ≈
largest-shuffle / 128 MB, with the largest shuffle tracking parquet input
volume at ≤2.5× compressed amplification); these tests pin the derivation
so it can't silently drift away from the measured calibration points."""

import math
import os

from mysql_hbase_replicator_spark.session import (
    SHUFFLE_AMPLIFICATION,
    TARGET_SHUFFLE_PARTITION_BYTES,
    apply_volume_tuning,
    dir_input_bytes,
    volume_tuned_partitions,
)

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def test_small_sf_floors_at_cores():
    # every driver test SF is megabytes: derived count must be the cores
    # floor, so sf0.01/sf0.1 bench numbers are untouched by the tuning
    assert volume_tuned_partitions(SF, cpus=32) == 32
    assert volume_tuned_partitions("/root/testdata/sf0.1", cpus=32) == 32


def test_sf100_regime_reproduces_probe_optimum():
    # calibration point: the sf≈100 probe dataset is ~17.5 GB of parquet
    # and its measured optimum was 256 (zero spill on the Q21 pair). The
    # rule must land in the same regime — a few hundred, not cores and
    # not thousands.
    b = int(17.5 * (1 << 30))
    n = volume_tuned_partitions(cpus=32, input_bytes=b)
    assert n == max(32, math.ceil(b * SHUFFLE_AMPLIFICATION / TARGET_SHUFFLE_PARTITION_BYTES))
    assert 192 <= n <= 384


def test_missing_dir_falls_back_to_cores():
    assert volume_tuned_partitions("/nonexistent/sfX", cpus=16) == 16


def test_dir_input_bytes_counts_parquet_only(tmp_path):
    (tmp_path / "a.parquet").write_bytes(b"x" * 100)
    sub = tmp_path / "t.parquet"  # partitioned-table directory shape
    sub.mkdir()
    (sub / "part-0.parquet").write_bytes(b"y" * 50)
    (tmp_path / "notes.txt").write_bytes(b"z" * 999)
    assert dir_input_bytes(str(tmp_path)) == 150


def test_apply_volume_tuning_sets_live_conf(spark, monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_INIT_PARTITIONS", raising=False)
    n = apply_volume_tuning(spark, SF, cpus=8)
    assert n == 8
    assert (
        spark.conf.get("spark.sql.adaptive.coalescePartitions.initialPartitionNum")
        == "8"
    )
    # env override wins (A/B probe path)
    monkeypatch.setenv("SPARK_GRAFT_INIT_PARTITIONS", "256")
    assert apply_volume_tuning(spark, SF) == 256
    assert (
        spark.conf.get("spark.sql.adaptive.coalescePartitions.initialPartitionNum")
        == "256"
    )
    # restore the session default (cores) for whatever test runs next
    monkeypatch.delenv("SPARK_GRAFT_INIT_PARTITIONS", raising=False)
    apply_volume_tuning(spark, SF)
