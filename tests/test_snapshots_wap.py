"""Write-audit-publish on the snapshot layer: staged invisibility,
vacuum protection of in-flight audits, abort cleanliness, atomic
publish, and re-stage replacement."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from flow_spark.operators.snapshots import (
    current_version,
    snapshot_abort_staged,
    snapshot_publish,
    snapshot_read,
    snapshot_stage,
    snapshot_staged_read,
    snapshot_vacuum,
    snapshot_write,
)


def _table(spark, tmp, n=100):
    df = spark.range(n).select(F.col("id"), (F.col("id") * 2).alias("v"))
    snapshot_write(df, tmp)
    return df


def test_staged_invisible_until_publish(spark):
    tmp = tempfile.mkdtemp(prefix="wap_")
    _table(spark, tmp)
    snapshot_stage(
        spark.range(100, 150).select(F.col("id"), (F.col("id") * 2).alias("v")),
        tmp,
    )
    # committed version still sees only the original rows
    assert snapshot_read(spark, tmp).count() == 100
    assert snapshot_staged_read(spark, tmp).count() == 50
    v2 = snapshot_publish(tmp)
    assert v2 == 2
    assert snapshot_read(spark, tmp, v2).count() == 150
    # v1 untouched (time travel)
    assert snapshot_read(spark, tmp, 1).count() == 100


def test_abort_leaves_table_unchanged_and_removes_files(spark):
    tmp = tempfile.mkdtemp(prefix="wap_")
    _table(spark, tmp)
    files = snapshot_stage(spark.range(10).select("id", F.lit(0).alias("v")), tmp)
    assert all(os.path.exists(f) for f in files)
    removed = snapshot_abort_staged(tmp)
    assert removed == len(files)
    assert not any(os.path.exists(f) for f in files)
    assert current_version(tmp) == 1
    assert snapshot_read(spark, tmp).count() == 100


def test_vacuum_spares_staged_files(spark):
    tmp = tempfile.mkdtemp(prefix="wap_")
    _table(spark, tmp)
    files = snapshot_stage(spark.range(10).select("id", F.lit(0).alias("v")), tmp)
    # grace 0 would normally sweep unreferenced write dirs immediately
    snapshot_vacuum(tmp, keep_versions=2, orphan_grace_seconds=0)
    assert all(os.path.exists(f) for f in files), "vacuum collected staged files"
    # after publish they are manifest-owned; after that a vacuum still keeps them
    snapshot_publish(tmp)
    snapshot_vacuum(tmp, keep_versions=2, orphan_grace_seconds=0)
    assert snapshot_read(spark, tmp).count() == 110


def test_restage_replaces_marker(spark):
    tmp = tempfile.mkdtemp(prefix="wap_")
    _table(spark, tmp)
    snapshot_stage(spark.range(5).select("id", F.lit(1).alias("v")), tmp)
    snapshot_stage(spark.range(7).select("id", F.lit(2).alias("v")), tmp)
    assert snapshot_staged_read(spark, tmp).count() == 7
    v2 = snapshot_publish(tmp)
    assert snapshot_read(spark, tmp, v2).count() == 107


def test_publish_preserves_deletion_vectors(spark, tmp_path):
    """WAP publish after a merge-on-read delete must carry the deletion
    vectors of the inherited files — the resurrect bug class."""
    from pyspark.sql import functions as F

    from flow_spark.operators.snapshots import (
        snapshot_delete,
        snapshot_publish,
        snapshot_read,
        snapshot_stage,
        snapshot_write,
    )

    t = str(tmp_path / "tbl")
    snapshot_write(spark.range(20).select(F.col("id").alias("k")), t)
    snapshot_delete(spark, t, "k < 5")
    snapshot_stage(spark.range(100, 103).select(F.col("id").alias("k")), t)
    v = snapshot_publish(t)
    live = sorted(r.k for r in snapshot_read(spark, t, v).collect())
    assert live == list(range(5, 20)) + [100, 101, 102]
