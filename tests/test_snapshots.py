"""Manifest-snapshot semantics: time travel, atomicity, file sharing."""

from __future__ import annotations

import json
import os

from flow_spark.operators.snapshots import (
    current_version,
    snapshot_files,
    snapshot_read,
    snapshot_write,
)


def test_old_versions_are_immutable(spark, tmp_path):
    """A committed version must read identically forever, regardless of
    how many later versions are written."""
    t = str(tmp_path / "tbl")
    v1 = snapshot_write(spark.range(10).selectExpr("id AS k"), t)
    before = sorted(r.k for r in snapshot_read(spark, t, v1).collect())
    snapshot_write(spark.range(100, 120).selectExpr("id AS k"), t)
    snapshot_write(spark.range(500, 510).selectExpr("id AS k"), t)
    after = sorted(r.k for r in snapshot_read(spark, t, v1).collect())
    assert before == after == list(range(10))
    assert current_version(t) == 3
    # default read = latest version only
    assert sorted(r.k for r in snapshot_read(spark, t).collect()) == list(
        range(500, 510)
    )


def test_append_version_shares_files(spark, tmp_path):
    """reuse_files makes v2 a superset manifest: v1's files appear in v2
    verbatim (no data copy), plus the new files."""
    t = str(tmp_path / "tbl")
    v1 = snapshot_write(spark.range(5).selectExpr("id AS k"), t)
    v1_files = snapshot_files(t, v1)
    v2 = snapshot_write(
        spark.range(5, 9).selectExpr("id AS k"), t, reuse_files=v1_files
    )
    v2_files = snapshot_files(t, v2)
    assert set(v1_files) < set(v2_files)
    assert sorted(r.k for r in snapshot_read(spark, t, v2).collect()) == list(
        range(9)
    )


def test_partial_manifest_never_visible(spark, tmp_path):
    """A leftover .tmp manifest (crash mid-commit) is invisible: version
    listing and reads ignore it."""
    t = str(tmp_path / "tbl")
    snapshot_write(spark.range(3).selectExpr("id AS k"), t)
    tmp_manifest = os.path.join(t, "_manifests", "v2.json.tmp")
    with open(tmp_manifest, "w") as fh:
        json.dump({"version": 2, "files": ["/nonexistent.parquet"]}, fh)
    assert current_version(t) == 1
    assert sorted(r.k for r in snapshot_read(spark, t).collect()) == [0, 1, 2]


def test_reads_prune_and_push_down(spark, tmp_path):
    """A snapshot read is a NORMAL parquet scan: filters reach the scan
    (PushedFilters) — the manifest only fixes the file set."""
    t = str(tmp_path / "tbl")
    snapshot_write(spark.range(1000).selectExpr("id AS k", "id * 2 AS v"), t)
    df = snapshot_read(spark, t).filter("k = 7").select("v")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(k), EqualTo(k,7)]" in plan
    assert [tuple(r) for r in df.collect()] == [(14,)]


def test_schema_evolution_reads_old_files_with_nulls(spark, tmp_path):
    """A version that ADDS a column still reuses v1's files: the manifest
    schema is the read authority, so old files fill the new column with
    NULLs (no mergeSchema footer sweep)."""
    t = str(tmp_path / "tbl")
    v1 = snapshot_write(spark.range(3).selectExpr("id AS k"), t)
    v2 = snapshot_write(
        spark.range(3, 5).selectExpr("id AS k", "id * 10 AS v"),
        t,
        reuse_files=snapshot_files(t, v1),
    )
    rows = {r.k: r.v for r in snapshot_read(spark, t, v2).collect()}
    assert rows == {0: None, 1: None, 2: None, 3: 30, 4: 40}
    # v1 unchanged, still its own (narrower) schema
    assert snapshot_read(spark, t, v1).columns == ["k"]
