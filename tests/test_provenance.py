"""Provenance operator: cross-engine agreement with DuckDB's
file_row_number, stability across partitionings, and manifest math."""

from __future__ import annotations

import duckdb
import pyspark.sql.functions as F

from flow_spark.operators.provenance import (
    provenance_manifest,
    read_with_provenance,
    stable_example_id,
)

PATH = "/root/testdata/sf0.001/documents.parquet"


def test_provenance_matches_duckdb(spark):
    got = sorted(
        (r.prov_pos, r.doc_id)
        for r in read_with_provenance(spark, PATH).select("prov_pos", "doc_id").collect()
    )
    want = sorted(
        duckdb.connect()
        .execute(
            "SELECT file_row_number, doc_id FROM "
            "read_parquet(?, file_row_number=true)",
            [PATH],
        )
        .fetchall()
    )
    assert got == want


def test_provenance_stable_under_repartition(spark):
    df = read_with_provenance(spark, PATH)
    a = sorted((r.doc_id, r.prov_pos) for r in df.collect())
    b = sorted(
        (r.doc_id, r.prov_pos) for r in df.repartition(13).collect()
    )
    assert a == b


def test_manifest_accounts_all_rows(spark):
    df = read_with_provenance(spark, PATH)
    m = provenance_manifest(df).collect()
    assert len(m) == 1  # single-file fixture
    row = m[0]
    n = df.count()
    assert row.n_rows == n
    assert row.first_pos == 0 and row.last_pos == n - 1


def test_stable_example_id_unique_and_rereadable(spark):
    df = stable_example_id(read_with_provenance(spark, PATH))
    n = df.count()
    assert df.select("example_id").distinct().count() == n
    again = stable_example_id(read_with_provenance(spark, PATH))
    a = sorted(r.example_id for r in df.collect())
    b = sorted(r.example_id for r in again.collect())
    assert a == b
