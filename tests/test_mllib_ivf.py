"""MLlib integration: the IVF operator's production centroid source is a
KMeans fit (operators/similarity.py::ivf_assign docstring) — prove the
path works on the embeddings fixture: array<float> -> Vector -> KMeans
-> centroid list -> ivf_assign partition sizes."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


def test_kmeans_centroids_feed_ivf(spark, sf_dir):
    try:
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector
    except ImportError:  # pragma: no cover
        pytest.skip("pyspark.ml not available")

    from flow_spark.operators.similarity import ivf_assign

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    feats = emb.select(
        "vec_id", array_to_vector(F.col("embedding").cast("array<double>")).alias("features")
    )
    model = KMeans(k=4, seed=42, maxIter=5).fit(feats)
    centroids = [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())]
    assert len(centroids) == 4

    assigned = ivf_assign(emb, centroids)
    sizes = {r.cluster: r.n for r in assigned.groupBy("cluster").agg(F.count("*").alias("n")).collect()}
    assert sum(sizes.values()) == emb.count()
    # a trained index should split the space: no empty inverted list
    assert len(sizes) == 4 and min(sizes.values()) > 0


def test_ivf_disk_layout_prunes_to_probed_partition(spark, tmp_path):
    """The 'inverted file' is literally the disk layout: writing the
    assigned table partitionBy(cluster) means a probe's scan touches ONLY
    its cluster's files — partition pruning does the index lookup.  This
    is the claim sim_ivf_ann's docstring makes; here it is on disk."""
    import pyspark.sql.functions as F

    from flow_spark.catalog import load_table
    from flow_spark.operators.similarity import ivf_assign

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    cents = [
        (int(r.vec_id), [float(x) for x in r.embedding])
        for r in emb.orderBy("vec_id").limit(4).collect()
    ]
    out = str(tmp_path / "ivf")
    ivf_assign(emb, cents).write.partitionBy("cluster").parquet(out)

    probe = spark.read.parquet(out).filter(F.col("cluster") == cents[1][0])
    files = probe.select(F.input_file_name().alias("f")).distinct().collect()
    assert files, "probe read no files"
    assert all(f"cluster={cents[1][0]}" in r.f for r in files)
    # and the probe plan carries the partition filter, not a full scan
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
