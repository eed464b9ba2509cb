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
