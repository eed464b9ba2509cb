"""Product-quantization ANN: recall against the exact answer, determinism,
and code-domain invariants.  (sim_pq_adc is rows-only in the registry —
k-means training is not SQL-expressible — so these tests are its oracle.)
"""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F

from flow_spark.catalog import load_table
from flow_spark.operators.similarity import pq_adc_topk, pq_encode, pq_train
from flow_spark.queries.registry import get

SF = "/root/testdata/sf0.001"


def _exact_l2_topk(vecs: dict[int, np.ndarray], query_ids, k):
    ids = np.array(sorted(vecs))
    mat = np.stack([vecs[i] for i in ids])
    out = {}
    for qid in query_ids:
        d2 = ((mat - vecs[qid]) ** 2).sum(axis=1)
        order = np.lexsort((ids, d2))
        out[qid] = [int(ids[j]) for j in order if ids[j] != qid][:k]
    return out


def test_pq_recall_beats_random(spark):
    emb = load_table(spark, SF, "embeddings")
    rows = emb.collect()
    vecs = {r.vec_id: np.asarray(r.embedding, dtype=np.float64) for r in rows}
    sample = [list(vecs[i]) for i in sorted(vecs)[:256]]
    books = pq_train(sample, n_subspaces=16, n_centroids=16)
    qids = [i for i in sorted(vecs) if i % 50 == 0]
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    approx = pq_adc_topk(queries, emb, books, k=10, rerank=100).collect()
    got = {}
    for r in approx:
        got.setdefault(r.query_id, []).append(r.neighbor_id)
    exact = _exact_l2_topk(vecs, qids, 10)
    hits = sum(len(set(got[q]) & set(exact[q])) for q in qids)
    recall = hits / (10 * len(qids))
    # uniform-random 64-dim vectors are PQ's worst case (distance
    # concentration), so the shortlist re-rank carries the recall:
    # measured 0.90 on the fixture; random guessing would land ~10/n.
    assert recall >= 0.75, f"recall@10 = {recall}"


def test_pq_codes_in_domain_and_deterministic(spark):
    emb = load_table(spark, SF, "embeddings")
    sample = [
        [float(x) for x in r.embedding]
        for r in emb.orderBy("vec_id").limit(256).collect()
    ]
    books = pq_train(sample, n_subspaces=16, n_centroids=16)
    enc = pq_encode(emb, books)
    stats = enc.select(
        F.min(F.array_min("codes")).alias("lo"),
        F.max(F.array_max("codes")).alias("hi"),
        F.min(F.size("codes")).alias("m"),
    ).collect()[0]
    assert stats.lo >= 0 and stats.hi < 16 and stats.m == 16
    a = sorted((r.vec_id, tuple(r.codes)) for r in enc.collect())
    b = sorted(
        (r.vec_id, tuple(r.codes))
        for r in pq_encode(emb.repartition(7), books).collect()
    )
    assert a == b


def test_pq_query_entry_schema(spark):
    df = get("sim_pq_adc").builder(spark, SF)
    assert df.columns == ["query_id", "neighbor_id", "rank", "approx_d2"]
    n_q = df.select("query_id").distinct().count()
    per_q = df.groupBy("query_id").count().agg(F.max("count")).collect()[0][0]
    assert n_q >= 1 and per_q <= 10


def test_ivf_pq_residual_recall_and_routing(spark):
    """IVF-PQ (residual encode, nprobe=2) recall@10 vs the exact answer,
    plus the routing invariant: every reported neighbor must live in one
    of the query's 2 nearest coarse lists (numpy replay)."""
    from flow_spark.operators.similarity import coarse_residuals, ivf_pq_topk

    emb = load_table(spark, SF, "embeddings")
    rows = emb.orderBy("vec_id").collect()
    vecs = {int(r.vec_id): np.asarray(r.embedding, dtype=np.float64) for r in rows}
    sample = [list(map(float, r.embedding)) for r in rows[:256]]
    cents = sample[:8]
    # production path: TRAINED residual codebooks (the registry entry
    # anchors with n_iters=0 for oracle replay; recall is graded here)
    books = pq_train(coarse_residuals(sample, cents), 16, 16, n_iters=8)
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    got = ivf_pq_topk(
        queries, emb, cents, books, k=10, nprobe=2, rerank=40
    ).collect()

    cmat = np.asarray(cents)
    ids = np.array(sorted(vecs))
    mat = np.stack([vecs[i] for i in ids])
    assign = ((mat[:, None, :] - cmat[None, :, :]) ** 2).sum(axis=2).argmin(axis=1)
    cluster_of = dict(zip((int(i) for i in ids), (int(a) for a in assign)))

    qids = sorted({r["query_id"] for r in got})
    assert qids, "no query rows"
    exact = _exact_l2_topk(vecs, qids, 10)
    hits = total = 0
    for qid in qids:
        d2c = ((cmat - vecs[qid][None, :]) ** 2).sum(axis=1)
        probed = set(np.argsort(d2c, kind="stable")[:2].tolist())
        mine = [r for r in got if r["query_id"] == qid]
        assert len(mine) == 10
        assert [r["rank"] for r in sorted(mine, key=lambda r: r["rank"])] == list(
            range(1, 11)
        )
        for r in mine:
            assert cluster_of[r["neighbor_id"]] in probed, (qid, r["neighbor_id"])
        # on near-random synthetic embeddings the coarse quantizer is a
        # ~nprobe/n_lists ceiling on absolute recall, so measure PQ
        # quality against the REACHABLE exact answer: exact L2 top-10
        # restricted to candidates inside the probed lists
        reach_ids = [
            int(i) for i in ids if cluster_of[int(i)] in probed and int(i) != qid
        ]
        d2r = {i: ((vecs[i] - vecs[qid]) ** 2).sum() for i in reach_ids}
        reachable_top = set(sorted(reach_ids, key=lambda i: (d2r[i], i))[:10])
        hits += len({r["neighbor_id"] for r in mine} & reachable_top)
        total += 10
    # near-isotropic synthetic embeddings are PQ's worst case (pairwise
    # distances nearly equal -> ADC ordering carries little signal), so
    # the floor is the rerank-stage coverage: shortlist/reachable = 40/50
    # = 0.8 expected even under a RANDOM shortlist order; require close
    # to that floor (real clustered embeddings sit far above it)
    assert hits / total >= 0.7, f"reachable recall@10 too low: {hits}/{total}"
