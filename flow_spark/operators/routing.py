"""Routing / fan-in / fan-out operators.

Reference semantics:

- router  (/root/reference/pkg/corev1alpha1/actor/router.go:67-75):
  send to the peer named by meta["sendto"]; unknown/missing peer ->
  MsgStatusUnroutable.  OR-logic: at most one destination, never copies.
- mux     (actor/mux.go:56-59): N->1 fan-in, pure merge.
- replicator (actor/replicator.go:72-95): 1->N fan-out by mode:
  * each   -> copy to all peers
  * fanout -> round-robin one peer per message (deterministic per-partition
              rotation here: pmod(event_id, n) — flow's own rotation is
              racy across goroutines, so a keyed rotation is the testable
              equivalent; SURVEY.md §4.2.4)
  * rand   -> one pseudo-random peer; made deterministic + oracle-checkable
              via the portable md5 hash of the message id
  * ncopy  -> unimplemented in the reference (panics, replicator.go:89-91);
              we reject it the same way.
  Max fan-out 64 peers (replicator.go:14).

All of these are narrow column ops (filter / union / explode) — no shuffle,
so they fuse into one codegen stage regardless of scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flow_spark.functions.hashing import portable_hash64

MAX_PEERS = 64  # actor/replicator.go:14


def route(df: DataFrame, peers: list[str], key: str = "sendto") -> DataFrame:
    """Content-based routing: adds `destination` (peer or null) and
    `route_status` ('routed' | 'unroutable')."""
    sendto = F.col("meta").getItem(key)
    dest = F.when(sendto.isin(list(peers)), sendto)
    return df.withColumn("destination", dest).withColumn(
        "route_status",
        F.when(F.col("destination").isNotNull(), F.lit("routed")).otherwise(
            F.lit("unroutable")
        ),
    )


def mux(*dfs: DataFrame) -> DataFrame:
    """N->1 fan-in; schemas must match by name (they do by construction)."""
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out


def replicate(
    df: DataFrame,
    peers: list[str],
    mode: str = "each",
    id_col: str = "event_id",
) -> DataFrame:
    """1->N fan-out; returns df with a `sink` column (one row per copy)."""
    if not 0 < len(peers) <= MAX_PEERS:
        raise ValueError(f"replicator supports 1..{MAX_PEERS} peers")
    n = len(peers)
    peers_arr = F.array(*[F.lit(p) for p in peers])
    if mode == "each":
        return df.withColumn("sink", F.explode(peers_arr))
    if mode == "fanout":
        idx = F.pmod(F.col(id_col), F.lit(n)).cast("int")
        return df.withColumn("sink", F.element_at(peers_arr, idx + 1))
    if mode == "rand":
        idx = F.pmod(portable_hash64(F.col(id_col).cast("string"), salt="rand"), F.lit(n)).cast(
            "int"
        )
        return df.withColumn("sink", F.element_at(peers_arr, idx + 1))
    if mode == "ncopy":
        # reference panics (replicator.go:89-91); reject identically
        raise NotImplementedError("replicator mode 'ncopy' is unimplemented in the reference")
    raise ValueError(f"unknown replicator mode: {mode!r}")
