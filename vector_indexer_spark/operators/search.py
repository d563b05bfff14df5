"""Batch ANN search over a persisted IVF index (K9 = J3→J4→F1→W2).

Reference query pipeline (src/ivf_index.rs:179-267): rank all
centroids by distance to the query, take ``n_probe`` (W1), read only
those clusters' bytes from their shards (S8), score every candidate
(F1), return the top ``k`` ascending (W2).

Spark-first re-expression, one job for a whole *batch* of queries:

1. **Probe ranking** (J3/W1): the centroid matrix is driver-resident
   (≤ 4√n·d floats — 12 MB at n=1M,d=768) and broadcast; each Arrow
   batch of queries gets a vectorized top-``n_probe`` (NumPy argpartition).
2. **Pruned scan** (J4/P6/S8): probed cluster ids are always
   collectible (bounded by nlist), so the vector scan gets literal
   ``shard_id IN (...) AND cluster_id IN (...)`` predicates —
   partition pruning reads only the probed Hive directories, the
   exact analog of the reference's per-cluster byte-range reads.
   cluster ids are globally unique, so the cluster predicate alone is
   exact; the shard predicate prunes directories earlier.
3. **Scoring + top-k** (F1/W2): per-Arrow-batch NumPy scoring of each
   candidate cluster against only the queries that probed it, with a
   *local* top-k emitted map-side, then one global window rank over
   ``≤ partitions × nq × k`` rows. The full candidate × query
   cross-product never hits a shuffle.

``method="native"`` runs the same logical plan as pure DataFrame ops
(broadcast joins + fold expression + window) — bit-reproducible and
SQL-oracle-checkable; the arrow path is the throughput path.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from vector_indexer_spark.config import MAX_K, MAX_N_PROBE
from vector_indexer_spark.functions.distance import dist2_expr
from vector_indexer_spark.functions.kernels import (
    pairwise_dist2,
    stack_arrays,
    topk_per_row,
)
from vector_indexer_spark.operators.index_build import IvfIndex


def rank_probes(
    queries: DataFrame,
    centroids: np.ndarray,
    centroid_shards: np.ndarray,
    n_probe: int,
    *,
    query_id_col: str = "query_id",
    query_col: str = "query",
) -> DataFrame:
    """J3/W1 — per-query top-``n_probe`` centroids.

    Returns ``(query_id, probe_rank, cluster_id, shard_id, centroid_dist2)``
    with probe_rank 1-based ascending and (dist, id) tie-break.
    """
    spark = queries.sparkSession
    bc = spark.sparkContext.broadcast(
        (np.asarray(centroids, dtype=np.float64), np.asarray(centroid_shards))
    )

    def _rank(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cents, shards = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            q = stack_arrays(pdf[query_col])
            d2 = pairwise_dist2(q, cents)
            dists, ids = topk_per_row(d2, n_probe)
            nq, p = ids.shape
            yield pd.DataFrame(
                {
                    "query_id": np.repeat(pdf[query_id_col].to_numpy(), p),
                    "probe_rank": np.tile(np.arange(1, p + 1), nq),
                    "cluster_id": ids.reshape(-1),
                    "shard_id": shards[ids.reshape(-1)],
                    "centroid_dist2": dists.reshape(-1),
                }
            )

    return queries.select(query_id_col, query_col).mapInPandas(
        _rank,
        "query_id long, probe_rank int, cluster_id long, shard_id long,"
        " centroid_dist2 double",
    )


def search_index(
    spark: SparkSession,
    index: IvfIndex,
    queries: DataFrame,
    k: int = 10,
    n_probe: int = 20,
    *,
    query_id_col: str = "query_id",
    query_col: str = "query",
    include_vectors: bool = False,
    method: str = "arrow",
) -> DataFrame:
    """K9 — batched ANN search. Returns
    ``(query_id, rank, neighbor_id, dist2[, values])`` ascending per
    query; may return < k rows per query when the probed clusters hold
    fewer than k vectors (reference behavior, SURVEY §7 trap 5).
    """
    # P3/P4 — positivity + clamping (reference api.rs:189-190,
    # ivf_index.rs:197-202)
    if k <= 0 or n_probe <= 0:
        raise ValueError("k and n_probe must be positive")
    k = min(k, MAX_K)
    n_probe = min(n_probe, MAX_N_PROBE)

    # P2 — query dimension validation
    bad = queries.filter(F.size(query_col) != index.dimension).count()
    if bad:
        raise ValueError(
            f"{bad} queries have dimension != {index.dimension}"
        )

    probes = rank_probes(
        queries,
        index.centroids,
        index.centroid_shards,
        n_probe,
        query_id_col=query_id_col,
        query_col=query_col,
    )

    # collect the probed partition keys — bounded by nlist, always small
    probe_keys = probes.select("shard_id", "cluster_id").distinct().collect()
    shard_ids = sorted({r.shard_id for r in probe_keys})
    cluster_ids = sorted({r.cluster_id for r in probe_keys})

    # S8/P6 — pruned scan: literal partition predicates → Hive pruning
    vectors = index.vectors(spark).where(
        F.col("shard_id").isin(shard_ids) & F.col("cluster_id").isin(cluster_ids)
    )

    if method == "native":
        out = _score_native(
            vectors, probes, queries, index, k, query_id_col, query_col
        )
    elif method == "arrow":
        out = _score_arrow(
            vectors, probes, queries, index, k, query_id_col, query_col
        )
    else:
        raise ValueError(f"unknown method {method!r}")

    if include_vectors:  # P7
        payload = index.vectors(spark).select(
            F.col("id").alias("neighbor_id"), "values"
        )
        out = out.join(payload, "neighbor_id", "left").select(
            "query_id", "rank", "neighbor_id", "dist2", "values"
        )
    return out


def _score_native(vectors, probes, queries, index, k, query_id_col, query_col):
    """Pure-DataFrame scoring: probes ⋈ queries (both small, broadcast)
    ⋈ pruned vectors on cluster_id, fold-expression dist2, window top-k."""
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(query_col).alias("__q")
    )
    probe_q = probes.select("query_id", "cluster_id").join(q, "query_id")
    cand = vectors.join(
        F.broadcast(probe_q), "cluster_id"
    )  # each candidate row × each query probing its cluster
    scored = cand.select(
        "query_id",
        F.col("id").alias("neighbor_id"),
        dist2_expr("__q", "values").alias("dist2"),
    )
    w = Window.partitionBy("query_id").orderBy("dist2", "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "dist2")
    )


def _score_arrow(vectors, probes, queries, index, k, query_id_col, query_col):
    """Arrow scoring: broadcast (query matrix, cluster→probing-queries
    map); per-batch NumPy scoring + local top-k; global window rank."""
    spark = vectors.sparkSession
    qrows = queries.select(query_id_col, query_col).collect()
    qids = np.array([r[0] for r in qrows], dtype=np.int64)
    qmat = stack_arrays([r[1] for r in qrows])
    qpos = {int(qid): i for i, qid in enumerate(qids)}

    probe_rows = probes.select("query_id", "cluster_id").collect()
    cluster_to_q: dict[int, list[int]] = {}
    for r in probe_rows:
        cluster_to_q.setdefault(int(r.cluster_id), []).append(qpos[int(r.query_id)])
    bc = spark.sparkContext.broadcast(
        (qids, qmat, {c: np.array(v) for c, v in cluster_to_q.items()})
    )

    def _score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        qids_, qmat_, c2q = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            for cid, grp in pdf.groupby("cluster_id"):
                qidx = c2q.get(int(cid))
                if qidx is None or len(qidx) == 0:
                    continue
                vmat = stack_arrays(grp["values"])
                vids = grp["id"].to_numpy()
                d2 = pairwise_dist2(qmat_[qidx], vmat)
                dists, ids = topk_per_row(d2, k, ids=vids)
                nq, kk = dists.shape
                yield pd.DataFrame(
                    {
                        "query_id": np.repeat(qids_[qidx], kk),
                        "neighbor_id": ids.reshape(-1),
                        "dist2": dists.reshape(-1),
                    }
                )

    local = vectors.select("id", "values", "cluster_id").mapInPandas(
        _score, "query_id long, neighbor_id long, dist2 double"
    )
    w = Window.partitionBy("query_id").orderBy("dist2", "neighbor_id")
    return (
        local.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "dist2")
    )


def calculate_recall(
    results: DataFrame, ground_truth: DataFrame, k: int
) -> float:
    """A7 — |found ∩ true| / |true| averaged over queries
    (reference tests/test_utils/mod.rs:212-221).

    Both inputs are ``(query_id, rank, neighbor_id, ...)`` frames;
    rows with rank > k are ignored.
    """
    r = results.filter(F.col("rank") <= k).select("query_id", "neighbor_id")
    g = ground_truth.filter(F.col("rank") <= k).select("query_id", "neighbor_id")
    hits = r.join(g, ["query_id", "neighbor_id"], "inner").count()
    total = g.count()
    return hits / total if total else 0.0
