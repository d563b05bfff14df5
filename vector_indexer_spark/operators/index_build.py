"""IVF index build, persist, and load (K8 + S5–S7 + P5).

The reference's build pipeline (src/ivf_index.rs:57-177) trains
k-means, groups vectors into IVF lists, groups lists into
``ceil(sqrt(nlist))`` shards via a super-centroid k-means over the
centroids (seed·31+7), drops empty lists, renumbers centroid ids
densely, and writes a custom binary format (src/shards.rs:68-177).

Spark-first re-expression — *tables, not files*:

- the shard/cluster two-level binary layout becomes Hive partitioning:
  ``vectors/shard_id=S/cluster_id=C/*.parquet`` (S7). The reference's
  per-cluster byte-range index (CentroidIndex) is exactly what Parquet
  partition pruning gives us for free at search time.
- the index root (centroids + centroid→shard map + dimension,
  src/ivf_index.rs:269-316) becomes a small ``centroids`` Parquet
  table + a JSON metadata sidecar (S5/S6).
- empty-list filtering + dense renumbering (P5, src/ivf_index.rs:122-146)
  is a count join + driver-side relabel of the (tiny) centroid set.

At 100 TB: the only full-data passes are the k-means iterations
(O(partitions·k·d) shuffle each, see operators.kmeans) and the final
assigned write, which shuffles once on (shard_id, cluster_id) so each
partition directory is written by one task.
"""

from __future__ import annotations

import json
import os
import shutil
from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_indexer_spark.ioutil import atomic_write_json
from vector_indexer_spark.config import (
    SUPER_KMEANS_ITERS,
    calculate_max_iterations,
    num_shards,
    suggest_nlist,
    super_centroid_seed,
)
from vector_indexer_spark.operators.kmeans import (
    assign_clusters,
    assign_nearest,
    kmeans_fit,
    kmeans_numpy,
)

FORMAT_VERSION = 1


@dataclass
class IvfIndex:
    """Handle to a persisted index: metadata + lazy table accessors."""

    path: str
    dimension: int
    nlist: int
    n_shards: int
    seed: int
    n_vectors: int
    # (nlist, d) float64, dense ids 0..nlist-1; None for a lazy handle
    # (load_index(lazy_centroids=True)) — search then ranks probes
    # relationally against the centroid table instead
    centroids: np.ndarray | None
    centroid_shards: np.ndarray | None  # (nlist,) int64 centroid→shard map
    id_col: str = "id"  # column names in the persisted vector table
    vec_col: str = "values"

    @property
    def vectors_path(self) -> str:
        return os.path.join(self.path, "vectors")

    @property
    def centroids_path(self) -> str:
        return os.path.join(self.path, "centroids")

    @property
    def meta_path(self) -> str:
        return os.path.join(self.path, "meta.json")

    def vectors(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.vectors_path)

    def centroids_df(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.centroids_path)

    def probe_hierarchy(self) -> tuple[np.ndarray, np.ndarray]:
        """(meta_centroids, meta_labels) over the centroid matrix, for
        hierarchical probe ranking at large nlist (K7 reused for
        search). Built lazily from the persisted centroids with the
        index's own seed — deterministic per index — and cached on the
        handle so repeated search batches pay it once."""
        if self.centroids is None:
            raise ValueError(
                "probe_hierarchy needs the centroid matrix; this handle "
                "was loaded with lazy_centroids=True (relational probe "
                "ranking does not use a hierarchy)"
            )
        if not hasattr(self, "_probe_hierarchy"):
            from vector_indexer_spark.operators.kmeans import (  # noqa: PLC0415
                build_centroid_hierarchy,
            )

            self._probe_hierarchy = build_centroid_hierarchy(
                self.centroids, self.seed
            )
        return self._probe_hierarchy


def dense_relabel_and_shards(
    counts: dict, raw_centroids: np.ndarray, seed: int
):
    """P5 + super-centroid sharding, shared by the flat and PQ builders:
    drop empty clusters, renumber densely, then k-means the surviving
    centroids into ``num_shards`` super-clusters (derived seed,
    reference src/ivf_index.rs:103-109, 122-146).

    Returns ``(relabel, centroids, eff_nlist, n_shards, shard_of)``
    where ``relabel`` maps raw→dense cluster ids and ``shard_of[i]`` is
    the shard of dense cluster ``i``.
    """
    live = sorted(c for c in counts if counts[c] > 0)
    relabel = {old: new for new, old in enumerate(live)}
    centroids = raw_centroids[live]
    eff_nlist = len(live)
    n_sh = num_shards(eff_nlist)
    if n_sh >= eff_nlist:
        shard_of = np.arange(eff_nlist, dtype=np.int64)
        n_sh = eff_nlist
    else:
        supers = kmeans_numpy(
            centroids,
            n_sh,
            max_iters=SUPER_KMEANS_ITERS,
            seed=super_centroid_seed(seed),
        )
        shard_of = assign_nearest(centroids, supers)
    return relabel, centroids, eff_nlist, int(n_sh), shard_of


def build_index(
    df: DataFrame,
    path: str,
    *,
    id_col: str = "id",
    vec_col: str = "values",
    dimension: int | None = None,
    nlist: int | None = None,
    seed: int = 42,
    mode: str = "full",
    max_iters: int | None = None,
) -> IvfIndex:
    """K8 — train, shard, and persist an IVF index from a vector table.

    ``df`` must carry a unique ``id_col`` and an ``ARRAY<FLOAT>``
    ``vec_col``; all other columns are carried through to the persisted
    vector table as payload (the reference carries external_id + ts,
    src/shards.rs:139-144).
    """
    spark = df.sparkSession
    n = df.count()
    if n == 0:
        # reference: empty build is an error (tests/api_tests.rs:265-271)
        raise ValueError("cannot build an index from an empty DataFrame")

    dimension = dimension or len(df.select(vec_col).first()[0])
    # P1 — dimension validation, fail fast before any training
    bad = df.filter(F.size(vec_col) != dimension).count()
    if bad:
        raise ValueError(
            f"{bad} records have dimension != {dimension} (dim validation, P1)"
        )

    nlist = nlist or suggest_nlist(n)
    max_iters = max_iters or calculate_max_iterations(n)

    # 1. train (K1/K2) and assign (J1; J2 shortlist above k=100 — the
    # build seed drives the hierarchy so training and final assignment
    # agree). The assigned frame is consumed twice (counts collect +
    # partitioned write) — cache it so the full-table assignment pass
    # runs once.
    model = kmeans_fit(
        df, nlist, vec_col=vec_col, max_iters=max_iters, seed=seed, mode=mode
    )
    assigned = assign_clusters(
        df, model.centroids, vec_col=vec_col, out_col="__raw_cluster", seed=seed
    ).cache()

    # 2.+3. P5 dense renumber + super-centroid sharding (driver-side:
    # the cluster set is ≈4√n rows)
    counts = {
        r["__raw_cluster"]: r["cnt"]
        for r in assigned.groupBy("__raw_cluster").agg(F.count("*").alias("cnt")).collect()
    }
    relabel, centroids, eff_nlist, n_sh, shard_of = dense_relabel_and_shards(
        counts, model.centroids, seed
    )

    # 4. S7 — one shuffle on the shard key, then partitioned write with
    # rows sorted by cluster_id inside each shard file. This mirrors
    # the reference layout exactly (one shard file containing cluster
    # blocks + a per-cluster byte-range index, src/shards.rs:68-177):
    # Hive pruning skips whole shards, and the cluster_id sort gives
    # parquet row-group min/max stats that skip non-probed clusters
    # inside a shard. A cluster_id-level directory layout would create
    # nlist≈4√n tiny dirs — file-listing overhead dominates long before
    # 100 TB.
    mapping = spark.createDataFrame(
        [(int(old), int(new), int(shard_of[new])) for old, new in relabel.items()],
        "__raw_cluster long, cluster_id long, shard_id long",
    )
    out = (
        assigned.join(F.broadcast(mapping), "__raw_cluster")
        .drop("__raw_cluster")
        .repartition("shard_id")
        .sortWithinPartitions("shard_id", "cluster_id")
    )
    out.write.mode("overwrite").partitionBy("shard_id").parquet(
        os.path.join(path, "vectors")
    )
    assigned.unpersist()

    # 5. S5 — centroid table + JSON meta sidecar
    cent_rows = [
        (int(i), [float(x) for x in centroids[i]], int(shard_of[i]))
        for i in range(eff_nlist)
    ]
    spark.createDataFrame(
        cent_rows, "centroid_id long, vector array<float>, shard_id long"
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(path, "centroids"))

    meta = {
        "version": FORMAT_VERSION,
        "dimension": dimension,
        "nlist": eff_nlist,
        "n_shards": int(n_sh),
        "seed": seed,
        "n_vectors": n,
        "id_col": id_col,
        "vec_col": vec_col,
    }
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f, indent=2)

    return IvfIndex(
        path=path,
        dimension=dimension,
        nlist=eff_nlist,
        n_shards=int(n_sh),
        seed=seed,
        n_vectors=n,
        centroids=centroids,
        centroid_shards=shard_of,
        id_col=id_col,
        vec_col=vec_col,
    )


def load_index(
    spark: SparkSession, path: str, *, lazy_centroids: bool = False
) -> IvfIndex:
    """S6/S11 — reopen a persisted index from its directory.

    ``lazy_centroids=True`` skips collecting the centroid matrix to
    the driver entirely (``index.centroids is None``): the handle can
    still search — ``search_index`` routes such handles through the
    fully-relational probe ranking (search.rank_probes_relational),
    which scans the centroid *table* instead. This is the open-a-
    100TB-index-from-a-laptop-driver mode: at nlist≈1.3M, d=768 the
    matrix is ~8 GB and has no business on the driver. Operators that
    genuinely need the matrix (streaming ingest assignment, PQ/SQ
    search, arrow kNN-style scoring) require an eager load.
    """
    meta_path = os.path.join(path, "meta.json")
    if not os.path.exists(meta_path):
        raise FileNotFoundError(
            f"no index at {path!r} (missing meta.json)"
        )  # api_tests.rs:252-262
    with open(meta_path) as f:
        meta = json.load(f)
    if meta.get("version") != FORMAT_VERSION:
        raise ValueError(f"unsupported index version {meta.get('version')!r}")
    if lazy_centroids:
        centroids = shards = None
    else:
        cent = (
            spark.read.parquet(os.path.join(path, "centroids"))
            .orderBy("centroid_id")
            .collect()
        )
        centroids = np.array([r["vector"] for r in cent], dtype=np.float64)
        shards = np.array([r["shard_id"] for r in cent], dtype=np.int64)
    return IvfIndex(
        path=path,
        dimension=meta["dimension"],
        nlist=meta["nlist"],
        n_shards=meta["n_shards"],
        seed=meta["seed"],
        n_vectors=meta["n_vectors"],
        centroids=centroids,
        centroid_shards=shards,
        id_col=meta.get("id_col", "id"),
        vec_col=meta.get("vec_col", "values"),
    )


def cluster_stats(assigned: DataFrame, *, cluster_col: str = "cluster_id") -> DataFrame:
    """Index observability: one-row summary of the cluster-size
    distribution (count / total / min / max / mean / imbalance factor).

    ``imbalance = max_size / avg_size`` is the standard IVF list-balance
    metric (1.0 = perfectly balanced; the probe-time worst case scales
    with it, because a probe that hits the fattest list does
    ``imbalance×`` the average work). Two map-side-combined
    aggregations over the assignment table — no wide shuffle beyond
    the per-cluster counts, so it is as scalable as the build itself.
    """
    sizes = assigned.groupBy(cluster_col).agg(F.count("*").alias("n"))
    avg_size = F.sum("n").cast("double") / F.count("*").cast("long")
    return sizes.agg(
        F.count("*").cast("long").alias("n_clusters"),
        F.sum("n").cast("long").alias("n_vectors"),
        F.min("n").cast("long").alias("min_size"),
        F.max("n").cast("long").alias("max_size"),
        avg_size.alias("avg_size"),
        (F.max("n").cast("double") / avg_size).alias("imbalance"),
    )


def _parquet_file_count(root: str) -> int:
    n = 0
    for _, _, files in os.walk(root):
        n += sum(1 for f in files if f.endswith(".parquet"))
    return n


def _staged_rewrite(
    spark: SparkSession, src: str, df: DataFrame, op: str, validate
) -> tuple[int, int]:
    """Shared table-rewrite protocol for maintenance ops: write the
    rewritten table to a staging dir in the as-built layout, run
    ``validate(n_before, n_after)`` (raise to abort with the live
    table untouched — Spark cannot safely overwrite a path it reads),
    then swap atomically. Returns ``(n_before, n_after)``.
    """
    staging, backup = f"{src}__{op}__staging", f"{src}__{op}__backup"
    if os.path.exists(staging):
        shutil.rmtree(staging)
    if os.path.exists(backup):
        if not os.path.exists(src):
            # a previous run crashed between the two renames: the live
            # table is stranded in the backup dir — restore it
            os.rename(backup, src)
        else:
            # stale backup from an interrupted earlier run; the live
            # table exists, so the backup is dead weight blocking the
            # os.rename(src, backup) below (non-empty dir target)
            shutil.rmtree(backup)
    n_before = spark.read.parquet(src).count()
    (
        df.repartition("shard_id")
        .sortWithinPartitions("shard_id", "cluster_id")
        .write.mode("overwrite")
        .partitionBy("shard_id")
        .parquet(staging)
    )
    n_after = spark.read.parquet(staging).count()
    try:
        validate(n_before, n_after)
    except Exception:
        shutil.rmtree(staging)
        raise
    os.rename(src, backup)
    os.rename(staging, src)
    shutil.rmtree(backup)
    return n_before, n_after


def compact_index(spark: SparkSession, index: IvfIndex) -> dict:
    """Compact the index's vector table: rewrite each shard partition
    as few large cluster-sorted files instead of the many small ones
    incremental ingest accumulates (one file per shard per
    micro-batch).

    Why this is a first-class maintenance op at scale: the small-files
    problem degrades everything downstream — scan task count grows
    with file count (scheduler pressure), per-file open/footer costs
    dominate tiny reads, and cluster-id row-group pruning weakens
    because each appended file carries its own near-full cluster range
    of row groups. Compaction restores the as-built layout: one
    shuffle on ``shard_id``, rows re-sorted by ``(shard, cluster)`` so
    parquet row-group stats prune again, written partition-parallel.

    Safety: the rewrite lands in a staging directory and is swapped in
    only after a row-count parity check — the live table is never
    overwritten in place (Spark cannot safely overwrite a path it is
    reading). Returns ``{rows, files_before, files_after}``.
    """
    return compact_table(spark, index.vectors_path)


def compact_table(spark: SparkSession, src: str) -> dict:
    """Compact ANY shard-partitioned cluster-sorted table at ``src`` —
    the flat index's ``vectors`` dir (via :func:`compact_index`) or a
    compressed tier's ``codes`` dir (IVF-PQ / IVF-SQ appends from
    their ``add_vectors_*`` accumulate small files the same way).
    Same staged-swap + row-count-parity protocol."""
    files_before = _parquet_file_count(src)

    def _same_rows(n_before, n_after):
        if n_after != n_before:
            raise RuntimeError(
                f"compaction row-count mismatch: {n_before} -> {n_after};"
                " staging discarded, live table untouched"
            )

    n_before, _ = _staged_rewrite(
        spark, src, spark.read.parquet(src), "compact", _same_rows
    )
    return {
        "rows": n_before,
        "files_before": files_before,
        "files_after": _parquet_file_count(src),
    }


def delete_vectors(
    spark: SparkSession, index: IvfIndex, ids: DataFrame | list
) -> dict:
    """Delete vectors by id: anti-join rewrite of the vector table
    through the same staged-swap protocol as :func:`compact_index`
    (parquet is immutable — deletion is a rewrite; at warehouse scale
    a format with deletion vectors (Delta/Iceberg) makes this a
    metadata op, and this function is the compaction-style fallback).

    ``ids`` is a one-column DataFrame or a small list. The delete set
    broadcasts (anti-joins are build-side-small by construction here);
    untouched rows keep their shard/cluster assignment, so pruning
    layout survives. Returns ``{rows_before, rows_after, n_deleted}``.
    """
    if not isinstance(ids, DataFrame):
        ids = spark.createDataFrame(
            [(int(i),) for i in ids], f"{index.id_col} long"
        )
    ids = ids.select(F.col(ids.columns[0]).alias(index.id_col))
    src = index.vectors_path
    kept = spark.read.parquet(src).join(
        F.broadcast(ids), index.id_col, "left_anti"
    )

    def _not_grown(n_before, n_after):
        if n_after > n_before:
            raise RuntimeError("delete rewrite grew the table; aborted")

    n_before, n_after = _staged_rewrite(
        spark, src, kept, "delete", _not_grown
    )
    return {
        "rows_before": n_before,
        "rows_after": n_after,
        "n_deleted": n_before - n_after,
    }


def validate_add_batch(
    df: DataFrame,
    *,
    id_col: str,
    vec_col: str,
    dimension: int,
    existing_ids: DataFrame | None,
) -> int:
    """Shared add-batch contract for every index tier (flat / IVF-PQ /
    IVF-SQ): non-empty, P1 dimension check, unique ids within the
    batch, and (when ``existing_ids`` is given) no collision with ids
    already in the index — that last check is a column-pruned scan of
    the live table; at warehouse scale pass ``None`` and enforce
    uniqueness upstream. Returns the batch row count."""
    n_new = df.count()
    if n_new == 0:
        raise ValueError("cannot add an empty DataFrame")
    bad = df.filter(F.size(vec_col) != dimension).count()
    if bad:
        raise ValueError(
            f"{bad} records have dimension != {dimension}"
            " (dim validation, P1)"
        )
    if df.select(id_col).distinct().count() != n_new:
        raise ValueError("duplicate ids within the batch")
    if existing_ids is not None:
        keyed = df.select(F.col(id_col).alias("__add_id"))
        n_dup = keyed.join(
            existing_ids.select(F.col(existing_ids.columns[0]).alias("__add_id")),
            "__add_id",
            "semi",
        ).count()
        if n_dup:
            raise ValueError(f"{n_dup} ids already present in the index")
    return n_new


def add_vectors(
    spark: SparkSession,
    index: IvfIndex,
    df: DataFrame,
    *,
    check_duplicate_ids: bool = True,
) -> dict:
    """Incremental ingest into a built index (Faiss ``IndexIVF.add``
    semantics — the reference is build-once, src/ivf_index.rs; this is
    the maintenance op a long-lived 100 TB index needs): assign the new
    batch to the EXISTING centroids (no retraining — recall drifts only
    as the data distribution does; rebuild via :func:`build_index` when
    it matters), route each row to its cluster's shard, and append
    shard-partitioned, cluster-sorted files to the live vector table.

    Assignment reuses :func:`assign_clusters` (J1 exact / J2
    hierarchical above the same threshold as build, same seed), so an
    added row lands in exactly the cluster a from-scratch build with
    these centroids would put it in — search pruning stays correct by
    construction, which ``ivf_add_search_fixed`` proves against a
    whole-table SQL oracle.

    At scale: the append is one shuffle of the NEW batch only
    (repartition on shard_id); the live table is never read or
    rewritten. Each micro-batch appends ~n_shards small files —
    :func:`compact_index` is the companion op that restores the
    as-built file layout. ``check_duplicate_ids`` adds an id-column
    anti-join against the existing table (column-pruned scan); at
    warehouse scale turn it off and enforce uniqueness upstream.

    Returns ``{n_added, n_vectors, files_after}``.
    """
    if index.centroids is None:
        raise ValueError(
            "add_vectors needs the centroid matrix; reload the index "
            "without lazy_centroids"
        )
    id_col, vec_col = index.id_col, index.vec_col
    # schema alignment first: the batch must carry exactly the
    # persisted payload columns (parquet append with a divergent
    # schema would silently fork the table schema)
    live_cols = [
        f.name
        for f in spark.read.parquet(index.vectors_path).schema.fields
        if f.name not in ("cluster_id", "shard_id")
    ]
    missing = set(live_cols) - set(df.columns)
    if missing:
        raise ValueError(f"batch is missing index columns: {sorted(missing)}")
    n_new = validate_add_batch(
        df,
        id_col=id_col,
        vec_col=vec_col,
        dimension=index.dimension,
        existing_ids=(
            spark.read.parquet(index.vectors_path).select(id_col)
            if check_duplicate_ids
            else None
        ),
    )

    from vector_indexer_spark.streaming.ingest import (  # noqa: PLC0415
        assign_and_shard,  # circular: ingest imports IvfIndex from here
    )

    (
        assign_and_shard(df.select(*live_cols), index)
        .repartition("shard_id")
        .sortWithinPartitions("shard_id", "cluster_id")
        .write.mode("append")
        .partitionBy("shard_id")
        .parquet(index.vectors_path)
    )

    with open(index.meta_path) as f:
        meta = json.load(f)
    meta["n_vectors"] = int(meta["n_vectors"]) + n_new
    atomic_write_json(index.meta_path, meta)
    index.n_vectors = meta["n_vectors"]
    return {
        "n_added": n_new,
        "n_vectors": index.n_vectors,
        "files_after": _parquet_file_count(index.vectors_path),
    }


def refresh_meta_count(spark: SparkSession, index: IvfIndex) -> dict:
    """Re-derive ``n_vectors`` from the live table and rewrite the meta
    sidecar. The streaming ingest sink (streaming/ingest.py) appends
    rows without touching meta — by design: a JSON rewrite per
    micro-batch from executor-adjacent code would race — so a
    long-running stream drifts the recorded count. Run this after the
    stream drains (or on any suspicion of drift: ``add_vectors``
    interrupted between write and meta update). Returns
    ``{n_vectors, drift}`` where drift = actual − previously recorded.
    """
    actual = spark.read.parquet(index.vectors_path).count()
    with open(index.meta_path) as f:
        meta = json.load(f)
    drift = actual - int(meta["n_vectors"])
    meta["n_vectors"] = actual
    atomic_write_json(index.meta_path, meta)
    index.n_vectors = actual
    return {"n_vectors": actual, "drift": drift}


def merge_indexes(
    spark: SparkSession, dst: IvfIndex, src: IvfIndex
) -> dict:
    """Absorb every vector of ``src`` into ``dst`` (Faiss
    ``merge_from``): reads ``src``'s payload rows (its cluster/shard
    labels are dropped — they are meaningless under ``dst``'s
    centroids) and routes them through :func:`add_vectors`, so all the
    batch guards (dup ids, dimension, schema) apply. ``src`` is left
    untouched; delete its directory when done with it. The id spaces
    must be disjoint — overlaps fail the duplicate-id check before
    anything is written. Returns the add stats."""
    if src.dimension != dst.dimension:
        raise ValueError(
            f"dimension mismatch: src {src.dimension} != dst {dst.dimension}"
        )
    rows = src.vectors(spark).drop("cluster_id", "shard_id")
    return add_vectors(spark, dst, rows)
