"""Product quantization (PQ) — compressed vectors + ADC search.

A beyond-the-reference scale extension (the reference is IVF-*flat*:
raw f32 vectors in every posting list, src/shards.rs:130-148). At
100 TB of embeddings the raw vectors themselves are the bottleneck —
PQ (Jégou, Douze, Schmid, "Product Quantization for Nearest Neighbor
Search", TPAMI 2011; the public Faiss ``IndexIVFPQ`` family the
reference's own bench harness evaluates, bench/faiss_bench_official/
bench_all_ivf.py:171-214 ``parse_index``/"IVF…,PQ…" keys) compresses
each d-dim float32 vector to ``m`` one-byte codes: the vector is split
into ``m`` subspaces of ``d/m`` dims, each subspace quantized against
its own ``ksub``-codeword codebook. d=128 float32 (512 B) → m=16 codes
(16 B): a 32× smaller scan, small enough to cache the whole corpus.

Search is **asymmetric distance computation (ADC)**: the query stays
uncompressed; per query a (m × ksub) lookup table of subspace distances
is built once, and each candidate's distance is ``Σ_j LUT[j, code_j]``
— m table lookups instead of d multiply-adds, over a 32× smaller table.

Spark shape (all DataFrame-native):

- **train** — driver-side per-subspace k-means on a seeded sample
  (same pattern as the IVF coarse quantizer: the codebooks are tiny,
  m·ksub·dsub doubles, and sampling ≤100k rows is how Faiss trains PQ
  too). Distributed encode/search; only training samples.
- **encode** — ``mapInPandas`` argmin per subspace against broadcast
  codebooks → ``(id, codes ARRAY<INT>)``. One scan, no shuffle.
- **search** — broadcast per-query LUTs; per-partition ADC top-k
  (map-side combine, the ``knn_exact`` arrow pattern) → global
  window rank over ``partitions × nq × k`` rows. The 100 TB scan
  reads ONLY the codes column (Parquet column pruning) — the raw
  vector table is never touched at query time.

Exact-vs-approx contract: ADC distance equals the squared L2 distance
between the query and the *reconstruction* (concatenated codewords) of
the candidate — ``Σ_j ||q_j − cb_j[code_j]||² = ||q − recon(x)||²``.
The correctness oracle exploits this: the fixed-codebook oracle query
reconstructs in SQL and reuses the bit-reproducible ``dist2`` fold.
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from vector_indexer_spark.ioutil import atomic_write_json
from vector_indexer_spark.functions.kernels import stack_arrays, topk_per_row
from vector_indexer_spark.operators.kmeans import (
    KMEANS_INIT_SAMPLE_CAP,
    _collect_sample,
    kmeans_numpy,
)

PQ_FORMAT_VERSION = 1


@dataclass
class PQModel:
    """Trained product quantizer: ``m`` codebooks of ``ksub`` codewords."""

    codebooks: np.ndarray  # (m, ksub, dsub) float64

    @property
    def m(self) -> int:
        return self.codebooks.shape[0]

    @property
    def ksub(self) -> int:
        return self.codebooks.shape[1]

    @property
    def dsub(self) -> int:
        return self.codebooks.shape[2]

    @property
    def dimension(self) -> int:
        return self.m * self.dsub

    # -- persistence: a tall codeword table + JSON sidecar, the same
    # layout discipline as the IVF index (centroid parquet + meta.json)
    def save(self, spark: SparkSession, path: str) -> None:
        rows = [
            (j, c, [float(x) for x in self.codebooks[j, c]])
            for j in range(self.m)
            for c in range(self.ksub)
        ]
        df = spark.createDataFrame(
            rows, "subspace INT, code INT, codeword ARRAY<DOUBLE>"
        )
        df.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(path, "codebooks")
        )
        meta = {
            "version": PQ_FORMAT_VERSION,
            "m": self.m,
            "ksub": self.ksub,
            "dsub": self.dsub,
        }
        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, "pq_meta.json"), "w") as f:
            json.dump(meta, f)

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "PQModel":
        meta_path = os.path.join(path, "pq_meta.json")
        if not os.path.exists(meta_path):
            raise FileNotFoundError(f"no PQ model at {path}")
        with open(meta_path) as f:
            meta = json.load(f)
        if meta.get("version") != PQ_FORMAT_VERSION:
            raise ValueError(
                f"unsupported PQ model version {meta.get('version')!r}"
            )
        rows = (
            spark.read.parquet(os.path.join(path, "codebooks"))
            .orderBy("subspace", "code")
            .collect()
        )
        cb = np.zeros((meta["m"], meta["ksub"], meta["dsub"]), dtype=np.float64)
        for r in rows:
            cb[r.subspace, r.code] = np.asarray(r.codeword, dtype=np.float64)
        return cls(codebooks=cb)


def pq_train(
    df: DataFrame,
    *,
    vec_col: str = "values",
    m: int = 8,
    ksub: int = 256,
    seed: int = 42,
    sample_cap: int = KMEANS_INIT_SAMPLE_CAP,
    max_iters: int = 25,
) -> PQModel:
    """Train per-subspace codebooks on a seeded driver sample.

    The sample bound is the same contract as IVF coarse training
    (kmeans._collect_sample): PQ codebooks are statistics of the value
    distribution, not of every row — Faiss defaults to ≤ 256·ksub
    training points per subspace for the same reason.
    """
    if m <= 0 or ksub <= 0:
        raise ValueError("m and ksub must be positive")
    if ksub > 2**16:
        raise ValueError("ksub above 65536 is not supported")
    sample = _collect_sample(df, vec_col, sample_cap, seed)
    d = sample.shape[1]
    if d % m != 0:
        raise ValueError(f"dimension {d} not divisible by m={m}")
    dsub = d // m
    cb = np.zeros((m, ksub, dsub), dtype=np.float64)
    for j in range(m):
        sub = sample[:, j * dsub : (j + 1) * dsub]
        # derived per-subspace seed, same discipline as config.derive_seeds
        cb[j] = kmeans_numpy(sub, ksub, max_iters=max_iters, seed=seed * 31 + j)
    return PQModel(codebooks=cb)


def _encode_batch(x: np.ndarray, codebooks: np.ndarray) -> np.ndarray:
    """(n, d) float64 → (n, m) int32 codes; argmin per subspace.

    Expanded-form distances per subspace: O(n·ksub) scratch per
    subspace, never the (n, ksub, dsub) broadcast cube. Ties break to
    the lowest code (np.argmin first-wins), matching the relational
    ``ORDER BY dist2, code`` the oracle uses.
    """
    m, ksub, dsub = codebooks.shape
    n = x.shape[0]
    codes = np.empty((n, m), dtype=np.int32)
    for j in range(m):
        sub = x[:, j * dsub : (j + 1) * dsub]
        cbj = codebooks[j]
        d2 = (
            np.einsum("ij,ij->i", sub, sub)[:, None]
            - 2.0 * (sub @ cbj.T)
            + np.einsum("ij,ij->i", cbj, cbj)[None, :]
        )
        codes[:, j] = np.argmin(d2, axis=1)
    return codes


def pq_encode(
    df: DataFrame,
    model: PQModel,
    *,
    id_col: str = "id",
    vec_col: str = "values",
) -> DataFrame:
    """Encode every vector to its ``m`` codes → ``(id, codes)``.

    One pass over the data, zero shuffle; the output is the compressed
    corpus a 100 TB deployment persists (and scans at query time)
    instead of the raw vectors.
    """
    spark = df.sparkSession
    d = model.dimension
    bcb = spark.sparkContext.broadcast(model.codebooks)

    def _encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cb = bcb.value
        for pdf in batches:
            if pdf.empty:
                continue
            x = stack_arrays(pdf[vec_col])
            if x.shape[1] != d:
                raise ValueError(
                    f"vector dimension {x.shape[1]} != PQ dimension {d}"
                )
            codes = _encode_batch(x, cb)
            yield pd.DataFrame(
                {"id": pdf[id_col].to_numpy(), "codes": list(codes)}
            )

    return df.select(id_col, vec_col).mapInPandas(
        _encode, "id long, codes array<int>"
    )


def pq_reconstruct(codes: np.ndarray, model: PQModel) -> np.ndarray:
    """(n, m) codes → (n, d) reconstructed vectors (test/diagnostic)."""
    m, _, dsub = model.codebooks.shape
    out = np.empty((codes.shape[0], m * dsub), dtype=np.float64)
    for j in range(m):
        out[:, j * dsub : (j + 1) * dsub] = model.codebooks[j][codes[:, j]]
    return out


def refine_topk(
    shortlist: DataFrame,
    vectors: DataFrame,
    queries: DataFrame,
    k: int,
    *,
    id_col: str = "id",
    vec_col: str = "values",
    query_id_col: str = "query_id",
    query_col: str = "query",
) -> DataFrame:
    """Exact re-rank of an approximate candidate shortlist — the public
    Faiss ``IndexRefineFlat`` pattern (the reference bench harness's
    "RFlat" suffix keys, bench/faiss_bench_official/bench_all_ivf.py:
    parse_index refine handling): an ANN stage (PQ/SQ/IVF-PQ/LSH)
    produces ``(query_id, neighbor_id)`` candidates, and this stage
    rescores ONLY those against the raw vectors with the
    bit-reproducible fold, returning the exact-distance top-k.

    Returns ``(query_id, rank, neighbor_id, dist2)``, rank ascending by
    ``(dist2, neighbor_id)``.

    Plan shape for 100 TB: the shortlist is tiny (nq × refine depth) —
    it is BROADCAST against the raw vector table, so the big side never
    shuffles; the scan reads only (id, vector) columns and, when the
    table is sorted/bucketed by id, parquet row-group stats skip
    everything outside the candidate set. The rescored rows are
    nq × depth, driver-scale, ranked by one window.
    """
    if k <= 0:
        raise ValueError("k must be positive")
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(query_col).alias("__q")
    )
    cand = shortlist.select("query_id", "neighbor_id")
    v = vectors.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__v")
    )
    from vector_indexer_spark.functions.distance import (  # noqa: PLC0415
        dist2_expr,
    )

    scored = (
        v.join(F.broadcast(cand), "neighbor_id")
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            dist2_expr("__q", "__v").alias("dist2"),
        )
    )
    w = Window.partitionBy("query_id").orderBy("dist2", "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "dist2")
    )


def pq_search_refined(
    codes_df: DataFrame,
    queries: DataFrame,
    model: PQModel,
    k: int,
    vectors: DataFrame,
    *,
    refine_factor: int = 4,
    id_col: str = "id",
    codes_col: str = "codes",
    vec_col: str = "values",
    query_id_col: str = "query_id",
    query_col: str = "query",
) -> DataFrame:
    """PQ ADC shortlist of ``refine_factor·k`` candidates, exact-refined
    to top-k. Two scans: the compressed codes table (full, tiny) and a
    candidate-pruned read of the raw vectors — the standard way to get
    exact-quality top-k without ever scanning raw vectors fully."""
    if refine_factor < 1:
        raise ValueError("refine_factor must be >= 1")
    shortlist = pq_search(
        codes_df,
        queries,
        model,
        k=refine_factor * k,
        id_col=id_col,
        codes_col=codes_col,
        query_id_col=query_id_col,
        query_col=query_col,
    )
    return refine_topk(
        shortlist,
        vectors,
        queries,
        k,
        id_col=id_col,
        vec_col=vec_col,
        query_id_col=query_id_col,
        query_col=query_col,
    )


def pq_search(
    codes_df: DataFrame,
    queries: DataFrame,
    model: PQModel,
    k: int,
    *,
    id_col: str = "id",
    codes_col: str = "codes",
    query_id_col: str = "query_id",
    query_col: str = "query",
) -> DataFrame:
    """ADC top-k per query over the compressed corpus.

    Returns ``(query_id, rank, neighbor_id, adc_dist2)`` — rank 1-based
    ascending by ``(adc_dist2, neighbor_id)``, the engine-wide tie rule.
    ``adc_dist2`` is exact squared L2 to the candidate's reconstruction
    (the PQ approximation of its true distance).

    Plan shape: the query batch is collected (bounded-batch contract,
    same as ``knn_exact``'s arrow path), per-query LUTs are broadcast
    (nq·m·ksub doubles — 256 queries × 16 × 256 ≈ 8 MB), each partition
    emits its local top-k, and a global window ranks the
    ``partitions × nq × k`` survivors. The big side never shuffles.
    """
    if k <= 0:
        raise ValueError("k must be positive")
    spark = codes_df.sparkSession
    qrows = queries.select(query_id_col, query_col).collect()
    if not qrows:
        return spark.createDataFrame(
            [], "query_id long, rank int, neighbor_id long, adc_dist2 double"
        )
    qids = np.asarray([r[0] for r in qrows], dtype=np.int64)
    qmat = stack_arrays([r[1] for r in qrows])
    if qmat.shape[1] != model.dimension:
        raise ValueError(
            f"query dimension {qmat.shape[1]} != PQ dimension {model.dimension}"
        )
    m, ksub, dsub = model.codebooks.shape
    # LUT[q, j, c] = ||q_j − cb_j[c]||² — one expanded-form block per
    # subspace, (nq, ksub) scratch each
    nq = qmat.shape[0]
    lut = np.empty((nq, m, ksub), dtype=np.float64)
    for j in range(m):
        qj = qmat[:, j * dsub : (j + 1) * dsub]
        cbj = model.codebooks[j]
        lut[:, j, :] = (
            np.einsum("ij,ij->i", qj, qj)[:, None]
            - 2.0 * (qj @ cbj.T)
            + np.einsum("ij,ij->i", cbj, cbj)[None, :]
        )
    np.maximum(lut, 0.0, out=lut)
    blut = spark.sparkContext.broadcast((qids, lut))

    def _adc_topk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        qids_, lut_ = blut.value
        nq_, m_, _ = lut_.shape
        for pdf in batches:
            if pdf.empty:
                continue
            codes = np.asarray(
                [np.asarray(c, dtype=np.int64) for c in pdf[codes_col]]
            )
            vids = pdf[id_col].to_numpy()
            # gather: d2[q, i] = Σ_j lut[q, j, codes[i, j]]
            # lut[:, j, codes[:, j]] is (nq, n) per subspace — summed in
            # place so scratch stays at one (nq, n) block
            d2 = lut_[:, 0, codes[:, 0]]
            for j in range(1, m_):
                d2 = d2 + lut_[:, j, codes[:, j]]
            dists, ids = topk_per_row(d2, k, ids=vids)
            kk = dists.shape[1]
            yield pd.DataFrame(
                {
                    "query_id": np.repeat(qids_, kk),
                    "neighbor_id": ids.reshape(-1),
                    "adc_dist2": dists.reshape(-1),
                }
            )

    local = codes_df.select(id_col, codes_col).mapInPandas(
        _adc_topk, "query_id long, neighbor_id long, adc_dist2 double"
    )
    w = Window.partitionBy("query_id").orderBy("adc_dist2", "neighbor_id")
    return (
        local.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "adc_dist2")
    )


# ---------------------------------------------------------------------------
# IVF-PQ: coarse cluster pruning + residual PQ codes — the 100 TB layout
# ---------------------------------------------------------------------------


@dataclass
class IvfPqIndex:
    """Persisted IVF-PQ index: centroid table + per-vector codes
    partitioned by shard (NO raw vectors — the corpus on disk is m
    bytes-ish per vector plus ids). Classic residual encoding (Jégou
    et al. 2011 §IV; Faiss ``IndexIVFPQ``): each vector is stored as
    its coarse cluster plus PQ codes of the residual ``x − c``."""

    path: str
    dimension: int
    nlist: int
    n_shards: int
    seed: int
    n_vectors: int
    centroids: np.ndarray  # (nlist, d) float64, dense ids
    centroid_shards: np.ndarray  # (nlist,) int64
    pq: PQModel

    def codes_path(self) -> str:
        return os.path.join(self.path, "codes")

    def codes(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.codes_path())


IVFPQ_FORMAT_VERSION = 1


def build_ivfpq_index(
    df: DataFrame,
    path: str,
    *,
    id_col: str = "id",
    vec_col: str = "values",
    nlist: int | None = None,
    m: int = 8,
    ksub: int = 256,
    seed: int = 42,
    mode: str = "full",
    max_iters: int | None = None,
) -> IvfPqIndex:
    """Train coarse + PQ quantizers and persist the compressed index.

    Pipeline (each phase streams; nothing driver-sized except the
    quantizers themselves):

    1. coarse k-means (reuses the IVF trainer incl. hierarchical
       assignment above k=100),
    2. distributed cluster assignment, dense renumber + sharding
       (same layout contract as the flat index),
    3. PQ codebooks trained on a seeded sample of *residuals*
       ``x − c(x)`` (driver NumPy, bounded sample — same contract as
       coarse training),
    4. one distributed encode pass: residual → m codes per vector,
       written ``partitionBy(shard_id)`` sorted by cluster — Hive
       pruning + row-group stats exactly like the flat index, but the
       table is ~m bytes per vector instead of 4d.
    """
    from vector_indexer_spark.config import calculate_max_iterations, suggest_nlist
    from vector_indexer_spark.operators.index_build import (
        dense_relabel_and_shards,
    )
    from vector_indexer_spark.operators.kmeans import (
        _collect_sample,
        assign_clusters,
        kmeans_fit,
    )
    from vector_indexer_spark.functions.kernels import assign_nearest

    spark = df.sparkSession
    n = df.count()
    if n == 0:
        raise ValueError("cannot build an index from an empty DataFrame")
    dimension = len(df.select(vec_col).first()[0])
    bad = df.filter(F.size(vec_col) != dimension).count()
    if bad:
        raise ValueError(f"{bad} records have dimension != {dimension}")
    if dimension % m != 0:
        raise ValueError(f"dimension {dimension} not divisible by m={m}")

    nlist = nlist or suggest_nlist(n)
    max_iters = max_iters or calculate_max_iterations(n)

    model = kmeans_fit(
        df, nlist, vec_col=vec_col, max_iters=max_iters, seed=seed, mode=mode
    )
    assigned = assign_clusters(
        df, model.centroids, vec_col=vec_col, out_col="__raw_cluster", seed=seed
    ).cache()
    counts = {
        r["__raw_cluster"]: r["cnt"]
        for r in assigned.groupBy("__raw_cluster")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    relabel, centroids, eff_nlist, n_sh, shard_of = dense_relabel_and_shards(
        counts, model.centroids, seed
    )

    # 3. PQ on residual sample (seed offset keeps the PQ sample draw
    # independent of the coarse-training draw)
    sample = _collect_sample(df, vec_col, KMEANS_INIT_SAMPLE_CAP, seed + 1)
    res = sample - centroids[assign_nearest(sample, centroids)]
    dsub = dimension // m
    cb = np.zeros((m, ksub, dsub), dtype=np.float64)
    for j in range(m):
        cb[j] = kmeans_numpy(
            res[:, j * dsub : (j + 1) * dsub],
            ksub,
            max_iters=25,
            seed=seed * 31 + j,
        )
    pqm = PQModel(codebooks=cb)

    # 4. relabel + residual-encode + partitioned write
    mapping = spark.createDataFrame(
        [(int(old), int(new), int(shard_of[new])) for old, new in relabel.items()],
        "__raw_cluster long, cluster_id long, shard_id long",
    )
    bstate = spark.sparkContext.broadcast((centroids, cb))

    def _encode_res(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cents_, cb_ = bstate.value
        for pdf in batches:
            if pdf.empty:
                continue
            x = stack_arrays(pdf["__vec"])
            cl = pdf["cluster_id"].to_numpy()
            codes = _encode_batch(x - cents_[cl], cb_)
            yield pd.DataFrame(
                {
                    "id": pdf["id"].to_numpy(),
                    "codes": list(codes),
                    "cluster_id": cl,
                    "shard_id": pdf["shard_id"].to_numpy(),
                }
            )

    out = (
        assigned.join(F.broadcast(mapping), "__raw_cluster")
        .select(
            F.col(id_col).alias("id"),
            F.col(vec_col).alias("__vec"),
            "cluster_id",
            "shard_id",
        )
        .mapInPandas(
            _encode_res,
            "id long, codes array<int>, cluster_id long, shard_id long",
        )
        .repartition("shard_id")
        .sortWithinPartitions("shard_id", "cluster_id")
    )
    out.write.mode("overwrite").partitionBy("shard_id").parquet(
        os.path.join(path, "codes")
    )
    assigned.unpersist()

    cent_rows = [
        (int(i), [float(x) for x in centroids[i]], int(shard_of[i]))
        for i in range(eff_nlist)
    ]
    spark.createDataFrame(
        cent_rows, "centroid_id long, vector array<float>, shard_id long"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(path, "centroids")
    )
    pqm.save(spark, path)
    meta = {
        "version": IVFPQ_FORMAT_VERSION,
        "kind": "ivfpq",
        "dimension": dimension,
        "nlist": eff_nlist,
        "n_shards": n_sh,
        "seed": seed,
        "n_vectors": n,
        "m": m,
        "ksub": ksub,
    }
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "ivfpq_meta.json"), "w") as f:
        json.dump(meta, f, indent=2)
    return IvfPqIndex(
        path=path,
        dimension=dimension,
        nlist=eff_nlist,
        n_shards=n_sh,
        seed=seed,
        n_vectors=n,
        centroids=centroids,
        centroid_shards=shard_of,
        pq=pqm,
    )


def load_ivfpq_index(spark: SparkSession, path: str) -> IvfPqIndex:
    meta_path = os.path.join(path, "ivfpq_meta.json")
    if not os.path.exists(meta_path):
        raise FileNotFoundError(f"no IVF-PQ index at {path}")
    with open(meta_path) as f:
        meta = json.load(f)
    if meta.get("version") != IVFPQ_FORMAT_VERSION:
        raise ValueError(f"unsupported IVF-PQ version {meta.get('version')!r}")
    rows = (
        spark.read.parquet(os.path.join(path, "centroids"))
        .orderBy("centroid_id")
        .collect()
    )
    centroids = np.asarray([r.vector for r in rows], dtype=np.float64)
    shard_of = np.asarray([r.shard_id for r in rows], dtype=np.int64)
    return IvfPqIndex(
        path=path,
        dimension=meta["dimension"],
        nlist=meta["nlist"],
        n_shards=meta["n_shards"],
        seed=meta["seed"],
        n_vectors=meta["n_vectors"],
        centroids=centroids,
        centroid_shards=shard_of,
        pq=PQModel.load(spark, path),
    )


def search_ivfpq(
    spark: SparkSession,
    index: IvfPqIndex,
    queries: DataFrame,
    k: int = 10,
    n_probe: int = 20,
    *,
    query_id_col: str = "query_id",
    query_col: str = "query",
    codes: DataFrame | None = None,
) -> DataFrame:
    """Pruned ADC search over the compressed index.

    Same two-action shape as the flat arrow search (driver probe
    ranking → one pruned scan+score job), but the scan reads only
    ``(id, codes, cluster_id)`` of the probed partitions and scoring is
    per-cluster residual ADC: for each scanned cluster, LUTs are built
    from ``q − c`` for exactly the queries probing that cluster (LUT
    state is per-batch local — never a broadcast of nq × nlist tables).
    Returns ``(query_id, rank, neighbor_id, adc_dist2)``.
    """
    if k <= 0 or n_probe <= 0:
        raise ValueError("k and n_probe must be positive")
    qrows = queries.select(query_id_col, query_col).collect()
    if not qrows:
        return spark.createDataFrame(
            [], "query_id long, rank int, neighbor_id long, adc_dist2 double"
        )
    bad = sum(1 for r in qrows if len(r[1]) != index.dimension)
    if bad:
        raise ValueError(f"{bad} queries have dimension != {index.dimension}")
    qids = np.asarray([r[0] for r in qrows], dtype=np.int64)
    qmat = stack_arrays([r[1] for r in qrows])

    from vector_indexer_spark.functions.kernels import (
        pairwise_dist2,
        topk_per_row as _topk,
        topk_per_row_hierarchical,
    )
    from vector_indexer_spark.operators.search import (
        _HIER_PROBE_NLIST,
        probe_hierarchy_for,
    )

    if index.nlist >= _HIER_PROBE_NLIST:
        meta_c, meta_l = probe_hierarchy_for(index)
        _, probe_ids = topk_per_row_hierarchical(
            qmat, index.centroids, meta_c, meta_l, min(n_probe, index.nlist)
        )
    else:
        d2c = pairwise_dist2(qmat, index.centroids)
        _, probe_ids = _topk(d2c, min(n_probe, index.nlist))
    cluster_ids = np.unique(probe_ids)
    shard_ids = np.unique(index.centroid_shards[cluster_ids])
    pos = {int(c): i for i, c in enumerate(cluster_ids)}
    probe_mask = np.zeros((len(qids), len(cluster_ids)), dtype=bool)
    for qi in range(len(qids)):
        probe_mask[qi, [pos[int(c)] for c in probe_ids[qi]]] = True

    base = codes if codes is not None else index.codes(spark)
    pruned = base.where(
        F.col("shard_id").isin([int(s) for s in shard_ids])
        & F.col("cluster_id").isin([int(c) for c in cluster_ids])
    ).select("id", "codes", "cluster_id")

    bstate = spark.sparkContext.broadcast(
        (qids, qmat, index.centroids, index.pq.codebooks, cluster_ids,
         probe_mask)
    )

    def _adc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        qids_, qmat_, cents_, cb_, cids_, mask_ = bstate.value
        m_, ksub_, dsub_ = cb_.shape
        nq = qmat_.shape[0]
        for pdf in batches:
            if pdf.empty:
                continue
            codes_np = np.asarray(
                [np.asarray(c, dtype=np.int64) for c in pdf["codes"]]
            )
            vids = pdf["id"].to_numpy()
            cl = pdf["cluster_id"].to_numpy()
            nrows = len(vids)
            d2 = np.full((nq, nrows), np.inf)
            # per scanned cluster: residual LUTs for the probing
            # queries only, then the LUT-gather distance fill
            for c in np.unique(cl):
                qsel = np.flatnonzero(mask_[:, np.searchsorted(cids_, c)])
                if qsel.size == 0:
                    continue
                rsel = np.flatnonzero(cl == c)
                qr = qmat_[qsel] - cents_[c]
                lut = np.empty((qsel.size, m_, ksub_), dtype=np.float64)
                for j in range(m_):
                    qj = qr[:, j * dsub_ : (j + 1) * dsub_]
                    cbj = cb_[j]
                    lut[:, j, :] = (
                        np.einsum("ij,ij->i", qj, qj)[:, None]
                        - 2.0 * (qj @ cbj.T)
                        + np.einsum("ij,ij->i", cbj, cbj)[None, :]
                    )
                np.maximum(lut, 0.0, out=lut)
                sub = lut[:, 0, codes_np[rsel, 0]]
                for j in range(1, m_):
                    sub = sub + lut[:, j, codes_np[rsel, j]]
                d2[np.ix_(qsel, rsel)] = sub
            dists, ids = _topk(d2, k, ids=vids)
            keep = np.isfinite(dists)
            if not keep.any():
                continue
            kk = dists.shape[1]
            qrep = np.repeat(qids_, kk).reshape(nq, kk)
            yield pd.DataFrame(
                {
                    "query_id": qrep[keep],
                    "neighbor_id": ids[keep],
                    "adc_dist2": dists[keep],
                }
            )

    local = pruned.mapInPandas(
        _adc, "query_id long, neighbor_id long, adc_dist2 double"
    )
    w = Window.partitionBy("query_id").orderBy("adc_dist2", "neighbor_id")
    return (
        local.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "adc_dist2")
    )


def add_vectors_ivfpq(
    spark: SparkSession,
    index: IvfPqIndex,
    df: DataFrame,
    *,
    id_col: str = "id",
    vec_col: str = "values",
    check_duplicate_ids: bool = True,
) -> dict:
    """Incremental ingest for the compressed tier (Faiss
    ``IndexIVFPQ.add``): assign the new batch to the FROZEN coarse
    centroids, residual-encode with the FROZEN codebooks, and append
    shard-partitioned code files — the quantizers are never retrained,
    so recall on added data drifts only as its distribution drifts
    from the training sample (re-``build_ivfpq_index`` when it does).

    One shuffle of the new batch only; the live codes table is never
    read (beyond the optional duplicate-id scan) or rewritten.
    :func:`~vector_indexer_spark.operators.index_build.compact_index`
    does not apply here (different table name) — re-append rarely and
    large, or compact by rewriting ``codes`` the same staged way.
    Returns ``{n_added, n_vectors}``.
    """
    from vector_indexer_spark.operators.index_build import (  # noqa: PLC0415
        validate_add_batch,
    )
    from vector_indexer_spark.operators.kmeans import (  # noqa: PLC0415
        assign_clusters,
    )

    n_new = validate_add_batch(
        df,
        id_col=id_col,
        vec_col=vec_col,
        dimension=index.dimension,
        existing_ids=(
            index.codes(spark).select("id") if check_duplicate_ids else None
        ),
    )
    assigned = assign_clusters(
        df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("__vec")),
        index.centroids,
        vec_col="__vec",
        out_col="cluster_id",
        seed=index.seed,
    )
    shard_map = spark.createDataFrame(
        [(int(c), int(s)) for c, s in enumerate(index.centroid_shards)],
        "cluster_id long, shard_id long",
    )
    bstate = spark.sparkContext.broadcast(
        (index.centroids, index.pq.codebooks)
    )

    def _encode_res(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cents_, cb_ = bstate.value
        for pdf in batches:
            if pdf.empty:
                continue
            x = stack_arrays(pdf["__vec"])
            cl = pdf["cluster_id"].to_numpy()
            codes = _encode_batch(x - cents_[cl], cb_)
            yield pd.DataFrame(
                {
                    "id": pdf["id"].to_numpy(),
                    "codes": list(codes),
                    "cluster_id": cl,
                    "shard_id": pdf["shard_id"].to_numpy(),
                }
            )

    (
        assigned.join(F.broadcast(shard_map), "cluster_id")
        .select("id", "__vec", "cluster_id", "shard_id")
        .mapInPandas(
            _encode_res,
            "id long, codes array<int>, cluster_id long, shard_id long",
        )
        .repartition("shard_id")
        .sortWithinPartitions("shard_id", "cluster_id")
        .write.mode("append")
        .partitionBy("shard_id")
        .parquet(index.codes_path())
    )
    meta_path = os.path.join(index.path, "ivfpq_meta.json")
    with open(meta_path) as f:
        meta = json.load(f)
    meta["n_vectors"] = int(meta["n_vectors"]) + n_new
    atomic_write_json(meta_path, meta)
    index.n_vectors = meta["n_vectors"]
    return {"n_added": n_new, "n_vectors": index.n_vectors}
