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
