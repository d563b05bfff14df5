"""Vector file sources: Parquet (canonical), .npy/.fvecs/.ivecs
(benchmark formats), and seeded synthetic generation.

Reference mapping:
- S2/S3 — the reference's bincode vector-file ingest
  (src/api.rs:149-186, src/utils.rs:82-107). Our canonical on-disk
  vector format *is* Parquet; these helpers read the legacy benchmark
  formats into that shape.
- S12 — Faiss benchmark loaders for .npy/.fvecs/.ivecs with row caps
  (bench/faiss_bench_official/bench_all_ivf.py:88-156). These formats
  are single-file, driver-decoded (they are bounded benchmark inputs,
  not the 100 TB path — that path is Parquet).
- S4 — synthetic generation (src/utils.rs:34-79): uniform(-1, 1)
  components, seeded, distributed via mapInPandas with a
  per-partition derived seed (the Spark analog of the reference's
  parallel producer threads + single writer).
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_fvecs(path: str, max_rows: int | None = None) -> np.ndarray:
    """S12 — .fvecs: per record an int32 dim header then d float32s."""
    return _read_xvecs(path, np.float32, max_rows)


def read_ivecs(path: str, max_rows: int | None = None) -> np.ndarray:
    """S12 — .ivecs: per record an int32 dim header then d int32s."""
    return _read_xvecs(path, np.int32, max_rows)


def _read_xvecs(path: str, dtype, max_rows: int | None) -> np.ndarray:
    with open(path, "rb") as f:
        header = f.read(4)
        if len(header) < 4:
            raise ValueError(f"{path}: empty or truncated xvecs file")
        (d,) = struct.unpack("<i", header)
        if d <= 0:
            raise ValueError(f"{path}: invalid dimension {d}")
        f.seek(0)
        raw = np.fromfile(f, dtype=np.int32)
    record = d + 1
    if raw.size % record:
        raise ValueError(f"{path}: size {raw.size} not a multiple of {record}")
    mat = raw.reshape(-1, record)[:, 1:]
    if max_rows is not None:
        mat = mat[:max_rows]
    return mat.view(dtype) if dtype is np.float32 else mat.astype(dtype)


def read_npy(path: str, max_rows: int | None = None) -> np.ndarray:
    """S12 — .npy matrix loader with a row cap."""
    mat = np.load(path, mmap_mode="r")
    if max_rows is not None:
        mat = mat[:max_rows]
    return np.ascontiguousarray(mat)


def vectors_from_numpy(
    spark: SparkSession, mat: np.ndarray, *, id_offset: int = 0
) -> DataFrame:
    """Driver matrix → internal vector DataFrame (ids = ordinals)."""
    mat = np.ascontiguousarray(mat, dtype=np.float32)
    n = mat.shape[0]
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "id": np.arange(id_offset, id_offset + n, dtype=np.int64),
                "external_id": np.arange(id_offset, id_offset + n, dtype=np.int64),
                "values": list(mat),
                "ts": np.zeros(n, dtype=np.int64),
            }
        ),
        "id long, external_id long, values array<float>, ts long",
    )


def generate_vectors(
    spark: SparkSession,
    count: int,
    dimension: int,
    *,
    seed: int = 42,
    partitions: int | None = None,
) -> DataFrame:
    """S4 — seeded synthetic vectors, components ~ uniform(-1, 1).

    Distributed: ``spark.range`` partitions the id space; each Arrow
    batch derives its RNG from (seed, first id in batch), so the output
    is deterministic for a given (count, dimension, seed, partitioning)
    and generation parallelism scales with the cluster, like the
    reference's producer threads (src/utils.rs:34-79).
    """
    if count <= 0 or dimension <= 0:
        raise ValueError("count and dimension must be positive")
    base = spark.range(0, count, 1, partitions or spark.sparkContext.defaultParallelism)

    def _gen(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf["id"].to_numpy()
            rng = np.random.default_rng((seed, int(ids[0])))
            vals = rng.uniform(-1.0, 1.0, size=(len(ids), dimension)).astype(
                np.float32
            )
            yield pd.DataFrame(
                {
                    "id": ids,
                    "external_id": ids,
                    "values": list(vals),
                    "ts": np.zeros(len(ids), dtype=np.int64),
                }
            )

    return base.mapInPandas(
        _gen, "id long, external_id long, values array<float>, ts long"
    )


def generate_clustered_vectors(
    spark: SparkSession,
    count: int,
    dimension: int,
    *,
    n_clusters: int = 100,
    separation: float = 10.0,
    noise: float = 0.5,
    seed: int = 42,
    partitions: int | None = None,
) -> DataFrame:
    """Seeded Gaussian-cluster synthetic vectors (the reference's test
    data shape: centers at cluster_id·separation + dim·0.1 with uniform
    noise, tests/test_utils/mod.rs:34-66). This is the *evaluation*
    distribution for ANN benchmarks — IVF pruning is meaningless on
    uniform data, and real embedding corpora are clustered.
    """
    if count <= 0 or dimension <= 0 or n_clusters <= 0:
        raise ValueError("count, dimension, n_clusters must be positive")
    base = spark.range(
        0, count, 1, partitions or spark.sparkContext.defaultParallelism
    )

    def _gen(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf["id"].to_numpy()
            rng = np.random.default_rng((seed, int(ids[0])))
            cluster = ids % n_clusters
            centers = (
                cluster[:, None] * separation
                + np.arange(dimension)[None, :] * 0.1
            )
            vals = (
                centers
                + rng.uniform(-noise, noise, size=(len(ids), dimension))
            ).astype(np.float32)
            yield pd.DataFrame(
                {
                    "id": ids,
                    "external_id": ids,
                    "values": list(vals),
                    "ts": np.zeros(len(ids), dtype=np.int64),
                    "true_cluster": cluster,
                }
            )

    return base.mapInPandas(
        _gen,
        "id long, external_id long, values array<float>, ts long,"
        " true_cluster long",
    )


def read_vector_parquet(spark: SparkSession, path: str) -> DataFrame:
    """S2/S3 — canonical vector-file ingest (directory of Parquet)."""
    return spark.read.parquet(path)


def write_vector_parquet(df: DataFrame, path: str, *, mode: str = "overwrite"):
    """Canonical vector-file writer (the reference's append-batches
    writer collapses to one partitioned write)."""
    df.write.mode(mode).parquet(path)


def read_events_ns(spark: SparkSession, path: str) -> DataFrame:
    """Events reader with the ``ts`` column normalized to BIGINT epoch
    nanoseconds, whatever the parquet writer used.

    Source files vary: nanosecond TIMESTAMP columns land as int64 nanos
    (via the legacy nanosAsLong read conf), micro/millisecond ones as
    TIMESTAMP/TIMESTAMP_NTZ. Downstream event-time arithmetic (hourly
    buckets, session gaps) wants one integer timeline, so normalize at
    the source — the same move as reading into a canonical schema on a
    real lakehouse.
    """
    from pyspark.sql import functions as F  # noqa: PLC0415
    from pyspark.sql import types as T  # noqa: PLC0415

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = spark.read.parquet(path)
    ts_type = ev.schema["ts"].dataType
    if isinstance(ts_type, T.LongType):  # already int64 nanos
        return ev
    # TIMESTAMP / TIMESTAMP_NTZ → epoch nanos. Session timezone is
    # pinned to UTC (session.py), so the NTZ → instant cast is exact.
    return ev.withColumn(
        "ts", F.unix_micros(F.col("ts").cast("timestamp")) * F.lit(1000)
    )


# LCG constants (glibc rand() multiplier — public constants) for the
# engine-independent deterministic generator below.
_LCG_A = 1103515245
_LCG_C = 12345
_LCG_M = 2**31


def generate_vectors_lcg(
    spark: SparkSession,
    count: int,
    dimension: int,
    *,
    seed: int = 42,
    partitions: int | None = None,
) -> DataFrame:
    """S4, oracle-able variant — deterministic synthetic vectors whose
    every component is a pure-integer function of ``(id, component,
    seed)``, expressible identically in any SQL engine (two LCG rounds
    keyed on the flattened component index; all intermediates < 2^61 so
    64-bit integer arithmetic never overflows, ANSI-safe).

    Unlike :func:`generate_vectors` (NumPy PRNG per Arrow batch —
    higher-quality randomness, but only reproducible by this engine),
    this variant is bit-reproducible by the DuckDB oracle, which turns
    synthetic *generation* itself into an oracle-checked operator. The
    whole expression is JVM-side Catalyst (``transform`` over
    ``sequence``) — no Python workers, fully distributed via
    ``spark.range``.
    """
    if count <= 0 or dimension <= 0:
        raise ValueError("count and dimension must be positive")
    offset = (seed * 2654435761) % _LCG_M  # Knuth multiplicative hash
    base = spark.range(
        0, count, 1, partitions or spark.sparkContext.defaultParallelism
    )

    def _component(j):
        x0 = (F.col("id") * dimension + j + F.lit(offset)) % F.lit(_LCG_M)
        x1 = (x0 * _LCG_A + _LCG_C) % F.lit(_LCG_M)
        x2 = (x1 * _LCG_A + _LCG_C) % F.lit(_LCG_M)
        return (
            x2.cast("double") / float(_LCG_M) * 2.0 - 1.0
        ).cast("float")

    values = F.transform(
        F.sequence(F.lit(0), F.lit(dimension - 1)), _component
    )
    return base.select(
        F.col("id"),
        F.col("id").alias("external_id"),
        values.alias("values"),
        F.lit(0).cast("long").alias("ts"),
    )


DOCUMENTS_JSONL_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)


def read_documents_jsonl(
    spark: SparkSession,
    path: str,
    *,
    schema: str = DOCUMENTS_JSONL_SCHEMA,
    keep_corrupt: bool = False,
) -> DataFrame:
    """Schema-enforced JSONL document source — the wire format most
    raw text corpora arrive in before they become parquet.

    ``keep_corrupt=False`` (default) reads with ``DROPMALFORMED``:
    a malformed line is silently skipped at the parser, so one bad
    line never kills a 100 TB ingestion job — and, crucially, the
    returned frame carries no ``_corrupt_record`` column, so *any*
    downstream query works (Spark refuses a query that references
    only the corrupt column of a raw JSON scan —
    ``QUERY_ONLY_CORRUPT_RECORD_COLUMN`` — which a post-hoc
    ``filter(corrupt IS NULL)`` + ``count()`` would trip).

    ``keep_corrupt=True`` reads PERMISSIVE with an explicit
    ``_corrupt_record`` column: malformed lines become rows whose
    typed columns are null and whose raw text lands in the corrupt
    column, for callers auditing dirty feeds. Those callers must
    cache/persist before filtering on only that column (same Spark
    restriction).

    The declared schema is load-bearing twice over: it skips Spark's
    schema-inference pre-pass (a full extra read of the input), and it
    makes column pruning reach the JSON parser (Jackson parses only
    the projected fields).
    """
    if keep_corrupt:
        return (
            spark.read.schema(schema + ", _corrupt_record string")
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", "_corrupt_record")
            .json(path)
        )
    return (
        spark.read.schema(schema)
        .option("mode", "DROPMALFORMED")
        .json(path)
    )


def write_documents_jsonl(
    df: DataFrame,
    path: str,
    *,
    partitions: int | None = None,
    compression: str | None = "gzip",
) -> None:
    """JSONL document sink — the inverse of
    :func:`read_documents_jsonl`, for handing a cleaned corpus to
    tooling that speaks line-JSON rather than parquet. One file per
    partition (``partitions`` repartitions first when the caller
    wants a specific shard count); ``compression`` defaults to gzip —
    Spark reads .json.gz back transparently, so the round-trip needs
    no flags. Field order inside each line follows the DataFrame's
    column order; a read-back through the schema-enforced reader is
    row-identical (asserted in test_sources)."""
    out = df.repartition(partitions) if partitions else df
    w = out.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.json(path)


def read_documents_csv(
    spark: SparkSession,
    path: str,
    *,
    schema: str = "doc_id LONG, text STRING, lang STRING, source STRING",
    header: bool = True,
    keep_corrupt: bool = False,
) -> DataFrame:
    """Schema-enforced CSV document source (the other wire format raw
    drops arrive in). Same contract as the JSONL reader: explicit
    schema — never an inference pre-pass over 100 TB — and
    DROPMALFORMED by default; ``keep_corrupt=True`` switches to
    PERMISSIVE with a ``_corrupt_record`` audit column (cached before
    filtering, per the Spark corrupt-column restriction).
    """
    if keep_corrupt:
        df = spark.read.csv(
            path,
            schema=schema + ", _corrupt_record STRING",
            header=header,
            mode="PERMISSIVE",
            columnNameOfCorruptRecord="_corrupt_record",
            multiLine=False,
            escape='"',
        )
        return df.cache()
    return spark.read.csv(
        path,
        schema=schema,
        header=header,
        mode="DROPMALFORMED",
        multiLine=False,
        escape='"',
    )
