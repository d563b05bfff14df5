"""Training-shard sink: the last stage of the corpus pipeline.

After clean → dedup → decontaminate → split → mixture → pack, the
corpus must land on disk as the fixed set of shard files a training
job streams. This sink makes that layout deterministic and
self-describing:

- shard routing is the engine's portable ``(seed, id)`` md5 bucket —
  a pure function of the row, so re-running the pipeline yields the
  SAME shard for every row regardless of partitioning (``partitionBy``
  on a random or monotonic id would not);
- rows are sorted inside each shard by caller-chosen columns (e.g.
  ``bin_id`` from ``pack_sequences``) so a trainer reads examples in a
  reproducible order and parquet row-group stats support range reads;
- a ``manifest.json`` records shard count, per-shard row counts, the
  routing seed, and format version — the index-root pattern
  (reference meta.json, src/ivf_index.rs:269-295) applied to corpus
  output.

Scale: one exchange (the shard route) and one sorted write; shards are
Hive partitions, so selective reads prune to the shard directories —
the same partition-pruning shape the vector index uses for clusters.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SHARD_FORMAT_VERSION = 1


def shard_expr(id_col, n_shards: int, *, seed: int = 11):
    """Deterministic shard id: ``md5("{seed}:{id}") mod n_shards`` —
    same portable bucket family as splitting/sampling (distinct seed
    keeps shard routing independent of those draws)."""
    from vector_indexer_spark.operators.splits import _bucket_expr

    if n_shards <= 0:
        raise ValueError("n_shards must be positive")
    return (_bucket_expr(id_col, seed) % n_shards).cast("long")


def write_training_shards(
    df: DataFrame,
    path: str,
    *,
    n_shards: int = 16,
    id_col: str = "doc_id",
    sort_cols: tuple = (),
    seed: int = 11,
) -> dict:
    """Write the corpus as ``path/data/shard=S/`` parquet partitions
    plus ``path/manifest.json``; returns the manifest dict.

    Rows are routed by ``shard_expr`` and sorted within each shard by
    ``sort_cols + (id_col,)`` — fully deterministic output layout.
    """
    routed = df.withColumn("shard", shard_expr(id_col, n_shards, seed=seed))
    (
        routed.repartition(n_shards, "shard")
        .sortWithinPartitions(*[*sort_cols, id_col])
        .write.partitionBy("shard")
        .mode("errorifexists")
        .parquet(os.path.join(path, "data"))
    )
    counts = {
        int(r["shard"]): int(r["n"])
        for r in routed.groupBy("shard").agg(F.count("*").alias("n")).collect()
    }
    manifest = {
        "version": SHARD_FORMAT_VERSION,
        "n_shards": n_shards,
        "seed": seed,
        "id_col": id_col,
        "sort_cols": list(sort_cols),
        "rows": sum(counts.values()),
        "shard_rows": {str(s): counts.get(s, 0) for s in range(n_shards)},
    }
    with open(os.path.join(path, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2, sort_keys=True)
    return manifest


def read_training_shards(
    spark: SparkSession, path: str, *, shards: list | None = None
) -> DataFrame:
    """Reopen a shard set; ``shards`` restricts the scan to those
    partition directories (partition pruning — the selective-read
    path, S8 shape)."""
    mpath = os.path.join(path, "manifest.json")
    if not os.path.exists(mpath):
        raise FileNotFoundError(f"no training shards at {path!r}")
    with open(mpath) as f:
        manifest = json.load(f)
    if manifest.get("version") != SHARD_FORMAT_VERSION:
        raise ValueError(
            f"unsupported shard format version {manifest.get('version')!r}"
        )
    out = spark.read.parquet(os.path.join(path, "data"))
    if shards is not None:
        out = out.where(F.col("shard").isin([int(s) for s in shards]))
    return out
