"""Dataset maintenance — snapshot diff, partition upsert, constraint
validation. The operational layer around a 100 TB table: what changed
between two loads, how to land a corrected slice without rewriting the
table, and whether a drop satisfies its contract before it merges.
"""

from __future__ import annotations

import json
import os
import shutil
import time as _time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    *,
    compare_cols: list[str] | None = None,
    include_unchanged: bool = False,
) -> DataFrame:
    """Change-data capture between two snapshots: one row per key with
    ``change_type`` ∈ added | removed | changed (| unchanged).

    ``compare_cols`` defaults to every shared non-key column; equality
    is null-safe (NULL == NULL). One full-outer hash join on the key —
    at warehouse scale co-partition both snapshots on the key (bucketed
    layout) and the join degrades to zero-shuffle sort-merge, the same
    discipline as the fact-fact OLAP joins.
    """
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    shared = [c for c in old.columns if c in set(new.columns)]
    cmp_cols = (
        list(compare_cols)
        if compare_cols is not None
        else [c for c in shared if c not in set(key_cols)]
    )
    missing = [
        c
        for c in list(key_cols) + cmp_cols
        if c not in old.columns or c not in new.columns
    ]
    if missing:
        raise ValueError(f"columns absent from a snapshot: {missing}")
    o = old.select(
        *key_cols,
        *[F.col(c).alias(f"__o_{c}") for c in cmp_cols],
        F.lit(1).alias("__in_old"),
    )
    n = new.select(
        *key_cols,
        *[F.col(c).alias(f"__n_{c}") for c in cmp_cols],
        F.lit(1).alias("__in_new"),
    )
    joined = o.join(n, list(key_cols), "full_outer")
    same = F.lit(True)
    for c in cmp_cols:
        same = same & F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}"))
    change = (
        F.when(F.col("__in_old").isNull(), F.lit("added"))
        .when(F.col("__in_new").isNull(), F.lit("removed"))
        .when(same, F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    out = joined.select(*key_cols, change.alias("change_type"))
    if not include_unchanged:
        out = out.filter(F.col("change_type") != "unchanged")
    return out.orderBy(*key_cols)


def upsert_partitions(
    df: DataFrame,
    path: str,
    partition_col: str,
) -> None:
    """Land a corrected slice into a partitioned parquet table,
    touching ONLY the partitions present in ``df`` (Spark's dynamic
    partition overwrite): the daily-backfill move — rewrite one day,
    never the table. Callers re-reading the path see old partitions
    byte-identical.
    """
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partition_col)
        .parquet(path)
    )


def validate_constraints(
    df: DataFrame,
    *,
    not_null: list[str] | None = None,
    unique: list[list[str]] | None = None,
    accepted_values: dict[str, list] | None = None,
    ranges: dict[str, tuple] | None = None,
) -> DataFrame:
    """Contract check before a drop merges: one row per rule with its
    violation count — ``(rule, column, n_violations)``; a clean drop
    is all-zero. The dbt-test / Great-Expectations shape as ONE Spark
    job: every rule is a conditional count in a single aggregation
    pass (uniqueness rules add one groupBy each, on their own keys).
    """
    aggs = []
    labels: list[tuple[str, str]] = []
    for c in not_null or []:
        aggs.append(
            F.sum(F.col(c).isNull().cast("long")).alias(
                f"nn_{len(labels)}"
            )
        )
        labels.append(("not_null", c))
    for c, vals in (accepted_values or {}).items():
        aggs.append(
            F.sum(
                (~F.col(c).isin(vals) | F.col(c).isNull()).cast("long")
            ).alias(f"nn_{len(labels)}")
        )
        labels.append(("accepted_values", c))
    for c, (lo, hi) in (ranges or {}).items():
        aggs.append(
            F.sum(
                ((F.col(c) < lo) | (F.col(c) > hi)).cast("long")
            ).alias(f"nn_{len(labels)}")
        )
        labels.append(("range", c))

    spark = df.sparkSession
    parts = []
    if aggs:
        one = df.agg(*aggs)
        stack_args = []
        for i, (rule, col) in enumerate(labels):
            stack_args += [
                F.lit(rule),
                F.lit(col),
                F.coalesce(F.col(f"nn_{i}"), F.lit(0)).cast("long"),
            ]
        parts.append(
            one.select(
                F.stack(F.lit(len(labels)), *stack_args).alias(
                    "rule", "column", "n_violations"
                )
            )
        )
    for keys in unique or []:
        dup = (
            df.groupBy(*keys)
            .agg(F.count("*").alias("__c"))
            .filter(F.col("__c") > 1)
            .agg(
                F.coalesce(F.sum(F.col("__c") - 1), F.lit(0))
                .cast("long")
                .alias("n_violations")
            )
            .select(
                F.lit("unique").alias("rule"),
                F.lit(",".join(keys)).alias("column"),
                "n_violations",
            )
        )
        parts.append(dup)
    if not parts:
        return spark.createDataFrame(
            [], "rule string, column string, n_violations long"
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("rule", "column")


# ---------------------------------------------------------------------------
# Versioned tables (commit log + time travel) — "table format lite"
# ---------------------------------------------------------------------------
#
# Reproducible corpus construction needs "train run X used corpus
# version N" to stay answerable forever. Full table formats
# (Delta/Iceberg) solve this with a transaction log over immutable
# files; this is the same design reduced to its core: each commit
# writes an immutable snapshot directory plus a JSON manifest naming
# it, `_latest` points at the newest manifest, readers resolve a
# version (or the latest) and do a plain parquet scan of that
# snapshot. Writers never touch previous snapshots — time travel is a
# manifest lookup, vacuum is a manifest-driven delete of expired ones.
# Single-writer by contract (a pipeline's corpus builds are serialized
# by the orchestrator); the atomicity primitive is POSIX rename of the
# `_latest` pointer, the same one `_staged_rewrite` relies on.

def _manifest_path(table_dir: str, version: int) -> str:
    return os.path.join(table_dir, "_manifests", f"v{version:08d}.json")


def write_version(
    df: DataFrame,
    table_dir: str,
    *,
    note: str = "",
    now_ms: int | None = None,
) -> dict:
    """Commit ``df`` as the next version of the table at ``table_dir``.
    Returns the manifest dict (``version``, ``snapshot``, ``n_rows``,
    ``ts_ms``, ``note``). The snapshot lands fully before any manifest
    names it, so a crash mid-write leaves no visible half-version."""
    os.makedirs(os.path.join(table_dir, "_manifests"), exist_ok=True)
    version = latest_version(table_dir) + 1
    snap_rel = f"snap-v{version:08d}"
    snap = os.path.join(table_dir, snap_rel)
    df.write.mode("errorifexists").parquet(snap)
    n_rows = df.sparkSession.read.parquet(snap).count()
    manifest = {
        "version": version,
        "snapshot": snap_rel,
        "n_rows": n_rows,
        "ts_ms": int(_time.time() * 1000) if now_ms is None else now_ms,
        "note": note,
    }
    mpath = _manifest_path(table_dir, version)
    tmp = mpath + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.rename(tmp, mpath)  # manifest visible atomically
    lat_tmp = os.path.join(table_dir, "_latest.tmp")
    with open(lat_tmp, "w") as f:
        f.write(str(version))
    os.rename(lat_tmp, os.path.join(table_dir, "_latest"))
    return manifest


def latest_version(table_dir: str) -> int:
    """Current version number, 0 if the table has no commits."""
    try:
        with open(os.path.join(table_dir, "_latest")) as f:
            return int(f.read().strip())
    except FileNotFoundError:
        return 0


def read_manifest(table_dir: str, version: int | None = None) -> dict:
    v = latest_version(table_dir) if version is None else version
    if v < 1:
        raise FileNotFoundError(f"no committed versions at {table_dir}")
    try:
        with open(_manifest_path(table_dir, v)) as f:
            return json.load(f)
    except FileNotFoundError:
        raise FileNotFoundError(
            f"version {v} does not exist at {table_dir} "
            f"(latest is {latest_version(table_dir)}, or it was vacuumed)"
        ) from None


def read_version(
    spark: SparkSession, table_dir: str, version: int | None = None
) -> DataFrame:
    """Time travel: the table AS OF ``version`` (default: latest) as a
    plain parquet scan of that immutable snapshot — full predicate
    pushdown / column pruning apply, nothing is special at read time."""
    m = read_manifest(table_dir, version)
    return spark.read.parquet(os.path.join(table_dir, m["snapshot"]))


def history(table_dir: str) -> list[dict]:
    """All retained manifests, oldest first."""
    mdir = os.path.join(table_dir, "_manifests")
    if not os.path.isdir(mdir):
        return []
    out = []
    for name in sorted(os.listdir(mdir)):
        if name.endswith(".json"):
            with open(os.path.join(mdir, name)) as f:
                out.append(json.load(f))
    return out


def vacuum_versions(table_dir: str, *, keep_last: int = 2) -> list[int]:
    """Delete snapshots (and manifests) older than the newest
    ``keep_last`` versions; returns the removed version numbers. The
    latest version is always retained."""
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    versions = [m["version"] for m in history(table_dir)]
    doomed = versions[:-keep_last] if len(versions) > keep_last else []
    for v in doomed:
        m = read_manifest(table_dir, v)
        snap = os.path.join(table_dir, m["snapshot"])
        if os.path.isdir(snap):
            shutil.rmtree(snap)
        os.remove(_manifest_path(table_dir, v))
    return doomed


def optimize_table(
    spark: SparkSession,
    path: str,
    zorder_cols: list[str],
    *,
    bits: int = 16,
    num_files: int = 8,
) -> dict:
    """``OPTIMIZE ... ZORDER BY`` for a plain parquet table: rewrite
    ``path`` compacted to ``num_files`` files clustered on the Morton
    key of ``zorder_cols``, through a staged swap — the live table is
    never overwritten in place, and a row-count parity check aborts
    the swap leaving it untouched. After the rewrite, parquet min/max
    stats prune files for predicates on ANY z-ordered column (the
    bounding-box property pytest-proven in test_layout).

    The maintenance move that keeps a long-lived 100 TB corpus
    scannable: incremental appends degrade both file count and
    clustering; this restores them in one pass. Returns
    ``{rows, files_before, files_after}``.
    """
    from vector_indexer_spark.operators.layout import (  # noqa: PLC0415
        write_zordered,
    )

    def _pq_files(p: str) -> int:
        total = 0
        for root, _dirs, files in os.walk(p):
            total += sum(1 for f in files if f.endswith(".parquet"))
        return total

    staging = f"{path}__optimize__staging"
    backup = f"{path}__optimize__backup"
    if os.path.exists(staging):
        shutil.rmtree(staging)
    if os.path.exists(backup):
        if not os.path.exists(path):
            os.rename(backup, path)  # recover a crashed earlier swap
        else:
            shutil.rmtree(backup)
    files_before = _pq_files(path)
    df = spark.read.parquet(path)
    n_before = df.count()
    write_zordered(df, staging, zorder_cols, bits=bits, num_files=num_files)
    n_after = spark.read.parquet(staging).count()
    if n_after != n_before:
        shutil.rmtree(staging)
        raise RuntimeError(
            f"optimize row-count mismatch: {n_before} -> {n_after};"
            " staging discarded, live table untouched"
        )
    os.rename(path, backup)
    os.rename(staging, path)
    shutil.rmtree(backup)
    return {
        "rows": n_before,
        "files_before": files_before,
        "files_after": _pq_files(path),
    }
