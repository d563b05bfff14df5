"""Skew-safe aggregation: salted two-stage rollups.

At 100 TB a handful of hot keys (one mega-domain, one boilerplate
dedup hash, one default user id) can pin a single reducer while the
other 999 executors idle. AQE's skew-join splitting handles *joins*;
for *aggregations* the classic fix is salting: split each key into
``n_salts`` deterministic sub-keys, aggregate the sub-keys (hot key's
rows now spread over ``n_salts`` reducers), then combine the
``n_salts`` partials — a second, tiny shuffle over |keys|·n_salts
rows.

Spark's hash aggregation already does map-side partial combining,
which usually absorbs skew for *algebraic* aggregates — salting earns
its keep when the per-key state is big (collect_list/sets, exact
distinct counts, large sketches) or when a window/sort follows the
group-by. The operator here is the template; its pytest + oracle
assert the salted plan is *value-identical* to the direct one.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salt_expr(col: Column | str, n_salts: int, seed: int = 13) -> Column:
    """Deterministic salt in [0, n_salts): md5 of the row's id — never
    ``rand()``, which breaks retries/speculative execution (a re-run
    task would re-salt rows differently mid-shuffle).

    Reuses the engine's shared md5 bucket (splits's 10k-bucket hash);
    the second mod is exactly uniform when ``n_salts`` divides 10 000
    and off by at most 1 part in ~1 250 otherwise — irrelevant for
    load spreading.
    """
    from vector_indexer_spark.operators.splits import _bucket_expr  # noqa: PLC0415

    return (_bucket_expr(col, seed) % n_salts).cast("int")


def salted_counts(
    df: DataFrame,
    key_col: str,
    *,
    n_salts: int = 16,
    salt_source_col: str | None = None,
) -> DataFrame:
    """Per-key row counts with bounded reducer load: stage 1 groups on
    ``(key, salt)`` (hot keys fan out over ``n_salts`` reducers),
    stage 2 sums the ≤ ``n_salts`` partials per key.

    ``salt_source_col`` picks the column the salt is derived from
    (default: a per-row unique id column is best; falling back to the
    key itself would put every row of a key in ONE salt and defeat
    the fan-out — so it is required to differ from ``key_col``).

    Returns ``(key, n_rows)`` — bit-identical to the direct
    ``groupBy(key).count()`` by associativity of integer sums.
    """
    if n_salts <= 0:
        raise ValueError("n_salts must be positive")
    if salt_source_col is None or salt_source_col == key_col:
        raise ValueError(
            "salt_source_col must name a per-row (non-key) column"
        )
    stage1 = (
        df.select(
            F.col(key_col).alias("key"),
            salt_expr(salt_source_col, n_salts).alias("__salt"),
        )
        .groupBy("key", "__salt")
        .agg(F.count("*").alias("__partial"))
    )
    return (
        stage1.groupBy("key")
        .agg(F.sum("__partial").alias("n_rows"))
    )
