"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on
DuckDB at sf0.01, then compares row count, column names, exact
(order-insensitive) values, AND arrow-level column types. The typed
comparison exists because the driver hashes TYPED arrow batches: a
DuckDB oracle emitting HUGEINT (``decimal128(38,0)``) where Spark
emits int64 hash-mismatches even when every value is equal — that
class of bug hid from the value-only compare for six rounds (13 red
rows in CORRECTNESS_r06.json, root-caused in VERDICT r6 "What's
wrong" #1). Stricter than the driver on values: floats must match
bit-for-bit.

Usage: python scripts/check_correctness.py [sf_dir] [key ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import os

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    import __spark_entry__ as entry_mod
    from vector_indexer_spark.session import get_spark

    spark = get_spark(app_name="correctness-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    failures = []
    timings = {}
    t_all = time.perf_counter()
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            sdf = fn(spark, sf_dir)
            spark_schema = sdf.schema
            got = sdf.toPandas()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: spark raised {type(e).__name__}: {e}")
            continue
        timings[name] = time.perf_counter() - t0
        if name not in oracles:
            print(
                f"ROWS-ONLY {name}: {len(got)} rows (no oracle declared)"
                f" [{timings[name]:.2f}s]"
            )
            continue
        try:
            exp_arrow = con.execute(oracles[name]).arrow()
            exp = exp_arrow.to_pandas()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: duckdb raised {type(e).__name__}: {e}")
            continue
        ok, msg = compare_types(spark_schema, exp_arrow.schema)
        if ok:
            ok, msg = compare(got, exp)
        print(
            ("PASS" if ok else "FAIL")
            + f" {name}: {msg} [{timings[name]:.2f}s]"
        )
        if not ok:
            failures.append(name)

    total = time.perf_counter() - t_all
    slow = sorted(timings.items(), key=lambda kv: -kv[1])[:10]
    print(f"\nslowest: " + ", ".join(f"{n}={t:.1f}s" for n, t in slow))
    if only:
        unknown = sorted(only - set(qs))
        if unknown:
            print(f"UNKNOWN keys (ran nothing for): {unknown}")
            failures.extend(unknown)
        n_sel = len(only)
        print(
            f"{n_sel - len(failures)}/{n_sel} selected green "
            f"(of {len(qs)} declared) in {total:.1f}s"
        )
    else:
        print(f"{len(qs) - len(failures)}/{len(qs)} green in {total:.1f}s")
    sys.exit(1 if failures else 0)


def _spark_to_arrow_kind(dt) -> str:
    """Collapse a Spark DataType to the arrow 'kind' the driver's typed
    hash distinguishes. int64 vs decimal128 is THE distinction that
    matters; timestamps compare loosely (unit/tz differences did not
    fail the driver's hash in six rounds of green timestamp queries)."""
    import pyspark.sql.types as T

    if isinstance(dt, (T.LongType,)):
        return "int64"
    if isinstance(dt, (T.IntegerType,)):
        return "int32"
    if isinstance(dt, (T.ShortType,)):
        return "int16"
    if isinstance(dt, (T.ByteType,)):
        return "int8"
    if isinstance(dt, T.DoubleType):
        return "float64"
    if isinstance(dt, T.FloatType):
        return "float32"
    if isinstance(dt, T.StringType):
        return "string"
    if isinstance(dt, T.BooleanType):
        return "bool"
    if isinstance(dt, T.BinaryType):
        return "binary"
    if isinstance(dt, T.TimestampType):
        return "timestamp"
    # Spark 3.4+ NTZ timestamps map to the same loose kind as DuckDB's
    # zone-naive 'timestamp' — without this case they would stringify as
    # 'other:timestamp_ntz' and false-FAIL a type-equal compare.
    if hasattr(T, "TimestampNTZType") and isinstance(
        dt, T.TimestampNTZType
    ):
        return "timestamp"
    if isinstance(dt, T.DateType):
        return "date"
    if isinstance(dt, T.DecimalType):
        return "decimal"
    if isinstance(dt, T.ArrayType):
        return f"list<{_spark_to_arrow_kind(dt.elementType)}>"
    if isinstance(dt, T.StructType):
        inner = ",".join(
            f"{f.name}:{_spark_to_arrow_kind(f.dataType)}" for f in dt.fields
        )
        return f"struct<{inner}>"
    return f"other:{dt.simpleString()}"


def _arrow_kind(t) -> str:
    import pyarrow as pa

    if pa.types.is_int64(t):
        return "int64"
    if pa.types.is_int32(t):
        return "int32"
    if pa.types.is_int16(t):
        return "int16"
    if pa.types.is_int8(t):
        return "int8"
    if pa.types.is_float64(t):
        return "float64"
    if pa.types.is_float32(t):
        return "float32"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_decimal(t):
        return "decimal"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{_arrow_kind(t.value_type)}>"
    if pa.types.is_struct(t):
        inner = ",".join(
            f"{t.field(i).name}:{_arrow_kind(t.field(i).type)}"
            for i in range(t.num_fields)
        )
        return f"struct<{inner}>"
    return f"other:{t}"


def compare_types(spark_schema, arrow_schema) -> tuple[bool, str]:
    """Fail on any per-column arrow-kind mismatch (driver typed-hash
    faithfulness). Columns matched by name; order handled elsewhere."""
    spark_kinds = {f.name: _spark_to_arrow_kind(f.dataType) for f in spark_schema}
    oracle_kinds = {
        arrow_schema.field(i).name: _arrow_kind(arrow_schema.field(i).type)
        for i in range(len(arrow_schema))
    }
    for col in sorted(set(spark_kinds) & set(oracle_kinds)):
        if spark_kinds[col] != oracle_kinds[col]:
            return False, (
                f"TYPE mismatch col {col}: spark {spark_kinds[col]} "
                f"vs oracle {oracle_kinds[col]}"
            )
    return True, ""


def compare(got: pd.DataFrame, exp: pd.DataFrame) -> tuple[bool, str]:
    if sorted(got.columns) != sorted(exp.columns):
        return False, f"columns differ: {list(got.columns)} vs {list(exp.columns)}"
    if len(got) != len(exp):
        return False, f"row count {len(got)} vs {len(exp)}"
    cols = sorted(got.columns)
    g = got[cols].sort_values(cols).reset_index(drop=True)
    e = exp[cols].sort_values(cols).reset_index(drop=True)
    for c in cols:
        gv, ev = g[c].to_numpy(), e[c].to_numpy()
        if gv.dtype.kind == "f" or ev.dtype.kind == "f":
            if not np.array_equal(
                gv.astype(np.float64), ev.astype(np.float64)
            ):
                bad = np.flatnonzero(gv.astype(np.float64) != ev.astype(np.float64))
                return False, (
                    f"float col {c}: {len(bad)} mismatches, first at row "
                    f"{bad[0]}: {gv[bad[0]]!r} vs {ev[bad[0]]!r}"
                )
        else:
            if not (gv.astype(object) == ev.astype(object)).all():
                bad = np.flatnonzero(gv.astype(object) != ev.astype(object))
                return False, (
                    f"col {c}: {len(bad)} mismatches, first at row {bad[0]}: "
                    f"{gv[bad[0]]!r} vs {ev[bad[0]]!r}"
                )
    return True, f"{len(got)} rows, {len(cols)} cols exact"


if __name__ == "__main__":
    main()
