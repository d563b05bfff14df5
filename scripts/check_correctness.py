"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on
DuckDB at sf0.01, then compares row count, column names, and exact
(order-insensitive) values. Stricter than the driver's value hash:
floats must match bit-for-bit.

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

    sys.path.insert(0, "/root/repo")
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
            got = fn(spark, sf_dir).toPandas()
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
            exp = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: duckdb raised {type(e).__name__}: {e}")
            continue
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
