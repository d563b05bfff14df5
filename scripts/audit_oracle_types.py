"""Typed audit of every ORACLE_SQL declaration.

The driver's correctness gate hashes TYPED arrow batches, so a DuckDB
oracle whose final projection emits HUGEINT (bare ``SUM(<integer>)``),
DECIMAL, or DATE will hash-mismatch a Spark result whose values are
identical but typed BIGINT/DOUBLE/VARCHAR. This audit binds each oracle
with ``DESCRIBE <sql>`` (no execution) and flags any output column whose
DuckDB type is not in the hash-stable set.

Contract (also documented in entry_queries.py): oracle final projections
must only emit BOOLEAN, BIGINT/INTEGER, DOUBLE/FLOAT, VARCHAR,
TIMESTAMP, or LIST/STRUCT thereof — never HUGEINT, DECIMAL, or DATE.

Usage: python scripts/audit_oracle_types.py [sf_dir]
Exit 0 iff zero violations.
"""

from __future__ import annotations

import sys

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

# DuckDB logical types that arrow-serialize the same way Spark's
# BIGINT/DOUBLE/VARCHAR/... do under the driver's typed hash.
_OK_SCALARS = {
    "BOOLEAN",
    "TINYINT",
    "SMALLINT",
    "INTEGER",
    "BIGINT",
    "FLOAT",
    "DOUBLE",
    "VARCHAR",
    "TIMESTAMP",
    "TIMESTAMP WITH TIME ZONE",
    "BLOB",
}


def type_ok(t: str) -> bool:
    t = t.strip()
    if t in _OK_SCALARS:
        return True
    if t.endswith("[]"):  # LIST
        return type_ok(t[:-2])
    if t.startswith("STRUCT(") and t.endswith(")"):
        # crude but sufficient: flag if any banned token appears inside
        inner = t[7:-1]
        for bad in ("HUGEINT", "DECIMAL", "DATE", "UHUGEINT"):
            if bad in inner:
                return False
        return True
    if t.startswith("MAP(") and t.endswith(")"):
        for bad in ("HUGEINT", "DECIMAL", "DATE", "UHUGEINT"):
            if bad in t:
                return False
        return True
    return False


def audit(sf_dir: str = "/root/testdata/sf0.01", quiet: bool = False):
    """Return {key: [(col, bad_type), ...]} for every violating oracle."""
    import os  # noqa: PLC0415

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    import __spark_entry__ as entry_mod

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    oracles = entry_mod.oracle_sql()
    bad: dict[str, list[tuple[str, str]]] = {}
    errors: dict[str, str] = {}
    for name, sql in oracles.items():
        try:
            desc = con.execute(f"DESCRIBE {sql}").fetchall()
        except Exception as e:  # noqa: BLE001 — fixture-path oracles may
            # not bind before the Spark side materializes the fixture;
            # those are audited by the typed compare in
            # scripts/check_correctness.py instead.
            errors[name] = f"{type(e).__name__}: {str(e).splitlines()[0][:120]}"
            continue
        viol = [(col, typ) for col, typ, *_ in desc if not type_ok(typ)]
        if viol:
            bad[name] = viol
    if not quiet:
        for name, viol in sorted(bad.items()):
            cols = ", ".join(f"{c}:{t}" for c, t in viol)
            print(f"BADTYPE {name}: {cols}")
        for name, err in sorted(errors.items()):
            print(f"SKIP (bind error) {name}: {err}")
        print(
            f"\n{len(bad)} violating oracles / {len(oracles)} total "
            f"({len(errors)} skipped on bind errors)"
        )
    return bad, errors


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    bad, _ = audit(sf)
    sys.exit(1 if bad else 0)
