"""Import-time audit of ORACLE_SQL output types.

The driver's correctness gate hashes TYPED arrow batches, so an oracle
whose final projection emits HUGEINT/DECIMAL/DATE (or any type Spark
never produces) hash-mismatches even when every value is equal. This
test binds every declared oracle with ``DESCRIBE`` against the sf0.001
tables (types are scale-independent) and fails on any violation — the
regression lock for VERDICT r6 "What's wrong" #1 (13 official red rows
from bare ``SUM(<integer>)`` → HUGEINT).

No SparkSession needed: DESCRIBE only binds, never executes.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.audit_oracle_types import audit, type_ok  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason=f"test data dir {SF_DIR} missing"
)
def test_all_oracles_emit_hash_stable_types():
    bad, errors = audit(SF_DIR, quiet=True)
    assert not errors, f"oracles failed to bind: {errors}"
    assert not bad, (
        "oracles emitting HUGEINT/DECIMAL/DATE in their final projection "
        f"(wrap the aggregate in CAST(... AS BIGINT/DOUBLE)): {bad}"
    )


def test_type_ok_rules():
    assert type_ok("BIGINT")
    assert type_ok("DOUBLE")
    assert type_ok("VARCHAR")
    assert type_ok("BIGINT[]")
    assert type_ok("DOUBLE[][]")
    assert not type_ok("HUGEINT")
    assert not type_ok("DECIMAL(38,0)")
    assert not type_ok("DATE")
    assert not type_ok("HUGEINT[]")
    assert not type_ok("STRUCT(a HUGEINT, b VARCHAR)")
    assert type_ok("STRUCT(a BIGINT, b VARCHAR)")
