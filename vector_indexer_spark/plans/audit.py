"""Physical-plan audit helpers.

The engine's 100 TB posture is enforced by *inspecting plans*, not by
hoping: every operator's tests can assert that filters reached the
scan, small sides were broadcast, and no accidental cartesian or extra
shuffle crept in. (SURVEY §4: zero custom Catalyst rules are needed —
but verifying what Catalyst chose is our job.)
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    """Final (AQE-resolved where available) physical plan text."""
    return df._jdf.queryExecution().executedPlan().toString()


def explain_formatted(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _scan_clauses(df: DataFrame, field: str) -> list[str]:
    """Contents of every ``field: [...]`` clause in the plan's scans.

    ``executedPlan.toString`` elides long scan fields mid-list (no
    closing bracket — the regex then finds nothing), so fall back to
    the formatted explain, which prints each scan field in full.
    """
    pat = rf"{field}: \[([^\]]*)\]"
    found = re.findall(pat, executed_plan(df))
    if not found:
        found = re.findall(pat, explain_formatted(df))
    return found


def partition_filters(df: DataFrame) -> list[str]:
    """Contents of every PartitionFilters clause in the plan's scans."""
    return _scan_clauses(df, "PartitionFilters")


def pushed_filters(df: DataFrame) -> list[str]:
    return _scan_clauses(df, "PushedFilters")


def has_partition_filter(df: DataFrame, col: str) -> bool:
    return any(col in f for f in partition_filters(df))


def has_pushed_filter(df: DataFrame, col: str) -> bool:
    return any(col in f for f in pushed_filters(df))


def shuffle_count(df: DataFrame) -> int:
    """Number of exchange (shuffle) operators in the plan."""
    plan = executed_plan(df)
    return len(re.findall(r"Exchange (?:hashpartitioning|rangepartitioning|RoundRobin)", plan))


def broadcast_count(df: DataFrame) -> int:
    """Number of broadcast exchanges (small-side joins)."""
    return executed_plan(df).count("BroadcastExchange")


def broadcast_inputs(df: DataFrame) -> list[str]:
    """The ``Input [...]`` column list of every BroadcastExchange in
    the formatted plan — i.e. exactly what gets shipped to every
    executor. Lets tests assert that no corpus-sized payload (e.g. a
    vector column of an unbounded relation) crosses a broadcast."""
    txt = explain_formatted(df)
    return re.findall(
        r"\(\d+\) BroadcastExchange\s*\nInput \[\d+\]: \[([^\]]*)\]", txt
    )


def codegen_span_count(df: DataFrame) -> int:
    """Number of WholeStageCodegen spans — wider is better (more of the
    plan fused into generated JVM code)."""
    return len(set(re.findall(r"WholeStageCodegen \((\d+)\)", executed_plan(df))))


def has_cartesian(df: DataFrame) -> bool:
    """True if a non-broadcast cartesian product appears — at scale
    this is almost always a bug in the candidate-generation step."""
    return "CartesianProduct" in executed_plan(df)


def plan_summary(df: DataFrame) -> dict:
    """One-call audit summary for perf reviews / bench reports."""
    return {
        "shuffles": shuffle_count(df),
        "broadcasts": broadcast_count(df),
        "codegen_spans": codegen_span_count(df),
        "cartesian": has_cartesian(df),
        "partition_filters": partition_filters(df),
        "pushed_filters": pushed_filters(df),
    }
