"""Dump ``.explain("formatted")`` for selected declared queries.

Writes one ``<out_dir>/<key>_<suffix>.txt`` per query key so the
optimization evidence (Exchange counts, join strategies, PushedFilters,
Python-eval nodes) is committed alongside the code that produced it.

Usage:
  python scripts/dump_plans.py <repo_root> <out_dir> <suffix> <sf_dir> key [key ...]

``repo_root`` may be a git worktree of an older commit — the script
imports ``__spark_entry__`` from there, which lets the same invocation
produce ``_before`` plans (worktree at the pre-change commit) and
``_after`` plans (repo HEAD) with identical methodology.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout


def main() -> None:
    repo_root, out_dir, suffix, sf_dir = sys.argv[1:5]
    keys = sys.argv[5:]
    repo_root = os.path.abspath(repo_root)
    sys.path.insert(0, repo_root)

    import __spark_entry__ as entry_mod
    from vector_indexer_spark.session import get_spark

    spark = get_spark(app_name=f"plan-dump-{suffix}")
    qs = entry_mod.queries()
    os.makedirs(out_dir, exist_ok=True)
    for key in keys:
        if key not in qs:
            print(f"[skip] {key}: not declared in {repo_root}")
            continue
        try:
            df = qs[key](spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            path = os.path.join(out_dir, f"{key}_{suffix}.txt")
            with open(path, "w") as fh:
                fh.write(buf.getvalue())
            print(f"[ok]   {key} -> {path}")
        except Exception as exc:  # keep going; report at the end
            print(f"[FAIL] {key}: {exc}")


if __name__ == "__main__":
    main()
