"""Margin-based bitext mining: planted-twin recovery, hub demotion,
mutual filtering, shortlist-restricted scoring, contracts."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from vector_indexer_spark.operators.mining import mine_bitext


def _corpora(spark, n=40, d=16, seed=5, noise=0.05, hub=False):
    """tgt = noise-perturbed copies of src (tgt_id = src_id + 1000).
    ``hub=True`` builds the hubness regime the margin exists for: the
    last 10 sources cluster tightly around a common direction (spread
    0.15) and a hub target sits AT that direction — closer to each
    clustered source (cos ≈ 0.86) than its own twin at noise 0.25
    (cos ≈ 0.7), so raw cosine routes them to the hub while the hub's
    dense neighborhood inflates the margin denominator and demotes it."""
    rng = np.random.default_rng(seed)
    X = rng.standard_normal((n, d))
    if hub:
        noise = 0.25
        c_dir = rng.standard_normal(d)
        c_dir /= np.linalg.norm(c_dir)
        X[n - 10 :] = c_dir[None, :] + 0.15 * rng.standard_normal((10, d))
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    Y = X + noise * rng.standard_normal((n, d))
    rows_s = [(int(i), [float(v) for v in X[i]]) for i in range(n)]
    rows_t = [(int(i + 1000), [float(v) for v in Y[i]]) for i in range(n)]
    if hub:
        rows_t.append((9999, [float(v) for v in c_dir]))
    src = spark.createDataFrame(rows_s, "id long, values array<double>")
    tgt = spark.createDataFrame(rows_t, "id long, values array<double>")
    return src, tgt


def test_planted_twins_recovered(spark):
    src, tgt = _corpora(spark)
    got = mine_bitext(src, tgt, k=4, threshold=1.0).collect()
    assert len(got) == 40
    for r in got:
        assert r.tgt_id == r.src_id + 1000
        assert r.margin > 1.0
        assert r.cos > 0.9


def test_mutual_filters_hub_collisions(spark):
    """With a corpus-mean hub in the target side, forward mining may
    route several sources to the hub; mutual mining keeps at most ONE
    hub pair (the hub can be best for only one source) and every other
    mined pair is a true twin."""
    src, tgt = _corpora(spark, seed=7, hub=True)
    fwd = mine_bitext(src, tgt, k=4, threshold=0.0)
    mut = mine_bitext(src, tgt, k=4, threshold=0.0, mutual=True).collect()
    hub_pairs = [r for r in mut if r.tgt_id == 9999]
    assert len(hub_pairs) <= 1
    # the 30 unclustered sources pair with their twins; the 10
    # clustered ones may legitimately cross-pair inside the cluster
    twins30 = [
        r for r in mut if r.src_id < 30 and r.tgt_id == r.src_id + 1000
    ]
    assert len(twins30) >= 25
    # mutual is a subset of forward
    fset = {(r.src_id, r.tgt_id) for r in fwd.collect()}
    assert all((r.src_id, r.tgt_id) in fset for r in mut)


def test_margin_beats_raw_cosine_on_hub(spark):
    """The point of the margin: the hub's NEIGHBORHOOD is dense, so
    its denominator is large and its margin is demoted relative to raw
    cosine. Count sources whose best-raw-cos target is the hub but
    whose best-margin target is their twin."""
    src, tgt = _corpora(spark, seed=7, hub=True)
    mined = {
        r.src_id: r.tgt_id
        for r in mine_bitext(src, tgt, k=4, threshold=0.0).collect()
    }
    from vector_indexer_spark.functions.distance import cosine_expr

    s = src.select(F.col("id").alias("src_id"), F.col("values").alias("sv"))
    t = tgt.select(F.col("id").alias("tgt_id"), F.col("values").alias("tv"))
    from pyspark.sql import Window

    w = Window.partitionBy("src_id").orderBy(F.col("c").desc(), "tgt_id")
    raw = {
        r.src_id: r.tgt_id
        for r in s.crossJoin(F.broadcast(t))
        .select("src_id", "tgt_id", cosine_expr("sv", "tv").alias("c"))
        .withColumn("r", F.row_number().over(w))
        .filter(F.col("r") == 1)
        .collect()
    }
    hub_raw = sum(1 for v in raw.values() if v == 9999)
    hub_margin = sum(1 for v in mined.values() if v == 9999)
    assert hub_margin < hub_raw  # margin demotes the hub
    # and margin recovers >= as many twins as raw cosine
    tw_raw = sum(1 for k_, v in raw.items() if v == k_ + 1000)
    tw_m = sum(1 for k_, v in mined.items() if v == k_ + 1000)
    assert tw_m >= tw_raw


def test_candidates_shortlist_path(spark):
    src, tgt = _corpora(spark)
    # shortlist: each source with its twin and 3 decoys
    cand = [
        (int(i), int(i + 1000)) for i in range(40)
    ] + [(int(i), int(((i + j) % 40) + 1000)) for i in range(40) for j in (1, 2, 3)]
    cdf = spark.createDataFrame(cand, "src_id long, tgt_id long")
    got = mine_bitext(
        src, tgt, k=4, threshold=1.0, candidates=cdf
    ).collect()
    assert len(got) == 40
    assert all(r.tgt_id == r.src_id + 1000 for r in got)


def test_candidates_path_no_corpus_vector_broadcast(spark):
    """The ``candidates`` path exists for TWO web-scale sides: neither
    corpus's vector relation may be broadcast (the r9 plan shipped the
    full target table to every executor — guaranteed OOM at CCMatrix
    scale). Only bounded candidate-derived frames (the k-neighborhood
    sums, the mutual best table) may broadcast — and none of those
    carries a vector column. Same lock pattern as the sparse BM25
    doc-length test (test_plans.py)."""
    from vector_indexer_spark.plans import audit

    src, tgt = _corpora(spark)
    cand = [(int(i), int(i + 1000)) for i in range(40)]
    cdf = spark.createDataFrame(cand, "src_id long, tgt_id long")
    conf = spark.conf
    old = conf.get("spark.sql.autoBroadcastJoinThreshold")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        for mutual in (False, True):
            out = mine_bitext(
                src, tgt, k=4, threshold=0.0, mutual=mutual,
                candidates=cdf,
            )
            for cols in audit.broadcast_inputs(out):
                assert "__sv" not in cols and "__tv" not in cols, (
                    "corpus vector relation crosses a broadcast: " + cols
                )
    finally:
        conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_threshold_and_contracts(spark):
    src, tgt = _corpora(spark)
    assert mine_bitext(src, tgt, k=4, threshold=10.0).count() == 0
    with pytest.raises(ValueError, match="positive"):
        mine_bitext(src, tgt, k=0)


def test_deterministic(spark):
    src, tgt = _corpora(spark, noise=0.4, seed=11)
    a = sorted(
        (r.src_id, r.tgt_id, r.margin)
        for r in mine_bitext(src, tgt, k=3).collect()
    )
    b = sorted(
        (r.src_id, r.tgt_id, r.margin)
        for r in mine_bitext(src, tgt, k=3).collect()
    )
    assert a == b
