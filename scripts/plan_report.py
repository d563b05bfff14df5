"""Generate EXPLAIN.md — physical-plan evidence for the headline
operators (the .explain("formatted")-and-iterate discipline).

Usage: python scripts/plan_report.py [sf_dir]
"""

from __future__ import annotations

import sys
import tempfile

sys.path.insert(0, "/root/repo")


def _ingest_plan_df(spark, docs):
    from pyspark.sql import functions as F

    from vector_indexer_spark.api import ingest_records

    rec = docs.select(
        F.col("doc_id").alias("external_id"),
        F.array(F.col("n_chars").cast("float")).alias("values"),
    )
    return ingest_records(rec, ts_col=None, now=0)


def _sessionize_df(spark, sf_dir):
    from vector_indexer_spark.sources.files import read_events_ns
    from vector_indexer_spark.streaming.events import sessionize

    return sessionize(read_events_ns(spark, f"{sf_dir}/events.parquet"))


def _sq_search_df(spark, emb, vec):
    from pyspark.sql import functions as F

    from vector_indexer_spark.operators.sq import (
        sq_encode,
        sq_search,
        sq_train,
    )

    model = sq_train(vec)
    codes = sq_encode(vec, model)
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query")
    )
    return sq_search(codes, model, q, k=5)


def _decon_df(spark, docs):
    from pyspark.sql import functions as F

    from vector_indexer_spark.operators.dedup import decontaminate_ngram

    block = docs.filter(F.col("doc_id") >= 490).select("text")
    return decontaminate_ngram(docs, block, n=8)


def _embed_split_df(spark, docs):
    from vector_indexer_spark.operators.splits import hash_split
    from vector_indexer_spark.operators.text_analysis import hash_embed

    return hash_split(hash_embed(docs, 64), id_col="doc_id")


def _relational_probes_df(spark, idx, q):
    from vector_indexer_spark.operators.search import rank_probes_relational

    return rank_probes_relational(spark, idx, q, 4)


def _bq_search_df(spark, emb):
    from pyspark.sql import functions as F

    from vector_indexer_spark.operators.bq import BQModel, bq_encode, bq_search

    model = BQModel(thresholds=(0.0,) * 64)
    codes = bq_encode(
        emb.select(F.col("vec_id").alias("id"), F.col("embedding").alias("values")),
        model,
    )
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query")
    )
    return bq_search(codes, model, q, k=5)


def _mixture_df(spark, docs):
    from vector_indexer_spark.operators.splits import corpus_mixture

    return corpus_mixture(docs, {"src0": 2.5, "src1": 1.0})


def _pca_df(spark, vec):
    from vector_indexer_spark.operators.pca import PCAModel, pca_project

    model = PCAModel(
        mean=(0.0,) * 64,
        components=tuple(
            tuple(((i * 7 + j * 13) % 9 - 4) / 16.0 for i in range(64))
            for j in range(4)
        ),
        explained_variance=(0.0,) * 4,
    )
    return pca_project(vec, model)


def _olap_q5_df(spark, sf_dir):
    from vector_indexer_spark.operators.olap import revenue_by_nation

    return revenue_by_nation(
        spark.read.parquet(f"{sf_dir}/customer.parquet"),
        spark.read.parquet(f"{sf_dir}/orders.parquet"),
        spark.read.parquet(f"{sf_dir}/lineitem.parquet"),
        spark.read.parquet(f"{sf_dir}/nation.parquet"),
        spark.read.parquet(f"{sf_dir}/region.parquet"),
    )


def _asof_df(spark, sf_dir):
    from vector_indexer_spark.sources.files import read_events_ns
    from vector_indexer_spark.streaming.events import asof_join_prior

    ev = read_events_ns(spark, f"{sf_dir}/events.parquet")
    return asof_join_prior(ev, left_type="purchase", right_type="click")


def _salted_df(spark, docs):
    from vector_indexer_spark.operators.skew import salted_counts

    return salted_counts(docs, "source", salt_source_col="doc_id")


def _bm25_batch_df(spark, docs):
    from vector_indexer_spark.operators.text_analysis import bm25_topk_batch

    qs = spark.createDataFrame(
        [(0, ["spark", "window"]), (1, ["hash"])],
        "query_id long, terms array<string>",
    )
    return bm25_topk_batch(docs, qs, k=10)


def _interval_df(spark, sf_dir):
    from pyspark.sql import functions as F

    from vector_indexer_spark.sources.files import read_events_ns
    from vector_indexer_spark.streaming.events import interval_join

    ev = read_events_ns(spark, f"{sf_dir}/events.parquet")
    return interval_join(
        ev.filter(F.col("event_type") == "click"),
        ev.filter(F.col("event_type") == "purchase"),
    )


def _maxsim_df(spark, docs):
    from pyspark.sql import functions as F

    from vector_indexer_spark.operators.similarity import maxsim_topk
    from vector_indexer_spark.operators.text_analysis import (
        chunk_documents,
        hash_embed,
    )

    chunks = chunk_documents(docs, chunk_tokens=64, overlap=16).withColumn(
        "chunk_uid", F.col("doc_id") * 1024 + F.col("chunk_idx")
    )
    cemb = hash_embed(
        chunks, 64, text_col="chunk_text", id_col="chunk_uid"
    ).select(
        (F.col("doc_id") / 1024).cast("long").alias("doc_id"), "embedding"
    )
    q = hash_embed(docs.limit(1), 64).select(
        F.col("doc_id").alias("query_id"), F.col("embedding").alias("query")
    )
    return maxsim_topk(cemb, q, k=10, metric="dot")


def _graph_local_df(spark, sf_dir):
    import tempfile

    from pyspark.sql import functions as F

    from vector_indexer_spark.operators.graph_index import (
        build_graph_index,
        search_graph_index_local,
    )

    sub = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .filter(F.col("vec_id") < 128)
        .select("vec_id", "embedding")
    )
    gidx = build_graph_index(
        sub,
        tempfile.mkdtemp(prefix="plan_glocal_") + "/gidx",
        k=4,
        iterations=1,
        coarse_size=12,
        id_col="vec_id",
        vec_col="embedding",
    )
    q = sub.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query")
    )
    return search_graph_index_local(
        spark, gidx, sub, q, k=5, beam=8, max_hops=3, entry_fanout=4
    )


def _maxsim_ann_df(spark, sf_dir):
    import tempfile

    from pyspark.sql import functions as F

    from vector_indexer_spark.operators.index_build import build_index
    from vector_indexer_spark.operators.similarity import (
        maxsim_multivector_ann,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    toks = emb.filter(F.col("vec_id") < 200).select(
        F.expr("vec_id div 4").alias("doc_id"),
        F.col("vec_id").alias("tok_id"),
        "embedding",
    )
    idx = build_index(
        toks.select(
            F.col("tok_id").alias("id"), F.col("embedding").alias("values")
        ),
        tempfile.mkdtemp(prefix="plan_maxsim_") + "/idx",
        nlist=16,
        seed=42,
    )
    q = emb.filter(F.col("vec_id").isin(0, 1, 2, 3, 120, 121, 122, 123)).select(
        F.expr("vec_id div 4").alias("query_id"),
        F.col("vec_id").alias("qtok_id"),
        F.col("embedding").alias("query"),
    )
    return maxsim_multivector_ann(
        spark, toks, q, idx, k=10, token_k=8, n_probe=4
    )


def _q7_df(spark, sf_dir):
    from vector_indexer_spark.operators.olap import volume_shipping

    return volume_shipping(
        spark.read.parquet(f"{sf_dir}/supplier.parquet"),
        spark.read.parquet(f"{sf_dir}/lineitem.parquet"),
        spark.read.parquet(f"{sf_dir}/orders.parquet"),
        spark.read.parquet(f"{sf_dir}/customer.parquet"),
        spark.read.parquet(f"{sf_dir}/nation.parquet"),
    )


def _hard_neg_df(spark, emb):
    from pyspark.sql import functions as F

    from vector_indexer_spark.operators.similarity import (
        mine_hard_negatives,
    )

    return mine_hard_negatives(
        emb, anchors=emb.filter(F.col("vec_id") < 5), k=4
    )


def _hll_df(spark, sf_dir):
    from vector_indexer_spark.operators.sketches import hll_registers

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return hll_registers(ev, "event_id", p=12)


def _bloom_df(spark, sf_dir):
    from pyspark.sql import functions as F

    from vector_indexer_spark.operators.sketches import bloom_prefilter

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    small = ev.filter(F.col("event_type") == "purchase").select(
        "user_id"
    ).distinct()
    return bloom_prefilter(ev, small, "user_id", m_bits=4096, k_hashes=3)


def _profile_df(spark, sf_dir):
    from vector_indexer_spark.operators.profile import profile_table

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return profile_table(ev, ["event_id", "event_type", "user_id"])


def _dsir_df(spark, sf_dir):
    from pyspark.sql import functions as F

    from vector_indexer_spark.operators.text_analysis import dsir_scores

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return dsir_scores(docs, docs.filter(F.col("source") == "src0"))


def _graph_ann_df(spark, sf_dir):
    from pyspark.sql import functions as F

    from vector_indexer_spark.operators.graph import (
        graph_ann_search,
        knn_graph,
    )

    sub = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .filter(F.col("vec_id") < 128)
        .select("vec_id", "embedding")
    )
    edges = knn_graph(sub, 4, id_col="vec_id", vec_col="embedding")
    q = sub.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query")
    )
    return graph_ann_search(
        sub, edges, q, k=5, beam=4, max_hops=2,
        id_col="vec_id", vec_col="embedding",
    )


def _nn_descent_df(spark, sf_dir):
    from pyspark.sql import functions as F

    from vector_indexer_spark.operators.graph import nn_descent_knn_graph

    sub = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .filter(F.col("vec_id") < 128)
        .select("vec_id", "embedding")
    )
    return nn_descent_knn_graph(
        sub, 4, iterations=1, symmetric=False,
        id_col="vec_id", vec_col="embedding", return_distances=True,
    )


def _graph_index_df(spark, sf_dir):
    import tempfile

    from pyspark.sql import functions as F

    from vector_indexer_spark.operators.graph_index import (
        build_graph_index,
        search_graph_index,
    )

    sub = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .filter(F.col("vec_id") < 128)
        .select("vec_id", "embedding")
    )
    idx = build_graph_index(
        sub, tempfile.mkdtemp() + "/gidx", k=4,
        iterations=1, coarse_size=12,
        id_col="vec_id", vec_col="embedding",
    )
    q = sub.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query")
    )
    return search_graph_index(
        spark, idx, sub, q, k=5, beam=4, max_hops=2,
        entry_fanout=3,
    )


def _graph_sq_df(spark, sf_dir):
    import tempfile

    from pyspark.sql import functions as F

    from vector_indexer_spark.operators.graph_index import (
        build_graph_index,
        search_graph_index_sq,
    )
    from vector_indexer_spark.operators.sq import sq_encode, sq_train

    sub = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .filter(F.col("vec_id") < 128)
        .select("vec_id", "embedding")
    )
    idx = build_graph_index(
        sub, tempfile.mkdtemp() + "/gidx_sq", k=4,
        iterations=1, coarse_size=12,
        id_col="vec_id", vec_col="embedding",
    )
    model = sq_train(sub, vec_col="embedding")
    codes = sq_encode(sub, model, id_col="vec_id", vec_col="embedding")
    q = sub.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query")
    )
    return search_graph_index_sq(
        spark, idx, codes, q, model, k=5, beam=4, max_hops=2,
        entry_fanout=3, refine_factor=2, vectors=sub,
    )


def _pagerank_df(spark, sf_dir):
    from pyspark.sql import functions as F

    from vector_indexer_spark.operators.graph import pagerank

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    e1 = docs.select(
        F.col("doc_id").alias("src"),
        ((F.col("doc_id") * 13) % 500).alias("dst"),
    )
    e2 = docs.select(
        F.col("doc_id").alias("src"),
        ((F.col("doc_id") * 29) % 500).alias("dst"),
    )
    return pagerank(e1.unionByName(e2), iterations=3)


def _blend_df(spark, sf_dir):
    from pyspark.sql import functions as F

    from vector_indexer_spark.operators.profile import blend_signals

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id",
        F.col("n_chars").cast("double").alias("len_sig"),
        (((F.col("doc_id") * 37) % 101) / F.lit(101.0)).alias("q_sig"),
    )
    return blend_signals(
        docs, {"len_sig": (0.0, 800.0), "q_sig": (0.0, 1.0)}, bins=100
    )


def _training_mix_df(spark, sf_dir):
    from vector_indexer_spark.entry_queries import QUERIES

    return QUERIES["pipeline_training_mix"](spark, sf_dir)



def _incr_lsh_df(spark, sf_dir):
    from pyspark.sql import functions as F

    from vector_indexer_spark.operators.dedup import (
        banded_signatures,
        incremental_lsh_candidates,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    corpus = docs.filter(F.col("doc_id") < 60)
    delta = corpus.select((F.col("doc_id") + 10_000).alias("doc_id"), "text")
    return incremental_lsh_candidates(delta, banded_signatures(corpus))


def _token_budget_df(spark, sf_dir):
    from pyspark.sql import functions as F

    from vector_indexer_spark.operators.splits import select_token_budget

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id",
        F.col("n_chars").alias("n_tokens"),
        (((F.col("doc_id") * 37) % 101) / F.lit(101.0)).alias("quality"),
    )
    return select_token_budget(docs, 50_000)


def _cluster_kw_df(spark, sf_dir):
    from vector_indexer_spark.operators.text_analysis import cluster_keywords

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return cluster_keywords(docs, cluster_col="lang", top_k=5, min_count=3)


def _dedup_lines_df(spark, sf_dir):
    from pyspark.sql import functions as F

    from vector_indexer_spark.operators.text_analysis import dedup_lines

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    multi = docs.select(
        "doc_id",
        F.concat_ws("\n", F.col("text"), F.col("text")).alias("text"),
    )
    return dedup_lines(multi)



def _q21_df(spark, sf_dir):
    from vector_indexer_spark.operators.olap import waiting_suppliers

    return waiting_suppliers(
        spark.read.parquet(f"{sf_dir}/supplier.parquet"),
        spark.read.parquet(f"{sf_dir}/lineitem.parquet"),
        spark.read.parquet(f"{sf_dir}/orders.parquet"),
        spark.read.parquet(f"{sf_dir}/nation.parquet"),
        nation_name="NATION_7",
    )


def _latest_df(spark, sf_dir):
    from vector_indexer_spark.sources.files import read_events_ns
    from vector_indexer_spark.streaming.events import latest_by_key

    return latest_by_key(read_events_ns(spark, f"{sf_dir}/events.parquet"))


def _jaccard_df(spark, sf_dir):
    from pyspark.sql import functions as F

    from vector_indexer_spark.operators.dedup import (
        jaccard_similarity_join,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        F.col("doc_id") < 200
    )
    return jaccard_similarity_join(docs, threshold=0.4)


def _pit_df(spark, sf_dir):
    from pyspark.sql import functions as F

    from vector_indexer_spark.sources.files import read_events_ns
    from vector_indexer_spark.streaming.events import (
        point_in_time_join,
        scd2_intervals,
    )

    ev = read_events_ns(spark, f"{sf_dir}/events.parquet")
    dim = scd2_intervals(ev.filter(F.col("event_type") != "purchase"))
    facts = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    return point_in_time_join(facts, dim)


def _snapdiff_df(spark, sf_dir):
    from pyspark.sql import functions as F

    from vector_indexer_spark.operators.maintenance import snapshot_diff

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return snapshot_diff(
        ev.filter(F.col("event_id") % 7 != 0),
        ev.filter(F.col("event_id") % 5 != 0),
        ["event_id"],
        compare_cols=["value"],
    )


def _zorder_df(spark, sf_dir):
    from vector_indexer_spark.operators.layout import zorder_key_expr

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return ev.select(
        "event_id",
        "user_id",
        zorder_key_expr(["user_id", "event_id"], bits=20).alias("zkey"),
    )


def _sparse_df(spark, docs):
    from pyspark.sql import functions as F

    from vector_indexer_spark.operators.sparse import sparse_search_tokens

    q = docs.filter(F.col("doc_id") < 5)
    return sparse_search_tokens(docs, q, k=10, query_id_col="doc_id")


def _sparse_bm25_manifest_df(spark, docs):
    from pyspark.sql import functions as F

    from vector_indexer_spark.operators.sparse import (
        sparse_manifest,
        sparse_search_manifest,
    )

    q = docs.filter(F.col("doc_id") < 5)
    return sparse_search_manifest(
        sparse_manifest(docs),
        q,
        k=10,
        query_id_col="doc_id",
        weighting="bm25",
        max_postings_per_term=20,
    )


def _sparse_rescored_df(spark, docs):
    from pyspark.sql import functions as F

    from vector_indexer_spark.operators.sparse import sparse_search_tokens

    q = docs.filter(F.col("doc_id") < 5)
    return sparse_search_tokens(
        docs, q, k=10, query_id_col="doc_id",
        max_postings_per_term=20, rescore_shortlist=30,
    )


def _ivfbq_df(spark, emb):
    from pyspark.sql import functions as F

    from vector_indexer_spark.operators.ivfbq import (
        ivfbq_encode,
        ivfbq_search,
        ivfbq_train_scales,
    )

    cents = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").alias("cvec"),
    )
    # fixture assignment (modular) — the plan shape is what matters here
    assigned = emb.select(
        F.col("vec_id").alias("id"),
        (F.col("vec_id") % 16).alias("cluster_id"),
        F.col("embedding").alias("values"),
    )
    codes = ivfbq_encode(assigned, cents)
    scales = ivfbq_train_scales(assigned, cents)
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query")
    )
    return ivfbq_search(codes, cents, q, k=5, n_probe=4, scales=scales)


def _rabitq_model():
    import numpy as np

    from vector_indexer_spark.operators.rabitq import (
        RaBitQModel,
        hadamard_rotation,
    )

    mat = hadamard_rotation(64, seed=7)
    rng = np.random.default_rng(99)
    cent = tuple(float(v) for v in np.round(rng.uniform(-0.5, 0.5, 64), 3))
    return RaBitQModel(
        centroid=cent,
        rotation=tuple(tuple(float(x) for x in r) for r in mat),
        seed=7,
    )


def _rabitq_df(spark, emb):
    from pyspark.sql import functions as F

    from vector_indexer_spark.operators.rabitq import (
        rabitq_encode,
        rabitq_search,
    )

    model = _rabitq_model()
    vec = emb.select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("values")
    )
    codes = rabitq_encode(vec, model)
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query")
    )
    return rabitq_search(codes, model, q, k=5)


def _ivf_rabitq_df(spark, emb):
    from pyspark.sql import functions as F

    from vector_indexer_spark.operators.rabitq import (
        ivf_rabitq_encode,
        ivf_rabitq_search,
    )

    model = _rabitq_model()
    cents = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").alias("cvec"),
    )
    assigned = emb.select(
        F.col("vec_id").alias("id"),
        (F.col("vec_id") % 16).alias("cluster_id"),
        F.col("embedding").alias("values"),
    )
    codes = ivf_rabitq_encode(assigned, cents, model.rotation)
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query")
    )
    return ivf_rabitq_search(codes, cents, q, model.rotation, k=5, n_probe=4)


def _bq_adc_df(spark, emb, vec):
    from pyspark.sql import functions as F

    from vector_indexer_spark.operators.bq import (
        BQModel,
        bq_adc_search,
        bq_encode,
    )

    model = BQModel(thresholds=(0.0,) * 64)
    codes = bq_encode(vec, model)
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query")
    )
    return bq_adc_search(codes, model, q, k=5)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    from pyspark.sql import functions as F

    from vector_indexer_spark.operators import dedup, text_analysis
    from vector_indexer_spark.operators.index_build import build_index
    from vector_indexer_spark.operators.knn import knn_exact
    from vector_indexer_spark.plans import audit
    from vector_indexer_spark.session import get_spark

    spark = get_spark(app_name="plan-report")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    vec = emb.select(F.col("vec_id").alias("id"), F.col("embedding").alias("values"))
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query")
    )
    idx = build_index(vec, tempfile.mkdtemp() + "/idx", nlist=16, seed=42)
    pruned = idx.vectors(spark).where(
        F.col("shard_id").isin([0, 1]) & F.col("cluster_id").isin([0, 1, 2, 3])
    )

    from vector_indexer_spark.streaming.ingest import assign_and_shard

    add_batch = emb.filter(F.col("vec_id") >= 490).select(
        (F.col("vec_id") + 10_000).alias("id"),
        F.col("embedding").alias("values"),
    )

    sections = [
        (
            "Incremental add (assign-and-shard append body)",
            "The frame add_vectors appends: Arrow-batched centroid argmin "
            "over the NEW batch only, broadcast cluster→shard map, one "
            "shuffle on shard_id. The live table is never read or "
            "rewritten; compact_index later restores the file layout.",
            assign_and_shard(add_batch, idx)
            .repartition("shard_id")
            .sortWithinPartitions("shard_id", "cluster_id"),
        ),
        (
            "Exact kNN (native path)",
            "Query batch broadcast against the vector scan; fold-left dist2 "
            "inside codegen; window top-k. The vector table never shuffles.",
            knn_exact(emb, q, k=5, id_col="vec_id", vec_col="embedding", method="native"),
        ),
        (
            "IVF pruned candidate scan",
            "Literal probe predicates: shard_id prunes Hive partitions, "
            "cluster_id pushes to parquet row-group stats (rows are "
            "cluster-sorted inside each shard file).",
            pruned,
        ),
        (
            "Exact dedup groups",
            "sha256 hash-groupBy — exactly one exchange, partial "
            "aggregation map-side.",
            dedup.exact_dup_groups(docs),
        ),
        (
            "MinHash signatures",
            "posexplode + window-lead shingling (codegen) into 16 "
            "map-side-combinable MIN aggregates.",
            dedup.minhash_sig_columns(docs),
        ),
        (
            "Text stats",
            "Scan-local projection: zero shuffles, full whole-stage codegen.",
            text_analysis.text_stats(docs),
        ),
        (
            "LSH candidate pairs (skew-guarded)",
            "Banding excludes sentinel signatures; oversized buckets are "
            "removed via map-side-combined count + broadcast anti-join — "
            "note: no single-partition exchange, no cartesian.",
            dedup.lsh_candidate_pairs(docs),
        ),
        (
            "Ingest ordinals (distributed)",
            "Range-partitioned sort + per-partition row_number + offset "
            "join — no Exchange SinglePartition (the old global-window "
            "shape serialized the frame through one task).",
            _ingest_plan_df(spark, docs),
        ),
        (
            "Gap sessionization",
            "lag/cumsum window then (user, session) aggregation — ONE "
            "exchange: the aggregation's distribution requirement is "
            "satisfied by the window's hash partitioning on the key "
            "subset.",
            _sessionize_df(spark, sf_dir),
        ),
        (
            "SQ8 compressed search (arrow path)",
            "Codes-only scan (column pruning drops the raw vectors), "
            "per-partition decode + GEMM top-k, winners-only shuffle "
            "into the global rank.",
            _sq_search_df(spark, emb, vec),
        ),
        (
            "8-gram decontamination",
            "Eval-set distinct shingles broadcast; corpus anti-joined on "
            "exploded shingle hits — the 100 TB corpus text itself never "
            "shuffles.",
            _decon_df(spark, docs),
        ),
        (
            "Hash-split + feature-hash embedding",
            "hash_embed is explode + codegen conditional-sum aggregation "
            "(map-side combine, docs x dim shuffle volume) plus the "
            "zero-doc spine join; the split bucket is a scan-local "
            "projection on top.",
            _embed_split_df(spark, docs),
        ),
        (
            "Relational probe ranking (no centroid matrix)",
            "Probe ranking as knn_exact over the persisted centroid "
            "TABLE: query batch broadcast, per-partition top-n_probe "
            "map-side combine, nlist-bounded shard-map broadcast join — "
            "no full matrix on the driver or any executor.",
            _relational_probes_df(spark, idx, q),
        ),
        (
            "Top n-gram concentration (Gopher repetition rule)",
            "Scan-side shingling, one map-side-combined (doc, gram) "
            "count, per-doc leader, join to scan-local char totals.",
            text_analysis.top_ngram_concentration(docs),
        ),
        (
            "PII scrub + Gopher quality rules",
            "regexp_count/regexp_replace chain and array-fold signals — "
            "scan-local, zero shuffle, bounded by scan bandwidth.",
            text_analysis.gopher_quality(text_analysis.redact_pii(docs)),
        ),
        (
            "Binary-quantized Hamming search",
            "Codes packed by a codegen fold; query codes broadcast; "
            "bit_count(xor) scoring JVM-side; window top-k.",
            _bq_search_df(spark, emb),
        ),
        (
            "Sequence packing (4 streams)",
            "Window cumsum over hash-routed packing streams — exactly "
            "one exchange on the stream key.",
            text_analysis.pack_sequences(docs, budget=256, n_streams=4),
        ),
        (
            "Corpus mixture (fractional epochs)",
            "Copy counts from the (seed,id) bucket; sequence explode is "
            "scan-local — zero shuffle.",
            _mixture_df(spark, docs),
        ),
        (
            "PCA projection (native folds)",
            "One deterministic fold per component over the scan — zero "
            "shuffle, whole-stage codegen.",
            _pca_df(spark, vec),
        ),
        (
            "OLAP Q5 revenue by nation",
            "region→nation broadcast chain, date band pushed to the "
            "orders scan, one fact-fact shuffle on orderkey, "
            "integer-cent map-side-combined sums.",
            _olap_q5_df(spark, sf_dir),
        ),
        (
            "As-of join (purchase→last click)",
            "Carried-state window: ONE exchange on user_id, no "
            "range-join candidate explosion, no join operator at all.",
            _asof_df(spark, sf_dir),
        ),
        (
            "BM25 top-k",
            "Scan-local per-term tf (no posting-list explode), 1-row "
            "stats broadcast, TakeOrdered top-k.",
            text_analysis.bm25_topk(docs, ["spark", "hash"], k=10),
        ),
        (
            "Salted per-key counts",
            "Two bounded exchanges: (key, salt) partials then key "
            "combine — a hot key fans out over n_salts reducers.",
            _salted_df(spark, docs),
        ),
        (
            "Batched BM25 (inverted index)",
            "Corpus postings semi-joined against the broadcast query "
            "vocabulary — the shuffle carries matching postings only; "
            "integer-nano contributions make the sums order-free.",
            _bm25_batch_df(spark, docs),
        ),
        (
            "Interval join (click→purchase window)",
            "Equi-join on user with the time band as residual — "
            "candidates bounded per user, never a time-band cartesian.",
            _interval_df(spark, sf_dir),
        ),
        (
            "OLAP Q7 bilateral volume shipping",
            "Nation-pair filter broadcasts down both dimension chains; "
            "ship-date band pushed to the lineitem scan; ONE fact-fact "
            "shuffle on orderkey; cross-pair predicate is a codegen "
            "filter, never a join.",
            _q7_df(spark, sf_dir),
        ),
        (
            "Hard-negative mining (brute path)",
            "knn over-fetch k+1, self dropped, window re-rank over "
            "<= k+1 rows per anchor. The ANN path swaps the scan for "
            "the probe-pruned index read.",
            _hard_neg_df(spark, emb),
        ),
        (
            "Chunk MaxSim (late interaction)",
            "Scan-local chunk scoring vs broadcast queries, then one "
            "map-side-combinable MAX per (query, doc).",
            _maxsim_df(spark, docs),
        ),
        (
            "ANN-accelerated multi-vector MaxSim (PLAID shape)",
            "Query tokens route through the partition-pruned IVF probe "
            "scan; hits (nq_tokens x token_k) and the candidate doc set "
            "carry EXPLICIT broadcast hints, so the doc-token table "
            "joins without shuffling; its only exchanges are the two "
            "map-side-combinable aggregations (per-token MAX, per-doc "
            "SUM) and the final ranking window.",
            _maxsim_ann_df(spark, sf_dir),
        ),
        (
            "HyperLogLog registers",
            "ONE map-side-combined MAX aggregation over the scan; "
            "output bounded at 2^p rows whatever the input — the "
            "COUNT(DISTINCT) replacement at warehouse scale.",
            _hll_df(spark, sf_dir),
        ),
        (
            "Bloom-join prefilter",
            "Bit set built from the small side's keys, broadcast; the "
            "big side filters scan-locally BEFORE the shuffle join — "
            "no exchange of big-side rows that can't match.",
            _bloom_df(spark, sf_dir),
        ),
        (
            "Table profiler",
            "All column stats in ONE aggregation pass (expand for the "
            "exact distincts), unpivoted in-plan with stack() — never "
            "a per-column job.",
            _profile_df(spark, sf_dir),
        ),
        (
            "DSIR importance scores",
            "Two vocabulary-sized aggregations, token-keyed join, one "
            "per-doc sum; the 1-row stats frame broadcasts. Corpus "
            "text explodes exactly once.",
            _dsir_df(spark, sf_dir),
        ),
        (
            "OLAP Q21 waiting suppliers (EXISTS/NOT EXISTS)",
            "Decorrelated to left-semi + left-anti hash joins on the "
            "SAME orderkey exchange; probe sides carry (orderkey, "
            "suppkey) only.",
            _q21_df(spark, sf_dir),
        ),
        (
            "CDC latest-by-key",
            "WindowGroupLimit (Partial) below the key exchange: each "
            "map task forwards one candidate row per key, not the "
            "full history.",
            _latest_df(spark, sf_dir),
        ),
        (
            "Z-order layout key",
            "Morton interleave as pure shift/mask codegen; the write "
            "is one range exchange + in-partition sort, after which "
            "parquet min/max stats prune on EVERY z-ordered column.",
            _zorder_df(spark, sf_dir),
        ),
        (
            "Exact Jaccard join (prefix filtering)",
            "Rarest-first global token order; only the (1-t)-fraction "
            "prefix explodes; candidate equi-join on rare prefix "
            "tokens + length filter; exact verify on candidates only.",
            _jaccard_df(spark, sf_dir),
        ),
        (
            "Point-in-time dimension join",
            "Union of dim changes and facts on one timeline, ONE key "
            "exchange, carry-forward window — never facts x history.",
            _pit_df(spark, sf_dir),
        ),
        (
            "Snapshot CDC diff",
            "Full-outer hash join on the key; with both snapshots "
            "bucketed it degrades to zero-shuffle sort-merge.",
            _snapdiff_df(spark, sf_dir),
        ),
        (
            "Incremental LSH candidates (delta vs manifest)",
            "Only the delta pays signatures; the corpus side is the "
            "persisted banded manifest, joined on (band, bucket) — "
            "never a corpus self-join. Union-side bucket cap via a "
            "broadcast anti-join.",
            _incr_lsh_df(spark, sf_dir),
        ),
        (
            "Token-budget corpus selection",
            "Bins-sized ledger cumsum + whole-bin keeps; only the "
            "single cut bin pays a prefix window, PARTITIONED by the "
            "bin — no corpus-wide single-partition window.",
            _token_budget_df(spark, sf_dir),
        ),
        (
            "Corpus-map cluster keywords",
            "One scan-local token explode; vocab-keyed count "
            "shuffles; broadcast cluster totals; partitioned rank "
            "filter gets a partial WindowGroupLimit.",
            _cluster_kw_df(spark, sf_dir),
        ),
        (
            "Within-doc repeated-line removal",
            "Pure scan-local array expressions (split, positional "
            "keep-first filter, rejoin): ZERO exchanges in the plan.",
            _dedup_lines_df(spark, sf_dir),
        ),
        (
            "Integer-exact PageRank (3 iterations)",
            "One rank-table shuffle + map-side-combined SUM per "
            "round; integer micros with true `div`, so no float "
            "reassociation anywhere. The rank frame is "
            "localCheckpoint-ed per round (r6), so the returned plan "
            "is a constant-size materialized-RDD scan regardless of "
            "iteration count.",
            _pagerank_df(spark, sf_dir),
        ),
        (
            "Signal blend (bin-ledger percentiles)",
            "Per-signal bins-sized ledgers broadcast back; no "
            "corpus-wide single-partition window.",
            _blend_df(spark, sf_dir),
        ),
        (
            "Training-mix pipeline (5 stages)",
            "quality scan -> hash-window dedup -> bin-ledger budget "
            "selection -> scan-local split stamp; the stages reuse "
            "one corpus exchange where keys align.",
            _training_mix_df(spark, sf_dir),
        ),
        (
            "Graph-ANN beam search (final hop + top-k)",
            "Hop-synchronous beam over the k-NN graph: per hop one "
            "node-key shuffle of beam-by-degree candidate rows, the "
            "query batch broadcast, visited-set anti-join; shown is "
            "the accumulated plan after 2 hops.",
            _graph_ann_df(spark, sf_dir),
        ),
        (
            "Two-layer graph index search (coarse routing + seeded beam)",
            "The persisted HNSW-shaped index: coarse-layer beam over "
            "the hash-spread sample routes each query; its per-query "
            "shortlist seeds the layer-0 beam (entry_df). State frames "
            "are localCheckpoint-truncated per hop — constant plan "
            "size; shown is the final accumulated plan.",
            _graph_index_df(spark, sf_dir),
        ),
        (
            "Quantized graph traversal + exact refine (DiskANN shape)",
            "Beam-walk on SQ8 reconstructions (scan-local affine "
            "Catalyst expression), refine_factor*k shortlist BROADCAST "
            "against the raw vector table for the exact re-rank — the "
            "big side never shuffles; both exchanges are "
            "query-batch-sized windows.",
            _graph_sq_df(spark, sf_dir),
        ),
        (
            "NN-Descent k-NN graph (init + 1 round)",
            "Tri-hash bucket init (three self-joins on modular-hash "
            "keys), neighbor-of-neighbor expansion, per-src top-k "
            "window; candidates bounded at n*k^2 per round — the "
            "linear-scale alternative to the O(n^2) exact graph.",
            _nn_descent_df(spark, sf_dir),
        ),
        (
            "Sparse retrieval (inverted-index posting join)",
            "Both sides explode scan-locally to (id, term, w) postings; "
            "the query postings are BROADCAST into the term join, so the "
            "doc posting table never shuffles before the (query, doc) "
            "partial aggregation (map-side combined); integer-micros "
            "order-free scores; window top-k on aggregate-sized rows.",
            _sparse_df(spark, docs),
        ),
        (
            "Sparse BM25 over the posting manifest (skew-safe cap)",
            "df/N/avgdl derive from the manifest postings — the per-doc "
            "length is a WINDOW SUM over the tf frame (no doc-keyed "
            "broadcast join anywhere: a doc-length table is corpus-"
            "sized); the champion cap is the two-stage salted rank "
            "(Window on (term, __salt), filter, Window on term) so a "
            "hot term spreads over 32 tasks before its bounded global "
            "rank.",
            _sparse_bm25_manifest_df(spark, docs),
        ),
        (
            "Sparse cap+rescore tier (shortlist select, full rescore)",
            "The capped join only SELECTS a per-query shortlist; the "
            "returned top-k rescore those docs' FULL postings. The "
            "rescore joins the posting table against the BROADCAST "
            "(query_id, doc_id) candidate pair set (bounded: nq x "
            "shortlist) and the broadcast query postings on (query_id, "
            "term) — the posting table never shuffles and hot-term "
            "fan-out stays cap-bounded in the selection stage.",
            _sparse_rescored_df(spark, docs),
        ),
        (
            "IVF-BQ scaled ADC search (1-bit pruned scan)",
            "Probe ranking on the broadcast centroid table; candidates = "
            "codes JOIN broadcast(probes) — the 1-bit codes table never "
            "shuffles; the distance estimator (|q-c|^2 - 2rho*(q-c).s + "
            "d*rho^2) is a flat codegen fold over literal shifts plus two "
            "broadcast joins (centroids, nlist-sized scales).",
            _ivfbq_df(spark, emb),
        ),
        (
            "BQ asymmetric ADC (flat 1-bit, query stays float)",
            "Codes-only scan (raw vectors pruned), broadcast query batch, "
            "one flat codegen fold of +/-q_j terms per candidate; only "
            "the per-query window exchanges rows.",
            _bq_adc_df(spark, emb, vec),
        ),
        (
            "RaBitQ estimator search (rotated 1-bit + factors)",
            "Codes+factors-only scan (the raw vector table is never "
            "read), broadcast rotated query batch; the unbiased "
            "<obar,u>/<obar,o> estimator is one flat codegen fold of "
            "bit-selected u_j terms plus the stored norm/fidelity "
            "doubles; only the per-query window exchanges rows.",
            _rabitq_df(spark, emb),
        ),
        (
            "IVF-RaBitQ pruned search (per-cluster centering)",
            "Probe ranking on the broadcast centroid table; per-(query, "
            "probed-cluster) rotated factors computed on the bounded "
            "probe frame; candidates = codes JOIN broadcast(prep) — the "
            "codes+factors table never shuffles (no SortMergeJoin).",
            _ivf_rabitq_df(spark, emb),
        ),
        (
            "Graph local search (fits-one-box regime)",
            "The whole two-layer walk is ONE mapInPandas over query "
            "partitions; the only exchange is the query-batch "
            "round-robin (queries scale out embarrassingly). Index "
            "state (CSR edges + vector matrix + coarse ids) rides a "
            "single sc.broadcast variable — no per-hop jobs, no "
            "vector-table shuffle — and the query-side filter is "
            "pushed to the parquet scan.",
            _graph_local_df(spark, sf_dir),
        ),
    ]

    out = [
        "# EXPLAIN — physical plans of the headline operators",
        "",
        f"Generated by `scripts/plan_report.py` at `{sf_dir}`. Each section",
        "shows the plan-audit summary (see `vector_indexer_spark/plans/audit.py`)",
        "and the executed plan. Regenerate after any operator change.",
        "",
    ]
    for title, note, df in sections:
        s = audit.plan_summary(df)
        out += [
            f"## {title}",
            "",
            note,
            "",
            f"- shuffles: **{s['shuffles']}**, broadcasts: **{s['broadcasts']}**, "
            f"codegen spans: **{s['codegen_spans']}**, cartesian: **{s['cartesian']}**",
            f"- PartitionFilters: `{s['partition_filters']}`",
            f"- PushedFilters: `{s['pushed_filters']}`",
            "",
            "```",
            audit.executed_plan(df)[:3000],
            "```",
            "",
        ]
    with open("/root/repo/EXPLAIN.md", "w") as f:
        f.write("\n".join(out))
    print(f"wrote EXPLAIN.md ({len(sections)} sections)")


if __name__ == "__main__":
    main()
