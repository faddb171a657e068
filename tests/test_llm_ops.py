"""Unit tests for dedup/similarity operators — the approximate paths the
DuckDB oracle can't check (planted-duplicate recall, ANN recall vs brute
force, simhash behavior)."""

from __future__ import annotations

import math
import random

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from oakstore_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_near_dup_pairs,
)
from oakstore_spark.operators.similarity import (
    ann_cosine_topk,
    cosine_topk,
    embedding_near_dup_pairs,
)


@pytest.fixture(scope="module")
def docs(spark):
    base = (
        "the quick brown fox jumps over the lazy dog while the cat watches "
        "from a sunny windowsill and the birds sing in the garden outside"
    )
    rows = [
        (0, base),
        (1, base),  # exact dup of 0
        (2, base.replace("quick", "swift")),  # near dup of 0
        (3, "completely different content about databases and query engines here"),
        (4, "Totally unrelated short text."),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_exact_dedup(spark, docs):
    out = exact_dedup(docs, "doc_id", "text").toPandas()
    assert len(out) == 4  # 5 docs, one exact dup collapses
    dup_row = out[out.n_dupes > 0]
    assert len(dup_row) == 1
    assert dup_row.iloc[0]["keep_id"] == 0


def test_minhash_planted(spark, docs):
    pairs = minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.8).toPandas()
    got = {(r.id_a, r.id_b) for r in pairs.itertuples()}
    assert (0, 1) in got  # exact dup: jaccard 1.0
    assert (0, 2) in got and (1, 2) in got  # near dup
    assert all(3 not in p and 4 not in p for p in got)


def test_minhash_distributed_path_matches_driver(spark, docs):
    """Forcing the join-based distributed verify (driver_pairs_max_docs=0)
    must give exactly the driver-path pairs+jaccards: same banding, same
    prefilter, same exact verify — only the execution strategy differs
    (no corpus materialization on the driver)."""
    kw = dict(threshold=0.8, n_hashes=96, bands=12)
    drv = minhash_lsh_pairs(docs, "doc_id", "text", **kw).toPandas()
    dist = minhash_lsh_pairs(
        docs, "doc_id", "text", driver_pairs_max_docs=0, **kw
    ).toPandas()
    got_d = {(r.id_a, r.id_b): r.jaccard for r in drv.itertuples()}
    got_x = {(r.id_a, r.id_b): r.jaccard for r in dist.itertuples()}
    assert got_d.keys() == got_x.keys()
    for k in got_d:
        assert got_d[k] == pytest.approx(got_x[k])


def test_simhash(spark, docs):
    pairs = simhash_near_dup_pairs(docs, "doc_id", "text", max_hamming=8).toPandas()
    got = {(r.id_a, r.id_b): r.hamming for r in pairs.itertuples()}
    assert got[(0, 1)] == 0  # identical token sets
    assert (0, 2) in got  # one token differs -> small hamming
    assert (0, 3) not in got and (0, 4) not in got


def test_ngram_jaccard_exact(spark, docs):
    pairs = ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.8).toPandas()
    got = {(r.id_a, r.id_b): r.jaccard for r in pairs.itertuples()}
    assert got[(0, 1)] == 1.0  # exact dup
    assert (0, 2) in got and got[(0, 2)] < 1.0  # near dup, jaccard < 1
    assert all(3 not in p and 4 not in p for p in got)
    # exactness: same pairs as brute force on tiny corpus (checked via
    # symmetric difference against a pandas reference)
    import pandas as pd  # noqa: F401

    texts = {r.doc_id: r.text for r in docs.toPandas().itertuples()}

    def norm(t):
        import re

        t = re.sub(r"[^a-z0-9\s]", "", t.lower())
        return re.sub(r"\s+", " ", t).strip()

    def grams(t):
        t = norm(t)
        return {t[i : i + 3] for i in range(max(len(t) - 2, 1))}

    expect = {}
    ids = sorted(texts)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            ga, gb = grams(texts[a]), grams(texts[b])
            j = len(ga & gb) / len(ga | gb)
            if j >= 0.8:
                expect[(a, b)] = j
    assert set(got) == set(expect)
    for k in got:
        assert abs(got[k] - expect[k]) < 1e-9


def test_approx_distinct_bounded(spark, docs):
    from pyspark.sql import functions as SF

    row = (
        docs.agg(
            SF.countDistinct("doc_id").alias("exact"),
            SF.approx_count_distinct("doc_id").alias("approx"),
        )
        .collect()[0]
    )
    assert abs(row.approx - row.exact) / row.exact < 0.1


def _clustered_vectors(n_pairs: int, dim: int, seed: int = 7):
    """n_pairs base vectors + a tightly perturbed twin for each."""
    rng = random.Random(seed)
    rows = []
    for i in range(n_pairs):
        v = [rng.gauss(0, 1) for _ in range(dim)]
        nrm = math.sqrt(sum(x * x for x in v))
        v = [x / nrm for x in v]
        twin = [x + rng.gauss(0, 0.02) for x in v]
        rows.append((i * 2, v))
        rows.append((i * 2 + 1, twin))
    return rows


@pytest.fixture(scope="module")
def clustered(spark):
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]
    )
    return spark.createDataFrame(_clustered_vectors(60, 32), schema).cache()


def test_cosine_topk_finds_twins(spark, clustered):
    queries = clustered.select(F.col("vec_id").alias("query_id"), "embedding")
    out = cosine_topk(clustered, queries, k=1).toPandas()
    # each vector's nearest neighbor is its twin (ids 2i <-> 2i+1)
    twin = {int(r.query_id): int(r.vec_id) for r in out.itertuples()}
    hits = sum(1 for q, v in twin.items() if v == (q ^ 1))
    assert hits == len(twin)


def test_ann_recall_on_twins(spark, clustered):
    queries = clustered.filter(F.col("vec_id") % 2 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = ann_cosine_topk(clustered, queries, k=1, dim=32).toPandas()
    twin = {int(r.query_id): int(r.vec_id) for r in out.itertuples()}
    # cos ~0.999 twins: multi-table LSH recall should be essentially 1
    hits = sum(1 for q, v in twin.items() if v == (q ^ 1))
    assert hits >= 0.95 * 60


def test_ivf_recall_on_twins(spark, clustered):
    from oakstore_spark.operators.similarity import ivf_cosine_topk

    queries = clustered.filter(F.col("vec_id") % 2 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = ivf_cosine_topk(
        clustered, queries, k=1, dim=32, n_centroids=16, n_probe=4
    ).toPandas()
    twin = {int(r.query_id): int(r.vec_id) for r in out.itertuples()}
    # a twin is a ~0.999-cosine copy: it quantizes to the same cell, so
    # probing the query's own cell must recover it
    hits = sum(1 for q, v in twin.items() if v == (q ^ 1))
    assert hits >= 0.95 * 60


def test_embed_near_dup_twins(spark, clustered):
    import numpy as np

    pairs = embedding_near_dup_pairs(clustered, threshold=0.98, dim=32).toPandas()
    got = {(r.id_a, r.id_b) for r in pairs.itertuples()}
    # ground truth by brute force (fixture is tiny)
    rows = clustered.orderBy("vec_id").toPandas()
    V = np.stack([np.asarray(v, dtype=np.float64) for v in rows.embedding])
    V /= np.linalg.norm(V, axis=1)[:, None]
    S = V @ V.T
    ids = rows.vec_id.to_numpy()
    expected = {
        (int(ids[i]), int(ids[j]))
        for i in range(len(ids))
        for j in range(i + 1, len(ids))
        if S[i, j] >= 0.98
    }
    assert got == expected and len(expected) >= 50  # most twins qualify


def test_ann_subset_of_brute(spark, clustered):
    queries = clustered.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    brute = cosine_topk(clustered, queries, k=10).toPandas()
    ann = ann_cosine_topk(clustered, queries, k=10, dim=32).toPandas()
    # ann sims must be exact (same cosine), and ann top-1 == brute top-1
    b1 = brute[brute["rank"] == 1].set_index("query_id")["vec_id"]
    a1 = ann[ann["rank"] == 1].set_index("query_id")["vec_id"]
    assert (b1 == a1).all()


def test_chunk_documents_coverage(spark):
    from oakstore_spark.operators.text import chunk_documents

    rows = [(1, "x" * 1000), (2, "short"), (3, "y" * 500), (4, "z" * 501)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = chunk_documents(df, "doc_id", "text", chunk_chars=500, overlap_chars=100)
    pdf = out.toPandas()
    by_id = {i: g.sort_values("chunk_idx") for i, g in pdf.groupby("id")}
    # 1000 chars, stride 400: starts 1,401,801 -> 3 chunks; last is 200 chars
    assert [len(t) for t in by_id[1].chunk_text] == [500, 500, 200]
    # reassembly: drop the 100-char overlap from every chunk after the first
    full = by_id[1].chunk_text.iloc[0] + "".join(
        t[100:] for t in by_id[1].chunk_text.iloc[1:]
    )
    assert full == "x" * 1000
    assert list(by_id[2].chunk_text) == ["short"]  # shorter than one chunk
    assert len(by_id[3]) == 1  # exactly chunk-size -> one chunk
    assert len(by_id[4]) == 2  # one char over -> tail chunk (overlap+1)
    assert len(by_id[4].chunk_text.iloc[1]) == 101


def test_dedup_clusters_components(spark):
    from oakstore_spark.operators.dedup import dedup_clusters

    # two chains and a triangle: {1-2-3-4}, {10-11}, {20-21-22 triangle}
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22)],
        ["id_a", "id_b"],
    )
    out = dedup_clusters(pairs).toPandas()
    got = dict(zip(out.id, out.cluster_id))
    assert {got[1], got[2], got[3], got[4]} == {1}
    assert {got[10], got[11]} == {10}
    assert {got[20], got[21], got[22]} == {20}


def test_ngram_join_fallback_matches_broadcast(spark, docs):
    """broadcast_verify_max_docs=0 disables BOTH the gemm path and the
    broadcast verify, forcing the join-based large-corpus fallback — the
    path that actually runs at 100 TB. It must emit exactly the gated
    path's pairs and jaccards (only execution strategy differs)."""
    gated = ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.8).toPandas()
    dist = ngram_jaccard_pairs(
        docs, "doc_id", "text", threshold=0.8, broadcast_verify_max_docs=0
    ).toPandas()
    got_g = {(r.id_a, r.id_b): r.jaccard for r in gated.itertuples()}
    got_d = {(r.id_a, r.id_b): r.jaccard for r in dist.itertuples()}
    assert got_g.keys() == got_d.keys() and len(got_g) > 0
    for k in got_g:
        assert got_g[k] == pytest.approx(got_d[k])


def test_dedup_clusters_distributed_fallback_matches_driver(spark):
    """driver_cc_max_edges=0 forces the distributed min-label-propagation
    loop; it must produce the identical component assignment as the
    driver union-find on the same graph (chains + triangle + isolate
    pair, plus a 2-hop star that needs >1 propagation round)."""
    from oakstore_spark.operators.dedup import dedup_clusters

    edges = [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22),
             (30, 31), (31, 32), (32, 33), (33, 34), (34, 35)]
    pairs = spark.createDataFrame(edges, ["id_a", "id_b"])
    drv = dedup_clusters(pairs).toPandas()
    dist = dedup_clusters(pairs, driver_cc_max_edges=0).toPandas()
    got_drv = dict(zip(drv.id, drv.cluster_id))
    got_dist = dict(zip(dist.id, dist.cluster_id))
    assert got_drv == got_dist
    assert {got_dist[30], got_dist[35]} == {30}  # long chain converged


def test_embed_near_dup_join_fallback_matches_broadcast(spark, clustered):
    """broadcast_verify_max_vecs=0 forces the join-based verify (no
    normalized-matrix broadcast); pairs and sims must match the gated
    path exactly."""
    gated = embedding_near_dup_pairs(clustered, threshold=0.98, dim=32).toPandas()
    dist = embedding_near_dup_pairs(
        clustered, threshold=0.98, dim=32, broadcast_verify_max_vecs=0
    ).toPandas()
    got_g = {(r.id_a, r.id_b): r.sim for r in gated.itertuples()}
    got_d = {(r.id_a, r.id_b): r.sim for r in dist.itertuples()}
    assert got_g.keys() == got_d.keys() and len(got_g) >= 50
    for k in got_g:
        assert got_g[k] == pytest.approx(got_d[k], abs=1e-9)


# Stated ANN quality bounds (the contract the defaults must keep):
# mean recall@10 vs exact brute force, on the dense-clusters fixture
# (each query has >= 10 genuinely-near neighbors; the twins fixture has
# only 1, which makes recall@10 measure noise retrieval instead).
ANN_RECALL_AT_10_MIN = 0.9
IVF_RECALL_AT_10_MIN = 0.9


@pytest.fixture(scope="module")
def dense_clusters(spark):
    """8 clusters x 15 unit vectors: within-cluster cosine ~0.995+,
    cross-cluster ~0 — every vector's true top-10 is same-cluster."""
    import math
    import random as _random

    rng = _random.Random(123)
    rows = []
    vid = 0
    for _c in range(8):
        center = [rng.gauss(0, 1) for _ in range(32)]
        nrm = math.sqrt(sum(x * x for x in center))
        center = [x / nrm for x in center]
        for _m in range(15):
            v = [x + rng.gauss(0, 0.05) for x in center]
            rows.append((vid, v))
            vid += 1
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]
    )
    return spark.createDataFrame(rows, schema).cache()


def _recall_at_10(brute_pdf, approx_pdf) -> float:
    truth = brute_pdf.groupby("query_id")["vec_id"].apply(set)
    got = approx_pdf.groupby("query_id")["vec_id"].apply(set)
    recalls = [
        len(truth[q] & got.get(q, set())) / len(truth[q]) for q in truth.index
    ]
    return sum(recalls) / len(recalls)


def test_ann_recall_at_10_bound(spark, dense_clusters):
    queries = dense_clusters.filter(F.col("vec_id") % 2 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    brute = cosine_topk(dense_clusters, queries, k=10).toPandas()
    ann = ann_cosine_topk(dense_clusters, queries, k=10, dim=32).toPandas()
    assert _recall_at_10(brute, ann) >= ANN_RECALL_AT_10_MIN


def test_ivf_recall_at_10_bound(spark, dense_clusters):
    from oakstore_spark.operators.similarity import ivf_cosine_topk

    queries = dense_clusters.filter(F.col("vec_id") % 2 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    brute = cosine_topk(dense_clusters, queries, k=10).toPandas()
    ivf = ivf_cosine_topk(
        dense_clusters, queries, k=10, dim=32, n_centroids=16, n_probe=4
    ).toPandas()
    assert _recall_at_10(brute, ivf) >= IVF_RECALL_AT_10_MIN


def test_ann_candidates_subquadratic(spark, clustered):
    """The LSH bucketing must PRUNE: candidate pairs well under the
    n_corpus * n_queries cross product (here every query is in the
    corpus, so brute force would score 120*60 = 7200 pairs). If this
    ratio creeps toward 1.0 the ANN path has degenerated into brute
    force with extra shuffles."""
    from oakstore_spark.operators.similarity import ann_candidates

    queries = clustered.filter(F.col("vec_id") % 2 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    n_corpus = clustered.count()
    n_queries = queries.count()
    n_cand = ann_candidates(clustered, queries, dim=32).count()
    assert n_cand < 0.5 * n_corpus * n_queries


def test_pca_project_recovers_planted_subspace(spark):
    """Vectors living in a planted 3-dim subspace of R^16 (+ tiny
    noise): a 3-component PCA must capture ~all variance, and whitening
    must make the projected covariance ~identity."""
    import numpy as np

    from oakstore_spark.operators.similarity import pca_project

    rng = np.random.default_rng(7)
    basis = np.linalg.qr(rng.normal(size=(16, 3)))[0]  # orthonormal 16x3
    Z = rng.normal(size=(300, 3)) * np.array([5.0, 2.0, 1.0])
    X = Z @ basis.T + rng.normal(scale=0.01, size=(300, 16))
    df = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(300)],
        "vec_id long, embedding array<float>",
    )
    out = pca_project(df, dim=16, out_dim=3).toPandas()
    Y = np.stack([np.asarray(v, dtype=np.float64) for v in out.projected])
    # variance captured: projected variance ~ total variance
    assert Y.var(axis=0).sum() == pytest.approx(X.var(axis=0).sum(), rel=0.01)
    # determinism incl. sign convention
    out2 = pca_project(df, dim=16, out_dim=3).toPandas()
    Y2 = np.stack([np.asarray(v, dtype=np.float64) for v in out2.projected])
    ids = out.vec_id.to_numpy().argsort()
    ids2 = out2.vec_id.to_numpy().argsort()
    assert np.allclose(Y[ids], Y2[ids2])

    W_ = pca_project(df, dim=16, out_dim=3, whiten=True).toPandas()
    Yw = np.stack([np.asarray(v, dtype=np.float64) for v in W_.projected])
    cov = np.cov(Yw.T)
    assert np.allclose(cov, np.eye(3), atol=0.05)


def test_kmeans_refine_recovers_clusters(spark, dense_clusters):
    """8 planted clusters: the distributed refinement must converge to
    centroids that assign every vector to its planted cluster (perfect
    purity on this fixture) and be deterministic under the seed."""
    import numpy as np

    from oakstore_spark.operators.similarity import kmeans_refine

    C, assign = kmeans_refine(dense_clusters, dim=32, k=8)
    assert C.shape == (8, 32)
    assert np.allclose(np.linalg.norm(C, axis=1), 1.0)
    out = assign(dense_clusters).toPandas()
    out["planted"] = out.vec_id // 15
    purity = (
        out.groupby("planted")["cluster"]
        .agg(lambda s: s.value_counts().iloc[0] / len(s))
        .min()
    )
    assert purity == 1.0
    # same seed -> identical centroids
    C2, _ = kmeans_refine(dense_clusters, dim=32, k=8)
    assert np.allclose(C, C2)


def test_span_dedup_cuts_repeats_keeps_first(spark):
    """Planted 8-word boilerplate shared by three docs: the first
    occurrence (lowest doc_id, lowest block_idx) survives, the later
    two are cut; unique spans are untouched; a doc that is ENTIRELY
    repeated text is emptied."""
    from oakstore_spark.operators.dedup import span_dedup

    boiler = "subscribe to our newsletter for all the updates"  # 8 words
    uniq = {
        1: "alpha bravo charlie delta echo foxtrot golf hotel",
        2: "india juliet kilo lima mike november oscar papa",
        3: "quebec romeo sierra tango uniform victor whiskey xray",
    }
    rows = [
        (1, f"{uniq[1]} {boiler}"),          # boiler at block 1 -> kept (first)
        (2, f"{boiler} {uniq[2]}"),          # boiler at block 0 -> cut
        (3, f"{uniq[3]} {boiler}"),          # cut
        (4, boiler),                          # doc is ONLY the repeat -> emptied
    ]
    out = {
        r.doc_id: r
        for r in span_dedup(
            spark.createDataFrame(rows, ["doc_id", "text"]), block_words=8
        ).collect()
    }
    assert out[1].clean_text == f"{uniq[1]} {boiler}"
    assert out[1].n_blocks == 2 and out[1].n_kept == 2
    assert out[2].clean_text == uniq[2]
    assert out[2].n_kept == 1
    assert out[3].clean_text == uniq[3]
    assert out[4].clean_text == "" and out[4].n_kept == 0
    assert out[4].n_blocks == 1


def test_incremental_minhash_matches_full_recompute(spark, tmp_path):
    """Incremental dedup against a persisted signature index must emit
    EXACTLY the pairs a full recompute over old+new finds that touch
    the new batch — new-vs-index and new-vs-new both — while never
    re-pairing the old corpus."""
    from oakstore_spark.operators.dedup import (
        incremental_minhash_pairs,
        minhash_lsh_pairs,
        minhash_signatures,
    )

    base = (
        "the quick brown fox jumps over the lazy dog while the cat watches "
        "from a sunny windowsill and the birds sing in the garden outside"
    )
    old_rows = [
        (0, base),
        (1, "completely different content about databases and query engines"),
        (2, "yet another unrelated document discussing storage formats"),
    ]
    new_rows = [
        (10, base.replace("quick", "swift")),      # near dup of OLD 0
        (11, "fresh unique text with no duplicate anywhere in the corpus"),
        (12, base.replace("quick", "swift")),      # exact dup of NEW 10
    ]
    old_df = spark.createDataFrame(old_rows, ["doc_id", "text"])
    new_df = spark.createDataFrame(new_rows, ["doc_id", "text"])

    # build + persist the index as parquet (the operational shape)
    idx_path = str(tmp_path / "sig_index")
    minhash_signatures(old_df, "doc_id", "text").write.parquet(idx_path)
    index = spark.read.parquet(idx_path)

    inc = incremental_minhash_pairs(
        new_df, index, "doc_id", "text", threshold=0.8
    ).toPandas()
    inc_pairs = {
        tuple(sorted((int(a), int(b)))) for a, b in zip(inc.id_a, inc.id_b)
    }
    # the distributed (above-gate) path must agree exactly
    dist = incremental_minhash_pairs(
        new_df, index, "doc_id", "text", threshold=0.8,
        driver_pairs_max_docs=0,
    ).toPandas()
    dist_pairs = {
        tuple(sorted((int(a), int(b)))) for a, b in zip(dist.id_a, dist.id_b)
    }
    assert dist_pairs == inc_pairs

    full = minhash_lsh_pairs(
        old_df.unionByName(new_df), "doc_id", "text", threshold=0.8
    ).toPandas()
    full_pairs = {
        tuple(sorted((int(a), int(b)))) for a, b in zip(full.id_a, full.id_b)
    }
    expected = {p for p in full_pairs if p[0] >= 10 or p[1] >= 10}
    assert inc_pairs == expected, (inc_pairs, expected)
    assert (0, 10) in inc_pairs and (10, 12) in inc_pairs
    # orientation flags: the old-corpus hit is marked vs_index, the
    # in-batch dup is not
    flags = {
        tuple(sorted((int(a), int(b)))): bool(v)
        for a, b, v in zip(inc.id_a, inc.id_b, inc.vs_index)
    }
    assert flags[(0, 10)] is True
    assert flags[(10, 12)] is False


def test_span_dedup_null_empty_and_short_docs(spark):
    """Null text, empty text, and sub-block-size docs must survive
    span_dedup without crashing: null/empty normalize to zero kept
    content; short unique docs pass through verbatim."""
    from oakstore_spark.operators.dedup import span_dedup

    rows = [(1, None), (2, ""), (3, "   "), (4, "tiny doc"), (5, "tiny doc")]
    out = {
        r.doc_id: r
        for r in span_dedup(
            spark.createDataFrame(rows, "doc_id long, text string"),
            block_words=8,
        ).collect()
    }
    assert set(out) == {1, 2, 3, 4, 5}
    assert out[4].clean_text == "tiny doc"  # first occurrence kept
    assert out[5].clean_text == ""          # exact dup cut entirely
    for i in (1, 2, 3):
        assert out[i].n_kept <= 1  # degenerate docs never gain content
        assert out[i].clean_text in ("", None) or out[i].clean_text == ""


def test_semdedup_drops_planted_twins(spark):
    """3 well-separated clusters; each has one exact-twin pair planted.
    SemDeDup must keep exactly one of each twin pair (the lower id) and
    every non-duplicated vector."""
    import numpy as np

    from oakstore_spark.operators.similarity import semdedup

    rng = np.random.default_rng(11)
    centers = np.eye(3, 16)
    rows = []
    vid = 0
    twins = []
    for c in range(3):
        base = centers[c]
        for j in range(20):
            v = base + rng.normal(0, 0.1, 16)
            rows.append((vid, [float(x) for x in v]))
            if j == 0:
                twins.append((vid, vid + 1000))
                rows.append((vid + 1000, [float(x) for x in v]))
            vid += 1
    df = spark.createDataFrame(rows, ["vec_id", "embedding"]).repartition(4)
    out = {r["vec_id"]: r for r in
           semdedup(df, dim=16, k=3, threshold=0.999, seed=3).collect()}
    assert len(out) == 63
    for lo, hi in twins:
        assert out[lo]["kept"] is True, f"lower twin {lo} must survive"
        assert out[hi]["kept"] is False, f"exact twin {hi} must be pruned"
        assert out[lo]["cluster"] == out[hi]["cluster"]
    # nothing else pruned at a 0.999 threshold with sigma=0.05 noise
    n_kept = sum(1 for r in out.values() if r["kept"])
    assert n_kept == 60


def test_compression_ratio_signal(spark):
    """Repetitive text must compress far below natural-looking text,
    and the exact values must match a local zlib reference."""
    import zlib

    from oakstore_spark.operators.text import compression_ratio

    rep = "spam " * 200
    nat = ("the quarterly report outlines revenue growth across twelve "
           "regional markets with varied seasonal demand patterns and "
           "currency headwinds affecting consolidated margins this year ")
    nat = (nat * 3)[: len(rep)]
    df = spark.createDataFrame(
        [(1, rep), (2, nat), (3, ""), (4, None)], ["doc_id", "text"]
    )
    got = {
        r["doc_id"]: r["ratio"]
        for r in df.select(
            "doc_id", compression_ratio(df, "text").alias("ratio")
        ).collect()
    }

    def ref(t):
        b = t.encode()
        return len(zlib.compress(b, 6)) / len(b)

    assert got[1] == pytest.approx(ref(rep))
    assert got[2] == pytest.approx(ref(nat))
    assert got[1] < 0.05 < 0.2 < got[2]
    assert got[3] == 1.0 and got[4] is None


def test_theta_overlap_error_bounded(spark):
    """Theta-sketch intersection estimate must land within 5% of the
    exact view∩purchase distinct-user count at fixture scale."""
    import duckdb

    from oakstore_spark.queries.relational_ext import q_theta_audience_overlap

    row = q_theta_audience_overlap(spark, "/root/testdata/sf0.01").collect()[0]
    exact = duckdb.sql(
        "SELECT count(*) FROM ("
        " SELECT user_id FROM read_parquet('/root/testdata/sf0.01/events.parquet')"
        " WHERE event_type='view'"
        " INTERSECT"
        " SELECT user_id FROM read_parquet('/root/testdata/sf0.01/events.parquet')"
        " WHERE event_type='purchase')"
    ).fetchone()[0]
    assert exact > 0
    assert abs(row["est_users"] - exact) / exact <= 0.05, (row["est_users"], exact)


def test_kll_merged_quantiles_error_bounded(spark):
    """Folding per-group KLL sketches must reproduce GLOBAL quantiles:
    n_items exact, p50/p90 within 1% of the true quantiles (KLL k=2048
    guarantees ~0.55% rank error at 99% confidence)."""
    import duckdb

    from oakstore_spark.queries.relational_ext import q_kll_mergeable_quantiles

    row = q_kll_mergeable_quantiles(spark, "/root/testdata/sf0.01").collect()[0]
    exact_n, p50, p90 = duckdb.sql(
        "SELECT count(*), quantile_cont(l_extendedprice, 0.5),"
        " quantile_cont(l_extendedprice, 0.9)"
        " FROM read_parquet('/root/testdata/sf0.01/lineitem.parquet')"
    ).fetchone()
    assert row["n_items"] == exact_n
    assert abs(row["p50"] - p50) / p50 <= 0.01
    assert abs(row["p90"] - p90) / p90 <= 0.01


def test_contrastive_pairs_planted(spark, clustered):
    """On the twin fixture (labels = pair parity), each anchor's
    positive must be its exact twin and its hard negative must carry a
    different label with strictly lower similarity."""
    from oakstore_spark.operators.similarity import contrastive_pairs

    labeled = clustered.withColumn(
        "label", (F.col("vec_id") / 2).cast("int") % 3
    )
    queries = labeled.where(F.col("vec_id") % 2 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding", "label"
    )
    mined = contrastive_pairs(labeled, queries).collect()
    by_q = {}
    for r in mined:
        by_q.setdefault(r["query_id"], {})[r["leg"]] = r
    lab = {r["vec_id"]: r["label"] for r in labeled.collect()}
    assert len(by_q) == 60
    for q, legs in by_q.items():
        assert legs["pos"]["vec_id"] == q + 1, "positive must be the twin"
        assert lab[legs["neg"]["vec_id"]] != lab[q]
        assert legs["neg"]["sim"] < legs["pos"]["sim"]


def test_contrastive_pairs_duplicate_embedding_ties(spark):
    """Equal-similarity ties must resolve to the LOWEST id even when the
    tied duplicates land in the same Arrow chunk in arbitrary row order
    (round-robin repartition shuffles positions) — the (sim DESC, id ASC)
    contract the oracle ranks by. Ids descend in input order so a
    position-based argmax would pick the HIGHER id."""
    import numpy as np

    from oakstore_spark.operators.similarity import contrastive_pairs

    rng = np.random.default_rng(7)
    rows = []
    # 30 duplicate triples: ids (3g, 3g+1, 3g+2) share one embedding and
    # one label; appended in DESCENDING id order within each group
    for g in range(30):
        v = [float(x) for x in rng.normal(size=8)]
        for i in (2, 1, 0):
            rows.append((3 * g + i, v, g % 2))
    corpus = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    # query = a fresh vector per group direction; same label -> its best
    # positive is the duplicate triple, tied three ways
    queries = corpus.where(F.col("vec_id") % 3 == 0).select(
        (F.col("vec_id") + 1000).alias("query_id"), "embedding", "label"
    )
    def check() -> None:
        mined = contrastive_pairs(corpus, queries).collect()
        pos = {r["query_id"]: r["vec_id"] for r in mined if r["leg"] == "pos"}
        assert len(pos) == 30
        for qid, vid in pos.items():
            g = (qid - 1000) // 3
            # the query's own embedding equals the triple's; self-match
            # is impossible (query ids are disjoint), so the winner must
            # be the lowest id of the tied triple
            assert vid == 3 * g, f"query {qid}: tie broke to {vid}, want {3 * g}"

    check()
    # force 7-row Arrow batches so tied duplicates straddle chunk
    # boundaries: per-chunk argmaxes must still merge to the lowest id
    # via the global min(struct(-sim, id))
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
    try:
        check()
    finally:
        if old is None:
            spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
        else:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)


def test_persisted_ivf_index_build_search(spark, clustered, tmp_path):
    """Build-once / search-many: a persisted IVF index must recover the
    planted twins across TWO independent searches with no rebuild, and
    the probed-cell filter must reach the scan as a partition filter."""
    import contextlib
    import io

    from oakstore_spark.operators.similarity import (
        build_ivf_index,
        search_ivf_index,
    )

    idx = str(tmp_path / "ivf_index")
    build_ivf_index(clustered, dim=32, index_dir=idx, n_centroids=16)

    queries = clustered.filter(F.col("vec_id") % 2 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    for _ in range(2):  # second search: index reused, nothing rebuilt
        out = search_ivf_index(spark, idx, queries, k=1, n_probe=4)
        twin = {int(r["query_id"]): int(r["vec_id"]) for r in out.collect()}
        hits = sum(1 for q, v in twin.items() if v == (q ^ 1))
        assert hits >= 0.95 * 60

    # partition pruning: _cell filter must appear in PartitionFilters
    out = search_ivf_index(spark, idx, queries.limit(5), k=1, n_probe=2)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and "_cell" in plan


def test_persisted_ivf_index_string_ids(spark, clustered, tmp_path):
    """The search schema must derive id types from the persisted index
    and the queries relation — a store built with STRING ids (which
    build_ivf_index happily persists) must search correctly, not fail
    or miscast against a hardcoded bigint."""
    from pyspark.sql import types as T

    from oakstore_spark.operators.similarity import (
        build_ivf_index,
        search_ivf_index,
    )

    named = clustered.select(
        F.concat(F.lit("doc-"), F.format_string("%04d", "vec_id")).alias("vec_id"),
        "embedding",
    )
    idx = str(tmp_path / "ivf_str")
    build_ivf_index(named, dim=32, index_dir=idx, n_centroids=16)
    queries = named.limit(20).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = search_ivf_index(spark, idx, queries, k=1, n_probe=4)
    assert isinstance(out.schema["vec_id"].dataType, T.StringType)
    assert isinstance(out.schema["query_id"].dataType, T.StringType)
    rows = out.collect()
    assert len(rows) == 20
    # twin layout: doc-NNNN's nearest neighbor is its xor-1 twin
    hits = sum(
        1
        for r in rows
        if int(r["vec_id"][4:]) == int(r["query_id"][4:]) ^ 1
    )
    assert hits >= 18


def test_ivfpq_trained_recall_and_pruning(spark, clustered, tmp_path):
    """IVFPQ composition with TRAINED quantizers (no planted codebooks):
    a twin (~0.999 cosine copy) quantizes to the same coarse cell and
    near-identical PQ codes, so ADC top-1 with self excluded must
    recover it for nearly every query; the probed-cell filter must
    reach the codes scan as a PartitionFilter (listing-time pruning)."""
    import contextlib
    import io

    from oakstore_spark.operators.similarity import (
        build_ivfpq_index,
        search_ivfpq_index,
    )

    idx = str(tmp_path / "ivfpq_idx")
    build_ivfpq_index(
        clustered, dim=32, index_dir=idx, n_cells=16, m=4, k=16
    )
    queries = clustered.select(F.col("vec_id").alias("query_id"), "embedding")
    out = search_ivfpq_index(spark, idx, queries, k_results=1, n_probe=4)
    rows = out.collect()
    twin = {int(r["query_id"]): int(r["vec_id"]) for r in rows}
    hits = sum(1 for q, v in twin.items() if v == (q ^ 1))
    assert hits >= 0.9 * 60

    out = search_ivfpq_index(
        spark, idx, queries.limit(5), k_results=1, n_probe=2
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and "_cell" in plan


def test_ivfpq_planted_exact_codes_and_distance(spark, tmp_path):
    """Planted-oracle contract in miniature (the q_ivfpq_topk
    construction): explicit coarse centroids + codebooks, vectors whose
    residuals sit exactly on codewords — search must return each
    vector's own copy at ADC distance exactly 0.0 in its closed-form
    cell, and the persisted codes must BE the base-16 digits."""
    import numpy as np

    from oakstore_spark.operators.similarity import (
        build_ivfpq_index,
        search_ivfpq_index,
    )

    n_cells, m, k, dsub = 4, 4, 16, 4  # dim 16
    C = np.zeros((n_cells, m * dsub))
    for c in range(n_cells):
        C[c, c * 4:(c + 1) * 4] = 8.0
    B = np.zeros((m, k, dsub))
    for c in range(k):
        B[:, c, :] = c / 128.0
    rows = []
    for vid in range(200):
        v = np.zeros(16)
        v[(vid % 4) * 4:(vid % 4) * 4 + 4] = 8.0
        for j in range(m):
            v[j * dsub:(j + 1) * dsub] += ((vid // 16**j) % 16) / 128.0
        rows.append((vid, [float(x) for x in v]))
    corpus = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>"
    )
    idx = str(tmp_path / "ivfpq_planted")
    build_ivfpq_index(
        corpus, dim=16, index_dir=idx, n_cells=n_cells, m=m, k=k,
        coarse_centroids=C, pq_codebooks=B,
    )
    codes = {
        int(r["vec_id"]): list(r["codes"])
        for r in spark.read.parquet(f"{idx}/codes").collect()
    }
    for vid in (0, 17, 123, 199):
        assert codes[vid] == [(vid // 16**j) % 16 for j in range(m)]

    queries = corpus.select(
        (F.col("vec_id") + 10_000).alias("query_id"), "embedding"
    )
    out = search_ivfpq_index(spark, idx, queries, k_results=1, n_probe=1)
    for r in out.collect():
        vid = int(r["query_id"]) - 10_000
        assert int(r["vec_id"]) == vid
        assert int(r["cell"]) == vid % 4
        assert r["adc_dist"] == 0.0


def test_ivf_incremental_add_finds_new_vectors(spark, clustered, tmp_path):
    """add_to_ivf_index: vectors appended against the FROZEN quantizer
    must be findable by search immediately (cell assignment at add time
    == cell ranking at search time), twins across the build/add
    boundary included; the base index files are untouched (append, not
    rewrite)."""
    from oakstore_spark.operators.similarity import (
        add_to_ivf_index,
        build_ivf_index,
        search_ivf_index,
    )

    base = clustered.filter(F.col("vec_id") % 2 == 0)   # even half
    batch = clustered.filter(F.col("vec_id") % 2 == 1)  # odd half (twins)
    idx = str(tmp_path / "ivf_inc")
    build_ivf_index(base, dim=32, index_dir=idx, n_centroids=8)
    import glob

    files_before = set(glob.glob(f"{idx}/vectors/**/*.parquet",
                                 recursive=True))
    add_to_ivf_index(batch, idx)
    files_after = set(glob.glob(f"{idx}/vectors/**/*.parquet",
                                recursive=True))
    assert files_before < files_after  # pure append

    # searching an even vector must now surface its ODD twin (which
    # only exists through the incremental add); shift qids so the
    # self-exclusion can't interfere with twin ranking
    queries = base.select(
        (F.col("vec_id") + 10_000).alias("query_id"), "embedding"
    )
    out = search_ivf_index(spark, idx, queries, k=2, n_probe=3).toPandas()
    top = out[out["rank"] == 1]
    hits = sum(
        1 for r in top.itertuples()
        if int(r.vec_id) in (int(r.query_id) - 10_000,
                             (int(r.query_id) - 10_000) ^ 1)
    )
    assert hits == len(top)  # self or twin at rank 1 for every query
    twin_rank12 = set()
    for r in out.itertuples():
        if int(r.vec_id) == (int(r.query_id) - 10_000) ^ 1:
            twin_rank12.add(int(r.query_id))
    assert len(twin_rank12) >= 0.95 * top.shape[0]  # added twins found


def test_pq_train_encode_adc_chain(spark):
    """Full PQ chain: training recovers planted subspace patterns
    verbatim (first-k-distinct init + Lloyd on k-point data), encoding
    reconstructs exactly, and ADC search finds each query's planted
    twin at rank 1 with better-than-random recall on noise."""
    import numpy as np

    from oakstore_spark.operators.similarity import (
        pq_adc_topk,
        pq_encode,
        train_pq_codebooks,
    )

    dim, m, k = 32, 4, 8
    dsub = dim // m
    rng = np.random.default_rng(11)
    patterns = rng.normal(size=(k, dsub)).round(3)
    # corpus: every vector is a concat of planted patterns
    choice = rng.integers(0, k, size=(300, m))
    X = np.concatenate(
        [patterns[choice[:, j]] for j in range(m)], axis=1
    )
    df = spark.createDataFrame(
        [(i, X[i].tolist()) for i in range(len(X))],
        "vec_id long, embedding array<double>",
    )
    books = train_pq_codebooks(df, dim, m=m, k=k, sample_size=1000)
    # trained centroids == planted patterns (as sets, per subspace)
    for j in range(m):
        got = np.array(sorted(books[j].round(6).tolist()))
        want = np.array(sorted(patterns.round(6).tolist()))
        assert np.allclose(got, want), j
    enc = pq_encode(df, books)
    rows = enc.collect()
    assert all(r.mse < 1e-18 for r in rows)  # exact reconstruction
    # ADC: query = corpus vectors 0..4 -> their own id at rank 1
    q = spark.createDataFrame(
        [(i, X[i].tolist()) for i in range(5)],
        "query_id long, embedding array<double>",
    )
    top = pq_adc_topk(q, enc, books, k_results=3).collect()
    best = {r.query_id: r.vec_id for r in top if r.rank == 1}
    for i in range(5):
        assert best[i] is not None
        # rank-1 hit must be an exact-code twin (dist 0)
        d1 = [r.adc_dist for r in top if r.query_id == i and r.rank == 1]
        assert d1 == [0.0]


def test_bm25_hand_computed(spark):
    """3-doc corpus with known tf/dl: replay the exact formula in
    numpy and require bit-level equality on the raw scores; also pin
    the single-arg HOF predicate (a 2-arg lambda would bind the array
    INDEX, comparing tokens to ints)."""
    import math

    from oakstore_spark.operators.text import bm25_scores

    docs = spark.createDataFrame(
        [
            (1, "hash hash join x"),       # dl=4 tf(hash)=2 tf(join)=1
            (2, "scan y z"),               # dl=3 tf(scan)=1
            (3, "u v w q"),                # dl=4 no hits -> dropped
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r.asDict()
        for r in bm25_scores(docs, ["hash", "join", "scan"]).collect()
    }
    assert set(out) == {1, 2}
    n, sumdl = 3, 11
    avgdl = sumdl / n

    def part(tf, dl, df, k1=1.2, b=0.75):
        idf = math.log(1.0 + ((n - df) + 0.5) / (df + 0.5))
        return idf * ((tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * (dl / avgdl))))

    assert out[1]["tf_0"] == 2 and out[1]["tf_1"] == 1 and out[1]["dl"] == 4
    assert out[1]["score_raw"] == 0.0 + part(2, 4, 1) + part(1, 4, 1)
    assert out[2]["score_raw"] == 0.0 + part(1, 3, 1)


def test_bm25_empty_terms_raises(spark):
    import pytest as _pytest

    from oakstore_spark.operators.text import bm25_scores

    docs = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with _pytest.raises(ValueError):
        bm25_scores(docs, [])


def test_binarize_hamming_numpy_parity(spark):
    """Packing parity vs independent numpy popcount arithmetic on
    random vectors, plus twin retrieval: a bit-identical copy must
    surface at hamming 0, rank 1."""
    import numpy as np

    from oakstore_spark.operators.similarity import (
        binarize_embeddings,
        hamming_topk,
    )

    rng = np.random.default_rng(7)
    vecs = rng.standard_normal((40, 64)).astype(np.float32)
    vecs[7] = vecs[3]  # planted twin
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    packed = {
        r["vec_id"]: r["bits"]
        for r in binarize_embeddings(df, dim=64).collect()
    }

    def np_pack(v):
        out = []
        for w in range(2):
            word = 0
            for j in range(32):
                if v[32 * w + j] > 0:
                    word |= 1 << j
            out.append(word)
        return out

    for i in range(40):
        assert packed[i] == np_pack(vecs[i]), i

    bits = binarize_embeddings(df, dim=64)
    got = (
        hamming_topk(bits, bits.where(F.col("vec_id") == 3), k=3)
        .orderBy("rank")
        .collect()
    )
    assert got[0]["vec_id"] == 7 and got[0]["hamming"] == 0
    # exhaustive distance parity for the probe row
    def np_ham(a, b):
        pa, pb = np_pack(a), np_pack(b)
        return sum(bin(x ^ y).count("1") for x, y in zip(pa, pb))

    all_d = {
        r["vec_id"]: r["hamming"]
        for r in hamming_topk(bits, bits.where(F.col("vec_id") == 3), k=39)
        .collect()
    }
    for i in range(40):
        if i != 3:
            assert all_d[i] == np_ham(vecs[3], vecs[i]), i


def test_binarize_odd_dim_tail_word(spark):
    """dim not divisible by 32: the tail word packs only the declared
    width (no phantom bits)."""
    from oakstore_spark.operators.similarity import binarize_embeddings

    df = spark.createDataFrame(
        [(0, [1.0] * 40)], "vec_id long, embedding array<float>"
    )
    [r] = binarize_embeddings(df, dim=40).collect()
    assert r["bits"] == [(1 << 32) - 1, (1 << 8) - 1]


def test_containment_catches_quote_inclusion_jaccard_misses(spark):
    """A short doc pasted verbatim inside a much larger doc:
    containment ~1.0 (caught) while jaccard is far below its usual
    thresholds (missed) — the reason the asymmetric operator exists.
    Also: an unrelated doc pairs with nothing."""
    from oakstore_spark.operators.dedup import (
        containment_pairs,
        ngram_jaccard_pairs,
    )

    quote = "the quick brown fox jumps over the lazy dog again and again"
    filler = " ".join(f"filler{i} token{i} words{i}" for i in range(40))
    rows = [
        (1, quote),
        (2, filler + " " + quote + " " + filler[::-1].lower()),
        (3, "completely different content about nothing at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    cont = {
        (r["id_a"], r["id_b"]): r["containment"]
        for r in containment_pairs(df, "doc_id", "text", 0.9).collect()
    }
    assert (1, 2) in cont and cont[(1, 2)] >= 0.9
    assert all(3 not in pair for pair in cont)
    jac = ngram_jaccard_pairs(df, "doc_id", "text", 0.5).collect()
    assert not [r for r in jac if {r["id_a"], r["id_b"]} == {1, 2}]


def test_containment_sparse_path_parity(spark):
    """Force the sparse (prefix x full postings) path by using 4-gram
    shingles (universe >> 4096) and require the same pairs the dense
    3-gram... rather: same operator, 4-gram, planted exact-substring
    pair must still surface with containment 1.0 on the shorter."""
    from oakstore_spark.operators.dedup import containment_pairs

    short = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [(1, short), (2, short + " " + "x y z " * 30), (3, "unrelated stuff here")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        (r["id_a"], r["id_b"]): r
        for r in containment_pairs(
            df, "doc_id", "text", 0.95, shingle_n=4
        ).collect()
    }
    assert (1, 2) in out
    assert out[(1, 2)]["containment"] == 1.0
    assert out[(1, 2)]["inter"] == out[(1, 2)]["n_a"]


def test_containment_fractional_threshold_prefix_recall(spark):
    """ADVICE r8: with a threshold whose 100*t rounds DOWN (t=0.334 ->
    pct=33), the sparse-path prefix length must come from the SAME
    integer pct as the acceptance filter. Adversarial construction: a
    pair whose intersection lies in [ceil(pct*n/100), ceil(t*n)-1] —
    accepted by the verify filter, but missed by a float-derived prefix
    because every shared gram (df=2) rarity-sorts AFTER all the unique
    grams (df=1) and the old prefix stopped short of them."""
    import math
    import random

    from oakstore_spark.operators.dedup import containment_pairs

    t = 0.334
    pct = int(round(100 * t))  # 33

    def grams(s: str) -> set:
        return {s[i : i + 3] for i in range(len(s) - 2)}

    rng = random.Random(7)
    alpha = "abcdefghijklmnopqrstuvwxyz0123456789"

    def rand_str(n: int) -> str:
        return "".join(rng.choice(alpha) for _ in range(n))

    u_a, u_b = rand_str(700), rand_str(1100)
    found = None
    for slen in range(280, 420):
        s = rand_str(slen)
        a_txt, b_txt = u_a + " " + s, u_b + " " + s
        ga, gb = grams(a_txt), grams(b_txt)
        n_a, n_b, inter = len(ga), len(gb), len(ga & gb)
        if n_a > n_b:
            continue
        lo = -(-pct * n_a // 100)  # ceil(pct*n_a/100), exact integers
        hi = math.ceil(t * n_a) - 1  # old float-derived coverage bound
        if lo <= inter <= hi and inter <= math.ceil(t * n_b) - 1:
            found = (a_txt, b_txt, n_a, n_b, inter)
            break
    assert found, "no adversarial corpus found in the search range"
    a_txt, b_txt, n_a, n_b, inter = found
    # sanity: the pair is ACCEPTED by the integer filter
    assert 100 * inter >= pct * min(n_a, n_b)

    df = spark.createDataFrame(
        [(1, a_txt), (2, b_txt)], "doc_id long, text string"
    )
    # broadcast_verify_max_docs=0 forces the sparse prefix path
    out = {
        (r["id_a"], r["id_b"]): r
        for r in containment_pairs(
            df, "doc_id", "text", t, broadcast_verify_max_docs=0
        ).collect()
    }
    assert (1, 2) in out, (
        f"pair with inter={inter}, n_a={n_a} accepted by the filter "
        "was not generated as a candidate — prefix under-covers"
    )
    assert out[(1, 2)]["inter"] == inter
    assert out[(1, 2)]["n_a"] == n_a and out[(1, 2)]["n_b"] == n_b


def test_containment_distributed_rarity_parity(spark):
    """FORCED fallback parity (VERDICT r8 ask #5): with
    rarity_broadcast_max_universe=0 the sparse path must rank gram
    rarity via the distributed join (no driver collect of the
    frequency table) and return byte-identical pairs to the broadcast
    searchsorted path on a corpus with real quote-inclusion structure."""
    import random

    from oakstore_spark.operators.dedup import containment_pairs

    rng = random.Random(11)
    words = [f"w{i}" for i in range(60)]
    quote = " ".join(rng.choices(words, k=12))
    rows = []
    for i in range(30):
        body = " ".join(rng.choices(words, k=rng.randint(8, 40)))
        if i % 5 == 0:
            body = body + " " + quote  # planted containments
        rows.append((i, body))
    rows.append((1000, quote))  # the contained short doc
    df = spark.createDataFrame(rows, "doc_id long, text string")

    def run(gate):
        return sorted(
            (r["id_a"], r["id_b"], r["n_a"], r["n_b"], r["inter"])
            for r in containment_pairs(
                df, "doc_id", "text", 0.9,
                broadcast_verify_max_docs=0,  # force sparse path
                rarity_broadcast_max_universe=gate,
            ).collect()
        )

    broadcast_pairs = run(10_000_000)
    joined_pairs = run(0)
    assert joined_pairs == broadcast_pairs
    assert broadcast_pairs, "planted containments must surface"
    # the planted short doc pairs with every doc that swallowed it
    containing = {a for a, b, *_ in broadcast_pairs if b == 1000} | {
        b for a, b, *_ in broadcast_pairs if a == 1000
    }
    assert {0, 5, 10, 15, 20, 25} <= containing


def test_ivfpq_incremental_add(spark, clustered, tmp_path):
    """add_to_ivfpq_index (index maintenance for the flagship ANN
    shape): vectors appended AFTER the build are encoded with the
    FROZEN quantizers, land in the cell-partitioned codes table, and
    the next search finds them immediately — add cost tracks the
    batch, never the corpus."""
    from oakstore_spark.operators.similarity import (
        add_to_ivfpq_index,
        build_ivfpq_index,
        search_ivfpq_index,
    )

    idx = str(tmp_path / "ivfpq_inc")
    # build WITHOUT the odd twins, then add them incrementally
    evens = clustered.where(F.col("vec_id") % 2 == 0)
    odds = clustered.where(F.col("vec_id") % 2 == 1)
    build_ivfpq_index(evens, dim=32, index_dir=idx, n_cells=16, m=4, k=16)
    queries = evens.select(F.col("vec_id").alias("query_id"), "embedding")

    before = {
        int(r["query_id"]): int(r["vec_id"])
        for r in search_ivfpq_index(
            spark, idx, queries, k_results=1, n_probe=4
        ).collect()
    }
    # twins absent: top-1 can never be the xor-1 twin
    assert all(v != (q ^ 1) for q, v in before.items())

    add_to_ivfpq_index(odds, idx)
    codes = spark.read.parquet(f"{idx}/codes")
    assert codes.count() == clustered.count()

    after = {
        int(r["query_id"]): int(r["vec_id"])
        for r in search_ivfpq_index(
            spark, idx, queries, k_results=1, n_probe=4
        ).collect()
    }
    hits = sum(1 for q, v in after.items() if v == (q ^ 1))
    assert hits >= 0.9 * len(after)


def test_index_delete_tombstones_and_vacuum(spark, clustered, tmp_path):
    """Index delete lifecycle (LSM/lakehouse shape): tombstoned ids
    vanish from searches IMMEDIATELY (broadcast anti-join), vacuum
    physically rewrites only the affected cells (and drops emptied
    ones), clears the tombstones, and searches stay correct after.
    Exercised on BOTH persisted layouts (IVF vectors, IVFPQ codes)."""
    from oakstore_spark.operators.similarity import (
        build_ivf_index,
        build_ivfpq_index,
        remove_from_ivf_index,
        search_ivf_index,
        search_ivfpq_index,
        vacuum_ivf_index,
    )

    # --- IVF layout ---
    idx = str(tmp_path / "ivf_del")
    build_ivf_index(clustered, dim=32, index_dir=idx, n_centroids=16)
    queries = clustered.where(F.col("vec_id") % 2 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    before = {
        int(r["query_id"]): int(r["vec_id"])
        for r in search_ivf_index(spark, idx, queries, k=1, n_probe=4).collect()
    }
    assert sum(1 for q, v in before.items() if v == (q ^ 1)) >= 0.9 * len(before)

    # delete every odd twin
    odds = clustered.where(F.col("vec_id") % 2 == 1).select("vec_id")
    remove_from_ivf_index(odds, idx)
    after = {
        int(r["query_id"]): int(r["vec_id"])
        for r in search_ivf_index(spark, idx, queries, k=1, n_probe=4).collect()
    }
    assert all(v % 2 == 0 for v in after.values()), "tombstoned ids returned"

    n = vacuum_ivf_index(spark, idx)
    assert n == odds.count()
    left = spark.read.parquet(f"{idx}/vectors")
    assert left.count() == clustered.count() - n
    assert left.where(F.col("vec_id") % 2 == 1).count() == 0
    # tombstones cleared; results unchanged after the physical rewrite
    again = {
        int(r["query_id"]): int(r["vec_id"])
        for r in search_ivf_index(spark, idx, queries, k=1, n_probe=4).collect()
    }
    assert again == after
    # idempotent on an empty tombstone set
    assert vacuum_ivf_index(spark, idx) == 0

    # --- IVFPQ layout (same tombstone contract over codes) ---
    idx2 = str(tmp_path / "ivfpq_del")
    build_ivfpq_index(clustered, dim=32, index_dir=idx2, n_cells=16, m=4, k=16)
    remove_from_ivf_index(odds, idx2)
    out = search_ivfpq_index(
        spark, idx2, queries, k_results=1, n_probe=4
    ).collect()
    assert all(int(r["vec_id"]) % 2 == 0 for r in out)
    n2 = vacuum_ivf_index(spark, idx2)
    assert n2 == odds.count()
    codes_left = spark.read.parquet(f"{idx2}/codes")
    assert codes_left.where(F.col("vec_id") % 2 == 1).count() == 0


def test_bm25_index_matches_full_scan_exactly(spark, tmp_path):
    """The persisted BM25 index must score BIT-IDENTICALLY to the
    full-scan bm25_scores path (same float tree, fixed-order term sum)
    for every matching doc — and the postings read must prune to the
    query terms' bucket partitions."""
    from oakstore_spark.operators.text import (
        bm25_scores,
        build_bm25_index,
        search_bm25_index,
    )

    rows = [
        (1, "hash join over the big table"),
        (2, "scan scan scan and more scan"),
        (3, "nothing relevant whatsoever"),
        (4, "a hash of a hash plus one join and one scan"),
        (5, ""),
        (6, "join"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    terms = ["hash", "join", "scan"]
    idx = str(tmp_path / "bm25_idx")
    build_bm25_index(df, idx, n_buckets=8)

    full = {
        r["doc_id"]: r.asDict()
        for r in bm25_scores(df, terms).collect()
    }
    via_index = {
        r["doc_id"]: r.asDict()
        for r in search_bm25_index(spark, idx, terms, n_buckets=8).collect()
    }
    assert set(via_index) == set(full) == {1, 2, 4, 6}
    for d in full:
        for col in ("dl", "tf_0", "tf_1", "tf_2"):
            assert via_index[d][col] == full[d][col], (d, col)
        assert via_index[d]["score_raw"] == full[d]["score_raw"], d

    # bucket pruning reaches the postings scan as a PartitionFilter
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        search_bm25_index(spark, idx, ["join"], n_buckets=8).explain(
            "formatted"
        )
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and "_bucket" in plan


def test_zorder_write_and_file_skipping(spark, tmp_path):
    """Z-ordered layout + file-stats skipping: a selective range read
    on EITHER indexed column touches a strict subset of the files and
    returns exactly the rows a full-table filter returns."""
    from oakstore_spark.operators.layout import (
        file_stats,
        pruned_files,
        read_pruned,
        write_zordered,
    )

    df = spark.range(0, 20_000, 1, 16).select(
        F.col("id"),
        (F.col("id") % 1000).alias("user_id"),
        (F.col("id") * 7 % 5000).alias("value"),
    )
    path = str(tmp_path / "z")
    write_zordered(df, path, ["user_id", "value"], n_files=16)
    stats = file_stats(spark, path, ["user_id", "value"]).cache()
    n_files_total = stats.count()
    assert n_files_total == 16

    for col, lo, hi in (("user_id", 100, 140), ("value", 0, 300)):
        kept = pruned_files(stats, col, lo, hi)
        assert 0 < len(kept) < n_files_total, (col, len(kept))
        got = sorted(
            r["id"] for r in read_pruned(spark, stats, col, lo, hi).collect()
        )
        want = sorted(
            r["id"]
            for r in df.where(
                (F.col(col) >= lo) & (F.col(col) <= hi)
            ).collect()
        )
        assert got == want, col
    # empty-range read: no files, no rows, schema intact
    empty = read_pruned(spark, stats, "user_id", 10_000, 20_000)
    assert empty.count() == 0 and "id" in empty.columns


def test_edit_distance_pairs_exact_vs_brute_force(spark):
    """edit_distance_pairs must equal brute force exactly (pairs AND
    distances) on a corpus that exercises all three candidate legs:
    long strings (positional q-gram count filter), short strings
    (length-blocked leg), and short-long boundary pairs."""
    import random

    from oakstore_spark.operators.dedup import edit_distance_pairs

    def ed(s, t):
        m, n = len(s), len(t)
        prev = list(range(n + 1))
        for i in range(1, m + 1):
            cur = [i] + [0] * n
            for j in range(1, n + 1):
                cur[j] = min(
                    prev[j] + 1,
                    cur[j - 1] + 1,
                    prev[j - 1] + (s[i - 1] != t[j - 1]),
                )
            prev = cur
        return prev[n]

    rng = random.Random(5)
    alpha = "abcdefgh"
    rows = []
    texts = {}
    did = 0

    def add(t):
        nonlocal did
        rows.append((did, t))
        texts[did] = t
        did += 1

    # long strings with planted 1- and 2-edit variants
    for _ in range(25):
        s = "".join(rng.choice(alpha) for _ in range(rng.randint(12, 24)))
        add(s)
        v = list(s)
        v[rng.randrange(len(v))] = rng.choice(alpha)  # 0 or 1 edit
        add("".join(v))
        w = list(s)
        del w[rng.randrange(len(w))]
        w.insert(rng.randrange(len(w) + 1), rng.choice(alpha))
        add("".join(w))
    # short strings (below the (k+1)*q cut for k=2, q=3)
    for _ in range(20):
        add("".join(rng.choice(alpha) for _ in range(rng.randint(1, 8))))
    # boundary: just over/under the cut
    for ln in (7, 8, 9, 10):
        add("z" * ln)

    k = 2
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"]): r["edit_dist"]
        for r in edit_distance_pairs(df, "doc_id", "text", k).collect()
    }
    expect = {}
    ids = sorted(texts)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            d = ed(texts[a], texts[b])
            if d <= k:
                expect[(a, b)] = d
    assert got == expect
    assert expect, "fixture must plant at least one qualifying pair"
    # legs actually exercised: at least one all-short and one long pair
    cut = (k + 1) * 3
    assert any(
        len(texts[a]) < cut and len(texts[b]) < cut for a, b in expect
    )
    assert any(
        max(len(texts[a]), len(texts[b])) >= cut for a, b in expect
    )


def test_bm25_incremental_add_equals_full_build(spark, tmp_path):
    """add_to_bm25_index: building on half the corpus and adding the
    other half must score BIT-IDENTICALLY to a from-scratch build over
    the union (postings append; termdf merged into a swapped-in
    directory; stats added driver-side)."""
    from oakstore_spark.operators.text import (
        add_to_bm25_index,
        build_bm25_index,
        search_bm25_index,
    )

    rows = [
        (i, f"doc {i} " + ("hash join " * (i % 3 + 1))
         + ("scan " * (i % 5)))
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    terms = ["hash", "join", "scan"]

    full_idx = str(tmp_path / "full")
    build_bm25_index(df, full_idx, n_buckets=8)
    inc_idx = str(tmp_path / "inc")
    build_bm25_index(df.where("doc_id < 20"), inc_idx, n_buckets=8)
    add_to_bm25_index(
        df.where("doc_id >= 20"), inc_idx, n_buckets=8
    )

    def snap(idx):
        return {
            r["doc_id"]: r.asDict()
            for r in search_bm25_index(
                spark, idx, terms, n_buckets=8
            ).collect()
        }

    full, inc = snap(full_idx), snap(inc_idx)
    assert set(full) == set(inc)
    for d in full:
        assert inc[d] == full[d], d


def test_index_delete_then_readd_roundtrip(spark, clustered, tmp_path):
    """Delete-then-re-add: an add batch containing tombstoned ids
    reclaims the stale pre-delete rows FIRST, drops those tombstones,
    and appends — so the re-added vector is searchable immediately
    with exactly ONE live physical copy, while ids deleted but NOT
    re-added stay hidden. Exercised on both persisted layouts."""
    from oakstore_spark.operators.similarity import (
        _read_tombstones,
        add_to_ivf_index,
        add_to_ivfpq_index,
        build_ivf_index,
        build_ivfpq_index,
        remove_from_ivf_index,
        search_ivf_index,
        search_ivfpq_index,
    )

    idx = str(tmp_path / "ivf_readd")
    build_ivf_index(clustered, dim=32, index_dir=idx, n_centroids=16)
    gone = clustered.where(F.col("vec_id").isin(1, 3)).select("vec_id")
    remove_from_ivf_index(gone, idx)
    add_to_ivf_index(clustered.where("vec_id = 1"), idx)

    # single live copy of the re-added id; the not-re-added id keeps
    # its (hidden) stale row and its tombstone
    vecs = spark.read.parquet(f"{idx}/vectors")
    assert vecs.where("vec_id = 1").count() == 1
    assert vecs.where("vec_id = 3").count() == 1
    assert [r[0] for r in _read_tombstones(spark, idx, "vec_id").collect()] \
        == [3]

    q0 = clustered.where("vec_id = 0").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = search_ivf_index(spark, idx, q0, k=1, n_probe=4).collect()
    assert int(out[0]["vec_id"]) == 1  # twin searchable again
    q2 = clustered.where("vec_id = 2").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out2 = search_ivf_index(spark, idx, q2, k=1, n_probe=4).collect()
    assert int(out2[0]["vec_id"]) != 3  # still deleted

    # re-adding the last tombstoned id clears the tombstone relation
    add_to_ivf_index(clustered.where("vec_id = 3"), idx)
    assert _read_tombstones(spark, idx, "vec_id") is None
    vecs = spark.read.parquet(f"{idx}/vectors")
    assert vecs.where("vec_id = 3").count() == 1
    assert int(
        search_ivf_index(spark, idx, q2, k=1, n_probe=4)
        .collect()[0]["vec_id"]
    ) == 3

    # --- IVFPQ layout (same re-add contract over codes) ---
    idx2 = str(tmp_path / "ivfpq_readd")
    build_ivfpq_index(clustered, dim=32, index_dir=idx2, n_cells=16,
                      m=4, k=16)
    remove_from_ivf_index(gone, idx2)
    add_to_ivfpq_index(clustered.where("vec_id = 1"), idx2)
    codes = spark.read.parquet(f"{idx2}/codes")
    assert codes.where("vec_id = 1").count() == 1
    assert [r[0] for r in _read_tombstones(spark, idx2, "vec_id").collect()] \
        == [3]
    outp = search_ivfpq_index(
        spark, idx2, q0, k_results=1, n_probe=4
    ).collect()
    assert int(outp[0]["vec_id"]) == 1


def test_bm25_index_delete_lifecycle(spark, tmp_path):
    """BM25 index delete lifecycle (tombstone-then-compact parity with
    the IVF layouts): tombstoned docs vanish from searches IMMEDIATELY
    (scores of survivors keep pre-delete global stats until vacuum);
    vacuum rewrites only affected buckets, rebuilds termdf/stats by
    exact subtraction so the index scores BIT-IDENTICALLY to a
    from-scratch build over the survivors, clears tombstones and is
    idempotent; delete-then-re-add restores the doc exactly."""
    from oakstore_spark.operators.text import (
        _read_bm25_tombstones,
        add_to_bm25_index,
        build_bm25_index,
        remove_from_bm25_index,
        search_bm25_index,
        vacuum_bm25_index,
    )

    rows = [
        (i, f"doc {i} " + ("hash join " * (i % 3 + 1))
         + ("scan " * (i % 5)))
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    terms = ["hash", "join", "scan"]
    idx = str(tmp_path / "bm25_del")
    build_bm25_index(df, idx, n_buckets=8)

    def snap(index_dir):
        return {
            r["doc_id"]: r.asDict()
            for r in search_bm25_index(
                spark, index_dir, terms, n_buckets=8
            ).collect()
        }

    before = snap(idx)
    assert set(before) == set(range(40))

    # delete docs 0-9: gone from results immediately, survivors'
    # scores still use the stale (pre-delete) global stats
    remove_from_bm25_index(df.where("doc_id < 10").select("doc_id"), idx)
    mid = snap(idx)
    assert set(mid) == set(range(10, 40))
    for d in mid:
        assert mid[d] == before[d], d  # stale stats by contract

    # vacuum: physical reclaim + exact stats rebuild -> bit-identical
    # to a from-scratch index over the survivors
    n = vacuum_bm25_index(spark, idx)
    assert n == 10
    assert _read_bm25_tombstones(spark, idx, "doc_id") is None
    posts = spark.read.parquet(f"{idx}/postings")
    assert posts.where("doc_id < 10").count() == 0
    ref_idx = str(tmp_path / "bm25_ref")
    build_bm25_index(df.where("doc_id >= 10"), ref_idx, n_buckets=8)
    after, ref = snap(idx), snap(ref_idx)
    assert set(after) == set(ref)
    for d in ref:
        assert after[d] == ref[d], d
    # termdf/stats subtraction matches the rebuilt relations exactly
    tdf_v = {
        (r["term"], int(r["_bucket"])): int(r["df"])
        for r in spark.read.parquet(f"{idx}/termdf").collect()
    }
    tdf_r = {
        (r["term"], int(r["_bucket"])): int(r["df"])
        for r in spark.read.parquet(f"{ref_idx}/termdf").collect()
    }
    assert tdf_v == tdf_r
    assert (
        spark.read.parquet(f"{idx}/stats").collect()
        == spark.read.parquet(f"{ref_idx}/stats").collect()
    )
    # idempotent on an empty tombstone set
    assert vacuum_bm25_index(spark, idx) == 0

    # delete-then-re-add WITHOUT a vacuum: the re-added doc comes back
    # as the single live copy and the index equals the full build
    remove_from_bm25_index(df.where("doc_id = 20").select("doc_id"), idx)
    assert 20 not in snap(idx)
    add_to_bm25_index(df.where("doc_id = 20"), idx, n_buckets=8)
    assert _read_bm25_tombstones(spark, idx, "doc_id") is None
    posts = spark.read.parquet(f"{idx}/postings")
    ref_posts = spark.read.parquet(f"{ref_idx}/postings")
    assert posts.where("doc_id = 20").count() \
        == ref_posts.where("doc_id = 20").count()  # single live copy
    readd = snap(idx)
    assert set(readd) == set(ref)
    for d in ref:
        assert readd[d] == ref[d], d


def test_unicode_normalize_and_multiscript_dedup(spark):
    """Multilingual rung: NFKC folds fullwidth/ligature/ideographic-
    space forms, any script's letters/digits survive the strip, and
    minhash_lsh_pairs(unicode_mode=True) separates DISTINCT CJK docs
    while still finding the true CJK near-dup — where the ASCII rung
    collapses every CJK doc to empty text and emits the whole corpus
    as one duplicate class."""
    from oakstore_spark.functions.text import char_ngram_codes, normalize_text
    from oakstore_spark.operators.dedup import minhash_lsh_pairs

    df = spark.createDataFrame(
        [
            (1, "Ｔｅｓｔ　ﬁle №42!"),       # fullwidth + NFKC forms
            (2, "test file no42"),            # its NFKC-normalized twin
            (3, "Привет, мир — Тест."),
        ],
        "id long, text string",
    )
    got = {
        r["id"]: r["n"]
        for r in df.select(
            "id", normalize_text("text", unicode_mode=True).alias("n")
        ).collect()
    }
    assert got[1] == "test file no42"
    assert got[1] == got[2]
    assert got[3] == "привет мир тест"

    # injective codepoint grams: distinct unicode 3-grams <-> codes
    sizes = {
        r["id"]: len(r["c"])
        for r in df.select(
            "id",
            char_ngram_codes(3, unicode_mode=True)(
                normalize_text("text", unicode_mode=True)
            ).alias("c"),
        ).collect()
    }
    assert sizes[3] == len(
        {"привет мир тест"[i:i + 3] for i in range(len("привет мир тест") - 2)}
    )

    # four DISTINCT CJK docs + one true near-dup pair (4 <-> 5 share
    # all but one char); ASCII normalization maps ALL of them to ""
    cjk = spark.createDataFrame(
        [
            (4, "機械学習の分散処理システムを構築する"),
            (5, "機械学習の分散処理システムを構築した"),
            (6, "データベースの問い合わせ最適化について"),
            (7, "自然言語処理と情報検索の研究開発"),
        ],
        "id long, text string",
    )
    assert all(
        r["n"] == ""
        for r in cjk.select(normalize_text("text").alias("n")).collect()
    ), "precondition: ASCII rung empties CJK text"

    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in minhash_lsh_pairs(
            cjk, "id", "text", threshold=0.5, unicode_mode=True
        ).collect()
    }
    assert set(pairs) == {(4, 5)}, pairs   # only the true near-dup
    assert pairs[(4, 5)] >= 0.5


# --- JL random projection --------------------------------------------------


def test_random_projection_numpy_parity_and_jl(spark):
    import hashlib

    import numpy as np

    from oakstore_spark.operators.similarity import random_projection

    rng = np.random.default_rng(11)
    n, d, k = 40, 32, 16
    V = rng.normal(size=(n, d)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, V[i].tolist()) for i in range(n)], ["vec_id", "embedding"]
    )
    out = random_projection(df, "embedding", "vec_id", out_dim=k).collect()
    got = {}
    for r in out:
        got.setdefault(r.vec_id, {})[r.j] = r.proj_q

    S = np.empty((d, k), dtype=np.int64)
    for j in range(k):
        for i in range(d):
            S[i, j] = 1 if hashlib.md5(f"{j}_{i}".encode()).hexdigest()[0] < "8" else -1
    Q = np.floor(V.astype(np.float64) * 1024).astype(np.int64)
    P = Q @ S
    for i in range(n):
        assert [got[i][j] for j in range(k)] == P[i].tolist()

    # JL property (sanity, generous tolerance): scaled projected
    # distances track original distances within 2x for sampled pairs
    Pf = P.astype(np.float64) / 1024.0 / np.sqrt(k)
    Vf = V.astype(np.float64)
    for a, b in [(0, 1), (2, 3), (10, 30), (5, 25)]:
        do = np.linalg.norm(Vf[a] - Vf[b])
        dp = np.linalg.norm(Pf[a] - Pf[b])
        assert 0.5 * do < dp < 2.0 * do


# --- bloom file skipping ---------------------------------------------------


def test_bloom_file_skipping_subset_and_parity(spark, tmp_path):
    from pyspark.sql import functions as F

    from oakstore_spark.operators.layout import (
        bloom_file_stats,
        bloom_pruned_files,
        read_bloom_pruned,
    )

    df = spark.range(5000).select(
        (F.col("id") % 500).alias("k"), F.col("id").alias("v")
    )
    path = str(tmp_path / "bloomtab")
    df.repartition(16, "k").write.parquet(path)
    stats = bloom_file_stats(spark, path, "k")
    all_files = {r["_file"] for r in stats.select("_file").distinct().collect()}
    assert len(all_files) == 16

    cand = bloom_pruned_files(stats, 123)
    # strict subset: bloom must rule out most files at 500 keys/1024 bits
    assert 0 < len(cand) < len(all_files)
    # no false negatives: the file(s) actually holding k=123 survive
    holding = {
        r["_file"]
        for r in spark.read.parquet(path)
        .withColumn("_file", F.input_file_name())
        .where(F.col("k") == 123)
        .select("_file")
        .distinct()
        .collect()
    }
    assert holding <= set(cand)
    # row parity with the raw filter
    got = sorted(
        r.v for r in read_bloom_pruned(spark, stats, "k", 123).collect()
    )
    want = sorted(
        r.v
        for r in spark.read.parquet(path).where(F.col("k") == 123).collect()
    )
    assert got == want and len(got) == 10

    # absent key: every surviving file is a bloom false positive and
    # the exact filter still returns nothing
    assert read_bloom_pruned(spark, stats, "k", 10_000).count() == 0


def test_anova_f_separability_planted_signal(spark):
    from oakstore_spark.operators.similarity import anova_f_separability

    # dim 0 encodes the label exactly (label/10); dims 1,2 constant
    # noise-free junk -> ssw=0 -> f_ratio NULL; dim 3 same value for
    # all labels but varying within class -> F near 0
    rows = []
    for lab in range(2):
        for j in range(20):
            rows.append((lab, [lab / 10.0, 0.5, -0.25, (j % 2) / 10.0]))
    df = spark.createDataFrame(rows, ["label", "embedding"])
    out = {r.dim: r for r in anova_f_separability(
        df, "embedding", "label", labels=[0, 1]).collect()}
    assert out[0].ssw == 0.0 and out[0].f_ratio is None  # perfect sep
    assert out[0].ssb > 0
    assert out[1].ssb == 0.0 and out[1].f_ratio is None  # constant dim
    assert out[3].ssb == 0.0 and out[3].ssw > 0
    assert out[3].f_ratio == 0.0  # within-class variance only
    assert all(r.n == 40 for r in out.values())


def test_mmr_topk_diversity_vs_plain(spark):
    """Planted geometry: a near-duplicate cluster ties a distinct doc
    on relevance; MMR must pick ONE cluster representative then the
    two distinct directions (plain top-k would return the cluster);
    lam=1 degenerates to pure relevance order; the query doc itself
    is excluded from the pool."""
    from oakstore_spark.operators.similarity import mmr_topk

    dim = 8

    def vec(parts):
        v = [0.0] * dim
        for i, m in parts:
            v[i] = m
        return v

    rows = [(0, vec([(0, 0.6), (1, 0.6), (2, 0.5)]))]  # the query
    # cluster ids 1..4: identical direction (dim 0), tiny distinct tail
    rows += [
        (i, vec([(0, 0.95), (7, 0.001 * i)])) for i in range(1, 5)
    ]
    rows += [(10, vec([(1, 0.95)])), (11, vec([(2, 0.95)]))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    out = mmr_topk(df, query_id=0, k=4, lam=0.5, n_candidates=10).collect()
    ids = [r.id for r in out]
    # round 1: rel tie between cluster and doc 10 -> id tie-break = 1;
    # round 2/3: redundancy kills the cluster, distinct dims win;
    # round 4: back to the cluster (everything else exhausted)
    assert ids[0] == 1
    assert ids[1] == 10 and ids[2] == 11
    assert ids[3] in (2, 3, 4)
    assert 0 not in ids  # query doc excluded

    # lam=1.0: pure relevance order (tie-break id) — the degeneration
    plain = mmr_topk(df, query_id=0, k=4, lam=1.0, n_candidates=10).collect()
    rels = [r.rel for r in plain]
    assert rels == sorted(rels, reverse=True)
    assert [r.id for r in plain] == [1, 2, 3, 4]


def test_coec_adjusts_position_bias(spark):
    """Two items with identical intrinsic appeal but opposite
    placements read COEC 1.0-ish both ways, while an item that
    out-clicks its position baseline reads > 1: hand-checked on a
    4-impression-per-cell grid."""
    from oakstore_spark.operators.text import coec_scores

    rows = []
    # positions 1 and 2; baseline ctr: pos1 = 1/2, pos2 = 1/4
    # item A: 4 imps at pos1, 2 clicks -> coec = 2 / (4*1/2) = 1.0
    rows += [("A", 1, 1), ("A", 1, 1), ("A", 1, 0), ("A", 1, 0)]
    # item B: 4 imps at pos2, 1 click -> coec = 1 / (4*1/4) = 1.0
    rows += [("B", 2, 1), ("B", 2, 0), ("B", 2, 0), ("B", 2, 0)]
    # item C: 4 imps at pos2, 3 clicks (hot item at a bad slot)
    rows += [("C", 2, 1), ("C", 2, 1), ("C", 2, 1), ("C", 2, 0)]
    # item D: never clicked anywhere
    rows += [("D", 1, 0), ("D", 1, 0), ("D", 2, 0), ("D", 2, 0)]
    df = spark.createDataFrame(rows, ["item", "pos", "clicked"])
    out = {r.item: r for r in coec_scores(df, "item", "pos", "clicked").collect()}
    # baselines: pos1 = 2/6 (A:4 + D:2 imps), pos2 = 4/10 (B:4 C:4 D:2)
    assert out["A"].coec == 2 / (4 * (2 / 6))
    assert out["B"].coec == 1 / (4 * (4 / 10))
    assert out["C"].coec == 3 / (4 * (4 / 10))
    assert out["C"].coec > out["B"].coec
    assert out["D"].n_clicks == 0 and out["D"].coec == 0.0


def _filter_corpus(spark, groups=4, dim=32):
    """4 groups x 10 members: member i = e_g + (i*0.25)*e_{g+16},
    labels i % 2 interleaved along the exact cosine ranking
    1/sqrt(1+(i/4)^2) — the q_ivf_filtered_topk planted geometry."""
    members = (
        spark.range(groups)
        .select(F.col("id").cast("int").alias("g"))
        .select(
            "g", F.explode(F.sequence(F.lit(0), F.lit(9))).alias("i")
        )
    )
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda d: F.when(d == F.col("g"), F.lit(1.0))
        .when(
            d == F.col("g") + 16,
            F.col("i").cast("double") * F.lit(0.25),
        )
        .otherwise(F.lit(0.0)),
    )
    return members.select(
        (F.col("g") * 1000 + F.col("i")).cast("long").alias("vec_id"),
        vec.cast("array<float>").alias("embedding"),
        (F.col("i") % 2).cast("int").alias("label"),
    )


def _filter_queries(spark, groups=4, dim=32):
    return (
        spark.range(groups)
        .select(F.col("id").cast("int").alias("g"))
        .select(
            (F.col("g") * 1000 + 1_000_000).cast("long").alias(
                "query_id"
            ),
            F.transform(
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda d: F.when(
                    d == F.col("g"), F.lit(1.0)
                ).otherwise(F.lit(0.0)),
            ).cast("array<float>").alias("embedding"),
        )
    )


def test_filtered_ivf_search_semantics_and_plan(spark, tmp_path):
    """r14 (r13 verdict ask #1): the metadata predicate applies INSIDE
    the probed cells BEFORE top-k — the filtered top-3 is {i=1,3,5}
    per group while post-filtering the unfiltered top-3 ({0,1,2})
    would keep ONE row; the predicate and the cell pruning both reach
    the parquet scan (PushedFilters / PartitionFilters)."""
    import contextlib
    import io

    from oakstore_spark.operators.similarity import (
        build_ivf_index,
        search_ivf_index,
    )

    idx = str(tmp_path / "ivf_filt")
    build_ivf_index(
        _filter_corpus(spark), dim=32, index_dir=idx,
        n_centroids=4, meta_cols=["label"],
    )
    queries = _filter_queries(spark)
    # all cells probed -> exact, independent of quantizer quality
    out = search_ivf_index(
        spark, idx, queries, k=3, n_probe=4, filter="label = 1",
    ).collect()
    by_q: dict = {}
    for r in out:
        by_q.setdefault(int(r.query_id), []).append(int(r.vec_id))
    for g in range(4):
        got = sorted(v % 1000 for v in by_q[g * 1000 + 1_000_000])
        assert got == [1, 3, 5]  # NOT the unfiltered {0,1,2}
    # post-filtering the unfiltered top-3 under-returns: only i=1
    unf = search_ivf_index(spark, idx, queries, k=3, n_probe=4)
    lab = {
        int(r.vec_id): int(r.vec_id) % 2
        for r in unf.collect()
    }
    for g in range(4):
        top3 = [
            v for v in lab
            if v // 1000 == g and lab[v] == 1
        ]
        assert len(top3) == 1  # the under-return the filter prevents
    # plan pins on the probed-only filtered path
    probed = search_ivf_index(
        spark, idx, queries, k=3, n_probe=1, filter="label = 1",
        exact_fallback=False,
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        probed.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and "_cell" in plan
    assert "PushedFilters" in plan and "label" in plan


def test_filtered_ivf_starvation_fallback_exact(spark, tmp_path):
    """A min_candidates above what the probed cells can yield forces
    the starvation path; its answer must EQUAL the all-cells exact
    filtered scan, and a filter with zero admissible rows for some
    queries returns nothing for them (never unfiltered leakage)."""
    from oakstore_spark.operators.similarity import (
        build_ivf_index,
        search_ivf_index,
    )

    idx = str(tmp_path / "ivf_starve")
    build_ivf_index(
        _filter_corpus(spark), dim=32, index_dir=idx,
        n_centroids=4, meta_cols=["label"],
    )
    queries = _filter_queries(spark)
    starved = search_ivf_index(
        spark, idx, queries, k=3, n_probe=1, filter="label = 1",
        min_candidates=1000,
    ).orderBy("query_id", "rank").collect()
    exact = search_ivf_index(
        spark, idx, queries, k=3, n_probe=4, filter="label = 1",
    ).orderBy("query_id", "rank").collect()
    assert starved == exact
    # a highly selective filter: every returned id is admissible —
    # groups 2,3 (orthogonal to all admissible vectors) still get
    # their top-3, at cosine exactly 0 (top-k ranks admissible rows,
    # it never thresholds), and a zero-admissible filter returns
    # NOTHING (never unfiltered leakage)
    sel = search_ivf_index(
        spark, idx, queries, k=3, n_probe=1,
        filter="label = 1 AND vec_id < 1006", min_candidates=1000,
    ).collect()
    assert {int(r.query_id) for r in sel} == {
        1_000_000, 1_001_000, 1_002_000, 1_003_000
    }
    assert all(
        int(r.vec_id) % 2 == 1 and int(r.vec_id) < 1006 for r in sel
    )
    assert all(
        r.sim == 0.0
        for r in sel
        if int(r.query_id) >= 1_002_000
    )
    empty = search_ivf_index(
        spark, idx, queries, k=3, n_probe=1, filter="label = 9",
        min_candidates=1000,
    ).collect()
    assert empty == []


def test_filtered_ivfpq_search(spark, tmp_path):
    """IVFPQ filtered ADC search: meta columns persist through the
    codes table, the predicate applies before scoring, and the
    starvation fallback equals the direct all-cells filtered scan."""
    from oakstore_spark.operators.similarity import (
        build_ivfpq_index,
        search_ivfpq_index,
    )

    idx = str(tmp_path / "ivfpq_filt")
    build_ivfpq_index(
        _filter_corpus(spark), dim=32, index_dir=idx,
        n_cells=4, m=4, k=8, meta_cols=["label"],
    )
    queries = _filter_queries(spark)
    starved = search_ivfpq_index(
        spark, idx, queries, k_results=3, n_probe=1,
        filter="label = 1", min_candidates=1000,
    ).orderBy("query_id", "rank").collect()
    exact = search_ivfpq_index(
        spark, idx, queries, k_results=3, n_probe=4,
        filter="label = 1",
    ).orderBy("query_id", "rank").collect()
    assert starved == exact
    assert len(starved) == 12  # 4 queries x k=3
    assert all(int(r.vec_id) % 2 == 1 for r in starved)


def test_bm25_filter_ids(spark, tmp_path):
    """Filtered BM25: filter_ids semi-joins the matched postings before
    the pivot/score; surviving docs keep their corpus-level scores
    bit-identically (a filter constrains results, not statistics)."""
    from oakstore_spark.operators.text import (
        build_bm25_index,
        search_bm25_index,
    )

    docs = spark.createDataFrame(
        [
            (1, "spark shuffles data between stages"),
            (2, "spark broadcasts small tables"),
            (3, "ducks paddle in data lakes"),
            (4, "spark and ducks share the data lake"),
        ],
        ["doc_id", "text"],
    )
    idx = str(tmp_path / "bm25_filt")
    build_bm25_index(docs, idx, n_buckets=8)
    full = {
        int(r.doc_id): r.score_raw
        for r in search_bm25_index(
            spark, idx, ["spark", "data"], n_buckets=8
        ).collect()
    }
    allowed = spark.createDataFrame([(2,), (3,)], ["doc_id"])
    filt = {
        int(r.doc_id): r.score_raw
        for r in search_bm25_index(
            spark, idx, ["spark", "data"], n_buckets=8,
            filter_ids=allowed,
        ).collect()
    }
    assert set(filt) == {2, 3}
    for d, sc in filt.items():
        assert sc == full[d]  # statistics unchanged, scores identical


def test_doc_embed_planted_recovery_and_contract(spark):
    """r14 (r13 verdict ask #4): the in-engine text->vector chain.
    Near-copies (source + one marker token) recover their source as
    cosine top-1 over the pool; unrelated docs score far lower; docs
    with zero tokens are ABSENT; every component is an exact BIGINT
    (emb_q) with embedding = emb_q / scale."""
    import numpy as np

    from oakstore_spark.operators.text import doc_embed

    base = [
        (i, f"unique subject {i} " + " ".join(
            f"w{i}x{j}" for j in range(30)
        ))
        for i in range(12)
    ]
    corpus = base + [
        (i + 1000, t + " zzmarker") for i, t in base
    ] + [(9999, "")]
    df = spark.createDataFrame(corpus, ["doc_id", "text"])
    out = doc_embed(df, dim=16, n_buckets=256).collect()
    ids = {int(r.doc_id) for r in out}
    assert 9999 not in ids and len(ids) == 24
    v = {int(r.doc_id): np.array(r.embedding) for r in out}
    q = {int(r.doc_id): np.array(r.emb_q, dtype=np.int64) for r in out}
    for i in ids:
        assert np.allclose(v[i], q[i] / 1024.0)
    def cos(a, b):
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
    for i in range(12):
        sims = {j: cos(v[i + 1000], v[j]) for j in range(12)}
        top = max(sims, key=lambda j: sims[j])
        assert top == i  # each copy recovers ITS source
        assert sims[i] > 0.95
        others = [s for j, s in sims.items() if j != i]
        assert max(others) < 0.6


def test_doc_embed_empty_and_all_empty_corpus(spark):
    """Empty-corpus regression guard (construction is eager): an empty
    corpus — and a corpus whose every doc has zero alphanumeric tokens
    — must yield an empty result, not a construction-time error, on
    BOTH paths: the r16 size-gated driver fast path (empty tf pull)
    and the distributed path, whose idf weight table is one flagged-
    union collect where the global-aggregate leg always emits one
    row (_v = 0) on empty input, so n_docs = 0 and the weight table
    stays empty."""
    from oakstore_spark.operators.text import doc_embed

    empty = spark.createDataFrame([], "doc_id long, text string")
    assert doc_embed(empty, dim=4, n_buckets=16).collect() == []
    assert (
        doc_embed(
            empty, dim=4, n_buckets=16, driver_max_tf_rows=0
        ).collect()
        == []
    )

    no_terms = spark.createDataFrame(
        [(1, ""), (2, "!!!"), (3, "   ")], ["doc_id", "text"]
    )
    assert doc_embed(no_terms, dim=4, n_buckets=16).collect() == []
    assert (
        doc_embed(
            no_terms, dim=4, n_buckets=16, driver_max_tf_rows=0
        ).collect()
        == []
    )


def test_doc_embed_driver_distributed_parity(spark):
    """r16 regression guard: the size-gated driver fast path must be
    BIT-identical to the forced-distributed path
    (driver_max_tf_rows=0) — same doc set, same exact int64 emb_q,
    same float64 embedding — including string ids and docs that share
    buckets (idf weights below 1 doc^-1 exercise the integer DIV)."""
    from oakstore_spark.operators.text import doc_embed

    df = spark.createDataFrame(
        [
            ("a", "alpha beta gamma alpha"),
            ("b", "beta delta"),
            ("c", "epsilon zeta eta theta iota kappa"),
            ("d", ""),
        ],
        ["doc_id", "text"],
    )
    fast = {
        r["doc_id"]: (list(r.emb_q), list(r.embedding))
        for r in doc_embed(df, dim=6, n_buckets=32).collect()
    }
    slow = {
        r["doc_id"]: (list(r.emb_q), list(r.embedding))
        for r in doc_embed(
            df, dim=6, n_buckets=32, driver_max_tf_rows=0
        ).collect()
    }
    assert fast == slow and set(fast) == {"a", "b", "c"}


def test_ivf_rebalance_restores_recall_preserves_meta_tombstones(
    spark, tmp_path
):
    """r15 (r14 verdict ask #2): rebalance_ivf_index. A drifted batch
    added against the FROZEN quantizer piles into near-arbitrary cells
    (all centroid sims ~0) — after retraining on the deterministic
    md5 sample and reassigning, (a) cell skew drops, (b) a 1-probe
    search recovers the exact brute-force twin for EVERY live vector,
    (c) meta columns survive the rewrite (filtered search still
    works), (d) tombstoned ids stay invisible."""
    import numpy as np

    from oakstore_spark.operators.similarity import (
        add_to_ivf_index,
        build_ivf_index,
        cosine_topk,
        rebalance_ivf_index,
        remove_from_ivf_index,
        search_ivf_index,
    )

    rng = np.random.default_rng(5)
    dim = 32

    def cluster_rows(axis: int, base_id: int, lang: str):
        rows = []
        for j in range(5):
            v = np.zeros(dim)
            v[axis] = 1.0
            v = v + rng.normal(0, 0.01, dim)
            for twin in (0, 1):
                w = v + rng.normal(0, 0.003, dim)
                rows.append(
                    (base_id + 2 * j + twin,
                     [float(x) for x in w], lang)
                )
        return rows

    schema = "vec_id long, embedding array<float>, lang string"
    phase_a = [
        r
        for c in range(4)
        for r in cluster_rows(c, c * 10, "en" if c % 2 == 0 else "de")
    ]
    phase_b = [
        r
        for c in range(4)
        for r in cluster_rows(4 + c, 100 + c * 10, "xx")
    ]
    dfa = spark.createDataFrame(phase_a, schema)
    dfb = spark.createDataFrame(phase_b, schema)
    idx = str(tmp_path / "ivf_rb")
    build_ivf_index(dfa, dim=dim, index_dir=idx, n_centroids=4,
                    meta_cols=["lang"], seed=3)
    add_to_ivf_index(dfb.select("vec_id", "embedding"), idx)
    remove_from_ivf_index(
        spark.createDataFrame([(101,)], "vec_id long"), idx
    )

    stats = rebalance_ivf_index(
        spark, idx, n_centroids=8, sample_size=1000, seed=11
    )
    assert stats["n_vectors"] == 80  # tombstoned row still physical
    assert stats["n_centroids"] == 8
    assert stats["max_cell_frac_after"] < stats["max_cell_frac_before"]
    # 8 tight orthogonal clusters / 8 retrained centroids: every live
    # vector's 1-probe top-1 equals the exact brute-force answer
    live = spark.read.parquet(f"{idx}/vectors").where("vec_id != 101")
    # materialize: the second rebalance below swaps the files this
    # plan's listing references
    qrows = live.select(
        F.col("vec_id").alias("query_id"), "embedding"
    ).toPandas()
    queries = spark.createDataFrame(
        qrows, "query_id long, embedding array<float>"
    )
    live = spark.createDataFrame(
        live.toPandas(), "vec_id long, embedding array<float>, lang string, _cell int"
    )
    got = search_ivf_index(spark, idx, queries, k=1, n_probe=1).toPandas()
    exact = cosine_topk(
        live.select("vec_id", "embedding"), queries, k=1
    ).toPandas()
    g = {int(r.query_id): int(r.vec_id) for r in got.itertuples()}
    e = {int(r.query_id): int(r.vec_id) for r in exact.itertuples()}
    assert g == e
    assert 101 not in set(g.values())  # tombstone preserved
    # meta survived the rewrite: filtered search returns only 'en'
    f = search_ivf_index(
        spark, idx, queries, k=3, n_probe=8, filter="lang = 'en'"
    ).toPandas()
    en_ids = {r[0] for r in dfa.where("lang = 'en'")
              .select("vec_id").collect()}
    assert set(f["vec_id"].astype(int)) <= en_ids
    # deterministic: same seed+index state trains the same quantizer
    stats2 = rebalance_ivf_index(
        spark, idx, n_centroids=8, sample_size=1000, seed=11
    )
    got2 = search_ivf_index(spark, idx, queries, k=1, n_probe=1).toPandas()
    assert {int(r.query_id): int(r.vec_id) for r in got2.itertuples()} == g


def test_ivfpq_rebalance_restores_recall_and_tombstones(spark, tmp_path):
    """r15 (r14 verdict ask #2, PQ leg): rebalance_ivfpq_index — after
    a drifted add against the frozen quantizer+codebooks, retraining
    on the deterministic md5 corpus sample and re-encoding restores
    (a) cell balance and (b) exact planted recall: on an 8-orthogonal-
    cluster corpus each tight cluster gets its own cell and every live
    vector's 1-probe ADC top-1 is its twin; tombstoned ids stay
    invisible through the swap."""
    import numpy as np

    from oakstore_spark.operators.similarity import (
        add_to_ivfpq_index,
        build_ivfpq_index,
        rebalance_ivfpq_index,
        remove_from_ivf_index,
        search_ivfpq_index,
    )

    rng = np.random.default_rng(9)
    dim = 16

    def cluster_rows(axis: int, base_id: int):
        rows = []
        for j in range(5):
            v = np.zeros(dim)
            v[axis] = 1.0
            v = v + rng.normal(0, 0.004, dim)
            for twin in (0, 1):
                w = v + rng.normal(0, 0.001, dim)
                rows.append((base_id + 2 * j + twin,
                             [float(x) for x in w]))
        return rows

    schema = "vec_id long, embedding array<float>"
    phase_a = [r for c in range(4) for r in cluster_rows(c, c * 10)]
    phase_b = [r for c in range(4) for r in cluster_rows(4 + c, 100 + c * 10)]
    dfa = spark.createDataFrame(phase_a, schema)
    dfb = spark.createDataFrame(phase_b, schema)
    full = dfa.unionByName(dfb)
    idx = str(tmp_path / "ivfpq_rb")
    build_ivfpq_index(dfa, dim=dim, index_dir=idx, n_cells=4, m=4,
                      k=8, seed=3)
    add_to_ivfpq_index(dfb, idx)
    remove_from_ivf_index(
        spark.createDataFrame([(101,)], "vec_id long"), idx
    )

    stats = rebalance_ivfpq_index(
        full, dim, idx, n_cells=8, sample_size=1000, seed=17,
    )
    assert stats["n_cells"] == 8
    assert stats["n_vectors"] == 80
    assert stats["max_cell_frac_after"] < stats["max_cell_frac_before"]

    queries = full.where("vec_id != 101").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = search_ivfpq_index(
        spark, idx, queries, k_results=1, n_probe=1
    ).toPandas()
    g = {int(r.query_id): int(r.vec_id) for r in got.itertuples()}
    # every live vector's 1-probe top-1 lands in its OWN tight
    # cluster (8 orthogonal clusters / 8 retrained cells — the probed
    # cell is right again); exact-twin ids are not guaranteed because
    # within-cluster noise sits below PQ code resolution (identical
    # codes tie-break by id)
    assert set(g) == {r[0] for r in queries.select("query_id").collect()}
    for qid, hit in g.items():
        assert hit != 101  # tombstone invisible
        assert hit // 10 == qid // 10 and hit != qid, (qid, hit)
    assert 101 not in set(g.values())
