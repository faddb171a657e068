"""Unit tests for corpus-curation operators (operators/curation.py)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from oakstore_spark.operators.curation import (
    balanced_mix_sample,
    redact_pii,
    unigram_logprob,
)


def test_unigram_logprob_hand_computed(spark):
    # corpus: 6 tokens total; 'a' x3, 'b' x2, 'c' x1
    df = spark.createDataFrame(
        [(1, "a a b"), (2, "a b c")], ["doc_id", "text"]
    )
    out = unigram_logprob(df).toPandas().set_index("doc_id")
    p = {"a": 3 / 6, "b": 2 / 6, "c": 1 / 6}
    exp1 = (2 * math.log(p["a"]) + math.log(p["b"])) / 3
    exp2 = (math.log(p["a"]) + math.log(p["b"]) + math.log(p["c"])) / 3
    assert out.loc[1, "n_tokens"] == 3
    assert out.loc[1, "avg_logprob"] == pytest.approx(exp1)
    assert out.loc[2, "avg_logprob"] == pytest.approx(exp2)


def test_unigram_logprob_skips_empty_tokens(spark):
    df = spark.createDataFrame([(1, "x  x")], ["doc_id", "text"])
    out = unigram_logprob(df).toPandas()
    assert out.iloc[0]["n_tokens"] == 2  # double space -> no empty term
    assert out.iloc[0]["avg_logprob"] == pytest.approx(0.0)  # p(x)=1


def test_redact_pii(spark):
    rows = [
        (1, "mail bob.smith+x@corp.example.org now"),
        (2, "call 555-0199 or 555-12345"),  # second is 5 digits: no \b match
        (3, "clean text"),
    ]
    df = spark.createDataFrame(rows, ["id", "t"])
    out = df.select("id", redact_pii("t").alias("r")).toPandas().set_index("id")
    assert out.loc[1, "r"] == "mail <EMAIL> now"
    assert out.loc[2, "r"] == "call <PHONE> or 555-12345"
    assert out.loc[3, "r"] == "clean text"


def test_balanced_mix_sample_deterministic_and_balanced(spark):
    # 3 groups with skewed sizes 400/200/50 -> all downsample toward 50
    rows = [(i, "g%d" % (0 if i < 400 else (1 if i < 600 else 2))) for i in range(650)]
    df = spark.createDataFrame(rows, ["doc_id", "lang"])
    kept1 = balanced_mix_sample(df, "lang", "doc_id").toPandas()
    kept2 = balanced_mix_sample(df, "lang", "doc_id").toPandas()
    # deterministic: identical kept set across runs
    assert sorted(kept1.doc_id) == sorted(kept2.doc_id)
    sizes = kept1.groupby("lang").size()
    assert sizes["g2"] == 50  # smallest group: kept whole (f >= 1)
    # binomial tolerance: target 50, n=400/200 draws -> ~50 +- 3.5 sigma
    for g in ("g0", "g1"):
        assert 25 <= sizes[g] <= 80, (g, sizes[g])
    # membership is a pure function of the id: repartitioning can't change it
    kept3 = balanced_mix_sample(df.repartition(7), "lang", "doc_id").toPandas()
    assert sorted(kept3.doc_id) == sorted(kept1.doc_id)


def test_profile_table_counts_nulls_and_types(spark):
    from oakstore_spark.operators.curation import profile_table

    df = spark.createDataFrame(
        [(1, None, "ab"), (2, 2.5, None), (None, 3.5, "abcd")],
        "k long, v double, s string",
    )
    out = profile_table(df).toPandas().set_index("column")
    assert out.loc["k", "n_nulls"] == 1 and out.loc["k", "n_distinct"] == 2
    assert out.loc["v", "n_nulls"] == 1
    assert (out.loc["v", "vmin"], out.loc["v", "vmax"]) == (2.5, 3.5)
    assert (out.loc["s", "vmin"], out.loc["s", "vmax"]) == (2.0, 4.0)  # lengths


def test_target_mix_sample_hits_token_shares(spark):
    """Synthetic corpus with lopsided token mass: kept token shares
    land near the requested mixture, the binding group keeps all rows,
    and membership is deterministic."""
    rows = []
    did = 0
    for g, n_docs, toks in (("a", 400, 100), ("b", 100, 100), ("c", 50, 100)):
        for _ in range(n_docs):
            rows.append((did, g, toks))
            did += 1
    df = spark.createDataFrame(rows, "doc_id long, g string, toks long")
    from oakstore_spark.operators.curation import target_mix_sample

    targets = {"a": 0.4, "b": 0.4, "c": 0.2}
    kept = target_mix_sample(df, "g", "doc_id", "toks", targets).toPandas()
    tok_by_g = kept.groupby("g")["toks"].sum()
    # binding group: b has 10000 tokens / 0.4 target -> c = 25000; c's
    # quota = 5000 = all of c -> both b and c keep everything
    assert tok_by_g["b"] == 10_000
    assert tok_by_g["c"] == 5_000
    # a downsamples toward 10000 tokens (binomial: 100 draws, p=0.25)
    assert 6_000 <= tok_by_g["a"] <= 14_000, tok_by_g["a"]
    kept2 = target_mix_sample(df, "g", "doc_id", "toks", targets).toPandas()
    assert sorted(kept2.doc_id) == sorted(kept.doc_id)
    # absent group weight -> dropped entirely
    kept3 = target_mix_sample(df, "g", "doc_id", "toks", {"a": 1.0}).toPandas()
    assert set(kept3.g) == {"a"}


def test_train_bpe_matches_reference_implementation(spark):
    """Distributed BPE merge training must reproduce the classic
    single-node algorithm exactly: same merge sequence (tie-break =
    count desc, then lexicographic on the 'left|right' key) and same
    final symbolization of every word."""
    from oakstore_spark.operators.text import train_bpe

    texts = [
        "low low low low low",
        "lower lower newest newest",
        "newest newest newest newest",
        "wider wider wider new new",
    ]
    sdf = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["doc_id", "text"])
    # driver_vocab_max=0 forces the DISTRIBUTED loop (the >gate path
    # that runs at web scale); the driver fast path is checked below
    merges_df, vocab_df = train_bpe(
        sdf, "text", n_merges=12, min_pair_freq=2, driver_vocab_max=0
    )
    got_merges = [
        (r["rank"], r["left"], r["right"], r["pair_freq"])
        for r in merges_df.orderBy("rank").collect()
    ]
    got_vocab = {
        r["word"]: list(r["symbols"]) for r in vocab_df.collect()
    }
    vocab_df.unpersist()

    # single-node reference (Sennrich-style on a word-frequency dict)
    freqs: dict[str, int] = {}
    for t in texts:
        for w in t.split():
            freqs[w] = freqs.get(w, 0) + 1
    symbolized = {w: list(w) + ["</w>"] for w in freqs}
    exp_merges = []
    for rank in range(12):
        counts: dict[tuple, int] = {}
        for w, syms in symbolized.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + freqs[w]
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0][0] + "|" + kv[0][1]))
        if best[1] < 2:
            break
        (l, r), c = best
        exp_merges.append((rank, l, r, c))
        for w, syms in symbolized.items():
            merged, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    merged.append(l + r)
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            symbolized[w] = merged

    assert got_merges == exp_merges, (got_merges, exp_merges)
    assert got_vocab == symbolized

    # driver fast path (default gate) must agree with the distributed loop
    fast_m, fast_v = train_bpe(sdf, "text", n_merges=12, min_pair_freq=2)
    fast_merges = [
        (r["rank"], r["left"], r["right"], r["pair_freq"])
        for r in fast_m.orderBy("rank").collect()
    ]
    fast_vocab = {r["word"]: list(r["symbols"]) for r in fast_v.collect()}
    assert fast_merges == exp_merges
    assert fast_vocab == symbolized


def test_filter_with_metrics_single_pass_accounting(spark):
    """Observation metrics must report pre-filter volume and kept rows
    from the SAME action that produced the filtered result — no second
    scan."""
    from oakstore_spark.operators.curation import filter_with_metrics
    from pyspark.sql import functions as F

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    total = d.count()
    kept_df, obs = filter_with_metrics(
        d,
        F.col("n_chars") >= 200,
        metric_cols={"chars": F.col("n_chars")},
    )
    kept = kept_df.count()  # the single action
    m = obs.get
    assert m["n_in"] == total
    assert m["n_kept"] == kept
    exact_chars = d.agg(F.sum("n_chars")).first()[0]
    assert m["sum_chars"] == exact_chars


def test_apply_bpe_encodes_with_learned_merges(spark):
    """apply_bpe must replay the learned merges exactly: encoding the
    TRAINING corpus reproduces each word's final training
    symbolization; an unseen word merges only where learned pairs
    apply."""
    from oakstore_spark.operators.text import apply_bpe, train_bpe

    texts = [
        "low low low low low",
        "lower lower newest newest",
        "newest newest newest newest",
        "wider wider wider new new",
    ]
    sdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    merges, vocab = train_bpe(sdf, "text", n_merges=12, min_pair_freq=2)
    final_syms = {r["word"]: list(r["symbols"]) for r in vocab.collect()}

    enc = apply_bpe(sdf, merges, "text").collect()
    for r in enc:
        expect: list[str] = []
        for w in texts[r["doc_id"]].split():
            expect.extend(final_syms[w])
        assert list(r["bpe_tokens"]) == expect, (r["doc_id"], r["bpe_tokens"])

    unseen = spark.createDataFrame([(0, "lowest")], ["doc_id", "text"])
    (row,) = apply_bpe(unseen, merges, "text").collect()
    # replay by hand on the reference merges
    syms = [*"lowest", "</w>"]
    for m in merges.orderBy("rank").collect():
        left, right = m["left"], m["right"]
        merged, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                merged.append(left + right)
                i += 2
            else:
                merged.append(syms[i])
                i += 1
        syms = merged
    assert list(row["bpe_tokens"]) == syms


# --- rank statistics + curation diagnostics (queries/curation.py) --------
# Each query reads <sf_dir>/<table>.parquet; a tmp dir with tiny
# hand-built tables makes the expectations exactly computable.


@pytest.fixture(scope="module")
def stats_sf_dir(spark, tmp_path_factory):
    import pandas as pd

    d = tmp_path_factory.mktemp("stats_sf")
    # lineitem: extendedprice strictly monotonic in quantity, no ties
    pd.DataFrame(
        {
            "l_quantity": [float(q) for q in range(1, 9)],
            "l_extendedprice": [float(q * q) for q in range(1, 9)],
        }
    ).to_parquet(d / "lineitem.parquet")
    # events: every purchase value above every view value; user 1 hot
    ts = pd.to_datetime("2024-01-01")
    pd.DataFrame(
        {
            "event_id": range(10),
            "ts": [ts] * 10,
            "user_id": [1] * 6 + [2, 2, 3, 3],
            "event_type": ["purchase"] * 3 + ["view"] * 4 + ["error"] * 3,
            "value": [10.0, 11.0, 12.0, 1.0, 2.0, 3.0, 4.0, 0.0, 0.0, 0.0],
        }
    ).to_parquet(d / "events.parquet")
    # documents: srcA == srcB vocab exactly; srcC disjoint
    pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": ["alpha beta", "beta alpha", "gamma delta"],
            "lang": ["en", "en", "en"],
            "source": ["srcA", "srcB", "srcC"],
            "n_chars": [10, 10, 0],
        }
    ).to_parquet(d / "documents.parquet")
    return str(d)


def test_spearman_perfect_monotonic(spark, stats_sf_dir):
    from oakstore_spark.queries.curation import q_spearman_corr

    row = q_spearman_corr(spark, stats_sf_dir).collect()[0]
    assert row["spearman_rho"] == pytest.approx(1.0)
    assert row["n_rows"] == 8


def test_mann_whitney_fully_separated(spark, stats_sf_dir):
    from oakstore_spark.queries.curation import q_mann_whitney

    row = q_mann_whitney(spark, stats_sf_dir).collect()[0]
    # all purchases above all views -> U = na*nb (maximal), z > 0
    assert row["n_a"] == 3 and row["n_b"] == 4
    assert row["u_stat"] == pytest.approx(12.0)
    assert row["z_approx"] > 0


def test_skew_profile_hot_key(spark, stats_sf_dir):
    from oakstore_spark.queries.curation import q_skew_profile

    row = q_skew_profile(spark, stats_sf_dir).collect()[0]
    assert row["n_rows"] == 10 and row["n_keys"] == 3
    assert row["max_cnt"] == 6
    # ceil(0.01*3)=1 -> hottest key (6 rows) holds the top-1% share
    assert row["top1pct_share"] == pytest.approx(0.6)
    assert row["skew_ratio"] == pytest.approx(6 * 3 / 10, abs=1e-4)


def test_quality_weighted_sample_extremes(spark, stats_sf_dir):
    from oakstore_spark.queries.curation import q_quality_weighted_sample

    row = q_quality_weighted_sample(spark, stats_sf_dir).collect()[0]
    # weight(n_chars=10)=1.0 -> u<1 always keeps; weight(0)=0 never
    assert row["lang"] == "en"
    assert row["n_total"] == 3 and row["n_kept"] == 2


def test_source_overlap_mirror_sources(spark, stats_sf_dir):
    from oakstore_spark.queries.curation import q_source_overlap

    out = {
        (r["src_a"], r["src_b"]): r
        for r in q_source_overlap(spark, stats_sf_dir).collect()
    }
    # identical vocab -> jaccard 1.0; disjoint srcC never pairs
    assert out[("srcA", "srcB")]["jaccard"] == pytest.approx(1.0)
    assert out[("srcA", "srcB")]["n_common"] == 2
    assert all(
        "srcC" not in pair for pair in out
    ), "disjoint source must produce no overlap rows"


def test_bigram_logprob_hand_computed(spark):
    import math

    from oakstore_spark.operators.curation import bigram_logprob

    df = spark.createDataFrame(
        [(1, "a b a"), (2, "a b")], ["doc_id", "text"]
    )
    out = {r["doc_id"]: r for r in bigram_logprob(df).collect()}
    # uni: a=3 b=2 T=5; bigrams: (a,b)=2 (b,a)=1
    p_ab = 0.75 * 2 / 3 + 0.25 * 2 / 5      # 0.6
    p_ba = 0.75 * 1 / 2 + 0.25 * 3 / 5      # 0.525
    assert out[1]["n_bigrams"] == 2
    assert out[1]["avg_logprob"] == pytest.approx(
        (math.log(p_ab) + math.log(p_ba)) / 2
    )
    assert out[2]["n_bigrams"] == 1
    assert out[2]["avg_logprob"] == pytest.approx(math.log(p_ab))


def test_cms_estimates_never_undercount_and_bounded(spark):
    from oakstore_spark.queries.training_ext import _CMS_W, q_cms_heavy_hitters

    rows = q_cms_heavy_hitters(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 20
    # total token mass bounds the classic CMS overcount: err <= 2N/w whp
    import duckdb

    n_tokens = duckdb.sql(
        "SELECT count(*) FROM ("
        "SELECT unnest(string_split_regex(trim(regexp_replace("
        "regexp_replace(lower(text), '[^a-z0-9\\s]', '', 'g'),"
        "'\\s+', ' ', 'g')), ' ')) AS t "
        "FROM read_parquet('/root/testdata/sf0.001/documents.parquet')"
        ") WHERE t <> ''"
    ).fetchone()[0]
    bound = 2 * n_tokens / _CMS_W + 1
    for r in rows:
        assert r["cms_est"] >= r["exact_n"], "CMS must never undercount"
        assert r["cms_est"] - r["exact_n"] <= bound


def test_assign_contiguous_ids_matches_global_row_number(spark):
    import random

    from oakstore_spark.operators.scaling import assign_contiguous_ids

    keys = list(range(1000))
    random.Random(7).shuffle(keys)
    df = spark.createDataFrame(
        [(k, k * 2.5) for k in keys], ["k", "v"]
    ).repartition(7)
    spark.catalog.clearCache()  # scope the leak assertion below to THIS op
    out = assign_contiguous_ids(df, "k", num_partitions=5)
    got = sorted((r["k"], r["seq_id"]) for r in out.collect())
    assert got == [(k, k + 1) for k in range(1000)]
    # payload column rides along untouched
    row = out.filter(F.col("k") == 500).collect()[0]
    assert row["v"] == 1250.0 and row["seq_id"] == 501
    # no session-lifetime storage leak: the partitioning pin is a local
    # checkpoint (ContextCleaner-released on GC), never a CacheManager
    # persist that only an explicit unpersist would free
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty()


def test_prefix_sums_matches_driver_cumsum(spark):
    """Global inclusive prefix sums over a shuffled multi-partition
    input must equal the driver-side cumsum in key order; the grand
    total falls out of the same counts job; payload columns ride
    along; no cache-manager storage leak."""
    import random

    from oakstore_spark.operators.scaling import prefix_sums

    rng = random.Random(11)
    vals = {k: rng.randint(0, 99) for k in range(800)}
    keys = list(vals)
    rng.shuffle(keys)
    df = spark.createDataFrame(
        [(k, vals[k], f"p{k}") for k in keys], ["k", "v", "tag"]
    ).repartition(9)
    spark.catalog.clearCache()
    out, total = prefix_sums(
        df, "k", "v", num_partitions=5, return_total=True
    )
    got = {r["k"]: (r["prefix_sum"], r["tag"]) for r in out.collect()}
    acc = 0
    for k in range(800):
        acc += vals[k]
        assert got[k] == (acc, f"p{k}")
    assert total == acc
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty()


def test_pack_sequences_boundaries_and_empty_docs(spark):
    """Hand-checked packing at seq_len=10: tokens [4, 9, 0, 7, 10]
    give offsets [0,4,13,13,20] — doc 2 (9 tokens) straddles windows
    0-1 (n_seqs 2), the zero-token doc carries NULL seq fields, and
    the 10-token doc fills window 2 exactly (n_seqs 1)."""
    import pytest as _pytest

    from oakstore_spark.operators.curation import pack_sequences

    df = spark.createDataFrame(
        [(1, 4), (2, 9), (3, 0), (4, 7), (5, 10)], ["doc", "t"]
    )
    out = {
        r.doc: r
        for r in pack_sequences(df, "doc", "t", seq_len=10).collect()
    }
    assert (out[1].start_tok, out[1].end_tok) == (0, 4)
    assert (out[1].first_seq, out[1].last_seq, out[1].n_seqs) == (0, 0, 1)
    assert (out[2].start_tok, out[2].end_tok) == (4, 13)
    assert (out[2].first_seq, out[2].last_seq, out[2].n_seqs) == (0, 1, 2)
    assert (out[3].start_tok, out[3].end_tok) == (13, 13)
    assert out[3].first_seq is None and out[3].n_seqs is None
    assert (out[4].first_seq, out[4].last_seq) == (1, 1)
    assert (out[5].start_tok, out[5].end_tok) == (20, 30)
    assert (out[5].first_seq, out[5].last_seq, out[5].n_seqs) == (2, 2, 1)
    with _pytest.raises(ValueError):
        pack_sequences(df, "doc", "t", seq_len=0)


def test_ks_binned_brackets_exact(spark):
    """The binned-ECDF KS must bracket the exact statistic:
    D_binned <= D_exact <= D_binned + max_bin_mass — the self-reported
    error bound makes the sketch trustworthy without the exact sibling's
    global sort. Also checked on a synthetic shifted pair where the true
    D is large, so the bracket is exercised away from zero."""
    from oakstore_spark.operators.curation import ks_binned_stat
    from oakstore_spark.queries.curation import q_ks_binned, q_ks_two_sample

    sf = "/root/testdata/sf0.01"
    exact = q_ks_two_sample(spark, sf).collect()[0]
    binned = q_ks_binned(spark, sf).collect()[0]
    assert binned["n_a"] == exact["n_a"] and binned["n_b"] == exact["n_b"]
    assert binned["ks_d"] <= exact["ks_d"] + 1e-6
    assert exact["ks_d"] - binned["ks_d"] <= binned["max_bin_mass"] + 1e-6
    # 256 fixed-width bins over this value range: the bound itself is tight
    assert binned["max_bin_mass"] < 0.1

    # synthetic: N(0-ish) vs shifted — exact D computable in closed form
    # from the ECDFs; use integer grids so both engines see exact values
    rows = [(float(i % 100), 1, 0) for i in range(1000)] + [
        (float(i % 100) + 30.0, 0, 1) for i in range(1000)
    ]
    s = spark.createDataFrame(rows, "value double, a int, b int")
    got = ks_binned_stat(s, "value", "a", "b", n_bins=130).collect()[0]
    # true D: samples are uniform on [0,99] and [30,129] -> D = 0.30
    assert abs(got["ks_d"] - 0.30) <= got["max_bin_mass"] + 1e-6
    assert got["ks_d"] <= 0.30 + 1e-6


def test_fixed_count_sample_exact_n_and_deterministic(spark):
    from oakstore_spark.queries.training_ext import q_fixed_count_sample

    a = q_fixed_count_sample(spark, "/root/testdata/sf0.001").collect()
    b = q_fixed_count_sample(spark, "/root/testdata/sf0.001").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    per_lang = {}
    for r in a:
        per_lang.setdefault(r["lang"], []).append(r["rk"])
    for lang, rks in per_lang.items():
        assert sorted(rks) == list(range(1, len(rks) + 1))
        assert len(rks) <= 30


@pytest.fixture(scope="module")
def phrase_sf_dir(spark, tmp_path_factory):
    import pandas as pd

    d = tmp_path_factory.mktemp("phrase_sf")
    pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "x y x y",              # bigrams: (x,y)x2 (y,x)x1
                "x y",                  # (x,y)x1
                "a b c d e f",          # 5-gram shingle source
            ],
            "lang": ["en"] * 3,
            "source": ["s"] * 3,
            "n_chars": [7, 3, 11],
        }
    ).to_parquet(d / "documents.parquet")
    return str(d)


def test_phrase_search_counts_adjacent_hits(spark, phrase_sf_dir):
    from oakstore_spark.queries.llm import q_phrase_search

    # top bigram is (x, y) with 3 occurrences; phrase hits per doc:
    out = {r["doc_id"]: r["n_hits"] for r in
           q_phrase_search(spark, phrase_sf_dir).collect()}
    assert out == {1: 2, 2: 1}


def test_ngram_novelty_first_doc_wins(spark, tmp_path_factory):
    import pandas as pd

    from oakstore_spark.queries.llm import q_ngram_novelty

    d = tmp_path_factory.mktemp("novelty_sf")
    pd.DataFrame(
        {
            "doc_id": [1, 2],
            "text": ["a b c d e f", "a b c d e x"],
            "lang": ["en"] * 2,
            "source": ["s"] * 2,
            "n_chars": [11, 11],
        }
    ).to_parquet(d / "documents.parquet")
    out = {r["doc_id"]: r for r in
           q_ngram_novelty(spark, str(d)).collect()}
    # doc1: shingles {"a b c d e","b c d e f"} both first here -> 1.0
    # doc2: {"a b c d e" (seen in doc1), "b c d e x" (new)} -> 0.5
    assert out[1]["n_shingles"] == 2 and out[1]["novel_frac"] == 1.0
    assert out[2]["n_shingles"] == 2 and out[2]["novel_frac"] == 0.5


def test_irls_recovers_planted_rule(spark):
    """Distributed IRLS must separate a linearly separable planted rule
    (y = x1 > 3) with near-perfect training accuracy and a positive
    learned slope on the informative feature."""
    import numpy as np

    from oakstore_spark.operators.curation import fit_logistic_irls

    rng = np.random.default_rng(3)
    x1 = rng.uniform(0, 6, 400)
    x2 = rng.uniform(0, 1, 400)          # noise feature
    y = (x1 > 3).astype(float)
    df = spark.createDataFrame(
        [(float(a), float(b), float(c)) for a, b, c in zip(x1, x2, y)],
        ["x1", "x2", "y"],
    )
    w = fit_logistic_irls(df, ["x1", "x2"], "y", n_iter=8)
    assert w[1] > 0, "slope on the informative feature must be positive"
    eta = w[0] + w[1] * x1 + w[2] * x2
    acc = float(np.mean((eta > 0) == (y > 0.5)))
    assert acc >= 0.98, acc


def test_quality_classifier_beats_chance(spark):
    from oakstore_spark.queries.curation import q_quality_classifier

    rows = q_quality_classifier(spark, "/root/testdata/sf0.001").collect()
    n = sum(r["n_docs"] for r in rows)
    correct = sum(r["n_correct"] for r in rows)
    assert correct / n >= 0.75, (correct, n)


def test_pii_luhn_and_detection(spark):
    """Luhn separates real card numbers from order ids; octet-validated
    IPv4; nulls degrade; multiple matches counted."""
    from oakstore_spark.operators.pii import detect_pii, redact_pii_all

    rows = [
        # valid Visa test number, dashed layout
        (1, "pay 4532-0151-1283-0366 now"),
        # same digits, check digit flipped -> candidate but NOT valid
        (2, "order 4532-0151-1283-0367 shipped"),
        # valid Mastercard test number, no separators
        (3, "card 5500005555555559."),
        # 12 digits: too short to even be a candidate
        (4, "ref 123456789012 ok"),
        # two IPs, one bad octet
        (5, "from 10.0.0.1 to 256.1.1.1 and 172.16.254.3"),
        (6, None),
        (7, "a@b.io mail and 555-1234 phone"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    out = {r.id: r for r in detect_pii(df, "text").collect()}
    assert (out[1].n_card_candidates, out[1].n_cards_valid) == (1, 1)
    assert (out[2].n_card_candidates, out[2].n_cards_valid) == (1, 0)
    assert (out[3].n_card_candidates, out[3].n_cards_valid) == (1, 1)
    assert (out[4].n_card_candidates, out[4].n_cards_valid) == (0, 0)
    assert out[5].n_ipv4 == 2 and not out[5].has_pii is None
    assert out[6].has_pii is None or out[6].n_emails is None
    assert (out[7].n_emails, out[7].n_phones, out[7].has_pii) == (1, 1, True)

    red = {r.id: r.r for r in df.select(
        "id", redact_pii_all("text").alias("r")).collect()}
    assert red[1] == "pay <CARD> now"
    assert red[2] == "order 4532-0151-1283-0367 shipped"  # invalid kept
    assert red[3] == "card <CARD>."
    assert red[5] == "from <IP> to 256.1.1.1 and <IP>"
    assert red[6] is None
    assert red[7] == "<EMAIL> mail and <PHONE> phone"


def test_label_vote_ties_and_abstains(spark):
    from oakstore_spark.operators.labeling import (
        apply_label_functions,
        label_function_diagnostics,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, 2, 2, 7), (2, 5, 3, 3), (3, None, None, None),
         (4, 9, None, None), (5, 1, 2, 1)],
        "doc_id long, a int, b int, c int",
    )
    lfs = {"la": F.col("a"), "lb": F.col("b"), "lc": F.col("c")}
    out = {r.doc_id: r for r in apply_label_functions(df, lfs).collect()}
    assert out[1].vote == 2 and out[1].n_votes == 3 and out[1].conflict
    # three-way tie 5/3/3? b=3,c=3 beat a=5 -> 3; smallest on ties:
    assert out[2].vote == 3 and out[2].n_distinct == 2
    assert out[3].vote is None and out[3].n_votes == 0
    assert not out[3].conflict
    assert out[4].vote == 9 and out[4].n_votes == 1
    # 1,2,1 -> label 1 wins 2:1
    assert out[5].vote == 1
    # tie between distinct labels resolves to the SMALLEST label
    df2 = spark.createDataFrame([(1, 7, 4)], "doc_id long, a int, b int")
    got = apply_label_functions(
        df2, {"la": F.col("a"), "lb": F.col("b")}
    ).collect()[0]
    assert got.vote == 4 and got.conflict

    diag = {r.lf_idx: r for r in label_function_diagnostics(
        apply_label_functions(df, lfs)).collect()}
    assert diag[0].n_voted == 4 and diag[0].coverage == 4 / 5
    assert diag[1].n_voted == 3 and diag[2].n_conflict >= 1


def test_kneser_ney_hand_computed(spark):
    """Tiny corpus replayed by hand: 'a b'x2 + 'a c' + 'b a'.
    Bigrams: (a,b):2 (a,c):1 (b,a):1 -> B=3; ctx a: c1=3 n1f=2;
    ctx b: c1=1 n1f=1; cont b: n1b=1, c: 1, a: 1."""
    import math

    from oakstore_spark.operators.curation import kneser_ney_logprob

    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "a c"), (4, "b a")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r.asDict()
        for r in kneser_ney_logprob(docs).collect()
    }

    def p(cb, n1f, n1b, c1, bt=3, d=0.75):
        return (max(cb - d, 0.0) + (d * n1f) * (n1b / bt)) / c1

    p_ab = p(2, 2, 1, 3)
    p_ac = p(1, 2, 1, 3)
    p_ba = p(1, 1, 1, 1)
    assert out[1]["n_bigrams"] == 1
    assert abs(out[1]["avg_logprob"] - math.log(p_ab)) < 1e-12
    assert abs(out[3]["avg_logprob"] - math.log(p_ac)) < 1e-12
    assert abs(out[4]["avg_logprob"] - math.log(p_ba)) < 1e-12
    # continuation insight: P(b|a) discounts mass to back-off; total
    # conditional mass for context 'a' stays 1
    assert abs(p_ab + p_ac + p(0, 2, 1, 3) - 1.0) < 1e-12


def test_temperature_mix_lifts_low_resource(spark):
    """Skewed groups 1600:100: T=2 keeps the small group whole and
    downsamples the big one toward sqrt proportions (keep-rate
    sqrt ratio = 1/4); T=1 is a no-op (natural proportions feasible
    with c = n/w maximal -> f == 1 for every group)."""
    from oakstore_spark.operators.curation import temperature_mix_sample

    rows = [(i, "big" if i < 1600 else "small") for i in range(1700)]
    df = spark.createDataFrame(rows, "doc_id long, grp string")
    kept = temperature_mix_sample(df, "grp", "doc_id", temperature=2.0)
    counts = {r["grp"]: r["n"] for r in
              kept.groupBy("grp").agg(F.count("*").alias("n")).collect()}
    assert counts["small"] == 100          # binding group intact
    # expected keep-rate for big: (sqrt(1600)/sqrt(100)) * 100 / 1600 = 1/4
    assert 330 <= counts["big"] <= 470     # binomial around 400
    t1 = temperature_mix_sample(df, "grp", "doc_id", temperature=1.0)
    assert t1.count() == 1700


def test_leakage_safe_split_no_straddle(spark):
    """Structural guarantee: every near-dup pair lands in one split."""
    from oakstore_spark.operators.dedup import (
        dedup_clusters,
        minhash_lsh_pairs,
    )

    base = "the quick brown fox jumps over the lazy dog " * 6
    rows = [(i, base + f"tail {i % 3}") for i in range(30)] + [
        (100 + i, f"unique document number {i} with its own words {i}")
        for i in range(10)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = minhash_lsh_pairs(df, "doc_id", "text", threshold=0.85)
    clusters = dedup_clusters(pairs).select(
        F.col("id").alias("doc_id"), "cluster_id"
    )
    rep = df.select("doc_id").join(clusters, "doc_id", "left").select(
        "doc_id", F.coalesce("cluster_id", "doc_id").alias("rep")
    )
    u = F.conv(
        F.substring(F.md5(F.col("rep").cast("string")), 1, 8), 16, 10
    ).cast("bigint")
    split = rep.select(
        "doc_id",
        F.when(u < 3435973836, F.lit("train"))
        .when(u < 3865470566, F.lit("val"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )
    sp = {r["doc_id"]: r["split"] for r in split.collect()}
    for p in pairs.collect():
        assert sp[p["id_a"]] == sp[p["id_b"]], (p["id_a"], p["id_b"])


def test_train_unigram_lm_matches_reference_implementation(spark):
    """Unigram-LM (SentencePiece-style, hard-EM/Viterbi variant)
    training must reproduce an independent single-node reference
    exactly on BOTH paths: same piece table, counts, and log-probs
    after seed -> n_iters EM rounds -> prune (ties: seed/prune by
    (weight desc, piece asc); Viterbi by score then longer-final-piece).
    driver_vocab_max=0 forces the DISTRIBUTED loop."""
    import math

    from oakstore_spark.operators.text import train_unigram_lm

    texts = [
        "banana bandana ban ban banana",
        "cabana banana band bandana",
        "an anna banal canal ban",
        "nab nab an cab cabana",
    ]
    sdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    VS, SS, ML, IT = 24, 40, 4, 3

    # ---- independent reference ----
    freqs: dict = {}
    for t in texts:
        for w in t.split():
            freqs[w] = freqs.get(w, 0) + 1
    weights: dict = {}
    for w, fw in freqs.items():
        for i in range(len(w)):
            for ln in range(1, min(ML, len(w) - i) + 1):
                s = w[i : i + ln]
                weights[s] = weights.get(s, 0) + fw
    seen_chars = {p for p in weights if len(p) == 1}

    def select(table, cap):
        chars = {p: c for p, c in table.items() if len(p) == 1}
        multi = sorted(
            ((p, c) for p, c in table.items() if len(p) > 1),
            key=lambda kv: (-kv[1], kv[0]),
        )[: max(0, cap - len(chars))]
        out = dict(chars)
        out.update(multi)
        return out

    def viterbi(word, logp):
        n = len(word)
        NEG = float("-inf")
        best, back = [NEG] * (n + 1), [0] * (n + 1)
        best[0] = 0.0
        for i in range(1, n + 1):
            for j in range(max(0, i - ML), i):
                lp = logp.get(word[j:i])
                if lp is None or best[j] == NEG:
                    continue
                c = best[j] + lp
                if c > best[i]:
                    best[i], back[i] = c, j
        if best[n] == NEG:
            return None
        out, i = [], n
        while i > 0:
            out.append(word[back[i]:i])
            i = back[i]
        return out[::-1]

    counts = select(weights, SS)
    for _ in range(IT):
        total = sum(counts.values())
        logp = {p: math.log(c) - math.log(total) for p, c in counts.items()}
        new: dict = {}
        for w, fw in freqs.items():
            seg = viterbi(w, logp)
            if seg is None:
                continue
            for p in seg:
                new[p] = new.get(p, 0) + fw
        counts = {p: c for p, c in new.items() if c > 0}
        for ch in seen_chars:
            counts.setdefault(ch, 1)
    counts = select(counts, VS)
    total = sum(counts.values())
    expect = {
        p: (c, math.log(c) - math.log(total)) for p, c in counts.items()
    }

    for gate in (0, 200_000):  # distributed loop, then driver fast path
        got = {
            r["piece"]: (r["count"], r["logprob"])
            for r in train_unigram_lm(
                sdf, "text", vocab_size=VS, seed_size=SS,
                max_piece_len=ML, n_iters=IT, driver_vocab_max=gate,
            ).collect()
        }
        assert set(got) == set(expect), (gate, set(got) ^ set(expect))
        for p, (c, lp) in expect.items():
            assert got[p][0] == c, (gate, p, got[p], c)
            assert got[p][1] == lp, (gate, p)  # identical float tree


def test_apply_unigram_encodes_and_unk(spark):
    """apply_unigram replays training's Viterbi (longer-final-piece
    ties), concatenated tokens reassemble each word, and a word with
    an out-of-vocabulary character degrades to one raw <unk>-style
    token rather than vanishing."""
    from oakstore_spark.operators.text import (
        apply_unigram,
        train_unigram_lm,
    )

    texts = ["banana bandana ban", "cabana banana band"]
    sdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    pieces = train_unigram_lm(
        sdf, "text", vocab_size=16, seed_size=32, max_piece_len=4,
        n_iters=2,
    )
    vocab = {r["piece"] for r in pieces.collect()}
    enc_df = spark.createDataFrame(
        [(1, "banana band"), (2, "banzzz9xq")], ["doc_id", "text"]
    )
    out = {
        r["doc_id"]: list(r["unigram_tokens"])
        for r in apply_unigram(enc_df, pieces).collect()
    }
    # every emitted in-vocab token is a trained piece; words reassemble
    assert "".join(t for t in out[1]) == "bananaband"
    assert all(t in vocab for t in out[1])
    # OOV chars ('9','x','q','z' may be absent) -> single raw token
    assert out[2] == ["banzzz9xq"] or all(
        t in vocab for t in out[2]
    )


# --- market-basket affinity ------------------------------------------------


def test_association_rules_hand_values(spark):
    from oakstore_spark.operators.affinity import association_rules

    # 4 baskets; duplicate (b1, x) row exercises presence-not-multiplicity
    rows = [
        (1, "x"), (1, "x"), (1, "y"),
        (2, "x"), (2, "y"),
        (3, "x"), (3, "z"),
        (4, "y"),
    ]
    df = spark.createDataFrame(rows, ["basket", "item"])
    # min_support 0.5 -> threshold 2 baskets: x(3), y(3) frequent, z(1)
    # pruned; pair (x,y) in baskets 1,2 -> n_ab=2 qualifies.
    out = association_rules(df, "basket", "item", min_support=0.5)
    got = {(r.antecedent, r.consequent): r for r in out.collect()}
    assert set(got) == {("x", "y"), ("y", "x")}
    xy = got[("x", "y")]
    assert xy.n_ab == 2 and xy.n_ante == 3 and xy.n_cons == 3
    assert xy.support == 2 / 4
    assert xy.confidence == 2 / 3
    assert xy.lift == (2.0 * 4) / (3.0 * 3)
    yx = got[("y", "x")]
    assert yx.confidence == 2 / 3  # symmetric counts here
    assert yx.lift == xy.lift  # lift is direction-free


def test_association_rules_min_confidence_directional(spark):
    from oakstore_spark.operators.affinity import association_rules

    # a appears in 4 baskets, b in 2, both together in 2:
    # conf(a->b)=0.5, conf(b->a)=1.0 -> min_confidence=0.75 keeps b->a only
    rows = [(1, "a"), (1, "b"), (2, "a"), (2, "b"), (3, "a"), (4, "a")]
    df = spark.createDataFrame(rows, ["basket", "item"])
    out = association_rules(
        df, "basket", "item", min_support=0.25, min_confidence=0.75
    ).collect()
    assert [(r.antecedent, r.consequent) for r in out] == [("b", "a")]
    assert out[0].confidence == 1.0


def test_frequent_pairs_hot_basket_cap(spark):
    from oakstore_spark.operators.affinity import frequent_pairs

    # basket 1 holds 4 items; cap=2 keeps the lexicographically smallest
    # two ('a','b'), so pairs involving c/d via basket 1 disappear
    rows = [(1, i) for i in ["a", "b", "c", "d"]] + [
        (2, "a"), (2, "b"), (3, "c"), (3, "d"),
    ]
    df = spark.createDataFrame(rows, ["basket", "item"])
    full = frequent_pairs(df, "basket", "item", min_support=0.0)
    capped = frequent_pairs(
        df, "basket", "item", min_support=0.0, max_basket_items=2
    )
    full_pairs = {(r.item_a, r.item_b, r.n_ab) for r in full.collect()}
    capped_pairs = {(r.item_a, r.item_b, r.n_ab) for r in capped.collect()}
    assert ("a", "b", 2) in full_pairs and ("c", "d", 2) in full_pairs
    # capped: basket 1 contributes only (a,b); basket 3 untouched
    assert capped_pairs == {("a", "b", 2), ("c", "d", 1)}
    # n_baskets unchanged by the cap
    assert {r.n_baskets for r in capped.collect()} == {3}


# --- A/B experiment analysis ----------------------------------------------


def test_welch_ttest_hand_values(spark):
    from oakstore_spark.operators.experiments import welch_ttest
    import math

    # arm 0: [1,2,3] n=3 mean=2 var=1 ; arm 1: [4,6] n=2 mean=5 var=2
    rows = [(0, 1), (0, 2), (0, 3), (1, 4), (1, 6)]
    df = spark.createDataFrame(rows, ["arm", "v"])
    r = welch_ttest(df, "arm", "v", 0, 1).collect()[0]
    assert (r.na, r.nb) == (3, 2)
    assert r.mean_a == 2.0 and r.mean_b == 5.0
    assert r.var_a == 1.0 and r.var_b == 2.0
    ta, tb = 1.0 / 3, 2.0 / 2
    assert abs(r.t_stat - (2.0 - 5.0) / math.sqrt(ta + tb)) < 1e-12
    dof = (ta + tb) ** 2 / (ta * ta / 2 + tb * tb / 1)
    assert abs(r.welch_df - dof) < 1e-12


def test_proportion_ztest_degenerate_pool_is_null(spark):
    from oakstore_spark.operators.experiments import proportion_ztest

    # everyone converted -> pooled rate 1 -> SE 0 -> z NULL, no ANSI error
    rows = [(0, 1), (0, 1), (1, 1), (1, 1)]
    df = spark.createDataFrame(rows, ["arm", "c"])
    r = proportion_ztest(df, "arm", "c", 0, 1).collect()[0]
    assert r.pooled_rate == 1.0 and r.z_stat is None

    # normal case: arm0 2/3 convert, arm1 1/3
    rows = [(0, 1), (0, 1), (0, 0), (1, 1), (1, 0), (1, 0)]
    df = spark.createDataFrame(rows, ["arm", "c"])
    r = proportion_ztest(df, "arm", "c", 0, 1).collect()[0]
    import math
    pool = 3.0 / 6
    se = math.sqrt(pool * (1 - pool) * (1 / 3.0 + 1 / 3.0))
    assert abs(r.z_stat - (2.0 / 3 - 1.0 / 3) / se) < 1e-12


def test_cuped_removes_covariate_imbalance(spark):
    from oakstore_spark.operators.experiments import cuped_adjust

    # y = 2*x + arm-effect 10 for arm 1; pre-period x imbalanced
    # between arms.  CUPED with pooled theta=2 must recover the raw
    # effect net of the x imbalance and report rho2 close to 1.
    rows = []
    for i, x in enumerate([1, 2, 3, 4, 20, 30]):
        arm = i % 2
        rows.append((arm, x, 2 * x + (10 if arm else 0)))
    df = spark.createDataFrame(rows, ["arm", "x", "y"])
    out = {r.arm: r for r in cuped_adjust(df, "arm", "y", "x").collect()}
    # theta is NOT exactly 2 (arm effect correlates with nothing, but
    # the finite sample ties it to x split) -- still, the adjusted
    # difference must be far closer to 10 than the raw difference.
    raw_diff = out[1].raw_mean - out[0].raw_mean
    adj_diff = out[1].cuped_mean - out[0].cuped_mean
    assert abs(adj_diff - 10) < abs(raw_diff - 10)
    assert out[0].variance_reduction > 0.9


def test_cuped_no_covariate_variance_is_null(spark):
    from oakstore_spark.operators.experiments import cuped_adjust

    rows = [(0, 5, 1), (0, 5, 2), (1, 5, 3), (1, 5, 4)]
    df = spark.createDataFrame(rows, ["arm", "x", "y"])
    out = cuped_adjust(df, "arm", "y", "x").collect()
    assert all(r.theta is None and r.cuped_mean is None for r in out)
    # raw means still reported
    assert {r.raw_mean for r in out} == {1.5, 3.5}


def test_woe_iv_hand_values(spark):
    import math

    from oakstore_spark.operators.quality import woe_iv

    # feature in [0, 10): bin width 1 after min/max (0..9.999 -> width
    # ~1); plant perfect separation: lows good, highs bad
    rows = [(float(i), 0) for i in range(50)] + [
        (float(50 + i), 1) for i in range(50)
    ]
    df = spark.createDataFrame(rows, ["v", "bad"])
    out = woe_iv(df, "v", "bad", n_bins=2).collect()
    assert len(out) == 2
    b0, b1 = sorted(out, key=lambda r: r.bin)
    assert (b0.n_good, b0.n_bad) == (50, 0)
    assert (b1.n_good, b1.n_bad) == (0, 50)
    sg0 = (50 * 2 + 1) / (2 * 50 + 2)
    sb0 = (0 * 2 + 1) / (2 * 50 + 2)
    assert b0.share_good == sg0 and b0.share_bad == sb0
    assert b0.woe == math.log(sg0 / sb0) and b0.woe > 0
    assert b1.woe < 0
    # perfect separation -> big IV
    assert b0.iv_contrib + b1.iv_contrib > 3.0


def test_woe_iv_uninformative_feature(spark):
    from oakstore_spark.operators.quality import woe_iv

    # target independent of feature -> IV near zero
    rows = [(float(i % 10), i % 2) for i in range(200)]
    df = spark.createDataFrame(rows, ["v", "bad"])
    out = woe_iv(df, "v", "bad", n_bins=5).collect()
    iv = sum(r.iv_contrib for r in out)
    assert abs(iv) < 0.01


def test_kaplan_meier_hand_values(spark):
    from oakstore_spark.operators.experiments import kaplan_meier

    # classic toy: events at t=1 (1 of 5), t=3 (1 of 3); censored at
    # t=2 and t=3; survivor at t=4 (censored)
    rows = [(1, 1), (2, 0), (3, 1), (3, 0), (4, 0)]
    df = spark.createDataFrame(rows, ["dur", "ev"])
    out = {r.t: r for r in kaplan_meier(df, "dur", "ev").collect()}
    assert (out[1].n_risk, out[1].n_events, out[1].n_censored) == (5, 1, 0)
    assert abs(out[1].survival - 4 / 5) < 1e-12
    assert (out[2].n_risk, out[2].n_events) == (4, 0)
    assert abs(out[2].survival - 4 / 5) < 1e-12  # censoring alone: flat
    assert (out[3].n_risk, out[3].n_events, out[3].n_censored) == (3, 1, 1)
    assert abs(out[3].survival - 4 / 5 * 2 / 3) < 1e-12
    assert out[4].n_risk == 1 and abs(out[4].survival - 8 / 15) < 1e-12


def test_kaplan_meier_all_die_hits_zero(spark):
    from oakstore_spark.operators.experiments import kaplan_meier

    rows = [(1, 1), (2, 1), (2, 1)]
    df = spark.createDataFrame(rows, ["dur", "ev"])
    out = sorted(kaplan_meier(df, "dur", "ev").collect(), key=lambda r: r.t)
    assert out[-1].survival == 0.0  # ln(0) -> -inf -> exp -> 0 exactly


def test_uplift_two_model_recovers_planted_segment(spark):
    """T-learner on a planted heterogeneous effect: segment f=1
    converts 80% treated / 20% control (uplift 0.6), segment f=0
    converts 50% in both arms (uplift 0). The per-arm logistic fits
    are saturated (one binary feature), so the scored probabilities
    recover the planted rates, every f=1 unit outranks every f=0
    unit, and the Qini curve front-loads ALL the lift into the
    segment's deciles."""
    from oakstore_spark.operators.experiments import (
        qini_curve,
        uplift_two_model,
    )

    rows = []
    uid = 0
    for seg in (0, 1):
        for arm in (0, 1):
            for i in range(250):
                if seg == 1:
                    y = int(i % 10 < (8 if arm == 1 else 2))
                else:
                    y = int(i % 2 == 0)
                rows.append((uid, arm, float(seg), y))
                uid += 1
    df = spark.createDataFrame(rows, ["uid", "arm", "f", "y"])
    scored = uplift_two_model(
        df, "arm", ["f"], "y", treated=1, n_iter=8
    )
    rs = scored.collect()
    seg1 = [r for r in rs if r.f == 1.0]
    seg0 = [r for r in rs if r.f == 0.0]
    assert abs(seg1[0].p_treated - 0.8) < 0.01
    assert abs(seg1[0].p_control - 0.2) < 0.01
    assert abs(seg1[0].uplift_score - 0.6) < 0.02
    assert abs(seg0[0].uplift_score) < 0.02
    assert min(r.uplift_score for r in seg1) > max(
        r.uplift_score for r in seg0
    )

    curve = {
        r.bucket: r
        for r in qini_curve(
            scored, "uplift_score", "arm", "y", "uid", treated=1
        ).collect()
    }
    # segment 1 (500 units) fills exactly the top 5 deciles: all the
    # incremental conversions are already there at d=5, flat after
    assert curve[5].qini == 150.0
    assert curve[10].qini == 150.0
    assert curve[5].n_t == 250 and curve[5].n_c == 250


def test_logrank_hand_values(spark):
    """Operator output must equal an independent plain-Python
    log-rank computation (same pinned expression order) on a toy
    censored two-arm dataset."""
    from oakstore_spark.operators.experiments import logrank_test

    subjects = [
        (0, 1, 1), (0, 2, 1), (0, 4, 0), (0, 5, 1),
        (1, 2, 1), (1, 3, 0), (1, 5, 1), (1, 6, 0),
    ]
    df = spark.createDataFrame(subjects, ["arm", "dur", "ev"])
    out = logrank_test(df, "arm", "dur", "ev", 0, 1).collect()[0]

    times = sorted(
        {t for _, t, e in subjects if e == 1}
    )
    o_a = o_b = 0
    e_a = e_b = v = 0.0
    for t in times:
        n_a = sum(1 for a, d, _ in subjects if a == 0 and d >= t)
        n_b = sum(1 for a, d, _ in subjects if a == 1 and d >= t)
        d_a = sum(1 for a, d, e in subjects if a == 0 and d == t and e)
        d_b = sum(1 for a, d, e in subjects if a == 1 and d == t and e)
        n, d = n_a + n_b, d_a + d_b
        o_a, o_b = o_a + d_a, o_b + d_b
        e_a += d * n_a / n
        e_b += d * n_b / n
        if n > 1:
            v += d * n_a / n * n_b / n * (n - d) / (n - 1)
    chi2 = (o_a - e_a) * (o_a - e_a) / v
    assert out.n_times == len(times)
    assert (out.o_a, out.o_b) == (o_a, o_b)
    assert abs(out.e_a - e_a) < 1e-12
    assert abs(out.e_b - e_b) < 1e-12
    assert abs(out.var_sum - v) < 1e-12
    assert abs(out.chi2 - chi2) < 1e-12


def test_logrank_identical_arms_null_and_empty_arm(spark):
    """Identical survival data in both arms must read chi2 == 0.0
    exactly (O == E term by term); a missing arm yields chi2 NULL,
    never a divide-by-zero."""
    from oakstore_spark.operators.experiments import logrank_test

    base = [(1, 1), (2, 0), (3, 1), (5, 1), (7, 0)]
    rows = [(arm, d, e) for arm in (0, 1) for d, e in base]
    df = spark.createDataFrame(rows, ["arm", "dur", "ev"])
    out = logrank_test(df, "arm", "dur", "ev", 0, 1).collect()[0]
    assert out.chi2 == 0.0
    assert out.o_a == out.o_b == 3
    assert out.e_a == 3.0 and out.e_b == 3.0

    solo = spark.createDataFrame(
        [(0, d, e) for d, e in base], ["arm", "dur", "ev"]
    )
    out2 = logrank_test(solo, "arm", "dur", "ev", 0, 1).collect()[0]
    assert out2.chi2 is None and out2.o_b == 0


def test_item_neighbors_cosine_and_rank(spark):
    import math

    from oakstore_spark.operators.affinity import item_neighbors

    # x co-occurs with y twice (of 3 each) and with z once (of 2)
    rows = [
        (1, "x"), (1, "y"),
        (2, "x"), (2, "y"),
        (3, "x"), (3, "z"),
        (4, "y"), (4, "z"),
    ]
    df = spark.createDataFrame(rows, ["basket", "item"])
    out = item_neighbors(df, "basket", "item", min_support=0.0, top_k=2)
    got = {(r.item, r.rank): (r.neighbor, r.cosine) for r in out.collect()}
    # x: n=3; y: n=3; z: n=2. cos(x,y)=2/sqrt(9), cos(x,z)=1/sqrt(6)
    assert got[("x", 1)] == ("y", 2 / math.sqrt(9.0))
    assert got[("x", 2)] == ("z", 1 / math.sqrt(6.0))
    assert got[("y", 1)] == ("x", 2 / math.sqrt(9.0))
    # top_k bounds the list
    assert all(r <= 2 for (_, r) in got)


def test_diff_in_diff_hand_values(spark):
    from oakstore_spark.operators.experiments import diff_in_diff

    # treated: pre mean 10, post mean 25 (delta 15)
    # control: pre mean 20, post mean 24 (delta 4) -> DiD = 11
    rows = [
        ("t", "pre", 8), ("t", "pre", 12),
        ("t", "post", 20), ("t", "post", 30),
        ("c", "pre", 18), ("c", "pre", 22),
        ("c", "post", 23), ("c", "post", 25),
    ]
    df = spark.createDataFrame(rows, ["grp", "period", "v"])
    r = diff_in_diff(df, "grp", "period", "v", treated="t", post="post")
    row = r.collect()[0]
    assert (row.treated_pre, row.treated_post) == (10.0, 25.0)
    assert (row.control_pre, row.control_post) == (20.0, 24.0)
    assert row.treated_delta == 15.0 and row.control_delta == 4.0
    assert row.did_estimate == 11.0
    assert (row.n_t_pre, row.n_c_post) == (2, 2)


def test_robust_metric_summary_hand_values(spark):
    from oakstore_spark.operators.experiments import robust_metric_summary

    # one arm, 10 units, value 1..9 plus a 1000 whale; trim=0.1 ->
    # k=1 from each tail: drop the 1 and the 1000
    rows = [(0, i, v) for i, v in enumerate([1, 2, 3, 4, 5, 6, 7, 8, 9, 1000])]
    df = spark.createDataFrame(rows, ["arm", "uid", "v"])
    r = robust_metric_summary(df, "arm", "v", "uid", trim=0.1).collect()[0]
    assert r.n == 10 and r.k_trimmed_each_tail == 1
    assert r.raw_mean == sum([1, 2, 3, 4, 5, 6, 7, 8, 9, 1000]) / 10
    assert r.trimmed_mean == sum(range(2, 10)) / 8
    # winsorize: 1 -> 2 and 1000 -> 9
    assert r.winsorized_mean == (2 + sum(range(2, 10)) + 9) / 10
    # whale influence collapses
    assert r.trimmed_mean < 10 < r.raw_mean


def test_srm_check_detects_broken_split(spark):
    import pytest

    from oakstore_spark.operators.experiments import srm_check

    # designed 50/50, observed 70/30 of 1000 -> chi2 = 2*(200^2/500)=160
    rows = [(0,)] * 700 + [(1,)] * 300
    df = spark.createDataFrame(rows, ["arm"])
    out = {r.arm: r for r in srm_check(df, "arm", {0: 0.5, 1: 0.5}).collect()}
    assert out[0].n_expected == 500.0 and out[1].n_expected == 500.0
    chi2 = out[0].chi2_contrib + out[1].chi2_contrib
    assert chi2 == 200.0 ** 2 / 500 * 2  # 160: far past any threshold
    with pytest.raises(ValueError):
        srm_check(df, "arm", {0: 0.6, 1: 0.5})


def test_srm_check_zero_arm_and_guards(spark):
    """Design arms with zero observed traffic must still contribute
    (0-e)^2/e; observed-but-undesigned arms and empty input raise."""
    import pytest

    from oakstore_spark.operators.experiments import srm_check

    # 100% of 100 rows to arm 0 under a 50/50 design: chi2 must be
    # n (=100), not n/2 — the zero arm contributes its full e.
    df = spark.createDataFrame([(0,)] * 100, ["arm"])
    out = {r.arm: r for r in srm_check(df, "arm", {0: 0.5, 1: 0.5}).collect()}
    assert set(out) == {0, 1}
    assert out[1].n_observed == 0 and out[1].n_expected == 50.0
    assert out[0].chi2_contrib + out[1].chi2_contrib == 100.0
    # a silent holdout arm getting zero traffic must NOT pass the gate
    assert out[1].chi2_contrib == 50.0

    # observed arm absent from the design -> explicit error, not
    # silently inflated expected counts for the designed arms
    bad = spark.createDataFrame([(0,), (1,), (2,)], ["arm"])
    with pytest.raises(ValueError, match="absent from expected_shares"):
        srm_check(bad, "arm", {0: 0.5, 1: 0.5})

    # empty input -> clear error (previously TypeError on int(None))
    empty = spark.createDataFrame([], "arm int")
    with pytest.raises(ValueError, match="empty input"):
        srm_check(empty, "arm", {0: 0.5, 1: 0.5})


def test_quantile_treatment_effects_hand(spark):
    from oakstore_spark.operators.experiments import (
        quantile_treatment_effects,
    )

    # arm 0: 10..100 step 10 (n=10); arm 1: same +5 everywhere except
    # the top, which gains 100 -> QTE flat at -5 until q=0.9 (-100)
    rows = [(0, i, (i + 1) * 10) for i in range(10)]
    rows += [(1, 100 + i, (i + 1) * 10 + (105 if i == 9 else 5))
             for i in range(10)]
    df = spark.createDataFrame(rows, ["arm", "uid", "v"])
    out = {r.q: r for r in quantile_treatment_effects(
        df, "arm", "v", "uid", 0, 1, quantiles=[0.5, 0.9]).collect()}
    # type-1: rank ceil(.5*10)=5 -> value 50 / 55; ceil(.9*10)=9 -> 90/95
    assert (out[0.5].v_a, out[0.5].v_b, out[0.5].qte) == (50, 55, -5)
    assert (out[0.9].v_a, out[0.9].v_b, out[0.9].qte) == (90, 95, -5)
    # the whale sits at rank 10 = q 1.0
    out2 = {r.q: r for r in quantile_treatment_effects(
        df, "arm", "v", "uid", 0, 1, quantiles=[1.0]).collect()}
    assert (out2[1.0].v_a, out2[1.0].v_b, out2[1.0].qte) == (100, 205, -105)


def test_ratio_metric_ci_hand(spark):
    """Hand-computed delta-method CI on a tiny arm, mirroring the
    operator's exact float association."""
    import math

    from oakstore_spark.operators.experiments import ratio_metric_ci

    # one arm, units (x, y): ratio = 12/5
    rows = [(0, 2, 1), (0, 4, 2), (0, 6, 2)]
    df = spark.createDataFrame(rows, ["arm", "x", "y"])
    r = ratio_metric_ci(df, "arm", "x", "y").first()
    n, sx, sy, sxx, syy, sxy = 3, 12, 5, 56, 9, 22
    ratio = sx / sy
    ybar = sy / n
    varx = (sxx - sx * sx / n) / (n - 1)
    vary = (syy - sy * sy / n) / (n - 1)
    covxy = (sxy - sx * sy / n) / (n - 1)
    var_r = (varx - 2 * ratio * covxy + ratio * ratio * vary) / (
        n * ybar * ybar
    )
    se = math.sqrt(var_r)
    assert r.n == 3 and r.sum_num == 12 and r.sum_den == 5
    assert r.ratio == ratio
    assert abs(r.se - se) <= 1e-15
    assert abs(r.ci_lo - (ratio - 1.959963984540054 * se)) <= 1e-12
    assert abs(r.ci_hi - (ratio + 1.959963984540054 * se)) <= 1e-12

    # degenerate guards: n=1 arm and all-zero denominator arm -> NULL
    deg = spark.createDataFrame(
        [(1, 5, 2), (2, 5, 0), (2, 7, 0)], ["arm", "x", "y"]
    )
    out = {r.arm: r for r in ratio_metric_ci(deg, "arm", "x", "y").collect()}
    assert out[1].se is None and out[1].ratio == 2.5
    assert out[2].ratio is None and out[2].se is None


def test_msprt_aa_no_trigger_and_effect_triggers(spark):
    """Planted A/A must not reject (theta = 0 -> lr < 1 -> p = 1);
    a planted large effect must reject; lr matches the hand formula."""
    import math

    from oakstore_spark.operators.experiments import msprt

    # A/A: identical multisets in both arms
    aa = spark.createDataFrame(
        [(i % 2, 100 + (i % 7)) for i in range(1400)], ["arm", "x"]
    )
    r = msprt(aa, "arm", "x", 0, 1, tau2=100.0).first()
    assert r.theta == 0.0
    assert r.lr < 1.0 and r.always_valid_p == 1.0
    assert r.reject is False

    # planted effect: arm 0 ~ 200 +- jitter, arm 1 ~ 100 +- jitter
    eff = spark.createDataFrame(
        [(0, 200 + (i % 5)) for i in range(1000)]
        + [(1, 100 + (i % 5)) for i in range(1000)],
        ["arm", "x"],
    )
    r2 = msprt(eff, "arm", "x", 0, 1, tau2=100.0).first()
    assert r2.reject is True and r2.always_valid_p < 0.05

    # hand formula on a 2+2 example: a=[10,12], b=[5,7], tau2=4
    tiny = spark.createDataFrame(
        [(0, 10), (0, 12), (1, 5), (1, 7)], ["arm", "x"]
    )
    r3 = msprt(tiny, "arm", "x", 0, 1, tau2=4.0).first()
    v = 2 / 2 + 2 / 2  # var=2 each arm, /n
    theta = 11 - 6
    lr = math.sqrt(v / (v + 4.0)) * math.exp(
        theta * theta * 4.0 / (2 * v * (v + 4.0))
    )
    assert r3.theta == 5.0 and r3.v == v
    assert math.isclose(r3.lr, lr, rel_tol=1e-12)


def test_msprt_curve_aa_effect_and_final_day_consistency(spark):
    """The curve must (a) never reject on a planted A/A, (b) reject and
    STAY rejected (running-min monotone) once a planted effect
    accumulates, and (c) agree bitwise with single-shot msprt on the
    final day (identical cumulative integer moments)."""
    import datetime as dt

    from oakstore_spark.operators.experiments import msprt, msprt_curve

    def ts(day, i):
        return dt.datetime(2024, 1, 1 + day, 1, 0, i % 60)

    # A/A: identical multisets per arm per day, 10 days x 70 obs
    aa_rows = [
        (i % 2, ts(d, i), 100 + (i % 7))
        for d in range(10)
        for i in range(140)
    ]
    aa = spark.createDataFrame(aa_rows, ["arm", "ts", "x"])
    curve = msprt_curve(aa, "arm", "x", "ts", 0, 1, tau2=100.0).collect()
    assert len(curve) == 10
    assert all(r.reject_by_now == 0 for r in curve)
    assert all(r.theta == 0.0 for r in curve)

    # planted effect growing decisive: arm0 ~200, arm1 ~100
    eff_rows = [
        (i % 2, ts(d, i), (200 if i % 2 == 0 else 100) + (i % 5))
        for d in range(10)
        for i in range(60)
    ]
    eff = spark.createDataFrame(eff_rows, ["arm", "ts", "x"])
    ec = sorted(
        msprt_curve(eff, "arm", "x", "ts", 0, 1, tau2=100.0).collect(),
        key=lambda r: r.day,
    )
    assert ec[-1].reject_by_now == 1
    # monotone: once rejected, stays rejected
    seen = 0
    for r in ec:
        assert r.reject_by_now >= seen
        seen = r.reject_by_now
    # p_running is the running min
    run = 1.0
    for r in ec:
        run = min(run, r.always_valid_p)
        assert r.p_running == run

    # final-day == single-shot (identical cumulative BIGINT moments)
    single = msprt(eff, "arm", "x", 0, 1, tau2=100.0).first()
    last = ec[-1]
    assert (last.na, last.nb) == (single.na, single.nb)
    assert last.lr == single.lr
    assert last.theta == single.theta and last.v == single.v


def test_poisson_bootstrap_ci_properties(spark):
    """Poisson-bootstrap: deterministic across runs, weights behave
    like Poisson(1) (replicate size ~ n), CI brackets the point mean
    and shrinks with n; B < 4 raises."""
    import pytest

    from oakstore_spark.operators.experiments import poisson_bootstrap_ci

    rows = [(i, i % 2, 100 + (i % 21)) for i in range(2000)]
    df = spark.createDataFrame(rows, ["uid", "arm", "x"])
    r1 = {
        r.arm: r
        for r in poisson_bootstrap_ci(
            df, "arm", "x", "uid", n_replicates=50
        ).collect()
    }
    r2 = {
        r.arm: r
        for r in poisson_bootstrap_ci(
            df, "arm", "x", "uid", n_replicates=50
        ).collect()
    }
    for arm in (0, 1):
        a, b = r1[arm], r2[arm]
        assert (a.boot_lo, a.boot_hi) == (b.boot_lo, b.boot_hi)
        assert a.n_units == 1000
        # CI brackets the point mean and is plausibly tight:
        # sd(x) ~ 6.06 -> se ~ 0.19; allow generous slack
        assert a.boot_lo < a.point_mean < a.boot_hi
        assert a.boot_hi - a.boot_lo < 2.0
        # values are in-range of the data
        assert 100 <= a.boot_lo <= a.boot_hi <= 121

    with pytest.raises(ValueError):
        poisson_bootstrap_ci(df, "arm", "x", "uid", n_replicates=3)


def test_covariate_balance_hand_and_imbalance(spark):
    """Balanced arms read |smd| ~ 0; a planted shifted covariate reads
    the hand-computed SMD; zero-variance covariates yield NULL."""
    from oakstore_spark.operators.experiments import covariate_balance

    rows = []
    for i in range(400):
        arm = i % 2
        base = (i // 2) % 10  # identical multiset in both arms
        shifted = base + (5 if arm == 0 else 0)  # planted imbalance
        const = 7             # zero variance
        rows.append((arm, base, shifted, const))
    df = spark.createDataFrame(rows, ["arm", "bal", "shifted", "const"])
    out = {
        r.covariate: r
        for r in covariate_balance(
            df, "arm", ["bal", "shifted", "const"], 0, 1
        ).collect()
    }
    assert out["bal"].smd == 0.0
    # hand SMD: means differ by exactly 5, var identical per arm
    import math

    vals = [(i // 2) % 10 for i in range(0, 400, 2)]
    n, s, q = 200, sum(vals), sum(v * v for v in vals)
    var = (q - s * s / n) / (n - 1)
    assert math.isclose(
        out["shifted"].smd, 5 / math.sqrt((var + var) / 2),
        rel_tol=1e-12,
    )
    assert out["const"].smd is None
    assert out["bal"].n_a == 200 and out["bal"].n_b == 200


def test_covariate_balance_null_covariate_consistent_moments(spark):
    """A covariate with NULLs must compute mean/var over its NON-NULL
    rows only (n counts per-covariate non-null rows, matching what
    F.sum aggregates) — an all-row count would silently bias the
    moments. A fully-populated sibling column in the same call keeps
    its full counts."""
    from oakstore_spark.operators.experiments import covariate_balance

    rows = []
    for i in range(200):
        arm = i % 2
        full = (i // 2) % 10
        # sparse: only half the rows carry a value (i%4 in {0,1} hits
        # both arms equally); the moments must come from the NON-NULL
        # population only
        sparse = ((i // 8) % 5) if i % 4 in (0, 1) else None
        rows.append((arm, full, sparse))
    df = spark.createDataFrame(rows, ["arm", "full", "sparse"])
    out = {
        r.covariate: r
        for r in covariate_balance(
            df, "arm", ["full", "sparse"], 0, 1
        ).collect()
    }
    assert out["full"].n_a == 100 and out["full"].n_b == 100
    # 100 non-null rows total, 50 per arm
    assert out["sparse"].n_a == 50 and out["sparse"].n_b == 50
    vals_a = [
        ((i // 8) % 5)
        for i in range(200)
        if i % 4 in (0, 1) and i % 2 == 0
    ]
    assert out["sparse"].mean_a == sum(vals_a) / len(vals_a)


def test_mmr_topk_k_exceeds_pool_clamps(spark):
    """k greater than the candidate pool must return the whole pool in
    MMR order, not raise mid-loop."""
    from oakstore_spark.operators.similarity import mmr_topk

    rows = [(i, [float(i + 1), 1.0]) for i in range(4)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = mmr_topk(df, query_id=0, k=10, n_candidates=10).collect()
    # pool excludes the query vector -> 3 candidates
    assert len(out) == 3
    assert [r.rank for r in out] == [1, 2, 3]
    assert len({r.id for r in out}) == 3 and 0 not in {r.id for r in out}


def test_power_analysis_hand(spark):
    """Hand formula on a tiny two-arm sample; planning variance must
    use WITHIN-arm deviations (a planted effect must not inflate it)."""
    import math

    from oakstore_spark.operators.experiments import power_analysis

    # arm 0: 0..9 repeated; arm 1 same shape SHIFTED by +1000 (a huge
    # "effect" that must not contaminate the planning variance)
    rows = [(0, i % 10) for i in range(100)] + [
        (1, 1000 + (i % 10)) for i in range(100)
    ]
    df = spark.createDataFrame(rows, ["arm", "x"])
    r = power_analysis(df, "arm", "x", mde_abs=2.0).first()
    vals = [i % 10 for i in range(100)]
    n, s, q = 100, sum(vals), sum(v * v for v in vals)
    ss = q - s * s / n  # identical within-arm SS in both arms
    var_pooled = (0.0 + ss + ss) / (200 - 2)
    za, zb = 1.959963984540054, 0.8416212335729143
    assert r.n_arms == 2 and r.n_min_arm == 100
    assert r.var_pooled == var_pooled  # effect NOT in the variance
    assert math.isclose(
        r.n_required_per_arm,
        (za + zb) ** 2 * 2 * var_pooled / 4.0,
        rel_tol=1e-12,
    )
    assert math.isclose(
        r.mde_at_current_n,
        math.sqrt((za + zb) ** 2 * 2 * var_pooled / 100),
        rel_tol=1e-12,
    )


def test_qini_curve_perfect_and_random_targeting(spark):
    """A perfect uplift score front-loads ALL incremental conversions
    into the first bucket and the curve is flat after the planted
    responder band; a score independent of uplift tracks the diagonal
    (final bucket equals total incremental lift in both cases)."""
    from oakstore_spark.operators.experiments import qini_curve

    rows = []
    for i in range(1000):
        arm = i % 2
        # responders: the 10% of units with highest "perfect" score
        # convert ONLY under treatment; everyone else never converts
        responder = i < 100
        y = 1 if (responder and arm == 1) else 0
        perfect = 1000 - i  # descending: responders first
        rows.append((i, arm, perfect, y))
    df = spark.createDataFrame(rows, ["uid", "arm", "score", "y"])
    out = {
        r.bucket: r
        for r in qini_curve(
            df, "score", "arm", "y", "uid", treated=1
        ).collect()
    }
    total_lift = out[10].qini
    assert total_lift == 50.0  # 50 treated responders, control 0
    # bucket 1 (top 10%) already contains every responder
    assert out[1].qini == total_lift
    for b in range(2, 11):
        assert out[b].qini == total_lift  # flat after the band

    # uninformative score (uid order): qini grows ~linearly
    out2 = {
        r.bucket: r
        for r in qini_curve(
            df, "uid", "arm", "y", "uid", treated=1
        ).collect()
    }
    # responders are the LOWEST uids -> desc ranking puts them LAST:
    # the curve stays ~0 until the final bucket sweeps them in
    assert abs(out2[5].qini) < 1e-9
    assert out2[10].qini == total_lift


def test_post_stratified_mean_equalizes_mix_and_nulls_on_gap(spark):
    """Both arms share per-stratum means (A=10, B=20) but opposite
    3:1 stratum mixes: raw means differ (12.5 vs 17.5) while the
    post-stratified means both land exactly on the pooled 15.0. An
    arm absent from a stratum reads NULL, never a re-normalized
    biased number."""
    from oakstore_spark.operators.experiments import post_stratified_mean

    rows = (
        [(0, "A", 10)] * 3 + [(0, "B", 20)] * 1
        + [(1, "A", 10)] * 1 + [(1, "B", 20)] * 3
    )
    df = spark.createDataFrame(rows, ["arm", "stratum", "x"])
    out = {r.arm: r for r in post_stratified_mean(df, "arm", "stratum", "x").collect()}
    assert out[0].raw_mean == 12.5 and out[1].raw_mean == 17.5
    assert out[0].post_strat_mean == 15.0
    assert out[1].post_strat_mean == 15.0
    assert out[0].n_strata_covered == 2

    rows2 = [(0, "A", 10), (0, "B", 20), (1, "A", 12)]
    df2 = spark.createDataFrame(rows2, ["arm", "stratum", "x"])
    out2 = {r.arm: r for r in post_stratified_mean(df2, "arm", "stratum", "x").collect()}
    assert out2[1].post_strat_mean is None  # arm 1 missing stratum B
    assert out2[0].post_strat_mean is not None

    # r12 ADVICE: NULL metric rows must not inflate any denominator —
    # padding every cell with NULLs leaves every statistic unchanged,
    # and an all-NULL cell vanishes (covered drops, not biases)
    nulls = [(a, s, None) for a in (0, 1) for s in ("A", "B")] * 2
    df3 = spark.createDataFrame(
        rows + nulls, "arm int, stratum string, x int"
    )
    out3 = {r.arm: r for r in post_stratified_mean(df3, "arm", "stratum", "x").collect()}
    for arm in (0, 1):
        assert out3[arm].n_units == out[arm].n_units
        assert out3[arm].raw_mean == out[arm].raw_mean
        assert out3[arm].post_strat_mean == out[arm].post_strat_mean
    df4 = spark.createDataFrame(
        rows2 + [(1, "B", None)], "arm int, stratum string, x int"
    )
    out4 = {r.arm: r for r in post_stratified_mean(df4, "arm", "stratum", "x").collect()}
    assert out4[1].n_strata_covered == 1  # all-NULL cell not covered
    assert out4[1].post_strat_mean is None


def test_ips_evaluate_hand_case_clip_and_guard(spark):
    """Hand case: w(a)=0.5, w(b)=1.5 over 4+6 logged rows with 2+3
    rewards -> IPS 0.55, SNIPS 0.5, ESS 121/14.5; clip=1.0 caps b's
    weight (IPS 0.4); a logged action missing from the logging
    policy raises."""
    from oakstore_spark.operators.experiments import ips_evaluate

    rows = (
        [("a", 1)] * 2 + [("a", 0)] * 2
        + [("b", 1)] * 3 + [("b", 0)] * 3
    )
    df = spark.createDataFrame(rows, ["act", "reward"])
    mu = spark.createDataFrame(
        [("a", 0.5), ("b", 0.5)], ["act", "prob"]
    )
    pi = spark.createDataFrame(
        [("a", 0.25), ("b", 0.75)], ["act", "prob"]
    )
    r = ips_evaluate(df, "act", "reward", mu, pi).collect()[0]
    assert r.n == 10 and r.n_actions == 2
    assert r.ips_value == 0.55 and r.snips_value == 0.5
    assert abs(r.ess - 121 / 14.5) < 1e-12
    assert r.max_weight == 1.5
    rc = ips_evaluate(
        df, "act", "reward", mu, pi, clip=1.0
    ).collect()[0]
    assert rc.ips_value == 0.4 and rc.max_weight == 1.0

    import pytest as _pytest

    mu_partial = spark.createDataFrame([("a", 0.5)], ["act", "prob"])
    with _pytest.raises(ValueError, match="logging-policy"):
        ips_evaluate(df, "act", "reward", mu_partial, pi)


def test_quantile_normalize_mapping_properties(spark):
    """Two sources with the same shape but shifted scales map onto the
    shared pooled distribution: per-source ranks are preserved
    (monotone), the min/max of each source land on the pooled
    min/max, and a single-row source maps to the pooled median."""
    from oakstore_spark.operators.curation import quantile_normalize

    rows = [(f"a{i}", "A", 10 + i) for i in range(10)]
    rows += [(f"b{i}", "B", 1000 + 2 * i) for i in range(10)]
    rows += [("solo", "C", 55)]
    df = spark.createDataFrame(rows, ["id", "src", "v"])
    out = {r.id: r for r in quantile_normalize(df, "src", "v", "id").collect()}
    assert len(out) == 21
    pooled = sorted(v for _, _, v in rows)
    # source minima/maxima hit the pooled extremes
    assert out["a0"].normalized == pooled[0]
    assert out["b9"].normalized == pooled[-1]
    assert out["b0"].normalized == pooled[0]
    # monotone within each source
    a_vals = [out[f"a{i}"].normalized for i in range(10)]
    assert a_vals == sorted(a_vals)
    b_vals = [out[f"b{i}"].normalized for i in range(10)]
    assert b_vals == sorted(b_vals)
    # equal within-source quantiles map to the SAME pooled value
    assert a_vals == b_vals
    # single-row source -> pooled median position (N+1)//2 = 11th
    assert out["solo"].normalized == pooled[10]


def test_cohens_d_hand_case_and_degenerates(spark):
    """Hand case: A = {8,12} (mean 10, var 8), B = {3,5,7} (mean 5,
    var 4) -> s_pooled = sqrt((8+8)/3), d = 5/s_p, g = d*(1-3/11) —
    matched to a driver replica exactly; identical groups -> d = 0;
    a 1-row arm or zero pooled variance reads NULL."""
    import math

    from oakstore_spark.operators.experiments import cohens_d

    rows = [("A", 8), ("A", 12), ("B", 3), ("B", 5), ("B", 7)]
    df = spark.createDataFrame(rows, ["g", "v"])
    r = cohens_d(df, "g", "v", "A", "B").collect()[0]
    sp = math.sqrt((8.0 + 8.0) / 3.0)
    assert (r.n_a, r.n_b) == (2, 3)
    assert r.mean_a == 10.0 and r.mean_b == 5.0
    assert abs(r.d - 5.0 / sp) < 1e-12
    assert abs(r.hedges_g - (5.0 / sp) * (1 - 3 / 11)) < 1e-12

    same = spark.createDataFrame(
        [("A", v) for v in (1, 2, 3)] + [("B", v) for v in (1, 2, 3)],
        ["g", "v"],
    )
    assert cohens_d(same, "g", "v", "A", "B").collect()[0].d == 0.0

    tiny = spark.createDataFrame([("A", 1), ("B", 2)], ["g", "v"])
    assert cohens_d(tiny, "g", "v", "A", "B").collect()[0].d is None


def test_cramers_v_extremes(spark):
    """Perfect association (b determined by a) -> V exactly 1.0;
    exact independence (balanced product table) -> chi2 == 0.0 and
    V == 0.0; a single-category side reads NULL."""
    from oakstore_spark.operators.experiments import cramers_v

    perfect = spark.createDataFrame(
        [("x", "p")] * 10 + [("y", "q")] * 15 + [("z", "r")] * 5,
        ["a", "b"],
    )
    r = cramers_v(perfect, "a", "b").collect()[0]
    assert r.v == 1.0 and r.n == 30

    indep = spark.createDataFrame(
        [(a, b) for a in ("x", "y") for b in ("p", "q") for _ in range(5)],
        ["a", "b"],
    )
    r2 = cramers_v(indep, "a", "b").collect()[0]
    assert r2.chi2 == 0.0 and r2.v == 0.0

    single = spark.createDataFrame(
        [("x", "p"), ("x", "q")], ["a", "b"]
    )
    assert cramers_v(single, "a", "b").collect()[0].v is None


def test_odds_ratio_hand_case_and_zero_cell(spark):
    """Hand 2x2 (a,b,c,d)=(20,10,5,40): OR = 16 exactly, CI brackets
    it and matches a driver replica to 1e-9 (the rounding grain); a
    zero cell reads NULL."""
    import math

    from oakstore_spark.operators.experiments import odds_ratio

    rows = (
        [(1, 1)] * 20 + [(1, 0)] * 10 + [(0, 1)] * 5 + [(0, 0)] * 40
    )
    df = spark.createDataFrame(rows, ["ex", "y"])
    r = odds_ratio(df, "ex", "y").collect()[0]
    assert (r.a, r.b, r.c, r.d) == (20, 10, 5, 40)
    assert r.odds_ratio == 16.0
    z = 1.959963984540054
    se = math.sqrt(1 / 20 + 1 / 10 + 1 / 5 + 1 / 40)
    assert abs(r.lo - math.exp(math.log(16.0) - z * se)) < 1e-9
    assert abs(r.hi - math.exp(math.log(16.0) + z * se)) < 1e-9
    assert r.lo < 16.0 < r.hi

    nz = spark.createDataFrame([(1, 1), (0, 0)], ["ex", "y"])
    assert odds_ratio(nz, "ex", "y").collect()[0].odds_ratio is None


def test_wilson_intervals_edges_and_replica(spark):
    """p=0 and p=1 segments get finite, in-range intervals (the Wald
    interval collapses to zero width there — Wilson's point); a mixed
    segment matches a driver-side float replica of the same formula
    to 1e-15."""
    import math

    from oakstore_spark.operators.experiments import wilson_intervals

    rows = [("zero", 0)] * 20 + [("one", 1)] * 20
    rows += [("mix", 1)] * 7 + [("mix", 0)] * 13
    df = spark.createDataFrame(rows, ["seg", "y"])
    out = {r.seg: r for r in wilson_intervals(df, ["seg"], "y").collect()}
    assert out["zero"].p_hat == 0.0
    assert 0.0 <= out["zero"].lo < 1e-9 and 0.0 < out["zero"].hi < 0.2
    assert out["one"].p_hat == 1.0
    assert 0.8 < out["one"].lo < 1.0 and out["one"].hi <= 1.0 + 1e-9

    z = 1.959963984540054
    n, p = 20.0, 7 / 20
    denom = 1.0 + z * z / n
    center = (p + z * z / (2 * n)) / denom
    half = z * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n)) / denom
    assert abs(out["mix"].lo - (center - half)) < 1e-15
    assert abs(out["mix"].hi - (center + half)) < 1e-15


def test_dispersion_index_closed_forms(spark):
    """Constant counts -> variance 0, D exactly 0; [0, 10] -> var 50,
    D exactly 10; n=1 and all-zero groups read NULL."""
    from oakstore_spark.operators.quality import dispersion_index

    rows = [("c", v) for v in (2, 2, 2)]
    rows += [("b", 0), ("b", 10)]
    rows += [("one", 5)]
    rows += [("z", 0), ("z", 0)]
    df = spark.createDataFrame(rows, ["k", "v"])
    out = {r.k: r for r in dispersion_index(df, ["k"], "v").collect()}
    assert out["c"].variance == 0.0 and out["c"].dispersion == 0.0
    assert out["b"].variance == 50.0 and out["b"].dispersion == 10.0
    assert out["one"].variance is None and out["one"].dispersion is None
    assert out["z"].dispersion is None  # zero mean


def test_js_divergence_bounds_symmetry_and_identity(spark):
    """Identical snapshots -> JSD exactly 0 (p == q in every bin, so
    each ln argument is exactly 1); disjoint snapshots approach ln 2
    but stay below it (the smoothing floor); swapping the snapshots
    leaves JSD unchanged (symmetric, unlike PSI's direction-dependent
    bins — asserted on a pair whose ranges coincide)."""
    import math

    from oakstore_spark.operators.quality import js_divergence

    same = spark.createDataFrame(
        [(float(i % 100),) for i in range(1000)], ["v"]
    )
    out = js_divergence(same, same, "v").collect()
    assert sum(r.js_contrib for r in out) == 0.0

    lo = spark.createDataFrame(
        [(float(i % 40),) for i in range(1000)], ["v"]
    )
    hi = spark.createDataFrame(
        [(60.0 + i % 40,) for i in range(1000)], ["v"]
    )
    both = lo.unionByName(hi)  # shared support so bins coincide
    jsd_ab = sum(
        r.js_contrib for r in js_divergence(both, hi, "v").collect()
    )
    assert 0.0 < jsd_ab < math.log(2)
    # symmetry needs identical bin EDGES: baseline fixes them, so use
    # the same baseline relation both ways via the mixed corpus
    jsd_ba = sum(
        r.js_contrib for r in js_divergence(both, lo, "v").collect()
    )
    assert abs(jsd_ab - jsd_ba) < 1e-9  # lo/hi mirror in the mix


def test_cliffs_delta_extremes_ties_and_empty(spark):
    """Complete separation -> delta exactly +1 (or -1 reversed);
    identical distributions -> exactly 0 (ties half-count); an empty
    group -> NULLs; rows outside both groups are ignored."""
    from oakstore_spark.operators.experiments import cliffs_delta

    rows = [("A", v) for v in (10, 11, 12)] + [
        ("B", v) for v in (1, 2, 3)
    ] + [("C", 99)]
    df = spark.createDataFrame(rows, ["g", "v"])
    r = cliffs_delta(df, "g", "v", "A", "B").collect()[0]
    assert r.delta == 1.0 and r.auc_ab == 1.0
    assert (r.n_a, r.n_b) == (3, 3)
    r2 = cliffs_delta(df, "g", "v", "B", "A").collect()[0]
    assert r2.delta == -1.0

    same = spark.createDataFrame(
        [("A", v) for v in (5, 6, 7)] + [("B", v) for v in (5, 6, 7)],
        ["g", "v"],
    )
    r3 = cliffs_delta(same, "g", "v", "A", "B").collect()[0]
    assert r3.delta == 0.0 and r3.auc_ab == 0.5

    r4 = cliffs_delta(df, "g", "v", "A", "Z").collect()[0]
    assert r4.delta is None and r4.n_b == 0


def test_group_entropy_closed_forms(spark):
    """Uniform 4-way mix -> entropy ln(4), norm ~1; a single-category
    key -> exactly 0.0 with NULL norm; 3:1 two-way mix matches the
    hand formula; NULL categories carry no bin."""
    import math

    from oakstore_spark.operators.curation import group_entropy

    rows = [("u", c) for c in ("a", "b", "c", "d") * 5]
    rows += [("s", "only")] * 7
    rows += [("m", "x")] * 3 + [("m", "y")] * 1 + [("m", None)] * 4
    df = spark.createDataFrame(rows, "k string, cat string")
    out = {r.k: r for r in group_entropy(df, ["k"], "cat").collect()}
    assert abs(out["u"].entropy - math.log(4)) < 1e-12
    assert abs(out["u"].entropy_norm - 1.0) < 1e-12
    assert out["s"].entropy == 0.0 and out["s"].entropy_norm is None
    assert out["s"].k_distinct == 1
    expect = -(0.75 * math.log(0.75) + 0.25 * math.log(0.25))
    assert abs(out["m"].entropy - expect) < 1e-12
    assert out["m"].n == 4  # NULL categories excluded


def test_dr_evaluate_hand_case_and_model_limits(spark):
    """Hand case (the IPS fixture plus a reward model): with a
    PERFECT per-action model, DR's correction term vanishes and
    dr_value == model baseline == true target value; with a zero
    model, DR degrades exactly to IPS."""
    from oakstore_spark.operators.experiments import dr_evaluate

    rows = (
        [("a", 1)] * 2 + [("a", 0)] * 2
        + [("b", 1)] * 3 + [("b", 0)] * 3
    )
    df = spark.createDataFrame(rows, ["act", "reward"])
    mu = spark.createDataFrame(
        [("a", 0.5), ("b", 0.5)], ["act", "prob"]
    )
    pi = spark.createDataFrame(
        [("a", 0.25), ("b", 0.75)], ["act", "prob"]
    )
    perfect = spark.createDataFrame(
        [("a", 0.5), ("b", 0.5)], ["act", "q"]
    )
    r = dr_evaluate(df, "act", "reward", mu, pi, perfect).collect()[0]
    assert abs(r.dr_value - 0.5) < 1e-12  # pi-weighted true value
    assert abs(r.model_value - 0.5) < 1e-12
    assert r.ips_value == 0.55

    zero = spark.createDataFrame(
        [("a", 0.0), ("b", 0.0)], ["act", "q"]
    )
    r2 = dr_evaluate(df, "act", "reward", mu, pi, zero).collect()[0]
    assert r2.dr_value == r2.ips_value == 0.55
    assert r2.model_value == 0.0


def test_bradley_terry_recovers_planted_strengths(spark):
    """Planted 4:2:1 strengths realized as exact expected win counts
    (A beats B 40/60, A beats C 48/60, B beats C 40/60): the MM fit
    must recover the ordering exactly and the strength RATIOS within
    a few percent; zero-win items rank last; self-comparisons raise;
    identical reruns are identical (no RNG)."""
    import pytest as _pytest

    from oakstore_spark.operators.labeling import bradley_terry

    duels = (
        [("A", "B")] * 40 + [("B", "A")] * 20
        + [("A", "C")] * 48 + [("C", "A")] * 12
        + [("B", "C")] * 40 + [("C", "B")] * 20
        + [("A", "D")] * 10  # D never wins
    )
    df = spark.createDataFrame(duels, ["winner", "loser"])
    out = {r.item: r for r in bradley_terry(df, "winner", "loser").collect()}
    assert [out[i].rank for i in ("A", "B", "C", "D")] == [1, 2, 3, 4]
    assert abs(out["A"].strength / out["B"].strength - 2.0) < 0.15
    assert abs(out["B"].strength / out["C"].strength - 2.0) < 0.15
    assert out["A"].wins == 98 and out["A"].comparisons == 130
    assert out["D"].wins == 0 and out["D"].strength < 1e-6
    out2 = {
        r.item: r.strength
        for r in bradley_terry(df, "winner", "loser").collect()
    }
    assert out2 == {k: v.strength for k, v in out.items()}
    withself = spark.createDataFrame(
        [("A", "A")], ["winner", "loser"]
    )
    with _pytest.raises(ValueError, match="self-comparison"):
        bradley_terry(withself, "winner", "loser")


def test_gini_coefficient_closed_forms(spark):
    """Perfect equality -> gini exactly 0; one unit holding the whole
    total -> exactly (n-1)/n; zero total -> NULL."""
    from oakstore_spark.operators.quality import gini_coefficient

    eq = spark.createDataFrame(
        [(i, 25) for i in range(40)], ["uid", "x"]
    )
    r = gini_coefficient(eq, "x", tiebreak_col="uid").collect()[0]
    assert r.gini == 0.0 and r.n == 40 and r.total == 1000

    one = spark.createDataFrame(
        [(i, 0) for i in range(19)] + [(99, 500)], ["uid", "x"]
    )
    r2 = gini_coefficient(one, "x", tiebreak_col="uid").collect()[0]
    assert r2.gini == (20 - 1) / 20

    zero = spark.createDataFrame(
        [(i, 0) for i in range(5)], ["uid", "x"]
    )
    assert gini_coefficient(zero, "x").collect()[0].gini is None


def test_corr_matrix_exact_extremes_and_guards(spark):
    """y = x gives r exactly 1.0, z = -x exactly -1.0 (small values
    keep the denominator square inside 2^53 so sqrt(v*v)==v); a
    constant column NULLs its rows; diagonal is 1.0; validation
    raises on <2 or >64 columns."""
    import random

    import pytest as _pytest

    from oakstore_spark.operators.quality import corr_matrix

    rng = random.Random(9)
    rows = [
        (v, v, -v, 7) for v in (rng.randint(0, 9) for _ in range(50))
    ]
    df = spark.createDataFrame(rows, ["x", "y", "z", "k"])
    out = {
        (r.col_a, r.col_b): r
        for r in corr_matrix(df, ["x", "y", "z", "k"]).collect()
    }
    assert len(out) == 10
    assert out[("x", "y")].r == 1.0
    assert out[("x", "z")].r == -1.0
    assert out[("x", "x")].r == 1.0
    assert out[("x", "k")].r is None and out[("k", "k")].r is None
    assert out[("x", "y")].n == 50
    with _pytest.raises(ValueError):
        corr_matrix(df, ["x"])
    with _pytest.raises(ValueError):
        corr_matrix(df, [f"c{i}" for i in range(65)])


def test_expected_calibration_error_limits(spark):
    """An exactly-calibrated corpus (bin mean_pred == obs_rate
    everywhere) scores ECE == MCE == 0.0 exactly; pushing one bin's
    labels to certainty raises both, and ECE weighs the gap by that
    bin's share."""
    from oakstore_spark.operators.quality import (
        expected_calibration_error,
    )

    # score 250 milli (bin 2): 1 of 4 positive -> perfectly calibrated
    # score 750 milli (bin 7): 3 of 4 positive -> perfectly calibrated
    rows = ([(250, 1)] + [(250, 0)] * 3) * 5
    rows += ([(750, 1)] * 3 + [(750, 0)]) * 5
    df = spark.createDataFrame(rows, ["score_m", "y"])
    r = expected_calibration_error(df, "score_m", "y").collect()[0]
    assert r.ece == 0.0 and r.mce == 0.0
    assert r.n == 40 and r.n_bins_occupied == 2

    # break bin 7: all positive -> gap |0.75 - 1.0| = 0.25 there
    rows2 = ([(250, 1)] + [(250, 0)] * 3) * 5 + [(750, 1)] * 20
    df2 = spark.createDataFrame(rows2, ["score_m", "y"])
    r2 = expected_calibration_error(df2, "score_m", "y").collect()[0]
    assert abs(r2.mce - 0.25) < 1e-12
    assert abs(r2.ece - 0.5 * 0.25) < 1e-12  # bin 7 holds half the mass


def test_isotonic_calibrate_hand_case_and_invariants(spark):
    """Hand-computed PAV: per-score rates [0.5, 0.25, 0.75, 0.5] pool
    into [0.375, 0.375, 0.625, 0.625]. Invariants: output monotone
    nondecreasing; each pool preserves its weighted mean (sum of
    calibrated*n == total positives); the distinct-score bound
    raises instead of collecting unbounded."""
    import pytest as _pytest

    from oakstore_spark.operators.quality import isotonic_calibrate

    rows = []
    for score, pos in [(0, 2), (1, 1), (2, 3), (3, 2)]:
        rows += [(score, 1)] * pos + [(score, 0)] * (4 - pos)
    df = spark.createDataFrame(rows, ["s", "y"])
    out = sorted(
        isotonic_calibrate(df, "s", "y").collect(),
        key=lambda r: r.score,
    )
    assert [r.calibrated for r in out] == [0.375, 0.375, 0.625, 0.625]
    assert [r.n for r in out] == [4, 4, 4, 4]
    cals = [r.calibrated for r in out]
    assert all(a <= b for a, b in zip(cals, cals[1:]))
    assert abs(sum(r.calibrated * r.n for r in out) - 8) < 1e-12
    with _pytest.raises(ValueError, match="distinct scores"):
        isotonic_calibrate(df, "s", "y", max_distinct_scores=2)


def test_multiclass_report_hand_computed(spark):
    """Hand-checked 4-class confusion, including a class that is
    predicted but never true (recall NULL, macro counts it as 0.0 —
    the scikit zero-division convention) and a class never
    mispredicted. __micro__ equals accuracy = 8/10."""
    from oakstore_spark.operators.quality import multiclass_report

    rows = (
        [("a", "a")] * 3 + [("a", "b")]
        + [("b", "b")] * 2 + [("b", "d")]
        + [("c", "c")] * 3
    )
    df = spark.createDataFrame(rows, ["y", "p"])
    out = {r.label: r for r in multiclass_report(df, "y", "p").collect()}
    assert set(out) == {"a", "b", "c", "d", "__macro__", "__micro__"}
    assert (out["a"].n_true, out["a"].n_pred, out["a"].tp) == (4, 3, 3)
    assert out["a"].precision == 1.0 and out["a"].recall == 0.75
    assert abs(out["a"].f1 - 6 / 7) < 1e-12
    assert abs(out["b"].precision - 2 / 3) < 1e-12
    assert (out["d"].n_true, out["d"].n_pred, out["d"].tp) == (0, 1, 0)
    assert out["d"].precision == 0.0 and out["d"].recall is None
    assert out["d"].f1 == 0.0
    assert out["c"].precision == 1.0 and out["c"].recall == 1.0
    mac = out["__macro__"]
    assert abs(mac.precision - (1 + 2 / 3 + 1 + 0) / 4) < 1e-12
    assert abs(mac.recall - (0.75 + 2 / 3 + 1 + 0) / 4) < 1e-12
    assert abs(mac.f1 - (6 / 7 + 2 / 3 + 1 + 0) / 4) < 1e-12
    mic = out["__micro__"]
    assert mic.precision == mic.recall == mic.f1 == 0.8
    assert mic.n_true == 10 and mic.tp == 8


def test_roc_auc_separation_ties_and_reversal(spark):
    """Perfectly separating score -> AUC exactly 1.0; constant score
    (all tied) -> exactly 0.5; reversed score -> exactly 0.0."""
    from oakstore_spark.operators.quality import roc_auc

    rows = [(i, 100 + i, 1 if i >= 50 else 0) for i in range(100)]
    df = spark.createDataFrame(rows, ["uid", "s", "y"])
    assert roc_auc(df, "s", "y").collect()[0].auc == 1.0

    const = spark.createDataFrame(
        [(i, 7, i % 2) for i in range(100)], ["uid", "s", "y"]
    )
    assert roc_auc(const, "s", "y").collect()[0].auc == 0.5

    rev = spark.createDataFrame(
        [(i, -i, 1 if i >= 50 else 0) for i in range(100)],
        ["uid", "s", "y"],
    )
    assert roc_auc(rev, "s", "y").collect()[0].auc == 0.0

    onec = spark.createDataFrame(
        [(1, 5, 1), (2, 6, 1)], ["uid", "s", "y"]
    )
    assert roc_auc(onec, "s", "y").collect()[0].auc is None


def test_pr_curve_and_calibration_hand(spark):
    """Hand-checked confusion counts at one threshold and an exactly
    calibrated score whose per-bin mean_pred equals obs_rate with the
    closed-form Brier."""
    from oakstore_spark.operators.quality import (
        calibration_report,
        pr_curve,
    )

    #  4 pos with scores [900, 800, 300, 100], 4 neg [700, 600, 200, 0]
    rows = [
        (900, 1), (800, 1), (300, 1), (100, 1),
        (700, 0), (600, 0), (200, 0), (0, 0),
    ]
    df = spark.createDataFrame(rows, ["s", "y"])
    at500 = {
        r.threshold: r for r in pr_curve(df, "s", "y", [500]).collect()
    }[500]
    assert (at500.tp, at500.fp, at500.fn, at500.tn) == (2, 2, 2, 2)
    assert at500.precision == 0.5 and at500.recall == 0.5

    # exactly calibrated: bin 2 (p=0.25): 1 of 4 positive; bin 7
    # (p=0.75): 3 of 4 positive
    cal_rows = [(250, 1), (250, 0), (250, 0), (250, 0),
                (750, 1), (750, 1), (750, 1), (750, 0)]
    cdf = spark.createDataFrame(cal_rows, ["s", "y"])
    out = {r.bin: r for r in calibration_report(cdf, "s", "y").collect()}
    assert out[2].mean_pred == 0.25 and out[2].obs_rate == 0.25
    assert out[7].mean_pred == 0.75 and out[7].obs_rate == 0.75
    brier = sum(r.brier_contrib for r in out.values())
    # closed form: every row deviates by exactly 0.25 or 0.75
    expect = (
        (0.75**2 + 3 * 0.25**2) + (3 * 0.25**2 + 0.75**2)
    ) / 8
    assert abs(brier - expect) < 1e-12


def test_dp_release_determinism_clamping_and_scale(spark):
    """Memoized noise: identical calls release identical values; sum
    mode clamps each contribution (two corpora whose outlier differs
    only above the clamp release the SAME value); mean |noise| over
    many groups tracks the Laplace scale 1/epsilon."""
    from oakstore_spark.operators.pii import dp_release

    rows = [(f"g{i % 50}", 1) for i in range(500)]
    df = spark.createDataFrame(rows, ["g", "x"])
    a = {
        r.g: r.released
        for r in dp_release(df, ["g"], 1.0, replay_salt="dp").collect()
    }
    b = {
        r.g: r.released
        for r in dp_release(df, ["g"], 1.0, replay_salt="dp").collect()
    }
    assert a == b
    noises = [v - 10.0 for v in a.values()]  # every group n=10
    mean_abs = sum(abs(n) for n in noises) / len(noises)
    assert 0.3 < mean_abs < 3.0  # Laplace(1) mean |noise| = 1
    assert any(n < 0 for n in noises) and any(n > 0 for n in noises)

    df_hi = spark.createDataFrame([("g", 50), ("g", 3)], ["g", "x"])
    df_vhi = spark.createDataFrame([("g", 5000), ("g", 3)], ["g", "x"])
    r1 = dp_release(
        df_hi, ["g"], 1.0, value_col="x", clamp=10, replay_salt="dp"
    ).collect()
    r2 = dp_release(
        df_vhi, ["g"], 1.0, value_col="x", clamp=10, replay_salt="dp"
    ).collect()
    assert r1[0].released == r2[0].released  # both outliers clamp to 10

    import pytest as _pytest

    with _pytest.raises(ValueError):
        dp_release(df_hi, ["g"], 1.0, value_col="x", replay_salt="dp")


def test_dp_release_salt_contract(spark):
    """r12 ADVICE (high): the memoized-noise release is only DP when
    the salt is secret — the operator must refuse ambiguous or
    guessable configurations. Exactly one of secret_salt/replay_salt;
    secret_salt rejects short or dictionary values; a proper secret
    and a replay salt of the same string produce identical releases
    (same keyed-PRF path — the modes differ in CONTRACT, not math)."""
    import pytest as _pytest

    from oakstore_spark.operators.pii import dp_release

    df = spark.createDataFrame([("a", 1), ("b", 2)], ["g", "x"])
    with _pytest.raises(ValueError, match="exactly one"):
        dp_release(df, ["g"], 1.0)
    with _pytest.raises(ValueError, match="exactly one"):
        dp_release(
            df, ["g"], 1.0, secret_salt="x" * 20, replay_salt="dp"
        )
    with _pytest.raises(ValueError, match="high-entropy"):
        dp_release(df, ["g"], 1.0, secret_salt="short")
    with _pytest.raises(ValueError, match="high-entropy"):
        dp_release(df, ["g"], 1.0, secret_salt="dp")
    sec = "k3q8-zzt0-m1x9-vc4p"
    a = {
        r.g: r.released
        for r in dp_release(df, ["g"], 1.0, secret_salt=sec).collect()
    }
    b = {
        r.g: r.released
        for r in dp_release(df, ["g"], 1.0, replay_salt=sec).collect()
    }
    assert a == b


def test_train_topics_recovers_planted_topics(spark):
    """Planted mixture of unigrams: three disjoint 6-word topic
    vocabularies (plus one shared stopword), 60 docs each drawn purely
    from its topic. Hard-EM from the deterministic md5 init must
    partition the docs EXACTLY along the plant (up to label
    permutation), concentrate each learned topic's words on one
    planted vocabulary, and be run-to-run identical (no RNG)."""
    import random

    from oakstore_spark.operators.text import train_topics

    vocabs = [
        ["apple", "pear", "plum", "grape", "melon", "fig"],
        ["circuit", "voltage", "diode", "resistor", "anode", "relay"],
        ["sonnet", "stanza", "meter", "rhyme", "verse", "ode"],
    ]
    rng = random.Random(5)
    rows = []
    for d in range(180):
        t = d % 3
        words = [rng.choice(vocabs[t]) for _ in range(30)] + ["the"]
        rows.append((d, " ".join(words)))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    topics, assign = train_topics(
        df, "text", "doc_id", k=3, n_iters=5, vocab_size=100,
        return_assignments=True,
    )
    a = {r.doc: r.topic for r in assign.collect()}
    assert len(a) == 180
    # exact partition recovery up to permutation
    label = {t: a[t] for t in range(3)}  # learned label per plant
    assert len(set(label.values())) == 3
    for d, lt in a.items():
        assert lt == label[d % 3]
    # each learned topic's non-stopword mass sits on one planted vocab
    tw = topics.collect()
    for plant, learned in label.items():
        words = {
            r.word for r in tw
            if r.topic == learned and r.word != "the"
        }
        assert words <= set(vocabs[plant])
    # determinism: a second run reproduces the table exactly
    topics2 = train_topics(
        df, "text", "doc_id", k=3, n_iters=5, vocab_size=100,
    )
    assert sorted(map(tuple, topics.collect())) == sorted(
        map(tuple, topics2.collect())
    )


def test_score_uplift_literal_weights(spark):
    """score_uplift with hand-picked weights reproduces the sigmoid
    difference exactly (driver-replicated), and rejects weight
    vectors whose length does not match intercept+features."""
    import math

    import pytest as _pytest

    from oakstore_spark.operators.experiments import score_uplift

    rows = [(1, 2.0, 0.5), (2, 0.0, 3.0), (3, -1.0, 1.0)]
    df = spark.createDataFrame(rows, ["uid", "x1", "x2"])
    w_t, w_c = [0.5, 1.0, -0.5], [-0.25, 0.5, 0.25]
    out = {
        r.uid: r
        for r in score_uplift(df, ["x1", "x2"], w_t, w_c).collect()
    }

    def sig(w, x1, x2):
        return 1.0 / (1.0 + math.exp(-(w[0] + w[1] * x1 + w[2] * x2)))

    for uid, x1, x2 in rows:
        assert abs(out[uid].p_treated - sig(w_t, x1, x2)) < 1e-12
        assert abs(out[uid].p_control - sig(w_c, x1, x2)) < 1e-12
        assert abs(
            out[uid].uplift_score
            - (sig(w_t, x1, x2) - sig(w_c, x1, x2))
        ) < 1e-12
    with _pytest.raises(ValueError, match="entries"):
        score_uplift(df, ["x1", "x2"], [0.5, 1.0], w_c)


def test_dp_histogram_grid_clamping_and_determinism(spark):
    """Every bin row is emitted (true-zero bins get noise like any
    other — their absence would leak the zero); out-of-range values
    clamp into the edge bins; identical calls release identical
    values; the salt contract is enforced."""
    import pytest as _pytest

    from oakstore_spark.operators.pii import dp_histogram

    # values only in bins 2 and 7 of [0,100)/10; outliers clamp
    rows = [(25.0,)] * 30 + [(75.0,)] * 20 + [(-50.0,)] * 5 + [(999.0,)] * 7
    df = spark.createDataFrame(rows, ["v"])
    a = {
        r.bin: r
        for r in dp_histogram(
            df, "v", 1.0, 10, 0.0, 100.0, replay_salt="h"
        ).collect()
    }
    assert len(a) == 10  # full grid, including true-zero bins
    assert a[0].bin_lo == 0.0 and a[9].bin_hi == 100.0
    b = {
        r.bin: r.released
        for r in dp_histogram(
            df, "v", 1.0, 10, 0.0, 100.0, replay_salt="h"
        ).collect()
    }
    assert {k: v.released for k, v in a.items()} == b
    # noise is Laplace(1): released stays within +-20 of truth whp,
    # and the clamped outliers land in bins 0 and 9
    truth = {0: 5, 2: 30, 7: 20, 9: 7}
    for i in range(10):
        assert abs(a[i].released - truth.get(i, 0)) < 20
    with _pytest.raises(ValueError, match="exactly one"):
        dp_histogram(df, "v", 1.0, 10, 0.0, 100.0)
    with _pytest.raises(ValueError, match="hi > lo"):
        dp_histogram(df, "v", 1.0, 10, 5.0, 5.0, replay_salt="h")


def test_dp_quantiles_post_processing_consistency(spark):
    """dp_quantiles must equal a driver-side replay of the
    post-processing chain over the (already oracle-checked)
    dp_histogram release: clamp at 0, running-sum, first bin to
    reach q*total, linear interpolation — post-processing is
    epsilon-free, so the two must agree exactly."""
    from oakstore_spark.operators.pii import dp_histogram, dp_quantiles

    rows = [(float(i % 100),) for i in range(3000)]
    df = spark.createDataFrame(rows, ["v"])
    kw = dict(epsilon=2.0, n_bins=10, lo=0.0, hi=100.0)
    hist = sorted(
        dp_histogram(df, "v", replay_salt="q", **kw).collect(),
        key=lambda r: r.bin,
    )
    pos = [max(r.released, 0.0) for r in hist]
    cum = []
    run = 0.0
    for p in pos:
        run += p
        cum.append(run)
    tot = max(cum)
    width = 10.0
    got = {
        r.q: r.value
        for r in dp_quantiles(
            df, "v", qs=[0.25, 0.5, 0.9], replay_salt="q", **kw
        ).collect()
    }
    for q in (0.25, 0.5, 0.9):
        target = q * tot
        b = next(i for i in range(10) if cum[i] >= target)
        prev = cum[b] - pos[b]
        expect = hist[b].bin_lo + (target - prev) / pos[b] * width
        assert abs(got[q] - expect) < 1e-12
        # sanity: uniform data, mild noise -> quantile near q*100
        assert abs(got[q] - q * 100.0) < 15.0


def test_ipw_ate_recovers_planted_effect(spark):
    """Planted confounding: a binary confounder drives both treatment
    propensity (0.8 vs 0.2) and the outcome baseline (+5), with a
    constant true effect of +2. The naive arm difference reads a
    biased 5.0; the saturated propensity fit makes the Hajek IPW
    estimate recover 2.0 (exactly, up to fit tolerance)."""
    from oakstore_spark.operators.experiments import ipw_ate

    rows = []
    for f in (0, 1):
        for i in range(100):
            t = int(i % 10 < (8 if f == 1 else 2))
            y = 10 + 5 * f + 2 * t
            rows.append((t, float(f), y))
    df = spark.createDataFrame(rows, ["t", "f", "y"])
    out = ipw_ate(df, "t", ["f"], "y", treated=1, n_iter=10).collect()[0]
    assert out.n == 200 and out.n_treated == 100
    assert abs(out.naive_diff - 5.0) < 1e-9  # confounded
    assert abs(out.ate_ipw - 2.0) < 0.01     # deconfounded


def test_kappa_hand_values_and_contracts(spark):
    """Cohen's kappa on the textbook 2x2 table equals the hand value;
    perfect agreement reads 1.0 exactly; a single shared label reads
    NULL (chance agreement undefined), never 0/0. Fleiss reduces to
    a hand-computed value on a small pool and rejects ragged
    pools."""
    from oakstore_spark.operators.labeling import (
        cohens_kappa,
        fleiss_kappa,
    )

    # classic: a=20 agree-yes, d=15 agree-no, b=10, c=5 (N=50)
    rows = (
        [("y", "y")] * 20 + [("n", "n")] * 15
        + [("y", "n")] * 10 + [("n", "y")] * 5
    )
    df = spark.createDataFrame(rows, ["la", "lb"])
    r = cohens_kappa(df, "la", "lb").collect()[0]
    po = 35 / 50
    pe = (30 * 25 + 20 * 25) / 2500
    assert r.p_observed == po and r.p_expected == pe
    assert abs(r.kappa - (po - pe) / (1 - pe)) < 1e-12

    perfect = spark.createDataFrame(
        [("a", "a")] * 3 + [("b", "b")] * 2, ["la", "lb"]
    )
    assert cohens_kappa(perfect, "la", "lb").collect()[0].kappa == 1.0
    const = spark.createDataFrame([("a", "a")] * 5, ["la", "lb"])
    assert cohens_kappa(const, "la", "lb").collect()[0].kappa is None

    # Fleiss hand case: 4 items x 3 raters
    fr = [
        (1, "g"), (1, "g"), (1, "g"),      # unanimous
        (2, "g"), (2, "g"), (2, "b"),
        (3, "b"), (3, "b"), (3, "b"),
        (4, "g"), (4, "b"), (4, "b"),
    ]
    fdf = spark.createDataFrame(fr, ["item", "lab"])
    out = fleiss_kappa(fdf, "item", "lab").collect()[0]
    # P_i: (9-3)/6=1, (5-3)/6=1/3, 1, 1/3 -> p_bar = 2/3
    # p_g = 6/12, p_b = 6/12 -> P_e = 1/2
    assert abs(out.p_bar - 2 / 3) < 1e-12
    assert out.p_expected == 0.5
    assert abs(out.kappa - (2 / 3 - 0.5) / 0.5) < 1e-12

    import pytest as _pytest

    ragged = spark.createDataFrame(
        fr + [(4, "g")], ["item", "lab"]
    )
    with _pytest.raises(ValueError):
        fleiss_kappa(ragged, "item", "lab")


def test_bh_adjust_hand_case_and_monotonicity(spark):
    """Textbook BH: p = [0.01, 0.02, 0.03, 0.5], n=4, alpha=0.05 ->
    q = [0.04, 0.04, 0.04, 0.5], first three rejected; q-values are
    monotone non-decreasing in rank and never exceed 1."""
    from oakstore_spark.operators.experiments import bh_adjust

    df = spark.createDataFrame(
        [("a", 0.01), ("b", 0.02), ("c", 0.03), ("d", 0.5)],
        ["m", "p"],
    )
    out = bh_adjust(df, "p", alpha=0.05, key_cols=["m"]).orderBy(
        "rank"
    ).collect()
    qs = [r.q_value for r in out]
    assert abs(qs[0] - 0.04) < 1e-12
    assert abs(qs[1] - 0.04) < 1e-12  # min(0.02*4/2=0.04, ...)
    assert abs(qs[2] - 0.04) < 1e-12
    assert qs[3] == 0.5
    assert [r.reject for r in out] == [True, True, True, False]
    assert all(a <= b + 1e-15 for a, b in zip(qs, qs[1:]))
    assert max(qs) <= 1.0


def test_dp_epsilon_guard(spark):
    """r14 (r13 ADVICE): a nonsensical privacy budget fails fast in
    every DP release op — epsilon = 0 would divide by zero in the
    Laplace scale, a negative epsilon silently flips the noise sign,
    NaN/inf are nonsense."""
    import math as _math

    import pytest as _pytest

    from oakstore_spark.operators.pii import (
        dp_histogram,
        dp_quantiles,
        dp_release,
    )

    df = spark.createDataFrame(
        [("a", 1.0), ("b", 2.0)], ["g", "x"]
    )
    for bad in (0.0, -1.0, float("nan"), float("inf")):
        with _pytest.raises(ValueError, match="epsilon"):
            dp_release(df, ["g"], bad, replay_salt="dp")
        with _pytest.raises(ValueError, match="epsilon"):
            dp_histogram(df, "x", bad, 4, 0.0, 4.0, replay_salt="dp")
        with _pytest.raises(ValueError, match="epsilon"):
            dp_quantiles(
                df, "x", bad, 4, 0.0, 4.0, [0.5], replay_salt="dp"
            )
    # a valid epsilon still releases
    assert _math.isfinite(
        dp_release(df, ["g"], 0.5, replay_salt="dp").collect()[0].released
    )


def test_bradley_terry_and_isotonic_fail_fast_before_collect(spark):
    """r14 (r13 VERDICT): the max_items / max_distinct_scores guards
    must fire from a COUNTED PROBE before anything is collected —
    asserted here on over-cap relations with tiny in-test caps."""
    import pytest as _pytest

    from oakstore_spark.operators.labeling import bradley_terry
    from oakstore_spark.operators.quality import isotonic_calibrate

    games = spark.createDataFrame(
        [(f"i{a}", f"i{(a + 1) % 7}") for a in range(7)],
        ["winner", "loser"],
    )
    with _pytest.raises(ValueError, match="max_items"):
        bradley_terry(games, "winner", "loser", max_items=5)
    scored = spark.createDataFrame(
        [(s, s % 2) for s in range(9)], ["s", "y"]
    )
    with _pytest.raises(ValueError, match="max_distinct_scores"):
        isotonic_calibrate(scored, "s", "y", max_distinct_scores=4)


def test_grouped_auc_hand_cases(spark):
    """r14: per-segment exact AUC. Segment 'perfect' ranks every
    positive above every negative -> 1.0; 'inverted' -> 0.0; 'ties'
    where all scores equal -> 0.5 via the half-tie convention;
    'onesided' (no negatives) -> NULL; matches the global roc_auc on
    a single-segment frame."""
    from oakstore_spark.operators.quality import grouped_auc, roc_auc

    rows = []
    rows += [("perfect", 10 + i, 1) for i in range(5)]
    rows += [("perfect", i, 0) for i in range(5)]
    rows += [("inverted", i, 1) for i in range(5)]
    rows += [("inverted", 10 + i, 0) for i in range(5)]
    rows += [("ties", 7, y) for y in (0, 1, 0, 1)]
    rows += [("onesided", 3, 1), ("onesided", 4, 1)]
    df = spark.createDataFrame(rows, ["seg", "s", "y"])
    out = {r.seg: r for r in grouped_auc(df, ["seg"], "s", "y").collect()}
    assert out["perfect"].auc == 1.0
    assert out["inverted"].auc == 0.0
    assert out["ties"].auc == 0.5
    assert out["onesided"].auc is None and out["onesided"].n_neg == 0
    g = roc_auc(df.where(F.col("seg") == "perfect"), "s", "y").collect()[0]
    assert g.auc == out["perfect"].auc and g.u2 == out["perfect"].u2


def test_event_study_planted_dynamic_effect(spark):
    """r14: leads-and-lags DiD. A planted panel with parallel trends
    (both arms drift +3/period) and a treatment effect that turns on
    at period 0 (+10) and ramps (+5/period after) recovers: all
    pre-period effects EXACTLY 0 (integer construction), post-period
    effects exactly the planted ramp; baseline row effect 0; missing
    baseline raises."""
    import pytest as _pytest

    from oakstore_spark.operators.experiments import event_study

    rows = []
    for unit in range(40):
        arm = unit % 2
        for r in range(-4, 5):
            base = 100 + 3 * (r + 4) + (7 if arm == 1 else 0)
            eff = (10 + 5 * r) if (arm == 1 and r >= 0) else 0
            rows.append((arm, r, base + eff + (unit % 5)))
    df = spark.createDataFrame(rows, ["arm", "r", "y"])
    out = {
        r.period: r
        for r in event_study(
            df, "arm", "r", "y", treated=1, baseline_period=-1
        ).collect()
    }
    for r in range(-4, 0):
        assert out[r].effect == 0.0
    for r in range(0, 5):
        assert out[r].effect == 10.0 + 5 * r
    assert out[-1].diff == 7.0  # arm offset at baseline
    assert out[2].se_diff is not None and out[2].se_diff > 0
    with _pytest.raises(ValueError, match="baseline"):
        event_study(df, "arm", "r", "y", treated=1,
                    baseline_period=99)


def test_fairness_report_hand_case_and_component_parity(spark):
    """r15 (r14 verdict ask #9): fairness_report. Hand case — a
    perfectly-ranked segment (auc 1, ece 0, brier 0), an
    uninformative one (all scores 500, half pos: auc 0.5, ece 0,
    brier 0.25), a one-class segment (auc NULL, calibration still
    defined) — plus component parity: auc column == grouped_auc on
    the same data, segment for segment."""
    from pyspark.sql import functions as F

    from oakstore_spark.operators.quality import (
        fairness_report,
        grouped_auc,
    )

    rows = []
    # segment 0: perfect ranking + perfect calibration at the extremes
    rows += [(0, 0, 0)] * 10 + [(0, 1000, 1)] * 10
    # segment 1: constant 500 score, half positives
    rows += [(1, 500, 1)] * 5 + [(1, 500, 0)] * 5
    # segment 2: one-class (all negative), overconfident score 900
    rows += [(2, 900, 0)] * 4
    df = spark.createDataFrame(rows, "seg long, score_m long, y long")
    out = {
        r.seg: r
        for r in fairness_report(
            df, ["seg"], "score_m", "y", n_bins=10, score_scale=1000
        ).collect()
    }
    assert out[0].auc == 1.0 and out[0].ece == 0.0 and out[0].brier == 0.0
    assert out[0].base_rate == 0.5
    assert out[1].auc == 0.5 and out[1].ece == 0.0
    assert out[1].brier == 0.25
    assert out[2].auc is None
    assert out[2].ece == 0.9  # |900*4 - 0| / (1000*4)
    assert out[2].brier == 0.81
    assert out[2].base_rate == 0.0

    # component parity vs grouped_auc on a messier corpus
    import random

    rng = random.Random(3)
    rows2 = [
        (i % 4, rng.randrange(0, 1001),
         1 if rng.random() < 0.3 + 0.1 * (i % 4) else 0)
        for i in range(2000)
    ]
    d2 = spark.createDataFrame(rows2, "seg long, score_m long, y long")
    fr = {
        r.seg: r
        for r in fairness_report(d2, ["seg"], "score_m", "y").collect()
    }
    ga = {
        r.seg: r
        for r in grouped_auc(d2, ["seg"], "score_m", "y").collect()
    }
    assert set(fr) == set(ga)
    for g in fr:
        assert fr[g].u2 == ga[g].u2
        assert fr[g].auc == ga[g].auc
        assert fr[g].n_pos == ga[g].n_pos
        assert fr[g].n_scores == ga[g].n_scores
        # ece/brier bounded sanity on random scores
        assert 0.0 <= fr[g].ece <= 1.0
        assert 0.0 <= fr[g].brier <= 1.0


def test_psm_att_hand_case_tiebreak_caliper_and_confound_recovery(spark):
    """r15: propensity-score matching ATT. (1) hand case with exact
    closed-form ATT; (2) |diff| ties break to the LOWER control
    score; (3) caliper drops (and reports) unmatchable treated
    cells; (4) on a planted confounded corpus (outcome = score +
    effect*treat) matching recovers the effect while the naive
    mean difference is badly biased; (5) no-controls and guard
    paths."""
    import pytest as _pytest

    from oakstore_spark.operators.experiments import psm_att

    # (1) + (2): treated at s=10 has controls at 8 and 12 (both
    # |2|) -> matches s_c=8 (mean y 100); treated at s=20 matches
    # s_c=12 (mean y 50, two controls 40+60)
    rows = [
        (1, 10, 300), (1, 10, 340),   # treated cell s=10: n=2
        (1, 20, 500),                  # treated cell s=20: n=1
        (0, 8, 100),
        (0, 12, 40), (0, 12, 60),
    ]
    df = spark.createDataFrame(rows, "t long, s long, y long")
    out = psm_att(df, "t", "s", "y").collect()[0]
    assert out.n_treated == 3 and out.n_control == 3
    assert out.n_matched == 3 and out.n_unmatched == 0
    # att = mean over treated units of y - ybar_c(match):
    #  (300-100) + (340-100) + (500-50) -> (200+240+450)/3
    assert abs(out.att - (200 + 240 + 450) / 3) < 1e-9
    assert out.mean_treated == (300 + 340 + 500) / 3

    # (3) caliper 5: s=20 cell (dist 8 to s_c=12) drops out
    out2 = psm_att(df, "t", "s", "y", caliper=5).collect()[0]
    assert out2.n_matched == 2 and out2.n_unmatched == 1
    assert abs(out2.att - (200 + 240) / 2) < 1e-9

    # (4) confound: score drives BOTH treatment probability and the
    # outcome; true effect = 7
    import random

    rng = random.Random(11)
    rows4 = []
    for i in range(4000):
        s = rng.randrange(0, 101)
        p_treat = 0.1 + 0.8 * (s / 100.0)
        t = 1 if rng.random() < p_treat else 0
        y = 10 * s + (7 if t else 0)
        rows4.append((t, s, y))
    d4 = spark.createDataFrame(rows4, "t long, s long, y long")
    r4 = psm_att(d4, "t", "s", "y").collect()[0]
    naive = (
        d4.where("t=1").agg(F.avg("y")).collect()[0][0]
        - d4.where("t=0").agg(F.avg("y")).collect()[0][0]
    )
    assert abs(r4.att - 7) < 2.0          # matching deconfounds
    assert abs(naive - 7) > 50            # naive diff is score bias

    # (5) no controls -> NULL att, counts honest; guard
    d5 = spark.createDataFrame([(1, 5, 9)], "t long, s long, y long")
    r5 = psm_att(d5, "t", "s", "y").collect()[0]
    assert r5.att is None and r5.n_treated == 1 and r5.n_control == 0
    with _pytest.raises(ValueError, match="max_cells"):
        psm_att(d4, "t", "s", "y", max_cells=10)


def test_rank_sum_hand_cases_and_symmetry(spark):
    """r15: Wilcoxon-Mann-Whitney rank-sum. Hand cases with
    closed-form U/z (separated arms, interleaved arms, heavy ties),
    arm-swap antisymmetry of z, all-tied -> z NULL with auc 0.5,
    and the location-shift power check a Welch t on a heavy tail
    underuses."""
    import math

    from oakstore_spark.operators.experiments import rank_sum_test

    # fully separated: a = {1,2}, b = {3,4} -> U = 0
    d = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 3), (1, 4)], "arm long, v long"
    )
    r = rank_sum_test(d, "arm", "v", 0, 1).collect()[0]
    assert r.u2 == 0 and r.auc_a == 0.0
    # Var = 2*2*5/12 (no ties), z = (0-2)/sqrt(5/3)
    assert abs(r.z - (0 - 2.0) / math.sqrt(2 * 2 * 5 / 12.0)) < 1e-12
    # swap arms: z negates, auc mirrors
    r2 = rank_sum_test(d, "arm", "v", 1, 0).collect()[0]
    assert abs(r2.z + r.z) < 1e-12 and r2.auc_a == 1.0

    # ties: a = {1,1}, b = {1,2} -> U = 2*0.5 + ... per pair:
    # (1,1)x2 ties -> 0.5 each x2 pairs... u2 counts 2*wins+ties:
    # pairs (a=1,b=1): tie x2; (a=1,b=2): loss x2 -> u2 = 2
    dt = spark.createDataFrame(
        [(0, 1), (0, 1), (1, 1), (1, 2)], "arm long, v long"
    )
    rt = rank_sum_test(dt, "arm", "v", 0, 1).collect()[0]
    assert rt.u2 == 2 and rt.auc_a == 0.25
    assert rt.tie_cubes == (3 ** 3 - 3)  # one pooled tie group of 3

    # all tied -> variance 0 -> z NULL, auc exactly 1/2
    da = spark.createDataFrame(
        [(0, 5), (0, 5), (1, 5)], "arm long, v long"
    )
    ra = rank_sum_test(da, "arm", "v", 0, 1).collect()[0]
    assert ra.z is None and ra.auc_a == 0.5

    # heavy-tail location shift: lognormal-ish integers with b
    # shifted up; rank-sum must fire decisively
    import random

    rng = random.Random(5)
    rows = []
    for i in range(2000):
        base = int(math.exp(rng.gauss(3.0, 1.0)))
        rows.append((0, base))
        rows.append((1, base + rng.randrange(0, 8) + 3))
    dh = spark.createDataFrame(rows, "arm long, v long")
    rh = rank_sum_test(dh, "arm", "v", 0, 1).collect()[0]
    assert rh.z < -8.0 and rh.auc_a < 0.45


def test_trimmed_mean_diff_hand_cases_and_robustness(spark):
    """r15: trimmed-mean A/B. (1) hand case with exact kept sets
    across cell boundaries (ties straddling the trim cut); (2) a
    whale outlier moves the plain mean but NOT the 10%-trimmed mean;
    (3) trim 0 == plain means; (4) over-trim -> NULL; (5) guard."""
    import pytest as _pytest

    from oakstore_spark.operators.experiments import trimmed_mean_diff

    # arm 0: values 1..10 (n=10, k=1 at 10%): drop 1 and 10 ->
    # mean of 2..9 = 5.5. arm 1: [0,0,0,100,100] n=5, k=0 (floor .5)
    rows = [(0, i) for i in range(1, 11)] + [
        (1, 0), (1, 0), (1, 0), (1, 100), (1, 100)
    ]
    d = spark.createDataFrame(rows, "arm long, v long")
    r = trimmed_mean_diff(d, "arm", "v", 0, 1, trim_frac=0.10).collect()[0]
    assert (r.n_a, r.k_a) == (10, 1)
    assert r.trimmed_sum_a == sum(range(2, 10))
    assert r.mean_a == 5.5
    assert (r.n_b, r.k_b) == (5, 0)
    assert r.mean_b == 40.0
    assert r.diff == 5.5 - 40.0

    # ties straddling the cut: arm 0 = [1,1,1,9,9,9], k=1 -> keep
    # two 1s and two 9s -> mean 5
    d2 = spark.createDataFrame(
        [(0, 1)] * 3 + [(0, 9)] * 3 + [(1, 5)],
        "arm long, v long",
    )
    r2 = trimmed_mean_diff(d2, "arm", "v", 0, 1, trim_frac=1 / 6).collect()[0]
    assert r2.mean_a == 5.0 and r2.trimmed_sum_a == 20

    # whale robustness: identical arms except one 10^9 outlier in b
    base = [(0, i % 50) for i in range(1000)] + [
        (1, i % 50) for i in range(1000)
    ]
    whale = base + [(1, 10 ** 9)]
    dw = spark.createDataFrame(whale, "arm long, v long")
    rw = trimmed_mean_diff(dw, "arm", "v", 0, 1, trim_frac=0.10).collect()[0]
    assert abs(rw.diff) < 0.5  # the whale is trimmed away
    plain = trimmed_mean_diff(dw, "arm", "v", 0, 1, trim_frac=0.0).collect()[0]
    assert plain.diff < -900_000  # ...but dominates the plain mean

    # trim 0 == exact plain means
    assert plain.mean_a == sum(i % 50 for i in range(1000)) / 1000

    # over-trim empties an arm -> NULLs
    d5 = spark.createDataFrame([(0, 1), (0, 2), (1, 3)], "arm long, v long")
    r5 = trimmed_mean_diff(d5, "arm", "v", 0, 1, trim_frac=0.49).collect()[0]
    assert r5.mean_b is None or r5.mean_b == 3.0  # k_b = floor(.49)=0
    with _pytest.raises(ValueError, match="trim_frac"):
        trimmed_mean_diff(d5, "arm", "v", 0, 1, trim_frac=0.5)
