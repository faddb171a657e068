"""Degenerate-input behavior of the dedup/similarity operators: empty
corpora, single documents, all-identical documents. These are the shapes
a 100 TB pipeline hits constantly at the per-partition level (an empty
filter result, one straggler doc), so none of them may throw."""

from __future__ import annotations

import pandas as pd
import pytest

from oakstore_spark.operators.dedup import (
    dedup_clusters,
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_near_dup_pairs,
)


def _docs(spark, texts):
    pdf = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    return spark.createDataFrame(pdf, "doc_id bigint, text string")


@pytest.fixture
def empty_docs(spark):
    return spark.createDataFrame([], "doc_id bigint, text string")


def test_ngram_pairs_empty_corpus(spark, empty_docs):
    out = ngram_jaccard_pairs(empty_docs, "doc_id", "text", threshold=0.8)
    assert out.count() == 0
    assert out.columns == ["id_a", "id_b", "jaccard"]


def test_ngram_pairs_single_doc(spark):
    out = ngram_jaccard_pairs(
        _docs(spark, ["the quick brown fox jumps"]), "doc_id", "text", threshold=0.8
    )
    assert out.count() == 0


def test_ngram_pairs_identical_docs(spark):
    out = ngram_jaccard_pairs(
        _docs(spark, ["same text here"] * 4), "doc_id", "text", threshold=0.99
    ).toPandas()
    # 4 identical docs -> C(4,2)=6 pairs at jaccard exactly 1.0
    assert len(out) == 6
    assert (out["jaccard"] == 1.0).all()


def test_ngram_pairs_short_and_empty_strings(spark):
    # <n-length and empty normalized strings use the length-tagged code
    out = ngram_jaccard_pairs(
        _docs(spark, ["", "a", "a", "ab"]), "doc_id", "text", threshold=0.99
    ).toPandas()
    # the two "a" docs are the only identical pair
    assert len(out) == 1
    assert {out.loc[0, "id_a"], out.loc[0, "id_b"]} == {1, 2}


def test_minhash_pairs_empty_and_identical(spark, empty_docs):
    assert minhash_lsh_pairs(empty_docs, "doc_id", "text").count() == 0
    out = minhash_lsh_pairs(
        _docs(spark, ["repeated body of text"] * 3), "doc_id", "text", threshold=0.9
    ).toPandas()
    assert len(out) == 3 and (out["jaccard"] == 1.0).all()


def test_simhash_pairs_empty(spark, empty_docs):
    assert simhash_near_dup_pairs(empty_docs, "doc_id", "text").count() == 0


def test_exact_dedup_empty(spark, empty_docs):
    assert exact_dedup(empty_docs, "doc_id", "text").count() == 0


def test_dedup_clusters_empty_pairs(spark):
    pairs = spark.createDataFrame([], "id_a bigint, id_b bigint")
    out = dedup_clusters(pairs)
    assert out.count() == 0
    assert out.columns == ["id", "cluster_id"]


def test_dedup_clusters_two_components(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a bigint, id_b bigint"
    )
    out = {r["id"]: r["cluster_id"] for r in dedup_clusters(pairs).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_correctness_comparator_detects_mutations():
    """The oracle comparator itself must catch every mutation class it
    claims to check (guards against a harness that vacuously passes)."""
    import importlib.util
    from pathlib import Path

    import pandas as pd

    spec = importlib.util.spec_from_file_location(
        "check_correctness",
        Path(__file__).resolve().parent.parent / "tools" / "check_correctness.py",
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    compare = mod.compare

    base = pd.DataFrame({"k": [1, 2, 3], "v": [1.5, 2.5, 3.5], "s": list("abc")})
    assert compare("ok", base.copy(), base.copy()) == []

    short = base.iloc[:2].copy()
    assert any("rowcount" in p for p in compare("rows", short, base))

    renamed = base.rename(columns={"v": "w"})
    assert any("columns" in p for p in compare("cols", renamed, base))

    flipped = base.copy()
    flipped.loc[1, "v"] = 9.9
    assert any("float-MISMATCH" in p for p in compare("float", flipped, base))

    tweaked = base.copy()
    tweaked.loc[0, "s"] = "z"
    assert any(p.startswith("value col=s") for p in compare("str", tweaked, base))

    # row order must NOT matter (canonicalization)
    shuffled = base.iloc[[2, 0, 1]].reset_index(drop=True)
    assert compare("order", shuffled, base) == []
    # tiny float noise is reported as inexact, not silently passed
    noisy = base.copy()
    noisy["v"] = noisy["v"] + 1e-13
    out = compare("noise", noisy, base)
    assert out and all("inexact" in p for p in out)

    # signed zero: numpy == says -0.0 == 0.0 but the driver hashes
    # bytes where they differ — the checker must flag it HARD (the
    # exact class that slipped through in r5's q_audio_resample).
    szero_s = pd.DataFrame({"v": [0.0, 1.5, float("nan")]})
    szero_o = pd.DataFrame({"v": [-0.0, 1.5, float("nan")]})
    out = compare("szero", szero_s, szero_o)
    assert any(p.startswith("signed-zero") for p in out)
    # matching NaNs alone must not trip the signbit check
    nan_only = pd.DataFrame({"v": [1.0, float("nan")]})
    assert compare("nan", nan_only.copy(), nan_only.copy()) == []


def test_examples_run_clean(spark):
    """The examples/ scripts must stay runnable (they are the quickstart
    surface a migrating user hits first)."""
    import subprocess
    import sys

    for script in ("examples/quickstart_store.py",
                   "examples/curation_pipeline.py",
                   "examples/timeseries_analytics.py",
                   "examples/multimodal_pipeline.py",
                   "examples/crawl_politeness_pipeline.py",
                   "examples/product_analytics_pipeline.py",
                   "examples/forecasting_pipeline.py"):
        r = subprocess.run(
            [sys.executable, script],
            capture_output=True, text=True, timeout=600,
            cwd="/root/repo",
        )
        assert r.returncode == 0, f"{script} failed:\n{r.stderr[-2000:]}"


def test_rotation_order_prioritizes_unverified():
    """The self-rotating registry must put never-driver-checked queries
    first, then least-checked, then least-RECENTLY-checked, with
    registration order as the stable tiebreak — this is what guarantees
    every query accumulates a driver CORRECTNESS row across rounds."""
    import __spark_entry__ as e

    names = ["a", "b", "c", "d", "e"]
    history = {
        "a": [1, 2],      # checked twice
        "b": [2],         # once, recently
        "c": [1],         # once, long ago
        # d, e never checked
    }
    got = e._rotation_order(names, history)
    assert got == ["d", "e", "c", "b", "a"]
    # real invocation (file-backed history) keeps all names exactly once
    full = e._rotation_order(names)
    assert sorted(full) == sorted(names)


def test_rotation_treats_errored_rows_as_never_checked():
    """A driver CORRECTNESS row that ERRORED (traceback in ``err``) or
    hash-mismatched must NOT count as verification: _row_is_green
    rejects it, so _load_check_history skips it and the query sorts
    ahead of once-passed queries — exactly how q_range_join_events'
    stale r01 failure self-heals (VERDICT r4 ask #2)."""
    import __spark_entry__ as e

    green = {"rows_match": True, "schema_match": True, "hash_match": True,
             "spark_rows": 5, "oracle_rows": 5, "err": None}
    rows_only = {"rows_match": None, "schema_match": None,
                 "hash_match": None, "spark_rows": 5, "oracle_rows": None,
                 "err": "no_oracle"}
    errored = {"rows_match": None, "schema_match": None, "hash_match": None,
               "spark_rows": None, "oracle_rows": None,
               "err": "Traceback (most recent call last): ..."}
    mismatched = {"rows_match": True, "schema_match": True,
                  "hash_match": False, "spark_rows": 5, "oracle_rows": 5,
                  "err": None}
    assert e._row_is_green(green)
    assert e._row_is_green(rows_only)  # rows-only IS a by-design check
    assert not e._row_is_green(errored)
    assert not e._row_is_green(mismatched)
    assert not e._row_is_green(None)

    # an errored row must sort before once-passed queries
    names = ["passed_early", "errored_early", "never"]
    history = {"passed_early": [1], "errored_early": []}
    got = e._rotation_order(names, history)
    assert got.index("errored_early") < got.index("passed_early")
    assert got.index("never") < got.index("passed_early")

    # end-to-end: the mechanism worked — q_range_join_events (errored
    # r01) was resorted into the r05 driver window and now HAS a green
    # row, so the real file-backed history must count it as checked.
    checked = e._load_check_history(e._REPO)
    assert checked.get("q_range_join_events"), (
        "q_range_join_events should have a green driver row after r05"
    )


def test_rotation_check_type_change_resets_verification():
    """A ROWS→ORACLE retirement resets a query to never-verified: a
    historical rows-only green row (err == 'no_oracle') counts as
    verification ONLY while the query remains oracle-less. The moment
    the registry declares a DuckDB oracle for it, those rows stop
    counting, so the query sorts back into the next driver window and
    the new exact oracle actually gets driver-checked (VERDICT r8 ask
    #2: q_spend_deciles_sketch's r8 oracle was declared but never
    driver-verified because rotation still credited its r06 rows-only
    row)."""
    import __spark_entry__ as e

    rows_only = {"rows_match": None, "schema_match": None,
                 "hash_match": None, "spark_rows": 5, "oracle_rows": None,
                 "err": "no_oracle"}
    oracle_green = {"rows_match": True, "schema_match": True,
                    "hash_match": True, "spark_rows": 5, "oracle_rows": 5,
                    "err": None}
    # rows-only row: verification for an oracle-less query, NOT for an
    # oracle-bearing one
    assert e._row_is_green(rows_only, has_oracle=False)
    assert not e._row_is_green(rows_only, has_oracle=True)
    # an oracle-green row is strictly stronger — counts either way
    assert e._row_is_green(oracle_green, has_oracle=False)
    assert e._row_is_green(oracle_green, has_oracle=True)

    # end-to-end against a SYNTHETIC correctness directory (never live
    # repo artifacts — the driver mutates those every round): a query
    # whose only history is rows-only sorts back to never-verified the
    # moment the registry declares an oracle for it, landing before
    # every oracle-verified query and tied with truly-never-checked
    # ones.  Asserts the ordering PROPERTY, so future driver runs
    # cannot flip this test.
    import json
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        with open(f"{tmp}/CORRECTNESS_r01.json", "w") as f:
            json.dump({"retired": rows_only, "verified": oracle_green}, f)
        with open(f"{tmp}/CORRECTNESS_r02.json", "w") as f:
            json.dump({"verified": oracle_green}, f)
        # registry now declares an oracle for BOTH queries
        checked = e._load_check_history(tmp, {"retired", "verified"})
        assert "retired" not in checked  # rows-only credit revoked
        assert checked["verified"] == [1, 2]
        names = ["verified", "retired", "never"]
        order = e._rotation_order(names, checked)
        assert order.index("retired") < order.index("verified")
        assert order.index("never") < order.index("verified")
        # while oracle-less, the same rows-only row still counts
        checked_rows_only = e._load_check_history(tmp, {"verified"})
        assert checked_rows_only["retired"] == [1]


def test_expectations_validate_and_enforce(spark):
    """Contract validation: per-rule counts/rates/verdicts from one
    scan, deterministic smallest-id examples (bounded via the
    rank-limited window, not a violation-set collect), NULL predicate
    results count as violations, SQL-string rules accepted, and
    enforce_expectations raises naming the failing rules."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from oakstore_spark.operators.quality import (
        enforce_expectations,
        validate_expectations,
    )

    rows = [(i, float(i), "x" * (i % 4)) for i in range(100)]
    df = spark.createDataFrame(rows, "rid long, v double, s string")
    rules = {
        "v_nonneg": "v >= 0",                       # passes
        "v_small": F.col("v") < 90,                 # 10 violations
        "s_nonempty": F.length("s") > 0,            # 25 violations
        "nullish": F.when(F.col("v") < 50, True),   # 50 NULL -> bad
    }
    rep = {
        r["rule"]: r.asDict()
        for r in validate_expectations(df, rules, id_col="rid").collect()
    }
    assert rep["v_nonneg"]["passed"] and rep["v_nonneg"]["n_violations"] == 0
    assert rep["v_nonneg"]["example_ids"] == []
    assert rep["v_small"]["n_violations"] == 10
    assert rep["v_small"]["example_ids"] == ["90", "91", "92"]
    assert rep["s_nonempty"]["n_violations"] == 25
    assert rep["s_nonempty"]["example_ids"] == ["0", "4", "8"]
    assert rep["nullish"]["n_violations"] == 50  # NULL == violation
    assert all(r["n_rows"] == 100 for r in rep.values())
    assert rep["v_small"]["violation_rate"] == 10 / 100

    ok = enforce_expectations(df, {"v_nonneg": "v >= 0"}, id_col="rid")
    assert ok.count() == 100
    with _pytest.raises(ValueError, match="v_small"):
        enforce_expectations(df, rules, id_col="rid")


def test_k_anonymize_suppression(spark):
    """k_anonymize drops exactly the rows in undersized equivalence
    classes; the survivors' report attains k everywhere; l_distinct
    flags a disclosed (l=1) class even at high k."""
    from pyspark.sql import functions as F

    from oakstore_spark.operators.pii import (
        k_anonymity_report,
        k_anonymize,
    )

    rows = (
        [("us", "a", f"d{i}") for i in range(5)]       # k=5, l=5
        + [("us", "b", "same")] * 4                     # k=4, l=1
        + [("fr", "a", "x"), ("fr", "a", "y")]          # k=2
        + [("de", "z", "solo")]                         # k=1 -> dropped
    )
    df = spark.createDataFrame(rows, "country string, seg string, diag string")
    rep = {
        (r["country"], r["seg"]): (r["k_size"], r["l_distinct"])
        for r in k_anonymity_report(
            df, ["country", "seg"], sensitive_col="diag"
        ).collect()
    }
    assert rep[("us", "a")] == (5, 5)
    assert rep[("us", "b")] == (4, 1)  # disclosed despite k=4
    assert rep[("de", "z")] == (1, 1)

    kept = k_anonymize(df, ["country", "seg"], k=2)
    assert kept.count() == len(rows) - 1
    assert kept.where(F.col("country") == "de").count() == 0
    # idempotent at the same k
    assert k_anonymize(kept, ["country", "seg"], k=2).count() == kept.count()


def test_k_anonymize_generalization_hierarchies(spark):
    """Generalization releases STRICTLY more rows than suppression-only
    at the same k; the round-robin ladder stops at the FIRST vector
    within the suppression budget; the released relation attains k on
    the generalized key; the remainder is still suppressed."""
    from pyspark.sql import functions as F

    from oakstore_spark.operators.pii import (
        k_anonymity_report,
        k_anonymize,
        k_anonymize_generalized,
    )

    # 30 rows: zips share a prefix in two towns, ages cluster in bands
    rows = [
        (i, f"021{i % 7:02d}", 20 + (i * 7) % 40, f"d{i % 3}")
        for i in range(28)
    ] + [(28, "99901", 77, "dX"), (29, "99902", 78, "dY")]
    df = spark.createDataFrame(rows, "rid long, zip string, age long, dx string")
    hier = {
        "zip": [F.concat(F.substring("zip", 1, 3), F.lit("**")),
                F.lit("*")],
        "age": [(F.floor(F.col("age") / 10) * 10).cast("long"),
                F.lit(None).cast("long")],
    }

    sup_only = k_anonymize(df, ["zip", "age"], k=3)
    gen = k_anonymize_generalized(df, hier, k=3, max_suppression=0.1)
    assert gen.count() > sup_only.count()  # the point of the rung
    # released relation attains k on the generalized key
    rep = k_anonymity_report(gen, ["zip", "age"])
    assert rep.agg(F.min("k_size")).collect()[0][0] >= 3
    # (zip3**, decade) is enough for the 021xx town: zip reached level
    # 1, so the two 999xx outliers land in one (999**, 70) class of 2
    # and are SUPPRESSED, not released
    assert gen.where(F.col("rid") >= 28).count() == 0
    got_zips = {r[0] for r in gen.select("zip").distinct().collect()}
    assert got_zips == {"021**"}

    # zero budget + identity-hostile data walks to full generalization
    uniq = spark.createDataFrame(
        [(i, str(i), i) for i in range(6)], "rid long, zip string, age long"
    )
    allgen = k_anonymize_generalized(
        uniq, {"zip": [F.lit("*")], "age": [F.lit(None).cast("long")]}, k=3
    )
    assert allgen.count() == 6
    assert {r["zip"] for r in allgen.collect()} == {"*"}

    import pytest as _pytest

    with _pytest.raises(ValueError, match="k must"):
        k_anonymize_generalized(df, hier, k=0)
    with _pytest.raises(ValueError, match="non-empty"):
        k_anonymize_generalized(df, {}, k=2)
