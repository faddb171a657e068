"""Deduplication operators for LLM training-data pipelines.

Exact, near-exact (normalized), MinHash+LSH, SimHash and exact n-gram
Jaccard — all designed for the 100 TB regime:

- exact/normalized dedup: one hash-shuffle on the content digest; the
  digest (md5) is computed map-side so the shuffle carries 32 bytes, not
  documents;
- MinHash+LSH: the standard shingle -> minhash signature -> banded
  bucket -> candidate-join -> exact-verify pipeline. Each shingle string
  is hashed to a 64-bit value ONCE (JVM `xxhash64`); the n_hashes minhash
  components are then derived from those longs with a vectorized
  Kirsch-Mitzenmacher multiply-add in a pandas UDF (uint64 wraparound —
  numpy, not per-row Python). The only shuffles are the band-bucket join
  (keys are 8-byte hashes) and the verify join. Cost is O(n * bands)
  candidate rows, never O(n^2) — the brute-force pair join the oracle
  uses is exactly what this avoids;
- SimHash: 64-bit signature via bit-vote over token hashes (tokens
  hashed once JVM-side, bit-vote vectorized in numpy), candidate pairs
  via the pigeonhole band trick (hamming distance <= k pairs must agree
  on one of k+1 bit-chunks), verified with exact popcount;
- n-gram Jaccard: EXACT near-dup pairs via an inverted-index join on
  shingles (explode distinct shingles, equi-join, count common, jaccard
  = common / (|a| + |b| - common)). Linear in pairs-sharing-a-gram, not
  O(n^2); ``max_df`` optionally drops ultra-common grams (hot keys) at a
  documented cost to exactness.

Signature DataFrames feeding multiple joins are persisted — otherwise
Spark re-derives the whole signature subtree once per join branch.

Skew note: a degenerate band key (e.g. many near-empty docs) creates a
hot bucket; ``max_bucket_size`` drops pathological buckets explicitly —
at scale you would also rely on AQE skew-join splitting.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf
from pyspark.storagelevel import StorageLevel

from oakstore_spark.functions.text import char_ngram_codes, normalize_text, tokens


def exact_dedup(
    df: DataFrame, id_col: str, text_col: str, normalized: bool = False
) -> DataFrame:
    """Representative row per distinct content: (digest, keep_id = min id,
    n_dupes). ``normalized=True`` dedups on the canonical text form."""
    content = normalize_text(text_col) if normalized else F.col(text_col)
    return (
        df.select(F.md5(content).alias("digest"), F.col(id_col))
        .groupBy("digest")
        .agg(
            F.min(id_col).alias("keep_id"),
            (F.count(F.lit(1)) - 1).alias("n_dupes"),
        )
    )


def _km_constants(n_hashes: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """Odd multipliers + offsets for h_i = a_i * h + b_i (mod 2^64)."""
    rng = np.random.RandomState(seed)

    def u64(n: int) -> np.ndarray:
        hi = rng.randint(0, 1 << 32, size=n).astype(np.uint64)
        lo = rng.randint(0, 1 << 32, size=n).astype(np.uint64)
        return (hi << np.uint64(32)) | lo

    return u64(n_hashes) | np.uint64(1), u64(n_hashes)


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int = 96,
    shingle_n: int = 3,
    seed: int = 7,
    unicode_mode: bool = False,
) -> DataFrame:
    """(id, shingles, sig): char-shingle the normalized text and minhash
    it under ``n_hashes`` hash functions.

    Shingles are injective integer gram codes (see
    :func:`~oakstore_spark.functions.text.char_ngram_codes` — one
    vectorized Arrow kernel, no per-shingle string allocation); the
    signature UDF computes min_i(a_i * code + b_i mod 2^64) for all i in
    one numpy broadcast per row (~shingles x n_hashes uint64 ops). The
    random odd 64-bit multipliers spread the narrow code range over the
    full hash space, so minima stay uniform.

    ``unicode_mode=True`` is the multilingual rung: NFKC + script-aware
    normalization (any script's letters/digits survive) and 21-bit
    CODEPOINT packing into int64 shingles (shingle_n <= 3) — without
    it, a CJK/Cyrillic corpus normalizes toward empty text and every
    doc becomes every other doc's duplicate."""
    from oakstore_spark.operators.scaling import widen_partitions

    df = widen_partitions(df)
    a_const, b_const = _km_constants(n_hashes, seed)
    n = shingle_n
    if unicode_mode and not 1 <= n <= 3:
        raise ValueError("shingle_n must be in [1, 3] in unicode_mode")
    short_base = 1 << (7 * n)
    sh_type = "array<long>" if unicode_mode else "array<int>"

    # ONE fused Arrow pass: shingle codes + signature from the same numpy
    # buffers (two chained pandas UDFs would ship the shingle arrays
    # JVM->Python->JVM->Python; fusing halves the Arrow traffic and the
    # Python invocations)
    @pandas_udf(f"struct<shingles: {sh_type}, sig: array<long>>")
    def shingle_and_sign(texts):
        sh_out, sig_out = [], []
        for t in texts:
            if unicode_mode:
                cp = np.frombuffer(
                    (t or "").encode("utf-32-le"), dtype=np.uint32
                ).astype(np.uint64)
                length = cp.size
                if length >= n:
                    h = np.zeros(length - n + 1, dtype=np.uint64)
                    for k in range(n):
                        h = (h << np.uint64(21)) | cp[k : length - n + 1 + k]
                    codes = np.unique(h).view(np.int64)
                else:
                    acc = np.uint64(0)
                    for k in range(length):
                        acc = (acc << np.uint64(21)) | cp[k]
                    code = (np.uint64(1) << np.uint64(63)) \
                        | (np.uint64(length) << np.uint64(21 * (n - 1))) \
                        | acc
                    codes = np.asarray([code], dtype=np.uint64).view(np.int64)
                sh = codes
            else:
                b = np.frombuffer(
                    (t or "").encode("ascii", "replace"), dtype=np.uint8
                ).astype(np.int64)
                length = b.size
                if length >= n:
                    h = np.zeros(length - n + 1, dtype=np.int64)
                    for k in range(n):
                        h = (h << 7) | b[k : length - n + 1 + k]
                    codes = np.unique(h)
                else:
                    packed = 0
                    for k in range(length):
                        packed = (packed << 7) | int(b[k])
                    codes = np.asarray(
                        [short_base + (length << (7 * (n - 1))) + packed],
                        dtype=np.int64,
                    )
                sh = codes.astype(np.int32)
            hv = codes.view(np.uint64)
            # (shingles x n_hashes) wraparound multiply-add, min-reduce
            sig = (hv[:, None] * a_const[None, :] + b_const[None, :]).min(axis=0)
            sh_out.append(sh)
            sig_out.append(np.ascontiguousarray(sig).view(np.int64))
        return pd.DataFrame({"shingles": sh_out, "sig": sig_out})

    return df.select(
        F.col(id_col).alias("id"),
        shingle_and_sign(
            normalize_text(text_col, unicode_mode=unicode_mode)
        ).alias("ss"),
    ).select("id", "ss.shingles", "ss.sig")


def _collect_sig_rows(sig_df: DataFrame) -> list[dict]:
    """Arrow-batched driver transfer of (id, shingles, sig) rows — the
    pickled-Row ``collect()`` path measured ~2.5x slower at 4k docs x
    ~2k shingles (0.64 s vs 0.26 s at sf0.1)."""
    return sig_df.toPandas().to_dict("records")


def _minhash_pairs_driver(
    spark,
    sig_rows,
    out_schema,
    threshold: float,
    n_hashes: int,
    bands: int,
    rows_per_band: int,
    estimate_margin: float,
    max_bucket_size: int | None,
) -> DataFrame:
    """Spark-facing wrapper of :func:`_minhash_pairs_driver_pdf`."""
    pdf = _minhash_pairs_driver_pdf(
        sig_rows, threshold, n_hashes, bands, rows_per_band,
        estimate_margin, max_bucket_size,
    )
    if pdf.empty:
        return spark.createDataFrame([], out_schema)
    return spark.createDataFrame(pdf, out_schema)


_EMPTY_PAIRS_PDF_COLS = ["id_a", "id_b", "jaccard"]


def _minhash_pairs_driver_pdf(
    sig_rows,
    threshold: float,
    n_hashes: int,
    bands: int,
    rows_per_band: int,
    estimate_margin: float,
    max_bucket_size: int | None,
) -> pd.DataFrame:
    """Small-corpus fast path: banding, candidate generation, prefilter
    and exact verify all happen driver-side in numpy on the collected
    signature rows (which the distributed path collects anyway for its
    broadcast verify map). Banding groups on the EXACT r-tuple of
    signature values — equivalent-or-stricter than the distributed
    path's xxhash64(r-tuple) bucket key (hash collisions only ever ADD
    candidates), and the exact-jaccard verify makes the final output
    identical either way. Returns a pandas frame (id_a, id_b, jaccard)
    so pure-driver callers skip the Spark round trip."""
    if not sig_rows:
        return pd.DataFrame(columns=_EMPTY_PAIRS_PDF_COLS)
    # sort by real id so positional order == id order (makes id_a < id_b
    # fall out of positional triu pairs)
    sig_rows = sorted(sig_rows, key=lambda row: row["id"])
    ids = np.asarray([row["id"] for row in sig_rows])
    S = np.stack([np.asarray(row["sig"], np.int64) for row in sig_rows])
    shingles = [np.asarray(row["shingles"], np.int64) for row in sig_rows]
    n = len(sig_rows)
    pair_keys = []
    for b in range(bands):
        block = np.ascontiguousarray(
            S[:, b * rows_per_band : (b + 1) * rows_per_band]
        )
        _, inv, counts = np.unique(
            block, axis=0, return_inverse=True, return_counts=True
        )
        order = np.argsort(inv, kind="stable")
        start = 0
        for c in counts:
            if c > 1 and (max_bucket_size is None or c <= max_bucket_size):
                members = order[start : start + c]  # ascending positions
                ii, jj = np.triu_indices(c, k=1)
                pair_keys.append(members[ii].astype(np.int64) * n + members[jj])
            start += c
    if not pair_keys:
        return pd.DataFrame(columns=_EMPTY_PAIRS_PDF_COLS)
    pk = np.unique(np.concatenate(pair_keys))
    ai, bi = pk // n, pk % n
    # column-wise match count: ~pk.size-sized temporaries per hash
    # instead of two (pairs x n_hashes) gathers — the giant gathers hit
    # fresh-mmap page faults on every call (~5 s at 500k candidates;
    # this form is ~0.3 s for identical arithmetic)
    hits = np.zeros(pk.size, dtype=np.int32)
    for k in range(n_hashes):
        col = S[:, k]
        hits += col[ai] == col[bi]
    cut = hits / n_hashes >= threshold - estimate_margin
    ai, bi = ai[cut], bi[cut]
    keep_a, keep_b, keep_j = [], [], []
    for x, y in zip(ai, bi):
        sa, sb = shingles[x], shingles[y]
        inter = np.intersect1d(sa, sb, assume_unique=True).size
        jac = inter / (sa.size + sb.size - inter)
        if jac >= threshold:
            keep_a.append(x)
            keep_b.append(y)
            keep_j.append(jac)
    if not keep_a:
        return pd.DataFrame(columns=_EMPTY_PAIRS_PDF_COLS)
    return pd.DataFrame(
        {
            "id_a": ids[keep_a],
            "id_b": ids[keep_b],
            "jaccard": np.asarray(keep_j, dtype=np.float64),
        }
    )


def _band_explode(sigs: DataFrame, bands: int, r: int) -> DataFrame:
    """(id, band, bkey): one row per LSH band, bkey = xxhash64 of the
    band's signature slice. Shared by the full-corpus and the
    incremental (index-join) paths so both bucket identically."""
    return sigs.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            F.concat_ws("|", *[F.col("sig")[b * r + j] for j in range(r)])
                        ).alias("bkey"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "bb.band", "bb.bkey")


def _verify_candidates(
    cand: DataFrame,
    sigs_a: DataFrame,
    sigs_b: DataFrame,
    out_schema,
    threshold: float,
    lo_cut: float,
    n_hashes: int,
) -> DataFrame:
    """Signature prefilter + exact shingle verify without materializing
    any corpus: the (id, sig, shingles) relations hash-join onto the
    candidate pairs (two shuffles keyed by doc id), then one Arrow pass
    runs the estimated-jaccard 2-D equality prefilter and only
    survivors pay the exact intersection."""
    sa = sigs_a.select(
        F.col("id").alias("id_a"),
        F.col("sig").alias("sig_a"),
        F.col("shingles").alias("sh_a"),
    )
    sb = sigs_b.select(
        F.col("id").alias("id_b"),
        F.col("sig").alias("sig_b"),
        F.col("shingles").alias("sh_b"),
    )
    joined = cand.join(sa, "id_a").join(sb, "id_b")

    def verify(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            sig_a = np.stack([np.asarray(s, dtype=np.int64) for s in pdf["sig_a"]])
            sig_b = np.stack([np.asarray(s, dtype=np.int64) for s in pdf["sig_b"]])
            est = (sig_a == sig_b).sum(axis=1) / n_hashes
            idx = np.nonzero(est >= lo_cut)[0]
            if idx.size == 0:
                continue
            keep_a, keep_b, keep_j = [], [], []
            sh_a_col, sh_b_col = pdf["sh_a"], pdf["sh_b"]
            for i in idx:
                a = np.asarray(sh_a_col.iat[i], dtype=np.int64)
                b = np.asarray(sh_b_col.iat[i], dtype=np.int64)
                inter = int(np.isin(b, a, assume_unique=True).sum())
                jac = inter / (a.size + b.size - inter)
                if jac >= threshold:
                    keep_a.append(pdf["id_a"].iat[i])
                    keep_b.append(pdf["id_b"].iat[i])
                    keep_j.append(jac)
            if keep_a:
                yield pd.DataFrame(
                    {
                        "id_a": keep_a,
                        "id_b": keep_b,
                        "jaccard": np.asarray(keep_j, dtype=np.float64),
                    }
                )

    return joined.mapInPandas(verify, out_schema)


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.85,
    n_hashes: int = 96,
    bands: int = 12,
    shingle_n: int = 3,
    max_bucket_size: int | None = None,
    estimate_margin: float = 0.1,
    driver_pairs_max_docs: int = 200_000,
    unicode_mode: bool = False,
) -> DataFrame:
    """Near-duplicate pairs (id_a < id_b, jaccard >= threshold).
    ``unicode_mode=True`` switches signing to the multilingual
    NFKC/codepoint rung (see :func:`minhash_signatures`) — required
    for non-Latin corpora, where the ASCII rung collapses every doc
    to empty text and emits the whole corpus as one duplicate class.

    Banding: bands * rows_per_band = n_hashes; a pair lands in the same
    bucket of some band with prob 1-(1-s^r)^b (s = true jaccard). With
    96/12/8 the miss probability at s=0.92 is ~6e-5 while background
    pairs at s~0.55 collide only ~10% of the time — the knob that keeps
    candidate volume sub-quadratic on corpora with high baseline
    similarity. Candidates are prefiltered by the signature-estimated
    jaccard (matches/n_hashes >= threshold - estimate_margin; the
    estimate's sd is ~0.03 at 96 hashes so the margin is ~3 sigma), then
    verified with EXACT jaccard on the shingle sets: false positives are
    zero, false negatives are the only (negligible) error.
    """
    if n_hashes % bands:
        raise ValueError("bands must divide n_hashes")
    r = n_hashes // bands

    pair_schema = T.StructType(
        [
            T.StructField("id_a", df.schema[id_col].dataType),
            T.StructField("id_b", df.schema[id_col].dataType),
            T.StructField("jaccard", T.DoubleType()),
        ]
    )
    # two-tier strategy: below the threshold the whole pipeline after
    # signing runs driver-side in numpy (band explode + candidate
    # self-join + shuffle round-trips cost more than the arithmetic at
    # this size); above it, the banding/join/verify path below scales
    # out with NO driver materialization. The routing count is bounded:
    # limit(max+1) stops the scan as soon as the corpus is provably big
    # instead of counting all of it.
    if df.limit(driver_pairs_max_docs + 1).count() <= driver_pairs_max_docs:
        sig_rows = _collect_sig_rows(
            minhash_signatures(
                df, id_col, text_col, n_hashes, shingle_n,
                unicode_mode=unicode_mode,
            )
        )
        return _minhash_pairs_driver(
            df.sparkSession,
            sig_rows,
            pair_schema,
            threshold,
            n_hashes,
            bands,
            r,
            estimate_margin,
            max_bucket_size,
        )

    # persisted: feeds the band explode, both sides of the candidate
    # join, the signature prefilter and the shingle verify
    sigs = minhash_signatures(
        df, id_col, text_col, n_hashes, shingle_n, unicode_mode=unicode_mode
    ).persist(StorageLevel.MEMORY_AND_DISK)

    banded = _band_explode(sigs, bands, r)

    if max_bucket_size is not None:
        counts = banded.groupBy("band", "bkey").agg(F.count(F.lit(1)).alias("_n"))
        banded = (
            banded.join(counts, ["band", "bkey"])
            .filter(F.col("_n") <= max_bucket_size)
            .drop("_n")
        )

    left = banded.alias("l")
    right = banded.alias("r")
    cand = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bkey") == F.col("r.bkey"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .distinct()
    )

    # prefilter + exact verify WITHOUT materializing the corpus anywhere:
    # the persisted (id, sig, shingles) relation is hash-joined onto the
    # candidate pairs twice (on id_a, then id_b) — two shuffles keyed by
    # doc id, each side bounded per-partition, so this survives a corpus
    # no driver could hold. The joined rows then verify in one Arrow
    # pass: the signature prefilter (estimated jaccard >= threshold -
    # margin, sd ~0.03 at 96 hashes) is a single 2-D equality over the
    # stacked signature matrices; only survivors pay the exact shingle
    # intersection.
    lo_cut = threshold - estimate_margin

    out_schema = T.StructType(
        [
            T.StructField("id_a", df.schema[id_col].dataType),
            T.StructField("id_b", df.schema[id_col].dataType),
            T.StructField("jaccard", T.DoubleType()),
        ]
    )

    return _verify_candidates(cand, sigs, sigs, out_schema, threshold, lo_cut, n_hashes)


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float,
    shingle_n: int = 3,
    broadcast_verify_max_docs: int = 100_000,
) -> DataFrame:
    """EXACT n-gram Jaccard near-dup pairs (id_a < id_b, jaccard >=
    threshold) via PREFIX-FILTERED set-similarity join (PPJoin-style) —
    no O(n^2) cross join, no hot-gram blowup.

    A naive inverted-index join on all grams is quadratic in document
    frequency: ubiquitous grams ("th ", "he ") appear in ~every doc, so
    one hot gram alone contributes |corpus|^2 join rows (observed: >9min
    at 5k docs vs <10s with the prefix filter). Instead:

    1. distinct char n-grams of the normalized text per doc;
    2. global document frequency per gram; each doc's grams ordered
       rarest-first (df asc, gram asc — any consistent total order);
    3. index only each doc's PREFIX: first |x| - ceil(t*|x|) + 1 grams.
       Lossless: J(x,y) >= t implies overlap >= ceil(t*max(|x|,|y|)),
       and two sets with overlap >= a must share a gram inside both
       (len - a + 1)-prefixes under a common total order;
    4. candidate pairs = equi-join of prefix postings on gram, with the
       length-ratio filter |shorter| >= t * |longer| (required since
       overlap <= |shorter| and overlap >= t * |longer|);
    5. exact verify on the full gram sets.

    Hot keys are structurally avoided (prefixes hold the RAREST grams).
    At 100 TB you would additionally bucket by n_grams range to bound
    the candidate join's skew.

    Representation: grams are INJECTIVE int32 codes (7 bits/char over
    the normalized [a-z0-9 ] alphabet — see
    :func:`oakstore_spark.functions.text.char_ngram_codes`), so "exact"
    here means exact, and every join/shuffle key is 4 bytes. The
    normalized 3-gram key space is tiny (<= 37^3 ~ 51k codes), so the
    document-frequency table is collected and BROADCAST as a numpy
    lookup array and the rarity-sorted gram list + prefix are computed
    MAP-SIDE (one pandas UDF + a ``slice``) — no window sort, no
    explode-join-regroup shuffle of the full posting list. The only
    shuffles left are the tiny dfreq aggregation (map-side partial agg
    compresses each partition to <= |code space| rows) and the
    prefix-posting self-join.
    """
    from oakstore_spark.operators.scaling import widen_partitions

    df = widen_partitions(df)
    codes_udf = char_ngram_codes(shingle_n)
    grams = (
        df.select(
            F.col(id_col).alias("id"),
            codes_udf(normalize_text(text_col)).alias("codes"),
        )
        .withColumn("n_grams", F.size("codes"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    dfreq = grams.select(F.explode("codes").alias("code")).groupBy("code").agg(
        F.count(F.lit(1)).alias("_df")
    )
    freq_rows = dfreq.collect()  # <= ~51k rows at shingle_n=3
    n_docs = grams.count()
    universe = len(freq_rows)

    out_schema = T.StructType(
        [
            T.StructField("id_a", df.schema[id_col].dataType),
            T.StructField("id_b", df.schema[id_col].dataType),
            T.StructField("jaccard", T.DoubleType()),
        ]
    )

    # DENSE-UNIVERSE path: when the distinct-gram space is tiny (synthetic
    # / template corpora; here <= 37^shingle_n but often just a few
    # hundred codes), every doc shares most grams with every other doc and
    # prefix filtering cannot prune — the inverted-index join explodes
    # into millions of candidates that each need a verify. The right
    # algorithm is then a BLOCKED BITMAP BRUTE FORCE: docs become 0/1
    # rows of an (n_docs x universe) matrix; intersections for a row
    # block against everything are ONE sgemm (exact: counts < 2^24 in
    # float32). The full matrix is broadcast (n*U*4 bytes, capped below)
    # and each partition gemms only its own block — O(N^2/P) work, fully
    # vectorized, no shuffle at all. Sparse universes (real text) take
    # the prefix-filter path below instead.
    if n_docs == 0:
        return df.sparkSession.createDataFrame([], out_schema)

    if (
        universe <= 4096
        and n_docs <= broadcast_verify_max_docs
        and n_docs * universe * 4 <= 500_000_000
    ):
        code_space = np.sort(np.asarray([int(r["code"]) for r in freq_rows]))

        def to_matrix(code_arrays: list) -> np.ndarray:
            lens = np.fromiter((len(c) for c in code_arrays), np.int64, len(code_arrays))
            cat = np.concatenate(code_arrays) if len(code_arrays) else np.empty(0, np.int64)
            m = np.zeros((len(code_arrays), code_space.size), dtype=np.float32)
            m[np.repeat(np.arange(len(code_arrays)), lens),
              np.searchsorted(code_space, np.asarray(cat, dtype=np.int64))] = 1.0
            return m

        doc_rows = grams.select("id", "codes").collect()
        ids_all = np.asarray([r["id"] for r in doc_rows])
        mat = to_matrix([np.asarray(r["codes"], dtype=np.int64) for r in doc_rows])
        sizes_all = mat.sum(axis=1).astype(np.int64)
        bc_mat = df.sparkSession.sparkContext.broadcast(
            (ids_all, mat, sizes_all, code_space)
        )

        def dense_pairs(batches):
            ids_full, a_full, sz_full, space = bc_mat.value

            def blockify(arrays):
                lens = np.fromiter((len(c) for c in arrays), np.int64, len(arrays))
                cat = np.concatenate(arrays)
                m = np.zeros((len(arrays), space.size), dtype=np.float32)
                m[np.repeat(np.arange(len(arrays)), lens),
                  np.searchsorted(space, np.asarray(cat, dtype=np.int64))] = 1.0
                return m

            for pdf in batches:
                if len(pdf) == 0:
                    continue
                for lo in range(0, len(pdf), 1024):
                    chunk = pdf.iloc[lo : lo + 1024]
                    blk = blockify([np.asarray(c, dtype=np.int64) for c in chunk["codes"]])
                    ids_blk = chunk["id"].to_numpy()
                    inter = (blk @ a_full.T).astype(np.int64)
                    sz_blk = blk.sum(axis=1).astype(np.int64)
                    jac = inter / (sz_blk[:, None] + sz_full[None, :] - inter)
                    hit = (jac >= threshold) & (ids_blk[:, None] < ids_full[None, :])
                    bi, aj = np.nonzero(hit)
                    yield pd.DataFrame(
                        {
                            "id_a": ids_blk[bi],
                            "id_b": ids_full[aj],
                            "jaccard": jac[bi, aj],
                        }
                    )

        # spread row blocks across the cluster: the persisted grams frame
        # inherits the (few) input-scan partitions, which would serialize
        # the gemm onto one or two tasks
        nparts = max(df.sparkSession.sparkContext.defaultParallelism, 4)
        return (
            grams.select("id", "codes")
            .repartition(nparts)
            .mapInPandas(dense_pairs, out_schema)
        )

    max_code = (1 << (7 * shingle_n)) + (shingle_n << (7 * (shingle_n - 1))) + 1
    ftab = np.zeros(max_code + 1, dtype=np.int64)
    for row in freq_rows:
        ftab[row["code"]] = row["_df"]
    bc_freq = df.sparkSession.sparkContext.broadcast(ftab)

    @pandas_udf("array<int>")
    def rarity_sort(codes_s: pd.Series) -> pd.Series:
        tab = bc_freq.value
        out = []
        for c in codes_s:
            cv = np.asarray(c, dtype=np.int64)
            order = np.lexsort((cv, tab[cv]))  # (_df asc, code asc)
            out.append(cv[order].astype(np.int32))
        return pd.Series(out)

    prefix_len = (
        F.col("n_grams") - F.ceil(F.lit(threshold) * F.col("n_grams")) + 1
    ).cast("int")
    # persisted: both sides of the candidate self-join AND the verify map
    sorted_grams = grams.select(
        "id", "n_grams", rarity_sort("codes").alias("codes_r")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    prefix = sorted_grams.select(
        "id",
        "n_grams",
        F.posexplode(F.slice("codes_r", 1, prefix_len)).alias("pos", "code"),
    )

    a, b = prefix.alias("a"), prefix.alias("b")
    # overlap threshold alpha: J >= t  <=>  |x & y| >= t/(1+t) * (|x|+|y|)
    alpha = F.ceil(
        F.lit(threshold)
        * (F.col("a.n_grams") + F.col("b.n_grams"))
        / F.lit(1.0 + threshold)
    )
    cand = (
        a.join(
            b,
            (F.col("a.code") == F.col("b.code"))
            & (F.col("a.id") < F.col("b.id"))
            # length-ratio pruning: J >= t forces t*|longer| <= |shorter|
            & (F.least("a.n_grams", "b.n_grams")
               >= threshold * F.greatest("a.n_grams", "b.n_grams"))
            # PPJoin position filter: grams at/after position pos (0-based
            # in the rarity order) bound the remaining possible overlap
            & (
                F.least(
                    F.col("a.n_grams") - F.col("a.pos"),
                    F.col("b.n_grams") - F.col("b.pos"),
                )
                >= alpha
            ),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )

    # Exact verify. On template-heavy corpora the prefix filter still
    # passes millions of candidates; both interpreted array_intersect
    # AND shipping each doc's gram array once per pair (candidates x
    # ~1KB through the shuffle + Arrow) dominated the query. When the
    # corpus is small enough, broadcast one (id -> gram-code array) map
    # instead and verify candidate batches of BARE ID PAIRS (16
    # bytes/row): group by id_a, concatenate the partners' code arrays,
    # one vectorized isin + segmented reduceat per group — O(total
    # partner grams) numpy work instead of a Python iteration per pair.
    if n_docs <= broadcast_verify_max_docs:
        rows = sorted_grams.select("id", "codes_r").collect()
        gram_map = {r["id"]: np.asarray(r["codes_r"], dtype=np.int32) for r in rows}
        bc = df.sparkSession.sparkContext.broadcast(gram_map)

        def verify_bc(batches):
            gm = bc.value
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                keep_a, keep_b, keep_j = [], [], []
                for aid, grp in pdf.groupby("id_a", sort=False):
                    ha = gm[aid]
                    ids_b = grp["id_b"].to_numpy()
                    partners = [gm[i] for i in ids_b]
                    lens = np.fromiter(
                        (p.size for p in partners), np.int64, len(partners)
                    )
                    cat = np.concatenate(partners)
                    hits = np.isin(cat, ha)
                    starts = np.zeros(len(partners), dtype=np.int64)
                    np.cumsum(lens[:-1], out=starts[1:])
                    inter = np.add.reduceat(hits, starts)
                    jac = inter / (ha.size + lens - inter)
                    sel = jac >= threshold
                    keep_a.append(np.full(int(sel.sum()), aid))
                    keep_b.append(ids_b[sel])
                    keep_j.append(jac[sel])
                yield pd.DataFrame(
                    {
                        "id_a": np.concatenate(keep_a),
                        "id_b": np.concatenate(keep_b),
                        "jaccard": np.concatenate(keep_j),
                    }
                )

        return cand.repartition("id_a").mapInPandas(verify_bc, out_schema)

    # large-corpus fallback: join the gram-code arrays to each pair
    ga = sorted_grams.select(F.col("id").alias("id_a"), F.col("codes_r").alias("g_a"))
    gb = sorted_grams.select(F.col("id").alias("id_b"), F.col("codes_r").alias("g_b"))
    joined = cand.join(ga, "id_a").join(gb, "id_b")

    def verify(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            jac = np.empty(len(pdf))
            for i, (a_g, b_g) in enumerate(zip(pdf["g_a"], pdf["g_b"])):
                inter = np.isin(np.asarray(b_g), np.asarray(a_g)).sum()
                jac[i] = inter / (len(a_g) + len(b_g) - inter)
            keep = jac >= threshold
            out = pdf.loc[keep, ["id_a", "id_b"]].copy()
            out["jaccard"] = jac[keep]
            yield out

    return joined.mapInPandas(verify, out_schema)


def simhash_signatures(
    df: DataFrame, id_col: str, text_col: str, bits: int = 64
) -> DataFrame:
    """(id, simhash): SimHash of the whitespace tokens over a 60-bit
    engine-portable token hash.

    Tokens are hashed once JVM-side as the repo-standard md5 prefix
    (``conv(substr(md5(w),1,15),16,10)`` — 60 bits, bit-identical in
    DuckDB via ``CAST('0x'||substr(md5(w),1,15) AS BIGINT)``, which is
    what lets a SQL oracle rebuild the signatures and hamming pairs
    EXACTLY; xxhash64 would be marginally cheaper but has no portable
    replay). Bits 60-63 of the signature are therefore structurally 0
    — the pigeonhole banding below still splits 64 bits into k chunks,
    the top chunk just carries 4 fewer informative bits. The bit-vote
    (for each bit position, sum +-1 votes across tokens; bit is 1 if
    positive) runs as a vectorized numpy kernel in a pandas UDF — not
    64 interpreted expression passes, not per-row Python.
    """
    if bits != 64:
        raise ValueError("simhash_signatures supports bits=64 only")
    from oakstore_spark.operators.scaling import widen_partitions

    df = widen_partitions(df)
    toks = F.array_distinct(tokens(normalize_text(text_col)))
    hashed = df.select(F.col(id_col).alias("id"), toks.alias("_t")).withColumn(
        "_h",
        F.transform(
            F.col("_t"),
            lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast(
                "bigint"
            ),
        ),
    )
    shifts = np.arange(64, dtype=np.uint64)

    @pandas_udf("long")
    def vote(hs: pd.Series) -> pd.Series:
        out = np.empty(len(hs), dtype=np.int64)
        for i, h in enumerate(hs):
            hv = np.asarray(h, dtype=np.int64).view(np.uint64)
            if hv.size == 0:
                out[i] = 0
                continue
            ones = ((hv[:, None] >> shifts[None, :]) & np.uint64(1)).sum(axis=0)
            sig_bits = (2 * ones > hv.size).astype(np.uint64)
            v = int((sig_bits << shifts).sum())  # exact: disjoint bits
            out[i] = v - (1 << 64) if v >= (1 << 63) else v
        return pd.Series(out)

    return hashed.select("id", vote("_h").alias("simhash"))


def simhash_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    bits: int = 64,
) -> DataFrame:
    """Pairs with simhash hamming distance <= max_hamming.

    Pigeonhole banding: split the 64-bit signature into (max_hamming+1)
    chunks — any pair within distance k must match exactly on >= 1 chunk.
    Join per chunk (equi-join on 16-bit key), verify with popcount.
    """
    k = max_hamming + 1
    chunk = bits // k
    # persisted: both sides of the chunk self-join re-derive it otherwise
    sigs = simhash_signatures(df, id_col, text_col, bits).persist(
        StorageLevel.MEMORY_AND_DISK
    )

    mask = (1 << chunk) - 1
    banded = sigs.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("chunk_id"),
                        F.shiftrightunsigned(F.col("simhash"), i * chunk)
                        .bitwiseAND(F.lit(mask))
                        .alias("ckey"),
                    )
                    for i in range(k)
                ]
            )
        ).alias("cc"),
    ).select("id", "simhash", "cc.chunk_id", "cc.ckey")

    l, r = banded.alias("l"), banded.alias("r")
    cand = (
        l.join(
            r,
            (F.col("l.chunk_id") == F.col("r.chunk_id"))
            & (F.col("l.ckey") == F.col("r.ckey"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            F.col("l.simhash").alias("sh_a"),
            F.col("r.simhash").alias("sh_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        cand.withColumn("hamming", hamming.cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def dedup_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iterations: int = 50,
    driver_cc_max_edges: int = 10_000_000,
) -> DataFrame:
    """Connected components over near-dup pairs -> (id, cluster_id) with
    cluster_id = min id in the component. This is the step that turns
    pairwise near-dup output into keep/drop decisions (keep the cluster
    representative, drop the rest).

    Size-adaptive, like the verify step of :func:`ngram_jaccard_pairs`:
    the pair list of a near-dup pipeline is orders of magnitude smaller
    than the corpus (it holds only documents that HAVE a near-duplicate),
    so up to ``driver_cc_max_edges`` the bare (src, dst) edge list — 16
    bytes/edge, ~160 MB at the 10M default — is collected and solved
    with vectorized min-label + pointer-jumping in numpy (O(E) per
    round, rounds ~ log diameter; milliseconds at millions of edges).
    Beyond the threshold, a distributed hash-to-min loop: every node
    starts labeled with its own id; each round, nodes send their label
    to every neighbor and each node keeps the min of its own label and
    the incoming ones. Converges in O(component diameter) rounds;
    near-dup components are tiny (dup clusters, not social graphs), so
    rounds ~ 2-4.

    Per-round plan cost of the distributed path is kept minimal:
    - edges are persisted pre-hash-partitioned on ``src`` and labels come
      out of a ``groupBy(id)`` with the same hash partitioning, so the
      per-round join reuses both partitionings (no edge reshuffle);
    - the round is ONE new shuffle (messages into the groupBy-min) and
      ONE action;
    - convergence is read off the same action via a monotone invariant:
      min-updates can only lower labels, so ``sum(label)`` strictly
      decreases until the fixpoint — equal sum == converged. No second
      "count changed" job, no old-vs-new join.
    """
    id_type = pairs.schema[id_a].dataType
    raw = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst")).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    n_edges = raw.count()

    if n_edges <= driver_cc_max_edges:
        spark = pairs.sparkSession
        schema = T.StructType(
            [T.StructField("id", id_type), T.StructField("cluster_id", id_type)]
        )
        if n_edges == 0:
            raw.unpersist()
            return spark.createDataFrame([], schema)
        epdf = raw.toPandas()
        raw.unpersist()
        src = epdf["src"].to_numpy()
        dst = epdf["dst"].to_numpy()
        # factorize: np.unique sorts ascending, so index order == id order
        # and min-index labels map back to min-id cluster representatives
        ids, idx = np.unique(np.concatenate([src, dst]), return_inverse=True)
        s_idx, d_idx = idx[: len(src)], idx[len(src):]
        labels = np.arange(len(ids))
        for _ in range(max_iterations):
            new = labels.copy()
            np.minimum.at(new, s_idx, labels[d_idx])
            np.minimum.at(new, d_idx, labels[s_idx])
            new = np.minimum(new, new[new])  # pointer jump: label(label(v))
            if np.array_equal(new, labels):
                break
            labels = new
        out = pd.DataFrame({"id": ids, "cluster_id": ids[labels]})
        return spark.createDataFrame(out, schema)

    # undirected edge list, both directions
    edges = (
        raw.unionByName(raw.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .repartition("src")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    labels = (
        edges.select(F.col("src").alias("id")).distinct()
        .withColumn("cluster_id", F.col("id"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # sum over a distributed monotone quantity; decimal avoids bigint
    # overflow for large id domains
    chk = [
        F.sum(F.col("cluster_id").cast("decimal(38,0)")).alias("s"),
        F.count(F.lit(1)).alias("n"),
    ]
    prev = labels.agg(*chk).collect()[0]

    for _ in range(max_iterations):
        msgs = edges.join(labels, edges.src == labels.id).select(
            F.col("dst").alias("id"), "cluster_id"
        )
        # localCheckpoint, not persist: a persist keeps the full
        # producer plan in lineage and the loop's logical tree grows
        # with every round — on deep-diameter components (long paths)
        # Catalyst's re-analysis of the accumulated tree OOMs building
        # the plan string long before the data is ever large. The
        # checkpoint truncates lineage so each round's plan is
        # O(1)-sized (the same fix pagerank/hits use).
        stepped = (
            msgs.unionByName(labels)
            .groupBy("id")
            .agg(F.min("cluster_id").alias("cluster_id"))
            .localCheckpoint(eager=True)
        )
        cur = stepped.agg(*chk).collect()[0]
        labels.unpersist()
        labels = stepped
        if cur["s"] == prev["s"] and cur["n"] == prev["n"]:
            break
        prev = cur
    return labels.select("id", "cluster_id")


def span_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    block_words: int = 8,
) -> DataFrame:
    """Span-level exact-substring deduplication at word granularity (the
    ExactSubstr idea from Lee et al., "Deduplicating Training Data Makes
    Language Models Better", word-block form): chop every document into
    consecutive non-overlapping ``block_words``-word blocks, find blocks
    whose exact text repeats anywhere in the corpus, and KEEP only the
    first occurrence (lowest (doc_id, block_idx)) — every later repeat
    is cut out of its document. Unlike the document-level dedup family
    (exact/minhash/simhash/jaccard, above), this removes repeated
    boilerplate SPANS from otherwise-unique documents.

    Plan (the 100 TB shape — no Python in the hot path):
    1. block construction is pure JVM array algebra on the split words:
       ``transform(sequence(...), i -> concat_ws(' ', slice(words, ...)))``
       then one ``posexplode`` — no window, no shuffle;
    2. global repeat detection groups the 32-byte md5 of each block
       (map-side partial agg; the shuffle carries digests + one packed
       first-occurrence key, never block text);
    3. survivors join back on the digest (AQE handles the skew of a
       viral block) and each document reassembles with
       ``array_sort(collect_list(struct(idx, text)))`` — one shuffle on
       doc_id, the same key the scan is usually already bucketed by.

    The first-occurrence rule packs (doc_id, block_idx) into a single
    orderable BIGINT (doc_id * 2^20 + idx, idx < 2^20 asserted) so the
    keeper is a plain ``min`` — SQL-portable for the oracle.

    Returns (id_col, clean_text, n_blocks, n_kept) — n_kept < n_blocks
    flags documents that lost at least one repeated span.
    """
    words = F.split(normalize_text(text_col), " ")
    n_blocks = F.greatest(
        F.ceil(F.size(words) / F.lit(block_words)).cast("long"), F.lit(1)
    )

    # Bind the split-words array ONCE as a lambda variable (the
    # char_ngrams trick, functions/text.py): referencing `words`
    # directly inside the per-block lambda would inline the
    # regex-normalize + split and re-evaluate it for EVERY block
    # (measured 20x on this operator at sf0.1).
    def blocks_of(ws: Column) -> Column:
        nb = F.greatest(
            F.ceil(F.size(ws) / F.lit(block_words)).cast("long"), F.lit(1)
        )
        return F.transform(
            F.sequence(F.lit(0), nb - 1),
            lambda i: F.concat_ws(
                " ", F.slice(ws, i * block_words + 1, block_words)
            ),
        )

    block_texts = F.element_at(F.transform(F.array(words), blocks_of), 1)
    blocks = df.select(
        F.col(id_col), F.posexplode(block_texts).alias("block_idx", "block_text")
    ).withColumn("digest", F.md5("block_text"))
    # packed first-occurrence key: doc-major, block-minor
    packed = (F.col(id_col).cast("long") * (1 << 20)) + F.col("block_idx")
    firsts = blocks.groupBy("digest").agg(
        F.count(F.lit(1)).alias("cnt"), F.min(packed).alias("keeper")
    )
    kept = (
        blocks.join(firsts, "digest")
        .where((F.col("cnt") == 1) | (packed == F.col("keeper")))
        .groupBy(id_col)
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("block_idx", "block_text"))
                    ),
                    lambda s: s["block_text"],
                ),
            ).alias("clean_text"),
            F.count(F.lit(1)).alias("n_kept"),
        )
    )
    totals = df.select(F.col(id_col), n_blocks.alias("n_blocks"))
    return totals.join(kept, id_col, "left").select(
        id_col,
        F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        "n_blocks",
        F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
    )


def incremental_minhash_pairs(
    new_df: DataFrame,
    index: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.85,
    n_hashes: int = 96,
    bands: int = 12,
    shingle_n: int = 3,
    estimate_margin: float = 0.1,
    driver_pairs_max_docs: int = 200_000,
    presigned: DataFrame | None = None,
) -> DataFrame:
    """INCREMENTAL near-dup detection: check an arriving batch against a
    PERSISTED signature index without re-signing or re-pairing the old
    corpus — the operational shape at 100 TB, where re-running
    ``minhash_lsh_pairs`` over corpus+batch would redo a month of work
    to admit a day of data.

    ``index`` is the (id, shingles, sig) relation from
    :func:`minhash_signatures` (persist it as parquet; append each
    admitted batch's signatures to keep it current). The arriving batch
    signs once; its band buckets join (a) the INDEX's band buckets for
    new-vs-old pairs and (b) themselves for new-vs-new pairs. Both
    candidate sets verify through the same signature-prefilter +
    exact-shingle pass as the full pipeline, so results are EXACTLY
    what the full recompute would emit for pairs touching the batch
    (pinned in pytest). Old-vs-old pairs are by definition already
    known and never recomputed.

    Output: (id_a, id_b, jaccard, vs_index boolean). Signatures must
    share n_hashes/shingle_n/seed with the index build.
    """
    if n_hashes % bands:
        raise ValueError("bands must divide n_hashes")
    r = n_hashes // bands
    lo_cut = threshold - estimate_margin

    # ``presigned`` (r15 optimization, guide §1.2 step 1): a caller
    # that already holds the batch's (id, shingles, sig) relation —
    # the streaming curation leg signs once and reuses it for both
    # admission and the index write — passes it here instead of
    # paying a second signature pass. Must share
    # n_hashes/shingle_n/seed with the index; caller owns its persist.
    if presigned is not None:
        sig_new = presigned
        own_sig = False
    else:
        sig_new = minhash_signatures(
            new_df, id_col, text_col, n_hashes, shingle_n
        ).persist(StorageLevel.MEMORY_AND_DISK)
        own_sig = True
    out_schema = T.StructType(
        [
            T.StructField("id_a", new_df.schema[id_col].dataType),
            T.StructField("id_b", new_df.schema[id_col].dataType),
            T.StructField("jaccard", T.DoubleType()),
        ]
    )

    # driver fast path (same gate policy as minhash_lsh_pairs): under the
    # gate, banding the combined signature rows in numpy beats four
    # distributed joins' fixed costs; pairs then filter to batch-touching
    # and re-orient. Identical output — the distributed path is CI-forced.
    #
    # r15 optimization (guide §2.4): the GATE and the driver transfer
    # are ONE job — collect the flagged union limited to cap+1 rows;
    # len(rows) <= cap is exactly the old two-count condition
    # (index.limit(cap+1).count() + sig_new.count() <= cap), and when
    # it holds the limit returned EVERY row, so the collected set is
    # complete. Previously this gate burned two count jobs before the
    # collect (3 of the ~12 fixed-floor jobs per streaming
    # micro-batch). Row order into the banding replay is irrelevant —
    # _minhash_pairs_driver_pdf sorts by id. Overflow wastes one
    # bounded cap+1-row transfer, noise next to the distributed LSH
    # pipeline that path pays anyway.
    cols = ["id", "shingles", "sig"]
    flagged = _collect_sig_rows(
        sig_new.select(*cols, F.lit(True).alias("_new"))
        .unionByName(index.select(*cols, F.lit(False).alias("_new")))
        .limit(driver_pairs_max_docs + 1)
    )
    if len(flagged) <= driver_pairs_max_docs:
        spark = new_df.sparkSession
        new_rows = [r_ for r_ in flagged if r_["_new"]]
        old_rows = [r_ for r_ in flagged if not r_["_new"]]
        new_ids = {row["id"] for row in new_rows}
        pairs_pdf = _minhash_pairs_driver_pdf(
            new_rows + old_rows, threshold,
            n_hashes, bands, r, estimate_margin, None,
        )
        if own_sig:
            sig_new.unpersist()
        full_schema = out_schema.add("vs_index", T.BooleanType())
        if pairs_pdf.empty:
            return spark.createDataFrame([], full_schema)
        # pair volume is tiny (near-dups only); filter + orient in the
        # pandas frame rather than via an isin() over up to 200k literal
        # ids or a Spark round trip
        a_new = pairs_pdf["id_a"].isin(new_ids)
        b_new = pairs_pdf["id_b"].isin(new_ids)
        keep = a_new | b_new
        kept = pairs_pdf[keep].copy()
        kept["vs_index"] = ~(a_new[keep] & b_new[keep])
        if kept.empty:
            return spark.createDataFrame([], full_schema)
        return spark.createDataFrame(kept, full_schema)

    b_new = _band_explode(sig_new, bands, r)
    b_old = _band_explode(index, bands, r)

    # new-vs-old: every bucket collision, orientation (new=a, old=b)
    cand_old = (
        b_new.alias("l")
        .join(
            b_old.alias("r"),
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bkey") == F.col("r.bkey")),
        )
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .distinct()
    )
    vs_old = _verify_candidates(
        cand_old, sig_new, index, out_schema, threshold, lo_cut, n_hashes
    ).withColumn("vs_index", F.lit(True))

    # new-vs-new: ordered pairs within the batch
    cand_new = (
        b_new.alias("l")
        .join(
            b_new.alias("r"),
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bkey") == F.col("r.bkey"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .distinct()
    )
    vs_new = _verify_candidates(
        cand_new, sig_new, sig_new, out_schema, threshold, lo_cut, n_hashes
    ).withColumn("vs_index", F.lit(False))

    return vs_old.unionByName(vs_new)


def line_dedup_corpus(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    delim: str = "\n",
) -> DataFrame:
    """Corpus-level LINE deduplication (the C4/RefinedWeb rung between
    document-level ``exact_dedup`` and word-block ``span_dedup``): any
    line whose exact text occurs more than once ANYWHERE in the corpus
    survives only at its first occurrence (lowest (doc_id, line_pos));
    every later repeat is cut from its document. This is the operator
    that strips boilerplate navigation/footer/cookie lines that repeat
    across a web crawl while each *page* is still unique.

    Blank-after-trim lines are always kept — deduping them would gut
    document formatting for zero dedup value (and they would otherwise
    all collapse into one global survivor).

    Plan (same digest-shuffle shape as :func:`span_dedup` — the 100 TB
    path has no Python and never shuffles line text twice):
    1. ``posexplode(split(text, delim))`` — map-side, no shuffle;
    2. global first-occurrence per line groups the 32-byte md5 digest
       (map-side partial agg; the shuffle carries digest + one small
       (doc_id, pos) struct, never the line text);
    3. survivors join back on the digest (AQE splits a viral line's
       skew) and documents reassemble with one shuffle on doc id.

    The keeper is ``min(struct(doc_id, pos))`` — lexicographic struct
    min, so it is exact for any doc_id range or line count (no packed
    BIGINT key to overflow) and mirrors a SQL ``min(row(...))`` /
    two-column window for the oracle.

    ``delim`` is a LITERAL delimiter: it is regex-escaped before
    ``split`` so that splitting and the ``concat_ws`` reassembly always
    agree (a raw '.' or '|' would otherwise split per-character).

    Returns (id_col, clean_text, n_lines, n_kept); n_kept < n_lines
    flags documents that lost at least one repeated line.
    """
    delim_re = re.escape(delim)
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), delim_re)).alias("pos", "line"),
    ).withColumn("digest", F.md5("line"))
    occ = F.struct(
        F.col(id_col).alias("_d"), F.col("pos").alias("_p")
    )
    blank = F.trim(F.col("line")) == ""
    firsts = lines.where(~blank).groupBy("digest").agg(
        F.count(F.lit(1)).alias("cnt"), F.min(occ).alias("keeper")
    )
    kept = (
        lines.join(firsts, "digest", "left")
        .where(blank | F.col("cnt").isNull() | (occ == F.col("keeper")))
        .groupBy(id_col)
        .agg(
            F.concat_ws(
                delim,
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "line"))),
                    lambda s: s["line"],
                ),
            ).alias("clean_text"),
            F.count(F.lit(1)).alias("n_kept"),
        )
    )
    totals = df.select(
        F.col(id_col),
        F.size(F.split(F.col(text_col), delim_re)).cast("long").alias("n_lines"),
    )
    return totals.join(kept, id_col, "left").select(
        id_col,
        F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        "n_lines",
        F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
    )


def domain_boilerplate_strip(
    df: DataFrame,
    domain_col: str = "domain",
    id_col: str = "doc_id",
    text_col: str = "text",
    delim: str = "\n",
    frac_pct: int = 50,
    min_pages: int = 2,
) -> DataFrame:
    """Template/boilerplate removal scoped PER DOMAIN (the
    C4/RefinedWeb sibling of :func:`line_dedup_corpus`, aimed at site
    chrome): a line is boilerplate for a domain when it appears on at
    least ``frac_pct`` percent of that domain's pages (and on at least
    ``min_pages`` pages) — and boilerplate lines are removed from
    EVERY page of the domain, first occurrence included (navigation
    has no "keeper": it is noise on every page). Global line dedup
    keeps one copy of a repeated line; this keeps none, and a line
    common on site A is untouched on site B.

    The threshold is pure integer arithmetic
    (``100 * line_pages >= frac_pct * domain_pages``) — no float
    boundary ambiguity, SQL-replayable verbatim. Blank-after-trim
    lines are always kept (formatting, not boilerplate).

    Plan: per-domain page counts are a tiny aggregate; line occurrence
    counts group the (domain, md5 digest) pair after collapsing
    within-page repeats — the shuffles carry 32-byte digests, never
    line text; pages reassemble with one shuffle on the page id. At
    100 TB this is two digest-keyed aggregates + one join, all
    AQE-skew-splittable (a viral nav line is one hot digest).

    Returns (id_col, domain_col, clean_text, n_lines, n_kept)."""
    delim_re = re.escape(delim)
    lines = df.select(
        F.col(id_col),
        F.col(domain_col),
        F.posexplode(F.split(F.col(text_col), delim_re)).alias(
            "pos", "line"
        ),
    ).withColumn("digest", F.md5("line"))
    blank = F.trim(F.col("line")) == ""
    # distinct pages per (domain, line): collapse within-page repeats
    # first so the count is pages, not occurrences
    per_page = (
        lines.where(~blank)
        .select(domain_col, "digest", id_col)
        .distinct()
    )
    line_pages = per_page.groupBy(domain_col, "digest").agg(
        F.count(F.lit(1)).alias("line_pages")
    )
    domain_pages = df.groupBy(domain_col).agg(
        F.count(F.lit(1)).alias("domain_pages")
    )
    boiler = (
        line_pages.join(domain_pages, domain_col)
        .where(
            (F.lit(100) * F.col("line_pages")
             >= F.lit(int(frac_pct)) * F.col("domain_pages"))
            & (F.col("line_pages") >= int(min_pages))
        )
        .select(domain_col, "digest")
    )
    kept = (
        lines.join(boiler, [domain_col, "digest"], "left_anti")
        .groupBy(id_col)
        .agg(
            F.concat_ws(
                delim,
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "line"))),
                    lambda s: s["line"],
                ),
            ).alias("clean_text"),
            F.count(F.lit(1)).alias("n_kept"),
        )
    )
    totals = df.select(
        F.col(id_col),
        F.col(domain_col),
        F.size(F.split(F.col(text_col), delim_re))
        .cast("long")
        .alias("n_lines"),
    )
    return totals.join(kept, id_col, "left").select(
        id_col,
        domain_col,
        F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        "n_lines",
        F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
    )


def containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float,
    shingle_n: int = 3,
    broadcast_verify_max_docs: int = 100_000,
    rarity_broadcast_max_universe: int = 2_000_000,
) -> DataFrame:
    """EXACT n-gram CONTAINMENT near-dup pairs: emit (id_a < id_b)
    where ``|shingles(A) ∩ shingles(B)| / min(|A|, |B|)`` >= threshold
    — the ASYMMETRIC cousin of :func:`ngram_jaccard_pairs` that
    catches quote-inclusion and subset duplication (a paragraph pasted
    into a larger page has tiny Jaccard but containment ~1; the C4 /
    RealNews dedup rung Jaccard misses). Broder's containment
    coefficient (1997 — public).

    Two exact paths, chosen by the measured gram-universe size (same
    decision the Jaccard operator makes):

    - DENSE universe (template/synthetic corpora, <= 4096 distinct
      codes): blocked bitmap brute force — one sgemm per row block
      against the broadcast corpus matrix gives every intersection
      exactly; containment only changes the denominator.
    - SPARSE universe (real text): ASYMMETRIC prefix filter. Only the
      potentially-CONTAINED side needs a prefix: C(A in B) >= t forces
      overlap >= ceil(t*|A|), so A's rarest
      ``|A| - ceil(t*|A|) + 1`` grams must intersect B's FULL gram
      set (no length-ratio pruning exists — containment pairs tiny A
      with huge B by design). Candidates = prefix postings joined
      against full postings; hot grams stay out of prefixes
      (rarest-first order), which is what bounds the join. Verify is
      exact via the broadcast gram map (or an array-intersect join
      beyond the broadcast cap).

    Returns (id_a, id_b, n_a, n_b, inter, containment) with the
    threshold applied as the LOSSLESS integer comparison
    ``100 * inter >= round(100*t) * min(n_a, n_b)``."""
    from oakstore_spark.operators.scaling import widen_partitions

    pct = int(round(threshold * 100))
    df = widen_partitions(df)
    codes_udf = char_ngram_codes(shingle_n)
    grams = (
        df.select(
            F.col(id_col).alias("id"),
            codes_udf(normalize_text(text_col)).alias("codes"),
        )
        .withColumn("n_grams", F.size("codes"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    dfreq = (
        grams.select(F.explode("codes").alias("code"))
        .groupBy("code")
        .agg(F.count(F.lit(1)).alias("_df"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # universe size via a COUNT — the frequency table itself is only
    # collected to the driver when a path actually broadcasts it and
    # the universe fits under its gate (the dense gemm at <=4096, the
    # searchsorted rarity lookup at <=rarity_broadcast_max_universe);
    # beyond that the sparse path ranks rarity with a distributed join
    # instead, so universe growth (unicode-heavy corpora, larger n)
    # can never funnel through the driver.
    universe = dfreq.count()
    n_docs = grams.count()

    out_schema = T.StructType(
        [
            T.StructField("id_a", df.schema[id_col].dataType),
            T.StructField("id_b", df.schema[id_col].dataType),
            T.StructField("n_a", T.LongType()),
            T.StructField("n_b", T.LongType()),
            T.StructField("inter", T.LongType()),
            T.StructField("containment", T.DoubleType()),
        ]
    )
    if n_docs == 0:
        return df.sparkSession.createDataFrame([], out_schema)

    if (
        universe <= 4096
        and n_docs <= broadcast_verify_max_docs
        and n_docs * universe * 4 <= 500_000_000
    ):
        freq_rows = dfreq.collect()
        dfreq.unpersist()  # fully consumed by the collect above
        code_space = np.sort(np.asarray([int(r["code"]) for r in freq_rows]))
        doc_rows = grams.select("id", "codes").collect()
        ids_all = np.asarray([r["id"] for r in doc_rows])

        def to_matrix(code_arrays: list) -> np.ndarray:
            lens = np.fromiter(
                (len(c) for c in code_arrays), np.int64, len(code_arrays)
            )
            cat = (
                np.concatenate(code_arrays)
                if len(code_arrays)
                else np.empty(0, np.int64)
            )
            m = np.zeros((len(code_arrays), code_space.size), dtype=np.float32)
            m[
                np.repeat(np.arange(len(code_arrays)), lens),
                np.searchsorted(code_space, np.asarray(cat, dtype=np.int64)),
            ] = 1.0
            return m

        mat = to_matrix([np.asarray(r["codes"], dtype=np.int64) for r in doc_rows])
        sizes_all = mat.sum(axis=1).astype(np.int64)
        bc_mat = df.sparkSession.sparkContext.broadcast(
            (ids_all, mat, sizes_all, code_space)
        )

        def dense_pairs(batches):
            ids_full, a_full, sz_full, space = bc_mat.value

            def blockify(arrays):
                lens = np.fromiter((len(c) for c in arrays), np.int64, len(arrays))
                cat = np.concatenate(arrays)
                m = np.zeros((len(arrays), space.size), dtype=np.float32)
                m[
                    np.repeat(np.arange(len(arrays)), lens),
                    np.searchsorted(space, np.asarray(cat, dtype=np.int64)),
                ] = 1.0
                return m

            for pdf in batches:
                if len(pdf) == 0:
                    continue
                for lo in range(0, len(pdf), 1024):
                    chunk = pdf.iloc[lo : lo + 1024]
                    blk = blockify(
                        [np.asarray(c, dtype=np.int64) for c in chunk["codes"]]
                    )
                    ids_blk = chunk["id"].to_numpy()
                    inter = (blk @ a_full.T).astype(np.int64)
                    sz_blk = blk.sum(axis=1).astype(np.int64)
                    mins = np.minimum(sz_blk[:, None], sz_full[None, :])
                    hit = (100 * inter >= pct * mins) & (
                        ids_blk[:, None] < ids_full[None, :]
                    )
                    bi, aj = np.nonzero(hit)
                    yield pd.DataFrame(
                        {
                            "id_a": ids_blk[bi],
                            "id_b": ids_full[aj],
                            "n_a": sz_blk[bi],
                            "n_b": sz_full[aj],
                            "inter": inter[bi, aj],
                            "containment": inter[bi, aj] / mins[bi, aj],
                        }
                    )

        nparts = max(df.sparkSession.sparkContext.defaultParallelism, 4)
        return (
            grams.select("id", "codes")
            .repartition(nparts)
            .mapInPandas(dense_pairs, out_schema)
        )

    # SPARSE path: rarity-ordered prefixes on the contained side vs
    # full postings. Under the gate, the frequency lookup is a
    # UNIVERSE-sized sorted pair of arrays probed with searchsorted —
    # NOT a dense max-code-indexed table: at shingle_n=4 the code
    # space is 2^28 and a dense int64 table is a 2.1 GB broadcast
    # (measured: it stalled a 500k-doc probe outright), while real
    # universes are millions of entries at most. ABOVE the gate
    # (unicode-heavy corpora, larger n, or gate forced to 0 in CI),
    # rarity is ranked DISTRIBUTED: explode the postings, join the
    # frequency relation on code, and re-assemble each doc's codes
    # sorted by (_df, code) with array_sort over structs — one extra
    # shuffle, zero driver-side state, identical ordering (lexsort by
    # (df asc, code asc) == struct ordering (df, code) asc).
    if universe <= rarity_broadcast_max_universe:
        freq_rows = dfreq.collect()
        space = np.sort(np.asarray([int(r["code"]) for r in freq_rows]))
        freqs = np.empty(space.size, dtype=np.int64)
        tmp = {int(r["code"]): int(r["_df"]) for r in freq_rows}
        for i, c in enumerate(space):
            freqs[i] = tmp[int(c)]
        bc_freq = df.sparkSession.sparkContext.broadcast((space, freqs))

        from pyspark.sql.functions import pandas_udf

        @pandas_udf("array<int>")
        def rarity_sort(codes_s: pd.Series) -> pd.Series:
            sp, fq = bc_freq.value
            out = []
            for c in codes_s:
                cv = np.asarray(c, dtype=np.int64)
                dfv = fq[np.searchsorted(sp, cv)]
                order = np.lexsort((cv, dfv))
                out.append(cv[order].astype(np.int32))
            return pd.Series(out)

        sorted_grams = grams.select(
            "id", "n_grams", rarity_sort("codes").alias("codes_r")
        ).persist(StorageLevel.MEMORY_AND_DISK)
    else:
        sorted_grams = (
            grams.select("id", F.explode("codes").alias("code"))
            .join(dfreq, "code")
            .groupBy("id")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct(F.col("_df"), F.col("code")))
                ).alias("_sc")
            )
            .select(
                "id",
                F.size("_sc").alias("n_grams"),
                F.transform("_sc", lambda s: s["code"]).alias("codes_r"),
            )
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
    # materialize the cached rarity-sorted relation, then release its
    # inputs — everything downstream (prefix, full postings, verify
    # sides) reads only sorted_grams, so grams/dfreq would otherwise
    # sit in the cache for the life of the session
    sorted_grams.count()
    grams.unpersist()
    dfreq.unpersist()
    # The prefix length MUST be derived from the same integer pct the
    # acceptance filter uses (100*inter >= pct*min): a pair passes when
    # inter >= ceil(pct*n/100), so covering candidates needs the rarest
    # n - ceil(pct*n/100) + 1 grams. Deriving it from the raw float
    # threshold (ceil(t*n)) under-covers whenever round(100*t) < 100*t
    # (e.g. t=0.333 -> pct=33) — candidates the verify filter would
    # accept could be silently missed. ceil(pct*n/100) as exact integer
    # arithmetic: floor((pct*n + 99) / 100).
    need = F.floor(
        (F.lit(pct) * F.col("n_grams") + F.lit(99)) / F.lit(100)
    )
    prefix_len = (F.col("n_grams") - need + 1).cast("int")
    prefix = sorted_grams.select(
        "id", F.explode(F.slice("codes_r", 1, prefix_len)).alias("code")
    )
    full = sorted_grams.select(
        "id", F.explode("codes_r").alias("code")
    )
    p, fl = prefix.alias("p"), full.alias("f")
    cand = (
        p.join(
            fl,
            (F.col("p.code") == F.col("f.code"))
            & (F.col("p.id") != F.col("f.id")),
        )
        .select(
            F.least("p.id", "f.id").alias("id_a"),
            F.greatest("p.id", "f.id").alias("id_b"),
        )
        .distinct()
    )
    ga = sorted_grams.select(
        F.col("id").alias("id_a"),
        F.col("codes_r").alias("_ca"),
        F.col("n_grams").alias("n_a"),
    )
    gb = sorted_grams.select(
        F.col("id").alias("id_b"),
        F.col("codes_r").alias("_cb"),
        F.col("n_grams").alias("n_b"),
    )
    inter = F.size(F.array_intersect("_ca", "_cb")).cast("long")
    verified = (
        cand.join(ga, "id_a")
        .join(gb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            inter.alias("inter"),
        )
        .where(
            F.lit(100) * F.col("inter")
            >= F.lit(pct) * F.least("n_a", "n_b")
        )
        .select(
            "id_a",
            "id_b",
            "n_a",
            "n_b",
            "inter",
            (F.col("inter") / F.least("n_a", "n_b")).alias("containment"),
        )
    )
    return verified


def edit_distance_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_dist: int,
    q: int = 3,
) -> DataFrame:
    """Fuzzy-match pairs under EDIT DISTANCE (entity resolution /
    typo-duplicate detection — the string-similarity family next to
    the set-based jaccard/containment rungs): emit (id_a < id_b,
    len_a, len_b, edit_dist) for every pair of normalized texts with
    ``levenshtein <= max_dist``. Exact: candidates are generated by a
    LOSSLESS filter and verified with the built-in JVM
    ``levenshtein`` (DuckDB has the same function, so the whole
    operator is oracle-checkable).

    Candidate generation — a RARITY-PREFIX filter (the asymmetric
    prefix idea the containment operator uses, applied to the edit
    destroy bound; ingredients public — Gravano et al. VLDB 2001 for
    positional q-grams, Chaudhuri/Xin prefix filtering):

      one edit destroys at most q of a string's positional q-grams,
      so ed(s, t) <= k leaves >= 1 of ANY k*q+1 grams of s alive in t
      at a position shifted by <= k, and ``abs(|s| - |t|) <= k``.

    Each string therefore joins only its ``k*q + 1`` globally RAREST
    grams (prefix side) against the full posting lists — hot grams
    (the death of the naive all-grams self-join on small alphabets:
    hex ids, phone numbers) stay out of every prefix, which is what
    bounds the join fan-out at corpus scale. SHORT strings
    (len < (k+1)*q, fewer than k*q+1 grams — the pigeonhole is
    vacuous) take a lossless LENGTH-BLOCKED leg instead: candidate
    lengths explode to an equi-join key (2k+1 rows per short string —
    never a cartesian), covering short-short and short-long boundary
    pairs. Every leg verifies with the same exact predicate, so the
    union is exact.

    Returns (id_a, id_b, len_a, len_b, edit_dist)."""
    from oakstore_spark.functions.text import normalize_text
    from oakstore_spark.operators.scaling import widen_partitions

    k = int(max_dist)
    if k < 0:
        raise ValueError("max_dist must be >= 0")
    df = widen_partitions(df)
    # base and grams feed MULTIPLE sides of the returned lazy plan
    # (candidate legs + both verify sides), so they stay persisted for
    # the plan's lifetime — same contract as minhash's sigs; a
    # long-lived session that is done with the result can release them
    # via df.sparkSession.catalog.clearCache()
    base = df.select(
        F.col(id_col).alias("id"),
        normalize_text(text_col).alias("_nt"),
    ).withColumn("_len", F.length("_nt")).persist(
        StorageLevel.MEMORY_AND_DISK
    )

    # the destroy-bound pigeonhole needs len - q + 1 >= k*q + 1 grams;
    # a pair whose longer side is below that rides the short leg
    short_cut = (k + 1) * q  # longer-side lengths < this are "short"
    long_side = base.where(F.col("_len") >= short_cut)
    short_side = base.where(F.col("_len") < short_cut)

    grams = long_side.select(
        "id",
        "_len",
        F.posexplode(
            F.element_at(
                F.transform(
                    F.array(F.col("_nt")),
                    lambda s: F.transform(
                        F.sequence(
                            F.lit(1),
                            F.greatest(
                                F.length(s) - F.lit(q - 1), F.lit(1)
                            ),
                        ),
                        lambda i: F.substring(s, i, q),
                    ),
                ),
                1,
            )
        ).alias("pos", "gram"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    # global gram rarity; per-doc prefix = the k*q+1 rarest grams
    # (ties by gram, then pos — any deterministic selection is valid)
    # r15 optimization (guide §2.4): rarity as a window count over the
    # gram partition — the groupBy + join back shuffled the gram
    # stream twice (agg exchange + join exchange); the window needs
    # exactly one. Identical counts.
    ranked = grams.withColumn(
        "_gf", F.count(F.lit(1)).over(W.partitionBy("gram"))
    )
    prefix = (
        ranked.groupBy("id")
        .agg(
            F.first("_len").alias("_len"),
            F.slice(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col("_gf"), F.col("gram"), F.col("pos")
                        )
                    )
                ),
                1,
                k * q + 1,
            ).alias("_sel"),
        )
        .select(
            "id",
            "_len",
            F.explode("_sel").alias("_s"),
        )
        .select(
            "id",
            "_len",
            F.col("_s.gram").alias("gram"),
            F.col("_s.pos").alias("pos"),
        )
    )
    a, b = prefix.alias("a"), grams.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.gram") == F.col("b.gram"))
            & (F.col("a.id") != F.col("b.id"))
            & (F.abs(F.col("a.pos") - F.col("b.pos")) <= k)
            & (F.abs(F.col("a._len") - F.col("b._len")) <= k),
        )
        .select(
            F.least(F.col("a.id"), F.col("b.id")).alias("id_a"),
            F.greatest(F.col("a.id"), F.col("b.id")).alias("id_b"),
        )
        .distinct()
    )

    # lossless fallback legs, both as EQUI-joins (a raw |len diff|<=k
    # inequality would plan as a cartesian product): each short string
    # explodes its admissible partner lengths into a join key
    s_target = short_side.select(
        F.col("id").alias("_sid"),
        F.col("_len").alias("_slen"),
        F.explode(
            F.sequence(
                F.greatest(F.col("_len") - k, F.lit(0)),
                F.col("_len") + k,
            )
        ).alias("_tlen"),
    )
    # short-short: partner length == exploded target
    s2 = short_side.select(
        F.col("id").alias("_oid"), F.col("_len").alias("_tlen")
    )
    short_cand = (
        s_target.join(s2, "_tlen")
        .where(F.col("_sid") < F.col("_oid"))
        .select(
            F.col("_sid").alias("id_a"), F.col("_oid").alias("id_b")
        )
    )
    # short-long boundary: long side's length == exploded target (only
    # targets >= short_cut can hit, the rest join nothing)
    lg = long_side.select(
        F.col("id").alias("_oid"), F.col("_len").alias("_tlen")
    )
    edge_cand = (
        s_target.join(lg, "_tlen")
        .select(
            F.least("_sid", "_oid").alias("id_a"),
            F.greatest("_sid", "_oid").alias("id_b"),
        )
    )

    all_cand = cand.unionByName(short_cand).unionByName(edge_cand).distinct()
    ta = base.select(
        F.col("id").alias("id_a"),
        F.col("_nt").alias("_ta"),
        F.col("_len").alias("len_a"),
    )
    tb = base.select(
        F.col("id").alias("id_b"),
        F.col("_nt").alias("_tb"),
        F.col("_len").alias("len_b"),
    )
    return (
        all_cand.join(ta, "id_a")
        .join(tb, "id_b")
        .withColumn("edit_dist", F.levenshtein("_ta", "_tb"))
        .where(F.col("edit_dist") <= k)
        .select(
            "id_a",
            "id_b",
            F.col("len_a").cast("long").alias("len_a"),
            F.col("len_b").cast("long").alias("len_b"),
            F.col("edit_dist").cast("long").alias("edit_dist"),
        )
    )
