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

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf
from pyspark.storagelevel import StorageLevel

from oakstore_spark.functions.text import char_ngrams, normalize_text, tokens


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
) -> DataFrame:
    """(id, shingles, sig): char-shingle the normalized text and minhash
    it under ``n_hashes`` hash functions.

    Each distinct shingle is hashed once (JVM ``xxhash64`` — the only
    pass over string data); the pandas UDF then computes
    min_i(a_i * h + b_i mod 2^64) for all i in one numpy broadcast per
    row (~shingles x n_hashes uint64 ops, vectorized)."""
    a_const, b_const = _km_constants(n_hashes, seed)
    norm = normalize_text(text_col)
    hashed = df.select(
        F.col(id_col).alias("id"),
        char_ngrams(norm, shingle_n).alias("shingles"),
    ).withColumn("_h", F.transform(F.col("shingles"), lambda s: F.xxhash64(s)))

    @pandas_udf("array<long>")
    def derive_sig(hs: pd.Series) -> pd.Series:
        out = []
        for h in hs:
            hv = np.asarray(h, dtype=np.int64).view(np.uint64)
            if hv.size == 0:
                sig = b_const
            else:
                # (shingles x n_hashes) wraparound multiply-add, min-reduce
                sig = (hv[:, None] * a_const[None, :] + b_const[None, :]).min(axis=0)
            out.append(np.ascontiguousarray(sig).view(np.int64))
        return pd.Series(out)

    return hashed.select("id", "shingles", derive_sig("_h").alias("sig"))


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
) -> DataFrame:
    """Near-duplicate pairs (id_a < id_b, jaccard >= threshold).

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
    # persisted: feeds the band explode, both sides of the candidate
    # join, the signature prefilter and the shingle verify
    sigs = minhash_signatures(df, id_col, text_col, n_hashes, shingle_n).persist(
        StorageLevel.MEMORY_AND_DISK
    )

    banded = sigs.select(
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

    # cheap prefilter on the fixed-width signatures (96 longs) before the
    # expensive shingle-set join: estimated jaccard = matching components
    sg = sigs.select("id", "sig")
    prefiltered = (
        cand.join(sg.withColumnRenamed("id", "id_a").withColumnRenamed("sig", "sig_a"), "id_a")
        .join(sg.withColumnRenamed("id", "id_b").withColumnRenamed("sig", "sig_b"), "id_b")
        .withColumn(
            "est_j",
            F.aggregate(
                F.zip_with("sig_a", "sig_b", lambda a, b: F.when(a == b, F.lit(1)).otherwise(F.lit(0))),
                F.lit(0),
                lambda acc, x: acc + x,
            )
            / F.lit(float(n_hashes)),
        )
        .filter(F.col("est_j") >= threshold - estimate_margin)
        .select("id_a", "id_b")
    )

    sh = sigs.select("id", "shingles")
    verified = (
        prefiltered.join(
            sh.withColumnRenamed("id", "id_a").withColumnRenamed("shingles", "sh_a"), "id_a"
        )
        .join(sh.withColumnRenamed("id", "id_b").withColumnRenamed("shingles", "sh_b"), "id_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.size(F.array_union("sh_a", "sh_b")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return verified


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
    """
    grams = df.select(
        F.col(id_col).alias("id"),
        char_ngrams(normalize_text(text_col), shingle_n).alias("grams"),
    ).withColumn("n_grams", F.size("grams"))
    grams = grams.persist(StorageLevel.MEMORY_AND_DISK)

    posts = grams.select("id", "n_grams", F.explode("grams").alias("gram"))
    dfreq = posts.groupBy("gram").agg(F.count(F.lit(1)).alias("_df"))

    w = W.partitionBy("id").orderBy(F.col("_df").asc(), F.col("gram").asc())
    prefix_len = F.col("n_grams") - F.ceil(F.lit(threshold) * F.col("n_grams")) + 1
    # persisted: both sides of the candidate self-join — without this the
    # df-join + window re-run twice
    prefix = (
        posts.join(F.broadcast(dfreq), "gram")
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= prefix_len)
        .select("id", "n_grams", "gram")
    ).persist(StorageLevel.MEMORY_AND_DISK)

    a, b = prefix.alias("a"), prefix.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.gram") == F.col("b.gram"))
            & (F.col("a.id") < F.col("b.id"))
            # length-ratio pruning: J >= t forces t*|longer| <= |shorter|
            & (F.least("a.n_grams", "b.n_grams")
               >= threshold * F.greatest("a.n_grams", "b.n_grams")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )

    # Exact verify. On template-heavy corpora the prefix filter still
    # passes millions of candidates; both interpreted array_intersect
    # AND shipping each doc's gram array once per pair (candidates x
    # ~1KB through the shuffle + Arrow) dominated the query. When the
    # corpus is small enough, broadcast one (id -> sorted gram-hash
    # array) map instead and verify candidate batches of BARE ID PAIRS
    # (16 bytes/row) with numpy searchsorted. 64-bit gram hashing makes
    # a jaccard miscount a ~2^-64-per-gram-pair event — negligible.
    out_schema = T.StructType(
        [
            T.StructField("id_a", df.schema[id_col].dataType),
            T.StructField("id_b", df.schema[id_col].dataType),
            T.StructField("jaccard", T.DoubleType()),
        ]
    )
    n_docs = grams.count()  # materializes the persist; cheap afterwards

    if n_docs <= broadcast_verify_max_docs:
        rows = grams.select(
            "id", F.sort_array(F.transform("grams", lambda g: F.xxhash64(g))).alias("h")
        ).collect()
        gram_map = {r["id"]: np.asarray(r["h"], dtype=np.int64) for r in rows}
        bc = df.sparkSession.sparkContext.broadcast(gram_map)

        def verify_bc(batches):
            gm = bc.value
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                jac = np.empty(len(pdf))
                ids_a, ids_b = pdf["id_a"].to_numpy(), pdf["id_b"].to_numpy()
                for i in range(len(pdf)):
                    ha, hb = gm[ids_a[i]], gm[ids_b[i]]
                    pos = np.searchsorted(ha, hb)
                    pos[pos == ha.size] = ha.size - 1
                    inter = int((ha[pos] == hb).sum())
                    jac[i] = inter / (ha.size + hb.size - inter)
                keep = jac >= threshold
                out = pdf.loc[keep, ["id_a", "id_b"]].copy()
                out["jaccard"] = jac[keep]
                yield out

        return cand.mapInPandas(verify_bc, out_schema)

    # large-corpus fallback: join the gram arrays to each pair
    ga = grams.select(F.col("id").alias("id_a"), F.col("grams").alias("g_a"))
    gb = grams.select(F.col("id").alias("id_b"), F.col("grams").alias("g_b"))
    joined = cand.join(ga, "id_a").join(gb, "id_b")

    def verify(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            jac = np.empty(len(pdf))
            for i, (a_g, b_g) in enumerate(zip(pdf["g_a"], pdf["g_b"])):
                sa, sb = set(a_g), set(b_g)  # already distinct
                inter = len(sa & sb)
                jac[i] = inter / (len(sa) + len(sb) - inter)
            keep = jac >= threshold
            out = pdf.loc[keep, ["id_a", "id_b"]].copy()
            out["jaccard"] = jac[keep]
            yield out

    return joined.mapInPandas(verify, out_schema)


def simhash_signatures(
    df: DataFrame, id_col: str, text_col: str, bits: int = 64
) -> DataFrame:
    """(id, simhash): 64-bit SimHash of the whitespace tokens.

    Tokens are hashed once JVM-side (`xxhash64`); the bit-vote (for each
    bit position, sum +-1 votes across tokens; bit is 1 if positive) runs
    as a vectorized numpy kernel in a pandas UDF — not 64 interpreted
    expression passes, not per-row Python.
    """
    if bits != 64:
        raise ValueError("simhash_signatures supports bits=64 only")
    toks = F.array_distinct(tokens(normalize_text(text_col)))
    hashed = df.select(F.col(id_col).alias("id"), toks.alias("_t")).withColumn(
        "_h", F.transform(F.col("_t"), lambda t: F.xxhash64(t))
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
) -> DataFrame:
    """Connected components over near-dup pairs -> (id, cluster_id) with
    cluster_id = min id in the component. This is the step that turns
    pairwise near-dup output into keep/drop decisions (keep the cluster
    representative, drop the rest).

    Iterative min-label propagation: every node starts labeled with its
    own id; each round, a node takes the min of its label and its
    neighbors' labels; converges in O(component diameter) rounds. Each
    round is one shuffle (join on node id) — the standard scalable CC
    formulation (hash-to-min). The driver loop only collects a single
    convergence counter per round; labels stay distributed. Near-dup
    components are tiny in practice (dup clusters, not social graphs),
    so rounds ~ 2-4.
    """
    # undirected edge list, both directions
    e1 = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    e2 = pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst"))
    edges = e1.unionByName(e2).distinct().persist(StorageLevel.MEMORY_AND_DISK)

    pinned = (
        edges.select(F.col("src").alias("id")).distinct()
        .withColumn("cluster_id", F.col("id"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    pinned.count()
    labels = pinned

    for _ in range(max_iterations):
        # min label among neighbors, per node
        neighbor_min = (
            edges.join(labels.withColumnRenamed("id", "dst_id"),
                       F.col("dst") == F.col("dst_id"))
            .groupBy("src")
            .agg(F.min("cluster_id").alias("nbr_min"))
        )
        # carry the old label through so convergence is checked from the
        # same cached frame (no extra join per round)
        stepped = (
            labels.join(neighbor_min, labels.id == neighbor_min.src, "left")
            .select(
                "id",
                F.col("cluster_id").alias("_old"),
                F.least(
                    F.col("cluster_id"), F.coalesce(F.col("nbr_min"), F.col("cluster_id"))
                ).alias("cluster_id"),
            )
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        changed = stepped.filter(F.col("cluster_id") != F.col("_old")).count()
        pinned.unpersist()
        pinned = stepped
        labels = stepped.select("id", "cluster_id")
        if changed == 0:
            break
    return labels.select("id", "cluster_id")
