#!/usr/bin/env python
"""Scale headroom probe: run the store write/append/slice path and a set
of headline operators on SYNTHETIC data ~10x the sf0.1 bench volume
(generated distributed via spark.range — no testdata dependency), and
print one JSON line of per-op wall times + rows/sec. Evidence for the
SCALING.md claims: the shapes that must stay linear (hash agg, window
over keys, as-of union+window, EWMA carry kernel, store round-trip) get
a measured point at a volume where a quadratic or driver-funnel mistake
would be unmissable.

Usage: python tools/scale_probe.py [--rows 20000000]
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import Window as W  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from oakstore_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=20_000_000)
    ap.add_argument("--vecs", type=int, default=0,
                    help="also probe ANN: IVF top-10 for 100 queries over "
                         "this many synthetic 64-d vectors, with recall@10 "
                         "vs exact brute force")
    ap.add_argument("--docs", type=int, default=0,
                    help="also probe distributed minhash dedup on this many "
                         "synthetic docs (>200k forces the distributed path)")
    ap.add_argument("--textdocs", type=int, default=0,
                    help="also probe the JVM text family (token stats, "
                         "unigram/bigram LM scoring, 5-gram novelty) on "
                         "this many synthetic 40-word docs")
    ap.add_argument("--spandocs", type=int, default=0,
                    help="also probe span/ExactSubstr dedup at volume: "
                         "this many synthetic docs, every 7th carrying a "
                         "planted boilerplate block; asserts exact "
                         "planted-span recovery (cuts == planted - 1)")
    ap.add_argument("--linedocs", type=int, default=0,
                    help="corpus line-dedup probe: docs of 3 unique "
                         "lines + a shared boilerplate line every 5th "
                         "doc; planted keep-first recovery checked")
    ap.add_argument("--mediadocs", type=int, default=0,
                    help="also probe the multimodal decode family: this "
                         "many synthetic MJPEG-AVI + PCM16-WAV payloads "
                         "through video_frame_luma and "
                         "audio_silence_stats with exact planted "
                         "blank-frame / silent-frame recovery")
    ap.add_argument("--piidocs", type=int, default=0,
                    help="PII family probe: detect+redact over this "
                         "many synthetic docs, every 3rd carrying one "
                         "Luhn-valid card and every 2nd an IPv4; "
                         "planted counts recovered exactly")
    ap.add_argument("--urls", type=int, default=0,
                    help="URL canonicalization probe: normalize + "
                         "registered-domain + per-domain rollup over "
                         "this many messy synthetic URLs; planted "
                         "distinct-domain count recovered exactly")
    ap.add_argument("--edges", type=int, default=0,
                    help="PageRank probe: 10 damped iterations over a "
                         "synthetic graph with this many edges (ring + "
                         "hash chords over n/4 nodes); asserts exact "
                         "mass conservation")
    ap.add_argument("--hammingvecs", type=int, default=0,
                    help="binary-quantized Hamming top-k probe")
    ap.add_argument("--ivfpqvecs", type=int, default=0,
                    help="IVFPQ build+ADC-search probe: build rate, "
                         "probed-cell partition pruning, recall@10 vs "
                         "exact L2 brute force")
    ap.add_argument("--containdocs", type=int, default=0,
                    help="sparse-path containment dedup probe")
    ap.add_argument("--editdocs", type=int, default=0,
                    help="edit-distance fuzzy-pair probe (rarity-prefix "
                         "candidates, planted 1-edit variants)")
    ap.add_argument("--warcdocs", type=int, default=0,
                    help="WARC write+read round-trip throughput probe")
    ap.add_argument("--avrodocs", type=int, default=0,
                    help="probe the pure-Python Avro codec's throughput "
                         "ceiling: write this many mixed-type rows as "
                         "sharded container files, read them back, "
                         "checksum-verify")
    ap.add_argument("--baskets", type=int, default=0,
                    help="market-basket affinity probe: this many "
                         "baskets x ~6 items from a 10k universe with "
                         "a planted hot pair; asserts Apriori prune + "
                         "exact planted recovery")
    ap.add_argument("--cliquegraph", type=int, default=0,
                    help="triangle/k-core probe: this many edges as "
                         "disjoint 32-cliques + pendant chains; "
                         "closed-form triangle counts and core "
                         "membership asserted exactly")
    ap.add_argument("--lpagraph", type=int, default=0,
                    help="community/CC probe: this many edges as "
                         "disjoint 64-clique communities chained by "
                         "single bridges; LPA must recover every "
                         "planted community exactly and CC must read "
                         "one component, both through the distributed "
                         "paths")
    ap.add_argument("--rakedocs", type=int, default=0,
                    help="RAKE keyword-extraction probe: this many "
                         "synthetic 40-word docs (vocab includes "
                         "stopwords so phrases really split); top-5 "
                         "phrases per doc forced end-to-end")
    ap.add_argument("--evalrows", type=int, default=0,
                    help="forecaster/model-eval probe: this many "
                         "rows as 10k-key integer series through "
                         "ar_forecast (lag windows + Gram aggregate "
                         "+ Cramer solve) and as scored units "
                         "through roc_auc/pr_curve/calibration; "
                         "planted AR(2) keys recovered exactly and "
                         "the planted score-label association "
                         "asserted")
    ap.add_argument("--rankrows", type=int, default=0,
                    help="scale-safe-ranking probe (the r12 "
                         "SinglePartition fixes at volume): "
                         "qini_curve over this many units through "
                         "assign_contiguous_ids (exact per-bucket "
                         "membership counts asserted closed-form) "
                         "and mmr_topk over a 1M-vector raw corpus "
                         "through the TakeOrdered stage-1 path")
    ap.add_argument("--ssspnodes", type=int, default=0,
                    help="weighted SSSP probe: binary-jump graph over "
                         "this many nodes (rounded to a power of two; "
                         "~log2(n) unit-weight edges per node), "
                         "Bellman-Ford to the certified fixpoint; "
                         "asserts dist(v) == popcount(v) for EVERY "
                         "node (the closed form)")
    ap.add_argument("--rebalancevecs", type=int, default=0,
                    help="IVF rebalance probe: build on half the "
                         "vectors, drift-add the other half under a "
                         "different cluster seed, rebalance (retrain "
                         "256 centroids + full reassign); reports "
                         "rebalance throughput, skew before/after and "
                         "post-rebalance recall@10 for drifted "
                         "queries vs exact brute force")
    ap.add_argument("--curationdocs", type=int, default=0,
                    help="streaming curation-leg probe: this many "
                         "synthetic docs (every 10th a near-copy) "
                         "through text->vector->dedup->index in 3 "
                         "availableNow micro-batches; asserts planted "
                         "near-dups are turned away")
    ap.add_argument("--topicdocs", type=int, default=0,
                    help="topic-model hard-EM probe: this many "
                         "synthetic docs drawn from 4 disjoint "
                         "planted vocabularies, train_topics k=4 / "
                         "3 rounds; asserts the learned topics "
                         "partition docs exactly along the plant")
    ap.add_argument("--embeddocs", type=int, default=0,
                    help="doc_embed probe: hashed-TF-IDF x JL over "
                         "this many synthetic 30-word docs plus 10%% "
                         "planted exact-twin copies; asserts every "
                         "twin pair lands on the IDENTICAL integer "
                         "vector (determinism at volume)")
    ap.add_argument("--streamrows", type=int, default=0,
                    help="also probe Structured Streaming: this many "
                         "synthetic events through a watermarked tumbling "
                         "window agg and the streaming dedup admission "
                         "path, availableNow over multi-file input")
    args = ap.parse_args()
    n = args.rows
    spark = get_spark("oakstore_scale_probe")
    spark.sparkContext.setLogLevel("ERROR")

    out: dict[str, float] = {"rows": n}

    def timed(name: str, fn) -> None:
        t0 = time.time()
        fn()
        dt = time.time() - t0
        out[name + "_sec"] = round(dt, 2)
        out[name + "_rows_per_sec"] = round(n / dt)

    # synthetic events: 200k users, minute-spaced timestamps, skewed types
    ev = (
        spark.range(0, n, 1, 64)
        .select(
            F.col("id").alias("event_id"),
            (F.col("id") % 200_000).alias("user_id"),
            F.timestamp_micros(
                F.lit(1_700_000_000_000_000) + F.col("id") * 60_000_000
            ).alias("ts"),
            (F.hash("id") % 1000 / 10.0).alias("value"),
            F.element_at(
                F.array(F.lit("view"), F.lit("view"), F.lit("click"),
                        F.lit("purchase")),
                (F.col("id") % 4 + 1).cast("int"),
            ).alias("event_type"),
        )
    )
    ev.persist()
    timed("materialize", lambda: ev.count())

    def noop(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    timed("hash_agg", lambda: noop(
        ev.groupBy("user_id", "event_type").agg(
            F.count(F.lit(1)), F.sum("value"), F.avg("value")
        )
    ))
    timed("window_rolling", lambda: noop(
        ev.withColumn(
            "r",
            F.avg("value").over(
                W.partitionBy("user_id").orderBy("ts").rowsBetween(-10, 0)
            ),
        )
    ))

    from oakstore_spark.operators.timeseries import asof_join, grouped_ewma

    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("pid")
    )
    views = ev.where(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("event_id").alias("vid")
    )
    timed("asof_join", lambda: noop(
        asof_join(purchases, views, ts_col="ts", by=["user_id"],
                  value_cols=["vid"])
    ))
    timed("ewma_kernel", lambda: noop(
        grouped_ewma(ev, "ts", ["user_id"], "value", alpha=0.3)
    ))

    # sketch family at volume: every one is a single scan into a
    # fixed-size aggregate state — the persist-once/query-later shapes
    from oakstore_spark.streaming.sketches import cms_partial_grid

    timed("cms_grid", lambda: cms_partial_grid(ev, "user_id").count())
    timed("bitmap_exact_distinct", lambda: noop(
        ev.select(
            F.expr("bitmap_bucket_number(user_id)").alias("bkt"),
            F.expr("bitmap_bit_position(user_id)").alias("pos"),
        )
        .groupBy("bkt")
        .agg(F.expr("bitmap_construct_agg(pos)").alias("bm"))
        .agg(F.sum(F.expr("bitmap_count(bm)")))
    ))
    timed("theta_sketch_distinct", lambda: noop(
        ev.groupBy("event_type").agg(
            F.expr("theta_sketch_agg(user_id)").alias("sk")
        ).agg(F.expr("theta_sketch_estimate(theta_union_agg(sk))"))
    ))

    from oakstore_spark.operators.scaling import assign_contiguous_ids

    def probe_assign_ids() -> None:
        ids = assign_contiguous_ids(
            ev.select("event_id", "value"), "event_id", num_partitions=64
        )
        # spot-check the global contract at volume: max id == row count
        assert ids.agg(F.max("seq_id")).collect()[0][0] == n

    timed("assign_contiguous_ids", probe_assign_ids)

    # store round-trip at probe volume (one OHLCV-shaped item)
    import pandas as pd  # noqa: F401

    from oakstore_spark import Store

    sdir = tempfile.mkdtemp(prefix="oak_probe_")
    store = Store(base_path=sdir, spark=spark,
                  cols={"V": float}, index="TS")
    frame = ev.select(
        F.col("ts").alias("TS"), F.col("value").alias("V")
    ).where(F.col("event_id") % 10 == 0)  # 1/10th => ~n/10 rows, 1 item
    store_rows = frame.count()
    t0 = time.time()
    store._write(key="PROBE", data=frame)
    out["store_write_sec"] = round(time.time() - t0, 2)
    out["store_write_rows_per_sec"] = round(store_rows / (time.time() - t0))
    t0 = time.time()
    got = store["PROBE"].df().count()
    out["store_scan_sec"] = round(time.time() - t0, 2)
    assert got == store_rows, (got, store_rows)

    if args.docs:
        from oakstore_spark.operators.dedup import (
            _band_explode,
            incremental_minhash_pairs,
            minhash_lsh_pairs,
            minhash_signatures,
        )

        nd = args.docs
        # diverse tokens (hex of per-position hashes): a tiny shared
        # vocabulary would make every doc near-identical in shingle
        # space and melt the LSH buckets — realistic corpora are
        # diverse, so the probe's must be too. Every 50th doc is an
        # exact duplicate of its predecessor to give verify real hits.
        base = spark.range(0, nd, 1, 64).select(
            F.col("id").alias("doc_id"),
            F.concat_ws(
                " ",
                *[
                    F.hex(F.hash((F.col("id") - (F.col("id") % 50 == 49).cast("long")) * 131 + k))
                    for k in range(24)
                ],
            ).alias("text"),
        )
        docs = base
        docs.persist()
        docs.count()
        t0 = time.time()
        n_pairs = minhash_lsh_pairs(
            docs, "doc_id", "text", threshold=0.85
        ).count()
        dt = time.time() - t0
        out["dedup_docs"] = nd
        out["dedup_pairs"] = n_pairs
        out["dedup_sec"] = round(dt, 2)
        out["dedup_docs_per_sec"] = round(nd / dt)

        # candidate-pair ratio: how many ordered pairs the LSH banding
        # actually surfaces for verification, as a fraction of the n^2/2
        # all-pairs space — THE sub-quadratic claim, measured (the same
        # bound test_ann_candidates_subquadratic pins at fixture scale)
        sigs = minhash_signatures(docs, "doc_id", "text").persist()
        sigs.count()
        bnd = _band_explode(sigs, 12, 8)
        n_cand = (
            bnd.alias("l")
            .join(
                bnd.alias("r"),
                (F.col("l.band") == F.col("r.band"))
                & (F.col("l.bkey") == F.col("r.bkey"))
                & (F.col("l.id") < F.col("r.id")),
            )
            .select("l.id", "r.id")
            .distinct()
            .count()
        )
        sigs.unpersist()
        out["dedup_candidates"] = n_cand
        out["dedup_candidate_ratio"] = round(
            n_cand / (nd * (nd - 1) / 2), 10
        )

        # incremental admission at volume: 10% of the corpus arrives as
        # a batch against the persisted signature index of the other 90%
        # (> the 200k driver gate, so this runs the distributed
        # band-join path). The batch split doc_id % 10 == 9 contains
        # every planted duplicate (ids = 49 mod 50) while their
        # originals (= 48 mod 50) stay in the index — so the expected
        # vs-index pair count equals the planted-dup count. Admission
        # cost must track the BATCH, not the corpus.
        idx_dir = tempfile.mkdtemp(prefix="oak_probe_sigidx_")
        minhash_signatures(
            docs.where(F.col("doc_id") % 10 != 9), "doc_id", "text"
        ).write.mode("overwrite").parquet(idx_dir)
        index = spark.read.parquet(idx_dir)
        batch = docs.where(F.col("doc_id") % 10 == 9)
        nb = batch.count()
        t0 = time.time()
        n_inc = incremental_minhash_pairs(
            batch, index, "doc_id", "text", threshold=0.85
        ).count()
        dt = time.time() - t0
        out["incremental_batch_docs"] = nb
        out["incremental_pairs"] = n_inc
        out["incremental_sec"] = round(dt, 2)
        out["incremental_batch_docs_per_sec"] = round(nb / dt)
        import shutil as _shutil

        _shutil.rmtree(idx_dir, ignore_errors=True)

        from oakstore_spark.operators.dedup import span_dedup

        t0 = time.time()
        cut = span_dedup(docs).agg(
            F.sum(F.col("n_blocks") - F.col("n_kept"))
        ).first()[0]
        dt = time.time() - t0
        out["span_dedup_sec"] = round(dt, 2)
        out["span_dedup_docs_per_sec"] = round(nd / dt)
        out["span_blocks_cut"] = int(cut)

    if args.textdocs:
        # natural-ish synthetic prose: 40 words drawn from a 64-word
        # vocabulary by per-position hashes (JVM-only generation)
        nt = args.textdocs
        vocab = [f"w{i:02d}" for i in range(64)]
        arr = F.array(*[F.lit(w) for w in vocab])
        tdocs = spark.range(0, nt, 1, 64).select(
            F.col("id").alias("doc_id"),
            F.concat_ws(
                " ",
                *[
                    F.element_at(
                        arr,
                        (F.pmod(F.hash(F.col("id") * 131 + k), F.lit(64)) + 1).cast("int"),
                    )
                    for k in range(40)
                ],
            ).alias("text"),
        )
        tdocs.persist()
        tdocs.count()

        from oakstore_spark.functions.text import token_count
        from oakstore_spark.operators.curation import (
            bigram_logprob,
            unigram_logprob,
        )

        def ttimed(name: str, fn) -> None:
            t0 = time.time()
            fn()
            dt = time.time() - t0
            out[name + "_sec"] = round(dt, 2)
            out[name + "_docs_per_sec"] = round(nt / dt)

        ttimed("text_token_stats", lambda: tdocs.agg(
            F.sum(token_count("text"))).collect())
        ttimed("text_unigram_lm", lambda: noop(unigram_logprob(tdocs)))
        ttimed("text_bigram_lm", lambda: noop(bigram_logprob(tdocs)))

        def novelty() -> None:
            ws = tdocs.select("doc_id", F.split("text", " ").alias("ws"))
            sh = ws.select(
                "doc_id",
                F.explode(F.expr(
                    "transform(slice(ws, 1, size(ws) - 4), (w, i) ->"
                    " concat_ws(' ', ws[i], ws[i+1], ws[i+2], ws[i+3], ws[i+4]))"
                )).alias("g"),
            ).distinct()
            fs = sh.groupBy("g").agg(F.min("doc_id").alias("fd"))
            noop(sh.join(fs, "g").groupBy("doc_id").agg(
                F.sum(F.when(F.col("fd") == F.col("doc_id"), 1).otherwise(0))))

        ttimed("text_ngram_novelty", novelty)
        out["text_docs"] = nt

    if args.spandocs:
        # span/ExactSubstr dedup at volume with PLANTED-SPAN recovery:
        # each doc is 24 globally-unique hash words (3 full 8-word
        # blocks); every 7th doc appends one shared 8-word boilerplate
        # block, block-aligned. The keeper rule (first occurrence by
        # packed (doc_id, block_idx)) must cut EXACTLY planted-1
        # blocks — digest-shuffle block algebra verified at volume, not
        # just fixture scale.
        from oakstore_spark.operators.dedup import span_dedup

        nsd = args.spandocs
        boiler = " ".join(f"spanmark{j}" for j in range(8))
        sdocs = spark.range(0, nsd, 1, 64).select(
            F.col("id").alias("doc_id"),
            F.concat_ws(
                " ",
                *[F.hex(F.hash(F.col("id") * 131 + k)) for k in range(24)],
                F.when(F.col("id") % 7 == 0, F.lit(boiler)),
            ).alias("text"),
        )
        sdocs.persist()
        sdocs.count()
        n_planted = (nsd + 6) // 7
        t0 = time.time()
        span_cut = span_dedup(sdocs).agg(
            F.sum(F.col("n_blocks") - F.col("n_kept"))
        ).first()[0]
        dt = time.time() - t0
        out["span_probe_docs"] = nsd
        out["span_probe_sec"] = round(dt, 2)
        out["span_probe_docs_per_sec"] = round(nsd / dt)
        out["span_planted_expected"] = n_planted - 1
        out["span_planted_cut"] = int(span_cut)
        if int(span_cut) != n_planted - 1:
            raise SystemExit(
                f"span_dedup planted recovery FAILED: cut {span_cut}, "
                f"expected {n_planted - 1}"
            )
        sdocs.unpersist()

    if args.linedocs:
        # corpus LINE dedup at volume with planted recovery: each doc
        # is 3 globally-unique hash-word lines; every 5th doc appends
        # one shared boilerplate line. Keep-first must cut EXACTLY
        # planted-1 line occurrences.
        from oakstore_spark.operators.dedup import line_dedup_corpus

        nl = args.linedocs
        ldocs = spark.range(0, nl, 1, 64).select(
            F.col("id").alias("doc_id"),
            F.concat_ws(
                "\n",
                *[F.hex(F.hash(F.col("id") * 257 + k)) for k in range(3)],
                F.when(
                    F.col("id") % 5 == 0,
                    F.lit("shared boilerplate navigation line"),
                ),
            ).alias("text"),
        )
        ldocs.persist()
        ldocs.count()
        n_planted = (nl + 4) // 5
        t0 = time.time()
        line_cut = line_dedup_corpus(ldocs).agg(
            F.sum(F.col("n_lines") - F.col("n_kept"))
        ).first()[0]
        dt = time.time() - t0
        out["line_probe_docs"] = nl
        out["line_probe_sec"] = round(dt, 2)
        out["line_probe_docs_per_sec"] = round(nl / dt)
        out["line_planted_expected"] = n_planted - 1
        out["line_planted_cut"] = int(line_cut)
        if int(line_cut) != n_planted - 1:
            raise SystemExit(
                f"line_dedup planted recovery FAILED: cut {line_cut}, "
                f"expected {n_planted - 1}"
            )
        ldocs.unpersist()

    if args.mediadocs:
        # multimodal decode family at volume: real MJPEG/JPEG + WAV
        # payloads generated worker-side, decoded through the
        # pure-Python codec rungs. Planted recovery: every 10th doc's
        # video is blank (both frames zero-variance) and every doc has
        # exactly one silent audio frame — the decode path must recover
        # both counts exactly or it is mangling pixels/samples at scale.
        from pyspark import StorageLevel

        from oakstore_spark.operators.multimodal import (
            audio_silence_stats,
            video_frame_luma,
        )

        nm = args.mediadocs

        def gen_media(batches):
            import numpy as _np
            import pandas as _pd

            from oakstore_spark.operators.multimodal import (
                encode_jpeg_baseline_gray,
                encode_mjpeg_avi,
                encode_wav_pcm16,
            )

            pat16 = _np.array([1, 0, -1, 0], dtype=_np.int64)
            for pdf in batches:
                rows = []
                for mid in pdf["id"]:
                    mid = int(mid)
                    frames = []
                    for i in range(2):
                        img = _np.zeros((16, 16), dtype=_np.uint8)
                        if mid % 10 == 0:  # planted BLANK
                            img[:, :] = (mid * 31 + i * 17) % 256
                        else:
                            for b in range(4):
                                by, bx = divmod(b, 2)
                                img[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = (
                                    mid * 31 + i * 17 + b * 11
                                ) % 256
                        frames.append(encode_jpeg_baseline_gray(img, 100))
                    avi = encode_mjpeg_avi(frames, 16, 16, 25)
                    amp = 200 + mid % 800
                    chunks = [
                        _np.zeros(64, dtype=_np.int16)
                        if (mid + i) % 3 == 0
                        else (amp * pat16[_np.arange(64) % 4]).astype(
                            _np.int16
                        )
                        for i in range(3)
                    ]
                    wav = encode_wav_pcm16(
                        _np.concatenate(chunks), 16000, 1
                    )
                    rows.append((mid, avi, wav))
                yield _pd.DataFrame(
                    rows, columns=["media_id", "video", "audio"]
                )

        media = spark.range(0, nm, 1, 64).mapInPandas(
            gen_media, "media_id long, video binary, audio binary"
        ).persist(StorageLevel.MEMORY_AND_DISK)
        media.count()  # generation billed here, not to the decode legs

        t0 = time.time()
        blank = video_frame_luma(
            media.select("media_id", F.col("video").alias("content"))
        ).agg(
            F.sum(F.when(F.col("std_luma") == 0.0, 1).otherwise(0))
        ).first()[0]
        dt = time.time() - t0
        want_blank = 2 * ((nm + 9) // 10)
        out["media_docs"] = nm
        out["video_decode_sec"] = round(dt, 2)
        out["video_decode_docs_per_sec"] = round(nm / dt)
        out["video_blank_frames"] = int(blank)
        if int(blank) != want_blank:
            raise SystemExit(
                f"video planted recovery FAILED: {blank} != {want_blank}"
            )

        t0 = time.time()
        silent = audio_silence_stats(
            media.select("media_id", F.col("audio").alias("content"))
        ).agg(F.sum("n_silent")).first()[0]
        dt = time.time() - t0
        out["audio_decode_sec"] = round(dt, 2)
        out["audio_decode_docs_per_sec"] = round(nm / dt)
        out["audio_silent_frames"] = int(silent)
        if int(silent) != nm:
            raise SystemExit(
                f"audio planted recovery FAILED: {silent} != {nm}"
            )
        media.unpersist()

        # image dedup at volume: one 32x32 PNG per doc from md5-noise
        # of an EFFECTIVE id (every 10th doc re-renders its
        # predecessor), pHash + hash groupBy must find EXACTLY the
        # planted pairs — the image-dedup path (decode -> DCT -> hash
        # -> shuffle on hash) measured end-to-end.
        from oakstore_spark.operators.multimodal import image_phash

        def gen_png(batches):
            import hashlib as _hashlib

            import numpy as _np
            import pandas as _pd

            from oakstore_spark.operators.multimodal import encode_gray_png

            for pdf in batches:
                rows = []
                for mid in pdf["id"]:
                    mid = int(mid)
                    eid = mid - 1 if mid % 10 == 9 else mid
                    buf = b"".join(
                        _hashlib.md5(f"{eid}:{i}".encode()).digest()
                        for i in range(64)
                    )
                    px = _np.frombuffer(buf, dtype=_np.uint8).reshape(32, 32)
                    rows.append((mid, encode_gray_png(px)))
                yield _pd.DataFrame(rows, columns=["media_id", "content"])

        imgs = spark.range(0, nm, 1, 64).mapInPandas(
            gen_png, "media_id long, content binary"
        ).persist(StorageLevel.MEMORY_AND_DISK)
        imgs.count()
        t0 = time.time()
        n_dup_groups = (
            image_phash(imgs)
            .groupBy("phash")
            .count()
            .where(F.col("count") > 1)
            .count()
        )
        dt = time.time() - t0
        want_groups = nm // 10  # one (10k+8, 10k+9) pair per decade
        out["image_phash_sec"] = round(dt, 2)
        out["image_phash_docs_per_sec"] = round(nm / dt)
        out["image_dup_groups"] = int(n_dup_groups)
        if int(n_dup_groups) != want_groups:
            raise SystemExit(
                f"phash planted recovery FAILED: {n_dup_groups} != "
                f"{want_groups}"
            )
        imgs.unpersist()


    if args.piidocs:
        # PII at volume: every doc carries an email; every 2nd an IPv4;
        # every 3rd a Luhn-VALID card; every 7th an invalid-card decoy.
        from oakstore_spark.operators.pii import detect_pii, redact_pii_all

        np_ = args.piidocs
        pdocs = spark.range(0, np_, 1, 64).select(
            F.col("id").alias("doc_id"),
            F.concat(
                F.lit("lorem words before user"),
                F.col("id").cast("string"),
                F.lit("@mail.test then "),
                F.when(F.col("id") % 2 == 0,
                       F.lit("10.0.0.7 pay ")).otherwise(
                       F.lit("999.0.0.7 pay ")),
                F.when(F.col("id") % 3 == 0,
                       F.lit("4532 0151 1283 0366 and ")).otherwise(F.lit("")),
                F.when(F.col("id") % 7 == 0,
                       F.lit("4532 0151 1283 0367 and ")).otherwise(F.lit("")),
                F.lit("tail text"),
            ).alias("text"),
        )
        pdocs.persist()
        pdocs.count()
        t0 = time.time()
        agg = detect_pii(pdocs, "text").agg(
            F.sum("n_emails"), F.sum("n_ipv4"), F.sum("n_cards_valid"),
            F.sum("n_card_candidates"),
        ).first()
        red_len = pdocs.select(
            F.sum(F.length(redact_pii_all("text")))
        ).first()[0]
        dt = time.time() - t0
        out["pii_probe_docs"] = np_
        out["pii_probe_sec"] = round(dt, 2)
        out["pii_probe_docs_per_sec"] = round(np_ / dt)
        exp = (np_, (np_ + 1) // 2, (np_ + 2) // 3,
               (np_ + 2) // 3 + (np_ + 6) // 7)
        if tuple(agg) != exp:
            raise SystemExit(f"pii planted recovery FAILED: {tuple(agg)} != {exp}")
        assert red_len and red_len > 0
        pdocs.unpersist()

    if args.urls:
        # URL canonicalization at volume: 50k registered domains, messy
        # casing/ports/trackers; the rollup must recover exactly 50k
        # (or n) distinct domains and page counts.
        from oakstore_spark.operators.urls import domain_stats

        nu = args.urls
        n_dom = min(50_000, nu)
        udocs = spark.range(0, nu, 1, 64).select(
            F.col("id").alias("doc_id"),
            F.concat(
                F.lit("HTTP://WWW.Host"),
                (F.col("id") % n_dom).cast("string"),
                F.lit(".COM:80/p/"),
                (F.col("id") % 97).cast("string"),
                F.lit("/?utm_source=x&q="),
                (F.col("id") % 13).cast("string"),
                F.lit("#frag"),
            ).alias("url"),
        )
        udocs.persist()
        udocs.count()
        t0 = time.time()
        st = domain_stats(udocs).agg(
            F.count(F.lit(1)), F.sum("n_pages"), F.sum("n_urls")
        ).first()
        dt = time.time() - t0
        out["url_probe_urls"] = nu
        out["url_probe_sec"] = round(dt, 2)
        out["url_probe_urls_per_sec"] = round(nu / dt)
        if st[0] != n_dom or st[1] != nu:
            raise SystemExit(
                f"url probe FAILED: {st[0]} domains/{st[1]} pages, "
                f"expected {n_dom}/{nu}"
            )
        udocs.unpersist()

    if args.edges:
        # PageRank at volume: ring over n/4 nodes plus hash chords to
        # reach the requested edge count; 10 damped iterations. Exact
        # invariant: total mass == 1 within 1e-9 (synchronous update
        # with dangling redistribution conserves mass by construction).
        from oakstore_spark.operators.graph import pagerank

        ne = args.edges
        n_nodes = max(ne // 4, 4)
        ring = spark.range(0, n_nodes, 1, 64).select(
            F.col("id").alias("src"),
            ((F.col("id") + 1) % n_nodes).alias("dst"),
        )
        chords = spark.range(0, ne - n_nodes, 1, 64).select(
            (F.abs(F.hash(F.col("id"))) % n_nodes).alias("src"),
            (F.abs(F.hash(F.col("id") * 31 + 7)) % n_nodes).alias("dst"),
        )
        g = ring.unionByName(chords)
        t0 = time.time()
        mass = pagerank(g, n_iterations=10, damping=0.85).agg(
            F.sum("rank")
        ).first()[0]
        dt = time.time() - t0
        out["pagerank_probe_edges"] = ne
        out["pagerank_probe_sec"] = round(dt, 2)
        out["pagerank_probe_edges_per_sec"] = round(ne / dt)
        out["pagerank_mass"] = float(mass)
        if abs(mass - 1.0) > 1e-9:
            raise SystemExit(f"pagerank mass not conserved: {mass}")

    if args.avrodocs:
        # the documented THROUGHPUT CEILING of the pure-Python Avro
        # interop path (per-row encode/decode; the JVM spark-avro path
        # replaces it wholesale when the jar is deployed)
        import shutil

        from oakstore_spark.sources.avro import read_avro, write_avro

        na = args.avrodocs
        adocs = spark.range(0, na, 1, 64).select(
            F.col("id").alias("doc_id"),
            (F.col("id") % 1000).cast("int").alias("grp"),
            (F.col("id") * 0.5).alias("score"),
            F.concat(F.lit("payload-"), F.col("id").cast("string")).alias(
                "text"
            ),
            F.array(F.col("id") * 1.0, F.col("id") * 2.0).alias("vec"),
        )
        adocs.persist()
        adocs.count()
        tmp = tempfile.mkdtemp(prefix="oak_avro_probe_")
        try:
            t0 = time.time()
            n_shards = write_avro(adocs, tmp)
            wdt = time.time() - t0
            t0 = time.time()
            got = read_avro(spark, tmp).agg(
                F.count(F.lit(1)), F.sum("doc_id")
            ).first()
            rdt = time.time() - t0
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
        out["avro_probe_docs"] = na
        out["avro_probe_shards"] = n_shards
        out["avro_probe_write_sec"] = round(wdt, 2)
        out["avro_probe_write_docs_per_sec"] = round(na / wdt)
        out["avro_probe_read_sec"] = round(rdt, 2)
        out["avro_probe_read_docs_per_sec"] = round(na / rdt)
        if got[0] != na or got[1] != na * (na - 1) // 2:
            raise SystemExit(
                f"avro probe FAILED: {tuple(got)} != "
                f"({na}, {na * (na - 1) // 2})"
            )
        adocs.unpersist()

    if args.hammingvecs:
        # memory-bound first-stage retrieval at scale: pack N 64-dim
        # vectors to 2 BIGINT words (32x compression), exact Hamming
        # top-10 for 8 probes via one corpus scan + window
        from oakstore_spark.operators.similarity import (
            binarize_embeddings,
            hamming_topk,
        )

        nv = args.hammingvecs
        vecs = spark.range(0, nv, 1, 64).select(
            F.col("id").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(0), F.lit(63)),
                lambda j: F.sin(F.col("id") * (j + 1) * 0.7)
                .cast("float"),
            ).alias("embedding"),
        )
        t0 = time.time()
        bits = binarize_embeddings(vecs, dim=64).persist()
        bits.count()
        pdt = time.time() - t0
        probes = bits.where(F.col("vec_id") < 8)
        t0 = time.time()
        got = hamming_topk(bits, probes, k=10).count()
        sdt = time.time() - t0
        bits.unpersist()
        out["hamming_probe_vecs"] = nv
        out["hamming_pack_sec"] = round(pdt, 2)
        out["hamming_pack_vecs_per_sec"] = round(nv / pdt)
        out["hamming_search_sec"] = round(sdt, 2)
        out["hamming_scan_vecs_per_sec"] = round(nv * 8 / sdt)
        if got != 80:
            raise SystemExit(f"hamming probe FAILED: {got} != 80")

    if args.ivfpqvecs:
        # the flagship billion-scale ANN shape (Jegou/FAISS IVFPQ):
        # build = coarse assign + residual PQ encode, one corpus scan,
        # cell-partitioned codes; search = ADC over probed cells ONLY.
        # The probe measures build/search rates, ASSERTS file-level
        # partition pruning (probed cells read a strict subset of the
        # code files), and computes recall@10 against an exact
        # distributed L2 brute force over the same queries.
        import shutil as _sh
        import tempfile as _tmp

        import numpy as np
        import pandas as pd
        from pyspark.sql import types as T

        from oakstore_spark.operators.similarity import (
            build_ivfpq_index,
            search_ivfpq_index,
        )

        nq_probe = args.ivfpqvecs
        # FAISS-standard geometry: 8-bit PQ codes (k=256), 8 subspaces
        # of 8 dims, 16/64 cells probed
        DIM, NQ, KQ, NPROBE, NCELLS = 64, 8, 10, 16, 64
        # planted tight neighborhoods: groups of 11 vectors share a
        # deterministic center with per-vector jitter 0.01 — each
        # vector's true top-10 IS its group, separated from everything
        # else by margins far above PQ quantization error. This
        # measures what matters at scale (does the probe+ADC pipeline
        # FIND the neighborhood?) instead of sub-quantization-noise
        # rank shuffling. Center coordinates come from a HASH of
        # (group, dim) — i.i.d.-looking points stay separated in 64-D
        # at any group count, where a sin(g*const) lattice is a 1-D
        # curve that gets DENSE at ~100k groups (measured: foreign
        # groups entered the exact top-10 and recall read 0.45 for a
        # pipeline that was finding every planted neighbor).
        grp = F.floor(F.col("id") / 11)
        vecs = spark.range(0, nq_probe, 1, 64).select(
            F.col("id").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(0), F.lit(DIM - 1)),
                lambda j: (
                    (F.hash((grp * 64 + j).cast("long")) % 1000) / 250.0
                    + F.sin((F.col("id") + 1) * (j + 13) * 1.3) * 0.01
                ).cast("float"),
            ).alias("embedding"),
        ).persist()
        vecs.count()
        d = _tmp.mkdtemp(prefix="oakspark_ivfpq_probe_")
        try:
            t0 = time.time()
            build_ivfpq_index(
                vecs, dim=DIM, index_dir=d, n_cells=NCELLS, m=8, k=256,
                sample_size=50_000,
            )
            bdt = time.time() - t0
            # queries = corpus vectors shifted OUT of the id domain so
            # the searcher's self-match exclusion can't hide them
            queries = vecs.where(F.col("vec_id") < NQ).select(
                (F.col("vec_id") + 10_000_000).alias("query_id"),
                "embedding",
            ).persist()
            queries.count()
            t0 = time.time()
            got = search_ivfpq_index(
                spark, d, queries, k_results=KQ, n_probe=NPROBE
            ).persist()
            n_res = got.count()
            sdt = time.time() - t0

            # file-level partition pruning: ONE query's probed cells
            # (<= NPROBE of NCELLS) must read strictly fewer code
            # files than the full index holds — the union across all 8
            # diverse queries can legitimately touch every cell
            q0 = int(min(r["query_id"] for r in got.select("query_id").distinct().collect()))
            probed_cells = [
                int(r["cell"])
                for r in got.where(F.col("query_id") == q0)
                .select("cell")
                .distinct()
                .collect()
            ]
            # inputFiles() reports the pre-pruning relation; measure
            # the files the EXECUTED scan actually touches instead
            codes = spark.read.parquet(f"{d}/codes")
            all_files = set(
                r[0]
                for r in codes.select(F.input_file_name()).distinct().collect()
            )
            pruned_files = set(
                r[0]
                for r in codes.where(F.col("_cell").isin(probed_cells))
                .select(F.input_file_name())
                .distinct()
                .collect()
            )
            if not pruned_files < all_files:
                raise SystemExit(
                    f"ivfpq probe FAILED pruning: {len(pruned_files)} "
                    f"files read of {len(all_files)} total"
                )

            # exact L2 ground truth, distributed: broadcast the 8
            # query vectors, each Arrow batch emits its local top-k,
            # one final per-query sort of <= batches*k rows
            q_rows = queries.collect()
            qids = np.asarray([int(r["query_id"]) for r in q_rows])
            qmat = np.stack(
                [np.asarray(r["embedding"], dtype=np.float64) for r in q_rows]
            )
            bc_q = spark.sparkContext.broadcast((qids, qmat))
            gt_schema = T.StructType(
                [
                    T.StructField("query_id", T.LongType()),
                    T.StructField("vec_id", T.LongType()),
                    T.StructField("dist", T.DoubleType()),
                ]
            )

            def _gt_kernel(batches):
                ids_q, Q = bc_q.value
                for pdf in batches:
                    if not len(pdf):
                        continue
                    X = np.stack(
                        [np.asarray(v, dtype=np.float64) for v in pdf["embedding"]]
                    )
                    ids_x = pdf["vec_id"].to_numpy()
                    d2 = (
                        (Q * Q).sum(1)[:, None]
                        - 2.0 * (Q @ X.T)
                        + (X * X).sum(1)[None, :]
                    )
                    rows = {"query_id": [], "vec_id": [], "dist": []}
                    for qi in range(len(ids_q)):
                        top = np.argsort(d2[qi])[:KQ]
                        rows["query_id"].extend([ids_q[qi]] * len(top))
                        rows["vec_id"].extend(ids_x[top])
                        rows["dist"].extend(d2[qi][top])
                    yield pd.DataFrame(rows)

            from pyspark.sql import Window

            w = Window.partitionBy("query_id").orderBy(
                F.asc("dist"), F.asc("vec_id")
            )
            gt = (
                vecs.mapInPandas(_gt_kernel, gt_schema)
                .withColumn("rank", F.row_number().over(w))
                .where(F.col("rank") <= KQ)
                .collect()
            )
            gt_sets: dict = {}
            for r in gt:
                gt_sets.setdefault(int(r["query_id"]), set()).add(
                    int(r["vec_id"])
                )
            got_sets: dict = {}
            for r in got.collect():
                got_sets.setdefault(int(r["query_id"]), set()).add(
                    int(r["vec_id"])
                )
            recalls = [
                len(gt_sets[q] & got_sets.get(q, set())) / KQ
                for q in gt_sets
            ]
            recall = sum(recalls) / len(recalls)
            got.unpersist()
            queries.unpersist()
            out["ivfpq_probe_vecs"] = nq_probe
            out["ivfpq_build_sec"] = round(bdt, 2)
            out["ivfpq_build_vecs_per_sec"] = round(nq_probe / bdt)
            out["ivfpq_search_sec"] = round(sdt, 2)
            out["ivfpq_codes_files_total"] = len(all_files)
            out["ivfpq_codes_files_probed"] = len(pruned_files)
            out["ivfpq_recall_at_10"] = round(recall, 3)
            if n_res != NQ * KQ:
                raise SystemExit(
                    f"ivfpq probe FAILED: {n_res} results != {NQ * KQ}"
                )
            if recall < 0.8:
                raise SystemExit(
                    f"ivfpq probe FAILED recall: {recall:.3f} < 0.8"
                )
        finally:
            _sh.rmtree(d, ignore_errors=True)
            vecs.unpersist()

    if args.containdocs:
        # containment dedup SPARSE path at volume: unique docs +
        # planted contained pairs; candidate generation must stay
        # linear (rare-gram prefixes), recovery exact
        from oakstore_spark.operators.dedup import containment_pairs

        nc = args.containdocs
        n_pairs = max(nc // 100, 10)
        base = spark.range(0, nc, 1, 64).select(
            F.col("id").alias("doc_id"),
            F.concat(
                F.lit("unique document "),
                F.col("id").cast("string"),
                F.lit(" body segment "),
                (F.col("id") * 2_654_435_761 % 1_000_003).cast("string"),
                F.lit(" tail "),
                (F.col("id") * 40_503 % 999_983).cast("string"),
            ).alias("text"),
        )
        # planted: doc nc+i CONTAINS doc i's text plus filler
        contained = spark.range(0, n_pairs, 1, 8).select(
            (F.col("id") + nc).alias("doc_id"),
            F.concat(
                F.lit("unique document "),
                F.col("id").cast("string"),
                F.lit(" body segment "),
                (F.col("id") * 2_654_435_761 % 1_000_003).cast("string"),
                F.lit(" tail "),
                (F.col("id") * 40_503 % 999_983).cast("string"),
                F.lit(" plus wholly novel appended filler text "),
                F.col("id").cast("string"),
            ).alias("text"),
        )
        corpus = base.unionByName(contained)
        t0 = time.time()
        pairs = containment_pairs(
            corpus, "doc_id", "text", threshold=0.9, shingle_n=4
        )
        found = pairs.where(
            F.col("id_b") == F.col("id_a") + nc
        ).count()
        total = pairs.count()
        cdt = time.time() - t0
        out["contain_probe_docs"] = nc + n_pairs
        out["contain_probe_sec"] = round(cdt, 2)
        out["contain_probe_docs_per_sec"] = round((nc + n_pairs) / cdt)
        out["contain_probe_planted"] = n_pairs
        out["contain_probe_found_planted"] = found
        out["contain_probe_total_pairs"] = total
        if found != n_pairs:
            raise SystemExit(
                f"containment probe FAILED: {found} != {n_pairs}"
            )

    if args.editdocs:
        # entity-resolution shape: records = vocabulary words + a
        # UNIQUE field (the realistic case — real records carry ids /
        # house numbers whose grams are globally rare, which is
        # exactly what the rarity-prefix candidate filter keys on).
        # Planted: every 100th record gets a 1-substitution variant
        # ('z' never appears in the base alphabet, so distance is
        # exactly 1); the probe asserts exact planted recovery.
        from oakstore_spark.operators.dedup import edit_distance_pairs

        ne = args.editdocs
        n_pairs = max(ne // 100, 10)
        # md5-derived tokens: vocabulary words AND the unique field are
        # hex strings, so two different tokens differ in many chars —
        # distinct records are far apart (numeric tokens like
        # 'w123'/'w124' would be 1 edit apart and flood the relation
        # with real-but-unintended pairs: measured 6.5M at 300k docs)
        w1 = F.substring(
            F.md5(F.concat(F.lit("w"), (F.col("id") * 7919 % 5000).cast("string"))),
            1, 6,
        )
        w2 = F.substring(
            F.md5(F.concat(F.lit("v"), (F.col("id") * 104729 % 5000).cast("string"))),
            1, 6,
        )
        uniq = F.substring(F.md5(F.col("id").cast("string")), 1, 10)
        base_txt = F.concat(
            F.lit("entity "), w1, F.lit(" "), w2, F.lit(" no "), uniq
        )
        recs = spark.range(0, ne, 1, 64).select(
            F.col("id").alias("doc_id"), base_txt.alias("text")
        )
        variants = spark.range(0, n_pairs, 1, 8).select(
            (F.col("id") + ne).alias("doc_id"),
            F.concat(
                F.lit("zntity "), w1, F.lit(" "), w2, F.lit(" no "), uniq
            ).alias("text"),
        )
        corpus = recs.unionByName(variants)
        t0 = time.time()
        pairs = edit_distance_pairs(corpus, "doc_id", "text", 2)
        found = pairs.where(
            (F.col("id_b") == F.col("id_a") + ne)
            & (F.col("edit_dist") == 1)
        ).count()
        total = pairs.count()
        edt = time.time() - t0
        out["edit_probe_docs"] = ne + n_pairs
        out["edit_probe_sec"] = round(edt, 2)
        out["edit_probe_docs_per_sec"] = round((ne + n_pairs) / edt)
        out["edit_probe_found_planted"] = found
        out["edit_probe_total_pairs"] = total
        if found != n_pairs:
            raise SystemExit(
                f"edit probe FAILED: {found} != {n_pairs}"
            )

    if args.warcdocs:
        # WARC interop-path throughput: per-record gzip members
        # (Common Crawl layout) through the foreachPartition writer
        # and the binaryFile + Arrow-batched parser. Python-side by
        # nature (the container format is bytes, not columns) — this
        # probe pins the measured ceiling in SCALING.md.
        import shutil

        from oakstore_spark.sources.warc import read_warc, write_warc

        nw = args.warcdocs
        wdocs = spark.range(0, nw, 1, 64).select(
            F.concat(F.lit("urn:p:"), F.col("id").cast("string")).alias(
                "record_id"
            ),
            F.lit("resource").alias("warc_type"),
            F.concat(F.lit("http://probe.test/"), F.col("id").cast("string"))
            .alias("target_uri"),
            (F.col("id") * 1_000_000).alias("warc_date_us"),
            F.lit("text/plain").alias("content_type"),
            F.encode(
                F.concat(F.lit("payload-"), F.col("id").cast("string")),
                "utf-8",
            ).alias("payload"),
        )
        wdocs.persist()
        wdocs.count()
        tmp = tempfile.mkdtemp(prefix="oak_warc_probe_")
        try:
            t0 = time.time()
            n_shards = write_warc(wdocs, tmp, compress=True)
            wdt = time.time() - t0
            t0 = time.time()
            got = read_warc(spark, tmp).agg(
                F.count(F.lit(1)), F.sum("content_length")
            ).first()
            rdt = time.time() - t0
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
        out["warc_probe_docs"] = nw
        out["warc_probe_shards"] = n_shards
        out["warc_probe_write_sec"] = round(wdt, 2)
        out["warc_probe_write_docs_per_sec"] = round(nw / wdt)
        out["warc_probe_read_sec"] = round(rdt, 2)
        out["warc_probe_read_docs_per_sec"] = round(nw / rdt)
        exp_len = sum(len(f"payload-{i}") for i in range(nw))
        if got[0] != nw or got[1] != exp_len:
            raise SystemExit(
                f"warc probe FAILED: {tuple(got)} != ({nw}, {exp_len})"
            )
        wdocs.unpersist()

    if args.cliquegraph:
        # union of disjoint 32-cliques (closed-form: C(31,2) triangles
        # per node, per-clique C(32,3)) plus a pendant 8-node chain off
        # every clique (degree-2 fodder the k-core peel must cascade
        # away).  Worst-case density for the degree-oriented counter —
        # every oriented out-neighborhood is as large as it can be.
        from oakstore_spark.operators.graph import k_core, triangle_stats

        m = 32
        per_clique = m * (m - 1) // 2 + 8
        n_cliques = max(args.cliquegraph // per_clique, 1)
        cl = spark.range(0, n_cliques, 1, 32)
        pairs = [
            (a, bb) for a in range(m) for bb in range(a + 1, m)
        ]
        pair_arr = F.array(*[
            F.struct(F.lit(a).alias("a"), F.lit(bb).alias("b"))
            for a, bb in pairs
        ])
        clique_edges = cl.select(
            (F.col("id") * 1000).alias("base"),
            F.explode(pair_arr).alias("p"),
        ).select(
            (F.col("base") + F.col("p.a")).alias("src"),
            (F.col("base") + F.col("p.b")).alias("dst"),
        )
        chain_arr = F.array(*[
            F.struct(F.lit(i).alias("a"), F.lit(i + 1).alias("b"))
            for i in range(m - 1, m + 7)
        ])
        chain_edges = cl.select(
            (F.col("id") * 1000).alias("base"),
            F.explode(chain_arr).alias("p"),
        ).select(
            (F.col("base") + F.col("p.a")).alias("src"),
            (F.col("base") + F.col("p.b")).alias("dst"),
        )
        edges = clique_edges.unionByName(chain_edges)
        n_edges = n_cliques * per_clique
        t0 = time.time()
        tri = triangle_stats(edges)
        total_tri = tri.agg(
            (F.sum("n_triangles") / 3).cast("bigint")
        ).collect()[0][0]
        dt = time.time() - t0
        want_tri = n_cliques * (m * (m - 1) * (m - 2) // 6)
        print(
            f"triangles: {n_edges} edges ({n_cliques} cliques) in "
            f"{dt:.1f}s = {n_edges / dt / 1000:.0f}k edges/s; "
            f"{total_tri} triangles (want {want_tri})"
        )
        if total_tri != want_tri:
            raise SystemExit("triangle probe FAILED")
        t0 = time.time()
        core = k_core(edges, m - 1)
        n_core = core.count()
        dt2 = time.time() - t0
        print(
            f"k-core(k={m - 1}): {n_core} nodes in {dt2:.1f}s "
            f"(want {n_cliques * m}; chains peeled over 8 rounds)"
        )
        if n_core != n_cliques * m:
            raise SystemExit("k-core probe FAILED")

    if args.baskets:
        # market-basket shape: nb baskets x 6 items drawn from a 10k
        # universe (every random item's support ~6e-4·nb — far below
        # any sane min-support, so the Apriori singleton prune must
        # remove the ENTIRE random universe before pair generation);
        # every 50th basket also holds the planted hot pair, the only
        # pair that may survive at min_support 1%.
        from oakstore_spark.operators.affinity import association_rules

        nb = args.baskets
        base = spark.range(0, nb, 1, 64)
        item = lambda k: F.substring(
            F.md5(((F.col("id") * k) % 10000).cast("string")), 1, 8
        )
        arr = F.array(*[item(k) for k in (7919, 104729, 15485863,
                                          32452843, 49979687, 67867967)])
        plain = base.select(
            F.col("id").alias("b"), F.explode(arr).alias("i")
        )
        hot = base.where(F.col("id") % 50 == 0).select(
            "id", F.explode(F.array(F.lit("HOTA"), F.lit("HOTB"))).alias("i")
        ).select(F.col("id").alias("b"), "i")
        corpus = plain.unionByName(hot)
        t0 = time.time()
        rules = association_rules(corpus, "b", "i", min_support=0.01)
        got = rules.collect()
        dt = time.time() - t0
        hot_rules = [r for r in got
                     if {r.antecedent, r.consequent} == {"HOTA", "HOTB"}]
        print(
            f"affinity: {nb} baskets ({nb * 6 + 2 * (nb // 50)} item rows) "
            f"in {dt:.1f}s = {nb / dt / 1000:.1f}k baskets/s; "
            f"{len(got)} rules, planted pair support "
            f"{hot_rules[0].n_ab if hot_rules else 0}"
        )
        if len(hot_rules) != 2 or len(got) != 2:
            raise SystemExit(
                f"affinity probe FAILED: {len(got)} rules, "
                f"{len(hot_rules)} planted (want 2/2 — the prune must "
                f"remove every random pair)"
            )
        expect = (nb + 49) // 50
        if hot_rules[0].n_ab != expect:
            raise SystemExit(
                f"affinity probe FAILED: support {hot_rules[0].n_ab} "
                f"!= planted {expect}"
            )

    if args.lpagraph:
        # community/CC probe: nc disjoint 64-cliques (2016 edges each)
        # chained by single bridges. LPA (distributed, 4 fixed rounds)
        # must recover EVERY planted community exactly (bridges are
        # 1-vs-63 minorities); CC (driver pointer-jumping path — the
        # realistic gate for a bridge-chained graph whose diameter is
        # 2x the clique count) must read ONE component.
        ne = args.lpagraph
        nc = max(2, ne // 2016)
        cl = spark.range(nc).select(F.col("id").alias("c"))
        pairs = (
            spark.range(64).select(F.col("id").alias("i"))
            .crossJoin(spark.range(64).select(F.col("id").alias("j")))
            .where("i < j")
        )
        ce = cl.crossJoin(pairs).select(
            (F.col("c") * 64 + F.col("i")).alias("src"),
            (F.col("c") * 64 + F.col("j")).alias("dst"),
        )
        bridges = spark.range(nc - 1).select(
            (F.col("id") * 64 + 63).alias("src"),
            ((F.col("id") + 1) * 64).alias("dst"),
        )
        gedges = ce.unionByName(bridges).persist()
        n_e = gedges.count()
        out["lpa_graph_edges"] = float(n_e)

        from oakstore_spark.operators.graph import (
            connected_components,
            label_propagation,
        )

        t0 = time.time()
        lpa = label_propagation(gedges, n_rounds=4)
        bad = lpa.where(
            F.col("community") != F.col("node") - F.col("node") % 64
        ).count()
        dt = time.time() - t0
        out["lpa_sec"] = round(dt, 2)
        out["lpa_edges_per_sec"] = round(n_e / dt)
        assert bad == 0, f"LPA missed {bad} nodes"

        t0 = time.time()
        cc = connected_components(gedges)
        ncomp = cc.select("component_id").distinct().count()
        nnodes = cc.count()
        dt = time.time() - t0
        out["cc_sec"] = round(dt, 2)
        out["cc_edges_per_sec"] = round(n_e / dt)
        assert ncomp == 1 and nnodes == nc * 64, (ncomp, nnodes)
        gedges.unpersist()

    if args.rakedocs:
        # RAKE at volume: the phrase-split regex passes + the
        # (doc, word) stats aggregate + the fold join are the cost; the
        # vocab plants stopwords every few positions so candidate
        # phrases are realistic 1-4-word runs, not 40-word lines
        nr = args.rakedocs
        rvocab = [f"kw{i:02d}" for i in range(60)] + [
            "the", "of", "and", "in",
        ]
        rarr = F.array(*[F.lit(w) for w in rvocab])
        rdocs = spark.range(0, nr, 1, 64).select(
            F.col("id").alias("doc_id"),
            F.concat_ws(
                " ",
                *[
                    F.element_at(
                        rarr,
                        (
                            F.pmod(
                                F.hash(F.col("id") * 131 + k),
                                F.lit(len(rvocab)),
                            )
                            + 1
                        ).cast("int"),
                    )
                    for k in range(40)
                ],
            ).alias("text"),
        )
        rdocs.persist()
        rdocs.count()
        from oakstore_spark.operators.text import rake_keywords

        t0 = time.time()
        rk = rake_keywords(rdocs, "doc_id", "text", top_k=5)
        noop(rk)
        dt = time.time() - t0
        out["rake_sec"] = round(dt, 2)
        out["rake_docs_per_sec"] = round(nr / dt)
        sanity = rk.agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("doc_id").alias("nd"),
            F.min("score").alias("smin"),
            F.max("rank").alias("rmax"),
        ).collect()[0]
        assert sanity["nd"] == nr and sanity["rmax"] <= 5
        assert sanity["smin"] > 0
        out["rake_rows"] = float(sanity["n"])
        rdocs.unpersist()

    if args.evalrows:
        # Forecaster + model-eval at volume. The AR series is the
        # EXACT period-6 oscillator per key (y = m_k + s_k * p[t%6],
        # p_t = p_{t-1} - p_{t-2}), so every key's lagged OLS must
        # recover (c, a1, a2) = (m_k, 1, -1) exactly — a 10k-key
        # distributed assertion, not a spot check.
        ne = args.evalrows
        n_keys = 10_000
        per_key = max(ne // n_keys, 12)
        period = [1, 2, 1, -1, -2, -1]
        parr = F.array(*[F.lit(v) for v in period])
        series = spark.range(0, n_keys * per_key, 1, 64).select(
            (F.col("id") % n_keys).alias("k"),
            (F.col("id") / n_keys).cast("bigint").alias("t"),
        ).select(
            "k",
            "t",
            (
                (F.col("k") % 97)
                + (F.col("k") % 7 + 1)
                * F.element_at(
                    parr, (F.col("t") % 6).cast("int") + 1
                )
            ).alias("y"),
        )
        series.persist()
        series.count()
        from oakstore_spark.operators.timeseries import ar_forecast

        t0 = time.time()
        arf = ar_forecast(series, "t", ["k"], "y")
        # at 2000 rows/key the Cramer determinant products exceed
        # 2^53, so recovery is float-tolerance here (the 24-row
        # pytest pins the bit-exact integer-determinant regime)
        tol = 1e-6
        bad = arf.where(
            (F.abs(F.col("a1") - 1.0) > tol)
            | (F.abs(F.col("a2") + 1.0) > tol)
            | (
                F.abs(F.col("c") - (F.col("k") % 97).cast("double"))
                > tol
            )
        ).count()
        dt = time.time() - t0
        out["ar_sec"] = round(dt, 2)
        out["ar_rows_per_sec"] = round(n_keys * per_key / dt)
        assert bad == 0, f"{bad} keys failed AR(2) recovery"
        series.unpersist()

        # model eval: planted score-label association (label noisy
        # below score 500, certain above) through the full family
        units = spark.range(0, ne, 1, 64).select(
            F.pmod(F.hash("id"), F.lit(1001)).cast("bigint").alias(
                "score_m"
            ),
            F.col("id").alias("uid"),
        ).select(
            "score_m",
            F.when(F.col("score_m") >= 500, 1)
            .otherwise((F.col("uid") % 5 == 0).cast("int"))
            .cast("bigint")
            .alias("y"),
        )
        units.persist()
        units.count()
        from oakstore_spark.operators.quality import (
            calibration_report,
            pr_curve,
            roc_auc,
        )

        t0 = time.time()
        auc = roc_auc(units, "score_m", "y").collect()[0]
        pr = pr_curve(
            units, "score_m", "y", [100, 300, 500, 700, 900]
        ).count()
        cal = calibration_report(units, "score_m", "y").collect()
        dt = time.time() - t0
        out["eval_sec"] = round(dt, 2)
        out["eval_rows_per_sec"] = round(3 * ne / dt)
        assert 0.85 < auc.auc < 1.0 and pr == 5
        brier = sum(r.brier_contrib for r in cal)
        assert 0.0 < brier < 0.5
        out["eval_auc"] = round(float(auc.auc), 4)
        units.unpersist()

    if args.rankrows:
        # qini over N units: the global (score desc, id) rank rides
        # assign_contiguous_ids (range exchange + offsets — the r12
        # fix), and with N divisible by n_buckets the per-bucket
        # membership count is exactly d*N/10, asserted for every d.
        nq = args.rankrows - args.rankrows % 10
        from oakstore_spark.operators.experiments import qini_curve

        units = spark.range(0, nq, 1, 64).select(
            F.col("id").alias("uid"),
            (F.col("id") % 2).alias("arm"),
            F.pmod(F.hash("id"), F.lit(1_000_000)).alias("score"),
            (F.pmod(F.hash(F.col("id") * 7), F.lit(100)) < 20)
            .cast("bigint")
            .alias("y"),
        )
        units.persist()
        units.count()
        t0 = time.time()
        curve = qini_curve(
            units, "score", "arm", "y", "uid", treated=1
        ).collect()
        dt = time.time() - t0
        out["qini_sec"] = round(dt, 2)
        out["qini_rows_per_sec"] = round(nq / dt)
        for r in sorted(curve, key=lambda r: r.bucket):
            assert r.n_t + r.n_c == r.bucket * nq // 10, r
        units.unpersist()

        # mmr over a RAW 1M-vector corpus: stage 1 must survive as
        # TakeOrderedAndProject (no SinglePartition funnel) — wall
        # time is the proof; the result is sanity-checked only
        # (planted best match must rank 1)
        nv = 1_000_000
        dim = 16
        from oakstore_spark.operators.similarity import mmr_topk

        vec = F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda d: (
                F.pmod(F.hash(F.col("id") * 31 + d), F.lit(1000))
                / 1000.0
            ),
        )
        emb = spark.range(0, nv, 1, 64).select(
            F.col("id").alias("vec_id"),
            vec.cast("array<float>").alias("embedding"),
        )
        emb.persist()
        emb.count()
        t0 = time.time()
        picks = mmr_topk(
            emb, query_id=0, k=5, n_candidates=64
        ).collect()
        dt = time.time() - t0
        out["mmr_sec"] = round(dt, 2)
        out["mmr_vecs_per_sec"] = round(nv / dt)
        assert len(picks) == 5 and picks[0].rank == 1
        emb.unpersist()

    if args.ssspnodes:
        # Binary-jump graph: node v -> (v + 2^j) mod 2^m, weight 1.
        # The only way to move is +2^j, so the shortest path to v from
        # 0 uses exactly popcount(v) edges — a closed form over EVERY
        # node, at a diameter (m) small enough that Bellman-Ford's
        # per-round join cost, not round count, is what's measured.
        import math as _math

        from oakstore_spark.operators.graph import shortest_paths

        m = max(2, int(_math.log2(args.ssspnodes)))
        nn = 2 ** m
        edges = (
            spark.range(0, nn, 1, 64)
            .select(
                F.col("id").alias("src"),
                F.explode(
                    F.array(*[F.lit(1 << j) for j in range(m)])
                ).alias("jump"),
            )
            .select(
                "src",
                ((F.col("src") + F.col("jump")) % nn).alias("dst"),
                F.lit(1.0).alias("weight"),
            )
        )
        t0 = time.time()
        dist = shortest_paths(
            edges, source=0, n_rounds=m, detect_negative_cycle=True
        )
        bad = (
            dist.where(
                F.col("dist") != F.bit_count(F.col("node")).cast("double")
            ).count()
        )
        reached = dist.count()
        dt = time.time() - t0
        out["sssp_sec"] = round(dt, 2)
        out["sssp_edges_per_sec"] = round(nn * m / dt)
        assert bad == 0, f"{bad} nodes off the popcount closed form"
        assert reached == nn
        out["sssp_nodes"] = nn
        out["sssp_edges"] = nn * m

    if args.topicdocs:
        # Topic hard-EM at volume: the corpus collapses once to the
        # vocab-bounded (doc, word, n) relation; each round is one
        # broadcast join + one k-sum hash aggregate + one BIGINT
        # (topic, word) aggregate back — nothing driver-side grows
        # with doc count, which is what the wall time evidences.
        nd = args.topicdocs
        from oakstore_spark.operators.text import train_topics

        vocabs = [
            ["apple", "pear", "plum", "grape", "melon", "fig"],
            ["circuit", "volt", "diode", "resistor", "anode", "relay"],
            ["sonnet", "stanza", "meter", "rhyme", "verse", "ode"],
            ["tensor", "gradient", "epoch", "batch", "layer", "loss"],
        ]
        flat = [w for v in vocabs for w in v]
        words_arr = F.array(*[F.lit(w) for w in flat])
        word_j = lambda j: F.element_at(  # noqa: E731
            words_arr,
            (
                (F.col("id") % 4) * 6
                + F.pmod(F.hash(F.col("id") * 23 + j), F.lit(6))
                + 1
            ).cast("int"),
        )
        docs = spark.range(0, nd, 1, 64).select(
            F.col("id").alias("doc_id"),
            F.concat_ws(
                " ", *[word_j(j) for j in range(20)]
            ).alias("text"),
        )
        docs.persist()
        docs.count()
        t0 = time.time()
        topics, assign = train_topics(
            docs, "text", "doc_id", k=4, n_iters=3, vocab_size=64,
            return_assignments=True,
        )
        pairs = (
            assign.withColumn("plant", F.col("doc") % 4)
            .groupBy("topic", "plant")
            .count()
            .collect()
        )
        dt = time.time() - t0
        out["topics_sec"] = round(dt, 2)
        out["topics_docs_per_sec"] = round(nd / dt)
        # exact partition recovery: each learned topic maps to ONE
        # planted vocabulary and all four plants are distinguished
        mapping = {}
        for r in pairs:
            mapping.setdefault(r["topic"], set()).add(r["plant"])
        assert all(len(v) == 1 for v in mapping.values()), mapping
        assert len({next(iter(v)) for v in mapping.values()}) == 4
        docs.unpersist()

    if args.embeddocs:
        # doc_embed at volume: two hash aggregates + one broadcast
        # weight join + one per-doc Arrow int64 gemm — nothing
        # driver-side grows with doc count.  Planted proof: exact-twin
        # texts must produce bit-identical integer vectors through the
        # whole chain (tokenize -> md5 buckets -> rational idf -> JL).
        ne = args.embeddocs
        from oakstore_spark.operators.text import doc_embed

        def probe_text(idc):
            return F.concat_ws(
                " ",
                *[
                    F.concat(
                        F.lit("w"),
                        F.pmod(
                            F.hash(idc * 31 + j), F.lit(4096)
                        ).cast("string"),
                    )
                    for j in range(30)
                ],
            )

        base = spark.range(0, ne, 1, 64).select(
            F.col("id").alias("doc_id"),
            probe_text(F.col("id")).alias("text"),
        )
        twins = (
            spark.range(0, ne, 10, 64)
            .select(
                (F.col("id") + ne).alias("doc_id"),
                probe_text(F.col("id")).alias("text"),
            )
        )
        corpus = base.unionByName(twins).persist()
        n_corpus = corpus.count()
        t0 = time.time()
        emb = doc_embed(corpus, dim=16, n_buckets=1024)
        dig = emb.select(
            "doc_id",
            F.md5(
                F.concat_ws(
                    ",",
                    F.transform(
                        "emb_q", lambda v: v.cast("string")
                    ),
                )
            ).alias("dg"),
        )
        a = dig.where(F.col("doc_id") >= ne).select(
            (F.col("doc_id") - ne).alias("doc_id"),
            F.col("dg").alias("da"),
        )
        matches = (
            a.join(dig.where(F.col("doc_id") < ne), "doc_id")
            .where(F.col("da") == F.col("dg"))
            .count()
        )
        dt = time.time() - t0
        out["doc_embed_sec"] = round(dt, 2)
        out["doc_embed_docs_per_sec"] = round(n_corpus / dt)
        expected = len(range(0, ne, 10))
        assert matches == expected, (matches, expected)
        corpus.unpersist()

    if args.streamrows:
        # Structured Streaming at volume: watermarked tumbling-window
        # counts over a multi-file availableNow source — the measured
        # point for SCALING.md's "streaming state is watermark-bounded"
        # claim (state rows = live windows x keys, never input rows).
        import shutil

        ns = args.streamrows
        sdir = tempfile.mkdtemp(prefix="oak_probe_stream_")
        src = f"{sdir}/src"
        ckpt = f"{sdir}/ckpt"
        outp = f"{sdir}/out"
        # 1000 users, 10 ms event spacing -> ~60 events per
        # (10-min window, user) group, so the probe exercises the
        # map-side partial agg + bounded state, not a degenerate
        # one-row-per-group shape
        (
            spark.range(0, ns, 1, 64)
            .select(
                F.col("id").alias("event_id"),
                (F.col("id") % 1_000).alias("user_id"),
                F.timestamp_micros(
                    F.lit(1_700_000_000_000_000) + F.col("id") * 10_000
                ).alias("ts"),
            )
            .write.mode("overwrite")
            .parquet(src)
        )
        stream = spark.readStream.schema(
            "event_id long, user_id long, ts timestamp"
        ).option("maxFilesPerTrigger", 16).parquet(src)
        agg = (
            stream.withWatermark("ts", "1 hour")
            .groupBy(F.window("ts", "10 minutes"), "user_id")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        t0 = time.time()
        q = (
            agg.writeStream.outputMode("append")
            .format("parquet")
            .option("path", outp)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        dt = time.time() - t0
        emitted = spark.read.parquet(outp).count()
        out["stream_rows"] = ns
        out["stream_window_agg_sec"] = round(dt, 2)
        out["stream_rows_per_sec"] = round(ns / dt)
        out["stream_windows_emitted"] = int(emitted)
        shutil.rmtree(sdir, ignore_errors=True)

    if args.vecs:
        from oakstore_spark.operators.similarity import (
            cosine_topk,
            ivf_cosine_topk,
        )

        nv, dim = args.vecs, 64
        # clustered vectors (1000 centers + 20% noise): embedding spaces
        # ARE clustered — uniform random vectors are IVF's degenerate
        # worst case (neighbors scatter over all cells) and measure
        # nothing realistic.
        cluster = F.col("id") % 1000
        vecs = spark.range(0, nv, 1, 64).select(
            F.col("id").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda j: (
                    (F.hash(cluster * 13 + j) % 1000 / 500.0 - 1.0)
                    + (F.hash(F.col("id") * 97 + j) % 1000 / 2500.0 - 0.2)
                ).cast("float"),
            ).alias("embedding"),
        )
        vecs.persist()
        vecs.count()
        qs = vecs.where(F.col("vec_id") % (nv // 100) == 0).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        qs.persist()
        nq = qs.count()
        t0 = time.time()
        approx = ivf_cosine_topk(
            vecs, qs, k=10, dim=dim, n_centroids=256, n_probe=16
        )
        approx_rows = approx.collect()
        dt = time.time() - t0
        out["ann_vecs"] = nv
        out["ann_queries"] = nq
        out["ann_ivf_sec"] = round(dt, 2)
        t0 = time.time()
        exact_rows = cosine_topk(vecs, qs, k=10).collect()
        out["ann_brute_sec"] = round(time.time() - t0, 2)
        exact = {}
        for r in exact_rows:
            exact.setdefault(r["query_id"], set()).add(r["vec_id"])
        hits = tot = 0
        for r in approx_rows:
            if r["vec_id"] in exact.get(r["query_id"], set()):
                hits += 1
        tot = sum(len(v) for v in exact.values())
        out["ann_recall_at_10"] = round(hits / tot, 4) if tot else None

        # contrastive mining at the same volume: one corpus scan for
        # both legs (positives + hard negatives) over labeled vectors
        from oakstore_spark.operators.similarity import contrastive_pairs

        labeled = vecs.withColumn("label", (F.col("vec_id") % 1000).cast("int"))
        lq = labeled.where(F.col("vec_id") % (nv // 100) == 0).select(
            F.col("vec_id").alias("query_id"), "embedding", "label"
        )
        t0 = time.time()
        n_mined = contrastive_pairs(labeled, lq).count()
        out["contrastive_sec"] = round(time.time() - t0, 2)
        out["contrastive_pairs"] = int(n_mined)

    if args.rebalancevecs:
        from oakstore_spark.operators.similarity import (
            add_to_ivf_index,
            build_ivf_index,
            cosine_topk,
            rebalance_ivf_index,
            search_ivf_index,
        )

        nv, dim = args.rebalancevecs, 64
        half = nv // 2
        # phase A: 500 clusters in one region of the hash space;
        # phase B (DRIFT): 500 new clusters under a different hash
        # seed, added against A's frozen quantizer
        def mk(lo, hi, seed):
            cl = F.col("id") % 500
            return spark.range(lo, hi, 1, 64).select(
                F.col("id").alias("vec_id"),
                F.transform(
                    F.sequence(F.lit(0), F.lit(dim - 1)),
                    lambda j: (
                        (F.hash(cl * 13 + j + seed) % 1000 / 500.0 - 1.0)
                        + (
                            F.hash(F.col("id") * 97 + j) % 1000
                            / 2500.0 - 0.2
                        )
                    ).cast("float"),
                ).alias("embedding"),
            )

        phase_a = mk(0, half, 0).persist()
        phase_b = mk(half, nv, 7_777_777).persist()
        phase_a.count(), phase_b.count()
        idx = tempfile.mkdtemp(prefix="oak_rb_probe_")
        build_ivf_index(
            phase_a, dim=dim, index_dir=idx, n_centroids=128
        )
        add_to_ivf_index(phase_b, idx)
        t0 = time.time()
        stats = rebalance_ivf_index(spark, idx, n_centroids=256)
        dt = time.time() - t0
        out["rebalance_vecs"] = nv
        out["rebalance_sec"] = round(dt, 2)
        out["rebalance_vecs_per_sec"] = round(nv / dt)
        out["rebalance_skew_before"] = round(
            stats["max_cell_frac_before"], 5
        )
        out["rebalance_skew_after"] = round(
            stats["max_cell_frac_after"], 5
        )
        # post-rebalance recall@10 for DRIFTED queries vs brute force
        full = phase_a.unionByName(phase_b).persist()
        qs = phase_b.where(
            F.col("vec_id") % (half // 50) == 0
        ).select(F.col("vec_id").alias("query_id"), "embedding")
        qs.persist()
        t0 = time.time()
        got = search_ivf_index(spark, idx, qs, k=10, n_probe=16).collect()
        out["rebalance_search_sec"] = round(time.time() - t0, 2)
        exact = {}
        for r in cosine_topk(full, qs, k=10).collect():
            exact.setdefault(r["query_id"], set()).add(r["vec_id"])
        hits = sum(
            1 for r in got if r["vec_id"] in exact.get(r["query_id"], set())
        )
        tot = sum(len(v) for v in exact.values())
        out["rebalance_recall_at_10"] = (
            round(hits / tot, 4) if tot else None
        )
        phase_a.unpersist(), phase_b.unpersist(), full.unpersist()

    if args.curationdocs:
        from oakstore_spark.streaming.curation import (
            curation_ingest_stream,
        )

        nd = args.curationdocs
        # every 10th doc is a near-copy of its predecessor (one token
        # appended) so admission has real rejects across batches
        base = spark.range(0, nd, 1, 64).select(
            F.col("id").alias("doc_id"),
            F.concat_ws(
                " ",
                *[
                    F.hex(
                        F.hash(
                            (
                                F.col("id")
                                - (F.col("id") % 10 == 9).cast("long")
                            )
                            * 131
                            + k
                        )
                    )
                    for k in range(24)
                ],
                F.when(
                    F.col("id") % 10 == 9, F.lit("zzdup")
                ).otherwise(F.lit("")),
            ).alias("text"),
        )
        root = Path(tempfile.mkdtemp(prefix="oak_cur_probe_"))
        (root / "src").mkdir()
        for b in range(3):
            # ONE file per micro-batch: maxFilesPerTrigger=1 counts
            # FILES, and spark.range's 64 partitions would otherwise
            # fragment this into ~200 tiny batches of pure overhead
            base.where(F.col("doc_id") % 3 == b).coalesce(1).write.parquet(
                str(root / "src" / f"f{b}")
            )
        t0 = time.time()
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(root / "src" / "f*"))
        )
        q = curation_ingest_stream(
            stream,
            str(root / "corpus"),
            str(root / "sigs"),
            str(root / "ivf"),
            str(root / "ckpt"),
            n_centroids=64,
        )
        q.awaitTermination()
        dt = time.time() - t0
        n_adm = spark.read.parquet(str(root / "corpus")).count()
        n_idx = spark.read.parquet(str(root / "ivf" / "vectors")).count()
        out["curation_docs"] = nd
        out["curation_sec"] = round(dt, 2)
        out["curation_docs_per_sec"] = round(nd / dt)
        out["curation_admitted"] = int(n_adm)
        out["curation_indexed"] = int(n_idx)
        # planted near-dups must be turned away (in-batch or vs index)
        assert n_adm <= nd - int(nd // 10 * 0.8), (n_adm, nd)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
