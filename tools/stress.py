"""Scale stress probe: replicate the sf0.1 tables in-memory (10x by
default) and check that the heavy operator families stay near-linear in
wall-clock — the local stand-in for "would this survive a 100x scale-up".

Replication shifts doc_ids so the corpus grows honestly; note that
replicas ARE true near-duplicates, so pair-generating ops legitimately
emit more pairs per row at 10x (data property, not a plan property).

Usage: python tools/stress.py [factor]
Prints one line per op: name, 1x secs, Nx secs, ratio vs factor.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from cloudpelican_lsd_spark.operators import classifier, corpus, dedup, textstats
from cloudpelican_lsd_spark.session import get_spark
from cloudpelican_lsd_spark.sources.tables import logs_view


def replicate(df, key: str, factor: int, n: int):
    return (
        df.crossJoin(F.broadcast(
            __import__("pyspark").sql.SparkSession.active().range(factor)
            .withColumnRenamed("id", "_rep")))
        .withColumn(key, F.col(key) + F.col("_rep") * F.lit(n))
        .drop("_rep")
        .localCheckpoint()
    )


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    sf = "/root/testdata/sf0.1"
    spark = get_spark("stress")
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    logs = logs_view(spark, sf)
    n_docs, n_logs = docs.count(), logs.count()
    big_docs = replicate(docs, "doc_id", factor, n_docs)
    big_logs = replicate(logs, "event_id", factor, n_logs)
    big_docs.count(), big_logs.count()

    def lined(d):
        return d.select(
            "doc_id",
            F.expr(
                "array_join(transform(sequence(0,"
                " CAST(ceil(size(split(text, ' ')) / 10.0) AS INT) - 1),"
                " i -> array_join(slice(split(text, ' '), i * 10 + 1, 10), ' ')),"
                " '\\n')"
            ).alias("text"),
        )

    from cloudpelican_lsd_spark.multimodal import codecs
    from cloudpelican_lsd_spark.operators import outliers

    ops = {
        "minhash_lsh": lambda d: dedup.lsh_candidate_pairs(d),
        # replicas are exact copies → hamming-0 groups grow 10x and the
        # pair OUTPUT grows ~k^2 (data property); the probe guards the
        # round-6 explode-spread fix — the pair expansion must stay
        # distributed (explicit round-robin exchange), so wall-clock
        # tracks the output volume, not a single straggler task
        "simhash_near_pairs": lambda d: dedup.simhash_near_pairs(d),
        "ngram_jaccard(max_df=50)": lambda d: dedup.ngram_jaccard_pairs(
            d, n=3, threshold_num=1, threshold_den=5, max_df=50
        ),
        "tfidf_topk": lambda d: textstats.tfidf_topk(d, k=5),
        "line_dedup(min_df=3)": lambda d: textstats.line_dedup(lined(d), min_df=3),
        "media_decode(real)": lambda d: codecs.decode_features(
            codecs.synthesize_real_media(d)
        ).drop("feature"),
        # replicas are exact copies, so EVERY gram goes hot at 10x —
        # worst-case span density, still expected near-linear (window
        # count + interval windows, no joins on the hot path)
        "substring_spans(w=8)": lambda d: dedup.substring_span_stats(d),
        # vocab is fixed under replication: the groupBy(source, term)
        # input grows 10x but its output (and everything downstream)
        # stays vocabulary-sized — expect ~linear scan cost
        "source_divergence": lambda d: textstats.source_divergence(d),
        # per-char explode + doc-partitioned window min; replicas are
        # exact copies so every fingerprint's df multiplies by k and the
        # df<=8 prune removes most pairs — the probe tracks the explode
        # + window cost (~linear), not output volume
        "winnowing_pairs(df<=8)": lambda d: textstats.winnowing_pairs(d),
        # one fused 9-way n-gram explode + doc-keyed aggs — ~linear
        "gopher_repetition": lambda d: textstats.gopher_repetition(lined(d)),
        # replica dups inflate per-bucket pair volume ~k^2 (data
        # property, same caveat as minhash_lsh); adds two doc_id joins
        # over the pair set on top of the lsh probe
        "cross_source_matrix": lambda d: dedup.cross_source_matrix(d),
        # fixed 1k-doc batch vs a 10x-larger index: probes the daily
        # production join — cost should track index size sub-linearly
        # (bands shuffle, batch side constant)
        "incremental_vs_index(1k)": lambda d: dedup.incremental_near_dup_pairs(
            docs.where(F.col("doc_id") < 1000),
            dedup.minhash_band_signatures(d),
        ),
        # 2-scan floor (stats pass + matched-docs scoring pass), no
        # explode, top-k bounded — expect ~linear scan cost
        "bm25_topk": lambda d: textstats.bm25_topk(d),
        # zero-shuffle explode+slice — expect ~linear
        "chunk_windows(24,6)": lambda d: textstats.chunk_windows(d, 24, 6),
        # fixed-width projections into one full-outer join — ~linear
        "snapshot_diff(self-mod)": lambda d: corpus.snapshot_diff(
            d.select("doc_id", "text", "source"),
            d.where(F.col("doc_id") % 7 != 0).select(
                "doc_id", "text", "source"
            ),
        ),
        # replicas repeat the same images: distinct fingerprints stay
        # constant while n_images grows — pair stage should be ~flat,
        # decode ~linear
        "phash_near_pairs": lambda d: codecs.phash_near_pairs(
            codecs.synthesize_real_media(d)
        ),
        # fixed 1k batch vs 10x corpus: position set is bounded (2^16),
        # exact join stays batch-sized — expect sub-linear in corpus
        "bloom_prefilter(1k)": lambda d: dedup.bloom_prefilter(
            d, docs.where(F.col("doc_id") < 1000).select("doc_id", "text")
        ),
        # counter table fixed (4x256); one token agg — ~linear scan cost
        "cms_topk_audit": lambda d: textstats.cms_topk_audit(d),
        # model <= 65 rows broadcast; two aggs per step — ~linear
        "perceptron_2steps": lambda d: classifier.perceptron_two_steps(d),
        # same inverted-index plan as jaccard; replica dups inflate
        # per-bucket pairs ~k^2 (data property) — compare to minhash_lsh
        "containment_pairs(max_df=50)": lambda d: dedup.containment_pairs(
            d, n=3, threshold_num=4, threshold_den=5, max_df=50
        ),
        # two-pass (weight fit + scoring); both collapse map-side —
        # ~linear in corpus bytes, weight table fixed at 256 rows
        "dsir_weights": lambda d: textstats.dsir_weights(d),
        # one explode + two aggs; shuffle carries (doc, ch) not text —
        # ~linear
        "char_entropy": lambda d: textstats.char_entropy(d),
        # one (source, token) agg + bounded top-V broadcast — ~linear
        "vocab_coverage": lambda d: textstats.vocab_coverage(d),
        # vocab-bounded pair space: replication grows doc rows but the
        # top-V vocab (and so the pair universe) is fixed — ~linear
        "pmi_pairs": lambda d: textstats.pmi_pairs(d),
        # two aggregates, no joins; replicas claim nothing new, so the
        # min-doc_id table is constant — ~linear scan cost
        "ngram_novelty": lambda d: textstats.ngram_novelty(d),
        # composes est-vs-true: replica exact-copies inflate candidate
        # pairs ~k^2 (data property, same caveat as minhash_lsh); the
        # sweep's own addition (x5 threshold explode over pairs + a
        # 5-row agg) must stay invisible next to the pair cost
        "threshold_sweep": lambda d: dedup.threshold_sweep(d),
        # fused 3-size shingle explode + broadcast LEFT SEMI; the eval
        # slice replicates with the corpus so the broadcast grows too,
        # but stays benchmark-shaped — expect ~linear
        "decontam_ngram_sweep": lambda d: corpus.decontaminate_ngram_sweep(d),
        # one position explode + (prev,cur)/(cur) cost joins; replicas
        # add NO new bigram types, so the model tables stay fixed while
        # the occurrence stream grows — expect ~linear
        "kneser_ney_logprob": lambda d: textstats.kneser_ney_logprob(d),
    }
    for name, fn in ops.items():
        t = {}
        for label, dset in (("1x", docs), (f"{factor}x", big_docs)):
            t0 = time.time()
            fn(dset).write.format("noop").mode("overwrite").save()
            t[label] = time.time() - t0
        ratio = t[f"{factor}x"] / max(t["1x"], 1e-9)
        print(
            f"{name:28s} 1x={t['1x']:6.2f}s {factor}x={t[f'{factor}x']:6.2f}s"
            f"  ratio={ratio:5.2f} (linear={factor})"
        )
    # NOTE: no local `corpus` import here — it would shadow the module-level
    # one and unbind the snapshot_diff lambda above (function-wide local)
    from cloudpelican_lsd_spark.operators import similarity

    # c4_audit is constant-network (<=7 rows shuffled): expect ~linear scan cost
    t = {}
    for label, dset in (("1x", docs), (f"{factor}x", big_docs)):
        t0 = time.time()
        corpus.c4_audit(dset).write.format("noop").mode("overwrite").save()
        t[label] = time.time() - t0
    print(
        f"{'c4_audit':28s} 1x={t['1x']:6.2f}s {factor}x={t[f'{factor}x']:6.2f}s"
        f"  ratio={t[f'{factor}x'] / max(t['1x'], 1e-9):5.2f} (linear={factor})"
    )

    # semantic_prune: replicas are exact duplicates, so within-cluster pair
    # volume grows with the SQUARE of the replication factor by design (the
    # fixed per-label k cannot grow with n here; real deployments scale k
    # with corpus size, which is SemDeDup's own knob).  Probe at 3x and
    # expect ~9x pair work, not linear.
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    n_emb = emb.count()
    big_emb = replicate(emb, "vec_id", 3, n_emb)
    t = {}
    for label, dset in (("1x", emb), ("3x", big_emb)):
        t0 = time.time()
        similarity.semantic_prune(dset).write.format("noop").mode(
            "overwrite"
        ).save()
        t[label] = time.time() - t0
    print(
        f"{'semantic_prune':28s} 1x={t['1x']:6.2f}s 3x={t['3x']:6.2f}s"
        f"  ratio={t['3x'] / max(t['1x'], 1e-9):5.2f} (pairs~quadratic: 9)"
    )

    # ivfpq end to end: a FIXED 10-vector query batch vs a replicated
    # corpus index.  Build is ~linear (element explode, broadcast coarse
    # scores, per-(vec,s) argmin windows — all keyed by vec_id, replicas
    # spread evenly); the query's candidate volume grows linearly inside
    # the probed cells and the output stays top-k-bounded.
    big_emb10 = replicate(emb, "vec_id", factor, n_emb)
    t = {}
    for label, dset in (("1x", emb), (f"{factor}x", big_emb10)):
        t0 = time.time()
        cents, cb, codes = similarity.build_ivfpq_index(dset)
        qb = emb.where(F.col("vec_id") < 10).select(
            (F.col("vec_id") + 10_000_000).alias("qid"), "embedding"
        )
        similarity.ivfpq_index_topk(qb, cents, cb, codes, 2, 10).write.format(
            "noop"
        ).mode("overwrite").save()
        t[label] = time.time() - t0
    print(
        f"{'ivfpq_build+query':28s} 1x={t['1x']:6.2f}s "
        f"{factor}x={t[f'{factor}x']:6.2f}s"
        f"  ratio={t[f'{factor}x'] / max(t['1x'], 1e-9):5.2f} (linear={factor})"
    )

    # PQ / IVF-PQ recall audits (r9, VERDICT #5): locally these are
    # ~20-serial-stage chains whose wall is stage-launch latency on tiny
    # data (total task CPU < 2.3 s); the scale question is whether the
    # SAME stage count stays near-linear when every stage carries 10x
    # rows (codebook and query count fixed, candidate volume linear).
    # A ratio well under `factor` here is the stress-backed "inherent"
    # evidence that the chains are latency-bound locally and
    # bandwidth-scaling at size.  (The r9 structural change — argmin
    # windows replaced by partial-aggregating min(struct) — cut the
    # encode exchanges' rows 8-16x and removed their sorts, but stage
    # COUNT is the local wall and is the algorithm itself.)
    for label_q, fn in (
        ("pq_recall", lambda d: similarity.pq_recall(d)),
        ("ivfpq_recall", lambda d: similarity.ivfpq_recall(d)),
    ):
        t = {}
        for label, dset in (("1x", emb), (f"{factor}x", big_emb10)):
            t0 = time.time()
            fn(dset).write.format("noop").mode("overwrite").save()
            t[label] = time.time() - t0
        print(
            f"{label_q:28s} 1x={t['1x']:6.2f}s "
            f"{factor}x={t[f'{factor}x']:6.2f}s"
            f"  ratio={t[f'{factor}x'] / max(t['1x'], 1e-9):5.2f}"
            f" (linear={factor})"
        )

    # -- streaming-path stress (VERDICT r6 #5): the suppressor and the
    # streaming indexer have correctness tests but had no scale
    # measurement beyond stream_bench's lines/s.  Both probes below use
    # REAL on-disk stores (tempdirs), not in-memory stand-ins.
    import shutil
    import tempfile

    from cloudpelican_lsd_spark.streaming.ann_index import StreamingIvfIndexer
    from cloudpelican_lsd_spark.streaming.pipeline import NearDupSuppressor

    work = tempfile.mkdtemp(prefix="stress_streaming_")

    def _file_count(root: str) -> int:
        return sum(len(fs) for _, _, fs in os.walk(root))

    # (a) whole-corpus epoch: in-batch suppression + store write at 1x
    # vs Nx — the window MIN and the signature write are keyed by
    # (band, sig)/doc_id, so expect ~linear
    t = {}
    stores = {}
    for label, dset in (("1x", docs), (f"{factor}x", big_docs)):
        root = os.path.join(work, f"sup_{label}")
        sup = NearDupSuppressor(
            spark, os.path.join(root, "store"), os.path.join(root, "out")
        )
        t0 = time.time()
        sup.process_batch(dset.select("doc_id", "text"), 0)
        t[label] = time.time() - t0
        stores[label] = sup
    print(
        f"{'suppressor_epoch':28s} 1x={t['1x']:6.2f}s "
        f"{factor}x={t[f'{factor}x']:6.2f}s"
        f"  ratio={t[f'{factor}x'] / max(t['1x'], 1e-9):5.2f} (linear={factor})"
    )

    # (b) FIXED 1k-doc batch vs the 1x-grown and Nx-grown stores — the
    # per-batch production cost.  The store is probed by the BROADCAST
    # batch signatures (scan-only, no store shuffle/sort), so expect
    # sub-linear in store size (scan cost only)
    probe = docs.where(F.col("doc_id") < 1000).select(
        (F.col("doc_id") + 100_000_000).alias("doc_id"), "text"
    )
    t = {}
    for label in ("1x", f"{factor}x"):
        t0 = time.time()
        stores[label].process_batch(probe, 1)
        t[label] = time.time() - t0
    print(
        f"{'suppressor_batch(1k)':28s} 1x={t['1x']:6.2f}s "
        f"{factor}x={t[f'{factor}x']:6.2f}s"
        f"  ratio={t[f'{factor}x'] / max(t['1x'], 1e-9):5.2f} "
        f"(store-scan, want << {factor})"
    )

    # (c) streaming IVF maintenance: fixed 2k-vector epoch append onto a
    # 1x vs Nx bootstrapped index — appends assign against the FIXED
    # broadcast centroids and write only their own epoch partition, so
    # the cost must be flat in index size (ratio ~1)
    emb_batch = emb.where(F.col("vec_id") < 2000).select(
        (F.col("vec_id") + 100_000_000).alias("vec_id"), "embedding"
    )
    t = {}
    indexers = {}
    for label, dset in (("1x", emb), (f"{factor}x", big_emb10)):
        ix = StreamingIvfIndexer(spark, os.path.join(work, f"ivf_{label}"))
        ix.bootstrap(dset)
        indexers[label] = ix
        t0 = time.time()
        ix.process_batch(emb_batch, 0)
        t[label] = time.time() - t0
    print(
        f"{'ivf_epoch_append(2k)':28s} 1x={t['1x']:6.2f}s "
        f"{factor}x={t[f'{factor}x']:6.2f}s"
        f"  ratio={t[f'{factor}x'] / max(t['1x'], 1e-9):5.2f} "
        f"(index-size-flat, want ~1)"
    )

    # (d) small-files growth + compaction: N more epochs accumulate one
    # directory tree each; compact() folds them into the bootstrap
    # partition and the file count collapses back to ~one file set per
    # cent_id cell
    ix = indexers["1x"]
    for ep in range(1, 9):
        ix.process_batch(emb_batch, ep)
    before = _file_count(ix.assign_path)
    t0 = time.time()
    ix.compact()
    dt = time.time() - t0
    after = _file_count(ix.assign_path)
    print(
        f"{'ivf_compact(9 epochs)':28s} files {before} -> {after} "
        f"in {dt:5.2f}s (epoch dirs folded into bootstrap)"
    )

    # (e) the suppressor's store has the same one-dir-per-micro-batch
    # growth; compact() folds into epoch=<max folded> (retention-aware
    # variant) — file count must collapse the same way
    sup = stores["1x"]
    for ep in range(2, 9):
        sup.process_batch(
            probe.select(
                (F.col("doc_id") + ep * 10_000).alias("doc_id"), "text"
            ),
            ep,
        )
    before = _file_count(sup.store_path)
    t0 = time.time()
    sup.compact()
    dt = time.time() - t0
    after = _file_count(sup.store_path)
    print(
        f"{'suppressor_compact(9 ep)':28s} files {before} -> {after} "
        f"in {dt:5.2f}s (folded into epoch=<max>)"
    )

    shutil.rmtree(work, ignore_errors=True)

    t0 = time.time()
    classifier.train_and_classify(big_logs).write.format("noop").mode(
        "overwrite"
    ).save()
    print(f"{'naive_bayes(' + str(factor) + 'x)':28s} {time.time()-t0:6.2f}s")
    t0 = time.time()
    outliers.regression_check(
        outliers.analyzer_span(outliers.event_series(big_logs))
    ).write.format("noop").mode("overwrite").save()
    print(f"{'analyzer_regression(' + str(factor) + 'x)':28s} {time.time()-t0:6.2f}s")
    spark.stop()


if __name__ == "__main__":
    main()
