from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from cloudpelican_lsd_spark.multimodal import binary as mm
from cloudpelican_lsd_spark.operators import textstats as ts
from cloudpelican_lsd_spark.sources.tables import load_table


def test_media_synthesis_and_features(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir)
    media = mm.synthesize_media(docs)
    feats = mm.extract_features(media).collect()
    assert len(feats) == docs.count()
    one = next(f for f in feats if f.media_id == 0)
    text = docs.where(F.col("doc_id") == 0).collect()[0].text
    assert one.content_sha256 == hashlib.sha256(text.encode()).hexdigest()
    assert one.n_bytes == len(text.encode())
    assert len(one.feature) == 8
    assert all(0.0 <= v < 1.0 for v in one.feature)


def test_real_decode_is_explicitly_stubbed(spark, sf_dir):
    media = mm.synthesize_media(load_table(spark, "documents", sf_dir))
    with pytest.raises(Exception) as exc_info:
        mm.extract_features(media, decode_stub=False).collect()
    assert "NotImplementedError" in str(exc_info.value) or isinstance(
        exc_info.value, NotImplementedError
    )


def test_frame_sample_counts(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir).where(F.col("doc_id") < 30)
    media = mm.synthesize_media(docs)
    frames = mm.frame_sample(media, every_ms=1000)
    counts = {
        r.media_id: r["count"]
        for r in frames.groupBy("media_id").count().collect()
    }
    vids = {
        r.media_id: r.duration_ms
        for r in media.where(F.col("modality") == "video").collect()
    }
    for mid, d in vids.items():
        # zero-duration video = zero frames (no phantom offset-0 row)
        expected = len(range(0, d, 1000)) if d > 0 else 0
        assert counts.get(mid, 0) == expected, (mid, d)


def test_metadata_scan_prunes_binary_column(spark, sf_dir):
    media = mm.synthesize_media(load_table(spark, "documents", sf_dir))
    path = "/tmp/mm_media_prune_test"
    media.write.mode("overwrite").parquet(path)
    scan = mm.metadata_only_scan(spark.read.parquet(path))
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "content" not in plan  # binary column pruned from the scan


def test_token_count_matches_python(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir)
    got = {r.doc_id: r.n_tokens for r in ts.token_count(docs).collect()}
    for row in docs.collect():
        assert got[row.doc_id] == len(row.text.split(" "))


def test_lang_id_all_en_like(spark, sf_dir):
    # synthetic corpus is English-vocab regardless of lang label; the
    # stopword heuristic should call nearly everything 'en'
    docs = load_table(spark, "documents", sf_dir)
    preds = ts.lang_id(docs).groupBy("pred_lang").count().collect()
    by = {r.pred_lang: r["count"] for r in preds}
    assert by.get("en", 0) > 0.5 * docs.count()


def test_fingerprint_exact_is_md5(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir).where(F.col("doc_id") < 5)
    rows = ts.fingerprint(docs).collect()
    texts = {r.doc_id: r.text for r in docs.collect()}
    for r in rows:
        assert r.exact_fp == hashlib.md5(texts[r.doc_id].encode()).hexdigest()
        assert len(r.min_shingle_fp) == 32


def test_bpe_token_count_shapes(spark, sf_dir):
    from cloudpelican_lsd_spark.operators import textstats as text_ops
    from cloudpelican_lsd_spark.sources.tables import load_table

    import re

    docs = load_table(spark, "documents", sf_dir)
    out = text_ops.bpe_token_count(docs)
    rows = {r.doc_id: r for r in out.collect()}
    assert len(rows) == docs.count()
    # spot-check against a Python re reference implementation
    for d in docs.limit(50).collect():
        r = rows[d.doc_id]
        assert r.n_bpe_tokens == len(re.findall(text_ops.BPE_RE, d.text))
        assert r.n_ws_tokens == len(d.text.split(" "))


def test_normalize_lines_branches(spark):
    from pyspark.sql import functions as F
    from cloudpelican_lsd_spark.functions.parse import (
        MAX_MSG_LENGTH,
        normalize_lines,
    )

    df = spark.createDataFrame(
        [("  hi  ",), ("   ",), (None,), ("y" * 5000,)], ["_raw"]
    )
    got = {r._raw for r in normalize_lines(df).collect()}
    assert "hi" in got                       # trimmed
    assert len(got) == 2                     # empty + null dropped
    long = next(x for x in got if x != "hi")
    assert len(long) == MAX_MSG_LENGTH + 2 and long.endswith("..")


def test_resize_dims_aspect_and_bounds(spark, sf_dir):
    """Targets are within bounds, aspect-preserving (exact integer
    floor), and identity for already-fitting media."""
    media = mm.synthesize_media(load_table(spark, "documents", sf_dir))
    rows = mm.resize_dims(media, max_w=256, max_h=192).collect()
    assert rows
    for r in rows:
        assert r.new_w <= 256 and r.new_h <= 192
        if r.width <= 256 and r.height <= 192:
            assert (r.new_w, r.new_h) == (r.width, r.height)
        elif r.width * 192 >= r.height * 256:
            assert r.new_w == 256
            assert r.new_h == r.height * 256 // r.width
        else:
            assert r.new_h == 192
            assert r.new_w == r.width * 192 // r.height


def test_resize_passthrough_skips_python_boundary(spark, sf_dir):
    """Within-bounds rows keep their original bytes untouched; shrinking
    rows get the (stub) re-encoded payload and resized=True."""
    media = mm.synthesize_media(
        load_table(spark, "documents", sf_dir).where(F.col("doc_id") < 60)
    )
    out = {r.media_id: r for r in mm.resize(media, 256, 192).collect()}
    src = {r.media_id: r for r in media.collect()}
    assert set(out) == set(src)
    for mid, r in out.items():
        s = src[mid]
        if s.width <= 256 and s.height <= 192:
            assert not r.resized
            assert bytes(r.content) == bytes(s.content)
            assert (r.width, r.height) == (s.width, s.height)
        else:
            assert r.resized
            expected = hashlib.sha256(
                bytes(s.content)
                + int(r.width).to_bytes(4, "big")
                + int(r.height).to_bytes(4, "big")
            ).digest()
            assert bytes(r.content) == expected


def test_resize_real_decode_is_stubbed(spark, sf_dir):
    media = mm.synthesize_media(load_table(spark, "documents", sf_dir))
    with pytest.raises(Exception) as exc_info:
        mm.resize(media, 64, 64, decode_stub=False).collect()
    assert "NotImplementedError" in str(exc_info.value) or isinstance(
        exc_info.value, NotImplementedError
    )


def test_cdc_chunks_match_python_reference(spark, sf_dir):
    """Chunks tile the document exactly and boundaries match a direct
    Python computation of the windowed-hash rule."""
    import hashlib as _h

    docs = load_table(spark, "documents", sf_dir).where(F.col("doc_id") < 40)
    got = {}
    for r in ts.cdc_chunks(docs, window=16, divisor=64).collect():
        got.setdefault(r.doc_id, []).append(
            (r.chunk_start, r.chunk_len, r.chunk_md5)
        )
    for row in docs.collect():
        text = row.text
        bounds = [
            i
            for i in range(16, len(text))  # 1-based end pos in [16, len-1]
            if int(_h.md5(text[i - 16 : i].encode()).hexdigest()[:8], 16) % 64
            == 0
        ] + [len(text)]
        expect = []
        prev = 0
        for b in bounds:
            if b > prev:
                chunk = text[prev:b]
                expect.append(
                    (prev + 1, b - prev, _h.md5(chunk.encode()).hexdigest())
                )
                prev = b
        assert sorted(got.get(row.doc_id, [])) == expect
        # chunks tile the doc: lens sum to the full length
        assert sum(c[1] for c in expect) == len(text)


def test_repetition_ratio_bounds_and_synthetic(spark):
    # synthetic: "a a a b" -> top word 'a' 3/4; bigrams: "a a" x2, "a b" -> 2/3
    docs = spark.createDataFrame(
        [(0, "a a a b"), (1, "x"), (2, "w w")], ["doc_id", "text"]
    )
    rows = {r.doc_id: r for r in ts.repetition_ratio(docs).collect()}
    assert rows[0].n_words == 4 and rows[0].top_word_cnt == 3
    assert rows[0].top_word_frac == 0.75
    assert rows[0].n_bigrams == 3 and rows[0].top_bigram_cnt == 2
    assert rows[0].top_bigram_frac == round(2 / 3, 6)
    # single-word doc: no bigrams, frac 0.0 not null
    assert rows[1].n_bigrams == 0 and rows[1].top_bigram_frac == 0.0
    # fully-repeated doc saturates at 1.0
    assert rows[2].top_word_frac == 1.0 and rows[2].top_bigram_frac == 1.0


def test_shingle_contamination_synthetic(spark):
    shared = "one two three four five six seven eight"
    docs = spark.createDataFrame(
        [
            (0, shared + " tail0 a b c"),
            (1, shared + " tail1 d e f"),
            (2, "totally different words with no overlap here at all ok"),
            (3, "short"),
        ],
        ["doc_id", "text"],
    )
    rows = {
        r.doc_id: r
        for r in ts.shingle_contamination(docs, n=8, min_df=2).collect()
    }
    # docs 0/1 share exactly the one 8-gram covering `shared`
    assert rows[0].n_contaminated == 1 and rows[1].n_contaminated == 1
    assert rows[0].n_shingles == 5  # 12 words -> 5 distinct 8-grams
    assert rows[0].contaminated_frac == 0.2
    assert rows[2].n_contaminated == 0 and rows[2].contaminated_frac == 0.0
    # shorter than n words: zero shingles, present with frac 0.0
    assert rows[3].n_shingles == 0 and rows[3].contaminated_frac == 0.0


def test_length_histogram_buckets_tile_doc_counts(spark, sf_dir):
    from cloudpelican_lsd_spark.registry import QUERIES
    from cloudpelican_lsd_spark.sources.tables import load_table

    rows = QUERIES["text_length_histogram"](spark, sf_dir).collect()
    docs = load_table(spark, "documents", sf_dir)
    assert sum(r.n_docs for r in rows) == docs.count()
    for r in rows:
        assert 2**r.log2_bucket <= r.min_tokens
        assert r.max_tokens < 2 ** (r.log2_bucket + 1)


def test_lang_drift_kl_nonnegative_when_support_matches(spark, sf_dir):
    from cloudpelican_lsd_spark.registry import QUERIES
    from cloudpelican_lsd_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    rows = QUERIES["corpus_lang_drift"](spark, sf_dir).collect()
    docs = load_table(spark, "documents", sf_dir)
    langs = docs.select("lang").distinct().count()
    # full-support case: every lang in both halves -> Gibbs: KL >= 0
    if len(rows) == langs:
        assert sum(r.kl_contrib for r in rows) >= -1e-5
    assert all(r.n_a > 0 and r.n_b > 0 for r in rows)


def test_pack_sequences_contiguity(spark, sf_dir):
    from cloudpelican_lsd_spark.operators import corpus as corpus_ops

    docs = load_table(spark, "documents", sf_dir)
    rows = corpus_ops.pack_sequences(docs, capacity=256, shards=8).collect()
    by_shard = {}
    for r in sorted(rows, key=lambda r: (r.shard, r.doc_id)):
        g = (r.pack_id // 8) * 256 + r.start_offset
        prev = by_shard.get(r.shard)
        if prev is not None:
            # each doc starts exactly where the previous one ended
            assert g == prev, (r.shard, r.doc_id)
        by_shard[r.shard] = g + r.n_tokens
        assert 0 <= r.start_offset < 256
    assert len(rows) == docs.count()


def test_source_mixture_matches_python_hash(spark, sf_dir):
    import hashlib as _h

    from cloudpelican_lsd_spark.registry import QUERIES

    kept = {
        r.doc_id for r in QUERIES["corpus_source_mixture"](spark, sf_dir).collect()
    }
    thr = {"src0": "ff", "src1": "80", "src2": "40"}
    expect = set()
    for r in load_table(spark, "documents", sf_dir).collect():
        if _h.md5(r.text.encode()).hexdigest()[:2] < thr.get(r.source, "1a"):
            expect.add(r.doc_id)
    assert kept == expect


def test_token_budget_sample_respects_thresholds(spark, sf_dir):
    import hashlib as _h

    from cloudpelican_lsd_spark.registry import QUERIES

    kept = {
        r.doc_id
        for r in QUERIES["corpus_token_budget_sample"](spark, sf_dir).collect()
    }
    docs = load_table(spark, "documents", sf_dir).collect()
    tot = {}
    for r in docs:
        tot[r.source] = tot.get(r.source, 0) + len(r.text.split(" "))
    n_sources = len(tot)
    expect = set()
    for r in docs:
        keep = min(65536, (65536 * 20000) // (n_sources * tot[r.source]))
        if int(_h.md5(r.text.encode()).hexdigest()[:4], 16) < keep:
            expect.add(r.doc_id)
    assert kept == expect


def test_pii_redact_masks_and_counts(spark):
    df = spark.createDataFrame(
        [
            (1, "mail me at bob.smith+x@example.co.uk or 10.0.0.1 pin 123456"),
            (2, "no pii here"),
            (3, "short 123 ok, long 9999 masked; ip-ish 999.999.999.999"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in ts.pii_redact(df).collect()}
    assert out[1].redacted == "mail me at <EMAIL> or <IP> pin <NUM>"
    assert (out[1].n_email, out[1].n_ip, out[1].n_num) == (1, 1, 1)
    assert out[2].redacted == "no pii here"
    assert (out[2].n_email, out[2].n_ip, out[2].n_num) == (0, 0, 0)
    # 999.* is still a dotted quad per the \b-delimited pattern (no range
    # check), 123 is below the 4-digit threshold
    assert out[3].redacted == "short 123 ok, long <NUM> masked; ip-ish <IP>"
    assert (out[3].n_email, out[3].n_ip, out[3].n_num) == (0, 1, 1)


def test_pii_redact_email_digits_not_double_counted(spark):
    df = spark.createDataFrame(
        [(1, "contact 12345@digits.example.com today")], "doc_id long, text string"
    )
    row = ts.pii_redact(df).collect()[0]
    assert row.redacted == "contact <EMAIL> today"
    assert (row.n_email, row.n_ip, row.n_num) == (1, 0, 0)


def test_tfidf_topk_ranks_rare_terms_first(spark):
    df = spark.createDataFrame(
        [
            (1, "common rare common"),
            (2, "common unique"),
            (3, "common common common"),
        ],
        "doc_id long, text string",
    )
    rows = ts.tfidf_topk(df, k=2).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc in by_doc.values():
        doc.sort(key=lambda r: r.rnk)
    # 'common' appears in every doc -> idf = ln(1) = 0; rare terms win
    assert by_doc[1][0].term == "rare" and by_doc[1][0].df == 1
    assert by_doc[2][0].term == "unique"
    assert by_doc[1][0].score > by_doc[1][1].score
    # doc 3 has only the zero-idf term; still listed, score 0
    assert by_doc[3][0].term == "common" and by_doc[3][0].score == 0.0
    assert all(r.rnk <= 2 for r in rows)


def test_unigram_logprob_rare_tokens_score_higher(spark):
    df = spark.createDataFrame(
        [(1, "common common common"), (2, "common rare"), (3, "common common")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in ts.unigram_logprob(df).collect()}
    assert out[1].n_tokens == 3
    # doc 2 carries the unique token -> highest mean NLL
    assert out[2].mean_nll > out[1].mean_nll
    assert out[2].mean_nll > out[3].mean_nll
    # all-common doc: mean NLL equals the single token cost
    assert abs(out[1].mean_nll - out[3].mean_nll) < 1e-6


def test_split_neardup_leakage_detects_id_hash_leaks(spark, sf_dir):
    from cloudpelican_lsd_spark import registry

    rows = registry.QUERIES["corpus_split_neardup_leakage"](spark, sf_dir).collect()
    # planted exact duplicates get fresh doc_ids, so an id-hash split
    # must leak at least one pair across boundaries at this sf
    assert sum(r.n_pairs for r in rows) > 0
    assert all(r.split_a != r.split_b for r in rows)


def test_corpus_yield_monotone(spark, sf_dir):
    from cloudpelican_lsd_spark import registry

    row = registry.QUERIES["corpus_clean_yield"](spark, sf_dir).collect()[0]
    assert row.n_raw >= row.n_gated >= row.n_exact_kept >= row.n_final > 0
    # planted exact dupes guarantee the dedup stage actually removed some
    assert row.n_exact_kept < row.n_gated
    assert row.tokens_final > 0


# --- real codecs (multimodal/codecs.py) ------------------------------------


def test_bmp_codec_is_pixel_true():
    """decode honors stride padding and bottom-up row order: top-down row
    y of the synthetic image must read back as (media_id + y) % 256."""
    from cloudpelican_lsd_spark.multimodal import codecs as C
    import numpy as np

    b = C.encode_bmp(300, 21, 300)  # odd width -> nonzero stride padding
    d = C.decode_bmp(b)
    assert (d["width"], d["height"]) == (21, 300)
    for y in (0, 1, 44, 299):
        assert int(d["pixels"][y, 0, 0]) == (300 + y) % 256
    # wrap past 256 exercises the min/max branches
    assert d["unit_min"] == 0 and d["unit_max"] == 255
    if C._HAVE_PIL:  # cross-check the stdlib parser against PIL
        p = C.decode_bmp_pil(b)
        assert np.array_equal(p["pixels"], d["pixels"])


def test_wav_codec_walks_chunks():
    """the RIFF parser must walk the chunk list, not assume a 44-byte
    header: an extra LIST chunk before fmt/data still decodes."""
    from cloudpelican_lsd_spark.multimodal import codecs as C
    import struct

    wav = C.encode_wav(5, 7)  # odd data size -> word-alignment pad byte
    body = wav[12:]
    extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
    patched = b"RIFF" + struct.pack("<I", 4 + len(extra) + len(body)) + b"WAVE" + extra + body
    d = C.decode_wav(patched)
    assert d["n_units"] == 7 and d["sample_rate"] == 1000
    assert d["unit_sum"] == sum((5 + i) % 256 for i in range(7))


def test_codec_rejects_garbage():
    from cloudpelican_lsd_spark.multimodal import codecs as C
    import pytest

    for fn in (C.decode_bmp, C.decode_wav, C.decode_fvid):
        with pytest.raises(ValueError):
            fn(b"\x00" * 64)


def test_resize_real_matches_numpy_reference(spark, sf_dir):
    """decode->nearest-neighbor->re-encode round-trip equals a direct
    numpy resample of the decoded pixels, and non-shrinking rows carry
    NULL px_sum (their blob never entered Python)."""
    from cloudpelican_lsd_spark.multimodal import codecs as C
    from cloudpelican_lsd_spark.sources.tables import load_table
    import numpy as np

    docs = load_table(spark, "documents", sf_dir).limit(60)
    media = C.synthesize_real_media(docs)
    out = {r.media_id: r for r in C.resize_real(media, 64, 48).collect()}
    for r in media.where("modality = 'image'").collect():
        d = C.decode_bmp(bytes(r.content))
        got = out[r.media_id]
        if d["width"] <= 64 and d["height"] <= 48:
            assert got.resized is False and got.px_sum is None
            continue
        ys = (np.arange(got.height) * d["height"]) // got.height
        xs = (np.arange(got.width) * d["width"]) // got.width
        ref = d["pixels"][ys][:, xs]
        assert got.px_sum == int(ref.sum(dtype=np.int64))


def test_line_dedup_boilerplate_removal(spark):
    """Corpus-wide boilerplate lines (df >= min_df) vanish from every doc,
    survivors keep original order, all-boilerplate docs drop out."""
    from cloudpelican_lsd_spark.operators.textstats import line_dedup

    BP = "accept cookies to continue"
    docs = spark.createDataFrame(
        [
            (1, f"{BP}\nunique alpha\n{BP}\nunique beta"),
            (2, f"{BP}\nunique gamma"),
            (3, f"{BP}"),            # all boilerplate -> dropped entirely
            (4, "solo line"),        # untouched
            (5, f"twice seen\nunique delta"),
            (6, "twice seen"),       # df=2 < 3 -> kept
        ],
        "doc_id LONG, text STRING",
    )
    out = {r.doc_id: r for r in line_dedup(docs, min_df=3).collect()}
    assert 3 not in out
    assert out[1].clean_text == "unique alpha\nunique beta"
    assert (out[1].n_kept, out[1].n_dropped) == (2, 2)
    assert out[2].clean_text == "unique gamma"
    assert out[4].clean_text == "solo line" and out[4].n_dropped == 0
    assert out[6].clean_text == "twice seen"


def test_python_boundary_queries_survive_foreign_cwd():
    """Driver-environment regression guard: a bare SparkSession launched
    from OUTSIDE the repo (cwd=/tmp, no PYTHONPATH) must still run the
    mapInPandas/applyInPandas queries — apply_runtime_confs ships the
    package to Python workers via addPyFile, so cloudpickle's by-reference
    functions resolve.  (Without it: ModuleNotFoundError in every worker,
    the round-1 driver-crash class.)"""
    import subprocess
    import sys as _sys

    code = (
        "import sys; sys.path.insert(0, '/root/repo')\n"
        "import __spark_entry__ as e\n"
        "from pyspark.sql import SparkSession\n"
        "s = (SparkSession.builder.master('local[4]')\n"
        "     .config('spark.ui.enabled','false').getOrCreate())\n"
        "n = e.queries()['multimodal_features'](s, '/root/testdata/sf0.001').count()\n"
        "assert n > 0, n\n"
        "print('FOREIGN_CWD_OK', n)\n"
    )
    out = subprocess.run(
        [_sys.executable, "-c", code],
        cwd="/tmp",
        env={k: v for k, v in __import__("os").environ.items() if k != "PYTHONPATH"},
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert "FOREIGN_CWD_OK" in out.stdout, out.stderr[-2000:]


def test_corpus_clean_v2_decontaminates_eval_overlap(spark):
    """v2 capstone semantics: eval-slice docs (doc_id % 97 == 0) never
    enter the output, training docs sharing an 8-gram with them are
    dropped, clean docs survive with post-line-dedup token counts."""
    from cloudpelican_lsd_spark.operators.corpus import corpus_clean_v2

    stop = "the a of and to in is it"       # passes the stopword lang gate
    passage = "alpha beta gamma delta epsilon zeta eta theta"  # 8 distinct words
    docs = spark.createDataFrame(
        [
            (0, f"{stop} {passage}"),                      # eval doc (0 % 97 == 0)
            (5, f"{stop} {passage} extra tail words here"),  # contaminated -> dropped
            (7, "it is a and the of to in totally unrelated clean content words"),  # kept (different stop order -> no shared 8-gram)
        ],
        "doc_id LONG, text STRING",
    )
    out = {r.doc_id: r.n_tokens for r in corpus_clean_v2(docs).collect()}
    assert 0 not in out          # eval never in training output
    assert 5 not in out          # 8-gram overlap with eval -> decontaminated
    assert 7 in out and out[7] == 13


def test_trending_terms_surfaces_new_term(spark):
    """A term that appears only from day 2 (with volume) must rank #1 on
    day 2 with prev_cnt=0; gap-aware lag: a term returning after a
    missing day counts from zero again, not from its old count."""
    from cloudpelican_lsd_spark.operators.textstats import trending_terms

    D = 86400
    rows = []
    eid = 0
    for day in (0, 1, 2, 3):
        for i in range(10):
            rows.append((f"app: steady msg", day * D + i, eid)); eid += 1
    for i in range(8):   # OOMKILL bursts on day 1
        rows.append(("app: OOMKILL now", 1 * D + i, eid)); eid += 1
    for i in range(6):   # gap on day 2, returns day 3
        rows.append(("app: OOMKILL now", 3 * D + i, eid)); eid += 1
    logs = spark.createDataFrame(
        rows, "_raw string, ts_epoch long, event_id long"
    )
    out = trending_terms(logs, k=3, min_cnt=5).collect()
    by_day = {}
    for r in out:
        by_day.setdefault(r.day // D, []).append(r)
    d1 = {r.token: r for r in by_day[1]}
    assert d1["OOMKILL"].rk == 1 and d1["OOMKILL"].prev_cnt == 0
    assert d1["OOMKILL"].rise == 8
    # day 3: OOMKILL came back after a missing day → counts from zero
    d3 = {r.token: r for r in by_day[3]}
    assert d3["OOMKILL"].prev_cnt == 0 and d3["OOMKILL"].rise == 6
    # truly steady terms are flat (rise 0) on every non-first day
    # ('app:'/'now' legitimately rise with the burst — they appear in
    # the bursting lines too)
    for day in (1, 2, 3):
        for r in by_day[day]:
            if r.token in ("steady", "msg"):
                assert r.rise == 0, (day, r)


def test_bm25_matches_python_reference(spark):
    """bm25_topk equals a pure-Python implementation of the same
    fixed-point formula on a hand-built corpus (rare + common + absent
    query terms, repeated terms, varying doc lengths)."""
    import math

    corpus = [
        (1, "dup dup alpha beta"),
        (2, "dup alpha beta gamma delta"),
        (3, "alpha beta gamma delta epsilon zeta"),
        (4, "alpha alpha alpha beta"),
        (5, "beta gamma"),
    ]
    terms = ["dup", "alpha", "nosuchterm"]
    docs = spark.createDataFrame(corpus, "doc_id long, text string")
    got = [
        (r.doc_id, r.score_micro)
        for r in ts.bm25_topk(docs, terms=terms, k=3).collect()
    ]

    # pure-Python twin of the documented formula
    toks = {d: t.split(" ") for d, t in corpus}
    n_docs, total = len(toks), sum(len(t) for t in toks.values())
    scores = {}
    for term in terms:
        df = sum(1 for t in toks.values() if term in t)
        if df == 0:
            continue
        idf = max(round(math.log((n_docs - df + 0.5) / (df + 0.5)) * 1e6), 0)
        for d, t in toks.items():
            tf = t.count(term)
            if tf == 0:
                continue
            sat = (44 * tf * total * 1000000) // (
                20 * tf * total + 6 * total + 18 * len(t) * n_docs
            )
            scores[d] = scores.get(d, 0) + idf * sat // 1000000
    want = sorted(
        ((d, s) for d, s in scores.items() if s > 0),
        key=lambda x: (-x[1], x[0]),
    )[:3]
    assert got == want


def test_chunk_windows_coverage_and_overlap(spark):
    """Closed-form chunking: 10 tokens, chunk=4, overlap=2 (stride 2) →
    chunks start at tokens 1,3,5,7 — full coverage, exact overlap, last
    chunk short; a short doc yields exactly one whole-doc chunk."""
    docs = spark.createDataFrame(
        [(1, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"), (2, "a b c")],
        "doc_id long, text string",
    )
    rows = {
        (r.doc_id, r.chunk_id): (r.n_chunk_tokens, r.chunk_text)
        for r in ts.chunk_windows(docs, chunk_tokens=4, overlap=2).collect()
    }
    assert rows[(1, 0)] == (4, "t1 t2 t3 t4")
    assert rows[(1, 1)] == (4, "t3 t4 t5 t6")
    assert rows[(1, 2)] == (4, "t5 t6 t7 t8")
    assert rows[(1, 3)] == (4, "t7 t8 t9 t10")
    assert (1, 4) not in rows  # tokens exhausted exactly at chunk 3
    assert rows[(2, 0)] == (3, "a b c")
    assert (2, 1) not in rows
    # reconstruction: stride-prefix of every chunk + full last chunk
    rebuilt = []
    for i in range(4):
        toks = rows[(1, i)][1].split(" ")
        rebuilt.extend(toks[:2] if i < 3 else toks)
    assert " ".join(rebuilt) == "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"


def test_bm25_term_hygiene(spark):
    """Review fixes: quote-bearing terms are safe (literal, not SQL
    text), duplicate terms score once, empty bag is rejected loudly,
    and empty docs emit zero chunks."""
    import pytest as _pytest

    # three docs so df=1 gives idf ln(2.5/1.5) > 0 (with N=2 the
    # Robertson idf of a df=1 term is exactly 0 and everything clamps)
    docs = spark.createDataFrame(
        [
            (1, "o'brien wrote code"),
            (2, "code and more code here"),
            (3, "entirely unrelated words"),
        ],
        "doc_id long, text string",
    )
    rows = ts.bm25_topk(docs, terms=["o'brien"], k=5).collect()
    assert [r.doc_id for r in rows] == [1]

    once = ts.bm25_topk(docs, terms=["o'brien"], k=5).collect()
    twice = ts.bm25_topk(docs, terms=["o'brien", "o'brien"], k=5).collect()
    assert [(r.doc_id, r.score_micro) for r in once] == [
        (r.doc_id, r.score_micro) for r in twice
    ]

    with _pytest.raises(ValueError):
        ts.bm25_topk(docs, terms=[])
    with _pytest.raises(ValueError):
        ts.bm25_topk_oracle(terms=[])
    assert "''" in ts.bm25_topk_oracle(terms=["o'brien"])


def test_chunk_windows_empty_doc_emits_nothing(spark):
    docs = spark.createDataFrame(
        [(1, ""), (2, "a b c")], "doc_id long, text string"
    )
    rows = ts.chunk_windows(docs, chunk_tokens=4, overlap=2).collect()
    assert {r.doc_id for r in rows} == {2}


def test_snapshot_diff_closed_form(spark):
    """Hand-built history: doc 1 unchanged, doc 2 rewritten (+2 tokens),
    doc 3 removed (-3), doc 4 added (+4) — statuses and exact token
    deltas per source."""
    from cloudpelican_lsd_spark.operators import corpus as corpus_ops

    v1 = spark.createDataFrame(
        [(1, "a b", "s1"), (2, "x y", "s1"), (3, "p q r", "s2")],
        "doc_id long, text string, source string",
    )
    v2 = spark.createDataFrame(
        [(1, "a b", "s1"), (2, "x y zz ww", "s1"), (4, "n1 n2 n3 n4", "s2")],
        "doc_id long, text string, source string",
    )
    got = {
        (r.source, r.status): (r.n_docs, r.token_delta)
        for r in corpus_ops.snapshot_diff(v1, v2).collect()
    }
    assert got == {
        ("s1", "unchanged"): (1, 0),
        ("s1", "changed"): (1, 2),
        ("s2", "removed"): (1, -3),
        ("s2", "added"): (1, 4),
    }


def test_tokenizer_fertility_closed_form(spark):
    """'abc def' = 7 bytes / 2 BPE tokens; multibyte text counts UTF-8
    bytes, not characters; punctuation splits off as its own token."""
    docs = spark.createDataFrame(
        [(1, "abc def", "s1"), (2, "héllo, x", "s2")],
        "doc_id long, text string, source string",
    )
    got = {r.source: r for r in ts.tokenizer_fertility(docs).collect()}
    assert got["s1"].n_bytes == 7 and got["s1"].n_bpe_tokens == 2
    assert got["s1"].bytes_per_token_ppm == 7 * 1000000 // 2
    # 'héllo, x': é is 2 bytes -> 9 bytes; tokens: h, é?  é is not
    # [A-Za-z] so it splits the letter run: 'h','é,',... the BPE_RE
    # treats é as single non-alnum char token: h | é | llo | , | x = 5
    assert got["s2"].n_bytes == len("héllo, x".encode()) == 9
    assert got["s2"].n_bpe_tokens == 5


def test_bpe_training_loop_matches_python(spark):
    """Three full BPE iterations (count → pick winner → apply merge)
    against a pure-Python reference: winning pairs, counts, and the
    rewritten symbol state must all agree at every step."""
    corpus = ["low lower lowest", "low low newer newest"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "doc_id long, text string"
    )

    # pure-Python reference state: list of symbol lists
    ref = [
        list(tok)
        for t in corpus
        for tok in t.lower().split(" ")
        if len(tok) >= 2
    ]

    def ref_counts(state):
        c = {}
        for syms in state:
            for x, y in zip(syms, syms[1:]):
                c[(x, y)] = c.get((x, y), 0) + 1
        return c

    def ref_apply(state, a, b):
        out = []
        for syms in state:
            acc = []
            for x in syms:
                if acc and acc[-1] == a and x == b:
                    acc[-1] = a + b
                else:
                    acc.append(x)
            out.append(acc)
        return out

    state = ts.char_symbols(docs)
    for _ in range(3):
        got = ts.bpe_merge_candidates(state, k=5).collect()
        c = ref_counts(ref)
        want = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
        assert [((r.sym_a, r.sym_b), r.cnt) for r in got] == want
        (a, b), _cnt = want[0]
        state = ts.bpe_apply_merge(state, a, b)
        ref = ref_apply(ref, a, b)
    # final states agree as multisets of symbol tuples
    got_state = sorted(tuple(r.syms) for r in state.collect())
    assert got_state == sorted(tuple(s) for s in ref)


def test_snapshot_diff_null_text_presence(spark):
    """Review fix: NULL text must not flip presence — a doc whose text
    was NULL in v1 and real in v2 is 'changed' (not 'added'); a doc
    removed while NULL-texted is 'removed' (not 'added')."""
    from cloudpelican_lsd_spark.operators import corpus as corpus_ops

    v1 = spark.createDataFrame(
        [(1, None, "s1"), (2, None, "s1")],
        "doc_id long, text string, source string",
    )
    v2 = spark.createDataFrame(
        [(1, "x y", "s1")], "doc_id long, text string, source string"
    )
    got = {
        (r.source, r.status): r.n_docs
        for r in corpus_ops.snapshot_diff(v1, v2).collect()
    }
    assert got == {("s1", "changed"): 1, ("s1", "removed"): 1}


def test_c4_by_source_reconciles_with_panel(spark, sf_dir):
    """The per-source breakdown must sum back to the corpus-wide panel
    cell-for-cell (same predicates, same counts — just a dimension)."""
    from cloudpelican_lsd_spark.operators import corpus as corpus_ops

    docs = load_table(spark, "documents", sf_dir)
    panel = {
        r.rule: (r.n_docs, r.n_fail)
        for r in corpus_ops.c4_audit(docs).collect()
    }
    rollup = {}
    for r in corpus_ops.c4_audit_by_source(docs).collect():
        d, f = rollup.get(r.rule, (0, 0))
        rollup[r.rule] = (d + r.n_docs, f + r.n_fail)
    assert rollup == panel


def test_ahash64_matches_fraction_reference():
    """the cross-multiplied integer bit condition equals the textbook
    float-mean aHash wherever the exact rational comparison is unambiguous
    (Fraction reference; random + adversarial uniform images)."""
    from cloudpelican_lsd_spark.multimodal import codecs as C
    from fractions import Fraction
    import numpy as np

    rng = np.random.default_rng(7)
    imgs = [rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            for h, w in ((16, 16), (23, 41), (104, 172), (8, 8))]
    imgs.append(np.full((32, 32, 3), 77, dtype=np.uint8))  # all ties -> 0
    for px in imgs:
        got = C.ahash_64(px)
        h, w = px.shape[:2]
        mean = Fraction(int(px.sum(dtype=np.int64)), px.size)
        want = 0
        for gy in range(8):
            for gx in range(8):
                cell = px[gy * h // 8:(gy + 1) * h // 8,
                          gx * w // 8:(gx + 1) * w // 8]
                if cell.size and Fraction(int(cell.sum(dtype=np.int64)), cell.size) > mean:
                    want |= 1 << (63 - (gy * 8 + gx))
        assert got == want


def test_ahash_generator_closed_form():
    """for the row-ramp generator, every grid bit reduces to
    rowsum(band)*h > rowsum(total)*band_rows — the identity the DuckDB
    oracle uses; check it against the real encode->decode->hash path,
    including a wrap-past-256 image."""
    from cloudpelican_lsd_spark.multimodal import codecs as C

    for mid, w, h in ((12, 16, 16), (201, 36, 100), (249, 20, 104)):
        bits = C.ahash_64(C.decode_bmp(C.encode_bmp(mid, w, h))["pixels"])
        s = mid % 256
        rows = [(s + r) % 256 for r in range(h)]
        for gy in range(8):
            lo, hi = gy * h // 8, (gy + 1) * h // 8
            want = sum(rows[lo:hi]) * h > sum(rows) * (hi - lo)
            band = [(bits >> (63 - (gy * 8 + gx))) & 1 for gx in range(8)]
            # column factors cancel on row-constant images: all 8 cell
            # bits of a band agree and equal the closed-form row condition
            assert band == [int(want)] * 8


def test_phash_near_pairs_match_bruteforce(spark, sf_dir):
    """block-bucketed candidate generation + popcount filter equals the
    all-pairs reference over distinct hashes (pairs sharing >= 1 block
    with hamming 1..24), and sides carry the group image counts."""
    from cloudpelican_lsd_spark.multimodal import codecs as C
    from cloudpelican_lsd_spark.sources.tables import load_table

    media = C.synthesize_real_media(load_table(spark, "documents", sf_dir))
    groups = {
        r["phash_hex"]: ((r["blk0"], r["blk1"], r["blk2"], r["blk3"]), r["n_images"])
        for r in C.phash_groups(media).collect()
    }
    want = set()
    keys = sorted(groups)
    for i, a in enumerate(keys):
        for b in keys[i + 1:]:
            (ba, na), (bb, nb) = groups[a], groups[b]
            if not any(x == y for x, y in zip(ba, bb)):
                continue
            ham = sum(bin(x ^ y).count("1") for x, y in zip(ba, bb))
            if 1 <= ham <= 24:
                want.add((a, b, ham, na, nb))
    got = {
        (r["hash_a"], r["hash_b"], r["hamming"], r["docs_a"], r["docs_b"])
        for r in C.phash_near_pairs(media).collect()
    }
    assert got == want and len(want) > 0


def test_cms_audit_matches_python_and_never_underestimates(spark):
    """tiny width forces collisions: the Spark CMS equals a pure-Python
    count-min over the same seeded sliced-md5 buckets, and every
    estimate >= the true count (collisions only add)."""
    import hashlib

    from cloudpelican_lsd_spark.operators import textstats as ts

    docs = spark.createDataFrame(
        [
            (1, "apple banana apple cherry date egg"),
            (2, "banana banana cherry fig grape apple"),
            (3, "cherry fig fig fig grape apple apple"),
        ],
        "doc_id long, text string",
    )
    depth, width = 4, 8
    toks = [t for _, x in docs.select("doc_id", "text").collect()
            for t in x.lower().split(" ")]
    true = {}
    for t in toks:
        true[t] = true.get(t, 0) + 1
    counters = {}
    for t, c in true.items():
        for d in range(depth):
            b = int(hashlib.md5(f"{d}:{t}".encode()).hexdigest()[:4], 16) % width
            counters[(d, b)] = counters.get((d, b), 0) + c
    want = {}
    for t, c in sorted(true.items(), key=lambda kv: (-kv[1], kv[0]))[:5]:
        est = min(
            counters[(d, int(hashlib.md5(f"{d}:{t}".encode()).hexdigest()[:4], 16) % width)]
            for d in range(depth)
        )
        want[t] = (c, est, est - c)
    got = {
        r["token"]: (r["true_cnt"], r["cms_est"], r["overest"])
        for r in ts.cms_topk_audit(docs, k=5, depth=depth, width=width).collect()
    }
    assert got == want
    assert all(est >= c for c, est, _ in got.values())
    assert any(est > c for c, est, _ in got.values()), "width 8 must collide"


def test_unimax_allocation_waterfill_properties(spark):
    """against a pure-Python water-filler on randomized source tables:
    never over-allocates a source, sums to exactly min(B, total), fully
    takes exactly the below-water sources, and splits the rest within
    one token of each other (the UniMax uniformity guarantee)."""
    import random

    from cloudpelican_lsd_spark.operators.corpus import unimax_allocation

    rng = random.Random(11)
    for trial in range(4):
        srcs = [
            (f"s{chr(97 + i)}", rng.randint(0, 400))
            for i in range(rng.randint(1, 9))
        ]
        bn, bd = rng.choice([(2, 5), (1, 2), (9, 10), (1, 1), (0, 1)])
        docs = spark.createDataFrame(
            [(i, " ".join(["w"] * max(n, 1)) if n else "", s)
             for i, (s, n) in enumerate(srcs)],
            "doc_id long, text string, source string",
        )
        # split("", " ") yields [""] -> 1 token; mirror that in the reference
        counts = {s: max(n, 1) for s, n in srcs}
        total = sum(counts.values())
        b = total * bn // bd
        got = {
            r["source"]: (r["n_tokens"], r["alloc"])
            for r in unimax_allocation(docs, bn, bd).collect()
        }
        assert {s: c for s, (c, _) in got.items()} == counts
        allocs = {s: a for s, (_, a) in got.items()}
        assert all(allocs[s] <= counts[s] for s in counts)
        assert sum(allocs.values()) == min(b, total)
        # python water-fill reference
        order = sorted(counts, key=lambda s: (counts[s], s))
        k, p = 0, 0
        prefix = 0
        for idx, s in enumerate(order, 1):
            prefix += counts[s]
            if prefix + (len(order) - idx) * counts[s] <= b:
                k, p = idx, prefix
        want = {}
        rem_srcs = order[k:]
        if rem_srcs:
            t, r = divmod(b - p, len(rem_srcs))
            for j, s in enumerate(rem_srcs, 1):
                want[s] = t + (1 if j <= r else 0)
        for s in order[:k]:
            want[s] = counts[s]
        assert allocs == want, f"trial {trial}: {allocs} != {want}"
        # uniformity: capped sources differ by at most one token
        capped = [allocs[s] for s in rem_srcs]
        if capped:
            assert max(capped) - min(capped) <= 1


def test_known_item_mrr_matches_python_twin(spark, sf_dir):
    """full pipeline twin: bigram inverted index, micro-rounded idf,
    top-4-idf query synthesis, tf-idf ranking, reciprocal ranks — and
    the probe corpus must be largely retrievable (bigram signal)."""
    import math

    from cloudpelican_lsd_spark.operators.textstats import known_item_mrr
    from cloudpelican_lsd_spark.sources.tables import load_table

    docs = load_table(spark, "documents", sf_dir)
    texts = {r["doc_id"]: r["text"].lower().split(" ")
             for r in docs.select("doc_id", "text").collect()}

    inv = {}
    for d, toks in texts.items():
        for i in range(len(toks) - 1):
            term = f"{toks[i]} {toks[i+1]}"
            inv.setdefault(term, {}).setdefault(d, 0)
            inv[term][d] += 1
    n = len(texts)
    idf = {
        t: max(int(round(math.log(n / len(dd)) * 1e6)), 0)
        for t, dd in inv.items()
    }
    want = {}
    for qid in sorted(texts):
        if qid % 25 != 0:
            continue
        qterms = sorted(
            {t for t, dd in inv.items() if qid in dd},
            key=lambda t: (-idf[t], t),
        )[:4]
        scores = {}
        for t in qterms:
            for d, tf in inv[t].items():
                scores[d] = scores.get(d, 0) + tf * idf[t]
        ranked = sorted(
            ((d, s) for d, s in scores.items() if s > 0),
            key=lambda ds: (-ds[1], ds[0]),
        )
        rank = next(
            (i + 1 for i, (d, _) in enumerate(ranked[:10]) if d == qid), 0
        )
        want[qid] = (rank, 1000000 // rank if rank else 0)
    got = {
        r["qid"]: (r["rank"], r["rr_ppm"])
        for r in known_item_mrr(docs).collect()
    }
    assert got == want
    assert sum(1 for r, _ in got.values() if r > 0) >= len(got) * 0.7


def test_training_manifest_flags_and_shards(spark, sf_dir):
    """manifest records decisions without dropping rows: full doc count,
    keep agrees with the C4 any-rule panel, has_embedding agrees with a
    direct id set, shards are md5-deterministic and in range."""
    import hashlib

    from cloudpelican_lsd_spark.operators.corpus import training_manifest

    docs = load_table(spark, "documents", sf_dir)
    emb = load_table(spark, "embeddings", sf_dir)
    rows = training_manifest(docs, emb, shards=16).collect()
    assert len(rows) == docs.count()
    emb_ids = {r["vec_id"] for r in emb.select("vec_id").collect()}
    for r in rows:
        assert r["shard"] == int(
            hashlib.md5(f"shard:{r['doc_id']}".encode()).hexdigest()[:4], 16
        ) % 16
        assert r["has_embedding"] == (r["doc_id"] in emb_ids)
        assert r["modality"] == ["image", "audio", "video"][r["doc_id"] % 3]
    n_keep = sum(r["keep"] for r in rows)
    from cloudpelican_lsd_spark.operators.corpus import c4_audit

    panel = {r["rule"]: r for r in c4_audit(docs).collect()}
    assert n_keep == panel["any_rule"]["n_docs"] - panel["any_rule"]["n_fail"]


def test_integrity_audit_detects_planted_violations(spark):
    """a clean synthetic pair reports all zeros; planting each violation
    class flips exactly its counter."""
    from cloudpelican_lsd_spark.operators.corpus import integrity_audit

    docs = spark.createDataFrame(
        [(1, "hello world.", "en", "s", 12), (2, "more text.", "es", "s", 10)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    emb = spark.createDataFrame(
        [(1, [0.1]), (2, [0.2])], "vec_id long, embedding array<float>"
    )
    clean = {r["check"]: r["n_bad"] for r in integrity_audit(docs, emb).collect()}
    assert set(clean.values()) == {0}

    bad_docs = docs.union(
        spark.createDataFrame(
            [
                (2, "dup id.", "en", "s", 7),          # dup_doc_ids
                (3, "", "en", "s", 0),                 # empty_text (+ no emb)
                (4, "stale count.", "xx", "s", 99),    # n_chars_mismatch + unknown_lang
            ],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
    )
    bad_emb = emb.union(
        spark.createDataFrame([(9, [0.3])], "vec_id long, embedding array<float>")
    )
    got = {r["check"]: r["n_bad"] for r in integrity_audit(bad_docs, bad_emb).collect()}
    assert got == {
        "docs_missing_embedding": 2,   # ids 3 and 4
        "embeddings_orphaned": 1,      # id 9
        "dup_doc_ids": 1,              # id 2
        "dup_vec_ids": 0,
        "empty_text": 1,
        "n_chars_mismatch": 1,
        "unknown_lang": 1,
    }


def test_char_entropy_closed_form(spark):
    """Uniform 2-symbol text = exactly 1 bit; constant text = 0 bits;
    4 distinct chars = 2 bits (up to the 6-decimal decimal-sum rounding)."""
    docs = spark.createDataFrame(
        [(1, "ab"), (2, "aaaa"), (3, "abcd"), (4, "aabb")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in ts.char_entropy(docs).collect()}
    assert got[1].entropy_bits == 1.0 and got[1].n_distinct_chars == 2
    assert got[2].entropy_bits == 0.0 and got[2].n_chars_obs == 4
    assert abs(got[3].entropy_bits - 2.0) < 1e-5
    assert abs(got[4].entropy_bits - 1.0) < 1e-5


def test_char_entropy_drops_empty_docs(spark):
    """length-0 text produces no character rows on either engine — the
    doc drops out (consistent with the DuckDB oracle's generate_series)."""
    docs = spark.createDataFrame(
        [(1, ""), (2, "xy")], "doc_id long, text string"
    )
    assert {r.doc_id for r in ts.char_entropy(docs).collect()} == {2}


def test_vocab_coverage_closed_form(spark):
    """top-1 vocab = the corpus-wide most frequent token ('x'); coverage
    counts token OCCURRENCES (not distinct), per source."""
    docs = spark.createDataFrame(
        [
            (1, "x x y", "s1"),
            (2, "x z", "s1"),
            (3, "y y x", "s2"),
        ],
        "doc_id long, text string, source string",
    )
    got = {
        r.source: r for r in ts.vocab_coverage(docs, vocab_size=1).collect()
    }
    # corpus counts: x=4, y=3, z=1 -> vocab={x}
    assert got["s1"].total_tokens == 5 and got["s1"].covered_tokens == 3
    assert got["s1"].oov_tokens == 2
    assert got["s2"].total_tokens == 3 and got["s2"].covered_tokens == 1
    assert got["s2"].covered_frac == round(1 / 3, 6)


def test_vocab_coverage_tie_break_is_lexicographic(spark):
    """equal counts -> token asc wins the last vocab slot (deterministic
    TakeOrdered tiebreak, pinned so the oracle's row_number agrees)."""
    docs = spark.createDataFrame(
        [(1, "b a", "s1")], "doc_id long, text string, source string"
    )
    got = ts.vocab_coverage(docs, vocab_size=1).collect()[0]
    # a and b both count 1; 'a' wins -> 1 of 2 tokens covered
    assert got.covered_tokens == 1 and got.total_tokens == 2


def test_temperature_mixture_closed_form(spark):
    """sources 100/400 tokens -> sqrt weights 10:20 -> ppm 333333/666666;
    a tiny source is oversampled at a big budget while UniMax never is."""
    from cloudpelican_lsd_spark.operators import corpus as corpus_ops

    docs = spark.createDataFrame(
        [(1, " ".join(["w"] * 100), "small"), (2, " ".join(["w"] * 400), "big")],
        "doc_id long, text string, source string",
    )
    got = {
        r.source: r
        for r in corpus_ops.temperature_mixture(docs, 4, 5).collect()
    }
    assert got["small"].weight_ppm == 333333
    assert got["big"].weight_ppm == 666666
    # B = 400; alloc_small = 400*10/30 = 133 > 100 available -> oversampled
    assert got["small"].alloc == 133 and got["small"].oversampled
    assert got["big"].alloc == 266 and not got["big"].oversampled
    # UniMax on the same corpus never oversamples
    uni = {
        r.source: r.alloc
        for r in corpus_ops.unimax_allocation(docs, 4, 5).collect()
    }
    assert uni["small"] <= 100 and uni["big"] <= 400


def test_dsir_weights_matches_python_twin(spark):
    """Full-pipeline pure-Python DSIR twin (md5-bucket hashing, add-one
    smoothing, micro-unit log ratios) on a corpus where 'en' docs share a
    marker bigram; en-marker docs must score positive, 'xx' docs negative."""
    import hashlib
    import math
    from collections import Counter

    from cloudpelican_lsd_spark.operators.textstats import dsir_weights

    data = [
        (1, "good clean text good clean", "en"),
        (2, "good clean words here now", "en"),
        (3, "spam junk noise spam junk", "xx"),
        (4, "noise junk spam words now", "xx"),
        (5, "good clean text here", "en"),
    ]
    docs = spark.createDataFrame(data, "doc_id long, text string, lang string")
    B = 64

    def bucket(bg: str) -> int:
        return int(hashlib.md5(bg.encode()).hexdigest()[:8], 16) % B

    def bigrams(t: str):
        toks = t.lower().split(" ")
        return [f"{a} {b}" for a, b in zip(toks, toks[1:])]

    t_cnt, r_cnt = Counter(), Counter()
    for _, t, lang in data:
        for bg in bigrams(t):
            b = bucket(bg)
            r_cnt[b] += 1
            if lang == "en":
                t_cnt[b] += 1
    T, R = sum(t_cnt.values()), sum(r_cnt.values())
    w = {
        b: round(
            (math.log((t_cnt[b] + 1.0) / (T + B)) - math.log((r_cnt[b] + 1.0) / (R + B)))
            * 1e6
        )
        for b in r_cnt
    }
    expect = {}
    for did, t, _ in data:
        bgs = bigrams(t)
        expect[did] = (len(bgs), sum(w[bucket(bg)] for bg in bgs))

    got = {
        r.doc_id: (r.n_feats, r.dsir_score_micro, r.prefer_target)
        for r in dsir_weights(docs, target_lang="en", buckets=B).collect()
    }
    for did, (nf, score) in expect.items():
        assert got[did][0] == nf and got[did][1] == score, did
    assert got[1][2] and got[2][2] and not got[3][2] and not got[4][2]


def test_quality_weighted_alloc_closed_form(spark):
    """clean source gets the whole budget; a source whose only doc fails
    the density gate contributes 0 clean tokens and allocates 0; the
    degenerate all-dirty corpus allocates 0 everywhere (no divide)."""
    from cloudpelican_lsd_spark.operators import corpus as corpus_ops

    # 30 distinct tokens (type/token 1.0), 10 of them stopwords (density ok)
    clean = "the a of and to in is it that for " + " ".join(
        f"w{i}" for i in range(20)
    )
    dirty = " ".join(["zz"] * 30)  # fails stopword density + type/token
    docs = spark.createDataFrame(
        [(1, clean, "good"), (2, dirty, "bad")],
        "doc_id long, text string, source string",
    )
    got = {
        r.source: r
        for r in corpus_ops.quality_weighted_alloc(docs, 1, 1).collect()
    }
    assert got["good"].clean_tokens == 30 and got["good"].alloc == 30
    assert got["bad"].clean_tokens == 0 and got["bad"].alloc == 0
    assert got["bad"].clean_rate_ppm == 0

    all_dirty = spark.createDataFrame(
        [(1, dirty, "s1")], "doc_id long, text string, source string"
    )
    r = corpus_ops.quality_weighted_alloc(all_dirty, 1, 1).collect()[0]
    assert r.alloc == 0


def test_pmi_pairs_closed_form(spark):
    """4 docs: (x,y) always together -> PMI ln(2·4/(2·2)) = ln 2; (x,z)
    independent-ish -> ln(2·4/(2·4)) = 0; pairs below min_co_df drop."""
    import math

    docs = spark.createDataFrame(
        [
            (1, "x y z"),
            (2, "x y z"),
            (3, "z q"),
            (4, "z q"),
        ],
        "doc_id long, text string",
    )
    got = {
        (r.tok_a, r.tok_b): r
        for r in ts.pmi_pairs(docs, vocab_size=10, min_co_df=2).collect()
    }
    # df: z=4, x=2, y=2, q=2; N=4
    assert got[("x", "y")].co_df == 2
    assert got[("x", "y")].pmi_micro == round(math.log(2 * 4 / (2 * 2)) * 1e6)
    assert got[("x", "z")].pmi_micro == 0  # ln(2*4/(2*4)) = ln 1
    assert got[("q", "z")].pmi_micro == 0
    assert ("x", "q") not in got  # co_df 0 < 2


def test_perplexity_buckets_closed_form(spark):
    """Planted 6-doc corpus with a known unigram distribution: the three
    NTILE terciles split 2/2/2 in (mean_nll, doc_id) order, head holds
    the most-fluent (common-token) docs, tail the gibberish, and bucket
    NLL ranges are disjoint and ordered head < middle < tail."""
    from cloudpelican_lsd_spark.operators import corpus as C

    rows = [
        # docs of common tokens (low NLL)
        (1, "the the the the", "en", "web", 0),
        (2, "the the the cat", "en", "web", 0),
        # middling
        (3, "the cat sat mat", "en", "web", 0),
        (4, "the cat ran far", "en", "books", 0),
        # rare-token gibberish (high NLL)
        (5, "zq1 zq2 zq3 zq4", "en", "books", 0),
        (6, "xj1 xj2 xj3 xj4", "en", "books", 0),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = C.perplexity_buckets(docs, n_buckets=3).collect()
    by_bucket = {}
    for r in out:
        b = by_bucket.setdefault(r.bucket, dict(n=0, lo=[], hi=[]))
        b["n"] += r.n_docs
        b["lo"].append(r.min_nll)
        b["hi"].append(r.max_nll)
    assert {b: v["n"] for b, v in by_bucket.items()} == {
        "head": 2, "middle": 2, "tail": 2
    }
    assert max(by_bucket["head"]["hi"]) <= min(by_bucket["middle"]["lo"])
    assert max(by_bucket["middle"]["hi"]) <= min(by_bucket["tail"]["lo"])
    # token counts preserved: 6 docs x 4 tokens
    assert sum(r.n_tokens for r in out) == 24


def test_perplexity_cutpoints_closed_form_and_ties(spark):
    """The production cutpoint split on the same planted corpus: same
    2/2/2 terciles and ordered disjoint ranges as the NTILE twin, the
    reported cutpoints are the k-th order statistics of the integer
    micro-nat scores, and — the contract difference — score TIES all
    land in the lower bucket instead of being split by NTILE."""
    from cloudpelican_lsd_spark.operators import corpus as C

    rows = [
        (1, "the the the the", "en", "web", 0),
        (2, "the the the cat", "en", "web", 0),
        (3, "the cat sat mat", "en", "web", 0),
        (4, "the cat ran far", "en", "books", 0),
        (5, "zq1 zq2 zq3 zq4", "en", "books", 0),
        (6, "xj1 xj2 xj3 xj4", "en", "books", 0),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = C.perplexity_cutpoints(docs, n_buckets=3).collect()
    by_bucket = {}
    for r in out:
        b = by_bucket.setdefault(r.bucket, dict(n=0, lo=[], hi=[]))
        b["n"] += r.n_docs
        b["lo"].append(r.min_nll)
        b["hi"].append(r.max_nll)
    assert {b: v["n"] for b, v in by_bucket.items()} == {
        "head": 2, "middle": 2, "tail": 2
    }
    assert max(by_bucket["head"]["hi"]) <= min(by_bucket["middle"]["lo"])
    assert max(by_bucket["middle"]["hi"]) <= min(by_bucket["tail"]["lo"])
    assert sum(r.n_tokens for r in out) == 24
    # cutpoints are constants on every row; c_head = 2nd smallest score
    cut_head = {r.cut_head for r in out}
    cut_mid = {r.cut_middle for r in out}
    assert len(cut_head) == 1 and len(cut_mid) == 1
    assert cut_head.pop() <= cut_mid.pop()

    # tie semantics: docs 5 and 6 (plus a 7th clone) share one score —
    # all ties stay in ONE bucket under the value rule (NTILE would
    # split them 1/2 across the boundary)
    tied = spark.createDataFrame(
        rows + [(7, "zq1 zq2 xj3 xj4", "en", "web", 0)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out2 = C.perplexity_cutpoints(tied, n_buckets=3).collect()
    # every rare-token doc has identical score (all tokens cnt=1 except
    # shared? zq1..zq4/xj1..xj4 counts shift with doc 7) — just assert
    # the invariant: per bucket, value ranges stay disjoint and ordered
    rng = {}
    for r in out2:
        lo, hi = rng.get(r.bucket, (r.min_nll, r.max_nll))
        rng[r.bucket] = (min(lo, r.min_nll), max(hi, r.max_nll))
    assert rng["head"][1] <= rng["middle"][0] <= rng["middle"][1] <= rng["tail"][0]
    # and total docs conserved
    assert sum(r.n_docs for r in out2) == 7


def test_perplexity_by_lang_independent_thresholds(spark):
    """Two languages with very different fluency distributions: a global
    split would dump ALL of the rare-token language into tail; the
    per-language split must produce head/middle/tail WITHIN each
    language, with each language's cutpoints drawn from its own score
    range."""
    from cloudpelican_lsd_spark.operators import corpus as C

    rows = [
        # en: common tokens, 6 docs spanning low NLL
        (1, "the the the the", "en", "web", 0),
        (2, "the the the cat", "en", "web", 0),
        (3, "the cat sat mat", "en", "web", 0),
        (4, "the cat ran far", "en", "web", 0),
        (5, "the ran sat far", "en", "web", 0),
        (6, "cat mat ran far", "en", "web", 0),
        # fr: rarer tokens (higher NLL), 6 docs with DISTINCT score mixes
        # (all-singleton docs would tie at the tercile boundary and the
        # value rule would — correctly — leave tail empty)
        (11, "fz1 fz1 fz1 fz1", "fr", "web", 0),
        (12, "fz1 fz1 fz1 fz2", "fr", "web", 0),
        (13, "fz1 fz1 fz2 fz2", "fr", "web", 0),
        (14, "fz1 fz2 fz2 fz3", "fr", "web", 0),
        (15, "fz2 fz3 fz4 fz5", "fr", "web", 0),
        (16, "fz6 fz7 fz8 fz9", "fr", "web", 0),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = C.perplexity_by_lang(docs, n_buckets=3).collect()
    per_lang = {}
    for r in out:
        per_lang.setdefault(r.lang, {})[r.bucket] = r
    # BOTH languages got their own 2/2/2 terciles (a global split would
    # put every fr doc in tail and every en doc in head)
    for lang in ("en", "fr"):
        assert set(per_lang[lang]) == {"head", "middle", "tail"}, lang
        assert sum(r.n_docs for r in per_lang[lang].values()) == 6
        rng = per_lang[lang]
        assert rng["head"].max_nll <= rng["middle"].min_nll
        assert rng["middle"].max_nll <= rng["tail"].min_nll
        # cutpoints are per-language constants inside that language's range
        ch = {r.cut_head for r in per_lang[lang].values()}
        assert len(ch) == 1
    # thresholds are drawn independently per language (a shared global
    # pair would be identical), and each pair lies inside its own
    # language's observed score range
    assert (
        per_lang["fr"]["head"].cut_head != per_lang["en"]["head"].cut_head
    )
    for lang in ("en", "fr"):
        lo = per_lang[lang]["head"].min_nll * 1e6
        hi = per_lang[lang]["tail"].max_nll * 1e6
        c = per_lang[lang]["head"]
        assert lo <= c.cut_head <= c.cut_middle <= hi, lang


def test_split_cluster_safe_no_leakage_and_partition(spark):
    """Planted chain a~b~c plus singletons: the whole chain lands in ONE
    split (leakage impossible by construction), leaky_clusters is 0,
    every doc is assigned exactly once, and singleton clusters count as
    their own cluster."""
    from cloudpelican_lsd_spark.operators import corpus as C

    docs = spark.createDataFrame(
        [(i,) for i in (1, 2, 3, 10, 20, 30, 40)], "doc_id long"
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3)], "doc_a long, doc_b long"
    )
    out = C.split_cluster_safe(docs, pairs).collect()
    assert sum(r.n_docs for r in out) == 7
    assert all(r.leaky_clusters == 0 for r in out)
    # 1 chain cluster + 4 singletons = 5 clusters across all splits
    assert sum(r.n_clusters for r in out) == 5
    # the chain moved as a unit: some split holds >= 3 docs in 1 cluster?
    # directly: re-derive the chain's split membership
    from cloudpelican_lsd_spark.operators.dedup import connected_components

    cc = {r.doc_id: r.cluster_id for r in connected_components(pairs).collect()}
    assert cc == {1: 1, 2: 1, 3: 1}
    # leakage really is structural: every doc with cluster 1 hashes from
    # the SAME cluster id, so no split can separate them; the operator's
    # leaky_clusters==0 assertion above is the audited invariant


def test_eval_decontaminate_flags_exact_overlap_only(spark):
    """A train doc sharing an n-gram with the eval slice is contaminated;
    an unrelated train doc is clean; a too-short train doc can never be
    flagged (no n-gram exists).  eval_mod=2 puts even doc_ids in eval."""
    from cloudpelican_lsd_spark.operators import corpus as C

    eval_text = "alpha beta gamma delta epsilon"
    rows = [
        (2, eval_text, "en", "web", 0),                    # eval slice
        (1, "x y " + eval_text, "en", "web", 0),           # contains eval 5-gram
        (3, "one two three four five six", "en", "web", 0),  # clean
        (5, "alpha beta", "en", "books", 0),               # too short for n=5
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = {
        r.source: r
        for r in C.eval_decontaminate(docs, n=5, eval_mod=2).collect()
    }
    assert out["web"].n_train_docs == 2
    assert out["web"].n_contaminated == 1 and out["web"].n_clean == 1
    assert out["books"].n_train_docs == 1
    assert out["books"].n_contaminated == 0 and out["books"].n_clean == 1


def test_eval_decontaminate_broadcasts_eval_side(spark, sf_dir):
    """With a benchmark-sized eval side, AQE must pick a broadcast for
    the LEFT SEMI at runtime (the broadcast is no longer FORCED: the
    harness's %97 eval slice grows linearly with the corpus, so a pinned
    F.broadcast would OOM at the 100 TB shape — AQE keeps the fast plan
    when the side is small and degrades to a shuffled semi-join when it
    is not).  AQE finalizes joins at execution, so collect() first."""
    from cloudpelican_lsd_spark.registry import QUERIES

    df = QUERIES["corpus_eval_decontaminate"](spark, sf_dir)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_doremi_step_properties(spark, sf_dir):
    """The EG update's load-bearing invariants: weights form a ppm
    simplex (sum within integer-floor slack of 1e6), the factor is
    strictly monotone in fail_ppm (the property the polynomial exp
    surrogate must preserve), eta=0 degenerates to exact token share,
    and out-of-envelope etas are rejected loudly."""
    import pytest as _pytest

    from cloudpelican_lsd_spark.operators import corpus as corpus_ops
    from cloudpelican_lsd_spark.sources.tables import load_table

    docs = load_table(spark, "documents", sf_dir)
    rows = corpus_ops.doremi_step(docs).collect()
    n_src = docs.select("source").distinct().count()
    assert len(rows) == n_src
    total = sum(r.weight_ppm for r in rows)
    assert 1_000_000 - n_src <= total <= 1_000_000  # floor-div slack
    # strict monotonicity of the surrogate: sort by fail_ppm, factors
    # must be non-decreasing, and strictly increasing on distinct x
    by_fail = sorted(rows, key=lambda r: r.fail_ppm)
    for a, b in zip(by_fail, by_fail[1:]):
        assert a.factor_micro <= b.factor_micro
        if (a.fail_ppm // 2) != (b.fail_ppm // 2):  # distinct x at eta=1/2
            assert a.factor_micro < b.factor_micro
    # surrogate accuracy: within 0.3% of true exp at every point
    import math

    for r in rows:
        x = (r.fail_ppm * 1) // 2
        true = math.exp(x / 1e6) * 1e6
        assert abs(r.factor_micro - true) / true < 0.003
    # eta=0: factor == 1e6 everywhere, weights == exact token share
    flat = corpus_ops.doremi_step(docs, eta_num=0, eta_den=1).collect()
    tot_tokens = sum(r.n_tokens for r in flat)
    for r in flat:
        assert r.factor_micro == 1_000_000
        assert r.weight_ppm == (r.n_tokens * 1_000_000) // tot_tokens
    # domains whose factor exceeds the token-weighted MEAN factor end
    # up above their token share (the exact EG renormalization law)
    share = {r.source: r.weight_ppm for r in flat}
    wmean = sum(r.n_tokens * r.factor_micro for r in rows) / tot_tokens
    for r in rows:
        if r.factor_micro > wmean:
            assert r.weight_ppm >= share[r.source]
        elif r.factor_micro < wmean:
            assert r.weight_ppm <= share[r.source] + 1  # floor-div slack
    with _pytest.raises(ValueError, match="negative learning rate"):
        corpus_ops.doremi_step(docs, eta_num=-1, eta_den=2)
    with _pytest.raises(ValueError, match="envelope"):
        corpus_ops.doremi_step(docs, eta_num=1, eta_den=1)


# ---------------------------------------------------------------------------
# Gopher repetition panel (Rae et al. 2021 Table A1)
# ---------------------------------------------------------------------------


def test_gopher_repetition_closed_form(spark):
    # doc 1: line "a b" repeated 3x -> dup_line_frac = 2/3, dup chars
    # 2*3/9; the top 2-gram "a b" occurs 3x of len 3 over 11 chars of
    # text ("a b\na b\na b") -> wait chars: text length = 11.
    docs = spark.createDataFrame(
        [
            (1, "a b\na b\na b"),
            # long enough that a single long-n-gram occurrence is a small
            # char fraction (the panel is calibrated for web-scale docs:
            # a 10-word doc "fails" top_3gram at a single occurrence)
            (2, " ".join(f"w{i:02d}" for i in range(40))),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in ts.gopher_repetition(docs).collect()}
    r1 = rows[1]
    assert r1["dup_line_frac"] == round(2 / 3, 6)
    # each line is 3 chars; 2 duplicate occurrences of 3 chars / 9 line chars
    assert r1["dup_line_char_frac"] == round(6 / 9, 6)
    # tokens: a b a b a b -> top 2-gram is "b a" or "a b", both count..
    # "a b" occurs 3x (positions 1,3,5), "b a" occurs 2x -> top is "a b"
    # chars = 3*3=9 over n_chars=11
    assert r1["top_2gram_char_frac"] == round(9 / 11, 6)
    # 5-grams: "a b a b a" x1, "b a b a b" x1 -> no dups
    assert r1["dup_5gram_char_frac"] == 0.0
    assert r1["pass_gopher"] == 0  # top_2gram 0.818 > 0.20
    r2 = rows[2]
    assert r2["dup_line_frac"] == 0.0
    assert r2["dup_5gram_char_frac"] == 0.0
    assert r2["pass_gopher"] == 1


def test_gopher_repetition_dup_ngram_and_tiebreak(spark):
    # "c c c c c c" -> 5-gram "c c c c c" occurs twice: dup chars =
    # (2-1)*9 over n_chars=11.  Top 2-gram "c c" count 5, len 3.
    docs = spark.createDataFrame(
        [(7, "c c c c c c")], "doc_id long, text string"
    )
    r = ts.gopher_repetition(docs).collect()[0]
    assert r["dup_5gram_char_frac"] == round(9 / 11, 6)
    assert r["top_2gram_char_frac"] == round(5 * 3 / 11, 6)
    # ties to the LONGEST top n-gram: "aa b aa b aa" has 2-grams
    # "aa b" (2x, len 4), "b aa" (2x, len 4) -> max len wins either way;
    # pin the encoded key path with equal counts, different lengths
    docs2 = spark.createDataFrame(
        [(8, "zz y zz y w")], "doc_id long, text string"
    )
    r2 = ts.gopher_repetition(docs2).collect()[0]
    # 2-grams: "zz y"x2(len4), "y zz"x1, "y w"x1 -> top = "zz y", 2*4=8
    assert r2["top_2gram_char_frac"] == round(8 / 11, 6)


def test_gopher_thresholds_verbatim():
    # the Table A1 constants, pinned so a refactor can't drift them
    assert ts.GOPHER_THRESHOLDS["dup_line_frac"] == 0.30
    assert ts.GOPHER_THRESHOLDS["top_2gram_char_frac"] == 0.20
    assert ts.GOPHER_THRESHOLDS["top_4gram_char_frac"] == 0.16
    assert ts.GOPHER_THRESHOLDS["dup_5gram_char_frac"] == 0.15
    assert ts.GOPHER_THRESHOLDS["dup_10gram_char_frac"] == 0.10
    assert len(ts.GOPHER_THRESHOLDS) == 11


# ---------------------------------------------------------------------------
# Winnowing fingerprints (Schleimer et al. 2003)
# ---------------------------------------------------------------------------


def _brute_winnow(text: str, k: int, w: int):
    """Reference implementation straight from the paper: per window of w
    k-gram hashes select the min, ties to the rightmost; distinct
    (pos, hash)."""
    import hashlib as _h

    L = len(text) - k + 1
    if L < 1:
        return set()
    hs = [
        int(_h.md5(text[i : i + k].encode()).hexdigest()[:7], 16)
        for i in range(L)
    ]
    sel = set()
    n_windows = max(L - w + 1, 1)
    for s in range(n_windows):
        window = hs[s : s + w]
        m = min(window)
        # rightmost occurrence of the min
        j = max(i for i, h in enumerate(window) if h == m)
        sel.add((s + j + 1, m))  # 1-based position
    return sel


def test_winnowing_matches_bruteforce(spark):
    texts = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "aaaaaaaaaaaaaaaaaaaa"),  # degenerate: all k-grams equal
        (3, "ab" * 30),
        (4, "short"),  # shorter than k -> no fingerprints
        (5, "exactly8"),  # exactly k chars -> one k-gram, one window
    ]
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    got = {
        (r["doc_id"], r["fpos"], r["fph"])
        for r in ts.winnowing_fingerprints(docs, k=8, w=4).collect()
    }
    want = set()
    for doc_id, text in texts:
        for pos, h in _brute_winnow(text, 8, 4):
            want.add((doc_id, pos, h))
    assert got == want


def test_winnowing_guarantee_shared_substring(spark):
    # the paper's guarantee: any shared substring of length >= w+k-1
    # (= 11 here) yields at least one shared fingerprint hash
    import random

    rng = random.Random(42)
    alpha = "abcdefghijklmnopqrstuvwxyz"
    shared = "".join(rng.choice(alpha) for _ in range(11))
    a = "".join(rng.choice(alpha) for _ in range(40)) + shared
    b = shared + "".join(rng.choice(alpha) for _ in range(40))
    docs = spark.createDataFrame(
        [(1, a), (2, b)], "doc_id long, text string"
    )
    fp = ts.winnowing_fingerprints(docs, k=8, w=4)
    h1 = {r["fph"] for r in fp.where(F.col("doc_id") == 1).collect()}
    h2 = {r["fph"] for r in fp.where(F.col("doc_id") == 2).collect()}
    assert h1 & h2, "shared 11-char substring must share a fingerprint"


def test_winnowing_density_bounds(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir).limit(200)
    rows = ts.winnowing_density(docs, k=8, w=4).collect()
    assert rows
    for r in rows:
        # at least one fingerprint per w consecutive windows, at most one
        # per window
        assert 1 / 4 <= r["density"] <= 1.0
        assert r["n_distinct_hashes"] <= r["n_fingerprints"]
        assert r["n_windows"] == max(r["n_kgrams"] - 3, 1)


def test_winnowing_pairs_planted_overlap(spark):
    # two docs sharing a long rare substring pair up; unrelated docs
    # don't; the boilerplate k-gram (shared by ALL docs) is df-pruned
    import random

    rng = random.Random(7)
    alpha = "abcdefghijklmnopqrstuvwxyz"
    plagiarized = "".join(rng.choice(alpha) for _ in range(60))
    rows = [
        (1, plagiarized + " tail one"),
        (2, "head two " + plagiarized),
    ] + [
        (i, "".join(rng.choice(alpha) for _ in range(80))) for i in range(3, 40)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = ts.winnowing_pairs(docs, k=8, w=4, max_df=8, min_shared=3).collect()
    keys = {(r["doc_a"], r["doc_b"]) for r in pairs}
    assert (1, 2) in keys
    p = next(r for r in pairs if (r["doc_a"], r["doc_b"]) == (1, 2))
    assert p["moss_sim"] > 0.3
    assert p["shared_fp"] <= min(p["n_fp_a"], p["n_fp_b"])


# ---------------------------------------------------------------------------
# Interpolated bigram LM
# ---------------------------------------------------------------------------


def test_bigram_logprob_matches_python_reference(spark):
    import math
    from collections import Counter

    texts = [(1, "a b a b a b"), (2, "a a b b c c"), (3, "c b a")]
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    got = {r["doc_id"]: r for r in ts.bigram_logprob(docs).collect()}

    # reference: same model, same micro-nat rounding
    toks = {i: t.split(" ") for i, t in texts}
    uni = Counter(w for ws in toks.values() for w in ws)
    total = sum(uni.values())
    bi = Counter(
        (ws[i - 1], ws[i]) for ws in toks.values() for i in range(1, len(ws))
    )
    ctx = Counter()
    for (p, _c), n in bi.items():
        ctx[p] += n
    lam = ts.BIGRAM_LAMBDA
    for doc_id, ws in toks.items():
        sb = su = 0
        for i, w in enumerate(ws):
            u = round(-math.log(uni[w] / total) * 1e6)
            su += u
            if i == 0:
                sb += u
            else:
                p = lam * (bi[(ws[i - 1], w)] / ctx[ws[i - 1]]) + (1 - lam) * (
                    uni[w] / total
                )
                sb += round(-math.log(p) * 1e6)
        n = len(ws)
        mb = (2 * sb + n) // (2 * n)
        mu = (2 * su + n) // (2 * n)
        r = got[doc_id]
        assert r["n_tokens"] == n
        assert r["mean_nll_bi_micro"] == mb, doc_id
        assert r["mean_nll_uni_micro"] == mu, doc_id
        assert r["lm_gain_micro"] == mu - mb
    # "a b a b a b": p(b|a) ~ 1 -> strong positive context gain
    assert got[1]["lm_gain_micro"] > 0


# ---------------------------------------------------------------------------
# nDCG@k
# ---------------------------------------------------------------------------


def test_ndcg_disc_constants_are_exact():
    import math

    for r, d in ts.NDCG_DISC_PPM.items():
        assert d == round(1e6 / math.log2(1 + r)), r
    assert len(ts.NDCG_DISC_PPM) == 10


def test_ndcg_topk_properties(spark, sf_dir):
    rows = ts.ndcg_topk(
        load_table(spark, "documents", sf_dir), probe_mod=25, q_tokens=4, topk=10
    ).collect()
    assert rows
    for r in rows:
        # nDCG in [0, 1]; IDCG >= DCG by construction of the ideal order
        assert 0 <= r["ndcg_ppm"] <= 1_000_000, r
        assert r["idcg_micro"] >= r["dcg_micro"] >= 0
        # the probe itself matches all its query terms -> at least one
        # candidate exists for every emitted qid
        assert r["n_candidates"] >= 1


def test_ndcg_perfect_ranking_scores_one(spark):
    # corpus where the scorer's ranking IS the ideal ranking: every doc
    # shares a descending number of query terms with the probe, and
    # tf*idf orders them identically -> ndcg_ppm == 1e6 for the probe
    docs = spark.createDataFrame(
        [
            (0, "aa bb cc dd ee ff"),       # probe (doc_id % 25 == 0)
            (1, "aa bb cc dd xx yy"),
            (2, "aa bb zz ww xx yy"),
            (3, "qq rr zz ww xx yy"),
        ],
        "doc_id long, text string",
    )
    out = {r["qid"]: r for r in ts.ndcg_topk(docs, probe_mod=25).collect()}
    assert out[0]["ndcg_ppm"] == 1_000_000


# ---------------------------------------------------------------------------
# Heaps'-law vocabulary growth
# ---------------------------------------------------------------------------


def test_heaps_law_closed_form(spark):
    # 4 docs, 2 buckets (n_buckets=2, max_id+1=4): docs 0,1 -> bucket 0;
    # docs 2,3 -> bucket 1
    docs = spark.createDataFrame(
        [
            (0, "a b c"),
            (1, "a b"),
            (2, "a d"),
            (3, "d e"),
        ],
        "doc_id long, text string",
    )
    rows = {r["bucket"]: r for r in ts.heaps_law(docs, n_buckets=2).collect()}
    assert rows[0]["bucket_tokens"] == 5 and rows[0]["bucket_new_terms"] == 3
    assert rows[1]["bucket_tokens"] == 4 and rows[1]["bucket_new_terms"] == 2
    assert rows[1]["cum_tokens"] == 9 and rows[1]["cum_vocab"] == 5


def test_heaps_law_invariants(spark, sf_dir):
    rows = sorted(
        ts.heaps_law(load_table(spark, "documents", sf_dir), 20).collect(),
        key=lambda r: r["bucket"],
    )
    assert 1 <= len(rows) <= 20
    # cumulative columns are the running sums; vocab never exceeds tokens
    ct = cv = 0
    for r in rows:
        ct += r["bucket_tokens"]
        cv += r["bucket_new_terms"]
        assert r["cum_tokens"] == ct and r["cum_vocab"] == cv
        assert r["cum_vocab"] <= r["cum_tokens"]
    # total vocab == corpus distinct tokens
    docs = load_table(spark, "documents", sf_dir)
    n_vocab = (
        docs.select(F.explode(F.split(F.lower("text"), " ")).alias("t"))
        .distinct()
        .count()
    )
    assert rows[-1]["cum_vocab"] == n_vocab


def test_zipf_audit_closed_form(spark):
    docs = spark.createDataFrame(
        [(1, "a a a a b b c"), (2, "a a b d")],
        "doc_id long, text string",
    )
    rows = {r["rank"]: r for r in ts.zipf_audit(docs, topn=3).collect()}
    # counts: a=6, b=3, c=1, d=1 -> top3 = a(6), b(3), c(1, tie term asc)
    assert len(rows) == 3
    assert rows[1]["term"] == "a" and rows[1]["cnt"] == 6
    assert rows[1]["ratio_to_top_ppm"] == 1_000_000
    assert rows[2]["term"] == "b" and rows[2]["ratio_to_top_ppm"] == 500_000
    assert rows[2]["zipf_expected_ppm"] == 500_000
    assert rows[3]["term"] == "c"
    assert rows[1]["freq_ppm"] == 6 * 1_000_000 // 11


def test_gopher_by_source_conservation(spark, sf_dir):
    from cloudpelican_lsd_spark.registry._core import QUERIES

    rows = QUERIES["corpus_gopher_by_source"](spark, sf_dir).collect()
    assert rows
    docs = load_table(spark, "documents", sf_dir)
    assert sum(r["n_docs"] for r in rows) == docs.where(F.length("text") > 0).count()
    for r in rows:
        assert 0 <= r["n_pass"] <= r["n_docs"]
        assert 0 <= r["kept_tokens"] <= r["total_tokens"]
        assert r["pass_ppm"] == r["n_pass"] * 1_000_000 // r["n_docs"]


def test_distinct_ngrams_closed_form(spark):
    docs = spark.createDataFrame(
        [(1, "a a a a", "s1"), (2, "a b c d", "s2")],
        "doc_id long, text string, source string",
    )
    rows = {(r["source"], r["n"]): r for r in ts.distinct_ngrams(docs, 3).collect()}
    # s1 unigrams: 4 occurrences of "a" -> 1 distinct / 4 total
    assert rows[("s1", 1)]["total_ngrams"] == 4
    assert rows[("s1", 1)]["distinct_ngrams"] == 1
    assert rows[("s1", 1)]["distinct_ppm"] == 250_000
    # s1 bigrams: "a a" x3 -> 1/3
    assert rows[("s1", 2)]["distinct_ngrams"] == 1
    assert rows[("s1", 2)]["total_ngrams"] == 3
    # s2: fully diverse at every n
    for n in (1, 2, 3):
        assert rows[("s2", n)]["distinct_ppm"] == 1_000_000


def test_k_anonymity_closed_form(spark):
    from cloudpelican_lsd_spark.operators import corpus as co

    # classes: (en, a, 0) -> 3 docs; (en, b, 0) -> 1 doc; (fr, a, 1) -> 1
    docs = spark.createDataFrame(
        [
            (1, "w " * 4, "en", "a"),
            (2, "w " * 4, "en", "a"),
            (3, "w " * 4, "en", "a"),
            (4, "w " * 4, "en", "b"),
            (5, "w " * 14, "fr", "a"),
        ],
        "doc_id long, text string, lang string, source string",
    ).select("doc_id", F.expr("trim(text)").alias("text"), "lang", "source")
    rows = {r["k"]: r for r in co.k_anonymity(docs, len_bucket=10).collect()}
    # k=2: two singleton classes below -> 2 groups, 2 docs at risk of 5
    assert rows[2]["n_groups_below"] == 2
    assert rows[2]["n_docs_at_risk"] == 2
    assert rows[2]["risk_ppm"] == 2 * 1_000_000 // 5
    # k=5: all three classes below -> 5 docs at risk
    assert rows[5]["n_groups_below"] == 3
    assert rows[5]["n_docs_at_risk"] == 5
    assert rows[10]["risk_ppm"] == 1_000_000


def test_winnowing_long_doc_beyond_old_modulus(spark):
    # regression for the session-3 review finding: with the old
    # M=8192 position modulus, documents longer than 8191 chars
    # silently corrupted the rightmost-min tie-break; M=2^31 must match
    # brute force on a 10k-char doc
    import random

    rng = random.Random(11)
    text = "".join(rng.choice("abcdefgh") for _ in range(10_000))
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got = {
        (r["fpos"], r["fph"])
        for r in ts.winnowing_fingerprints(docs, k=8, w=4).collect()
    }
    assert got == _brute_winnow(text, 8, 4)
    assert max(p for p, _ in got) > 8192 - 8


def test_clean_v4_is_v3_with_gopher_gate(spark, sf_dir):
    """v4's survivors must be a subset of v3's (the added panel gate
    only removes), every v4 survivor must pass the panel on the
    line-deduped text, and the gate must actually fire on the planted
    corpus (strict subset)."""
    from cloudpelican_lsd_spark.operators import corpus as co
    from cloudpelican_lsd_spark.operators import textstats as t2
    from cloudpelican_lsd_spark.registry.dedup_core import _lined_corpus

    lined = _lined_corpus(spark, sf_dir)
    v3 = {r["doc_id"] for r in co.corpus_clean_v3(lined).collect()}
    v4 = {r["doc_id"] for r in co.corpus_clean_v4(lined).collect()}
    assert v4 <= v3
    assert v4 < v3, "gopher gate never fired — fixture lost its teeth"
    ld = t2.line_dedup(lined, min_df=3).select(
        "doc_id", F.col("clean_text").alias("text")
    )
    passing = {
        r["doc_id"]
        for r in t2.gopher_repetition(ld).where(F.col("pass_gopher") == 1).collect()
    }
    assert v4 <= passing


def test_eval_decontaminate_neardup_catches_paraphrase_copy(spark):
    """A train doc that copies an eval doc with a light edit (the case
    exact n-gram overlap at n=8 can shrug off but band-MinHash catches)
    must be flagged; an unrelated doc must not.  doc 0 is the eval slice
    (doc_id % 97 == 0)."""
    from cloudpelican_lsd_spark.operators import corpus as co

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lam mu nu xi omicron pi rho sigma tau upsilon")
    rows = [
        (0, base, "en", "bench"),                     # eval
        (1, base.replace("tau", "tav"), "en", "web"),  # near-copy -> flag
        (2, "totally different words entirely here now and then some more",
         "en", "web"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    out = {r["source"]: r for r in co.eval_decontaminate_neardup(docs).collect()}
    assert out["web"]["n_train_docs"] == 2
    assert out["web"]["n_flagged"] == 1
    assert out["web"]["n_clean"] == 1


def test_utf8_stats_exact(spark):
    docs = spark.createDataFrame(
        [(1, "abc", "en", "s1"), (2, "日本語", "ja", "s2")],
        "doc_id long, text string, lang string, source string",
    )
    rows = {r["source"]: r for r in ts.utf8_stats(docs).collect()}
    assert rows["s1"]["n_bytes"] == 3 and rows["s1"]["excess_bytes"] == 0
    assert rows["s2"]["n_chars"] == 3 and rows["s2"]["n_bytes"] == 9
    assert rows["s2"]["bytes_per_char_ppm"] == 3_000_000
    assert rows["s2"]["excess_ppm"] == 6 * 1_000_000 // 9


def test_decontaminate_agreement_partitions(spark, sf_dir):
    """The four agreement cells must partition the train docs, and the
    marginals must equal the two parent queries' flag counts."""
    from cloudpelican_lsd_spark.operators import corpus as co

    d = load_table(spark, "documents", sf_dir)
    ag = {r["source"]: r for r in co.decontaminate_agreement(d).collect()}
    ex = {r["source"]: r for r in co.eval_decontaminate(d).collect()}
    nd = {r["source"]: r for r in co.eval_decontaminate_neardup(d).collect()}
    for s, r in ag.items():
        assert (
            r["n_both"] + r["n_exact_only"] + r["n_neardup_only"] + r["n_clean"]
            == r["n_train_docs"]
        )
        assert r["n_both"] + r["n_exact_only"] == ex[s]["n_contaminated"]
        assert r["n_both"] + r["n_neardup_only"] == nd[s]["n_flagged"]


def test_gopher_sensitivity_consistency(spark, sf_dir):
    """Sensitivity marginals must reconcile with the panel itself:
    sum over rules of sole-fails <= total failing docs, every rule's
    sole-fails <= its fails, and a doc failing NO rule is exactly the
    panel's pass set."""
    docs = ts.split_into_lines(
        load_table(spark, "documents", sf_dir), words_per_line=10
    )
    sens = ts.gopher_sensitivity(docs)
    # r8 lazy-unpivot shape: the panel must be IN the query plan (a
    # parquet scan reachable from the output).  The former
    # collect()+createDataFrame builder planned as a single ExistingRDD
    # stub — driver-side data work (guide §5) that also hid the panel
    # cost from every plan audit.  The 11-row literal rules relation is
    # still an ExistingRDD leaf; the property pinned here is that the
    # corpus scan is not.
    plan = sens._jdf.queryExecution().executedPlan().toString()
    assert "Scan parquet" in plan or "FileScan" in plan
    rows = {r["rule"]: r for r in sens.collect()}
    assert set(rows) == set(ts.GOPHER_THRESHOLDS)
    panel = ts.gopher_repetition(docs).collect()
    n_docs = len(panel)
    n_fail_docs = sum(1 for r in panel if r["pass_gopher"] == 0)
    assert sum(r["n_sole_fail"] for r in rows.values()) <= n_fail_docs
    for name, r in rows.items():
        assert 0 <= r["n_sole_fail"] <= r["n_fail"] <= n_docs
        assert r["threshold"] == ts.GOPHER_THRESHOLDS[name]
        assert r["fail_ppm"] == r["n_fail"] * 1_000_000 // n_docs


# ---------------------------------------------------------------------------
# Kneser-Ney bigram LM
# ---------------------------------------------------------------------------


def test_kneser_ney_matches_python_reference(spark):
    import math
    from collections import Counter

    texts = [(1, "a b a b a b"), (2, "a a b b c c"), (3, "c b a")]
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    got = {r["doc_id"]: r for r in ts.kneser_ney_logprob(docs).collect()}

    toks = {i: t.split(" ") for i, t in texts}
    uni = Counter(w for ws in toks.values() for w in ws)
    total = sum(uni.values())
    bi = Counter(
        (ws[i - 1], ws[i]) for ws in toks.values() for i in range(1, len(ws))
    )
    ctx = Counter()      # c(v .)
    ntypes = Counter()   # T(v): distinct continuations of v
    nprevs = Counter()   # |{v : c(v,w) > 0}|
    for (p, c), n in bi.items():
        ctx[p] += n
        ntypes[p] += 1
        nprevs[c] += 1
    tt = len(bi)
    D = ts.KN_DISCOUNT
    for doc_id, ws in toks.items():
        sk = su = 0
        for i, w in enumerate(ws):
            u = round(-math.log(uni[w] / total) * 1e6)
            su += u
            if i == 0:
                sk += u
            else:
                v = ws[i - 1]
                p = (bi[(v, w)] - D) / ctx[v] + (D * ntypes[v] / ctx[v]) * (
                    nprevs[w] / tt
                )
                sk += round(-math.log(p) * 1e6)
        n = len(ws)
        mk = (2 * sk + n) // (2 * n)
        mu = (2 * su + n) // (2 * n)
        r = got[doc_id]
        assert r["n_tokens"] == n
        assert r["mean_nll_kn_micro"] == mk, doc_id
        assert r["mean_nll_uni_micro"] == mu, doc_id
        assert r["kn_gain_micro"] == mu - mk
    # "a b a b a b": near-deterministic context -> strong positive gain
    assert got[1]["kn_gain_micro"] > 0


def test_kneser_ney_probabilities_normalize(spark):
    """Over each observed context v, Σ_w p_KN(w|v) across the OBSERVED
    continuations stays <= 1 (the discount reserves mass), and the
    per-context discounted+backoff decomposition recomputed in Python
    sums to 1 when the backoff term is spread over the full
    continuation distribution (Σ_w P_cont(w) = 1)."""
    from collections import Counter

    texts = [(1, "a b a b a c"), (2, "b a c a b"), (3, "c c a b a")]
    toks = {i: t.split(" ") for i, t in texts}
    bi = Counter(
        (ws[i - 1], ws[i]) for ws in toks.values() for i in range(1, len(ws))
    )
    ctx = Counter()
    ntypes = Counter()
    nprevs = Counter()
    for (p, c), n in bi.items():
        ctx[p] += n
        ntypes[p] += 1
        nprevs[c] += 1
    tt = len(bi)
    D = ts.KN_DISCOUNT
    vocab = {w for ws in toks.values() for w in ws}
    assert abs(sum(nprevs[w] / tt for w in vocab) - 1.0) < 1e-12
    for v in ctx:
        full = sum(
            (max(bi[(v, w)] - D, 0.0)) / ctx[v]
            + (D * ntypes[v] / ctx[v]) * (nprevs[w] / tt)
            for w in vocab
        )
        assert abs(full - 1.0) < 1e-9, v


def test_session4_operators_survive_degenerate_inputs(spark):
    """Empirical robustness probe (the session-3 discipline) over the
    session-4 text/dedup entry points: empty corpus, single-token doc,
    whitespace runs, emoji + CJK, and a no-duplicates corpus must not
    crash, ANSI-abort, or emit out-of-domain values."""
    from cloudpelican_lsd_spark.operators import dedup as dd

    weird = spark.createDataFrame(
        [
            (1, "x"),                      # single token: unigram path only
            (2, "  "),                     # whitespace -> empty-string tokens
            (3, "🎉 你好 世界 🎉 你好"),      # emoji + CJK
            (4, "z " * 2000),              # long repetitive doc
            (5, "solo_token_never_repeats unique1 unique2 unique3"),
        ],
        "doc_id long, text string",
    )
    kn = {r.doc_id: r for r in ts.kneser_ney_logprob(weird).collect()}
    assert set(kn) == {1, 2, 3, 4, 5}
    for r in kn.values():
        assert r.n_tokens >= 1
        assert r.mean_nll_kn_micro >= 0 and r.mean_nll_uni_micro >= 0
    # single-token doc: KN == unigram (first-token convention), gain 0
    assert kn[1].kn_gain_micro == 0

    empty = spark.createDataFrame([], "doc_id long, text string")
    assert ts.kneser_ney_logprob(empty).collect() == []

    # threshold sweep over a corpus with shingles but no near-dups:
    # either no candidate pairs (0 rows) or all-zero pass counts
    uniq = spark.createDataFrame(
        [(i, f"totally distinct document number {i} "
             f"with its own words w{i}a w{i}b w{i}c w{i}d") for i in range(8)],
        "doc_id long, text string",
    )
    rows = dd.threshold_sweep(uniq, num_hashes=12, rows_per_band=3, n=3).collect()
    for r in rows:
        assert r.n_pairs_true >= r.n_docs_flagged >= 0
    # sweep over an all-identical corpus: every pair passes every cut
    same = spark.createDataFrame(
        [(i, "the exact same text in every row of this corpus") for i in range(4)],
        "doc_id long, text string",
    )
    srows = {r.thr_pct: r for r in dd.threshold_sweep(
        same, num_hashes=12, rows_per_band=3, n=3).collect()}
    assert srows and all(r.n_pairs_true == r.n_pairs_est for r in srows.values())
    assert srows[90].n_docs_flagged == 3  # all but the keeper


def test_decontaminate_ngram_sweep_consistency(spark, sf_dir):
    """The sweep must be monotone non-increasing in n (an (n+1)-gram
    match implies an n-gram match for n in the same sweep when both
    sizes fit), its n=8 row must equal the corpus-level sum of the
    per-source eval_decontaminate report, and a planted verbatim
    13-gram must be flagged at every n."""
    from cloudpelican_lsd_spark.operators import corpus as co

    docs = load_table(spark, "documents", sf_dir)
    got = {r.n: r for r in co.decontaminate_ngram_sweep(
        docs, sizes=(4, 8, 13), eval_mod=97).collect()}
    assert sorted(got) == [4, 8, 13]
    assert got[4].n_contaminated >= got[8].n_contaminated >= got[13].n_contaminated
    per_source = co.eval_decontaminate(docs, n=8, eval_mod=97).collect()
    assert got[8].n_contaminated == sum(r.n_contaminated for r in per_source)
    assert got[8].n_train_docs == sum(r.n_train_docs for r in per_source)
    for r in got.values():
        assert r.contamination_ppm == r.n_contaminated * 1000000 // r.n_train_docs

    # planted verbatim overlap: doc 0 is eval (0 % 97 == 0); a train doc
    # repeating 13 of its words verbatim must flag at every n
    import pyspark.sql.functions as F  # noqa: N812

    ev_text = docs.where(F.col("doc_id") == 0).collect()[0].text
    first13 = " ".join(ev_text.lower().split(" ")[:13])
    planted = docs.unionByName(
        spark.createDataFrame(
            [(999_001, "PREFIX " + first13 + " SUFFIX", "en", "web", 1)],
            docs.schema.simpleString().replace("struct<", "").replace(">", "")
            .replace(":", " ").replace(",", ", "),
        )
    )
    got2 = {r.n: r for r in co.decontaminate_ngram_sweep(
        planted, sizes=(4, 8, 13), eval_mod=97).collect()}
    for n in (4, 8, 13):
        assert got2[n].n_contaminated >= got[n].n_contaminated + (
            1 if len(ev_text.split(" ")) >= 13 else 0
        )


def test_c4_sensitivity_consistency(spark, sf_dir):
    """Invariants tying the sensitivity report to the audit panel it
    diagnoses: per-rule n_fail equals c4_audit's count, sole-fails never
    exceed fails, the sum of sole-fails never exceeds the panel's
    any_rule total, and a planted doc failing ONLY the terminal-punct
    rule increments exactly that rule's sole count."""
    from cloudpelican_lsd_spark.operators import corpus as co

    docs = load_table(spark, "documents", sf_dir)
    sens = {r.rule: r for r in co.c4_sensitivity(docs).collect()}
    audit = {r.rule: r for r in co.c4_audit(docs).collect()}
    assert set(sens) == set(co.C4_RULES)
    for rule, r in sens.items():
        assert r.n_fail == audit[rule].n_fail, rule
        assert 0 <= r.n_sole_fail <= r.n_fail
        assert r.fail_ppm == r.n_fail * 1000000 // r.n_docs
    assert sum(r.n_sole_fail for r in sens.values()) <= audit["any_rule"].n_fail

    # 30 tokens: 10 intact stopwords (density fine) + 20 distinct 7-char
    # fillers (TTR + mean-length fine), none > 15 chars, ends without
    # . ! ? — fails ONLY no_terminal_punct
    text = "the of and to in that it is was for " + " ".join(
        f"word{i:03d}" for i in range(20)
    )
    planted = docs.unionByName(
        spark.createDataFrame(
            [(999_002, text, "en", "web", len(text))],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
    )
    sens2 = {r.rule: r for r in co.c4_sensitivity(planted).collect()}
    assert sens2["no_terminal_punct"].n_sole_fail == \
        sens["no_terminal_punct"].n_sole_fail + 1
