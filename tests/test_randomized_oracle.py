"""Randomized cross-checks: seeded synthetic data, Spark operator vs a
naive pure-Python reference implementation.  Complements the DuckDB parity
gate (which uses the fixed driver testdata) with adversarial shapes —
duplicate texts, shared boilerplate, value ties, tiny docs.
"""

from __future__ import annotations

import itertools
import random

from pyspark.sql import functions as F

from cloudpelican_lsd_spark.operators import dedup as dedup_ops
from cloudpelican_lsd_spark.operators.tail import topk_per_group_salted

VOCAB = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]


def _random_docs(rng: random.Random, n_docs: int) -> list[tuple[int, str]]:
    docs = []
    for i in range(n_docs):
        toks = [rng.choice(VOCAB) for _ in range(rng.randint(1, 12))]
        if rng.random() < 0.3:  # shared boilerplate prefix (hot shingles)
            toks = ["common", "header", "line", *toks]
        docs.append((i, " ".join(toks)))
    if n_docs > 3:  # exact duplicate pair
        docs.append((n_docs, docs[0][1]))
    return docs


def _py_shingles(text: str, n: int = 3) -> set[str]:
    toks = text.lower().split(" ")
    return {" ".join(toks[i : i + n]) for i in range(max(len(toks) - n + 1, 0))}


def _py_jaccard_pairs(docs, n=3, num=1, den=5, max_df=None):
    sh = {d: _py_shingles(t, n) for d, t in docs}
    if max_df is not None:
        df_cnt: dict[str, int] = {}
        for s in sh.values():
            for g in s:
                df_cnt[g] = df_cnt.get(g, 0) + 1
        hot = {g for g, c in df_cnt.items() if c > max_df}
    else:
        hot = set()
    out = {}
    for (a, sa), (b, sb) in itertools.combinations(sorted(sh.items()), 2):
        inter = len((sa & sb) - hot)
        union = len(sa) + len(sb) - len(sa & sb)
        if inter and inter * den >= union * num:
            out[(a, b)] = (inter, union)
    return out


def test_jaccard_matches_python_reference(spark):
    for seed in (7, 11, 13):
        rng = random.Random(seed)
        docs = _random_docs(rng, 25)
        df = spark.createDataFrame(docs, ["doc_id", "text"])
        got = {
            (r.doc_a, r.doc_b): (r.inter_cnt, r.union_cnt)
            for r in dedup_ops.ngram_jaccard_pairs(
                df, n=3, threshold_num=1, threshold_den=5
            ).collect()
        }
        assert got == _py_jaccard_pairs(docs, 3, 1, 5), f"seed={seed}"


def test_jaccard_pruned_matches_python_reference(spark):
    rng = random.Random(42)
    docs = _random_docs(rng, 30)
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        (r.doc_a, r.doc_b): r.inter_cnt
        for r in dedup_ops.ngram_jaccard_pairs(
            df, n=3, threshold_num=1, threshold_den=5, max_df=4
        ).collect()
    }
    want = {
        k: v[0] for k, v in _py_jaccard_pairs(docs, 3, 1, 5, max_df=4).items()
    }
    assert got == want


def test_group_pairs_matches_combinations(spark):
    rng = random.Random(3)
    rows = [(rng.randint(0, 5), i) for i in range(60)]
    df = spark.createDataFrame(rows, ["bucket", "doc_id"])
    got = {
        (r.x.doc_id, r.y.doc_id)
        for r in dedup_ops._group_pairs(df, ["bucket"], ["doc_id"]).collect()
    }
    by_bucket: dict[int, list[int]] = {}
    for b, d in rows:
        by_bucket.setdefault(b, []).append(d)
    want = {
        pair
        for mem in by_bucket.values()
        for pair in itertools.combinations(sorted(set(mem)), 2)
    }
    assert got == want


def test_group_pairs_max_group_drops_hot_buckets(spark):
    """The r8 window-count skew guard must keep the exact pre-r8
    semantics: a bucket with MORE than max_group distinct members emits
    no pairs at all; buckets at or under the cap emit all pairs."""
    rng = random.Random(7)
    rows = list({(rng.randint(0, 7), rng.randint(0, 30)) for _ in range(120)})
    df = spark.createDataFrame(rows, ["bucket", "doc_id"])
    cap = 6
    got = {
        (r.x.doc_id, r.y.doc_id)
        for r in dedup_ops._group_pairs(
            df, ["bucket"], ["doc_id"], max_group=cap
        ).collect()
    }
    by_bucket: dict[int, set[int]] = {}
    for b, d in rows:
        by_bucket.setdefault(b, set()).add(d)
    want = {
        pair
        for mem in by_bucket.values()
        if len(mem) <= cap
        for pair in itertools.combinations(sorted(mem), 2)
    }
    assert got == want


def test_salted_topk_with_ties_matches_reference(spark):
    rng = random.Random(99)
    rows = [
        (i, rng.choice(["x", "y"]), float(rng.randint(0, 4)))  # many ties
        for i in range(80)
    ]
    df = spark.createDataFrame(rows, ["event_id", "event_type", "value"])
    got = {
        (r.event_type, r.event_id, r.value)
        for r in topk_per_group_salted(df, k=5).collect()
    }
    want = set()
    for g in ("x", "y"):
        members = sorted(
            ((v, i) for i, t, v in rows if t == g),
            key=lambda p: (-p[0], p[1]),
        )[:5]
        want |= {(g, i, v) for v, i in members}
    assert got == want


def test_zero_norm_vectors_are_excluded(spark):
    """Cosine ops drop zero-norm vectors instead of aborting on ANSI
    divide-by-zero (Spark 4 default)."""
    from cloudpelican_lsd_spark.operators.similarity import (
        cosine_topk,
        lsh_near_pairs,
    )

    rows = [
        (0, [0.0] * 64, 0),
        (1, [1.0] * 8 + [0.0] * 56, 0),
        (2, [0.5] * 8 + [0.0] * 56, 0),
    ]
    emb = spark.createDataFrame(
        rows, "vec_id INT, embedding ARRAY<FLOAT>, label INT"
    )
    pairs = lsh_near_pairs(emb, bits=2, min_cos_num=1, min_cos_den=10).collect()
    assert [(r.vec_a, r.vec_b, r.cos) for r in pairs] == [(1, 2, 1.0)]
    topk = cosine_topk(emb, num_queries=2, k=2).collect()
    assert [(r.qid, r.cid) for r in topk] == [(1, 2)]


def test_json_ops_tolerate_malformed_values(spark):
    """try_cast semantics: malformed JSON numerics become NULL instead of
    aborting the job under ANSI mode."""
    from cloudpelican_lsd_spark.registry import QUERIES  # noqa: F401
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, '{"k": "60"}'), (2, '{"k": "oops"}'), (3, "not json"), (4, None)],
        ["event_id", "props"],
    )
    k = F.expr("try_cast(get_json_object(props, '$.k') AS long)")
    rows = df.select("event_id", k.alias("k_val")).collect()
    assert {r.event_id: r.k_val for r in rows} == {1: 60, 2: None, 3: None, 4: None}


def test_simhash_complete_recall_vs_bruteforce(spark, sf_dir):
    """The rotated-block variant must find EVERY pair with hamming <= 3
    (pigeonhole guarantee); the prefix heuristic may miss some."""
    from cloudpelican_lsd_spark.sources.tables import load_table

    docs = load_table(spark, "documents", sf_dir).limit(200)
    fps = {r.doc_id: r.simhash for r in dedup_ops.simhash(docs).collect()}
    want = {
        (a, b)
        for a, b in itertools.combinations(sorted(fps), 2)
        if bin(fps[a] ^ fps[b]).count("1") <= 3
    }
    got = {
        (r.doc_a, r.doc_b)
        for r in dedup_ops.simhash_near_pairs_complete(
            docs, max_hamming=3, n_blocks=4
        ).collect()
    }
    assert got == want


def test_grep_pipeline_matches_python_reference(spark):
    """Flagship grammar vs a re/contains Python reference on random lines."""
    import re as _re

    from cloudpelican_lsd_spark.operators.grep_pipeline import GrepPipeline

    rng = random.Random(5)
    words = ["GET", "POST", "error", "ok", "checkout", "404", "200", "cart"]
    lines = [
        " ".join(rng.choice(words) for _ in range(rng.randint(2, 6)))
        + f" value={rng.randint(0, 999)}"
        for _ in range(300)
    ]
    df = spark.createDataFrame([(l,) for l in lines], ["_raw"])

    cases = [
        ("cat f | grep error | sort", 
         lambda l: "error" in l, False),
        ("cat f | grep -v 404 | grep -i ERROR | sort", 
         lambda l: "404" not in l and "error" in l.lower(), False),
        ("cat f | grep -e 'value=[0-9][0-9][0-9]' | sort - r", 
         lambda l: _re.search(r"value=[0-9][0-9][0-9]", l) is not None, True),
        ("cat f | grep -i -e 'ERROR|CHECKOUT' | sort | limit 40", 
         lambda l: _re.search(r"(?i)ERROR|CHECKOUT", l) is not None, False),
    ]
    for pipe, pred, desc in cases:
        got = [r._raw for r in GrepPipeline.parse(pipe).apply(df).collect()]
        want = sorted((l for l in lines if pred(l)), reverse=desc)
        p = GrepPipeline.parse(pipe)
        if p.limit:
            want = want[: p.limit]
        assert got == want, pipe


def test_streaming_stats_consistent_with_batch(spark, tmp_path, sf_dir):
    """The streaming engine's merge-on-read stats equal the batch
    metric_counts over the same matched lines (layer consistency)."""
    import os

    from cloudpelican_lsd_spark.catalog import FilterCatalog
    from cloudpelican_lsd_spark.operators.stats import metric_counts
    from cloudpelican_lsd_spark.streaming import pipeline as sp

    src = str(tmp_path / "in")
    os.makedirs(src, exist_ok=True)
    rng = random.Random(8)
    lines = [
        f"2024-02-01T10:{m:02d}:{s:02d}.000+00:00 h app: "
        + ("error failed x" if rng.random() < 0.3 else "ok served y")
        for m in range(10)
        for s in range(0, 60, 7)
    ]
    with open(os.path.join(src, "part-000.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")

    cat = FilterCatalog()
    cat.create("everything", "app")
    eng = sp.StreamingEngine(spark, cat, str(tmp_path / "eng"))
    q = eng.start(sp.file_source(spark, src), trigger={"availableNow": True})
    q.awaitTermination(120)

    fid = cat.get("everything").id
    streamed = {
        (r.metric, r.bucket): r.cnt for r in eng.stats(fid).collect()
    }
    matched = eng.results().select(
        "_raw", "ts_epoch"
    )
    batch = {
        (r.metric, r.bucket): r.cnt
        for r in metric_counts(matched, rollup_sec=60).collect()
    }
    assert streamed == batch


def test_stats_family_matches_python_reference(spark):
    """bucket → re-rollup → gap-fill vs a dict-based Python reference on
    random epochs (the reference CLI's supervisorcon.go:43-119 math)."""
    from cloudpelican_lsd_spark.operators.stats import (
        gap_fill,
        metric_counts,
        rollup_window,
    )

    rng = random.Random(17)
    base = 1_700_000_000
    rows = [
        (
            i,
            base + rng.randint(0, 3600),
            "error x" if rng.random() < 0.25 else "ok y",
        )
        for i in range(500)
    ]
    df = spark.createDataFrame(rows, ["event_id", "ts_epoch", "_raw"])

    mc = metric_counts(df, rollup_sec=60)
    got_mc = {(r.metric, r.bucket): r.cnt for r in mc.collect()}
    want_mc: dict[tuple[int, int], int] = {}
    for _, ts, raw in rows:
        b = ts - ts % 60
        want_mc[(1, b)] = want_mc.get((1, b), 0) + 1
        if "error" in raw:
            want_mc[(2, b)] = want_mc.get((2, b), 0) + 1
    assert got_mc == want_mc

    rolled = rollup_window(mc, rollup_sec=300)
    got_roll = {(r.metric, r.bucket): r.cnt for r in rolled.collect()}
    want_roll: dict[tuple[int, int], int] = {}
    for (m, b), c in want_mc.items():
        rb = b - b % 300
        want_roll[(m, rb)] = want_roll.get((m, rb), 0) + c
    assert got_roll == want_roll

    filled = gap_fill(rolled, rollup_sec=300)
    got_fill = {(r.metric, r.bucket): r.cnt for r in filled.collect()}
    lo = min(b for _, b in want_roll)
    hi = max(b for _, b in want_roll)
    want_fill = {
        (m, b): want_roll.get((m, b), 0)
        for m in {m for m, _ in want_roll}
        for b in range(lo, hi + 1, 300)
    }
    assert got_fill == want_fill


def test_repetition_ratio_matches_python_reference(spark):
    from collections import Counter

    from cloudpelican_lsd_spark.operators.textstats import repetition_ratio

    rng = random.Random(411)
    docs = _random_docs(rng, 40)
    got = {
        r.doc_id: r
        for r in repetition_ratio(
            spark.createDataFrame(docs, ["doc_id", "text"])
        ).collect()
    }
    for doc_id, text in docs:
        toks = text.lower().split(" ")
        uni = Counter(toks)
        bg = Counter(
            f"{toks[i]} {toks[i+1]}" for i in range(len(toks) - 1)
        )
        r = got[doc_id]
        assert r.n_words == len(toks)
        assert r.top_word_cnt == max(uni.values())
        assert r.top_word_frac == round(max(uni.values()) / len(toks), 6)
        if len(toks) >= 2:
            assert r.n_bigrams == len(toks) - 1
            assert r.top_bigram_cnt == max(bg.values())
        else:
            assert r.n_bigrams == 0 and r.top_bigram_frac == 0.0


def test_pack_sequences_matches_python_reference(spark):
    from cloudpelican_lsd_spark.operators.corpus import pack_sequences

    rng = random.Random(777)
    docs = _random_docs(rng, 60)
    cap, shards = 7, 3
    got = {
        r.doc_id: (r.shard, r.pack_id, r.start_offset, r.n_tokens)
        for r in pack_sequences(
            spark.createDataFrame(docs, ["doc_id", "text"]),
            capacity=cap,
            shards=shards,
        ).collect()
    }
    cum: dict[int, int] = {}
    for doc_id, text in sorted(docs):
        shard = doc_id % shards
        start = cum.get(shard, 0)
        n = len(text.split(" "))
        cum[shard] = start + n
        assert got[doc_id] == (
            shard,
            (start // cap) * shards + shard,
            start % cap,
            n,
        ), doc_id


def test_shingle_contamination_matches_python_reference(spark):
    from cloudpelican_lsd_spark.operators.textstats import shingle_contamination

    rng = random.Random(99)
    docs = _random_docs(rng, 50)
    n, min_df = 3, 2
    sh = {d: _py_shingles(t, n) for d, t in docs}
    df_cnt: dict[str, int] = {}
    for s in sh.values():
        for g in s:
            df_cnt[g] = df_cnt.get(g, 0) + 1
    got = {
        r.doc_id: r
        for r in shingle_contamination(
            spark.createDataFrame(docs, ["doc_id", "text"]), n=n, min_df=min_df
        ).collect()
    }
    for doc_id, _ in docs:
        mine = sh[doc_id]
        dup = sum(1 for g in mine if df_cnt[g] >= min_df)
        r = got[doc_id]
        assert r.n_shingles == len(mine)
        assert r.n_contaminated == dup


def _py_line_dedup(docs, min_df=3):
    from collections import Counter

    freq = Counter(
        line for _, text in docs for line in text.split("\n")
    )
    out = {}
    for d, text in docs:
        lines = text.split("\n")
        kept = [l for l in lines if freq[l] < min_df]
        if kept:
            out[d] = ("\n".join(kept), len(kept), len(lines) - len(kept))
    return out


def test_line_dedup_matches_python_reference(spark):
    """Randomized corpora with heavy shared boilerplate: line_dedup's
    window-count plan must match the naive occurrence-count semantics,
    including all-boilerplate document elimination and order retention."""
    from cloudpelican_lsd_spark.operators.textstats import line_dedup

    rng = random.Random(77)
    for trial in range(3):
        docs = []
        boiler = [" ".join(rng.choices(VOCAB, k=3)) for _ in range(3)]
        for i in range(40):
            lines = []
            for _ in range(rng.randint(1, 6)):
                if rng.random() < 0.4:
                    lines.append(rng.choice(boiler))
                else:
                    lines.append(" ".join(rng.choices(VOCAB, k=rng.randint(1, 5))))
            docs.append((i, "\n".join(lines)))
        expected = _py_line_dedup(docs, min_df=3)
        df = spark.createDataFrame(docs, "doc_id LONG, text STRING")
        got = {
            r.doc_id: (r.clean_text, r.n_kept, r.n_dropped)
            for r in line_dedup(df, min_df=3).collect()
        }
        assert got == expected, f"trial {trial}"


def _py_semantic_prune(vecs: list[tuple[int, list[float], int]],
                       tau_num: int = 3, tau_den: int = 10):
    """Pure-Python reference for similarity.semantic_prune: identical
    fixed-point quantization, centroid math, argmax tie rules, and the
    integer cross-multiplied threshold decision."""
    import math

    q = {vid: [math.floor(x * 10_000_000) for x in v] for vid, v, _ in vecs}
    by_label: dict[int, list[list[float]]] = {}
    for vid, v, lab in vecs:
        by_label.setdefault(lab, []).append(v)
    cent = {}
    for lab, vs in by_label.items():
        n = len(vs)
        cent[lab] = [
            math.floor((sum(math.floor(x * 10_000_000) for x in col) / n / 1e7) * 10_000)
            for col in zip(*vs)
        ]
    cnorm = {lab: sum(c * c for c in cs) for lab, cs in cent.items()}
    vnorm = {vid: sum(x * x for x in qs) for vid, qs in q.items()}
    assigned = {}
    for vid, v, lab in vecs:
        if vnorm[vid] <= 0:
            continue
        best = None
        for clab in sorted(cent):
            if cnorm[clab] <= 0:
                continue
            dot = sum(a * b for a, b in zip(q[vid], cent[clab]))
            cos = round(dot / (math.sqrt(vnorm[vid]) * math.sqrt(cnorm[clab])), 6)
            if best is None or cos > best[0] or (cos == best[0] and clab < best[1]):
                best = (cos, clab)
        assigned[vid] = best[1]
    out = {}
    clusters: dict[int, list[int]] = {}
    for vid in sorted(assigned):
        clusters.setdefault(assigned[vid], []).append(vid)
    for clab, ids in clusters.items():
        dropped = 0
        for j, hi in enumerate(ids):
            for lo in ids[:j]:
                dot = sum(a * b for a, b in zip(q[lo], q[hi]))
                if dot > 0 and (
                    dot * dot * tau_den * tau_den
                    >= vnorm[lo] * vnorm[hi] * tau_num * tau_num
                ):
                    dropped += 1
                    break
        out[clab] = (len(ids), dropped, len(ids) - dropped)
    return out


def test_semantic_prune_matches_python_reference(spark):
    for seed in (5, 17):
        rng = random.Random(seed)
        vecs = []
        for vid in range(40):
            lab = rng.randrange(3)
            base = [rng.uniform(-1, 1) for _ in range(8)]
            vecs.append((vid, base, lab))
            if rng.random() < 0.25:  # planted near-dup of this vector
                vecs.append(
                    (1000 + vid,
                     [x + rng.uniform(-0.01, 0.01) for x in base], lab)
                )
        from cloudpelican_lsd_spark.operators import similarity as S

        df = spark.createDataFrame(
            [(i, [float(x) for x in v], l) for i, v, l in vecs],
            "vec_id long, embedding array<float>, label int",
        )
        # float32 storage: quantize the reference from the float32 values
        stored = {
            r.vec_id: list(r.embedding)
            for r in df.select("vec_id", "embedding").collect()
        }
        ref_vecs = [(i, stored[i], l) for i, _, l in vecs]
        got = {
            r.cluster: (r.n_members, r.n_dropped, r.n_kept)
            for r in S.semantic_prune(df).collect()
        }
        assert got == _py_semantic_prune(ref_vecs), f"seed={seed}"


def _py_c4_audit(docs: list[tuple[int, str]]):
    from cloudpelican_lsd_spark.operators.textstats import EN_STOPWORDS

    flags = {r: 0 for r in (
        "too_few_tokens", "low_stopword_density", "low_type_token_ratio",
        "short_mean_token_len", "no_terminal_punct", "long_word", "any_rule",
    )}
    for _, text in docs:
        toks = text.split(" ")
        n = len(toks)
        f = {
            "too_few_tokens": n < 25,
            "low_stopword_density":
                sum(t in EN_STOPWORDS for t in text.lower().split(" ")) * 20 < n,
            "low_type_token_ratio": len(set(toks)) * 5 < n * 2,
            "short_mean_token_len": (len(text) - n + 1) * 2 < n * 9,
            "no_terminal_punct": (text[-1:] not in (".", "!", "?")),
            "long_word": max(len(t) for t in toks) > 15,
        }
        f["any_rule"] = any(f.values())
        for r, v in f.items():
            flags[r] += int(v)
    return {r: (len(docs), c) for r, c in flags.items()}


def test_c4_audit_matches_python_reference(spark):
    rng = random.Random(23)
    words = ["the", "cat", "extraordinarily", "of", "zz", "run", "a",
             "supercalifragilisticexpialidocious", "to", "x"]
    docs = []
    for i in range(60):
        n = rng.randrange(1, 60)
        body = " ".join(rng.choice(words) for _ in range(n))
        if rng.random() < 0.5:
            body += "."
        docs.append((i, body))
    from cloudpelican_lsd_spark.operators import corpus as C

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.rule: (r.n_docs, r.n_fail) for r in C.c4_audit(df).collect()}
    assert got == _py_c4_audit(docs)


def _py_substring_spans(docs: list[tuple[int, str]], w: int = 8,
                        min_df: int = 2):
    """Pure-Python reference for dedup.substring_span_stats."""
    from collections import Counter

    grams = {}  # doc_id -> [(pos, gram)]
    cnt = Counter()
    for did, text in docs:
        t = text.split(" ")
        gs = [
            (i + 1, " ".join(t[i:i + w])) for i in range(len(t) - w + 1)
        ] if len(t) >= w else []
        grams[did] = (len(t), gs)
        for _, g in gs:
            cnt[g] += 1
    out = {}
    for did, (n, gs) in grams.items():
        hot = sorted(p for p, g in gs if cnt[g] >= min_df)
        covered = set()
        for p in hot:
            covered.update(range(p, p + w))
        out[did] = (n, len(covered), n - len(covered))
    return out


def test_substring_spans_matches_python_reference(spark):
    """Randomized corpora with planted shared passages: the island-merge
    interval union must equal the brute-force covered-position count."""
    for seed in (3, 19, 41):
        rng = random.Random(seed)
        passages = [
            [f"p{seed}_{j}_{k}" for k in range(rng.randrange(8, 20))]
            for j in range(4)
        ]
        docs = []
        for did in range(30):
            toks = [f"w{did}_{i}" for i in range(rng.randrange(3, 40))]
            # splice 0-2 shared passages at random offsets
            for _ in range(rng.randrange(0, 3)):
                pas = rng.choice(passages)
                pos = rng.randrange(0, len(toks) + 1)
                toks = toks[:pos] + pas + toks[pos:]
            docs.append((did, " ".join(toks)))
        from cloudpelican_lsd_spark.operators import dedup as D

        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = {
            r.doc_id: (r.n_tokens, r.n_removed, r.n_kept)
            for r in D.substring_span_stats(df, w=8, min_df=2).collect()
        }
        assert got == _py_substring_spans(docs, 8, 2), f"seed={seed}"
