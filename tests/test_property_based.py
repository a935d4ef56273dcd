"""Property-based tests (hypothesis) for the pure-Python planner layers:
the grep-pipeline grammar and the bucket/gap-fill integer math.  These are
the components where a fuzzer finds real bugs (tokenizer edge cases,
rounding at bucket boundaries) without needing a SparkSession.
"""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from cloudpelican_lsd_spark.catalog import compile_fast_path
from cloudpelican_lsd_spark.functions.durations import parse_duration
from cloudpelican_lsd_spark.operators.grep_pipeline import GrepPipeline

# plain-word patterns (contains fast path) and safe regex-ish patterns
_WORD = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789_-",
    min_size=1,
    max_size=12,
)
_NAME = st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789_", min_size=1, max_size=10)


@st.composite
def pipelines(draw):
    name = draw(_NAME)
    stages = [f"cat {name}"]
    for _ in range(draw(st.integers(0, 4))):
        flags = draw(
            st.lists(st.sampled_from(["-v", "-i", "-e"]), max_size=3, unique=True)
        )
        # a pattern starting with '-' is lexically a flag — the parser
        # rightly rejects a flags-only grep, so keep generated patterns
        # out of the flag namespace
        word = draw(_WORD.filter(lambda w: not w.startswith("-")))
        stages.append("grep " + " ".join([*flags, word]))
    if draw(st.booleans()):
        stages.append("sort - r" if draw(st.booleans()) else "sort")
    tail = draw(st.sampled_from(["", "head", "limit"]))
    if tail == "head":
        stages.append("head")
    elif tail == "limit":
        stages.append(f"limit {draw(st.integers(1, 10000))}")
    return name, " | ".join(stages)


@given(pipelines())
@settings(max_examples=200, deadline=None)
def test_grep_parse_roundtrips_to_sql(pipe):
    """Every generated pipeline parses; its SQL mirrors the parsed shape
    (grep count = AND count, LIMIT value, ORDER BY direction)."""
    name, text = pipe
    p = GrepPipeline.parse(text)
    assert p.source == name
    sql = p.to_duckdb_sql("t")
    assert sql.startswith("SELECT _raw FROM t")
    if p.greps:
        where = sql.split(" WHERE ", 1)[1].split(" ORDER BY ")[0].split(" LIMIT ")[0]
        assert where.count(" AND ") == len(p.greps) - 1
    if p.limit is not None:
        assert sql.rstrip().endswith(f"LIMIT {p.limit}")
    if p.sort:
        assert (" DESC" in sql) == p.sort_desc


@given(_WORD)
@settings(max_examples=200, deadline=None)
def test_fast_path_plain_words(word):
    """Plain words always compile to the contains fast path; the (?i)
    prefix is hoisted and lowercases the needle (Filter.java:33-52)."""
    plain, ci = compile_fast_path(word)
    assert plain == word and ci is False
    plain_ci, ci2 = compile_fast_path(f"(?i){word}")
    assert plain_ci == word.lower() and ci2 is True


@given(st.text(min_size=1, max_size=20))
@settings(max_examples=200, deadline=None)
def test_fast_path_never_misclassifies_regex(pattern):
    """Anything with a metacharacter must NOT take the contains path."""
    plain, _ = compile_fast_path(pattern)
    if plain is not None:
        body = pattern[4:] if pattern.startswith("(?i)") else pattern
        assert re.fullmatch(r"[A-Za-z0-9_-]+", body)


@given(st.integers(0, 10**6), st.sampled_from(["s", "m", "h", "d", ""]))
@settings(max_examples=200, deadline=None)
def test_duration_literals(n, suffix):
    """`10m/2h/1d` → seconds (cli/cloudpelican-lsd.go:723-747)."""
    mult = {"": 1, "s": 1, "m": 60, "h": 3600, "d": 86400}[suffix]
    assert parse_duration(f"{n}{suffix}") == n * mult


@given(
    st.lists(st.integers(0, 2**31), min_size=1, max_size=50),
    st.integers(1, 86400),
)
@settings(max_examples=200, deadline=None)
def test_bucket_math_invariants(epochs, rollup):
    """`ts - ts % N` is idempotent, aligned, and never exceeds ts —
    the exact arithmetic both engines must agree on (SURVEY §7)."""
    for e in epochs:
        b = e - e % rollup
        assert b % rollup == 0
        assert 0 <= e - b < rollup
        assert (b - b % rollup) == b


# ---------------------------------------------------------------------------
# PII redaction dialect parity: the Spark (Java regex) implementation must
# agree with a pure-Python re reference on arbitrary text, including the
# newline/unicode edges the sf-data parity gate never exercises.
# ---------------------------------------------------------------------------

_PII_ALPHABET = st.sampled_from(
    list("abzAZ09._%+-@ \t\né世!?:/") + ["123", "4567", "@ex.co", "10.0.0.1"]
)
_PII_TEXT = st.lists(_PII_ALPHABET, min_size=0, max_size=12).map("".join)


def _pii_reference(text: str) -> tuple[str, int, int, int]:
    import re as _re

    from cloudpelican_lsd_spark.operators.textstats import (
        PII_DIGITS_RE,
        PII_EMAIL_RE,
        PII_IPV4_RE,
    )

    n_email = len(_re.findall(PII_EMAIL_RE, text))
    r1 = _re.sub(PII_EMAIL_RE, "<EMAIL>", text)
    n_ip = len(_re.findall(PII_IPV4_RE, r1))
    r2 = _re.sub(PII_IPV4_RE, "<IP>", r1)
    n_num = len(_re.findall(PII_DIGITS_RE, r2))
    r3 = _re.sub(PII_DIGITS_RE, "<NUM>", r2)
    return r3, n_email, n_ip, n_num


@given(st.lists(_PII_TEXT, min_size=1, max_size=30))
@settings(max_examples=10, deadline=None)
def test_pii_redact_matches_python_reference(texts):
    """One Spark job per example batch; every string must match the pure
    re reference bit-for-bit (masking AND audit counts)."""
    from cloudpelican_lsd_spark.operators.textstats import pii_redact
    from cloudpelican_lsd_spark.session import get_spark

    spark = get_spark()
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {r.doc_id: r for r in pii_redact(df).collect()}
    for i, t in enumerate(texts):
        exp = _pii_reference(t)
        assert (
            got[i].redacted,
            got[i].n_email,
            got[i].n_ip,
            got[i].n_num,
        ) == exp, repr(t)


from cloudpelican_lsd_spark.engine import COMMAND_PREFIXES as _KNOWN_PREFIXES


@given(st.text(min_size=1, max_size=40))
@settings(max_examples=50, deadline=None)
def test_engine_rejects_junk_with_value_error(cmd):
    """Unknown commands fail with a clear ValueError, never a crash or a
    silent pass-through to Spark."""
    from cloudpelican_lsd_spark.engine import CloudPelicanEngine
    from cloudpelican_lsd_spark.session import get_spark

    low = cmd.strip().lower()
    if low.startswith(_KNOWN_PREFIXES) or "|" in cmd:
        return  # may be a legal command; covered by the grammar tests
    eng = CloudPelicanEngine(get_spark(), logs=None)
    try:
        eng.execute(cmd)
        raise AssertionError(f"junk accepted: {cmd!r}")
    except ValueError:
        pass


# --- real media codecs: roundtrip + closed-form invariants (no Spark) ------

_T = lambda m: (m // 256) * 32640 + (m % 256) * ((m % 256) - 1) // 2  # noqa: E731


@given(
    st.integers(0, 2**31 - 1),
    st.integers(1, 40),
    st.integers(1, 300),
)
@settings(max_examples=60, deadline=None)
def test_bmp_roundtrip_closed_form(mid, w, h):
    from cloudpelican_lsd_spark.multimodal import codecs as C

    d = C.decode_bmp(C.encode_bmp(mid, w, h))
    s = mid % 256
    assert (d["width"], d["height"], d["n_units"]) == (w, h, w * h)
    assert d["unit_sum"] == 3 * w * (_T(s + h) - _T(s))
    assert d["unit_min"] == (s if s + h <= 256 else 0)
    assert d["unit_max"] == (s + h - 1 if s + h <= 256 else 255)
    # pixel-true spot check: top-down row h-1
    assert int(d["pixels"][h - 1, w - 1, 2]) == (mid + h - 1) % 256


@given(st.integers(0, 2**31 - 1), st.integers(0, 5000))
@settings(max_examples=60, deadline=None)
def test_wav_fvid_roundtrip_closed_form(mid, n):
    from cloudpelican_lsd_spark.multimodal import codecs as C

    s = mid % 256
    for enc, dec in ((C.encode_wav, C.decode_wav), (C.encode_fvid, C.decode_fvid)):
        d = dec(enc(mid, n))
        assert d["n_units"] == n
        assert d["unit_sum"] == _T(s + n) - _T(s)
        if n:
            assert d["unit_min"] == (s if s + n <= 256 else 0)
            assert d["unit_max"] == (s + n - 1 if s + n <= 256 else 255)


@given(
    st.lists(
        st.lists(
            st.text(alphabet="abcxyz", min_size=1, max_size=4),
            min_size=0,
            max_size=40,
        ),
        min_size=1,
        max_size=12,
    ),
    st.integers(2, 8),
    st.integers(0, 6),
)
@settings(max_examples=10, deadline=None)
def test_chunk_windows_matches_python_reference(token_lists, chunk, overlap):
    """chunk_windows equals a pure-Python chunker on random token lists
    for random (chunk, overlap) with overlap < chunk — boundaries,
    short-last-chunk, and empty-doc behavior all pinned."""
    from cloudpelican_lsd_spark.operators.textstats import chunk_windows
    from cloudpelican_lsd_spark.session import get_spark

    if overlap >= chunk:
        overlap = chunk - 1
    stride = chunk - overlap
    spark = get_spark()
    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(token_lists)],
        "doc_id long, text string",
    )
    got = {}
    for r in chunk_windows(df, chunk_tokens=chunk, overlap=overlap).collect():
        got.setdefault(r.doc_id, []).append(
            (r.chunk_id, r.n_chunk_tokens, r.chunk_text)
        )
    for i, toks in enumerate(token_lists):
        # the operator tokenizes by splitting on ' ': a doc built from
        # empty tokens collapses; mirror split semantics exactly
        toks = " ".join(toks).split(" ") if toks else [""]
        if toks == [""]:
            assert i not in got
            continue
        n = len(toks)
        n_chunks = 1 if n <= chunk else (n - chunk + stride - 1) // stride + 1
        expect = [
            (
                j,
                len(toks[j * stride : j * stride + chunk]),
                " ".join(toks[j * stride : j * stride + chunk]),
            )
            for j in range(n_chunks)
        ]
        assert sorted(got[i]) == expect, (toks, chunk, overlap)


@given(
    st.lists(st.integers(0, 50), min_size=2, max_size=40),
    st.integers(0, 500),
)
@settings(max_examples=200, deadline=None)
def test_cusum_closed_form_equals_direct_recurrence(hist, actual):
    """The prefix-sum closed form used by cusum_check must equal the
    textbook recurrence S_t = max(0, S_{t-1} + D_t) for every input."""
    n = len(hist)
    sum_hist = sum(hist)
    seq = hist + [actual]
    # direct recurrence in the same 2n-scaled integer units
    s = 0
    for x in seq:
        s = max(0, s + 2 * n * x - 3 * sum_hist)
    # closed form: P_T - min(0, min prefix)
    p, mn = 0, 0
    for x in seq:
        p += 2 * n * x - 3 * sum_hist
        mn = min(mn, p)
    assert p - min(0, mn) == s


@given(
    st.lists(
        st.lists(st.sampled_from("abcdefg"), min_size=3, max_size=12),
        min_size=2,
        max_size=6,
    )
)
@settings(max_examples=25, deadline=None)
def test_containment_matches_bruteforce(spark, corpora):
    """containment_pairs agrees with a brute-force Python shingle-set
    containment on random small corpora (threshold 1/2)."""
    docs_py = {i: " ".join(toks) for i, toks in enumerate(corpora)}

    def sh(t):
        w = t.lower().split(" ")
        return {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}

    expect = set()
    for a in docs_py:
        for b in docs_py:
            if a >= b:
                continue
            sa, sb = sh(docs_py[a]), sh(docs_py[b])
            if not sa or not sb:
                continue
            inter = len(sa & sb)
            if inter * 2 >= min(len(sa), len(sb)):
                expect.add((a, b))

    from cloudpelican_lsd_spark.operators.dedup import containment_pairs

    docs = spark.createDataFrame(
        [(i, t) for i, t in docs_py.items()], "doc_id long, text string"
    )
    got = {
        (r.doc_a, r.doc_b)
        for r in containment_pairs(
            docs, n=3, threshold_num=1, threshold_den=2
        ).collect()
    }
    assert got == expect
