"""North-star text analysis: language-ID, quality scoring, token counting, fingerprinting."""

from __future__ import annotations

from cloudpelican_lsd_spark.operators import textstats as text_ops
from cloudpelican_lsd_spark.sources.tables import load_table
from pyspark.sql import DataFrame, SparkSession

from cloudpelican_lsd_spark.registry._core import (
    register,
)


# ===========================================================================
# north-star: text analysis
# ===========================================================================


@register("text_token_count", text_ops.TOKEN_COUNT_ORACLE)
def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token + char counts per document."""
    return text_ops.token_count(load_table(spark, "documents", sf_dir))


@register("text_bpe_token_count", text_ops.BPE_TOKEN_COUNT_ORACLE)
def q_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish regex pre-tokenizer counts per document."""
    return text_ops.bpe_token_count(load_table(spark, "documents", sf_dir))


@register("text_quality_score", text_ops.quality_score_oracle())
def q_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length/punctuation/stopword quality signals per document."""
    return text_ops.quality_score(load_table(spark, "documents", sf_dir))


@register("text_lang_id", text_ops.lang_id_oracle(1, 20))
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-density language gate (en vs other)."""
    return text_ops.lang_id(
        load_table(spark, "documents", sf_dir), threshold_num=1, threshold_den=20
    )


@register("text_pmi_pairs", text_ops.pmi_pairs_oracle(50, 2))
def q_text_pmi_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-level PMI collocations over the top-50-df vocab —
    vocab-bounded pair space, exact counts, micro-unit ln
    (textstats.pmi_pairs)."""
    return text_ops.pmi_pairs(
        load_table(spark, "documents", sf_dir), vocab_size=50, min_co_df=2
    )


@register("text_lang_confusion", text_ops.lang_confusion_oracle(1, 20))
def q_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the stopword-density language gate vs the
    labeled lang column — the eval table for the heuristic pre-filter
    (textstats.lang_confusion)."""
    return text_ops.lang_confusion(
        load_table(spark, "documents", sf_dir), threshold_num=1, threshold_den=20
    )


@register("text_cdc_chunks", text_ops.cdc_chunks_oracle(16, 64))
def q_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking (rolling-hash fingerprint family):
    per-chunk md5s that survive insert/delete edits outside the touched
    chunk (textstats.cdc_chunks)."""
    return text_ops.cdc_chunks(
        load_table(spark, "documents", sf_dir), window=16, divisor=64
    )


@register("text_fingerprint", text_ops.fingerprint_oracle(3))
def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash document fingerprints (n-gram min-hash family)."""
    return text_ops.fingerprint(load_table(spark, "documents", sf_dir), n=3)


@register("text_dsir_weights", text_ops.dsir_weights_oracle("en", 256))
def q_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance-resampling scores (hashed-bigram log-likelihood
    ratio toward the 'en' slice; Xie et al. 2023) — integer micro-unit
    weights, broadcast 256-row weight table (textstats.dsir_weights)."""
    return text_ops.dsir_weights(
        load_table(spark, "documents", sf_dir), target_lang="en", buckets=256
    )


@register("text_char_entropy", text_ops.CHAR_ENTROPY_ORACLE)
def q_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level Shannon entropy per document (compression-style
    quality gate; decimal-summed log terms for cross-engine determinism)."""
    return text_ops.char_entropy(load_table(spark, "documents", sf_dir))


@register("text_vocab_coverage", text_ops.vocab_coverage_oracle(100))
def q_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source coverage / OOV rate against the corpus top-100 token
    vocabulary — one text scan, one (source, token) shuffle, broadcast
    vocab membership."""
    return text_ops.vocab_coverage(load_table(spark, "documents", sf_dir), vocab_size=100)


