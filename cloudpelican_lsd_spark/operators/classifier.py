"""Naive-Bayes error classifier — the reference's online classifier as
batch-relational algebra.

Reference semantics (observed, not copied):
- training labels come from the 25-keyword heuristic
  (storm .../ErrorClassifierBolt.java:44,71-89): any keyword → "error",
  else "regular";
- tokens are whitespace splits (ErrorClassifierBolt.java:66), counted per
  occurrence;
- P(f|cat) = featureCount(f,cat) / categoryCount(cat)
  (de.daslaboratorium .../Classifier.java:268-273);
- smoothing is a weighted average with weight 1.0 and assumed
  probability 0.5: wavg = (0.5 + totalFeatureCount(f)·P(f|cat)) /
  (1 + totalFeatureCount(f)) (Classifier.java:342-361);
- score(cat) = (categoryCount/total) · ∏ wavg, classify = argmax
  (BayesClassifier.java:29-50,98-106).

Divergence (documented): the reference trains online with a 1000-sample
forget queue (Classifier.java:32, memoryCapacity) and a decaying sample
rate (ErrorClassifierBolt.java:68).  The batch operator trains on the full
input — the exact-state streaming variant belongs to the streaming layer.

Determinism: scores are compared in log space, rounded to 6 decimals
before the argmax, with ties → "error".  All ratio math is IEEE-exact
(+,*,/ are correctly rounded, identical across engines); only ln() can
differ by 1 ulp per token, absorbed by the rounding.  This keeps the whole
operator DuckDB-oracle-checkable — rare for an ML op.

Scale: three hash aggregations (category counts, feature counts, feature
totals) + one token-level join keyed by token — all map-side-combinable;
the model tables are tiny and broadcast back onto the token stream.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cloudpelican_lsd_spark.functions.parse import is_likely_error, is_likely_error_sql

CAT_ERROR = "error"
CAT_REGULAR = "regular"


@dataclass
class NaiveBayesModel:
    n_error: int
    n_regular: int
    total: int
    token_probs: DataFrame  # (tok, wavg_error, wavg_regular)


def heuristic_label(raw: F.Column) -> F.Column:
    """Keyword labeler used for training (ErrorClassifierBolt.java:71-89)."""
    return F.when(is_likely_error(raw), F.lit(CAT_ERROR)).otherwise(
        F.lit(CAT_REGULAR)
    )


def _tokens(msgs: DataFrame, id_col: str, raw_col: str) -> DataFrame:
    return msgs.select(
        id_col,
        "label",
        F.explode(F.split(F.col(raw_col), r"\s+")).alias("tok"),
    )


def _cat_counts(msgs: DataFrame) -> tuple[int, int]:
    cats = {
        r["label"]: r["cnt"]
        for r in msgs.groupBy("label").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    return cats.get(CAT_ERROR, 0), cats.get(CAT_REGULAR, 0)


def train(
    msgs: DataFrame,
    id_col: str = "event_id",
    raw_col: str = "_raw",
    cat_counts: tuple[int, int] | None = None,
) -> NaiveBayesModel:
    """Fit the frequency tables.  `msgs` must carry a `label` column.

    One driver-side job (the per-category row counts — two scalars), or
    zero if `cat_counts` is supplied; the token frequency table stays lazy
    and is broadcast at classify time."""
    toks = _tokens(msgs, id_col, raw_col)
    fcnt = (
        toks.groupBy("tok")
        .agg(
            F.sum(F.when(F.col("label") == CAT_ERROR, 1).otherwise(0)).alias("fc_err"),
            F.sum(F.when(F.col("label") == CAT_REGULAR, 1).otherwise(0)).alias("fc_reg"),
            F.count(F.lit(1)).alias("ftot"),
        )
    )
    n_err, n_reg = cat_counts if cat_counts is not None else _cat_counts(msgs)

    def wavg(fc: str, cat_n: int) -> F.Column:
        basic = (
            (F.col(fc) / F.lit(float(cat_n))) if cat_n > 0 else F.lit(0.0)
        )
        return (F.lit(0.5) + F.col("ftot") * basic) / (1 + F.col("ftot"))

    probs = fcnt.select(
        "tok",
        wavg("fc_err", n_err).alias("wavg_error"),
        wavg("fc_reg", n_reg).alias("wavg_regular"),
    )
    return NaiveBayesModel(
        n_error=n_err, n_regular=n_reg, total=n_err + n_reg, token_probs=probs
    )


def classify(
    msgs: DataFrame,
    model: NaiveBayesModel,
    id_col: str = "event_id",
    raw_col: str = "_raw",
) -> DataFrame:
    """`(id, pred_label)` — argmax of rounded log scores, ties → error.

    The probability-table broadcast is BOUNDED by reference semantics:
    the upstream classifier caps its training memory at 1000 samples
    (storm/.../classifier/Classifier.java:32 `memoryCapacity = 1000`,
    enforced at :387) and ErrorClassifierBolt.java:69 trains all of the
    first 10k then 1-in-25 — so the model's vocabulary never grows with
    the stream, and shipping it map-side keeps the corpus-sized `msgs`
    from ever shuffling on token.
    """
    toks = msgs.select(
        id_col, F.explode(F.split(F.col(raw_col), r"\s+")).alias("tok")
    )
    sums = (
        toks.join(F.broadcast(model.token_probs), "tok", "left")
        .groupBy(id_col)
        .agg(
            F.sum(F.log(F.coalesce(F.col("wavg_error"), F.lit(0.5)))).alias("s_err"),
            F.sum(F.log(F.coalesce(F.col("wavg_regular"), F.lit(0.5)))).alias("s_reg"),
        )
    )
    ln_prior_err = (
        F.log(F.lit(model.n_error / model.total))
        if model.n_error > 0
        else F.lit(float("-inf"))
    )
    ln_prior_reg = (
        F.log(F.lit(model.n_regular / model.total))
        if model.n_regular > 0
        else F.lit(float("-inf"))
    )
    return sums.select(
        id_col,
        F.when(
            F.round(ln_prior_err + F.col("s_err"), 6)
            >= F.round(ln_prior_reg + F.col("s_reg"), 6),
            F.lit(CAT_ERROR),
        )
        .otherwise(F.lit(CAT_REGULAR))
        .alias("pred_label"),
    )


def train_and_classify(
    logs: DataFrame, id_col: str = "event_id", raw_col: str = "_raw"
) -> DataFrame:
    """Self-train on heuristic labels, classify the same stream, and report
    the confusion summary `(pred_label, heur_label, cnt)`.

    Fully fused: ONE lazy plan, no driver-side collect.  The category
    counts are a broadcast 1-row DataFrame folded into the probability and
    prior arithmetic, and the heuristic label rides through the per-message
    score aggregation — so the predicted-vs-heuristic confusion needs no
    re-join on message id (at 100 TB that join is a full-stream shuffle;
    carrying the 1-byte label is free)."""
    from cloudpelican_lsd_spark.operators.dedup import _spread

    # _spread: a single-file scan gives one input partition, serializing
    # the tokenize/score work onto one core; at 100 TB the scan has
    # thousands of splits and this repartition is dwarfed by the explode
    labeled = _spread(logs).select(
        id_col,
        F.col(raw_col).alias("_nb_raw"),
        heuristic_label(F.col(raw_col)).alias("label"),
    )
    toks = labeled.select(
        id_col, "label", F.explode(F.split(F.col("_nb_raw"), r"\s+")).alias("tok")
    )
    # One extra sentinel token per message folds the per-category message
    # counts into the same vocabulary aggregation: the sentinel row's
    # (fc_err, fc_reg) ARE (n_err, n_reg).  Saves a whole scan+label pass —
    # cat and fcnt below both read the one shuffle (ReuseExchange).
    sentinel = "\x00__cat__"
    # coalesce before append: split(NULL) is NULL and array_append(NULL, s)
    # is NULL, which would silently drop NULL-raw messages from the priors
    toks_s = labeled.select(
        id_col,
        "label",
        F.explode(
            F.array_append(
                F.coalesce(
                    F.split(F.col("_nb_raw"), r"\s+"),
                    F.array().cast("array<string>"),
                ),
                F.lit(sentinel),
            )
        ).alias("tok"),
    )
    fcnt_all = toks_s.groupBy("tok").agg(
        F.sum(F.when(F.col("label") == CAT_ERROR, 1).otherwise(0)).alias("fc_err"),
        F.sum(F.when(F.col("label") == CAT_REGULAR, 1).otherwise(0)).alias("fc_reg"),
        F.count(F.lit(1)).alias("ftot"),
    )
    cat = fcnt_all.where(F.col("tok") == sentinel).select(
        F.col("fc_err").alias("n_err"), F.col("fc_reg").alias("n_reg")
    )
    fcnt = fcnt_all.where(F.col("tok") != sentinel)
    # ANSI mode (Spark 4 default) errors on x/0 — an absent category gets
    # P(f|cat)=0, the old train() guard's behavior
    def _basic(fc: str, n: str) -> F.Column:
        return F.when(F.col(n) > 0, F.col(fc) / F.col(n)).otherwise(F.lit(0.0))

    probs = fcnt.crossJoin(F.broadcast(cat)).select(
        "tok",
        (
            (F.lit(0.5) + F.col("ftot") * _basic("fc_err", "n_err"))
            / (1 + F.col("ftot"))
        ).alias("wavg_error"),
        (
            (F.lit(0.5) + F.col("ftot") * _basic("fc_reg", "n_reg"))
            / (1 + F.col("ftot"))
        ).alias("wavg_regular"),
    )
    # join strategy left to AQE (r8, ADVICE item 2): unlike classify()
    # — whose model comes from the reference's BOUNDED training
    # (memoryCapacity=1000) — this self-training path fits on the WHOLE
    # input, so probs has one row per distinct token: corpus-
    # proportional, the same unbounded-vocabulary shape the unigram
    # cost table was unpinned for.  AQE still broadcasts it at harness
    # scales; at 100 TB the token join degrades gracefully to a
    # shuffle instead of OOMing the driver.
    sums = (
        toks.join(probs, "tok", "left")
        .groupBy(id_col, "label")
        .agg(
            F.sum(F.log(F.coalesce(F.col("wavg_error"), F.lit(0.5)))).alias("s_err"),
            F.sum(F.log(F.coalesce(F.col("wavg_regular"), F.lit(0.5)))).alias("s_reg"),
        )
    )
    # a zero-count category must never win: its prior is an explicit -inf
    # (log(0) in Spark is NULL, and a NULL comparison would silently flip
    # every prediction to the otherwise() branch)
    neg_inf = F.lit(float("-inf"))
    prior_err = F.when(
        F.col("n_err") > 0,
        F.log(F.col("n_err") / (F.col("n_err") + F.col("n_reg"))),
    ).otherwise(neg_inf)
    prior_reg = F.when(
        F.col("n_reg") > 0,
        F.log(F.col("n_reg") / (F.col("n_err") + F.col("n_reg"))),
    ).otherwise(neg_inf)
    pred = sums.crossJoin(F.broadcast(cat)).select(
        F.col("label").alias("heur_label"),
        F.when(
            F.round(prior_err + F.col("s_err"), 6)
            >= F.round(prior_reg + F.col("s_reg"), 6),
            F.lit(CAT_ERROR),
        )
        .otherwise(F.lit(CAT_REGULAR))
        .alias("pred_label"),
    )
    return (
        pred.groupBy("pred_label", "heur_label")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def nb_confusion_oracle(logs_cte: str) -> str:
    """DuckDB twin of train_and_classify over the `logs` CTE."""
    err_sql = is_likely_error_sql("_raw")
    return f"""WITH {logs_cte},
labeled AS (
  SELECT event_id, _raw,
         CASE WHEN {err_sql} THEN 'error' ELSE 'regular' END AS label
  FROM logs
),
toks AS (
  SELECT event_id, label, unnest(regexp_split_to_array(_raw, '\\s+')) AS tok
  FROM labeled
),
cat AS (
  SELECT
    SUM(CASE WHEN label = 'error' THEN 1 ELSE 0 END) AS n_err,
    SUM(CASE WHEN label = 'regular' THEN 1 ELSE 0 END) AS n_reg,
    COUNT(*) AS total FROM labeled
),
fcnt AS (
  SELECT tok,
         SUM(CASE WHEN label = 'error' THEN 1 ELSE 0 END) AS fc_err,
         SUM(CASE WHEN label = 'regular' THEN 1 ELSE 0 END) AS fc_reg,
         COUNT(*) AS ftot
  FROM toks GROUP BY tok
),
probs AS (
  SELECT tok,
         (0.5 + ftot * (fc_err / (SELECT n_err FROM cat))) / (1 + ftot) AS wavg_error,
         (0.5 + ftot * (fc_reg / (SELECT n_reg FROM cat))) / (1 + ftot) AS wavg_regular
  FROM fcnt
),
sums AS (
  SELECT t.event_id,
         SUM(ln(p.wavg_error)) AS s_err,
         SUM(ln(p.wavg_regular)) AS s_reg
  FROM toks t JOIN probs p ON p.tok = t.tok
  GROUP BY t.event_id
),
pred AS (
  SELECT s.event_id,
         CASE WHEN ROUND(ln((SELECT n_err * 1.0 / total FROM cat)) + s_err, 6)
                   >= ROUND(ln((SELECT n_reg * 1.0 / total FROM cat)) + s_reg, 6)
              THEN 'error' ELSE 'regular' END AS pred_label
  FROM sums s
)
SELECT p.pred_label, l.label AS heur_label, COUNT(*)::BIGINT AS cnt
FROM pred p JOIN labeled l ON l.event_id = p.event_id
GROUP BY 1, 2"""


# ---------------------------------------------------------------------------
# Hashed-feature perceptron — linear-classifier training as DataFrame algebra
# ---------------------------------------------------------------------------
#
# The fast-linear-model side of the training-data pipeline: distill an
# expensive labeler (here the lang-id gate; in production a slow LM judge
# or fasttext-style quality model) into a bag-of-words linear classifier.
# The classic hashing trick bounds the feature space to PERCEPTRON_DIMS
# buckets, so the weight vector is a <= DIMS+1-row table that broadcasts
# onto the token stream no matter how large the corpus is.
#
# Everything is exact BIGINT arithmetic (counts, weights, scores, updates
# with learning rate 1), which makes a full training step — and therefore
# the whole training loop — DuckDB-oracle-checkable bit-for-bit.  Like
# emb_kmeans_step / text_bpe_merge_step, a driver loop alternating
# perceptron_step IS training; the gate query pins two consecutive steps
# (the zero-init step plus one real gradient step).

PERCEPTRON_DIMS = 64
#: bias rides as pseudo-dimension -1 with constant feature value 1
PERCEPTRON_BIAS_DIM = -1


def hashed_features(docs: DataFrame, dims: int = PERCEPTRON_DIMS) -> DataFrame:
    """`(doc_id, dim, x)` — whitespace bag-of-words counts hashed into
    ``dims`` buckets via the cross-engine md5-prefix trick
    (`conv(substr(md5(tok),1,4),16,10) % dims`), plus the bias row.
    One map-side-combinable agg keyed (doc_id, dim)."""
    tok = docs.select(
        "doc_id",
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("tok"),
    )
    feats = (
        tok.groupBy(
            "doc_id",
            (
                F.conv(F.substring(F.md5(F.col("tok")), 1, 4), 16, 10)
                .cast("long") % dims
            ).alias("dim"),
        )
        .agg(F.count(F.lit(1)).alias("x"))
    )
    bias = docs.select(
        "doc_id",
        F.lit(PERCEPTRON_BIAS_DIM).cast("long").alias("dim"),
        F.lit(1).cast("long").alias("x"),
    )
    return feats.unionByName(bias)


def perceptron_step(
    feats: DataFrame, labels: DataFrame, weights: DataFrame
) -> DataFrame:
    """One full-batch perceptron update (learning rate 1): predict
    ``sign(w·x)`` (score 0 → -1), accumulate ``y·x`` over misclassified
    docs, return `(dim, w)` with the gradient added.

    `labels` is `(doc_id, y)` with y ∈ {+1, -1}; `weights` is `(dim, w)`
    (absent dim = 0, so a zero-init model is the empty DataFrame).

    Scale shape: weights (≤ dims+1 rows) broadcast onto the feature
    stream; scores are one doc_id-keyed agg; the gradient is one dim-keyed
    agg whose map-side partial collapses to ≤ dims+1 rows per mapper —
    the shuffle never carries more than |docs| + dims-sized traffic.
    """
    scores = (
        feats.join(F.broadcast(weights), "dim")
        .groupBy("doc_id")
        .agg(F.sum(F.col("x") * F.col("w")).alias("score"))
    )
    mis = (
        labels.join(scores, "doc_id", "left")
        .withColumn("score", F.coalesce(F.col("score"), F.lit(0)))
        .where((F.col("score") > 0) != (F.col("y") > 0))
        .select("doc_id", "y")
    )
    grad = (
        feats.join(mis, "doc_id")
        .groupBy("dim")
        .agg(F.sum(F.col("y") * F.col("x")).alias("g"))
    )
    return (
        weights.join(grad, "dim", "full_outer")
        .select(
            "dim",
            (F.coalesce(F.col("w"), F.lit(0)) + F.coalesce(F.col("g"), F.lit(0)))
            .cast("long")
            .alias("w"),
        )
        .where(F.col("w") != 0)
    )


def zero_weights(spark) -> DataFrame:
    """The zero-init model: an empty `(dim, w)` relation."""
    return spark.createDataFrame([], "dim long, w long")


def perceptron_two_steps(docs: DataFrame, dims: int = PERCEPTRON_DIMS) -> DataFrame:
    """`(dim, w_step1, w_step2)` — the first two batch steps of
    distilling `lang == 'en'` into the hashed linear model.  Step 1 from
    zero weights (every positive doc misclassified → w1 = Σ_{y=+1} x);
    step 2 is the first real gradient step.  Both exact BIGINT."""
    spark = docs.sparkSession
    feats = hashed_features(docs, dims)
    labels = docs.select(
        "doc_id",
        F.when(F.col("lang") == "en", F.lit(1))
        .otherwise(F.lit(-1))
        .cast("long")
        .alias("y"),
    )
    # single lazy plan on purpose: AQE exchange reuse dedupes the shared
    # feature subtree across both steps' consumers — measured FASTER than
    # materializing the (tiny) w1 between steps, which restarts the plan
    # and serializes a barrier (2.4s vs 3.0s at sf0.1).  A long driver
    # LOOP should still materialize weights per iteration to keep lineage
    # bounded (see tests' 4-step loop).
    w1 = perceptron_step(feats, labels, zero_weights(spark))
    w2 = perceptron_step(feats, labels, w1)
    return (
        w1.withColumnRenamed("w", "w_step1")
        .join(w2.withColumnRenamed("w", "w_step2"), "dim", "full_outer")
        .select(
            "dim",
            F.coalesce(F.col("w_step1"), F.lit(0)).cast("long").alias("w_step1"),
            F.coalesce(F.col("w_step2"), F.lit(0)).cast("long").alias("w_step2"),
        )
        .where((F.col("w_step1") != 0) | (F.col("w_step2") != 0))
    )


def perceptron_oracle(dims: int = PERCEPTRON_DIMS) -> str:
    """DuckDB twin of perceptron_two_steps (same md5-prefix hashing,
    zero-init first step, sign(0) = -1 prediction rule)."""
    return f"""WITH ptok AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok FROM documents
),
plab AS (
  SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE -1 END AS y FROM documents
),
pfx AS (
  SELECT doc_id, ('0x' || substr(md5(tok), 1, 4))::BIGINT % {dims} AS dim,
         COUNT(*)::BIGINT AS x
  FROM ptok GROUP BY 1, 2
  UNION ALL
  SELECT doc_id, {PERCEPTRON_BIAS_DIM}, 1 FROM documents
),
pw1 AS (
  SELECT f.dim, SUM(l.y * f.x)::BIGINT AS w
  FROM pfx f JOIN plab l USING (doc_id)
  WHERE l.y = 1 GROUP BY f.dim HAVING SUM(l.y * f.x) <> 0
),
psc AS (
  SELECT l.doc_id, l.y, COALESCE(SUM(f.x * w1.w), 0) AS score
  FROM plab l
  LEFT JOIN pfx f ON f.doc_id = l.doc_id
  LEFT JOIN pw1 w1 ON w1.dim = f.dim
  GROUP BY l.doc_id, l.y
),
pmis AS (SELECT doc_id, y FROM psc WHERE (score > 0) <> (y > 0)),
pg2 AS (
  SELECT f.dim, SUM(m.y * f.x)::BIGINT AS g
  FROM pfx f JOIN pmis m USING (doc_id) GROUP BY f.dim
),
pw2 AS (
  SELECT COALESCE(w1.dim, g.dim) AS dim,
         (COALESCE(w1.w, 0) + COALESCE(g.g, 0))::BIGINT AS w
  FROM pw1 w1 FULL OUTER JOIN pg2 g ON w1.dim = g.dim
)
SELECT COALESCE(w1.dim, w2.dim)::BIGINT AS dim,
       COALESCE(w1.w, 0)::BIGINT AS w_step1,
       COALESCE(w2.w, 0)::BIGINT AS w_step2
FROM pw1 w1 FULL OUTER JOIN pw2 w2 ON w1.dim = w2.dim
WHERE COALESCE(w1.w, 0) <> 0 OR COALESCE(w2.w, 0) <> 0"""


def perceptron_calibration(
    docs: DataFrame, dims: int = PERCEPTRON_DIMS
) -> DataFrame:
    """`(score_bin, n_docs, n_pos, pos_rate_ppm, min_score, max_score)` —
    reliability diagram for the 2-step perceptron: score every document
    with the step-2 weights, bin the margin by SIGNED ORDER OF MAGNITUDE
    (`sign(score) · decimal_digits(|score|)`, 0 for a zero margin), and
    report the true-label ('en') rate per bin.  A well-calibrated margin
    shows pos_rate rising monotonically with the bin — the go/no-go audit
    before using the distilled model as a quality filter.

    Magnitude bins rather than fixed-width or decile bins, deliberately:
    batch-perceptron margins grow linearly with corpus size (weights are
    gradient SUMS), so any fixed width saturates at the next scale factor,
    and rank-based deciles would force a total order (global sort) at
    100 TB.  Digit count is scale-adaptive, exact integer math on both
    engines (`length(cast(abs(score) as string))`), and the report stays
    one map-side-combinable aggregate over per-row column math.
    """
    spark = docs.sparkSession
    feats = hashed_features(docs, dims)
    labels = docs.select(
        "doc_id",
        F.when(F.col("lang") == "en", F.lit(1)).otherwise(F.lit(-1))
        .cast("long")
        .alias("y"),
    )
    w1 = perceptron_step(feats, labels, zero_weights(spark))
    w2 = perceptron_step(feats, labels, w1)
    scores = (
        labels.join(
            feats.join(F.broadcast(w2), "dim")
            .groupBy("doc_id")
            .agg(F.sum(F.col("x") * F.col("w")).alias("score")),
            "doc_id",
            "left",
        )
        .withColumn("score", F.coalesce(F.col("score"), F.lit(0)).cast("long"))
    )
    binned = scores.withColumn(
        "score_bin",
        F.expr(
            "CASE WHEN score = 0 THEN 0L ELSE"
            " CAST(sign(score) AS BIGINT)"
            " * length(CAST(abs(score) AS STRING)) END"
        ),
    )
    return (
        binned.groupBy("score_bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.when(F.col("y") > 0, 1).otherwise(0)).cast("long").alias("n_pos"),
            F.min("score").cast("long").alias("min_score"),
            F.max("score").cast("long").alias("max_score"),
        )
        .select(
            "score_bin",
            "n_docs",
            "n_pos",
            F.expr("n_pos * 1000000 div n_docs").cast("long").alias("pos_rate_ppm"),
            "min_score",
            "max_score",
        )
    )


def perceptron_calibration_oracle(dims: int = PERCEPTRON_DIMS) -> str:
    """DuckDB twin: reuses the two-step weight CTEs from
    perceptron_oracle, then the same signed-digit-count binning."""
    base = perceptron_oracle(dims)
    ctes = base[: base.rindex("\nSELECT COALESCE(w1.dim")]
    return f"""{ctes},
csc AS (
  SELECT l.doc_id, l.y,
         CAST(COALESCE(SUM(f.x * w2.w), 0) AS BIGINT) AS score
  FROM plab l
  LEFT JOIN pfx f ON f.doc_id = l.doc_id
  LEFT JOIN pw2 w2 ON w2.dim = f.dim
  GROUP BY l.doc_id, l.y
),
cbin AS (
  SELECT y, score,
         CASE WHEN score = 0 THEN 0
              ELSE CAST(sign(score) AS BIGINT)
                   * length(CAST(abs(score) AS VARCHAR)) END AS score_bin
  FROM csc
)
SELECT score_bin, COUNT(*)::BIGINT AS n_docs,
       SUM(CASE WHEN y > 0 THEN 1 ELSE 0 END)::BIGINT AS n_pos,
       CAST(SUM(CASE WHEN y > 0 THEN 1 ELSE 0 END) * 1000000 // COUNT(*)
            AS BIGINT) AS pos_rate_ppm,
       MIN(score)::BIGINT AS min_score, MAX(score)::BIGINT AS max_score
FROM cbin GROUP BY score_bin"""
