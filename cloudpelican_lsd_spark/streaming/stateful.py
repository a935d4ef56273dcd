"""Exact-state streaming classifier — per-filter online naive Bayes with
the reference's bounded learning memory.

Reference semantics (storm .../classifier/Classifier.java): every learned
sample enters a memory queue capped at ``memoryCapacity = 1000``
(Classifier.java:32); when the queue overflows, the oldest sample is
forgotten — its category count and per-token feature counts are
decremented.  ErrorClassifierBolt keys one classifier per filter
(ErrorClassifierBolt.java:57-63) and labels training samples with the
keyword heuristic (:71-89).

Divergence (documented): the reference samples training input (all of the
first 10k, then 1-in-25 *random*, ErrorClassifierBolt.java:68) — random
sampling is non-reproducible, so this operator trains on every row.

Spark shape: ``applyInPandasWithState`` keyed by ``filter_id``.  State is
the (queue, feature-count, category-count) triple serialized as JSON —
bounded by construction (≤1000 samples), so state size is O(vocabulary of
1000 lines) per filter regardless of stream volume.  Arrow moves each
micro-batch's rows per filter into one pandas frame; the Python loop runs
over at most the batch rows, not history.
"""

from __future__ import annotations

import json
import time
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

MEMORY_CAPACITY = 1000  # Classifier.java:32

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("filter_id", T.StringType(), False),
        T.StructField("samples_in_memory", T.LongType(), False),
        T.StructField("err_samples", T.LongType(), False),
        T.StructField("reg_samples", T.LongType(), False),
        T.StructField("vocab_size", T.LongType(), False),
    ]
)

STATE_SCHEMA = T.StructType([T.StructField("model_json", T.StringType(), True)])


def _learn(model: dict, label: str, tokens: list[str]) -> None:
    """learn + forget-oldest (Classifier.java learn/forget paths)."""
    model["queue"].append([label, tokens])
    model["cat"][label] = model["cat"].get(label, 0) + 1
    fc = model["feat"]
    for t in tokens:
        key = f"{label}\x00{t}"
        fc[key] = fc.get(key, 0) + 1
    if len(model["queue"]) > MEMORY_CAPACITY:
        old_label, old_tokens = model["queue"].pop(0)
        model["cat"][old_label] -= 1
        for t in old_tokens:
            key = f"{old_label}\x00{t}"
            fc[key] -= 1
            if fc[key] <= 0:
                del fc[key]


#: staleness eviction horizon — the reference drops per-filter state 10
#: minutes after its last data (OutlierDetectionBolt.java:100-111)
STATE_TTL_MS = 600_000


def _arm_ttl(state: GroupState) -> None:
    """Arm the idle-eviction timer iff the query runs with a
    processing-time timeout (no-op under NoTimeout)."""
    try:
        state.setTimeoutDuration(STATE_TTL_MS)
    except Exception:
        pass


def classifier_state_fn(
    key: tuple,
    pdf_iter: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.hasTimedOut:
        state.remove()
        yield pd.DataFrame(columns=[f.name for f in OUTPUT_SCHEMA])
        return
    if state.exists:
        model = json.loads(state.get[0])
    else:
        model = {"queue": [], "cat": {}, "feat": {}}
    for pdf in pdf_iter:
        for _raw, label in zip(pdf["_raw"], pdf["label"]):
            _learn(model, str(label), str(_raw).split())
    state.update((json.dumps(model),))
    _arm_ttl(state)
    vocab = {k.split("\x00", 1)[1] for k in model["feat"]}
    yield pd.DataFrame(
        [
            {
                "filter_id": key[0],
                "samples_in_memory": len(model["queue"]),
                "err_samples": model["cat"].get("error", 0),
                "reg_samples": model["cat"].get("regular", 0),
                "vocab_size": len(vocab),
            }
        ]
    )


def streaming_classifier(
    labeled_matched: DataFrame, evict_stale: bool = False
) -> DataFrame:
    """`(filter_id, samples_in_memory, err_samples, reg_samples,
    vocab_size)` updated per micro-batch.

    Input: a *streaming* DataFrame with `filter_id`, `_raw`, `label`
    columns (fan-out output + heuristic label).

    `evict_stale=True` enables the reference's 10-min idle-state eviction
    (OutlierDetectionBolt.java:100-111) via a processing-time timeout —
    for continuously-running queries; availableNow/batch-drain runs stay
    alive until pending timeouts fire, so it defaults off."""
    return labeled_matched.groupBy("filter_id").applyInPandasWithState(
        classifier_state_fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout
        if evict_stale
        else GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# streaming outlier detection with per-series high-water mark
# ---------------------------------------------------------------------------

from cloudpelican_lsd_spark.operators.outliers import (  # noqa: E402
    BUCKET_SEC,
    LOOKBACK_SEC,
    score_last_bucket,
)

OUTLIER_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("filter_id", T.StringType(), False),
        T.StructField("bucket", T.LongType(), False),
        T.StructField("actual", T.DoubleType(), False),
        T.StructField("score", T.DoubleType(), False),
        T.StructField("details", T.StringType(), False),
    ]
)


def outlier_state_fn(
    key: tuple,
    pdf_iter: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Per-filter 5-min count series kept in state (bounded: 24h lookback
    = 288 buckets); every newly *complete* bucket is consensus-scored
    exactly once — the `lastAnalyzed` high-water mark skips series with
    no new data exactly as OutlierDetectionBolt.java:164-170 does, and a
    catch-up batch that completes several buckets scores each of them."""
    import numpy as np

    if state.hasTimedOut:
        state.remove()
        yield pd.DataFrame(columns=[f.name for f in OUTLIER_OUTPUT_SCHEMA])
        return
    st = json.loads(state.get[0]) if state.exists else {"counts": {}, "last": 0}
    # processing-time sanity bound: one line with a bogus far-future
    # embedded timestamp would otherwise anchor the 24h retention trim
    # below and wipe the whole accumulated history for this filter
    max_plausible = int(time.time()) + 300
    for pdf in pdf_iter:
        for e in pdf["ts_epoch"]:
            if int(e) > max_plausible:
                continue
            b = int(e) - int(e) % BUCKET_SEC
            st["counts"][str(b)] = st["counts"].get(str(b), 0) + 1
    buckets = sorted(int(k) for k in st["counts"])
    rows = []
    if buckets:
        lo = buckets[-1] - LOOKBACK_SEC
        st["counts"] = {k: v for k, v in st["counts"].items() if int(k) >= lo}
        buckets = sorted(int(k) for k in st["counts"])
        # exclude the newest (still-filling) bucket; score EVERY observed
        # complete bucket past the high-water mark — a catch-up batch
        # (availableNow replay, post-downtime backlog) can complete
        # several buckets at once, and scoring only buckets[-2] would
        # skip the earlier ones forever (the reference's 60s tick scores
        # each bucket as it completes)
        pending = [b for b in buckets[:-1] if b > st["last"]]
        if pending:
            # zero gap-fill like the batch detector (outliers.py): count
            # series only materialize buckets with events, so without it
            # an outage-to-zero bucket is skipped over and analyzers see
            # a gapped grid (biased baselines, wrong seasonal alignment)
            sparse_b = np.array(buckets[:-1], dtype=np.int64)
            sparse_c = np.array(
                [st["counts"][str(b)] for b in buckets[:-1]], dtype=float
            )
            hist_b = np.arange(sparse_b[0], sparse_b[-1] + 1, BUCKET_SEC)
            hist_c = np.zeros(len(hist_b), dtype=float)
            hist_c[((sparse_b - sparse_b[0]) // BUCKET_SEC).astype(int)] = sparse_c
            for t in pending:
                idx = int((t - int(hist_b[0])) // BUCKET_SEC)
                res = score_last_bucket(hist_b[: idx + 1], hist_c[: idx + 1])
                if res is not None:
                    score, flags = res
                    rows.append(
                        {
                            "filter_id": key[0],
                            "bucket": int(t),
                            "actual": float(hist_c[idx]),
                            "score": float(score),
                            "details": json.dumps(flags, sort_keys=True),
                        }
                    )
            st["last"] = buckets[-2]
    state.update((json.dumps(st),))
    _arm_ttl(state)
    yield pd.DataFrame(
        rows, columns=[f.name for f in OUTLIER_OUTPUT_SCHEMA]
    )


def streaming_outliers(
    matched: DataFrame, evict_stale: bool = False
) -> DataFrame:
    """`(filter_id, bucket, actual, score, details)` — one row per newly
    completed 5-min bucket per filter, consensus-scored against the 24h
    in-state history.  Input: streaming matched stream with `filter_id`
    and `ts_epoch`.  `evict_stale` as in `streaming_classifier`."""
    return matched.select("filter_id", "ts_epoch").groupBy("filter_id").applyInPandasWithState(
        outlier_state_fn,
        outputStructType=OUTLIER_OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout
        if evict_stale
        else GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# alert cooldown suppressor — notification spam control on the outlier sink
# ---------------------------------------------------------------------------

ALERT_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("series_key", T.StringType(), False),
        T.StructField("ts_epoch", T.LongType(), False),
        T.StructField("n_suppressed", T.LongType(), False),
    ]
)


def alert_suppressor_state_fn(cooldown_sec: int):
    """State fn factory: per series, emit at most one alert per
    `cooldown_sec` of EVENT time; alerts inside the window are counted
    and reported on the next emission (`n_suppressed`) so no signal is
    silently lost — the notification-dedup stage a reference outlier
    sink needs before paging a human.

    State is two integers (last emitted ts + suppressed count) — O(1)
    per series regardless of alert volume.  Batch rows are processed in
    event-time order so the behavior is replay-deterministic for a given
    micro-batch composition.
    """

    def fn(
        key: tuple, pdf_iter: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            yield pd.DataFrame(columns=[f.name for f in ALERT_OUTPUT_SCHEMA])
            return
        st = (
            json.loads(state.get[0])
            if state.exists
            else {"last": None, "sup": 0}
        )
        ts = sorted(
            int(e) for pdf in pdf_iter for e in pdf["ts_epoch"].tolist()
        )
        rows = []
        for e in ts:
            if st["last"] is None or e - st["last"] >= cooldown_sec:
                rows.append(
                    {
                        "series_key": key[0],
                        "ts_epoch": e,
                        "n_suppressed": st["sup"],
                    }
                )
                st["last"] = e
                st["sup"] = 0
            else:
                st["sup"] += 1
        state.update((json.dumps(st),))
        _arm_ttl(state)
        yield pd.DataFrame(rows, columns=[f.name for f in ALERT_OUTPUT_SCHEMA])

    return fn


def streaming_alert_suppress(
    alerts: DataFrame, cooldown_sec: int = 1800, evict_stale: bool = False
) -> DataFrame:
    """`(series_key, ts_epoch, n_suppressed)` — at most one emitted alert
    per series per cooldown window; suppressed alerts are counted onto
    the next emission.  Input: a streaming alert relation with
    `series_key` and `ts_epoch`."""
    return (
        alerts.select("series_key", "ts_epoch")
        .groupBy("series_key")
        .applyInPandasWithState(
            alert_suppressor_state_fn(cooldown_sec),
            outputStructType=ALERT_OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout
            if evict_stale
            else GroupStateTimeout.NoTimeout,
        )
    )
