"""Spark-4-native stateful classifier via ``transformWithStateInPandas``.

The ``applyInPandasWithState`` variant (stateful.py) serializes the whole
model as ONE JSON value, so every micro-batch round-trips the full state
even when a single row arrived.  ``transformWithStateInPandas`` (Spark 4)
exposes composite typed state — ValueState / MapState in the (RocksDB)
state store, addressed per key — so a micro-batch touches only the keys
it changes: O(batch tokens) state I/O, not O(model).  At the reference's
scale (1000-sample cap, Classifier.java:32) both shapes work; with
millions of filters × large vocabularies only the incremental one
survives, which is why this is the forward-looking variant.

Reference semantics reproduced exactly (Classifier.java learn/forget):
every learned sample enters a capped memory ring; overflow forgets the
oldest sample — its category count and per-token feature counts are
decremented (storm .../classifier/Classifier.java:38-54,141-234, keyed
per filter by ErrorClassifierBolt.java:57-63).

State layout (per filter_id):

- ``meta``  ValueState ``(head, tail, n_err, n_reg, vocab)`` — ring
  pointers + counters.
- ``mem``   MapState ``seq -> (label, toks)`` — the forget ring:
  ``updateValue`` on learn, ``removeKey`` on forget, O(1) per sample —
  never a full-queue rewrite (a ListState would need one on every pop).
- ``feat``  MapState ``"label\\0tok" -> cnt`` — naive-Bayes frequency
  table.
- ``tok``   MapState ``tok -> cnt`` — cross-label totals, maintained so
  ``vocab`` updates incrementally (0→n grows it, n→0 shrinks it) instead
  of scanning the feature table per batch.

Python state accesses are proto round-trips to the JVM state server, so
``handleInputRows`` accumulates the batch's deltas in plain dicts and
flushes each TOUCHED key once.

State TTL: pass ``ttl_ms`` to expire idle per-filter state — the
reference drops per-filter state 10 minutes after last data
(OutlierDetectionBolt.java:100-111); TTL here is per state value and
native to the API (no timer bookkeeping).

Runtime requirements (gate with ``tws_available()``): the
transformWithState Python⇄JVM state protocol is protobuf-based
(``pyspark.sql.streaming.proto``), so the ``protobuf`` package must be
installed, and the query must run on the RocksDB state store provider.
Environments without protobuf fall back to
``stateful.streaming_classifier`` (same observable contract); the
processor's learn/forget logic is unit-tested against fake state so the
semantics stay covered either way.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

from cloudpelican_lsd_spark.operators.classifier import CAT_ERROR
from cloudpelican_lsd_spark.streaming.stateful import (
    MEMORY_CAPACITY,
    OUTPUT_SCHEMA,
    STATE_TTL_MS,
)


def tws_available() -> bool:
    """True iff transformWithStateInPandas can run here (its state
    protocol needs the protobuf package, not bundled with pyspark)."""
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False


class OnlineClassifierProcessor(StatefulProcessor):
    """Per-filter online naive Bayes with the 1000-sample forget ring."""

    def __init__(
        self, ttl_ms: int | None = None, capacity: int = MEMORY_CAPACITY
    ) -> None:
        self._ttl = ttl_ms
        self._cap = capacity

    def init(self, handle: StatefulProcessorHandle) -> None:
        # idle eviction is a per-key TIMER clearing the WHOLE model (the
        # reference drops the entire per-filter classifier after 10 idle
        # minutes).  Per-VALUE state TTL is the wrong granularity here:
        # an individual ring slot expiring ahead of the head/tail
        # counters makes its learn-time increments unforgettable
        # (`old is None` on forget), permanently inflating n_err/n_reg
        # and leaking feat/tok counts kept alive by other samples.
        self._handle = handle
        self._meta = handle.getValueState(
            "meta",
            "head BIGINT, tail BIGINT, n_err BIGINT, n_reg BIGINT, vocab BIGINT",
            None,
        )
        self._mem = handle.getMapState(
            "mem", "seq BIGINT", "label STRING, toks ARRAY<STRING>", None
        )
        self._feat = handle.getMapState("feat", "k STRING", "cnt BIGINT", None)
        self._tok = handle.getMapState("tok", "t STRING", "cnt BIGINT", None)
        # state-layout version marker: absent on checkpoints written under
        # the old per-VALUE-TTL scheme (where expired ring slots are
        # legitimate), present (=2) once the whole-model-timer scheme has
        # touched the key — gates the missing-slot corruption check below
        self._ver = handle.getValueState("ver", "v INT", None)

    @staticmethod
    def _load(
        cache: dict, prior: dict, mapstate, key: str
    ) -> None:
        if key not in cache:
            p = (
                mapstate.getValue((key,))[0]
                if mapstate.containsKey((key,))
                else 0
            )
            cache[key] = p
            prior[key] = p

    def handleInputRows(
        self, key: tuple, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        if self._ttl is not None:
            # slide the idle-eviction timer: one live timer per key at
            # now + ttl (reference: 10-min idle drops the whole model)
            now = timerValues.getCurrentProcessingTimeInMs()
            for t in self._handle.listTimers():
                self._handle.deleteTimer(t)
            self._handle.registerTimer(now + self._ttl)
        has_meta = self._meta.exists()
        head, tail, n_err, n_reg, vocab = (
            tuple(self._meta.get()) if has_meta else (0, 0, 0, 0, 0)
        )
        # Version marker: keys first touched by the whole-model-timer
        # scheme get v2 (strict: a missing ring slot is corruption); keys
        # resumed from a pre-marker checkpoint get v1 PERMANENTLY — their
        # ring may hold slots that legitimately expired under the old
        # per-value TTL, and those can surface many batches later, so the
        # tolerance must survive restarts (idle eviction clears the whole
        # key, after which it is re-created strict at v2).
        if self._ver.exists():
            legacy_state = tuple(self._ver.get())[0] < 2
        else:
            legacy_state = has_meta
            self._ver.update((1,) if has_meta else (2,))
        feat_d: dict = {}
        feat_p: dict = {}
        tok_d: dict = {}
        tok_p: dict = {}
        for pdf in rows:
            for _raw, label in zip(pdf["_raw"], pdf["label"]):
                label = str(label)
                toks = str(_raw).split()
                self._mem.updateValue((tail,), (label, toks))
                tail += 1
                if label == CAT_ERROR:
                    n_err += 1
                else:
                    n_reg += 1
                for t in toks:
                    self._load(feat_d, feat_p, self._feat, f"{label}\x00{t}")
                    feat_d[f"{label}\x00{t}"] += 1
                    self._load(tok_d, tok_p, self._tok, t)
                    tok_d[t] += 1
                if tail - head > self._cap:
                    old = self._mem.getValue((head,))
                    self._mem.removeKey((head,))
                    head += 1
                    if old is None:
                        if not legacy_state:
                            # unreachable since idle eviction moved from
                            # per-value TTL to a whole-model timer (init);
                            # a missing ring slot in versioned state means
                            # corruption — fail loudly, don't drift
                            raise RuntimeError(
                                f"forget ring slot {head - 1} missing for "
                                f"key {key!r}: state corruption"
                            )
                        # checkpoint resumed from the pre-timer per-VALUE
                        # TTL scheme: expired slots are legitimate there
                        # and their counts cannot be reconstructed — skip
                        # the decrement (with a warning) instead of
                        # turning the upgrade into a batch-retry loop
                        import logging

                        logging.getLogger(__name__).warning(
                            "legacy (pre-v2) state for key %r: ring slot "
                            "%d expired under the old per-value TTL; "
                            "skipping its decrement",
                            key,
                            head - 1,
                        )
                        continue
                    old_label, old_toks = old
                    if str(old_label) == CAT_ERROR:
                        n_err -= 1
                    else:
                        n_reg -= 1
                    for t in old_toks:
                        k = f"{old_label}\x00{t}"
                        self._load(feat_d, feat_p, self._feat, k)
                        feat_d[k] -= 1
                        self._load(tok_d, tok_p, self._tok, str(t))
                        tok_d[str(t)] -= 1
        # flush each touched key once; drop zeroed entries
        for k, v in feat_d.items():
            if v != feat_p[k]:
                if v > 0:
                    self._feat.updateValue((k,), (v,))
                elif feat_p[k] > 0:
                    self._feat.removeKey((k,))
        for t, v in tok_d.items():
            if v > 0 and tok_p[t] == 0:
                vocab += 1
            elif v <= 0 and tok_p[t] > 0:
                vocab -= 1
            if v != tok_p[t]:
                if v > 0:
                    self._tok.updateValue((t,), (v,))
                elif tok_p[t] > 0:
                    self._tok.removeKey((t,))
        self._meta.update((head, tail, n_err, n_reg, vocab))
        yield pd.DataFrame(
            [
                {
                    "filter_id": key[0],
                    "samples_in_memory": tail - head,
                    "err_samples": n_err,
                    "reg_samples": n_reg,
                    "vocab_size": vocab,
                }
            ]
        )

    def handleExpiredTimer(
        self, key: tuple, timerValues, expiredTimerInfo
    ) -> Iterator[pd.DataFrame]:
        """Idle eviction: the per-key timer fired with no new rows since
        it was armed — drop the ENTIRE per-filter model (ring, counts,
        vocabulary), exactly the reference's 10-min whole-classifier
        eviction.  Emits the zeroed contract row so downstream sees the
        eviction."""
        self._meta.clear()
        self._mem.clear()
        self._feat.clear()
        self._tok.clear()
        self._ver.clear()
        yield pd.DataFrame(
            [
                {
                    "filter_id": key[0],
                    "samples_in_memory": 0,
                    "err_samples": 0,
                    "reg_samples": 0,
                    "vocab_size": 0,
                }
            ]
        )

    def close(self) -> None:
        pass


def streaming_classifier_tws(
    labeled_matched: DataFrame,
    evict_stale: bool = False,
    capacity: int = MEMORY_CAPACITY,
) -> DataFrame:
    """`(filter_id, samples_in_memory, err_samples, reg_samples,
    vocab_size)` per micro-batch — same contract as
    ``stateful.streaming_classifier``, incremental state.

    Requires the RocksDB state store provider
    (``spark.sql.streaming.stateStore.providerClass =
    ...RocksDBStateStoreProvider``) — transformWithState is only
    implemented there.  ``evict_stale=True`` applies the reference's
    10-min idle eviction as a per-key processing-time TIMER that clears
    the whole model (per-value TTL would let individual ring slots
    expire ahead of the head/tail counters and drift the counts)."""
    return labeled_matched.groupBy("filter_id").transformWithStateInPandas(
        OnlineClassifierProcessor(
            STATE_TTL_MS if evict_stale else None, capacity
        ),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="update",
        timeMode="processingTime" if evict_stale else "none",
    )
