"""CPL_CHECKPOINT tier switch (r9, VERDICT item 6): every lineage
truncation in the engine goes through ``checkpoint.materialize``, and the
``reliable`` tier must produce byte-identical results on a toy checkpoint
directory — the tier changes WHERE the materialized bytes live, never
WHAT they are."""

from __future__ import annotations

import os

import pytest

from cloudpelican_lsd_spark.checkpoint import materialize
from cloudpelican_lsd_spark.sources.tables import load_table


@pytest.fixture
def reliable_tier(tmp_path, spark):
    os.environ["CPL_CHECKPOINT"] = "reliable"
    os.environ["CPL_CHECKPOINT_DIR"] = str(tmp_path / "ckpt")
    # a prior test/session may have pinned a checkpoint dir; force ours
    spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
    yield str(tmp_path / "ckpt")
    os.environ.pop("CPL_CHECKPOINT", None)
    os.environ.pop("CPL_CHECKPOINT_DIR", None)


def test_materialize_local_default(spark, sf_dir):
    """Default tier is localCheckpoint: no checkpoint files written, the
    plan leaf is an ExistingRDD, rows unchanged."""
    docs = load_table(spark, "documents", sf_dir).select("doc_id")
    out = materialize(docs)
    assert sorted(r.doc_id for r in out.collect()) == sorted(
        r.doc_id for r in docs.collect()
    )
    assert "ExistingRDD" in out._jdf.queryExecution().executedPlan().toString()


def test_materialize_reliable_identical(spark, sf_dir, reliable_tier):
    """Reliable tier: rows byte-identical to the lazy plan, and the toy
    checkpoint dir actually holds the materialized RDD files."""
    docs = load_table(spark, "documents", sf_dir)
    base = sorted(map(tuple, docs.collect()))
    out = materialize(docs)
    assert sorted(map(tuple, out.collect())) == base
    files = [
        os.path.join(dp, f)
        for dp, _dn, fn in os.walk(reliable_tier)
        for f in fn
    ]
    assert files, "reliable tier wrote nothing to the checkpoint dir"


def test_reliable_tier_through_an_operator(spark, sf_dir, reliable_tier):
    """End-to-end through a checkpointing operator: connected-components
    clusters are identical under both tiers (the CC rounds call
    materialize every iteration — the hottest truncation path)."""
    from cloudpelican_lsd_spark.operators import dedup as D

    docs = load_table(spark, "documents", sf_dir)
    pairs = D.lsh_candidate_pairs(docs, num_hashes=12, rows_per_band=3, n=3)
    reliable = sorted(
        map(tuple, D.connected_components(pairs).collect())
    )
    os.environ.pop("CPL_CHECKPOINT", None)  # back to local tier
    local = sorted(map(tuple, D.connected_components(pairs).collect()))
    assert reliable == local
