"""JSONL/CSV log ingest: every wire format lands in the same engine
stream schema and feeds the standing-filter fan-out unchanged."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from cloudpelican_lsd_spark.sources.formats import (
    jsonl_stream_source,
    read_csv_logs,
    read_jsonl_logs,
)

ROWS = [
    {"message": "checkout failed err=502", "ts": "2024-01-03T10:00:05",
     "host": "web1", "level": "ERROR"},
    {"message": "login ok", "ts": "2024-01-03T10:00:06", "host": "web2",
     "level": "INFO"},
    {"message": "ts inside 2024-01-03T11:22:33.123+00:00 here", "ts": None,
     "host": "web3", "level": "INFO"},
]


def test_jsonl_ingest(spark, tmp_path):
    p = tmp_path / "logs.jsonl"
    with open(p, "w") as fh:
        for r in ROWS:
            fh.write(json.dumps(r) + "\n")
        fh.write("{not valid json\n")
    df = read_jsonl_logs(spark, str(p))
    rows = df.orderBy("ts").collect()
    assert df.columns == ["_raw", "ts", "ts_epoch"]
    assert len(rows) == 3  # corrupt line dropped
    assert rows[0]._raw == "2024-01-03T10:00:05 ERROR web1 checkout failed err=502"
    assert str(rows[0].ts) == "2024-01-03 10:00:05"
    # missing explicit ts -> extracted from message text
    assert str(rows[2].ts).startswith("2024-01-03 11:22:33")
    assert rows[0].ts_epoch == 1704276005


def test_csv_ingest_matches_jsonl(spark, tmp_path):
    p = tmp_path / "logs.csv"
    with open(p, "w") as fh:
        fh.write("message,ts,host,level\n")
        for r in ROWS[:2]:
            fh.write(f"{r['message']},{r['ts']},{r['host']},{r['level']}\n")
    df = read_csv_logs(spark, str(p))
    assert [r._raw for r in df.orderBy("ts").collect()] == [
        "2024-01-03T10:00:05 ERROR web1 checkout failed err=502",
        "2024-01-03T10:00:06 INFO web2 login ok",
    ]


def test_jsonl_feeds_fanout(spark, tmp_path):
    from cloudpelican_lsd_spark.catalog import FilterCatalog
    from cloudpelican_lsd_spark.operators.fanout import match_filters_compiled

    p = tmp_path / "logs.jsonl"
    with open(p, "w") as fh:
        for r in ROWS:
            fh.write(json.dumps(r) + "\n")
    cat = FilterCatalog()
    cat.create("errs", "(?i)error")
    logs = read_jsonl_logs(spark, str(p))
    matched = match_filters_compiled(logs, cat.list())
    assert matched.count() == 1


def test_jsonl_streaming_source(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    with open(src / "a.jsonl", "w") as fh:
        for r in ROWS:
            fh.write(json.dumps(r) + "\n")
    stream = jsonl_stream_source(spark, str(src))
    assert stream.isStreaming
    q = (
        stream.writeStream.format("memory")
        .queryName("jsonl_mem")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    got = spark.sql("SELECT * FROM jsonl_mem").collect()
    assert len(got) == 3
    assert {c for c in spark.table("jsonl_mem").columns} == {"_raw", "ts", "ts_epoch"}


def test_jsonl_streaming_drops_corrupt(spark, tmp_path):
    src = tmp_path / "in2"
    src.mkdir()
    with open(src / "a.jsonl", "w") as fh:
        for r in ROWS:
            fh.write(json.dumps(r) + "\n")
        fh.write("{definitely not json\n")
    stream = jsonl_stream_source(spark, str(src))
    q = (
        stream.writeStream.format("memory")
        .queryName("jsonl_mem2")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    assert spark.sql("SELECT * FROM jsonl_mem2").count() == 3


def test_orc_roundtrip_matches_jsonl_twin(spark, tmp_path):
    """The same records ingested via ORC and via JSONL produce identical
    engine-schema rows (one normalize chain, three wire formats)."""
    import json

    from cloudpelican_lsd_spark.sources import formats as fm

    recs = [
        {"message": "error failed x", "ts": "2024-03-01T10:00:01", "host": "h1", "level": "ERROR"},
        {"message": "ok served", "ts": "2024-03-01T10:00:02", "host": "h2", "level": "INFO"},
        {"message": None, "ts": "2024-03-01T10:00:03", "host": "h3", "level": "WARN"},
    ]
    jdir = str(tmp_path / "j")
    (tmp_path / "j").mkdir()
    with open(f"{jdir}/a.jsonl", "w") as fh:
        for r in recs:
            fh.write(json.dumps(r) + "\n")
    src = spark.createDataFrame(
        [(r["message"], r["ts"], r["host"], r["level"]) for r in recs],
        "message STRING, ts STRING, host STRING, level STRING",
    )
    odir = str(tmp_path / "o")
    fm.write_orc_logs(src, odir)

    via_orc = {(r._raw, r.ts_epoch) for r in fm.read_orc_logs(spark, odir).collect()}
    via_json = {(r._raw, r.ts_epoch) for r in fm.read_jsonl_logs(spark, jdir).collect()}
    assert via_orc == via_json and len(via_orc) == 3
