"""ASCII chart renderer (chart.py) — reference cli/stats.go semantics:
20-row height cap, dual-series o/* overlay, ascending buckets, last
width-1 points."""

from __future__ import annotations

from cloudpelican_lsd_spark.chart import MAX_HEIGHT, render_chart


def test_basic_shape_and_scale():
    out = render_chart({1: {0: 1, 60: 2, 120: 4}, 2: {60: 1}}, width=10, height=4)
    lines = out.split("\n")
    assert lines[0] == "max 4"
    assert lines[-1] == "0 .. 120"
    grid = lines[1:-2]
    assert len(grid) == 4
    # max value fills the full height in its column
    col_heights = {}
    for x in range(3):
        col_heights[x] = sum(1 for row in grid if row[x] != " ")
    assert col_heights[2] == 4 and col_heights[0] >= 1


def test_error_series_overlays_regular():
    out = render_chart({1: {0: 4}, 2: {0: 2}}, height=4)
    grid = out.split("\n")[1:-2]
    col = [row[0] for row in grid]
    # bottom half error (*), top half regular (o): error drawn over regular
    assert col == ["o", "o", "*", "*"]


def test_height_cap_and_truncation():
    series = {1: {i * 60: 1 for i in range(50)}}
    out = render_chart(series, width=11, height=99)
    lines = out.split("\n")
    assert len(lines) == 1 + MAX_HEIGHT + 2  # header + rows + axis + labels
    assert len(lines[-2]) == 10  # last width-1 buckets only
    assert lines[-1].startswith(str(40 * 60))  # oldest shown = bucket 40


def test_empty_series():
    assert render_chart({}) == "(no data)"


def test_zero_counts_leave_blank_columns():
    out = render_chart({1: {0: 0, 60: 3}}, height=3)
    grid = out.split("\n")[1:-2]
    assert all(row[0] == " " for row in grid)
    assert sum(1 for row in grid if row[1] == "o") == 3


def test_engine_stats_chart(spark, sf_dir):
    from cloudpelican_lsd_spark.engine import CloudPelicanEngine
    from cloudpelican_lsd_spark.sources.tables import logs_view

    eng = CloudPelicanEngine(spark, logs_view(spark, sf_dir), sf_dir=sf_dir)
    eng.create_filter("anything", "value=")
    out = eng.stats_chart("anything", window_sec=86400 * 40, rollup_sec=86400)
    lines = out.split("\n")
    assert lines[0].startswith("max ")
    assert "o" in out  # regular series present


def test_half_boundary_rounds_up_consistently():
    # height=4, max=8: counts 5 (2.5 cells) and 7 (3.5 cells) must both
    # round half-up -> 3 and 4 cells
    out = render_chart({1: {0: 5, 60: 7, 120: 8}}, height=4)
    grid = out.split("\n")[1:-2]
    heights = [sum(1 for row in grid if row[x] != " ") for x in range(3)]
    assert heights == [3, 4, 4]
