"""ASCII chart rendering for `stats` — the reference console's last mile.

Reproduces the behavior of the reference's chart renderer
(cli/stats.go:59-201, implemented fresh from its observed semantics, not
ported): dual-series overlay of the regular (`o`) and error (`*`) metric
per time bucket, capped at 20 rows of height (stats.go:124), buckets in
ascending time order (stats.go:97-101), truncated to the last
`width - 1` data points (stats.go:116-123), y-scale from a single
min/max pass (stats.go:127-137).

Driver-side presentation over an ALREADY-AGGREGATED series (the engine's
`stats()` query returns one row per bucket — thousands of points at
most, never raw data), so collecting here is scale-correct.
"""

from __future__ import annotations

MAX_HEIGHT = 20  # stats.go:124
CHAR_REGULAR = "o"  # stats.go:69-90
CHAR_ERROR = "*"


def render_chart(
    series: dict[int, dict[int, int]],
    width: int = 80,
    height: int = MAX_HEIGHT,
    regular_metric: int = 1,
    error_metric: int = 2,
) -> str:
    """Render `{metric: {bucket: count}}` as an ASCII chart string.

    One column per bucket (ascending), `o` for the regular series, `*`
    for errors; when both land in the same cell the error wins (it is the
    signal the operator is looking for).  A y-axis label of the max value
    heads the chart; the x-axis line carries first/last bucket.
    """
    height = min(height, MAX_HEIGHT)
    regular = series.get(regular_metric, {})
    errors = series.get(error_metric, {})
    buckets = sorted(set(regular) | set(errors))[-(max(width - 1, 1)):]
    if not buckets:
        return "(no data)"
    values = [max(regular.get(b, 0), errors.get(b, 0)) for b in buckets]
    vmax = max(values)
    vmin = 0
    span = max(vmax - vmin, 1)

    def level(v: int) -> int:
        # 0..height cells; any nonzero count shows at least one cell.
        # Half-up (int(x + 0.5)), not Python's banker's round(): adjacent
        # half-boundary values must snap in one direction consistently.
        if v <= 0:
            return 0
        return max(1, int((v - vmin) * height / span + 0.5))

    grid = [[" "] * len(buckets) for _ in range(height)]
    for x, b in enumerate(buckets):
        for char, val in ((CHAR_REGULAR, regular.get(b, 0)), (CHAR_ERROR, errors.get(b, 0))):
            for y in range(level(val)):
                grid[height - 1 - y][x] = char
    lines = [f"max {vmax}"]
    lines += ["".join(row) for row in grid]
    lines.append("-" * len(buckets))
    lines.append(f"{buckets[0]} .. {buckets[-1]}")
    return "\n".join(lines)


def chart_from_df(df, width: int = 80, height: int = MAX_HEIGHT) -> str:
    """Render the engine's stats DataFrame `(metric, bucket, cnt)`."""
    series: dict[int, dict[int, int]] = {}
    for r in df.collect():
        series.setdefault(int(r["metric"]), {})[int(r["bucket"])] = int(r["cnt"])
    return render_chart(series, width=width, height=height)
