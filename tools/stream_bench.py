"""Streaming throughput bench: lines/sec through the full streaming
pipeline (parse → compiled fan-out → epoch-idempotent results + stats
sinks) with an availableNow trigger over generated syslog files.

    python tools/stream_bench.py [n_lines] [n_filters]

Prints one JSON line: lines, wall seconds, lines/sec, and per-batch
progress from Spark's own StreamingQueryProgress.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    n_lines = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    n_filters = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    from cloudpelican_lsd_spark.catalog import FilterCatalog
    from cloudpelican_lsd_spark.session import get_spark
    from cloudpelican_lsd_spark.streaming.pipeline import (
        StreamingEngine,
        file_source,
    )

    spark = get_spark("stream-bench")
    cat = FilterCatalog()
    pats = [
        "error", "checkout", "login", "payment", "timeout", "(?i)warn",
        r"value=[0-9]{3}", r"host1[0-9]+", r"(100|200)", "click", "view",
        r"app: [a-z]+",
    ]
    for i in range(n_filters):
        cat.create(f"f{i}", pats[i % len(pats)])

    with tempfile.TemporaryDirectory() as td:
        src = os.path.join(td, "in")
        os.makedirs(src)
        # 8 files so the file source parallelizes the scan
        per = n_lines // 8
        for f in range(8):
            with open(os.path.join(src, f"part{f}.log"), "w") as fh:
                for i in range(per):
                    j = f * per + i
                    fh.write(
                        f"2024-01-01T10:{(j//60000)%60:02d}:{(j//1000)%60:02d}"
                        f".{j%1000:03d}+00:00 host{j%97} app: "
                        f"{'error' if j%7==0 else 'click'} value={j%1000} id={j}\n"
                    )
        eng = StreamingEngine(spark, cat, base_dir=os.path.join(td, "state"))
        t0 = time.time()
        q = eng.start(file_source(spark, src), trigger={"availableNow": True})
        finished = q.awaitTermination(600)
        if not finished:
            q.stop()
            raise SystemExit("stream did not drain within 600s; bench invalid")
        wall = time.time() - t0
        batches = [
            {"rows": p["numInputRows"], "ms": p["batchDuration"]}
            for p in (json.loads(x.json) for x in q.recentProgress)
            if p["numInputRows"]
        ]
        n_results = eng.results().count()
        print(
            json.dumps(
                {
                    "lines": 8 * per,
                    "filters": n_filters,
                    "wall_sec": round(wall, 2),
                    "lines_per_sec": round(8 * per / wall),
                    "matched_results": n_results,
                    "batches": batches,
                }
            )
        )
    spark.stop()


if __name__ == "__main__":
    main()
