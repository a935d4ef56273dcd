"""Rebaseline one query's BENCH_HISTORY samples after a DELIBERATE plan
change.

bench.py's re-measure band judges a fresh timing against the query's
median across ALL prior history samples.  When a query is intentionally
rewritten to a slower-but-correct plan (events_zorder_locality's r5
exact-ntile rewrite: ~0.7 s -> ~1.9 s), the pre-rewrite samples drag the
median below anything the new plan can produce, so the band re-measures
the query on EVERY run — masking any real regression.  This tool drops
the query's samples from history entries recorded BEFORE the rewrite
timestamp, so the median reflects only the current plan.

The edit is surgical and auditable: only the named query's sample is
removed from pre-cutoff entries (headline totals and every other query's
samples are untouched), and a `rebaselined` marker is appended to each
edited entry naming the query and the reason.

Usage: python tools/history_rebaseline.py <query> <cutoff_ts> <reason>
"""

from __future__ import annotations

import json
import sys

HISTORY = "/root/repo/BENCH_HISTORY.jsonl"


def main() -> None:
    if len(sys.argv) != 4:
        raise SystemExit(__doc__)
    query, cutoff, reason = sys.argv[1], int(sys.argv[2]), sys.argv[3]
    with open(HISTORY) as fh:
        entries = [json.loads(line) for line in fh if line.strip()]
    edited = 0
    for e in entries:
        # entries MISSING ts are skipped, not treated as pre-cutoff —
        # silently deleting a sample from an entry whose age is unknown
        # is exactly the kind of quiet history edit this tool exists to
        # avoid (ts=0 sentinel entries ARE legitimately oldest)
        if "ts" not in e:
            continue
        if e["ts"] < cutoff and query in e.get("queries", {}):
            del e["queries"][query]
            e.setdefault("rebaselined", []).append(
                {"query": query, "reason": reason}
            )
            edited += 1
    if not edited:
        raise SystemExit(
            f"no pre-cutoff samples of {query!r} found — nothing to do"
        )
    # atomic publish: write the full file aside and rename — a truncate-
    # in-place interrupted mid-write would destroy the entire benchmark
    # history (the same hazard class _swap_table documents)
    import os

    tmp = HISTORY + ".tmp"
    with open(tmp, "w") as fh:
        for e in entries:
            fh.write(json.dumps(e, separators=(",", ":")) + "\n")
    os.rename(tmp, HISTORY)
    print(
        f"rebaselined {query}: dropped its sample from {edited} entries "
        f"older than ts={cutoff}"
    )


if __name__ == "__main__":
    main()
