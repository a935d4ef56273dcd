"""`python -m cloudpelican_lsd_spark` — the interactive console.

The reference ships a terminal CLI (cli/cloudpelican-lsd.go: prompt
``cloudpelican> ``, ``-e "cmd; cmd"`` startup commands separated by
semicolons, session persistence) that speaks to the supervisor; here the
same console speaks to the in-process engine over the parquet testdata,
so every command in the grammar — filters, grep pipelines, select/tail/
stats/search, explain — runs end-to-end from a shell:

    python -m cloudpelican_lsd_spark -e "create filter web as 'error'; \
        cat web | grep -i timeout | limit 5"
    echo "show filters" | python -m cloudpelican_lsd_spark

Rendering: DataFrames print as TSV (shared df_to_tsv path), ``stats``
prints the ASCII chart (chart.py), lists/dicts print one entry per line
— the same choices as the Slack adapter, without its 12 KB cap.  Errors
print as ``error: ...`` and keep the console alive (cloudpelican-lsd.go
logs and re-prompts).  Exit code is 1 if any ``-e``/piped command
errored, 0 otherwise, so shell scripts can gate on it.
"""

from __future__ import annotations

import argparse
import os
import sys


def _render(engine, command: str) -> tuple[str, bool]:
    """(text, ok) — the shared renderer (engine.render_result), uncapped."""
    from cloudpelican_lsd_spark.engine import render_result

    return render_result(engine, command)


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="cloudpelican_lsd_spark")
    ap.add_argument(
        "-e",
        dest="commands",
        default="",
        help="commands to execute, separated by semi-colon (then exit); a"
             " regex ARGUMENT containing ';' must go via stdin/interactive"
             " mode instead — the split is quoting-unaware, like the"
             " reference CLI's",
    )
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"),
        help="parquet table directory",
    )
    ap.add_argument(
        "--session", default=None, help="session file to load/save (CLI `save`)"
    )
    args = ap.parse_args(argv)

    from cloudpelican_lsd_spark.engine import CloudPelicanEngine
    from cloudpelican_lsd_spark.session import get_spark
    from cloudpelican_lsd_spark.sources.tables import logs_view

    spark = get_spark()
    engine = CloudPelicanEngine(
        spark,
        logs_view(spark, args.sf_dir),
        sf_dir=args.sf_dir,
        session_path=args.session,
    )
    if args.session:
        engine.load_session()

    any_err = False

    def run(cmd: str) -> None:
        nonlocal any_err
        cmd = cmd.strip()
        if not cmd:
            return
        text, ok = _render(engine, cmd)
        any_err |= not ok
        print(text, flush=True)

    if args.commands:
        for cmd in args.commands.split(";"):
            run(cmd)
        return 1 if any_err else 0

    interactive = sys.stdin.isatty()
    while True:
        if interactive:
            sys.stdout.write("cloudpelican> ")
            sys.stdout.flush()
        line = sys.stdin.readline()
        if not line:
            break
        if line.strip().lower() in ("exit", "quit"):
            break
        run(line)
    return 1 if any_err else 0


if __name__ == "__main__":
    sys.exit(main())
