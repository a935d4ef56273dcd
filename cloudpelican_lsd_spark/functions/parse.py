"""Line parse/normalize — the reference's ParseBolt semantics, declaratively.

Reference behavior (storm .../ParseBolt.java:49-93):
- trim; drop null/empty lines
- truncate messages over 4096 chars, appending ``..`` (ParseBolt.java:29,62-66)
- sniff log type and extract an ISO-8601 event timestamp
  (LogTypeSniffer.java:20-51); fall back to processing time
  (ParseBolt.java:81-84)

All of it compiles to built-in column expressions — no UDF, stays inside
whole-stage codegen, filters push down to the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: reference: ParseBolt.java:29
MAX_MSG_LENGTH = 4096

#: ISO-8601 with optional fractional seconds and offset
#: (reference regex: LogTypeSniffer.java:20)
ISO8601_RE = (
    r"[0-9]{4}-[0-9]{2}-[0-9]{2}T[0-9]{2}:[0-9]{2}:[0-9]{2}"
    r"(\.[0-9]+)?(Z|[+-][0-9]{2}:?[0-9]{2})?"
)

#: heuristic "likely error" keyword list, verbatim from
#: reference: storm .../ErrorClassifierBolt.java:44
ERROR_WORDS = (
    "err;error;fail;failed;failure;timed out;exception;unexpected;"
    "not found;unauthorized;not authorized;missing;reject;rejected;"
    "drop;dropped;warn;warning;crit;critical;fatal;emerg;emergency;"
    "alert;404"
).split(";")


def normalize_lines(df: DataFrame, raw: str = "_raw") -> DataFrame:
    """trim → drop empty → truncate-with-`..` (ParseBolt.java:49-66).

    The empty/null filter runs on ``length(trim(raw))`` BEFORE the
    truncation projection: filtering on the computed column makes Spark
    evaluate the whole truncate expression twice (once in the Filter,
    once in the Project — no subexpression elimination across the two
    operators; measured ~3x the whole-operator cost).  Equivalent output:
    truncation never turns a non-empty trimmed line empty, and NULL
    length is never > 0.
    """
    c = F.trim(F.col(raw))
    truncated = F.when(
        F.length(c) > MAX_MSG_LENGTH,
        F.concat(F.substring(c, 1, MAX_MSG_LENGTH), F.lit("..")),
    ).otherwise(c)
    return df.where(F.length(c) > 0).withColumn(raw, truncated)


def extract_event_time(raw: Column) -> Column:
    """ISO-8601 timestamp substring → TIMESTAMP_NTZ; NULL when absent OR
    regex-matched but invalid (month 13, hour 99 — the digit classes
    admit them), so such lines take the caller's processing-time
    fallback instead of aborting the whole query under ANSI mode
    (try_to_timestamp_ntz, the same reason sources/formats.py uses
    try_to_timestamp).

    Callers add the processing-time fallback with
    ``coalesce(extract_event_time(c), current_timestamp())``
    (ParseBolt.java:81-84).
    """
    s = F.regexp_extract(raw, ISO8601_RE, 0)
    # normalize: strip offset/Z for NTZ parse; seconds-precision tolerant
    s = F.when(s == "", None).otherwise(s)
    cleaned = F.regexp_replace(s, r"(Z|[+-][0-9]{2}:?[0-9]{2})$", "")
    # the regex admits ANY fractional digit count but a fixed
    # [.SSSSSS][.SSS] pattern parses only 3 or 6 — under ANSI (Spark 4
    # default) one line like '...:00.12Z' would abort the whole query.
    # Width-normalize the fraction to exactly 6 digits (truncate past
    # micros, right-pad short) so the parse pattern always matches.
    frac = F.regexp_extract(cleaned, r"\.([0-9]+)$", 1)
    base = F.regexp_replace(cleaned, r"\.[0-9]+$", "")
    norm = F.when(
        frac == "", base
    ).otherwise(
        F.concat(base, F.lit("."), F.rpad(F.substring(frac, 1, 6), 6, "0"))
    )
    # Spark has try_to_timestamp but no try_to_timestamp_ntz; gate the
    # NTZ parse on the try-variant's validity (same calendar parser —
    # the timezone only affects the epoch conversion, not validity) so
    # the CASE stays lazy and the result stays session-tz-independent.
    fmt = F.lit("yyyy-MM-dd'T'HH:mm:ss[.SSSSSS]")
    return F.when(
        F.try_to_timestamp(norm, fmt).isNotNull(),
        F.to_timestamp_ntz(norm, fmt),
    )


def is_likely_error(raw: Column) -> Column:
    """Any of the 25 error keywords present (case-insensitive substring),
    reference: ErrorClassifierBolt.java:71-89."""
    lowered = F.lower(raw)
    cond = None
    for w in ERROR_WORDS:
        c = lowered.contains(w)
        cond = c if cond is None else (cond | c)
    return cond


def is_likely_error_sql(col: str = "_raw") -> str:
    """DuckDB-equivalent predicate for the oracle side."""
    return "(" + " OR ".join(f"lower({col}) LIKE '%{w}%'" for w in ERROR_WORDS) + ")"


#: the sniffer's detection regex (LogTypeSniffer.java:21): ISO-8601 with
#: millis + numeric offset anywhere in the line
SNIFF_ISO_RE = (
    r"[0-9]{4}-[0-9]{2}-[0-9]{2}T[0-9]{2}:[0-9]{2}:[0-9]{2}"
    r"\.[0-9]{3}[0-9]*(\+|-)[0-9]{2}:[0-9]{2}"
)


def sniff_log_type(raw: Column) -> Column:
    """'rsyslog' | 'unknown' — the reference's log-type sniffer
    (LogTypeSniffer.java:24-51, LogTypes.java:6-9): a line is RSYSLOG iff
    it carries an embedded ISO-8601 timestamp with millis and offset;
    everything else is UNKNOWN (and falls back to processing time)."""
    return F.when(raw.rlike(SNIFF_ISO_RE), F.lit("rsyslog")).otherwise(
        F.lit("unknown")
    )
