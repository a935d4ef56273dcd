from cloudpelican_lsd_spark.functions.predicates import (  # noqa: F401
    GrepPredicate,
    grep_column,
    grep_sql,
    is_plain_word,
)
from cloudpelican_lsd_spark.functions.parse import (  # noqa: F401
    ERROR_WORDS,
    ISO8601_RE,
    MAX_MSG_LENGTH,
    extract_event_time,
    is_likely_error,
    normalize_lines,
)
