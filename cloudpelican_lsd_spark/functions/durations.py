"""Duration literals: ``10m`` / ``2h`` / ``1d`` → seconds.

Reference grammar (cli/cloudpelican-lsd.go:723-747): integer + optional
suffix s/m/h/d (no suffix = seconds).
"""

from __future__ import annotations

_UNITS = {"s": 1, "m": 60, "h": 3600, "d": 86400}


def parse_duration(s: str) -> int:
    s = s.strip().lower()
    if not s:
        raise ValueError("empty duration")
    if s[-1] in _UNITS:
        num, unit = s[:-1], _UNITS[s[-1]]
    else:
        num, unit = s, 1
    if not num.isdigit():
        raise ValueError(f"invalid duration: {s!r}")
    return int(num) * unit
