"""Period type + Allen's interval algebra.

Parity with the reference's period functions
(reference core/src/main/clojure/xtdb/expression/temporal.clj:2001-2080):
`period(from, to)` constructor plus the predicate family
contains/overlaps/equals/precedes/succeeds/leads/lags with strict and
immediate variants, and accessors lower/upper/lower_inf/upper_inf.

Representation: a period is a `struct<_from: timestamp, _to: timestamp>`
where a NULL `_to` means unbounded (+∞), matching the reference's
`tstz-range` extension type (SURVEY.md §1.3). Periods are CLOSED at
the start and OPEN at the end ([from, to)), the same convention as
XTDB valid/system time.

Everything here returns Column expressions — pure Catalyst, no UDFs,
so these predicates participate in predicate pushdown and whole-stage
codegen even inside 100 TB scans.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

FROM, TO = "_from", "_to"


def period(from_ts, to_ts=None) -> Column:
    """Construct a period struct; `to_ts=None` → unbounded end."""
    to_col = F.lit(None).cast("timestamp") if to_ts is None else _ts(to_ts)
    return F.struct(_ts(from_ts).alias(FROM), to_col.alias(TO))


def _ts(x) -> Column:
    c = x if isinstance(x, Column) else F.lit(x)
    return c.cast("timestamp")


def p_lower(p: Column) -> Column:
    return p[FROM]


def p_upper(p: Column) -> Column:
    return p[TO]


def p_lower_inf(p: Column) -> Column:
    return p[FROM].isNull()


def p_upper_inf(p: Column) -> Column:
    return p[TO].isNull()


def _end(p: Column) -> Column:
    """End bound with NULL treated as +∞ via coalesce to max ts."""
    return F.coalesce(p[TO], F.lit("9999-12-31 23:59:59").cast("timestamp"))


def _start(p: Column) -> Column:
    return F.coalesce(p[FROM], F.lit("0001-01-01 00:00:00").cast("timestamp"))


def p_contains_ts(p: Column, ts) -> Column:
    """period CONTAINS timestamp (temporal.clj `contains?` point case)."""
    t = _ts(ts)
    return (_start(p) <= t) & (t < _end(p))


def p_contains(p1: Column, p2: Column) -> Column:
    return (_start(p1) <= _start(p2)) & (_end(p2) <= _end(p1))


def p_strictly_contains(p1: Column, p2: Column) -> Column:
    return (_start(p1) < _start(p2)) & (_end(p2) < _end(p1))


def p_overlaps(p1: Column, p2: Column) -> Column:
    return (_start(p1) < _end(p2)) & (_start(p2) < _end(p1))


def p_strictly_overlaps(p1: Column, p2: Column) -> Column:
    return (_start(p2) < _start(p1)) & (_end(p1) < _end(p2))


def p_equals(p1: Column, p2: Column) -> Column:
    return (_start(p1) == _start(p2)) & (_end(p1) == _end(p2))


def p_precedes(p1: Column, p2: Column) -> Column:
    return _end(p1) <= _start(p2)


def p_strictly_precedes(p1: Column, p2: Column) -> Column:
    return _end(p1) < _start(p2)


def p_immediately_precedes(p1: Column, p2: Column) -> Column:
    return _end(p1) == _start(p2)


def p_succeeds(p1: Column, p2: Column) -> Column:
    return _start(p1) >= _end(p2)


def p_strictly_succeeds(p1: Column, p2: Column) -> Column:
    return _start(p1) > _end(p2)


def p_immediately_succeeds(p1: Column, p2: Column) -> Column:
    return _start(p1) == _end(p2)


def p_leads(p1: Column, p2: Column) -> Column:
    return (_start(p1) < _start(p2)) & (_end(p1) <= _end(p2)) & (_start(p2) < _end(p1))


def p_strictly_leads(p1: Column, p2: Column) -> Column:
    return (_start(p1) < _start(p2)) & (_end(p1) < _end(p2)) & (_start(p2) < _end(p1))


def p_immediately_leads(p1: Column, p2: Column) -> Column:
    return (_start(p1) < _start(p2)) & (_end(p1) == _end(p2))


def p_lags(p1: Column, p2: Column) -> Column:
    return (_start(p1) >= _start(p2)) & (_end(p1) >= _end(p2)) & (_start(p1) < _end(p2))


def p_strictly_lags(p1: Column, p2: Column) -> Column:
    return (_start(p1) > _start(p2)) & (_end(p1) > _end(p2)) & (_start(p1) < _end(p2))


def p_immediately_lags(p1: Column, p2: Column) -> Column:
    return (_start(p1) == _start(p2)) & (_end(p1) > _end(p2))
