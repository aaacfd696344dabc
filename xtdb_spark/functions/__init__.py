"""Scalar-function surface of the engine.

The reference compiles each call site to JVM bytecode per
type-signature (reference core/src/main/clojure/xtdb/expression.clj:2440-2494).
On Spark we instead *compose Column expressions* so everything stays
inside Catalyst/whole-stage-codegen — Python never touches row data.
"""

from xtdb_spark.functions.periods import (
    period,
    p_contains,
    p_contains_ts,
    p_equals,
    p_lags,
    p_leads,
    p_overlaps,
    p_precedes,
    p_strictly_precedes,
    p_strictly_succeeds,
    p_succeeds,
    p_immediately_precedes,
    p_immediately_succeeds,
    p_lower,
    p_upper,
    p_lower_inf,
    p_upper_inf,
)
from xtdb_spark.functions.temporal import generate_series_ts, range_bins

__all__ = [
    "period", "p_contains", "p_contains_ts", "p_equals", "p_lags", "p_leads",
    "p_overlaps", "p_precedes", "p_strictly_precedes", "p_strictly_succeeds",
    "p_succeeds", "p_immediately_precedes", "p_immediately_succeeds",
    "p_lower", "p_upper", "p_lower_inf", "p_upper_inf",
    "generate_series_ts", "range_bins",
]
