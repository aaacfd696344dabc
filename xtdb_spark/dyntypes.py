"""Dynamic / union-typed columns: the legs-struct encoding.

XTDB columns are dynamically typed — one column may hold i64 in some
rows and utf8 in others, represented as an Arrow dense union of
typed "legs" (reference core/src/main/clojure/xtdb/types.clj:96-99,
234-239; merge via LeastUpperBound types.clj:142-146). Spark schemas
are static, so per SURVEY §1.3 option (b) we encode a mixed-type
column as a struct of nullable legs:

    {_leg: 'i64'|'f64'|'str'|'bool'|'ts', i64:…, f64:…, str:…, bool:…, ts:…}

with exactly one leg non-null per row. Homogeneous columns stay
native (no overhead for the 99% case); `encode_rows` only promotes a
column to a legs-struct when its observed python types actually
conflict (numeric int/float conflicts resolve by widening to double
instead — the reference's LUB behavior).

Accessors below are plain Column expressions, so filtering/grouping
on dynamic columns stays in whole-stage codegen.
"""

from __future__ import annotations

import datetime
from typing import Any

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

LEGS = ("i64", "f64", "str", "bool", "ts")

_LEG_OF_TYPE = {
    int: "i64", float: "f64", str: "str", bool: "bool",
    datetime.datetime: "ts",
}

LEG_SCHEMA = ("struct<_leg:string, i64:bigint, f64:double, str:string, "
              "bool:boolean, ts:timestamp>")


def _leg_of(v: Any) -> str | None:
    if v is None:
        return None
    # bool before int (bool is an int subclass)
    if isinstance(v, bool):
        return "bool"
    for t, leg in _LEG_OF_TYPE.items():
        if isinstance(v, t):
            return leg
    raise TypeError(f"unsupported dynamic value type: {type(v)}")


def encode_rows(spark: SparkSession, rows: list[dict]) -> DataFrame:
    """Build a DataFrame from dicts with possibly mixed-type columns.
    Homogeneous columns stay native; int/float mixes widen to double
    (LUB); genuinely mixed columns become legs-structs."""
    cols: dict[str, set[str]] = {}
    for r in rows:
        for k, v in r.items():
            leg = _leg_of(v)
            if leg:
                cols.setdefault(k, set()).add(leg)

    def col_kind(legs: set[str]) -> str:
        if len(legs) <= 1:
            return next(iter(legs)) if legs else "str"
        if legs <= {"i64", "f64"}:
            return "f64"  # numeric LUB widening
        return "union"

    kinds = {k: col_kind(v) for k, v in cols.items()}
    out_rows = []
    for r in rows:
        nr = {}
        for k in cols:
            v = r.get(k)
            kind = kinds[k]
            if kind == "union":
                leg = _leg_of(v)
                nr[k] = {"_leg": leg,
                         **{lg: (v if lg == leg else None) for lg in LEGS}}
            elif kind == "f64":
                nr[k] = float(v) if v is not None else None
            else:
                nr[k] = v
        out_rows.append(nr)

    native = {"i64": "bigint", "f64": "double", "str": "string",
              "bool": "boolean", "ts": "timestamp"}
    fields = ", ".join(
        f"`{k}` {LEG_SCHEMA if kinds[k] == 'union' else native[kinds[k]]}"
        for k in cols)
    return spark.createDataFrame(out_rows, schema=fields)


# ---- accessors over legs-struct columns -------------------------------------

def leg(col: Column) -> Column:
    """The active type tag (reference: union leg name)."""
    return col["_leg"]


def get_leg(col: Column, leg_name: str) -> Column:
    """Typed access: value when the row's leg matches, else NULL —
    XTDB's behavior for type-mismatched access."""
    return F.when(col["_leg"] == leg_name, col[leg_name])


def as_string(col: Column) -> Column:
    """Display/LUB-to-string coercion across all legs."""
    return F.coalesce(*[col[lg].cast("string") for lg in LEGS])


def dyn_equals(col: Column, value) -> Column:
    """Equality against a literal: matches only rows whose leg matches
    the literal's type AND value (3VL on absent)."""
    lg = _leg_of(value)
    return (col["_leg"] == lg) & (col[lg] == F.lit(value))


def dyn_compare_key(col: Column) -> Column:
    """Total-order sort key across mixed types: order by leg name
    first (deterministic cross-type order), then value within leg —
    analogous to the reference's cross-type comparators."""
    return F.struct(col["_leg"].alias("t"), as_string(col).alias("v"))
