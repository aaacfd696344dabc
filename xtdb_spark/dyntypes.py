"""Dynamic / union-typed columns: the legs-struct encoding.

XTDB columns are dynamically typed — one column may hold i64 in some
rows and utf8 in others, represented as an Arrow dense union of
typed "legs" (reference core/src/main/clojure/xtdb/types.clj:96-99,
234-239; merge via LeastUpperBound types.clj:142-146). Spark schemas
are static, so per SURVEY §1.3 option (b) we encode a mixed-type
column as a struct of nullable legs with exactly one leg non-null per
row.

Leg inventory (reference types.clj:243-294):

- scalar legs: ``i64 f64 dec str bool ts date bin`` — the primitive /
  decimal / date-time / varbinary families
- extension legs (reference types.clj:284-294 ``:keyword :uri
  :uuid``): ``uuid uri kw`` — stored as utf8 with the tag preserved
  in ``_leg`` (exactly the reference's extension-over-utf8 encoding);
  construct values with :class:`Keyword` / :class:`Uri` /
  ``uuid.UUID``
- nested legs (reference ``[:list t]`` / ``[:struct …]``): ``arr``
  (array of scalar legs-structs — heterogeneous elements allowed) and
  ``obj`` (map<string, scalar legs-struct> — dynamic keys). One
  nesting level: Spark types are non-recursive, so list-of-list
  inside a DYNAMIC column raises (statically-typed nested columns of
  any depth work natively and don't come through here).

Homogeneous columns stay native (no overhead for the 99% case);
`encode_rows` only promotes a column to a legs-struct when its
observed python types actually conflict (numeric int/float conflicts
resolve by widening to double instead — the reference's LUB
behavior). Extension-tagged and nested-dynamic columns always encode
as legs-structs so the tag survives.

Accessors below are plain Column expressions, so filtering/grouping
on dynamic columns stays in whole-stage codegen.
"""

from __future__ import annotations

import datetime
import decimal
import uuid as _uuid
from typing import Any

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


class Keyword(str):
    """A keyword-tagged string (reference extension type :keyword)."""


class Uri(str):
    """A uri-tagged string (reference extension type :uri)."""


SCALAR_LEGS = ("i64", "f64", "dec", "str", "bool", "ts", "date", "bin",
               "uuid", "uri", "kw")
LEGS = SCALAR_LEGS + ("arr", "obj")

_SCALAR_FIELDS = ("_leg:string, i64:bigint, f64:double, dec:decimal(38,18), "
                  "str:string, bool:boolean, ts:timestamp, date:date, "
                  "bin:binary, uuid:string, uri:string, kw:string")
SCALAR_LEG_SCHEMA = f"struct<{_SCALAR_FIELDS}>"
LEG_SCHEMA = (f"struct<{_SCALAR_FIELDS}, arr:array<{SCALAR_LEG_SCHEMA}>, "
              f"obj:map<string,{SCALAR_LEG_SCHEMA}>>")

_NATIVE = {"i64": "bigint", "f64": "double", "dec": "decimal(38,18)",
           "str": "string", "bool": "boolean", "ts": "timestamp",
           "date": "date", "bin": "binary"}


def _leg_of(v: Any) -> str | None:
    if v is None:
        return None
    # bool before int (bool is an int subclass); Keyword/Uri before str
    if isinstance(v, bool):
        return "bool"
    if isinstance(v, Keyword):
        return "kw"
    if isinstance(v, Uri):
        return "uri"
    if isinstance(v, _uuid.UUID):
        return "uuid"
    if isinstance(v, int):
        return "i64"
    if isinstance(v, float):
        return "f64"
    if isinstance(v, decimal.Decimal):
        return "dec"
    if isinstance(v, str):
        return "str"
    if isinstance(v, datetime.datetime):
        return "ts"
    if isinstance(v, datetime.date):
        return "date"
    if isinstance(v, (bytes, bytearray)):
        return "bin"
    if isinstance(v, (list, tuple)):
        return "arr"
    if isinstance(v, dict):
        return "obj"
    raise TypeError(f"unsupported dynamic value type: {type(v)}")


def _canon(leg: str, v: Any):
    """Storable representation per leg (uuid/uri/kw → utf8)."""
    if leg in ("uuid", "uri", "kw"):
        return str(v)
    if leg == "bin":
        return bytes(v)
    return v


def _scalar_record(v: Any) -> dict | None:
    if v is None:
        return None
    leg = _leg_of(v)
    if leg in ("arr", "obj"):
        raise TypeError(
            "dynamic columns support one nesting level: a list/struct "
            "leg's elements must be scalars (reference nested types of "
            "any depth need a static column type)")
    return {"_leg": leg,
            **{lg: (_canon(leg, v) if lg == leg else None)
               for lg in SCALAR_LEGS}}


def _union_record(v: Any) -> dict | None:
    if v is None:
        return None
    leg = _leg_of(v)
    rec = {"_leg": leg, **{lg: None for lg in SCALAR_LEGS},
           "arr": None, "obj": None}
    if leg == "arr":
        rec["arr"] = [_scalar_record(e) for e in v]
    elif leg == "obj":
        rec["obj"] = {str(k): _scalar_record(val) for k, val in v.items()}
    else:
        rec[leg] = _canon(leg, v)
    return rec


def encode_rows(spark: SparkSession, rows: list[dict]) -> DataFrame:
    """Build a DataFrame from dicts with possibly mixed-type columns.
    Homogeneous primitive columns stay native; int/float mixes widen
    to double (LUB); genuinely mixed, extension-tagged, or
    nested-dynamic columns become legs-structs."""
    cols: dict[str, set[str]] = {}
    for r in rows:
        for k, v in r.items():
            leg = _leg_of(v)
            cols.setdefault(k, set())
            if leg:
                cols[k].add(leg)

    def col_kind(legs: set[str]) -> str:
        if legs & {"uuid", "uri", "kw", "arr", "obj"}:
            return "union"  # keep the tag / dynamic nesting
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
                nr[k] = _union_record(v)
            elif kind == "f64":
                nr[k] = float(v) if v is not None else None
            else:
                nr[k] = v
        out_rows.append(nr)

    fields = ", ".join(
        f"`{k}` {LEG_SCHEMA if kinds[k] == 'union' else _NATIVE[kinds[k]]}"
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


def as_string(col: Column, legs: tuple = SCALAR_LEGS,
              nested: bool = False) -> Column:
    """Display/LUB-to-string coercion across legs. Pass nested=True
    when the column carries the full (arr/obj-bearing) LEG_SCHEMA."""
    parts = [col[lg].cast("string") for lg in legs]
    if nested:
        parts += [F.when(col["arr"].isNotNull(), F.to_json(col["arr"])),
                  F.when(col["obj"].isNotNull(), F.to_json(col["obj"]))]
    return F.coalesce(*parts)


def dyn_equals(col: Column, value) -> Column:
    """Equality against a literal: matches only rows whose leg matches
    the literal's type AND value (3VL on absent)."""
    lg = _leg_of(value)
    return (col["_leg"] == lg) & (col[lg] == F.lit(_canon(lg, value)))


def dyn_compare_key(col: Column, legs: tuple = SCALAR_LEGS,
                    nested: bool = False) -> Column:
    """Total-order sort key across mixed types: order by leg name
    first (deterministic cross-type order), then value within leg —
    analogous to the reference's cross-type comparators."""
    return F.struct(col["_leg"].alias("t"),
                    as_string(col, legs, nested).alias("v"))


# ---- nested 3VL equality ----------------------------------------------------
#
# Spark's native `=` over struct/array treats a NULL element pair as
# definitively unequal (FALSE); the SQL standard and the reference's
# codegen'd nested equality (reference expression.clj:788-835,
# 1962-2010 struct, 2256-2301 list) use AND-fold row-equality
# semantics instead: every element pair compares with 3VL `=`, and the
# verdicts fold with min over {FALSE=0 < NULL=1 < TRUE=2} — any FALSE
# pair forces FALSE regardless of NULL pairs elsewhere, else any NULL
# pair gives NULL, else TRUE. A list length mismatch is FALSE before
# any element is examined. These helpers emulate that as pure column
# CASE expressions (JVM-side, codegen-friendly).

def eq3vl_pairs(pairs: list) -> Column:
    """AND-fold element-wise 3VL comparisons (reference
    expression.clj:1962-2010 min-fold): FALSE if any pair is FALSE,
    else NULL if any pair is NULL, else TRUE. `pairs` are Columns
    already carrying 3VL semantics (e.g. `l == r` on scalars)."""
    any_false = F.lit(False)
    any_null = F.lit(False)
    for p in pairs:
        any_false = any_false | ~F.coalesce(p, F.lit(True))
        any_null = any_null | p.isNull()
    return (F.when(any_false, F.lit(False))
             .when(any_null, F.lit(None).cast("boolean"))
             .otherwise(F.lit(True)))


def struct_eq(left: Column, right: Column, fields: list,
              right_fields: list | None = None) -> Column:
    """Null-aware struct equality with AND-fold semantics. NULL struct
    on either side → NULL. When the two sides' key sets differ the
    reference returns FALSE (expression.clj:1967-1968) — pass
    `right_fields` to express that; with the default (shared schema,
    the Spark-typed common case) both sides use `fields`."""
    if right_fields is not None and sorted(right_fields) != sorted(fields):
        return (F.when(left.isNull() | right.isNull(),
                       F.lit(None).cast("boolean"))
                 .otherwise(F.lit(False)))
    body = eq3vl_pairs([left[f] == right[f] for f in fields])
    return (F.when(left.isNull() | right.isNull(),
                   F.lit(None).cast("boolean"))
             .otherwise(body))


def array_eq(left: Column, right: Column, elem_eq=None) -> Column:
    """Null-aware array equality (reference list :==,
    expression.clj:2256-2301): NULL array → NULL; length mismatch →
    FALSE before any element comparison; else element verdicts
    {FALSE=0, NULL=1, TRUE=2} fold with min, so FALSE dominates NULL.
    `elem_eq(x, y) -> Column` overrides the element comparison (e.g.
    `legs_elem_eq` for arrays of legs-structs)."""
    cmp = elem_eq if elem_eq is not None else (lambda x, y: x == y)
    zipped = F.zip_with(
        left, right,
        lambda x, y: (F.when(x.isNull() | y.isNull(), F.lit(1))
                       .when(cmp(x, y), F.lit(2))
                       .otherwise(F.lit(0))))
    verdict = F.aggregate(zipped, F.lit(2),
                          lambda acc, v: F.least(acc, v))
    return (F.when(left.isNull() | right.isNull(),
                   F.lit(None).cast("boolean"))
             .when(F.size(left) != F.size(right), F.lit(False))
             .when(verdict == 0, F.lit(False))
             .when(verdict == 1, F.lit(None).cast("boolean"))
             .otherwise(F.lit(True)))


def legs_elem_eq(x: Column, y: Column) -> Column:
    """Leg-aware equality between two scalar legs-structs: numeric
    legs (i64/f64/dec) compare by value across legs — the reference's
    `:== :num :num` widens int/float/decimal so 1 = 1.0 is TRUE
    (expression.clj numeric comparison) — while non-numeric legs
    require the same leg and equal stored value."""
    num = ("i64", "f64", "dec")
    xn = F.coalesce(*[x[lg].cast("double") for lg in num])
    yn = F.coalesce(*[y[lg].cast("double") for lg in num])
    x_is_num, y_is_num = x["_leg"].isin(*num), y["_leg"].isin(*num)
    same_leg_eq = F.lit(None).cast("boolean")
    for lg in SCALAR_LEGS:
        if lg in num:
            continue
        same_leg_eq = (F.when(x["_leg"] == F.lit(lg), x[lg] == y[lg])
                        .otherwise(same_leg_eq))
    return (F.when(x_is_num & y_is_num, xn == yn)
             .when(x_is_num != y_is_num, F.lit(False))
             .when(x["_leg"] != y["_leg"], F.lit(False))
             .otherwise(same_leg_eq))
