"""XTQL serialized-form parser: JSON pipelines → DataFrames.

The reference parses XTQL queries from their serialized (edn/JSON)
form into Pipeline/From/Where/With/Return/… records (reference
core/src/main/clojure/xtdb/xtql.clj:293-593 — From carries table +
temporal opts + bindings, ops are head-position lists). This module
accepts the same vocabulary as JSON arrays mirroring those edn lists
(op name in head position) and compiles them onto the Python DSL in
`xtdb_spark.xtql` — which already lowers to DataFrames.

Query form::

    ["pipeline",
      ["from", "orders", ["o_custkey", {"o_totalprice": "price"}]],
      ["where", [">", "price", 100.0]],
      ["aggregate", ["o_custkey"], {"n": ["count"],
                                    "total": ["sum", "price"]}],
      ["order-by", ["n", "desc"], "o_custkey"],
      ["limit", 5]]

- **bindings**: a plain string binds the column under its own name
  (a logic var); ``{"col": "var"}`` renames (reference out-spec /
  var-spec parsing, xtql.clj:155-200).
- **from opts**: ``["from", "t", bind, {"for-valid-time": ["at", ts],
  "for-system-time": ["at", ts] | "all-time"}]``
  (reference TemporalFilter parsing).
- **expressions** are s-expressions: strings = column/logic vars,
  numbers/bools = literals, ``{"lit": v}`` = literal escape (so a
  string literal isn't read as a var), ``[op, args…]`` = calls.
- **unify**: ``["unify", from…, from…]`` natural-joins on shared
  logic vars.

`parse(q)` returns the composed pipeline; `run(xt, q)` executes it.
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F

from xtdb_spark import xtql as X

# ------------------------------------------------------------- exprs

_BINOPS = {
    "=": lambda a, b: a == b, "<>": lambda a, b: a != b,
    "!=": lambda a, b: a != b,
    ">": lambda a, b: a > b, ">=": lambda a, b: a >= b,
    "<": lambda a, b: a < b, "<=": lambda a, b: a <= b,
    "+": lambda a, b: a + b, "-": lambda a, b: a - b,
    "*": lambda a, b: a * b, "/": lambda a, b: a / b,
}

_FNS = {
    "lower": F.lower, "upper": F.upper, "trim": F.trim,
    "length": F.length, "abs": F.abs, "round": F.round,
    "coalesce": F.coalesce, "greatest": F.greatest, "least": F.least,
    "concat": F.concat,
}

_AGGS = {
    "count": lambda *a: F.count(a[0] if a else F.lit(1)),
    "count-distinct": lambda c: F.count_distinct(c),
    "sum": F.sum, "avg": F.avg, "min": F.min, "max": F.max,
    "sum-distinct": F.sum_distinct, "array-agg": F.collect_list,
    "bool-and": F.bool_and, "bool-or": F.bool_or,
    "stddev": F.stddev, "variance": F.variance,
}


def build_expr(e: Any) -> Column:
    """S-expression → Column (aggregate calls included: the reference
    distinguishes them at plan time, Catalyst does here)."""
    if isinstance(e, str):
        return F.col(e)
    if isinstance(e, bool) or isinstance(e, (int, float)) or e is None:
        return F.lit(e)
    if isinstance(e, dict):
        if set(e) == {"lit"}:
            return F.lit(e["lit"])
        if set(e) == {"param"}:
            raise ValueError("params must be substituted before parse")
        raise ValueError(f"unknown expression object {e!r}")
    if isinstance(e, list) and e:
        op, *args = e
        if op in _BINOPS:
            out = build_expr(args[0])
            for a in args[1:]:
                out = _BINOPS[op](out, build_expr(a))
            return out
        if op == "and":
            out = build_expr(args[0])
            for a in args[1:]:
                out = out & build_expr(a)
            return out
        if op == "or":
            out = build_expr(args[0])
            for a in args[1:]:
                out = out | build_expr(a)
            return out
        if op == "not":
            return ~build_expr(args[0])
        if op == "like":
            return build_expr(args[0]).like(args[1])
        if op == "in":
            return build_expr(args[0]).isin(
                *[a["lit"] if isinstance(a, dict) else a for a in args[1:]])
        if op == "nil?":
            return build_expr(args[0]).isNull()
        if op == "if":
            return F.when(build_expr(args[0]), build_expr(args[1])) \
                .otherwise(build_expr(args[2]))
        if op in _FNS:
            return _FNS[op](*[build_expr(a) for a in args])
        if op in _AGGS:
            return _AGGS[op](*[build_expr(a) for a in args])
        raise ValueError(f"unknown XTQL function {op!r}")
    raise ValueError(f"cannot parse expression {e!r}")


# ------------------------------------------------------------ binds

def _bind_map(bind: list | None) -> dict[str, str] | None:
    """[a, {col: var}, …] → {col: var} renames; plain strings keep
    their name (reference out-spec: symbol | {keyword sym})."""
    if bind is None:
        return None
    out = {}
    for b in bind:
        if isinstance(b, str):
            out[b] = b
        elif isinstance(b, dict):
            for col, var in b.items():
                out[col] = var
        else:
            raise ValueError(f"malformed binding {b!r}")
    return out


def _bound_cols(bind: list | None) -> list[str] | None:
    if bind is None:
        return None
    return [v for b in bind
            for v in ([b] if isinstance(b, str) else list(b.values()))]


# ------------------------------------------------------------- ops

def _temporal_kwargs(opts: dict | None) -> dict:
    kw = {}
    for key, (arg_at, arg_all) in (
            ("for-valid-time", ("valid_time", "all_valid_time")),
            ("for-system-time", ("system_time", "all_system_time"))):
        spec = (opts or {}).get(key)
        if spec is None:
            continue
        if spec == "all-time" or spec == ["all-time"]:
            kw[arg_all] = True
        elif isinstance(spec, list) and len(spec) == 2 and spec[0] == "at":
            kw[arg_at] = spec[1]
        else:
            raise ValueError(f"malformed temporal spec {spec!r}")
    return kw


def _parse_source(form: list):
    """A source op (from / rel / unify) → DSL Step."""
    op, *args = form
    if op == "from":
        table = args[0]
        bind = args[1] if len(args) > 1 and isinstance(args[1], list) else None
        opts = next((a for a in args[1:] if isinstance(a, dict)), None)
        bm = _bind_map(bind)
        base = X.from_(table, bind=bm, **_temporal_kwargs(opts))
        if bind is None:
            return base

        def step(xt, _df, _base=base, _cols=_bound_cols(bind)):
            return _base(xt, None).select(*_cols)

        return step
    if op == "rel":
        return X.rel(args[0])
    if op == "unify":
        return X.unify(*[_parse_source(a) for a in args])
    raise ValueError(f"unknown source op {op!r}")


def _parse_tail(form: list):
    op, *args = form
    if op == "where":
        return X.where(*[build_expr(a) for a in args])
    if op == "with":
        cols = {name: build_expr(e)
                for spec in args for name, e in spec.items()}
        return X.with_(**cols)
    if op == "without":
        return X.without(*args)
    if op == "return":
        plain = [a for a in args if isinstance(a, str)]
        named = {name: build_expr(e)
                 for a in args if isinstance(a, dict)
                 for name, e in a.items()}
        return X.return_(*plain, **named)
    if op == "aggregate":
        group = args[0] if args and isinstance(args[0], list) else []
        aggs = {name: build_expr(e)
                for a in args if isinstance(a, dict)
                for name, e in a.items()}
        return X.aggregate(*group, **aggs)
    if op == "order-by":
        cols = []
        for a in args:
            if isinstance(a, str):
                cols.append(F.col(a))
            elif isinstance(a, list) and len(a) == 2:
                c = F.col(a[0])
                cols.append(c.desc() if a[1] == "desc" else c.asc())
            else:
                raise ValueError(f"malformed order-by spec {a!r}")
        return X.order_by(*cols)
    if op == "limit":
        return X.limit(int(args[0]))
    if op == "offset":
        return X.offset(int(args[0]))
    if op == "unnest":
        (spec,) = args
        ((alias, col),) = spec.items()
        return X.unnest(col, alias)
    if op == "union-all":
        return X.union_all(_parse_source(args[0]))
    if op in ("join", "left-join"):
        # ["join", <source>, {"on": [cols]}] — on omitted = unify on
        # shared logic vars (reference Join/LeftJoin records)
        src = _parse_source(args[0])
        opts = args[1] if len(args) > 1 else {}
        how = "inner" if op == "join" else "left"
        return X.join(src, on=opts.get("on"), how=how)
    raise ValueError(f"unknown tail op {op!r}")


def parse(query: str | list):
    """Serialized XTQL (JSON text or already-loaded list) → list of
    DSL steps for `xtql.q`."""
    form = json.loads(query) if isinstance(query, str) else query
    if not isinstance(form, list) or not form:
        raise ValueError("XTQL query must be a non-empty array")
    if form[0] == "pipeline":
        source, *tails = form[1:]
    else:
        source, tails = form, []
    return [_parse_source(source)] + [_parse_tail(t) for t in tails]


def run(xt, query: str | list):
    """Parse + execute a serialized XTQL query against a session."""
    return X.q(xt, *parse(query))
