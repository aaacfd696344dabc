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
            at = spec[1]
            if isinstance(at, str) and len(at) == 4 and at.isdigit():
                at += "-01-01"   # #inst "2018" — year-only instant
            kw[arg_at] = at
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
        bm = _bind_map(bind) or {}
        # literal binds ({"col": {"lit": v}}) are equality
        # CONSTRAINTS on the scan (reference `{:xt/id "ivan"}`), not
        # renames; they don't contribute an output var
        lits = {c: v["lit"] for c, v in bm.items()
                if isinstance(v, dict)}
        renames = {c: v for c, v in bm.items() if not isinstance(v, dict)}
        base = X.from_(table, bind=renames or None,
                       **_temporal_kwargs(opts))
        if bind is None and not lits:
            return base
        out_cols = list(renames.values())

        def step(xt, _df, _base=base, _lits=lits, _cols=out_cols):
            df = _base(xt, None)
            for c, v in _lits.items():
                df = df.filter(F.col(c) == F.lit(v))
            return df.select(*_cols) if _cols else df

        return step
    if op == "rel":
        return X.rel(args[0])
    if op == "unify":
        srcs = [a for a in args if a and a[0] in ("from", "rel", "unify")]
        tails = [a for a in args if not (a and a[0] in ("from", "rel",
                                                        "unify"))]
        base = X.unify(*[_parse_source(a) for a in srcs])
        if not tails:
            return base
        # logic clauses (where / with / join / left-join / unnest)
        # apply over the unified sources, in clause order
        steps = [_parse_tail(t) for t in tails]

        def step(xt, df, _b=base, _s=steps):
            out = _b(xt, df)
            for s in _s:
                out = s(xt, out)
            return out

        return step
    raise ValueError(f"unknown source op {op!r}")


def _is_subq(e: Any, tags=("exists", "pull", "pull*")) -> bool:
    return isinstance(e, list) and bool(e) and e[0] in tags


def _exists_step(form: list, negate: bool):
    """["exists", <subquery>, [corr_vars]] inside a where — the
    reference's subquery expression (xtql.clj Exists over an fn
    closure): a (anti-)semi join on the correlation vars. The
    subquery plans as its own pipeline; correlation happens through
    the shared variable NAMES, exactly the reference's unify
    semantics."""
    sub_steps = parse(form[1])
    params = list(form[2])

    def step(xt, df):
        sub = X.q(xt, *sub_steps).select(*params).distinct()
        how = "left_anti" if negate else "left_semi"
        return df.join(sub, on=params, how=how)

    return step


def _pull_step(name: str, form: list):
    """["pull"|"pull*", <subquery>, [corr_vars]] in a with/return —
    the reference's pull expression (xtql.clj Pull/PullMany):
    correlated record (pull) / record array (pull*) per outer row.
    Executed set-oriented, not per-row: trailing order-by/limit
    tails apply PER correlation key (row_number window — the
    reference's apply gives the same per-key semantics), rows
    collect into ordered struct arrays, and one left join attaches
    them — no driver loop, no per-row subquery."""
    many = form[0] == "pull*"
    sub_form = form[1]
    params = list(form[2])
    if isinstance(sub_form, list) and sub_form and \
            sub_form[0] == "pipeline":
        src, *tails = sub_form[1:]
    else:
        src, tails = sub_form, []
    order_spec: list = []
    limit_n = None
    while tails:
        t = tails[-1]
        if t[0] == "limit" and limit_n is None:
            limit_n = int(t[1])
            tails = tails[:-1]
            continue
        if t[0] == "order-by" and not order_spec:
            order_spec = t[1:]
            tails = tails[:-1]
            continue
        break
    base = parse(["pipeline", src, *tails] if tails else src)

    def step(xt, df):
        from pyspark.sql.window import Window

        sub = X.q(xt, *base)
        others = [c for c in sub.columns if c not in params]
        oc = []
        for s in order_spec:
            if isinstance(s, str):
                oc.append(F.col(s).asc())
            else:
                c = F.col(s[0])
                oc.append(c.desc() if s[1] == "desc" else c.asc())
        if not oc:
            oc = [F.lit(1)]
        w = Window.partitionBy(*params).orderBy(*oc)
        sub = sub.withColumn("__rn", F.row_number().over(w))
        if limit_n is not None:
            sub = sub.filter(F.col("__rn") <= limit_n)
        payload = F.struct(*[F.col(c) for c in others])
        arr = F.transform(
            F.array_sort(F.collect_list(
                F.struct(F.col("__rn").alias("o"), payload.alias("v")))),
            lambda x: x["v"])
        agg = sub.groupBy(*params).agg(arr.alias(name))
        out = df.join(agg, on=params, how="left")
        if not many:
            out = out.withColumn(name, F.element_at(F.col(name), 1))
        return out

    return step


def _parse_tail(form: list):
    op, *args = form
    if op == "where":
        preds, steps = [], []
        for a in args:
            negate, b = False, a
            if isinstance(b, list) and len(b) == 2 and b[0] == "not" \
                    and _is_subq(b[1], ("exists",)):
                negate, b = True, b[1]
            if _is_subq(b, ("exists",)):
                steps.append(_exists_step(b, negate))
            else:
                preds.append(build_expr(a))

        def step(xt, df, _p=preds, _s=steps):
            if _p:
                df = X.where(*_p)(xt, df)
            for s in _s:
                df = s(xt, df)
            return df

        return step
    if op == "with":
        cols, steps = {}, []
        for spec in args:
            for name, e in spec.items():
                if _is_subq(e, ("pull", "pull*")):
                    steps.append(_pull_step(name, e))
                else:
                    cols[name] = build_expr(e)

        def step(xt, df, _c=cols, _s=steps):
            if _c:
                df = X.with_(**_c)(xt, df)
            for s in _s:
                df = s(xt, df)
            return df

        return step
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
        # ["join", <source>, {"on": [cols], "bind": [vars]}] — on
        # omitted = unify on shared logic vars (reference
        # Join/LeftJoin records); "bind" narrows the joined query's
        # contributed vars (its out-bind spec)
        src = _parse_source(args[0])
        opts = args[1] if len(args) > 1 else {}
        bind = opts.get("bind")
        if bind:
            inner = src

            def src(xt, df, _i=inner, _b=bind):
                return _i(xt, None).select(*_b)
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
