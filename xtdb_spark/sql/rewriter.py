"""SQL:2011-temporal dialect layer.

The reference parses a full SQL:2011 temporal dialect with ANTLR
(reference core/src/main/antlr/xtdb/antlr/Sql.g4:540-568 — FOR
VALID_TIME/SYSTEM_TIME AS OF | BETWEEN | FROM..TO | ALL) and plans
its own relational algebra. Spark SQL already covers the relational
98% — so our dialect layer is a *pre-processor*, exactly as SURVEY §4
recommends: strip the temporal clauses, resolve each referenced table
to a DataFrame with those bounds via the bitemporal scan, register it
as a temp view, and hand the rewritten text to `spark.sql`.

Grammar subset handled (per table reference in FROM/JOIN):
    <table> [FOR VALID_TIME AS OF <ts> | FOR VALID_TIME BETWEEN <ts> AND <ts>
             | FOR VALID_TIME FROM <ts> TO <ts> | FOR ALL VALID_TIME]
            [FOR SYSTEM_TIME AS OF <ts> | FOR ALL SYSTEM_TIME]
Everything else (joins, aggregates, windows, CTEs, set ops…) passes
through to Spark SQL untouched — Catalyst plans it.

Positional parameters (`?`) use Spark's native parameterized SQL.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

_TS = r"(?:TIMESTAMP\s+)?'(?P<%s>[^']+)'"

_VT_PATTERNS = [
    ("vt_asof", rf"FOR\s+VALID_TIME\s+AS\s+OF\s+{_TS % 'vt_asof'}"),
    ("vt_between", rf"FOR\s+VALID_TIME\s+BETWEEN\s+{_TS % 'vt_from'}\s+AND\s+{_TS % 'vt_to'}"),
    ("vt_fromto", rf"FOR\s+VALID_TIME\s+FROM\s+{_TS % 'vt_from2'}\s+TO\s+{_TS % 'vt_to2'}"),
    ("vt_all", r"FOR\s+ALL\s+VALID_TIME"),
]
_ST_PATTERNS = [
    ("st_asof", rf"FOR\s+SYSTEM_TIME\s+AS\s+OF\s+{_TS % 'st_asof'}"),
    ("st_between", rf"FOR\s+SYSTEM_TIME\s+BETWEEN\s+{_TS % 'st_from'}\s+AND\s+{_TS % 'st_to'}"),
    ("st_fromto", rf"FOR\s+SYSTEM_TIME\s+FROM\s+{_TS % 'st_from2'}\s+TO\s+{_TS % 'st_to2'}"),
    ("st_all", r"FOR\s+ALL\s+SYSTEM_TIME"),
]

_CLAUSE_RE = re.compile(
    "|".join(f"(?P<{name}_g>{pat})" for name, pat in _VT_PATTERNS + _ST_PATTERNS),
    re.IGNORECASE,
)

_QTS = r"(?:TIMESTAMP\s+)?'[^']*'"
_CLAUSE_PART = (
    r"FOR\s+(?:"
    r"ALL\s+(?:VALID_TIME|SYSTEM_TIME)"
    rf"|VALID_TIME\s+AS\s+OF\s+{_QTS}"
    rf"|VALID_TIME\s+BETWEEN\s+{_QTS}\s+AND\s+{_QTS}"
    rf"|VALID_TIME\s+FROM\s+{_QTS}\s+TO\s+{_QTS}"
    rf"|SYSTEM_TIME\s+AS\s+OF\s+{_QTS}"
    rf"|SYSTEM_TIME\s+BETWEEN\s+{_QTS}\s+AND\s+{_QTS}"
    rf"|SYSTEM_TIME\s+FROM\s+{_QTS}\s+TO\s+{_QTS}"
    r")"
)

_TABLE_REF_RE = re.compile(
    rf"(?P<kw>\bFROM\b|\bJOIN\b)\s+(?P<table>[A-Za-z_][\w.]*)"
    rf"(?P<clauses>(?:\s+{_CLAUSE_PART})*)",
    re.IGNORECASE,
)


@dataclass
class TemporalBounds:
    """Per-table temporal spec (reference operator/scan.clj:62-114)."""

    valid_asof: str | None = None
    valid_range: tuple[str, str] | None = None
    all_valid: bool = False
    system_asof: str | None = None
    system_range: tuple[str, str] | None = None
    all_system: bool = False

    def view_suffix(self) -> str:
        parts = []
        for v in (self.valid_asof, self.valid_range, self.system_asof,
                  self.system_range, self.all_valid, self.all_system):
            parts.append(re.sub(r"\W", "_", str(v)))
        return "__".join(parts)


def parse_clauses(clause_text: str) -> TemporalBounds:
    b = TemporalBounds()
    for m in _CLAUSE_RE.finditer(clause_text or ""):
        gd = m.groupdict()
        if gd.get("vt_asof"):
            b.valid_asof = gd["vt_asof"]
        elif gd.get("vt_from") and gd.get("vt_to"):
            b.valid_range = (gd["vt_from"], gd["vt_to"])
        elif gd.get("vt_from2") and gd.get("vt_to2"):
            b.valid_range = (gd["vt_from2"], gd["vt_to2"])
        elif gd.get("vt_all_g"):
            b.all_valid = True
        elif gd.get("st_asof"):
            b.system_asof = gd["st_asof"]
        elif gd.get("st_from") and gd.get("st_to"):
            b.system_range = (gd["st_from"], gd["st_to"])
        elif gd.get("st_from2") and gd.get("st_to2"):
            b.system_range = (gd["st_from2"], gd["st_to2"])
        elif gd.get("st_all_g"):
            b.all_system = True
    return b


def scan_with_bounds(store, table: str, b: TemporalBounds):
    from xtdb_spark import bitemporal

    if b.valid_range is not None:
        ev = store.events(table)
        return bitemporal.resolve_valid_range(
            ev, b.valid_range[0], b.valid_range[1], b.system_asof)
    if b.system_range is not None:
        ev = store.events(table)
        return bitemporal.resolve_system_range(
            ev, b.system_range[0], b.system_range[1], b.valid_asof)
    return store.scan(
        table,
        valid_time=b.valid_asof,
        system_time=b.system_asof,
        all_valid_time=b.all_valid,
        all_system_time=b.all_system,
    )


def rewrite(xt, query: str) -> str:
    """Replace each `<table> [temporal clauses]` reference with a temp
    view resolved to those bounds; return the rewritten SQL text."""

    def repl(m: re.Match) -> str:
        table = m.group("table")
        # only rewrite tables that exist in the store; anything else
        # (temp views, CTE names, catalog tables) passes through
        try:
            path_exists = _table_exists(xt.store, table)
        except ValueError:
            path_exists = False
        if not path_exists:
            return m.group(0)
        bounds = parse_clauses(m.group("clauses"))
        view = f"xt__{table.replace('.', '_')}__{bounds.view_suffix()}"
        view = re.sub(r"\W", "_", view)
        df = scan_with_bounds(xt.store, table, bounds)
        df.createOrReplaceTempView(view)
        # alias back to the bare table name so qualified column
        # references (`users.name`) keep resolving
        alias = table.split(".")[-1]
        return f"{m.group('kw')} {view} AS {alias}"

    return _TABLE_REF_RE.sub(repl, query)


def _table_exists(store, table: str) -> bool:
    import os

    return os.path.isdir(store._path(table))


_EXPLAIN_RE = re.compile(r"^\s*EXPLAIN(\s+ANALYZE)?\s+", re.IGNORECASE)


def rewrite_and_run(xt, query: str, args: list | None = None):
    from xtdb_spark.sql import dml

    m = _EXPLAIN_RE.match(query)
    if m:
        # EXPLAIN [ANALYZE] <query> (reference Sql.g4 / query.clj:210-277):
        # one-column relation holding the (executed, for ANALYZE) plan
        from xtdb_spark.plans.explain import explain_analyze, formatted_plan

        inner = rewrite_and_run(xt, query[m.end():], args)
        text = explain_analyze(inner) if m.group(1) else formatted_plan(inner)
        return xt.spark.createDataFrame([(text,)], "plan string")
    if dml.is_dml(query):
        return dml.execute_dml(xt, query)
    sql = rewrite(xt, query)
    if args:
        return xt.spark.sql(sql, args=args)
    return xt.spark.sql(sql)
