"""DML statements over the SQL surface.

Reference: INSERT/UPDATE/DELETE/ERASE/PATCH/ASSERT are planned as
relational algebra over the target table and executed at tx-index
time (reference Sql.g4:16-45; query.clj:478-495 prepareTxSql;
sql.clj:2925-3051), producing event rows appended to the log.

Spark design: each statement compiles to a SELECT over the table's
*current state* (or an inline VALUES relation), evaluated by Spark
SQL, whose result is appended as events through the TableStore —
the same "DML is a query producing (_iid, doc, valid-range) rows"
model the reference uses. Supported forms:

    INSERT INTO t (c1, c2, ...) VALUES (...), (...)
    INSERT INTO t SELECT ...
    UPDATE t [FOR PORTION OF VALID_TIME FROM 'a' TO 'b']
             SET c = expr [, ...] [WHERE pred]
    DELETE FROM t [FOR PORTION OF VALID_TIME FROM 'a' TO 'b'] [WHERE pred]
    ERASE FROM t [WHERE pred]
    PATCH INTO t [FOR PORTION OF VALID_TIME FROM 'a' TO 'b']
          (c1, ...) VALUES (...)   -- portion form = patch-gaps
    ASSERT <condition SQL over current state>
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from xtdb_spark.sql.rewriter import spark_escape_strings as _esc

_INSERT_VALUES_RE = re.compile(
    r"^\s*INSERT\s+INTO\s+(?P<table>[\w.]+)\s*\((?P<cols>[^)]*)\)\s*"
    r"VALUES\s*(?P<values>.+)$",
    re.IGNORECASE | re.DOTALL,
)
_INSERT_SELECT_RE = re.compile(
    r"^\s*INSERT\s+INTO\s+(?P<table>[\w.]+)\s*(?:\((?P<cols>[^)]*)\)\s*)?"
    r"(?P<select>SELECT\s+.+)$",
    re.IGNORECASE | re.DOTALL,
)
_PORTION_RE = (r"(?:\s+FOR\s+PORTION\s+OF\s+VALID_TIME\s+FROM\s+"
               r"(?:TIMESTAMP\s+)?'(?P<vf>[^']+)'\s+TO\s+"
               r"(?:TIMESTAMP\s+)?'(?P<vt>[^']+)')?")
_UPDATE_RE = re.compile(
    rf"^\s*UPDATE\s+(?P<table>[\w.]+){_PORTION_RE}\s+"
    r"SET\s+(?P<sets>.+?)(?:\s+WHERE\s+(?P<where>.+))?$",
    re.IGNORECASE | re.DOTALL,
)
_DELETE_RE = re.compile(
    rf"^\s*DELETE\s+FROM\s+(?P<table>[\w.]+){_PORTION_RE}"
    r"(?:\s+WHERE\s+(?P<where>.+))?$",
    re.IGNORECASE | re.DOTALL,
)
_ERASE_RE = re.compile(
    r"^\s*ERASE\s+FROM\s+(?P<table>[\w.]+)(?:\s+WHERE\s+(?P<where>.+))?$",
    re.IGNORECASE | re.DOTALL,
)
_ASSERT_RE = re.compile(r"^\s*ASSERT\s+(?P<cond>.+)$", re.IGNORECASE | re.DOTALL)
_PATCH_RE = re.compile(
    rf"^\s*PATCH\s+INTO\s+(?P<table>[\w.]+){_PORTION_RE}\s*"
    r"\((?P<cols>[^)]*)\)\s*VALUES\s*(?P<values>.+)$",
    re.IGNORECASE | re.DOTALL,
)

DML_RE = re.compile(r"^\s*(INSERT|UPDATE|DELETE|ERASE|PATCH|ASSERT)\b",
                    re.IGNORECASE)


class AssertFailed(Exception):
    """Reference: ASSERT aborts the transaction (Sql.g4:35)."""


def is_dml(query: str) -> bool:
    return DML_RE.match(query) is not None


def _split_sets(sets: str) -> list[tuple[str, str]]:
    """Split `a = expr, b = expr` respecting parens/quotes."""
    parts, depth, cur, in_str = [], 0, "", False
    for ch in sets:
        if ch == "'" :
            in_str = not in_str
        elif not in_str:
            if ch in "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            elif ch == "," and depth == 0:
                parts.append(cur)
                cur = ""
                continue
        cur += ch
    parts.append(cur)
    out = []
    for p in parts:
        col, _, expr = p.partition("=")
        out.append((col.strip(), expr.strip()))
    return out


def _current_view(xt, table: str) -> str:
    view = f"xt_dml_{re.sub(r'[^A-Za-z0-9]', '_', table)}"
    xt.store.scan(table).createOrReplaceTempView(view)
    return view


def split_returning(query: str) -> tuple[str, str | None]:
    """Strip a trailing top-level `RETURNING <selectList>` (reference
    Sql.g4:788 DmlReturningStatement). Token-aware: RETURNING inside
    strings/comments/parens is data."""
    from xtdb_spark.sql.rewriter import _tokenize

    toks = _tokenize(query)
    depth, idx = 0, None
    for i, (k, t) in enumerate(toks):
        if k == "punct":
            if t in "([{":
                depth += 1
            elif t in ")]}":
                depth -= 1
        elif k == "word" and depth == 0 and t.upper() == "RETURNING":
            idx = i
    if idx is None:
        return query, None
    body = "".join(t for _, t in toks[:idx])
    sel = "".join(t for _, t in toks[idx + 1:]).strip().rstrip(";").strip()
    if not sel:
        raise ValueError("RETURNING requires a select list")
    return body, sel


def _returning(spark, affected, select_list: str | None, st):
    """Evaluate the RETURNING list over the statement's affected-rows
    relation (the inserted/updated docs, or the pre-delete rows —
    both pinned to the statement-time snapshot, so evaluation order
    vs the append doesn't matter). Without RETURNING, return the tx
    system time as before."""
    if select_list is None:
        return st
    affected.createOrReplaceTempView("xt_dml_returning")
    return spark.sql(_esc(f"SELECT {select_list} FROM xt_dml_returning"))


_PATCH_SELECT_RE = re.compile(
    rf"^\s*PATCH\s+INTO\s+(?P<table>[\w.]+){_PORTION_RE}\s*"
    r"(?P<select>SELECT\s+.+)$",
    re.IGNORECASE | re.DOTALL,
)


def execute_dml(xt, query: str):
    spark = xt.spark
    # XTDB dialect constructs first: `INSERT INTO t RECORDS {…}` /
    # `PATCH INTO t RECORDS {…}` (reference Sql.g4:811,803) arrive
    # here as `… SELECT …` and fall into the SELECT branches below
    from xtdb_spark.sql.constructs import translate

    query = translate(query)
    query, ret = split_returning(query)

    m = _INSERT_VALUES_RE.match(query)
    if m:
        cols = [c.strip() for c in m.group("cols").split(",")]
        rel = spark.sql(_esc(
            f"SELECT * FROM (VALUES {m.group('values')}) AS t({', '.join(cols)})"))
        st = xt.store.put(m.group("table"), rel)
        return _returning(spark, rel, ret, st)

    m = _PATCH_RE.match(query)
    if m:
        # PATCH INTO t [FOR PORTION OF VALID_TIME FROM a TO b]
        #   (c1, c2, ...) VALUES (...), (...)
        # (reference Sql.g4:30 PATCH; portion form runs patch-gaps)
        cols = [c.strip() for c in m.group("cols").split(",")]
        rel = spark.sql(_esc(
            f"SELECT * FROM (VALUES {m.group('values')}) AS t({', '.join(cols)})"))
        st = xt.store.patch(m.group("table"), rel,
                            valid_from=m.group("vf"),
                            valid_to=m.group("vt"))
        if ret is None:
            return st
        # RETURNING after PATCH sees the post-merge current state of
        # the patched ids (the doc the reader now observes)
        merged = xt.store.scan(m.group("table"))             .join(rel.select("_id"), "_id", "semi")
        return _returning(spark, merged, ret, st)

    m = _INSERT_SELECT_RE.match(query)
    if m:
        from xtdb_spark.sql.rewriter import rewrite

        rel = spark.sql(rewrite(xt, m.group("select")))
        if m.group("cols"):
            rel = rel.toDF(*[c.strip() for c in m.group("cols").split(",")])
        st = xt.store.put(m.group("table"), rel)
        return _returning(spark, rel, ret, st)

    m = _PATCH_SELECT_RE.match(query)
    if m:
        # PATCH INTO t RECORDS {…} arrives here post-translation as
        # PATCH INTO t SELECT … (reference Sql.g4:802-805 PatchRecords)
        from xtdb_spark.sql.rewriter import rewrite

        rel = spark.sql(rewrite(xt, m.group("select")))
        st = xt.store.patch(m.group("table"), rel,
                            valid_from=m.group("vf"),
                            valid_to=m.group("vt"))
        if ret is None:
            return st
        merged = xt.store.scan(m.group("table"))             .join(rel.select("_id"), "_id", "semi")
        return _returning(spark, merged, ret, st)

    m = _UPDATE_RE.match(query)
    if m:
        table, where = m.group("table"), m.group("where")
        view = _current_view(xt, table)
        sets = dict(_split_sets(m.group("sets")))
        cur_cols = [c for c in spark.table(view).columns if c != "_iid"]
        for col, expr in sets.items():
            if not re.fullmatch(r"[A-Za-z_]\w*", col) or not expr.strip():
                raise ValueError(f"malformed SET clause near {col!r}")
            if col not in cur_cols:
                raise ValueError(f"UPDATE {table}: unknown column {col!r}")
            if col == "_id":
                raise ValueError("cannot UPDATE _id")
        proj = ", ".join(f"({sets[c]}) AS {c}" if c in sets else c
                         for c in cur_cols)
        rel = spark.sql(_esc(f"SELECT {proj} FROM {view}"
                             + (f" WHERE {where}" if where else "")))
        st = xt.store.put(table, rel, valid_from=m.group("vf"),
                          valid_to=m.group("vt"))
        return _returning(spark, rel, ret, st)

    m = _DELETE_RE.match(query)
    if m:
        # the matching ids stay a DataFrame end-to-end — a broad
        # DELETE at 100 TB must not collect its id set to the driver
        table, where = m.group("table"), m.group("where")
        view = _current_view(xt, table)
        rows = spark.sql(_esc(f"SELECT * FROM {view}"
                              + (f" WHERE {where}" if where else "")))
        ids = rows.select("_id")
        st = xt.store.delete(table, ids, valid_from=m.group("vf"),
                             valid_to=m.group("vt"))
        # RETURNING sees the deleted (pre-delete) rows — `rows` is
        # pinned to the statement-time manifest snapshot
        return _returning(spark, rows, ret, st)

    m = _ERASE_RE.match(query)
    if m:
        table, where = m.group("table"), m.group("where")
        view = _current_view(xt, table)
        rows = spark.sql(_esc(f"SELECT * FROM {view}"
                              + (f" WHERE {where}" if where else "")))
        st = xt.store.erase(table, rows.select("_id"))
        return _returning(spark, rows, ret, st)

    m = _ASSERT_RE.match(query)
    if m:
        if ret is not None:
            raise ValueError("ASSERT does not take RETURNING")
        from xtdb_spark.sql.rewriter import rewrite

        cond = rewrite(xt, m.group("cond"))
        ok = spark.sql(f"SELECT ({cond}) AS ok").collect()[0]["ok"]
        if not ok:
            raise AssertFailed(f"ASSERT failed: {m.group('cond').strip()}")
        return None

    raise ValueError(f"unsupported DML statement: {query[:120]}")


class _TxRecorder:
    """Session shim for transactional DML recording: exposes the
    surface `execute_dml` touches (.spark, .store, scan/rewrite
    delegation) but turns store mutations into `submit_tx` op tuples
    instead of executing them. Read-side DataFrames (UPDATE/DELETE
    sources) are still BUILT at record time, so they pin the
    statement-time manifest snapshot; nothing is written until the
    buffered ops go through `TableStore.submit_tx` at COMMIT."""

    class _Store:
        def __init__(self, real, ops):
            self._real, self._ops = real, ops

        def put(self, table, rows, valid_from=None, valid_to=None, **kw):
            self._ops.append(("put", table, rows,
                              {"valid_from": valid_from, "valid_to": valid_to}))

        def patch(self, table, rows, valid_from=None, valid_to=None, **kw):
            self._ops.append(("patch", table, rows,
                              {"valid_from": valid_from, "valid_to": valid_to}))

        def delete(self, table, ids, valid_from=None, valid_to=None, **kw):
            self._ops.append(("delete", table, ids,
                              {"valid_from": valid_from, "valid_to": valid_to}))

        def erase(self, table, ids, **kw):
            self._ops.append(("erase", table, ids))

        def __getattr__(self, name):  # scan() etc. read the real store
            return getattr(self._real, name)

    def __init__(self, xt, ops: list):
        self._xt = xt
        self.spark = xt.spark
        self.store = self._Store(xt.store, ops)

    def __getattr__(self, name):
        return getattr(self._xt, name)


def record_dml_ops(xt, query: str) -> list:
    """Parse one DML statement into `submit_tx` op tuples without
    executing it — the pgwire BEGIN…COMMIT buffering path (reference
    pgwire.clj: DML inside an explicit transaction block accumulates
    and submits as ONE tx on COMMIT). ASSERT defers its check to
    commit time so it runs against the tx basis, aborting the whole
    batch like the reference's `ASSERT` tx op."""
    m = _ASSERT_RE.match(query)
    if m:
        from xtdb_spark.sql.rewriter import rewrite

        cond_sql = rewrite(xt, m.group("cond"))
        src = m.group("cond").strip()

        def _check(_store, _sql=cond_sql, _src=src):
            ok = xt.spark.sql(f"SELECT ({_sql}) AS ok").collect()[0]["ok"]
            if not ok:
                raise AssertFailed(f"ASSERT failed: {_src}")

        return [("assert_", _check)]
    ops: list = []
    execute_dml(_TxRecorder(xt, ops), query)
    return ops
