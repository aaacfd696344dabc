"""SLT script execution against the engine.

Mirrors the reference's runner + engine adapter pair
(runner.clj:161-319 execute-records / format-result-str / md5;
xtdb_engine.clj:17-150):

- engine name is "xtdb", so the corpus's `skipif`/`onlyif`
  directives resolve the same way (runner.clj:163-166);
- `CREATE INDEX` statements are skipped (xtdb_engine.clj:30-31);
- `CREATE TABLE` records the declared column names/types (the
  document model has no DDL schema; columns order INSERTs without a
  column list, types coerce the literal values) and registers the
  table so it scans as empty (xtdb_engine.clj:17-19 + our
  TableStore.create_table);
- `INSERT … VALUES` rows get a generated `_id` and ingest through
  the tx path (xtdb_engine.clj:90-112 put-docs with random-uuid);
  consecutive literal INSERTs between queries batch into one put per
  table — same visibility at the next query, ~100× fewer txs;
- other DML (INSERT … SELECT, DELETE, UPDATE) runs verbatim through
  XtdbSession.sql (the reference's InsertFromSubquery → [:sql …]);
- queries run through XtdbSession.sql with `store.hide_id` set, so
  `SELECT *` excludes `_id` (xtdb_engine.clj:46-52's table-info
  `_id` removal);
- results format per the reference's format-result-str
  (runner.clj:204-227): NULL, R=%.3f, I=long-cast (strings → "0"),
  T=str with ""→"(empty)", then nosort/rowsort/valuesort, then md5
  or inline compare;
- exceptions on records marked `skipif postgresql`, or mentioning
  "Duplicate column projection", skip silently (runner.clj:305-309);
  everything else counts an error.
"""

from __future__ import annotations

import hashlib
import os
import re
import shutil
import time

from xtdb_spark.slt.parser import parse_script

ENGINE_NAME = "xtdb"

_CREATE_INDEX_RE = re.compile(
    r"(?is)^\s*CREATE\s+(UNIQUE\s+)?INDEX\s+(\w+)\s+ON\s+(\w+)\s*\((.+)\)\s*$")
_CREATE_TABLE_RE = re.compile(
    r"(?is)^\s*CREATE\s+TABLE\s+([\w$]+)\s*\((.+)\)\s*$")
_CREATE_VIEW_RE = re.compile(
    r"(?is)^\s*CREATE\s+VIEW\s+([\w$]+)\s+AS\s+(.+?)\s*$")
_DROP_TABLE_RE = re.compile(
    r"(?is)^\s*DROP\s+TABLE\s+(?:IF\s+EXISTS\s+)?([\w$]+)\s*$")
_DROP_VIEW_RE = re.compile(
    r"(?is)^\s*DROP\s+VIEW\s+(?:IF\s+EXISTS\s+)?([\w$]+)\s*$")
_INSERT_VALUES_RE = re.compile(
    r"(?is)^\s*INSERT\s+INTO\s+([\w$]+)\s*(?:\(([^)]*)\))?\s*VALUES\s*(.+)$")

# one literal inside a VALUES tuple, followed by its , or ) terminator
_LIT_RE = re.compile(
    r"""\s*(?:
        (?P<null>NULL)
      | (?P<num>[-+]?(?:\d+\.?\d*|\.\d+)(?:[eE][-+]?\d+)?)
      | (?P<str>'(?:[^']|'')*')
    )\s*(?P<sep>[,)])""",
    re.IGNORECASE | re.VERBOSE)

_INT_TYPES = ("INT",)            # INTEGER, INT, BIGINT, SMALLINT
_FLOAT_TYPES = ("FLOAT", "REAL", "DOUBLE", "DECIMAL", "NUMERIC")


def _split_cols(src: str) -> list[str]:
    """split a column-def list on top-level commas (VARCHAR(30)
    parens nest)."""
    out, depth, cur = [], 0, []
    for ch in src:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur))
    return out


class SltEngine:
    """Engine adapter: one SLT script session over one XtdbSession
    with a fresh warehouse (the reference runs each script in a fresh
    node, runner.clj:344-347 with-node)."""

    def __init__(self, xt, direct_sql: bool = False):
        """`direct_sql=True` is the reference's --direct-sql mode
        (runner.clj:405, direct_sql_test.clj): the corpus is
        reference-AUTHORED XTDB-dialect SQL, so statements run
        verbatim through xt.sql, `_id` stays SQL-visible
        (xtdb_engine.clj:51 disables the table-info _id removal in
        this mode), and the scripts reference temporal columns and
        `_VALID_TIME`/`_SYSTEM_TIME` period pseudo-columns."""
        self.xt = xt
        self.direct = direct_sql
        st = xt.store
        if direct_sql:
            # the reference runs direct-sql under a MOCK CLOCK —
            # 2020-01-01 + 1 day per tx (runner.clj:344
            # with-mock-clock; test_util.clj:107 ->mock-clock) — and
            # the corpus's expected _system_from values depend on it
            from datetime import datetime, timedelta

            def _mock_clock(_state=[datetime(2020, 1, 1)]):
                t = _state[0]
                _state[0] = t + timedelta(days=1)
                return t

            st.instant_source = _mock_clock
            # the corpus's `nosort` expected blocks embed the
            # reference's iid-hash scan order (round 12) — reproduce
            # it (rewriter._ref_iid_order; direct-sql mode only)
            st.scan_order_ref_iid = True
        # SLT tables are tiny and re-queried thousands of times:
        # serving cache on, speculative prefilter injection off (the
        # footer probes cost more than these scans)
        st.serve_cache = True
        st.sql_auto_prefilter = False
        st.sql_join_prefilter = False
        st.hide_id = False
        self.tables: dict[str, list[tuple[str, str]]] = {}
        self.views: dict[str, str] = {}
        self.pending: dict[str, list[dict]] = {}
        self._id_seq = 0

    # ---------------------------------------------------- statements

    def execute_statement(self, statement: str) -> None:
        if _CREATE_INDEX_RE.match(statement):
            return                     # xtdb_engine.clj:30-31
        m = _CREATE_TABLE_RE.match(statement)
        if m:
            name = m.group(1).lower()
            cols = []
            for cdef in _split_cols(m.group(2)):
                ws = cdef.split()
                if not ws:
                    continue
                cname = ws[0].strip('"').lower()
                ctype = (ws[1].upper() if len(ws) > 1 else "")
                cols.append((cname, ctype))
            self.tables[name] = cols
            self.xt.store.create_table(name, [c for c, _ in cols])
            return
        m = _CREATE_VIEW_RE.match(statement)
        if m:
            self.views[m.group(1).lower()] = m.group(2)
            return
        m = _DROP_VIEW_RE.match(statement)
        if m:
            self.views.pop(m.group(1).lower(), None)
            return
        m = _DROP_TABLE_RE.match(statement)
        if m:
            name = m.group(1).lower()
            self.pending.pop(name, None)
            self.tables.pop(name, None)
            st = self.xt.store
            ent = st._scan_cache.pop(name, None)
            if ent is not None:
                try:
                    ent[1].unpersist()
                except Exception:
                    pass
            shutil.rmtree(st._path(name), ignore_errors=True)
            return
        m = _INSERT_VALUES_RE.match(statement)
        if m:
            rows = self._parse_insert(m)
            if rows is not None:
                table = m.group(1).lower()
                self.pending.setdefault(table, []).extend(rows)
                if self.direct:
                    # each statement is its OWN tx under the mock
                    # clock — per-day system times are load-bearing
                    # in the expected results; no cross-statement
                    # batching in direct mode
                    self.flush()
                return
        # everything else (INSERT…SELECT, DELETE, UPDATE, …) runs
        # through the SQL surface (with the same int-div dialect
        # rewrite queries get)
        from xtdb_spark.slt.intdiv import rewrite_int_div

        self.flush()
        self.xt.sql(rewrite_int_div(statement, self._col_types()))

    def _col_types(self) -> dict:
        """Lowercase column name → 'int' | 'float' | 'text' from the
        scripts' CREATE TABLE declarations, for the int-div rewrite's
        STATIC int-ness analysis (round 11). A name declared with
        conflicting types across tables maps to None (unknown →
        runtime-typeof fallback); the corpus generator reuses the
        same col0..colN names with consistent types, so this is
        rare."""
        m: dict = {}
        for cols in self.tables.values():
            for c, t in cols:
                k = ("int" if any(x in t for x in _INT_TYPES)
                     else "float" if any(x in t for x in _FLOAT_TYPES)
                     else "text")
                if c in m and m[c] != k:
                    m[c] = None
                elif c not in m:
                    m[c] = k
        return m

    def _parse_insert(self, m) -> list[dict] | None:
        table = m.group(1).lower()
        cols = ([c.strip().strip('"').lower() for c in m.group(2).split(",")]
                if m.group(2) else
                [c for c, _ in self.tables.get(table, [])])
        if not cols:
            return None
        types = dict(self.tables.get(table, []))
        src = m.group(3)
        rows = []
        i = 0
        n = len(src)
        while True:
            while i < n and src[i] in " \t\r\n":
                i += 1
            if i >= n:
                break
            if src[i] != "(":
                return None            # expression form — SQL path
            i += 1
            vals = []
            while True:
                lm = _LIT_RE.match(src, i)
                if not lm:
                    return None        # non-literal — SQL path
                if lm.group("null"):
                    vals.append(None)
                elif lm.group("num") is not None:
                    t = lm.group("num")
                    vals.append(float(t) if ("." in t or "e" in t.lower())
                                else int(t))
                else:
                    vals.append(lm.group("str")[1:-1].replace("''", "'"))
                i = lm.end()
                if lm.group("sep") == ")":
                    break
            if len(vals) != len(cols):
                return None
            row = {}
            for c, v in zip(cols, vals):
                t = types.get(c, "")
                if v is None:
                    row[c] = None
                elif any(k in t for k in _INT_TYPES):
                    row[c] = int(v) if not isinstance(v, str) else v
                elif any(k in t for k in _FLOAT_TYPES):
                    row[c] = float(v) if not isinstance(v, str) else v
                elif t.startswith(("TEXT", "VARCHAR", "CHAR", "STRING")):
                    row[c] = v if isinstance(v, str) else str(v)
                else:
                    row[c] = v
            if row.get("_id") is None:
                # sqlite corpus rows carry no id — generate one;
                # direct-sql (XTDB dialect) INSERTs provide their own
                self._id_seq += 1
                row["_id"] = self._id_seq
            rows.append(row)
            while i < n and src[i] in " \t\r\n":
                i += 1
            if i < n and src[i] == ",":
                i += 1
                continue
            break
        return rows

    def flush(self) -> None:
        if not self.pending:
            return
        pend, self.pending = self.pending, {}
        for table, rows in pend.items():
            cols: list[str] = []
            for r in rows:
                for k in r:
                    if k not in cols:
                        cols.append(k)
            all_none = [c for c in cols
                        if all(r.get(c) is None for r in rows)]
            if not all_none:
                self.xt.put(table, rows)
                continue
            # a batch-wide NULL column defeats type inference — build
            # the DataFrame with an explicit schema from the declared
            # column types (document model: types normally arrive
            # with the data; here the script declared them)
            from pyspark.sql.types import (DoubleType, LongType,
                                           StringType, StructField,
                                           StructType)

            types = dict(self.tables.get(table, []))

            def styp(c):
                t = types.get(c, "")
                if c == "_id" or any(k in t for k in _INT_TYPES):
                    return LongType()
                if any(k in t for k in _FLOAT_TYPES):
                    return DoubleType()
                return StringType()

            schema = StructType([StructField(c, styp(c)) for c in cols])
            data = [tuple(r.get(c) for c in cols) for r in rows]
            df = self.xt.spark.createDataFrame(data, schema)
            self.xt.put(table, df)

    # ------------------------------------------------------- queries

    def execute_query(self, query: str) -> list[list]:
        from xtdb_spark.slt.intdiv import rewrite_int_div

        self.flush()
        self._register_views(query)
        st = self.xt.store
        st.hide_id = not self.direct
        try:
            df = self.xt.sql(rewrite_int_div(query, self._col_types()))
            return [list(r) for r in df.collect()]
        finally:
            st.hide_id = False

    def _register_views(self, query: str) -> None:
        if not self.views:
            return
        words = {w.lower() for w in re.findall(r"[A-Za-z_]\w*", query)}
        from xtdb_spark.slt.intdiv import rewrite_int_div

        for name, vsql in self.views.items():
            if name in words:
                st = self.xt.store
                st.hide_id = True
                try:
                    self.xt.sql(rewrite_int_div(vsql, self._col_types())) \
                        .createOrReplaceTempView(name)
                finally:
                    st.hide_id = False


# ------------------------------------------------------- formatting

def _render_tvalue(v, nested: bool = False) -> str:
    """T-column value, reference print style (runner.clj
    format-result-str → pr-str of transit-decoded values):
    structs/maps as `{"k" v, …}` (Clojure map print — no colon,
    entries comma-separated), arrays as `[a b]` (space-separated),
    strings double-quoted when NESTED but bare at top level,
    booleans lowercase, timestamps as java ZonedDateTime
    (`1998-01-10T00:00Z[UTC]` — seconds elided when zero), dates
    ISO."""
    import datetime as _dt

    try:
        from pyspark.sql import Row as _Row
    except Exception:               # pragma: no cover
        _Row = ()
    if v is None:
        return "nil" if nested else "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, str):
        if nested:
            return '"' + v + '"'
        return "(empty)" if v == "" else v
    if isinstance(v, _dt.datetime):
        if v.microsecond:
            t = v.strftime("%Y-%m-%dT%H:%M:%S.%f").rstrip("0")
        elif v.second:
            t = v.strftime("%Y-%m-%dT%H:%M:%S")
        else:
            t = v.strftime("%Y-%m-%dT%H:%M")
        return t + "Z[UTC]"
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (_Row, dict)):
        d = v.asDict() if isinstance(v, _Row) else v
        # None fields are ABSENT keys, not nil values: Spark widens
        # heterogeneous documents to one struct schema (missing keys
        # → null); the reference's documents simply don't have them
        return ("{" + ", ".join(f'"{k}" {_render_tvalue(x, True)}'
                                for k, x in d.items()
                                if x is not None) + "}")
    if isinstance(v, (list, tuple)):
        return ("[" + " ".join(_render_tvalue(x, True) for x in v)
                + "]")
    return str(v)


def format_result_str(sort_mode: str, type_string: str,
                      rows: list[list]) -> str:
    """runner.clj:204-221 format-result-str, byte-for-byte."""
    out_rows = []
    for vs in rows:
        row = []
        for t, v in zip(type_string, vs):
            if v is None:
                row.append("NULL")
            elif t == "R":
                row.append("%.3f" % float(v))
            elif t == "I":
                if isinstance(v, str):
                    row.append("0")    # SLT: string in I column → 0
                else:
                    row.append("%d" % int(v))
            else:
                row.append(_render_tvalue(v))
        out_rows.append(row)
    if sort_mode == "rowsort":
        out_rows.sort(key=lambda r: " ".join(r))
        flat = [v for r in out_rows for v in r]
    elif sort_mode == "valuesort":
        flat = sorted(v for r in out_rows for v in r)
    else:
        flat = [v for r in out_rows for v in r]
    return "\n".join(flat) + "\n"


def _md5(s: str) -> str:
    return hashlib.md5(s.encode("utf-8")).hexdigest()


def _skip_record(rec: dict) -> bool:
    onlyif = rec.get("onlyif") or ENGINE_NAME
    return (ENGINE_NAME in rec.get("skipif", ())
            or onlyif != ENGINE_NAME)


def _silent_exception(rec: dict, e: Exception) -> bool:
    """runner.clj:305-309: records the corpus marks unrunnable on
    postgres, or XTDB's duplicate-projection rejection class, skip
    silently instead of counting an error."""
    return ("postgresql" in rec.get("skipif", ())
            or "Duplicate column projection" in str(e))


# ---------------------------------------------------------- running

def run_records(engine: SltEngine, records: list[dict],
                query_limit: int | None = None,
                collect_failures: int = 0) -> dict:
    res = {"success": 0, "failure": 0, "error": 0, "skipped": 0,
           "stmt_ok": 0, "queries_run": 0, "failures": []}
    for rec in records:
        typ = rec["type"]
        if typ == "halt":
            break
        if typ == "hash-threshold":
            continue               # only affects completion mode
        if typ == "variable":
            continue               # corpus dirs don't use variables
        if query_limit is not None and res["queries_run"] >= query_limit:
            break
        if _skip_record(rec):
            res["skipped"] += 1
            continue
        if typ == "statement":
            try:
                if rec["mode"] == "error":
                    try:
                        engine.execute_statement(rec["statement"])
                    except Exception:
                        pass       # expected (runner.clj:201)
                else:
                    engine.execute_statement(rec["statement"])
                    res["stmt_ok"] += 1
            except Exception as e:
                if not _silent_exception(rec, e):
                    res["error"] += 1
            continue
        # query
        res["queries_run"] += 1
        try:
            rows = engine.execute_query(rec["query"])
            rstr = format_result_str(rec["sort_mode"],
                                     rec["type_string"], rows)
            if rec.get("md5") is not None:
                ok = _md5(rstr) == rec["md5"]
            else:
                ok = rstr == rec["result_set"]
            if ok:
                res["success"] += 1
            else:
                res["failure"] += 1
                if len(res["failures"]) < collect_failures:
                    res["failures"].append(
                        {"line": rec["line"], "query": rec["query"],
                         "expected": rec.get("result_set",
                                             rec.get("md5")),
                         "actual": rstr[:2000]})
        except Exception as e:
            if _silent_exception(rec, e):
                res["skipped"] += 1
            else:
                res["error"] += 1
                if len(res["failures"]) < collect_failures:
                    res["failures"].append(
                        {"line": rec["line"], "query": rec["query"],
                         "error": f"{type(e).__name__}: {e}"[:500]})
    return res


def run_script(xt, path: str, query_limit: int | None = None,
               collect_failures: int = 0,
               direct_sql: bool = False) -> dict:
    with open(path) as f:
        records = parse_script(f.read(), path)
    t0 = time.time()
    res = run_records(SltEngine(xt, direct_sql=direct_sql), records,
                      query_limit, collect_failures)
    res["time_s"] = round(time.time() - t0, 2)
    res["file"] = path
    return res


def run_files(spark, paths: list[str], threads: int = 8,
              query_limit: int | None = None,
              warehouse_root: str | None = None,
              collect_failures: int = 0,
              progress=None, direct_sql: bool = False) -> list[dict]:
    """Run many scripts concurrently. Each worker gets an ISOLATED
    `spark.newSession()` (own temp-view catalog + conf, shared
    SparkContext — tables named t1 in two files can't collide) and a
    fresh warehouse per script, like the reference's with-node per
    script."""
    import tempfile
    from concurrent.futures import ThreadPoolExecutor

    from xtdb_spark.session import XtdbSession

    root = warehouse_root or tempfile.mkdtemp(prefix="slt_wh_")

    def one(idx_path):
        idx, path = idx_path
        sess = spark.newSession()
        sess.conf.set("spark.sql.shuffle.partitions", "1")
        # non-ANSI evaluation for the sqlite corpus: a malformed
        # numeric cast yields NULL instead of aborting the query —
        # the closest Spark gets to the reference's dynamic typing
        # (its kernels dispatch per runtime type; Spark's static
        # coercion inserts string→double casts that'd otherwise
        # hard-error on text like 'oxkuv' in arithmetic context)
        sess.conf.set("spark.sql.ansi.enabled", "false")
        # ansi=false also flips NULL IN (empty set) to legacy NULL;
        # the spec (and the corpus, xtdb.test:133-143) requires FALSE
        sess.conf.set("spark.sql.legacy.nullInEmptyListBehavior",
                      "false")
        wh = os.path.join(root, f"s{idx}")
        xt = XtdbSession(sess, wh)
        try:
            r = run_script(xt, path, query_limit, collect_failures,
                           direct_sql=direct_sql)
        except Exception as e:       # file-level abort → all error
            r = {"file": path, "success": 0, "failure": 0,
                 "error": -1, "abort": f"{type(e).__name__}: {e}"[:500]}
        finally:
            # unpersist this worker's cached scans only — NOT
            # catalog.clearCache(), which is block-manager-wide and
            # would evict sibling workers' live caches mid-query
            for ent in xt.store._scan_cache.values():
                try:
                    ent[1].unpersist()
                except Exception:
                    pass
            shutil.rmtree(wh, ignore_errors=True)
        if progress:
            progress(r)
        return r

    with ThreadPoolExecutor(max_workers=threads) as ex:
        return list(ex.map(one, enumerate(paths)))


def summarize(results: list[dict]) -> dict:
    tot = {"files": len(results), "success": 0, "failure": 0,
           "error": 0, "skipped": 0, "queries_run": 0, "time_s": 0.0,
           "aborts": 0}
    for r in results:
        if r.get("abort"):
            tot["aborts"] += 1
            continue
        for k in ("success", "failure", "error", "skipped",
                  "queries_run"):
            tot[k] += r.get(k, 0)
        tot["time_s"] += r.get("time_s", 0)
    tot["time_s"] = round(tot["time_s"], 1)
    return tot
