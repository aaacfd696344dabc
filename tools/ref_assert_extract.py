"""Extract `(t/is (= expected (xt/q tu/*node* "SQL")))` assertions
from the reference's Clojure test files, as (file, line, sql,
expected) tuples — the expected value evaluated from its edn form
into Python values.

Only self-contained assertions extract: the xt/q call must take
exactly the node + one SQL string (no bind-args, no opts map), and
the expected form must be a literal vector of maps whose values are
edn scalars / collections / known tagged literals. Anything else is
skipped WITH A REASON so callers can report coverage honestly.
"""

from __future__ import annotations

import datetime as dt
import re
from decimal import Decimal


class CljScanner:
    """Minimal Clojure-form scanner: returns the source span of one
    balanced form starting at index i (handles strings, chars,
    comments, #-dispatch, metadata)."""

    def __init__(self, text: str):
        self.text = text

    def skip_ws(self, i: int) -> int:
        t = self.text
        while i < len(t):
            c = t[i]
            if c in " \t\n\r,":
                i += 1
            elif c == ";":
                while i < len(t) and t[i] != "\n":
                    i += 1
            else:
                break
        return i

    def form_end(self, i: int) -> int:
        """End index (exclusive) of the form starting at i."""
        t = self.text
        i = self.skip_ws(i)
        c = t[i]
        if c == "#":
            # dispatch: #{...}, #_form, #inst "...", #(...), #"..."
            if t[i + 1] == "{" or t[i + 1] == "(":
                return self._balanced(i + 1)
            if t[i + 1] == '"':
                return self._string(i + 1)
            if t[i + 1] == "_":
                return self.form_end(self.form_end(i + 2))
            # tag symbol then its form
            j = i + 1
            while j < len(t) and t[j] not in ' \t\n\r,()[]{}";':
                j += 1
            return self.form_end(j)
        if c == "^":  # metadata: meta form + real form
            return self.form_end(self.form_end(i + 1))
        if c in "([{":
            return self._balanced(i)
        if c == '"':
            return self._string(i)
        if c == "\\":  # char literal
            j = i + 1
            while j < len(t) and t[j] not in ' \t\n\r,()[]{}";':
                j += 1
            return max(j, i + 2)
        if c in ("'", "`", "~", "@"):
            return self.form_end(i + 1)
        j = i
        while j < len(t) and t[j] not in ' \t\n\r,()[]{}";':
            j += 1
        return j

    def _string(self, i: int) -> int:
        t = self.text
        j = i + 1
        while j < len(t):
            if t[j] == "\\":
                j += 2
            elif t[j] == '"':
                return j + 1
            else:
                j += 1
        return j

    def _balanced(self, i: int) -> int:
        t = self.text
        pairs = {"(": ")", "[": "]", "{": "}"}
        close = pairs[t[i]]
        depth = 0
        j = i
        while j < len(t):
            c = t[j]
            if c == '"':
                j = self._string(j)
                continue
            if c == ";":
                while j < len(t) and t[j] != "\n":
                    j += 1
                continue
            if c == "\\":
                j += 2
                continue
            if c in pairs:
                depth += 1
            elif c in (")", "]", "}"):
                depth -= 1
                if depth == 0 and c == close:
                    return j + 1
            j += 1
        return j


# ---- edn → Python (typed tags, M/N numeric suffixes)

_NUM_M_RE = re.compile(r"^[+-]?\d+(\.\d+)?M$")
_NUM_N_RE = re.compile(r"^[+-]?\d+N$")


class Skip(Exception):
    pass


class EdnVal:
    def __init__(self, text: str):
        self.t = text
        self.i = 0
        self.sc = CljScanner(text)

    def read(self):
        self.i = self.sc.skip_ws(self.i)
        t, i = self.t, self.i
        c = t[i]
        if c == "[":
            return self._seq("]")
        if c == "{":
            items = self._seq("}")
            if len(items) % 2:
                raise Skip("odd map")
            return dict(zip(items[::2], items[1::2]))
        if c == "#":
            return self._dispatch()
        if c == "(":
            raise Skip("list/call in expected")
        if c == '"':
            j = self.sc._string(i)
            self.i = j
            body = t[i + 1:j - 1]
            return re.sub(
                r"\\(.)",
                lambda m: {"n": "\n", "t": "\t", "r": "\r"}.get(
                    m.group(1), m.group(1)), body)
        j = self.sc.form_end(i)
        tok = t[i:j]
        self.i = j
        if tok == "nil":
            return None
        if tok == "true":
            return True
        if tok == "false":
            return False
        if tok.startswith(":"):
            return Kw(tok[1:])
        if _NUM_M_RE.match(tok):
            return Decimal(tok[:-1])
        if _NUM_N_RE.match(tok):
            return int(tok[:-1])
        try:
            return int(tok)
        except ValueError:
            pass
        try:
            return float(tok)
        except ValueError:
            pass
        if tok.startswith("##"):
            return {"##Inf": float("inf"), "##-Inf": float("-inf"),
                    "##NaN": float("nan")}.get(tok) or _skip(tok)
        if tok in ("Double/POSITIVE_INFINITY", "Float/POSITIVE_INFINITY"):
            return float("inf")
        if tok in ("Double/NEGATIVE_INFINITY", "Float/NEGATIVE_INFINITY"):
            return float("-inf")
        if tok in ("Double/NaN", "Float/NaN"):
            return float("nan")
        raise Skip(f"symbol {tok!r}")

    def _seq(self, close):
        self.i += 1
        out = []
        while True:
            self.i = self.sc.skip_ws(self.i)
            if self.t[self.i] == close:
                self.i += 1
                return out
            out.append(self.read())

    def _dispatch(self):
        t = self.t
        self.i += 1
        if t[self.i] == "{":
            return set_like(self._seq("}"))
        if t[self.i] == "#":       # ##Inf etc.
            j = self.sc.form_end(self.i - 1)
            tok = t[self.i - 1:j]
            self.i = j
            return {"##Inf": float("inf"), "##-Inf": float("-inf")}.get(
                tok) if tok != "##NaN" else float("nan")
        j = self.i
        while j < len(t) and t[j] not in ' \t\n\r,()[]{}";':
            j += 1
        tag = t[self.i:j]
        self.i = j
        val = self.read()
        return _apply_tag(tag, val)


def _skip(msg):
    raise Skip(str(msg))


class Kw(str):
    """edn keyword (name without ':')."""
    __slots__ = ()


class set_like(list):
    pass


def _parse_zdt(s: str) -> dt.datetime:
    s = re.sub(r"\[[^\]]*\]$", "", s)
    d = dt.datetime.fromisoformat(s.replace("Z", "+00:00"))
    if d.tzinfo is not None:
        d = d.astimezone(dt.timezone.utc).replace(tzinfo=None)
    return d


def _parse_duration(s: str) -> dt.timedelta:
    m = re.match(
        r"^([+-]?)P(?:(\d+)D)?(?:T(?:(\d+)H)?(?:(\d+)M)?"
        r"(?:(\d+(?:\.\d+)?)S)?)?$", s, re.IGNORECASE)
    if not m:
        raise Skip(f"duration {s}")
    sign, d, h, mi, sec = m.groups()
    td = dt.timedelta(days=int(d or 0), hours=int(h or 0),
                      minutes=int(mi or 0), seconds=float(sec or 0))
    return -td if sign == "-" else td


def _apply_tag(tag: str, val):
    if tag == "inst":
        return _parse_zdt(val)
    if tag in ("xt/zdt", "xt/ldt", "xt/instant", "xt/date-time",
               "xt/zoned-date-time", "xt/local-date-time",
               "time/zoned-date-time", "time/instant"):
        return _parse_zdt(val)
    if tag == "xt/date":
        return dt.date.fromisoformat(val)
    if tag == "xt/time":
        return dt.time.fromisoformat(val)
    if tag in ("xt/duration",):
        return _parse_duration(val)
    if tag in ("uuid", "xt/uuid"):
        return str(val)
    if tag == "xt/uri":
        return str(val)
    if tag == "xt/decimal":
        return Decimal(val)
    raise Skip(f"tag #{tag}")


def extract(path: str):
    """Yield dicts: {line, sql, expected} or {line, skip: reason}."""
    src = open(path).read()
    sc = CljScanner(src)
    for m in re.finditer(r"\(t/is\s*\(=\s", src):
        line = src.count("\n", 0, m.start()) + 1
        try:
            a_start = sc.skip_ws(m.end() - 1)
            a_end = sc.form_end(a_start)
            b_start = sc.skip_ws(a_end)
            b_end = sc.form_end(b_start)
            a_src = src[a_start:a_end]
            b_src = src[b_start:b_end]
            # expected on either side of the xt/q call
            if a_src.startswith("(xt/q"):
                a_src, b_src = b_src, a_src
            if not b_src.startswith("(xt/q"):
                yield {"line": line, "skip": "not an xt/q assertion"}
                continue
            qm = re.match(
                r'\(xt/q\s+tu/\*node\*\s*$',
                b_src[:b_src.index('"')].rstrip()
                if '"' in b_src else b_src)
            if not qm:
                yield {"line": line, "skip": "non-standard node arg"}
                continue
            # SQL string = first string inside; require the call to
            # be exactly (xt/q tu/*node* "SQL")
            s_start = b_src.index('"')
            s_end = CljScanner(b_src)._string(s_start)
            rest = b_src[s_end:].strip()
            if rest != ")":
                yield {"line": line, "skip": "extra xt/q args"}
                continue
            sql_src = b_src[s_start + 1:s_end - 1]
            sql = re.sub(
                r"\\(.)",
                lambda mm: {"n": "\n", "t": "\t", "r": "\r"}.get(
                    mm.group(1), mm.group(1)), sql_src)
            expected = EdnVal(a_src).read()
            if not isinstance(expected, list) \
                    or not all(isinstance(r, dict) for r in expected):
                yield {"line": line, "skip": "expected not row-maps"}
                continue
            yield {"line": line, "sql": sql, "expected": expected}
        except Skip as e:
            yield {"line": line, "skip": str(e)}
        except Exception as e:
            yield {"line": line, "skip": f"{type(e).__name__}: {e}"}


# ---- deftest-scoped extraction: fixtures + assertions in order

_TX_RE = re.compile(r"\(xt/(?:submit-tx|execute-tx)\s+tu/\*node\*\s")
_IS_RE = re.compile(r"\(t/is\s*\(=\s")


def _read_clj_value(src: str):
    """Evaluate one edn-ish source form into Python (Skip on
    anything non-literal)."""
    return EdnVal(src).read()


def _parse_tx_ops(src: str):
    """tx-ops vector source → list of ops:
    ("sql", text) | ("put", table, docs, opts) |
    ("delete", table, ids). Skip on non-literal shapes."""
    v = _read_clj_value(src)
    if not isinstance(v, list):
        raise Skip("tx-ops not a vector")
    ops = []
    for op in v:
        if isinstance(op, str):
            ops.append(("sql", op))
            continue
        if isinstance(op, list) and op and isinstance(op[0], Kw):
            kind = str(op[0])
            if kind == "sql" and len(op) >= 2 and isinstance(op[1], str):
                ops.append(("sql", op[1]))
                continue
            if kind == "put-docs" and len(op) >= 2:
                tbl = op[1]
                opts = {}
                if isinstance(tbl, dict):
                    opts = {str(k): x for k, x in tbl.items()}
                    tbl = opts.pop("into", None)
                if not isinstance(tbl, Kw):
                    raise Skip("put-docs table not a keyword")
                docs = op[2:]
                if not all(isinstance(d, dict) for d in docs):
                    raise Skip("put-docs doc not a literal map")
                ops.append(("put", str(tbl), docs, opts))
                continue
            if kind in ("delete-docs", "erase-docs") and len(op) >= 2 \
                    and isinstance(op[1], Kw):
                ops.append((kind.split("-")[0], str(op[1]),
                            list(op[2:]), {}))
                continue
        raise Skip(f"unsupported tx-op {str(op)[:60]}")
    return ops


def extract_deftests(path: str):
    """Yield per-deftest dicts: {name, line, items: [...]} where each
    item is ('tx', line, ops) / ('assert', line, sql, expected) /
    ('skip', line, reason) / ('fixture-skip', line, reason). Items
    appear in SOURCE ORDER, so a replay reproduces the deftest's
    store state at each assertion."""
    src = open(path).read()
    sc = CljScanner(src)
    for dm in re.finditer(r"\(t/deftest\s+(?:\^[^\s]+\s+)*([\w?!*<>=-]+)", src):
        start = dm.start()
        end = sc.form_end(start)
        body = src[start:end]
        base_line = src.count("\n", 0, start) + 1
        items = []
        events = []
        for m in _TX_RE.finditer(body):
            events.append((m.start(), "tx", m))
        for m in _IS_RE.finditer(body):
            events.append((m.start(), "is", m))
        events.sort()
        bsc = CljScanner(body)
        for pos, kind, m in events:
            line = base_line + body.count("\n", 0, pos)
            if kind == "tx":
                try:
                    a = bsc.skip_ws(m.end() - 1)
                    ops_src = body[a:bsc.form_end(a)]
                    items.append(("tx", line, _parse_tx_ops(ops_src)))
                except Skip as e:
                    items.append(("fixture-skip", line, str(e)))
                except Exception as e:
                    items.append(("fixture-skip", line,
                                  f"{type(e).__name__}: {e}"))
                continue
            try:
                a_start = bsc.skip_ws(m.end() - 1)
                a_end = bsc.form_end(a_start)
                b_start = bsc.skip_ws(a_end)
                b_end = bsc.form_end(b_start)
                a_src = body[a_start:a_end]
                b_src = body[b_start:b_end]
                if a_src.startswith("(xt/q"):
                    a_src, b_src = b_src, a_src
                if not b_src.startswith("(xt/q"):
                    items.append(("skip", line, "not an xt/q assertion"))
                    continue
                if '"' not in b_src or not re.match(
                        r"\(xt/q\s+tu/\*node\*\s*$",
                        b_src[:b_src.index('"')].rstrip()):
                    items.append(("skip", line, "non-standard node arg"))
                    continue
                s_start = b_src.index('"')
                s_end = CljScanner(b_src)._string(s_start)
                if b_src[s_end:].strip() != ")":
                    items.append(("skip", line, "extra xt/q args"))
                    continue
                sql = re.sub(
                    r"\\(.)",
                    lambda mm: {"n": "\n", "t": "\t", "r": "\r"}.get(
                        mm.group(1), mm.group(1)),
                    b_src[s_start + 1:s_end - 1])
                expected = EdnVal(a_src).read()
                if not isinstance(expected, list) \
                        or not all(isinstance(r, dict) for r in expected):
                    items.append(("skip", line, "expected not row-maps"))
                    continue
                items.append(("assert", line, sql, expected))
            except Skip as e:
                items.append(("skip", line, str(e)))
            except Exception as e:
                items.append(("skip", line, f"{type(e).__name__}: {e}"))
        yield {"name": dm.group(1), "line": base_line, "items": items}
