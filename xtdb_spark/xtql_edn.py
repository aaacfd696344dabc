"""XTQL serialized-form parser: EDN pipelines → DataFrames.

The reference's PRIMARY serialized query form is edn — Clojure data
read off the wire and parsed into query records (reference
core/src/main/clojure/xtdb/xtql.clj:293-593: `(-> (from :docs [...])
(where ...) (limit N))` threading forms, symbols as logic vars,
keywords as tables/options, `#inst` temporal literals). The JSON form
(`xtdb_spark/xtql_json.py`) mirrors the same vocabulary; this module
adds the edn side with a self-contained reader (no Clojure dep):

- reader: lists `()`, vectors `[]`, maps `{}`, sets `#{}`, symbols,
  keywords (incl. namespaced `:xt/id`), strings, numbers, booleans,
  nil, `#inst`/`#uuid` tagged literals, `;` comments, `#_` discard.
- translator: edn AST → the JSON vocabulary, then delegates to
  `xtql_json.parse` — one compiler, two wire forms, exactly like the
  reference (both its edn and JSON readers produce the same records).

Vocabulary notes:

- `(-> source tails…)` is the pipeline form; a bare `(from …)` is a
  one-step pipeline.
- symbols are logic vars → column references; STRING literals stay
  literals (the JSON form needs `{"lit": …}` for that; the edn form
  gets it for free from the symbol/string distinction).
- the `xt` namespace maps to the engine's system columns:
  `xt/id` → `_id`, `xt/valid-from` → `_valid_from`, … (reference
  spells them `:xt/id` etc. in edn and `_id` in SQL).
- `(row-count)` is the reference's spelling of `count(*)`.

Example::

    (-> (from :orders [o_custkey {:o_totalprice price}])
        (where (> price 100.0))
        (aggregate o_custkey {:n (row-count)} {:total (sum price)})
        (order-by {:val n, :dir :desc} o_custkey)
        (limit 5))
"""

from __future__ import annotations

from typing import Any

from xtdb_spark import xtql_json

# ------------------------------------------------------------ reader


class Symbol(str):
    """An edn symbol (logic var / operator name)."""
    __slots__ = ()


class Keyword(str):
    """An edn keyword, stored without the leading ':'."""
    __slots__ = ()


_DELIMS = set('()[]{}"; \t\n\r,')


class _Reader:
    def __init__(self, text: str):
        self.text = text
        self.i = 0

    def _peek(self):
        return self.text[self.i] if self.i < len(self.text) else ""

    def _skip_ws(self):
        while self.i < len(self.text):
            c = self.text[self.i]
            if c in " \t\n\r,":
                self.i += 1
            elif c == ";":
                while self.i < len(self.text) and self.text[self.i] != "\n":
                    self.i += 1
            else:
                return

    def read(self) -> Any:
        self._skip_ws()
        if self.i >= len(self.text):
            raise ValueError("unexpected end of edn input")
        c = self.text[self.i]
        if c == "(":
            return self._seq(")", tuple)
        if c == "[":
            return self._seq("]", list)
        if c == "{":
            return self._map()
        if c == '"':
            return self._string()
        if c == "#":
            return self._dispatch()
        if c in ")]}":
            raise ValueError(f"unmatched {c!r} at {self.i}")
        return self._atom()

    def _seq(self, close: str, ctor):
        self.i += 1  # open
        out = []
        while True:
            self._skip_ws()
            if self._peek() == close:
                self.i += 1
                return ctor(out)
            if self.i >= len(self.text):
                raise ValueError(f"missing {close!r}")
            out.append(self.read())

    def _map(self) -> dict:
        items = self._seq("}", list)
        # self.i already advanced past '}' via _seq on '{'
        if len(items) % 2:
            raise ValueError("edn map needs an even number of forms")
        return {items[k]: items[k + 1] for k in range(0, len(items), 2)}

    def _string(self) -> str:
        self.i += 1
        out = []
        while True:
            if self.i >= len(self.text):
                raise ValueError("unterminated string")
            c = self.text[self.i]
            self.i += 1
            if c == '"':
                return "".join(out)
            if c == "\\":
                e = self.text[self.i]
                self.i += 1
                out.append({"n": "\n", "t": "\t", "r": "\r",
                            '"': '"', "\\": "\\"}.get(e, e))
            else:
                out.append(c)

    def _dispatch(self):
        self.i += 1  # '#'
        c = self._peek()
        if c == "{":  # set literal → python list (order kept)
            return self._set()
        if c == "_":  # discard next form
            self.i += 1
            self.read()
            return self.read()
        # tagged literal: #inst "...", #uuid "..."
        tag = self._symbol_text()
        value = self.read()
        if tag in ("inst", "uuid") or tag.startswith("xt/"):
            # #inst/#uuid and the reference's #xt/date, #xt/zdt,
            # #xt/zone … printer tags (reference time literals,
            # serde): keep the string payload — callers normalize
            return value
        raise ValueError(f"unknown edn tag #{tag}")

    def _set(self):
        items = self._seq("}", list)
        return items

    def _symbol_text(self) -> str:
        start = self.i
        while self.i < len(self.text) and self.text[self.i] not in _DELIMS:
            self.i += 1
        return self.text[start:self.i]

    def _atom(self):
        tok = self._symbol_text()
        if tok == "nil":
            return None
        if tok == "true":
            return True
        if tok == "false":
            return False
        if tok.startswith(":"):
            return Keyword(tok[1:])
        try:
            return int(tok)
        except ValueError:
            pass
        try:
            return float(tok)
        except ValueError:
            pass
        return Symbol(tok)


def read_edn(text: str) -> Any:
    """Read ONE edn form from text."""
    r = _Reader(text)
    form = r.read()
    r._skip_ws()
    if r.i < len(r.text):
        raise ValueError(f"trailing edn input at {r.i}")
    return form


# -------------------------------------------------------- translator

_XT_COLS = {"id": "_id", "valid-from": "_valid_from",
            "valid-to": "_valid_to", "system-from": "_system_from",
            "system-to": "_system_to", "iid": "_iid"}


def _name(s: str) -> str:
    """Symbol/keyword text → engine column name (`xt/id` → `_id`)."""
    if s.startswith("xt/"):
        tail = s[3:]
        if tail in _XT_COLS:
            return _XT_COLS[tail]
        return "_" + tail.replace("-", "_")
    return s


def _tx_expr(e: Any) -> Any:
    """edn expression → JSON-vocabulary expression."""
    if isinstance(e, Symbol):
        return _name(str(e))
    if isinstance(e, Keyword):
        return _name(str(e))
    if isinstance(e, str):
        return {"lit": e}  # string literal, NOT a var
    if isinstance(e, tuple):
        if not e:
            raise ValueError("empty call form")
        op, *args = e
        op = str(op)
        if op == "row-count":
            return ["count"]
        if op in ("exists?", "pull", "pull*"):
            # subquery expressions over an fn closure (reference
            # xtql.clj Exists/Pull/PullMany): `(pull (fn [args]
            # <query>))` — the fn params are the correlation vars
            (fn_form,) = args
            if not (isinstance(fn_form, tuple) and fn_form
                    and str(fn_form[0]) == "fn"):
                raise ValueError(f"{op} requires an (fn [vars] query)")
            params = [_name(str(s)) for s in fn_form[1]]
            body = to_json_form(fn_form[2])
            tag = "exists" if op == "exists?" else op
            return [tag, body, params]
        return [op] + [_tx_expr(a) for a in args]
    if isinstance(e, list):
        return [_tx_expr(a) for a in e]
    return e  # numbers / bools / None pass through


def _attr(s: str) -> str:
    """Attribute keyword → stored column name: the reference
    normalizes kebab-case keywords to snake_case columns
    (`:customer-id` ⇄ `customer_id`, types.clj ->col-sym /
    normalForm)."""
    return _name(s).replace("-", "_")


def _tx_bind(b: Any) -> Any:
    """bind spec: sym | {:attr var} → "col" | {"col": "var"}. A bare
    kebab symbol binds the snake_case COLUMN to the kebab VAR
    (`first-name` ≡ {:first-name first-name})."""
    if isinstance(b, Symbol):
        v = _name(str(b))
        a = _attr(str(b))
        return {a: v} if a != v else v
    if isinstance(b, dict):
        # a non-Symbol value is a LITERAL bind — an equality
        # constraint on the attr (reference `{:xt/id "ivan"}`),
        # not a rename
        return {_attr(str(k)): (_name(str(v)) if isinstance(v, Symbol)
                                else {"lit": v})
                for k, v in b.items()}
    raise ValueError(f"malformed bind spec {b!r}")


def _tx_temporal(spec: Any) -> Any:
    if isinstance(spec, Keyword) and str(spec) == "all-time":
        return "all-time"
    if isinstance(spec, tuple) and len(spec) == 2 and str(spec[0]) == "at":
        return ["at", spec[1]]
    raise ValueError(f"malformed temporal spec {spec!r}")


def _tx_from_args(args: tuple) -> list:
    out = []
    opts = {}
    for a in args:
        if isinstance(a, list):
            out.append([_tx_bind(b) for b in a])
        elif isinstance(a, dict):
            for k, v in a.items():
                key = str(k)
                if key == "bind":
                    out.append([_tx_bind(b) for b in v])
                elif key in ("for-valid-time", "for-system-time"):
                    opts[key] = _tx_temporal(v)
                else:
                    raise ValueError(f"unknown from option {key!r}")
        else:
            raise ValueError(f"malformed from arg {a!r}")
    if opts:
        out.append(opts)
    return out


def _tx_source(form: tuple) -> list:
    op, *args = form
    op = str(op)
    if op == "from":
        table = _name(str(args[0]))
        return ["from", table] + _tx_from_args(tuple(args[1:]))
    if op == "rel":
        rows = [{_name(str(k)): v for k, v in row.items()}
                for row in args[0]]
        return ["rel", rows]
    if op == "unify":
        # unify takes CLAUSES (reference xtql.clj Unify): sources
        # (from/rel/unify) plus where/with/join/left-join/unnest
        # logic clauses — the latter lower as tails over the unified
        # sources
        out: list = ["unify"]
        for a in args:
            if isinstance(a, tuple) and a and \
                    str(a[0]) in ("from", "rel", "unify"):
                out.append(_tx_source(a))
            else:
                out.append(_tx_tail(a))
        return out
    raise ValueError(f"unknown source op {op!r}")


def _tx_order_spec(a: Any) -> Any:
    if isinstance(a, Symbol):
        return _name(str(a))
    if isinstance(a, dict):
        col = _name(str(a[Keyword("val")]))
        direction = str(a.get(Keyword("dir"), Keyword("asc")))
        return [col, direction]
    raise ValueError(f"malformed order-by spec {a!r}")


def _tx_tail(form: tuple) -> list:
    op, *args = form
    op = str(op)
    if op == "where":
        return ["where"] + [_tx_expr(a) for a in args]
    if op in ("with", "return", "aggregate"):
        out = [op]
        if op == "aggregate":
            group = [_name(str(a)) for a in args if isinstance(a, Symbol)]
            out.append(group)
            args = [a for a in args if not isinstance(a, Symbol)]
        for a in args:
            if isinstance(a, dict):
                out.append({_name(str(k)): _tx_expr(v)
                            for k, v in a.items()})
            elif isinstance(a, Symbol):
                out.append(_name(str(a)))
            else:
                raise ValueError(f"malformed {op} arg {a!r}")
        return out
    if op == "without":
        return ["without"] + [_name(str(a)) for a in args]
    if op == "order-by":
        return ["order-by"] + [_tx_order_spec(a) for a in args]
    if op in ("limit", "offset"):
        return [op, args[0]]
    if op == "unnest":
        (spec,) = args
        return ["unnest", {_name(str(k)): _name(str(v))
                           for k, v in spec.items()}]
    if op == "union-all":
        return ["union-all", _tx_source(args[0])]
    if op in ("join", "left-join"):
        out = [op, _tx_source(args[0])]
        if len(args) > 1 and isinstance(args[1], dict):
            opts = {str(k): [_name(str(c)) for c in v]
                    for k, v in args[1].items()}
            out.append(opts)
        elif len(args) > 1 and isinstance(args[1], list):
            # `(left-join <query> [vars…])` — the clause's out-bind
            # spec (reference xtql.clj Join/LeftJoin binding): the
            # vars the joined query contributes; join keys are the
            # shared logic vars, unify-style
            out.append({"bind": [_name(str(c)) for c in args[1]]})
        return out
    raise ValueError(f"unknown tail op {op!r}")


def to_json_form(query: str | Any) -> list:
    """edn text (or pre-read AST) → the JSON-vocabulary array form."""
    form = read_edn(query) if isinstance(query, str) else query
    if not isinstance(form, tuple) or not form:
        raise ValueError("XTQL edn query must be a non-empty list form")
    if str(form[0]) == "->":
        source, *tails = form[1:]
        return ["pipeline", _tx_source(source)] + [_tx_tail(t)
                                                   for t in tails]
    return _tx_source(form)


def parse(query: str | Any):
    """Serialized edn XTQL → DSL steps (shared with the JSON form)."""
    return xtql_json.parse(to_json_form(query))


def run(xt, query: str | Any):
    """Parse + execute an edn XTQL query against a session."""
    return xtql_json.run(xt, to_json_form(query))
