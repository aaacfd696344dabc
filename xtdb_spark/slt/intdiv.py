"""Integer-division dialect rewrite for the SLT adapter.

The reference's `/` kernel on two integers is TRUNCATING integer
division (core expression.clj:1009-1012 — `[:/ :int :int]` compiles
to Clojure `quot`); SQLite agrees, and the SLT corpus's expected
results depend on intermediate truncation (`- col1 / col0 * 36`
truncates BEFORE the multiply). Spark's `/` is always double
division, so the adapter rewrites every infix `/` whose operands are
integers at RUNTIME into `DIV` (Spark's integral division, same
toward-zero truncation as quot):

    l / r  →  CASE WHEN typeof(l) ∈ ints AND typeof(r) ∈ ints
              THEN CAST(CAST(l AS BIGINT) DIV CAST(r AS BIGINT)
                        AS DOUBLE)
              ELSE (l) / (r) END

The runtime `typeof()` guard makes the rewrite type-agnostic at
rewrite time (the token rewriter can't know column types) while
keeping float/decimal division untouched. Division by zero yields
NULL under the adapter's non-ANSI session (SQLite semantics; the
reference itself THROWS there, expression.clj:1005 throw-div-0, and
budgets those as errors in its own SLT CI — NULL matches the
corpus's expectations strictly better).

Only the multiplicative precedence level needs real parsing (unary
± bind tighter, everything else looser), so the transformer is a
mini precedence climber over the rewriter's tokens: atoms are
literals / (dotted) identifiers / function calls / parenthesized
groups (recursed, so nested and subquery `/` get rewritten too) /
CASE…END blocks; any other keyword or operator delimits the chain.

This rewrite is an SLT-adapter behavior, not wired into xt.sql: the
driver's oracle gate cross-checks xt.sql results against DuckDB,
whose `/` is float division — flipping the default would fail every
int-division oracle even though the reference's own kernel
truncates. The module lives under slt/ to make that scoping visible.
"""

from __future__ import annotations

from xtdb_spark.sql.rewriter import _tokenize

_INTS = "('tinyint', 'smallint', 'int', 'bigint')"

# words that can never START an atom — they delimit expressions, so
# the chain parser returns to plain copying when it sees one
_STOP_WORDS = {
    "AND", "OR", "NOT", "IN", "IS", "BETWEEN", "LIKE", "ESCAPE",
    "SELECT", "FROM", "WHERE", "GROUP", "HAVING", "ORDER", "LIMIT",
    "OFFSET", "UNION", "INTERSECT", "EXCEPT", "AS", "ON", "JOIN",
    "WHEN", "THEN", "ELSE", "END", "BY", "ASC", "DESC", "NULLS",
    "VALUES", "SET", "DISTINCT", "ALL", "EXISTS", "CROSS", "INNER",
    "LEFT", "RIGHT", "FULL", "OUTER", "NATURAL", "USING",
}


def _fold_chain(head: str, steps: list[tuple[str, str, str]]) -> str:
    """Fold a multiplicative chain left-to-right, truncating at each
    `/` while the ALL-INT PREFIX holds (int-ness propagates through
    * / % exactly like the reference's per-step type dispatch:
    `a / b * c / d` truncates at both divisions iff every original
    operand is integral). The prefix condition tests the ORIGINAL
    operands' typeof, so the folded double intermediates don't mask
    int-ness. Exact while values stay inside double's 2^53 integer
    range. steps: (ws, op, operand-text)."""
    val = f"({head})"
    prefix = f"typeof({head}) IN {_INTS}"
    for ws, op, t in steps:
        t = t.strip()
        p2 = f"{prefix} AND typeof({t}) IN {_INTS}"
        if op == "/":
            val = (f"(CASE WHEN {p2} "
                   f"THEN CAST(CAST({val} AS BIGINT) DIV "
                   f"CAST({t} AS BIGINT) AS DOUBLE) "
                   f"ELSE ({val}) / ({t}) END)")
        else:
            val = f"(({val}) {op} ({t}))"
        prefix = p2
    return val


def _fold_static(head: str, steps: list[tuple[str, str, str]],
                 ints: list) -> str:
    """Fold a chain whose every operand's int-ness is STATICALLY
    known (round 11): `/` over an all-int-so-far prefix becomes bare
    `DIV` (result stays BIGINT — so ENCLOSING expressions see an
    integral type, which the runtime-typeof fallback's
    CAST-AS-DOUBLE could not provide: a division nested inside
    COALESCE/CASE/parens used to flip the outer division to float,
    the reference corpus's random/expr failures); anything else is
    plain float `/`. ints[0] is the head's int-ness, ints[1+] each
    step's."""
    val = f"({head})"
    running = ints[0]
    for (ws, op, t), ri in zip(steps, ints[1:]):
        t = t.strip()
        if op == "/" and running and ri:
            val = (f"(CAST({val} AS BIGINT) DIV "
                   f"CAST({t} AS BIGINT))")
        else:
            val = f"(({val}) {op} ({t}))"
        running = bool(running and ri)
    return val


# ---------------------------------------------------------------
# static int-ness analysis (round 11)
#
# SQLite's `/` truncates iff both RUNTIME values are integers. The
# SLT corpus declares every column's type in CREATE TABLE, so the
# runner can resolve int-ness STATICALLY for almost every
# expression; the runtime-typeof fallback (_fold_chain) remains for
# anything the analyzer can't resolve (unknown columns, unknown
# functions, subqueries).

_INT_CASTS = ("INT", "SIGNED")
_FLOAT_CASTS = ("REAL", "FLOA", "DOUB", "DEC", "NUMERIC")


class _Bail(Exception):
    """Structure the analyzer doesn't understand — int-ness None."""


def _comb(vals):
    """float contaminates (any False → False); else unknown
    propagates (any None → None); else DIVERGENT (a CASE whose
    branches differ — "div") propagates; else int."""
    if any(v is False for v in vals):
        return False
    if any(v is None for v in vals):
        return None
    if any(v == "div" for v in vals):
        return "div"
    return True


def _comb_nn(nns):
    """Nullability is TERNARY: True = definitely non-null, "null" =
    definitely NULL (a NULL literal, or an expression strictly over
    one), False = unknown. NULL is absorbing across arithmetic."""
    if any(n == "null" for n in nns):
        return "null"
    if all(n is True for n in nns):
        return True
    return False


def _comb_reachable(seen):
    """COALESCE typing over the REACHABLE argument int-nesses: any
    unknown poisons; otherwise a mix of int and float (or an
    explicit divergent member) is VALUE-dependent — the first
    non-null argument decides at runtime — so it marks "div" for
    the division-distribution rewrite (round 12; the plain _comb's
    float-contaminates rule mistyped `COALESCE(nullable_int, 2.5)`
    as float even when the int argument is the one that's non-null,
    ADVICE r11)."""
    if not seen:
        return True
    if any(v is None for v in seen):
        return None
    if any(v == "div" for v in seen):
        return "div"
    if any(v is True for v in seen) and any(v is False for v in seen):
        return "div"
    return seen[0] is True


class _IntnessParser:
    """Recursive-descent int-ness over the SLT expression grammar
    (additive > multiplicative > unary > primary; CASE / CAST /
    the sqllogictest generator's function set). `agg_nn` says
    whether a MIN/MAX/SUM over a non-null argument may be taken as
    definitely-non-null — only true when the enclosing query has no
    row filtering (a WHERE/JOIN can filter EVERY row, and a scalar
    aggregate over zero rows is NULL, ADVICE r11), restored under
    GROUP BY (visible groups are non-empty by construction)."""

    def __init__(self, toks, col_types, agg_nn=True):
        self.toks = [t for t in toks if t[0] not in ("ws", "comment")]
        self.i = 0
        self.ct = col_types or {}
        self.agg_nn = agg_nn

    def _peek(self, k=0):
        j = self.i + k
        return self.toks[j] if j < len(self.toks) else (None, "")

    def _next(self):
        t = self._peek()
        self.i += 1
        return t

    def parse(self):
        try:
            v, _ = self._additive()
        except _Bail:
            return None
        return v if self.i == len(self.toks) else None

    # every level returns (intness, definitely_non_null) — the
    # second flag drives COALESCE's DYNAMIC typing: SQLite's result
    # type is the FIRST reachable non-null argument's, so args past
    # a definitely-non-null one never contribute
    # (`COALESCE(65, AVG(x)) / 12` TRUNCATES — round-11 corpus fix)

    def _additive(self):
        vi, vn = self._mult()
        vals, nns = [vi], [vn]
        while self._peek() in (("punct", "+"), ("punct", "-")):
            self._next()
            xi, xn = self._mult()
            vals.append(xi)
            nns.append(xn)
        return _comb(vals), _comb_nn(nns)

    def _mult(self):
        # int-ness: * / % all keep int iff every operand int;
        # non-null survives * but not / or % (division by zero
        # yields NULL under the adapter session). The rewriter's own
        # emitted `DIV` (word) is also accepted so that re-analysis
        # of already-rewritten branch text — the distribution
        # rewrite's recursion — keeps its static typing: x DIV y is
        # integral REGARDLESS of the accumulated chain type.
        vi, vn = self._unary()
        vals, nns = [vi], [vn]
        while True:
            nk, nt = self._peek()
            if nk == "punct" and nt in "*/%":
                op = self._next()[1]
            elif nk == "word" and nt.upper() == "DIV":
                self._next()
                op = "DIV"
            else:
                break
            xi, xn = self._unary()
            if op == "DIV":
                nn = ("null" if "null" in (_comb_nn(nns), xn)
                      else False)
                vals, nns = [True], [nn]
                continue
            vals.append(xi)
            # division by zero yields NULL under the adapter session
            nns.append(xn if op == "*" else
                       ("null" if xn == "null" else False))
        return _comb(vals), _comb_nn(nns)

    def _unary(self):
        while self._peek() in (("punct", "+"), ("punct", "-")):
            self._next()
        return self._primary()

    def _skip_balanced(self):
        """Consume from an opening '(' through its match."""
        if self._peek() != ("punct", "("):
            raise _Bail
        depth = 0
        while self.i < len(self.toks):
            k, t = self._next()
            if k == "punct" and t == "(":
                depth += 1
            elif k == "punct" and t == ")":
                depth -= 1
                if depth == 0:
                    return
        raise _Bail

    def _case(self):
        """CASE … END: int-ness = combine of the THEN/ELSE result
        expressions (implicit ELSE NULL is int-neutral). Conditions
        and the comparand are skipped structurally (they may contain
        comparisons the expression grammar doesn't cover)."""
        self._next()                       # CASE
        results = []

        def skip_until(stops):
            # deep-skip to the next top-level stop keyword
            depth = 0
            while True:
                k, t = self._peek()
                if k is None:
                    raise _Bail
                up = t.upper() if k == "word" else ""
                if k == "punct" and t == "(":
                    self._skip_balanced()
                    continue
                if up == "CASE":
                    self._next()
                    skip_until(("END",))
                    self._next()           # nested END
                    continue
                if depth == 0 and up in stops:
                    return up
                self._next()

        if self._peek()[1].upper() != "WHEN":
            skip_until(("WHEN",))          # simple-CASE comparand
        while True:
            kw = self._peek()[1].upper()
            if kw == "WHEN":
                self._next()
                skip_until(("THEN",))
                self._next()               # THEN
                results.append(self._additive()[0])
                continue
            if kw == "ELSE":
                self._next()
                results.append(self._additive()[0])
                continue
            if kw == "END":
                self._next()
                # nullability of a CASE is data-dependent — never
                # claim definitely-non-null
                v = _comb(results) if results else True
                if (v is False and any(r is True for r in results)
                        and not any(r is None for r in results)):
                    # branches DIVERGE (some int, some float, none
                    # unknown): the runtime-taken branch decides —
                    # mark for the division-distribution rewrite
                    v = "div"
                return v, False
            raise _Bail

    def _func_args(self):
        """Parse '(' arg [, arg]* ')' → list of (int-ness, non-null)
        pairs (leading DISTINCT/ALL stripped; '*' → int)."""
        self._next()                       # (
        vals = []
        if self._peek() == ("punct", ")"):
            self._next()
            return vals
        while True:
            if self._peek()[1].upper() in ("DISTINCT", "ALL"):
                self._next()
            if self._peek() == ("punct", "*"):
                self._next()
                vals.append((True, True))
            else:
                vals.append(self._additive())
            k, t = self._next()
            if (k, t) == ("punct", ")"):
                return vals
            if (k, t) != ("punct", ","):
                raise _Bail

    def _primary(self):
        k, t = self._peek()
        if k == "num":
            self._next()
            return ("." not in t and "e" not in t.lower()), True
        if k == "str":
            self._next()
            return False, True
        if k == "punct" and t == "(":
            if self._peek(1)[1].upper() == "SELECT":
                self._skip_balanced()
                return None, False         # scalar subquery: unknown
            self._next()
            v = self._additive()
            if self._next() != ("punct", ")"):
                raise _Bail
            return v
        if k not in ("word", "qident"):
            raise _Bail
        up = t.upper()
        if up == "NULL":
            self._next()
            return True, "null"            # NULL / x is NULL either way
        if up == "CASE":
            return self._case()
        if up == "CAST" and self._peek(1) == ("punct", "("):
            self._next()                   # CAST
            self._next()                   # (
            _, inner_nn = self._additive()
            if self._peek()[1].upper() != "AS":
                raise _Bail
            self._next()
            ty = []
            depth = 0
            while True:
                kk, tt = self._next()
                if kk is None:
                    raise _Bail
                if kk == "punct" and tt == "(":
                    depth += 1
                elif kk == "punct" and tt == ")":
                    if depth == 0:
                        break
                    depth -= 1
                ty.append(tt.upper())
            ts = " ".join(ty)
            if any(x in ts for x in _FLOAT_CASTS):
                return False, inner_nn
            if any(x in ts for x in _INT_CASTS):
                return True, inner_nn
            return False, inner_nn         # TEXT/CHAR/BLOB/…
        if self._peek(1) == ("punct", "("):
            fn = up
            self._next()
            if fn == "COUNT":
                self._skip_balanced()
                return True, True
            if fn in ("AVG", "TOTAL", "ROUND"):
                # float-valued; AVG/TOTAL over a definitely-NULL arg
                # is definitely NULL (common generator shape
                # `AVG(CAST(NULL AS INTEGER))`)
                if fn == "ROUND":
                    self._skip_balanced()
                    return False, False
                args = self._func_args() or [(None, False)]
                nn = args[0][1]
                return False, ("null" if nn == "null" else False)
            if fn in ("RANDOM", "LENGTH", "INSTR"):
                self._skip_balanced()
                return True, False
            if fn in ("MIN", "MAX", "SUM", "ABS"):
                # nullability follows the argument — but a scalar
                # AGGREGATE over a filtered-empty input is NULL even
                # for a non-null argument, so the aggregates only
                # claim non-null when the query has no row filtering
                # (self.agg_nn; ABS is a plain scalar fn — always
                # follows its arg). Over a NULL literal the result
                # IS NULL either way (COALESCE then skips it).
                args = self._func_args() or [(None, False)]
                nn = args[0][1]
                if fn != "ABS" and not self.agg_nn and nn is True:
                    nn = False
                return _comb([a[0] for a in args]), \
                    (nn if nn in (True, "null") else False)
            if fn == "NULLIF":
                # NULLIF(a, NULL): a = NULL is never TRUE → always a
                args = self._func_args()
                if not args:
                    return None, False
                a = args[0]
                if len(args) > 1 and args[1][1] == "null":
                    return a
                return a[0], False
            if fn in ("COALESCE", "IFNULL"):
                # DYNAMIC typing: SQLite's COALESCE takes the type of
                # the first non-null VALUE, so int-ness combines only
                # the args up to (and including) the first
                # definitely-non-null one — later args are
                # unreachable (`COALESCE(65, AVG(x))` is INT). When
                # the reachable args MIX int and float, the runtime
                # value decides — _comb_reachable marks "div" and the
                # distribution rewrite converts the COALESCE to CASE
                # form (round 12, ADVICE r11).
                args = self._func_args() or [(None, False)]
                seen = []
                for ai, an in args:
                    if an == "null":
                        continue           # definitely-NULL arg is
                        #                    never the result
                    seen.append(ai)
                    if an is True:
                        # a definitely-non-null arg was reached, so
                        # the VALUE is non-null whatever its type
                        return _comb_reachable(seen), True
                if not seen:
                    return True, "null"    # COALESCE of all NULLs
                return _comb_reachable(seen), False
            self._skip_balanced()
            return None, False             # unknown function
        # (dotted) column reference — type from the declared schema
        self._next()
        name = t
        while self._peek() == ("punct", ".") \
                and self._peek(1)[0] in ("word", "qident"):
            self._next()
            name = self._next()[1]
        ct = self.ct.get(name.strip('"').lower())
        if ct == "int":
            return True, False
        if ct in ("float", "text"):
            return False, False
        return None, False


def _intness(toks, col_types, agg_nn=True):
    return _IntnessParser(toks, col_types, agg_nn).parse()


def _case_parts(toks):
    """Structure of a PURE CASE atom (optional unary ± prefixes, one
    CASE…END, nothing after): (negate, comparand_toks|None,
    [(cond_toks, result_toks)…], else_toks|None), or None when the
    slice isn't that shape. Used by the division-distribution
    rewrite for branch-DIVERGENT int-ness."""
    neg = False
    i, n = 0, len(toks)

    def skip_ws(j):
        while j < n and toks[j][0] in ("ws", "comment"):
            j += 1
        return j

    i = skip_ws(i)
    while i < n and toks[i] in (("punct", "+"), ("punct", "-")):
        if toks[i][1] == "-":
            neg = not neg
        i = skip_ws(i + 1)
    if i >= n or toks[i][0] != "word" or toks[i][1].upper() != "CASE":
        return None
    i += 1
    depth = 0          # parens/brackets + NESTED case
    segs: list = []    # (kind, tok_list) kind ∈ comparand/cond/res/else
    cur: list = []
    kind = "comparand"
    end_at = None
    while i < n:
        k, t = toks[i]
        up = t.upper() if k == "word" else ""
        if k == "punct" and t in ("(", "["):
            depth += 1
        elif k == "punct" and t in (")", "]"):
            depth -= 1
        elif up == "CASE":
            depth += 1
        elif depth == 0 and up in ("WHEN", "THEN", "ELSE", "END"):
            segs.append((kind, cur))
            cur = []
            if up == "END":
                end_at = i + 1
                break
            kind = {"WHEN": "cond", "THEN": "res", "ELSE": "else"}[up]
            i += 1
            continue
        elif up == "END":
            depth -= 1
        cur.append(toks[i])
        i += 1
    if end_at is None:
        return None
    j = skip_ws(end_at)
    if j < n:
        return None                    # trailing tokens — not pure
    comparand = segs[0][1] if segs and segs[0][0] == "comparand" else None
    arms, els = [], None
    pend_cond = None
    for kind2, body in (segs[1:] if segs and segs[0][0] == "comparand"
                        else segs):
        if kind2 == "cond":
            pend_cond = body
        elif kind2 == "res":
            if pend_cond is None:
                return None
            arms.append((pend_cond, body))
            pend_cond = None
        elif kind2 == "else":
            els = body
    if not arms:
        return None
    return neg, comparand, arms, els


def _strip_parens(toks):
    """Drop redundant whole-expression parens (keeping any unary ±
    prefixes, which may stack across levels): `-((CASE … END))` →
    `- CASE … END` tokens — so _case_parts/_case_normal see the atom
    itself. The distribution recursion always parenthesizes the
    substituted branch, so this runs on every recursion level."""
    while True:
        n = len(toks)
        i = 0
        pref = []
        while i < n and (toks[i][0] in ("ws", "comment")
                         or toks[i] in (("punct", "+"), ("punct", "-"))):
            if toks[i][0] not in ("ws", "comment"):
                pref.append(toks[i])
            i += 1
        if i >= n or toks[i] != ("punct", "("):
            return toks
        depth = 0
        close = None
        for j in range(i, n):
            k, t = toks[j]
            if k == "punct" and t == "(":
                depth += 1
            elif k == "punct" and t == ")":
                depth -= 1
                if depth == 0:
                    close = j
                    break
        if close is None:
            return toks
        tail = close + 1
        while tail < n and toks[tail][0] in ("ws", "comment"):
            tail += 1
        if tail < n:                  # tokens after the close paren
            return toks
        toks = pref + toks[i + 1:close]


def _case_normal(toks):
    """Equivalent pure-CASE token list for a NULLIF / COALESCE /
    IFNULL atom (optionally ±-prefixed), or None. Used when the
    divergent operand of a division chain isn't a literal CASE —
    SQLite's value-dependent typing routes through these too:

        NULLIF(a, b)       ≡ CASE WHEN (a) = (b) THEN NULL
                                  ELSE (a) END
        COALESCE(a, rest…) ≡ CASE WHEN (a) IS NOT NULL THEN (a)
                                  ELSE COALESCE(rest…) END

    Argument `a` is duplicated into the condition — safe, SLT
    expressions are pure (no side effects; a doubled aggregate is
    just computed twice)."""
    n = len(toks)

    def skip(j):
        while j < n and toks[j][0] in ("ws", "comment"):
            j += 1
        return j

    i = skip(0)
    pref = ""
    while i < n and toks[i] in (("punct", "+"), ("punct", "-")):
        pref += toks[i][1]
        i = skip(i + 1)
    if i >= n or toks[i][0] != "word":
        return None
    fn = toks[i][1].upper()
    if fn not in ("NULLIF", "COALESCE", "IFNULL"):
        return None
    i = skip(i + 1)
    if i >= n or toks[i] != ("punct", "("):
        return None
    depth = 0
    j = i
    args, cur = [], []
    while j < n:
        k, t = toks[j]
        if k == "punct" and t == "(":
            depth += 1
            if depth == 1:
                j += 1
                continue
        elif k == "punct" and t == ")":
            depth -= 1
            if depth == 0:
                j += 1
                break
        elif k == "punct" and t == "," and depth == 1:
            args.append(cur)
            cur = []
            j += 1
            continue
        cur.append(toks[j])
        j += 1
    if depth != 0 or skip(j) < n:      # unbalanced / trailing tokens
        return None
    args.append(cur)
    ts = ["".join(t for _, t in a).strip() for a in args]
    if any(not t for t in ts):
        return None
    if fn == "NULLIF":
        if len(ts) != 2:
            return None
        text = (f"CASE WHEN ({ts[0]}) = ({ts[1]}) THEN NULL "
                f"ELSE ({ts[0]}) END")
    else:
        if len(ts) < 2:
            return None
        rest = (f"COALESCE({', '.join(ts[1:])})" if len(ts) > 2
                else f"({ts[1]})")
        text = (f"CASE WHEN ({ts[0]}) IS NOT NULL THEN ({ts[0]}) "
                f"ELSE {rest} END")
    return _tokenize((pref + " " + text) if pref else text)


class _DivRewriter:
    def __init__(self, toks, col_types=None, agg_nn=True):
        self.toks = toks
        self.ct = col_types
        self.agg_nn = agg_nn
        self.i = 0

    def _ws(self) -> str:
        parts = []
        while self.i < len(self.toks) and \
                self.toks[self.i][0] in ("ws", "comment"):
            parts.append(self.toks[self.i][1])
            self.i += 1
        return "".join(parts)

    def _peek(self):
        j = self.i
        while j < len(self.toks) and self.toks[j][0] in ("ws", "comment"):
            j += 1
        return self.toks[j] if j < len(self.toks) else (None, "")

    def _balanced(self, opener="(", closer=")") -> str:
        """Copy a balanced paren group, transforming its CONTENT
        recursively (arguments / subqueries may contain `/`)."""
        out = [self.toks[self.i][1]]          # the opener
        self.i += 1
        depth = 1
        inner = []
        while self.i < len(self.toks):
            k, t = self.toks[self.i]
            if k == "punct" and t == opener:
                depth += 1
            elif k == "punct" and t == closer:
                depth -= 1
                if depth == 0:
                    self.i += 1
                    break
            inner.append(self.toks[self.i])
            self.i += 1
        out.append(_DivRewriter(inner, self.ct, self.agg_nn).run())
        out.append(closer)
        return "".join(out)

    def _case_block(self) -> str:
        """CASE … END copied with the body transformed (WHEN/THEN
        arms are full expressions)."""
        out = [self.toks[self.i][1]]          # CASE
        self.i += 1
        depth = 1
        inner = []
        while self.i < len(self.toks):
            k, t = self.toks[self.i]
            if k == "word" and t.upper() == "CASE":
                depth += 1
            elif k == "word" and t.upper() == "END":
                depth -= 1
                if depth == 0:
                    self.i += 1
                    break
            inner.append(self.toks[self.i])
            self.i += 1
        out.append(_DivRewriter(inner, self.ct, self.agg_nn).run())
        out.append(" END")
        return "".join(out)

    def _atom(self) -> str | None:
        """One unary-prefixed primary, or None if the next token
        can't start one."""
        parts = [self._ws()]
        # unary prefixes (bind tighter than /, so they belong to the
        # operand)
        while True:
            k, t = (self.toks[self.i] if self.i < len(self.toks)
                    else (None, ""))
            if k == "punct" and t in ("+", "-"):
                parts.append(t)
                self.i += 1
                parts.append(self._ws())
                continue
            break
        if self.i >= len(self.toks):
            return None
        k, t = self.toks[self.i]
        if k == "word" and t.upper() in _STOP_WORDS:
            return None
        if k == "word" and t.upper() == "CASE":
            parts.append(self._case_block())
            return "".join(parts)
        if k == "punct" and t == "(":
            parts.append(self._balanced())
            return "".join(parts)
        if k in ("word", "qident"):
            # identifier chain a.b.c, or function call f( … )
            parts.append(t)
            self.i += 1
            while True:
                nk, nt = (self.toks[self.i] if self.i < len(self.toks)
                          else (None, ""))
                if nk == "punct" and nt == ".":
                    parts.append(nt)
                    self.i += 1
                    if self.i < len(self.toks) and \
                            self.toks[self.i][0] in ("word", "qident",
                                                     "punct"):
                        parts.append(self.toks[self.i][1])
                        self.i += 1
                    continue
                break
            if self._peek() == ("punct", "("):
                parts.append(self._ws())
                parts.append(self._balanced())
            return "".join(parts)
        if k in ("num", "str", "number", "string"):
            parts.append(t)
            self.i += 1
            return "".join(parts)
        return None

    def _mult_chain(self) -> str | None:
        i0 = self.i
        head = self._atom()
        if head is None:
            return None
        ints = [_intness(self.toks[i0:self.i], self.ct, self.agg_nn)]
        slices = [(i0, self.i)]
        steps: list[tuple[str, str, str]] = []
        while True:
            save = self.i
            ws = self._ws()
            k, t = (self.toks[self.i] if self.i < len(self.toks)
                    else (None, ""))
            if k == "punct" and t in ("*", "/", "%"):
                # `*` can also be SELECT-star / COUNT(*) — then no
                # operand follows and we backtrack
                self.i += 1
                r0 = self.i
                right = self._atom()
                if right is None:
                    self.i = save
                    break
                ints.append(_intness(self.toks[r0:self.i], self.ct, self.agg_nn))
                slices.append((r0, self.i))
                steps.append((ws, t, right))
                continue
            self.i = save
            break
        if not any(op == "/" for _, op, _ in steps) or not head.strip():
            # untouched chains keep their original spelling (and
            # their original Spark types)
            return head + "".join(f"{ws}{op}{r}" for ws, op, r in steps)
        if all(v in (True, False) for v in ints):
            # every operand's int-ness resolved statically — emit
            # bare DIV (stays BIGINT, so ENCLOSING divisions still
            # see an integral operand) or plain float `/`
            return _fold_static(head.strip(), steps, ints)
        div_idx = [j for j, v in enumerate(ints) if v == "div"]
        if len(div_idx) == 1 and all(
                v in (True, False) for j, v in enumerate(ints)
                if j != div_idx[0]):
            out = self._distribute_case(head, steps, ints, slices,
                                        div_idx[0])
            if out is not None:
                return out
        return _fold_chain(head.strip(), steps)

    def _distribute_case(self, head, steps, ints, slices, k):
        """One operand's branches have DIVERGENT int-ness — SQLite
        types the division by the branch the runtime TAKES, which a
        single statically-typed Spark expression cannot express.
        Rewrite by DISTRIBUTING the whole multiplicative chain into
        the branches, folding each branch with ITS result's static
        int-ness:
            14 / CASE c WHEN w THEN avg(x) ELSE 29 END
          → CASE c WHEN w THEN 14 / avg(x) ELSE 14 DIV 29 END
        (the last random/expr failure class, round 11). Round 12
        extends it two ways (ADVICE r11 / the 4 residual failures):
        a divergent NULLIF/COALESCE/IFNULL atom is first converted
        to its equivalent pure-CASE form (_case_normal), and a
        branch that is ITSELF divergent recurses — the substituted
        chain re-enters the rewriter, peeling one CASE/function node
        per level. Returns None when the divergent atom can't be
        normalized — caller falls back to the runtime guard."""
        toks_k = _strip_parens(self.toks[slices[k][0]:slices[k][1]])
        parts = _case_parts(toks_k)
        if parts is None:
            cn = _case_normal(toks_k)
            parts = _case_parts(cn) if cn is not None else None
        if parts is None:
            return None
        neg, comparand, arms, els = parts
        branch_srcs = [r for _, r in arms] + [els]
        branches = []
        for res in branch_srcs:
            if res is None:            # implicit ELSE NULL
                branches.append(("NULL", True))
                continue
            ri = _intness(res, self.ct, self.agg_nn)
            if ri is None:
                return None            # unknown — runtime guard
            if ri == "div":
                # keep the ORIGINAL text: the recursion re-analyzes
                # and re-distributes it inside the substituted chain
                rtext = "".join(t for _, t in res).strip()
            else:
                rtext = _DivRewriter(list(res), self.ct,
                                     self.agg_nn).run().strip()
            if not rtext:
                return None
            branches.append((rtext, ri))

        texts = [head.strip()] + [r.strip() for _, _, r in steps]

        def fold_with(btext, bint):
            t2 = list(texts)
            t2[k] = f"- ({btext})" if neg else f"({btext})"
            if bint != "div":
                i2 = list(ints)
                i2[k] = bint
                steps2 = [(ws, op, t2[j + 1])
                          for j, (ws, op, _) in enumerate(steps)]
                return _fold_static(t2[0], steps2, i2)
            # nested divergence: re-enter the rewriter on the
            # substituted chain (terminates — each level peels one
            # CASE / NULLIF / COALESCE node off the operand)
            expr = t2[0] + "".join(
                f" {op} {t2[j + 1]}"
                for j, (_, op, _) in enumerate(steps))
            return _DivRewriter(_tokenize(expr), self.ct,
                                self.agg_nn).run().strip()

        comp = ("" if not comparand else
                " " + _DivRewriter(list(comparand), self.ct,
                                   self.agg_nn).run().strip())
        out = ["CASE" + comp]
        for (cond, _), (btext, bint) in zip(arms, branches):
            ctext = _DivRewriter(list(cond), self.ct,
                                 self.agg_nn).run().strip()
            out.append(f" WHEN {ctext} THEN {fold_with(btext, bint)}")
        btext, bint = branches[-1]
        out.append(f" ELSE {fold_with(btext, bint)} END")
        return "(" + "".join(out) + ")"

    def run(self) -> str:
        out = []
        while self.i < len(self.toks):
            k, t = self.toks[self.i]
            if k in ("ws", "comment") or \
                    (k == "word" and t.upper() in _STOP_WORDS):
                out.append(t)
                self.i += 1
                continue
            chain = self._mult_chain()
            if chain is None:
                out.append(t)
                self.i += 1
                continue
            out.append(chain)
            # additive level: a following +/- is BINARY here (an
            # operand was just emitted) — consume the operator and
            # the next multiplicative chain, else the chain parser
            # would re-read the +/- as the next atom's unary prefix
            # and silently drop the addition
            while True:
                save = self.i
                ws = self._ws()
                nk, nt = (self.toks[self.i] if self.i < len(self.toks)
                          else (None, ""))
                if nk == "punct" and nt in ("+", "-"):
                    self.i += 1
                    nxt = self._mult_chain()
                    if nxt is None:
                        self.i = save
                        break
                    out.append(ws + nt + nxt)
                    continue
                self.i = save
                break
        return "".join(out)


def rewrite_int_div(sql: str, col_types: dict | None = None) -> str:
    """Rewrite infix `/` to integral division where both operands
    are integers (see module docstring). `col_types` maps lowercase
    column name → 'int' | 'float' | 'text' (the SLT runner builds it
    from the scripts' CREATE TABLE declarations); with it, int-ness
    resolves statically and the emitted DIV keeps its BIGINT type —
    required for divisions NESTED inside COALESCE/CASE/parens of an
    outer division. Without it (or for unresolvable operands) the
    runtime-typeof guard applies. No-op when the query has no
    `/`."""
    if "/" not in sql:
        return sql
    toks = _tokenize(sql)
    # a WHERE/JOIN can filter EVERY row, making a scalar aggregate
    # NULL even over a non-null argument — so aggregate
    # non-null-ness is only claimed for unfiltered queries (GROUP BY
    # restores it: visible groups are non-empty by construction).
    # ADVICE r11.
    words = {t.upper() for k, t in toks if k == "word"}
    agg_nn = not ({"WHERE", "JOIN"} & words) or "GROUP" in words
    return _DivRewriter(toks, col_types, agg_nn).run()
