"""Decorrelation of scalar/quantified subqueries in JOIN ... ON.

The reference plans subqueries anywhere in a join condition through
its apply operator + decorrelation rules (reference
core/src/main/clojure/xtdb/logical_plan.clj:991-1210, rules 1-9);
Spark's analyzer categorically rejects subquery expressions in a
join condition (UNSUPPORTED_SUBQUERY_EXPRESSION_CATEGORY.
UNSUPPORTED_CORRELATED_SCALAR_SUBQUERY) — but accepts the very same
expressions, correlated to BOTH join sides, in a WHERE clause or a
projection (verified empirically on Spark 4.1: non-aggregated
correlated scalars, multiple subqueries per predicate, IN/EXISTS,
NOT, correlation-only-over-outer-columns all analyze fine in WHERE).

So the dialect-layer rewrite moves the join condition INTO a WHERE,
via a KEY SKELETON — the matched-pair set reduced to `_id` tuples:

    T LEFT JOIN R ON P          -- P contains (SELECT ...),
                                -- T = left-deep tree A [JOIN B ON p]*
  →
    T LEFT JOIN
      ((SELECT R._id AS __djk_r, A._id AS __djk_0, B._id AS __djk_1
        FROM T CROSS JOIN R WHERE P) AS __dj_m
       JOIN R ON __dj_m.__djk_r = R._id)
    ON __dj_m.__djk_0 <=> A._id AND __dj_m.__djk_1 <=> B._id

The skeleton subquery computes the exact matched-pair set (Spark
evaluates P — subqueries included — per cross-joined row, with the
engine's own runtime single-row cardinality check on each scalar
subquery, matching the reference's :single-join semantics). Joining
it back on each side's `_id` restores outer-join multiplicity and
NULL-extension while keeping EVERY original alias visible — so the
select list and any LATER joins in the chain resolve unchanged.
RIGHT JOIN flips to the mirror LEFT form (`R LEFT JOIN (__dj_m JOIN
(T) ON tree keys) ON __djk_r = R._id`); INNER uses the LEFT form
with an INNER join. Tree-key matches use null-safe `<=>` because a
tree built with outer joins carries NULL `_id`s on its NULL-extended
side — the tuple of per-ref `_id`s (NULLs included) uniquely keys a
tree row when every base ref is `_id`-unique.

Correct by construction PROVIDED `_id` uniquely keys every ref —
true for every store scan (the reference requires `_id` on every
document; current-state visibility yields one row per `_id`), and
checked textually for derived-table refs (must mention `_id`).
Anything outside the recognized shape is left untouched (the query
then fails in Spark's analyzer exactly as it did before, so the
rewrite can only ADD working queries, never change a working one).

Scale note: the tree sides are scanned twice (skeleton + splice).
That is the price of decorrelating at the dialect layer without
materialization; Catalyst dedups via exchange reuse when
partitioning allows, pushes P's subquery-free conjuncts into the
cross join, and the shape only fires on queries no Spark cluster
could run at all otherwise.
"""

from __future__ import annotations

import re as _re

from xtdb_spark.sql.rewriter import _tokenize

# words that terminate a join-condition capture at depth 0 (clause
# keywords; join connectors hand control back to the chain parser)
_COND_ENDERS = {
    "WHERE", "GROUP", "HAVING", "ORDER", "LIMIT", "OFFSET", "FETCH",
    "UNION", "INTERSECT", "EXCEPT", "MINUS", "WINDOW", "QUALIFY",
    "RETURNING", "SELECT",
}
_JOIN_WORDS = {"JOIN", "LEFT", "RIGHT", "INNER", "FULL", "CROSS",
               "NATURAL", "SEMI", "ANTI", "OUTER", "LATERAL"}
# a word here after a table ref means "that ref had no alias"
_NO_ALIAS_WORDS = (_COND_ENDERS | _JOIN_WORDS
                   | {"ON", "USING", "FOR", "AS"})


def _txt(toks) -> str:
    return "".join(t for _, t in toks)


class _Bail(Exception):
    pass


class _Parser:
    def __init__(self, toks):
        self.toks = toks
        self.i = 0

    def _skip_ws(self):
        while self.i < len(self.toks) and \
                self.toks[self.i][0] in ("ws", "comment"):
            self.i += 1

    def _peek(self):
        j = self.i
        while j < len(self.toks) and self.toks[j][0] in ("ws", "comment"):
            j += 1
        return self.toks[j] if j < len(self.toks) else (None, "")

    def _balanced(self):
        """Consume a balanced ( … ) starting at the current '('."""
        depth = 0
        while self.i < len(self.toks):
            k, t = self.toks[self.i]
            self.i += 1
            if k == "punct" and t == "(":
                depth += 1
            elif k == "punct" and t == ")":
                depth -= 1
                if depth == 0:
                    return
        raise _Bail

    def table_ref(self):
        """Parse one table ref: (span_start, span_end, alias,
        is_derived). Span includes the alias."""
        self._skip_ws()
        start = self.i
        k, t = self._peek()
        derived = False
        if k == "punct" and t == "(":
            self._skip_ws()
            # only derived SELECT tables (parenthesized joins would
            # need recursive handling — bail)
            j = self.i + 1
            while j < len(self.toks) and self.toks[j][0] in ("ws", "comment"):
                j += 1
            if j >= len(self.toks) or self.toks[j][1].upper() != "SELECT":
                raise _Bail
            self._balanced()
            derived = True
        elif k in ("word", "qident"):
            if k == "word" and t.upper() in _NO_ALIAS_WORDS:
                raise _Bail
            self._skip_ws()
            self.i += 1
            # dotted chain
            while self._peek() == ("punct", "."):
                self._skip_ws()
                self.i += 1          # .
                self._skip_ws()
                if self.i >= len(self.toks) or \
                        self.toks[self.i][0] not in ("word", "qident"):
                    raise _Bail
                self.i += 1
        else:
            raise _Bail
        base_end = self.i
        # optional [AS] alias — temporal FOR clauses unsupported here
        alias = None
        k2, t2 = self._peek()
        if k2 == "word" and t2.upper() == "AS":
            self._skip_ws()
            self.i += 1
            self._skip_ws()
            k2, t2 = self._peek()
            if k2 not in ("word", "qident"):
                raise _Bail
            alias = t2
            self._skip_ws()
            self.i += 1
        elif k2 == "word" and t2.upper() == "FOR":
            raise _Bail              # temporal clause — out of scope
        elif k2 in ("word", "qident") and \
                (k2 == "qident" or t2.upper() not in _NO_ALIAS_WORDS):
            alias = t2
            self._skip_ws()
            self.i += 1
        if alias is None:
            if derived:
                raise _Bail
            # alias = last dotted component of the base name
            words = [tt for kk, tt in self.toks[start:base_end]
                     if kk in ("word", "qident")]
            alias = words[-1]
        return start, self.i, alias, derived


def _has_subquery(toks) -> bool:
    for j, (k, t) in enumerate(toks):
        if k == "punct" and t == "(":
            jj = j + 1
            while jj < len(toks) and toks[jj][0] in ("ws", "comment"):
                jj += 1
            if jj < len(toks) and toks[jj][0] == "word" and \
                    toks[jj][1].upper() == "SELECT":
                return True
    return False


def _projection_star(toks, upto) -> bool:
    """True when the region before FROM contains a projection `*`
    (prev non-ws token SELECT/DISTINCT/ALL/','/'.') — the rewrite
    would change star expansion, so bail."""
    for j in range(upto):
        k, t = toks[j]
        if k == "punct" and t == "*":
            p = j - 1
            while p >= 0 and toks[p][0] in ("ws", "comment"):
                p -= 1
            if p < 0:
                continue
            pk, pt = toks[p]
            if (pk == "word" and pt.upper() in ("SELECT", "DISTINCT",
                                                "ALL")) or \
                    (pk == "punct" and pt in (",", ".")):
                return True
    return False


def _mentions_id(span) -> bool:
    return any((k == "word" and t.lower() == "_id")
               or (k == "qident" and t.strip('"').lower() == "_id")
               for k, t in span)


def decorrelate_join_on(sql: str) -> str:
    """Rewrite a join-chain query whose ON condition contains a
    subquery expression into Spark-supported form (module
    docstring). Returns `sql` unchanged whenever the statement isn't
    exactly that shape."""
    up = sql.upper()
    if "JOIN" not in up or "SELECT" not in up or "(" not in sql:
        return sql
    try:
        return _rewrite(sql)
    except _Bail:
        return sql


def _rewrite(sql: str) -> str:
    toks = _tokenize(sql)
    if any(k == "param" for k, _ in toks):
        raise _Bail                   # positional binding order/dup
    # locate the single depth-0 FROM
    depth = 0
    from_i = None
    for j, (k, t) in enumerate(toks):
        if k == "punct" and t in ("(", "["):
            depth += 1
        elif k == "punct" and t in (")", "]"):
            depth -= 1
        elif depth == 0 and k == "word":
            u = t.upper()
            if u == "FROM":
                if from_i is not None:
                    raise _Bail
                from_i = j
            elif u in ("UNION", "INTERSECT", "EXCEPT", "MINUS"):
                raise _Bail
    if from_i is None:
        raise _Bail
    if _projection_star(toks, from_i):
        raise _Bail

    p = _Parser(toks)
    p.i = from_i + 1
    refs = [p.table_ref()]            # (start, end, alias, derived)
    joins = []                        # (kind, cond_start, cond_end)
    while True:
        k, t = p._peek()
        if k != "word" or t.upper() not in _JOIN_WORDS:
            break
        jt_words = []
        while True:
            k, t = p._peek()
            if k != "word":
                raise _Bail
            u = t.upper()
            if u == "JOIN":
                p._skip_ws()
                p.i += 1
                break
            if u in ("LEFT", "RIGHT", "INNER", "OUTER"):
                jt_words.append(u)
                p._skip_ws()
                p.i += 1
                continue
            raise _Bail               # CROSS/NATURAL/FULL/… — scope
        jt = [w for w in jt_words if w != "OUTER"]
        if jt not in ([], ["INNER"], ["LEFT"], ["RIGHT"]):
            raise _Bail
        kind = jt[0] if jt else "INNER"
        refs.append(p.table_ref())
        k, t = p._peek()
        if k != "word" or t.upper() != "ON":
            raise _Bail
        p._skip_ws()
        p.i += 1
        cond_start = p.i
        d = 0
        j = p.i
        cond_end = len(toks)
        while j < len(toks):
            k, t = toks[j]
            if k == "punct" and t in ("(", "["):
                d += 1
            elif k == "punct" and t in (")", "]"):
                d -= 1
                if d < 0:
                    raise _Bail
            elif d == 0:
                if k == "punct" and t == ",":
                    raise _Bail      # FROM-list continuation
                if k == "punct" and t == ";":
                    cond_end = j
                    break
                if k == "word" and t.upper() in (_COND_ENDERS
                                                 | _JOIN_WORDS
                                                 | {"USING"}):
                    if t.upper() == "USING":
                        raise _Bail
                    cond_end = j
                    break
            j += 1
        joins.append((kind, cond_start, cond_end))
        p.i = cond_end
        k, t = p._peek()
        if k == "word" and t.upper() in _JOIN_WORDS:
            continue
        break

    subq = [n for n, (_, cs, ce) in enumerate(joins)
            if _has_subquery(toks[cs:ce])]
    if len(subq) != 1:
        raise _Bail
    n = subq[0]
    kind, cond_start, cond_end = joins[n]

    # aliases of every ref participating in the rewritten join (the
    # left tree = refs 0..n, the right side = ref n+1) must be
    # plain, distinct words; every ref needs `_id` as a unique key
    used = refs[: n + 2]
    aliases = [a for _, _, a, _ in used]
    if not all(_re.fullmatch(r"\w+", a) for a in aliases):
        raise _Bail
    low = [a.lower() for a in aliases]
    if len(set(low)) != len(low):
        raise _Bail
    for s, e, _, derived in used:
        if derived and not _mentions_id(toks[s:e]):
            raise _Bail

    pre = _txt(toks[:from_i])
    # left tree: ref0 through the (n-1)th join's cond, verbatim
    tree_start = refs[0][0]
    tree_end = joins[n - 1][2] if n > 0 else refs[0][1]
    tree_text = _txt(toks[tree_start:tree_end]).strip()
    r_start, r_end, r_alias, _ = refs[n + 1]
    r_text = _txt(toks[r_start:r_end]).strip()
    cond_text = _txt(toks[cond_start:cond_end]).strip()
    post = _txt(toks[cond_end:])
    tree_aliases = aliases[: n + 1]

    keys = ", ".join(
        [f"{r_alias}._id AS __djk_r"]
        + [f"{a}._id AS __djk_{j}" for j, a in enumerate(tree_aliases)])
    skeleton = (f"(SELECT {keys} FROM {tree_text} CROSS JOIN {r_text} "
                f"WHERE {cond_text}) AS __dj_m")
    tree_keys = " AND ".join(
        f"__dj_m.__djk_{j} <=> {a}._id"
        for j, a in enumerate(tree_aliases))

    if kind == "RIGHT":
        # preserved side is R: flip to the mirror LEFT form, keeping
        # the whole left tree (aliases intact) on the spliced side
        tt = tree_text if n == 0 else f"({tree_text})"
        return (f"{pre} FROM {r_text} LEFT JOIN "
                f"({skeleton} JOIN {tt} ON {tree_keys}) "
                f"ON __dj_m.__djk_r = {r_alias}._id {post}")
    jt_out = "LEFT" if kind == "LEFT" else "INNER"
    return (f"{pre} FROM {tree_text} {jt_out} JOIN "
            f"({skeleton} JOIN {r_text} "
            f"ON __dj_m.__djk_r = {r_alias}._id) "
            f"ON {tree_keys} {post}")
