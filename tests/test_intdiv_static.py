"""Static int-ness analysis for the SLT integer-division rewrite
(round 11). The reference corpus's random/expr dir — which the
upstream CI disables with a 62-error budget — is the motivating
surface: divisions NESTED inside COALESCE/CASE/parens must keep
their integral type for the ENCLOSING division's truncation
decision (SQLite semantics, expression.clj:1009-1012 quot)."""

from xtdb_spark.slt.intdiv import _intness, rewrite_int_div
from xtdb_spark.sql.rewriter import _tokenize

CT = {"col0": "int", "col1": "float", "col2": "text", "pk": "int"}


def iness(expr, ct=CT):
    return _intness(_tokenize(expr), ct)


def test_intness_literals_and_columns():
    assert iness("42") is True
    assert iness("4.2") is False
    assert iness("1e5") is False
    assert iness("'txt'") is False
    assert iness("NULL") is True
    assert iness("col0") is True
    assert iness("col1") is False
    assert iness("col2") is False
    assert iness("tab1.col0") is True
    assert iness("nosuch") is None


def test_intness_operators_and_unaries():
    assert iness("- + 42") is True
    assert iness("1 + 2 * 3 % 4") is True
    assert iness("1 + 2.5") is False
    assert iness("col0 * col0 + 7") is True
    assert iness("col0 * col1") is False
    assert iness("( ( col0 ) )") is True
    assert iness("( SELECT 1 )") is None


def test_intness_functions():
    assert iness("COUNT ( * )") is True
    assert iness("AVG ( col0 )") is False           # SQLite AVG: float
    assert iness("SUM ( col0 )") is True
    assert iness("SUM ( col1 )") is False
    assert iness("MIN ( ALL - 1 )") is True
    assert iness("MAX ( DISTINCT 69 )") is True
    assert iness("ABS ( col0 )") is True
    assert iness("NULLIF ( - 60, COUNT ( * ) )") is True
    assert iness("NULLIF ( 1.5, 2 )") is False
    assert iness("COALESCE ( - 88, 1 + 2 )") is True
    # DYNAMIC COALESCE typing (round-11 refinement): the first
    # definitely-non-null arg decides — SQLite returns 1 (int) here,
    # the 2.5 is unreachable
    assert iness("COALESCE ( 1, 2.5 )") is True
    # value-dependent (round 12): NULLIF(1,2) is 1 at runtime, so
    # the COALESCE takes the INT arm — statically that's "div"
    # (mixed reachable int-ness) and the distribution rewrite picks
    # the runtime branch; the old `False` typed it float, wrongly
    assert iness("COALESCE ( NULLIF ( 1, 2 ), 2.5 )") == "div"
    assert iness("COALESCE ( 65, AVG ( col0 ) )") is True
    assert iness("wibble ( 1 )") is None             # unknown fn


def test_intness_cast_and_case():
    assert iness("CAST ( NULL AS INTEGER )") is True
    assert iness("CAST ( 1 AS REAL )") is False
    assert iness("CAST ( 1 AS TEXT )") is False
    assert iness("CASE 61 WHEN 93 THEN NULL ELSE 12 END") is True
    # branch int-ness DIVERGES → marked for the division-
    # distribution rewrite (round 11): SQLite types by the branch
    # the runtime takes
    assert iness("CASE WHEN col0 = 1 THEN 1 ELSE 2.5 END") == "div"
    assert iness("CASE WHEN col0 = 1 THEN 1.5 ELSE 2.5 END") is False
    # a float in a CONDITION (skipped) must not contaminate results
    assert iness("CASE - CAST ( NULL AS REAL ) WHEN 1.5 THEN 2 "
                 "ELSE 3 END") is True
    # nested CASE in a condition, results all int
    assert iness("CASE WHEN CASE WHEN 1.0 > 0 THEN 1 ELSE 2 END = 1 "
                 "THEN 5 ELSE 6 END") is True


def test_rewrite_static_div_keeps_bigint_shape():
    out = rewrite_int_div("SELECT col0 / pk FROM t", CT)
    assert "DIV" in out and "typeof" not in out
    out = rewrite_int_div("SELECT col1 / 2 FROM t", CT)
    assert "DIV" not in out and "typeof" not in out
    # unknown column falls back to the runtime guard
    out = rewrite_int_div("SELECT mystery / 2 FROM t", CT)
    assert "typeof" in out


def test_rewrite_nested_division_truncates(spark):
    """The round-11 corpus failure class: inner int division inside
    COALESCE must keep the OUTER division integral."""
    ct = {"col0": "int"}
    q = ("SELECT 38 / + ( + - COALESCE ( + 66, 84 + 26 / 73 ) ) "
         "+ 79 AS r")
    r = spark.sql(rewrite_int_div(q, ct)).collect()[0]["r"]
    assert r == 79                  # 38/-66 truncates to 0
    # float contamination via a REAL cast disables truncation
    q2 = "SELECT 3 / CAST ( 2 AS REAL ) AS r"
    r2 = spark.sql(rewrite_int_div(q2, ct)).collect()[0]["r"]
    assert r2 == 1.5


def test_round12_divergence_machinery():
    """Round 12 (ADVICE r11 + the 4 random/expr survivors): mixed
    COALESCE marks "div"; NULLIF/COALESCE convert to CASE form for
    the division distribution; the distribution recurses through
    nested divergence; aggregates only claim non-null without row
    filtering."""
    # mixed reachable int-ness — value-dependent, not float
    assert iness("COALESCE ( col0, 2.5 )") == "div"
    assert iness("COALESCE ( NULLIF ( col0, 5 ), 2.5 )") == "div"
    # all-int / all-float mixes stay plain
    assert iness("COALESCE ( col0, 7 )") is True
    assert iness("COALESCE ( col1, 2.5 )") is False
    # emitted DIV re-analyzes as integral (distribution recursion)
    assert iness("CAST ( col0 AS BIGINT ) DIV CAST ( 2 AS BIGINT )") is True
    assert iness("2.5 * col0 DIV 2") is True      # DIV resets the chain

    # mixed COALESCE distributes fully statically — no runtime guard
    out = rewrite_int_div("SELECT COALESCE(col0, 2.5) / 2 FROM t", CT)
    assert "typeof" not in out and "DIV" in out and "IS NOT NULL" in out
    # nested divergent CASE inside NULLIF distributes recursively
    out2 = rewrite_int_div(
        "SELECT 14 / NULLIF(CASE WHEN col0=1 THEN 3 ELSE 2.5 END, 0) "
        "FROM t", CT)
    assert "typeof" not in out2 and "DIV" in out2


def test_round12_agg_nn_gating():
    # without filtering, COALESCE(MIN(int), float) still distributes
    # (div) — and WITH filtering it must not be statically typed int
    q = "SELECT COALESCE(MIN(col0), 2.5) / 2 FROM t WHERE col0 > 5"
    out = rewrite_int_div(q, CT)
    # the distribution handles both branches: DIV when MIN is
    # non-null, float division when the filter emptied the table
    assert "IS NOT NULL" in out and "DIV" in out
    assert "/ (2)" in out.replace("((", "(").replace("))", ")") or "/" in out
