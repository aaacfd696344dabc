"""Round-7 ADVICE fixes: string-literal backslash fidelity through
the rewriter (PG standard_conforming_strings vs Spark escape
processing), PG octal escapes in E'…', generate_series direction
semantics (reference generate_series_test.clj: wrong direction → []),
ARRAY[n] sized-array type spellings inside CAST, and bounds-checked
transit-msgpack decode."""

import pytest

from xtdb_spark.session import XtdbSession
from xtdb_spark.sql.rewriter import rewrite_and_run
from xtdb_spark.tx import TableStore


def make_xt(spark, tmp_path):
    xt = XtdbSession.__new__(XtdbSession)
    xt.spark = spark
    xt.store = TableStore(spark, str(tmp_path / "wh"))
    return xt


def one(xt, sql):
    row = rewrite_and_run(xt, sql).collect()[0]
    return row[0]


# ---- string literals -------------------------------------------------

def test_backslash_literal_in_plain_string(spark, tmp_path):
    xt = make_xt(spark, tmp_path)
    # PG standard strings keep backslashes literally
    assert one(xt, r"SELECT '\d+' AS s") == r"\d+"
    assert one(xt, "SELECT 'a\\' AS s") == "a\\"


def test_backslash_survives_e_string_regex(spark, tmp_path):
    xt = make_xt(spark, tmp_path)
    # E'\\d+' decodes to \d+ and must reach the regex engine intact
    assert one(xt, r"SELECT E'\\d+' AS s") == r"\d+"
    assert one(xt, r"SELECT 'abc123' ~ E'\\d+' AS m") is True


def test_dollar_quoted_backslash(spark, tmp_path):
    xt = make_xt(spark, tmp_path)
    assert one(xt, r"SELECT $$\n$$ AS s") == r"\n"


def test_octal_escapes(spark, tmp_path):
    xt = make_xt(spark, tmp_path)
    assert one(xt, r"SELECT E'\101' AS s") == "A"
    assert one(xt, r"SELECT E'\1018' AS s") == "A8"
    assert one(xt, r"SELECT E'\0' AS s") == "\0"
    assert one(xt, r"SELECT E'\x41\102' AS s") == "AB"


# ---- generate_series direction ---------------------------------------

def test_series_wrong_direction_empty(spark, tmp_path):
    xt = make_xt(spark, tmp_path)
    assert list(one(xt, "SELECT generate_series(10, 3) AS s")) == []
    assert list(one(xt, "SELECT generate_series(1, 5, -1) AS s")) == []
    assert list(one(xt, "SELECT generate_series(5, 1, 2) AS s")) == []


def test_series_right_direction_unchanged(spark, tmp_path):
    xt = make_xt(spark, tmp_path)
    assert list(one(xt, "SELECT generate_series(1, 4) AS s")) == \
        [1, 2, 3, 4]
    assert list(one(xt, "SELECT generate_series(5, 1, -2) AS s")) == \
        [5, 3, 1]
    assert list(one(xt, "SELECT generate_series(3, 3) AS s")) == [3]
    assert list(one(xt, "SELECT generate_series(3, 3, -1) AS s")) == [3]


def test_series_table_form_wrong_direction(spark, tmp_path):
    xt = make_xt(spark, tmp_path)
    rows = rewrite_and_run(
        xt, "SELECT v FROM generate_series(10, 3) AS g(v)").collect()
    assert rows == []
    rows = rewrite_and_run(
        xt, "SELECT v FROM generate_series(2, 4) AS g(v)").collect()
    assert [r["v"] for r in rows] == [2, 3, 4]


def test_range_exclusive_end_still_works(spark, tmp_path):
    xt = make_xt(spark, tmp_path)
    assert list(one(xt, "SELECT range(1, 4) AS s")) == [1, 2, 3]
    assert list(one(xt, "SELECT range(4, 1) AS s")) == []


def test_series_timestamp_step(spark, tmp_path):
    xt = make_xt(spark, tmp_path)
    s = one(xt, "SELECT generate_series(TIMESTAMP '2024-01-01', "
                "TIMESTAMP '2024-01-03', INTERVAL '1' DAY) AS s")
    assert len(list(s)) == 3
    s = one(xt, "SELECT generate_series(TIMESTAMP '2024-01-03', "
                "TIMESTAMP '2024-01-01', INTERVAL '1' DAY) AS s")
    assert list(s) == []


# ---- sized-array type in CAST ----------------------------------------

def test_cast_sized_array_type(spark, tmp_path):
    xt = make_xt(spark, tmp_path)
    v = one(xt, "SELECT CAST([1, 2, 3] AS INT ARRAY[5]) AS a")
    assert list(v) == [1, 2, 3]
    v = one(xt, "SELECT CAST(['1', '2'] AS INT ARRAY) AS a")
    assert list(v) == [1, 2]


# ---- transit-msgpack truncation --------------------------------------

def test_msgpack_truncation_raises():
    from xtdb_spark.transit import _mp_decode

    # map16{"a": uint32 12345678, "b": str8 "hello world"}
    full = (b"\xde\x00\x02"
            b"\xa1a" b"\xce" + (12345678).to_bytes(4, "big") +
            b"\xa1b" b"\xd9\x0bhello world")
    v, end = _mp_decode(full, 0)
    assert v == {"a": 12345678, "b": "hello world"}
    assert end == len(full)
    for cut in range(1, len(full)):
        with pytest.raises(ValueError):
            _mp_decode(full[:cut], 0)
