"""The reference's EDGAR fundamentals demo on its own fixture —
Apple's FY2024 Q1 10-Q cut from the SEC 2025q4 Financial Statement
Data Set (src/test/resources/edgar/sample/tsv/), mirroring
edgar_tsv_test.clj — plus the crafted two-filing restatement
scenario of edgar_restatement_test.clj run end-to-end through our
bitemporal store (system-time = filing date, FOR SYSTEM_TIME AS OF
reads the belief current then)."""

import os
from datetime import date, datetime
from decimal import Decimal

import pytest
from pyspark.sql import functions as F

SAMPLE = "/root/reference/src/test/resources/edgar/sample/tsv"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SAMPLE), reason="reference fixtures not present")

APPLE_ACCN = "0000320193-24-000006"


@pytest.fixture(scope="module")
def obs(spark):
    from xtdb_spark.sources.edgar import observations

    return observations(spark, os.path.join(SAMPLE, "sub.txt.gz"),
                        os.path.join(SAMPLE, "num.txt.gz")).cache()


def test_issuer_doc(obs):
    from xtdb_spark.sources.edgar import issuer_docs

    rows = issuer_docs(obs).collect()
    # EDGAR sub.txt carries the registrant name uppercased
    assert [(r["cik"], r["entity_name"]) for r in rows] == \
        [("0000320193", "APPLE INC")]


def test_income_statement_pivot(obs):
    from xtdb_spark.sources.edgar import statement_docs

    q1 = statement_docs(obs, "income_statement").filter(
        (F.col("period_end") == F.lit(date(2023, 12, 31)))
        & (F.col("period_start") == F.lit(date(2023, 9, 30)))).collect()
    assert len(q1) == 1
    r = q1[0]
    # qtrs=1 derives a one-quarter start (checked by the filter);
    # values exact through decimal
    assert r["net_income_loss"] == Decimal("33916000000")
    assert r["gross_profit"] == Decimal("54855000000")
    assert r["_id"] == \
        "0000320193__income_statement__2023-09-30__2023-12-31"


def test_balance_sheet_pivot(obs):
    from xtdb_spark.sources.edgar import statement_docs

    bs = statement_docs(obs, "balance_sheet").filter(
        F.col("period_end") == F.lit(date(2023, 12, 31))).collect()
    assert len(bs) == 1
    r = bs[0]
    assert r["period_start"] is None       # instant facts: no start
    assert r["assets"] == Decimal("353514000000")
    assert r["common_stock_shares_outstanding"] == Decimal("15460223000")
    # instant valid-from = the as-of date, not the filing date
    assert r["_valid_from"] == datetime(2023, 12, 31)


def test_accession_and_filed_on_every_doc(obs):
    from xtdb_spark.sources.edgar import statement_docs

    inc = statement_docs(obs, "income_statement")
    assert inc.filter((F.col("accession") != APPLE_ACCN)
                      | (F.col("filed") != F.lit(date(2024, 2, 2)))) \
        .count() == 0
    assert inc.count() > 0


def _mk_xt(spark, tmp_path):
    from xtdb_spark.session import XtdbSession
    from xtdb_spark.tx import TableStore

    xt = XtdbSession.__new__(XtdbSession)
    xt.spark = spark
    xt.store = TableStore(spark, str(tmp_path / "wh"))
    xt.sql = XtdbSession.sql.__get__(xt)
    xt.scan = XtdbSession.scan.__get__(xt)
    return xt


SUB_HEADER = ("adsh\tcik\tname\tsic\tcountryba\tstprba\tcityba\tzipba\t"
              "bas1\tbas2\tbaph\tcountryma\tstprma\tcityma\tzipma\tmas1\t"
              "mas2\tcountryinc\tstprinc\tein\tformer\tchanged\tafs\twksi\t"
              "fye\tform\tperiod\tfy\tfp\tfiled\taccepted\tprevrpt\tdetail\t"
              "instance\tnciks\taciks")
NUM_HEADER = ("adsh\ttag\tversion\tddate\tqtrs\tuom\tsegments\tcoreg\t"
              "value\tfootnote")


def _sub_row(adsh, form, filed):
    c = {0: adsh, 1: "999999", 2: "ACME CORP", 25: form, 26: "20231231",
         27: "2023", 28: "FY", 29: filed}
    return "\t".join(c.get(i, "") for i in range(36))


def _num_row(adsh, value):
    # NetIncomeLoss FY2023 (qtrs=4 → start = end - 12 months)
    return f"{adsh}\tNetIncomeLoss\tus-gaap/2023\t20231231\t4\tUSD\t\t\t{value}\t"


def _write_quarter(tmp_path, name, adsh, form, filed, value):
    d = tmp_path / name
    d.mkdir()
    (d / "sub.txt").write_text(SUB_HEADER + "\n" + _sub_row(adsh, form, filed) + "\n")
    (d / "num.txt").write_text(NUM_HEADER + "\n" + _num_row(adsh, value) + "\n")
    return str(d / "sub.txt"), str(d / "num.txt")


def test_restatement_on_system_time(spark, tmp_path):
    """q1 reports FY2023 net income = 1000 (10-K filed 2024-02-02);
    q3 re-states it to 1200 (10-K/A filed 2024-08-01). The figure as
    known before the restatement stays 1000 — prior system-time is
    immutable — and the current belief is 1200."""
    from xtdb_spark.sources import edgar

    xt = _mk_xt(spark, tmp_path)
    for q, adsh, form, filed, value in [
            ("2024q1", "0000999999-24-000001", "10-K", "20240202", "1000"),
            ("2024q3", "0000999999-24-000009", "10-K/A", "20240801", "1200")]:
        sub, num = _write_quarter(tmp_path, q, adsh, form, filed, value)
        edgar.submit_quarter(xt.store, spark, sub, num)

    cik, period_end = "0000999999", date(2023, 12, 31)

    def as_of(t):
        rows = xt.sql(edgar.Q_INCOME_AS_OF_SYSTEM_TIME,
                      [t, cik, period_end]).collect()
        return [r["net_income_loss"] for r in rows]

    before = datetime(2024, 3, 1)
    after = datetime(2024, 9, 1)
    assert as_of(before) == [Decimal("1000")]
    assert as_of(after) == [Decimal("1200")]
    # re-running the earlier basis still yields the original
    assert as_of(before) == [Decimal("1000")]
    # before the first filing, nothing is known
    assert as_of(datetime(2024, 1, 1)) == []

    hist = xt.sql(edgar.Q_INCOME_RESTATEMENT_HISTORY,
                  [cik, period_end]).collect()
    assert [(r["net_income_loss"], r["form"], r["filed"])
            for r in hist] == \
        [(Decimal("1000"), "10-K", date(2024, 2, 2)),
         (Decimal("1200"), "10-K/A", date(2024, 8, 1))]


def test_apple_quarter_end_to_end(spark, tmp_path, obs):
    """The Apple fixture through the full replay: issuer query,
    balance as-of valid time (the most recent as-of balance in
    force), and the income statement visible after the filing's
    system-time but absent before it."""
    from xtdb_spark.sources import edgar

    xt = _mk_xt(spark, tmp_path)
    edgar.submit_quarter(xt.store, spark,
                         os.path.join(SAMPLE, "sub.txt.gz"),
                         os.path.join(SAMPLE, "num.txt.gz"))

    cik = "0000320193"
    assert [(r["cik"], r["entity_name"]) for r in
            xt.sql(edgar.Q_ISSUER, [cik]).collect()] == \
        [(cik, "APPLE INC")]

    bal = xt.sql(edgar.Q_BALANCE_AS_OF_VALID_TIME,
                 [datetime(2024, 1, 15), cik]).collect()
    assert [(r["assets"], r["period_end"]) for r in bal] == \
        [(Decimal("353514000000"), date(2023, 12, 31))]

    # filed 2024-02-02: before that system time the filing is unknown
    assert xt.sql(edgar.Q_INCOME_AS_OF_SYSTEM_TIME,
                  [datetime(2024, 1, 1), cik,
                   date(2023, 12, 31)]).count() == 0
    now_rows = xt.sql(edgar.Q_INCOME_AS_OF_SYSTEM_TIME,
                      [datetime(2025, 1, 1), cik,
                       date(2023, 12, 31)]).collect()
    assert Decimal("33916000000") in {r["net_income_loss"]
                                      for r in now_rows}
