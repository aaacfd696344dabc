"""SEC EDGAR fundamentals as a bitemporal dataset — the reference's
EDGAR demo re-expressed Spark-first.

Reference: modules/datasets/src/main/clojure/xtdb/datasets/
edgar/parse.clj (registry + pivot + temporality rules), edgar/
mirror.clj (TSV curation: num→sub join, consolidated filter, period
derivation), edgar.clj (calendar-accurate system-time replay +
demo queries).

The quarterly SEC "Financial Statement Data Set" dumps carry
- ``sub.txt`` — one row per filing: adsh (accession), cik, name,
  form, filed …
- ``num.txt`` — one row per fact: adsh, tag, version
  (taxonomy/vintage), ddate (period end), qtrs (0 = instant
  balance, else duration length in quarters), segments, coreg,
  value.

Curation joins num→sub on adsh, keeps only consolidated rows
(blank segments/coreg) whose (taxonomy, tag) is registered, and
derives each fact's period from ddate/qtrs. Facts pivot into wide
statement rows by the TEMPORALITY of the data:

- ``issuer`` — static reference (valid-from = earliest filing).
- ``income_statement`` — duration flows. A figure is fixed for the
  period it reports, so valid-from = ``filed`` and a restatement is
  a new *belief*: corrections live on the system-time axis.
- ``balance_sheet`` — instant balances, as-of ``period_end``
  (= valid-from): distinct as-of dates build a real valid-time
  timeline; a re-report of the same date supersedes in system-time.

Replay is calendar-accurate: docs batch per filing DATE (a filing
is atomic; same-date filings coalesce), submitted oldest-first with
that date as the transaction's system-time — so
``FOR SYSTEM_TIME AS OF`` reproduces exactly what a node tracking
EDGAR live would have believed at any instant.

Spark shape: the whole curation pipeline — TSV scan, num→sub join
(sub is small per quarter: broadcast), registry filter, period
derivation, pivot — is DataFrame ops with a STATIC pivot column
list (schema known up front, no pivot-values inference job). Only
the per-date tx loop touches the driver, and it collects just the
distinct filing dates (bounded: ~60 business days/quarter).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# The curated (taxonomy, concept) → (statement, periodType) registry
# (parse.clj statement-registry). It is the only filter: every filer
# loads, projected onto these recognisable line items; near-synonym
# tags stay distinct columns.
STATEMENT_REGISTRY: dict[tuple[str, str], tuple[str, str]] = {
    # income_statement — duration (flows). valid-from = filed.
    ("us-gaap", "Revenues"): ("income_statement", "duration"),
    ("us-gaap", "RevenueFromContractWithCustomerExcludingAssessedTax"):
        ("income_statement", "duration"),
    ("us-gaap", "GrossProfit"): ("income_statement", "duration"),
    ("us-gaap", "OperatingIncomeLoss"): ("income_statement", "duration"),
    ("us-gaap", "NetIncomeLoss"): ("income_statement", "duration"),
    ("us-gaap", "ResearchAndDevelopmentExpense"):
        ("income_statement", "duration"),
    ("us-gaap", "NetCashProvidedByUsedInOperatingActivities"):
        ("income_statement", "duration"),
    # balance_sheet — instant (balances). valid-from = period end.
    ("us-gaap", "Assets"): ("balance_sheet", "instant"),
    ("us-gaap", "AssetsCurrent"): ("balance_sheet", "instant"),
    ("us-gaap", "Liabilities"): ("balance_sheet", "instant"),
    ("us-gaap", "LiabilitiesCurrent"): ("balance_sheet", "instant"),
    ("us-gaap", "StockholdersEquity"): ("balance_sheet", "instant"),
    ("us-gaap", "Goodwill"): ("balance_sheet", "instant"),
    ("us-gaap",
     "CashCashEquivalentsRestrictedCashAndRestrictedCashEquivalents"):
        ("balance_sheet", "instant"),
    ("us-gaap", "CommonStockSharesOutstanding"): ("balance_sheet", "instant"),
    ("us-gaap", "CommonStockSharesIssued"): ("balance_sheet", "instant"),
    ("dei", "EntityCommonStockSharesOutstanding"):
        ("balance_sheet", "instant"),
}


def snake_case(concept: str) -> str:
    """PascalCase XBRL concept → snake_case column (parse.clj
    snake-case): NetIncomeLoss → net_income_loss; runs of capitals
    keep their tail (ABCDef → abc_def)."""
    import re

    s = re.sub(r"([a-z0-9])([A-Z])", r"\1_\2", concept)
    s = re.sub(r"([A-Z]+)([A-Z][a-z])", r"\1_\2", s)
    return s.lower()


def statement_columns(statement: str) -> list[str]:
    """Sorted snake-cased line-item columns a statement table
    carries — the STATIC pivot list (stable schema, no inference)."""
    return sorted({snake_case(c) for (_t, c), (st, _p)
                   in STATEMENT_REGISTRY.items() if st == statement})


def _read_tsv(spark, path: str) -> DataFrame:
    # EDGAR TSVs are tab-separated and UNQUOTED (commas/quotes appear
    # literally); empty quote char disables Spark's quote handling.
    return (spark.read.option("sep", "\t").option("header", True)
            .option("quote", "").csv(path))


def observations(spark, sub_path: str, num_path: str) -> DataFrame:
    """One quarter's sub.txt + num.txt → the normalised observation
    relation (mirror.clj quarter->observations): num joined to its
    filing, consolidated-only, registry-filtered, period derived
    from ddate/qtrs. Columns: cik, entity_name, statement, period,
    column, period_start, period_end, filed, accession, form,
    fiscal_year, fiscal_period, value (decimal)."""
    sub = _read_tsv(spark, sub_path).select(
        "adsh",
        # canonical CIK is 10-digit zero-padded; sub.txt is bare
        F.lpad(F.trim("cik"), 10, "0").alias("cik"),
        F.col("name").alias("entity_name"),
        "form",
        F.col("fy").cast("long").alias("fiscal_year"),
        F.col("fp").alias("fiscal_period"),
        F.to_date("filed", "yyyyMMdd").alias("filed"))

    reg = spark.createDataFrame(
        [(t, c, st, p, snake_case(c))
         for (t, c), (st, p) in STATEMENT_REGISTRY.items()],
        "taxonomy string, tag string, statement string, "
        "period string, column string")

    num = (_read_tsv(spark, num_path)
           # version is 'us-gaap/2024' or a filer extension; leading
           # segment is the taxonomy (extensions won't match)
           .withColumn("taxonomy", F.split("version", "/")[0])
           .filter((F.coalesce(F.trim("segments"), F.lit("")) == "")
                   & (F.coalesce(F.trim("coreg"), F.lit("")) == ""))
           .join(F.broadcast(reg), ["taxonomy", "tag"])
           .withColumn("period_end", F.to_date("ddate", "yyyyMMdd"))
           .withColumn("n_qtrs", F.col("qtrs").cast("long"))
           # duration start = end - 3*qtrs months; instants have none
           .withColumn(
               "period_start",
               F.when((F.col("period") == "duration")
                      & (F.col("n_qtrs") > 0),
                      F.add_months("period_end", -3 * F.col("n_qtrs"))))
           .withColumn("value", F.col("value").cast("decimal(38,6)")))

    return (num.join(F.broadcast(sub), "adsh")
            .filter(F.col("period_end").isNotNull()
                    & F.col("filed").isNotNull()
                    & ((F.col("period") == "instant")
                       | F.col("period_start").isNotNull()))
            .select("cik", "entity_name", "statement", "period", "column",
                    "period_start", "period_end", "filed",
                    F.col("adsh").alias("accession"), "form",
                    "fiscal_year", "fiscal_period", "value"))


def statement_docs(obs: DataFrame, statement: str) -> DataFrame:
    """Pivot one statement's observations into wide docs, one per
    (cik, period, accession) vintage (parse.clj pivot-statement).
    ``_id`` is the FACT identity — accession excluded — so a
    restatement shares the id and supersedes in system-time.
    ``_valid_from``: duration → filed; instant → period_end."""
    cols = statement_columns(statement)
    sdf = obs.filter(F.col("statement") == statement)
    period = STATEMENT_REGISTRY[next(
        k for k, v in STATEMENT_REGISTRY.items() if v[0] == statement)][1]
    wide = (sdf.groupBy("cik", "period_start", "period_end", "accession")
            # static pivot list: schema fixed, single shuffle, no
            # distinct-values pre-pass
            .pivot("column", cols).agg(F.first("value"))
            .join(F.broadcast(
                sdf.groupBy("accession").agg(
                    F.first("filed").alias("filed"),
                    F.first("form").alias("form"),
                    F.first("fiscal_year").alias("fiscal_year"),
                    F.first("fiscal_period").alias("fiscal_period"))),
                "accession"))
    vf = (F.col("filed") if period == "duration"
          else F.col("period_end")).cast("timestamp")
    return wide.select(
        F.concat_ws("__", "cik", F.lit(statement),
                    F.col("period_start").cast("string"),
                    F.col("period_end").cast("string")).alias("_id"),
        "cik", "period_start", "period_end", "accession", "form",
        "fiscal_year", "fiscal_period", "filed",
        vf.alias("_valid_from"), *cols)


def issuer_docs(obs: DataFrame) -> DataFrame:
    """Static issuer reference from each cik's EARLIEST filing (its
    identity becomes known then; the doc rides in that filing's
    transaction). min_by on (filed, accession) keeps name/accession
    from one deterministic filing."""
    key = F.struct("filed", "accession", "entity_name")
    first = (obs.groupBy("cik").agg(F.min(key).alias("k"))
             .select("cik", F.col("k.filed").alias("filed"),
                     F.col("k.accession").alias("accession"),
                     F.col("k.entity_name").alias("entity_name")))
    return first.select(
        F.col("cik").alias("_id"), "cik", "entity_name", "accession",
        "filed", F.col("filed").cast("timestamp").alias("_valid_from"))


def submit_quarter(store, spark, sub_path: str, num_path: str) -> None:
    """Replay one quarter bitemporally (edgar.clj submit-docs!):
    docs batch per filing DATE (whole filings are atomic; same-date
    filings coalesce into one tx), submitted oldest-first with that
    date as the tx system-time — FOR SYSTEM_TIME AS OF then
    reproduces the belief history a live node would have built.

    Only the distinct filing-date list hits the driver (bounded by
    the calendar); each batch's rows stay a DataFrame slice."""
    obs = observations(spark, sub_path, num_path)
    tables = {
        "issuer": issuer_docs(obs),
        "income_statement": statement_docs(obs, "income_statement"),
        "balance_sheet": statement_docs(obs, "balance_sheet"),
    }
    # cache: each is sliced once per filing date below
    for df in tables.values():
        df.cache()
    try:
        dates = sorted(
            r["filed"]
            for r in obs.select("filed").distinct().collect())
        for d in dates:
            ops = []
            for table, df in tables.items():
                sl = df.filter(F.col("filed") == F.lit(d))
                if sl.limit(1).count():
                    ops.append(("put", table, sl))
            if ops:
                import datetime as _dt

                st = _dt.datetime(d.year, d.month, d.day)
                store.submit_tx(ops, system_from=st)
    finally:
        for df in tables.values():
            df.unpersist()


# Demo queries (edgar.clj) — verbatim SQL, run via xt.sql(q, args).
Q_INCOME_AS_OF_SYSTEM_TIME = """\
SELECT s.period_start, s.net_income_loss, s.form, s.filed
   FROM income_statement FOR SYSTEM_TIME AS OF ? AS s
   WHERE s.cik = ? AND s.period_end = ?
   ORDER BY s.period_start"""

Q_INCOME_RESTATEMENT_HISTORY = """\
SELECT s.period_start, s.net_income_loss, s.form, s.filed, s.accession
   FROM income_statement FOR ALL SYSTEM_TIME AS s
   WHERE s.cik = ? AND s.period_end = ?
   ORDER BY s.period_start, s.filed"""

Q_BALANCE_AS_OF_VALID_TIME = """\
SELECT b.assets, b.period_end
   FROM balance_sheet FOR VALID_TIME AS OF ? AS b
   WHERE b.cik = ? AND b.assets IS NOT NULL
   ORDER BY b.period_end DESC
   LIMIT 1"""

Q_ISSUER = "SELECT i.cik, i.entity_name FROM issuer AS i WHERE i.cik = ?"
