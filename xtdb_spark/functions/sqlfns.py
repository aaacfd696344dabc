"""SQL-surface registrations of the xtdb scalar-function family.

The catalog entries exercise these semantics through Column
expressions; RAW SQL text needs the NAMES resolvable too — a user of
the reference writes `SELECT uri_host(u), age(a, b) FROM t` straight
into `xt.sql(...)`. Spark 3.4+ SQL scalar functions (CREATE
TEMPORARY FUNCTION … RETURN <expr>) register them JVM-side: the body
inlines into the caller's plan, so everything stays in whole-stage
codegen — no UDF.

Reference points: age + range_bins (expression/temporal.clj), uri_*
(expression/uri.clj:30-64), parse_ident/quote_ident/col_description
(expression/pg.clj), keyword/namespace/local_name
(expression.clj keyword fns), LOCAL_DATE/LOCAL_TIME/LOCAL_TIMESTAMP
(Sql.g4:366-381), lower_inf/upper_inf (period bound predicates).
Known gap (documented): XTDB's polymorphic `lower(period)` /
`upper(period)` collide with string lower/upper — read `p._from` /
`p._to` instead.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

_FLAG = "spark.xtdb.sqlFunctionsRegistered"

# age(b, a): calendar (years, months, days) from a to b, Postgres
# borrow convention (day deficit borrows the EARLIER date's month
# length — same arithmetic as queries/functions2.age_parts), sign
# follows b >= a.
_AGE_BODY = """
  CASE WHEN b >= a THEN named_struct(
    'years',  CAST(year(b) - year(a)
              - CASE WHEN (month(b) - month(a)
                 - CASE WHEN day(b) - day(a) < 0 THEN 1 ELSE 0 END) < 0
                THEN 1 ELSE 0 END AS INT),
    'months', CAST(pmod(month(b) - month(a)
              - CASE WHEN day(b) - day(a) < 0 THEN 1 ELSE 0 END, 12) AS INT),
    'days',   CAST(day(b) - day(a)
              + CASE WHEN day(b) - day(a) < 0
                THEN day(last_day(a)) ELSE 0 END AS INT))
  ELSE named_struct(
    'years',  -CAST(year(a) - year(b)
              - CASE WHEN (month(a) - month(b)
                 - CASE WHEN day(a) - day(b) < 0 THEN 1 ELSE 0 END) < 0
                THEN 1 ELSE 0 END AS INT),
    'months', -CAST(pmod(month(a) - month(b)
              - CASE WHEN day(a) - day(b) < 0 THEN 1 ELSE 0 END, 12) AS INT),
    'days',   -CAST(day(a) - day(b)
              + CASE WHEN day(a) - day(b) < 0
                THEN day(last_day(b)) ELSE 0 END AS INT))
  END
"""

_FUNCTIONS: list[str] = [
    f"""CREATE OR REPLACE TEMPORARY FUNCTION age(
          b TIMESTAMP, a TIMESTAMP)
        RETURNS STRUCT<years: INT, months: INT, days: INT>
        RETURN {_AGE_BODY}""",

    """CREATE OR REPLACE TEMPORARY FUNCTION range_bins(
         ts TIMESTAMP, width_seconds BIGINT)
       RETURNS STRUCT<_from: TIMESTAMP, _to: TIMESTAMP>
       RETURN named_struct(
         '_from', timestamp_seconds(
            floor(unix_timestamp(ts) / width_seconds) * width_seconds),
         '_to', timestamp_seconds(
            (floor(unix_timestamp(ts) / width_seconds) + 1)
            * width_seconds))""",

    # DATE_BIN(stride, ts) — Postgres-style bin-start truncation
    # (reference exposes it via pgwire compat; fusion.sql uses it for
    # the hourly series anchor). Epoch-origin, truncating DIV like
    # the reference's quot; pure epoch arithmetic, codegen-friendly.
    """CREATE OR REPLACE TEMPORARY FUNCTION date_bin(
         stride INTERVAL DAY TO SECOND, ts TIMESTAMP)
       RETURNS TIMESTAMP
       RETURN timestamp_micros(
         (unix_micros(ts)
          DIV unix_micros(CAST('1970-01-01 00:00:00' AS TIMESTAMP)
                          + stride))
         * unix_micros(CAST('1970-01-01 00:00:00' AS TIMESTAMP)
                       + stride))""",

    # The reference's weighted range_bins(stride, period[, origin])
    # (expression/temporal.clj emit-range-bins) lives in the dialect
    # layer instead (constructs._range_bins_sql): its call sites sit
    # under UNNEST — a Generate node, where Spark forbids SQL UDFs —
    # so it inlines as a transform(sequence(...)) expression.

    # uri accessors (same regexes as the oracle-checked battery)
    """CREATE OR REPLACE TEMPORARY FUNCTION uri_scheme(u STRING)
       RETURNS STRING
       RETURN nullif(regexp_extract(u, '^([a-z][a-z0-9+.-]*):', 1), '')""",
    """CREATE OR REPLACE TEMPORARY FUNCTION uri_host(u STRING)
       RETURNS STRING
       RETURN nullif(regexp_extract(
         u, '^[a-z][a-z0-9+.-]*://(?:[^/@]*@)?([^/:?#]*)', 1), '')""",
    """CREATE OR REPLACE TEMPORARY FUNCTION uri_port(u STRING)
       RETURNS INT
       RETURN CAST(nullif(regexp_extract(
         u, '^[a-z][a-z0-9+.-]*://[^/:?#]*:([0-9]+)', 1), '') AS INT)""",
    """CREATE OR REPLACE TEMPORARY FUNCTION uri_path(u STRING)
       RETURNS STRING
       RETURN nullif(regexp_extract(
         u, '^[a-z][a-z0-9+.-]*://[^/?#]*(/[^?#]*)', 1), '')""",
    """CREATE OR REPLACE TEMPORARY FUNCTION uri_query(u STRING)
       RETURNS STRING
       RETURN nullif(regexp_extract(u, '\\\\?([^#]*)', 1), '')""",
    """CREATE OR REPLACE TEMPORARY FUNCTION uri_fragment(u STRING)
       RETURNS STRING
       RETURN nullif(regexp_extract(u, '#(.*)$', 1), '')""",
    """CREATE OR REPLACE TEMPORARY FUNCTION uri_user_info(u STRING)
       RETURNS STRING
       RETURN nullif(regexp_extract(
         u, '^[a-z][a-z0-9+.-]*://([^/@:?#]*)@', 1), '')""",

    # pg compat (expression/pg.clj)
    """CREATE OR REPLACE TEMPORARY FUNCTION parse_ident(s STRING)
       RETURNS ARRAY<STRING>
       RETURN transform(split(s, '\\\\.'),
                        x -> regexp_replace(trim(x), '^"|"$', ''))""",
    """CREATE OR REPLACE TEMPORARY FUNCTION quote_ident(s STRING)
       RETURNS STRING
       RETURN CASE WHEN s RLIKE '^[a-z_][a-z0-9_]*$' THEN s
                   ELSE concat('"', replace(s, '"', '""'), '"') END""",
    """CREATE OR REPLACE TEMPORARY FUNCTION col_description(
         tbl INT, col INT)
       RETURNS STRING RETURN CAST(NULL AS STRING)""",

    # keyword family (keywords ride as strings, ns/name split on /)
    """CREATE OR REPLACE TEMPORARY FUNCTION keyword(s STRING)
       RETURNS STRING RETURN s""",
    """CREATE OR REPLACE TEMPORARY FUNCTION namespace(s STRING)
       RETURNS STRING
       RETURN CASE WHEN instr(s, '/') > 0
                   THEN substring(s, 1, instr(s, '/') - 1) END""",
    """CREATE OR REPLACE TEMPORARY FUNCTION local_name(s STRING)
       RETURNS STRING
       RETURN CASE WHEN instr(s, '/') > 0
                   THEN substring(s, instr(s, '/') + 1) ELSE s END""",

    # LOCAL_* nullary forms (Sql.g4:366-381; session tz is pinned
    # UTC, and times ride as strings per the type mapping)
    """CREATE OR REPLACE TEMPORARY FUNCTION local_timestamp()
       RETURNS TIMESTAMP_NTZ RETURN localtimestamp()""",
    """CREATE OR REPLACE TEMPORARY FUNCTION local_date()
       RETURNS DATE RETURN current_date()""",
    """CREATE OR REPLACE TEMPORARY FUNCTION local_time()
       RETURNS STRING
       RETURN date_format(localtimestamp(), 'HH:mm:ss')""",

    # period bound predicates (NULL bound = unbounded)
    """CREATE OR REPLACE TEMPORARY FUNCTION lower_inf(
         p STRUCT<_from: TIMESTAMP, _to: TIMESTAMP>)
       RETURNS BOOLEAN RETURN p._from IS NULL""",
    """CREATE OR REPLACE TEMPORARY FUNCTION upper_inf(
         p STRUCT<_from: TIMESTAMP, _to: TIMESTAMP>)
       RETURNS BOOLEAN RETURN p._to IS NULL""",
]


def ensure_registered(spark: SparkSession) -> None:
    """Idempotent per-session registration (guarded by a session
    conf flag — temp functions live in the session catalog)."""
    try:
        if spark.conf.get(_FLAG) == "true":
            return
    except Exception:
        pass
    for stmt in _FUNCTIONS:
        spark.sql(stmt)
    spark.conf.set(_FLAG, "true")
