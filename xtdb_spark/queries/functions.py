"""Expression-engine parity queries: scalar function batteries mapped
onto built-in Catalyst expressions (reference
core/src/main/clojure/xtdb/expression.clj + expression/temporal.clj).
Everything stays in whole-stage codegen — no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from xtdb_spark.queries.registry import ld, register
from xtdb_spark.functions.periods import (
    p_contains_ts, p_overlaps, p_precedes, p_succeeds, period,
)
from xtdb_spark.functions.temporal import date_bin_start, generate_series_ts


@register(
    "fn_string_battery",
    """
    SELECT p_partkey,
           UPPER(p_name) AS up, LOWER(p_type) AS lo,
           SUBSTRING(p_name, 3, 5) AS sub,
           LENGTH(p_name) AS len,
           POSITION('a' IN p_name) AS pos_a,
           REVERSE(p_brand) AS rev,
           REPLACE(p_name, 'a', '@') AS repl,
           CONCAT(p_brand, '-', p_type) AS cat,
           LPAD(CAST(p_size AS VARCHAR), 4, '0') AS padded,
           TRIM(' x' FROM CONCAT(' ', p_name, ' x')) AS trimmed
    FROM part WHERE p_partkey < 500
    """,
)
def string_battery(spark, sf_dir):
    """String fns (expression.clj:1228-1667): upper/lower/substring/
    length/position/reverse/replace/concat/trim."""
    p = ld(spark, sf_dir, "part").filter(F.col("p_partkey") < 500)
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("up"),
        F.lower("p_type").alias("lo"),
        F.substring("p_name", 3, 5).alias("sub"),
        F.length("p_name").alias("len"),
        F.instr(F.col("p_name"), "a").alias("pos_a"),
        F.reverse("p_brand").alias("rev"),
        F.regexp_replace("p_name", "a", "@").alias("repl"),
        F.concat_ws("-", "p_brand", "p_type").alias("cat"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("padded"),
        F.expr("TRIM(BOTH ' x' FROM CONCAT(' ', p_name, ' x'))").alias("trimmed"),
    )


@register(
    "fn_math_battery",
    """
    SELECT l_orderkey, l_linenumber,
           ABS(l_quantity - 25.0) AS abs_dev,
           CAST(CEIL(l_extendedprice / 1000) AS BIGINT) AS price_ceil,
           CAST(FLOOR(l_extendedprice / 1000) AS BIGINT) AS price_floor,
           ROUND(l_extendedprice / 7, 2) AS price_r2,
           MOD(CAST(l_orderkey AS BIGINT), 7) AS key_mod,
           ROUND(POW(1.0 + l_discount, 2), 6) AS pow2,
           ROUND(SQRT(l_quantity), 6) AS qty_sqrt,
           ROUND(EXP(l_discount), 6) AS disc_exp,
           ROUND(LN(l_extendedprice), 6) AS price_ln,
           ROUND(LOG10(l_extendedprice), 6) AS price_log10,
           ROUND(SIN(l_quantity), 6) AS qty_sin,
           GREATEST(l_quantity, l_discount * 100) AS gr,
           LEAST(l_quantity, l_discount * 100) AS le,
           CAST(SIGN(l_quantity - 25.0) AS DOUBLE) AS sgn,
           l_orderkey & 255 AS band,
           l_orderkey | 16 AS bor,
           XOR(l_orderkey, 5) AS bxor
    FROM lineitem WHERE l_orderkey < 500
    """,
)
def math_battery(spark, sf_dir):
    """Arithmetic & math fns (expression.clj:872-1048,1755-1822) and
    bit ops (:960-999). Transcendentals rounded to 6dp (JVM vs libm
    last-ulp differences)."""
    l = ld(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 500)
    return l.select(
        "l_orderkey", "l_linenumber",
        F.abs(F.col("l_quantity") - 25.0).alias("abs_dev"),
        F.ceil(F.col("l_extendedprice") / 1000).alias("price_ceil"),
        F.floor(F.col("l_extendedprice") / 1000).alias("price_floor"),
        F.round(F.col("l_extendedprice") / 7, 2).alias("price_r2"),
        (F.col("l_orderkey") % 7).alias("key_mod"),
        F.round(F.pow(1.0 + F.col("l_discount"), 2), 6).alias("pow2"),
        F.round(F.sqrt("l_quantity"), 6).alias("qty_sqrt"),
        F.round(F.exp("l_discount"), 6).alias("disc_exp"),
        F.round(F.log("l_extendedprice"), 6).alias("price_ln"),
        F.round(F.log10("l_extendedprice"), 6).alias("price_log10"),
        F.round(F.sin("l_quantity"), 6).alias("qty_sin"),
        F.greatest(F.col("l_quantity"), F.col("l_discount") * 100).alias("gr"),
        F.least(F.col("l_quantity"), F.col("l_discount") * 100).alias("le"),
        F.signum(F.col("l_quantity") - 25.0).alias("sgn"),
        F.col("l_orderkey").bitwiseAND(255).alias("band"),
        F.col("l_orderkey").bitwiseOR(16).alias("bor"),
        F.col("l_orderkey").bitwiseXOR(5).alias("bxor"),
    )


@register(
    "fn_case_coalesce_nullif",
    """
    SELECT bucket, status_or_open, COUNT(*) AS n FROM (
      SELECT CASE WHEN o_totalprice > 300000 THEN 'big'
                  WHEN o_totalprice > 100000 THEN 'mid'
                  ELSE 'small' END AS bucket,
             COALESCE(NULLIF(o_orderstatus, 'O'), 'open') AS status_or_open
      FROM orders)
    GROUP BY bucket, status_or_open
    """,
)
def case_coalesce_nullif(spark, sf_dir):
    """case/coalesce/nullif macro layer (expression/macro.clj)."""
    o = ld(spark, sf_dir, "orders")
    bucket = (F.when(F.col("o_totalprice") > 300000, "big")
              .when(F.col("o_totalprice") > 100000, "mid").otherwise("small"))
    soo = F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("open"))
    return (o.select(bucket.alias("bucket"), soo.alias("status_or_open"))
            .groupBy("bucket", "status_or_open").agg(F.count("*").alias("n")))


@register(
    "fn_like_regex",
    """
    SELECT COUNT(*) FILTER (WHERE p_name LIKE '%a%') AS like_a,
           COUNT(*) FILTER (WHERE p_name LIKE 'p_rt%') AS like_prefix,
           COUNT(*) FILTER (WHERE regexp_matches(p_type, '^(PROMO|ECONOMY)$')) AS re_type,
           COUNT(*) FILTER (WHERE regexp_matches(p_name, '[0-9]{2,}')) AS re_digits
    FROM part
    """,
)
def like_regex(spark, sf_dir):
    """LIKE (expression.clj:1061) and LIKE_REGEX (:1146)."""
    p = ld(spark, sf_dir, "part")
    return p.agg(
        F.count(F.when(F.col("p_name").like("%a%"), 1)).alias("like_a"),
        F.count(F.when(F.col("p_name").like("p_rt%"), 1)).alias("like_prefix"),
        F.count(F.when(F.col("p_type").rlike("^(PROMO|ECONOMY)$"), 1)).alias("re_type"),
        F.count(F.when(F.col("p_name").rlike("[0-9]{2,}"), 1)).alias("re_digits"),
    )


@register(
    "fn_extract_datetrunc",
    """
    SELECT CAST(EXTRACT(YEAR FROM ts) AS INTEGER) AS y,
           CAST(EXTRACT(MONTH FROM ts) AS INTEGER) AS m,
           CAST(EXTRACT(DAY FROM ts) AS INTEGER) AS d,
           CAST(EXTRACT(HOUR FROM ts) AS INTEGER) AS h,
           COUNT(*) AS n
    FROM events
    WHERE date_trunc('day', ts) = TIMESTAMP '2024-01-05'
    GROUP BY y, m, d, h
    """,
)
def extract_datetrunc(spark, sf_dir):
    """extract/date_trunc (expression/temporal.clj)."""
    e = ld(spark, sf_dir, "events").filter(
        F.date_trunc("day", F.col("ts")) == F.lit("2024-01-05").cast("timestamp"))
    return (e.select(F.year("ts").alias("y"), F.month("ts").alias("m"),
                     F.dayofmonth("ts").alias("d"), F.hour("ts").alias("h"))
            .groupBy("y", "m", "d", "h").agg(F.count("*").alias("n")))


@register(
    "fn_cast_battery",
    """
    SELECT o_orderkey,
           CAST(o_orderkey AS VARCHAR) AS key_str,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR) AS price_str,
           CAST(FLOOR(o_totalprice) AS BIGINT) AS price_int,
           CAST(o_orderdate AS DATE) AS odate,
           CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS date_str
    FROM orders WHERE o_orderkey < 100
    """,
)
def cast_battery(spark, sf_dir):
    """Cast family (expression.clj; temporal casts temporal.clj).
    double→string is format-ambiguous cross-engine, so string renders
    go through decimal/date."""
    o = ld(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 100)
    return o.select(
        "o_orderkey",
        F.col("o_orderkey").cast("string").alias("key_str"),
        F.col("o_totalprice").cast("decimal(18,2)").cast("string").alias("price_str"),
        F.floor("o_totalprice").cast("long").alias("price_int"),
        F.col("o_orderdate").cast("date").alias("odate"),
        F.col("o_orderdate").cast("date").cast("string").alias("date_str"),
    )


@register(
    "fn_generate_series_int",
    """
    SELECT n % 7 AS g, COUNT(*) AS n_vals, CAST(SUM(n * n) AS BIGINT) AS sum_sq
    FROM (SELECT UNNEST(generate_series(0, 9999)) AS n)
    GROUP BY g
    """,
)
def generate_series_int(spark, sf_dir):
    """generate_series ints (expression.clj:2360-2366) —
    spark.range is a distributed splittable source."""
    return (spark.range(0, 10000).select(F.col("id").alias("n"))
            .groupBy((F.col("n") % 7).alias("g"))
            .agg(F.count("*").alias("n_vals"),
                 F.sum(F.col("n") * F.col("n")).alias("sum_sq")))


@register(
    "fn_generate_series_ts",
    """
    SELECT COUNT(*) AS n, MIN(ts) AS first_ts, MAX(ts) AS last_ts
    FROM (SELECT UNNEST(generate_series(TIMESTAMP '2024-01-01',
                                        TIMESTAMP '2024-01-08',
                                        INTERVAL 1 HOUR)) AS ts)
    WHERE ts < TIMESTAMP '2024-01-08'
    """,
)
def generate_series_ts_q(spark, sf_dir):
    """generate_series over timestamps (expression/temporal.clj)."""
    df = generate_series_ts(spark, "2024-01-01", "2024-01-08", "1 hour")
    return df.agg(F.count("*").alias("n"), F.min("ts").alias("first_ts"),
                  F.max("ts").alias("last_ts"))


@register(
    "fn_range_bins",
    """
    SELECT TIMESTAMP '1970-01-01' + INTERVAL 1 SECOND
             * CAST(FLOOR(epoch(ts) / 3600) * 3600 AS BIGINT) AS bin_start,
           event_type, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS sum_value
    FROM events
    WHERE ts < TIMESTAMP '2024-01-03'
    GROUP BY bin_start, event_type
    """,
)
def range_bins_q(spark, sf_dir):
    """range_bins time-bucketing (expression/temporal.clj range_bins;
    readings bench modules/bench/.../readings.clj:41-47)."""
    e = ld(spark, sf_dir, "events").filter(
        F.col("ts") < F.lit("2024-01-03").cast("timestamp"))
    return (e.groupBy(date_bin_start(F.col("ts"), 3600).alias("bin_start"),
                      F.col("event_type"))
            .agg(F.count("*").alias("n"),
                 F.sum(F.col("value").cast("decimal(28,2)")).cast("double")
                 .alias("sum_value")))


@register(
    "fn_period_allen",
    """
    WITH p AS (SELECT ts AS p_from, ts + INTERVAL 1 HOUR AS p_to FROM events)
    SELECT COUNT(*) FILTER (WHERE p_from < TIMESTAMP '2024-01-20'
                              AND TIMESTAMP '2024-01-10' < p_to) AS n_overlaps,
           COUNT(*) FILTER (WHERE TIMESTAMP '2024-01-10' <= p_from
                              AND p_to <= TIMESTAMP '2024-01-20') AS n_contained,
           COUNT(*) FILTER (WHERE p_to <= TIMESTAMP '2024-01-10') AS n_precedes,
           COUNT(*) FILTER (WHERE p_from >= TIMESTAMP '2024-01-20') AS n_succeeds,
           COUNT(*) FILTER (WHERE p_from <= TIMESTAMP '2024-01-15'
                              AND TIMESTAMP '2024-01-15' < p_to) AS n_contains_t
    FROM p
    """,
)
def period_allen(spark, sf_dir):
    """Allen's interval algebra over period structs (reference
    expression/temporal.clj:2001-2080), via xtdb_spark.functions.periods."""
    e = ld(spark, sf_dir, "events")
    p = period(F.col("ts"), F.col("ts") + F.expr("INTERVAL 1 HOUR"))
    q = period(F.lit("2024-01-10"), F.lit("2024-01-20"))
    mid = F.lit("2024-01-15").cast("timestamp")
    df = e.select(p.alias("p"))
    return df.agg(
        F.count(F.when(p_overlaps(F.col("p"), q), 1)).alias("n_overlaps"),
        F.count(F.when(
            (F.lit("2024-01-10").cast("timestamp") <= F.col("p._from"))
            & (F.col("p._to") <= F.lit("2024-01-20").cast("timestamp")), 1))
        .alias("n_contained"),
        F.count(F.when(p_precedes(F.col("p"), q), 1)).alias("n_precedes"),
        F.count(F.when(p_succeeds(F.col("p"), q), 1)).alias("n_succeeds"),
        F.count(F.when(p_contains_ts(F.col("p"), mid), 1)).alias("n_contains_t"),
    )


@register(
    "fn_array_ops",
    """
    SELECT doc_id,
           len(words) AS n_words,
           words[1] AS first_word,
           words[2] AS second_word,
           words[len(words)] AS last_word,
           list_contains(words, 'spark') AS has_spark,
           array_to_string(words[1:3], '_') AS first3
    FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents
          WHERE doc_id < 50)
    """,
)
def array_ops(spark, sf_dir):
    """Array/nested fns: cardinality/nth/array ops
    (expression.clj:2159-2250)."""
    d = (ld(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
         .select("doc_id", F.split("text", " ").alias("words")))
    return d.select(
        "doc_id",
        F.size("words").alias("n_words"),
        F.element_at("words", 1).alias("first_word"),
        F.element_at("words", 2).alias("second_word"),
        F.element_at("words", -1).alias("last_word"),
        F.array_contains("words", "spark").alias("has_spark"),
        F.array_join(F.slice("words", 1, 3), "_").alias("first3"),
    )


@register(
    "fn_struct_get_field",
    """
    SELECT info.segment AS segment,
           info.stats.bal AS bal,
           COUNT(*) AS n
    FROM (SELECT {'segment': c_mktsegment,
                  'stats': {'bal': CAST(FLOOR(c_acctbal / 1000) AS BIGINT)}} AS info
          FROM customer)
    GROUP BY segment, bal
    """,
)
def struct_get_field(spark, sf_dir):
    """Struct construction + get_field nested access
    (expression.clj:1930-1961)."""
    c = ld(spark, sf_dir, "customer")
    info = F.struct(
        F.col("c_mktsegment").alias("segment"),
        F.struct(F.floor(F.col("c_acctbal") / 1000).cast("long").alias("bal"))
        .alias("stats"))
    return (c.select(info.alias("info"))
            .select(F.col("info.segment").alias("segment"),
                    F.col("info.stats.bal").alias("bal"))
            .groupBy("segment", "bal").agg(F.count("*").alias("n")))


@register(
    "fn_try_cast_battery",
    """
    SELECT doc_id,
           TRY_CAST(s_int AS BIGINT) AS as_int,
           TRY_CAST(s_num AS DOUBLE) AS as_dbl,
           TRY_CAST(s_date AS DATE) AS as_date,
           TRY_CAST(lang AS BIGINT) AS lang_as_int
    FROM (SELECT doc_id, lang,
                 CASE WHEN doc_id % 3 = 0 THEN CAST(doc_id AS VARCHAR)
                      ELSE 'not-a-number' END AS s_int,
                 CASE WHEN doc_id % 2 = 0
                      THEN CAST(doc_id AS VARCHAR) || '.25'
                      ELSE '1e' END AS s_num,
                 CASE WHEN doc_id % 4 = 0 THEN '2024-03-0'
                        || CAST(doc_id % 9 + 1 AS VARCHAR)
                      ELSE 'yesterday-ish' END AS s_date
          FROM documents WHERE doc_id < 60)
    ORDER BY doc_id
    """,
)
def try_cast_battery(spark, sf_dir):
    """Safe casts: TRY_CAST yields NULL instead of erroring on
    malformed input — the lenient counterpart of the strict cast
    family (reference cast semantics expression.clj; Spark try_cast ↔
    DuckDB TRY_CAST agree on what parses)."""
    d = ld(spark, sf_dir, "documents").filter(F.col("doc_id") < 60)
    s_int = F.when(F.col("doc_id") % 3 == 0,
                   F.col("doc_id").cast("string")).otherwise("not-a-number")
    s_num = F.when(F.col("doc_id") % 2 == 0,
                   F.concat(F.col("doc_id").cast("string"), F.lit(".25"))
                   ).otherwise("1e")
    s_date = F.when(F.col("doc_id") % 4 == 0,
                    F.concat(F.lit("2024-03-0"),
                             (F.col("doc_id") % 9 + 1).cast("string"))
                    ).otherwise("yesterday-ish")
    return (d.select(
        "doc_id",
        s_int.try_cast("bigint").alias("as_int"),
        s_num.try_cast("double").alias("as_dbl"),
        s_date.try_cast("date").alias("as_date"),
        F.col("lang").try_cast("bigint").alias("lang_as_int"),
    ).orderBy("doc_id"))
