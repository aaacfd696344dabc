"""ClickBench-parity battery over the `events` / `documents` tables.

The reference benches ClickBench's 43 `hits` queries via
`modules/bench/src/main/clojure/xtdb/bench/clickbench.clj:23,95-102,
177-205` (HugSQL file clickbench.sql, sizes small/full). The `hits`
schema isn't in the driver's testdata, so each entry here adapts one
canonical ClickBench query SHAPE to events(event_id, ts, user_id,
event_type, value, props) or documents(doc_id, text, lang, source,
n_chars) — same aggregation/filter/topk structure, same physical
challenges (wide-group topk, LIKE scans, regex extraction, minute
histograms, grouped paging with deep offsets).

Complete map, reference clickbench.sql query number → entry
(every number has a passing oracle-backed analogue; the two
annotated ones differ only where `hits`-only semantics force it):

| ref | entry | ref | entry |
|-----|-------|-----|-------|
| q1-q3   | cb_simple_aggs          | q24 | cb_wide_row_page |
| q4      | cb_simple_aggs (AVG)    | q25 | cb_sort_page_time |
| q5-q6   | cb_distinct_counts      | q26 | cb_sort_page_string |
| q7      | cb_minmax_ts            | q27 | cb_sort_page_two_key |
| q8      | cb_group_count_topk     | q28 | cb_length_having |
| q9      | cb_distinct_users_per_type | q29 | cb_regex_extract_agg |
| q10     | cb_region_metrics_topk  | q30 | cb_wide_sum_battery |
| q11     | cb_group_count_topk     | q31-q32 | cb_conditional_sums |
| q12     | cb_two_key_distinct_grid | q33 | cb_two_level_grouping |
| q13     | cb_text_key_count_topk  | q34 | cb_highcard_string_topk |
| q14-q15 | cb_two_key_topk         | q35 | cb_const_cross_group |
| q16     | cb_highcard_user_topk   | q36 | cb_derived_key_grid |
| q17     | cb_user_key_topk        | q37-q38 | cb_ordered_page |
| q18     | cb_user_key_topk (†)    | q39 | cb_grid_offset_page |
| q19     | cb_user_minute_type_grid | q40 | cb_case_src_dst_grid |
| q20     | cb_point_lookup         | q41 | cb_inlist_point_grid |
| q21     | cb_like_scan            | q42 | cb_grid_offset_page |
| q22     | cb_string_minmax        | q43 | cb_minute_histogram |
| q23     | cb_like_scan + cb_string_minmax | | |

(†) ref q18 is `GROUP BY … LIMIT 10` with NO order — its result set
is engine-nondeterministic by construction, so the analogue keeps
the grouped-limit plan shape but adds the deterministic order the
oracle hash needs. ref q30 sums 90 shifted copies of one column; the
analogue keeps the many-aggregates-one-scan shape at 30 (the
codegen-width stress is the same class).

Every entry is oracle-checked. Top-k orderings carry full
deterministic tiebreakers so the value-hash comparison is stable on
both engines (string sort keys tie-break through MIN(id), never raw
collation). All expressions are JVM-side built-ins — no Python in
any of these paths.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from xtdb_spark.queries.registry import (
    davg, dsum, ld, register, sql_davg, sql_dsum,
)


def _with_k(e, col: str = "k"):
    """Dictionary JOIN for JSON extraction: parse `props->>'$.k'` once
    per DISTINCT props string (broadcast dict) and hash-probe the fact
    rows, instead of running a full JSON parse per row. A columnar
    engine gets this for free from dictionary-encoded strings —
    Spark's get_json_object re-parses every row (measured: the parse
    IS the per-core gap on these heads). Correct at any cardinality;
    the broadcast assumes a bounded dictionary (true for any
    dictionary-compressible column — at 100 TB, gate on the parquet
    dictionary/ndv stats and fall back to per-row parse when the
    distinct count exceeds the broadcast budget)."""
    d = e.select("props").distinct()
    parsed = d.withColumn(
        col, F.get_json_object(F.col("props"), "$.k").cast("int"))
    return e.join(F.broadcast(parsed), "props", "left")


@register(
    "cb_simple_aggs",
    f"""
    SELECT COUNT(*) AS n,
           COUNT(*) FILTER (WHERE event_type = 'error') AS n_errors,
           {sql_dsum('value', 'sum_value')},
           {sql_davg('value', 'avg_value')},
           CAST(SUM(user_id) AS BIGINT) AS sum_user
    FROM events
    """,
)
def cb_simple_aggs(spark, sf_dir):
    """ClickBench Q0-Q3 shape: whole-table scan aggregates (COUNT,
    filtered COUNT, SUM, AVG). One pass, map-side partial agg, no
    shuffle beyond the single-row merge."""
    e = ld(spark, sf_dir, "events")
    return e.agg(
        F.count("*").alias("n"),
        F.count(F.when(F.col("event_type") == "error", 1)).alias("n_errors"),
        dsum(F.col("value"), "sum_value"),
        davg(F.col("value"), "avg_value"),
        F.sum("user_id").alias("sum_user"))


@register(
    "cb_distinct_counts",
    """
    SELECT COUNT(DISTINCT user_id) AS n_users,
           COUNT(DISTINCT props->>'$.k') AS n_props,
           COUNT(DISTINCT event_type) AS n_types
    FROM events
    """,
)
def cb_distinct_counts(spark, sf_dir):
    """ClickBench Q4-Q5 shape: COUNT(DISTINCT) over high- and
    low-cardinality columns. The JSON distinct dedupes the raw props
    STRING first (parse once per distinct value, in its own tiny
    pass cross-joined back) so only the user/type distincts ride the
    Expand (2x rows instead of 3x). Same-JVM sf10 A/B: ~2.1 s vs
    ~2.0 s for the full 3-way Expand — the user_id distinct
    dominates either way; kept for the parse removal. At 100 TB swap
    for approx_count_distinct (see op_agg_approx, which verifies the
    sketch's error bound)."""
    e = ld(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k")
    m = e.agg(F.countDistinct("user_id").alias("n_users"),
              F.countDistinct("event_type").alias("n_types"))
    props = (e.select("props").distinct()
             .agg(F.countDistinct(k).alias("n_props")))
    return (m.crossJoin(props)
            .select("n_users", "n_props", "n_types"))


@register(
    "cb_minmax_ts",
    """
    SELECT MIN(ts) AS min_ts, MAX(ts) AS max_ts,
           CAST(epoch(MAX(ts)) - epoch(MIN(ts)) AS BIGINT) AS span_seconds
    FROM events
    """,
)
def cb_minmax_ts(spark, sf_dir):
    """ClickBench Q6 shape: MIN/MAX over the event-time column —
    answerable from parquet footer stats at scale (see xt.trie_stats
    / sources/info_schema.py footer-stats path). Span mirrors the
    oracle's CAST(epoch(max)-epoch(min) AS BIGINT): microsecond epochs
    divided to fractional seconds, subtracted, then rounded HALF_UP
    (DuckDB's double->bigint cast rounds ties away from zero; session
    tz pinned UTC so NTZ epoch matches DuckDB's epoch()). The old
    unix_timestamp spelling truncated EACH endpoint's fraction, which
    overstates the span by 1 s whenever frac(max) < frac(min) and the
    true fraction rounds down."""
    e = ld(spark, sf_dir, "events")
    epoch = lambda c: F.unix_micros(c.cast("timestamp")) / F.lit(1000000.0)
    return e.agg(F.min("ts").alias("min_ts"), F.max("ts").alias("max_ts")) \
        .withColumn("span_seconds",
                    F.round(epoch(F.col("max_ts"))
                            - epoch(F.col("min_ts"))).cast("long"))


@register(
    "cb_group_count_topk",
    """
    SELECT CAST(props->>'$.k' AS INTEGER) AS k, COUNT(*) AS n
    FROM events
    GROUP BY k
    ORDER BY n DESC, k
    LIMIT 10
    """,
)
def cb_group_count_topk(spark, sf_dir):
    """ClickBench Q7/Q10 shape: GROUP BY one key, ORDER BY count
    LIMIT k. Partial-agg then TakeOrderedAndProject — no global
    sort. Dictionary two-level: count the raw props string (primitive
    hash pass), parse once per distinct, merge counts."""
    e = ld(spark, sf_dir, "events")
    g = e.groupBy("props").agg(F.count("*").alias("__n"))
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    return (g.groupBy(k.alias("k")).agg(F.sum("__n").alias("n"))
            .orderBy(F.desc("n"), "k").limit(10))


@register(
    "cb_region_metrics_topk",
    f"""
    SELECT CAST(props->>'$.k' AS INTEGER) // 10 AS region,
           {sql_dsum('value', 'sum_value')},
           COUNT(*) AS n,
           {sql_davg('value', 'avg_value')},
           COUNT(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY region
    ORDER BY n_users DESC, region
    LIMIT 10
    """,
)
def cb_region_metrics_topk(spark, sf_dir):
    """ClickBench Q9 shape: per-region mixed aggregates including a
    distinct count, top-k by the distinct count. One primitive pass:
    the region key comes from the broadcast JSON dictionary
    (`_with_k`) instead of a per-row parse, and stage 1 groups by
    (region, user_id) with long fixed-point partial sums — so the
    distinct count falls out as stage 2's row count per region
    (COUNT(DISTINCT u) == the number of (region, u) groups), the
    Expand the mixed distinct/non-distinct agg would need never
    happens, and the slow wide-decimal arithmetic only touches the
    ~|regions × users| stage-1 partials. Bit-identical to the
    decimal(38,6) route (same per-row fx rounding, exact integer
    sums both levels — registry.fx/fx_total)."""
    from xtdb_spark.queries.registry import fx, fx_total

    e = _with_k(ld(spark, sf_dir, "events"))
    e = e.withColumn("region", (F.col("k") / F.lit(10)).cast("int"))
    g1 = (e.groupBy("region", "user_id")
          .agg(F.sum(fx(F.col("value"))).alias("__s"),
               F.count("value").alias("__c"),
               F.count("*").alias("__n")))
    return (g1.groupBy("region")
            .agg(fx_total(F.col("__s")).cast("double").alias("sum_value"),
                 F.sum("__n").alias("n"),
                 (fx_total(F.col("__s")).cast("double")
                  / F.sum("__c").cast("double")).alias("avg_value"),
                 F.count(F.col("user_id")).alias("n_users"))
            .select("region", "sum_value", "n", "avg_value", "n_users")
            .orderBy(F.desc("n_users"), "region").limit(10))


@register(
    "cb_two_key_topk",
    """
    SELECT event_type, CAST(props->>'$.k' AS INTEGER) AS k, COUNT(*) AS n
    FROM events
    WHERE event_type <> 'view'
    GROUP BY event_type, k
    ORDER BY n DESC, event_type, k
    LIMIT 10
    """,
)
def cb_two_key_topk(spark, sf_dir):
    """ClickBench Q13/Q14 shape: two-key GROUP BY with a non-empty
    filter, top-k by count. Dictionary two-level over the raw
    (event_type, props) pair, parse per distinct, merge."""
    e = ld(spark, sf_dir, "events").filter(F.col("event_type") != "view")
    g = e.groupBy("event_type", "props").agg(F.count("*").alias("__n"))
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    return (g.groupBy("event_type", k.alias("k"))
            .agg(F.sum("__n").alias("n"))
            .orderBy(F.desc("n"), "event_type", "k").limit(10))


@register(
    "cb_user_key_topk",
    """
    SELECT user_id, CAST(props->>'$.k' AS INTEGER) AS k, COUNT(*) AS n
    FROM events
    GROUP BY user_id, k
    ORDER BY n DESC, user_id, k
    LIMIT 10
    """,
)
def cb_user_key_topk(spark, sf_dir):
    """ClickBench Q16-Q17 shape: high-cardinality (user × key)
    grouping, top-k. The group count approaches the row count — the
    shape that punishes engines whose aggregation can't spill. The
    final group is high-cardinality so pre-grouping buys nothing;
    instead the JSON parse becomes a broadcast dictionary JOIN
    (`_with_k`): hash-probe per row instead of a JSON parse per
    row."""
    e = _with_k(ld(spark, sf_dir, "events"))
    return (e.groupBy("user_id", "k")
            .agg(F.count("*").alias("n"))
            .orderBy(F.desc("n"), "user_id", "k").limit(10))


@register(
    "cb_point_lookup",
    """
    SELECT event_id, ts, event_type, value
    FROM events
    WHERE user_id = 42
    ORDER BY ts, event_id
    LIMIT 20
    """,
)
def cb_point_lookup(spark, sf_dir):
    """ClickBench Q19 shape: point filter on a key column. The
    predicate reaches the parquet scan (PushedFilters) so row-group
    stats skip non-matching files at scale."""
    e = ld(spark, sf_dir, "events")
    return (e.filter(F.col("user_id") == 42)
            .select("event_id", "ts", "event_type", "value")
            .orderBy("ts", "event_id").limit(20))


@register(
    "cb_like_scan",
    """
    SELECT COUNT(*) AS n,
           CAST(MIN(event_id) AS BIGINT) AS min_event,
           CAST(MAX(user_id) AS BIGINT) AS max_user
    FROM events
    WHERE props LIKE '%"k": 7%' AND event_type LIKE '%c%'
    """,
)
def cb_like_scan(spark, sf_dir):
    """ClickBench Q20-Q22 shape: LIKE substring scans over a string
    column plus aggregates. Stays in whole-stage codegen (Contains on
    UTF8String) — ClickBench's URL LIKE '%google%'."""
    e = ld(spark, sf_dir, "events")
    return (e.filter(F.col("props").like('%"k": 7%')
                     & F.col("event_type").like("%c%"))
            .agg(F.count("*").alias("n"),
                 F.min("event_id").alias("min_event"),
                 F.max("user_id").alias("max_user")))


@register(
    "cb_regex_extract_agg",
    """
    SELECT regexp_extract(props, '"k":\\s*(\\d+)', 1) AS k_str,
           COUNT(*) AS n,
           ROUND(CAST(SUM(CAST(length(props) AS BIGINT)) AS DOUBLE)
                 / COUNT(*), 6) AS avg_len
    FROM events
    WHERE props LIKE '%"k"%'
    GROUP BY k_str
    ORDER BY n DESC, k_str
    LIMIT 25
    """,
)
def cb_regex_extract_agg(spark, sf_dir):
    """ClickBench Q28 shape: regex extraction + length aggregates,
    top-25. Regex runs per-row JVM-side; the integer-exact avg (sum
    of lengths / count) keeps the hash stable across engines."""
    e = ld(spark, sf_dir, "events").filter(F.col("props").like('%"k"%'))
    k = F.regexp_extract(F.col("props"), r'"k":\s*(\d+)', 1)
    return (e.groupBy(k.alias("k_str"))
            .agg(F.count("*").alias("n"),
                 F.round(F.sum(F.length("props").cast("long")).cast("double")
                         / F.count("*"), 6).alias("avg_len"))
            .orderBy(F.desc("n"), "k_str").limit(25))


@register(
    "cb_conditional_sums",
    f"""
    SELECT CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_purchase,
           {sql_dsum("CASE WHEN event_type = 'purchase' THEN value ELSE 0 END",
                     'purchase_value')},
           {sql_dsum("CASE WHEN event_type = 'click' THEN value ELSE 0 END",
                     'click_value')},
           {sql_dsum("CASE WHEN user_id % 2 = 0 THEN value END",
                     'even_user_value')}
    FROM events
    """,
)
def cb_conditional_sums(spark, sf_dir):
    """ClickBench Q30-Q32 shape: many conditional sums in one scan
    (the reference's `sum(case …)` batteries) — one pass, one
    single-row merge."""
    e = ld(spark, sf_dir, "events")
    v = F.col("value")
    t = F.col("event_type")
    return e.agg(
        F.sum(F.when(t == "purchase", 1).otherwise(0)).alias("n_purchase"),
        dsum(F.when(t == "purchase", v).otherwise(F.lit(0)), "purchase_value"),
        dsum(F.when(t == "click", v).otherwise(F.lit(0)), "click_value"),
        dsum(F.when(F.col("user_id") % 2 == 0, v), "even_user_value"))


@register(
    "cb_ordered_page",
    """
    SELECT event_id, user_id, ts
    FROM events
    WHERE event_type = 'view' AND value > 100
    ORDER BY ts DESC, event_id
    LIMIT 10 OFFSET 10
    """,
)
def cb_ordered_page(spark, sf_dir):
    """ClickBench Q36-Q39 shape: filtered ORDER BY … LIMIT/OFFSET
    pagination. offset+limit on the sorted stream — Spark executes
    top-(offset+limit) then drops the head, no global sort."""
    e = ld(spark, sf_dir, "events")
    return (e.filter((F.col("event_type") == "view") & (F.col("value") > 100))
            .select("event_id", "user_id", "ts")
            .orderBy(F.desc("ts"), "event_id")
            .offset(10).limit(10))


@register(
    "cb_minute_histogram",
    """
    SELECT CAST(date_trunc('minute', ts) AS TIMESTAMP) AS minute,
           COUNT(*) AS n
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-10' AND ts < TIMESTAMP '2024-01-11'
    GROUP BY minute
    ORDER BY minute
    LIMIT 100
    """,
)
def cb_minute_histogram(spark, sf_dir):
    """ClickBench Q40-Q42 shape: minute-bucketed event histogram over
    a time window. The range predicate is pushed to the scan; the
    bucketing is arithmetic (date_trunc), not a join."""
    e = ld(spark, sf_dir, "events")
    return (e.filter((F.col("ts") >= "2024-01-10") & (F.col("ts") < "2024-01-11"))
            .groupBy(F.date_trunc("minute", "ts").alias("minute"))
            .agg(F.count("*").alias("n"))
            .orderBy("minute").limit(100))


@register(
    "cb_distinct_users_per_type",
    """
    SELECT event_type, COUNT(DISTINCT user_id) AS n_users,
           COUNT(*) AS n
    FROM events
    GROUP BY event_type
    ORDER BY n_users DESC, event_type
    """,
)
def cb_distinct_users_per_type(spark, sf_dir):
    """ClickBench Q8 shape: distinct counts per group, ordered by
    the distinct count."""
    e = ld(spark, sf_dir, "events")
    return (e.groupBy("event_type")
            .agg(F.countDistinct("user_id").alias("n_users"),
                 F.count("*").alias("n"))
            .orderBy(F.desc("n_users"), "event_type"))


@register(
    "cb_wide_row_page",
    """
    SELECT event_id, ts, user_id, event_type, value, props
    FROM events
    WHERE props LIKE '%"k": 1%'
    ORDER BY ts, event_id
    LIMIT 10
    """,
)
def cb_wide_row_page(spark, sf_dir):
    """ClickBench Q23 shape: SELECT * row fetch under a string
    filter with ordered paging — reads every column, so column
    pruning does nothing and the limit must bound the sort."""
    e = ld(spark, sf_dir, "events")
    return (e.filter(F.col("props").like('%"k": 1%'))
            .select("event_id", "ts", "user_id", "event_type",
                    "value", "props")
            .orderBy("ts", "event_id").limit(10))


@register(
    "cb_two_level_grouping",
    """
    SELECT n_types, COUNT(*) AS n_users
    FROM (SELECT user_id, COUNT(DISTINCT event_type) AS n_types
          FROM events GROUP BY user_id)
    GROUP BY n_types
    ORDER BY n_types
    """,
)
def cb_two_level_grouping(spark, sf_dir):
    """ClickBench Q33 shape: aggregate of an aggregate (histogram of
    per-user type diversity) — two grouping levels, the second over
    the first's output."""
    e = ld(spark, sf_dir, "events")
    per_user = (e.groupBy("user_id")
                .agg(F.countDistinct("event_type").alias("n_types")))
    return (per_user.groupBy("n_types").agg(F.count("*").alias("n_users"))
            .orderBy("n_types"))


@register(
    "cb_string_minmax",
    """
    SELECT event_type, MIN(props) AS min_props, MAX(props) AS max_props,
           COUNT(*) AS n
    FROM events
    WHERE props LIKE '%"k": 2%'
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def cb_string_minmax(spark, sf_dir):
    """ClickBench Q21-Q22 shape: string MIN/MAX per group under a
    LIKE filter (binary collation identical on both engines)."""
    e = ld(spark, sf_dir, "events").filter(F.col("props").like('%"k": 2%'))
    return (e.groupBy("event_type")
            .agg(F.min("props").alias("min_props"),
                 F.max("props").alias("max_props"),
                 F.count("*").alias("n"))
            .orderBy("event_type"))


@register(
    "cb_avg_json_per_type",
    """
    SELECT event_type,
           ROUND(CAST(SUM(CAST(CAST(props->>'$.k' AS INTEGER) AS BIGINT))
                      AS DOUBLE) / COUNT(props->>'$.k'), 6) AS avg_k,
           COUNT(*) AS n
    FROM events
    GROUP BY event_type
    ORDER BY avg_k DESC, event_type
    """,
)
def cb_avg_json_per_type(spark, sf_dir):
    """ClickBench Q3 shape crossed with JSON extraction: integer-
    exact average of a JSON field per group (sum of ints / count —
    hash-stable without a decimal detour). Dictionary-style
    two-level aggregate: group the RAW (event_type, props) pair
    first — the whole data pass stays a primitive hash-count — then
    parse each distinct string once and merge weighted sums
    (sum(k·n)/count is the same integer arithmetic as the per-row
    sum). What a columnar engine gets from dictionary encoding,
    expressed as algebra."""
    e = ld(spark, sf_dir, "events")
    g = (e.groupBy("event_type", "props")
         .agg(F.count("*").alias("__n")))
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    g = g.withColumn("__k", k)
    return (g.groupBy("event_type")
            .agg(F.round(
                F.sum(F.col("__k").cast("long") * F.col("__n"))
                .cast("double")
                / F.sum(F.when(F.col("__k").isNotNull(),
                               F.col("__n")).otherwise(0)), 6)
                .alias("avg_k"),
                 F.sum("__n").alias("n"))
            .orderBy(F.desc("avg_k"), "event_type"))


# ------------------------------------------------------------------
# Round-9 additions: the previously-unmapped reference query numbers
# (clickbench.sql q12, q13, q16, q19, q25-q28, q30, q34-q36,
# q39-q42). See the module docstring for the full 43-query map.


@register(
    "cb_two_key_distinct_grid",
    """
    SELECT event_type, CAST(props->>'$.k' AS INTEGER) % 8 AS kb,
           COUNT(DISTINCT user_id) AS u
    FROM events
    WHERE event_type <> ''
    GROUP BY event_type, kb
    ORDER BY u DESC, event_type, kb
    LIMIT 10
    """,
)
def cb_two_key_distinct_grid(spark, sf_dir):
    """ClickBench q12 shape (mobile_phone × model distinct-user
    grid): two-key GROUP BY with COUNT(DISTINCT high-card) top-k.
    Two-level: stage 1 groups by (type, kb, user) — a plain
    primitive hash pass — and the distinct count falls out as stage
    2's row count, no Expand."""
    e = _with_k(ld(spark, sf_dir, "events"))
    e = (e.filter(F.col("event_type") != "")
         .withColumn("kb", (F.col("k") % 8).cast("int")))
    g1 = e.groupBy("event_type", "kb", "user_id").agg(F.lit(1).alias("__o"))
    return (g1.groupBy("event_type", "kb")
            .agg(F.count("*").alias("u"))
            .orderBy(F.desc("u"), "event_type", "kb").limit(10))


@register(
    "cb_text_key_count_topk",
    """
    SELECT source, COUNT(*) AS c
    FROM documents
    WHERE source <> ''
    GROUP BY source
    ORDER BY c DESC, source
    LIMIT 10
    """,
)
def cb_text_key_count_topk(spark, sf_dir):
    """ClickBench q13 shape (search_phrase count top-10): single
    TEXT key count under a non-empty filter. Partial agg +
    TakeOrderedAndProject."""
    d = ld(spark, sf_dir, "documents")
    return (d.filter(F.col("source") != "")
            .groupBy("source").agg(F.count("*").alias("c"))
            .orderBy(F.desc("c"), "source").limit(10))


@register(
    "cb_highcard_user_topk",
    """
    SELECT user_id, COUNT(*) AS c
    FROM events
    GROUP BY user_id
    ORDER BY c DESC, user_id
    LIMIT 10
    """,
)
def cb_highcard_user_topk(spark, sf_dir):
    """ClickBench q16 shape (user_id count top-10): single HIGH-
    CARDINALITY numeric key, the hash-agg-size stress of the
    battery. Also stands in for q18's grouped-limit plan shape (ref
    q18 orders by nothing — nondeterministic by construction — so
    the deterministic tiebreak here is the oracle-comparable
    variant)."""
    e = ld(spark, sf_dir, "events")
    return (e.groupBy("user_id").agg(F.count("*").alias("c"))
            .orderBy(F.desc("c"), "user_id").limit(10))


@register(
    "cb_user_minute_type_grid",
    """
    SELECT user_id, CAST(EXTRACT(MINUTE FROM ts) AS INTEGER) AS m,
           event_type, COUNT(*) AS c
    FROM events
    GROUP BY user_id, m, event_type
    ORDER BY c DESC, user_id, m, event_type
    LIMIT 10
    """,
)
def cb_user_minute_type_grid(spark, sf_dir):
    """ClickBench q19 shape (user × extract(minute) × phrase): a
    derived time key inside a three-key grid, top-k by count. The
    extraction is arithmetic on the scan — no join, one shuffle."""
    e = ld(spark, sf_dir, "events")
    return (e.groupBy("user_id",
                      F.minute("ts").alias("m"),
                      "event_type")
            .agg(F.count("*").alias("c"))
            .orderBy(F.desc("c"), "user_id", "m", "event_type")
            .limit(10))


@register(
    "cb_sort_page_time",
    """
    SELECT event_id, event_type, ts
    FROM events
    WHERE event_type <> ''
    ORDER BY ts, event_id
    LIMIT 10
    """,
)
def cb_sort_page_time(spark, sf_dir):
    """ClickBench q25 shape (phrase ORDER BY event_time LIMIT):
    filtered projection under a TIME sort. TakeOrdered — no global
    sort; at scale the parquet min/max time stats prune most files
    before the scan."""
    e = ld(spark, sf_dir, "events")
    return (e.filter(F.col("event_type") != "")
            .select("event_id", "event_type", "ts")
            .orderBy("ts", "event_id").limit(10))


@register(
    "cb_sort_page_string",
    """
    SELECT doc_id, source, n_chars
    FROM documents
    WHERE source <> ''
    ORDER BY source, doc_id
    LIMIT 10
    """,
)
def cb_sort_page_string(spark, sf_dir):
    """ClickBench q26 shape (ORDER BY search_phrase LIMIT): STRING
    sort key (binary collation, ASCII synthetic — identical on both
    engines), doc_id tiebreak."""
    d = ld(spark, sf_dir, "documents")
    return (d.filter(F.col("source") != "")
            .select("doc_id", "source", "n_chars")
            .orderBy("source", "doc_id").limit(10))


@register(
    "cb_sort_page_two_key",
    """
    SELECT event_id, ts, event_type
    FROM events
    WHERE event_type <> ''
    ORDER BY ts, event_type, event_id
    LIMIT 10
    """,
)
def cb_sort_page_two_key(spark, sf_dir):
    """ClickBench q27 shape (ORDER BY event_time, search_phrase):
    composite time+string sort under a filter."""
    e = ld(spark, sf_dir, "events")
    return (e.filter(F.col("event_type") != "")
            .select("event_id", "ts", "event_type")
            .orderBy("ts", "event_type", "event_id").limit(10))


@register(
    "cb_length_having",
    """
    SELECT source,
           CAST(SUM(CAST(LENGTH(text) AS BIGINT)) AS DOUBLE)
               / COUNT(text) AS l,
           COUNT(*) AS c
    FROM documents
    WHERE text <> ''
    GROUP BY source
    HAVING COUNT(*) > 10
    ORDER BY l DESC, source
    LIMIT 25
    """,
)
def cb_length_having(spark, sf_dir):
    """ClickBench q28 shape (counter_id AVG(length(url)) HAVING
    COUNT > N): a computed-length aggregate with a HAVING count
    floor. The average is integer-exact (bigint sum / count, one
    double division — hash-stable without a decimal detour)."""
    d = ld(spark, sf_dir, "documents").filter(F.col("text") != "")
    return (d.groupBy("source")
            .agg((F.sum(F.length("text").cast("long")).cast("double")
                  / F.count("text")).alias("l"),
                 F.count("*").alias("c"))
            .filter(F.col("c") > 10)
            .orderBy(F.desc("l"), "source").limit(25))


@register(
    "cb_wide_sum_battery",
    """
    SELECT """ + ", ".join(
        f"SUM(v100 + {i}) AS s{i}" for i in range(30)) + """
    FROM (SELECT CAST(ROUND(value * 100) AS BIGINT) AS v100
          FROM events) t
    """,
)
def cb_wide_sum_battery(spark, sf_dir):
    """ClickBench q30 shape (90 SUM(ResolutionWidth + i) in one
    scan): many aggregates over one pass — a codegen-width /
    projection-width stress, not a data-volume one (30 here; the
    class is the same). The column quantizes to exact bigints
    (2-decimal synthetic values × 100) so every sum is hash-exact."""
    e = ld(spark, sf_dir, "events")
    v = F.round(F.col("value") * 100).cast("long")
    t = e.select(v.alias("v100"))
    return t.agg(*[F.sum(F.col("v100") + F.lit(i)).alias(f"s{i}")
                   for i in range(30)])


@register(
    "cb_highcard_string_topk",
    """
    SELECT text, COUNT(*) AS c, MIN(doc_id) AS first_id
    FROM documents
    GROUP BY text
    ORDER BY c DESC, first_id
    LIMIT 10
    """,
)
def cb_highcard_string_topk(spark, sf_dir):
    """ClickBench q34 shape (URL count top-10): HIGH-CARDINALITY
    string grouping — the hash table carries full strings, the
    battery's memory-per-group stress. Ties break through
    MIN(doc_id), never raw string collation."""
    d = ld(spark, sf_dir, "documents")
    return (d.groupBy("text")
            .agg(F.count("*").alias("c"), F.min("doc_id").alias("first_id"))
            .orderBy(F.desc("c"), "first_id").limit(10))


@register(
    "cb_const_cross_group",
    """
    SELECT one, event_type, COUNT(*) AS c
    FROM events, (SELECT 1) AS t (one)
    GROUP BY one, event_type
    ORDER BY c DESC, event_type
    LIMIT 10
    """,
)
def cb_const_cross_group(spark, sf_dir):
    """ClickBench q35 shape (hits × (SELECT 1) grouped): a constant
    single-row relation cross-joined into the grid — Catalyst folds
    the broadcast-1-row join to a literal column; the plan is the
    same single-pass agg as without it."""
    e = ld(spark, sf_dir, "events")
    one = spark.range(1).select(F.lit(1).alias("one"))
    return (e.crossJoin(F.broadcast(one))
            .groupBy("one", "event_type").agg(F.count("*").alias("c"))
            .orderBy(F.desc("c"), "event_type").limit(10))


@register(
    "cb_derived_key_grid",
    """
    SELECT user_id, user_id - 1 AS u1, user_id - 2 AS u2,
           user_id - 3 AS u3, COUNT(*) AS c
    FROM events
    GROUP BY user_id, u1, u2, u3
    ORDER BY c DESC, user_id
    LIMIT 10
    """,
)
def cb_derived_key_grid(spark, sf_dir):
    """ClickBench q36 shape (ClientIP, ClientIP-1, -2, -3 grid):
    grouping keys that are pure derivations of one column — the
    optimizer question is whether the agg keys collapse to the base
    column (they share its cardinality exactly)."""
    e = ld(spark, sf_dir, "events")
    return (e.groupBy("user_id",
                      (F.col("user_id") - 1).alias("u1"),
                      (F.col("user_id") - 2).alias("u2"),
                      (F.col("user_id") - 3).alias("u3"))
            .agg(F.count("*").alias("c"))
            .orderBy(F.desc("c"), "user_id").limit(10))


@register(
    "cb_case_src_dst_grid",
    """
    SELECT event_type,
           CASE WHEN CAST(props->>'$.k' AS INTEGER) % 10 = 0
                THEN ''
                ELSE 'k' || CAST(CAST(props->>'$.k' AS INTEGER) % 10
                                 AS VARCHAR) END AS src,
           user_id % 50 AS dst,
           COUNT(*) AS c
    FROM events
    WHERE event_type <> 'view'
    GROUP BY event_type, src, dst
    ORDER BY c DESC, event_type, src, dst
    LIMIT 10 OFFSET 100
    """,
)
def cb_case_src_dst_grid(spark, sf_dir):
    """ClickBench q40 shape (TraficSourceId/Src/Dst pageview grid):
    a CASE-derived source label × destination grid with a deep
    OFFSET page. The CASE is scan-side arithmetic; the offset rides
    the same top-(offset+limit) path as cb_ordered_page."""
    e = _with_k(ld(spark, sf_dir, "events"))
    e = e.filter(F.col("event_type") != "view")
    src = F.when(F.col("k") % 10 == 0, F.lit("")).otherwise(
        F.concat(F.lit("k"), (F.col("k") % 10).cast("string")))
    return (e.groupBy("event_type", src.alias("src"),
                      (F.col("user_id") % 50).alias("dst"))
            .agg(F.count("*").alias("c"))
            .orderBy(F.desc("c"), "event_type", "src", "dst")
            .offset(100).limit(10))


@register(
    "cb_inlist_point_grid",
    """
    SELECT CAST(props->>'$.k' AS INTEGER) AS k, CAST(ts AS DATE) AS d,
           COUNT(*) AS c
    FROM events
    WHERE event_type IN ('click', 'view') AND user_id % 100 = 57
    GROUP BY k, d
    ORDER BY c DESC, k, d
    LIMIT 10 OFFSET 10
    """,
)
def cb_inlist_point_grid(spark, sf_dir):
    """ClickBench q41 shape (TraficSourceId IN (…) AND RefererHash =
    const): an IN-list plus a highly-selective point predicate over
    a two-key grid with an OFFSET page. Both filters push to the
    scan."""
    e = _with_k(ld(spark, sf_dir, "events"))
    e = e.filter(F.col("event_type").isin("click", "view")
                 & (F.col("user_id") % 100 == 57))
    return (e.groupBy(F.col("k"), F.to_date("ts").alias("d"))
            .agg(F.count("*").alias("c"))
            .orderBy(F.desc("c"), "k", "d")
            .offset(10).limit(10))


@register(
    "cb_grid_offset_page",
    """
    SELECT user_id % 40 AS w, CAST(props->>'$.k' AS INTEGER) % 25 AS h,
           COUNT(*) AS c
    FROM events
    WHERE event_type <> 'signup'
    GROUP BY w, h
    ORDER BY c DESC, w, h
    LIMIT 10 OFFSET 500
    """,
)
def cb_grid_offset_page(spark, sf_dir):
    """ClickBench q39/q42 shape (WindowClientWidth × Height grid,
    LIMIT 10 OFFSET 10000): a dense two-int grid paged DEEP into the
    ordering — the offset must not force a global sort
    (top-(offset+limit) heap, then drop the head)."""
    e = _with_k(ld(spark, sf_dir, "events"))
    e = e.filter(F.col("event_type") != "signup")
    return (e.groupBy((F.col("user_id") % 40).alias("w"),
                      (F.col("k") % 25).alias("h"))
            .agg(F.count("*").alias("c"))
            .orderBy(F.desc("c"), "w", "h")
            .offset(500).limit(10))
