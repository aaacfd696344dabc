"""Second scalar-function battery: URI accessors, interval/temporal
arithmetic, overlay/octet string ops, CTE reuse.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from xtdb_spark.queries.registry import dsum, ld, register


@register(
    "fn_uri_battery",
    r"""
    SELECT doc_id, uri,
           regexp_extract(uri, '^([a-z][a-z0-9+.-]*):', 1) AS scheme,
           regexp_extract(uri, '^[a-z][a-z0-9+.-]*://(?:[^/@]*@)?([^/:?#]*)', 1) AS host,
           regexp_extract(uri, '^[a-z][a-z0-9+.-]*://[^/?#]*(/[^?#]*)', 1) AS path,
           regexp_extract(uri, '\?([^#]*)', 1) AS query,
           regexp_extract(uri, '#(.*)$', 1) AS fragment
    FROM (SELECT doc_id,
                 'https://user@host' || CAST(doc_id % 20 AS VARCHAR)
                   || '.example.com/p/' || CAST(doc_id AS VARCHAR)
                   || '?q=' || lang || '#frag' || CAST(doc_id % 3 AS VARCHAR) AS uri
          FROM documents WHERE doc_id < 100)
    """,
)
def uri_battery(spark, sf_dir):
    """URI accessor functions (reference expression/uri.clj:30-64:
    uri_scheme/host/path/query/fragment) via regexp extraction — the
    same expressions both engines run, all Catalyst-side."""
    d = ld(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    uri = F.concat(F.lit("https://user@host"), (F.col("doc_id") % 20).cast("string"),
                   F.lit(".example.com/p/"), F.col("doc_id").cast("string"),
                   F.lit("?q="), F.col("lang"),
                   F.lit("#frag"), (F.col("doc_id") % 3).cast("string"))
    d = d.select("doc_id", uri.alias("uri"))
    return d.select(
        "doc_id", "uri",
        F.regexp_extract("uri", r"^([a-z][a-z0-9+.-]*):", 1).alias("scheme"),
        F.regexp_extract("uri", r"^[a-z][a-z0-9+.-]*://(?:[^/@]*@)?([^/:?#]*)", 1)
        .alias("host"),
        F.regexp_extract("uri", r"^[a-z][a-z0-9+.-]*://[^/?#]*(/[^?#]*)", 1)
        .alias("path"),
        F.regexp_extract("uri", r"\?([^#]*)", 1).alias("query"),
        F.regexp_extract("uri", r"#(.*)$", 1).alias("fragment"),
    )


@register(
    "fn_interval_arithmetic",
    """
    SELECT o_orderkey,
           o_orderdate + INTERVAL 30 DAY AS due_date,
           o_orderdate - INTERVAL 2 HOUR AS t_minus_2h,
           CAST(date_diff('day', o_orderdate, TIMESTAMP '2000-01-01') AS BIGINT)
             AS days_to_y2k,
           CAST((EXTRACT(YEAR FROM TIMESTAMP '2000-06-15')
                 - EXTRACT(YEAR FROM o_orderdate)) * 12
                + (EXTRACT(MONTH FROM TIMESTAMP '2000-06-15')
                   - EXTRACT(MONTH FROM o_orderdate)) AS BIGINT) AS months_apart,
           date_trunc('month', o_orderdate) + INTERVAL 1 MONTH
             - INTERVAL 1 DAY AS month_end
    FROM orders WHERE o_orderkey < 200
    """,
)
def interval_arithmetic(spark, sf_dir):
    """Datetime ± interval arithmetic and age-style differences
    (reference expression/temporal.clj: the +/- interval defmethods,
    `age`, `date_trunc`). month-difference uses an explicit
    year*12+month formula — identical in both engines (Spark's
    months_between and DuckDB's age() round differently)."""
    o = ld(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 200)
    y2k = F.lit("2000-01-01").cast("timestamp")
    jun = F.lit("2000-06-15").cast("timestamp")
    return o.select(
        "o_orderkey",
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAY")).alias("due_date"),
        (F.col("o_orderdate") - F.expr("INTERVAL 2 HOUR")).alias("t_minus_2h"),
        F.datediff(y2k.cast("date"), F.col("o_orderdate").cast("date"))
        .cast("long").alias("days_to_y2k"),
        ((F.year(jun) - F.year("o_orderdate")) * 12
         + (F.month(jun) - F.month("o_orderdate"))).cast("long")
        .alias("months_apart"),
        (F.date_trunc("month", F.col("o_orderdate")) + F.expr("INTERVAL 1 MONTH")
         - F.expr("INTERVAL 1 DAY")).alias("month_end"),
    )


@register(
    "fn_overlay_octet",
    """
    SELECT p_partkey,
           left(p_name, 1) || 'XX' || substr(p_name, 4) AS overlaid,
           CAST(octet_length(CAST(p_name AS BLOB)) AS INTEGER) AS octets,
           CAST(bit_length(p_brand) AS INTEGER) AS bits,
           left(p_name, 4) AS l4, right(p_name, 3) AS r3,
           repeat(p_brand, 2) AS doubled,
           CAST(strpos(p_type, 'O') AS INTEGER) AS o_pos
    FROM part WHERE p_partkey < 300
    """,
)
def overlay_octet(spark, sf_dir):
    """overlay/octet_length (reference expression.clj:1589-1592,
    1562-1572) + left/right/repeat/strpos."""
    p = ld(spark, sf_dir, "part").filter(F.col("p_partkey") < 300)
    return p.select(
        "p_partkey",
        F.overlay("p_name", F.lit("XX"), F.lit(2), F.lit(2)).alias("overlaid"),
        F.octet_length("p_name").alias("octets"),
        F.bit_length("p_brand").alias("bits"),
        F.substring("p_name", 1, 4).alias("l4"),
        F.expr("right(p_name, 3)").alias("r3"),
        F.repeat("p_brand", 2).alias("doubled"),
        F.instr(F.col("p_type"), "O").alias("o_pos"),
    )


@register(
    "op_cte_let",
    """
    WITH seg_stats AS (
      SELECT c_mktsegment AS seg, COUNT(*) AS n,
             CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE) AS total
      FROM customer GROUP BY c_mktsegment
    )
    SELECT a.seg AS seg_a, b.seg AS seg_b, a.n AS n_a, b.n AS n_b
    FROM seg_stats a JOIN seg_stats b ON a.n < b.n
    """,
)
def cte_let(spark, sf_dir):
    """:relation/:let CTE — bind once, reference twice (reference
    operator/let.clj:12-62). Spark analogue: .cache() the bound
    relation so both references reuse one materialization."""
    c = ld(spark, sf_dir, "customer")
    seg = (c.groupBy(F.col("c_mktsegment").alias("seg"))
           .agg(F.count("*").alias("n"), dsum(F.col("c_acctbal"), "total"))
           .cache())
    a, b = seg.alias("a"), seg.alias("b")
    return (a.join(b, F.col("a.n") < F.col("b.n"))
            .select(F.col("a.seg").alias("seg_a"), F.col("b.seg").alias("seg_b"),
                    F.col("a.n").alias("n_a"), F.col("b.n").alias("n_b")))


@register(
    "fn_bit_ops_battery",
    """
    SELECT o_orderkey,
           o_orderkey & 255 AS band,
           o_orderkey | 7 AS bor,
           xor(o_orderkey, 129) AS bxor,
           ~o_orderkey AS bnot,
           o_orderkey << 2 AS shl,
           o_orderkey >> 3 AS shr,
           GREATEST(o_totalprice, 500.0) AS hi,
           LEAST(o_totalprice, 500.0) AS lo,
           string_split(o_orderpriority, '-') AS parts
    FROM orders WHERE o_orderkey < 200
    """,
)
def bit_ops_battery(spark, sf_dir):
    """Bit ops (reference expression.clj:960-999), greatest/least
    (:1032-1040), string_to_array (:1654-1667)."""
    o = ld(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 200)
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).alias("band"),
        k.bitwiseOR(F.lit(7)).alias("bor"),
        k.bitwiseXOR(F.lit(129)).alias("bxor"),
        F.expr("~o_orderkey").alias("bnot"),
        F.shiftleft(k, 2).alias("shl"),
        F.shiftright(k, 3).alias("shr"),
        F.greatest(F.col("o_totalprice"), F.lit(500.0)).alias("hi"),
        F.least(F.col("o_totalprice"), F.lit(500.0)).alias("lo"),
        F.split(F.col("o_orderpriority"), "-").alias("parts"),
    )


@register(
    "fn_age_parts",
    """
    SELECT o_orderkey,
           CAST(date_part('year', age(TIMESTAMP '2000-01-01', o_orderdate))
                AS INTEGER) AS y,
           CAST(date_part('month', age(TIMESTAMP '2000-01-01', o_orderdate))
                AS INTEGER) AS m,
           CAST(date_part('day', age(TIMESTAMP '2000-01-01', o_orderdate))
                AS INTEGER) AS d
    FROM orders
    WHERE o_orderkey < 2000 AND o_orderdate < TIMESTAMP '2000-01-01'
    """,
)
def age_parts(spark, sf_dir):
    """`age` (reference expression/temporal.clj, 5 defmethods):
    calendar year/month/day decomposition of a timestamp difference,
    Postgres borrow convention (day deficit borrows the length of the
    EARLIER date's month — not a calendar walk). Pure field
    arithmetic, no UDF."""
    o = ld(spark, sf_dir, "orders").filter(
        (F.col("o_orderkey") < 2000)
        & (F.col("o_orderdate") < F.lit("2000-01-01").cast("timestamp")))
    a = F.col("o_orderdate")
    by, bm, bd = F.lit(2000), F.lit(1), F.lit(1)
    d_raw = bd - F.dayofmonth(a)
    borrow_d = (d_raw < 0).cast("int")
    d = d_raw + borrow_d * F.dayofmonth(F.last_day(a))
    m_raw = bm - F.month(a) - borrow_d
    borrow_m = (m_raw < 0).cast("int")
    m = m_raw + borrow_m * 12
    y = by - F.year(a) - borrow_m
    return o.select("o_orderkey", y.cast("int").alias("y"),
                    m.cast("int").alias("m"), d.cast("int").alias("d"))


@register(
    "fn_hash_battery",
    """
    SELECT doc_id,
           md5(text) AS h_md5,
           sha256(text) AS h_sha256,
           md5(lower(trim(text))) AS h_norm
    FROM documents WHERE doc_id < 100
    """,
)
def hash_battery(spark, sf_dir):
    """Content hashing (md5/sha256) — the `_iid` hashing family
    (reference expression.clj:1112-1130 hashes docs to iids) and the
    workhorse of content-addressed dedup at 100 TB."""
    d = ld(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return d.select(
        "doc_id",
        F.md5("text").alias("h_md5"),
        F.sha2(F.col("text"), 256).alias("h_sha256"),
        F.md5(F.lower(F.trim(F.col("text")))).alias("h_norm"),
    )


@register(
    "fn_set_map_battery",
    """
    WITH w AS (SELECT doc_id, string_split(trim(text), ' ') AS ws
               FROM documents WHERE doc_id < 20),
    ab AS (SELECT doc_id, list_distinct(ws[1:6]) AS a,
                  list_distinct(ws[4:9]) AS b, ws FROM w),
    u AS (SELECT doc_id, elem FROM (SELECT doc_id, unnest(a) AS elem FROM ab
          UNION SELECT doc_id, unnest(b) AS elem FROM ab)),
    i AS (SELECT doc_id, unnest(a) AS elem FROM ab
          INTERSECT SELECT doc_id, unnest(b) AS elem FROM ab),
    e AS (SELECT doc_id, unnest(a) AS elem FROM ab
          EXCEPT SELECT doc_id, unnest(b) AS elem FROM ab),
    m AS (SELECT doc_id,
                 unnest([CAST(i AS VARCHAR) || ':' || ws[i]
                         FOR i IN [1, 2, 3]]) AS elem
          FROM ab)
    SELECT doc_id, 'union' AS tag, elem FROM u
    UNION ALL SELECT doc_id, 'intersect', elem FROM i
    UNION ALL SELECT doc_id, 'except', elem FROM e
    UNION ALL SELECT doc_id, 'map', elem FROM m
    ORDER BY doc_id, tag, elem
    """,
)
def set_map_battery(spark, sf_dir):
    """`:set` / `:map` type mapping (SURVEY §1.3: set = array +
    dedup-on-write, map = MapType; reference types.clj:206-232): set
    algebra (union/intersect/except with set semantics) over deduped
    word arrays, plus a position-keyed map built with map_from_arrays
    and exploded back to entries. Output is exploded to (doc_id, tag,
    elem) rows so list-internal ordering differences between engines
    can't affect the value hash."""
    d = ld(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    words = F.split(F.trim(F.col("text")), " ")
    base = d.select("doc_id", words.alias("ws"),
                    F.array_distinct(F.slice(words, 1, 6)).alias("a"),
                    F.array_distinct(F.slice(words, 4, 6)).alias("b"))

    def tagged(col, tag):
        return base.select("doc_id", F.explode(col).alias("elem")) \
            .withColumn("tag", F.lit(tag))

    sets = (tagged(F.array_union(F.col("a"), F.col("b")), "union")
            .unionByName(tagged(F.array_intersect(F.col("a"), F.col("b")),
                                "intersect"))
            .unionByName(tagged(F.array_except(F.col("a"), F.col("b")),
                                "except")))
    keys = F.array(*[F.lit(str(i)) for i in (1, 2, 3)])
    vals = F.array(*[F.element_at(F.col("ws"), i) for i in (1, 2, 3)])
    m = (base.select("doc_id",
                     F.explode(F.map_from_arrays(keys, vals))
                     .alias("k", "v"))
         .select("doc_id", F.concat(F.col("k"), F.lit(":"), F.col("v"))
                 .alias("elem"))
         .withColumn("tag", F.lit("map")))
    return (sets.unionByName(m)
            .select("doc_id", "tag", "elem")
            .orderBy("doc_id", "tag", "elem"))


@register(
    "fn_misc_battery",
    r"""
    SELECT k,
           reverse(k) AS rev,
           strpos(k, '/') AS octet_pos,
           CASE WHEN strpos(k, '/') > 0
                THEN substr(k, 1, strpos(k, '/') - 1) END AS kw_namespace,
           CASE WHEN strpos(k, '/') > 0
                THEN substr(k, strpos(k, '/') + 1) ELSE k END AS kw_local,
           CASE WHEN regexp_matches(k, '^[a-z_][a-z0-9_$]*$') THEN k
                ELSE '"' || replace(k, '"', '""') || '"' END AS quoted,
           string_split(k, '/') AS parsed,
           len(w) AS arr_upper, 1 AS arr_lower,
           w[1:len(w) - 2] AS trimmed
    FROM (SELECT lang || '/' || source AS k,
                 string_split(trim(text), ' ')[1:6] AS w
          FROM documents WHERE doc_id < 40)
    ORDER BY k, rev
    """,
)
def misc_battery(spark, sf_dir):
    """Long-tail scalar fns from the reference registry
    (expression.clj codegen-call keywords): reverse, octet_position,
    keyword namespace/local_name accessors (reference :namespace /
    :local_name over :keyword extension values), quote_ident,
    parse_ident (split), array_lower/array_upper (1-based bounds),
    trim_array (drop n from the end)."""
    d = ld(spark, sf_dir, "documents").filter(F.col("doc_id") < 40)
    k = F.concat(F.col("lang"), F.lit("/"), F.col("source"))
    w = F.slice(F.split(F.trim(F.col("text")), " "), 1, 6)
    base = d.select(k.alias("k"), w.alias("w"))
    pos = F.instr(F.col("k"), "/")
    return (base.select(
        "k",
        F.reverse(F.col("k")).alias("rev"),
        pos.cast("long").alias("octet_pos"),
        F.when(pos > 0, F.substring_index(F.col("k"), "/", 1))
        .alias("kw_namespace"),
        F.when(pos > 0, F.expr("substr(k, instr(k, '/') + 1)"))
        .otherwise(F.col("k")).alias("kw_local"),
        F.when(F.col("k").rlike("^[a-z_][a-z0-9_$]*$"), F.col("k"))
        .otherwise(F.concat(F.lit('"'),
                            F.regexp_replace("k", '"', '""'),
                            F.lit('"'))).alias("quoted"),
        F.split(F.col("k"), "/").alias("parsed"),
        F.size("w").cast("long").alias("arr_upper"),
        F.lit(1).alias("arr_lower"),
        F.slice(F.col("w"), 1, F.greatest(F.size("w") - 2, F.lit(0)))
        .alias("trimmed"),
    ).orderBy("k", "rev"))


@register(
    "fn_trig_battery",
    """
    SELECT l_orderkey, l_linenumber,
           ROUND(COS(l_quantity), 6) AS c,
           ROUND(TAN(l_quantity / 100), 6) AS t,
           ROUND(ASIN(l_discount * 9), 6) AS asn,
           ROUND(ACOS(l_discount * 9), 6) AS acs,
           ROUND(ATAN(l_quantity), 6) AS atn,
           ROUND((EXP(l_discount * 5) - EXP(-(l_discount * 5))) / 2, 6) AS snh,
           ROUND((EXP(l_discount * 5) + EXP(-(l_discount * 5))) / 2, 6) AS csh,
           ROUND((EXP(2 * (l_quantity / 10)) - 1)
                 / (EXP(2 * (l_quantity / 10)) + 1), 6) AS tnh,
           ROUND(LOG(2.0, l_extendedprice), 6) AS lg2,
           ROUND(POWER(l_quantity, 0.5), 6) AS pw
    FROM lineitem WHERE l_orderkey < 300
    ORDER BY l_orderkey, l_linenumber
    """,
)
def trig_battery(spark, sf_dir):
    """The full trig/hyperbolic math-op loop (reference
    expression.clj:1755-1757: sin cos tan asin acos atan sinh cosh
    tanh + 2-arg log/power). asin/acos inputs stay in [-1,1] via
    l_discount*9 (discount <= 0.1); 6dp rounding absorbs libm-vs-JVM
    last-ulp noise. The oracle expresses sinh/cosh/tanh via exp
    identities because DuckDB 1.0.0 has no hyperbolic functions."""
    li = ld(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 300)
    q, d, p = F.col("l_quantity"), F.col("l_discount"), F.col("l_extendedprice")
    return (li.select(
        "l_orderkey", "l_linenumber",
        F.round(F.cos(q), 6).alias("c"),
        F.round(F.tan(q / 100), 6).alias("t"),
        F.round(F.asin(d * 9), 6).alias("asn"),
        F.round(F.acos(d * 9), 6).alias("acs"),
        F.round(F.atan(q), 6).alias("atn"),
        F.round(F.sinh(d * 5), 6).alias("snh"),
        F.round(F.cosh(d * 5), 6).alias("csh"),
        F.round(F.tanh(q / 10), 6).alias("tnh"),
        F.round(F.log(2.0, p), 6).alias("lg2"),
        F.round(F.pow(q, 0.5), 6).alias("pw"),
    ).orderBy("l_orderkey", "l_linenumber"))


@register(
    "fn_null_safe_eq",
    """
    SELECT o_orderkey,
           a IS NOT DISTINCT FROM b AS nseq,
           a = b AS eq3vl,
           (a = b) IS NULL AS eq_unknown,
           COALESCE(a = b, FALSE) AS is_true_eq,
           NOT COALESCE(a = b, TRUE) AS is_false_eq,
           a IS NULL AS a_null,
           {'x': a, 'y': 1} = {'x': b, 'y': 1} AS struct_eq,
           [a, 1] = [b, 1] AS list_eq
    FROM (SELECT o_orderkey,
                 CASE WHEN o_orderkey % 3 = 0 THEN NULL
                      ELSE o_orderkey % 5 END AS a,
                 CASE WHEN o_orderkey % 4 = 0 THEN NULL
                      ELSE o_orderkey % 5 END AS b
          FROM orders WHERE o_orderkey < 400)
    ORDER BY o_orderkey
    """,
)
def null_safe_eq(spark, sf_dir):
    """Null-safe `===` (reference expression.clj:812-835) vs 3VL `=`
    (:788-810), the is_true/is_false/is_null boolean accessors
    (:837-855), and struct/list equality (:1962-2010, :2256-2301).
    Spark eqNullSafe == DuckDB IS NOT DISTINCT FROM. Spark's native
    struct/array `=` treats a NULL element pair as FALSE, so the
    struct_eq/list_eq columns route through dyntypes.struct_eq /
    array_eq, which implement the reference's AND-fold 3VL semantics
    (any FALSE pair → FALSE, else any NULL pair → NULL)."""
    from xtdb_spark import dyntypes as dt
    o = ld(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 400)
    a = F.when(F.col("o_orderkey") % 3 == 0, F.lit(None)) \
        .otherwise(F.col("o_orderkey") % 5)
    b = F.when(F.col("o_orderkey") % 4 == 0, F.lit(None)) \
        .otherwise(F.col("o_orderkey") % 5)
    base = o.select("o_orderkey", a.alias("a"), b.alias("b"))
    eq = F.col("a") == F.col("b")
    sl = F.struct(F.col("a").alias("x"), F.lit(1).cast("bigint").alias("y"))
    sr = F.struct(F.col("b").alias("x"), F.lit(1).cast("bigint").alias("y"))
    return (base.select(
        "o_orderkey",
        F.col("a").eqNullSafe(F.col("b")).alias("nseq"),
        eq.alias("eq3vl"),
        eq.isNull().alias("eq_unknown"),
        F.coalesce(eq, F.lit(False)).alias("is_true_eq"),
        (~F.coalesce(eq, F.lit(True))).alias("is_false_eq"),
        F.col("a").isNull().alias("a_null"),
        dt.struct_eq(sl, sr, ["x", "y"]).alias("struct_eq"),
        dt.array_eq(F.array(F.col("a"), F.lit(1).cast("bigint")),
                    F.array(F.col("b"), F.lit(1).cast("bigint")))
        .alias("list_eq"),
    ).orderBy("o_orderkey"))


@register(
    "fn_sql_surface_battery",
    """
    SELECT o_orderkey,
           CAST(date_part('year', age(TIMESTAMP '2000-01-01', o_orderdate))
                AS INTEGER) AS age_y,
           CAST(date_part('month', age(TIMESTAMP '2000-01-01', o_orderdate))
                AS INTEGER) AS age_m,
           CAST(to_timestamp(floor(epoch(o_orderdate) / 86400) * 86400)
                AT TIME ZONE 'UTC' AS TIMESTAMP) AS bin_from,
           CASE WHEN o_orderpriority SIMILAR TO '[a-z_][a-z0-9_]*'
                THEN o_orderpriority
                ELSE '"' || replace(o_orderpriority, '"', '""') || '"'
           END AS qid,
           'ns' AS kw_ns, 'val' AS kw_name
    FROM orders
    WHERE o_orderkey < 500 AND o_orderdate < TIMESTAMP '2000-01-01'
    ORDER BY o_orderkey
    """,
)
def sql_surface_battery(spark, sf_dir):
    """The SQL-SURFACE spellings of the scalar-function family
    (functions/sqlfns.py — age/range_bins/quote_ident/namespace/
    local_name as CREATE TEMPORARY FUNCTION registrations), driven
    through raw SQL text exactly as a reference user writes them,
    value-checked against DuckDB reimplementations of the same
    semantics."""
    from xtdb_spark.functions import sqlfns

    sqlfns.ensure_registered(spark)
    ld(spark, sf_dir, "orders").createOrReplaceTempView("xt_sqlsurf_orders")
    return spark.sql("""
        SELECT o_orderkey,
               age(TIMESTAMP '2000-01-01', o_orderdate).years AS age_y,
               age(TIMESTAMP '2000-01-01', o_orderdate).months AS age_m,
               CAST(range_bins(o_orderdate, 86400)._from AS TIMESTAMP)
                 AS bin_from,
               quote_ident(o_orderpriority) AS qid,
               namespace('ns/val') AS kw_ns,
               local_name('ns/val') AS kw_name
        FROM xt_sqlsurf_orders
        WHERE o_orderkey < 500 AND o_orderdate < TIMESTAMP '2000-01-01'
        ORDER BY o_orderkey
    """)
