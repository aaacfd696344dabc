"""SLT-style randomized correctness battery.

The reference's big correctness battery is sqllogictest
(reference sqlite-test/ corpus + src/test/clojure/xtdb/sql/logic_test/
runner.clj, CI matrix .github/workflows/slt.yml): thousands of
machine-generated SQL statements hash-compared against a known-good
engine. This is the same idea natively: a seeded generator emits
ANSI-SQL queries in a grammar BOTH Spark SQL and DuckDB parse
identically, runs them on both over the same parquet, and compares
order-insensitive value hashes.

Determinism rules baked into the grammar:
- aggregates restricted to COUNT/MIN/MAX/CAST(SUM(int) AS BIGINT)
  (associative + order-insensitive; no float accumulation),
- every ORDER BY lists ALL output columns (total order) before LIMIT,
- predicates only over int/string columns with literals drawn from
  the actual value domains.

Run:  python tools/slt_random.py [n_queries] [seed] [sf_dir]
"""

from __future__ import annotations

import random
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from check_oracle import rows_key  # noqa: E402

# (table, int cols, string cols)
TABLES = {
    "customer": (["c_custkey", "c_nationkey"], ["c_name", "c_mktsegment"]),
    "orders": (["o_orderkey", "o_custkey"],
               ["o_orderstatus", "o_orderpriority"]),
    "supplier": (["s_suppkey", "s_nationkey"], ["s_name"]),
    "part": (["p_partkey", "p_size"], ["p_brand", "p_type", "p_name"]),
    "nation": (["n_nationkey", "n_regionkey"], ["n_name"]),
}

# tables used by generated queries but not drawn from TABLES'
# column pools (period-predicate pairs synthesize intervals on
# events.ts)
EXTRA_TABLES = ["events"]


def register_views(spark, con, sf_dir: str) -> None:
    from xtdb_spark.queries.registry import ld

    for t in list(TABLES) + EXTRA_TABLES:
        ld(spark, sf_dir, t).createOrReplaceTempView(t)
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")


JOINS = [  # (left, right, condition)
    ("customer", "nation", "c_nationkey = n_nationkey"),
    ("orders", "customer", "o_custkey = c_custkey"),
    ("supplier", "nation", "s_nationkey = n_nationkey"),
]

STR_LITS = {
    "c_mktsegment": ["BUILDING", "AUTOMOBILE", "MACHINERY"],
    "o_orderstatus": ["F", "O", "P"],
    "o_orderpriority": ["1-URGENT", "5-LOW", "3-MEDIUM"],
    "p_brand": ["Brand#1", "Brand#13", "Brand#25"],
    "p_type": ["PROMO", "ECONOMY", "LARGE"],
    "n_name": ["NATION_1", "NATION_12", "NATION_24"],
    "c_name": [], "s_name": [], "p_name": ["red widget", "blue bolt"],
}


def gen_construct_pair(rng: random.Random) -> tuple[str, str]:
    """XTDB-dialect constructs (sql/constructs.py) need PAIRED
    spellings: the left string is XTDB syntax (object/array literals,
    NEST_MANY) run through `constructs.translate` + Spark; the right
    is DuckDB's native spelling of the same computation ({'k': v}
    struct literals, 1-based list subscripts, correlated COUNT).
    Both reduce to identical scalar outputs, so the value-hash
    compare verifies the translation END-TO-END against an
    independent engine."""
    t = rng.choice(list(TABLES))
    ints, strs = TABLES[t]
    c1, c2 = rng.choice(ints), rng.choice(ints)
    g = rng.choice(strs)
    kind = rng.random()
    if kind < 0.12:
        # FROM-first pipelined tails (Sql.g4:681 queryTail*) vs the
        # standard SELECT spelling of the same fold
        m = rng.randint(3, 9)
        lim = rng.randint(20, 200)
        return (
            f"FROM {t} WHERE {c1} < {lim * 10} "
            f"GROUP BY {g} SELECT {g}, COUNT(*) AS n, "
            f"CAST(SUM({c2} % {m}) AS BIGINT) AS s "
            f"WHERE n > 1 ORDER BY {g} LIMIT {lim}",
            f"SELECT * FROM (SELECT {g}, COUNT(*) AS n, "
            f"CAST(SUM({c2} % {m}) AS BIGINT) AS s FROM {t} "
            f"WHERE {c1} < {lim * 10} GROUP BY {g}) q "
            f"WHERE n > 1 ORDER BY {g} LIMIT {lim}")
    if kind < 0.22:
        # star EXCLUDE/RENAME vs the explicit column list — DuckDB
        # also parses EXCLUDE natively, so give it the expansion to
        # keep the comparison translator-vs-independent-engine
        drop = rng.choice(ints + strs)
        keep = [c for c in ints + strs if c != drop]
        ren = rng.choice(keep)
        kept = ", ".join(c for c in keep if c != ren)
        lim = rng.randint(20, 120)
        order = ", ".join([f"{ren}_r"] + [c for c in keep if c != ren])
        return (
            f"SELECT * EXCLUDE ({drop}) RENAME ({ren} AS {ren}_r) "
            f"FROM (SELECT {', '.join(ints + strs)} FROM {t}) s0 "
            f"ORDER BY {order} LIMIT {lim}",
            f"SELECT {kept}{', ' if kept else ''}{ren} AS {ren}_r "
            f"FROM {t} ORDER BY {order} LIMIT {lim}")
    if kind < 0.30:
        # quantified comparisons: the SAME spelling runs through our
        # 3VL scalar-aggregate lowering on Spark and natively on
        # DuckDB — empty/NULL/dup subquery shapes arise naturally
        op = rng.choice(["=", "<>", "<", "<=", ">", ">="])
        quant = rng.choice(["ANY", "SOME", "ALL"])
        th = rng.randint(0, 600)
        lim = rng.randint(20, 150)
        sub = (f"SELECT {c2} FROM {t} s2 WHERE s2.{c1} < {th}")
        q = (f"SELECT {c1}, ({c1} {op} {quant} ({sub})) AS m "
             f"FROM {t} ORDER BY {c1}, m LIMIT {lim}")
        return (q, q)
    if kind < 0.40:
        # object literal + field access
        m = rng.randint(5, 13)
        sel_x = f"({{a: {c1} % {m}, b: {g}}})"
        sel_d = f"({{'a': {c1} % {m}, 'b': {g}}})"
        tail = f"AS fa, {{}}.b AS fb FROM {t} ORDER BY fa, fb LIMIT 40"
        return (f"SELECT DISTINCT {sel_x}.a " + tail.format(sel_x),
                f"SELECT DISTINCT {sel_d}.a " + tail.format(sel_d))
    if kind < 0.58:
        # array literal + element extraction (element_at and DuckDB
        # [] are both 1-based)
        i = rng.randint(1, 3)
        arr = f"[{c1} % 50, {c2}, 7]"
        return (f"SELECT COUNT(*) AS n, CAST(SUM(element_at({arr}, {i})) "
                f"AS BIGINT) AS s FROM {t}",
                f"SELECT COUNT(*) AS n, CAST(SUM({arr}[{i}]) "
                f"AS BIGINT) AS s FROM {t}")
    if kind < 0.78:
        # period predicates over synthesized [d1, d2) intervals on
        # events.ts: XTDB infix spelling vs DuckDB's raw comparison
        # derivation of the same [from, to) semantics
        d1, d2 = sorted(rng.sample([1, 2, 3, 5, 8], 2))
        day = rng.randint(5, 25)
        point = f"TIMESTAMP '2024-01-{day:02d}'"
        a_from, a_to = f"ts + INTERVAL {d1} DAY", f"ts + INTERVAL {d2} DAY"
        op = rng.choice(["OVERLAPS", "CONTAINS", "PRECEDES", "SUCCEEDS"])
        qfrom = f"TIMESTAMP '2024-01-{day:02d}'"
        qto = f"TIMESTAMP '2024-01-{min(day + 3, 28):02d}'"
        if op == "CONTAINS":
            xt_pred = f"PERIOD({a_from}, {a_to}) CONTAINS {point}"
            du_pred = f"({a_from} <= {point} AND {point} < {a_to})"
        elif op == "OVERLAPS":
            xt_pred = (f"PERIOD({a_from}, {a_to}) OVERLAPS "
                       f"PERIOD({qfrom}, {qto})")
            du_pred = f"({a_from} < {qto} AND {qfrom} < {a_to})"
        elif op == "PRECEDES":
            xt_pred = (f"PERIOD({a_from}, {a_to}) STRICTLY PRECEDES "
                       f"PERIOD({qfrom}, {qto})")
            du_pred = f"({a_to} < {qfrom})"
        else:
            xt_pred = (f"PERIOD({a_from}, {a_to}) SUCCEEDS "
                       f"PERIOD({qfrom}, {qto})")
            du_pred = f"({a_from} >= {qto})"
        return (f"SELECT COUNT(*) AS n FROM events WHERE {xt_pred}",
                f"SELECT COUNT(*) AS n FROM events WHERE {du_pred}")
    # NEST_MANY cardinality vs correlated COUNT
    th = rng.randint(100, 5000)
    lim = rng.randint(50, 300)
    return (
        f"SELECT c_custkey, COALESCE(size(NEST_MANY "
        f"(SELECT o_orderkey FROM orders WHERE o_custkey = c_custkey "
        f"AND o_orderkey < {th})), 0) AS n_orders "
        f"FROM customer WHERE c_custkey < {lim} ORDER BY c_custkey",
        f"SELECT c_custkey, (SELECT COUNT(*) FROM orders "
        f"WHERE o_custkey = c_custkey AND o_orderkey < {th}) AS n_orders "
        f"FROM customer WHERE c_custkey < {lim} ORDER BY c_custkey")


def gen_query(rng: random.Random):
    if rng.random() < 0.08:
        return gen_construct_pair(rng)
    use_join = rng.random() < 0.4
    if use_join:
        lt, rt, cond = rng.choice(JOINS)
        ints = TABLES[lt][0] + TABLES[rt][0]
        strs = TABLES[lt][1] + TABLES[rt][1]
        jk = "JOIN" if rng.random() < 0.7 else "LEFT JOIN"
        from_clause = f"{lt} {jk} {rt} ON {cond}"
        if jk == "LEFT JOIN":
            # right-side cols are nullable under LOJ — keep agg/group
            # cols on the left side for simple deterministic output
            ints, strs = TABLES[lt]
    else:
        lt = rng.choice(list(TABLES))
        ints, strs = TABLES[lt]
        from_clause = lt

    # predicates
    preds = []
    for _ in range(rng.randint(0, 2)):
        if rng.random() < 0.5:
            c = rng.choice(ints)
            op = rng.choice(["<", "<=", ">", ">=", "<>"])
            preds.append(f"{c} {op} {rng.randint(0, 500)}")
        else:
            c = rng.choice(strs)
            lits = STR_LITS.get(c) or []
            if not lits:
                continue
            if rng.random() < 0.5:
                preds.append(f"{c} = '{rng.choice(lits)}'")
            else:
                subset = rng.sample(lits, k=min(2, len(lits)))
                quoted = ", ".join(f"'{x}'" for x in subset)
                preds.append(f"{c} IN ({quoted})")
    where = (" WHERE " + " AND ".join(preds)) if preds else ""

    shape = rng.random()
    if shape < 0.24:  # scalar aggregate
        c = rng.choice(ints)
        sel = (f"COUNT(*) AS n, MIN({c}) AS mn, MAX({c}) AS mx, "
               f"CAST(SUM({c}) AS BIGINT) AS s")
        return f"SELECT {sel} FROM {from_clause}{where}"
    if shape < 0.29:  # CASE + integer arithmetic projection
        c1, c2 = rng.choice(ints), rng.choice(ints)
        g = rng.choice(strs)
        th = rng.randint(10, 400)
        return (f"SELECT {g}, "
                f"CASE WHEN {c1} < {th} THEN 'lo' "
                f"WHEN {c1} < {th * 2} THEN 'mid' ELSE 'hi' END AS band, "
                f"CAST(SUM({c1} * 3 + {c2} % 11) AS BIGINT) AS s, "
                f"COUNT(*) AS n "
                f"FROM {from_clause}{where} GROUP BY 1, 2")
    if shape < 0.55:  # group by
        g = rng.choice(strs)
        c = rng.choice(ints)
        having = ""
        if rng.random() < 0.3:
            having = f" HAVING COUNT(*) > {rng.randint(1, 5)}"
        q = (f"SELECT {g}, COUNT(*) AS n, CAST(SUM({c}) AS BIGINT) AS s "
             f"FROM {from_clause}{where} GROUP BY {g}{having}")
        if rng.random() < 0.5:
            q += f" ORDER BY {g} LIMIT {rng.randint(1, 20)}"
        return q
    if shape < 0.60:  # distinct projection
        g = rng.choice(strs)
        c = rng.choice(ints)
        return (f"SELECT DISTINCT {g}, {c} % 7 AS m FROM {from_clause}{where} "
                f"ORDER BY {g}, m LIMIT 50")
    if shape < 0.65:  # window over total order
        g = rng.choice(strs)
        c = rng.choice(ints)
        return (f"SELECT {g}, {c}, "
                f"ROW_NUMBER() OVER (PARTITION BY {g} ORDER BY {c}) AS rn, "
                f"CAST(SUM({c}) OVER (PARTITION BY {g}) AS BIGINT) AS s "
                f"FROM (SELECT DISTINCT {g}, {c} FROM {from_clause}{where}) t")
    if shape < 0.68:  # set op between two slices of one table
        t = rng.choice(list(TABLES))
        i0 = TABLES[t][0][0]
        a, b = sorted(rng.sample(range(0, 800), 2))
        op = rng.choice(["UNION ALL", "UNION", "INTERSECT", "EXCEPT"])
        return (f"SELECT {i0} FROM {t} WHERE {i0} < {b} "
                f"{op} SELECT {i0} FROM {t} WHERE {i0} >= {a}")
    if shape < 0.71:  # correlated scalar subquery (decorrelation path)
        th = rng.randint(100, 5000)
        return (f"SELECT c_custkey, "
                f"(SELECT COUNT(*) FROM orders WHERE o_custkey = c_custkey "
                f"AND o_orderkey < {th}) AS n_orders "
                f"FROM customer WHERE c_custkey < {rng.randint(50, 300)} "
                f"ORDER BY c_custkey LIMIT 50")
    if shape < 0.74:  # string-function projection
        g = rng.choice([s for s in strs if STR_LITS.get(s)] or strs)
        a, b = rng.randint(1, 2), rng.randint(2, 4)
        return (f"SELECT DISTINCT upper({g}) AS u, length({g}) AS l, "
                f"substr({g}, {a}, {b}) AS s3, "
                f"replace({g}, 'A', '_') AS rp "
                f"FROM {from_clause}{where} ORDER BY u, s3 LIMIT 40")
    if shape < 0.77:  # null-free NOT IN subquery (anti-join path)
        th = rng.randint(100, 5000)
        return (f"SELECT COUNT(*) AS n FROM customer WHERE c_custkey NOT IN "
                f"(SELECT o_custkey FROM orders WHERE o_orderkey < {th})")
    if shape < 0.80:  # CTE reuse
        g = rng.choice(strs)
        c = rng.choice(ints)
        k = rng.randint(1, 10)
        return (f"WITH t AS (SELECT {g} AS g, COUNT(*) AS n, "
                f"CAST(SUM({c}) AS BIGINT) AS s FROM {from_clause}{where} "
                f"GROUP BY {g}) "
                f"SELECT g, n, s FROM t WHERE n > {k} ORDER BY g")
    if shape < 0.82:  # BETWEEN + LIKE predicate battery
        t = rng.choice(["customer", "orders", "part"])
        ints_t, strs_t = TABLES[t]
        c = rng.choice(ints_t)
        g = rng.choice([s for s in strs_t if STR_LITS.get(s)] or strs_t)
        a, b = sorted(rng.sample(range(0, 900), 2))
        pat = rng.choice(["%1%", "B%", "%E", "_-%"])
        return (f"SELECT COUNT(*) AS n, CAST(SUM({c}) AS BIGINT) AS s "
                f"FROM {t} WHERE {c} BETWEEN {a} AND {b} "
                f"AND {g} LIKE '{pat}'")
    if shape < 0.85:  # derived-table join (grouped subquery joined back)
        k = rng.randint(1, 8)
        return (f"SELECT c_mktsegment, COUNT(*) AS n_cust, "
                f"CAST(SUM(t.n) AS BIGINT) AS n_orders "
                f"FROM customer JOIN "
                f"(SELECT o_custkey, COUNT(*) AS n FROM orders "
                f"GROUP BY o_custkey HAVING COUNT(*) >= {k}) t "
                f"ON c_custkey = t.o_custkey GROUP BY c_mktsegment")
    if shape < 0.87:  # COALESCE/NULLIF/GREATEST/LEAST projection
        c1, c2 = rng.choice(ints), rng.choice(ints)
        return (f"SELECT COUNT(*) AS n, "
                f"CAST(SUM(COALESCE(NULLIF({c1}, {rng.randint(0, 50)}), -1)) "
                f"AS BIGINT) AS s, "
                f"MIN(LEAST({c1}, {c2})) AS mn, "
                f"MAX(GREATEST({c1}, {c2})) AS mx "
                f"FROM {from_clause}{where}")
    if shape < 0.90:  # rank/dense_rank over deduped deterministic input
        g = rng.choice(strs)
        c = rng.choice(ints)
        return (f"SELECT g, c, RANK() OVER (ORDER BY c, g) AS rk, "
                f"DENSE_RANK() OVER (ORDER BY c) AS drk "
                f"FROM (SELECT DISTINCT {g} AS g, {c} % 13 AS c "
                f"FROM {from_clause}{where}) t "
                f"ORDER BY rk, g LIMIT 60")
    if shape < 0.92:  # uncorrelated scalar subquery in WHERE
        t = rng.choice(["customer", "supplier"])
        i0 = TABLES[t][0][0]
        return (f"SELECT COUNT(*) AS n FROM {t} WHERE {i0} * 2 < "
                f"(SELECT MAX({i0}) FROM {t})")
    if shape < 0.94:  # NOT EXISTS (null-aware anti path)
        return (f"SELECT COUNT(*) AS n FROM customer WHERE NOT EXISTS "
                f"(SELECT 1 FROM orders WHERE o_custkey = c_custkey "
                f"AND o_orderkey < {rng.randint(100, 5000)})")
    if shape < 0.985:  # ROLLUP with grand-total row (no WHERE: Spark
        # returns 0 rows for the () grouping set over EMPTY input where
        # the standard/DuckDB/Postgres produce the grand-total row —
        # divergence documented in COVERAGE.md; non-empty input agrees)
        g = rng.choice(strs)
        c = rng.choice(ints)
        return (f"SELECT {g}, COUNT(*) AS n, CAST(SUM({c}) AS BIGINT) AS s "
                f"FROM {from_clause} GROUP BY ROLLUP ({g})")
    # EXISTS
    inner_t, outer_t = ("orders", "customer")
    return (f"SELECT COUNT(*) AS n FROM {outer_t} WHERE EXISTS "
            f"(SELECT 1 FROM {inner_t} WHERE o_custkey = c_custkey "
            f"AND o_orderkey < {rng.randint(100, 5000)})")


def run_battery(spark, con, n_queries: int, seed: int, verbose: bool = True):
    from xtdb_spark.sql.constructs import translate

    rng = random.Random(seed)
    failures = []
    for i in range(n_queries):
        q = gen_query(rng)
        s_sql, d_sql = q if isinstance(q, tuple) else (q, q)
        sdf = spark.sql(translate(s_sql))
        scols, srows = sdf.columns, [tuple(r) for r in sdf.collect()]
        res = con.execute(d_sql)
        dcols = [d[0] for d in res.description]
        drows = res.fetchall()
        ok = (sorted(scols) == sorted(dcols) and len(srows) == len(drows)
              and rows_key(srows, scols) == rows_key(drows, dcols))
        if not ok:
            failures.append((i, s_sql, len(srows), len(drows)))
            if verbose:
                print(f"FAIL [{i}] {s_sql}\n  spark={len(srows)} duck={len(drows)}")
        elif verbose and i % 10 == 0:
            print(f"ok   [{i}] {len(srows)} rows")
    return failures


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 42
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.01"

    import duckdb

    from xtdb_spark.session import build_spark

    spark = build_spark("slt-random")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    register_views(spark, con, sf_dir)

    failures = run_battery(spark, con, n, seed)
    print(f"\n{n - len(failures)}/{n} matched (seed={seed})")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
