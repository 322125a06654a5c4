"""SQL-analytics battery: the operators Spark gives "for free" once the
engine is declarative (SURVEY.md §2.5 note — count-distinct, grouping
sets/cube/rollup, quantiles — plus range/as-of joins, set ops, string
aggregation, correlated subqueries, vector array math).

Same contract as battery.py: every query has a DuckDB oracle with matching
column aliases; float aggregates accumulate as DECIMAL where engine
accumulation order could differ; quantile interpolation uses values exactly
representable in binary so linear interpolation is bit-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hiv_data_integration_spark.battery import QueryFn, dsum, tbl

# ---------------------------------------------------------------------------
# Multi-dimensional aggregation
# ---------------------------------------------------------------------------


def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = tbl(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().alias("gid"),
            dsum("l_quantity").alias("sum_qty"),
            F.count("*").alias("n_rows"),
        )
    )


SQL_ROLLUP = """
SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       count(*) AS n_rows
FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
"""


def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = tbl(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.grouping_id().alias("gid"), F.count("*").alias("n_orders")
    )


SQL_CUBE = """
SELECT o_orderstatus, o_orderpriority,
       CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
       count(*) AS n_orders
FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
"""


def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    tbl(spark, sf_dir, "orders").createOrReplaceTempView("orders_gs")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        """
    )


SQL_GROUPING_SETS = """
SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
"""


def q_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = tbl(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey", "l_partkey").alias("n_supp_part"),
    )


SQL_COUNT_DISTINCT = """
SELECT l_returnflag,
       count(DISTINCT l_partkey) AS n_parts,
       count(DISTINCT (l_suppkey, l_partkey)) AS n_supp_part
FROM lineitem GROUP BY l_returnflag
"""


def q_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = tbl(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_quantity, 0.25)").alias("q25"),
        F.median("l_quantity").alias("q50"),
        F.expr("percentile(l_quantity, 0.75)").alias("q75"),
    )


SQL_QUANTILES = """
SELECT l_returnflag,
       quantile_cont(l_quantity, 0.25) AS q25,
       median(l_quantity) AS q50,
       quantile_cont(l_quantity, 0.75) AS q75
FROM lineitem GROUP BY l_returnflag
"""


# ---------------------------------------------------------------------------
# Row-set operations
# ---------------------------------------------------------------------------


def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = tbl(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    supp = tbl(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return cust.intersect(supp)


SQL_INTERSECT = """
SELECT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT s_nationkey FROM supplier
"""


def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers' account-balance buckets absent from suppliers' (EXCEPT)."""
    cust = tbl(spark, sf_dir, "customer").select(
        F.floor(F.col("c_acctbal") / 1000).cast("long").alias("bal_bucket")
    )
    supp = tbl(spark, sf_dir, "supplier").select(
        F.floor(F.col("s_acctbal") / 1000).cast("long").alias("bal_bucket")
    )
    return cust.exceptAll(supp).groupBy("bal_bucket").agg(
        F.count("*").alias("n")
    )


SQL_EXCEPT = """
SELECT bal_bucket, count(*) AS n FROM (
    SELECT CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_bucket FROM customer
    EXCEPT ALL
    SELECT CAST(floor(s_acctbal / 1000) AS BIGINT) FROM supplier
) GROUP BY bal_bucket
"""


# ---------------------------------------------------------------------------
# Temporal joins
# ---------------------------------------------------------------------------


def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same-user event pairs within a 60 s follow window (equi+range join:
    the user_id equi key bounds the range explosion — the shape that
    scales; a pure theta join would not)."""
    ev = tbl(spark, sf_dir, "events")
    a = ev.select(
        F.col("user_id"), F.col("event_id").alias("id_a"), F.col("ts").alias("ts_a")
    )
    b = ev.select(
        F.col("user_id"), F.col("event_id").alias("id_b"), F.col("ts").alias("ts_b")
    )
    pairs = a.join(b, "user_id").filter(
        (F.col("ts_b") > F.col("ts_a"))
        & (F.col("ts_b") <= F.col("ts_a") + F.expr("INTERVAL 60 SECONDS"))
    )
    return pairs.groupBy("user_id").agg(F.count("*").alias("n_follow_pairs"))


SQL_RANGE_JOIN = """
SELECT a.user_id, count(*) AS n_follow_pairs
FROM events a JOIN events b ON a.user_id = b.user_id
WHERE b.ts > a.ts AND b.ts <= a.ts + INTERVAL 60 SECOND
GROUP BY a.user_id
"""


def q_asof_last_event_per_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of snapshot: each user's latest event value as of each day's end
    (dedup by (ts, event_id) descending — deterministic under ties)."""
    from pyspark.sql.window import Window

    ev = tbl(spark, sf_dir, "events").withColumn("day", F.to_date("ts"))
    w = Window.partitionBy("user_id", "day").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "day", F.col("value").alias("last_value"))
    )


SQL_ASOF = """
SELECT user_id, day, value AS last_value FROM (
    SELECT user_id, CAST(ts AS DATE) AS day, value,
           row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                              ORDER BY ts DESC, event_id DESC) AS rn
    FROM events
) WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# String aggregation / subqueries / vector math
# ---------------------------------------------------------------------------


def q_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = tbl(spark, sf_dir, "nation")
    return n.groupBy("n_regionkey").agg(
        F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nations")
    )


SQL_STRING_AGG = """
SELECT n_regionkey, string_agg(n_name, ',' ORDER BY n_name) AS nations
FROM nation GROUP BY n_regionkey
"""


def q_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers above their nation's average balance — a correlated scalar
    subquery decorrelated by Catalyst into a join."""
    tbl(spark, sf_dir, "customer").createOrReplaceTempView("customer_cs")
    return spark.sql(
        """
        SELECT c_custkey, c_nationkey
        FROM customer_cs o
        WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer_cs i
                           WHERE i.c_nationkey = o.c_nationkey)
        """
    )


SQL_CORRELATED = """
SELECT c_custkey, c_nationkey
FROM customer o
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer i
                   WHERE i.c_nationkey = o.c_nationkey)
"""


def q_vector_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array math over embeddings: L2 norm + elementwise self dot via
    F.aggregate/F.zip_with (JVM-side higher-order functions, no UDF)."""
    emb = tbl(spark, sf_dir, "embeddings")
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    dot = F.aggregate(
        F.zip_with(v, v, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return emb.select(
        "vec_id",
        F.sqrt(dot).alias("l2_norm"),
        F.size("embedding").alias("dim"),
    )


SQL_VECTOR_NORMS = """
SELECT vec_id,
       sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                             CAST(embedding AS DOUBLE[]))) AS l2_norm,
       len(embedding) AS dim
FROM embeddings
"""


def q_skyline(spark, sf_dir):
    """Skyline (Pareto frontier) of suppliers on (account balance, shipped
    line count), both maximized — left-anti dominance self-join
    (operators.relational.skyline; cf. EDBT 2023 skyline-in-Spark-SQL).
    SQL oracle: NOT EXISTS over the same dominance predicate."""
    from hiv_data_integration_spark.operators.relational import skyline

    sup = tbl(spark, sf_dir, "supplier").select("s_suppkey", "s_acctbal")
    li = tbl(spark, sf_dir, "lineitem").groupBy(
        F.col("l_suppkey").alias("s_suppkey")
    ).agg(F.count("*").alias("n_lines"))
    pts = sup.join(li, "s_suppkey", "inner").select(
        "s_suppkey", F.col("s_acctbal").cast("double").alias("bal"), "n_lines"
    )
    return skyline(pts, ["bal", "n_lines"]).select("s_suppkey", "bal", "n_lines")


SQL_SKYLINE = """
WITH pts AS (
    SELECT s_suppkey, CAST(s_acctbal AS DOUBLE) AS bal, n_lines
    FROM supplier
    JOIN (SELECT l_suppkey AS s_suppkey, count(*) AS n_lines
          FROM lineitem GROUP BY 1) USING (s_suppkey)
)
SELECT s_suppkey, bal, n_lines
FROM pts p
WHERE NOT EXISTS (
    SELECT 1 FROM pts q
    WHERE q.bal >= p.bal AND q.n_lines >= p.n_lines
      AND (q.bal > p.bal OR q.n_lines > p.n_lines)
)
"""


def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: segment-filtered customer ⋈ orders ⋈ lineitem,
    revenue per open order, top 10 — the canonical selective multi-join
    the optimizer must order correctly (both dim filters before the fact
    join; customer side broadcast). Revenue accumulates as DECIMAL."""
    c = tbl(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = tbl(spark, sf_dir, "orders").filter(
        F.to_date("o_orderdate") < F.lit("1998-03-15")
    )
    li = tbl(spark, sf_dir, "lineitem").filter(
        F.to_date("l_shipdate") > F.lit("1998-03-15")
    )
    revenue = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)")
    )
    joined = li.join(
        F.broadcast(o), F.col("l_orderkey") == F.col("o_orderkey")
    ).join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
    out = (
        joined.groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )
    return out


SQL_SHIPPING_PRIORITY = """
SELECT l_orderkey, o_orderdate, o_orderpriority,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
            AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND CAST(o_orderdate AS DATE) < DATE '1998-03-15'
  AND CAST(l_shipdate AS DATE) > DATE '1998-03-15'
GROUP BY 1, 2, 3
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


def q_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: six-table snowflake (region→nation→customer→orders
    →lineitem→supplier) with the local-supplier constraint
    (``c_nationkey = s_nationkey``), revenue per nation over one year.
    All dimension hops broadcast; only the orders⋈lineitem spine
    shuffles."""
    r = tbl(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = tbl(spark, sf_dir, "nation")
    c = tbl(spark, sf_dir, "customer")
    o = tbl(spark, sf_dir, "orders").filter(
        (F.to_date("o_orderdate") >= F.lit("1996-01-01"))
        & (F.to_date("o_orderdate") < F.lit("1997-01-01"))
    )
    li = tbl(spark, sf_dir, "lineitem")
    s = tbl(spark, sf_dir, "supplier")
    revenue = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)")
    )
    joined = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            F.broadcast(c),
            (F.col("o_custkey") == F.col("c_custkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return joined.groupBy("n_name").agg(
        F.sum(revenue).cast("double").alias("revenue"),
        F.count("*").alias("n_items"),
    )


SQL_REGION_REVENUE = """
SELECT n_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
            AS DOUBLE) AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
  AND CAST(o_orderdate AS DATE) < DATE '1997-01-01'
GROUP BY n_name
"""


def q_window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-family window functions over a unique ordering:
    ntile quartiles, percent_rank, cume_dist, and lead-with-default —
    all single-pass over one (nationkey)-partitioned sort, no UDFs.
    percent_rank/cume_dist are exact rationals divided in doubles, so
    both engines produce identical bits."""
    from pyspark.sql.window import Window

    c = tbl(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal"), F.col("c_custkey")
    )
    return c.select(
        "c_custkey",
        "c_nationkey",
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.lead("c_acctbal", 1, 0.0).over(w).alias("next_bal"),
    )


SQL_WINDOW_DISTRIBUTION = """
SELECT c_custkey, c_nationkey,
       CAST(ntile(4) OVER w AS BIGINT) AS quartile,
       percent_rank() OVER w AS pct_rank,
       cume_dist() OVER w AS cume,
       lead(c_acctbal, 1, 0.0) OVER w AS next_bal
FROM customer
WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
"""


def q_recursive_closure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive-CTE hierarchy rollup (Spark 4 ``WITH RECURSIVE``,
    SPARK-24497): a synthetic decimal org tree over suppliers
    (``parent = floor(suppkey / 10)``, roots at keys < 10), closed
    transitively by :func:`hierarchy_closure`, then account balances
    rolled up to EVERY ancestor level — the "sum the org tree at each
    node" query the reference walks row-at-a-time in Python. Each
    recursion step is one join of the frontier against the edge
    dimension; depth is O(log10 N), so 100 TB of facts cost
    depth × broadcast-join, never a quadratic closure materialization."""
    from hiv_data_integration_spark.operators.relational import (
        hierarchy_closure,
    )

    sup = tbl(spark, sf_dir, "supplier")
    edges = sup.select(
        F.col("s_suppkey").cast("long").alias("node"),
        F.nullif(
            F.floor(F.col("s_suppkey") / 10.0).cast("long"), F.lit(0)
        ).alias("parent"),
    )
    closure = hierarchy_closure(edges)
    facts = sup.select(
        F.col("s_suppkey").cast("long").alias("node"), "s_acctbal"
    )
    return (
        closure.join(facts, "node")
        .groupBy(F.col("ancestor").alias("org_node"))
        .agg(
            F.count("*").alias("n_desc"),
            F.max("depth").cast("long").alias("max_depth"),
            dsum("s_acctbal").alias("subtree_acctbal"),
        )
    )


SQL_RECURSIVE_CLOSURE = """
WITH RECURSIVE edges AS (
    SELECT CAST(s_suppkey AS BIGINT) AS node,
           NULLIF(CAST(FLOOR(s_suppkey / 10.0) AS BIGINT), 0) AS parent
    FROM supplier
),
walk (node, ancestor, depth) AS (
    SELECT node, node AS ancestor, 0 AS depth FROM edges
    UNION ALL
    SELECT w.node, e.parent AS ancestor, w.depth + 1
    FROM walk w
    JOIN edges e ON w.ancestor = e.node
    WHERE e.parent IS NOT NULL AND e.parent <> w.ancestor
)
SELECT w.ancestor AS org_node,
       count(*) AS n_desc,
       CAST(MAX(w.depth) AS BIGINT) AS max_depth,
       CAST(SUM(CAST(s.s_acctbal AS DECIMAL(18,2))) AS DOUBLE)
           AS subtree_acctbal
FROM walk w JOIN supplier s ON w.node = CAST(s.s_suppkey AS BIGINT)
GROUP BY w.ancestor
"""


def q_large_order_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: HAVING-filtered aggregate subquery driving the
    outer join (customers whose orders exceed 300 total quantity).

    The pre-aggregation runs FIRST and is tiny (tens of rows), so the
    orders join against it is broadcast-able by AQE and the big lineitem
    table is touched exactly once — at 100 TB the HAVING filter is the
    whole query; joining facts before aggregating would be quadratically
    worse. Quantities accumulate as DECIMAL for bit-stable doubles."""
    li = tbl(spark, sf_dir, "lineitem")
    o = tbl(spark, sf_dir, "orders")
    c = tbl(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(dsum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 300.0)
    )
    return (
        o.join(big, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate",
            "o_totalprice", "sum_qty",
        )
    )


SQL_LARGE_ORDER_CUSTOMERS = """
WITH big AS (
    SELECT l_orderkey,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem GROUP BY l_orderkey
    HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) > 300.0
)
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, sum_qty
FROM orders
JOIN big      ON o_orderkey = big.l_orderkey
JOIN customer ON o_custkey = c_custkey
"""


def q_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: the hardest decorrelation pattern — EXISTS plus
    NOT EXISTS, both correlated on the same derived table. Suppliers who
    shipped >365 days after the order date in a multi-supplier order
    where EVERY other supplier shipped on time.

    The engine side runs the manually-decorrelated single-pass form:
    one per-order aggregate (distinct suppliers, distinct LATE
    suppliers) joined back onto the late rows — a late row qualifies
    iff ``n_supp >= 2 AND n_late_supp = 1`` (it is then necessarily the
    only late supplier). The ORACLE keeps the textbook correlated
    EXISTS / NOT EXISTS formulation, so the hash check proves the
    rewrite equivalent row-for-row. Spark's own subquery decorrelation
    would instead expand the derived table three times (CTEs inline);
    at fact scale the one-aggregate form is one shuffle over
    ``l_orderkey`` instead of three. Day lag uses integer ``datediff``
    so both engines compare exact integers."""
    li = tbl(spark, sf_dir, "lineitem")
    o = tbl(spark, sf_dir, "orders")
    s = tbl(spark, sf_dir, "supplier")
    l1 = li.join(o, F.col("l_orderkey") == F.col("o_orderkey")).select(
        "l_orderkey",
        "l_suppkey",
        (
            F.datediff(
                F.to_date("l_shipdate"), F.to_date("o_orderdate")
            )
            > 365
        ).alias("late"),
    )
    per_order = l1.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(
            F.when(F.col("late"), F.col("l_suppkey"))
        ).alias("n_late_supp"),
    )
    qualifying = (
        l1.filter(F.col("late"))
        .join(per_order, "l_orderkey")
        .filter((F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1))
    )
    return (
        qualifying.join(
            F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey")
        )
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )


SQL_WAITING_SUPPLIERS = """
WITH l1 AS (
    SELECT l.l_orderkey, l.l_suppkey,
           date_diff('day', CAST(o.o_orderdate AS DATE),
                     CAST(l.l_shipdate AS DATE)) > 365 AS late
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
)
SELECT s.s_name, count(*) AS numwait
FROM l1 a JOIN supplier s ON a.l_suppkey = s.s_suppkey
WHERE a.late
  AND EXISTS (SELECT 1 FROM l1 b
              WHERE b.l_orderkey = a.l_orderkey
                AND b.l_suppkey <> a.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM l1 c
                  WHERE c.l_orderkey = a.l_orderkey
                    AND c.l_suppkey <> a.l_suppkey AND c.late)
GROUP BY s.s_name
"""


def q_inactive_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: global scalar subquery (average positive balance)
    + anti join (customers with no order since 2001), aggregated per
    synthetic country code.

    The above-average predicate is cross-multiplied into exact DECIMAL
    arithmetic (``bal * n > total``) instead of comparing against a
    floating-point average — a 1-ulp avg difference between engines
    would otherwise flip boundary customers. The scalar aggregate is one
    broadcast value; the anti join shuffles on ``custkey`` once."""
    tbl(spark, sf_dir, "customer").createOrReplaceTempView("cust_q22")
    tbl(spark, sf_dir, "orders").createOrReplaceTempView("ord_q22")
    return spark.sql(
        """
        WITH pos AS (
            SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DECIMAL(28,2))
                       AS total_bal,
                   count(*) AS n_pos
            FROM cust_q22 WHERE c_acctbal > 0
        )
        SELECT CAST(c.c_nationkey % 10 AS BIGINT) AS country_code,
               count(*) AS n_cust,
               CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                   AS total_acctbal
        FROM cust_q22 c CROSS JOIN pos
        WHERE CAST(c.c_acctbal AS DECIMAL(18,2)) * pos.n_pos > pos.total_bal
          AND NOT EXISTS (SELECT 1 FROM ord_q22 o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderdate >= TIMESTAMP '2001-01-01')
        GROUP BY 1
        """
    )


SQL_INACTIVE_ABOVE_AVG = """
WITH pos AS (
    SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DECIMAL(28,2))
               AS total_bal,
           count(*) AS n_pos
    FROM customer WHERE c_acctbal > 0
)
SELECT CAST(c.c_nationkey % 10 AS BIGINT) AS country_code,
       count(*) AS n_cust,
       CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
FROM customer c CROSS JOIN pos
WHERE CAST(c.c_acctbal AS DECIMAL(18,2)) * pos.n_pos > pos.total_bal
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '2001-01-01')
GROUP BY 1
"""


def q_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional-aggregate ratio (share of revenue
    from PROMO parts) per ship month over one year. Both sums accumulate
    as DECIMAL; only the FINAL division runs in doubles — one IEEE op on
    bit-identical operands, so the ratio is bit-stable across engines.
    The part dimension broadcasts; lineitem is scanned once with the
    month filter pushed to parquet."""
    li = tbl(spark, sf_dir, "lineitem").filter(
        (F.to_date("l_shipdate") >= F.lit("1997-01-01"))
        & (F.to_date("l_shipdate") < F.lit("1998-01-01"))
    )
    p = tbl(spark, sf_dir, "part")
    revenue = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1).cast("decimal(18,2)")
        - F.col("l_discount").cast("decimal(18,2)")
    )
    promo = F.when(F.col("p_type") == "PROMO", revenue).otherwise(
        F.lit(0.00).cast("decimal(38,4)")
    )
    joined = li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
    return (
        joined.groupBy(
            F.date_format("l_shipdate", "yyyy-MM").alias("ship_month")
        )
        .agg(
            F.sum(promo).cast("double").alias("promo_revenue"),
            F.sum(revenue).cast("double").alias("total_revenue"),
        )
        .withColumn(
            "promo_share",
            F.col("promo_revenue") / F.col("total_revenue"),
        )
    )


SQL_PROMO_REVENUE_SHARE = """
WITH j AS (
    SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
           CAST(l_extendedprice AS DECIMAL(18,2))
             * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
               AS rev,
           p_type
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
      AND CAST(l_shipdate AS DATE) < DATE '1998-01-01'
)
SELECT ship_month,
       CAST(SUM(CASE WHEN p_type = 'PROMO' THEN rev
                     ELSE CAST(0.00 AS DECIMAL(38,4)) END) AS DOUBLE)
           AS promo_revenue,
       CAST(SUM(rev) AS DOUBLE) AS total_revenue,
       CAST(SUM(CASE WHEN p_type = 'PROMO' THEN rev
                     ELSE CAST(0.00 AS DECIMAL(38,4)) END) AS DOUBLE)
         / CAST(SUM(rev) AS DOUBLE) AS promo_share
FROM j GROUP BY ship_month
"""


def q_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with per-row ORDER BY + LIMIT (top-2
    orders per customer by price) — the SQL:2016 lateral-join surface.
    Catalyst decorrelates the limit into a ranked window join (one
    shuffle on the correlation key), never a per-customer re-execution;
    the deterministic tiebreak (``o_orderkey``) makes the cut
    bit-stable."""
    tbl(spark, sf_dir, "customer").createOrReplaceTempView("cust_lat")
    tbl(spark, sf_dir, "orders").createOrReplaceTempView("ord_lat")
    return spark.sql(
        """
        SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        FROM cust_lat c, LATERAL (
            SELECT o_orderkey, o_totalprice FROM ord_lat o
            WHERE o.o_custkey = c.c_custkey
            ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
        ) t
        """
    )


SQL_LATERAL_TOPN = """
SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
FROM customer c, LATERAL (
    SELECT o_orderkey, o_totalprice FROM orders o
    WHERE o.o_custkey = c.c_custkey
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
) t
"""


SQL2_QUERIES: dict[str, QueryFn] = {
    "rollup_lineitem": q_rollup,
    "cube_orders": q_cube,
    "grouping_sets_orders": q_grouping_sets,
    "count_distinct_parts": q_count_distinct,
    "grouped_quantiles": q_quantiles,
    "intersect_nations": q_intersect,
    "except_balance_buckets": q_except,
    "range_join_events": q_range_join,
    "asof_last_event_per_day": q_asof_last_event_per_day,
    "string_agg_nations": q_string_agg,
    "correlated_subquery_balance": q_correlated_subquery,
    "embed_vector_norms": q_vector_norms,
    "skyline_suppliers": q_skyline,
    "recursive_org_rollup": q_recursive_closure,
    "window_distribution_funcs": q_window_distribution,
    "shipping_priority_top10": q_shipping_priority,
    "region_local_supplier_revenue": q_region_revenue,
    "large_order_customers": q_large_order_customers,
    "waiting_supplier_ranking": q_waiting_suppliers,
    "inactive_above_avg_balance": q_inactive_above_avg,
    "promo_revenue_share": q_promo_revenue_share,
    "lateral_topn_orders": q_lateral_topn,
}

SQL2_ORACLE: dict[str, str] = {
    "rollup_lineitem": SQL_ROLLUP,
    "cube_orders": SQL_CUBE,
    "grouping_sets_orders": SQL_GROUPING_SETS,
    "count_distinct_parts": SQL_COUNT_DISTINCT,
    "grouped_quantiles": SQL_QUANTILES,
    "intersect_nations": SQL_INTERSECT,
    "except_balance_buckets": SQL_EXCEPT,
    "range_join_events": SQL_RANGE_JOIN,
    "asof_last_event_per_day": SQL_ASOF,
    "string_agg_nations": SQL_STRING_AGG,
    "correlated_subquery_balance": SQL_CORRELATED,
    "embed_vector_norms": SQL_VECTOR_NORMS,
    "skyline_suppliers": SQL_SKYLINE,
    "recursive_org_rollup": SQL_RECURSIVE_CLOSURE,
    "window_distribution_funcs": SQL_WINDOW_DISTRIBUTION,
    "shipping_priority_top10": SQL_SHIPPING_PRIORITY,
    "region_local_supplier_revenue": SQL_REGION_REVENUE,
    "large_order_customers": SQL_LARGE_ORDER_CUSTOMERS,
    "waiting_supplier_ranking": SQL_WAITING_SUPPLIERS,
    "inactive_above_avg_balance": SQL_INACTIVE_ABOVE_AVG,
    "promo_revenue_share": SQL_PROMO_REVENUE_SHARE,
    "lateral_topn_orders": SQL_LATERAL_TOPN,
}
