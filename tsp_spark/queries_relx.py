"""Extended relational anchors (beyond-reference: SURVEY.md §2.11).

The reference engine has no relational joins, group-by aggregation,
distinct, sorts, limits, or subqueries (SURVEY §2.11) — these anchors
demonstrate that the rebuilt engine covers those shapes as first-class,
oracle-checked queries on the TPC-H-ish testdata. Each exercises one
distinct plan shape:

* q2_min_within   — min-within-group subquery joined back (TPC-H Q2 shape)
* q4_priority     — EXISTS / left-semi join with a non-equi residual (Q4)
* q7_volume       — two-sided dimension join + calendar-year rollup (Q7)
* q10_returns     — aggregated top-k with deterministic tie-break (Q10)
* q12_priority    — conditional aggregation after a fact join (Q12)
* q16_distinct    — COUNT(DISTINCT) grouped aggregation (Q16)
* q18_big_orders  — grouped HAVING feeding a join (Q18)
* q22_anti        — scalar-aggregate subquery + anti join (Q22)

Exactness rules follow tsp_spark.queries: money in integer cents,
timestamps as epoch-ms BIGINTs, the Q22 average comparison cross-
multiplied into integer arithmetic so both engines decide the margin
identically.

Scale notes (100 TB): explicit broadcast hints mark only true
dimensions (nation, supplier) and tiny derived aggregates (Q2's
per-type mins, Q22's one-row stats). orders / customer / part are
fact-scale at the target — their joins carry no hint so AQE picks the
strategy (shuffle join at scale, runtime broadcast when a filtered side
turns out small). Q18's HAVING pre-aggregates lineitem down to
qualifying orderkeys before any join (semi-join reduction); Q22's anti
join shuffles only (custkey) pairs.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F


# Deferred imports: tsp_spark.queries merges this module's registries at
# the end of its own body, so a module-level import in either direction
# would be order-dependent. Call-time lookups are always safe.
class _Q:
    def __getattr__(self, name):
        from tsp_spark import queries

        return getattr(queries, name)


_q = _Q()

_DAY_MS = 86_400_000


def _ms(y: int, m: int, d: int) -> int:
    return int(dt.datetime(y, m, d, tzinfo=dt.timezone.utc).timestamp() * 1000)


Q4_LO_MS = _ms(1996, 1, 1)
Q4_HI_MS = _ms(1996, 7, 1)
Q10_LO_MS = _ms(1996, 1, 1)
Q10_HI_MS = _ms(1996, 4, 1)
Q12_LO_MS = _ms(1996, 1, 1)
Q12_HI_MS = _ms(1997, 1, 1)
Q18_MIN_QTY = 250


def q_rel_q2_min_within(spark, sf_dir):
    """Cheapest part per type: aggregate-min subquery joined back to the
    base table (the TPC-H Q2 correlated-min shape, partsupp-free)."""
    part = _q._load(spark, sf_dir, "part")
    mins = part.groupBy("p_type").agg(F.min("p_retailprice").alias("__min_price"))
    return (
        part.join(F.broadcast(mins), "p_type")
        .where(F.col("p_retailprice") == F.col("__min_price"))
        .select("p_type", "p_partkey", _q._cents("p_retailprice").alias("price_cents"))
    )


ORACLE_Q2 = """
WITH m AS (SELECT p_type, min(p_retailprice) AS mn FROM part GROUP BY p_type)
SELECT p.p_type, p_partkey, round(p_retailprice * 100)::BIGINT AS price_cents
FROM part p JOIN m ON p.p_type = m.p_type AND p.p_retailprice = m.mn
"""


def q_rel_q4_priority(spark, sf_dir):
    """Order-priority count of orders with at least one late-shipped line
    (shipdate > orderdate + 60 d): EXISTS as a left-semi join whose
    condition mixes the equi key with a non-equi residual (TPC-H Q4)."""
    orders = _q._load(spark, sf_dir, "orders")
    li = _q._load(spark, sf_dir, "lineitem")
    od = orders.o_orderdate
    sem = orders.where(
        (od >= _q._ts_lit(Q4_LO_MS)) & (od < _q._ts_lit(Q4_HI_MS))
    ).join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (F.unix_millis(li.l_shipdate) > F.unix_millis(orders.o_orderdate) + 60 * _DAY_MS),
        "left_semi",
    )
    return sem.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


ORACLE_Q4 = f"""
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE epoch_ms(o_orderdate) >= {Q4_LO_MS} AND epoch_ms(o_orderdate) < {Q4_HI_MS}
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND epoch_ms(l.l_shipdate) > epoch_ms(o.o_orderdate) + {60 * _DAY_MS})
GROUP BY o_orderpriority
"""


def q_rel_q7_volume(spark, sf_dir):
    """Bilateral trade volume between two nations by ship year: the fact
    table joined to supplier- and customer-side nation dimensions (both
    broadcast), symmetric pair filter, calendar-year rollup (TPC-H Q7)."""
    li = _q._load(spark, sf_dir, "lineitem")
    orders = _q._load(spark, sf_dir, "orders")
    cust = _q._load(spark, sf_dir, "customer")
    supp = _q._load(spark, sf_dir, "supplier")
    nation = _q._load(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("__n1k"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("__n2k"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    vol = _q._cents("l_extendedprice") * (100 - _q._cents("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), supp.s_nationkey == F.col("__n1k"))
        .join(F.broadcast(n2), cust.c_nationkey == F.col("__n2k"))
        .where(
            pair
            & (li.l_shipdate >= _q._ts_lit(_ms(1996, 1, 1)))
            & (li.l_shipdate < _q._ts_lit(_ms(1998, 1, 1)))
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.sum(vol).alias("volume_e4"))
    )


ORACLE_Q7 = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       year(l_shipdate)::INT AS l_year,
       sum(round(l_extendedprice * 100)::BIGINT
           * (100 - round(l_discount * 100)::BIGINT))::BIGINT AS volume_e4
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
  AND year(l_shipdate) IN (1996, 1997)
GROUP BY supp_nation, cust_nation, l_year
"""


def q_rel_q10_returns(spark, sf_dir):
    """Top 20 customers by returned-item revenue: aggregation over the
    R-flagged fact rows, then a global top-k with a deterministic
    tie-break (TPC-H Q10; LIMIT is absent from the reference — §2.6)."""
    li = _q._load(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    orders = _q._load(spark, sf_dir, "orders")
    cust = _q._load(spark, sf_dir, "customer")
    nation = _q._load(spark, sf_dir, "nation")
    od = orders.o_orderdate
    rev = _q._cents("l_extendedprice") * (100 - _q._cents("l_discount"))
    return (
        li.join(
            orders.where(
                (od >= _q._ts_lit(Q10_LO_MS)) & (od < _q._ts_lit(Q10_HI_MS))
            ),
            li.l_orderkey == orders.o_orderkey,
        )
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy(
            "c_custkey", "c_name", _q._cents("c_acctbal").alias("acctbal_cents"), "n_name"
        )
        .agg(F.sum(rev).alias("revenue_e4"))
        .orderBy(F.col("revenue_e4").desc(), "c_custkey")
        .limit(20)
    )


ORACLE_Q10 = f"""
SELECT c_custkey, c_name, round(c_acctbal * 100)::BIGINT AS acctbal_cents, n_name,
       sum(round(l_extendedprice * 100)::BIGINT
           * (100 - round(l_discount * 100)::BIGINT))::BIGINT AS revenue_e4
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND epoch_ms(o_orderdate) >= {Q10_LO_MS} AND epoch_ms(o_orderdate) < {Q10_HI_MS}
GROUP BY c_custkey, c_name, acctbal_cents, n_name
ORDER BY revenue_e4 DESC, c_custkey
LIMIT 20
"""


def q_rel_q12_priority(spark, sf_dir):
    """Late-shipment priority split per return flag: conditional
    aggregation (CASE inside SUM) after the fact join (TPC-H Q12 shape,
    shipmode-free)."""
    li = _q._load(spark, sf_dir, "lineitem")
    orders = _q._load(spark, sf_dir, "orders")
    sd = li.l_shipdate
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.where((sd >= _q._ts_lit(Q12_LO_MS)) & (sd < _q._ts_lit(Q12_HI_MS)))
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


ORACLE_Q12 = f"""
SELECT l_returnflag,
       sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
       sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END)::BIGINT AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE epoch_ms(l_shipdate) >= {Q12_LO_MS} AND epoch_ms(l_shipdate) < {Q12_HI_MS}
GROUP BY l_returnflag
"""


def q_rel_q16_distinct(spark, sf_dir):
    """Distinct supplier count per brand/size over shipped lines:
    COUNT(DISTINCT) grouped aggregation (absent from the reference —
    §2.11; Spark plans it as a two-phase partial-distinct aggregate)."""
    li = _q._load(spark, sf_dir, "lineitem")
    part = _q._load(spark, sf_dir, "part").where(~F.col("p_type").startswith("MEDIUM"))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


ORACLE_Q16 = """
SELECT p_brand, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_type NOT LIKE 'MEDIUM%'
GROUP BY p_brand, p_size
"""


def q_rel_q18_big_orders(spark, sf_dir):
    """Large-volume orders: grouped HAVING on the fact table first
    (semi-join reduction — only qualifying orderkeys reach the joins),
    then customer/order enrichment (TPC-H Q18)."""
    li = _q._load(spark, sf_dir, "lineitem")
    orders = _q._load(spark, sf_dir, "orders")
    cust = _q._load(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"))
        .where(F.col("sum_qty") > Q18_MIN_QTY)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            F.col("l_orderkey").alias("o_orderkey"),
            F.unix_millis("o_orderdate").alias("o_date_ms"),
            _q._cents("o_totalprice").alias("total_cents"),
            "sum_qty",
        )
    )


ORACLE_Q18 = f"""
WITH big AS (
  SELECT l_orderkey, sum(l_quantity::BIGINT) AS sum_qty
  FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity::BIGINT) > {Q18_MIN_QTY}
)
SELECT c_custkey, c_name, l_orderkey AS o_orderkey, epoch_ms(o_orderdate) AS o_date_ms,
       round(o_totalprice * 100)::BIGINT AS total_cents, sum_qty::BIGINT AS sum_qty
FROM big JOIN orders ON l_orderkey = o_orderkey JOIN customer ON o_custkey = c_custkey
"""


def q_rel_q19_disjunct(spark, sf_dir):
    """Disjunctive brand/size/quantity predicate over the part join:
    OR-of-ANDs that Catalyst splits into a common join key plus a
    residual filter (TPC-H Q19)."""
    li = _q._load(spark, sf_dir, "lineitem")
    part = _q._load(spark, sf_dir, "part")
    q, sz, br = F.col("l_quantity"), F.col("p_size"), F.col("p_brand")
    cond = (
        ((br == "Brand#12") & q.between(1, 11) & sz.between(1, 5))
        | ((br == "Brand#23") & q.between(10, 20) & sz.between(1, 10))
        | ((br == "Brand#34") & q.between(20, 30) & sz.between(1, 15))
    )
    rev = _q._cents("l_extendedprice") * (100 - _q._cents("l_discount"))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .where(cond)
        .agg(F.sum(rev).alias("revenue_e4"), F.count(F.lit(1)).alias("n_lines"))
    )


ORACLE_Q19 = """
SELECT sum(round(l_extendedprice * 100)::BIGINT
           * (100 - round(l_discount * 100)::BIGINT))::BIGINT AS revenue_e4,
       count(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND l_quantity BETWEEN 1 AND 11 AND p_size BETWEEN 1 AND 5)
   OR (p_brand = 'Brand#23' AND l_quantity BETWEEN 10 AND 20 AND p_size BETWEEN 1 AND 10)
   OR (p_brand = 'Brand#34' AND l_quantity BETWEEN 20 AND 30 AND p_size BETWEEN 1 AND 15)
"""


def q_rel_q22_anti(spark, sf_dir):
    """Above-average customers with no urgent order, per nation:
    scalar-aggregate subquery (global average) + anti join against the
    urgent-order set (TPC-H Q22 shape; every customer in this testdata
    has *some* order, so the anti side filters to 1-URGENT). The average
    comparison is cross-multiplied into integer arithmetic
    (cents·n > total_cents ⟺ acctbal > avg) so both engines decide the
    margin exactly, with no floating-point division."""
    cust = _q._load(spark, sf_dir, "customer")
    orders = _q._load(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    c_cents = _q._cents("c_acctbal")
    stats = cust.where(F.col("c_acctbal") > 0).agg(
        F.sum(c_cents).alias("__tot"), F.count(F.lit(1)).alias("__n")
    )
    return (
        cust.join(F.broadcast(stats))
        .where(c_cents * F.col("__n") > F.col("__tot"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(c_cents).alias("total_cents"),
        )
    )


ORACLE_Q22 = """
WITH s AS (
  SELECT sum(round(c_acctbal * 100)::BIGINT) AS tot, count(*) AS n
  FROM customer WHERE c_acctbal > 0
)
SELECT c_nationkey, count(*) AS numcust,
       sum(round(c_acctbal * 100)::BIGINT)::BIGINT AS total_cents
FROM customer, s
WHERE round(c_acctbal * 100)::BIGINT * n > tot
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
GROUP BY c_nationkey
"""


REL_QUERIES = {
    "rel_q2_min_within": q_rel_q2_min_within,
    "rel_q4_priority": q_rel_q4_priority,
    "rel_q7_volume": q_rel_q7_volume,
    "rel_q10_returns": q_rel_q10_returns,
    "rel_q12_priority": q_rel_q12_priority,
    "rel_q16_distinct": q_rel_q16_distinct,
    "rel_q18_big_orders": q_rel_q18_big_orders,
    "rel_q19_disjunct": q_rel_q19_disjunct,
    "rel_q22_anti": q_rel_q22_anti,
}

REL_ORACLES = {
    "rel_q2_min_within": ORACLE_Q2,
    "rel_q4_priority": ORACLE_Q4,
    "rel_q7_volume": ORACLE_Q7,
    "rel_q10_returns": ORACLE_Q10,
    "rel_q12_priority": ORACLE_Q12,
    "rel_q16_distinct": ORACLE_Q16,
    "rel_q18_big_orders": ORACLE_Q18,
    "rel_q19_disjunct": ORACLE_Q19,
    "rel_q22_anti": ORACLE_Q22,
}
