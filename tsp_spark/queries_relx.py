"""Extended relational anchors (beyond-reference: SURVEY.md §2.11).

The reference engine has no relational joins, group-by aggregation,
distinct, sorts, limits, or subqueries (SURVEY §2.11) — these anchors
demonstrate that the rebuilt engine covers those shapes as first-class,
oracle-checked queries on the TPC-H-ish testdata. Each exercises one
distinct plan shape:

* q2_min_within   — min-within-group subquery joined back (TPC-H Q2 shape)
* q7_volume       — two-sided dimension join + calendar-year rollup (Q7)
* q10_returns     — aggregated top-k with deterministic tie-break (Q10)
* q16_distinct    — COUNT(DISTINCT) grouped aggregation (Q16)
* q18_big_orders  — grouped HAVING feeding a join (Q18)

plus rel_tpch_fold, one driver entry folding the remaining 12 TPC-H
shapes (every plan shape of the 22-query suite is covered, adapted to
this testdata's partsupp-free schema):

* q4  — EXISTS / left-semi join with a non-equi residual (priority)
* q12 — conditional aggregation after a fact join (priority split)
* q19 — OR-of-ANDs residual split over a fact join (disjunct revenue)
* q22 — scalar-aggregate subquery + anti join (above-average custs)
* q8  — snowflake join + conditional-share rollup (market share)
* q9  — LIKE-filtered multiway join + nation/year rollup (profit)
* q11 — grouped agg filtered by a global scalar agg (value share)
* q13 — zero-preserving outer join + count-of-counts histogram
* q15 — windowed revenue view + scalar-max equality join (top supplier)
* q17 — correlated per-group average, cross-multiplied (small qty)
* q20 — nested semi-join-reduction chain (promo-part suppliers)
* q21 — EXISTS + NOT-EXISTS as a grouped per-order profile (waiting)
* rollup — GROUPING SETS (Expand + single-pass multi-level aggregate)

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


# ---------------------------------------------------------------------------
# rel_tpch_fold — 12 folded TPC-H plan shapes (Q4 Q8 Q9 Q11 Q12 Q13 Q15
# Q17 Q19 Q20 Q21 Q22 + a ROLLUP variant), adapted to the partsupp-free
# testdata schema exactly the way Q2/Q16 above are, and folded into ONE
# driver entry so the registry stays inside the driver's 50-query
# correctness window (Q4/Q12/Q19/Q22 moved into the fold in r8 when the
# prep_*/dedup_simhash additions pushed the registry to 54). Each
# variant keeps its own Spark plan and its own DuckDB oracle; the fold
# normalizes every result to (variant, k1, k2, v1, v2) — string keys,
# BIGINT values, '' / 0 for unused slots — so each shape stays
# independently value-checked inside the fold (same pattern as
# cep_wait_until_tol / cep_lag).
#
# Exactness: money in integer cents (volume_e4 = cents × (100 − disc)),
# quantity is integral in this testdata (verified: 0 non-integral rows)
# so it casts to BIGINT losslessly, and every avg/fraction comparison is
# cross-multiplied into integer arithmetic. Per-group sums stay far from
# int64 overflow at bench SFs; the DECIMAL(38,0) ladder rel_q1 uses is
# the documented path if a group's sum ever approaches 2^63.
# ---------------------------------------------------------------------------


def q_rel_q8_share(spark, sf_dir):
    """TPC-H Q8 (national market share): five-way snowflake join — fact
    lineitem to orders→customer→nation→region on the demand side and
    supplier→nation on the supply side, part filter, then a per-year
    conditional-sum share (numerator and denominator returned as exact
    BIGINTs instead of a lossy ratio).

    100 TB: only nation/region/supplier copies are broadcast-hinted;
    orders/customer/part joins carry no hint so AQE picks shuffle vs
    runtime broadcast. The year range reaches the lineitem scan as a
    pushed range predicate (`_ts_lit` comparison)."""
    li = _q._load(spark, sf_dir, "lineitem")
    orders = _q._load(spark, sf_dir, "orders")
    cust = _q._load(spark, sf_dir, "customer")
    supp = _q._load(spark, sf_dir, "supplier")
    nation = _q._load(spark, sf_dir, "nation")
    region = _q._load(spark, sf_dir, "region")
    part = _q._load(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY")
    nc = nation.select(
        F.col("n_nationkey").alias("__nck"), F.col("n_regionkey").alias("__nrk")
    )
    ns = nation.select(
        F.col("n_nationkey").alias("__nsk"), F.col("n_name").alias("supp_nation")
    )
    vol = _q._cents("l_extendedprice") * (100 - _q._cents("l_discount"))
    return (
        li.where(
            (li.l_shipdate >= _q._ts_lit(_ms(1996, 1, 1)))
            & (li.l_shipdate < _q._ts_lit(_ms(1998, 1, 1)))
        )
        .join(part, li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(nc), cust.c_nationkey == F.col("__nck"))
        .join(
            F.broadcast(region.where(F.col("r_name") == "ASIA")),
            F.col("__nrk") == F.col("r_regionkey"),
        )
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(ns), supp.s_nationkey == F.col("__nsk"))
        .groupBy(F.year("l_shipdate").alias("o_year"))
        .agg(
            F.sum(
                F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(F.lit(0))
            ).alias("nation_vol_e4"),
            F.sum(vol).alias("total_vol_e4"),
        )
    )


ORACLE_Q8 = """
SELECT year(l_shipdate)::INT AS o_year,
       sum(CASE WHEN ns.n_name = 'NATION_3'
                THEN round(l_extendedprice*100)::BIGINT
                     * (100 - round(l_discount*100)::BIGINT)
                ELSE 0 END)::BIGINT AS nation_vol_e4,
       sum(round(l_extendedprice*100)::BIGINT
           * (100 - round(l_discount*100)::BIGINT))::BIGINT AS total_vol_e4
FROM lineitem
JOIN part ON l_partkey = p_partkey AND p_type = 'ECONOMY'
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation nc ON c_nationkey = nc.n_nationkey
JOIN region ON nc.n_regionkey = r_regionkey AND r_name = 'ASIA'
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ns ON s_nationkey = ns.n_nationkey
WHERE year(l_shipdate) IN (1996, 1997)
GROUP BY 1
"""


def q_rel_q9_profit(spark, sf_dir):
    """TPC-H Q9 (product-type profit): part-name LIKE filter, supplier
    nation rollup by ship year. The testdata has no partsupp, so the
    cost term uses the part's retail price (retail_cents × 100 × qty,
    commensurate with volume_e4) — same join tree and rollup as
    canonical Q9, profit may go negative, all integer math.

    100 TB: the LIKE-filtered part join carries no hint (fact-scale
    dim; AQE decides), supplier/nation broadcast."""
    li = _q._load(spark, sf_dir, "lineitem")
    part = _q._load(spark, sf_dir, "part").where(F.col("p_name").like("%red%"))
    supp = _q._load(spark, sf_dir, "supplier")
    nation = _q._load(spark, sf_dir, "nation")
    qty = F.col("l_quantity").cast("long")
    amount = _q._cents("l_extendedprice") * (
        100 - _q._cents("l_discount")
    ) - _q._cents("p_retailprice") * 100 * qty
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"), F.year("l_shipdate").alias("o_year")
        )
        .agg(
            F.sum(amount).alias("profit_e4"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


ORACLE_Q9 = """
SELECT n_name AS nation, year(l_shipdate)::INT AS o_year,
       sum(round(l_extendedprice*100)::BIGINT
           * (100 - round(l_discount*100)::BIGINT)
           - round(p_retailprice*100)::BIGINT * 100 * l_quantity::BIGINT
          )::BIGINT AS profit_e4,
       count(*) AS n_lines
FROM lineitem
JOIN part ON l_partkey = p_partkey AND p_name LIKE '%red%'
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
GROUP BY 1, 2
"""


def q_rel_q11_value(spark, sf_dir):
    """TPC-H Q11 (value concentration): per-supplier shipped value
    within one region, kept only where the supplier's share exceeds
    1/200 of the regional total — a grouped aggregate filtered by a
    global scalar aggregate (partsupp-free: value = price_cents × qty
    over lineitem instead of supplycost × availqty).

    100 TB: the scalar total is a one-row broadcast; the share test is
    cross-multiplied (val × 200 > total) so no float division."""
    li = _q._load(spark, sf_dir, "lineitem")
    supp = _q._load(spark, sf_dir, "supplier")
    nation = _q._load(spark, sf_dir, "nation")
    region = _q._load(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    val = _q._cents("l_extendedprice") * F.col("l_quantity").cast("long")
    per = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("l_suppkey")
        .agg(F.sum(val).alias("value_e2"))
    )
    # the GLOBAL total sums every per-supplier value: at 100 TB it
    # clears int64 (~1e19 for a region) and Spark's non-ANSI long sum
    # would wrap silently while DuckDB widens to HUGEINT — accumulate
    # in DECIMAL(38,0) like rel_q1's money sums (review-caught). The
    # share test cross-multiplies in decimal too (x200 adds 3 digits,
    # still far inside 38).
    total = per.agg(
        F.sum(F.col("value_e2").cast("decimal(38,0)")).alias("__tot")
    )
    return (
        per.join(F.broadcast(total))
        .where(
            F.col("value_e2").cast("decimal(38,0)") * 200 > F.col("__tot")
        )
        .select("l_suppkey", "value_e2")
    )


ORACLE_Q11 = """
WITH v AS (
  SELECT l_suppkey,
         sum(round(l_extendedprice*100)::BIGINT * l_quantity::BIGINT)::BIGINT AS value_e2
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey AND r_name = 'EUROPE'
  GROUP BY l_suppkey)
SELECT l_suppkey, value_e2 FROM v
WHERE value_e2 * 200 > (SELECT sum(value_e2) FROM v)
"""


def q_rel_q13_distribution(spark, sf_dir):
    """TPC-H Q13 (customer order distribution): outer join that must
    preserve zero-order customers, then a second aggregation over the
    first's counts (count-of-counts histogram).

    100 TB: both aggregations are partial-agg groupBys; the outer join
    shuffles on custkey once and the histogram groupBy moves only
    (count, 1) pairs."""
    cust = _q._load(spark, sf_dir, "customer")
    orders = _q._load(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


ORACLE_Q13 = """
WITH c AS (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey)
SELECT c_count, count(*) AS custdist FROM c GROUP BY c_count
"""


def q_rel_q15_top_supplier(spark, sf_dir):
    """TPC-H Q15 (top supplier): per-supplier revenue over a 3-month
    ship window, then an equality join against the global max — the
    view-plus-scalar-max shape, exact because revenue is an integer.

    100 TB: the date range is a pushed scan predicate; the max is a
    one-row broadcast; ties (multiple max suppliers) are all returned,
    which is why no LIMIT/tie-break is needed for determinism."""
    li = _q._load(spark, sf_dir, "lineitem")
    supp = _q._load(spark, sf_dir, "supplier")
    rev = _q._cents("l_extendedprice") * (100 - _q._cents("l_discount"))
    per = (
        li.where(
            (li.l_shipdate >= _q._ts_lit(_ms(1996, 1, 1)))
            & (li.l_shipdate < _q._ts_lit(_ms(1996, 4, 1)))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(rev).alias("total_rev_e4"))
    )
    mx = per.agg(F.max("total_rev_e4").alias("__mx"))
    return (
        per.join(F.broadcast(mx))
        .where(F.col("total_rev_e4") == F.col("__mx"))
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .select("l_suppkey", "s_name", "total_rev_e4")
    )


ORACLE_Q15 = f"""
WITH r AS (
  SELECT l_suppkey,
         sum(round(l_extendedprice*100)::BIGINT
             * (100 - round(l_discount*100)::BIGINT))::BIGINT AS total_rev_e4
  FROM lineitem
  WHERE epoch_ms(l_shipdate) >= {_ms(1996, 1, 1)}
    AND epoch_ms(l_shipdate) < {_ms(1996, 4, 1)}
  GROUP BY l_suppkey)
SELECT l_suppkey, s_name, total_rev_e4
FROM r JOIN supplier ON l_suppkey = s_suppkey
WHERE total_rev_e4 = (SELECT max(total_rev_e4) FROM r)
"""


def q_rel_q17_small_qty(spark, sf_dir):
    """TPC-H Q17 (small-quantity revenue): lines of one brand whose
    quantity is below 20% of that part's average — the correlated
    per-part average, cross-multiplied (5·qty·count < sum_qty) so the
    margin is decided in integers. One global row out.

    100 TB: the per-part average only needs parts that survive the
    brand filter, so lineitem is semi-join-reduced by the filtered part
    keys BEFORE the per-part aggregate — the aggregate's shuffle then
    carries ~|filtered parts| groups instead of |all parts|."""
    li = _q._load(spark, sf_dir, "lineitem")
    part = _q._load(spark, sf_dir, "part").where(
        (F.col("p_brand") == "Brand#4") & (F.col("p_size") <= 10)
    )
    qty = F.col("l_quantity").cast("long")
    reduced = li.join(part.select("p_partkey"), li.l_partkey == F.col("p_partkey"))
    pa = reduced.groupBy(F.col("l_partkey").alias("__pk")).agg(
        F.sum(qty).alias("__sq"), F.count(F.lit(1)).alias("__cn")
    )
    return (
        reduced.join(pa, reduced.l_partkey == F.col("__pk"))
        .where(5 * qty * F.col("__cn") < F.col("__sq"))
        .agg(
            F.sum(_q._cents("l_extendedprice")).alias("small_rev_cents"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


ORACLE_Q17 = """
WITH pa AS (
  SELECT l_partkey AS pk, sum(l_quantity::BIGINT) AS sq, count(*) AS cn
  FROM lineitem GROUP BY l_partkey)
SELECT sum(round(l_extendedprice*100)::BIGINT)::BIGINT AS small_rev_cents,
       count(*) AS n_lines
FROM lineitem
JOIN part ON l_partkey = p_partkey AND p_brand = 'Brand#4' AND p_size <= 10
JOIN pa ON l_partkey = pk
WHERE 5 * l_quantity::BIGINT * cn < sq
"""


def q_rel_q20_promo(spark, sf_dir):
    """TPC-H Q20 (promotion-part suppliers): suppliers who shipped more
    than 50 units of 'small%'-named parts during 1996 — the nested
    semi-join-reduction chain (part filter → lineitem agg → HAVING →
    supplier join), availqty-free.

    100 TB: the part-name filter semi-reduces lineitem before any
    aggregation; the HAVING output is tiny, so the final supplier join
    broadcasts the aggregate, not the dimension."""
    li = _q._load(spark, sf_dir, "lineitem")
    part = _q._load(spark, sf_dir, "part").where(F.col("p_name").like("small%"))
    supp = _q._load(spark, sf_dir, "supplier")
    qty = F.col("l_quantity").cast("long")
    q = (
        li.where(
            (li.l_shipdate >= _q._ts_lit(_ms(1996, 1, 1)))
            & (li.l_shipdate < _q._ts_lit(_ms(1997, 1, 1)))
        )
        .join(part.select("p_partkey"), li.l_partkey == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum(qty).alias("qty"))
        .where(F.col("qty") > 50)
    )
    # NO broadcast hint on q (review-caught): the HAVING keeps nearly
    # every supplier (qty > 50 filters ~nothing), so q scales with
    # supplier cardinality — a forced broadcast OOMs at 100 TB. AQE
    # broadcasts it at small SF on its own; at scale both sides hash
    # on s_suppkey.
    return supp.join(q, supp.s_suppkey == F.col("l_suppkey")).select(
        "s_name", "qty"
    )


ORACLE_Q20 = f"""
WITH q AS (
  SELECT l_suppkey, sum(l_quantity::BIGINT)::BIGINT AS qty
  FROM lineitem
  WHERE epoch_ms(l_shipdate) >= {_ms(1996, 1, 1)}
    AND epoch_ms(l_shipdate) < {_ms(1997, 1, 1)}
    AND l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
  GROUP BY l_suppkey HAVING sum(l_quantity::BIGINT) > 50)
SELECT s_name, qty FROM supplier JOIN q ON s_suppkey = l_suppkey
"""


def q_rel_q21_waiting(spark, sf_dir):
    """TPC-H Q21 (suppliers who kept orders waiting): on finished
    orders with ≥2 distinct suppliers, count per supplier the orders
    where they alone had a returned line — EXISTS (another supplier) +
    NOT EXISTS (another faulty supplier), expressed as one grouped
    per-order profile instead of two correlated subqueries (the
    commitdate-free adaptation: 'R' returnflag is the fault signal).

    100 TB: one shuffle on (orderkey, suppkey), one on orderkey —
    the per-order profile is a window-free double aggregate; the
    re-join is on orderkey, no correlated per-row probes."""
    li = _q._load(spark, sf_dir, "lineitem")
    orders = _q._load(spark, sf_dir, "orders").where(
        F.col("o_orderstatus") == "F"
    )
    supp = _q._load(spark, sf_dir, "supplier")
    per = (
        li.join(orders.select("o_orderkey"), li.l_orderkey == F.col("o_orderkey"), "left_semi")
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max(
                F.when(F.col("l_returnflag") == "R", F.lit(1)).otherwise(F.lit(0))
            ).alias("has_r")
        )
    )
    order_prof = per.groupBy(F.col("l_orderkey").alias("__ok")).agg(
        F.count(F.lit(1)).alias("n_supp"), F.sum("has_r").alias("n_r")
    )
    return (
        per.join(order_prof, per.l_orderkey == F.col("__ok"))
        .where((F.col("has_r") == 1) & (F.col("n_supp") >= 2) & (F.col("n_r") == 1))
        .join(F.broadcast(supp), per.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


ORACLE_Q21 = """
WITH per AS (
  SELECT l_orderkey AS ok, l_suppkey AS sk,
         max(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS has_r
  FROM lineitem
  WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F')
  GROUP BY 1, 2),
o AS (SELECT ok, count(*) AS n_supp, sum(has_r) AS n_r FROM per GROUP BY ok)
SELECT s_name, count(*) AS numwait
FROM per JOIN o USING (ok) JOIN supplier ON sk = s_suppkey
WHERE has_r = 1 AND n_supp >= 2 AND n_r = 1
GROUP BY s_name
"""


def q_rel_rollup(spark, sf_dir):
    """GROUPING SETS shape (beyond the 22-query suite — SURVEY §2.11
    lists grouped aggregation as absent in the reference): a ROLLUP over
    (returnflag, linestatus) producing per-group, per-flag and grand
    totals in ONE pass. Spark plans rollup as a single Expand +
    hash-aggregate — one shuffle carrying each row once per grouping
    set, partial-aggregated map-side; the 'ALL' labels stand in for the
    rollup NULLs so the fold's key columns stay non-null (this testdata
    has no data NULLs in either column).

    100 TB: Expand multiplies rows ×3 BEFORE the partial aggregate
    collapses them per set — the shuffle still carries only
    (groups × sets) rows, not the fact table."""
    li = _q._load(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("long")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n_lines"), F.sum(qty).alias("sum_qty"))
        .select(
            F.coalesce(F.col("l_returnflag"), F.lit("ALL")).alias("rf"),
            F.coalesce(F.col("l_linestatus"), F.lit("ALL")).alias("ls"),
            "n_lines",
            "sum_qty",
        )
    )


ORACLE_ROLLUP = """
SELECT coalesce(l_returnflag, 'ALL') AS rf,
       coalesce(l_linestatus, 'ALL') AS ls,
       count(*)::BIGINT AS n_lines,
       sum(l_quantity::BIGINT)::BIGINT AS sum_qty
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def _tpch_norm(df, variant, k1=None, k2=None, v1=None, v2=None):
    """Normalize a variant's native schema to the fold's common row
    shape (variant, k1, k2, v1, v2): keys as strings, values as longs,
    '' / 0 in unused slots so no column is ever all-NULL (all-NULL
    columns decay to object dtype on the oracle side and break the
    driver's dtype-sensitive hash)."""
    return df.select(
        F.lit(variant).alias("variant"),
        (F.col(k1).cast("string") if k1 else F.lit("")).alias("k1"),
        (F.col(k2).cast("string") if k2 else F.lit("")).alias("k2"),
        (F.col(v1).cast("long") if v1 else F.lit(0).cast("long")).alias("v1"),
        (F.col(v2).cast("long") if v2 else F.lit(0).cast("long")).alias("v2"),
    )


def q_rel_tpch_fold(spark, sf_dir):
    """The folded TPC-H shapes, tagged by ``variant`` (see module
    docstring): q4 late-ship priority, q8 share, q9 profit, q11 value
    concentration, q12 priority split, q13 distribution, q15 top
    supplier, q17 small-quantity, q19 disjunctive predicate, q20 promo
    suppliers, q21 waiting suppliers, q22 anti-join, rollup."""
    parts = [
        _tpch_norm(q_rel_q8_share(spark, sf_dir), "q8",
                   k1="o_year", v1="nation_vol_e4", v2="total_vol_e4"),
        _tpch_norm(q_rel_q9_profit(spark, sf_dir), "q9",
                   k1="nation", k2="o_year", v1="profit_e4", v2="n_lines"),
        _tpch_norm(q_rel_q11_value(spark, sf_dir), "q11",
                   k1="l_suppkey", v1="value_e2"),
        _tpch_norm(q_rel_q13_distribution(spark, sf_dir), "q13",
                   k1="c_count", v1="custdist"),
        _tpch_norm(q_rel_q15_top_supplier(spark, sf_dir), "q15",
                   k1="l_suppkey", k2="s_name", v1="total_rev_e4"),
        _tpch_norm(q_rel_q17_small_qty(spark, sf_dir), "q17",
                   v1="small_rev_cents", v2="n_lines"),
        _tpch_norm(q_rel_q20_promo(spark, sf_dir), "q20",
                   k1="s_name", v1="qty"),
        _tpch_norm(q_rel_q21_waiting(spark, sf_dir), "q21",
                   k1="s_name", v1="numwait"),
        _tpch_norm(q_rel_rollup(spark, sf_dir), "rollup",
                   k1="rf", k2="ls", v1="n_lines", v2="sum_qty"),
        _tpch_norm(q_rel_q4_priority(spark, sf_dir), "q4",
                   k1="o_orderpriority", v1="order_count"),
        _tpch_norm(q_rel_q12_priority(spark, sf_dir), "q12",
                   k1="l_returnflag", v1="high_line_count",
                   v2="low_line_count"),
        _tpch_norm(q_rel_q19_disjunct(spark, sf_dir), "q19",
                   v1="revenue_e4", v2="n_lines"),
        _tpch_norm(q_rel_q22_anti(spark, sf_dir), "q22",
                   k1="c_nationkey", v1="numcust", v2="total_cents"),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _tpch_norm_sql(sql, variant, k1=None, k2=None, v1=None, v2=None):
    empty = "''"
    return (
        f"SELECT '{variant}' AS variant, "
        f"{(k1 + '::VARCHAR') if k1 else empty} AS k1, "
        f"{(k2 + '::VARCHAR') if k2 else empty} AS k2, "
        f"{(v1 + '::BIGINT') if v1 else '0::BIGINT'} AS v1, "
        f"{(v2 + '::BIGINT') if v2 else '0::BIGINT'} AS v2 "
        f"FROM ({sql})"
    )


ORACLE_TPCH_FOLD = "\nUNION ALL\n".join(
    [
        _tpch_norm_sql(ORACLE_Q8, "q8", k1="o_year",
                       v1="nation_vol_e4", v2="total_vol_e4"),
        _tpch_norm_sql(ORACLE_Q9, "q9", k1="nation", k2="o_year",
                       v1="profit_e4", v2="n_lines"),
        _tpch_norm_sql(ORACLE_Q11, "q11", k1="l_suppkey", v1="value_e2"),
        _tpch_norm_sql(ORACLE_Q13, "q13", k1="c_count", v1="custdist"),
        _tpch_norm_sql(ORACLE_Q15, "q15", k1="l_suppkey", k2="s_name",
                       v1="total_rev_e4"),
        _tpch_norm_sql(ORACLE_Q17, "q17", v1="small_rev_cents", v2="n_lines"),
        _tpch_norm_sql(ORACLE_Q20, "q20", k1="s_name", v1="qty"),
        _tpch_norm_sql(ORACLE_Q21, "q21", k1="s_name", v1="numwait"),
        _tpch_norm_sql(ORACLE_ROLLUP, "rollup", k1="rf", k2="ls",
                       v1="n_lines", v2="sum_qty"),
        _tpch_norm_sql(ORACLE_Q4, "q4", k1="o_orderpriority",
                       v1="order_count"),
        _tpch_norm_sql(ORACLE_Q12, "q12", k1="l_returnflag",
                       v1="high_line_count", v2="low_line_count"),
        _tpch_norm_sql(ORACLE_Q19, "q19", v1="revenue_e4", v2="n_lines"),
        _tpch_norm_sql(ORACLE_Q22, "q22", k1="c_nationkey",
                       v1="numcust", v2="total_cents"),
    ]
)


REL_QUERIES = {
    "rel_q2_min_within": q_rel_q2_min_within,
    "rel_q7_volume": q_rel_q7_volume,
    "rel_q10_returns": q_rel_q10_returns,
    "rel_q16_distinct": q_rel_q16_distinct,
    "rel_q18_big_orders": q_rel_q18_big_orders,
    "rel_tpch_fold": q_rel_tpch_fold,
}

REL_ORACLES = {
    "rel_q2_min_within": ORACLE_Q2,
    "rel_q7_volume": ORACLE_Q7,
    "rel_q10_returns": ORACLE_Q10,
    "rel_q16_distinct": ORACLE_Q16,
    "rel_q18_big_orders": ORACLE_Q18,
    "rel_tpch_fold": ORACLE_TPCH_FOLD,
}
