"""SQL-frontend queries completing the TPC-H shape coverage: Q8, Q9,
Q11, Q12, Q13, Q15, Q16, Q20, Q21, Q22 styles.

The reference has no SQL surface at all (SURVEY.md §2 — its "query
language" is the YAML config, `graph_db_builder.py:545-549`); the SQL
frontend is north-star breadth. Each query here is a *-style*
adaptation: the driver's TPC-H-ish tables lack partsupp,
commit/receipt dates, shipmode, and phone (TESTDATA.md), so those
predicates are re-expressed over available columns while keeping the
plan shape that makes each query a distinct optimizer exercise —
correlated EXISTS/NOT EXISTS (Q21/Q22), nested IN with grouped HAVING
(Q20), global scalar subqueries (Q11/Q15/Q22), double aggregation over
an outer join (Q13), and multi-dimension conditional aggregation
(Q8/Q9/Q12).

The SQL text is shared verbatim between `spark.sql` and the DuckDB
oracle, so correctness checks the whole frontend→Catalyst path, not a
DataFrame re-derivation. House invariants: every computed column is
aliased identically on both sides, money sums round at 4, counts cast
to BIGINT, EXTRACT results cast to INT (DuckDB widens to BIGINT).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from graphdbetl_spark.plans.registry import query
from graphdbetl_spark.sources.catalog import load_table as T


def _views(spark: SparkSession, sf: str, *tables: str) -> None:
    for t in tables:
        T(spark, sf, t).createOrReplaceTempView(t)


# Exact scaled-integer accumulation (the _Q1_SQL idiom, r5): the
# per-year revenue sums diverged from the oracle at the 30x replica
# when summed as rounded floats (magnitudes ~1e9 outrun a 1e-4 grid);
# BIGINT sums of ROUND(product*1e4) are as exact as r4's decimal
# accumulator — each 4-decimal product scales to within 1e-5 of an
# integer, identical in both engines — at a long-adder's cost.
_Q8_SQL = """
SELECT CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INT) AS o_year,
       CAST(SUM(CASE WHEN ns.n_name = 'NATION_5'
                     THEN CAST(ROUND(l.l_extendedprice * (1 - l.l_discount)
                                     * 10000) AS BIGINT)
                     ELSE 0 END) AS DOUBLE) / 10000.0 AS nation_revenue,
       CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 10000)
                     AS BIGINT)) AS DOUBLE) / 10000.0 AS total_revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation nc ON c.c_nationkey = nc.n_nationkey
JOIN region r ON nc.n_regionkey = r.r_regionkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation ns ON s.s_nationkey = ns.n_nationkey
WHERE r.r_name = 'EUROPE'
GROUP BY o_year
"""


@query("sql_frontend_q8_style", oracle=_Q8_SQL)
def sql_frontend_q8_style(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q8 shape (national market share): a 7-table join tree with
    per-year conditional aggregation. Both fact tables shuffle once on
    the orderkey join; all five dimension sides (customer via its
    nation/region chain, supplier via its nation) are broadcast, so the
    only exchanges at warehouse scale are lineitem⋈orders and the tiny
    per-year final agg. Emits numerator and denominator sums, not their
    quotient (half-boundary invariant)."""
    _views(spark, sf, "lineitem", "orders", "customer", "nation", "region", "supplier")
    return spark.sql(_Q8_SQL)


_Q9_SQL = """
SELECT ns.n_name AS nation,
       CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INT) AS o_year,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)
                 - 0.6 * p.p_retailprice * l.l_quantity), 4) AS sum_profit
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation ns ON ns.n_nationkey = s.s_nationkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE p.p_name LIKE '%widget%'
GROUP BY nation, o_year
"""


@query("sql_frontend_q9_style", oracle=_Q9_SQL)
def sql_frontend_q9_style(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q9 shape (product-type profit): profit measure across the
    full fact⋈dims star, grouped by supplier nation × year. The
    reference tables have no partsupp, so supply cost is modeled as
    0.6 × p_retailprice — same expression shape (a two-table product
    inside SUM). The selective LIKE filter on part prunes before the
    join; part/supplier/nation broadcast; lineitem⋈orders is the one
    big exchange."""
    _views(spark, sf, "lineitem", "part", "supplier", "nation", "orders")
    return spark.sql(_Q9_SQL)


_Q11_SQL = """
SELECT l.l_partkey,
       ROUND(SUM(l.l_extendedprice * l.l_quantity), 4) AS part_value
FROM lineitem l
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE n.n_name = 'NATION_3'
GROUP BY l.l_partkey
HAVING SUM(l.l_extendedprice * l.l_quantity) > (
    SELECT 3.0 * SUM(l2.l_extendedprice * l2.l_quantity)
               / COUNT(DISTINCT l2.l_partkey)
    FROM lineitem l2
    JOIN supplier s2 ON s2.s_suppkey = l2.l_suppkey
    JOIN nation n2 ON n2.n_nationkey = s2.s_nationkey
    WHERE n2.n_name = 'NATION_3')
"""


@query("sql_frontend_q11_style", oracle=_Q11_SQL)
def sql_frontend_q11_style(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q11 shape (important stock): grouped aggregate filtered by
    a HAVING threshold that is itself a global scalar subquery over the
    same join. Catalyst evaluates the 1-row subquery once and
    broadcast-joins it against the per-part aggregate — the fact table
    is scanned twice but never widened. Part value uses
    extendedprice×quantity in place of the missing ps_supplycost×
    ps_availqty; the threshold is 3× the mean per-part value rather
    than the spec's fixed corpus fraction, so the survivor set stays
    non-degenerate at every scale factor instead of emptying as the
    part count grows."""
    _views(spark, sf, "lineitem", "supplier", "nation")
    return spark.sql(_Q11_SQL)


_Q12_SQL = """
SELECT l.l_returnflag AS ship_class,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders o
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate >= DATE '1997-01-01' AND l.l_shipdate < DATE '1998-01-01'
  AND l.l_shipdate > o.o_orderdate
GROUP BY l.l_returnflag
"""


@query("sql_frontend_q12_style", oracle=_Q12_SQL)
def sql_frontend_q12_style(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q12 shape (shipping-priority split): fact⋈fact equi-join
    with a cross-table residual predicate (shipdate > orderdate stands
    in for the missing receipt/commit comparison) feeding a two-way
    conditional count per class (l_returnflag stands in for shipmode).
    The year filter pushes to the lineitem scan; the 3-group agg is
    all map-side partials."""
    _views(spark, sf, "orders", "lineitem")
    return spark.sql(_Q12_SQL)


_Q13_SQL = """
WITH c_orders AS (
    SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_orders
    FROM customer c
    LEFT JOIN orders o
      ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '5-LOW'
    GROUP BY c.c_custkey
)
SELECT CAST(n_orders AS BIGINT) AS c_count,
       CAST(COUNT(*) AS BIGINT) AS custdist
FROM c_orders
GROUP BY c_count
"""


@query("sql_frontend_q13_style", oracle=_Q13_SQL)
def sql_frontend_q13_style(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q13 shape (customer order distribution): double
    aggregation — COUNT over a filtered LEFT OUTER join (the filter
    lives in the join condition so empty customers survive with count
    0), then a histogram GROUP BY over the counts. First agg shuffles
    on custkey (AQE co-partitions it with the join); the second input
    is one row per customer and collapses to a few dozen groups."""
    _views(spark, sf, "customer", "orders")
    return spark.sql(_Q13_SQL)


# revenue accumulates as an exact scaled integer (the _Q1_SQL idiom):
# the argmax predicate compares across GROUPS, so two suppliers with
# identical line items must land on the identical total regardless of
# per-partition accumulation order (float sums broke the tie set on
# the 10x replica, where every supplier has 9 value-identical clones);
# the per-row product stays double (same IEEE result on both engines),
# only the SUM is exact — BIGINT units of 1e-6, the argmax compares
# exact integers, and only the winners' totals are rendered as DOUBLE.
_Q15_SQL = """
WITH revenue AS (
    SELECT l_suppkey AS supplier_no,
           SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 1000000)
                    AS BIGINT)) AS total_units
    FROM lineitem
    WHERE l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1997-04-01'
    GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name,
       CAST(r.total_units AS DOUBLE) / 1000000.0 AS total_revenue
FROM supplier s
JOIN revenue r ON s.s_suppkey = r.supplier_no
WHERE r.total_units = (SELECT MAX(total_units) FROM revenue)
"""


@query("sql_frontend_q15_style", oracle=_Q15_SQL)
def sql_frontend_q15_style(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q15 shape (top supplier): a CTE consumed twice — once as
    the join probe, once reduced to a scalar MAX — selecting the
    argmax row(s). Catalyst computes the quarter's per-supplier revenue
    aggregate, reduces it to a 1-row MAX, and broadcast-filters the
    same aggregate against it; supplier broadcasts onto the survivor.
    The equality is float-exact *within* each engine (both compare a
    value to the MAX of the set it came from), so the argmax row is
    stable."""
    _views(spark, sf, "lineitem", "supplier")
    return spark.sql(_Q15_SQL)


_Q16_SQL = """
SELECT p.p_brand, p.p_type, p.p_size,
       CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> 'Brand#1'
  AND p.p_type NOT LIKE 'PROMO%'
  AND p.p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
  AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p.p_brand, p.p_type, p.p_size
"""


@query("sql_frontend_q16_style", oracle=_Q16_SQL)
def sql_frontend_q16_style(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q16 shape (parts/supplier relationship): COUNT DISTINCT
    per 3-column group behind negated predicates plus a NOT IN
    subquery. The lineitem⋈part pairing stands in for partsupp; the
    blacklist (negative-balance suppliers, standing in for the
    'complaints' comment scan) becomes a broadcast null-aware anti
    join — s_suppkey is non-null so NOT IN degenerates to a plain anti
    join. Distinct-count expands to a two-phase agg on the already
    part-filtered rows."""
    _views(spark, sf, "lineitem", "part", "supplier")
    return spark.sql(_Q16_SQL)


_Q20_SQL = """
SELECT s.s_suppkey, s.s_name
FROM supplier s
WHERE s.s_suppkey IN (
    SELECT l.l_suppkey
    FROM lineitem l
    WHERE l.l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
      AND l.l_shipdate >= DATE '1997-01-01' AND l.l_shipdate < DATE '1998-01-01'
    GROUP BY l.l_suppkey, l.l_partkey
    HAVING SUM(l.l_quantity) > 40)
ORDER BY s.s_suppkey
"""


@query("sql_frontend_q20_style", oracle=_Q20_SQL)
def sql_frontend_q20_style(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q20 shape (part promotion candidates): nested IN
    subqueries with a grouped HAVING inside — suppliers that moved
    >40 units of some 'red' part in 1997. The inner part IN becomes a
    broadcast semi join pushed below the (suppkey, partkey) aggregate;
    the outer IN becomes a semi join against the tiny supplier table.
    The volume threshold over the grouped agg replaces the spec's
    ps_availqty comparison (no partsupp table) while keeping the
    nested-semi-join + aggregate-in-subquery plan."""
    _views(spark, sf, "supplier", "lineitem", "part")
    return spark.sql(_Q20_SQL)


_Q21_SQL = """
SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM supplier s
JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
JOIN orders o ON o.o_orderkey = l1.l_orderkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE o.o_orderstatus = 'F'
  AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  AND n.n_name = 'NATION_7'
  AND EXISTS (
      SELECT 1 FROM lineitem l2
      WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (
      SELECT 1 FROM lineitem l3
      WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
        AND l3.l_shipdate > l1.l_shipdate)
GROUP BY s.s_name
"""


@query("sql_frontend_q21_style", oracle=_Q21_SQL)
def sql_frontend_q21_style(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting): the classic
    EXISTS + NOT EXISTS pair over the same fact table — multi-supplier
    finished orders where this supplier's line shipped strictly last
    (shipdate > orderdate + 60d stands in for receipt-after-commit).
    Catalyst turns the pair into a left-semi then left-anti join, both
    shuffling on l_orderkey like the main join, so AQE can reuse one
    partitioning across all three; supplier and nation broadcast."""
    _views(spark, sf, "supplier", "lineitem", "orders", "nation")
    return spark.sql(_Q21_SQL)


_Q22_SQL = """
SELECT c.c_nationkey AS cntrycode,
       CAST(COUNT(*) AS BIGINT) AS numcust,
       ROUND(SUM(c.c_acctbal), 4) AS totacctbal
FROM customer c
WHERE c.c_acctbal > (
    SELECT AVG(c2.c_acctbal) FROM customer c2 WHERE c2.c_acctbal > 0)
  AND c.c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
  AND NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey
        AND o.o_orderdate >= DATE '2000-01-01')
GROUP BY c.c_nationkey
"""


@query("sql_frontend_q22_style", oracle=_Q22_SQL)
def sql_frontend_q22_style(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q22 shape (global sales opportunity): anti-join against
    orders plus an uncorrelated scalar-subquery threshold — lapsed
    high-balance customers by country (nationkey stands in for the
    phone prefix; 'no orders since 2000' replaces 'no orders ever',
    which is empty on this data). The AVG subquery evaluates once and
    broadcasts; the NOT EXISTS becomes a left-anti join on o_custkey
    over the date-pruned orders scan; the survivor set is tiny before
    the final 7-group agg."""
    _views(spark, sf, "customer", "orders")
    return spark.sql(_Q22_SQL)
