"""ETL utility operators: CDC-style upsert merge, table profiling,
histogram binning, regex extraction — the data-engineering verbs around
the core graph build.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from graphdbetl_spark.plans.registry import query
from graphdbetl_spark.sources.catalog import load_table as T


@query(
    "node_upsert",
    oracle="""
    WITH base AS (
        SELECT c_custkey, c_name, c_acctbal, c_mktsegment
        FROM customer WHERE c_custkey % 3 <> 0
    ), delta AS (
        SELECT c_custkey, c_name, c_acctbal + 100 AS c_acctbal,
               upper(c_mktsegment) AS c_mktsegment
        FROM customer WHERE c_custkey % 2 = 0
    )
    SELECT COALESCE(d.c_custkey, b.c_custkey) AS c_custkey,
           COALESCE(d.c_name, b.c_name) AS c_name,
           COALESCE(d.c_acctbal, b.c_acctbal) AS c_acctbal,
           COALESCE(d.c_mktsegment, b.c_mktsegment) AS c_mktsegment,
           d.c_custkey IS NOT NULL AS was_updated
    FROM base b FULL JOIN delta d ON b.c_custkey = d.c_custkey
    """,
)
def node_upsert(spark: SparkSession, sf: str) -> DataFrame:
    """CDC-style upsert: merge a delta snapshot into a base node table
    (delta wins per column, unmatched rows survive both ways) — the
    batch form of the reference's 'merge data into an existing record
    or create a new entry' contract (graph_db_builder.py:493-497).
    One full-outer shuffle join on the id; at warehouse scale this maps
    onto MERGE INTO against a lakehouse table format."""
    c = T(spark, sf, "customer").select("c_custkey", "c_name", "c_acctbal", "c_mktsegment")
    base = c.filter(F.col("c_custkey") % 3 != 0)
    delta = c.filter(F.col("c_custkey") % 2 == 0).select(
        "c_custkey",
        "c_name",
        (F.col("c_acctbal") + 100).alias("c_acctbal"),
        F.upper("c_mktsegment").alias("c_mktsegment"),
    )
    b, d = base.alias("b"), delta.alias("d")
    joined = b.join(d, F.col("b.c_custkey") == F.col("d.c_custkey"), "full")
    return joined.select(
        F.coalesce("d.c_custkey", "b.c_custkey").alias("c_custkey"),
        F.coalesce("d.c_name", "b.c_name").alias("c_name"),
        F.coalesce("d.c_acctbal", "b.c_acctbal").alias("c_acctbal"),
        F.coalesce("d.c_mktsegment", "b.c_mktsegment").alias("c_mktsegment"),
        F.col("d.c_custkey").isNotNull().alias("was_updated"),
    )


@query(
    "profile_table",
    oracle="""
    SELECT 'o_totalprice' AS col_name,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(o_totalprice) AS BIGINT) AS n_nonnull,
           CAST(COUNT(DISTINCT o_totalprice) AS BIGINT) AS n_distinct,
           ROUND(MIN(o_totalprice), 2) AS min_v,
           ROUND(MAX(o_totalprice), 2) AS max_v,
           ROUND(AVG(o_totalprice), 4) AS avg_v
    FROM orders
    UNION ALL
    SELECT 'o_custkey',
           CAST(COUNT(*) AS BIGINT), CAST(COUNT(o_custkey) AS BIGINT),
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT),
           ROUND(MIN(o_custkey), 2), ROUND(MAX(o_custkey), 2),
           ROUND(AVG(o_custkey), 4)
    FROM orders
    """,
)
def profile_table(spark: SparkSession, sf: str) -> DataFrame:
    """Column profiling (rows/nulls/distinct/min/max/avg) — the data-
    quality sweep an ETL run emits; one scan per profiled column set,
    all aggregates partial+final."""
    o = T(spark, sf, "orders")

    def prof(col: str) -> DataFrame:
        return o.agg(
            F.lit(col).alias("col_name"),
            F.count(F.lit(1)).alias("n_rows"),
            F.count(col).alias("n_nonnull"),
            F.countDistinct(col).alias("n_distinct"),
            F.round(F.min(col), 2).alias("min_v"),
            F.round(F.max(col), 2).alias("max_v"),
            F.round(F.avg(col), 4).alias("avg_v"),
        )

    return prof("o_totalprice").unionByName(prof("o_custkey"))


@query(
    "histogram_bins",
    oracle="""
    SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(MIN(o_totalprice), 2) AS bin_min,
           ROUND(MAX(o_totalprice), 2) AS bin_max
    FROM orders GROUP BY 1
    """,
)
def histogram_bins(spark: SparkSession, sf: str) -> DataFrame:
    """Fixed-width histogram as a group-by on the bin expression —
    single pass, shuffle bytes = number of bins."""
    o = T(spark, sf, "orders")
    return (
        o.groupBy(F.floor(F.col("o_totalprice") / 50000).alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("o_totalprice"), 2).alias("bin_min"),
            F.round(F.max("o_totalprice"), 2).alias("bin_max"),
        )
    )


@query(
    "regex_extract",
    oracle="""
    SELECT c_custkey,
           regexp_extract(c_name, '([0-9]+)', 1) AS name_digits,
           CAST(regexp_matches(c_name, '^Customer#') AS BOOLEAN) AS is_customer,
           regexp_replace(c_name, '[0-9]+', '<N>', 'g') AS name_masked
    FROM customer
    """,
)
def regex_extract(spark: SparkSession, sf: str) -> DataFrame:
    c = T(spark, sf, "customer")
    return c.select(
        "c_custkey",
        F.regexp_extract("c_name", r"([0-9]+)", 1).alias("name_digits"),
        F.col("c_name").rlike("^Customer#").alias("is_customer"),
        F.regexp_replace("c_name", r"[0-9]+", "<N>").alias("name_masked"),
    )
