"""Event- and corpus-analytics queries: retention cohorts, per-type
anomaly detection, and top-k n-grams per language.

The reference's event surface is a row cursor with no analytics
(`graph_db_builder.py:491-543`); these are the standard product/corpus
insight queries a warehouse layers on the same tables. All fully
oracle-checked.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from graphdbetl_spark.operators.dedup import _tokens, _word_ngrams
from graphdbetl_spark.plans.registry import query
from graphdbetl_spark.sources.catalog import load_table as T


@query(
    "retention_cohorts",
    oracle="""
    WITH f AS (
        SELECT user_id, CAST(MIN(date_trunc('week', ts)) AS DATE) AS cohort_week
        FROM events GROUP BY user_id
    ), a AS (
        SELECT DISTINCT e.user_id, f.cohort_week,
               CAST(date_diff('day', f.cohort_week,
                    CAST(date_trunc('week', e.ts) AS DATE)) // 7 AS INT) AS week_n
        FROM events e JOIN f USING (user_id)
    )
    SELECT cohort_week, week_n, CAST(COUNT(*) AS BIGINT) AS n_users
    FROM a GROUP BY cohort_week, week_n
    """,
)
def retention_cohorts(spark: SparkSession, sf: str) -> DataFrame:
    """Weekly retention triangle: users grouped by first-seen week,
    counted per weeks-since-cohort. Two shuffles, both on user_id (the
    min-week agg and the join co-partition — AQE coalesces them); the
    final (cohort, week_n) agg is tiny. Week starts are Monday on both
    engines, so day-diffs are exact multiples of 7 and `div 7` is
    lossless."""
    e = T(spark, sf, "events")
    wk = F.date_trunc("week", F.col("ts")).cast("date")
    first = e.groupBy("user_id").agg(F.min(wk).alias("cohort_week"))
    active = (
        e.select("user_id", wk.alias("activity_week"))
        .join(first, "user_id")
        .select(
            "user_id",
            "cohort_week",
            F.expr("int(datediff(activity_week, cohort_week) div 7)").alias("week_n"),
        )
        .distinct()
    )
    return active.groupBy("cohort_week", "week_n").agg(
        F.count("*").cast("long").alias("n_users")
    )


@query(
    "events_anomaly_zscore",
    oracle="""
    WITH s AS (
        SELECT event_type, AVG(value) AS mu, stddev_samp(value) AS sigma
        FROM events GROUP BY event_type
    )
    SELECT e.event_id, e.event_type, e.value,
           ROUND((e.value - s.mu) / s.sigma, 4) AS z
    FROM events e JOIN s USING (event_type)
    WHERE abs((e.value - s.mu) / s.sigma) > 2.5
    """,
)
def events_anomaly_zscore(spark: SparkSession, sf: str) -> DataFrame:
    """Per-event-type z-score outliers (|z| > 2.5). The stats side is
    one row per event_type — broadcast back over the stream, so the
    detector is a single scan + map-side join at any corpus size (the
    same shape a streaming foreachBatch detector uses per batch)."""
    e = T(spark, sf, "events")
    s = e.groupBy("event_type").agg(
        F.avg("value").alias("mu"), F.stddev_samp("value").alias("sigma")
    )
    z = (F.col("value") - F.col("mu")) / F.col("sigma")
    return (
        e.join(F.broadcast(s), "event_type")
        .filter(F.abs(z) > 2.5)
        .select("event_id", "event_type", "value", F.round(z, 4).alias("z"))
    )


@query(
    "ngram_topk_per_lang",
    oracle="""
    WITH t AS (
        SELECT lang, string_split_regex(trim(text), '\\s+') AS toks FROM documents
    ), g AS (
        SELECT lang,
               unnest(list_transform(range(1, greatest(len(toks) - 1, 0) + 1),
                      i -> toks[i] || ' ' || toks[i+1])) AS gram
        FROM t
    ), c AS (
        SELECT lang, gram, COUNT(*) AS n FROM g GROUP BY lang, gram
    )
    SELECT lang, gram, CAST(n AS BIGINT) AS n, CAST(rn AS INT) AS rank
    FROM (SELECT lang, gram, n,
                 ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n DESC, gram) AS rn
          FROM c)
    WHERE rn <= 5
    """,
)
def ngram_topk_per_lang(spark: SparkSession, sf: str) -> DataFrame:
    """Top-5 word bigrams per language — corpus-level n-gram statistics
    (the building block for LM contamination reports and boilerplate
    discovery). Explode happens inside the scan stage; the (lang, gram)
    agg does map-side partials so the shuffle carries distinct grams,
    not token instances; the final top-k window partitions by lang over
    already-aggregated rows."""
    d = T(spark, sf, "documents")
    grams = d.select(
        "lang", F.explode(_word_ngrams(_tokens(F.col("text")), 2)).alias("gram")
    )
    counts = grams.groupBy("lang", "gram").agg(F.count("*").cast("long").alias("n"))
    w = Window.partitionBy("lang").orderBy(F.col("n").desc(), "gram")
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
    )


def _kcore_oracle(k: int = 3, rounds: int = 4) -> str:
    """Oracle for bounded k-core peeling: each peel round unrolls to a
    (degree CTE, survivor CTE) pair — the same mechanical fixed-depth
    construction as the PageRank/BFS oracles. MATERIALIZED because each
    survivor set is referenced by two endpoint joins."""
    parts = [
        """
    WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    edges AS MATERIALIZED (
        SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        FROM items a JOIN items b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey != b.l_partkey
    ),
    d1 AS (SELECT u, COUNT(*) AS degree FROM edges GROUP BY u),"""
        + f"""
    v1 AS MATERIALIZED (SELECT u AS id FROM d1 WHERE degree >= {k})"""
    ]
    for i in range(2, rounds + 1):
        parts.append(
            f""",
    d{i} AS (
        SELECT e.u, COUNT(*) AS degree
        FROM edges e
        JOIN v{i - 1} a ON e.u = a.id
        JOIN v{i - 1} b ON e.v = b.id
        GROUP BY e.u
    ),
    v{i} AS MATERIALIZED (SELECT u AS id FROM d{i} WHERE degree >= {k})"""
        )
    parts.append(
        f"""
    SELECT u AS id, CAST(degree AS BIGINT) AS degree
    FROM d{rounds} WHERE degree >= {k}"""
    )
    return "".join(parts)


@query("graph_kcore", oracle=_kcore_oracle(90, 4))
def graph_kcore(spark: SparkSession, sf: str) -> DataFrame:
    """Bounded 90-core peeling (4 rounds; at sf0.01 the cascade peels ~3/4 of the graph) of the co-purchase part graph
    — the coreness screen graph cleaning uses (fringes and orphan
    chains peel away, the dense core survives). Each round is two
    survivor semi-joins + one degree aggregation, all vertex-keyed;
    bounded rounds keep the cost model and the unrolled-CTE oracle
    deterministic. See operators/graph.py kcore_peel."""
    from graphdbetl_spark.operators.graph import kcore_peel

    items = T(spark, sf, "lineitem").select("l_orderkey", "l_partkey").distinct()
    a, b = items.alias("a"), items.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") != F.col("b.l_partkey")),
        )
        .select(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
        .distinct()
    )
    return kcore_peel(edges, "u", "v", k=90, rounds=4)


def _sssp_oracle(rounds: int = 4) -> str:
    """Oracle for bounded min-plus shortest paths: one relax CTE per
    round (UNION ALL of carried distances and edge relaxations, folded
    with MIN) — fixed-depth chain, integer arithmetic throughout."""
    parts = [
        """
    WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    pairs AS (
        SELECT a.l_partkey AS u, b.l_partkey AS v
        FROM items a JOIN items b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey != b.l_partkey
    ),
    edges AS MATERIALIZED (
        SELECT u, v, COUNT(*) AS w FROM pairs GROUP BY u, v
    ),
    d0 AS MATERIALIZED (
        SELECT DISTINCT u AS id, 0 AS dist FROM edges WHERE u % 97 = 0
    )"""
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f""",
    d{i} AS MATERIALIZED (
        SELECT id, MIN(dist) AS dist FROM (
            SELECT id, dist FROM d{i - 1}
            UNION ALL
            SELECT e.v AS id, d.dist + e.w AS dist
            FROM edges e JOIN d{i - 1} d ON e.u = d.id
        ) GROUP BY id
    )"""
        )
    parts.append(
        f"""
    SELECT id, CAST(dist AS BIGINT) AS dist FROM d{rounds}"""
    )
    return "".join(parts)


@query("graph_sssp_bounded", oracle=_sssp_oracle(4))
def graph_sssp_bounded(spark: SparkSession, sf: str) -> DataFrame:
    """Bounded weighted shortest paths (4 min-plus relaxation rounds)
    from the deterministic seed set over the co-purchase graph, edge
    weight = number of shared orders (integer, so the min-plus algebra
    replays exactly). The weighted companion to graph_bfs_depth; per
    round two vertex-keyed shuffles with map-side combine. See
    operators/graph.py sssp_bounded."""
    from graphdbetl_spark.operators.graph import sssp_bounded

    items = T(spark, sf, "lineitem").select("l_orderkey", "l_partkey").distinct()
    a, b = items.alias("a"), items.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") != F.col("b.l_partkey")),
        )
        .select(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("w"))
    )
    seeds = edges.select("u").filter(F.col("u") % 97 == 0).distinct()
    return sssp_bounded(edges, seeds, "u", "v", "w", rounds=4)


def _pagerank_oracle(iterations: int = 6, damping: float = 0.85) -> str:
    """Oracle for fixed-iteration PageRank: SQL can't aggregate inside
    a recursive CTE, but a FIXED iteration count unrolls into chained
    CTEs — one contribution-agg + one rank-update pair per round,
    generated mechanically here (same construction a SQL transpiler
    would emit). MATERIALIZED on every CTE (the BFS reach-set
    treatment, r4 verdict #4): without the hint DuckDB inlines each
    r{i} into every consumer, re-deriving the whole prefix chain per
    round — the 30x campaign's unrolled replay spilled >77 GB and
    exhausted disk; materialized, each round computes exactly once."""
    parts = [
        """
    WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    edges AS MATERIALIZED (
        SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        FROM items a JOIN items b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey != b.l_partkey
    ),
    deg AS MATERIALIZED (SELECT u, COUNT(*) AS d FROM edges GROUP BY u),
    verts AS MATERIALIZED (SELECT DISTINCT u AS id FROM edges),
    nn AS MATERIALIZED (SELECT COUNT(*) AS n FROM verts),
    r0 AS MATERIALIZED (
        SELECT id, 1.0 / (SELECT n FROM nn) AS rank FROM verts)"""
    ]
    for i in range(1, iterations + 1):
        parts.append(
            f""",
    c{i} AS MATERIALIZED (
        SELECT e.v AS id, SUM(r.rank / deg.d) AS s
        FROM edges e JOIN r{i - 1} r ON e.u = r.id JOIN deg ON deg.u = e.u
        GROUP BY e.v
    ),
    r{i} AS MATERIALIZED (
        SELECT v.id,
               {1.0 - damping} / (SELECT n FROM nn)
                   + {damping} * COALESCE(c{i}.s, 0) AS rank
        FROM verts v LEFT JOIN c{i} ON v.id = c{i}.id
    )"""
        )
    parts.append(f"\n    SELECT id, ROUND(rank, 6) AS rank FROM r{iterations}")
    return "".join(parts)


def _bfs_oracle(max_depth: int = 3) -> str:
    """Oracle for bounded BFS: reach sets unroll into chained CTEs
    (r_i = r_{i-1} ∪ neighbors(r_{i-1})), and min-hop depth falls out
    of LEFT JOINs against the earlier reach sets — same mechanical
    fixed-depth construction as the PageRank oracle."""
    parts = [
        """
    WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    edges AS MATERIALIZED (
        SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        FROM items a JOIN items b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey != b.l_partkey
    ),
    r0 AS MATERIALIZED (SELECT DISTINCT u AS id FROM edges WHERE u % 97 = 0)"""
    ]
    for i in range(1, max_depth + 1):
        parts.append(
            f""",
    r{i} AS MATERIALIZED (
        SELECT id FROM r{i - 1}
        UNION
        SELECT e.v AS id FROM edges e JOIN r{i - 1} r ON e.u = r.id
    )"""
        )
    case = "CASE WHEN r0.id IS NOT NULL THEN 0 " + " ".join(
        f"WHEN r{i}.id IS NOT NULL THEN {i}" for i in range(1, max_depth)
    ) + f" ELSE {max_depth} END"
    joins = f"r{max_depth} " + " ".join(
        f"LEFT JOIN r{i} ON r{max_depth}.id = r{i}.id"
        for i in range(0, max_depth)
    )
    parts.append(
        f"""
    SELECT r{max_depth}.id, CAST({case} AS INT) AS depth FROM {joins}"""
    )
    return "".join(parts)


@query("graph_bfs_depth", oracle=_bfs_oracle(3))
def graph_bfs_depth(spark: SparkSession, sf: str) -> DataFrame:
    """Bounded BFS min-hop distance (3 rounds) from a deterministic
    seed set (partkeys ≡ 0 mod 97) over the symmetrized co-purchase
    part graph — the neighborhood/reachability query of the graph
    family (CC, triangles, PageRank being the others). Per round the
    shuffle volume is the frontier, not the graph; the oracle unrolls
    the fixed depth into chained reach-set CTEs. See
    operators/graph.py bfs_depths."""
    from graphdbetl_spark.operators.graph import bfs_depths

    items = T(spark, sf, "lineitem").select("l_orderkey", "l_partkey").distinct()
    a, b = items.alias("a"), items.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") != F.col("b.l_partkey")),
        )
        .select(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
        .distinct()
    )
    seeds = edges.select("u").filter(F.col("u") % 97 == 0).distinct()
    return bfs_depths(edges, seeds, "u", "v", max_depth=3).select(
        "id", F.col("depth").cast("int").alias("depth")
    )


@query("graph_pagerank", oracle=_pagerank_oracle(6, 0.85))
def graph_pagerank(spark: SparkSession, sf: str) -> DataFrame:
    """PageRank (6 power iterations, d=0.85) on the symmetrized
    co-purchase part graph — node importance for curriculum/sampling
    weights. Per round: one src-keyed join + one dst-keyed partial agg;
    lineage cut per round (see operators.graph.pagerank). The oracle
    unrolls the fixed iteration count into chained CTEs (recursive
    aggregation isn't SQL-expressible, a fixed-depth chain is); exact
    per-iteration values are additionally pinned by unit test against
    an independent dense power iteration. The symmetric graph has no
    dangling vertices, so simplified PageRank semantics coincide with
    the textbook definition."""
    from graphdbetl_spark.operators.graph import pagerank

    items = T(spark, sf, "lineitem").select("l_orderkey", "l_partkey").distinct()
    a, b = items.alias("a"), items.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") != F.col("b.l_partkey")),
        )
        .select(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
        .distinct()
    )
    return pagerank(edges, "u", "v", iterations=6).select(
        "id", F.round("rank", 6).alias("rank")
    )


# Exact scaled-integer accumulation (the _Q1_SQL idiom): this
# whole-fact money sum diverged from the oracle at the 30x replica as
# a float sum; a BIGINT cents sum is exact at long-sum cost.
_Q17_SQL = """
SELECT CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)) AS DOUBLE)
           / 100.0 AS total_price,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM lineitem l
WHERE l.l_quantity < (
    SELECT 0.5 * AVG(l2.l_quantity)
    FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
"""


@query("sql_frontend_q17", oracle=_Q17_SQL)
def sql_frontend_q17(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q17 shape (small-quantity orders): correlated scalar
    subquery — Catalyst de-correlates it into one per-part aggregate
    joined back, so lineitem is scanned twice but shuffled on
    l_partkey only once each side. Quantities are integer-valued
    doubles, so the AVG threshold is order-independent and exact on
    both engines; money sums round at 4."""
    T(spark, sf, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(_Q17_SQL)


_Q4_SQL = """
SELECT o.o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders o
WHERE EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
GROUP BY o.o_orderpriority
"""


@query("sql_frontend_q4", oracle=_Q4_SQL)
def sql_frontend_q4(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q4 shape (order priority checking): correlated EXISTS —
    Catalyst rewrites it to a left-semi join on l_orderkey with the
    date comparison as the join's residual condition, so lineitem is
    never widened into the aggregate; the orders side then does a
    5-group partial+final count."""
    for t in ("orders", "lineitem"):
        T(spark, sf, t).createOrReplaceTempView(t)
    return spark.sql(_Q4_SQL)


# Exact scaled-integer accumulation (the _Q1_SQL idiom): these
# month-window revenue sums diverged at the 100x replica as float
# sums; BIGINT sums of ROUND(product*1e4) are exact at long-sum cost.
_Q14_SQL = """
SELECT CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                     THEN CAST(ROUND(l.l_extendedprice * (1 - l.l_discount)
                                     * 10000) AS BIGINT)
                     ELSE 0 END) AS DOUBLE) / 10000.0 AS promo_revenue,
       CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 10000)
                     AS BIGINT)) AS DOUBLE) / 10000.0 AS total_revenue,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= DATE '1996-01-01' AND l.l_shipdate < DATE '1996-04-01'
"""


@query("sql_frontend_q14", oracle=_Q14_SQL)
def sql_frontend_q14(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q14 shape (promotion effect): conditional aggregation over
    a fact⋈dimension join — part broadcasts, the date filter pushes to
    the lineitem scan, and both sums fold into one partial+final agg
    pass. Emits the two revenue sums (rounded at their exact decimal
    width) rather than their quotient, per the ROADMAP half-boundary
    invariant."""
    for t in ("lineitem", "part"):
        T(spark, sf, t).createOrReplaceTempView(t)
    return spark.sql(_Q14_SQL)


_RECURSIVE_SQL = """
WITH RECURSIVE anc(node, anc_key, depth) AS (
    SELECT CAST(n_nationkey AS BIGINT), CAST(n_nationkey AS BIGINT),
           CAST(0 AS BIGINT)
    FROM nation
    UNION ALL
    SELECT node, CAST(FLOOR(anc_key / 2) AS BIGINT), depth + CAST(1 AS BIGINT)
    FROM anc WHERE anc_key > 0
)
SELECT node, anc_key, depth FROM anc
"""


@query("sql_frontend_recursive", oracle=_RECURSIVE_SQL)
def sql_frontend_recursive(spark: SparkSession, sf: str) -> DataFrame:
    """Recursive CTE through the SQL frontend (Spark 4 WITH RECURSIVE;
    identical text on both engines): the ancestor chain of a synthetic
    binary hierarchy over nation keys (parent = floor(key/2)) — the
    iterate-until-exhausted surface hierarchies/BOM queries need.
    FLOOR(x/2) rather than integer division because `/` is
    float-division in both engines while their int-cast rounding
    differs. Acyclic by construction, so UNION ALL recursion
    terminates without dedup state."""
    T(spark, sf, "nation").createOrReplaceTempView("nation")
    df = spark.sql(_RECURSIVE_SQL)
    return df.select(
        "node", "anc_key", F.col("depth").cast("int").alias("depth")
    )


_Q2_SQL = """
SELECT DISTINCT p.p_partkey, s.s_suppkey, l.l_extendedprice AS min_price
FROM part p
JOIN lineitem l ON l.l_partkey = p.p_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
WHERE l.l_extendedprice = (
    SELECT MIN(l2.l_extendedprice) FROM lineitem l2
    WHERE l2.l_partkey = p.p_partkey)
ORDER BY p.p_partkey, s.s_suppkey
"""


@query("sql_frontend_q2_style", oracle=_Q2_SQL)
def sql_frontend_q2_style(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q2 shape (minimum-cost supplier): correlated MIN subquery
    against a three-table join — Catalyst de-correlates to one per-part
    MIN aggregate joined back, so lineitem shuffles on l_partkey twice
    (agg + probe) and supplier broadcasts. DISTINCT output: ties at the
    minimum are kept on both engines, so the row set is deterministic
    without a LIMIT boundary."""
    for t in ("part", "lineitem", "supplier"):
        T(spark, sf, t).createOrReplaceTempView(t)
    return spark.sql(_Q2_SQL)
