"""Deterministic sampling and sequence packing for training-data
pipelines.

All sampling here is HASH-based, not RNG-based: membership is a pure
function of the row's id (md5 bucket), so splits are reproducible
across runs, engines, partitionings, and cluster sizes — the property
train/test splits must have. (``df.sample``/``sampleBy`` are
partitioning-dependent and can't be replayed by another engine.)
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def hash_bucket(id_col: Column, buckets: int = 100) -> Column:
    """Stable bucket in [0, buckets): first 8 hex chars of md5(id)."""
    h = F.conv(F.substring(F.md5(id_col.cast("string")), 1, 8), 16, 10).cast("long")
    return (h % buckets).cast("int")


def train_test_split(
    df: DataFrame, id_col: str, test_pct: int = 10, buckets: int = 100
) -> DataFrame:
    """Tag each row train/test by hash bucket (test = lowest
    ``test_pct`` buckets)."""
    b = hash_bucket(F.col(id_col), buckets)
    return df.withColumn(
        "split", F.when(b < test_pct, F.lit("test")).otherwise(F.lit("train"))
    )


def stratified_hash_sample(
    df: DataFrame, id_col: str, strata_col: str, rates: dict[str, int], buckets: int = 100
) -> DataFrame:
    """Per-stratum deterministic downsampling: keep a row iff its hash
    bucket < the stratum's rate (percent). Mixture re-weighting for
    training corpora, reproducible at any scale."""
    b = hash_bucket(F.col(id_col), buckets)
    rate = F.coalesce(
        *[F.when(F.col(strata_col) == k, F.lit(v)) for k, v in rates.items()],
        F.lit(0),
    )
    return df.filter(b < rate)


def shard_manifest(
    df: DataFrame,
    id_col: str,
    n_shards: int = 32,
    token_text_col: str | None = None,
    char_count_col: str | None = None,
) -> DataFrame:
    """Deterministic output-sharding manifest for a training corpus:
    assign every row a stable shard by the portable md5 hash bucket of
    its id, and roll up the per-shard statistics a dataloader needs to
    plan epochs (row count, token and char budgets, id range).

    This is the bookkeeping step between curation and the trainer: the
    writer partitions by ``shard`` (partitionBy on write → one
    directory per shard, no sort), and the manifest is the shard-level
    contract checked at load time. Hash sharding gives ±O(√n) balance
    with zero coordination — one partial-agg shuffle on the shard key,
    collapsing map-side to ``n_shards`` rows per partition.

    Returns one row per shard:
    (shard, n_rows, n_tokens, n_chars, min_id, max_id).
    """
    from graphdbetl_spark.functions.text import token_count

    n_tokens = (
        token_count(F.col(token_text_col)) if token_text_col else F.lit(0)
    )
    n_chars = F.col(char_count_col) if char_count_col else F.lit(0)
    return (
        df.select(
            (hash_bucket(F.col(id_col), 10_000) % n_shards).alias("shard"),
            F.col(id_col).alias("__id"),
            n_tokens.cast("long").alias("__tok"),
            n_chars.cast("long").alias("__ch"),
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("__tok").alias("n_tokens"),
            F.sum("__ch").alias("n_chars"),
            F.min("__id").alias("min_id"),
            F.max("__id").alias("max_id"),
        )
    )


def sharded_running_sum_before(
    df: DataFrame,
    order_cols: list[str],
    size_col: Column,
    n_shards: int = 256,
) -> tuple[DataFrame, Column]:
    """EXACT global running sum (strictly-preceding rows in
    ``order_cols`` order) as a distributed prefix-sum — no
    single-partition window over the data.

    Shards are contiguous ranges of the leading order column, cut at
    sampled quantile boundaries (``approxQuantile``, one scan; the
    boundaries embed as literals so shard assignment is a shuffle-free
    projection). Because any contiguous split preserves the global
    order, running-sum-within-shard + the cumulative total of all
    preceding shards equals the global running sum exactly, wherever
    the sampled boundaries happen to land. The only unpartitioned
    window runs over the per-shard totals — one row per shard, bounded
    by ``n_shards``, not by the data.

    Returns ``(df_with_shard, cum_before_column)``; callers select
    from the returned frame. Falls back to a single explicit shard
    when the leading column isn't numeric (quantiles undefined) —
    small-input gate, same semantics.
    """
    lead = order_cols[0]
    try:
        probs = [i / n_shards for i in range(1, n_shards)]
        bounds = sorted(set(df.approxQuantile(lead, probs, 0.01))) if probs else []
    except Exception:
        bounds = []
    if bounds:
        arr = F.array(*[F.lit(float(b)) for b in bounds])
        shard = F.aggregate(
            arr,
            F.lit(0).cast("long"),
            lambda acc, b: acc
            + F.when(F.col(lead) >= b, F.lit(1)).otherwise(F.lit(0)).cast("long"),
        )
    else:
        shard = F.lit(0).cast("long")
    p = df.withColumn("__shard", shard)
    wp = (
        Window.partitionBy("__shard")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    within_before = F.coalesce(F.sum(size_col).over(wp), F.lit(0))
    totals = p.groupBy("__shard").agg(F.sum(size_col).cast("long").alias("__tot"))
    # cumulative shard offsets via a triangular self-join over the
    # per-shard totals (≤ n_shards rows) — no window at all, so
    # nothing here is single-partition over data-sized input
    preceding = totals.select(
        F.col("__shard").alias("__s2"), F.col("__tot").alias("__t2")
    )
    offsets = (
        totals.join(preceding, F.col("__s2") < F.col("__shard"), "left")
        .groupBy("__shard")
        .agg(F.coalesce(F.sum("__t2"), F.lit(0)).alias("__off"))
    )
    return p.join(F.broadcast(offsets), "__shard"), F.col("__off") + within_before


def pack_sequences(
    df: DataFrame, id_col: str, size_col: Column, budget: int
) -> DataFrame:
    """Greedy sequential packing: order docs by id, accumulate sizes,
    pack_id = floor(cumulative_size_before / budget).

    The streaming-pack approximation used for LLM sequence packing at
    corpus scale (exact bin packing is NP-hard and order-dependent).
    The running sum is the distributed quantile-sharded prefix-sum
    (``sharded_running_sum_before``) — bit-identical to a global
    window, but the data-sized windows are all partition-local.
    """
    p, cum_before = sharded_running_sum_before(df, [id_col], size_col)
    return p.select(
        F.col(id_col),
        size_col.cast("long").alias("n_tokens"),
        F.floor(cum_before / budget).cast("long").alias("pack_id"),
    )


def balance_uniform(df: DataFrame, id_col: str, strata_col: str) -> DataFrame:
    """Exact uniform mixture balancing: downsample every stratum to the
    size of the smallest one, keeping the deterministically-first rows
    by md5(id) rank (so the kept subset is stable across runs/engines).

    Shape: one count aggregation (tiny — one row per stratum, broadcast
    back) plus one window shuffle partitioned by stratum. Exact-count
    balancing is right when strata are few and bounded (languages,
    sources). At 100 TB with a skew-heavy stratum, prefer the
    shuffle-free hash-threshold form (``stratified_hash_sample`` with
    rate = min_count/n per stratum): approximate counts, zero windows.
    """
    mn = F.broadcast(
        df.groupBy(strata_col).count().agg(F.min("count").alias("__mn"))
    )
    w = Window.partitionBy(strata_col).orderBy(
        F.md5(F.col(id_col).cast("string")), id_col
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .crossJoin(mn)
        .filter(F.col("__rn") <= F.col("__mn"))
        .select(id_col, strata_col)
    )


def mixture_upsample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    factors_pct: dict[str, int],
    default_pct: int = 100,
) -> DataFrame:
    """Epoch upsampling with FRACTIONAL repeat factors — the mixture
    re-weighting a training run applies to its high-quality sources
    (e.g. 2.5 epochs of wiki against 1 of web): factors are integer
    PERCENTS (250 = 2.5×), each row repeats ``pct // 100`` times plus
    one more iff its md5 bucket falls under ``pct % 100`` — the same
    deterministic hash-membership used by every split/sample here, so
    the realized mixture is exact in expectation, reproducible across
    engines/runs/partitionings, and integer-only (no float fuzz in
    membership).

    Zero shuffles: the repeat count is a projection and the fan-out is
    an in-stage explode of ``sequence(0, n-1)`` — rows multiply inside
    whatever scan is already running, exactly like chunking. Output
    gains an ``epoch`` column (0-based copy index) so downstream
    packing can interleave epochs rather than emit them back to back.
    """
    pct: Column = F.lit(default_pct)
    for k, v in sorted(factors_pct.items()):
        pct = F.when(F.col(strata_col) == k, F.lit(v)).otherwise(pct)
    whole = (pct / 100).cast("int")
    extra = (hash_bucket(F.col(id_col)) < pct % 100).cast("int")
    n = (whole + extra).alias("__n")
    return (
        df.withColumn("__n", n)
        .filter(F.col("__n") > 0)
        .withColumn("epoch", F.explode(F.sequence(F.lit(0), F.col("__n") - 1)))
        .drop("__n")
    )


def temperature_sample(
    df: DataFrame, id_col: str, strata_col: str, alpha: float = 0.5
) -> DataFrame:
    """Temperature-flattened mixture sampling (the XLM-R / mT5 α-sampling
    rule): resample so stratum l's share moves from p_l = n_l/N toward
    q_l = p_l^α / Σ_m p_m^α — α < 1 flattens the language/source
    distribution so low-resource strata aren't drowned by the head. With
    α = 0.5 the weight is sqrt(p) (IEEE-exact on both engines, unlike
    pow). The per-stratum keep rate for a same-size output budget is
    rate_l = min(1, q_l · N / n_l); rates > 1 (upweighted rare strata)
    are capped — duplication is ``mixture_upsample``'s job.

    Membership is hash-deterministic: keep a row iff its md5
    micro-bucket (0..1e6) falls under round(rate_l · 1e6). Rounding the
    rate to an INTEGER micro-rate before comparing removes float-ulp
    ambiguity from the cross-engine replay.

    Shape: one tiny count aggregation (one row per stratum) re-joined
    by broadcast; the corpus side is a single scan + filter — no
    window, no corpus shuffle, the posture that holds when the corpus
    is 100 TB and the strata table is bytes.
    """
    counts = df.groupBy(strata_col).agg(
        F.count(F.lit(1)).cast("double").alias("__n")
    )
    # The N / Σw normalizers need every stratum at once. Strata are
    # bounded (languages/sources), so collapse the per-stratum table to
    # ONE row holding a SORTED struct array and compute both sums as
    # left folds — the sort pins the float summation order, making Σw
    # bit-identical to an ORDER BY-ed sequential sum in any engine (and
    # across Spark's own partitionings). No window, no self-join.
    if alpha == 0.5:  # sqrt is correctly rounded per IEEE-754; pow is not
        weight = lambda p: F.sqrt(p)  # noqa: E731
    else:
        weight = lambda p: F.pow(p, F.lit(alpha))  # noqa: E731
    one = counts.agg(
        F.array_sort(
            F.collect_list(F.struct(F.col(strata_col).alias("s"), F.col("__n").alias("n")))
        ).alias("cs")
    )
    one = one.withColumn(
        "__N", F.aggregate("cs", F.lit(0.0), lambda a, x: a + x.n)
    ).withColumn(
        "__sw",
        F.aggregate("cs", F.lit(0.0), lambda a, x: a + weight(x.n / F.col("__N"))),
    )
    rates = one.select(
        F.explode("cs").alias("x"), F.col("__N"), F.col("__sw")
    ).select(
        F.col("x.s").alias(strata_col),
        F.least(
            F.lit(1000000).cast("long"),
            F.round(
                weight(F.col("x.n") / F.col("__N"))
                / F.col("__sw")
                * F.col("__N")
                / F.col("x.n")
                * 1e6
            ).cast("long"),
        ).alias("rate_micro"),
    )
    bucket = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("ts:"), F.col(id_col).cast("string"))), 1, 8),
            16,
            10,
        ).cast("long")
        % 1000000
    )
    return (
        df.join(F.broadcast(rates), strata_col)
        .filter(bucket < F.col("rate_micro"))
        .select(id_col, strata_col, "rate_micro")
    )


def mixture_epoch_plan(
    df: DataFrame,
    text_col: str,
    strata_col: str,
    alpha: float = 0.5,
    budget_factor: float = 2.0,
) -> DataFrame:
    """Token-budget mixture PLANNER — the table a training run is
    configured from (the LLaMA-style "epochs over each source" sheet):
    given per-source token masses n_s, temperature-flattened target
    shares q_s = (n_s/N)^α / Σ(n_m/N)^α and a total token budget
    B = budget_factor·N, emit each source's planned token draw B·q_s
    and its repeat factor (epochs) B·q_s / n_s — >1 means the source
    is seen multiple times per pass, the DoReMi/LLaMA upweighting of
    small high-quality sources. Execution of the plan is
    ``mixture_upsample`` (integer-percent repeats); this operator is
    the deterministic math that produces those percents.

    Scale shape: one partial-agg shuffle to (source → docs, tokens) —
    one row per source — then the normalizers fold over ONE sorted
    struct array (the ``temperature_sample`` idiom: sorting pins float
    summation order, so Σw is bit-identical across engines and
    partitionings). No window, no second corpus pass. α = 0.5 uses
    sqrt (IEEE-exact on every engine, unlike pow)."""
    from graphdbetl_spark.operators.dedup import _tokens

    if alpha == 0.5:
        weight = lambda p: F.sqrt(p)  # noqa: E731
    else:
        weight = lambda p: F.pow(p, F.lit(alpha))  # noqa: E731
    counts = df.groupBy(strata_col).agg(
        F.count(F.lit(1)).cast("long").alias("__d"),
        F.sum(F.size(_tokens(F.col(text_col)))).cast("long").alias("__n"),
    )
    one = counts.agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col(strata_col).alias("s"),
                    F.col("__d").alias("d"),
                    F.col("__n").alias("n"),
                )
            )
        ).alias("cs")
    )
    one = one.withColumn(
        "__N", F.aggregate("cs", F.lit(0.0), lambda a, x: a + x.n)
    ).withColumn(
        "__sw",
        F.aggregate("cs", F.lit(0.0), lambda a, x: a + weight(x.n / F.col("__N"))),
    )
    q = weight(F.col("x.n") / F.col("__N")) / F.col("__sw")
    budget = F.col("__N") * F.lit(budget_factor)
    return one.select(F.explode("cs").alias("x"), "__N", "__sw").select(
        F.col("x.s").alias(strata_col),
        F.col("x.d").alias("n_docs"),
        F.col("x.n").alias("n_tokens"),
        F.round(q, 6).alias("share"),
        F.round(budget * q, 2).alias("planned_tokens"),
        F.round(budget * q / F.col("x.n"), 4).alias("epochs"),
    )


def weighted_priority_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int = 100,
    max_log2: int = 16,
) -> DataFrame:
    """Weighted random sampling without replacement (Efraimidis &
    Spirakis 2006, A-Res): each row draws a priority key u^(1/w) from
    a uniform u and its weight w, and the sample is the k LARGEST
    keys — inclusion probability rises with weight, and the selection
    is a single global top-k, never a full sort. This is the one-pass
    way to draw a probability-proportional-to-size corpus subset
    (e.g. favor long documents for a context-length-heavy mixture) at
    100 TB: the key is a scan-stage codegen projection and the top-k
    is TakeOrderedAndProject (per-partition heaps, k rows per task to
    the driver-side merge).

    Two determinism choices make the draw exactly replayable in any
    md5-capable engine (the sample_temperature treatment, extended to
    priorities):

    - u is hash-derived, not RNG: the first 13 md5 hex chars of the id
      (52 bits, exactly double-representable) map to (0,1) as
      (h + 0.5) / 2^52 — both the add and the power-of-two divide are
      IEEE-exact.
    - w is quantized to the power of two 2^j, j = Σ_t [w ≥ 2^t]
      (integer comparisons, the same unrolled-codegen shape as the
      Z-order bucket), so the key u^(1/2^j) is j applications of
      sqrt — the ONLY float power IEEE-754 requires to be correctly
      rounded, hence bit-identical across engines. pow(u, 1.0/w) would
      differ in the last ulp between libms and flip the top-k cut.
      The quantization coarsens weights within a 2x band to the same
      tier — acceptable for corpus selection, where weights span
      orders of magnitude and the 2x band is inside the noise of any
      length-based weighting.

    The j sqrt applications chain through SEPARATE projections
    (withColumn per step): each step references its predecessor twice
    (branch + fall-through), so folding them into one expression would
    double the tree per step (2^max_log2 nodes); CollapseProject keeps
    non-trivially-referenced projections apart, bounding the plan at
    max_log2 sqrt nodes.

    Returns the k sampled rows as (id, weight tier 2^j, priority key),
    ordered by (key desc, id) with the id tiebreak making the cut
    deterministic even on (impossible, but cheap to pin) key ties.
    """
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("ws:"), F.col(id_col).cast("string"))), 1, 13
        ),
        16,
        10,
    ).cast("double")
    u = (h + F.lit(0.5)) / F.lit(float(1 << 52))
    w = F.greatest(F.col(weight_col).cast("long"), F.lit(1))
    j: Column = F.lit(0)
    for t in range(1, max_log2 + 1):
        j = j + F.when(w >= F.lit(1 << t), 1).otherwise(0)
    out = df.select(
        F.col(id_col),
        j.cast("int").alias("__j"),
        u.alias("__x"),
    )
    for step in range(1, max_log2 + 1):
        out = out.withColumn(
            "__x",
            F.when(F.col("__j") >= step, F.sqrt(F.col("__x"))).otherwise(
                F.col("__x")
            ),
        )
    return (
        out.select(
            id_col,
            F.expr("shiftleft(cast(1 as bigint), __j)").alias("w2"),
            F.col("__x").alias("priority"),
        )
        .orderBy(F.desc("priority"), F.col(id_col))
        .limit(k)
    )
