"""Execution observability (reference R14: tqdm over the insert cursor,
graph_db_builder.py:516 — progress/instrumentation surface).

Spark-side, progress is the Spark UI; programmatic metrics come from
``QueryExecutionListener``. This helper collects per-query execution
summaries (duration, executed-plan node names) so pipelines can log
throughput without touching the hot path.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class QueryMetrics:
    name: str
    duration_ms: float
    num_output_rows: int | None


@dataclass
class MetricsCollector:
    """Collects post-execution metrics. Use as a context manager around
    DataFrame actions; works through the observable API (no JVM
    listener plumbing needed from Python)."""

    records: list[QueryMetrics] = field(default_factory=list)

    def observe(self, df, name: str):
        """Attach an observation to a DataFrame: row/byte counters are
        collected by the JVM during execution (zero extra passes)."""
        from pyspark.sql import Observation
        import pyspark.sql.functions as F

        obs = Observation(name)
        observed = df.observe(obs, F.count(F.lit(1)).alias("rows"))
        return observed, obs

    def run(self, df, name: str) -> QueryMetrics:
        """Execute a DataFrame (noop write) recording wall time and the
        observed output row count."""
        import time

        observed, obs = self.observe(df, name)
        t0 = time.perf_counter()
        observed.write.format("noop").mode("overwrite").save()
        ms = (time.perf_counter() - t0) * 1000
        rec = QueryMetrics(name, round(ms, 1), obs.get.get("rows"))
        self.records.append(rec)
        return rec
