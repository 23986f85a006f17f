"""The quadratic oracle baselines must be physically unreachable at
corpus scale (r4 verdict #3): the guard raises before the all-pairs
join is constructed, and the guarded queries still run under the cap.
"""

import pytest

from graphdbetl_spark.operators.guards import (
    QUADRATIC_INPUT_CAP,
    QuadraticInputError,
    require_bounded_input,
)
from tests.conftest import SF_DIR


def test_under_cap_passes_through(spark):
    df = spark.range(100).toDF("vec_id")
    assert require_bounded_input(df, "op", "alt") is df


def test_over_cap_raises(spark):
    df = spark.range(QUADRATIC_INPUT_CAP + 1).toDF("vec_id")
    with pytest.raises(QuadraticInputError, match="use blocked_alt instead"):
        require_bounded_input(df, "op", "blocked_alt")


def test_guarded_queries_still_run_at_fixture_scale(spark):
    from graphdbetl_spark.plans.llm_q import dedup_embedding_cosine_exact
    from graphdbetl_spark.plans.pipeline_q import dedup_embedding_keep

    assert dedup_embedding_cosine_exact(spark, SF_DIR).count() > 0
    keep = dedup_embedding_keep(spark, SF_DIR)
    assert keep.count() == 500  # one verdict per embedding row


def test_guarded_query_refuses_oversized_corpus(spark, tmp_path):
    """An oversized embeddings table must fail fast, not run all-pairs."""
    import pyspark.sql.functions as F

    big = (
        spark.range(QUADRATIC_INPUT_CAP + 10)
        .select(
            F.col("id").alias("vec_id"),
            (F.col("id") % 10).cast("string").alias("label"),
            F.array(F.lit(1.0), F.lit(2.0)).alias("embedding"),
        )
    )
    path = str(tmp_path / "embeddings.parquet")
    big.write.parquet(path)
    from graphdbetl_spark.plans.pipeline_q import dedup_embedding_keep

    with pytest.raises(QuadraticInputError):
        dedup_embedding_keep(spark, str(tmp_path))


def test_conf_override_enforces_sequential_invariant(spark):
    """conf_override scopes a session-conf mutation and REJECTS a
    concurrent second override (the engine's sequential-execution-per-
    session invariant, r9 ADVICE) instead of silently running another
    query under the wrong conf."""
    import threading

    from graphdbetl_spark.session import conf_override

    key = "spark.sql.adaptive.enabled"
    before = spark.conf.get(key)
    with conf_override(spark, key, "false"):
        assert spark.conf.get(key) == "false"
        errs = []

        def inner():
            try:
                with conf_override(spark, key, "true"):
                    pass
            except RuntimeError as e:
                errs.append(str(e))

        t = threading.Thread(target=inner)
        t.start()
        t.join()
        assert errs and "sequential" in errs[0]
    assert spark.conf.get(key) == before


def test_protobuf_facade_exposes_version():
    """Feature-detection via google.protobuf.__version__ (a common
    probe) must not crash when the sandbox bridge is the runtime."""
    from graphdbetl_spark.streaming.protobuf_bridge import (
        install_protobuf_bridge,
    )

    if not install_protobuf_bridge():
        import pytest as _pytest

        _pytest.skip("no protobuf runtime in this environment")
    import google.protobuf as gp

    assert isinstance(getattr(gp, "__version__", None), str)
