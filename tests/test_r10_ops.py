"""Round-10 operator tests: ccnet approx-cutpoint buckets (r9 verdict
#4), screened-containment sub-document recall (r9 verdict #1), and the
production n_cells scaling for IVF semantic decontamination (#5)."""

from __future__ import annotations

import pytest


# ---------- CCNet approx-cutpoint buckets ----------


def _ccnet_fixture(spark, n=240):
    rows = []
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta"]
    for i in range(n):
        lang = ["en", "fr", "de"][i % 3]
        txt = " ".join(words[(i + j) % 7] for j in range(3 + i % 11))
        rows.append((i, lang, txt))
    return spark.createDataFrame(
        rows, "doc_id long, lang string, text string"
    )


def test_ccnet_approx_agrees_with_exact_terciles(spark):
    """The approx-cutpoint form must agree with the exact ntile form on
    ≥95% of documents, and every disagreement must be off by exactly
    one bucket (a doc near/at a tercile boundary), never head↔tail."""
    from graphdbetl_spark.operators.curation import (
        ccnet_perplexity_buckets,
        ccnet_perplexity_buckets_approx,
    )

    df = _ccnet_fixture(spark)
    exact = {
        r["doc_id"]: r["bucket"]
        for r in ccnet_perplexity_buckets(df, "text", "doc_id", "lang").collect()
    }
    approx = {
        r["doc_id"]: r["bucket"]
        for r in ccnet_perplexity_buckets_approx(
            df, "text", "doc_id", "lang"
        ).collect()
    }
    assert set(exact) == set(approx)  # same omit-short-docs semantics
    order = {"head": 0, "middle": 1, "tail": 2}
    diffs = [d for d in exact if exact[d] != approx[d]]
    assert len(diffs) <= max(1, len(exact) // 20), (
        f"{len(diffs)}/{len(exact)} disagreements"
    )
    for d in diffs:
        assert abs(order[exact[d]] - order[approx[d]]) == 1, (
            d, exact[d], approx[d],
        )


def test_ccnet_approx_plan_has_no_per_language_score_sort(spark):
    """The approx form's reason to exist: NO per-language sort of the
    scores (the exact form's ntile window is one sort task per
    language — single-task on a skewed language mix at 100 TB). The
    LM-scoring subtree keeps its own small sorts (bigram-context
    window, doc-id merge join); what must be gone is any ntile window
    and any Sort over the score column."""
    from graphdbetl_spark.operators.curation import (
        ccnet_perplexity_buckets,
        ccnet_perplexity_buckets_approx,
    )

    df = _ccnet_fixture(spark, n=60)
    exact_plan = ccnet_perplexity_buckets(
        df, "text", "doc_id", "lang"
    )._jdf.queryExecution().executedPlan().toString()
    assert "ntile(" in exact_plan  # the shape being removed
    plan = ccnet_perplexity_buckets_approx(
        df, "text", "doc_id", "lang"
    )._jdf.queryExecution().executedPlan().toString()
    assert "ntile(" not in plan  # ("ntile" alone matches perceNTILE_approx)
    for line in plan.splitlines():
        if "Sort " in line:
            assert "mean_logprob" not in line, line
