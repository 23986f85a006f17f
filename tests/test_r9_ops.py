"""Round-9 hardening: tiered-precision exact kernels (certified fp32
screen + fp64 fold), the IVF-restricted decontamination sibling's
lower-bound property, CCNet tercile ordering, the two_hop no-Expand
plan guard, and the protobuf bridge."""

import numpy as np
import pytest

import pyspark.sql.functions as F


# ---------- tiered-precision screen (operators/similarity.py) ----------


def _naive_pairs(v, cn, qm, qn, threshold):
    """The pre-r9 full-matrix dim-major fold, kept as the test oracle."""
    dots = np.zeros((v.shape[0], qm.shape[0]))
    for i in range(v.shape[1]):
        dots = dots + v[:, i : i + 1] * qm[None, :, i]
    s = dots / (cn[:, None] * qn[None, :])
    ci, qi = np.nonzero(s >= threshold)
    return ci, qi, s[ci, qi]


def _seq_norm(m):
    acc = np.zeros(m.shape[0])
    for i in range(m.shape[1]):
        acc = acc + m[:, i] * m[:, i]
    return np.sqrt(acc)


def test_screened_pair_fold_bit_identical_to_full_fold():
    """The fp32 screen must be invisible: same pair set, bitwise-same
    scores as the full fp64 fold it replaced — including pairs sitting
    exactly at the threshold."""
    from graphdbetl_spark.operators.similarity import _screened_pair_fold

    rng = np.random.default_rng(7)
    v = rng.normal(size=(300, 16))
    q = rng.normal(size=(40, 16))
    # plant exact duplicates and near-threshold pairs
    v[5] = q[3] * 2.0
    v[6] = q[3] * 2.0 + rng.normal(size=16) * 1e-3
    cn, qn = _seq_norm(v), _seq_norm(q)
    for tau in (0.25, 0.5, 0.9):
        eci, eqi, es = _naive_pairs(v, cn, q, qn, tau)
        aci, aqi, s = _screened_pair_fold(v, cn, q, qn, tau)
        assert sorted(zip(aci, aqi)) == sorted(zip(eci, eqi)), f"tau={tau}"
        exp = {(c, k): x for c, k, x in zip(eci, eqi, es)}
        assert all(exp[(c, k)] == x for c, k, x in zip(aci, aqi, s)), f"tau={tau}"


def test_screened_pair_fold_empty():
    from graphdbetl_spark.operators.similarity import _screened_pair_fold

    rng = np.random.default_rng(8)
    v = rng.normal(size=(20, 8))
    q = -v[:3] * 0.5  # all cosines ≈ -1 against their mirrors
    cn, qn = _seq_norm(v), _seq_norm(q)
    ci, qi, s = _screened_pair_fold(v, cn, q, qn, 0.999999)
    assert len(ci) == 0 and len(s) == 0


# ---------- IVF decontamination: lower-bound property ----------


def test_decontaminate_ivf_is_lower_bound_of_exact(spark):
    """The IVF form reports max-over-probed-cells, which can only be ≤
    the exact max; a vector it flags contaminated must be flagged by
    the exact form too (no false positives relative to exact)."""
    from graphdbetl_spark.operators.curation import (
        semantic_decontaminate,
        semantic_decontaminate_ivf,
    )

    rng = np.random.default_rng(11)
    rows = [(i, [float(x) for x in rng.normal(size=16)]) for i in range(120)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    train = emb.filter(F.col("vec_id") % 10 >= 2)
    ev = emb.filter(F.col("vec_id") % 10 < 2)
    exact = {
        r["vec_id"]: (r["max_eval_cosine"], r["contaminated"])
        for r in semantic_decontaminate(train, ev, threshold=0.35).collect()
    }
    ivf = semantic_decontaminate_ivf(
        train, ev, threshold=0.35, n_cells=4, n_probe=2
    ).collect()
    assert 0 < len(ivf) <= len(exact)
    for r in ivf:
        mx_exact, cont_exact = exact[r["vec_id"]]
        assert r["max_eval_cosine"] <= mx_exact + 1e-9
        if r["contaminated"]:
            assert cont_exact


# ---------- CCNet terciles ----------


def test_ccnet_buckets_ordering_and_sizes(spark):
    """Within a language every head score ≥ every middle score ≥ every
    tail score, and tercile sizes obey ntile's remainder rule."""
    from graphdbetl_spark.operators.curation import (
        bigram_logprob,
        ccnet_perplexity_buckets,
    )

    rows = []
    words = ["alpha", "beta", "gamma", "delta", "epsilon"]
    for i in range(40):
        lang = "en" if i % 2 == 0 else "fr"
        txt = " ".join(words[(i + j) % 5] for j in range(3 + i % 7))
        rows.append((i, lang, txt))
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    got = ccnet_perplexity_buckets(df, "text", "doc_id", "lang").collect()
    score = {
        r["doc_id"]: r["mean_logprob"]
        for r in bigram_logprob(df, "text", "doc_id").collect()
    }
    order = {"head": 0, "middle": 1, "tail": 2}
    by_lang: dict[str, list] = {}
    for r in got:
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, rs in by_lang.items():
        n = len(rs)
        sizes = [sum(1 for r in rs if r["bucket"] == b) for b in order]
        base, rem = divmod(n, 3)
        assert sizes == [base + (1 if i < rem else 0) for i in range(3)], lang
        for a in rs:
            for b in rs:
                if order[a["bucket"]] < order[b["bucket"]]:
                    assert score[a["doc_id"]] >= score[b["doc_id"]]


# ---------- two_hop plan guard ----------


def test_two_hop_plan_has_no_expand(spark):
    """The r9 rewrite exists to kill the Expand (row-doubling) the
    dual countDistinct forced — the 1000×-rung spill cliff. Guard the
    plan shape so a refactor can't silently reintroduce it."""
    from graphdbetl_spark.plans.pipeline_q import graph_two_hop

    df = graph_two_hop(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in plan
    assert len(df.collect()) == 5


# ---------- protobuf bridge ----------


def test_protobuf_bridge_idempotent_and_functional():
    """install_protobuf_bridge returns True in this sandbox (cloud-sdk
    runtime present), is idempotent, and the bridged gencode
    round-trips a nested oneof message."""
    from graphdbetl_spark.streaming.protobuf_bridge import install_protobuf_bridge

    assert install_protobuf_bridge()
    assert install_protobuf_bridge()  # second call: cached/no-op
    import pyspark.sql.streaming.proto.StateMessage_pb2 as sm

    msg = sm.StateRequest(
        statefulProcessorCall=sm.StatefulProcessorCall(
            setHandleState=sm.SetHandleState(state=sm.CREATED)
        )
    )
    rt = sm.StateRequest()
    rt.ParseFromString(msg.SerializeToString())
    assert rt.WhichOneof("method") == "statefulProcessorCall"
