"""Corpus-curation operators: decontamination, PII scrub,
deterministic shuffle, repetition stats.

Positive-case tests use constructed fixtures (the synthetic documents
table contains no PII literals); determinism/oracle parity on real
tables is covered by the driver's DuckDB gate on curation_q."""

import pyspark.sql.functions as F

from graphdbetl_spark.operators.curation import (
    decontaminate_against_eval,
    deterministic_shuffle,
    repetition_stats,
    scrub_pii,
)
from tests.conftest import SF_DIR


def test_pii_scrub_redacts_and_counts(spark):
    df = spark.createDataFrame(
        [
            (1, "mail me at jo.doe+x@example.org or call 555-123-4567."),
            (2, "server at 10.0.0.1 is fine"),
            (3, "no pii here"),
            (4, "two mails: a@b.io c@d.co"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in scrub_pii(df, "text", "doc_id").collect()}
    assert out[1]["scrubbed_text"] == "mail me at <EMAIL> or call <PHONE>."
    assert out[1]["n_redactions"] == 2
    assert out[2]["scrubbed_text"] == "server at <IP> is fine"
    assert out[2]["n_redactions"] == 1
    assert out[3] ["n_redactions"] == 0
    assert out[4]["n_redactions"] == 2


def test_decontaminate_flags_ngram_overlap(spark):
    eval_df = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [
            (1, "prefix words then the quick brown fox jumps too"),  # shares a 5-gram
            (2, "completely unrelated text with no overlap at all"),
            (3, "quick brown fox"),  # < 5 tokens shared, no full 5-gram
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["contaminated"]
        for r in decontaminate_against_eval(train, "text", "doc_id", eval_df, n=5).collect()
    }
    assert out == {1: True, 2: False, 3: False}


def test_deterministic_shuffle_is_stable_and_dense(spark):
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id")
    a = deterministic_shuffle(d, "doc_id", seed="42").collect()
    b = {r["doc_id"]: (r["shard"], r["pos"]) for r in deterministic_shuffle(d, "doc_id", seed="42").collect()}
    assert all(b[r["doc_id"]] == (r["shard"], r["pos"]) for r in a)  # replayable
    c = {r["doc_id"]: (r["shard"], r["pos"]) for r in deterministic_shuffle(d, "doc_id", seed="7").collect()}
    assert any(c[k] != v for k, v in b.items())  # seed changes order
    # positions are dense 1..n within each shard
    from collections import defaultdict

    by_shard = defaultdict(list)
    for r in a:
        by_shard[r["shard"]].append(r["pos"])
    for poss in by_shard.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))


def test_repetition_stats_flags_boilerplate(spark):
    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam"),  # 4 bigrams, 1 distinct
            (2, "all words here are unique"),
            (3, "one"),  # no bigrams
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in repetition_stats(df, "text", "doc_id", n=2).collect()}
    assert out[1]["n_grams"] == 4 and out[1]["dup_frac"] == 0.75
    assert out[2]["dup_frac"] == 0.0
    assert out[3]["n_grams"] == 0 and out[3]["dup_frac"] == 0.0


def test_repeated_ngram_scrub_removes_shared_spans(spark):
    from graphdbetl_spark.operators.curation import repeated_ngram_scrub

    shared = "alpha beta gamma delta epsilon"  # one 5-gram, in docs 1 and 2
    df = spark.createDataFrame(
        [
            (1, f"one two {shared} three four"),
            (2, f"{shared} zeta"),
            (3, "totally unrelated words here okay"),
            (4, "tiny doc"),  # < 5 tokens: no grams, untouched
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in repeated_ngram_scrub(df, "text", "doc_id").collect()}

    # the shared span (and only it) is scrubbed from both carriers
    assert out[1]["scrubbed_text"] == "one two three four"
    assert out[1]["n_tokens"] == 9 and out[1]["n_removed"] == 5
    assert out[2]["scrubbed_text"] == "zeta"
    assert out[2]["n_removed"] == 5
    # unique docs and sub-n docs pass through intact
    assert out[3]["scrubbed_text"] == "totally unrelated words here okay"
    assert out[3]["n_removed"] == 0
    assert out[4]["scrubbed_text"] == "tiny doc"
    assert out[4]["n_removed"] == 0


def test_repeated_ngram_scrub_merges_overlapping_spans(spark):
    from graphdbetl_spark.operators.curation import repeated_ngram_scrub

    # doc 1 and doc 2 share a 6-token run -> two overlapping repeated
    # 5-grams in each; covered positions must union, not double-count
    run = "a b c d e f"
    df = spark.createDataFrame(
        [(1, f"x {run} y"), (2, f"{run} tail")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in repeated_ngram_scrub(df, "text", "doc_id").collect()}
    assert out[1]["scrubbed_text"] == "x y"
    assert out[1]["n_removed"] == 6
    assert out[2]["scrubbed_text"] == "tail"
    assert out[2]["n_removed"] == 6
