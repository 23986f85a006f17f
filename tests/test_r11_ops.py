"""Round-11 operator tests: containment upstream clone collapse (r10
verdict #1) — the composition normalized-exact dedup → exact
containment on survivors, with dup-count expansion metadata."""

from __future__ import annotations

import pyspark.sql.functions as F


def _clone_corpus(spark):
    """3 originals × punctuation-marker clones (normalized-exact
    duplicates, the gen_longdoc.py 'punct' recipe at toy scale), plus
    one genuine sub-document containment pair across groups:
    original 2 is a 6-token prefix of original 0."""
    base0 = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    base1 = "one two three four five six seven eight nine ten"
    base2 = "alpha beta gamma delta epsilon zeta"  # contained in base0
    rows = []
    did = 0
    for o, (base, depth) in enumerate(
        [(base0, 4), (base1, 3), (base2, 2)]
    ):
        for c in range(depth):
            rows.append((did, "en", "!" * (c + 1) + " " + base))
            did += 1
    return spark.createDataFrame(
        rows, "doc_id long, lang string, text string"
    )


def test_collapsed_containment_matches_bare_on_survivors(spark):
    """The composition must return exactly the bare exact form's pairs
    restricted to normalized-group survivors, annotated with both
    groups' dup counts — no pair lost, none invented."""
    from graphdbetl_spark.operators.dedup import (
        dedup_normalized_exact_groups,
        ngram_containment_collapsed_pairs,
        ngram_containment_pairs,
    )

    df = _clone_corpus(spark)
    groups = {
        r["keep_id"]: r["dup_count"]
        for r in dedup_normalized_exact_groups(df, "text", "doc_id").collect()
    }
    # punct markers normalize away: 3 groups with depths 4 / 3 / 2
    assert sorted(groups.values()) == [2, 3, 4]
    survivors = df.filter(F.col("doc_id").isin(list(groups)))
    bare = {
        (r["contained_id"], r["container_id"]): r["containment"]
        for r in ngram_containment_pairs(
            survivors, "text", "doc_id", n=3, threshold=0.5,
            block_cols=["lang"],
        ).collect()
    }
    got = ngram_containment_collapsed_pairs(
        df, "text", "doc_id", n=3, threshold=0.5, block_cols=["lang"]
    ).collect()
    assert {
        (r["contained_id"], r["container_id"]): r["containment"]
        for r in got
    } == bare
    for r in got:
        assert r["contained_dups"] == groups[r["contained_id"]]
        assert r["container_dups"] == groups[r["container_id"]]
    # the genuine cross-group sub-document pair survives the collapse:
    # group-2's survivor (id 7) is contained in group-0's (id 0)
    assert any(
        r["contained_id"] == 7 and r["container_id"] == 0
        and r["containment"] == 1.0
        for r in got
    ), got


def test_collapse_shrinks_pair_join_volume(spark):
    """The point of the composition: on a clone-heavy corpus the
    Σ_gram df² pair volume collapses. Measured here structurally —
    the survivor gram index is 1/clone-depth the size, so candidate
    pairs drop from Σ c·(c·depth²)/2-ish to the cross-original terms
    only (9 docs → 3 survivors here: bare emits every intra-group
    pair, collapsed emits none)."""
    from graphdbetl_spark.operators.dedup import (
        ngram_containment_collapsed_pairs,
        ngram_containment_pairs,
    )

    df = _clone_corpus(spark)
    bare = ngram_containment_pairs(
        df, "text", "doc_id", n=3, threshold=0.5, block_cols=["lang"]
    ).count()
    collapsed = ngram_containment_collapsed_pairs(
        df, "text", "doc_id", n=3, threshold=0.5, block_cols=["lang"]
    ).count()
    # bare: intra-group pairs (4C2 + 3C2 + 2C2 = 10) + cross pairs
    # between group 0 and group 2 members (4 × 2 = 8) = 18
    assert bare == 18
    # collapsed: just the one survivor-level containment pair
    assert collapsed == 1


def test_collapsed_adaptive_restriction_paths_agree(spark):
    """The survivor restriction is adaptive on the (free) group count:
    broadcast ids/dup-counts under the cap, shuffle semi-join past it
    (BASELINE.md "r11: containment upstream collapse" — the
    unconditional shuffle form cost 1.85x at 500k docs). Both paths
    must return identical pairs, and the plan must actually switch:
    broadcast joins under the cap, none of the corpus-sized
    broadcasts past it."""
    from graphdbetl_spark.operators.dedup import (
        ngram_containment_collapsed_pairs,
    )

    df = _clone_corpus(spark)
    kw = dict(n=3, threshold=0.5, block_cols=["lang"])
    bc = ngram_containment_collapsed_pairs(
        df, "text", "doc_id", broadcast_cap=2_000_000, **kw
    )
    sh = ngram_containment_collapsed_pairs(
        df, "text", "doc_id", broadcast_cap=0, **kw
    )
    assert sorted(map(tuple, bc.collect())) == sorted(map(tuple, sh.collect()))

    import re

    def id_broadcasts(df):
        # broadcast joins keyed on the doc/pair id — the adaptive
        # joins; the containment core's stop-gram anti-join broadcasts
        # on gh in BOTH forms and is not what switches
        plan = df._jdf.queryExecution().executedPlan().toString()
        return re.findall(
            r"BroadcastHashJoin \[(?:doc_id|contained_id|container_id)", plan
        )

    assert len(id_broadcasts(bc)) >= 3  # semi-join + two dup-count joins
    assert len(id_broadcasts(sh)) == 0
