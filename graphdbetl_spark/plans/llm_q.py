"""LLM-training-data pipeline queries (north-star extensions in
BASELINE.json): deduplication (exact / MinHash-LSH / SimHash / n-gram
Jaccard / embedding-cosine), similarity search (brute-force + LSH),
text analysis (stats, quality, language ID, fingerprints, TF-IDF), and
multimodal column plumbing.

Oracle notes: cosine math is done in DOUBLE on both engines and
rounded; approximate operators (MinHash/LSH) are rows-only by design.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from graphdbetl_spark.functions.text import (
    language_id,
    quality_score,
    rolling_fingerprint,
    token_count,
    tokens,
)
from graphdbetl_spark.functions.vectors import cosine_similarity
from graphdbetl_spark.operators.dedup import (
    _tokens,
    dedup_exact_text,
    ngram_jaccard_pairs,
)
from graphdbetl_spark.operators.multimodal import attach_media_columns, extract_features
from graphdbetl_spark.operators.similarity import cosine_topk_bruteforce, lsh_cosine_topk
from graphdbetl_spark.plans.registry import query
from graphdbetl_spark.sources.catalog import load_table as T

_DOUBLE_VEC = "list_transform(embedding, x -> CAST(x AS DOUBLE))"


def _dvec(col):
    return F.transform(col, lambda x: x.cast("double"))


# ------------------------------------------------------------- dedup


@query(
    "dedup_exact",
    oracle="""
    SELECT sha256(text) AS content_sha, CAST(MIN(doc_id) AS BIGINT) AS doc_id,
           CAST(COUNT(*) AS BIGINT) AS dup_count
    FROM documents GROUP BY sha256(text)
    """,
)
def dedup_exact(spark: SparkSession, sf: str) -> DataFrame:
    """Exact content dedup: one shuffle on the 256-bit digest."""
    return dedup_exact_text(T(spark, sf, "documents"), "text", "doc_id")


@query(
    "dedup_incremental",
    oracle="""
    WITH split AS (
        SELECT doc_id, text,
               ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 < 10
                   AS is_new
        FROM documents
    ), newb AS (
        SELECT doc_id, sha256(text) AS d FROM split WHERE is_new
    ), corp AS (
        SELECT DISTINCT sha256(text) AS d FROM split WHERE NOT is_new
    )
    SELECT n.doc_id, (c.d IS NOT NULL) AS is_duplicate
    FROM newb n LEFT JOIN corp c USING (d)
    """,
)
def dedup_incremental(spark: SparkSession, sf: str) -> DataFrame:
    """Incremental ingest dedup — the PRODUCTION shape of exact dedup:
    a new batch (deterministic 10% md5 split stands in for today's
    arrivals) is checked against the digest index of the existing
    corpus. The batch side is small, so AQE broadcasts its digests and
    the corpus-side index scan never shuffles; at warehouse scale the
    corpus digests are a persisted table bucketed by digest, making
    repeat ingests an exchange-free co-located join. Complements
    dedup_exact (whole-corpus groupBy), which re-shuffles EVERYTHING
    per run — at 100 TB you run that once, then this forever after."""
    from graphdbetl_spark.operators.sampling import hash_bucket

    d = T(spark, sf, "documents")
    b = hash_bucket(F.col("doc_id"))
    digest = F.sha2(F.col("text"), 256).alias("__d")
    newb = d.filter(b < 10).select("doc_id", digest)
    corp = d.filter(b >= 10).select(digest).distinct().withColumn("__dup", F.lit(True))
    return newb.join(corp, "__d", "left").select(
        "doc_id", F.coalesce("__dup", F.lit(False)).alias("is_duplicate")
    )


# dedup_minhash is registered below _minhash_md5_oracle (it shares the
# generated oracle); registry order is set by registry._PRIORITY, not
# file position.


def _minhash_md5_oracle(num_hashes: int = 16, bands: int = 4, threshold: float = 0.6) -> str:
    """Generated oracle for dedup_minhash_md5: replays the md5-family
    banded-LSH pipeline (base hash, universal-family signature, band
    buckets, candidate join, exact-Jaccard verify) with the SAME seeded
    coefficients as the Spark operator."""
    from graphdbetl_spark.operators.dedup import MINHASH_PRIME, minhash_coeffs

    p = MINHASH_PRIME
    r = num_hashes // bands
    coeffs = minhash_coeffs(num_hashes)
    sig_lines = ",\n           ".join(
        f"list_min(list_transform(hs, h -> (h * {a} + {b}) % {p})) AS s{i}"
        for i, (a, b) in enumerate(coeffs)
    )
    band_selects = "\n    UNION ALL ".join(
        "SELECT doc_id, {b} AS band, md5({expr}) AS bh FROM sig".format(
            b=b,
            expr=" || ',' || ".join(
                f"CAST(s{b * r + j} AS VARCHAR)" for j in range(r)
            ),
        )
        for b in range(bands)
    )
    return f"""
    WITH t AS (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks FROM documents
    ), sh0 AS (
        SELECT doc_id,
               list_distinct(list_transform(range(1, greatest(len(toks) - 2, 0) + 1),
                   i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
        FROM t
    ), sh AS (SELECT doc_id, sh FROM sh0 WHERE len(sh) > 0),
    hs AS (
        SELECT doc_id,
               list_transform(sh, s -> ('0x' || substr(md5(s), 1, 8))::BIGINT % {p}) AS hs
        FROM sh
    ), sig AS (
        SELECT doc_id,
           {sig_lines}
        FROM hs
    ), bk AS (
    {band_selects}
    ), cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bk a JOIN bk b
          ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
    )
    SELECT c.id_a, c.id_b,
           ROUND(len(list_intersect(x.sh, y.sh))::DOUBLE /
                 (len(x.sh) + len(y.sh) - len(list_intersect(x.sh, y.sh))), 6)
               AS jaccard
    FROM cand c JOIN sh x ON c.id_a = x.doc_id JOIN sh y ON c.id_b = y.doc_id
    WHERE len(list_intersect(x.sh, y.sh))::DOUBLE /
          (len(x.sh) + len(y.sh) - len(list_intersect(x.sh, y.sh))) >= {threshold}
    """


@query("dedup_minhash", oracle=_minhash_md5_oracle(threshold=0.5))
def dedup_minhash(spark: SparkSession, sf: str) -> DataFrame:
    """Banded MinHash-LSH near-dup pairs over 3-gram shingles (exact
    Jaccard ≥ 0.5 on the LSH candidate set): candidate generation is an
    equi-join on band buckets — the 100 TB near-dedup path. The
    registry name points at the md5 hash family (r5 verdict #1b:
    re-point oracle-less entries at their portable siblings), so
    candidate generation AND verification replay in the oracle at this
    entry's own 0.5 operating threshold; the xxhash64 fast path stays
    as operators/dedup.py minhash_near_duplicates, pytest-covered."""
    from graphdbetl_spark.operators.dedup import minhash_near_duplicates_md5

    return minhash_near_duplicates_md5(
        T(spark, sf, "documents"), "text", "doc_id", threshold=0.5
    )


@query("dedup_minhash_md5", oracle=_minhash_md5_oracle())
def dedup_minhash_md5(spark: SparkSession, sf: str) -> DataFrame:
    """Near-dup pairs via md5-family banded MinHash-LSH — the same
    AND-OR pipeline as dedup_minhash but with every hash replayable in
    any md5-capable engine, so candidate generation itself is
    ORACLE-CHECKED (the xxhash64 variant stays the throughput path)."""
    from graphdbetl_spark.operators.dedup import minhash_near_duplicates_md5

    return minhash_near_duplicates_md5(T(spark, sf, "documents"), "text", "doc_id")


def _minhash_incr_oracle(
    num_hashes: int = 16, bands: int = 4, threshold: float = 0.6
) -> str:
    """Generated oracle for dedup_minhash_incremental: the two-sided
    (new batch vs existing corpus) replay of the md5-family banded-LSH
    pipeline — same seeded coefficients, same band buckets, same
    exact-Jaccard verification, candidates restricted to batch×corpus."""
    from graphdbetl_spark.operators.dedup import MINHASH_PRIME, minhash_coeffs

    p = MINHASH_PRIME
    r = num_hashes // bands
    coeffs = minhash_coeffs(num_hashes)
    sig_lines = ",\n           ".join(
        f"list_min(list_transform(hs, h -> (h * {a} + {b}) % {p})) AS s{i}"
        for i, (a, b) in enumerate(coeffs)
    )
    band_selects = "\n    UNION ALL ".join(
        "SELECT doc_id, is_new, {b} AS band, md5({expr}) AS bh FROM sig".format(
            b=b,
            expr=" || ',' || ".join(
                f"CAST(s{b * r + j} AS VARCHAR)" for j in range(r)
            ),
        )
        for b in range(bands)
    )
    return f"""
    WITH split AS (
        SELECT doc_id, text,
               ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 < 10
                   AS is_new
        FROM documents
    ), t AS (
        SELECT doc_id, is_new, string_split_regex(trim(text), '\\s+') AS toks
        FROM split
    ), sh0 AS (
        SELECT doc_id, is_new,
               list_distinct(list_transform(range(1, greatest(len(toks) - 2, 0) + 1),
                   i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
        FROM t
    ), sh AS (SELECT doc_id, is_new, sh FROM sh0 WHERE len(sh) > 0),
    hs AS (
        SELECT doc_id, is_new,
               list_transform(sh, s -> ('0x' || substr(md5(s), 1, 8))::BIGINT % {p}) AS hs
        FROM sh
    ), sig AS (
        SELECT doc_id, is_new,
           {sig_lines}
        FROM hs
    ), bk AS (
    {band_selects}
    ), cand AS (
        SELECT DISTINCT n.doc_id AS bid, c.doc_id AS cid
        FROM bk n JOIN bk c
          ON n.band = c.band AND n.bh = c.bh AND n.is_new AND NOT c.is_new
    ), m AS (
        SELECT c.bid, CAST(COUNT(*) AS BIGINT) AS n_matches
        FROM cand c JOIN sh x ON c.bid = x.doc_id JOIN sh y ON c.cid = y.doc_id
        WHERE len(list_intersect(x.sh, y.sh))::DOUBLE /
              (len(x.sh) + len(y.sh) - len(list_intersect(x.sh, y.sh)))
                  >= {threshold}
        GROUP BY c.bid
    )
    SELECT s.doc_id, (m.bid IS NOT NULL) AS is_near_dup,
           COALESCE(m.n_matches, 0) AS n_matches
    FROM split s LEFT JOIN m ON s.doc_id = m.bid
    WHERE s.is_new
    """


@query("dedup_minhash_incremental", oracle=_minhash_incr_oracle())
def dedup_minhash_incremental(spark: SparkSession, sf: str) -> DataFrame:
    """Incremental near-dup screen: a new ingest batch (deterministic
    10% md5 split) probes the existing corpus's banded MinHash index —
    the repeat-ingest shape where the corpus signature index is built
    once (persisted, bucketed by band bucket at warehouse scale) and
    only the batch is new work per run. md5 hash family throughout, so
    candidate generation AND verification replay in the oracle. The
    MinHash analogue of dedup_incremental's exact-digest screen."""
    from graphdbetl_spark.operators.dedup import minhash_incremental_md5
    from graphdbetl_spark.operators.sampling import hash_bucket

    d = T(spark, sf, "documents")
    b = hash_bucket(F.col("doc_id"))
    return minhash_incremental_md5(
        d.filter(b >= 10), d.filter(b < 10), "text", "doc_id"
    )


# Oracle generator for the md5-family SimHash: generated SQL (one
# per-bit vote per position), bit-identical to the Spark fold because
# md5 is engine-portable. The token hash is always the first 12 hex
# chars (48 bits); narrower fingerprints vote on its low ``bits``.
def _simhash_oracle(bits: int) -> str:
    return """
    WITH tok AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS t
        FROM documents
    ), hashed AS (
        SELECT doc_id, ('0x' || substr(md5(t), 1, 12))::BIGINT AS h FROM tok
    ), votes AS (
        SELECT doc_id,
        {votes}
        FROM hashed GROUP BY doc_id
    )
    SELECT doc_id,
           ({fold}) AS simhash
    FROM votes
""".format(
        votes=",\n        ".join(
            f"SUM(CASE WHEN (h // {1 << i}) % 2 = 1 THEN 1 ELSE -1 END) AS v{i}"
            for i in range(bits)
        ),
        fold=" + ".join(
            f"(CASE WHEN v{i} > 0 THEN 1 ELSE 0 END)::BIGINT * {1 << (bits - 1 - i)}"
            for i in range(bits)
        ),
    )


@query("dedup_simhash", oracle=_simhash_oracle(32))
def dedup_simhash(spark: SparkSession, sf: str) -> DataFrame:
    """SimHash fingerprints; fingerprint-equal docs are near-dups. The
    registry name points at the md5 hash family at 32 bits (r5 verdict
    #1b) so the fingerprint — every vote and the bit fold — replays in
    the oracle; the 48-bit sibling below covers the wider operating
    point, and the xxhash64 64-bit fast path stays as
    operators/dedup.py simhash_fingerprints, pytest-covered."""
    from graphdbetl_spark.operators.dedup import simhash_fingerprints_md5

    return simhash_fingerprints_md5(
        T(spark, sf, "documents"), "text", "doc_id", bits=32
    )


@query("dedup_simhash_md5", oracle=_simhash_oracle(48))
def dedup_simhash_md5(spark: SparkSession, sf: str) -> DataFrame:
    """SimHash over the engine-portable md5 hash family (48-bit) —
    same vote/fold pipeline as dedup_simhash but ORACLE-CHECKED: DuckDB
    reproduces the fingerprint bit-for-bit."""
    from graphdbetl_spark.operators.dedup import simhash_fingerprints_md5

    return simhash_fingerprints_md5(T(spark, sf, "documents"), "text", "doc_id")


@query(
    "dedup_ngram_jaccard",
    oracle="""
    WITH t AS (SELECT doc_id, lang, string_split_regex(trim(text), '\\s+') AS toks
               FROM documents),
    g AS (SELECT doc_id, lang,
            list_distinct(list_transform(range(1, greatest(len(toks) - 2, 0) + 1),
                i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS grams
          FROM t),
    e0 AS (SELECT doc_id, lang, unnest(grams) AS gram FROM g),
    eh AS (SELECT doc_id, lang,
                  ('0x' || substr(md5(gram), 1, 15))::BIGINT AS gh FROM e0),
    gdf AS (SELECT gh FROM eh GROUP BY gh HAVING COUNT(*) > 10000),
    e AS (SELECT doc_id, lang, gh, COUNT(*) OVER (PARTITION BY doc_id) AS gc
          FROM eh WHERE gh NOT IN (SELECT gh FROM gdf)),
    shared AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.gc AS ca, b.gc AS cb,
               CAST(COUNT(*) AS BIGINT) AS shared
        FROM e a JOIN e b ON a.gh = b.gh AND a.lang = b.lang
                         AND a.doc_id < b.doc_id
        GROUP BY 1, 2, 3, 4)
    SELECT id_a, id_b, ROUND(shared::DOUBLE / (ca + cb - shared), 6) AS jaccard
    FROM shared WHERE shared::DOUBLE / (ca + cb - shared) >= 0.1
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf: str) -> DataFrame:
    """EXACT 3-gram Jaccard pairs ≥ 0.1 via inverted-index self-join
    blocked by lang — candidates only where ≥1 shared gram (fully
    oracle-checked, unlike the LSH-approximate dedup_minhash)."""
    out = ngram_jaccard_pairs(
        T(spark, sf, "documents"), "text", "doc_id", n=3, threshold=0.1, block_cols=["lang"]
    )
    return out.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))


@query(
    "dedup_containment",
    oracle="""
    WITH t AS (SELECT doc_id, lang, string_split_regex(trim(text), '\\s+') AS toks
               FROM documents),
    g AS (SELECT doc_id, lang,
            list_distinct(list_transform(range(1, greatest(len(toks) - 2, 0) + 1),
                i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS grams
          FROM t),
    e0 AS (SELECT doc_id, lang, unnest(grams) AS gram FROM g),
    eh AS (SELECT doc_id, lang,
                  ('0x' || substr(md5(gram), 1, 15))::BIGINT AS gh FROM e0),
    gdf AS (SELECT gh FROM eh GROUP BY gh HAVING COUNT(*) > 10000),
    e AS (SELECT doc_id, lang, gh, COUNT(*) OVER (PARTITION BY doc_id) AS gc
          FROM eh WHERE gh NOT IN (SELECT gh FROM gdf)),
    shared AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.gc AS ca, b.gc AS cb,
               CAST(COUNT(*) AS BIGINT) AS shared
        FROM e a JOIN e b ON a.gh = b.gh AND a.lang = b.lang
                         AND a.doc_id < b.doc_id
        GROUP BY 1, 2, 3, 4)
    SELECT CASE WHEN ca <= cb THEN id_a ELSE id_b END AS contained_id,
           CASE WHEN ca <= cb THEN id_b ELSE id_a END AS container_id,
           ROUND(shared::DOUBLE / LEAST(ca, cb), 6) AS containment
    FROM shared WHERE shared::DOUBLE / LEAST(ca, cb) >= 0.5
    """,
)
def dedup_containment(spark: SparkSession, sf: str) -> DataFrame:
    """Exact 3-gram CONTAINMENT pairs ≥ 0.5 — the asymmetric measure
    that catches sub-document duplication (a doc embedded whole in a
    larger one scores ~1.0 where Jaccard reads ~|A|/|B|). Same
    inverted-index candidate core as dedup_ngram_jaccard (one shared
    derivation, operators/dedup.py _ngram_shared_counts), oriented
    (contained = smaller gram set, ties to the lower id)."""
    from graphdbetl_spark.operators.dedup import ngram_containment_pairs

    out = ngram_containment_pairs(
        T(spark, sf, "documents"), "text", "doc_id", n=3, threshold=0.5,
        block_cols=["lang"],
    )
    return out.select(
        "contained_id", "container_id",
        F.round("containment", 6).alias("containment"),
    )


@query(
    "dedup_containment_screened",
    oracle="""
    WITH t AS (SELECT doc_id, lang, string_split_regex(trim(text), '\\s+') AS toks
               FROM documents),
    g AS (SELECT doc_id, lang,
            list_distinct(list_transform(range(1, greatest(len(toks) - 2, 0) + 1),
                i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS grams
          FROM t),
    e0 AS (SELECT doc_id, lang, unnest(grams) AS gram FROM g),
    eh AS (SELECT doc_id, lang,
                  ('0x' || substr(md5(gram), 1, 15))::BIGINT AS gh FROM e0),
    gdf AS (SELECT gh FROM eh GROUP BY gh HAVING COUNT(*) > 10000),
    e AS (SELECT doc_id, lang, gh, COUNT(*) OVER (PARTITION BY doc_id) AS gc
          FROM eh WHERE gh NOT IN (SELECT gh FROM gdf)),
    sm AS (SELECT doc_id, lang, gh,
                  row_number() OVER (PARTITION BY doc_id, lang
                                     ORDER BY ('0x' || substr(md5('cs:' || CAST(gh AS VARCHAR)), 1, 15))::BIGINT, gh) AS rk
           FROM e),
    sampled AS (SELECT doc_id, lang, gh FROM sm WHERE rk <= 16),
    cand AS (SELECT DISTINCT LEAST(s.doc_id, b.doc_id) AS id_a,
                    GREATEST(s.doc_id, b.doc_id) AS id_b
             FROM sampled s JOIN e b ON s.gh = b.gh AND s.lang = b.lang
                                    AND s.doc_id <> b.doc_id),
    shared AS (
        SELECT c.id_a, c.id_b, ga.gc AS ca, gb.gc AS cb,
               CAST(COUNT(*) AS BIGINT) AS shared
        FROM cand c
        JOIN e ga ON ga.doc_id = c.id_a
        JOIN e gb ON gb.doc_id = c.id_b AND gb.gh = ga.gh
        GROUP BY 1, 2, 3, 4)
    SELECT CASE WHEN ca <= cb THEN id_a ELSE id_b END AS contained_id,
           CASE WHEN ca <= cb THEN id_b ELSE id_a END AS container_id,
           ROUND(shared::DOUBLE / LEAST(ca, cb), 6) AS containment
    FROM shared WHERE shared::DOUBLE / LEAST(ca, cb) >= 0.5
    """,
)
def dedup_containment_screened(spark: SparkSession, sf: str) -> DataFrame:
    """Containment via the bottom-k gram-sample screen. Each doc
    probes the index with only its 16 smallest-by-md5-key grams; a
    threshold-0.5 pair's miss probability is ≤ 0.5^16 ≈ 1.5e-5 per
    pair AND the sample is deterministic, so the oracle replays the
    exact candidate set (screen + verify both attested — the
    sim_ivf_topk discipline). MinHash-LSH is NOT the screen here: it
    recalls by Jaccard, and sub-document containment pairs sit at
    Jaccard ~0.01 by construction. MEASURED at four corpus shapes in
    r10 the exact `dedup_containment` wins everywhere — that exact
    form is the scale path; this entry stays as the attested negative
    result (BASELINE.md "r10: containment screen verdict"). See
    operators/dedup.py containment_screened_pairs."""
    from graphdbetl_spark.operators.dedup import containment_screened_pairs

    out = containment_screened_pairs(
        T(spark, sf, "documents"), "text", "doc_id", n=3, threshold=0.5,
        sample_k=16, block_cols=["lang"],
    )
    return out.select(
        "contained_id", "container_id",
        F.round("containment", 6).alias("containment"),
    )


@query(
    "dedup_containment_collapsed",
    oracle=r"""
    WITH corpus AS (
        SELECT doc_id, lang, text FROM documents
        UNION ALL
        SELECT doc_id + 1000000, lang,
               replace(upper(text), ' ', '  ') || ' !!' FROM documents
    ), nrm AS (
        SELECT doc_id,
               md5(trim(regexp_replace(regexp_replace(
                   lower(text), '[^a-z0-9 \t\n]', '', 'g'), '\s+', ' ', 'g')))
                   AS norm_digest
        FROM corpus
    ), grp AS (
        SELECT norm_digest, MIN(doc_id) AS keep_id,
               CAST(COUNT(*) AS BIGINT) AS dup_count
        FROM nrm GROUP BY norm_digest
    ), surv AS (
        SELECT c.doc_id, c.lang, c.text
        FROM corpus c JOIN grp ON grp.keep_id = c.doc_id
    ), t AS (SELECT doc_id, lang, string_split_regex(trim(text), '\s+') AS toks
             FROM surv),
    g AS (SELECT doc_id, lang,
            list_distinct(list_transform(range(1, greatest(len(toks) - 2, 0) + 1),
                i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS grams
          FROM t),
    e0 AS (SELECT doc_id, lang, unnest(grams) AS gram FROM g),
    eh AS (SELECT doc_id, lang,
                  ('0x' || substr(md5(gram), 1, 15))::BIGINT AS gh FROM e0),
    gdf AS (SELECT gh FROM eh GROUP BY gh HAVING COUNT(*) > 10000),
    e AS (SELECT doc_id, lang, gh, COUNT(*) OVER (PARTITION BY doc_id) AS gc
          FROM eh WHERE gh NOT IN (SELECT gh FROM gdf)),
    shared AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.gc AS ca, b.gc AS cb,
               CAST(COUNT(*) AS BIGINT) AS shared
        FROM e a JOIN e b ON a.gh = b.gh AND a.lang = b.lang
                         AND a.doc_id < b.doc_id
        GROUP BY 1, 2, 3, 4),
    pairs AS (
        SELECT CASE WHEN ca <= cb THEN id_a ELSE id_b END AS contained_id,
               CASE WHEN ca <= cb THEN id_b ELSE id_a END AS container_id,
               ROUND(shared::DOUBLE / LEAST(ca, cb), 6) AS containment
        FROM shared WHERE shared::DOUBLE / LEAST(ca, cb) >= 0.5)
    SELECT p.contained_id, p.container_id, p.containment,
           ga.dup_count AS contained_dups, gb.dup_count AS container_dups
    FROM pairs p
    JOIN grp ga ON ga.keep_id = p.contained_id
    JOIN grp gb ON gb.keep_id = p.container_id
    """,
)
def dedup_containment_collapsed(spark: SparkSession, sf: str) -> DataFrame:
    """Containment with UPSTREAM CLONE COLLAPSE — the 100 TB
    composition the r10 verdict asked to convert from prose to a
    measured, attested artifact: normalized-exact dedup first (linear:
    one Arrow digest pass + one 16-byte-key hash agg), then the exact
    containment core on one survivor per normalized group, with each
    pair carrying both groups' dup_count for exact downstream
    expansion. The corpus here is documents UNION a reformatted clone
    of every document (uppercased, double-spaced, punctuation
    appended — the dedup_normalized_exact recipe), so the collapse is
    exercised: byte-exact dedup sees 2N distinct docs, the collapse
    tier folds every clone onto its original BEFORE the Σ_gram df²
    pair join, and every output pair reads dups=2 on both ends. Scale
    evidence: BASELINE.md "r11: containment upstream collapse"
    measures the composition vs bare exact containment on a 150-deep
    reformat-clone fixture (Σ df² quadratic in clone depth) and on
    the marker-token fixtures where the collapse is a no-op (pure
    overhead bound). See operators/dedup.py
    ngram_containment_collapsed_pairs."""
    from graphdbetl_spark.operators.dedup import (
        ngram_containment_collapsed_pairs,
    )

    d = T(spark, sf, "documents").select("doc_id", "lang", "text")
    clone = d.select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.col("lang"),
        F.concat(
            F.regexp_replace(F.upper(F.col("text")), " ", "  "), F.lit(" !!")
        ).alias("text"),
    )
    out = ngram_containment_collapsed_pairs(
        d.unionByName(clone), "text", "doc_id", n=3, threshold=0.5,
        block_cols=["lang"],
    )
    return out.select(
        "contained_id", "container_id",
        F.round("containment", 6).alias("containment"),
        "contained_dups", "container_dups",
    )


# canonical home is operators/similarity.py (shared by the md5 ANN
# operators); re-exported here for the blocked-dedup plan builders.
from graphdbetl_spark.operators.similarity import (  # noqa: E402
    lsh_hyperplanes as _lsh_hyperplanes,
)


def _embedding_lsh_oracle(n_planes: int = 8, threshold: float = 0.2) -> str:
    planes = _lsh_hyperplanes(n_planes)
    bucket_terms = " + ".join(
        f"(CASE WHEN list_reduce(list_transform(range(1, 65), "
        f"i -> v[i] * (ARRAY{p})[i]), (a, b) -> a + b) >= 0 "
        f"THEN {1 << k} ELSE 0 END)"
        for k, p in enumerate(planes)
    )
    return f"""
    WITH u AS (
        SELECT vec_id, label,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ), bkt AS (
        SELECT vec_id, label, v, {bucket_terms} AS bucket FROM u
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND(list_cosine_similarity(a.v, b.v), 4) AS cosine
    FROM bkt a JOIN bkt b
      ON a.label = b.label AND a.bucket = b.bucket AND a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.v, b.v) >= {threshold}
    """


def _pair_cosine_scores(
    pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b",
    va: str = "va", vb: str = "vb",
) -> DataFrame:
    """Candidate-pair cosine scoring as a vectorized Arrow kernel: the
    interpreted fold costs ~190 lambda evaluations per pair (dot + two
    norms over 64 dims) and dominated the blocked dedup at the 30×
    replica (~65 s of a 66 s query). Reductions go through
    _np_seq_sum (true left-fold order; np.add.reduce is pairwise and
    drifts by ULPs) so dot / (‖a‖·‖b‖) matches the DataFrame fold
    bit-for-bit — pinned by tests/test_similarity.py. Returns
    (id_a, id_b, cos)."""
    import numpy as np
    import pandas as pd

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            from graphdbetl_spark.operators.similarity import _np_seq_sum

            a = np.array(pdf[va].tolist(), dtype=np.float64)
            b = np.array(pdf[vb].tolist(), dtype=np.float64)
            dot = _np_seq_sum(a * b, axis=1)
            na = np.sqrt(_np_seq_sum(a * a, axis=1))
            nb = np.sqrt(_np_seq_sum(b * b, axis=1))
            yield pd.DataFrame(
                {id_a: pdf[id_a], id_b: pdf[id_b], "cos": dot / (na * nb)}
            )

    return pairs.mapInPandas(
        score, schema=f"{id_a} bigint, {id_b} bigint, cos double"
    )


def _embedding_blocked_pairs(
    spark: SparkSession, sf: str, n_planes: int = 8, threshold: float = 0.2
) -> DataFrame:
    """Embedding near-dup pairs with SIMILARITY-PRESERVING blocking:
    random-hyperplane sign buckets (md5-derived ±1 planes → 2^b
    buckets) compound the label block, so block population — and the
    per-block quadratic — shrinks geometrically with plane count
    instead of being pinned to the label cardinality. Measured at the
    10× replica: the label-only all-pairs variant went
    quadratic-per-block (fixed label count ⇒ 100× pair work for 10×
    rows) while this one stays tractable; plane count is the knob that
    scales blocking with the corpus (b ≈ log₂ n) — and it actually
    TURNS with the corpus here: ``n_planes`` is a floor, raised to
    ceil(log₂(n/800)) so blocks hold ~80 rows at ~10 labels whatever
    the scale (a fixed 8 planes re-pinned block population to n/2560
    and went quadratic again at the 1000× replica: 17.7 s at 100× but
    381 s at 1000×; adaptive planes → 12 at 2M rows). The floor keeps
    every corpus ≤ ~200k rows on exactly 8 planes, so the
    sf0.01/sf0.1 oracle buckets are bit-identical. Hyperplanes are
    literal ±1 vectors derived from md5 bits in plain Python, so the
    oracle replays the exact buckets — candidate generation is
    oracle-checked, like the minhash md5 family."""
    import math

    import numpy as np
    import pandas as pd

    from graphdbetl_spark.operators.similarity import _np_seq_sum  # noqa: F401
    from graphdbetl_spark.operators.skew import adaptive_parallelism

    e = T(spark, sf, "embeddings")
    n = e.count()
    if n > 800:
        n_planes = max(n_planes, math.ceil(math.log2(n / 800)))
    planes = _lsh_hyperplanes(n_planes)
    v = _dvec(F.col("embedding"))
    pm = np.array(planes, dtype=np.float64)

    # Sign buckets in an Arrow kernel (the sim_lsh_topk prep treatment):
    # n_planes interpreted 64-element folds per row cost ~10 s of the
    # 100× wall; the kernel's dim-major accumulation is the same left
    # fold the oracle's list_reduce replays, and sign → bit OR is
    # integer arithmetic.
    def kern(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            vv = np.array(pdf["v"].tolist(), dtype=np.float64)
            acc = np.zeros((len(pdf), pm.shape[0]))
            for i in range(pm.shape[1]):  # dim-major: left-fold dots
                acc = acc + vv[:, i : i + 1] * pm[None, :, i]
            bk = np.zeros(len(pdf), dtype=np.int64)
            for j in range(pm.shape[0]):
                bk = bk + ((acc[:, j] >= 0).astype(np.int64) << j)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "label": pdf["label"],
                    "v": pdf["v"],
                    "bucket": bk.astype(np.int32),
                }
            )

    u = adaptive_parallelism(e, "vec_id").select("vec_id", "label", v.alias("v"))
    bkt = u.mapInPandas(
        kern, schema="vec_id bigint, label int, v array<double>, bucket int"
    )
    a = bkt.select(F.col("vec_id").alias("id_a"), F.col("label").alias("la"),
                   F.col("bucket").alias("ba"), F.col("v").alias("va"))
    b = bkt.select(F.col("vec_id").alias("id_b"), F.col("label").alias("lb"),
                   F.col("bucket").alias("bb"), F.col("v").alias("vb"))
    cand = a.join(
        b,
        (F.col("la") == F.col("lb")) & (F.col("ba") == F.col("bb"))
        & (F.col("id_a") < F.col("id_b")),
    ).select("id_a", "id_b", "va", "vb")
    return (
        _pair_cosine_scores(cand)
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", F.round("cos", 4).alias("cosine"))
    )


@query("dedup_embedding_cosine", oracle=_embedding_lsh_oracle())
def dedup_embedding_cosine(spark: SparkSession, sf: str) -> DataFrame:
    """Embedding near-dup pairs (cosine ≥ 0.2) — DEFAULT path is the
    hyperplane-blocked candidate generation (label block compounded
    with 8 md5-derived sign bits), the form proven tractable at the
    10× replica; the label-only all-pairs form is the explicitly gated
    dedup_embedding_cosine_exact. A 100 TB caller hitting the obvious
    name gets the scale-safe plan (r2 verdict ask #2)."""
    return _embedding_blocked_pairs(spark, sf)


@query("dedup_embedding_lsh_blocked", oracle=_embedding_lsh_oracle())
def dedup_embedding_lsh_blocked(spark: SparkSession, sf: str) -> DataFrame:
    """Alias surface for the hyperplane-blocked pair generator (kept so
    callers who adopted the explicit r2 name keep working); see
    _embedding_blocked_pairs for the plan and scale argument."""
    return _embedding_blocked_pairs(spark, sf)


def _semantic_clusters_oracle(k: int = 8, n_planes: int = 8, threshold: float = 0.2) -> str:
    planes = _lsh_hyperplanes(n_planes)
    bucket_terms = " + ".join(
        f"(CASE WHEN list_reduce(list_transform(range(1, 65), "
        f"i -> v[i] * (ARRAY{p})[i]), (a, b) -> a + b) >= 0 "
        f"THEN {1 << j} ELSE 0 END)"
        for j, p in enumerate(planes)
    )
    return f"""
    WITH un AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ), u AS (
        SELECT vec_id, v,
               list_transform(v, x -> x / sqrt(
                   list_reduce(list_transform(v, y -> y * y), (a, b) -> a + b))) AS uv
        FROM un
    ), d AS (
        SELECT uv AS cuv,
               row_number() OVER (
                   ORDER BY md5('42:' || CAST(vec_id AS VARCHAR)), vec_id) - 1 AS cell
        FROM u ORDER BY md5('42:' || CAST(vec_id AS VARCHAR)), vec_id LIMIT {k}
    ), dots AS (
        SELECT u.vec_id, d.cell,
               list_reduce(list_transform(range(1, 65),
                           i -> u.uv[i] * d.cuv[i]), (a, b) -> a + b) AS dt
        FROM u CROSS JOIN d
    ), asn AS (
        SELECT vec_id, cell FROM (
            SELECT vec_id, cell,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY dt DESC, cell) AS rn
            FROM dots) WHERE rn = 1
    ), bkt AS (
        SELECT u.vec_id, asn.cell, u.v, {bucket_terms} AS bucket
        FROM u JOIN asn USING (vec_id)
    ), pairs AS (
        SELECT DISTINCT b.vec_id AS id_b
        FROM bkt a JOIN bkt b
          ON a.cell = b.cell AND a.bucket = b.bucket AND a.vec_id < b.vec_id
        WHERE list_cosine_similarity(a.v, b.v) >= {threshold}
    )
    SELECT bkt.vec_id, CAST(bkt.cell AS INT) AS cell,
           pairs.id_b IS NULL AS keep
    FROM bkt LEFT JOIN pairs ON bkt.vec_id = pairs.id_b
    """


@query("dedup_semantic_clusters", oracle=_semantic_clusters_oracle())
def dedup_semantic_clusters(spark: SparkSession, sf: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning
    at web-scale through semantic deduplication"): cluster embeddings,
    then drop all but one member of every intra-cluster near-duplicate
    group. Clustering uses the md5-sampled deterministic centroids
    (k-means stand-in, bit-reproducible on any engine — the PQ donor
    pattern); each vector assigns to its max-dot centroid via a
    broadcast of the k-row centroid table and a struct-min partial agg
    (map-only, no window). The intra-cluster pair join compounds the
    cell with 8 md5-hyperplane sign bits — the r2 lesson that a block
    key must GROW with the corpus (fixed k cells alone would be
    quadratic-per-cell); the keep policy drops any vector with a
    smaller-id neighbor at cosine ≥ 0.2 in its block.

    Returns (vec_id, cell, keep) for the whole corpus; downstream
    filters keep = true. Candidate generation, assignment, and keep
    policy are ALL replayed by the DuckDB oracle."""
    from graphdbetl_spark.operators.similarity import md5_sampled_centroids

    import numpy as np
    import pandas as pd

    from graphdbetl_spark.operators.similarity import _np_seq_sum
    from graphdbetl_spark.operators.skew import ensure_scan_parallelism

    e = T(spark, sf, "embeddings")
    norm = F.sqrt(F.aggregate("v", F.lit(0.0), lambda a, x: a + x * x))
    # Centroid sample picks its 8 md5-ranked rows FIRST, then pays the
    # JVM unit-normalize on those 8 only (the md5_sampled_centroids_raw
    # shape — selection never looks at the vectors, so the centroids
    # are bit-identical to the normalize-everything form).
    picked = (
        e.select(
            "vec_id",
            _dvec(F.col("embedding")).alias("v"),
            F.md5(F.concat(F.lit("42:"), F.col("vec_id").cast("string"))).alias("__r"),
        )
        .orderBy("__r", "vec_id")
        .limit(8)
        .drop("__r")
    )
    pu = picked.withColumn("uv", F.transform("v", lambda x: x / norm))
    cents = md5_sampled_centroids(pu, "vec_id", k=8, vec_col="uv")
    planes = _lsh_hyperplanes(8)

    # Assignment + sign buckets in ONE Arrow kernel (the IVF/LSH
    # treatment — the inline HOF form cost 87 s at the 100× replica):
    # cell dots run over the kernel-normalized units (left-fold parity
    # with the JVM uv), plane dots over the RAW doubles exactly like
    # the dot_p fold they replace, argmax scans ascending cell ids
    # (the struct-min tie rule), and the row carries v through so no
    # assignment re-join is needed.
    cent_rows = sorted(cents.collect(), key=lambda r: r["cell"])
    cm = np.array([r["centroid"] for r in cent_rows], dtype=np.float64)
    cell_ids = np.array([r["cell"] for r in cent_rows], dtype=np.int32)
    pm = np.array(planes, dtype=np.float64)

    def kern(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            v = np.array(pdf["v"].tolist(), dtype=np.float64)
            un = v / np.sqrt(_np_seq_sum(v * v, axis=1))[:, None]
            acc_c = np.zeros((len(pdf), cm.shape[0]))
            acc_p = np.zeros((len(pdf), pm.shape[0]))
            for i in range(cm.shape[1]):  # dim-major: left-fold dots
                acc_c = acc_c + un[:, i : i + 1] * cm[None, :, i]
                acc_p = acc_p + v[:, i : i + 1] * pm[None, :, i]
            bk = np.zeros(len(pdf), dtype=np.int64)
            for j in range(pm.shape[0]):
                bk = bk + ((acc_p[:, j] >= 0).astype(np.int64) << j)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "v": pdf["v"],
                    "cell": cell_ids[np.argmax(acc_c, axis=1)],
                    "bucket": bk.astype(np.int32),
                }
            )

    src = ensure_scan_parallelism(e, "vec_id").select(
        "vec_id", _dvec(F.col("embedding")).alias("v")
    )
    bkt = src.mapInPandas(
        kern, schema="vec_id bigint, v array<double>, cell int, bucket int"
    )
    a = bkt.select(F.col("vec_id").alias("id_a"), F.col("cell").alias("ca"),
                   F.col("bucket").alias("ba"), F.col("v").alias("va"))
    b = bkt.select(F.col("vec_id").alias("id_b"), F.col("cell").alias("cb"),
                   F.col("bucket").alias("bb"), F.col("v").alias("vb"))
    cand = a.join(
        b,
        (F.col("ca") == F.col("cb")) & (F.col("ba") == F.col("bb"))
        & (F.col("id_a") < F.col("id_b")),
    ).select("id_a", "id_b", "va", "vb")
    dropped = (
        _pair_cosine_scores(cand)
        .filter(F.col("cos") >= 0.2)
        .select(F.col("id_b").alias("vec_id"))
        .distinct()
        .withColumn("__dropped", F.lit(True))
    )
    return (
        bkt.join(dropped, "vec_id", "left")
        .select("vec_id", "cell", F.coalesce(~F.col("__dropped"), F.lit(True)).alias("keep"))
    )


@query(
    "dedup_embedding_cosine_exact",
    oracle=f"""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND(list_cosine_similarity(
               list_transform(a.embedding, x -> CAST(x AS DOUBLE)),
               list_transform(b.embedding, x -> CAST(x AS DOUBLE))), 4) AS cosine
    FROM embeddings a JOIN embeddings b
      ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE list_cosine_similarity(
               list_transform(a.embedding, x -> CAST(x AS DOUBLE)),
               list_transform(b.embedding, x -> CAST(x AS DOUBLE))) >= 0.2
    """,
)
def dedup_embedding_cosine_exact(spark: SparkSession, sf: str) -> DataFrame:
    """GATED exact variant: ALL pairs within each label block (no
    similarity-preserving bucketing). Quadratic in block population —
    the 10× campaign measured it >180 s (killed) because label
    cardinality is fixed while rows grow. Appropriate only at test
    scale or as a recall oracle for the blocked default; at corpus
    scale call dedup_embedding_cosine (hyperplane-blocked). Same gate
    rationale as join_cross. A hard input cap (operators/guards.py)
    raises before the all-pairs join exists, so the quadratic shape is
    unreachable at corpus scale."""
    from graphdbetl_spark.operators.guards import require_bounded_input

    e = require_bounded_input(
        T(spark, sf, "embeddings"),
        "dedup_embedding_cosine_exact",
        "dedup_embedding_cosine",
    )
    a = e.select(F.col("vec_id").alias("id_a"), F.col("label").alias("la"), _dvec(F.col("embedding")).alias("va"))
    b = e.select(F.col("vec_id").alias("id_b"), F.col("label").alias("lb"), _dvec(F.col("embedding")).alias("vb"))
    cos = cosine_similarity(F.col("va"), F.col("vb"))
    return (
        a.join(b, (F.col("la") == F.col("lb")) & (F.col("id_a") < F.col("id_b")))
        .withColumn("cos", cos)
        .filter(F.col("cos") >= 0.2)
        .select("id_a", "id_b", F.round("cos", 4).alias("cosine"))
    )


@query(
    "dedup_keep_list",
    oracle="""
    WITH keepx AS (
        SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY sha256(text)
    ),
    exact_dropped AS (
        SELECT doc_id FROM documents WHERE doc_id NOT IN (SELECT doc_id FROM keepx)
    ),
    surv AS (SELECT * FROM documents WHERE doc_id IN (SELECT doc_id FROM keepx)),
    t AS (SELECT doc_id, lang, string_split_regex(trim(text), '\\s+') AS toks FROM surv),
    g AS (SELECT doc_id, lang,
            list_distinct(list_transform(range(1, greatest(len(toks) - 2, 0) + 1),
                i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS grams
          FROM t),
    e0 AS (SELECT doc_id, lang, unnest(grams) AS gram FROM g),
    eh AS (SELECT doc_id, lang,
                  ('0x' || substr(md5(gram), 1, 15))::BIGINT AS gh FROM e0),
    gdf AS (SELECT gh FROM eh GROUP BY gh HAVING COUNT(*) > 10000),
    e AS (SELECT doc_id, lang, gh, COUNT(*) OVER (PARTITION BY doc_id) AS gc
          FROM eh WHERE gh NOT IN (SELECT gh FROM gdf)),
    pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.gc AS ca, b.gc AS cb,
               COUNT(*) AS shared
        FROM e a JOIN e b ON a.gh = b.gh AND a.lang = b.lang
                         AND a.doc_id < b.doc_id
        GROUP BY 1, 2, 3, 4
        HAVING COUNT(*)::DOUBLE / (a.gc + b.gc - COUNT(*)) >= 0.5
    ),
    near_ids AS (SELECT DISTINCT id_b AS doc_id FROM pairs)
    SELECT doc_id, TRUE AS keep, 'unique' AS reason FROM surv
    WHERE doc_id NOT IN (SELECT doc_id FROM near_ids)
    UNION ALL
    SELECT doc_id, FALSE, 'near_dup' FROM near_ids
    UNION ALL
    SELECT doc_id, FALSE, 'exact_dup' FROM exact_dropped
    """,
)
def dedup_keep_list_q(spark: SparkSession, sf: str) -> DataFrame:
    """End-to-end training-data dedup policy: exact-dup then near-dup
    (3-gram Jaccard ≥ 0.5, lang-blocked) with deterministic
    min-id-survives resolution; emits (doc_id, keep, reason)."""
    from graphdbetl_spark.operators.dedup import dedup_keep_list

    return dedup_keep_list(
        T(spark, sf, "documents"), "text", "doc_id", near_threshold=0.5, block_cols=["lang"]
    )


@query(
    "dedup_cluster_components",
    oracle="""
    WITH RECURSIVE pairs AS (
        WITH t AS (SELECT doc_id, lang, string_split_regex(trim(text), '\\s+') AS toks
                   FROM documents),
        g AS (SELECT doc_id, lang,
                list_distinct(list_transform(range(1, greatest(len(toks) - 2, 0) + 1),
                    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS grams
              FROM t),
        e0 AS (SELECT doc_id, lang, unnest(grams) AS gram FROM g),
        eh AS (SELECT doc_id, lang,
                      ('0x' || substr(md5(gram), 1, 15))::BIGINT AS gh FROM e0),
        gdf AS (SELECT gh FROM eh GROUP BY gh HAVING COUNT(*) > 10000),
        e AS (SELECT doc_id, lang, gh, COUNT(*) OVER (PARTITION BY doc_id) AS gc
              FROM eh WHERE gh NOT IN (SELECT gh FROM gdf))
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM e a JOIN e b ON a.gh = b.gh AND a.lang = b.lang
                         AND a.doc_id < b.doc_id
        GROUP BY 1, 2, a.gc, b.gc
        HAVING COUNT(*)::DOUBLE / (a.gc + b.gc - COUNT(*)) >= 0.1
    ), sym AS (
        SELECT id_a AS a, id_b AS b FROM pairs UNION SELECT id_b, id_a FROM pairs
    ), reach(id, root) AS (
        SELECT a, a FROM sym
        UNION
        SELECT s.b, r.root FROM reach r JOIN sym s ON s.a = r.id
    )
    SELECT id, CAST(MIN(root) AS BIGINT) AS component FROM reach GROUP BY id
    """,
)
def dedup_cluster_components(spark: SparkSession, sf: str) -> DataFrame:
    """Near-dup CLUSTERS: connected components over the 3-gram Jaccard
    pair graph (min-label propagation, operators/graph.py) — merges
    chains that pairwise policies under-merge. Oracle: recursive-CTE
    reachability closure."""
    from graphdbetl_spark.operators.graph import connected_components

    pairs = ngram_jaccard_pairs(
        T(spark, sf, "documents"), "text", "doc_id", n=3, threshold=0.1, block_cols=["lang"]
    )
    return connected_components(pairs, "id_a", "id_b")


# -------------------------------------------------------- similarity


@query(
    "sim_cosine_topk",
    oracle=f"""
    SELECT query_id, neighbor_id, rank FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY list_cosine_similarity(
                       list_transform(q.embedding, x -> CAST(x AS DOUBLE)),
                       list_transform(c.embedding, x -> CAST(x AS DOUBLE))) DESC,
                   c.vec_id) AS rank
        FROM (SELECT * FROM embeddings WHERE vec_id < 5) q
        JOIN embeddings c ON c.vec_id <> q.vec_id
    ) WHERE rank <= 10
    """,
)
def sim_cosine_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Brute-force exact cosine top-10 for 5 query vectors: broadcast
    queries × one corpus scan, JVM-side dot products, partial top-k."""
    e = T(spark, sf, "embeddings").withColumn("embedding", _dvec(F.col("embedding")))
    q = e.filter(F.col("vec_id") < 5)
    out = cosine_topk_bruteforce(e, q, "vec_id", "embedding", k=10)
    return out.select("query_id", "neighbor_id", "rank")


@query(
    "mine_hard_negatives",
    oracle="""
    SELECT query_id, neighbor_id, rank FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY list_cosine_similarity(
                       list_transform(q.embedding, x -> CAST(x AS DOUBLE)),
                       list_transform(c.embedding, x -> CAST(x AS DOUBLE))) DESC,
                   c.vec_id) AS rank
        FROM (SELECT * FROM embeddings WHERE vec_id < 20) q
        JOIN embeddings c ON c.label <> q.label
    ) WHERE rank <= 3
    """,
)
def mine_hard_negatives_q(spark: SparkSession, sf: str) -> DataFrame:
    """Hard-negative mining for contrastive training: per anchor, the
    top-3 most-similar corpus vectors with a DIFFERENT label — anchors
    broadcast, label-mismatch predicate applied before scoring, one
    codegen corpus scan (operators/similarity.py mine_hard_negatives).
    Exact, hence fully oracle-checked; swap the scan for an IVF/PQ
    probe when the anchor set outgrows a broadcast."""
    from graphdbetl_spark.operators.similarity import mine_hard_negatives

    e = T(spark, sf, "embeddings").withColumn("embedding", _dvec(F.col("embedding")))
    q = e.filter(F.col("vec_id") < 20)
    out = mine_hard_negatives(e, q, "vec_id", "embedding", "label", k=3)
    return out.select("query_id", "neighbor_id", "rank")


@query(
    "embedding_pca_project",
    oracle="""
    SELECT CAST(k AS INT) AS component,
           (SELECT CAST(count(*) AS BIGINT) FROM embeddings) AS n_vectors,
           true AS projector_orthonormal,
           true AS var_ordered,
           true AS mean_centered,
           true AS uncorrelated,
           true AS variance_captured_ok
    FROM range(0, 8) t(k)
    """,
)
def embedding_pca_project(spark: SparkSession, sf: str) -> DataFrame:
    """PCA projection to 8 components: covariance as ONE bounded-key
    aggregation (d(d+1)/2 running sums — keyed by dim pair, never by
    row), eigendecomposition driver-side on the 64×64 matrix (a few
    KB; deterministic sign fix), projection broadcast back into a
    map-only zip_with. Corpus collected never; driver memory O(d²).

    LAPACK's float reductions make the projected VALUES non-replayable
    in DuckDB, and the r5 driver crashed canonicalizing the ArrayType
    proj column — so the registry entry attests the operator through
    PCA's own invariants, each computed over the DISTRIBUTED projection
    output and pinned as a boolean the oracle asserts literally true
    (r5 verdict #1a, the agg_approx_bounds pattern), one row per
    component:

    - var_ordered: empirical var(proj_k) is non-increasing in k
      (projection onto eigenvectors sorted by eigenvalue);
    - mean_centered: |mean(proj_k)| ~ 0 (the projection subtracts the
      same-data mean);
    - uncorrelated: max_j |corr(proj_j, proj_k)| ~ 0 for j != k
      (eigenvectors diagonalize the covariance — THE PCA property);
    - variance_captured_ok: sum_k var(proj_k) / total input variance
      in [out_dim/dim, 1] (top-k eigenvalues each >= the mean
      eigenvalue, and never exceed the trace);
    - projector_orthonormal: comps @ comps.T == I (driver-side check
      of the fitted plan-literal projector itself).

    A broken covariance accumulation, eigh ordering, sign fix, or
    projection expression flips a boolean and breaks the hash match.
    pytest additionally pins orthonormality, variance ordering, and
    reconstruction error on fixtures (tests/test_similarity.py)."""
    import numpy as np

    from graphdbetl_spark.operators.similarity import pca_apply, pca_fit

    out_dim, dim = 8, 64
    e = T(spark, sf, "embeddings").withColumn("embedding", _dvec(F.col("embedding")))
    mu, comps = pca_fit(e, "vec_id", "embedding", dim=dim, out_dim=out_dim)
    ortho = bool(np.allclose(comps @ comps.T, np.eye(out_dim), atol=1e-9))
    proj = pca_apply(e, "vec_id", "embedding", mu, comps)

    flat = proj.select(F.posexplode("proj").alias("component", "value"))
    stats = flat.groupBy("component").agg(
        F.count(F.lit(1)).cast("long").alias("n_vectors"),
        F.avg("value").alias("__mu"),
        (F.avg(F.col("value") * F.col("value"))).alias("__m2"),
    ).withColumn("__var", F.col("__m2") - F.col("__mu") * F.col("__mu"))

    # cross moments E[proj_j * proj_k] for j < k: 28 bounded keys
    xm = (
        proj.select(F.posexplode("proj").alias("j", "__xj"), F.col("proj").alias("__p"))
        .select("j", "__xj", F.posexplode("__p").alias("k", "__xk"))
        .filter(F.col("k") > F.col("j"))
        .groupBy("j", "k")
        .agg(F.avg(F.col("__xj") * F.col("__xk")).alias("__exy"))
    )
    sj = stats.select(F.col("component").alias("j"), F.col("__mu").alias("__muj"),
                      F.col("__var").alias("__varj"))
    sk = stats.select(F.col("component").alias("k"), F.col("__mu").alias("__muk"),
                      F.col("__var").alias("__vark"))
    corr = (
        xm.join(F.broadcast(sj), "j").join(F.broadcast(sk), "k")
        .select(
            "j", "k",
            (
                F.abs(F.col("__exy") - F.col("__muj") * F.col("__muk"))
                / F.sqrt(F.col("__varj") * F.col("__vark"))
            ).alias("__acorr"),
        )
    )
    # fold both directions so every component sees its max |corr|
    per_k_corr = (
        corr.select(F.col("j").alias("component"), "__acorr")
        .unionByName(corr.select(F.col("k").alias("component"), "__acorr"))
        .groupBy("component")
        .agg(F.max("__acorr").alias("__maxcorr"))
    )

    # total input variance (trace of the covariance): d bounded keys
    total_var = (
        e.select(F.posexplode("embedding").alias("i", "__x"))
        .groupBy("i")
        .agg((F.avg(F.col("__x") * F.col("__x"))
              - F.avg("__x") * F.avg("__x")).alias("__v"))
        .agg(F.sum("__v").alias("__total_var"))
    )
    captured = stats.agg(F.sum("__var").alias("__cap"))

    w = Window.orderBy("component")  # 8 rows — single-partition window is fine
    return (
        stats.withColumn("__prev_var", F.lag("__var").over(w))
        .join(F.broadcast(per_k_corr), "component")
        .crossJoin(F.broadcast(total_var))
        .crossJoin(F.broadcast(captured))
        .select(
            F.col("component").cast("int").alias("component"),
            "n_vectors",
            F.lit(ortho).alias("projector_orthonormal"),
            (
                F.col("__prev_var").isNull()
                | (F.col("__var") <= F.col("__prev_var") + F.lit(1e-9))
            ).alias("var_ordered"),
            (F.abs("__mu") < 1e-6).alias("mean_centered"),
            (F.col("__maxcorr") < 1e-6).alias("uncorrelated"),
            (
                (F.col("__cap") / F.col("__total_var")
                 >= F.lit(out_dim / dim) - F.lit(1e-9))
                & (F.col("__cap") / F.col("__total_var") <= F.lit(1.0) + F.lit(1e-9))
            ).alias("variance_captured_ok"),
        )
    )


# ---- md5-deterministic ANN oracles (r5 verdict #1c): the IVF / LSH /
# IVF-PQ registry entries re-point at md5-seeded builds so the whole
# approximate pipeline — candidate restriction included — replays in
# DuckDB (the sim_pq_topk_md5 treatment). The k-means / BRP-LSH builds
# stay as the clustered-corpus quality paths, recall-floor-checked.


def _ivf_md5_ctes(n_cells: int, n_probe: int) -> str:
    """Shared oracle CTEs: unit vectors, md5-sampled coarse cells,
    max-dot assignment (ties to lowest cell), per-query cell probing."""
    return f"""un AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ), u AS (
        SELECT vec_id,
               list_transform(v, x -> x / sqrt(
                   list_reduce(list_transform(v, y -> y * y),
                               (acc, b) -> acc + b))) AS uv
        FROM un
    ), d AS (
        SELECT uv AS cuv,
               row_number() OVER (
                   ORDER BY md5('42:' || CAST(vec_id AS VARCHAR)), vec_id) - 1 AS cell
        FROM u ORDER BY md5('42:' || CAST(vec_id AS VARCHAR)), vec_id LIMIT {n_cells}
    ), dots AS (
        SELECT u.vec_id, d.cell,
               list_reduce(list_transform(range(1, 65),
                           i -> u.uv[i] * d.cuv[i]), (acc, b) -> acc + b) AS dt
        FROM u CROSS JOIN d
    ), asn AS (
        SELECT vec_id, cell FROM (
            SELECT vec_id, cell,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY dt DESC, cell) AS rn
            FROM dots) WHERE rn = 1
    ), probed AS (
        SELECT vec_id AS query_id, cell FROM (
            SELECT vec_id, cell,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY dt DESC, cell) AS rn
            FROM dots WHERE vec_id < 5) WHERE rn <= {n_probe}
    )"""


_SIM_RANK_TAIL = """
    SELECT query_id, neighbor_id, rank FROM (
        SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY s DESC, neighbor_id) AS rank
        FROM scored) WHERE rank <= {k}
    """


def _sim_ivf_md5_oracle(n_cells: int = 8, n_probe: int = 3, k: int = 10) -> str:
    return f"""
    WITH {_ivf_md5_ctes(n_cells, n_probe)}, scored AS (
        SELECT p.query_id, a.vec_id AS neighbor_id,
               list_reduce(list_transform(range(1, 65),
                           i -> q.uv[i] * c.uv[i]), (acc, b) -> acc + b) AS s
        FROM probed p
        JOIN asn a ON a.cell = p.cell AND a.vec_id <> p.query_id
        JOIN u q ON q.vec_id = p.query_id
        JOIN u c ON c.vec_id = a.vec_id
    )
    {_SIM_RANK_TAIL.format(k=k)}"""


def _sim_lsh_md5_oracle(n_planes: int = 8, n_tables: int = 2, k: int = 10) -> str:
    planes = _lsh_hyperplanes(n_planes)
    per_t = n_planes // n_tables
    tbl_cols = ", ".join(
        " + ".join(
            f"(CASE WHEN list_reduce(list_transform(range(1, 65), "
            f"i -> v[i] * (ARRAY{planes[t * per_t + j]})[i]), "
            f"(acc, b) -> acc + b) >= 0 THEN {1 << j} ELSE 0 END)"
            for j in range(per_t)
        )
        + f" AS bk{t}"
        for t in range(n_tables)
    )
    or_cond = " OR ".join(f"q.bk{t} = c.bk{t}" for t in range(n_tables))
    return f"""
    WITH un AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ), u AS (
        SELECT vec_id,
               list_transform(v, x -> x / sqrt(
                   list_reduce(list_transform(v, y -> y * y),
                               (acc, b) -> acc + b))) AS uv
        FROM un
    ), b AS (
        SELECT vec_id, {tbl_cols} FROM un
    ), cand AS (
        SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
        FROM b q JOIN b c ON ({or_cond}) AND c.vec_id <> q.vec_id
        WHERE q.vec_id < 5
    ), scored AS (
        SELECT cand.query_id, cand.neighbor_id,
               list_reduce(list_transform(range(1, 65),
                           i -> q.uv[i] * c.uv[i]), (acc, b) -> acc + b) AS s
        FROM cand JOIN u q ON q.vec_id = cand.query_id
                  JOIN u c ON c.vec_id = cand.neighbor_id
    )
    {_SIM_RANK_TAIL.format(k=k)}"""


def _sim_ivfpq_md5_oracle(
    n_cells: int = 8, n_probe: int = 3, k: int = 10
) -> str:
    # PQ codebook/code/LUT CTEs are the sim_pq_topk_md5 oracle verbatim
    # (dim 64, m=32 subspaces of 2, k_codes=16 donors, seed '42').
    return f"""
    WITH {_ivf_md5_ctes(n_cells, n_probe)}, donors AS (
        SELECT uv,
               row_number() OVER (
                   ORDER BY md5('42:' || CAST(vec_id AS VARCHAR)), vec_id) - 1 AS code
        FROM u ORDER BY md5('42:' || CAST(vec_id AS VARCHAR)), vec_id LIMIT 16
    ), cbh AS (
        SELECT s.j AS sub, code,
               list_transform(range(1, 3), i -> uv[s.j * 2 + i]) AS centroid
        FROM donors, (SELECT unnest(range(0, 32)) AS j) s
    ), cb1 AS (
        SELECT sub,
               list(centroid ORDER BY code) AS cents,
               list(list_reduce(list_transform(centroid, x -> x * x), (a, b) -> a + b) / 2.0
                    ORDER BY code) AS hns
        FROM cbh GROUP BY sub
    ), cbn AS (
        SELECT list(cents ORDER BY sub) AS cb, list(hns ORDER BY sub) AS cn FROM cb1
    ), codes AS (
        SELECT vec_id,
               list_transform(range(0, 32), j ->
                   list_indexof(sm[j + 1], list_max(sm[j + 1])) - 1) AS codes
        FROM (
            SELECT vec_id,
                   list_transform(range(0, 32), j ->
                       list_transform(range(0, 16), c ->
                           uv[j * 2 + 1] * cb[j + 1][c + 1][1]
                           + uv[j * 2 + 2] * cb[j + 1][c + 1][2]
                           - cn[j + 1][c + 1])) AS sm
            FROM u, cbn
        )
    ), ql AS (
        SELECT vec_id AS query_id,
               list_transform(range(0, 32), j ->
                   list_transform(range(0, 16), c ->
                       uv[j * 2 + 1] * cb[j + 1][c + 1][1]
                       + uv[j * 2 + 2] * cb[j + 1][c + 1][2])) AS lut
        FROM u, cbn WHERE vec_id < 5
    ), scored AS (
        SELECT q.query_id, c.vec_id AS neighbor_id,
               list_reduce(list_transform(range(0, 32),
                           j -> q.lut[j + 1][c.codes[j + 1] + 1]),
                           (acc, b) -> acc + b) AS s
        FROM ql q
        JOIN probed p ON p.query_id = q.query_id
        JOIN asn a ON a.cell = p.cell AND a.vec_id <> q.query_id
        JOIN codes c ON c.vec_id = a.vec_id
    )
    {_SIM_RANK_TAIL.format(k=k)}"""


@query("sim_ivf_topk", oracle=_sim_ivf_md5_oracle())
def sim_ivf_topk(spark: SparkSession, sf: str) -> DataFrame:
    """IVF-indexed ANN: coarse cells + n_probe cell scan per query —
    the inverted-file scale path. The registry name points at the
    md5-sampled deterministic coarse quantizer (r5 verdict #1c) so
    cell build, assignment, probing, and ranking all replay in the
    oracle; the k-means build stays as operators/similarity.py
    ivf_cosine_topk, recall-floor-checked (sim_ivf_recall_floor)."""
    from graphdbetl_spark.operators.similarity import ivf_cosine_topk_md5

    e = T(spark, sf, "embeddings").withColumn("embedding", _dvec(F.col("embedding")))
    q = e.filter(F.col("vec_id") < 5)
    return ivf_cosine_topk_md5(e, q, "vec_id", "embedding", k=10)


@query("sim_lsh_topk", oracle=_sim_lsh_md5_oracle())
def sim_lsh_topk(spark: SparkSession, sf: str) -> DataFrame:
    """LSH-bucketed ANN (random-hyperplane projections): candidate
    generation is an equi-join on (table, bucket) — the scale path.
    The registry name points at literal md5-derived ±1 planes with
    2-table OR-amplification (r5 verdict #1c) so buckets, candidates,
    and ranking all replay in the oracle; the
    BucketedRandomProjectionLSH path stays as operators/similarity.py
    lsh_cosine_topk, recall-floor-checked (sim_lsh_recall_floor)."""
    from graphdbetl_spark.operators.similarity import lsh_cosine_topk_md5

    e = T(spark, sf, "embeddings").withColumn("embedding", _dvec(F.col("embedding")))
    q = e.filter(F.col("vec_id") < 5)
    return lsh_cosine_topk_md5(e, q, "vec_id", "embedding", k=10)


# ------------------------------------------------------ text analysis


@query(
    "text_stats",
    oracle="""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(AVG(n_chars), 4) AS avg_chars,
           CAST(SUM(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT) AS total_tokens,
           ROUND(AVG(len(string_split_regex(trim(text), '\\s+'))), 4) AS avg_tokens,
           CAST(MAX(n_chars) AS BIGINT) AS max_chars
    FROM documents GROUP BY lang
    """,
)
def text_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Per-language corpus statistics: document counts, char/token means — the first profiling query on any text corpus."""
    d = T(spark, sf, "documents")
    ntok = token_count(F.col("text"))
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        F.sum(ntok).cast("long").alias("total_tokens"),
        F.round(F.avg(ntok), 4).alias("avg_tokens"),
        F.max("n_chars").alias("max_chars"),
    )


@query(
    "text_quality",
    oracle="""
    WITH t AS (
        SELECT doc_id, length(text) AS n,
               length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS punct,
               string_split_regex(trim(text), '\\s+') AS toks
        FROM documents
    )
    SELECT doc_id, ROUND(
        0.4 * (CASE WHEN n >= 100 AND n <= 20000 THEN 1.0
                    WHEN n > 0 THEN 0.5 ELSE 0.0 END)
      + 0.3 * (1.0 - CASE WHEN n > 0 THEN CAST(punct AS DOUBLE) / n ELSE 1.0 END)
      + 0.3 * (CASE WHEN list_sum(list_transform(toks, t -> length(t))) / len(toks)
                         BETWEEN 3 AND 10 THEN 1.0 ELSE 0.5 END), 4) AS quality
    FROM t
    """,
)
def text_quality(spark: SparkSession, sf: str) -> DataFrame:
    """Heuristic quality scoring: length band + punctuation density +
    mean word length, all whole-stage-codegen expressions."""
    d = T(spark, sf, "documents")
    return d.select("doc_id", quality_score(F.col("text")).alias("quality"))


@query(
    "text_lang_id",
    oracle="""
    WITH s AS (
        SELECT doc_id, lang,
            len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                t -> t IN ('der','die','das','und','ist','nicht','mit','ein'))) AS s_de,
            len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                t -> t IN ('the','and','of','to','in','is','that','with'))) AS s_en,
            len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                t -> t IN ('el','la','los','que','de','es','una','por'))) AS s_es,
            len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                t -> t IN ('le','la','les','des','est','une','dans','que'))) AS s_fr,
            len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                t -> t IN ('的','是','了','在','和','有','我','不'))) AS s_zh
        FROM documents
    )
    SELECT doc_id, lang,
           CASE WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr AND s_de >= s_zh THEN 'de'
                WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
                WHEN s_es >= s_fr AND s_es >= s_zh THEN 'es'
                WHEN s_fr >= s_zh THEN 'fr'
                ELSE 'zh' END AS pred_lang
    FROM s
    """,
)
def text_lang_id(spark: SparkSession, sf: str) -> DataFrame:
    """Marker-lexicon language ID (argmax over per-language hit counts,
    ties to lexicographically-smallest language)."""
    d = T(spark, sf, "documents")
    return d.select("doc_id", "lang", language_id(F.col("text")).alias("pred_lang"))


@query(
    "text_fingerprint",
    oracle="""
    SELECT doc_id,
           CAST(list_reduce(
               list_transform(range(1, length(text) + 1),
                              i -> CAST(ascii(text[i]) AS HUGEINT)),
               (acc, c) -> (acc * 257 + c) % 2305843009213693951::HUGEINT
           ) AS VARCHAR) AS fingerprint
    FROM documents
    """,
)
def text_fingerprint(spark: SparkSession, sf: str) -> DataFrame:
    """Polynomial rolling-hash document fingerprint (mod 2^61-1) —
    the Arrow-kernel form (functions/text.py rolling_fingerprints):
    Python ints replay the decimal(38,0) fold's residues exactly, and
    the interpreted per-character decimal fold cost 61 s per 500k docs
    at the 100× replica. The Column form stays for composition and is
    pinned against this one in tests."""
    from graphdbetl_spark.functions.text import rolling_fingerprints

    d = T(spark, sf, "documents")
    return rolling_fingerprints(d, "text", "doc_id")


@query(
    "text_tokens_portable",
    oracle="""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\\s]'))
                AS BIGINT) AS n_subword_tokens
    FROM documents
    """,
)
def text_tokens_portable(spark: SparkSession, sf: str) -> DataFrame:
    """Subword token-budget proxy in the RE2-compatible regex subset
    (alnum runs, or per-character for CJK/punct) — the oracle replays
    PORTABLE_SUBWORD_PATTERN verbatim, unlike the lookaround-based
    text_tokens below."""
    from graphdbetl_spark.functions.text import portable_subword_token_count

    d = T(spark, sf, "documents")
    return d.select(
        "doc_id",
        portable_subword_token_count(F.col("text")).cast("long").alias("n_subword_tokens"),
    )


@query(
    "text_unigram_logprob",
    oracle="""
    WITH tok AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS tok
        FROM documents
    ), cnt AS (
        SELECT tok, count(*) AS c FROM tok GROUP BY tok
    ), tot AS (
        SELECT CAST(sum(c) AS DOUBLE) AS t FROM cnt
    ), lm AS (
        SELECT tok, log10(c / t) AS lp FROM cnt, tot
    )
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
           round(avg(lp), 6) AS mean_logprob
    FROM tok JOIN lm USING (tok)
    GROUP BY doc_id
    """,
)
def text_unigram_logprob(spark: SparkSession, sf: str) -> DataFrame:
    """CCNet-style LM quality filter signal (Wenzek et al. 2020): mean
    log10 token probability under the corpus's own unigram LM — the
    distributed stand-in for perplexity filtering. Two passes: token
    counts (one partial-agg shuffle), then an AQE-strategied vocab join
    back (see operators/curation.py unigram_logprob)."""
    from graphdbetl_spark.operators.curation import unigram_logprob

    return unigram_logprob(T(spark, sf, "documents"), "text", "doc_id")


@query(
    "text_winnow_fingerprints",
    oracle="""
    WITH t AS (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
        FROM documents
    ), g AS (
        SELECT doc_id,
               list_transform(range(1, greatest(len(toks) - 2, 0) + 1),
                   i -> ('0x' || substr(md5(toks[i] || ' ' || toks[i+1] || ' '
                         || toks[i+2]), 1, 12))::BIGINT) AS gh
        FROM t
    ), w AS (
        SELECT doc_id,
               CASE WHEN len(gh) - 3 >= 1 THEN
                        list_transform(range(1, len(gh) - 2),
                                       i -> list_min(gh[i:i+3]))
                    WHEN len(gh) >= 1 THEN [list_min(gh)]
                    ELSE CAST([] AS BIGINT[]) END AS wins
        FROM g
    )
    SELECT DISTINCT doc_id, fp
    FROM (SELECT doc_id, unnest(wins) AS fp FROM w)
    """,
)
def text_winnow_fingerprints(spark: SparkSession, sf: str) -> DataFrame:
    """Winnowing fingerprints (Schleimer et al. 2003 / MOSS) at word
    3-gram granularity, window 4: per-window minima of md5-family gram
    hashes, distinct per document. Zero shuffle before the final
    explode; the fingerprint SET (not positions) is the matching
    contract — see operators/dedup.py winnow_fingerprints."""
    from graphdbetl_spark.operators.dedup import winnow_fingerprints

    return winnow_fingerprints(T(spark, sf, "documents"), "text", "doc_id", k=3, w=4)


@query(
    "dedup_winnow_pairs",
    oracle="""
    WITH t AS (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
        FROM documents
    ), g AS (
        SELECT doc_id,
               list_transform(range(1, greatest(len(toks) - 2, 0) + 1),
                   i -> ('0x' || substr(md5(toks[i] || ' ' || toks[i+1] || ' '
                         || toks[i+2]), 1, 12))::BIGINT) AS gh
        FROM t
    ), w AS (
        SELECT doc_id,
               CASE WHEN len(gh) - 3 >= 1 THEN
                        list_transform(range(1, len(gh) - 2),
                                       i -> list_min(gh[i:i+3]))
                    WHEN len(gh) >= 1 THEN [list_min(gh)]
                    ELSE CAST([] AS BIGINT[]) END AS wins
        FROM g
    ), fp0 AS (
        SELECT DISTINCT doc_id, fp
        FROM (SELECT doc_id, unnest(wins) AS fp FROM w)
    ), hot AS (
        SELECT fp FROM fp0 GROUP BY fp HAVING count(*) > 10000
    ), fp AS (
        SELECT doc_id, fp FROM fp0 WHERE fp NOT IN (SELECT fp FROM hot)
    ), nfp AS (
        SELECT doc_id, count(*) AS n FROM fp GROUP BY doc_id
    ), shared AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
        FROM fp a JOIN fp b ON a.fp = b.fp AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id HAVING count(*) >= 2
    )
    SELECT id_a, id_b, CAST(n_shared AS BIGINT) AS n_shared,
           round(CAST(n_shared AS DOUBLE) /
                 least(na.n, nb.n), 6) AS containment
    FROM shared
    JOIN nfp na ON na.doc_id = id_a
    JOIN nfp nb ON nb.doc_id = id_b
    """,
)
def dedup_winnow_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """Winnowing-based near-duplicate pairs — MOSS's actual use of the
    fingerprints (Schleimer et al. 2003 §5): documents sharing ≥2
    winnow fingerprints are candidates, scored by fingerprint
    containment (shared / min set size — robust to length asymmetry,
    the plagiarism-detection measure). The inverted-index self-join on
    the fingerprint is the same skew shape as dedup_ngram_jaccard:
    fingerprint density is ~2/(w+1) of the gram count, so the index is
    ~3× smaller than the full inverted gram index for the same recall
    guarantee (any shared run of ≥ w+k-1 tokens)."""
    from graphdbetl_spark.operators.dedup import winnow_fingerprints

    fp = winnow_fingerprints(T(spark, sf, "documents"), "text", "doc_id", k=3, w=4)
    # Four consumer branches (hot, both join sides, nfp) would each
    # re-run the fingerprint kernel; materialize the small (id, fp)
    # table once — lineage-owned localCheckpoint, freed when the
    # caller's DataFrame goes out of scope (the dedup.py r5 idiom).
    fp = fp.localCheckpoint(eager=False)
    # Stop-fingerprint cap (the ngram_jaccard_pairs max_gram_df
    # treatment): a fingerprint held by >10k documents is vocabulary,
    # not content — and its posting list alone fans out >10k²/2 pairs
    # into ONE reducer key. Dropping it bounds per-key pair volume;
    # containment is then computed over the capped fingerprint
    # universe on BOTH engines (the oracle applies the same HAVING).
    # No fixture fingerprint reaches the cap below the 30× replica, so
    # driver-scale results are unchanged.
    hot = (
        fp.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("__df"))
        .filter(F.col("__df") > 10_000)
        .select("fp")
    )
    fp = fp.join(F.broadcast(hot), "fp", "left_anti")
    nfp = fp.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = fp.select(F.col("doc_id").alias("id_a"), F.col("fp").alias("__fa"))
    b = fp.select(F.col("doc_id").alias("id_b"), F.col("fp").alias("__fb"))
    shared = (
        a.join(b, (F.col("__fa") == F.col("__fb")) & (F.col("id_a") < F.col("id_b")))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= 2)
    )
    na = nfp.select(F.col("doc_id").alias("id_a"), F.col("n").alias("__na"))
    nb = nfp.select(F.col("doc_id").alias("id_b"), F.col("n").alias("__nb"))
    return (
        shared.join(na, "id_a")
        .join(nb, "id_b")
        .select(
            "id_a", "id_b", F.col("n_shared").cast("long").alias("n_shared"),
            F.round(
                F.col("n_shared").cast("double") / F.least("__na", "__nb"), 6
            ).alias("containment"),
        )
    )


@query(
    "text_quality_classifier",
    oracle="""
    WITH f AS (
        SELECT doc_id, length(text) AS n,
               length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS punct,
               list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                           t -> t <> '') AS tok
        FROM documents
    ), x AS (
        SELECT doc_id,
               CASE WHEN n > 0 THEN CAST(punct AS DOUBLE) / n ELSE 1.0 END AS punct_ratio,
               CASE WHEN len(tok) > 0 THEN
                   CAST(len(list_filter(tok, t -> t IN
                       ('the','and','of','to','in','is','that','with',
                        'a','for','on','as','it','by','at','from'))) AS DOUBLE)
                   / len(tok) ELSE 0.0 END AS stop_ratio,
               CASE WHEN len(tok) > 0 THEN
                   CAST(list_reduce(list_transform(tok, t -> length(t)),
                                    (a, b) -> a + b) AS DOUBLE) / len(tok)
                   ELSE 0.0 END AS mwl,
               log10(CAST(n AS DOUBLE) + 1.0) AS log_len,
               CASE WHEN len(tok) > 0 THEN
                   CAST(len(tok) - len(list_distinct(tok)) AS DOUBLE) / len(tok)
                   ELSE 0.0 END AS dup_frac
        FROM f
    )
    SELECT doc_id,
           round(1.0 / (1.0 + exp(-(-1.0 - 4.0 * punct_ratio + 3.0 * stop_ratio
                 + 0.2 * mwl + 0.5 * log_len - 2.0 * dup_frac))), 6) AS q_score
    FROM x
    """,
)
def text_quality_classifier(spark: SparkSession, sf: str) -> DataFrame:
    """Model-based quality scoring: logistic regression over five
    portable text features (fastText-classifier operator shape with
    fixed documented weights — see functions/text.py quality_logit).
    Complements the heuristic text_quality band score."""
    from graphdbetl_spark.functions.text import quality_logit

    d = T(spark, sf, "documents")
    return d.select("doc_id", quality_logit(F.col("text")).alias("q_score"))


@query(
    "text_tokens",
    oracle=r"""
    SELECT doc_id,
           CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
                                t -> t <> '')) AS BIGINT) AS ws_tokens,
           CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\s]'))
                AS BIGINT) AS subword_tokens
    FROM documents
    """,
)
def text_tokens(spark: SparkSession, sf: str) -> DataFrame:
    """Token counting two ways: whitespace words and a subword split
    (LLM token-budget proxy). The subword column uses the
    RE2-compatible PORTABLE_SUBWORD_PATTERN (r5 verdict #1b: the
    registry name now points at the portable split so both counts
    replay in the oracle); the lookaround-based BPE-ish split stays as
    functions/text.py bpe_ish_token_count, pytest-covered."""
    from graphdbetl_spark.functions.text import portable_subword_token_count

    d = T(spark, sf, "documents")
    return d.select(
        "doc_id",
        token_count(F.col("text")).cast("long").alias("ws_tokens"),
        portable_subword_token_count(F.col("text")).cast("long").alias("subword_tokens"),
    )


@query(
    "text_tfidf_top_term",
    oracle="""
    WITH tok AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS term
        FROM documents
    ), tf AS (
        SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
        FROM tok GROUP BY doc_id, term
    ), dfreq AS (
        SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
        FROM tok GROUP BY term
    ), n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM documents)
    SELECT doc_id, term AS top_term, ROUND(tfidf, 6) AS tfidf FROM (
        SELECT tf.doc_id, tf.term,
               tf.tf * (ln((n.n_docs + 1) / (dfreq.df + 1)) + 1) AS tfidf,
               ROW_NUMBER() OVER (
                   PARTITION BY tf.doc_id
                   ORDER BY tf.tf * (ln((n.n_docs + 1) / (dfreq.df + 1)) + 1) DESC,
                            tf.term) AS rn
        FROM tf JOIN dfreq USING (term) CROSS JOIN n
    ) WHERE rn = 1
    """,
)
def text_tfidf_top_term(spark: SparkSession, sf: str) -> DataFrame:
    """TF-IDF as pure DataFrame algebra (explode → tf / df aggregations
    → idf join → windowed argmax): oracle-checkable, unlike
    hashed-feature TFIDF.

    100 TB posture: ``n_docs`` is computed in-plan (1-row aggregate,
    broadcast cross join — the ``sample_stratified`` pattern), not via an
    eager driver-side ``count()`` that costs an extra job per call; and
    the tf⋈dfreq join carries NO broadcast hint — dfreq's cardinality is
    the corpus *vocabulary* (billions of terms at scale), so the strategy
    is left to AQE, which broadcasts only when the built side is actually
    small."""
    d = T(spark, sf, "documents")
    tok = d.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tok.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n = d.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    idf = F.log((F.col("n_docs") + 1) / (F.col("df") + 1)) + 1
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n))
        .select("doc_id", "term", (F.col("tf") * idf).alias("tfidf"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("term").alias("top_term"), F.round("tfidf", 6).alias("tfidf"))
    )


@query(
    "bpe_pair_counts",
    oracle="""
    WITH tok AS (
        SELECT unnest(string_split_regex(trim(text), '\\s+')) AS w FROM documents
    ), pairs AS (
        SELECT w[i] AS a, w[i + 1] AS b
        FROM (SELECT string_split(w, '') AS w FROM tok),
             LATERAL (SELECT unnest(range(1, len(w))) AS i)
    )
    SELECT a, b, CAST(COUNT(*) AS BIGINT) AS n
    FROM pairs GROUP BY a, b
    ORDER BY n DESC, a, b LIMIT 50
    """,
)
def bpe_pair_counts(spark: SparkSession, sf: str) -> DataFrame:
    """Adjacent-symbol pair frequencies over word characters — the
    counting step of one BPE merge round (Sennrich et al. 2016), i.e.
    the inner loop of tokenizer training expressed corpus-parallel:
    explode words, explode adjacent char pairs (zip_with of the char
    array against its own tail — O(len), no quadratic slicing), one
    partial-agg shuffle on the pair, top-50 via TakeOrderedAndProject.
    At 100 TB this is exactly how each merge round distributes; the
    driver only ever sees the top pair."""
    d = T(spark, sf, "documents")
    words = d.select(F.explode(F.split(F.trim("text"), r"\s+")).alias("w"))
    chars = F.split("w", "")
    hd = F.slice(chars, 1, F.greatest(F.size(chars) - 1, F.lit(0)))
    tl = F.slice(chars, 2, F.greatest(F.size(chars) - 1, F.lit(0)))
    pairs = words.select(
        F.explode(F.zip_with(hd, tl, lambda x, y: F.struct(x.alias("a"), y.alias("b")))).alias("p")
    ).select("p.a", "p.b")
    return (
        pairs.groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy(F.col("n").desc(), "a", "b")
        .limit(50)
    )


@query(
    "embedding_outliers",
    oracle="""
    WITH v AS (
        SELECT vec_id, label,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ), mu AS (
        SELECT label, i, round(avg(v[i]), 6) AS m
        FROM v, (SELECT unnest(range(1, 65)) AS i)
        GROUP BY label, i
    ), muv AS (
        SELECT label, list(m ORDER BY i) AS mv FROM mu GROUP BY label
    ), d AS (
        SELECT v.vec_id, v.label,
               round(sqrt(list_reduce(list_transform(range(1, 65),
                   i -> (v.v[i] - muv.mv[i]) * (v.v[i] - muv.mv[i])),
                   (a, b) -> a + b)), 6) AS dist
        FROM v JOIN muv USING (label)
    )
    SELECT vec_id, label, dist, CAST(rn AS INT) AS rn FROM (
        SELECT vec_id, label, dist,
               ROW_NUMBER() OVER (PARTITION BY label
                                  ORDER BY dist DESC, vec_id) AS rn
        FROM d
    ) WHERE rn <= 5
    """,
)
def embedding_outliers(spark: SparkSession, sf: str) -> DataFrame:
    """Per-label embedding outliers — the corpus-cleaning signal for
    mislabeled/garbage vectors: distance to the label centroid, top-5
    farthest members per label. Centroids aggregate on (label × dim)
    keys (skew-proof, the embedding_centroids shape), round to 6
    decimals so the distance — and therefore the ranking — is
    bit-deterministic across engines, then one WindowGroupLimit-pruned
    top-k per label. No stddev in the contract: rank-based outliers
    avoid cross-engine float-moment divergence entirely."""
    e = T(spark, sf, "embeddings")
    v = e.select("vec_id", "label", _dvec(F.col("embedding")).alias("v"))
    mu = (
        v.select("label", F.posexplode("v").alias("i", "__x"))
        .groupBy("label", "i")
        .agg(F.round(F.avg("__x"), 6).alias("m"))
        .groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("i", "m"))).alias("__im"))
        .select("label", F.col("__im.m").alias("mv"))
    )
    diff = F.zip_with("v", "mv", lambda x, m: (x - m) * (x - m))
    dist = F.round(
        F.sqrt(F.aggregate(diff, F.lit(0.0), lambda a, b: a + b)), 6
    )
    d = v.join(F.broadcast(mu), "label").select("vec_id", "label", dist.alias("dist"))
    w = Window.partitionBy("label").orderBy(F.col("dist").desc(), "vec_id")
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("vec_id", "label", "dist", F.col("rn").cast("int").alias("rn"))
    )


@query(
    "curation_c4_filter",
    oracle="""
    WITH f AS (
        SELECT doc_id, length(text) AS n,
               length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS punct,
               list_filter(string_split_regex(trim(text), '\\s+'), t -> t <> '') AS tok
        FROM documents
    ), x AS (
        SELECT doc_id,
               len(tok) AS n_tok,
               n,
               CASE WHEN n > 0 THEN CAST(punct AS DOUBLE) / n ELSE 1.0 END AS punct_ratio,
               CASE WHEN len(tok) > 0 THEN
                   CAST(list_sum(list_transform(tok, t -> length(t))) AS DOUBLE) / len(tok)
               ELSE 0.0 END AS mwl,
               CASE WHEN len(tok) > 1 THEN
                   CAST(len(tok) - 1 - len(list_distinct(list_transform(
                       range(1, len(tok)), i -> tok[i] || ' ' || tok[i + 1]))) AS DOUBLE)
                   / (len(tok) - 1)
               ELSE 0.0 END AS dup_bigram_frac
        FROM f
    )
    SELECT doc_id,
           CASE WHEN n_tok < 5 THEN 'too_few_tokens'
                WHEN n > 20000 THEN 'too_long'
                WHEN mwl < 3.0 OR mwl > 10.0 THEN 'word_length'
                WHEN punct_ratio >= 0.3 THEN 'punctuation'
                WHEN dup_bigram_frac >= 0.5 THEN 'repetition'
                ELSE 'ok' END AS reason,
           (n_tok >= 5 AND n <= 20000 AND mwl >= 3.0 AND mwl <= 10.0
            AND punct_ratio < 0.3 AND dup_bigram_frac < 0.5) AS keep
    FROM x
    """,
)
def curation_c4_filter(spark: SparkSession, sf: str) -> DataFrame:
    """C4-style composite rule filter (Raffel et al. 2020 cleaning
    rules, re-expressed as one codegen projection): token count,
    length cap, mean word length band, punctuation density, duplicate
    bigram fraction — each document gets keep + the FIRST failing
    rule as the audit reason. Zero shuffle; rules evaluate in the
    scan."""
    from graphdbetl_spark.functions.text import tokens

    d = T(spark, sf, "documents")
    n = F.length("text")
    punct = n - F.length(F.regexp_replace("text", r"[\p{Punct}]", ""))
    punct_ratio = F.when(n > 0, punct / n).otherwise(F.lit(1.0))
    tok = tokens(F.col("text"))
    n_tok = F.size(tok)
    mwl = F.when(
        n_tok > 0,
        F.aggregate(tok, F.lit(0), lambda a, t: a + F.length(t))
        .cast("double") / n_tok,
    ).otherwise(F.lit(0.0))
    m = F.greatest(n_tok - 1, F.lit(0))
    bigrams = F.zip_with(
        F.slice(tok, 1, m), F.slice(tok, 2, m),
        lambda x, y: F.concat(x, F.lit(" "), y),
    )
    dup_bf = F.when(
        n_tok > 1,
        (m - F.size(F.array_distinct(bigrams))).cast("double") / m,
    ).otherwise(F.lit(0.0))
    keep = (
        (n_tok >= 5) & (n <= 20000) & (mwl >= 3.0) & (mwl <= 10.0)
        & (punct_ratio < 0.3) & (dup_bf < 0.5)
    )
    reason = (
        F.when(n_tok < 5, "too_few_tokens")
        .when(n > 20000, "too_long")
        .when((mwl < 3.0) | (mwl > 10.0), "word_length")
        .when(punct_ratio >= 0.3, "punctuation")
        .when(dup_bf >= 0.5, "repetition")
        .otherwise("ok")
    )
    return d.select("doc_id", reason.alias("reason"), keep.alias("keep"))


# ---- BPE trajectory oracles (r5 verdict #1d): BPE with deterministic
# tie-breaks is exactly replayable, so the k-round learn loop unrolls
# into DuckDB CTEs (the train_quality_classifier treatment). The greedy
# left-to-right merge fold is replayed with a delimiter encoding: each
# word becomes D<sym>DD<sym>D... (D = \x1f, absent from the ASCII
# corpus and from any merged symbol), and one merge (l, r) is ONE
# left-to-right non-overlapping replace of D<l>DD<r>D with D<lr>D —
# exactly the fold's semantics (the replacement is never rescanned,
# matching the fold's no-remerge-within-a-pass behavior).
_BPE_D = "\x1f"


def _bpe_sym_sql(word_expr: str) -> str:
    """Delimited symbol string of a word's character sequence."""
    d, dd = _BPE_D, _BPE_D * 2
    return (
        f"'{d}' || array_to_string(list_transform(range(1, length({word_expr}) + 1), "
        f"i -> substring({word_expr}, i, 1)), '{dd}') || '{d}'"
    )


def _bpe_pairs_cte(i: int) -> str:
    """Pair counts + argmax (ties to lexicographically smallest pair —
    the Spark orderBy(cnt desc, l, r) tie-break) for round ``i``."""
    d, dd = _BPE_D, _BPE_D * 2
    return f"""p{i} AS (
        SELECT string_split(pr, '{dd}')[1] AS l, string_split(pr, '{dd}')[2] AS r,
               SUM(freq) AS cnt
        FROM (
            SELECT freq, unnest(list_transform(range(1, len(syms)),
                         x -> syms[x] || '{dd}' || syms[x+1])) AS pr
            FROM (SELECT freq, string_split(trim(s, '{d}'), '{dd}') AS syms
                  FROM s{i})
        ) GROUP BY 1, 2
    )"""


def _bpe_base_ctes() -> str:
    return f"""w0 AS (
        SELECT w, CAST(COUNT(*) AS BIGINT) AS freq FROM (
            SELECT unnest(string_split_regex(trim(text), '\\s+')) AS w
            FROM documents)
        WHERE w <> '' GROUP BY w
    ), s0 AS (
        SELECT freq, {_bpe_sym_sql('w')} AS s FROM w0
    )"""


def _bpe_learn_ctes(k: int) -> str:
    """CTE chain replaying k single-merge rounds: s0, (p_i, m_i, s_i+1)*."""
    d, dd = _BPE_D, _BPE_D * 2
    parts = [_bpe_base_ctes()]
    for i in range(k):
        parts.append(_bpe_pairs_cte(i))
        parts.append(f"m{i} AS (SELECT l, r FROM p{i} ORDER BY cnt DESC, l, r LIMIT 1)")
        parts.append(
            f"""s{i + 1} AS (
        SELECT freq, replace(s, '{d}' || m.l || '{dd}' || m.r || '{d}',
                                '{d}' || m.l || m.r || '{d}') AS s
        FROM s{i}, m{i} m
    )"""
        )
    return ",\n    ".join(parts)


def _bpe_learn_oracle(k: int) -> str:
    rows = "\n    UNION ALL ".join(
        f'SELECT CAST({i} AS INT) AS rank, l AS "left", r AS "right", '
        f"l || r AS merged FROM m{i}"
        for i in range(k)
    )
    return f"WITH {_bpe_learn_ctes(k)}\n    {rows}"


def _bpe_tokenize_oracle(k: int) -> str:
    d, dd = _BPE_D, _BPE_D * 2
    enc = _bpe_sym_sql("w")
    for i in range(k):
        enc = (
            f"replace({enc}, '{d}' || m{i}.l || '{dd}' || m{i}.r || '{d}', "
            f"'{d}' || m{i}.l || m{i}.r || '{d}')"
        )
    froms = ", ".join(f"m{i}" for i in range(k))
    return f"""WITH {_bpe_learn_ctes(k)},
    docs AS (
        SELECT doc_id,
               list_filter(string_split_regex(trim(text), '\\s+'),
                           t -> t <> '') AS toks
        FROM documents
    ), ex AS (SELECT doc_id, unnest(toks) AS w FROM docs),
    enc AS (
        SELECT doc_id,
               len(string_split(trim({enc}, '{d}'), '{dd}')) AS n_sub
        FROM ex, {froms}
    ), agg AS (SELECT doc_id, SUM(n_sub) AS n_subwords FROM enc GROUP BY doc_id)
    SELECT d.doc_id,
           CAST(len(d.toks) AS BIGINT) AS n_words,
           CAST(COALESCE(a.n_subwords, 0) AS BIGINT) AS n_subwords
    FROM docs d LEFT JOIN agg a USING (doc_id)"""


def _bpe_batched_learn_oracle(k: int, m: int) -> str:
    """Unrolled replay of the batched learner (batch_m=m): per round,
    rank the top 4m+1 candidate pairs (the exact rows the Spark driver
    collects) and greedily select up to m CONFLICT-FREE pairs — slot j
    takes the minimum-rank candidate whose {l, r, merged} symbols are
    disjoint from every earlier slot's — then apply the batch's
    rewrites in slot order. Assumes each round fills all m slots
    (natural text far from exhaustion always does; if a corpus ever
    under-fills a round the Spark loop re-plans and this static unroll
    mismatches loudly rather than silently)."""
    d, dd = _BPE_D, _BPE_D * 2
    impossible = _BPE_D * 3  # DDD never occurs: symbols are non-empty
    rounds = k // m
    assert rounds * m == k, "static unroll needs full rounds"
    parts = [_bpe_base_ctes()]
    for i in range(rounds):
        parts.append(_bpe_pairs_cte(i))
        parts.append(
            f"""cand{i} AS (
        SELECT l, r, l || r AS mg,
               row_number() OVER (ORDER BY cnt DESC, l, r) AS rk
        FROM p{i} ORDER BY cnt DESC, l, r LIMIT {4 * m + 1}
    )"""
        )
        for j in range(m):
            if j == 0:
                parts.append(
                    f"b{i}_0 AS (SELECT l, r, mg, rk FROM cand{i} ORDER BY rk LIMIT 1)"
                )
            else:
                conds = " AND ".join(
                    f"c.{col} NOT IN (x{p}.l, x{p}.r, x{p}.mg)"
                    for p in range(j)
                    for col in ("l", "r", "mg")
                )
                froms = ", ".join(f"b{i}_{p} x{p}" for p in range(j))
                parts.append(
                    f"""b{i}_{j} AS (
        SELECT c.l, c.r, c.mg, c.rk FROM cand{i} c, {froms}
        WHERE {conds}
        ORDER BY c.rk LIMIT 1
    )"""
                )
        if i < rounds - 1:
            rewrite = "s"
            for j in range(m):
                rewrite = (
                    f"replace({rewrite}, "
                    f"COALESCE((SELECT '{d}' || l || '{dd}' || r || '{d}' "
                    f"FROM b{i}_{j}), '{impossible}'), "
                    f"COALESCE((SELECT '{d}' || l || r || '{d}' FROM b{i}_{j}), ''))"
                )
            parts.append(
                f"s{i + 1} AS (SELECT freq, {rewrite} AS s FROM s{i})"
            )
    rows = "\n    UNION ALL ".join(
        f'SELECT CAST({i * m + j} AS INT) AS rank, l AS "left", r AS "right", '
        f"mg AS merged FROM b{i}_{j}"
        for i in range(rounds)
        for j in range(m)
    )
    return f"WITH {',{nl}    '.format(nl=chr(10)).join(parts)}\n    {rows}"


@query("bpe_learn_merges", oracle=_bpe_learn_oracle(5))
def bpe_learn_merges_q(spark: SparkSession, sf: str) -> DataFrame:
    """First 5 BPE merge rules learned from the corpus — the full
    tokenizer-training loop (Sennrich et al. 2016), not just one
    round's counting: per round, pair counts aggregate distributed,
    the arg-max pair is the ONLY row the driver sees, and the greedy
    left-to-right rewrite folds over vocabulary symbol arrays
    (operators/curation.py bpe_learn_merges). Deterministic tie-breaks
    make the whole trajectory replayable: the oracle unrolls all 5
    rounds in CTEs (r5 verdict #1d); pytest additionally pins the
    sequence against a pure-Python reference."""
    from graphdbetl_spark.operators.curation import bpe_learn_merges

    merges = bpe_learn_merges(T(spark, sf, "documents"), "text", k_merges=5)
    return spark.createDataFrame(
        merges, "rank int, left string, right string, merged string"
    )


@query("bpe_learn_merges_batched", oracle=_bpe_batched_learn_oracle(8, 4))
def bpe_learn_merges_batched_q(spark: SparkSession, sf: str) -> DataFrame:
    """The SCALE LEVER of the BPE learner, driver-attested (r5 verdict
    #4): batch_m=4 applies up to 4 conflict-free merges per driver
    round (disjoint symbol sets commute, so one rewrite pass applies
    the batch), cutting the driver round count to k/4 — 8 merges in 2
    rounds here. The oracle replays the ranked candidate collection,
    the greedy conflict-free slot selection, and the batched rewrites
    round by round."""
    from graphdbetl_spark.operators.curation import bpe_learn_merges

    merges = bpe_learn_merges(
        T(spark, sf, "documents"), "text", k_merges=8, batch_m=4
    )
    return spark.createDataFrame(
        merges, "rank int, left string, right string, merged string"
    )


@query("bpe_tokenize_corpus", oracle=_bpe_tokenize_oracle(5))
def bpe_tokenize_corpus(spark: SparkSession, sf: str) -> DataFrame:
    """End-to-end tokenizer story: learn the first 5 BPE merges from
    the corpus, then apply them back over every document — per-doc
    word and subword budgets, the numbers a dataloader consumes. The
    merge table is a plan literal at apply time (how a trained
    tokenizer ships to a tokenization job); apply is a zero-shuffle
    scan projection. The oracle replays learn AND apply (the greedy
    fold as delimiter-encoded replaces); pytest pins both against a
    pure-Python reference."""
    from graphdbetl_spark.operators.curation import (
        bpe_apply_merges,
        bpe_learn_merges,
    )

    d = T(spark, sf, "documents")
    merges = bpe_learn_merges(d, "text", k_merges=5)
    return bpe_apply_merges(d, "text", "doc_id", merges)


# ------------------------------------------------- sampling / packing


@query(
    "split_train_test",
    oracle="""
    SELECT doc_id,
           CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 < 10
                THEN 'test' ELSE 'train' END AS split
    FROM documents
    """,
)
def split_train_test(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic hash-based train/test split (10% test): membership
    is a pure function of doc_id — reproducible across engines, runs,
    and partitionings, unlike RNG sampling."""
    from graphdbetl_spark.operators.sampling import train_test_split

    return train_test_split(T(spark, sf, "documents"), "doc_id", test_pct=10).select(
        "doc_id", "split"
    )


@query(
    "split_group_aware",
    oracle="""
    SELECT doc_id, source,
           CASE WHEN ('0x' || substr(md5(source), 1, 8))::BIGINT % 100 < 10
                THEN 'test' ELSE 'train' END AS split
    FROM documents
    """,
)
def split_group_aware(spark: SparkSession, sf: str) -> DataFrame:
    """Leakage-safe split: hash the GROUP key (source/domain), not the
    document id, so near-duplicate documents from one domain can never
    straddle train and test — the contamination mode a per-doc split
    invites (Lee et al. 2022 §6). Same deterministic md5-bucket
    mechanics as split_train_test; zero shuffles (the split is a pure
    projection of the group column)."""
    from graphdbetl_spark.operators.sampling import train_test_split

    d = T(spark, sf, "documents").select("doc_id", "source")
    return train_test_split(d, "source", test_pct=10).select("doc_id", "source", "split")


@query(
    "sample_stratified",
    oracle="""
    SELECT doc_id, lang FROM documents
    WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100
          < CASE lang WHEN 'en' THEN 50 WHEN 'de' THEN 30 ELSE 10 END
    """,
)
def sample_stratified(spark: SparkSession, sf: str) -> DataFrame:
    """Per-language deterministic mixture downsampling (en 50%, de 30%,
    others 10%) — corpus re-weighting by hash bucket."""
    from graphdbetl_spark.operators.sampling import stratified_hash_sample

    d = T(spark, sf, "documents")
    rates = {"en": 50, "de": 30, "es": 10, "fr": 10, "zh": 10}
    return stratified_hash_sample(d, "doc_id", "lang", rates).select("doc_id", "lang")


@query(
    "pack_sequences",
    oracle="""
    WITH sized AS (
        SELECT doc_id,
               CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens
        FROM documents
    )
    SELECT doc_id, n_tokens,
           CAST(floor(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 2048)
                AS BIGINT) AS pack_id
    FROM sized
    """,
)
def pack_sequences_q(spark: SparkSession, sf: str) -> DataFrame:
    """Greedy sequential sequence packing into 2048-token budgets —
    (doc_id, n_tokens, pack_id) for LLM batch assembly."""
    from graphdbetl_spark.operators.sampling import pack_sequences

    d = T(spark, sf, "documents").select(
        "doc_id", tokens(F.col("text")).alias("toks")
    ).select("doc_id", F.size("toks").cast("long").alias("n_tokens"))
    return pack_sequences(d, "doc_id", F.col("n_tokens"), budget=2048)


# -------------------------------------------------------- multimodal


@query(
    "multimodal_features",
    oracle="""
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_bytes,
           printf('%.4f', list_sum(list_transform(range(1, length(text) + 1),
                  i -> CAST(ascii(text[i]) AS DOUBLE))) / length(text)) AS byte_mean
    FROM documents
    """,
)
def multimodal_features(spark: SparkSession, sf: str) -> DataFrame:
    """Binary-payload feature extraction via Arrow mapInPandas: the
    multimodal plumbing (binary column + metadata struct + batched
    Python stage) with a deterministic fake feature; see
    multimodal_decode for the REAL decode path."""
    d = attach_media_columns(T(spark, sf, "documents"), "text")
    return extract_features(d, "payload", "doc_id")


@query(
    "multimodal_decode",
    oracle="""
    WITH px AS (
        SELECT d.doc_id, x.x, y.y
        FROM documents d
        CROSS JOIN generate_series(0, 7) x(x)
        CROSS JOIN generate_series(0, 5) y(y)
    )
    SELECT doc_id, 'ppm' AS format, 8 AS width, 6 AS height,
           CAST(SUM((doc_id * 31 + x * 7 + y * 13) % 256) AS BIGINT) AS sum_r,
           CAST(SUM((doc_id * 17 + x * 5 + y * 11) % 256) AS BIGINT) AS sum_g,
           CAST(SUM((doc_id * 29 + x * 3 + y * 19) % 256) AS BIGINT) AS sum_b
    FROM px GROUP BY doc_id
    """,
)
def multimodal_decode(spark: SparkSession, sf: str) -> DataFrame:
    """REAL image decode end to end: per doc, an encoded binary PPM
    payload (deterministic pixel pattern) is built, parsed back by the
    pure-Python decoder, and reduced to decoded dimensions + exact
    per-channel pixel sums — all inside Arrow-batched mapInPandas
    stages. The oracle recomputes the pixel sums from the generating
    formula, so a header mis-parse, stride bug, or channel swap in
    encode OR decode breaks the hash match."""
    from graphdbetl_spark.operators.multimodal import attach_synthetic_images, decode_features

    d = attach_synthetic_images(T(spark, sf, "documents"), "doc_id", width=8, height=6, fmt="ppm")
    return decode_features(d, "payload", "doc_id")


@query(
    "dedup_image_ahash",
    oracle="""
    WITH px AS (
        SELECT d.doc_id, y.y * 8 + x.x AS p,
               (((d.doc_id % 50) * 31 + x.x * 7 + y.y * 13) % 256
                + ((d.doc_id % 50) * 17 + x.x * 5 + y.y * 11) % 256
                + ((d.doc_id % 50) * 29 + x.x * 3 + y.y * 19) % 256) // 3 AS g
        FROM documents d
        CROSS JOIN generate_series(0, 7) x(x)
        CROSS JOIN generate_series(0, 5) y(y)
    ), tot AS (
        SELECT doc_id, SUM(g) AS sg FROM px GROUP BY doc_id
    ), hs AS (
        SELECT px.doc_id,
               CAST(SUM(CASE WHEN px.g * 48 > t.sg
                             THEN (CAST(1 AS BIGINT) << px.p) ELSE 0 END)
                    AS BIGINT) AS ahash
        FROM px JOIN tot t USING (doc_id)
        GROUP BY px.doc_id
    )
    SELECT ahash, MIN(doc_id) AS keep_id, CAST(COUNT(*) AS BIGINT) AS dup_count
    FROM hs GROUP BY ahash
    """,
)
def dedup_image_ahash(spark: SparkSession, sf: str) -> DataFrame:
    """Image dedup through the REAL decode path: a duplicate-image
    corpus (pixel pattern keyed by doc_id % 50, so each image occurs
    ~n/50 times under distinct ids) is encoded to PPM, decoded back,
    perceptual-average-hashed (integer-only, engine-exact), and
    deduped with one groupBy on the 8-byte hash — dedup_exact's cost
    model applied to images, with encode→decode→hash all replayed from
    the generating formula by the oracle. See
    operators/multimodal.py ahash_features."""
    from graphdbetl_spark.operators.multimodal import (
        ahash_features,
        attach_synthetic_images_keyed,
    )

    d = T(spark, sf, "documents").select(
        "doc_id", (F.col("doc_id") % 50).alias("img_key")
    )
    imgs = attach_synthetic_images_keyed(d, "doc_id", "img_key", width=8, height=6)
    return (
        ahash_features(imgs, "payload", "doc_id")
        .groupBy("ahash")
        .agg(
            F.min("doc_id").alias("keep_id"),
            F.count(F.lit(1)).cast("long").alias("dup_count"),
        )
    )


@query(
    "dedup_image_hamming",
    oracle="""
    WITH ts AS (
        SELECT d.doc_id, y.y * 8 + x.x AS p,
               ((d.doc_id // 10) * 40503 + (y.y * 8 + x.x) * 9973 + 12345) % 65536 AS tr,
               ((d.doc_id // 10) * 31727 + (y.y * 8 + x.x) * 8191 + 54321) % 65536 AS tg,
               ((d.doc_id // 10) * 28657 + (y.y * 8 + x.x) * 7919 + 11111) % 65536 AS tb
        FROM documents d
        CROSS JOIN generate_series(0, 7) x(x)
        CROSS JOIN generate_series(0, 5) y(y)
    ), px AS (
        SELECT doc_id, p,
               (((tr * tr) // 256) % 256
                + CASE WHEN p = doc_id % 10 THEN 120 ELSE 0 END) % 256
               + ((tg * tg) // 256) % 256
               + ((tb * tb) // 256) % 256 AS rgb3
        FROM ts
    ), pxg AS (
        SELECT doc_id, p, rgb3 // 3 AS g FROM px
    ), tot AS (
        SELECT doc_id, SUM(g) AS sg FROM pxg GROUP BY doc_id
    ), hs AS (
        SELECT pxg.doc_id,
               CAST(SUM(CASE WHEN pxg.g * 48 > t.sg
                             THEN (CAST(1 AS BIGINT) << pxg.p) ELSE 0 END)
                    AS BIGINT) AS ahash
        FROM pxg JOIN tot t USING (doc_id)
        GROUP BY pxg.doc_id
    ), bands AS (
        SELECT doc_id, ahash, b.b,
               (ahash >> (b.b * 12)) & 4095 AS bh
        FROM hs CROSS JOIN generate_series(0, 3) b(b)
    ), cand AS (
        SELECT DISTINCT a.doc_id AS id_a, a.ahash AS ha,
                        c.doc_id AS id_b, c.ahash AS hb
        FROM bands a JOIN bands c
          ON a.b = c.b AND a.bh = c.bh AND a.doc_id < c.doc_id
    )
    SELECT id_a, id_b, CAST(bit_count(xor(ha, hb)) AS INT) AS hamming
    FROM cand
    WHERE bit_count(xor(ha, hb)) <= 6
    """,
)
def dedup_image_hamming(spark: SparkSession, sf: str) -> DataFrame:
    """Image NEAR-dup pairs at scale: 48-bit average hashes banded into
    4×12-bit slices; candidate pairs are band-bucket equi-join matches
    (a pair is found iff at least one band carries zero differing
    bits — pigeonhole guarantees that for Hamming ≤ 3, and recall
    stays high through 6 because differing bits rarely spread one-per-
    band), then verified with bit_count(XOR) — a codegen'd integer op.
    The pair space is banded, never all-pairs: the SimHash banding
    construction applied to perceptual hashes. Complements
    dedup_image_ahash (exact-equal tier). The fixture is scale-honest:
    near-dup clusters are FIXED at 10 docs (doc_id//10 picks an
    effectively independent hash-mixed base image; doc_id%10 perturbs
    one pixel, so within-cluster copies are Hamming-close, not
    byte-identical) — pair output and per-bucket join work stay linear
    in the corpus, unlike a fixed-modulus key whose clusters grow with
    n (the r2 embedding-block lesson). Oracle replays hashing, banding,
    and verification from the generating formula."""
    from graphdbetl_spark.operators.multimodal import (
        ahash_features,
        attach_synthetic_image_clusters,
    )

    d = T(spark, sf, "documents").select("doc_id")
    hs = ahash_features(
        attach_synthetic_image_clusters(d, "doc_id"), "payload", "doc_id"
    )
    band_structs = [
        F.struct(
            F.lit(b).alias("b"),
            F.shiftright(F.col("ahash"), b * 12).bitwiseAND(F.lit(4095)).alias("bh"),
        )
        for b in range(4)
    ]
    bands = hs.select(
        "doc_id", "ahash", F.explode(F.array(*band_structs)).alias("bk")
    ).select("doc_id", "ahash", F.col("bk.b").alias("b"), F.col("bk.bh").alias("bh"))
    a, c = bands.alias("a"), bands.alias("c")
    ham = F.bit_count(F.col("a.ahash").bitwiseXOR(F.col("c.ahash")))
    return (
        a.join(
            c,
            (F.col("a.b") == F.col("c.b"))
            & (F.col("a.bh") == F.col("c.bh"))
            & (F.col("a.doc_id") < F.col("c.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("c.doc_id").alias("id_b"),
            ham.cast("int").alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= 6)
    )


@query(
    "dedup_audio_fingerprint",
    oracle="""
    WITH s AS (
        SELECT d.doc_id, i.i,
               ABS((((d.doc_id % 40) * 31 + 1) * (i.i + 1) * 2654435761) % 65536
                   - 32768) AS a
        FROM documents d CROSS JOIN generate_series(0, 479) i(i)
    ), ch AS (
        SELECT doc_id, CAST(i // 24 AS INT) AS c, SUM(a) AS e
        FROM s GROUP BY doc_id, i // 24
    ), delta AS (
        SELECT doc_id, c, e,
               lag(e) OVER (PARTITION BY doc_id ORDER BY c) AS pe
        FROM ch
    ), fpd AS (
        SELECT doc_id,
               CAST(SUM(CASE WHEN e > pe
                             THEN (CAST(1 AS BIGINT) << (c - 1)) ELSE 0 END)
                    AS BIGINT) AS afp
        FROM delta WHERE c >= 1 GROUP BY doc_id
    ), fp AS (
        -- left join back to the doc set: a clip with a single energy
        -- window (n_samples <= chunk) has no c >= 1 delta rows, and the
        -- engine emits afp = 0 for it rather than dropping it
        SELECT d.doc_id, COALESCE(f.afp, 0) AS afp
        FROM documents d LEFT JOIN fpd f USING (doc_id)
    )
    SELECT afp, MIN(doc_id) AS keep_id, CAST(COUNT(*) AS BIGINT) AS dup_count
    FROM fp GROUP BY afp
    """,
)
def dedup_audio_fingerprint(spark: SparkSession, sf: str) -> DataFrame:
    """Audio dedup through the REAL WAV decode path: a duplicate-audio
    corpus (PCM pattern keyed doc_id % 40) is RIFF-encoded, decoded
    back, energy-delta fingerprinted (per-24-sample window energies,
    bit = strictly-rising transition — all integer), and deduped with
    one groupBy on the packed fingerprint. The oracle replays
    encode→decode→chunk→fingerprint from the generating formula. See
    operators/multimodal.py audio_fingerprint_features."""
    from graphdbetl_spark.operators.multimodal import (
        attach_synthetic_audio_keyed,
        audio_fingerprint_features,
    )

    d = T(spark, sf, "documents").select(
        "doc_id", (F.col("doc_id") % 40).alias("aud_key")
    )
    wavs = attach_synthetic_audio_keyed(d, "doc_id", "aud_key", n_samples=480)
    return (
        audio_fingerprint_features(wavs, "payload", "doc_id", chunk=24)
        .groupBy("afp")
        .agg(
            F.min("doc_id").alias("keep_id"),
            F.count(F.lit(1)).cast("long").alias("dup_count"),
        )
    )


@query(
    "dedup_video_signature",
    oracle="""
    WITH px AS (
        SELECT d.doc_id, f.f, y.y * 8 + x.x AS p,
               ((((d.doc_id % 30) * 1000 + f.f) * 31 + x.x * 7 + y.y * 13) % 256
                + (((d.doc_id % 30) * 1000 + f.f) * 17 + x.x * 5 + y.y * 11) % 256
                + (((d.doc_id % 30) * 1000 + f.f) * 29 + x.x * 3 + y.y * 19) % 256)
               // 3 AS g
        FROM documents d
        CROSS JOIN generate_series(0, 7) f(f)
        CROSS JOIN generate_series(0, 7) x(x)
        CROSS JOIN generate_series(0, 5) y(y)
    ), tot AS (
        SELECT doc_id, f, SUM(g) AS sg FROM px GROUP BY doc_id, f
    ), hs AS (
        SELECT px.doc_id, px.f,
               SUM(CASE WHEN px.g * 48 > t.sg
                        THEN (CAST(1 AS BIGINT) << px.p) ELSE 0 END) AS h
        FROM px JOIN tot t USING (doc_id, f)
        GROUP BY px.doc_id, px.f
    ), sig AS (
        SELECT doc_id,
               md5(string_agg(CAST(h AS VARCHAR), ',' ORDER BY f)) AS vsig
        FROM hs GROUP BY doc_id
    )
    SELECT vsig, MIN(doc_id) AS keep_id, CAST(COUNT(*) AS BIGINT) AS dup_count
    FROM sig GROUP BY vsig
    """,
)
def dedup_video_signature(spark: SparkSession, sf: str) -> DataFrame:
    """Video dedup through the REAL demux+decode path: duplicate clips
    (frame patterns keyed doc_id % 30) are demuxed frame by frame,
    each frame integer-average-hashed, and the ORDER-SENSITIVE md5 of
    the hash sequence is the clip signature — reordered/truncated
    clips sign differently, unlike a commutative fold. One groupBy on
    the signature dedups; the oracle replays frame hashing and the
    sequence digest from the generating formula. See
    operators/multimodal.py video_signature_features."""
    from graphdbetl_spark.operators.multimodal import (
        attach_synthetic_video_keyed,
        video_signature_features,
    )

    d = T(spark, sf, "documents").select(
        "doc_id", (F.col("doc_id") % 30).alias("vid_key")
    )
    vids = attach_synthetic_video_keyed(d, "doc_id", "vid_key", n_frames=8)
    return (
        video_signature_features(vids, "payload", "doc_id")
        .groupBy("vsig")
        .agg(
            F.min("doc_id").alias("keep_id"),
            F.count(F.lit(1)).cast("long").alias("dup_count"),
        )
    )


@query(
    "dedup_cluster_keep_best",
    oracle="""
    WITH RECURSIVE pairs AS (
        WITH t AS (SELECT doc_id, lang, string_split_regex(trim(text), '\\s+') AS toks
                   FROM documents),
        g AS (SELECT doc_id, lang,
                list_distinct(list_transform(range(1, greatest(len(toks) - 2, 0) + 1),
                    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS grams
              FROM t),
        e0 AS (SELECT doc_id, lang, unnest(grams) AS gram FROM g),
        eh AS (SELECT doc_id, lang,
                      ('0x' || substr(md5(gram), 1, 15))::BIGINT AS gh FROM e0),
        gdf AS (SELECT gh FROM eh GROUP BY gh HAVING COUNT(*) > 10000),
        e AS (SELECT doc_id, lang, gh, COUNT(*) OVER (PARTITION BY doc_id) AS gc
              FROM eh WHERE gh NOT IN (SELECT gh FROM gdf))
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM e a JOIN e b ON a.gh = b.gh AND a.lang = b.lang
                         AND a.doc_id < b.doc_id
        GROUP BY 1, 2, a.gc, b.gc
        HAVING COUNT(*)::DOUBLE / (a.gc + b.gc - COUNT(*)) >= 0.1
    ), sym AS (
        SELECT id_a AS a, id_b AS b FROM pairs UNION SELECT id_b, id_a FROM pairs
    ), reach(id, root) AS (
        SELECT a, a FROM sym
        UNION
        SELECT s.b, r.root FROM reach r JOIN sym s ON s.a = r.id
    ), comp AS (
        SELECT id, CAST(MIN(root) AS BIGINT) AS component FROM reach GROUP BY id
    )
    SELECT d.doc_id,
           CAST(COALESCE(c.component, d.doc_id) AS BIGINT) AS component,
           (ROW_NUMBER() OVER (
               PARTITION BY COALESCE(c.component, d.doc_id)
               ORDER BY d.n_chars DESC, d.doc_id) = 1) AS kept
    FROM documents d LEFT JOIN comp c ON d.doc_id = c.id
    """,
)
def dedup_cluster_keep_best(spark: SparkSession, sf: str) -> DataFrame:
    """The canonical fuzzy-dedup end stage: near-dup pair graph →
    connected components → keep ONE representative per cluster (longest
    doc, id tiebreak); singletons keep themselves via the left join.
    Policy lives in one window orderBy — swap n_chars for any quality
    score. Cluster sizes are near-dup group sizes (small), so the
    keep-window can't see the skew a corpus-wide window would."""
    from graphdbetl_spark.operators.dedup import ngram_jaccard_pairs
    from graphdbetl_spark.operators.graph import connected_components

    d = T(spark, sf, "documents")
    pairs = ngram_jaccard_pairs(d, "text", "doc_id", n=3, threshold=0.1, block_cols=["lang"])
    comp = connected_components(pairs, "id_a", "id_b").select(
        F.col("id"), F.col("component")
    )
    base = d.select("doc_id", "n_chars").join(
        comp, d["doc_id"] == comp["id"], "left"
    ).select(
        "doc_id",
        F.coalesce(F.col("component"), F.col("doc_id")).cast("long").alias("component"),
        "n_chars",
    )
    w = Window.partitionBy("component").orderBy(F.col("n_chars").desc(), "doc_id")
    return base.select(
        "doc_id", "component", (F.row_number().over(w) == 1).alias("kept")
    )


@query(
    "multimodal_audio_decode",
    oracle="""
    WITH samp AS (
        SELECT d.doc_id, ((d.doc_id * 31 + i.i * 7) % 65536) - 32768 AS v
        FROM documents d CROSS JOIN generate_series(0, 479) i(i)
    )
    SELECT doc_id, 16000 AS sample_rate, 1 AS channels,
           CAST(480 AS BIGINT) AS n_samples,
           CAST(SUM(v) AS BIGINT) AS sum_samples,
           CAST(SUM(ABS(v)) AS BIGINT) AS sum_abs
    FROM samp GROUP BY doc_id
    """,
)
def multimodal_audio_decode(spark: SparkSession, sf: str) -> DataFrame:
    """REAL audio decode end to end (the WAV analogue of
    multimodal_decode): per doc, a deterministic PCM16 waveform is
    encoded into a RIFF/WAVE container, parsed back by the pure-Python
    decoder, and reduced to format fields + exact integer sample sums
    inside Arrow-batched mapInPandas stages. The oracle recomputes the
    sums from the generating formula, so a header mis-parse, chunk-walk
    bug, or endianness error in encode OR decode breaks the match."""
    from graphdbetl_spark.operators.multimodal import attach_synthetic_audio, audio_features

    d = attach_synthetic_audio(T(spark, sf, "documents"), "doc_id", n_samples=480)
    return audio_features(d, "payload", "doc_id")


@query(
    "multimodal_audio_chunks",
    oracle="""
    WITH samp AS (
        SELECT d.doc_id, i.i // 160 AS chunk_idx,
               ((d.doc_id * 31 + i.i * 7) % 65536) - 32768 AS v
        FROM documents d CROSS JOIN generate_series(0, 479) i(i)
    )
    SELECT doc_id, CAST(chunk_idx AS INTEGER) AS chunk_idx,
           CAST(COUNT(*) AS BIGINT) AS n_samples,
           CAST(SUM(v) AS BIGINT) AS sum_samples,
           CAST(SUM(ABS(v)) AS BIGINT) AS sum_abs
    FROM samp GROUP BY doc_id, chunk_idx
    """,
)
def multimodal_audio_chunks(spark: SparkSession, sf: str) -> DataFrame:
    """Fixed-window audio framing over REAL decoded WAV payloads: 480
    samples per doc -> three 160-sample (10 ms @ 16 kHz) windows, one
    row each with exact integer sums — the one-to-many audio analogue
    of frame_sample, closing the "audio fixed-window chunking" TODO now
    that the PCM16 decode path is real. The oracle recomputes every
    window from the generating formula, so a mis-aligned window
    boundary or a dropped tail sample breaks the hash."""
    from graphdbetl_spark.operators.multimodal import (
        attach_synthetic_audio,
        audio_chunk_features,
    )

    d = attach_synthetic_audio(T(spark, sf, "documents"), "doc_id", n_samples=480)
    return audio_chunk_features(d, "payload", "doc_id", chunk_samples=160)


@query(
    "multimodal_video_frames",
    oracle="""
    WITH px AS (
        SELECT d.doc_id, f.f AS frame_idx, x.x, y.y,
               d.doc_id * 1000 + f.f AS seed
        FROM documents d
        CROSS JOIN (SELECT 0 AS f UNION ALL SELECT 2 UNION ALL SELECT 4 UNION ALL SELECT 6) f
        CROSS JOIN generate_series(0, 7) x(x)
        CROSS JOIN generate_series(0, 5) y(y)
    )
    SELECT doc_id, CAST(frame_idx AS INTEGER) AS frame_idx,
           8 AS width, 6 AS height,
           CAST(SUM((seed * 31 + x * 7 + y * 13) % 256) AS BIGINT) AS sum_r,
           CAST(SUM((seed * 17 + x * 5 + y * 11) % 256) AS BIGINT) AS sum_g,
           CAST(SUM((seed * 29 + x * 3 + y * 19) % 256) AS BIGINT) AS sum_b
    FROM px GROUP BY doc_id, frame_idx
    """,
)
def multimodal_video_frames(spark: SparkSession, sf: str) -> DataFrame:
    """REAL video path end to end: per doc, an 8-frame concatenated-PPM
    stream (raw-MJPEG shape) is built, demuxed by walking frame
    headers, temporally subsampled (every 2nd frame), and each kept
    frame decoded to exact per-channel pixel sums — all inside
    Arrow-batched mapInPandas with no shuffle. The oracle recomputes
    the sampled frames' sums from the generating formula, so demux
    offsets, the sampling cadence, and the decoder all gate the hash."""
    from graphdbetl_spark.operators.multimodal import (
        attach_synthetic_video,
        video_frame_features,
    )

    d = attach_synthetic_video(T(spark, sf, "documents"), "doc_id", n_frames=8)
    return video_frame_features(d, "payload", "doc_id", every=2)


@query(
    "sim_ivf_recall_floor",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_queries, true AS recall_floor_ok
    FROM embeddings WHERE vec_id < 5
    """,
)
def sim_ivf_recall_floor(spark: SparkSession, sf: str) -> DataFrame:
    """Oracle-checked quality bound for the ANN family (the
    agg_approx_bounds pattern): exact brute-force top-10 and IVF top-10
    run in the same plan; the single output row asserts aggregate
    recall@10 >= 0.3 as a literal boolean the oracle pins true. The
    whole pipeline is seeded and deterministic, so this is a stable
    engine property, not a statistical one — a probing or centroid
    regression flips the boolean and breaks the hash match. The
    corpus is md5-capped at ~50k rows (md5_cap_corpus): a recall
    diagnostic must stay bounded as the corpus scales — at the 100×
    replica the dual-arm harness cost 176 s of full-corpus k-means +
    scoring for a 5-query quality gate; the cap is a no-op at
    sf0.01/sf0.1, so the oracle replay is unchanged there."""
    from graphdbetl_spark.operators.similarity import (
        cosine_topk_bruteforce,
        ivf_cosine_topk,
        md5_cap_corpus,
    )

    e = T(spark, sf, "embeddings").withColumn("embedding", _dvec(F.col("embedding")))
    e = md5_cap_corpus(e, "vec_id", keep=F.col("vec_id") < 5)
    q = e.filter(F.col("vec_id") < 5)
    brute = cosine_topk_bruteforce(e, q, "vec_id", "embedding", k=10).select(
        "query_id", "neighbor_id"
    )
    approx = ivf_cosine_topk(e, q, "vec_id", "embedding", k=10).select(
        "query_id", "neighbor_id"
    )
    hits = brute.join(approx, ["query_id", "neighbor_id"], "left_semi")
    agg = brute.agg(
        F.countDistinct("query_id").alias("n_queries"),
        F.count(F.lit(1)).alias("__n_true"),
    ).crossJoin(F.broadcast(hits.agg(F.count(F.lit(1)).alias("__n_hit"))))
    return agg.select(
        "n_queries",
        ((F.col("__n_hit") / F.col("__n_true")) >= 0.3).alias("recall_floor_ok"),
    )


@query(
    "sim_lsh_recall_floor",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_queries, true AS recall_floor_ok
    FROM embeddings WHERE vec_id < 5
    """,
)
def sim_lsh_recall_floor(spark: SparkSession, sf: str) -> DataFrame:
    """LSH companion to sim_ivf_recall_floor: BucketedRandomProjection
    LSH top-10 vs exact brute force in one plan, aggregate recall@10
    >= 0.15 pinned as a literal boolean (LSH on uniform-random vectors
    is the family's worst case, hence the lower deterministic floor).
    Corpus md5-capped at ~50k rows like sim_ivf_recall_floor — a
    bounded quality gate, not a scale operator."""
    from graphdbetl_spark.operators.similarity import (
        cosine_topk_bruteforce,
        lsh_cosine_topk,
        md5_cap_corpus,
    )

    e = T(spark, sf, "embeddings").withColumn("embedding", _dvec(F.col("embedding")))
    e = md5_cap_corpus(e, "vec_id", keep=F.col("vec_id") < 5)
    q = e.filter(F.col("vec_id") < 5)
    brute = cosine_topk_bruteforce(e, q, "vec_id", "embedding", k=10).select(
        "query_id", "neighbor_id"
    )
    approx = lsh_cosine_topk(e, q, "vec_id", "embedding", k=10, seed=42).select(
        "query_id", "neighbor_id"
    )
    hits = brute.join(approx, ["query_id", "neighbor_id"], "left_semi")
    agg = brute.agg(
        F.countDistinct("query_id").alias("n_queries"),
        F.count(F.lit(1)).alias("__n_true"),
    ).crossJoin(F.broadcast(hits.agg(F.count(F.lit(1)).alias("__n_hit"))))
    return agg.select(
        "n_queries",
        ((F.col("__n_hit") / F.col("__n_true")) >= 0.15).alias("recall_floor_ok"),
    )


@query("sim_ivfpq_topk", oracle=_sim_ivfpq_md5_oracle())
def sim_ivfpq_topk(spark: SparkSession, sf: str) -> DataFrame:
    """IVF-PQ two-level ANN (FAISS IVFPQ architecture): coarse cells
    restrict each query to n_probe cells; within them, candidates score
    by PQ asymmetric distance over 8x-compressed codes — the
    billion-vector serving shape. The registry name points at the
    fully md5-deterministic composition (r5 verdict #1c) so BOTH
    levels — cells and codes — plus the ADC LUT scoring replay in the
    oracle; the k-means composition stays as operators/similarity.py
    ivfpq_cosine_topk, pytest recall-floor-checked vs brute force."""
    from graphdbetl_spark.operators.similarity import ivfpq_cosine_topk_md5

    e = T(spark, sf, "embeddings").withColumn("embedding", _dvec(F.col("embedding")))
    q = e.filter(F.col("vec_id") < 5)
    return ivfpq_cosine_topk_md5(e, q, "vec_id", "embedding", k=10)


@query(
    "sim_pq_topk_md5",
    oracle="""
    WITH un AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ), u AS (
        SELECT vec_id,
               list_transform(v, x -> x / sqrt(
                   list_reduce(list_transform(v, y -> y * y), (a, b) -> a + b))) AS uv
        FROM un
    ), donors AS (
        SELECT uv,
               row_number() OVER (
                   ORDER BY md5('42:' || CAST(vec_id AS VARCHAR)), vec_id) - 1 AS code
        FROM u ORDER BY md5('42:' || CAST(vec_id AS VARCHAR)), vec_id LIMIT 16
    ), cbh AS (
        SELECT s.j AS sub, code,
               list_transform(range(1, 3), i -> uv[s.j * 2 + i]) AS centroid
        FROM donors, (SELECT unnest(range(0, 32)) AS j) s
    ), cb1 AS (
        SELECT sub,
               list(centroid ORDER BY code) AS cents,
               list(list_reduce(list_transform(centroid, x -> x * x), (a, b) -> a + b) / 2.0
                    ORDER BY code) AS hns
        FROM cbh GROUP BY sub
    ), cbn AS (
        SELECT list(cents ORDER BY sub) AS cb, list(hns ORDER BY sub) AS cn FROM cb1
    ), codes AS (
        SELECT vec_id,
               list_transform(range(0, 32), j ->
                   list_indexof(sm[j + 1], list_max(sm[j + 1])) - 1) AS codes
        FROM (
            SELECT vec_id,
                   list_transform(range(0, 32), j ->
                       list_transform(range(0, 16), c ->
                           uv[j * 2 + 1] * cb[j + 1][c + 1][1]
                           + uv[j * 2 + 2] * cb[j + 1][c + 1][2]
                           - cn[j + 1][c + 1])) AS sm
            FROM u, cbn
        )
    ), ql AS (
        SELECT vec_id AS query_id,
               list_transform(range(0, 32), j ->
                   list_transform(range(0, 16), c ->
                       uv[j * 2 + 1] * cb[j + 1][c + 1][1]
                       + uv[j * 2 + 2] * cb[j + 1][c + 1][2])) AS lut
        FROM u, cbn WHERE vec_id < 5
    ), scored AS (
        SELECT q.query_id, c.vec_id AS neighbor_id,
               list_reduce(list_transform(range(0, 32),
                           j -> q.lut[j + 1][c.codes[j + 1] + 1]), (a, b) -> a + b) AS s
        FROM ql q JOIN codes c ON c.vec_id <> q.query_id
    )
    SELECT query_id, neighbor_id, rank FROM (
        SELECT query_id, neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY s DESC, neighbor_id) AS rank
        FROM scored
    ) WHERE rank <= 10
    """,
)
def sim_pq_topk_md5(spark: SparkSession, sf: str) -> DataFrame:
    """Product-quantization ANN (Jégou et al. 2011) with the md5-family
    deterministic sampled codebook — the THIRD fully-oracle-checked ANN
    member alongside brute force and the recall floors: codebook build,
    code assignment (argmax of the dot-minus-half-norm identity), ADC
    lookup-table scoring, and final ranking are all replayed bit for
    bit by the DuckDB oracle (identical left-fold float order; see
    operators/similarity.py). 64-dim vectors → 32 codes of 16
    centroids: an 8× corpus compression whose query path reads only
    codes."""
    from graphdbetl_spark.operators.similarity import pq_cosine_topk

    e = T(spark, sf, "embeddings").withColumn("embedding", _dvec(F.col("embedding")))
    q = e.filter(F.col("vec_id") < 5)
    out = pq_cosine_topk(e, q, "vec_id", "embedding", k=10, dim=64, m=32, k_codes=16)
    return out.select("query_id", "neighbor_id", "rank")


@query(
    "sim_pq_recall_floor",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_queries, true AS recall_floor_ok
    FROM embeddings WHERE vec_id < 5
    """,
)
def sim_pq_recall_floor(spark: SparkSession, sf: str) -> DataFrame:
    """PQ companion to sim_ivf_recall_floor: ADC top-10 vs exact brute
    force in one plan, aggregate recall@10 >= 0.3 pinned as a literal
    boolean (measured 0.62 on the uniform-random worst case at sf0.01;
    deterministic md5 codebook, so this is an engine property, not a
    statistical one)."""
    from graphdbetl_spark.operators.similarity import (
        cosine_topk_bruteforce,
        pq_cosine_topk,
    )

    e = T(spark, sf, "embeddings").withColumn("embedding", _dvec(F.col("embedding")))
    q = e.filter(F.col("vec_id") < 5)
    brute = cosine_topk_bruteforce(e, q, "vec_id", "embedding", k=10).select(
        "query_id", "neighbor_id"
    )
    approx = pq_cosine_topk(e, q, "vec_id", "embedding", k=10).select(
        "query_id", "neighbor_id"
    )
    hits = brute.join(approx, ["query_id", "neighbor_id"], "left_semi")
    agg = brute.agg(
        F.countDistinct("query_id").alias("n_queries"),
        F.count(F.lit(1)).alias("__n_true"),
    ).crossJoin(F.broadcast(hits.agg(F.count(F.lit(1)).alias("__n_hit"))))
    return agg.select(
        "n_queries",
        ((F.col("__n_hit") / F.col("__n_true")) >= 0.3).alias("recall_floor_ok"),
    )


@query(
    "embedding_quantize_int8",
    oracle="""
    WITH e AS (
        SELECT vec_id, embedding,
               CAST(list_max(list_transform(embedding, x -> abs(x))) AS DOUBLE)
                   / 127.0 AS scale
        FROM embeddings
    ), q AS (
        SELECT vec_id, scale, embedding,
               list_transform(embedding, x -> CAST(round(x / scale) AS INT)) AS codes
        FROM e WHERE scale > 0
    )
    SELECT vec_id,
           ROUND(scale, 6) AS scale,
           CAST(list_sum(codes) AS BIGINT) AS q_sum,
           CAST(list_min(codes) AS INT) AS q_min,
           CAST(list_max(codes) AS INT) AS q_max,
           ROUND(list_max(list_transform(range(1, len(codes) + 1),
                 i -> abs(embedding[i] - codes[i] * scale))), 6) AS max_abs_err
    FROM q
    """,
)
def embedding_quantize_int8(spark: SparkSession, sf: str) -> DataFrame:
    """Symmetric per-vector int8 quantization of the embedding column —
    the standard 4x storage/bandwidth reduction for trillion-row vector
    stores (scale = max|x|/127, code = round(x/scale)). Emits exact
    integer aggregates of the codes plus the reconstruction error bound,
    so the whole quantize→dequantize path is oracle-checked value-for-
    value, not just row counts. Zero shuffle: every expression is a
    per-row higher-order array function inside the scan stage, so at
    100 TB this is a single map-only pass (the write side would keep the
    codes column and drop the float array). Promotion order (float32
    element → float64 arithmetic) matches IEEE in both engines, and
    round() ties go away-from-zero in both, so codes are bit-identical."""
    e = T(spark, sf, "embeddings")
    scale = F.array_max(F.transform("embedding", lambda x: F.abs(x))) / F.lit(127.0)
    base = e.select("vec_id", "embedding", scale.alias("scale")).filter(
        F.col("scale") > 0
    )
    codes = F.transform("embedding", lambda x: F.round(x / F.col("scale")).cast("int"))
    staged = base.select("vec_id", "scale", "embedding", codes.alias("codes"))
    q_sum = F.aggregate(
        "codes", F.lit(0).cast("long"), lambda acc, v: acc + v.cast("long")
    )
    # err must be computed BEFORE the projection that rounds `scale`:
    # lateral column aliasing would otherwise bind F.col("scale") inside
    # the lambda to the rounded sibling alias in the same select list.
    err = F.array_max(
        F.zip_with("embedding", "codes", lambda x, c: F.abs(x - c * F.col("scale")))
    )
    staged = staged.withColumn("__err", err)
    return staged.select(
        "vec_id",
        F.round("scale", 6).alias("scale"),
        q_sum.alias("q_sum"),
        F.array_min("codes").cast("int").alias("q_min"),
        F.array_max("codes").cast("int").alias("q_max"),
        F.round("__err", 6).alias("max_abs_err"),
    )


@query(
    "text_feature_hashing",
    oracle="""
    WITH t AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS tok
        FROM documents
    )
    SELECT doc_id,
           ('0x' || substr(md5(tok), 1, 8))::BIGINT % 256 AS bucket,
           CAST(COUNT(*) AS BIGINT) AS tf
    FROM t GROUP BY doc_id, bucket
    """,
)
def text_feature_hashing(spark: SparkSession, sf: str) -> DataFrame:
    """Feature hashing (HashingTF analogue) over the document corpus:
    token → md5-derived bucket in [0, 256), term frequency per
    (doc, bucket) — the fixed-width sparse vectorization quality
    classifiers and fastText-style filters train on. Uses the repo's
    md5-family idiom (first 8 hex chars → BIGINT, engine-portable), so
    unlike hash()-based HashingTF the buckets are ORACLE-CHECKED
    bit-for-bit. Scale shape: explode happens inside the scan stage and
    the (doc_id, bucket) aggregate does map-side partials, so the
    shuffle carries at most 256 rows per document regardless of
    document length; no vocabulary state anywhere (that is the point
    of the hashing trick at 100 TB)."""
    d = T(spark, sf, "documents")
    tok = d.select("doc_id", F.explode(_tokens(F.col("text"))).alias("tok"))
    bucket = F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("long") % 256
    return tok.select("doc_id", bucket.alias("bucket")).groupBy(
        "doc_id", "bucket"
    ).agg(F.count(F.lit(1)).cast("long").alias("tf"))


@query(
    "dedup_normalized_exact",
    oracle=r"""
    WITH corpus AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 1000000,
               replace(upper(text), ' ', '  ') || ' !!' FROM documents
    ), n AS (
        SELECT doc_id,
               md5(trim(regexp_replace(regexp_replace(
                   lower(text), '[^a-z0-9 \t\n]', '', 'g'), '\s+', ' ', 'g')))
                   AS norm_digest
        FROM corpus
    )
    SELECT norm_digest, MIN(doc_id) AS keep_id,
           CAST(COUNT(*) AS BIGINT) AS dup_count
    FROM n GROUP BY norm_digest
    """,
)
def dedup_normalized_exact(spark: SparkSession, sf: str) -> DataFrame:
    """The 'fuzzy-exact' dedup tier between byte-exact sha and MinHash:
    case/punctuation/whitespace-normalized digests. The corpus here is
    the documents table UNION a reformatted clone of every document
    (uppercased, double-spaced, punctuation appended) — byte-exact
    dedup sees 2N distinct digests, this tier collapses every clone
    onto its original. Same scale posture as dedup_exact: digest in the
    scan projection, ONE hash aggregation on a 16-byte key; the digest
    projection is a fused single-pass Arrow kernel (translate + split
    — the r9 fix for the char-volume-bound 4.0× rung; the three-regex
    JVM chain it replaced re-walked every document per pass). See
    operators/dedup.py normalize_text / dedup_normalized_exact_groups.
    Reference ground: graph_db_builder.py:493-497 declares merge-on-id
    only; content-level normalization is north-star surface."""
    from graphdbetl_spark.operators.dedup import dedup_normalized_exact_groups

    d = T(spark, sf, "documents").select("doc_id", "text")
    clone = d.select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(
            F.regexp_replace(F.upper(F.col("text")), " ", "  "), F.lit(" !!")
        ).alias("text"),
    )
    return dedup_normalized_exact_groups(d.unionByName(clone), "text", "doc_id")


@query(
    "text_entropy_gate",
    oracle="""
    WITH ch AS (
        SELECT doc_id, unnest(string_split(text, '')) AS c FROM documents
    ), cnt AS (
        SELECT doc_id, c, CAST(COUNT(*) AS DOUBLE) AS n
        FROM ch GROUP BY doc_id, c
    ), tot AS (
        SELECT doc_id, SUM(n) AS t, CAST(COUNT(*) AS BIGINT) AS dc
        FROM cnt GROUP BY doc_id
    ), h AS (
        -- 0.0 - SUM(...) not -SUM(...): a single-char-class doc sums to
        -- +0.0 and bare negation emits -0.0, which hash-mismatches the
        -- engine's +0.0 under repr-based value normalization
        SELECT cnt.doc_id, 0.0 - SUM((cnt.n / tot.t) * ln(cnt.n / tot.t)) AS ent
        FROM cnt JOIN tot USING (doc_id) GROUP BY cnt.doc_id
    )
    SELECT d.doc_id, CAST(len(d.text) AS BIGINT) AS n_chars,
           tot.dc AS n_distinct_chars,
           ROUND(h.ent, 6) AS entropy,
           (h.ent < 2.5) AS low_entropy
    FROM documents d JOIN tot USING (doc_id) JOIN h ON h.doc_id = d.doc_id
    """,
)
def text_entropy_gate(spark: SparkSession, sf: str) -> DataFrame:
    """Character-entropy gibberish gate (sub-word degeneracy detector —
    the signal Gopher/C4 word rules can't see). Zero-shuffle: chars,
    per-char counts, and the -Σ p·ln p fold are all per-row
    higher-order array expressions inside the scan stage. See
    operators/curation.py char_entropy."""
    from graphdbetl_spark.operators.curation import char_entropy

    return char_entropy(T(spark, sf, "documents"), "text", "doc_id", low=2.5)


@query(
    "text_bigram_logprob",
    oracle="""
    WITH t AS (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
        FROM documents
    ), bg AS (
        SELECT doc_id,
               unnest(list_slice(toks, 1, len(toks) - 1)) AS a,
               unnest(list_slice(toks, 2, len(toks))) AS b
        FROM t WHERE len(toks) >= 2
    ), c2 AS (
        SELECT a, b, CAST(COUNT(*) AS BIGINT) AS c2 FROM bg GROUP BY a, b
    ), c1 AS (
        SELECT a, CAST(SUM(c2) AS BIGINT) AS c1 FROM c2 GROUP BY a
    ), v AS (
        SELECT CAST(COUNT(DISTINCT tk) AS BIGINT) AS v
        FROM (SELECT a AS tk FROM c2 UNION ALL SELECT b FROM c2)
    )
    SELECT bg.doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           ROUND(AVG(ln((c2.c2 + 1) / CAST(c1.c1 + v.v AS DOUBLE))), 6)
               AS mean_logprob
    FROM bg JOIN c2 USING (a, b) JOIN c1 USING (a) CROSS JOIN v
    GROUP BY bg.doc_id
    """,
)
def text_bigram_logprob(spark: SparkSession, sf: str) -> DataFrame:
    """Bigram-LM quality score (Laplace-smoothed, corpus-trained) — one
    order up from text_unigram_logprob toward CCNet's KenLM perplexity
    filter; catches scrambled word salad that unigram stats cannot.
    Bigrams form via shifted-array zip in the scan (no token
    self-join); one partial-agg shuffle builds the LM; the LM-to-corpus
    join strategy is AQE's. See operators/curation.py bigram_logprob."""
    from graphdbetl_spark.operators.curation import bigram_logprob

    return bigram_logprob(T(spark, sf, "documents"), "text", "doc_id")


@query(
    "sim_range_search",
    oracle="""
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           ROUND(list_cosine_similarity(
               list_transform(q.embedding, x -> CAST(x AS DOUBLE)),
               list_transform(c.embedding, x -> CAST(x AS DOUBLE))), 6) AS cosine
    FROM (SELECT * FROM embeddings WHERE vec_id % 100 = 0) q
    JOIN embeddings c ON c.vec_id <> q.vec_id
    WHERE list_cosine_similarity(
              list_transform(q.embedding, x -> CAST(x AS DOUBLE)),
              list_transform(c.embedding, x -> CAST(x AS DOUBLE))) >= 0.25
    """,
)
def sim_range_search(spark: SparkSession, sf: str) -> DataFrame:
    """Exact cosine RANGE search (FAISS range_search surface): all
    corpus vectors within similarity radius 0.25 of each query
    (vec_id % 100 == 0), broadcast queries × one codegen'd corpus
    scan. See operators/similarity.py cosine_range_search."""
    from graphdbetl_spark.operators.similarity import cosine_range_search

    e = T(spark, sf, "embeddings").withColumn("embedding", _dvec(F.col("embedding")))
    q = e.filter(F.col("vec_id") % 100 == 0)
    return cosine_range_search(e, q, "vec_id", "embedding", threshold=0.25)


@query(
    "embedding_whiten",
    oracle="""
    WITH ex AS (
        SELECT vec_id, generate_subscripts(embedding, 1) AS component,
               CAST(unnest(embedding) AS DOUBLE) AS v
        FROM embeddings
    ), st AS (
        SELECT component, avg(v) AS mu, stddev_pop(v) AS sd
        FROM ex GROUP BY 1
    )
    SELECT e.vec_id, CAST(e.component AS INT) AS component,
           ROUND(CASE WHEN s.sd = 0 THEN 0.0 ELSE (e.v - s.mu) / s.sd END, 6)
               AS zvalue
    FROM ex e JOIN st s USING (component)
    """,
)
def embedding_whiten(spark: SparkSession, sf: str) -> DataFrame:
    """Per-dimension standardization of the embedding corpus — the
    whitening pass in front of cosine/PCA/IVF when dimensions arrive
    on mixed scales. Dimension-keyed moment shuffle is bounded by d
    (64 rows per map task), stats broadcast back, one codegen corpus
    pass; output flattened to (vec_id, component, zvalue) scalars
    (see operators/similarity.py standardize_dimensions)."""
    from graphdbetl_spark.operators.similarity import standardize_dimensions

    return standardize_dimensions(T(spark, sf, "embeddings"), "vec_id", "embedding")


def _sim_ivf_append_oracle(n_cells: int = 8) -> str:
    """Replay of ivf_append_report: base-only (vec_id % 7 <> 0)
    md5-sampled centroids, max-dot assignment of ALL vectors against
    them, per-cell base/new counts + the integer rebuild predicate."""
    return f"""
    WITH un AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ), u AS (
        SELECT vec_id,
               list_transform(v, x -> x / sqrt(
                   list_reduce(list_transform(v, y -> y * y),
                               (acc, b) -> acc + b))) AS uv
        FROM un
    ), d AS (
        SELECT uv AS cuv,
               row_number() OVER (
                   ORDER BY md5('42:' || CAST(vec_id AS VARCHAR)), vec_id) - 1 AS cell
        FROM u WHERE vec_id % 7 <> 0
        ORDER BY md5('42:' || CAST(vec_id AS VARCHAR)), vec_id LIMIT {n_cells}
    ), dots AS (
        SELECT u.vec_id, d.cell,
               list_reduce(list_transform(range(1, 65),
                           i -> u.uv[i] * d.cuv[i]), (acc, b) -> acc + b) AS dt
        FROM u CROSS JOIN d
    ), asn AS (
        SELECT vec_id, cell FROM (
            SELECT vec_id, cell,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY dt DESC, cell) AS rn
            FROM dots) WHERE rn = 1
    ), c AS (
        SELECT CAST(cell AS INT) AS cell,
               CAST(count(*) FILTER (vec_id % 7 <> 0) AS BIGINT) AS n_base,
               CAST(count(*) FILTER (vec_id % 7 = 0) AS BIGINT) AS n_new,
               CAST(count(*) AS BIGINT) AS n_total
        FROM asn GROUP BY 1
    ), t AS (SELECT CAST(sum(n_total) AS BIGINT) AS total FROM c)
    SELECT cell, n_base, n_new, n_total,
           n_total * {n_cells} > 2 * total AS rebuild_hint
    FROM c, t
    """


@query("sim_ivf_append", oracle=_sim_ivf_append_oracle())
def sim_ivf_append(spark: SparkSession, sf: str) -> DataFrame:
    """Incremental ANN index maintenance: an arriving batch
    (vec_id % 7 == 0) appends to the md5-IVF index fitted on the base
    corpus — assignment to EXISTING centroids is the map-only
    broadcast pass (no re-clustering), and the per-cell report flags
    drifted cells (> 2x mean size, integer arithmetic) as rebuild
    candidates (see operators/similarity.py ivf_append_report)."""
    from graphdbetl_spark.operators.similarity import ivf_append_report

    e = T(spark, sf, "embeddings").withColumn("embedding", _dvec(F.col("embedding")))
    return ivf_append_report(e, F.col("vec_id") % 7 == 0, "vec_id", "embedding")
