"""Parity pins for the r12 vectorized multimodal kernels (guide §4.2):
every batch helper must reproduce its per-row reference BIT FOR BIT —
the vectorized forms are the same integer arithmetic evaluated
batch-wise, so any divergence is a bug, not tolerance."""

import numpy as np

from graphdbetl_spark.operators.multimodal import (
    _ahash_batch,
    _ahash_rgb,
    _encode_ppm_batch,
    _synthetic_pcm16_batch,
    _synthetic_pcm16_mixed_batch,
    _synthetic_rgb_batch,
    _synthetic_rgb_cluster_batch,
    encode_ppm,
    synthetic_pcm16,
    synthetic_pcm16_mixed,
    synthetic_rgb,
    synthetic_rgb_cluster,
)

IDS = list(range(0, 101, 7)) + [999, 123456789, 2**40 + 3]


def test_synthetic_rgb_batch_matches_reference():
    mat = _synthetic_rgb_batch(IDS, 8, 6)
    for j, i in enumerate(IDS):
        assert mat[j].tobytes() == synthetic_rgb(i, 8, 6)


def test_synthetic_rgb_cluster_batch_matches_reference():
    mat = _synthetic_rgb_cluster_batch(IDS, 8, 6)
    for j, i in enumerate(IDS):
        assert mat[j].tobytes() == synthetic_rgb_cluster(i, 8, 6)


def test_encode_ppm_batch_matches_reference():
    mat = _synthetic_rgb_batch(IDS, 8, 6)
    payloads = _encode_ppm_batch(mat, 8, 6)
    for j, i in enumerate(IDS):
        assert payloads[j] == encode_ppm(8, 6, synthetic_rgb(i, 8, 6))


def test_pcm16_batch_matches_reference():
    pcm = _synthetic_pcm16_batch(IDS, 480)
    for j, i in enumerate(IDS):
        assert pcm[j].tobytes() == synthetic_pcm16(i, 480)


def test_pcm16_mixed_batch_matches_reference_including_overflow_keys():
    # keys large enough that (key*31+1)*(i+1)*2654435761 exceeds 2**63:
    # the int64 wrap preserves the value mod 65536 (65536 | 2**64)
    keys = [0, 1, 49, 10_000, 2**31, 2**40 + 3]
    pcm = _synthetic_pcm16_mixed_batch(keys, 480)
    for j, k in enumerate(keys):
        assert pcm[j].tobytes() == synthetic_pcm16_mixed(k, 480)


def test_ahash_batch_matches_reference():
    mats = _synthetic_rgb_cluster_batch(IDS, 8, 6)
    got = _ahash_batch(mats, 48)
    for j, i in enumerate(IDS):
        ref = _ahash_rgb(synthetic_rgb_cluster(i, 8, 6), 48)
        assert int(got[j]) == ref


def test_ahash_batch_max_npix_63_no_overflow():
    # npix = 63 packs bit 62 and the all-ones sum equals int64 max
    rng = np.random.RandomState(7)
    mat = rng.randint(0, 256, size=(16, 63 * 3)).astype(np.uint8)
    got = _ahash_batch(mat, 63)
    for j in range(16):
        assert int(got[j]) == _ahash_rgb(mat[j].tobytes(), 63)
