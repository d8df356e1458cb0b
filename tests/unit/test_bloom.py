"""Bloom layer invariants (SURVEY.md §5.1): zero false negatives ever,
FPR within 2× of the design target at 1e5 keys."""

from __future__ import annotations

import numpy as np

from gpse.seen import _bloom_set, _bloom_test


def test_no_false_negatives_1e5():
    rng = np.random.default_rng(42)
    keys = rng.integers(-(2**63), 2**63 - 1, size=100_000, dtype=np.int64)
    nbits = 1 << int(np.ceil(np.log2(len(keys) * 12)))
    bits = _bloom_set(keys, nbits, 6)
    assert _bloom_test(keys, nbits, 6, bits).all()


def test_fpr_within_2x_target():
    rng = np.random.default_rng(7)
    keys = rng.integers(-(2**63), 2**63 - 1, size=100_000, dtype=np.int64)
    nbits = 1 << int(np.ceil(np.log2(len(keys) * 12)))
    bits = _bloom_set(keys, nbits, 6)
    probe = rng.integers(-(2**63), 2**63 - 1, size=100_000, dtype=np.int64)
    probe = np.setdiff1d(probe, keys)
    fpr = _bloom_test(probe, nbits, 6, bits).mean()
    # k=6, m/n in [12,24) → theoretical FPR ≤ (1-e^(-6n/m))^6 ≈ 0.004
    assert fpr < 0.008, fpr


def test_empty_bloom_rejects_everything():
    bits = np.zeros(1024 // 8, dtype=np.uint8)
    keys = np.arange(1000, dtype=np.int64)
    assert not _bloom_test(keys, 1024, 6, bits).any()


def test_bucket_probe_equals_broadcast_and_exact(spark):
    """The bucket-local cogroup probe (blobs > max_broadcast_bytes) must
    return exactly the same new-URL set as the broadcast probe and as the
    bloom-less exact anti-join."""
    from pyspark.sql import functions as F

    from gpse.seen import build_blooms, dedup_new_urls

    seen = spark.range(0, 3000).select(
        F.xxhash64("id").alias("url_hash"), F.lit(0).cast("int").alias("first_round")
    )
    cand = spark.range(1500, 5000).select(
        F.concat(F.lit("http://h/p/"), F.col("id")).alias("url"),
        F.xxhash64("id").alias("url_hash"),
        F.lit(1).cast("int").alias("depth"),
        F.lit(0).cast("long").alias("src_url_hash"),
    )
    blooms = build_blooms(seen, n_buckets=8, nbits=1 << 16)
    exact = {r.url_hash for r in dedup_new_urls(cand, seen).collect()}
    bcast = {
        r.url_hash
        for r in dedup_new_urls(cand, seen, blooms, 8, max_broadcast_bytes=1 << 30).collect()
    }
    bucket = {
        r.url_hash
        for r in dedup_new_urls(cand, seen, blooms, 8, max_broadcast_bytes=0).collect()
    }
    assert exact == bcast == bucket
    assert len(exact) == 2000
