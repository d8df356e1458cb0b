"""Similarity-search quality: the IVF and LSH scale paths measured against
the brute-force baseline (task brief: brute force is the baseline, the
bucketed variants are the scale path — so their recall is the contract)."""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.01"


def _topk(rows):
    out = {}
    for r in rows:
        out.setdefault(r.query_id, []).append(r.vec_id)
    return out


def test_ivf_recall_vs_bruteforce(spark):
    from gpse.pipeline import q_similarity_ivf, q_similarity_topk

    brute = _topk(q_similarity_topk(spark, SF).collect())
    ivf = _topk(q_similarity_ivf(spark, SF).collect())
    assert set(ivf) == set(brute)
    hits = total = 0
    for q in brute:
        hits += len(set(brute[q]) & set(ivf[q]))
        total += len(brute[q])
    recall = hits / total
    # nprobe=2 of 8 cells on random vectors: exact top-1 often lives in a
    # probed cell; demand a sane floor so regressions surface
    assert recall >= 0.4, recall


def test_ivf_deterministic(spark):
    from gpse.pipeline import q_similarity_ivf

    a = [tuple(r) for r in q_similarity_ivf(spark, SF).collect()]
    b = [tuple(r) for r in q_similarity_ivf(spark, SF).collect()]
    assert a == b


def test_lsh_pairs_subset_of_bruteforce_threshold(spark):
    """Every LSH-bucketed match must be a true ≥-threshold pair (no false
    positives — LSH trades recall, never precision, given exact rescoring)."""
    from pyspark.sql import functions as F

    from gpse.pipeline import _cosine, q_similarity_lsh
    from gpse.queries import T

    pairs = q_similarity_lsh(spark, SF).collect()
    v = {r.vec_id: r.embedding for r in T(spark, SF, "embeddings").collect()}
    import numpy as np

    for r in pairs[:200]:
        a, b = np.asarray(v[r.vec_a], float), np.asarray(v[r.vec_b], float)
        cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert cos >= 0.25 - 1e-6
