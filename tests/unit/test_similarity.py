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


def test_ivf_probe_cells_matches_numpy(spark):
    """The in-plan nprobe cell selection (literal centroids, zip_with
    distance, array_sort) must agree with a straight numpy argsort over
    the same centroids — the r2 driver-loop behavior it replaced."""
    import numpy as np

    from gpse.pipeline import ivf_probe_cells

    rng = np.random.RandomState(3)
    centers = [[float(x) for x in rng.randn(8)] for _ in range(6)]
    qs = [(i, [float(x) for x in rng.randn(8)]) for i in range(10)]
    df = spark.createDataFrame(qs, "query_id long, qvec array<double>")
    got = {}
    for r in ivf_probe_cells(df, centers, nprobe=3).collect():
        got.setdefault(r.query_id, []).append(r.cell)
    c = np.asarray(centers)
    for qid, qv in qs:
        d = ((c - np.asarray(qv)) ** 2).sum(axis=1)
        want = [int(x) for x in np.argsort(d, kind="stable")[:3]]
        assert got[qid] == want, (qid, got[qid], want)


def test_ivf_batch_topk_matches_numpy_oracle(spark):
    """The batch path (cell-cogrouped GEMM, partial top-k, global merge)
    must return, for EVERY query in a query table, exactly the numpy-
    computed top-k over that query's probed cells — the many-query scale
    path is value-checked, not just run."""
    import numpy as np

    from pyspark.sql import functions as F

    from gpse.pipeline import ivf_assign, ivf_batch_topk
    from gpse.queries import T

    v = T(spark, SF, "embeddings")
    assigned, centers = ivf_assign(spark, v)
    queries = assigned.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )  # ALL 500 vectors as the query table
    got = {}
    for r in ivf_batch_topk(assigned, queries, centers, nprobe=3, k=3).collect():
        got.setdefault(r.query_id, []).append((r.rank, r.vec_id))

    rows = assigned.select("vec_id", "cell", "embedding").collect()
    ids = np.array([r.vec_id for r in rows])
    cells = np.array([r.cell for r in rows])
    X = np.array([r.embedding for r in rows], dtype=np.float64)
    Xn = X / np.linalg.norm(X, axis=1)[:, None]
    c = np.asarray(centers)
    assert len(got) == len(ids)
    for i, qid in enumerate(ids):
        d = ((c - X[i]) ** 2).sum(axis=1)
        probed = set(int(x) for x in np.argsort(d, kind="stable")[:3])
        mask = np.array([cc in probed for cc in cells]) & (ids != qid)
        cos = Xn[mask] @ Xn[i]
        cand_ids = ids[mask]
        order = sorted(zip(-cos, cand_ids))[:3]
        want = [int(vid) for _, vid in order]
        have = [vid for _, vid in sorted(got[qid])]
        assert have == want, (qid, have, want)


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


def test_lsh_finds_planted_near_duplicates(spark):
    """Recall contract on NEAR-DUP vectors (the case LSH exists for):
    a vector and its tiny perturbation share all hyperplane signs w.h.p.,
    so the banded LSH must surface the planted pairs. Random orthogonal-ish
    vectors legitimately escape (that's the candidate pruning)."""
    import numpy as np

    from gpse.pipeline import EMB_DIM, cosine_lsh_pairs

    rng = np.random.RandomState(7)
    base = rng.randn(20, EMB_DIM)
    rows = []
    for i, v in enumerate(base):
        rows.append((i, [float(x) for x in v]))
        rows.append((100 + i, [float(x) for x in v + 1e-4 * rng.randn(EMB_DIM)]))
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {(r.vec_a, r.vec_b) for r in cosine_lsh_pairs(vecs, threshold=0.9).collect()}
    planted = {(i, 100 + i) for i in range(20)}
    found = len(planted & got) / len(planted)
    assert found >= 0.9, (found, sorted(planted - got))


def test_minhash_production_params(spark):
    """K=128 / 16-band production parameters on a tiny fixture: identical
    docs collide in every band; disjoint docs collide in none."""
    from gpse.pipeline import lsh_candidate_pairs, minhash_signatures

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "alpha beta gamma delta epsilon zeta eta theta"),
            (3, "one two three four five six seven eight nine"),
        ],
        "doc_id long, text string",
    )
    sigs = minhash_signatures(docs, k=128)
    assert len(sigs.columns) == 129
    pairs = {(r.doc_a, r.doc_b) for r in lsh_candidate_pairs(sigs, k=128, bands=16).collect()}
    assert pairs == {(1, 2)}


def test_simhash_hamming_zero_for_identical_docs(spark):
    from gpse.pipeline import simhash_near_pairs, simhash

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy dog"),
            (3, "completely different words entirely unrelated tokens here"),
        ],
        "doc_id long, text string",
    )
    pairs = simhash_near_pairs(simhash(docs)).collect()
    assert {(r.doc_a, r.doc_b, r.hamming) for r in pairs} >= {(1, 2, 0)}
    assert all({r.doc_a, r.doc_b} != {1, 3} for r in pairs)


def test_minhash_fast_family_agrees_with_md5(spark):
    """The production 'fast' hash family (xxhash64 once per shingle + K
    fixed-width rehashes) vs the 'md5' oracle family at the PRODUCTION
    knobs (K=128/16 bands) on the sf0.01 documents table. Any valid
    permutation family must (a) surface every exact-duplicate pair — an
    identical shingle set gives identical signatures, which collide in
    every band — and (b) agree with the md5 family on near-dups up to the
    families' statistical noise at the Jaccard knee."""
    from pyspark.sql import functions as F

    from gpse.pipeline import lsh_candidate_pairs, minhash_signatures
    from gpse.queries import T

    base = T(spark, SF, "documents").select("doc_id", "text")
    # plant exact duplicates (sf0.01 has near-dups but no byte-identical
    # ones): copies of 5 docs under high ids — these pairs MUST collide in
    # every band for ANY permutation family
    clones = base.orderBy("doc_id").limit(5).select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"), "text"
    )
    d = base.unionByName(clones)
    must = {
        (r.doc_id, r.doc_id + 10_000_000)
        for r in base.orderBy("doc_id").limit(5).collect()
    }

    def pairs(family):
        return {
            (r.doc_a, r.doc_b)
            for r in lsh_candidate_pairs(
                minhash_signatures(d, k=128, family=family),
                k=128, bands=16, family=family,
            ).collect()
        }

    fast, md5 = pairs("fast"), pairs("md5")
    assert must <= fast
    assert must <= md5
    # near the (1/bands)^(bands/K) knee the two families may disagree on a
    # few borderline pairs; anything beyond ~10% of the union is a bug
    assert len(fast ^ md5) <= max(1, len(fast | md5) // 10), (
        len(fast), len(md5), len(fast ^ md5))


def test_minhash_fast_family_plan_is_jvm_only(spark):
    """The fast family must stay entirely inside whole-stage codegen: no
    Python evals, no md5-of-concat string assembly in the plan."""
    from gpse.pipeline import lsh_candidate_pairs, minhash_signatures
    from gpse.queries import T

    plan = lsh_candidate_pairs(
        minhash_signatures(T(spark, SF, "documents"), k=16, family="fast"),
        k=16, bands=4, family="fast",
    )._jdf.queryExecution().executedPlan().toString()
    assert "xxhash64" in plan
    assert "md5" not in plan
    assert "Python" not in plan


def test_minhash_md5_dict_plan_matches_direct(spark):
    """The k>=32 distinct-shingle dictionary plan (r6) must be value-
    identical to the direct per-occurrence plan: min over a doc's joined
    dictionary rows is the min over the same md5 multiset."""
    from pyspark.sql import functions as F

    from gpse.pipeline import exploded_shingles, minhash_signatures

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    k = 32
    dict_plan = minhash_signatures(docs, k=k)  # takes the dictionary branch
    ex = exploded_shingles(docs)
    direct = ex.groupBy("doc_id").agg(
        *[
            F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("sh")))).alias(f"mh{i}")
            for i in range(k)
        ]
    )
    a = dict_plan.orderBy("doc_id").collect()
    b = direct.orderBy("doc_id").collect()
    assert a == b
