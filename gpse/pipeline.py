"""Training-data pipeline operators over a crawled corpus (task brief:
first-class alongside SURVEY.md §2): deduplication (exact, MinHash+LSH,
SimHash, n-gram Jaccard), similarity search (brute-force + LSH-bucketed
cosine), and text analysis (lang-ID, quality, token counts, fingerprints).

Everything is a declarative DataFrame plan over JVM built-ins (split /
transform / aggregate / explode / groupBy / join) — zero Python UDFs — so
each op is also expressible in ANSI SQL and oracle-checked against DuckDB.
Hash primitives default to md5 (identical in both engines), NOT xxhash64
(engine-specific), precisely so the oracle can verify the full
shingle→minhash→band→bucket-join pipeline value-for-value. MinHash
additionally offers the production `family='fast'` (one xxhash64 per
shingle + K fixed-width rehashes, ~4× faster at K=128 where hashing IS
the stage) — same plan shape, statistically interchangeable, pinned
against the md5 family at production knobs in tests.

Scale notes (100 TB design point):
  * shingling/minhash: one explode + one groupBy per doc — shuffle keyed on
    doc_id, partial aggs map-side combined;
  * LSH candidate pairs: self-join on (band, hash) — only colliding buckets
    shuffle, never the n² cross join;
  * brute-force cosine is the *baseline* (correct at any scale, quadratic
    cost); the LSH-bucketed variant is the scale path (bucket-local joins).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gpse import textfuncs
from gpse.queries import T

# Production defaults (the 100 TB design point): 128 permutations in 16
# bands of 8 rows ≈ Jaccard-0.7 knee; 64-bit SimHash (4 × 16-bit blocks,
# Hamming ≤ 3 banded by the pigeonhole principle). The ORACLE fixtures use
# deliberately small parameters so the DuckDB mirror stays tractable and
# collisions actually occur in 500-doc test tables — same code path, same
# SQL generators, different knobs.
MINHASH_K = 128        # permutations (production)
LSH_BANDS = 16         # bands of 8 rows each (production)
MINHASH_K_ORACLE = 8
LSH_BANDS_ORACLE = 4
SIMHASH_BITS = 16      # md5-nibble parity bits per block
SIMHASH_BLOCKS = 4     # 4 × 16 = 64-bit simhash
SIMHASH_MAX_HAMMING = 3  # ≤ 3 over 64 bits ⇒ ≥ 1 of 4 blocks identical
JACCARD_MAX_DF = 100   # drop stop-shingles above this doc-frequency
LSH_COS_TABLES = 4     # random-hyperplane tables
LSH_COS_BITS = 8       # sign bits per table → 256 buckets/table
_HEX = "0123456789abcdef"


# --------------------------------------------------------------------------
# shingling (shared by minhash / jaccard) — 3-token shingles, JVM-side
# --------------------------------------------------------------------------

def _tokens(col):
    return F.split(F.col(col), " ")


def exploded_shingles(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Distinct 3-token shingles, exploded to (doc_id, sh) rows.

    posexplode + lead-window instead of an array lambda: Catalyst's
    CollapseProject re-inlines split() into transform() lambdas (measured
    ~20x slowdown), while the window form tokenizes once per row and stays
    fully codegen'd. One shuffle on doc_id; that shuffle is also the one
    the downstream minhash groupBy needs, so it is reused."""
    from pyspark.sql import Window

    toks = docs.select(
        "doc_id", F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "tok")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    sh = toks.select(
        "doc_id",
        F.concat_ws(
            " ", "tok", F.lead("tok", 1).over(w), F.lead("tok", 2).over(w)
        ).alias("sh"),
        F.lead("tok", 2).over(w).alias("_t2"),
    )
    return sh.filter(F.col("_t2").isNotNull()).select("doc_id", "sh").distinct()


SQL_EXPLODED_SHINGLES = """
  SELECT DISTINCT doc_id, sh FROM (
    SELECT doc_id,
           concat_ws(' ', tok, lead(tok, 1) OVER w, lead(tok, 2) OVER w) AS sh,
           lead(tok, 2) OVER w AS t2
    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
                 generate_subscripts(string_split(text, ' '), 1) AS pos
          FROM documents)
    WINDOW w AS (PARTITION BY doc_id ORDER BY pos))
  WHERE t2 IS NOT NULL
"""


# --------------------------------------------------------------------------
# exact dedup
# --------------------------------------------------------------------------

def q_dedup_exact(spark, sf):
    """Exact dedup: md5 fingerprint → keep min doc_id per group, report
    group sizes (hash-groupBy; the 10^10-scale path is the same plan)."""
    d = T(spark, sf, "documents")
    return (
        d.withColumn("fp", textfuncs.fingerprint(F.col("text")))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("n_copies"))
        .orderBy("keep_id")
    )


SQL_DEDUP_EXACT = """
SELECT md5(text) AS fp, min(doc_id) AS keep_id, count(*) AS n_copies
FROM documents GROUP BY md5(text) ORDER BY keep_id
"""


# --------------------------------------------------------------------------
# MinHash + LSH near-dup candidates
# --------------------------------------------------------------------------

def minhash_signatures(
    docs: DataFrame, k: int = MINHASH_K, family: str = "md5"
) -> DataFrame:
    """K min-hash values per doc: explode → K parallel min-aggs (md5 at
    production K goes through a distinct-shingle dictionary join first —
    see the k >= 32 branch).

    Two permutation families, same values per family at any plan shape:
      * 'md5' (default; THE oracle family): permutation i ≙
        md5('i:' || shingle), min taken lexicographically (md5 hex is
        fixed-width, so lexicographic min == numeric min). DuckDB computes
        the identical function, so the full pipeline is value-checked.
      * 'fast' (the production family): the shingle is hashed ONCE with
        xxhash64, then permutation i is xxhash64(i, h64) — a 12-byte
        fixed-width rehash instead of an md5 over the ~40-byte shingle
        string plus hex encoding. Signed-long min over a uniform 64-bit
        family is an equally valid permutation order. Measured ~4× faster
        at the production knobs (K=128) where the md5 family spends the
        whole stage hashing. Statistically interchangeable with 'md5'
        (both approximate the same Jaccard); pair-level agreement at
        production knobs is pinned in tests/unit/test_similarity.py.
    """
    ex = exploded_shingles(docs)
    if family == "fast":
        ex = ex.select("doc_id", F.xxhash64("sh").alias("_h64"))
        aggs = [
            F.min(F.xxhash64(F.lit(i), F.col("_h64"))).alias(f"mh{i}")
            for i in range(k)
        ]
        return ex.groupBy("doc_id").agg(*aggs)
    if k >= 32:
        # Shingle-dictionary plan for production-size K (r6, guide §2.3
        # "shuffle keys/metadata instead of payloads" applied to CPU):
        # shingles repeat across near-duplicate docs (measured 9.6x at
        # sf0.1: 260k (doc,sh) rows, 27k distinct sh), so hash each
        # DISTINCT shingle once — K md5s per distinct shingle instead of
        # per occurrence — and join the K-array back by shingle before
        # the per-doc min agg. min over a doc's joined rows is the min
        # over the same value multiset, so the result is bit-identical
        # (pinned vs the direct plan in tests/unit/test_similarity.py).
        # The dict side is hinted SHUFFLE_HASH: its rows are wide
        # (K·33 B) but few, and sort-merge would sort both sides; a
        # broadcast would ship ~K·33·|dict| bytes through the driver
        # (measured 4x slower at sf0.1). Direct-plan fallback below for
        # oracle-size K, where one extra join costs more than the saved
        # hashing.
        mh = (
            ex.select("sh")
            .distinct()
            .select(
                "sh",
                F.array(
                    *[
                        F.md5(F.concat(F.lit(f"{i}:"), F.col("sh")))
                        for i in range(k)
                    ]
                ).alias("_mhs"),
            )
        )
        return (
            ex.join(mh.hint("SHUFFLE_HASH"), "sh")
            .groupBy("doc_id")
            .agg(
                *[
                    F.min(F.element_at("_mhs", i + 1)).alias(f"mh{i}")
                    for i in range(k)
                ]
            )
        )
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("sh")))).alias(f"mh{i}")
        for i in range(k)
    ]
    return ex.groupBy("doc_id").agg(*aggs)


def _sql_minhash_inner(k: int = MINHASH_K_ORACLE) -> str:
    aggs = ",\n         ".join(
        f"min(md5('{i}:' || sh)) AS mh{i}" for i in range(k)
    )
    return f"""
  WITH exploded AS ({SQL_EXPLODED_SHINGLES})
  SELECT doc_id, {aggs} FROM exploded GROUP BY doc_id
"""


def q_minhash_signatures(spark, sf):
    return minhash_signatures(T(spark, sf, "documents"), k=MINHASH_K_ORACLE).orderBy(
        "doc_id"
    )


SQL_MINHASH = _sql_minhash_inner() + " ORDER BY doc_id"


def lsh_candidate_pairs(
    sigs: DataFrame, k: int = MINHASH_K, bands: int = LSH_BANDS,
    family: str = "md5",
) -> DataFrame:
    """Band the K signatures (rows=K/bands per band), bucket-join on
    (band_id, band_hash): only colliding buckets meet — the n²-free path.
    `family` must match the signatures': 'md5' hashes each band with
    md5(concat_ws) (oracle-mirrorable); 'fast' with a multi-column
    xxhash64 over the band's long signatures (no string assembly)."""
    rows_per_band = k // bands
    if family == "fast":
        band_arr = F.array(
            *[
                F.xxhash64(
                    *[F.col(f"mh{b * rows_per_band + r}") for r in range(rows_per_band)]
                )
                for b in range(bands)
            ]
        )
    else:
        band_arr = F.array(
            *[
                F.md5(
                    F.concat_ws(
                        "|", *[F.col(f"mh{b * rows_per_band + r}") for r in range(rows_per_band)]
                    )
                )
                for b in range(bands)
            ]
        )
    banded = sigs.select("doc_id", F.posexplode(band_arr).alias("band_id", "band_hash"))
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )


def q_dedup_minhash_lsh(spark, sf):
    return lsh_candidate_pairs(
        minhash_signatures(T(spark, sf, "documents"), k=MINHASH_K_ORACLE),
        k=MINHASH_K_ORACLE,
        bands=LSH_BANDS_ORACLE,
    ).orderBy("doc_a", "doc_b")


def _sql_lsh(k: int = MINHASH_K_ORACLE, bands: int = LSH_BANDS_ORACLE) -> str:
    rows_per_band = k // bands
    band_exprs = ", ".join(
        "md5("
        + " || '|' || ".join(f"mh{b * rows_per_band + r}" for r in range(rows_per_band))
        + ")"
        for b in range(bands)
    )
    return f"""
WITH sigs AS ({_sql_minhash_inner(k)}),
banded AS (
  SELECT doc_id, u.band_id - 1 AS band_id, u.band_hash
  FROM sigs, LATERAL (
    SELECT generate_subscripts([{band_exprs}], 1) AS band_id,
           unnest([{band_exprs}]) AS band_hash) u)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM banded a JOIN banded b
  ON a.band_id = b.band_id AND a.band_hash = b.band_hash
 AND a.doc_id < b.doc_id
ORDER BY doc_a, doc_b
"""


SQL_LSH = _sql_lsh()


# --------------------------------------------------------------------------
# near-dup clusters: pairs → connected components → representatives
# --------------------------------------------------------------------------

def q_dedup_clusters(spark, sf):
    """Near-dup clustering end-to-end: MinHash-LSH candidate pairs (oracle
    knobs) → connected components (alternating large-star/small-star,
    gpse/components.py) → per-doc (cluster_id, cluster_size, keep) where
    keep marks the min-id representative — filtering on it IS the
    transitive near-dedup a production corpus needs (A~B, B~C ⇒ one
    survivor for {A,B,C}, which the raw PAIR list cannot express). The
    data-dependent ITERATIVE loop is value-checked whole: the DuckDB
    oracle computes the same closure with a recursive CTE."""
    from gpse.components import dedup_clusters as _clusters

    d = T(spark, sf, "documents")
    pairs = lsh_candidate_pairs(
        minhash_signatures(d, k=MINHASH_K_ORACLE),
        k=MINHASH_K_ORACLE,
        bands=LSH_BANDS_ORACLE,
    )
    return _clusters(d.select("doc_id"), pairs).orderBy("doc_id")


SQL_DEDUP_CLUSTERS = f"""
WITH RECURSIVE pairs AS ({_sql_lsh()}),
edges AS (SELECT doc_a AS u, doc_b AS v FROM pairs
          UNION SELECT doc_b, doc_a FROM pairs),
reach(a, b) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.a, e.v FROM reach r JOIN edges e ON r.b = e.u),
labels AS (
  SELECT d.doc_id,
         least(d.doc_id, coalesce(min(r.b), d.doc_id)) AS cluster_id
  FROM documents d LEFT JOIN reach r ON r.a = d.doc_id
  GROUP BY d.doc_id)
SELECT doc_id, cluster_id,
       count(*) OVER (PARTITION BY cluster_id) AS cluster_size,
       (doc_id = cluster_id) AS keep
FROM labels ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# n-gram Jaccard near-dup scores
# --------------------------------------------------------------------------

def q_dedup_ngram_jaccard(spark, sf, max_df: int = JACCARD_MAX_DF):
    """Exact Jaccard over 3-gram shingle sets for pairs sharing ≥1 shingle:
    explode → self-join on shingle → pair-intersection counts → |A∪B| from
    per-doc sizes. Only co-shingled pairs ever shuffle.

    Stop-shingle skew guard: shingles whose document frequency exceeds
    max_df are dropped before the self-join (one extra groupBy). At corpus
    scale a handful of boilerplate shingles ("the quick brown") would
    otherwise own the join's hottest reduce keys with O(df²) pair fan-out;
    capping df bounds any shingle's contribution to max_df². |A| / |B| in
    the Jaccard denominator are still the UNCAPPED set sizes, so the score
    only loses intersection mass from boilerplate — mirrored exactly in
    the oracle's HAVING clause."""
    d = T(spark, sf, "documents")
    ex = exploded_shingles(d)
    sizes = ex.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    rare = (
        ex.groupBy("sh")
        .agg(F.count("*").alias("_df"))
        .filter(F.col("_df") <= max_df)
        .select("sh")
    )
    ex = ex.join(rare, "sh", "left_semi")
    sh = ex.join(sizes, "doc_id").select("doc_id", "n_sh", "sh")
    a = sh.alias("a")
    b = sh.alias("b")
    pairs = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.n_sh").alias("na"),
            F.col("b.n_sh").alias("nb"),
        )
        .agg(F.count("*").alias("inter"))
    )
    return (
        pairs.withColumn(
            "jaccard",
            F.round(F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 5),
        )
        .filter(F.col("jaccard") >= 0.2)
        .select("doc_a", "doc_b", "jaccard")
        .orderBy("doc_a", "doc_b")
    )


SQL_JACCARD = f"""
WITH ex1 AS ({SQL_EXPLODED_SHINGLES}),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM ex1 GROUP BY doc_id),
rare AS (SELECT sh FROM ex1 GROUP BY sh HAVING count(*) <= {JACCARD_MAX_DF}),
ex0 AS (SELECT ex1.doc_id, ex1.sh FROM ex1 JOIN rare ON ex1.sh = rare.sh),
ex AS (SELECT ex0.doc_id, n_sh, sh FROM ex0 JOIN sizes ON ex0.doc_id = sizes.doc_id),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.n_sh AS na, b.n_sh AS nb,
         count(*) AS inter
  FROM ex a JOIN ex b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2, 3, 4)
SELECT doc_a, doc_b, round(inter / (na + nb - inter), 5) AS jaccard
FROM pairs WHERE round(inter / (na + nb - inter), 5) >= 0.2
ORDER BY doc_a, doc_b
"""


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------

def simhash(
    docs: DataFrame, text_col: str = "text", blocks: int = SIMHASH_BLOCKS
) -> DataFrame:
    """64-bit SimHash as `blocks` × 16-bit block columns (b0..b3): block k
    bit j of a token is parity(md5('k:'||token)[j]); doc bit set iff the
    ±1 sum over tokens is > 0. Block columns instead of one packed int64:
    bit 63 would flip the sign in BOTH engines' BIGINT, and the banded
    pair join needs the blocks anyway. Pure relational ops (one explode +
    blocks×16 conditional sums, one shuffle) → SQL-mirrorable."""
    ex = docs.select("doc_id", F.explode(_tokens(text_col)).alias("tok"))
    for k in range(blocks):
        ex = ex.withColumn(f"h{k}", F.md5(F.concat(F.lit(f"{k}:"), F.col("tok"))))
    sums = [
        F.sum(
            F.when(
                ((F.instr(F.lit(_HEX), F.substring(f"h{k}", j + 1, 1)) - 1) % 2) == 1, 1
            ).otherwise(-1)
        ).alias(f"s{k}_{j}")
        for k in range(blocks)
        for j in range(SIMHASH_BITS)
    ]
    agg = ex.groupBy("doc_id").agg(*sums)
    cols = [F.col("doc_id")]
    for k in range(blocks):
        blk = None
        for j in range(SIMHASH_BITS):
            bit = F.when(F.col(f"s{k}_{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
            blk = bit if blk is None else blk + bit
        cols.append(blk.cast("long").alias(f"b{k}"))
    return agg.select(*cols)


def q_dedup_simhash(spark, sf):
    return simhash(T(spark, sf, "documents")).orderBy("doc_id")


def _sql_simhash_inner(blocks: int = SIMHASH_BLOCKS) -> str:
    sums = ",\n       ".join(
        f"sum(CASE WHEN (strpos('{_HEX}', substring(md5('{k}:' || tok), {j + 1}, 1)) - 1) % 2 = 1"
        f" THEN 1 ELSE -1 END) AS s{k}_{j}"
        for k in range(blocks)
        for j in range(SIMHASH_BITS)
    )
    blks = ",\n         ".join(
        "CAST("
        + " + ".join(
            f"(CASE WHEN s{k}_{j} > 0 THEN {1 << j} ELSE 0 END)"
            for j in range(SIMHASH_BITS)
        )
        + f" AS BIGINT) AS b{k}"
        for k in range(blocks)
    )
    return f"""
  WITH ex AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
  sums AS (SELECT doc_id, {sums} FROM ex GROUP BY doc_id)
  SELECT doc_id, {blks} FROM sums
"""


SQL_SIMHASH = _sql_simhash_inner() + " ORDER BY doc_id"


def simhash_near_pairs(
    sims: DataFrame,
    blocks: int = SIMHASH_BLOCKS,
    max_hamming: int = SIMHASH_MAX_HAMMING,
) -> DataFrame:
    """Near-dup pairs by Hamming ≤ max_hamming over the 64-bit simhash —
    WITHOUT the n² cross join. Pigeonhole banding: two hashes within
    Hamming ≤ 3 of each other differ in at most 3 of the 4 blocks, so at
    least one block matches exactly. Explode to (doc_id, block_id,
    block_val), equi-join on the block, then rescore candidates with the
    exact popcount. Only block-colliding pairs ever shuffle — the same
    n²-free shape as MinHash-LSH."""
    blk_cols = [f"b{k}" for k in range(blocks)]
    banded = sims.select(
        "doc_id", *blk_cols, F.posexplode(F.array(*blk_cols)).alias("blk_id", "blk_val")
    )
    a = banded.alias("a")
    b = banded.alias("b")
    ham = None
    for k in range(blocks):
        x = F.bit_count(F.col(f"a.b{k}").bitwiseXOR(F.col(f"b.b{k}")))
        ham = x if ham is None else ham + x
    return (
        a.join(
            b,
            (F.col("a.blk_id") == F.col("b.blk_id"))
            & (F.col("a.blk_val") == F.col("b.blk_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("hamming").cast("int").alias("hamming"),
        )
        .distinct()
    )


def q_dedup_simhash_pairs(spark, sf):
    return simhash_near_pairs(simhash(T(spark, sf, "documents"))).orderBy(
        "doc_a", "doc_b"
    )


def _sql_simhash_pairs(blocks: int = SIMHASH_BLOCKS) -> str:
    blk_list = ", ".join(f"b{k}" for k in range(blocks))
    ham = " + ".join(f"bit_count(xor(a.b{k}, b.b{k}))" for k in range(blocks))
    return f"""
WITH sims AS ({_sql_simhash_inner(blocks)}),
banded AS (
  SELECT doc_id, {blk_list}, u.blk_id - 1 AS blk_id, u.blk_val
  FROM sims, LATERAL (
    SELECT generate_subscripts([{blk_list}], 1) AS blk_id,
           unnest([{blk_list}]) AS blk_val) u)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b, ({ham})::INT AS hamming
FROM banded a JOIN banded b
  ON a.blk_id = b.blk_id AND a.blk_val = b.blk_val AND a.doc_id < b.doc_id
WHERE ({ham}) <= {SIMHASH_MAX_HAMMING}
ORDER BY doc_a, doc_b
"""


SQL_SIMHASH_PAIRS = _sql_simhash_pairs()


# --------------------------------------------------------------------------
# similarity search over embeddings
# --------------------------------------------------------------------------

def _cosine(a_col: str, b_col: str):
    dot = F.aggregate(
        F.zip_with(F.col(a_col), F.col(b_col), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    na = F.sqrt(
        F.aggregate(
            F.col(a_col), F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )
    nb = F.sqrt(
        F.aggregate(
            F.col(b_col), F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )
    return dot / (na * nb)


_SQL_COS = (
    "list_aggregate(list_transform(range(1, len(a.embedding) + 1), "
    "i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE), 'sum') / "
    "(sqrt(list_aggregate(list_transform(a.embedding, x -> x::DOUBLE * x::DOUBLE), 'sum')) * "
    "sqrt(list_aggregate(list_transform(b.embedding, x -> x::DOUBLE * x::DOUBLE), 'sum')))"
)


def q_similarity_bruteforce(spark, sf):
    """Brute-force cosine matches ≥ 0.25 for 5 query vectors — the exact
    baseline every ANN variant is judged against. zip_with+aggregate keeps
    the arithmetic JVM-side; the query side is broadcast."""
    v = T(spark, sf, "embeddings")
    q = v.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    pairs = v.alias("b").join(F.broadcast(q).alias("a"), F.col("query_id") < F.col("vec_id"))
    return (
        pairs.withColumn("cos", _cosine("qvec", "embedding"))
        .filter(F.col("cos") >= 0.25)
        .select("query_id", "vec_id", F.round("cos", 4).alias("cos_sim"))
        .orderBy("query_id", "vec_id")
    )


SQL_SIM_BRUTE = f"""
SELECT a.vec_id AS query_id, b.vec_id AS vec_id, round({_SQL_COS}, 4) AS cos_sim
FROM embeddings a JOIN embeddings b ON a.vec_id < 5 AND a.vec_id < b.vec_id
WHERE {_SQL_COS} >= 0.25
ORDER BY query_id, vec_id
"""


def q_similarity_topk(spark, sf):
    """Brute-force top-3 neighbours per query vector (rank via row_number —
    no SQL oracle: float rank ties make cross-engine rank order unstable;
    driver records the rows-only check)."""
    from pyspark.sql import Window

    v = T(spark, sf, "embeddings")
    q = v.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    pairs = v.alias("b").join(F.broadcast(q).alias("a"), F.col("query_id") != F.col("vec_id"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), "vec_id")
    return (
        pairs.withColumn("cos", _cosine("qvec", "embedding"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("query_id", "rank", "vec_id", F.round("cos", 4).alias("cos_sim"))
        .orderBy("query_id", "rank")
    )


EMB_DIM = 64  # driver testdata embedding dimensionality (TESTDATA.md)


def _hyperplane_signs(table: int, bit: int, dim: int = EMB_DIM) -> list[int]:
    """Deterministic ±1 random-hyperplane weights, seeded by (table, bit,
    dim-index) through md5 — reproducible in any engine, embedded as
    LITERALS on both sides so Spark and the DuckDB oracle use bit-identical
    hyperplanes."""
    import hashlib

    return [
        1 if int(hashlib.md5(f"{table}:{bit}:{d}".encode()).hexdigest()[0], 16) % 2 else -1
        for d in range(dim)
    ]


def _cos_bucket_col(col: str, table: int, bits: int = LSH_COS_BITS, dim: int = EMB_DIM):
    """Sign-bit bucket for one hyperplane table: bit j = (w_tj · x ≥ 0).
    All JVM-side (zip_with + aggregate over a literal weight array)."""
    out = None
    for j in range(bits):
        w = F.array(*[F.lit(float(s)) for s in _hyperplane_signs(table, j, dim)])
        dot = F.aggregate(
            F.zip_with(F.col(col), w, lambda x, s: x.cast("double") * s),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bit = F.when(dot >= 0, F.lit(1 << j)).otherwise(F.lit(0))
        out = bit if out is None else out + bit
    return out.cast("int")


def cosine_lsh_pairs(
    vectors: DataFrame,
    threshold: float = 0.25,
    tables: int = LSH_COS_TABLES,
    bits: int = LSH_COS_BITS,
    dim: int = EMB_DIM,
) -> DataFrame:
    """Banded random-hyperplane LSH (the scale path): `tables` independent
    `bits`-bit signatures; a pair is a candidate iff it collides in ANY
    table (explode → slim equi-join per table → distinct ids), then exact
    cosine rescoring joins the embeddings back by id. Bucket-local joins:
    expected pair count ≈ tables · n²/2^bits (vs n²/8 for the old fixed
    3-bit variant); embeddings never ride through the pair explosion.

    Two measured plan economies (same values, ~40% faster at sf0.1):
    the slim banded table is persisted so the tables×bits hyperplane
    expressions — large codegen units — are computed once instead of on
    both sides of the self-join (n·tables rows of 3 ints), and each
    vector's norm is computed once in the rescoring projections rather
    than once per candidate pair (cos = dot/(na·nb), bit-identical
    association to the inline form). The candidate-id set is then
    materialized via an eager localCheckpoint so the banded cache can be
    RELEASED before returning — without it every invocation leaked a
    cached RDD until LRU eviction (ADVICE r02); the checkpoint RDD itself
    is reference-counted and reclaimed by the ContextCleaner when the
    result is dropped."""
    from pyspark import StorageLevel

    buckets = F.array(*[_cos_bucket_col("embedding", t, bits, dim) for t in range(tables)])
    banded = vectors.select(
        "vec_id", F.posexplode(buckets).alias("tbl", "bucket")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.tbl") == F.col("b.tbl"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    banded.unpersist()
    norm = F.sqrt(
        F.aggregate(
            F.col("embedding"), F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )
    vn = vectors.select("vec_id", "embedding", norm.alias("nrm"))
    va = vn.select(
        F.col("vec_id").alias("vec_a"), F.col("embedding").alias("emb_a"), F.col("nrm").alias("na")
    )
    vb = vn.select(
        F.col("vec_id").alias("vec_b"), F.col("embedding").alias("emb_b"), F.col("nrm").alias("nb")
    )
    dot = F.aggregate(
        F.zip_with(F.col("emb_a"), F.col("emb_b"), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        cand.join(va, "vec_a")
        .join(vb, "vec_b")
        .withColumn("cos", dot / (F.col("na") * F.col("nb")))
        .filter(F.col("cos") >= threshold)
        .select("vec_a", "vec_b", F.round("cos", 4).alias("cos_sim"))
    )


def q_similarity_lsh(spark, sf):
    return cosine_lsh_pairs(T(spark, sf, "embeddings")).orderBy("vec_a", "vec_b")


def _sql_cos_bucket(table: int, bits: int = LSH_COS_BITS, dim: int = EMB_DIM) -> str:
    terms = []
    for j in range(bits):
        w = "[" + ", ".join(str(s) for s in _hyperplane_signs(table, j, dim)) + "]"
        dot = (
            f"list_aggregate(list_transform(range(1, {dim + 1}), "
            f"i -> embedding[i]::DOUBLE * ({w}::DOUBLE[])[i]), 'sum')"
        )
        terms.append(f"(CASE WHEN {dot} >= 0 THEN {1 << j} ELSE 0 END)")
    return "(" + " + ".join(terms) + ")::INT"


def _sql_sim_lsh(tables: int = LSH_COS_TABLES) -> str:
    bucket_arr = "[" + ", ".join(_sql_cos_bucket(t) for t in range(tables)) + "]"
    cos = _SQL_COS.replace("a.embedding", "va.embedding").replace(
        "b.embedding", "vb.embedding"
    )
    return f"""
WITH v AS (SELECT vec_id, embedding, {bucket_arr} AS buckets FROM embeddings),
banded AS (
  SELECT vec_id, u.tbl, u.bucket
  FROM v, LATERAL (SELECT generate_subscripts(buckets, 1) AS tbl,
                          unnest(buckets) AS bucket) u),
cand AS (
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM banded a JOIN banded b
    ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.vec_id < b.vec_id)
SELECT vec_a, vec_b, round({cos}, 4) AS cos_sim
FROM cand JOIN embeddings va ON cand.vec_a = va.vec_id
          JOIN embeddings vb ON cand.vec_b = vb.vec_id
WHERE {cos} >= 0.25
ORDER BY vec_a, vec_b
"""


SQL_SIM_LSH = _sql_sim_lsh()


# --------------------------------------------------------------------------
# text analysis
# --------------------------------------------------------------------------

def q_tokens_fingerprints(spark, sf):
    """Token counting (whitespace + BPE-ish word tokens) AND document
    fingerprinting (md5 full/short, sha256) in one per-doc projection —
    two text-analysis ops, one driver correctness row."""
    d = T(spark, sf, "documents")
    return d.select(
        "doc_id",
        textfuncs.token_count(F.col("text")).alias("n_tokens"),
        textfuncs.word_token_count(F.col("text")).alias("n_word_tokens"),
        F.length("text").alias("n_chars_measured"),
        textfuncs.fingerprint(F.col("text")).alias("fp"),
        F.substring(textfuncs.fingerprint(F.col("text")), 1, 8).alias("fp_short"),
        F.sha2(F.encode("text", "UTF-8"), 256).alias("sha256"),
    ).orderBy("doc_id")


SQL_TOKENS_FP = """
SELECT doc_id,
       len(list_filter(string_split_regex(lower(text), '\\s+'), t -> t != '')) AS n_tokens,
       len(list_filter(string_split_regex(
           regexp_replace(text, '[A-Za-z]+|[0-9]+', ' W ', 'g'), '\\s+'),
           t -> t != '')) AS n_word_tokens,
       length(text) AS n_chars_measured,
       md5(text) AS fp, substring(md5(text), 1, 8) AS fp_short,
       sha256(text) AS sha256
FROM documents ORDER BY doc_id
"""


def q_lang_id(spark, sf):
    """Stopword-ratio language ID vs the table's labeled lang."""
    d = T(spark, sf, "documents")
    return (
        d.select("doc_id", "lang", textfuncs.lang_id(F.col("text")).alias("lang_pred"))
        .orderBy("doc_id")
    )


def _sql_ratio(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in textfuncs.STOPWORDS[lang])
    return (
        f"(len(list_filter(toks, t -> t IN ({words})))::DOUBLE / "
        f"greatest(len(toks), 1))"
    )


SQL_LANG_ID = f"""
WITH t AS (
  SELECT doc_id, lang,
         list_filter(string_split_regex(lower(text), '\\s+'), t -> t != '') AS toks
  FROM documents),
s AS (
  SELECT doc_id, lang,
         {_sql_ratio('en')} AS s_en, {_sql_ratio('de')} AS s_de,
         {_sql_ratio('fr')} AS s_fr, {_sql_ratio('pl')} AS s_pl,
         {_sql_ratio('es')} AS s_es
  FROM t)
SELECT doc_id, lang,
       CASE WHEN greatest(s_en, s_de, s_fr, s_pl, s_es) <= 0 THEN 'und'
            WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_pl AND s_en >= s_es THEN 'en'
            WHEN s_de >= s_fr AND s_de >= s_pl AND s_de >= s_es THEN 'de'
            WHEN s_fr >= s_pl AND s_fr >= s_es THEN 'fr'
            WHEN s_pl >= s_es THEN 'pl'
            ELSE 'es' END AS lang_pred
FROM s ORDER BY doc_id
"""


def q_quality_scores(spark, sf):
    d = T(spark, sf, "documents")
    return d.select(
        "doc_id",
        F.round(textfuncs.punct_ratio(F.col("text")), 5).alias("punct_ratio"),
        F.round(textfuncs.stopword_ratio(F.col("text"), "en"), 5).alias("stopword_ratio_en"),
        F.round(textfuncs.quality_score(F.col("text")), 5).alias("quality"),
    ).orderBy("doc_id")


_SQL_EN_RATIO = _sql_ratio("en")

SQL_QUALITY = f"""
WITH t AS (
  SELECT doc_id, text,
         list_filter(string_split_regex(lower(text), '\\s+'), t -> t != '') AS toks
  FROM documents)
SELECT doc_id,
       round(length(regexp_replace(text, '[^.,;:!?''"()\\[\\]{{}}]', '', 'g'))::DOUBLE
             / greatest(length(text), 1), 5) AS punct_ratio,
       round({_SQL_EN_RATIO}, 5) AS stopword_ratio_en,
       round((least(length(text) / 200.0, 1.0)
            + least(len(toks) / 40.0, 1.0)
            + greatest(0.0, 1.0 - (length(regexp_replace(text, '[^.,;:!?''"()\\[\\]{{}}]', '', 'g'))::DOUBLE
                                   / greatest(length(text), 1)) * 4)) / 3.0, 5) AS quality
FROM t ORDER BY doc_id
"""


QUERIES: dict[str, tuple[Callable, str | None]] = {
    "dedup_exact": (q_dedup_exact, SQL_DEDUP_EXACT),
    "minhash_signatures": (q_minhash_signatures, SQL_MINHASH),
    "dedup_minhash_lsh": (q_dedup_minhash_lsh, SQL_LSH),
    "dedup_clusters": (q_dedup_clusters, SQL_DEDUP_CLUSTERS),
    "dedup_ngram_jaccard": (q_dedup_ngram_jaccard, SQL_JACCARD),
    "dedup_simhash": (q_dedup_simhash, SQL_SIMHASH),
    "dedup_simhash_pairs": (q_dedup_simhash_pairs, SQL_SIMHASH_PAIRS),
    "similarity_bruteforce": (q_similarity_bruteforce, SQL_SIM_BRUTE),
    "similarity_lsh": (q_similarity_lsh, SQL_SIM_LSH),
    "tokens_fingerprints": (q_tokens_fingerprints, SQL_TOKENS_FP),
    "lang_id": (q_lang_id, SQL_LANG_ID),
    "quality_scores": (q_quality_scores, SQL_QUALITY),
}

# --------------------------------------------------------------------------
# grouped-map & cogrouped applyInPandas (the Python-UDAF idiom, §2.4/§2.10)
# --------------------------------------------------------------------------

def q_group_sample(spark, sf):
    """Deterministic per-group sample (the reservoir-sample UDAF pattern):
    keep the k=3 docs per source with smallest md5('42:'||doc_id) — a seeded
    hash order, so the 'random' sample is reproducible AND SQL-mirrorable.
    Grouped-map applyInPandas = Spark's Python-UDAF idiom."""
    import hashlib

    import pandas as pd

    d = T(spark, sf, "documents")

    def pick(pdf: pd.DataFrame) -> pd.DataFrame:
        h = [hashlib.md5(f"42:{i}".encode()).hexdigest() for i in pdf["doc_id"]]
        out = pdf.assign(_h=h).sort_values("_h").head(3)
        return out[["source", "doc_id"]]

    return (
        d.groupBy("source")
        .applyInPandas(pick, "source string, doc_id long")
        .orderBy("source", "doc_id")
    )


SQL_GROUP_SAMPLE = """
SELECT source, doc_id FROM (
  SELECT source, doc_id,
         row_number() OVER (PARTITION BY source ORDER BY md5('42:' || doc_id)) AS rn
  FROM documents) WHERE rn <= 3
ORDER BY source, doc_id
"""

_LANG_WEIGHTS = {"en": 1.5, "de": 1.2, "fr": 1.1, "es": 1.0, "zh": 0.8, "pl": 0.9}


def q_cogroup_lang_stats(spark, sf):
    """Cogrouped applyInPandas: documents ⊳⊲ per-lang reference weights,
    custom pandas merge per key (the frontier⊳⊲policy fallback pattern,
    §2.10)."""
    import pandas as pd

    d = T(spark, sf, "documents")
    ref = spark.createDataFrame(
        [(k, v) for k, v in _LANG_WEIGHTS.items()], "lang string, weight double"
    )

    def merge(key, docs: pd.DataFrame, refs: pd.DataFrame) -> pd.DataFrame:
        w = float(refs["weight"].iloc[0]) if len(refs) else 0.0
        return pd.DataFrame(
            {
                "lang": [key[0]],
                "n_docs": [len(docs)],
                "weighted": [round(len(docs) * w, 2)],
            }
        )

    return (
        d.groupBy("lang")
        .cogroup(ref.groupBy("lang"))
        .applyInPandas(merge, "lang string, n_docs long, weighted double")
        .filter(F.col("n_docs") > 0)
        .orderBy("lang")
    )


def _sql_cogroup() -> str:
    cases = " ".join(f"WHEN '{k}' THEN {v}" for k, v in _LANG_WEIGHTS.items())
    return f"""
SELECT lang, count(*) AS n_docs,
       round(count(*) * (CASE lang {cases} ELSE 0.0 END), 2) AS weighted
FROM documents GROUP BY lang ORDER BY lang
"""


SQL_COGROUP = _sql_cogroup()


QUERIES.update(
    {
        "group_sample": (q_group_sample, SQL_GROUP_SAMPLE),
        "cogroup_lang_stats": (q_cogroup_lang_stats, SQL_COGROUP),
    }
)

# --------------------------------------------------------------------------
# IVF-style ANN (coarse k-means quantizer → probe nearest cells)
# --------------------------------------------------------------------------

def ivf_assign(spark, vectors: DataFrame, k: int = 8, seed: int = 42):
    """Train a coarse quantizer (pyspark.ml KMeans, fixed seed) and assign
    every vector to its cell. Returns (assigned_df, centers list)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    v = vectors.withColumn("features", array_to_vector(F.col("embedding").cast("array<double>")))
    km = KMeans(k=k, seed=seed, maxIter=10, featuresCol="features", predictionCol="cell")
    model = km.fit(v)
    assigned = model.transform(v).drop("features")
    centers = [c.tolist() for c in model.clusterCenters()]
    return assigned, centers


def ivf_probe_cells(queries: DataFrame, centers: list[list[float]],
                    nprobe: int = 4, qvec_col: str = "qvec") -> DataFrame:
    """nprobe nearest IVF cells per query, computed IN-PLAN: the centroids
    (inherently driver-side — KMeans.fit returns them) are embedded as
    literal arrays, each query row evaluates its squared distance to every
    centroid JVM-side (zip_with + aggregate), and array_sort over
    (dist, cell) structs picks the nprobe closest (ties break by cell id —
    deterministic). One output row per (query, probed cell).

    This replaces the r2 driver-side numpy loop over collected query rows
    (VERDICT r02 #5): a query TABLE of any size now works with no
    `.collect()` and no per-query driver work — the probe is O(k·dim) per
    row inside whole-stage codegen, exactly like the hyperplane-LSH bucket
    columns."""
    structs = []
    for i, center in enumerate(centers):
        w = F.array(*[F.lit(float(c)) for c in center])
        d2 = F.aggregate(
            F.zip_with(
                F.col(qvec_col), w,
                lambda x, c: (x.cast("double") - c) * (x.cast("double") - c),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        structs.append(F.struct(d2.alias("dist"), F.lit(i).alias("cell")))
    top = F.slice(F.array_sort(F.array(*structs)), 1, nprobe)
    return queries.withColumn(
        "cell", F.explode(F.transform(top, lambda s: s["cell"]))
    )


def ivf_batch_topk(
    assigned: DataFrame,
    queries: DataFrame,
    centers: list[list[float]],
    nprobe: int = 4,
    k: int = 3,
) -> DataFrame:
    """Batch ANN for a query TABLE (the many-query scale path; VERDICT r02
    'missing' #4 follow-through). Physical shape:

      1. `ivf_probe_cells` fans each query out to its nprobe nearest
         cells IN-PLAN (literal centroids — no driver loop, any |Q|);
      2. queries and index vectors COGROUP on `cell`: each task receives
         one cell's queries and that cell's vectors and computes the full
         dot-product block as ONE numpy float64 GEMM (Arrow in, BLAS
         inside — the fastest possible per-pair math), emitting only each
         query's per-cell top-k — k·nprobe rows per query leave Python,
         never |cell| rows;
      3. a global row_number window over (query_id) merges the per-cell
         partials into the final top-k.

    Shuffles: queries once (by cell — slim), vectors once (by cell).
    Cell skew is bounded by k-means balance; residual skew is AQE's job.
    Exactness per probed cell: cosine is the same float64 math as the
    zip_with plan (association differs ⇒ compare at 1e-6; unit-tested)."""
    import numpy as np

    from pyspark.sql import Window

    probe = ivf_probe_cells(queries, centers, nprobe)  # query_id, qvec, cell

    out_schema = "query_id long, vec_id long, cos double"

    def gemm(key, qdf, vdf):
        import numpy as np
        import pandas as pd

        if qdf.empty or vdf.empty:
            return pd.DataFrame({"query_id": [], "vec_id": [], "cos": []}).astype(
                {"query_id": "int64", "vec_id": "int64", "cos": "float64"}
            )
        Q = np.stack(qdf["qvec"].to_numpy()).astype(np.float64)       # |q| × d
        V = np.stack(vdf["embedding"].to_numpy()).astype(np.float64)  # |v| × d
        sims = (Q @ V.T) / (
            np.linalg.norm(Q, axis=1)[:, None] * np.linalg.norm(V, axis=1)[None, :]
        )
        qids = qdf["query_id"].to_numpy()
        vids = vdf["vec_id"].to_numpy()
        # mask self-matches, then per-query partial top-k within this cell
        sims[qids[:, None] == vids[None, :]] = -np.inf
        kk = min(k, sims.shape[1])
        part = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
        rows_q = np.repeat(qids, kk)
        rows_v = vids[part.ravel()]
        rows_c = np.take_along_axis(sims, part, axis=1).ravel()
        keep = np.isfinite(rows_c)
        return pd.DataFrame(
            {"query_id": rows_q[keep], "vec_id": rows_v[keep], "cos": rows_c[keep]}
        )

    partials = (
        probe.groupBy("cell")
        .cogroup(assigned.select("cell", "vec_id", "embedding").groupBy("cell"))
        .applyInPandas(gemm, out_schema)
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), "vec_id")
    return (
        partials.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", F.round("cos", 4).alias("cos_sim"))
    )


def q_similarity_ivf(spark, sf):
    """IVF ANN: coarse k-means cells; each query probes its nprobe=4 nearest
    cells only (half the index) — the scale path where brute force is the
    n² baseline. Random synthetic embeddings cluster weakly, so nprobe is
    generous here; a real embedding space concentrates neighbors in 1-2
    cells. Cell selection is in-plan (ivf_probe_cells) — no driver loop,
    so a query table works at any size.
    Returns top-3 per query from the probed cells (rows-only: k-means is
    not SQL-expressible; recall vs brute force is pinned by a unit test)."""
    from pyspark.sql import Window

    v = T(spark, sf, "embeddings")
    assigned, centers = ivf_assign(spark, v)

    qv = assigned.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    probe = ivf_probe_cells(qv, centers, nprobe=4)
    # query side broadcast: right for few-to-modest query counts; a huge
    # query table would flip this join the same way fetch_from_corpus
    # size-switches its batch side
    cand = assigned.join(F.broadcast(probe), "cell").filter(
        F.col("vec_id") != F.col("query_id")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), "vec_id")
    return (
        cand.withColumn("cos", _cosine("qvec", "embedding"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("query_id", "rank", "vec_id", F.round("cos", 4).alias("cos_sim"))
        .orderBy("query_id", "rank")
    )


# --------------------------------------------------------------------------
# end-to-end corpus cleaning (the composition a training pipeline runs)
# --------------------------------------------------------------------------

def q_corpus_clean(spark, sf):
    """CCNet-style corpus cleaning as ONE declarative plan: exact dedup
    (md5 fingerprint, keep min doc_id) -> language-ID filter (!= 'und') ->
    quality floor -> token-count band. Composes the building blocks this
    module value-checks individually; the oracle mirrors the WHOLE
    composition, so the interaction of the stages is itself verified. At
    corpus scale this is one fingerprint window + per-row JVM expressions
    - no extra shuffles beyond the dedup groupBy."""
    from pyspark.sql import Window

    d = T(spark, sf, "documents")
    x = d.select(
        "doc_id",
        textfuncs.fingerprint(F.col("text")).alias("fp"),
        textfuncs.lang_id(F.col("text")).alias("lang_pred"),
        F.round(textfuncs.quality_score(F.col("text")), 5).alias("quality"),
        textfuncs.token_count(F.col("text")).alias("n_tokens"),
    )
    w = Window.partitionBy("fp")
    x = x.withColumn("_keep", F.min("doc_id").over(w)).filter(
        F.col("doc_id") == F.col("_keep")
    )
    return (
        x.filter(
            (F.col("lang_pred") != "und")
            & (F.col("quality") >= 0.5)
            & F.col("n_tokens").between(10, 10000)
        )
        .select("doc_id", "lang_pred", "n_tokens", "quality")
        .orderBy("doc_id")
    )


_SQL_QUALITY_EXPR = (
    "round((least(length(text) / 200.0, 1.0)"
    " + least(len(toks) / 40.0, 1.0)"
    " + greatest(0.0, 1.0 - (length(regexp_replace(text, '[^.,;:!?''\"()\\[\\]{}]', '', 'g'))::DOUBLE"
    "                        / greatest(length(text), 1)) * 4)) / 3.0, 5)"
)

SQL_CORPUS_CLEAN = f"""
WITH t AS (
  SELECT doc_id, text, md5(text) AS fp,
         list_filter(string_split_regex(lower(text), '\\s+'), t -> t != '') AS toks
  FROM documents),
s AS (
  SELECT doc_id, fp, len(toks) AS n_tokens,
         {_SQL_QUALITY_EXPR} AS quality,
         {_sql_ratio('en')} AS s_en, {_sql_ratio('de')} AS s_de,
         {_sql_ratio('fr')} AS s_fr, {_sql_ratio('pl')} AS s_pl,
         {_sql_ratio('es')} AS s_es,
         min(doc_id) OVER (PARTITION BY md5(text)) AS keep_id
  FROM t),
labeled AS (
  SELECT doc_id, fp, n_tokens, quality, keep_id,
         CASE WHEN greatest(s_en, s_de, s_fr, s_pl, s_es) <= 0 THEN 'und'
              WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_pl AND s_en >= s_es THEN 'en'
              WHEN s_de >= s_fr AND s_de >= s_pl AND s_de >= s_es THEN 'de'
              WHEN s_fr >= s_pl AND s_fr >= s_es THEN 'fr'
              WHEN s_pl >= s_es THEN 'pl'
              ELSE 'es' END AS lang_pred
  FROM s)
SELECT doc_id, lang_pred, n_tokens, quality FROM labeled
WHERE doc_id = keep_id AND lang_pred != 'und' AND quality >= 0.5
  AND n_tokens BETWEEN 10 AND 10000
ORDER BY doc_id
"""


def q_similarity_ann(spark, sf):
    """ANN top-k, both strategies in one tagged result (rows-only: float
    rank ties are engine-unstable and k-means is not SQL-expressible):
    'brute' = exact top-3 per query via broadcast + window (the baseline);
    'ivf' = coarse-k-means cells with nprobe probing (the scale path).
    Recall of ivf vs brute is pinned by tests/unit/test_similarity.py."""
    brute = q_similarity_topk(spark, sf).select(
        F.lit("brute").alias("method"), "query_id", "rank", "vec_id", "cos_sim"
    )
    ivf = q_similarity_ivf(spark, sf).select(
        F.lit("ivf").alias("method"), "query_id", "rank", "vec_id", "cos_sim"
    )
    return brute.unionByName(ivf).orderBy("method", "query_id", "rank")


def q_similarity_ivf_batch(spark, sf):
    """Batch ANN over a query TABLE: every embedding vector queries the
    IVF index at once (ivf_probe_cells in-plan probe + cell-cogrouped
    numpy GEMM with per-cell partial top-k + window merge — the many-query
    scale path; queries and vectors each shuffle exactly once, by cell).
    Rows-only: k-means is not SQL-expressible; the result is pinned
    numpy-oracle-EXACT over all queries in tests/unit/test_similarity.py."""
    v = T(spark, sf, "embeddings")
    assigned, centers = ivf_assign(spark, v)
    qv = assigned.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    return ivf_batch_topk(assigned, qv, centers, nprobe=4, k=3).orderBy(
        "query_id", "rank"
    )


QUERIES.update(
    {
        "similarity_ann": (q_similarity_ann, None),
        "similarity_ivf_batch": (q_similarity_ivf_batch, None),
        "corpus_clean": (q_corpus_clean, SQL_CORPUS_CLEAN),
    }
)
