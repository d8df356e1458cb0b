"""URL-seen set: partitioned bloom pre-filter + exact anti-join (D3).

Capability parity: north_star — "a partitioned bloom/cuckoo-filter URL-seen
set keyed by canonicalized URL hash". Two physical layers (SURVEY.md §1.2):

  * ``seen_exact(url_hash, first_round)`` — ground truth, hash-partitioned
    on url_hash; dedup correctness is asserted ONLY on this layer.
  * per-bucket bloom blobs — a cheap pre-filter so that at 10^10-URL scale
    the expensive shuffled anti-join only sees candidates the bloom cannot
    rule out. Bloom false positives cost one extra probe; false negatives
    are impossible (property-tested), so correctness never depends on it.

At sandbox scale both paths run; at cluster scale the bloom blobs (a few
MB per bucket) broadcast to every executor while seen_exact stays sharded.

PySpark 4.1.2 exposes no df.stat.bloomFilter (verified), so blobs are built
with applyInPandas over groupBy(pmod(url_hash, P)) — numpy bitsets, double
hashing (Kirsch–Mitzenmacher) over splitmix64.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BooleanType

SEEN_SCHEMA = "url_hash long, first_round int"
BLOOM_SCHEMA = "bucket int, nbits long, nhashes int, bits binary"

_C1 = np.uint64(0xFF51AFD7ED558CCD)
_C2 = np.uint64(0xC4CEB9FE1A85EC53)


def _h2(keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Two independent 64-bit hashes per key (double hashing base)."""
    x = keys.astype(np.uint64)
    z = (x ^ (x >> np.uint64(33))) * _C1
    z = (z ^ (z >> np.uint64(33))) * _C2
    h1 = z ^ (z >> np.uint64(33))
    h2 = (h1 ^ x) * _C1 | np.uint64(1)  # odd → full-period stride
    return h1, h2


def _bloom_set(keys: np.ndarray, nbits: int, nhashes: int) -> np.ndarray:
    bits = np.zeros(nbits // 8, dtype=np.uint8)
    h1, h2 = _h2(keys)
    for i in range(nhashes):
        idx = (h1 + np.uint64(i) * h2) % np.uint64(nbits)
        np.bitwise_or.at(bits, (idx >> np.uint64(3)).astype(np.int64), np.uint8(1) << (idx & np.uint64(7)).astype(np.uint8))
    return bits


def _bloom_test(keys: np.ndarray, nbits: int, nhashes: int, bits: np.ndarray) -> np.ndarray:
    maybe = np.ones(len(keys), dtype=bool)
    h1, h2 = _h2(keys)
    for i in range(nhashes):
        idx = (h1 + np.uint64(i) * h2) % np.uint64(nbits)
        got = (bits[(idx >> np.uint64(3)).astype(np.int64)] >> (idx & np.uint64(7)).astype(np.uint8)) & np.uint8(1)
        maybe &= got.astype(bool)
    return maybe


def build_blooms(seen: DataFrame, n_buckets: int = 32, bits_per_key: int = 12, n_hashes: int = 6) -> DataFrame:
    """One bloom blob per url_hash bucket, rebuilt from seen_exact.

    Sized per bucket from the actual key count (power-of-two bits), so a
    skewed bucket simply gets a bigger blob rather than a worse FPR."""

    def make(pdf: pd.DataFrame) -> pd.DataFrame:
        keys = pdf["url_hash"].to_numpy(dtype=np.int64)
        nbits = 1 << max(13, int(np.ceil(np.log2(max(len(keys), 1) * bits_per_key))))
        bits = _bloom_set(keys, nbits, n_hashes)
        return pd.DataFrame(
            {
                "bucket": [int(pdf["bucket"].iloc[0])],
                "nbits": [nbits],
                "nhashes": [n_hashes],
                "bits": [bits.tobytes()],
            }
        )

    return (
        seen.withColumn("bucket", F.pmod(F.col("url_hash"), F.lit(n_buckets)).cast("int"))
        .groupBy("bucket")
        .applyInPandas(make, schema=BLOOM_SCHEMA)
    )


@pandas_udf(BooleanType())
def _maybe_seen_udf(it: Iterator[Tuple[pd.Series, pd.Series, pd.Series, pd.Series]]) -> Iterator[pd.Series]:
    for url_hash, nbits, nhashes, bits in it:
        out = np.ones(len(url_hash), dtype=bool)
        if len(url_hash):
            keys = url_hash.to_numpy(dtype=np.int64)
            # group rows by identical blob (one bucket per group in practice)
            codes, uniq = pd.factorize(bits)
            for g, blob in enumerate(uniq):
                m = codes == g
                if blob is None:
                    out[m] = False  # no blob for bucket → bloom is empty → new
                    continue
                arr = np.frombuffer(blob, dtype=np.uint8)
                out[m] = _bloom_test(keys[m], int(nbits[m].iloc[0]), int(nhashes[m].iloc[0]), arr)
        yield pd.Series(out, dtype=bool)


def dedup_new_urls(
    candidates: DataFrame,
    seen: DataFrame,
    blooms: DataFrame | None = None,
    n_buckets: int = 32,
) -> DataFrame:
    """Truly-new URLs: candidates ∖ seen_exact (north_star dedup).

    Plan shape (SURVEY.md §3.1 step 6):
      1. in-batch exact dedup — dropDuplicates on url_hash (partial+final
         hash agg, map-side combined);
      2. optional bloom pre-filter — broadcast the per-bucket blobs, keep
         the definitely-new fast path out of the anti-join entirely;
      3. exact left-anti join on url_hash for the maybe-seen remainder —
         the only shuffle, on the same key seen_exact is sharded by.
    """
    cand = candidates.dropDuplicates(["url_hash"])
    if blooms is None:
        return cand.join(seen.select("url_hash"), "url_hash", "left_anti")
    c = cand.withColumn("bucket", F.pmod(F.col("url_hash"), F.lit(n_buckets)).cast("int"))
    c = c.join(F.broadcast(blooms), "bucket", "left")
    c = c.withColumn(
        "_maybe",
        _maybe_seen_udf(F.col("url_hash"), F.col("nbits"), F.col("nhashes"), F.col("bits")),
    ).drop("nbits", "nhashes", "bits", "bucket")
    definitely_new = c.filter(~F.col("_maybe")).drop("_maybe")
    maybe = c.filter(F.col("_maybe")).drop("_maybe")
    confirmed_new = maybe.join(seen.select("url_hash"), "url_hash", "left_anti")
    return definitely_new.unionByName(confirmed_new)
