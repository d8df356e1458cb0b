"""Per-partition, per-round fetch/parse metrics (D5).

Capability parity: north_star — "emitting per-partition fetch/parse
metrics". partition_id is captured inside the mapInPandas fetcher (the
real task partition), so the metrics table reflects the actual salted
layout — skew is directly visible as per-partition byte/count variance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Observation

METRICS_SCHEMA = (
    "round int, partition_id int, n_fetched long, n_ok long, n_err long, "
    "n_parse_ok long, n_links_out long, bytes_in long, max_sched_offset_ms long"
)


def round_metrics(pages_log: DataFrame, round_n: int) -> DataFrame:
    """Aggregate the round's fetch log by fetch partition. Reads only the
    precomputed narrow columns (n_links/text_len are written at commit
    time) so this scan prunes html/text/links entirely."""
    return (
        pages_log.groupBy("partition_id")
        .agg(
            F.count("*").alias("n_fetched"),
            F.sum(F.when(F.col("status") == 200, 1).otherwise(0)).alias("n_ok"),
            F.sum(F.when(F.col("status") != 200, 1).otherwise(0)).alias("n_err"),
            F.sum(F.when(F.col("text_len") > 0, 1).otherwise(0)).alias("n_parse_ok"),
            F.sum(F.coalesce(F.col("n_links"), F.lit(0)).cast("long")).alias("n_links_out"),
            F.sum("bytes").alias("bytes_in"),
            F.max("sched_offset_ms").alias("max_sched_offset_ms"),
        )
        .select(F.lit(round_n).cast("int").alias("round"), "*")
    )


def observe_fetch(pages_log: DataFrame, name: str = "gpse_round") -> tuple[DataFrame, Observation]:
    """Attach round counters via `df.observe` (SURVEY §2.1 metrics sink):
    the metrics accumulate DURING whatever action consumes the returned
    DataFrame — e.g. the pages commit — so the totals cost zero extra
    scans. Complements `round_metrics` (per-partition rows need a groupBy;
    these are the free global counters), and the e2e suite cross-checks
    the two against each other. Only successful tasks contribute
    (Observation semantics), so retries never double-count."""
    obs = Observation(name)
    out = pages_log.observe(
        obs,
        F.count(F.lit(1)).alias("n_fetched"),
        F.sum(F.when(F.col("status") == 200, 1).otherwise(0)).alias("n_ok"),
        F.sum("bytes").alias("bytes_in"),
    )
    return out, obs
