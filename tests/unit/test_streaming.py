"""Structured Streaming ops: file source + AvailableNow → memory sink,
checked against the equivalent batch plan (SURVEY.md §2.9)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gpse import streaming as S
from gpse import synth


@pytest.fixture(scope="module")
def pages_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("stream_pages"))
    cfg = synth.CorpusCfg(n_pages=300, n_hosts=20, seed=42)
    synth.gen_pages(spark, cfg, partitions=3).write.mode("overwrite").parquet(d)
    return d


def test_hourly_metrics_stream_matches_batch(spark, pages_dir):
    stream = S.read_pages_stream(spark, pages_dir)
    got = S.run_available_now(S.hourly_fetch_metrics(stream), "t_hourly", mode="complete")
    batch = (
        spark.read.parquet(pages_dir)
        .groupBy(F.window("warc_ts", "1 hour").alias("w"), "lang")
        .agg(F.count("*").alias("n_pages"), F.sum(F.length("html")).alias("bytes_in"))
        .select(F.col("w.start").alias("hour"), "lang", "n_pages", "bytes_in")
        .collect()
    )
    assert sorted(map(tuple, got)) == sorted(map(tuple, batch))


def test_streaming_dedup_unique(spark, pages_dir):
    stream = S.read_pages_stream(spark, pages_dir)
    got = S.run_available_now(S.streaming_dedup_urls(stream), "t_dedup")
    hashes = [r.url_hash for r in got]
    assert len(hashes) == len(set(hashes))
    assert len(hashes) > 0


def test_sessions_stream_runs(spark, pages_dir):
    stream = S.read_pages_stream(spark, pages_dir)
    got = S.run_available_now(S.host_fetch_sessions(stream), "t_sess", mode="complete")
    assert len(got) > 0
    assert all(r.n_fetches >= 1 for r in got)


def test_host_token_bucket_state_across_microbatches(spark, tmp_path):
    """applyInPandasWithState: per-host budget must hold ACROSS micro-batches
    (maxFilesPerTrigger=1 forces several batches; state store carries the
    used-token count between them)."""
    import pyspark.sql.functions as F

    d = str(tmp_path / "tb_pages")
    cfg = synth.CorpusCfg(n_pages=200, n_hosts=5, seed=42)
    # several files → several micro-batches
    synth.gen_pages(spark, cfg, partitions=4).write.mode("overwrite").parquet(d)
    stream = (
        spark.readStream.schema(synth.PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    got = S.run_available_now(S.host_token_bucket(stream, budget_total=5), "t_bucket")
    rows = len(got)
    assert rows == spark.read.parquet(d).count()
    per_host = {}
    for r in got:
        per_host[r.host] = per_host.get(r.host, 0) + (1 if r.allowed else 0)
    assert all(v <= 5 for v in per_host.values()), per_host
    # the cap binds for the zipf-head host (more than 5 pages arrived)
    assert max(per_host.values()) == 5


def _has_protobuf() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(
    not _has_protobuf(),
    reason="transformWithStateInPandas needs google.protobuf (Spark's "
    "state-server protocol); the sandbox has no protobuf wheel and no "
    "pip mirror — the applyInPandasWithState form covers the stateful "
    "semantics, this pins the API-parity on protobuf-equipped clusters",
)
def test_transform_with_state_matches_group_state_form(spark, tmp_path):
    """transformWithStateInPandas (Spark 4 StatefulProcessor) must produce
    the SAME per-host allowed/deferred partition as the
    applyInPandasWithState token bucket — both stateful APIs, one
    semantics, state carried across micro-batches in each."""
    d = str(tmp_path / "tws_pages")
    cfg = synth.CorpusCfg(n_pages=200, n_hosts=5, seed=42)
    synth.gen_pages(spark, cfg, partitions=4).write.mode("overwrite").parquet(d)

    def stream():
        return (
            spark.readStream.schema(synth.PAGES_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(d)
        )

    def summary(rows):
        per_host = {}
        for r in rows:
            k = (r.host, r.allowed)
            per_host[k] = per_host.get(k, 0) + 1
        return per_host

    old = summary(S.run_available_now(S.host_token_bucket(stream(), 5), "t_aip"))
    new = summary(S.run_available_now(S.host_token_bucket_tws(stream(), 5), "t_tws"))
    assert old == new
    assert sum(n for (_, ok), n in new.items() if ok) > 0


def test_rolling_fetch_rate_stream_matches_batch(spark, pages_dir):
    """Sliding window (10 min / 1 min slide): streaming result must equal
    the same sliding window computed in batch over the same files."""
    stream = S.read_pages_stream(spark, pages_dir)
    got = S.run_available_now(S.rolling_fetch_rate(stream), "t_roll", mode="complete")
    batch = (
        spark.read.parquet(pages_dir)
        .groupBy(F.window("warc_ts", "10 minutes", "1 minute").alias("w"))
        .agg(F.count("*").alias("n_fetches"), F.sum(F.length("html")).alias("bytes_in"))
        .select(F.col("w.start").alias("win_start"), "n_fetches", "bytes_in")
        .collect()
    )
    assert sorted(map(tuple, got)) == sorted(map(tuple, batch))
    # every capture contributes to exactly 10 overlapping windows
    n_pages = spark.read.parquet(pages_dir).count()
    assert sum(r.n_fetches for r in got) == 10 * n_pages
