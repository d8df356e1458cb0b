"""Custom Python DataSource (gpse_synth): registration, Arrow-batch read
equality with synth.gen_pages, partition planning, and 4.1 filter
pushdown (page-id range → partition pruning; host equality → in-reader
row filter; everything else returned to Spark)."""

from __future__ import annotations

from pyspark.sql import functions as F

from gpse import synth
from gpse.datasource import SynthWebDataSource, SynthWebReader


def _register(spark):
    # pushFilters() requires the (off-by-default in 4.1) pushdown flag;
    # runtime-settable session conf
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(SynthWebDataSource)


def _load(spark, **opts):
    r = spark.read.format("gpse_synth")
    for k, v in {"n_pages": 300, "n_hosts": 15, "seed": 42, "partitions": 4, **opts}.items():
        r = r.option(k, v)
    return r.load()


def test_reads_equal_gen_pages(spark):
    """The data source must emit EXACTLY gen_pages' rows (incl. the ~5%
    second captures) for the same CorpusCfg — same generator, two source
    surfaces."""
    _register(spark)
    cfg = synth.CorpusCfg(n_pages=300, n_hosts=15, seed=42)
    key = lambda r: (r.url, r.warc_ts, bytes(r.html), r.text, r.lang)  # noqa: E731
    want = sorted(key(r) for r in synth.gen_pages(spark, cfg, 4).collect())
    got = sorted(
        key(r)
        for r in _load(spark).select("url", "warc_ts", "html", "text", "lang").collect()
    )
    assert got == want
    assert len(got) > 300  # second captures present


def test_pushdown_narrows_partition_planning():
    """pushFilters: page_id range predicates narrow the planned id range
    (partition pruning before any row is generated); host equality is
    absorbed; unsupported filters are returned to Spark by reference."""
    from pyspark.sql.datasource import (
        EqualTo,
        GreaterThanOrEqual,
        IsNotNull,
        LessThan,
    )

    r = SynthWebReader({"n_pages": "1000", "partitions": "4"})
    leftover = list(
        r.pushFilters(
            [
                GreaterThanOrEqual(("page_id",), 100),
                LessThan(("page_id",), 200),
                EqualTo(("host",), "h3.example"),
                IsNotNull(("url",)),
            ]
        )
    )
    assert (r.id_lo, r.id_hi) == (100, 200)
    assert r.host_eq == "h3.example"
    assert leftover == [IsNotNull(("url",))]
    parts = r.partitions()
    assert parts[0].start == 100 and parts[-1].end == 200
    assert len(parts) == 4  # pruned range still parallel


def test_filtered_query_end_to_end(spark):
    """A filtered read through the pushdown path returns exactly the
    brute-force filtered rows."""
    _register(spark)
    full = _load(spark, partitions=3)
    got = (
        _load(spark, partitions=3)
        .filter((F.col("page_id") >= 50) & (F.col("page_id") < 90))
        .filter(F.col("host") == "h0.example")
        .select("page_id", "url")
        .collect()
    )
    want = (
        full.filter((F.col("page_id") >= 50) & (F.col("page_id") < 90))
        .filter(F.col("host") == "h0.example")
        .select("page_id", "url")
        .collect()
    )
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
    assert all(50 <= r.page_id < 90 for r in got)


def test_contradictory_host_filters_return_empty(spark):
    """Two different host equalities in conjunction: the reader absorbs
    one and must yield the other back to Spark so the post-scan filter
    produces the correct EMPTY result (r3 review: last-writer-wins would
    silently return one host's rows)."""
    _register(spark)
    got = (
        _load(spark)
        .filter((F.col("host") == "h1.example") & (F.col("host") == "h2.example"))
        .count()
    )
    assert got == 0


def test_stream_reader_offsets_and_replay():
    """Offset protocol: read() advances page_id by rows_per_batch and
    returns that chunk; readBetweenOffsets replays exactly the same rows
    (the failure-recovery contract); reads past the end return nothing
    and do not advance."""
    from gpse.datasource import SynthWebStreamReader

    r = SynthWebStreamReader({"n_pages": "150", "n_hosts": "10", "seed": "42", "rows_per_batch": "60"})
    assert r.initialOffset() == {"page_id": 0}
    rows1, off1 = r.read({"page_id": 0})
    rows1 = list(rows1)
    assert off1 == {"page_id": 60}
    assert list(r.readBetweenOffsets({"page_id": 0}, {"page_id": 60})) == rows1
    rows3, off3 = r.read({"page_id": 120})
    assert off3 == {"page_id": 150}
    empty, off4 = r.read(off3)
    assert list(empty) == [] and off4 == off3  # caught up: offset stable


def test_streaming_read_equals_batch(spark):
    """readStream over the source must drain exactly the batch read's rows
    across SEVERAL micro-batches (rows_per_batch chunks arrive per
    trigger — a live query, since AvailableNow consumes only one read()
    attempt of a simple stream reader)."""
    import time

    _register(spark)
    stream = (
        spark.readStream.format("gpse_synth")
        .option("n_pages", 300)
        .option("n_hosts", 15)
        .option("seed", 42)
        .option("rows_per_batch", 80)
        .load()
    )
    want = sorted(
        (r.url, r.warc_ts, bytes(r.html), r.lang) for r in _load(spark).collect()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("t_synth_stream")
        .outputMode("append")
        .start()
    )
    try:
        deadline = time.time() + 90
        while time.time() < deadline:
            n = spark.sql("SELECT count(*) AS n FROM t_synth_stream").collect()[0].n
            if n >= len(want):
                break
            time.sleep(0.5)
        got = sorted(
            (r.url, r.warc_ts, bytes(r.html), r.lang)
            for r in spark.sql("SELECT * FROM t_synth_stream").collect()
        )
    finally:
        q.stop()
    assert got == want
    # several micro-batches actually ran (300 ids / 80 per chunk ≥ 4)
    assert len([p for p in q.recentProgress if p["numInputRows"] > 0]) >= 4


def test_writer_two_phase_commit(spark, tmp_path):
    """Write path: tasks stage _tmp files, commit renames them and lands
    an atomic _SUCCESS manifest listing exactly the committed parts; rows
    round-trip through the JSONL sink."""
    import json
    import os

    _register(spark)
    d = str(tmp_path / "sink")
    df = spark.range(0, 100, 1, 4).selectExpr("id", "id * 2 AS v")
    df.write.format("gpse_synth").option("path", d).mode("append").save()
    manifest = json.load(open(os.path.join(d, "_SUCCESS")))
    assert sum(f["n_rows"] for f in manifest["files"]) == 100
    names = {f["file"] for f in manifest["files"]}
    on_disk = {f for f in os.listdir(d) if f.startswith("part-")}
    assert names == on_disk
    assert not [f for f in os.listdir(d) if f.startswith("_tmp-")]
    rows = []
    for f in names:
        with open(os.path.join(d, f)) as fh:
            rows += [json.loads(l) for l in fh]
    assert sorted((r["id"], r["v"]) for r in rows) == [(i, 2 * i) for i in range(100)]


def test_writer_second_append_merges_manifest(spark, tmp_path):
    """Append twice: the second commit must MERGE the prior manifest, not
    clobber it — manifest-honoring readers keep seeing the first job's
    rows (ADVICE r03, FileCommitProtocol/catalog append parity)."""
    import json
    import os

    _register(spark)
    d = str(tmp_path / "sink_append2")
    spark.range(0, 50, 1, 2).selectExpr("id", "id * 2 AS v").write.format(
        "gpse_synth"
    ).option("path", d).mode("append").save()
    spark.range(50, 120, 1, 3).selectExpr("id", "id * 2 AS v").write.format(
        "gpse_synth"
    ).option("path", d).mode("append").save()
    manifest = json.load(open(os.path.join(d, "_SUCCESS")))
    assert sum(f["n_rows"] for f in manifest["files"]) == 120
    rows = []
    for f in manifest["files"]:
        with open(os.path.join(d, f["file"])) as fh:
            rows += [json.loads(l) for l in fh]
    assert sorted(r["id"] for r in rows) == list(range(120))


def test_writer_overwrite_truncates_prior_files(spark, tmp_path):
    """Overwrite mode: the new manifest lists only the new job's files AND
    the superseded part files are deleted, so neither manifest readers nor
    plain-directory readers resurrect stale data (ADVICE r03)."""
    import json
    import os

    _register(spark)
    d = str(tmp_path / "sink_overwrite")
    spark.range(0, 50, 1, 2).selectExpr("id", "id * 2 AS v").write.format(
        "gpse_synth"
    ).option("path", d).mode("append").save()
    old_parts = {f for f in os.listdir(d) if f.startswith("part-")}
    spark.range(1000, 1010, 1, 1).selectExpr("id", "id * 2 AS v").write.format(
        "gpse_synth"
    ).option("path", d).mode("overwrite").save()
    manifest = json.load(open(os.path.join(d, "_SUCCESS")))
    assert sum(f["n_rows"] for f in manifest["files"]) == 10
    on_disk = {f for f in os.listdir(d) if f.startswith("part-")}
    assert on_disk == {f["file"] for f in manifest["files"]}
    assert not (old_parts & on_disk)  # stale files physically gone


def test_writer_abort_leaves_no_committed_state(spark, tmp_path):
    """A failing write job must abort: no _SUCCESS manifest and no
    committed part files — only the catalog-style invisible leftovers."""
    import os

    import pytest
    from pyspark.sql import functions as F

    _register(spark)
    d = str(tmp_path / "sink_abort")

    @F.udf("long")
    def boom(x):
        raise RuntimeError("injected task failure")

    df = spark.range(0, 10, 1, 2).select(boom("id").alias("id"))
    with pytest.raises(Exception):
        df.write.format("gpse_synth").option("path", d).mode("append").save()
    assert not os.path.exists(os.path.join(d, "_SUCCESS"))
    assert not [f for f in os.listdir(d) if f.startswith("part-")] if os.path.isdir(d) else True


def test_crawl_pipeline_consumes_datasource(spark):
    """The source plugs straight into engine ops: exact dedup over the
    multi-capture url column finds the second captures."""
    _register(spark)
    df = _load(spark)
    dups = (
        df.groupBy("url")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > 1)
        .count()
    )
    assert dups > 0
