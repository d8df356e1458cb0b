"""fetch_from_corpus capture selection: latest warc_ts per url, ties
broken deterministically by content hash, byte-identical duplicate
captures collapsed to one row (ADVICE r01)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from gpse import fetch as fetch_mod

SCHED_SCHEMA = (
    "round int, url string, url_hash long, host string, salt smallint, "
    "priority double, depth int, src_url_hash long, state string, "
    "crawl_delay_ms long"
)


def _sched(spark, urls):
    rows = [
        (0, u, i + 1, "h1.example", 0, 0.0, 0, None, "queued", 0)
        for i, u in enumerate(urls)
    ]
    return spark.createDataFrame(rows, SCHED_SCHEMA)


def _corpus(spark, rows):
    return spark.createDataFrame(
        [(u, ts, h) for (u, ts, h) in rows], "url string, warc_ts timestamp, html binary"
    )


T0 = dt.datetime(2024, 1, 1, 0, 0, 0)
T1 = dt.datetime(2024, 1, 2, 0, 0, 0)


def test_latest_capture_wins(spark):
    sched = _sched(spark, ["http://h1.example/p/1"])
    corpus = _corpus(
        spark,
        [
            ("http://h1.example/p/1", T0, b"old"),
            ("http://h1.example/p/1", T1, b"new"),
        ],
    )
    out = fetch_mod.fetch_from_corpus(sched, corpus, 2).collect()
    assert len(out) == 1
    assert bytes(out[0].html) == b"new"


def test_same_ts_tie_broken_deterministically(spark):
    sched = _sched(spark, ["http://h1.example/p/1"])
    variants = [b"aaa", b"bbb"]
    corpus = _corpus(
        spark, [("http://h1.example/p/1", T0, h) for h in variants]
    )
    picks = set()
    for parts in (1, 4):
        out = fetch_mod.fetch_from_corpus(sched, corpus.repartition(parts), 2).collect()
        assert len(out) == 1
        picks.add(bytes(out[0].html))
    assert len(picks) == 1  # same winner at any partitioning
    # and the winner is the max xxhash64(html) — recompute engine-side
    want = (
        _corpus(spark, [("x", T0, h) for h in variants])
        .select("html", F.xxhash64("html").alias("hh"))
        .orderBy(F.desc("hh"))
        .first()
    )
    assert picks == {bytes(want.html)}


def test_identical_duplicate_captures_collapse(spark):
    sched = _sched(spark, ["http://h1.example/p/1", "http://h1.example/p/2"])
    corpus = _corpus(
        spark,
        [
            ("http://h1.example/p/1", T0, b"same"),
            ("http://h1.example/p/1", T0, b"same"),
            ("http://h1.example/p/2", T0, b"solo"),
        ],
    )
    out = fetch_mod.fetch_from_corpus(sched, corpus, 2)
    assert out.count() == 2
    assert out.filter(F.col("url").endswith("/1")).count() == 1


def test_missing_urls_are_404(spark):
    sched = _sched(spark, ["http://h1.example/p/1", "http://h1.example/nope"])
    corpus = _corpus(spark, [("http://h1.example/p/1", T0, b"x")])
    out = {r.url: r.status for r in fetch_mod.fetch_from_corpus(sched, corpus, 2).collect()}
    assert out["http://h1.example/p/1"] == 200
    assert out["http://h1.example/nope"] == 404


def test_large_batch_shuffled_path_value_parity(spark):
    """Above the broadcast threshold fetch_from_corpus switches to a
    shuffled hash join (VERDICT r02 #1). Both paths must return identical
    rows — including the multi-capture max-key selection and 404s."""
    urls = [f"http://h1.example/p/{i}" for i in range(1, 6)]
    sched = _sched(spark, urls + ["http://h1.example/nope"])
    rows = [(u, T0, f"old{i}".encode()) for i, u in enumerate(urls)]
    rows += [(u, T1, f"new{i}".encode()) for i, u in enumerate(urls)]
    corpus = _corpus(spark, rows)
    key = lambda r: (r.url, r.status, None if r.html is None else bytes(r.html))  # noqa: E731
    small = sorted(map(key, fetch_mod.fetch_from_corpus(sched, corpus, 2).collect()))
    large = sorted(
        map(
            key,
            fetch_mod.fetch_from_corpus(
                sched, corpus, 2, max_broadcast_bytes=0
            ).collect(),
        )
    )
    assert small == large
    assert ("http://h1.example/nope", 404, None) in large
    assert ("http://h1.example/p/1", 200, b"new0") in large


def test_pace_wall_clock_spacing():
    """Wall-clock pacing (fetch(pacing='wall')): with an injected fake
    clock, each fetch in a lane is emitted >= crawl_delay after the
    previous one — no real sleeping in the test."""
    import numpy as np

    from gpse.fetch import pace_wall_clock

    # two interleaved lanes, 200 ms delay: offsets as the fetcher computes
    # them (cumcount per lane × delay)
    offsets = np.array([0, 0, 200, 200, 400, 400], dtype=np.int64)
    clock = {"t": 100.0}
    sleeps: list[float] = []

    def now() -> float:
        return clock["t"]

    def sleep(s: float) -> None:
        sleeps.append(s)
        clock["t"] += s

    fired: list[int] = []
    emitted = pace_wall_clock(
        offsets, time_scale=0.5, now=now, sleep=sleep, on_due=fired.append
    )
    # per-lane spacing: each step is 200 ms × 0.5 scale = 0.1 s
    for lane in (emitted[0::2], emitted[1::2]):
        for a, b in zip(lane, lane[1:]):
            assert b - a >= 0.1 - 1e-9
    assert sum(sleeps) > 0  # it actually waited on the (fake) clock
    assert max(emitted) >= 0.4 * 0.5 - 1e-9  # last due offset honored
    # the fetch callback fires AT each due time, in due order — the
    # request itself is gated, not just followed by sleeps
    assert fired == sorted(range(6), key=lambda i: (offsets[i], i))


def test_pace_wall_clock_batches_same_instant_rows():
    """Rows due at the same instant (a zero-delay host) must be issued as
    ONE vectorized group, not row-at-a-time (VERDICT r03 §wrong-3)."""
    import numpy as np

    from gpse.fetch import pace_wall_clock

    clock = {"t": 0.0}

    def now() -> float:
        return clock["t"]

    def sleep(s: float) -> None:
        clock["t"] += s

    # delay-0 host: every row due at offset 0 -> exactly one batch call
    groups: list[list[int]] = []
    pace_wall_clock(
        np.zeros(5, dtype=np.int64), now=now, sleep=sleep,
        on_due_batch=groups.append,
    )
    assert groups == [[0, 1, 2, 3, 4]]

    # mixed: two rows at 0, two at 100, one at 200 -> three due groups
    groups.clear()
    pace_wall_clock(
        np.array([0, 100, 0, 200, 100], dtype=np.int64),
        now=now, sleep=sleep, on_due_batch=groups.append,
    )
    assert groups == [[0, 2], [1, 4], [3]]


def test_observe_fetch_counters_match_data(spark):
    """df.observe counters (metrics.observe_fetch) must equal a direct
    aggregation of the same fetch log — and cost no extra action."""
    from gpse import metrics as metrics_mod

    sched = _sched(spark, ["http://h1.example/p/1", "http://h1.example/nope"])
    corpus = _corpus(spark, [("http://h1.example/p/1", T0, b"abcd")])
    log = fetch_mod.fetch_from_corpus(sched, corpus, 2)
    observed_df, obs = metrics_mod.observe_fetch(log)
    rows = observed_df.collect()  # the single action that fills the observation
    got = obs.get
    assert got["n_fetched"] == len(rows) == 2
    assert got["n_ok"] == sum(1 for r in rows if r.status == 200) == 1
    assert got["bytes_in"] == sum(r.bytes for r in rows) == 4
