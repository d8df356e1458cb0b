"""Synthetic corpus determinism + shape (FIXTURES.md §B)."""

from __future__ import annotations

import numpy as np

from gpse import synth
from gpse.urlnorm import canonicalize_one

CFG = synth.CorpusCfg(n_pages=500, n_hosts=30, seed=42)


def test_html_pure_function_of_page_id():
    ids = np.arange(50, dtype=np.uint64)
    a = synth.html_for(ids, CFG)
    b = synth.html_for(ids, CFG)
    assert a == b
    # order/batching independent
    c = synth.html_for(ids[::-1], CFG)
    assert c == a[::-1]


def test_urls_parse_back():
    ids = np.arange(100, dtype=np.uint64)
    urls = synth.url_of(ids, CFG)
    hosts = synth.host_of(ids, CFG)
    priv = synth.is_private(ids, CFG)
    for i, u in enumerate(urls):
        parsed = synth.parse_canonical_url(u)
        assert parsed == (int(hosts[i]), i, bool(priv[i]))
        assert canonicalize_one(u) == u  # corpus URLs are already canonical


def test_zipf_skew_present():
    ids = np.arange(CFG.n_pages, dtype=np.uint64)
    hosts = synth.host_of(ids, CFG)
    counts = np.bincount(hosts, minlength=CFG.n_hosts)
    # head host should dominate the median host heavily
    assert counts[0] > 5 * max(np.median(counts), 1)


def test_outlinks_in_range_and_deterministic():
    for pid in [0, 7, 123, 499]:
        t1 = synth.outlink_targets(pid, CFG)
        t2 = synth.outlink_targets(pid, CFG)
        assert t1 == t2
        assert all(0 <= t < CFG.n_pages for t in t1)
        assert CFG.k_min <= len(t1) <= CFG.k_min + CFG.k_span


def test_dirty_href_canonicalizes_to_clean():
    ids = np.arange(200, dtype=np.uint64)
    urls = synth.url_of(ids, CFG)
    for pid in range(50):
        for j, tu in enumerate(synth.outlink_targets(pid, CFG)):
            href = synth._href_form(urls[tu] if tu < 200 else synth.url_of(np.array([tu], dtype=np.uint64), CFG)[0], pid, j, CFG)
            assert canonicalize_one(href) == (urls[tu] if tu < 200 else synth.url_of(np.array([tu], dtype=np.uint64), CFG)[0])


def test_gen_pages_schema_and_determinism(spark):
    df = synth.gen_pages(spark, CFG, partitions=4)
    assert [f.name for f in df.schema.fields] == ["url", "warc_ts", "html", "text", "lang"]
    n = df.count()
    assert n >= CFG.n_pages  # recrawl dups add ~5%
    # partition-count independence
    df2 = synth.gen_pages(spark, CFG, partitions=7)
    assert df2.count() == n
    a = sorted(df.select("url", "warc_ts").collect())
    b = sorted(df2.select("url", "warc_ts").collect())
    assert a == b
