"""Frozen extraction spec tests (the byte-identical invariant's unit layer).

BASELINE.json input_hint: "per-row invariant vs the reference:
byte-identical extracted text per url" — operationalized per SURVEY.md §0
as a frozen spec + goldens; these tests pin the spec's edge cases.
"""

from gpse.extract import extract_one


BASE = "http://h1.example/p/1"


def test_basic_text_and_links():
    html = (
        b"<html><head><title>T</title><script>var x=1;</script></head>"
        b'<body><h1>Head</h1><p>one  two\n three</p>'
        b'<a href="/p/2">x</a><a href="http://h2.example/p/3#f">y</a>'
        b"<style>.c{}</style><p>tail</p></body></html>"
    )
    text, links = extract_one(html, BASE)
    # inline tags (<a>) add no whitespace — browser text-flow behavior
    assert text == "T\nHead\none two three\nxy\ntail"
    assert links == ["http://h1.example/p/2", "http://h2.example/p/3"]


def test_entities_decoded():
    text, _ = extract_one(b"<p>a &amp; b &#x2713;</p>", BASE)
    assert text == "a & b ✓"


def test_script_style_noscript_dropped():
    html = b"<script>skip</script><noscript>no</noscript><style>s</style><p>keep</p>"
    text, _ = extract_one(html, BASE)
    assert text == "keep"


def test_whitespace_policy():
    text, _ = extract_one(b"<p>  a\t\tb  </p><div> </div><p>c</p>", BASE)
    assert text == "a b\nc"


def test_bad_utf8_replaced_deterministically():
    text, _ = extract_one(b"<p>ok \xff\xfe bad</p>", BASE)
    assert text == "ok �� bad"


def test_link_order_and_duplicates_preserved():
    html = b'<a href="/a">1</a><a href="/b">2</a><a href="/a">3</a>'
    _, links = extract_one(html, BASE)
    assert links == [
        "http://h1.example/a",
        "http://h1.example/b",
        "http://h1.example/a",
    ]


def test_junk_links_dropped():
    html = b'<a href="javascript:void(0)">j</a><a href="mailto:a@b">m</a><a href>e</a><a href="#top">t</a>'
    _, links = extract_one(html, BASE)
    assert links == []


def test_none_and_empty():
    assert extract_one(None, BASE) == ("", [])
    assert extract_one(b"", BASE) == ("", [])


def test_malformed_html_is_deterministic():
    html = b"<p>a<divv></p><a href='/x'>u"
    t1 = extract_one(html, BASE)
    t2 = extract_one(html, BASE)
    assert t1 == t2
    assert t1[1] == ["http://h1.example/x"]


def test_udtf_matches_extract_one(spark):
    from gpse import synth
    from gpse.extract import make_links_udtf

    spark.udtf.register("t_extract_links", make_links_udtf())
    cfg = synth.CorpusCfg(n_pages=30, n_hosts=5, seed=42)
    # drop re-crawl duplicate captures — one row per url for the comparison
    synth.gen_pages(spark, cfg, partitions=2).dropDuplicates(["url"]).createOrReplaceTempView("t_udtf_pages")
    rows = spark.sql(
        "SELECT p.url, f.pos, f.link FROM t_udtf_pages p, "
        "LATERAL t_extract_links(p.url, p.html) f"
    ).collect()
    got = {}
    for r in rows:
        got.setdefault(r.url, []).append((r.pos, r.link))
    pages = {r.url: r.html for r in spark.table("t_udtf_pages").collect()}
    for url, pairs in got.items():
        _, links = extract_one(pages[url], url)
        assert [l for _, l in sorted(pairs)] == links


def test_arrow_path_matches_pandas_path(spark):
    """parse_extract (mapInArrow hot path) must produce byte-identical
    text/links to parse_extract_pandas (the scalar-UDF reference form)."""
    from gpse import synth
    from gpse.extract import parse_extract, parse_extract_pandas

    cfg = synth.CorpusCfg(n_pages=120, n_hosts=8, seed=42)
    pages = synth.gen_pages(spark, cfg, partitions=3).drop("text")
    a = {
        r["url"]: (r["text"], list(r["links"]))
        for r in parse_extract(pages).select("url", "text", "links").collect()
    }
    b = {
        r["url"]: (r["text"], list(r["links"]))
        for r in parse_extract_pandas(pages).select("url", "text", "links").collect()
    }
    assert a == b


def test_parse_extract_rejects_colliding_columns(spark):
    import pytest as _pytest

    from gpse import synth
    from gpse.extract import parse_extract

    cfg = synth.CorpusCfg(n_pages=10, n_hosts=2, seed=42)
    pages = synth.gen_pages(spark, cfg, partitions=1)  # has a `text` column
    with _pytest.raises(ValueError):
        parse_extract(pages)
