"""Golden byte-identical extraction + crawl determinism (SURVEY.md §0:
the operationalization of BASELINE.json's "byte-identical extracted text
per url" invariant — frozen fixtures, never regenerated silently)."""

from __future__ import annotations

import hashlib
import json
import os

import numpy as np
import pytest

from gpse import synth
from gpse.extract import extract_one
from tests.golden.freeze import CORPUS, CRAWL, GOLDEN_DIR, N_GOLDEN_PAGES


def test_text_byte_identical():
    ids = np.arange(N_GOLDEN_PAGES, dtype=np.uint64)
    urls = synth.url_of(ids, CORPUS)
    htmls = synth.html_for(ids, CORPUS)
    for pid in range(N_GOLDEN_PAGES):
        text, _ = extract_one(htmls[pid], urls[pid])
        with open(f"{GOLDEN_DIR}/text/{pid}.txt", "rb") as f:
            assert f.read() == text.encode("utf-8"), f"text drift at page {pid}"


def test_links_identical_in_document_order():
    ids = np.arange(N_GOLDEN_PAGES, dtype=np.uint64)
    urls = synth.url_of(ids, CORPUS)
    htmls = synth.html_for(ids, CORPUS)
    for pid in range(N_GOLDEN_PAGES):
        _, links = extract_one(htmls[pid], urls[pid])
        with open(f"{GOLDEN_DIR}/links/{pid}.json") as f:
            assert json.load(f) == links, f"link drift at page {pid}"


def test_spark_udf_path_matches_golden(spark):
    """The vectorized Arrow path must emit the same bytes as the pure
    function — no pandas/Arrow coercion drift."""
    from gpse.extract import parse_extract

    df = synth.gen_pages(spark, CORPUS, partitions=4)
    got = {
        r.url: r.text
        for r in parse_extract(df.drop("text")).select("url", "text").collect()
    }
    ids = np.arange(N_GOLDEN_PAGES, dtype=np.uint64)
    urls = synth.url_of(ids, CORPUS)
    for pid in range(N_GOLDEN_PAGES):
        with open(f"{GOLDEN_DIR}/text/{pid}.txt", "rb") as f:
            assert got[urls[pid]].encode("utf-8") == f.read()


@pytest.mark.slow
def test_crawl3_digest(spark, tmp_path):
    """Full 3-round crawl reproduces the frozen seen-set and extracted-text
    digests — the end-to-end determinism gate."""
    from gpse import crawl
    from gpse.catalog import Catalog

    with open(f"{GOLDEN_DIR}/crawl3.json") as f:
        want = json.load(f)
    cfg = crawl.CrawlCfg(
        corpus=CORPUS,
        batch_size=CRAWL["batch_size"],
        n_salts=CRAWL["n_salts"],
        num_partitions=5,  # deliberately different from freeze-time (8)
    )
    cat = Catalog(str(tmp_path))
    crawl.run(spark, cat, cfg, CRAWL["n_rounds"])
    seen = sorted(
        (r.url_hash, r.first_round)
        for r in cat.load(spark, "seen_exact").collect()
    )
    assert len(seen) == want["seen_count"]
    assert hashlib.md5(json.dumps(seen).encode()).hexdigest() == want["seen_digest"]
    pages = cat.load(spark, "pages")
    assert pages.count() == want["pages_count"]
    text_digest = hashlib.md5(
        json.dumps(
            sorted((r.url, r.text) for r in pages.select("url", "text").collect())
        ).encode()
    ).hexdigest()
    assert text_digest == want["pages_text_digest"]
