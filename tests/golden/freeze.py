"""Freeze golden fixtures (run ONCE at M4; outputs are committed and then
read-only — SURVEY.md §0/§5.2, FIXTURES.md §B).

  * text/{pid}.txt     — byte-exact extracted text per corpus page
  * links/{pid}.json   — ordered canonical outlink list per page
  * crawl3.json        — seen-set digest + table counts after the fixed
                         3-round crawl (seed list + politeness budget fixed)

Re-running must be a no-op diff; any change is a breaking change to the
frozen extraction/ordering spec and must be justified in the commit.
"""

from __future__ import annotations

import hashlib
import json
import os

import numpy as np

GOLDEN_DIR = os.path.dirname(os.path.abspath(__file__))
N_GOLDEN_PAGES = 40

# the canonical golden corpus/crawl config — shared with tests
from gpse import synth  # noqa: E402

CORPUS = synth.CorpusCfg(n_pages=400, n_hosts=25, seed=42)
CRAWL = dict(batch_size=150, n_rounds=3, n_salts=4)


def freeze_extraction() -> None:
    from gpse.extract import extract_one

    os.makedirs(f"{GOLDEN_DIR}/text", exist_ok=True)
    os.makedirs(f"{GOLDEN_DIR}/links", exist_ok=True)
    ids = np.arange(N_GOLDEN_PAGES, dtype=np.uint64)
    urls = synth.url_of(ids, CORPUS)
    htmls = synth.html_for(ids, CORPUS)
    for pid, (u, h) in enumerate(zip(urls, htmls)):
        text, links = extract_one(h, u)
        with open(f"{GOLDEN_DIR}/text/{pid}.txt", "wb") as f:
            f.write(text.encode("utf-8"))
        with open(f"{GOLDEN_DIR}/links/{pid}.json", "w") as f:
            json.dump(links, f, indent=0)


def freeze_crawl3(spark) -> None:
    import tempfile

    from gpse import crawl
    from gpse.catalog import Catalog

    cfg = crawl.CrawlCfg(
        corpus=CORPUS,
        batch_size=CRAWL["batch_size"],
        n_salts=CRAWL["n_salts"],
        num_partitions=8,
    )
    cat = Catalog(tempfile.mkdtemp())
    crawl.run(spark, cat, cfg, CRAWL["n_rounds"])
    seen = sorted(
        (r.url_hash, r.first_round)
        for r in cat.load(spark, "seen_exact").collect()
    )
    digest = hashlib.md5(json.dumps(seen).encode()).hexdigest()
    pages = cat.load(spark, "pages")
    text_digest = hashlib.md5(
        json.dumps(
            sorted((r.url, r.text) for r in pages.select("url", "text").collect())
        ).encode()
    ).hexdigest()
    out = {
        "seen_count": len(seen),
        "seen_digest": digest,
        "pages_count": pages.count(),
        "pages_text_digest": text_digest,
    }
    with open(f"{GOLDEN_DIR}/crawl3.json", "w") as f:
        json.dump(out, f, indent=2)
    print(out)


if __name__ == "__main__":
    freeze_extraction()
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    freeze_crawl3(spark)
    print("frozen.")
