"""Crawl-round driver loop: run_round / run / resume (SURVEY.md §3.1-3.2).

Capability parity: north_star — "Each crawl round is a Spark job …
checkpoint-resumable crawl rounds … resumes exactly from any round's
snapshot checkpoint". One round = one batch job over the catalog's tables:

    frontier(R) → schedule_batch → mapInPandas fetch → parse_extract
    → explode links → dedup vs seen (bloom + exact anti-join)
    → commit pages/seen/frontier(R+1)/metrics + manifest

Commit order makes the metrics commit the round's completion marker: a
crash mid-round leaves the manifest at round R-1 state for at least one
table, and `resume` restarts from the last round whose metrics committed —
re-running a partial round is idempotent because every commit for that
round is re-derived from the same deterministic inputs.

Determinism (north_rule "matching crawl ordering and final URL-seen set"):
the scheduled batch is picked by the total order (priority, url_hash), so
runs at local[8] and local[32] produce identical seen sets and identical
batch ordering (tested in tests/e2e).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gpse import fetch as fetch_mod
from gpse import frontier as frontier_mod
from gpse import metrics as metrics_mod
from gpse import robots as robots_mod
from gpse import seen as seen_mod
from gpse import synth, textfuncs
from gpse.catalog import Catalog
from gpse.extract import parse_extract


@dataclass
class CrawlCfg:
    corpus: synth.CorpusCfg = field(default_factory=synth.CorpusCfg)
    batch_size: int = 2000
    n_salts: int = 8
    num_partitions: int = 32
    n_bloom_buckets: int = 32
    use_bloom: bool = True
    depth_weight: float = 1.0
    max_depth: int = 100


def init_crawl(spark: SparkSession, cat: Catalog, cfg: CrawlCfg, seeds=None) -> None:
    """Round 0 state: seeds → frontier, seeds → seen, robots → host_policy."""
    seeds = seeds if seeds is not None else synth.seed_urls(cfg.corpus)
    f0 = frontier_mod.from_seeds(spark, seeds, cfg.n_salts)
    cat.commit("frontier", f0, 0, mode="append")
    cat.commit(
        "seen_exact",
        f0.select("url_hash", F.lit(0).cast("int").alias("first_round")),
        0,
        mode="append",
    )
    policy = robots_mod.build_host_policy(synth.gen_robots(spark, cfg.corpus))
    cat.commit("host_policy", policy, 0, mode="overwrite")


def run_round(spark: SparkSession, cat: Catalog, cfg: CrawlCfg, round_n: int) -> dict:
    """Execute crawl round `round_n`; returns the round's summary metrics."""
    t0 = time.time()
    fr = cat.load(spark, "frontier", round_n).filter(F.col("round") == round_n)
    policy = cat.load(spark, "host_policy")
    seen = cat.load(spark, "seen_exact", round_n)

    sched, denied = frontier_mod.schedule_batch(
        fr, policy, cfg.batch_size, cfg.num_partitions
    )
    fetched = fetch_mod.fetch(sched, cfg.corpus)
    parsed = parse_extract(fetched).persist()
    try:
        n_fetched = parsed.count()  # materialize once; reused by all commits

        # pages generation (input_hint schema) — html kept as its own column
        # so later scans prune it; lang via JVM-side heuristic
        pages = parsed.filter(F.col("status") == 200).select(
            "url",
            "warc_ts",
            "html",
            "text",
            textfuncs.lang_id(F.col("text")).alias("lang"),
        )
        cat.commit("pages", pages, round_n, mode="append")

        # candidate URLs: explode outlinks (already canonical from extractor)
        cands = (
            parsed.select(
                F.col("url_hash").alias("src_url_hash"),
                (F.col("depth") + 1).alias("depth"),
                F.explode("links").alias("url"),
            )
            .filter(F.col("depth") <= cfg.max_depth)
            .withColumn("url_hash", F.xxhash64("url"))
        )
        blooms = (
            seen_mod.build_blooms(seen, cfg.n_bloom_buckets) if cfg.use_bloom else None
        )
        new_urls = seen_mod.dedup_new_urls(cands, seen, blooms, cfg.n_bloom_buckets)
        # one url may be discovered from several sources: keep smallest depth,
        # deterministic tiebreak on src
        new_urls = new_urls.groupBy("url", "url_hash").agg(
            F.min("depth").alias("depth"), F.min("src_url_hash").alias("src_url_hash")
        )

        next_frontier = frontier_mod.from_candidates(
            new_urls, round_n + 1, cfg.n_salts, cfg.depth_weight
        ).persist()
        n_new = next_frontier.count()
        cat.commit("frontier", next_frontier, round_n + 1, mode="append")
        cat.commit(
            "seen_exact",
            next_frontier.select(
                "url_hash", F.lit(round_n + 1).cast("int").alias("first_round")
            ),
            round_n + 1,
            mode="append",
        )

        mrows = metrics_mod.round_metrics(parsed, round_n)
        cat.commit("metrics", mrows, round_n, mode="append")
        next_frontier.unpersist()
    finally:
        parsed.unpersist()

    wall = time.time() - t0
    return {
        "round": round_n,
        "n_scheduled": n_fetched,
        "n_new_urls": n_new,
        "wall_s": wall,
        "urls_per_s": (n_fetched / wall) if wall > 0 else 0.0,
    }


def last_complete_round(cat: Catalog) -> int | None:
    """Highest round whose metrics commit (the completion marker) exists."""
    return cat.latest_round("metrics")


def run(
    spark: SparkSession,
    cat: Catalog,
    cfg: CrawlCfg,
    n_rounds: int,
    seeds=None,
) -> list[dict]:
    """Fresh crawl: init + n_rounds."""
    init_crawl(spark, cat, cfg, seeds)
    return [run_round(spark, cat, cfg, r) for r in range(n_rounds)]


def resume(spark: SparkSession, cat: Catalog, cfg: CrawlCfg, n_more_rounds: int) -> list[dict]:
    """Continue from the last complete round's snapshot checkpoint —
    bit-identical to an uninterrupted run (tested in tests/e2e)."""
    last = last_complete_round(cat)
    start = 0 if last is None else last + 1
    return [run_round(spark, cat, cfg, r) for r in range(start, start + n_more_rounds)]
