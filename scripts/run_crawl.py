"""spark-submit entry point for the crawl round loop (north_star: "Each
crawl round is a Spark job submitted with spark-submit --py-files").

Usage (one process = one or more rounds; resume picks up the checkpoint):

    spark-submit --py-files gpse.zip scripts/run_crawl.py \\
        --catalog /data/crawl1 --rounds 3 [--resume] \\
        [--pages 5000] [--hosts 200] [--batch 2000] [--partitions 32] \\
        [--bodies /data/origin/bodies]

Packaging: `python scripts/package_pyfiles.py` zips gpse/ into gpse.zip.
On a cluster, add --master/--num-executors etc.; the engine only assumes a
SparkSession. Every table lives in the catalog dir; rerunning with
--resume continues from the last complete round's snapshot (exactly —
tests/e2e pin the equivalence).
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    p = argparse.ArgumentParser(description="gpse crawl round loop")
    p.add_argument("--catalog", required=True, help="catalog directory")
    p.add_argument("--rounds", type=int, default=1)
    p.add_argument("--resume", action="store_true", help="continue from checkpoint")
    p.add_argument("--pages", type=int, default=5000, help="synthetic corpus size")
    p.add_argument("--hosts", type=int, default=200)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--batch", type=int, default=2000, help="round batch cap (0 = budget-bounded)")
    p.add_argument("--partitions", type=int, default=32)
    p.add_argument("--salts", type=int, default=8)
    p.add_argument("--bodies", default=None, help="parquet origin table (else pure-function origin)")
    args = p.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("gpse-crawl")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    from gpse import crawl, synth
    from gpse.catalog import Catalog

    cfg = crawl.CrawlCfg(
        corpus=synth.CorpusCfg(n_pages=args.pages, n_hosts=args.hosts, seed=args.seed),
        batch_size=args.batch or None,
        num_partitions=args.partitions,
        n_salts=args.salts,
        corpus_bodies_path=args.bodies,
    )
    cat = Catalog(args.catalog)
    if args.resume:
        stats = crawl.resume(spark, cat, cfg, args.rounds)
    else:
        stats = crawl.run(spark, cat, cfg, args.rounds)
    for s in stats:
        print(json.dumps(s))
    spark.stop()


if __name__ == "__main__":
    main()
