"""spark-submit --py-files end to end (north_rule: "run via spark-submit
--py-files on a multi-executor cluster").

This is the packaging test the rest of the suite cannot substitute for:
in-process tests import `gpse` from the repo checkout, so a module missing
from gpse.zip — or an import that only works because the repo root is on
sys.path — would pass every other test and fail ONLY on a real cluster
submit. Here the driver script runs from a NEUTRAL working directory with
only the zip on --py-files, so every `from gpse import ...` must resolve
from the archive, exactly like an executor-side import on a cluster.

The run's seen set is then cross-checked against an in-process run of the
same config — the subprocess JVM and the test JVM must agree bitwise on
the crawl's outcome (the determinism half of the north_rule).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _spark_submit() -> str:
    p = shutil.which("spark-submit")
    if p:
        return p
    import pyspark

    return os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")


@pytest.mark.slow
def test_spark_submit_pyfiles_round_trip(spark, tmp_path):
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    try:
        import package_pyfiles
    finally:
        sys.path.pop(0)

    zip_path = str(tmp_path / "gpse.zip")
    package_pyfiles.main(zip_path)
    assert os.path.exists(zip_path)

    # neutral cwd: the ONLY gpse on the path is the zip
    workdir = tmp_path / "submit_cwd"
    workdir.mkdir()
    shutil.copy(os.path.join(REPO, "scripts", "run_crawl.py"), workdir)
    cat_dir = str(tmp_path / "cat_submit")

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # nothing may leak the repo checkout
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    proc = subprocess.run(
        [
            _spark_submit(),
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.ui.showConsoleProgress=false",
            "--py-files", zip_path,
            "run_crawl.py",
            "--catalog", cat_dir,
            "--rounds", "2",
            "--pages", "400",
            "--hosts", "12",
            "--batch", "200",
            "--partitions", "8",
            "--salts", "4",
        ],
        cwd=str(workdir),
        env=env,
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    # the driver script prints one JSON summary per round
    summaries = [
        json.loads(l) for l in proc.stdout.splitlines() if l.startswith("{")
    ]
    assert len(summaries) == 2
    assert all(s["n_scheduled"] > 0 for s in summaries)

    # the submitted run must agree bitwise with an in-process run
    from gpse import crawl, synth
    from gpse.catalog import Catalog

    cfg = crawl.CrawlCfg(
        corpus=synth.CorpusCfg(n_pages=400, n_hosts=12, seed=42),
        batch_size=200,
        num_partitions=8,
        n_salts=4,
    )
    cat_ref = Catalog(str(tmp_path / "cat_ref"))
    ref_stats = crawl.run(spark, cat_ref, cfg, 2)
    assert [s["n_scheduled"] for s in ref_stats] == [
        s["n_scheduled"] for s in summaries
    ]

    cat_sub = Catalog(cat_dir)
    seen_sub = sorted(
        r.url_hash for r in cat_sub.load(spark, "seen_exact").collect()
    )
    seen_ref = sorted(
        r.url_hash for r in cat_ref.load(spark, "seen_exact").collect()
    )
    assert seen_sub == seen_ref
    # per-partition lineage metrics exist for both rounds
    mrounds = {
        r["round"] for r in cat_sub.load(spark, "metrics").select("round").collect()
    }
    assert mrounds == {0, 1}
