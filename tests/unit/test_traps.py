"""Crawl-trap detection (gpse/traps.py): template collapse semantics, the
explosion threshold, the disallow-prefix derivation, and the full feedback
loop — detected traps folded into host_policy deny the trapped region in
schedule_batch with the normal region untouched."""

from __future__ import annotations

from pyspark.sql import functions as F

from gpse import frontier as frontier_mod
from gpse import traps


def _urls(spark):
    # trap.example: a calendar trap (/cal/Y/M, enumerable) + a session trap
    # (static /login, sess= values) — 40 distinct URLs per template.
    # ok.example: /News/article with 40 URLs but only 8 distinct (repeats),
    # and a digit-bearing but small template — neither may flag.
    return spark.range(0, 40).select(
        F.explode(
            F.array(
                F.concat(
                    F.lit("http://trap.example/cal/20"),
                    (F.col("id") % 25).cast("string"),
                    F.lit("/"),
                    F.col("id").cast("string"),
                ),
                F.concat(
                    F.lit("http://trap.example/login?sess="),
                    F.col("id").cast("string"),
                    F.lit("&next=home"),
                ),
                F.concat(
                    F.lit("http://ok.example/News/article/"),
                    (F.col("id") % 8).cast("string"),
                ),
                F.concat(
                    F.lit("http://ok.example/about"),
                    F.when(F.col("id") % 2 == 0, "/team").otherwise("/jobs"),
                ),
            )
        ).alias("url")
    )


def test_template_collapse_and_threshold(spark):
    t = traps.detect_traps(_urls(spark), max_urls_per_template=15)
    got = {(r.host, r.template): r.n_urls for r in t.collect()}
    assert got == {
        ("trap.example", "trap.example/cal/{N}/{N}?"): 40,
        ("trap.example", "trap.example/login?next&sess"): 40,
    }, got


def test_template_marker_cannot_collide_with_literal_N(spark):
    # '/News' carries a literal N — the {N} marker must not treat it as a
    # collapsed run, and the disallow prefix for a real trap must not cut
    # at a literal N either
    df = spark.createDataFrame(
        [("http://h.example/News/2024/5",)], "url string"
    ).select(traps.url_template(F.col("url")).alias("t"))
    assert df.collect()[0]["t"] == "h.example/News/{N}/{N}?"


def test_disallow_prefix_derivation(spark):
    t = traps.detect_traps(_urls(spark), max_urls_per_template=15)
    rules = {
        (r.host, r.disallow) for r in traps.trap_disallow_rules(t).collect()
    }
    assert rules == {
        ("trap.example", "/cal/"),       # path collapse → literal prefix
        ("trap.example", "/login"),      # query-only trap → exact path
    }, rules


def test_trap_policy_feedback_denies_region_in_scheduler(spark):
    urls = _urls(spark).distinct()
    fr = frontier_mod.from_seed_df(
        urls.select("url", F.lit(0.0).alias("priority")), n_salts=2
    )
    policy = spark.createDataFrame(
        [("trap.example", None, None, 0, 100), ("ok.example", None, None, 0, 100)],
        "host string, disallow array<string>, allow array<string>, "
        "crawl_delay_ms long, budget_per_round int",
    )
    t = traps.detect_traps(urls, max_urls_per_template=15)
    newpol = traps.apply_trap_policy(policy, t)
    # schema preserved, non-trap host untouched
    assert newpol.columns == policy.columns
    ok_row = newpol.filter(F.col("host") == "ok.example").collect()[0]
    assert ok_row.disallow is None and ok_row.budget_per_round == 100

    sched, denied, deferred, cl = frontier_mod.schedule_batch(fr, newpol, None, 4)
    try:
        d_urls = [r.url for r in denied.collect()]
        s_urls = [r.url for r in sched.collect()]
        assert all("/cal/" in u or "/login" in u for u in d_urls)
        assert sum("/cal/" in u for u in d_urls) > 0
        assert sum("/login" in u for u in d_urls) > 0
        # every non-trap URL still scheduled; no trap URL leaks through
        assert all("trap.example/cal/" not in u and "/login" not in u for u in s_urls)
        assert sum("ok.example" in u for u in s_urls) == urls.filter(
            F.col("url").contains("ok.example")
        ).count()
    finally:
        cl()


def test_trap_host_absent_from_policy_gets_row(spark):
    detect = traps.detect_traps(_urls(spark), max_urls_per_template=15)
    empty_policy = spark.createDataFrame(
        [],
        "host string, disallow array<string>, allow array<string>, "
        "crawl_delay_ms long, budget_per_round int",
    )
    got = traps.apply_trap_policy(empty_policy, detect).collect()
    assert len(got) == 1 and got[0].host == "trap.example"
    assert set(got[0].disallow) == {"/cal/", "/login"}
    assert got[0].budget_per_round is None  # scheduler default applies


def test_apply_trap_policy_preserves_real_host_policy_schema(spark, tmp_path):
    """VERDICT r05 #3 round-trip: build_host_policy (which carries
    robots_body) → detect → apply → commit → load must preserve the FULL
    schema — apply_trap_policy replaces only `disallow`."""
    from gpse import robots, synth
    from gpse.catalog import Catalog

    cfg = synth.CorpusCfg(n_pages=50, n_hosts=6, seed=42)
    policy = robots.build_host_policy(synth.gen_robots(spark, cfg))
    t = traps.detect_traps(_urls(spark), max_urls_per_template=15)
    newpol = traps.apply_trap_policy(policy, t)
    assert newpol.columns == policy.columns  # robots_body included
    cat = Catalog(str(tmp_path / "cat"))
    cat.commit("host_policy", newpol, 0, mode="overwrite")
    back = cat.load(spark, "host_policy")
    assert set(back.columns) == set(policy.columns)
    # untouched host keeps its robots_body verbatim
    want = {r.host: r.robots_body for r in policy.collect()}
    got = {r.host: r.robots_body for r in back.collect() if r.host in want}
    assert got == want


def test_trap_disallow_rules_per_template_no_cross_product(spark):
    """ADVICE r05: a host with 2 trap templates must yield one disallow per
    template (join on host+template), never a 2x2 cross product."""
    t = traps.detect_traps(_urls(spark), max_urls_per_template=15)
    joined = t.join(traps.trap_disallow_rules(t), ["host", "template"])
    rows = joined.select("host", "template", "disallow").collect()
    assert len(rows) == 2  # one row per template, not 4
    by_tpl = {r.template: r.disallow for r in rows}
    assert by_tpl == {
        "trap.example/cal/{N}/{N}?": "/cal/",
        "trap.example/login?next&sess": "/login",
    }


def test_apply_trap_policy_never_folds_whole_host_deny(spark):
    """ADVICE r05 (medium): a digit-rooted template (e.g. /2024/05/x-{N})
    derives prefix '/', which must NOT be folded into host_policy — that
    would permanently robots-deny the entire host."""
    urls = spark.range(0, 40).select(
        F.concat(
            F.lit("http://arch.example/20"),
            (F.col("id") % 25).cast("string"),
            F.lit("/05/article-"),
            F.col("id").cast("string"),
        ).alias("url")
    )
    t = traps.detect_traps(urls, max_urls_per_template=15)
    assert t.count() == 1  # the template itself IS detected...
    policy = spark.createDataFrame(
        [("arch.example", None, None, 0, 100)],
        "host string, disallow array<string>, allow array<string>, "
        "crawl_delay_ms long, budget_per_round int",
    )
    got = traps.apply_trap_policy(policy, t).collect()
    # ...but no '/' (or '') rule reaches the policy
    assert len(got) == 1
    assert not got[0].disallow  # None or empty — nothing folded
