"""RFC 9309 robots.txt matcher + host_policy builder (SURVEY.md §2.8, D4).

Capability parity: north_star — "a per-host politeness + robots.txt budget".

Parsing and matching follow RFC 9309: rules grouped by user-agent (we crawl
as '*'), longest-match precedence between Allow and Disallow, Allow wins
ties, '*' wildcard and '$' end-anchor supported, unparseable lines ignored
(a malformed file degrades to allow-all, per the RFC's error tolerance).

Everything runs as vectorized pandas UDFs: bodies are parsed once per host
(policy table is per-host small), and path matching compiles each host's
rule list to regexes once per Arrow batch group.
"""

from __future__ import annotations

import re
from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_RULES_SCHEMA = StructType(
    [
        StructField("disallow", ArrayType(StringType())),
        StructField("allow", ArrayType(StringType())),
        StructField("crawl_delay_ms", LongType()),
    ]
)


def parse_robots(body: str) -> tuple[list[str], list[str], int]:
    """Parse one robots.txt body → (disallow, allow, crawl_delay_ms) for
    user-agent '*'. Importable for RFC-example unit tests."""
    if body is None:
        return [], [], 0
    disallow: list[str] = []
    allow: list[str] = []
    delay_ms = 0
    applies = False
    in_header = False  # inside a group's run of consecutive User-agent lines
    for raw in body.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            # RFC 9309 §2.1 group structure: consecutive UA lines form ONE
            # group header (the group applies if ANY of them names us); a UA
            # line after rule lines STARTS A NEW GROUP (previous applicability
            # is reset, never carried over).
            if in_header:
                applies = applies or (val == "*")
            else:
                applies = val == "*"
                in_header = True
        elif key in ("disallow", "allow", "crawl-delay"):
            in_header = False  # rule line closes the group header
            if not applies:
                continue
            if key == "disallow" and val:
                disallow.append(val)
            elif key == "allow" and val:
                allow.append(val)
            elif key == "crawl-delay":
                try:
                    delay_ms = int(float(val) * 1000)
                except ValueError:
                    pass
    return disallow, allow, delay_ms


def _rule_re(rule: str) -> re.Pattern:
    # '*' → '.*', '$' at end anchors; everything else literal (RFC 9309 §2.2.3)
    anchored = rule.endswith("$")
    body = rule[:-1] if anchored else rule
    pat = ".*".join(re.escape(p) for p in body.split("*"))
    return re.compile("^" + pat + ("$" if anchored else ""))


def path_allowed(path: str, disallow: list[str], allow: list[str]) -> bool:
    """Longest-match wins; Allow wins ties; no match → allowed."""
    best_len, best_allow = -1, True
    for rules, verdict in ((disallow, False), (allow, True)):
        for r in rules:
            if _rule_re(r).match(path):
                n = len(r)
                if n > best_len or (n == best_len and verdict):
                    best_len, best_allow = n, verdict
    return best_allow


@pandas_udf(_RULES_SCHEMA)
def parse_robots_udf(bodies: pd.Series) -> pd.DataFrame:
    rows = [parse_robots(b) for b in bodies]
    return pd.DataFrame(
        {
            "disallow": [r[0] for r in rows],
            "allow": [r[1] for r in rows],
            "crawl_delay_ms": [r[2] for r in rows],
        }
    )


@pandas_udf(BooleanType())
def allowed_udf(it: Iterator[Tuple[pd.Series, pd.Series, pd.Series]]) -> Iterator[pd.Series]:
    """allowed(path, disallow[], allow[]) — vectorized with a tiny per-batch
    cache keyed on the rule tuple (one compile per distinct host rules)."""
    cache: dict[tuple, tuple[list[re.Pattern], list[re.Pattern], list[str], list[str]]] = {}
    for paths, dis, alw in it:
        out = []
        for p, d, a in zip(paths, dis, alw):
            d = list(d) if d is not None else []
            a = list(a) if a is not None else []
            key = (tuple(d), tuple(a))
            if key not in cache:
                cache[key] = ([_rule_re(r) for r in d], [_rule_re(r) for r in a], d, a)
            dre, are, dr, ar = cache[key]
            best_len, best_allow = -1, True
            for regs, rules, verdict in ((dre, dr, False), (are, ar, True)):
                for rx, r in zip(regs, rules):
                    if rx.match(p):
                        n = len(r)
                        if n > best_len or (n == best_len and verdict):
                            best_len, best_allow = n, verdict
            out.append(best_allow)
        yield pd.Series(out, dtype=bool)


def build_host_policy(robots_df: DataFrame) -> DataFrame:
    """robots fixture (host, robots_body, budget_per_round) → host_policy
    D4 table: parsed rules + crawl delay, ready to broadcast-join."""
    parsed = robots_df.withColumn("_r", parse_robots_udf(F.col("robots_body")))
    return parsed.select(
        "host",
        F.col("_r.disallow").alias("disallow"),
        F.col("_r.allow").alias("allow"),
        F.col("_r.crawl_delay_ms").alias("crawl_delay_ms"),
        "budget_per_round",
        F.col("robots_body"),
    )
