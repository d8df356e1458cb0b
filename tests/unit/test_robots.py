"""RFC 9309 matcher tests (SURVEY.md §5.1) — examples from the RFC."""

from gpse.robots import parse_robots, path_allowed


def test_parse_basic():
    dis, alw, delay = parse_robots(
        "User-agent: *\nDisallow: /private/\nAllow: /private/ok\nCrawl-delay: 2\n"
    )
    assert dis == ["/private/"]
    assert alw == ["/private/ok"]
    assert delay == 2000


def test_parse_other_agent_ignored():
    dis, _, _ = parse_robots("User-agent: Googlebot\nDisallow: /\n")
    assert dis == []


def test_parse_malformed_degrades_to_allow_all():
    dis, alw, delay = parse_robots("U$er-agent *;; Disallow\n<<<>>>\n")
    assert dis == [] and alw == [] and delay == 0


def test_parse_empty_disallow_means_allow_all():
    dis, _, _ = parse_robots("User-agent: *\nDisallow:\n")
    assert dis == []


def test_longest_match_wins():
    # RFC 9309 §2.2.2: most specific (longest) rule wins
    assert path_allowed("/private/ok/x", ["/private/"], ["/private/ok"])
    assert not path_allowed("/private/other", ["/private/"], ["/private/ok"])


def test_allow_wins_ties():
    assert path_allowed("/p", ["/p"], ["/p"])


def test_wildcard_and_anchor():
    assert not path_allowed("/a/x.pdf", ["/*.pdf$"], [])
    assert path_allowed("/a/x.pdfx", ["/*.pdf$"], [])
    assert not path_allowed("/fish/salmon", ["/fish*on"], [])


def test_no_rules_allows():
    assert path_allowed("/anything", [], [])


def test_comments_stripped():
    dis, _, _ = parse_robots("User-agent: *\nDisallow: /x # comment\n")
    assert dis == ["/x"]


# ---- RFC 9309 §2.1 group structure (multi-group / multi-UA-line bodies) ----

def test_group_multiple_ua_lines_share_rules():
    # consecutive UA lines form one group header: rules apply to BOTH agents
    dis, _, _ = parse_robots(
        "User-agent: *\nUser-agent: googlebot\nDisallow: /\n"
    )
    assert dis == ["/"]


def test_group_ua_line_after_rules_starts_new_group():
    # a UA line following rule lines starts a NEW group; earlier
    # applicability must not leak into it
    dis, _, _ = parse_robots(
        "User-agent: *\nDisallow: /a\nUser-agent: googlebot\nDisallow: /b\n"
    )
    assert dis == ["/a"]


def test_group_later_star_group_applies():
    dis, _, _ = parse_robots(
        "User-agent: googlebot\nDisallow: /x\nUser-agent: *\nDisallow: /y\n"
    )
    assert dis == ["/y"]


def test_group_star_then_named_in_same_header_applies():
    dis, _, _ = parse_robots(
        "User-agent: googlebot\nUser-agent: *\nDisallow: /z\n"
    )
    assert dis == ["/z"]


def test_group_rules_from_two_matching_groups_merge():
    # RFC 9309 §2.2.1: multiple matching groups' rules are combined
    dis, alw, delay = parse_robots(
        "User-agent: *\nDisallow: /a\n\n"
        "User-agent: googlebot\nDisallow: /g\n\n"
        "User-agent: *\nDisallow: /b\nAllow: /b/ok\nCrawl-delay: 1\n"
    )
    assert dis == ["/a", "/b"]
    assert alw == ["/b/ok"]
    assert delay == 1000


def test_group_crawl_delay_of_other_agent_ignored():
    _, _, delay = parse_robots(
        "User-agent: googlebot\nCrawl-delay: 9\nUser-agent: *\nDisallow: /p\n"
    )
    assert delay == 0


def test_matches_stdlib_robotparser_on_plain_rules():
    """Cross-check against urllib.robotparser (the public stdlib
    implementation) on wildcard-free rule sets. Scope caveat: stdlib
    implements the 1994 draft's FIRST-MATCH-in-file-order semantics, while
    we implement RFC 9309 longest-match (Allow wins ties). The two agree
    exactly when more-specific rules are listed before shorter overlapping
    ones — the fixtures below are written that way, so any mismatch is a
    real matcher bug, not a spec difference."""
    import urllib.robotparser as urp

    from gpse.robots import path_allowed, parse_robots

    bodies = [
        "User-agent: *\nAllow: /a/b\nDisallow: /a\n",
        "User-agent: *\nAllow: /priv/pub\nDisallow: /priv/\nDisallow: /tmp\n",
        "User-agent: googlebot\nDisallow: /g\nUser-agent: *\nDisallow: /x/y\n",
        "User-agent: *\nUser-agent: other\nAllow: /both/ok\nDisallow: /both\n",
        "User-agent: *\nDisallow:\n",
    ]
    paths = ["/", "/a", "/a/b", "/a/bc", "/priv/", "/priv/pub/x", "/tmp",
             "/tmpx", "/x/y", "/x", "/both", "/both/ok", "/g"]
    for body in bodies:
        rp = urp.RobotFileParser()
        rp.parse(body.splitlines())
        dis, alw, _ = parse_robots(body)
        for p in paths:
            ours = path_allowed(p, dis, alw)
            ref = rp.can_fetch("*", f"http://h.example{p}")
            assert ours == ref, (body, p, ours, ref)
