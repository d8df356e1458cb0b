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
