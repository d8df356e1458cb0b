"""Canonicalization spec tests (SURVEY.md §5.1) + property checks."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from gpse.urlnorm import canonicalize_one, resolve_one


CASES = [
    ("HTTP://Example.COM/path", "http://example.com/path"),
    ("http://example.com:80/a", "http://example.com/a"),
    ("https://example.com:443/a", "https://example.com/a"),
    ("http://example.com:8080/a", "http://example.com:8080/a"),
    ("http://example.com/a#frag", "http://example.com/a"),
    ("http://example.com/a?b=2&a=1", "http://example.com/a?a=1&b=2"),
    ("http://example.com/a?", "http://example.com/a"),
    ("http://example.com", "http://example.com/"),
    ("http://example.com/x/../p/1", "http://example.com/p/1"),
    ("http://example.com/x/./y", "http://example.com/x/y"),
    ("  http://example.com/a  ", "http://example.com/a"),
    ("http://example.com/%7Euser", "http://example.com/~user"),
    ("http://h5.EXAMPLE:80/p/123#f", "http://h5.example/p/123"),
]


def test_cases():
    for raw, want in CASES:
        assert canonicalize_one(raw) == want, raw


def test_idempotent_on_cases():
    for raw, _ in CASES:
        c = canonicalize_one(raw)
        assert canonicalize_one(c) == c


url_st = st.builds(
    lambda scheme, host, port, path, q, frag: f"{scheme}://{host}{port}/{path}{q}{frag}",
    st.sampled_from(["http", "HTTP", "https", "HtTpS"]),
    st.from_regex(r"[A-Za-z0-9]{1,10}(\.[A-Za-z]{2,5}){1,2}", fullmatch=True),
    st.sampled_from(["", ":80", ":443", ":8080"]),
    st.from_regex(r"[a-z0-9/._~-]{0,20}", fullmatch=True),
    st.sampled_from(["", "?a=1", "?b=2&a=1", "?z=%20x"]),
    st.sampled_from(["", "#f", "#frag/with/stuff"]),
)


@settings(max_examples=200, deadline=None)
@given(url_st)
def test_idempotent_property(u):
    c = canonicalize_one(u)
    assert canonicalize_one(c) == c


@settings(max_examples=200, deadline=None)
@given(url_st)
def test_never_keeps_fragment(u):
    assert "#" not in canonicalize_one(u)


def test_resolve():
    base = "http://h1.example/p/1"
    assert resolve_one(base, "../p/2") == "http://h1.example/p/2"
    assert resolve_one(base, "/x") == "http://h1.example/x"
    assert resolve_one(base, "HTTP://H2.EXAMPLE:80/p/3#f") == "http://h2.example/p/3"
    assert resolve_one(base, "javascript:void(0)") is None
    assert resolve_one(base, "mailto:a@b.c") is None
    assert resolve_one(base, "") is None
    assert resolve_one(base, "#top") is None
    assert resolve_one(base, "ftp://x.y/z") is None


# r6: resolve_one's cheap-transform tail (fragment / case / default port /
# dot segments, certified by _FAST_CANONICAL_RE) must ALWAYS agree with the
# urljoin+canonicalize_one reference path it shortcuts.
abs_href_st = st.builds(
    lambda scheme, host, port, path, frag: f"{scheme}://{host}{port}{path}{frag}",
    st.sampled_from(["http", "HTTP", "https", "HtTpS"]),
    st.sampled_from(
        ["h1.example", "H1.EXAMPLE", "Mixed.Example.org", "u:p@h.example",
         "h.example", "[::1]", "xn--bcher-kva.example"]
    ),
    st.sampled_from(["", ":80", ":443", ":8080"]),
    st.from_regex(r"(/[A-Za-z0-9._~-]{0,6}){0,4}(/\.\.|/\.)?", fullmatch=True),
    st.sampled_from(["", "#f", "#frag-7"]),
)


@settings(max_examples=400, deadline=None)
@given(abs_href_st)
def test_resolve_cheap_tail_matches_reference(href):
    from urllib.parse import urljoin

    from gpse.urlnorm import canonicalize_one as c1

    base = "http://base.example/p/1"
    got = resolve_one(base, href)
    joined = urljoin(base, href)
    want = c1(joined) if joined.startswith(("http://", "https://")) else None
    assert got == want, href
