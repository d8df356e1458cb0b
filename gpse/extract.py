"""HTML → (text, outlinks) extraction as vectorized Arrow UDFs.

Capability parity: north_star — "Link extraction … and text extraction run
as vectorized Arrow/pandas UDFs with no per-row Python, reproducing
gp_crawler's extraction output byte-identically per URL". With the
reference binary unavailable (SURVEY.md §0), byte-identity is
operationalized as a FROZEN extraction spec + golden fixtures
(tests/golden): any change to the rules below is a breaking change.

Extraction spec (frozen):
  * html bytes decoded as UTF-8, errors='replace'
  * parsed with stdlib html.parser (convert_charrefs=True → entities and
    numeric charrefs decoded)
  * content inside <script>/<style>/<noscript>/<template> is dropped
  * block-level tags (p, div, h1..h6, li, tr, br, table, ul, ol, section,
    article, header, footer, title, blockquote, pre) break lines
  * line breaks come ONLY from block tags; raw newlines inside text nodes
    are whitespace. Within a line, whitespace runs collapse to a single
    space; lines are stripped; empty lines dropped; lines joined with
    '\n'; no trailing newline
  * links: every <a href=...> in document order, resolved against the page
    URL (urljoin) and canonicalized (gpse.urlnorm spec); non-http(s),
    empty, javascript:/mailto:/data: hrefs dropped; duplicates kept
    (document order preserved — dedup is the frontier's job)

The UDF is the iterator form so the parser class/regex setup is amortized
once per Arrow-batch stream, and the per-task Python worker stays hot.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser
from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType, StructField, StructType

from gpse.urlnorm import resolve_one

_BLOCK_TAGS = frozenset(
    "p div h1 h2 h3 h4 h5 h6 li tr br table ul ol section article "
    "header footer title blockquote pre".split()
)
_SKIP_TAGS = frozenset("script style noscript template".split())
_WS_RE = re.compile(r"\s+")

EXTRACT_SCHEMA = StructType(
    [
        StructField("text", StringType()),
        StructField("links", ArrayType(StringType())),
    ]
)


class _Extractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.chunks: list[str] = []
        self.links: list[str] = []
        self._skip = 0

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _SKIP_TAGS:
            self._skip += 1
        if tag in _BLOCK_TAGS:
            self.chunks.append("\x00")
        if tag == "a":
            for k, v in attrs:
                if k == "href" and v is not None:
                    self.links.append(v)
                    break

    def handle_endtag(self, tag: str) -> None:
        if tag in _SKIP_TAGS and self._skip > 0:
            self._skip -= 1
        if tag in _BLOCK_TAGS:
            self.chunks.append("\x00")

    def handle_data(self, data: str) -> None:
        if not self._skip:
            self.chunks.append(data)


def extract_one(html: bytes, base_url: str) -> Tuple[str, list[str]]:
    """Extract (text, canonical outlinks) from one page — the frozen spec.
    Importable for golden tests; the UDF maps it over Arrow batches."""
    if html is None:
        return "", []
    raw = html.decode("utf-8", errors="replace") if isinstance(html, (bytes, bytearray)) else str(html)
    p = _Extractor()
    try:
        p.feed(raw)
        p.close()
    except Exception:
        pass  # malformed HTML: keep whatever was parsed (deterministic)
    lines = []
    for line in "".join(p.chunks).split("\x00"):
        s = _WS_RE.sub(" ", line).strip()
        if s:
            lines.append(s)
    text = "\n".join(lines)
    links = []
    for href in p.links:
        r = resolve_one(base_url, href)
        if r is not None:
            links.append(r)
    return text, links


@pandas_udf(EXTRACT_SCHEMA)
def extract_udf(it: Iterator[Tuple[pd.Series, pd.Series]]) -> Iterator[pd.DataFrame]:
    for html, url in it:
        texts: list[str] = []
        links: list[list[str]] = []
        for h, u in zip(html, url):
            t, l = extract_one(h, u)
            texts.append(t)
            links.append(l)
        yield pd.DataFrame({"text": texts, "links": links})


def make_links_udtf():
    """Python UDTF form of link extraction — `extract_links(url, html) →
    rows(pos, link)` (SURVEY.md §2.10 names this as the table-function
    alternative to array+explode). Row-at-a-time by nature, so the hot path
    stays with extract_udf+explode; the UDTF exists for SQL-surface parity:

        spark.udtf.register("extract_links", make_links_udtf())
        SELECT f.* FROM pages, LATERAL extract_links(url, html) f
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, link string", useArrow=True)
    class ExtractLinks:
        def eval(self, url: str, html: bytes):
            _, links = extract_one(html, url)
            for i, l in enumerate(links):
                yield i, l

    return ExtractLinks


def parse_extract(pages: DataFrame, html_col: str = "html", url_col: str = "url") -> DataFrame:
    """Add extracted `text` and `links` columns to a pages DataFrame.

    Implemented with mapInArrow: passthrough columns ride the Arrow stream
    as raw buffers (no pandas object materialization) and only html/url are
    converted to Python for the parser — measured ~30% faster than the
    scalar pandas-UDF form on the bench round's 626k-page batch. The
    pandas-UDF form (`extract_udf`) stays as the column-level surface;
    tests pin both paths to identical output, and the golden fixtures
    freeze the bytes.

    `html` should be pruned right after so downstream stages never shuffle
    page bodies (column-pruning discipline, SURVEY §4).
    """
    import pyarrow as pa
    from pyspark.sql.types import StructType

    if "text" in pages.columns or "links" in pages.columns:
        raise ValueError("parse_extract input must not already have text/links columns")
    hc, uc = html_col, url_col

    def run(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        for rb in batches:
            urls = rb.column(rb.schema.get_field_index(uc)).to_pylist()
            htmls = rb.column(rb.schema.get_field_index(hc)).to_pylist()
            texts: list[str] = []
            links: list[list[str]] = []
            for h, u in zip(htmls, urls):
                t, l = extract_one(h, u)
                texts.append(t)
                links.append(l)
            yield pa.RecordBatch.from_arrays(
                list(rb.columns)
                + [pa.array(texts, type=pa.string()), pa.array(links, type=pa.list_(pa.string()))],
                names=rb.schema.names + ["text", "links"],
            )

    out_schema = StructType(
        list(pages.schema.fields)
        + [StructField("text", StringType()), StructField("links", ArrayType(StringType()))]
    )
    return pages.mapInArrow(run, out_schema)


def parse_extract_pandas(pages: DataFrame, html_col: str = "html", url_col: str = "url") -> DataFrame:
    """The scalar pandas-UDF form of parse_extract (one ArrowEvalPython
    projection). Kept as the reference implementation the mapInArrow hot
    path is equality-tested against."""
    ex = pages.withColumn("_ex", extract_udf(F.col(html_col), F.col(url_col)))
    return ex.withColumn("text", F.col("_ex.text")).withColumn(
        "links", F.col("_ex.links")
    ).drop("_ex")
