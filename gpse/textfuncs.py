"""Text analysis for web-scale training-data pipelines — pure Column
expressions (JVM-side, whole-stage-codegen'd; zero Python in the hot path).

Covers the pipeline ops the engine must offer over a crawled corpus:
language-ID (stopword-ratio heuristic), quality scoring (length / punct /
stopword ratios), token counting (whitespace + word-regex), and document
fingerprinting. Each has a matching ANSI-SQL oracle in __spark_entry__.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny, fixed stopword lists — deterministic heuristic, not a model.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "on"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "auf"],
    "fr": ["le", "la", "les", "et", "est", "pas", "un", "une", "pour", "dans"],
    "pl": ["i", "nie", "to", "się", "jest", "na", "z", "do", "że", "ale"],
    "es": ["el", "la", "los", "y", "es", "no", "un", "una", "para", "con"],
    "zh": [],  # no-space script: heuristic falls through to 'und'
}


def tokens(text: Column) -> Column:
    """Whitespace tokens, lowercased, empties dropped."""
    return F.filter(F.split(F.lower(text), r"\s+"), lambda t: t != F.lit(""))


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def word_token_count(text: Column) -> Column:
    """BPE-ish word/number/punct token count via regex (a proxy for
    tokenizer cost estimation at corpus scale)."""
    cleaned = F.regexp_replace(text, r"[A-Za-z]+|[0-9]+", " W ")
    return F.size(F.filter(F.split(cleaned, r"\s+"), lambda t: t != F.lit("")))


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    toks = tokens(text)
    hits = F.size(F.filter(toks, lambda t: t.isin(STOPWORDS[lang])))
    return (hits / F.greatest(F.size(toks), F.lit(1))).cast("double")


def lang_id_from_tokens(toks: Column, langs: list[str] | None = None) -> Column:
    """`lang_id` over an ALREADY-TOKENIZED column. The tokenization
    (lower + regex split) dominates lang_id's cost and appears once per
    language in the naive form; Catalyst's subexpression elimination only
    partially dedups it through the higher-order filter lambdas (measured:
    4.7 s vs 2.6 s on the 626k-row bench batch). Hot paths (crawl.run_round)
    materialize `tokens(text)` as a real projected column — multi-referenced
    non-cheap expressions survive CollapseProject un-inlined — and pass it
    here; `lang_id` remains the one-argument convenience form."""
    langs = langs or ["en", "de", "fr", "pl", "es"]
    n = F.greatest(F.size(toks), F.lit(1))
    entries = [
        F.struct(
            (F.size(F.filter(toks, lambda t: t.isin(STOPWORDS[lg]))) / n)
            .cast("double")
            .alias("s"),
            F.lit(-i).alias("ni"),
            F.lit(lg).alias("lang"),
        )
        for i, lg in enumerate(langs)
    ]
    best = F.array_max(F.array(*entries))
    return F.when(best["s"] <= 0, F.lit("und")).otherwise(best["lang"])


_LANG_ORDER = ["en", "de", "fr", "pl", "es"]
_STOP_MASK: dict[str, int] = {}
for _i, _lg in enumerate(_LANG_ORDER):
    for _w in STOPWORDS[_lg]:
        _STOP_MASK[_w] = _STOP_MASK.get(_w, 0) | (1 << _i)
del _i, _lg, _w
# Java regex \s is ASCII-only (no UNICODE_CHARACTER_CLASS); Python re's
# \s is unicode-aware — spell the exact class so tokenization matches
# F.split(lower(text), r"\s+") byte-for-byte (e.g. NBSP must NOT split).
import re as _re  # noqa: E402

_WS_SPLIT_JAVA = _re.compile(r"[ \t\n\x0b\f\r]+")


def lang_id_py(text: str | None) -> str:
    """Pure-Python mirror of `lang_id` (r6): EXACTLY the same result as the
    Column-expression form, at a dict probe per token instead of 5
    interpreted higher-order filter passes per row. Used by the crawl
    round's extraction stage, where the text is already in Python inside
    the mapInArrow batch — measured ~16x cheaper than the JVM HOF form
    there (which is interpreted, not codegen'd). Parity with the Column
    form is pinned in tests/unit/test_extract.py over the corpus and
    adversarial unicode (NBSP, final sigma, combining marks)."""
    if not text:
        return "und"
    toks = [t for t in _WS_SPLIT_JAVA.split(text.lower()) if t]
    n = len(toks)
    if n == 0:
        return "und"
    counts = [0, 0, 0, 0, 0]
    get = _STOP_MASK.get
    for t in toks:
        m = get(t)
        if m:
            if m & 1:
                counts[0] += 1
            if m & 2:
                counts[1] += 1
            if m & 4:
                counts[2] += 1
            if m & 8:
                counts[3] += 1
            if m & 16:
                counts[4] += 1
    # argmax(score, then earliest lang) — the struct array_max tie-break
    best_i, best_s = 0, counts[0] / n
    for i in (1, 2, 3, 4):
        s = counts[i] / n
        if s > best_s:
            best_i, best_s = i, s
    return _LANG_ORDER[best_i] if best_s > 0 else "und"


def lang_id(text: Column, langs: list[str] | None = None) -> Column:
    """argmax of per-language stopword ratio; 'und' if all zero.

    Built as array_max over (score, -index, lang) structs — one evaluation
    per score. (A chained when/otherwise fold nests each score inside every
    later comparison; Catalyst duplicates the un-CSE'd subexpressions and
    the plan blows up exponentially — measured 17s extra on a 110k-row
    batch.) Ties break to the earliest lang in `langs`, matching the SQL
    oracle's >= chain."""
    return lang_id_from_tokens(tokens(text), langs)


def punct_ratio(text: Column) -> Column:
    n_punct = F.length(F.regexp_replace(text, r"[^.,;:!?'\"()\[\]{}]", ""))
    return (n_punct / F.greatest(F.length(text), F.lit(1))).cast("double")


def quality_score(text: Column) -> Column:
    """[0,1] heuristic: long enough, word-y, not punctuation soup.
    Deterministic composition of the ratios above."""
    len_ok = F.least(F.length(text) / F.lit(200.0), F.lit(1.0))
    word_ok = F.least(token_count(text) / F.lit(40.0), F.lit(1.0))
    punct_pen = F.greatest(F.lit(0.0), F.lit(1.0) - punct_ratio(text) * 4)
    return ((len_ok + word_ok + punct_pen) / 3.0).cast("double")


def fingerprint(text: Column) -> Column:
    """Stable document fingerprint (md5 hex — oracle-matchable in DuckDB)."""
    return F.md5(F.encode(text, "UTF-8"))
