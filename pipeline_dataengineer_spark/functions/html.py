"""HTML → text extraction as a pure JVM regexp chain.

The first transform every web-crawl pretraining pipeline runs
(trafilatura/jusText family). A full DOM parse is Python-library
territory; the regex core — drop script/style/comment subtrees,
strip tags, decode the common entities, collapse whitespace —
covers the bulk of boilerplate text extraction and, written as a
chain of ``regexp_replace`` calls, runs entirely inside whole-stage
codegen: no UDF, no Python worker, scales with the scan.

Pattern constraints, deliberate: RE2 (DuckDB oracle) has no
backreferences, so script/style close-tags are matched explicitly
rather than via ``</\\1>``; every pattern here is valid and
equivalent in both Java regex and RE2, which is what makes
``q_html_to_text`` oracle-checkable."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (pattern, replacement) applied in order. Subtree drops must precede
# the generic tag strip, entity decodes must follow it (so "&lt;b&gt;"
# decodes to a literal "<b>" instead of being stripped as a tag).
HTML_STRIP_RULES: tuple[tuple[str, str], ...] = (
    (r"(?is)<script[^>]*>.*?</script>", " "),
    (r"(?is)<style[^>]*>.*?</style>", " "),
    (r"(?is)<!--.*?-->", " "),
    (r"(?is)<[^>]+>", " "),
    (r"&nbsp;", " "),
    (r"&amp;", "&"),
    (r"&lt;", "<"),
    (r"&gt;", ">"),
    (r"&quot;", '"'),
    (r"&#39;", "'"),
    (r"\s+", " "),
)


def html_to_text(col: Column | str) -> Column:
    """Visible text of an HTML payload: script/style/comment subtrees
    dropped, tags stripped, common entities decoded, whitespace
    collapsed, trimmed. One fused codegen projection."""
    out = F.col(col) if isinstance(col, str) else col
    for pat, repl in HTML_STRIP_RULES:
        out = F.regexp_replace(out, pat, repl)
    return F.trim(out)


def html_title(col: Column | str) -> Column:
    """<title> contents (entity-decoded, trimmed), NULL when absent —
    the metadata column web-corpus quality filters key on."""
    c = F.col(col) if isinstance(col, str) else col
    raw = F.regexp_extract(c, r"(?is)<title[^>]*>(.*?)</title>", 1)
    title = raw
    for pat, repl in HTML_STRIP_RULES[4:]:
        title = F.regexp_replace(title, pat, repl)
    return F.when(raw != "", F.trim(title))


def visible_text_ratio(col: Column | str) -> Column:
    """len(visible text) / len(raw html) — the classic boilerplate
    gate (pages that are mostly markup score near 0)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(
        F.length(c) > 0,
        F.round(F.length(html_to_text(c)).cast("double") / F.length(c), 4),
    )
