"""Text/string column functions.

Re-expresses the reference's row-level Python transforms
(``src/kafka_client/transformations.py``) as JVM-side Column
expressions — one ``select`` projection instead of a per-row dict
``map``, so whole-stage codegen applies and nothing crosses the
Python boundary in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Accented-Latin transliteration map, same effect as the reference's
# unidecode call (``src/kafka_client/transformations.py:44-48``) on
# the Latin-1/Latin-Extended ranges. Generated from NFD decomposition
# (char → ASCII base letter) so the `translate` src/dst stay in sync;
# non-decomposable letters and multi-char expansions (æ→ae, œ→oe,
# ß→ss) are listed explicitly and handled with regexp_replace.


def _build_accent_map() -> tuple[str, str]:
    import unicodedata

    src, dst = [], []
    extra_1to1 = {"ł": "l", "Ł": "L", "ø": "o", "Ø": "O", "đ": "d", "Đ": "D",
                  "ħ": "h", "Ħ": "H", "ŧ": "t", "Ŧ": "T", "ı": "i"}
    for cp in range(0x00C0, 0x024F + 1):
        ch = chr(cp)
        decomp = unicodedata.normalize("NFD", ch)
        if len(decomp) > 1 and decomp[0].isascii() and decomp[0].isalpha():
            src.append(ch)
            dst.append(decomp[0])
    for ch, repl in extra_1to1.items():
        src.append(ch)
        dst.append(repl)
    return "".join(src), "".join(dst)


_ACCENT_SRC, _ACCENT_DST = _build_accent_map()

_MULTI = [("æ", "ae"), ("Æ", "AE"), ("œ", "oe"), ("Œ", "OE"), ("ß", "ss")]


def strip_accents(col: Column | str) -> Column:
    """Accent transliteration (reference A6,
    ``src/kafka_client/transformations.py:44-48``).

    JVM-side: `translate` for 1:1 diacritics + `regexp_replace` for the
    few multi-char expansions. No Python UDF — at 100 TB the per-row
    Python serde of unidecode would dominate; `translate` stays inside
    whole-stage codegen.
    """
    c = F.col(col) if isinstance(col, str) else col
    for src, dst in _MULTI:
        c = F.regexp_replace(c, src, dst)
    return F.translate(c, _ACCENT_SRC, _ACCENT_DST)


def normalize_empty_to_null(col: Column | str) -> Column:
    """Falsy string → NULL (reference semantics: missing/empty source
    values become None, not "" — ``transformations.py:56-58``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c.isNull() | (c == ""), F.lit(None)).otherwise(c)


def merge_columns(a: Column | str, b: Column | str, sep: str = "\n") -> Column:
    """Null-aware two-column merge (reference A7,
    ``src/kafka_client/transformations.py:6-21``).

    Semantics `concat_ws` alone gets wrong: both-NULL must yield NULL
    (concat_ws yields ""), one-NULL yields the other value with no
    separator (concat_ws gets this right), both present joins with
    `sep`. Empty strings are treated as NULL first, matching the
    reference's falsy checks.
    """
    ca = normalize_empty_to_null(a)
    cb = normalize_empty_to_null(b)
    return F.when(ca.isNull() & cb.isNull(), F.lit(None)).otherwise(
        F.concat_ws(sep, ca, cb)
    )


_DDMMYYYY = r"(\d{2}/\d{2}/\d{4})"


def split_commercialisation_dates(col: Column | str) -> tuple[Column, Column]:
    """Regex date-range split (reference A8,
    ``src/kafka_client/transformations.py:24-41``).

    Extract dd/mm/yyyy occurrences from free text; exactly 2 matches →
    (start, end); exactly 1 match → start if the text contains
    "depuis le", end if it contains "jusqu"; anything else → (NULL,
    NULL). All JVM-side via regexp_extract_all + conditional chain.
    """
    c = F.col(col) if isinstance(col, str) else col
    matches = F.regexp_extract_all(c, F.lit(_DDMMYYYY))
    n = F.size(matches)
    lower = F.lower(c)
    one = n == 1
    start = (
        F.when(n == 2, matches[0])
        .when(one & lower.contains("depuis le"), matches[0])
        .otherwise(F.lit(None))
    )
    end = (
        F.when(n == 2, matches[1])
        .when(one & lower.contains("jusqu"), matches[0])
        .otherwise(F.lit(None))
    )
    return start, end
