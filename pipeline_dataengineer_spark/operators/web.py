"""Web-corpus URL operators: parse, normalize, per-domain stats.

A crawl-scale training pipeline keys almost everything on the URL —
dedup by canonical URL, per-domain caps and quality priors, host-level
language mixes. These operators canonicalize messy URLs with pure
JVM-side expressions (regexp + array higher-order functions — no
Python in the hot path, the whole thing fuses into one codegen stage
riding the scan).

Portability note: parsing uses one RFC-3986-shaped regex via
``regexp_extract`` rather than Spark's ``parse_url`` so the DuckDB
oracle can run the *identical* pattern — the contract checks the
canonicalization semantics, not a JVM library.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# scheme://host[:port]/path[?query][#fragment] — anchored, greedy host
# up to the first /?#, query up to #. Same regex runs in DuckDB.
URL_RE = r"^([a-zA-Z][a-zA-Z0-9+.-]*)://([^/?#]*)([^?#]*)(?:\?([^#]*))?(?:#(.*))?$"

# Tracking params stripped by normalize_urls (CommonCrawl-style).
TRACKING_PREFIXES = ("utm_", "fbclid", "gclid", "msclkid", "mc_eid")


def parse_urls(df: DataFrame, url_col: str, prefix: str = "") -> DataFrame:
    """Split ``url_col`` into scheme, host, port, path, query,
    fragment columns (empty string when absent, matching regex
    group semantics in both engines). Narrow projection — no shuffle.

    The output column names are ``prefix + name``; withColumns
    REPLACES same-named existing columns, so pass a prefix when the
    input may already carry columns like ``host`` or ``path`` (the
    internal callers use ``__u_`` to stay collision-free)."""
    u = F.col(url_col)
    hostport = F.regexp_extract(u, URL_RE, 2)
    return df.withColumns(
        {
            f"{prefix}scheme": F.lower(F.regexp_extract(u, URL_RE, 1)),
            f"{prefix}host": F.lower(F.regexp_extract(hostport, r"^([^:]*)", 1)),
            f"{prefix}port": F.regexp_extract(hostport, r":(\d+)$", 1),
            f"{prefix}path": F.regexp_extract(u, URL_RE, 3),
            f"{prefix}query": F.regexp_extract(u, URL_RE, 4),
            f"{prefix}fragment": F.regexp_extract(u, URL_RE, 5),
        }
    )


def _clean_query(query):
    """Drop tracking params from an already-split query string."""
    kept = F.filter(
        F.split(query, "&"),
        lambda kv: ~F.coalesce(
            F.lower(F.split(kv, "=")[0]).rlike(
                "^(" + "|".join(p.rstrip("_") + ("_.*" if p.endswith("_") else "") for p in TRACKING_PREFIXES) + ")$"
            ),
            F.lit(False),
        ),
    )
    return F.array_join(kept, "&")


def normalize_urls(df: DataFrame, url_col: str, out_col: str = "url_norm") -> DataFrame:
    """Canonicalize a URL for dedup keys:

    - scheme and host lowercased; leading ``www.`` stripped;
    - default ports (``:80`` http, ``:443`` https) stripped, others kept;
    - fragment dropped (never reaches the server);
    - tracking query params (utm_*, fbclid, gclid, ...) removed,
      remaining params kept in original order; '?' dropped if none
      survive;
    - trailing slash trimmed from non-root paths; empty path → ``/``.

    One fused projection (regexp + array filter, all codegen) — at
    crawl scale this rides the scan and the canonical key feeds
    dedup_exact / cap_per_key with no extra pass. Internals use
    ``__u_``-prefixed temporaries, so caller columns named host/path/
    etc. survive untouched."""
    parsed = parse_urls(df, url_col, prefix="__u_")
    host = F.regexp_replace(F.col("__u_host"), r"^www\.", "")
    port = F.col("__u_port")
    keep_port = (
        (port != "")
        & ~((F.col("__u_scheme") == "http") & (port == "80"))
        & ~((F.col("__u_scheme") == "https") & (port == "443"))
    )
    path = F.col("__u_path")
    path = F.when(path == "", F.lit("/")).otherwise(
        F.when(
            (F.length(path) > 1) & path.endswith("/"),
            F.expr("substring(__u_path, 1, length(__u_path) - 1)"),
        ).otherwise(path)
    )
    q = _clean_query(F.col("__u_query"))
    norm = F.concat(
        F.col("__u_scheme"),
        F.lit("://"),
        host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        path,
        F.when(q != "", F.concat(F.lit("?"), q)).otherwise(F.lit("")),
    )
    return parsed.withColumn(out_col, norm).drop(
        "__u_scheme", "__u_host", "__u_port", "__u_path", "__u_query", "__u_fragment"
    )


def registered_domain(host):
    """Last two labels of the host — an eTLD-1 approximation (a real
    public-suffix list is a broadcast join against its ~10k rows; the
    two-label cut is the standard fallback when the list isn't
    shipped). Pure string expression."""
    return F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)


def domain_stats(df: DataFrame, url_col: str, value_cols: list[str] | None = None) -> DataFrame:
    """Per-registered-domain corpus stats: page count, distinct hosts,
    plus sum/avg of any ``value_cols`` (e.g. doc length, quality
    score). ONE map-side-combinable groupBy on a low-cardinality key —
    the canonical shape for per-domain caps and priors at 100 TB."""
    parsed = parse_urls(df, url_col, prefix="__u_")
    dom = registered_domain(F.regexp_replace(F.col("__u_host"), r"^www\.", ""))
    aggs = [
        F.count(F.lit(1)).alias("n_pages"),
        F.countDistinct("__u_host").alias("n_hosts"),
    ]
    for c in value_cols or []:
        aggs += [F.sum(c).alias(f"sum_{c}"), F.avg(c).alias(f"avg_{c}")]
    return parsed.groupBy(dom.alias("domain")).agg(*aggs)


# Apache Common/Combined Log Format — the canonical access-log line
_CLF_RE = (
    r'^(\S+) \S+ (\S+) \[([^\]]+)\] "(\S+) (\S+)[^"]*" (\d{3}) (\S+)'
)


def parse_common_log(col: Column | str) -> Column:
    """Parse an Apache Common Log Format line into a struct
    (ip, user, ts_raw, method, path, status, bytes) — the web-server
    ingest everyone writes by hand. ONE regex evaluated per field
    group via regexp_extract (Catalyst collapses the repeats under
    common-subexpression elimination), fused codegen, no UDF;
    non-matching lines yield all-empty fields (filter on
    ``parsed.status != ''`` for the quarantine split). The pattern is
    RE2-portable for oracle replay."""
    c = F.col(col) if isinstance(col, str) else col
    g = lambda i: F.regexp_extract(c, _CLF_RE, i)
    return F.struct(
        g(1).alias("ip"),
        g(2).alias("user"),
        g(3).alias("ts_raw"),
        g(4).alias("method"),
        g(5).alias("path"),
        g(6).alias("status"),
        g(7).alias("bytes"),
    )
