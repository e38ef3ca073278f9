"""URL canonicalization + URL-keyed dedup for web-crawl corpora.

The first dedup pass of any crawl-derived training set is by URL, not
content: canonicalize (case, default ports, tracking params, fragments,
trailing slashes, www), then keep the best-quality capture per
canonical URL. Everything here is pure Column expressions —
regexp/array ops, zero UDFs, zero shuffle for canonicalization; the
dedup itself is one per-key window (partitioned by canonical URL, so
parallelism is #urls, never 1).

Engine-portable by construction (regexp_extract/replace + list ops
mirror 1:1 in the DuckDB oracle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

# Query params that identify a click, not a resource. The (=|$)
# alternation drops VALUELESS forms too (?gclid, ?fbclid — ad
# platforms emit both). Deliberate trade-off: 'ref' is dropped even
# though a few sites use it as a genuine resource selector — for
# crawl dedup, over-merging the rare ref-keyed page beats keeping
# every referral variant of every popular page as a distinct URL.
TRACKING_PARAM_RE = r"^(utm_[^=]*|gclid|fbclid|ref)(=|$)"

_SCHEME_RE = r"^([a-zA-Z][a-zA-Z0-9+.-]*)://"
_AUTHORITY_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)"
_PREFIX_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*"


def canonicalize_url(c: Column) -> Column:
    """Canonical form of an http(s) URL:

    - scheme + host lowercased, ``www.`` and trailing host dots
      stripped, default ports (:80 http, :443 https) stripped
    - fragment dropped
    - tracking params (utm_*, gclid, fbclid, ref) dropped; surviving
      params sorted for order-independence
    - trailing path slashes stripped

    Non-URL input (no scheme) passes through trimmed — callers decide
    whether to treat it as a bare path."""
    u = F.regexp_replace(F.trim(c), "#.*$", "")  # fragment
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    auth = F.lower(F.regexp_extract(u, _AUTHORITY_RE, 1))
    auth = F.regexp_replace(auth, r"^www\.", "")
    auth = F.regexp_replace(auth, r"\.$", "")
    auth = F.when(scheme == "http", F.regexp_replace(auth, ":80$", "")).otherwise(
        F.when(scheme == "https", F.regexp_replace(auth, ":443$", "")).otherwise(auth)
    )
    rest = F.regexp_replace(u, _PREFIX_RE, "")
    path = F.regexp_replace(F.regexp_extract(rest, r"^([^?]*)", 1), "/+$", "")
    query = F.regexp_extract(rest, r"\?(.*)$", 1)
    kept = F.array_join(
        F.array_sort(
            F.filter(
                F.split(query, "&"),
                lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
            )
        ),
        "&",
    )
    return F.when(
        scheme == "",
        F.trim(c),
    ).otherwise(
        F.concat(
            scheme,
            F.lit("://"),
            auth,
            path,
            F.when(kept == "", F.lit("")).otherwise(F.concat(F.lit("?"), kept)),
        )
    )


def url_dedup(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    quality_col: str | None = None,
) -> DataFrame:
    """One row per canonical URL: the best capture (highest
    ``quality_col``, ties to lowest id) plus the capture count.
    Per-key window on the canonical URL — shuffles once on the dedup
    key, parallelism #urls."""
    canon = df.withColumn("canonical_url", canonicalize_url(F.col(url_col)))
    order = (
        [F.desc(quality_col), F.asc(id_col)] if quality_col else [F.asc(id_col)]
    )
    w = Window.partitionBy("canonical_url").orderBy(*order)
    cw = Window.partitionBy("canonical_url")
    return (
        canon.withColumn("_rn", F.row_number().over(w))
        .withColumn("dup_count", F.count("*").over(cw))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def synthesize_messy_urls(
    docs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, url): deterministic messy URLs exercising every
    canonicalization rule — mixed-case schemes, www, default ports,
    unordered + tracking params, fragments, trailing slashes. The
    id-keyed residues (host id%5, path id%7, param id%3) guarantee
    canonical collisions for the dedup stage."""
    mid = F.col(id_col)
    scheme = F.when(mid % 2 == 0, F.lit("HTTPS")).otherwise(F.lit("http"))
    www = F.when(mid % 3 == 0, F.lit("www.")).otherwise(F.lit(""))
    host = F.concat(F.lit("Example"), (mid % 5).cast("string"), F.lit(".COM"))
    port = F.when(
        (mid % 10 == 0), F.lit(":443")
    ).otherwise(F.when(mid % 10 == 5, F.lit(":80")).otherwise(F.lit("")))
    path = F.concat(F.lit("/docs/page"), (mid % 7).cast("string"))
    slash = F.when(mid % 4 == 0, F.lit("/")).otherwise(F.lit(""))
    q = F.concat(F.lit("q="), (mid % 3).cast("string"))
    track = F.lit("utm_source=feed")
    params = F.when(mid % 2 == 0, F.concat(track, F.lit("&"), q)).otherwise(
        F.concat(q, F.lit("&"), track)
    )
    frag = F.when(mid % 6 == 0, F.lit("#section-2")).otherwise(F.lit(""))
    return docs.select(
        mid,
        F.concat(
            scheme, F.lit("://"), www, host, port, path, slash, F.lit("?"), params, frag
        ).alias("url"),
    )


# ---------------------------------------------------------------------------
# domain-level filtering (blocklists — the C4/RefinedWeb URL filter)
# ---------------------------------------------------------------------------

# Registry second-level labels under 2-letter TLDs (co.uk, com.au,
# gov.br, ...). A compact public-suffix heuristic: the real PSL is a
# data-file swap, the pure-Column plan shape is the point.
CC_SLD = ("co", "com", "net", "org", "ac", "gov", "edu")


def host_of(url: Column) -> Column:
    """Authority (host[:port]) of a URL, '' for non-URLs."""
    return F.regexp_extract(F.trim(url), _AUTHORITY_RE, 1)


def registered_domain(host: Column) -> Column:
    """eTLD+1: the last two host labels, or the last three when the
    TLD is 2 letters and the second-level label is a registry SLD
    (blog.example.co.uk -> example.co.uk; cdn.example1.com ->
    example1.com). Lowercased, port stripped. Pure Columns — at
    100 TB this is a zero-shuffle projection."""
    h = F.regexp_replace(F.lower(F.trim(host)), r"^[^@/]*@", "")  # userinfo
    h = F.regexp_replace(h, r":\d+$", "")
    labels = F.split(h, r"\.")
    n = F.size(labels)
    tld = F.element_at(labels, -1)
    sld = F.element_at(labels, -2)
    take3 = (n >= 3) & (F.length(tld) == 2) & sld.isin(*CC_SLD)
    return (
        F.when(take3, F.concat_ws(".", F.element_at(labels, -3), sld, tld))
        .when(n >= 2, F.concat_ws(".", sld, tld))
        .otherwise(h)
    )


def domain_blocklist_filter(
    df: DataFrame,
    blocklist: DataFrame,
    url_col: str = "url",
) -> DataFrame:
    """Rows whose URL's registered domain is NOT on the blocklist,
    plus the extracted ``domain`` column. The blocklist (one
    ``domain`` column, human-curated scale: thousands of rows)
    BROADCASTS; the corpus never shuffles — filter-by-small-table is
    a map-side anti-join at any corpus size."""
    tagged = df.withColumn(
        "domain", registered_domain(host_of(F.col(url_col)))
    )
    bl = blocklist.select(
        F.lower(F.col(blocklist.columns[0])).alias("domain")
    )
    return tagged.join(F.broadcast(bl), "domain", "left_anti")
