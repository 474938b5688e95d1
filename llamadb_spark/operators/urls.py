"""URL / domain-level curation operators — the crawl-hygiene step a
web-scale training corpus runs before any content filter (C4 caps
pages per domain; RefinedWeb §3.1 dedups and rate-limits by
registered domain; Gopher reports domain mix). The reference engine
(/root/reference) has no URL surface; these exist for the
training-data-pipeline families the brief adds (d26/p20 keys).

Two primitives, both pure JVM expressions (codegen'd projections —
no UDF, no shuffle of their own):

- ``host_of`` / ``registered_domain`` / ``public_suffix``: host from
  a URL by regexp, then eTLD+1 by LONGEST-match over an embedded,
  ordered public-suffix set (the multi-label suffixes like co.uk
  must win over their uk tail — the classic registrable-domain
  subtlety). The embedded set is a small curated subset of the
  Mozilla Public Suffix List: swap in the full list for production —
  the when-chain is generated from the tuple, so only the data
  changes.
- ``domain_cap_sample``: per-domain document caps as a deterministic
  Bernoulli rate draw (keep rate = cap/available, applied with the
  repo's multiplicative key hash — operators/sampling.bucket_hash).
  The scale-safe formulation: per-domain EXACT keep-first-k would
  need a rank window partitioned by domain, and crawl domain mass is
  exactly the skew AQE cannot split inside a window (one hot domain
  = one unsplittable task at 100 TB); the rate draw is one bounded
  count aggregate broadcast back onto a single codegen'd filter,
  reproducible on any cluster size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import col, lit

#: Ordered LONGEST-FIRST (label count, then alpha) — the when-chain
#: and every oracle twin iterate this exact order, so multi-label
#: suffixes shadow their single-label tails.
PUBLIC_SUFFIXES: tuple[str, ...] = (
    "ac.uk", "co.jp", "co.uk", "com.au", "com.br", "org.uk",
    "com", "de", "edu", "fr", "gov", "io", "jp", "net", "org", "uk",
)

_HOST_RE = r"^[a-z][a-z0-9+.-]*://([^/:?#]+)"


def host_of(url: Column) -> Column:
    """Hostname of a URL (lowercased, port/path/query stripped)."""
    return F.regexp_extract(F.lower(url), _HOST_RE, 1)


def _suffix_chain(host: Column, value_for):
    expr = None
    for s in PUBLIC_SUFFIXES:
        # equality handles the bare-suffix host ('co.uk' IS a public
        # suffix, not a registrable domain) — without it the chain
        # falls through to the '.uk' tail and invents registrant 'co'
        cond = host.endswith("." + s) | (host == s)
        arm = (cond, value_for(s))
        expr = F.when(*arm) if expr is None else expr.when(*arm)
    return expr.otherwise(lit(""))


def public_suffix(host: Column) -> Column:
    """Longest matching public suffix, '' if none matches."""
    return _suffix_chain(host, lambda s: lit(s))


def registered_domain(host: Column) -> Column:
    """eTLD+1: one label + the longest matching public suffix
    ('www.d7.example.co.uk' -> 'example.co.uk'); '' if no suffix
    matches or the host IS a bare suffix."""
    return _suffix_chain(
        host,
        lambda s: F.regexp_extract(
            host, r"([^.]+\." + s.replace(".", r"\.") + r")$", 1
        ),
    )


#: Query params dropped by canonical_url — session/campaign tracking
#: noise that makes one page look like many URLs (the reason URL-level
#: exact dedup needs canonicalization first). Anchored prefix match on
#: the param NAME; everything else (id=, page=, q=) survives.
TRACKING_PARAM_RE = r"^(utm_[a-z0-9_]*|gclid|fbclid|ref)="


def canonical_url(url: Column) -> Column:
    """Canonicalize a URL for identity comparison (the
    pre-dedup normalization step): lowercase scheme and host (path
    and query stay case-sensitive per RFC 3986), strip the fragment,
    strip default ports (:80 for http, :443 for https), strip
    trailing slashes from the path, and drop tracking query params
    (TRACKING_PARAM_RE) while PRESERVING every other param in order.

    All JVM-side: regexp splits + a higher-order ``filter`` over the
    split query string + ``array_join`` — no UDF, no shuffle, fully
    codegen-able, and every piece has an exact DuckDB twin
    (list_filter / array_to_string) for hash attestation.
    """
    scheme = F.lower(
        F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1)
    )
    hostport = F.lower(
        F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    )
    host = (
        F.when(scheme == "http", F.regexp_replace(hostport, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(hostport, ":443$", ""))
        .otherwise(hostport)
    )
    path = F.regexp_replace(
        F.regexp_extract(
            url, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1
        ),
        r"/+$",
        "",
    )
    qs = F.regexp_extract(url, r"\?([^#]*)", 1)
    kept = F.filter(
        F.split(qs, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
    )
    query = F.when(
        F.size(kept) > 0, F.concat(lit("?"), F.array_join(kept, "&"))
    ).otherwise(lit(""))
    return F.concat(scheme, lit("://"), host, path, query)


def domain_cap_sample(
    df: DataFrame,
    cap: int,
    domain_col: str = "domain",
    key_col: str = "doc_id",
    broadcast_rates: bool = False,
) -> DataFrame:
    """Cap documents per domain at an EXPECTED ``cap`` via the
    deterministic Bernoulli draw (keep rate = min(1, cap/available),
    threshold in integer milli-units — the p07 mixture discipline,
    engine-portable and reproducible at any cluster size).

    Returns the input rows surviving the draw. One count aggregate
    over |domains| groups, joined back, one codegen'd filter — no
    window, no skew hazard on hot domains. The rates table's size is
    DATA-DEPENDENT (a real crawl has tens of millions of registered
    domains — RefinedWeb reports ~30M), so by default AQE picks
    broadcast vs shuffle from runtime sizes; pass
    ``broadcast_rates=True`` only when the caller can BOUND the
    domain universe (the audit discipline for explicit hints).
    """
    from llamadb_spark.operators.sampling import bucket_hash

    counts = df.groupBy(domain_col).agg(F.count(lit(1)).alias("_n"))
    rates = counts.select(
        domain_col,
        F.least(
            lit(1000), F.expr(f"({1000 * cap} div _n)")
        ).alias("_t"),
    )
    if broadcast_rates:
        rates = F.broadcast(rates)
    return (
        df.join(rates, domain_col)
        .filter(bucket_hash(col(key_col)) < col("_t"))
        .drop("_t")
    )
