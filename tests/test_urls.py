"""URL/domain curation operator tests (operators/urls.py, round 10)."""

from __future__ import annotations

import pyspark.sql.functions as F


def test_registered_domain_longest_suffix_wins(spark):
    """The registrable-domain subtlety: multi-label public suffixes
    (co.uk) must shadow their single-label tails (uk), subdomains
    must collapse to eTLD+1, and non-matching / bare-suffix hosts
    yield ''."""
    from llamadb_spark.operators.urls import (
        host_of,
        public_suffix,
        registered_domain,
    )

    cases = [
        ("https://www.example.co.uk/p?q=1", "example.co.uk", "co.uk"),
        ("https://a.b.example.co.uk/", "example.co.uk", "co.uk"),
        ("http://example.uk/x", "example.uk", "uk"),
        ("https://cdn.news.example.com:8080/a", "example.com", "com"),
        ("https://EXAMPLE.ORG/Path", "example.org", "org"),
        ("https://localhost/x", "", ""),  # no suffix matches
        ("https://co.uk/", "", "co.uk"),  # bare suffix: no registrant
        ("ftp://files.example.net", "example.net", "net"),
    ]
    df = spark.createDataFrame([(u,) for u, _, _ in cases], "url string")
    h = host_of(F.col("url"))
    got = {
        r.url: (r.dom, r.sfx)
        for r in df.select(
            "url",
            registered_domain(h).alias("dom"),
            public_suffix(h).alias("sfx"),
        ).collect()
    }
    for url, dom, sfx in cases:
        assert got[url] == (dom, sfx), (url, got[url], (dom, sfx))


def test_domain_cap_sample_rates_and_determinism(spark):
    """The cap draw: domains at/below cap survive whole; a hot
    domain is cut to ~cap in expectation; the draw is a pure
    function of doc_id (same survivors on re-run); and the plan has
    NO window (the scale argument — hot-domain skew can't land in
    an unsplittable window task)."""
    from llamadb_spark.operators.urls import domain_cap_sample

    rows = [(i, "hot.com") for i in range(400)] + [
        (1000 + i, f"tail{i}.org") for i in range(20)
    ]
    df = spark.createDataFrame(rows, "doc_id long, domain string")
    out1 = domain_cap_sample(df, cap=3).collect()
    out2 = domain_cap_sample(df, cap=3).collect()
    assert sorted(r.doc_id for r in out1) == sorted(r.doc_id for r in out2)
    tail = [r for r in out1 if r.domain != "hot.com"]
    assert len(tail) == 20  # rate 1000/1000: every tail doc survives
    hot = [r for r in out1 if r.domain == "hot.com"]
    # rate floor(3000/400)=7/1000 over 400 draws: expected ~2.8,
    # bounded well under the uncapped mass
    assert 0 < len(hot) <= 15

    plan = (
        domain_cap_sample(df, cap=3)
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    assert "Window" not in plan


def test_canonical_url_rules(spark):
    """Each canonicalization rule in isolation and composed:
    scheme/host lowercased (path case preserved), fragment stripped,
    default ports stripped (custom ports kept), trailing slashes
    stripped, tracking params dropped while other params survive in
    order."""
    from llamadb_spark.operators.urls import canonical_url

    cases = [
        ("HTTPS://WWW.Example.COM/Path/", "https://www.example.com/Path"),
        ("https://example.com:443/a", "https://example.com/a"),
        ("http://example.com:80/a", "http://example.com/a"),
        ("http://example.com:8080/a", "http://example.com:8080/a"),
        ("https://example.com/a#frag", "https://example.com/a"),
        (
            "https://example.com/a?utm_source=x&id=7&utm_campaign=y",
            "https://example.com/a?id=7",
        ),
        (
            "https://example.com/a?id=7&page=2",
            "https://example.com/a?id=7&page=2",
        ),
        ("https://example.com/a?utm_source=x", "https://example.com/a"),
        ("https://example.com/a?gclid=z#f", "https://example.com/a"),
        ("https://example.com//", "https://example.com"),
        (
            "https://example.com/a?ref=hn&q=Spark",
            "https://example.com/a?q=Spark",
        ),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    import pyspark.sql.functions as F

    got = {
        r.url: r.canon
        for r in df.select(
            "url", canonical_url(F.col("url")).alias("canon")
        ).collect()
    }
    for raw, want in cases:
        assert got[raw] == want, (raw, got[raw], want)
