"""URL canonicalization + URL-keyed dedup."""

from __future__ import annotations

from pyspark.sql import functions as F

from vanus_spark.llm.urls import canonicalize_url, synthesize_messy_urls, url_dedup


def _canon(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    return [r.c for r in df.select(canonicalize_url(F.col("url")).alias("c")).collect()]


def test_canonicalize_rules(spark):
    cases = {
        "HTTP://WWW.Example.COM:80/a/b/": "http://example.com/a/b",
        "https://example.com:443/x": "https://example.com/x",
        "https://example.com:8443/x": "https://example.com:8443/x",  # non-default port kept
        "http://example.com/p?utm_source=a&q=1&fbclid=zz#frag": "http://example.com/p?q=1",
        "http://example.com/p?b=2&a=1": "http://example.com/p?a=1&b=2",  # sorted
        "http://example.com.": "http://example.com",
        "http://example.com/?utm_campaign=x": "http://example.com",
        "  http://example.com/a  ": "http://example.com/a",
        "not a url": "not a url",  # no scheme -> trimmed passthrough
        # valueless tracking params (ad platforms emit both forms)
        "http://example.com/p?gclid": "http://example.com/p",
        "http://example.com/p?fbclid&q=1": "http://example.com/p?q=1",
        # non-tracking param that merely PREFIXES a tracking name is kept
        "http://example.com/p?reference=9": "http://example.com/p?reference=9",
    }
    got = _canon(spark, list(cases))
    assert got == list(cases.values())


def test_url_dedup_keeps_best_quality(spark):
    rows = [
        (1, "http://A.com/x?utm_source=s", 10),
        (2, "http://a.com/x/", 99),
        (3, "HTTP://www.a.com/x", 50),
        (4, "http://b.com/y", 7),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "url", "n_chars"])
    out = {r.canonical_url: r for r in url_dedup(df, quality_col="n_chars").collect()}
    assert out["http://a.com/x"].doc_id == 2  # highest quality wins
    assert out["http://a.com/x"].dup_count == 3
    assert out["http://b.com/y"].dup_count == 1


def test_synthesized_urls_collide_after_canon(spark):
    docs = spark.range(420).withColumnRenamed("id", "doc_id")
    urls = synthesize_messy_urls(docs)
    canon = urls.select(canonicalize_url(F.col("url")).alias("c"))
    n_distinct = canon.distinct().count()
    # residues cycle at lcm(2,5,7,3) = 210 -> exactly 210 canonical urls
    assert n_distinct == 210


def test_canonicalize_idempotent_on_fuzzed_urls(spark):
    import random

    rng = random.Random(7)
    schemes = ["http", "HTTP", "https", "HTTPS"]
    hosts = ["Example.COM", "www.site.org", "a.b.co.", "X.Y:8080", "h.io:80"]
    paths = ["", "/", "/a", "/a/b/", "/a//b", "/p%20q"]
    queries = ["", "?a=1", "?b=2&a=1", "?utm_source=x&q=3", "?q=3&gclid=9&z="]
    frags = ["", "#f", "#x/y?z"]
    urls = [
        rng.choice(schemes) + "://" + rng.choice(hosts) + rng.choice(paths)
        + rng.choice(queries) + rng.choice(frags)
        for _ in range(200)
    ]
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    once = canonicalize_url(F.col("url"))
    rows = df.select(
        once.alias("c1"), canonicalize_url(once).alias("c2")
    ).collect()
    for r in rows:
        assert r.c1 == r.c2, r


# ---------------------------------------------------------------------------
# registered domain + blocklist filtering
# ---------------------------------------------------------------------------

def test_registered_domain_rules(spark):
    from vanus_spark.llm.urls import registered_domain
    from pyspark.sql import functions as F

    rows = [
        ("blog.Example.CO.UK:8080", "example.co.uk"),
        ("cdn.static.example1.com", "example1.com"),
        ("example.com", "example.com"),
        ("localhost", "localhost"),
        ("a.b.gov.br", "b.gov.br"),
        ("deep.sub.domain.example.org", "example.org"),
    ]
    df = spark.createDataFrame([(h,) for h, _ in rows], "host string")
    got = [
        r.d
        for r in df.select(registered_domain(F.col("host")).alias("d")).collect()
    ]
    assert got == [want for _, want in rows]


def test_domain_blocklist_filter_broadcasts_and_drops(spark):
    from vanus_spark.llm.urls import domain_blocklist_filter

    urls = spark.createDataFrame(
        [
            (1, "https://www.good.com/a"),
            (2, "https://bad.com/b"),
            (3, "https://sub.bad.com/c"),
            (4, "https://good.co.uk/d"),
        ],
        "doc_id long, url string",
    )
    bl = spark.createDataFrame([("BAD.com",)], "domain string")
    out = domain_blocklist_filter(urls, bl)
    assert {r.doc_id for r in out.collect()} == {1, 4}
    # the blocklist side must broadcast (corpus never shuffles)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" in plan
