"""URL canonicalization unit tests (functions/urls.py) — each
normalization pinned on handcrafted URLs, independent of the
membership oracle that certifies the same laws at sf."""

from bcg_contacts_data_pipeline_spark.functions.urls import (
    url_canonicalize,
    url_host,
    url_registered_domain,
)


def _canon(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [r["c"] for r in df.select(url_canonicalize("url").alias("c")).collect()]


def test_canonicalize_normalizations(spark):
    got = _canon(
        spark,
        [
            "HTTPS://WWW.Example.COM:443/A/B/",     # case, default port, slash
            "http://example.com:80/x",              # http default port
            "http://example.com:8080/x",            # NON-default port kept
            "https://example.com/a?utm_source=t&b=2&a=1#frag",  # strip+sort
            "https://example.com/a//b///c",         # duplicate slashes
            "https://example.com/",                 # root -> no path
            "https://example.com/a?utm_source=x&fbclid=y",  # query empties
        ],
    )
    assert got == [
        "https://www.example.com/A/B",
        "http://example.com/x",
        "http://example.com:8080/x",
        "https://example.com/a?a=1&b=2",
        "https://example.com/a/b/c",
        "https://example.com",
        "https://example.com/a",
    ]


def test_canonicalize_null_and_garbage(spark):
    got = _canon(spark, ["not a url at all"])
    assert got == [None]
    df = spark.createDataFrame([(None,)], "url string")
    assert df.select(url_canonicalize("url").alias("c")).first()["c"] is None


def test_host_and_registered_domain(spark):
    df = spark.createDataFrame(
        [("https://News.Sub.Example.CO/x",), ("https://localhost/x",)],
        "url string",
    )
    rows = df.select(
        url_host("url").alias("h"), url_registered_domain("url").alias("d")
    ).collect()
    assert (rows[0]["h"], rows[0]["d"]) == ("news.sub.example.co", "example.co")
    assert (rows[1]["h"], rows[1]["d"]) == ("localhost", "localhost")


def test_canonicalize_idempotent(spark):
    """The canonicalizer law: canon(canon(u)) == canon(u) for every URL
    it accepts — a canonical form that re-canonicalizes to something
    else is not canonical. One batched Spark round-trip over a URL
    grid that crosses every normalization axis (scheme case x port x
    path shape x query x fragment)."""
    from bcg_contacts_data_pipeline_spark.functions.urls import (
        url_canonicalize,
    )
    import pyspark.sql.functions as F

    schemes = ["http://", "HTTPS://", "https://"]
    hosts = ["Example.COM", "www.ex.org:443", "ex.org:8080"]
    paths = ["", "/", "/a//b/", "/a/b"]
    queries = ["", "?utm_source=x", "?b=2&a=1", "?a=1&utm_medium=m&z=0"]
    frags = ["", "#top"]
    urls = [
        s + h + p + q + f
        for s in schemes
        for h in hosts
        for p in paths
        for q in queries
        for f in frags
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    rows = df.select(
        url_canonicalize("url").alias("c1"),
        url_canonicalize(url_canonicalize("url")).alias("c2"),
    ).collect()
    assert all(r["c1"] is not None for r in rows)
    bad = [(r["c1"], r["c2"]) for r in rows if r["c1"] != r["c2"]]
    assert not bad, bad[:5]
