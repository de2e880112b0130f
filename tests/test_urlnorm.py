"""URL canonicalization (operators/urlnorm.py) — Spark expression vs a
plain-Python oracle implementing the identical pinned contract, over
hand-picked alias families and a generated cross-product of URL parts."""

from __future__ import annotations

import pytest

import re

from pyspark.sql import functions as F


def _py_canonical(url: str) -> str:
    """Plain-Python twin of urlnorm.canonical_url (same contract)."""
    url = re.sub(r"#.*$", "", url)
    m = re.match(r"^([A-Za-z][A-Za-z0-9+.-]*)://", url)
    scheme = m.group(1).lower() if m else ""
    rest = url[len(m.group(0)):] if m else url
    am = re.match(r"^([^/?]*)", rest)
    authority = am.group(1)
    path_q = rest[len(authority):]
    host_port = re.sub(r"^[^@]*@", "", authority)
    hm = re.match(r"^([^:]*)", host_port)
    host = hm.group(1).lower()
    pm = re.search(r":([0-9]+)$", host_port)
    port = pm.group(1) if pm else ""
    keep = port and not ((scheme == "http" and port == "80")
                         or (scheme == "https" and port == "443"))
    auth_c = f"{host}:{port}" if keep else host
    qm = re.match(r"^([^?]*)", path_q)
    path = qm.group(1)
    query = path_q[len(path) + 1:] if "?" in path_q else ""
    params = [p for p in query.split("&")
              if p and not re.match(
                  r"^(utm_[a-z0-9_]*|gclid|fbclid|msclkid|ref)=",
                  p.lower())]
    query_c = "&".join(sorted(params))
    if path == "":
        path_c = "/"
    elif len(path) > 1 and path.endswith("/"):
        path_c = path[:-1]
    else:
        path_c = path
    return (f"{scheme}://{auth_c}{path_c}"
            + (f"?{query_c}" if query_c else ""))


CASES = [
    # alias family → one canonical form
    "HTTP://Example.COM:80/a/b/?utm_source=x&b=2&a=1#frag",
    "http://example.com/a/b?a=1&b=2",
    "http://user:pw@example.com:80/a/b/?b=2&a=1",
    "https://Example.com:443/",
    "https://example.com",
    "https://example.com/?gclid=abc&fbclid=def&ref=tw",
    "https://example.com:8443/x?z=1&y=2&utm_campaign=c",
    "http://example.com:8080/x/",
    "http://example.com/x//",           # only ONE trailing slash strips
    "http://example.com/?a=1&a=0",      # duplicate keys sort by full param
    "http://example.com/p?UTM_source=x&A=1",  # tracker match is case-insens,
                                              # value case preserved
    "http://sub.Example.com/p#a?b=1",   # fragment cut happens FIRST
]


def test_canonical_url_matches_python_oracle(spark):
    from llm_knowledge_graph_spark.operators.urlnorm import (
        with_canonical_url)
    df = spark.createDataFrame([(u,) for u in CASES], "url string")
    got = {r.url: r.canonical_url
           for r in with_canonical_url(df).collect()}
    for u in CASES:
        assert got[u] == _py_canonical(u), u


@pytest.mark.heavy
def test_canonical_url_collapses_alias_families(spark):
    from llm_knowledge_graph_spark.operators.urlnorm import (
        with_canonical_url)
    fam = [
        "HTTP://Example.COM:80/a/b/?utm_source=x&b=2&a=1#frag",
        "http://example.com/a/b?a=1&b=2",
        "http://example.com/a/b/?b=2&a=1",
        "http://Example.com/a/b?b=2&a=1#other",
    ]
    df = spark.createDataFrame([(u,) for u in fam], "url string")
    vals = {r.canonical_url for r in with_canonical_url(df).collect()}
    assert vals == {"http://example.com/a/b?a=1&b=2"}
    # and non-aliases do NOT collapse
    other = ["http://example.com/a/b?a=2&b=2",      # different value
             "http://example.com:8080/a/b?a=1&b=2",  # non-default port
             "https://example.com/a/b?a=1&b=2"]      # different scheme
    df2 = spark.createDataFrame([(u,) for u in fam + other], "url string")
    vals2 = {r.canonical_url for r in with_canonical_url(df2).collect()}
    assert len(vals2) == 1 + len(other)


def test_canonical_url_generated_cross_product(spark):
    """Exhaustive small cross-product of URL features — every combination
    must agree with the Python oracle (the Spark side is regex/array
    expressions whose edge cases — empty query, no path, userinfo,
    tracker-only query — all appear in the product)."""
    from llm_knowledge_graph_spark.operators.urlnorm import (
        with_canonical_url)
    urls = []
    for scheme in ("http", "HTTPS"):
        for auth in ("Host.com", "user@host.com:80", "host.com:443",
                     "host.com:8080"):
            for path in ("", "/", "/A/b/", "/x"):
                for q in ("", "?utm_source=1", "?b=2&a=1",
                          "?a=1&utm_x=9&"):
                    for frag in ("", "#f/g?h"):
                        urls.append(f"{scheme}://{auth}{path}{q}{frag}")
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = {r.url: r.canonical_url for r in with_canonical_url(df).collect()}
    for u in urls:
        assert got[u] == _py_canonical(u), u


def test_url_dup_stats(spark):
    from llm_knowledge_graph_spark.operators.urlnorm import url_dup_stats
    rows = [
        "http://a.com/p?x=1&utm_source=s",   # family 1, spelling A
        "HTTP://A.com/p/?x=1",               # family 1, spelling B
        "http://a.com/p?x=1",                # family 1, spelling C
        "http://a.com/p?x=1",                # family 1, spelling C again
        "http://b.com/q",                    # singleton (1 spelling)
        "http://b.com/q",                    # fetched twice, same spelling
    ]
    df = spark.createDataFrame([(u,) for u in rows], "url string")
    out = {r.canonical_url: (r.n_fetches, r.n_distinct_spellings)
           for r in url_dup_stats(df).collect()}
    # only the multi-spelling family is reported
    assert out == {"http://a.com/p?x=1": (4, 3)}


@pytest.mark.heavy
def test_domain_cap_sample_is_layout_invariant(spark):
    """The kept set is a pure function of (domain, id) — repartitioning
    the input must not change which docs survive the quota."""
    from llm_knowledge_graph_spark.operators.urlnorm import \
        domain_cap_sample
    from pyspark.sql import functions as F
    rows = [(i, f"d{i % 5}") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, domain string")
    a = {r.doc_id for r in
         domain_cap_sample(df, "domain", 7, "doc_id").collect()}
    b = {r.doc_id for r in
         domain_cap_sample(df.repartition(13), "domain", 7, "doc_id")
         .collect()}
    assert a == b
    counts = (domain_cap_sample(df, "domain", 7, "doc_id")
              .groupBy("domain").count().collect())
    assert all(r["count"] <= 7 for r in counts) and len(counts) == 5
