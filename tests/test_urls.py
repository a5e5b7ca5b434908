"""URL canonicalization: the normalization table pinned on hand-written
URLs (every rule, including the ones the corpus derivation can't reach:
multi-part public suffixes, schemeless input, non-default ports kept),
idempotence, and driver-scale oracle parity at sf0.01 (sf0.001 runs via
the PYTEST_ORACLES parametrization in test_oracle.py)."""

import pytest
from pyspark.sql import functions as F

from artan_spark.plans.urls import canonical_url, registered_domain

# (raw, canonical, registered_domain)
CASES = [
    # lowercase host, www., default port, trailing slash, tracking params
    # dropped, survivors sorted, fragment stripped
    (
        "HTTPS://WWW.Example.COM:443/a/b/?utm_source=x&b=2&a=1#frag",
        "example.com/a/b?a=1&b=2",
        "example.com",
    ),
    # multi-part public suffix + duplicate-slash collapse + :80
    (
        "http://News.BBC.co.uk:80//uk//politics/",
        "news.bbc.co.uk/uk/politics",
        "bbc.co.uk",
    ),
    # bare host, no path/query
    ("https://example.com", "example.com", "example.com"),
    ("https://example.com/", "example.com", "example.com"),
    # query emptied by tracking-param removal drops its '?'
    ("https://example.com/?fbclid=abc", "example.com", "example.com"),
    ("https://example.com/x?gclid=1&msclkid=2&ref=tw&ref_src=t", "example.com/x", "example.com"),
    # ref as a VALUE survives (only the param NAMED ref drops)
    ("https://example.com/x?a=ref&utm_campaign=c", "example.com/x?a=ref", "example.com"),
    # non-default port kept (different origin)
    ("https://example.com:8080/x", "example.com:8080/x", "example.com"),
    # schemeless input
    ("example.com/x?b=2&a=1", "example.com/x?a=1&b=2", "example.com"),
    # single-label host passes through registered_domain
    ("http://localhost:80/health", "localhost/health", "localhost"),
    # deep subdomain, plain suffix
    ("https://a.b.c.example.org/p", "a.b.c.example.org/p", "example.org"),
    # multi-part suffix with exactly three labels
    ("https://shop.com.au/item?id=1", "shop.com.au/item?id=1", "shop.com.au"),
    # percent-forms NOT decoded
    ("https://example.com/a%2Fb?x=%20y", "example.com/a%2Fb?x=%20y", "example.com"),
    # utm_* family is a prefix class
    ("https://example.com/?utm_medium=email&utm_term=z&id=3", "example.com?id=3", "example.com"),
]


def _apply(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    rows = df.select(
        canonical_url(F.col("url")).alias("c"),
        registered_domain(F.col("url")).alias("d"),
    ).collect()
    return [(r["c"], r["d"]) for r in rows]


def test_normalization_table(spark):
    got = _apply(spark, [raw for raw, _, _ in CASES])
    for (raw, want_c, want_d), (c, d) in zip(CASES, got):
        assert c == want_c, f"{raw!r}: canonical {c!r} != {want_c!r}"
        assert d == want_d, f"{raw!r}: domain {d!r} != {want_d!r}"


def test_canonical_is_idempotent(spark):
    once = [c for c, _ in _apply(spark, [raw for raw, _, _ in CASES])]
    twice = [c for c, _ in _apply(spark, once)]
    assert once == twice


def test_url_dedup_collapses_variant_groups(spark):
    """The four synthetic variants of one (source, page) collapse to one
    canonical page with keep_doc_id = the group minimum."""
    from artan_spark.plans.urls import docs_url_dedup, with_synthetic_url
    from artan_spark.sources import read_table

    sf = "/root/testdata/sf0.001"
    out = {r["canonical_url"]: r for r in docs_url_dedup(spark, sf).collect()}
    d = read_table(spark, sf, "documents").select("doc_id", "source").collect()
    import collections

    groups = collections.defaultdict(list)
    for r in d:
        page = r["doc_id"] // 4
        cu = f"example-{r['source']}.com/articles/{page}?id={page}"
        groups[cu].append(r["doc_id"])
    assert set(out) == set(groups)
    for cu, ids in groups.items():
        assert out[cu]["keep_doc_id"] == min(ids)
        assert out[cu]["dup_count"] == len(ids)


@pytest.mark.parametrize(
    "name",
    [
        "docs_url_canonical",
        "docs_url_dedup",
        "docs_host_stats",
        "corpus_curation_with_urls",
        "docs_domain_cap",
    ],
)
def test_url_oracle_parity_sf001(spark, name):
    # docs_url_dedup moved to the driver window in the r11 rotation:
    # resolve from whichever registry holds the entry now
    from artan_spark.plans import ORACLES, PYTEST_ORACLES, QUERIES
    from artan_spark.plans.oracle import compare

    fn, sql = (
        (QUERIES[name], ORACLES[name]) if name in QUERIES else PYTEST_ORACLES[name]
    )
    r = compare(spark, fn, sql, "/root/testdata/sf0.01")
    assert r["match"], f"{name}: {r}"


def test_canonicalization_is_codegen_projection(spark):
    """Scale contract: the canonical projection is ONE JVM-side Project
    over the scan — no shuffle, no Python eval. (The query-param HOF
    lambdas keep the Project out of whole-stage codegen, but it stays a
    single interpreted JVM projection — still a per-row map over the
    scan, nothing materializes or moves.)"""
    from artan_spark.plans.urls import docs_url_canonical

    plan = (
        docs_url_canonical(spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # two Projects: the codegen'd synthetic-url derivation + the
    # interpreted canonical map — both per-row, scan-fused
    assert plan.count("Project") == 2
    # column pruning reached the scan: text/lang/n_chars never read
    assert "FileScan parquet [doc_id" in plan and "text" not in plan.split("ReadSchema")[-1]


# -- property: canonicalization matches an independent reference -------------

import re as _re

from hypothesis import given, settings
from hypothesis import strategies as st

_TRACK_RE = _re.compile(r"^(utm_[^=&]*|fbclid|gclid|msclkid|ref|ref_src)(=.*)?$")


def _py_canonical(url: str) -> str:
    """Plain-Python reference of the normalization table (module
    docstring of plans/urls.py), written independently of the Catalyst
    expression tree."""
    u = _re.sub(r"#.*", "", url.strip(), count=1)
    u = _re.sub(r"^[A-Za-z][A-Za-z0-9+.\-]*://", "", u, count=1)
    m = _re.match(r"^([^/?]+)", u)
    hostport = (m.group(1) if m else "").lower()
    host = _re.sub(r":(80|443)$", "", hostport)
    host = _re.sub(r"^www\.", "", host)
    rest = u[len(m.group(1)):] if m else u
    pm = _re.match(r"^([^?]*)", rest)
    path = pm.group(1) if pm else ""
    path = _re.sub(r"/+$", "", _re.sub(r"/{2,}", "/", path))
    qm = _re.search(r"\?(.*)$", rest)
    q = qm.group(1) if qm else ""
    params = sorted(p for p in q.split("&") if p and not _TRACK_RE.match(p))
    qn = "&".join(params)
    return host + path + ("?" + qn if qn else "")


_label = st.text(alphabet="aBc9-", min_size=1, max_size=5)
_param = st.one_of(
    st.sampled_from(["utm_source=x", "utm_x", "fbclid=1", "ref", "ref=z", "refx=1"]),
    st.text(alphabet="ab=1", min_size=1, max_size=6),
)
_urls = st.builds(
    lambda scheme, www, labels, port, segs, params, frag: (
        scheme
        + ("www." if www else "")
        + ".".join(labels)
        + port
        + "".join("/" + s for s in segs)
        + ("?" + "&".join(params) if params else "")
        + ("#" + frag if frag else "")
    ),
    st.sampled_from(["http://", "https://", "HTTPS://", ""]),
    st.booleans(),
    st.lists(_label, min_size=1, max_size=4),
    st.sampled_from(["", ":80", ":443", ":8080"]),
    st.lists(st.text(alphabet="ab/%2", min_size=0, max_size=4), max_size=3),
    st.lists(_param, max_size=4),
    st.sampled_from(["", "frag", "a#b"]),
)


@settings(max_examples=60, deadline=None)
@given(st.lists(_urls, min_size=1, max_size=20))
def test_canonical_matches_python_reference(spark, urls):
    got = [c for c, _ in _apply(spark, urls)]
    want = [_py_canonical(u) for u in urls]
    assert got == want
    # idempotence on arbitrary inputs
    assert [c for c, _ in _apply(spark, got)] == got
