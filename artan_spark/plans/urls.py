"""URL/host canonicalization + URL-level dedup — the FIRST pass of every
published crawl-curation pipeline (CCNet, RefinedWeb dedup by normalized
URL/host before any content pass), run before the content-level passes in
``plans/dedup.py``.

Normalization table (applied in order, all pure-Catalyst string ops):

1. trim; strip the fragment (``#...``);
2. strip the scheme (``http://`` vs ``https://`` vs missing never makes
   two crawls of one page distinct);
3. host: lowercase, strip a leading ``www.``, strip default ports
   ``:80``/``:443`` (non-default ports are kept — they address different
   origins);
4. path: collapse duplicate slashes, strip trailing slashes;
5. query: drop tracking parameters (``utm_*``, ``fbclid``, ``gclid``,
   ``msclkid``, ``ref``, ``ref_src``), sort the survivors bytewise, rejoin
   (param order never makes two URLs distinct); an emptied query drops its
   ``?``.

Percent-decoding is deliberately NOT applied: decoding changes reserved
characters' meaning and real pipelines treat %-forms as distinct.

``registered_domain`` is the last-two-labels heuristic with a small
multi-part public-suffix table (``co.uk`` and friends) — the grouping key
for host-level stats and per-site caps (``sampling.docs_source_cap`` shape).

100-TB shape: canonicalization is a per-row projection (whole-stage
codegen, no Python); URL dedup is ONE hash aggregate on the canonical
string — the key is already ~60 bytes so no pre-hashing is needed (the
text-level twin ``dedup.dedup_exact`` hashes because its key is the whole
document). The driver tables carry no url column, so the corpus entries
derive one deterministically from (doc_id, source) — four messy variants
per page id, exercising every normalization rule at corpus scale; the
DuckDB oracle derives the identical column (FIXTURES.md pattern).

The reference engine has no URL handling; this is beyond-reference
surface (training-data pipeline stage 1).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from artan_spark.sources import read_table

# tracking params dropped by rule 5 (one whole-param regex, anchored)
TRACKING_PARAM_RE = r"^(utm_[^=&]*|fbclid|gclid|msclkid|ref|ref_src)(=.*)?$"

# multi-part public suffixes for the registered-domain heuristic: when the
# host's last two labels are one of these, the registered domain takes
# three labels (news.bbc.co.uk -> bbc.co.uk)
MULTI_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "co.jp", "ne.jp", "or.jp",
    "com.au", "net.au", "org.au",
    "co.nz", "co.in", "co.za", "co.kr",
    "com.br", "com.cn", "com.mx", "com.tr",
)


def canonical_host(url: Column) -> Column:
    """host part of ``canonical_url`` alone: lowercase, no www., no
    default port. Accepts schemeless input (host = everything up to the
    first ``/`` or ``?``)."""
    rest = _after_scheme(url)
    hostport = F.lower(F.regexp_extract(rest, r"^([^/?]+)", 1))
    host = F.regexp_replace(hostport, r":(80|443)$", "")
    return F.regexp_replace(host, r"^www\.", "")


def canonical_url(url: Column) -> Column:
    """The full normalization table (module docstring) as one Catalyst
    projection. Output carries no scheme; idempotent (canonical of a
    canonical form is itself — pinned in tests)."""
    rest = _after_scheme(url)
    path = F.regexp_extract(rest, r"^[^/?]+([^?]*)", 1)
    path = F.regexp_replace(F.regexp_replace(path, "/{2,}", "/"), "/+$", "")
    q = F.regexp_extract(rest, r"\?(.*)$", 1)
    params = F.filter(
        F.split(q, "&"),
        lambda p: (p != F.lit("")) & ~p.rlike(TRACKING_PARAM_RE),
    )
    qn = F.array_join(F.array_sort(params), "&")
    return F.concat(
        canonical_host(url),
        path,
        F.when(qn != "", F.concat(F.lit("?"), qn)).otherwise(F.lit("")),
    )


def registered_domain(url: Column) -> Column:
    """Registered (pay-level) domain of the canonical host: last two
    labels, or three when the last two are a multi-part public suffix.
    Single-label hosts (``localhost``) pass through unchanged. Any port is
    stripped here (a domain has no port; canonical_url keeps non-default
    ones because they address distinct origins)."""
    host = F.regexp_replace(canonical_host(url), r":\d+$", "")
    t = F.split(host, r"\.")
    last2 = F.concat_ws(".", F.element_at(t, -2), F.element_at(t, -1))
    return (
        F.when(F.size(t) < 2, host)
        .when(
            (F.size(t) >= 3) & last2.isin(*MULTI_SUFFIXES),
            F.concat_ws(".", F.element_at(t, -3), last2),
        )
        .otherwise(last2)
    )


def _after_scheme(url: Column) -> Column:
    u = F.regexp_replace(F.trim(url), "#.*", "")  # fragment first
    return F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.\-]*://", "")


# -- synthetic url column for the driver tables -----------------------------
#
# documents has no url column; derive one from (doc_id, source) with four
# messy variants per page id so the canonicalizer has real work at corpus
# scale. Every rule fires: v0 has www. + a tracking param + a fragment,
# v1 uppercases scheme+host, adds :443 and a trailing slash, v2 doubles a
# slash and appends gclid, v3 uses http:// + :80 + a trailing ref param.
# All four of a (source, page) group canonicalize to
#   example-{source}.com/articles/{page}?id={page}


def with_synthetic_url(docs: DataFrame) -> DataFrame:
    page = F.expr("doc_id div 4").cast("string")
    v = F.col("doc_id") % 4
    hb = F.concat(F.lit("example-"), F.col("source"), F.lit(".com"))
    did = F.col("doc_id").cast("string")
    url = (
        F.when(
            v == 0,
            F.concat(F.lit("https://www."), hb, F.lit("/articles/"), page,
                     F.lit("?utm_source=feed&id="), page, F.lit("#sec"), did),
        )
        .when(
            v == 1,
            F.concat(F.lit("HTTPS://"), F.upper(hb), F.lit(":443/articles/"),
                     page, F.lit("/?id="), page),
        )
        .when(
            v == 2,
            F.concat(F.lit("https://"), hb, F.lit("//articles/"), page,
                     F.lit("?gclid=g"), did, F.lit("&id="), page),
        )
        .otherwise(
            F.concat(F.lit("http://"), hb, F.lit(":80/articles/"), page,
                     F.lit("?id="), page, F.lit("&ref="), F.col("source")),
        )
    )
    return docs.withColumn("url", url)


_URL_DERIVE_SQL = """
SELECT doc_id, source,
       CASE doc_id % 4
         WHEN 0 THEN 'https://www.example-' || source || '.com/articles/' ||
                     CAST(doc_id // 4 AS VARCHAR) || '?utm_source=feed&id=' ||
                     CAST(doc_id // 4 AS VARCHAR) || '#sec' || CAST(doc_id AS VARCHAR)
         WHEN 1 THEN 'HTTPS://' || UPPER('example-' || source || '.com') ||
                     ':443/articles/' || CAST(doc_id // 4 AS VARCHAR) ||
                     '/?id=' || CAST(doc_id // 4 AS VARCHAR)
         WHEN 2 THEN 'https://example-' || source || '.com//articles/' ||
                     CAST(doc_id // 4 AS VARCHAR) || '?gclid=g' ||
                     CAST(doc_id AS VARCHAR) || '&id=' || CAST(doc_id // 4 AS VARCHAR)
         ELSE 'http://example-' || source || '.com:80/articles/' ||
              CAST(doc_id // 4 AS VARCHAR) || '?id=' ||
              CAST(doc_id // 4 AS VARCHAR) || '&ref=' || source
       END AS url
FROM documents
"""

# the normalization table, re-expressed in DuckDB over a column named url
_CANON_SQL_EXPRS = """
  regexp_replace(
    regexp_replace(
      lower(regexp_extract(regexp_replace(regexp_replace(trim(url), '#.*$', ''),
                                          '^[A-Za-z][A-Za-z0-9+.-]*://', ''),
                           '^([^/?]+)', 1)),
      ':(80|443)$', ''),
    '^www\\.', '') AS c_host,
  regexp_replace(
    regexp_replace(
      regexp_extract(regexp_replace(regexp_replace(trim(url), '#.*$', ''),
                                    '^[A-Za-z][A-Za-z0-9+.-]*://', ''),
                     '^[^/?]+([^?]*)', 1),
      '/{2,}', '/', 'g'),
    '/+$', '') AS c_path,
  array_to_string(
    list_sort(list_filter(
      string_split(regexp_extract(regexp_replace(trim(url), '#.*$', ''),
                                  '\\?(.*)$', 1), '&'),
      p -> p <> '' AND NOT regexp_matches(p,
            '^(utm_[^=&]*|fbclid|gclid|msclkid|ref|ref_src)(=.*)?$'))),
    '&') AS c_query
"""

_SUFFIX_LIST_SQL = ", ".join(f"'{s}'" for s in MULTI_SUFFIXES)


# -- corpus entries ----------------------------------------------------------


def docs_url_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, url, canonical_url, registered_domain): the full
    normalization table pinned row-by-row at corpus scale (one
    whole-stage-codegen projection, zero shuffles)."""
    d = with_synthetic_url(read_table(spark, sf_dir, "documents"))
    return d.select(
        "doc_id",
        "url",
        canonical_url(F.col("url")).alias("canonical_url"),
        registered_domain(F.col("url")).alias("registered_domain"),
    )


_URL_CANONICAL_SQL = f"""
WITH u AS ({_URL_DERIVE_SQL}),
c AS (SELECT doc_id, url, {_CANON_SQL_EXPRS} FROM u),
r AS (
  SELECT *, regexp_replace(c_host, ':[0-9]+$', '') AS h,
         string_split(regexp_replace(c_host, ':[0-9]+$', ''), '.') AS t
  FROM c
)
SELECT doc_id, url,
       c_host || c_path ||
       CASE WHEN c_query = '' THEN '' ELSE '?' || c_query END AS canonical_url,
       CASE WHEN len(t) < 2 THEN h
            WHEN len(t) >= 3 AND (t[-2] || '.' || t[-1]) IN ({_SUFFIX_LIST_SQL})
              THEN t[-3] || '.' || t[-2] || '.' || t[-1]
            ELSE t[-2] || '.' || t[-1]
       END AS registered_domain
FROM r
"""


def docs_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact URL-level dedup: one hash aggregate on the canonical URL —
    keep the smallest doc_id per canonical page (the CCNet/RefinedWeb
    first-stage pass; the synthetic variants make every group of up to 4
    same-(source, page) docs collapse)."""
    d = with_synthetic_url(read_table(spark, sf_dir, "documents"))
    return (
        d.groupBy(canonical_url(F.col("url")).alias("canonical_url"))
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).cast("long").alias("dup_count"),
        )
    )


_URL_DEDUP_SQL = f"""
WITH u AS ({_URL_DERIVE_SQL}),
c AS (SELECT doc_id, {_CANON_SQL_EXPRS} FROM u)
SELECT c_host || c_path ||
       CASE WHEN c_query = '' THEN '' ELSE '?' || c_query END AS canonical_url,
       MIN(doc_id) AS keep_doc_id, COUNT(*) AS dup_count
FROM c GROUP BY 1
"""


def docs_host_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(registered_domain, n_docs, n_pages): per-site volume — the input
    to per-site caps (compose with ``sampling.docs_source_cap`` keyed on
    registered_domain instead of source). One aggregate, keys are
    domain-cardinality not corpus-cardinality."""
    d = with_synthetic_url(read_table(spark, sf_dir, "documents"))
    return (
        d.select(
            registered_domain(F.col("url")).alias("registered_domain"),
            canonical_url(F.col("url")).alias("cu"),
        )
        .groupBy("registered_domain")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.countDistinct("cu").alias("n_pages"),
        )
    )


_HOST_STATS_SQL = f"""
WITH u AS ({_URL_DERIVE_SQL}),
c AS (SELECT doc_id, {_CANON_SQL_EXPRS} FROM u),
r AS (
  SELECT c_host || c_path ||
         CASE WHEN c_query = '' THEN '' ELSE '?' || c_query END AS cu,
         regexp_replace(c_host, ':[0-9]+$', '') AS h,
         string_split(regexp_replace(c_host, ':[0-9]+$', ''), '.') AS t
  FROM c
)
SELECT CASE WHEN len(t) < 2 THEN h
            WHEN len(t) >= 3 AND (t[-2] || '.' || t[-1]) IN ({_SUFFIX_LIST_SQL})
              THEN t[-3] || '.' || t[-2] || '.' || t[-1]
            ELSE t[-2] || '.' || t[-1]
       END AS registered_domain,
       COUNT(*) AS n_docs, COUNT(DISTINCT cu) AS n_pages
FROM r GROUP BY 1
"""


def docs_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-DOMAIN token cap: the MassiveText/Gopher domain cap keyed on
    the registered domain instead of the ingest-time source label —
    ``sampling.cap_source_share`` composes unchanged via ``key_col``
    (the per-site cap ``docs_host_stats`` exists to feed). Same scale
    shape: one domain-cardinality totals agg broadcast back, stateless
    hash-Bernoulli keep filter, corpus never shuffles."""
    from artan_spark.plans.sampling import cap_source_share

    d = with_synthetic_url(
        read_table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    ).select(
        "doc_id",
        registered_domain(F.col("url")).alias("registered_domain"),
        "text",
    )
    kept = cap_source_share(d, key_col="registered_domain")
    return kept.groupBy("registered_domain").agg(
        F.round(F.first("rate"), 6).alias("rate"),
        F.count(F.lit(1)).alias("n_docs_kept"),
        F.sum("n_tokens").cast("long").alias("n_tokens_kept"),
    )


def _domain_cap_sql() -> str:
    from artan_spark.plans.sampling import SOURCE_CAP_SHARE, _TWO60_SQL

    return f"""
WITH u AS ({_URL_DERIVE_SQL}),
c AS (SELECT doc_id, {_CANON_SQL_EXPRS} FROM u),
dom AS (
  SELECT doc_id,
         CASE WHEN len(t) < 2 THEN h
              WHEN len(t) >= 3 AND (t[-2] || '.' || t[-1]) IN ({_SUFFIX_LIST_SQL})
                THEN t[-3] || '.' || t[-2] || '.' || t[-1]
              ELSE t[-2] || '.' || t[-1]
         END AS registered_domain
  FROM (SELECT doc_id, regexp_replace(c_host, ':[0-9]+$', '') AS h,
               string_split(regexp_replace(c_host, ':[0-9]+$', ''), '.') AS t
        FROM c)
),
d AS (
  SELECT dm.doc_id, dm.registered_domain,
         len(regexp_split_to_array(trim(docs.text), '\\s+')) AS n_tokens
  FROM dom dm JOIN documents docs ON dm.doc_id = docs.doc_id
),
t AS (SELECT registered_domain, CAST(SUM(n_tokens) AS BIGINT) AS src_tokens
      FROM d GROUP BY registered_domain),
r AS (
  SELECT registered_domain,
         LEAST(1.0, {SOURCE_CAP_SHARE} * (SUM(src_tokens) OVER ())
                      / CAST(src_tokens AS DOUBLE)) AS rate
  FROM t
)
SELECT d.registered_domain,
       ROUND(MIN(r.rate), 6) AS rate,
       COUNT(*) AS n_docs_kept,
       CAST(SUM(d.n_tokens) AS BIGINT) AS n_tokens_kept
FROM d JOIN r ON d.registered_domain = r.registered_domain
WHERE (CAST(CAST('0x' || substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 15) AS BIGINT) AS DOUBLE) + 0.5)
        / {_TWO60_SQL} < r.rate
GROUP BY d.registered_domain
"""


# r11 window rotation: URL-level dedup joined the driver window
QUERIES = {"docs_url_dedup": docs_url_dedup}
ORACLES = {"docs_url_dedup": _URL_DEDUP_SQL}
PYTEST_ORACLES = {
    "docs_url_canonical": (docs_url_canonical, _URL_CANONICAL_SQL),
    "docs_host_stats": (docs_host_stats, _HOST_STATS_SQL),
    "docs_domain_cap": (docs_domain_cap, _domain_cap_sql()),
}
