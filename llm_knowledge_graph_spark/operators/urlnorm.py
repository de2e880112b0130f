"""URL canonicalization — the crawl pipeline's cheapest dedup pass.

Not in the reference (it ingests PDFs); this is the standard first
stage of a Common-Crawl-style corpus: collapse URL aliases BEFORE any
content hashing, because the same page is typically fetched under many
spellings (scheme/host case, default ports, fragments, tracking
params, trailing slashes, unsorted query strings). Canonicalization
rules follow RFC 3986 §6 normalization plus the de-facto tracker-strip
list (utm_*, gclid, fbclid, msclkid, ref).

The whole transform is ONE projection of built-in string/array
expressions — no UDF, fully whole-stage-codegen, and engine-portable:
every regexp stays in the Java∩RE2 subset so a DuckDB oracle can run
the same patterns verbatim (the repo's legal_ner/pii discipline).

Contract (applied in order):
  1. scheme and host lowercased; userinfo (user:pass@) dropped;
  2. default ports stripped (:80 for http, :443 for https);
  3. fragment (#...) dropped;
  4. query: split on '&', drop empty params and trackers
     (utm_*, gclid, fbclid, msclkid, ref), SORT the rest
     lexicographically, rejoin — param ORDER never distinguishes
     two URLs;
  5. path: strip ONE trailing slash (but keep a bare-root '/');
     empty path becomes '/'.

Scale notes (100 TB): a pure projection — no shuffle, no Python; the
follow-up `url_dup_stats` is one map-side-combinable hash aggregate on
the canonical string. At crawl scale the canonical url ALSO becomes
the dedup/bucketing key for everything downstream, so this projection
runs once per fetch record and is fused by Catalyst into the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# de-facto tracking parameters (keys compared after lowercasing the
# key only — values keep their case)
TRACKER_RE = "^(utm_[a-z0-9_]*|gclid|fbclid|msclkid|ref)="


def canonical_url(url: Column) -> Column:
    """Canonical form of an absolute http(s) URL, as one column expr."""
    # 1. split off the fragment first — everything after '#' is gone
    nofrag = F.regexp_replace(url, "#.*$", "")
    # scheme://authority[/path[?query]]
    scheme = F.lower(F.regexp_extract(nofrag, "^([A-Za-z][A-Za-z0-9+.-]*):", 1))
    rest = F.regexp_replace(nofrag, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    authority = F.regexp_extract(rest, "^([^/?]*)", 1)
    path_q = F.substring(rest, F.length(authority) + 1, 1 << 30)
    # 2. authority: drop userinfo, lowercase host, strip default port
    host_port = F.regexp_replace(authority, "^[^@]*@", "")
    host = F.lower(F.regexp_extract(host_port, "^([^:]*)", 1))
    port = F.regexp_extract(host_port, ":([0-9]+)$", 1)
    keep_port = (
        (port != "")
        & ~((scheme == F.lit("http")) & (port == F.lit("80")))
        & ~((scheme == F.lit("https")) & (port == F.lit("443")))
    )
    auth_c = F.when(keep_port, F.concat(host, F.lit(":"), port)).otherwise(host)
    # 3./4. split path vs query
    path = F.regexp_extract(path_q, "^([^?]*)", 1)
    query = F.when(path_q.contains("?"),
                   F.regexp_replace(path_q, "^[^?]*\\?", "")).otherwise(F.lit(""))
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~F.lower(p).rlike(TRACKER_RE),
    )
    query_c = F.concat_ws("&", F.array_sort(params))
    # 5. path: empty → '/', else strip one trailing slash unless root
    path_c = F.when(path == "", F.lit("/")).otherwise(
        F.when((F.length(path) > 1) & path.endswith("/"),
               F.substring(path, 1, F.length(path) - 1)).otherwise(path))
    return F.concat(
        scheme, F.lit("://"), auth_c, path_c,
        F.when(query_c != "", F.concat(F.lit("?"), query_c)).otherwise(F.lit("")),
    )


def with_canonical_url(df: DataFrame, url_col: str = "url",
                       out_col: str = "canonical_url") -> DataFrame:
    """Adds ``out_col`` with the canonical form of ``url_col``."""
    return df.withColumn(out_col, canonical_url(F.col(url_col)))


def url_dup_stats(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Per-canonical-URL alias mass: (canonical_url, n_fetches,
    n_distinct_spellings) for every canonical url fetched under more
    than one raw spelling — the crawl-frontier dedup report. One
    map-side-combinable aggregate on the canonical projection."""
    return (with_canonical_url(df, url_col)
            .groupBy("canonical_url")
            .agg(F.count("*").cast("long").alias("n_fetches"),
                 F.countDistinct(url_col).cast("long")
                 .alias("n_distinct_spellings"))
            .filter(F.col("n_distinct_spellings") > 1))


def canonical_url_sql(urls_cte: str, url_expr: str = "url",
                      keep_cols: str = "") -> str:
    """ANSI-SQL (DuckDB) twin of :func:`canonical_url`, step-for-step:
    given a CTE body ``urls_cte`` yielding ``url_expr`` (plus
    ``keep_cols``, comma-prefixed), returns a CTE chain whose final
    relation ``canon`` carries those columns plus ``canonical_url``.
    Each Spark regexp/array expression maps 1:1 (regexp_extract group
    semantics, '' on no-match, binary-collation list_sort) so the two
    engines produce byte-identical canonical forms — value-hash-checked
    by the url_dup_stats driver query."""
    return f"""
    urls AS ({urls_cte}),
    s1 AS (SELECT {url_expr} AS url{keep_cols},
                  regexp_replace({url_expr}, '#.*$', '') AS nofrag
           FROM urls),
    s2 AS (SELECT *,
                  lower(regexp_extract(nofrag,
                        '^([A-Za-z][A-Za-z0-9+.-]*):', 1)) AS scheme,
                  regexp_replace(nofrag,
                        '^[A-Za-z][A-Za-z0-9+.-]*://', '') AS rest
           FROM s1),
    s3 AS (SELECT *, regexp_extract(rest, '^([^/?]*)', 1) AS authority
           FROM s2),
    s4 AS (SELECT *,
                  substr(rest, length(authority) + 1) AS path_q,
                  regexp_replace(authority, '^[^@]*@', '') AS host_port
           FROM s3),
    s5 AS (SELECT *,
                  lower(regexp_extract(host_port, '^([^:]*)', 1)) AS host,
                  regexp_extract(host_port, ':([0-9]+)$', 1) AS port
           FROM s4),
    s6 AS (SELECT *,
                  CASE WHEN port <> ''
                        AND NOT (scheme = 'http' AND port = '80')
                        AND NOT (scheme = 'https' AND port = '443')
                       THEN host || ':' || port ELSE host END AS auth_c,
                  regexp_extract(path_q, '^([^?]*)', 1) AS path,
                  CASE WHEN strpos(path_q, '?') > 0
                       THEN regexp_replace(path_q, '^[^?]*\\?', '')
                       ELSE '' END AS query
           FROM s5),
    s7 AS (SELECT *,
                  array_to_string(list_sort(list_filter(
                      string_split(query, '&'),
                      p -> p <> '' AND NOT regexp_matches(lower(p),
                          '^(utm_[a-z0-9_]*|gclid|fbclid|msclkid|ref)='))),
                      '&') AS query_c,
                  CASE WHEN path = '' THEN '/'
                       WHEN length(path) > 1 AND path LIKE '%/'
                       THEN substr(path, 1, length(path) - 1)
                       ELSE path END AS path_c
           FROM s6),
    canon AS (SELECT url{keep_cols},
                     scheme || '://' || auth_c || path_c
                     || CASE WHEN query_c <> '' THEN '?' || query_c
                             ELSE '' END AS canonical_url
              FROM s7)
    """


def domain_cap_sample(df: DataFrame, domain_col: str, k: int,
                      order_col: str) -> DataFrame:
    """Per-domain quota (C4/RefinedWeb-style host caps): keep at most
    ``k`` rows per domain, selected by md5-hex rank of ``order_col``
    (a deterministic crawl-order-agnostic sample — a doc's fate depends
    only on its own id and its rank among siblings, not on partition
    layout). One window per domain partition; domains are the natural
    shuffle key and the md5 rank de-correlates the kept set from
    crawl/id order, so hot hosts cost one skewed partition at worst —
    the same salting escape hatch as any hot-key groupBy applies."""
    from pyspark.sql import Window
    w = (Window.partitionBy(domain_col)
         .orderBy(F.md5(F.col(order_col).cast("string")), order_col))
    return (df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= k).drop("__rn"))
