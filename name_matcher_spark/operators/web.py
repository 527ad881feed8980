"""Web-crawl URL operators: canonicalization and canonical-URL dedup.

The first dedup pass over any crawl is by URL, and raw crawl URLs are
messy: case-varied schemes/hosts, default ports, trailing slashes,
tracking params, fragments. ``canonical_url`` folds all of that with
pure JVM built-ins (regexp + array functions — whole-stage codegen, no
UDF), so the canonicalize-then-group pass runs at scan speed and the
only shuffle is the final groupBy on the canonical key.

Canonicalization rules (documented contract, mirrored by the DuckDB
oracle in harness.wp_url_canon):
  * scheme and host lowercased; a leading ``www.`` dropped
  * default ports stripped (``:80`` for http, ``:443`` for https);
    non-default ports kept
  * path kept case-sensitive; trailing ``/`` runs stripped; empty
    path -> ``/``
  * query split on ``&``; empty params and ``utm_*`` tracking params
    dropped; remainder sorted lexicographically and rejoined
  * fragment dropped
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def canonical_url(col: Column) -> Column:
    u = F.trim(col)
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    rest = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.-]*://", "")
    rest = F.regexp_replace(rest, r"#.*$", "")  # drop fragment

    hostport = F.lower(F.regexp_extract(rest, r"^([^/?]+)", 1))
    host = F.regexp_replace(
        F.regexp_replace(hostport, r":[0-9]+$", ""), r"^www\.", ""
    )
    port = F.regexp_extract(hostport, r":([0-9]+)$", 1)
    default_port = ((scheme == "http") & (port == "80")) | (
        (scheme == "https") & (port == "443")
    )
    port_part = F.when(
        (port != "") & ~default_port, F.concat(F.lit(":"), port)
    ).otherwise(F.lit(""))

    raw_path = F.regexp_extract(rest, r"^[^/?]+([^?]*)", 1)
    trimmed_path = F.regexp_replace(raw_path, r"/+$", "")
    path = F.when(trimmed_path == "", F.lit("/")).otherwise(trimmed_path)

    query = F.regexp_extract(rest, r"\?(.*)$", 1)
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & (F.substring(p, 1, 4) != "utm_"),
    )
    q_sorted = F.array_join(F.sort_array(params), "&")
    q_part = F.when(
        q_sorted != "", F.concat(F.lit("?"), q_sorted)
    ).otherwise(F.lit(""))

    # No scheme -> null, not a '://'-garbage key: otherwise every
    # unparseable URL would collide into one giant bogus dedup group.
    return F.when(
        scheme == "", F.lit(None).cast("string")
    ).otherwise(F.concat(scheme, F.lit("://"), host, port_part, path, q_part))


def url_dedup_groups(
    pages: DataFrame,
    url_col: str = "url",
    min_group: int = 2,
    ts_col: str | None = None,
) -> DataFrame:
    """(canonical_url, n_urls, keep_url) for every canonical group with
    at least ``min_group`` raw URLs: the crawl's URL-level dedup pass.

    Survivor policy: lexicographic min raw member by default; with
    ``ts_col`` (e.g. ``warc_ts``) the LATEST crawl wins — the standard
    refresh-dedup across crawl snapshots — with ties broken by the max
    raw URL so the pick stays deterministic (a bare max_by would not
    be). One shuffle, on the canonical key; the argmax is a struct max,
    so it combines map-side like any other aggregate."""
    cols = [
        F.col(url_col).alias("raw_url"),
        canonical_url(F.col(url_col)).alias("canonical"),
    ]
    if ts_col is not None:
        cols.append(F.col(ts_col).alias("_ts"))
    canon = pages.select(*cols).filter(F.col("canonical").isNotNull())
    if ts_col is None:
        keep = F.min("raw_url").alias("keep_url")
    else:
        keep = F.max(F.struct(F.col("_ts"), F.col("raw_url")))["raw_url"].alias(
            "keep_url"
        )
    return (
        canon.groupBy("canonical")
        .agg(F.count("*").alias("n_urls"), keep)
        .filter(F.col("n_urls") >= min_group)
    )
