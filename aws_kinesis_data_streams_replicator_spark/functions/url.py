"""URL canonicalization — the dedup key for web-scraped corpora.

A crawl sees the same resource under many spellings: scheme/host case,
explicit default ports, trailing slashes, tracking parameters
(``utm_*``), query-parameter order, and fragments.  Canonicalizing
before dedup collapses those variants to one key; skipping it both
under-dedups (same page kept N times) and breaks URL-keyed joins.

Rules applied (the common subset of the SURT / canonical-link
conventions):

* scheme and host lowercased;
* explicit default port stripped (``:80`` for http, ``:443`` for
  https) — a NON-default port is kept, including ``https://…:80``;
* one trailing slash stripped from a non-root path; empty path becomes
  ``/``;
* ``utm_*`` tracking parameters dropped, remaining parameters sorted
  bytewise and re-joined; an emptied query string disappears entirely;
* fragment dropped.

Everything is built-in expressions around ``try_parse_url`` (Spark's
Hive-compatible URL splitter) — whole-stage codegen, no Python
boundary, safe to run per-record over a 100 TB crawl table.

Scope: host:port is split on the LAST colon of the authority, which is
correct for DNS names and IPv4 but would mis-split a bracketed IPv6
literal (``[::1]:8080``) or a userinfo-bearing authority — both are
vanishingly rare in crawl corpora and should be routed to a quarantine
bucket upstream rather than silently canonicalized.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def canonical_url(url: Column) -> Column:
    """Canonical form of ``url`` per the module rules.  NULL for strings
    ``try_parse_url`` cannot split (no scheme)."""
    proto = F.lower(F.try_parse_url(url, F.lit("PROTOCOL")))
    auth = F.try_parse_url(url, F.lit("AUTHORITY"))
    host = F.lower(F.substring_index(auth, ":", 1))
    port = F.when(auth.contains(":"), F.substring_index(auth, ":", -1))
    is_default = ((proto == F.lit("http")) & (port == F.lit("80"))) | (
        (proto == F.lit("https")) & (port == F.lit("443"))
    )
    port_part = F.when(
        port.isNotNull() & ~is_default, F.concat(F.lit(":"), port)
    ).otherwise(F.lit(""))
    raw_path = F.try_parse_url(url, F.lit("PATH"))
    path = F.when(
        raw_path.isNull() | (raw_path == F.lit("")), F.lit("/")
    ).otherwise(raw_path)
    path = F.when(
        (F.length(path) > 1) & path.endswith("/"),
        F.regexp_replace(path, "/$", ""),
    ).otherwise(path)
    qs = F.try_parse_url(url, F.lit("QUERY"))
    kept = F.array_sort(
        F.filter(
            F.split(qs, "&"),
            lambda p: (~p.startswith("utm_")) & (p != F.lit("")),
        )
    )
    q_part = F.when(
        qs.isNotNull() & (F.size(kept) > 0),
        F.concat(F.lit("?"), F.array_join(kept, "&")),
    ).otherwise(F.lit(""))
    return F.concat(proto, F.lit("://"), host, port_part, path, q_part)


def url_dedup_groups(df, url_col: str = "raw_url", id_col: str = "doc_id"):
    """Group rows by canonical URL: (canonical_url, n_urls,
    n_raw_variants, first_id).  ONE hash aggregation on the canonical
    key — per-record canonicalization is map-side, the only shuffle is
    the groupBy, and a canonical key shared by millions of crawl
    records stays one group (aggregation, never a pairwise join)."""
    return (
        df.select(
            F.col(id_col),
            F.col(url_col),
            canonical_url(F.col(url_col)).alias("canonical_url"),
        )
        .groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_urls"),
            F.countDistinct(url_col).cast("long").alias("n_raw_variants"),
            F.min(id_col).cast("long").alias("first_id"),
        )
    )
