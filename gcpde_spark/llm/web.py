"""Web-corpus URL operators: RFC-3986 canonicalization and URL-keyed
dedup (100 TB extension layer — no reference counterpart; the reference
stops at file/table verbs, but every web-scale training-data pipeline
dedupes by canonical URL before it ever looks at text).

Scale design:

- :func:`canonical_url` is ONE Column expression — scheme/host folding,
  default-port and fragment removal, dot-segment resolution, tracking-
  parameter stripping and query-key sorting all compose from built-in
  Catalyst expressions (``try_parse_url``, ``regexp_replace``,
  ``aggregate``/``filter``/``array_sort``), so canonicalization rides
  the scan projection: no UDF, no shuffle, no Python.
- The higher-order functions here run interpreted (see
  ``llm/dedup.py``'s shingle note), but their inputs are per-URL arrays
  of a few path segments / query pairs — bytes per row, not documents —
  so the interpreted path is O(segments) with tiny constants, unlike
  the document-shingle case that note banishes.
- :func:`dedup_by_url` is the same one-shuffle hash-groupBy survivor
  pattern as ``exact_dedup`` (uniform md5 of the canonical URL as the
  window key), with NULL/invalid URLs kept as non-duplicates under
  private per-id keys.

Honesty note on equivalence strength: scheme/host case folding,
default-port removal and dot-segment resolution are RFC 3986 §6
semantics-preserving; the OTHER folds (www strip, duplicate/trailing
slash collapse, tracking-param strip, query sort) are CRAWL-canonical
conventions — servers that genuinely distinguish ``/x`` from ``/x/``
(or serve different content per ``utm_source``) would have those pages
merged. That trade is standard for web dedup (re-crawls and alias URLs
vastly outnumber such servers) but it is a policy, not an identity
proof — pair :func:`dedup_by_url` with content-level dedup
(``exact_dedup`` / MinHash) when the corpus can't tolerate it.

Out of scope (documented, not silently wrong): percent-encoding
normalization (%7E → ~ and hex-case folding need a char-level decoder;
Catalyst has no regex-replace-with-callback) and IDN/punycode host
folding.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from gcpde_spark.llm.text import normalize_text

# Query parameters that carry tracking/session state, never content
# identity. Matched as a full key (case-insensitive) or the utm_ prefix.
# Deliberately NOT here: bare "ref" — on many sites (git forges, docs
# hosts) it selects a branch/section, i.e. content identity; stripping
# it would alias distinct pages. Callers with referrer-tracking corpora
# can extend the set per crawl.
TRACKING_PARAMS = (
    "gclid",
    "fbclid",
    "msclkid",
    "igshid",
    "mc_eid",
    "mc_cid",
    "ref_src",
    "spm",
    "sessionid",
    "phpsessid",
    "jsessionid",
)

_TRACKER_RE = "(?i)^(utm_[^=]*|" + "|".join(TRACKING_PARAMS) + ")(=.*)?$"


def _resolved_path(path: Column) -> Column:
    """RFC 3986 §5.2.4 dot-segment removal + duplicate/trailing-slash
    collapse, as a fold over the split segments: ``.`` and empty
    segments drop, ``..`` pops the accumulator. Always returns a
    leading-slash path ("/" for empty)."""
    segs = F.split(path, "/")
    folded = F.aggregate(
        segs,
        F.array().cast("array<string>"),
        lambda acc, s: (
            F.when((s == "") | (s == "."), acc)
            .when(s == "..", F.slice(acc, 1, F.greatest(F.size(acc) - 1, F.lit(0))))
            .otherwise(F.concat(acc, F.array(s)))
        ),
    )
    return F.concat(F.lit("/"), F.array_join(folded, "/"))


def _canonical_query(query: Column) -> Column:
    """Strip tracking parameters, drop empty pairs, sort the survivors
    (param order is non-semantic per RFC 3986 — sorting makes the form
    canonical). NULL when nothing survives."""
    pairs = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(_TRACKER_RE),
    )
    out = F.array_join(F.array_sort(pairs), "&")
    return F.when((query.isNotNull()) & (out != ""), out)


def canonical_url(col: str | Column, strip_www: bool = True) -> Column:
    """Canonical form of a URL column — the dedup key for web corpora.

    Applied normalizations (all RFC 3986 §6 semantics-preserving):

    - scheme and host lowercased; leading ``www.`` stripped when
      ``strip_www`` (site-identity fold — on by default because web
      dedup wants it; pass False for strict RFC equivalence only)
    - default ports dropped (``http:80``, ``https:443``); others kept
    - path dot-segments resolved, duplicate and trailing slashes
      collapsed (``/a/./b/../c/`` → ``/a/c``)
    - fragment removed (client-side only, never reaches the server)
    - tracking query parameters removed (``utm_*`` and
      :data:`TRACKING_PARAMS`), the rest sorted
    - userinfo dropped (credentials are not content identity)

    NULL for NULL/unparseable input or a URL with no host
    (``try_parse_url`` — never raises, even under ANSI mode).
    """
    url = F.trim(F.col(col) if isinstance(col, str) else col)
    scheme = F.lower(F.try_parse_url(url, F.lit("PROTOCOL")))
    host = F.lower(F.try_parse_url(url, F.lit("HOST")))
    if strip_www:
        host = F.regexp_replace(host, r"^www\.", "")
    authority = F.try_parse_url(url, F.lit("AUTHORITY"))
    port = F.regexp_extract(authority, r":(\d+)$", 1)
    keep_port = (
        (port != "")
        & ~((scheme == F.lit("http")) & (port == "80"))
        & ~((scheme == F.lit("https")) & (port == "443"))
    )
    path = _resolved_path(F.coalesce(F.try_parse_url(url, F.lit("PATH")), F.lit("")))
    query = _canonical_query(F.try_parse_url(url, F.lit("QUERY")))
    rebuilt = F.concat(
        scheme,
        F.lit("://"),
        host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        path,
        F.when(query.isNotNull(), F.concat(F.lit("?"), query)).otherwise(F.lit("")),
    )
    return F.when(
        scheme.isNotNull() & host.isNotNull() & (host != ""), rebuilt
    )


def with_canonical_url(
    df: DataFrame, url_col: str = "url", out_col: str = "canonical_url"
) -> DataFrame:
    """Projection form: add ``out_col`` = :func:`canonical_url`."""
    return df.withColumn(out_col, canonical_url(url_col))


def dedup_by_url(
    df: DataFrame,
    id_col: str = "doc_id",
    url_col: str = "url",
    keep: str = "min_id",
    text_col: str = "text",
) -> DataFrame:
    """Keep one row per canonical URL (the crawl-dedup first pass —
    removes re-crawls and tracking-parameter aliases before any text
    ever shuffles).

    ``keep``: ``"min_id"`` (stable) or ``"longest"`` (longest text wins
    — re-crawls often truncate; ties → smallest id).

    Same scale shape as ``exact_dedup``: one shuffle on the md5 of the
    canonical URL (uniform — hot sites don't skew the window), NULL or
    unparseable URLs survive individually under private per-id keys.
    """
    orders = {
        "min_id": [F.col(id_col).asc()],
        "longest": [F.length(normalize_text(text_col)).desc(), F.col(id_col).asc()],
    }
    if keep not in orders:
        raise ValueError(f"keep must be one of {sorted(orders)}, got {keep!r}")
    key = F.coalesce(
        F.md5(canonical_url(url_col)),
        F.concat(F.lit("n:"), F.col(id_col).cast("string")),
    )
    w = Window.partitionBy("_uk").orderBy(*orders[keep])
    return (
        df.withColumn("_uk", key)
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_uk", "_rn")
    )
