"""URL parsing / normalization — shared by the engine, UDFs and simulator.

Reference semantics reproduced:
- validity = ``new URL(url)`` must parse (crawler/src/crawler.ts:191-200);
  we require scheme http/https + a hostname.
- hostname extraction used for same-origin filters
  (crawler/src/crawler.ts:527, crawler/src/pages/find-page.ts:40).
- path-safe string: ``[^a-zA-Z0-9]+`` → ``-``
  (crawler/src/util/urlToPathSafeStr.ts:1-7).

Normalization (north-rule addition — the reference's in-memory Set uses raw
href strings; a 10^10-URL frontier needs a canonical key): lowercase
scheme/host, strip fragment, strip default port, collapse duplicate
slashes in the path, drop trailing '?' — pinned here so the seen-set key
is identical everywhere.
"""

from __future__ import annotations

import re
from urllib.parse import urljoin, urlsplit, urlunsplit

_PATH_SAFE_RE = re.compile(r"[^a-zA-Z0-9]+")
_MULTISLASH_RE = re.compile(r"/{2,}")

_DEFAULT_PORTS = {"http": "80", "https": "443"}


def is_valid_url(url: str) -> bool:
    if not url:
        return False
    try:
        parts = urlsplit(url)
        # .port is lazy and raises for non-numeric/out-of-range ports
        # ('http://h:bad/', ':99999') — the reference's `new URL(...)`
        # throws on those too, so they are invalid, not a crash. One
        # such href used to kill the whole extraction task.
        parts.port
    except ValueError:
        return False
    return parts.scheme in ("http", "https") and bool(parts.hostname)


def url_host(url: str) -> str | None:
    try:
        parts = urlsplit(url)
    except ValueError:
        return None
    return parts.hostname.lower() if parts.hostname else None


def url_path(url: str) -> str:
    try:
        return urlsplit(url).path or "/"
    except ValueError:
        return "/"


def resolve(base: str, href: str) -> str | None:
    """Absolute-ize an href against its page URL (the reference reads the
    already-resolved ``a.href`` DOM property; find-page.ts:36-44)."""
    href = (href or "").strip()
    if not href or href.startswith(("javascript:", "mailto:", "#", "data:")):
        return None
    try:
        absu = urljoin(base, href)
    except ValueError:
        return None
    return absu if is_valid_url(absu) else None


def normalize_url(url: str) -> str | None:
    """Canonical frontier key. Returns None for invalid URLs."""
    if not is_valid_url(url):
        return None
    parts = urlsplit(url)
    scheme = parts.scheme.lower()
    host = (parts.hostname or "").lower()
    port = parts.port  # safe: is_valid_url above rejects bad ports
    netloc = host
    if port is not None and str(port) != _DEFAULT_PORTS.get(scheme):
        netloc = f"{host}:{port}"
    path = _MULTISLASH_RE.sub("/", parts.path) or "/"
    query = parts.query
    return urlunsplit((scheme, netloc, path, query, ""))


def url_to_path_safe_str(url: str) -> str:
    """hostname+pathname with non-alphanumerics collapsed to '-'
    (urlToPathSafeStr.ts:1-7)."""
    try:
        parts = urlsplit(url)
    except ValueError:
        return _PATH_SAFE_RE.sub("-", url)
    return _PATH_SAFE_RE.sub("-", (parts.hostname or "") + (parts.path or ""))


# ---------------------------------------------------------------------------
# Spark column-expression equivalents (JVM-side, codegen'd — used on hot
# paths so URL work never drops into Python).
# ---------------------------------------------------------------------------

def spark_host_col(col):
    """Lower-cased hostname as a Spark Column (parse_url is JVM-side)."""
    from pyspark.sql import functions as F

    return F.lower(F.parse_url(col, F.lit("HOST")))


def spark_valid_url_col(col):
    from pyspark.sql import functions as F

    return (
        col.rlike("^(?i)https?://")
        & F.parse_url(col, F.lit("HOST")).isNotNull()
        & (F.length(F.parse_url(col, F.lit("HOST"))) > 0)
    )
