"""URL canonicalization — Arrow-vectorized pandas UDF.

Reference behavior being rebuilt: colly's ``e.Request.AbsoluteURL(link)``
(search/crawlers/colly.go:86) + ``url.Parse`` validity check
(colly.go:164-171) + host extraction (colly.go:174). The reference's
TODO.md:44 marks URL canonicalization done inside colly; we make the rules
explicit: resolve relative hrefs against the page URL, lowercase
scheme/host, strip fragments, strip default ports, normalize empty paths,
reject non-http(s) and unparseable URLs (→ null, filtered upstream).

Vectorized: one Python batch per Arrow chunk (pandas UDF), never per-row
Spark UDFs (BASELINE.json:input_hint hard requirement).
"""

from __future__ import annotations

from urllib.parse import urljoin, urlsplit, urlunsplit

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

_DEFAULT_PORTS = {"http": 80, "https": 443}


def canonicalize(href: str | None, base: str | None = None) -> str | None:
    """Canonical absolute form of ``href`` resolved against ``base``.

    Returns None for unparseable / non-http(s) URLs (reference: invalid-URL
    error path colly.go:164-171 → the row is dropped by a notNull filter).
    """
    if href is None or href == "":
        return None
    try:
        raw = urljoin(base, href) if base else href
        parts = urlsplit(raw)
    except ValueError:
        return None
    scheme = parts.scheme.lower()
    if scheme not in _DEFAULT_PORTS:
        return None
    hostname = (parts.hostname or "").lower()
    if not hostname:
        return None
    try:
        port = parts.port
    except ValueError:
        return None
    netloc = hostname
    if port is not None and port != _DEFAULT_PORTS[scheme]:
        netloc = f"{hostname}:{port}"
    path = parts.path or "/"
    # collapse duplicate slashes; resolve . and .. segments
    segs: list[str] = []
    for seg in path.split("/"):
        if seg == "" or seg == ".":
            continue
        if seg == "..":
            if segs:
                segs.pop()
            continue
        segs.append(seg)
    norm_path = "/" + "/".join(segs)
    if path.endswith("/") and norm_path != "/":
        norm_path += "/"
    return urlunsplit((scheme, netloc, norm_path, parts.query, ""))


def host_of(url: str | None) -> str | None:
    if not url:
        return None
    try:
        h = urlsplit(url).hostname
    except ValueError:
        return None
    return h.lower() if h else None


@F.pandas_udf(T.StringType())
def canonicalize_udf(href: pd.Series, base: pd.Series) -> pd.Series:
    return pd.Series(
        [canonicalize(h, b) for h, b in zip(href, base)], dtype="object"
    )


@F.pandas_udf(T.StringType())
def host_udf(url: pd.Series) -> pd.Series:
    return pd.Series([host_of(u) for u in url], dtype="object")


def host_col(url: Column) -> Column:
    """JVM-side host extraction for already-canonical URLs (fast path).

    ``parse_url(url, 'HOST')`` runs in codegen; the pandas UDF is only for
    raw scraped hrefs where Go/Java URL-parsing disagreements matter.
    """
    return F.parse_url(url, F.lit("HOST"))
