"""Deterministic synthetic web-graph corpus — the sandbox "internet".

The fetch stage joins fetch batches against this table instead of doing HTTP
(reference fetch: ``collector.Visit`` search/crawlers/colly.go:209-215; the
30s-timeout HTTP transport config.go:67-74 is irrelevant in-sandbox).

Every attribute of page ``i`` is a pure integer-arithmetic function of ``i``
and the page count ``N`` — no RNG, no wall clock — so three independent
implementations can generate it bit-identically:

1. :func:`corpus_df` — Spark Column expressions only (JVM-side, codegen'd;
   generates millions of pages with zero Python in the loop → used at bench
   scale),
2. :func:`page` — pure Python (drives the sequential reference-semantics
   oracle in tests/oracle/),
3. :func:`bfs_oracle_sql` — a DuckDB recursive-CTE that re-derives the link
   graph arithmetically (the driver's correctness gate).

Graph design: out-degree 2..4 (supercritical BFS), one hot host holding 30%
of pages (exercises host-salted skew handling), 404/500 pages (fetched but
not expanded), and four messy link encodings (relative path, fragment,
explicit default port, uppercase scheme/host) that the canonicalizer must
normalize back to the canonical URL.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

N_HOSTS = 10
MAX_DEG = 4

VOCAB = [
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf", "hotel",
    "india", "juliet", "kilo", "lima", "mike", "november", "oscar", "papa",
    "quebec", "romeo", "sierra", "tango", "uniform", "victor", "whiskey",
    "xray", "yankee", "zulu", "amber", "basalt", "cobalt", "dune", "ember",
    "fjord", "garnet", "harbor", "isle", "jade", "krill", "lagoon", "mesa",
    "nectar", "onyx", "prism", "quartz", "reef", "slate", "topaz", "umbra",
    "vertex", "willow", "xenon", "yarrow", "zephyr", "atlas", "beacon",
    "cinder", "drift", "evergreen", "flint", "grove", "heather", "ivory",
    "juniper", "kestrel", "lantern",
]


# ---------------------------------------------------------------- pure python

def host_id(i: int) -> int:
    return 0 if i % 10 < 3 else 1 + (i % (N_HOSTS - 1))


def host(i: int) -> str:
    return f"h{host_id(i)}.test"


def url(i: int) -> str:
    return f"https://{host(i)}/p/{i}"


def degree(i: int) -> int:
    return 2 + (i % 3)


def status(i: int) -> int:
    if i % 97 == 33:
        return 404
    if i % 131 == 57:
        return 500
    return 200


def link_target(i: int, j: int, n: int) -> int:
    return (i * 7 + j * 13 + 1) % n


def latency_ms(i: int) -> int:
    return 10 + (i % 50)


def word(i: int, k: int) -> str:
    return VOCAB[(i * 31 + k * 7) % len(VOCAB)]


def title(i: int) -> str:
    return f"Page {i} {word(i, 0)} {word(i, 1)} {word(i, 2)}"


def body(i: int) -> str:
    return " ".join(word(i, 3 + k) for k in range(12))


def media_count(i: int) -> int:
    return i % 3


def media_url(i: int, k: int) -> str:
    return f"https://{host(i)}/img/{i}_{k}.png"


def link_href(i: int, j: int, n: int) -> str:
    """The raw (possibly messy) href attribute as it appears in the HTML."""
    t = link_target(i, j, n)
    same = host_id(t) == host_id(i)
    if same and (i + j) % 3 == 0:
        return f"/p/{t}"  # root-relative
    if (i + j) % 5 == 0:
        return url(t) + "#frag"  # fragment to strip
    if (i + j) % 7 == 0:
        return f"https://{host(t)}:443/p/{t}"  # explicit default port
    if (i + j) % 11 == 0:
        return f"HTTPS://{host(t).upper()}/p/{t}"  # case-normalize
    return url(t)


def out_links(i: int, n: int) -> list[str]:
    """Ground-truth canonical out-links in document order."""
    return [url(link_target(i, j, n)) for j in range(degree(i))]


def html(i: int, n: int) -> str:
    links = "".join(
        f'<a href="{link_href(i, j, n)}">link {link_target(i, j, n)}</a>'
        for j in range(degree(i))
    )
    imgs = "".join(
        f'<img src="{media_url(i, k)}"/>' for k in range(media_count(i))
    )
    return (
        f"<html><head><title>{title(i)}</title></head>"
        f"<body><p>{body(i)}</p>{links}{imgs}</body></html>"
    )


def expected_spans(i: int, n: int) -> list[tuple[str, str, str, int]]:
    """Ground-truth span sequence (kind, text, media_ref, offset) for page i.

    This is the per-row invariant vs the reference (BASELINE.json:input_hint):
    title span, one text span, link spans (anchor text + canonical target) in
    document order, then media spans.
    """
    spans = [("title", title(i), "", 0), ("text", body(i), "", 1)]
    off = 2
    for j in range(degree(i)):
        t = link_target(i, j, n)
        spans.append(("link", f"link {t}", url(t), off))
        off += 1
    for k in range(media_count(i)):
        spans.append(("media", "", media_url(i, k), off))
        off += 1
    return spans


def page(i: int, n: int) -> dict:
    return {
        "url": url(i),
        "host": host(i),
        "status": status(i),
        "html": html(i, n),
        "out_links": out_links(i, n),
        "fetch_latency_ms": latency_ms(i),
    }


# ---------------------------------------------------------------- spark

def _c_host_id(i: Column) -> Column:
    return F.when(i % 10 < 3, F.lit(0)).otherwise(1 + (i % (N_HOSTS - 1)))


def _c_host(i: Column) -> Column:
    return F.concat(F.lit("h"), _c_host_id(i).cast("string"), F.lit(".test"))


def _c_url(i: Column) -> Column:
    return F.concat(F.lit("https://"), _c_host(i), F.lit("/p/"), i.cast("string"))


def _c_word(i: Column, k: Column) -> Column:
    vocab = F.array(*[F.lit(w) for w in VOCAB])
    return F.element_at(vocab, ((i * 31 + k * 7) % len(VOCAB) + 1).cast("int"))


def corpus_df(spark: SparkSession, n: int, partitions: int | None = None) -> DataFrame:
    """The page-corpus table, generated entirely with Column expressions.

    No Python executes per row: `spark.range` + codegen'd string/array ops.
    At 100 TB scale this would be a real web-archive scan; the generator
    stands in with identical schema and unbounded parallelism.
    """
    if partitions is None:
        partitions = max(spark.sparkContext.defaultParallelism, 8)
    i = F.col("i")
    df = spark.range(0, n, 1, partitions).select(F.col("id").alias("i"))

    deg = 2 + (i % 3)
    js = F.sequence(F.lit(0), (deg - 1).cast("int"))

    def tgt(j: Column) -> Column:
        return (i * 7 + j * 13 + 1) % n

    def canon_url_of(t: Column) -> Column:
        return _c_url(t)

    def href(j: Column) -> Column:
        t = tgt(j)
        same = _c_host_id(t) == _c_host_id(i)
        rel = F.concat(F.lit("/p/"), t.cast("string"))
        frag = F.concat(canon_url_of(t), F.lit("#frag"))
        port = F.concat(
            F.lit("https://"), _c_host(t), F.lit(":443/p/"), t.cast("string")
        )
        upper = F.concat(
            F.lit("HTTPS://"), F.upper(_c_host(t)), F.lit("/p/"), t.cast("string")
        )
        return (
            F.when(same & ((i + j) % 3 == 0), rel)
            .when((i + j) % 5 == 0, frag)
            .when((i + j) % 7 == 0, port)
            .when((i + j) % 11 == 0, upper)
            .otherwise(canon_url_of(t))
        )

    title_c = F.concat(
        F.lit("Page "), i.cast("string"),
        F.lit(" "), _c_word(i, F.lit(0)),
        F.lit(" "), _c_word(i, F.lit(1)),
        F.lit(" "), _c_word(i, F.lit(2)),
    )
    body_c = F.array_join(
        F.transform(F.sequence(F.lit(3), F.lit(14)), lambda k: _c_word(i, k)),
        " ",
    )
    links_html = F.array_join(
        F.transform(
            js,
            lambda j: F.concat(
                F.lit('<a href="'), href(j), F.lit('">link '),
                tgt(j).cast("string"), F.lit("</a>"),
            ),
        ),
        "",
    )
    n_media = (i % 3).cast("int")
    imgs_html = F.when(n_media == 0, F.lit("")).otherwise(
        F.array_join(
            F.transform(
                F.sequence(F.lit(0), n_media - 1),
                lambda k: F.concat(
                    F.lit('<img src="https://'), _c_host(i), F.lit("/img/"),
                    i.cast("string"), F.lit("_"), k.cast("string"),
                    F.lit('.png"/>'),
                ),
            ),
            "",
        )
    )
    html_c = F.concat(
        F.lit("<html><head><title>"), title_c, F.lit("</title></head><body><p>"),
        body_c, F.lit("</p>"), links_html, imgs_html, F.lit("</body></html>"),
    )
    status_c = (
        F.when(i % 97 == 33, F.lit(404))
        .when(i % 131 == 57, F.lit(500))
        .otherwise(F.lit(200))
    ).cast("int")

    return df.select(
        _c_url(i).alias("url"),
        _c_host(i).alias("host"),
        status_c.alias("status"),
        html_c.alias("html"),
        F.transform(js, lambda j: canon_url_of(tgt(j))).alias("out_links"),
        (10 + (i % 50)).cast("int").alias("fetch_latency_ms"),
    )


# ---------------------------------------------------------------- sql oracle

def bfs_oracle_sql(n_expr: str, seed: int = 0, max_depth: int = 6) -> str:
    """DuckDB SQL computing the expected (url, depth) seen-set of a BFS crawl
    from page ``seed`` with the given depth cap over this corpus.

    Mirrors the crawl semantics exactly: the seed is seen at depth 0; a
    fetched page expands only if its status is 200 (reference: OnHTML fires
    only on success, colly.go:64-71,177); candidate links respect the depth
    cap (colly.MaxDepth, config.go:49); dedup keeps the first (minimum)
    depth (colly visited-set, colly.go:92-97).

    ``n_expr`` is a SQL expression for the page count N (e.g. a literal or
    ``(SELECT count(*)*10 FROM documents)``).
    """
    return f"""
WITH RECURSIVE params AS (SELECT {n_expr} AS n),
reach(i, depth) AS (
  SELECT {seed}::BIGINT AS i, 0 AS depth
  UNION
  SELECT (r.i*7 + j.j*13 + 1) % p.n AS i, r.depth + 1 AS depth
  FROM reach r, range({MAX_DEG}) j(j), params p
  WHERE j.j < 2 + (r.i % 3)
    AND r.depth < {max_depth}
    AND r.i % 97 <> 33 AND r.i % 131 <> 57
),
seen AS (SELECT i, min(depth) AS depth FROM reach GROUP BY i)
SELECT
  'https://h' || (CASE WHEN i % 10 < 3 THEN 0 ELSE 1 + (i % {N_HOSTS - 1}) END)
    || '.test/p/' || i AS url,
  CAST(depth AS INT) AS depth
FROM seen
ORDER BY url
"""
