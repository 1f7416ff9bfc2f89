"""Corpus generator parity: the Spark Column-only generator, the pure-Python
twin, and the parse UDF must agree bit-for-bit (they are three independent
implementations of the same arithmetic)."""

from goprowl_spark import corpus
from goprowl_spark.parse import parse_spans

N = 120


def test_spark_corpus_matches_python(spark):
    rows = {r["url"]: r for r in corpus.corpus_df(spark, N).collect()}
    assert len(rows) == N
    for i in range(N):
        p = corpus.page(i, N)
        r = rows[p["url"]]
        assert r["host"] == p["host"]
        assert r["status"] == p["status"]
        assert r["html"] == p["html"]
        assert list(r["out_links"]) == p["out_links"]
        assert r["fetch_latency_ms"] == p["fetch_latency_ms"]


def test_parser_reproduces_ground_truth_spans():
    for i in range(N):
        got = [
            (s["kind"], s["text"], s["media_ref"], s["offset"])
            for s in parse_spans(corpus.html(i, N), corpus.url(i))
        ]
        assert got == corpus.expected_spans(i, N), f"page {i}"


def test_corpus_has_hot_host_skew():
    hosts = [corpus.host(i) for i in range(1000)]
    assert hosts.count("h0.test") == 300  # 30% on the hot host


def test_corpus_has_error_pages():
    statuses = {corpus.status(i) for i in range(1000)}
    assert statuses == {200, 404, 500}


def test_fast_parser_equals_reference_parser():
    """The regex fast path must be span-for-span identical to the stdlib
    HTMLParser path — on corpus pages, adversarial markup, and a fuzz soup
    of hostile fragments (the fast path falls back on anything it could
    mis-lex)."""
    import random

    from goprowl_spark import corpus
    from goprowl_spark.parse import parse_spans, parse_spans_reference

    N = 10_000
    base = "https://h0.test/p/1"
    for i in range(2000):
        h = corpus.html(i, N)
        assert parse_spans(h, corpus.url(i)) == parse_spans_reference(h, corpus.url(i)), i
    cases = [
        "<html><!-- c --><p>x</p></html>",
        "<script>if (a<b) {}</script><p>y</p>",
        '<p>a &amp; b</p><a href="/x?a=1&amp;b=2">l</a>',
        "<P>UPPER</P><A HREF=/y>z</A>",
        '<img src=/i.png/><img src="/j.png" />',
        '<a href="/q>r">t</a>',
        "<p>unclosed",
        "<a>no href</a>",
        '<?xml version="1.0"?><p>pi</p>',
        "<title>t1</title><title>t2</title>",
        "<p>a<p>b</p>c</p>",
        "<a href='s p'>q</a>",
        "<br/><img src=x />",
        "<a href=x / >y</a>",
        '<img src="a&lt;b.png">',
    ]
    for c in cases:
        assert parse_spans(c, base) == parse_spans_reference(c, base), c
    rng = random.Random(3)
    frag = [
        "<p>", "</p>", '<a href="/x">', "</a>", "<img src=/m.png>", "text",
        "&amp;", " ", "<title>", "</title>", "<b>", "</b>", "<p ",
        'class="z">', "&#65;", "<", ">", "/", '"',
    ]
    for _ in range(3000):
        s = "".join(rng.choice(frag) for _ in range(rng.randrange(1, 25)))
        assert parse_spans(s, base) == parse_spans_reference(s, base), repr(s)
