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
