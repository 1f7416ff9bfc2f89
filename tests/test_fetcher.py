"""The per-batch fetcher (HTTP shape: work ∝ batch) must produce exactly the
same crawl as the corpus-table join path."""

from goprowl_spark import corpus
from goprowl_spark.crawl import CrawlConfig, CrawlEngine

N = 300


def test_fetcher_crawl_equals_join_crawl(spark, tmp_path):
    cfg = CrawlConfig(seeds=[corpus.url(0)], max_depth=4)
    join_eng = CrawlEngine(
        spark, corpus.corpus_df(spark, N), str(tmp_path / "join"), cfg
    )
    join_eng.run()
    fetch_eng = CrawlEngine(
        spark,
        None,
        str(tmp_path / "fetch"),
        cfg,
        fetcher=corpus.make_fetcher(N),
    )
    fetch_eng.run()
    for table in ("seen", "documents", "frontier"):
        a = sorted(getattr(join_eng, table)().toJSON().collect())
        b = sorted(getattr(fetch_eng, table)().toJSON().collect())
        assert a == b, table


def test_fetcher_invalid_urls_fail_fetch(spark):
    fetch = corpus.make_fetcher(N, fuse_parse=False)
    batch = spark.createDataFrame(
        [
            (corpus.url(5), 1),                     # valid
            ("https://h0.test/p/99999", 1),          # out of range
            ("https://other.test/nope", 1),          # unparseable index
            ("https://h5.test/p/5", 1),              # wrong host for i=5
        ],
        "url string, depth int",
    )
    rows = {r["url"]: r for r in fetch(batch).collect()}
    assert rows[corpus.url(5)]["status"] == corpus.status(5)
    assert rows["https://h0.test/p/99999"]["status"] == 0
    assert rows["https://other.test/nope"]["status"] == 0
    assert rows["https://h5.test/p/5"]["status"] == 0
    assert rows[corpus.url(5)]["html"] == corpus.html(5, N)


def test_http_fetcher_loopback(spark):
    """The real-HTTP fetcher (fetchers.make_http_fetcher) against an
    in-process loopback server serving the synthetic corpus: identical
    span output to the synthetic fetcher for the same pages, status 404
    and connection-refused → fetch-fail rows (status != 200, no spans)."""
    import re
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    from goprowl_spark import fetchers

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            m = re.fullmatch(r"/p/(\d+)", self.path)
            i = int(m.group(1)) if m else -1
            if 0 <= i < N:
                body = corpus.html(i, N).encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/html")
                self.end_headers()
                self.wfile.write(body)
            else:
                self.send_response(404)
                self.end_headers()

        def log_message(self, *a):  # keep pytest output clean
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{port}"
        batch = spark.createDataFrame(
            [
                (f"{base}/p/5", 1),
                (f"{base}/p/17", 2),
                (f"{base}/p/99999", 1),                 # 404
                (f"http://127.0.0.1:1/refused", 1),      # connection refused
            ],
            "url string, depth int",
        )
        fetch = fetchers.make_http_fetcher(timeout_s=5)
        rows = {r["url"]: r for r in fetch(batch).collect()}
        assert rows[f"{base}/p/5"]["status"] == 200
        assert rows[f"{base}/p/99999"]["status"] == 404
        assert rows["http://127.0.0.1:1/refused"]["status"] == 0
        for bad in (f"{base}/p/99999", "http://127.0.0.1:1/refused"):
            assert list(rows[bad]["spans"]) == []
        # span-for-span parity with the synthetic fetcher on the same pages
        synth = {
            r["url"]: r
            for r in corpus.make_fetcher(N)(
                spark.createDataFrame(
                    [(corpus.url(5), 1), (corpus.url(17), 2)],
                    "url string, depth int",
                )
            ).collect()
        }
        for i in (5, 17):
            got = [tuple(s) for s in rows[f"{base}/p/{i}"]["spans"]]
            want = [tuple(s) for s in synth[corpus.url(i)]["spans"]]
            assert got == want, f"page {i} spans differ between HTTP and synthetic"
        assert all(r["fetch_latency_ms"] is not None for r in rows.values())
    finally:
        srv.shutdown()
        srv.server_close()
