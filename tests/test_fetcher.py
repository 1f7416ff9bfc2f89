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
