"""SearchEngine facade (U4): full reference-interface lifecycle, plus the
PageHandler hook (U1) on the crawl engine."""

from pyspark.sql import functions as F

from goprowl_spark import corpus
from goprowl_spark.crawl import CrawlConfig, CrawlEngine
from goprowl_spark.engine import GoProwlSearchEngine


def test_engine_lifecycle(spark, tmp_path):
    eng = GoProwlSearchEngine(spark, str(tmp_path))
    eng.index("u1", "Spark Engine", "distributed data engine")
    eng.index("u2", "spark notes", "Contains Spark Engine text")
    eng.index("u3", "Other", "nothing relevant", doc_type="pdf")

    assert eng.stats().document_count == 3
    hits = eng.search("spark").collect()
    assert [r["doc_id"] for r in hits] == ["u2", "u1"]
    assert eng.get_total_results("spark") == 2
    assert eng.get_total_results("nothing") == 1

    facets = {r["value"]: r["count"] for r in eng.facets().collect()}
    assert facets == {"webpage": 2, "pdf": 1}

    # suggest over rebuilt postings (reference stubs, real here)
    assert "spark" in eng.suggest("sp")
    postings = eng.reindex()
    assert postings.where(F.col("term") == "engine").count() == 2

    eng.delete("u2")
    assert eng.get_total_results("spark") == 1
    eng.clear()
    assert eng.stats().document_count == 0


def test_page_handler_hook(spark, tmp_path):
    """U1: the per-page processing hook runs inside the round, before
    commit (reference: storage adapter HandleCrawledPage)."""
    def annotate(docs):
        return docs.withColumn("doc_type", F.lit("annotated"))

    eng = CrawlEngine(
        spark,
        None,
        str(tmp_path),
        CrawlConfig(seeds=[corpus.url(0)], max_depth=2),
        fetcher=corpus.make_fetcher(200),
        page_handler=annotate,
    )
    eng.run()
    types = {r["doc_type"] for r in eng.documents().collect()}
    assert types == {"annotated"}
