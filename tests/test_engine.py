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


def test_read_role_permission_filter(spark, tmp_path):
    eng = GoProwlSearchEngine(spark, str(tmp_path))
    eng.index("pub", "spark public", "spark text")
    eng.index("sec", "spark secret", "spark text", permission_read=["admin"])

    all_hits = {r["doc_id"] for r in eng.search("spark").collect()}
    assert all_hits == {"pub", "sec"}  # no role → no enforcement
    admin = {r["doc_id"] for r in eng.search("spark", read_role="admin").collect()}
    assert admin == {"pub", "sec"}
    guest = {r["doc_id"] for r in eng.search("spark", read_role="guest").collect()}
    assert guest == {"pub"}  # non-granted role sees only public docs


def test_metadata_roundtrip_and_index_size(spark, tmp_path):
    eng = GoProwlSearchEngine(spark, str(tmp_path))
    eng.index("m1", "title", "content", metadata={"author": "ada", "lang": "en"})
    row = eng.store.get("m1").collect()[0]
    assert row["metadata"]["author"] == "ada"
    assert row["metadata"]["lang"] == "en"
    st = eng.stats()
    assert st.document_count == 1
    assert st.index_size_bytes > 0


def test_search_with_options_parity(spark, tmp_path):
    eng = GoProwlSearchEngine(spark, str(tmp_path))
    eng.index("a", "spark one", "text")
    eng.index("b", "spark two", "text")
    # SortBy/SortOrder are dead fields in the reference — accepted, ignored
    via_opts = [r["doc_id"] for r in eng.search_with_options(
        "spark", page=1, size=10, sort_by="title", sort_order="desc"
    ).collect()]
    direct = [r["doc_id"] for r in eng.search("spark").collect()]
    assert via_opts == direct


def test_search_ranked_over_maintained_index(spark, tmp_path):
    eng = GoProwlSearchEngine(spark, str(tmp_path))
    eng.index("d1", "t", "spark spark spark engine")
    eng.index("d2", "t", "spark unrelated words here")
    eng.index("d3", "t", "nothing matching at all")
    top = eng.search_ranked("spark", scorer="bm25", k=5).collect()
    assert [r["doc_id"] for r in top][0] == "d1"  # highest tf wins
    assert len(top) == 2  # d3 has no matching term
    tf = eng.search_ranked("spark", scorer="tfidf", k=5).collect()
    assert {r["doc_id"] for r in tf} == {"d1", "d2"}
