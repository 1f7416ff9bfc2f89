"""DocumentStore (StorageAdapter surface U2): upsert/get/delete/clear with
snapshot time-travel."""

from pyspark.sql import functions as F

from goprowl_spark import schemas
from goprowl_spark.store import DocumentStore


def _doc(doc_id: str, title: str):
    return (
        doc_id,
        [("title", title, "", 0)],
        title,
        title,
        "webpage",
        hash(title),
        1,
        {"origin": "test"},
        None,
        None,
    )


def test_store_lifecycle(spark, tmp_path):
    store = DocumentStore(spark, str(tmp_path))
    d1 = spark.createDataFrame([_doc("u1", "first"), _doc("u2", "second")], schemas.DOCUMENTS)
    store.batch_store(d1)
    assert store.get_all().count() == 2
    assert store.get("u1").collect()[0]["title"] == "first"

    # upsert replaces by key (bleve upsert semantics)
    d2 = spark.createDataFrame([_doc("u1", "updated")], schemas.DOCUMENTS)
    store.batch_store(d2)
    assert store.get_all().count() == 2
    assert store.get("u1").collect()[0]["title"] == "updated"

    # delete by id
    sid_before_delete = store.catalog.latest()
    store.delete("u2")
    assert store.get("u2").count() == 0
    assert store.get_all().count() == 1

    # time travel: the pre-delete snapshot still has u2
    old = store.catalog.load("documents", snapshot_id=sid_before_delete)
    assert old.where(F.col("doc_id") == "u2").count() == 1

    # clear
    store.clear()
    assert store.get_all().count() == 0
    assert [r["doc_id"] for r in store.list().collect()] == []
