"""Snapshot catalog: commit/load/time-travel/atomic pointer semantics."""

from goprowl_spark.tables import SnapshotCatalog, merge_upsert


def test_commit_load_roundtrip(spark, tmp_path):
    cat = SnapshotCatalog(spark, str(tmp_path))
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id int, v string")
    sid = cat.commit({"t": df})
    assert sid == 0
    got = {tuple(r) for r in cat.load("t").collect()}
    assert got == {(1, "a"), (2, "b")}


def test_time_travel_and_carryover(spark, tmp_path):
    cat = SnapshotCatalog(spark, str(tmp_path))
    a0 = spark.createDataFrame([(1,)], "id int")
    b0 = spark.createDataFrame([(10,)], "id int")
    cat.commit({"a": a0, "b": b0}, properties={"round": 0})
    a1 = spark.createDataFrame([(2,)], "id int")
    cat.commit({"a": a1}, properties={"round": 1})

    assert cat.latest() == 1
    assert [r["id"] for r in cat.load("a").collect()] == [2]
    assert [r["id"] for r in cat.load("a", snapshot_id=0).collect()] == [1]
    # table b carried over by reference into snapshot 1
    assert [r["id"] for r in cat.load("b").collect()] == [10]
    assert cat.properties() == {"round": 1}
    assert cat.properties(0) == {"round": 0}


def test_missing_table_with_schema_is_empty(spark, tmp_path):
    cat = SnapshotCatalog(spark, str(tmp_path))
    df = cat.load("nope", schema="id int")
    assert df.count() == 0


def test_merge_upsert_replaces_by_key(spark):
    target = spark.createDataFrame([("a", 1), ("b", 1)], "k string, v int")
    updates = spark.createDataFrame([("b", 2), ("c", 2)], "k string, v int")
    got = {tuple(r) for r in merge_upsert(target, updates, "k").collect()}
    assert got == {("a", 1), ("b", 2), ("c", 2)}


def test_iceberg_sql_emission_goldens(spark, tmp_path):
    """The Iceberg statements the production catalog swap would run are
    pinned exactly: upsert, append, overwrite, projection-commit (the
    shared seen/frontier delta as a metadata-only view), create, rollback.
    The swap is mechanical — same call sites, spark.sql(stmt) instead of
    manifest edits — so these strings ARE the migration contract."""
    from pyspark.sql import types as T

    from goprowl_spark import tables as tb

    # merge_upsert records its MERGE INTO when given a table name + sink
    emitted: list[str] = []
    target = spark.createDataFrame([("a", 1)], "k string, v int")
    updates = spark.createDataFrame([("a", 2)], "k string, v int")
    tb.merge_upsert(target, updates, "k", table_name="documents", emitted_sql=emitted)
    assert emitted == [
        "MERGE INTO spark_catalog.goprowl.documents t\n"
        "USING updates u\n"
        "ON t.k = u.k\n"
        "WHEN MATCHED THEN UPDATE SET *\n"
        "WHEN NOT MATCHED THEN INSERT *"
    ]

    # a staged commit with an append, a replace, and a projection entry
    cat = SnapshotCatalog(spark, str(tmp_path), emit_iceberg_sql=True)
    sid = cat.next_sid()
    delta = spark.createDataFrame([("u", 1, 0)], "url string, url_hash long, depth int")
    delta.write.parquet(cat.stage_path(sid, "crawl_delta"))
    delta.write.parquet(cat.stage_path(sid, "crawl_metrics"))
    cat.commit_staged(
        sid,
        tables={"frontier": cat.stage_path(sid, "crawl_delta")},
        appends={
            "seen": cat.stage_path(sid, "crawl_delta"),
            "crawl_metrics": cat.stage_path(sid, "crawl_metrics"),
        },
        projections={
            "seen": ["url", "url_hash"],
            "frontier": ["url", "url_hash", "depth"],
        },
        properties={"round": 1},
    )
    assert cat.emitted_sql == [
        "INSERT OVERWRITE spark_catalog.goprowl.frontier_base\nSELECT * FROM staged",
        "CREATE OR REPLACE VIEW spark_catalog.goprowl.frontier AS\n"
        "SELECT url, url_hash, depth FROM spark_catalog.goprowl.frontier_base",
        "INSERT INTO spark_catalog.goprowl.crawl_metrics\nSELECT * FROM staged",
        "INSERT INTO spark_catalog.goprowl.seen_base\nSELECT * FROM staged",
        "CREATE OR REPLACE VIEW spark_catalog.goprowl.seen AS\n"
        "SELECT url, url_hash FROM spark_catalog.goprowl.seen_base",
    ]

    # DDL + resume
    schema = T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("depth", T.IntegerType()),
        ]
    )
    assert tb.iceberg_create_table_sql("frontier", schema, ("depth",)) == (
        "CREATE TABLE IF NOT EXISTS spark_catalog.goprowl.frontier (\n"
        "  url string,\n  depth int\n)\n"
        "USING iceberg\nPARTITIONED BY (depth)\n"
        "TBLPROPERTIES ('format-version' = '2', "
        "'write.distribution-mode' = 'hash')"
    )
    assert tb.iceberg_rollback_sql("frontier", 7) == (
        "CALL spark_catalog.system.rollback_to_snapshot('goprowl.frontier', 7)"
    )
