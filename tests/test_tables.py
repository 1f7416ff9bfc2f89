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
