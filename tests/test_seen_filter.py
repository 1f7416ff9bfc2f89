"""Partitioned Bloom seen-filter: zero false negatives (no URL ever dropped
that wasn't truly seen), sane false-positive rate, and equivalence of the
Bloom-pruned path with the plain exact anti-join."""

from pyspark.sql import functions as F

from goprowl_spark import seen_filter


def _urls(spark, lo, hi, prefix="https://h1.test/p/"):
    return spark.range(lo, hi).select(
        F.concat(F.lit(prefix), F.col("id").cast("string")).alias("url"),
        F.xxhash64(F.concat(F.lit(prefix), F.col("id").cast("string"))).alias(
            "url_hash"
        ),
    )


def test_bloom_no_false_negatives(spark):
    seen = _urls(spark, 0, 5000)
    empty = spark.createDataFrame([], seen_filter.schemas.SEEN_BLOOM)
    blooms = seen_filter.update_blooms(empty, seen, bits_per_bucket=1 << 14)
    probed = seen_filter.probe_blooms(seen, blooms, bits_per_bucket=1 << 14)
    # every truly-seen url must probe maybe_seen=True
    assert probed.where(~F.col("maybe_seen")).count() == 0


def test_bloom_fpr_reasonable(spark):
    seen = _urls(spark, 0, 5000)
    empty = spark.createDataFrame([], seen_filter.schemas.SEEN_BLOOM)
    blooms = seen_filter.update_blooms(empty, seen, bits_per_bucket=1 << 17)
    unseen = _urls(spark, 10_000, 20_000)
    probed = seen_filter.probe_blooms(unseen, blooms, bits_per_bucket=1 << 17)
    fp = probed.where(F.col("maybe_seen")).count()
    assert fp / 10_000 < 0.05  # ~78 hashes/bucket in 128Kib bits → tiny fpr


def test_incremental_update_preserves_members(spark):
    a = _urls(spark, 0, 1000)
    b = _urls(spark, 1000, 2000)
    empty = spark.createDataFrame([], seen_filter.schemas.SEEN_BLOOM)
    blooms = seen_filter.update_blooms(empty, a, bits_per_bucket=1 << 14)
    blooms = seen_filter.update_blooms(blooms, b, bits_per_bucket=1 << 14)
    both = a.unionByName(b)
    probed = seen_filter.probe_blooms(both, blooms, bits_per_bucket=1 << 14)
    assert probed.where(~F.col("maybe_seen")).count() == 0
    assert blooms.agg(F.sum("n_items")).collect()[0][0] == 2000


def test_filter_unseen_equals_exact_antijoin(spark):
    seen_urls = _urls(spark, 0, 3000)
    seen = seen_urls.select(
        "url_hash", "url", F.lit(1).alias("depth"), F.lit(0).alias("first_seen_round")
    )
    empty = spark.createDataFrame([], seen_filter.schemas.SEEN_BLOOM)
    blooms = seen_filter.update_blooms(empty, seen_urls)
    candidates = _urls(spark, 2000, 6000)

    with_bloom = {
        r["url"] for r in seen_filter.filter_unseen(candidates, seen, blooms).collect()
    }
    exact = {
        r["url"] for r in seen_filter.filter_unseen(candidates, seen, None).collect()
    }
    assert with_bloom == exact
    assert len(exact) == 3000  # 3000..5999


def test_bloom_delta_latest_generation_wins(spark):
    # round 1 inserts [0,100), round 2 appends a delta for [100,200);
    # probing the UNION of generations must see both ranges
    a = _urls(spark, 0, 100)
    b = _urls(spark, 100, 200)
    empty = spark.createDataFrame([], seen_filter.schemas.SEEN_BLOOM)
    g1 = seen_filter.update_blooms(empty, a, bits_per_bucket=1 << 14, gen=1)
    delta2 = seen_filter.update_blooms(
        g1, b, bits_per_bucket=1 << 14, gen=2, emit_untouched=False
    )
    # simulate the appended table: generation-1 rows PLUS generation-2 delta
    merged = g1.unionByName(delta2)
    probed = seen_filter.probe_blooms(
        _urls(spark, 0, 200), merged, bits_per_bucket=1 << 14
    )
    assert probed.where(~F.col("maybe_seen")).count() == 0


def test_probe_and_update_matches_split_path(spark):
    seen = _urls(spark, 0, 500)
    cands = _urls(spark, 400, 700)
    empty = spark.createDataFrame([], seen_filter.schemas.SEEN_BLOOM)
    blooms = seen_filter.update_blooms(empty, seen, bits_per_bucket=1 << 14, gen=0)
    fused = seen_filter.probe_and_update(
        cands, blooms, bits_per_bucket=1 << 14, gen=1
    )
    probed = fused.where(F.col("filter_blob").isNull())
    split = seen_filter.probe_blooms(cands, blooms, bits_per_bucket=1 << 14)
    got = {(r["url"], r["maybe_seen"]) for r in probed.collect()}
    want = {(r["url"], r["maybe_seen"]) for r in split.collect()}
    assert got == want
    # the emitted blobs contain every candidate (probe after update → all True)
    delta = fused.where(F.col("filter_blob").isNotNull()).select(
        F.col("__bucket").alias("bucket"), "filter_blob", "n_items", "gen"
    )
    reprobe = seen_filter.probe_blooms(
        cands, blooms.unionByName(delta), bits_per_bucket=1 << 14
    )
    assert reprobe.where(~F.col("maybe_seen")).count() == 0


def test_update_blooms_full_merge_keeps_untouched_buckets(spark):
    # default (full-table) form: chaining a SPARSE second batch must not
    # drop untouched buckets (regression: the delta form under the same
    # signature silently lost them -> Bloom false negatives)
    a = _urls(spark, 0, 1000)
    sparse = _urls(spark, 1000, 1005)  # touches only a few buckets
    empty = spark.createDataFrame([], seen_filter.schemas.SEEN_BLOOM)
    b1 = seen_filter.update_blooms(empty, a, bits_per_bucket=1 << 14)
    b2 = seen_filter.update_blooms(b1, sparse, bits_per_bucket=1 << 14)
    probed = seen_filter.probe_blooms(
        _urls(spark, 0, 1005), b2, bits_per_bucket=1 << 14
    )
    assert probed.where(~F.col("maybe_seen")).count() == 0


# ---------------------------------------------------------------- cuckoo
# The cuckoo backend: same shard/delta contract, per-entry fingerprints.
# What Bloom cannot do — and these tests pin — is DELETE (recrawl/expiry).


def test_cuckoo_no_false_negatives(spark):
    seen = _urls(spark, 0, 5000)
    empty = spark.createDataFrame([], seen_filter.schemas.SEEN_BLOOM)
    cf = seen_filter.update_cuckoos(empty, seen)
    probed = seen_filter.probe_cuckoos(seen, cf)
    assert probed.where(~F.col("maybe_seen")).count() == 0


def test_cuckoo_fpr_small(spark):
    seen = _urls(spark, 0, 5000)
    empty = spark.createDataFrame([], seen_filter.schemas.SEEN_BLOOM)
    cf = seen_filter.update_cuckoos(empty, seen)
    probed = seen_filter.probe_cuckoos(_urls(spark, 10_000, 20_000), cf)
    fp = probed.where(F.col("maybe_seen")).count()
    # 16-bit fingerprints at ~1% shard load: expected FPR ~ 2*4/65536
    assert fp / 10_000 < 0.01


def test_cuckoo_incremental_update_exact_count(spark):
    a = _urls(spark, 0, 1000)
    b = _urls(spark, 1000, 2000)
    empty = spark.createDataFrame([], seen_filter.schemas.SEEN_BLOOM)
    cf = seen_filter.update_cuckoos(empty, a)
    cf = seen_filter.update_cuckoos(cf, b)
    probed = seen_filter.probe_cuckoos(a.unionByName(b), cf)
    assert probed.where(~F.col("maybe_seen")).count() == 0
    # n_items is EXACT for the cuckoo table (per-entry storage), and a
    # member's re-insert is a no-op: inserting a again must not change it
    assert cf.agg(F.sum("n_items")).collect()[0][0] == 2000
    cf2 = seen_filter.update_cuckoos(cf, a)
    assert cf2.agg(F.sum("n_items")).collect()[0][0] == 2000


def test_cuckoo_delete_unsees_and_allows_reinsert(spark):
    a = _urls(spark, 0, 1000)
    b = _urls(spark, 1000, 2000)
    empty = spark.createDataFrame([], seen_filter.schemas.SEEN_BLOOM)
    cf = seen_filter.update_cuckoos(empty, a.unionByName(b), gen=0)
    delta = seen_filter.delete_cuckoos(cf, b, gen=1)
    merged = cf.unionByName(delta)
    # kept members still present (zero false negatives survives deletion)
    assert seen_filter.probe_cuckoos(a, merged).where(
        ~F.col("maybe_seen")
    ).count() == 0
    # deleted urls now probe unseen (rare fingerprint collisions with the
    # 1000 kept entries aside — at 16-bit fps expect ~0)
    still = seen_filter.probe_cuckoos(b, merged).where(F.col("maybe_seen")).count()
    assert still / 1000 < 0.01
    # latest-gen n_items across shards: exactly the 1000 kept entries
    assert merged.groupBy("bucket").agg(
        F.max_by("n_items", "gen").alias("n")
    ).agg(F.sum("n")).collect()[0][0] == 1000
    # re-inserting the deleted range sees them again
    cf3 = seen_filter.update_cuckoos(merged, b, gen=2, emit_untouched=False)
    reprobe = seen_filter.probe_cuckoos(b, merged.unionByName(cf3))
    assert reprobe.where(~F.col("maybe_seen")).count() == 0


def test_cuckoo_autogrow_under_overload(spark):
    """Overload an under-provisioned shard: 16 inner buckets x 4 slots = 64
    slots per shard, ~80 entries per shard. The shard must auto-grow in
    place (slot cap doubles until the load fits under CUCKOO_GROW_LOAD)
    instead of walking eviction storms, so the stash stays EMPTY, every
    member still probes maybe_seen, and n_items is exact."""
    import numpy as np

    seen = _urls(spark, 0, 5000)
    empty = spark.createDataFrame([], seen_filter.schemas.SEEN_BLOOM)
    cf = seen_filter.update_cuckoos(empty, seen, inner_buckets=16, slot_cap=4)
    probed = seen_filter.probe_cuckoos(seen, cf)
    assert probed.where(~F.col("maybe_seen")).count() == 0
    hdrs = [
        np.frombuffer(r["filter_blob"], dtype=np.uint64, count=3)
        for r in cf.select("filter_blob").collect()
    ]
    # every shard grew past the requested cap of 4, and none needed the stash
    assert all(int(h[1]) > 4 for h in hdrs)
    assert sum(int(h[2]) for h in hdrs) == 0
    assert cf.agg(F.sum("n_items")).collect()[0][0] == 5000


def test_cuckoo_bulk_stash_beyond_max_cap(spark):
    """Push a shard past its growth ceiling (inner_buckets=2 caps the table
    at 2 x CUCKOO_MAX_SLOT_CAP slots; 5000 urls over 4 shards is ~1250 per
    shard): the overflow must land in the exact bulk stash — no false
    negatives, exact n_items, cap pinned at CUCKOO_MAX_SLOT_CAP."""
    import numpy as np

    seen = _urls(spark, 0, 5000)
    empty = spark.createDataFrame([], seen_filter.schemas.SEEN_BLOOM)
    cf = seen_filter.update_cuckoos(
        empty, seen, n_buckets=4, inner_buckets=2, slot_cap=4
    )
    probed = seen_filter.probe_cuckoos(seen, cf, n_buckets=4)
    assert probed.where(~F.col("maybe_seen")).count() == 0
    hdrs = [
        np.frombuffer(r["filter_blob"], dtype=np.uint64, count=3)
        for r in cf.select("filter_blob").collect()
    ]
    assert all(int(h[1]) == seen_filter.CUCKOO_MAX_SLOT_CAP for h in hdrs)
    assert sum(int(h[2]) for h in hdrs) > 0
    assert cf.agg(F.sum("n_items")).collect()[0][0] == 5000


def test_cuckoo_blob_deterministic(spark):
    seen = _urls(spark, 0, 2000)
    empty = spark.createDataFrame([], seen_filter.schemas.SEEN_BLOOM)
    b1 = {
        r["bucket"]: bytes(r["filter_blob"])
        for r in seen_filter.update_cuckoos(empty, seen).collect()
    }
    b2 = {
        r["bucket"]: bytes(r["filter_blob"])
        for r in seen_filter.update_cuckoos(empty, seen).collect()
    }
    assert b1 == b2


def test_filter_unseen_cuckoo_equals_exact_antijoin(spark):
    seen_urls = _urls(spark, 0, 3000)
    seen = seen_urls.select(
        "url_hash", "url", F.lit(1).alias("depth"), F.lit(0).alias("first_seen_round")
    )
    empty = spark.createDataFrame([], seen_filter.schemas.SEEN_BLOOM)
    cf = seen_filter.update_cuckoos(empty, seen_urls)
    candidates = _urls(spark, 2000, 6000)
    with_cf = {
        r["url"]
        for r in seen_filter.filter_unseen(
            candidates, seen, cf, kind="cuckoo"
        ).collect()
    }
    exact = {
        r["url"] for r in seen_filter.filter_unseen(candidates, seen, None).collect()
    }
    assert with_cf == exact
    assert len(exact) == 3000


def test_probe_and_update_cuckoo_matches_split_path(spark):
    seen = _urls(spark, 0, 500)
    cands = _urls(spark, 400, 700)
    empty = spark.createDataFrame([], seen_filter.schemas.SEEN_BLOOM)
    cf = seen_filter.update_cuckoos(empty, seen, gen=0)
    fused = seen_filter.probe_and_update(cands, cf, gen=1, kind="cuckoo")
    probed = fused.where(F.col("filter_blob").isNull())
    split = seen_filter.probe_cuckoos(cands, cf)
    got = {(r["url"], r["maybe_seen"]) for r in probed.collect()}
    want = {(r["url"], r["maybe_seen"]) for r in split.collect()}
    assert got == want
    # emitted deltas contain every candidate: reprobe after append = all True
    delta = fused.where(F.col("filter_blob").isNotNull()).select(
        F.col("__bucket").alias("bucket"), "filter_blob", "n_items", "gen"
    )
    reprobe = seen_filter.probe_cuckoos(cands, cf.unionByName(delta))
    assert reprobe.where(~F.col("maybe_seen")).count() == 0
