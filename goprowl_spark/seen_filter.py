"""Partitioned Bloom URL-seen filter (the core scale op of the graft).

Reference behavior: colly's in-heap exact visited-set (the ``Visit`` skip
path, search/crawlers/colly.go:92-97). An exact in-memory set caps out on
one node; at the 10^10-URL design point the rebuild uses:

1. a **partitioned Bloom filter**: the seen-set's 64-bit url hashes are
   hash-partitioned into ``n_buckets``; each bucket owns one bit-array blob
   (a row of the ``seen_bloom`` table). Blobs are built/merged per-bucket
   with grouped-map pandas (numpy bit ops — Arrow-vectorized, no per-row
   Python), so the total filter is sharded across executors and each round
   only rewrites touched buckets;
2. a **probe** stage: candidate URLs cogroup with their bucket's blob and
   test membership vectorized. "Definitely new" candidates skip the
   expensive exact join entirely;
3. an **exact anti-join** on the (tiny) "maybe seen" remainder — Bloom
   false positives would otherwise silently drop never-crawled URLs, so the
   filter only ever *prunes the probe side*; correctness comes from the
   exact join (zero false drops by construction).

At 10^10 URLs with ~1% fpp this is ~12 GB of blobs across all buckets —
a few MB per bucket at n_buckets=4096, each comfortably a single Arrow
batch. The seen table itself is hash-bucketed on url_hash so the residual
anti-join is a co-partitioned shuffle on the same key.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from goprowl_spark import schemas

DEFAULT_N_BUCKETS = 64
DEFAULT_BITS_PER_BUCKET = 1 << 20  # 128 KiB blob per bucket
N_HASHES = 5


def bucket_of(url_hash_col):
    return F.pmod(F.col("url_hash") if isinstance(url_hash_col, str) else url_hash_col, F.lit(DEFAULT_N_BUCKETS)).cast("int")


def _positions(hashes: np.ndarray, m_bits: int) -> np.ndarray:
    """k probe positions per hash via double hashing (k x n matrix)."""
    h = hashes.astype(np.uint64)
    h1 = h & np.uint64(0xFFFFFFFF)
    h2 = ((h >> np.uint64(32)) | np.uint64(1)) & np.uint64(0xFFFFFFFF)
    ks = np.arange(N_HASHES, dtype=np.uint64)[:, None]
    return ((h1[None, :] + ks * h2[None, :]) % np.uint64(m_bits)).astype(np.int64)


def _set_bits(blob: np.ndarray, hashes: np.ndarray, m_bits: int) -> np.ndarray:
    pos = _positions(hashes, m_bits).ravel()
    np.bitwise_or.at(blob, pos >> 3, (1 << (pos & 7)).astype(np.uint8))
    return blob


def _test_bits(blob: np.ndarray, hashes: np.ndarray, m_bits: int) -> np.ndarray:
    pos = _positions(hashes, m_bits)
    bits = (blob[pos >> 3] >> (pos & 7)) & 1
    return bits.all(axis=0)


def _latest_blob(blobs: pd.DataFrame) -> tuple[np.ndarray, int]:
    """Resolve latest-generation-wins over a bucket's blob rows (delta
    commits append one row per touched bucket per round)."""
    row = blobs.loc[blobs["gen"].idxmax()]
    return (
        np.frombuffer(row["filter_blob"], dtype=np.uint8).copy(),
        int(row["n_items"]),
    )


def update_blooms(
    seen_bloom: DataFrame,
    new_hashes: DataFrame,
    n_buckets: int = DEFAULT_N_BUCKETS,
    bits_per_bucket: int = DEFAULT_BITS_PER_BUCKET,
    gen: int = 0,
    emit_untouched: bool = True,
) -> DataFrame:
    """Merge newly-seen url hashes into their buckets' blobs.

    ``seen_bloom``: schemas.SEEN_BLOOM (may hold several generations per
    bucket; latest wins); ``new_hashes``: any df with a ``url_hash`` column.
    By default the result is a FULL merged table (safe to chain / commit
    as a replacement — no bucket is ever silently dropped). Pass
    ``emit_untouched=False`` for the delta form: only buckets receiving
    new hashes are emitted, stamped ``gen``, to be APPENDED to the prior
    table (latest generation wins on read — the crawl's per-round commit
    shape, see probe_and_update). ``n_items`` counts hashes inserted — an
    upper bound on distinct members.
    """
    hashed = new_hashes.select(
        F.pmod(F.col("url_hash"), F.lit(n_buckets)).cast("int").alias("bucket"),
        "url_hash",
    )

    def merge(key, blobs: pd.DataFrame, hashes: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "bucket": pd.Series([], dtype="int32"),
                "filter_blob": pd.Series([], dtype=object),
                "n_items": pd.Series([], dtype="int64"),
                "gen": pd.Series([], dtype="int32"),
            }
        )
        if hashes.empty and not (emit_untouched and not blobs.empty):
            return empty
        if blobs.empty:
            blob = np.zeros(bits_per_bucket >> 3, dtype=np.uint8)
            n = 0
        else:
            blob, n = _latest_blob(blobs)
        arr = hashes["url_hash"].to_numpy(dtype=np.int64)
        if len(arr):
            _set_bits(blob, arr, bits_per_bucket)
        return pd.DataFrame(
            {
                "bucket": [key[0]],
                "filter_blob": [blob.tobytes()],
                "n_items": [n + len(arr)],
                "gen": [gen],
            }
        )

    return (
        seen_bloom.groupBy("bucket")
        .cogroup(hashed.groupBy("bucket"))
        .applyInPandas(merge, schema=schemas.SEEN_BLOOM)
    )


def probe_blooms(
    candidates: DataFrame,
    seen_bloom: DataFrame,
    n_buckets: int = DEFAULT_N_BUCKETS,
    bits_per_bucket: int = DEFAULT_BITS_PER_BUCKET,
) -> DataFrame:
    """candidates(+url_hash) → candidates + ``maybe_seen`` boolean.

    maybe_seen=False is definitive (no Bloom false negatives); True rows
    still need the exact anti-join.
    """
    cols = candidates.columns
    with_bucket = candidates.withColumn(
        "__bucket", F.pmod(F.col("url_hash"), F.lit(n_buckets)).cast("int")
    )
    out_schema = T.StructType(
        list(with_bucket.schema.fields)
        + [T.StructField("maybe_seen", T.BooleanType(), False)]
    )

    def probe(key, cand: pd.DataFrame, blobs: pd.DataFrame) -> pd.DataFrame:
        if cand.empty:
            return cand.assign(maybe_seen=pd.Series([], dtype=bool))
        if blobs.empty:
            return cand.assign(maybe_seen=False)
        blob, _ = _latest_blob(blobs)
        arr = cand["url_hash"].to_numpy(dtype=np.int64)
        return cand.assign(maybe_seen=_test_bits(blob, arr, bits_per_bucket))

    probed = (
        with_bucket.groupBy("__bucket")
        .cogroup(seen_bloom.groupBy("bucket"))
        .applyInPandas(probe, schema=out_schema)
    )
    return probed.select(*cols, "maybe_seen")


def probe_and_update(
    candidates: DataFrame,
    seen_bloom: DataFrame,
    n_buckets: int = DEFAULT_N_BUCKETS,
    bits_per_bucket: int = DEFAULT_BITS_PER_BUCKET,
    gen: int = 0,
    emit_untouched: bool = False,
    dedup: bool = False,
) -> DataFrame:
    """Fused probe + update: ONE cogroup pass per round instead of two.

    Emits two kinds of rows distinguished by ``filter_blob IS NULL``:

    * candidate rows — original columns + ``maybe_seen`` (the probe);
    * one blob row per touched bucket — the bucket's blob with ALL the
      bucket's candidate hashes inserted, stamped ``gen`` and carrying
      ``n_cands`` (the bucket's candidate count after dedup).

    With ``dedup`` the per-url min-depth reduction ALSO happens inside
    this pass: a url's rows always land in one bucket, so the bucket
    group sees every occurrence — pandas-side dedup replaces the whole
    upstream ``groupBy("url")`` shuffle (one less wide dependency per
    crawl round; requires a ``depth`` column).

    Inserting all candidates (not just the post-anti-join survivors) is
    bit-identical to inserting only the new entries: a candidate either
    survives the exact anti-join (would be inserted anyway) or is already
    in the seen set (its bits were set when it was first seen — re-insert
    is a no-op). Fusing removes the second candidates shuffle and the
    second Python/Arrow pass the split probe→update design paid per round.

    Callers persist the result and split it:
        probed = fused.where(col("filter_blob").isNull())
        blobs  = fused.where(col("filter_blob").isNotNull())
    """
    cols = candidates.columns
    with_bucket = candidates.withColumn(
        "__bucket", F.pmod(F.col("url_hash"), F.lit(n_buckets)).cast("int")
    )
    out_schema = T.StructType(
        [T.StructField(f.name, f.dataType, True) for f in with_bucket.schema.fields]
        + [
            T.StructField("maybe_seen", T.BooleanType(), True),
            T.StructField("filter_blob", T.BinaryType(), True),
            T.StructField("n_items", T.LongType(), True),
            T.StructField("gen", T.IntegerType(), True),
            T.StructField("n_cands", T.LongType(), True),
        ]
    )
    cand_cols = [f.name for f in with_bucket.schema.fields]

    def fused(key, cand: pd.DataFrame, blobs: pd.DataFrame) -> pd.DataFrame:
        out = []
        if blobs.empty:
            blob, n = np.zeros(bits_per_bucket >> 3, dtype=np.uint8), 0
            have_blob = False
        else:
            blob, n = _latest_blob(blobs)
            have_blob = True
        if dedup and not cand.empty:
            # per-url min depth, deterministic (stable sort; url unique
            # after drop_duplicates) — bit-identical to the old
            # groupBy("url").agg(min("depth")) it replaces
            cand = (
                cand.sort_values(["url", "depth"], kind="mergesort")
                .drop_duplicates("url", keep="first")
                .reset_index(drop=True)
            )
        if not cand.empty:
            arr = cand["url_hash"].to_numpy(dtype=np.int64)
            seen_flags = (
                _test_bits(blob, arr, bits_per_bucket)
                if have_blob
                else np.zeros(len(arr), dtype=bool)
            )
            out.append(
                cand.assign(
                    maybe_seen=seen_flags,
                    filter_blob=None,
                    n_items=pd.array([None] * len(cand), dtype="Int64"),
                    gen=pd.array([None] * len(cand), dtype="Int32"),
                    n_cands=pd.array([None] * len(cand), dtype="Int64"),
                )
            )
            _set_bits(blob, arr, bits_per_bucket)
            n += len(arr)
        if not cand.empty or (emit_untouched and have_blob):
            blob_row = {c: [None] for c in cand_cols}
            blob_row["__bucket"] = [key[0]]
            blob_row["maybe_seen"] = [None]
            blob_row["filter_blob"] = [blob.tobytes()]
            blob_row["n_items"] = [n]
            blob_row["gen"] = [gen]
            blob_row["n_cands"] = [len(cand)]
            out.append(pd.DataFrame(blob_row))
        if not out:
            return pd.DataFrame(
                {c: pd.Series([], dtype=object) for c in
                 cand_cols
                 + ["maybe_seen", "filter_blob", "n_items", "gen", "n_cands"]}
            )
        return pd.concat(out, ignore_index=True)

    return (
        with_bucket.groupBy("__bucket")
        .cogroup(seen_bloom.groupBy("bucket"))
        .applyInPandas(fused, schema=out_schema)
    )


def filter_unseen(
    candidates: DataFrame,
    seen: DataFrame,
    seen_bloom: DataFrame | None,
    n_buckets: int = DEFAULT_N_BUCKETS,
    bits_per_bucket: int = DEFAULT_BITS_PER_BUCKET,
) -> DataFrame:
    """The dedup-visited operator (P4/J1): candidates not yet in the seen set.

    With a Bloom table: definitely-new rows bypass the join; maybe-seen rows
    take the exact left-anti join (on the already-computed 64-bit hash, with
    url equality re-check to make hash collisions harmless).

    ``n_buckets``/``bits_per_bucket`` MUST match the parameters the blobs
    were built with (update_blooms) — a mismatch mis-addresses buckets/bits
    and silently breaks the no-false-negative invariant.
    """
    if seen_bloom is not None:
        probed = probe_blooms(candidates, seen_bloom, n_buckets, bits_per_bucket)
        fresh = probed.where(~F.col("maybe_seen")).drop("maybe_seen")
        maybe = probed.where(F.col("maybe_seen")).drop("maybe_seen")
        survivors = maybe.join(seen, on=["url_hash", "url"], how="left_anti")
        return fresh.unionByName(survivors)
    return candidates.join(seen, on=["url_hash", "url"], how="left_anti")
