"""Partitioned Bloom/cuckoo URL-seen filter (the core scale op of the graft).

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
# default cuckoo shard geometry (details in the cuckoo section below);
# defined up here because probe_and_update's signature defaults to them
CUCKOO_INNER_BUCKETS = 1 << 14  # per shard; power of two for the XOR pair
CUCKOO_SLOT_CAP = 4


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
    kind: str = "bloom",
    inner_buckets: int = CUCKOO_INNER_BUCKETS,
    slot_cap: int = CUCKOO_SLOT_CAP,
) -> DataFrame:
    """Fused probe + update: ONE cogroup pass per round instead of two.

    ``inner_buckets``/``slot_cap`` size FRESH cuckoo shards only (an
    existing blob's header geometry is authoritative, exactly as in
    update_cuckoos); size them for the expected crawl scale with
    cuckoo_inner_buckets_for.

    ``kind`` selects the filter payload: "bloom" (bit arrays) or "cuckoo"
    (fingerprint tables — deletable, exact n_items). The cogroup shape,
    the probe-before-insert semantics, and the delta-generation contract
    are identical; only the per-shard numpy kernel differs.

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

    cuckoo = kind == "cuckoo"

    def fused(key, cand: pd.DataFrame, blobs: pd.DataFrame) -> pd.DataFrame:
        out = []
        nb, cap = inner_buckets, slot_cap
        if blobs.empty:
            if cuckoo:
                table, stash = _cuckoo_empty(nb, cap)
            else:
                blob = np.zeros(bits_per_bucket >> 3, dtype=np.uint8)
            n = 0
            have_blob = False
        else:
            blob, n = _latest_blob(blobs)
            if cuckoo:
                # header geometry is authoritative (see update_cuckoos)
                table, stash, nb, cap = _cuckoo_decode(blob.tobytes())
            have_blob = True
        if dedup and not cand.empty:
            # per-url min depth via hash-grouped idxmin — measured ~6x
            # faster than the previous stable sort + drop_duplicates on
            # 100k-row groups (no O(n log n) string sort). Value-identical:
            # idxmin picks the first row holding the group's min depth,
            # and rows tying on (url, min depth) are fully identical here
            # (every other candidate column is a function of url) — the
            # same contract as the old groupBy("url").agg(min("depth")).
            keep = cand.groupby("url", sort=False)["depth"].idxmin()
            cand = cand.loc[keep].reset_index(drop=True)
        if not cand.empty:
            arr = cand["url_hash"].to_numpy(dtype=np.int64)
            if not have_blob:
                seen_flags = np.zeros(len(arr), dtype=bool)
            elif cuckoo:
                seen_flags = _cuckoo_contains(table, stash, nb, cap, arr)
            else:
                seen_flags = _test_bits(blob, arr, bits_per_bucket)
            out.append(
                cand.assign(
                    maybe_seen=seen_flags,
                    filter_blob=None,
                    n_items=pd.array([None] * len(cand), dtype="Int64"),
                    gen=pd.array([None] * len(cand), dtype="Int32"),
                    n_cands=pd.array([None] * len(cand), dtype="Int64"),
                )
            )
            if cuckoo:
                table, stash, cap, ins = _cuckoo_insert(table, stash, nb, cap, arr)
                n += ins
            else:
                _set_bits(blob, arr, bits_per_bucket)
                n += len(arr)
        if not cand.empty or (emit_untouched and have_blob):
            blob_row = {c: [None] for c in cand_cols}
            blob_row["__bucket"] = [key[0]]
            blob_row["maybe_seen"] = [None]
            blob_row["filter_blob"] = [
                _cuckoo_encode(table, stash, nb, cap)
                if cuckoo
                else blob.tobytes()
            ]
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


# --------------------------------------------------------------------------
# Cuckoo-filter backend (the "cuckoo" alternative the north rule names).
#
# Same sharding and delta-generation contract as the Bloom blobs (one blob
# row per outer bucket, latest gen wins), different blob payload:
#
#   header  uint64[3]: [inner_buckets, slot_cap, stash_len]
#   table   uint16[inner_buckets * slot_cap]  (0 = empty slot)
#   stash   uint64[stash_len]  (canonical (min_bucket << 16 | fp) overflow)
#
# Why a second backend: a Bloom bit-array cannot DELETE (clearing a bit
# un-sees every URL sharing it), so recrawl/expiry — "this URL's content
# aged out, fetch it again" — forces a full filter rebuild. A cuckoo
# filter stores per-entry fingerprints, so delete_cuckoos removes exactly
# one entry. Same 128 KiB per shard as the default Bloom blob
# (16384 buckets x 4 slots x 2 bytes) at a ~0.01% fingerprint FPR.
#
# Vectorization discipline (input_hint: no per-row Python): probe is pure
# numpy (gather + compare); insert places the bulk with two vectorized
# choice passes and walks ONLY the contended tail (both candidate buckets
# full) through the classic eviction loop — deterministic victim, bounded
# kicks, exact stash fallback. Membership is preserved by every
# relocation, so zero-false-negatives holds at ANY load. A shard whose
# load would cross CUCKOO_GROW_LOAD first resizes itself in place
# (_cuckoo_grow: slot-cap doubling, membership-preserving), so an
# under-provisioned filter degrades to a bounded FPR increase, never to
# per-row eviction storms; size a-priori via cuckoo_inner_buckets_for.

CUCKOO_MAX_KICKS = 250
# In-shard auto-resize (the production answer to "the crawl outgrew the
# filter", measured: a 9.5M-URL crawl over the fixed 64x16384x4 = 4.2M-slot
# geometry degraded the biggest wave 59s -> 900s at 16 cores — every insert
# past full walked 250 kicks in Python and the stash hit millions of
# np.isin'd entries). Bucket indices depend ONLY on the bucket count, so
# doubling SLOT_CAP is a membership-preserving zero-rehash reshape (pad each
# bucket row with empty slots); the stash drains back into the grown table
# because its canonical keys encode (bucket, fp). Each doubling doubles the
# per-probe FPR (2 buckets x cap slots x 2^-16), so growth is capped —
# beyond the cap, inserts stash in BULK (vectorized, exact) instead of
# walking evictions that cannot succeed.
CUCKOO_MAX_SLOT_CAP = 128  # FPR ceiling ~0.4%; 32x the default capacity
CUCKOO_GROW_LOAD = 0.85  # grow so the post-insert load factor stays below
_CUCKOO_HDR = 3  # uint64 header words


def cuckoo_inner_buckets_for(
    expected_items: int,
    n_buckets: int = DEFAULT_N_BUCKETS,
    slot_cap: int = CUCKOO_SLOT_CAP,
    target_load: float = 0.7,
) -> int:
    """A-priori shard geometry: the smallest power-of-two bucket count per
    shard that holds ``expected_items`` across ``n_buckets`` shards at
    ``target_load`` with the default slot cap. A production crawl knows its
    scale (the corpus/frontier bound); sizing up front keeps the filter at
    the design FPR and never triggers the in-shard slot-cap growth."""
    per_shard = max(1, int(expected_items / max(1, n_buckets)))
    need = int(per_shard / (slot_cap * target_load)) + 1
    nb = CUCKOO_INNER_BUCKETS
    while nb < need:
        nb <<= 1
    return nb


def _cuckoo_parts(h: np.ndarray, nb: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(fp, b1, b2) for int64 url hashes: 16-bit fingerprint from the top
    bits (never 0), partial-key XOR bucket pair.

    b1 must NOT reuse the hash's low bits: the shard key is
    pmod(url_hash, n_buckets), so within one shard the low bits are
    CONSTANT — `u & (nb-1)` would collapse b1 to nb/n_buckets distinct
    values per shard (1/64th of the table's primary capacity at the
    defaults), degrading placement to near-single-choice. A Fibonacci
    multiply-shift takes the HIGH bits of u*phi, which vary freely within
    a shard and stay independent of the fp bits."""
    u = h.astype(np.uint64)
    fp = (u >> np.uint64(48)).astype(np.uint16)
    fp = np.where(fp == 0, np.uint16(1), fp)
    shift = np.uint64(64 - int(nb).bit_length() + 1)  # 64 - log2(nb)
    b1 = ((u * np.uint64(0x9E3779B97F4A7C15)) >> shift).astype(np.int64)
    kick = (fp.astype(np.uint64) * np.uint64(0x5BD1E995)) & np.uint64(nb - 1)
    b2 = (b1.astype(np.uint64) ^ kick).astype(np.int64)
    return fp, b1, b2


def _cuckoo_canon(fp: np.ndarray, b1: np.ndarray, b2: np.ndarray) -> np.ndarray:
    """Canonical stash key: (min candidate bucket << 16) | fp — derivable
    from either bucket via the XOR pair, so probe and delete agree."""
    lo = np.minimum(b1, b2).astype(np.uint64)
    return (lo << np.uint64(16)) | fp.astype(np.uint64)


def _cuckoo_empty(nb: int, cap: int) -> tuple[np.ndarray, np.ndarray]:
    return np.zeros(nb * cap, dtype=np.uint16), np.zeros(0, dtype=np.uint64)


def _cuckoo_decode(blob: bytes) -> tuple[np.ndarray, np.ndarray, int, int]:
    hdr = np.frombuffer(blob, dtype=np.uint64, count=_CUCKOO_HDR)
    nb, cap, stash_len = int(hdr[0]), int(hdr[1]), int(hdr[2])
    off = _CUCKOO_HDR * 8
    table = np.frombuffer(blob, dtype=np.uint16, count=nb * cap, offset=off).copy()
    off += nb * cap * 2
    stash = np.frombuffer(blob, dtype=np.uint64, count=stash_len, offset=off).copy()
    return table, stash, nb, cap


def _cuckoo_encode(table: np.ndarray, stash: np.ndarray, nb: int, cap: int) -> bytes:
    hdr = np.array([nb, cap, len(stash)], dtype=np.uint64)
    return hdr.tobytes() + table.tobytes() + stash.tobytes()


def _cuckoo_contains(
    table: np.ndarray, stash: np.ndarray, nb: int, cap: int, h: np.ndarray
) -> np.ndarray:
    """Vectorized membership: fingerprint in either candidate bucket, or
    canonical key in the stash."""
    if len(h) == 0:
        return np.zeros(0, dtype=bool)
    fp, b1, b2 = _cuckoo_parts(h, nb)
    t = table.reshape(nb, cap)
    hit1 = (t[b1] == fp[:, None]).any(axis=1)
    hit2 = (t[b2] == fp[:, None]).any(axis=1)
    out = hit1 | hit2
    if len(stash):
        out |= np.isin(_cuckoo_canon(fp, b1, b2), stash)
    return out


def _place_bulk(
    table2d: np.ndarray, buckets: np.ndarray, fps: np.ndarray
) -> np.ndarray:
    """One vectorized choice pass: for entries grouped by target bucket
    (in input order), fill that bucket's free slots first-come. Returns a
    boolean placed mask. Free slots per bucket and within-group ranks are
    all numpy; nothing touches Python per entry."""
    if len(buckets) == 0:
        return np.zeros(0, dtype=bool)
    cap = table2d.shape[1]
    order = np.argsort(buckets, kind="stable")
    sb = buckets[order]
    # rank of each entry within its bucket group
    first = np.concatenate(([True], sb[1:] != sb[:-1]))
    grp_start = np.flatnonzero(first)
    ranks = np.arange(len(sb)) - np.repeat(grp_start, np.diff(np.append(grp_start, len(sb))))
    free = (table2d[sb] == 0).sum(axis=1)
    placed_sorted = ranks < free
    # write the placed fingerprints: for each placed entry, the target slot
    # is the (slot_rank)-th free slot of its bucket
    pb, pf = sb[placed_sorted], fps[order][placed_sorted]
    pr = ranks[placed_sorted]
    if len(pb):
        free_slots = table2d[pb] == 0
        # index of the pr-th free slot per row: cumulative count of free
        # slots per row, find first position where cumsum > pr
        cum = free_slots.cumsum(axis=1)
        slot = (cum <= pr[:, None]).sum(axis=1)
        table2d[pb, slot] = pf
    placed = np.zeros(len(buckets), dtype=bool)
    placed[order] = placed_sorted
    return placed


def _cuckoo_grow(
    table: np.ndarray, stash: np.ndarray, nb: int, cap: int, need: int
) -> tuple[np.ndarray, np.ndarray, int]:
    """Membership-preserving in-shard resize: double the slot cap until
    ``need`` live entries fit under CUCKOO_GROW_LOAD (ceiling:
    CUCKOO_MAX_SLOT_CAP). Bucket addressing depends only on ``nb``, so the
    grow is a reshape-pad — no rehash, and no original keys needed — and
    the stash drains back into the new free slots (its canonical keys
    encode (min candidate bucket, fp), which is the full placement
    information). Every doubling doubles the per-probe FPR, which is why
    growth is bounded and a-priori sizing (cuckoo_inner_buckets_for) is
    the production default."""
    new_cap = cap
    while new_cap < CUCKOO_MAX_SLOT_CAP and nb * new_cap * CUCKOO_GROW_LOAD < need:
        new_cap <<= 1
    if new_cap == cap:
        return table, stash, cap
    t_new = np.zeros((nb, new_cap), dtype=np.uint16)
    t_new[:, :cap] = table.reshape(nb, cap)
    if len(stash):
        fp = (stash & np.uint64(0xFFFF)).astype(np.uint16)
        b1 = (stash >> np.uint64(16)).astype(np.int64)
        kick = (fp.astype(np.uint64) * np.uint64(0x5BD1E995)) & np.uint64(nb - 1)
        b2 = (b1.astype(np.uint64) ^ kick).astype(np.int64)
        placed = _place_bulk(t_new, b1, fp)
        rem = np.flatnonzero(~placed)
        if len(rem):
            placed2 = _place_bulk(t_new, b2[rem], fp[rem])
            rem = rem[~placed2]
        stash = stash[rem]
    return t_new.reshape(-1), stash, new_cap


def _cuckoo_insert(
    table: np.ndarray, stash: np.ndarray, nb: int, cap: int, h: np.ndarray
) -> tuple[np.ndarray, np.ndarray, int, int]:
    """Insert hashes (skipping ones already maybe-present — a member's
    re-insert is a no-op, mirroring Bloom re-set semantics, and a
    false-positive skip is harmless because the matching fingerprint
    keeps answering every future probe). Returns (table, stash, slot_cap,
    n_inserted) — slot_cap can come back LARGER than it went in: an
    insert batch that would push the load factor past CUCKOO_GROW_LOAD
    first grows the shard in place (see _cuckoo_grow)."""
    h = np.unique(h)
    fresh = ~_cuckoo_contains(table, stash, nb, cap, h)
    h = h[fresh]
    if len(h) == 0:
        return table, stash, cap, 0
    live = int(np.count_nonzero(table)) + len(stash)
    if live + len(h) > nb * cap * CUCKOO_GROW_LOAD:
        table, stash, cap = _cuckoo_grow(table, stash, nb, cap, live + len(h))
    fp, b1, b2 = _cuckoo_parts(h, nb)
    t = table.reshape(nb, cap)
    placed1 = _place_bulk(t, b1, fp)
    r = ~placed1
    placed2 = np.zeros(len(h), dtype=bool)
    if r.any():
        placed2_sub = _place_bulk(t, b2[r], fp[r])
        placed2[np.flatnonzero(r)[placed2_sub]] = True
    rest = np.flatnonzero(~(placed1 | placed2))
    new_stash = []
    if len(rest):
        # Eviction walk, contended tail only: deterministic victim slot
        # (kick count mod cap), membership preserved at every step. The
        # walk's total work is BOUNDED: each successful walk consumes one
        # free slot, so at most free_remaining walks can ever park, and a
        # bounded allowance of failed walks is tolerated on top — past
        # either limit the remainder stashes in bulk (vectorized, exact
        # membership either way). Without the bound, an over-capacity
        # shard (only reachable at CUCKOO_MAX_SLOT_CAP) pays 250 Python
        # kicks per entry — the measured 15x crawl-wave cliff.
        free_remaining = int((t == 0).sum())
        walk_budget = max(1024, 4 * free_remaining)
        bulk_from = len(rest)
        for j, i in enumerate(rest):
            if free_remaining == 0 or j >= walk_budget:
                bulk_from = j
                break
            cur_fp, cur_b = int(fp[i]), int(b1[i])
            parked = False
            for kicks in range(CUCKOO_MAX_KICKS):
                row = t[cur_b]
                empty = np.flatnonzero(row == 0)
                if len(empty):
                    row[empty[0]] = cur_fp
                    parked = True
                    break
                victim_slot = kicks % cap
                victim_fp = int(row[victim_slot])
                row[victim_slot] = cur_fp
                vkick = (victim_fp * 0x5BD1E995) & (nb - 1)
                cur_fp, cur_b = victim_fp, cur_b ^ vkick
            if parked:
                free_remaining -= 1
            else:
                # stash the fp the walk is still holding (canonical form)
                alt = cur_b ^ ((cur_fp * 0x5BD1E995) & (nb - 1))
                canon = (min(cur_b, alt) << 16) | cur_fp
                new_stash.append(canon)
        tail = rest[bulk_from:]
        if len(tail):
            stash = np.concatenate(
                [stash, _cuckoo_canon(fp[tail], b1[tail], b2[tail])]
            )
    if new_stash:
        stash = np.concatenate([stash, np.array(new_stash, dtype=np.uint64)])
    return table, stash, cap, int(len(h))


def _cuckoo_delete(
    table: np.ndarray, stash: np.ndarray, nb: int, cap: int, h: np.ndarray
) -> tuple[np.ndarray, np.ndarray, int]:
    """Remove one entry per hash (the operation Bloom cannot do). The
    member test is vectorized; only actual removals touch Python, and a
    delete batch is a maintenance op (recrawl/expiry), not the hot path.

    CONTRACT (standard cuckoo-filter caveat, Fan et al. 2014 §3.2):
    deletion is exact only for keys that hold their OWN entry. Keys
    sharing a fingerprint and a candidate bucket form an ambiguity class
    that this deduplicating filter may serve with one physical entry —
    deleting ANY class member (or a never-inserted look-alike) removes
    the shared entry and orphans the rest into false negatives, in either
    direction (tests/test_properties.py pins both the invariant and the
    caveat). Inherent to every fingerprint filter, not a bug. The crawl's
    expiry path (CrawlEngine.expire_urls) therefore does NOT call this at
    all — it rebuilds the touched shards from the exact seen table. Use
    this primitive when ambiguity is acceptable (a rare spurious
    re-crawl) or provably absent. A true non-member (no fingerprint match
    anywhere) is a safe no-op."""
    h = np.unique(h)
    member = _cuckoo_contains(table, stash, nb, cap, h)
    h = h[member]
    if len(h) == 0:
        return table, stash, 0
    fp, b1, b2 = _cuckoo_parts(h, nb)
    canon = _cuckoo_canon(fp, b1, b2)
    t = table.reshape(nb, cap)
    removed = 0
    stash_list = stash.tolist()
    for i in range(len(h)):
        hit = False
        for b in (int(b1[i]), int(b2[i])):
            slots = np.flatnonzero(t[b] == fp[i])
            if len(slots):
                t[b, slots[0]] = 0
                hit = True
                break
        if not hit and canon[i] in stash_list:
            stash_list.remove(canon[i])
            hit = True
        removed += int(hit)
    return table, np.array(stash_list, dtype=np.uint64), removed


def update_cuckoos(
    seen_cuckoo: DataFrame,
    new_hashes: DataFrame,
    n_buckets: int = DEFAULT_N_BUCKETS,
    inner_buckets: int = CUCKOO_INNER_BUCKETS,
    slot_cap: int = CUCKOO_SLOT_CAP,
    gen: int = 0,
    emit_untouched: bool = True,
) -> DataFrame:
    """Cuckoo twin of update_blooms: same SEEN_BLOOM schema, same
    delta-generation contract (emit_untouched=False appends only touched
    shards, latest gen wins on read). n_items counts live entries
    (inserts minus deletes), an exact count — unlike the Bloom blob's
    insert upper bound — because fingerprints are individually stored."""

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
            nb, cap = inner_buckets, slot_cap
            table, stash = _cuckoo_empty(nb, cap)
            n = 0
        else:
            # an existing blob's header is authoritative: the args only
            # size FRESH shards (a geometry mismatch would misaddress
            # every stored fingerprint — silent false negatives)
            blob, n = _latest_blob(blobs)
            table, stash, nb, cap = _cuckoo_decode(blob.tobytes())
        arr = hashes["url_hash"].to_numpy(dtype=np.int64)
        ins = 0
        if len(arr):
            table, stash, cap, ins = _cuckoo_insert(table, stash, nb, cap, arr)
        return pd.DataFrame(
            {
                "bucket": [key[0]],
                "filter_blob": [_cuckoo_encode(table, stash, nb, cap)],
                "n_items": [n + ins],
                "gen": [gen],
            }
        )

    return (
        seen_cuckoo.groupBy("bucket")
        .cogroup(hashed.groupBy("bucket"))
        .applyInPandas(merge, schema=schemas.SEEN_BLOOM)
    )


def delete_cuckoos(
    seen_cuckoo: DataFrame,
    del_hashes: DataFrame,
    n_buckets: int = DEFAULT_N_BUCKETS,
    gen: int = 0,
) -> DataFrame:
    """Remove url hashes from their shard's filter — the recrawl/expiry
    path. Emits only touched shards stamped ``gen`` (append, latest wins),
    exactly like a delta update round."""
    hashed = del_hashes.select(
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
        if hashes.empty or blobs.empty:
            return empty
        blob, n = _latest_blob(blobs)
        # header geometry is authoritative (see update_cuckoos)
        table, stash, nb, cap = _cuckoo_decode(blob.tobytes())
        arr = hashes["url_hash"].to_numpy(dtype=np.int64)
        table, stash, removed = _cuckoo_delete(table, stash, nb, cap, arr)
        return pd.DataFrame(
            {
                "bucket": [key[0]],
                "filter_blob": [_cuckoo_encode(table, stash, nb, cap)],
                "n_items": [n - removed],
                "gen": [gen],
            }
        )

    return (
        seen_cuckoo.groupBy("bucket")
        .cogroup(hashed.groupBy("bucket"))
        .applyInPandas(merge, schema=schemas.SEEN_BLOOM)
    )


def probe_cuckoos(
    candidates: DataFrame,
    seen_cuckoo: DataFrame,
    n_buckets: int = DEFAULT_N_BUCKETS,
) -> DataFrame:
    """Cuckoo twin of probe_blooms: candidates(+url_hash) → + maybe_seen.
    maybe_seen=False is definitive (membership preserved through every
    relocation + exact stash); True rows take the exact anti-join."""
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
        table, stash, nb, cap = _cuckoo_decode(blob.tobytes())
        arr = cand["url_hash"].to_numpy(dtype=np.int64)
        return cand.assign(
            maybe_seen=_cuckoo_contains(table, stash, nb, cap, arr)
        )

    probed = (
        with_bucket.groupBy("__bucket")
        .cogroup(seen_cuckoo.groupBy("bucket"))
        .applyInPandas(probe, schema=out_schema)
    )
    return probed.select(*cols, "maybe_seen")


def filter_unseen(
    candidates: DataFrame,
    seen: DataFrame,
    seen_bloom: DataFrame | None,
    n_buckets: int = DEFAULT_N_BUCKETS,
    bits_per_bucket: int = DEFAULT_BITS_PER_BUCKET,
    kind: str = "bloom",
) -> DataFrame:
    """The dedup-visited operator (P4/J1): candidates not yet in the seen set.

    With a filter table: definitely-new rows bypass the join; maybe-seen rows
    take the exact left-anti join (on the already-computed 64-bit hash, with
    url equality re-check to make hash collisions harmless). ``kind``
    selects the probe backend for ``seen_bloom``: "bloom" (bit-array blobs,
    update_blooms) or "cuckoo" (fingerprint tables, update_cuckoos —
    supports deletion for recrawl/expiry).

    ``n_buckets``/``bits_per_bucket`` MUST match the parameters the blobs
    were built with (update_blooms) — a mismatch mis-addresses buckets/bits
    and silently breaks the no-false-negative invariant. (The cuckoo blob
    self-describes its inner geometry in its header, so only ``n_buckets``
    must agree.)
    """
    if seen_bloom is not None:
        if kind == "cuckoo":
            probed = probe_cuckoos(candidates, seen_bloom, n_buckets)
        else:
            probed = probe_blooms(candidates, seen_bloom, n_buckets, bits_per_bucket)
        fresh = probed.where(~F.col("maybe_seen")).drop("maybe_seen")
        maybe = probed.where(F.col("maybe_seen")).drop("maybe_seen")
        survivors = maybe.join(seen, on=["url_hash", "url"], how="left_anti")
        return fresh.unionByName(survivors)
    return candidates.join(seen, on=["url_hash", "url"], how="left_anti")
