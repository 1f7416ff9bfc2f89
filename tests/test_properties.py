"""Property-based tests (hypothesis): parser robustness, canonicalizer
idempotence, SQL-compiler consistency — all driver-independent (no Spark
session; these pin the pure-Python halves that both engines share)."""

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from goprowl_spark import search as S
from goprowl_spark.functions.urlnorm import canonicalize

token = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd"), max_codepoint=0x7F),
    min_size=1,
    max_size=8,
)
query_text = st.lists(
    st.one_of(
        token,
        st.just("AND"),
        st.just("NOT"),
        st.just("OR"),
        token.map(lambda t: f'"{t}'),
        token.map(lambda t: f'{t}"'),
        token.map(lambda t: f"{t}~2"),
        token.map(lambda t: f"title:{t}"),
        token.map(lambda t: f"{t}~"),
        st.just(":"),
        st.just("~"),
    ),
    max_size=8,
).map(" ".join)


@given(query_text)
@settings(max_examples=300, deadline=None)
def test_parser_never_crashes_and_terms_are_wellformed(q):
    terms = S.parse_query(q)
    for t in terms:
        assert isinstance(t.text, str)
        assert t.type in (S.SIMPLE, S.PHRASE, S.FUZZY)
        assert not (t.required and t.excluded)


@given(query_text)
@settings(max_examples=100, deadline=None)
def test_sql_compiler_matches_python_scoring(q):
    """The DuckDB SQL compiled from a query must score docs exactly like a
    direct Python evaluation of the reference semantics."""
    docs = [
        ("d1", "Alpha Beta", "gamma delta alpha"),
        ("d2", "beta", "ALPHA epsilon"),
        ("d3", "", "zz"),
    ]
    terms = S.parse_query(q)

    def py_score(title, content):
        score = 0.0
        for t in terms:
            if t.type == S.PHRASE:
                score += (3.0 if t.text in title else 0.0) + (
                    2.0 if t.text in content else 0.0
                )
            elif t.type == S.FUZZY:
                score += (2.0 if t.text in title else 0.0) + (
                    1.0 if t.text in content else 0.0
                )
            elif t.field == "title":
                score += 2.0 if t.text.lower() in title.lower() else 0.0
            elif t.field == "content":
                score += 1.0 if t.text.lower() in content.lower() else 0.0
            elif t.field:
                pass
            else:
                score += (2.0 if t.text.lower() in title.lower() else 0.0) + (
                    1.0 if t.text.lower() in content.lower() else 0.0
                )
        return score

    expected = sorted(
        [
            (d, py_score(t_, c))
            for d, t_, c in docs
            if py_score(t_, c) > 0
        ],
        key=lambda x: (-x[1], x[0]),
    )[:10]

    con = duckdb.connect()
    con.register("docs", pd.DataFrame(docs, columns=["doc_id", "title", "content"]))
    sql = S.search_oracle_sql(q, "docs", "doc_id", "title", "content")
    got = con.sql(sql).fetchall()
    assert [(d, s) for d, s in got] == expected


url_path = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Nd"), max_codepoint=0x7F),
    max_size=10,
)


@given(
    st.integers(0, 9),
    url_path,
    st.sampled_from(["", "#frag", "?q=1", "?q=1#f", ":443", ""]),
)
@settings(max_examples=200, deadline=None)
def test_canonicalize_idempotent(host_i, path, suffix):
    raw = f"https://H{host_i}.Test{':443' if suffix == ':443' else ''}/{path}{suffix if suffix != ':443' else ''}"
    once = canonicalize(raw, None)
    if once is not None:
        assert canonicalize(once, None) == once
        assert canonicalize(once, "https://other.test/base") == once  # absolute wins


# ---------------------------------------------------------------- cuckoo
# Kernel-level property tests (pure numpy, no Spark). Precise semantics of
# a DEDUPLICATING fingerprint filter: keys sharing a fingerprint and a
# candidate bucket are indistinguishable and may be served by ONE physical
# entry (an insert that finds its fingerprint already present is skipped).
# Deleting any member of such an ambiguity class removes the shared entry
# and can orphan the rest — in either direction (delete the donor, orphan
# the skipped key; delete the skipped key, orphan the donor). The pinned
# invariants: (a) with NO deletes, zero false negatives under any insert
# interleaving at any load; (b) after contract-honoring deletes, a false
# negative implies fingerprint+bucket ambiguity with some DELETED key.
# This is exactly why CrawlEngine.expire_urls rebuilds touched shards from
# the exact seen table instead of calling the O(expired) delete primitive.
# A companion test pins the non-contract caveat (deleting a never-inserted
# colliding key evicts a member).


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.tuples(st.booleans(), st.integers(min_value=-(2**62), max_value=2**62)),
        max_size=300,
    )
)
def test_cuckoo_kernel_random_ops_no_false_negatives(ops):
    import numpy as np

    from goprowl_spark import seen_filter
    from goprowl_spark.seen_filter import (
        _cuckoo_contains,
        _cuckoo_delete,
        _cuckoo_empty,
        _cuckoo_insert,
        _cuckoo_parts,
    )

    nb, cap = 16, 2  # tiny geometry so evictions, skips, and stash engage
    table, stash = _cuckoo_empty(nb, cap)
    live: list[int] = []
    deleted: list[int] = []
    # pin the slot-cap ceiling to the test geometry: auto-grow would
    # otherwise resize past the overload this test exists to exercise
    # (growth has its own property test below)
    old_max = seen_filter.CUCKOO_MAX_SLOT_CAP
    seen_filter.CUCKOO_MAX_SLOT_CAP = cap
    try:
        for is_insert, key in ops:
            if is_insert:
                arr = np.array([key], dtype=np.int64)
                table, stash, cap, _ = _cuckoo_insert(table, stash, nb, cap, arr)
                if key not in live:
                    live.append(key)
            elif live:
                # contract: delete only keys that were inserted — pick one
                # deterministically from the live set
                victim = live[key % len(live)]
                arr = np.array([victim], dtype=np.int64)
                table, stash, _ = _cuckoo_delete(table, stash, nb, cap, arr)
                live.remove(victim)
                deleted.append(victim)
    finally:
        seen_filter.CUCKOO_MAX_SLOT_CAP = old_max
    if not live:
        return
    probe = np.array(sorted(set(live)), dtype=np.int64)
    hits = _cuckoo_contains(table, stash, nb, cap, probe)
    missing = [int(k) for k, h in zip(probe, hits) if not h]
    if not deleted:
        assert not missing, f"false negatives with no deletes: {missing}"
        return

    def parts(k):
        fp, b1, b2 = _cuckoo_parts(np.array([k], dtype=np.int64), nb)
        return int(fp[0]), {int(b1[0]), int(b2[0])}

    for m in missing:
        mfp, mb = parts(m)
        assert any(
            dfp == mfp and (db & mb) for dfp, db in map(parts, deleted)
        ), (
            f"false negative {m} shares no fingerprint+bucket ambiguity "
            f"with any deleted key {deleted}"
        )


def test_cuckoo_kernel_noncontract_delete_caveat():
    """The documented reason deletes must go through the exact seen table:
    at nb=16, keys 7 and 0 share fingerprint 1 and their XOR bucket pairs
    coincide ({5,0} and {0,5}), so deleting never-inserted 0 evicts member
    7. This pins the caveat is REAL — the engine contract exists because
    of it. (The pair is derived from _cuckoo_parts' multiply-shift b1; the
    kernel asserts the collision still holds so a hash change re-derives
    it instead of silently passing.)"""
    import numpy as np

    from goprowl_spark.seen_filter import (
        _cuckoo_contains,
        _cuckoo_delete,
        _cuckoo_empty,
        _cuckoo_insert,
        _cuckoo_parts,
    )

    nb, cap = 16, 2
    member, intruder = 7, 0
    fp, b1, b2 = _cuckoo_parts(np.array([member, intruder], dtype=np.int64), nb)
    assert fp[0] == fp[1], "pair no longer collides — re-derive it"
    assert {int(b1[0]), int(b2[0])} & {int(b1[1]), int(b2[1])}

    table, stash = _cuckoo_empty(nb, cap)
    table, stash, cap, _ = _cuckoo_insert(
        table, stash, nb, cap, np.array([member], dtype=np.int64)
    )
    assert _cuckoo_contains(
        table, stash, nb, cap, np.array([member], dtype=np.int64)
    ).all()
    # the never-inserted intruder tests as member → delete evicts the member
    table, stash, removed = _cuckoo_delete(
        table, stash, nb, cap, np.array([intruder], dtype=np.int64)
    )
    assert removed == 1
    assert not _cuckoo_contains(
        table, stash, nb, cap, np.array([member], dtype=np.int64)
    ).any()


@settings(max_examples=25, deadline=None)
@given(st.integers(min_value=1, max_value=2000), st.integers(min_value=0, max_value=2**31))
def test_cuckoo_autogrow_preserves_membership(n, seed):
    """Inserting far past the initial capacity triggers the in-shard
    slot-cap grow (a membership-preserving reshape: bucket addressing
    depends only on the bucket count, and the stash drains back in).
    Invariants: zero false negatives at any load, slot cap stays a
    power of two at or below the ceiling, and below the ceiling the
    stash stays empty (everything fits in the grown table or is mid-
    eviction parked)."""
    import numpy as np

    from goprowl_spark.seen_filter import (
        CUCKOO_MAX_SLOT_CAP,
        _cuckoo_contains,
        _cuckoo_empty,
        _cuckoo_insert,
    )

    nb, cap = 16, 2  # 32 initial slots; n up to 62x capacity
    rng = np.random.default_rng(seed)
    keys = rng.integers(-(2**62), 2**62, size=n, dtype=np.int64)
    table, stash = _cuckoo_empty(nb, cap)
    # three batches of different sizes so growth happens mid-stream too
    for part in np.array_split(keys, 3):
        table, stash, cap, _ = _cuckoo_insert(table, stash, nb, cap, part)
    assert cap <= CUCKOO_MAX_SLOT_CAP and (cap & (cap - 1)) == 0
    hits = _cuckoo_contains(table, stash, nb, cap, np.unique(keys))
    assert hits.all(), "false negatives after auto-grow"


def test_cuckoo_overload_past_ceiling_bulk_stashes_exactly():
    """Past CUCKOO_MAX_SLOT_CAP the kernel must not degenerate into
    250-kick eviction walks per entry (the measured 15x crawl-wave
    cliff): the hopeless tail stashes in BULK, and membership stays
    exact. Ceiling pinned tiny so the test overloads instantly."""
    import numpy as np

    from goprowl_spark import seen_filter
    from goprowl_spark.seen_filter import (
        _cuckoo_contains,
        _cuckoo_empty,
        _cuckoo_insert,
    )

    nb, cap = 16, 2
    old_max = seen_filter.CUCKOO_MAX_SLOT_CAP
    seen_filter.CUCKOO_MAX_SLOT_CAP = 4  # capacity ceiling: 64 slots
    try:
        rng = np.random.default_rng(7)
        keys = rng.integers(-(2**62), 2**62, size=5000, dtype=np.int64)
        table, stash = _cuckoo_empty(nb, cap)
        table, stash, cap, _ = _cuckoo_insert(table, stash, nb, cap, keys)
        assert cap == 4
        assert len(stash) > 0  # the overload landed in the exact stash
        hits = _cuckoo_contains(table, stash, nb, cap, np.unique(keys))
        assert hits.all(), "false negatives in bulk-stash overload"
    finally:
        seen_filter.CUCKOO_MAX_SLOT_CAP = old_max


def test_cuckoo_inner_buckets_for_sizing():
    from goprowl_spark.seen_filter import (
        CUCKOO_INNER_BUCKETS,
        CUCKOO_SLOT_CAP,
        cuckoo_inner_buckets_for,
    )

    # small expectations keep the default geometry
    assert cuckoo_inner_buckets_for(100_000) == CUCKOO_INNER_BUCKETS
    # the bench scale that measured the 900s cliff: 20M urls over 64
    # shards must size so the load factor stays at or below target
    nb = cuckoo_inner_buckets_for(20_000_000, 64)
    assert (nb & (nb - 1)) == 0
    assert 20_000_000 / (64 * nb * CUCKOO_SLOT_CAP) <= 0.7
    # monotone in expected items
    assert cuckoo_inner_buckets_for(40_000_000, 64) >= nb
