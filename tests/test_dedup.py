"""Dedup operators: exact, n-gram Jaccard (vs a direct Python computation),
MinHash-LSH (no false positives, measured recall), SimHash blocking
(pigeonhole completeness within the Hamming ball)."""

import itertools

import pytest
from pyspark.sql import functions as F

from goprowl_spark.operators import dedup as D

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox jumps over the lazy dog"),          # exact dup of 1
    (3, "the quick brown fox leaps over the lazy dog"),          # near dup
    (4, "completely different text about spark pipelines here"),
    (5, "the quick brown fox jumps over a lazy dog today"),      # near dup
    (6, "completely different text about flink pipelines here"),  # near of 4
    (7, "one two three four five six seven"),
    (8, "THE QUICK BROWN FOX JUMPS OVER THE LAZY DOG"),          # case dup of 1
]


def py_shingles(text: str, n: int = 3) -> set[str]:
    toks = text.lower().split()
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def py_jaccard(a: str, b: str, n: int = 3) -> float:
    sa, sb = py_shingles(a, n), py_shingles(b, n)
    if not sa and not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_exact_dedup(spark, docs_df):
    rows = D.exact_dedup(docs_df).collect()
    keep = {r["keep_id"]: r["dup_count"] for r in rows}
    assert keep[1] == 2  # docs 1,2 identical; 8 differs by case
    assert 2 not in keep
    assert sum(keep.values()) == len(DOCS)


def test_jaccard_pairs_match_python(spark, docs_df):
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in D.jaccard_pairs(docs_df, threshold=0.2).collect()
    }
    exp = {}
    for (ia, ta), (ib, tb) in itertools.combinations(DOCS, 2):
        j = py_jaccard(ta, tb)
        if j >= 0.2:
            exp[(min(ia, ib), max(ia, ib))] = j
    assert set(got) == set(exp)
    for k in exp:
        assert got[k] == pytest.approx(exp[k])
    # case-normalized: 1 vs 8 are identical after lower() → jaccard 1.0
    assert got[(1, 8)] == 1.0


def test_minhash_lsh_no_false_positives_and_sane_recall(spark, docs_df):
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in D.minhash_lsh_pairs(docs_df, threshold=0.3).collect()
    }
    exact = {
        (min(a, b), max(a, b)): py_jaccard(ta, tb)
        for (a, ta), (b, tb) in itertools.combinations(DOCS, 2)
        if py_jaccard(ta, tb) >= 0.3
    }
    # verification step guarantees: no pair below threshold
    for k, j in got.items():
        assert j >= 0.3
        assert k in exact
        assert j == pytest.approx(exact[k])
    # high-similarity pairs must be recalled (identical docs always collide)
    assert (1, 2) in got and (1, 8) in got and (2, 8) in got


def test_simhash_identical_docs_equal_hash(spark, docs_df):
    sh = {r["doc_id"]: r["simhash"] for r in D.simhash_df(docs_df).collect()}
    assert sh[1] == sh[2] == sh[8]
    assert sh[1] != sh[4]


def test_simhash_pairs_blocking_complete(spark, docs_df):
    """Blocked join must find ALL pairs within the Hamming ball (pigeonhole:
    ≤3 differing bits across 4 blocks → one block equal)."""
    sh = {r["doc_id"]: r["simhash"] for r in D.simhash_df(docs_df).collect()}
    max_h = 6  # blocks guarantee completeness only ≤3, test with 3
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in D.simhash_pairs(docs_df, max_hamming=3).collect()
    }
    for (a, b) in itertools.combinations(sorted(sh), 2):
        h = bin((sh[a] ^ sh[b]) & ((1 << 64) - 1)).count("1")
        if h <= 3:
            assert (a, b) in got and got[(a, b)] == h
    for (a, b), h in got.items():
        assert h <= 3


# ------------------------------------------------------- substring dedup

def py_windows(text: str, k: int) -> list[str]:
    toks = [t for t in text.lower().split() if t]
    return [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]


def test_duplicated_windows_match_python(spark, docs_df):
    """duplicated_windows(k=5) equals a direct Python sweep: same set of
    cross-document 5-token spans, same doc/occurrence counts; the shared
    'quick brown fox ... lazy dog' spans of docs 1/2/8 surface, doc 7
    (7 tokens, unique) contributes nothing duplicated."""
    import hashlib
    from collections import defaultdict

    k = 5
    by_hash: dict[str, list[int]] = defaultdict(list)
    for doc_id, text in DOCS:
        for w in py_windows(text, k):
            by_hash[hashlib.md5(w.encode()).hexdigest()].append(doc_id)
    expect = {
        h: (len(set(ids)), len(ids))
        for h, ids in by_hash.items()
        if len(set(ids)) > 1
    }
    got = {
        r["whash"]: (r["n_docs"], r["n_occurrences"])
        for r in D.duplicated_windows(docs_df, k=k).collect()
    }
    assert got == expect
    assert got, "fixture must actually contain cross-doc duplicate spans"


def test_doc_dup_window_frac_matches_python(spark, docs_df):
    k = 5
    dup_hashes = {
        r["whash"] for r in D.duplicated_windows(docs_df, k=k).collect()
    }
    import hashlib

    rows = {r["doc_id"]: r for r in D.doc_dup_window_frac(docs_df, k=k).collect()}
    assert set(rows) == {d for d, _ in DOCS}
    for doc_id, text in DOCS:
        ws = py_windows(text, k)
        dups = sum(
            1 for w in ws
            if hashlib.md5(w.encode()).hexdigest() in dup_hashes
        )
        r = rows[doc_id]
        assert r["n_windows"] == len(ws)
        assert r["dup_windows"] == dups
        want = round(dups / max(len(ws), 1), 6) if ws else 0.0
        assert r["dup_window_frac"] == pytest.approx(want, abs=1e-9)


def test_doc_shorter_than_window_reports_zero(spark):
    df = spark.createDataFrame(
        [(1, "just three tokens"), (2, "a b c d e f g h i j")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in D.doc_dup_window_frac(df, k=8).collect()}
    assert rows[1]["n_windows"] == 0
    assert rows[1]["dup_window_frac"] == 0.0
    assert rows[2]["n_windows"] == 3


def test_decontaminate_exact_fractions(spark):
    """Handcrafted eval overlap: a doc that IS eval text scores 1.0, a doc
    sharing exactly one k-window scores 1/n_windows, a clean doc scores
    0.0, and a doc shorter than k tokens reports zero windows."""
    from goprowl_spark.operators.dedup import decontaminate

    k = 4
    eval_text = "alpha beta gamma delta epsilon"  # windows: 2 (5 tokens, k=4)
    train = spark.createDataFrame(
        [
            (1, eval_text),                                   # leaked verbatim
            (2, "zero one alpha beta gamma delta two three"), # shares 1 window
            (3, "totally clean text with no overlap here"),
            (4, "too short"),                                 # < k tokens
        ],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame([(100, eval_text)], "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_windows"], r["eval_windows"], r["contamination_frac"])
        for r in decontaminate(train, ev, k=k).collect()
    }
    assert got[1] == (2, 2, 1.0)
    # doc 2: tokens 8 -> 5 windows; exactly one ("alpha beta gamma delta")
    assert got[2] == (5, 1, 0.2)
    assert got[3] == (4, 0, 0.0)  # 7 tokens -> 4 windows, none shared
    assert got[4] == (0, 0, 0.0)
