"""Repetition-statistics operator vs a direct Python computation, including
the degenerate shapes (empty text, single token, all-one-token spam)."""

from collections import Counter

import pytest

from goprowl_spark.operators import textstats as T

DOCS = [
    (1, "spam spam spam spam spam spam"),              # one token repeated
    (2, "the cat sat on the mat the cat sat again"),   # partial repetition
    (3, "alpha beta gamma delta epsilon zeta"),         # no repetition
    (4, "go go go stop go go go stop go go"),
    (5, ""),                                            # empty
    (6, "single"),                                      # too short for any gram
    (7, "a b a b a b a b"),                             # alternating bigram spam
]


def py_stats(text: str):
    toks = [t for t in text.lower().split() if t]
    n = len(toks)
    out = {"n_tokens": n}
    for g, name in [(2, "bigram"), (3, "trigram")]:
        grams = [" ".join(toks[i : i + g]) for i in range(n - g + 1)]
        c = Counter(grams)
        total = sum(c.values())
        dup = sum(v for v in c.values() if v > 1)
        if name == "bigram":
            out["top_bigram_frac"] = (
                round(max(c.values()) * 2 / max(n, 1), 6) if c else 0.0
            )
            out["dup_bigram_frac"] = round(dup / max(total, 1), 6) if c else 0.0
        else:
            out["dup_trigram_frac"] = round(dup / max(total, 1), 6) if c else 0.0
    return out


@pytest.fixture(scope="module")
def rep_rows(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    return {r["doc_id"]: r for r in T.repetition_stats(df).collect()}


def test_repetition_stats_match_python(rep_rows):
    for doc_id, text in DOCS:
        want = py_stats(text)
        got = rep_rows[doc_id]
        assert got["n_tokens"] == want["n_tokens"], doc_id
        for k in ("top_bigram_frac", "dup_bigram_frac", "dup_trigram_frac"):
            assert got[k] == pytest.approx(want[k], abs=1e-9), (doc_id, k)


def test_repetition_flags_degenerate_docs(rep_rows):
    # the all-spam and alternating docs max out; clean prose does not
    assert rep_rows[1]["dup_bigram_frac"] == 1.0
    assert rep_rows[1]["dup_trigram_frac"] == 1.0
    assert rep_rows[7]["dup_bigram_frac"] == 1.0
    assert rep_rows[3]["dup_bigram_frac"] == 0.0
    assert rep_rows[3]["dup_trigram_frac"] == 0.0
    # short/empty docs are well-defined zeros, present in the output
    assert rep_rows[5]["n_tokens"] == 0
    assert rep_rows[5]["top_bigram_frac"] == 0.0
    assert rep_rows[6]["n_tokens"] == 1
    assert rep_rows[6]["dup_trigram_frac"] == 0.0


def test_repetition_stats_random_corpus(spark):
    """Randomized (fixed-seed) corpus over a tiny alphabet — forces heavy
    gram collisions, length edge cases, and whitespace mess; Spark must
    equal the Python twin on every row."""
    import random

    rng = random.Random(41)
    vocab = ["a", "bb", "ccc", "dd", "e"]
    docs = []
    for i in range(60):
        n = rng.randint(0, 12)
        toks = [rng.choice(vocab) for _ in range(n)]
        sep = rng.choice([" ", "  ", "\t", " \n "])
        docs.append((i, sep.join(toks)))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r for r in T.repetition_stats(df).collect()}
    assert set(got) == {i for i, _ in docs}
    for doc_id, text in docs:
        want = py_stats(text)
        assert got[doc_id]["n_tokens"] == want["n_tokens"], (doc_id, text)
        for k in ("top_bigram_frac", "dup_bigram_frac", "dup_trigram_frac"):
            assert got[doc_id][k] == pytest.approx(want[k], abs=1e-9), (
                doc_id, k, text,
            )
