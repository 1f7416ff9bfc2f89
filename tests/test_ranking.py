"""TF-IDF / BM25 golden tests vs a direct Python re-derivation of the
reference formulas (indexer.go:59-100, ranker.go:14-41), plus DuckDB SQL
oracle parity."""

import math

import duckdb
import pandas as pd
import pytest

from goprowl_spark import ranking as R

DOCS = [
    ("d1", "spark makes big data simple"),
    ("d2", "spark spark spark everywhere"),
    ("d3", "data pipelines move data"),
    ("d4", "nothing to see here at all"),
    ("d5", "big data big compute big results"),
    ("d6", "simple spark data"),
    ("d7", "one two three four five six seven eight nine ten"),
    ("d8", "spark data spark data"),
    ("d9", "unrelated words only"),
    ("d10", "big spark"),
]


def py_tfidf(query: str) -> dict[str, float]:
    """Direct port of indexer.Search semantics for the golden check."""
    docs = {d: t.lower().split() for d, t in DOCS}
    index: dict[str, dict[str, int]] = {}
    for d, toks in docs.items():
        for t in toks:
            index.setdefault(t, {}).setdefault(d, 0)
            index[t][d] += 1
    n = len(docs)
    scores: dict[str, float] = {}
    for term in query.lower().split():
        if term not in index:
            continue
        idf = 1.0 + n // len(index[term])  # integer division quirk
        for d, tf in index[term].items():
            scores[d] = scores.get(d, 0.0) + (tf / len(docs[d])) * idf
    return scores


def py_bm25(query: str) -> dict[str, float]:
    docs = {d: t.lower().split() for d, t in DOCS}
    index: dict[str, dict[str, int]] = {}
    for d, toks in docs.items():
        for t in toks:
            index.setdefault(t, {}).setdefault(d, 0)
            index[t][d] += 1
    n = len(docs)
    avgdl = sum(len(t) for t in docs.values()) / n
    scores: dict[str, float] = {}
    for term in query.lower().split():
        if term not in index:
            continue
        df = len(index[term])
        idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
        for d, tf in index[term].items():
            dl = len(docs[d])
            s = idf * (tf * (R.K1 + 1)) / (tf + R.K1 * (1 - R.B + R.B * dl / avgdl))
            scores[d] = scores.get(d, 0.0) + s
    return scores


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id string, content string")


@pytest.fixture(scope="module")
def index(spark, docs_df):
    return R.build_postings(docs_df), R.build_doc_stats(docs_df)


def test_integer_division_idf_quirk():
    # N=10 docs; 'big' appears in d1,d5,d10 → df=3 → idf = 1 + 10//3 = 4.0
    scores = py_tfidf("big")
    assert scores["d10"] == (1 / 2) * 4.0


def test_postings_and_doc_stats(spark, index):
    postings, stats = index
    p = {(r["term"], r["doc_id"]): r["tf"] for r in postings.collect()}
    assert p[("spark", "d2")] == 3
    assert p[("data", "d8")] == 2
    s = {r["doc_id"]: r["doc_len"] for r in stats.collect()}
    assert s["d7"] == 10 and s["d2"] == 4


@pytest.mark.parametrize("query", ["spark data", "big", "spark spark", "missing term", "big data spark"])
def test_tfidf_matches_reference_semantics(spark, docs_df, index, query):
    postings, stats = index
    got = {
        r["doc_id"]: r["score"]
        for r in R.tfidf_scores(spark, postings, stats, len(DOCS), query).collect()
    }
    exp = py_tfidf(query)
    assert set(got) == set(exp)
    for d in exp:
        assert got[d] == pytest.approx(exp[d], rel=1e-12), d


@pytest.mark.parametrize("query", ["spark data", "big", "spark spark"])
def test_bm25_matches_reference_semantics(spark, docs_df, index, query):
    postings, stats = index
    got = {
        r["doc_id"]: r["score"]
        for r in R.bm25_scores(spark, postings, stats, len(DOCS), query).collect()
    }
    exp = py_bm25(query)
    assert set(got) == set(exp)
    for d in exp:
        assert got[d] == pytest.approx(exp[d], rel=1e-12), d


def test_bm25_boost_multiplies(spark, docs_df, index):
    postings, stats = index
    base = {
        r["doc_id"]: r["score"]
        for r in R.bm25_scores(spark, postings, stats, len(DOCS), "spark").collect()
    }
    boosted = {
        r["doc_id"]: r["score"]
        for r in R.bm25_scores(
            spark, postings, stats, len(DOCS), "spark", boost=2.5
        ).collect()
    }
    for d in base:
        assert boosted[d] == pytest.approx(base[d] * 2.5)


def test_sql_oracles_match_spark(spark, docs_df, index):
    postings, stats = index
    pdf = pd.DataFrame(DOCS, columns=["doc_id", "content"])
    con = duckdb.connect()
    con.register("docs", pdf)
    for query in ["spark data", "big data spark"]:
        sql = R.tfidf_oracle_sql("docs", "doc_id", "content", query)
        oracle = dict(con.sql(sql).fetchall())
        got = {
            r["doc_id"]: round(r["score"], 4)
            for r in R.tfidf_scores(spark, postings, stats, len(DOCS), query).collect()
        }
        assert got == pytest.approx(oracle)
        sql = R.bm25_oracle_sql("docs", "doc_id", "content", query)
        oracle = dict(con.sql(sql).fetchall())
        got = {
            r["doc_id"]: round(r["score"], 4)
            for r in R.bm25_scores(spark, postings, stats, len(DOCS), query).collect()
        }
        assert got == pytest.approx(oracle)


def test_bm25_batch_matches_single_queries(spark):
    from goprowl_spark import ranking as R

    docs = spark.createDataFrame(
        [
            (1, "spark data join hash"),
            (2, "data data window scan"),
            (3, "hash batch title spark spark"),
            (4, "window title scan scan data"),
        ],
        "doc_id long, text string",
    )
    postings = R.build_postings(docs, text_col="text")
    stats = R.build_doc_stats(docs, text_col="text")
    queries = {"a": "spark data", "b": "data window", "c": "hash"}
    batch = {
        (r["query_id"], r["doc_id"]): round(r["score"], 6)
        for r in R.bm25_scores_batch(spark, postings, stats, 4, queries).collect()
    }
    for qid, q in queries.items():
        single = {
            (qid, r["doc_id"]): round(r["score"], 6)
            for r in R.bm25_scores(spark, postings, stats, 4, q).collect()
        }
        for k, v in single.items():
            assert batch[k] == v, k
    assert len(batch) == sum(
        1
        for qid, q in queries.items()
        for _ in R.bm25_scores(spark, postings, stats, 4, q).collect()
    )


def test_fused_docs_scorers_match_classic_paths(spark, docs_df):
    """r6 optimization pin: the fused single-pass scorers (one tokenize
    Generate carrying doc_len, in-plan count/avgdl) must reproduce the
    classic postings+doc_stats pipeline bit-for-bit, for int and in-plan
    (count_df) total_docs alike."""
    postings = R.build_postings(docs_df)
    stats = R.build_doc_stats(docs_df)
    queries = {"a": "spark data", "b": "big simple", "c": "spark spark ten"}
    for q in ["spark data", "spark spark big", "missingterm", "ten big data"]:
        classic_t = {
            r["doc_id"]: round(r["score"], 9)
            for r in R.tfidf_scores(spark, postings, stats, len(DOCS), q).collect()
        }
        classic_b = {
            r["doc_id"]: round(r["score"], 9)
            for r in R.bm25_scores(spark, postings, stats, len(DOCS), q).collect()
        }
        for total in (len(DOCS), R.count_df(docs_df)):
            fused_t = {
                r["doc_id"]: round(r["score"], 9)
                for r in R.tfidf_scores_docs(spark, docs_df, total, q).collect()
            }
            fused_b = {
                r["doc_id"]: round(r["score"], 9)
                for r in R.bm25_scores_docs(spark, docs_df, total, q).collect()
            }
            assert fused_t == classic_t, q
            assert fused_b == classic_b, q
    classic_tb = {
        (r["query_id"], r["doc_id"]): round(r["score"], 9)
        for r in R.tfidf_scores_batch(
            spark, postings, stats, len(DOCS), queries
        ).collect()
    }
    classic_bb = {
        (r["query_id"], r["doc_id"]): round(r["score"], 9)
        for r in R.bm25_scores_batch(
            spark, postings, stats, len(DOCS), queries
        ).collect()
    }
    fused_tb = {
        (r["query_id"], r["doc_id"]): round(r["score"], 9)
        for r in R.tfidf_scores_batch_docs(
            spark, docs_df, R.count_df(docs_df), queries
        ).collect()
    }
    fused_bb = {
        (r["query_id"], r["doc_id"]): round(r["score"], 9)
        for r in R.bm25_scores_batch_docs(
            spark, docs_df, R.count_df(docs_df), queries
        ).collect()
    }
    assert fused_tb == classic_tb
    assert fused_bb == classic_bb
