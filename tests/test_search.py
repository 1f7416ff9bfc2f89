"""Query parser + scoring tests, pinning the reference's quirks
(query.go:31-120, basic_search.go:242-302) and the DuckDB SQL compiler
parity."""

import duckdb
import pandas as pd
import pytest

from goprowl_spark import search as S


# ------------------------------------------------------------ parser

def test_parse_simple_terms():
    terms = S.parse_query("hello world")
    assert [(t.text, t.type) for t in terms] == [("hello", S.SIMPLE), ("world", S.SIMPLE)]


def test_parse_and_not_set_flags_only():
    terms = S.parse_query("foo AND bar NOT baz")
    assert [(t.text, t.required, t.excluded) for t in terms] == [
        ("foo", False, False),
        ("bar", True, False),
        ("baz", False, True),
    ]


def test_parse_trailing_operator_dropped():
    assert [t.text for t in S.parse_query("foo AND")] == ["foo"]
    assert [t.text for t in S.parse_query("NOT")] == []


def test_parse_operator_case_insensitive():
    terms = S.parse_query("and x not y")
    assert [(t.text, t.required, t.excluded) for t in terms] == [
        ("x", True, False),
        ("y", False, True),
    ]


def test_parse_phrase():
    terms = S.parse_query('"big data engine" rest')
    assert terms[0].type == S.PHRASE and terms[0].text == "big data engine"
    assert terms[1].text == "rest"


def test_parse_single_token_phrase_keeps_trailing_quote():
    # query.go:63-77 strips the closing quote only from APPENDED tokens
    terms = S.parse_query('"solo"')
    assert terms[0].type == S.PHRASE
    assert terms[0].text == 'solo"'


def test_parse_unterminated_phrase_consumes_rest():
    terms = S.parse_query('"a b c')
    assert terms[0].text == "a b c" and len(terms) == 1


def test_parse_fuzzy():
    t = S.parse_query("spark~2")[0]
    assert (t.text, t.type, t.fuzziness) == ("spark", S.FUZZY, 2)
    t = S.parse_query("spark~")[0]
    assert t.fuzziness == 1  # default
    t = S.parse_query("spark~x")[0]
    assert t.fuzziness == ord("x") - ord("0")  # byte-arithmetic quirk


def test_parse_field():
    t = S.parse_query("title:spark")[0]
    assert (t.field, t.text) == ("title", "spark")
    t = S.parse_query("a:b:c")[0]
    assert (t.field, t.text) == ("a", "b")  # extra segments dropped


def test_fuzzy_beats_field():
    t = S.parse_query("title:foo~2")[0]
    assert t.type == S.FUZZY and t.text == "title:foo"


# ------------------------------------------------------------ scoring

DOCS = [
    # (doc_id, title, content, doc_type)
    ("u1", "Spark Engine", "distributed data engine", "webpage"),
    ("u2", "spark notes", "Contains Spark Engine text", "webpage"),
    ("u3", "Other", "nothing relevant", "pdf"),
    ("u4", "Engine", "spark spark spark", "webpage"),
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(
        DOCS, "doc_id string, title string, content string, doc_type string"
    )


def score_of(rows, doc_id):
    for r in rows:
        if r["doc_id"] == doc_id:
            return r["score"]
    return None


def test_simple_term_weights(spark, docs_df):
    # simple term: lower(title) contains → +2, lower(content) contains → +1
    rows = S.search(docs_df, "spark", size=10).collect()
    assert score_of(rows, "u1") == 2.0  # title only
    assert score_of(rows, "u2") == 3.0  # title + content
    assert score_of(rows, "u4") == 1.0  # content only
    assert score_of(rows, "u3") is None  # score 0 filtered


def test_phrase_case_sensitive(spark, docs_df):
    # phrase: case-SENSITIVE contains, title +3 / content +2
    rows = S.search(docs_df, '"Spark Engine" zq', size=10).collect()
    assert score_of(rows, "u1") == 3.0  # title has exact case
    assert score_of(rows, "u2") == 2.0  # content has exact case
    assert score_of(rows, "u4") is None  # lowercase only → no match


def test_fuzzy_is_contains_with_fuzzy_weights(spark, docs_df):
    rows = S.search(docs_df, "spark~2", size=10).collect()
    # case-sensitive contains: u1 title 'Spark Engine' has no 'spark'
    assert score_of(rows, "u1") is None
    assert score_of(rows, "u2") == 2.0  # title 'spark notes'
    assert score_of(rows, "u4") == 1.0  # content


def test_field_scoped(spark, docs_df):
    rows = S.search(docs_df, "title:spark", size=10).collect()
    assert score_of(rows, "u1") == 2.0
    assert score_of(rows, "u4") is None  # title 'Engine' has no spark
    rows = S.search(docs_df, "content:spark", size=10).collect()
    assert score_of(rows, "u4") == 1.0
    rows = S.search(docs_df, "bogusfield:spark", size=10).collect()
    assert rows == []  # unknown field scores 0


def test_and_not_unenforced_by_default(spark, docs_df):
    # Q2/Q3 quirk: flags never consulted → NOT term still scores positively
    rows = S.search(docs_df, "spark NOT engine", size=10).collect()
    assert score_of(rows, "u1") == 2.0 + 3.0  # spark(title) + engine(t+c)


def test_strict_mode_enforces_not(spark, docs_df):
    rows = S.search(docs_df, "spark NOT nothing", strict=True, size=10).collect()
    assert score_of(rows, "u3") is None
    assert {r["doc_id"] for r in rows} == {"u1", "u2", "u4"}


def test_type_filter(spark, docs_df):
    rows = S.search(docs_df, "nothing", filters={"type": "pdf"}, size=10).collect()
    assert [r["doc_id"] for r in rows] == ["u3"]
    rows = S.search(docs_df, "nothing", filters={"type": "webpage"}, size=10).collect()
    assert rows == []


def test_pagination_deterministic(spark, docs_df):
    all_rows = S.search(docs_df, "spark engine", size=10).collect()
    ids = [r["doc_id"] for r in all_rows]
    p1 = [r["doc_id"] for r in S.search(docs_df, "spark engine", page=1, size=2).collect()]
    p2 = [r["doc_id"] for r in S.search(docs_df, "spark engine", page=2, size=2).collect()]
    assert p1 == ids[:2] and p2 == ids[2:4]
    # ties broken by doc_id ascending
    scores = [r["score"] for r in all_rows]
    assert scores == sorted(scores, reverse=True)


def test_facets(spark, docs_df):
    got = {r["value"]: r["count"] for r in S.facets(docs_df).collect()}
    assert got == {"webpage": 3, "pdf": 1}


def test_sql_compiler_matches_spark(spark, docs_df):
    """The DuckDB SQL compiled from the same QueryTerm IR must rank
    identically (this is what the driver's correctness gate exercises)."""
    pdf = pd.DataFrame(DOCS, columns=["doc_id", "title", "content", "doc_type"])
    con = duckdb.connect()
    con.register("docs", pdf)
    for q in ["spark", '"Spark Engine" zq', "title:spark engine", "spark NOT engine", "spark~1 data"]:
        sql = S.search_oracle_sql(q, "docs", "doc_id", "title", "content", size=10)
        oracle = con.sql(sql).fetchall()
        got = [
            (r["doc_id"], r["score"])
            for r in S.search(docs_df, q, size=10).collect()
        ]
        assert got == oracle, q


# ------------------------------------------------------------ processor mode

def test_processor_mode_skips_or():
    # processor.go:54-55 consumes OR; the wired-in query.go treats it as a term
    legacy = [t.text for t in S.parse_query("a OR b")]
    proc = [t.text for t in S.parse_query("a OR b", processor=True)]
    assert legacy == ["a", "OR", "b"]
    assert proc == ["a", "b"]


def test_processor_mode_keeps_other_syntax():
    terms = S.parse_query('x AND y "p q" f~2 title:z', processor=True)
    assert [t.text for t in terms] == ["x", "y", "p q", "f", "z"]
    assert terms[1].required and terms[2].type == S.PHRASE
    assert terms[3].type == S.FUZZY and terms[4].field == "title"


def test_boost_multiplies_score(spark):
    docs = spark.createDataFrame(
        [("d1", "spark title", "body"), ("d2", "other", "spark body")],
        "doc_id string, title string, content string",
    )
    base = S.parse_query("spark")
    boosted = S.parse_query("spark")
    boosted[0].boost = 3.0
    s1 = {r["doc_id"]: r["score"] for r in S.search(docs, "", terms=base).collect()}
    s3 = {r["doc_id"]: r["score"] for r in S.search(docs, "", terms=boosted).collect()}
    assert s3 == {k: 3.0 * v for k, v in s1.items()}


def test_boost_sql_parity():
    terms = S.parse_query("spark data", processor=True)
    terms[0].boost = 2.5
    sql = S.compile_score_sql(terms, "title", "content")
    assert "* 2.5" in sql and "data" in sql


def test_strict_mode_fuzzy_is_real_levenshtein(spark, docs_df):
    """Q6 strict path: '~N' means token edit distance ≤ N (case-insensitive)
    in strict mode — while the default stays the reference's bug-compatible
    case-sensitive contains that ignores the fuzziness entirely."""
    # 'spork' is distance 1 from token 'spark': no contains-match anywhere
    assert S.search(docs_df, "spork~1", size=10).collect() == []
    rows = S.search(docs_df, "spork~1", strict=True, size=10).collect()
    # u1 title token 'Spark' (ci) → +2; u2 title → +2 and content 'Spark' → +1
    assert score_of(rows, "u1") == 2.0
    assert score_of(rows, "u2") == 3.0
    assert score_of(rows, "u4") == 1.0  # content tokens only
    # distance 2 needed for 'sprk' vs 'spark'? no — 'sprk'→'spark' is 1 insert
    rows = S.search(docs_df, "sprke~1", strict=True, size=10).collect()
    assert rows == []  # 'sprke' is distance 2 from 'spark'
    rows = S.search(docs_df, "sprke~2", strict=True, size=10).collect()
    assert score_of(rows, "u2") == 3.0
