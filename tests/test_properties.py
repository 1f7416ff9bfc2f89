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
