"""Inverted-index postings + TF-IDF / BM25 ranking (SURVEY.md §2.4/§2.8).

Reference: the in-memory InvertedIndex (search/engine/indexer/indexer.go:
10-18) — ``map[term]map[docID]tf`` + doc lengths — becomes two DataFrames
(postings, doc_stats) built with explode + groupBy: partial (map-side)
aggregation makes this a single shuffle at any scale.

Scorers are closed-form Column algebra over the postings join — no UDFs:

* :func:`tfidf_scores` is bug-compatible with indexer.Search
  (indexer.go:59-83): tokenized query terms keep their multiplicity,
  tf is length-normalized, and IDF uses the reference's *integer division*
  ``1.0 + totalDocs/docsWithTerm`` (indexer.go:98-100 — e.g. N=10, df=3
  → 1+3=4.0, not 1+3.33);
* :func:`bm25_scores` implements Ranker.Score (search/engine/ranking/
  ranker.go:14-41): idf = ln(1+(N-df+0.5)/(df+0.5)), k1=1.2, b=0.75,
  with the boost product applied as a plain multiply (BoostScore,
  ranker.go:35-41).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

K1 = 1.2  # ranker.go:16
B = 0.75  # ranker.go:17


def tokenize(text: str) -> list[str]:
    """Reference tokenizer (indexer.go:93-96): lowercase + whitespace split."""
    return text.lower().split()


def tokens_col(col):
    """The same tokenizer as a Column expression (F3: split+lower)."""
    return F.filter(F.split(F.lower(col), r"\s+"), lambda t: t != F.lit(""))


def build_postings(
    documents: DataFrame, id_col: str = "doc_id", text_col: str = "content"
) -> DataFrame:
    """term → (doc, tf) postings (A3; IndexDocument indexer.go:30-57).

    Deliberately does NOT repartition its input: it runs inside the crawl
    tail write (crawl.py), where an injected exchange would change the
    round's tuned shuffle structure. Callers feeding it a narrow raw scan
    (single small parquet file) should spread it first — see
    session.spread_narrow_scan and contract._docs_spread."""
    return (
        documents.select(
            F.col(id_col).alias("doc_id"),
            F.explode(tokens_col(F.col(text_col))).alias("term"),
        )
        .groupBy("term", "doc_id")
        .agg(F.count("*").alias("tf"))
    )


def build_doc_stats(
    documents: DataFrame, id_col: str = "doc_id", text_col: str = "content"
) -> DataFrame:
    """doc → token count (A4; indexer.go:39-46)."""
    return documents.select(
        F.col(id_col).alias("doc_id"),
        F.size(tokens_col(F.col(text_col))).cast("long").alias("doc_len"),
    )


def _query_terms_df(spark: SparkSession, query: str) -> DataFrame:
    """Query tokens with multiplicity (the reference loops raw tokens, so a
    repeated term scores twice — indexer.go:66)."""
    toks = tokenize(query)
    counts: dict[str, int] = {}
    for t in toks:
        counts[t] = counts.get(t, 0) + 1
    return spark.createDataFrame(
        [(t, n) for t, n in counts.items()], "term string, mult long"
    )


def _pushdown_query_terms(postings: DataFrame, terms: list[str]) -> DataFrame:
    """Redundant literal IN-list predicate on ``term`` — a pure plan hint.

    The broadcast semi-join that slices postings to the query terms cannot
    be pushed below ``build_postings``'s groupBy by Catalyst (joins do not
    move through aggregates), so without this the tf aggregation shuffles
    the ENTIRE exploded vocabulary before the slice. A literal IN filter on
    a grouping column IS pushed through the aggregate down to the exploded
    tokens, shrinking that shuffle from every token in the corpus to just
    the query terms' postings (measured 6.6 s → 1.4 s on the sf0.1
    tfidf_search headline, bit-identical output). Semantically a no-op:
    the same term set is re-joined immediately after for multiplicities,
    and df(t) windows over the identical slice either way."""
    if not terms:
        return postings
    return postings.where(F.col("term").isin(terms))


def _fused_query_postings(
    documents: DataFrame,
    terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "content",
) -> DataFrame:
    """(doc_id, doc_len, term, tf) for the query terms only, in ONE
    tokenize pass over the corpus (guide §1.2 step 1 / §2.3).

    The separate build_postings + build_doc_stats + doc_stats-join shape
    tokenizes the corpus once per branch (three scan+regex passes for a
    BM25 query, plus a doc_id join); carrying doc_len through the explode
    collapses all of it into one Generate and removes the doc_stats join
    outright — the aggregation key gains ``doc_len``, which is functionally
    dependent on doc_id, so (term, doc_id, tf) groups are identical.
    The literal IN filter on ``term`` prunes the exploded stream before the
    partial aggregation exactly like _pushdown_query_terms."""
    toks = documents.select(
        F.col(id_col).alias("doc_id"),
        tokens_col(F.col(text_col)).alias("__toks"),
    )
    exploded = toks.select(
        "doc_id",
        F.size("__toks").cast("long").alias("doc_len"),
        F.explode("__toks").alias("term"),
    )
    if terms:
        exploded = exploded.where(F.col("term").isin(terms))
    return exploded.groupBy("doc_id", "doc_len", "term").agg(
        F.count("*").alias("tf")
    )


def _total_docs_expr(base, total_docs):
    """``total_docs`` as an in-plan double: an int becomes a literal; a
    1-row DataFrame with column ``_n`` rides a broadcast cross join (one
    fewer blocking count job per query — the count becomes a parallel
    broadcast stage inside the main execution)."""
    if isinstance(total_docs, DataFrame):
        return base.crossJoin(F.broadcast(total_docs)), F.col("_n")
    return base, F.lit(float(total_docs))


def count_df(documents: DataFrame) -> DataFrame:
    """1-row (_n double) corpus count for :func:`_total_docs_expr`."""
    return documents.agg(F.count("*").cast("double").alias("_n"))


def tfidf_scores_docs(
    spark: SparkSession,
    documents: DataFrame,
    total_docs,
    query: str,
    id_col: str = "doc_id",
    text_col: str = "content",
) -> DataFrame:
    """:func:`tfidf_scores` computed straight from the documents table via
    the fused single-pass postings (same scores, same order; equivalence
    pinned against the unchanged DuckDB oracle)."""
    terms = _query_terms_df(spark, query)
    qpost = _fused_query_postings(
        documents, list(dict.fromkeys(tokenize(query))), id_col, text_col
    ).join(F.broadcast(terms), "term")
    df_col = F.count("*").over(Window.partitionBy("term"))
    qpost, n = _total_docs_expr(qpost, total_docs)
    idf = 1.0 + F.floor(n / F.col("df"))
    scored = (
        qpost.withColumn("df", df_col)
        .select(
            "doc_id",
            (
                F.col("mult")
                * (F.col("tf").cast("double") / F.col("doc_len"))
                * idf
            ).alias("term_score"),
        )
        .groupBy("doc_id")
        .agg(F.sum("term_score").alias("score"))
    )
    return scored.orderBy(F.col("score").desc(), F.col("doc_id").asc())


def bm25_scores_docs(
    spark: SparkSession,
    documents: DataFrame,
    total_docs,
    query: str,
    boost: float = 1.0,
    id_col: str = "doc_id",
    text_col: str = "content",
) -> DataFrame:
    """:func:`bm25_scores` from the documents table via the fused
    single-pass postings. avgdl stays in-plan (broadcast 1-row cross join)
    and aggregates over the SAME spread scan subtree as the postings pass,
    so AQE reuses one shuffle for both branches instead of re-tokenizing
    per branch."""
    terms = _query_terms_df(spark, query)
    qpost = _fused_query_postings(
        documents, list(dict.fromkeys(tokenize(query))), id_col, text_col
    ).join(F.broadcast(terms), "term")
    df_col = F.count("*").over(Window.partitionBy("term"))
    avgdl = documents.agg(
        F.coalesce(
            F.avg(F.size(tokens_col(F.col(text_col)))), F.lit(0.0)
        ).alias("_avgdl")
    )
    base = qpost.withColumn("df", df_col).crossJoin(F.broadcast(avgdl))
    base, n = _total_docs_expr(base, total_docs)
    idf = F.log(1 + (n - F.col("df") + 0.5) / (F.col("df") + 0.5))
    tf = F.col("tf").cast("double")
    denom = tf + K1 * (1 - B + B * F.col("doc_len") / F.col("_avgdl"))
    scored = (
        base.select(
            "doc_id",
            (F.col("mult") * idf * (tf * (K1 + 1)) / denom).alias("term_score"),
        )
        .groupBy("doc_id")
        .agg((F.sum("term_score") * F.lit(boost)).alias("score"))
    )
    return scored.orderBy(F.col("score").desc(), F.col("doc_id").asc())


def tfidf_scores(
    spark: SparkSession,
    postings: DataFrame,
    doc_stats: DataFrame,
    total_docs: int,
    query: str,
) -> DataFrame:
    """indexer.Search (indexer.go:59-83), distributed:

    score(d) = Σ_t mult(t) · (tf(t,d)/len(d)) · (1.0 + N intdiv df(t))

    The tiny query-term side broadcasts (J4); doc_stats joins on doc_id
    (J5). Result: (doc_id, score) sorted desc with deterministic tie-break.
    """
    terms = _query_terms_df(spark, query)
    # Semi-join FIRST: document frequency is computed over only the
    # postings of the few query terms, not the full vocabulary. df(t) is a
    # COUNT window over the slice — postings rows are unique per
    # (term, doc), so count == countDistinct — which keeps the postings
    # subtree evaluated ONCE (a groupBy+self-join would build it twice).
    qpost = _pushdown_query_terms(
        postings, list(dict.fromkeys(tokenize(query)))
    ).join(F.broadcast(terms), "term")
    df_col = F.count("*").over(Window.partitionBy("term"))
    idf = 1.0 + F.floor(F.lit(float(total_docs)) / F.col("df"))
    scored = (
        qpost.withColumn("df", df_col)
        .join(doc_stats, "doc_id")
        .select(
            "doc_id",
            (
                F.col("mult")
                * (F.col("tf").cast("double") / F.col("doc_len"))
                * idf
            ).alias("term_score"),
        )
        .groupBy("doc_id")
        .agg(F.sum("term_score").alias("score"))
    )
    return scored.orderBy(F.col("score").desc(), F.col("doc_id").asc())


def bm25_scores(
    spark: SparkSession,
    postings: DataFrame,
    doc_stats: DataFrame,
    total_docs: int,
    query: str,
    boost: float = 1.0,
    avgdl: float | None = None,
) -> DataFrame:
    """Ranker.Score summed over query terms (ranker.go:22-41). Pass a
    precomputed ``avgdl`` (a per-snapshot corpus stat) to avoid the
    doc_stats scan per query — engine.search_ranked caches it. Without
    one, avgdl is computed IN-PLAN (a broadcast 1-row cross join, the
    same shape as the oracle's avg_len CTE) rather than as a separate
    collect job, so a cold call is still one Spark job."""
    terms = _query_terms_df(spark, query)
    # Same semi-join-first + count-window + IN-pushdown shape as
    # tfidf_scores.
    qpost = _pushdown_query_terms(
        postings, list(dict.fromkeys(tokenize(query)))
    ).join(F.broadcast(terms), "term")
    df_col = F.count("*").over(Window.partitionBy("term"))
    base = qpost.withColumn("df", df_col).join(doc_stats, "doc_id")
    if avgdl is None:
        avgdl_expr = F.col("_avgdl")
        base = base.crossJoin(
            F.broadcast(
                doc_stats.agg(
                    F.coalesce(F.avg("doc_len"), F.lit(0.0)).alias("_avgdl")
                )
            )
        )
    else:
        avgdl_expr = F.lit(float(avgdl))
    n = F.lit(float(total_docs))
    idf = F.log(1 + (n - F.col("df") + 0.5) / (F.col("df") + 0.5))
    tf = F.col("tf").cast("double")
    denom = tf + K1 * (1 - B + B * F.col("doc_len") / avgdl_expr)
    scored = (
        base
        .select(
            "doc_id",
            (F.col("mult") * idf * (tf * (K1 + 1)) / denom).alias("term_score"),
        )
        .groupBy("doc_id")
        .agg((F.sum("term_score") * F.lit(boost)).alias("score"))
    )
    return scored.orderBy(F.col("score").desc(), F.col("doc_id").asc())


# ------------------------------------------------------------ sql oracles

def postings_sql(table: str, id_col: str, text_col: str) -> str:
    return f"""
SELECT term, doc_id, count(*) AS tf
FROM (
  SELECT {id_col} AS doc_id,
         unnest(regexp_split_to_array(lower({text_col}), '\\s+')) AS term
  FROM {table}
)
WHERE term <> ''
GROUP BY term, doc_id
"""


def _batch_query_terms(queries: dict[str, str]) -> list[tuple[str, str, int]]:
    """(query_id, term, multiplicity) rows — ONE tokenization used by both
    the Spark batch scorer and its SQL oracle so they can never drift."""
    rows: list[tuple[str, str, int]] = []
    for qid, q in sorted(queries.items()):
        counts: dict[str, int] = {}
        for t in tokenize(q):
            counts[t] = counts.get(t, 0) + 1
        rows.extend((qid, t, n) for t, n in counts.items())
    return rows


def tfidf_scores_batch(
    spark: SparkSession,
    postings: DataFrame,
    doc_stats: DataFrame,
    total_docs: int,
    queries: dict[str, str],
) -> DataFrame:
    """TF-IDF twin of :func:`bm25_scores_batch` — same one-pass batch shape,
    the reference's integer-division IDF per term."""
    terms = spark.createDataFrame(
        _batch_query_terms(queries), "query_id string, term string, mult long"
    )
    distinct_terms = terms.select("term").distinct()
    all_terms = sorted({t for _, t, _ in _batch_query_terms(queries)})
    qpost = _pushdown_query_terms(postings, all_terms).join(
        F.broadcast(distinct_terms), "term"
    ).withColumn("df", F.count("*").over(Window.partitionBy("term")))
    idf = 1.0 + F.floor(F.lit(float(total_docs)) / F.col("df"))
    return (
        qpost.join(F.broadcast(terms), "term")
        .join(doc_stats, "doc_id")
        .select(
            "query_id",
            "doc_id",
            (
                F.col("mult")
                * (F.col("tf").cast("double") / F.col("doc_len"))
                * idf
            ).alias("term_score"),
        )
        .groupBy("query_id", "doc_id")
        .agg(F.sum("term_score").alias("score"))
    )


def tfidf_scores_batch_docs(
    spark: SparkSession,
    documents: DataFrame,
    total_docs,
    queries: dict[str, str],
    id_col: str = "doc_id",
    text_col: str = "content",
) -> DataFrame:
    """:func:`tfidf_scores_batch` from the documents table via the fused
    single-pass postings (one tokenize Generate carrying doc_len; no
    doc_stats join). Same scores, same oracle."""
    terms = spark.createDataFrame(
        _batch_query_terms(queries), "query_id string, term string, mult long"
    )
    all_terms = sorted({t for _, t, _ in _batch_query_terms(queries)})
    qpost = _fused_query_postings(
        documents, all_terms, id_col, text_col
    ).withColumn("df", F.count("*").over(Window.partitionBy("term")))
    qpost, n = _total_docs_expr(qpost, total_docs)
    idf = 1.0 + F.floor(n / F.col("df"))
    return (
        qpost.join(F.broadcast(terms), "term")
        .select(
            "query_id",
            "doc_id",
            (
                F.col("mult")
                * (F.col("tf").cast("double") / F.col("doc_len"))
                * idf
            ).alias("term_score"),
        )
        .groupBy("query_id", "doc_id")
        .agg(F.sum("term_score").alias("score"))
    )


def bm25_scores_batch_docs(
    spark: SparkSession,
    documents: DataFrame,
    total_docs,
    queries: dict[str, str],
    id_col: str = "doc_id",
    text_col: str = "content",
) -> DataFrame:
    """:func:`bm25_scores_batch` from the documents table via the fused
    single-pass postings; avgdl in-plan over the same scan subtree (AQE
    reuses the spread shuffle). Same scores, same oracle."""
    terms = spark.createDataFrame(
        _batch_query_terms(queries), "query_id string, term string, mult long"
    )
    all_terms = sorted({t for _, t, _ in _batch_query_terms(queries)})
    qpost = _fused_query_postings(
        documents, all_terms, id_col, text_col
    ).withColumn("df", F.count("*").over(Window.partitionBy("term")))
    avgdl = documents.agg(
        F.coalesce(
            F.avg(F.size(tokens_col(F.col(text_col)))), F.lit(0.0)
        ).alias("_avgdl")
    )
    base = qpost.join(F.broadcast(terms), "term").crossJoin(F.broadcast(avgdl))
    base, n = _total_docs_expr(base, total_docs)
    idf = F.log(1 + (n - F.col("df") + 0.5) / (F.col("df") + 0.5))
    tf = F.col("tf").cast("double")
    denom = tf + K1 * (1 - B + B * F.col("doc_len") / F.col("_avgdl"))
    return (
        base.select(
            "query_id",
            "doc_id",
            (F.col("mult") * idf * (tf * (K1 + 1)) / denom).alias("term_score"),
        )
        .groupBy("query_id", "doc_id")
        .agg(F.sum("term_score").alias("score"))
    )


def tfidf_batch_oracle_sql(
    table: str,
    id_col: str,
    text_col: str,
    queries: dict[str, str],
    round_to: int = 4,
) -> str:
    terms_values = ", ".join(
        f"('{q}', '{t}', {n})" for q, t, n in _batch_query_terms(queries)
    )
    return f"""
WITH postings AS ({postings_sql(table, id_col, text_col)}),
doc_stats AS (
  SELECT {id_col} AS doc_id,
         len(list_filter(regexp_split_to_array(lower({text_col}), '\\s+'),
                         t -> t <> '')) AS doc_len
  FROM {table}
),
qterms(query_id, term, mult) AS (VALUES {terms_values}),
dterms AS (SELECT DISTINCT term FROM qterms),
dfs AS (
  SELECT term, count(DISTINCT doc_id) AS df
  FROM postings JOIN dterms USING (term) GROUP BY term
),
total AS (SELECT count(*) AS n FROM {table})
SELECT q.query_id, p.doc_id,
       round(sum(q.mult * (p.tf * 1.0 / s.doc_len)
                 * (1.0 + floor(t.n * 1.0 / d.df))), {round_to}) AS score
FROM postings p
JOIN qterms q USING (term)
JOIN dfs d USING (term)
JOIN doc_stats s USING (doc_id)
CROSS JOIN total t
GROUP BY q.query_id, p.doc_id
ORDER BY query_id, doc_id
"""


def bm25_scores_batch(
    spark: SparkSession,
    postings: DataFrame,
    doc_stats: DataFrame,
    total_docs: int,
    queries: dict[str, str],
    avgdl: float | None = None,
) -> DataFrame:
    """Score a BATCH of queries in one postings pass — the serving shape
    for query throughput at scale: one broadcast of all query terms, one
    scan/shuffle of the postings slice, (query_id, doc_id, score) out.
    N queries cost ~one query's plan, not N sequential jobs.

    df(term) is computed over DISTINCT terms first (a term shared by two
    queries must not double-count its postings), then fanned out to the
    per-query multiplicities."""
    terms = spark.createDataFrame(
        _batch_query_terms(queries), "query_id string, term string, mult long"
    )
    distinct_terms = terms.select("term").distinct()
    all_terms = sorted({t for _, t, _ in _batch_query_terms(queries)})
    qpost = _pushdown_query_terms(postings, all_terms).join(
        F.broadcast(distinct_terms), "term"
    ).withColumn("df", F.count("*").over(Window.partitionBy("term")))
    base = qpost.join(F.broadcast(terms), "term").join(doc_stats, "doc_id")
    if avgdl is None:
        # in-plan corpus stat (broadcast 1-row cross join) — see bm25_scores
        avgdl_expr = F.col("_avgdl")
        base = base.crossJoin(
            F.broadcast(
                doc_stats.agg(
                    F.coalesce(F.avg("doc_len"), F.lit(0.0)).alias("_avgdl")
                )
            )
        )
    else:
        avgdl_expr = F.lit(float(avgdl))
    n = F.lit(float(total_docs))
    idf = F.log(1 + (n - F.col("df") + 0.5) / (F.col("df") + 0.5))
    tf = F.col("tf").cast("double")
    denom = tf + K1 * (1 - B + B * F.col("doc_len") / avgdl_expr)
    return (
        base
        .select(
            "query_id",
            "doc_id",
            (F.col("mult") * idf * (tf * (K1 + 1)) / denom).alias("term_score"),
        )
        .groupBy("query_id", "doc_id")
        .agg(F.sum("term_score").alias("score"))
    )


def bm25_batch_oracle_sql(
    table: str,
    id_col: str,
    text_col: str,
    queries: dict[str, str],
    round_to: int = 4,
) -> str:
    terms_values = ", ".join(
        f"('{q}', '{t}', {n})" for q, t, n in _batch_query_terms(queries)
    )
    return f"""
WITH postings AS ({postings_sql(table, id_col, text_col)}),
doc_stats AS (
  SELECT {id_col} AS doc_id,
         len(list_filter(regexp_split_to_array(lower({text_col}), '\\s+'),
                         t -> t <> '')) AS doc_len
  FROM {table}
),
qterms(query_id, term, mult) AS (VALUES {terms_values}),
dterms AS (SELECT DISTINCT term FROM qterms),
dfs AS (
  SELECT term, count(DISTINCT doc_id) AS df
  FROM postings JOIN dterms USING (term) GROUP BY term
),
total AS (SELECT count(*) AS n FROM {table}),
avg_len AS (SELECT avg(doc_len) AS avgdl FROM doc_stats)
SELECT q.query_id, p.doc_id,
       round(sum(q.mult * ln(1 + (t.n - d.df + 0.5) / (d.df + 0.5))
                 * (p.tf * ({K1} + 1))
                 / (p.tf + {K1} * (1 - {B} + {B} * s.doc_len / a.avgdl))),
             {round_to}) AS score
FROM postings p
JOIN qterms q USING (term)
JOIN dfs d USING (term)
JOIN doc_stats s USING (doc_id)
CROSS JOIN total t
CROSS JOIN avg_len a
GROUP BY q.query_id, p.doc_id
ORDER BY query_id, doc_id
"""


def tfidf_oracle_sql(
    table: str, id_col: str, text_col: str, query: str, round_to: int = 4
) -> str:
    toks = tokenize(query)
    counts: dict[str, int] = {}
    for t in toks:
        counts[t] = counts.get(t, 0) + 1
    terms_values = ", ".join(
        f"('{t}', {n})" for t, n in counts.items()
    )
    return f"""
WITH postings AS ({postings_sql(table, id_col, text_col)}),
doc_stats AS (
  SELECT {id_col} AS doc_id,
         len(list_filter(regexp_split_to_array(lower({text_col}), '\\s+'),
                         t -> t <> '')) AS doc_len
  FROM {table}
),
qterms(term, mult) AS (VALUES {terms_values}),
dfs AS (SELECT term, count(DISTINCT doc_id) AS df FROM postings GROUP BY term),
total AS (SELECT count(*) AS n FROM {table})
SELECT p.doc_id,
       round(sum(q.mult * (p.tf * 1.0 / s.doc_len)
                 * (1.0 + floor(t.n * 1.0 / d.df))), {round_to}) AS score
FROM postings p
JOIN qterms q USING (term)
JOIN dfs d USING (term)
JOIN doc_stats s USING (doc_id)
CROSS JOIN total t
GROUP BY p.doc_id
ORDER BY score DESC, doc_id ASC
"""


def bm25_oracle_sql(
    table: str, id_col: str, text_col: str, query: str, round_to: int = 4
) -> str:
    toks = tokenize(query)
    counts: dict[str, int] = {}
    for t in toks:
        counts[t] = counts.get(t, 0) + 1
    terms_values = ", ".join(f"('{t}', {n})" for t, n in counts.items())
    return f"""
WITH postings AS ({postings_sql(table, id_col, text_col)}),
doc_stats AS (
  SELECT {id_col} AS doc_id,
         len(list_filter(regexp_split_to_array(lower({text_col}), '\\s+'),
                         t -> t <> '')) AS doc_len
  FROM {table}
),
qterms(term, mult) AS (VALUES {terms_values}),
dfs AS (SELECT term, count(DISTINCT doc_id) AS df FROM postings GROUP BY term),
total AS (SELECT count(*) AS n FROM {table}),
avg_len AS (SELECT avg(doc_len) AS avgdl FROM doc_stats)
SELECT p.doc_id,
       round(sum(q.mult * ln(1 + (t.n - d.df + 0.5) / (d.df + 0.5))
                 * (p.tf * ({K1} + 1))
                 / (p.tf + {K1} * (1 - {B} + {B} * s.doc_len / a.avgdl))),
             {round_to}) AS score
FROM postings p
JOIN qterms q USING (term)
JOIN dfs d USING (term)
JOIN doc_stats s USING (doc_id)
CROSS JOIN total t
CROSS JOIN avg_len a
GROUP BY p.doc_id
ORDER BY score DESC, doc_id ASC
"""
