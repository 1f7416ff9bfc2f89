"""The driver-contract query registry: every implemented operator from
SURVEY.md §2 (plus the training-data-pipeline ops) as a (spark_fn,
oracle_sql) pair. The driver runs each Spark query and its DuckDB oracle
side-by-side at sf=0.01 (tables pre-registered as views) and compares
row-count + schema + value hashes; entries with oracle None get a weaker
rows-only check (used only for ops whose hashing/LSH internals DuckDB
cannot replicate — each of those is verified against a Python oracle in
tests/ instead).

Column-name and rounding discipline: every computed column is aliased
identically on both sides; float aggregates are rounded (4-6 dp) on both
sides so value hashes match across engines.
"""

from __future__ import annotations

import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from goprowl_spark import corpus, ranking
from goprowl_spark import search as gsearch
from goprowl_spark import streaming
from goprowl_spark.crawl import CrawlConfig, CrawlEngine
from goprowl_spark.operators import dedup, multimodal, sessions, similarity, textstats
from goprowl_spark.parse import parse_spans_udf

CORPUS_MULT = 10
BFS_DEPTH = 6
MEDIA_PAGES = 600

# title/content mapping for search over the driver documents table
TITLE_SQL = "substr(text, 1, 40)"


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _tbl(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _search_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        F.substring("text", 1, 40).alias("title"),
        F.col("text").alias("content"),
        F.col("source").alias("doc_type"),
    )


# ---------------------------------------------------------------- crawl

def q_crawl_bfs_seen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full multi-round BFS crawl (pop → fetch → parse → dedup → commit per
    round, Bloom-pruned anti-join); returns the URL-seen set + first-enqueue
    depth — the north_rule invariant, checked against a DuckDB recursive-CTE
    re-derivation of the link graph."""
    n = _docs(spark, sf_dir).count() * CORPUS_MULT
    eng = CrawlEngine(
        spark,
        None,
        tempfile.mkdtemp(prefix="goprowl_crawl_"),
        CrawlConfig(seeds=[corpus.url(0)], max_depth=BFS_DEPTH),
        fetcher=corpus.make_fetcher(n),
    )
    eng.run()
    return (
        eng.seen()
        .select("url", F.col("depth").cast("int").alias("depth"))
        .orderBy("url")
    )


def q_crawl_budget_seen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Politeness-budget-constrained crawl (per-host top-k pop, W1): the
    seen-set after 12 rounds at ≤5 fetches/host/round. Not SQL-expressible
    (iterative budgeted scheduling) → rows-only here; trace-verified against
    the sequential Python oracle in tests/test_crawl.py."""
    n = _docs(spark, sf_dir).count() * CORPUS_MULT
    eng = CrawlEngine(
        spark,
        None,
        tempfile.mkdtemp(prefix="goprowl_crawl_"),
        CrawlConfig(seeds=[corpus.url(0)], max_depth=4, default_budget=5),
        fetcher=corpus.make_fetcher(n),
    )
    eng.run(max_rounds=12)
    return (
        eng.seen()
        .select("url", F.col("depth").cast("int").alias("depth"))
        .orderBy("url")
    )


# ---------------------------------------------------------------- search

SEARCH_QUERIES = {
    "search_relevancy": 'join AND hash "batch window" title:scan',
    "search_phrase": '"batch window spark" data',
    "search_fuzzy": "join~2 hash",
    "search_field": "title:key content:join",
}


def _mk_search(qstr: str):
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        return gsearch.search(
            _search_docs(spark, sf_dir), qstr, size=20
        ).select("doc_id", "score")

    return fn


def q_search_facets(spark: SparkSession, sf_dir: str) -> DataFrame:
    return gsearch.facets(_docs(spark, sf_dir), type_col="lang").orderBy("value")


def q_suggest_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 Suggest(prefix) — a stub in the reference (basic_search.go:228),
    real here: distinct vocabulary terms with prefix 'b'."""
    postings = ranking.build_postings(_docs(spark, sf_dir), text_col="text")
    return (
        postings.select("term")
        .where(F.col("term").startswith("b"))
        .distinct()
        .orderBy("term")
    )


# ---------------------------------------------------------------- ranking

def q_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        ranking.build_postings(_docs(spark, sf_dir), text_col="text")
        .where(F.col("doc_id") < 100)
        .orderBy("term", "doc_id")
    )


def q_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ranking.build_doc_stats(_docs(spark, sf_dir), text_col="text").orderBy(
        "doc_id"
    )


TFIDF_QUERY = "join hash batch"
BM25_QUERY = "spark data join"


def q_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    postings = ranking.build_postings(docs, text_col="text")
    stats = ranking.build_doc_stats(docs, text_col="text")
    scored = ranking.tfidf_scores(spark, postings, stats, docs.count(), TFIDF_QUERY)
    return scored.select("doc_id", F.round("score", 4).alias("score")).orderBy(
        F.col("score").desc(), "doc_id"
    )


def q_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    postings = ranking.build_postings(docs, text_col="text")
    stats = ranking.build_doc_stats(docs, text_col="text")
    scored = ranking.bm25_scores(spark, postings, stats, docs.count(), BM25_QUERY)
    return scored.select("doc_id", F.round("score", 4).alias("score")).orderBy(
        F.col("score").desc(), "doc_id"
    )


# ---------------------------------------------------------------- storage ops

def q_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _docs(spark, sf_dir).where(F.col("doc_id") == 42).select(
        "doc_id", "lang", "source", "n_chars"
    )


def q_list_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _docs(spark, sf_dir)
        .select("doc_id", "lang", "source", "n_chars")
        .orderBy("doc_id")
    )


def q_type_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _docs(spark, sf_dir)
        .where(F.col("lang") == "en")
        .select("doc_id", "source")
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------- relational

def q_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2 offset+limit pagination (page 3, size 20) as sort+OFFSET/LIMIT —
    TakeOrderedAndProject partial top-60 per partition, not a global
    single-partition row_number window."""
    orders = _tbl(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .offset(40)
        .limit(20)
        .select("o_orderkey", F.round("o_totalprice", 4).alias("o_totalprice"))
    )


def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 per-key top-k (the politeness-budget window shape)."""
    orders = _tbl(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "rn")
        .orderBy("o_custkey", "rn")
    )


def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 anti-join shape (the seen-set dedup join): customers with no
    order above 400k (selective enough to return rows at every sf)."""
    customer = _tbl(spark, sf_dir, "customer")
    orders = _tbl(spark, sf_dir, "orders").where(F.col("o_totalprice") > 400000)
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey")
        .orderBy("c_custkey")
    )


def q_broadcast_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 broadcast-join shape: customers per region (small dims broadcast)."""
    customer = _tbl(spark, sf_dir, "customer")
    nation = _tbl(spark, sf_dir, "nation")
    region = _tbl(spark, sf_dir, "region")
    return (
        customer.join(
            F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
        )
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(F.count("*").alias("n_customers"))
        .orderBy("r_name")
    )


def q_set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.7 set op: ordering customers minus negative-balance customers."""
    orders = _tbl(spark, sf_dir, "orders")
    customer = _tbl(spark, sf_dir, "customer")
    a = orders.select(F.col("o_custkey").alias("custkey")).distinct()
    b = customer.where(F.col("c_acctbal") < 0).select(
        F.col("c_custkey").alias("custkey")
    )
    return a.exceptAll(b.distinct()).orderBy("custkey")


def q_agg_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-family hash aggregate (TPC-H Q1 shape)."""
    li = _tbl(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("sum_disc_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q_metrics_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 metrics aggregates over the events table."""
    ev = _tbl(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 4).alias("sum_value"),
            F.round(F.avg("value"), 6).alias("avg_value"),
            F.round(F.min("value"), 4).alias("min_value"),
            F.round(F.max("value"), 4).alias("max_value"),
        )
        .orderBy("event_type")
    )


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min timeout) — lag/cumsum window
    algebra, oracle-checked value-for-value."""
    return sessions.sessionize(_tbl(spark, sf_dir, "events"), gap_minutes=30)


def q_stream_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming: watermarked 5-minute tumbling windows per
    event_type, driven to completion with availableNow."""
    return streaming.windowed_event_counts(
        spark, f"{sf_dir}/events.parquet"
    ).orderBy("window_start", "event_type")


# ---------------------------------------------------------------- dedup

def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.exact_dedup(_docs(spark, sf_dir), text_col="text").orderBy(
        "text_hash"
    )


JACCARD_THRESHOLD = 0.25
# Stop-shingle cap: shingles present in more than this many docs are dropped
# BEFORE the inverted-index self-join (a shared shingle fans out
# quadratically in its doc frequency). Mirrored exactly in the oracle.
JACCARD_DF_CAP = 100


def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = dedup.jaccard_pairs(
        _docs(spark, sf_dir),
        threshold=JACCARD_THRESHOLD,
        text_col="text",
        df_cap=JACCARD_DF_CAP,
    )
    return pairs.select(
        "id_a", "id_b", F.round("jaccard", 6).alias("jaccard")
    ).orderBy("id_a", "id_b")


def q_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup pairs (xxhash64 signatures — not replicable in
    DuckDB → rows-only; no-false-positive + recall properties are pinned in
    tests/test_dedup.py)."""
    pairs = dedup.minhash_lsh_pairs(
        _docs(spark, sf_dir), threshold=JACCARD_THRESHOLD, text_col="text"
    )
    return pairs.select(
        "id_a", "id_b", F.round("jaccard", 6).alias("jaccard")
    ).orderBy("id_a", "id_b")


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash Hamming-≤3 pairs (rows-only: xxhash64 bit math)."""
    return dedup.simhash_pairs(
        _docs(spark, sf_dir), max_hamming=3, text_col="text"
    ).orderBy("id_a", "id_b")


# ---------------------------------------------------------------- embeddings

def q_emb_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    qv = [float(x) for x in emb.where(F.col("vec_id") == 0).collect()[0]["embedding"]]
    top = similarity.cosine_topk(emb, qv, k=20)
    return top.select("vec_id", F.round("cosine", 6).alias("cosine"))


def q_emb_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = similarity.cosine_pairs(_emb(spark, sf_dir), threshold=0.5)
    return pairs.select(
        "id_a", "id_b", F.round("cosine", 6).alias("cosine")
    ).orderBy("id_a", "id_b")


def q_emb_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded random-hyperplane LSH near-dup pairs, exact-verified (rows-
    only: hyperplane hashing isn't DuckDB-replicable; no-false-positive +
    recall properties pinned in tests/test_lsh_pairs.py)."""
    emb = _emb(spark, sf_dir)
    dim = len(emb.select("embedding").first()["embedding"])
    pairs = similarity.lsh_cosine_pairs(emb, threshold=0.45, dim=dim)
    return pairs.select(
        "id_a", "id_b", F.round("cosine", 6).alias("cosine")
    ).orderBy("id_a", "id_b")


def q_emb_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-k (rows-only: centroid pruning is the point;
    exactness-within-probed-clusters is pinned in tests/test_similarity.py)."""
    emb = _emb(spark, sf_dir)
    qv = [float(x) for x in emb.where(F.col("vec_id") == 7).collect()[0]["embedding"]]
    top = similarity.ivf_topk(emb, qv, k=10, n_centroids=8, nprobe=3)
    return top.select("vec_id", F.round("cosine", 6).alias("cosine"))


# ---------------------------------------------------------------- textstats

def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.lang_id(_docs(spark, sf_dir), text_col="text").orderBy("doc_id")


def q_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.token_counts(_docs(spark, sf_dir), text_col="text").orderBy(
        "doc_id"
    )


def q_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.quality_scores(_docs(spark, sf_dir), text_col="text").orderBy(
        "doc_id"
    )


def q_doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.fingerprints(_docs(spark, sf_dir), text_col="text").orderBy(
        "doc_id"
    )


# ---------------------------------------------------------------- multimodal

def q_media_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parse the first 600 corpus pages → media table → mapInPandas decode
    (stubbed codec, real plumbing). Metadata is a pure function of
    sha256(media_ref) so DuckDB re-derives it exactly."""
    pages = corpus.corpus_df(spark, MEDIA_PAGES).where(F.col("status") == 200)
    docs = pages.select(
        F.col("url").alias("doc_id"),
        parse_spans_udf(F.col("html"), F.col("url")).alias("spans"),
    )
    media = multimodal.media_table(docs)
    decoded = multimodal.decode_media(media)
    return decoded.select(
        "doc_id",
        "media_ref",
        "media_type",
        "width",
        "height",
        "n_channels",
        "n_bytes",
    ).orderBy("media_ref")


# ================================================================ oracles

def _search_oracle(qstr: str) -> str:
    return gsearch.search_oracle_sql(
        qstr, "documents", "doc_id", TITLE_SQL, "text", size=20
    )


def _media_decode_oracle() -> str:
    # page i (status 200) has media refs for k < i%3; metadata derives from
    # the first three bytes of sha256(ref) exactly like the stub decoder.
    return f"""
WITH pages AS (
  SELECT i FROM range({MEDIA_PAGES}) t(i)
  WHERE i % 97 <> 33 AND i % 131 <> 57
),
refs AS (
  SELECT
    'https://h' || (CASE WHEN i % 10 < 3 THEN 0 ELSE 1 + (i % 9) END) || '.test/p/' || i AS doc_id,
    'https://h' || (CASE WHEN i % 10 < 3 THEN 0 ELSE 1 + (i % 9) END) || '.test/img/' || i || '_' || k.k || '.png' AS media_ref
  FROM pages, range(2) k(k)
  WHERE k.k < i % 3
),
b AS (
  SELECT doc_id, media_ref,
    CAST(('0x' || substr(sha256(media_ref), 1, 2)) AS INT) AS b0,
    CAST(('0x' || substr(sha256(media_ref), 3, 2)) AS INT) AS b1,
    CAST(('0x' || substr(sha256(media_ref), 5, 2)) AS INT) AS b2
  FROM refs
)
SELECT doc_id, media_ref, 'image' AS media_type,
       CAST(64 + b0 % 192 AS INT) AS width,
       CAST(64 + b1 % 192 AS INT) AS height,
       CAST(1 + b2 % 4 AS INT) AS n_channels,
       CAST(32 AS BIGINT) AS n_bytes
FROM b
ORDER BY media_ref
"""


def _emb_cosine_topk_oracle() -> str:
    return """
WITH ev AS (
  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS y,
         generate_subscripts(embedding, 1) AS i
  FROM embeddings
),
qv AS (SELECT i, y AS x FROM ev WHERE vec_id = 0),
qn AS (SELECT sqrt(sum(x*x)) AS n FROM qv),
sims AS (
  SELECT ev.vec_id, sum(ev.y * qv.x) AS dot, sqrt(sum(ev.y * ev.y)) AS nv
  FROM ev JOIN qv USING (i) GROUP BY ev.vec_id
)
SELECT vec_id, round(dot / (nv * (SELECT n FROM qn)), 6) AS cosine
FROM sims
ORDER BY dot / (nv * (SELECT n FROM qn)) DESC, vec_id ASC
LIMIT 20
"""


def _emb_cosine_pairs_oracle() -> str:
    return """
WITH ev AS (
  SELECT vec_id, label, CAST(unnest(embedding) AS DOUBLE) AS y,
         generate_subscripts(embedding, 1) AS i
  FROM embeddings
),
pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         sum(a.y * b.y) AS dot,
         sqrt(sum(a.y * a.y)) AS na, sqrt(sum(b.y * b.y)) AS nb
  FROM ev a JOIN ev b ON a.i = b.i AND a.label = b.label AND a.vec_id < b.vec_id
  GROUP BY a.vec_id, b.vec_id
)
SELECT id_a, id_b, round(dot / (na * nb), 6) AS cosine
FROM pairs
WHERE dot / (na * nb) >= 0.5
ORDER BY id_a, id_b
"""


def _jaccard_oracle() -> str:
    return f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(regexp_replace(lower(text), '\\s+', ' ', 'g'), ' '),
                     t -> t <> '') AS arr
  FROM documents
),
sh_all AS (
  SELECT DISTINCT doc_id, array_to_string(arr[g:g+2], ' ') AS shingle
  FROM toks, unnest(generate_series(1, greatest(len(arr) - 2, 0))) t(g)
),
sh AS (
  SELECT doc_id, shingle FROM sh_all
  QUALIFY count(*) OVER (PARTITION BY shingle) <= {JACCARD_DF_CAP}
),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT id_a, id_b,
       round(i * 1.0 / (sa.n + sb.n - i), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE i * 1.0 / (sa.n + sb.n - i) >= {JACCARD_THRESHOLD}
ORDER BY id_a, id_b
"""


ORACLES: dict[str, str | None] = {
    "crawl_bfs_seen": corpus.bfs_oracle_sql(
        f"(SELECT count(*)*{CORPUS_MULT} FROM documents)", seed=0, max_depth=BFS_DEPTH
    ),
    "crawl_budget_seen": None,
    **{name: _search_oracle(q) for name, q in SEARCH_QUERIES.items()},
    "search_facets": "SELECT lang AS value, count(*) AS count FROM documents GROUP BY lang ORDER BY value",
    "suggest_prefix": """
SELECT DISTINCT term FROM (
  SELECT unnest(regexp_split_to_array(lower(text), '\\s+')) AS term FROM documents
) WHERE term LIKE 'b%' AND term <> '' ORDER BY term
""",
    "postings": """
SELECT term, doc_id, count(*) AS tf FROM (
  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\\s+')) AS term FROM documents
) WHERE term <> '' AND doc_id < 100
GROUP BY term, doc_id ORDER BY term, doc_id
""",
    "doc_stats": """
SELECT doc_id,
       len(list_filter(regexp_split_to_array(lower(text), '\\s+'), t -> t <> '')) AS doc_len
FROM documents ORDER BY doc_id
""",
    "tfidf_search": ranking.tfidf_oracle_sql("documents", "doc_id", "text", TFIDF_QUERY),
    "bm25_search": ranking.bm25_oracle_sql("documents", "doc_id", "text", BM25_QUERY),
    "point_lookup": "SELECT doc_id, lang, source, n_chars FROM documents WHERE doc_id = 42",
    "list_all": "SELECT doc_id, lang, source, n_chars FROM documents ORDER BY doc_id",
    "type_filter": "SELECT doc_id, source FROM documents WHERE lang = 'en' ORDER BY doc_id",
    "pagination": """
SELECT o_orderkey, round(o_totalprice, 4) AS o_totalprice
FROM orders ORDER BY orders.o_totalprice DESC, o_orderkey ASC
LIMIT 20 OFFSET 40
""",
    "topk_per_group": """
SELECT o_custkey, o_orderkey, rn FROM (
  SELECT o_custkey, o_orderkey,
         row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
  FROM orders
) WHERE rn <= 3 ORDER BY o_custkey, rn
""",
    "anti_join": """
SELECT c_custkey FROM customer
WHERE NOT EXISTS (
  SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 400000
)
ORDER BY c_custkey
""",
    "broadcast_join_agg": """
SELECT r_name, count(*) AS n_customers
FROM customer JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name ORDER BY r_name
""",
    "set_except": """
SELECT DISTINCT o_custkey AS custkey FROM orders
EXCEPT
SELECT DISTINCT c_custkey AS custkey FROM customer WHERE c_acctbal < 0
ORDER BY custkey
""",
    "agg_q1": """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 4) AS sum_qty,
       round(sum(l_extendedprice), 4) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
       round(avg(l_discount), 6) AS avg_disc,
       count(*) AS count_order
FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus
""",
    "metrics_rollup": """
SELECT event_type, count(*) AS n,
       round(sum(value), 4) AS sum_value,
       round(avg(value), 6) AS avg_value,
       round(min(value), 4) AS min_value,
       round(max(value), 4) AS max_value
FROM events GROUP BY event_type ORDER BY event_type
""",
    "sessionize": sessions.sessionize_sql("events", gap_minutes=30),
    "stream_windowed_counts": """
SELECT strftime(time_bucket(INTERVAL 5 MINUTE, ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type, count(*) AS n_events, round(sum(value), 4) AS sum_value
FROM events GROUP BY 1, 2 ORDER BY window_start, event_type
""",
    "dedup_exact": """
SELECT min(doc_id) AS keep_id, md5(text) AS text_hash, count(*) AS dup_count
FROM documents GROUP BY md5(text) ORDER BY text_hash
""",
    "dedup_ngram_jaccard": _jaccard_oracle(),
    "dedup_minhash": None,
    "dedup_simhash": None,
    "emb_cosine_topk": _emb_cosine_topk_oracle(),
    "emb_cosine_pairs": _emb_cosine_pairs_oracle(),
    "emb_ivf_topk": None,
    "emb_lsh_pairs": None,
    "lang_id": textstats.lang_id_sql("documents", "doc_id", "text"),
    "token_counts": textstats.token_counts_sql("documents", "doc_id", "text"),
    "quality_scores": textstats.quality_scores_sql("documents", "doc_id", "text"),
    "doc_fingerprints": textstats.fingerprints_sql("documents", "doc_id", "text"),
    "media_decode": _media_decode_oracle(),
}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    qs: dict[str, Callable[[SparkSession, str], DataFrame]] = {
        "crawl_bfs_seen": q_crawl_bfs_seen,
        "crawl_budget_seen": q_crawl_budget_seen,
        "search_facets": q_search_facets,
        "suggest_prefix": q_suggest_prefix,
        "postings": q_postings,
        "doc_stats": q_doc_stats,
        "tfidf_search": q_tfidf,
        "bm25_search": q_bm25,
        "point_lookup": q_point_lookup,
        "list_all": q_list_all,
        "type_filter": q_type_filter,
        "pagination": q_pagination,
        "topk_per_group": q_topk_per_group,
        "anti_join": q_anti_join,
        "broadcast_join_agg": q_broadcast_join_agg,
        "set_except": q_set_except,
        "agg_q1": q_agg_q1,
        "metrics_rollup": q_metrics_rollup,
        "sessionize": q_sessionize,
        "stream_windowed_counts": q_stream_windowed_counts,
        "dedup_exact": q_dedup_exact,
        "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
        "dedup_minhash": q_dedup_minhash,
        "dedup_simhash": q_dedup_simhash,
        "emb_cosine_topk": q_emb_cosine_topk,
        "emb_cosine_pairs": q_emb_cosine_pairs,
        "emb_ivf_topk": q_emb_ivf_topk,
        "emb_lsh_pairs": q_emb_lsh_pairs,
        "lang_id": q_lang_id,
        "token_counts": q_token_counts,
        "quality_scores": q_quality_scores,
        "doc_fingerprints": q_doc_fingerprints,
        "media_decode": q_media_decode,
    }
    for name, qstr in SEARCH_QUERIES.items():
        qs[name] = _mk_search(qstr)
    return qs


def oracle_sql() -> dict[str, str]:
    return {k: v for k, v in ORACLES.items() if v is not None}
