"""Corpus curation operators — the pieces that turn near-dup PAIRS into a
deduplicated corpus and a training mixture. Complements dedup.py/textstats.py:

* connected components — near-dup pairs form a graph; duplicate CLUSTERS are
  its components. Distributed min-label propagation (one join + one
  min-aggregate per round, lineage truncated per round); converges in
  O(component diameter) rounds — near-dup clusters are shallow (docs within
  a cluster all share shingles, so diameters are 1-3 in practice; the
  alternating large-star/small-star algorithm is the O(log n) upgrade for
  adversarial graphs and slots in behind the same signature).
* dedup_clusters — every doc mapped to its cluster-canonical (min doc_id)
  representative; the "keep one per near-dup cluster" step of a training
  pipeline (GoProwl only declares content-hash dedup, crawlers/types.go:44).
* hash_sample — deterministic md5-derived per-row sampling, optionally
  stratified by a column with per-stratum rates. No RNG: the same row is in
  or out of the sample on every run, every engine, any cluster size — the
  property that makes 100 TB pipelines resumable and auditable.
* token_budget_mix — per-source token quotas (the "data mixture" step):
  docs ordered by a deterministic hash within each source, kept while the
  running token total fits the source's budget.
* training_shards — the export sink: a deterministic global shuffle of the
  corpus into N dataloader shards with stable within-shard positions.

Everything is pure DataFrame algebra with an exact DuckDB SQL twin (the
driver oracle verifies values). Scale shapes: components shuffle only the
edge list per round; sampling is map-only; the mix is one window per source
partition (parallel across sources — a single hot source serializes its own
cumulative sum, which is inherent to exact greedy quotas; approximate via a
token-count quantile cutoff when that matters).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from goprowl_spark.operators.dedup import h60, h60_sql

SAMPLE_BUCKETS = 1000  # sampling resolution: rates are per-mille


def ws_tokens(text_col: str):
    """Whitespace token count — the ONE tokenization definition shared by
    the mixture and the shard-export layout (both engines)."""
    return F.regexp_count(F.col(text_col), F.lit(r"\S+")).cast("long")


def ws_tokens_sql(text_col: str) -> str:
    return f"len(regexp_extract_all({text_col}, '\\S+'))"


# ------------------------------------------------------- connected components

def connected_components(
    pairs: DataFrame,
    a_col: str = "id_a",
    b_col: str = "id_b",
    max_iter: int = 30,
) -> DataFrame:
    """(node, component) for every node in ``pairs``; component = min node id
    reachable in the undirected pair graph. Deterministic at convergence
    (the min label is a graph property, not an iteration-order artifact).

    Each round: propagate labels across edges (join), keep the min per node
    (partial-aggregated groupBy), localCheckpoint to truncate the growing
    plan, stop when no label changed. Raises if ``max_iter`` rounds don't
    converge rather than returning a silently-wrong clustering.
    """
    e = pairs.select(F.col(a_col).alias("a"), F.col(b_col).alias("b"))
    edges = e.unionByName(
        e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).localCheckpoint()
    labels = (
        edges.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        msgs = edges.join(labels, edges["a"] == labels["node"]).select(
            F.col("b").alias("node"), F.col("comp")
        )
        stepped = (
            labels.unionByName(msgs)
            .groupBy("node")
            .agg(F.min("comp").alias("comp"))
        )
        # pointer jump: comp ← comp(comp) — halves remaining path length,
        # so long chains converge in O(log diameter) rounds, not O(diameter)
        new_labels = (
            stepped.join(
                stepped.select(
                    F.col("node").alias("comp"), F.col("comp").alias("comp2")
                ),
                "comp",
                "left",
            )
            .select("node", F.coalesce("comp2", "comp").alias("comp"))
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.comp") != F.col("o.comp"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds"
    )


def dedup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, canonical_id, is_dup) for EVERY doc: near-dup cluster members
    map to the cluster's min doc_id, everything else to itself. ``pairs`` is
    any near-dup pair table (exact Jaccard, MinHash-LSH, SimHash, embedding
    cosine — they all emit (id_a, id_b)). The components side is tiny
    relative to the corpus (only docs appearing in a pair), so the final
    join broadcasts it."""
    comp = connected_components(pairs)
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(
            F.broadcast(comp.withColumnRenamed("node", "doc_id")),
            "doc_id",
            "left",
        )
        .select(
            "doc_id",
            F.coalesce(F.col("comp"), F.col("doc_id")).alias("canonical_id"),
            (F.coalesce(F.col("comp"), F.col("doc_id")) != F.col("doc_id"))
            .cast("long")
            .alias("is_dup"),
        )
    )


# ----------------------------------------------------------------- sampling

def _bucket(id_str_col):
    """Deterministic per-row bucket in [0, SAMPLE_BUCKETS): md5-derived h60
    of the id rendered as a string (bit-identical in DuckDB via h60_sql)."""
    return F.pmod(h60(id_str_col), F.lit(SAMPLE_BUCKETS))


def hash_sample(
    df: DataFrame,
    rate_permille: int,
    id_col: str = "doc_id",
    strata_col: str | None = None,
    strata_rates: dict[str, int] | None = None,
) -> DataFrame:
    """Deterministic sample: keep rows whose hash bucket < rate (per-mille).
    With ``strata_col``, per-stratum overrides in ``strata_rates`` apply and
    ``rate_permille`` is the default. Map-only — no shuffle, no RNG, and the
    decision depends only on the row id, so re-runs / retries / different
    cluster sizes select the identical sample."""
    thresh = F.lit(rate_permille)
    if strata_col is not None and strata_rates:
        expr = F.lit(rate_permille)
        for value, rate in sorted(strata_rates.items()):
            expr = F.when(F.col(strata_col) == value, F.lit(rate)).otherwise(expr)
        thresh = expr
    return df.where(_bucket(F.col(id_col).cast("string")) < thresh)


def hash_sample_sql(
    table: str,
    rate_permille: int,
    id_col: str = "doc_id",
    strata_col: str | None = None,
    strata_rates: dict[str, int] | None = None,
    select: str = "*",
) -> str:
    bucket = f"({h60_sql(f'CAST({id_col} AS VARCHAR)')} % {SAMPLE_BUCKETS})"
    thresh = str(rate_permille)
    if strata_col is not None and strata_rates:
        for value, rate in sorted(strata_rates.items()):
            thresh = f"(CASE WHEN {strata_col} = '{value}' THEN {rate} ELSE {thresh} END)"
    return f"SELECT {select} FROM {table} WHERE {bucket} < {thresh}"


# ------------------------------------------------------------- token budgets

def token_budget_mix(
    df: DataFrame,
    budget_tokens: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """(doc_id, source, ws_tokens, cum_tokens) — the training-mixture step:
    within each source, docs are taken in deterministic-hash order until the
    source's token budget is filled (docs kept while the running total
    stays ≤ budget). One window per source partition; sources fill their
    quotas in parallel."""
    hkey = h60(F.col(id_col).cast("string"))
    w = (
        Window.partitionBy(source_col)
        .orderBy(hkey.asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    toks = ws_tokens(text_col)
    return (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.col(source_col).alias("source"),
            toks.alias("ws_tokens"),
        )
        .withColumn("cum_tokens", F.sum("ws_tokens").over(w))
        .where(F.col("cum_tokens") <= budget_tokens)
    )


def curation_pipeline(
    docs: DataFrame,
    quality_min: float,
    budget_tokens: int,
    jaccard_threshold: float = 0.25,
    df_cap: int | None = 100,
) -> DataFrame:
    """The end-to-end training-corpus curation flow, composed from the
    individual operators (each independently oracle-checked):

        quality filter → exact dedup (min-id winner per content hash)
        → near-dup clusters (Jaccard pairs → connected components,
          keep each cluster's canonical doc)
        → per-source token-budget mixture

    Expects the standard documents columns (doc_id, text, source). Returns
    (doc_id, source, ws_tokens, cum_tokens) — the selected mixture. Every
    stage is DataFrame algebra; at scale each arrow above is one
    materialization boundary (write the survivors between stages)."""
    from goprowl_spark.operators import dedup as _dedup
    from goprowl_spark.operators import textstats as _textstats

    good = _textstats.quality_scores(docs).where(
        F.col("quality") >= quality_min
    ).select("doc_id")
    kept0 = docs.join(good, "doc_id", "left_semi")
    winners = (
        kept0.groupBy(F.md5(F.col("text")).alias("__h"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    kept = kept0.join(winners, "doc_id", "left_semi")
    pairs = _dedup.jaccard_pairs(
        kept, threshold=jaccard_threshold, text_col="text", df_cap=df_cap
    )
    canon = dedup_clusters(kept, pairs).where(F.col("is_dup") == 0).select(
        "doc_id"
    )
    final = kept.join(canon, "doc_id", "left_semi")
    return token_budget_mix(final, budget_tokens)


def token_budget_ctes(
    table: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
) -> str:
    """CTE chain (sized, running) replaying token_budget_mix over ``table``;
    callers append the budget filter via :func:`token_budget_select`."""
    hkey = h60_sql(f"CAST({id_col} AS VARCHAR)")
    return f"""sized AS (
  SELECT {id_col} AS doc_id, {source_col} AS source,
         {ws_tokens_sql(text_col)} AS ws_tokens,
         {hkey} AS hkey
  FROM {table}
),
running AS (
  SELECT doc_id, source, ws_tokens,
         CAST(sum(ws_tokens) OVER (PARTITION BY source
                                   ORDER BY hkey ASC, doc_id ASC
                                   ROWS UNBOUNDED PRECEDING)
              AS BIGINT) AS cum_tokens
  FROM sized
)"""


def token_budget_select(budget_tokens: int) -> str:
    return f"""
SELECT doc_id, source, ws_tokens, cum_tokens
FROM running WHERE cum_tokens <= {budget_tokens}
ORDER BY doc_id
"""


def token_budget_mix_sql(
    table: str,
    budget_tokens: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
) -> str:
    return (
        f"WITH {token_budget_ctes(table, id_col, text_col, source_col)}"
        f"{token_budget_select(budget_tokens)}"
    )


# ------------------------------------------------------------ training shards

def training_shards(
    df: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokens_col: str | None = None,
) -> DataFrame:
    """(shard, position, doc_id, ws_tokens) — the training-export layout: a
    deterministic global pseudo-random shuffle of the corpus into
    ``n_shards`` dataloader shards. ``shard`` spreads docs uniformly by a
    salted hash of the id; ``position`` is the doc's rank within its shard
    under a SECOND, independent hash order, so the read order inside each
    shard is itself shuffled (dataloaders stream a shard sequentially).
    No RNG anywhere: re-exports, task retries and different cluster sizes
    produce the identical layout, which is what makes a 100 TB export
    resumable and its training runs reproducible.

    Scale shape: ONE shuffle (the per-shard rank window); shards are
    mutually independent, so a 1000-executor export ranks and writes all
    shards in parallel, each holding ~corpus/n_shards rows — pick
    ``n_shards`` so one shard's keys fit an executor's sort buffer (e.g.
    ~100k shards at 100 TB → ~1 GB of payload each). GoProwl has no export
    stage (storage stops at the bleve index, storage/bleve/bleve.go); this
    is the training-pipeline sink layered on top.
    """
    sid = F.col(id_col).cast("string")
    # a caller that already carries the token count (e.g. the curate
    # mixture's ws_tokens) passes tokens_col and skips re-tokenizing
    toks = (
        F.col(tokens_col).cast("long")
        if tokens_col is not None
        else ws_tokens(text_col)
    )
    keyed = df.select(
        F.col(id_col).alias("doc_id"),
        F.pmod(h60(F.concat(F.lit("s|"), sid)), F.lit(n_shards))
        .cast("long")
        .alias("shard"),
        h60(F.concat(F.lit("o|"), sid)).alias("okey"),
        toks.alias("ws_tokens"),
    )
    w = Window.partitionBy("shard").orderBy(
        F.col("okey").asc(), F.col("doc_id").asc()
    )
    return keyed.withColumn(
        "position", F.row_number().over(w).cast("long")
    ).select("shard", "position", "doc_id", "ws_tokens")


def training_shards_sql(
    table: str,
    n_shards: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    sid = f"CAST({id_col} AS VARCHAR)"
    return f"""WITH keyed AS (
  SELECT {id_col} AS doc_id,
         ({h60_sql(f"'s|' || {sid}")} % {n_shards}) AS shard,
         {h60_sql(f"'o|' || {sid}")} AS okey,
         CAST({ws_tokens_sql(text_col)} AS BIGINT) AS ws_tokens
  FROM {table}
)
SELECT shard,
       CAST(row_number() OVER (PARTITION BY shard
                               ORDER BY okey ASC, doc_id ASC) AS BIGINT)
         AS position,
       doc_id, ws_tokens
FROM keyed
ORDER BY shard, position
"""
