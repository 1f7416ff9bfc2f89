"""Document deduplication — the operators a 100 TB training-data pipeline
needs, layered from exact to fuzzy.

The reference only *declares* content-hash dedup (PageContent.ContentHash,
search/crawlers/types.go:41-46; TODO.md:54, never implemented). Rebuilt here
as first-class distributed operators:

* exact dedup        — hash-groupBy, one shuffle, keep min-id winner
* n-gram Jaccard     — shingle inverted-index self-join (exact, no O(n²)
                       cross join; frequent-shingle cap bounds the join
                       fan-out at scale)
* MinHash + LSH      — k hash permutations → banded signatures → bucket
                       join → candidates verified with exact Jaccard; the
                       standard near-dup path at web scale (the candidate
                       join touches only colliding bands, never all pairs)
* SimHash            — 64-bit weighted token fingerprint; Hamming-ball
                       blocking via 4×16-bit sub-keys (any pair within
                       Hamming distance ≤3 shares at least one sub-key)
* embedding near-dup — cosine ≥ τ pairs, blocked (see similarity.py)

All are pure DataFrame ops (shingling via JVM higher-order functions;
hashing via xxhash64) — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def normalize_text(col):
    """lower + collapse whitespace (shared by fingerprints and shingles)."""
    return F.regexp_replace(F.lower(col), r"\s+", " ")


def exact_dedup(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Exact duplicate removal by content hash: one row per distinct text,
    the minimum id wins (deterministic). Returns (id, text_hash, dup_count).

    Single hash-partition shuffle on the digest; partial aggregation makes
    the map side emit one row per (digest) per partition.
    """
    return (
        df.select(F.col(id_col).alias("keep_id"), F.md5(F.col(text_col)).alias("text_hash"))
        .groupBy("text_hash")
        .agg(
            F.min("keep_id").alias("keep_id"),
            F.count("*").alias("dup_count"),
        )
        .select("keep_id", "text_hash", "dup_count")
    )


def word_shingles(text_col, n: int = 3):
    """Distinct n-word shingles as a JVM-side array expression (no UDF):
    tokens[i..i+n-1] joined by space, for i in 0..len-n."""
    toks = F.filter(F.split(normalize_text(text_col), " "), lambda t: t != F.lit(""))
    # Guard: sequence(1, 0) would step DOWN to [1, 0] and slice(toks, 0, n)
    # throws INVALID_PARAMETER_VALUE.START — docs shorter than n shingle to [].
    idx = F.when(
        F.size(toks) >= n, F.sequence(F.lit(1), F.size(toks) - n + 1)
    ).otherwise(F.array().cast("array<int>"))
    return F.array_distinct(
        F.transform(idx, lambda i: F.array_join(F.slice(toks, i, n), " "))
    )


def shingle_postings(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    hashed: bool = False,
) -> DataFrame:
    """(doc_id, shingle) postings. With ``hashed=True`` the shingle column is
    the 60-bit md5-derived :func:`h60` long instead of the string — every
    downstream shuffle/sort/join key becomes 8 bytes instead of a ~30-byte
    string (the dominant cost of the inverted-index self-joins at scale).
    The DuckDB oracles hash with the identical h60_sql expression, so both
    engines agree bit-for-bit even on (astronomically rare) collisions."""
    # Shingling is the CPU-heavy map stage (interpreted higher-order
    # functions + per-shingle md5); its parallelism is capped by the input
    # split count — a small single-file table serializes the whole stage
    # onto one core (measured: ~6 s of the 7.8 s sf0.1 jaccard headline).
    from goprowl_spark.session import spread_narrow_scan

    df = spread_narrow_scan(df, id_col)
    arr = word_shingles(F.col(text_col), n)
    if hashed:
        arr = F.array_distinct(F.transform(arr, h60))
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(arr).alias("shingle"),
    )


def jaccard_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    df_cap: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard near-duplicate pairs via inverted-index join.

    |A∩B| comes from the shingle self-join (only docs sharing a shingle
    ever meet — no cross join); |A∪B| = |A|+|B|−|A∩B|. ``df_cap`` drops
    shingles present in more than cap docs (stop-shingles), bounding the
    join fan-out at corpus scale; when set it must be applied to the
    oracle identically.
    Returns (id_a, id_b, jaccard) with id_a < id_b.
    """
    # Cap and per-doc sizes ride along as WINDOW counts on the postings —
    # no groupBy + join-back passes (measured: the join-back encoding of
    # the cap cost more than the fan-out it pruned at moderate SF). The
    # self-join then carries both sizes, so no post-join size lookups.
    sh = shingle_postings(df, id_col, text_col, n, hashed=True)
    if df_cap is not None:
        sh = (
            sh.withColumn(
                "__sdf", F.count("*").over(Window.partitionBy("shingle"))
            )
            .where(F.col("__sdf") <= df_cap)
            .drop("__sdf")
        )
    sh = sh.withColumn(
        "n_shingles", F.count("*").over(Window.partitionBy("doc_id"))
    )
    a = sh.select(
        F.col("doc_id").alias("id_a"), "shingle", F.col("n_shingles").alias("sa")
    )
    b = sh.select(
        F.col("doc_id").alias("id_b"), "shingle", F.col("n_shingles").alias("sb")
    )
    return (
        a.join(b, "shingle")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(
            F.count("*").alias("inter"),
            F.max("sa").alias("sa"),
            F.max("sb").alias("sb"),
        )
        .select(
            "id_a",
            "id_b",
            (
                F.col("inter").cast("double")
                / (F.col("sa") + F.col("sb") - F.col("inter"))
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


# ------------------------------------------------------------ minhash + lsh

# MinHash universe: 60-bit md5-derived base hash reduced mod a Mersenne
# prime, permuted by (a·h + b) mod P. md5 (not xxhash64) so the DuckDB
# correctness oracle recomputes signatures EXACTLY; the permutations are
# integer arithmetic both engines evaluate identically (products stay
# < 2^62, no overflow).
MINHASH_PRIME = 2147483647  # 2^31 - 1


def h60(col):
    """Deterministic 60-bit hash both Spark and DuckDB can compute: the
    first 15 hex chars of md5 as a BIGINT (always non-negative)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def h60_sql(expr: str) -> str:
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"


def perm_params(k: int) -> list[tuple[int, int]]:
    """k deterministic (a, b) permutation constants in [1, P) via a fixed
    LCG — no RNG state, reproducible everywhere (embedded in oracle SQL)."""
    out, x = [], 1
    for _ in range(k):
        x = (1103515245 * x + 12345) % MINHASH_PRIME
        a = x or 1
        x = (1103515245 * x + 12345) % MINHASH_PRIME
        out.append((a, x))
    return out


def minhash_signatures(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    k: int = 64, n: int = 3,
) -> DataFrame:
    """(doc_id, sig: array<long>[k]) — MinHash over word n-shingles.

    Plan shape: explode shingles → hash each ONCE (md5 is the expensive
    step) → k arithmetic permutations as k min-aggregates. Partial (map-
    side) aggregation collapses to one row per doc per partition before the
    single shuffle; docs with no shingles produce no row."""
    P = MINHASH_PRIME
    hs = shingle_postings(df, id_col, text_col, n, hashed=True).select(
        "doc_id", F.pmod(F.col("shingle"), F.lit(P)).alias("h")
    )
    aggs = [
        F.min(F.pmod(F.col("h") * a + b, F.lit(P))).alias(f"__m{p}")
        for p, (a, b) in enumerate(perm_params(k))
    ]
    return (
        hs.groupBy("doc_id")
        .agg(*aggs)
        .select("doc_id", F.array(*[f"__m{p}" for p in range(k)]).alias("sig"))
    )


def minhash_lsh_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 64,
    bands: int = 16,
) -> DataFrame:
    """MinHash-LSH candidate generation + exact Jaccard verification.

    Banding: k/bands rows per band; docs colliding on any band's
    sub-signature become candidates (bucket equi-join — the only shuffle
    that matters; at 10^10 docs the band table is bucketed on band_key).
    Candidates are then verified with exact n-gram Jaccard so the output
    contains no false positives; recall is the standard LSH S-curve
    1-(1-j^r)^b. Signatures are md5-derived (see MINHASH_PRIME note) so the
    DuckDB oracle replays the whole pipeline value-for-value.
    Returns (id_a, id_b, jaccard) — verified pairs.
    """
    r = k // bands
    sig = minhash_signatures(df, id_col, text_col, k)
    band_rows = sig.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.concat_ws(
                        ",",
                        F.transform(
                            F.slice("sig", b * r + 1, r),
                            lambda x: x.cast("string"),
                        ),
                    ).alias("band_key"),
                ),
            )
        ).alias("bk"),
    ).select("doc_id", "bk.band", "bk.band_key")
    left = band_rows.select(F.col("doc_id").alias("id_a"), "band", "band_key")
    right = band_rows.select(F.col("doc_id").alias("id_b"), "band", "band_key")
    candidates = (
        left.join(right, ["band", "band_key"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    # exact verification of the (small) candidate set; sizes ride along as
    # window counts (same shape as jaccard_pairs — no size join-backs)
    sh = shingle_postings(df, id_col, text_col, 3, hashed=True).withColumn(
        "n_shingles", F.count("*").over(Window.partitionBy("doc_id"))
    )
    verified = (
        candidates.join(
            sh.select(
                F.col("doc_id").alias("id_a"), "shingle",
                F.col("n_shingles").alias("sa"),
            ),
            "id_a",
        )
        .join(
            sh.select(
                F.col("doc_id").alias("id_b"),
                F.col("shingle").alias("sh_b"),
                F.col("n_shingles").alias("sb"),
            ),
            "id_b",
        )
        .where(F.col("shingle") == F.col("sh_b"))
        .groupBy("id_a", "id_b")
        .agg(
            F.count("*").alias("inter"),
            F.max("sa").alias("sa"),
            F.max("sb").alias("sb"),
        )
        .select(
            "id_a",
            "id_b",
            (
                F.col("inter").cast("double")
                / (F.col("sa") + F.col("sb") - F.col("inter"))
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )
    return verified


# ------------------------------------------------------------ simhash

SIMHASH_BITS = 60  # the md5-derived base hash carries 60 bits (h60)


def simhash_df(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, simhash) — per-bit majority vote of term-hash bits weighted by
    term frequency, over the 60-bit md5 hash (DuckDB-replicable, see h60).

    Plan shape: one (doc, term, tf) aggregate, then the 60 per-bit weight
    sums as 60 agg columns on a second groupBy — partial aggregation
    collapses map-side, so there is no 60× row explosion and exactly two
    narrow shuffles, all JVM-side."""
    toks = (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.explode(
                F.filter(F.split(normalize_text(F.col(text_col)), " "), lambda t: t != F.lit(""))
            ).alias("term"),
        )
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
        .withColumn("h", h60(F.col("term")))
    )
    bit_sums = [
        F.sum(
            F.when(
                F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, F.col("tf")
            ).otherwise(-F.col("tf"))
        ).alias(f"__s{b}")
        for b in range(SIMHASH_BITS)
    ]
    fingerprint = None
    for b in range(SIMHASH_BITS):
        term = F.when(
            F.col(f"__s{b}") > 0, F.lit(1 << b).cast("long")
        ).otherwise(F.lit(0).cast("long"))
        fingerprint = term if fingerprint is None else fingerprint + term
    return (
        toks.groupBy("doc_id")
        .agg(*bit_sums)
        .select("doc_id", fingerprint.alias("simhash"))
    )


def simhash_pairs(
    df: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) ≤ max_hamming, using 4×15-bit
    block keys: by pigeonhole any pair within distance ≤3 agrees on at
    least one block, so the blocked equi-join loses nothing (standard
    SimHash sharding; at scale each block key is a bucketed join key).
    Returns (id_a, id_b, hamming)."""
    sh = simhash_df(df, id_col, text_col)
    blocks = sh.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("block"),
                        F.shiftright(F.col("simhash"), b * 15)
                        .bitwiseAND(F.lit(0x7FFF))
                        .alias("block_key"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "simhash", "bk.block", "bk.block_key")
    a = blocks.select(
        F.col("doc_id").alias("id_a"), F.col("simhash").alias("sh_a"), "block", "block_key"
    )
    b = blocks.select(
        F.col("doc_id").alias("id_b"), F.col("simhash").alias("sh_b"), "block", "block_key"
    )
    return (
        a.join(b, ["block", "block_key"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).alias("hamming"))
        .distinct()
        .where(F.col("hamming") <= max_hamming)
    )


# ---------------------------------------------------------- substring dedup

def _token_windows(
    df: DataFrame, k: int, id_col: str, text_col: str
) -> DataFrame:
    """(doc_id, whash) — md5 of every k-token sliding window (normalized
    tokens, overlap step 1). The building block of exact substring dedup
    (Lee et al. 2022, "Deduplicating Training Data Makes Language Models
    Better"): any k-token span shared verbatim by two documents yields an
    identical window hash. Map-only: the windows materialize inside one
    higher-order-function projection, no UDF, no shuffle."""
    toks = F.filter(
        F.split(normalize_text(F.col(text_col)), " "),
        lambda t: t != F.lit(""),
    )
    base = df.select(F.col(id_col).alias("doc_id"), toks.alias("ts"))
    ts = F.col("ts")
    windows = F.transform(
        F.slice(ts, 1, F.greatest(F.size(ts) - (k - 1), F.lit(0))),
        lambda t, i: F.md5(F.concat_ws(" ", F.slice(ts, i + 1, k))),
    )
    return base.select("doc_id", F.explode(windows).alias("whash"))


def duplicated_windows(
    df: DataFrame, k: int = 8, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(whash, n_docs, n_occurrences) for every k-token window appearing in
    more than one document — the cross-document verbatim-span table that
    exact substring dedup removes. One partial-aggregated shuffle keyed by
    window hash; at 10^12 windows the distinct-doc count stays a two-phase
    aggregate (no per-key row explosion), and the output is only the
    duplicated tail, orders of magnitude smaller than the input."""
    w = _token_windows(df, k, id_col, text_col)
    return (
        w.groupBy("whash")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count("*").alias("n_occurrences"),
        )
        .filter(F.col("n_docs") > 1)
    )


def doc_dup_window_frac(
    df: DataFrame, k: int = 8, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, n_windows, dup_windows, dup_window_frac) — per document, the
    fraction of its k-token windows that also appear in some OTHER document
    (the per-doc contamination score; docs above a threshold get their
    duplicated spans cut or are dropped whole). Shape: window hashes join
    the duplicated-window set (bounded by the duplicated tail — broadcast
    it when it fits, as any corpus-scale run would), then a doc-keyed
    rollup; docs shorter than k tokens report zero windows."""
    w = _token_windows(df, k, id_col, text_col)
    dup = duplicated_windows(df, k, id_col, text_col).select(
        "whash", F.lit(1).alias("is_dup")
    )
    per_doc = (
        w.join(dup, "whash", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_windows"),
            F.count("is_dup").alias("dup_windows"),
        )
    )
    base = df.select(F.col(id_col).alias("doc_id"))
    return base.join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_windows", F.lit(0)).alias("n_windows"),
        F.coalesce("dup_windows", F.lit(0)).alias("dup_windows"),
        F.round(
            F.coalesce(
                F.col("dup_windows").cast("double")
                / F.greatest(F.col("n_windows").cast("double"), F.lit(1.0)),
                F.lit(0.0),
            ),
            6,
        ).alias("dup_window_frac"),
    )


def _windows_sql(table: str, k: int, id_col: str, text_col: str) -> str:
    return f"""
  SELECT {id_col} AS doc_id,
         md5(array_to_string(ts[i : i + {k - 1}], ' ')) AS whash
  FROM (
    SELECT {id_col},
           list_filter(regexp_split_to_array(regexp_replace(lower({text_col}), '\\s+', ' ', 'g'), ' '),
                       t -> t <> '') AS ts
    FROM {table}
  ), UNNEST(range(1, greatest(len(ts) - {k} + 2, 1))) AS u(i)
"""


def duplicated_windows_sql(
    table: str, k: int = 8, id_col: str = "doc_id", text_col: str = "text"
) -> str:
    return f"""
WITH w AS ({_windows_sql(table, k, id_col, text_col)})
SELECT whash, count(DISTINCT doc_id) AS n_docs, count(*) AS n_occurrences
FROM w GROUP BY whash HAVING count(DISTINCT doc_id) > 1
ORDER BY whash
"""


def doc_dup_window_frac_sql(
    table: str, k: int = 8, id_col: str = "doc_id", text_col: str = "text"
) -> str:
    return f"""
WITH w AS ({_windows_sql(table, k, id_col, text_col)}),
dup AS (
  SELECT whash FROM w GROUP BY whash HAVING count(DISTINCT doc_id) > 1
),
per_doc AS (
  SELECT w.doc_id, count(*) AS n_windows, count(dup.whash) AS dup_windows
  FROM w LEFT JOIN dup USING (whash) GROUP BY w.doc_id
)
SELECT b.{id_col} AS doc_id,
       coalesce(p.n_windows, 0) AS n_windows,
       coalesce(p.dup_windows, 0) AS dup_windows,
       round(coalesce(p.dup_windows * 1.0 / greatest(p.n_windows * 1.0, 1.0), 0.0), 6) AS dup_window_frac
FROM {table} b LEFT JOIN per_doc p ON b.{id_col} = p.doc_id
ORDER BY doc_id
"""


def decontaminate(
    df: DataFrame,
    eval_df: DataFrame,
    k: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_id_col: str = "doc_id",
    eval_text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination: per TRAINING document, the fraction of
    its k-token windows that appear verbatim anywhere in the EVALUATION
    set — the check every serious training pipeline runs before a corpus
    ships (n-gram-overlap decontamination as in GPT-3 appendix C /
    Lee et al. 2022 §6.3: eval text leaking into training data inflates
    benchmark scores). Self-dedup next door (doc_dup_window_frac) asks
    "is this doc a copy of another TRAINING doc"; this asks "does this
    doc contain EVAL text" — same window machinery, different reference
    set, and the remedy differs (drop/redact the training doc; never
    touch the eval set).

    Output: (doc_id, n_windows, eval_windows, contamination_frac) with a
    row for every training doc (zero-window docs report 0.0).

    Scale shape: the eval window set is benchmark-sized (thousands of
    docs) against a 100 TB corpus — it BROADCASTS, so the whole check is
    the corpus's map-only window projection plus one doc-keyed partial
    aggregation; the corpus never shuffles its windows by hash."""
    w = _token_windows(df, k, id_col, text_col)
    ew = (
        _token_windows(eval_df, k, eval_id_col, eval_text_col)
        .select("whash")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    per_doc = (
        w.join(F.broadcast(ew), "whash", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_windows"),
            F.count("hit").alias("eval_windows"),
        )
    )
    base = df.select(F.col(id_col).alias("doc_id"))
    return base.join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_windows", F.lit(0)).cast("long").alias("n_windows"),
        F.coalesce("eval_windows", F.lit(0)).cast("long").alias("eval_windows"),
        F.round(
            F.coalesce(
                F.col("eval_windows").cast("double")
                / F.greatest(F.col("n_windows").cast("double"), F.lit(1.0)),
                F.lit(0.0),
            ),
            6,
        ).alias("contamination_frac"),
    )


def decontaminate_sql(
    train_table: str,
    eval_table: str,
    k: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB twin; eval_table may be a parenthesized subquery."""
    return f"""
WITH w AS ({_windows_sql(train_table, k, id_col, text_col)}),
ew AS (
  SELECT DISTINCT whash FROM ({_windows_sql(eval_table, k, id_col, text_col)})
),
per_doc AS (
  SELECT w.doc_id, count(*) AS n_windows, count(ew.whash) AS eval_windows
  FROM w LEFT JOIN ew USING (whash) GROUP BY w.doc_id
)
SELECT b.{id_col} AS doc_id,
       CAST(coalesce(p.n_windows, 0) AS BIGINT) AS n_windows,
       CAST(coalesce(p.eval_windows, 0) AS BIGINT) AS eval_windows,
       round(coalesce(p.eval_windows * 1.0 / greatest(p.n_windows * 1.0, 1.0), 0.0), 6)
         AS contamination_frac
FROM {train_table} b LEFT JOIN per_doc p ON b.{id_col} = p.doc_id
ORDER BY doc_id
"""
