"""Text analysis for training-data pipelines: language ID, quality scoring,
token counting, document fingerprinting.

All four are pure Column algebra (regex + arithmetic, codegen'd JVM-side),
and each has an exact DuckDB SQL twin below so the driver's oracle can
verify values, not just shapes. At 100 TB these run as map-only stages —
no shuffle at all.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword marker sets (n-gram heuristic). Deliberately
# small + deterministic; the operator's value is the *plan shape* (map-only,
# no UDF) — swap in fastText/CLD3 via a pandas UDF where accuracy matters.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "und", "die", "nicht", "ist"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "los", "que", "de", "por"],
}
# BPE-ish pre-tokenizer: letter runs, digit runs, single punctuation marks.
BPE_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def _padded(col: Column) -> Column:
    return F.concat(F.lit(" "), F.lower(col), F.lit(" "))


def _marker_hits(col: Column, words: list[str]) -> Column:
    """Total occurrences of padded marker words (word-boundary-ish)."""
    padded = _padded(F.regexp_replace(col, r"\s+", " "))
    total = F.lit(0)
    for w in words:
        # occurrences = (len(s) - len(replace(s, w, ''))) / len(w)
        needle = f" {w} "
        total = total + (
            (F.length(padded) - F.length(F.replace(padded, F.lit(needle), F.lit(""))))
            / len(needle)
        ).cast("int")
    return total


def lang_id(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, predicted_lang, marker_hits) — argmax of marker-word hits,
    deterministic tie-break by language code; 'und' when nothing hits."""
    best = F.struct(F.lit(-1).alias("hits"), F.lit("zzz").alias("lang"))
    for lang in sorted(LANG_MARKERS):
        hits = _marker_hits(F.col(text_col), LANG_MARKERS[lang])
        entry = F.struct(hits.alias("hits"), F.lit(lang).alias("lang"))
        best = F.when(
            (entry["hits"] > best["hits"]), entry
        ).otherwise(best)
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und")).alias("predicted_lang"),
        F.greatest(best["hits"], F.lit(0)).alias("marker_hits"),
    )


def token_counts(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, ws_tokens, bpe_tokens, n_chars) — whitespace and BPE-ish regex
    token counts (both `regexp_count`, pure codegen)."""
    t = F.col(text_col)
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.regexp_count(t, F.lit(r"\S+")).cast("long").alias("ws_tokens"),
        F.regexp_count(t, F.lit(BPE_RE)).cast("long").alias("bpe_tokens"),
        F.length(t).cast("long").alias("n_chars"),
    )


def quality_scores(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, alpha_ratio, punct_ratio, stopword_ratio, quality) — the classic
    cheap quality heuristics (length/punct/stopword ratios), rounded to 6
    decimals so Spark and the DuckDB oracle hash identically."""
    t = F.col(text_col)
    n = F.greatest(F.length(t), F.lit(1)).cast("double")
    alpha = F.length(F.regexp_replace(t, r"[^A-Za-z]", "")) / n
    punct = F.length(F.regexp_replace(t, r"[^.,;:!?]", "")) / n
    ws_tokens = F.greatest(F.regexp_count(t, F.lit(r"\S+")), F.lit(1)).cast("double")
    stop = _marker_hits(t, LANG_MARKERS["en"]) / ws_tokens
    quality = alpha * 0.5 + stop * 0.3 + (1.0 - punct) * 0.2
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.round(alpha, 6).alias("alpha_ratio"),
        F.round(punct, 6).alias("punct_ratio"),
        F.round(stop, 6).alias("stopword_ratio"),
        F.round(quality, 6).alias("quality"),
    )


def fingerprints(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, fingerprint) — md5 of whitespace-normalized lowercase text
    (F14 content-hash analog; identical digest in DuckDB)."""
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    return df.select(
        F.col(id_col).alias("doc_id"), F.md5(norm).alias("fingerprint")
    )


def unigram_logprob(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, n_tokens, avg_logprob) — mean log-probability of each doc's
    tokens under the corpus's own unigram distribution (the cheap stand-in
    for CCNet-style LM-perplexity filtering: unusually low avg_logprob =
    out-of-distribution text). Two shuffles total: the corpus unigram
    count (partial-aggregated) and the per-doc mean; the unigram table
    broadcasts at query time in a real deployment.

    Uses natural log of P(t) = count(t)/total_tokens; rounded to 6 dp so
    the DuckDB oracle hashes identically."""
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.filter(
                F.split(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "), " "),
                lambda t: t != F.lit(""),
            )
        ).alias("term"),
    )
    counts = toks.groupBy("term").agg(F.count("*").alias("c"))
    # total tokens IN-PLAN from the (small) unigram table — the old
    # `toks.count()` job re-ran the whole tokenize+explode pass just for
    # this scalar; Σc over counts is the same integer at register cost
    # (broadcast 1-row cross join, the avgdl idiom)
    total = counts.agg(F.sum("c").cast("double").alias("_tot"))
    return (
        toks.join(counts, "term")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(
                F.avg(F.log(F.col("c").cast("double") / F.col("_tot"))), 6
            ).alias("avg_logprob"),
        )
    )


def unigram_logprob_sql(table: str, id_col: str, text_col: str) -> str:
    return f"""
WITH toks AS (
  SELECT {id_col} AS doc_id,
         unnest(list_filter(regexp_split_to_array(regexp_replace(lower({text_col}), '\\s+', ' ', 'g'), ' '),
                            t -> t <> '')) AS term
  FROM {table}
),
counts AS (SELECT term, count(*) AS c FROM toks GROUP BY term),
total AS (SELECT count(*) AS n FROM toks)
SELECT t.doc_id, count(*) AS n_tokens,
       round(avg(ln(c.c * 1.0 / tt.n)), 6) AS avg_logprob
FROM toks t JOIN counts c USING (term) CROSS JOIN total tt
GROUP BY t.doc_id
ORDER BY t.doc_id
"""


def feature_hash_embed(
    df: DataFrame,
    dims: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, dim, weight) — hashing-trick TF vectors: each token maps to
    ``h60(term) % dims`` and weights sum term frequency per dimension. The
    cheap deterministic way to give every doc an embedding the similarity
    stack (cosine/IVF/LSH) can consume — no model, no vocabulary, no
    training; identical arithmetic in the DuckDB oracle. Emitted in sparse
    (doc, dim, weight) form; pivot to dense arrays with
    ``F.array(*)``/groupBy when an array column is needed."""
    from goprowl_spark.operators.dedup import h60

    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.filter(
                F.split(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "), " "),
                lambda t: t != F.lit(""),
            )
        ).alias("term"),
    )
    return (
        toks.select("doc_id", F.pmod(h60(F.col("term")), F.lit(dims)).alias("dim"))
        .groupBy("doc_id", "dim")
        .agg(F.count("*").cast("long").alias("weight"))
    )


def feature_hash_embed_sql(
    table: str, id_col: str, text_col: str, dims: int = 64
) -> str:
    from goprowl_spark.operators.dedup import h60_sql

    return f"""
WITH toks AS (
  SELECT {id_col} AS doc_id,
         unnest(list_filter(regexp_split_to_array(regexp_replace(lower({text_col}), '\\s+', ' ', 'g'), ' '),
                            t -> t <> '')) AS term
  FROM {table}
)
SELECT doc_id, {h60_sql('term')} % {dims} AS dim, count(*) AS weight
FROM toks GROUP BY doc_id, dim
ORDER BY doc_id, dim
"""


# ------------------------------------------------------------ sql twins

def _marker_hits_sql(col: str, words: list[str]) -> str:
    padded = f"(' ' || regexp_replace(lower({col}), '\\s+', ' ', 'g') || ' ')"
    parts = [
        f"CAST((length({padded}) - length(replace({padded}, ' {w} ', ''))) / {len(w) + 2} AS INT)"
        for w in words
    ]
    return "(" + " + ".join(parts) + ")"


def lang_id_sql(table: str, id_col: str, text_col: str) -> str:
    langs = sorted(LANG_MARKERS)
    hit_exprs = {
        lang: _marker_hits_sql(text_col, LANG_MARKERS[lang]) for lang in langs
    }
    # fold the same when-chain as the Spark side (> beats, first wins ties)
    best_hits = "-1"
    best_lang = "'zzz'"
    for lang in langs:
        h = f"h_{lang}"
        best_lang = f"(CASE WHEN {h} > {best_hits} THEN '{lang}' ELSE {best_lang} END)"
        best_hits = f"(CASE WHEN {h} > {best_hits} THEN {h} ELSE {best_hits} END)"
    hits_cols = ", ".join(f"{hit_exprs[l]} AS h_{l}" for l in langs)
    return f"""
WITH h AS (SELECT {id_col} AS doc_id, {hits_cols} FROM {table})
SELECT doc_id,
       CASE WHEN {best_hits} > 0 THEN {best_lang} ELSE 'und' END AS predicted_lang,
       greatest({best_hits}, 0) AS marker_hits
FROM h
ORDER BY doc_id
"""


def token_counts_sql(table: str, id_col: str, text_col: str) -> str:
    return f"""
SELECT {id_col} AS doc_id,
       len(regexp_extract_all({text_col}, '\\S+')) AS ws_tokens,
       len(regexp_extract_all({text_col}, '{BPE_RE}')) AS bpe_tokens,
       length({text_col}) AS n_chars
FROM {table}
ORDER BY doc_id
"""


def quality_scores_sql(table: str, id_col: str, text_col: str) -> str:
    t = text_col
    n = f"greatest(length({t}), 1) * 1.0"
    alpha = f"(length(regexp_replace({t}, '[^A-Za-z]', '', 'g')) / {n})"
    punct = f"(length(regexp_replace({t}, '[^.,;:!?]', '', 'g')) / {n})"
    ws = f"greatest(len(regexp_extract_all({t}, '\\S+')), 1) * 1.0"
    stop = f"({_marker_hits_sql(t, LANG_MARKERS['en'])} / {ws})"
    quality = f"({alpha} * 0.5 + {stop} * 0.3 + (1.0 - {punct}) * 0.2)"
    return f"""
SELECT {id_col} AS doc_id,
       round({alpha}, 6) AS alpha_ratio,
       round({punct}, 6) AS punct_ratio,
       round({stop}, 6) AS stopword_ratio,
       round({quality}, 6) AS quality
FROM {table}
ORDER BY doc_id
"""


def fingerprints_sql(table: str, id_col: str, text_col: str) -> str:
    return f"""
SELECT {id_col} AS doc_id,
       md5(trim(regexp_replace(lower({text_col}), '\\s+', ' ', 'g'))) AS fingerprint
FROM {table}
ORDER BY doc_id
"""


def repetition_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, n_tokens, top_bigram_frac, dup_bigram_frac, dup_trigram_frac)
    — Gopher-style repetition filters (Rae et al. 2021, table A1): the
    fraction of a document covered by its most frequent word 2-gram and
    the fraction of n-gram occurrences whose n-gram repeats within the
    document. High values flag boilerplate / spam / degenerate text that
    per-corpus dedup can't see (the repetition is *inside* one document).

    Plan shape: one explode pass emits bigrams AND trigrams tagged by n
    (no second scan), then two partial-aggregated shuffles — (doc, n,
    gram) counts, (doc, n) rollup — and a doc-keyed join back to the base
    row for token counts. Everything is Column algebra (whole-stage
    codegen); at 100 TB the gram aggregation map-side-combines within a
    doc's partition, so shuffle volume is bounded by distinct grams, not
    occurrences. Fractions round to 6 dp so the DuckDB twin hashes
    identically; docs too short for an n-gram report 0.0, not null.
    """
    toks = F.filter(
        F.split(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "), " "),
        lambda t: t != F.lit(""),
    )
    base = df.select(F.col(id_col).alias("doc_id"), toks.alias("ts"))
    ts = F.col("ts")
    n_toks = F.size(ts)
    bigrams = F.transform(
        F.slice(ts, 1, F.greatest(n_toks - 1, F.lit(0))),
        lambda t, i: F.concat_ws(" ", t, F.element_at(ts, i + 2)),
    )
    trigrams = F.transform(
        F.slice(ts, 1, F.greatest(n_toks - 2, F.lit(0))),
        lambda t, i: F.concat_ws(
            " ", t, F.element_at(ts, i + 2), F.element_at(ts, i + 3)
        ),
    )
    tag = lambda arr, n: F.transform(  # noqa: E731
        arr, lambda g: F.struct(F.lit(n).alias("n"), g.alias("gram"))
    )
    grams = base.select(
        "doc_id", F.explode(F.concat(tag(bigrams, 2), tag(trigrams, 3))).alias("g")
    ).select("doc_id", F.col("g.n").alias("n"), F.col("g.gram").alias("gram"))
    counts = grams.groupBy("doc_id", "n", "gram").agg(F.count("*").alias("c"))
    per_n = counts.groupBy("doc_id", "n").agg(
        F.max("c").alias("top_cnt"),
        F.sum("c").alias("total_occ"),
        F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0)).alias("dup_occ"),
    )
    two, three = F.col("n") == 2, F.col("n") == 3
    stats = per_n.groupBy("doc_id").agg(
        F.max(F.when(two, F.col("top_cnt"))).alias("b_top"),
        F.max(F.when(two, F.col("total_occ"))).alias("b_total"),
        F.max(F.when(two, F.col("dup_occ"))).alias("b_dup"),
        F.max(F.when(three, F.col("total_occ"))).alias("t_total"),
        F.max(F.when(three, F.col("dup_occ"))).alias("t_dup"),
    )
    nt = F.col("n_tokens").cast("double")
    frac = lambda num, den: F.round(  # noqa: E731
        F.coalesce(num.cast("double") / F.greatest(den, F.lit(1.0)), F.lit(0.0)), 6
    )
    return (
        base.select("doc_id", n_toks.cast("long").alias("n_tokens"))
        .join(stats, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            frac(F.col("b_top") * 2, nt).alias("top_bigram_frac"),
            frac(F.col("b_dup"), F.col("b_total").cast("double")).alias(
                "dup_bigram_frac"
            ),
            frac(F.col("t_dup"), F.col("t_total").cast("double")).alias(
                "dup_trigram_frac"
            ),
        )
    )


def repetition_stats_sql(table: str, id_col: str, text_col: str) -> str:
    return f"""
WITH base AS (
  SELECT {id_col} AS doc_id,
         list_filter(regexp_split_to_array(regexp_replace(lower({text_col}), '\\s+', ' ', 'g'), ' '),
                     t -> t <> '') AS ts
  FROM {table}
),
grams AS (
  SELECT doc_id, 2 AS n, ts[i] || ' ' || ts[i + 1] AS gram
  FROM base, UNNEST(range(1, greatest(len(ts), 1))) AS u(i)
  UNION ALL
  SELECT doc_id, 3 AS n, ts[i] || ' ' || ts[i + 1] || ' ' || ts[i + 2] AS gram
  FROM base, UNNEST(range(1, greatest(len(ts) - 1, 1))) AS u(i)
),
counts AS (SELECT doc_id, n, gram, count(*) AS c FROM grams GROUP BY doc_id, n, gram),
per_n AS (
  SELECT doc_id, n, max(c) AS top_cnt, sum(c) AS total_occ,
         sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup_occ
  FROM counts GROUP BY doc_id, n
),
stats AS (
  SELECT doc_id,
         max(CASE WHEN n = 2 THEN top_cnt END) AS b_top,
         max(CASE WHEN n = 2 THEN total_occ END) AS b_total,
         max(CASE WHEN n = 2 THEN dup_occ END) AS b_dup,
         max(CASE WHEN n = 3 THEN total_occ END) AS t_total,
         max(CASE WHEN n = 3 THEN dup_occ END) AS t_dup
  FROM per_n GROUP BY doc_id
)
SELECT b.doc_id, len(b.ts) AS n_tokens,
       round(coalesce(s.b_top * 2 * 1.0 / greatest(len(b.ts) * 1.0, 1.0), 0.0), 6) AS top_bigram_frac,
       round(coalesce(s.b_dup * 1.0 / greatest(s.b_total * 1.0, 1.0), 0.0), 6) AS dup_bigram_frac,
       round(coalesce(s.t_dup * 1.0 / greatest(s.t_total * 1.0, 1.0), 0.0), 6) AS dup_trigram_frac
FROM base b LEFT JOIN stats s USING (doc_id)
ORDER BY b.doc_id
"""
