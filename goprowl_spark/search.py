"""Search: query parsing + Catalyst Column compilation (SURVEY.md §2.9/§3.2).

The reference parses whitespace-split token streams into QueryTerm lists
(search/engine/query.go:31-120) and brute-force scores every stored doc
(basic_search.go:22-102, calculateRelevancy :242-289). Here the same
QueryTerm IR compiles to a single Catalyst Column expression — one scan,
whole-stage codegen, no UDF — plus an equivalent ANSI-SQL expression
generator used by the DuckDB correctness oracle.

Bug-compatible quirks preserved (each pinned by tests):
* AND/NOT set Required/Excluded flags that scoring never consults
  (query.go:40-59; no consumer in basic_search.go) — replicated by default,
  enforced when ``strict=True``;
* phrase parsing strips the closing quote only from *appended* tokens, so a
  single-token phrase keeps its trailing quote (query.go:63-77);
* phrase and fuzzy matching are case-SENSITIVE contains; simple/field terms
  are case-insensitive (basic_search.go:242-289);
* fuzziness parses the first byte after '~' as a digit (query.go:80-92) but
  matching ignores it (plain contains); ``strict=True`` upgrades fuzzy
  terms to REAL edit-distance matching (any whitespace token within
  ``levenshtein() <= max(fuzziness, 1)`` of the term, case-insensitive —
  the behavior the reference's '~' syntax promises but never implements);
* scoring weights: phrase 3/2, fuzzy 2/1, title 2, content 1; unknown
  field → 0;
* facets count doc types over ALL docs, not the filtered hits
  (basic_search.go:79-92);
* the reference's unstable score sort (basic_search.go:54-56) is replaced
  by a deterministic (score desc, id asc) order — documented improvement.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SIMPLE, PHRASE, FUZZY, BOOLEAN = 0, 1, 2, 3


@dataclass
class QueryTerm:
    text: str
    field: str = ""
    type: int = SIMPLE
    fuzziness: int = 0
    required: bool = False
    excluded: bool = False
    # Term importance (processor.go:23). ParseQuery never sets it in the
    # reference either — callers set it programmatically; the ranker's
    # BoostScore multiplies it in (ranker.go:35-41). Default 1.0 (neutral)
    # rather than Go's zero-value so scoring without a boost is unchanged.
    boost: float = 1.0


def parse_query(query_str: str, processor: bool = False) -> list[QueryTerm]:
    """Token-level port of QueryProcessor.ParseQuery. Two reference parsers
    exist: the wired-in one (query.go:31-120, ``processor=False``) treats a
    bare OR as an ordinary term; the richer engine/query/processor.go:34-119
    (``processor=True``) consumes OR as a no-op operator (its :54-55 skip).
    Everything else is token-identical between them."""
    tokens = query_str.split()
    out: list[QueryTerm] = []
    i = 0
    while i < len(tokens):
        tok = tokens[i]
        upper = tok.upper()
        if processor and upper == "OR":
            i += 1
            continue
        if upper == "AND":
            if i + 1 < len(tokens):
                i += 1
                out.append(QueryTerm(text=tokens[i], required=True))
            i += 1
            continue
        if upper == "NOT":
            if i + 1 < len(tokens):
                i += 1
                out.append(QueryTerm(text=tokens[i], excluded=True))
            i += 1
            continue
        if tok.startswith('"'):
            phrase = [tok[1:]]
            i += 1
            while i < len(tokens):
                phrase.append(tokens[i])
                if tokens[i].endswith('"'):
                    phrase[-1] = phrase[-1][:-1]
                    i += 1
                    break
                i += 1
            out.append(QueryTerm(text=" ".join(phrase), type=PHRASE))
            continue
        if "~" in tok:
            parts = tok.split("~")
            fuzz = 1
            if len(parts) > 1 and parts[1] != "":
                fuzz = ord(parts[1][0]) - ord("0")
            out.append(QueryTerm(text=parts[0], type=FUZZY, fuzziness=fuzz))
            i += 1
            continue
        if ":" in tok:
            parts = tok.split(":")
            out.append(QueryTerm(text=parts[1], field=parts[0]))
            i += 1
            continue
        out.append(QueryTerm(text=tok))
        i += 1
    return out


# ------------------------------------------------------------ spark compile

def term_score_col(
    term: QueryTerm, title: Column, content: Column, fuzzy_lev: bool = False
) -> Column:
    """calculateRelevancy for one term (basic_search.go:242-289), times the
    term's Boost (processor.go:23 + BoostScore multiply, ranker.go:35-41).
    ``fuzzy_lev`` (strict mode) swaps fuzzy terms' contains for real
    token-level edit distance — JVM-side ``exists``/``levenshtein``."""
    def hit(col: Column, needle: str, w: float, ci: bool) -> Column:
        c = F.lower(col) if ci else col
        n = needle.lower() if ci else needle
        return F.when(c.contains(F.lit(n)), F.lit(w)).otherwise(F.lit(0.0))

    def lev_hit(col: Column, w: float) -> Column:
        dist = max(term.fuzziness, 1)
        # split on \s+ yields '' tokens for empty text or edge whitespace,
        # and levenshtein('', t) == len(t) would make any short fuzzy term
        # match every such document — drop empty tokens first
        tokens = F.filter(
            F.split(F.lower(col), r"\s+"), lambda t: t != F.lit("")
        )
        m = F.exists(
            tokens,
            lambda t: F.levenshtein(t, F.lit(term.text.lower())) <= F.lit(dist),
        )
        return F.when(m, F.lit(w)).otherwise(F.lit(0.0))

    if term.type == PHRASE:
        raw = hit(title, term.text, 3.0, False) + hit(content, term.text, 2.0, False)
    elif term.type == FUZZY and fuzzy_lev:
        raw = lev_hit(title, 2.0) + lev_hit(content, 1.0)
    elif term.type == FUZZY:
        raw = hit(title, term.text, 2.0, False) + hit(content, term.text, 1.0, False)
    elif term.field == "title":
        raw = hit(title, term.text, 2.0, True)
    elif term.field == "content":
        raw = hit(content, term.text, 1.0, True)
    elif term.field:
        raw = F.lit(0.0)
    else:
        raw = hit(title, term.text, 2.0, True) + hit(content, term.text, 1.0, True)
    return raw if term.boost == 1.0 else raw * F.lit(term.boost)


def term_match_col(
    term: QueryTerm, title: Column, content: Column, fuzzy_lev: bool = False
) -> Column:
    """Whether the term matches at all (strict AND/NOT enforcement)."""
    return term_score_col(term, title, content, fuzzy_lev) > 0


def compile_score(
    terms: list[QueryTerm],
    title: Column,
    content: Column,
    fuzzy_lev: bool = False,
) -> Column:
    score = F.lit(0.0)
    for t in terms:
        score = score + term_score_col(t, title, content, fuzzy_lev)
    return score


def search(
    documents: DataFrame,
    query_str: str,
    filters: dict[str, str] | None = None,
    page: int = 1,
    size: int = 10,
    strict: bool = False,
    id_col: str = "doc_id",
    title_col: str = "title",
    content_col: str = "content",
    type_col: str = "doc_type",
    processor: bool = False,
    terms: list[QueryTerm] | None = None,
) -> DataFrame:
    """The Search pipeline (basic_search.go:22-102): score → filters →
    score>0 → deterministic sort → offset/limit pagination.

    Pagination is sort + OFFSET/LIMIT — the reference's slice [start:end]
    (basic_search.go:58-76). Catalyst compiles it to TakeOrderedAndProject
    (per-partition partial top-(page·size), then merge), so unlike a
    row_number window with no partitionBy, NO single-partition global
    shuffle happens — only ≤page·size rows ever leave each partition.
    Returns (id, score) plus pass-through columns.
    """
    if terms is None:
        terms = parse_query(query_str, processor=processor)
    title, content = F.col(title_col), F.col(content_col)
    score = compile_score(terms, title, content, fuzzy_lev=strict)
    df = documents.withColumn("score", score)
    for k, v in (filters or {}).items():
        if k == "type":  # only `type` implemented (basic_search.go:291-302)
            df = df.where(F.col(type_col) == F.lit(v))
    if strict:
        for t in terms:
            m = term_match_col(t, title, content, fuzzy_lev=strict)
            if t.required:
                df = df.where(m)
            elif t.excluded:
                df = df.where(~m)
    df = df.where(F.col("score") > 0)
    start = (page - 1) * size
    return (
        df.orderBy(F.col("score").desc(), F.col(id_col).asc())
        .offset(start)
        .limit(size)
    )


def facets(documents: DataFrame, type_col: str = "doc_type") -> DataFrame:
    """Facet counts by type over all docs (A1, basic_search.go:79-92)."""
    return documents.groupBy(F.col(type_col).alias("value")).agg(
        F.count("*").alias("count")
    )


# ------------------------------------------------------------ sql compile

def _sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def term_score_sql(term: QueryTerm, title: str, content: str) -> str:
    def hit(col: str, needle: str, w: float, ci: bool) -> str:
        c = f"lower({col})" if ci else col
        n = needle.lower() if ci else needle
        return f"(CASE WHEN contains({c}, {_sql_quote(n)}) THEN {w} ELSE 0.0 END)"

    if term.type == PHRASE:
        raw = f"({hit(title, term.text, 3.0, False)} + {hit(content, term.text, 2.0, False)})"
    elif term.type == FUZZY:
        raw = f"({hit(title, term.text, 2.0, False)} + {hit(content, term.text, 1.0, False)})"
    elif term.field == "title":
        raw = hit(title, term.text, 2.0, True)
    elif term.field == "content":
        raw = hit(content, term.text, 1.0, True)
    elif term.field:
        raw = "0.0"
    else:
        raw = f"({hit(title, term.text, 2.0, True)} + {hit(content, term.text, 1.0, True)})"
    return raw if term.boost == 1.0 else f"({raw} * {term.boost})"


def compile_score_sql(terms: list[QueryTerm], title: str, content: str) -> str:
    if not terms:
        return "0.0"
    return " + ".join(term_score_sql(t, title, content) for t in terms)


def search_oracle_sql(
    query_str: str,
    table: str,
    id_col: str,
    title_expr: str,
    content_expr: str,
    page: int = 1,
    size: int = 10,
    processor: bool = False,
    terms: list[QueryTerm] | None = None,
) -> str:
    """ANSI SQL (DuckDB) equivalent of :func:`search` — same QueryTerm IR,
    same weights, same deterministic order, same pagination window."""
    if terms is None:
        terms = parse_query(query_str, processor=processor)
    score = compile_score_sql(terms, title_expr, content_expr)
    start = (page - 1) * size
    return f"""
WITH scored AS (
  -- DuckDB folds the literal weights into DECIMAL; Spark's score is DOUBLE.
  -- CAST keeps the oracle's column type identical to the engine's.
  SELECT {id_col} AS doc_id, CAST({score} AS DOUBLE) AS score
  FROM {table}
)
SELECT doc_id, score FROM scored
WHERE score > 0
ORDER BY score DESC, doc_id ASC
LIMIT {size} OFFSET {start}
"""
