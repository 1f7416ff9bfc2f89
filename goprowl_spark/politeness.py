"""Politeness: robots.txt rules + per-host fetch budgets.

Reference behaviors rebuilt:
* robots.txt honored via colly's temoto/robotstxt dependency (go.mod:59,
  TODO.md:40) → here an explicit ``robots_rules`` table joined per host;
* per-domain parallelism / delay limits (``colly.LimitRule{DomainGlob,
  Parallelism, RandomDelay}``, search/crawlers/colly.go:201-207,
  config.go:25-26) → a per-round per-host fetch budget enforced as a
  window top-k. Wall-clock delays are meaningless in a batch round; the
  budget models the same rate limit deterministically.

Skew note (north_rule): one hot host can hold a large share of the frontier.
``row_number`` over ``partitionBy(host)`` puts a whole host in one task —
the classic skew trap. :func:`pop_batch` therefore two-phases it: a salted
pre-rank bounds each task to ``budget`` rows per salt lane, then the tiny
survivor set (≤ salt·budget per host) is exactly re-ranked. AQE skew-join
handling covers the joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_SALT = 16


def apply_robots(candidates: DataFrame, robots_rules: DataFrame | None) -> DataFrame:
    """Drop candidate URLs disallowed by their host's robots rules.

    Broadcast join (robots table is per-host, small); prefix matching is a
    JVM-side higher-order function — no UDF.
    """
    if robots_rules is None:
        return candidates
    path = F.coalesce(F.parse_url(F.col("url"), F.lit("PATH")), F.lit("/"))
    joined = candidates.join(
        F.broadcast(robots_rules.select("host", "disallow_prefixes")),
        on="host",
        how="left",
    )
    disallowed = F.exists(
        F.coalesce(F.col("disallow_prefixes"), F.array()),
        lambda p: path.startswith(p),
    )
    return joined.where(~disallowed).drop("disallow_prefixes")


def parse_robots_txt(
    robots: DataFrame, host_col: str = "host", body_col: str = "body"
) -> DataFrame:
    """(host, disallow_prefixes) parsed from raw robots.txt bodies — the
    fetch-side of P5 (the reference delegates to temoto/robotstxt via
    colly, go.mod:59; here the parse itself is a distributed relational
    computation, no per-row stateful code).

    Grammar honored (the subset the rules table consumes): groups =
    consecutive ``User-agent:`` lines followed by their rules; a group
    applies when any of its agents is ``*``; ``Disallow:`` values in
    applying groups become prefixes (empty value = allow-all, per the
    spec); ``#`` comments stripped; blank lines ignored (Google-parser
    behavior). Entirely window algebra over posexploded lines, so the
    DuckDB oracle replays it exactly.
    """
    lines = robots.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(body_col), "\n")).alias("idx", "raw"),
    )
    clean = F.trim(F.split(F.col("raw"), "#")[0])
    lower = F.lower(clean)
    is_ua = lower.startswith("user-agent:")
    is_dis = lower.startswith("disallow:")
    # value = everything after the FIRST colon (paths may contain ':')
    val = F.trim(F.regexp_replace(clean, r"^[^:]*:", ""))
    w = Window.partitionBy("host").orderBy("idx")
    marked = (
        lines.select(
            "host",
            "idx",
            is_ua.alias("is_ua"),
            is_dis.alias("is_dis"),
            val.alias("val"),
        )
        .withColumn(
            "is_block_start",
            (
                F.col("is_ua")
                & ~F.coalesce(F.lag("is_ua").over(w), F.lit(False))
            ).cast("int"),
        )
        .withColumn(
            "block_id",
            F.sum("is_block_start").over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
    )
    star_blocks = (
        marked.where(F.col("is_ua") & (F.col("val") == "*"))
        .select("host", "block_id")
        .distinct()
    )
    return (
        marked.where(F.col("is_dis") & (F.col("val") != ""))
        .join(star_blocks, ["host", "block_id"])
        .groupBy("host")
        .agg(F.array_sort(F.collect_set("val")).alias("disallow_prefixes"))
    )


def parse_robots_txt_sql(robots_cte: str) -> str:
    """DuckDB twin of parse_robots_txt over a CTE/table ``(host, body)``;
    returns (host, prefix) EXPLODED and ordered (array columns don't
    hash portably across engines; the gate compares the exploded form)."""
    return f"""
lines AS (
  SELECT host, i - 1 AS idx, arr[i] AS raw
  FROM (SELECT host, regexp_split_to_array(body, '\n') AS arr FROM {robots_cte}),
       unnest(generate_series(1, len(arr))) t(i)
),
marked0 AS (
  SELECT host, idx,
         lower(trim(str_split(raw, '#')[1])) LIKE 'user-agent:%' AS is_ua,
         lower(trim(str_split(raw, '#')[1])) LIKE 'disallow:%' AS is_dis,
         trim(regexp_replace(trim(str_split(raw, '#')[1]), '^[^:]*:', '')) AS val
  FROM lines
),
marked1 AS (
  SELECT host, idx, is_ua, is_dis, val,
         CASE WHEN is_ua AND NOT coalesce(
           lag(is_ua) OVER (PARTITION BY host ORDER BY idx), FALSE)
         THEN 1 ELSE 0 END AS is_block_start
  FROM marked0
),
marked AS (
  SELECT host, idx, is_ua, is_dis, val,
         sum(is_block_start)
           OVER (PARTITION BY host ORDER BY idx ROWS UNBOUNDED PRECEDING) AS block_id
  FROM marked1
),
star_blocks AS (
  SELECT DISTINCT host, block_id FROM marked WHERE is_ua AND val = '*'
),
prefixes AS (
  SELECT DISTINCT m.host, m.val AS prefix
  FROM marked m JOIN star_blocks s USING (host, block_id)
  WHERE m.is_dis AND m.val <> ''
)"""


def pop_batch(
    frontier: DataFrame,
    host_budget: DataFrame | None,
    default_budget: int | None = None,
    salt: int = DEFAULT_SALT,
) -> DataFrame:
    """Select this round's fetch batch from the frontier (W1+W2).

    Ordering is defined purely by data — (priority desc, depth asc, url asc)
    within each host — never by execution order, so the pop is deterministic
    and reproducible from any snapshot (trace-equality requirement).

    ``default_budget=None`` means unlimited (pop the whole frontier → rounds
    coincide with BFS depth levels, matching the reference's plain BFS).
    """
    if host_budget is None and default_budget is None:
        return frontier

    budget = F.coalesce(
        F.col("max_fetches_per_round"),
        F.lit(default_budget if default_budget is not None else 1 << 62),
    )
    df = frontier
    if host_budget is not None:
        df = df.join(
            F.broadcast(host_budget.select("host", "max_fetches_per_round")),
            on="host",
            how="left",
        )
    else:
        df = df.withColumn("max_fetches_per_round", F.lit(None).cast("int"))

    order = [F.col("priority").desc(), F.col("depth").asc(), F.col("url").asc()]

    # Phase 1 (salted, skew-proof): cap each of `salt` lanes per host at
    # `budget` rows — survivors ≤ salt*budget per host, exact top rows of
    # each lane so no qualifying row is lost.
    lane = F.pmod(F.xxhash64(F.col("url")), F.lit(salt))
    w_lane = Window.partitionBy("host", lane).orderBy(*order)
    pre = (
        df.withColumn("__lane_rn", F.row_number().over(w_lane))
        .where(F.col("__lane_rn") <= budget)
        .drop("__lane_rn")
    )

    # Phase 2 (exact): global per-host rank over the bounded survivor set.
    w_host = Window.partitionBy("host").orderBy(*order)
    return (
        pre.withColumn("__rn", F.row_number().over(w_host))
        .where(F.col("__rn") <= budget)
        .drop("__rn", "max_fetches_per_round")
    )
