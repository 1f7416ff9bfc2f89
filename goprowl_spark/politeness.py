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

    Broadcast join (robots table is per-host, small); matching is JVM-side
    higher-order-function algebra — no UDF.

    Two rule-table shapes are accepted:

    * ``(host, rules array<struct<prefix,allow,plen,pattern>>)`` — the full
      REP grammar from :func:`parse_robots_txt`: Allow + Disallow with
      longest-match precedence (RFC 9309 / Google parser: the matching rule
      with the longest ``prefix`` wins; equal lengths → Allow wins) and
      ``*``/``$`` wildcards, matched via the precompiled ``pattern``.
    * ``(host, disallow_prefixes array<string>)`` — the legacy
      Disallow-only prefix shape (kept for hand-built rule tables).
    """
    if robots_rules is None:
        return candidates
    path = F.coalesce(F.parse_url(F.col("url"), F.lit("PATH")), F.lit("/"))
    if "rules" in robots_rules.columns:
        joined = candidates.join(
            F.broadcast(robots_rules.select("host", "rules")),
            on="host",
            how="left",
        )
        matches = F.filter(
            F.coalesce(F.col("rules"), F.array()),
            lambda r: F.regexp_like(path, r["pattern"]),
        )

        def best(pred):
            return F.aggregate(
                F.filter(matches, pred),
                F.lit(-1),
                lambda acc, r: F.greatest(acc, r["plen"]),
            )

        best_dis = best(lambda r: ~r["allow"])
        best_allow = best(lambda r: r["allow"])
        allowed = (best_dis == F.lit(-1)) | (best_allow >= best_dis)
        return joined.where(allowed).drop("rules")
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


def robots_pattern(prefix: Column) -> Column:
    """Compile a robots rule value to a Java regex (anchored at the path
    start): ``*`` → ``.*``, a TRAILING ``$`` → end anchor, everything else
    literal (REP / Google-parser wildcard grammar). Pure column algebra."""
    anchored = prefix.endswith("$")
    base = F.when(
        anchored, prefix.substr(F.lit(1), F.length(prefix) - 1)
    ).otherwise(prefix)
    esc = F.regexp_replace(base, r"([.^$|?+(){}\[\]\\])", r"\\$1")
    wild = F.regexp_replace(esc, r"\*", ".*")
    return F.concat(
        F.lit("^"), wild, F.when(anchored, F.lit("$")).otherwise(F.lit(""))
    )


def parse_robots_txt(
    robots: DataFrame,
    host_col: str = "host",
    body_col: str = "body",
    user_agent: str | None = None,
) -> DataFrame:
    """(host, rules, crawl_delay) parsed from raw robots.txt bodies — the
    fetch-side of P5 (the reference delegates to temoto/robotstxt via
    colly, go.mod:59; here the parse itself is a distributed relational
    computation, no per-row stateful code).

    Full REP grammar (RFC 9309 / temoto-robotstxt parity):

    * groups = consecutive ``User-agent:`` lines followed by their rules;
    * group selection: with ``user_agent`` given, hosts that have a group
      for that agent (case-insensitive token match) use ONLY those groups;
      otherwise (and for hosts without one) the ``*`` groups apply — the
      specific-UA-overrides-star rule;
    * ``Allow:`` AND ``Disallow:`` values become rules (empty value = no
      rule, per spec); matching precedence is longest-``prefix``-wins with
      Allow winning ties (:func:`apply_robots`);
    * ``*`` / trailing ``$`` wildcards are compiled to the ``pattern``
      column by :func:`robots_pattern`;
    * ``Crawl-delay:`` (non-standard, parsed by temoto) → per-host max
      seconds, surfaced for budget derivation;
    * ``#`` comments stripped; blank lines ignored.

    Entirely window algebra over posexploded lines, so the DuckDB oracle
    replays rule extraction exactly (patterns are engine-internal — the
    gate compares (host, prefix, allow)).
    """
    lines = robots.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(body_col), "\n")).alias("idx", "raw"),
    )
    clean = F.trim(F.split(F.col("raw"), "#")[0])
    lower = F.lower(clean)
    is_ua = lower.startswith("user-agent:")
    is_dis = lower.startswith("disallow:")
    is_allow = lower.startswith("allow:")
    is_delay = lower.startswith("crawl-delay:")
    # value = everything after the FIRST colon (paths may contain ':')
    val = F.trim(F.regexp_replace(clean, r"^[^:]*:", ""))
    w = Window.partitionBy("host").orderBy("idx")
    marked = (
        lines.select(
            "host",
            "idx",
            is_ua.alias("is_ua"),
            is_dis.alias("is_dis"),
            is_allow.alias("is_allow"),
            is_delay.alias("is_delay"),
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
    if user_agent is not None:
        spec_blocks = (
            marked.where(
                F.col("is_ua") & (F.lower(F.col("val")) == user_agent.lower())
            )
            .select("host", "block_id")
            .distinct()
        )
        hosts_with_spec = spec_blocks.select("host").distinct()
        chosen = spec_blocks.unionByName(
            star_blocks.join(hosts_with_spec, "host", "left_anti")
        )
    else:
        chosen = star_blocks
    rule_rows = (
        marked.where(
            (F.col("is_dis") | F.col("is_allow")) & (F.col("val") != "")
        )
        .join(chosen, ["host", "block_id"])
        .select(
            "host",
            F.struct(
                F.col("val").alias("prefix"),
                F.col("is_allow").alias("allow"),
                F.length("val").alias("plen"),
                robots_pattern(F.col("val")).alias("pattern"),
            ).alias("rule"),
        )
    )
    rules = rule_rows.groupBy("host").agg(
        F.array_sort(F.collect_set("rule")).alias("rules")
    )
    delays = (
        marked.where(F.col("is_delay"))
        .join(chosen, ["host", "block_id"])
        .groupBy("host")
        .agg(F.max(F.expr("try_cast(val AS double)")).alias("crawl_delay"))
    )
    return (
        rules.join(delays, "host", "full_outer")
        .withColumn("rules", F.coalesce("rules", F.array()))
        .select("host", "rules", "crawl_delay")
    )


def parse_robots_txt_sql(robots_cte: str, user_agent: str | None = None) -> str:
    """DuckDB twin of parse_robots_txt over a CTE/table ``(host, body)``;
    ends in ``rules(host, prefix, allow)`` EXPLODED (array/struct columns
    don't hash portably across engines; the gate compares the exploded
    form — the compiled regex ``pattern`` is engine-internal and not
    compared). Replays UA-group selection when ``user_agent`` is given."""
    if user_agent is not None:
        ua = user_agent.lower().replace("'", "''")
        chosen = f"""spec_blocks AS (
  SELECT DISTINCT host, block_id FROM marked WHERE is_ua AND lower(val) = '{ua}'
),
chosen AS (
  SELECT host, block_id FROM spec_blocks
  UNION
  SELECT s.host, s.block_id FROM star_blocks s
  WHERE s.host NOT IN (SELECT host FROM spec_blocks)
)"""
    else:
        chosen = "chosen AS (SELECT host, block_id FROM star_blocks)"
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
         lower(trim(str_split(raw, '#')[1])) LIKE 'allow:%' AS is_allow,
         trim(regexp_replace(trim(str_split(raw, '#')[1]), '^[^:]*:', '')) AS val
  FROM lines
),
marked1 AS (
  SELECT host, idx, is_ua, is_dis, is_allow, val,
         CASE WHEN is_ua AND NOT coalesce(
           lag(is_ua) OVER (PARTITION BY host ORDER BY idx), FALSE)
         THEN 1 ELSE 0 END AS is_block_start
  FROM marked0
),
marked AS (
  SELECT host, idx, is_ua, is_dis, is_allow, val,
         sum(is_block_start)
           OVER (PARTITION BY host ORDER BY idx ROWS UNBOUNDED PRECEDING) AS block_id
  FROM marked1
),
star_blocks AS (
  SELECT DISTINCT host, block_id FROM marked WHERE is_ua AND val = '*'
),
{chosen},
rules AS (
  SELECT DISTINCT m.host, m.val AS prefix, m.is_allow AS allow
  FROM marked m JOIN chosen s USING (host, block_id)
  WHERE (m.is_dis OR m.is_allow) AND m.val <> ''
),
prefixes AS (
  SELECT host, prefix FROM rules WHERE NOT allow
)"""


def budget_from_crawl_delay(
    robots_rules: DataFrame, round_seconds: float
) -> DataFrame:
    """Derive per-host fetch budgets from robots ``Crawl-delay`` — the loop
    the reference closes via colly's LimitRule (Delay paces one request per
    delay per domain, search/crawlers/colly.go:201-207; temoto parses the
    directive). A batch round has no wall clock, so the budget models the
    same rate limit deterministically: a host allowing one fetch per
    ``crawl_delay`` seconds absorbs ``floor(round_seconds / crawl_delay)``
    fetches in a round that represents ``round_seconds`` of wall time —
    floored at 1 so a long delay throttles but never starves a host.

    Input: the (host, rules, crawl_delay) table from
    :func:`parse_robots_txt`. Hosts without a Crawl-delay get no row
    (→ ``default_budget`` applies in :func:`pop_batch`). Output feeds
    ``pop_batch``'s broadcast budget join unchanged.
    """
    return (
        robots_rules.where(
            F.col("crawl_delay").isNotNull() & (F.col("crawl_delay") > 0)
        ).select(
            "host",
            F.greatest(
                F.lit(1),
                F.floor(F.lit(float(round_seconds)) / F.col("crawl_delay")),
            )
            .cast("int")
            .alias("max_fetches_per_round"),
        )
    )


def merge_host_budgets(a: DataFrame, b: DataFrame) -> DataFrame:
    """Combine two (host, max_fetches_per_round) tables; where both bound a
    host the most restrictive (minimum) wins — matching colly, where an
    explicit LimitRule and a robots delay both apply."""
    cols = ["host", "max_fetches_per_round"]
    return (
        a.select(*cols)
        .unionByName(b.select(*cols))
        .groupBy("host")
        .agg(F.min("max_fetches_per_round").alias("max_fetches_per_round"))
    )


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
