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
