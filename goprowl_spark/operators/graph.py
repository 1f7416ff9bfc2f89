"""Link-graph analytics for frontier prioritization.

GoProwl pops URLs in insertion order (colly's queue); the rebuild's frontier
carries an explicit ``priority`` column (schemas.FRONTIER, popped by
politeness.pop_batch's window rank), which defaults to -depth. This module
computes a better signal: **PageRank over the crawled link graph** — the
classic crawl-ordering metric (feed ``pagerank().pr`` into the frontier's
priority to fetch high-centrality pages first).

Shape per iteration: one join edges⋈ranks (shuffle on src), one groupBy dst
(shuffle on dst), one metadata-sized dangling-mass aggregate — the standard
distributed power iteration. Deterministic: no sampling, fixed iteration
count, so the DuckDB oracle replays it exactly (unrolled CTE per iteration).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    iters: int = 3,
    damping: float = 0.85,
    node_col: str = "node",
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """(node, pr) after ``iters`` power iterations with uniform start.

    Dangling mass (nodes with no out-edges) is redistributed uniformly each
    iteration — the standard correction, so Σpr stays 1. ``nodes`` must
    contain every vertex (isolated ones included)."""
    nodes = nodes.select(F.col(node_col).alias("node")).localCheckpoint()
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    outdeg = e.groupBy("src").agg(F.count("*").alias("deg")).localCheckpoint()
    n = nodes.count()
    ranks = nodes.withColumn("pr", F.lit(1.0 / n))
    for _ in range(iters):
        contribs = (
            e.join(ranks, e["src"] == ranks["node"])
            .join(outdeg, "src")
            .select("dst", (F.col("pr") / F.col("deg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("c"))
        )
        dangling = (
            ranks.join(outdeg, ranks["node"] == outdeg["src"], "left_anti")
            .agg(F.coalesce(F.sum("pr"), F.lit(0.0)))
            .collect()[0][0]
        )
        ranks = (
            nodes.join(contribs, nodes["node"] == contribs["dst"], "left")
            .select(
                "node",
                (
                    F.lit((1.0 - damping) / n)
                    + damping * (F.coalesce(F.col("c"), F.lit(0.0)) + dangling / n)
                ).alias("pr"),
            )
            .localCheckpoint()
        )
    return ranks
