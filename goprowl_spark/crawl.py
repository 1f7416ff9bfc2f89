"""The crawl engine: each BFS round is one declarative DataFrame job.

Reference lifecycle being rebuilt (SURVEY.md §3.1): colly's callback-driven
async BFS (search/crawlers/colly.go:121-260) — seed visit, per-page
``OnHTML`` parse, per-link enqueue with visited-set dedup and depth cap —
becomes an iterative round loop:

    frontier snapshot
      → pop batch        (per-host politeness top-k, host-salted, W1/W2)
      → robots filter    (broadcast join, J2/P5)
      → fetch            (join vs page corpus — HTTP in production, S1)
      → parse → spans    (Arrow pandas UDF, S4/U5)
      → explode links    (S3) → candidates at depth+1 (P2)
      → Bloom probe + exact anti-join vs seen (P4/J1/U7)
      → commit snapshot: documents ∪ new, seen ∪ new, frontier rewritten,
        per-round metrics row (S5/S6/S12)

Every ordering is defined by data (priority, depth, url tie-breaks), never
by execution order, so the distributed crawl reproduces the sequential
reference trace exactly and resumes from any snapshot (north_rule).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from goprowl_spark import schemas, seen_filter
from goprowl_spark.parse import extract_links, with_document_columns
from goprowl_spark.politeness import apply_robots, pop_batch
from goprowl_spark.tables import SnapshotCatalog


@dataclass
class CrawlConfig:
    seeds: list[str]
    max_depth: int = 3  # reference default: internal/app/module.go:14
    allowed_hosts: list[str] | None = None  # None = all; reference P1: colly.go:174
    default_budget: int | None = None  # None = unlimited (plain BFS)
    use_bloom: bool = True
    n_buckets: int = seen_filter.DEFAULT_N_BUCKETS
    bits_per_bucket: int = seen_filter.DEFAULT_BITS_PER_BUCKET
    salt: int = 16
    # fetch batches at or below this many URLs broadcast into the corpus
    # join (so page payloads never shuffle); larger batches fall back to a
    # shuffle join — at 10^10 scale use politeness budgets to bound batches
    broadcast_pop_limit: int = 2_000_000
    extra: dict = field(default_factory=dict)


class CrawlEngine:
    """Round-loop driver (reference: CollyCrawler.CrawlWithHandler,
    colly.go:121-260; the Crawler interface U3, types.go:9-14)."""

    def __init__(
        self,
        spark: SparkSession,
        corpus: DataFrame | None,
        workdir: str,
        config: CrawlConfig,
        robots_rules: DataFrame | None = None,
        host_budget: DataFrame | None = None,
        fetcher=None,
    ):
        """``corpus``: page table the fetch stage joins against (web-archive
        shape). ``fetcher``: batch→fetched callable (HTTP shape — work
        proportional to the batch, nothing scanned); wins if both given."""
        if corpus is None and fetcher is None:
            raise ValueError("need a corpus table or a fetcher")
        self.spark = spark
        self.corpus = corpus
        self.catalog = SnapshotCatalog(spark, workdir)
        self.config = config
        self.robots_rules = robots_rules
        self.host_budget = host_budget
        self.fetcher = fetcher

    # ------------------------------------------------------------ state

    def _load(self, name: str, schema) -> DataFrame:
        return self.catalog.load(name, schema=schema)

    def frontier(self) -> DataFrame:
        return self._load("frontier", schemas.FRONTIER)

    def seen(self) -> DataFrame:
        return self._load("seen", schemas.SEEN)

    def documents(self) -> DataFrame:
        return self._load("documents", schemas.DOCUMENTS)

    def metrics(self) -> DataFrame:
        return self._load("crawl_metrics", schemas.CRAWL_METRICS)

    def lineage(self) -> DataFrame:
        return self._load("partition_lineage", schemas.PARTITION_LINEAGE)

    def current_round(self) -> int:
        return int(self.catalog.properties().get("round", 0))

    # ------------------------------------------------------------ lifecycle

    def start(self) -> int:
        """Initialize snapshot 0: seeds become the frontier and the initial
        seen set (reference seed injection S2: colly.go:108-118)."""
        seeds = self.spark.createDataFrame(
            [(u,) for u in self.config.seeds], "url string"
        ).select(
            "url",
            F.xxhash64("url").alias("url_hash"),
            F.parse_url("url", F.lit("HOST")).alias("host"),
            F.lit(0).alias("depth"),
            F.lit(0.0).alias("priority"),
            F.lit(0).alias("discovered_round"),
        )
        seen = seeds.select(
            "url_hash", "url", "depth", F.lit(0).alias("first_seen_round")
        )
        tables = {"frontier": seeds, "seen": seen}
        if self.config.use_bloom:
            empty = self.spark.createDataFrame([], schemas.SEEN_BLOOM)
            tables["seen_bloom"] = seen_filter.update_blooms(
                empty, seen, self.config.n_buckets, self.config.bits_per_bucket
            )
        tables["documents"] = self.spark.createDataFrame([], schemas.DOCUMENTS)
        tables["crawl_metrics"] = self.spark.createDataFrame([], schemas.CRAWL_METRICS)
        return self.catalog.commit(
            tables,
            properties={
                "round": 0,
                "seen_count": len(self.config.seeds),
                "frontier_count": len(self.config.seeds),
            },
        )

    def run(self, max_rounds: int | None = None) -> dict:
        """Advance rounds until the frontier drains (collector.Wait analog,
        colly.go:218-257 — minus the wall-clock timeouts, which have no
        place in a resumable batch crawl)."""
        if self.catalog.latest() is None:
            self.start()
        rounds = 0
        while max_rounds is None or rounds < max_rounds:
            if not self.crawl_round():
                break
            rounds += 1
        return {
            "rounds": self.current_round(),
            "snapshot": self.catalog.latest(),
        }

    # ------------------------------------------------------------ one round

    def crawl_round(self) -> bool:
        import os
        import sys
        import time

        timing = os.environ.get("GOPROWL_TIMING") == "1"
        marks: list[tuple[str, float]] = []
        t_last = time.time()

        def mark(stage: str) -> None:
            nonlocal t_last
            if timing:
                now = time.time()
                marks.append((stage, round(now - t_last, 2)))
                t_last = now

        cfg = self.config
        props = self.catalog.properties()
        r = int(props.get("round", 0)) + 1
        # frontier size is tracked arithmetically in snapshot properties
        # (f' = f - popped + enqueued) — no count job, no isEmpty scan
        n_frontier = int(props.get("frontier_count", 0))
        if n_frontier == 0:
            return False
        frontier = self.frontier()
        seen = self.seen()
        blooms = (
            self._load("seen_bloom", schemas.SEEN_BLOOM) if cfg.use_bloom else None
        )

        # W1/W2: deterministic, budget-bounded, skew-salted pop.
        popped = pop_batch(
            frontier, self.host_budget, cfg.default_budget, cfg.salt
        ).persist(StorageLevel.MEMORY_AND_DISK)
        n_popped = popped.count()
        mark("pop")
        remaining = frontier.join(
            F.broadcast(popped.select("url")), "url", "left_anti"
        )

        # S1: fetch = join against the corpus (production: HTTP inside
        # mapInPandas over this same batch DataFrame). The fetch batch is
        # bounded (politeness budgets), the corpus is the whole web: build
        # the hash table on the batch side so the corpus — HTML payloads
        # included — is NEVER shuffled. Missing URLs (fetch failures)
        # come back via a second tiny anti-join instead of a left join,
        # because a left join could only broadcast its preserved side.
        batch = popped.select("url", "depth")
        if self.fetcher is not None:
            fetched = self.fetcher(batch)
        else:
            bcast_ok = n_popped <= cfg.broadcast_pop_limit
            hit = self.corpus.select(
                "url", "status", "html", "fetch_latency_ms"
            ).join(F.broadcast(batch) if bcast_ok else batch, on="url", how="inner")
            missing = batch.join(
                F.broadcast(hit.select("url")) if bcast_ok else hit.select("url"),
                on="url",
                how="left_anti",
            ).select(
                "url",
                "depth",
                F.lit(0).alias("status"),
                F.lit(None).cast("string").alias("html"),
                F.lit(None).cast("int").alias("fetch_latency_ms"),
            )
            fetched = hit.select(
                "url", "depth", "status", "html", "fetch_latency_ms"
            ).unionByName(missing)
        fetched = fetched.persist(StorageLevel.MEMORY_AND_DISK)

        # S4/U5: parse successful pages into span sequences.
        docs_new = with_document_columns(fetched, r).persist(
            StorageLevel.MEMORY_AND_DISK
        )

        # S3/P2/P3: expand links → candidates at depth+1.
        links = extract_links(docs_new)
        parent_depth = popped.select(
            F.col("url").alias("src_url"), F.col("depth").alias("src_depth")
        )
        candidates = (
            links.join(parent_depth, "src_url")
            .select(
                F.col("link").alias("url"),
                (F.col("src_depth") + 1).alias("depth"),
            )
            .where(F.col("depth") <= cfg.max_depth)
            .groupBy("url")
            .agg(F.min("depth").cast("int").alias("depth"))
            .select(
                "url",
                F.xxhash64("url").alias("url_hash"),
                F.parse_url("url", F.lit("HOST")).alias("host"),
                "depth",
            )
            .where(F.col("host").isNotNull())
        )
        if cfg.allowed_hosts is not None:
            candidates = candidates.where(F.col("host").isin(cfg.allowed_hosts))
        candidates = apply_robots(candidates, self.robots_rules)
        candidates = candidates.persist(StorageLevel.MEMORY_AND_DISK)

        # P4/J1/U7: Bloom-pruned exact dedup against the seen set.
        new_entries = seen_filter.filter_unseen(candidates, seen, blooms).select(
            "url",
            "url_hash",
            "host",
            "depth",
            (-F.col("depth")).cast("double").alias("priority"),
            F.lit(r).alias("discovered_round"),
        ).persist(StorageLevel.MEMORY_AND_DISK)

        new_frontier = remaining.unionByName(
            new_entries.select(*schemas.FRONTIER.fieldNames())
        )
        # `seen` and `documents` grow monotonically — commit them as
        # fast-appends (delta files) so the round never rewrites the full
        # history (Iceberg fast-append; the seen-dedup guarantees appended
        # doc_ids are new, so append ≡ MERGE here).
        seen_delta = new_entries.select(
            "url_hash", "url", "depth", F.lit(r).alias("first_seen_round")
        )

        # A7-A9/S12: per-round lineage + counters (one agg job per persisted
        # intermediate; running totals carried in snapshot properties).
        counts = fetched.agg(
            F.sum((F.col("status") == 200).cast("long")).alias("ok"),
            F.sum((F.col("status") != 200).cast("long")).alias("err"),
            F.percentile_approx("fetch_latency_ms", 0.5).alias("p50"),
            F.percentile_approx("fetch_latency_ms", 0.99).alias("p99"),
        ).collect()[0]
        mark("fetch")
        # one agg over the persisted docs materializes the parse AND yields
        # the link count (no separate links.count job)
        n_links = int(
            docs_new.agg(
                F.coalesce(
                    F.sum(
                        F.size(
                            F.filter(
                                F.col("spans"), lambda s: s["kind"] == F.lit("link")
                            )
                        )
                    ),
                    F.lit(0),
                )
            ).collect()[0][0]
        )
        mark("parse")
        n_cand = candidates.count()
        mark("candidates")
        n_new = new_entries.count()
        mark("dedup")
        prev_seen = int(props.get("seen_count", 0))
        n_seen = prev_seen + n_new
        metrics_row = self.spark.createDataFrame(
            [
                (
                    r,
                    n_frontier,
                    n_popped,
                    counts["ok"] or 0,
                    counts["err"] or 0,
                    n_links,
                    n_cand,
                    n_cand - n_new,
                    n_new,
                    n_seen,
                    float(n_cand - n_new) / n_cand if n_cand else 0.0,
                    float(counts["p50"] or 0.0),
                    float(counts["p99"] or 0.0),
                )
            ],
            schemas.CRAWL_METRICS,
        )

        # per-partition lineage counters for this round's written data
        # (north_star requirement; also the skew-diagnosis signal: a hot
        # host shows up as one partition dwarfing the rest)
        def plin(df: DataFrame, name: str) -> DataFrame:
            return df.groupBy(F.spark_partition_id().alias("partition_id")).agg(
                F.count("*").alias("rows")
            ).select(
                F.lit(r).alias("round"),
                F.lit(name).alias("table"),
                "partition_id",
                "rows",
            )

        lineage_delta = plin(new_entries, "frontier_new").unionByName(
            plin(docs_new, "documents_new")
        )

        tables = {"frontier": new_frontier}
        if cfg.use_bloom:
            tables["seen_bloom"] = seen_filter.update_blooms(
                blooms, new_entries, cfg.n_buckets, cfg.bits_per_bucket
            )
        self.catalog.commit(
            tables,
            appends={
                "seen": seen_delta,
                "documents": docs_new,
                "crawl_metrics": metrics_row,
                "partition_lineage": lineage_delta,
            },
            properties={
                "round": r,
                "seen_count": n_seen,
                "frontier_count": n_frontier - n_popped + n_new,
            },
        )
        mark("commit")
        if timing:
            total = sum(d for _, d in marks)
            print(
                f"ROUND {r} n_popped={n_popped} n_new={n_new} total={total:.2f} "
                + " ".join(f"{k}={v}" for k, v in marks),
                file=sys.stderr,
            )
        for df in (popped, fetched, docs_new, candidates, new_entries):
            df.unpersist()
        return True
