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
from goprowl_spark import tables as tables_mod
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
    # "bloom" (bit-array blobs) or "cuckoo" (fingerprint tables — same
    # shard/delta contract, supports recrawl/expiry deletion via
    # seen_filter.delete_cuckoos); crawl traces are identical either way
    filter_kind: str = "bloom"
    n_buckets: int = seen_filter.DEFAULT_N_BUCKETS
    bits_per_bucket: int = seen_filter.DEFAULT_BITS_PER_BUCKET
    # cuckoo-backend geometry for FRESH filter shards (an existing blob's
    # header stays authoritative across resume). Size it for the expected
    # crawl scale — seen_filter.cuckoo_inner_buckets_for(expected_urls) —
    # the way a production deployment provisions any sketch. Undersized
    # shards auto-grow their slot cap in place (bounded, membership-
    # preserving; see seen_filter._cuckoo_grow), so this knob is FPR/
    # throughput tuning, never correctness.
    cuckoo_inner_buckets: int = seen_filter.CUCKOO_INNER_BUCKETS
    # Bloom commits are per-round DELTAS (only touched buckets, latest
    # generation wins on read); every this-many rounds a compaction
    # rewrites the full table to bound read amplification
    bloom_compact_every: int = 8
    salt: int = 16
    # fetch batches at or below this many URLs broadcast into the corpus
    # join (so page payloads never shuffle); larger batches fall back to a
    # shuffle join — at 10^10 scale use politeness budgets to bound batches
    broadcast_pop_limit: int = 2_000_000
    # fetch-stage tasks per core (fetcher path): >1 smooths stragglers in
    # the Python fetch+parse map stage — with exactly one task per core
    # the slowest task gates the whole wave. The repartition shuffles only
    # (url, depth) rows, negligible next to the per-URL fetch/parse work.
    fetch_tasks_per_core: int = 3
    # frontier priority at discovery time: a Column expression over
    # (url, host, depth) Columns — e.g. a PageRank/host-reputation score —
    # consumed by the budgeted pop's (priority desc, depth, url) order
    # (W2). None = the BFS default, -depth. Priorities are DATA, so crawl
    # ordering stays deterministic and trace-testable under any function.
    priority_fn: "Callable[[Column, Column, Column], Column] | None" = None
    # ...but task count never exceeds what the batch can fill: small early
    # rounds are BARRIER-bound, not straggler-bound (measured: a 75k-URL
    # round 1 ran its fetch wave at 3.5x worse per-URL throughput than the
    # 475k round 3 — pure per-task dispatch overhead), so tasks are capped
    # at ~one per this many URLs, floored at one task per core.
    fetch_target_urls_per_task: int = 10_000
    # Crawl-delay → budget derivation: when set, a robots_rules table that
    # carries a crawl_delay column (parse_robots_txt output) yields per-host
    # budgets of floor(round_seconds / crawl_delay) fetches per round — the
    # deterministic batch form of colly's LimitRule Delay pacing
    # (search/crawlers/colly.go:201-207). None = delays parsed but unused.
    round_seconds: float | None = None
    # index crawled pages on write (the reference indexes every page into
    # bleve via the storage adapter): appends per-round postings/doc_stats
    # deltas tokenized from ONLY the round's new docs — dedup guarantees
    # doc_ids never repeat, so appends need no merge. Off by default: the
    # pure-crawl benchmark shouldn't pay for a feature the query side owns.
    maintain_index: bool = False
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
        page_handler=None,
    ):
        """``corpus``: page table the fetch stage joins against (web-archive
        shape). ``fetcher``: batch→fetched callable (HTTP shape — work
        proportional to the batch, nothing scanned); wins if both given.
        ``page_handler``: optional documents-DataFrame→DataFrame transform
        applied to each round's parsed docs before commit — the PageHandler
        callback (U1, reference: search/crawlers/types.go:49, wired
        cmd/crawl.go:113) as a declarative per-round stage."""
        if corpus is None and fetcher is None:
            raise ValueError("need a corpus table or a fetcher")
        if config.filter_kind not in ("bloom", "cuckoo"):
            raise ValueError(f"unknown filter_kind {config.filter_kind!r}")
        self.spark = spark
        self.corpus = corpus
        self.catalog = SnapshotCatalog(spark, workdir)
        self.config = config
        # Crash-recovery / resume guard: the seen_bloom blobs are encoded by
        # whichever kernel wrote them, and the kernels cannot read each
        # other's payloads — a bloom probe over a cuckoo blob yields SILENT
        # false negatives (re-admitting already-seen URLs under duplicate
        # doc_ids); a cuckoo decode of a bloom blob reads garbage geometry.
        # Every commit records the active kind in the snapshot properties
        # ("none" when the filter is off, because resuming with a filter
        # over a filterless workdir would skip the earlier-seen URLs'
        # filter entries — the same false-negative failure); attaching an
        # engine with a different kind must fail HERE, not mid-crawl.
        if self.catalog.latest() is not None:
            stored = self.catalog.properties().get("filter_kind")
            if stored is not None and stored != self._filter_kind_prop():
                raise ValueError(
                    f"workdir {workdir!r} was crawled with "
                    f"filter_kind={stored!r}; this engine is configured "
                    f"for {self._filter_kind_prop()!r} — the seen-filter "
                    "blobs are not interchangeable between kernels"
                )
        self.robots_rules = robots_rules
        if (
            config.round_seconds is not None
            and robots_rules is not None
            and "crawl_delay" in robots_rules.columns
        ):
            from goprowl_spark import politeness

            delay_budget = politeness.budget_from_crawl_delay(
                robots_rules, config.round_seconds
            )
            host_budget = (
                delay_budget
                if host_budget is None
                else politeness.merge_host_budgets(host_budget, delay_budget)
            )
        self.host_budget = host_budget
        self.fetcher = fetcher
        self.page_handler = page_handler

    # ------------------------------------------------------------ state

    def _filter_kind_prop(self) -> str:
        return self.config.filter_kind if self.config.use_bloom else "none"

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
        seen set (reference seed injection S2: colly.go:108-118). Both
        logical tables are projections of ONE physical seed delta."""
        delta = self.spark.createDataFrame(
            [(u,) for u in self.config.seeds], "url string"
        ).select(
            "url",
            F.xxhash64("url").alias("url_hash"),
            F.parse_url("url", F.lit("HOST")).alias("host"),
            F.lit(0).alias("depth"),
            F.lit(0.0).alias("priority"),
            F.lit(0).alias("discovered_round"),
            F.lit(0).alias("first_seen_round"),
        )
        sid = self.catalog.next_sid()
        delta_path = self.catalog.stage_path(sid, "crawl_delta")
        delta.write.mode("overwrite").parquet(delta_path)
        tables = {"frontier": delta_path, "seen": delta_path}
        stage = {
            "documents": self.spark.createDataFrame([], schemas.DOCUMENTS),
            "crawl_metrics": self.spark.createDataFrame([], schemas.CRAWL_METRICS),
        }
        if self.config.use_bloom:
            if self.config.filter_kind == "cuckoo":
                stage["seen_bloom"] = seen_filter.update_cuckoos(
                    self.spark.createDataFrame([], schemas.SEEN_BLOOM),
                    delta,
                    self.config.n_buckets,
                    inner_buckets=self.config.cuckoo_inner_buckets,
                    gen=0,
                )
            else:
                stage["seen_bloom"] = seen_filter.update_blooms(
                    self.spark.createDataFrame([], schemas.SEEN_BLOOM),
                    delta,
                    self.config.n_buckets,
                    self.config.bits_per_bucket,
                    gen=0,
                )
        for name, df in stage.items():
            path = self.catalog.stage_path(sid, name)
            df.write.mode("overwrite").parquet(path)
            tables[name] = path
        return self.catalog.commit_staged(
            sid,
            tables=tables,
            projections={
                "seen": schemas.SEEN.fieldNames(),
                "frontier": schemas.FRONTIER.fieldNames(),
            },
            properties={
                "round": 0,
                "seen_count": len(self.config.seeds),
                "frontier_count": len(self.config.seeds),
                "filter_kind": self._filter_kind_prop(),
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

    def expire_urls(self, urls: list[str], reenqueue: bool = False) -> int:
        """Recrawl/expiry — the content-aged-out path the reference lacks
        entirely (its only reset is Clear, S11: bleve/storage.go:279-299,
        which drops everything). Two modes:

        * ``reenqueue=False`` (forget): remove the urls from the seen set,
          their rows from documents (and the maintained index), and their
          entries from the seen FILTER, so organic re-discovery crawls
          them again. The filter edit rebuilds ONLY the touched shards
          from the surviving seen rows — exact for both backends, and
          bounded by the touched shards' membership (seen/n_buckets rows
          per shard), never the whole filter. The cuckoo backend's
          O(expired) fingerprint delete (delete_cuckoos) is deliberately
          NOT used here: it is only sound when the deleted key shares no
          fingerprint+bucket ambiguity with another live member (see its
          contract), a condition the engine cannot verify cheaply.
        * ``reenqueue=True`` (forced refetch): drop the stale document
          rows and push the urls back into the frontier at their original
          depth. Seen set and filter stay intact — the frontier ⊆ seen
          invariant holds, and a pop never consults the seen set, so the
          refetch happens next round without re-admitting the urls'
          already-seen links.

        Commits one snapshot; returns the number of urls actually expired.
        """
        cfg = self.config
        if self.catalog.latest() is None:
            raise ValueError("expire_urls before start(): nothing is seen yet")
        props = self.catalog.properties()
        r = int(props.get("round", 0))
        urls_df = F.broadcast(
            self.spark.createDataFrame(
                [(u,) for u in urls], "url string"
            ).distinct()
        )
        seen = self.seen()
        expired = seen.join(urls_df, "url", "inner").persist()
        n_expired = expired.count()
        if n_expired == 0:
            expired.unpersist()
            return 0
        # the urls may still be frontier-resident (mid-crawl expiry): both
        # modes must drop those rows — forget to preserve frontier ⊆ seen
        # (a popped-but-unseen url would re-document under the same
        # doc_id), reenqueue to avoid a second frontier row popping the
        # url twice in one unbudgeted round
        frontier = self.frontier()
        n_in_frontier = frontier.join(urls_df, "url", "left_semi").count()

        sid = self.catalog.next_sid()
        docs_path = self.catalog.stage_path(sid, "documents")
        self.documents().join(
            urls_df.withColumnRenamed("url", "doc_id"), "doc_id", "left_anti"
        ).write.mode("overwrite").parquet(docs_path)
        tables = {"documents": docs_path}

        if not reenqueue:
            seen_path = self.catalog.stage_path(sid, "seen")
            seen.join(urls_df, "url", "left_anti").write.mode(
                "overwrite"
            ).parquet(seen_path)
            tables["seen"] = seen_path

        if cfg.use_bloom and not reenqueue:
            # Rebuild ONLY the touched shards from the surviving seen rows —
            # exact by construction for BOTH backends. A bare fingerprint
            # delete (delete_cuckoos) is O(expired) but unsound whenever the
            # deleted key shares fingerprint+bucket ambiguity with another
            # live member (see delete_cuckoos' contract and the property
            # tests in tests/test_properties.py);
            # a Bloom bit can never be cleared at all. Shard-scoped rebuild
            # costs O(seen rows hashing to touched shards) — at 4096 shards
            # and a handful of expired urls that is seen/4096 per shard, not
            # a 10^10-row filter rebuild.
            bloom_path = self.catalog.stage_path(sid, "seen_bloom")
            blobs = self._load("seen_bloom", schemas.SEEN_BLOOM)
            latest = (
                blobs.groupBy("bucket")
                .agg(
                    F.max_by(
                        F.struct("filter_blob", "n_items", "gen"), "gen"
                    ).alias("s")
                )
                .select("bucket", "s.filter_blob", "s.n_items", "s.gen")
            )
            touched_buckets = expired.select(
                F.pmod(F.col("url_hash"), F.lit(cfg.n_buckets))
                .cast("int")
                .alias("bucket")
            ).distinct()
            surviving = self.spark.read.schema(schemas.SEEN).parquet(seen_path)
            surviving_touched = surviving.join(
                F.broadcast(touched_buckets),
                F.pmod(F.col("url_hash"), F.lit(cfg.n_buckets)).cast("int")
                == F.col("bucket"),
                "left_semi",
            )
            empty = self.spark.createDataFrame([], schemas.SEEN_BLOOM)
            if cfg.filter_kind == "cuckoo":
                rebuilt = seen_filter.update_cuckoos(
                    empty,
                    surviving_touched,
                    cfg.n_buckets,
                    inner_buckets=cfg.cuckoo_inner_buckets,
                    gen=r,
                )
            else:
                rebuilt = seen_filter.update_blooms(
                    empty,
                    surviving_touched,
                    cfg.n_buckets,
                    cfg.bits_per_bucket,
                    gen=r,
                )
            untouched = latest.join(
                F.broadcast(touched_buckets), "bucket", "left_anti"
            )
            # a touched shard whose members all expired simply has no row
            # in the new table — probes there answer definitively unseen
            new_blobs = untouched.unionByName(rebuilt)
            new_blobs.write.mode("overwrite").parquet(bloom_path)
            tables["seen_bloom"] = bloom_path

        if cfg.maintain_index:
            from goprowl_spark import ranking

            docs_new = self.spark.read.schema(schemas.DOCUMENTS).parquet(docs_path)
            postings_path = self.catalog.stage_path(sid, "postings")
            stats_path = self.catalog.stage_path(sid, "doc_stats")
            ranking.build_postings(docs_new).write.mode("overwrite").parquet(
                postings_path
            )
            ranking.build_doc_stats(docs_new).write.mode("overwrite").parquet(
                stats_path
            )
            tables["postings"] = postings_path
            tables["doc_stats"] = stats_path

        n_frontier = int(props.get("frontier_count", 0))
        frontier_rest = frontier.join(urls_df, "url", "left_anti")
        frontier_path = self.catalog.stage_path(sid, "frontier")
        if reenqueue:
            prio = (
                cfg.priority_fn(F.col("url"), F.col("host"), F.col("depth"))
                if cfg.priority_fn is not None
                else -F.col("depth")
            )
            requeued = expired.select(
                "url",
                "url_hash",
                F.parse_url("url", F.lit("HOST")).alias("host"),
                "depth",
            ).select(
                "url",
                "url_hash",
                "host",
                "depth",
                prio.cast("double").alias("priority"),
                F.lit(r).alias("discovered_round"),
            )
            frontier_rest.unionByName(requeued).write.mode("overwrite").parquet(
                frontier_path
            )
            tables["frontier"] = frontier_path
            n_frontier += n_expired - n_in_frontier
        elif n_in_frontier:
            frontier_rest.write.mode("overwrite").parquet(frontier_path)
            tables["frontier"] = frontier_path
            n_frontier -= n_in_frontier
        expired.unpersist()

        seen_count = int(props.get("seen_count", 0))
        if not reenqueue:
            seen_count -= n_expired
        self.catalog.commit_staged(
            sid,
            tables=tables,
            properties={
                "round": r,
                "seen_count": seen_count,
                "frontier_count": n_frontier,
                "filter_kind": self._filter_kind_prop(),
            },
        )
        return n_expired

    # ------------------------------------------------------------ one round

    def crawl_round(self) -> bool:
        """One crawl round in six job waves, each a table write with
        Observation-attached counters (no standalone count jobs):

          1. documents  — fetch → parse → append write (the HTML flows
                          straight through the Arrow parse UDF into parquet;
                          nothing page-sized is ever cached or shuffled)
          2. round delta — links ← stored docs (columnar spans read) →
                          candidates → Bloom+anti-join dedup → ONE write
                          carrying the seen∪frontier superset schema; the
                          manifest projects both logical tables out of it
          3. frontier   — only under budgets: remainder ∪ new entries
                          (unbudgeted BFS needs no write at all — the
                          frontier IS the round delta)
          4. seen_bloom — delta of touched buckets appended (latest gen
                          wins on read; full rewrite only on compaction
                          rounds), produced by the SAME fused cogroup pass
                          as the probe — no second Python/Arrow pass
          5. lineage    — per-partition row counters (north_star)
          6. metrics    — the round's counter row (from the observations)

        then one atomic manifest swing (Iceberg-commit analog).
        """
        import os
        import sys
        import time

        from pyspark.sql import Observation

        timing = os.environ.get("GOPROWL_TIMING") == "1"
        marks: list[tuple[str, float]] = []
        t_round0 = time.time()
        t_last = t_round0

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
        sid = self.catalog.next_sid()
        unbudgeted = self.host_budget is None and cfg.default_budget is None

        # W1/W2: deterministic, budget-bounded, skew-salted pop.
        popped = pop_batch(
            frontier, self.host_budget, cfg.default_budget, cfg.salt
        ).persist(StorageLevel.MEMORY_AND_DISK)
        batch = popped.select("url", "depth")

        # S1: fetch — mapInPandas fetcher (HTTP shape), or join against a
        # corpus table (web-archive shape). The batch side is bounded
        # (politeness budgets) so it broadcasts; page payloads never shuffle.
        if self.fetcher is not None:
            # fetch_tasks_per_core=1 means "keep the pop's natural
            # partitioning" — no repartition shuffle at all
            if cfg.fetch_tasks_per_core > 1:
                par = self.spark.sparkContext.defaultParallelism
                # n_frontier is the arithmetic pop-size estimate (exact for
                # unbudgeted BFS; an upper bound under budgets)
                want = min(
                    par * cfg.fetch_tasks_per_core,
                    max(par, n_frontier // max(cfg.fetch_target_urls_per_task, 1) + 1),
                )
                batch = batch.repartition(want)
            fetched = self.fetcher(batch)
        else:
            bcast_ok = n_frontier <= cfg.broadcast_pop_limit
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

        obs_fetch = Observation(f"fetch_r{r}_{sid}")
        fetched = fetched.observe(
            obs_fetch,
            F.count(F.lit(1)).alias("n"),
            F.sum((F.col("status") == 200).cast("long")).alias("ok"),
            F.sum((F.col("status") != 200).cast("long")).alias("err"),
            F.percentile_approx("fetch_latency_ms", 0.5).alias("p50"),
            F.percentile_approx("fetch_latency_ms", 0.99).alias("p99"),
        )

        # S4/U5: parse into span sequences; wave 1 writes documents.
        # (Measured: caching the parsed rows to skip the parquet read-back
        # LOSES at high core counts — the cache stores every column while
        # the read-back decodes only the spans column. Write, then re-read
        # columnar.)
        docs_new = with_document_columns(fetched, r)
        if self.page_handler is not None:
            docs_new = self.page_handler(docs_new)
        obs_docs = Observation(f"docs_r{r}_{sid}")
        docs_new = docs_new.observe(
            obs_docs,
            F.count(F.lit(1)).alias("n_docs"),
            F.coalesce(
                F.sum(
                    F.size(
                        F.filter(F.col("spans"), lambda s: s["kind"] == F.lit("link"))
                    )
                ),
                F.lit(0),
            ).alias("n_links"),
        )
        docs_path = self.catalog.stage_path(sid, "documents")
        docs_new.write.mode("overwrite").parquet(docs_path)
        fstats = obs_fetch.get
        dstats = obs_docs.get
        n_popped = int(fstats["n"] or 0)
        mark("fetch_parse_write")

        # S3/P2/P3: expand links (from the just-written columnar docs — only
        # the spans + fetched_depth columns are read back) → candidates at
        # depth+1. MAP-ONLY up to the bloom cogroup: the documents table
        # carries the fetch depth so there is no join back to the popped
        # batch, and per-url min-depth dedup happens INSIDE the bucket
        # cogroup (the bucket already holds every occurrence of a url), so
        # the old groupBy("url") pre-shuffle is gone — an unbudgeted BFS
        # round now pays exactly TWO wide shuffles (bucket cogroup + the
        # maybe-side anti-join).
        docs_stored = self.spark.read.parquet(docs_path)
        links = extract_links(docs_stored)
        raw_candidates = (
            links.select(
                F.col("link").alias("url"),
                (F.col("src_depth") + 1).cast("int").alias("depth"),
            )
            .where(F.col("depth") <= cfg.max_depth)
            .select(
                "url",
                F.xxhash64("url").alias("url_hash"),
                F.parse_url("url", F.lit("HOST")).alias("host"),
                "depth",
            )
            .where(F.col("host").isNotNull())
        )
        if cfg.allowed_hosts is not None:
            raw_candidates = raw_candidates.where(
                F.col("host").isin(cfg.allowed_hosts)
            )
        raw_candidates = apply_robots(raw_candidates, self.robots_rules)

        # P4/J1/U7: Bloom-pruned exact dedup; wave 2 writes the seen delta.
        # Probe and update run as ONE fused cogroup pass (probe_and_update):
        # the round pays a single candidates shuffle-by-bucket and a single
        # Python/Arrow pass for both the membership test and the blob
        # delta, instead of the two passes the split design cost.
        fused = None
        obs_cand = None
        n_cand = None
        if cfg.use_bloom:
            compact = (
                cfg.bloom_compact_every > 0 and r % cfg.bloom_compact_every == 0
            )
            # host is a pure function of url (parse_url above) and the
            # cogroup doesn't consult it — dropping it here keeps the
            # host STRING out of the bucket shuffle AND the Python/Arrow
            # round trip (≈20% fewer candidate bytes both ways); it is
            # re-derived on the (smaller) post-dedup survivor set below.
            # The shuffle-bound stage binds hardest on the many-core leg,
            # so this is also a scaling-efficiency lever (guide §2.3).
            fused = seen_filter.probe_and_update(
                raw_candidates.drop("host"),
                blooms,
                cfg.n_buckets,
                cfg.bits_per_bucket,
                gen=r,
                emit_untouched=compact,
                dedup=True,
                kind=cfg.filter_kind,
                inner_buckets=cfg.cuckoo_inner_buckets,
            ).persist(StorageLevel.MEMORY_AND_DISK)
            # ONE aggregate materializes the cogroup into the cache and
            # yields both counters the round needs: the post-dedup
            # candidate count (from the blob rows — this job used to run
            # AFTER the delta write) and the maybe-seen count, which picks
            # the exact-join strategy below BEFORE the write job plans.
            stats = fused.agg(
                F.coalesce(
                    F.sum(
                        F.when(
                            F.col("filter_blob").isNotNull(), F.col("n_cands")
                        )
                    ),
                    F.lit(0),
                ).alias("n_cand"),
                F.coalesce(
                    F.sum(
                        (
                            F.col("filter_blob").isNull() & F.col("maybe_seen")
                        ).cast("long")
                    ),
                    F.lit(0),
                ).alias("n_maybe"),
            ).collect()[0]
            n_cand = int(stats["n_cand"])
            n_maybe = int(stats["n_maybe"])
            mark("dedup_cogroup_stats")
            probed = fused.where(F.col("filter_blob").isNull())
            cand_cols = ["url", "url_hash", "depth"]
            fresh = probed.where(~F.col("maybe_seen")).select(*cand_cols)
            maybe = probed.where(F.col("maybe_seen")).select(*cand_cols)
            if n_maybe == 0:
                # no Bloom hits at all: nothing to check exactly
                unseen = fresh
            elif n_maybe <= cfg.broadcast_pop_limit:
                # Double-broadcast exact check: the old
                # maybe-anti-join-seen shuffled the ENTIRE seen table
                # (growing every round) plus the maybe side. Instead:
                # (1) scan seen map-only against broadcast(maybe) → the
                #     confirmed-seen subset (≤ n_maybe rows),
                # (2) anti-join maybe against broadcast(confirmed).
                # maybe ∖ (seen ∩ maybe) ≡ maybe ∖ seen, and the round's
                # dedup pays ZERO wide shuffles past the bucket cogroup —
                # the seen table is read but never shuffled. The url
                # equality re-check keeps 64-bit hash collisions harmless
                # (exactness cannot ride on url_hash alone: at 10^10 URLs
                # the birthday bound expects a few 64-bit collisions).
                # broadcast only the 8-byte hashes (5× smaller driver
                # collect than (hash, url) rows); the inner join may admit
                # hash-collision extras — seen urls that share a hash with
                # a maybe url — but the anti-join below re-checks
                # (url_hash, url), so a maybe row is removed iff that
                # exact row is in seen. Still exactly maybe ∖ seen.
                mb_h = maybe.select("url_hash")
                confirmed = seen.select("url_hash", "url").join(
                    F.broadcast(mb_h), on="url_hash", how="inner"
                )
                unseen = fresh.unionByName(
                    maybe.join(
                        F.broadcast(confirmed),
                        on=["url_hash", "url"],
                        how="left_anti",
                    )
                )
            else:
                # maybe-side too big to broadcast (possible only when a
                # round re-encounters >broadcast_pop_limit known URLs):
                # fall back to the shuffle anti-join
                unseen = fresh.unionByName(
                    maybe.join(seen, on=["url_hash", "url"], how="left_anti")
                )
        else:
            compact = False
            candidates = (
                raw_candidates.groupBy("url", "url_hash", "host")
                .agg(F.min("depth").cast("int").alias("depth"))
            )
            obs_cand = Observation(f"cand_r{r}_{sid}")
            candidates = candidates.observe(
                obs_cand, F.count(F.lit(1)).alias("n")
            )
            unseen = candidates.join(
                seen, on=["url_hash", "url"], how="left_anti"
            )
        obs_new = Observation(f"new_r{r}_{sid}")
        # The round delta carries the SUPERSET of the frontier and seen
        # schemas and is written ONCE; the manifest points both logical
        # tables at it with per-table column projections (one physical
        # write instead of two — the seen write and, unbudgeted, the
        # frontier write were projections of the same rows).
        prio = (
            cfg.priority_fn(F.col("url"), F.col("host"), F.col("depth"))
            if cfg.priority_fn is not None
            else -F.col("depth")
        )
        # the bloom path dropped host before the cogroup (see above);
        # re-derive it here with the same pure parse_url expression. The
        # no-filter path still carries it through.
        unseen_h = (
            unseen
            if "host" in unseen.columns
            else unseen.withColumn("host", F.parse_url("url", F.lit("HOST")))
        )
        new_entries = (
            unseen_h.select(
                "url",
                "url_hash",
                "host",
                "depth",
                prio.cast("double").alias("priority"),
                F.lit(r).alias("discovered_round"),
                F.lit(r).alias("first_seen_round"),
            )
            .observe(obs_new, F.count(F.lit(1)).alias("n"))
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        delta_path = self.catalog.stage_path(sid, "crawl_delta")
        new_entries.write.mode("overwrite").parquet(delta_path)
        if n_cand is None:
            n_cand = int(obs_cand.get["n"] or 0)
        n_new = int(obs_new.get["n"] or 0)
        mark("dedup_seen_write")

        # wave 3: frontier. With an unbudgeted pop the remainder is empty
        # by construction — the frontier IS the delta (no write at all,
        # just a projected manifest pointer).
        new_frontier = None
        frontier_path = delta_path
        if not unbudgeted:
            # popped is budget×hosts rows — broadcast only when bounded
            # (millions of hosts would OOM the driver otherwise).
            popped_urls = popped.select("url")
            if n_popped <= cfg.broadcast_pop_limit:
                popped_urls = F.broadcast(popped_urls)
            remaining = frontier.join(popped_urls, "url", "left_anti")
            new_frontier = remaining.unionByName(
                new_entries.select(*schemas.FRONTIER.fieldNames())
            )
            frontier_path = self.catalog.stage_path(sid, "frontier")
        bloom_path = (
            self.catalog.stage_path(sid, "seen_bloom") if cfg.use_bloom else None
        )

        # wave 5: per-partition lineage counters (north_star requirement;
        # also the skew-diagnosis signal — a hot host shows up as one
        # partition dwarfing the rest). Both the lineage and the metrics
        # row are METADATA-SIZED, so they are written straight from the
        # driver (pyarrow, parquet footers) — at 16 cores the tail of tiny
        # Spark jobs was the round's largest non-scaling cost. Lineage
        # comes from the just-written files' footers: one file per write
        # task, so file row counts ARE the per-partition counts.
        lineage_path = self.catalog.stage_path(sid, "partition_lineage")
        lineage_rows = [
            (r, "frontier_new", i, n)
            for i, n in tables_mod.parquet_file_rows(delta_path)
        ] + [
            (r, "documents_new", i, n)
            for i, n in tables_mod.parquet_file_rows(docs_path)
        ]
        tables_mod.write_local_parquet(
            lineage_rows, schemas.PARTITION_LINEAGE, lineage_path
        )

        prev_seen = int(props.get("seen_count", 0))
        n_seen = prev_seen + n_new
        metrics_path = self.catalog.stage_path(sid, "crawl_metrics")
        tables_mod.write_local_parquet(
            [
                (
                    r,
                    n_frontier,
                    n_popped,
                    int(fstats["ok"] or 0),
                    int(fstats["err"] or 0),
                    int(dstats["n_links"] or 0),
                    n_cand,
                    n_cand - n_new,
                    n_new,
                    n_seen,
                    float(n_cand - n_new) / n_cand if n_cand else 0.0,
                    float(fstats["p50"] or 0.0),
                    float(fstats["p99"] or 0.0),
                    round(time.time() - t_round0, 3),
                )
            ],
            schemas.CRAWL_METRICS,
            metrics_path,
        )

        # remaining tail writes are real (distributed) tables — run them as
        # concurrent jobs so the round pays one job latency, not several
        # (the big docs/delta writes above stay sequential: measured at
        # local[16], concurrent big writes contend and lose).
        tail = []
        postings_path = stats_path = None
        if cfg.maintain_index:
            from goprowl_spark import ranking

            postings_path = self.catalog.stage_path(sid, "postings")
            stats_path = self.catalog.stage_path(sid, "doc_stats")
            tail.append((postings_path, ranking.build_postings(docs_stored)))
            tail.append((stats_path, ranking.build_doc_stats(docs_stored)))
        if new_frontier is not None:
            tail.append((frontier_path, new_frontier))
        if bloom_path is not None:
            # the blob rows of the fused pass ARE this round's bloom delta
            # (only touched buckets; full set on compaction rounds)
            bloom_delta = fused.where(F.col("filter_blob").isNotNull()).select(
                F.col("__bucket").alias("bucket"), "filter_blob", "n_items", "gen"
            )
            tail.append((bloom_path, bloom_delta))
        if tail:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=len(tail)) as pool:
                list(
                    pool.map(
                        lambda t: t[1].write.mode("overwrite").parquet(t[0]), tail
                    )
                )
        mark("tail_writes")

        tables = {"frontier": frontier_path}
        appends = {
            "documents": docs_path,
            "seen": delta_path,
            "crawl_metrics": metrics_path,
            "partition_lineage": lineage_path,
        }
        projections = {
            "seen": schemas.SEEN.fieldNames(),
            "frontier": schemas.FRONTIER.fieldNames(),
        }
        if postings_path is not None:
            appends["postings"] = postings_path
            appends["doc_stats"] = stats_path
        if bloom_path is not None:
            # delta append per round; table replace on compaction rounds
            if compact:
                tables["seen_bloom"] = bloom_path
            else:
                appends["seen_bloom"] = bloom_path
        self.catalog.commit_staged(
            sid,
            tables=tables,
            appends=appends,
            projections=projections,
            properties={
                "round": r,
                "seen_count": n_seen,
                "frontier_count": n_frontier - n_popped + n_new,
                "filter_kind": self._filter_kind_prop(),
            },
        )
        mark("manifest")
        if timing:
            total = sum(d for _, d in marks)
            print(
                f"ROUND {r} n_popped={n_popped} n_new={n_new} total={total:.2f} "
                + " ".join(f"{k}={v}" for k, v in marks),
                file=sys.stderr,
            )
        for df in (popped, new_entries, fused):
            if df is not None:
                df.unpersist()
        return True
