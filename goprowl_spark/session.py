"""SparkSession factory with scale-aware defaults.

Local sandbox runs use ``local[N]``; on a real cluster the same settings apply
(AQE, skew-join handling, Arrow). ``shuffle_partitions`` should track total
cores locally and ~2-3x total cores on a cluster.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "goprowl_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for this engine.

    AQE is on: runtime shuffle-partition coalescing and skew-join splitting
    are part of the scale design (hot-host skew, SURVEY.md §4). Arrow is on:
    all Python interop (pandas UDFs) is Arrow-batched — the engine has no
    row-at-a-time Python anywhere.
    """
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    if shuffle_partitions is None:
        shuffle_partitions = max(cores, 8)
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # InferFiltersFromGenerate copies the generator's input expression
        # into a pre-exchange `size(...) > 0` filter. For this engine every
        # explode input is an EXPENSIVE expression (regex tokenize, HOF
        # shingling + md5) and the inferred filter (a) evaluates it a second
        # time per row and (b) lands below the spread repartition, i.e. on
        # the narrow scan side, serializing the costliest expression in the
        # plan onto the input's split count; it also breaks AQE exchange
        # reuse between branches that share the scan (measured on
        # bm25_search: the avgdl branch re-ran the full tokenize). Scale-
        # independent: correctness is unaffected and the pruned rows
        # (docs with zero tokens) are a vanishing fraction at any SF.
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def spread_narrow_scan(df, key_col: str):
    """Repartition a DataFrame whose scan has fewer splits than the
    session's parallelism, so a CPU-heavy map stage downstream (explode,
    per-row hashing, HOF shingling) is not serialized onto a handful of
    cores. A small single-file parquet table scans as ONE partition; at
    real scale inputs already carry >= defaultParallelism splits and this
    is a no-op. Hash-partitioning on ``key_col`` keeps the row→partition
    map deterministic; values are unaffected.

    The split-count probe is metadata-only where possible: the old
    ``df.rdd.getNumPartitions()`` ran full physical planning + RDD
    conversion (measured 0.1-0.8 s per fresh DataFrame — paid INSIDE every
    timed query that spreads). With >= target input files the scan cannot
    be narrow (each file yields at least one split); for a handful of
    local files the split count is estimated from file sizes with the
    scan's own packing rule; anything undecidable falls back to the exact
    RDD probe."""
    from pyspark.sql import functions as F

    sess = df.sparkSession
    target = sess.sparkContext.defaultParallelism

    def _estimated_splits() -> int:
        try:
            files = df.inputFiles()
        except Exception:
            return -1
        if not files:
            return -1
        if len(files) >= target:
            return len(files)
        if not all(f.startswith("file:") for f in files):
            return -1
        import os
        from urllib.parse import unquote, urlparse

        def _bytes_conf(key: str, default: int) -> int:
            raw = str(sess.conf.get(key, str(default)))
            digits = "".join(c for c in raw if c.isdigit())
            return int(digits) if digits else default

        mpb = _bytes_conf("spark.sql.files.maxPartitionBytes", 128 * 1024 * 1024)
        open_cost = _bytes_conf("spark.sql.files.openCostInBytes", 4 * 1024 * 1024)
        try:
            total = sum(
                max(os.path.getsize(unquote(urlparse(f).path)), 0) + open_cost
                for f in files
            )
        except OSError:
            return -1
        # FilePartition packing: files are charged openCost and packed
        # into ~maxPartitionBytes bins; a conservative (floor) estimate
        # is fine — underestimating only means we spread when the real
        # scan would have had just enough splits, which is harmless
        return max(1, -(-total // mpb)) if total else 1

    est = _estimated_splits()
    n = est if est >= 0 else df.rdd.getNumPartitions()
    if n < target:
        return df.repartition(target, F.col(key_col))
    return df
