"""Per-query measurement harness for the optimization rounds (guide §1).

bench.py is FROZEN for driver measurement; this file holds the extra
instrumentation: per-headline-query repeat timings with the same count()
methodology as bench.run_queries, optional noop-sink isolation of the full
result computation (guide §1.4), and formatted-plan capture for the
plans/r06/ artifacts.

Usage:
  python bench_extra.py time [query ...]      # repeat-timed count(), min+all
  python bench_extra.py noop [query ...]      # noop-sink full materialization
  python bench_extra.py explain <outdir> [q]  # write <q>.txt formatted plans
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPEATS = int(os.environ.get("BENCH_EXTRA_REPEATS", "3"))

HEADLINE = [
    "agg_q1",
    "topk_per_group",
    "broadcast_join_agg",
    "tfidf_search",
    "bm25_search",
    "search_relevancy",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "emb_cosine_topk",
    "token_counts",
]


def _session():
    from pyspark.sql import SparkSession, functions as F

    from goprowl_spark.session import get_spark

    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
    spark = get_spark("bench-extra", cores=CPUS, shuffle_partitions=CPUS)
    # same warmups as bench.run_queries
    spark.read.parquet(f"{SF_DIR}/region.parquet").groupBy("r_name").count().collect()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(256)
    docs.select(
        F.explode(
            F.transform(
                F.filter(F.split(F.lower("text"), r"\s+"), lambda t: t != F.lit("")),
                lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10),
            )
        ).alias("t")
    ).groupBy("t").count().collect()
    return spark


def cmd_time(names: list[str]) -> None:
    from goprowl_spark import contract

    spark = _session()
    qs = contract.queries()
    out = {}
    for name in names:
        samples = []
        for _ in range(REPEATS):
            spark.sparkContext.setJobDescription(f"time:{name}")
            t0 = time.time()
            df = qs[name](spark, SF_DIR)
            n = df.count()
            samples.append(round(time.time() - t0, 3))
        out[name] = {"min": min(samples), "samples": samples, "rows": n}
        print(f"  {name}: min {min(samples)}s  {samples} ({n} rows)", file=sys.stderr)
    print(json.dumps(out))


def cmd_noop(names: list[str]) -> None:
    from goprowl_spark import contract

    spark = _session()
    qs = contract.queries()
    out = {}
    for name in names:
        samples = []
        for _ in range(REPEATS):
            spark.sparkContext.setJobDescription(f"noop:{name}")
            t0 = time.time()
            df = qs[name](spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            samples.append(round(time.time() - t0, 3))
        out[name] = {"min": min(samples), "samples": samples}
        print(f"  {name}: min {min(samples)}s  {samples}", file=sys.stderr)
    print(json.dumps(out))


def cmd_explain(outdir: str, names: list[str]) -> None:
    import io
    from contextlib import redirect_stdout

    from goprowl_spark import contract

    os.makedirs(outdir, exist_ok=True)
    spark = _session()
    qs = contract.queries()
    for name in names:
        df = qs[name](spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(outdir, f"{name}.txt"), "w") as f:
            f.write(buf.getvalue())
        print(f"  wrote {outdir}/{name}.txt", file=sys.stderr)


def main() -> None:
    cmd = sys.argv[1] if len(sys.argv) > 1 else "time"
    if cmd == "explain":
        outdir = sys.argv[2]
        names = sys.argv[3:] or HEADLINE
        cmd_explain(outdir, names)
    elif cmd == "noop":
        cmd_noop(sys.argv[2:] or HEADLINE)
    else:
        cmd_time(sys.argv[2:] or HEADLINE)


if __name__ == "__main__":
    main()
