"""spark-submit entry point — the reference's CLI surface (SURVEY.md §3).

    spark-submit --py-files goprowl_spark.zip -m goprowl_spark.cli crawl \
        --seeds https://h0.test/p/0 --max-depth 3 --workdir /tmp/crawl

Subcommands mirror cmd/crawl.go, cmd/search.go, cmd/list.go:

    crawl  --seeds URL [URL...] --max-depth N --workdir DIR
           [--budget N] [--allowed-hosts H1,H2] [--corpus-n N] [--resume]
    search --workdir DIR --query 'title:spark AND python' [--page P --size S]
    list   --workdir DIR [--format table|json|simple]

In the sandbox the fetch stage joins a deterministic synthetic corpus
(--corpus-n pages); a production deployment swaps in an HTTP mapInPandas
fetcher and an Iceberg catalog without touching this surface.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

from pyspark.sql import functions as F

from goprowl_spark import corpus
from goprowl_spark import search as gsearch
from goprowl_spark.crawl import CrawlConfig, CrawlEngine
from goprowl_spark.session import get_spark
from goprowl_spark.store import DocumentStore


def cmd_crawl(args) -> int:
    spark = get_spark("goprowl-crawl")
    cfg = CrawlConfig(
        seeds=args.seeds,
        max_depth=args.max_depth,
        allowed_hosts=args.allowed_hosts.split(",") if args.allowed_hosts else None,
        default_budget=args.budget,
    )
    engine = CrawlEngine(
        spark, corpus.corpus_df(spark, args.corpus_n), args.workdir, cfg
    )
    if engine.catalog.latest() is not None and args.clear:
        # Application.Run semantics (application.go:106-126): clear the
        # index, then crawl fresh. This DELETES the workdir — all prior
        # snapshots are gone (the reference likewise recreates the index
        # dir). Keep the old workdir if you want time-travel.
        import shutil

        shutil.rmtree(args.workdir, ignore_errors=True)
        engine = CrawlEngine(
            spark, corpus.corpus_df(spark, args.corpus_n), args.workdir, cfg
        )
    if engine.catalog.latest() is not None:
        if not args.resume:
            # Never silently continue an old crawl with fresh seeds/depth
            # (Application.Run clears before crawling — application.go:106-126).
            print(
                f"error: {args.workdir} already contains a crawl; "
                "pass --resume to continue it or choose a fresh --workdir",
                file=sys.stderr,
            )
            return 2
        print(f"resuming from snapshot {engine.catalog.latest()}", file=sys.stderr)
    summary = engine.run(max_rounds=args.max_rounds)
    metrics = [r.asDict() for r in engine.metrics().orderBy("round").collect()]
    print(json.dumps({"summary": summary, "rounds": metrics}, default=str))
    return 0


def cmd_search(args) -> int:
    spark = get_spark("goprowl-search")
    store = DocumentStore(spark, args.workdir)
    hits = gsearch.search(
        store.get_all(), args.query, page=args.page, size=args.size
    ).select("doc_id", "title", "score")
    # Total = count of score>0 rows (no ranking of the full corpus; the old
    # size=2^31 search ranked every hit through the pagination sort).
    score = gsearch.compile_score(
        gsearch.parse_query(args.query), F.col("title"), F.col("content")
    )
    total = store.get_all().where(score > 0).count()
    facet_rows = gsearch.facets(store.get_all()).collect()
    out = {
        "hits": [r.asDict() for r in hits.collect()],
        "total": total,
        "facets": {r["value"]: r["count"] for r in facet_rows},
    }
    print(json.dumps(out))
    return 0


def cmd_list(args) -> int:
    # display formats per cmd/list.go:98-150 (table/json/simple)
    spark = get_spark("goprowl-list")
    store = DocumentStore(spark, args.workdir)
    docs = store.list().select("doc_id", "title", "doc_type", "fetched_round")
    if args.format == "json":
        for row in docs.toJSON().collect():
            print(row)
    elif args.format == "simple":
        for r in docs.collect():
            print(r["doc_id"])
    else:
        docs.show(n=1 << 31, truncate=60)
    return 0


def cmd_curate(args) -> int:
    """Run the end-to-end corpus-curation pipeline (quality floor → exact
    dedup → near-dup cluster canonicals → per-source token budgets) over a
    documents parquet; write the selected mixture."""
    from goprowl_spark.operators import curation

    # Spark reads lazily: overwriting --output while it IS --input would
    # truncate the source mid-read and destroy the documents table.
    if os.path.realpath(args.input) == os.path.realpath(args.output):
        print(
            "error: --input and --output resolve to the same path; "
            "write the mixture somewhere else",
            file=sys.stderr,
        )
        return 2
    # a negative shard count would pmod into negative shard ids and write
    # garbage shard=-N partition dirs while still exiting 0
    if args.shards < 0:
        print(
            f"error: --shards must be >= 0, got {args.shards}",
            file=sys.stderr,
        )
        return 2

    spark = get_spark("goprowl-curate")
    docs = spark.read.parquet(args.input)
    n_contaminated = 0
    if args.eval_input:
        # decontamination runs FIRST: a doc carrying eval text must never
        # reach the mixture regardless of its quality or dedup fate
        from goprowl_spark.operators import dedup as dedup_ops

        scored = dedup_ops.decontaminate(
            docs, spark.read.parquet(args.eval_input), k=args.decon_k
        )
        # persist the (small) dirty id set: the corpus-wide window scan is
        # the command's most expensive stage and must run once, not once
        # for the count and again inside the curation join
        dirty = (
            scored.where(F.col("contamination_frac") > args.decon_max_frac)
            .select("doc_id")
            .persist()
        )
        n_contaminated = dirty.count()
        docs = docs.join(F.broadcast(dirty), "doc_id", "left_anti")
    mix = curation.curation_pipeline(
        docs,
        args.quality_min,
        args.budget_tokens,
        jaccard_threshold=args.jaccard_threshold,
        df_cap=args.df_cap,
    )
    # the output IS the curated corpus: full document rows (text included)
    # plus the mixture's token accounting columns
    out = docs.join(mix.select("doc_id", "ws_tokens", "cum_tokens"), "doc_id")
    cached = None
    if args.shards:
        # dataloader layout: deterministic shard + within-shard position,
        # written as one parquet directory per shard (partitionBy). The
        # mixture is persisted first: the layout self-joins it, and an
        # uncached `out` would recompute the whole curation lineage twice
        # inside the write job.
        cached = out = out.persist()
        layout = curation.training_shards(out, args.shards, tokens_col="ws_tokens")
        out = out.join(layout.select("doc_id", "shard", "position"), "doc_id")
    try:
        if args.shards:
            out.write.mode("overwrite").partitionBy("shard").parquet(args.output)
        else:
            out.write.mode("overwrite").parquet(args.output)
    finally:
        # release cached blocks when invoked as a library function on a
        # long-lived session (a CLI process exit would drop them anyway)
        if cached is not None:
            cached.unpersist()
    kept = spark.read.parquet(args.output)
    summary = kept.agg(
        F.count("*").alias("docs_kept"),
        F.coalesce(F.sum("ws_tokens"), F.lit(0)).alias("tokens_kept"),
        F.countDistinct("source").alias("sources"),
    ).collect()[0]
    out_stats = {k: int(summary[k]) for k in summary.asDict()}
    out_stats["docs_decontaminated"] = n_contaminated
    if args.shards:
        out_stats["shards"] = args.shards
    print(json.dumps(out_stats))
    return 0


def cmd_stats(args) -> int:
    """Per-document text-analysis sweep over a documents parquet: language
    ID, token counts, quality heuristics, Gopher repetition fractions and
    substring-dedup contamination (duplicated k-token windows) joined into
    one stats table — the signals a curation pass filters on."""
    from goprowl_spark.operators import dedup, textstats

    if os.path.realpath(args.input) == os.path.realpath(args.output):
        print(
            "error: --input and --output resolve to the same path",
            file=sys.stderr,
        )
        return 2

    spark = get_spark("goprowl-stats")
    docs = spark.read.parquet(args.input)
    out = (
        textstats.token_counts(docs)
        .join(textstats.lang_id(docs), "doc_id")
        .join(textstats.quality_scores(docs), "doc_id")
        .join(textstats.repetition_stats(docs).drop("n_tokens"), "doc_id")
        .join(
            dedup.doc_dup_window_frac(docs, k=args.window_k).select(
                "doc_id", "dup_window_frac"
            ),
            "doc_id",
        )
    )
    out.write.mode("overwrite").parquet(args.output)
    written = spark.read.parquet(args.output)
    summary = written.agg(
        F.count("*").alias("docs"),
        F.round(F.avg("quality"), 6).alias("avg_quality"),
        F.round(F.avg("dup_bigram_frac"), 6).alias("avg_dup_bigram_frac"),
        F.round(F.avg("dup_window_frac"), 6).alias("avg_dup_window_frac"),
    ).collect()[0]
    print(json.dumps({k: float(summary[k]) for k in summary.asDict()}))
    return 0


def cmd_sketch(args) -> int:
    """Constant-memory cardinality + frequency sketches over one column of
    a parquet table: HyperLogLog distinct estimate (with the exact count
    and relative error alongside) and the Count-Min heavy hitters whose
    estimated frequency clears --hh-threshold. One JSON line out."""
    from goprowl_spark.operators import sketches

    # validate BEFORE any Spark job runs: a typo'd --quantiles used to
    # fail only after the HLL and Count-Min passes had already executed,
    # and --hist-bins < 1 made the bin expression divide by zero (NULL
    # bins), silently emitting an empty quantiles list
    qs: tuple[int, ...] = ()
    if args.quantiles:
        try:
            qs = tuple(int(q) for q in args.quantiles.split(","))
        except ValueError:
            print(
                f"error: --quantiles must be comma-separated integers, "
                f"got {args.quantiles!r}",
                file=sys.stderr,
            )
            return 2
        bad = [q for q in qs if not 1 <= q <= 1000]
        if bad:
            print(
                f"error: --quantiles values must be per-mille in [1, 1000], "
                f"got {bad}",
                file=sys.stderr,
            )
            return 2
        if args.hist_bins < 1:
            print(
                f"error: --hist-bins must be >= 1, got {args.hist_bins}",
                file=sys.stderr,
            )
            return 2

    spark = get_spark("goprowl-sketch")
    df = spark.read.parquet(args.input)
    hll = sketches.hll_distinct(df, args.column).collect()[0]
    out = {
        "column": args.column,
        "hll_estimate": float(hll["hll_estimate"]),
        "exact_distinct": int(hll["exact_distinct"]),
        "rel_err": float(hll["rel_err"]),
    }
    if args.hh_threshold:
        hh = (
            sketches.cms_heavy_hitters(df, args.column, args.hh_threshold)
            .orderBy(F.desc("cms_estimate"))
            .limit(args.hh_top)
            .collect()
        )
        out["heavy_hitters"] = [
            {
                "key": str(r["key"]),
                "estimate": int(r["cms_estimate"]),
                "true_count": int(r["true_count"]),
            }
            for r in hh
        ]
    if qs:
        rows = sketches.hist_quantiles(
            df, args.column, n_bins=args.hist_bins, q_permille=qs
        ).collect()
        out["quantiles"] = [
            {
                "q_permille": int(r["q_permille"]),
                "est_lo": int(r["est_lo"]),
                "est_hi": int(r["est_hi"]),
            }
            for r in rows
        ]
    print(json.dumps(out))
    return 0


def cmd_ann(args) -> int:
    """ANN over an embeddings parquet (vec_id, embedding array<float>):
    ``build`` persists an index (IVF assignment partitioned by cluster, or
    PQ codes + codebooks), ``query`` serves top-k neighbors from a built
    index, ``pairs`` emits exact-cosine-verified near-duplicate pairs.
    Closes the similarity stack's CLI gap — the curation/stats/sketch
    commands' sibling for the embedding path."""
    from goprowl_spark.operators import similarity

    spark = get_spark("goprowl-ann")
    meta_path = os.path.join(args.index, "meta.json") if args.index else None

    if args.action == "build":
        emb = spark.read.parquet(args.input)
        n_vec = emb.count()
        os.makedirs(args.index, exist_ok=True)
        if args.method == "ivf":
            assigned, cents = similarity.build_ivf_index(
                emb, n_centroids=args.n_centroids, n_iter=args.n_iter
            )
            # cluster is the physical partition key, so a query's nprobe
            # filter becomes partition PRUNING on the serving table (the
            # 100-TB shape: queries touch nprobe/n_centroids of the data)
            assigned.write.mode("overwrite").partitionBy("cluster").parquet(
                os.path.join(args.index, "assigned.parquet")
            )
            meta = {
                "method": "ivf",
                "centroids": [[cid, list(c)] for cid, c in cents],
            }
        else:
            codes, books = similarity.build_pq_index(
                emb, m=args.m, k_codes=args.k_codes, n_iter=args.n_iter
            )
            # D floats -> m small ints per vector: the serving path reads
            # ONLY this table; raw vectors never leave the build side
            codes.write.mode("overwrite").parquet(
                os.path.join(args.index, "codes.parquet")
            )
            meta = {
                "method": "pq",
                "codebooks": [
                    [[cid, list(c)] for cid, c in book] for book in books
                ],
            }
        with open(meta_path, "w") as f:
            json.dump(meta, f)
        print(
            json.dumps(
                {"built": args.method, "vectors": n_vec, "index": args.index}
            )
        )
        return 0

    if args.action == "query":
        with open(meta_path) as f:
            meta = json.load(f)
        if args.query_vec:
            qvec = [float(x) for x in args.query_vec.split(",")]
        elif args.query_id is not None:
            if not args.input:
                print(
                    "error: --query-id needs --input (the embeddings "
                    "parquet to look the vector up in)",
                    file=sys.stderr,
                )
                return 2
            row = (
                spark.read.parquet(args.input)
                .where(F.col("vec_id") == args.query_id)
                .select("embedding")
                .first()
            )
            if row is None:
                print(f"error: vec_id {args.query_id} not found", file=sys.stderr)
                return 2
            qvec = [float(x) for x in row["embedding"]]
        else:
            print(
                "error: pass --query-vec v1,v2,... or --query-id ID",
                file=sys.stderr,
            )
            return 2
        if meta["method"] == "ivf":
            cents = [(int(cid), list(c)) for cid, c in meta["centroids"]]
            probe = similarity.probe_clusters_quant(cents, qvec, args.nprobe)
            assigned = spark.read.parquet(
                os.path.join(args.index, "assigned.parquet")
            )
            hits = similarity.ivf_topk_indexed(assigned, probe, qvec, args.k)
            score_col = "cosine"
        else:
            books = [
                [(int(cid), list(c)) for cid, c in book]
                for book in meta["codebooks"]
            ]
            codes = spark.read.parquet(os.path.join(args.index, "codes.parquet"))
            hits = similarity.pq_topk(codes, books, qvec, args.k)
            score_col = "pq_cosine"
        out = [
            {"vec_id": int(r["vec_id"]), "score": float(r[score_col])}
            for r in hits.collect()
        ]
        print(json.dumps({"method": meta["method"], "k": args.k, "hits": out}))
        return 0

    # pairs
    if os.path.realpath(args.input) == os.path.realpath(args.output):
        print(
            "error: --input and --output resolve to the same path",
            file=sys.stderr,
        )
        return 2
    emb = spark.read.parquet(args.input)
    # --method carries the build choices too; for pairs anything that
    # isn't an explicit "block" means the blocking-free LSH path
    method = "block" if args.method == "block" else "lsh"
    if method == "lsh":
        dim = len(emb.select("embedding").first()["embedding"])
        pairs = similarity.lsh_cosine_pairs(
            emb,
            args.threshold,
            dim,
            bands=args.bands,
            planes_per_band=args.planes_per_band,
        )
    else:
        pairs = similarity.cosine_pairs(
            emb, args.threshold, block_col=args.block_col
        )
    pairs.write.mode("overwrite").parquet(args.output)
    n_pairs = spark.read.parquet(args.output).count()
    print(
        json.dumps(
            {
                "pairs": n_pairs,
                "threshold": args.threshold,
                "method": method,
                "output": args.output,
            }
        )
    )
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="goprowl_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("crawl")
    c.add_argument("--seeds", nargs="+", required=True)
    c.add_argument("--max-depth", type=int, default=3)
    c.add_argument("--workdir", required=True)
    c.add_argument("--budget", type=int, default=None)
    c.add_argument("--allowed-hosts", default=None)
    c.add_argument("--corpus-n", type=int, default=5000)
    c.add_argument("--max-rounds", type=int, default=None)
    c.add_argument("--resume", action="store_true")
    c.add_argument(
        "--clear",
        action="store_true",
        help="DELETE any existing crawl in --workdir (all snapshots) and "
        "start fresh (Application.Run clear-then-crawl, "
        "application.go:106-126)",
    )
    c.set_defaults(fn=cmd_crawl)

    s = sub.add_parser("search")
    s.add_argument("--workdir", required=True)
    s.add_argument("--query", required=True)
    s.add_argument("--page", type=int, default=1)
    s.add_argument("--size", type=int, default=10)
    s.set_defaults(fn=cmd_search)

    l = sub.add_parser("list")
    l.add_argument("--workdir", required=True)
    l.add_argument("--format", choices=["table", "json", "simple"], default="table")
    l.set_defaults(fn=cmd_list)

    cu = sub.add_parser("curate")
    cu.add_argument("--input", required=True, help="documents parquet path")
    cu.add_argument("--output", required=True, help="mixture parquet path")
    cu.add_argument("--quality-min", type=float, default=0.0)
    cu.add_argument("--budget-tokens", type=int, required=True)
    cu.add_argument("--jaccard-threshold", type=float, default=0.25)
    cu.add_argument("--df-cap", type=int, default=100)
    cu.add_argument(
        "--eval-input",
        default=None,
        help="eval-set parquet; docs overlapping it are dropped before curation",
    )
    cu.add_argument("--decon-k", type=int, default=8, help="window size (tokens)")
    cu.add_argument(
        "--decon-max-frac",
        type=float,
        default=0.0,
        help="max allowed fraction of eval-overlapping windows (default: any overlap drops)",
    )
    cu.add_argument(
        "--shards",
        type=int,
        default=0,
        help="write the mixture as N deterministic dataloader shards "
        "(partitioned by shard, stable within-shard positions)",
    )
    cu.set_defaults(fn=cmd_curate)

    st = sub.add_parser("stats")
    st.add_argument("--input", required=True, help="documents parquet path")
    st.add_argument("--output", required=True, help="stats parquet path")
    st.add_argument(
        "--window-k", type=int, default=8,
        help="token-window width for substring-dedup contamination",
    )
    st.set_defaults(fn=cmd_stats)

    sk = sub.add_parser("sketch")
    sk.add_argument("--input", required=True, help="parquet table path")
    sk.add_argument("--column", required=True, help="column to sketch")
    sk.add_argument(
        "--hh-threshold", type=int, default=0,
        help="report Count-Min heavy hitters with estimate >= this "
        "(0 = skip the frequency sketch)",
    )
    sk.add_argument("--hh-top", type=int, default=20)
    sk.add_argument(
        "--quantiles", default="",
        help="comma-separated per-mille quantiles (e.g. 250,500,990) to "
        "estimate with the mergeable histogram sketch ('' = skip)",
    )
    sk.add_argument("--hist-bins", type=int, default=256)
    sk.set_defaults(fn=cmd_sketch)

    an = sub.add_parser("ann")
    an.add_argument(
        "action", choices=["build", "query", "pairs"],
        help="build a persisted index / query it for top-k / emit "
        "exact-verified near-duplicate pairs",
    )
    an.add_argument("--input", default=None, help="embeddings parquet path")
    an.add_argument("--index", default=None, help="index directory")
    an.add_argument("--output", default=None, help="pairs parquet path")
    an.add_argument(
        "--method", choices=["ivf", "pq", "lsh", "block"], default="ivf",
        help="build: ivf|pq; pairs: lsh (no blocking column) | block "
        "(per---block-col self-join)",
    )
    an.add_argument("--k", type=int, default=10)
    an.add_argument("--nprobe", type=int, default=2)
    an.add_argument("--n-centroids", type=int, default=8)
    an.add_argument("--n-iter", type=int, default=4)
    an.add_argument("--m", type=int, default=4, help="PQ subvector count")
    an.add_argument("--k-codes", type=int, default=8, help="PQ codebook size")
    an.add_argument("--query-vec", default=None, help="comma-separated floats")
    an.add_argument("--query-id", type=int, default=None)
    an.add_argument("--threshold", type=float, default=0.9)
    an.add_argument("--bands", type=int, default=8)
    an.add_argument("--planes-per-band", type=int, default=6)
    an.add_argument("--block-col", default="label")
    an.set_defaults(fn=cmd_ann)

    args = p.parse_args(argv)
    if args.cmd == "ann":
        need = {
            "build": ["input", "index"],
            "query": ["index"],
            "pairs": ["input", "output"],
        }[args.action]
        missing = [f"--{n}" for n in need if getattr(args, n) is None]
        if missing:
            p.error(f"ann {args.action} requires {' '.join(missing)}")
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
