"""CLI surface end-to-end: crawl → search → list → curate as a user would
run them (S13 display formats; cmd/crawl.go, cmd/search.go, cmd/list.go)."""

from __future__ import annotations

import json

import pytest

from goprowl_spark import cli, corpus


def test_cli_crawl_search_list_curate(spark, tmp_path, capsys):
    workdir = str(tmp_path / "crawl")

    rc = cli.main(
        [
            "crawl",
            "--seeds", corpus.url(0),
            "--max-depth", "3",
            "--workdir", workdir,
            "--corpus-n", "300",
        ]
    )
    assert rc == 0
    crawl_out = json.loads(capsys.readouterr().out)
    assert crawl_out["summary"]["rounds"] >= 2
    assert crawl_out["rounds"], "no metrics rows"

    # re-running without --resume must refuse, not silently continue
    rc = cli.main(
        ["crawl", "--seeds", corpus.url(0), "--max-depth", "3",
         "--workdir", workdir, "--corpus-n", "300"]
    )
    assert rc == 2
    capsys.readouterr()

    rc = cli.main(["search", "--workdir", workdir, "--query", "page"])
    assert rc == 0
    search_out = json.loads(capsys.readouterr().out)
    assert search_out["total"] > 0 and search_out["hits"]

    rc = cli.main(["list", "--workdir", workdir, "--format", "simple"])
    assert rc == 0
    listed = capsys.readouterr().out.strip().splitlines()
    assert len(listed) > 0

    # curate over the testdata documents table
    out_path = str(tmp_path / "mix.parquet")
    rc = cli.main(
        [
            "curate",
            "--input", "/root/testdata/sf0.001/documents.parquet",
            "--output", out_path,
            "--budget-tokens", "500",
        ]
    )
    assert rc == 0
    cur = json.loads(capsys.readouterr().out)
    assert cur["docs_kept"] > 0 and cur["tokens_kept"] > 0
    assert spark.read.parquet(out_path).count() == cur["docs_kept"]

    # --input == --output would truncate the source mid-read (lazy scan +
    # overwrite); must refuse up front, and leave the file untouched
    before = spark.read.parquet(out_path).count()
    rc = cli.main(
        ["curate", "--input", out_path, "--output", out_path,
         "--budget-tokens", "500"]
    )
    assert rc == 2
    capsys.readouterr()
    assert spark.read.parquet(out_path).count() == before


def test_cli_stats(spark, tmp_path, capsys):
    """stats subcommand: one joined per-doc stats table (lang, tokens,
    quality, repetition, substring contamination), summary JSON on stdout,
    and the same-path guard as curate."""
    out_path = str(tmp_path / "stats.parquet")
    rc = cli.main(
        [
            "stats",
            "--input", "/root/testdata/sf0.001/documents.parquet",
            "--output", out_path,
        ]
    )
    assert rc == 0
    summary = json.loads(capsys.readouterr().out)
    assert summary["docs"] > 0
    assert 0.0 <= summary["avg_dup_window_frac"] <= 1.0

    stats = spark.read.parquet(out_path)
    n_docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).count()
    assert stats.count() == n_docs
    cols = set(stats.columns)
    assert {
        "doc_id", "ws_tokens", "predicted_lang", "quality",
        "top_bigram_frac", "dup_bigram_frac", "dup_window_frac",
    } <= cols

    rc = cli.main(["stats", "--input", out_path, "--output", out_path])
    assert rc == 2
    capsys.readouterr()


def test_cli_sketch(spark, capsys):
    """sketch subcommand: HLL estimate + exact + Count-Min heavy hitters
    over one column, one JSON line out; the HLL numbers must agree with
    the operator's own driver-gate math."""
    rc = cli.main(
        [
            "sketch",
            "--input", "/root/testdata/sf0.001/events.parquet",
            "--column", "user_id",
            "--hh-threshold", "10",
            "--hh-top", "5",
        ]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert out["exact_distinct"] > 0
    assert abs(out["rel_err"]) < 0.15
    assert out["hll_estimate"] == pytest.approx(
        out["exact_distinct"] * (1 + out["rel_err"]), rel=1e-4
    )
    assert 1 <= len(out["heavy_hitters"]) <= 5
    for hh in out["heavy_hitters"]:
        assert hh["estimate"] >= hh["true_count"]
        assert hh["estimate"] >= 10


def test_cli_curate_decontaminates(spark, tmp_path, capsys):
    """--eval-input drops any doc whose k-token windows overlap the eval
    set before quality/dedup/budget run; the leaked doc never reaches the
    mixture and the summary reports the drop count."""
    eval_text = " ".join(f"evaltoken{i}" for i in range(12))
    docs = spark.createDataFrame(
        [
            (1, "clean text " + " ".join(f"w{i}" for i in range(30)), "en", "web", 200),
            (2, eval_text + " trailing words here", "en", "web", 200),  # leaked
            (3, "another clean doc " + " ".join(f"v{i}" for i in range(30)), "en", "web", 200),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    ev = spark.createDataFrame([(100, eval_text)], "doc_id long, text string")
    docs_path = str(tmp_path / "docs.parquet")
    eval_path = str(tmp_path / "eval.parquet")
    out_path = str(tmp_path / "mix.parquet")
    docs.write.parquet(docs_path)
    ev.write.parquet(eval_path)

    rc = cli.main(
        [
            "curate",
            "--input", docs_path,
            "--output", out_path,
            "--budget-tokens", "1000",
            "--eval-input", eval_path,
        ]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert out["docs_decontaminated"] == 1
    kept = {r["doc_id"] for r in spark.read.parquet(out_path).collect()}
    assert 2 not in kept and {1, 3} <= kept


def test_cli_ann_build_query_pairs(spark, tmp_path, capsys):
    """ann subcommand end-to-end on the testdata embeddings: build an IVF
    index (cluster-partitioned parquet + JSON meta), query it by vec_id,
    build a PQ index and query it by literal vector, and emit LSH pairs —
    parquet in / parquet out, one JSON line per invocation."""
    emb_path = "/root/testdata/sf0.001/embeddings.parquet"
    ivf_dir = str(tmp_path / "ivf_index")
    pq_dir = str(tmp_path / "pq_index")
    pairs_path = str(tmp_path / "pairs.parquet")

    rc = cli.main(
        ["ann", "build", "--input", emb_path, "--index", ivf_dir,
         "--method", "ivf", "--n-centroids", "4"]
    )
    assert rc == 0
    built = json.loads(capsys.readouterr().out)
    assert built["built"] == "ivf" and built["vectors"] > 0
    # cluster is a physical partition key on the serving table
    import os as _os

    parts = [
        d for d in _os.listdir(_os.path.join(ivf_dir, "assigned.parquet"))
        if d.startswith("cluster=")
    ]
    assert len(parts) >= 2

    rc = cli.main(
        ["ann", "query", "--index", ivf_dir, "--input", emb_path,
         "--query-id", "3", "--k", "5", "--nprobe", "2"]
    )
    assert rc == 0
    q = json.loads(capsys.readouterr().out)
    assert q["method"] == "ivf" and len(q["hits"]) == 5
    # the query vector itself lives in a probed cluster: self-hit first
    assert q["hits"][0]["vec_id"] == 3
    assert q["hits"][0]["score"] == pytest.approx(1.0, abs=1e-6)
    scores = [h["score"] for h in q["hits"]]
    assert scores == sorted(scores, reverse=True)

    rc = cli.main(
        ["ann", "build", "--input", emb_path, "--index", pq_dir,
         "--method", "pq", "--m", "4", "--k-codes", "4", "--n-iter", "1"]
    )
    assert rc == 0
    assert json.loads(capsys.readouterr().out)["built"] == "pq"
    qvec = spark.read.parquet(emb_path).where("vec_id = 3").first()["embedding"]
    rc = cli.main(
        ["ann", "query", "--index", pq_dir,
         "--query-vec", ",".join(str(float(x)) for x in qvec), "--k", "5"]
    )
    assert rc == 0
    qpq = json.loads(capsys.readouterr().out)
    assert qpq["method"] == "pq" and len(qpq["hits"]) == 5
    assert 3 in {h["vec_id"] for h in qpq["hits"]}

    rc = cli.main(
        ["ann", "pairs", "--input", emb_path, "--output", pairs_path,
         "--threshold", "0.3", "--method", "lsh"]
    )
    assert rc == 0
    pout = json.loads(capsys.readouterr().out)
    rows = spark.read.parquet(pairs_path).collect()
    assert pout["pairs"] == len(rows)
    assert all(r["id_a"] < r["id_b"] and r["cosine"] >= 0.3 for r in rows)

    # missing required flag for the action is a usage error, not a crash
    with pytest.raises(SystemExit):
        cli.main(["ann", "build", "--input", emb_path])


def test_cli_curate_shard_export(spark, tmp_path, capsys):
    """curate --shards N writes a per-shard parquet layout (one directory
    per shard) with contiguous within-shard positions — the dataloader
    export surface over training_shards."""
    out_path = str(tmp_path / "sharded.parquet")
    rc = cli.main(
        [
            "curate",
            "--input", "/root/testdata/sf0.001/documents.parquet",
            "--output", out_path,
            "--budget-tokens", "500",
            "--shards", "3",
        ]
    )
    assert rc == 0
    cur = json.loads(capsys.readouterr().out)
    assert cur["shards"] == 3 and cur["docs_kept"] > 0
    got = spark.read.parquet(out_path)
    assert "shard" in got.columns and "position" in got.columns
    rows = got.select("shard", "position", "doc_id").collect()
    assert len(rows) == cur["docs_kept"]
    by_shard: dict[int, list[int]] = {}
    for r in rows:
        assert 0 <= int(r["shard"]) < 3
        by_shard.setdefault(int(r["shard"]), []).append(r["position"])
    for positions in by_shard.values():
        assert sorted(positions) == list(range(1, len(positions) + 1))
    # the physical layout is partitioned by shard
    import os as _os

    subdirs = [d for d in _os.listdir(out_path) if d.startswith("shard=")]
    assert len(subdirs) == len(by_shard)


def test_cli_sketch_quantiles(spark, capsys):
    """sketch --quantiles: histogram-quantile estimates whose [est_lo,
    est_hi] brackets the exact per-mille quantile of the column."""
    rc = cli.main(
        [
            "sketch",
            "--input", "/root/testdata/sf0.001/events.parquet",
            "--column", "user_id",
            "--quantiles", "250,500,990",
            "--hist-bins", "64",
        ]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    qs = {q["q_permille"]: q for q in out["quantiles"]}
    assert set(qs) == {250, 500, 990}
    vals = sorted(
        r["user_id"]
        for r in spark.read.parquet(
            "/root/testdata/sf0.001/events.parquet"
        ).collect()
    )
    import math

    for qp, q in qs.items():
        exact = vals[max(0, math.ceil(qp * len(vals) / 1000) - 1)]
        assert q["est_lo"] <= exact <= q["est_hi"]
        assert q["est_lo"] <= q["est_hi"]


def test_cli_sketch_quantiles_rejects_bad_input(spark, capsys):
    """Malformed or out-of-range --quantiles must exit 2 with a usage
    error, not a raw traceback (and not silently drop values)."""
    for bad in ("250,", "25%", "250 500", "1500", "0"):
        rc = cli.main(
            [
                "sketch",
                "--input", "/root/testdata/sf0.001/events.parquet",
                "--column", "user_id",
                "--quantiles", bad,
            ]
        )
        assert rc == 2, bad
        capsys.readouterr()


def test_cli_sketch_rejects_nonpositive_hist_bins(spark, capsys):
    """--hist-bins < 1 would NULL out the bin expression (divide by zero)
    and silently emit an empty quantiles list; it must exit 2 instead —
    and BEFORE any Spark job runs (same for the --quantiles checks)."""
    for bad in ("0", "-8"):
        rc = cli.main(
            [
                "sketch",
                "--input", "/root/testdata/sf0.001/events.parquet",
                "--column", "user_id",
                "--quantiles", "500",
                "--hist-bins", bad,
            ]
        )
        assert rc == 2, bad
        err = capsys.readouterr().err
        assert "--hist-bins" in err


def test_cli_curate_rejects_negative_shards(spark, tmp_path, capsys):
    """--shards < 0 used to pmod into negative shard ids and write garbage
    shard=-N partition dirs while exiting 0."""
    rc = cli.main(
        [
            "curate",
            "--input", "/root/testdata/sf0.001/documents.parquet",
            "--output", str(tmp_path / "mix"),
            "--budget-tokens", "500",
            "--shards", "-2",
        ]
    )
    assert rc == 2
    err = capsys.readouterr().err
    assert "--shards" in err
