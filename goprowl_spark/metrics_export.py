"""Prometheus exposition of crawl metrics (reference parity: the
pushgateway egress at metrics/pushgateway.go:100-124 driven by the 15s
ticker in metrics/module.go:49-63, families in metrics/collector.go:56-129).

The rebuild's system of record is the ``crawl_metrics`` snapshot table
(non-correctness-bearing observability, SURVEY §2); this module renders
the latest round as Prometheus text exposition format so a node_exporter
textfile collector or a pushgateway PUT can egress it. No network calls
here — the transport is deployment-specific; writing the textfile is the
sandbox-safe stand-in.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# crawl_metrics column → (prometheus family, type, help). Counters are
# CUMULATIVE over all rounds (monotone, as Prometheus requires — rate()/
# increase() work); gauges report the latest round's value. No per-round
# label: a label that changes every scrape would fragment each family
# into one-point series. The current round is its own gauge.
FAMILIES = {
    "frontier_size": ("goprowl_frontier_size", "gauge", "URLs in the frontier at round start"),
    "popped": ("goprowl_pages_visited_total", "counter", "URLs popped (fetched), all rounds"),
    "fetched_ok": ("goprowl_fetch_ok_total", "counter", "fetches with HTTP 200, all rounds"),
    "fetched_err": ("goprowl_fetch_errors_total", "counter", "fetches with non-200 status, all rounds"),
    "links_extracted": ("goprowl_links_extracted_total", "counter", "link spans parsed, all rounds"),
    "candidates": ("goprowl_candidates_total", "counter", "candidate URLs after filters, all rounds"),
    "deduped": ("goprowl_deduped_total", "counter", "candidates dropped as already seen, all rounds"),
    "enqueued": ("goprowl_enqueued_total", "counter", "new URLs enqueued, all rounds"),
    "seen_cardinality": ("goprowl_seen_cardinality", "gauge", "distinct URLs ever seen"),
    "dedup_rate": ("goprowl_dedup_rate", "gauge", "deduped / candidates this round"),
    "fetch_latency_p50_ms": ("goprowl_fetch_latency_p50_ms", "gauge", "median fetch latency"),
    "fetch_latency_p99_ms": ("goprowl_fetch_latency_p99_ms", "gauge", "p99 fetch latency"),
    "round_wall_sec": ("goprowl_round_wall_seconds", "gauge", "wall time of the round"),
}


def prometheus_text(metrics: DataFrame) -> str:
    """Render a ``crawl_metrics`` DataFrame as Prometheus text exposition:
    counter families as cumulative sums over all rounds, gauges from the
    latest round, plus a ``goprowl_round`` gauge."""
    from pyspark.sql import functions as F

    rows = metrics.orderBy(metrics["round"].desc()).limit(1).collect()
    if not rows:
        return ""
    latest = rows[0].asDict()
    counter_cols = [c for c, (_, k, _h) in FAMILIES.items() if k == "counter"]
    sums = metrics.agg(
        *[F.sum(c).alias(c) for c in counter_cols]
    ).collect()[0].asDict()
    out = [
        "# HELP goprowl_round current crawl round",
        "# TYPE goprowl_round gauge",
        f"goprowl_round {latest['round']}",
    ]
    for col, (name, kind, help_) in FAMILIES.items():
        value = sums[col] if kind == "counter" else latest[col]
        out.append(f"# HELP {name} {help_}")
        out.append(f"# TYPE {name} {kind}")
        out.append(f"{name} {value}")
    return "\n".join(out) + "\n"


def write_textfile(metrics: DataFrame, path: str) -> None:
    """Write the exposition to a node_exporter textfile-collector path
    (atomic rename, as the collector contract requires)."""
    import os
    import tempfile

    text = prometheus_text(metrics)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path) or ".")
    with os.fdopen(fd, "w") as f:
        f.write(text)
    os.replace(tmp, path)
