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

# crawl_metrics column → (prometheus family, type, help)
FAMILIES = {
    "frontier_size": ("goprowl_frontier_size", "gauge", "URLs in the frontier at round start"),
    "popped": ("goprowl_pages_visited_total", "counter", "URLs popped (fetched) this round"),
    "fetched_ok": ("goprowl_fetch_ok_total", "counter", "fetches with HTTP 200"),
    "fetched_err": ("goprowl_fetch_errors_total", "counter", "fetches with non-200 status"),
    "links_extracted": ("goprowl_links_extracted_total", "counter", "link spans parsed"),
    "candidates": ("goprowl_candidates_total", "counter", "candidate URLs after filters"),
    "deduped": ("goprowl_deduped_total", "counter", "candidates dropped as already seen"),
    "enqueued": ("goprowl_enqueued_total", "counter", "new URLs enqueued"),
    "seen_cardinality": ("goprowl_seen_cardinality", "gauge", "distinct URLs ever seen"),
    "dedup_rate": ("goprowl_dedup_rate", "gauge", "deduped / candidates this round"),
    "fetch_latency_p50_ms": ("goprowl_fetch_latency_p50_ms", "gauge", "median fetch latency"),
    "fetch_latency_p99_ms": ("goprowl_fetch_latency_p99_ms", "gauge", "p99 fetch latency"),
    "round_wall_sec": ("goprowl_round_wall_seconds", "gauge", "wall time of the round"),
}


def prometheus_text(metrics: DataFrame) -> str:
    """Render the LATEST crawl round of a ``crawl_metrics`` DataFrame as
    Prometheus text exposition format (one sample per family, labelled
    with the round)."""
    rows = metrics.orderBy(metrics["round"].desc()).limit(1).collect()
    if not rows:
        return ""
    row = rows[0].asDict()
    out = []
    for col, (name, kind, help_) in FAMILIES.items():
        out.append(f"# HELP {name} {help_}")
        out.append(f"# TYPE {name} {kind}")
        out.append(f'{name}{{round="{row["round"]}"}} {row[col]}')
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
