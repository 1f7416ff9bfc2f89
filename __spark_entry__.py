"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: BFS-crawl a deterministic synthetic web corpus
(5,000 pages derived from the sf0.001 documents row count) into interleaved
span documents, then run a ranked full-text search over them (the two
halves of the GoProwl pipeline, SURVEY.md §3.1/§3.2).

``queries()`` / ``oracle_sql()`` live in goprowl_spark.contract — one entry
per implemented operator from SURVEY.md §2 plus the training-data-pipeline
operators, each paired with a DuckDB oracle where SQL can express it.
"""

from __future__ import annotations

import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from goprowl_spark import contract, corpus
from goprowl_spark import search as gsearch
from goprowl_spark.crawl import CrawlConfig, CrawlEngine


def entry(spark: SparkSession) -> DataFrame:
    n = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet").count()
        * contract.CORPUS_MULT
    )
    eng = CrawlEngine(
        spark,
        None,
        tempfile.mkdtemp(prefix="goprowl_entry_"),
        CrawlConfig(seeds=[corpus.url(0)], max_depth=4),
        fetcher=corpus.make_fetcher(n),
    )
    eng.run()
    return gsearch.search(eng.documents(), "title:page alpha", size=20)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return contract.queries()


def oracle_sql() -> dict[str, str]:
    return contract.oracle_sql()
