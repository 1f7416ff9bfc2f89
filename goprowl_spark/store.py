"""Document store — the StorageAdapter surface (U2) over the snapshot
catalog.

Reference interface: search/storage/types.go:20-52 (Store/BatchStore/Get/
Delete/List/Clear/Search) with bleve upsert semantics
(search/storage/bleve/storage.go:65-91, batch :227-243, get :93-142,
delete :245-251, clear :279-299, list :144-188). The bleve result caps
(1000 for List, 10000 for GetAll, storage.go:151,:258) were backend
artifacts, not semantics — no caps here.

Every mutation is a new snapshot (upsert = MERGE stand-in, delete =
row-level delete rewrite) so the store shares the crawl's time-travel /
resume story.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from goprowl_spark import schemas
from goprowl_spark.tables import SnapshotCatalog, merge_upsert

TABLE = "documents"


class DocumentStore:
    def __init__(self, spark: SparkSession, workdir: str):
        self.spark = spark
        self.catalog = SnapshotCatalog(spark, workdir)

    def _docs(self) -> DataFrame:
        return self.catalog.load(TABLE, schema=schemas.DOCUMENTS)

    # ---------------------------------------------------------- writes

    def batch_store(self, docs: DataFrame) -> int:
        """Upsert by doc_id (S5/S6: bleve MERGE semantics, one snapshot per
        batch — the reference's per-crawl bleve batch)."""
        merged = merge_upsert(self._docs(), docs, "doc_id")
        return self.catalog.commit({TABLE: merged})

    def delete(self, doc_id: str) -> int:
        """S10: row-level delete (DELETE FROM documents WHERE url = ?)."""
        remaining = self._docs().where(F.col("doc_id") != doc_id)
        return self.catalog.commit({TABLE: remaining})

    def clear(self) -> int:
        """S11: truncate (reference recreates the index dir,
        bleve/storage.go:279-299); prior snapshots stay readable."""
        empty = self.spark.createDataFrame([], schemas.DOCUMENTS)
        return self.catalog.commit({TABLE: empty})

    # ---------------------------------------------------------- reads

    def get(self, doc_id: str) -> DataFrame:
        """S8: point lookup by URL key. On Iceberg: bucket-partition pruning
        on doc_id + parquet bloom filters make this near-index speed."""
        return self._docs().where(F.col("doc_id") == doc_id)

    def get_all(self) -> DataFrame:
        """S9: full scan (no artificial 10k cap)."""
        return self._docs()

    def list(self) -> DataFrame:
        """List, deterministic order (reference order was bleve-internal)."""
        return self._docs().orderBy("doc_id")

    def table_size_bytes(self) -> int:
        """Bytes of the current documents table's data files (the
        SearchStats.IndexSize analog, engine/types.go:60-64). On Iceberg
        this is a snapshot-summary property; here a file walk."""
        import os

        manifest = self.catalog._read_manifest()
        sid = manifest["current"]
        if sid is None:
            return 0
        entry = manifest["snapshots"].get(str(sid), {"tables": {}})
        paths = entry["tables"].get(TABLE)
        if paths is None:
            return 0
        total = 0
        for p in paths if isinstance(paths, list) else [paths]:
            for root, _, files in os.walk(p):
                total += sum(
                    os.path.getsize(os.path.join(root, f)) for f in files
                )
        return total
