"""Document store — the StorageAdapter surface (U2) over the snapshot
catalog, with INCREMENTAL inverted-index maintenance.

Reference interface: search/storage/types.go:20-52 (Store/BatchStore/Get/
Delete/List/Clear/Search) with bleve upsert semantics
(search/storage/bleve/storage.go:65-91, batch :227-243, get :93-142,
delete :245-251, clear :279-299, list :144-188). The bleve result caps
(1000 for List, 10000 for GetAll, storage.go:151,:258) were backend
artifacts, not semantics — no caps here.

bleve maintains its inverted index ON WRITE — every Store/Batch updates
postings immediately. The rebuild mirrors that: when ``maintain_index``
is on, each upsert/delete also updates the ``postings`` and ``doc_stats``
tables *incrementally* (drop the touched doc_ids' rows, append rows
computed from ONLY the new docs — O(batch), never a corpus re-tokenize).
At 100 TB this is the difference between an index and a per-query rebuild.

Every mutation is a new snapshot (upsert = MERGE stand-in, delete =
row-level delete rewrite) so the store shares the crawl's time-travel /
resume story.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from goprowl_spark import ranking, schemas
from goprowl_spark.tables import SnapshotCatalog, merge_upsert

TABLE = "documents"
POSTINGS = "postings"
DOC_STATS = "doc_stats"


class DocumentStore:
    def __init__(self, spark: SparkSession, workdir: str, maintain_index: bool = True):
        self.spark = spark
        self.catalog = SnapshotCatalog(spark, workdir)
        self.maintain_index = maintain_index

    def _docs(self) -> DataFrame:
        return self.catalog.load(TABLE, schema=schemas.DOCUMENTS)

    def postings(self) -> DataFrame:
        """The maintained inverted index (term → doc, tf)."""
        return self.catalog.load(POSTINGS, schema=schemas.POSTINGS)

    def doc_stats(self) -> DataFrame:
        return self.catalog.load(DOC_STATS, schema=schemas.DOC_STATS)

    # ---------------------------------------------------------- writes

    def _index_tables(
        self, touched: DataFrame, new_docs: DataFrame | None
    ) -> dict[str, DataFrame]:
        """Incremental postings/doc_stats: drop touched doc_ids, append
        rows tokenized from only the new docs."""
        if not self.maintain_index:
            return {}
        old_p = self.postings().join(touched, "doc_id", "left_anti")
        old_s = self.doc_stats().join(touched, "doc_id", "left_anti")
        if new_docs is not None:
            old_p = old_p.unionByName(ranking.build_postings(new_docs))
            old_s = old_s.unionByName(ranking.build_doc_stats(new_docs))
        return {POSTINGS: old_p, DOC_STATS: old_s}

    def batch_store(self, docs: DataFrame) -> int:
        """Upsert by doc_id (S5/S6: bleve MERGE semantics, one snapshot per
        batch — the reference's per-crawl bleve batch). Index tables update
        from the batch alone (bleve indexes on write, storage.go:65-91)."""
        merged = merge_upsert(self._docs(), docs, "doc_id")
        tables = {TABLE: merged}
        tables.update(self._index_tables(docs.select("doc_id"), docs))
        return self.catalog.commit(tables)

    def delete(self, doc_id: str) -> int:
        """S10: row-level delete (DELETE FROM documents WHERE url = ?)."""
        remaining = self._docs().where(F.col("doc_id") != doc_id)
        tables = {TABLE: remaining}
        touched = self.spark.createDataFrame([(doc_id,)], "doc_id string")
        tables.update(self._index_tables(touched, None))
        return self.catalog.commit(tables)

    def clear(self) -> int:
        """S11: truncate (reference recreates the index dir,
        bleve/storage.go:279-299); prior snapshots stay readable."""
        tables = {TABLE: self.spark.createDataFrame([], schemas.DOCUMENTS)}
        if self.maintain_index:
            tables[POSTINGS] = self.spark.createDataFrame([], schemas.POSTINGS)
            tables[DOC_STATS] = self.spark.createDataFrame([], schemas.DOC_STATS)
        return self.catalog.commit(tables)

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
        e = entry["tables"].get(TABLE)
        if e is None:
            return 0
        total = 0
        for p in self.catalog._entry_paths(e):
            for root, _, files in os.walk(p):
                total += sum(
                    os.path.getsize(os.path.join(root, f)) for f in files
                )
        return total

    def has_index(self) -> bool:
        """Whether maintained postings tables exist in the current
        snapshot (a crawl without maintain_index leaves none)."""
        manifest = self.catalog._read_manifest()
        sid = manifest["current"]
        if sid is None:
            return False
        return POSTINGS in manifest["snapshots"].get(str(sid), {"tables": {}})[
            "tables"
        ]
