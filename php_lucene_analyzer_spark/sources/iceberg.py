"""Iceberg-backed index storage (north rule: Iceberg tables +
snapshot-scoped resume).

The Iceberg runtime jars are NOT in this image (sources/tables.py's
``iceberg_available`` probe gates everything), so these paths are
exercised by tests/test_iceberg.py ONLY when a user runs with
``--packages org.apache.iceberg:iceberg-spark-runtime-...``; the
directory protocol in operators/lineage.py remains the tested fallback
and implements the same contract (idempotent chunk commits + lineage,
resume skips completed work).

Mapping of the directory protocol onto Iceberg:

* chunk commit        -> ``writeTo(table).append()`` — ATOMIC: a crashed
                         append leaves no partial state (the directory
                         protocol needs the lineage-row-last trick for
                         this; Iceberg gets it from snapshot isolation);
* lineage row         -> appended to a lineage TABLE, carrying the
                         postings table's snapshot_id at commit time;
* resume              -> read lineage, skip chunks present; a chunk row
                         without a reachable snapshot cannot exist
                         (lineage append happens after the postings
                         commit and references it).  The CONVERSE hazard
                         — a crash in the window between the postings
                         append and its lineage append leaves a
                         committed snapshot with no lineage row, and a
                         naive resume would re-index that chunk and
                         append DUPLICATE posting blocks (inflated
                         df/tf/WAND scores) — is closed by
                         ``_reconcile_orphans``: before indexing, run()
                         rolls the postings table back to the newest
                         snapshot lineage records (metadata-only
                         ``rollback_to_snapshot``; with no lineage rows
                         at all, any existing postings are orphans and
                         are deleted);
* snapshot-scoped read-> ``spark.read.option("snapshot-id", ...)`` pins
                         queries to one immutable snapshot while new
                         chunks land (readers never see half a build).
"""

from __future__ import annotations

import time

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .tables import iceberg_available

LINEAGE_COLS = ("chunk int, first_doc long, last_doc long, n_docs long, "
                "snapshot_id long, wall_sec double, finished_at double")


def ensure_hadoop_catalog(spark: SparkSession, name: str,
                          warehouse: str) -> None:
    """Register a Hadoop-type Iceberg catalog at runtime (catalogs are
    lazily instantiated, so conf set after session start works)."""
    if not iceberg_available(spark):
        raise RuntimeError("Iceberg runtime not on the classpath")
    spark.conf.set(f"spark.sql.catalog.{name}",
                   "org.apache.iceberg.spark.SparkCatalog")
    spark.conf.set(f"spark.sql.catalog.{name}.type", "hadoop")
    spark.conf.set(f"spark.sql.catalog.{name}.warehouse", warehouse)


def table_exists(spark: SparkSession, ident: str) -> bool:
    try:
        spark.table(ident).schema
        return True
    except Exception:
        return False


def append_or_create(df: DataFrame, ident: str) -> None:
    """DataFrameWriterV2 commit: create on first write, atomic append
    after.  Postings tables are sorted on write by (term, rbucket,
    block_no) so Iceberg's file-level min/max metrics prune term scans
    (the same sorted-FST role write_postings gives parquet)."""
    w = (df.sortWithinPartitions("term", "rbucket", "block_no")
         if "term" in df.columns else df).writeTo(ident).using("iceberg")
    if table_exists(df.sparkSession, ident):
        w.append()
    else:
        w.create()


def current_snapshot_id(spark: SparkSession, ident: str) -> int:
    row = spark.sql(
        f"SELECT snapshot_id FROM {ident}.snapshots "
        f"ORDER BY committed_at DESC LIMIT 1").collect()
    if not row:
        raise RuntimeError(f"{ident}: no snapshots")
    return int(row[0]["snapshot_id"])


def read_snapshot(spark: SparkSession, ident: str,
                  snapshot_id: int | None = None) -> DataFrame:
    """Snapshot-scoped read: queries pin to one immutable snapshot while
    the build appends new chunks."""
    r = spark.read
    if snapshot_id is not None:
        r = r.option("snapshot-id", str(snapshot_id))
    return r.table(ident)


class IcebergResumableIndexBuild:
    """ResumableIndexBuild over Iceberg tables (same contract as the
    directory protocol in operators/lineage.py; see module docstring for
    the mapping).  ``catalog`` must be registered
    (ensure_hadoop_catalog); tables live under ``{catalog}.{db}``."""

    def __init__(self, spark: SparkSession, catalog: str, db: str,
                 chunk_docs: int = 1 << 20, text_col: str = "content"):
        self.spark = spark
        self.base = f"{catalog}.{db}"
        self.ids_tbl = f"{self.base}.docs_with_ids"
        self.postings_tbl = f"{self.base}.postings"
        self.lineage_tbl = f"{self.base}.lineage"
        self.chunk_docs = chunk_docs
        self.text_col = text_col

    def ensure_ids(self, docs: DataFrame,
                   order_cols: list[str]) -> DataFrame:
        from ..operators.fulltext import with_doc_ids
        if not table_exists(self.spark, self.ids_tbl):
            with_doc_ids(docs, order_cols).writeTo(self.ids_tbl) \
                .using("iceberg").create()
        return self.spark.table(self.ids_tbl)

    def completed_chunks(self) -> set[int]:
        if not table_exists(self.spark, self.lineage_tbl):
            return set()
        return {r["chunk"] for r in
                self.spark.table(self.lineage_tbl).select("chunk").collect()}

    def _reconcile_orphans(self) -> None:
        """Make resume idempotent across the append/lineage crash window:
        roll the postings table back to the last snapshot_id lineage
        records (a crash AFTER the postings commit but BEFORE its lineage
        row leaves an orphan snapshot whose chunk would otherwise be
        re-indexed and double-appended).  Metadata-only when nothing is
        orphaned; with an existing postings table but NO lineage rows,
        every posting row is an orphan of crashed chunk 0 -> delete all."""
        if not table_exists(self.spark, self.postings_tbl):
            return
        lineage_sids: set[int] = set()
        if table_exists(self.spark, self.lineage_tbl):
            lineage_sids = {
                int(r["snapshot_id"]) for r in
                self.spark.table(self.lineage_tbl)
                .select("snapshot_id").collect()}
        if not lineage_sids:
            self.spark.sql(f"DELETE FROM {self.postings_tbl} WHERE true")
            return
        # Rollback target = the NEAREST ancestor of the current snapshot
        # that lineage recorded, found by walking the snapshot parent
        # chain — a commit-order key the table itself maintains.  The
        # round-3 version picked max(finished_at), a wall-clock float
        # stamped driver-side: clock skew or equal stamps across
        # crashed/resumed sessions could select the wrong snapshot and
        # roll back a legitimately committed chunk (r3 ADVICE item 3).
        parents = {
            int(r["snapshot_id"]):
                (int(r["parent_id"]) if r["parent_id"] is not None
                 else None)
            for r in self.spark.sql(
                f"SELECT snapshot_id, parent_id "
                f"FROM {self.postings_tbl}.snapshots").collect()}
        sid = current_snapshot_id(self.spark, self.postings_tbl)
        cur = sid
        while cur is not None and cur not in lineage_sids:
            cur = parents.get(cur)
        if cur is None:
            # no recorded ancestor on the current branch: every commit
            # is an orphan of crashed chunks -> drop all rows
            self.spark.sql(f"DELETE FROM {self.postings_tbl} WHERE true")
            return
        if cur != sid:
            catalog, tbl = self.postings_tbl.split(".", 1)
            self.spark.sql(
                f"CALL {catalog}.system.rollback_to_snapshot"
                f"('{tbl}', {int(cur)})")

    def run(self, docs: DataFrame, order_cols: list[str],
            fail_after_chunks: int | None = None,
            fail_between_appends: int | None = None) -> DataFrame:
        """``fail_after_chunks`` / ``fail_between_appends``: test-only
        crash injection — after N full chunk commits, or BETWEEN the Nth
        chunk's postings append and its lineage append (the orphan
        window _reconcile_orphans closes)."""
        from ..operators.postings import index_corpus
        self._reconcile_orphans()
        ids = self.ensure_ids(docs, order_cols)
        max_id = ids.agg(F.max("doc_id")).collect()[0][0]
        if max_id is None:
            from ..operators.postings import POSTINGS_SCHEMA
            return self.spark.createDataFrame([], POSTINGS_SCHEMA)
        n_docs = max_id + 1
        n_chunks = (n_docs + self.chunk_docs - 1) // self.chunk_docs
        done = self.completed_chunks()
        ran = 0
        for chunk in range(int(n_chunks)):
            if chunk in done:
                continue
            lo = chunk * self.chunk_docs
            hi = min(lo + self.chunk_docs, n_docs)
            t0 = time.time()
            part = ids.filter((F.col("doc_id") >= lo)
                              & (F.col("doc_id") < hi))
            # atomic append: a crash mid-commit leaves NO partial chunk
            append_or_create(
                index_corpus(part, "doc_id", self.text_col,
                             rbucket_base=chunk << 20), self.postings_tbl)
            if fail_between_appends is not None \
                    and ran + 1 >= fail_between_appends:
                raise RuntimeError(
                    f"injected crash between appends (chunk {chunk})")
            sid = current_snapshot_id(self.spark, self.postings_tbl)
            append_or_create(self.spark.createDataFrame(
                [(chunk, lo, hi - 1, hi - lo, sid,
                  time.time() - t0, time.time())], LINEAGE_COLS),
                self.lineage_tbl)
            ran += 1
            if fail_after_chunks is not None and ran >= fail_after_chunks:
                raise RuntimeError(f"injected crash after {ran} chunks")
        return self.postings()

    def postings(self, snapshot_id: int | None = None) -> DataFrame:
        """Current (or snapshot-pinned) postings table."""
        return read_snapshot(self.spark, self.postings_tbl, snapshot_id)

    def lineage(self) -> DataFrame:
        return self.spark.table(self.lineage_tbl)
