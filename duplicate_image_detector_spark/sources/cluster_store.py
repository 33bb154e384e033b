"""Mutable clusters store: soft-delete + group-active recompute + audit log.

Analog of the reference's review-UI mutation path
(/root/reference/duplicate-detector.py:2477-2545):

  * ``UPDATE images SET status='deleted' WHERE id IN (...)``  (ref :2505-2510)
    -> ``soft_delete``: a row-level update expressed as a broadcast join +
    conditional column, committed as a NEW immutable snapshot version
    (in production this is an Iceberg ``MERGE INTO``/row-delete whose
    snapshot commit provides the same atomicity; here a versioned parquet
    directory with a ``_LATEST`` pointer file emulates it — readers of the
    previous version are never disturbed).
  * ``INSERT INTO deletion_log (image_path, group_id)``  (ref :2518-2524)
    -> an append-only parquet audit table, one row per doc that actually
    transitioned active -> deleted (idempotent re-deletes append nothing,
    matching the reference's "successfully_deleted" filter).
  * group-active recompute (ref :2526-2537): a group is *complete* (drops
    out of serving) when its active member count falls below
    MIN_GROUP_SIZE=2 (ref :99) — computed as a partial-agg groupBy, never
    per-row Python.
  * serving read (ref :2341-2372, :2491-2494): per-group page ordered by
    ``is_representative DESC, doc_id`` with a LIMIT.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MIN_GROUP_SIZE = 2  # ref duplicate-detector.py:99

_LATEST = "_LATEST"


class ClusterStore:
    """Versioned clusters table rooted at ``path``.

    Layout: ``{path}/v{NNNN}/`` snapshot parquet dirs, ``{path}/_LATEST``
    JSON pointer, ``{path}/_deletion_log/`` append-only audit parquet.
    """

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    # -- snapshot bookkeeping ------------------------------------------------

    def _latest_version(self) -> int:
        p = os.path.join(self.path, _LATEST)
        if not os.path.exists(p):
            return -1
        with open(p) as fh:
            return int(json.load(fh)["version"])

    def _version_dir(self, v: int) -> str:
        return os.path.join(self.path, f"v{v:04d}")

    def _commit(self, df: DataFrame) -> int:
        v = self._latest_version() + 1
        df.write.mode("overwrite").parquet(self._version_dir(v))
        tmp = os.path.join(self.path, _LATEST + ".tmp")
        with open(tmp, "w") as fh:
            json.dump({"version": v, "ts": time.time()}, fh)
        os.replace(tmp, os.path.join(self.path, _LATEST))  # atomic pointer swap
        return v

    # -- API -----------------------------------------------------------------

    def init(self, clusters: DataFrame) -> int:
        """Seed the store from a pipeline ``clusters`` output; every row
        starts ``status='active'``."""
        os.makedirs(self.path, exist_ok=True)
        return self._commit(clusters.withColumn("status", F.lit("active")))

    def apply_update(self, clusters: DataFrame) -> int:
        """Commit an UPDATED cluster assignment (e.g. the output of the
        incremental daily-crawl maintenance,
        ``operators/incremental_pairs.incremental_update_clusters``,
        re-assembled to the store shape) as a new snapshot version.

        Soft-delete status carries forward by doc_id from the union of
        the latest snapshot AND the ``_deletion_log`` ledger: a
        reviewed-and-deleted doc stays deleted even if the refresh
        re-clusters it, and ALSO if it was absent from one refresh (e.g.
        a transient 404 in a daily crawl dropped it from a snapshot) and
        reappears in a later one — the append-only log is the durable
        record, the snapshot alone is not.  Unseen docs start
        ``'active'``.  Readers of the previous version are never
        disturbed (same immutable-snapshot contract as ``init``).  The
        input must NOT carry a ``status`` column — status is the store's
        ledger, not the pipeline's.
        """
        if "status" in clusters.columns:
            raise ValueError(
                "apply_update input must not carry 'status' — the store "
                "owns deletion state and carries it forward by doc_id"
            )
        # docs ever deleted: latest snapshot's deleted rows UNION the audit
        # log (covers docs that skipped a snapshot; the snapshot side covers
        # a crash between commit and audit append, where the log undercounts)
        snap_deleted = (
            self.read(include_deleted=True)
            .where(F.col("status") == "deleted")
            .select("doc_id")
        )
        log_dir = os.path.join(self.path, "_deletion_log")
        if os.path.isdir(log_dir):
            ever_deleted = snap_deleted.union(
                self.deletion_log().select("doc_id")
            )
        else:
            ever_deleted = snap_deleted
        dead = ever_deleted.distinct().withColumn("_dead", F.lit(True))
        out = (
            clusters.join(dead, "doc_id", "left")
            .withColumn(
                "status",
                F.when(F.col("_dead").isNotNull(), F.lit("deleted")).otherwise(
                    F.lit("active")
                ),
            )
            .drop("_dead")
        )
        return self._commit(out)

    def read(self, include_deleted: bool = False) -> DataFrame:
        v = self._latest_version()
        if v < 0:
            raise FileNotFoundError(f"cluster store at {self.path} is empty")
        df = self.spark.read.parquet(self._version_dir(v))
        return df if include_deleted else df.where(F.col("status") == "active")

    def _append_audit(self, audit: DataFrame) -> None:
        """Append-only deletion-log write (separate method so tests can
        inject a crash between the snapshot commit and the audit append)."""
        audit.write.mode("append").parquet(
            os.path.join(self.path, "_deletion_log")
        )

    def soft_delete(self, doc_ids: list[int]) -> dict:
        """Mark the given docs deleted; append audit rows for genuine
        transitions; return {'deleted_count', 'complete_groups'}.

        Idempotent: re-deleting already-deleted docs changes nothing and
        logs nothing (ref's successfully_deleted filter, :2518-2524).

        Crash ordering: the snapshot commits FIRST, the audit appends
        SECOND — a failure in between can only UNDERCOUNT the audit log
        (a delete that took effect but was not logged), never record a
        deletion that did not happen.  The transitioned set is
        materialized once and reused for the count, the commit predicate,
        and the audit write (single evaluation).
        """
        cur = self.read(include_deleted=True)
        # set semantics: duplicate ids in the request must not multiply
        # rows through the join (a double-submit would otherwise corrupt
        # every later snapshot)
        ids = (
            self.spark.createDataFrame(
                [(int(i),) for i in doc_ids], "doc_id bigint"
            )
            .distinct()
            .withColumn("_del", F.lit(True))
        )
        joined = cur.join(F.broadcast(ids), "doc_id", "left")
        # pre-delete active counts: complete_groups is a BEFORE/AFTER diff
        before_counts = (
            cur.where(F.col("status") == "active")
            .groupBy("cluster_id")
            .agg(F.count("*").alias("_n_before"))
        )

        from pyspark.storagelevel import StorageLevel

        transitioned = joined.where(
            (F.col("status") == "active") & F.col("_del").isNotNull()
        )
        audit_cols = [
            c for c in ("url", "doc_id", "cluster_id") if c in cur.columns
        ]
        audit = (
            transitioned.select(*audit_cols)
            .withColumn("ts", F.lit(time.time()))
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        deleted_count = audit.count()  # materialized ONCE, reused below

        new = joined.withColumn(
            "status",
            F.when(F.col("_del").isNotNull(), F.lit("deleted")).otherwise(
                F.col("status")
            ),
        ).drop("_del")
        self._commit(new)
        self._append_audit(audit)  # after the commit, never before
        audit.unpersist()

        # group-active recompute (ref :2526-2537): a group is newly
        # complete iff it served BEFORE this call (>= MIN active) and now
        # has < MIN active members — including the drop-to-zero case,
        # where the post-delete groupBy yields no row at all
        after_counts = (
            self.read()
            .groupBy("cluster_id")
            .agg(F.count("*").alias("_n_after"))
        )
        newly_complete = (
            before_counts.where(F.col("_n_before") >= MIN_GROUP_SIZE)
            .join(after_counts, "cluster_id", "left")
            .where(
                F.coalesce(F.col("_n_after"), F.lit(0)) < MIN_GROUP_SIZE
            )
        )
        complete = [int(r["cluster_id"]) for r in newly_complete.collect()]
        return {"deleted_count": deleted_count, "complete_groups": sorted(complete)}

    def deletion_log(self) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.path, "_deletion_log"))

    def active_groups(self) -> DataFrame:
        """(cluster_id, n_active) for servable groups (>= MIN_GROUP_SIZE)."""
        return (
            self.read()
            .groupBy("cluster_id")
            .agg(F.count("*").alias("n_active"))
            .where(F.col("n_active") >= MIN_GROUP_SIZE)
        )

    def serve_group(self, cluster_id: int, limit: int = 100) -> DataFrame:
        """The reference's group page (ref :2491-2494): active members of
        one group, representative first, stable order, LIMIT."""
        return (
            self.read()
            .where(F.col("cluster_id") == cluster_id)
            .orderBy(F.desc("is_representative"), F.asc("doc_id"))
            .limit(limit)
        )
