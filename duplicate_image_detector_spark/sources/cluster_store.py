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


def _bucket_dirs(vdir: str) -> list[int]:
    """Bucket ids actually written under a version dir (a bucket with no
    rows gets no leaf dir and therefore no manifest pointer)."""
    if not os.path.isdir(vdir):
        return []
    return sorted(
        int(name.split("=", 1)[1])
        for name in os.listdir(vdir)
        if name.startswith("bucket=")
    )


class ClusterStore:
    """Versioned clusters table rooted at ``path``, hash-bucketed by
    ``doc_id`` so refreshes rewrite only TOUCHED buckets.

    Layout: ``{path}/v{NNNN}/bucket={B}/`` snapshot parquet leaf dirs,
    ``{path}/_LATEST`` a JSON manifest mapping each bucket to the
    version that owns its current data (the Iceberg-manifest idea in
    one file), ``{path}/_deletion_log/`` append-only audit parquet.

    Why buckets: the daily loop's refresh changes O(|touched
    components|) rows out of a 10^12-row corpus — a monolithic snapshot
    would rewrite the WORLD every day.  Here a commit writes only the
    buckets containing changed rows; unchanged buckets carry forward by
    manifest pointer to the version dir that last wrote them (those
    files are immutable, so readers of any pinned version are never
    disturbed).  In production this maps 1:1 onto an Iceberg ``MERGE
    INTO`` whose snapshot manifests do the same pointer bookkeeping at
    file granularity.

    ``n_buckets`` is fixed at ``init`` and recorded in the manifest
    (bucket routing must be stable across the store's life); at 10^12
    docs you run 10^4-10^5 buckets so a touched bucket is ~10^7-10^8
    rows — the write unit, not the corpus.
    """

    def __init__(self, spark: SparkSession, path: str, n_buckets: int = 16):
        self.spark = spark
        self.path = path
        self._n_buckets_default = int(n_buckets)

    # -- snapshot bookkeeping ------------------------------------------------

    def _meta(self) -> dict | None:
        p = os.path.join(self.path, _LATEST)
        if not os.path.exists(p):
            return None
        with open(p) as fh:
            return json.load(fh)

    def _latest_version(self) -> int:
        meta = self._meta()
        return -1 if meta is None else int(meta["version"])

    def _version_dir(self, v: int) -> str:
        return os.path.join(self.path, f"v{v:04d}")

    def _bucket_col(self, n_buckets: int):
        return F.pmod(F.xxhash64(F.col("doc_id")), F.lit(n_buckets))

    def _commit(
        self, df: DataFrame, touched_buckets: list[int] | None = None
    ) -> int:
        """Write a new snapshot version.  ``touched_buckets=None`` is a
        full rewrite (init / legacy path); a list writes ONLY those
        buckets' rows from ``df`` — every other bucket keeps its
        existing manifest pointer.  The manifest swap (os.replace) is
        the commit point; a crash mid-write leaves an unreferenced
        version dir, never a torn snapshot."""
        meta = self._meta()
        n = (
            int(meta["n_buckets"])
            if meta and "n_buckets" in meta
            else self._n_buckets_default
        )
        v = (int(meta["version"]) if meta else -1) + 1
        vdir = self._version_dir(v)
        # cluster rows by bucket before the partitioned write (guide §6:
        # REBALANCE before write): without it every write task opens a
        # file in every bucket dir it touches — at 4096 buckets x 32
        # tasks that is ~131k tiny files, and the per-bucket-path serving
        # read pays their listing forever (measured at 200k rows:
        # init 165 s -> 14 s, full read 31 s -> 7 s, files 131k -> 4k).
        # One shuffle of the touched rows per commit buys one file per
        # bucket — the bucket IS the write unit.
        data = df.withColumn("bucket", self._bucket_col(n)).repartition(
            F.col("bucket")
        )
        if touched_buckets is not None:
            touched = sorted({int(b) for b in touched_buckets})
            if touched:
                data = data.where(
                    F.col("bucket").isin([int(b) for b in touched])
                )
                data.write.mode("overwrite").partitionBy("bucket").parquet(
                    vdir
                )
            written = _bucket_dirs(vdir)
            pointers = {
                b: ver
                for b, ver in (meta.get("buckets") or {}).items()
                if int(b) not in set(touched)
            }
            pointers.update({str(b): v for b in written})
        else:
            data.write.mode("overwrite").partitionBy("bucket").parquet(vdir)
            pointers = {str(b): v for b in _bucket_dirs(vdir)}
        if not pointers:
            # an EMPTY snapshot (e.g. day one with no duplicate clusters
            # yet) writes no bucket leaf dirs — keep a schema-bearing
            # empty parquet in the version dir so read() still returns a
            # typed zero-row DataFrame
            df.limit(0).write.mode("overwrite").parquet(vdir)
        tmp = os.path.join(self.path, _LATEST + ".tmp")
        with open(tmp, "w") as fh:
            json.dump(
                {
                    "version": v,
                    "ts": time.time(),
                    "n_buckets": n,
                    "buckets": pointers,
                },
                fh,
            )
        os.replace(tmp, os.path.join(self.path, _LATEST))  # atomic pointer swap
        return v

    # -- API -----------------------------------------------------------------

    def init(self, clusters: DataFrame) -> int:
        """Seed the store from a pipeline ``clusters`` output; every row
        starts ``status='active'``."""
        os.makedirs(self.path, exist_ok=True)
        return self._commit(clusters.withColumn("status", F.lit("active")))

    def apply_update(
        self,
        clusters: DataFrame,
        changed_ids: DataFrame | None = None,
    ) -> int:
        """Commit an UPDATED cluster assignment (e.g. the output of the
        incremental daily-crawl maintenance,
        ``operators/incremental_pairs.incremental_update_clusters``,
        re-assembled to the store shape) as a new snapshot version —
        rewriting ONLY the buckets whose rows changed.

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

        ``changed_ids``: optional (doc_id) superset of every row that
        differs from the latest snapshot (including docs ADDED to or
        DROPPED from the corpus).  When given, touched buckets come
        straight from it — the daily loop passes its delta ∪ touched-
        component members, so the refresh never scans, joins, or
        rewrites the unchanged part of the corpus.  When None, the
        store derives the changed set itself with one null-safe
        full-outer diff against the latest snapshot (bucket-aligned on
        both sides; bounded by the corpus, so prefer ``changed_ids`` at
        scale — the diff is the fallback, not the fast path).
        """
        if "status" in clusters.columns:
            raise ValueError(
                "apply_update input must not carry 'status' — the store "
                "owns deletion state and carries it forward by doc_id"
            )
        old = self.read(include_deleted=True)
        # docs ever deleted: latest snapshot's deleted rows UNION the audit
        # log (covers docs that skipped a snapshot; the snapshot side covers
        # a crash between commit and audit append, where the log undercounts)
        snap_deleted = old.where(F.col("status") == "deleted").select("doc_id")
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
        if changed_ids is not None:
            changed = changed_ids.select("doc_id")
        else:
            changed = self._diff_ids(out, old)
        return self._commit(out, touched_buckets=self._touched_buckets(changed))

    def _touched_buckets(self, ids: DataFrame) -> list[int] | None:
        """Distinct buckets of the given doc_ids (driver-bounded by
        n_buckets); None on a legacy monolithic store (full rewrite)."""
        meta = self._meta()
        if not meta or "buckets" not in meta:
            return None
        n = int(meta["n_buckets"])
        return [
            int(r["b"])
            for r in ids.select(self._bucket_col(n).alias("b"))
            .distinct()
            .collect()
        ]

    def _diff_ids(self, new: DataFrame, old: DataFrame) -> DataFrame:
        """doc_ids whose row differs between ``new`` and ``old`` in any
        column, including rows present on only one side (null-safe
        comparison; presence markers catch add/drop)."""
        cols = [c for c in new.columns if c != "doc_id"]
        old_r = old.select(
            "doc_id",
            F.lit(True).alias("_old_present"),
            *[F.col(c).alias(f"_old_{c}") for c in cols],
        )
        new_r = new.select(
            "doc_id", F.lit(True).alias("_new_present"), *cols
        )
        j = new_r.join(old_r, "doc_id", "full")
        cond = F.col("_new_present").isNull() | F.col("_old_present").isNull()
        for c in cols:
            cond = cond | ~F.col(c).eqNullSafe(F.col(f"_old_{c}"))
        return j.where(cond).select("doc_id")

    def read(self, include_deleted: bool = False) -> DataFrame:
        meta = self._meta()
        if meta is None:
            raise FileNotFoundError(f"cluster store at {self.path} is empty")
        if "buckets" not in meta:  # legacy monolithic snapshot dir
            df = self.spark.read.parquet(
                self._version_dir(int(meta["version"]))
            )
        elif not meta["buckets"]:
            # empty snapshot: the version dir holds a schema-bearing
            # zero-row parquet (see _commit)
            df = self.spark.read.parquet(
                self._version_dir(int(meta["version"]))
            )
        else:
            paths = [
                os.path.join(self._version_dir(int(ver)), f"bucket={b}")
                for b, ver in sorted(
                    meta["buckets"].items(), key=lambda kv: int(kv[0])
                )
            ]
            df = self.spark.read.parquet(*paths)
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
        # only buckets holding a transitioned doc change; the rest carry
        # forward by manifest pointer (a review deletes O(1) docs — the
        # commit must not rewrite a 10^12-row corpus)
        self._commit(
            new,
            touched_buckets=self._touched_buckets(audit.select("doc_id")),
        )
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

    def vacuum(
        self, grace_versions: int = 0, orphan_ttl_seconds: float = 86400.0
    ) -> list[int]:
        """Physically remove version dirs no bucket pointer references —
        the Iceberg ``expire_snapshots`` analog (and the engine's analog
        of the reference's trash cleanup, duplicate-detector.py:2420-2474,
        made safe by the manifest: only UNREFERENCED data is ever
        touched).  Two kinds of garbage accrue in a bucketed store:
        superseded bucket leaf dirs (every ``apply_update``/
        ``soft_delete`` strands its touched buckets' previous files) and
        orphan dirs from a crash between a version write and its
        manifest swap.

        ``grace_versions``: keep that many trailing versions below the
        latest even when unreferenced, preserving a time-travel window
        for concurrent readers pinned to a recent snapshot (the
        ``retain_last`` knob of ``expire_snapshots``).  The latest
        version and every pointer target are ALWAYS kept regardless.

        ``orphan_ttl_seconds``: a dir numbered ABOVE the latest version
        is an in-flight or crashed commit (the manifest never points
        above itself).  It is removed only when its mtime is older than
        this TTL — a commit RUNNING right now must not have its version
        dir deleted out from under it (the ``remove_orphan_files`` age
        guard).

        Returns the sorted list of removed version numbers.  Never
        touches the deletion log (the audit trail outlives any
        snapshot).  At 10^12 rows this deletes whole directories by
        manifest arithmetic — no data scan of any kind."""
        import shutil

        meta = self._meta()
        if meta is None:
            return []
        latest = int(meta["version"])
        live = {latest} | {
            int(v) for v in (meta.get("buckets") or {}).values()
        }
        keep_floor = latest - int(grace_versions)
        pointers = {
            int(b): int(v) for b, v in (meta.get("buckets") or {}).items()
        }
        removed = []
        for name in sorted(os.listdir(self.path)):
            if not (name.startswith("v") and name[1:].isdigit()):
                continue
            v = int(name[1:])
            if v > latest:
                # crashed (or in-flight) commit: age-gated removal
                vdir = os.path.join(self.path, name)
                if time.time() - os.path.getmtime(vdir) >= orphan_ttl_seconds:
                    shutil.rmtree(vdir)
                    removed.append(v)
                continue
            if v >= keep_floor:
                continue
            if v not in live:
                shutil.rmtree(os.path.join(self.path, name))
                removed.append(v)
                continue
            if v == latest:
                continue
            # referenced version below the grace window: some buckets may
            # be superseded (a later commit re-pointed them) — drop just
            # those leaf dirs; the version dir survives for the buckets
            # it still owns
            vdir = self._version_dir(v)
            for b in _bucket_dirs(vdir):
                if pointers.get(b) != v:
                    shutil.rmtree(os.path.join(vdir, f"bucket={b}"))
        return removed

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
