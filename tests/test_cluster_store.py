"""Soft-delete mutation path: status update, audit append, group-active
recompute, snapshot isolation, idempotence (ref :2477-2545 analog)."""

from __future__ import annotations

from duplicate_image_detector_spark.sources.cluster_store import (
    MIN_GROUP_SIZE,
    ClusterStore,
)


def _seed(spark, tmp_path):
    rows = [
        # cluster 10: three members, rep=10
        (10, 10, "near", 0.9, True, "u10"),
        (11, 10, "near", 0.9, False, "u11"),
        (12, 10, "near", 0.9, False, "u12"),
        # cluster 20: two members, rep=20
        (20, 20, "exact", 1.0, True, "u20"),
        (21, 20, "exact", 1.0, False, "u21"),
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id long, cluster_id long, tier string, score double, "
        "is_representative boolean, url string",
    )
    store = ClusterStore(spark, str(tmp_path / "clusters"))
    store.init(df)
    return store


def test_soft_delete_roundtrip(spark, tmp_path):
    store = _seed(spark, tmp_path)
    assert store.read().count() == 5
    assert store.active_groups().count() == 2

    # delete one member of cluster 10: group still active (2 left)
    res = store.soft_delete([11])
    assert res["deleted_count"] == 1
    assert res["complete_groups"] == []
    assert store.read().count() == 4
    assert store.read(include_deleted=True).count() == 5

    # delete another: cluster 10 drops below MIN_GROUP_SIZE -> complete
    res = store.soft_delete([12])
    assert res["complete_groups"] == [10]
    assert store.active_groups().count() == 1
    assert {r["cluster_id"] for r in store.active_groups().collect()} == {20}

    # audit log: one row per genuine transition, append-only
    log = store.deletion_log()
    assert log.count() == 2
    assert {r["doc_id"] for r in log.collect()} == {11, 12}


def test_soft_delete_idempotent(spark, tmp_path):
    store = _seed(spark, tmp_path)
    store.soft_delete([11])
    res = store.soft_delete([11])  # re-delete: no transition, no audit row
    assert res["deleted_count"] == 0
    assert store.deletion_log().count() == 1
    assert store.read(include_deleted=True).where("status = 'deleted'").count() == 1


def test_serve_group_order_and_limit(spark, tmp_path):
    store = _seed(spark, tmp_path)
    page = store.serve_group(10, limit=2).collect()
    assert [r["doc_id"] for r in page] == [10, 11]  # rep first, then id asc
    assert page[0]["is_representative"]

    # deleted members disappear from the page
    store.soft_delete([10])
    page = store.serve_group(10, limit=10).collect()
    assert [r["doc_id"] for r in page] == [11, 12]


def test_snapshot_isolation(spark, tmp_path):
    store = _seed(spark, tmp_path)
    before = store.read()  # bound to v0000
    store.soft_delete([11])
    assert before.count() == 5  # old snapshot untouched
    assert store.read().count() == 4
    assert MIN_GROUP_SIZE == 2


def test_crash_between_commit_and_audit_leaves_no_orphan_rows(spark, tmp_path):
    """Snapshot commits BEFORE the audit append: a crash in between yields
    a store whose deletions took effect with (at worst) missing audit rows
    — never audit rows for deletions that did not happen.  A retry is a
    no-op (idempotence) and appends nothing."""
    import pytest

    store = _seed(spark, tmp_path)

    def boom(audit):
        raise RuntimeError("injected crash after commit, before audit")

    store._append_audit = boom
    with pytest.raises(RuntimeError, match="injected crash"):
        store.soft_delete([11])
    # the delete DID take effect (commit happened first) ...
    assert store.read().count() == 4
    assert store.read(include_deleted=True).where("status='deleted'").count() == 1
    # ... and the audit log has NO orphan rows (it does not even exist yet)
    with pytest.raises(Exception):
        store.deletion_log().count()
    # retry after recovery: already-deleted -> no transition, no audit row
    del store._append_audit  # restore the real method
    res = store.soft_delete([11])
    assert res["deleted_count"] == 0


def test_soft_delete_drop_to_zero_and_dup_ids(spark, tmp_path):
    store = _seed(spark, tmp_path)
    # duplicate ids in one request are set-semantics: no row multiplication
    res = store.soft_delete([20, 20, 21])
    assert res["deleted_count"] == 2
    assert store.read(include_deleted=True).count() == 5  # still 5 rows
    # cluster 20 dropped 2 -> 0 active: reported complete even though the
    # post-delete groupBy has no row for it at all
    assert res["complete_groups"] == [20]
    # an unrelated later delete must NOT re-report the already-complete 20
    res2 = store.soft_delete([11])
    assert res2["complete_groups"] == []


def test_apply_update_rewrites_only_touched_buckets(spark, tmp_path):
    """Refresh commit = bucket-partial write: the new version dir holds
    ONLY the buckets containing changed rows; every other bucket carries
    forward by manifest pointer; the read equals a from-scratch full
    store of the same assignment.  (At 10^12 rows this is the difference
    between a touched-component-sized write and rewriting the world.)"""
    import json
    import os

    from pyspark.sql import functions as F

    schema = (
        "doc_id long, cluster_id long, tier string, score double, "
        "is_representative boolean, url string"
    )
    rows = [
        (i, i - i % 2, "near", 0.9, i % 2 == 0, f"u{i}") for i in range(200)
    ]
    store = ClusterStore(spark, str(tmp_path / "s"), n_buckets=8)
    store.init(spark.createDataFrame(rows, schema))

    # merge docs 2,3 into cluster 0 — exactly two rows change
    upd_rows = [
        (i, 0 if i < 4 else i - i % 2, "near", 0.9,
         i == (0 if i < 4 else i - i % 2), f"u{i}")
        for i in range(200)
    ]
    upd = spark.createDataFrame(upd_rows, schema)
    v = store.apply_update(upd)

    exp_buckets = {
        int(r["b"])
        for r in spark.createDataFrame([(2,), (3,)], "doc_id long")
        .select(F.pmod(F.xxhash64("doc_id"), F.lit(8)).alias("b"))
        .collect()
    }
    vdir = tmp_path / "s" / f"v{v:04d}"
    written = {
        int(d.split("=")[1])
        for d in os.listdir(vdir)
        if d.startswith("bucket=")
    }
    assert written == exp_buckets and len(written) < 8
    with open(tmp_path / "s" / "_LATEST") as fh:
        meta = json.load(fh)
    assert meta["n_buckets"] == 8
    for b, owner in meta["buckets"].items():
        assert owner == (v if int(b) in exp_buckets else 0), (b, owner)

    # content equals a from-scratch full store of the same assignment
    full = ClusterStore(spark, str(tmp_path / "full"), n_buckets=8)
    full.init(upd)
    got = sorted(map(tuple, store.read(include_deleted=True).collect()))
    want = sorted(map(tuple, full.read(include_deleted=True).collect()))
    assert got == want

    # the changed_ids fast path (superset hint, no corpus diff) commits
    # the identical content: only docs 196..199 change cluster, and the
    # hint is a small superset of them
    upd2_rows = [
        (i, (196 if i >= 196 else r[1]), r[2], r[3],
         (i == (196 if i >= 196 else r[1])), r[5])
        for i, r in enumerate(upd_rows)
    ]
    upd2 = spark.createDataFrame(upd2_rows, schema)
    hinted = spark.createDataFrame(
        [(i,) for i in range(190, 200)], "doc_id long"
    )
    store.apply_update(upd2, changed_ids=hinted)
    full2 = ClusterStore(spark, str(tmp_path / "full2"), n_buckets=8)
    full2.init(upd2)
    got2 = sorted(map(tuple, store.read(include_deleted=True).collect()))
    want2 = sorted(map(tuple, full2.read(include_deleted=True).collect()))
    assert got2 == want2


def test_soft_delete_commits_only_touched_buckets(spark, tmp_path):
    import os

    store = _seed(spark, tmp_path)  # 5 docs, default 16 buckets
    v0_buckets = set(store._meta()["buckets"].keys())
    store.soft_delete([11])
    v = store._latest_version()
    vdir = tmp_path / "clusters" / f"v{v:04d}"
    written = [d for d in os.listdir(vdir) if d.startswith("bucket=")]
    assert len(written) == 1  # only doc 11's bucket rewrote
    # pointer map still covers every original bucket
    assert set(store._meta()["buckets"].keys()) == v0_buckets


def test_apply_update_carries_deletions_forward(spark, tmp_path):
    """Daily-refresh commit: an updated assignment becomes a new snapshot;
    reviewed deletions survive the refresh, new docs start active, and
    readers of the previous version are undisturbed."""
    import pytest

    store = _seed(spark, tmp_path)
    store.soft_delete([11])
    v_before = store._latest_version()
    prev = store.read()  # reader pinned to the pre-update snapshot

    # refresh: cluster 20 gained doc 22; doc 11 re-clustered by the
    # pipeline but must STAY deleted; doc 12 left the corpus
    updated = spark.createDataFrame(
        [
            (10, 10, "near", 0.9, True, "u10"),
            (11, 10, "near", 0.9, False, "u11"),
            (20, 20, "exact", 1.0, True, "u20"),
            (21, 20, "exact", 1.0, False, "u21"),
            (22, 20, "exact", 1.0, False, "u22"),
        ],
        "doc_id long, cluster_id long, tier string, score double, "
        "is_representative boolean, url string",
    )
    v = store.apply_update(updated)
    assert v == v_before + 1

    cur = {r["doc_id"]: r["status"] for r in store.read(include_deleted=True).collect()}
    assert cur[11] == "deleted"      # carried forward
    assert cur[22] == "active"       # new doc
    assert 12 not in cur             # dropped from the refreshed corpus
    assert store.read().count() == 4  # active only
    assert prev.count() == 4          # old snapshot reader undisturbed

    # status is the store's ledger — a status-bearing input is rejected
    with pytest.raises(ValueError, match="status"):
        store.apply_update(updated.withColumn("status", updated["tier"]))


def test_apply_update_no_resurrection_after_skipped_refresh(spark, tmp_path):
    """A reviewed-and-deleted doc that is ABSENT from one refresh (e.g. a
    transient 404 dropped it from the crawl) and reappears in a later
    refresh must stay deleted — the _deletion_log is the durable record,
    not just the latest snapshot."""
    store = _seed(spark, tmp_path)
    store.soft_delete([11])

    schema = (
        "doc_id long, cluster_id long, tier string, score double, "
        "is_representative boolean, url string"
    )
    # refresh 1: doc 11 missing entirely (its status row vanishes from
    # the new snapshot)
    store.apply_update(
        spark.createDataFrame(
            [(10, 10, "near", 0.9, True, "u10"),
             (12, 10, "near", 0.9, False, "u12")],
            schema,
        )
    )
    assert 11 not in {
        r["doc_id"]
        for r in store.read(include_deleted=True).collect()
    }
    # refresh 2: doc 11 reappears — resurrected as 'active' would violate
    # the review decision; the log keeps it deleted
    store.apply_update(
        spark.createDataFrame(
            [(10, 10, "near", 0.9, True, "u10"),
             (11, 10, "near", 0.9, False, "u11"),
             (12, 10, "near", 0.9, False, "u12")],
            schema,
        )
    )
    cur = {
        r["doc_id"]: r["status"]
        for r in store.read(include_deleted=True).collect()
    }
    assert cur[11] == "deleted"
    assert cur[10] == "active" and cur[12] == "active"


def test_apply_update_before_any_deletion_log_exists(spark, tmp_path):
    """apply_update on a store with zero deletions (no _deletion_log dir
    yet) must not fail and must mark everything active; and a deletion
    visible only in the SNAPSHOT (crash before the audit append) still
    carries forward."""
    store = _seed(spark, tmp_path)
    schema = (
        "doc_id long, cluster_id long, tier string, score double, "
        "is_representative boolean, url string"
    )
    refresh = spark.createDataFrame(
        [(10, 10, "near", 0.9, True, "u10"),
         (11, 10, "near", 0.9, False, "u11")],
        schema,
    )
    store.apply_update(refresh)  # no log dir: must not raise
    assert store.read().count() == 2

    # snapshot-only deletion (audit append crashed): union still sees it
    import pytest

    def boom(audit):
        raise RuntimeError("injected crash after commit, before audit")

    store._append_audit = boom
    with pytest.raises(RuntimeError, match="injected crash"):
        store.soft_delete([11])
    del store._append_audit
    store.apply_update(refresh)
    cur = {
        r["doc_id"]: r["status"]
        for r in store.read(include_deleted=True).collect()
    }
    assert cur[11] == "deleted"


def test_vacuum_removes_only_unreferenced(spark, tmp_path):
    """vacuum = expire_snapshots: after several partial commits, the
    removed set is exactly {unreferenced version dirs below the grace
    floor} plus superseded bucket leaves inside referenced dirs — and
    the readable store is bit-identical before/after."""
    import os

    from pyspark.sql import functions as F

    schema = (
        "doc_id long, cluster_id long, tier string, score double, "
        "is_representative boolean, url string"
    )

    def assignment(merge_upto: int):
        return spark.createDataFrame(
            [
                (i, 0 if i < merge_upto else i - i % 2, "near", 0.9,
                 i == (0 if i < merge_upto else i - i % 2), f"u{i}")
                for i in range(200)
            ],
            schema,
        )

    store = ClusterStore(spark, str(tmp_path / "s"), n_buckets=8)
    store.init(assignment(0))                      # v0: full write
    store.apply_update(assignment(4))              # v1: partial
    store.apply_update(assignment(8))              # v2: partial
    store.soft_delete([5])                         # v3: partial
    # orphan from a simulated crash: a version dir with no manifest swap
    orphan = tmp_path / "s" / "v0099"
    os.makedirs(orphan / "bucket=0")
    (orphan / "bucket=0" / "junk").write_text("x")

    before = sorted(
        tuple(r) for r in store.read(include_deleted=True).collect()
    )
    meta_before = store._meta()
    live = {int(meta_before["version"])} | {
        int(v) for v in meta_before["buckets"].values()
    }

    # a FRESH above-latest dir is protected by the default TTL (it may
    # be a commit in flight right now); unreferenced versions below the
    # floor go immediately
    first = store.vacuum()
    assert 99 not in first
    assert (orphan / "bucket=0" / "junk").exists()

    removed = sorted(first + store.vacuum(orphan_ttl_seconds=0))
    dirs_after = {
        int(n[1:])
        for n in os.listdir(tmp_path / "s")
        if n.startswith("v") and n[1:].isdigit()
    }
    assert 99 in removed                      # crash orphan gone
    assert set(removed).isdisjoint(live)      # nothing referenced removed
    assert dirs_after == live                 # everything else is gone
    # superseded leaves inside referenced dirs are gone: every remaining
    # leaf is the manifest owner of its bucket
    for v in dirs_after:
        vdir = tmp_path / "s" / f"v{v:04d}"
        for name in os.listdir(vdir):
            if name.startswith("bucket="):
                b = name.split("=")[1]
                assert int(meta_before["buckets"][b]) == v, (v, b)
    after = sorted(
        tuple(r) for r in store.read(include_deleted=True).collect()
    )
    assert before == after
    # deletion log untouched
    assert store.deletion_log().count() == 1
    # idempotent
    assert store.vacuum(orphan_ttl_seconds=0) == []


def test_vacuum_grace_window_preserves_time_travel(spark, tmp_path):
    import os

    schema = (
        "doc_id long, cluster_id long, tier string, score double, "
        "is_representative boolean, url string"
    )
    df = spark.createDataFrame(
        [(i, i, "near", 0.9, True, f"u{i}") for i in range(50)], schema
    )
    store = ClusterStore(spark, str(tmp_path / "s"), n_buckets=4)
    store.init(df)                                     # v0 (full)
    store.init(df)                                     # v1 (full: v0 dead)
    store.init(df)                                     # v2 (full: v1 dead)
    assert store.vacuum(grace_versions=2) == []        # v0,v1 in the window
    assert store.vacuum(grace_versions=1) == [0]       # v1 still protected
    assert sorted(
        n for n in os.listdir(tmp_path / "s") if n.startswith("v")
    ) == ["v0001", "v0002"]
    assert store.vacuum() == [1]
