"""Branches & tags — the Iceberg refs / write-audit-publish (WAP) workflow
over LakeTable's versioned manifests. A branch stages merges invisibly to
main readers; `publish` fast-forwards main to the audited head atomically.
The reference watcher has no staging concept (events go straight to Kafka,
cmd/watcher/main.go:41-51); WAP is the lake-side pattern a 10^10-event CDC
sink needs so a bad upstream batch can be audited before readers see it."""

import pytest

from kafka_mongo_watcher_spark.plans.lake import ConcurrentCommitError, LakeTable

from tests.test_lake_mor import _batch, _row, _state


def _mk(spark, tmp_path, **kw):
    t = LakeTable.create(spark, str(tmp_path / "t"), n_buckets=4,
                         write_mode="mor", **kw)
    t.merge(_batch(spark, [
        _row("insert", "r", "p", 1), _row("insert", "r", "q", 2),
    ]), source_id="s", batch_id=0)                      # v1
    return t


def test_branch_commits_invisible_until_publish(spark, tmp_path):
    t = _mk(spark, tmp_path)
    b = t.branch("audit")
    b.merge(_batch(spark, [
        _row("update", "r", "p", 5, "v5"), _row("insert", "s", "x", 7),
    ]), source_id="s", batch_id=1)                      # branch v2
    # main readers see the pre-branch state; branch handle sees staging
    assert _state(t.refresh()) == {
        ("r", "p"): ("commit1", "c", 1), ("r", "q"): ("commit2", "c", 2)}
    assert _state(b)[("r", "p")] == ("commit5", "v5", 5)
    assert t.refs()["branches"]["audit"]["head"] == 2

    out = t.publish("audit")
    assert out["versions"] == [2]
    # post-publish main state == branch head; history is linear
    assert _state(t) == {
        ("r", "p"): ("commit5", "v5", 5), ("r", "q"): ("commit2", "c", 2),
        ("s", "x"): ("commit7", "c", 7)}
    assert t.version == 2
    assert [h["version"] for h in t.history()] == [0, 1, 2]
    assert t.refs()["branches"] == {}
    # time travel works through the published commit
    assert _state(t.at_version(1))[("r", "p")] == ("commit1", "c", 1)


def test_publish_is_exactly_once_with_applied_map(spark, tmp_path):
    """The fencing map rides the branch manifests: re-delivering a batch
    already merged on the branch (or after publish) is a no-op."""
    t = _mk(spark, tmp_path)
    b = t.branch("audit")
    batch = _batch(spark, [_row("update", "r", "p", 5, "v5")])
    b.merge(batch, source_id="s", batch_id=1)
    r = b.merge(batch, source_id="s", batch_id=1)       # replay on branch
    assert r.get("skipped") or r.get("already_applied") or b.version == 2
    t.publish("audit")
    r2 = t.merge(batch, source_id="s", batch_id=1)      # replay after publish
    assert t.version == 2                               # no new commit
    assert r2.get("skipped") or r2.get("already_applied")


def test_publish_rejects_non_fast_forward(spark, tmp_path):
    t = _mk(spark, tmp_path)
    b = t.branch("audit")
    b.merge(_batch(spark, [_row("update", "r", "p", 5, "v5")]),
            source_id="s", batch_id=1)
    # main advances after the fork -> strict fast-forward must fail
    t.merge(_batch(spark, [_row("insert", "s", "y", 9)]),
            source_id="s", batch_id=2)
    with pytest.raises(ConcurrentCommitError):
        t.publish("audit")
    # drop instead; main state keeps only its own commit
    t.drop_branch("audit")
    assert ("s", "y") in _state(t.refresh())
    assert ("r", "p") in _state(t) and _state(t)[("r", "p")][0] == "commit1"


def test_drop_branch_discards_staging_and_expire_reclaims(spark, tmp_path):
    t = _mk(spark, tmp_path)
    b = t.branch("audit")
    b.merge(_batch(spark, [_row("insert", "s", "x", 7)]),
            source_id="s", batch_id=1)
    with pytest.raises(ValueError):                     # guarded while active
        t.expire_snapshots(keep_last=1)
    t.drop_branch("audit")
    stats = t.refresh().expire_snapshots(keep_last=99)
    assert stats["data_files_removed"] >= 1             # orphaned branch files
    assert _state(t) == {
        ("r", "p"): ("commit1", "c", 1), ("r", "q"): ("commit2", "c", 2)}


def test_tags_pin_versions_against_expiry(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.tag("after-load")                                 # v1
    t.merge(_batch(spark, [_row("update", "r", "p", 5, "v5")]),
            source_id="s", batch_id=1)                  # v2
    t.merge(_batch(spark, [_row("update", "r", "p", 6, "v6")]),
            source_id="s", batch_id=2)                  # v3
    assert _state(t.at_tag("after-load"))[("r", "p")] == ("commit1", "c", 1)
    t.expire_snapshots(keep_last=0)                     # current + tags only
    assert _state(t.at_tag("after-load"))[("r", "p")] == ("commit1", "c", 1)
    with pytest.raises(ValueError):
        t.at_version(2)                                 # untagged -> expired
    t.drop_tag("after-load")
    t.expire_snapshots(keep_last=0)
    with pytest.raises(ValueError):
        t.at_tag("after-load")


def test_branch_changelog_spans_fork(spark, tmp_path):
    """changes() on a branch handle resolves manifests across the fork
    point: main history up to the fork, branch commits after it."""
    t = _mk(spark, tmp_path)
    b = t.branch("audit")
    b.merge(_batch(spark, [_row("update", "r", "p", 5, "v5")]),
            source_id="s", batch_id=1)
    rows = b.changes(0).select("_commit_version", "repo", "path").collect()
    versions = sorted({r["_commit_version"] for r in rows})
    assert versions == [1, 2]
